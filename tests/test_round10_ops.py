"""Round-10 operators: Kneser-Ney bigram LM, BPE apply, PCA power
iteration, Benjamini-Hochberg FDR."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import anomaly, curation, pca, text


# ---- Kneser-Ney bigram LM -----------------------------------------


def test_kn_bigram_matches_hand_computation(spark):
    """Hand-pin the interpolated-KN formula on a 2-doc corpus.

    Corpus bigrams (doc 1: 'a b a b', doc 2: 'a b c'):
      d1: (a,b) (b,a) (a,b)    d2: (a,b) (b,c)
    counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; c1(a)=3 c1(b)=2;
    N1+(a.)=1 N1+(b.)=2; N1+(.b)=1 N1+(.a)=1 N1+(.c)=1; types=3."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.kn_bigram_lm_scores(docs).collect()}

    def lp(c12, c1, n1p_fwd, n1p_back, nbt):
        p = (c12 - 0.75) / c1 + 0.75 * n1p_fwd / c1 * (n1p_back / nbt)
        return math.floor(math.log(p) * 1e6 + 0.5)

    lp_ab = lp(3, 3, 1, 1, 3)
    lp_ba = lp(1, 2, 2, 1, 3)
    lp_bc = lp(1, 2, 2, 1, 3)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["total_logprob_micro"] == 2 * lp_ab + lp_ba
    assert out[2]["n_bigrams"] == 2
    assert out[2]["total_logprob_micro"] == lp_ab + lp_bc
    # truncating DIV toward zero on the negative total
    t = out[1]["total_logprob_micro"]
    assert out[1]["avg_logprob_micro"] == -((-t) // 3)


def test_kn_bigram_probabilities_sum_to_one_per_history(spark):
    """Interpolated KN is a proper distribution: for each observed
    history w1, sum over the OBSERVED vocabulary of P(w2|w1) must be
    ~1 when every continuation is observed somewhere (the discount
    mass redistributes over the continuation unigram, which here
    covers exactly the observed types)."""
    docs = spark.createDataFrame(
        [(1, "x y x z y x"), (2, "z x y")], "doc_id long, text string")
    toks = [t for d in ["x y x z y x", "z x y"] for t in d.split()]
    # rebuild the model in python
    bigrams = []
    for d in ["x y x z y x", "z x y"]:
        ws = d.split()
        bigrams += list(zip(ws, ws[1:]))
    from collections import Counter
    cb = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1p_fwd = Counter(w1 for w1, _ in set(cb))
    n1p_back = Counter(w2 for _, w2 in set(cb))
    nbt = len(cb)
    vocab = set(toks)
    for w1 in c1:
        s = sum((max(cb[(w1, w2)] - 0.75, 0.0)) / c1[w1]
                + 0.75 * n1p_fwd[w1] / c1[w1] * (n1p_back[w2] / nbt)
                for w2 in vocab)
        assert abs(s - 1.0) < 1e-9, (w1, s)
    # and the operator agrees with the python twin on totals
    out = {r["doc_id"]: r["total_logprob_micro"] for r in
           text.kn_bigram_lm_scores(docs).collect()}

    def lp(w1, w2):
        p = ((cb[(w1, w2)] - 0.75) / c1[w1]
             + 0.75 * n1p_fwd[w1] / c1[w1] * (n1p_back[w2] / nbt))
        return math.floor(math.log(p) * 1e6 + 0.5)

    for doc_id, d in [(1, "x y x z y x"), (2, "z x y")]:
        ws = d.split()
        assert out[doc_id] == sum(lp(a, b) for a, b in zip(ws, ws[1:]))


def test_kn_bigram_short_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "a b")], "doc_id long, text string")
    ids = {r["doc_id"] for r in text.kn_bigram_lm_scores(docs).collect()}
    assert ids == {3}


# ---- BPE apply ----------------------------------------------------


def test_bpe_encode_sennrich_walkthrough(spark):
    """'low' x4 + 'lower' x2: merges learn (l,o) -> (lo,w) -> ... and
    encoding applies them in rank order. With 2 merges every 'low' is
    one symbol ['low'] and 'lower' is ['low','e','r'] (3 symbols)."""
    rows = [(i, "low") for i in range(4)] + [(i + 4, "lower")
                                             for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.bpe_encode_stats(docs, n_merges=2).collect()}
    for i in range(4):
        assert out[i]["n_tokens"] == 1
        assert out[i]["n_bpe_tokens"] == 1
        assert out[i]["bpe_per_token_ppm"] == 1_000_000
    for i in range(4, 6):
        assert out[i]["n_tokens"] == 1
        assert out[i]["n_bpe_tokens"] == 3
        assert out[i]["bpe_per_token_ppm"] == 3_000_000


def test_bpe_encode_leftmost_nonoverlapping(spark):
    """'aaaa' under the single merge (a,a): leftmost non-overlapping
    gives ['aa','aa'] = 2 symbols, never 3 ('aa','a','a' would be a
    greedy-rescan bug, 'a','aa','a' an overlap bug)."""
    docs = spark.createDataFrame([(1, "aaaa aaaa")],
                                 "doc_id long, text string")
    out = curation.bpe_encode_stats(docs, n_merges=1).collect()[0]
    assert out["n_tokens"] == 2
    assert out["n_bpe_tokens"] == 4  # 2 per word


def test_bpe_encode_untouched_words_count_chars(spark):
    """A word sharing no learned merge stays fully split: its symbol
    count is its character count."""
    rows = [(i, "zz zz zz") for i in range(3)] + [(9, "qx")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.bpe_encode_stats(docs, n_merges=1).collect()}
    # merge learned is (z,z); 'qx' stays 2 chars
    assert out[9]["n_bpe_tokens"] == 2
    assert out[0]["n_bpe_tokens"] == 3  # three 'zz' words, 1 symbol each


# ---- PCA power iteration ------------------------------------------


def test_power_iterate_diagonal_gram_picks_dominant_axis():
    """Diagonal Gram diag(9, 1): the iterate must converge onto axis 0
    — component 0 pegs at +-1e6, component 1 decays by (1/9) per round
    in fixed point."""
    gram = {(1, 1): 9, (2, 2): 1}
    v = pca._power_iterate(gram, 2, rounds=8)
    assert v[0] == 1_000_000
    assert abs(v[1]) < 2  # (1/9)^8 * 1e6 < 1
    # determinism
    assert v == pca._power_iterate(gram, 2, rounds=8)


def test_power_iterate_truncates_toward_zero():
    """Negative off-diagonal Gram: the fixed-point rescale truncates
    toward zero (DuckDB // and Spark DIV), never floors — pin by a
    case where they differ."""
    # G = [[0, -3], [-3, 0]], v0 = (1e6, 1e6) -> u = (-3e6, -3e6),
    # m = 3e6, v1 = (-1e6, -1e6) exactly (no rounding yet), then
    # u2 = (3e12/1e6...) stays symmetric; inject asymmetry:
    gram = {(1, 1): 2, (1, 2): -3, (2, 2): 5}
    v1 = pca._power_iterate(gram, 2, rounds=1)
    u = [2 * 1_000_000 + (-3) * 1_000_000,
         (-3) * 1_000_000 + 5 * 1_000_000]
    m = max(abs(x) for x in u)
    expect = [(abs(x) * 1_000_000 // m) * (1 if x >= 0 else -1)
              for x in u]
    assert v1 == expect
    assert expect[0] == -500_000  # -1e6*1e6 // 2e6 toward zero


def test_pc1_scores_rank_variance_direction(spark):
    """Vectors spread along dim 0 with noise in dim 1: pc1 must be the
    dim-0 axis, so scores order by the dim-0 component."""
    rows = [(i, [float(i - 3), 0.001 * (i % 2)]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["pc1_score"] for r in
           pca.pc1_power_scores(emb, rounds=8).collect()}
    assert len(out) == 8
    ordered = [out[i] for i in range(8)]
    # strictly monotone in the dim-0 coordinate (sign may flip whole
    # axis; accept either global orientation)
    diffs = [b - a for a, b in zip(ordered, ordered[1:])]
    assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs)


# ---- Benjamini-Hochberg FDR ---------------------------------------


def _drift_events(spark, shifted_types, n=400):
    """Half the rows (odd event_id) of `shifted_types` draw from a
    shifted distribution; every other (type, parity) cell matches."""
    rows = []
    eid = 0
    for t in ["a", "b", "c", "d"]:
        for i in range(n):
            # (i // 2) so consecutive eids (opposite parity) share the
            # base value: without the shift both halves see identical
            # multisets (i % 10 would confound parity with the value)
            base = float((i // 2) % 10)
            v = base + (50.0 if t in shifted_types and eid % 2 == 1
                        else 0.0)
            rows.append((eid, t, v))
            eid += 1
    return spark.createDataFrame(rows,
                                 "event_id long, event_type string,"
                                 " value double")


def test_bh_rejects_only_shifted_types(spark):
    ev = _drift_events(spark, {"a", "d"})
    out = {r["event_type"]: r for r in
           anomaly.ks_bh_fdr(ev, "event_type", "value",
                             (F.col("event_id") % 2 == 1)).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert out["a"]["rejected"] == 1 and out["d"]["rejected"] == 1
    assert out["b"]["rejected"] == 0 and out["c"]["rejected"] == 0
    # shifted types: ECDFs fully separate -> D = 1e6 ppm, p ~ 0
    assert out["a"]["ks_d_ppm"] == 1_000_000
    assert out["a"]["p_ppm"] == 0
    assert out["b"]["p_ppm"] == 1_000_000  # identical halves
    assert all(r["m_tests"] == 4 for r in out.values())


def test_bh_no_drift_rejects_nothing(spark):
    ev = _drift_events(spark, set())
    out = anomaly.ks_bh_fdr(ev, "event_type", "value",
                            (F.col("event_id") % 2 == 1)).collect()
    assert all(r["rejected"] == 0 for r in out)


def test_bh_step_up_property(spark):
    """BH is a step-up procedure: every rank below a rejected rank is
    rejected too (the rejection set is a prefix of the p-order)."""
    ev = _drift_events(spark, {"a", "b", "c"})
    rows = sorted(anomaly.ks_bh_fdr(
        ev, "event_type", "value",
        (F.col("event_id") % 2 == 1)).collect(),
        key=lambda r: r["p_rank"])
    seen_accept = False
    for r in rows:
        if r["rejected"] == 0:
            seen_accept = True
        assert not (seen_accept and r["rejected"] == 1)


def test_ks_p_value_formula_matches_python(spark):
    """Pin the 3-term asymptotic p-value spelling against a python
    recomputation on real KS outputs."""
    ev = _drift_events(spark, {"a"})
    out = anomaly.ks_bh_fdr(ev, "event_type", "value",
                            (F.col("event_id") % 2 == 1)).collect()
    for r in out:
        d = r["ks_d_ppm"] / 1e6
        lam2 = d * d * (r["n_a"] * r["n_b"] / (r["n_a"] + r["n_b"]))
        p = 2.0 * (math.exp(-2.0 * lam2) - math.exp(-8.0 * lam2)
                   + math.exp(-18.0 * lam2))
        expect = min(1_000_000, math.floor(p * 1e6 + 0.5))
        assert r["p_ppm"] == expect


# ---- CCNet perplexity-ratio filter --------------------------------


def test_lm_quality_filter_ranks_domain_docs_higher(spark):
    """Docs written in the 'domain' vocabulary must score a higher
    delta than docs in the off-domain vocabulary."""
    rows = [(1, "alpha beta alpha beta", "en"),
            (2, "alpha beta gamma", "en"),
            (3, "zeta eta zeta eta", "fr"),
            (4, "zeta eta theta", "fr")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    from pyspark.sql import functions as SF
    out = {r["doc_id"]: r for r in
           text.lm_quality_filter(docs, SF.col("lang") == "en").collect()}
    assert len(out) == 4
    assert out[1]["delta_micro"] > 0 > out[3]["delta_micro"]
    assert out[2]["delta_micro"] > out[4]["delta_micro"]


def test_lm_quality_filter_matches_hand_laplace(spark):
    """Pin the Laplace arithmetic: corpus 'a a b' (doc1 en) + 'b' (doc2
    fr): V=2, N_all=4, N_dom=3, c_all(a)=2 c_dom(a)=2, c_all(b)=2
    c_dom(b)=1."""
    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "b", "fr")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in
           text.lm_quality_filter(docs, F.col("lang") == "en").collect()}

    def lp(c, n, v=2):
        return math.floor((math.log(c + 1.0) - math.log(n + v))
                          * 1e6 + 0.5)

    d1 = 2 * lp(2, 3) + lp(1, 3)     # domain lps for a, a, b
    g1 = 2 * lp(2, 4) + lp(2, 4)     # general lps
    assert out[1]["n_tokens"] == 3
    t = out[1]
    assert t["avg_domain_lp_micro"] == -((-d1) // 3)
    assert t["avg_general_lp_micro"] == -((-g1) // 3)
    assert t["delta_micro"] == (t["avg_domain_lp_micro"]
                                - t["avg_general_lp_micro"])


# ---- Dirichlet query likelihood -----------------------------------


def test_dirichlet_ql_background_only_doc_scores(spark):
    """A doc with NO query term still gets a row (background model),
    and a doc containing the term scores strictly higher when lengths
    are equal."""
    docs = spark.createDataFrame(
        [(1, "join the tables"), (2, "other words here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.dirichlet_ql_scores(docs, ("join",)).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_terms_hit"] == 1 and out[2]["n_terms_hit"] == 0
    assert out[1]["ql_micro"] > out[2]["ql_micro"]


def test_dirichlet_ql_hand_formula(spark):
    docs = spark.createDataFrame(
        [(1, "x y x"), (2, "y z")], "doc_id long, text string")
    out = {r["doc_id"]: r["ql_micro"] for r in
           text.dirichlet_ql_scores(docs, ("x", "z"), mu=2000).collect()}
    n = 5  # corpus tokens

    def term(tf, cf, dl):
        return math.floor(
            math.log((tf + 2000.0 * cf / n) / (dl + 2000.0)) * 1e6
            + 0.5)

    assert out[1] == term(2, 2, 3) + term(0, 1, 3)
    assert out[2] == term(0, 2, 2) + term(1, 1, 2)


def test_dirichlet_ql_drops_absent_terms(spark):
    """Query terms with zero corpus frequency have no background model
    and must not contribute (matching inner cf semantics)."""
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = text.dirichlet_ql_scores(docs, ("x", "missing")).collect()
    assert len(out) == 1
    assert out[0]["n_terms_hit"] == 1
    assert out[0]["ql_micro"] == math.floor(
        math.log((1 + 2000.0 * 1 / 2) / (2 + 2000.0)) * 1e6 + 0.5)


# ---- MinHash error audit ------------------------------------------


def test_minhash_error_report_exact_for_identical_docs(spark):
    """Identical documents: every permutation minimum agrees and the
    exact Jaccard is 1 — est == exact == 1e6, err == 0."""
    from event_streaming_service_spark.operators import dedup
    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, t), (2, t),
         (3, "totally different text with many unique words here "
             "that share nothing at all with the fox sentence")],
        "doc_id long, text string")
    rows = dedup.minhash_error_report(docs).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["est_jaccard_ppm"] == 1_000_000
    assert r["exact_jaccard_ppm"] == 1_000_000
    assert r["abs_err_ppm"] == 0
    # mae consistent across rows
    errs = [x["abs_err_ppm"] for x in rows]
    assert all(x["mae_ppm"] == sum(errs) // len(errs) for x in rows)


def test_minhash_error_report_bounded_by_ppm_domain(spark):
    from event_streaming_service_spark.operators import dedup
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    rows = [(i, base + (" shared tail of text" if i % 2 == 0 else
                        " quite different ending")) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for r in dedup.minhash_error_report(docs).collect():
        assert 0 <= r["est_jaccard_ppm"] <= 1_000_000
        assert 0 <= r["exact_jaccard_ppm"] <= 1_000_000
        assert r["abs_err_ppm"] == abs(r["est_jaccard_ppm"]
                                       - r["exact_jaccard_ppm"])


# ---- logistic regression (Newton/IRLS) ----------------------------


def _py_logit_newton(rows, rounds=3):
    """Pure-python twin of the exact pinned device: the spec the
    Spark plan and the SQL oracle must both equal bit-for-bit."""
    b = [0, 0, 0]
    n = len(rows)
    for _ in range(rounds):
        g = [0, 0, 0]
        h = {}
        for (y, x1, x2) in rows:
            z = (b[0] + b[1] * x1 + b[2] * x2) / 1e6
            p = math.floor(1e9 / (1.0 + math.exp(-z)) + 0.5)
            resid = y * 10**9 - p
            w2 = p * (10**9 - p)
            for j, xj in enumerate((1, x1, x2)):
                g[j] += resid * xj
            for (a, c), key in (((1, 1), "h11"), ((x1, 1), "h12"),
                                ((x2, 1), "h13"), ((x1, x1), "h22"),
                                ((x1, x2), "h23"), ((x2, x2), "h33")):
                h[key] = h.get(key, 0) + w2 * a * c
        h11, h12, h13 = float(h["h11"]), float(h["h12"]), float(h["h13"])
        h22, h23, h33 = float(h["h22"]), float(h["h23"]), float(h["h33"])
        g1, g2, g3 = float(g[0]), float(g[1]), float(g[2])
        det = (h11 * (h22 * h33 - h23 * h23)
               - h12 * (h12 * h33 - h23 * h13)
               + h13 * (h12 * h23 - h22 * h13))
        d1 = (g1 * (h22 * h33 - h23 * h23)
              - h12 * (g2 * h33 - h23 * g3)
              + h13 * (g2 * h23 - h22 * g3))
        d2 = (h11 * (g2 * h33 - h23 * g3)
              - g1 * (h12 * h33 - h23 * h13)
              + h13 * (h12 * g3 - g2 * h13))
        d3 = (h11 * (h22 * g3 - g2 * h23)
              - h12 * (h12 * g3 - g2 * h13)
              + g1 * (h12 * h23 - h22 * h13))
        b = [b[j] + math.floor(d / det * 1e15 + 0.5)
             for j, d in enumerate((d1, d2, d3))]
    return n, b


def test_logistic_newton_matches_python_twin(spark):
    rows = [(1 if (x1 + 2 * x2) > 10 else 0, x1, x2)
            for x1 in range(8) for x2 in range(6)]
    df = spark.createDataFrame(rows, "y int, x1 bigint, x2 bigint")
    from event_streaming_service_spark.operators.analytics import (
        logistic2_newton)
    out = logistic2_newton(df, F.col("y") == 1, "x1", "x2",
                           rounds=3).collect()
    assert len(out) == 1
    n, b = _py_logit_newton(rows, rounds=3)
    r = out[0]
    assert r["n_rows"] == n
    assert [r["b0_micro"], r["b1_micro"], r["b2_micro"]] == b
    # the learned direction matches the generating rule: both slopes
    # positive, x2's roughly double x1's
    assert b[1] > 0 and b[2] > 0
    assert 1.3 * b[1] < b[2] < 3.5 * b[1]


def test_logistic_newton_singular_features_null(spark):
    rows = [(i % 2, 5, 3) for i in range(20)]  # constant features
    df = spark.createDataFrame(rows, "y int, x1 bigint, x2 bigint")
    from event_streaming_service_spark.operators.analytics import (
        logistic2_newton)
    r = logistic2_newton(df, F.col("y") == 1, "x1", "x2",
                         rounds=2).collect()[0]
    assert r["b0_micro"] is None
    assert r["b1_micro"] is None


def test_logistic_newton_balanced_intercept_only(spark):
    """50/50 labels independent of features: after convergence the
    intercept stays near 0 (p=0.5) and slopes near 0."""
    rows = []
    for x1 in range(4):
        for x2 in range(4):
            rows.append((1, x1, x2))
            rows.append((0, x1, x2))
    df = spark.createDataFrame(rows, "y int, x1 bigint, x2 bigint")
    from event_streaming_service_spark.operators.analytics import (
        logistic2_newton)
    r = logistic2_newton(df, F.col("y") == 1, "x1", "x2",
                         rounds=3).collect()[0]
    assert abs(r["b0_micro"]) < 1000
    assert abs(r["b1_micro"]) < 1000 and abs(r["b2_micro"]) < 1000


# ---- split-conformal interval -------------------------------------


def test_conformal_exact_linear_gives_zero_width(spark):
    """y exactly linear in (x1, x2): every calibration residual is 0
    (betas recover the truth to 9dp on integer-exact data), so the
    95% half-width must be exactly 0 and the rank formula must hold."""
    from event_streaming_service_spark.operators.analytics import (
        conformal_ols2_interval)
    rows = [("g", i % 12, (i // 12) % 5 + 1,
             (2.0 * (i % 12) + 3.0 * ((i // 12) % 5 + 1) + 10.0)
             / 100.0, i)
            for i in range(3000)]
    df = spark.createDataFrame(
        rows, "grp string, x1 long, x2 long, y double, k long")
    out = conformal_ols2_interval(df, "grp", "x1", "x2", "y", "k",
                                  level_pct=95).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q_abs_resid_cents"] == 0
    assert r["q_rank"] == max(1, -(-95 * r["n_cal"] // 100))
    assert r["n_train"] + r["n_cal"] <= 3000
    assert r["n_cal"] > 0 and r["n_train"] > 0


def test_conformal_noise_widens_interval(spark):
    """Deterministic +-50-cent 'noise' on the same linear signal: the
    95% half-width must be ~50 cents (every residual is 50; the +-
    alternates within each (x1, x2) cell so the fit recovers the cell
    means and residuals stay symmetric)."""
    from event_streaming_service_spark.operators.analytics import (
        conformal_ols2_interval)
    rows = [("g", i % 12, (i // 12) % 5 + 1,
             (2.0 * (i % 12) + 3.0 * ((i // 12) % 5 + 1) + 10.0
              + (50.0 if i % 2 == 0 else -50.0)) / 100.0, i)
            for i in range(3000)]
    df = spark.createDataFrame(
        rows, "grp string, x1 long, x2 long, y double, k long")
    r = conformal_ols2_interval(df, "grp", "x1", "x2", "y", "k",
                                level_pct=95).collect()[0]
    # residuals are ~50 cents; the hash split unbalances the +- within
    # cells slightly, so the fitted means drift a few cents and the
    # 95th percentile sits in the upper part of the band
    assert 35 <= r["q_abs_resid_cents"] <= 70


# ---- readability --------------------------------------------------


def test_readability_hand_pin(spark):
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id long, text string")
    r = text.readability_scores(docs).collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    want = math.floor((206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6))
                      * 1000 + 0.5)
    assert r["flesch_milli"] == want


def test_readability_sentence_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "no terminator here"), (2, "1234. 5678!"), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in text.readability_scores(docs).collect()}
    # doc 1: no .!? at all — the trailing segment counts as ONE
    # sentence (the Flesch convention; both engines split alike)
    # doc 2: sentence splits carry no letters -> absent
    # doc 3: empty -> absent
    assert set(rows) == {1}
    assert rows[1]["n_sentences"] == 1 and rows[1]["n_words"] == 3


def test_readability_long_words_score_lower(spark):
    docs = spark.createDataFrame(
        [(1, "a big cat ran. a dog sat."),
         (2, "extraordinarily complicated vocabulary predominates "
             "notwithstanding. bureaucratic obfuscation perseveres "
             "unrelentingly.")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["flesch_milli"]
           for r in text.readability_scores(docs).collect()}
    assert out[1] > out[2]


# ---- IDF-weighted Jaccard -----------------------------------------


def test_idf_weighted_jaccard_identical_docs_full_score(spark):
    from event_streaming_service_spark.operators import dedup
    t = ("rare alpha beta gamma delta epsilon zeta eta theta "
         "iota kappa lambda")
    docs = spark.createDataFrame(
        [(1, t), (2, t),
         (3, "other words entirely unrelated to the twin documents "
             "sharing no trigram with them at all honestly")],
        "doc_id long, text string")
    rows = dedup.idf_weighted_jaccard_pairs(docs).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["shared_w"] == r["total_w_a"] == r["total_w_b"] > 0
    assert r["wjaccard_ppm"] == 1_000_000


def test_idf_weighted_jaccard_weights_and_bounds(spark):
    from event_streaming_service_spark.operators import dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base + f" tail{i} more{i} words{i}") for i in range(4)],
        "doc_id long, text string")
    for r in dedup.idf_weighted_jaccard_pairs(docs).collect():
        assert 0 <= r["wjaccard_ppm"] <= 1_000_000
        assert r["shared_w"] <= min(r["total_w_a"], r["total_w_b"])
        # weighted score <= unweighted-ish bound: shared over max side
        assert r["shared_w"] * 1_000_000 // max(
            r["total_w_a"] + r["total_w_b"] - r["shared_w"], 1) \
            == r["wjaccard_ppm"]


# ---- Welch t-test -------------------------------------------------


def test_welch_matches_hand_computation(spark):
    rows = []
    # group g: half A values {10, 12, 14, 16}, half B {20, 24, 28, 32}
    va, vb = [10.0, 12.0, 14.0, 16.0], [20.0, 24.0, 28.0, 32.0]
    eid = 0
    for v in va:
        rows.append((eid, "g", v)); eid += 2      # even ids -> A
    eid = 1
    for v in vb:
        rows.append((eid, "g", v)); eid += 2      # odd ids -> B
    df = spark.createDataFrame(rows,
                               "event_id long, event_type string,"
                               " value double")
    r = anomaly.welch_ttest(df, "event_type", "value",
                            (F.col("event_id") % 2 == 1)).collect()[0]
    import statistics
    ca = [round(v * 100) for v in va]
    cb = [round(v * 100) for v in vb]
    ma, mb = statistics.mean(ca), statistics.mean(cb)
    sa2, sb2 = statistics.variance(ca), statistics.variance(cb)
    u, w = sa2 / len(ca), sb2 / len(cb)
    t = (ma - mb) / math.sqrt(u + w)
    dof = (u + w) ** 2 / (u * u / (len(ca) - 1) + w * w / (len(cb) - 1))
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["mean_a_cents_milli"] == math.floor(ma * 1000 + 0.5)
    assert abs(r["t_milli"] - math.floor(t * 1000 + 0.5)) <= 1
    assert abs(r["df_milli"] - math.floor(dof * 1000 + 0.5)) <= 1
    assert r["t_milli"] < 0  # B mean higher


def test_welch_small_halves_null(spark):
    df = spark.createDataFrame(
        [(0, "g", 1.0), (1, "g", 2.0), (2, "g", 3.0)],
        "event_id long, event_type string, value double")
    r = anomaly.welch_ttest(df, "event_type", "value",
                            (F.col("event_id") % 2 == 1)).collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 1
    assert r["t_milli"] is None and r["df_milli"] is None


# ---- changepoint segmented regression -----------------------------


def test_changepoint_recovers_planted_break(spark):
    """Two exact lines meeting at t=731: SSE is exactly 0 only at the
    matching grid candidate, and both side slopes come out exact."""
    from event_streaming_service_spark.operators.analytics import (
        changepoint_ols)
    rows = []
    for t in range(0, 1500, 3):
        yc = 100 * t if t < 731 else 100 * 731 + 300 * (t - 731)
        rows.append((t, yc / 100.0))
    df = spark.createDataFrame(rows, "t long, y double")
    out = {r["brk"]: r for r in
           changepoint_ols(df, "t", "y",
                           (365, 731, 1096, 1461)).collect()}
    assert out[731]["is_best"] == 1
    assert out[731]["sse_total_e6"] == 0
    assert out[731]["slope_left_micro"] == 100 * 1_000_000
    assert out[731]["slope_right_micro"] == 300 * 1_000_000
    assert sum(r["is_best"] for r in out.values()) == 1
    for b in (365, 1096, 1461):
        assert out[b]["sse_total_e6"] > 0
    # side counts partition the input at every candidate
    for r in out.values():
        assert r["n_left"] + r["n_right"] == len(rows)


def test_changepoint_degenerate_side_mean_only(spark):
    """A candidate with a single-t side uses the mean-only SSE and a
    NULL slope instead of dividing by a zero moment."""
    from event_streaming_service_spark.operators.analytics import (
        changepoint_ols)
    rows = [(0, 1.0), (0, 3.0), (10, 5.0), (20, 7.0), (30, 9.0)]
    df = spark.createDataFrame(rows, "t long, y double")
    out = {r["brk"]: r for r in
           changepoint_ols(df, "t", "y", (5, 15)).collect()}
    r5 = out[5]          # left side: two rows both at t=0
    assert r5["n_left"] == 2
    assert r5["slope_left_micro"] is None
    # mean-only SSE of {100, 300} cents = 2*100^2 = 20000 cents^2
    # -> floor(20000/1e6 + 0.5) = 0 in e6 units
    assert r5["sse_total_e6"] is not None


# ---- skip-gram pairs + sampling tables ----------------------------


def test_skipgram_window_semantics(spark):
    docs = spark.createDataFrame([(1, "a b c d")],
                                 "doc_id long, text string")
    out = {(r["center"], r["context"]): r["pair_count"]
           for r in text.skipgram_pairs(docs, window=2,
                                        top_n=50).collect()}
    # within-window pairs exist both directions
    assert out[("a", "b")] == 1 and out[("b", "a")] == 1
    assert out[("a", "c")] == 1 and out[("c", "a")] == 1
    # distance 3 excluded at window 2
    assert ("a", "d") not in out and ("d", "a") not in out
    # total pairs: sum over positions of in-bounds offsets
    assert sum(out.values()) == 10


def test_skipgram_counts_aggregate_across_docs(spark):
    docs = spark.createDataFrame([(1, "x y"), (2, "x y"), (3, "y x")],
                                 "doc_id long, text string")
    out = {(r["center"], r["context"]): r["pair_count"]
           for r in text.skipgram_pairs(docs, window=2,
                                        top_n=50).collect()}
    assert out[("x", "y")] == 3 and out[("y", "x")] == 3


def test_negative_sampling_hand_computation(spark):
    # counts: 'w' x16, 'r' x1 -> p75 = 8e6 and 1e6, z = 9e6
    docs = spark.createDataFrame([(1, " ".join(["w"] * 16 + ["r"]))],
                                 "doc_id long, text string")
    out = {r["tok"]: r for r in
           text.negative_sampling_table(docs, top_n=10).collect()}
    assert out["w"]["c"] == 16 and out["r"]["c"] == 1
    assert out["w"]["ns_ppm"] == 8_000_000 * 1_000_000 // 9_000_000
    assert out["r"]["ns_ppm"] == 1_000_000 * 1_000_000 // 9_000_000
    # keep probability follows the exact formula (at a 17-token
    # corpus every word is 'frequent' relative to t=1e-5, so nothing
    # clamps — the clamp only engages when f < ~4t); rarer tokens
    # keep strictly more
    for tok, c in (("w", 16), ("r", 1)):
        x = 1e-5 * 17 / c
        want = min(1_000_000,
                   math.floor((math.sqrt(x) + x) * 1e6 + 0.5))
        assert out[tok]["keep_ppm"] == want
    assert out["w"]["keep_ppm"] < out["r"]["keep_ppm"]


def test_negative_sampling_keep_formula(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 90 + ["b"] * 10))],
        "doc_id long, text string")
    out = {r["tok"]: r for r in
           text.negative_sampling_table(docs, top_n=10).collect()}
    n = 100
    for tok, c in (("a", 90), ("b", 10)):
        x = 1e-5 * n / c
        want = min(1_000_000,
                   math.floor((math.sqrt(x) + x) * 1e6 + 0.5))
        assert out[tok]["keep_ppm"] == want


# ---- Gopher quality rules -----------------------------------------


def test_gopher_rules_hand_cases(spark):
    good = " ".join(
        ["the quick brown foxes and wolves sprint through it on"] * 6)
    short = "too short"
    symbols = " ".join(["@@@@ ####"] * 40)
    bullets = "\n".join(["- item one two three"] * 10)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.gopher_quality_flags(docs).collect()}
    g = out[1]
    assert g["n_words"] == 60 and g["passes_gopher"] == 1
    assert out[2]["ok_word_count"] == 0 and out[2]["passes_gopher"] == 0
    s = out[3]
    assert s["ok_alpha"] == 0 and s["ok_stopwords"] == 0
    assert s["alpha_word_ppm"] == 0
    b = out[4]
    assert b["bullet_line_ppm"] == 1_000_000
    assert b["ok_bullets"] == 0


def test_gopher_measures_exact(spark):
    docs = spark.createDataFrame(
        [(1, "one line...\n- bullet line\nplain line here")],
        "doc_id long, text string")
    r = text.gopher_quality_flags(docs).collect()[0]
    assert r["n_lines"] == 3
    assert r["ellipsis_line_ppm"] == 1_000_000 // 3
    assert r["bullet_line_ppm"] == 1_000_000 // 3
    assert r["n_words"] == 8
    # chars: oneline...(11)+-(1)+bullet(6)+line(4)+plain(5)+line(4)
    #        +here(4) + 'line'(4 from first line? no: 'one','line...')
    chars = sum(len(w) for w in
                "one line... - bullet line plain line here".split())
    assert r["mean_word_len_milli"] == chars * 1000 // 8


def test_gopher_empty_doc_fails(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = text.gopher_quality_flags(docs).collect()[0]
    assert r["n_words"] == 0 and r["passes_gopher"] == 0
