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
