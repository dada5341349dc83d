"""Language-model-flavored text scoring (round 7): token entropy,
unigram-LM log-likelihood, BM25 retrieval scores, n-gram novelty.

Float discipline: every logarithm is a single float op on
exact-integer operands, pinned to integer micro/nano units with
floor(x·scale + 0.5) BEFORE any cross-row sum — so no aggregation
order can drift a hash. Ratios are truncating integer division
(Spark DIV == DuckDB // on every sign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_TOK = (r"SELECT doc_id, tok FROM (SELECT doc_id,"
        r" unnest(string_split_regex(text, '\s+')) AS tok"
        r" FROM documents) WHERE tok <> ''")

BM25_TERMS = ("join", "hash", "scan", "window", "stream")
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "documents")


@register(
    "token_entropy_per_doc",
    oracle=f"""
    WITH tc AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM ({_TOK})
        GROUP BY doc_id, tok),
    per AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
               CAST(SUM(c * CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e9
                                       + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM tc GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct_tokens,
           ROUND(LN(CAST(n_tokens AS DOUBLE))
                 - (CAST(s AS DOUBLE) / 1.0e9)
                   / CAST(n_tokens AS DOUBLE), 6) AS entropy
    FROM per
    """,
    tags=("text", "quality", "entropy", "token-count"),
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each doc's token distribution (ln(c) pinned
    to integer nano-nats before the exact bigint fold)."""
    return text.token_entropy(_docs(spark, sf_dir))


@register(
    "unigram_lm_scores",
    oracle=f"""
    WITH tok AS ({_TOK}),
    v AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM v),
    lm AS (SELECT tok,
                  CAST(FLOOR((LN(CAST(c AS DOUBLE))
                              - LN(CAST(n_total AS DOUBLE))) * 1e6
                             + 0.5) AS BIGINT) AS lp
           FROM v, t)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lp) AS BIGINT) AS total_logprob_micro,
           CAST(CAST(SUM(lp) AS BIGINT) // COUNT(*) AS BIGINT)
               AS avg_logprob_micro
    FROM tok JOIN lm USING (tok) GROUP BY doc_id
    """,
    tags=("text", "lm", "quality", "token-count"),
)
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM log-likelihood per document — the
    cheapest perplexity proxy for curriculum ranking."""
    return text.unigram_lm_scores(_docs(spark, sf_dir))


@register(
    "bm25_doc_scores",
    oracle=f"""
    WITH tok AS ({_TOK}),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(dl) AS BIGINT) AS total_dl
           FROM dl),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
           WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    sc AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                   LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                       + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * ((CAST(tf AS DOUBLE) * 2.2)
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
                                  / (CAST(total_dl AS DOUBLE)
                                     / CAST(n_docs AS DOUBLE)))))
                   * 1e6 + 0.5) AS BIGINT) AS m
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
           CAST(SUM(m) AS BIGINT) AS bm25_micro
    FROM sc GROUP BY doc_id
    """,
    tags=("text", "bm25", "tfidf", "token-count"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) of every document against a fixed
    query-term set; per-term scores pinned to micro-units before the
    exact per-doc sum."""
    return text.bm25_scores(_docs(spark, sf_dir), BM25_TERMS)


@register(
    "ngram_novelty_ratio",
    oracle=r"""
    WITH s AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 3, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3] || ' ' || toks[i+4])))
                   AS shingle
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 t -> t <> '') AS toks
              FROM documents)
        WHERE len(toks) >= 5),
    f AS (SELECT doc_id, shingle,
                 MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
          FROM s)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (first_doc < doc_id) AS BIGINT)
               AS n_seen_before,
           CAST((COUNT(*) - COUNT(*) FILTER (first_doc < doc_id))
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM f GROUP BY doc_id
    """,
    tags=("text", "fingerprint", "dedup-jaccard", "novelty"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 5-gram novelty vs all earlier documents (ingestion
    order by id): exact ppm of shingles first seen here."""
    return text.ngram_novelty(_docs(spark, sf_dir), n=5)


@register(
    "zipf_slope_tokens",
    oracle=f"""
    WITH tok AS ({_TOK}),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
             FROM tok GROUP BY tok),
    r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rnk
          FROM freq),
    head AS (SELECT CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * 1000000
                               + 0.5) AS HUGEINT) AS lx,
                    CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000
                               + 0.5) AS HUGEINT) AS ly
             FROM r WHERE rnk <= 1000),
    s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 SUM(lx) AS sx, SUM(ly) AS sy, SUM(lx * ly) AS sxy,
                 SUM(lx * lx) AS sxx
          FROM head)
    SELECT CAST(n AS BIGINT) AS n_tokens_fit,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS zipf_slope
    FROM s
    """,
    tags=("text", "zipf", "token-count", "tfidf"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus head: OLS slope of ln(freq) vs
    ln(rank) for the top-1000 tokens (a healthy natural corpus sits
    near -1). Logs are micro-pinned per point BEFORE the exact
    integer moment sums (pin-before-sum); the rank is the distributed
    global_rank, and the single final division rounds at 9 dp like
    pearson_corr."""
    from event_streaming_service_spark.operators.linkage import (
        global_rank,
    )
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(text.tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = global_rank(
        freq.select("tok", "f", (-F.col("f")).alias("__nf")),
        ["__nf", "tok"])
    head = (ranked.filter(F.col("rank") <= 1000)
            .select(
                F.floor(F.log(F.col("rank").cast("double"))
                        * 1_000_000 + F.lit(0.5))
                .cast("decimal(38,0)").alias("lx"),
                F.floor(F.log(F.col("f").cast("double"))
                        * 1_000_000 + F.lit(0.5))
                .cast("decimal(38,0)").alias("ly")))
    s = head.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_tokens_fit"),
        F.round(num / den, 9).alias("zipf_slope"))


@register(
    "kn_bigram_lm_scores",
    oracle=rf"""
    WITH b AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 t -> t <> '') AS t
              FROM documents),
             LATERAL (SELECT unnest(range(1, len(t))) AS i)
        WHERE len(t) >= 2),
    cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY w1, w2),
    ch AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  COUNT(*) AS n1p_fwd
           FROM cb GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1p_back FROM cb GROUP BY w2),
    tot AS (SELECT COUNT(*) AS nbt FROM cb),
    lm AS (SELECT cb.w1, cb.w2,
                  CAST(FLOOR(LN((CAST(c12 AS DOUBLE) - 0.75)
                      / CAST(c1 AS DOUBLE)
                      + 0.75 * CAST(n1p_fwd AS DOUBLE)
                        / CAST(c1 AS DOUBLE)
                      * (CAST(n1p_back AS DOUBLE)
                         / CAST(nbt AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS lp
           FROM cb JOIN ch USING (w1) JOIN cont USING (w2), tot),
    dbc AS (SELECT doc_id, w1, w2, COUNT(*) AS n
            FROM b GROUP BY doc_id, w1, w2)
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           CAST(SUM(n * lp) AS BIGINT) AS total_logprob_micro,
           CAST(CAST(SUM(n * lp) AS BIGINT)
                // CAST(SUM(n) AS BIGINT) AS BIGINT)
               AS avg_logprob_micro
    FROM dbc JOIN lm USING (w1, w2) GROUP BY doc_id
    """,
    tags=("text", "lm", "quality", "token-count"),
)
def q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM log-likelihood per document
    (operators/text.py:kn_bigram_lm_scores) — the real LM quality
    score the unigram proxy approximates: absolute discount D=0.75,
    continuation-count backoff (a word's unseen-history mass is how
    many DISTINCT contexts it follows), every distinct bigram's
    log-prob one pinned literal float sequence, per-doc totals exact
    integer dot products."""
    return text.kn_bigram_lm_scores(_docs(spark, sf_dir))


@register(
    "lm_quality_filter_en",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS dom,
               tok
        FROM (SELECT doc_id, lang,
                     unnest(string_split_regex(text, '\s+')) AS tok
              FROM documents)
        WHERE tok <> ''),
    v AS (SELECT tok, COUNT(*) AS c_all,
                 CAST(SUM(dom) AS BIGINT) AS c_dom
          FROM tok GROUP BY tok),
    t AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_all,
                 CAST(SUM(c_dom) AS BIGINT) AS n_dom,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM v),
    lm AS (SELECT tok,
                  CAST(FLOOR((LN(CAST(c_dom AS DOUBLE) + 1.0)
                      - LN(CAST(n_dom AS DOUBLE) + CAST(v AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS lp_dom,
                  CAST(FLOOR((LN(CAST(c_all AS DOUBLE) + 1.0)
                      - LN(CAST(n_all AS DOUBLE) + CAST(v AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS lp_all
           FROM v, t),
    per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(lp_dom) AS BIGINT) AS td,
                   CAST(SUM(lp_all) AS BIGINT) AS tg
            FROM tok JOIN lm USING (tok) GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           CAST(td // n_tokens AS BIGINT) AS avg_domain_lp_micro,
           CAST(tg // n_tokens AS BIGINT) AS avg_general_lp_micro,
           CAST(td // n_tokens - tg // n_tokens AS BIGINT)
               AS delta_micro
    FROM per
    """,
    tags=("text", "lm", "quality", "lang-id", "sampling"),
)
def q_lm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-ratio filter
    (operators/text.py:lm_quality_filter): per-doc gap between the
    English-domain unigram LM and the general corpus LM, both
    Laplace-smoothed over the shared vocabulary — the canonical cheap
    scorer for carving a domain mixture out of a heterogeneous crawl.
    delta_micro > 0 reads 'more in-domain than average'."""
    docs = _docs(spark, sf_dir)
    return text.lm_quality_filter(docs, F.col("lang") == "en")


@register(
    "dirichlet_ql_scores",
    oracle=f"""
    WITH tok AS ({_TOK}),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
    cf AS (SELECT tok, COUNT(*) AS cf FROM tok
           WHERE tok IN ({_TERMS_SQL}) GROUP BY tok),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
           WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok),
    base AS (
        SELECT dl.doc_id, dl.dl, cf.tok, cf.cf, nt.n_total,
               COALESCE(tf.tf, 0) AS tf
        FROM dl CROSS JOIN cf CROSS JOIN nt
        LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.tok = cf.tok),
    sc AS (
        SELECT doc_id, tf,
               CAST(FLOOR(LN((CAST(tf AS DOUBLE)
                   + 2000.0 * CAST(cf AS DOUBLE)
                   / CAST(n_total AS DOUBLE))
                   / (CAST(dl AS DOUBLE) + 2000.0))
                   * 1000000.0 + 0.5) AS BIGINT) AS m
        FROM base)
    SELECT doc_id,
           CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_terms_hit,
           CAST(SUM(m) AS BIGINT) AS ql_micro
    FROM sc GROUP BY doc_id
    """,
    tags=("text", "lm", "retrieval", "token-count"),
)
def q_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001, mu
    = 2000) of every document against the BM25 query-term set
    (operators/text.py:dirichlet_ql_scores) — the probabilistic
    lexical ranker next to BM25: absent terms contribute the
    background collection model, so every document with tokens
    scores and scores are comparable corpus-wide."""
    return text.dirichlet_ql_scores(_docs(spark, sf_dir), BM25_TERMS)


@register(
    "vocab_growth_by_lang",
    oracle=r"""
    WITH tok AS (
        SELECT lang AS grp, tok
        FROM (SELECT lang,
                     unnest(string_split_regex(text, '\s+')) AS tok
              FROM documents)
        WHERE tok <> ''),
    tc AS (SELECT grp, tok, COUNT(*) AS c FROM tok GROUP BY grp, tok),
    g AS (SELECT grp,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                 CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
          FROM tc GROUP BY grp)
    SELECT grp AS lang, n_tokens, vocab_size, f1, f2,
           CAST(vocab_size * 1000
                + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
                AS BIGINT) AS chao1_x1000,
           CAST(f1 * 1000000 // n_tokens AS BIGINT)
               AS unseen_mass_ppm
    FROM g
    """,
    tags=("text", "token-count", "quality", "lang-id"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound + Good-Turing unseen
    mass per language (operators/text.py:vocab_growth_estimates) —
    the 'is more data still growing the vocab' readout tokenizer and
    crawl pipelines gate on. Exact integer arithmetic end to end."""
    return text.vocab_growth_estimates(_docs(spark, sf_dir))


@register(
    "readability_scores",
    oracle=r"""
    WITH c AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    t -> t <> '')) AS BIGINT)
                   AS n_words,
               CAST(len(list_filter(string_split_regex(text,
                                                       '[.!?]+'),
                        s -> regexp_matches(s, '[A-Za-z]')))
                    AS BIGINT) AS n_sentences,
               CAST(list_sum(list_transform(
                   list_filter(string_split_regex(text, '\s+'),
                               t -> t <> ''),
                   w -> GREATEST(
                       len(regexp_extract_all(w, '[aeiouyAEIOUY]+')),
                       CASE WHEN regexp_matches(w, '[A-Za-z]')
                            THEN 1 ELSE 0 END)))
                    AS BIGINT) AS n_syllables
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(FLOOR((206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE))) * 1000.0 + 0.5)
               AS BIGINT) AS flesch_milli
    FROM c
    WHERE n_words > 0 AND n_sentences > 0
    """,
    tags=("text", "quality", "token-count"),
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document
    (operators/text.py:readability_scores): exact integer
    word/sentence/vowel-run counts, one shared float spelling pinned
    to milli-points — the audience-level curation signal next to the
    length/stopword quality heuristics."""
    return text.readability_scores(_docs(spark, sf_dir))


@register(
    "skipgram_pairs_top",
    oracle=r"""
    WITH d AS (
        SELECT list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '') AS t
        FROM documents),
    p AS (
        SELECT t[i] AS center, t[i + o] AS context
        FROM (SELECT t FROM d WHERE len(t) >= 2),
             LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i),
             LATERAL (SELECT unnest([-2, -1, 1, 2]) AS o)
        WHERE i + o >= 1 AND i + o <= len(t))
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM p GROUP BY 1, 2
    ORDER BY pair_count DESC, center, context
    LIMIT 50
    """,
    tags=("text", "token-count", "collocation", "embedding"),
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair counts within a +-2 window,
    corpus top-50 (operators/text.py:skipgram_pairs) — word2vec's
    data-prep grain: pair generation is a pure bounds-checked array
    expression (no join, no Python), one hash aggregate, distributed
    top-n."""
    return text.skipgram_pairs(_docs(spark, sf_dir), window=2,
                               top_n=50)


@register(
    "negative_sampling_table",
    oracle=rf"""
    WITH tok AS (
        SELECT tok FROM (SELECT unnest(string_split_regex(text,
                                                          '\s+'))
                             AS tok
                         FROM documents)
        WHERE tok <> ''),
    v AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    vv AS (SELECT tok, c,
                  CAST(FLOOR(POW(CAST(c AS DOUBLE), 0.75)
                             * 1000000.0 + 0.5) AS BIGINT) AS p75
           FROM v),
    tot AS (SELECT CAST(SUM(p75) AS BIGINT) AS z,
                   CAST(SUM(c) AS BIGINT) AS n_total
            FROM vv)
    SELECT tok, CAST(c AS BIGINT) AS c,
           CAST(p75 * 1000000 // z AS BIGINT) AS ns_ppm,
           LEAST(CAST(1000000 AS BIGINT), CAST(FLOOR(
               (SQRT({float(1e-5)} * CAST(n_total AS DOUBLE)
                     / CAST(c AS DOUBLE))
                + {float(1e-5)} * CAST(n_total AS DOUBLE)
                / CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
               AS keep_ppm
    FROM vv, tot
    ORDER BY c DESC, tok
    LIMIT 100
    """,
    tags=("text", "token-count", "sampling", "lm", "embedding"),
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec sampling tables for the corpus top-100 tokens
    (operators/text.py:negative_sampling_table): smoothed-unigram
    negative-sampling weights (c^0.75, per-type pinned then exactly
    normalized to ppm) and the t=1e-5 frequency-subsampling keep
    probability — the two distributions every embedding-training
    pipeline precomputes."""
    return text.negative_sampling_table(_docs(spark, sf_dir),
                                        top_n=100)
