"""Text-analysis queries over `documents` (SURVEY.md section 2.12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_STOPS_SQL = ", ".join(f"'{s}'" for s in text.STOPWORDS)

# Shared SQL fragments mirroring operators/text.py exactly.
_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
_STOP_RATIO = (f"len(list_filter({_TOKS}, t -> lower(t) IN ({_STOPS_SQL})))"
               f" * 1.0 / greatest(len({_TOKS}), 1)")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "documents")


@register(
    "token_stats_per_doc",
    oracle=r"""
    SELECT doc_id, COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct_tokens,
           SUM(LENGTH(tok)) * 1.0 / COUNT(*) AS avg_token_len
    FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id
    """,
    tags=("text", "token-count"),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: total / distinct / mean length per document."""
    return text.token_stats(_docs(spark, sf_dir))


@register(
    "language_id_heuristic",
    oracle=f"""
    SELECT doc_id,
           {_STOP_RATIO} AS stop_ratio,
           CASE WHEN {_STOP_RATIO} >= 0.03 THEN 'en' ELSE 'unknown' END
               AS lang_guess
    FROM documents
    """,
    tags=("text", "lang-id"),
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword density.

    Computed explode->aggregate (one shuffle on doc_id) rather than as
    array lambdas per row: Catalyst's CollapseProject re-inlines a
    projected token array into every consumer, re-running the regex
    split several times per row — the aggregate form tokenizes once.
    """
    counts = _token_counts(spark, sf_dir)
    ratio = F.col("n_stops") * 1.0 / F.greatest(F.col("n_toks"), F.lit(1))
    return counts.select(
        "doc_id",
        ratio.alias("stop_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("unknown"))
         .alias("lang_guess"))


@register(
    "langid_ngram_confusion",
    oracle="""
    WITH base AS MATERIALIZED (
        SELECT doc_id, lang, lower(text) AS t
        FROM documents WHERE length(text) >= 3),
    grams AS MATERIALIZED (
        SELECT doc_id, lang, substr(t, CAST(i AS INTEGER), 3) AS g
        FROM base,
             LATERAL (SELECT unnest(range(1, length(t) - 1)) AS i)),
    prof AS (
        SELECT lang AS plang, g, COUNT(*) AS c
        FROM grams GROUP BY 1, 2),
    profile AS MATERIALIZED (
        SELECT plang, g FROM (
            SELECT plang, g,
                   ROW_NUMBER() OVER (PARTITION BY plang
                                      ORDER BY c DESC, g) AS r
            FROM prof)
        WHERE r <= 200),
    dg AS (SELECT DISTINCT doc_id, g FROM grams),
    scores AS (
        SELECT d.doc_id, p.plang, COUNT(*) AS m
        FROM dg d JOIN profile p USING (g) GROUP BY 1, 2),
    pred AS (
        SELECT doc_id, plang FROM (
            SELECT doc_id, plang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY m DESC, plang) AS r
            FROM scores)
        WHERE r = 1)
    SELECT b.lang AS true_lang,
           COALESCE(p.plang, 'unknown') AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM base b LEFT JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    """,
    tags=("text", "lang-id", "ml-eval"),
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language classifier scored against the
    corpus's own labels (operators/text.py:langid_ngram_confusion):
    top-200 trigram profile per language, distinct-overlap argmax
    prediction, confusion matrix output — the self-evaluating upgrade
    of the stopword-density heuristic (language_id_heuristic)."""
    return text.langid_ngram_confusion(_docs(spark, sf_dir))


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token aggregates shared by language-ID and quality:
    tokenize once, explode, count — ONE shuffle, no join. explode_outer
    + count(tok) keeps token-less docs at zero counts, matching the
    per-row array semantics."""
    docs = _docs(spark, sf_dir)
    tok = text.fan_out(docs).select(
        "doc_id", "n_chars",
        F.explode_outer(text.tokens(F.col("text"))).alias("tok"))
    # two-level aggregate instead of countDistinct: the (doc, tok) level
    # map-side-combines the exploded rows before the one shuffle, where
    # countDistinct would Expand and shuffle the full exploded set
    per_tok = tok.groupBy("doc_id", "n_chars", "tok").agg(
        F.count("*").alias("cnt"))
    return per_tok.groupBy("doc_id", "n_chars").agg(
        F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt")).otherwise(0))
            .alias("n_toks"),
        F.count("tok").alias("n_distinct"),
        F.sum(F.when(F.lower("tok").isin(*text.STOPWORDS), F.col("cnt"))
              .otherwise(0)).alias("n_stops"),
        F.sum(F.when(F.col("tok").isNotNull(),
                     F.length("tok") * F.col("cnt")).otherwise(0))
            .alias("n_tok_chars"))


@register(
    "quality_scores",
    oracle=f"""
    SELECT doc_id,
           LEAST(n_chars / 500.0, 1.0) * 0.4
           + LEAST(len(list_distinct({_TOKS})) * 1.0
                   / greatest(len({_TOKS}), 1) * 2.0, 1.0) * 0.3
           + LEAST({_STOP_RATIO} * 10.0, 1.0) * 0.3 AS quality
    FROM documents
    """,
    tags=("text", "quality"),
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + vocabulary + stopword components
    (explode->aggregate form; see q_language_id for why)."""
    counts = _token_counts(spark, sf_dir)
    n_toks = F.greatest(F.col("n_toks"), F.lit(1))
    len_c = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    vocab_c = F.least(F.col("n_distinct") * 1.0 / n_toks * 2.0, F.lit(1.0))
    stop_c = F.least(F.col("n_stops") * 1.0 / n_toks * 10.0, F.lit(1.0))
    return counts.select(
        "doc_id", (len_c * 0.4 + vocab_c * 0.3 + stop_c * 0.3).alias("quality"))


@register(
    "doc_text_metrics",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_distinct_tokens,
               CAST(SUM(LENGTH(tok)) AS BIGINT) AS n_tok_chars,
               CAST(SUM(CASE WHEN lower(tok) IN ({_STOPS_SQL})
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_stops
        FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_distinct_tokens, 0) AS BIGINT)
               AS n_distinct_tokens,
           CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN NULL
                ELSE a.n_tok_chars * 1.0 / a.n_tokens END AS avg_token_len,
           COALESCE(a.n_stops, 0) * 1.0
               / GREATEST(COALESCE(a.n_tokens, 0), 1) AS stop_ratio,
           CASE WHEN COALESCE(a.n_stops, 0) * 1.0
                     / GREATEST(COALESCE(a.n_tokens, 0), 1) >= 0.03
                THEN 'en' ELSE 'unknown' END AS lang_guess,
           LEAST(d.n_chars / 500.0, 1.0) * 0.4
           + LEAST(COALESCE(a.n_distinct_tokens, 0) * 1.0
                   / GREATEST(COALESCE(a.n_tokens, 0), 1) * 2.0, 1.0) * 0.3
           + LEAST(COALESCE(a.n_stops, 0) * 1.0
                   / GREATEST(COALESCE(a.n_tokens, 0), 1) * 10.0, 1.0) * 0.3
               AS quality
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("text", "token-count", "lang-id", "quality"),
)
def q_doc_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-analysis panel in one aggregate: token
    counts (total/distinct/mean length), stopword density + language-ID
    heuristic, and the composite quality score. Tokenize once, explode,
    two-level hash agg — ONE shuffle for all seven metrics where the
    separate queries each paid their own."""
    counts = _token_counts(spark, sf_dir)
    n_toks_safe = F.greatest(F.col("n_toks"), F.lit(1))
    ratio = F.col("n_stops") * 1.0 / n_toks_safe
    len_c = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    vocab_c = F.least(F.col("n_distinct") * 1.0 / n_toks_safe * 2.0, F.lit(1.0))
    stop_c = F.least(ratio * 10.0, F.lit(1.0))
    return counts.select(
        "doc_id",
        F.col("n_toks").cast("bigint").alias("n_tokens"),
        F.col("n_distinct").cast("bigint").alias("n_distinct_tokens"),
        F.when(F.col("n_toks") == 0, F.lit(None).cast("double"))
         .otherwise(F.col("n_tok_chars") * 1.0 / F.col("n_toks"))
         .alias("avg_token_len"),
        ratio.alias("stop_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("unknown"))
         .alias("lang_guess"),
        (len_c * 0.4 + vocab_c * 0.3 + stop_c * 0.3).alias("quality"),
    )


_BPE_SQL = text.BPE_SPLIT_PATTERN.replace("'", "''")


@register(
    "token_stats_bpe",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{_BPE_SQL}')) AS tok
        FROM documents
    ), ws AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\s+'),
                               t -> t <> '')) AS n_ws_tokens
        FROM documents
    )
    SELECT w.doc_id,
           CAST(COALESCE(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct_bpe,
           CAST(w.n_ws_tokens AS BIGINT) AS n_ws_tokens,
           CASE WHEN w.n_ws_tokens = 0 THEN NULL
                ELSE COALESCE(a.n_bpe_tokens, 0) * 1.0 / w.n_ws_tokens
                END AS bpe_per_ws
    FROM ws w LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_bpe_tokens,
               COUNT(DISTINCT tok) AS n_distinct
        FROM tok GROUP BY doc_id
    ) a USING (doc_id)
    """,
    tags=("text", "token-count"),
)
def q_token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over the BPE-ish regex split: per-doc BPE-unit
    counts, distincts, and the BPE-per-whitespace-token ratio used for
    training-data token budgeting. Same explode -> two-level aggregate
    shape as the whitespace path (one shuffle)."""
    docs = _docs(spark, sf_dir)
    base = text.fan_out(docs).select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).alias("n_ws_tokens"),
        F.explode_outer(text.bpe_tokens(F.col("text"))).alias("tok"))
    per_tok = base.groupBy("doc_id", "n_ws_tokens", "tok").agg(
        F.count("*").alias("cnt"))
    agg = per_tok.groupBy("doc_id", "n_ws_tokens").agg(
        F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("bigint").alias("n_bpe_tokens"),
        F.count("tok").cast("bigint").alias("n_distinct_bpe"))
    return agg.select(
        "doc_id", "n_bpe_tokens", "n_distinct_bpe",
        F.col("n_ws_tokens").cast("bigint").alias("n_ws_tokens"),
        F.when(F.col("n_ws_tokens") == 0, F.lit(None).cast("double"))
         .otherwise(F.col("n_bpe_tokens") * 1.0 / F.col("n_ws_tokens"))
         .alias("bpe_per_ws"))


@register(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id, md5(text) AS fp_exact,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(text, '\s+'), t -> t <> ''))), ' '))
               AS fp_token_set
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact md5 + order-insensitive token-set md5."""
    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        text.fingerprint_exact(t).alias("fp_exact"),
        text.fingerprint_token_set(t).alias("fp_token_set"))


@register(
    "repetition_stats",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
        FROM documents),
    grams AS (
        SELECT doc_id, len(toks) AS n_tokens,
               greatest(len(toks) - 1, 0) AS total2,
               CASE WHEN len(toks) >= 2 THEN
                   len(list_distinct(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])))
               ELSE 0 END AS distinct2,
               greatest(len(toks) - 2, 0) AS total3,
               CASE WHEN len(toks) >= 3 THEN
                   len(list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               ELSE 0 END AS distinct3,
               toks
        FROM base),
    top AS (
        SELECT doc_id, MAX(c) AS top_count FROM (
            SELECT doc_id, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
            GROUP BY doc_id, tok)
        GROUP BY doc_id)
    SELECT g.doc_id, CAST(g.n_tokens AS BIGINT) AS n_tokens,
           ROUND(CASE WHEN total2 > 0
                      THEN (total2 - distinct2) * 1.0 / total2
                      ELSE 0.0 END, 6) AS dup_2gram_ratio,
           ROUND(CASE WHEN total3 > 0
                      THEN (total3 - distinct3) * 1.0 / total3
                      ELSE 0.0 END, 6) AS dup_3gram_ratio,
           ROUND(CASE WHEN g.n_tokens > 0
                      THEN t.top_count * 1.0 / g.n_tokens
                      ELSE 0.0 END, 6) AS top_token_ratio
    FROM grams g LEFT JOIN top t USING (doc_id)
    """,
    tags=("text", "quality", "repetition"),
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition filters: duplicate 2-/3-gram fractions
    (per-row array arithmetic, zero shuffle) and most-common-token
    share (explode + two hash aggregates — linear in doc length where
    an in-array count would be quadratic)."""
    return text.repetition_stats(_docs(spark, sf_dir))


@register(
    "doc_chunks_rag",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           x -> x <> '') AS toks
        FROM documents),
    c AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    e AS (SELECT doc_id, toks,
                 unnest(generate_series(
                     0,
                     CAST(CASE WHEN n <= 64 THEN 1
                               ELSE (n - 64 + 47) // 48 + 1
                          END AS BIGINT) - 1)) AS chunk_id
          FROM c)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 48 + 1 AS BIGINT) AS start_tok,
           CAST(len(toks[(chunk_id*48+1):(chunk_id*48+64)])
                AS BIGINT) AS n_tokens,
           md5(array_to_string(toks[(chunk_id*48+1):(chunk_id*48+64)],
                               ' ')) AS chunk_md5
    FROM e
    """,
    tags=("text", "token-count", "chunking"),
)
def q_doc_chunks_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 64-token windows advancing by 48 (16-token
    overlap) per document; window content pinned by md5 of the
    rejoined slice (operators/text.py:doc_chunks)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return text.doc_chunks(docs, size=64, stride=48)


_RAKE_STOP_RE = (r"\b(" + "|".join(text.RAKE_STOPWORDS) + r")\b")


@register(
    "rake_keyphrases_top20",
    oracle=rf"""
    WITH cleaned AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '#', 'g'),
                   '{_RAKE_STOP_RE}', '#', 'g') AS t
        FROM documents),
    seg AS (SELECT doc_id, unnest(string_split(t, '#')) AS p
            FROM cleaned),
    phr0 AS (SELECT doc_id,
                    list_filter(string_split_regex(trim(p), ' +'),
                                x -> x <> '') AS toks
             FROM seg),
    phr AS (SELECT doc_id, toks FROM phr0 WHERE len(toks) >= 1),
    words AS (SELECT CAST(len(toks) AS BIGINT) AS plen,
                     unnest(toks) AS w
              FROM phr),
    ws AS (SELECT w,
                  CAST(SUM(plen) * 1000 // COUNT(*) AS BIGINT)
                      AS wscore
           FROM words GROUP BY w),
    cand AS (SELECT array_to_string(toks, ' ') AS phrase,
                    unnest(toks) AS w
             FROM phr WHERE len(toks) BETWEEN 2 AND 4),
    sc AS (SELECT phrase,
                  CAST(SUM(wscore) AS BIGINT) AS inst_sum,
                  CAST(COUNT(*) AS BIGINT) AS words_total
           FROM cand JOIN ws USING (w) GROUP BY phrase)
    SELECT phrase,
           CAST(words_total // len(string_split(phrase, ' '))
                AS BIGINT) AS n_occurrences,
           CAST(inst_sum // (words_total
                             // len(string_split(phrase, ' ')))
                AS BIGINT) AS score_milli
    FROM sc
    ORDER BY score_milli DESC, n_occurrences DESC, phrase LIMIT 20
    """,
    tags=("text", "keyphrases", "tfidf", "quality"),
)
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction: stopword/punctuation-delimited
    candidate runs scored by summed deg/freq word scores in integer
    milli-units; top-20 2..4-word phrases
    (operators/text.py:rake_keyphrases)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return text.rake_keyphrases(docs)


@register(
    "longest_repeated_ngram",
    oracle=r"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           x -> x <> '') AS ts,
               len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '')) AS T
        FROM documents),
    ns AS (SELECT doc_id, ts, T,
                  unnest(range(1, least(24, T - 1) + 1)) AS n
           FROM base),
    grams AS (SELECT doc_id, n,
                     array_to_string(list_slice(ts, i, i + n - 1),
                                     ' ') AS g
              FROM (SELECT doc_id, ts, n,
                           unnest(range(1, T - n + 2)) AS i
                    FROM ns)),
    dup AS MATERIALIZED (
        SELECT doc_id, n FROM grams
        GROUP BY doc_id, n, g HAVING COUNT(*) >= 2),
    best AS MATERIALIZED (
        SELECT doc_id, MAX(n) AS lrs_len FROM dup GROUP BY doc_id),
    nmax AS (SELECT d.doc_id, COUNT(*) AS n_max
             FROM dup d JOIN best b
                 ON d.doc_id = b.doc_id AND d.n = b.lrs_len
             GROUP BY d.doc_id)
    SELECT b.doc_id, CAST(b.T AS INTEGER) AS n_tokens,
           CAST(COALESCE(bs.lrs_len, 0) AS INTEGER) AS lrs_len,
           CAST(COALESCE(nm.n_max, 0) AS INTEGER) AS n_max_grams
    FROM base b
    LEFT JOIN best bs ON b.doc_id = bs.doc_id
    LEFT JOIN nmax nm ON b.doc_id = nm.doc_id
    """,
    tags=("text", "quality", "dedup-substring", "udf-kernel"),
)
def q_longest_repeated_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated token n-gram per document via a per-doc suffix
    automaton (O(tokens) states — operators/text.py:lrs_stats), the
    unbounded-length companion of repetition_stats' fixed 2-/3-gram
    duplicate fractions. The oracle brute-forces every gram length up
    to the cap (finite domain is what the cap is for), so the
    automaton's equivalence-class bookkeeping is checked end to end."""
    return text.lrs_stats(_docs(spark, sf_dir))


# Border-free (no proper prefix == suffix), so the oracle's
# non-overlapping replace() count equals the automaton's all-
# occurrences count; asserted border-free in tests/test_round8_ops.py.
BLOCKLIST_PATTERNS = ("fast table", "key agg", "slow filter",
                      "value sort", "big vector", "window data",
                      "order group", "scan query", "batch part")

_PATS_SQL = ", ".join(f"('{p}')" for p in BLOCKLIST_PATTERNS)


@register(
    "blocklist_scan",
    oracle=f"""
    WITH pats(p) AS (VALUES {_PATS_SQL}),
    per AS (SELECT doc_id, p,
                   (len(text) - len(replace(text, p, ''))) // len(p)
                       AS cnt,
                   strpos(text, p) AS pos
            FROM documents, pats)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_patterns,
           CAST(COALESCE(MIN(CASE WHEN pos > 0 THEN pos END), 0)
                AS INTEGER) AS first_pos
    FROM per GROUP BY doc_id
    """,
    tags=("text", "quality", "udf-kernel", "governance"),
)
def q_blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banned-phrase blocklist scan: ONE Aho-Corasick automaton pass
    per document reports every occurrence of every pattern in
    O(chars + matches) (operators/text.py:multi_pattern_scan) — the
    pre-training corpus filter shape where a contains()-per-pattern
    plan pays len(patterns) scans. The oracle recounts each pattern
    with the replace() length-delta device and re-derives the
    earliest match position with strpos."""
    return text.multi_pattern_scan(_docs(spark, sf_dir),
                                   BLOCKLIST_PATTERNS)
