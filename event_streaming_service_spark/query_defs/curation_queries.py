r"""Corpus-curation queries (operators/curation.py): deterministic
split assignment, curriculum buckets, char-Gini scoring, BPE merge
induction, vocabulary coverage — each with an exact DuckDB oracle
(all ratios are integer ppm, all sums exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import curation
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "documents")


@register(
    "dataset_split_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT {curation.split_assign_sql('doc_id')} AS split,
               lang, source, n_chars
        FROM documents),
    per_source AS (
        SELECT split, lang, source, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM assigned GROUP BY split, lang, source)
    SELECT split, lang,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM per_source GROUP BY split, lang
    """,
    tags=("2.12-sampling", "sampling", "split"),
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by content hash
    of doc_id, reported per (split, lang): doc counts, exact char
    totals, distinct sources (two-level agg — no Expand). The
    assignment is a pure projection, so at 100 TB the split is free at
    scan time and identical on every engine and run."""
    assigned = _docs(spark, sf_dir).withColumn(
        "split", curation.split_assign(F.col("doc_id")))
    per_source = (assigned
                  .groupBy("split", "lang", "source")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("n_chars").alias("chars")))
    return (per_source
            .groupBy("split", "lang")
            .agg(F.sum("n").cast("bigint").alias("n_docs"),
                 F.sum("chars").cast("bigint").alias("total_chars"),
                 F.count(F.lit(1)).cast("bigint").alias("n_sources")))


_QUALITY_SQL = f"""
    LEAST(n_chars / 500.0, 1.0) * 0.4
    + LEAST(len(list_distinct({_TOKS})) * 1.0
            / greatest(len({_TOKS}), 1) * 2.0, 1.0) * 0.3
    + LEAST(len(list_filter({_TOKS}, t -> lower(t) IN
                ('the','a','of','and','is','to','in','it','on','for')))
            * 1.0 / greatest(len({_TOKS}), 1) * 10.0, 1.0) * 0.3
"""


@register(
    "curriculum_quality_buckets",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, n_chars, {_QUALITY_SQL} AS quality
        FROM documents),
    r AS (
        SELECT doc_id, n_chars, quality,
               ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rnk,
               COUNT(*) OVER () AS n
        FROM q)
    SELECT CAST(1 + ((rnk - 1) * 10) // n AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(quality) AS min_quality,
           MAX(quality) AS max_quality,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM r GROUP BY 1
    """,
    tags=("quality", "curriculum", "sampling", "window-frames"),
)
def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten equal-count curriculum buckets over the composite quality
    score (easy-to-hard ordering for curriculum training), with
    per-bucket doc counts, quality envelope, and exact char totals.
    The global rank is distributed (range partition + prefix offsets,
    operators/linkage.global_rank) — no single-task sort; the bucket
    boundary is the closed form 1 + (rank-1)*10 DIV N in both
    engines."""
    from event_streaming_service_spark.query_defs.text_queries import (
        _token_counts,
    )
    counts = _token_counts(spark, sf_dir)
    n_toks = F.greatest(F.col("n_toks"), F.lit(1))
    quality = (F.least(F.col("n_chars") / 500.0, F.lit(1.0)) * 0.4
               + F.least(F.col("n_distinct") * 1.0 / n_toks * 2.0,
                         F.lit(1.0)) * 0.3
               + F.least(F.col("n_stops") * 1.0 / n_toks * 10.0,
                         F.lit(1.0)) * 0.3)
    scored = counts.select("doc_id", "n_chars", quality.alias("quality"))
    bucketed = curation.curriculum_buckets(scored, "quality", "doc_id",
                                           n_buckets=10)
    return (bucketed
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min("quality").alias("min_quality"),
                 F.max("quality").alias("max_quality"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


@register(
    "char_gini_quality",
    oracle=curation.char_gini_sql(),
    tags=("quality", "text", "entropy"),
)
def q_char_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Gini impurity in exact ppm
    — the rational entropy proxy that flags degenerate/repetitive
    documents without a cross-engine-fragile log."""
    return curation.char_gini(_docs(spark, sf_dir))


@register(
    "bpe_merge_pairs",
    oracle=rf"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS w FROM documents),
    vocab AS (
        SELECT w, COUNT(*) AS wc FROM tok GROUP BY w),
    pairs AS (
        SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, wc
        FROM (SELECT w, wc, unnest(range(1, length(w))) AS i
              FROM vocab WHERE length(w) >= 2))
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 30
    """,
    tags=("text", "token-count", "bpe", "collocation"),
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent character pairs by corpus frequency — the
    statistic BPE's first merge maximizes, computed over the
    distinct-word vocabulary weighted by word count (the real BPE
    trainer's optimization: the char explode runs over the vocabulary,
    not the token stream)."""
    return curation.bpe_merge_pairs(_docs(spark, sf_dir))


_N_MERGES = 6


def _bpe_learn_oracle(n_merges: int) -> str:
    """Unrolled BPE merge rounds as chained CTEs — the kcore/pagerank
    device: each round counts weighted adjacent symbol pairs over the
    separator-string vocabulary, takes the (count desc, lhs, rhs)
    argmax, and applies the merge with the double-separator replace
    (identical left-to-right non-overlapping semantics both engines)."""
    ctes = [f"""tok AS (
        SELECT unnest({_TOKS}) AS w FROM documents)""",
            """vocab AS MATERIALIZED (
        SELECT w, COUNT(*) AS wc
        FROM (SELECT replace(w, '|', '') AS w FROM tok)
        WHERE length(w) >= 1 GROUP BY w)""",
            """docs0 AS MATERIALIZED (
        SELECT '|' || array_to_string(
                   list_transform(range(1, length(w) + 1),
                                  i -> substr(w, i, 1)), '||') || '|'
                   AS s,
               wc
        FROM vocab)"""]
    for k in range(1, n_merges + 1):
        ctes.append(f"""pairs{k} AS (
        SELECT t[i] AS lhs, t[i + 1] AS rhs,
               CAST(SUM(wc) AS BIGINT) AS pair_count
        FROM (SELECT string_split(substring(s, 2, length(s) - 2), '||')
                         AS t,
                     wc
              FROM docs{k - 1}),
             LATERAL (SELECT unnest(range(1, len(t))) AS i)
        WHERE len(t) >= 2
        GROUP BY 1, 2)""")
        ctes.append(f"""best{k} AS MATERIALIZED (
        SELECT {k} AS merge_rank, lhs, rhs, pair_count
        FROM pairs{k} ORDER BY pair_count DESC, lhs, rhs LIMIT 1)""")
        if k < n_merges:
            ctes.append(f"""docs{k} AS MATERIALIZED (
        SELECT replace(s, '|' || lhs || '||' || rhs || '|',
                       '|' || lhs || rhs || '|') AS s, wc
        FROM docs{k - 1}, best{k})""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST(merge_rank AS INTEGER) AS merge_rank, lhs, rhs,"
        f" pair_count FROM best{k}" for k in range(1, n_merges + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + union


@register(
    "bpe_learned_merges",
    oracle=_bpe_learn_oracle(_N_MERGES),
    tags=("text", "token-count", "bpe", "iterative"),
)
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE merge-learning loop (Sennrich et al. 2016) run for
    six merges over the frequency-weighted distinct-word vocabulary
    (operators/curation.py:bpe_learn_merges): per round one pair-count
    aggregate, a 1-row argmax broadcast, and one double-separator
    replace; the oracle unrolls the identical six rounds as chained
    CTEs. Output: the learned merge table the tokenizer trainer
    ships."""
    return curation.bpe_learn_merges(_docs(spark, sf_dir),
                                     n_merges=_N_MERGES)


@register(
    "vocab_coverage",
    oracle=rf"""
    WITH dt AS (
        SELECT doc_id, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY doc_id, tok),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, SUM(cnt) AS c FROM dt GROUP BY tok)
        ORDER BY c DESC, tok LIMIT 500),
    agg AS (
        SELECT d.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN cnt
                             ELSE 0 END) AS BIGINT) AS in_vocab
        FROM dt d LEFT JOIN vocab v USING (tok)
        GROUP BY d.doc_id)
    SELECT doc_id, n_tokens,
           n_tokens - in_vocab AS oov_tokens,
           CAST(in_vocab * 1000000 // n_tokens AS BIGINT)
               AS coverage_ppm
    FROM agg
    """,
    tags=("text", "token-count", "tfidf", "vocab"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage by the corpus top-500 token vocabulary
    (OOV-rate report for tokenizer freezing): exact ppm coverage, one
    cached tokenize pass feeding both the vocabulary TakeOrdered and
    the per-doc aggregate, vocab joined back as a broadcast."""
    return curation.vocab_coverage(_docs(spark, sf_dir))


@register(
    "group_split_leakproof",
    oracle=f"""
    WITH assigned AS (
        SELECT {curation.split_assign_sql('source')} AS split,
               source, n_chars
        FROM documents),
    leak AS (
        SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS leaky_groups
        FROM (SELECT source, COUNT(DISTINCT split) AS ns
              FROM assigned GROUP BY source))
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
           CAST(SUM(n_chars) AS BIGINT) AS total_weight,
           leaky_groups
    FROM assigned CROSS JOIN leak
    GROUP BY split, leaky_groups
    ORDER BY split
    """,
    tags=("2.12-sampling", "sampling", "split", "quality"),
)
def q_group_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level 90/5/5 split (the group, not the row, is hashed)
    with a cross-engine leakage audit: leaky_groups counts sources
    seen in more than one split and must be 0 by construction
    (operators/curation.py:group_split_audit)."""
    return curation.group_split_audit(
        _docs(spark, sf_dir), "source", weight_col="n_chars")


@register(
    "mixture_sampling_weights",
    oracle=f"""
    WITH d AS (
        SELECT lang,
               CAST(length({_TOKS}) AS BIGINT) AS n_toks
        FROM documents),
    g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_toks) AS BIGINT) AS lang_tokens
          FROM d GROUP BY lang),
    t AS (SELECT *,
                 CAST(SUM(lang_tokens) OVER () AS HUGEINT) AS total,
                 CAST(COUNT(*) OVER () AS HUGEINT) AS k
          FROM g)
    SELECT lang, n_docs, lang_tokens,
           CAST(CAST(lang_tokens AS HUGEINT) * 1000000 // total
                AS BIGINT) AS share_ppm,
           CASE WHEN lang_tokens > 0 THEN
               CAST(total * 1000000 // (k * lang_tokens) AS BIGINT)
           END AS weight_ppm,
           CASE WHEN lang_tokens > 0 THEN
               CAST(CAST(lang_tokens AS HUGEINT)
                    * (total * 1000000 // (k * lang_tokens))
                    // 1000000 AS BIGINT)
           END AS resampled_tokens
    FROM t
    """,
    tags=("curation", "mixture", "token-count", "llm-pipeline"),
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language training-mixture reweighting: the static domain
    -balancing step of a pretraining data pipeline (the DoReMi/
    Pile-style 'equalize token mass across domains' baseline). Each
    language's whitespace-token mass yields its corpus share and the
    resampling multiplier that flattens the mixture,
        weight_ppm = total_tokens * 1e6 DIV (n_langs * lang_tokens),
    plus the token count a weighted sampler would draw. All integer
    ppm arithmetic (truncating DIV); token counts are the vocab
    -coverage regex split. Scale shape: one narrow projection for the
    per-doc counts (no shuffle), a k-row hash agg, and window totals
    over the k-row grain."""
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window
    n_toks = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                             lambda t: t != F.lit(""))).cast("long")
    g = (docs.select("lang", n_toks.alias("__nt"))
         .groupBy("lang")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("__nt").cast("long").alias("lang_tokens")))
    wall = Window.partitionBy()
    dec = "decimal(38,0)"
    t = (g.withColumn("__total",
                      F.sum("lang_tokens").over(wall).cast(dec))
         .withColumn("__k", F.count(F.lit(1)).over(wall).cast(dec)))
    weight = F.expr(
        "CAST(__total * 1000000"
        " DIV (__k * CAST(lang_tokens AS DECIMAL(38,0))) AS BIGINT)")
    return t.select(
        "lang", "n_docs", "lang_tokens",
        F.expr("CAST(CAST(lang_tokens AS DECIMAL(38,0)) * 1000000"
               " DIV __total AS BIGINT)").alias("share_ppm"),
        F.when(F.col("lang_tokens") > 0, weight).alias("weight_ppm"),
        F.when(F.col("lang_tokens") > 0, F.expr(
            "CAST(CAST(lang_tokens AS DECIMAL(38,0))"
            " * (__total * 1000000"
            "    DIV (__k * CAST(lang_tokens AS DECIMAL(38,0))))"
            " DIV 1000000 AS BIGINT)")).alias("resampled_tokens"))


def _bpe_encode_oracle(n_merges: int) -> str:
    """BPE APPLY twin: the learn chain re-run with the word key kept
    (enc{k} carries w + wc so pair counts and merge replays share one
    chain), then per-word symbol counts join the per-doc word grain."""
    ctes = [f"""tok AS (
        SELECT doc_id, unnest({_TOKS}) AS w FROM documents)""",
            """dt AS MATERIALIZED (
        SELECT doc_id, w, COUNT(*) AS n
        FROM (SELECT doc_id, replace(w, '|', '') AS w FROM tok)
        WHERE length(w) >= 1 GROUP BY doc_id, w)""",
            """vocab AS MATERIALIZED (
        SELECT w, CAST(SUM(n) AS BIGINT) AS wc
        FROM dt GROUP BY w)""",
            """enc0 AS MATERIALIZED (
        SELECT w, wc,
               '|' || array_to_string(
                   list_transform(range(1, length(w) + 1),
                                  i -> substr(w, i, 1)), '||') || '|'
                   AS s
        FROM vocab)"""]
    for k in range(1, n_merges + 1):
        ctes.append(f"""pairs{k} AS (
        SELECT t[i] AS lhs, t[i + 1] AS rhs,
               CAST(SUM(wc) AS BIGINT) AS pair_count
        FROM (SELECT string_split(substring(s, 2, length(s) - 2), '||')
                         AS t,
                     wc
              FROM enc{k - 1}),
             LATERAL (SELECT unnest(range(1, len(t))) AS i)
        WHERE len(t) >= 2
        GROUP BY 1, 2)""")
        ctes.append(f"""best{k} AS MATERIALIZED (
        SELECT lhs, rhs FROM pairs{k}
        ORDER BY pair_count DESC, lhs, rhs LIMIT 1)""")
        ctes.append(f"""enc{k} AS MATERIALIZED (
        SELECT w, wc,
               replace(s, '|' || lhs || '||' || rhs || '|',
                       '|' || lhs || rhs || '|') AS s
        FROM enc{k - 1}, best{k})""")
    ctes.append(f"""wsym AS (
        SELECT w,
               CAST(len(string_split(substring(s, 2, length(s) - 2),
                                     '||')) AS BIGINT) AS n_sym
        FROM enc{n_merges})""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(n * n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(CAST(SUM(n * n_sym) AS BIGINT) * 1000000
                // CAST(SUM(n) AS BIGINT) AS BIGINT)
               AS bpe_per_token_ppm
    FROM dt JOIN wsym USING (w) GROUP BY doc_id
    """


@register(
    "bpe_encoded_doc_stats",
    oracle=_bpe_encode_oracle(_N_MERGES),
    tags=("text", "token-count", "bpe", "iterative"),
)
def q_bpe_encoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY (operators/curation.py:bpe_encode_stats): encode
    every document with the six learned merges replayed in rank order
    and report per-doc subword counts + fertility
    (bpe_per_token_ppm) — the readout tokenizer pipelines gate a
    vocabulary on, closing the loop bpe_learned_merges opened.
    Encoding is a literal replace chain over the distinct-word grain
    (the corpus never explodes to characters)."""
    return curation.bpe_encode_stats(_docs(spark, sf_dir),
                                     n_merges=_N_MERGES)


_GOPHER_STOPS = "'the','a','of','and','is','to','in','it','on','for'"


@register(
    "gopher_quality_flags",
    oracle=rf"""
    WITH c AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '') AS toks,
               list_filter(string_split(text, chr(10)),
                           s -> trim(s) <> '') AS lns
        FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(toks, w -> length(w)))
                    AS BIGINT) AS chars_,
               CAST(len(lns) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lns,
                        s -> regexp_matches(trim(s), '\.\.\.$')))
                    AS BIGINT) AS ell,
               CAST(len(list_filter(lns,
                        s -> regexp_matches(trim(s), '^[-*]')))
                    AS BIGINT) AS bul,
               CAST(len(list_filter(toks,
                        w -> regexp_matches(w, '[A-Za-z]')))
                    AS BIGINT) AS alpha,
               CAST(len(list_distinct(list_filter(
                        list_transform(toks, w -> lower(w)),
                        w -> w IN ({_GOPHER_STOPS}))))
                    AS BIGINT) AS stopword_hits
        FROM c),
    r AS (
        SELECT doc_id, n_words,
               CAST(CASE WHEN n_words > 0
                         THEN chars_ * 1000 // n_words
                         ELSE 0 END AS BIGINT) AS mean_word_len_milli,
               n_lines,
               CAST(CASE WHEN n_lines > 0
                         THEN ell * 1000000 // n_lines
                         ELSE 0 END AS BIGINT) AS ellipsis_line_ppm,
               CAST(CASE WHEN n_lines > 0
                         THEN bul * 1000000 // n_lines
                         ELSE 0 END AS BIGINT) AS bullet_line_ppm,
               CAST(CASE WHEN n_words > 0
                         THEN alpha * 1000000 // n_words
                         ELSE 0 END AS BIGINT) AS alpha_word_ppm,
               stopword_hits
        FROM m)
    SELECT *,
           CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER)
               AS ok_word_count,
           CAST(mean_word_len_milli >= 3000
                AND mean_word_len_milli <= 10000 AS INTEGER)
               AS ok_word_len,
           CAST(ellipsis_line_ppm <= 300000 AS INTEGER) AS ok_ellipsis,
           CAST(bullet_line_ppm <= 900000 AS INTEGER) AS ok_bullets,
           CAST(alpha_word_ppm >= 800000 AS INTEGER) AS ok_alpha,
           CAST(stopword_hits >= 2 AS INTEGER) AS ok_stopwords,
           CAST(n_words >= 50 AND n_words <= 100000
                AND mean_word_len_milli >= 3000
                AND mean_word_len_milli <= 10000
                AND ellipsis_line_ppm <= 300000
                AND bullet_line_ppm <= 900000
                AND alpha_word_ppm >= 800000
                AND stopword_hits >= 2 AS INTEGER) AS passes_gopher
    FROM r
    """,
    tags=("quality", "text", "token-count"),
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality-filter rules per document
    (operators/text.py:gopher_quality_flags, Rae et al. 2021 App. A):
    word-count band, mean word length, ellipsis/bullet line ratios,
    alpha-word fraction, required-stopword hits — each measure exact
    integer arithmetic, each rule a 0/1 flag, plus the conjunction —
    the production crawl gate, as a pure projection."""
    from event_streaming_service_spark.operators import text as _t
    return _t.gopher_quality_flags(_docs(spark, sf_dir))
