"""Remaining aggregation surfaces: rollup grand totals (A3), cube
dimensioned counters (A6), pivot, map-typed column ops (P1/section 2.9),
schema-registry statistics (A8), and tf-idf (section 2.12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import stats, text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_BASE = ("WITH " + tables.EVENTS_COORDS_SQL + ", "
         + tables.CONSUMER_OFFSETS_SQL + ", " + tables.END_OFFSETS_SQL)


def _coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.with_coordinates(tables.load_table(spark, sf_dir, "events"))


def _lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ec = _coords(spark, sf_dir)
    return stats.consumer_lag(tables.consumer_offsets(ec), tables.end_offsets(ec))


@register(
    "lag_rollup_grand_total",
    oracle=_BASE + """,
    lag_table AS (
        SELECT co.group_id, CAST(eo.end_offset - co.committed_offset AS BIGINT)
                   AS lag
        FROM consumer_offsets co JOIN end_offsets eo USING (topic, "partition")
    )
    SELECT group_id, CAST(SUM(lag) AS BIGINT) AS total_lag,
           CAST(GROUPING(group_id) AS INTEGER) AS is_total
    FROM lag_table GROUP BY ROLLUP(group_id)
    """,
    tags=("A3",),
)
def q_lag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: lag per group + running grand total in one pass
    (TopicManagementService.java:536-551) via ROLLUP."""
    return (_lag(spark, sf_dir)
            .rollup("group_id")
            .agg(F.sum("lag").alias("total_lag"),
                 F.grouping("group_id").cast("int").alias("is_total")))


@register(
    "events_cube_type_outcome",
    oracle=_BASE + """
    SELECT event_type,
           CASE WHEN event_type = 'error' THEN 'failed' ELSE 'ok' END
               AS outcome_dim,
           COUNT(*) AS n,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type
    FROM events_coords
    GROUP BY CUBE(event_type,
                  CASE WHEN event_type = 'error' THEN 'failed' ELSE 'ok' END)
    """,
    tags=("A6",),
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: multi-dimension counter rollups (EventStreamingMetrics
    tag-dimensioned counters) as a CUBE with grouping markers."""
    ec = _coords(spark, sf_dir).withColumn(
        "outcome_dim",
        F.when(F.col("event_type") == "error", F.lit("failed"))
         .otherwise(F.lit("ok")))
    return (ec.cube("event_type", "outcome_dim")
            .agg(F.count("*").alias("n"),
                 F.grouping("event_type").cast("int").alias("g_type")))


@register(
    "events_pivot_by_type",
    oracle=_BASE + """
    SELECT tenant_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
               AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
               AS view
    FROM events_coords GROUP BY tenant_id
    """,
    tags=("A6", "pivot"),
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-tenant event counts, one column per type."""
    ec = _coords(spark, sf_dir)
    out = (ec.groupBy("tenant_id")
           .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
           .count())
    return out.na.fill(0)


@register(
    "props_map_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(len(json_keys(props)) + 1 AS INTEGER) AS merged_size,
           list_contains(json_keys(props), 'k') AS has_k
    FROM events
    """,
    tags=("P1", "P7", "map-ops"),
)
def q_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: header-map semantics over the props JSON column — parse to a
    real MapType and use map functions (element_at / map_keys /
    map_concat / map_contains_key)."""
    ev = tables.load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    merged = F.map_concat(m, F.create_map(F.lit("source"), F.lit(1)))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.size(merged).alias("merged_size"),
        F.map_contains_key(m, "k").alias("has_k"))


@register(
    "schema_registry_stats",
    oracle="""
    WITH subjects AS (
        SELECT 'nnipa.events.' || event_type || '-value' AS subject,
               1 + (ascii(SUBSTRING(event_type, 1, 1)) % 3) AS n_versions
        FROM (SELECT DISTINCT event_type FROM events)
        UNION ALL
        SELECT 'nnipa.events.' || event_type || '-key', 1
        FROM (SELECT DISTINCT event_type FROM events)
        WHERE event_type IN ('view', 'click')
    )
    SELECT
        CASE WHEN ends_with(subject, '-value') THEN 'value'
             WHEN ends_with(subject, '-key') THEN 'key'
             ELSE 'other' END AS kind,
        COUNT(*) AS n_subjects,
        CAST(SUM(n_versions) AS BIGINT) AS total_versions,
        MAX(n_versions) AS max_versions
    FROM subjects GROUP BY 1
    """,
    tags=("A8",),
)
def q_schema_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: registry statistics grouped by subject-suffix kind
    (SchemaRegistryService.java:324-366), over subjects derived
    deterministically from the live topics."""
    ev = tables.load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    values = types.select(
        F.concat(F.lit("nnipa.events."), F.col("event_type"),
                 F.lit("-value")).alias("subject"),
        (1 + F.ascii(F.substring("event_type", 1, 1)) % 3).alias("n_versions"))
    keys = (types.filter(F.col("event_type").isin("view", "click"))
            .select(F.concat(F.lit("nnipa.events."), F.col("event_type"),
                             F.lit("-key")).alias("subject"),
                    F.lit(1).alias("n_versions")))
    subjects = values.unionByName(keys)
    kind = (F.when(F.col("subject").endswith("-value"), "value")
            .when(F.col("subject").endswith("-key"), "key")
            .otherwise("other"))
    return (subjects.groupBy(kind.alias("kind"))
            .agg(F.count("*").alias("n_subjects"),
                 F.sum("n_versions").cast("bigint").alias("total_versions"),
                 F.max("n_versions").alias("max_versions")))


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents WHERE doc_id < 50
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS cnt,
               SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
        FROM tok WHERE tok <> '' GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq FROM tf GROUP BY tok
    ), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.cnt * 1.0 / tf.doc_len
                     * ln(n.n_docs * 1.0 / df.doc_freq), 6) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, tok) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    tags=("text", "tfidf"),
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf top-3 terms per doc (docs 0-49): tf from a per-doc window,
    idf joined from document frequency, deterministic tok tiebreak.
    Pure DataFrame ops — CountVectorizer/IDF without MLlib buffers."""
    docs = (tables.load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 50))
    # hash fan-out on doc_id: the (doc_id, tok) groupBy, the doc_len
    # window, and the final rank window all reuse this one exchange
    tok = text.fan_out(docs, by=["doc_id"]).select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
    # tf feeds THREE consumers (doc_freq, n_docs, the scoring join):
    # uncached, the tokenize+explode+count subtree runs three times
    tf = (tok.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
          .withColumn("doc_len",
                      F.sum("cnt").over(Window.partitionBy("doc_id"))))
    tf = tf.cache()
    # tf is distinct per (doc_id, tok), so COUNT(*) == COUNT(DISTINCT
    # doc_id) — a plain hash agg instead of a distinct-expand double
    # exchange
    df_ = tf.groupBy("tok").agg(F.count("*").alias("doc_freq"))
    # one global scalar: collect it rather than cross-joining a
    # broadcast single-row frame (a scalar reduce is cluster-cheap at
    # any scale; the crossJoin variant costs an extra broadcast job)
    n_docs = tf.select("doc_id").distinct().count()
    # doc_freq is tiny after aggregation — broadcast instead of
    # shuffling the full tf side on tok
    scored = (tf.join(F.broadcast(df_), "tok")
              .withColumn(
                  "tfidf",
                  F.round(F.col("cnt") * 1.0 / F.col("doc_len")
                          * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "tok", "tfidf", "rank"))
