"""PII-scrubbing query over `documents` (SURVEY.md section 2.12):
redaction as chained regexp_replace, scrub-rate stats as
regexp_extract_all counts — the first cleaning pass of a web-corpus
training pipeline.

The fixture corpus contains no PII, so the query PLANTS deterministic
spans (emails/URLs/phones/IPs derived from doc_id, identical
expressions on both engines) and then verifies the scrubber counts and
redacts exactly those spans: the md5 of the cleaned text is part of
the compared result, so a single mis-redacted character anywhere in
the corpus fails the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.text import (
    PII_PATTERNS,
    pii_counts,
    scrub_pii,
)
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


def _planted_spark(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"), d,
                            F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit(" see https://host"), d,
                            F.lit(".example.org/a?b=1"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0,
                   F.lit(" call +1 555 0100")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 17 == 0,
                   F.concat(F.lit(" from 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit(".25"))).otherwise(F.lit("")),
        ).alias("t"))


_PLANTED_SQL = """
planted AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' see https://host' || CAST(doc_id AS VARCHAR)
                        || '.example.org/a?b=1' ELSE '' END
           || CASE WHEN doc_id % 13 = 0
                   THEN ' call +1 555 0100' ELSE '' END
           || CASE WHEN doc_id % 17 = 0
                   THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.25' ELSE '' END AS t
    FROM documents
)"""


def _scrub_sql() -> str:
    """CTE chain mirroring pii_counts/scrub_pii pass order: each stage
    counts one kind on the text scrubbed of the kinds before it, then
    redacts it."""
    ctes, src = [], "planted"
    for i, (name, pat) in enumerate(PII_PATTERNS):
        nxt = f"s{i}"
        ctes.append(
            f"{nxt} AS (SELECT doc_id, "
            + ", ".join(f"n_{n}" for n, _ in PII_PATTERNS[:i])
            + (", " if i else "")
            + f"len(regexp_extract_all(t, '{pat}')) AS n_{name}, "
            f"regexp_replace(t, '{pat}', '<{name.upper()}>', 'g') AS t "
            f"FROM {src})")
        src = nxt
    cols = ", ".join(f"n_{n}" for n, _ in PII_PATTERNS)
    return (", ".join(ctes)
            + f" SELECT doc_id, {cols}, md5(t) AS clean_md5 FROM {src}")


@register(
    "pii_scrub_stats",
    oracle="WITH " + _PLANTED_SQL + ", " + _scrub_sql(),
    tags=("pii-scrub", "2.12-scrub", "text"),
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction + scrub-rate stats, one codegen'd projection per
    doc (no shuffle, no Python): per-kind span counts and the md5 of
    the fully-redacted text."""
    docs = tables.load_table(spark, sf_dir, "documents")
    planted = _planted_spark(docs)
    t = F.col("t")
    counts = pii_counts(t)
    return planted.select(
        "doc_id",
        *[counts[f"n_{name}"].cast("bigint").alias(f"n_{name}")
          for name, _ in PII_PATTERNS],
        F.md5(scrub_pii(t)).alias("clean_md5"))
