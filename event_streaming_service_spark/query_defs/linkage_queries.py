"""Record-linkage query: sorted-neighborhood fuzzy matching of the
customer roster against a deterministically-perturbed twin of itself
(operators/linkage.py).

The "dirty" side is derived from the fixture in-query (the harness
owns the tables; synthesizing a noisy copy from them keeps the oracle
exact): each customer name's final digit is swapped for a lookalike
letter (0->O, 1->I, 2->Z, ... leetspeak table), i.e. a one-character
typo. The perturbation keeps the name's sort prefix intact, so true
matches land within the neighborhood window — exactly the property a
real deployment engineers via its choice of sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import linkage
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

SNM_WINDOW = 20
MAX_DIST = 1
_LEET = ("0123456789", "OIZEASGTBN")

_DIRTY_SQL = (f"substr(c_name, 1, length(c_name) - 1) || "
              f"translate(substr(c_name, length(c_name), 1), "
              f"'{_LEET[0]}', '{_LEET[1]}')")


@register(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH clean AS (
        SELECT c_custkey AS key, c_name AS name FROM customer),
    dirty AS (
        SELECT c_custkey AS key, {_DIRTY_SQL} AS name FROM customer),
    u AS (
        SELECT 'L' AS side, key, name FROM clean
        UNION ALL
        SELECT 'R' AS side, key, name FROM dirty),
    ranked AS (
        SELECT side, key, name,
               ROW_NUMBER() OVER (ORDER BY name, side, key) AS rk
        FROM u),
    pairs AS (
        SELECT a.side AS side_a, a.key AS key_a, a.name AS name_a,
               b.side AS side_b, b.key AS key_b, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
        FROM ranked a
        JOIN ranked b
          ON b.rk BETWEEN a.rk + 1 AND a.rk + {SNM_WINDOW}
        WHERE a.side <> b.side)
    SELECT CASE WHEN side_a = 'L' THEN key_a ELSE key_b END AS left_key,
           CASE WHEN side_a = 'L' THEN key_b ELSE key_a END AS right_key,
           CASE WHEN side_a = 'L' THEN name_a ELSE name_b END AS left_name,
           CASE WHEN side_a = 'L' THEN name_b ELSE name_a END AS right_name,
           dist
    FROM pairs
    WHERE dist <= {MAX_DIST}
    """,
    tags=("linkage", "dedup-fuzzy"),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution: clean vs typo'd customer
    names, Levenshtein <= 1 within a 20-position window of the merged
    sort — (|L|+|R|) x w candidates instead of |L| x |R|, global rank
    built without a single-partition sort."""
    customer = tables.load_table(spark, sf_dir, "customer")
    clean = customer.select("c_custkey", "c_name")
    dirty = customer.select(
        "c_custkey",
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"),
            F.translate(F.expr("substring(c_name, length(c_name), 1)"),
                        _LEET[0], _LEET[1])).alias("c_name"))
    return linkage.sorted_neighborhood_pairs(
        clean, dirty, "c_custkey", "c_name",
        window=SNM_WINDOW, max_dist=MAX_DIST)
