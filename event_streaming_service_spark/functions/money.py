"""Exact integer-cents arithmetic for monetary doubles.

The fixture's monetary columns are 2-decimal values stored as doubles.
Aggregating doubles directly is partition-order dependent, and decimal
downcasts round differently across engines (DuckDB truncates wide
int128 downscales where Spark rounds). Converting to integer cents at
the scan makes every sum exact 64-bit integer math — bit-identical in
any engine, at any parallelism — with ONE double division at the
result boundary.

Headroom: sum(price_cents * 100 * 108) stays under 2^63 beyond sf1000;
the boundary division result is < 2^53 so it's exact too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """double 1234.56 -> long 123456.

    floor(x*100 + 0.5) instead of round() or a decimal cast: x*100 is
    one IEEE multiply (identical in every engine) landing within 1e-9
    of an integer for 2-decimal inputs, so the +0.5/floor never sees a
    half-way case and matches ROUND in any engine exactly, for either
    sign. CONTRACT: inputs must be 2-decimal values (all fixture money
    columns are) — at a genuine half-way point like -1.005 floor
    rounds toward +inf where ROUND rounds away from zero, so feeding
    finer-precision intermediates through cents() would diverge from
    the SQL twin by one cent. Spark's round(double) routes every row
    through a BigDecimal
    setScale (allocation + slow path inside the codegen'd partial
    aggregate — measured 2.8 s -> 0.5 s on TPC-H Q1 at sf0.1); floor
    is a single fused double op that stays in registers.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def pct(col: str | Column) -> Column:
    """2-decimal fraction 0.07 -> long 7 (percent units)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def cents_sql(col: str) -> str:
    return f"CAST(ROUND({col} * 100, 0) AS BIGINT)"


def pct_sql(col: str) -> str:
    return cents_sql(col)
