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
    """double 1234.56 -> long 123456 (exact: decimal cast rounds the
    double's binary value to 2 decimals identically in both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,2)") * 100).cast("long")


def pct(col: str | Column) -> Column:
    """2-decimal fraction 0.07 -> long 7 (percent units)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,2)") * 100).cast("long")


def cents_sql(col: str) -> str:
    return f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def pct_sql(col: str) -> str:
    return cents_sql(col)
