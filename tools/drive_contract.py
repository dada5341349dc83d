"""Driver-contract simulation (the /verify recipe, kept in-repo so it
survives /tmp): import __spark_entry__ in a fresh process with a
VANILLA session (non-UTC timezone on purpose), run every query (or
just the names given as argv) at sf0.01, and hash-compare against the
DuckDB oracle exactly the way the grading driver does.

Usage: python tools/drive_contract.py [query_name ...]
Exit code 1 on any mismatch.
"""

import sys, hashlib
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb, pandas as pd
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
assert len(E.entry(spark).collect()) > 0
qs, os_ = E.queries(), E.oracle_sql()
SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return hashlib.md5("\n".join(sorted(repr(tuple(r)) for r in
        pdf.itertuples(index=False))).encode()).hexdigest()
def kinds(pdf):
    return {c: pdf[c].dtype.kind for c in pdf.columns}
only = set(sys.argv[1:])
bad = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    s = fn(spark, SF).toPandas()
    # operators pin multiply-consumed frames with persist() and rely on
    # the harness to reclaim them once the result is materialized
    # (bench.py clears per query the same way; ADVICE r9 #3) — without
    # this a full-registry run accumulates every pinned frame
    spark.catalog.clearCache()
    o = con.execute(os_[name]).df() if name in os_ else None
    if o is None:
        print(name, len(s), "ROWS-ONLY")
        continue
    # the real driver checks SCHEMA too: column names must match and
    # dtype kinds must agree (int64 vs float64 breaks its value hash
    # even when values are equal) — round 7 caught a green value-hash
    # hiding a column-name mismatch the driver would have flagged
    schema_ok = (sorted(s.columns) == sorted(o.columns)
                 and kinds(s) == kinds(o))
    ok = schema_ok and len(s) == len(o) and vhash(s) == vhash(o)
    if not ok:
        bad += 1
        why = ("SCHEMA" if not schema_ok else
               "ROWS" if len(s) != len(o) else "HASH")
        print(name, len(s), f"FAIL({why})",
              "" if schema_ok else f"spark={sorted(s.columns)}"
                                   f" oracle={sorted(o.columns)}")
    else:
        print(name, len(s), "OK")
print("FAILURES:", bad)
sys.exit(1 if bad else 0)
