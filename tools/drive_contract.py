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
only = set(sys.argv[1:])
bad = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    s = fn(spark, SF).toPandas()
    o = con.execute(os_[name]).df() if name in os_ else None
    ok = o is None or (len(s) == len(o) and vhash(s) == vhash(o))
    if not ok:
        bad += 1
    print(name, len(s), "ROWS-ONLY" if o is None else ("OK" if ok else "FAIL"))
print("FAILURES:", bad)
sys.exit(1 if bad else 0)
