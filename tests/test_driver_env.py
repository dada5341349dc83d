"""Grading-driver environment simulation.

The driver imports `__spark_entry__` from a process whose cwd is NOT
this repo and whose sys.path gained the repo only via an insert in the
driver process — Spark's Python WORKERS see neither. Any worker-shipped
closure that cloudpickle serializes by reference to this package (a
module-level helper, class, or constant) then dies worker-side with
ModuleNotFoundError. pytest runs with cwd=/root/repo, which silently
masks the whole failure class — so this test reproduces the driver's
exact topology in a subprocess.

Regression: round 2's tiling refactor moved the top-k kernel helper to
module level in operators/similarity.py and every cosine_topk run died
in the driver sim while staying green under pytest.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # Layer 1: worker closures must be self-contained (pickle by value)
    # even with no package shipping at all. Exercise both physical
    # strategies of the brute-force kernel: mapInPandas broadcast path
    # and the cogrouped-applyInPandas tiled path.
    from event_streaming_service_spark.operators import similarity
    from event_streaming_service_spark.sources import tables
    emb = tables.load_table(spark, {sf!r}, "embeddings")
    q = emb.filter("vec_id < 4")
    assert similarity.cosine_topk(q, emb, 3).count() == 12
    assert similarity.cosine_topk(
        q, emb, 3, max_broadcast_rows=100).count() == 12
    assert similarity.cosine_near_dup_pairs(
        emb.filter("vec_id < 60"), 0.35, max_broadcast_rows=30
    ).count() >= 0

    # Layer 2: the registry path ships the package zip to workers, so
    # even a by-reference pickle would resolve. Run the Python-worker
    # queries end to end through the driver contract.
    import __spark_entry__ as E
    qs = E.queries()
    for name in ("cosine_topk_bruteforce", "multimodal_features_stub",
                 "multimodal_resize_stub"):
        n = qs[name](spark, {sf!r}).count()
        assert n > 0, name
    print("DRIVER_ENV_OK")
""")


def test_worker_closures_survive_driver_topology(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c",
         SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_ENV_OK" in proc.stdout
