"""Splittable fixture preparation — the ingest/compaction step every
real deployment runs before analytics.

The driver's synthetic fixtures are single-file, SINGLE-ROW-GROUP
parquet. Spark's minimum scan-split unit is the row group, so every
scan of such a file runs on one core no matter how many executors the
cluster has — the local bench then measures a serial scan plus
scheduling floor, not engine throughput (VERDICT r2 / BENCH_NOTES).
A real 100 TB table is the opposite shape: thousands of part-files of
a few hundred MB, each with several row groups, so scans parallelize
to the cluster width. This module rewrites a fixture directory into
that shape once (driver-side Arrow, no Spark needed) and caches it;
`bench.py` and `tools/gen_bench_notes.py` point BOTH engines at the
rewritten copy so the comparison stays apples-to-apples.

Row order is preserved (sequential slices), so any order-sensitive
derivation (none in the query registry — results are aggregates or
windows with total-order tiebreaks) sees the same data in the same
order, just split at file boundaries.
"""

from __future__ import annotations

import glob
import json
import os

TARGET_FILES = 32          # match local[32]; a real table has thousands
MIN_ROWS_PER_FILE = 4096   # don't shatter tiny dimension tables


def _source_fingerprint(sf_dir: str) -> dict:
    out = {}
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(f)
        out[os.path.basename(f)] = [st.st_mtime_ns, st.st_size]
    return out


def prepare_splittable(sf_dir: str, cache_root: str,
                       target_files: int = TARGET_FILES) -> str:
    """Rewrite `sf_dir`'s tables into multi-file parquet under
    `cache_root/<basename(sf_dir)>`; return that directory. Idempotent:
    a marker file records the source fingerprint and the rewrite is
    skipped while it matches. Tables smaller than one file's worth of
    rows stay single-file (region/nation are 5/25 rows)."""
    import pyarrow.parquet as pq

    out_dir = os.path.join(cache_root, os.path.basename(sf_dir.rstrip("/")))
    marker = os.path.join(out_dir, ".fingerprint.json")
    fp = {"source": os.path.abspath(sf_dir),
          "files": _source_fingerprint(sf_dir),
          "target_files": target_files}
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == fp:
                    return out_dir
        except (OSError, json.JSONDecodeError):
            pass

    os.makedirs(out_dir, exist_ok=True)
    for src in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(src)
        table = pq.read_table(src)
        n = table.num_rows
        n_files = max(1, min(target_files, n // MIN_ROWS_PER_FILE))
        dst = os.path.join(out_dir, name)
        if n_files == 1:
            # keep single-file tables as plain files (same layout the
            # loaders already handle for the source dir)
            if os.path.isdir(dst):
                for old in glob.glob(os.path.join(dst, "*")):
                    os.remove(old)
                os.rmdir(dst)
            pq.write_table(table, dst)
            continue
        if os.path.isfile(dst):
            os.remove(dst)
        os.makedirs(dst, exist_ok=True)
        for old in glob.glob(os.path.join(dst, "*.parquet")):
            os.remove(old)
        step = -(-n // n_files)
        for i in range(n_files):
            chunk = table.slice(i * step, step)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(dst, f"part-{i:05d}.parquet"))
    with open(marker, "w") as fh:
        json.dump(fp, fh)
    return out_dir
