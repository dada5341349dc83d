"""Topic catalog: create / delete / list / describe / alter (S8-S10).

The reference manages Kafka topics through AdminClient
(service/TopicManagementService.java:70-248) and bootstraps 7 platform
topics with per-topic retention (:571-652). Engine-side, a topic is a
partitioned parquet directory plus a catalog row; the operations map to
filesystem + metadata actions, and `describe` is a per-partition stats
query (the offset probe, S7).

Layout: <root>/<topic-name>/partition=<p>/*.parquet — partition is the
routing-key hash bucket (operators/routing.py), so per-key ordering
within a partition survives round trips (W2) and partition pruning
serves single-partition reads (S6).
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PARTITIONS = 6        # application.yml:135-137
DEFAULT_RETENTION_MS = 7 * 24 * 3600 * 1000  # 7 days, :138


@dataclass
class TopicConfig:
    """model/TopicConfig.java:18-23 minus broker-only knobs."""

    name: str
    partitions: int = DEFAULT_PARTITIONS
    retention_ms: int = DEFAULT_RETENTION_MS
    compression: str = "snappy"
    additional: dict[str, str] = field(default_factory=dict)


# The reference's default platform topics (TopicManagementService.java:571-652)
DEFAULT_TOPICS = [
    TopicConfig("nnipa.events.tenant"),
    TopicConfig("nnipa.events.auth"),
    TopicConfig("nnipa.events.notification"),
    TopicConfig("nnipa.events.user"),
    TopicConfig("nnipa.events.audit", retention_ms=28 * 24 * 3600 * 1000),
    TopicConfig("nnipa.dlq.events", partitions=3,
                retention_ms=14 * 24 * 3600 * 1000),
    TopicConfig("nnipa.commands", retention_ms=3 * 24 * 3600 * 1000),
]


class TopicCatalog:
    """Filesystem-backed topic store with a JSON catalog."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._meta_path = self.root / "_catalog.json"
        self._meta: dict[str, dict] = {}
        if self._meta_path.exists():
            self._meta = json.loads(self._meta_path.read_text())

    def _save(self) -> None:
        self._meta_path.write_text(json.dumps(self._meta, indent=2))

    # -- S8 create/delete/list/alter --

    def create(self, config: TopicConfig, exist_ok: bool = True) -> None:
        if config.name in self._meta:
            if not exist_ok:  # TopicExistsException swallow at :101-107
                raise FileExistsError(config.name)
            return
        (self.root / config.name).mkdir(parents=True, exist_ok=True)
        self._meta[config.name] = asdict(config)
        self._save()

    def bootstrap_defaults(self) -> None:
        """S9: create-if-not-exists the platform topics."""
        for cfg in DEFAULT_TOPICS:
            self.create(cfg, exist_ok=True)

    def delete(self, name: str) -> None:
        if name in self._meta:
            shutil.rmtree(self.root / name, ignore_errors=True)
            del self._meta[name]
            self._save()

    def list(self, include_internal: bool = False) -> list[str]:
        """P6: internal `_`-prefixed topics filtered, sorted
        (TopicManagementService.java:141-144). Group-offset entries
        (`__group::` keys) are catalog state, never topics."""
        names = sorted(n for n in self._meta if not n.startswith("__group::"))
        if not include_internal:
            names = [n for n in names if not n.startswith("_")]
        return names

    def alter(self, name: str, **updates) -> None:
        """S8 alter: update retention/config (:222-248)."""
        cfg = self._meta[name]
        for k, v in updates.items():
            if k not in cfg:
                raise KeyError(k)
            cfg[k] = v
        self._save()

    def config(self, name: str) -> TopicConfig:
        d = dict(self._meta[name])
        return TopicConfig(**d)

    # -- S1/S2 publish, S4 scan --

    def publish(self, df: DataFrame, topic: str, key_col: str = "key",
                order_col: str | None = None) -> None:
        """S1: keyed publish — hash the key onto the topic's partitions,
        assign dense per-partition offsets continuing from the current
        log end, and append. Same key -> same partition -> per-key order
        (W2); offsets make the log replayable by range (S6) and lag
        measurable (A1) exactly like a Kafka partition.

        Offset assignment is read-log-end-then-append, which is only
        correct with ONE writer per topic at a time — the same contract
        a Kafka partition leader enforces broker-side. A catalog lock
        file serializes publishes that honor this API; it is an
        in-process/advisory guard, not a distributed lock (at scale the
        single-writer is the streaming sink's epoch, W9).

        Ordering within the append is `order_col` when given, else ALL
        columns — content-deterministic either way, so a retried/replayed
        publish assigns every row the same offset (an earlier
        monotonically_increasing_id fallback was scheduling-dependent).
        """
        from pyspark.sql import Window

        cfg = self.config(topic)
        n = cfg.partitions
        out = df.withColumn(
            "partition", F.pmod(F.abs(F.hash(F.col(key_col))), F.lit(n)))
        order = [order_col] if order_col else [
            c for c in df.columns]  # total, content-based order
        with self._publish_lock(topic):
            # current log end per partition (empty/new topic -> base 0)
            ends = None
            try:
                existing = self.scan(topic)
                if "offset" in existing.columns:
                    ends = (existing.groupBy("partition")
                            .agg((F.max("offset") + 1).alias("base")))
            except Exception:
                pass
            w = Window.partitionBy("partition").orderBy(*order)
            out = out.withColumn("__rn", F.row_number().over(w) - 1)
            if ends is not None:
                out = (out.join(F.broadcast(ends), "partition", "left")
                       .withColumn("offset",
                                   (F.coalesce(F.col("base"), F.lit(0))
                                    + F.col("__rn")).cast("bigint"))
                       .drop("base", "__rn"))
            else:
                out = out.withColumn("offset", F.col("__rn").cast("bigint")) \
                         .drop("__rn")
            (out.repartition(n, "partition")
                .write.mode("append").partitionBy("partition")
                .option("compression", cfg.compression)
                .parquet(str(self.root / topic)))

    def _publish_lock(self, topic: str, timeout_s: float = 60.0):
        """Advisory single-writer lock per topic (O_CREAT|O_EXCL)."""
        import contextlib
        import os
        import time

        path = self.root / f"_lock_{topic.replace('/', '_')}"

        @contextlib.contextmanager
        def lock():
            deadline = time.monotonic() + timeout_s
            while True:
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    break
                except FileExistsError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"publish lock held for {topic}; single-writer "
                            "contract violated or stale lock at "
                            f"{path}") from None
                    time.sleep(0.05)
            try:
                yield
            finally:
                os.close(fd)
                os.unlink(path)

        return lock()

    # -- consumer-group offsets (A1 against the physical log) --

    def commit_offsets(self, group_id: str, topic: str,
                       offsets: dict[int, int]) -> None:
        """Record a group's committed offset per partition
        (the AdminClient listConsumerGroupOffsets state,
        TopicManagementService.java:325-353)."""
        key = f"__group::{topic}"
        groups = self._meta.setdefault(key, {})
        groups[group_id] = {str(p): int(o) for p, o in offsets.items()}
        self._save()

    def consumer_lag(self, topic: str) -> DataFrame:
        """A1: lag = log-end offset - committed, per (group, partition)."""
        key = f"__group::{topic}"
        groups = self._meta.get(key, {})
        rows = [(g, int(p), int(o)) for g, ps in groups.items()
                for p, o in ps.items()]
        committed = self.spark.createDataFrame(
            rows, "group_id string, partition int, committed_offset long")
        ends = (self.scan(topic).groupBy("partition")
                .agg((F.max("offset") + 1).cast("bigint").alias("end_offset")))
        return (committed.join(F.broadcast(ends), "partition")
                .withColumn("lag", F.col("end_offset") - F.col("committed_offset"))
                .select("group_id", "partition", "committed_offset",
                        "end_offset", "lag"))

    def scan(self, topic: str) -> DataFrame:
        """S4: full-topic scan; partition pruning applies for S6 reads."""
        return self.spark.read.parquet(str(self.root / topic))

    # -- S8 describe --

    def describe(self, topic: str) -> dict:
        """Topic detail + per-partition message counts
        (TopicManagementService.java:155-217)."""
        cfg = self.config(topic)
        try:
            stats_rows = (self.scan(topic).groupBy("partition")
                          .agg(F.count("*").alias("n"))
                          .collect())
            per_partition = {int(r.partition): r.n for r in stats_rows}
        except Exception:
            per_partition = {}
        return {
            "name": cfg.name,
            "partitions": cfg.partitions,
            "retention_ms": cfg.retention_ms,
            "compression": cfg.compression,
            "messages_per_partition": per_partition,
            "total_messages": sum(per_partition.values()),
        }

    def apply_retention(self, topic: str, now_ms: int,
                        ts_col: str = "ts") -> int:
        """Retention enforcement: drop rows older than retention_ms by
        rewriting surviving rows (a time-partitioned layout would drop
        whole partitions instead; same semantics). Returns rows kept."""
        cfg = self.config(topic)
        df = self.scan(topic)
        cutoff = F.timestamp_millis(F.lit(now_ms - cfg.retention_ms))
        kept = df.filter(F.col(ts_col) >= cutoff)
        tmp = self.root / f"_retention_tmp_{topic.replace('/', '_')}"
        kept.write.mode("overwrite").partitionBy("partition").parquet(str(tmp))
        shutil.rmtree(self.root / topic)
        tmp.rename(self.root / topic)
        return self.scan(topic).count()
