"""Custom stateful operator: exact wall-clock-TTL idempotency (D1/D2/W4).

`dropDuplicatesWithinWatermark` approximates the reference's Redis
`SET key EX 3600` (BaseEventConsumer.java:188-196) in EVENT time; this
operator is the exact twin in PROCESSING time: per-event_id state with
a wall-clock timeout, so a duplicate arriving within ttl_seconds of
the first copy is dropped, and the key is re-admitted after expiry —
precisely the Redis TTL contract.

Built on applyInPandasWithState (Arrow-batched, per-key state with
ProcessingTimeTimeout). State is one empty marker per in-flight key,
evicted by timeout — bounded by (arrival rate x TTL) like the
reference's Redis working set.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from event_streaming_service_spark.streaming.pipeline import EVENT_SCHEMA

IDEMPOTENCY_TTL_S = 3600  # BaseEventConsumer.java:43-47

_STATE_SCHEMA = "first_seen_ms long"  # wall-clock admit time of the key


def dedup_with_ttl(stream: DataFrame,
                   ttl_seconds: int | None = IDEMPOTENCY_TTL_S) -> DataFrame:
    """First occurrence per event_id passes; duplicates within the TTL
    drop; after the TTL the key re-admits (Redis-expiry semantics).

    ttl_seconds=None disables the wall-clock timer (state then lives for
    the query lifetime). Tests use this: with ProcessingTimeTimeout
    registered, a query has standing timer work, so availableNow /
    processAllAvailable never see an idle stream and block until an
    external stop — fine for an always-on production pipeline, hostile
    to a run-to-completion harness.
    """

    ttl_ms = None if ttl_seconds is None else ttl_seconds * 1000

    def dedup_fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        import time

        if state.hasTimedOut:
            state.remove()
            return
        batches = [pdf for pdf in pdfs]
        if state.exists:
            # duplicate within TTL -> drop everything. Each invocation
            # CLEARS the previously-registered timeout, so the timer
            # must be re-armed here with the REMAINING ttl (measured
            # from the stored first-seen wall clock) or the key's state
            # would never expire — the Redis contract is expiry at
            # first_seen + TTL regardless of how many duplicates land.
            if ttl_ms is not None:
                (first_seen_ms,) = state.get
                remaining = first_seen_ms + ttl_ms - int(time.time() * 1000)
                state.setTimeoutDuration(max(1, remaining))
            return
        state.update((int(time.time() * 1000),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        first = min(
            (pdf for pdf in batches if len(pdf)),
            key=lambda pdf: (pdf["ts"].min(), pdf["event_id"].min()),
            default=None,
        )
        if first is not None:
            row = first.sort_values(["ts", "event_id"]).head(1)
            yield row

    timeout = (GroupStateTimeout.NoTimeout if ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (stream.groupBy("event_id")
            .applyInPandasWithState(
                dedup_fn,
                outputStructType=EVENT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


def ewma_stream(stream: DataFrame, alpha: float,
                key_col: str = "user_id", ts_col: str = "ts",
                value_col: str = "value",
                tiebreak_col: str = "event_id") -> DataFrame:
    """Per-key EWMA as a custom STATEFUL streaming operator: the
    smoothed value s = alpha*x + (1-alpha)*s carries across
    micro-batches in one double of state per key — the numeric-state
    companion to the marker-state TTL dedup above, and the streaming
    twin of operators/windows.ewma (whose docstring names this shape
    as its hot-key fallback: state is O(1) per key no matter how many
    rows a key accumulates).

    Emission is immediate (every input row yields its smoothed row;
    no watermark holdback), so on a time-ordered source the emitted
    set equals the batch EWMA — giving the operator an exact
    recursive-CTE oracle. Within a batch rows are folded in
    (ts, tiebreak) order; across batches the file source's time order
    (query_defs/streaming_queries._stream_src) preserves the global
    fold order.

    The per-step arithmetic is the same two IEEE products + one sum
    the batch kernel and the SQL oracle compute; values round to 6 dp
    on emit while the carried state stays full-precision — identical
    to the batch kernel's round-at-the-end.
    """

    def ewma_fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values([ts_col, tiebreak_col],
                                  ignore_index=True)
        import math

        s = state.get[0] if state.exists else None
        out_vals = []
        for x in batch[value_col].astype("float64"):
            s = float(x) if s is None else alpha * float(x) + (1 - alpha) * s
            # half-up via floor(x*1e6+0.5), NOT round(): alpha=1/2^k
            # makes s an exact binary fraction, so ties at the 6 dp
            # boundary are COMMON and banker's-vs-away rounding would
            # diverge between engines (functions/money.py precedent)
            out_vals.append(math.floor(s * 1e6 + 0.5) / 1e6)
        state.update((s,))
        out = batch[[key_col, ts_col, value_col]].copy()
        out["ewma"] = out_vals
        yield out

    out_schema = (f"{key_col} long, {ts_col} timestamp, "
                  f"{value_col} double, ewma double")
    return (stream.groupBy(key_col)
            .applyInPandasWithState(
                ewma_fn,
                outputStructType=out_schema,
                stateStructType="s double",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---- transformWithState (Spark 4.x state-v2 API) --------------------

def running_profile_stream(stream: DataFrame) -> DataFrame:
    """Per-user running profile on the transformWithState API (the
    state-v2 successor of applyInPandasWithState, new in Spark 4):
    each input event emits one row carrying
      n_events          — events seen so far for the user,
      n_types_seen      — distinct event_types seen so far,
      last3_cents_sum   — exact-cents sum of the latest <= 3 values.
    The three numbers deliberately exercise all three typed state
    variables the new API adds over the old single-tuple GroupState:
    a ValueState counter, a MapState distinct-type set, and a
    ListState recent-values window, each independently evolvable and
    TTL-capable (TTL unused here: emission must be deterministic).

    Emission is immediate and within-batch rows fold in (ts, event_id)
    order, so on the time-ordered file source the emitted set equals
    the batch window twin (running count, running first-occurrence
    sum, ROWS BETWEEN 2 PRECEDING frame) — the same stream==batch
    oracle device as ewma_stream above.

    Scale: state per user is O(1) + O(#event_types) + O(3) no matter
    how many events a key accumulates, checkpointed in RocksDB (the
    state-v2 backend), so a 100 TB replay holds working state
    proportional to the KEY set, not the event count.

    Environment gate (documented, mirrored by the pytest skip): the
    PySpark TWS state server speaks protobuf between the JVM and the
    Python driver worker; this container ships no `protobuf` package,
    so the operator cannot EXECUTE here and is therefore not
    registered as a driver query (the freeze rule requires local
    green before queueing). The implementation is complete and the
    batch window twin in tests/test_round8_ops.py runs wherever
    protobuf exists."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.n = handle.getValueState("n_events", "n bigint")
            self.types = handle.getMapState(
                "seen_types", "t string", "one tinyint")
            self.recent = handle.getListState("recent_cents", "c bigint")

        def handleInputRows(self, key, rows, timerValues):
            batch = pd.concat(list(rows), ignore_index=True)
            if not len(batch):
                return iter(())
            batch = batch.sort_values(["ts", "event_id"])
            n = self.n.get()[0] if self.n.exists() else 0
            seen = ({row[0] for row in self.types.keys()}
                    if self.types.exists() else set())
            recent = [r[0] for r in self.recent.get()] \
                if self.recent.exists() else []
            out = []
            for ts, eid, etype, value in zip(
                    batch["ts"], batch["event_id"],
                    batch["event_type"], batch["value"]):
                n += 1
                if etype not in seen:
                    seen.add(etype)
                    self.types.updateValue((etype,), (1,))
                cents = int(value * 100 + 0.5)  # value >= 0 in fixture
                recent = (recent + [cents])[-3:]
                out.append((key[0], ts, int(eid), n, len(seen),
                            sum(recent)))
            self.n.update((n,))
            self.recent.put([(c,) for c in recent])
            yield pd.DataFrame(out, columns=[
                "user_id", "ts", "event_id", "n_events",
                "n_types_seen", "last3_cents_sum"])

        def close(self) -> None:
            pass

    return (stream.groupBy("user_id")
            .transformWithStateInPandas(
                _Proc(),
                outputStructType=("user_id bigint, ts timestamp, "
                                  "event_id bigint, n_events bigint, "
                                  "n_types_seen int, "
                                  "last3_cents_sum bigint"),
                outputMode="append",
                timeMode="none"))
