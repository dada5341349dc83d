"""Event-time window analytics W8 / W2 (SURVEY.md section 2.8), batch form.

The reference has no windowed aggregation (Kafka Streams is explicitly
disabled, application.yml:76-88); the north star requires it. Streaming
twins (native `window()` / `session_window()` with watermarks) live in
streaming/pipeline.py; the batch analogues here are built on *wall-clock
millisecond arithmetic* so they are engine-portable (DuckDB-checkable)
and session-timezone invariant — native `F.window` buckets instants,
which drifts for non-whole-hour zone offsets.

Scale: tumbling/sliding are pure projections + hash aggregates (the
explode for sliding multiplies rows by windows/slide, the standard
cost); sessionization is one shuffle on the key + a sort — the same
plan Spark's own session_window generates in batch mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.scalars import (
    millis_to_ts,
    wall_clock_millis,
)


def tumbling(df: DataFrame, ts_col: str, width_ms: int) -> DataFrame:
    """W8 tumbling: assign each row the [start, end) bucket of width_ms."""
    ms = wall_clock_millis(F.col(ts_col))
    start = (ms / width_ms).cast("bigint") * width_ms
    return (df
            .withColumn("window_start", millis_to_ts(start))
            .withColumn("window_end", millis_to_ts(start + width_ms)))


def sliding(df: DataFrame, ts_col: str, width_ms: int, slide_ms: int) -> DataFrame:
    """W8 sliding: explode each row into the width/slide windows that
    contain it (standard multiplicity = width_ms / slide_ms)."""
    assert width_ms % slide_ms == 0, "width must be a multiple of slide"
    k = width_ms // slide_ms
    ms = wall_clock_millis(F.col(ts_col))
    offsets = F.array(*[F.lit(i * slide_ms) for i in range(k)])
    exploded = df.withColumn("__off", F.explode(offsets))
    start = ((ms - F.col("__off")) / width_ms).cast("bigint") * width_ms + F.col("__off")
    return (exploded
            .withColumn("window_start", millis_to_ts(start))
            .withColumn("window_end", millis_to_ts(start + width_ms))
            .filter(ms >= start)  # guard rows earlier than the first window
            .drop("__off"))


def session_labels(df: DataFrame, key_col: str, ts_col: str,
                   gap_ms: int, tiebreak_col: str,
                   seq_col: str = "session_seq",
                   n_segments: int | None = None) -> DataFrame:
    """Gaps-and-islands session labeling, shared by `sessionize` (the
    per-session aggregate) and analytics.session_paths (the journey
    report): appends `__ms` (wall-clock millis) and `seq_col` to every
    row. The boundary rule — a gap STRICTLY greater than gap_ms starts
    a new session; exactly gap_ms merges (the empirically-pinned
    session_window rule) — lives here and ONLY here, so the two
    consumers can never silently disagree.

    A single hot key sorts its whole timeline in one task; pass
    n_segments to decompose EXACTLY into (key, time-segment) windows:
    each segment's first-row boundary flag comes from the previous
    non-empty segment's last timestamp, and session numbers add the
    integer prefix sum of per-segment boundary counts — bit-identical
    to the single-window form (asserted in tests), max task =
    rows/segment."""
    ms = wall_clock_millis(F.col(ts_col))
    if not n_segments:
        order = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
        return (df.withColumn("__ms", ms)
                .withColumn("__prev", F.lag("__ms").over(order))
                .withColumn(
                    "__new_session",
                    (F.col("__prev").isNull()
                     | ((F.col("__ms") - F.col("__prev")) > gap_ms))
                    .cast("int"))
                .withColumn(seq_col,
                            F.sum("__new_session").over(
                                order.rowsBetween(
                                    Window.unboundedPreceding, 0)))
                .drop("__prev", "__new_session"))

    span = (df.groupBy(key_col)
            .agg(F.min(ms).alias("__mn"), F.max(ms).alias("__mx")))
    base = (df.withColumn("__ms", ms)
            .join(span, key_col)
            .withColumn("__seg",
                        F.expr(f"CAST((__ms - __mn) * {n_segments} "
                               f"DIV (__mx - __mn + 1) AS INT)"))
            .drop("__mn", "__mx"))
    w = Window.partitionBy(key_col, "__seg").orderBy(ts_col, tiebreak_col)
    flagged = (base
               .withColumn("__prev", F.lag("__ms").over(w))
               .withColumn(
                   "__flag_within",
                   F.when(F.col("__prev").isNotNull(),
                          ((F.col("__ms") - F.col("__prev")) > gap_ms)
                          .cast("int"))))
    # per-(key, segment) summaries: last timestamp (for the next
    # segment's first-row gap) and the within-segment boundary count
    seg_sum = (flagged.groupBy(key_col, "__seg")
               .agg(F.min("__ms").alias("__first_ms"),
                    F.max("__ms").alias("__last_ms"),
                    F.sum(F.coalesce("__flag_within", F.lit(0)))
                    .alias("__n_within")))
    w_seg = Window.partitionBy(key_col).orderBy("__seg")
    seg_info = (seg_sum
                .withColumn("__prev_last",
                            F.lag("__last_ms").over(w_seg))
                .withColumn(
                    "__first_flag",
                    (F.col("__prev_last").isNull()
                     | ((F.col("__first_ms") - F.col("__prev_last"))
                        > gap_ms)).cast("int"))
                .withColumn(
                    "__offset",
                    F.coalesce(
                        F.sum(F.col("__n_within") + F.col("__first_flag"))
                        .over(w_seg.rowsBetween(Window.unboundedPreceding,
                                                -1)),
                        F.lit(0)))
                .select(key_col, "__seg", "__first_flag", "__offset"))
    flag = F.when(F.col("__prev").isNull(), F.col("__first_flag")) \
            .otherwise(F.col("__flag_within"))
    return (flagged
            .join(seg_info, [key_col, "__seg"])
            .withColumn("__f", flag)
            .withColumn(seq_col,
                        F.col("__offset")
                        + F.sum("__f").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__prev", "__flag_within", "__first_flag",
                  "__offset", "__f", "__seg"))


def sessionize(df: DataFrame, key_col: str, ts_col: str, gap_ms: int,
               tiebreak_col: str,
               n_segments: int | None = None) -> DataFrame:
    """W8 session windows: gaps-and-islands — a new session starts when
    the gap to the previous event of the same key exceeds gap_ms.

    Returns one row per (key, session): start/end timestamps and count.
    This is the batch twin of `session_window(ts, gap)`; in streaming
    the native operator maintains the same semantics incrementally.
    n_segments enables the exact hot-key decomposition (see
    session_labels)."""
    with_gap = session_labels(df, key_col, ts_col, gap_ms, tiebreak_col,
                              n_segments=n_segments)
    return (
        with_gap.groupBy(key_col, "session_seq")
        .agg(
            millis_to_ts(F.min("__ms")).alias("session_start"),
            millis_to_ts(F.max("__ms")).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def per_key_order(df: DataFrame, key_col: str, ts_col: str,
                  tiebreak_col: str,
                  n_segments: int | None = None) -> DataFrame:
    """W2: the per-key ordering guarantee, materialized — sequence number
    and previous-event pointer within each key (the result-side
    restatement of Kafka's same-key-same-partition contract).

    n_segments enables the exact hot-key decomposition: seq = within-
    (key, time-segment) row_number + the integer prefix sum of prior
    segment row counts, and each segment's first row takes its
    prev-pointer from the previous non-empty segment's last row —
    bit-identical to the single-window form, max task =
    rows/segment."""
    if not n_segments:
        w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
        return (df
                .withColumn("seq", F.row_number().over(w).cast("bigint"))
                .withColumn("prev_event_id", F.lag(tiebreak_col).over(w)))

    ms = wall_clock_millis(F.col(ts_col))
    span = (df.groupBy(key_col)
            .agg(F.min(ms).alias("__mn"), F.max(ms).alias("__mx")))
    base = (df.withColumn("__ms", ms)
            .join(span, key_col)
            .withColumn("__seg",
                        F.expr(f"CAST((__ms - __mn) * {n_segments} "
                               f"DIV (__mx - __mn + 1) AS INT)"))
            .drop("__mn", "__mx"))
    w = Window.partitionBy(key_col, "__seg").orderBy(ts_col, tiebreak_col)
    # extremal selection must use the FULL-precision (ts, tiebreak)
    # order the window uses — __ms is millisecond-truncated, and a
    # sub-ms tie could pick a different "last" row than the sort
    okey = F.struct(F.col(ts_col), F.col(tiebreak_col))
    seg_sum = (base.groupBy(key_col, "__seg")
               .agg(F.count(F.lit(1)).alias("__n"),
                    F.max_by(F.col(tiebreak_col), okey).alias("__last_tb")))
    w_seg = Window.partitionBy(key_col).orderBy("__seg")
    seg_info = (seg_sum
                .withColumn("__offset",
                            F.coalesce(
                                F.sum("__n").over(
                                    w_seg.rowsBetween(
                                        Window.unboundedPreceding, -1)),
                                F.lit(0)))
                .withColumn("__prev_last",
                            F.lag("__last_tb").over(w_seg))
                .select(key_col, "__seg", "__offset", "__prev_last"))
    within_prev = F.lag(tiebreak_col).over(w)
    return (base
            .join(seg_info, [key_col, "__seg"])
            .withColumn("seq",
                        (F.col("__offset")
                         + F.row_number().over(w)).cast("bigint"))
            .withColumn("prev_event_id",
                        F.coalesce(within_prev, F.col("__prev_last")))
            .drop("__ms", "__seg", "__offset", "__prev_last"))


def gapfill_locf(aggregated: DataFrame, key_col: str, bucket_col: str,
                 step_ms: int, value_cols: list[str]) -> DataFrame:
    """Hypertable-style time_bucket_gapfill + locf: densify a per-key
    bucketed aggregate to EVERY step in that key's [min, max] bucket
    range, carrying the last observed value forward into the generated
    gaps. Output: one row per (key, bucket) with `is_gap` marking
    synthesized rows.

    Plan shape for 100 TB: the spine (per-key bucket sequence) comes
    from ONE tiny aggregate (min/max per key — key cardinality rows)
    exploded JVM-side; the left join back to the data hashes on
    (key, bucket) — the aggregate's own grain, so no wider shuffle than
    the input already had; the carry-forward is last(ignorenulls) over
    the per-key bucket order, one window pass. Nothing is quadratic in
    the time range: a key's cost is its own bucket count. A pathological
    key spanning years at second granularity fans out exactly like any
    sparse-to-dense densification must — cap it upstream by bucketing
    coarser, not here.
    """
    ms = wall_clock_millis(F.col(bucket_col))
    spine = (aggregated
             .groupBy(key_col)
             .agg(F.min(ms).alias("__lo"), F.max(ms).alias("__hi"))
             .select(key_col,
                     F.explode(F.sequence(
                         F.col("__lo"), F.col("__hi"),
                         F.lit(step_ms).cast("bigint"))).alias("__ms"))
             .select(key_col, millis_to_ts(F.col("__ms")).alias(bucket_col)))
    # Presence is marked explicitly (not inferred from a value column):
    # an observed bucket whose first value column is legitimately NULL
    # (e.g. SUM over all-NULL inputs) must NOT be treated as a gap.
    joined = spine.join(
        aggregated.withColumn("__present", F.lit(1)),
        [key_col, bucket_col], "left")
    w = (Window.partitionBy(key_col)
         .orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = joined.withColumn("is_gap", F.col("__present").isNull())
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.drop("__present")


def ewma(df: DataFrame, key_col: str, ts_col: str, value_col: str,
         alpha: float, order_tiebreak: str | None = None) -> DataFrame:
    """Per-key exponentially weighted moving average, recursive form
    s_t = alpha*x_t + (1-alpha)*s_{t-1} (s_0 = x_0) — the smoothing
    primitive behind anomaly baselines and rate estimators. Inherently
    sequential per key (each state folds ALL history), so it cannot be
    a frame expression; the closed-form window-sum rewrite needs
    alpha^(-i) terms that overflow doubles after ~1000 rows.

    Shape: one shuffle on a HASH SHARD of the key (not the key itself)
    then a linear Arrow pass per shard: sort by (key, ts) and run
    pandas' cython GroupBy.ewm over all of a shard's keys at once.
    Sharding matters at real key cardinalities — per-KEY applyInPandas
    pays ~0.3 ms of pandas frame overhead per group, which at 10^4
    groups dwarfed the arithmetic (measured 3.8 s -> 0.6 s at sf0.1 on
    the driver benchmark when 10k per-user groups collapsed into 64
    shards). A pathological single hot key still lands in one shard —
    same caveat as sessionization; `ewma_segmented` below is the
    distributed fallback once a key outgrows a task (~10^8 rows).

    Values are rounded to 6dp so results are reproducible against a
    sequential SQL evaluation (float fold order inside a group is
    already fixed by the sort; rounding guards the cross-engine ulps).
    """
    import pandas as pd

    sort_cols = [key_col] + [ts_col] + (
        [order_tiebreak] if order_tiebreak else [])
    out_schema = (f"{key_col} {df.schema[key_col].dataType.simpleString()},"
                  f" {ts_col} {df.schema[ts_col].dataType.simpleString()},"
                  f" {value_col} double, ewma double")

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        vals = pdf[value_col].astype("float64")
        # cython groupby-ewm over the whole shard; groups are
        # consecutive after the sort, so dropping the group level of
        # the MultiIndex restores row order directly
        # dropna=False: NULL is a real group (SQL PARTITION BY
        # semantics, and what the per-key form computed) — pandas'
        # default groupby silently drops NaN keys
        s = (vals.groupby(pdf[key_col], sort=False, dropna=False)
             .ewm(alpha=alpha, adjust=False).mean()
             .reset_index(level=0, drop=True).sort_index())
        out = pdf[[key_col, ts_col]].copy()
        out[value_col] = vals
        out["ewma"] = s.round(6)
        return out

    cols = list(dict.fromkeys([key_col, ts_col, value_col]
                              + ([order_tiebreak] if order_tiebreak else [])))
    shard = F.pmod(F.xxhash64(key_col), F.lit(64)).alias("__shard")
    return (df.select(*cols).withColumn("__shard", shard)
            .groupBy("__shard").applyInPandas(smooth, out_schema))


def ewma_segmented(df: DataFrame, key_col: str, ts_col: str,
                   value_col: str, alpha: float,
                   order_tiebreak: str | None = None,
                   n_segments: int = 32) -> DataFrame:
    """The hot-key fallback `ewma` documents: EWMA as a SEGMENTED SCAN,
    so a single key holding 10^8+ rows no longer lands in one task.

    The recurrence s_i = (1-a)*s_{i-1} + a*v_i is an affine map of the
    incoming state, and affine maps compose associatively: a segment of
    rows folds to (A, B) with s_out = A*s_in + B. So:

      pass 1  split each key's timeline into n_segments contiguous
              TIME ranges; per (key, segment), one sequential kernel
              folds (A, B) plus the seeded end-state (s_1 = v_1 rule)
              for the case where this is the key's first segment;
      pass 2  per key, combine the <=n_segments summaries in segment
              order (tiny frames) to assign every segment its true
              incoming state;
      pass 3  re-run the sequential kernel per (key, segment) from the
              assigned incoming state and emit every row.

    Three linear distributed passes, max task = rows/segment. Float
    caveat, stated honestly: the (A, B) composition associates float
    ops differently from the one-pass loop, so results can differ from
    `ewma` in the last ulps (both round to 6dp; tests pin agreement to
    1e-6). The one-pass form remains the oracle-checked default —
    reach for this one when a key outgrows a task. The persisted
    segmented base lives until the caller clears the cache."""
    import pandas as pd

    decay = 1.0 - alpha
    tb = [order_tiebreak] if order_tiebreak else []
    ms = wall_clock_millis(F.col(ts_col))
    cols = list(dict.fromkeys([key_col, ts_col, value_col] + tb))

    span = (df.groupBy(key_col)
            .agg(F.min(ms).alias("__mn"), F.max(ms).alias("__mx")))
    seg = F.expr(f"CAST((__ms - __mn) * {n_segments} "
                 f"DIV (__mx - __mn + 1) AS INT)")
    base = (df.select(*cols).withColumn("__ms", ms)
            .join(span, key_col)
            .withColumn("__seg", seg)
            .drop("__mn", "__mx")
            .persist())

    key_t = df.schema[key_col].dataType.simpleString()
    # kernels sort by the FULL-precision ts (not the ms-truncated
    # segment clock) so sub-ms orderings match the one-pass form
    sort_cols = [ts_col] + tb

    # All three passes run as PARTITION-level mapInPandas kernels over
    # repartition(key[, seg]) + sortWithinPartitions, carrying the fold
    # state across group boundaries AND Arrow batches. The former
    # per-(key, seg) applyInPandas paid ~1 ms of Arrow round-trip per
    # GROUP — measured 12k trivial groups = 11.7 s at sf0.1, 48 s for
    # the whole operator — the many-small-groups regime every normal
    # corpus presents; the hot-key regime (few huge groups) costs the
    # same per-row loop either way. The float op sequence per row is
    # unchanged, so results are identical to the previous form.

    def summarize_part(batches):
        st = {"cur": None, "a": 1.0, "b": 0.0, "seed": None, "out": []}

        def flush():
            if st["cur"] is not None:
                st["out"].append((st["cur"][0], st["cur"][1],
                                  st["a"], st["b"], st["seed"]))

        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            segs = pdf["__seg"].to_numpy()
            vals = pdf[value_col].astype("float64").to_numpy()
            for i in range(len(pdf)):
                kseg = (keys[i], segs[i])
                if st["cur"] != kseg:
                    flush()
                    st["cur"] = kseg
                    st["a"], st["b"], st["seed"] = 1.0, 0.0, None
                v = vals[i]
                st["a"] *= decay
                st["b"] = decay * st["b"] + alpha * v
                st["seed"] = (v if st["seed"] is None
                              else decay * st["seed"] + alpha * v)
        flush()
        yield pd.DataFrame(
            st["out"],
            columns=[key_col, "__seg", "a", "b", "seeded_end"])

    summaries = (base.repartition(F.col(key_col), F.col("__seg"))
                 .sortWithinPartitions(key_col, "__seg", *sort_cols)
                 .mapInPandas(
                     summarize_part,
                     f"{key_col} {key_t}, __seg int, a double, "
                     f"b double, seeded_end double"))

    def combine_part(batches):
        st = {"cur": None, "s": None, "out": []}
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            segs = pdf["__seg"].to_numpy()
            avs = pdf["a"].to_numpy()
            bvs = pdf["b"].to_numpy()
            seeds = pdf["seeded_end"].to_numpy()
            for i in range(len(pdf)):
                k = keys[i]
                if st["cur"] != k:
                    st["cur"], st["s"] = k, None
                st["out"].append((k, segs[i], st["s"]))
                st["s"] = (float(seeds[i]) if st["s"] is None
                           else float(avs[i]) * st["s"]
                           + float(bvs[i]))
        out = pd.DataFrame(st["out"],
                           columns=[key_col, "__seg", "s_in"])
        out["s_in"] = out["s_in"].astype("float64")
        yield out

    s_ins = (summaries.repartition(F.col(key_col))
             .sortWithinPartitions(key_col, "__seg")
             .mapInPandas(combine_part,
                          f"{key_col} {key_t}, __seg int, s_in double"))

    ts_t = df.schema[ts_col].dataType.simpleString()

    def finalize_part(batches):
        import numpy as np

        st = {"cur": None, "s": None}
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            segs = pdf["__seg"].to_numpy()
            vals = pdf[value_col].astype("float64").to_numpy()
            sins = pdf["s_in"].to_numpy()
            out = np.empty(len(pdf), dtype="float64")
            for i in range(len(pdf)):
                kseg = (keys[i], segs[i])
                if st["cur"] != kseg:
                    st["cur"] = kseg
                    st["s"] = (None if pd.isna(sins[i])
                               else float(sins[i]))
                v = vals[i]
                st["s"] = (v if st["s"] is None
                           else decay * st["s"] + alpha * v)
                out[i] = st["s"]
            res = pdf[[key_col, ts_col]].copy()
            res[value_col] = vals
            res["ewma"] = pd.Series(out, dtype="float64").round(6)
            yield res

    # s_in is one tiny row per (key, segment) — broadcast it onto the
    # persisted base, then one partition-sorted emit pass
    return (base.join(F.broadcast(s_ins), [key_col, "__seg"])
            .repartition(F.col(key_col), F.col("__seg"))
            .sortWithinPartitions(key_col, "__seg", *sort_cols)
            .mapInPandas(
                finalize_part,
                f"{key_col} {key_t}, {ts_col} {ts_t}, "
                f"{value_col} double, ewma double"))


def time_weighted_avg(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str,
                      order_tiebreak: str | None = None) -> DataFrame:
    """Interval-weighted mean per key (the time-series engines' `twa`):
    each observation's value holds from its timestamp until the key's
    next observation, and the average weights values by that holding
    duration — the honest mean of an irregularly-sampled signal, where
    the plain AVG over-counts bursts.

    Semantics: for a key's observations (t1..tn) sorted by (ts,
    tiebreak), twa = sum(v_i * (t_{i+1} - t_i)) / (t_n - t_1) over
    i < n; the final observation has no holding interval. Keys with one
    observation (or all at one instant) have span 0 and a NULL twa —
    n_events / span_ms let callers distinguish that from missing data.
    Duplicate timestamps are NOT order-independent: tied rows get
    zero-width intervals except the LAST in window order, whose value
    fills the gap to the next distinct timestamp — so with
    order_tiebreak=None the result is nondeterministic across
    runs/engines whenever a key has equal timestamps with different
    values. Callers needing cross-engine determinism (every registered
    query does) must pass a total-order tiebreak column such as
    event_id.

    Cross-engine determinism: the weighted sum runs entirely in exact
    integer arithmetic — values quantize to micro-units via
    floor(v*1e6 + 0.5) (the money.py convention), durations are epoch-
    millis bigints, and the sum is a decimal(38,0) — so no float fold
    order can drift; the single final division is pinned at 9 dp.

    Plan shape for 100 TB: ONE shuffle on the key serving both the
    lead() window and the aggregate (same partitioning, no second
    exchange); all arithmetic is codegen'd column math, no Python.
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    ms = wall_clock_millis(F.col(ts_col))
    v_micro = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5))
    # both factors widen to decimal BEFORE the multiply: a day-long
    # interval (8.6e7 ms) times a 2e11 micro-value already overflows
    # int64, which would throw under ANSI (silently wrap without)
    contrib = ((F.lead(ms).over(w) - ms).cast("decimal(38,0)")
               * v_micro.cast("decimal(38,0)"))
    return (df
            .select(key_col, ms.alias("__ms"),
                    contrib.alias("__contrib"))
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max("__ms") - F.min("__ms")).alias("span_ms"),
                 F.sum(F.coalesce(F.col("__contrib"), F.lit(0))
                       .cast("decimal(38,0)")).alias("__num"))
            .select(key_col, "n_events", "span_ms",
                    F.when(F.col("span_ms") > 0,
                           F.round(F.col("__num").cast("double")
                                   / (F.col("span_ms")
                                      .cast("double") * F.lit(1e6)), 9))
                    .alias("twa_value")))


def rolling_time_sum(df: DataFrame, key_col: str, ts_col: str,
                     units: Column, window_ms: int,
                     out_col: str = "rolling_sum") -> DataFrame:
    """Trailing time-window sum per key: for every row, the exact
    integer sum of `units` over [t - window_ms, t] (inclusive, peers
    at the same timestamp included — the frame is a RANGE frame, so
    same-instant rows see identical totals in every engine regardless
    of partition order). The moving-revenue / rolling-usage primitive.

    Plan shape: ONE shuffle on the key; the frame is a bounded-start
    RANGE over epoch-millis. Spark re-aggregates the in-frame buffer
    per row (no retract op), so cost is O(rows-in-window) per row —
    fine when the window is time-bounded and per-key arrival rate is
    dimension-like (orders per customer); for firehose keys prefer
    bucketed pre-aggregation (tumbling + two cumsums) instead of a
    per-row frame."""
    from event_streaming_service_spark.functions.scalars import (
        wall_clock_millis)

    ms = wall_clock_millis(F.col(ts_col))
    w = (Window.partitionBy(key_col).orderBy(ms)
         .rangeBetween(-window_ms, 0))
    return (df.withColumn("__units", units)
            .withColumn(out_col, F.sum("__units").over(w))
            .drop("__units"))


def interval_coverage(df: DataFrame, key_col: str, start_col: str,
                      end_col: str) -> DataFrame:
    """Merge overlapping [start, end] intervals per key (the
    gaps-and-islands INTERVAL variant: activity_streaks handles
    consecutive-bucket islands; this handles arbitrary spans that can
    nest and chain) and report per key:
      n_intervals, n_islands, covered_days (union length, inclusive),
      max_island_days.
    Touching intervals (next.start == running max end) merge — an
    island breaks only when start > max(end) over all earlier rows.

    Deterministic regardless of tiebreaks among equal starts: a row
    whose start equals an earlier row's start can never open an
    island (that earlier interval's end >= its own start), so island
    boundaries depend only on the (start) sort, which is total enough.

    Plan shape: ONE shuffle on the key; the running max(end) is a
    GROWING rows-frame (UNBOUNDED PRECEDING .. -1), which Spark
    maintains incrementally — O(1) per row, unlike bounded-start
    range frames (see time_windowed_sum's caveat); then one hash agg
    to island grain and one to key grain, both reusing the exchange."""
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = (prev_max.isNull()
              | (F.col(start_col) > prev_max)).cast("bigint")
    islands = (df
               .withColumn("__isl", F.sum(is_new).over(
                   w.rowsBetween(Window.unboundedPreceding, 0)))
               .groupBy(key_col, "__isl")
               .agg(F.min(start_col).alias("__s"),
                    F.max(end_col).alias("__e"),
                    F.count(F.lit(1)).alias("__n")))
    days = F.datediff(F.col("__e"), F.col("__s")) + 1
    return (islands.groupBy(key_col)
            .agg(F.sum("__n").cast("bigint").alias("n_intervals"),
                 F.count(F.lit(1)).cast("bigint").alias("n_islands"),
                 F.sum(days).cast("bigint").alias("covered_days"),
                 F.max(days).cast("int").alias("max_island_days")))
