"""Central query registry: every driver-verifiable operator lives here.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with the ANSI-SQL oracle DuckDB runs on the same parquet files. The
driver (see __spark_entry__.py) compares row count + schema +
order-insensitive value hash, so:

  * every computed column is aliased identically on both sides;
  * double aggregates go through exact decimal sums (stats.dsum) so the
    result does not depend on partitioning / addition order;
  * ranked or limited results use total-order deterministic tiebreaks.

Modules register their queries at import time via @register.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # None => driver runs a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}

# The driver verifies queries in `queries()` iteration order with a
# budget (round 1 recorded rows for exactly the first 50 of 72). This
# explicit front-rank guarantees every SURVEY.md section-2 operator and
# every LLM-pipeline operator family has a driver-verified row inside
# that budget; everything else keeps its registration (and round-1
# verified) order behind it. tests/test_priority.py asserts the
# closure: the union of operator tags over PRIORITY covers the full
# required tag set.
PRIORITY: tuple[str, ...] = (
    # Round-8 rotation (VERDICT r7 item #1): drain the ENTIRE 20-name
    # round-7 PENDING_ROTATION queue (the only oracle-backed queries
    # never driver-verified), keep a minimal greedy tag-closure cover
    # (17 anchors, mostly the compact *_surface bundles), and spend
    # every remaining slot on the 13 LEAST-recently-green queries (all
    # last green in round 1). The 34 round-7-green rows rotate out;
    # tests/test_priority.py asserts tag closure over this budget.
    #
    # -- never driver-verified: the full round-7 rotation queue --
    "association_rules_lift", "seasonal_hourly_anomalies",
    "doc_chunks_rag", "group_split_leakproof",
    "rrf_fused_topk", "cdc_merge_upsert",
    "dyadic_quantile_sketch_prices", "kcore_copurchase",
    "data_quality_report", "incremental_rollup_events",
    "winsorized_price_stats", "ppr_trade_neighborhood",
    "rfm_customer_segments", "near_dup_survivors_by_quality",
    "rake_keyphrases_top20", "weekly_revenue_wow",
    "ltv_by_cohort_month", "info_gain_price_splits",
    "degree_assortativity_copurchase", "zipf_slope_tokens",
    # -- tag-closure anchors (greedy set cover over the tags the 20
    #    rows above leave uncovered; surfaces delegate to the
    #    standalone operator builders) --
    "ops_catalog_surface", "routing_pipeline_surface",
    "corpus_pipeline_surface", "envelope_props_surface",
    "streaming_core_surface", "ann_cosine_surface",
    "corpus_fingerprint_surface", "governance_surface",
    "joins_surface", "window_functions_profile",
    "tpch_q3_shipping_priority",            # tpch+O4 (r2, oldest provider)
    "winnow_shared_pairs",                  # 2.12-fingerprint (sole pair)
    "late_drop_counts",                     # W3 (sole source)
    "mmr_diverse_topk",                     # 2.12-mmr (sole source)
    "proto_wire_roundtrip",                 # S10 (sole source)
    "skew_key_diagnostics",                 # 2.12-skew (sole source)
    "video_frames_apng",                    # 2.12-video
    # -- least-recently-green re-verification (all last green in
    #    round 1; six rounds unchecked) --
    "duplicate_counts", "embedding_norms_by_label",
    "events_cube_type_outcome", "events_pivot_by_type",
    "lag_per_partition", "lag_rollup_grand_total",
    "lag_total_by_group", "latency_percentiles",
    "minhash_lsh_pairs", "minhash_signatures",
    "offset_probe", "replay_offset_range", "replay_time_range",
)

# Oracle-backed queries waiting for a driver slot (bounded <= 25,
# drained by the NEXT round's rotation — tests/test_priority.py).
# Round 8 starts with an EMPTY queue: the round-7 queue was drained
# into the budget above. New round-8 registrations append here (each
# must be drive_contract-green locally — hash + schema — before it is
# queued: the freeze rule).
PENDING_ROTATION: tuple[str, ...] = (
    # round-8 registrations, each drive_contract-green (hash + schema)
    # at sf0.01 before queueing: the GIF/LZW decode pair (still +
    # animated) and the suffix-automaton repeated-n-gram profile
    "multimodal_features_gif", "video_frames_gif",
    "longest_repeated_ngram",
    # second round-8 wave: Aho-Corasick banned-phrase scan and
    # overlap-merging interval islands, same local-green gate
    "blocklist_scan", "interval_coverage_supplier",
    # third round-8 wave: ML-ops drift + sequential change detection
    "psi_value_drift", "cusum_value_alerts",
    "embedding_gram_matrix",
    "multimodal_resize_gif", "ivm_delta_join_orders",
    "wl_roles_copurchase",
    # fourth round-8 wave: ML-eval + ML-preprocessing
    "auc_purchase_score", "quantile_normalize_values",
    "u_shaped_attribution", "holt_trend_per_user",
    "avg_precision_purchase", "calibration_ece_bins",
    "chi2_type_weekday",
)

# After PRIORITY and the rotation queue in driver order (a >50 budget
# reaches the oracle-backed queue first; these rows-only entries come
# after it — see ordered_names below).
# Per VERDICT r3 item #7 this tail holds ONLY the intrinsically
# rows-only queries (no SQL-expressible oracle by nature);
# tests/test_registry.py asserts every oracle-backed query is either
# inside the 50-slot budget or already driver-green in a prior round.
_NEXT: tuple[str, ...] = ("simhash_fingerprints", "approx_distinct_users",
                          "multimodal_features_stub",
                          "multimodal_resize_stub")


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn
    return deco


def ordered_names() -> list[str]:
    """Registry names in driver verification order: the 50-slot
    PRIORITY budget first, then the oracle-backed rotation queue (so a
    driver budget ever larger than 50 verifies hash-checkable queries
    before the rows-only tail), then _NEXT, then registration order."""
    _load_all()
    head = [n for n in PRIORITY + PENDING_ROTATION + _NEXT
            if n in REGISTRY]
    seen = set(head)
    return head + [n for n in REGISTRY if n not in seen]


def all_queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].builder for name in ordered_names()}


def all_oracles() -> dict[str, str]:
    return {name: REGISTRY[name].oracle for name in ordered_names()
            if REGISTRY[name].oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from event_streaming_service_spark import query_defs  # noqa: F401

    _LOADED = True
