"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect).

Protocol (VERDICT r2 items #1c/#2, r10 item #1):
  * fixtures are first rewritten into multi-file splittable parquet
    (sources/fixtures.py) so scans parallelize like any real table —
    the driver fixtures are single-row-group files whose scans are
    serial by construction; the rewrite cost is reported separately as
    `fixture_prep_sec`, never inside query timings. Opt out with
    SPARK_GRAFT_NO_SPLIT=1.
  * every query gets ONE untimed warmup run, then best-of-N timed runs
    (N = $SPARK_GRAFT_BENCH_RUNS, default 3). Round-2 showed cold
    first-touch (JIT, Arrow worker spin-up, plan-cache state) posing as
    per-query regressions; warmed best-of-N makes BENCH_r*.json
    round-to-round comparable.
  * the whole sweep runs in S separate Spark sessions
    (S = $SPARK_GRAFT_BENCH_SESSIONS, default 3) with the session torn
    down and rebuilt in between, and each query reports its MINIMUM
    across sessions (VERDICT r3 item #2): minima over time-separated
    sessions are the noise-resistant estimate on a shared host.
  * BUDGET-AWARE (VERDICT r10 item #1): the round-10 driver bench was
    killed at its ~3600 s wall-clock limit (rc=124) and recorded
    nothing. The sweep now runs under an internal budget
    ($SPARK_GRAFT_BENCH_BUDGET_SEC, default 3000 s) and degrades
    instead of dying: later sessions are skipped when the measured
    cost of the previous session does not fit the remaining budget,
    the per-query loop stops at the deadline, and the final JSON line
    is ALWAYS emitted with whatever was measured ("truncated": true
    when cut short). SIGTERM/SIGALRM emit the same line immediately,
    so even an external kill leaves a parseable record.
  * the headline list itself is rotated (VERDICT r10 item #1b): the
    driver-facing run times BENCH_QUERIES, a ~100-name representative
    set (every operator family, the current perf-fix targets, the
    newest wave). The full inventory lives in BENCH_QUERIES_FULL and
    is measured locally with SPARK_GRAFT_BENCH_FULL=1, which refreshes
    BENCH_FULL.json; the rotated driver run writes BENCH_LAST.json and
    never clobbers the full record with a subset.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Full headliner inventory: one per operator family, weighted toward
# the plans that stress shuffle/join/agg shape at scale. Measured
# locally (SPARK_GRAFT_BENCH_FULL=1) into BENCH_FULL.json.
BENCH_QUERIES_FULL = [
    "tpch_q1_pricing_summary",      # scan-heavy 8-agg groupBy
    "tpch_q3_shipping_priority",    # selective 3-way join + top-k
    "tpch_q5_local_supplier_volume",  # 6-way join
    "tpch_q7_nation_volume",        # bilateral nation pairs by year
    "tpch_q10_returned_items",      # returned-item top-20
    "tpch_q14_promo_revenue",       # promo ratio
    "tpch_q19_disjunctive_join",    # disjunctive predicates
    "topic_statistics",             # event stats A5
    "lag_per_partition",            # offset joins A1/J1
    "routing_keys",                 # 8 key strategies projection
    "validation_rejects",           # validate + DLQ split
    "dedup_earliest",               # window dedup D1
    "replay_time_range",            # pushed-down range scan S5
    "asof_last_order_before_event",  # as-of join J4
    "session_windows_30m",          # sessionization W8
    "sliding_hourly_counts",        # sliding windows W8
    "per_key_ordering",             # W2 ordering windows
    "near_dup_shingle_jaccard",     # exact near-dup pairs
    "minhash_lsh_pairs",            # MinHash+LSH dedup pipeline
    "cosine_topk_bruteforce",       # similarity top-k
    "ann_lsh_cosine",               # LSH approximate top-k
    "doc_fingerprints",             # text fingerprints
    "quality_scores",               # text quality
    "tfidf_top_terms",              # tf-idf
    "salted_hot_key_agg",           # skew-safe aggregation
    "scd2_customer_updates",        # CDC merge
    # round-2 combined-grain surface
    "lag_surface",                  # ROLLUP lag at every grain
    "topic_dashboard",              # stats+percentiles+dups, one agg
    "topic_offset_catalog",         # offset probe + per-topic counts
    "replay_slice",                 # both replay modes, one scan
    "routing_surface",              # keys + partition + balance
    "pipeline_dispositions",        # validate/retry/DLQ decision
    "envelope_projection",          # nested envelope build + project
    "catalog_surface",              # topics/groups/subscriptions
    "doc_text_metrics",             # token/langid/quality, one pass
    # corpus-pipeline operators (round 2)
    "near_dup_clusters",            # LSH pairs -> components -> canonical
    "sampling_surface",             # hash-rate + quota sampling
    "pii_scrub_stats",              # regex scrub + span counts
    "seq_packing",                  # token-budget bin packing
    # round-3 corpus operators
    "contamination_flags",          # eval-set n-gram overlap sweep
    "repetition_stats",             # Gopher dup-gram / top-token filters
    # round-4 additions
    "gapfill_hourly_locf",          # spine explode + LOCF window
    "ewma_value_per_user",          # sequential per-key Arrow smoother
    "weighted_sample_by_length",    # Efraimidis-Spirakis top-n
    "multimodal_features_png",      # real PNG decode per document
    "tpch_q9_product_type_profit",  # 6-way join, largest TPC-H shape
    "tpch_q18_large_volume_customers",  # agg-in-join heavy hitter
    "governance_surface",           # 6-leg union surface
    "window_functions_profile",     # 6 window exprs, one sort pass
    # round-4 TPC-H completion + sketch/audio operators
    "tpch_q2_min_balance_supplier",  # correlated-MIN decorrelation
    "tpch_q8_market_share",          # 7-way join share ratio
    "tpch_q16_supplier_part_spec_counts",  # distinct-count + anti join
    "tpch_q21_waiting_supplier",     # EXISTS/NOT-EXISTS decorrelated
    "heavy_hitter_tokens",           # MG candidates + exact verify
    "audio_features_wav",            # real RIFF/PCM16 decode per doc
    # round-4 second wave: analytics + profiling + skyline + index
    "twa_value_per_user",            # interval-weighted mean, one shuffle
    "value_trend_per_user",          # OLS-as-aggregation decimal sums
    "table_profile_surface",         # 11-column unpivot profile
    "pareto_frontier_parts",         # grouped skyline windows
    "inverted_index_terms",          # explode + 2-level agg + postings
    "set_similarity_pairs",          # prefix-filtered shingle PPJoin
    "pagerank_trade_graph",          # 5-round integer PageRank
    # round-5 additions
    "part_hierarchy_rollup",         # iterated-join recursive closure
    "pq_cosine_topk",                # literal-codebook PQ codes + ADC
    "vocab_coverage",                # top-V vocab broadcast coverage
    "bpe_merge_pairs",               # vocab-weighted char-pair counts
    "dataset_split_assignment",      # hash split, pure projection
    "curriculum_quality_buckets",    # distributed global rank buckets
    "image_dhash_groups",            # PNG decode + perceptual hash
    "audio_fingerprint_dupes",       # WAV decode + derivative hash
    "multimodal_features_jpeg",      # real baseline-JPEG decode
    "ivfpq_cosine_topk",             # IVF probe + PQ-ADC rerank
    # round-7 additions
    "multimodal_features_jpeg_color",  # real 4:2:0 color JPEG decode
    "pq_trained_topk",               # integer-Lloyd codebook + ADC
    "proto_wire_roundtrip",          # protobuf wire encode+decode
    "transition_matrix_segmented",   # hot-key Markov decomposition
    "ewma_segmented_per_user",       # hot-key EWMA decomposition
    "rolling_7d_revenue",            # bounded-start RANGE frame
    "activity_streaks_per_user",     # gaps-and-islands
    "abc_classification_parts",      # global cumulative-share classes
    "ship_delay_stats",              # fact-fact join + exact variance
    "order_value_deciles",           # NTILE decile profile
    "unigram_lm_scores",             # corpus LM join + doc scores
    "token_entropy_per_doc",         # per-doc entropy, nano-nat pinned
    "bm25_doc_scores",               # BM25 retrieval scoring
    "ngram_novelty_ratio",           # 5-gram first-seen novelty
    "knn_label_vote",                # kNN vote over exact cosine
    "triangle_count_copurchase",     # degree-oriented motif census
    "supplier_balance_rank_profile",  # percent_rank/cume_dist windows
    # round-7 second wave
    "winnow_fingerprint_stats",      # rolling-hash winnow kernel
    "winnow_shared_pairs",           # fingerprint posting-list join
    "hll_distinct_users",            # 256-register portable HLL
    "kmv_distinct_users_by_type",    # bottom-k theta sketch merge
    "mmr_diverse_topk",              # candidate top-C + greedy rerank
    "ohlc_bars_daily",               # candlestick downsample windows
    "skew_key_diagnostics",          # shuffle-key skew profile
    "adamic_adar_copurchase",        # wedge link prediction
    "video_frames_mjpeg",            # real AVI/MJPEG video decode
    "multimodal_features_jpeg_progressive",  # real SOF2 multi-scan decode
    "multimodal_features_jpeg_progressive_color",  # SOF2 4:2:0 color
    # round-7 third wave
    "association_rules_lift",        # market-basket lift mining
    "seasonal_hourly_anomalies",     # weekday-hour z-score anomalies
    "doc_chunks_rag",                # overlapping token-window chunks
    "group_split_leakproof",         # group-grain split + leak audit
    "rrf_fused_topk",                # BM25 + overlap rank fusion
    "cdc_merge_upsert",              # MERGE INTO changelog apply
    "dyadic_quantile_sketch_prices",  # mergeable log2-bucket quantiles
    "kcore_copurchase",              # 6-round degree peeling
    "data_quality_report",           # multi-table rule engine
    "incremental_rollup_events",     # IVM base+delta fold
    "winsorized_price_stats",        # percentile-capped robust stats
    "ppr_trade_neighborhood",        # seed-teleport personalized PR
    "rfm_customer_segments",         # 3x global-rank quintiles
    "near_dup_survivors_by_quality",  # LSH cluster argmax survivorship
    "rake_keyphrases_top20",         # RAKE phrase mining
    "weekly_revenue_wow",            # lag-window deltas on weekly grain
    "ltv_by_cohort_month",           # cohort LTV triangle + cumsum
    "info_gain_price_splits",        # decision-stump IG, one aggregate
    "degree_assortativity_copurchase",  # exact-moment graph Pearson
    "zipf_slope_tokens",             # log-log OLS over the corpus head
    # round-8 wave
    "multimodal_features_gif",       # real GIF/LZW decode
    "video_frames_gif",              # animated GIF per-frame stats
    "longest_repeated_ngram",        # per-doc suffix-automaton LRS
    "blocklist_scan",                # Aho-Corasick banned phrases
    "interval_coverage_supplier",    # overlap-merging islands
    "psi_value_drift",               # population stability index
    "cusum_value_alerts",            # max-plus change-point fold
    "embedding_gram_matrix",         # Q^T Q tree aggregate
    "multimodal_resize_gif",         # palette-index resample + LZW
    "ivm_delta_join_orders",         # four-term delta-join union
    "wl_roles_copurchase",           # 1-WL color refinement roles
    "auc_purchase_score",            # exact Mann-Whitney AUC
    "quantile_normalize_values",     # pooled-profile rank mapping
    "u_shaped_attribution",          # 40-20-40 multi-touch credit
    "holt_trend_per_user",           # level+trend double smoothing
    "avg_precision_purchase",        # exact PR-curve rank sum
    "calibration_ece_bins",          # reliability bins + ECE
    "chi2_type_weekday",             # contingency independence test
    # round-9 wave
    "adamic_adar_capped",            # hub-capped wedge link prediction
    "bpe_learned_merges",            # 6-round BPE merge learning
    "langid_ngram_confusion",        # trigram lang-ID + confusion
    "neyman_stratified_sample",      # optimal-allocation sampling
    "ann_recall_report",             # LSH-vs-exact recall@k audit
    "ann_beam_graph_topk",           # navigable-graph beam ANN
    "cuped_ab_adjusted",             # CUPED variance-reduced A/B
    "markov_stationary_types",       # integer power-iteration chain
    "kaplan_meier_conversion",       # product-limit survival curve
    "containment_doc_pairs",         # asymmetric doc-in-doc overlap
    "acf_hourly_by_type",            # dense-spine autocorrelation
    "theil_sen_value_trend",         # median-of-slopes robust trend
    "bootstrap_mean_ci_by_type",     # one-pass Poisson bootstrap CI
    "ivf_recall_report",             # IVF-vs-exact recall@k audit
    "ols2_value_by_time",            # 2-feature Cramer normal equations
    "gini_revenue_by_nation",        # rank-form concentration Gini
    "fano_burstiness_by_type",       # dense-spine dispersion index
    "xcorr_hourly_types",            # lead/lag cross-correlation
    "ks_value_drift",                # integer-ECDF two-sample KS
    "spearman_price_quantity",       # double-rank Spearman rho
    "mixture_sampling_weights",      # token-mass mixture reweighting
    "hits_trade_hubs",               # 3-round integer HITS
    "lpa_communities_copurchase",    # deterministic sync LPA
    "mutual_knn_pairs",              # reciprocal top-1 cosine
    "mann_kendall_value_trend",      # pair-sign S + tau-a
    # round 10
    "kn_bigram_lm_scores",           # Kneser-Ney bigram LM per doc
    "bpe_encoded_doc_stats",         # BPE apply (fertility readout)
    "pca_pc1_scores",                # integer power-iteration PCA
    "bh_fdr_value_drift",            # BH FDR over per-type KS tests
    "lm_quality_filter_en",          # CCNet perplexity-ratio filter
    "dirichlet_ql_scores",           # Dirichlet QL retrieval
    "minhash_jaccard_error_report",  # sketch-accuracy audit
    "logreg2_purchase_model",        # 3-round Newton logistic GLM
    "vocab_growth_by_lang",          # Chao1 + Good-Turing unseen mass
    "conformal_ols2_value_interval",  # split-conformal 95% interval
    "readability_scores",            # Flesch reading ease
    "idf_weighted_jaccard_pairs",    # IDF-weighted dedup verifier
    "welch_ttest_value_drift",       # unequal-variance t drift test
    "changepoint_value_trend",       # segmented-regression breakpoint
    "skipgram_pairs_top",            # word2vec skip-gram pair counts
    "negative_sampling_table",       # c^0.75 + subsampling tables
    "gopher_quality_flags",          # Gopher rule-bundle projection
    # round 11
    "kmeans_embedding_clusters",     # full-vector integer-Lloyd k-means
    "logreg2_cell_scores",           # logistic train->apply calibration
    "paragraph_dedup_stats",         # CCNet paragraph-grain exact dedup
    "semdedup_pairs",                # within-cluster semantic near-dups
    "ols2_kfold_cv",                 # complement-moment 5-fold CV
    "ivf_trained_topk",              # Lloyd-trained coarse quantizer IVF
    # round 11 late registrations (deferred past the r11 BENCH_FULL
    # generation; folded in at the r12 refresh)
    "hard_negative_topk",            # broadcast-anchor BLAS mining
    "split_leakage_near_dup",        # LSH pairs x split matrix
    # round 12
    "semdedup_survivors",            # pair graph -> components -> argmax
    "embedding_split_contamination",  # eval anchors vs train-only IVF
    "image_text_dup_pairs",          # dHash groups x text jaccard
]

# Driver-facing rotation (VERDICT r10 item #1b): a ~100-name
# representative subset — every operator family keeps at least one
# row, the current perf-fix targets and the newest wave are all in,
# and the projected wall cost fits the driver's ~3600 s kill with
# margin (r9's 163-name sweep barely passed; r10's 172-name sweep
# died). Dropped rows are the cheap family-redundant ones plus the
# two 24 s adamic-adar heavies (graph family keeps pagerank/HITS/LPA;
# the adamics stay in BENCH_QUERIES_FULL / BENCH_NOTES).
_ROTATION_DROPS = {
    # TPC-H: 8 representative shapes stay (q1 q2 q3 q5 q9 q18 q19 q21)
    "tpch_q7_nation_volume", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue", "tpch_q8_market_share",
    "tpch_q16_supplier_part_spec_counts",
    # graph heavies trimmed to ONE adamic row + assortativity; the r13
    # rotation restores triangle/kcore/wl_roles/ppr/adamic_capped so
    # the r12/r13 plan-verified graph wins get driver-confirmed
    # numbers (VERDICT r12 item #5)
    "adamic_adar_copurchase",
    "degree_assortativity_copurchase",
    # near-dup: jaccard/lsh/clusters/containment stay
    "near_dup_survivors_by_quality",
    # segmented twins of operators already represented
    "transition_matrix_segmented", "ewma_segmented_per_user",
    # multimodal: png/jpeg/jpeg_color/gif/mjpeg/audio stay
    "multimodal_features_jpeg_progressive",
    "multimodal_features_jpeg_progressive_color",
    "video_frames_gif", "multimodal_resize_gif",
    "audio_fingerprint_dupes", "image_dhash_groups",
    # text: core scoring/filter/tokenizer rows stay
    "bpe_merge_pairs", "vocab_coverage", "rake_keyphrases_top20",
    "ngram_novelty_ratio", "zipf_slope_tokens", "doc_chunks_rag",
    "heavy_hitter_tokens", "longest_repeated_ngram",
    # analytics: drift/GLM/robust/survival anchors stay
    "auc_purchase_score", "avg_precision_purchase",
    "calibration_ece_bins", "chi2_type_weekday",
    "info_gain_price_splits", "psi_value_drift", "cusum_value_alerts",
    "holt_trend_per_user", "twa_value_per_user",
    "value_trend_per_user", "winsorized_price_stats",
    "quantile_normalize_values", "u_shaped_attribution",
    "ltv_by_cohort_month", "weekly_revenue_wow", "ohlc_bars_daily",
    "rolling_7d_revenue", "activity_streaks_per_user",
    "abc_classification_parts", "order_value_deciles",
    "rfm_customer_segments", "interval_coverage_supplier",
    "dyadic_quantile_sketch_prices", "theil_sen_value_trend",
    "bootstrap_mean_ci_by_type",
    # retrieval/fusion: bm25 + dirichlet + knn stay
    "rrf_fused_topk", "association_rules_lift", "knn_label_vote",
    # ops surfaces: the cheap redundant ones
    "table_profile_surface", "data_quality_report",
    "group_split_leakproof", "curriculum_quality_buckets",
    "supplier_balance_rank_profile", "pareto_frontier_parts",
    "inverted_index_terms", "incremental_rollup_events",
}
BENCH_ROTATION = [n for n in BENCH_QUERIES_FULL if n not in _ROTATION_DROPS]

FULL_MODE = os.environ.get("SPARK_GRAFT_BENCH_FULL", "0") == "1"
BENCH_QUERIES = BENCH_QUERIES_FULL if FULL_MODE else BENCH_ROTATION

# Internal wall-clock budget (seconds). The driver kills bench runs at
# ~3600 s; finishing under 3000 s leaves margin for fixture prep and
# JVM teardown even on a loaded host.
BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "3000"))

_START = time.monotonic()

# Mutable sweep state shared with the signal handler so an external
# SIGTERM (the driver's timeout grace signal) still emits the record.
_STATE: dict = {"timings": {}, "sessions_completed": 0, "truncated": False,
                "prep_sec": 0.0, "emitted": False}


def _emit(truncated: bool | None = None) -> None:
    if _STATE["emitted"]:
        return
    _STATE["emitted"] = True
    repo_root = os.path.dirname(os.path.abspath(__file__))
    timings = {n: round(s, 3) for n, s in _STATE["timings"].items()}
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = -1.0
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "fixture_prep_sec": _STATE["prep_sec"],
        "runs_per_query": _STATE.get("runs", 0),
        "sessions": _STATE["sessions_completed"],
        "planned_queries": len(BENCH_QUERIES),
        "measured_queries": len(timings),
        "wall_sec": round(time.monotonic() - _START, 1),
        "list": "full" if FULL_MODE else "rotation",
    }
    if truncated if truncated is not None else _STATE["truncated"]:
        full["truncated"] = True
    full_line = json.dumps(full)
    # The rotated driver run must never clobber the full-list record.
    out_name = "BENCH_FULL.json" if FULL_MODE else "BENCH_LAST.json"
    try:
        with open(os.path.join(repo_root, out_name), "w") as f:
            f.write(full_line + "\n")
    except OSError:
        pass
    print(full_line)
    # Output protocol (VERDICT r4 item #2): the driver tail-captures
    # only the last ~2000 bytes of stdout and parses the LAST line.
    # Keep the LAST line compact enough to always fit that window.
    if len(full_line) > 1500:
        compact = dict(full)
        compact["queries_file"] = out_name
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
        compact["queries"] = dict(slowest)
        print(json.dumps(compact))
    sys.stdout.flush()


def _signal_emit(signum, frame):  # pragma: no cover - exercised by kill
    _STATE["truncated"] = True
    _emit(truncated=True)
    os._exit(0)


def main() -> None:
    signal.signal(signal.SIGTERM, _signal_emit)
    signal.signal(signal.SIGALRM, _signal_emit)
    # Hard backstop just under the external kill: if the budget logic
    # ever misjudges, the alarm emits the record before the driver's
    # SIGKILL can zero it.
    signal.alarm(int(max(BUDGET_SEC * 1.15, BUDGET_SEC + 120)))

    _load_all()

    if os.environ.get("SPARK_GRAFT_NO_SPLIT", "0") != "1":
        from event_streaming_service_spark.sources.fixtures import (
            prepare_splittable)
        t0 = time.perf_counter()
        bench_dir = prepare_splittable(
            SF_DIR, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".bench_cache"))
        _STATE["prep_sec"] = round(time.perf_counter() - t0, 3)
    else:
        bench_dir = SF_DIR

    # cache-heavy queries share each session; on the default 8g heap
    # late queries time GC pressure, not their plans (observed 3-5x
    # per-query noise). The host has 128 GiB — use a real slice of it.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    # three time-separated sessions (VERDICT r4 item #6): the 2-session
    # minimum still let host-load spikes through; a third session makes
    # the recorded minimum robust to a spike landing inside one session.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    sessions = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3")))
    _STATE["runs"] = runs
    deadline = _START + BUDGET_SEC

    timings = _STATE["timings"]
    session_cost = 0.0
    for session_i in range(sessions):
        remaining = deadline - time.monotonic()
        if session_i > 0 and session_cost * 1.1 > remaining:
            # Degrade sample quality, never the record: first try a
            # cheaper best-of-(runs-1) pass, else stop with the minima
            # measured so far.
            if session_cost * (runs / (runs + 1.0)) * 1.1 <= remaining and runs > 1:
                runs -= 1
                # keep the emitted runs_per_query honest: it reports
                # the SMALLEST best-of-N any timed session actually
                # ran, not the configured N (ADVICE r11)
                _STATE["runs"] = runs
            else:
                break
        t_session = time.monotonic()
        spark = get_spark("bench", cpus=CPUS,
                          shuffle_partitions=max(CPUS, 32))
        for name in BENCH_QUERIES:
            if time.monotonic() > deadline:
                _STATE["truncated"] = True
                break
            # untimed warmup: JIT/codegen, Arrow workers, shuffle dirs
            REGISTRY[name].builder(spark, bench_dir) \
                .write.format("noop").mode("overwrite").save()
            best = timings.get(name, float("inf"))
            for _ in range(runs):
                # builder INSIDE the timer — iterative operators do
                # eager work (checkpoint rounds, bounded collects) at
                # build time; excluding it under-reported those rows
                t0 = time.perf_counter()
                df = REGISTRY[name].builder(spark, bench_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = best
            # previous queries' cached frames (tf-idf term cache etc.)
            # are dead weight for the next query — drop them so late-
            # session numbers don't absorb GC pressure from earlier ones
            spark.catalog.clearCache()
        spark.stop()
        session_cost = time.monotonic() - t_session
        _STATE["sessions_completed"] = session_i + 1
        if _STATE["truncated"]:
            break

    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()
