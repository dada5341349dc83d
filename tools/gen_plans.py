"""Generate PLANS.md: annotated physical plans for the headline query
shapes. Run from the repo root:  python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark

SF = "/root/testdata/sf0.01"

SHOWCASE = {
    "tpch_q1_pricing_summary": (
        "Scan-heavy aggregation: pushed shipdate filter + 7-column "
        "pruned read; partial hash aggregate BEFORE the exchange so the "
        "shuffle carries 6 per-group partial states, not 60k rows."),
    "tpch_q5_local_supplier_volume": (
        "6-way join: the lineitem-orders fact join shuffles once; every "
        "dimension (customer, supplier, nation, region) broadcasts — "
        "zero dimension-side shuffles at any corpus size."),
    "asof_last_order_before_event": (
        "As-of join via union + window carry-forward: ONE exchange on "
        "the join key feeds the ordered window (plus the inherent "
        "right-side unique-per-(key,time) pre-aggregation). No range "
        "cross product at any scale."),
    "minhash_lsh_pairs": (
        "Sub-quadratic near-dup: constant-size signatures per doc "
        "(single explode + 16-min hash aggregate), banding as one "
        "struct-array explode, candidate equi-join on band_key, exact "
        "Jaccard only on the semi-joined candidate docs."),
    "replay_time_range": (
        "Derived-coordinate replay: the range predicate sits above the "
        "offset window (offsets are a window over the whole log, so no "
        "pruning is possible BY CONSTRUCTION here); against the "
        "materialized topic layout with stored offsets the same "
        "operator's predicate pushes down to row-group stats — see "
        "tests/test_plans.py::test_materialized_topic_replay_prunes."),
    "lag_surface": (
        "Every lag grain from ONE pass: committed offsets come from a "
        "single conditional aggregation (count-below-cutoff IS the "
        "offset on a dense log — the row_number window is pruned away "
        "entirely), end offsets from count(*), then ROLLUP emits "
        "partition/topic/group/grand-total rows from one partial-"
        "aggregatable shuffle."),
    "topic_dashboard": (
        "Stats record + exact percentiles in one hash aggregate; the "
        "distinct-event counter runs as a separate two-level aggregate "
        "joined broadcast — fusing it would Expand every row through "
        "the percentile sort buffer."),
    "envelope_projection": (
        "Nested envelope build + read-back: struct/map construction and "
        "metadata.* access are one codegen'd projection, no shuffle; "
        "with the envelope materialized, nested-schema pruning reads "
        "only the touched leaves."),
    "tpch_q21_waiting_supplier": (
        "EXISTS + NOT EXISTS decorrelated: ONE per-order profile "
        "aggregate (countDistinct supplier / late supplier) replaces "
        "both correlated self-joins; the profile agg and the join back "
        "hash on the same l_orderkey, so the big table pays two "
        "exchanges total and no per-row probe."),
    "heavy_hitter_tokens": (
        "Sketch-then-verify: per-partition Misra-Gries summaries (<= 2k "
        "rows each) collect into a broadcast; the exact recount "
        "semi-joins against it map-side, so only candidate keys ever "
        "shuffle — the full token domain never does."),
    "zorder_layout_stats": (
        "Morton interleave as a pure codegen'd shift/mask expression "
        "tree — 16 bits of two dimensions fused into the projection, "
        "no UDF, then one hash aggregate on the 64-bucket key."),
    "twa_value_per_user": (
        "Interval-weighted mean: the lead() window and the final "
        "aggregate share ONE exchange on the user key; the weighted "
        "sum folds exact micro-unit x duration integers in a "
        "decimal(38,0), so the single final division is the only "
        "float op."),
    "table_profile_surface": (
        "11-column profile in one pass per table: explode to "
        "(column, value) grain, pre-aggregate there (no Expand, no "
        "per-column count(distinct) hot reducer), then reduce the "
        "distinct-value frame — every metric an associative fold."),
    "pareto_frontier_parts": (
        "Grouped skyline: distinct-point aggregate then two dominance "
        "windows partitioned by brand — no join, no quadratic pass; "
        "the oracle is the quadratic NOT EXISTS definition."),
    "purchase_attribution_last_touch": (
        "Last-touch attribution after the round-5 hot-key fix: ONE "
        "shuffle on the key and a range(UNBOUNDED PRECEDING, -1) frame "
        "Spark maintains incrementally — O(n) per key where the "
        "bounded-start frame re-scanned its buffer per row; the "
        "lookback bound is a post-filter on the winning touch."),
    "part_hierarchy_rollup": (
        "Recursive hierarchy rollup as ONE lazy plan: 8 chained "
        "equi-joins build the fixed-depth ancestor closure (no "
        "checkpoints, no build-time actions), then a single hash "
        "aggregate on the ancestor key."),
    "pq_cosine_topk": (
        "Product quantization: code assignment is a literal-codebook "
        "projection (no join, no shuffle over the corpus); the ADC "
        "scan broadcasts the query set; the only exchange feeds the "
        "per-query top-k window."),
    "ivfpq_cosine_topk": (
        "IVF+PQ composition: broadcast 16-cell centroids assign "
        "corpus and query cells; candidates ride an equi-join on the "
        "cell id (n_probe/n_cells of the corpus, never a cross "
        "product); integer PQ-ADC reranks only candidates."),
    "vocab_coverage": (
        "Vocabulary coverage: one cached (doc, token, count) grain "
        "feeds both the TakeOrdered top-V vocabulary and the per-doc "
        "aggregate; the vocab joins back as a broadcast."),
    "set_similarity_pairs": (
        "Prefix-filtered set-similarity join: candidates come only "
        "from each document's rarest-first shingle prefix (exactness "
        "by the AllPairs theorem), verified with an exact integer "
        "cross-multiplication; the verify-side sets reuse the window "
        "pass's doc partitioning."),
    "adamic_adar_copurchase": (
        "Wedge link prediction: the sum-deg^2 wedge stream (148M rows "
        "at sf0.1) keys its hash aggregate on ONE packed bigint "
        "(u*2^32+v, 1.6x over two-column keys) and probes the "
        "node-count-sized term table as an AQE broadcast; the "
        "anti-join stays on unpacked columns — a packed broadcast key "
        "would route through LongHashedRelation, which degrades "
        "pathologically on sparse packed keys."),
    "cdc_merge_upsert": (
        "MERGE INTO apply: the changelog reduces to latest-op-per-key "
        "with one window, then ONE full-outer sort-merge join at key "
        "grain classifies every row — both join inputs arrive already "
        "key-grain, so the shuffle is the minimum any CDC compaction "
        "must pay."),
    "data_quality_report": (
        "Declarative rule engine: every rule over a table is one "
        "conditional sum inside the SAME scan + hash aggregate "
        "(adding a rule adds a column, not a pass); the 1-row wide "
        "aggregate unpivots with stack(), and the FK leg is a "
        "distinct-key broadcast anti-join."),
    "bootstrap_mean_ci_by_type": (
        "One-pass Poisson bootstrap: all 32 resamples are 64 "
        "conditional sums inside ONE scan + hash aggregate (the "
        "multiplicities derive from content hashes, so no resample "
        "ever materializes and the shuffle carries groups x 66 "
        "partial states); the replicate means unpivot with stack() "
        "and the order-statistic interval is a window over 32 rows "
        "per group."),
    "containment_doc_pairs": (
        "Asymmetric doc-in-doc join: only the CONTAINED side explodes "
        "its rarest-first prefix (the one-sided pigeonhole bound); "
        "since round 11 the container-side inverted index ALSO "
        "explodes from the one persisted doc-array grain (no second "
        "tokenize/df-join scan), and the verify is one "
        "array_intersect over the same pin — candidate fan-out is "
        "bounded by prefix x posting lists, never all pairs."),
    "ann_beam_graph_topk": (
        "Graph-navigable ANN: the offline index (exact top-m "
        "proximity graph) comes from the broadcast/tiled BLAS top-k "
        "kernel and persists; each of the 3 beam hops is a "
        "frontier-sized equi-join against the m-regular graph plus "
        "one row_number window per query — query cost scales with "
        "hops x beam x degree, not corpus size."),
    "theil_sen_value_trend": (
        "Median-of-slopes robust trend: the per-key cap (row_number "
        "on the SAME key partitioning the pair self-join shuffles on) "
        "bounds the O(n^2) pairwise fan-out at C(128,2) per key "
        "before any pair materializes; slopes pin to integers in the "
        "join projection and the median is one hash aggregate."),
    "ks_value_drift": (
        "Two-sample KS: the cumulative ECDF window runs on the "
        "(group, distinct value) grain a hash aggregate produces "
        "first — never on raw rows — and the scaled gap "
        "|cum_a*n_b - cum_b*n_a| stays in decimal(38,0) so 10M-row "
        "sides cannot overflow; one window sort per group bounded by "
        "distinct values, then a two-level argmax."),
    "hits_trade_hubs": (
        "Iterative HITS: the edge list is cached once with both join "
        "keys; each round is one equi-join + hash agg per side, a "
        "1-row total broadcast-cross-joined back (no global window), "
        "and ONE eager pin per round so the iterated lineage stays "
        "flat while intermediate raw frames are lazy persists."),
    "lpa_communities_copurchase": (
        "Synchronous LPA: the undirected edge list caches once; per "
        "round one join against the node-grain label frame, a hash "
        "agg to (node, label), and a per-node argmax window bounded "
        "by degree. Deterministic (count desc, label asc) ranking "
        "replaces the classic random tie-flip, which is what makes "
        "the unrolled SQL twin possible."),
    "spearman_price_quantity": (
        "Rank statistic in ONE exchange (round 10): the tie counts "
        "ride the rank window's partitioning AND sort via RANGE "
        "BETWEEN CURRENT ROW AND CURRENT ROW peer frames, so the "
        "plan is one hash exchange + two in-partition sorts (was 4 "
        "exchanges), then the exact-moment Pearson device — one hash "
        "aggregate, one pinned sqrt."),
    "pq_cosine_topk": (
        "PQ-ADC on the Arrow path (round 10): tensor code assignment "
        "and LUT-gather scoring run as mapInPandas kernels (bit-"
        "parity with the JVM expression twin asserted by the scale "
        "probe); the only shuffle is the per-query top-k window. The "
        "codebook is a bounded collect; queries broadcast."),
    "logreg2_purchase_model": (
        "3-round Newton logistic with ZERO exchanges: each round is "
        "one map-side-combined moment aggregate over the persisted "
        "feature frame crossed with a 1-row broadcast coefficient "
        "frame; the 3x3 Cramer solve is a scalar projection. Nothing "
        "row-grain ever shuffles."),
    "changepoint_value_trend": (
        "Grid-search segmented regression as ONE aggregate: the row "
        "x 5-candidate cross join (broadcast literal grid) feeds 60 "
        "conditional decimal sums with partial combine; SSE and "
        "slopes are scalar projections over the 5-row result."),
    "welch_ttest_value_drift": (
        "The cheapest drift test by construction: one hash aggregate "
        "computes both halves' exact moments via conditional sums; t "
        "and Welch-Satterthwaite df are scalar pinned projections."),
    "pca_pc1_scores": (
        "PCA power iteration (round 10): the corpus is touched "
        "exactly twice — the Gram tree-aggregate (per-partition BLAS "
        "fold, d*(d+1)/2 partial rows shuffle) and the final literal-"
        "eigenvector projection; the 8 fixed-point rounds run "
        "driver-side on the collected 64x64 grid."),
    "kn_bigram_lm_scores": (
        "Kneser-Ney bigram LM: one tokenize pass pinned at the "
        "(doc, w1, w2) grain feeds the corpus LM aggregate and the "
        "per-doc multiplicity aggregate; the LM is bigram-TYPE grain "
        "with history and continuation stats joined at vocabulary "
        "grain, then ONE equi-join back to the doc grain."),
    "kmeans_embedding_clusters": (
        "Full-vector integer-Lloyd k-means (round 11; report pinned "
        "round 12): training is bounded Lloyd rounds (one Arrow "
        "tensor pass + one clusters*dim-row aggregate each, over the "
        "ONCE-persisted quantized frame); the final assignment + "
        "inertia is ONE mapInPandas pass (emit_dist) against the "
        "collected centroid grid, and the 8-row report frame is "
        "eagerly localCheckpoint-pinned so its two consumers (total "
        "+ join) never re-run the corpus pass — the plan below reads "
        "the checkpointed rows, the Arrow pass already ran exactly "
        "once at build."),
    "semdedup_pairs": (
        "SemDeDup within-cluster pairs (round 11): the all-pairs "
        "cosine join shuffles ONLY on cluster_id, so the quadratic "
        "fan-out is bounded by cluster membership (n_clusters grows "
        "~sqrt(N) at corpus scale); exact BIGINT dots feed one "
        "pinned 9dp cosine spelling."),
    "ivf_trained_topk": (
        "IVF over trained cells (round 11): the coarse quantizer is "
        "a Lloyd round; assignment is the Arrow tensor kernel; the "
        "probe ranks each query against the broadcast centroid "
        "frame; candidates ride an equi-join on the cell id and "
        "rerank by exact integer dots — no float op in the plan."),
    "ols2_kfold_cv": (
        "5-fold CV via moment additivity (round 11): ONE moments "
        "aggregate at fold grain + a 1-row total; each fold's "
        "training moments are the exact complement (total - fold), "
        "so k-fold training costs one aggregate, never k scans; "
        "betas ride a 5-row broadcast into the scoring scan."),
    "paragraph_dedup_stats": (
        "Paragraph-grain exact dedup (round 11): one tokenize pass "
        "explodes to the persisted 16-token segment grain; one hash "
        "aggregate to segment frequencies, one equi-join back, one "
        "doc-grain aggregate — the CCNet pass before doc-level LSH."),
    "logreg2_cell_scores": (
        "Train->apply calibration grid (round 11): the fitted 1-row "
        "beta frame broadcasts into a pure projection over the "
        "24x7-row cell aggregate; model and observed rates are both "
        "nano-pinned integers so the delta is exact."),
    "idf_weighted_jaccard_pairs": (
        "IDF-weighted Jaccard verifier (restructured round 12): the "
        "shingle grain persists ONCE and feeds df, the weighted "
        "per-doc arrays, and the minhash signature pipeline; one "
        "hash aggregate builds each doc's (shingle, weight) struct "
        "array AND its weight total together, and pair verification "
        "is an array_intersect fold over the two persisted arrays — "
        "candidate-bounded, never a second corpus shuffle "
        "(4.97s -> 2.27s at sf0.1)."),
    "hard_negative_topk": (
        "Contrastive hard-negative mining (Arrow kernel round 12): "
        "the collected anchor matrix broadcasts; each corpus Arrow "
        "batch scores against it with ONE BLAS matmul, the "
        "different-label filter applies INSIDE the kernel before the "
        "batch-local top-k, and one window reranks the k-per-batch "
        "candidates — the corpus scans once, no crossJoin row "
        "fan-out."),
    "semdedup_survivors": (
        "SemDeDup survivorship (round 12): the verified pair list is "
        "eagerly pinned (the clustering kernel runs exactly once), "
        "components iterate over the tiny pair graph alone "
        "(localCheckpoint per round), and the corpus-sized frames "
        "see only broadcast left joins — near_dup_clusters' shape "
        "with embeddings instead of shingles."),
    "embedding_split_contamination": (
        "Embedding-split contamination audit (round 12): the "
        "quantized frame persists once and feeds train-split Lloyd "
        "training, the Arrow cell assignment, and the eval slice; "
        "eval anchors rank the broadcast trained centroids, and "
        "candidates ride the cell equi-join so each anchor scores "
        "only probed cells' members — never the full train split."),
    "image_text_dup_pairs": (
        "CLIP-style multimodal pair curation (round 12): the "
        "real-PNG-decode dHash frame (one mapInPandas pass, "
        "persisted) self-joins on the perceptual key — fan-out "
        "bounded by group size exactly as LSH buckets bound MinHash "
        "— and the text verify is an array_intersect over the "
        "persisted per-doc shingle arrays on candidate pairs only."),
}


def main() -> None:
    _load_all()
    spark = get_spark("plans", cpus=8)
    print("# PLANS — physical plans of the headline query shapes")
    print()
    print("Generated by tools/gen_plans.py (sf0.01 statistics; AQE "
          "final plans may further coalesce at runtime).")
    for name, note in SHOWCASE.items():
        df = REGISTRY[name].builder(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue().strip()
        print()
        print(f"## {name}")
        print()
        print(note)
        print()
        print("```")
        print(plan)
        print("```")


if __name__ == "__main__":
    main()
