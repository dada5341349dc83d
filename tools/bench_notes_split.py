"""Recompute the BENCH_NOTES headline splits from a generated table.

Reads the markdown table rows (| name | spark | duckdb | ratio |) on
stdin or from a file and prints: oracle-paired total, floor split
(DuckDB <= 0.15 s), work-bound split, and the fair vs
handicapped-oracle split used by the BENCH_NOTES prose — so the prose
numbers are derived from the shipped table by one command instead of
by hand.

Handicapped-oracle rows (the oracle is structurally slower by
construction, not a throughput comparison): recursive-CTE sequential
folds, pixel/sample-regenerating media twins, unrolled iterative
twins, and the Lloyd-chain trainers.

Usage: python tools/bench_notes_split.py [table.md]
"""

from __future__ import annotations

import re
import sys

# Oracle-handicapped rows: the r11 prose list + the r12 additions
# (semdedup_survivors: recursive transitive-closure CTE;
# embedding_split_contamination: unrolled Lloyd chain;
# image_text_dup_pairs: pixel-regenerating dHash twin).
HANDICAPPED = {
    # recursive-CTE sequential folds
    "ewma_value_per_user", "ewma_segmented_per_user",
    "cusum_value_alerts", "holt_trend_per_user", "seq_packing",
    "bpe_learned_merges", "bpe_encoded_doc_stats", "bpe_merge_pairs",
    "part_hierarchy_paths", "theil_sen_value_trend",
    "activity_streaks_per_user", "gapfill_hourly_locf",
    # pixel/sample-regenerating media twins
    "multimodal_features_png", "multimodal_resize_png",
    "multimodal_features_jpeg", "multimodal_resize_jpeg",
    "multimodal_features_jpeg_color",
    "multimodal_features_jpeg_progressive",
    "multimodal_features_jpeg_progressive_color",
    "video_frames_apng", "video_frames_gif", "video_frames_mjpeg",
    "multimodal_resize_gif", "audio_features_wav",
    "audio_resample_wav", "audio_fingerprint_dupes",
    "image_dhash_groups", "image_text_dup_pairs",
    # unrolled iterative twins
    "pagerank_copurchase", "ppr_trade_neighborhood",
    "kcore_copurchase", "markov_stationary_types",
    "hits_trade_hubs", "lpa_communities_copurchase",
    "adamic_adar_capped", "bootstrap_mean_ci_by_type",
    "beam_search_topk", "logreg2_purchase_model",
    "logreg2_cell_scores", "pca_pc1_scores", "ivf_recall_report",
    "near_dup_clusters", "near_dup_survivors_by_quality",
    "semdedup_survivors",
    # Lloyd-chain trainers (oracle unrolls the training rounds)
    "kmeans_embedding_clusters", "semdedup_pairs",
    "ivf_trained_topk", "pq_trained_topk",
    "embedding_split_contamination", "ols2_kfold_cv",
}


def main() -> None:
    src = (open(sys.argv[1]).read() if len(sys.argv) > 1
           else sys.stdin.read())
    rows = []
    for line in src.splitlines():
        m = re.match(
            r"\|\s*(\w+)\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|", line)
        if m and not line.startswith("| *"):
            rows.append((m.group(1), float(m.group(2)),
                         float(m.group(3))))
    tot_s = sum(s for _, s, _ in rows)
    tot_d = sum(d for _, _, d in rows)
    print(f"oracle-paired rows: {len(rows)}  "
          f"spark {tot_s:.1f}  duckdb {tot_d:.1f}  "
          f"ratio {tot_s / tot_d:.2f}x")
    floor = [(n, s, d) for n, s, d in rows if d <= 0.15]
    work = [(n, s, d) for n, s, d in rows if d > 0.15]
    for label, grp in (("floor", floor), ("work-bound", work)):
        gs = sum(s for _, s, _ in grp)
        gd = sum(d for _, _, d in grp)
        print(f"{label}: {len(grp)} rows  spark {gs:.1f}  "
              f"duckdb {gd:.1f}  ratio {gs / max(gd, 1e-9):.2f}x")
    hand = [(n, s, d) for n, s, d in work if n in HANDICAPPED]
    fair = [(n, s, d) for n, s, d in work if n not in HANDICAPPED]
    for label, grp in (("handicapped-oracle", hand), ("fair", fair)):
        gs = sum(s for _, s, _ in grp)
        gd = sum(d for _, _, d in grp)
        print(f"{label}: {len(grp)} rows  spark {gs:.1f}  "
              f"duckdb {gd:.1f}  ratio {gs / max(gd, 1e-9):.2f}x")
    worst = sorted(fair, key=lambda r: -(r[1] / r[2]))[:8]
    print("worst fair rows:")
    for n, s, d in worst:
        print(f"  {n}: {s:.2f}/{d:.2f} = {s / d:.1f}x")


if __name__ == "__main__":
    main()
