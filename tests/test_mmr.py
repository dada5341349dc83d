"""MMR greedy rerank: diversity property and exact determinism."""

from __future__ import annotations

from event_streaming_service_spark.operators import mmr
from event_streaming_service_spark.sources import tables


def test_mmr_is_deterministic_and_diverse(spark, sf_smoke):
    emb = tables.load_table(spark, sf_smoke, "embeddings")
    out1 = mmr.mmr_select(emb, 0, 5, 20).collect()
    out2 = mmr.mmr_select(emb, 0, 5, 20).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert [r["rank"] for r in out1] == [1, 2, 3, 4, 5]
    # rank 1 is the pure-relevance argmax; scores are the scaled
    # tradeoff and must be non-increasing only for rank 1 vs others'
    # relevance-only upper bound
    top = out1[0]
    assert top["mmr_score_scaled"] == mmr.MMR_LAMBDA_NUM * top["rel_micro"]
    lam_c = mmr.MMR_LAMBDA_DEN - mmr.MMR_LAMBDA_NUM
    for r in out1[1:]:
        # score = 7*rel - 3*max_sim with max_sim a cosine in micro
        # units (can be NEGATIVE, which raises the score)
        diff = mmr.MMR_LAMBDA_NUM * r["rel_micro"] - r["mmr_score_scaled"]
        assert diff % lam_c == 0
        assert abs(diff // lam_c) <= 1_000_000
    # picked ids unique
    ids = [r["vec_id"] for r in out1]
    assert len(set(ids)) == len(ids)


def test_mmr_diverges_from_pure_relevance(spark, sf_smoke):
    """With lambda = 0.7 the MMR order must differ from the pure
    relevance order somewhere in the top-10 on a 64-dim corpus (if it
    never did, the diversity term would be dead code)."""
    emb = tables.load_table(spark, sf_smoke, "embeddings")
    out = mmr.mmr_select(emb, 0, 10, 40).collect()
    by_rel = sorted(out, key=lambda r: (-r["rel_micro"], r["vec_id"]))
    assert [r["vec_id"] for r in out] != [r["vec_id"] for r in by_rel]
