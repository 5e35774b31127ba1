"""The two physical implementations of embedding similarity — the
deterministic DataFrame fold and the Arrow GEMM — must produce identical
results (they share one oracle)."""

from __future__ import annotations


def test_fold_and_gemm_neardup_agree(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import (
        COSINE_THRESHOLD,
        embedding_neardup_pairs,
    )
    from kafka_overwatch_spark.pipelines.similarity import (
        embedding_neardup_pairs_vectorized,
    )

    emb = spark.table("embeddings")
    fold = sorted(tuple(r) for r in embedding_neardup_pairs(emb).collect())
    gemm = sorted(
        tuple(r)
        for r in embedding_neardup_pairs_vectorized(
            emb, COSINE_THRESHOLD
        ).collect()
    )
    assert fold == gemm


def test_fold_and_gemm_topk_agree(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    emb = spark.table("embeddings")
    fold = sorted(tuple(r) for r in brute_force_topk(emb).collect())
    gemm = sorted(tuple(r) for r in brute_force_topk_vectorized(emb).collect())
    assert fold == gemm
