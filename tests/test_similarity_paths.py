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


def test_lsh_neardup_subset_of_bruteforce(spark, snaps):
    """The registered LSH near-dup surface has perfect precision (every
    pair it emits is a true ≥-threshold pair) and bounded recall loss at
    the threshold boundary — measured, not assumed."""
    from kafka_overwatch_spark.pipelines.dedup import (
        COSINE_THRESHOLD,
        embedding_neardup_pairs,
    )
    from kafka_overwatch_spark.pipelines.similarity import (
        embedding_neardup_pairs_lsh,
    )

    emb = spark.table("embeddings")
    truth = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs(emb).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs_lsh(emb, COSINE_THRESHOLD).collect()
    }
    # precision 1.0: LSH ⊆ brute force, identical cosines
    for pair, cos in lsh.items():
        assert pair in truth and truth[pair] == cos
    # recall floor at the s-curve boundary (all fixture pairs sit in
    # [0.4, 0.5) — theory gives ~18-25% for 8 tables × 8 bits there;
    # high-cosine true dups would be found with ≥98% probability)
    assert len(lsh) / len(truth) > 0.10


def test_quadratic_guard_raises(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import (
        embedding_neardup_pairs,
        ngram_jaccard_pairs,
    )
    import pytest

    emb = spark.table("embeddings")
    docs = spark.table("documents")
    with pytest.raises(ValueError, match="quadratic"):
        embedding_neardup_pairs(emb, max_rows=10)
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(docs, max_rows=10)


def test_fold_and_gemm_topk_agree(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    emb = spark.table("embeddings")
    fold = sorted(tuple(r) for r in brute_force_topk(emb).collect())
    gemm = sorted(tuple(r) for r in brute_force_topk_vectorized(emb).collect())
    assert fold == gemm
