"""Text-encoder seam: deterministic fake embeddings with real Arrow
plumbing — partition-invariant, unit-norm, duplicate-text-collapsing —
and the end-to-end wire into the embedding near-dup operator."""

from __future__ import annotations

import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t) if t else 0) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_encode_deterministic_and_unit_norm(spark):
    import math

    from kafka_overwatch_spark.pipelines.encode import encode_documents

    texts = ["alpha beta", "  ALPHA   beta ", "gamma delta", None]
    df = _docs(spark, texts)
    rows = {r["doc_id"]: r for r in encode_documents(df).collect()}
    assert set(rows) == {0, 1, 2}  # NULL text dropped
    # whitespace/case variants normalize to the SAME vector
    assert rows[0]["embedding"] == rows[1]["embedding"]
    assert rows[0]["embedding"] != rows[2]["embedding"]
    for r in rows.values():
        assert len(r["embedding"]) == 64
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(n - 1.0) < 1e-3  # float32 unit norm
    # partition-invariant: 7-way repartition produces identical vectors
    again = {
        r["doc_id"]: r["embedding"]
        for r in encode_documents(df.repartition(7)).collect()
    }
    assert again == {i: rows[i]["embedding"] for i in rows}


def test_encode_feeds_neardup_end_to_end(spark):
    """encode → embedding_neardup_pairs finds exactly the exact-dup
    pairs (fake vectors are uncorrelated otherwise: 64-dim random
    cosines sit far below the 0.9 threshold)."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import embedding_neardup_pairs
    from kafka_overwatch_spark.pipelines.encode import encode_documents

    texts = ["same doc text", "Same  DOC text", "other thing", "third thing"]
    emb = encode_documents(_docs(spark, texts)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    pairs = embedding_neardup_pairs(emb, threshold=0.9).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in pairs] == [(0, 1)]


def test_real_model_seam_raises_without_runtime(spark):
    from kafka_overwatch_spark.pipelines.encode import encode_documents

    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("model runtime present; seam is live")
    except ImportError:
        pass
    df = _docs(spark, ["abc"])
    with pytest.raises(Exception) as ei:
        encode_documents(df, use_real_model=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
