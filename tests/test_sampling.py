"""Dataset assembly: deterministic hash splits, stratified sampling, and
token-window chunking — reproducibility and coverage invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_split_deterministic_under_repartition(spark, snaps):
    """The split must not depend on physical partitioning — the failure
    mode of seeded df.sample() that hash bucketing exists to fix."""
    from kafka_overwatch_spark.pipelines.sampling import deterministic_split

    docs = spark.table("documents")
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(7)).collect()
    }
    assert a == b and len(a) == docs.count()
    # proportions within a loose tolerance of the weights
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    assert 0.85 <= train <= 0.95
    assert set(a.values()) == {"train", "val", "test"}


def test_stratified_sample_membership_stable(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import stratified_sample

    docs = spark.table("documents")
    kept = {r["doc_id"] for r in stratified_sample(docs, 0.2).collect()}
    n = docs.count()
    assert 0.1 * n <= len(kept) <= 0.3 * n
    # growing the fraction only ADDS docs (nested samples — the property
    # that makes hash sampling usable for dataset scaling curves)
    kept_half = {r["doc_id"] for r in stratified_sample(docs, 0.5).collect()}
    assert kept <= kept_half


def test_chunks_cover_and_overlap(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        chunk_documents,
    )

    docs = spark.table("documents")
    chunks = chunk_documents(docs)
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    rows = chunks.filter(F.col("doc_id") < 50).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") < 50).collect()
    }
    assert by_doc
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        toks = texts[doc_id].strip().split()
        # chunk_ids dense from 0; every token covered exactly per window
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        rebuilt: list = []
        for r in rs:
            ct = r["chunk_text"].split(" ")
            assert r["n_tokens"] == len(ct) <= CHUNK_TOKENS
            start = r["chunk_id"] * step
            assert ct == toks[start : start + CHUNK_TOKENS]
            rebuilt = rebuilt[:start] + ct
        assert rebuilt == toks


def test_chunk_param_validation(spark, snaps):
    import pytest

    from kafka_overwatch_spark.pipelines.sampling import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(spark.table("documents"), chunk_tokens=8, overlap=8)
