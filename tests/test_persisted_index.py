"""Persisted MinHash band index: the incremental screen against the
written-to-storage index equals the screen that derives the corpus index
in-query — closing the 'at scale the band index is a persisted table'
claim with a real write/read path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_screen_against_persisted_index_matches_inline(spark):
    from kafka_overwatch_spark.pipelines import dedup
    from kafka_overwatch_spark.sinks.layout import (
        read_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    shingled = dedup.shingle_docs(docs)
    corpus = shingled.filter(F.col("doc_id") < 250)
    new = shingled.filter(F.col("doc_id") >= 250)

    inline = sorted(
        map(tuple, dedup.screen_against_corpus(new, corpus).collect())
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_minhash_index(corpus, f"{tmp}/idx")
        bands, corpus_sh = read_minhash_index(spark, f"{tmp}/idx")
        persisted = sorted(
            map(
                tuple,
                dedup.screen_against_corpus(
                    new, corpus_sh, corpus_bands=bands
                ).collect(),
            )
        )
    assert persisted == inline
    assert len(inline) > 0  # the fixture has cross-split near-dups


def test_persisted_index_layout_prunes_by_band(spark):
    """The band index is partitioned by band_id: a single-band probe
    must show a partition filter on the scan (pruning, not row
    filtering) — the layout contract for selective index maintenance."""
    from kafka_overwatch_spark.pipelines import dedup
    from kafka_overwatch_spark.sinks.layout import write_minhash_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = dedup.shingle_docs(docs).filter(F.col("doc_id") < 250)
    with tempfile.TemporaryDirectory() as tmp:
        write_minhash_index(corpus, f"{tmp}/idx")
        one_band = spark.read.parquet(f"{tmp}/idx/bands").filter(
            F.col("band_id") == 3
        )
        plan = one_band._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "band_id" in pf, plan


def test_persisted_pq_index_serves_identical_topk(spark, snaps):
    """ann_pq_topk over a persisted (codebooks, codes) index must equal
    the inline-trained result row-for-row — the train-once/serve-forever
    contract."""
    import tempfile

    from kafka_overwatch_spark.pipelines.similarity import (
        ann_pq_topk,
        pq_encode,
        pq_train,
    )
    from kafka_overwatch_spark.sinks.layout import (
        read_pq_index,
        write_pq_index,
    )

    emb = spark.table("embeddings")
    cb = pq_train(emb)
    inline = sorted(
        tuple(r)
        for r in ann_pq_topk(emb, codebooks=cb, codes=pq_encode(emb, cb))
        .collect()
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_pq_index(emb, f"{tmp}/pq", codebooks=cb)
        cb2, codes2 = read_pq_index(spark, f"{tmp}/pq")
        assert (cb2 == cb).all()
        persisted = sorted(
            tuple(r)
            for r in ann_pq_topk(emb, codebooks=cb2, codes=codes2).collect()
        )
    assert persisted == inline


def test_persisted_centroid_model_classifies_identically(spark, tmp_path):
    """Rocchio via a persisted (label, dim, mu) model == the inline fit,
    row for row — train-once/serve-forever like the PQ index."""
    from kafka_overwatch_spark.pipelines.similarity import (
        label_centroid_classify,
    )
    from kafka_overwatch_spark.sinks.layout import (
        read_centroid_model,
        write_centroid_model,
    )

    emb = spark.table("embeddings")
    base = str(tmp_path / "rocchio")
    write_centroid_model(emb, base)
    model = read_centroid_model(spark, base)
    inline = sorted(
        tuple(r) for r in label_centroid_classify(emb).collect()
    )
    persisted = sorted(
        tuple(r)
        for r in label_centroid_classify(emb, centroids=model).collect()
    )
    assert inline == persisted
