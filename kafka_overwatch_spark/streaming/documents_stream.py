"""Streaming ingest screen for the documents feed: every arriving
micro-batch of documents is checked against a STATIC benchmark-probe
shingle set (stream-static pattern) and contaminated docs are appended to
a quarantine table.

This is the production shape of decontamination: the eval-suite shingle
set is fixed and small (broadcast), documents arrive continuously, and
each document's verdict depends only on its own grams — so the screen is
stateless across batches (foreachBatch, no stream state to bound) and
every batch's plan is the same broadcast join as the batch query
(`pipelines/text.py contamination_hits`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.text import contamination_hits


def _write_idempotent(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Replay-safe foreachBatch append: results land in a batch_id=N
    partition that is dynamically OVERWRITTEN, so a batch replayed after
    a crash-between-write-and-checkpoint replaces its own rows instead
    of duplicating them."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def doc_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File stream of document rows; schema pinned from a static footer
    read (streaming sources require an explicit schema)."""
    schema = spark.read.parquet(input_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


class ContaminationScreen:
    """foreachBatch handler: per batch, compute contamination of the
    batch's documents against the fixed probe set and append verdicts to
    the quarantine parquet path. Stateless across batches by design —
    a document's verdict never depends on other batches."""

    def __init__(self, probes: DataFrame, out_dir: str) -> None:
        self.probes = probes
        self.out_dir = out_dir

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        hits = contamination_hits(batch_df, self.probes)
        _write_idempotent(hits, self.out_dir, batch_id)


class DedupScreen:
    """foreachBatch handler: per batch of arriving documents, run the
    incremental MinHash screen against the FIXED corpus (shingles +
    band index computed once up front, as a real deployment would read
    them from storage) and append near-dup verdicts to the quarantine
    path. Stateless across batches: a verdict is (new doc × corpus)
    only, so batch boundaries are invisible."""

    def __init__(self, corpus_shingles: DataFrame, out_dir: str) -> None:
        self.corpus = corpus_shingles
        self.out_dir = out_dir

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..pipelines.dedup import screen_against_corpus, shingle_docs

        hits = screen_against_corpus(shingle_docs(batch_df), self.corpus)
        _write_idempotent(hits, self.out_dir, batch_id)


def run_dedup_screen(
    spark: SparkSession,
    input_dir: str,
    corpus_shingles: DataFrame,
    out_dir: str,
    checkpoint: str,
):
    """Drain the document feed through the incremental dedup screen
    (availableNow); parquet sink + checkpoint for restart recovery."""
    q = (
        doc_stream(spark, input_dir)
        .writeStream.foreachBatch(DedupScreen(corpus_shingles, out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            "dedup screen did not drain within 300s — failing loudly"
        )
    return q


def run_contamination_screen(
    spark: SparkSession,
    input_dir: str,
    probes: DataFrame,
    out_dir: str,
    checkpoint: str,
):
    """Drain the document feed through the screen (availableNow);
    returns the finished query. Restart-safe: the parquet sink +
    checkpoint pair recovers, unlike the memory sink."""
    q = (
        doc_stream(spark, input_dir)
        .writeStream.foreachBatch(ContaminationScreen(probes, out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            "document screen did not drain within 300s — failing loudly"
        )
    return q
