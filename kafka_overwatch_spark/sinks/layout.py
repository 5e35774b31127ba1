"""Physical storage layout for the 100 TB deployment (SCALE.md):

- `partition_offsets` is append-only and every report query prunes to one
  cluster and a bounded scan range → write it **partitioned by
  (cluster, scan_id)** so those predicates become partition pruning
  (zero data read outside the slice), not row filters.
- The lag join shuffles `group_offsets ⋈ partition_offsets` on
  (topic, partition_id) every scan → persist both **bucketed by
  (topic, partition_id)** so the join is co-located and plans with NO
  exchange on either side.

Both claims are plan-asserted in tests/test_layout.py against real
writes; the utilities below are the write path a deployment would run
per scan batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LAG_JOIN_KEYS = ("topic", "partition_id")


def write_offsets_partitioned(df: DataFrame, path: str) -> None:
    """partition_offsets → parquet partitioned by (cluster, scan_id).
    Partition columns are low-cardinality by construction (clusters ×
    scans), so file counts stay sane; within a partition the data is
    whatever the scan produced (append-only)."""
    (
        df.write.mode("overwrite")
        .partitionBy("cluster", "scan_id")
        .parquet(path)
    )


def write_bucketed_for_lag_join(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    n_buckets: int = 8,
) -> None:
    """Persist a fact table bucketed + sorted by the lag-join key so the
    per-scan join runs with no exchange. Bucketed tables require the
    catalog (`saveAsTable`); `spark.sql.sources.bucketing.enabled` is on
    by default."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *LAG_JOIN_KEYS)
        .sortBy(*LAG_JOIN_KEYS)
        .format("parquet")
        .saveAsTable(table)
    )


def write_minhash_index(corpus_shingles: DataFrame, base_path: str) -> None:
    """Persist the LSH corpus index the incremental dedup screen reads:
    the band table partitioned by band_id (NUM_BANDS directories —
    selective per-band maintenance and pruning) plus the shingle frame
    (the verify-join side). At 100 TB this is THE dedup index layout:
    ingestion batches probe the band table (bounded-key join) and verify
    against only candidate shingle rows — the corpus text is never
    rescanned."""
    from ..pipelines.dedup import minhash_bands

    (
        minhash_bands(corpus_shingles)
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(f"{base_path}/bands")
    )
    corpus_shingles.write.mode("overwrite").parquet(f"{base_path}/shingles")


def read_minhash_index(spark: SparkSession, base_path: str):
    """(bands, shingles) back from storage. band_id returns as a
    partition-directory column (int-inferred) — cast back to long so
    joins against freshly-derived band frames stay type-identical."""
    from pyspark.sql import functions as F

    bands = (
        spark.read.parquet(f"{base_path}/bands")
        .withColumn("band_id", F.col("band_id").cast("long"))
        .select("doc_id", "band_id", "band_key")
    )
    return bands, spark.read.parquet(f"{base_path}/shingles")
