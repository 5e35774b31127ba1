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
