"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a (possibly single-file) input so per-row-heavy
    operators use the whole cluster. Small testdata arrives as one parquet
    file = one partition = one task; at real scale the scan already has
    many splits, and this becomes a cheap no-op-ish rebalance."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism * factor, 2)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
