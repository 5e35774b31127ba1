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
    # estimate input parallelism WITHOUT df.rdd (which converts the whole
    # plan to an RDD per call): leaf file count is a lower bound on scan
    # splits — many files means the scan is already parallel and the
    # rebalance would only add an exchange. Single/few files (the test
    # fixtures) or non-file sources fall through to the repartition.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
