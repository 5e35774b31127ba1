"""SparkSession factory with the engine's default tuning.

Defaults are chosen for correctness-at-scale first:

- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting mean the same plan works at sf0.001 and at 100 TB.
- ``spark.sql.session.timeZone=UTC``: the testdata parquet carries naive
  timestamps; pinning the session TZ makes epoch math engine-independent
  (the DuckDB oracle is TZ-naive).
- shuffle partitions default to 32 locally; on a real cluster leave it to
  AQE + ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka-overwatch-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession) -> None:
    """Spawn (and keep, via spark.python.worker.reuse) one Python worker
    per core with a trivial mapInPandas. Cold worker init measured at
    ~20-25 s/worker when 32 spawn concurrently mid-workload (pandas/numpy
    import under contention) — warming during setup moves that cost out of
    every first Arrow-UDF query."""
    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par * 2, numPartitions=par)
        .mapInPandas(lambda it: it, "id long")
        .count()
    )
