"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — smoke: flagship cluster-usage query (topics_df) at
sf0.001. ``queries()``/``oracle_sql()`` — the full registered inventory;
see kafka_overwatch_spark/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_overwatch_spark import registry
from kafka_overwatch_spark.operators import usage


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the per-topic usage frame (the reference's
    ``topics_df``, clusters.py:315-329) on /root/testdata/sf0.001."""
    snaps = registry.get_snaps(spark, "/root/testdata/sf0.001")
    return usage.build_topics_df(snaps)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
