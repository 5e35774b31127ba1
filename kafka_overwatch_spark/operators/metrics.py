"""Prometheus-style metrics surface (K4).

The reference registers gauges/summaries in `monitoring/prometheus.py:7-75`
and sets them per scan (`processing/clusters.py:93-99,110`,
`overwatch_resources/topics.py:97-99`):

- ``kafka_topics_total{cluster}``        — topic count
- ``kafka_partitions_total{cluster}``    — partition sum
- ``kafka_consumer_groups_total{cluster}`` — group count
- ``kafka_consumer_group_lag{cluster,group,topic}`` — per-(group, topic)
  lag total

Here the metric families are one long-format DataFrame (metric, cluster,
group_id, topic, value) — a pushgateway/foreachBatch sink consumes rows
directly. Long format keeps the query UNION-free at the storage layer and
lets the sink batch by metric name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lag import lag_per_topic
from .usage import FINAL_SCAN


def metrics_snapshot(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """All gauge values for the current scan as (metric, cluster,
    group_id, topic, value) rows."""
    po_final = snaps["partition_offsets"].filter(F.col("scan_id") == FINAL_SCAN)
    topic_counts = po_final.groupBy("cluster").agg(
        F.count_distinct("topic").alias("topics"),
        F.count("*").alias("partitions"),
    )
    # one agg → stack unpivot: both per-cluster gauges come out of a
    # single pass over the final-scan offsets (no duplicated aggregate
    # under the union)
    scalars = topic_counts.select(
        "cluster",
        F.expr(
            "stack(2, 'kafka_topics_total', topics, "
            "'kafka_partitions_total', partitions) AS (metric, value)"
        ),
    ).select(
        "metric",
        "cluster",
        F.lit(None).cast("string").alias("group_id"),
        F.lit(None).cast("string").alias("topic"),
        F.col("value").cast("long").alias("value"),
    ).unionByName(
        snaps["consumer_groups"]
        .groupBy("cluster")
        .agg(F.count("*").alias("groups"))
        .select(
            F.lit("kafka_consumer_groups_total").alias("metric"),
            "cluster",
            F.lit(None).cast("string").alias("group_id"),
            F.lit(None).cast("string").alias("topic"),
            F.col("groups").cast("long").alias("value"),
        )
    )
    # per-(cluster, group, topic) lag gauge — the cluster label comes from
    # the lag rows themselves (a multi-cluster snapshot emits one gauge
    # row per cluster, like the reference's per-cluster label set)
    lag = lag_per_topic(snaps, lag_rows=lag_rows).select(
        F.lit("kafka_consumer_group_lag").alias("metric"),
        F.col("cluster"),
        F.col("group_id"),
        F.col("topic"),
        F.col("total_lag").cast("long").alias("value"),
    )
    return scalars.unionByName(lag)
