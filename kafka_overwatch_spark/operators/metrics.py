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
    group_id, topic, value) rows.

    Physical shape (r5 fusion): the three per-cluster scalar gauges
    (topics, partitions, groups) come out of ONE aggregation — the two
    dim frames are tagged and unioned BEFORE the groupBy, so a single
    cluster-keyed exchange feeds a conditional agg + ``stack`` unpivot
    (the waste_summary trick). The previous shape aggregated each dim
    separately and unioned three branches, tripling the fixed per-branch
    stage cost that dominates dim-grain queries. A fused gauge value of
    0 means the source dim had no rows for that cluster — exactly the
    rows the branch-per-source UNION never emitted — so they are
    filtered (every genuine gauge here counts ≥ 1 source row).
    """
    po_final = snaps["partition_offsets"].filter(F.col("scan_id") == FINAL_SCAN)
    tagged = po_final.select(
        "cluster",
        F.col("topic"),
        F.lit(None).cast("string").alias("group_id"),
    ).unionByName(
        snaps["consumer_groups"].select(
            "cluster",
            F.lit(None).cast("string").alias("topic"),
            F.col("group_id"),
        )
    )
    wide = tagged.groupBy("cluster").agg(
        F.count_distinct("topic").alias("topics"),
        F.sum(F.col("topic").isNotNull().cast("long")).alias("partitions"),
        F.sum(F.col("group_id").isNotNull().cast("long")).alias("groups"),
    )
    scalars = (
        wide.select(
            "cluster",
            F.expr(
                "stack(3, 'kafka_topics_total', topics, "
                "'kafka_partitions_total', partitions, "
                "'kafka_consumer_groups_total', groups) AS (metric, value)"
            ),
        )
        .filter(F.col("value") > 0)
        .select(
            "metric",
            "cluster",
            F.lit(None).cast("string").alias("group_id"),
            F.lit(None).cast("string").alias("topic"),
            F.col("value").cast("long").alias("value"),
        )
    )
    # per-(cluster, group, topic) lag gauge — the cluster label comes from
    # the lag rows themselves (a multi-cluster snapshot emits one gauge
    # row per cluster, like the reference's per-cluster label set). This
    # branch stays a union: it is a different grain over a different
    # (cached) fact frame.
    lag = lag_per_topic(snaps, lag_rows=lag_rows).select(
        F.lit("kafka_consumer_group_lag").alias("metric"),
        F.col("cluster"),
        F.col("group_id"),
        F.col("topic"),
        F.col("total_lag").cast("long").alias("value"),
    )
    return scalars.unionByName(lag)
