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

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lag import lag_per_topic
from .usage import FINAL_SCAN

SUMMARY_SCHEMA = (
    "metric string, cluster string, count long, sum_seconds double"
)


@dataclass
class ScanLatencySummaries:
    """The reference's self-instrumentation Summaries
    (`monitoring/prometheus.py:17-28`: ``topics_describe_latency`` /
    ``groups_describe_latency`` per cluster) — driver-side timers over
    the collector's control-plane sections, accumulated as
    (count, sum) exactly like a prometheus Summary without quantiles.
    ``clock`` is injectable so tests assert exact observations."""

    clock: Callable[[], float] = time.monotonic
    _acc: dict[tuple[str, str], tuple[int, float]] = field(
        default_factory=dict
    )

    def observe(self, metric: str, cluster: str, seconds: float) -> None:
        n, s = self._acc.get((metric, cluster), (0, 0.0))
        self._acc[(metric, cluster)] = (n + 1, s + float(seconds))

    @contextmanager
    def time(self, metric: str, cluster: str):
        t0 = self.clock()
        try:
            yield
        finally:
            self.observe(metric, cluster, self.clock() - t0)

    def rows(self) -> list[tuple[str, str, int, float]]:
        return sorted(
            (m, c, n, s) for (m, c), (n, s) in self._acc.items()
        )

    def frame(self, spark: SparkSession) -> DataFrame:
        """(metric, cluster, count, sum_seconds) — the long-format twin
        of metrics_snapshot's gauge frame, for the same sinks."""
        return spark.createDataFrame(self.rows(), SUMMARY_SCHEMA)


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
