"""Time-series / window operators over the offset-sample fact table
(SURVEY §2.6 W1/W2/W3).

Reference semantics:

- W1 — per-(topic, partition) delta vs the *previous* scan: the
  ``end_offset`` setter observes ``new_end - previous_end``
  (`overwatch_resources/topics.py:93-100`).
- W2 — delta vs the *baseline* (service start): "new messages" is always
  measured against the scan-0 end offset (`topics.py:108-115`), not the
  previous interval.
- W3 — first-offset evolution: the broker low watermark advances under
  retention (`topics.py:77-87`, update at `kafka_resources/topics.py:207-208`).

Scale: all three are ``WINDOW PARTITION BY (topic, partition_id) ORDER BY
scan_id`` — a single hash exchange on the natural key of the fact table.
With the physical table bucketed/sorted by (topic, partition_id, scan_id)
the sort inside each window is a no-op and the exchange disappears. The
window never spans more than the scan-range read, so memory per partition
is bounded by scans-per-partition, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _w():
    # built lazily — Window construction needs an active SparkContext
    return Window.partitionBy("topic", "partition_id").orderBy("scan_id")


def offset_delta_per_scan(snaps: dict[str, DataFrame]) -> DataFrame:
    """W1: per-interval new messages; scan 0 delta is 0 (no prior sample)."""
    po = snaps["partition_offsets"]
    return po.select(
        "topic",
        "partition_id",
        "scan_id",
        (
            F.col("end_offset")
            - F.coalesce(F.lag("end_offset").over(_w()), F.col("end_offset"))
        ).alias("delta_messages"),
    )


def new_messages_since_baseline(snaps: dict[str, DataFrame]) -> DataFrame:
    """W2: end_offset minus the scan-0 baseline, per scan."""
    po = snaps["partition_offsets"]
    return po.select(
        "topic",
        "partition_id",
        "scan_id",
        (
            F.col("end_offset")
            - F.first("end_offset").over(
                _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("new_messages"),
    )


def first_offset_evolution(snaps: dict[str, DataFrame]) -> DataFrame:
    """W3: partitions whose low watermark moved (retention kicked in),
    with the total drift."""
    po = snaps["partition_offsets"]
    return (
        po.groupBy("topic", "partition_id")
        .agg(
            (F.max("start_offset") - F.min("start_offset")).alias(
                "retention_drift"
            )
        )
        .filter(F.col("retention_drift") > 0)
    )


def cluster_scan_summary(snaps: dict[str, DataFrame]) -> DataFrame:
    """Cluster-grain per-scan rollup: total end offsets, delta vs the
    previous scan, live topic count — the scan-loop's own telemetry
    (what the reference prints per interval, `processing/clusters.py:
    108-109`) as a time series."""
    po = snaps["partition_offsets"]
    per_scan = po.groupBy("cluster", "scan_id").agg(
        F.sum("end_offset").alias("total_end_offsets"),
        F.count_distinct("topic").alias("topics"),
        F.count("*").alias("partitions"),
    )
    w = Window.partitionBy("cluster").orderBy("scan_id")
    return per_scan.select(
        "cluster",
        "scan_id",
        "total_end_offsets",
        "topics",
        "partitions",
        (
            F.col("total_end_offsets")
            - F.coalesce(
                F.lag("total_end_offsets").over(w), F.col("total_end_offsets")
            )
        ).alias("new_messages"),
    )


def topic_throughput_timeseries(snaps: dict[str, DataFrame]) -> DataFrame:
    """Per-topic, per-scan message rate — the W1 deltas rolled up to topic
    grain with the scan wall-clock delta (extension: the reference only
    tracks this as a Prometheus Summary, K4)."""
    po = snaps["partition_offsets"]
    deltas = po.select(
        "topic",
        "partition_id",
        "scan_id",
        "ts",
        (
            F.col("end_offset")
            - F.coalesce(F.lag("end_offset").over(_w()), F.col("end_offset"))
        ).alias("delta"),
        (
            F.unix_timestamp("ts")
            - F.coalesce(
                F.unix_timestamp(F.lag("ts").over(_w())), F.unix_timestamp("ts")
            )
        ).alias("elapsed_sec"),
    )
    return (
        deltas.groupBy("topic", "scan_id")
        .agg(
            F.sum("delta").alias("new_messages"),
            F.max("elapsed_sec").alias("elapsed_sec"),
        )
        .select(
            "topic",
            "scan_id",
            "new_messages",
            "elapsed_sec",
            F.coalesce(
                F.floor(F.try_divide(F.col("new_messages"), F.col("elapsed_sec"))),
                F.lit(0),
            ).alias("messages_per_seconds"),
        )
    )


def topic_throughput_trend(snaps: dict[str, DataFrame]) -> DataFrame:
    """Per-(cluster, topic) throughput TREND: the least-squares slope of
    total end_offset over scan wall-clock — is this topic's producer
    rate growing or shrinking across the scan series? The regression
    runs on the scan-grain rollup (one point per scan), so the linear
    fit is over a bounded, dim-sized series per topic while the fact
    scan contributes one map-side-combinable aggregation.

    Uses the NATIVE regr_slope/regr_r2 aggregates (Spark ≥3.4 and
    DuckDB both implement the standard sum-based formulas) — no UDF, no
    collect. Slopes are ROUNDED doubles; topics with a constant series
    (zero time variance is impossible here; zero offset variance gives
    slope 0.0) keep exact zeros. Extension beyond the reference, which
    only reports per-scan instantaneous rates (K4 Summary)."""
    po = snaps["partition_offsets"]
    per_scan = po.groupBy("cluster", "topic", "scan_id").agg(
        F.sum("end_offset").alias("total_end"),
        F.max(F.unix_timestamp("ts")).alias("ts_sec"),
    )
    return (
        per_scan.groupBy("cluster", "topic")
        .agg(
            F.count("*").alias("scans"),
            F.round(
                F.expr("regr_slope(CAST(total_end AS DOUBLE), CAST(ts_sec AS DOUBLE))"),
                6,
            ).alias("slope_msgs_per_sec"),
            F.round(
                F.expr("regr_r2(CAST(total_end AS DOUBLE), CAST(ts_sec AS DOUBLE))"),
                6,
            ).alias("r2"),
        )
        .filter(F.col("scans") >= 2)
    )


def partition_liveness_scd2(snaps: dict[str, DataFrame]) -> DataFrame:
    """SCD type-2 interval compression of per-partition liveness: each
    scan classifies a partition as 'advancing' (end_offset grew since
    the previous scan) or 'stalled'; consecutive scans in the same state
    collapse to ONE validity interval [valid_from_scan, valid_to_scan]
    — the warehouse dimension-history shape (gaps-and-islands), applied
    to the scan history the reference only ever inspects pairwise
    (`overwatch_resources/topics.py` keeps just prev/current snapshots).

    Plan: two passes over one (cluster, topic, partition_id)-keyed
    window (lag → change marker → cumulative island id) + one aggregate
    on the same key — a single exchange. At 100 TB this is the
    append-only fact compaction job: output size is bounded by the
    number of STATE CHANGES, not scans, which is why SCD2 is the right
    storage shape for years of scan history."""
    po = snaps["partition_offsets"]
    w = Window.partitionBy("cluster", "topic", "partition_id").orderBy(
        "scan_id"
    )
    state = po.select(
        "cluster",
        "topic",
        "partition_id",
        "scan_id",
        "end_offset",
        F.when(
            F.col("end_offset")
            > F.lag("end_offset").over(w),
            F.lit("advancing"),
        )
        .otherwise(F.lit("stalled"))
        .alias("state"),
    )
    marked = state.withColumn(
        "changed",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("changed").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy(
        "cluster", "topic", "partition_id", "state", "island"
    ).agg(
        F.min("scan_id").cast("long").alias("valid_from_scan"),
        F.max("scan_id").cast("long").alias("valid_to_scan"),
        F.count("*").alias("scans"),
        (F.max("end_offset") - F.min("end_offset"))
        .cast("long")
        .alias("offset_growth"),
    ).select(
        "cluster",
        "topic",
        "partition_id",
        "state",
        F.col("island").cast("long").alias("interval_seq"),
        "valid_from_scan",
        "valid_to_scan",
        "scans",
        "offset_growth",
    )


def scd2_point_in_time(snaps: dict[str, DataFrame]) -> DataFrame:
    """Point-in-time (temporal) join: every offset sample joined to the
    SCD2 liveness interval covering its scan — the warehouse pattern for
    "which dimension version was current when this fact happened".

    The BETWEEN join (valid_from <= scan <= valid_to) is rewritten as an
    EQUI-join by exploding each interval into its member scans — exact
    because intervals partition the scan axis, and bounded because an
    interval holds at most N_SCANS points (the same bucketize-the-range
    trick as events_preceding_window_join; a BroadcastNestedLoopJoin
    over the inequality would be the naive plan). At 100 TB the exploded
    interval table is |state changes| × |scans in interval| =
    O(total scans), the same as the fact — and both sides shuffle on
    the (topic, partition, scan) key the layout already buckets."""
    po = snaps["partition_offsets"]
    intervals = partition_liveness_scd2(snaps)
    exploded = intervals.select(
        "cluster",
        "topic",
        "partition_id",
        "state",
        "interval_seq",
        F.explode(
            F.sequence(F.col("valid_from_scan"), F.col("valid_to_scan"))
        ).alias("scan_id"),
    )
    return (
        po.select(
            "cluster", "topic", "partition_id",
            F.col("scan_id").cast("long").alias("scan_id"),
            "end_offset",
        )
        .join(exploded, ["cluster", "topic", "partition_id", "scan_id"])
        .select(
            "cluster",
            "topic",
            "partition_id",
            "scan_id",
            F.col("end_offset").cast("long").alias("end_offset"),
            "state",
            "interval_seq",
        )
    )
