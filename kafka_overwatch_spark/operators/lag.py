"""Consumer-lag pipeline and the ``groups_df`` analytic frame.

Reference semantics (SURVEY §2 J1/J2/A8/P11):

- J1 — committed offsets join topics by name, inner: offsets on unknown
  topics are dropped ("Not monitored topic",
  `kafka_resources/groups.py:185-212`).
- J2 — lag per (group, topic, partition):
  ``lag = partition.end_offset - committed_offset``
  (`overwatch_resources/groups.py:98-144`).
- P11 — two skip rules inside the reference's partition loop
  (`groups.py:111-130`):
  (a) a partition with ``total_messages == 0`` is skipped (continue);
  (b) a partition with ``committed_offset < 0`` *breaks out of the whole
  topic* — partitions after it (in partition-id order) are not measured.
  Replicated relationally: the first bad partition id per (group, topic)
  is computed with a min-agg, then partitions >= it are filtered out.
- A8 — ``overall_lag`` = Σ of per-topic totals (`groups.py:95,136-141`).

Scale notes: group_offsets × partition_offsets(final scan) is an equi-join
on (topic, partition_id). Committed-offset cardinality is
O(groups × partitions) — at 100 TB-scale metadata this is still ≤ 1e9
rows/scan; the join partitions cleanly by its key, no skew (a topic has
bounded partitions), and the "first bad partition" agg reuses the same
(group_id, topic) shuffle partitioning, so Catalyst plans a single
exchange. The dims joined afterwards are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .usage import FINAL_SCAN, is_active_group


def lag_per_partition(snaps: dict[str, DataFrame]) -> DataFrame:
    """Valid measured lag rows: cluster, group_id, topic, partition_id,
    lag. The cluster key is part of the join — group ids and topic names
    are per-cluster namespaces, so a multi-cluster snapshot must never
    match offsets across clusters."""
    po_final = (
        snaps["partition_offsets"]
        .filter(F.col("scan_id") == FINAL_SCAN)
        .select("cluster", "topic", "partition_id", "start_offset", "end_offset")
    )
    go = snaps["group_offsets"].select(
        "cluster", "group_id", "topic", "partition_id", "committed_offset"
    )
    # J1: inner; po_final is partition-count-sized per cluster (≤ ~1e6
    # rows after the scan_id prune + cluster filter) → broadcast side
    valid = go.join(
        F.broadcast(po_final), ["cluster", "topic", "partition_id"]
    )
    # P11 ordering (groups.py:111-123 vs :124-130): the zero-message
    # `continue` fires BEFORE the committed<0 `break`, so a zero-message
    # partition with offset -1 is skipped and does NOT truncate the topic.
    measured = valid.filter((F.col("end_offset") - F.col("start_offset")) > 0)
    first_bad = (
        measured.filter(F.col("committed_offset") < 0)
        .groupBy("cluster", "group_id", "topic")
        .agg(F.min("partition_id").alias("first_bad"))
    )
    return (
        measured.join(first_bad, ["cluster", "group_id", "topic"], "left")
        .filter(
            F.col("first_bad").isNull()
            | (F.col("partition_id") < F.col("first_bad"))
        )
        .select(
            "cluster",
            "group_id",
            "topic",
            "partition_id",
            (F.col("end_offset") - F.col("committed_offset")).alias("lag"),
        )
    )


def lag_per_topic(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """Per-(group, topic) lag totals — the reference's nested
    ``{topic: {total, partitions}}`` dict (`groups.py:103-141`) kept flat."""
    return (
        (lag_rows if lag_rows is not None else lag_per_partition(snaps))
        .groupBy("cluster", "group_id", "topic")
        .agg(
            F.sum("lag").alias("total_lag"),
            F.count("*").alias("partitions_measured"),
        )
        # `if total_lag and partitions_lag` (groups.py:136-141): topics
        # whose measured total is exactly 0 are omitted from the lag dict.
        .filter(F.col("total_lag") != 0)
    )


def lag_nested(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """A11: the reference's full nested lag shape —
    ``{topic: {total, partitions: [(pid, lag)]}}`` per group
    (`groups.py:103-141`) — as group_id, topic, total_lag,
    partition_lags: array<struct<partition_id, lag>> (sorted by pid).
    Registered rows-only (nested arrays aren't ANSI-SQL-hashable)."""
    return (
        (lag_rows if lag_rows is not None else lag_per_partition(snaps))
        .groupBy("cluster", "group_id", "topic")
        .agg(
            F.sum("lag").alias("total_lag"),
            F.sort_array(
                F.collect_list(F.struct("partition_id", "lag"))
            ).alias("partition_lags"),
        )
        # same `if total_lag and partitions_lag` gate as lag_per_topic
        .filter(F.col("total_lag") != 0)
    )


def lag_nested_json(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """Hash-checkable companion of ``lag_nested``: the nested
    ``partition_lags`` array serialized with ``to_json`` so the driver's
    canonicalizer (which cannot factorize array columns) gets a plain
    string column carrying the identical information."""
    return lag_nested(snaps, lag_rows).select(
        "cluster",
        "group_id",
        "topic",
        "total_lag",
        F.to_json("partition_lags").alias("partition_lags_json"),
    )


def build_groups_df(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """The per-group analytic frame (`clusters.py:332-342`,
    `groups.py:88-96`): name, members, state, eval_elapsed_time,
    overall_lag. eval_elapsed_time is the cluster-level scan window
    (final scan ts − baseline ts) — deterministic stand-in for the
    reference's utcnow()−init_ts."""
    po = snaps["partition_offsets"]
    elapsed = (
        po.groupBy("scan_id")
        .agg(F.max("ts").alias("ts"))
        .agg(
            (
                F.max(F.when(F.col("scan_id") == FINAL_SCAN, F.unix_timestamp("ts")))
                - F.max(F.when(F.col("scan_id") == 0, F.unix_timestamp("ts")))
            ).alias("eval_elapsed_time")
        )
    )
    overall = (
        (lag_rows if lag_rows is not None else lag_per_partition(snaps))
        .groupBy("group_id")
        .agg(F.sum("lag").alias("overall_lag"))
    )
    return (
        is_active_group(snaps["consumer_groups"])
        .join(F.broadcast(overall), "group_id", "left")
        .crossJoin(F.broadcast(elapsed))
        .select(
            F.col("group_id").alias("name"),
            "members",
            "state",
            "eval_elapsed_time",
            F.coalesce("overall_lag", F.lit(0)).alias("overall_lag"),
            "is_active",
        )
    )


def lag_distribution(
    snaps: dict[str, DataFrame], lag_rows: DataFrame | None = None
) -> DataFrame:
    """Per-(cluster, group) lag distribution over its partitions — the
    SLA question the reference's scalar `overall_lag` cannot answer
    (a group with total lag 1000 spread evenly is healthy; the same
    total stuck on one partition is an incident). Exact percentiles
    (dim-grain input, the full sort is trivial; at real scale the
    approx_percentile sketch swaps in — see events_value_quantiles).
    """
    rows = lag_rows if lag_rows is not None else lag_per_partition(snaps)
    return rows.groupBy("cluster", "group_id").agg(
        F.count("*").cast("long").alias("partitions_measured"),
        F.sum("lag").cast("long").alias("total_lag"),
        F.max("lag").cast("long").alias("max_partition_lag"),
        F.round(F.expr("percentile(lag, 0.5)"), 6).alias("p50_lag"),
        F.round(F.expr("percentile(lag, 0.95)"), 6).alias("p95_lag"),
        # share of the group's lag carried by its worst partition —
        # 1.0 = single-partition hotspot, 1/n = perfectly even
        F.round(
            F.max("lag").cast("double")
            / F.nullif(F.sum("lag").cast("double"), F.lit(0.0)),
            6,
        ).alias("hotspot_share"),
    )
