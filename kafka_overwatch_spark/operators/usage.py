"""Topic-usage analytics — the reference's headline queries.

Re-expresses, Spark-first:

- ``topics_df`` assembly — `overwatch_resources/clusters.py:315-329` +
  `overwatch_resources/topics.py:158-172` (SURVEY §2 A6/A7/A9/A10, J3)
- waste categories — `reporting/topics.py:17-111` (P4/P5/P6 + A1/A2/A4)
- most-active topics — `reporting/__init__.py:30-52` (A3 exact percentile
  + P7; pandas ``quantile(0.75)`` == Spark ``percentile`` linear
  interpolation, NOT ``approx_percentile``)

Scale notes (100 TB / 1000 executors):

- ``partition_offsets`` is the only large input. The final/baseline scan
  join is per (topic, partition_id) — co-partitioned by construction when
  the physical table is bucketed by topic, so AQE turns it into a local
  shuffle-free join; otherwise it is one shuffle of two filtered scans,
  both pruned to exactly two scan_ids (partition pruning on the scan_id
  partition column in a real layout).
- Everything after the first groupBy("topic") is topic-cardinality
  (~1e5 rows) — broadcast territory. The group-count join is marked
  broadcast explicitly.
- The percentile threshold is a 2-value scalar — computed with one tiny
  agg and crossJoin(broadcast(...)), never a re-scan of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINAL_SCAN = 3

# Active-group predicate per `overwatch_resources/groups.py:79-85`:
# state not in (DEAD, EMPTY) and members nonempty.
INACTIVE_STATES = ("DEAD", "EMPTY")


def is_active_group(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "is_active",
        (~F.col("state").isin(*INACTIVE_STATES)) & (F.col("members") > 0),
    )


def build_topics_df(snaps: dict[str, DataFrame]) -> DataFrame:
    """The per-topic analytic frame (`clusters.py:315-329`).

    Columns: name, partitions, total_messages, new_messages,
    eval_elapsed_time, consumer_groups, active_groups,
    messages_per_seconds.

    - total_messages = Σ_partitions (end - start) at the final scan
      (`topics.py:102-106`: end_offset - first_offset)
    - new_messages   = Σ_partitions (end@final - end@scan0)
      (`topics.py:108-115`: measured against the service-start baseline)
    - eval_elapsed_time = partition 0's ts delta (`topics.py:210-212`
      uses partition 0's timestamps, not min/max — replicated)
    - messages_per_seconds = int(new/elapsed), NaN→0
      (`clusters.py:322-327`; int() truncates → floor for non-negatives)
    """
    po = snaps["partition_offsets"]
    final = po.filter(F.col("scan_id") == FINAL_SCAN)
    base = po.filter(F.col("scan_id") == 0).select(
        "topic",
        "partition_id",
        F.col("end_offset").alias("end0"),
        F.col("ts").alias("ts0"),
    )
    per_topic = (
        final.join(base, ["topic", "partition_id"])
        .groupBy("topic")
        .agg(
            F.count("*").alias("partitions"),
            F.sum(F.col("end_offset") - F.col("start_offset")).alias(
                "total_messages"
            ),
            F.sum(F.col("end_offset") - F.col("end0")).alias("new_messages"),
            F.max(
                F.when(
                    F.col("partition_id") == 0,
                    F.unix_timestamp("ts") - F.unix_timestamp("ts0"),
                )
            ).alias("eval_elapsed_time"),
        )
    )

    # J3: per-topic consumer-group counts (`kafka_resources/groups.py:209-212`,
    # consumed at `overwatch_resources/topics.py:168-171`). Inner join on
    # group_id — the dims are small → broadcast.
    cg = is_active_group(snaps["consumer_groups"]).select("group_id", "is_active")
    gcounts = (
        snaps["group_offsets"]
        .select("group_id", "topic")
        .distinct()
        .join(F.broadcast(cg), "group_id")
        .groupBy("topic")
        .agg(
            F.count("*").alias("consumer_groups"),
            F.sum(F.when(F.col("is_active"), 1).otherwise(0)).alias(
                "active_groups"
            ),
        )
    )

    return (
        per_topic.join(F.broadcast(gcounts), "topic", "left")
        .select(
            F.col("topic").alias("name"),
            "partitions",
            "total_messages",
            "new_messages",
            "eval_elapsed_time",
            F.coalesce("consumer_groups", F.lit(0)).alias("consumer_groups"),
            F.coalesce("active_groups", F.lit(0)).alias("active_groups"),
            F.coalesce(
                F.floor(
                    F.try_divide(F.col("new_messages"), F.col("eval_elapsed_time"))
                ),
                F.lit(0),
            ).alias("messages_per_seconds"),
        )
    )


# --- waste categories (`reporting/topics.py`) -------------------------------

# SQL condition strings (shared verbatim with the DuckDB oracle):
WASTE_PREDICATES = {
    # P4 `reporting/topics.py:23`
    "no_messages": "total_messages = 0",
    # P5 `reporting/topics.py:43-47`
    "no_messages_topics_with_multiple_partitions": (
        "total_messages = 0 AND partitions > 1 AND active_groups = 0"
    ),
    # P6 `reporting/topics.py:83-87`
    "no_cgs_and_no_new_messages": (
        "total_messages > 0 AND new_messages = 0 AND active_groups = 0"
    ),
}


def waste_category_topics(topics_df: DataFrame, category: str) -> DataFrame:
    """P1: the (name, partitions) projection for one waste category."""
    return topics_df.filter(WASTE_PREDICATES[category]).select("name", "partitions")


def waste_summary(topics_df: DataFrame) -> DataFrame:
    """One row per waste category: topics_count, topic_partitions_sum,
    cluster_percentage — `reporting/topics.py:30-38` etc.
    cluster_percentage = int((count/total)*100): float math then truncation,
    replicated exactly (floor of the same double expression).

    Single-pass shape: one conditional aggregation computes every
    category's count/partition-sum AND the total in the same scan (one
    job, one map-side-combined agg), then ``stack`` unpivots to the
    category-per-row output — replaces the previous 1 count action +
    3 filtered scans + unionAll."""
    aggs = [F.count("*").alias("__total")]
    for name, pred in WASTE_PREDICATES.items():
        cond = F.expr(pred)  # predicates are SQL strings shared w/ oracle
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"{name}__n"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, F.col("partitions"))), F.lit(0)
            ).alias(f"{name}__p")
        )
    wide = topics_df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', {name}__n, {name}__p" for name in WASTE_PREDICATES
    )
    return wide.select(
        F.expr(
            f"stack({len(WASTE_PREDICATES)}, {stack}) AS "
            "(category, topics_count, topic_partitions_sum)"
        ),
        "__total",
    ).select(
        "category",
        "topics_count",
        "topic_partitions_sum",
        F.floor(
            (F.col("topics_count").cast("double") / F.col("__total")) * 100
        ).alias("cluster_percentage"),
    )


def most_active_topics(topics_df: DataFrame) -> DataFrame:
    """A3 + P7 (`reporting/__init__.py:37-52`): exact p75 thresholds on
    new_messages / total_messages, strict >, and active_groups > 0."""
    q = topics_df.agg(
        F.expr("percentile(new_messages, 0.75)").alias("q_new"),
        F.expr("percentile(total_messages, 0.75)").alias("q_total"),
    )
    return (
        topics_df.crossJoin(F.broadcast(q))
        .filter(
            (F.col("new_messages") > F.col("q_new"))
            & (F.col("total_messages") > F.col("q_total"))
            & (F.col("active_groups") > 0)
        )
        .select(
            "name", "partitions", "total_messages", "new_messages", "active_groups"
        )
    )


def most_active_topics_approx(
    topics_df: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB form of most-active: ``approx_percentile`` (KLL-style
    sketch, mergeable, one pass, no full sort) instead of exact
    ``percentile``. NOT oracle-equality-checkable by design — the exact
    variant is the correctness surface; this one is the scale path, with
    the threshold-drift bound tested in tests/test_usage_extras.py."""
    q = topics_df.agg(
        F.expr(f"approx_percentile(new_messages, 0.75, {accuracy})").alias(
            "q_new"
        ),
        F.expr(f"approx_percentile(total_messages, 0.75, {accuracy})").alias(
            "q_total"
        ),
    )
    return (
        topics_df.crossJoin(F.broadcast(q))
        .filter(
            (F.col("new_messages") > F.col("q_new"))
            & (F.col("total_messages") > F.col("q_total"))
            & (F.col("active_groups") > 0)
        )
        .select(
            "name", "partitions", "total_messages", "new_messages", "active_groups"
        )
    )


def cluster_statistics(topics_df: DataFrame) -> DataFrame:
    """A1/A2 scalars (`reporting/__init__.py:46-47`)."""
    return topics_df.agg(
        F.count("name").alias("topics"),
        F.coalesce(F.sum("partitions"), F.lit(0)).alias("partitions"),
    )


def partition_balance(snaps_po: DataFrame, final_scan: int = FINAL_SCAN) -> DataFrame:
    """Partition-skew detection (kafka-ops extension): per multi-partition
    topic at the final scan, the spread between the hottest and coldest
    partition — keyed-produce hotspots show up as high max/avg ratios."""
    per_part = snaps_po.filter(F.col("scan_id") == final_scan).select(
        "topic",
        "partition_id",
        (F.col("end_offset") - F.col("start_offset")).alias("messages"),
    )
    return (
        per_part.groupBy("topic")
        .agg(
            F.count("*").alias("partitions"),
            F.max("messages").alias("max_messages"),
            F.min("messages").alias("min_messages"),
            F.sum("messages").alias("total_messages"),
        )
        .filter((F.col("partitions") > 1) & (F.col("total_messages") > 0))
        .select(
            "topic",
            "partitions",
            "max_messages",
            "min_messages",
            F.round(
                F.col("max_messages")
                / (F.col("total_messages").cast("double") / F.col("partitions")),
                6,
            ).alias("max_over_avg"),
        )
    )


def group_topic_matrix(snaps: dict[str, DataFrame]) -> DataFrame:
    """Consumer-group fan-out: per group, topics consumed and partitions
    with committed offsets (only topics known to the cluster — J1)."""
    po_topics = (
        snaps["partition_offsets"].select("topic").distinct()
    )
    return (
        snaps["group_offsets"]
        .join(F.broadcast(po_topics), "topic")
        .groupBy("group_id")
        .agg(
            F.count_distinct("topic").alias("topics_consumed"),
            F.count("*").alias("partitions_with_offsets"),
            F.sum(
                F.when(F.col("committed_offset") < 0, 1).otherwise(0)
            ).alias("unset_offsets"),
        )
    )


def describe_topics(topics_df: DataFrame) -> DataFrame:
    """A5: the per-scan ``describe()`` printout
    (`processing/clusters.py:108-109`) — Spark's ``summary()`` yields the
    same count/mean/stddev/min/quartiles/max grid."""
    return topics_df.select(
        "partitions", "total_messages", "new_messages", "messages_per_seconds"
    ).summary()


def apply_topic_filters(
    topics: DataFrame,
    include_regexes: list[str] | None = None,
    exclude_regexes: list[str] | None = None,
) -> DataFrame:
    """P12: the reference declares ``topic_include_regexes`` /
    ``topic_exclude_regexes`` in config (`specs/config.py:464-465`) but
    never applies them in scan code — implemented here as the documented
    extension: a pushdown-friendly scan filter on the topics dim."""
    out = topics
    if include_regexes:
        pred = F.lit(False)
        for r in include_regexes:
            pred = pred | F.col("name").rlike(r)
        out = out.filter(pred)
    if exclude_regexes:
        for r in exclude_regexes:
            out = out.filter(~F.col("name").rlike(r))
    return out
