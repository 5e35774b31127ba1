"""Incremental aggregation (SURVEY §7 Phase 4): maintain running per-topic
totals as scans append, instead of recomputing over history.

The offset fact is append-only; per-topic message totals are associative
deltas, so each micro-batch folds into a running aggregate keyed by
topic. At 100 TB this is the difference between O(Δ) and O(history) per
report: the foreachBatch body becomes a Delta/Iceberg MERGE; here the
running state is a cached DataFrame upserted per batch, and correctness
is asserted against the full batch recompute (tests/test_incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalTopicTotals:
    """foreachBatch handler folding per-batch deltas into running totals.

    State per topic: latest end/start offsets summed over partitions and
    cumulative new-message count (vs the previous scan's end offsets —
    W1-accumulated, which telescopes to end@latest − end@first)."""

    def __init__(self) -> None:
        self.prev_ends: DataFrame | None = None  # (topic, partition_id, end)
        self.totals: DataFrame | None = None  # (topic, cum_new)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.select(
            "topic", "partition_id", "end_offset"
        )
        if self.prev_ends is None:
            delta = cur.select(
                "topic", F.lit(0).cast("long").alias("delta")
            )
        else:
            delta = (
                cur.alias("c")
                .join(
                    self.prev_ends.alias("p"),
                    ["topic", "partition_id"],
                    "left",
                )
                .select(
                    "topic",
                    (
                        F.col("c.end_offset")
                        - F.coalesce(F.col("p.end_offset"), F.col("c.end_offset"))
                    ).alias("delta"),
                )
            )
        batch_totals = delta.groupBy("topic").agg(
            F.sum("delta").alias("batch_new")
        )
        if self.totals is None:
            totals = batch_totals.select(
                "topic", F.col("batch_new").alias("cum_new")
            )
        else:
            totals = (
                self.totals.alias("t")
                .join(batch_totals.alias("b"), "topic", "full")
                .select(
                    "topic",
                    (
                        F.coalesce(F.col("t.cum_new"), F.lit(0))
                        + F.coalesce(F.col("b.batch_new"), F.lit(0))
                    ).alias("cum_new"),
                )
            )
        # localCheckpoint(eager): materialize AND sever lineage. cache()
        # alone keeps the logical plan rooted in the previous batch's
        # source — the plan deepens every micro-batch (planning blowup on
        # long streams) and an evicted block would recompute against an
        # expired batch source. After checkpointing, the state plan is a
        # flat LogicalRDD regardless of stream age; dropped references are
        # freed by the ContextCleaner. Production path: Delta/Iceberg
        # MERGE per batch (a real table instead of executor blocks).
        self.prev_ends = cur.localCheckpoint(eager=True)
        self.totals = totals.localCheckpoint(eager=True)
