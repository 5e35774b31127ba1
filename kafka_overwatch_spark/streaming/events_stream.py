"""Structured Streaming over the events feed — the training-pipeline
streaming surface (beyond the reference's metadata scan loop): watermarked
tumbling-window aggregation and streaming exact dedup.

Scale: the windowed agg is keyed by (window, event_type) — state is
bounded by watermark retention × key cardinality; dropDuplicates state by
the id space within the watermark horizon. Both survive a 1000-executor
deployment because state partitions by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def windowed_counts(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Tumbling 1-day windows per event_type with late-data watermark —
    the streaming twin of relational.events_daily_rollup."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "events",
            "total_value",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    `dropDuplicates` with bounded state."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("events", LongType()),
        StructField("duration_sec", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_ord", LongType()),
        StructField("start_unix", LongType()),
        StructField("last_unix", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_session_fn(gap_seconds: int):
    import pandas as pd

    cols = [f.name for f in SESSION_SCHEMA.fields]

    # sentinel for "no open session, but remember the per-user session
    # ordinal" — state must survive a timeout close or the next session
    # would re-number from 1 and collide with an emitted (user, id) pair
    CLOSED = -1

    def _session_fn(key, pdf_iter, state):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session can
            # never be extended — close it, KEEP the ordinal (no new
            # timeout: sentinel state is inert until the user returns)
            ord_, start, last, n = (int(v) for v in state.get)
            out.append((int(user_id), ord_, n, last - start))
            state.update((ord_, CLOSED, CLOSED, 0))
            yield pd.DataFrame(out, columns=cols)
            return
        if state.exists:
            ord_, start, last, n = (int(v) for v in state.get)
            if start == CLOSED:
                start, last, n = None, None, 0
        else:
            ord_, start, last, n = 0, None, None, 0
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            t = int(pd.Timestamp(ts).timestamp())
            if start is None:
                ord_, start, last, n = ord_ + 1, t, t, 1
            elif t - last > gap_seconds:
                out.append((int(user_id), int(ord_), int(n), int(last - start)))
                ord_, start, last, n = ord_ + 1, t, t, 1
            else:
                last = max(last, t)
                n += 1
        state.update((ord_, start, last, n))
        if start is not None:
            state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        yield pd.DataFrame(out, columns=cols)

    return _session_fn


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of `relational.sessionize_events`: gap-based
    sessions via applyInPandasWithState keyed by user_id. Sessions close
    either inline (a later event exceeds the gap) or by
    EventTimeTimeout when the watermark passes last_event + gap — so
    emission is deterministic under replay (event-time, never
    wall-clock; see NOTES.md lesson 9).

    State is one row per seen user: the open session, or a closed
    sentinel that carries the session ordinal so numbering stays
    monotonic across timeout closes (∝ the user dimension, partitioned
    by the group key at any cluster size). Assumes the feed
    is time-ordered per user within the watermark (the replay slices in
    tests are; a real feed relies on the watermark delay)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


class ReachSketchMaintainer:
    """foreachBatch handler maintaining a per-(event_type, day) HLL
    sketch state table: each micro-batch is sketched
    (``hll_sketch_agg``) and unioned (``hll_union_agg``) into persisted
    parquet state, so distinct-user reach at ANY grain is served from
    constant-size sketch bytes without rescanning raw events — the
    incremental-OLAP pattern that replaces a (key, user_id) distinct
    shuffle over 100 TB of history with a merge of kilobyte sketches.

    Replay safety comes from HLL algebra, not bookkeeping: unioning the
    same users into a sketch is IDEMPOTENT (registers are max-merged),
    so a batch replayed after a crash-between-write-and-checkpoint
    leaves every estimate unchanged.

    State write: merged state is localCheckpoint-ed (materialized,
    lineage cut from the files being overwritten) before the overwrite —
    same pattern as `streaming/incremental.py` (NOTES lesson 8).

    First-batch detection is an explicit filesystem existence probe
    (Hadoop FS API, so it works on s3a/hdfs paths too) — NOT a
    try/except around the read: a corrupt or partially-written state
    dir must fail the batch loudly, never be silently mistaken for
    "no state yet" (which would reset all accumulated reach history).
    """

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir

    def _state_exists(self, spark: SparkSession) -> bool:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.state_dir)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(path))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.relational import day_user_sketches

        spark = batch_df.sparkSession
        batch_sk = day_user_sketches(batch_df)
        if self._state_exists(spark):
            prev = spark.read.parquet(self.state_dir)
            merged = (
                prev.unionByName(batch_sk)
                .groupBy("event_type", "day")
                .agg(F.expr("hll_union_agg(sk)").alias("sk"))
            )
        else:  # first batch: no state yet
            merged = batch_sk
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.state_dir)


def run_reach_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint: str,
    timeout_sec: int = 300,
) -> None:
    """Drain the events feed into the sketch state table
    (availableNow; production uses a processing-time trigger)."""
    q = (
        event_stream(spark, input_dir)
        .writeStream.foreachBatch(ReachSketchMaintainer(state_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"reach-sketch drain exceeded {timeout_sec}s; state at "
            f"{state_dir} is incomplete"
        )


def reach_from_sketch_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-event-type reach served from the sketch state table alone —
    a rollup over sketch bytes (union across days), no raw-event scan."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("long")
            .alias("sketch_users")
        )
    )
