"""Structured Streaming parity for the reference's scan loop (SURVEY §2.9).

The reference *is* a hand-rolled micro-batch engine: every
``cluster_scan_interval_in_seconds`` (default 60, `specs/config.py:458`;
wait loop `processing/__init__.py:10-20`) it collects offset watermarks,
updates per-partition baselines (`overwatch_resources/topics.py:32-45,
77-87`), and every ``evaluation_period_in_seconds`` (default 60,
`specs/config.py:287`) emits the usage report.

Spark mapping implemented here:

- scan loop            → ``readStream`` over the offset-sample feed with
                         ``trigger(processingTime=...)`` (tests use
                         ``availableNow`` for determinism)
- baseline semantics   → W2 "new messages since service start" via a
                         static baseline join (the cheaper design — the
                         baseline is the first scan snapshot, exactly the
                         reference's `_init_end_offset`), and W1
                         per-interval deltas via ``applyInPandasWithState``
                         (arbitrary stateful op, state = last end_offset
                         per (topic, partition))
- report cadence       → ``foreachBatch`` gating (emit every Nth batch)
- vanished topics (J5) → state timeout / absence in the latest batch

Scale: the stream is keyed by (topic, partition_id) — state scales with
partition count, not event volume; watermarking is unnecessary because
samples are collector-generated monotonically (event-time ≡ processing
time, `SURVEY §2.9`), matching the reference.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OFFSET_SCHEMA = StructType(
    [
        StructField("cluster", StringType()),
        StructField("topic", StringType()),
        StructField("partition_id", LongType()),
        StructField("scan_id", LongType()),
        StructField("start_offset", LongType()),
        StructField("end_offset", LongType()),
        StructField("ts", TimestampType()),
    ]
)

DELTA_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition_id", LongType()),
        StructField("scan_id", LongType()),
        StructField("end_offset", LongType()),
        StructField("delta_messages", LongType()),
    ]
)


def offset_sample_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """The offset-watermark feed as a stream (one parquet file per scan in
    tests; a Kafka metadata collector topic in production)."""
    return (
        spark.readStream.schema(OFFSET_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def new_messages_vs_baseline(
    stream: DataFrame, baseline: DataFrame
) -> DataFrame:
    """W2 streaming form: stream joined to the static scan-0 baseline
    (stream-static join — no state needed, exactly the reference's
    `_init_end_offset` semantics, `topics.py:108-115`)."""
    base = baseline.select(
        "topic",
        "partition_id",
        F.col("end_offset").alias("baseline_end"),
    )
    return stream.join(base, ["topic", "partition_id"], "left").select(
        "topic",
        "partition_id",
        "scan_id",
        "ts",
        (
            F.col("end_offset") - F.coalesce("baseline_end", F.col("end_offset"))
        ).alias("new_messages"),
    )


def _delta_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful W1: delta vs previous scan's end_offset. State is one
    (last_end,) tuple per (topic, partition_id) — the streaming analog of
    the end_offset-setter observation at `topics.py:93-100`."""
    topic, partition_id = key
    last_end = state.get[0] if state.exists else None
    out = []
    # concat BEFORE sorting: a group bigger than one Arrow batch arrives
    # as multiple chunks with no cross-chunk ordering — per-chunk sorts
    # would fold scans out of order and corrupt the persisted baseline
    pdf = pd.concat(list(pdf_iter)).sort_values("scan_id")
    for _, row in pdf.iterrows():
        end = int(row["end_offset"])
        delta = 0 if last_end is None else end - last_end
        out.append((topic, int(partition_id), int(row["scan_id"]), end, delta))
        last_end = end
    state.update((last_end,))
    yield pd.DataFrame(
        out,
        columns=["topic", "partition_id", "scan_id", "end_offset", "delta_messages"],
    )


def per_interval_deltas(stream: DataFrame) -> DataFrame:
    """W1 streaming form via applyInPandasWithState (custom stateful op)."""
    return (
        stream.groupBy("topic", "partition_id")
        .applyInPandasWithState(
            _delta_fn,
            outputStructType=DELTA_SCHEMA,
            stateStructType=StructType([StructField("last_end", LongType())]),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


W3_STREAM_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition_id", LongType()),
        StructField("scan_id", LongType()),
        StructField("start_offset", LongType()),
        StructField("first_offset", LongType()),
        StructField("retention_drift", LongType()),
    ]
)


def _first_offset_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful W3: the per-partition first-offset baseline persists across
    batches (`topics.py:77-87`: the broker low watermark moves under
    retention; drift = current_start − first_seen_start)."""
    topic, partition_id = key
    first = state.get[0] if state.exists else None
    out = []
    # concat before sorting — same cross-chunk ordering hazard as
    # _delta_fn: the baseline must latch from the globally-first scan
    for row in pd.concat(list(pdf_iter)).sort_values("scan_id").itertuples():
        start = int(row.start_offset)
        if first is None:
            first = start
        out.append(
            (
                topic,
                int(partition_id),
                int(row.scan_id),
                start,
                first,
                start - first,
            )
        )
    state.update((first,))
    yield pd.DataFrame(out, columns=[f.name for f in W3_STREAM_SCHEMA.fields])


def first_offset_evolution_stream(stream: DataFrame) -> DataFrame:
    """W3 streaming form: applyInPandasWithState with the first-seen
    start offset as persistent per-partition state."""
    return stream.groupBy("topic", "partition_id").applyInPandasWithState(
        _first_offset_fn,
        outputStructType=W3_STREAM_SCHEMA,
        stateStructType=StructType([StructField("first_start", LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LIVENESS_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition_id", LongType()),
        StructField("last_scan_id", LongType()),
        StructField("expired", BooleanType()),
    ]
)

# event-time silence (ms) after a key's last sample before it is declared
# vanished; override via vanished_entity_stream(gap_ms=...)
DEFAULT_LIVENESS_GAP_MS = 1


def _make_liveness_fn(gap_ms: int):
    def _liveness_fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """J5/J6 via state timeout: a (topic, partition) that stops
        appearing in the feed times out once the watermark passes its last
        sample's event time + gap, and is REMOVED from state with an
        `expired` tombstone — the streaming analog of the reference
        deleting vanished topics/CGs from its caches
        (`kafka_resources/topics.py:64-72`, `groups.py:55-71`).

        Event-time (not processing-time) timeout: the collector feed
        carries the scan timestamp, so "vanished" is judged against the
        feed's own clock — deterministic under replay and indifferent to
        micro-batch scheduling."""
        topic, partition_id = key
        cols = [f.name for f in LIVENESS_SCHEMA.fields]
        if state.hasTimedOut:
            last = state.get[0] if state.exists else None
            state.remove()
            yield pd.DataFrame(
                [(topic, int(partition_id), last, True)], columns=cols
            )
            return
        last_scan, last_ts_ms = (
            (state.get[0], state.get[1]) if state.exists else (None, None)
        )
        # accumulate maxima across chunks AND prior state — chunk order
        # is unspecified and a late-but-in-watermark sample must never
        # regress the liveness clock
        for pdf in pdf_iter:
            if len(pdf):
                chunk_scan = int(pdf["scan_id"].max())
                chunk_ts = int(pdf["ts"].max().value // 1_000_000)
                last_scan = (
                    chunk_scan if last_scan is None
                    else max(last_scan, chunk_scan)
                )
                last_ts_ms = (
                    chunk_ts if last_ts_ms is None
                    else max(last_ts_ms, chunk_ts)
                )
        state.update((last_scan, last_ts_ms))
        # deadline re-arms on every appearance; fires only when the
        # watermark (driven by OTHER keys' newer samples) passes it
        state.setTimeoutTimestamp(last_ts_ms + gap_ms)
        yield pd.DataFrame(
            [(topic, int(partition_id), last_scan, False)], columns=cols
        )

    return _liveness_fn


def vanished_entity_stream(
    stream: DataFrame,
    gap_ms: int = DEFAULT_LIVENESS_GAP_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Reconciliation stream: one liveness row per (topic, partition) per
    batch, plus an expired=true tombstone when the key stops arriving
    (GroupStateTimeout.EventTimeTimeout + state.remove()).

    State scales with partition count, not event volume; keys that keep
    arriving never expire because the deadline re-arms each batch."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("topic", "partition_id")
        .applyInPandasWithState(
            _make_liveness_fn(gap_ms),
            outputStructType=LIVENESS_SCHEMA,
            stateStructType=StructType(
                [
                    StructField("last_scan", LongType()),
                    StructField("last_ts_ms", LongType()),
                ]
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint: str) -> list:
    """Drain a stream with availableNow into an in-memory table; returns
    the collected rows (test helper)."""
    name = "stream_out_" + checkpoint.replace("/", "_").strip("_")[-32:]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            "stream did not drain within 300s — partial results would "
            "silently weaken the assertion; failing loudly instead"
        )
    spark = stream_df.sparkSession
    return spark.table(name).collect()
