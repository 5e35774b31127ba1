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
