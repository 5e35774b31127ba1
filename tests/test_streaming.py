"""Streaming parity: the stateful W1 deltas and baseline-join W2 computed
over a replayed offset-sample stream must equal the batch window queries."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _replay_dir(spark, snaps, tmp):
    """Write one parquet file per scan (the stream replays scan by scan)."""
    po = snaps["partition_offsets"]
    for scan in range(4):
        po.filter(F.col("scan_id") == scan).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in/scan={scan}")
    # flatten: move files into one dir via a second read/write
    spark.read.parquet(f"{tmp}/in/scan=*").createOrReplaceTempView("_all")
    return f"{tmp}/in"


def test_stateful_w1_deltas_match_batch(spark, snaps):
    from kafka_overwatch_spark.operators.windows import offset_delta_per_scan
    from kafka_overwatch_spark.streaming import offsets as so

    with tempfile.TemporaryDirectory() as tmp:
        po = snaps["partition_offsets"]
        for scan in range(4):
            po.filter(F.col("scan_id") == scan).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
        stream = so.offset_sample_stream(spark, f"{tmp}/in")
        out = so.run_to_completion(
            so.per_interval_deltas(stream), f"{tmp}/ckpt1"
        )
        got = {
            (r["topic"], r["partition_id"], r["scan_id"]): r["delta_messages"]
            for r in out
        }
        batch = {
            (r["topic"], r["partition_id"], r["scan_id"]): r["delta_messages"]
            for r in offset_delta_per_scan(snaps).collect()
        }
        assert len(got) == len(batch)
        # NB: file order isn't guaranteed == scan order; the stateful op
        # sorts within batches but state evolves in arrival order. With
        # one file per trigger and scans written in order the common case
        # holds; tolerate full-map equality only.
        assert got == batch


def test_baseline_join_w2_matches_batch(spark, snaps):
    from kafka_overwatch_spark.operators.windows import (
        new_messages_since_baseline,
    )
    from kafka_overwatch_spark.streaming import offsets as so

    with tempfile.TemporaryDirectory() as tmp:
        po = snaps["partition_offsets"]
        for scan in range(4):
            po.filter(F.col("scan_id") == scan).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
        baseline = po.filter(F.col("scan_id") == 0)
        stream = so.offset_sample_stream(spark, f"{tmp}/in")
        out = so.run_to_completion(
            so.new_messages_vs_baseline(stream, baseline), f"{tmp}/ckpt2"
        )
        got = {
            (r["topic"], r["partition_id"], r["scan_id"]): r["new_messages"]
            for r in out
        }
        batch = {
            (r["topic"], r["partition_id"], r["scan_id"]): r["new_messages"]
            for r in new_messages_since_baseline(snaps).collect()
        }
        assert got == batch
