"""K7 backup tar + §3.3 restore-plan round trip."""

from __future__ import annotations

import tempfile


def test_backup_restore_roundtrip(spark, snaps):
    from kafka_overwatch_spark.operators.schema_registry import backup_index
    from kafka_overwatch_spark.sinks.sr_backup import (
        parse_backup_filename,
        plan_restore,
        write_backup,
    )

    idx = backup_index(snaps)
    n_versions = idx.count()
    with tempfile.TemporaryDirectory() as tmp:
        tar_path = write_backup(idx, tmp)

        # full restore replays every version, ordered by subject/version
        ops = plan_restore(tar_path)
        assert len(ops) == n_versions
        assert all(op["mode"] == "IMPORT" for op in ops)
        subjects = [op["subject"] for op in ops]
        assert subjects == sorted(subjects)

        # filename parse inverts the backup_file format
        row = idx.limit(1).collect()[0]
        parsed = parse_backup_filename(row["backup_file"])
        assert parsed["subject"] == row["subject"]
        assert parsed["version"] == row["version"]
        assert parsed["schema_id"] == row["schema_id"]

        # existing-version diff skips already-present versions
        first = ops[0]
        ops2 = plan_restore(
            tar_path, {first["subject"]: {first["version"]}}
        )
        assert len(ops2) == n_versions - 1
        assert not any(
            o["subject"] == first["subject"] and o["version"] == first["version"]
            for o in ops2
        )


def test_streaming_two_tier_report_cadence(spark, snaps):
    import glob
    import json
    import tempfile

    from pyspark.sql import functions as F

    from kafka_overwatch_spark.streaming.report_stream import (
        run_usage_report_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        po = snaps["partition_offsets"]
        for scan in range(4):
            po.filter(F.col("scan_id") == scan).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
        baseline = po.filter(F.col("scan_id") == 0)
        q, reporter = run_usage_report_stream(
            spark,
            f"{tmp}/in",
            baseline,
            f"{tmp}/ckpt",
            f"{tmp}/reports",
            evaluate_every=2,
        )
        q.awaitTermination(300)
        reports = sorted(glob.glob(f"{tmp}/reports/report_batch_*.json"))
        # 4 scan batches, evaluate every 2 → 2 reports
        assert len(reports) == 2
        last = json.load(open(reports[-1]))
        assert last["topics"] == po.select("topic").distinct().count()
        assert last["new_messages_since_baseline"] >= 0
