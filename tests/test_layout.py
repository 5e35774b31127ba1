"""Physical-layout proofs for the 100 TB claims in SCALE.md: cluster/scan
partition pruning reaches the scan, and bucketed persistence removes the
lag-join exchanges entirely."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_cluster_scan_partition_pruning(spark, snaps):
    from kafka_overwatch_spark.sinks.layout import write_offsets_partitioned

    with tempfile.TemporaryDirectory() as tmp:
        write_offsets_partitioned(snaps["partition_offsets"], f"{tmp}/po")
        df = (
            spark.read.parquet(f"{tmp}/po")
            .filter((F.col("cluster") == "primary") & (F.col("scan_id") == 3))
            .select("topic", "partition_id", "end_offset")
        )
        plan = _plan(df)
        # the predicate must prune partitions at the source, not filter rows
        assert "PartitionFilters" in plan
        assert "isnotnull(cluster" in plan or "cluster#" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
        # and the pruned read returns exactly the one scan's slice
        expected = (
            snaps["partition_offsets"]
            .filter((F.col("cluster") == "primary") & (F.col("scan_id") == 3))
            .count()
        )
        assert df.count() == expected


def test_bucketed_lag_join_has_no_exchange(spark, snaps):
    """group_offsets ⋈ partition_offsets bucketed by (topic,
    partition_id): the join must plan with ZERO Exchange operators — the
    co-located join that makes the per-scan lag pipeline shuffle-free at
    any scale."""
    from kafka_overwatch_spark.sinks.layout import (
        write_bucketed_for_lag_join,
    )

    po = (
        snaps["partition_offsets"]
        .filter((F.col("scan_id") == 3) & (F.col("cluster") == "primary"))
        .select("topic", "partition_id", "start_offset", "end_offset")
    )
    go = (
        snaps["group_offsets"]
        .filter(F.col("cluster") == "primary")
        .select("group_id", "topic", "partition_id", "committed_offset")
    )
    write_bucketed_for_lag_join(spark, po, "po_bucketed")
    write_bucketed_for_lag_join(spark, go, "go_bucketed")
    # at fixture size the planner rightly prefers broadcast (itself
    # shuffle-free); disable it to expose the big-big case the bucketing
    # exists for — two fact tables neither of which broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("go_bucketed").join(
            spark.table("po_bucketed"), ["topic", "partition_id"]
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        # row parity with the plain (exchange-paying) join
        plain = go.join(po, ["topic", "partition_id"])
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS po_bucketed")
        spark.sql("DROP TABLE IF EXISTS go_bucketed")


def test_zorder_layout_prunes_both_dimensions(spark):
    """The measured claim behind morton_expr: files clustered by the
    Morton key of (user, day) have tight min/max boxes in BOTH columns,
    so a zone-map query on EITHER dimension overlaps a strict subset of
    files — while a user-sorted layout degenerates to all-files for any
    day predicate."""
    from kafka_overwatch_spark.registry import get_raw_tables
    from kafka_overwatch_spark.sinks.layout import zorder_write

    events = get_raw_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id",
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    n_files = 16
    with tempfile.TemporaryDirectory() as tmp:
        zorder_write(events, f"{tmp}/zorder", "user_id", "day", files=n_files)
        (
            events.repartitionByRange(n_files, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(f"{tmp}/bylinear")
        )

        def file_boxes(path):
            df = spark.read.parquet(path).withColumn(
                "f", F.input_file_name()
            )
            return df.groupBy("f").agg(
                F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
                F.min("day").alias("dlo"), F.max("day").alias("dhi"),
            ).collect()

        def overlaps(boxes, ulo=None, uhi=None, dlo=None, dhi=None):
            n = 0
            for b in boxes:
                if ulo is not None and (b.uhi < ulo or b.ulo > uhi):
                    continue
                if dlo is not None and (b.dhi < dlo or b.dlo > dhi):
                    continue
                n += 1
            return n

        z, lin = file_boxes(f"{tmp}/zorder"), file_boxes(f"{tmp}/bylinear")
        # range partitioning may leave a few empty partitions; both
        # layouts must still be genuinely multi-file
        assert len(z) >= n_files // 2 and len(lin) >= n_files // 2
        days = sorted({b.dlo for b in lin} | {b.dhi for b in lin})
        dmid = days[len(days) // 2]
        # day-range query: user-sorted layout cannot prune (every file
        # spans all days); the z-order layout must prune
        day_z = overlaps(z, dlo=dmid, dhi=dmid + 20)
        day_lin = overlaps(lin, dlo=dmid, dhi=dmid + 20)
        assert day_lin == len(lin)
        assert day_z < len(z) // 2, f"zorder day-query hit {day_z}/{len(z)}"
        # user-range query: z-order still prunes (not as tightly as the
        # dedicated user sort, but sub-linear)
        user_z = overlaps(z, ulo=10, uhi=20)
        assert user_z < len(z), f"zorder user-query hit {user_z}/{len(z)}"


def test_compaction_reduces_file_count_preserves_rows(spark):
    """Many micro-files → byte-sized repartition → few files, identical
    rows (the streaming-ingest maintenance job)."""
    from kafka_overwatch_spark.registry import get_raw_tables
    from kafka_overwatch_spark.sinks.layout import compact_small_files

    events = get_raw_tables(spark, "/root/testdata/sf0.001")["events"]
    with tempfile.TemporaryDirectory() as tmp:
        # simulate per-trigger micro-files
        events.repartition(40).write.mode("overwrite").parquet(f"{tmp}/in")
        stats = compact_small_files(
            spark, f"{tmp}/in", f"{tmp}/out",
            target_bytes=512 * 1024, sort_cols=("ts",),
        )
        assert stats["files_before"] == 40
        assert stats["files_after"] < 10
        a = spark.read.parquet(f"{tmp}/in")
        b = spark.read.parquet(f"{tmp}/out")
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_preserves_hive_partitioning(spark):
    """A key=... partitioned source must be rewritten WITH the same
    partitionBy — flattening would silently drop partition pruning for
    downstream readers of the compacted copy (ADVICE r5)."""
    from kafka_overwatch_spark.registry import get_raw_tables
    from kafka_overwatch_spark.sinks.layout import compact_small_files

    events = get_raw_tables(spark, "/root/testdata/sf0.001")["events"]
    with tempfile.TemporaryDirectory() as tmp:
        (
            events.repartition(8)
            .write.partitionBy("event_type")
            .mode("overwrite")
            .parquet(f"{tmp}/in")
        )
        stats = compact_small_files(
            spark, f"{tmp}/in", f"{tmp}/out", target_bytes=512 * 1024
        )
        assert stats["files_after"] < stats["files_before"]
        out = spark.read.parquet(f"{tmp}/out")
        a = spark.read.parquet(f"{tmp}/in")
        assert a.count() == out.count()
        # partition pruning still works: a type filter prunes to that
        # type's directory only
        pruned = out.filter(out.event_type == "view")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "event_type=view" in plan or "PartitionFilters" in plan
        # and the key=... layout physically exists in the output
        import os

        assert any(
            d.startswith("event_type=") for d in os.listdir(f"{tmp}/out")
        )


def test_scd1_marker_collision_safe(spark):
    """A user column literally named _is_update must not corrupt the
    MERGE match predicate (ADVICE r5)."""
    from kafka_overwatch_spark.operators.relational import scd1_upsert

    target = spark.createDataFrame(
        [(1, "a", True), (2, "b", False)], "k long, v string, _is_update boolean"
    )
    updates = spark.createDataFrame(
        [(2, "B", None), (3, "c", True)], "k long, v string, _is_update boolean"
    )
    out = {r.k: (r.v, r._is_update) for r in scd1_upsert(
        target, updates, ["k"]
    ).collect()}
    # wholesale MERGE: update row wins on match (even its NULL cells)
    assert out == {1: ("a", True), 2: ("B", None), 3: ("c", True)}


def test_dynamic_partition_overwrite_replaces_only_touched_days(spark):
    """partitionOverwriteMode=dynamic: rewriting ONE day's slice must
    leave every other partition untouched (static mode would truncate
    the whole table) — the idempotent-backfill write mode for
    partitioned facts."""
    from kafka_overwatch_spark.registry import get_raw_tables

    events = get_raw_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id",
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        with tempfile.TemporaryDirectory() as tmp:
            events.write.partitionBy("day").mode("overwrite").parquet(
                f"{tmp}/t"
            )
            total = events.count()
            day0 = events.agg(F.min("day")).collect()[0][0]
            n_day0 = events.filter(F.col("day") == day0).count()
            # backfill day0 with HALF its rows (simulating a corrected
            # re-run) — dynamic mode must replace only that partition
            corrected = events.filter(
                (F.col("day") == day0) & (F.col("event_id") % 2 == 0)
            )
            n_corrected = corrected.count()
            corrected.write.partitionBy("day").mode("overwrite").parquet(
                f"{tmp}/t"
            )
            after = spark.read.parquet(f"{tmp}/t")
            assert after.count() == total - n_day0 + n_corrected
            assert after.filter(F.col("day") == day0).count() == n_corrected
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
