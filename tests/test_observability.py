"""Observation-API instrumentation: metrics ride the query's own job and
match independently-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scan_health_metrics_match_direct_aggregation(spark, snaps):
    from kafka_overwatch_spark.operators.observability import (
        observed_partition_offsets,
    )

    po, obs = observed_partition_offsets(snaps, cluster="primary")
    # any action materializes the metrics — here a downstream aggregation
    n_rows_through = po.count()
    got = obs.get
    want = snaps["partition_offsets"].filter(F.col("cluster") == "primary").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col("end_offset") < 0).cast("long")).alias("neg"),
        F.sum(
            (F.col("end_offset") < F.col("start_offset")).cast("long")
        ).alias("inv"),
        F.max("end_offset").alias("mx"),
    ).collect()[0]
    assert got["rows"] == want["rows"] == n_rows_through
    assert got["negative_offsets"] == want["neg"]
    assert got["inverted_watermarks"] == want["inv"]
    assert got["max_end_offset"] == want["mx"]
    # approx distinct within sketch tolerance of the exact count
    exact_topics = (
        snaps["partition_offsets"]
        .filter(F.col("cluster") == "primary")
        .select("topic")
        .distinct()
        .count()
    )
    assert abs(got["topics"] - exact_topics) / exact_topics <= 0.05


def test_empty_scan_metrics_are_null_safe(spark, snaps):
    """An empty scan (unreachable cluster) must publish zero counts and
    silently skip valueless gauges — not crash the publish path."""
    from kafka_overwatch_spark.operators.observability import (
        observation_metric_rows,
        observed,
        scan_health_metrics,
    )

    empty = snaps["partition_offsets"].filter(F.lit(False))
    df, obs = observed(empty, "empty_scan", scan_health_metrics())
    df.count()
    rows = {m: v for (m, _, _, _, v) in observation_metric_rows(obs, "x")}
    assert rows["kafka_scan_rows"] == 0
    assert rows["kafka_scan_negative_offsets"] == 0
    assert rows["kafka_scan_inverted_watermarks"] == 0
    assert "kafka_scan_max_end_offset" not in rows  # null → skipped


def test_observed_metrics_see_only_flowing_rows(spark, snaps):
    """Observation measures the rows that actually flow past the observe
    node — instrument BELOW a filter and the filtered rows still count;
    the same instrument above the filter would not. (This is the
    semantic difference vs a side count job.)"""
    from kafka_overwatch_spark.operators.observability import observed

    base = snaps["partition_offsets"]
    instrumented, obs = observed(
        base, "below_filter", {"rows": F.count(F.lit(1))}
    )
    instrumented.filter(F.col("scan_id") == 0).count()
    assert obs.get["rows"] == base.count()  # all rows flowed past observe


def test_observation_rows_render_in_prometheus_exposition(spark, snaps):
    from kafka_overwatch_spark.operators.observability import (
        observation_metric_rows,
        observed_partition_offsets,
    )
    from kafka_overwatch_spark.sinks.prometheus import render_exposition

    po, obs = observed_partition_offsets(snaps)
    po.count()
    rows = observation_metric_rows(obs, "primary")
    df = spark.createDataFrame(
        rows,
        "metric string, cluster string, group_id string, topic string, "
        "value double",
    )
    text = render_exposition(df)
    assert 'kafka_scan_rows{cluster="primary"}' in text
    assert "kafka_scan_negative_offsets" in text
