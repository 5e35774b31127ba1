"""Per-cluster pruning over the two-cluster fixture: the per-cluster
report pipelines partition the fleet exactly, and an unknown cluster
yields empty frames (not errors)."""

from __future__ import annotations


def test_two_clusters_partition_the_fleet(spark, snaps):
    from kafka_overwatch_spark.operators.usage import build_topics_df
    from kafka_overwatch_spark.snapshot import filter_cluster

    clusters = sorted(
        r["cluster"]
        for r in snaps["topics"].select("cluster").distinct().collect()
    )
    assert clusters == ["analytics", "primary"]
    per_cluster = {
        c: {r["name"] for r in build_topics_df(filter_cluster(snaps, c)).collect()}
        for c in clusters
    }
    # disjoint, non-empty, and together they cover every topic
    assert per_cluster["analytics"] and per_cluster["primary"]
    assert not (per_cluster["analytics"] & per_cluster["primary"])
    all_topics = {r["name"] for r in build_topics_df(snaps).collect()}
    assert per_cluster["analytics"] | per_cluster["primary"] == all_topics


def test_cluster_statistics_by_cluster_covers_both(spark):
    from kafka_overwatch_spark import registry
    from tests.conftest import SF_DIR

    rows = {
        r["cluster"]: (r["topics"], r["partitions"])
        for r in registry.spark_queries()["cluster_statistics_by_cluster"](
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == {"analytics", "primary"}
    assert all(t > 0 and p > 0 for t, p in rows.values())


def test_filter_cluster_unknown_is_empty(spark, snaps):
    from kafka_overwatch_spark.operators.lag import build_groups_df
    from kafka_overwatch_spark.operators.usage import build_topics_df
    from kafka_overwatch_spark.snapshot import filter_cluster

    ghost = filter_cluster(snaps, "nope")
    assert build_topics_df(ghost).count() == 0
    assert build_groups_df(ghost).count() == 0


def test_filter_prunes_in_plan(spark, snaps):
    from kafka_overwatch_spark.snapshot import filter_cluster

    pruned = filter_cluster(snaps, "primary")["partition_offsets"]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cluster" in plan and "Filter" in plan
