"""Per-cluster pruning: the report pipeline over filter_cluster(primary)
equals the unfiltered pipeline on the single-cluster fixture, and an
unknown cluster yields empty frames (not errors)."""

from __future__ import annotations


def test_filter_cluster_identity_on_primary(spark, snaps):
    from kafka_overwatch_spark.operators.usage import build_topics_df
    from kafka_overwatch_spark.snapshot import filter_cluster

    pruned = filter_cluster(snaps, "primary")
    a = sorted(tuple(r) for r in build_topics_df(snaps).collect())
    b = sorted(tuple(r) for r in build_topics_df(pruned).collect())
    assert a == b


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
