"""A5 describe()/summary and P12 scan filters."""

from __future__ import annotations


def test_describe_topics_summary_grid(spark, snaps):
    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.operators.usage import describe_topics

    topics_df = registry.get_topics_df(spark, "/root/testdata/sf0.001")
    rows = describe_topics(topics_df).collect()
    stats = {r["summary"] for r in rows}
    assert {"count", "mean", "stddev", "min", "25%", "50%", "75%", "max"} <= stats
    count_row = next(r for r in rows if r["summary"] == "count")
    assert int(count_row["partitions"]) == topics_df.count()


def test_apply_topic_filters(spark, snaps):
    from kafka_overwatch_spark.operators.usage import apply_topic_filters

    topics = snaps["topics"]
    out = apply_topic_filters(
        topics, include_regexes=[r"^app\..*$"], exclude_regexes=[r"^_.*$"]
    )
    names = [r["name"] for r in out.collect()]
    assert names and all(n.startswith("app.") for n in names)
    # exclude wins over include
    both = apply_topic_filters(
        topics, include_regexes=[r".*"], exclude_regexes=[r"^app\..*$"]
    )
    assert all(not r["name"].startswith("app.") for r in both.collect())


def test_filter_pushdown_in_plan(spark, snaps):
    """The P12 filter must reach the scan in a plain parquet read (the
    snapshot CTE chain hides the scan; probe with a direct read)."""
    from kafka_overwatch_spark.operators.usage import apply_topic_filters

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "source"
    ).withColumnRenamed("source", "name")
    plan = apply_topic_filters(
        df, exclude_regexes=[r"^src1$"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" in plan


def test_approx_most_active_close_to_exact(spark, snaps):
    """The sketch path: at max accuracy the approx quantile equals the
    exact one on integer data, so the result sets coincide here; the test
    guards that the approx variant stays a superset-or-equal within one
    rank either way."""
    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.operators.usage import (
        most_active_topics,
        most_active_topics_approx,
    )

    topics_df = registry.get_topics_df(spark, "/root/testdata/sf0.001")
    exact = {r["name"] for r in most_active_topics(topics_df).collect()}
    approx = {r["name"] for r in most_active_topics_approx(topics_df).collect()}
    assert len(exact ^ approx) <= max(2, len(exact) // 5)


def test_user_reach_sketch_accuracy(spark):
    """HLL sketch estimates (both HLL++ approx_count_distinct and the
    mergeable per-day Datasketches rollup) stay within 5% relative error
    of the exact distinct anchor — the contract that makes sketches the
    100 TB counting path."""
    from kafka_overwatch_spark.operators.relational import (
        events_user_reach,
        events_user_reach_sketch,
    )

    from tests.conftest import SF01_DIR

    ev = spark.read.parquet(f"{SF01_DIR}/events.parquet")
    exact = {r["event_type"]: r["exact_users"] for r in events_user_reach(ev).collect()}
    sk = {r["event_type"]: r for r in events_user_reach_sketch(ev).collect()}
    assert set(exact) == set(sk)
    for et, n in exact.items():
        assert abs(sk[et]["approx_users"] - n) / n <= 0.05, (et, n, sk[et])
        assert abs(sk[et]["sketch_users"] - n) / n <= 0.05, (et, n, sk[et])


def test_value_quantile_sketch_accuracy(spark):
    """approx_percentile (mergeable QuantileSummaries, accuracy 10000)
    stays within 1% relative error of the exact sort-based percentile —
    the sketch contract that removes the per-group full sort at scale."""
    from kafka_overwatch_spark.operators.relational import (
        events_value_quantiles,
    )
    from pyspark.sql import functions as F

    from tests.conftest import SF01_DIR

    ev = spark.read.parquet(f"{SF01_DIR}/events.parquet")
    exact = {r["event_type"]: r for r in events_value_quantiles(ev).collect()}
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "approx_percentile(CAST(value AS DOUBLE), array(0.5, 0.9, 0.99), 10000)"
            ).alias("q")
        )
        .collect()
    }
    for et, r in exact.items():
        for i, p in enumerate(["p50", "p90", "p99"]):
            e, a = r[p], approx[et]["q"][i]
            assert abs(a - e) / max(abs(e), 1e-9) <= 0.01, (et, p, e, a)


def test_dataset_card_consistent_with_per_doc_surfaces(spark, snaps):
    """The card's stated invariant: every scalar equals the aggregate of
    the per-doc surface it summarizes (shared expressions, no drift)."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.curation import dataset_card
    from kafka_overwatch_spark.pipelines.dedup import exact_dedup_keep
    from kafka_overwatch_spark.pipelines.text import gopher_quality_flags

    docs = spark.table("documents")
    card = dataset_card(docs).collect()[0]
    flags = gopher_quality_flags(docs)
    assert card["n_docs"] == docs.count()
    assert card["gopher_keep_docs"] == flags.filter(F.col("keep")).count()
    # distinct fingerprints == the exact-dedup keeper count
    assert card["distinct_fingerprints"] == exact_dedup_keep(docs).count()
    assert card["dup_docs"] == card["n_docs"] - card["distinct_fingerprints"]
