"""Round-14 optimization plan locks: the lazy-localCheckpoint folds
that de-duplicate repeated subtrees must stay in place. Each assertion
pins the single-pass property the optimization bought — the expensive
subtree (tokenize/explode/LSH-verify) sits BEHIND the checkpoint
barrier, so the downstream plan must not show it (twice).

Results are unchanged by a checkpoint, so correctness stays covered by
the existing oracle-parity suite; these tests exist so a refactor that
silently drops a checkpoint (reintroducing the double computation)
fails loudly instead of only showing up as a bench regression."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_line_dedup_single_tokenize_pass(spark, snaps):
    """Before r14 the regexp_extract_all+posexplode Generate ran twice
    (frequency aggregate + join-back). Behind the checkpoint, the
    downstream plan shows the pinned RDD scan and no posexplode."""
    from kafka_overwatch_spark import registry

    plan = _plan(registry.spark_queries()["text_line_dedup"](spark, SF))
    assert "Scan ExistingRDD" in plan
    assert plan.count("posexplode") == 0


def test_contamination_single_corpus_tokenize_pass(spark, snaps):
    """The corpus-side 3-gram explode fed both the hit aggregate and
    the totals aggregate (two Generates in the r14-before plan). Only
    the (tiny) probe side may still explode in the downstream plan."""
    from kafka_overwatch_spark import registry

    plan = _plan(registry.spark_queries()["text_contamination"](spark, SF))
    assert "Scan ExistingRDD" in plan
    # probe side only: one visible explode site at most
    assert plan.count("explode") <= 1


def test_tfidf_single_term_count_pass(spark, snaps):
    """The (doc_id, token) term-count aggregate fed both the df
    aggregate and the scored join (two explode+aggregate chains, no
    exchange reuse — plans/r14/text_tfidf_before.txt). Behind the
    checkpoint no explode remains downstream."""
    from kafka_overwatch_spark import registry

    plan = _plan(registry.spark_queries()["text_tfidf"](spark, SF))
    assert "Scan ExistingRDD" in plan
    assert plan.count("explode") == 0


def test_density_cores_lsh_single_pair_pass(spark, snaps):
    """The vec_a/vec_b union read the LSH pair frame twice — running
    the Arrow bucket-assign + verify pipeline twice per action. Behind
    the checkpoint the downstream plan holds zero Python nodes and two
    scans of the SAME pinned RDD."""
    from kafka_overwatch_spark import registry

    plan = _plan(
        registry.spark_queries()["emb_density_cores_lsh"](spark, SF)
    )
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_link_prediction_results_unchanged_by_checkpoint_fold(
    spark, snaps
):
    """The deg/centers pins are pure plan surgery: spot-check the
    scored output against a direct recomputation of one probe pair's
    common-neighbor count."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark import registry

    df = registry.spark_queries()["graph_link_prediction"](spark, SF)
    rows = df.orderBy("part", "candidate").limit(3).collect()
    if not rows:  # tiny fixture may produce no qualifying pairs
        return
    edges = registry.get_copurchase_edges(spark, SF)
    und = edges.select("part_a", "part_b")
    both = und.union(
        und.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
        )
    )
    r = rows[0]
    na = {
        x["part_b"]
        for x in both.filter(F.col("part_a") == r["part"]).collect()
    }
    nb = {
        x["part_b"]
        for x in both.filter(F.col("part_a") == r["candidate"]).collect()
    }
    deg = both.groupBy("part_a").agg(F.count("*").alias("d"))
    hubs = {
        x["part_a"]
        for x in deg.filter(F.col("d") > 500).collect()
    }
    assert r["common_neighbors"] == len((na & nb) - hubs)
