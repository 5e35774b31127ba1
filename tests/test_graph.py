"""Graph family: PageRank must match an independent Python power
iteration exactly (same damping, same iteration count), conserve rank
mass, and the degree surface is oracle-checked in the parity sweep."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_DIR
from kafka_overwatch_spark.operators import graph
from kafka_overwatch_spark.registry import get_raw_tables


def test_pagerank_matches_python_power_iteration(spark):
    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    got = {r.part: r.rank for r in graph.pagerank(lineitem).collect()}

    edges = graph.copurchase_edges(lineitem).collect()
    out_w: dict = defaultdict(float)
    adj: dict = defaultdict(list)
    for e in edges:
        out_w[e.part_a] += e.weight
        out_w[e.part_b] += e.weight
        adj[e.part_a].append((e.part_b, e.weight))
        adj[e.part_b].append((e.part_a, e.weight))
    nodes = sorted(out_w)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        inflow: dict = defaultdict(float)
        for src, outs in adj.items():
            r = rank[src]
            w = out_w[src]
            for dst, wt in outs:
                inflow[dst] += r * wt / w
        rank = {v: 0.15 / n + 0.85 * inflow.get(v, 0.0) for v in nodes}

    assert set(got) == set(rank)
    worst = max(abs(got[v] - rank[v]) for v in nodes)
    assert worst < 1e-6, f"max rank divergence {worst}"
    # mass conservation: no dangling nodes in the co-purchase graph
    # (output rounds to 6 decimals since r9, so residue scales with n)
    assert abs(sum(got.values()) - 1.0) < 5e-7 * n + 1e-9


def test_pagerank_large_path_matches_broadcast_path(spark):
    """broadcast_vertex_limit=0 forces the shuffle-join path; ranks must
    be identical to the broadcast path (same float op order: the join
    strategy doesn't touch the arithmetic)."""
    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    small = {r.part: r.rank for r in graph.pagerank(lineitem).collect()}
    large = {
        r.part: r.rank
        for r in graph.pagerank(
            lineitem, broadcast_vertex_limit=0
        ).collect()
    }
    assert set(small) == set(large)
    assert max(abs(small[v] - large[v]) for v in small) < 1e-9
    assert abs(sum(large.values()) - 1.0) < 5e-7 * len(large) + 1e-9


def test_pagerank_large_path_step_is_shuffle_join(spark):
    """At the large setting the per-iteration join must NOT broadcast
    the vertex-dim rank frame (the 100× breaker): shuffle-hash join
    with the transition side pre-partitioned on the join key."""
    from pyspark.sql import functions as F

    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    edges = graph.copurchase_edges(lineitem)
    directed = edges.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst"),
        F.col("weight"),
    ).unionAll(
        edges.select(
            F.col("part_b").alias("src"), F.col("part_a").alias("dst"),
            F.col("weight"),
        )
    )
    out_w = directed.groupBy("src").agg(F.sum("weight").alias("w_out"))
    trans = (
        directed.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("p"))
        .repartition(8, "src")
        .localCheckpoint(eager=True)
    )
    nodes = trans.select(F.col("src").alias("part")).distinct()
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    step = graph.pagerank_step(trans, ranks, n, 0.85, small=False)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # the checkpointed transition side arrives pre-partitioned: exactly
    # one exchange feeds the join (the dim-sized rank side)
    join_part = plan.split("ShuffledHashJoin")[1].split("HashAggregate")[0]
    assert join_part.count("Exchange hashpartitioning") == 1


def test_degree_consistent_with_pagerank_nodes(spark):
    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    deg = {r.part for r in graph.part_degree(lineitem).collect()}
    pr = {r.part for r in graph.pagerank(lineitem, iterations=1).collect()}
    assert deg == pr


def test_clustering_coefficient_known_graph(spark):
    """Constructed graph: one triangle {1,2,3} plus an isolated edge
    {4,5} → triangles=1, wedges=3 (one per triangle vertex), global
    coefficient exactly 1.0 (the isolated edge adds no wedge)."""
    from kafka_overwatch_spark.operators.graph import clustering_coefficient

    rows = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (4, 5)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    r = clustering_coefficient(li).collect()[0]
    assert (r["triangles"], r["wedges"], r["global_clustering"]) == (
        1,
        3,
        1.0,
    )


def test_triangles_match_three_join_enumeration(spark):
    """The degree-oriented single-pass enumeration (r8 re-plan) must
    count exactly the triangles of the naive a<b three-join form, and
    attribute them to the same vertices."""
    from pyspark.sql import functions as F

    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    e = graph.copurchase_edges(lineitem).localCheckpoint()
    ab = e.select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
    bc = e.select(F.col("part_a").alias("b"), F.col("part_b").alias("c"))
    ac = e.select(F.col("part_a").alias("a"), F.col("part_b").alias("c"))
    old = ab.join(bc, "b").join(ac, ["a", "c"])
    assert graph.triangles(lineitem, edges=e).count() == old.count()
    per_old = defaultdict(int)
    for r in old.collect():
        for v in (r["a"], r["b"], r["c"]):
            per_old[v] += 1
    got = {
        r["part"]: r["triangles"]
        for r in graph.local_clustering(lineitem, edges=e).collect()
    }
    deg: dict = defaultdict(int)
    for r in e.collect():
        deg[r["part_a"]] += 1
        deg[r["part_b"]] += 1
    want = {p: per_old.get(p, 0) for p, d in deg.items() if d >= 2}
    assert got == want


def test_degree_orientation_kills_hub_wedges(spark):
    """Skew fixture (VERDICT r7 next #2): a star around hub id 0 — with
    id-ordered orientation every wedge roots at the hub (C(20,2) = 190
    candidates for zero triangles); degree orientation points every
    edge AT the hub, so the wedge join input is empty."""
    li = spark.createDataFrame(
        [(i, 0) for i in range(1, 21)] + [(i, i) for i in range(1, 21)],
        "l_orderkey long, l_partkey long",
    )
    e = graph.copurchase_edges(li)
    cand = graph.wedge_candidates(graph.oriented_edges(e))
    assert cand.count() == 0
    assert graph.triangles(li).count() == 0


def test_local_clustering_single_triangle_pass(spark):
    """VERDICT r7 What's-wrong #1: the per-node query must consume the
    triangle derivation ONCE (explode of the triangle row), not via a
    three-branch union that re-executes the join tree per branch. The
    only Union left in the plan is the degree aggregate's; exactly one
    Generate (the explode) attributes triangles to vertices. Edges
    arrive checkpointed, as the registry memo delivers them — the plan
    under test is the derivation DOWNSTREAM of the edge table."""
    lineitem = get_raw_tables(spark, SF_DIR)["lineitem"]
    e = graph.copurchase_edges(lineitem).localCheckpoint()
    df = graph.local_clustering(lineitem, edges=e)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Union") <= 1
    assert plan.count("Generate") == 1
