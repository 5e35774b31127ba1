"""k-core peeling: exact python-reference parity on the real
co-purchase graph at sf0.001, plus constructed-graph semantics (a hub
star has no 2-core; a clique is its own core)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _python_kcore(edges, k):
    """Reference peeling over a list of (a, b) undirected edges."""
    cur = set(edges)
    while True:
        deg: dict = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        low = {v for v, d in deg.items() if d < k}
        if not low:
            return deg
        cur = {(a, b) for a, b in cur if a not in low and b not in low}


def test_kcore_matches_python_peeling(spark, snaps):
    from kafka_overwatch_spark.operators.graph import (
        copurchase_edges,
        kcore,
    )

    li = spark.table("lineitem")
    edges = copurchase_edges(li)
    pairs = [(r["part_a"], r["part_b"]) for r in edges.collect()]
    want = _python_kcore(pairs, 3)
    got = {
        r["part"]: r["core_degree"]
        for r in kcore(li, k=3, edges=edges).collect()
    }
    assert got == want
    assert len(got) > 0  # fixture graph has a non-trivial 3-core


def test_kcore_hub_star_is_empty_and_clique_survives(spark):
    from kafka_overwatch_spark.operators.graph import kcore

    # star: hub 0 with 5 leaves (every leaf degree 1 -> no 2-core at
    # k=2 once leaves peel, the hub's degree collapses too);
    # clique: 10,11,12,13 complete (degree 3 each -> entire 3-core)
    star = [(0, i) for i in range(1, 6)]
    clique = [
        (a, b)
        for i, a in enumerate((10, 11, 12, 13))
        for b in (10, 11, 12, 13)[i + 1 :]
    ]
    edges = spark.createDataFrame(
        star + clique, "part_a long, part_b long"
    ).withColumn("weight", F.lit(1))
    out = {
        r["part"]: r["core_degree"]
        for r in kcore(None, k=3, edges=edges).collect()
    }
    assert out == {10: 3, 11: 3, 12: 3, 13: 3}


def test_kcore_bounded_equals_fixpoint_when_converged(spark, snaps):
    """r10: the oracle-able fixed-round variant is EXACTLY the
    fixpoint peel whenever convergence lands inside the budget —
    checked against the python reference at the registered k=80."""
    from kafka_overwatch_spark.operators.graph import (
        copurchase_edges,
        kcore_bounded,
    )

    li = spark.table("lineitem")
    edges = copurchase_edges(li)
    pairs = [(r["part_a"], r["part_b"]) for r in edges.collect()]
    want = _python_kcore(pairs, 80)
    got = {
        r["part"]: r["core_degree"]
        for r in kcore_bounded(li, k=80, rounds=8, edges=edges).collect()
    }
    assert got == want


def test_kcore_bounded_raises_when_budget_exhausts(spark):
    """Deviation contract: a budget smaller than the peel depth is a
    LOUD error, never a silently partial core. A path graph peels one
    layer per round at k=2 once an endpoint drops... use a chain of
    nested shells: path 0-1-2-3-4-5 at k=2 peels endpoint-inward one
    round at a time (rounds needed > 1)."""
    import pytest

    from kafka_overwatch_spark.operators.graph import kcore_bounded

    path = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        path, "part_a long, part_b long"
    ).withColumn("weight", F.lit(1))
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_bounded(None, k=2, rounds=1, edges=edges)
