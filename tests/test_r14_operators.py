"""Round-14 operator tests: the ADVICE r13 fixes (k ≤ 2 truss
semantics, index-meta error propagation) and the derived-k rule."""

from __future__ import annotations

import pytest

from tests.test_r13_operators import EDGE_SCHEMA_KT, _python_ktruss


def _derived_need(edges):
    """The operator's k=None rule in python: lower-median of the
    initial per-edge triangle support, zeros included."""
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in cur:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sups = sorted(len(adj[a] & adj[b]) for a, b in cur)
    return sups[(len(sups) + 1) // 2 - 1]


def test_ktruss_k2_keeps_zero_support_edges(spark):
    """ADVICE r13 #1: a 2-truss is the WHOLE graph (need = 0), so a
    pendant edge with zero triangles must survive with support 0 —
    the pre-r14 inner join silently dropped it and the peel could
    never converge."""
    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    edges = [(1, 2), (2, 3), (1, 3), (3, 9)]  # triangle + pendant
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=2, edges=df).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 9): 0}


def test_ktruss_derived_k_matches_python(spark):
    """k=None derives need = lower-median of initial support (zeros
    included) and must equal the python peel at that k. Fixture: K5
    (support 3) + a lone triangle (support 1) + two pendants
    (support 0) — 15 edges, sorted supports [0,0,1,1,1,3×10], lower
    median (rank 8) = 3, so k = 5 and exactly the clique survives."""
    import itertools

    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k5 = list(itertools.combinations(range(1, 6), 2))
    edges = k5 + [(10, 11), (11, 12), (10, 12), (5, 20), (12, 21)]
    need = _derived_need(edges)
    assert need == 3
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, edges=df).collect()
    }
    assert got == _python_ktruss(edges, need + 2)
    assert set(got) == set(k5)


def test_ktruss_oracle_constants_shared():
    """ADVICE r13 #4: the DuckDB mirror must unroll exactly
    KTRUSS_ROUNDS rounds and derive the same need statistic — probe
    the generated SQL for the final-round CTE name and the kneed
    derivation instead of trusting two hardcoded copies."""
    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.operators.graph import (
        KTRUSS_ROUNDS,
        STAR_ROUNDS,
    )

    sql = registry.oracle_sql()["graph_ktruss_bounded"]
    assert f"te{KTRUSS_ROUNDS} " in sql
    assert f"te{KTRUSS_ROUNDS + 1}" not in sql
    assert "kneed" in sql and "(n + 1) // 2" in sql
    star = registry.oracle_sql()["graph_components_star_bounded"]
    assert f"e{STAR_ROUNDS} " in star or f"e{STAR_ROUNDS}\n" in star
    assert f"b{STAR_ROUNDS}" not in star  # no extra unrolled round


def test_containment_index_meta_error_propagates(spark, tmp_path):
    """ADVICE r13 #2: only a MISSING meta file is the legacy-index
    fallback; a corrupt/unreadable meta must raise, never silently
    screen at the wrong shingle width."""
    from kafka_overwatch_spark.pipelines.dedup import SHINGLE_K
    from kafka_overwatch_spark.streaming.documents_stream import (
        GrowingContainmentScreen,
    )

    # missing meta → legacy default
    legacy = GrowingContainmentScreen(
        str(tmp_path / "no_such_index"), str(tmp_path / "out")
    )
    assert legacy._index_k(spark) == SHINGLE_K

    # corrupt meta (a text file where parquet is expected) → raises
    base = tmp_path / "bad_index"
    (base / "meta").mkdir(parents=True)
    (base / "meta" / "part-00000.parquet").write_text("not parquet")
    bad = GrowingContainmentScreen(str(base), str(tmp_path / "out2"))
    with pytest.raises(Exception) as exc_info:
        bad._index_k(spark)
    assert "PATH_NOT_FOUND" not in str(exc_info.value)
