"""Round-15 optimization tests: the unsigned unpack fix (ADVICE r14
#1), the incremental k-truss support maintenance (VERDICT r14 next #3),
and the auto wedge-budget mode (VERDICT r14 next #6)."""

from __future__ import annotations

import itertools

import pytest

from tests.test_r13_operators import EDGE_SCHEMA_KT, _python_ktruss


def test_ktruss_large_ids_unpack_unsigned(spark):
    """Ids in [2^31, 2^32) pack to NEGATIVE longs; the arithmetic
    shiftright sign-extended the unpack, so support rows failed to
    join back and whole cliques were silently peeled in round 1
    (ADVICE r14 #1). The guard admits these ids, so the peel must be
    correct for them — checked against the python reference on a K5
    whose every vertex id has the top bit of the low word set."""
    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    base = 2**31 + 5
    k5 = list(itertools.combinations(range(base, base + 5), 2))
    edges = k5 + [(base, 2**32 - 2)]  # pendant at the very top of range
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=5, edges=df).collect()
    }
    want = _python_ktruss(edges, 5)
    assert got == want
    assert set(got) == set(k5) and all(v == 3 for v in got.values())


def test_triangles_packed_closure_large_ids(spark):
    """The packed-closure enumeration must unpack ids ≥ 2^31 unsigned
    too — same triangle set as the two-column closure."""
    from kafka_overwatch_spark.operators.graph import triangles

    base = 2**31 + 1
    k4 = list(itertools.combinations(range(base, base + 4), 2))
    df = spark.createDataFrame(k4, EDGE_SCHEMA_KT)
    plain = {
        tuple(sorted((r.a, r.b, r.c)))
        for r in triangles(None, edges=df).collect()
    }
    packed = {
        tuple(sorted((r.a, r.b, r.c)))
        for r in triangles(None, edges=df, packed_closure=True).collect()
    }
    assert plain == packed and len(plain) == 4
    assert all(v >= base for t in packed for v in t)


def test_ktruss_incremental_support_matches_reenumeration(spark):
    """The r15 peel maintains per-edge support by SUBTRACTING the
    dropped triangles' credits instead of re-aggregating the full
    incidence frame each round. On a graph that (a) cascades over
    several rounds and (b) keeps survivors whose support DECREMENTS
    mid-peel (the K6 edge (1,2) loses the {1,2,7} triangle when the
    gadget peels), the maintained result must equal both the
    per-round-re-enumeration path and the python reference."""
    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k6 = list(itertools.combinations(range(1, 7), 2))
    gadget = [(1, 7), (2, 7)]  # triangle {1,2,7}: peels, decrements (1,2)
    strip = [(i, i + 1) for i in range(20, 26)] + [
        (i, i + 2) for i in range(20, 25)
    ]  # erodes from both ends over several rounds under need=2
    edges = k6 + gadget + strip
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    want = _python_ktruss(edges, 4)
    incremental = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=4, edges=df).collect()
    }
    # a huge explicit budget forces the non-reuse path: full triangle
    # re-enumeration + re-aggregation every round (splits stays 1)
    reenumerated = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(
            None, k=4, edges=df, wedge_budget=10**9
        ).collect()
    }
    assert incremental == reenumerated == want
    assert incremental[(1, 2)] == 4  # decremented from 5 when 7 peeled
    assert set(incremental) == set(k6)


def test_ktruss_wedge_budget_auto(spark, monkeypatch):
    """The default budget mode is 'auto': measure the round-0 wedge
    mass and choose. Under a tiny $SPARK_GRAFT_WEDGE_BUDGET the
    default call must engage the decomposed path (observable: the
    >64-sub-jobs guard fires on K10's 120-wedge mass at budget 1,
    and at budget 3 the decomposed result still matches the python
    peel); with the default headroom the same call takes the
    triangle-reuse path and matches too."""
    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k10 = list(itertools.combinations(range(1, 11), 2))
    df10 = spark.createDataFrame(k10, EDGE_SCHEMA_KT)
    monkeypatch.setenv("SPARK_GRAFT_WEDGE_BUDGET", "1")
    with pytest.raises(RuntimeError, match="sub-jobs"):
        ktruss_bounded(None, k=5, edges=df10).collect()
    monkeypatch.setenv("SPARK_GRAFT_WEDGE_BUDGET", "3")
    got_split = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=5, edges=df10).collect()
    }
    monkeypatch.delenv("SPARK_GRAFT_WEDGE_BUDGET")
    got_reuse = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=5, edges=df10).collect()
    }
    assert got_split == got_reuse == _python_ktruss(k10, 5)
