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


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "part_a long, part_b long, weight long",
    )


def test_rich_club_matches_python(spark):
    """φ(k) on a clique-plus-pendants graph must equal the hand
    formula at every derived decile k, including the histogram-rank
    ladder derivation itself."""
    import itertools

    from kafka_overwatch_spark.operators.graph import rich_club

    k6 = list(itertools.combinations(range(1, 7), 2))
    pendants = [(i, 100 + i) for i in range(1, 7)]
    pairs = k6 + pendants
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n = len(deg)
    sdeg = sorted(deg.values())
    ladder = []
    for q in range(1, 10):
        v = sdeg[(q * n + 9) // 10 - 1]
        if v not in ladder:
            ladder.append(v)
    rows = rich_club(None, edges=_edges_df(spark, pairs)).collect()
    got = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"]) for r in rows}
    assert sorted(got) == sorted(ladder)
    for k in ladder:
        rich = {v for v, d in deg.items() if d > k}
        e_k = sum(1 for a, b in pairs if a in rich and b in rich)
        phi = (
            round(2.0 * e_k / (len(rich) * (len(rich) - 1)), 6)
            if len(rich) >= 2
            else None
        )
        assert got[k] == (len(rich), e_k, phi), k


def test_cliffs_delta_matches_brute_force(spark):
    """δ against the O(n²) definition on a small two-type frame with
    ties across and within groups."""
    from kafka_overwatch_spark.operators.relational import (
        cliffs_delta_values,
    )

    a_vals = [1.0, 2.0, 2.0, 3.0, 7.0]
    b_vals = [2.0, 4.0, 4.0, 5.0]
    rows = [
        (i, "2024-01-01 00:00:00", 1, "aa", v, "{}")
        for i, v in enumerate(a_vals)
    ] + [
        (100 + i, "2024-01-01 00:00:00", 2, "bb", v, "{}")
        for i, v in enumerate(b_vals)
    ]
    df = spark.createDataFrame(
        [(e, __import__("datetime").datetime(2024, 1, 1), u, t, v, p)
         for e, _, u, t, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    gt = sum(1 for x in a_vals for y in b_vals if x > y)
    lt = sum(1 for x in a_vals for y in b_vals if x < y)
    want = round((gt - lt) / (len(a_vals) * len(b_vals)), 6)
    r = cliffs_delta_values(df).collect()
    assert len(r) == 1
    assert (r[0]["type_a"], r[0]["type_b"]) == ("aa", "bb")
    assert (r[0]["n_a"], r[0]["n_b"]) == (5, 4)
    assert r[0]["cliffs_delta"] == want


def test_ktruss_packed_closure_identical(spark):
    """packed_closure is a PHYSICAL strategy switch (one-long closure
    key, shuffle_hash, no candidate sort) — the output must be
    bit-identical to the two-column-key form."""
    import itertools

    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k5 = list(itertools.combinations(range(1, 6), 2))
    edges = k5 + [(10, 11), (11, 12), (10, 12), (5, 20)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    a = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=5, edges=df).collect()
    }
    b = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(
            None, k=5, edges=df, packed_closure=True
        ).collect()
    }
    assert a == b and set(a) == set(k5)


def test_ktruss_wedge_budget_guard(spark):
    """A budget implying more than 64 sub-jobs raises BEFORE any
    triangle work with the measured mass in the message; a generous
    budget is a plain single-pass no-op."""
    import itertools

    import pytest as _pytest

    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k10 = list(itertools.combinations(range(1, 11), 2))  # 120 wedges
    df10 = spark.createDataFrame(k10, EDGE_SCHEMA_KT)
    with _pytest.raises(RuntimeError, match="sub-jobs"):
        ktruss_bounded(None, k=5, edges=df10, wedge_budget=1).collect()
    k5 = list(itertools.combinations(range(1, 6), 2))
    df = spark.createDataFrame(k5, EDGE_SCHEMA_KT)
    ok = ktruss_bounded(
        None, k=5, edges=df, wedge_budget=10_000
    ).count()
    assert ok == 10


def test_ktruss_root_split_support_exact(spark):
    """Budget-decomposed support (root-bucket sub-jobs) must equal the
    single-pass computation exactly, and ktruss under a tiny budget
    must match the python peel — the decomposition is a physical
    execution choice, never a semantics one."""
    import itertools

    from kafka_overwatch_spark.operators.graph import (
        _edge_support,
        ktruss_bounded,
    )

    k5 = list(itertools.combinations(range(1, 6), 2))
    edges = k5 + [(10, 11), (11, 12), (10, 12), (5, 20), (2, 20)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    base = {
        (r.part_a, r.part_b): r.support
        for r in _edge_support(df).collect()
    }
    split = {
        (r.part_a, r.part_b): r.support
        for r in _edge_support(df, wedge_budget=2).collect()
    }
    assert base == split and len(base) > 0
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(
            None, k=5, edges=df, wedge_budget=2
        ).collect()
    }
    assert got == _python_ktruss(edges, 5)


def test_posting_verify_equals_array_verify(spark):
    """The postings-count verify must emit EXACTLY the array_intersect
    verify's rows (same pairs, same round-6 containment) on a real
    corpus slice in both cap modes — it is a physical verify strategy,
    not a semantics change."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import (
        screen_containment_against_corpus,
        shingle_docs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = shingle_docs(docs.filter(F.col("doc_id") < 300))
    batch = shingle_docs(docs.filter(F.col("doc_id") >= 300))

    def rows(**kw):
        return sorted(
            (r.new_doc, r.corpus_doc, r.containment)
            for r in screen_containment_against_corpus(
                batch, corpus, threshold=0.5, **kw
            ).collect()
        )

    for cap in (None, 10_000):
        a = rows(max_bucket=cap)
        b = rows(max_bucket=cap, posting_verify=True)
        assert a == b, (cap, len(a), len(b))
    assert len(rows(max_bucket=None)) > 0  # the fixture actually hits


def test_ktruss_pre_enumerated_tri_identical(spark):
    """r14 opt: passing a pre-enumerated triangle frame (the registry's
    get_triangles memo) must be output-identical to in-query
    enumeration — the memo IS triangles(cur) when the edge list is
    already a<b distinct (the copurchase invariant)."""
    import itertools

    from kafka_overwatch_spark.operators.graph import (
        ktruss_bounded,
        triangles,
    )

    k5 = list(itertools.combinations(range(1, 6), 2))
    edges = k5 + [(10, 11), (11, 12), (10, 12), (5, 20), (12, 21)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    tri = triangles(None, edges=df)
    base = sorted(
        (r.part_a, r.part_b, r.support)
        for r in ktruss_bounded(None, edges=df).collect()
    )
    with_tri = sorted(
        (r.part_a, r.part_b, r.support)
        for r in ktruss_bounded(None, edges=df, tri=tri).collect()
    )
    assert with_tri == base
