"""Delta-iteration label propagation (r11, VERDICT r10 next #1):
bit-identical to the fixed-round synchronous form on the real
co-purchase graph and on constructed graphs that exercise the
frontier machinery (partial change, early fixpoint, tie-breaks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _histogram(df):
    return sorted(
        (r["community"], r["n_parts"], r["min_part"]) for r in df.collect()
    )


def test_delta_matches_bounded_on_fixture(spark, snaps):
    from kafka_overwatch_spark.operators.graph import (
        copurchase_edges,
        label_propagation_bounded,
        label_propagation_delta,
    )

    li = spark.table("lineitem")
    edges = copurchase_edges(li).localCheckpoint(eager=True)
    want = _histogram(label_propagation_bounded(li, edges=edges))
    got = _histogram(label_propagation_delta(li, edges=edges))
    assert got == want
    assert len(got) > 0


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "part_a long, part_b long, weight long"
    )


@pytest.mark.parametrize(
    "pairs",
    [
        # two triangles joined by a bridge: labels churn then settle
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
        # path graph: sync LPA oscillates — fixed rounds must truncate
        # identically in both forms (no early-exit shortcut may fire)
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        # star: hub adopts min leaf label round 1, leaves adopt hub
        [(10, i) for i in range(1, 8)],
        # clique: converges round 1 → delta's fixpoint break must
        # still match the bounded form's remaining no-op rounds
        [(a, b) for a in range(1, 6) for b in range(a + 1, 6)],
    ],
)
def test_delta_matches_bounded_constructed(spark, pairs):
    from kafka_overwatch_spark.operators.graph import (
        label_propagation_bounded,
        label_propagation_delta,
    )

    edges = _edges_df(spark, pairs).localCheckpoint(eager=True)
    want = _histogram(label_propagation_bounded(None, edges=edges))
    got = _histogram(label_propagation_delta(None, edges=edges))
    assert got == want


def test_vote_argmax_radix_survives_big_labels(spark):
    """r10 advisor: the old 2^32 radix silently corrupted ties and
    decoded labels once label >= 2^32 (TPC-H partkey at sf >= ~21500).
    The 2^63 radix must pick highest-count-then-smallest-label for
    labels far above 2^32."""
    from kafka_overwatch_spark.operators.graph import _vote_argmax

    big = 2**40 + 7
    bigger = 2**45 + 1
    votes = spark.createDataFrame(
        [
            (1, big, 3),
            (1, bigger, 3),  # tie on count -> smaller label wins
            (1, 5, 2),  # higher label count loses to cnt=3
            (2, bigger, 1),
        ],
        "v long, label long, cnt long",
    )
    got = {r["v"]: r["label"] for r in _vote_argmax(votes).collect()}
    assert got == {1: big, 2: bigger}


def test_delta_counts_branch_matches(spark, monkeypatch):
    """Force the >_LPA_ONEPASS_LIMIT mode-aggregate branch (count +
    encoded-max) at fixture scale: output must be identical to the
    default one-shuffle run-length form."""
    from kafka_overwatch_spark.operators import graph

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = _edges_df(spark, pairs).localCheckpoint(eager=True)
    want = _histogram(graph.label_propagation_delta(None, edges=edges))
    monkeypatch.setattr(graph, "_LPA_ONEPASS_LIMIT", 0)
    got = _histogram(graph.label_propagation_delta(None, edges=edges))
    assert got == want


def test_modularity_two_cliques_exact(spark):
    """Two disjoint triangles: LPA finds both; Q = 1 − 2·(6²)/(4·6²)
    = 0.5 exactly (m=6, intra=6, each community degree mass 6)."""
    from kafka_overwatch_spark.operators import graph

    pairs = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)]
    edges = _edges_df(spark, pairs).localCheckpoint(eager=True)
    state = graph.lpa_graph_state(edges)
    r = graph.modularity_lpa(state).collect()[0]
    assert (r["n_communities"], r["n_edges"], r["intra_edges"]) == (
        2, 6, 6,
    )
    assert r["modularity"] == 0.5


def test_modularity_matches_python(spark):
    """Q recomputed in python from the SAME labels must match on a
    bridged two-triangle graph (whatever communities LPA lands on)."""
    from kafka_overwatch_spark.operators import graph

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = _edges_df(spark, pairs).localCheckpoint(eager=True)
    state = graph.lpa_graph_state(edges)
    labels = {
        r["v"]: r["label"]
        for r in graph.lpa_labels_delta(None, graph_state=state).collect()
    }
    m = len(pairs)
    intra = sum(1 for a, b in pairs if labels[a] == labels[b])
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    deg_c: dict = {}
    for v, d in deg.items():
        deg_c[labels[v]] = deg_c.get(labels[v], 0) + d
    want = round(
        intra / m - sum(x * x for x in deg_c.values()) / (4.0 * m * m), 6
    )
    r = graph.modularity_lpa(state).collect()[0]
    assert r["modularity"] == want
    assert r["n_communities"] == len(set(labels.values()))


def test_assortativity_star_and_clique(spark):
    """A star is maximally disassortative; adding the full clique on
    its leaves raises r; a clique alone has zero degree variance
    (NULL)."""
    from kafka_overwatch_spark.operators import graph

    star = _edges_df(spark, [(10, i) for i in range(1, 6)])
    r = graph.assortativity(star).collect()[0]
    assert r["n_edges"] == 5 and r["assortativity"] == -1.0
    clique = _edges_df(
        spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    )
    rc = graph.assortativity(clique).collect()[0]
    assert rc["assortativity"] is None  # regular graph: zero variance


def test_assortativity_matches_python(spark):
    import math

    from kafka_overwatch_spark.operators import graph

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = _edges_df(spark, pairs)
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    want = round(
        (n * sxy - sx * sy)
        / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        6,
    )
    r = graph.assortativity(edges).collect()[0]
    assert r["assortativity"] == want


def test_modularity_shared_labels_equals_recompute(spark):
    """The r12 label-frame memo (registry.get_lpa_labels): modularity
    scored on a precomputed (v, label) frame must equal the
    self-computed form bit-for-bit — the sharing is a cost move, never
    a semantics one."""
    from kafka_overwatch_spark.operators.graph import (
        copurchase_edges,
        lpa_graph_state,
        lpa_labels_delta,
        modularity_lpa,
    )

    lineitem = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    )
    edges = copurchase_edges(lineitem).localCheckpoint(eager=True)
    state = lpa_graph_state(edges)
    labels = lpa_labels_delta(None, graph_state=state)
    a = modularity_lpa(state, labels=labels).collect()
    b = modularity_lpa(state).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
