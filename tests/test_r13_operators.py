"""Round-13 regression tests.

ADVICE r12 (medium): the containment family's pigeonhole probe budget
and PPJoin length filter were computed in IEEE doubles —
floor((1.0-0.8)*n_sh)+1 under-budgets every doc whose shingle count is
a multiple of 5, and n_b >= 0.8*n_a drops the exact-boundary pair
|B| = t*|A|.  Both bounds are now exact integer arithmetic
(dedup._probe_budget / dedup._length_ok); these tests plant the precise
boundary corpus the double forms provably lose.
"""
from __future__ import annotations

import pytest


def _boundary_docs(spark):
    """doc 1: 7 tokens -> 5 shingles; doc 2: its last 6 tokens ->
    4 shingles, all contained in doc 1.  containment(1->2) = 4/5 = 0.8
    EXACTLY, and |B| = 4 = 0.8*5 exactly — the pair sits on both the
    probe-budget boundary (floor(0.19999…*5)=0 vs exact 1) and the
    length-filter boundary (4 < 0.8000…444*5 in doubles)."""
    a = "t1 t2 t3 t4 t5 t6 t7"
    b = "t2 t3 t4 t5 t6 t7"
    return spark.createDataFrame(
        [(1, a, "en"), (2, b, "en")],
        "doc_id long, text string, lang string",
    )


def test_probe_budget_exact_at_multiple_of_denominator(spark):
    """A 5-shingle doc must get TWO probes at t=0.8 (n − ⌈t·n⌉ + 1),
    not the one probe the double floor(0.19999…*5)+1 allowed."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import (
        containment_probes_rarest,
        shingle_docs,
    )

    docs = shingle_docs(_boundary_docs(spark))
    per_doc = (
        containment_probes_rarest(docs)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_probes"))
        .collect()
    )
    got = {r.doc_id: r.n_probes for r in per_doc}
    assert got[1] == 2  # n_sh=5: 5 - ceil(4) + 1 = 2
    assert got[2] == 1  # n_sh=4: 4 - ceil(3.2) + 1 = 1


def test_containment_boundary_pair_survives_prefix_and_adaptive(spark):
    """containment exactly 0.8 with |B| = t*|A| must be found by BOTH
    registered candidate routes and agree with the brute-force
    verifier (the DuckDB oracle's shape)."""
    from kafka_overwatch_spark.pipelines.dedup import (
        containment_pairs,
        containment_pairs_adaptive,
        containment_pairs_prefix,
    )

    docs = _boundary_docs(spark)
    brute = sorted(tuple(r) for r in containment_pairs(docs).collect())
    assert ("en", 1, 2, 0.8) in brute  # the planted boundary pair
    prefix = sorted(
        tuple(r) for r in containment_pairs_prefix(docs).collect()
    )
    adaptive = sorted(
        tuple(r) for r in containment_pairs_adaptive(docs).collect()
    )
    assert prefix == brute
    assert adaptive == brute


def test_containment_screen_boundary_pair_both_modes(spark):
    """The ingest screen inherits the same exact bounds: a new doc
    contained at exactly t in a corpus doc must hit, in the capped
    AND the exact (max_bucket=None) modes."""
    from kafka_overwatch_spark.pipelines.dedup import (
        screen_containment_against_corpus,
        shingle_docs,
    )

    docs = _boundary_docs(spark)
    new = shingle_docs(docs.filter("doc_id = 1"))
    corpus = shingle_docs(docs.filter("doc_id = 2"))
    for max_bucket in (10_000, None):
        hits = {
            (r.new_doc, r.corpus_doc): r.containment
            for r in screen_containment_against_corpus(
                new, corpus, max_bucket=max_bucket
            ).collect()
        }
        assert hits.get((1, 2)) == 0.8, f"max_bucket={max_bucket}"


def test_threshold_rational_is_decimal_exact():
    from kafka_overwatch_spark.pipelines.dedup import threshold_rational

    assert threshold_rational(0.8) == (4, 5)
    assert threshold_rational(0.35) == (7, 20)
    assert threshold_rational(0.5) == (1, 2)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )


def test_containment_k_third_rung_on_ultra_dense_corpus(spark):
    """VERDICT r12 next #5: a corpus whose collision mass blows the
    budget at K=3 AND at K=5 must escalate to the third rung (K=7);
    the rung is the smallest MEASURED-fit, so the r12 dense fixture
    (3-word vocab, fits at 5) still stops at 5."""
    import random

    from kafka_overwatch_spark.pipelines.dedup import (
        CONTAINMENT_K_LADDER,
        choose_containment_k,
        shingle_docs,
    )

    assert CONTAINMENT_K_LADDER == (3, 5, 7)
    rng = random.Random(13)
    ultra = _docs(
        spark,
        [" ".join(rng.choice("a b".split()) for _ in range(30))
         for _ in range(300)],
    )
    assert (
        choose_containment_k(shingle_docs(ultra), ultra)
        == CONTAINMENT_K_LADDER[2]
    )
    rng = random.Random(7)
    dense = _docs(
        spark,
        [" ".join(rng.choice("a b c".split()) for _ in range(30))
         for _ in range(300)],
    )
    assert (
        choose_containment_k(shingle_docs(dense), dense)
        == CONTAINMENT_K_LADDER[1]
    )


def test_containment_adaptive_matches_brute_force_at_k7(spark):
    """When density forces the widest rung, the adaptive path must
    equal brute-force containment over K=7 shingles (recall 1.0 by
    construction at every rung)."""
    import random

    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import (
        containment_pairs_adaptive,
        shingle_docs,
    )

    rng = random.Random(13)
    texts = [" ".join(rng.choice("a b".split()) for _ in range(25))
             for _ in range(300)]
    texts[1] = texts[0]  # plant an exact clone pair
    docs_tbl = _docs(spark, texts)
    got = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs_adaptive(docs_tbl).collect()
    )
    wide = shingle_docs(docs_tbl, 7)
    a, b = wide.alias("a"), wide.alias("b")
    want = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size("a.sh"),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= 0.8)
        .collect()
    )
    assert got == want
    assert any(x[0] == 0 and x[1] == 1 for x in got)


def test_containment_screen_reads_index_shingle_width(spark, tmp_path):
    """r13: the growing containment screen must shingle batches at the
    width the index was seeded with (persisted in the index meta) — a
    wide-K index screened with K=3 batches would never match. Seed at
    K=5 with a dense corpus, stream a batch containing an exact clone
    of a corpus doc, and require the clone caught with containment 1.0
    while the fresh doc survives."""
    from kafka_overwatch_spark.pipelines.dedup import shingle_docs
    from kafka_overwatch_spark.streaming.documents_stream import (
        GrowingContainmentScreen,
        init_containment_index,
    )

    corpus_texts = [
        " ".join(f"w{j} x{j} y{j}" for j in range(10, 20)),
        " ".join(f"a{j} b{j} c{j}" for j in range(10, 20)),
    ]
    corpus = _docs(spark, corpus_texts)
    base = str(tmp_path / "index")
    init_containment_index(
        spark, shingle_docs(corpus, 5), base, shingle_k=5
    )
    # meta roundtrip: a screen built WITHOUT an explicit width reads 5
    screen = GrowingContainmentScreen(base, str(tmp_path / "out"))
    assert screen._index_k(spark) == 5
    batch = spark.createDataFrame(
        [
            (100, corpus_texts[0], "en"),  # exact clone → contained
            (101, " ".join(f"q{j} r{j} s{j}" for j in range(30)), "en"),
        ],
        "doc_id long, text string, lang string",
    )
    screen(batch, 0)
    rejected = {
        r.doc_id: r.reason
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert rejected.get(100) == "contained_in_corpus"
    assert 101 not in rejected
    # the survivor's shingles were appended AT THE INDEX WIDTH
    appended = (
        spark.read.parquet(f"{base}/shingles")
        .filter("batch_id = 0")
        .collect()
    )
    assert {r.doc_id for r in appended} == {101}
    shingle_len = len(appended[0].sh[0].split(" "))
    assert shingle_len == 5


EDGE_SCHEMA_KT = "part_a long, part_b long"


def _python_ktruss(edges, k):
    """Reference peel: per round, per-edge triangle support within the
    current set; drop < k-2; repeat to fixpoint."""
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


def test_ktruss_bounded_matches_python_reference(spark):
    """k=5 on K5 + a lone triangle + a pendant: the clique's 10 edges
    (support 3 each) survive, everything else peels — checked against
    a python reference peel."""
    import itertools

    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    k5 = list(itertools.combinations(range(1, 6), 2))
    extra = [(10, 11), (11, 12), (10, 12), (5, 20)]
    edges = k5 + extra
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=5, edges=df).collect()
    }
    want = _python_ktruss(edges, 5)
    assert got == want
    assert set(got) == set(k5) and all(v == 3 for v in got.values())


def test_ktruss_bounded_cascade_and_budget_raise(spark):
    """A 5-triangle strip erodes from both ends under k=4 — several
    cascade rounds to an EMPTY truss; a 1-round budget must RAISE, the
    default budget must converge and agree with the python peel."""
    import pytest as _pytest

    from kafka_overwatch_spark.operators.graph import ktruss_bounded

    edges = [(i, i + 1) for i in range(6)] + [(i, i + 2) for i in range(5)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA_KT)
    want = _python_ktruss(edges, 4)
    got = {
        (r.part_a, r.part_b): r.support
        for r in ktruss_bounded(None, k=4, edges=df).collect()
    }
    assert got == want == {}
    with _pytest.raises(RuntimeError, match="still peeling"):
        ktruss_bounded(None, k=4, rounds=1, edges=df).collect()

