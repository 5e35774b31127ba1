"""Connected-components semantic dedup: label propagation reaches the
true components (checked against a Python union-find) and the keep set is
one keeper per component."""

from __future__ import annotations


def _union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_components_match_union_find(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import COSINE_THRESHOLD, neardup_components
    from kafka_overwatch_spark.pipelines.similarity import (
        embedding_neardup_pairs_vectorized,
    )

    emb = spark.table("embeddings")
    pairs_df = embedding_neardup_pairs_vectorized(emb, COSINE_THRESHOLD)
    pairs = [(r["vec_a"], r["vec_b"]) for r in pairs_df.collect()]
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = _union_find(ids, pairs)
    got = {
        r["vec_id"]: r["component"]
        for r in neardup_components(pairs_df, emb.select("vec_id")).collect()
    }
    assert got == want
    assert len(set(want.values())) < len(ids)  # some non-trivial clusters


def test_semantic_dedup_keep_set(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import embedding_semantic_dedup

    emb = spark.table("embeddings")
    out = embedding_semantic_dedup(emb).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1
        assert keepers[0]["vec_id"] == comp == min(m["vec_id"] for m in members)


def test_long_chain_converges_via_pointer_doubling(spark):
    """A 40-node path graph (diameter 39) must converge inside the default
    iteration budget — the pointer-doubling shortcut gives O(log d)
    rounds where plain min-label propagation needs d."""
    from kafka_overwatch_spark.pipelines.dedup import neardup_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "vec_a long, vec_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    got = {
        r["vec_id"]: r["component"]
        for r in neardup_components(pairs, ids).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_non_convergence_raises(spark):
    """Exhausting the iteration budget with labels still moving must raise,
    not silently return split components."""
    import pytest

    from kafka_overwatch_spark.pipelines.dedup import neardup_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "vec_a long, vec_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        # driver_max_edges=0 forces the distributed loop (the fast
        # path would solve this 12-node path exactly without ever
        # touching the iteration budget)
        neardup_components(pairs, ids, max_iterations=1, driver_max_edges=0)


def test_curate_semantic_subset_of_curate(spark, snaps):
    """The semantic stage only ever REMOVES documents from the curated
    set, and removes exactly the non-keepers of the embedding component
    structure."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.curation import (
        curate,
        curate_semantic,
    )
    from kafka_overwatch_spark.pipelines.dedup import (
        embedding_semantic_dedup,
    )

    docs = spark.table("documents")
    emb = spark.table("embeddings")
    base = {r["doc_id"] for r in curate(docs).collect()}
    sem = {r["doc_id"] for r in curate_semantic(docs, emb).collect()}
    keep = {
        r["vec_id"]
        for r in embedding_semantic_dedup(emb).filter(F.col("keep")).collect()
    }
    assert sem <= base
    assert sem == base & keep
    assert len(sem) > 0


def test_minhash_fuzzy_dedup_matches_union_find(spark, snaps):
    """Text fuzzy dedup clusters == python union-find over the verified
    LSH pairs, and every document (including shingle-less ones) appears
    exactly once with component-min keeper semantics."""
    from kafka_overwatch_spark.pipelines.dedup import (
        minhash_fuzzy_dedup,
        minhash_lsh_pairs,
    )

    docs = spark.table("documents")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    ]
    assert pairs  # fixture has true near-dup text pairs
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = _union_find(ids, pairs)
    rows = minhash_fuzzy_dedup(docs).collect()
    got = {r["doc_id"]: r["cluster"] for r in rows}
    assert got == want
    assert len(rows) == len(ids)  # total: every doc decided
    for r in rows:
        assert r["keep"] == (r["doc_id"] == r["cluster"])


def test_driver_fast_path_matches_distributed_loop(spark):
    """The r9 small-graph union-find fast path must label identically
    to the distributed pointer-doubling loop on the same graph."""
    import random

    from kafka_overwatch_spark.pipelines.dedup import neardup_components

    rng = random.Random(9)
    n = 60
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(45)
        }
    )
    pairs = spark.createDataFrame(edges, "vec_a long, vec_b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    fast = {
        r["vec_id"]: r["component"]
        for r in neardup_components(pairs, ids).collect()
    }
    dist = {
        r["vec_id"]: r["component"]
        for r in neardup_components(
            pairs, ids, driver_max_edges=0
        ).collect()
    }
    assert fast == dist
    # min-label convention: every component labels by its min member
    for v, c in fast.items():
        assert c <= v
