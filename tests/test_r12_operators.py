"""Round-12 operators: density-adaptive LSH width selection for the
embedding near-dup family (VERDICT r11 next #1) and the adaptive
containment levers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _unit(i: int, dim: int = 64) -> list[float]:
    v = [0.0] * dim
    v[i % dim] = 1.0
    return v


def test_frontier_picks_coarsest_within_budget(spark):
    """A spread-out corpus collides rarely: every ladder width is
    within budget, so the coarsest (8, highest recall) must win."""
    from kafka_overwatch_spark.pipelines.similarity import (
        NEARDUP_BITS_LADDER,
        neardup_bits_frontier,
    )

    rows = [(i, _unit(i)) for i in range(64)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = {r["bits"]: r for r in neardup_bits_frontier(df).collect()}
    assert set(out) == set(NEARDUP_BITS_LADDER)
    assert all(r["within_budget"] for r in out.values())
    assert out[min(NEARDUP_BITS_LADDER)]["chosen"]
    assert sum(r["chosen"] for r in out.values()) == 1


def test_frontier_falls_back_to_finest_when_nothing_affordable(spark):
    """600 identical vectors: one bucket per table at EVERY width, so
    mass = tables·C(600,2) blows the 256/vec budget everywhere — the
    honest fallback is the finest width, flagged not-within-budget."""
    from kafka_overwatch_spark.pipelines.similarity import (
        NEARDUP_BITS_LADDER,
        choose_neardup_bits,
        neardup_bits_frontier,
    )

    rows = [(i, _unit(0)) for i in range(600)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = {r["bits"]: r for r in neardup_bits_frontier(df).collect()}
    assert not any(r["within_budget"] for r in out.values())
    assert out[max(NEARDUP_BITS_LADDER)]["chosen"]
    assert choose_neardup_bits(df) == max(NEARDUP_BITS_LADDER)


def test_choose_bits_empty_corpus_defaults_coarsest(spark):
    from kafka_overwatch_spark.pipelines.similarity import (
        NEARDUP_BITS_LADDER,
        choose_neardup_bits,
    )

    df = spark.createDataFrame([], EMB_SCHEMA)
    assert choose_neardup_bits(df) == min(NEARDUP_BITS_LADDER)


def test_adaptive_pairs_subset_of_brute_force(spark):
    """LSH at ANY chosen width can only miss pairs, never invent them:
    the adaptive path's output must be a subset of the exact all-pairs
    verifier at the same threshold, with identical cosines on the
    intersection."""
    from kafka_overwatch_spark.pipelines.similarity import (
        choose_neardup_bits,
        embedding_neardup_pairs_lsh,
        embedding_neardup_pairs_vectorized,
    )

    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)])
            for i in range(40)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    bits = choose_neardup_bits(df)
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs_lsh(df, 0.4, bits=bits).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs_vectorized(df, 0.4).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v
