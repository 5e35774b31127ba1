"""IVF ANN: recall against exact brute-force top-k, and probe-count
sensitivity (more probes ⇒ recall can only improve)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def emb(spark, snaps):
    return spark.table("embeddings")


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, emb):
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk_vectorized,
        ivf_topk,
    )

    exact = _topk_sets(brute_force_topk_vectorized(emb).collect())
    approx = _topk_sets(ivf_topk(emb, n_cells=16, n_probe=6).collect())
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_more_probes_more_candidates(spark, emb):
    from kafka_overwatch_spark.pipelines.similarity import ivf_topk

    few = ivf_topk(emb, n_cells=16, n_probe=1).collect()
    many = ivf_topk(emb, n_cells=16, n_probe=16).collect()
    # probing every cell IS the exact search
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk_vectorized,
    )

    exact = _topk_sets(brute_force_topk_vectorized(emb).collect())
    assert _topk_sets(many) == exact
    # fewer probes returns a subset of ranked candidates per query
    assert len(few) <= len(many)
