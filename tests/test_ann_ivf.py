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


def test_kmeans_cluster_summary_invariants(spark, emb):
    """Clustering rollup: sizes partition the corpus, cohesion is a
    valid cosine, mean ≥ min per cell, cell count ≤ k."""
    from kafka_overwatch_spark.pipelines.similarity import (
        kmeans_cluster_summary,
    )

    rows = kmeans_cluster_summary(emb, n_cells=16).collect()
    assert 0 < len(rows) <= 16
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert -1.0 <= r["min_cos_to_centroid"] <= r["mean_cos_to_centroid"] <= 1.0


def test_kmeans_cluster_summary_deterministic(spark, emb):
    """Seeded trainer + seeded init ⇒ identical rollup across runs (the
    rows-only gate relies on run-to-run stability)."""
    from kafka_overwatch_spark.pipelines.similarity import (
        kmeans_cluster_summary,
    )

    a = sorted(map(tuple, kmeans_cluster_summary(emb).collect()))
    b = sorted(map(tuple, kmeans_cluster_summary(emb).collect()))
    assert a == b


def test_pq_codes_shape_and_determinism(spark, emb):
    """Every vector gets exactly one packed code; codes are a pure
    function of the corpus (partitioning-invariant)."""
    from kafka_overwatch_spark.pipelines.similarity import (
        PQ_M,
        pq_encode,
        pq_train,
    )

    cb = pq_train(emb)
    a = {r["vec_id"]: r["code"] for r in pq_encode(emb, cb).collect()}
    b = {
        r["vec_id"]: r["code"]
        for r in pq_encode(emb.repartition(7), cb).collect()
    }
    assert a == b and len(a) == emb.count()
    # every 8-bit lane stays in range (packing is lossless)
    for code in a.values():
        for i in range(PQ_M):
            assert 0 <= (code >> (8 * i)) & 0xFF <= 255


def test_pq_topk_recall_vs_brute_force(spark, emb):
    """ADC shortlist + exact rerank must recover most of the true top-5
    (measured 0.98 at fixture scale; gate at 0.7 for headroom)."""
    from kafka_overwatch_spark.pipelines.similarity import (
        ann_pq_topk,
        brute_force_topk_vectorized,
        pq_encode,
        pq_train,
    )

    cb = pq_train(emb)
    codes = pq_encode(emb, cb)
    exact = _topk_sets(brute_force_topk_vectorized(emb).collect())
    approx = _topk_sets(ann_pq_topk(emb, codebooks=cb, codes=codes).collect())
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_reconstruction_beats_grand_mean(spark, emb):
    """The trained codebooks must actually fit the distribution:
    per-subspace reconstruction MSE well under the variance around the
    grand mean (the k=1 codebook)."""
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import EMB_DIM, pq_train

    cb = pq_train(emb)
    m, k, sub = cb.shape
    rows = emb.select("embedding").collect()
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    for i in range(m):
        block = mat[:, i * sub : (i + 1) * sub]
        d2 = (
            (block * block).sum(1, keepdims=True)
            - 2.0 * (block @ cb[i].T)
            + (cb[i] * cb[i]).sum(1)
        )
        mse = d2.min(1).mean()
        base = ((block - block.mean(0)) ** 2).sum(1).mean()
        assert mse < 0.5 * base, (i, mse, base)


def test_ivfpq_recall_and_full_probe_equivalence(spark, emb):
    """IVF-PQ composes both approximations: recall stays useful at the
    default probe depth, and probing EVERY cell must reproduce the
    PQ-only result exactly (the IVF stage only prunes candidates — with
    nothing pruned, the pipelines are the same algorithm)."""
    from kafka_overwatch_spark.pipelines.similarity import (
        ann_ivfpq_topk,
        ann_pq_topk,
        brute_force_topk_vectorized,
        ivf_index,
        pq_encode,
        pq_train,
    )

    model, assigned = ivf_index(emb)
    cb = pq_train(emb)
    codes = pq_encode(emb, cb)
    trained = (model, assigned)
    exact = _topk_sets(brute_force_topk_vectorized(emb).collect())
    approx = _topk_sets(
        ann_ivfpq_topk(
            emb, trained=trained, codebooks=cb, codes=codes
        ).collect()
    )
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    full_probe = sorted(
        tuple(r)
        for r in ann_ivfpq_topk(
            emb, n_probe=16, trained=trained, codebooks=cb, codes=codes
        ).collect()
    )
    pq_only = sorted(
        tuple(r)
        for r in ann_pq_topk(emb, codebooks=cb, codes=codes).collect()
    )
    assert full_probe == pq_only


def test_residual_ivfpq_parity_with_plain(spark, emb):
    """Residual IVF-PQ (codes on v − cell_mean, score = q·mean + ADC)
    must hold recall parity with the plain variant on this corpus. The
    fixture embeddings are near-isotropic (cell means have norm ~0.27,
    residual norm ~0.96 of raw), so the residual trick has almost no
    variance to remove — parity, not gain, is the correct expectation
    here; the machinery (means, residual codebooks, two-term ADC) is
    what this test locks."""
    from kafka_overwatch_spark.pipelines.similarity import (
        ann_ivfpq_residual_topk,
        ann_ivfpq_topk,
        brute_force_topk_vectorized,
        ivf_index,
        pq_encode,
        pq_encode_residual,
        pq_train,
        pq_train_residual,
    )

    trained = ivf_index(emb)
    exact = _topk_sets(brute_force_topk_vectorized(emb).collect())

    def recall(rows):
        ap = _topk_sets(rows)
        return sum(
            len(exact[q] & ap.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)

    plain = recall(
        ann_ivfpq_topk(
            emb, trained=trained, codebooks=pq_train(emb),
            codes=pq_encode(emb, pq_train(emb)),
        ).collect()
    )
    cb_r = pq_train_residual(emb, trained)
    resid = recall(
        ann_ivfpq_residual_topk(
            emb, trained=trained, codebooks=cb_r,
            codes=pq_encode_residual(emb, trained, cb_r),
        ).collect()
    )
    assert resid >= plain - 0.15, (resid, plain)
    assert resid >= 0.5
