"""r11 distributed PCA: Gram-reduce + driver eigh must match a full
in-memory numpy PCA, recover a planted dominant direction, and keep the
EVR ledger coherent."""

from __future__ import annotations

import numpy as np


def _emb_df(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(arr)],
        "vec_id long, embedding array<float>, label int",
    )


def test_pca_matches_numpy_and_finds_planted_axis(spark):
    from kafka_overwatch_spark.pipelines.similarity import pca_components

    rng = np.random.default_rng(7)
    dim, n = 16, 400
    axis = np.zeros(dim)
    axis[3] = 1.0
    # dominant direction along e3 + small isotropic noise
    data = (
        rng.normal(0, 5.0, size=(n, 1)) * axis
        + rng.normal(0, 0.3, size=(n, dim))
    ).astype(np.float32)
    got = {
        r["component"]: r
        for r in pca_components(_emb_df(spark, data), 4).collect()
    }
    # numpy reference on the same float32-rounded data
    x = data.astype(np.float64)
    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    for rank in (1, 2, 3, 4):
        i = order[rank - 1]
        assert abs(got[rank]["eigenvalue"] - w[i]) < 1e-4
        dot = abs(float(np.dot(got[rank]["loading"], v[:, i])))
        assert dot > 0.999, (rank, dot)
    # PC1 is the planted axis and dominates the spectrum
    assert abs(got[1]["loading"][3]) > 0.99
    assert got[1]["explained_variance_ratio"] > 0.9
    # sign pin: the largest-|loading| coordinate is positive
    for r in got.values():
        ld = r["loading"]
        assert ld[int(np.argmax(np.abs(ld)))] > 0
    # EVR ledger: cumulative is the running sum (round-6 grain)
    assert got[2]["cumulative_evr"] == round(
        got[1]["explained_variance_ratio"]
        + got[2]["explained_variance_ratio"],
        6,
    ) or abs(
        got[2]["cumulative_evr"]
        - got[1]["explained_variance_ratio"]
        - got[2]["explained_variance_ratio"]
    ) < 2e-6


def test_pca_on_fixture_embeddings(spark):
    from kafka_overwatch_spark.pipelines.similarity import pca_components

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pca_components(emb, 8).collect()
    assert len(rows) == 8
    evr = [r["explained_variance_ratio"] for r in rows]
    assert evr == sorted(evr, reverse=True)
    assert all(len(r["loading"]) == 64 for r in rows)
    # unit-norm loadings
    for r in rows:
        assert abs(float(np.linalg.norm(r["loading"])) - 1.0) < 1e-9
