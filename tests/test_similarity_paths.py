"""The two physical implementations of embedding similarity — the
deterministic DataFrame fold and the Arrow GEMM — must produce identical
results (they share one oracle)."""

from __future__ import annotations


def test_fold_and_gemm_neardup_agree(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import (
        COSINE_THRESHOLD,
        embedding_neardup_pairs,
    )
    from kafka_overwatch_spark.pipelines.similarity import (
        embedding_neardup_pairs_vectorized,
    )

    emb = spark.table("embeddings")
    fold = sorted(tuple(r) for r in embedding_neardup_pairs(emb).collect())
    gemm = sorted(
        tuple(r)
        for r in embedding_neardup_pairs_vectorized(
            emb, COSINE_THRESHOLD
        ).collect()
    )
    assert fold == gemm


def test_lsh_neardup_subset_of_bruteforce(spark, snaps):
    """The registered LSH near-dup surface has perfect precision (every
    pair it emits is a true ≥-threshold pair) and bounded recall loss at
    the threshold boundary — measured, not assumed."""
    from kafka_overwatch_spark.pipelines.dedup import (
        COSINE_THRESHOLD,
        embedding_neardup_pairs,
    )
    from kafka_overwatch_spark.pipelines.similarity import (
        embedding_neardup_pairs_lsh,
    )

    emb = spark.table("embeddings")
    truth = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs(emb).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs_lsh(emb, COSINE_THRESHOLD).collect()
    }
    # precision 1.0: LSH ⊆ brute force, identical cosines
    for pair, cos in lsh.items():
        assert pair in truth and truth[pair] == cos
    # recall floor at the s-curve boundary (all fixture pairs sit in
    # [0.4, 0.5) — theory gives ~18-25% for 8 tables × 8 bits there;
    # high-cosine true dups would be found with ≥98% probability)
    assert len(lsh) / len(truth) > 0.10


def test_ngram_lsh_route_equals_allpairs_verifier(spark, snaps):
    """The registered dedup_ngram_jaccard surface (r=1 minhash-band
    candidates → exact Jaccard verify) must produce EXACTLY the rows of
    the guarded all-pairs verifier on the fixture corpus: precision is
    structural (every emitted pair is exactly verified) and the fixture's
    ≥0.35 pairs all survive the 1−(1−s)^12 candidate s-curve."""
    from kafka_overwatch_spark.pipelines.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_lsh,
    )

    docs = spark.table("documents")
    allpairs = sorted(tuple(r) for r in ngram_jaccard_pairs(docs).collect())
    lsh = sorted(tuple(r) for r in ngram_jaccard_pairs_lsh(docs).collect())
    assert lsh == allpairs
    assert len(allpairs) > 0  # fixture must exercise the surface


def test_quadratic_guard_raises(spark, snaps):
    from kafka_overwatch_spark.pipelines.dedup import (
        embedding_neardup_pairs,
        ngram_jaccard_pairs,
    )
    import pytest

    emb = spark.table("embeddings")
    docs = spark.table("documents")
    with pytest.raises(ValueError, match="quadratic"):
        embedding_neardup_pairs(emb, max_rows=10)
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(docs, max_rows=10)


def test_fold_and_gemm_topk_agree(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    emb = spark.table("embeddings")
    fold = sorted(tuple(r) for r in brute_force_topk(emb).collect())
    gemm = sorted(tuple(r) for r in brute_force_topk_vectorized(emb).collect())
    assert fold == gemm


def test_quantize_int8_reconstruction(spark):
    """Known-vector quantization: codes, witness hash, and error bound."""
    import hashlib
    import math

    from kafka_overwatch_spark.pipelines.similarity import quantize_int8

    vec = [1.0, -0.5, 0.25, 0.0]
    df = spark.createDataFrame([(1, vec, 0)], ["vec_id", "embedding", "label"])
    row = quantize_int8(df).collect()[0]
    scale = 1.0 / 127
    codes = [127, -64, 32, 0]  # round(v/scale) clamped
    assert row["scale"] == round(scale, 6)
    assert row["code_sum"] == sum(codes)
    assert row["codes_md5"] == hashlib.md5(
        ",".join(str(c) for c in codes).encode()
    ).hexdigest()
    recon = [c * scale for c in codes]
    err = math.sqrt(sum((v - r) ** 2 for v, r in zip(vec, recon)))
    norm = math.sqrt(sum(v * v for v in vec))
    assert row["rel_error"] == round(err / norm, 6)
    # int8 quantization of a unit-range vector keeps relative L2 error small
    assert row["rel_error"] < 0.005


def test_quantized_ann_recall(spark, snaps):
    """Top-k ANN over int8-dequantized vectors recovers the exact top-k
    almost perfectly — the measured evidence that the 4× storage shrink
    does not cost retrieval quality (row in ANN_TRADEOFFS.md)."""
    from kafka_overwatch_spark.pipelines.similarity import (
        brute_force_topk_vectorized,
        dequantize_int8,
    )

    emb = spark.table("embeddings")
    exact = {}
    for r in brute_force_topk_vectorized(emb).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    quant = {}
    for r in brute_force_topk_vectorized(dequantize_int8(emb)).collect():
        quant.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(exact) == set(quant)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.9, f"quantized recall@5 = {recall}"


def test_containment_prefix_route_equals_allpairs(spark, snaps):
    """The registered dedup_containment surface (pigeonhole prefix
    filter, recall 1.0 by construction) must equal the quadratic
    verifier exactly on the fixture corpus."""
    from kafka_overwatch_spark.pipelines.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )
    docs = spark.table("documents")
    allpairs = sorted(tuple(r) for r in containment_pairs(docs).collect())
    routed = sorted(
        tuple(r) for r in containment_pairs_prefix(docs).collect()
    )
    assert routed == allpairs


def test_containment_finds_asymmetric_pairs_jaccard_misses(spark):
    """The op's reason to exist: a short doc quoted wholesale inside a
    much longer one (containment 1.0, jaccard << threshold) must be
    found — including at partial containment just above the 0.8
    threshold — and sub-threshold pairs must not."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import (
        containment_pairs_prefix,
        ngram_jaccard_pairs,
    )

    long_text = " ".join(f"w{j} q{j}x z{j}y" for j in range(40))  # 120 toks
    short_full = " ".join(long_text.split()[:20])  # fully contained
    # partial: 20 contained tokens + 3 novel → shingles ~0.85 contained
    short_part = short_full + " nov1 nov2 nov3"
    # below threshold: 10 contained + 10 novel
    short_low = " ".join(long_text.split()[:10]) + " " + " ".join(
        f"nv{j}" for j in range(10)
    )
    docs = spark.createDataFrame(
        [
            (1, long_text, "en"),
            (2, short_full, "en"),
            (3, short_part, "en"),
            (4, short_low, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs_prefix(docs).collect()
    }
    assert got.get((2, 1)) == 1.0
    assert (3, 1) in got and got[(3, 1)] >= 0.8
    assert (4, 1) not in got
    # and jaccard at its own threshold misses the fully-contained pair
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs).collect()
    }
    assert (2, 1) not in jac and (1, 2) not in jac


def test_containment_probe_audit_counts_at_risk_docs(spark):
    """ADVICE r6: capped-bucket recall loss must be observable. With a
    cap small enough that the shared boilerplate shingles exceed it,
    docs built ENTIRELY of boilerplate (every probe capped) must be
    counted at risk; docs with enough rare shingles must not be. On the
    same corpus with the default cap, at-risk is zero."""
    from kafka_overwatch_spark.pipelines.dedup import (
        containment_pairs_prefix,
        containment_probe_audit,
    )

    boiler = "copy right all rights reserved by the site owner today"
    docs = spark.createDataFrame(
        [(i, boiler, "en") for i in range(8)]
        + [(100 + i, boiler + f" unique{i} tail{i} words{i}", "en") for i in range(3)],
        "doc_id long, text string, lang string",
    )
    audit = containment_probe_audit(docs, max_bucket=5).collect()[0]
    assert audit["docs_total"] == 11
    # the 8 pure-boilerplate docs have no uncapped shingle to probe
    assert audit["docs_at_risk"] == 8
    relaxed = containment_probe_audit(docs, max_bucket=10_000).collect()[0]
    assert relaxed["docs_at_risk"] == 0
    # and the audit's risk signal is real: the tiny cap does lose pairs
    # the default cap finds, all anchored on the at-risk docs
    full = containment_pairs_prefix(docs).count()
    capped = containment_pairs_prefix(docs, max_bucket=5).count()
    assert full > 0 and capped < full


def test_pca_whiten_covariance_is_identity(spark):
    """The whitened corpus must have (near-)identity sample covariance —
    the defining property of ZCA — and zero mean."""
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import pca_whiten
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = pca_whiten(emb).collect()
    Y = np.array([list(r.white) for r in rows])
    assert abs(Y.mean(axis=0)).max() < 1e-3
    cov = np.cov(Y, rowvar=False, bias=True)
    assert np.abs(cov - np.eye(Y.shape[1])).max() < 1e-2
    for r in rows:
        assert abs(r.white_norm - float(np.linalg.norm(r.white))) < 1e-4


def test_pca_whiten_matches_pure_numpy(spark):
    """Distributed moment pass + projection == single-process numpy ZCA
    on the collected matrix (round-6 agreement, the op's contract)."""
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import (
        WHITEN_EPS,
        pca_whiten,
    )
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r.vec_id: np.array(list(r.white))
        for r in pca_whiten(emb).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, bias=True)
    lam, V = np.linalg.eigh((cov + cov.T) / 2.0)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + WHITEN_EPS)) @ V.T
    want = np.round((X - mean) @ W.T, 6)
    for i, vid in enumerate(ids):
        assert np.abs(got[vid] - want[i]).max() < 2e-5, vid


def test_label_centroids_beat_chance_and_match_self_fit(spark, snaps):
    """Rocchio self-classification: on a corpus whose labels carry ANY
    geometric signal, nearest-own-centroid accuracy beats the 1/|labels|
    chance floor; and on a perfectly separated synthetic set it is
    exact."""
    from kafka_overwatch_spark.pipelines.similarity import (
        label_centroid_classify,
    )

    out = label_centroid_classify(spark.table("embeddings")).collect()
    n_labels = len({r["label"] for r in out})
    acc = sum(r["correct"] for r in out) / len(out)
    assert acc > 1.5 / n_labels

    # separable witness: axis-aligned one-hot clusters → accuracy 1.0
    rows = [
        (int(lab * 10 + i), [0.0] * 64, int(lab))
        for lab in range(3)
        for i in range(4)
    ]
    for lab in range(3):
        for i in range(4):
            rows[lab * 4 + i][1][lab] = 1.0 + 0.1 * i
    synth = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sout = label_centroid_classify(synth).collect()
    assert all(r["correct"] for r in sout)


def test_kcenter_matches_numpy_greedy(spark, snaps):
    """k-center greedy == the numpy reference fold (same seed, same
    rounded cosine distances, same tie order), radii monotone
    non-increasing, picks distinct."""
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import kcenter_select

    emb = spark.table("embeddings")
    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.collect()
    )
    ids = np.array([r[0] for r in rows])
    X = np.stack([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    k = 16
    picked = [0]  # index of min vec_id (rows sorted)
    mind = np.full(len(ids), np.inf)
    want = [(1, int(ids[0]), None)]
    for step in range(2, k + 1):
        d = np.round(1.0 - Xn @ Xn[picked[-1]], 6)
        mind = np.minimum(mind, d)
        mind[picked] = -np.inf  # picked rows leave the race
        far = int(np.lexsort((ids, -mind))[0])
        want.append((step, int(ids[far]), float(mind[far])))
        picked.append(far)

    got = [
        (r["pick_order"], r["vec_id"], r["radius"])
        for r in kcenter_select(emb, k=k).orderBy("pick_order").collect()
    ]
    assert got == want
    radii = [r[2] for r in got[1:]]
    assert radii == sorted(radii, reverse=True)
    assert len({r[1] for r in got}) == k


def test_shuffle_partitions_auto_fallback(spark):
    """ADVICE r7: spark.sql.shuffle.partitions is the string "auto" on
    AQE-managed platforms (local Spark refuses to SET it, so stub the
    conf); the helper must fall back to defaultParallelism instead of
    raising ValueError inside lsh_neighbor_pairs_vectorized et al."""
    from types import SimpleNamespace

    from kafka_overwatch_spark.pipelines.util import shuffle_partitions

    fake = SimpleNamespace(
        conf=SimpleNamespace(get=lambda k: "auto"),
        sparkContext=SimpleNamespace(defaultParallelism=7),
    )
    assert shuffle_partitions(fake) == 7
    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
