"""Similarity search over an embedding column (`embeddings` table,
``array<float>``): brute-force cosine top-k baseline + an LSH-bucketed
scale path (BASELINE.json north star).

Scale design (100 TB of embeddings):

- Brute-force top-k is the correctness baseline: broadcast the (small)
  query set against the full corpus scan — one pass, no shuffle of the
  corpus, per-partition partial top-k folded by the final window. At
  1000 executors this is embarrassingly parallel; the window on
  (query_id) over candidates is bounded by k × partitions.
- The LSH path sketches every vector into a random-hyperplane sign
  bucket (hyperplane weights derived from md5 — deterministic, no
  stored model). Neighbor candidates share a bucket; recall is tuned by
  bits/tables. The bucketed self-join shuffles on the bucket key only.
- IVF (seeded pyspark.ml KMeans) probes the n_probe nearest cells per
  query; PQ packs each vector into one int64 of subspace codes scored
  by ADC table lookups + exact re-rank; the composed ann_ivfpq_topk
  (and its residual-encoding variant) is the trillion-vector
  architecture — see ANN_TRADEOFFS.md for measured recall/cost curves.

Cosines are double-precision with fixed fold order (see dedup.cosine) —
bit-stable vs the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import MAX_QUADRATIC_ROWS, _guard_quadratic, _hash64, cosine
from .util import shuffle_partitions, spread

LSH_BITS = 8  # 8 hyperplanes → 256 buckets
EMB_DIM = 64


def _plane_weight(p, d) -> F.Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]:
    md5-derived, identical on the oracle side."""
    h = _hash64(
        F.concat(
            F.lit("plane:"),
            p.cast("string"),
            F.lit(":"),
            d.cast("string"),
        )
    )
    return (h % 2001 - 1000).cast("double") / 1000.0


def lsh_bucket(emb: F.Column, bits: int = LSH_BITS) -> F.Column:
    """Random-hyperplane sign sketch: bit p = (emb · plane_p) > 0."""
    bucket = F.lit(0)
    for p in range(bits):
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
                    lambda d: _plane_weight(F.lit(p), d),
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket.cast("long")


def brute_force_topk(
    embeddings: DataFrame, query_ids: tuple[int, ...] = tuple(range(10)), k: int = 5
) -> DataFrame:
    """Exact cosine top-k per query vector (excluding self). Ranking on
    round(cosine, 6) with vec_id tie-break — fully deterministic."""
    queries = embeddings.filter(
        F.col("vec_id").isin(*query_ids)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    scored = (
        embeddings.repartition(par)
        .select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("emb"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def lsh_bucket_assignments(embeddings: DataFrame, bits: int = LSH_BITS) -> DataFrame:
    """The ANN index structure: vec_id → hyperplane sign bucket."""
    return embeddings.select(
        "vec_id", lsh_bucket(F.col("embedding"), bits).alias("bucket")
    )


def lsh_neighbor_pairs(
    embeddings: DataFrame, threshold: float = 0.3, bits: int = LSH_BITS
) -> DataFrame:
    """LSH-accelerated neighbor pairs: candidates share a sign bucket,
    verified by exact cosine ≥ threshold. The scale path — the self-join
    shuffles on bucket only (256 buckets here; at 100 TB use 16-24 bits
    plus multiple tables for recall)."""
    tagged = spread(embeddings).select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), bits).alias("bucket")
    )
    a = tagged.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = tagged.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "bucket",
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Vectorized (Arrow + numpy) brute-force paths.
#
# The pure-DataFrame fold above is the cross-engine-deterministic baseline,
# but Spark evaluates higher-order-function lambdas interpreted per element
# — ~200 boxed ops per pair. For the quadratic verifier the right physical
# shape is a block matrix multiply: broadcast the (normalized) corpus
# matrix, stream the other side through mapInPandas, and let numpy do a
# dgemm per Arrow batch. Measured ~30× over the fold at sf0.1.
#
# At 100 TB the broadcast side no longer fits — the same mapInPandas body
# then runs per (LSH bucket | IVF cell) with bucket-local matrices, which
# is exactly lsh_neighbor_pairs' join shape.
# ---------------------------------------------------------------------------

from typing import Iterator  # noqa: E402

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

def _spread_gemm(df: DataFrame) -> DataFrame:
    """Partitioning for GEMM mapInPandas stages: fewer, larger Arrow
    batches — dgemm throughput is batch-size-insensitive here, and each
    partition costs a Python worker (cold spawn ≈ 20 s under concurrent
    import load when workers were idle-reaped)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(min(sc.defaultParallelism, 8))


PAIR_SCHEMA = StructType(
    [
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cosine", DoubleType()),
    ]
)

TOPK_SCORE_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def _normalized_corpus(embeddings: DataFrame):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def embedding_neardup_pairs_vectorized(
    embeddings: DataFrame,
    threshold: float,
    max_rows: int | None = MAX_QUADRATIC_ROWS,
) -> DataFrame:
    """Block-GEMM near-dup pairs: same semantics as
    dedup.embedding_neardup_pairs, vectorized physical plan. SMALL-N
    VERIFIER ONLY: collects + broadcasts the full corpus matrix — the
    registered scale surface is embedding_neardup_pairs_lsh. Guarded:
    raises above ``max_rows`` input rows (None disables)."""
    _guard_quadratic(
        embeddings, "embedding_neardup_pairs_vectorized", max_rows
    )
    sc = embeddings.sparkSession.sparkContext
    ids, mat = _normalized_corpus(embeddings)
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mb = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            cos = np.round(mb @ all_mat.T, 6)
            ai, bj = np.nonzero(cos >= threshold)
            va, vb = bids[ai], all_ids[bj]
            mask = va < vb
            yield pd.DataFrame(
                {"vec_a": va[mask], "vec_b": vb[mask], "cosine": cos[ai, bj][mask]}
            )

    return _spread_gemm(embeddings.select("vec_id", "embedding")).mapInPandas(
        block, PAIR_SCHEMA
    )


def brute_force_topk_vectorized(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
) -> DataFrame:
    """Vectorized exact top-k: scores from the block GEMM, final top-k via
    the same deterministic window (round-6 cosine, vec_id tie-break)."""
    sc = embeddings.sparkSession.sparkContext
    q = embeddings.filter(F.col("vec_id").isin(*query_ids))
    qids, qmat = _normalized_corpus(q)
    b_qids, b_qmat = sc.broadcast(qids), sc.broadcast(qmat)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_qids, all_qmat = b_qids.value, b_qmat.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mb = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            cos = np.round(mb @ all_qmat.T, 6)  # n_corpus × n_queries
            n, nq = cos.shape
            qi = np.repeat(all_qids[np.newaxis, :], n, axis=0).ravel()
            vi = np.repeat(bids[:, np.newaxis], nq, axis=1).ravel()
            flat = cos.ravel()
            mask = qi != vi
            yield pd.DataFrame(
                {"query_id": qi[mask], "vec_id": vi[mask], "cosine": flat[mask]}
            )

    scored = _spread_gemm(embeddings.select("vec_id", "embedding")).mapInPandas(
        block, TOPK_SCORE_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
        )
    )


def _plane_matrix(n_planes: int = LSH_BITS, dim: int = EMB_DIM) -> np.ndarray:
    """The hyperplane weights computed in pure Python — EXACTLY the
    @HASH64-derived values the SQL path and the DuckDB oracle use
    (first 15 hex chars of md5 → int), so buckets agree bit-for-bit.
    Plane ids extend past LSH_BITS for multi-table LSH: table t uses
    planes t*bits .. t*bits+bits-1 (table 0 ≡ the single-table scheme)."""
    import hashlib

    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(
                hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:15], 16
            )
            w[p, d] = (h % 2001 - 1000) / 1000.0
    return w


BUCKET_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("bucket", LongType())]
)


def lsh_bucket_assignments_vectorized(
    embeddings: DataFrame, bits: int = LSH_BITS
) -> DataFrame:
    """Vectorized bucket assignment: one dgemm against the plane matrix
    per Arrow batch instead of bits×dim interpreted lambda ops per row."""
    sc = embeddings.sparkSession.sparkContext
    b_planes = sc.broadcast(_plane_matrix(bits, EMB_DIM))
    powers = np.power(2, np.arange(bits)).astype(np.int64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            signs = (m @ planes.T) > 0  # n×bits
            buckets = (signs * powers).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": ids, "bucket": buckets})

    return _spread_gemm(embeddings.select("vec_id", "embedding")).mapInPandas(
        assign, BUCKET_SCHEMA
    )


def lsh_neighbor_pairs_vectorized(
    embeddings: DataFrame, threshold: float = 0.3, bits: int = LSH_BITS
) -> DataFrame:
    """LSH pairs with vectorized bucket assignment + bucket-local GEMM
    verify at PARTITION grain (r7, mirroring the r6
    `embedding_neardup_pairs_lsh` fix): most buckets are singletons, and
    per-bucket ``applyInPandas`` pays a pandas invocation per bucket —
    partition-grain ``mapInPandas`` over bucket-sorted rows drops
    singletons wholesale and GEMMs only true collision groups. This is
    the shape that replaces the global broadcast at 100 TB."""
    sc = embeddings.sparkSession.sparkContext
    b_planes = sc.broadcast(_plane_matrix(bits, EMB_DIM))
    powers = np.power(2, np.arange(bits)).astype(np.int64)

    carry_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("bucket", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def assign_carry(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry the vectors WITH the assignment (same fusion as
        # embedding_neardup_pairs_lsh): the verify groupBy becomes the
        # only shuffle instead of assign→join-back→bucket exchange
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            signs = (m @ planes.T) > 0
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "bucket": (signs * powers).sum(axis=1).astype(np.int64),
                    "embedding": pdf["embedding"].to_numpy(),
                }
            )

    assigned = _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(assign_carry, carry_schema)

    out_schema = StructType(
        [
            StructField("bucket", LongType()),
            StructField("vec_a", LongType()),
            StructField("vec_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame | None:
        if len(pdf) < 2:
            return None
        bucket = int(pdf["bucket"].iloc[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(m @ m.T, 6)
        ai, bj = np.nonzero(cos >= threshold)
        mask = ids[ai] < ids[bj]
        if not mask.any():
            return None
        return pd.DataFrame(
            {
                "bucket": bucket,
                "vec_a": ids[ai][mask],
                "vec_b": ids[bj][mask],
                "cosine": cos[ai, bj][mask],
            }
        )

    def verify_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # rows arrive bucket-sorted within the partition; the trailing
        # (possibly batch-straddling) bucket is buffered until its key
        # changes, since Arrow batches split partitions at arbitrary
        # row boundaries
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if pdf.empty:
                continue
            tail = pdf["bucket"] == pdf["bucket"].iloc[-1]
            pending = pdf[tail]
            head = pdf[~tail]
            if head.empty:
                continue
            sizes = head.groupby("bucket")["vec_id"].transform("size")
            head = head[sizes >= 2]
            for _, grp in head.groupby("bucket", sort=False):
                out = _verify(grp)
                if out is not None:
                    yield out
        if pending is not None and len(pending) >= 2:
            out = _verify(pending)
            if out is not None:
                yield out

    n_part = shuffle_partitions(embeddings.sparkSession)
    return (
        assigned.repartition(n_part, "bucket")
        .sortWithinPartitions("bucket")
        .mapInPandas(verify_partition, out_schema)
    )


# ---------------------------------------------------------------------------
# Multi-table LSH near-dup — the REGISTERED embedding-dedup surface.
#
# Single-table sign-LSH at a 0.4 cosine threshold has poor recall (p_bit ≈
# 0.63 at the threshold boundary → p_bit^8 ≈ 2.5% per table); T independent
# tables raise recall to 1-(1-p^8)^T, and true near-dups (cosine ≥ 0.9,
# p_bit ≈ 0.9) are found with ≥ 98% probability at T=8. Crucially the
# physical plan never materializes the corpus on the driver: one GEMM
# against the broadcast 64×64 plane matrix assigns all table buckets,
# the shuffle is keyed on (table, bucket), and the quadratic verify runs
# only inside buckets. This is the plan that survives a 100× corpus.
# ---------------------------------------------------------------------------

NEARDUP_TABLES = 8


NEARDUP_BITS_LADDER = (8, 12, 16)
NEARDUP_CANDIDATE_BUDGET = 256  # candidate pairs per vector


def neardup_bits_frontier(
    embeddings: DataFrame,
    ladder: tuple[int, ...] = NEARDUP_BITS_LADDER,
    tables: int = NEARDUP_TABLES,
    budget_per_vec: int = NEARDUP_CANDIDATE_BUDGET,
) -> DataFrame:
    """Density-adaptive bit-width selection for the near-dup LSH index
    (VERDICT r11 next #1): measure the candidate mass Σ C(n_bucket, 2)
    each candidate width would induce and flag the width the engine
    picks — the COARSEST (fewest bits, highest recall) whose mass stays
    within ``budget_per_vec`` per vector, falling back to the finest
    width when nothing is affordable (an honest "this corpus is denser
    than any setting likes" answer). This turns the previously manual
    bits-retune lever (SCALE.md r11: embedding pairs grew 105× per 10×
    on the densified generator corpus) into a measured decision the
    registered path applies itself.

    Scale shape: ONE corpus scan (the shared sign GEMM of
    _family_bucket_frame — every width reads the same plane family, so
    a width-8 table is NOT a prefix of a width-12 one, exactly like the
    production index it predicts), one explode to (bits, tbl, bucket)
    rows (|ladder|·tables per vector), one count aggregate whose
    output is bounded by |ladder|·tables·2^max_bits distinct buckets,
    then a ladder-sized frame. No driver collect beyond the ladder
    rows. Output: bits, n_vecs, candidate_mass, mass_per_vec,
    within_budget, chosen."""
    fams = {b: tables for b in ladder}
    bks = _family_bucket_frame(embeddings, fams)
    def _tag(b: int):
        return lambda x, i: F.struct(
            F.lit(b).cast("long").alias("bits"),
            i.cast("long").alias("tbl"),
            x.alias("bucket"),
        )

    per_fam = [
        F.transform(F.col(f"bk{b}"), _tag(b)) for b in sorted(fams)
    ]
    exploded = bks.select(
        F.explode(F.flatten(F.array(*per_fam))).alias("e")
    ).select("e.bits", "e.tbl", "e.bucket")
    counts = exploded.groupBy("bits", "tbl", "bucket").agg(
        F.count("*").alias("n")
    )
    mass = counts.groupBy("bits").agg(
        F.sum(F.expr("(n * (n - 1)) div 2")).alias("candidate_mass")
    )
    nv = embeddings.agg(F.count("*").alias("n_vecs"))
    flags = mass.crossJoin(F.broadcast(nv)).withColumn(
        "within_budget",
        F.col("candidate_mass")
        <= F.lit(budget_per_vec) * F.col("n_vecs"),
    )
    # coarsest affordable width wins; nothing affordable → finest width
    pick = Window.orderBy(
        F.col("within_budget").desc(),
        F.when(F.col("within_budget"), F.col("bits"))
        .otherwise(-F.col("bits"))
        .asc(),
    )
    return (
        flags.withColumn("chosen", F.row_number().over(pick) == 1)
        .select(
            "bits",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("candidate_mass").cast("long").alias("candidate_mass"),
            F.round(
                F.col("candidate_mass").cast("double")
                / F.col("n_vecs").cast("double"),
                6,
            ).alias("mass_per_vec"),
            "within_budget",
            "chosen",
        )
        .orderBy("bits")
    )


def choose_neardup_bits(
    embeddings: DataFrame,
    ladder: tuple[int, ...] = NEARDUP_BITS_LADDER,
    tables: int = NEARDUP_TABLES,
    budget_per_vec: int = NEARDUP_CANDIDATE_BUDGET,
) -> int:
    """Collect the frontier's chosen width — the ladder-sized decision
    the registered near-dup path (and everything composing it) applies
    at plan-build time. Empty corpus → coarsest width (nothing to
    collide)."""
    rows = (
        neardup_bits_frontier(embeddings, ladder, tables, budget_per_vec)
        .filter(F.col("chosen"))
        .collect()
    )
    return int(rows[0]["bits"]) if rows else min(ladder)


def semantic_split_leakage(
    embeddings: DataFrame,
    threshold: float = 0.4,
    bits: int | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SEMANTIC train/eval split-leakage audit — the embedding twin of
    curation.split_leakage_audit: near-dup VECTOR pairs that cross the
    deterministic split boundary (an eval vector cosine-≥-threshold
    close to a train vector). N-gram contamination checks miss
    paraphrases; this is the eval-integrity check over the embedding
    modality, run before trusting any benchmark number.

    Composition of the engine's own primitives: the density-adaptive
    multi-table LSH pair graph (embedding_neardup_pairs_lsh at
    choose_neardup_bits' width — pass ``pairs``/``bits`` when holding
    the memoized artifacts) + sampling.hash_bucket/split_expr on
    vec_id (doc_id == vec_id is the fixture convention). Candidate
    recall is the pair graph's — reported by ann_neardup_frontier /
    lsh_recall_audit, never silently assumed. Scale shape: the split
    tag is a narrow md5 projection; two keyed joins attach it to the
    pair frame (pairs ≪ corpus). Output: eval_vec, eval_split,
    train_vec, cosine."""
    from .sampling import hash_bucket, split_expr

    if pairs is None:
        if bits is None:
            bits = choose_neardup_bits(embeddings)
        pairs = embedding_neardup_pairs_lsh(
            embeddings, threshold, bits=bits
        )
    sp = embeddings.select(
        "vec_id",
        split_expr(hash_bucket(F.col("vec_id"), "split")).alias("split"),
    )
    sa = sp.select(
        F.col("vec_id").alias("vec_a"), F.col("split").alias("split_a")
    )
    sb = sp.select(
        F.col("vec_id").alias("vec_b"), F.col("split").alias("split_b")
    )
    a_train = F.col("split_a") == "train"
    b_train = F.col("split_b") == "train"
    return (
        pairs.join(sa, "vec_a")
        .join(sb, "vec_b")
        .filter(a_train != b_train)
        .select(
            F.when(a_train, F.col("vec_b"))
            .otherwise(F.col("vec_a"))
            .alias("eval_vec"),
            F.when(a_train, F.col("split_b"))
            .otherwise(F.col("split_a"))
            .alias("eval_split"),
            F.when(a_train, F.col("vec_a"))
            .otherwise(F.col("vec_b"))
            .alias("train_vec"),
            "cosine",
        )
    )


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    bits: int = LSH_BITS,
    tables: int = NEARDUP_TABLES,
) -> DataFrame:
    """Bucket-local embedding near-dup pairs (vec_a, vec_b, cosine):
    multi-table random-hyperplane LSH candidates, exact cosine verify per
    bucket, DISTINCT across tables. No driver-side corpus collect —
    contrast embedding_neardup_pairs_vectorized (all-pairs verifier,
    small-N only)."""
    sc = embeddings.sparkSession.sparkContext
    b_planes = sc.broadcast(_plane_matrix(bits * tables, EMB_DIM))
    powers = np.power(2, np.arange(bits)).astype(np.int64)

    assign_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("tbl", LongType()),
            StructField("bucket", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the batch already holds the vectors — emit them WITH the bucket
        # assignment so the verify groupBy is the ONLY shuffle (the
        # previous assign→join-back plan re-shuffled every vector twice:
        # once for the id join, once for the bucket exchange)
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            signs = (m @ planes.T) > 0  # n × (tables*bits)
            frames = []
            for t in range(tables):
                chunk = signs[:, t * bits : (t + 1) * bits]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "tbl": np.full(len(ids), t, dtype=np.int64),
                            "bucket": (chunk * powers)
                            .sum(axis=1)
                            .astype(np.int64),
                            "embedding": pdf["embedding"].to_numpy(),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    assigned = _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(assign, assign_schema)

    def _verify_block(pdf: pd.DataFrame) -> pd.DataFrame | None:
        """Exact cosine verify of ONE bucket's rows."""
        if len(pdf) < 2:
            return None
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(m @ m.T, 6)
        ai, bj = np.nonzero(cos >= threshold)
        mask = ids[ai] < ids[bj]
        if not mask.any():
            return None
        return pd.DataFrame(
            {
                "vec_a": ids[ai][mask],
                "vec_b": ids[bj][mask],
                "cosine": cos[ai, bj][mask],
            }
        )

    def verify_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        """Bucket verify at PARTITION grain: most LSH buckets are
        singletons, and applyInPandas pays a pandas invocation per
        bucket — thousands of near-empty calls. Rows arrive sorted by
        (tbl, bucket) within the partition, so one python call can
        drop singleton buckets wholesale and GEMM only the true
        collision groups; the trailing (possibly batch-straddling)
        bucket is buffered until its key changes (Arrow batches split
        partitions at arbitrary row boundaries)."""
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if pdf.empty:
                continue
            last_tbl = pdf["tbl"].iloc[-1]
            last_bkt = pdf["bucket"].iloc[-1]
            tail = (pdf["tbl"] == last_tbl) & (pdf["bucket"] == last_bkt)
            pending = pdf[tail]
            head = pdf[~tail]
            if head.empty:
                continue
            sizes = head.groupby(["tbl", "bucket"])["vec_id"].transform(
                "size"
            )
            head = head[sizes >= 2]
            for _, grp in head.groupby(["tbl", "bucket"], sort=False):
                out = _verify_block(grp)
                if out is not None:
                    yield out
        if pending is not None and len(pending) >= 2:
            out = _verify_block(pending)
            if out is not None:
                yield out

    n_part = shuffle_partitions(embeddings.sparkSession)
    return (
        assigned.repartition(n_part, "tbl", "bucket")
        .sortWithinPartitions("tbl", "bucket")
        .mapInPandas(verify_partition, PAIR_SCHEMA)
        .distinct()
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-probing scale path.
#
# LSH above needs no training; IVF clusters the corpus (KMeans) and
# probes only the nearest n_probe cells per query. Join shape at 100 TB:
# assign (narrow map vs broadcast centroids) → shuffle on cell id →
# per-cell GEMM. Training samples the corpus; the model is tiny
# (n_cells × dim) and broadcast everywhere.
#
# Not oracle-checkable (KMeans is iterative) — tested by recall against
# the exact brute-force top-k (tests/test_ann_ivf.py).
# ---------------------------------------------------------------------------


def ivf_index(embeddings: DataFrame, n_cells: int = 16, seed: int = 42):
    """Train the coarse quantizer; returns (model, assignments df)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", F.col("prediction").cast("long").alias("cell")
    )
    return model, assigned


def _resolve_trained(
    trained: tuple | None, embeddings: DataFrame, n_cells: int, seed: int
) -> tuple:
    """A passed-in quantizer must actually have the requested geometry —
    silently probing 16 cells when the caller asked for 32 is the kind
    of wrong-but-plausible result a shared cache invites."""
    if trained is None:
        return ivf_index(embeddings, n_cells=n_cells, seed=seed)
    model = trained[0]
    got = len(model.clusterCenters())
    if got != n_cells:
        raise ValueError(
            f"trained quantizer has {got} cells but n_cells={n_cells}; "
            "train a matching model or drop the n_cells override"
        )
    return trained


def _normalized_centers(model) -> np.ndarray:
    """Unit-norm centroid matrix of a fitted KMeans model (shared by the
    probe path and the cluster rollup)."""
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    return centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    trained: tuple | None = None,
) -> DataFrame:
    """Approximate top-k: per query, search only the n_probe nearest
    cells. Returns query_id, vec_id, cosine, rank. Pass ``trained`` =
    (model, assignments) to reuse a quantizer trained once per corpus
    (registry.get_ivf) — training is the dominant cost and the model
    serves every probe depth and the cluster rollup alike."""
    model, assigned = _resolve_trained(trained, embeddings, n_cells, seed)
    centers_n = _normalized_centers(model)
    sc = embeddings.sparkSession.sparkContext

    # probe cells per query (queries are small: driver-side vs broadcast)
    q_rows = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        "vec_id", "embedding"
    ).collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    cell_sims = q_mat @ centers_n.T
    probes = np.argsort(-cell_sims, axis=1)[:, :n_probe]

    probe_rows = [
        (int(q_ids[i]), int(c)) for i in range(len(q_ids)) for c in probes[i]
    ]
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probe_rows, ["query_id", "cell"])

    b_qids, b_qmat = sc.broadcast(q_ids), sc.broadcast(q_mat)

    corpus = assigned.join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    ).join(F.broadcast(probe_df), "cell")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_qids, all_qmat = b_qids.value, b_qmat.value
        qpos = {int(q): i for i, q in enumerate(all_qids)}
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            rows_q = all_qmat[[qpos[int(q)] for q in qi]]
            cos = np.round((m * rows_q).sum(axis=1), 6)
            vid = pdf["vec_id"].to_numpy(dtype=np.int64)
            mask = vid != qi
            yield pd.DataFrame(
                {"query_id": qi[mask], "vec_id": vid[mask], "cosine": cos[mask]}
            )

    scored = corpus.mapInPandas(score, TOPK_SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
        )
    )


def kmeans_cluster_summary(
    embeddings: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    trained: tuple | None = None,
) -> DataFrame:
    """Embedding-space clustering rollup (the corpus-cartography /
    data-mixing pass): seeded KMeans cells with size and cohesion
    (mean cosine of members to their centroid) per cell.

    Scale shape: the model is tiny (n_cells × dim) and broadcast; member
    scoring is a narrow Arrow-batched map over the corpus; the rollup is
    one aggregation keyed by cell id. Reuses the IVF coarse quantizer —
    one trained model serves both ANN probing and cluster analytics.
    Rows-only gate (iterative trainer, no ANSI oracle); invariants
    (size total, cell count, cohesion range) are locked in tests."""
    model, assigned = _resolve_trained(trained, embeddings, n_cells, seed)
    centers_n = _normalized_centers(model)
    b_centers = embeddings.sparkSession.sparkContext.broadcast(centers_n)

    joined = assigned.join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cn = b_centers.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            m /= np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            cos = (m * cn[cells]).sum(axis=1)
            yield pd.DataFrame({"cell": cells, "cosine": cos})

    scored = joined.mapInPandas(score, "cell long, cosine double")
    return (
        scored.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg("cosine"), 6).alias("mean_cos_to_centroid"),
            F.round(F.min("cosine"), 6).alias("min_cos_to_centroid"),
        )
        .orderBy("cell")
    )


def _int8_codes() -> tuple[F.Column, F.Column, F.Column]:
    """The (x, scale, codes) expression chain of the symmetric int8
    format — ONE definition shared by the write path (`quantize_int8`)
    and the read path (`dequantize_int8`) so they cannot drift."""
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(x, F.abs)) / 127.0
    codes = F.transform(
        x,
        lambda v: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(v / scale).cast("int")),
        ),
    )
    return x, scale, codes


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage path for a
    100 TB embedding corpus (float32 → int8 is the standard 4× shrink
    before ANN indexing; reference has no analog, north-star extension).

    scale = max|x| / 127; code_i = clamp(round(x_i / scale), ±127).
    Emits the per-vector scale, an md5 witness over the exact code
    sequence (proves the codes, not just summary stats, match the
    oracle), the code sum, and the relative L2 reconstruction error.

    Scale shape: narrow per-row map over the embeddings scan (JVM array
    HOFs, no shuffle, no Python) — embarrassingly parallel at any scale.
    """
    x, scale, codes = _int8_codes()
    recon_sq = F.aggregate(
        F.zip_with(x, codes, lambda v, c: (v - c * scale) * (v - c * scale)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    norm_sq = F.aggregate(
        F.transform(x, lambda v: v * v), F.lit(0.0), lambda acc, e: acc + e
    )
    return spread(embeddings).select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        F.md5(F.array_join(codes, ",")).alias("codes_md5"),
        F.round(F.sqrt(recon_sq) / F.sqrt(norm_sq), 6).alias("rel_error"),
    )


def dequantize_int8(embeddings: DataFrame) -> DataFrame:
    """The read path of the int8 storage format: reconstruct
    ``codes × scale`` vectors with the same schema as the source
    embeddings table, so every downstream consumer (ANN, near-dup,
    semantic dedup) runs unchanged on quantized storage. Narrow JVM map,
    no shuffle."""
    _, scale, codes = _int8_codes()
    return embeddings.select(
        "vec_id",
        F.transform(codes, lambda c: (c * scale).cast("float")).alias(
            "embedding"
        ),
        "label",
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-side half of the 100 TB ANN story.
# IVF (above) prunes WHICH vectors a query scores; PQ shrinks WHAT is
# stored per vector — EMB_DIM float32s (256 B) become PQ_M 8-bit codes
# packed in one int64 (8 B, 32×), so a trillion-vector corpus's index fits
# the cluster's RAM and ADC scoring is table lookups instead of FLOPs.
# Codebooks train on a bounded deterministic sample (sample-training is
# how FAISS/ScaNN build PQ codebooks too — centroids are a distribution
# estimate, not a per-row artifact), then broadcast; encode is one
# narrow Arrow pass over the corpus.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces → 8 codes/vector
PQ_K = 256  # centroids per subspace → 8 bits/code, one packed int64
PQ_TRAIN_SAMPLE = 4096
PQ_SEED = 42


def _lloyd(X: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd k-means over a (bounded) training sample. Empty
    clusters re-seed from the farthest points so all k codes stay
    usable."""
    rng = np.random.RandomState(seed)
    k_eff = min(k, len(X))
    centers = X[rng.choice(len(X), size=k_eff, replace=False)].copy()
    for _ in range(iters):
        # n×k distances via |x|² - 2x·c + |c|² (no n×k×d intermediate)
        d2 = (
            (X * X).sum(1, keepdims=True)
            - 2.0 * (X @ centers.T)
            + (centers * centers).sum(1)
        )
        assign = d2.argmin(1)
        for j in range(k_eff):
            members = X[assign == j]
            if len(members):
                centers[j] = members.mean(0)
            else:
                centers[j] = X[d2.min(1).argmax()]
    if k_eff < k:
        centers = np.vstack([centers, np.repeat(centers[:1], k - k_eff, 0)])
    return centers


def pq_train(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    seed: int = PQ_SEED,
    sample: int = PQ_TRAIN_SAMPLE,
) -> np.ndarray:
    """Train PQ codebooks: (m, k, EMB_DIM//m). The training set is the
    ``sample`` vec_ids with the smallest md5 hash — deterministic across
    engines/partitionings (same argument as sampling.hash_bucket), and a
    BOUNDED driver collect (a distribution sample, never corpus-sized).
    Vectors are unit-normalized first so ADC dot-table sums approximate
    cosine directly."""
    if EMB_DIM % m:
        raise ValueError(f"EMB_DIM={EMB_DIM} not divisible by m={m}")
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.concat(F.lit("pq:"), F.col("vec_id").cast("string"))))
        .limit(sample)
        .collect()
    )
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sub = EMB_DIM // m
    return np.stack(
        [
            _lloyd(mat[:, i * sub : (i + 1) * sub], k, seed + i)
            for i in range(m)
        ]
    )


PQ_CODE_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("code", LongType())]
)


def pq_encode(
    embeddings: DataFrame, codebooks: np.ndarray | None = None
) -> DataFrame:
    """Encode every vector to its packed PQ code: per subspace, the
    nearest codebook centroid's index; indices packed little-endian into
    ONE int64 column (vec_id, code) — the whole ANN index is two longs
    per vector. One broadcast (the ~½ MB codebook tensor) + one narrow
    Arrow pass; nothing shuffles."""
    cb = pq_train(embeddings) if codebooks is None else codebooks
    m, k, sub = cb.shape
    sc = embeddings.sparkSession.sparkContext
    b_cb = sc.broadcast(cb)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_cb.value
        norms = [(c * c).sum(1) for c in books]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            packed = np.zeros(len(mat), dtype=np.int64)
            for i in range(m):
                block = mat[:, i * sub : (i + 1) * sub]
                # argmin over |c|² - 2x·c (|x|² constant per row)
                d2 = norms[i] - 2.0 * (block @ books[i].T)
                packed |= d2.argmin(1).astype(np.int64) << (8 * i)
            yield pd.DataFrame({"vec_id": ids, "code": packed})

    return _spread_gemm(embeddings.select("vec_id", "embedding")).mapInPandas(
        encode, PQ_CODE_SCHEMA
    )


def ann_pq_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    rerank: int = 4,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage PQ retrieval: (1) ADC — each query precomputes an
    (m × k) dot-lookup table against the codebooks, scans the CODES (8 B
    per corpus vector, not the raw 256 B), and shortlists rerank×k
    candidates by table-sum score; (2) exact re-rank — only the
    shortlist joins back to raw embeddings for true cosine. That join is
    the canonical retrieve-then-rerank shape: the expensive exact math
    touches k×rerank×|queries| rows regardless of corpus size. Output
    matches ivf_topk: (query_id, vec_id, cosine, rank), rows-only gate
    (trained codebooks); recall vs exact asserted in tests."""
    cb = pq_train(embeddings) if codebooks is None else codebooks
    coded = pq_encode(embeddings, cb) if codes is None else codes
    m, kk, sub = cb.shape
    sc = embeddings.sparkSession.sparkContext

    q_rows = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        "vec_id", "embedding"
    ).collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    # ADC tables: tables[q, i, j] = q_subᵢ · C[i, j]
    tables = np.stack(
        [q_mat[:, i * sub : (i + 1) * sub] @ cb[i].T for i in range(m)],
        axis=1,
    )
    b_q, b_t = sc.broadcast(q_ids), sc.broadcast(tables)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_t = b_q.value, b_t.value
        for pdf in batches:
            if pdf.empty:
                continue
            vid = pdf["vec_id"].to_numpy(dtype=np.int64)
            code = pdf["code"].to_numpy(dtype=np.int64)
            # unpack: n×m uint8 indices
            idx = np.stack(
                [(code >> (8 * i)) & 0xFF for i in range(m)], axis=1
            )
            for qi, qid in enumerate(all_q):
                # score = Σᵢ T[qi, i, idx[:, i]]
                score = all_t[qi][np.arange(m), idx].sum(axis=1)
                mask = vid != qid
                yield pd.DataFrame(
                    {
                        "query_id": np.full(mask.sum(), qid, dtype=np.int64),
                        "vec_id": vid[mask],
                        "cosine": np.round(score[mask], 6),
                    }
                )

    shortlisted = coded.mapInPandas(adc, TOPK_SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        shortlisted.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k * rerank)
        .select("query_id", "vec_id")
    )

    # exact re-rank of the tiny shortlist only
    b_qmat = sc.broadcast(q_mat)

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_qmat = b_q.value, b_qmat.value
        qpos = {int(q): i for i, q in enumerate(all_q)}
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            cos = np.round(
                (mat * all_qmat[[qpos[int(q)] for q in qi]]).sum(axis=1), 6
            )
            yield pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cosine": cos,
                }
            )

    reranked = (
        shortlist.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .mapInPandas(exact, TOPK_SCORE_SCHEMA)
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ann_ivfpq_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    n_probe: int = 8,
    rerank: int = 4,
    trained: tuple | None = None,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
    n_cells: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The full IVF-PQ pipeline — the canonical trillion-vector ANN
    architecture, composed from the two train-once halves: IVF prunes
    WHICH vectors each query scores (probe the n_probe nearest cells),
    ADC over PQ codes scores those cheaply (8 table lookups per vector
    against the 8-byte code table), and the exact re-rank touches only
    the rerank×k shortlist joined back to raw vectors.

    Per-query work is (corpus/cells)×n_probe code lookups + rerank×k
    exact cosines — BOTH terms independent of total corpus size once
    cells shard it; nothing here scans raw vectors except the bounded
    re-rank join. Rows-only gate (two trained models); recall vs exact
    + subset-consistency in tests/test_ann_ivf.py."""
    model, assigned = _resolve_trained(trained, embeddings, n_cells, seed)
    cb = pq_train(embeddings) if codebooks is None else codebooks
    coded = pq_encode(embeddings, cb) if codes is None else codes
    m, kk, sub = cb.shape
    sc = embeddings.sparkSession.sparkContext
    centers_n = _normalized_centers(model)

    q_rows = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        "vec_id", "embedding"
    ).collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(q_mat @ centers_n.T), axis=1)[:, :n_probe]
    probe_df = embeddings.sparkSession.createDataFrame(
        [
            (int(q_ids[i]), int(c))
            for i in range(len(q_ids))
            for c in probes[i]
        ],
        ["query_id", "cell"],
    )
    tables = np.stack(
        [q_mat[:, i * sub : (i + 1) * sub] @ cb[i].T for i in range(m)],
        axis=1,
    )
    b_q, b_t, b_qmat = (
        sc.broadcast(q_ids),
        sc.broadcast(tables),
        sc.broadcast(q_mat),
    )

    # candidate stream: codes of vectors in each query's probed cells
    cand = coded.join(assigned, "vec_id").join(
        F.broadcast(probe_df), "cell"
    )

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_t = b_q.value, b_t.value
        qpos = {int(q): i for i, q in enumerate(all_q)}
        for pdf in batches:
            if pdf.empty:
                continue
            vid = pdf["vec_id"].to_numpy(dtype=np.int64)
            code = pdf["code"].to_numpy(dtype=np.int64)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            idx = np.stack(
                [(code >> (8 * i)) & 0xFF for i in range(m)], axis=1
            )
            rows_t = all_t[[qpos[int(q)] for q in qi]]  # n×m×k
            score = rows_t[
                np.arange(len(vid))[:, None], np.arange(m)[None, :], idx
            ].sum(axis=1)
            mask = vid != qi
            yield pd.DataFrame(
                {
                    "query_id": qi[mask],
                    "vec_id": vid[mask],
                    "cosine": np.round(score[mask], 6),
                }
            )

    shortlisted = cand.mapInPandas(adc, TOPK_SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        shortlisted.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k * rerank)
        .select("query_id", "vec_id")
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_qmat = b_q.value, b_qmat.value
        qpos = {int(q): i for i, q in enumerate(all_q)}
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            cos = np.round(
                (mat * all_qmat[[qpos[int(q)] for q in qi]]).sum(axis=1), 6
            )
            yield pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cosine": cos,
                }
            )

    return (
        shortlist.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .mapInPandas(exact, TOPK_SCORE_SCHEMA)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ: the production refinement. Encoding raw vectors wastes
# PQ's 8 bytes re-describing WHICH REGION of space a vector sits in —
# information IVF's cell id already carries. Encoding the RESIDUAL
# (v_norm − centroid_norm[cell]) spends all 64 code bits on the
# within-cell offset, so the same 8 bytes describe a much smaller
# subspace: score(q, v) ≈ q·centroid[cell] (exact, tiny broadcast
# matrix) + q·residual_approx (ADC over residual codebooks).
# ---------------------------------------------------------------------------


def _raw_centers(model) -> np.ndarray:
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def cell_means(embeddings: DataFrame, assigned: DataFrame) -> np.ndarray:
    """Per-cell MEAN of the unit-normalized members — the correct
    residual origin in the scoring space. Subtracting the unit-NORMALIZED
    KMeans centroid instead inflates residuals (‖v−c‖ ≈ 1.2 for ‖v‖=1
    when cells barely concentrate); the cell mean is the least-squares
    origin by definition. Computed distributed (Summarizer.mean per
    cell) and collected at cells × dim size."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    vecs = embeddings.select("vec_id", "embedding").join(assigned, "vec_id")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    normed = vecs.select(
        "cell",
        array_to_vector(
            F.transform(
                "embedding", lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-12))
            )
        ).alias("v"),
    )
    rows = (
        normed.groupBy("cell")
        .agg(Summarizer.mean(F.col("v")).alias("mean"))
        .collect()
    )
    n_cells = max(r["cell"] for r in rows) + 1
    out = np.zeros((n_cells, EMB_DIM), dtype=np.float64)
    for r in rows:
        out[r["cell"]] = np.asarray(r["mean"])
    return out


def pq_train_residual(
    embeddings: DataFrame,
    trained: tuple,
    m: int = PQ_M,
    k: int = PQ_K,
    seed: int = PQ_SEED,
    sample: int = PQ_TRAIN_SAMPLE,
) -> np.ndarray:
    """Train PQ codebooks on IVF-cell residuals: the same bounded
    md5-ordered sample, each vector assigned to its nearest RAW KMeans
    center (mirroring the IVF assignment) and the residual taken in the
    normalized scoring space."""
    model = trained[0]
    raw_c = _raw_centers(model)
    norm_c = cell_means(embeddings, trained[1])
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.concat(F.lit("pq:"), F.col("vec_id").cast("string"))))
        .limit(sample)
        .collect()
    )
    raw = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    d2 = (
        (raw * raw).sum(1, keepdims=True)
        - 2.0 * (raw @ raw_c.T)
        + (raw_c * raw_c).sum(1)
    )
    cells = d2.argmin(1)
    mat = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
    resid = mat - norm_c[cells]
    sub = EMB_DIM // m
    return np.stack(
        [
            _lloyd(resid[:, i * sub : (i + 1) * sub], k, seed + i)
            for i in range(m)
        ]
    )


PQ_CELL_CODE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("cell", LongType()),
        StructField("code", LongType()),
    ]
)


def pq_encode_residual(
    embeddings: DataFrame, trained: tuple, codebooks: np.ndarray
) -> DataFrame:
    """Encode every vector's within-cell residual: (vec_id, cell, code)
    — still ~16 bytes/vector of index. One broadcast (centroids +
    codebooks), one narrow Arrow pass over the cell-joined corpus."""
    model, assigned = trained[0], trained[1]
    norm_c = cell_means(embeddings, assigned)
    m, k, sub = codebooks.shape
    sc = embeddings.sparkSession.sparkContext
    b_cb, b_nc = sc.broadcast(codebooks), sc.broadcast(norm_c)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books, centers = b_cb.value, b_nc.value
        norms = [(c * c).sum(1) for c in books]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            resid = mat - centers[cells]
            packed = np.zeros(len(mat), dtype=np.int64)
            for i in range(m):
                block = resid[:, i * sub : (i + 1) * sub]
                d2 = norms[i] - 2.0 * (block @ books[i].T)
                packed |= d2.argmin(1).astype(np.int64) << (8 * i)
            yield pd.DataFrame({"vec_id": ids, "cell": cells, "code": packed})

    corpus = embeddings.select("vec_id", "embedding").join(assigned, "vec_id")
    return _spread_gemm(corpus).mapInPandas(encode, PQ_CELL_CODE_SCHEMA)


def ann_ivfpq_residual_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    n_probe: int = 8,
    rerank: int = 4,
    trained: tuple | None = None,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
    n_cells: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Residual IVF-PQ retrieval: probe cells, ADC over RESIDUAL codes
    plus the exact q·centroid term, exact re-rank of the shortlist —
    same output contract as ann_ivfpq_topk; recall at equal bytes and
    probes is measured against the plain variant in tests."""
    model, assigned = _resolve_trained(trained, embeddings, n_cells, seed)
    cb = (
        pq_train_residual(embeddings, (model, assigned))
        if codebooks is None
        else codebooks
    )
    coded = (
        pq_encode_residual(embeddings, (model, assigned), cb)
        if codes is None
        else codes
    )
    m, kk, sub = cb.shape
    sc = embeddings.sparkSession.sparkContext
    norm_c = cell_means(embeddings, assigned)

    q_rows = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        "vec_id", "embedding"
    ).collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    cell_dots = q_mat @ norm_c.T  # nq × cells: the exact centroid term
    # probe ranking still uses the DIRECTIONAL centroids — q·cell_mean
    # under-ranks tight low-norm cells
    probes = np.argsort(-(q_mat @ _normalized_centers(model).T), axis=1)[
        :, :n_probe
    ]
    probe_df = embeddings.sparkSession.createDataFrame(
        [
            (int(q_ids[i]), int(c))
            for i in range(len(q_ids))
            for c in probes[i]
        ],
        ["query_id", "cell"],
    )
    tables = np.stack(
        [q_mat[:, i * sub : (i + 1) * sub] @ cb[i].T for i in range(m)],
        axis=1,
    )
    b_q, b_t, b_cd, b_qmat = (
        sc.broadcast(q_ids),
        sc.broadcast(tables),
        sc.broadcast(cell_dots),
        sc.broadcast(q_mat),
    )

    cand = coded.join(F.broadcast(probe_df), "cell")

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_t, all_cd = b_q.value, b_t.value, b_cd.value
        qpos = {int(q): i for i, q in enumerate(all_q)}
        for pdf in batches:
            if pdf.empty:
                continue
            vid = pdf["vec_id"].to_numpy(dtype=np.int64)
            code = pdf["code"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            qrow = np.array([qpos[int(q)] for q in qi])
            idx = np.stack(
                [(code >> (8 * i)) & 0xFF for i in range(m)], axis=1
            )
            resid_score = all_t[
                qrow[:, None], np.arange(m)[None, :], idx
            ].sum(axis=1)
            score = all_cd[qrow, cells] + resid_score
            mask = vid != qi
            yield pd.DataFrame(
                {
                    "query_id": qi[mask],
                    "vec_id": vid[mask],
                    "cosine": np.round(score[mask], 6),
                }
            )

    shortlisted = cand.mapInPandas(adc, TOPK_SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        shortlisted.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k * rerank)
        .select("query_id", "vec_id")
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_q, all_qmat = b_q.value, b_qmat.value
        qpos = {int(q): i for i, q in enumerate(all_q)}
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            qi = pdf["query_id"].to_numpy(dtype=np.int64)
            cos = np.round(
                (mat * all_qmat[[qpos[int(q)] for q in qi]]).sum(axis=1), 6
            )
            yield pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cosine": cos,
                }
            )

    return (
        shortlist.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .mapInPandas(exact, TOPK_SCORE_SCHEMA)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def split_centroid_drift(embeddings: DataFrame) -> DataFrame:
    """Embedding-space drift between deterministic train/val splits:
    per-dimension centroids of each split (posexplode → one (split,
    dim) aggregate) reduced to L2 distance and cosine between the two
    centroid vectors — the embedding-space analog of the PSI length
    drift gate (corpus_split_drift_psi). A healthy random split shows
    near-zero drift; a skewed assignment (time- or source-correlated)
    shows up immediately. All arithmetic is sum/count exact-order
    aggregation over identical doubles; the scalar division happens
    once at the end (round 6).

    At 100 TB: one narrow posexplode + ONE (split, dim)-keyed aggregate
    (dims are bounded: EMB_DIM cells), then a dim-sized reduction —
    no vector ever leaves its partition except as per-dim partial
    sums."""
    split = F.when(
        F.col("vec_id") % 10 < 8, F.lit("train")
    ).otherwise(F.lit("val"))
    per_dim = (
        embeddings.select(
            split.alias("split"),
            F.posexplode("embedding").alias("dim", "w"),
        )
        .groupBy("split", "dim")
        .agg(
            F.sum(F.col("w").cast("double")).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "split", "dim", (F.col("s") / F.col("n")).alias("mu")
        )
    )
    t = per_dim.filter(F.col("split") == "train").select(
        "dim", F.col("mu").alias("mu_t")
    )
    v = per_dim.filter(F.col("split") == "val").select(
        "dim", F.col("mu").alias("mu_v")
    )
    j = t.join(v, "dim")
    return j.agg(
        F.count("*").alias("dims"),
        F.round(
            F.sqrt(F.sum(F.pow(F.col("mu_t") - F.col("mu_v"), 2))), 6
        ).alias("l2_drift"),
        F.round(
            F.sum(F.col("mu_t") * F.col("mu_v"))
            / (
                F.sqrt(F.sum(F.pow("mu_t", 2)))
                * F.sqrt(F.sum(F.pow("mu_v", 2)))
            ),
            6,
        ).alias("centroid_cosine"),
    )


# ---------------------------------------------------------------------------
# ZCA whitening (r7): the standard embedding post-processing step before
# cosine retrieval / semantic dedup (decorrelates dimensions, equalizes
# variance — the isotropy fix the residual-PQ diagnosis in
# ANN_TRADEOFFS.md pointed at). Fit is a distributed moment pass with
# CONSTANT-size partial state; the d×d eigendecomposition is a driver
# epilogue (d = 64 — this never grows with the corpus).

WHITEN_EPS = 1e-6

_MOMENT_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("xtx", ArrayType(DoubleType())),
    ]
)

WHITEN_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("white", ArrayType(DoubleType())),
        StructField("white_norm", DoubleType()),
    ]
)


def pca_whiten_model(
    embeddings: DataFrame, eps: float = WHITEN_EPS
) -> tuple[np.ndarray, np.ndarray]:
    """Fit ZCA whitening W = V diag(1/√(λ+eps)) Vᵀ over the corpus
    covariance. ONE mapInPandas pass emits per-PARTITION moments
    (count, Σx, XᵀX — constant-size state, a numpy GEMM per Arrow
    batch); the collect is bounded by partition count; the eigh runs on
    the driver over a d×d matrix. ZCA's V…Vᵀ sandwich is
    eigenvector-SIGN-invariant, so the transform is deterministic
    across BLAS builds (plain PCA whitening V-only is not). Returns
    (mean[d], W[d,d])."""
    d = EMB_DIM

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        xtx = np.zeros((d, d))
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            n += X.shape[0]
            s += X.sum(axis=0)
            xtx += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
            )

    parts = (
        _spread_gemm(embeddings.select("embedding"))
        .mapInPandas(moments, _MOMENT_SCHEMA)
        .collect()  # bounded: ≤ one row per partition
    )
    if not parts:
        raise ValueError("pca_whiten_model: empty embeddings input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    xtx = np.sum(
        [np.array(r["xtx"]).reshape(d, d) for r in parts], axis=0
    )
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    lam, V = np.linalg.eigh((cov + cov.T) / 2.0)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)) @ V.T
    return mean, W


def pca_whiten(
    embeddings: DataFrame,
    eps: float = WHITEN_EPS,
    model: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Whitened embeddings: white = W(x − mean), plus the whitened L2
    norm as a scalar gate surface. Projection is a broadcast of the two
    small model arrays + one vectorized batch GEMM — the same physical
    shape as the int8 quantizer's read path. Values ROUNDED to 6: the
    eigh/GEMM pipeline is IEEE-order-sensitive beyond that. Pass a
    prefit ``model`` to apply train-once/project-many (the production
    path; registry memoizes it)."""
    if model is None:
        model = pca_whiten_model(embeddings, eps)
    mean, W = model
    sc = embeddings.sparkSession.sparkContext
    b_mean, b_w = sc.broadcast(mean), sc.broadcast(W)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, w = b_mean.value, b_w.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            Y = np.round((X - m) @ w.T, 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "white": list(Y.tolist()),
                    "white_norm": np.round(
                        np.linalg.norm(Y, axis=1), 6
                    ),
                }
            )

    return _spread_gemm(embeddings.select("vec_id", "embedding")).mapInPandas(
        project, WHITEN_SCHEMA
    )


# ---------------------------------------------------------------------------
# Supervised embedding surfaces (r7 continuation): nearest-label-centroid
# classification (Rocchio) and k-center greedy coreset selection.


def fit_label_centroids(embeddings: DataFrame) -> DataFrame:
    """The Rocchio model table: (label, c array<double>) — per-label
    per-dimension means, |labels| rows. The persistable
    train-once/serve-forever artifact (`sinks/layout.write_centroid_model`);
    the fit's only data-sized shuffle carries (label, dim) partial
    sums, never whole vectors."""
    per_dim = (
        embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "w")
        )
        .groupBy("label", "dim")
        .agg(
            F.sum(F.col("w").cast("double")).alias("s"),
            F.count("*").alias("n"),
        )
        .select("label", "dim", (F.col("s") / F.col("n")).alias("mu"))
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))),
            lambda x: x["mu"],
        ).alias("c")
    )


def label_centroid_classify(
    embeddings: DataFrame, centroids: DataFrame | None = None
) -> DataFrame:
    """Nearest-label-centroid (Rocchio) classification: per-label
    centroid = per-dimension mean over the label's vectors; every
    vector is assigned the label whose centroid has the highest cosine
    (rounded to 6; ties → largest label, the max-of-struct order,
    mirrored in the oracle). Centroids are fit on the FULL corpus
    (standard Rocchio — no leave-one-out), so self-classification
    accuracy is the optimistic fit diagnostic, and the production use
    is labeling UNLABELED vectors against centroids fit on a labeled
    set.

    Scale shape: one narrow posexplode into a (label, dim)-keyed
    aggregate — the only data-sized shuffle, carrying per-dim partial
    sums, never vectors — then the |labels| × dim centroid table
    (bounded: 10 × 64 doubles) collapses to ONE broadcast row and
    scoring is a shuffle-free narrow map folding the centroid array
    per vector (JVM higher-order functions, no Python). Pass a prefit
    ``centroids`` frame (fit_label_centroids / a persisted model read
    back via sinks/layout.read_centroid_model) to apply
    train-once/serve-many. Output: vec_id, label, predicted_label,
    cosine, correct."""
    e = embeddings.select("vec_id", "label", "embedding")
    cent = (
        fit_label_centroids(embeddings) if centroids is None else centroids
    )
    # all centroids in ONE row: array of (label, centroid) structs —
    # label-grain, bounded, the broadcastable model table
    cents = cent.agg(
        F.array_sort(F.collect_list(F.struct("label", "c"))).alias("cents")
    )
    top = F.array_max(
        F.transform(
            F.col("cents"),
            lambda x: F.struct(
                F.round(cosine(F.col("embedding"), x["c"]), 6).alias(
                    "cosine"
                ),
                x["label"].alias("predicted_label"),
            ),
        )
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", top.alias("top"))
        .select(
            "vec_id",
            "label",
            F.col("top.predicted_label").alias("predicted_label"),
            F.col("top.cosine").alias("cosine"),
            (F.col("top.predicted_label") == F.col("label")).alias(
                "correct"
            ),
        )
    )


def kcenter_select(embeddings: DataFrame, k: int = 16) -> DataFrame:
    """k-center greedy (Gonzalez farthest-point) coreset selection in
    cosine distance: start from the min vec_id, then k−1 times pick the
    vector farthest (max over the corpus of its min distance to the
    chosen set) and fold it in — the classic 2-approximation to the
    k-center objective, used for diversity-maximizing training-subset /
    eval-set selection (coreset papers; active-learning "core-set"
    selection).

    Output: one row per selected center — pick_order (1-based), vec_id,
    radius — where radius is the max-min-distance the pick covered (the
    monotone non-increasing k-center radius sequence; NULL for the
    seed pick). Distances are rounded to 6 before the argmax so the
    selection is stable across engines/partitionings; ties break to the
    smaller vec_id.

    Scale shape: a driver-paced loop of k iterations (inherent to the
    greedy — each pick depends on all previous), each iteration ONE
    narrow map over the corpus (update running min-distance against the
    single broadcast new center — vectors never shuffle) plus a
    TakeOrdered argmax (per-partition heaps, no global sort).
    localCheckpoint per iteration truncates the iterated lineage
    exactly like neardup_components. Iterative → rows-only gate;
    python/numpy greedy parity in tests/test_similarity_paths.py."""
    if k < 1:
        raise ValueError("k must be >= 1")
    state = (
        embeddings.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "emb"
            ),
            F.lit(None).cast("double").alias("mind"),
        )
        .localCheckpoint(eager=True)
    )
    seed_rows = state.orderBy("vec_id").limit(1).collect()
    if not seed_rows:  # empty corpus slice: nothing to select
        return embeddings.sparkSession.createDataFrame(
            [], "pick_order long, vec_id long, radius double"
        )
    seed = seed_rows[0]
    picks = [(1, seed["vec_id"], None)]
    center = seed["emb"]
    for i in range(2, k + 1):
        c = F.array(*[F.lit(float(v)) for v in center])
        d = F.round(1.0 - cosine(F.col("emb"), c), 6)
        # picked centers leave the state: they can contribute nothing
        # (their min-distance is 0) and dropping them makes a
        # duplicate pick structurally impossible even on a degenerate
        # all-identical corpus
        # LAZY checkpoint (r14 opt): the argmax action below is the
        # round's only consumer, so materializing the state inside it
        # (instead of a separate eager job) halves the loop's job
        # count — 1 driver-paced action per pick instead of 2; later
        # rounds still read the cached blocks, lineage stays 1 deep
        state = (
            state.filter(F.col("vec_id") != picks[-1][1])
            .select(
                "vec_id",
                "emb",
                F.least(F.coalesce("mind", d), d).alias("mind"),
            )
            .localCheckpoint(eager=False)
        )
        far_rows = (
            state.orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()
        )
        if not far_rows:  # k >= corpus size: every vector selected
            break
        far = far_rows[0]
        picks.append((i, far["vec_id"], float(far["mind"])))
        center = far["emb"]
    return embeddings.sparkSession.createDataFrame(
        picks, "pick_order long, vec_id long, radius double"
    )


# ---------------------------------------------------------------------------
# Cross-set embedding screen (r7 continuation): the batch core of the
# growing-corpus SEMANTIC ingest screen (streaming/documents_stream.
# GrowingSemanticScreen) — new vectors vs an accepted-corpus index,
# never all-pairs. Completes the screen trio: lexical MinHash
# (screen_against_corpus), directional containment
# (screen_containment_against_corpus), and semantic cosine (this).


def multi_table_buckets(
    embeddings: DataFrame,
    bits: int = LSH_BITS,
    tables: int = NEARDUP_TABLES,
) -> DataFrame:
    """(vec_id, tbl, bucket) multi-table hyperplane assignments WITHOUT
    the carried vector — the persistable LSH index-table shape (the
    streaming screen writes this next to the embedding table,
    batch_id-partitioned). Same planes as embedding_neardup_pairs_lsh,
    so buckets agree bit-for-bit with the in-query path."""
    sc = embeddings.sparkSession.sparkContext
    b_planes = sc.broadcast(_plane_matrix(bits * tables, EMB_DIM))
    powers = np.power(2, np.arange(bits)).astype(np.int64)

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("tbl", LongType()),
            StructField("bucket", LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(
                [list(v) for v in pdf["embedding"]], dtype=np.float64
            )
            signs = (m @ planes.T) > 0
            frames = []
            for t in range(tables):
                chunk = signs[:, t * bits : (t + 1) * bits]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "tbl": np.full(len(ids), t, dtype=np.int64),
                            "bucket": (chunk * powers)
                            .sum(axis=1)
                            .astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(assign, schema)


CELL_BITS = 6  # 64 coarse cells — the persisted-index pruning grain


def multi_table_assignments(
    embeddings: DataFrame,
    bits: int = LSH_BITS,
    tables: int = NEARDUP_TABLES,
    cell_bits: int = CELL_BITS,
) -> DataFrame:
    """(vec_id, tb, cell) — the PRUNABLE persisted-index shape of the
    growing semantic screen (VERDICT r7 What's-wrong #2):

    - ``tb`` packs (table, bucket) into one long (tbl·2^bits + bucket)
      so a micro-batch's probe keys collect to a bounded IN-list that
      parquet pushes into row-group stats — the index scan reads only
      matching row groups instead of the whole (linearly growing)
      bucket table every batch.
    - ``cell`` is a deterministic random-projection coarse cell
      (hyperplane planes at offset bits·tables, disjoint from every
      screen table) — the partition key of the persisted embedding
      table, so the exact-verify vector fetch prunes to the cells the
      candidates actually live in (same train-free role as an IVF
      coarse quantizer; a KMeans quantizer slots into the same column).

    Same plane family as :func:`multi_table_buckets`, one GEMM for all
    tables + the cell planes; agrees bit-for-bit with the in-query
    path."""
    sc = embeddings.sparkSession.sparkContext
    n_planes = bits * tables + cell_bits
    b_planes = sc.broadcast(_plane_matrix(n_planes, EMB_DIM))
    powers = np.power(2, np.arange(bits)).astype(np.int64)
    cell_powers = np.power(2, np.arange(cell_bits)).astype(np.int64)

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("tb", LongType()),
            StructField("cell", LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(
                [list(v) for v in pdf["embedding"]], dtype=np.float64
            )
            signs = (m @ planes.T) > 0
            cells = (
                (signs[:, bits * tables :] * cell_powers)
                .sum(axis=1)
                .astype(np.int64)
            )
            frames = []
            for t in range(tables):
                chunk = signs[:, t * bits : (t + 1) * bits]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "tb": t * (1 << bits)
                            + (chunk * powers).sum(axis=1).astype(np.int64),
                            "cell": cells,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(assign, schema)


def screen_embeddings_against_corpus(
    new_emb: DataFrame,
    corpus_emb: DataFrame,
    corpus_buckets: DataFrame | None = None,
    threshold: float = 0.9,
    broadcast_probe: bool = True,
    new_buckets: DataFrame | None = None,
) -> DataFrame:
    """Semantic near-dup screen: which NEW vectors sit within cosine ≥
    threshold of any ACCEPTED corpus vector. Both inputs are (vec_id,
    embedding); pass ``corpus_buckets`` to screen against a PERSISTED
    multi-table index instead of re-assigning the corpus per batch (the
    production path — same contract as screen_against_corpus's
    ``corpus_bands``); ``new_buckets`` likewise lets a caller derive
    the probe assignments ONCE and reuse them across screens (bucket
    values are per-vector, so any slice of a precomputed frame equals
    in-query derivation).

    Scale shape: candidates come from the (tbl, bucket) equi-join of
    the probe's assignments against the index — the corpus pays keyed
    shuffles only, never all-pairs; the exact verify is a per-pair JVM
    cosine fold over key-joined vectors (candidate volume is
    probe-bounded, so no bucket-local GEMM stage is needed here).
    ``broadcast_probe``: micro-batch-sized-probe contract, pass False
    for corpus-fraction probes. Output: new_doc, corpus_doc, cosine ≥
    threshold."""
    from .dedup import cosine

    if corpus_buckets is None:
        corpus_buckets = multi_table_buckets(corpus_emb)
    if new_buckets is None:
        new_buckets = multi_table_buckets(new_emb)
    new_b = new_buckets.select(
        F.col("vec_id").alias("new_doc"), "tbl", "bucket"
    )
    if broadcast_probe:
        new_b = F.broadcast(new_b)
    cand = (
        corpus_buckets.select(
            F.col("vec_id").alias("corpus_doc"), "tbl", "bucket"
        )
        .join(new_b, ["tbl", "bucket"])
        .select("new_doc", "corpus_doc")
        .distinct()
    )
    e_new = new_emb.select(
        F.col("vec_id").alias("new_doc"), F.col("embedding").alias("emb_n")
    )
    if broadcast_probe:
        e_new = F.broadcast(e_new)
    e_c = corpus_emb.select(
        F.col("vec_id").alias("corpus_doc"),
        F.col("embedding").alias("emb_c"),
    )
    return (
        cand.join(e_new, "new_doc")
        .join(e_c, "corpus_doc")
        .select(
            "new_doc",
            "corpus_doc",
            F.round(cosine(F.col("emb_n"), F.col("emb_c")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def mips_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
) -> DataFrame:
    """Exact maximum-inner-product top-k per query vector (excluding
    self) — the UNNORMALIZED companion of :func:`brute_force_topk`:
    recommendation/reranking scores are dot products, and the cosine
    queries silently re-rank when vector norms carry meaning. Exact
    JVM fold (zip_with/aggregate), broadcast query side, one window on
    the query key; the scale path is the standard norm-augmentation
    reduction (append √(M²−‖x‖²) to corpus vectors, 0 to queries) which
    turns MIPS into the cosine problem the LSH/IVF paths already
    solve — this query is the exact baseline those would be gated
    against. Output: query_id, vec_id, dot, rank."""
    queries = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    dot = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        embeddings.repartition(par)
        .select(F.col("vec_id"), F.col("embedding").alias("emb"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id", F.round(dot, 6).alias("dot")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "dot",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def matryoshka_audit(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
) -> DataFrame:
    """Truncated-dimension retrieval audit (r9) — the measurement
    behind Matryoshka-style embedding serving: if the first 32 (or 16)
    of 64 dims retrieve nearly the same neighbors, the ANN index can
    run at half/quarter width and exact-rerank with full vectors.
    For each sampled query: top-k overlap between full-width cosine
    ranking and the 32-/16-dim truncated rankings, plus the mean
    absolute cosine error of each truncation over the whole corpus.

    Same plan shape as mips_topk (broadcast query side, one corpus
    scan scoring all three widths at once, windows on the query key);
    ranking ties broken by (rounded score desc, vec_id asc) — the
    engine's deterministic rank convention. Output: query_id,
    overlap_half, overlap_quarter, mae_half, mae_quarter."""
    queries = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    scored = (
        embeddings.repartition(par)
        .select("vec_id", F.col("embedding").alias("emb"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("c_full"),
            F.round(
                cosine(
                    F.slice(F.col("q_emb"), 1, 32),
                    F.slice(F.col("emb"), 1, 32),
                ),
                6,
            ).alias("c_half"),
            F.round(
                cosine(
                    F.slice(F.col("q_emb"), 1, 16),
                    F.slice(F.col("emb"), 1, 16),
                ),
                6,
            ).alias("c_quarter"),
        )
    )
    ranked = scored
    for col in ("c_full", "c_half", "c_quarter"):
        w = Window.partitionBy("query_id").orderBy(
            F.col(col).desc(), F.col("vec_id").asc()
        )
        ranked = ranked.withColumn(f"r_{col}", F.row_number().over(w))
    return ranked.groupBy("query_id").agg(
        F.sum(
            (
                (F.col("r_c_full") <= k) & (F.col("r_c_half") <= k)
            ).cast("long")
        ).alias("overlap_half"),
        F.sum(
            (
                (F.col("r_c_full") <= k) & (F.col("r_c_quarter") <= k)
            ).cast("long")
        ).alias("overlap_quarter"),
        F.round(F.avg(F.abs(F.col("c_full") - F.col("c_half"))), 6).alias(
            "mae_half"
        ),
        F.round(
            F.avg(F.abs(F.col("c_full") - F.col("c_quarter"))), 6
        ).alias("mae_quarter"),
    )


def rrf_fusion(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of the two exact retrieval orders the
    engine serves — normalized cosine and unnormalized dot (MIPS) —
    per query: score(v) = 1/(rrf_k + rank_cos(v)) + 1/(rrf_k +
    rank_dot(v)), top-k by fused score (r9). RRF is the standard
    training-free hybrid-retrieval combiner (Cormack et al.): it
    needs only ranks, so it composes rankings whose raw scores live
    on different scales — exactly the cosine-vs-dot disagreement
    emb_mips_topk exposes.

    One corpus scan scores both metrics (same broadcast-query plan as
    matryoshka_audit); both FULL rankings come from two windows on
    the query key; ties broken (rounded score desc, vec_id asc) — the
    engine's rank convention — and the fused 1/(k+r) arithmetic is
    engine-identical rational math. Output: query_id, vec_id,
    rrf_score, rank."""
    queries = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    dot = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        embeddings.repartition(par)
        .select("vec_id", F.col("embedding").alias("emb"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos"),
            F.round(dot, 6).alias("dot"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    fused = (
        scored.withColumn("r_cos", F.row_number().over(wc))
        .withColumn("r_dot", F.row_number().over(wd))
        .withColumn(
            "rrf_score",
            F.round(
                1.0 / (F.lit(rrf_k) + F.col("r_cos"))
                + 1.0 / (F.lit(rrf_k) + F.col("r_dot")),
                6,
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("vec_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "rrf_score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def lsh_recall_audit(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    bits: int = LSH_BITS,
) -> DataFrame:
    """Recall@k audit of the single-table LSH index against the exact
    cosine ranking (r9) — "measure, don't guess" as a REGISTERED
    query, not just a test gate: per sampled query, how many of the
    exact top-k survive when retrieval is restricted to the query's
    sign bucket, and how many candidates that bucket held. This is
    the number that decides bits/tables before anyone trusts the ANN
    path at scale; the pytest recall gates pin a floor, this table
    shows the per-query distribution.

    One corpus scan scores every (query, vector) pair once (broadcast
    query side); the exact and bucket-restricted rankings are two
    windows over that one frame; everything after is query-grain.
    Output: query_id, n_candidates, hits, recall_at_k."""
    tagged = embeddings.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding"), bits).alias("bucket"),
    )
    queries = tagged.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    scored = (
        tagged.repartition(par)
        .select("vec_id", F.col("embedding").alias("emb"), "bucket")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            "bucket",
            "q_bucket",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias(
                "cosine"
            ),
        )
        # LAZY checkpoint (r14 opt, guide §2.4): three consumers (the
        # exact-ranking window, the bucket-restricted window, and the
        # candidate count) would otherwise each re-run the corpus scan
        # + broadcast cosine scoring — the pin makes the docstring's
        # "one corpus scan" claim structural
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact_top = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("query_id", "vec_id")
    )
    lsh = scored.filter(F.col("bucket") == F.col("q_bucket"))
    lsh_top = (
        lsh.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("query_id", "vec_id")
    )
    cands = lsh.groupBy("query_id").agg(
        F.count("*").alias("n_candidates")
    )
    hits = exact_top.join(lsh_top, ["query_id", "vec_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("hits"))
    return (
        queries.select("query_id")
        .join(cands, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_candidates", F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall_at_k"),
        )
    )


# (bits, tables) sweep grid for ann_tune: the production default
# (LSH_BITS=8, NEARDUP_TABLES=8) plus every cheaper rung worth
# measuring. For a FIXED bits, tables T+1 retrieval strictly contains
# tables T (table t of width b always hashes planes t·b..t·b+b−1, the
# multi_table_buckets convention), so recall and candidate volume are
# monotone in tables — asserted in tests.
ANN_TUNE_CONFIGS: tuple[tuple[int, int], ...] = (
    (2, 4), (2, 8),
    (4, 1), (4, 2), (4, 4), (4, 8),
    (6, 2), (6, 4),
    (8, 1), (8, 2), (8, 4), (8, 8),
)


def _families(
    configs: tuple[tuple[int, int], ...]
) -> dict[int, int]:
    """configs → {bits: max tables} — the per-width bucket families
    one sign GEMM must emit."""
    fams: dict[int, int] = {}
    for b, t in configs:
        fams[b] = max(fams.get(b, 0), t)
    return fams


def _family_bucket_frame(
    embeddings: DataFrame, families: dict[int, int]
) -> DataFrame:
    """(vec_id, bk{b} for each family) — per-vector packed bucket ints
    for every (bits=b, table=t<maxT_b) in ONE GEMM per Arrow batch
    against the shared _plane_matrix family. bk{b}[t] packs signs of
    planes t·b..t·b+b−1 little-endian (bit j ↦ 2^j), EXACTLY
    multi_table_buckets' convention, so a pair shares config (b, T)'s
    retrieval iff bk{b} agrees at any index < T — the audit measures
    the production index bit-for-bit."""
    sc = embeddings.sparkSession.sparkContext
    n_planes = max(b * t for b, t in families.items())
    b_planes = sc.broadcast(_plane_matrix(n_planes, EMB_DIM))
    fams = sorted(families.items())
    schema = StructType(
        [StructField("vec_id", LongType())]
        + [
            StructField(f"bk{b}", ArrayType(LongType()))
            for b, _ in fams
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(
                [list(v) for v in pdf["embedding"]], dtype=np.float64
            )
            signs = (m @ planes.T) > 0
            out = {"vec_id": ids}
            for b, max_t in fams:
                powers = np.power(2, np.arange(b)).astype(np.int64)
                bks = np.stack(
                    [
                        (signs[:, t * b : (t + 1) * b] * powers)
                        .sum(axis=1)
                        .astype(np.int64)
                        for t in range(max_t)
                    ],
                    axis=1,
                )
                out[f"bk{b}"] = list(bks)
            yield pd.DataFrame(out)

    return _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(assign, schema)


def ann_tune(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    configs: tuple[tuple[int, int], ...] = ANN_TUNE_CONFIGS,
    target_recall: float = 0.8,
) -> DataFrame:
    """Access-path selection for the multi-table LSH index, measured
    rather than guessed (VERDICT r9 next #1 — ann_lsh_recall showed
    single-table 8-bit recall ≈ 0; this operator turns that audit
    into a decision): sweep (bits, tables) over the SAME plane family
    the persisted index uses and return the recall@k / candidate-cost
    frontier, with the config the engine would pick flagged
    ``chosen`` — the cheapest (fewest avg candidates) config meeting
    ``target_recall``, falling back to the max-recall config when
    nothing meets it (an honest "no setting is good enough at these
    parameters" answer, not a silent pass).

    ONE corpus scan + ONE sign GEMM serve every config: per-vector
    packed bucket ints for every (width, table) are computed once
    (mapInPandas, multi_table_buckets' exact packing); the (query ×
    corpus) cosine frame is scored once (broadcast query side,
    exactly brute_force_topk's shape); each pair then carries only
    the FIRST matching table index per width (one zip_with +
    array_position over ≤ maxT ints), and config (b, T) matches iff
    that index is ≤ T — so the per-config explode compares two small
    ints, no per-config GEMM, scan, or per-bit work (the first cut
    slice-compared sign arrays per exploded row: 21.7 s → ~4 s at
    sf0.01).

    Scale: the sweep is audit-grade — |queries| × corpus × |configs|
    cheap boolean rows after one linear scan; at 100 TB you run it on
    a sampled corpus slice, which is exactly how recall tuning is done
    in production. Output: bits, tables, n_queries, avg_candidates,
    avg_recall, meets_target, chosen."""
    fams = _families(configs)
    bks = _family_bucket_frame(embeddings, fams)
    # LAZY checkpoint (r14 opt, guide §2.4/§4): the query-side filter
    # and the scored cross join both consume tagged, and the vec_id
    # filter cannot push through the MapInPandas barrier — so without
    # the pin the full sign GEMM runs twice per action. The pin makes
    # the docstring's "ONE sign GEMM" claim structural.
    tagged = (
        embeddings.select("vec_id", "embedding")
        .join(bks, "vec_id")
        .localCheckpoint(eager=False)
    )
    fam_cols = [f"bk{b}" for b in sorted(fams)]
    queries = tagged.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        *[F.col(c).alias(f"q_{c}") for c in fam_cols],
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    # pos{b}: 1-based index of the first table where the pair shares a
    # width-b bucket (0 = no table matches) — config (b, T) retrieval
    # is then just pos{b} BETWEEN 1 AND T
    pos_cols = [
        F.coalesce(
            F.array_position(
                F.zip_with(
                    F.col(f"q_bk{b}"),
                    F.col(f"bk{b}"),
                    lambda x, y: x == y,
                ),
                F.lit(True),
            ),
            F.lit(0),
        ).alias(f"pos{b}")
        for b in sorted(fams)
    ]
    scored = (
        tagged.repartition(par)
        .select("vec_id", F.col("embedding").alias("emb"), *fam_cols)
        .crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias(
                "cosine"
            ),
            *pos_cols,
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    cfg = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("bits"), F.lit(t).alias("tables")
                )
                for b, t in configs
            ]
        )
    ).alias("cfg")
    first_match = F.lit(None).cast("long")
    for b in sorted(fams):
        first_match = F.when(
            F.col("cfg.bits") == b, F.col(f"pos{b}")
        ).otherwise(first_match)
    pc = ranked.select(
        "query_id", "rn", *[f"pos{b}" for b in sorted(fams)], cfg
    ).select(
        F.col("cfg.bits").alias("bits"),
        F.col("cfg.tables").alias("tables"),
        "query_id",
        "rn",
        (
            (first_match >= 1) & (first_match <= F.col("cfg.tables"))
        ).alias("matched"),
    )
    per_q = pc.groupBy("bits", "tables", "query_id").agg(
        F.sum(F.col("matched").cast("long")).alias("n_cand"),
        F.sum(
            (F.col("matched") & (F.col("rn") <= k)).cast("long")
        ).alias("hits"),
    )
    frontier = per_q.groupBy("bits", "tables").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("n_cand"), 6).alias("avg_candidates"),
        F.round(F.avg(F.col("hits") / F.lit(float(k))), 6).alias(
            "avg_recall"
        ),
    )
    flagged = frontier.withColumn(
        "meets_target", F.col("avg_recall") >= F.lit(target_recall)
    )
    # pick order: among configs meeting the target, cheapest candidate
    # volume wins; if none meets, max recall wins. All keys are
    # round-6 doubles + ints — deterministic and engine-identical.
    pick = Window.orderBy(
        F.col("meets_target").desc(),
        F.when(
            F.col("meets_target"), F.col("avg_candidates")
        ).otherwise(F.lit(1e18)).asc(),
        F.col("avg_recall").desc(),
        F.col("avg_candidates").asc(),
        F.col("bits").asc(),
        F.col("tables").asc(),
    )
    return flagged.withColumn(
        "chosen", F.row_number().over(pick) == 1
    ).select(
        "bits",
        "tables",
        "n_queries",
        "avg_candidates",
        "avg_recall",
        "meets_target",
        "chosen",
    )


def choose_ann_config(
    embeddings: DataFrame,
    target_recall: float = 0.8,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
    configs: tuple[tuple[int, int], ...] = ANN_TUNE_CONFIGS,
) -> tuple[int, int]:
    """Collect the frontier's chosen (bits, tables) — the dim-grain
    (≤ |configs| rows) decision the growing semantic screen consumes
    at init time (run_growing_semantic's tuned path)."""
    row = (
        ann_tune(embeddings, query_ids, k, configs, target_recall)
        .filter(F.col("chosen"))
        .collect()[0]
    )
    return int(row["bits"]), int(row["tables"])


def density_cores(
    embeddings: DataFrame,
    threshold: float = 0.3,
    min_pts: int = 3,
) -> DataFrame:
    """DBSCAN-style density profile over the embedding space: for every
    vector, the count of OTHER vectors within the cosine-similarity
    radius (round-6 cosine ≥ ``threshold``, the family's determinism
    convention) and the resulting core/non-core flag (≥ ``min_pts``
    neighbors) — the "is this point in a dense semantic region or an
    outlier" primitive that clustering, dedup-aggressiveness tuning,
    and outlier-based quality filters all read.

    Physical plan: ONE block-GEMM pass (the brute_force_topk_vectorized
    recipe) — the normalized corpus broadcasts once and each Arrow
    batch counts its rows' neighbors with a dgemm + row-sum, so there
    is no pair materialization at all; the self-match (cosine 1 with
    its own id) is subtracted per row. Corpus size is guarded like
    every broadcast-corpus brute pass. Scale path: swap candidate
    generation onto the LSH/IVF machinery (lsh_neighbor_pairs at
    16-24 bits, or the persisted IVF cell-probe index) and keep this
    exact form as the recall audit — the brute/indexed split the ANN
    family already documents. Output: vec_id, n_neighbors, is_core."""
    sc = embeddings.sparkSession.sparkContext
    _guard_quadratic(embeddings, "density_cores", MAX_QUADRATIC_ROWS)
    ids, mat = _normalized_corpus(embeddings)
    b_mat = sc.broadcast(mat)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        corpus = b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mb = np.array(
                [list(v) for v in pdf["embedding"]], dtype=np.float64
            )
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            cos = np.round(mb @ corpus.T, 6)
            n = (cos >= threshold).sum(axis=1).astype(np.int64) - 1
            yield pd.DataFrame({"vec_id": bids, "n_neighbors": n})

    counted = _spread_gemm(
        embeddings.select("vec_id", "embedding")
    ).mapInPandas(
        block,
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("n_neighbors", LongType()),
            ]
        ),
    )
    return counted.select(
        "vec_id",
        "n_neighbors",
        (F.col("n_neighbors") >= min_pts).alias("is_core"),
    )


def silhouette_by_label(embeddings: DataFrame) -> DataFrame:
    """Simplified (centroid-based) silhouette score per label — the
    standard clustering-quality audit over the labeled embedding
    table: for each vector, a = Euclidean distance to its OWN label
    centroid, b = the minimum distance to any OTHER label's centroid,
    s = (b − a)/max(a, b); reported as the per-label mean with the
    cohesion/separation means alongside. s near 1 = tight, separated
    clusters; near 0 = touching; negative = vectors sit closer to a
    foreign centroid than their own (label noise or collapsed
    clusters). The simplified (centroid) form IS the standard
    large-scale variant — the classic all-pairs silhouette is
    quadratic and adds nothing at corpus scale.

    Scale shape: one posexplode to (vec, dim) grain, one (label, dim)
    aggregate for centroids (label-alphabet × dim rows — dim-grain,
    broadcast), one broadcast join computing all |labels| distances
    per vector, one vector-grain rollup, one label-grain rollup.
    Nothing quadratic in vectors anywhere. Output: label, n_vectors,
    mean_a, mean_b, silhouette."""
    dims = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("d", "v"),
    ).select(
        "vec_id", "label", "d", F.col("v").cast("double").alias("v")
    )
    centroids = dims.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.avg("v").alias("c")
    )
    # every (vector, candidate-centroid) distance in ONE broadcast
    # join keyed on the dim — the centroid frame is labels × dim rows
    dist = (
        dims.join(F.broadcast(centroids), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
                )
            ).alias("dist")
        )
    )
    per_vec = dist.groupBy("vec_id", "label").agg(
        F.min(
            F.when(F.col("clabel") == F.col("label"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dist"))
        ).alias("b"),
    )
    s = F.when(
        F.greatest(F.col("a"), F.col("b")) > 0,
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
    ).otherwise(F.lit(0.0))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("a"), 6).alias("mean_a"),
            F.round(F.avg("b"), 6).alias("mean_b"),
            F.round(F.avg(s), 6).alias("silhouette"),
        )
    )


def density_cores_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    min_pts: int = 2,
    bits: int = LSH_BITS,
    tables: int = NEARDUP_TABLES,
) -> DataFrame:
    """The SCALE-PATH sibling of :func:`density_cores`: neighbor
    counts over the multi-table LSH candidate graph (candidates share
    any (table, bucket); exact round-6 cosine verify per bucket —
    the dedup_embedding_cosine machinery) instead of the exact
    all-pairs GEMM. Counts are a LOWER BOUND of the exact profile
    (LSH can only miss pairs, never invent them — the subset law the
    tests pin); the exact form stays the audit, this form is what
    runs on the full corpus. Defaults follow the dedup family
    (threshold 0.4, 8×8-bit tables). Output: vec_id,
    n_neighbors_lsh, is_core."""
    # LAZY checkpoint (r14 opt, guide §2.4): the union below reads the
    # pair frame TWICE (vec_a side + vec_b side), which would run the
    # whole LSH bucket+verify pipeline — including the Arrow assign
    # pass — twice per action. First consumer materializes the pairs
    # once; the second side reads the pinned blocks.
    pairs = embedding_neardup_pairs_lsh(
        embeddings, threshold, bits=bits, tables=tables
    ).localCheckpoint(eager=False)
    both = pairs.select(F.col("vec_a").alias("vec_id")).unionAll(
        pairs.select(F.col("vec_b").alias("vec_id"))
    )
    counts = both.groupBy("vec_id").agg(
        F.count("*").alias("n_neighbors_lsh")
    )
    return (
        embeddings.select("vec_id")
        .join(counts, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("n_neighbors_lsh"), F.lit(0)).alias(
                "n_neighbors_lsh"
            ),
            (
                F.coalesce(F.col("n_neighbors_lsh"), F.lit(0)) >= min_pts
            ).alias("is_core"),
        )
    )


def pca_components(
    embeddings: DataFrame, n_components: int = 8
) -> DataFrame:
    """Distributed PCA of the embedding corpus — the spectral audit
    next to the centroid/silhouette tools: eigenvalue spectrum +
    explained-variance ratios tell you the corpus's effective
    dimensionality (a collapsed encoder shows up as 2-3 components
    carrying everything; matryoshka truncation budgets come straight
    off the cumulative EVR), and the loadings give the projection
    basis for whitening or 2-D audit plots.

    Scale shape — the standard big-data PCA split: the DISTRIBUTED
    work is one Arrow-batched partial-Gram pass (`mapInPandas`: each
    batch contributes (n, Σx, XᵀX), dgemm-backed like the GEMM
    verifiers) reduced to a dim×dim matrix; dim is 64 here and bounded
    by the encoder everywhere, so the driver-side eigh on the
    (dim×dim) covariance is the codebook convention
    (sinks/layout.py), NOT a driver-side data scan — 100 TB of
    vectors still reduce to one 64×64 matrix. Eigenvector sign is
    pinned (largest-|loading| coordinate positive) for stable output.
    Rows-only gate (eigendecomposition isn't ANSI SQL); numpy
    full-data parity in tests/test_r11_pca.py. Output: component,
    eigenvalue, explained_variance_ratio, cumulative_evr, loading
    (array<double>, unit norm)."""
    spark = embeddings.sparkSession

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = (
        embeddings.select("embedding")
        .mapInPandas(gram, "n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("pca_components needs >= 2 vectors")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    dim = len(s)
    g = np.sum(
        [np.array(r["g"]).reshape(dim, dim) for r in parts], axis=0
    )
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][: min(n_components, dim)]
    total = float(w.sum())
    rows, cum = [], 0.0
    for rank, i in enumerate(order, start=1):
        vec = v[:, i]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        evr = float(w[i]) / total if total > 0 else 0.0
        cum += evr
        rows.append(
            (
                rank,
                round(float(w[i]), 6),
                round(evr, 6),
                round(cum, 6),
                [float(x) for x in vec],
            )
        )
    return spark.createDataFrame(
        rows,
        "component long, eigenvalue double, explained_variance_ratio "
        "double, cumulative_evr double, loading array<double>",
    )


PROBE_SCORE_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("q_label", LongType()),
        StructField("vec_id", LongType()),
        StructField("label", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def _probe_label_scores(
    embeddings: DataFrame, query_ids: tuple[int, ...]
) -> DataFrame:
    """Shared probe-vs-corpus scorer for the labeled-embedding family
    (hard_negative_topk / triplet_candidates / knn_label_audit): ONE
    block GEMM of the labeled corpus against the broadcast probe
    matrix, emitting the round-6 cosine plus BOTH labels; self-pairs
    masked, NULL-label vectors dropped from both sides. The consumers
    differ only in the JVM-side label predicate and the champion
    windows — one copy of the normalization/rounding conventions, so a
    determinism fix can't land in one scorer and miss the others.
    Output: query_id, q_label, vec_id, label, cosine."""
    sc = embeddings.sparkSession.sparkContext
    labeled = embeddings.filter(F.col("label").isNotNull())
    qrows = labeled.filter(F.col("vec_id").isin(*query_ids)).select(
        "vec_id", "label", "embedding"
    ).collect()
    if not qrows:
        # no labeled vector matches query_ids: the oracle returns an
        # empty result, so do the same instead of letting np.linalg.norm
        # crash on a 0×0 probe matrix
        return embeddings.sparkSession.createDataFrame(
            [], PROBE_SCORE_SCHEMA
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qlab = np.array([r["label"] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    b_q = sc.broadcast((qids, qlab, qmat))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_qids, all_qlab, all_qmat = b_q.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["vec_id"].to_numpy(dtype=np.int64)
            blab = pdf["label"].to_numpy(dtype=np.int64)
            mb = np.array(
                [list(v) for v in pdf["embedding"]], dtype=np.float64
            )
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            cos = np.round(mb @ all_qmat.T, 6)  # n_corpus × n_queries
            n, nq = cos.shape
            qi = np.repeat(all_qids[np.newaxis, :], n, axis=0).ravel()
            ql = np.repeat(all_qlab[np.newaxis, :], n, axis=0).ravel()
            vi = np.repeat(bids[:, np.newaxis], nq, axis=1).ravel()
            vl = np.repeat(blab[:, np.newaxis], nq, axis=1).ravel()
            mask = qi != vi
            yield pd.DataFrame(
                {
                    "query_id": qi[mask],
                    "q_label": ql[mask],
                    "vec_id": vi[mask],
                    "label": vl[mask],
                    "cosine": cos.ravel()[mask],
                }
            )

    return _spread_gemm(
        labeled.select("vec_id", "label", "embedding")
    ).mapInPandas(block, PROBE_SCORE_SCHEMA)


def hard_negative_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe,
    the top-k most-cosine-similar vectors with a DIFFERENT label — the
    highest-loss negatives a triplet/InfoNCE loop should sample
    (random negatives are trivially far; the hard ones carry the
    gradient). One shared block GEMM (_probe_label_scores) + a JVM
    label predicate + the deterministic round-6-cosine/vec_id window.
    NULL-label vectors drop from both sides (no honest negative
    relation is defined for them).

    Scale: linear in corpus per probe (never corpus×corpus); at 100 TB
    the probes route through the persisted multi-table LSH index first
    (ann_lsh_* machinery) and this exact scan becomes the re-rank of
    the label-filtered candidate shortlist. Output: query_id, vec_id,
    cosine, rank."""
    scored = _probe_label_scores(embeddings, query_ids).filter(
        F.col("q_label") != F.col("label")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def triplet_candidates(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
) -> DataFrame:
    """Triplet mining for metric learning: for each probe (anchor),
    the HARDEST POSITIVE (same label, lowest cosine — the in-class
    example the encoder currently separates worst) and the HARDEST
    NEGATIVE (different label, highest cosine — hard_negative_topk's
    champion), plus the margin between them. margin > 0 means the
    negative currently sits closer than the positive — a triplet-loss
    violation the training loop should prioritize. One shared block
    GEMM (_probe_label_scores); two deterministic window ranks pick
    the champions (cosine then vec_id). Probes with no same-label peer
    drop (an anchor without a positive defines no triplet). NULL
    labels drop from both sides.

    Scale: linear in corpus per probe; at 100 TB both champions come
    from the persisted LSH shortlist (nearest different-label) and a
    label-partitioned scan (farthest same-label). Output: query_id,
    pos_id, pos_cosine, neg_id, neg_cosine, margin, violates."""
    scored = _probe_label_scores(embeddings, query_ids)
    is_pos = F.col("q_label") == F.col("label")
    w_pos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").asc(), F.col("vec_id").asc()
    )
    w_neg = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    pos = (
        scored.filter(is_pos)
        .withColumn("rn", F.row_number().over(w_pos))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("pos_id"),
            F.col("cosine").alias("pos_cosine"),
        )
    )
    neg = (
        scored.filter(~is_pos)
        .withColumn("rn", F.row_number().over(w_neg))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("cosine").alias("neg_cosine"),
        )
    )
    margin = F.round(F.col("neg_cosine") - F.col("pos_cosine"), 6)
    return pos.join(neg, "query_id").select(
        "query_id",
        "pos_id",
        "pos_cosine",
        "neg_id",
        "neg_cosine",
        margin.alias("margin"),
        (margin > 0).alias("violates"),
    )


def knn_label_audit(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = tuple(range(10)),
    k: int = 5,
) -> DataFrame:
    """Leave-one-out kNN label audit: for each probe, the majority
    label among its k nearest labeled neighbors (cosine, self
    excluded) against its own label — the standard embedding-quality /
    label-noise probe (a probe whose neighborhood consistently
    outvotes its label is either mislabeled or sits on a cluster
    boundary; an encoder whose audit accuracy collapses embeds labels
    badly). One shared block GEMM (_probe_label_scores); the neighbor
    shortlist is the deterministic round-6-cosine/vec_id window, the
    vote argmax is (votes DESC, label ASC) — fully mirrorable.
    NULL-label vectors drop from both sides.

    Scale: linear in corpus per probe; at 100 TB the shortlist comes
    from the persisted LSH index and this exact scan re-ranks it.
    Output: query_id, true_label, predicted_label, votes, correct."""
    scored = _probe_label_scores(embeddings, query_ids)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    votes = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("query_id", "label")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            "votes",
        )
    )
    # truth from the probe rows directly (probe-dim, one cheap scan) —
    # deriving it from `scored` would re-execute the GEMM branch
    truth = (
        embeddings.filter(F.col("label").isNotNull())
        .filter(F.col("vec_id").isin(*query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").cast("long").alias("true_label"),
        )
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "true_label",
        "predicted_label",
        "votes",
        (F.col("predicted_label") == F.col("true_label")).alias("correct"),
    )


#: the cross-engine-exact coordinate quantization grid (NOTES lesson
#: 18): floor(x * 2^20) — a power-of-two multiply is exact in binary
#: FP, so the integer is bit-identical in any engine (decimal round-6
#: on raw floats is NOT). Q20_SQ rescales squared-sum statistics back.
Q20 = 1048576.0  # 2^20
Q20_SQ = 1099511627776.0  # 2^40


def _q20(col: F.Column) -> F.Column:
    """floor(col · 2²⁰) as a DOUBLE-input exact-integer quantizer —
    one definition of the grid shared by dim_stats /
    quantized_dim_sums / norm_profile (and mirrored verbatim by their
    oracles); change it in lockstep with the SQL or parity breaks."""
    return F.floor(col.cast("double") * F.lit(Q20))


def dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension embedding health profile: mean, variance,
    zero-fraction, and negative-fraction of every coordinate — the
    dataset-card statistic that catches dead dimensions (variance ≈ 0:
    wasted capacity, or a truncation bug upstream), dominant
    dimensions (anisotropy — cosine similarity degenerates toward one
    axis), and collapsed signs. Moments are computed over coordinates
    quantized to the 2⁻²⁰ grid (floor(x·2²⁰) — multiplying by a power
    of two is EXACT in binary floating point, so the quantized integer
    is bit-identical in any engine; decimal round-6 here would NOT be:
    Spark rounds the shortest decimal repr while DuckDB rounds the
    binary double, and generator-quantized float32 values sit exactly
    on .5×10⁻⁶ boundaries — a measured 1-ulp variance mismatch at
    sf0.001). The quantized sums accumulate as exact DECIMALs;
    mean/variance one double expression each.

    Scale shape: one posexplode (dim-bounded fan-out) + one dim-grain
    aggregate — embarrassingly parallel, no shuffle wider than
    64 rows. Output: dim, n, mean, variance, frac_zero,
    frac_negative."""
    x = F.col("x").cast("double")
    qx = _q20(x).cast("decimal(38,0)")
    exploded = embeddings.select(
        F.posexplode("embedding").alias("dim", "x")
    )
    agg = exploded.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(qx).cast("double").alias("s1"),
        F.sum(qx * qx).cast("double").alias("s2"),
        F.sum((x == 0.0).cast("long")).cast("long").alias("n_zero"),
        F.sum((x < 0.0).cast("long")).cast("long").alias("n_neg"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.round(F.col("s1") / nd / Q20, 6).alias("mean"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / nd)
            / nd
            / Q20_SQ,
            6,
        ).alias("variance"),
        F.round(F.col("n_zero").cast("double") / nd, 6).alias("frac_zero"),
        F.round(F.col("n_neg").cast("double") / nd, 6).alias(
            "frac_negative"
        ),
    )


def quantized_dim_sums(embeddings: DataFrame) -> DataFrame:
    """Per-dimension 2⁻²⁰-quantized coordinate sums (dim, qsum, n) —
    the MERGEABLE state of the centroid-drift family: sums of
    floor(x·2²⁰) integers add across batches/partitions exactly, so
    the lifetime state is just the sum of per-batch partitions (the
    keyness-index recipe). See dim_stats for why the power-of-two grid
    (and not decimal round-6) is the cross-engine-exact quantization.
    Output: dim, qsum (DECIMAL exact), n."""
    q = _q20(F.col("x")).cast("decimal(38,0)")
    return (
        embeddings.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum(q).alias("qsum"), F.count("*").cast("long").alias("n"))
    )


#: centroid-drift alert threshold: 1 − cos(batch centroid, lifetime
#: centroid) above this fires (0.02 ≈ a 11° swing of the mean vector)
CENTROID_SHIFT_ALERT = 0.02


def centroid_drift(
    batch_sums: DataFrame,
    lifetime_sums: DataFrame,
    threshold: float = CENTROID_SHIFT_ALERT,
) -> DataFrame:
    """Cosine shift of the BATCH embedding centroid against the
    LIFETIME centroid, from quantized per-dim sum frames — the drift
    arithmetic of the embedding ingest gate (an encoder version bump,
    a normalization change, or a poisoned source moves the mean vector
    long before nearest-neighbor recall visibly degrades). Cosine is
    scale-invariant, so the centroid divisions cancel: cos =
    Σ qb·ql / (√Σqb² · √Σql²) is computed ENTIRELY from exact integer
    sums with one double expression at the end (round 6; NULL when
    either side is empty or all-zero — honest, not 0). Output (1 row):
    n_batch, n_lifetime, cosine, cosine_shift, alert."""
    b = batch_sums.select(
        "dim", F.col("qsum").alias("qb"), F.col("n").alias("nb")
    )
    lf = lifetime_sums.select(
        "dim", F.col("qsum").alias("ql"), F.col("n").alias("nl")
    )
    j = b.join(lf, "dim", "full")
    qb = F.coalesce(F.col("qb"), F.lit(0).cast("decimal(38,0)"))
    ql = F.coalesce(F.col("ql"), F.lit(0).cast("decimal(38,0)"))
    agg = j.agg(
        F.sum(qb * ql).alias("dot"),
        F.sum(qb * qb).alias("b2"),
        F.sum(ql * ql).alias("l2"),
        F.max("nb").alias("n_batch"),
        F.max("nl").alias("n_lifetime"),
    )
    cos = F.when(
        (F.col("b2") > 0) & (F.col("l2") > 0),
        F.col("dot").cast("double")
        / (F.sqrt(F.col("b2").cast("double"))
           * F.sqrt(F.col("l2").cast("double"))),
    )
    return agg.select(
        F.coalesce(F.col("n_batch"), F.lit(0)).cast("long").alias(
            "n_batch"
        ),
        F.coalesce(F.col("n_lifetime"), F.lit(0)).cast("long").alias(
            "n_lifetime"
        ),
        F.round(cos, 6).alias("cosine"),
        F.round(1.0 - cos, 6).alias("cosine_shift"),
        F.coalesce(
            F.round(1.0 - cos, 6) > threshold, F.lit(False)
        ).alias("alert"),
    )


def centroid_drift_split(embeddings: DataFrame, modulo: int = 5) -> DataFrame:
    """Registered batch twin of the streaming centroid-drift monitor:
    vectors with vec_id % ``modulo`` == 0 play the arriving batch, the
    rest the lifetime population (the ks_drift_split convention)."""
    return centroid_drift(
        quantized_dim_sums(
            embeddings.filter(F.col("vec_id") % modulo == 0)
        ),
        quantized_dim_sums(
            embeddings.filter(F.col("vec_id") % modulo != 0)
        ),
    )


def norm_profile(embeddings: DataFrame) -> DataFrame:
    """Vector-norm health profile: n, mean/min/max L2 norm and the
    fraction of vectors whose norm strays > 1% from 1.0 — the
    companion of dim_stats (that audits coordinates; this audits
    magnitudes: an unnormalized encoder output or a norm collapse
    breaks cosine retrieval silently). Each vector's squared norm is
    an EXACT long computed by a narrow JVM array fold over the 2⁻²⁰-
    quantized coordinates (q² ≤ 2⁴⁰, ×64 dims < 2⁴⁷ — no explode, no
    shuffle wider than the final 1-row aggregate); the norm is one
    double per vector, the mean accumulates round-6 norms as exact
    DECIMALs (order-independent), min/max are order-free by nature.
    Output (1 row): n, mean_norm, min_norm, max_norm,
    frac_unnormalized."""
    q2 = F.aggregate(
        F.transform(
            "embedding",
            lambda x: (_q20(x) * _q20(x)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    norm = F.sqrt(q2.cast("double") / F.lit(Q20_SQ))
    per_vec = embeddings.select(norm.alias("norm"))
    return per_vec.agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(F.round(F.col("norm"), 6).cast("decimal(38,6)"))
            .cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mean_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
        F.round(
            F.sum(
                (F.abs(F.col("norm") - 1.0) > 0.01).cast("long")
            ).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("frac_unnormalized"),
    )
