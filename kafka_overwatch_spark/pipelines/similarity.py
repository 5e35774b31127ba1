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
- An IVF variant would k-means the corpus and probe nearest centroids;
  with no ML deps in this container, LSH is the implemented scale path
  and IVF is listed as the alternative (same join shape: assign →
  bucket join).

Cosines are double-precision with fixed fold order (see dedup.cosine) —
bit-stable vs the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _hash64, cosine

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
    scored = (
        F.broadcast(queries)
        .crossJoin(
            embeddings.select(
                F.col("vec_id").alias("vec_id"), F.col("embedding").alias("emb")
            )
        )
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
    tagged = embeddings.select(
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
