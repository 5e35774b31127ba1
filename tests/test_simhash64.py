"""64-bit SimHash / pigeonhole-join properties (r6 verdict #1).

The r6 audit flagged the 32-bit fingerprint's 8-bit chunks as the last
quadratic pair-generation path: a 256-value join domain gives expected
bucket occupancy N/256, so candidates grow ~N². These tests pin the
widened design: 64-bit fingerprints (bit-exact vs a straight-Python
reference, signed two's complement), 16-bit chunk domains whose
occupancy scales as N/2^16, and the MinHash-style degenerate-bucket cap.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_overwatch_spark.pipelines import dedup


def _py_simhash(text: str) -> int:
    """Straight-Python reference: identical normalization (trim,
    whitespace collapse, lowercase), 64-bit signed md5 token hash,
    per-bit ±1 sums with token multiplicity."""
    toks = " ".join(text.strip().split()).lower().split(" ")
    sums = [0] * 64
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        for b in range(64):
            sums[b] += 2 * ((h >> b) & 1) - 1
    fp = 0
    for b in range(64):
        if sums[b] > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_simhash_fingerprints_match_python_reference(spark, snaps):
    docs = spark.table("documents").filter(F.col("doc_id") < 60)
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(docs).collect()
    }
    want = {
        r["doc_id"]: _py_simhash(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want and len(got) > 0


def test_simhash_null_text_dropped(spark):
    """ADVICE r6: the aggregate-fold rewrite must keep the historical
    explode+groupBy contract — NULL-text docs produce no fingerprint
    row (not a NULL-fingerprint row that downstream joins would see)."""
    docs = spark.createDataFrame(
        [(1, "hello world", 11, "en", "s"), (2, None, 0, "en", "s")],
        "doc_id long, text string, n_chars long, lang string, source string",
    )
    rows = dedup.simhash_fingerprints(docs).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["simhash"] == _py_simhash("hello world")


def test_chunk_bucket_occupancy_scales_with_16_bit_domain(spark, snaps):
    """The done-criterion property (r6 verdict #1): bucket occupancy
    must be data-bound (N/2^16-ish plus true similarity clusters), not
    DOMAIN-bound. Under the old 8-bit chunks every chunk table had at
    most 256 distinct values, so mean occupancy was pinned ≥ N/256 and
    candidate volume grew ~N². On the 500-doc fixture (simhash is
    locality sensitive, so similar-template docs legitimately share
    chunk values) each 16-bit chunk table must still exceed the entire
    8-bit domain in distinct values, keep near-singleton mean
    occupancy, and generate candidates far below the quadratic
    ceiling."""
    docs = spark.table("documents")
    n = docs.count()
    fps = dedup.simhash_fingerprints(docs)
    candidates = 0
    for c in range(4):
        col = F.expr(
            f"CAST(shiftrightunsigned(simhash, {16 * c}) & 65535 AS BIGINT)"
        )
        sizes = [
            r["count"]
            for r in fps.select(col.alias("v")).groupBy("v").count().collect()
        ]
        # impossible under an 8-bit chunk domain (≤ 256 distinct values)
        assert len(sizes) > 256, (c, len(sizes))
        assert sum(sizes) / len(sizes) < 2.0, (c, sum(sizes) / len(sizes))
        assert max(sizes) < 40, (c, max(sizes))
        candidates += sum(s * (s - 1) // 2 for s in sizes)
    # candidate pairs stay a small fraction of the N²/2 all-pairs join
    # (8-bit chunks generated ≥ 4·N²/2/256 ≈ 1950 candidates here from
    # the domain alone, before any similarity clustering)
    assert candidates < 0.02 * n * (n - 1) / 2, candidates


def test_hamming_max_bucket_cap_drops_degenerate_buckets(spark):
    """MinHash-style skew cap: a degenerate cluster of identical
    fingerprints larger than max_bucket yields NO candidate pairs (the
    bucket is dropped wholesale), while the default cap keeps them."""
    clones = [(i, "same boilerplate text every time", 31, "en", "s") for i in range(12)]
    docs = spark.createDataFrame(
        clones,
        "doc_id long, text string, n_chars long, lang string, source string",
    )
    capped = dedup.simhash_pairs(docs, max_bucket=5)
    assert capped.count() == 0
    uncapped = dedup.simhash_pairs(docs)
    assert uncapped.count() == 12 * 11 // 2


def test_pigeonhole_recall_exact_within_cap(spark):
    """Every true hamming ≤ 3 pair must surface (pigeonhole is exact,
    not probabilistic): brute-force all-pairs over real fingerprints
    equals the chunk-join output when no bucket hits the cap."""
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    fps = dedup.simhash_fingerprints(docs)
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(fa ^ fb)").cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
    got = sorted(map(tuple, dedup.simhash_pairs(docs).collect()))
    want = sorted(map(tuple, brute.collect()))
    assert got == want
