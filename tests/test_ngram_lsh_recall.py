"""Measured recall of the r=1 minhash-banding candidate route behind
``ngram_jaccard_pairs_lsh`` (VERDICT r5 next #6): the 1−(1−s)^12
s-curve was asserted in prose; this fixture MEASURES it on an
adversarial corpus of pairs engineered to sit just above the 0.35
threshold — the hardest regime for the banding (recall →1 fast above
it, so near-threshold is where misses concentrate).

Construction: pair i shares a block of ``c`` tokens and diverges in
per-doc tails of ``t`` tokens, all tokens globally unique per pair, so
shingle-set Jaccard is exactly (c−k+1) / (2(c+t−k+1) − (c−k+1)) with
k = SHINGLE_K — no estimation, the target similarity is by
construction. MinHash here is deterministic (salted md5 minima), so
the measured recall is a fixed number, not a flaky sample."""

from __future__ import annotations

from pyspark.sql import functions as F

# c common tokens + t tail tokens with SHINGLE_K=3:
# jaccard = (c-2) / (2(c+t-2) - (c-2))
C_TOKENS, T_TOKENS = 30, 25  # → 28/78 ≈ 0.359, just above 0.35
N_PAIRS = 60
# and a below-threshold control group: c=20, t=30 → 18/(2*48-18) ≈ 0.231
C_LO, T_LO = 20, 30
N_LO = 20


def _mkdocs(spark):
    rows = []

    def tokens(prefix, n):
        return " ".join(f"{prefix}x{j}" for j in range(n))

    did = 0
    for i in range(N_PAIRS):
        common = tokens(f"p{i}c", C_TOKENS)
        rows.append((did, common + " " + tokens(f"p{i}a", T_TOKENS), "en"))
        rows.append(
            (did + 1, common + " " + tokens(f"p{i}b", T_TOKENS), "en")
        )
        did += 2
    lo_start = did
    for i in range(N_LO):
        common = tokens(f"q{i}c", C_LO)
        rows.append((did, common + " " + tokens(f"q{i}a", T_LO), "en"))
        rows.append(
            (did + 1, common + " " + tokens(f"q{i}b", T_LO), "en")
        )
        did += 2
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    return docs, lo_start


def test_r1_banding_recall_meets_the_s_curve(spark):
    from kafka_overwatch_spark.pipelines.dedup import (
        NUM_HASHES,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_lsh,
    )

    docs, lo_start = _mkdocs(spark)
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs_lsh(docs).collect()
    }

    # ground truth sanity: every engineered above-threshold pair is in
    # the all-pairs answer at the constructed similarity, every control
    # pair is below threshold and absent
    assert len(truth) == N_PAIRS
    for (a, b), j in truth.items():
        assert a < lo_start and b == a + 1
        assert 0.35 <= j <= 0.37, j

    # precision is exact by construction (candidates are verified with
    # true Jaccard): nothing in got may be outside truth
    assert set(got) <= set(truth)
    for k in got:
        assert got[k] == truth[k]

    # measured recall vs the curve: at s≈0.359 the r=1 band curve gives
    # 1-(1-s)^NUM_HASHES ≈ 0.995 → expected misses ≈ 0.3 of 60. The
    # md5 minhash is deterministic, so this is a fixed measurement; a
    # bound of 0.9 (≥54/60) holds with huge margin unless the banding
    # route itself breaks.
    s = min(truth.values())
    curve = 1 - (1 - s) ** NUM_HASHES
    assert curve > 0.99
    recall = len(got) / len(truth)
    assert recall >= 0.9, f"measured recall {recall} vs curve {curve}"


def test_r1_banding_is_perfect_well_above_threshold(spark):
    """At s ≈ 0.5 the curve is 0.9998 — on 30 deterministic pairs the
    route must find every single one (a single miss is a route bug, not
    noise)."""
    from kafka_overwatch_spark.pipelines.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_lsh,
    )

    # c=40, t=12: j = 38/(2*50-38) = 38/62 ≈ 0.613
    rows = []
    for i in range(30):
        common = " ".join(f"r{i}c x{j} w{j}k" for j in range(14))
        ta = " ".join(f"r{i}a y{j}" for j in range(6))
        tb = " ".join(f"r{i}b z{j}" for j in range(6))
        rows.append((2 * i, common + " " + ta, "en"))
        rows.append((2 * i + 1, common + " " + tb, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    truth = sorted(
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()
    )
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs_lsh(docs).collect()
    )
    assert len(truth) == 30
    assert got == truth
