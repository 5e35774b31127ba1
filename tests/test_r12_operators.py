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


DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "en", "web", t) for i, t in enumerate(texts)], DOC_SCHEMA
    )


def test_choose_containment_k_escalates_on_dense_corpus(spark):
    """iid draws from a 3-word vocabulary: every 3-shingle collides,
    mass blows the budget → K escalates; an open-vocab corpus stays at
    the narrow default."""
    from kafka_overwatch_spark.pipelines.dedup import (
        CONTAINMENT_K_LADDER,
        choose_containment_k,
        shingle_docs,
    )
    import random

    rng = random.Random(7)
    dense = _docs(
        spark,
        [" ".join(rng.choice("a b c".split()) for _ in range(30))
         for _ in range(300)],
    )
    assert (
        choose_containment_k(shingle_docs(dense))
        == CONTAINMENT_K_LADDER[1]
    )
    open_vocab = _docs(
        spark,
        [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(60)],
    )
    assert (
        choose_containment_k(shingle_docs(open_vocab))
        == CONTAINMENT_K_LADDER[0]
    )


def test_adaptive_cap_is_max_probe_df_and_exact(spark):
    """The adaptive posting cap must equal the max corpus frequency
    over selected probes, and the capped path's output must EQUAL the
    brute-force containment at the same K — recall 1.0 by
    construction, not audited."""
    from kafka_overwatch_spark.pipelines.dedup import (
        containment_adaptive_cap,
        containment_pairs,
        containment_pairs_adaptive,
        containment_probes_rarest,
        shingle_docs,
    )

    base = "the quick brown fox jumps over the lazy dog every day"
    texts = [base, base, base + " and then some more trailing words",
             "totally different content about spark partitions",
             "spark partitions shuffle exchange broadcast join hints"]
    docs_tbl = _docs(spark, texts)
    docs = shingle_docs(docs_tbl)
    probes = containment_probes_rarest(docs)
    cap = containment_adaptive_cap(probes)
    max_df = (
        probes.agg(F.max("df").alias("m")).collect()[0]["m"]
    )
    assert cap == max_df and cap >= 1
    got = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs_adaptive(docs_tbl, docs=docs).collect()
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs(docs_tbl).collect()
    )
    # clones contain each other both ways; the extended doc is
    # contained-in but does not contain back (directional)
    assert got == want
    assert set(got) == {(0, 1, 1.0), (1, 0, 1.0), (0, 2, 1.0), (1, 2, 1.0)}


def test_escalated_k_matches_brute_force_at_wide_k(spark):
    """When density forces the wide K, the adaptive output must equal
    a brute-force containment computed over wide-K shingles."""
    from kafka_overwatch_spark.pipelines.dedup import (
        CONTAINMENT_K_LADDER,
        choose_containment_k,
        containment_pairs_adaptive,
        shingle_docs,
    )
    import random

    rng = random.Random(11)
    texts = [" ".join(rng.choice("a b c".split()) for _ in range(25))
             for _ in range(300)]
    # plant one exact clone pair so output is non-trivial
    texts[1] = texts[0]
    docs_tbl = _docs(spark, texts)
    docs3 = shingle_docs(docs_tbl)
    k = choose_containment_k(docs3)
    assert k == CONTAINMENT_K_LADDER[1]
    got = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs_adaptive(docs_tbl, docs=docs3).collect()
    )
    wide = shingle_docs(docs_tbl, k)
    a = wide.alias("a")
    b = wide.alias("b")
    want = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size("a.sh"),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= 0.8)
        .collect()
    )
    assert got == want
    assert any(x[0] == 0 and x[1] == 1 for x in got)


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


def test_screen_exact_mode_recovers_cap_lost_pairs(spark):
    """max_bucket=None (r12 exact mode): the posting side is
    semi-joined on the probe shingles, so a new doc whose every probe
    is 'boilerplate' (df above any static cap) still finds its corpus
    container — the capped mode provably loses exactly this pair."""
    from kafka_overwatch_spark.pipelines.dedup import (
        screen_containment_against_corpus,
        shingle_docs,
    )

    boiler = "alpha beta gamma delta epsilon zeta"
    corpus = spark.createDataFrame(
        [(100 + i, "en", "web", boiler + f" tail{i}") for i in range(5)],
        DOC_SCHEMA,
    )
    # new doc = pure boilerplate: contained in every corpus doc; all
    # its shingles have corpus df >= 4 (well above the tight cap)
    new = _docs(spark, [boiler])
    cs = shingle_docs(corpus)
    ns = shingle_docs(new)
    capped = screen_containment_against_corpus(ns, cs, max_bucket=2)
    exact = screen_containment_against_corpus(ns, cs, max_bucket=None)
    assert capped.count() == 0  # the documented cap recall risk
    got = {(r.new_doc, r.corpus_doc) for r in exact.collect()}
    assert len(got) == 5 and all(a == 0 for a, _b in got)


def test_screen_exact_mode_matches_capped_when_cap_unbinding(spark):
    from kafka_overwatch_spark.pipelines.dedup import (
        screen_containment_against_corpus,
        shingle_docs,
    )

    corpus = _docs(
        spark,
        ["one two three four five six seven",
         "totally different corpus text entry here"],
    )
    new = _docs(spark, ["one two three four five six seven and more",
                        "unrelated new arrival document text"])
    cs = shingle_docs(corpus)
    ns = shingle_docs(new)
    a = sorted(
        (r.new_doc, r.corpus_doc, r.containment)
        for r in screen_containment_against_corpus(ns, cs).collect()
    )
    b = sorted(
        (r.new_doc, r.corpus_doc, r.containment)
        for r in screen_containment_against_corpus(
            ns, cs, max_bucket=None
        ).collect()
    )
    assert a == b


def test_semantic_split_leakage_planted_pairs(spark):
    """Plant identical vectors on opposite sides of the deterministic
    split: every train↔eval near-dup pair must surface with the eval
    side in eval_vec, and train↔train / eval↔eval pairs must not."""
    import hashlib

    from kafka_overwatch_spark.pipelines.similarity import (
        semantic_split_leakage,
    )

    def split_of(vec_id: int) -> str:
        b = int(
            hashlib.md5(f"split:{vec_id}".encode()).hexdigest()[:15], 16
        ) % 10_000
        return "train" if b < 9000 else ("val" if b < 9500 else "test")

    train_ids = [i for i in range(400) if split_of(i) == "train"][:3]
    eval_ids = [i for i in range(400) if split_of(i) != "train"][:3]
    # three identical clusters, each holding one train and one eval
    # vector (guaranteed same LSH bucket at every width), plus noise
    rows = []
    for k, (t, e) in enumerate(zip(train_ids, eval_ids)):
        v = _unit(k)
        rows += [(t, v), (e, v)]
    rows += [(1000 + i, _unit(20 + i)) for i in range(4)]  # singletons
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = semantic_split_leakage(df, bits=8)
    got = {
        (r.eval_vec, r.eval_split, r.train_vec, r.cosine)
        for r in out.collect()
    }
    want = {
        (e, split_of(e), t, 1.0)
        for t, e in zip(train_ids, eval_ids)
    }
    assert got == want
