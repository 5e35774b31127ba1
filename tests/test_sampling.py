"""Dataset assembly: deterministic hash splits, stratified sampling, and
token-window chunking — reproducibility and coverage invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_split_deterministic_under_repartition(spark, snaps):
    """The split must not depend on physical partitioning — the failure
    mode of seeded df.sample() that hash bucketing exists to fix."""
    from kafka_overwatch_spark.pipelines.sampling import deterministic_split

    docs = spark.table("documents")
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(7)).collect()
    }
    assert a == b and len(a) == docs.count()
    # proportions within a loose tolerance of the weights
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    assert 0.85 <= train <= 0.95
    assert set(a.values()) == {"train", "val", "test"}


def test_stratified_sample_membership_stable(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import stratified_sample

    docs = spark.table("documents")
    kept = {r["doc_id"] for r in stratified_sample(docs, 0.2).collect()}
    n = docs.count()
    assert 0.1 * n <= len(kept) <= 0.3 * n
    # growing the fraction only ADDS docs (nested samples — the property
    # that makes hash sampling usable for dataset scaling curves)
    kept_half = {r["doc_id"] for r in stratified_sample(docs, 0.5).collect()}
    assert kept <= kept_half


def test_source_mix_membership_stable_and_rates(spark, snaps):
    """Mix membership is a pure function of doc_id (partitioning-
    invariant) and realized per-source rates track the configured
    targets."""
    from kafka_overwatch_spark.pipelines.sampling import (
        MIX_DEFAULT_RATE,
        MIX_RATES,
        source_mix_keep,
        source_mix_summary,
    )

    docs = spark.table("documents")
    a = {r["doc_id"]: r["keep"] for r in source_mix_keep(docs).collect()}
    b = {
        r["doc_id"]: r["keep"]
        for r in source_mix_keep(docs.repartition(7)).collect()
    }
    assert a == b and len(a) == docs.count()
    for row in source_mix_summary(docs).collect():
        rate = MIX_RATES.get(row["source"], MIX_DEFAULT_RATE)
        assert row["target_rate"] == rate
        assert 0 <= row["kept_docs"] <= row["total_docs"]
        assert row["kept_chars"] <= row["total_chars"]
        # realized rate within a loose tolerance at fixture size
        assert abs(row["kept_frac"] - rate) <= 0.35


def test_temperature_weights_flatten_distribution(spark, snaps):
    """τ<1 must flatten: sampling probs are less spread than raw shares,
    bigger sources get strictly lower acceptance rates, and the smallest
    source is kept whole."""
    from kafka_overwatch_spark.pipelines.sampling import temperature_weights

    rows = temperature_weights(spark.table("documents")).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["sample_prob"] for r in rows) - 1.0) < 1e-4
    by_docs = sorted(rows, key=lambda r: r["docs"])
    assert by_docs[0]["accept_rate"] == 1.0
    for small, big in zip(by_docs, by_docs[1:]):
        if small["docs"] < big["docs"]:
            assert small["accept_rate"] > big["accept_rate"]
            # flattening: prob ratio is compressed vs share ratio
            assert (
                big["sample_prob"] / small["sample_prob"]
                < big["share"] / small["share"] + 1e-9
            )


def test_chunks_cover_and_overlap(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        chunk_documents,
    )

    docs = spark.table("documents")
    chunks = chunk_documents(docs)
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    rows = chunks.filter(F.col("doc_id") < 50).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") < 50).collect()
    }
    assert by_doc
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        toks = texts[doc_id].strip().split()
        # chunk_ids dense from 0; every token covered exactly per window
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        rebuilt: list = []
        for r in rs:
            ct = r["chunk_text"].split(" ")
            assert r["n_tokens"] == len(ct) <= CHUNK_TOKENS
            start = r["chunk_id"] * step
            assert ct == toks[start : start + CHUNK_TOKENS]
            rebuilt = rebuilt[:start] + ct
        assert rebuilt == toks


def test_chunk_param_validation(spark, snaps):
    import pytest

    from kafka_overwatch_spark.pipelines.sampling import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(spark.table("documents"), chunk_tokens=8, overlap=8)


def test_pack_sequences_matches_python_reference(spark, snaps):
    """Spark next-fit packing must equal a pure-Python next-fit over the
    same deterministically-ordered chunks, and respect the budget."""
    from kafka_overwatch_spark.pipelines.sampling import (
        PACK_BUDGET,
        chunk_documents,
        pack_sequences,
    )

    docs = spark.table("documents").filter(F.col("doc_id") < 80)
    chunks = chunk_documents(docs)
    got = {
        (r["group"], r["doc_id"], r["chunk_id"]): (r["bin_id"], r["bin_fill"])
        for r in pack_sequences(chunks).collect()
    }
    # python reference
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_tokens"]) for r in chunks.collect())
    )
    want = {}
    by_group: dict = {}
    for doc_id, chunk_id, n in rows:
        by_group.setdefault(doc_id, []).append((doc_id, chunk_id, n))
    for g, items in by_group.items():
        cur_bin, cur_fill = 0, 0
        for doc_id, chunk_id, n in items:
            if cur_fill > 0 and cur_fill + n > PACK_BUDGET:
                cur_bin, cur_fill = cur_bin + 1, 0
            cur_fill += n
            want[(str(g), doc_id, chunk_id)] = (cur_bin, cur_fill)
    assert got == want
    # budget respected except bins holding a SINGLE oversize chunk: any
    # bin over budget must contain exactly one chunk of its group
    bin_members: dict = {}
    for (g, d, c), (b, fill) in got.items():
        bin_members.setdefault((g, b), []).append(fill)
    for (g, b), fills in bin_members.items():
        if max(fills) > PACK_BUDGET:
            assert len(fills) == 1, (g, b, fills)


def test_parse_roundtrips_property():
    """Hypothesis: filename/resolve-string parsers invert their builders."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_overwatch_spark.secrets import parse_resolve_string
    from kafka_overwatch_spark.sinks.sr_backup import parse_backup_filename

    name = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=200, deadline=None)
    @given(subject=name, version=st.integers(1, 999),
           stype=st.sampled_from(["AVRO", "JSON", "PROTOBUF"]),
           sid=st.integers(1, 10**6))
    def roundtrip_backup(subject, version, stype, sid):
        fn = f"{subject}::{version}::{stype}::{sid}.txt"
        meta = parse_backup_filename(fn)
        assert meta == {
            "subject": subject, "version": version,
            "schema_type": stype, "schema_id": sid,
        }

    @settings(max_examples=200, deadline=None)
    @given(secret=name, key=name, ver=name)
    def roundtrip_resolve(secret, key, ver):
        s = f"{{{{resolve:secretsmanager:{secret}:SecretString:{key}:{ver}}}}}"
        assert parse_resolve_string(s) == (secret, key, ver)

    roundtrip_backup()
    roundtrip_resolve()


def test_render_template_never_leaves_markers_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_overwatch_spark.sinks.notifications import (
        EMAIL_TEMPLATE,
        render_usage_report_message,
    )

    txt = st.text(
        alphabet=st.characters(blacklist_characters="{}%"), max_size=40
    )

    @settings(max_examples=200, deadline=None)
    @given(cluster=txt, url=st.one_of(st.none(), txt),
           signed=st.one_of(st.none(), txt))
    def check(cluster, url, signed):
        out = render_usage_report_message(
            EMAIL_TEMPLATE, cluster, s3_url=url, s3_signed_url=signed
        )
        assert "{{" not in out and "{%" not in out
        if signed:
            assert signed in out

    check()


def test_upsample_plan_rates_and_materialization(spark, snaps):
    """Repeats are floor(rate) or floor(rate)+1, realized copy counts
    track the configured rate, and materialization emits exactly
    `repeats` rows per doc."""
    from kafka_overwatch_spark.pipelines.sampling import (
        UPSAMPLE_DEFAULT_RATE,
        UPSAMPLE_RATES,
        materialize_upsample,
        upsample_plan,
    )

    docs = spark.table("documents")
    plan = {r["doc_id"]: (r["source"], r["repeats"])
            for r in upsample_plan(docs).collect()}
    assert len(plan) == docs.count()
    by_source: dict = {}
    for src, rep in plan.values():
        rate = UPSAMPLE_RATES.get(src, UPSAMPLE_DEFAULT_RATE)
        assert rep in (int(rate), int(rate) + 1), (src, rep, rate)
        tot, n = by_source.get(src, (0, 0))
        by_source[src] = (tot + rep, n + 1)
    for src, (tot, n) in by_source.items():
        rate = UPSAMPLE_RATES.get(src, UPSAMPLE_DEFAULT_RATE)
        assert abs(tot / n - rate) <= 0.5, (src, tot / n, rate)
    copies: dict = {}
    for r in materialize_upsample(docs).collect():
        copies[r["doc_id"]] = copies.get(r["doc_id"], 0) + 1
    assert copies == {d: rep for d, (_, rep) in plan.items()}


def test_weighted_sample_matches_python_reference(spark, snaps):
    """A-ES draw equals a straight-Python fold of the same md5-uniform
    and pow key, including the top-k cut and the doc_id tie-break."""
    import hashlib

    from kafka_overwatch_spark.pipelines.sampling import weighted_sample

    docs = spark.table("documents")
    rows = docs.select("doc_id", "n_chars").collect()
    keyed = []
    for r in rows:
        h = int(
            hashlib.md5(f"aes-v1:{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(2**60)
        keyed.append((u ** (1.0 / max(r["n_chars"], 1)), r["doc_id"]))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = [d for _, d in keyed[:50]]
    got = [r["doc_id"] for r in weighted_sample(docs, k=50).collect()]
    assert sorted(got) == sorted(want)


def test_weighted_sample_prefers_heavy_rows(spark):
    """Weighting property: with weights 1000 vs 1 over two halves of a
    200-row frame, a k=50 draw must be dominated by the heavy half."""
    from kafka_overwatch_spark.pipelines.sampling import weighted_sample

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 1000).otherwise(1).alias("n_chars"),
    )
    got = weighted_sample(df, k=50).collect()
    heavy = sum(1 for r in got if r["doc_id"] < 100)
    assert heavy >= 45


def test_pack_fold_matches_python_next_fit_property(spark):
    """Property test for the r7 JVM fold rewrite: on adversarial chunk
    shapes (oversized chunks, exact-budget fits, singletons) the fold
    must equal the textbook next-fit loop — including the rule that an
    over-budget chunk opens its own bin rather than splitting."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_overwatch_spark.pipelines.sampling import pack_sequences

    budget = 16

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.integers(min_value=1, max_value=40), min_size=1, max_size=30
        )
    )
    def check(sizes):
        rows = [(0, i, int(t)) for i, t in enumerate(sizes)]
        chunks = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        )
        got = {
            (r["chunk_id"]): (r["bin_id"], r["bin_fill"])
            for r in pack_sequences(chunks, budget_tokens=budget).collect()
        }
        cur_bin, cur_fill, want = 0, 0, {}
        for i, t in enumerate(sizes):
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            cur_fill += t
            want[i] = (cur_bin, cur_fill)
        assert got == want

    check()


def test_dsir_weights_match_python_reference(spark, snaps):
    """DSIR log-likelihood-ratio weights equal a straight-Python fold of
    the same hashed-unigram LMs (add-one smoothing, 4096 buckets)."""
    import hashlib
    import math

    from kafka_overwatch_spark.pipelines.sampling import dsir_weights

    docs = spark.table("documents")
    rows = docs.select("doc_id", "source", "text").collect()
    B = 4096
    ct, cr = [0] * B, [0] * B
    doc_buckets = {}
    for r in rows:
        toks = " ".join(r["text"].strip().split()).lower().split(" ")
        bs = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
            for t in toks
        ]
        doc_buckets[r["doc_id"]] = (r["source"], bs)
        for b in bs:
            if r["source"] == "src0":
                ct[b] += 1
            else:
                cr[b] += 1
    tt, tr = sum(ct), sum(cr)
    ld = [
        math.log((ct[b] + 1.0) / (tt + B)) - math.log((cr[b] + 1.0) / (tr + B))
        for b in range(B)
    ]
    want = {
        d: round(sum(ld[b] for b in bs), 6)
        for d, (_, bs) in doc_buckets.items()
    }
    got = {
        r["doc_id"]: r["log_ratio"] for r in dsir_weights(docs).collect()
    }
    assert got == want and len(got) == 500


def test_dsir_prefers_target_domain(spark, snaps):
    """Directional property: PER-TOKEN, the target LM assigns its own
    domain's unigrams higher likelihood, so the mean per-token log
    ratio of target docs must exceed raw docs'. (The summed weight is
    deliberately length-biased — the paper's bag-LM weight — so the
    check normalizes by n_tokens.)"""
    from kafka_overwatch_spark.pipelines.sampling import dsir_weights

    docs = spark.table("documents")
    w = dsir_weights(docs)
    means = {
        r["is_t"]: r["m"]
        for r in w.groupBy((F.col("source") == "src0").alias("is_t"))
        .agg(F.avg(F.col("log_ratio") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_nb_classifier_separates_disjoint_vocabularies(spark):
    """Constructed witness: two sources with disjoint vocabularies must
    self-classify perfectly, and scores must carry the add-one floor
    for cross-source buckets (no NULL/missing-bucket holes)."""
    from kafka_overwatch_spark.pipelines.sampling import nb_source_classifier

    rows = [(i, " ".join(f"alpha{j}" for j in range(20)), "en", "srcA")
            for i in range(10)]
    rows += [(100 + i, " ".join(f"beta{j}" for j in range(20)), "en", "srcB")
             for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = nb_source_classifier(docs).collect()
    assert len(out) == 20
    assert all(r["correct"] for r in out)


def test_nb_classifier_beats_chance_on_corpus(spark, snaps):
    """On the real corpus the hashed-unigram LMs must carry SOME
    provenance signal: self-classification accuracy above the
    uniform-chance floor (sources share most vocabulary, so the bar is
    above-chance, not high)."""
    from kafka_overwatch_spark.pipelines.sampling import nb_source_classifier

    docs = spark.table("documents")
    n_sources = docs.select("source").distinct().count()
    out = nb_source_classifier(docs)
    acc = out.filter("correct").count() / out.count()
    assert acc > 1.2 / n_sources, (acc, n_sources)
