"""r9 operator wave: the bot-skew touch cap on multi-touch
attribution (fan-out bound before the conversion join) and the
re-planned bootstrap draw (md5 once per row + integer replicate
mixing) — unit semantics on constructed fixtures; the oracle sweep
covers parity at sf0.01."""

from __future__ import annotations

from kafka_overwatch_spark.operators import relational

from tests.test_r8_operators import _events


def test_attribution_touch_cap_keeps_most_recent(spark):
    # user 1: click d1, view d2, email d3, click d4, view d5, email d6,
    # purchase d7. Uncapped path n=6 (first = click@d1). Capped at 3
    # the touch stream truncates to {click d4, view d5, email d6}:
    # n=3, first=click, last=email, linear 1/3 each, position
    # .4 click / .2 view / .4 email.
    ev = _events(
        spark,
        [
            (1, 1, 9, "click", 1.0),
            (1, 2, 9, "view", 1.0),
            (1, 3, 9, "email", 1.0),
            (1, 4, 9, "click", 1.0),
            (1, 5, 9, "view", 1.0),
            (1, 6, 9, "email", 1.0),
            (1, 7, 9, "purchase", 9.0),
        ],
    )
    un = {
        r["channel"]: r
        for r in relational.attribution_models(ev).collect()
    }
    assert un["click"]["conversions_first"] == 1
    assert abs(sum(r["credit_linear"] for r in un.values()) - 1.0) < 1e-5

    capped = {
        r["channel"]: r
        for r in relational.attribution_models(
            ev, max_touches_per_user=3
        ).collect()
    }
    assert capped["click"]["conversions_first"] == 1  # click@d4 now first
    assert capped["email"]["conversions_last"] == 1
    assert abs(capped["click"]["credit_linear"] - 1 / 3) < 1e-6
    assert abs(capped["view"]["credit_position"] - 0.2) < 1e-6
    assert abs(capped["click"]["credit_position"] - 0.4) < 1e-6


def test_attribution_cap_bounds_bot_fanout(spark):
    # a bot-grade user: 10 purchases, 200 touches, all inside the
    # 7-day lookback. Uncapped fan-out = 10 x 200 = 2000 path rows;
    # capped at 20 it is <= 10 x 20 = 200. The cap keeps results a
    # valid attribution (credits still sum to conversions).
    rows = []
    for i in range(200):
        rows.append((9, 1 + i % 6, 1 + i % 23, "click", 1.0))
    for p in range(10):
        rows.append((9, 7, p + 1, "purchase", 5.0))
    ev = _events(spark, rows)
    capped = relational.attribution_models(
        ev, max_touches_per_user=20
    ).collect()
    total_linear = sum(r["credit_linear"] for r in capped)
    # every purchase whose lookback still has >= 1 kept touch credits
    # exactly 1.0 linearly; the cap keeps the most recent 20 touches
    # (days 28..31-ish), so purchases early in the month may have none
    assert 0 < total_linear <= 10.0 + 1e-6


def test_bootstrap_mixing_is_row_grain(spark):
    # the re-planned draw must keep determinism and CI ordering
    ev = _events(
        spark,
        [(u, 1 + u % 5, 9, "click", float(5 + u % 11)) for u in range(60)],
    )
    a = relational.bootstrap_value_ci(ev, replicates=40).collect()[0]
    b = relational.bootstrap_value_ci(ev, replicates=40).collect()[0]
    assert a == b
    assert a["ci_lo"] <= a["mean_value"] <= a["ci_hi"]


def test_readability_on_constructed_text(spark):
    from kafka_overwatch_spark.pipelines.text import readability_scores

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!", "en", "s", 25),
            (2, "", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r = rows[1]
    # words: The cat sat The dog ran = 6; sentences: '.' '!' = 2;
    # syllables (vowel groups): e,a,a,e,o,a = 6
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert abs(r["flesch_reading_ease"] - 119.19) < 1e-6
    # empty doc floors keep the row finite
    assert rows[2]["flesch_reading_ease"] is not None


def test_benford_digit_extraction(spark):
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    # values 0.03 -> micros 30000 -> digit 3; 327.53 -> digit 3;
    # 12.0 -> digit 1; 0.95 -> digit 9
    ev = _events(
        spark,
        [
            (1, 1, 9, "a", 0.03),
            (2, 1, 9, "a", 327.53),
            (3, 1, 9, "a", 12.0),
            (4, 1, 9, "a", 0.95),
        ],
    )
    rows = {r["digit"]: r for r in relational.benford_audit(ev).collect()}
    assert rows[3]["n"] == 2 and rows[1]["n"] == 1 and rows[9]["n"] == 1
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-5


def test_benford_sub_micro_values_dropped(spark):
    """r9 advisor fix gate: a value in (0, 5e-7) rounds to 0
    micro-units — its 'digit 0' has no Benford expectation
    (log10(1 + 1/0): NULL in Spark, +inf in DuckDB) and must be
    excluded, not emitted as a meaningless digit-0 row."""
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    ev = _events(
        spark,
        [
            (1, 1, 9, "a", 1e-7),   # micros 0 -> dropped
            (2, 1, 9, "a", 4e-7),   # micros 0 -> dropped
            (3, 1, 9, "a", 6e-7),   # micros 1 -> digit 1
            (4, 1, 9, "a", 2.0),    # digit 2
        ],
    )
    rows = {r["digit"]: r for r in relational.benford_audit(ev).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n"] == 1 and rows[2]["n"] == 1
    # shares re-normalize over the kept rows only
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-5


def test_t_closeness_constant_values_single_bin(spark):
    """r9 advisor fix gate: vmax == vmin must not divide by zero
    (NULL bins in Spark vs inf/NaN in DuckDB) — all-equal values are
    one bin, so every class matches the global distribution exactly."""
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    ev = _events(
        spark,
        [(u, 1 + u % 2, 9, "a", 5.0) for u in range(8)],
    )
    r = relational.t_closeness_audit(ev).collect()[0]
    assert r["qi_classes"] == 2
    assert r["max_tvd"] == 0.0 and r["avg_tvd"] == 0.0
    assert r["classes_above_t"] == 0


def test_t_closeness_uniform_class_is_zero(spark):
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    # one class whose distribution IS the global distribution -> tvd 0
    ev = _events(spark, [(u, 1, 9, "a", float(v)) for u, v in
                         enumerate([1, 2, 3, 4, 5, 6, 7, 8])])
    r = relational.t_closeness_audit(ev).collect()[0]
    assert r["qi_classes"] == 1
    assert r["max_tvd"] == 0.0
    assert r["classes_above_t"] == 0


def test_matryoshka_full_width_is_self_consistent(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import matryoshka_audit

    emb = spark.table("embeddings")
    rows = matryoshka_audit(emb).collect()
    assert len(rows) == 10
    for r in rows:
        # overlap is between 0 and k, MAE non-negative and small for
        # the quarter cut to still be informative
        assert 0 <= r["overlap_half"] <= 5
        assert 0 <= r["overlap_quarter"] <= r["overlap_half"] + 5
        assert r["mae_half"] >= 0 and r["mae_quarter"] >= r["mae_half"] - 1e-6


def test_neyman_allocation_sums_and_floors(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import neyman_allocation

    docs = spark.table("documents")
    rows = neyman_allocation(docs, budget=1000).collect()
    assert abs(sum(r["alloc_frac"] for r in rows) - 1.0) < 1e-4
    assert sum(r["alloc_n"] for r in rows) <= 1000
    for r in rows:
        assert r["alloc_n"] <= 1000 * r["alloc_frac"] + 1


def test_theil_sen_on_linear_series_with_outlier(spark):
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    # days 1..9: 2 events/day except day 5 has 20 (outlier). The Sen
    # slope of a flat-with-one-spike series stays 0 (median of pairwise
    # slopes), where OLS would tilt.
    rows = []
    eid = 0
    for d in range(1, 10):
        n = 20 if d == 5 else 2
        for _ in range(n):
            rows.append((1, d, 9, "click", 1.0))
            eid += 1
    ev = _events(spark, rows)
    r = relational.theil_sen_trend(ev).collect()[0]
    assert r["n_days"] == 9
    assert r["sen_slope"] == 0.0
    # S sums +8 (pairs into day 5) and -4... sign-balance: every pair
    # not involving day 5 ties (sign 0); day 5 gains +4 from earlier
    # days and +4 against later days -> S = 4 - 4 = 0
    assert r["mk_s"] == 0


def test_vocab_richness_constructed(spark):
    from kafka_overwatch_spark.pipelines.text import vocab_richness

    docs = spark.createDataFrame(
        [
            (1, "a a b c", "en", "s", 7),
            (2, "a b d", "en", "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    r = vocab_richness(docs).collect()[0]
    # counts: a=3, b=2, c=1, d=1 -> D=4, N=7, f1=2, f2=1
    assert (r["distinct_types"], r["total_tokens"], r["f1"], r["f2"]) == (
        4, 7, 2, 1,
    )
    # chao1 = 4 + 2*2/(2*1) = 6; gt = 2/7
    assert r["chao1_estimate"] == 6.0
    assert abs(r["gt_unseen_mass"] - 2 / 7) < 1e-6


def test_streaming_benford_monitor(spark, tmp_path):
    """Per-batch releases are replay-deterministic; the lifetime
    rollup over released digit counts equals the batch audit over the
    concatenated feed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_overwatch_spark.operators.relational import benford_audit
    from kafka_overwatch_spark.streaming.events_stream import (
        BenfordMonitor,
        benford_lifetime,
    )
    from tests.test_r8_operators import EVENT_COLS

    def mk(vals, start_id):
        return spark.createDataFrame(
            [(start_id + i, 1, dt.datetime(2024, 1, 1, 9), "click", v)
             for i, v in enumerate(vals)],
            EVENT_COLS,
        ).withColumn("props", F.lit(None).cast("string"))

    b0 = mk([1.1, 2.2, 19.0, 31.4, 99.0], 0)
    b1 = mk([5.5, 0.41, 0.47, 88.0], 100)
    out = str(tmp_path / "benford")
    mon = BenfordMonitor(out)
    mon(b0, 0)
    first = sorted(tuple(r) for r in spark.read.parquet(out)
                   .filter(F.col("batch_id") == 0).collect())
    mon(b0, 0)  # replay overwrites its own partition byte-identically
    again = sorted(tuple(r) for r in spark.read.parquet(out)
                   .filter(F.col("batch_id") == 0).collect())
    assert first == again
    mon(b1, 1)
    life = {r["digit"]: r for r in benford_lifetime(spark, out).collect()}
    want = {
        r["digit"]: r for r in benford_audit(b0.unionByName(b1)).collect()
    }
    assert set(life) == set(want)
    for d in want:
        assert life[d]["n"] == want[d]["n"]
        assert life[d]["share"] == want[d]["share"]
        assert life[d]["excess"] == want[d]["excess"]


def test_transition_entropy_deterministic_funnel(spark):
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    # user journeys: click -> view (always); view -> {click, email}
    # 50/50. H(click)=0, H(view)=1 bit, perplexity 2.
    rows = []
    for u in range(4):
        rows += [
            (u, 1, 8, "click", 1.0),
            (u, 1, 9, "view", 1.0),
            (u, 1, 10, "click" if u % 2 else "email", 1.0),
        ]
    ev = _events(spark, rows)
    out = {
        r["from_type"]: r
        for r in relational.transition_entropy(ev).collect()
    }
    assert out["click"]["entropy_bits"] == 0.0
    assert out["view"]["entropy_bits"] == 1.0
    assert out["view"]["perplexity"] == 2.0
    assert out["view"]["n_next_types"] == 2


def test_interarrival_gaps_constructed(spark):
    from tests.test_r8_operators import _events
    from kafka_overwatch_spark.operators import relational

    # one user: events at hours 1, 2, 4 -> gaps 3600 (click), 7200 (view)
    ev = _events(
        spark,
        [
            (1, 1, 1, "click", 1.0),
            (1, 1, 2, "view", 1.0),
            (1, 1, 4, "click", 1.0),
        ],
    )
    out = {
        r["event_type"]: r
        for r in relational.interarrival_stats(ev).collect()
    }
    assert out["click"]["n_gaps"] == 1 and out["click"]["mean_gap_sec"] == 3600.0
    assert out["view"]["p50_gap_sec"] == 7200.0


def test_rrf_fusion_contains_consensus_neighbors(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import (
        mips_topk,
        rrf_fusion,
    )
    from kafka_overwatch_spark.pipelines.similarity import (
        matryoshka_audit,  # noqa: F401 — same query-sample convention
    )

    emb = spark.table("embeddings")
    fused = rrf_fusion(emb).collect()
    assert len(fused) == 50  # 10 queries x top-5
    by_q = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda x: x["rank"])]
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["rrf_score"] for r in sorted(rows, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)
        # fused score is bounded by the two best possible ranks
        assert scores[0] <= 2 / 61 + 1e-6


def test_hill_tail_index_on_pareto_sample(spark):
    from kafka_overwatch_spark.pipelines.text import hill_tail_index

    # exact Pareto(alpha=2) quantile sample: x_i = (n/i)^(1/2) * xm —
    # the Hill estimator over such order statistics recovers ~alpha
    n, xm = 2000, 100.0
    rows = [
        (i, "t", "en", "s", int(round(xm * (n / i) ** 0.5)))
        for i in range(1, n + 1)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = hill_tail_index(docs, k=100).collect()[0]
    assert r["k"] == 100
    assert 1.6 < r["alpha"] < 2.4  # estimator noise band around 2
    assert 0 < r["tail_mass_frac"] < 1


def test_kfold_covers_all_docs_and_is_balanced(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import kfold_assignment

    docs = spark.table("documents")
    rows = kfold_assignment(docs, folds=5).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == docs.count()
    assert {r["fold"] for r in rows} <= set(range(5))
    # per-source fold fractions sum to 1
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], 0.0)
        by_src[r["source"]] += r["fold_frac"]
    for s, f in by_src.items():
        assert abs(f - 1.0) < 1e-4, (s, f)


def test_quality_drift_monitor_detects_mean_shift(spark, tmp_path):
    """Releases are replay-deterministic and the CUSUM flags the batch
    where corpus quality drops; the lifetime mean recomposes exactly
    from the mergeable (count, score_sum) summaries."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.streaming.documents_stream import (
        QualityDriftMonitor,
        quality_drift_from_releases,
    )

    def docs(texts, start):
        return spark.createDataFrame(
            [(start + i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )

    good = ["the quick brown fox is a fine animal and it runs far"] * 8
    bad = ["!!!! ???? ####"] * 8
    out = str(tmp_path / "drift")
    mon = QualityDriftMonitor(out)
    mon(docs(good, 0), 0)
    first = sorted(tuple(r) for r in spark.read.parquet(out)
                   .filter(F.col("batch_id") == 0).collect())
    mon(docs(good, 0), 0)  # replay: byte-identical partition rewrite
    again = sorted(tuple(r) for r in spark.read.parquet(out)
                   .filter(F.col("batch_id") == 0).collect())
    assert first == again
    mon(docs(good, 100), 1)
    mon(docs(bad, 200), 2)
    rows = {r["batch_id"]: r for r in
            quality_drift_from_releases(spark, out).collect()}
    assert rows[0]["cusum_lo"] == 0.0 and rows[0]["cusum_hi"] == 0.0
    assert rows[1]["cusum_lo"] < 1e-6  # same-quality batch: no drift
    assert rows[2]["cusum_lo"] > 0.05  # quality collapse flagged
    assert rows[2]["mean_score"] < rows[0]["mean_score"]


def test_lsh_recall_audit_laws(spark, snaps):
    from kafka_overwatch_spark.pipelines.similarity import lsh_recall_audit

    emb = spark.table("embeddings")
    rows = lsh_recall_audit(emb).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["hits"] <= 5
        assert abs(r["recall_at_k"] - r["hits"] / 5.0) < 1e-9
        # hits can't exceed what the bucket held
        assert r["hits"] <= max(r["n_candidates"], 0) or r["hits"] == 0


def test_dsir_ess_laws(spark, snaps):
    from kafka_overwatch_spark.pipelines.sampling import dsir_ess

    docs = spark.table("documents")
    rows = dsir_ess(docs).collect()
    assert rows
    for r in rows:
        # 1 <= ESS <= n always; frac in (0, 1]
        assert 1.0 - 1e-6 <= r["ess"] <= r["n_docs"] + 1e-6
        assert 0 < r["ess_frac"] <= 1.0 + 1e-9
