"""r10 inference wave: exact Shapley attribution over session
touch-sets, CUPED variance reduction, OLS trend inference — unit
semantics on hand-computed fixtures; the oracle sweep covers parity
at sf0.01."""

from __future__ import annotations

import pytest

from kafka_overwatch_spark.operators import relational

from tests.test_r8_operators import _events


def test_shapley_hand_computed_and_efficiency(spark):
    # sessions (one user each, all same day): 4×{click} with 2
    # conversions → v(1)=.5; 2×{view} 0 conv → v(8)=0;
    # 2×{click,view} both conv → v(9)=1. Hand Shapley (n=4 lattice):
    # click .25(v1−v0) + 1/12(v9−v8) = .125+.083333; view
    # 1/12(v9−v1) = .041667; error/signup each pay −.125 (they
    # "break" observed coalitions into unobserved v=0 sets).
    rows = []
    for u in (1, 2):
        rows += [(u, 1, 9, "click", 1.0), (u, 1, 10, "purchase", 5.0)]
    rows += [(3, 1, 9, "click", 1.0), (4, 1, 9, "click", 1.0)]
    rows += [(5, 1, 9, "view", 1.0), (6, 1, 9, "view", 1.0)]
    for u in (7, 8):
        rows += [
            (u, 1, 9, "click", 1.0),
            (u, 1, 10, "view", 1.0),
            (u, 1, 11, "purchase", 5.0),
        ]
    out = {
        r["channel"]: r
        for r in relational.shapley_attribution(_events(spark, rows)).collect()
    }
    assert out["click"]["shapley_credit"] == pytest.approx(0.208333, abs=1e-6)
    assert out["view"]["shapley_credit"] == pytest.approx(0.041667, abs=1e-6)
    assert out["error"]["shapley_credit"] == pytest.approx(-0.125, abs=1e-6)
    assert out["signup"]["shapley_credit"] == pytest.approx(-0.125, abs=1e-6)
    # efficiency: Σφ = v(full)−v(∅) = 0−0 here, so shares NULL-guard
    assert sum(r["shapley_credit"] for r in out.values()) == pytest.approx(
        0.0, abs=1e-6
    )
    assert all(r["share"] is None for r in out.values())
    assert out["click"]["sessions_with_channel"] == 6
    assert out["view"]["sessions_with_channel"] == 4
    assert out["error"]["sessions_with_channel"] == 0


def test_cuped_perfect_covariate_removes_all_variance(spark):
    # Y = 2X exactly in arm 0, Y = 2X + 5 in arm 1, same X design in
    # both arms → pooled θ = 2 exactly, CUPED strips ALL within-arm
    # variance (var_reduction = 1, z_cuped NULL-guards on zero SE)
    # while preserving the arm means.
    rows = []
    for u, x in ((0, 10.0), (2, 20.0), (4, 30.0)):
        rows += [(u, 1, 9, "view", x), (u, 20, 9, "view", 2 * x)]
    for u, x in ((1, 10.0), (3, 20.0), (5, 30.0)):
        rows += [(u, 1, 9, "view", x), (u, 20, 9, "view", 2 * x + 5)]
    r = relational.cuped_adjusted_ab(_events(spark, rows)).collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["theta"] == pytest.approx(2.0, abs=1e-6)
    assert r["mean_a_raw"] == pytest.approx(40.0, abs=1e-6)
    assert r["mean_b_raw"] == pytest.approx(45.0, abs=1e-6)
    assert r["mean_a_cuped"] == pytest.approx(40.0, abs=1e-6)
    assert r["mean_b_cuped"] == pytest.approx(45.0, abs=1e-6)
    assert r["var_reduction"] == pytest.approx(1.0, abs=1e-6)
    assert r["z_raw"] is not None
    assert r["z_cuped"] is None  # zero residual variance → guarded


def test_ols_trend_exact_line_and_short_series(spark):
    # 'click' daily counts 2,4,6 → slope 2, r2 1, zero residual → se 0
    # → t NULL; 'view' has 2 days → se/t NULL (needs n > 2), slope 2.
    rows = []
    for d, n in ((1, 2), (2, 4), (3, 6)):
        rows += [(1, d, h, "click", 1.0) for h in range(n)]
    rows += [(1, 1, 9, "view", 1.0)] + [
        (1, 2, h, "view", 1.0) for h in (9, 10, 11)
    ]
    out = {
        r["event_type"]: r
        for r in relational.ols_daily_trend(_events(spark, rows)).collect()
    }
    c = out["click"]
    assert c["days"] == 3
    assert c["slope"] == pytest.approx(2.0, abs=1e-6)
    assert c["fit_start"] == pytest.approx(2.0, abs=1e-6)
    assert c["fit_end"] == pytest.approx(6.0, abs=1e-6)
    assert c["r2"] == pytest.approx(1.0, abs=1e-6)
    assert c["t_stat"] is None  # exact fit → zero SE guard
    v = out["view"]
    assert v["days"] == 2
    assert v["slope"] == pytest.approx(2.0, abs=1e-6)
    assert v["slope_se"] is None and v["t_stat"] is None


def test_markov_removal_effect_hand_computed(spark):
    # sessions: u1 click→purchase, u2 click (null), u3 view→purchase,
    # u4 purchase-only (start→conv direct). T: start→{click .5,
    # view .25, conv .25}; click→{conv .5, null .5}; view→conv 1.
    # p_full = .25 + .5·.5 + .25 = .75; removing click OR view each
    # drop it to .5 → removal effects 1/3 and 1/3, shares .5/.5;
    # error/signup are untouched channels → effect 0.
    rows = [
        (1, 1, 9, "click", 1.0),
        (1, 1, 10, "purchase", 5.0),
        (2, 1, 9, "click", 1.0),
        (3, 1, 9, "view", 1.0),
        (3, 1, 10, "purchase", 5.0),
        (4, 1, 9, "purchase", 5.0),
    ]
    out = {
        r["channel"]: r
        for r in relational.markov_attribution(_events(spark, rows)).collect()
    }
    assert out["click"]["p_conv_full"] == pytest.approx(0.75, abs=1e-6)
    assert out["click"]["p_conv_removed"] == pytest.approx(0.5, abs=1e-6)
    assert out["click"]["removal_effect"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["view"]["removal_effect"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["click"]["credit_share"] == pytest.approx(0.5, abs=1e-6)
    assert out["view"]["credit_share"] == pytest.approx(0.5, abs=1e-6)
    # channels absent from every path: removing them changes nothing
    assert "error" not in out  # never observed in any session


def _edges(spark, pairs):
    from kafka_overwatch_spark.operators import graph  # noqa: F401

    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "part_a long, part_b long, weight long",
    )


def test_link_prediction_path_and_hub_cap(spark):
    from kafka_overwatch_spark.operators import graph

    # path 1-2-3: the only non-adjacent pair with a common neighbor is
    # {1,3} via 2 → the probe view emits it from both endpoints:
    # cn 1, jaccard 1/(1+1-1)=1, aa 1/ln(deg 2)
    e = _edges(spark, [(1, 2), (2, 3)])
    out = {
        (r["part"], r["candidate"]): r
        for r in graph.link_prediction(None, min_common=1, edges=e).collect()
    }
    assert set(out) == {(1, 3), (3, 1)}
    r = out[(1, 3)]
    assert r["common_neighbors"] == 1
    assert r["jaccard"] == pytest.approx(1.0, abs=1e-6)
    assert r["adamic_adar"] == pytest.approx(
        1 / __import__("math").log(2), abs=1e-5
    )
    # star 10-{11,12,13}: with the hub cap below 10's degree the
    # center is excluded and NO pair is predicted
    star = _edges(spark, [(10, 11), (10, 12), (10, 13)])
    assert (
        graph.link_prediction(
            None, min_common=1, max_hub_degree=2, edges=star
        ).count()
        == 0
    )
    # uncapped: each leaf pair {11,12},{11,13},{12,13} from both ends
    assert (
        graph.link_prediction(None, min_common=1, edges=star).count() == 6
    )
    # probe restriction: only parts < 12 emit rows
    assert (
        graph.link_prediction(
            None, min_common=1, probe_max_part=12, edges=star
        ).count()
        == 2
    )


def test_label_propagation_two_triangles(spark):
    from kafka_overwatch_spark.operators import graph

    # two disjoint triangles: min-label tie-breaks settle each on its
    # smallest vertex by round 2 → histogram {1: 3, 4: 3}
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    out = {
        r["community"]: (r["n_parts"], r["min_part"])
        for r in graph.label_propagation_bounded(None, edges=e).collect()
    }
    assert out == {1: (3, 1), 4: (3, 4)}


def test_density_cores_clique_and_outlier(spark):
    from kafka_overwatch_spark.pipelines import similarity

    dim = 64
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [(i, a, 0) for i in range(4)] + [(9, b, 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in similarity.density_cores(emb).collect()}
    for i in range(4):
        assert out[i]["n_neighbors"] == 3 and out[i]["is_core"]
    assert out[9]["n_neighbors"] == 0 and not out[9]["is_core"]


def _docs_chars(spark, chars):
    return spark.createDataFrame(
        [(i + 1, "x", "en", "s", c) for i, c in enumerate(chars)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_pps_systematic_ticks_and_multiplicity(spark):
    from kafka_overwatch_spark.pipelines import sampling

    # W=4, n=2 → ticks at 1 and 3: docs 1 and 3 selected once each
    out = {
        r["doc_id"]: r
        for r in sampling.pps_systematic(
            _docs_chars(spark, [1, 1, 1, 1]), n=2
        ).collect()
    }
    assert set(out) == {1, 3}
    assert all(r["multiplicity"] == 1 for r in out.values())
    # W=12, n=4 → ticks at 1.5, 4.5, 7.5, 10.5: the weight-10 doc
    # absorbs three ticks, doc 2 one, doc 3 none
    out = {
        r["doc_id"]: r
        for r in sampling.pps_systematic(
            _docs_chars(spark, [10, 1, 1]), n=4
        ).collect()
    }
    assert out[1]["multiplicity"] == 3
    assert out[2]["multiplicity"] == 1
    assert 3 not in out


def test_ngram_novelty_dup_unique_short(spark):
    from kafka_overwatch_spark.pipelines import text as textops

    dup = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, dup, "en", "s", len(dup)),
            (2, dup, "en", "s", len(dup)),
            (3, "one two three four five six seven", "en", "s", 30),
            (4, "too short here", "en", "s", 14),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: r for r in textops.ngram_novelty(docs).collect()
    }
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0 and out[3]["n_grams"] == 3
    assert out[4]["n_grams"] == 0 and out[4]["novelty"] is None


def test_changepoint_level_shift(spark):
    # counts 2,2,2,10,10,10 → split after day 3: means 2 vs 10,
    # gain = 12 + 300 - 216 = 96
    rows = []
    for d in (1, 2, 3):
        rows += [(1, d, h, "click", 1.0) for h in range(2)]
    for d in (4, 5, 6):
        rows += [(1, d, h, "click", 1.0) for h in range(10)]
    r = {
        x["event_type"]: x
        for x in relational.changepoint_daily(_events(spark, rows)).collect()
    }["click"]
    assert r["days"] == 6
    assert r["change_day"] == "2024-01-03"
    assert r["days_before"] == 3
    assert r["mean_before"] == pytest.approx(2.0, abs=1e-6)
    assert r["mean_after"] == pytest.approx(10.0, abs=1e-6)
    assert r["gain"] == pytest.approx(96.0, abs=1e-6)


def test_conformal_interval_exact_quantile_and_coverage(spark):
    # 4 calibration days with counts 10,10,12,14 (mu=11.5, residuals
    # 1.5,1.5,0.5,2.5 → sorted 0.5,1.5,1.5,2.5; k=ceil(5*0.9)=5 capped
    # at 4 → q_hat=2.5) and 2 test days 13 (|13-11.5|=1.5 ≤ 2.5 ✓)
    # and 20 (8.5 ✗) → coverage 0.5
    rows = []
    for d, n in ((1, 10), (2, 10), (3, 12), (4, 14), (5, 13), (6, 20)):
        rows += [(1, d, h % 24, "click", 1.0) for h in range(n)]
    out = relational.conformal_daily_interval(
        _events(spark, rows), cal_days=4
    ).collect()
    r = {x["event_type"]: x for x in out}["click"]
    assert r["n_cal"] == 4 and r["n_test"] == 2
    assert r["point"] == pytest.approx(11.5, abs=1e-6)
    assert r["q_hat"] == pytest.approx(2.5, abs=1e-6)
    assert (r["lo"], r["hi"]) == (pytest.approx(9.0), pytest.approx(14.0))
    assert r["test_covered"] == 1
    assert r["coverage"] == pytest.approx(0.5, abs=1e-6)


def test_granger_numpy_parity_and_direction(spark):
    import numpy as np

    # view_t = click_{t-1} + bump → click should Granger-cause view
    # far more strongly than the reverse; F values cross-checked with
    # an independent numpy least-squares fit
    click = [2, 4, 3, 6, 5, 8, 7, 9]
    view = [1, 3, 5, 4, 8, 6, 9, 8]
    rows = []
    for d0, n in enumerate(click):
        rows += [(1, d0 + 1, h, "click", 1.0) for h in range(n)]
    for d0, n in enumerate(view):
        rows += [(1, d0 + 1, h, "view", 1.0) for h in range(n)]
    out = {
        (r["cause"], r["effect"]): r
        for r in relational.granger_daily(_events(spark, rows)).collect()
    }

    def np_f(y, x):
        yv = np.array(y[1:], dtype=float)
        yl = np.array(y[:-1], dtype=float)
        xl = np.array(x[:-1], dtype=float)
        n = len(yv)
        Xf = np.column_stack([np.ones(n), yl, xl])
        Xr = np.column_stack([np.ones(n), yl])
        rf = yv - Xf @ np.linalg.lstsq(Xf, yv, rcond=None)[0]
        rr = yv - Xr @ np.linalg.lstsq(Xr, yv, rcond=None)[0]
        rss_f, rss_r = rf @ rf, rr @ rr
        return (rss_r - rss_f) / (rss_f / (n - 3))

    got = out[("click", "view")]
    assert got["n"] == 7
    assert got["f_stat"] == pytest.approx(np_f(view, click), rel=1e-4)
    rev = out[("view", "click")]
    assert rev["f_stat"] == pytest.approx(np_f(click, view), rel=1e-4)
    assert got["f_stat"] > 3 * rev["f_stat"]


def test_psis_khat_matches_python_hill_on_weights(spark):
    from kafka_overwatch_spark.pipelines import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {
        r["source"]: r
        for r in sampling.dsir_psis_khat(docs, m=3).collect()
    }
    w = sorted(
        ((r["source"], r["log_ratio"], r["doc_id"])
         for r in sampling.dsir_weights(docs).collect()),
        key=lambda t: (t[0], -t[1], t[2]),
    )
    by_src: dict[str, list[float]] = {}
    for s, lr, _ in w:
        by_src.setdefault(s, []).append(lr)
    checked = 0
    for s, lrs in by_src.items():
        if len(lrs) <= 3:
            assert s not in out  # honest absence
            continue
        tail = lrs[3]
        s_excess = sum(lr - tail for lr in lrs[:3])
        r = out[s]
        assert r["m"] == 3
        if s_excess > 0:
            assert r["khat"] == pytest.approx(s_excess / 3, abs=1e-6)
            assert r["reliable"] == (s_excess / 3 <= 0.7)
            checked += 1
        else:
            assert r["khat"] is None
    assert checked >= 1


def test_silhouette_perfectly_separated_clusters(spark):
    from kafka_overwatch_spark.pipelines import similarity

    dim = 64
    e1 = [1.0, 0.0] + [0.0] * (dim - 2)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    emb = spark.createDataFrame(
        [(1, e1, 0), (2, e1, 0), (3, e2, 1), (4, e2, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["label"]: r
        for r in similarity.silhouette_by_label(emb).collect()
    }
    import math

    for lab in (0, 1):
        r = out[lab]
        assert r["n_vectors"] == 2
        assert r["mean_a"] == pytest.approx(0.0, abs=1e-6)
        assert r["mean_b"] == pytest.approx(math.sqrt(2), abs=1e-6)
        assert r["silhouette"] == pytest.approx(1.0, abs=1e-6)


def test_keyness_hand_computed_g2(spark):
    import math

    from kafka_overwatch_spark.pipelines import text as textops

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana", "en", "A", 24),
            (2, "banana banana cherry", "en", "B", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r["source"], r["token"]): r
        for r in textops.keyness_by_source(
            docs, top_k=5, min_count=1
        ).collect()
    }
    # 'apple' in A: a=3, b=0, ta=4, tb=3, tall=7 →
    # G² = 2·3·ln(3/(4·3/7)) = 6·ln(1.75)
    r = out[("A", "apple")]
    assert r["count_in"] == 3 and r["count_rest"] == 0
    assert r["g2"] == pytest.approx(6 * math.log(1.75), abs=1e-5)
    assert r["rank"] == 1
    # 'cherry' is B's most distinctive token
    assert out[("B", "cherry")]["rank"] in (1, 2)


def test_density_lsh_is_lower_bound_of_exact(spark):
    from kafka_overwatch_spark.pipelines import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        r["vec_id"]: r["n_neighbors"]
        for r in similarity.density_cores(emb, threshold=0.4).collect()
    }
    approx = {
        r["vec_id"]: r["n_neighbors_lsh"]
        for r in similarity.density_cores_lsh(emb, threshold=0.4).collect()
    }
    assert set(approx) == set(exact)
    # LSH can only MISS pairs, never invent them
    assert all(approx[v] <= exact[v] for v in exact)
    # identical vectors land in identical buckets in every table →
    # a planted clique is recalled perfectly
    dim = 64
    a = [0.5] * dim
    clique = spark.createDataFrame(
        [(i, a, 0) for i in range(4)] ,
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["vec_id"]: r
        for r in similarity.density_cores_lsh(clique).collect()
    }
    assert all(out[i]["n_neighbors_lsh"] == 3 and out[i]["is_core"] for i in range(4))


def test_seasonal_decompose_constant_plus_weekly(spark):
    # 21 days of counts = 10 + (3 if dow==0 else 0): trend is exactly
    # 10 + 3/7 wherever the window is full, the dow-0 seasonal is
    # 3 - 3/7, other dows -3/7, residuals 0
    rows = []
    for d0 in range(21):
        n = 10 + (3 if (d0 + 19723) % 7 == 0 else 0)
        # day = epoch day of 2024-01-(d0+1) = 19723 + d0
        rows += [(1, d0 + 1, h % 24, "click", 1.0) for h in range(n)]
    out = {
        r["day"]: r
        for r in relational.seasonal_decompose_daily(
            _events(spark, rows)
        ).collect()
        if r["event_type"] == "click"
    }
    full = [r for r in out.values() if r["trend"] is not None]
    assert len(full) == 21 - 6  # centered window drops 3 each edge
    for r in full:
        assert r["trend"] == pytest.approx(10 + 3 / 7, abs=1e-6)
        expect_season = (
            3 - 3 / 7 if r["day"] % 7 == 0 else -3 / 7
        )
        assert r["seasonal"] == pytest.approx(expect_season, abs=1e-6)
        assert r["residual"] == pytest.approx(0.0, abs=1e-6)
    edge = [r for r in out.values() if r["trend"] is None]
    assert all(r["seasonal"] is None and r["residual"] is None for r in edge)


def test_did_recovers_planted_effect(spark):
    # control users: post − pre = +10 exactly; treated: +25 → DiD 15;
    # within-arm deltas constant → zero variance → se NULL-guard
    rows = []
    for u in (0, 2, 4):
        rows += [(u, 1, 9, "view", 50.0), (u, 20, 9, "view", 60.0)]
    for u in (1, 3, 5):
        rows += [(u, 1, 9, "view", 50.0), (u, 20, 9, "view", 75.0)]
    r = relational.did_estimate(_events(spark, rows)).collect()[0]
    assert r["n_control"] == 3 and r["n_treat"] == 3
    assert r["mean_diff_control"] == pytest.approx(10.0, abs=1e-6)
    assert r["mean_diff_treat"] == pytest.approx(25.0, abs=1e-6)
    assert r["did"] == pytest.approx(15.0, abs=1e-6)
    assert r["se"] is None and r["t_stat"] is None


def test_holt_winters_python_fold_parity_and_short_series(spark):
    # exact python re-fold of the documented recurrence over a
    # 21-day series with a planted weekly dip; plus the < 14-day
    # NULL contract
    xs = [100.0 + 2 * t + (-30.0 if t % 7 == 5 else 0.0) for t in range(21)]
    rows = []
    for d0, x in enumerate(xs):
        rows.append((1, d0 + 1, 9, "click", x))
    rows += [(1, d, 9, "view", 1.0) for d in range(1, 10)]  # 9 days
    ev = _events(spark, rows)
    out = {
        r["event_type"]: r
        for r in relational.daily_holt_winters(ev).collect()
    }
    a, b, g = 0.3, 0.1, 0.2
    l = sum(xs[:7]) / 7
    tr = (sum(xs[7:14]) / 7 - sum(xs[:7]) / 7) / 7
    s = [xs[i] - l for i in range(7)]
    for t in range(7, 21):  # 0-based t == rn-1; slot = t % 7
        slot = t % 7
        l_new = a * (xs[t] - s[slot]) + (1 - a) * (l + tr)
        tr = b * (l_new - l) + (1 - b) * tr
        s[slot] = g * (xs[t] - l_new) + (1 - g) * s[slot]
        l = l_new
    r = out["click"]
    assert r["days"] == 21
    assert r["level"] == pytest.approx(l, abs=1e-5)
    assert r["trend"] == pytest.approx(tr, abs=1e-5)
    for j in range(7):
        assert r[f"s{j}"] == pytest.approx(s[j], abs=1e-5)
    assert r["forecast_1"] == pytest.approx(
        l + tr + s[(21 + 1 - 1) % 7], abs=1e-5
    )
    # the weekly dip lives in the seasonal state, not the trend
    dip_slot = 5
    assert r[f"s{dip_slot}"] < -15
    v = out["view"]
    assert v["days"] == 9 and v["level"] is None and v["forecast_1"] is None


def test_heaps_law_two_point_exact(spark):
    import math

    from kafka_overwatch_spark.pipelines import text as textops

    # doc1 "a b": (N,V)=(2,2); doc2 "a c": (4,3) →
    # β = ln(3/2)/ln(4/2), k = exp(ln2 − β·ln2), r2 = 1 (two points)
    docs = spark.createDataFrame(
        [(1, "a b", "en", "s", 3), (2, "a c", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = textops.heaps_law_fit(docs).collect()[0]
    assert (r["n_docs"], r["total_tokens"], r["vocab"]) == (2, 4, 3)
    beta = math.log(1.5) / math.log(2)
    assert r["beta"] == pytest.approx(beta, abs=1e-6)
    assert r["k"] == pytest.approx(math.exp(math.log(2) - beta * math.log(2)), abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_spc_chart_spike_and_run(spark):
    # 12 flat days at 10, one spike to 40, then 8 days at 11 (one side
    # of center → rule-4 run on the 8th); moving-range σ̂ stays small
    # because only the spike moves
    counts = [10] * 12 + [40] + [11] * 8
    rows = []
    for d0, n in enumerate(counts):
        rows += [(1, d0 + 1, h % 24, "click", 1.0) for h in range(n)]
    out = {
        r["day"]: r
        for r in relational.spc_control_chart(_events(spark, rows)).collect()
    }
    days = sorted(out)
    spike_day = days[12]
    assert out[spike_day]["value"] == 40
    assert out[spike_day]["beyond_limits"]
    flat = [out[d] for d in days[:12]]
    assert not any(r["beyond_limits"] for r in flat)
    # rule-4 runs: center ≈ 11.8 (the spike drags it up), so the flat
    # 10s are BELOW center and fire from their 8th day through the
    # spike; the post-spike 11s (also below center) fire on their 8th
    run_days = [d for d in days if out[d]["run_flag"]]
    assert run_days == days[7:12] + [days[-1]]


def test_retention_halflife_planted_decay(spark):
    import math

    # one cohort (all users first-seen week 0), actives thin out
    # exactly by halves each week: retention .5, .25, .125 at offsets
    # 1..3 → λ = ln2, half-life = 1 week, r2 = 1
    rows = []
    for u in range(8):
        rows.append((u, 1, 9, "view", 1.0))  # week 0: everyone
    for u in range(4):
        rows.append((u, 9, 9, "view", 1.0))  # week 1 (day 9)
    for u in range(2):
        rows.append((u, 16, 9, "view", 1.0))  # week 2
    rows.append((0, 23, 9, "view", 1.0))  # week 3
    r = relational.retention_halflife(_events(spark, rows)).collect()[0]
    assert r["n_points"] == 3
    assert r["lambda_hat"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["half_life_weeks"] == pytest.approx(1.0, abs=1e-6)
    assert r["r0"] == pytest.approx(1.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)
