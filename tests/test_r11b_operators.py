"""r11 wave 4: hand-computed fixtures for Kruskal-Wallis, Spearman,
Ljung-Box, eigenvector centrality, bounded connected components, and
hard-negative mining (oracle parity is covered by test_oracle_parity)."""

from __future__ import annotations

import math

import pytest

from tests.test_r8_operators import _events
from tests.test_r11_operators import _daily_events


def _edges_df(spark, pairs, w=1):
    return spark.createDataFrame(
        [(a, b, w) for a, b in pairs],
        "part_a long, part_b long, weight long",
    )


def test_kruskal_wallis_no_ties(spark):
    from kafka_overwatch_spark.operators.relational import (
        kruskal_wallis_values,
    )

    # x: (1, 2), y: (3, 4) — ranks 1..4, R_x = 3, R_y = 7
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4; no ties -> H_c = H
    ev = _events(
        spark,
        [(1, 1, 9, "x", 1.0), (1, 1, 9, "x", 2.0),
         (1, 1, 9, "y", 3.0), (1, 1, 9, "y", 4.0)],
    )
    rows = kruskal_wallis_values(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_groups"], r["n_total"], r["df"]) == (2, 4, 1)
    assert r["h"] == 2.4
    assert r["h_tie_corrected"] == 2.4


def test_kruskal_wallis_tie_correction(spark):
    from kafka_overwatch_spark.operators.relational import (
        kruskal_wallis_values,
    )

    # x: (1, 2), y: (2, 3) — midranks 1, 2.5, 2.5, 4
    # R_x = 3.5, R_y = 6.5; H = 0.6*(3.5^2/2 + 6.5^2/2) - 15 = 1.35
    # tie_mass = 2^3 - 2 = 6; C = 1 - 6/60 = 0.9; H_c = 1.5
    ev = _events(
        spark,
        [(1, 1, 9, "x", 1.0), (1, 1, 9, "x", 2.0),
         (1, 1, 9, "y", 2.0), (1, 1, 9, "y", 3.0)],
    )
    r = kruskal_wallis_values(ev).collect()[0]
    assert r["h"] == 1.35
    assert r["h_tie_corrected"] == 1.5


def test_spearman_exact_and_ties(spark):
    from kafka_overwatch_spark.operators.relational import spearman_daily

    ev = _daily_events(
        spark, {"a": [1, 2, 3], "b": [3, 2, 1], "c": [1, 1, 2]}
    )
    got = {
        (r["type_a"], r["type_b"]): r
        for r in spearman_daily(ev).collect()
    }
    assert got[("a", "b")]["rho"] == -1.0
    assert got[("a", "b")]["n_days"] == 3
    # ties: c ranks are (1.5, 1.5, 3) against a's (1, 2, 3) —
    # Pearson on midranks = 0.5*sqrt(3) ≈ 0.866025
    assert got[("a", "c")]["rho"] == round(math.sqrt(3) / 2, 6)
    assert got[("b", "c")]["rho"] == round(-math.sqrt(3) / 2, 6)


def test_spearman_constant_series_null(spark):
    from kafka_overwatch_spark.operators.relational import spearman_daily

    ev = _daily_events(spark, {"a": [1, 2, 3], "k": [2, 2, 2]})
    got = {
        (r["type_a"], r["type_b"]): r
        for r in spearman_daily(ev).collect()
    }
    assert got[("a", "k")]["rho"] is None


def _lb_python(counts: list[int], max_lag: int = 7):
    """Pure-python Ljung-Box with the operator's conventions: full-series
    mean/denominator, gap-free day grid here, Q over lags 1..7."""
    n = len(counts)
    xb = sum(counts) / n
    den = sum((x - xb) ** 2 for x in counts)
    q = 0.0
    for k in range(1, max_lag + 1):
        pairs = [(counts[t], counts[t - k]) for t in range(k, n)]
        if not pairs or den <= 0:
            return None
        rk = sum((x - xb) * (y - xb) for x, y in pairs) / den
        q += rk * rk / (n - k)
    return round(n * (n + 2.0) * q, 6)


def test_ljung_box_matches_python_reference(spark):
    from kafka_overwatch_spark.operators.relational import ljung_box_daily

    series = [5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 4, 2]
    ev = _daily_events(spark, {"a": series})
    r = ljung_box_daily(ev).collect()[0]
    assert r["n_days"] == len(series)
    assert r["df"] == 7
    want = _lb_python(series)
    assert r["q_stat"] == pytest.approx(want, abs=2e-6)


def test_ljung_box_short_series_null(spark):
    from kafka_overwatch_spark.operators.relational import ljung_box_daily

    # 5 days: lag-7 (and lag-5,6) have no pairs -> Q is NULL, honestly
    ev = _daily_events(spark, {"a": [3, 1, 4, 1, 5]})
    r = ljung_box_daily(ev).collect()[0]
    assert r["q_stat"] is None


def _eig_python(pairs, weights, rounds=8):
    """Unnormalized power rounds, one L1 normalization at the end —
    the operator's (and oracle's) exact convention."""
    nodes = sorted({v for p in pairs for v in p})
    x = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(rounds):
        y = {v: 0.0 for v in nodes}
        for (a, b), w in zip(pairs, weights):
            y[a] += w * x[b]
            y[b] += w * x[a]
        x = y
    tot = sum(x.values())
    return {v: x[v] / tot for v in nodes}


def test_eigencentrality_matches_python_power_iteration(spark):
    from kafka_overwatch_spark.operators import graph

    # star + tail: hub 1 should dominate
    pairs = [(1, 2), (1, 3), (1, 4), (4, 5)]
    got = {
        r["part"]: r["score"]
        for r in graph.eigencentrality(
            None, edges=_edges_df(spark, pairs)
        ).collect()
    }
    want = _eig_python(pairs, [1] * len(pairs))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert got[1] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_eigencentrality_weight_sensitivity(spark):
    from kafka_overwatch_spark.operators import graph

    # triangle with one heavy edge: its endpoints outrank the third
    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 1), (1, 3, 1)],
        "part_a long, part_b long, weight long",
    )
    got = {
        r["part"]: r["score"]
        for r in graph.eigencentrality(None, edges=edges).collect()
    }
    assert got[1] > got[3] and got[2] > got[3]


def test_components_bounded_two_cliques(spark):
    from kafka_overwatch_spark.operators import graph

    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)]
    got = {
        r["part"]: r["component"]
        for r in graph.components_bounded(
            None, edges=_edges_df(spark, pairs)
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_components_bounded_raises_past_budget(spark):
    from kafka_overwatch_spark.operators import graph

    # a 14-vertex path: the min label needs 13 flood rounds > budget 4
    pairs = [(i, i + 1) for i in range(1, 14)]
    with pytest.raises(RuntimeError, match="still flooding"):
        graph.components_bounded(
            None, rounds=4, edges=_edges_df(spark, pairs)
        )


def test_components_bounded_early_convergence_is_exact(spark):
    from kafka_overwatch_spark.operators import graph

    # diameter 2 converges well before the 10-round budget
    pairs = [(5, 6), (6, 7)]
    got = {
        r["part"]: r["component"]
        for r in graph.components_bounded(
            None, edges=_edges_df(spark, pairs)
        ).collect()
    }
    assert got == {5: 5, 6: 5, 7: 5}


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_hard_negatives_excludes_same_label_and_null(spark):
    from kafka_overwatch_spark.pipelines.similarity import (
        hard_negative_topk,
    )

    rows = [
        (0, [1.0, 0.0], 0),       # probe
        (1, [1.0, 0.0], 0),       # same label: excluded despite cos=1
        (2, [0.9, 0.1], 1),       # best true negative
        (3, [0.5, 0.5], 2),
        (4, [1.0, 0.0], None),    # NULL label: excluded
        (5, [-1.0, 0.0], 1),      # worst negative
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    got = hard_negative_topk(df, query_ids=(0,), k=3).collect()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        2, 3, 5,
    ]
    by_id = {r["vec_id"]: r["cosine"] for r in got}
    assert by_id[2] == round(0.9 / math.hypot(0.9, 0.1), 6)
    assert by_id[5] == -1.0


def test_hard_negatives_tie_breaks_on_vec_id(spark):
    from kafka_overwatch_spark.pipelines.similarity import (
        hard_negative_topk,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (7, [0.6, 0.8], 1),
        (3, [0.6, 0.8], 2),  # identical cosine: lower vec_id first
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    got = sorted(
        hard_negative_topk(df, query_ids=(0,), k=2).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["vec_id"] for r in got] == [3, 7]


def test_friedman_perfect_consistency(spark):
    from kafka_overwatch_spark.operators.relational import friedman_daily

    # two complete days with the same ordering a<b<c -> chi2 = 4.0
    # (the n=2, k=3 maximum); day 3 observes only 'a' and must drop
    ev = _daily_events(
        spark, {"a": [1, 2, 1], "b": [2, 4, 0], "c": [3, 6, 0]}
    )
    r = friedman_daily(ev).collect()[0]
    assert (r["n_days"], r["k"], r["df"]) == (2, 3, 2)
    assert r["chi2"] == 4.0


def test_friedman_tie_correction(spark):
    from kafka_overwatch_spark.operators.relational import friedman_daily

    # day1 counts (1,1,2) -> midranks (1.5,1.5,3); day2 (1,2,2) ->
    # (1,2.5,2.5); tie-corrected chi2 = 9/3 = 3.0 by hand
    ev = _daily_events(spark, {"a": [1, 1], "b": [1, 2], "c": [2, 2]})
    r = friedman_daily(ev).collect()[0]
    assert r["chi2"] == 3.0


def test_friedman_all_tied_is_null(spark):
    from kafka_overwatch_spark.operators.relational import friedman_daily

    ev = _daily_events(spark, {"a": [2, 3], "b": [2, 3], "c": [2, 3]})
    r = friedman_daily(ev).collect()[0]
    assert r["chi2"] is None


def test_welch_t_hand_computed(spark):
    from kafka_overwatch_spark.operators.relational import welch_t_values

    ev = _events(
        spark,
        [(1, 1, 9, "x", v) for v in (1.0, 2.0, 3.0)]
        + [(1, 1, 9, "y", v) for v in (2.0, 4.0, 6.0, 8.0)],
    )
    r = welch_t_values(ev).collect()[0]
    assert (r["type_a"], r["type_b"], r["n_a"], r["n_b"]) == ("x", "y", 3, 4)
    assert (r["mean_a"], r["mean_b"]) == (2.0, 5.0)
    va, vb = 1.0, 20.0 / 3.0
    se2 = va / 3 + vb / 4
    assert r["t_stat"] == round((2.0 - 5.0) / math.sqrt(se2), 6)
    dfw = se2 * se2 / ((va / 3) ** 2 / 2 + (vb / 4) ** 2 / 3)
    assert r["df_welch"] == pytest.approx(round(dfw, 6), abs=2e-6)


def test_welch_t_degenerate_null(spark):
    from kafka_overwatch_spark.operators.relational import welch_t_values

    # constant values in both groups -> zero variance -> NULL t/df
    ev = _events(
        spark,
        [(1, 1, 9, "x", 2.0), (1, 1, 9, "x", 2.0),
         (1, 1, 9, "y", 3.0), (1, 1, 9, "y", 3.0)],
    )
    r = welch_t_values(ev).collect()[0]
    assert r["t_stat"] is None and r["df_welch"] is None


DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_ht_estimate_equal_sizes_exact(spark):
    from kafka_overwatch_spark.pipelines.sampling import ht_source_estimate

    # 6 equal-size docs, n = 6 ticks: every doc sampled exactly once,
    # HT estimate per source equals the true count, rel_err = 0
    docs = spark.createDataFrame(
        [(i, "t", "en", "A" if i < 4 else "B", 100) for i in range(6)],
        DOC_SCHEMA,
    )
    rows = {r["source"]: r for r in ht_source_estimate(docs, n=6).collect()}
    assert rows["A"]["n_hits"] == 4 and rows["B"]["n_hits"] == 2
    assert rows["A"]["ht_docs"] == 4.0 and rows["B"]["ht_docs"] == 2.0
    assert rows["A"]["rel_err"] == 0.0 and rows["B"]["rel_err"] == 0.0


def test_ht_estimate_matches_python_reference(spark):
    from kafka_overwatch_spark.pipelines.sampling import ht_source_estimate

    sizes = [100, 200, 300, 400, 50, 950]
    srcs = ["A", "A", "B", "B", "C", "C"]
    n = 4
    docs = spark.createDataFrame(
        [(i, "t", "en", srcs[i], sizes[i]) for i in range(len(sizes))],
        DOC_SCHEMA,
    )
    # python mirror of the exact integer tick math + HT weighting
    W = sum(sizes)
    cums = [sum(sizes[: i + 1]) for i in range(len(sizes))]
    want: dict = {}
    hits: dict = {}
    for i, (c, s) in enumerate(zip(cums, srcs)):
        prev = c - sizes[i]
        mult = (2 * n * c + W) // (2 * W) - (2 * n * prev + W) // (2 * W)
        if mult >= 1:
            hits[s] = hits.get(s, 0) + mult
            want[s] = want.get(s, 0.0) + round(mult * W / (n * sizes[i]), 6)
    got = {r["source"]: r for r in ht_source_estimate(docs, n=n).collect()}
    assert set(got) == {"A", "B", "C"}
    for s in got:
        assert got[s]["n_hits"] == hits.get(s, 0)
        assert got[s]["ht_docs"] == pytest.approx(
            round(want.get(s, 0.0), 6), abs=2e-6
        )


def test_triplet_candidates_champions_and_drop(spark):
    from kafka_overwatch_spark.pipelines.similarity import (
        triplet_candidates,
    )

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [1.0, 0.0], 0),   # easy positive (cos 1)
        (6, [0.0, 1.0], 0),   # hardest positive (cos 0)
        (2, [0.6, 0.8], 1),   # a negative (cos 0.6)
        (3, [-1.0, 0.0], 2),  # easy negative
        (9, [1.0, 0.0], 5),   # probe with no same-label peer: drops —
                              # but as a CORPUS vector it is anchor 0's
                              # hardest negative (diff label, cos 1.0)
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    got = {
        r["query_id"]: r
        for r in triplet_candidates(df, query_ids=(0, 9)).collect()
    }
    assert set(got) == {0}  # anchor 9 has no positive -> no triplet
    t = got[0]
    assert (t["pos_id"], t["pos_cosine"]) == (6, 0.0)
    assert (t["neg_id"], t["neg_cosine"]) == (9, 1.0)
    assert t["margin"] == 1.0
    assert t["violates"] is True


def test_poisson_dispersion_hand_computed(spark):
    from kafka_overwatch_spark.operators.relational import (
        poisson_dispersion_daily,
    )

    # constant series: variance 0 -> var_ratio 0 (maximally under-
    # dispersed); alternating 1/5: mean 3, s2 = 16/3, ratio 16/9
    ev = _daily_events(spark, {"k": [4, 4, 4], "b": [1, 5, 1, 5]})
    got = {r["event_type"]: r for r in poisson_dispersion_daily(ev).collect()}
    assert got["k"]["mean_daily"] == 4.0
    assert got["k"]["var_ratio"] == 0.0
    assert got["k"]["dispersion_d"] == 0.0
    assert got["b"]["mean_daily"] == 3.0
    assert got["b"]["var_ratio"] == round(16 / 9, 6)
    assert got["b"]["dispersion_d"] == round(3 * 16 / 9, 6)
    assert got["b"]["df"] == 3


def test_poisson_dispersion_single_day_null(spark):
    from kafka_overwatch_spark.operators.relational import (
        poisson_dispersion_daily,
    )

    ev = _daily_events(spark, {"o": [7]})
    r = poisson_dispersion_daily(ev).collect()[0]
    assert r["var_ratio"] is None and r["dispersion_d"] is None


def test_knn_label_audit_votes_and_tiebreak(spark):
    from kafka_overwatch_spark.pipelines.similarity import knn_label_audit

    rows = [
        (0, [1.0, 0.0], 0),    # probe, true label 0
        (1, [0.99, 0.1], 1),   # three label-1 neighbors dominate
        (2, [0.98, 0.1], 1),
        (3, [0.97, 0.1], 1),
        (4, [0.96, 0.1], 0),
        (5, [0.95, 0.1], 0),
        (6, [-1.0, 0.0], 0),   # outside the k=5 shortlist
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    r = knn_label_audit(df, query_ids=(0,), k=5).collect()[0]
    assert (r["true_label"], r["predicted_label"], r["votes"]) == (0, 1, 3)
    assert r["correct"] is False


def test_knn_label_audit_vote_tie_prefers_smaller_label(spark):
    from kafka_overwatch_spark.pipelines.similarity import knn_label_audit

    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.9, 0.1], 3),
        (2, [0.8, 0.1], 3),
        (3, [0.7, 0.1], 1),
        (4, [0.6, 0.1], 1),
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    r = knn_label_audit(df, query_ids=(0,), k=4).collect()[0]
    # 2 votes each for labels 1 and 3: tie -> smaller label wins
    assert (r["predicted_label"], r["votes"]) == (1, 2)


def test_knn_label_audit_no_matching_probe_is_empty(spark):
    """query_ids that match no labeled vector: the oracle returns zero
    rows, so the probe scorer must short-circuit to an empty frame
    instead of crashing on a 0-row probe matrix (advisor-found). The
    whole probe family shares the scorer, so cover all three."""
    from kafka_overwatch_spark.pipelines.similarity import (
        hard_negative_topk,
        knn_label_audit,
        triplet_candidates,
    )

    rows = [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], None)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    # id 99 doesn't exist; id 2 exists but has a NULL label
    for qids in ((99,), (2,)):
        assert knn_label_audit(df, query_ids=qids, k=3).count() == 0
        assert hard_negative_topk(df, query_ids=qids).count() == 0
        assert triplet_candidates(df, query_ids=qids).count() == 0


def test_ljung_box_gappy_short_series_null(spark):
    """6 observed days over a 7-day span have pairs at EVERY lag 1-7,
    but n_days <= max_lag makes the n-k denominators invalid — the
    review-found case: Q must be NULL, not negative garbage."""
    import datetime as dt

    days = [1, 2, 3, 4, 6, 8]  # gaps supply lag-5/6/7 pairs
    rows = [
        (i, 1, dt.datetime(2024, 1, d), "a", 1.0)
        for i, d in enumerate(days)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    from kafka_overwatch_spark.operators.relational import ljung_box_daily

    r = ljung_box_daily(ev).collect()[0]
    assert r["n_days"] == 6
    assert r["q_stat"] is None


def _py_steady(seqs, rounds=8):
    """Python mirror of markov_steady_state: round-6 transition probs,
    8 unnormalized power rounds from uniform, one L1 normalization.
    Matches the engines' aggregate semantics exactly: a state only
    appears in round t+1 if some round-t state transitions INTO it
    (an inner-join aggregate emits no zero rows), and a chain whose
    mass fully drains (pure DAG) ends empty."""
    from collections import Counter

    bigrams = Counter()
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            bigrams[(a, b)] += 1
    n_from = Counter()
    for (a, _), c in bigrams.items():
        n_from[a] += c
    p = {k: round(c / n_from[k[0]], 6) for k, c in bigrams.items()}
    states = sorted({s for k in bigrams for s in k})
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(rounds):
        nxt: dict = {}
        for (a, b), pr in p.items():
            if a in pi:
                nxt[b] = nxt.get(b, 0.0) + pi[a] * pr
        pi = nxt
    tot = sum(pi.values())
    if not pi or tot == 0:
        return {}
    return {s: round(pi[s] / tot, 6) for s in pi}


def test_markov_steady_state_matches_python(spark):
    from kafka_overwatch_spark.operators.relational import (
        markov_steady_state,
    )

    # one user, sequence a,a,b,a,b,a: P(a->a)=1/3, P(a->b)=2/3,
    # P(b->a)=1 — limit pi = (0.6, 0.4); the registered statistic is
    # the 8-round iterate, checked against the python mirror
    seq = ["a", "a", "b", "a", "b", "a"]
    ev = _events(spark, [(1, 1, h + 1, t, 1.0) for h, t in enumerate(seq)])
    got = {r["event_type"]: r["pi"] for r in markov_steady_state(ev).collect()}
    want = _py_steady([seq])
    assert got.keys() == want.keys()
    for s in want:
        assert got[s] == pytest.approx(want[s], abs=2e-6)
    # 8 rounds sit close to the (0.6, 0.4) fixpoint
    assert abs(got["a"] - 0.6) < 0.01 and abs(got["b"] - 0.4) < 0.01


def test_markov_steady_state_periodic_chain_stable(spark):
    from kafka_overwatch_spark.operators.relational import (
        markov_steady_state,
    )

    # strict alternation a,b,a,b,...: P is a swap; uniform start is
    # invariant, so the iterate IS (0.5, 0.5) at every depth
    seq = ["a", "b"] * 4
    ev = _events(spark, [(1, 1, h + 1, t, 1.0) for h, t in enumerate(seq)])
    got = {r["event_type"]: r["pi"] for r in markov_steady_state(ev).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_dim_stats_hand_computed(spark):
    from kafka_overwatch_spark.pipelines.similarity import dim_stats

    df = spark.createDataFrame(
        [(0, [0.5, -0.5], 1), (1, [0.5, 0.0], 1)], EMB_SCHEMA
    )
    got = {r["dim"]: r for r in dim_stats(df).collect()}
    assert got[0]["mean"] == 0.5
    assert got[0]["variance"] == 0.0
    assert got[0]["frac_zero"] == 0.0 and got[0]["frac_negative"] == 0.0
    assert got[1]["mean"] == -0.25
    assert got[1]["variance"] == 0.0625
    assert got[1]["frac_zero"] == 0.5 and got[1]["frac_negative"] == 0.5


def test_norm_profile_hand_computed(spark):
    from kafka_overwatch_spark.pipelines.similarity import norm_profile

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, -1.0], 0), (2, [3.0, 4.0], 0)],
        EMB_SCHEMA,
    )
    r = norm_profile(df).collect()[0]
    assert r["n"] == 3
    assert r["min_norm"] == 1.0
    assert r["max_norm"] == 5.0
    # mean of round-6 norms: (1 + 1 + 5) / 3
    assert r["mean_norm"] == pytest.approx(7 / 3, abs=2e-6)
    # only the (3,4) vector strays > 1% from unit norm
    assert r["frac_unnormalized"] == round(1 / 3, 6)


def test_degree_tail_degenerate_is_null(spark):
    from kafka_overwatch_spark.operators import graph

    # 150-clique: ranks 1..101 all have degree 149, so every ln ratio
    # is 0 and alpha must be NULL (not an ANSI divide-by-zero — the
    # guard this fixture originally flushed out, in BOTH hill siblings)
    clique = [
        (2000 + i, 2000 + j)
        for i in range(150)
        for j in range(i + 1, 150)
    ]
    got = graph.degree_tail_index(
        None, k=100, edges=_edges_df(spark, clique)
    ).collect()[0]
    assert got["d_tail"] == 149
    assert got["alpha"] is None


def test_degree_tail_matches_python(spark):
    import math

    from kafka_overwatch_spark.operators import graph

    # distinct degrees: vertex v in a chain of stars — build a graph
    # where hub h_i has i leaves (i = 5..40), so degrees differ
    pairs = []
    for i in range(5, 41):
        hub = i * 1000
        pairs += [(hub, hub + 1 + j) for j in range(i)]
    k = 10
    got = graph.degree_tail_index(
        None, k=k, edges=_edges_df(spark, pairs)
    ).collect()[0]
    # python mirror
    from collections import Counter

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    ordered = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [d for _, d in ordered[:k]]
    d_tail = ordered[k][1]
    alpha = round(k / sum(math.log(x / d_tail) for x in xs), 6)
    total = sum(deg.values())
    assert got["d_tail"] == d_tail
    assert got["alpha"] == pytest.approx(alpha, abs=2e-6)
    assert got["tail_mass_frac"] == pytest.approx(
        round(sum(xs) / total, 6), abs=2e-6
    )
