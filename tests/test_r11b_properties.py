"""Property-based laws (hypothesis) for the r11 wave-4/5 statistics:
Kruskal-Wallis, Spearman, Friedman, and Welch's t recomputed by
independent pure-python references on generated data — a different
failure surface than the DuckDB oracle (which shares the SQL
formulation). Examples are few (one Spark job each)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

EVENT_COLS = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)

GROUPS = st.lists(
    st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=10),
    min_size=2,
    max_size=4,
)
SERIES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=4,
    max_size=9,
)
BLOCKS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=2,
    max_size=8,
)


def _group_events(spark, groups):
    rows = []
    i = 0
    for g, vals in enumerate(groups):
        for v in vals:
            rows.append((i, 1, dt.datetime(2024, 1, 1), f"g{g}", float(v)))
            i += 1
    return spark.createDataFrame(rows, EVENT_COLS)


def _midranks(pooled):
    """value -> midrank over the pooled multiset."""
    s = sorted(pooled)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def _py_kruskal(groups):
    pooled = [v for g in groups for v in g]
    n = len(pooled)
    mr = _midranks(pooled)
    s_terms = 0.0
    for g in groups:
        r = sum(mr[v] for v in g)
        s_terms += round(r * r / len(g), 6)  # the operator's convention
    h = 12.0 / (n * (n + 1.0)) * s_terms - 3.0 * (n + 1.0)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(pooled).values())
    c = 1.0 - tie / (n**3 - n)
    return round(h, 6), (round(h / c, 6) if c > 0 else None)


@settings(max_examples=6, deadline=None)
@given(GROUPS)
def test_kruskal_wallis_matches_python(spark, groups):
    from kafka_overwatch_spark.operators.relational import (
        kruskal_wallis_values,
    )

    ev = _group_events(spark, groups)
    r = kruskal_wallis_values(ev).collect()[0]
    want_h, want_hc = _py_kruskal(groups)
    assert r["n_total"] == sum(len(g) for g in groups)
    assert r["h"] == pytest.approx(want_h, abs=2e-6)
    if want_hc is None:
        assert r["h_tie_corrected"] is None
    else:
        assert r["h_tie_corrected"] == pytest.approx(want_hc, abs=2e-6)


def _py_spearman(xs, ys):
    mx, my = _midranks(xs), _midranks(ys)
    rx = [mx[v] for v in xs]
    ry = [my[v] for v in ys]
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den2 <= 0:
        return None
    return round((n * sxy - sx * sy) / math.sqrt(den2), 6)


@settings(max_examples=6, deadline=None)
@given(SERIES)
def test_spearman_matches_python(spark, series):
    from kafka_overwatch_spark.operators.relational import spearman_daily

    rows = []
    i = 0
    for d, (ca, cb) in enumerate(series, start=1):
        for _ in range(ca):
            rows.append((i, 1, dt.datetime(2024, 1, d), "a", 1.0))
            i += 1
        for _ in range(cb):
            rows.append((i, 1, dt.datetime(2024, 1, d), "b", 1.0))
            i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    r = spearman_daily(ev).collect()[0]
    want = _py_spearman([a for a, _ in series], [b for _, b in series])
    assert r["n_days"] == len(series)
    if want is None:
        assert r["rho"] is None
    else:
        assert r["rho"] == pytest.approx(want, abs=2e-6)


def _py_friedman(blocks):
    """blocks: list of per-day (c_a, c_b, c_c) count tuples."""
    k = len(blocks[0])
    n = len(blocks)
    rsum = [0.0] * k
    s2 = 0.0
    for b in blocks:
        mr = _midranks(list(b))
        for j, v in enumerate(b):
            rsum[j] += mr[v]
            s2 += mr[v] * mr[v]
    num = (k - 1) * sum((r - n * (k + 1) / 2.0) ** 2 for r in rsum)
    den = s2 - n * k * (k + 1) ** 2 / 4.0
    if den <= 0:
        return None
    return round(num / den, 6)


@settings(max_examples=6, deadline=None)
@given(BLOCKS)
def test_friedman_matches_python(spark, blocks):
    from kafka_overwatch_spark.operators.relational import friedman_daily

    rows = []
    i = 0
    for d, counts in enumerate(blocks, start=1):
        for j, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (i, 1, dt.datetime(2024, 1, d), f"t{j}", 1.0)
                )
                i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    r = friedman_daily(ev).collect()[0]
    want = _py_friedman(blocks)
    assert (r["n_days"], r["k"]) == (len(blocks), 3)
    if want is None:
        assert r["chi2"] is None
    else:
        assert r["chi2"] == pytest.approx(want, abs=2e-6)


def _py_welch(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((v - ma) ** 2 for v in xs) / (na - 1)
    vb = sum((v - mb) ** 2 for v in ys) / (nb - 1)
    se2 = va / na + vb / nb
    if se2 <= 0:
        return None, None
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return round(t, 6), round(dfw, 6)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=10),
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=10),
)
def test_welch_matches_python(spark, xs, ys):
    from kafka_overwatch_spark.operators.relational import welch_t_values

    rows = [
        (i, 1, dt.datetime(2024, 1, 1), "x", float(v))
        for i, v in enumerate(xs)
    ] + [
        (1000 + i, 1, dt.datetime(2024, 1, 1), "y", float(v))
        for i, v in enumerate(ys)
    ]
    ev = spark.createDataFrame(rows, EVENT_COLS)
    r = welch_t_values(ev).collect()[0]
    want_t, want_df = _py_welch(xs, ys)
    if want_t is None:
        assert r["t_stat"] is None and r["df_welch"] is None
    else:
        assert r["t_stat"] == pytest.approx(want_t, abs=2e-6)
        assert r["df_welch"] == pytest.approx(want_df, abs=2e-6)


def _py_poisson(counts):
    n = len(counts)
    mean = sum(counts) / n
    if n < 2 or mean <= 0:
        return mean, None, None
    var = (sum(c * c for c in counts) - n * mean * mean) / (n - 1)
    return mean, round(var / mean, 6), round((n - 1) * var / mean, 6)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12))
def test_poisson_dispersion_matches_python(spark, counts):
    from kafka_overwatch_spark.operators.relational import (
        poisson_dispersion_daily,
    )

    rows = []
    i = 0
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((i, 1, dt.datetime(2024, 1, d), "a", 1.0))
            i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    r = poisson_dispersion_daily(ev).collect()[0]
    mean, vr, dd = _py_poisson(counts)
    assert r["mean_daily"] == pytest.approx(round(mean, 6), abs=2e-6)
    if vr is None:
        assert r["var_ratio"] is None and r["dispersion_d"] is None
    else:
        assert r["var_ratio"] == pytest.approx(vr, abs=2e-6)
        assert r["dispersion_d"] == pytest.approx(dd, abs=2e-6)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=2, max_size=8
        ),
        min_size=1,
        max_size=3,
    )
)
def test_markov_steady_state_matches_python_random(spark, seqs):
    from tests.test_r11b_operators import _py_steady
    from kafka_overwatch_spark.operators.relational import (
        markov_steady_state,
    )

    rows = []
    i = 0
    for u, seq in enumerate(seqs):
        for h, t in enumerate(seq):
            rows.append(
                (i, u, dt.datetime(2024, 1, 1, h % 24, i % 60), t, 1.0)
            )
            i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    got = {
        r["event_type"]: r["pi"]
        for r in markov_steady_state(ev).collect()
    }
    want = _py_steady(seqs)
    assert got.keys() == want.keys()
    for s in want:
        assert got[s] == pytest.approx(want[s], abs=2e-6)


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
COORD = st.floats(
    min_value=-1.0, max_value=1.0, allow_nan=False, width=32
)
VECS = st.lists(
    st.tuples(COORD, COORD), min_size=2, max_size=12
)


@settings(max_examples=5, deadline=None)
@given(VECS)
def test_dim_and_norm_stats_match_numpy(spark, vecs):
    import math as m

    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import (
        dim_stats,
        norm_profile,
    )

    df = spark.createDataFrame(
        [(i, list(v), 0) for i, v in enumerate(vecs)], EMB_SCHEMA
    )
    # mirror the exact quantization convention: float32 -> double ->
    # floor(x * 2^20)
    q = np.floor(
        np.array(vecs, dtype=np.float32).astype(np.float64) * 1048576.0
    )
    n = len(vecs)
    got = {r["dim"]: r for r in dim_stats(df).collect()}
    for d in (0, 1):
        col = q[:, d]
        assert got[d]["mean"] == pytest.approx(
            round(col.sum() / n / 1048576.0, 6), abs=2e-6
        )
        var = (
            (col * col).sum() - col.sum() * col.sum() / n
        ) / n / 1099511627776.0
        assert got[d]["variance"] == pytest.approx(round(var, 6), abs=2e-6)
    norms = np.sqrt((q * q).sum(axis=1) / 1099511627776.0)
    r = norm_profile(df).collect()[0]
    assert r["n"] == n
    assert r["min_norm"] == pytest.approx(round(norms.min(), 6), abs=2e-6)
    assert r["max_norm"] == pytest.approx(round(norms.max(), 6), abs=2e-6)
    assert r["mean_norm"] == pytest.approx(
        round(sum(round(float(x), 6) for x in norms) / n, 6), abs=2e-6
    )
    assert r["frac_unnormalized"] == pytest.approx(
        round(sum(1 for x in norms if m.fabs(x - 1.0) > 0.01) / n, 6),
        abs=2e-6,
    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(COORD, COORD, st.integers(min_value=0, max_value=2)),
        min_size=3,
        max_size=10,
    )
)
def test_knn_label_audit_matches_python(spark, rows):
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import knn_label_audit

    # degenerate zero vectors break cosine; keep coordinates away
    vecs = [
        (x if abs(x) > 1e-3 else 0.5, y, lab) for x, y, lab in rows
    ]
    df = spark.createDataFrame(
        [(i, [v[0], v[1]], v[2]) for i, v in enumerate(vecs)], EMB_SCHEMA
    )
    k = 3
    got = {
        r["query_id"]: r
        for r in knn_label_audit(
            df, query_ids=tuple(range(len(vecs))), k=k
        ).collect()
    }
    # python mirror: float32 -> normalized float64, round-6 cosine,
    # (cosine desc, vec_id asc) shortlist, (votes desc, label asc) vote
    m = np.array(
        [[v[0], v[1]] for v in vecs], dtype=np.float32
    ).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 6)
    for qi in range(len(vecs)):
        cands = sorted(
            (
                (-cos[qi, vi], vi)
                for vi in range(len(vecs))
                if vi != qi
            ),
        )[:k]
        votes: dict = {}
        for _, vi in cands:
            votes[vecs[vi][2]] = votes.get(vecs[vi][2], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = got[qi]
        assert r["true_label"] == vecs[qi][2]
        assert r["predicted_label"] == pred[0]
        assert r["votes"] == pred[1]
        assert r["correct"] is (pred[0] == vecs[qi][2])
