"""Property-based laws (hypothesis) for the r11 rank/nonparametric
wave: each statistic is recomputed by an independent pure-python
reference on the same generated data — a different failure surface
than the DuckDB oracle (which shares the SQL formulation). Examples
are few (one Spark job each)."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

EVENT_COLS = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)

# two short daily-count series (>= 4 days so pairs exist)
SERIES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=4,
    max_size=9,
)
# two small value samples (integers cast to double keep ties frequent)
VALUES = st.tuples(
    st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=12),
    st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=12),
)


def _daily_pair_events(spark, series):
    rows = []
    i = 0
    for d, (ca, cb) in enumerate(series, start=1):
        for _ in range(ca):
            rows.append((i, 1, dt.datetime(2024, 1, d), "a", 1.0))
            i += 1
        for _ in range(cb):
            rows.append((i, 1, dt.datetime(2024, 1, d), "b", 1.0))
            i += 1
    return spark.createDataFrame(rows, EVENT_COLS)


def _value_events(spark, xs, ys):
    rows = [(i, 1, dt.datetime(2024, 1, 1), "x", float(v)) for i, v in enumerate(xs)]
    rows += [
        (1000 + i, 1, dt.datetime(2024, 1, 1), "y", float(v))
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, EVENT_COLS)


def _py_kendall(xs, ys):
    n = len(xs)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    den = (n0 - tx) * (n0 - ty)
    tau = (c - d) / math.sqrt(den) if den > 0 else None
    return c, d, None if tau is None else round(tau, 6)


@settings(max_examples=6, deadline=None)
@given(SERIES)
def test_kendall_matches_python(spark, series):
    from kafka_overwatch_spark.operators.relational import (
        kendall_tau_daily,
    )

    xs = [s[0] for s in series]
    ys = [s[1] for s in series]
    rows = kendall_tau_daily(_daily_pair_events(spark, series)).collect()
    assert len(rows) == 1
    r = rows[0]
    c, d, tau = _py_kendall(xs, ys)
    assert (r["concordant"], r["discordant"]) == (c, d)
    assert r["tau_b"] == tau
    if tau is not None:
        assert -1.0 <= r["tau_b"] <= 1.0


def _py_mw(xs, ys):
    pooled = sorted(set(xs) | set(ys))
    cum = 0
    ra = 0.0
    tie_mass = 0
    for v in pooled:
        ca, cb = xs.count(v), ys.count(v)
        t = ca + cb
        ra += ca * (cum + (t + 1) / 2.0)
        tie_mass += t * t * t - t
        cum += t
    na, nb = len(xs), len(ys)
    u = ra - na * (na + 1) / 2.0
    n = na + nb
    var = na * nb / 12.0 * ((n + 1.0) - tie_mass / (n * (n - 1.0)))
    z = (u - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
    return round(u, 6), None if z is None else round(z, 6)


@settings(max_examples=6, deadline=None)
@given(VALUES)
def test_mann_whitney_and_ks_match_python(spark, vals):
    from kafka_overwatch_spark.operators.relational import (
        ks_test_values,
        mann_whitney_values,
    )

    xs, ys = list(vals[0]), list(vals[1])
    ev = _value_events(spark, xs, ys)
    mw = mann_whitney_values(ev).collect()[0]
    u, z = _py_mw(xs, ys)
    assert mw["u_a"] == u and mw["z"] == z
    assert 0.0 <= mw["u_a"] <= len(xs) * len(ys)

    ks = ks_test_values(ev).collect()[0]
    pooled = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best = 0
    ca = cb = 0
    for v in pooled:
        ca += xs.count(v)
        cb += ys.count(v)
        best = max(best, abs(ca * nb - cb * na))
    assert ks["d_stat"] == round(best / (na * nb), 6)
    assert 0.0 <= ks["d_stat"] <= 1.0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=12))
def test_runs_test_matches_python(spark, counts):
    from kafka_overwatch_spark.operators.relational import runs_test_daily

    rows = []
    i = 0
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((i, 1, dt.datetime(2024, 1, d), "r", 1.0))
            i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    got = runs_test_daily(ev).collect()
    srt = sorted(counts)
    n = len(srt)
    med = (
        srt[n // 2]
        if n % 2
        else (srt[n // 2 - 1] + srt[n // 2]) / 2.0
    )
    signs = [1 if c > med else 0 for c in counts if c != med]
    if not signs:
        assert got == [] or got[0]["n_days"] == 0
        return
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    r = got[0]
    assert (r["n_days"], r["runs"]) == (len(signs), runs)
    assert r["n_above"] == sum(signs)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                  st.text(alphabet="abcde ", min_size=1, max_size=20)),
        min_size=3,
        max_size=12,
    )
)
def test_jsd_bounds_and_python_parity(spark, docs):
    from kafka_overwatch_spark.pipelines.text import source_jsd

    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    rows = source_jsd(df).collect()
    # python reference over normalized tokens
    from collections import Counter

    per = {}
    for s, t in docs:
        toks = " ".join(t.strip().lower().split()).split(" ")
        per.setdefault(s, Counter()).update(toks)
    for r in rows:
        a, b = per[r["source_a"]], per[r["source_b"]]
        ta, tb = sum(a.values()), sum(b.values())
        acc = 0.0
        for tok in set(a) & set(b):
            p, q = a[tok] / ta, b[tok] / tb
            m = (p + q) / 2.0
            acc += round(0.5 * (p * math.log(p / m) + q * math.log(q / m)), 6)
        sa = sum(a[t_] for t_ in set(a) & set(b))
        sb = sum(b[t_] for t_ in set(a) & set(b))
        miss = round(
            0.5 * math.log(2.0) * ((ta - sa) / ta + (tb - sb) / tb), 6
        )
        assert r["jsd"] == round(acc + miss, 6)
        assert -1e-9 <= r["jsd"] <= math.log(2.0) + 1e-9


@settings(max_examples=4, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=30), min_size=6, max_size=10))
def test_fdr_discoveries_monotone_in_q(spark, counts):
    """BH law: the q=0.01 discovery set is a subset of the q=0.05 set
    (same p-values, stricter threshold)."""
    from kafka_overwatch_spark.operators.relational import (
        fdr_daily_anomalies,
    )

    rows = []
    i = 0
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((i, 1, dt.datetime(2024, 1, d), "t", 1.0))
            i += 1
    ev = spark.createDataFrame(rows, EVENT_COLS)
    strict = {
        (r["event_type"], r["day"])
        for r in fdr_daily_anomalies(ev, q=0.01).collect()
        if r["significant"]
    }
    loose = {
        (r["event_type"], r["day"])
        for r in fdr_daily_anomalies(ev, q=0.05).collect()
        if r["significant"]
    }
    assert strict <= loose
