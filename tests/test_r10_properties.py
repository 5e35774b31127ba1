"""Property-based laws (hypothesis) for the r10 operator wave: each
example is one Spark job, so examples are few and batched."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

CHARS = st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30)


def _docs(spark, chars):
    return spark.createDataFrame(
        [(i + 1, "x", "en", "s", c) for i, c in enumerate(chars)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(max_examples=5, deadline=None)
@given(CHARS, st.integers(min_value=1, max_value=50))
def test_pps_total_multiplicity_is_exactly_n(spark, chars, n):
    """Madow's method places EXACTLY n ticks, whatever the weights —
    Σ multiplicity == n, and every multiplicity ≤ ceil(w/step) + 1."""
    from kafka_overwatch_spark.pipelines.sampling import pps_systematic

    rows = pps_systematic(_docs(spark, chars), n=n).collect()
    assert sum(r["multiplicity"] for r in rows) == n
    w_total = sum(chars)
    for r in rows:
        # a doc of weight w can absorb at most ceil(w·n/W) + 1 ticks
        assert r["multiplicity"] <= (r["n_chars"] * n) // w_total + 2


SESSIONS = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["click", "error", "signup", "view"]),
            min_size=0,
            max_size=4,
        ),
        st.booleans(),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(SESSIONS)
def test_shapley_efficiency_law(spark, sessions):
    """Σφ_i == v(observed full set) − v(∅) for ANY session population
    (the Shapley efficiency axiom, with v=0 on unobserved sets)."""
    from kafka_overwatch_spark.operators.relational import (
        shapley_attribution,
    )

    rows = []
    i = 0
    for u, (touches, conv) in enumerate(sessions):
        for t in touches:
            rows.append((i, u + 1, _ts(u, i), t, 1.0))
            i += 1
        if conv:
            rows.append((i, u + 1, _ts(u, i), "purchase", 5.0))
            i += 1
    if not rows:
        return
    ev = _events_raw(spark, rows)
    out = shapley_attribution(ev).collect()
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    # reconstruct v from the sessions directly
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for touches, conv in sessions:
        if not touches and not conv:
            continue  # emitted no events — not a session the engine sees
        m = 0
        for t in touches:
            m |= bits[t]
        agg[m][0] += 1
        agg[m][1] += 1 if conv else 0
    # efficiency axiom: Σφ = v(N) − v(∅) with N = the FULL 4-channel
    # set (mask 15), which is 0 when unobserved — not the union of
    # observed masks
    v = lambda m: (agg[m][1] / agg[m][0]) if m in agg else 0.0
    expected = v(15) - v(0)
    assert sum(r["shapley_credit"] for r in out) == pytest.approx(
        expected, abs=5e-5
    )


def _ts(u, i):
    return (1, 9 + (i % 12))  # day 1, spread hours


def _events_raw(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            (
                eid,
                u,
                dt.datetime(2024, 1, d, h, eid % 60, 0),
                t,
                v,
            )
            for (eid, u, (d, h), t, v) in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )


COUNTS = st.lists(st.integers(min_value=1, max_value=40), min_size=2, max_size=12)


@settings(max_examples=5, deadline=None)
@given(COUNTS)
def test_changepoint_gain_is_max_over_python_splits(spark, counts):
    """The selected split's gain equals the python argmax over all
    splits, and gain ≥ 0 (variance decomposition law)."""
    from kafka_overwatch_spark.operators.relational import changepoint_daily

    rows = []
    for d0, n in enumerate(counts):
        rows += [(1, d0 + 1, h % 24, "click", 1.0) for h in range(n)]
    ev = _events_from_day_counts(spark, rows)
    r = {
        x["event_type"]: x for x in changepoint_daily(ev).collect()
    }["click"]
    best = None
    s_all = sum(counts)
    n_all = len(counts)
    for i in range(1, n_all):
        s1 = sum(counts[:i])
        g = (
            s1 * s1 / i
            + (s_all - s1) ** 2 / (n_all - i)
            - s_all * s_all / n_all
        )
        if best is None or g > best + 1e-12:
            best = g
    assert r["gain"] == pytest.approx(best, abs=1e-4)
    assert r["gain"] >= -1e-9


def _events_from_day_counts(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            (i, u, dt.datetime(2024, 1, d, h, 0, 0), t, v)
            for i, (u, d, h, t, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=4,
        max_size=20,
    )
)
def test_cuped_preserves_arm_means_in_expectation(spark, users):
    """CUPED never moves the ADJUSTED means away from raw means by
    more than θ·(arm mean X − global mean X) — algebraic identity."""
    import datetime as dt

    from kafka_overwatch_spark.operators.relational import cuped_adjusted_ab

    rows = []
    for u, (uid_base, x, y) in enumerate(users):
        uid = u  # unique users, arm = u % 2
        rows.append(
            (len(rows), uid, dt.datetime(2024, 1, 2, 9, 0, 0), "view", float(x))
        )
        rows.append(
            (len(rows), uid, dt.datetime(2024, 1, 20, 9, 0, 0), "view", float(y))
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    r = cuped_adjusted_ab(ev).collect()[0]
    xs = [float(x) for _, (b, x, y) in enumerate(users)]
    arm0_x = [float(x) for u, (b, x, y) in enumerate(users) if u % 2 == 0]
    arm1_x = [float(x) for u, (b, x, y) in enumerate(users) if u % 2 == 1]
    if not arm0_x or not arm1_x:
        return
    mean_x = sum(xs) / len(xs)
    theta = r["theta"]
    shift_a = theta * (sum(arm0_x) / len(arm0_x) - mean_x)
    shift_b = theta * (sum(arm1_x) / len(arm1_x) - mean_x)
    assert r["mean_a_cuped"] == pytest.approx(
        r["mean_a_raw"] - shift_a, abs=1e-3
    )
    assert r["mean_b_cuped"] == pytest.approx(
        r["mean_b_raw"] - shift_b, abs=1e-3
    )
