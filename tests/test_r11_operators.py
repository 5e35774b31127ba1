"""r11 rank/nonparametric inference wave: hand-computed fixtures for
Kendall tau-b, Mann-Whitney U, the runs test, chi-square/Cramér's V,
and source JSD (oracle parity is covered by test_oracle_parity)."""

from __future__ import annotations

import math

from tests.test_r8_operators import _events

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _daily_events(spark, per_type_daily_counts):
    """{type: [day1_count, day2_count, ...]} → events frame."""
    rows = []
    for t, counts in per_type_daily_counts.items():
        for d, c in enumerate(counts, start=1):
            rows.extend((1, d, 9, t, 1.0) for _ in range(c))
    return _events(spark, rows)


def test_kendall_tau_exact(spark):
    from kafka_overwatch_spark.operators.relational import (
        kendall_tau_daily,
    )

    ev = _daily_events(
        spark, {"a": [1, 2, 3], "b": [3, 2, 1], "c": [2, 2, 3]}
    )
    got = {
        (r["type_a"], r["type_b"]): r
        for r in kendall_tau_daily(ev).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["concordant"], ab["discordant"]) == (0, 3)
    assert ab["tau_b"] == -1.0
    assert ab["n_days"] == 3
    # ties in one series shrink that side's denominator (tau-b)
    ac = got[("a", "c")]
    assert (ac["concordant"], ac["discordant"]) == (2, 0)
    assert ac["tau_b"] == round(2 / math.sqrt(3 * 2), 6)
    bc = got[("b", "c")]
    assert bc["tau_b"] == round(-2 / math.sqrt(2 * 3), 6)


def test_mann_whitney_exact(spark):
    from kafka_overwatch_spark.operators.relational import (
        mann_whitney_values,
    )

    ev = _events(
        spark,
        [(1, 1, 9, "x", v) for v in (1.0, 2.0, 3.0)]
        + [(1, 1, 9, "y", v) for v in (2.0, 3.0, 4.0)],
    )
    rows = mann_whitney_values(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    # pooled midranks: 1→1, 2→2.5, 3→4.5, 4→6; R_x = 8, U_x = 2
    assert (r["type_a"], r["type_b"], r["n_a"], r["n_b"]) == (
        "x", "y", 3, 3,
    )
    assert r["u_a"] == 2.0
    tie_mass = (2**3 - 2) + (2**3 - 2)
    var = 3 * 3 / 12 * ((6 + 1) - tie_mass / (6 * 5))
    want_z = round((2.0 - 4.5) / math.sqrt(var), 6)
    assert r["z"] == want_z


def test_runs_test_exact(spark):
    from kafka_overwatch_spark.operators.relational import runs_test_daily

    ev = _daily_events(spark, {"r": [5, 1, 5, 1, 5, 1]})
    rows = runs_test_daily(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_days"], r["n_above"], r["n_below"], r["runs"]) == (
        6, 3, 3, 6,
    )
    assert r["z"] == round(2.0 / math.sqrt(1.2), 6)


def test_runs_test_drops_median_days(spark):
    from kafka_overwatch_spark.operators.relational import runs_test_daily

    # median of [1, 2, 3] is 2 → the middle day drops; signs [0, 1]
    ev = _daily_events(spark, {"m": [1, 2, 3]})
    r = runs_test_daily(ev).collect()[0]
    assert (r["n_days"], r["runs"]) == (2, 2)


def test_chi2_independence_zero_on_uniform(spark):
    from kafka_overwatch_spark.operators.relational import chi2_type_dow

    ev = _daily_events(spark, {"a": [5, 5], "b": [5, 5]})
    r = chi2_type_dow(ev).collect()[0]
    assert (r["n"], r["n_types"], r["n_dows"], r["dof"]) == (20, 2, 2, 1)
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chi2_perfect_association(spark):
    from kafka_overwatch_spark.operators.relational import chi2_type_dow

    # type a only on day 1, type b only on day 2: V = 1
    ev = _daily_events(spark, {"a": [6, 0], "b": [0, 6]})
    r = chi2_type_dow(ev).collect()[0]
    assert r["cramers_v"] == 1.0


def test_source_jsd_identical_and_disjoint(spark):
    from kafka_overwatch_spark.pipelines.text import source_jsd

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 10),
            (2, "alpha beta gamma", "en", "s2", 10),
            (3, "delta epsilon zeta", "en", "s3", 10),
        ],
        DOC_SCHEMA,
    )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_jsd(docs).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert got[("s1", "s2")]["jsd"] == 0.0
    assert got[("s1", "s2")]["shared_tokens"] == 3
    # disjoint vocabularies: maximal divergence ln 2
    assert got[("s1", "s3")]["jsd"] == round(math.log(2.0), 6)
    assert got[("s1", "s3")]["shared_tokens"] == 0


def test_ks_test_exact(spark):
    from kafka_overwatch_spark.operators.relational import ks_test_values

    ev = _events(
        spark,
        [(1, 1, 9, "x", v) for v in (1.0, 2.0, 3.0)]
        + [(1, 1, 9, "y", v) for v in (2.0, 3.0, 4.0)],
    )
    r = ks_test_values(ev).collect()[0]
    assert (r["type_a"], r["type_b"], r["n_a"], r["n_b"]) == (
        "x", "y", 3, 3,
    )
    d = 3.0 / (3.0 * 3.0)  # num_max = |1*3 - 0*3| = 3
    assert r["d_stat"] == round(d, 6)
    assert r["d_scaled"] == round(math.sqrt(9.0 / 6.0) * d, 6)


def test_ks_identical_distributions_zero(spark):
    from kafka_overwatch_spark.operators.relational import ks_test_values

    ev = _events(
        spark,
        [(1, 1, 9, "x", v) for v in (1.0, 2.0, 2.0)]
        + [(1, 1, 9, "y", v) for v in (1.0, 2.0, 2.0)],
    )
    r = ks_test_values(ev).collect()[0]
    assert r["d_stat"] == 0.0 and r["d_scaled"] == 0.0


def test_fdr_anomalies_planted_spike(spark):
    from kafka_overwatch_spark.operators.relational import (
        fdr_daily_anomalies,
    )

    # type 'a': mild variation + one huge spike day; type 'b': the
    # same mild variation only. BH over m=14 tests must flag exactly
    # the spike cell.
    ev = _daily_events(
        spark,
        {"a": [4, 5, 6, 4, 5, 6, 50], "b": [4, 5, 6, 4, 5, 6, 5]},
    )
    rows = fdr_daily_anomalies(ev).collect()
    assert len(rows) == 14 and all(r["m_tests"] == 14 for r in rows)
    sig = [r for r in rows if r["significant"]]
    assert len(sig) == 1
    spike = sig[0]
    # the one discovery is type a's spike day (the max epoch day of a)
    assert spike["event_type"] == "a" and spike["c"] == 50
    assert spike["day"] == max(r["day"] for r in rows)
    assert spike["rank"] == 1


def test_fdr_erf_polynomial_accuracy(spark):
    """The A&S 7.1.26 polynomial must track math.erfc to ~1.5e-7 over
    the z range the operator produces (the determinism contract is
    bit-equality across ENGINES; this pins closeness to the truth)."""
    import math as m

    from pyspark.sql import functions as F

    from kafka_overwatch_spark.operators.relational import _erfc_pos

    df = spark.createDataFrame(
        [(z / 10.0,) for z in range(0, 60)], "z double"
    ).select("z", _erfc_pos(F.col("z")).alias("e"))
    for r in df.collect():
        assert abs(r["e"] - m.erfc(r["z"])) < 2e-7, r["z"]


def _py_pacf(counts):
    n = len(counts)
    s = float(sum(counts))
    q = float(sum(c * c for c in counts))
    xb = s / n
    den0 = q - n * xb * xb
    r = {}
    for k in (1, 2, 3):
        pairs = [(counts[i], counts[i - k]) for i in range(k, n)]
        p = float(sum(a * b for a, b in pairs))
        h = float(sum(a for a, _ in pairs))
        t = float(sum(b for _, b in pairs))
        m = len(pairs)
        r[k] = (p - xb * (h + t) + m * xb * xb) / den0 if den0 > 0 else None
    r1, r2, r3 = r[1], r[2], r[3]
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = r1 - phi22 * r1
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
        1.0 - phi21 * r1 - phi22 * r2
    )
    return tuple(round(v, 6) for v in (r1, r2, r3, r1, phi22, phi33))


def test_pacf_matches_python_reference(spark):
    from kafka_overwatch_spark.operators.relational import pacf_daily

    counts = [3, 5, 3, 5, 4, 6, 3, 5, 2, 6]
    ev = _daily_events(spark, {"p": counts})
    r = pacf_daily(ev).collect()[0]
    want = _py_pacf(counts)
    got = (r["r1"], r["r2"], r["r3"], r["pacf1"], r["pacf2"], r["pacf3"])
    assert got == want
    # period-2 alternation: lag-1 anticorrelation dominates
    assert r["r1"] < 0 and r["pacf1"] == r["r1"]


def test_pacf_constant_series_is_null(spark):
    from kafka_overwatch_spark.operators.relational import pacf_daily

    ev = _daily_events(spark, {"k": [4, 4, 4, 4, 4, 4]})
    r = pacf_daily(ev).collect()[0]
    assert r["r1"] is None and r["pacf2"] is None and r["pacf3"] is None
