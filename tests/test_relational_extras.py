"""Properties of the r5 relational additions that no SQL oracle can
state: count-min sketch one-sided error + mergeability, and the native
session_window agreeing with the independent lag+cumsum sessionizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from kafka_overwatch_spark.operators import relational
from kafka_overwatch_spark.registry import get_raw_tables


def test_cms_one_sided_error_and_merge(spark):
    """CMS estimate >= true count for EVERY key (one-sided), within
    eps*N above it, and merging per-half sketches equals the full-data
    sketch (the property that makes it a 100 TB aggregate)."""
    events = get_raw_tables(spark, SF_DIR)["events"]
    exact = {
        r.user_id: r.cnt
        for r in events.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    eps, conf, seed = 0.001, 0.99, 42
    jvm = spark._jvm

    def sketch_of(df):
        b = df.agg(
            F.expr(f"count_min_sketch(user_id, {eps}d, {conf}d, {seed})").alias("s")
        ).collect()[0].s
        return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(b))

    full = sketch_of(events)
    for u, c in exact.items():
        est = full.estimateCount(jvm.java.lang.Long(int(u)))
        assert est >= c, f"user {u}: est {est} < true {c}"
        assert est <= c + eps * n_total * 10, (
            f"user {u}: est {est} way above true {c} (eps*N={eps * n_total})"
        )

    # mergeability: two disjoint halves, merged, must answer identically
    # to the full sketch (CMS merge is exact table addition)
    lo = sketch_of(events.filter(F.col("event_id") % 2 == 0))
    hi = sketch_of(events.filter(F.col("event_id") % 2 == 1))
    lo.mergeInPlace(hi)
    for u in list(exact)[:25]:
        assert lo.estimateCount(jvm.java.lang.Long(int(u))) == full.estimateCount(
            jvm.java.lang.Long(int(u))
        )


def test_sketch_heavy_hitters_superset_of_exact(spark):
    events = get_raw_tables(spark, SF_DIR)["events"]
    exact = {r.user_id for r in relational.heavy_hitter_users(events).collect()}
    est = {
        r.user_id
        for r in relational.heavy_hitter_sketch_estimates(events).collect()
    }
    assert exact <= est, f"sketch lost true heavy hitters: {exact - est}"


def test_native_session_window_matches_lag_cumsum(spark):
    """Two independent sessionization algorithms — the native session
    merge aggregate vs a lag+cumsum window fold with the SAME exact
    microsecond semantics (new session iff ts >= prev + gap) - must
    produce identical sessions. (sessionize_events is NOT the right
    cross-check: it compares truncated seconds with a strict >, so
    boundary events may legitimately differ.)"""
    from pyspark.sql.window import Window

    events = get_raw_tables(spark, SF_DIR)["events"]
    native = relational.events_session_window_native(
        events, gap="12 hours"
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    folded = (
        events.withColumn(
            "new_session",
            (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 12 HOURS")
            ).cast("int"),
        )
        .withColumn(
            "sid",
            F.sum(F.coalesce("new_session", F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).cast("long").alias("session_start_sec"),
            F.count("*").alias("events"),
        )
    )
    n = {
        (r.user_id, r.session_start_sec): r.events for r in native.collect()
    }
    c = {
        (r.user_id, r.session_start_sec): r.events for r in folded.collect()
    }
    assert n == c


def test_ewma_cusum_matches_python_fold(spark):
    """The JVM aggregate fold must reproduce the textbook recurrences
    exactly (same float operation order)."""
    events = get_raw_tables(spark, SF_DIR)["events"]
    got = {
        (r.event_type, r.day): (r.value, r.ewma, r.cusum)
        for r in relational.daily_ewma_cusum(events).collect()
    }

    daily_rows = (
        events.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily_rows:
        series.setdefault(r.event_type, []).append((r.day, r.x))
    alpha, slack = 0.3, 0.5
    want = {}
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        mu = sum(xs) / len(xs)
        sigma = (sum((x - mu) ** 2 for x in xs) / len(xs)) ** 0.5
        prev, cusum = None, 0.0
        for day, x in pts:
            ewma = x if prev is None else alpha * x + (1 - alpha) * prev
            cusum = max(0.0, cusum + x - mu - slack * sigma)
            want[(et, day)] = (round(x, 6), round(ewma, 6), round(cusum, 6))
            prev = ewma
    assert set(got) == set(want)
    for k in got:
        for a, b in zip(got[k], want[k]):
            assert abs(a - b) < 1e-6, (k, got[k], want[k])


def test_cohort_overlap_sketch_error_bound(spark):
    """Inclusion-exclusion over HLL sketches must land within 5% of the
    exact cohort sizes (fixture cardinalities ~150)."""
    events = get_raw_tables(spark, SF_DIR)["events"]
    row = relational.cohort_overlap_sketch(events).collect()[0]
    p = {r.user_id for r in events.filter(F.col("event_type") == "purchase")
         .select("user_id").distinct().collect()}
    e = {r.user_id for r in events.filter(F.col("event_type") == "error")
         .select("user_id").distinct().collect()}
    for est, exact in [
        (row.est_purchasers, len(p)),
        (row.est_errored, len(e)),
        (row.est_union, len(p | e)),
        (row.est_intersection, len(p & e)),
    ]:
        assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_cms_python_decode_matches_jvm_reader(spark):
    """The pure-Python CMS decode (Spark-Connect-safe, r6 verdict #7)
    must agree bit-for-bit with Spark's own JVM
    CountMinSketch.readFrom/estimateCount on every probed key — this
    test pins the V1 wire format and the AMS row-hash semantics; if a
    Spark upgrade ever changes either, this fails before any query
    silently drifts."""
    from kafka_overwatch_spark.operators.relational import (
        _cms_estimate_long,
        _cms_read,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") % 53).alias("user_id")
    )
    buf = bytes(
        df.agg(
            F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("sk")
        ).collect()[0]["sk"]
    )
    sk = _cms_read(buf)
    jvm = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(buf)
    for u in list(range(53)) + [10**12, -5]:
        want = jvm.estimateCount(spark._jvm.java.lang.Long(int(u)))
        assert _cms_estimate_long(sk, u) == want, u


def test_rfm_segments_invariants(spark):
    """RFM cube: scores live in 1..5, user counts tile the user set, and
    each quintile axis splits users into 5 near-equal groups."""
    from kafka_overwatch_spark.operators.relational import user_rfm_segments
    from tests.conftest import SF_DIR

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = user_rfm_segments(events).collect()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.users for r in rows) == n_users
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            v = r[axis]
            assert 1 <= v <= 5, (axis, v)
            per[v] = per.get(v, 0) + r.users
        # SQL-standard NTILE: bucket sizes differ by at most 1
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1, (axis, per)


def test_epoch_mix_budget_conserved(spark):
    """Epoch planner: mixture weights sum to 1 and allocations tile the
    token budget; a source's epochs exceed 1 iff it is upsampled."""
    from kafka_overwatch_spark.pipelines.sampling import epoch_mix_plan
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    budget = 1_000_000
    rows = epoch_mix_plan(docs, token_budget=budget).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.token_alloc for r in rows) - budget) < 1.0
    for r in rows:
        assert (r.epochs > 1.0) == (r.token_alloc > r.tokens)


def test_shipmode_priority_counts_tile_window(spark):
    """Q12 shape: high+low line counts across buckets equal the number
    of lineitem rows in the ship-date window (the join is 1:1 on order)."""
    import pyspark.sql.functions as F

    from kafka_overwatch_spark.operators.relational import (
        ship_latency_priority,
    )
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rows = ship_latency_priority(orders, lineitem).collect()
    in_window = lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == in_window
    # synthetic data ships some lines before the order date; floor()
    # buckets negatives consistently in both engines, so just pin that
    # the bucket axis is bounded (|delay| < ~7 years of days / 30)
    assert all(abs(r.latency_bucket) < 100 for r in rows)


def test_survival_km_textbook_fixture(spark):
    """Hand-computed KM on a constructed cohort: deaths at t=2 (x2) and
    t=5, censored exits at t=0 and t=6 (horizon-day users) — censored
    exits shrink n_risk but contribute NO survival factor, and
    non-death lifetimes emit no output row."""
    import datetime

    from kafka_overwatch_spark.operators.relational import user_survival_km

    def ev(i, uid, day):
        return (
            i,
            datetime.datetime(2024, 1, day, 12, 0, 0),
            uid,
            "click",
            1.0,
            "{}",
        )

    rows = [
        ev(0, 1, 1), ev(1, 1, 3),    # t=2, death
        ev(2, 2, 5), ev(3, 2, 7),    # t=2, death
        ev(4, 3, 1), ev(5, 3, 6),    # t=5, death
        ev(6, 4, 25), ev(7, 4, 31),  # t=6, censored (last = horizon)
        ev(8, 5, 31),                # t=0, censored; pins horizon
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = [
        (r["t"], r["n_risk"], r["d_events"], r["c_censored"], r["survival"])
        for r in user_survival_km(df).orderBy("t").collect()
    ]
    # N=5; exits before t=2: the t=0 censor → n_risk(2)=4, S=1-2/4=0.5
    # exits before t=5: 1 censor + 2 deaths → n_risk(5)=2, S=0.5*(1-1/2)
    assert got == [(2, 4, 2, 0, 0.5), (5, 2, 1, 0, 0.25)]


def test_daily_acf_matches_numpy(spark):
    """ACF values equal numpy's Pearson r on the same lagged pairs."""
    import numpy as np

    from kafka_overwatch_spark.operators.relational import daily_acf

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F

    daily = {
        r["day"]: r["c"]
        for r in ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 86400)).cast("long").alias("day")
        )
        .agg(F.count("*").alias("c"))
        .collect()
    }
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in daily_acf(ev).collect()
    }
    for lag in range(1, 8):
        xs, ys = [], []
        for d, c in daily.items():
            if d - lag in daily:
                xs.append(c)
                ys.append(daily[d - lag])
        if len(xs) < 2:
            assert lag not in got or got[lag][0] == len(xs)
            continue
        want = round(float(np.corrcoef(xs, ys)[0, 1]), 6)
        assert got[lag] == (len(xs), want), (lag, got[lag], want)


def test_holt_forecast_matches_python_fold(spark):
    """Holt level/trend == the exact python recursion on every type's
    sorted daily series (same init, same rounding), and the 1-day
    series NULL-propagates its trend."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.operators.relational import daily_holt_forecast

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    alpha, beta = 0.3, 0.1
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
        .collect()
    )
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    got = {r["event_type"]: r for r in daily_holt_forecast(ev).collect()}
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        l, b = xs[0], None
        for i, x in enumerate(xs):
            if i == 0:
                continue
            if i == 1:
                l, b = x, x - l
            else:
                lnew = alpha * x + (1 - alpha) * (l + b)
                b = beta * (lnew - l) + (1 - beta) * b
                l = lnew
        r = got[et]
        assert r["days"] == len(xs)
        assert r["level"] == round(l, 6)
        if b is None:
            assert r["trend"] is None and r["forecast_7"] is None
        else:
            assert r["trend"] == round(b, 6)
            assert r["forecast_1"] == round(l + b, 6)
            assert r["forecast_7"] == round(l + 7 * b, 6)

    # 1-point series: trend is honestly NULL
    import datetime

    one = spark.createDataFrame(
        [(0, datetime.datetime(2024, 1, 1), 1, "solo", 5.0, "{}")],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    r = daily_holt_forecast(one).collect()[0]
    assert (r["days"], r["level"], r["trend"]) == (1, 5.0, None)
