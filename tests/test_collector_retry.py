"""Retry/backoff + health-check at the collector seam (VERDICT r11 next
#3): fake flaky clients exercise the delay schedule, the exhaustion →
replace-client path, and the health probe — no broker needed, exactly
how the reference's @retry/check_replace pair would be unit-tested
(`kafka_resources/__init__.py:14-19`,
`overwatch_resources/clusters.py:134-163`)."""

from __future__ import annotations

import pytest

from tests.test_collector import FakeClient


class Boom(Exception):
    pass


class FlakyClient(FakeClient):
    """Fails the first ``fail_n`` calls of EVERY capability, then works."""

    def __init__(self, fail_n: int):
        super().__init__()
        self.fail_n = fail_n
        self.calls = 0
        self.closed = False

    def _maybe_fail(self):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise Boom(f"transient failure #{self.calls}")

    def list_topics(self):
        self._maybe_fail()
        return super().list_topics()

    def close(self):
        self.closed = True


def _policy(**kw):
    from kafka_overwatch_spark.sources.kafka_collector import RetryPolicy

    kw.setdefault("exceptions", (Boom,))
    return RetryPolicy(**kw)


def test_retry_call_backoff_schedule_capped():
    from kafka_overwatch_spark.sources.kafka_collector import retry_call

    attempts, slept = [], []

    def fn():
        attempts.append(1)
        if len(attempts) < 6:
            raise Boom()
        return "ok"

    out = retry_call(fn, _policy(tries=6), sleep=slept.append)
    assert out == "ok"
    # delay=5 backoff=2 cap=30: 5, 10, 20, 30(cap of 40), 30(cap of 80)
    assert slept == [5.0, 10.0, 20.0, 30.0, 30.0]


def test_retry_call_exhausts_and_raises_last():
    from kafka_overwatch_spark.sources.kafka_collector import retry_call

    slept = []

    def fn():
        raise Boom("always")

    with pytest.raises(Boom, match="always"):
        retry_call(fn, _policy(tries=3), sleep=slept.append)
    assert slept == [5.0, 10.0]  # tries=3 → 2 sleeps


def test_retry_call_unlisted_exception_propagates_immediately():
    from kafka_overwatch_spark.sources.kafka_collector import retry_call

    slept = []

    def fn():
        raise ValueError("not retryable")

    with pytest.raises(ValueError):
        retry_call(fn, _policy(tries=5), sleep=slept.append)
    assert slept == []


def test_resilient_client_retries_through_transients():
    from kafka_overwatch_spark.sources.kafka_collector import (
        ResilientClusterClient,
        collect_snapshot,
    )

    client = FlakyClient(fail_n=2)
    slept = []
    res = ResilientClusterClient(
        factory=lambda: client, policy=_policy(tries=5), sleep=slept.append
    )
    snap = collect_snapshot(res, "test", 0)
    assert len(snap.topics) == 2 and len(snap.partition_offsets) == 3
    assert res.retries == 2 and res.replacements == 0
    assert slept == [5.0, 10.0]


def test_resilient_client_replaces_after_exhaustion():
    from kafka_overwatch_spark.sources.kafka_collector import (
        ResilientClusterClient,
    )

    dead = FlakyClient(fail_n=10**9)
    healthy = FlakyClient(fail_n=0)
    built = []

    def factory():
        built.append(1)
        return dead if len(built) == 1 else healthy

    res = ResilientClusterClient(
        factory=factory, policy=_policy(tries=3), sleep=lambda _x: None
    )
    assert res.list_topics() == ["app.orders.1", "_internal.hb"]
    assert res.replacements == 1 and len(built) == 2
    assert dead.closed  # the dead client was released before replacing


def test_resilient_client_raises_when_replacement_also_dead():
    from kafka_overwatch_spark.sources.kafka_collector import (
        ResilientClusterClient,
    )

    res = ResilientClusterClient(
        factory=lambda: FlakyClient(fail_n=10**9),
        policy=_policy(tries=2),
        sleep=lambda _x: None,
    )
    with pytest.raises(Boom):
        res.list_topics()
    assert res.replacements == 1


def test_health_check_and_manual_replace():
    from kafka_overwatch_spark.sources.kafka_collector import (
        ResilientClusterClient,
    )

    clients = [FlakyClient(fail_n=10**9), FlakyClient(fail_n=0)]
    res = ResilientClusterClient(
        factory=lambda: clients.pop(0),
        policy=_policy(tries=2),
        sleep=lambda _x: None,
    )
    assert res.health_check() is False
    res.replace_client()
    assert res.health_check() is True
    assert res.replacements == 1


def test_infinite_tries_schedule_is_unbounded():
    from kafka_overwatch_spark.sources.kafka_collector import RetryPolicy
    import itertools

    p = RetryPolicy(tries=-1, delay=1.0, max_delay=4.0, backoff=2.0)
    first = list(itertools.islice(p.delays(), 6))
    assert first == [1.0, 2.0, 4.0, 4.0, 4.0, 4.0]


def test_scan_latency_summaries_record_and_render(spark):
    """The reference's topics/groups describe-latency Summaries
    (`monitoring/prometheus.py:17-28`): one scan observes each section
    once; the exposition renders summary _count/_sum series next to
    the gauges."""
    from kafka_overwatch_spark.operators.metrics import (
        ScanLatencySummaries,
    )
    from kafka_overwatch_spark.sinks.prometheus import render_exposition
    from kafka_overwatch_spark.sources.kafka_collector import (
        collect_snapshot,
    )

    ticks = iter(range(100))
    summaries = ScanLatencySummaries(clock=lambda: float(next(ticks)))
    collect_snapshot(FakeClient(), "test", 0, summaries=summaries)
    rows = summaries.rows()
    assert [(m, c, n) for m, c, n, _s in rows] == [
        ("groups_describe_latency", "test", 1),
        ("topics_describe_latency", "test", 1),
    ]
    assert all(s >= 1.0 for *_x, s in rows)  # fake clock ticks by 1

    gauges = spark.createDataFrame(
        [("kafka_topics_total", "test", None, None, 2)],
        "metric string, cluster string, group_id string, topic string,"
        " value long",
    )
    body = render_exposition(gauges, summaries=summaries)
    assert "# TYPE topics_describe_latency summary" in body
    assert 'topics_describe_latency_count{cluster="test"} 1' in body
    assert 'groups_describe_latency_sum{cluster="test"}' in body
    assert 'kafka_topics_total{cluster="test"} 2' in body
    # DataFrame form renders identically
    body2 = render_exposition(gauges, summaries=summaries.frame(spark))
    assert body2 == body


def test_summaries_accumulate_across_scans(spark):
    from kafka_overwatch_spark.operators.metrics import (
        ScanLatencySummaries,
    )
    from kafka_overwatch_spark.sources.kafka_collector import (
        collect_snapshot,
    )

    ticks = iter(range(100))
    summaries = ScanLatencySummaries(clock=lambda: float(next(ticks)))
    for scan_id in range(3):
        collect_snapshot(FakeClient(), "test", scan_id, summaries=summaries)
    assert [(m, n) for m, _c, n, _s in summaries.rows()] == [
        ("groups_describe_latency", 3),
        ("topics_describe_latency", 3),
    ]
