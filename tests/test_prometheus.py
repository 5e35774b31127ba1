"""Prometheus delivery path: exposition rendering, textfile atomic
replace, pushgateway protocol (against an in-process HTTP server), and
the foreachBatch binding."""

from __future__ import annotations

import http.server
import tempfile
import threading


def _metrics(spark, snaps):
    from kafka_overwatch_spark.operators.metrics import metrics_snapshot

    return metrics_snapshot(snaps)


def test_exposition_format(spark, snaps):
    from kafka_overwatch_spark.sinks.prometheus import render_exposition

    body = render_exposition(_metrics(spark, snaps))
    lines = body.splitlines()
    assert "# TYPE kafka_topics_total gauge" in lines
    assert "# TYPE kafka_consumer_group_lag gauge" in lines
    sample = next(
        l for l in lines if l.startswith("kafka_topics_total{")
    )
    assert 'cluster="' in sample and sample.split()[-1].isdigit()
    lag_lines = [
        l for l in lines if l.startswith("kafka_consumer_group_lag{")
    ]
    assert lag_lines and all(
        'group="' in l and 'topic="' in l for l in lag_lines
    )
    # deterministic: rendering twice yields identical bytes
    assert body == render_exposition(_metrics(spark, snaps))


def test_textfile_sink_and_foreach_batch(spark, snaps):
    from kafka_overwatch_spark.sinks.prometheus import (
        foreach_batch_textfile,
        write_textfile,
    )

    m = _metrics(spark, snaps)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/overwatch.prom"
        write_textfile(m, path)
        first = open(path).read()
        assert first.endswith("\n") and "kafka_partitions_total{" in first
        # foreachBatch binding: latest batch replaces the file (gauge
        # semantics); identity metrics_fn default
        sink = foreach_batch_textfile(path)
        sink(m.filter("metric = 'kafka_topics_total'"), batch_id=7)
        second = open(path).read()
        assert "kafka_consumer_group_lag" not in second
        assert "kafka_topics_total{" in second


def test_pushgateway_put_roundtrip(spark, snaps):
    from kafka_overwatch_spark.sinks.prometheus import (
        build_push_request,
        push_to_gateway,
    )

    received = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_PUT(self):
            received["path"] = self.path
            received["body"] = self.rfile.read(
                int(self.headers["Content-Length"])
            )
            received["ctype"] = self.headers["Content-Type"]
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        m = _metrics(spark, snaps)
        url = f"http://127.0.0.1:{srv.server_port}"
        status = push_to_gateway(m, url, job="kafka_overwatch")
        assert status == 200
        assert received["path"] == "/metrics/job/kafka_overwatch"
        assert received["ctype"].startswith("text/plain")
        # the PUT body is exactly the exposition build
        _, body = build_push_request(m, url, "kafka_overwatch")
        assert received["body"] == body
    finally:
        srv.shutdown()


def test_collector_resilience_counters_in_exposition(spark, snaps):
    """VERDICT r12 next #8: the ResilientClusterClient retry/replace
    counters must render as counter families next to the scan-latency
    Summaries, one series per cluster, sorted and deterministic."""
    from kafka_overwatch_spark.operators.metrics import (
        ScanLatencySummaries,
    )
    from kafka_overwatch_spark.sinks.prometheus import render_exposition

    class _FakeResilient:
        def __init__(self, retries, replacements):
            self.retries = retries
            self.replacements = replacements

    summaries = ScanLatencySummaries(clock=iter([0.0, 1.5]).__next__)
    with summaries.time("topics_describe_latency", "prod"):
        pass
    body = render_exposition(
        _metrics(spark, snaps),
        summaries=summaries,
        collectors={
            "prod": _FakeResilient(3, 1),
            "staging": _FakeResilient(0, 0),
        },
    )
    lines = body.splitlines()
    assert "# TYPE kafka_collector_retries_total counter" in lines
    assert (
        "# TYPE kafka_collector_client_replacements_total counter"
        in lines
    )
    assert 'kafka_collector_retries_total{cluster="prod"} 3' in lines
    assert 'kafka_collector_retries_total{cluster="staging"} 0' in lines
    assert (
        'kafka_collector_client_replacements_total{cluster="prod"} 1'
        in lines
    )
    # counters come after the summary families they annotate
    assert lines.index(
        "# TYPE kafka_collector_retries_total counter"
    ) > lines.index("# TYPE topics_describe_latency summary")
