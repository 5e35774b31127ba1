"""Kafka-enabled CI seam (VERDICT r5 next #8): these integration tests
are SKIPPED (visible in the suite, never absent) until the environment
provides what this container lacks — the confluent-kafka package, a
live broker ($KAFKA_BOOTSTRAP), and/or the spark-sql-kafka connector
jar. The moment any of those appear, the corresponding test lights up
and exercises the real binding end to end; until then the same code
paths are covered by the fake-client protocol tests
(tests/test_collector.py) and the file-source streaming twins
(tests/test_streaming.py)."""

from __future__ import annotations

import importlib.util
import os

import pytest

HAS_CONFLUENT = importlib.util.find_spec("confluent_kafka") is not None
BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "")


@pytest.mark.skipif(
    not HAS_CONFLUENT, reason="confluent-kafka not installed"
)
@pytest.mark.skipif(
    not BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set (no live broker)"
)
def test_live_collector_snapshot_rows(spark):
    """collect_snapshot over the real AdminClient/Consumer binding must
    produce snapshot rows whose shapes land in the snapshot tables."""
    from kafka_overwatch_spark.sources.kafka_collector import (
        collect_snapshot,
        confluent_client,
    )

    client = confluent_client(BOOTSTRAP)
    rows = collect_snapshot(client, cluster="live", scan_id=0)
    # a functioning broker always reports ≥ 0 topics; every
    # partition_offsets row is (cluster, topic, pid, scan, lo, hi, ts)
    for po in rows.partition_offsets:
        assert len(po) == 7 and po[0] == "live" and po[5] >= po[4]
    for tp in rows.topics:
        assert len(tp) == 5
    # the rows register into the Spark snapshot model unchanged
    df = spark.createDataFrame(
        rows.partition_offsets or [("live", "t", 0, 0, 0, 0, None)],
        "cluster string, topic string, partition_id long, scan_id long, "
        "start_offset long, end_offset long, ts timestamp",
    )
    assert df.count() >= 0


@pytest.mark.skipif(
    not HAS_CONFLUENT, reason="confluent-kafka not installed"
)
def test_confluent_client_constructs_without_broker():
    """Client construction is broker-free (lazy connect) — catches API
    drift in the binding the moment the package is importable, even
    before a broker exists in CI."""
    from kafka_overwatch_spark.sources.kafka_collector import (
        confluent_client,
    )

    client = confluent_client("localhost:19092")
    assert hasattr(client, "list_topics")


def test_kafka_readstream_lights_up_with_connector(spark):
    """readStream.format('kafka') end offsets: runs for real when the
    spark-sql-kafka jar + a broker are present; otherwise skips with the
    precise missing piece named."""
    from kafka_overwatch_spark.streaming.offsets import (
        end_offsets_from_records,
        kafka_record_stream,
        kafka_source_available,
    )

    if not kafka_source_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on classpath")
    if not BOOTSTRAP:
        pytest.skip("KAFKA_BOOTSTRAP not set (no live broker)")
    records = kafka_record_stream(spark, BOOTSTRAP)
    seen = []
    q = (
        records.writeStream.trigger(availableNow=True)
        .foreachBatch(
            lambda b, i: seen.append(
                end_offsets_from_records(b, scan_id=0).collect()
            )
        )
        .start()
    )
    q.awaitTermination(60)
    assert seen, "no micro-batch arrived from the live broker"
    for batch in seen:
        for r in batch:
            assert r.end_offset > r.start_offset >= 0
