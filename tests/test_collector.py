"""Collector seam: a fake ClusterClient scan lands in the snapshot schema
and the usage pipeline runs over it end-to-end."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


class FakeClient:
    def __init__(self):
        self.scan = 0

    def list_topics(self):
        return ["app.orders.1", "_internal.hb"]

    def describe_topic(self, topic):
        return [0, 1] if topic == "app.orders.1" else [0]

    def topic_config(self, topic):
        return {"retention.ms": "3600000"} if topic.startswith("app") else {}

    def watermarks(self, topic, pid):
        base = 100 * (pid + 1)
        return (0, base + 10 * self.scan)

    def list_groups(self):
        return ["cg-1", "cg-2"]

    def describe_group(self, group_id):
        return ("STABLE", 2) if group_id == "cg-1" else ("EMPTY", 0)

    def committed_offsets(self, group_id):
        if group_id == "cg-1":
            return [("app.orders.1", 0, 80), ("app.orders.1", 1, -1)]
        return [("ghost.topic", 0, 5)]


@pytest.fixture()
def scans():
    from kafka_overwatch_spark.sources.kafka_collector import collect_snapshot

    client = FakeClient()
    base = datetime(2024, 1, 1)
    out = []
    for scan_id in range(2):
        client.scan = scan_id
        out.append(
            collect_snapshot(
                client, "test", scan_id, now=base + timedelta(minutes=scan_id)
            )
        )
    return out


def test_collect_snapshot_shapes(scans):
    first = scans[0]
    assert len(first.partition_offsets) == 3  # 2 + 1 partitions
    assert len(first.topics) == 2
    assert len(first.consumer_groups) == 2
    assert len(first.group_offsets) == 3
    cluster, topic, pid, scan_id, low, high, ts = first.partition_offsets[0]
    assert cluster == "test" and scan_id == 0 and low == 0 and high > 0
    # config mapping: retention parsed, missing keys None
    by_name = {t[1]: t for t in first.topics}
    assert by_name["app.orders.1"][3] == 3600000
    assert by_name["_internal.hb"][3] is None


def test_collected_rows_run_through_usage_pipeline(spark, scans):
    from kafka_overwatch_spark.operators.usage import build_topics_df
    from kafka_overwatch_spark.streaming.offsets import OFFSET_SCHEMA

    po_rows = [r for s in scans for r in s.partition_offsets]
    po = spark.createDataFrame(po_rows, OFFSET_SCHEMA)
    cg = spark.createDataFrame(
        scans[-1].consumer_groups, ["cluster", "group_id", "state", "members"]
    )
    go = spark.createDataFrame(
        scans[-1].group_offsets,
        ["cluster", "group_id", "topic", "partition_id", "committed_offset"],
    )
    snaps = {"partition_offsets": po, "consumer_groups": cg, "group_offsets": go}
    # adapt: build_topics_df expects FINAL_SCAN=3; rescan ids 0/1 -> 0/3
    from pyspark.sql import functions as F

    snaps["partition_offsets"] = po.withColumn(
        "scan_id", F.when(F.col("scan_id") == 1, 3).otherwise(0)
    )
    rows = {r["name"]: r for r in build_topics_df(snaps).collect()}
    assert rows["app.orders.1"]["partitions"] == 2
    # scan 1 watermarks moved +10/partition → new_messages = 20
    assert rows["app.orders.1"]["new_messages"] == 20
    # cg-1 has committed offsets on it; cg-2 only on the unknown topic
    assert rows["app.orders.1"]["consumer_groups"] == 1
    assert rows["app.orders.1"]["active_groups"] == 1
    assert rows["_internal.hb"]["consumer_groups"] == 0
