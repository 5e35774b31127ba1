"""Kafka metadata collector — the live-cluster source feeding the snapshot
model (SURVEY §2.1 S1-S7).

The reference scans with confluent-kafka clients:
- topics + partitions:   `AdminClient.list_topics` / `describe_topics`
  (`kafka_resources/topics.py:28-53`)
- configs:               `describe_configs` (`topics.py:80-92`)
- watermarks:            `Consumer.get_watermark_offsets` per partition
  (`topics.py:168-178`)
- groups + members:      `list/describe_consumer_groups`
  (`kafka_resources/groups.py:23-108`)
- committed offsets:     `list_consumer_group_offsets`, one group per call
  (`groups.py:149-170`)

This module is the connector seam: a ``ClusterClient`` protocol with
exactly those capabilities, and ``collect_snapshot`` turning one scan into
the five snapshot-table row sets. The confluent-kafka binding is import-
guarded (not present in this container); tests drive the protocol with a
fake client (tests/test_collector.py), which is also how the reference's
thread-pooled scan would be unit-tested.

Scale: collection is control-plane work (per-partition metadata RPCs, not
data) — the reference parallelizes with thread pools sized to broker
count (`topics.py:143-145`); the same applies here, and the resulting
rows land in the partitioned ``partition_offsets`` table via a normal
``spark.createDataFrame(...).write`` append per scan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable, Protocol


class ClusterClient(Protocol):
    """The S1-S7 capability surface (confluent-kafka shaped)."""

    def list_topics(self) -> list[str]: ...

    def describe_topic(self, topic: str) -> list[int]:
        """partition ids"""
        ...

    def topic_config(self, topic: str) -> dict[str, str]: ...

    def watermarks(self, topic: str, partition: int) -> tuple[int, int]:
        """(low, high)"""
        ...

    def list_groups(self) -> list[str]: ...

    def describe_group(self, group_id: str) -> tuple[str, int]:
        """(state, members)"""
        ...

    def committed_offsets(self, group_id: str) -> list[tuple[str, int, int]]:
        """[(topic, partition, offset)] — one group per call, mirroring the
        Admin API limitation (`groups.py:149-165`)."""
        ...


@dataclass
class RetryPolicy:
    """The reference's retry envelope (`kafka_resources/__init__.py:14-19`:
    ``@retry((KafkaException,), delay=5, max_delay=30, backoff=2)``) as
    explicit data: exponential backoff from ``delay`` by ``backoff``,
    capped at ``max_delay``; ``tries`` attempts total (the reference's
    decorator retries forever — pass ``tries=-1`` for that; the default
    here is bounded so a dead broker surfaces as an error instead of a
    hung collector)."""

    exceptions: tuple[type[BaseException], ...] = (Exception,)
    tries: int = 5
    delay: float = 5.0
    max_delay: float = 30.0
    backoff: float = 2.0

    def delays(self):
        """The (possibly infinite) backoff schedule between attempts."""
        d = self.delay
        n = 0
        while self.tries < 0 or n < self.tries - 1:
            yield min(d, self.max_delay)
            d *= self.backoff
            n += 1


def retry_call(
    fn: Callable,
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[BaseException, float], None] | None = None,
):
    """Call ``fn`` under the policy: re-invoke on ``policy.exceptions``
    after the scheduled backoff sleep; any other exception propagates
    immediately; the last attempt's exception propagates when the
    schedule runs out. ``sleep`` is injectable so tests assert the
    exact delay sequence without waiting."""
    policy = policy or RetryPolicy()
    delays = policy.delays()
    while True:
        try:
            return fn()
        except policy.exceptions as exc:
            try:
                wait = next(delays)
            except StopIteration:
                raise exc from None
            if on_retry is not None:
                on_retry(exc, wait)
            sleep(wait)


@dataclass
class ResilientClusterClient:
    """``ClusterClient`` decorator adding the reference's two
    resilience behaviors at the collector seam (VERDICT r11 next #3):

    - per-call retry with exponential backoff
      (`kafka_resources/__init__.py:14-19`);
    - health-check + client replacement when retries exhaust
      (`overwatch_resources/clusters.py:134-163`,
      ``check_replace_kafka_clients``): the old client is closed if it
      can be, a fresh one is built from ``factory``, and the call gets
      ONE more attempt on the new client before the error propagates.

    ``factory`` is any zero-arg builder — ``confluent_client`` bound to
    a bootstrap string in production, a fake in tests. ``retries`` and
    ``replacements`` count events for the scan-latency metrics
    (operators.metrics)."""

    factory: Callable[[], ClusterClient]
    policy: RetryPolicy = field(default_factory=RetryPolicy)
    sleep: Callable[[float], None] = time.sleep
    retries: int = 0
    replacements: int = 0

    def __post_init__(self) -> None:
        self._client = self.factory()

    def health_check(self) -> bool:
        """The cheap liveness probe (the reference pings
        ``describe_cluster`` / ``memberid``; the protocol's cheapest
        equivalent is the topic listing)."""
        try:
            self._client.list_topics()
            return True
        except self.policy.exceptions:
            return False

    def replace_client(self) -> None:
        close = getattr(self._client, "close", None)
        if callable(close):
            try:
                close()
            except Exception:  # noqa: BLE001 — dead client, best effort
                pass
        self._client = self.factory()
        self.replacements += 1

    def _call(self, name: str, *args):
        def _count(_exc: BaseException, _wait: float) -> None:
            self.retries += 1

        try:
            return retry_call(
                lambda: getattr(self._client, name)(*args),
                self.policy,
                self.sleep,
                on_retry=_count,
            )
        except self.policy.exceptions:
            self.replace_client()
            return getattr(self._client, name)(*args)

    def list_topics(self) -> list[str]:
        return self._call("list_topics")

    def describe_topic(self, topic: str) -> list[int]:
        return self._call("describe_topic", topic)

    def topic_config(self, topic: str) -> dict[str, str]:
        return self._call("topic_config", topic)

    def watermarks(self, topic: str, partition: int) -> tuple[int, int]:
        return self._call("watermarks", topic, partition)

    def list_groups(self) -> list[str]:
        return self._call("list_groups")

    def describe_group(self, group_id: str) -> tuple[str, int]:
        return self._call("describe_group", group_id)

    def committed_offsets(self, group_id: str) -> list[tuple[str, int, int]]:
        return self._call("committed_offsets", group_id)

    def close(self) -> None:
        close = getattr(self._client, "close", None)
        if callable(close):
            close()


@dataclass
class SnapshotRows:
    partition_offsets: list[tuple]
    topics: list[tuple]
    consumer_groups: list[tuple]
    group_offsets: list[tuple]
    # S3 full config map, exploded (cluster, topic, key, value) — every
    # non-default entry, not just the retention/cleanup convenience
    # columns (`overwatch_resources/topics.py:147-155`)
    topic_configs: list[tuple]


class _NullTimer:
    """No-op stand-in for metrics.ScanLatencySummaries."""

    from contextlib import contextmanager

    @contextmanager
    def time(self, metric: str, cluster: str):
        yield


def collect_snapshot(
    client: ClusterClient,
    cluster: str,
    scan_id: int,
    now: datetime | None = None,
    summaries=None,
) -> SnapshotRows:
    """One scan: the reference's per-interval collection flattened into
    snapshot rows (ts is one instant per scan, `kafka_resources/
    topics.py:105`). Pass ``summaries`` (an
    operators.metrics.ScanLatencySummaries) to record the reference's
    self-instrumentation timers (`monitoring/prometheus.py:17-28`):
    the topics section observes ``topics_describe_latency``, the
    groups section ``groups_describe_latency``."""
    ts = now or datetime.utcnow()
    timer = summaries if summaries is not None else _NullTimer()
    po, tp, cg, go, tc = [], [], [], [], []
    with timer.time("topics_describe_latency", cluster):
        for topic in client.list_topics():
            pids = client.describe_topic(topic)
            config = client.topic_config(topic)
            tp.append(
                (
                    cluster,
                    topic,
                    len(pids),
                    int(config["retention.ms"])
                    if "retention.ms" in config
                    else None,
                    config.get("cleanup.policy"),
                )
            )
            for key in sorted(config):
                tc.append((cluster, topic, key, str(config[key])))
            for pid in pids:
                low, high = client.watermarks(topic, pid)
                po.append((cluster, topic, pid, scan_id, low, high, ts))
    with timer.time("groups_describe_latency", cluster):
        for group_id in client.list_groups():
            state, members = client.describe_group(group_id)
            cg.append((cluster, group_id, state, members))
            for topic, pid, offset in client.committed_offsets(group_id):
                go.append((cluster, group_id, topic, pid, offset))
    return SnapshotRows(po, tp, cg, go, tc)


class ConfluentClusterClient:  # pragma: no cover — needs a live broker
    """Live ``ClusterClient`` over confluent-kafka's public Admin/Consumer
    API, mapping 1:1 onto the reference's calls:

    - list/describe topics → ``AdminClient.list_topics`` metadata
      (`kafka_resources/topics.py:28-53`)
    - configs → ``describe_configs`` non-default entries
      (`topics.py:80-92`)
    - watermarks → ``Consumer.get_watermark_offsets`` per partition
      (`topics.py:168-178`)
    - groups → ``list/describe_consumer_groups``
      (`kafka_resources/groups.py:23-108`)
    - committed → ``list_consumer_group_offsets`` one group per call
      (`groups.py:149-170`)

    Exercised by tests/test_kafka_integration.py, which skips (not
    absent) until confluent-kafka + $KAFKA_BOOTSTRAP exist."""

    def __init__(self, bootstrap_servers: str, timeout: float = 10.0, **config):
        from confluent_kafka import Consumer
        from confluent_kafka.admin import AdminClient

        conf = {"bootstrap.servers": bootstrap_servers, **config}
        self._timeout = timeout
        self._admin = AdminClient(dict(conf))
        self._consumer = Consumer(
            {
                **conf,
                "group.id": "kafka-overwatch-spark-collector",
                "enable.auto.commit": False,
            }
        )

    def list_topics(self) -> list[str]:
        md = self._admin.list_topics(timeout=self._timeout)
        # internal topics (__consumer_offsets, ...) excluded like the
        # reference's scan
        return sorted(t for t in md.topics if not t.startswith("__"))

    def describe_topic(self, topic: str) -> list[int]:
        md = self._admin.list_topics(topic=topic, timeout=self._timeout)
        return sorted(md.topics[topic].partitions)

    def topic_config(self, topic: str) -> dict[str, str]:
        from confluent_kafka.admin import ConfigResource

        res = ConfigResource(ConfigResource.Type.TOPIC, topic)
        cfg = self._admin.describe_configs([res])[res].result(self._timeout)
        return {
            k: v.value
            for k, v in cfg.items()
            if v.value is not None and not v.is_default
        }

    def watermarks(self, topic: str, partition: int) -> tuple[int, int]:
        from confluent_kafka import TopicPartition

        lo, hi = self._consumer.get_watermark_offsets(
            TopicPartition(topic, partition), timeout=self._timeout
        )
        return int(lo), int(hi)

    def list_groups(self) -> list[str]:
        res = self._admin.list_consumer_groups(
            request_timeout=self._timeout
        ).result()
        return sorted(g.group_id for g in res.valid)

    def describe_group(self, group_id: str) -> tuple[str, int]:
        d = self._admin.describe_consumer_groups(
            [group_id], request_timeout=self._timeout
        )[group_id].result()
        state = str(d.state).rsplit(".", 1)[-1]
        return state, len(d.members)

    def committed_offsets(self, group_id: str) -> list[tuple[str, int, int]]:
        from confluent_kafka import ConsumerGroupTopicPartitions

        req = ConsumerGroupTopicPartitions(group_id)
        res = self._admin.list_consumer_group_offsets([req])[
            group_id
        ].result()
        return sorted(
            (tp.topic, int(tp.partition), int(tp.offset))
            for tp in res.topic_partitions
            if tp.offset is not None and tp.offset >= 0
        )

    def close(self) -> None:
        """Release the consumer's broker connections — a per-interval
        scheduler must close (or reuse) clients, or librdkafka keeps
        sockets/threads alive until process exit."""
        self._consumer.close()

    def __enter__(self) -> "ConfluentClusterClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def confluent_client(
    bootstrap_servers: str, **config
) -> "ConfluentClusterClient":
    """The live binding — requires confluent-kafka (absent from this
    container; import-guarded so the seam stays testable with fakes)."""
    try:
        from confluent_kafka.admin import AdminClient  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "confluent-kafka is not installed; use a ClusterClient "
            "implementation (see tests/test_collector.py for the shape)"
        ) from exc
    return ConfluentClusterClient(bootstrap_servers, **config)
