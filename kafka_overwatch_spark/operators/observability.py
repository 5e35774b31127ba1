"""In-query observability — the reference's scan self-instrumentation
(Prometheus Summary timers at `processing/clusters.py:138-142`, per-
partition new-message Summaries at `overwatch_resources/topics.py:97-99`)
re-expressed Spark-natively with the Observation API.

The reference pays a separate pass per instrument (each Summary `observe`
walks the data again in Python). `df.observe` attaches aggregate metrics
to the SAME job that computes the query — the instrumentation rides the
existing scan at zero extra passes, which is the only acceptable cost at
100 TB (a second "count the rows" job over a petabyte scan is a real
bill). Metrics surface through `Observation.get` after any action and can
be pushed to the Prometheus sink (`sinks/prometheus.py`) as gauges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, metrics: dict[str, F.Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame; they materialize
    with whatever action the caller runs next (no extra job)."""
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def scan_health_metrics() -> dict[str, F.Column]:
    """The scan-health instrument set for `partition_offsets` — the
    counters the reference tracks per scan (row volume, topic fan-out)
    plus the data-quality counts a collector should alarm on (negative
    offsets = broken watermark fetch, end < start = corrupt sample)."""
    # count-like sums coalesce to 0 so an EMPTY scan (unreachable
    # cluster) reads "0 bad rows of 0", not null; max stays null over
    # empty input and the publish adapter skips it
    return {
        "rows": F.count(F.lit(1)),
        "topics": F.approx_count_distinct("topic"),
        "negative_offsets": F.coalesce(
            F.sum((F.col("end_offset") < 0).cast("long")), F.lit(0)
        ),
        "inverted_watermarks": F.coalesce(
            F.sum(
                (F.col("end_offset") < F.col("start_offset")).cast("long")
            ),
            F.lit(0),
        ),
        "max_end_offset": F.max("end_offset"),
    }


def observed_partition_offsets(
    snaps: dict[str, DataFrame], cluster: str = "primary"
) -> tuple[DataFrame, Observation]:
    """One cluster's `partition_offsets` with the scan-health
    instruments attached: run ANY downstream query off the returned
    frame and the metrics of the rows that actually flowed are available
    on the observation. The cluster filter sits BELOW the observe node
    (filters don't push past CollectMetrics), so the instruments count
    exactly the rows the label claims — the reference's gauges are
    likewise per-cluster (`monitoring/prometheus.py:7-75`)."""
    po = snaps["partition_offsets"].filter(F.col("cluster") == cluster)
    return observed(
        po, f"partition_offsets_scan_{cluster}", scan_health_metrics()
    )


def observation_metric_rows(obs: Observation, cluster: str) -> list[tuple]:
    """Observation results as rows in the metrics-frame long format
    (metric, cluster, group_id, topic, value) — plugs straight into the
    Prometheus sinks (`sinks/prometheus.render_exposition` /
    `push_to_gateway`), so scan-health instruments publish next to the
    reference's gauge families. Null metrics (e.g. max over an empty
    scan) are skipped — absence of a gauge, not a fabricated 0.

    Values are emitted as float (the Prometheus exposition format is
    float-typed): an int() cast here would silently truncate any future
    float-valued instrument (an avg or ratio gauge) added to
    `scan_health_metrics` — publishing a wrong gauge instead of failing."""
    return [
        (f"kafka_scan_{name}", cluster, None, None, float(v))
        for name, v in obs.get.items()
        if v is not None
    ]
