"""P11 ordering semantics (reference `overwatch_resources/groups.py:111-141`):

- a zero-message partition is skipped (``continue``) BEFORE the
  ``committed_offset < 0`` break is evaluated — so a fully-retained
  partition with no committed offset must NOT truncate the topic;
- a *measured* partition with ``committed_offset < 0`` breaks out of the
  whole topic (later partition ids unmeasured);
- a topic whose measured total lag is 0 is omitted from the lag dict
  (``if total_lag and partitions_lag``, groups.py:136-141).
"""

from __future__ import annotations

from kafka_overwatch_spark.operators.lag import lag_per_partition, lag_per_topic
from kafka_overwatch_spark.operators.usage import FINAL_SCAN


def _snaps(spark):
    po = spark.createDataFrame(
        [
            # pid 0: fully retained → zero messages
            ("c1", "t", 0, FINAL_SCAN, 100, 100),
            ("c1", "t", 1, FINAL_SCAN, 0, 10),
            ("c1", "t", 2, FINAL_SCAN, 0, 20),
            ("c1", "t", 3, FINAL_SCAN, 0, 30),
        ],
        "cluster string, topic string, partition_id long, scan_id long, "
        "start_offset long, end_offset long",
    )
    go = spark.createDataFrame(
        [
            # g1: unset offset on the ZERO-MESSAGE pid 0 → skip, not break;
            # unset offset on measured pid 2 → break (pid 3 unmeasured)
            ("c1", "g1", "t", 0, -1),
            ("c1", "g1", "t", 1, 5),
            ("c1", "g1", "t", 2, -1),
            ("c1", "g1", "t", 3, 0),
            # g2: fully caught up → total_lag 0 → topic omitted
            ("c1", "g2", "t", 1, 10),
            ("c1", "g2", "t", 2, 20),
            ("c1", "g2", "t", 3, 30),
        ],
        "cluster string, group_id string, topic string, partition_id long, "
        "committed_offset long",
    )
    return {"partition_offsets": po, "group_offsets": go}


def test_zero_message_unset_offset_skips_not_breaks(spark):
    rows = {
        (r.group_id, r.partition_id): r.lag
        for r in lag_per_partition(_snaps(spark)).collect()
    }
    # g1: pid 1 measured (lag 5); pid 0 skipped silently; pid 2 breaks so
    # pid 3 never measured
    assert (("g1", 1)) in rows and rows[("g1", 1)] == 5
    assert ("g1", 0) not in rows
    assert ("g1", 3) not in rows
    # g2 rows all measured at per-partition grain (lag 0 each)
    assert rows[("g2", 1)] == 0 and rows[("g2", 2)] == 0


def test_zero_total_lag_topic_omitted(spark):
    per_topic = lag_per_topic(_snaps(spark)).collect()
    by_group = {r.group_id: r for r in per_topic}
    assert "g2" not in by_group  # total_lag == 0 → omitted
    assert by_group["g1"].total_lag == 5
    assert by_group["g1"].partitions_measured == 1


def test_lag_nested_shape_matches_flat_rows(spark):
    """The A11 nested shape (array<struct<partition_id, lag>> + total)
    agrees element-for-element with the flat per-partition rows it
    aggregates — the raw nested variant is library-only (its registered
    surface is the to_json companion), so this is its direct gate."""
    from kafka_overwatch_spark.operators.lag import lag_nested

    snaps = _snaps(spark)
    flat: dict = {}
    for r in lag_per_partition(snaps).collect():
        flat.setdefault((r.group_id, r.topic), []).append(
            (r.partition_id, r.lag)
        )
    nested = lag_nested(snaps).collect()
    got = {
        (r.group_id, r.topic): (
            r.total_lag,
            sorted((p.partition_id, p.lag) for p in r.partition_lags),
        )
        for r in nested
    }
    # zero-total topics omitted, like the reference's lag dict
    want_keys = {
        k for k, v in flat.items() if sum(lag for _, lag in v) != 0
    }
    assert set(got) == want_keys
    for k in want_keys:
        total, pairs = got[k]
        assert pairs == sorted(flat[k])
        assert total == sum(lag for _, lag in flat[k])
