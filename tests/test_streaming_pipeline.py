"""End-to-end medallion chain: streamed bronze→silver→gold must equal
the batch composition (dedup, then native session aggregate) for every
session the final watermark can close — and re-running the drained
chain must be a no-op (file-sink commit log idempotence)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kafka_overwatch_spark.operators.relational import (
    events_session_window_native,
)
from kafka_overwatch_spark.streaming.pipeline import run_medallion
from tests.test_events_stream import _split_events


def test_medallion_chain_matches_batch_composition(spark, snaps):
    with tempfile.TemporaryDirectory() as tmp:
        ev = _split_events(spark, tmp, duplicate_last=True)
        dirs = run_medallion(spark, f"{tmp}/in", f"{tmp}/tiers")

        # silver: exact dedup (the duplicated last file vanishes)
        silver = spark.read.parquet(dirs["silver"])
        assert silver.count() == ev.count()
        assert silver.select("event_id").distinct().count() == ev.count()

        # gold: sessions == batch native sessions over the deduped feed,
        # minus at most those still open at the final watermark
        gold = {
            (r.user_id, r.session_start_sec): (
                r.session_end_sec, r.events, r.total_value,
            )
            for r in spark.read.parquet(dirs["gold"]).collect()
        }
        want = {
            (r.user_id, r.session_start_sec): (
                r.session_end_sec, r.events, r.total_value,
            )
            for r in events_session_window_native(ev).collect()
        }
        assert gold, "gold tier is empty"
        for k, v in gold.items():
            assert want.get(k) == v, f"session {k}: gold {v} != batch {want.get(k)}"
        missing = set(want) - set(gold)
        if missing:
            horizon = (
                ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0] - 86400
            )
            assert all(want[k][0] >= horizon - 1 for k in missing), missing

        # idempotence: a second drain with the same checkpoints must not
        # change either tier
        n_silver, n_gold = silver.count(), len(gold)
        run_medallion(spark, f"{tmp}/in", f"{tmp}/tiers")
        assert spark.read.parquet(dirs["silver"]).count() == n_silver
        assert spark.read.parquet(dirs["gold"]).count() == n_gold
