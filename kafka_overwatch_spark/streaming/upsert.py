"""Streaming CDC dimension maintenance: a change feed upserted into a
versioned parquet dimension table per micro-batch.

This is the streaming deployment of ``relational.scd1_upsert`` (MERGE
semantics: latest update wins wholesale) on top of the generational
commit protocol (streaming/state.py): the maintained table is always
readable at its last committed generation, crashes land recoverable,
and replaying a batch is IDEMPOTENT because applying the same update
set to a dimension that already carries it is a no-op.

At 100 TB this is how the topics / consumer-group dims stay current
without rescanning history: each scan interval's collector output is a
bounded change set; the upsert is one keyed join against the dim (both
sides bucketable on the key — see sinks/layout.py), and the dim stays a
single coherent parquet artifact every downstream broadcast join reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.relational import scd1_upsert
from .state import GenerationalState


class Scd1DimensionMaintainer(GenerationalState):
    """foreachBatch handler: dedup the batch to the LATEST row per key
    (``order_col`` descending — a change feed can carry several updates
    for one key in one batch), MERGE into the committed dimension, and
    commit the result as the next generation."""

    def __init__(
        self, state_dir: str, keys: list[str], order_col: str
    ) -> None:
        super().__init__(state_dir)
        self.keys = keys
        self.order_col = order_col

    def latest_per_key(self, batch_df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.order_col).desc()
        )
        return (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        updates = self.latest_per_key(batch_df)
        target = self.read_current(spark)
        merged = (
            updates
            if target is None
            else scd1_upsert(target, updates, self.keys)
        )
        self.commit(spark, merged.localCheckpoint(eager=True), batch_id)


def run_scd1_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
) -> None:
    """Drain a change-feed directory (one file per trigger) through the
    maintainer with availableNow — the file-source stand-in for the
    Kafka config-changes topic."""
    maintainer = Scd1DimensionMaintainer(state_dir, keys, order_col)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .writeStream.foreachBatch(maintainer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("scd1 stream did not drain within 300s")
