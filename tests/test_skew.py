"""Salted join produces exactly the plain join's rows and spreads the
hot key across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, snaps):
    from kafka_overwatch_spark.operators.skew import salted_join

    go = snaps["group_offsets"].select("group_id", "topic", "committed_offset")
    topics = snaps["topics"].select(F.col("name").alias("topic"), "partitions")
    plain = go.join(topics, "topic").select(
        "topic", "group_id", "committed_offset", "partitions"
    )
    salted = salted_join(go, topics, on=["topic"], salt=4).select(
        "topic", "group_id", "committed_offset", "partitions"
    )
    assert _canon(plain) == _canon(salted)


def test_salted_join_left(spark, snaps):
    from kafka_overwatch_spark.operators.skew import salted_join

    go = snaps["group_offsets"].select("group_id", "topic")
    topics = snaps["topics"].select(F.col("name").alias("topic"), "partitions")
    plain = go.join(topics, "topic", "left").select("topic", "group_id", "partitions")
    salted = salted_join(go, topics, on=["topic"], salt=4, how="left").select(
        "topic", "group_id", "partitions"
    )
    # ghost topics (no dim row) must survive the left join identically
    assert _canon(plain) == _canon(salted)
    assert any(r[2] is None for r in _canon(salted))


def test_salt_scatters_hot_key(spark, snaps):
    from kafka_overwatch_spark.operators.skew import salted_join

    # a degenerate all-one-key fact side
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([("hot", "v")], ["k", "attr"])
    out = salted_join(hot, dim, on=["k"], salt=8)
    assert out.count() == 1000
    # scatter actually used >1 salt value
    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.hash(F.col("k"), F.col("payload")), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts > 4
