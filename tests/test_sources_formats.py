"""Source-format seam: the same table read from parquet, ORC, JSON lines,
and CSV (pinned schema) yields identical rows, and a registered query over
the non-parquet copy matches the DuckDB oracle over the parquet one."""

from __future__ import annotations

import tempfile

from tests.conftest import SF_DIR, compare_spark_duckdb, duckdb_con


def test_round_trip_all_formats_identical(spark):
    from kafka_overwatch_spark.sources.files import (
        infer_format,
        read_table,
        write_table,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = sorted(map(tuple, ev.collect()))
    with tempfile.TemporaryDirectory() as tmp:
        for fmt in ("parquet", "orc", "json", "csv"):
            path = f"{tmp}/events_{fmt}"
            write_table(ev, path, fmt)
            got = read_table(spark, path, ev.schema, fmt)
            assert got.schema == ev.schema, fmt
            assert sorted(map(tuple, got.collect())) == want, fmt
            # extension-free directory: format inferred from data files
            assert infer_format(path) == fmt


def test_query_over_csv_copy_matches_parquet_oracle(spark):
    """events_daily_rollup over a CSV copy of the events table matches
    the DuckDB oracle evaluated over the original parquet — the engine's
    queries are source-format-independent."""
    from kafka_overwatch_spark.operators.relational import events_daily_rollup
    from kafka_overwatch_spark.oracles_pipelines import pipeline_oracles
    from kafka_overwatch_spark.sources.files import read_table, write_table

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        write_table(ev, f"{tmp}/ev_csv", "csv")
        csv_ev = read_table(spark, f"{tmp}/ev_csv", ev.schema, "csv")
        con = duckdb_con(SF_DIR)
        try:
            compare_spark_duckdb(
                events_daily_rollup(csv_ev),
                con,
                pipeline_oracles()["events_daily_rollup"],
                "daily_rollup_from_csv",
            )
        finally:
            con.close()


def test_csv_round_trip_newlines_and_empty_strings(spark):
    """CSV fidelity corners: embedded newlines inside quoted fields
    (multiLine), empty string vs null (sentinel nullValue), and quotes/
    commas round-trip exactly; dotted directory names still infer."""
    from kafka_overwatch_spark.sources.files import (
        infer_format,
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [
            (0, "line one\nline two\nline three", "en"),
            (1, "", "es"),
            (2, 'quote " and, comma', "fr"),
            (3, None, "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    want = sorted(map(tuple, df.collect()))
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/docs.v2"  # dotted dir name
        write_table(df, path, "csv")
        assert infer_format(path) == "csv"
        got = read_table(spark, path, df.schema)
        assert sorted(map(tuple, got.collect())) == want


def test_kafka_reader_options_contract():
    """The Kafka source configuration (testable without the connector
    jar): backfill rate limiting, pattern subscription, and the
    metadata-collector retention tolerance are all present."""
    from kafka_overwatch_spark.streaming.offsets import kafka_reader_options

    opts = kafka_reader_options(
        "b1:9092,b2:9092", subscribe_pattern="^app\\..*$",
        max_offsets_per_trigger=5000,
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribePattern"] == "^app\\..*$"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["failOnDataLoss"] == "false"
    assert "subscribe" not in opts  # pattern mode, not fixed-list mode
    # unbounded variant omits the trigger cap entirely (Spark treats the
    # option's presence as the limit)
    assert "maxOffsetsPerTrigger" not in kafka_reader_options(
        "b:9092", max_offsets_per_trigger=None
    )


def test_kafka_record_stream_requires_connector(spark):
    """Environment-honest seam: with the spark-sql-kafka jar absent the
    reader must fail at plan time (loudly, not at runtime mid-stream);
    with it present this test exercises the real plan-only load."""
    import pytest

    from kafka_overwatch_spark.streaming.offsets import (
        kafka_record_stream,
        kafka_source_available,
    )

    if kafka_source_available(spark):
        stream = kafka_record_stream(spark, "localhost:9092")
        assert [f.name for f in stream.schema.fields] == [
            "topic", "partition_id", "offset", "ts",
        ]
    else:
        with pytest.raises(Exception, match="kafka|KAFKA|data source"):
            kafka_record_stream(spark, "localhost:9092")


def test_end_offsets_from_records_transform(spark):
    """The record→watermark transform (always testable — plain DataFrame
    code): end_offset is one past the max consumed offset, the observed
    floor is the min, one row per (topic, partition)."""
    from kafka_overwatch_spark.streaming.offsets import (
        end_offsets_from_records,
    )

    records = spark.createDataFrame(
        [
            ("t1", 0, 5, "2024-01-01 00:00:01"),
            ("t1", 0, 9, "2024-01-01 00:00:02"),
            ("t1", 1, 2, "2024-01-01 00:00:03"),
            ("t2", 0, 100, "2024-01-01 00:00:04"),
        ],
        "topic string, partition_id long, offset long, ts string",
    ).selectExpr("topic", "partition_id", "offset", "CAST(ts AS TIMESTAMP) AS ts")
    got = {
        (r["topic"], r["partition_id"]): (
            r["scan_id"], r["start_offset"], r["end_offset"]
        )
        for r in end_offsets_from_records(records, scan_id=7).collect()
    }
    assert got == {
        ("t1", 0): (7, 5, 10),
        ("t1", 1): (7, 2, 3),
        ("t2", 0): (7, 100, 101),
    }


def test_csv_quarantine_accounts_for_malformed_rows(spark):
    """PERMISSIVE + corrupt-record column: bad rows are counted and
    preserved verbatim; clean rows parse exactly; nothing becomes a
    silent NULL row."""
    import tempfile

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from kafka_overwatch_spark.sources.files import read_csv_with_quarantine

    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/data.csv", "w") as fh:
            fh.write("a,b\n1,2\nnot_a_number,3\n4,5\n6,junk,extra\n7,8\n")
        clean, quarantined, raw = read_csv_with_quarantine(
            spark, f"{tmp}/data.csv", schema
        )
        got = sorted((r.a, r.b) for r in clean.collect())
        assert got == [(1, 2), (4, 5), (7, 8)]
        bad = sorted(r.raw_line for r in quarantined.collect())
        assert bad == ["6,junk,extra", "not_a_number,3"]
        raw.unpersist()


def test_schema_evolution_merge_and_null_fill(spark):
    """Additive schema evolution on plain parquet: generation 2 adds a
    column; mergeSchema reads both generations as one table with the
    missing cells NULL — and WITHOUT mergeSchema the footer-sampled
    schema silently wins (documented trap, asserted both ways)."""
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("x"))
        v2 = spark.range(5, 8).select(
            F.col("id"), F.lit("b").alias("x"), F.lit(1.5).alias("score")
        )
        v1.write.parquet(f"{tmp}/t/gen=1")
        v2.write.parquet(f"{tmp}/t/gen=2")
        merged = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/t")
        assert set(merged.columns) >= {"id", "x", "score"}
        assert merged.count() == 8
        assert merged.filter(F.col("score").isNull()).count() == 5
        assert merged.filter(F.col("score") == 1.5).count() == 3
