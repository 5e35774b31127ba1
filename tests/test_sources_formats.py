"""Source-format seam: the same table read from parquet, JSON lines, and
CSV (pinned schema) yields identical rows, and a registered query over
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
        for fmt in ("parquet", "json", "csv"):
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
