"""Cross-engine probes for the macro layer in dialect.py — these are the
assumptions the whole oracle-parity strategy rests on."""

from __future__ import annotations

import duckdb

from kafka_overwatch_spark.dialect import DUCKDB, SPARK, render


def test_secdiff_renders():
    sql = "SELECT @SECDIFF(a, b) AS d FROM t"
    assert "unix_timestamp(a) - unix_timestamp(b)" in render(sql, SPARK)
    assert "date_diff('second', b, a)" in render(sql, DUCKDB)


def test_hash64_renders_balanced():
    sql = "SELECT @HASH64(concat(x, ':', y)) AS h FROM t"
    s = render(sql, SPARK)
    d = render(sql, DUCKDB)
    assert "conv(substring(md5(concat(x, ':', y)),1,15),16,10)" in s
    assert "concat('0x', substr(md5(concat(x, ':', y)),1,15))" in d


def test_hash64_cross_engine_value(spark):
    expr = "@HASH64('abc')"
    srow = spark.sql(f"SELECT {render(expr, SPARK)} AS v").collect()[0]["v"]
    drow = duckdb.sql(f"SELECT {render(expr, DUCKDB)} AS v").fetchone()[0]
    assert srow == drow == 648541476951500027


def test_secdiff_cross_engine_value(spark):
    expr = (
        "@SECDIFF(TIMESTAMP '2024-01-02 00:00:01.9', "
        "TIMESTAMP '2024-01-01 00:00:00.1')"
    )
    srow = spark.sql(f"SELECT {render(expr, SPARK)} AS v").collect()[0]["v"]
    drow = duckdb.sql(f"SELECT {render(expr, DUCKDB)} AS v").fetchone()[0]
    assert srow == drow == 86401
