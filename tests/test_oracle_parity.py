"""Mimic the driver's t2 gate locally: run every registered query on Spark
AND its DuckDB oracle at sf0.001 and compare rows/columns/values.

Single test that loops (one Spark session, one DuckDB connection, all
queries) — a parametrized version pays ~10 s of Spark job setup per query.
"""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_spark_duckdb


def test_every_oracle_has_a_query():
    from kafka_overwatch_spark import registry

    sq = registry.spark_queries()
    oq = registry.oracle_sql()
    missing = set(oq) - set(sq)
    assert not missing, f"oracles without spark queries: {missing}"


def test_parity_all(spark, oracle):
    from kafka_overwatch_spark import registry

    sq = registry.spark_queries()
    oq = registry.oracle_sql()
    failures = []
    for qname in sorted(oq):
        try:
            sdf = sq[qname](spark, SF_DIR)
            compare_spark_duckdb(sdf, oracle, oq[qname], qname)
        except AssertionError as exc:
            failures.append(f"{qname}: {exc}")
        except Exception as exc:  # noqa: BLE001 — collect engine errors too
            failures.append(f"{qname}: ERROR {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


def test_promoted_names_all_resolve():
    """_driver_check_order silently drops unknown names — a typo in
    _PROMOTED would silently eject a query from the driver window, so
    pin that every promoted name is registered."""
    from kafka_overwatch_spark import registry

    q = registry.spark_queries()
    missing = [n for n in registry._PROMOTED if n not in q]
    assert not missing, missing
    assert len(set(registry._PROMOTED)) == len(registry._PROMOTED)
