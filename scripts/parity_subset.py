#!/usr/bin/env python
"""Run a SUBSET of registered queries against the DuckDB oracle — the
per-change parity instrument for the optimization rounds (the full
test_parity_all sweep is ~25 min; a touched-query check should be
seconds).

Usage: python scripts/parity_subset.py <sf_dir> <name> [name ...]
       python scripts/parity_subset.py <sf_dir> --all-matching <substr>

Exits nonzero on the first mismatch with the standard parity diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    if sys.argv[2] == "--all-matching":
        substr = sys.argv[3]
        names = None
    else:
        names = sys.argv[2:]
        substr = None

    from tests.conftest import compare_spark_duckdb, duckdb_con

    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.session import get_spark

    spark = get_spark("parity-subset", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)
    sq = registry.spark_queries()
    oq = registry.oracle_sql()
    if names is None:
        names = sorted(n for n in oq if substr in n)
    failures = []
    for qname in names:
        if qname not in oq:
            print(f"  {qname}: NO ORACLE (rows-only query) — skipped")
            continue
        try:
            compare_spark_duckdb(sq[qname](spark, sf_dir), con, oq[qname], qname)
            print(f"  {qname}: OK")
        except AssertionError as exc:
            failures.append(f"{qname}: {exc}")
            print(f"  {qname}: FAIL")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{qname}: ERROR {type(exc).__name__}: {exc}")
            print(f"  {qname}: ERROR")
    spark.stop()
    if failures:
        print("\n".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
