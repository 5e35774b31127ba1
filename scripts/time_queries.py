#!/usr/bin/env python
"""Time named registered queries with the bench methodology (noop
sink, shared warm session, labeled jobs) — the in-session A/B
instrument for the optimization rounds.

Usage: python scripts/time_queries.py <passes> <name> [name ...]

Prints one line per (pass, query) to stderr and a final JSON object
{name: [sec, ...]} to stdout. Setup (snapshot materialization) runs
once, untimed, exactly as bench.py does.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    passes = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.session import get_spark, warm_python_workers

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.spark_queries()

    warm_python_workers(spark)
    snaps = registry.get_snaps(spark, sf_dir)
    for df in snaps.values():
        df.write.format("noop").mode("overwrite").save()
    registry.get_topics_df(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {n: [] for n in names}
    for pass_no in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"time p{pass_no} {name}")
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            out[name].append(dt)
            print(f"  p{pass_no} {name}: {dt}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
