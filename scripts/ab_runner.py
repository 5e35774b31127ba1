"""Multi-pass timed run over an arbitrary checked-out tree — the r15
A/B instrument (bench_anchor_runner with a pass count, so warm numbers
exist for memo-backed queries). Alternate subprocess invocations of two
trees on the same host minute and compare per-pass columns; nothing
else on this host is comparable (r14 lesson: same-tree totals drift
±25-100% across hours).

Usage:
    python ab_runner.py <tree_path> <sf_dir> <queries_json> [passes=2]

Prints ONE JSON line:
    {"per_query": {name: [sec, ...]}, "setup_sec": s, "missing": [...],
     "load1": [per-pass 1-min load]}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir, queries_json = sys.argv[1], sys.argv[2], sys.argv[3]
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    wanted = json.loads(queries_json)
    sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.session import get_spark, warm_python_workers

    spark = get_spark("kafka-overwatch-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.spark_queries()

    t0 = time.time()
    warm_python_workers(spark)
    for df in registry.get_snaps(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    setup_sec = round(time.time() - t0, 3)

    missing = [n for n in wanted if n not in queries]
    per_query: dict[str, list[float]] = {n: [] for n in wanted if n not in missing}
    loads = []
    for _ in range(passes):
        loads.append(round(os.getloadavg()[0], 2))
        for name in per_query:
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            per_query[name].append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "per_query": per_query,
                "setup_sec": setup_sec,
                "missing": missing,
                "load1": loads,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
