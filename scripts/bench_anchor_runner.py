"""One timed bench pass over an arbitrary checked-out tree — the
self-anchoring bench's subprocess body (VERDICT r13 next #5: same-tree
drift measured ±25% across hours, so every BENCH_rN carries interleaved
passes of the PREVIOUS round's HEAD as its own anchor; only
alternating pairs on the same host are comparable).

Usage:
    python bench_anchor_runner.py <tree_path> <sf_dir> <queries_json>

Prints ONE JSON line: {"per_query": {name: sec}, "setup_sec": s,
"missing": [...]} — queries the target tree does not register are
skipped and reported, so the caller compares on the common set.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir, queries_json = sys.argv[1], sys.argv[2], sys.argv[3]
    wanted = json.loads(queries_json)
    sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.session import get_spark, warm_python_workers

    spark = get_spark("kafka-overwatch-bench-anchor")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.spark_queries()

    t0 = time.time()
    warm_python_workers(spark)
    for df in registry.get_snaps(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    registry.get_topics_df(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    setup_sec = round(time.time() - t0, 3)

    per_query: dict[str, float] = {}
    missing = [n for n in wanted if n not in queries]
    for name in wanted:
        if name in missing:
            continue
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        per_query[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "per_query": per_query,
                "setup_sec": setup_sec,
                "missing": missing,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
