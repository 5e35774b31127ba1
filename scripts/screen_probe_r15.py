"""GrowingContainmentScreen gen10 A/B body (VERDICT r14 next #7): one
timed subprocess pass of the screen from an arbitrary checked-out tree
against a PRE-SEEDED shared index (seed once, alternate trees — the
screen's dynamic-overwrite replay safety makes re-running batches 0..N
over the same index idempotent, so interleaved tree passes compare on
identical state).

Usage:
    python screen_probe_r15.py seed <sf_dir> <index_dir>       # once
    python screen_probe_r15.py run <tree> <sf_dir> <index_dir> [batches]

`run` prints ONE JSON line: {"per_batch": [sec,...], "load1": [...]}.
The r13/r14 protocol shape: 90% seed, 2.5% batches (doc_id % 40).
"""

from __future__ import annotations

import json
import os
import sys
import time

BATCHES = 4


def main() -> None:
    mode = sys.argv[1]
    if mode == "seed":
        sf_dir, index_dir = sys.argv[2], sys.argv[3]
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    else:
        tree, sf_dir, index_dir = sys.argv[2], sys.argv[3], sys.argv[4]
        sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.dedup import (
        choose_containment_k,
        shingle_docs,
    )
    from kafka_overwatch_spark.session import get_spark
    from kafka_overwatch_spark.streaming.documents_stream import (
        GrowingContainmentScreen,
        init_containment_index,
    )

    spark = get_spark("screen-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mod = F.col("doc_id") % 40
    if mode == "seed":
        seed = docs.filter(mod >= BATCHES)
        k = choose_containment_k(shingle_docs(seed), seed)
        t0 = time.time()
        init_containment_index(
            spark, shingle_docs(seed, k), index_dir, shingle_k=k
        )
        print(
            json.dumps({"k": k, "seed_sec": round(time.time() - t0, 3)})
        )
        spark.stop()
        return

    n_batches = int(sys.argv[5]) if len(sys.argv) > 5 else BATCHES
    screen = GrowingContainmentScreen(index_dir, f"{index_dir}/out")
    per_batch, loads = [], []
    for i in range(n_batches):
        batch = docs.filter(mod == i)
        loads.append(round(os.getloadavg()[0], 2))
        t0 = time.time()
        screen(batch, i)
        per_batch.append(round(time.time() - t0, 3))
        print(f"  b{i}: {per_batch[-1]}s", file=sys.stderr)
    print(json.dumps({"per_batch": per_batch, "load1": loads}))
    spark.stop()


if __name__ == "__main__":
    main()
