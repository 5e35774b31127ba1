"""gen1 → gen10 scale probe (VERDICT r11 next #8): extend the r11
one-decade probe to TWO decades — time the headline set, the iterative
graph family (components_star included), the r11 stats wave, and the two
r12-retuned dedup paths at 10x and 100x of the bench scale, and record
per-query wall ratios for the 10x step between them. Combined with
SCALE_PROBE_r11's gen0.1→gen1 decade this covers 1x→100x.

Data comes from scripts/gen_scaledata.py:
    python scripts/gen_scaledata.py                      # gen0.1 + gen1
    python scripts/gen_scaledata.py --tiers gen10:100    # the 100x tier

Writes SCALE_PROBE_r12.json at the repo root. Usage:

    python scripts/scale_probe_r12.py [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GRAPH_FAMILY = [
    "graph_pagerank",
    "graph_kcore_bounded",
    "graph_label_propagation",
    "graph_modularity",
    "graph_eigencentrality",
    "graph_components_bounded",
    "graph_components_star",
    "graph_degree_tail",
]

STATS_WAVE = [
    "events_kruskal_wallis",
    "events_welch_t",
    "events_markov_steady_state",
    "events_spearman",
    "events_ljung_box",
    "sampling_ht_estimate",
    "emb_knn_label_audit",
]

RETUNED_DEDUP = [
    "ann_neardup_frontier",
    "dedup_embedding_cosine",
    "dedup_containment",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_queries(spark, registry, sf_dir: str, names, passes: int):
    queries = registry.spark_queries()
    out: dict[str, float] = {}
    errors: dict[str, str] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(passes):
        for name in names:
            if name in errors:
                continue
            t0 = time.time()
            try:
                force(queries[name](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — record, keep going
                errors[name] = f"{type(exc).__name__}: {exc}"
                continue
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            print(f"  probe p{p} {name}: {dt}s", file=sys.stderr)
    for name, vals in samples.items():
        if vals:
            out[name] = min(vals[1:] if len(vals) >= 2 else vals)
    return out, errors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # the 100x tier's iterative-graph aggregates OOM the 8g default
    # heap (first run: pagerank UNABLE_TO_ACQUIRE_MEMORY at gen10 took
    # the whole JVM down); local[32] shares one heap across all 32
    # task slots, so size it like the 32-executor cluster it stands for
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")

    import bench  # HEADLINE list + host-load helpers
    from kafka_overwatch_spark import registry
    from kafka_overwatch_spark.session import get_spark, warm_python_workers

    spark = get_spark("kafka-overwatch-scale-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    names = bench.HEADLINE + GRAPH_FAMILY + STATS_WAVE + RETUNED_DEDUP
    names = list(dict.fromkeys(names))
    result: dict = {"passes": args.passes, "tiers": {}}
    for tier in ("gen1", "gen10"):
        sf_dir = str(REPO / "scaledata" / tier)
        print(f"== tier {tier} ({sf_dir})", file=sys.stderr)
        load = bench.settle_host()
        t0 = time.time()
        snaps = registry.get_snaps(spark, sf_dir)
        for df in snaps.values():
            force(df)
        setup = round(time.time() - t0, 3)
        timed, errors = time_queries(
            spark, registry, sf_dir, names, args.passes
        )
        result["tiers"][tier] = {
            "sf_dir": sf_dir,
            "setup_sec": setup,
            "queries": timed,
            "errors": errors,
            "host_load": load,
        }

    lo = result["tiers"]["gen1"]["queries"]
    hi = result["tiers"]["gen10"]["queries"]
    result["ratios_gen1_to_gen10"] = {
        n: round(hi[n] / lo[n], 2)
        for n in sorted(lo)
        if n in hi and lo[n] > 0
    }
    out = REPO / "SCALE_PROBE_r12.json"
    out.write_text(json.dumps(result, indent=1))
    print(
        json.dumps(
            {"written": str(out), "ratios": result["ratios_gen1_to_gen10"]}
        )
    )


if __name__ == "__main__":
    main()
