"""CLI — the engine's service surface, mirroring the reference's entry
points (`kafka-overwatch -c config.yaml`, `schema-registry-restore`;
SURVEY §3.1/§3.3) in batch-over-snapshot form.

    python -m kafka_overwatch_spark report --sf-dir DIR --out report.json
    python -m kafka_overwatch_spark query --name topics_df --sf-dir DIR
    python -m kafka_overwatch_spark export --name groups_df --fmt csv --out DIR
    python -m kafka_overwatch_spark restore-script --sf-dir DIR --out restore.sh
    python -m kafka_overwatch_spark sr-backup --sf-dir DIR --out DIR
    python -m kafka_overwatch_spark curate-corpus --sf-dir DIR --out DIR
    python -m kafka_overwatch_spark list
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _spark():
    from .session import get_spark

    spark = get_spark("kafka-overwatch-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="kafka_overwatch_spark")
    parser.add_argument("--config", help="YAML config (analytic subset)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_report = sub.add_parser("report", help="cluster usage report JSON (K1)")
    p_report.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_report.add_argument("--out", default="-")
    p_report.add_argument("--cluster", default="primary")

    p_query = sub.add_parser("query", help="run one registered query")
    p_query.add_argument("--name", required=True)
    p_query.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_query.add_argument("--limit", type=int, default=20)

    p_export = sub.add_parser("export", help="CSV/JSON export of a query (K3)")
    p_export.add_argument("--name", required=True)
    p_export.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_export.add_argument("--fmt", choices=["csv", "json"], default="csv")
    p_export.add_argument("--out", required=True)

    p_restore = sub.add_parser("restore-script", help="topic restore script (K6)")
    p_restore.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_restore.add_argument("--out", required=True)
    p_restore.add_argument("--cluster", default="primary")

    p_srb = sub.add_parser("sr-backup", help="schema-registry backup tar (K7)")
    p_srb.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_srb.add_argument("--out", required=True)

    p_val = sub.add_parser(
        "validate", help="run the data-quality validation suite"
    )
    p_val.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_val.add_argument(
        "--strict", action="store_true",
        help="exit 1 if any check fails",
    )

    p_card = sub.add_parser(
        "dataset-card", help="one-row corpus dataset card"
    )
    p_card.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    p_cur = sub.add_parser(
        "curate-corpus",
        help="end-to-end corpus curation: quality gate -> exact dedup "
        "-> fuzzy dedup; writes corpus/ rejected/ card.json "
        "manifest.json",
    )
    p_cur.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_cur.add_argument("--out", required=True)
    p_cur.add_argument("--quality-threshold", type=float, default=None)

    p_explain = sub.add_parser(
        "explain", help="print a registered query's physical plan"
    )
    p_explain.add_argument("--name", required=True)
    p_explain.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_explain.add_argument(
        "--mode",
        choices=["simple", "extended", "formatted", "cost"],
        default="formatted",
    )

    sub.add_parser("list", help="list registered queries")

    args = parser.parse_args(argv)

    from . import registry

    if args.cmd == "list":
        names = sorted(registry.spark_queries())
        oracles = registry.oracle_sql()
        for name in names:
            marker = "oracle" if name in oracles else "rows-only"
            print(f"{name}  [{marker}]")
        return 0

    config = None
    if args.config:
        from .config import load_config

        config = load_config(args.config)

    spark = _spark()
    try:
        if args.cmd == "report":
            from .operators.report import report_json

            # one report per cluster (`overwatch.py:92-120`): the snapshot
            # frames are pruned to the requested cluster, not relabeled
            snaps = registry.get_cluster_snaps(
                spark, args.sf_dir, args.cluster
            )
            # fail with a clear message instead of a downstream
            # ValidationError: an unknown/empty cluster produces 0/0
            # percentages that serialize as null and flunk the schema
            if snaps["topics"].limit(1).count() == 0:
                print(
                    f"no topics found for cluster '{args.cluster}' — "
                    "unknown cluster name or empty snapshot",
                    file=sys.stderr,
                )
                return 2
            gov_cfg = None
            if config and args.cluster in config:
                gov_cfg = config[args.cluster].governance
            payload = report_json(
                snaps, cluster_name=args.cluster, governance_config=gov_cfg
            )
            # contract gate before emit, like the reference's jsonschema
            # validation of every report (`specs/report.py:130-143`)
            from .specs import validate_report

            validate_report(payload)
            if args.out == "-":
                print(payload)
            else:
                with open(args.out, "w") as fh:
                    fh.write(payload)
                print(f"wrote {args.out}", file=sys.stderr)
        elif args.cmd == "query":
            queries = registry.spark_queries()
            if args.name not in queries:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            queries[args.name](spark, args.sf_dir).show(
                args.limit, truncate=False
            )
        elif args.cmd == "explain":
            queries = registry.spark_queries()
            if args.name not in queries:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            queries[args.name](spark, args.sf_dir).explain(mode=args.mode)
        elif args.cmd == "validate":
            from .operators.validation import validation_report

            rows = validation_report(
                registry.get_raw_tables(spark, args.sf_dir),
                registry.get_snaps(spark, args.sf_dir),
            ).collect()
            failed = 0
            for r in rows:
                status = "PASS" if r["pass"] else "FAIL"
                failed += 0 if r["pass"] else 1
                print(
                    f"{status}  {r['check']:16s} {r['target']:45s} "
                    f"violations={r['violations']}/{r['checked']}"
                )
            print(f"{len(rows) - failed}/{len(rows)} checks passed")
            if args.strict and failed:
                return 1
        elif args.cmd == "dataset-card":
            from .pipelines.curation import dataset_card

            row = dataset_card(
                registry.get_raw_tables(spark, args.sf_dir)["documents"]
            ).collect()[0]
            for k, v in row.asDict().items():
                print(f"{k}: {v}")
        elif args.cmd == "curate-corpus":
            import os

            from .pipelines.curation import (
                QUALITY_THRESHOLD,
                curate_corpus_artifacts,
            )

            os.makedirs(args.out, exist_ok=True)
            manifest = curate_corpus_artifacts(
                registry.get_raw_tables(spark, args.sf_dir)["documents"],
                args.out,
                quality_threshold=(
                    args.quality_threshold
                    if args.quality_threshold is not None
                    else QUALITY_THRESHOLD
                ),
            )
            for k in sorted(manifest):
                print(f"{k}: {manifest[k]}")
            print(f"wrote {args.out}", file=sys.stderr)
        elif args.cmd == "export":
            from .sinks.exports import export_dataframe

            queries = registry.spark_queries()
            if args.name not in queries:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            export_dataframe(
                queries[args.name](spark, args.sf_dir),
                args.out,
                fmt=args.fmt,
                single_file=True,
            )
            print(f"wrote {args.out}", file=sys.stderr)
        elif args.cmd == "restore-script":
            from .sinks.exports import write_restore_script

            snaps = registry.get_cluster_snaps(
                spark, args.sf_dir, args.cluster
            )
            write_restore_script(snaps, args.out)
            print(f"wrote {args.out}", file=sys.stderr)
        elif args.cmd == "sr-backup":
            from .operators.schema_registry import backup_index
            from .sinks.sr_backup import write_backup

            snaps = registry.get_snaps(spark, args.sf_dir)
            tar_path = write_backup(backup_index(snaps), args.out)
            print(f"wrote {tar_path}", file=sys.stderr)
    finally:
        spark.stop()
    # config currently parameterizes governance in library use; CLI accepts
    # and validates it so service wiring is config-compatible
    _ = config
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
