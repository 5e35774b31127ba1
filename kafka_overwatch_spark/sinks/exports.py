"""Sinks (SURVEY §2.2): report JSON (K1), DataFrame CSV/JSON exports (K3),
topic restore script (K6), SR backup manifest (K7).

The reference writes single local files via pandas
(`reporting/tools.py:16-61`); at scale the engine writes partitioned
directories via ``df.write`` (works unchanged against ``s3a://`` — K2).
``single_file=True`` coalesces to 1 task for byte-stable small exports,
which is only sane for dim-sized frames — never the fact table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_dataframe(
    df: DataFrame, path: str, fmt: str = "csv", single_file: bool = False
) -> None:
    """K3 (`reporting/tools.py:38-61`): CSV or JSON export."""
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def restore_commands(snaps: dict[str, DataFrame]) -> DataFrame:
    """K6 (`overwatch_resources/clusters.py:253-278`; per-topic command at
    `overwatch_resources/topics.py:174-191`): a ``kafka-topics.sh --create``
    command per topic, carrying only non-default configs. Pure string
    building over the topics dim — concat/CASE, no UDF."""
    t = snaps["topics"]
    return t.select(
        "name",
        F.concat(
            F.lit("kafka-topics.sh --create --topic "),
            F.col("name"),
            F.lit(" --partitions "),
            F.col("partitions").cast("string"),
            F.lit(" --replication-factor 3"),
            F.when(
                F.col("retention_ms").isNotNull(),
                F.concat(
                    F.lit(" --config retention.ms="),
                    F.col("retention_ms").cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("cleanup_policy").isNotNull(),
                F.concat(
                    F.lit(" --config cleanup.policy="), F.col("cleanup_policy")
                ),
            ).otherwise(F.lit("")),
        ).alias("command"),
    )


def write_restore_script(snaps: dict[str, DataFrame], path: str) -> None:
    """Emit the restore script as one executable file (driver-side join of
    dim-sized output, like the reference's local file write)."""
    rows = restore_commands(snaps).orderBy("name").collect()
    with open(path, "w") as fh:
        fh.write("#!/usr/bin/env bash\nset -euo pipefail\n\n")
        for row in rows:
            fh.write(row["command"] + "\n")


def report_to_json(report_row: dict, path: str | None = None) -> str:
    """K1 (`overwatch_resources/clusters.py:280-300`): serialize the nested
    report struct with indent=2, optionally to a local file."""
    payload = json.dumps(report_row, indent=2, default=str)
    if path:
        with open(path, "w") as fh:
            fh.write(payload)
    return payload
