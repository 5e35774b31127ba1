"""Multi-format file sources — the source-format seam (SURVEY §2.1).

The engine's tables are format-agnostic DataFrames: the snapshot
derivation and every registered query run identically whether the
underlying rows arrive as parquet (the testdata default), JSON lines, or
CSV. What differs per format is only schema fidelity:

- parquet: self-describing, nanosecond timestamps (the engine reads it
  with an explicit schema anyway for stability).
- json: schema MUST be pinned (inference downgrades longs/doubles
  inconsistently and is a full extra pass at scale).
- csv: schema MUST be pinned AND timestamps round-trip through ISO
  strings; `timestampFormat` below matches `df.write.csv`'s default
  serialization.
- orc: the other columnar format (built into Spark, no extra package) —
  self-describing like parquet, native timestamp types, same
  per-stripe split parallelism; the schema is still pinned on read for
  cross-format stability.

At 100 TB the rule is: columnar in (parquet/ORC) for analytics, row
formats only at the ingest edge — JSON/CSV readers here exist for edge
feeds and interop, and both parallelize per-file/per-split exactly like
the parquet scan (no single-reader bottleneck).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".orc": "orc",
}

# NTZ timestamps serialize via timestampNTZFormat (timestampFormat only
# governs the zoned type) — set BOTH, at full microsecond precision, or
# round-trips silently truncate to milliseconds.
CSV_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def infer_format(path: str) -> str:
    """Format by extension of the path, or of the data files inside a
    directory written by `df.write`. Directories are listed whenever the
    path IS a directory — a dotted directory name (``events.v2``,
    ``sf0.1``) is not an extension."""
    base = path.rstrip("/")
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            e = os.path.splitext(name)[1]
            if e in _EXT_FORMAT:
                return _EXT_FORMAT[e]
    ext = os.path.splitext(base)[1]
    if ext not in _EXT_FORMAT:
        raise ValueError(f"cannot infer source format of {path!r}")
    return _EXT_FORMAT[ext]


def read_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str | None = None,
) -> DataFrame:
    """Read a table from any supported format with a PINNED schema —
    schema inference is disallowed by design (silent type drift between
    formats is how cross-format pipelines rot)."""
    fmt = fmt or infer_format(path)
    reader = spark.read.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "json":
        return _ts_opts(reader).json(path)
    if fmt == "csv":
        return _ts_opts(_csv_opts(reader)).csv(path)
    raise ValueError(f"unsupported format {fmt!r}")


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Symmetric writer (used by tests to prove the round trip; the
    timestamp format mirrors read_table's)."""
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "json":
        _ts_opts(writer).json(path)
    elif fmt == "csv":
        _ts_opts(_csv_opts(writer)).csv(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def _ts_opts(rw):
    """Apply the microsecond timestamp format to a reader/writer for
    both the zoned and NTZ timestamp types."""
    return rw.option("timestampFormat", CSV_TS_FORMAT).option(
        "timestampNTZFormat", CSV_TS_FORMAT
    )


def _csv_opts(rw):
    """CSV fidelity options, symmetric on both sides:

    - multiLine: quoted fields with embedded newlines (document text)
      parse as ONE row. Caveat at scale: multiLine forces whole-file
      reads (no intra-file split parallelism) — another reason CSV
      stays at the ingest edge.
    - escape '"': RFC-4180 doubled-quote escaping on both sides.
    - nullValue '\\N': nulls serialize as an explicit sentinel so the
      reader can tell them from empty strings (default read collapses
      BOTH to null) — null-vs-empty round-trips exactly.
    """
    return (
        rw.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("nullValue", "\\N")
    )


def read_csv_with_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PERMISSIVE CSV ingest with explicit malformed-row accounting:
    rows that fail the pinned schema land in a quarantine frame (raw
    line preserved via columnNameOfCorruptRecord) instead of becoming
    silent NULLs — the ingest-edge contract a 100 TB pipeline needs
    (count the damage, keep the line, never guess). Returns
    (clean, quarantined, raw); the caller decides whether the
    quarantine rate fails the batch (cf. operators/validation.py) and
    OWNS the cache — call ``raw.unpersist()`` once both frames are
    materialized, or the parsed batch stays pinned for the session.

    NB Spark requires the corrupt-record column to be *selected* for it
    to be populated, and caches the parsed batch so the two frames are
    consistent views of one read."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    aug = StructType(schema.fields + [StructField("_corrupt", StringType())])
    raw = (
        _ts_opts(_csv_opts(spark.read.schema(aug)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .cache()
    )
    clean = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    quarantined = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return clean, quarantined, raw
