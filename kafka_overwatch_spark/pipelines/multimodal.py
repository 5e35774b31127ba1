"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north star).

What is REAL here (and tested): the Spark-side plumbing — binary-column
schema, JVM-side header parsing, Arrow-batched ``mapInPandas`` decode with
correct batch shapes, and frame-sampling fan-out. What is STUBBED: the
actual codec work (PIL/ffmpeg are not in this container) — ``decode_media``
computes a deterministic fake "decode" from the payload bytes, and the
real-codec branch raises NotImplementedError behind an import guard.

Scale: payloads stay opaque binary end-to-end (no JVM→Python transfer
except in the decode stage, which is Arrow-batched); metadata extraction
is pure JVM substring/conv; the decode stage is a narrow ``mapInPandas``
— partition-parallel, no shuffle, memory bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HEADER_LEN = 12  # b"IMG1" + 4-digit width + 4-digit height

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("frame_offset_bytes", LongType()),
        StructField("frame_checksum", StringType()),
    ]
)


def synth_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic fake media: payload = 12-byte header (magic + WxH
    derived from n_chars) + utf-8 body. Stands in for real image bytes so
    the plumbing is exercised end-to-end."""
    width = (F.col("n_chars") % 64 + 16).cast("int")
    height = (F.col("n_chars") % 48 + 16).cast("int")
    header = F.format_string("IMG1%04d%04d", width, height)
    media_type = F.when(F.col("doc_id") % 3 == 0, "image").when(
        F.col("doc_id") % 3 == 1, "audio"
    ).otherwise("video")
    return documents.select(
        "doc_id",
        media_type.alias("media_type"),
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("payload"),
        F.struct(
            width.cast("long").alias("width"),
            height.cast("long").alias("height"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_header_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata extraction — no Python: parse the fixed-width
    header out of the binary payload with substring/decode/cast."""
    head = F.decode(F.substring(F.col("payload"), 1, HEADER_LEN), "utf-8")
    return media.select(
        "doc_id",
        "media_type",
        F.substring(head, 1, 4).alias("magic"),
        F.substring(head, 5, 4).cast("long").alias("width"),
        F.substring(head, 9, 4).cast("long").alias("height"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


def decode_media(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Arrow-batched decode via mapInPandas. The deterministic fake decode
    computes byte statistics; the real-codec branch is the documented stub."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codecs:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:  # pragma: no cover
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg, not present "
                    "in this environment; use use_real_codecs=False"
                ) from exc
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                head = payload[:HEADER_LEN].decode("utf-8", "replace")
                body = payload[HEADER_LEN:]
                rows.append(
                    {
                        "doc_id": int(row["doc_id"]),
                        "media_type": row["media_type"],
                        "width": int(head[4:8]),
                        "height": int(head[8:12]),
                        "n_bytes": len(payload),
                        "mean_byte": (sum(body) / len(body)) if body else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Frame-sampling fan-out for 'video' payloads: one output row per
    fixed-size byte window (UDTF-shaped mapInPandas — output cardinality
    > input cardinality, still shuffle-free)."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])[HEADER_LEN:]
                for i in range(0, max(len(payload), 1), frame_bytes):
                    chunk = payload[i : i + frame_bytes]
                    rows.append(
                        {
                            "doc_id": int(row["doc_id"]),
                            "frame_id": i // frame_bytes,
                            "frame_offset_bytes": i,
                            "frame_checksum": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        frames, FRAME_SCHEMA
    )
