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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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

    cols = [f.name for f in DECODED_SCHEMA.fields]

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
            if pdf.empty:
                yield pd.DataFrame(columns=cols)
                continue
            # one concatenated uint8 buffer for the whole Arrow batch —
            # header digits, byte sums, and lengths all come from
            # vectorized indexing; no per-row Python
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            # fail loudly on malformed payloads: flat-buffer indexing
            # below would otherwise read INTO THE NEXT payload's bytes
            # (silent garbage) or run off the end of the batch buffer
            if (lens < HEADER_LEN).any():
                bad = pdf["doc_id"].to_numpy()[lens < HEADER_LEN][:5]
                raise ValueError(
                    f"payload shorter than the {HEADER_LEN}-byte header "
                    f"for doc_ids {bad.tolist()}"
                )
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])

            def digits(off0: int, n: int = 4) -> np.ndarray:
                val = np.zeros(len(starts), dtype=np.int64)
                for k in range(n):
                    val = val * 10 + (
                        buf[starts + off0 + k].astype(np.int64) - ord("0")
                    )
                return val

            # body byte sums via prefix sums: sum[a, b) = P[b] - P[a]
            prefix = np.zeros(len(buf) + 1, dtype=np.int64)
            np.cumsum(buf, out=prefix[1:])
            body_start = starts + HEADER_LEN
            body_len = lens - HEADER_LEN
            body_sum = prefix[starts + lens] - prefix[body_start]
            mean_byte = np.where(
                body_len > 0, body_sum / np.maximum(body_len, 1), 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "media_type": pdf["media_type"].to_numpy(),
                    "width": digits(4),
                    "height": digits(8),
                    "n_bytes": lens,
                    "mean_byte": mean_byte,
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("entropy", DoubleType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over the decoded body bytes: a 16-bin byte
    histogram (L1-normalized) as the feature vector plus the byte-level
    Shannon entropy — the deterministic stand-in for a real
    image/audio embedding model (which would slot into the same
    Arrow-batched mapInPandas with the same output schema).

    Fully vectorized over the batch: one concatenated buffer,
    ``np.add.at`` scatter into per-doc histogram rows — no per-row
    Python beyond payload concatenation."""
    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=cols)
                continue
            bodies = [bytes(p)[HEADER_LEN:] for p in pdf["payload"]]
            blens = np.fromiter(
                (len(b) for b in bodies), dtype=np.int64, count=len(bodies)
            )
            buf = np.frombuffer(b"".join(bodies), dtype=np.uint8)
            doc_idx = np.repeat(np.arange(len(bodies)), blens)
            hist = np.zeros((len(bodies), FEATURE_DIM), dtype=np.float64)
            np.add.at(hist, (doc_idx, buf >> 4), 1.0)
            totals = np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
            norm = hist / totals
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = -np.where(norm > 0, norm * np.log2(norm), 0.0).sum(
                    axis=1
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "media_type": pdf["media_type"].to_numpy(),
                    "feature": [np.round(row, 6).tolist() for row in norm],
                    "entropy": np.round(ent, 6),
                }
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)


PHASH_SEGMENTS = 64
PHASH_MAX_HAMMING = 3


def media_phash(media: DataFrame) -> DataFrame:
    """64-bit positional average-hash (aHash) per media payload — the
    perceptual-fingerprint stage of media near-dup, over the
    deterministic fake decode (codecs are absent; a real deployment
    swaps the decoded-pixel source, the hash algebra is identical).

    Definition: the decoded body is split into PHASH_SEGMENTS
    consecutive segments ("pixels" = unicode code points of the decoded
    body, the stand-in for gray levels); bit s is set iff segment s's
    mean exceeds the global mean — the classic aHash bit rule. The
    comparison is cross-multiplied (``seg_sum·n > total·seg_len``) so
    the whole hash is integer-exact and bit-identical in the DuckDB
    oracle.

    Physical shape (r5): a pure NARROW map — segment s of the seg
    assignment ``(pos·SEG) div n`` is the CONTIGUOUS position range
    [⌈s·n/SEG⌉, ⌈(s+1)·n/SEG⌉), so per-segment sums are array
    ``slice`` + ``aggregate`` folds over the codepoint array, all
    inside one projection. The previous shape posexploded every
    codepoint (~chars-per-doc × docs rows) through a 32-way
    conditional aggregation — one large shuffle this version simply
    does not have (4.4 s → sub-second at sf0.1). Zero Python, zero
    exchanges; the identical integer algebra keeps the DuckDB oracle
    bit-for-bit."""
    seg = PHASH_SEGMENTS
    body = F.decode(
        F.expr("substring(payload, 13, 2147483647)"), "utf-8"
    )
    arr = (
        media.select("doc_id", body.alias("body"))
        .select(
            "doc_id",
            F.expr(
                "transform(filter(split(body, ''), c -> c <> ''), "
                "c -> ascii(c))"
            ).alias("cps"),
        )
        .select(
            "doc_id",
            "cps",
            F.size("cps").alias("n"),
            F.expr("aggregate(cps, 0L, (a, x) -> a + x)").alias("total"),
        )
    )
    bits = []
    for s in range(seg):
        start = f"(({s} * n + {seg - 1}) div {seg})"
        end = f"(({s + 1} * n + {seg - 1}) div {seg})"
        ss = (
            f"aggregate(slice(cps, {start} + 1, {end} - {start}), "
            "0L, (a, x) -> a + x)"
        )
        # shiftleft, not a 2**s literal: segment 63's weight is
        # Long.MIN_VALUE (64-bit hash, signed two's complement) and
        # 9223372036854775808L won't parse; the running sum of distinct
        # powers 0..62 plus one MIN_VALUE term stays in long range at
        # every fold step, so the + fold is ANSI-safe.
        bits.append(
            f"(CASE WHEN {ss} * n > total * ({end} - {start}) "
            f"THEN shiftleft(1L, {s}) ELSE 0L END)"
        )
    return arr.select(
        "doc_id", F.expr(" + ".join(bits)).cast("long").alias("phash")
    )


def media_phash_pairs(
    media: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Perceptual near-dup media pairs: hamming(phash) ≤ max_hamming via
    the shared pigeonhole chunk join (`dedup.hamming_neighbor_pairs`) —
    bucketed candidates, never all-pairs. Output: doc_a, doc_b,
    hamming. ``fps``: pre-built (ideally checkpointed) phash frame —
    without it the codepoint-fold hash executes once per side of the
    chunk self-join (no ReusedExchange)."""
    from .dedup import hamming_neighbor_pairs

    if fps is None:
        fps = media_phash(media)
    return hamming_neighbor_pairs(fps, "phash", max_hamming)


def sample_frames(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Frame-sampling fan-out for 'video' payloads: one output row per
    fixed-size byte window (UDTF-shaped mapInPandas — output cardinality
    > input cardinality, still shuffle-free)."""
    import hashlib

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=cols)
                continue
            # fan-out indexing computed vectorized: per-doc frame counts →
            # np.repeat/arange; only the md5 itself touches Python, once
            # per OUTPUT frame (stand-in for real per-frame codec work)
            bodies = [bytes(p)[HEADER_LEN:] for p in pdf["payload"]]
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            blens = np.fromiter(
                (len(b) for b in bodies), dtype=np.int64, count=len(bodies)
            )
            n_frames = np.maximum(
                (np.maximum(blens, 1) + frame_bytes - 1) // frame_bytes, 1
            )
            total = int(n_frames.sum())
            out_doc = np.repeat(doc_ids, n_frames)
            frame_id = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(n_frames)[:-1])), n_frames
            )
            offsets = frame_id * frame_bytes
            doc_idx = np.repeat(np.arange(len(bodies)), n_frames)
            checksums = [
                hashlib.md5(
                    bodies[d][o : o + frame_bytes]
                ).hexdigest()
                for d, o in zip(doc_idx, offsets)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_id": frame_id,
                    "frame_offset_bytes": offsets,
                    "frame_checksum": checksums,
                }
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        frames, FRAME_SCHEMA
    )


def resize_media(
    media: DataFrame, target_width: int = 32, target_height: int = 24
) -> DataFrame:
    """Resize plumbing: emit a new payload whose header carries the target
    dimensions, body downsampled by deterministic byte striding (the
    stand-in for a real bilinear resample — PIL is absent here; the
    Spark-side contract is what's real: binary in → binary out, new typed
    metadata, Arrow-batched, no shuffle).

    Body semantics of the fake: keep every k-th body byte where
    k = ceil(original_area / target_area), preserving determinism and
    giving tests a size relation to assert."""
    cols = ["doc_id", "media_type", "payload", "width", "height"]

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = f"IMG1{target_width:04d}{target_height:04d}".encode()
        target_area = target_width * target_height
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=cols)
                continue
            out_payloads = []
            for p in pdf["payload"]:
                b = bytes(p)
                w = int(b[4:8] or b"0")
                h = int(b[8:12] or b"0")
                body = b[HEADER_LEN:]
                k = max(1, -(-(w * h) // target_area))
                out_payloads.append(header + body[::k])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "media_type": pdf["media_type"].to_numpy(),
                    "payload": out_payloads,
                    "width": np.full(len(pdf), target_width, dtype=np.int64),
                    "height": np.full(len(pdf), target_height, dtype=np.int64),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )
    return media.mapInPandas(resize_batches, schema)


FRAME_PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def frame_phash(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Per-FRAME perceptual hash for 'video'-style payloads: the same
    64-segment positional aHash as `media_phash`, computed over each
    fixed-size byte window instead of the whole body — the primitive
    behind video segment matching (find shared/near-identical clips
    between different videos, at frame granularity). Arrow-batched
    numpy; the hash algebra is bit-identical to the document-level one
    (python-reference parity tested)."""
    seg = PHASH_SEGMENTS

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_doc, out_frame, out_hash = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[HEADER_LEN:]
                n_frames = max(
                    (max(len(body), 1) + frame_bytes - 1) // frame_bytes, 1
                )
                for f in range(n_frames):
                    window = body[f * frame_bytes : (f + 1) * frame_bytes]
                    cps = np.frombuffer(window, dtype=np.uint8).astype(
                        np.int64
                    )
                    h = 0
                    n = len(cps)
                    if n:
                        total = int(cps.sum())
                        for s_i in range(seg):
                            lo = (s_i * n + seg - 1) // seg
                            hi = ((s_i + 1) * n + seg - 1) // seg
                            ss = int(cps[lo:hi].sum())
                            if ss * n > total * (hi - lo):
                                h |= 1 << s_i
                        # signed two's-complement wrap: bit 63 set makes
                        # the unsigned reading exceed int64; the LongType
                        # column (and the SQL-side hash) is signed
                        if h >= 1 << 63:
                            h -= 1 << 64
                    out_doc.append(int(doc_id))
                    out_frame.append(f)
                    out_hash.append(h)
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_id": out_frame, "phash": out_hash}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        hashes, FRAME_PHASH_SCHEMA
    )


def frame_phash_pairs(
    media: DataFrame,
    frame_bytes: int = 256,
    max_hamming: int = PHASH_MAX_HAMMING,
) -> DataFrame:
    """Cross-VIDEO near-identical segment pairs: hamming-close frame
    hashes between different docs, through the same pigeonhole chunk
    join every fingerprint family here uses (bucketed candidates, never
    all-pairs). Output: doc_a, frame_a, doc_b, frame_b, hamming."""
    from .dedup import hamming_neighbor_pairs

    FRAME_BASE = 1_000_000
    keyed = frame_phash(media, frame_bytes).select(
        (F.col("doc_id") * FRAME_BASE + F.col("frame_id")).alias("doc_id"),
        "phash",
    )
    pairs = hamming_neighbor_pairs(keyed, "phash", max_hamming)
    return pairs.select(
        (F.col("doc_a") / FRAME_BASE).cast("long").alias("doc_a"),
        F.pmod(F.col("doc_a"), F.lit(FRAME_BASE)).cast("long").alias("frame_a"),
        (F.col("doc_b") / FRAME_BASE).cast("long").alias("doc_b"),
        F.pmod(F.col("doc_b"), F.lit(FRAME_BASE)).cast("long").alias("frame_b"),
        "hamming",
    ).filter(
        (F.col("doc_a") != F.col("doc_b"))
    )
