"""Multimodal plumbing: binary payload schema, JVM header parsing, Arrow
mapInPandas decode, and frame-sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    from kafka_overwatch_spark.pipelines import multimodal as mm
    from kafka_overwatch_spark.registry import get_snaps

    get_snaps(spark, SF_DIR)  # registers `documents`
    return mm.synth_media_from_documents(spark.table("documents")).cache()


def test_media_schema(media):
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<width:bigint,height:bigint")


def test_jvm_header_extraction_matches_python_decode(spark, media):
    from kafka_overwatch_spark.pipelines import multimodal as mm

    jvm = {
        r["doc_id"]: (r["magic"], r["width"], r["height"], r["n_bytes"])
        for r in mm.extract_header_metadata(media).collect()
    }
    py = {
        r["doc_id"]: (r["width"], r["height"], r["n_bytes"])
        for r in mm.decode_media(media).collect()
    }
    assert set(jvm) == set(py)
    for doc_id, (magic, w, h, n) in jvm.items():
        assert magic == "IMG1"
        assert py[doc_id] == (w, h, n)


def test_decode_mean_byte_deterministic(media):
    from kafka_overwatch_spark.pipelines import multimodal as mm

    a = {r["doc_id"]: r["mean_byte"] for r in mm.decode_media(media).collect()}
    b = {r["doc_id"]: r["mean_byte"] for r in mm.decode_media(media).collect()}
    assert a == b
    assert all(0 <= v <= 255 for v in a.values())


def test_real_codec_path_is_stubbed(media):
    from kafka_overwatch_spark.pipelines import multimodal as mm

    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, use_real_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling_fanout(media):
    from kafka_overwatch_spark.pipelines import multimodal as mm

    frames = mm.sample_frames(media, frame_bytes=64)
    rows = frames.collect()
    video_ids = {
        r["doc_id"] for r in media.filter(F.col("media_type") == "video").collect()
    }
    assert {r["doc_id"] for r in rows} == video_ids
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        ids = sorted(r["frame_id"] for r in doc_rows)
        assert ids == list(range(len(ids)))  # contiguous frames
        assert all(r["frame_offset_bytes"] == r["frame_id"] * 64 for r in doc_rows)


def test_resize_media_contract(spark, snaps):
    """Resize: binary in → binary out with the header rewritten to the
    target dims, body strided down by area ratio, metadata columns
    updated; round-trips through extract_header_metadata."""
    from kafka_overwatch_spark.pipelines import multimodal as mm

    docs = spark.table("documents").filter(F.col("doc_id") < 40)
    media = mm.synth_media_from_documents(docs)
    resized = mm.resize_media(media, target_width=32, target_height=24)
    rows = {r["doc_id"]: r for r in resized.collect()}
    orig = {r["doc_id"]: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for doc_id, r in rows.items():
        assert r["width"] == 32 and r["height"] == 24
        assert bytes(r["payload"])[:12] == b"IMG100320024"
        assert len(r["payload"]) <= len(orig[doc_id]["payload"])
    # header parse of the resized payload agrees with the new metadata
    meta = {
        r["doc_id"]: (r["width"], r["height"])
        for r in mm.extract_header_metadata(resized).collect()
    }
    assert all(v == (32, 24) for v in meta.values())


def test_feature_extraction_matches_python(media):
    """Histogram features + entropy equal a straight-Python computation
    on a sample of payloads; vector is L1-normalized."""
    import math

    from kafka_overwatch_spark.pipelines import multimodal as mm

    out = {r["doc_id"]: r for r in mm.extract_features(media).collect()}
    sample = media.limit(5).collect()
    for row in sample:
        body = bytes(row["payload"])[mm.HEADER_LEN:]
        hist = [0] * mm.FEATURE_DIM
        for b in body:
            hist[b >> 4] += 1
        total = max(sum(hist), 1)
        norm = [h / total for h in hist]
        ent = -sum(p * math.log2(p) for p in norm if p > 0)
        got = out[row["doc_id"]]
        assert got["feature"] == [round(p, 6) for p in norm]
        assert got["entropy"] == round(ent, 6)
        assert abs(sum(got["feature"]) - 1.0) < 1e-4


def _phash_py(text: str, segments: int = 64) -> int:
    """Straight-Python reference of the 64-bit positional aHash
    (signed two's complement, matching the LongType column)."""
    cps = [ord(c) for c in text]
    n = len(cps)
    if n == 0:
        return 0
    total = sum(cps)
    fp = 0
    for s in range(segments):
        seg = [cp for p, cp in enumerate(cps) if (p * segments) // n == s]
        if sum(seg) * n > total * len(seg):
            fp |= 1 << s
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_media_phash_matches_python_reference(spark, media):
    from kafka_overwatch_spark.pipelines import multimodal as mm

    got = {r["doc_id"]: r["phash"] for r in mm.media_phash(media).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == _phash_py(text), doc_id


def test_media_phash_pairs_candidates_are_verified(spark, media):
    """Every emitted pair's hamming is ≤ the bound and equals the direct
    xor popcount of the two fingerprints; a constructed near-identical
    payload pair IS found (recall witness for the pigeonhole join)."""
    from kafka_overwatch_spark.pipelines import multimodal as mm

    fps = {r["doc_id"]: r["phash"] for r in mm.media_phash(media).collect()}
    pairs = mm.media_phash_pairs(media).collect()
    for r in pairs:
        direct = bin(fps[r["doc_a"]] ^ fps[r["doc_b"]]).count("1")
        assert r["hamming"] == direct <= mm.PHASH_MAX_HAMMING
    # recall witness: two synthetic docs, one with a tiny edit
    base = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame(
        [
            (9001, base, len(base), "en", "synthetic"),
            (9002, base[:-10] + "altered!!!", len(base), "en", "synthetic"),
        ],
        "doc_id long, text string, n_chars long, lang string, source string",
    )
    synth = mm.synth_media_from_documents(docs)
    found = mm.media_phash_pairs(synth).collect()
    assert any(
        {r["doc_a"], r["doc_b"]} == {9001, 9002} for r in found
    ), found


def test_frame_phash_matches_python_reference(spark, snaps):
    """Spark per-frame hashes equal a straight-Python fold of the same
    positional aHash over each 256-byte window."""
    from kafka_overwatch_spark.pipelines.multimodal import (
        HEADER_LEN,
        PHASH_SEGMENTS,
        frame_phash,
        synth_media_from_documents,
    )

    docs = spark.table("documents").filter(F.col("doc_id") < 90)
    media = synth_media_from_documents(docs)
    got = {
        (r["doc_id"], r["frame_id"]): r["phash"]
        for r in frame_phash(media).collect()
    }
    want = {}
    for r in media.filter(F.col("media_type") == "video").collect():
        body = bytes(r["payload"])[HEADER_LEN:]
        n_frames = max((max(len(body), 1) + 255) // 256, 1)
        for f in range(n_frames):
            w = body[f * 256 : (f + 1) * 256]
            h, n, total = 0, len(w), sum(w)
            seg = PHASH_SEGMENTS
            for s_i in range(seg):
                lo = (s_i * n + seg - 1) // seg
                hi = ((s_i + 1) * n + seg - 1) // seg
                if sum(w[lo:hi]) * n > total * (hi - lo):
                    h |= 1 << s_i
            if h >= 1 << 63:
                h -= 1 << 64
            want[(r["doc_id"], f)] = h
    assert got == want and len(got) > 0


def test_frame_phash_pairs_find_shared_segment(spark, snaps):
    """Two constructed videos sharing one identical 256-byte segment at
    different positions must produce a frame-level pair; the pair list
    never contains same-doc frames."""
    from kafka_overwatch_spark.pipelines.multimodal import (
        frame_phash_pairs,
        synth_media_from_documents,
    )

    shared = ("the quick brown fox jumps over the lazy dog " * 6)[:256]
    a_text = shared + "A" * 300
    b_text = "B" * 256 + shared + "C" * 100
    docs = spark.createDataFrame(
        [(2, a_text, "en", "s", len(a_text)), (5, b_text, "en", "s", len(b_text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )  # doc_id % 3 == 2 → both 'video'
    pairs = frame_phash_pairs(synth_media_from_documents(docs)).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in pairs)
    assert any(
        {r["doc_a"], r["doc_b"]} == {2, 5} and r["hamming"] <= 3
        for r in pairs
    ), pairs
