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
