"""Multimodal plumbing tests: binary payload column → Arrow-batched
feature extraction. The decode kernel is stubbed (no codecs in the
container); what's under test is the real Spark-side machinery —
schema, mapInPandas batch shape, determinism, column pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators import multimodal as M
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return M.synthesize_media_from_documents(docs).cache()


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or [f.name for f in media.schema.fields] == [
        f.name for f in M.MEDIA_SCHEMA.fields
    ]


def test_feature_extraction_correct_and_deterministic(spark, media):
    feats = M.extract_features(media, dim=8)
    assert feats.schema == M.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").collect()}
    assert set(rows) == set(docs)
    # n_bytes equals utf-8 length; mean_byte consistent with checksum
    for mid, text in list(docs.items())[:20]:
        b = text.encode("utf-8")
        r = rows[mid]
        assert r.n_bytes == len(b)
        assert r.checksum == sum(b) % 2**31
        assert abs(r.mean_byte - sum(b) / len(b)) < 1e-9
        assert len(r.feature_vec) == 8
    again = {r.media_id: r.feature_vec for r in M.extract_features(media, dim=8).collect()}
    assert all(again[m] == rows[m].feature_vec for m in rows)


def test_column_pruning_reaches_scan(spark, media, tmp_path):
    """The mapInPandas projection must not drag the meta struct through
    the scan: write to parquet, re-read, check the optimized plan."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    feats = M.extract_features(spark.read.parquet(p))
    physical = feats._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in physical.splitlines() if "ReadSchema" in ln]
    assert read_schema, physical
    assert "meta" not in read_schema[0]
    assert "payload" in read_schema[0]


def test_decode_stub_is_gated(media):
    with pytest.raises(NotImplementedError):
        M._decode_image(b"xx", "jpeg")


def test_resize_images_contract(spark):
    """Resized payloads are exactly width*height bytes, deterministic,
    and empty payloads stay empty."""
    from real_time_data_engineering_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "")], "doc_id long, text string"
    )
    media = M.synthesize_media_from_documents(docs)
    out = {r.media_id: r for r in M.resize_images(media, width=4, height=3).collect()}
    assert len(out[1].payload) == 12
    assert out[2].payload == b""
    assert (out[1].width, out[1].height) == (4, 3)
    again = {r.media_id: bytes(r.payload) for r in M.resize_images(media, width=4, height=3).collect()}
    assert again[1] == bytes(out[1].payload)


def test_frame_sampling_slices_and_strides(spark, load):
    """m3 plumbing: every emitted frame must be the exact FRAME_BYTES
    slice at its index, indices stride by every_n, and sub-frame
    payloads emit nothing."""
    from real_time_data_engineering_spark.operators import multimodal as M

    docs = load("documents").limit(40)
    media = M.synthesize_media_from_documents(docs)
    out = M.sample_frames(media, every_n=4).collect()
    texts = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    fb = M.FRAME_BYTES
    seen = {}
    for r in out:
        p = texts[r.media_id]
        assert r.n_frames == len(p) // fb
        assert r.frame_idx % 4 == 0
        assert bytes(r.frame) == p[r.frame_idx * fb : (r.frame_idx + 1) * fb]
        seen.setdefault(r.media_id, set()).add(r.frame_idx)
    for mid, p in texts.items():
        want = set(range(0, len(p) // fb, 4))
        assert seen.get(mid, set()) == want, mid
