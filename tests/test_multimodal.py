"""Tests for the multimodal binary-column plumbing (decode stubbed)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from howto_mongo_bulk_update_from_parquet_spark.operators.multimodal import (
    attach_blob, decode_asset, extract_media_meta, sample_frames)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "tiny doc"), (1, "a somewhat longer document body"), (2, "video-ish payload here")],
        "doc_id long, text string")


def test_attach_blob_binary_column(spark):
    assets = attach_blob(_docs(spark), "doc_id", "text")
    assert isinstance(assets.schema["blob"].dataType, T.BinaryType)
    r = {x.asset_id: x for x in assets.collect()}
    assert r[0].kind == "image" and r[1].kind == "audio" and r[2].kind == "video"
    assert bytes(r[0].blob) == b"tiny doc"


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_asset(b"xx", "image", fake=False)


def test_extract_meta_deterministic(spark):
    meta = extract_media_meta(attach_blob(_docs(spark), "doc_id", "text"))
    rows = {r.asset_id: r for r in meta.collect()}
    n = len(b"tiny doc")
    assert rows[0].n_bytes == n
    assert rows[0].width == 16 + n % 1024
    assert rows[0].height == 16 + (n * 7) % 1024
    assert rows[0].n_frames == 1                       # image
    assert rows[2].n_frames == 1 + len(b"video-ish payload here") % 24


def test_sample_frames_only_video(spark):
    meta = extract_media_meta(attach_blob(_docs(spark), "doc_id", "text"))
    frames = sample_frames(meta, every_nth=6).collect()
    assert {f.asset_id for f in frames} == {2}
    assert [f.frame_idx for f in frames] == list(range(0, frames[-1].frame_idx + 1, 6))


def test_byte_features_match_python(spark):
    from howto_mongo_bulk_update_from_parquet_spark.operators.multimodal import (
        attach_blob, extract_byte_features)
    df = spark.createDataFrame(
        [(1, "abc"), (2, "aaaa"), (3, "z")], "doc_id long, text string")
    rows = {r.asset_id: r for r in
            extract_byte_features(attach_blob(df, "doc_id", "text")).collect()}
    assert rows[1].n_bytes == 3 and rows[1].n_distinct_bytes == 3
    assert rows[1].sum_bytes == ord("a") + ord("b") + ord("c")
    assert rows[2].n_distinct_bytes == 1 and rows[2].sum_bytes == 4 * ord("a")
    assert rows[3].min_byte == rows[3].max_byte == ord("z")
