"""Multimodal plumbing: binary columns through mapInPandas — schema,
batch shape, determinism, and agreement with the local stub kernel."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from loong_spark.text.multimodal import (
    _fake_decode_image,
    extract_image_features,
    media_table_from_documents,
    resize_images,
    sample_video_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return media_table_from_documents(docs)


def test_image_features_match_local_kernel(spark):
    media = _media(spark)
    local = {
        r["media_id"]: bytes(r["bytes"]) for r in media.collect()
    }
    assert len(local) > 10
    got = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert set(got) == set(local)
    for mid, data in local.items():
        w, h, feat = _fake_decode_image(data)
        r = got[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_bytes"] == len(data)
        assert r["phash"] == hashlib.md5(data).hexdigest()[:16]
        assert len(r["feature"]) == 8
        assert r["feature"] == [float(x) for x in feat]


def test_video_frame_counts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = media_table_from_documents(docs, repeat_n=2048)
    frames = sample_video_frames(media, every_n=30)
    sizes = {r["media_id"]: r["n"] for r in media.select(
        "media_id", F.length("bytes").alias("nb")
    ).groupBy("media_id").agg(F.first("nb").alias("n")).collect()}
    counts = {r["media_id"]: r["c"] for r in frames.groupBy("media_id").agg(
        F.count("*").alias("c")
    ).collect()}
    assert set(counts) == set(sizes)
    for mid, nb in sizes.items():
        assert counts[mid] == max(1, nb // (30 * 1024))
    # frame_idx contiguous from 0
    idx = frames.filter(F.col("frame_idx") < 0).count()
    assert idx == 0


def test_resize_deterministic(spark):
    media = _media(spark)
    a = {r["media_id"]: bytes(r["bytes"]) for r in resize_images(media).collect()}
    b = {r["media_id"]: bytes(r["bytes"]) for r in resize_images(media).collect()}
    assert a == b and len(a) > 10
    # output is a re-coded blob, not the input
    orig = {r["media_id"]: bytes(r["bytes"]) for r in media.collect()}
    assert all(a[m] != orig[m] for m in a)
