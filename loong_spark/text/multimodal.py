"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The crawl pipeline's media spans carry ``media_ref`` pointers; this module
is the downstream feature-extraction stage a 100 TB training pipeline
needs. Media bytes are opaque ``binary`` columns; decode/resize/
frame-sample run as Arrow-batched ``mapInPandas`` so each task processes
one partition's batch of blobs with bounded memory.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is stubbed: a clearly-marked deterministic fake that
produces metadata/features from the bytes themselves. The Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested; swapping the fake for PIL is a one-function change.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("bytes", T.BinaryType(), False),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("phash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode — deterministic fake standing in for PIL.Image.open.
    Real implementation:
        img = PIL.Image.open(io.BytesIO(data)); arr = np.asarray(img)
    The fake derives a stable (width, height) and an 8-dim 'feature' from
    the byte content so tests exercise the full Spark plumbing."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, feat


def extract_image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary blobs. One output row per
    input row; bounded batches via arrow.maxRecordsPerBatch. Partition by
    a hash of media_id upstream for even blob-size distribution."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "phash": [], "feature": []}
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data)
                w, h, feat = _fake_decode_image(data)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(data))
                out["phash"].append(hashlib.md5(data).hexdigest()[:16])
                out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=IMAGE_FEATURES)


MEDIA_RESIZED = T.StructType(
    list(MEDIA.fields)
    + [
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
    ]
)


def thumbnail_dims(w: int, h: int, target: int) -> tuple[int, int]:
    """PIL-thumbnail-style target dimensions: downscale so the longer
    side is ``target`` (never upscale), aspect preserved, integer floor.
    Pure arithmetic on (w, h) — the DuckDB oracle restates it exactly."""
    mx = max(w, h)
    if mx <= target:
        return w, h
    return max(1, w * target // mx), max(1, h * target // mx)


def resize_images(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage: output bytes are a STUB (real impl is PIL thumbnail
    inside the same mapInPandas shape; the stub re-compresses bytes
    deterministically with zlib so output sizes change like a real
    resize would), but the emitted (out_w, out_h) metadata is the REAL
    thumbnail arithmetic over the decoded dimensions — exactly what the
    PIL implementation would report, and oracle-checkable in SQL."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            dims = [
                thumbnail_dims(*_fake_decode_image(bytes(b))[:2], target)
                for b in pdf["bytes"]
            ]
            pdf["bytes"] = [zlib.compress(bytes(b), 1)[: max(64, target)] for b in pdf["bytes"]]
            pdf["out_w"] = [d[0] for d in dims]
            pdf["out_h"] = [d[1] for d in dims]
            yield pdf

    return media.mapInPandas(fn, schema=MEDIA_RESIZED)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling plumbing (1 video row → many frame rows). STUB:
    real impl shells to ffmpeg per partition; the fake emits
    len(bytes) // (every_n * 1024) frame rows with deterministic ids."""
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data)
                n_frames = max(1, len(data) // (every_n * 1024))
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(hashlib.md5(data + bytes([i])).digest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema=frame_schema)


def audio_decode_stub(media: DataFrame) -> DataFrame:
    """Audio decode is NOT implementable in this container (no librosa/
    soundfile); kept as an explicit NotImplementedError boundary."""
    raise NotImplementedError(
        "audio decode requires librosa/soundfile (absent here); "
        "plumbing shape = extract_image_features with a waveform schema"
    )


def media_table_from_documents(documents: DataFrame, repeat_n: int = 32) -> DataFrame:
    """Deterministic media table derived from the driver's ``documents``
    table (no network): every third doc contributes an image, refs are
    synthesized per doc, bytes are the utf-8 ref repeated ``repeat_n``
    times — an oracle-checkable stand-in for fetched blobs that still
    exercises the real binary-column plumbing."""
    refs = documents.filter(F.pmod("doc_id", F.lit(3)) == 0).select(
        F.concat(F.lit("img://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
        .alias("media_ref")
    )
    return refs.select(
        F.md5("media_ref").alias("media_id"),
        "media_ref",
        F.lit("image").alias("kind"),
        F.encode(F.repeat(F.col("media_ref"), repeat_n), "utf-8").cast("binary").alias("bytes"),
    )


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Derive a media table from the crawl docs' media spans: media bytes
    are faked from the ref string (no network), metadata is real."""
    refs = docs.select(
        F.explode(F.filter("spans", lambda s: s["kind"] == F.lit("media"))).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref")).distinct()
    return refs.select(
        F.md5("media_ref").alias("media_id"),
        "media_ref",
        F.lit("image").alias("kind"),
        F.encode(F.repeat(F.col("media_ref"), 32), "utf-8").cast("binary").alias("bytes"),
    )
