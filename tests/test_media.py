"""S10 media download sink: manifest dedups refs before download, the
fetch stage is Arrow-batched with deterministic stub bytes, and re-runs
are incremental (already-fetched refs anti-join away)."""

import hashlib

from pyspark.sql import functions as F

from loong_spark.media import fetch_media, media_manifest


def _docs(spark):
    def span(kind, ref="", text=""):
        return (kind, text, ref, 0)

    rows = [
        (1, [span("text", text="a"), span("media", ref="media://x/1.jpg")]),
        (2, [span("media", ref="media://x/1.jpg"), span("media", ref="media://x/2.jpg")]),
        (3, [span("media", ref="media://x/2.jpg")]),
        (4, [span("text", text="no media")]),
        (5, [span("media", ref="")]),  # empty ref never downloads
    ]
    return spark.createDataFrame(
        rows,
        "doc_id int, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_media_manifest_dedups_refs(spark):
    got = {r["media_ref"]: r for r in media_manifest(_docs(spark)).collect()}
    assert set(got) == {"media://x/1.jpg", "media://x/2.jpg"}
    assert got["media://x/1.jpg"]["n_refs"] == 2
    assert got["media://x/1.jpg"]["first_doc"] == 1
    assert got["media://x/2.jpg"]["first_doc"] == 2


def test_fetch_media_stub_and_incremental(spark):
    m = media_manifest(_docs(spark))
    blobs = {r["media_ref"]: r for r in fetch_media(m).collect()}
    assert set(blobs) == {"media://x/1.jpg", "media://x/2.jpg"}
    for ref, r in blobs.items():
        want = hashlib.md5(ref.encode()).hexdigest().encode()
        assert bytes(r["body"]) == want and r["n_bytes"] == 32
        assert r["body_md5"] == hashlib.md5(want).hexdigest()
    # incremental: refs already in the sink are not re-fetched
    already = spark.createDataFrame([("media://x/1.jpg",)], "media_ref string")
    again = fetch_media(m, already=already).collect()
    assert [r["media_ref"] for r in again] == ["media://x/2.jpg"]


def test_crawl_loop_media_sink(spark, warehouse):
    """download_media wires the stage into run_batch: every media ref in
    the crawled docs is downloaded EXACTLY once across batches."""
    import hashlib as _h

    from loong_spark.config import CrawlConfig
    from loong_spark.gen import TINY
    from loong_spark.media import MEDIA_BLOB
    from tests.test_pipeline_e2e import make_pipeline

    cfg = CrawlConfig(global_budget=20, use_bloom=False, download_media=True)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run()

    want = {
        r[0]
        for r in pipe.store.read("docs")
        .select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "media") & (F.col("s.media_ref") != ""))
        .select("s.media_ref")
        .distinct()
        .collect()
    }
    blobs = pipe.store.read("media_blobs", MEDIA_BLOB).collect()
    got = [r["media_ref"] for r in blobs]
    assert set(got) == want
    assert len(got) == len(want)  # once per asset, never per referring page
    for r in blobs:
        assert bytes(r["body"]) == _h.md5(r["media_ref"].encode()).hexdigest().encode()
