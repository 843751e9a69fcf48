"""S10 media download sink — the Spark-first shape of the reference's
``download(url, dir)`` asset fetcher (/root/reference/lib/Loong/Lite.pm:50-60,
used by script/tumblr.pl:16-27).

The reference streams one asset to disk per call, inline in the scrape
loop. At 100 TB that's the wrong shape twice over: the same asset is
re-downloaded once per referring page, and the fetch competes with the
crawl loop for connections. The rebuild splits it:

* :func:`media_manifest` — the WORK LIST: explode docs' interleaved
  spans, keep media refs, group to distinct refs with reference counts
  (dedup-before-download — the bloom-filter idea applied to assets).
  One shuffle on the ref key; output is O(distinct assets).
* :func:`fetch_media` — the DOWNLOAD stage: Arrow-batched mapInPandas
  over the manifest, one partition = one batch of GETs. No network
  exists in this container, so the fetch kernel is an explicit
  deterministic stub (md5 bytes of the ref — same honest-stub pattern
  as text/multimodal.py codecs); the plumbing (schema, batching,
  partitioning) is the real production shape and is what's tested.

Downloaded blobs land in a ``media_blobs`` table / parquet dir keyed by
``media_ref`` — idempotent re-runs re-fetch only refs absent from the
sink (left-anti join), mirroring the URL-seen discipline.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_BLOB = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("body_md5", T.StringType(), True),
    ]
)


def media_manifest(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Distinct media refs across docs' interleaved span sequences, with
    reference counts and a deterministic first referring doc — the
    download work list. explode is narrow; the only shuffle is the
    groupBy on the ref key (map-side combined), so cost is O(spans) scan
    + O(distinct refs) exchange."""
    return (
        docs.select(F.col("doc_id"), F.explode(F.col(spans_col)).alias("s"))
        .filter((F.col("s.kind") == "media") & (F.col("s.media_ref") != ""))
        .groupBy(F.col("s.media_ref").alias("media_ref"))
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def _stub_get(ref: str) -> bytes:
    """SANDBOX STUB for the HTTP GET (no network in this container):
    deterministic pseudo-bytes = ascii md5 hex of the ref (32 bytes).
    Production drops in a real batched GET here (requests.Session per
    partition) without touching the plan shape."""
    return hashlib.md5(ref.encode()).hexdigest().encode()


def fetch_media(manifest: DataFrame, already: DataFrame | None = None) -> DataFrame:
    """Download stage: refs → blobs via Arrow-batched mapInPandas (one
    partition = one connection batch — the production fetch shape;
    kernel is the documented stub). ``already`` (existing media_blobs)
    makes re-runs incremental: fetched refs anti-join away first."""
    refs = manifest.select("media_ref")
    if already is not None:
        refs = refs.join(already.select("media_ref"), "media_ref", "left_anti")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = [_stub_get(r) for r in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "body": bodies,
                    "n_bytes": [len(b) for b in bodies],
                    "body_md5": [hashlib.md5(b).hexdigest() for b in bodies],
                }
            )

    return refs.mapInPandas(run, schema=MEDIA_BLOB)
