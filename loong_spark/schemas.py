"""Fixed StructType schemas for every engine table (FIXTURES.md §1-§6).

The reference is schema-less Perl hashes (SURVEY.md §1.2); the rebuild pins
explicit columnar schemas so Catalyst can prune/pushdown and Arrow can
exchange batches with pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: interleaved text+media span — BASELINE.json input_hint:
#: spans:array<struct<kind:string,text:string,media_ref:string,offset:int32>>
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

#: the synthetic crawlable web — fetch simulator source (FIXTURES.md §1);
#: replaces live HTTP (/root/reference/lib/Loong/Crawler.pm:179)
WEB_GRAPH = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("body_spans", T.ArrayType(SPAN), False),
        T.StructField("out_links", T.ArrayType(T.StringType()), False),
    ]
)

#: parse-mode variant of the crawlable web: raw charset-encoded BYTES
#: bodies; the pipeline runs the production fetch→decode→parse path
#: (rules.parse_pages_bytes) instead of reading pre-parsed spans
WEB_GRAPH_HTML = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("body", T.BinaryType(), False),
    ]
)

#: URL frontier — the Minion-queue analogue
#: (/root/reference/lib/Loong/Crawler.pm:37, :89-105)
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("parent", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("enqueued_batch", T.LongType(), False),
    ]
)

#: frontier removal tombstones (frontier_deltas mode): seqs scheduled or
#: robots-dropped; live frontier = queued MINUS dequeued (anti-join),
#: folded in and reset every frontier_compact_every batches
DEQUEUED = T.StructType([T.StructField("seq", T.LongType(), False)])

#: output docs table per BASELINE.json input_hint
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("parent", T.StringType(), True),
        T.StructField("fetched_batch", T.LongType(), False),
    ]
)

#: per-host politeness + robots policy (FIXTURES.md §3)
POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("delay_s", T.IntegerType(), False),
        T.StructField("max_active", T.IntegerType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), False),
        T.StructField("robots_allow", T.ArrayType(T.StringType()), False),
    ]
)

#: exact seen-set backstop (one row per seen url_hash)
SEEN = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("seen_batch", T.LongType(), False),
    ]
)

#: sharded bloom bitsets (SURVEY.md §4 custom #2)
SEEN_SHARDS = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("updated_batch", T.LongType(), False),
    ]
)

#: per-batch lineage + metrics (reference counter collection analogue,
#: /root/reference/lib/Loong/Mango.pm:48-58) — also the resume checkpoint
METRICS = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("urls_deduped", T.LongType(), False),
        T.StructField("docs_written", T.LongType(), False),
        T.StructField("links_discovered", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("empty_failed", T.LongType(), False),
        T.StructField("frontier_size", T.LongType(), False),
    ]
)

#: S6 raw-page cache (parse mode, cfg.cache_raw_pages): exact fetched
#: bytes per 200 response — the reference's per-md5(url) disk cache
#: (/root/reference/lib/Loong/Crawler.pm:307-323) as an append table
RAW_PAGES = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("fetched_batch", T.LongType(), False),
    ]
)

#: per-request header audit table (S4 request assembly): the exact
#: rotating-UA, cookie-jar, and proxy picks the fetch stage would send,
#: one row per scheduled URL (reference prepare_http + ua.proxy,
#: Crawler.pm:50-52, :267-297) — append-only
REQUESTS = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("within_batch_rank", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("ua", T.StringType(), False),
        T.StructField("cookie", T.StringType(), True),
        T.StructField("proxy", T.StringType(), True),
    ]
)

#: crawl order audit table — golden-comparable (FIXTURES.md §6)
CRAWL_ORDER = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("within_batch_rank", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)
