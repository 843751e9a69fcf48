"""End-to-end: Spark micro-batch pipeline == pure-Python oracle, exactly.

Asserts (FIXTURES.md §6): total crawl order, final URL-seen set, per-row
span-sequence equality (kind, text, media_ref, order), and per-batch
metrics — the BASELINE.json correctness gate.
"""

import pytest
from pyspark.sql import functions as F

from loong_spark import schemas
from loong_spark.compare import assert_matches_oracle
from loong_spark.config import CrawlConfig
from loong_spark.gen import (
    TINY,
    GraphParams,
    graph_rows_for_spark,
    graph_rows_html_for_spark,
    politeness_of,
    seeds_of,
)
from loong_spark.oracle import run_oracle
from loong_spark.pipeline import CrawlPipeline


def make_pipeline(
    spark, warehouse, params: GraphParams, cfg: CrawlConfig, politeness=None
) -> CrawlPipeline:
    pipe = CrawlPipeline(spark, warehouse, cfg)
    graph_df = spark.createDataFrame(
        [
            (
                r["url"], r["url_hash"], r["host"], r["status"],
                r["content_type"],
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["body_spans"]],
                r["out_links"],
            )
            for r in graph_rows_for_spark(params)
        ],
        schemas.WEB_GRAPH,
    )
    if politeness is None:
        politeness = list(politeness_of(params).values())
    pipe.bootstrap(graph_df, politeness, seeds_of(params))
    return pipe


@pytest.mark.parametrize(
    "use_bloom,bloom_mode",
    [(False, "auto"), (True, "broadcast"), (True, "cogroup")],
)
def test_tiny_full_crawl_matches_oracle(spark, warehouse, use_bloom, bloom_mode):
    cfg = CrawlConfig(global_budget=20, use_bloom=use_bloom, n_shards=4, bloom_mode=bloom_mode)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline(spark, warehouse + str(use_bloom) + bloom_mode, TINY, cfg)
    metrics = pipe.run()
    assert len(metrics) == len(golden.metrics)
    assert_matches_oracle(pipe, golden)


def make_pipeline_html(
    spark, warehouse, params: GraphParams, cfg: CrawlConfig, politeness=None
) -> CrawlPipeline:
    """Parse-mode pipeline: the graph carries raw charset-encoded BYTES
    bodies; the pipeline must decode (P4) + parse (U1) them back."""
    pipe = CrawlPipeline(spark, warehouse, cfg)
    graph_df = spark.createDataFrame(
        [
            (r["url"], r["url_hash"], r["host"], r["status"], r["content_type"], r["body"])
            for r in graph_rows_html_for_spark(params)
        ],
        schemas.WEB_GRAPH_HTML,
    )
    if politeness is None:
        politeness = list(politeness_of(params).values())
    pipe.bootstrap(graph_df, politeness, seeds_of(params))
    return pipe


def test_parse_mode_matches_oracle(spark, warehouse):
    """Production fetch→decode→parse path produces EXACTLY the same
    crawl order / seen set / span sequences / metrics as the span-join
    simulator and the oracle — U1/U2 wired into the pipeline."""
    cfg = CrawlConfig(global_budget=20, use_bloom=True, n_shards=4)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline_html(spark, warehouse, TINY, cfg)
    metrics = pipe.run()
    assert len(metrics) == len(golden.metrics)
    assert_matches_oracle(pipe, golden)


def test_small_prefix_matches_oracle(spark, warehouse):
    """First batches of a bigger, skewed graph (robots + retries + dedup
    pressure all active)."""
    params = GraphParams(n_hosts=20, n_pages=600, n_seeds=5, zipf_s=1.4)
    cfg = CrawlConfig(global_budget=64, max_batches=6, use_bloom=True, n_shards=8)
    golden = run_oracle(params, cfg)
    pipe = make_pipeline(spark, warehouse, params, cfg)
    pipe.run(max_batches=6)
    assert_matches_oracle(pipe, golden, batches=6)


def test_parse_mode_js_declared_gbk_page(spark, warehouse):
    """Stretch charset case: a gbk page whose ONLY charset signal is a
    <script charset="gbk"> attr (the reference's JS sniff form,
    Scraper.pm:106-117) crawls end-to-end through fetch→decode→parse
    with exact span equality vs the oracle."""
    from loong_spark.canon_core import url_md5
    from loong_spark.oracle import Oracle
    from loong_spark.parse_core import render_body

    a = "a.example"
    seed = f"http://{a}/"
    gbk_url = f"http://{a}/p/1"
    gbk_spans = [
        {"kind": "text", "text": "队列 爬虫 café", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "media://h/i.jpg", "offset": 1},
    ]
    seed_spans = [{"kind": "text", "text": "root", "media_ref": "", "offset": 0}]
    pages = [
        (seed, seed_spans, [gbk_url], "utf-8", "none"),
        (gbk_url, gbk_spans, [], "gbk", "js"),
    ]
    graph_df = spark.createDataFrame(
        [(u, url_md5(u), a, 200, "text/html", render_body(sp, lk, cs, dec))
         for (u, sp, lk, cs, dec) in pages],
        schemas.WEB_GRAPH_HTML,
    )
    oracle_graph = {
        u: dict(url=u, url_hash=url_md5(u), host=a, status=200,
                content_type="text/html", body_spans=sp, out_links=lk)
        for (u, sp, lk, _, _) in pages
    }
    cfg = CrawlConfig(global_budget=10, use_bloom=False)
    golden = Oracle(oracle_graph, [seed], {}, cfg).run()
    pipe = CrawlPipeline(spark, warehouse, cfg)
    pipe.bootstrap(graph_df, [], [seed])
    pipe.run()
    assert_matches_oracle(pipe, golden)
    docs = {r["doc_id"]: r for r in pipe.store.read("docs").collect()}
    got = [
        dict(kind=s["kind"], text=s["text"], media_ref=s["media_ref"], offset=s["offset"])
        for s in docs[url_md5(gbk_url)]["spans"]
    ]
    assert got == gbk_spans


def test_raw_page_cache_parse_mode(spark, warehouse):
    """S6 raw-page cache (cache_resouce, Crawler.pm:307-323): with
    cfg.cache_raw_pages every 200 response's EXACT bytes land in the
    raw_pages table keyed by url_hash — replayable, and absent when the
    flag is off."""
    from loong_spark.gen import graph_rows_html_for_spark

    cfg = CrawlConfig(global_budget=20, use_bloom=True, n_shards=4, cache_raw_pages=True)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline_html(spark, warehouse, TINY, cfg)
    pipe.run()
    assert_matches_oracle(pipe, golden)

    graph_bodies = {
        r["url"]: (bytes(r["body"]), r["content_type"])
        for r in graph_rows_html_for_spark(TINY)
    }
    fetched_urls = {u for (_, _, u) in golden.crawl_order}
    cached = {
        r["url"]: (bytes(r["body"]) if r["body"] is not None else None, r["content_type"])
        for r in pipe.store.read("raw_pages").collect()
    }
    assert cached, "raw_pages never written"
    # exactly the 200-status fetched pages, byte-identical bodies
    want = {
        u: graph_bodies[u]
        for u in fetched_urls
        if u in graph_bodies and golden.docs is not None
    }
    for u, (body, ct) in cached.items():
        assert u in fetched_urls
        assert (body, ct) == graph_bodies[u], f"cached bytes differ for {u}"


def test_seen_shards_delta_write_volume(spark, warehouse):
    """Bloom persistence is O(touched shards) per batch: after the crawl
    the seen_shards manifest carries keyed delta entries and the newest
    data dir holds only that batch's touched bitsets, not all n_shards."""
    import json
    import os

    cfg = CrawlConfig(global_budget=20, use_bloom=True, n_shards=16, bloom_mode="broadcast")
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=3)
    st = pipe.store
    v = st.current_version("seen_shards")
    assert v >= 1
    with open(os.path.join(st.warehouse, "seen_shards", f"m{v}.json")) as f:
        entries = json.load(f)["dirs"]
    assert any(isinstance(e, dict) for e in entries), "no keyed delta entries"
    newest = spark.read.parquet(os.path.join(st.warehouse, "seen_shards", f"d{v}"))
    batch_urls = (
        st.read("seen").filter(F.col("seen_batch") == 3).count()
        or st.read("seen").filter(F.col("seen_batch") == 2).count()
    )
    n_written = newest.count()
    assert n_written <= min(cfg.n_shards, max(batch_urls, 1)), (
        f"wrote {n_written} shards for {batch_urls} new URLs"
    )
    # the reconstructed table still has one row per shard_id
    shards = st.read("seen_shards").collect()
    ids = [r["shard_id"] for r in shards]
    assert len(ids) == len(set(ids))


def test_domain_cap_crawl_matches_oracle(spark, warehouse):
    """cfg.domain_cap on: the per-registrable-domain fairness window
    (frontier.domain_capped) and the oracle's greedy domain counter
    produce the identical crawl — order, seen set, docs, metrics."""
    cfg = CrawlConfig(global_budget=20, domain_cap=2)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    metrics = pipe.run()
    assert len(metrics) == len(golden.metrics)
    assert_matches_oracle(pipe, golden)
    # the cap bit: no batch schedules more than 2 URLs of one eTLD+1
    from loong_spark.canon_core import extract_host, registrable_domain

    per_batch_dom: dict = {}
    for batch_id, rank, url in golden.crawl_order:
        d = registrable_domain(extract_host(url))
        key = (batch_id, d)
        per_batch_dom[key] = per_batch_dom.get(key, 0) + 1
    assert max(per_batch_dom.values()) <= 2


def test_backoff_crawl_matches_oracle(spark, warehouse):
    """cfg.backoff_mult > 1: hosts with unreachable/5xx fetches this
    batch wait floor(delay x mult); the whole crawl (order, seen, docs,
    metrics) still matches the Python oracle exactly — the two AIMD
    mirrors agree batch-for-batch."""
    cfg = CrawlConfig(global_budget=20, backoff_mult=3.0)
    golden = run_oracle(TINY, cfg)
    base = run_oracle(TINY, CrawlConfig(global_budget=20))
    # the knob actually bites on the TINY fixture (it has 500-status
    # pages): some batch schedules a different set than without it
    assert golden.crawl_order != base.crawl_order
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    metrics = pipe.run()
    assert len(metrics) == len(golden.metrics)
    assert_matches_oracle(pipe, golden)
