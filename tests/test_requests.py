"""S4 request assembly audit — the `requests` table (prepare_http,
/root/reference/lib/Loong/Crawler.pm:267-297): per scheduled URL, the
rotating-UA (U3) and cookie-jar (U4) picks the fetch stage sends, logged
append-only and deterministic across runs/retries.
"""

from loong_spark import schemas
from loong_spark.config import CrawlConfig
from loong_spark.cookies import CookieJar, demo_cookie_generator
from loong_spark.gen import TINY
from loong_spark.pipeline import CrawlPipeline
from loong_spark.sites import UA_POOL
from tests.test_pipeline_e2e import make_pipeline


def _jar(tmp_path):
    return CookieJar(str(tmp_path / "cookies"), demo_cookie_generator)


def test_requests_audit_matches_crawl_order(spark, warehouse, tmp_path):
    cfg = CrawlConfig(global_budget=20, use_bloom=False, log_requests=True)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.cookie_jar = _jar(tmp_path)
    pipe.run()

    reqs = pipe.store.read("requests", schemas.REQUESTS).collect()
    order = pipe.store.read("crawl_order").collect()

    # exactly one request row per scheduled URL, same (batch, rank, url)
    assert {(r.batch_id, r.within_batch_rank, r.url) for r in reqs} == {
        (o.batch_id, o.within_batch_rank, o.url) for o in order
    }
    assert len(reqs) == len(order)

    pools = {r.host: demo_cookie_generator(r.host) for r in reqs}
    for r in reqs:
        assert r.ua in UA_POOL["web"]
        assert r.cookie in pools[r.host]

    # determinism: the pick is hash-of-url, so equal URLs (a retry of the
    # same URL in a later batch) always get the same headers
    by_url = {}
    for r in reqs:
        assert by_url.setdefault(r.url, (r.ua, r.cookie)) == (r.ua, r.cookie)


def test_requests_without_jar_logs_null_cookie(spark, warehouse):
    cfg = CrawlConfig(global_budget=20, use_bloom=False, log_requests=True)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=2)
    reqs = pipe.store.read("requests", schemas.REQUESTS).collect()
    assert reqs and all(r.cookie is None for r in reqs)
    assert all(r.ua in UA_POOL["web"] for r in reqs)


def test_requests_carry_proxy_when_configured(spark, warehouse):
    """S4 proxy rotation end-to-end: with proxy_pools configured the
    audit table logs the per-host pick next to ua/cookie (reference
    ua.proxy, Crawler.pm:50-52, logged at :282); the pick is
    deterministic per URL and absent when no pool applies."""
    from loong_spark.gen import graph_rows_for_spark

    hosts = sorted({r["host"] for r in graph_rows_for_spark(TINY)})
    pooled = hosts[0]
    pools = {pooled: ["http://px-a:3128", "http://px-b:3128"]}
    cfg = CrawlConfig(
        global_budget=20, use_bloom=False, log_requests=True, proxy_pools=pools
    )
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=3)
    reqs = pipe.store.read("requests", schemas.REQUESTS).collect()
    assert reqs
    saw_pooled = False
    for r in reqs:
        if r.host == pooled:
            assert r.proxy in pools[pooled]
            saw_pooled = True
        else:
            assert r.proxy is None  # no pool, no '*' default → direct
    assert saw_pooled
    # determinism: equal URL → equal proxy pick across batches/retries
    by_url = {}
    for r in reqs:
        assert by_url.setdefault(r.url, r.proxy) == r.proxy


def test_resume_restores_config_and_request_log(spark, warehouse, tmp_path):
    """resume must continue with the ORIGINAL knobs (config.json), not
    defaults — and keep appending to the request log with the SAME
    persisted cookie pools."""
    cfg = CrawlConfig(global_budget=7, use_bloom=False, log_requests=True)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.cookie_jar = _jar(tmp_path)
    pipe.run(max_batches=3)

    pipe2 = CrawlPipeline(spark, warehouse)  # no cfg: auto-load config.json
    assert pipe2.cfg == cfg
    pipe2.cookie_jar = _jar(tmp_path)
    pipe2.run()

    reqs = pipe2.store.read("requests", schemas.REQUESTS).collect()
    order = pipe2.store.read("crawl_order").collect()
    assert {(r.batch_id, r.within_batch_rank, r.url) for r in reqs} == {
        (o.batch_id, o.within_batch_rank, o.url) for o in order
    }


def test_empty_proxy_pool_rejected_at_config():
    """ADVICE r5: an empty pool list would be a pmod-by-zero at request
    time (a whole-batch failure under ANSI mode) — reject it where the
    config is written instead."""
    import pytest

    with pytest.raises(ValueError, match="proxy_pools"):
        CrawlConfig(proxy_pools={"h.example": []})
    with pytest.raises(ValueError, match="proxy_pools"):
        CrawlConfig.from_dict({"proxy_pools": {"*": []}})
    # non-empty pools (and no pools at all) stay fine
    CrawlConfig(proxy_pools={"h.example": ["http://p1:3128"], "*": ["http://p0:3128"]})
    CrawlConfig()
