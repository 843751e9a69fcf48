"""Sitemaps-protocol support (cfg.fetch_sitemaps): `Sitemap:` robots
lines, urlset/sitemapindex parsing, and in-crawl discovery — JVM ≡
pure-twin parity (fixtures + Hypothesis), rich-field extraction, and
full e2e crawls asserted EXACTLY against the oracle in both fetch
modes, including a cyclic sitemapindex (terminates via URL-seen dedup)
and a sitemap-seeded crawl with fetch_robots off."""

from pyspark.sql import functions as F

from loong_spark.canon_core import url_md5
from loong_spark.compare import assert_matches_oracle, spark_crawl_order, spark_seen
from loong_spark.config import CrawlConfig
from loong_spark.gen import (
    GraphParams,
    build_graph,
    sitemap_docs_of,
    sitemap_url_of,
)
from loong_spark.oracle import Oracle, run_oracle
from loong_spark.sitemap import (
    is_sitemap_col,
    parse_sitemap,
    sitemap_lines_col,
    sitemap_locs_col,
)
from loong_spark.sitemap_core import is_sitemap, sitemap_lines, sitemap_locs

from tests.test_pipeline_e2e import make_pipeline, make_pipeline_html
from tests.test_robots_crawl import _span, mk_custom_pipeline, mk_page

SM_PARAMS = GraphParams(
    n_hosts=6, n_pages=80, n_seeds=2, robots_pages=True, sitemap_pages=True
)

# -- parser battery (shared by pure fixtures + JVM parity) -------------------

ROBOTS_TEXTS = [
    # BOM + CRLF + trailing comment + key case/space soup + dup kept
    "﻿# x\r\nUser-agent: *\r\nSitemap: http://a/S1.xml # c\r\n"
    "sitemap :\thttp://a/S1.xml\r\nSITEMAP: http://a/s2.xml\r\n",
    # inside a UA section (agent-INDEPENDENT: still extracted)
    "User-agent: otherbot\nDisallow: /\nSitemap: http://b/only.xml\n",
    # empty value + near-miss keys dropped
    "Sitemap:\nSitemapx: http://no/1\nsite map: http://no/2\n",
    # no sitemap lines at all
    "User-agent: *\nDisallow: /x/\n",
    "",
]

SITEMAP_XMLS = [
    # entities in loc, whitespace/newline padding, attributes on urlset
    '<?xml version="1.0"?>\n<urlset xmlns="http://www.sitemaps.org/'
    'schemas/sitemap/0.9">\n<url><loc>\n  http://a/p?x=1&amp;y=2  \n</loc>'
    "<lastmod>2026-01-01</lastmod></url>\n"
    "<url><loc>http://a/q&apos;s</loc><priority>0.8</priority></url></urlset>",
    # sitemapindex children; empty loc dropped; &amp;lt; single-pass decode
    "<sitemapindex><sitemap><loc>http://a/sm-0.xml</loc></sitemap>"
    "<sitemap><loc>  </loc></sitemap>"
    "<sitemap><loc>http://a/sm&amp;lt;1.xml</loc></sitemap></sitemapindex>",
    # uppercase <LOC> NOT matched (XML is case-sensitive — pinned)
    "<urlset><url><LOC>http://a/up</LOC></url>"
    "<url><loc>http://a/low</loc></url></urlset>",
    # not a sitemap at all
    "<html><body><loc>http://a/fake</loc></body></html>",
    "",
]

IS_SITEMAP_CASES = [
    ("application/xml", "<urlset><url/></urlset>", True),
    ("text/xml; charset=UTF-8", "<sitemapindex>", True),
    ("application/xml", "  <?xml?> <urlset\n>", True),
    ("text/html", "<urlset>", False),  # ct gate
    ("application/xml", "<rss><channel/></rss>", False),  # root gate
    ("application/rss+xml", "<urlset>", True),  # 'xml' substring suffices
    (None, "<urlset>", False),
    ("application/xml", None, False),
]


def test_sitemap_lines_pure_fixtures():
    assert sitemap_lines(ROBOTS_TEXTS[0]) == [
        "http://a/S1.xml", "http://a/S1.xml", "http://a/s2.xml",
    ]
    assert sitemap_lines(ROBOTS_TEXTS[1]) == ["http://b/only.xml"]
    assert sitemap_lines(ROBOTS_TEXTS[2]) == []
    assert sitemap_lines(ROBOTS_TEXTS[3]) == []
    assert sitemap_lines(ROBOTS_TEXTS[4]) == []


def test_sitemap_locs_pure_fixtures():
    assert sitemap_locs(SITEMAP_XMLS[0]) == [
        "http://a/p?x=1&y=2", "http://a/q's",
    ]
    assert sitemap_locs(SITEMAP_XMLS[1]) == [
        "http://a/sm-0.xml", "http://a/sm&lt;1.xml",
    ]
    assert sitemap_locs(SITEMAP_XMLS[2]) == ["http://a/low"]
    # the regex extracts <loc> anywhere; the CONTENT GATE is what keeps
    # non-sitemap documents out of the pipeline branch
    assert sitemap_locs(SITEMAP_XMLS[3]) == ["http://a/fake"]


def test_is_sitemap_pure_fixtures():
    for ct, body, want in IS_SITEMAP_CASES:
        assert is_sitemap(ct, body) is want, (ct, body)


def test_jvm_pure_parity(spark):
    """sitemap.py column expressions ≡ sitemap_core on the whole
    battery — one job for all three functions."""
    rows = [(t, None, None) for t in ROBOTS_TEXTS]
    rows += [(None, x, None) for x in SITEMAP_XMLS]
    rows += [(None, body, ct) for ct, body, _ in IS_SITEMAP_CASES]
    df = spark.createDataFrame(rows, "rob string, xml string, ct string")
    got = df.select(
        "rob", "xml", "ct",
        sitemap_lines_col(F.col("rob")).alias("lines"),
        sitemap_locs_col(F.col("xml")).alias("locs"),
        is_sitemap_col(F.col("ct"), F.col("xml")).alias("gate"),
    ).collect()
    for r in got:
        if r["rob"] is not None:
            assert r["lines"] == sitemap_lines(r["rob"]), r["rob"]
        if r["xml"] is not None:
            assert r["locs"] == sitemap_locs(r["xml"]), r["xml"]
        assert bool(r["gate"]) == is_sitemap(r["ct"], r["xml"]), (r["ct"], r["xml"])


def test_parse_sitemap_rich_fields(spark):
    df = spark.createDataFrame([("s1", SITEMAP_XMLS[0]), ("s2", SITEMAP_XMLS[1])],
                               "sid string, xml string")
    got = {
        (r["sid"], r["entry_idx"]): r
        for r in parse_sitemap(df, "xml", keep=("sid",)).collect()
    }
    r = got[("s1", 0)]
    assert (r["kind"], r["loc"], r["lastmod"], r["priority"]) == (
        "url", "http://a/p?x=1&y=2", "2026-01-01", None)
    assert got[("s1", 1)]["priority"] == 0.8
    # index: empty-loc block filtered, kinds tagged, doc order kept
    assert [(k, v["loc"]) for (s, k), v in sorted(got.items()) if s == "s2"] == [
        (0, "http://a/sm-0.xml"), (2, "http://a/sm&lt;1.xml")]
    assert all(v["kind"] == "sitemap" for (s, _), v in got.items() if s == "s2")


# -- Hypothesis property parity ----------------------------------------------

def _hyp():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    return given, settings, st


_GIVEN, _SETTINGS, _ST = _hyp()

#: directive soup: keys near-missing 'sitemap', comments, BOM, CRLF,
#: colons in values; XML soup: nested-ish tags, entities, padding
_ROB_CHARS = "Ssitemap:/# \t\r\nabc.xX-&?="
_XML_CHARS = "<>/lociurstemapnd &;ampltgqu'\"\n\t 019.-"


@_GIVEN(txts=_ST.lists(_ST.text(alphabet=_ROB_CHARS, max_size=80), min_size=1, max_size=8))
@_SETTINGS(max_examples=12, deadline=None)
def test_sitemap_lines_property_parity(spark, txts):
    df = spark.createDataFrame([(t,) for t in txts], "rob string")
    got = df.select("rob", sitemap_lines_col(F.col("rob")).alias("l")).collect()
    for r in got:
        assert r["l"] == sitemap_lines(r["rob"]), repr(r["rob"])


@_GIVEN(xmls=_ST.lists(_ST.text(alphabet=_XML_CHARS, max_size=120), min_size=1, max_size=8))
@_SETTINGS(max_examples=12, deadline=None)
def test_sitemap_locs_property_parity(spark, xmls):
    df = spark.createDataFrame([(x,) for x in xmls], "xml string")
    got = df.select("xml", sitemap_locs_col(F.col("xml")).alias("l")).collect()
    for r in got:
        assert r["l"] == sitemap_locs(r["xml"]), repr(r["xml"])


# -- e2e crawls vs the oracle -------------------------------------------------

def test_fetch_sitemaps_full_crawl_matches_oracle(spark, warehouse):
    """Gen fixture with robots-advertised sitemap trees (flat urlsets,
    two-level indexes, cross-host and dangling locs): crawl order /
    seen / docs / metrics match the oracle exactly, and sitemap-only
    orphan pages really got crawled through the discovery path."""
    cfg = CrawlConfig(
        global_budget=20, fetch_robots=True, fetch_sitemaps=True,
        use_bloom=True, n_shards=4,
    )
    golden = run_oracle(SM_PARAMS, cfg)
    pipe = make_pipeline(spark, warehouse, SM_PARAMS, cfg, politeness=[])
    pipe.run()
    assert_matches_oracle(pipe, golden)

    crawled = {u for _, _, u in spark_crawl_order(pipe)}
    assert any("/sitemap" in u for u in crawled), "no sitemap was ever fetched"
    # an orphan: listed in a sitemap, reachable ONLY through it
    g = build_graph(SM_PARAMS)
    linked = {l for pg in g.values() for l in pg["out_links"]}
    sm_locs_all = {
        loc
        for k in range(SM_PARAMS.n_hosts)
        for _, xml, _ in sitemap_docs_of(SM_PARAMS, k)
        for loc in sitemap_locs(xml)
    }
    orphans = (sm_locs_all - linked) & set(g) & crawled
    assert orphans, "no sitemap-only page was discovered — fixture too weak"


def test_fetch_sitemaps_parse_mode_matches_oracle(spark, warehouse):
    """Same contract through the production fetch→decode→parse path:
    sitemap bodies arrive as raw XML BYTES."""
    cfg = CrawlConfig(
        global_budget=20, fetch_robots=True, fetch_sitemaps=True,
        use_bloom=True, n_shards=4,
    )
    golden = run_oracle(SM_PARAMS, cfg)
    pipe = make_pipeline_html(spark, warehouse, SM_PARAMS, cfg, politeness=[])
    pipe.run()
    assert_matches_oracle(pipe, golden)


def _xml_page(url, xml, ct="application/xml"):
    return mk_page(url, content_type=ct, spans=[_span(xml)])


def test_cyclic_sitemap_index_terminates(spark, warehouse):
    """A sitemapindex that lists ITSELF (and a child) cannot loop: the
    second fetch of the index dedups away at the URL-seen filter. The
    whole crawl still matches the oracle."""
    a = "a.example"
    seed = f"http://{a}/"
    idx = sitemap_url_of(a)
    child = sitemap_url_of(a, 0)
    graph = {}
    for page in [
        mk_page(seed),
        mk_page(
            f"http://{a}/robots.txt", content_type="text/plain",
            spans=[_span(f"User-agent: *\nCrawl-delay: 1\nSitemap: {idx}\n")],
        ),
        _xml_page(
            idx,
            "<sitemapindex>"
            f"<sitemap><loc>{idx}</loc></sitemap>"      # the cycle
            f"<sitemap><loc>{child}</loc></sitemap>"
            "</sitemapindex>",
        ),
        _xml_page(
            child, f"<urlset><url><loc>http://{a}/only</loc></url></urlset>"
        ),
        mk_page(f"http://{a}/only"),
    ]:
        graph[page["url"]] = page
    cfg = CrawlConfig(
        global_budget=10, fetch_robots=True, fetch_sitemaps=True,
        use_bloom=True, n_shards=2, max_batches=50,
    )
    pipe = mk_custom_pipeline(spark, warehouse, graph, [seed], cfg)
    pipe.run()
    golden = Oracle(graph, [seed], {}, cfg).run()
    assert_matches_oracle(pipe, golden)
    order = [u for _, _, u in spark_crawl_order(pipe)]
    assert order.count(idx) == 1, "cyclic index fetched more than once"
    assert f"http://{a}/only" in order


def test_sitemap_seed_without_fetch_robots(spark, warehouse):
    """fetch_sitemaps works standalone: seeding a crawl AT a sitemap URL
    (an operator's common bootstrap move) walks its locs with
    fetch_robots off."""
    a = "a.example"
    sm = sitemap_url_of(a)
    graph = {}
    for page in [
        _xml_page(sm, f"<urlset><url><loc>http://{a}/p1</loc></url>"
                      f"<url><loc>http://{a}/p2</loc></url></urlset>"),
        mk_page(f"http://{a}/p1", links=[f"http://{a}/p3"]),
        mk_page(f"http://{a}/p2"),
        mk_page(f"http://{a}/p3"),
    ]:
        graph[page["url"]] = page
    cfg = CrawlConfig(global_budget=10, fetch_sitemaps=True, use_bloom=True, n_shards=2)
    pipe = mk_custom_pipeline(spark, warehouse, graph, [sm], cfg)
    pipe.run()
    golden = Oracle(graph, [sm], {}, cfg).run()
    assert_matches_oracle(pipe, golden)
    assert url_md5(f"http://{a}/p3") in spark_seen(pipe)  # link walk continued


def test_flag_off_ignores_sitemaps(spark, warehouse):
    """With fetch_sitemaps off (the default), a fetched XML sitemap is
    just a non-HTML 200 — no locs followed, both engine and oracle."""
    a = "a.example"
    sm = sitemap_url_of(a)
    graph = {}
    for page in [
        mk_page(f"http://{a}/", links=[sm]),
        _xml_page(sm, f"<urlset><url><loc>http://{a}/px</loc></url></urlset>"),
        mk_page(f"http://{a}/px"),
    ]:
        graph[page["url"]] = page
    cfg = CrawlConfig(global_budget=10, use_bloom=True, n_shards=2)
    pipe = mk_custom_pipeline(spark, warehouse, graph, [f"http://{a}/"], cfg)
    pipe.run()
    golden = Oracle(graph, [f"http://{a}/"], {}, cfg).run()
    assert_matches_oracle(pipe, golden)
    assert url_md5(f"http://{a}/px") not in spark_seen(pipe)

# -- w_sitemap: sitemap-declared <priority> as a scheduling boost -------------

ENTRY_XMLS = SITEMAP_XMLS + [
    # the shared numeric grammar (sitemap_core.PRIORITY_NUM_RE): plain
    # decimals/exponents parse; words, Infinity, hex, padded forms obey
    # the SAME rule on both twins
    "<urlset>"
    "<url><loc>http://a/1</loc><priority>high</priority></url>"
    "<url><loc>http://a/2</loc><priority> .5 </priority></url>"
    "<url><loc>http://a/3</loc><priority>1e-1</priority></url>"
    "<url><loc>http://a/4</loc><priority>Infinity</priority></url>"
    "<url><loc>http://a/5</loc><priority>0x1</priority></url>"
    "<url><loc>http://a/6</loc><priority>+0.9</priority></url>"
    "</urlset>",
]


def test_sitemap_entries_pure_fixtures():
    from loong_spark.sitemap_core import sitemap_entries

    assert sitemap_entries(SITEMAP_XMLS[0]) == [
        ("http://a/p?x=1&y=2", None), ("http://a/q's", 0.8)]
    assert sitemap_entries(SITEMAP_XMLS[1]) == [
        ("http://a/sm-0.xml", None), ("http://a/sm&lt;1.xml", None)]
    # block-based: a loc OUTSIDE any <url>/<sitemap> block is no entry
    # (sitemap_locs sees it; on well-formed files the twins agree)
    assert sitemap_entries(SITEMAP_XMLS[3]) == []
    assert [p for _, p in sitemap_entries(ENTRY_XMLS[-1])] == [
        None, 0.5, 0.1, None, None, 0.9]


def test_sitemap_entries_jvm_parity(spark):
    from loong_spark.sitemap import sitemap_entries_col
    from loong_spark.sitemap_core import sitemap_entries

    df = spark.createDataFrame([(x,) for x in ENTRY_XMLS], "xml string")
    got = df.select("xml", sitemap_entries_col(F.col("xml")).alias("e")).collect()
    for r in got:
        jvm = [(e["href"], e["sm_prio"]) for e in r["e"]]
        assert jvm == sitemap_entries(r["xml"]), repr(r["xml"])


@_GIVEN(xmls=_ST.lists(
    _ST.text(alphabet=_XML_CHARS + "yE+", max_size=150), min_size=1, max_size=8))
@_SETTINGS(max_examples=12, deadline=None)
def test_sitemap_entries_property_parity(spark, xmls):
    from loong_spark.sitemap import sitemap_entries_col
    from loong_spark.sitemap_core import sitemap_entries

    df = spark.createDataFrame([(x,) for x in xmls], "xml string")
    got = df.select("xml", sitemap_entries_col(F.col("xml")).alias("e")).collect()
    for r in got:
        jvm = [(e["href"], e["sm_prio"]) for e in r["e"]]
        assert jvm == sitemap_entries(r["xml"]), repr(r["xml"])


def test_w_sitemap_validation():
    import pytest

    with pytest.raises(ValueError, match="w_sitemap"):
        CrawlConfig(w_sitemap=1.0)
    with pytest.raises(ValueError, match="w_sitemap"):
        CrawlConfig(w_sitemap=-0.1)
    CrawlConfig(w_sitemap=0.99)  # the open upper bound is fine


def test_w_sitemap_boost_crawl_matches_oracle(spark, warehouse):
    """Full gen-fixture crawl with the boost on: engine ≡ oracle exactly,
    AND the boost provably changed the schedule vs w_sitemap=0 (the gen
    urlsets declare per-page priorities)."""
    import dataclasses

    cfg = CrawlConfig(
        global_budget=20, fetch_robots=True, fetch_sitemaps=True,
        use_bloom=True, n_shards=4, w_sitemap=0.5,
    )
    golden = run_oracle(SM_PARAMS, cfg)
    base = run_oracle(SM_PARAMS, dataclasses.replace(cfg, w_sitemap=0.0))
    assert golden.crawl_order != base.crawl_order, (
        "boost changed nothing — fixture priorities too weak to reorder")
    pipe = make_pipeline(spark, warehouse, SM_PARAMS, cfg, politeness=[])
    pipe.run()
    assert_matches_oracle(pipe, golden)


def test_w_sitemap_high_priority_scheduled_first(spark, warehouse):
    """Deterministic ordering pin: same host, same depth, sitemap lists
    low-prio /a BEFORE high-prio /b — the boost must schedule /b first
    (without it, document order would win)."""
    h = "a.example"
    sm = sitemap_url_of(h)
    graph = {}
    for page in [
        _xml_page(
            sm,
            "<urlset>"
            f"<url><loc>http://{h}/a</loc><priority>0.1</priority></url>"
            f"<url><loc>http://{h}/b</loc><priority>0.9</priority></url>"
            "</urlset>",
        ),
        mk_page(f"http://{h}/a"),
        mk_page(f"http://{h}/b"),
    ]:
        graph[page["url"]] = page
    cfg = CrawlConfig(
        global_budget=10, fetch_sitemaps=True, use_bloom=True,
        n_shards=2, w_sitemap=0.5,
    )
    pipe = mk_custom_pipeline(spark, warehouse, graph, [sm], cfg)
    pipe.run()
    golden = Oracle(graph, [sm], {}, cfg).run()
    assert_matches_oracle(pipe, golden)
    order = [u for _, _, u in spark_crawl_order(pipe)]
    assert order.index(f"http://{h}/b") < order.index(f"http://{h}/a")


def test_w_sitemap_boost_parse_mode_matches_oracle(spark, warehouse):
    """Boost through the production decode+parse path: sitemap bodies
    arrive as raw XML BYTES and per-entry priorities still apply."""
    import dataclasses as _dc

    cfg = CrawlConfig(
        global_budget=20, fetch_robots=True, fetch_sitemaps=True,
        use_bloom=True, n_shards=4, w_sitemap=0.5,
    )
    golden = run_oracle(SM_PARAMS, cfg)
    pipe = make_pipeline_html(spark, warehouse, SM_PARAMS, cfg, politeness=[])
    pipe.run()
    assert_matches_oracle(pipe, golden)

# -- recrawl_due: lastmod/changefreq freshness selection ----------------------


def _day_epoch(y, m, d):
    import datetime

    return (
        datetime.date(y, m, d).toordinal() - datetime.date(1970, 1, 1).toordinal()
    ) * 86400


def test_lastmod_and_changefreq_cols(spark):
    from loong_spark.sitemap import changefreq_interval_col, lastmod_epoch_col

    rows = [
        ("1972-10-10", _day_epoch(1972, 10, 10)),
        ("1972-10-10T09:30:00Z", _day_epoch(1972, 10, 10)),  # date part only
        ("soon", None),
        ("", None),
        ("1972-99-99", None),  # regex matches, calendar parse fails -> NULL
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "lastmod string")
    got = [r[0] for r in df.select(lastmod_epoch_col(F.col("lastmod"))).collect()]
    assert got == [e for _, e in rows]
    freqs = [
        ("always", 0), ("HOURLY", 3600), (" daily ", 86400), ("weekly", 604800),
        ("monthly", 2592000), ("yearly", 31536000), ("never", None),
        ("often", None), ("", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in freqs], "cf string")
    got = [r[0] for r in df.select(changefreq_interval_col(F.col("cf"))).collect()]
    assert got == [e for _, e in freqs]


def test_recrawl_due_decisions(spark):
    """Every decision branch: new / modified (strictly-after at date
    precision) / stale (incl 'always' = every run, 'never' = never) /
    fresh, with a full-datetime lastmod and a malformed one."""
    from loong_spark.sitemap import recrawl_due

    now = _day_epoch(1972, 12, 1)
    entries = [
        # loc            lastmod                  changefreq  expectation
        ("new",          "",                      "",       ("new", True)),
        ("mod",          "1972-10-10",            "",       ("modified", True)),
        ("mod_same_day", "1972-09-01",            "",       ("fresh", False)),
        ("stale_daily",  "",                      "daily",  ("stale", True)),
        ("always",       "",                      "always", ("stale", True)),
        ("never",        "",                      "never",  ("fresh", False)),
        ("unknown_cf",   "",                      "often",  ("fresh", False)),
        ("fresh",        "1972-01-01",            "yearly", ("fresh", False)),
        ("datetime",     "1972-10-10T09:30:00Z",  "",       ("modified", True)),
        ("junk_lastmod", "soon",                  "",       ("fresh", False)),
    ]
    state = {
        "mod": _day_epoch(1972, 10, 9) + 12 * 3600,
        "mod_same_day": _day_epoch(1972, 9, 1) + 10 * 3600,  # fetched ON the lastmod day
        "stale_daily": now - 2 * 86400,
        "always": now,
        "never": _day_epoch(1970, 1, 2),
        "unknown_cf": _day_epoch(1970, 1, 2),
        "fresh": now - 3600,
        "datetime": _day_epoch(1972, 10, 9),
        "junk_lastmod": now - 5 * 86400,
    }
    e_df = spark.createDataFrame(
        [(f"http://x/{l}", lm, cf, 0.5) for l, lm, cf, _ in entries],
        "loc string, lastmod string, changefreq string, priority double",
    )
    s_df = spark.createDataFrame(
        [(f"http://x/{l}", e) for l, e in state.items()],
        "loc string, last_fetch_epoch long",
    )
    got = {
        r["loc"]: (r["reason"], r["due"], r["last_fetch_epoch"])
        for r in recrawl_due(e_df, s_df, now).collect()
    }
    assert len(got) == len(entries)
    for l, _, _, (reason, due) in entries:
        key = f"http://x/{l}"
        assert got[key][:2] == (reason, due), l
        assert got[key][2] == state.get(key.rsplit("/", 1)[1]), l
