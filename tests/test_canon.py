"""P1-P3 canonicalization: pure-core unit tests + Spark↔core parity.

The pandas-UDF path and the oracle share loong_spark.canon_core, so the
parity test here pins the hybrid JVM fast path (canon.canonicalize_col)
against the core for every href shape the generator emits.
Reference semantics: /root/reference/lib/Loong/Scraper.pm:87-100.
"""

import pytest
from pyspark.sql import functions as F

from loong_spark.canon import canonicalize_col, host_col, url_hash_col
from loong_spark.canon_core import (
    canonicalize,
    extract_host,
    resolve_href,
    robots_match,
    split_url,
    trim_domain,
    url_md5,
)

BASE = "http://h1.example/d/7/123"

CASES = [
    # (href, expected)
    ("http://h2.example/p/9", "http://h2.example/p/9"),
    ("  http://h2.example/p/9 ", "http://h2.example/p/9"),
    ("http://h2.example/p/9#frag", "http://h2.example/p/9"),
    ("HTTP://H2.EXAMPLE/P/9", "http://h2.example/P/9"),  # host lowered, path kept
    ("http://h2.example", "http://h2.example/"),
    ("/p/9", "http://h1.example/p/9"),
    ("p/9", "http://h1.example/d/7/p/9"),
    ("9", "http://h1.example/d/7/9"),
    ("./9", "http://h1.example/d/7/9"),
    ("../9", "http://h1.example/d/9"),
    ("../../p/9", "http://h1.example/p/9"),
    ("../../../p/9", "http://h1.example/p/9"),  # .. past root is dropped
    ("//h3.example/a", "http://h3.example/a"),
    ("", "http://h1.example/d/7/123"),
    ("#frag", "http://h1.example/d/7/123"),
    ("javascript:void(0)", ""),
    ("mailto:a@b.c", ""),
    ("data:text/plain;base64,xx", ""),
    ("http://h2.example/a/./b", "http://h2.example/a/b"),
    ("http://h2.example/a//b", "http://h2.example/a/b"),
    ("http://h2.example/a/../b/", "http://h2.example/b/"),
]


@pytest.mark.parametrize("href,want", CASES)
def test_resolve_href_core(href, want):
    assert resolve_href(BASE, href) == want


def test_split_and_host():
    assert split_url("http://A.B/x?q=1") == ("http", "a.b", "/x?q=1")
    assert split_url("https://a.b") == ("https", "a.b", "/")
    assert extract_host("http://WWW.Foo.COM/bar") == "www.foo.com"
    assert trim_domain("www.foo.com") == "foo.com"
    assert trim_domain("wwwx.foo.com") == "wwwx.foo.com"  # reference bug NOT replicated
    assert url_md5("http://a.b/") == "a4a5f1898327a21535cd7be88a51bee3"


def test_robots_longest_prefix():
    assert robots_match("/x/ok/1", ["/x/"], ["/x/ok/"])
    assert not robots_match("/x/1", ["/x/"], ["/x/ok/"])
    assert robots_match("/p/1", ["/x/"], [])
    assert robots_match("/anything", [], [])
    assert not robots_match("/", ["/"], [])


def test_spark_parity(spark):
    """Hybrid JVM/pandas column == pure core, for every case + generator
    forms; also md5/host built-ins match the core helpers."""
    rows = [(BASE, href) for href, _ in CASES]
    # extra generator-shaped hrefs
    rows += [
        ("http://h0.example/", "p/5"),
        ("http://h0.example/x/ok/44", "../../p/3#s"),
        ("http://h9.example/p/8", " ./x/7 "),
        ("http://h9.example/p/8?q=1", "y"),
    ]
    df = spark.createDataFrame(rows, "base string, href string")
    got = df.select(
        "base", "href", canonicalize_col(F.col("base"), F.col("href")).alias("canon")
    ).collect()
    for r in got:
        assert r["canon"] == canonicalize(r["base"], r["href"]), (r["base"], r["href"])

    urls = [u for _, u in CASES if u] + [BASE]
    df2 = spark.createDataFrame([(u,) for u in urls], "url string")
    got2 = df2.select(
        "url", host_col(F.col("url")).alias("h"), url_hash_col(F.col("url")).alias("m")
    ).collect()
    for r in got2:
        assert r["h"] == extract_host(r["url"])
        assert r["m"] == url_md5(r["url"])


def test_canonicalize_df_parity(spark):
    """DataFrame split-union form == column form == pure core (the df form
    exists because ExtractPythonUDFs defeats branch short-circuiting)."""
    from loong_spark.canon import canonicalize_df

    rows = [(BASE, href) for href, _ in CASES] + [
        ("http://h0.example/", "p/5"),
        ("http://h0.example/x/ok/44", "../../p/3#s"),
        ("http://h9.example/p/8", " ./x/7 "),
    ]
    df = spark.createDataFrame(rows, "base string, href string")
    got = {
        (r["base"], r["href"]): r["url"]
        for r in canonicalize_df(df, "base", "href", "url").collect()
    }
    assert len(got) == len(set(rows))
    for base, href in set(rows):
        assert got[(base, href)] == canonicalize(base, href), (base, href)


def test_registrable_domain_parity(spark):
    """JVM expression == pure twin on handpicked + generated hosts."""
    from loong_spark.canon import registrable_domain_col
    from loong_spark.canon_core import MULTI_PART_SUFFIXES, registrable_domain

    hand = [
        "example.com", "a.example.com", "a.b.example.com",
        "example.co.uk", "www.example.co.uk", "deep.www.example.co.uk",
        "flood.com.au", "s1.flood.com.au",
        "localhost", "com", "co.uk",          # bare labels / bare suffix
        "192.168.0.1", "10.0.0.1:8080",       # IPv4, with port
        "example.com:443", "a.example.co.jp:80",
    ]
    gen = [f"h{i}.d{i % 7}.{suf}" for i, suf in
           enumerate(sorted(MULTI_PART_SUFFIXES))]
    hosts = hand + gen
    # pure expectations first (documents the semantics)
    assert registrable_domain("a.b.example.co.uk") == "example.co.uk"
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("10.0.0.1:8080") == "10.0.0.1"
    assert registrable_domain("localhost") == "localhost"
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = dict(df.select("host", registrable_domain_col(F.col("host")).alias("d")).collect())
    for h in hosts:
        assert got[h] == registrable_domain(h), h
