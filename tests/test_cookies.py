"""U4 cookie jar (reference CookieJar.pm:19-62 semantics, t/cookie.t
shape — minus the live fetch, which the sandbox cannot do)."""

import json

import pytest
from pyspark.sql import functions as F

from loong_spark.cookies import (
    CookieGenerationFailed,
    CookieJar,
    cookie_col,
    prepare_http,
)


def gen(host):
    return [f"sid={host}-{i}" for i in range(3)]


class Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def test_missing_file_triggers_generation(tmp_path):
    jar = CookieJar(tmp_path, gen, ttl_s=100, now=Clock())
    assert jar.pool_for("a.example") == gen("a.example")
    # and the record was persisted with the TTL stamp (CookieJar.pm:49-52)
    rec = json.loads((tmp_path / "a.example").read_text())
    assert rec == {"cookies": gen("a.example"), "expire": 1100}


def test_cached_pool_reused_until_expiry(tmp_path):
    calls = []

    def counting(host):
        calls.append(host)
        return gen(host)

    clock = Clock()
    jar = CookieJar(tmp_path, counting, ttl_s=100, now=clock)
    jar.pool_for("a.example")
    jar.pool_for("a.example")
    assert calls == ["a.example"]  # second hit served from the file
    clock.t = 1100.0  # time() >= expire regenerates (CookieJar.pm:40-41)
    jar.pool_for("a.example")
    assert calls == ["a.example", "a.example"]


def test_empty_or_corrupt_file_regenerates(tmp_path):
    (tmp_path / "a.example").write_text("")
    (tmp_path / "b.example").write_text("{not json")
    jar = CookieJar(tmp_path, gen, now=Clock())
    assert jar.pool_for("a.example") == gen("a.example")
    assert jar.pool_for("b.example") == gen("b.example")


def test_record_without_expire_croaks(tmp_path):
    # CookieJar.pm:39: an expiry-less record is a hard error
    (tmp_path / "a.example").write_text(json.dumps({"cookies": ["x"]}))
    jar = CookieJar(tmp_path, gen, now=Clock())
    with pytest.raises(CookieGenerationFailed, match="expire"):
        jar.pool_for("a.example")


def test_empty_generation_croaks(tmp_path):
    jar = CookieJar(tmp_path, lambda h: [], now=Clock())
    with pytest.raises(CookieGenerationFailed, match="no cookies"):
        jar.pool_for("a.example")


def test_snapshot_covers_hosts_once(tmp_path):
    jar = CookieJar(tmp_path, gen, now=Clock())
    snap = jar.snapshot(["b.example", "a.example", "a.example"])
    assert set(snap) == {"a.example", "b.example"}
    assert snap["a.example"] == gen("a.example")


def test_cookie_col_deterministic_and_in_pool(spark, tmp_path):
    jar = CookieJar(tmp_path, gen, now=Clock())
    snap = jar.snapshot(["a.example", "b.example"])
    rows = [(f"http://a.example/p{i}", "a.example") for i in range(40)] + [
        (f"http://b.example/p{i}", "b.example") for i in range(40)
    ] + [("http://c.example/x", "c.example")]
    df = spark.createDataFrame(rows, "url string, host string")
    got = df.select(
        "url", "host", cookie_col(F.col("host"), F.col("url"), snap).alias("cookie")
    ).collect()
    for r in got:
        if r.host == "c.example":
            assert r.cookie is None  # jar miss → no Cookie header
        else:
            assert r.cookie in snap[r.host]
    # rand_cookie spreads across the pool; the hash pick must too
    a_picks = {r.cookie for r in got if r.host == "a.example"}
    assert len(a_picks) == 3
    # stable across re-evaluation (retry/speculation safety)
    again = df.select(cookie_col(F.col("host"), F.col("url"), snap).alias("cookie")).collect()
    assert [r.cookie for r in again] == [r.cookie for r in got]


def test_unsafe_host_rejected_and_snapshot_skips(tmp_path):
    """Hosts become jar FILENAMES, and canon admits remote-content shapes
    like '..' (href "http://../x" resolves with host '..'): pool_for must
    reject them before they touch the filesystem, and snapshot() must
    SKIP them (no Cookie header) instead of crashing the batch."""
    jar = CookieJar(tmp_path, gen, now=Clock())
    for bad in ["..", ".", "a/b", "../../etc", "", "A<B"]:
        with pytest.raises(ValueError, match="invalid cookie-jar host"):
            jar.pool_for(bad)
    snap = jar.snapshot(["a.example", "..", "b/../c"])
    assert set(snap) == {"a.example"}
    # nothing escaped the jar root
    assert sorted(p.name for p in tmp_path.iterdir()) == ["a.example"]


def test_proxy_col_deterministic_and_config_driven(spark):
    """S4 proxy rotation (reference ua.proxy, Crawler.pm:50-52): per-host
    pools with a '*' default; hosts with no pool and no default go direct
    (NULL); picks are deterministic across re-evaluation."""
    from loong_spark.cookies import proxy_col

    pools = {
        "a.example": ["http://p1:3128", "http://p2:3128", "http://p3:3128"],
        "*": ["http://default:8080"],
    }
    rows = [(f"http://a.example/p{i}", "a.example") for i in range(40)] + [
        (f"http://b.example/p{i}", "b.example") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    got = df.select(
        "host", proxy_col(F.col("host"), F.col("url"), pools).alias("proxy")
    ).collect()
    for r in got:
        if r.host == "a.example":
            assert r.proxy in pools["a.example"]
        else:
            assert r.proxy == "http://default:8080"  # '*' fallback
    # rotation spreads across the pool
    assert {r.proxy for r in got if r.host == "a.example"} == set(pools["a.example"])
    # stable across re-evaluation (retry/speculation safety)
    again = df.select(proxy_col(F.col("host"), F.col("url"), pools).alias("proxy")).collect()
    assert [r.proxy for r in again] == [r.proxy for r in got]

    # no '*' key: unpooled hosts go DIRECT (the reference's unset knob)
    no_default = {"a.example": ["http://p1:3128"]}
    d2 = df.select(
        "host", proxy_col(F.col("host"), F.col("url"), no_default).alias("proxy")
    ).collect()
    assert all(
        (r.proxy == "http://p1:3128") == (r.host == "a.example") for r in d2
    )
    assert all(r.proxy is None for r in d2 if r.host == "b.example")
    # empty config: every request direct
    d3 = df.select(proxy_col(F.col("host"), F.col("url"), {}).alias("proxy")).collect()
    assert all(r.proxy is None for r in d3)


def test_prepare_http_assembles_headers(spark, tmp_path):
    jar = CookieJar(tmp_path, gen, now=Clock())
    snap = jar.snapshot(["a.example"])
    df = spark.createDataFrame(
        [("http://a.example/1", "a.example")], "url string, host string"
    )
    row = prepare_http(df, snap).collect()[0]
    assert row.ua.startswith("Mozilla/5.0")
    assert row.cookie in snap["a.example"]
    # without a snapshot the cookie header is absent, UA still rotates
    row2 = prepare_http(df).collect()[0]
    assert row2.cookie is None and row2.ua.startswith("Mozilla/5.0")


def test_empty_pool_lists_rejected_at_builder(spark):
    """Defense-in-depth for ADVICE r4: an empty pool list reaching the
    column builders would pmod by F.size()=0 — NULL only with ANSI off,
    a whole-batch runtime error under spark.sql.ansi.enabled. CrawlConfig
    rejects them at config time; the builders must also reject direct
    calls so the hazard can't be constructed at all."""
    import pytest

    from loong_spark.cookies import cookie_col, proxy_col

    with pytest.raises(ValueError, match="empty pool"):
        proxy_col(F.lit("h"), F.lit("k"), {"h.example": []})
    with pytest.raises(ValueError, match="empty pool"):
        proxy_col(F.lit("h"), F.lit("k"), {"*": []})
    with pytest.raises(ValueError, match="empty pool"):
        cookie_col(F.lit("h"), F.lit("k"), {"h.example": []})
