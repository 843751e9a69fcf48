"""robots.txt parser: sectioning, UA matching, rule binding, crawl-delay
semantics, and the politeness-table derivation."""

from pyspark.sql import functions as F

from loong_spark.frontier import robots_allowed
from loong_spark.robots import parse_robots, politeness_from_robots

SIMPLE = """
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: loong
Disallow: /no-loong/
Crawl-delay: 5
"""

SHARED_HEADER = """User-agent: googlebot
User-agent: loong
Disallow: /shared/
User-agent: bingbot
Disallow: /bing-only/
"""

EMPTY_DISALLOW = """User-agent: *
Disallow:
Allow: /all/
"""

NO_MATCH = """User-agent: otherbot
Disallow: /x/
"""


def _parse(spark, pairs, agent="loong"):
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    return {r["host"]: r for r in parse_robots(df, agent=agent).collect()}


def test_sections_and_ua_matching(spark):
    got = _parse(spark, [("a.com", SIMPLE)])
    r = got["a.com"]
    # both the * section and the loong section apply; rules union
    assert r["disallow"] == ["/no-loong/", "/private/"]
    assert r["allow"] == ["/private/ok"]
    assert r["crawl_delay"] == 5.0  # strictest applicable wait


def test_shared_section_header(spark):
    got = _parse(spark, [("b.com", SHARED_HEADER)])
    r = got["b.com"]
    # consecutive UA lines share one rule block; bingbot's block is separate
    assert r["disallow"] == ["/shared/"]
    assert r["crawl_delay"] is None


def test_empty_disallow_and_no_match(spark):
    got = _parse(spark, [("c.com", EMPTY_DISALLOW), ("d.com", NO_MATCH)])
    assert got["c.com"]["disallow"] == [] and got["c.com"]["allow"] == ["/all/"]
    assert "d.com" not in got  # no applicable section → no row


def test_feeds_enforcement_and_politeness(spark):
    """Parsed output plugs straight into robots_allowed + the politeness
    table — the full robots lifecycle in-plan."""
    df = spark.createDataFrame([("a.com", SIMPLE)], "host string, robots_txt string")
    parsed = parse_robots(df, agent="loong")
    checks = parsed.select(
        "host",
        robots_allowed(F.lit("/private/secret"), F.col("disallow"), F.col("allow")).alias("sec"),
        robots_allowed(F.lit("/private/ok/page"), F.col("disallow"), F.col("allow")).alias("ok"),
        robots_allowed(F.lit("/public"), F.col("disallow"), F.col("allow")).alias("pub"),
    ).collect()[0]
    assert not checks["sec"] and checks["ok"] and checks["pub"]

    pol = politeness_from_robots(parsed, default_interval_s=1.0, default_max_active=8,
                                 min_interval_s=0.5).collect()[0]
    assert pol["interval_s"] == 5.0 and pol["max_active"] == 8
