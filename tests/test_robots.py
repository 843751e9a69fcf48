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
    # RFC 9309 group selection: the exact 'loong' section wins outright;
    # the '*' section is only the fallback for agents with no section
    assert r["disallow"] == ["/no-loong/"]
    assert r["allow"] == []
    assert r["crawl_delay"] == 5.0
    fallback = _parse(spark, [("a.com", SIMPLE)], agent="someoneelse")["a.com"]
    assert fallback["disallow"] == ["/private/"]
    assert fallback["allow"] == ["/private/ok"]
    assert fallback["crawl_delay"] == 2.0


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
    table — the full robots lifecycle in-plan. (Agent with no exact
    section → the '*' group's rules enforce.)"""
    df = spark.createDataFrame([("a.com", SIMPLE)], "host string, robots_txt string")
    parsed = parse_robots(df, agent="otherbot")
    checks = parsed.select(
        "host",
        robots_allowed(F.lit("/private/secret"), F.col("disallow"), F.col("allow")).alias("sec"),
        robots_allowed(F.lit("/private/ok/page"), F.col("disallow"), F.col("allow")).alias("ok"),
        robots_allowed(F.lit("/public"), F.col("disallow"), F.col("allow")).alias("pub"),
    ).collect()[0]
    assert not checks["sec"] and checks["ok"] and checks["pub"]

    pol = politeness_from_robots(parsed, default_interval_s=1.0, default_max_active=8,
                                 min_interval_s=0.5).collect()[0]
    assert pol["interval_s"] == 2.0 and pol["max_active"] == 8


def test_exact_agent_not_overblocked(spark):
    """The ADVICE regression case: '*' disallows everything but the named
    agent's own section grants full access — the named agent must NOT be
    blocked by the '*' group."""
    txt = "User-agent: *\nDisallow: /\n\nUser-agent: loong\nDisallow:\n"
    got = _parse(spark, [("e.com", txt)])
    assert got["e.com"]["disallow"] == [] and got["e.com"]["allow"] == []


PARITY_CASES = [
    SIMPLE, SHARED_HEADER, EMPTY_DISALLOW, NO_MATCH,
    "User-agent: *\nDisallow: /\n\nUser-agent: loong\nDisallow:\n",
    "Disallow: /orphan/\nUser-agent: *\nAllow: /a\nCrawl-delay: 1.5\nCrawl-delay: 3",
    "User-agent: LOONG\ndisallow: /case/\nCRAWL-DELAY: bogus\n",
    "",
]


def test_pure_parser_parity(spark):
    """robots_core.parse_robots_text (the oracle twin) agrees with the
    Spark parser on every fixture, including group selection, shared UA
    headers, case folding, bad crawl-delay values, and no-match."""
    from loong_spark.robots_core import parse_robots_text

    for agent in ("loong", "nobody"):
        pairs = [(f"h{i}.t", txt) for i, txt in enumerate(PARITY_CASES)]
        got = _parse(spark, pairs, agent=agent)
        for i, txt in enumerate(PARITY_CASES):
            host = f"h{i}.t"
            pure = parse_robots_text(txt, agent=agent)
            if pure is None:
                assert host not in got, (agent, txt)
                continue
            r = got[host]
            assert r["disallow"] == pure["disallow"], (agent, txt)
            assert r["allow"] == pure["allow"], (agent, txt)
            assert r["crawl_delay"] == pure["crawl_delay"], (agent, txt)
