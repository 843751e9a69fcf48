"""robots.txt parsing + politeness derivation, pure built-ins.

The reference has no robots support at all; the north-star deployment
target names robots rules + per-host politeness, and frontier.py already
ENFORCES parsed rules (robots_allowed RFC 9309 most-specific-match
check with * / trailing-$ wildcard support, politeness
intervals). This module supplies the missing front half: raw robots.txt
bytes → per-host (disallow[], allow[], crawl_delay) — so a crawl can go
fetch /robots.txt like any other URL and feed the result straight back
into scheduling.

Parsing is a per-host line-window computation, entirely JVM-side
(split/posexplode + lag/sum windows + grouped aggregation — no Python):

* a section starts at a ``User-agent:`` line whose previous directive
  line is NOT a user-agent line (consecutive UA lines share one rule
  block, per the de-facto standard);
* ``Allow:`` / ``Disallow:`` / ``Crawl-delay:`` lines bind to their
  section; comments (#…) and blank lines are ignored; empty-value
  Disallow ("allow all") contributes nothing;
* group selection per RFC 9309 §2.2.1: when any section names the
  crawler's exact agent, ONLY exact-agent sections apply; ``*`` sections
  are the fallback otherwise (a site granting the named agent broader
  access than ``*`` must not be over-blocked). Applicable sections'
  rules union per host; crawl_delay takes the MAXIMUM (the strictest
  applicable wait is the one to honor).

The pure-Python twin (robots_core.parse_robots_text) implements the same
semantics for the crawl oracle; parity is pytest-enforced.

Scale: the explode is lines-per-robots (~10²); windows partition by
host — the same key politeness state shuffles on, so this co-partitions
with the scheduler's own aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    agent: str = "loong",
) -> DataFrame:
    """(host, robots_txt) → (host, disallow array, allow array,
    crawl_delay double|null). Exact-``agent`` sections win; ``*``
    sections apply only when no exact section exists (RFC 9309 §2.2.1);
    crawl_delay = MAX over applicable sections (honor the strictest
    applicable wait)."""
    host = F.col(host_col)

    def wtrim(c):
        # whitespace trim with Java \s (space/tab/CR/LF/VT/FF) — F.trim
        # strips SPACES only, which would keep the \r of a CRLF file in
        # every value; the pure twin strips the identical set
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    lines = (
        robots.select(
            host.alias("host"),
            # real robots.txt files are frequently CRLF and sometimes
            # BOM-prefixed — accept both (mirrored in robots_core)
            F.posexplode(
                F.split(F.regexp_replace(F.col(txt_col), "^\ufeff+", ""), "\r?\n")
            ).alias("pos", "raw"),
        )
        .withColumn("line", wtrim(F.regexp_replace("raw", "#.*$", "")))
        .filter(F.col("line") != "")
        .withColumn("key", F.lower(wtrim(F.substring_index("line", ":", 1))))
        .withColumn("value", wtrim(F.regexp_extract("line", "^[^:]*:(.*)$", 1)))
        .filter(F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay"))
    )
    w = Window.partitionBy("host").orderBy("pos")
    sectioned = (
        lines.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn("prev_ua", F.coalesce(F.lag("is_ua").over(w), F.lit(False)))
        .withColumn(
            "section",
            F.sum(F.when(F.col("is_ua") & ~F.col("prev_ua"), 1).otherwise(0)).over(w),
        )
    )
    per_section = sectioned.groupBy("host", "section").agg(
        F.collect_set(F.when(F.col("is_ua"), F.lower(F.col("value")))).alias("uas"),
        F.sort_array(
            F.collect_list(
                F.when((F.col("key") == "disallow") & (F.col("value") != ""), F.col("value"))
            )
        ).alias("disallow"),
        F.sort_array(
            F.collect_list(
                F.when((F.col("key") == "allow") & (F.col("value") != ""), F.col("value"))
            )
        ).alias("allow"),
        F.max(
            # try_cast: a malformed Crawl-delay value is ignored, not an
            # ANSI cast error that fails the whole parse
            F.when(F.col("key") == "crawl-delay", F.col("value").try_cast("double"))
        ).alias("crawl_delay"),
    )
    # RFC 9309 group selection: exact-agent sections win; '*' sections
    # apply only when the host has no exact-agent section at all.
    w_host = Window.partitionBy("host")
    applicable = (
        per_section.withColumn("exact", F.array_contains("uas", agent.lower()))
        .withColumn(
            "any_exact",
            F.max(F.col("exact").cast("int")).over(w_host) == 1,
        )
        .filter(
            F.col("exact") | (F.array_contains("uas", "*") & ~F.col("any_exact"))
        )
    )
    return applicable.groupBy("host").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("disallow")))).alias("disallow"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("allow")))).alias("allow"),
        F.max("crawl_delay").alias("crawl_delay"),
    )


def politeness_from_robots(
    parsed: DataFrame,
    default_interval_s: float,
    default_max_active: int,
    min_interval_s: float = 0.0,
) -> DataFrame:
    """Parsed robots → the scheduler's politeness table (host,
    interval_s, max_active): crawl_delay overrides the default interval,
    clamped below by ``min_interval_s`` (a site saying 0 doesn't turn
    politeness off)."""
    return parsed.select(
        "host",
        F.greatest(
            F.coalesce(F.col("crawl_delay"), F.lit(default_interval_s)),
            F.lit(min_interval_s),
        ).alias("interval_s"),
        F.lit(default_max_active).alias("max_active"),
    )
