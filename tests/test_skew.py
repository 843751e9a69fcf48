"""Skew robustness: the per-host cap + salting machinery under an
adversarial frontier (90% of rows on ONE host — the Zipf-head shape that
breaks naive windowing at 100 TB).

Assertions are semantic (timing on this VM is too noisy to gate):
* per-host caps hold exactly under extreme skew;
* salting is semantics-preserving — n_salts=1 and n_salts=8 produce the
  IDENTICAL schedule (same rows, same ranks);
* the hot host cannot crowd out cold hosts beyond its cap.
"""

import time

import pytest
from pyspark.sql import functions as F

from loong_spark.config import CrawlConfig
from loong_spark.frontier import schedule


@pytest.fixture(scope="module")
def skewed(spark):
    n = 200_000
    hot_host = F.lit("hot.example")
    # cold rows are ids ≡ 9 (mod 10); derive the host from id//10 so all
    # 50 cold hosts are actually populated
    cold_host = F.concat(
        F.lit("c"), F.pmod(F.floor(F.col("id") / 10), F.lit(50)).cast("string"), F.lit(".example")
    )
    host = F.when(F.pmod(F.col("id"), 10) < 9, hot_host).otherwise(cold_host)
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id").cast("string"))
    return spark.range(n).select(
        url.alias("url"),
        F.md5(url).alias("url_hash"),
        host.alias("host"),
        F.pmod(F.col("id"), 6).cast("int").alias("depth"),
        (F.pmod(F.col("id"), 6) * 1000).cast("double").alias("priority"),
        F.col("id").alias("seq"),
        F.lit(None).cast("string").alias("parent"),
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempt"),
        F.lit(0).cast("long").alias("enqueued_batch"),
    ).cache()


def _run(spark, skewed, n_salts: int, budget: int = 2000, cap: int = 64):
    politeness = spark.createDataFrame(
        [("hot.example", cap)], "host string, max_active int"
    )
    cfg = CrawlConfig(global_budget=budget, default_max_active=cap, n_salts=n_salts)
    t0 = time.time()
    rows = schedule(skewed, politeness, cfg).select("host", "seq", "rank").collect()
    return rows, time.time() - t0


def test_caps_hold_under_skew(spark, skewed):
    rows, sec = _run(spark, skewed, n_salts=8)
    per_host = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    # the hot host holds 90% of the frontier but gets exactly its cap
    assert per_host["hot.example"] == 64
    assert all(c <= 64 for c in per_host.values())
    # budget filled from cold hosts (50 hosts x 64 cap + 64 hot > 2000)
    assert len(rows) == 2000
    # ranks are a permutation of 0..1999 (pinned total order)
    assert sorted(r["rank"] for r in rows) == list(range(2000))


def test_salting_is_semantics_preserving(spark, skewed):
    """n_salts only changes the physical partial-top-k split; the
    schedule (rows AND ranks) must be bit-identical."""
    r1, sec1 = _run(spark, skewed, n_salts=1)
    r8, sec8 = _run(spark, skewed, n_salts=8)
    key = lambda rows: sorted((r["seq"], r["rank"]) for r in rows)  # noqa: E731
    assert key(r1) == key(r8)
    print(f"skew 200k rows: n_salts=1 {sec1:.2f}s, n_salts=8 {sec8:.2f}s")


def test_window_group_limit_is_semantics_preserving(spark, skewed):
    """cfg.window_group_limit only adds a map-side WindowGroupLimit prune
    (a superset literal bound on the cap filters); the schedule (rows AND
    ranks) must be bit-identical, and the pruned plan must actually carry
    the partial+final WindowGroupLimit pair Catalyst infers from the
    literal."""
    from loong_spark.frontier import capped_keys

    politeness = spark.createDataFrame(
        [("hot.example", 64)], "host string, max_active int"
    )
    base = CrawlConfig(global_budget=2000, default_max_active=64, n_salts=8)
    wgl = CrawlConfig(
        global_budget=2000, default_max_active=64, n_salts=8,
        window_group_limit=True,
    )
    r_off = schedule(skewed, politeness, base).select("seq", "rank").collect()
    r_on = schedule(skewed, politeness, wgl).select("seq", "rank").collect()
    key = lambda rows: sorted((r["seq"], r["rank"]) for r in rows)  # noqa: E731
    assert key(r_off) == key(r_on)

    plan_on = capped_keys(skewed, politeness, wgl)._jdf.queryExecution().executedPlan().toString()
    plan_off = capped_keys(skewed, politeness, base)._jdf.queryExecution().executedPlan().toString()
    assert plan_on.count("WindowGroupLimit") >= 2  # Partial below + Final above the exchange
    assert "WindowGroupLimit" not in plan_off


def test_cap_prefilter_is_semantics_preserving(spark, skewed):
    """cfg.cap_prefilter only shrinks the windows' input to a provable
    superset of each host's top-cap (histogram cutoff keeps all priority
    ties at the boundary); the schedule (rows AND ranks) must be
    bit-identical with the knob on or off. The skewed fixture is the
    adversarial tie case: every host's priorities collapse into 6 buckets
    of ~30k ties each, so the cutoff bucket's occupancy dwarfs the cap."""
    politeness = spark.createDataFrame(
        [("hot.example", 64)], "host string, max_active int"
    )
    on = CrawlConfig(global_budget=2000, default_max_active=64, n_salts=8)
    off = CrawlConfig(
        global_budget=2000, default_max_active=64, n_salts=8, cap_prefilter=False
    )
    assert on.cap_prefilter  # the default — the 100 TB path is the tested path
    r_on = schedule(skewed, politeness, on).select("seq", "rank").collect()
    r_off = schedule(skewed, politeness, off).select("seq", "rank").collect()
    key = lambda rows: sorted((r["seq"], r["rank"]) for r in rows)  # noqa: E731
    assert key(r_on) == key(r_off)


def test_cap_prefilter_negative_and_fractional_priorities(spark):
    """Prefilter correctness where floor() must behave: negative
    priorities (robots.txt rows ride at -1), priorities straddling a
    bucket boundary, and a host smaller than its cap (keep-all path)."""
    rows = [
        # host a: 6 rows, cap 2 — boundary ties at priority 0.0099/0.01
        ("a", 0.0099, 0, 10), ("a", 0.01, 0, 11), ("a", 0.0099, 1, 12),
        ("a", 0.5, 0, 13), ("a", -1.0, 0, 14), ("a", -0.005, 0, 15),
        # host b: 2 rows, cap 2 — total <= cap keeps everything
        ("b", 3.0, 2, 20), ("b", 2.0, 1, 21),
    ]
    df = spark.createDataFrame(
        rows, "host string, priority double, depth int, seq long"
    ).select(
        F.concat(F.lit("http://"), "host", F.lit("/"), F.col("seq").cast("string")).alias("url"),
        F.md5("host").alias("url_hash"),
        "host", "depth", "priority", "seq",
        F.lit(None).cast("string").alias("parent"),
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempt"),
        F.lit(0).cast("long").alias("enqueued_batch"),
    )
    politeness = spark.createDataFrame([], "host string, max_active int")
    on = CrawlConfig(global_budget=10, default_max_active=2, n_salts=2)
    off = CrawlConfig(global_budget=10, default_max_active=2, n_salts=2, cap_prefilter=False)
    r_on = schedule(df, politeness, on).select("seq", "rank").collect()
    r_off = schedule(df, politeness, off).select("seq", "rank").collect()
    key = lambda rs: sorted((r["seq"], r["rank"]) for r in rs)  # noqa: E731
    assert key(r_on) == key(r_off)
    # host a's winners are the robots row (-1.0) then -0.005; host b keeps both
    picked = {r["seq"] for r in r_on}
    assert picked == {14, 15, 20, 21}


# ------------------------------------------------------ domain fairness cap
@pytest.fixture(scope="module")
def subdomain_flood(spark):
    """10k rows across 200 subdomains of ONE registrable domain plus 40
    hosts on distinct domains — per-host caps alone would let the flood
    fill any budget."""
    flood_host = F.concat(
        F.lit("s"), F.pmod(F.col("id"), 200).cast("string"), F.lit(".flood.co.uk")
    )
    # derive from id//10 so all 40 cold-domain hosts are populated
    other_host = F.concat(
        F.lit("site"), F.pmod(F.floor(F.col("id") / 10), F.lit(40)).cast("string"),
        F.lit(".example")
    )
    host = F.when(F.pmod(F.col("id"), 10) < 9, flood_host).otherwise(other_host)
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id").cast("string"))
    return spark.range(10_000).select(
        url.alias("url"),
        F.md5(url).alias("url_hash"),
        host.alias("host"),
        F.pmod(F.col("id"), 6).cast("int").alias("depth"),
        (F.pmod(F.col("id"), 6) * 1000).cast("double").alias("priority"),
        F.col("id").alias("seq"),
        F.lit(None).cast("string").alias("parent"),
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempt"),
        F.lit(0).cast("long").alias("enqueued_batch"),
    ).cache()


def test_domain_cap_bounds_subdomain_flood(spark, subdomain_flood):
    from loong_spark.canon_core import registrable_domain

    politeness = spark.createDataFrame([], "host string, max_active int")
    cfg = CrawlConfig(global_budget=300, default_max_active=8, domain_cap=30)
    rows = schedule(subdomain_flood, politeness, cfg).select("host", "seq", "rank").collect()
    by_dom = {}
    for r in rows:
        d = registrable_domain(r["host"])
        by_dom[d] = by_dom.get(d, 0) + 1
    assert by_dom["flood.co.uk"] == 30  # 200 hosts x cap 8 = 1600 candidates, capped
    # budget still fills from the 40 fair domains (supply 40x8 + 30 > 300)
    assert sum(by_dom.values()) == 300
    assert all(v <= 30 for v in by_dom.values())


def test_domain_cap_off_is_unchanged(spark, subdomain_flood):
    politeness = spark.createDataFrame([], "host string, max_active int")
    base = CrawlConfig(global_budget=300, default_max_active=8)
    rows = schedule(subdomain_flood, politeness, base).select("seq", "rank").collect()
    assert len(rows) == 300


def test_domain_cap_deterministic_across_salts(spark, subdomain_flood):
    politeness = spark.createDataFrame([], "host string, max_active int")
    got = []
    for n_salts in (1, 8):
        cfg = CrawlConfig(global_budget=400, default_max_active=8,
                          domain_cap=25, n_salts=n_salts)
        rows = schedule(subdomain_flood, politeness, cfg).select("seq", "rank").collect()
        got.append(sorted((r["seq"], r["rank"]) for r in rows))
    assert got[0] == got[1]
