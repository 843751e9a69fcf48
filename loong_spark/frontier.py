"""Frontier scheduling — the Spark expression of SURVEY.md §2.6 (O1-O8).

Everything here is JVM-side DataFrame ops (windows, joins, sort-limit):
no Python in the scheduling hot path. The total order is
``(priority, depth, seq)`` with ``seq`` unique, so every batch's schedule
is deterministic and partition-independent (SURVEY.md §7 "Hard parts" #1).

Scale design:
* per-host top-k is TWO-PHASE — partial top-k per (host, salt), then
  final per host — so one hot host (Zipf head) cannot bottleneck a single
  task (mirrors partial+final aggregation; SURVEY.md §4 custom #1).
* the global budget is `orderBy().limit(n)` → Spark plans
  TakeOrderedAndProject (per-partition top-n + driver merge), no full sort.
* politeness + max_active come from small tables that broadcast-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .config import CrawlConfig

#: pinned deterministic total order (O1 FIFO + O7 priority)
ORDER_COLS = ["priority", "depth", "seq"]


def quantize_priority(x: Column) -> Column:
    """Quantize to 1e-9 so JVM and Python libm produce identical doubles
    (log1p may differ in the last ulp between runtimes)."""
    return F.floor(x * F.lit(1e9)) / F.lit(1e9)


def priority_col(depth: Column, prior_host_seen: Column, cfg: CrawlConfig) -> Column:
    """O7: priority = w_d*depth + w_h*log1p(host_seen_before); lower first.
    (The reference's ordering is emergent FIFO layering + per-host fairness,
    SURVEY.md §2.6 O7; this makes it an explicit, incremental score.)"""
    return quantize_priority(
        F.lit(cfg.w_depth) * depth.cast("double")
        + F.lit(cfg.w_host) * F.log1p(prior_host_seen.cast("double"))
    )


def eligible(queued: DataFrame, host_state: DataFrame, batch_id: int) -> DataFrame:
    """O2 politeness: keep queued rows whose host's next-eligible tick has
    arrived. host_state is tiny per-host state → broadcast join."""
    hs = F.broadcast(host_state.select("host", "next_eligible"))
    return (
        queued.join(hs, "host", "left")
        .filter(F.coalesce(F.col("next_eligible"), F.lit(0)) <= F.lit(batch_id))
        .drop("next_eligible")
    )


def schedule(
    elig: DataFrame,
    politeness: DataFrame,
    cfg: CrawlConfig,
) -> DataFrame:
    """O3+O4: per-host cap then global budget, all in the pinned total
    order. Returns scheduled rows with a ``rank`` column (0-based global
    rank within the batch — the crawl_order position)."""
    pol = F.broadcast(politeness.select("host", "max_active"))
    df = elig.join(pol, "host", "left").withColumn(
        "max_active_eff", F.coalesce(F.col("max_active"), F.lit(cfg.default_max_active))
    )

    # phase 1: partial per-(host, salt) top-k — caps hot-host partition size
    salt = F.pmod(F.xxhash64("url_hash"), F.lit(cfg.n_salts))
    w1 = Window.partitionBy("host", salt).orderBy(*ORDER_COLS)
    df = df.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= F.col("max_active_eff")
    )
    # phase 2: exact per-host top-k over ≤ n_salts*max_active survivors
    w2 = Window.partitionBy("host").orderBy(*ORDER_COLS)
    df = df.withColumn("rn2", F.row_number().over(w2)).filter(
        F.col("rn2") <= F.col("max_active_eff")
    )

    # global budget (O3): top-n in total order → TakeOrderedAndProject
    df = df.orderBy(*ORDER_COLS).limit(cfg.global_budget)
    # rank over ≤ global_budget rows (single small partition is fine here)
    w = Window.orderBy(*ORDER_COLS)
    return df.withColumn("rank", F.row_number().over(w) - 1).drop(
        "rn1", "rn2", "max_active", "max_active_eff"
    )


def robots_allowed(path: Column, disallow: Column, allow: Column) -> Column:
    """Longest-prefix-wins robots check, pure built-ins (arrays stay
    JVM-side): allowed iff best allow-prefix ≥ best disallow-prefix.
    Mirrors canon_core.robots_match."""

    def best(rules: Column) -> Column:
        return F.aggregate(
            F.filter(rules, lambda p: path.startswith(p)),
            F.lit(-1),
            lambda acc, x: F.greatest(acc, F.length(x)),
        )

    return best(F.coalesce(allow, F.array())) >= best(F.coalesce(disallow, F.array()))
