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


def priority_col(
    depth: Column,
    prior_host_seen: Column,
    cfg: CrawlConfig,
    sm_prio: Column | None = None,
) -> Column:
    """O7: priority = w_d*depth + w_h*log1p(host_seen_before); lower first.
    (The reference's ordering is emergent FIFO layering + per-host fairness,
    SURVEY.md §2.6 O7; this makes it an explicit, incremental score.)

    ``sm_prio`` (passed only when cfg.w_sitemap > 0): a sitemap-declared
    <priority>, clamped to the protocol's [0,1] before the boost so a
    hostile ``<priority>1e9</priority>`` can't sink a score below the
    robots rows' -1.0 floor (config validates w_sitemap < 1 for the
    same reason). NULL (links/seeds/retries/robots) boosts nothing."""
    score = F.lit(cfg.w_depth) * depth.cast("double") + F.lit(cfg.w_host) * F.log1p(
        prior_host_seen.cast("double")
    )
    if sm_prio is not None:
        clamped = F.least(F.greatest(F.coalesce(sm_prio, F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
        score = score - F.lit(cfg.w_sitemap) * clamped
    return quantize_priority(score)


def eligible(
    queued: DataFrame,
    host_state: DataFrame,
    batch_id: int,
    broadcast_state: bool = True,
) -> DataFrame:
    """O2 politeness: keep queued rows whose host's next-eligible tick has
    arrived. The join strategy is SIZE-AWARE (the caller decides from
    host_state's on-disk bytes vs config.broadcast_limit_bytes): per-host
    state broadcasts while small, but at 10^7-10^8 known hosts (the
    10^10-URL regime) a pinned broadcast is a mandatory multi-GB ship per
    batch — above the limit this becomes a shuffle-hash equi-join on
    host (the frontier shuffles by host for the per-host top-k anyway,
    so the exchange is reused, and the build side is the smaller
    host_state)."""
    hs = host_state.select("host", "next_eligible")
    hs = F.broadcast(hs) if broadcast_state else hs.hint("shuffle_hash")
    return (
        queued.join(hs, "host", "left")
        .filter(F.coalesce(F.col("next_eligible"), F.lit(0)) <= F.lit(batch_id))
        .drop("next_eligible")
    )


def global_topk(keys: DataFrame, n: int) -> DataFrame:
    """Global deterministic top-n of scheduling keys in the pinned total
    order, with a 0-based ``rank`` column.

    ``orderBy().limit(n)`` plans TakeOrderedAndProject, whose driver-side
    merge touches n x num_partitions rows — a serial cost that grows with
    the cluster and killed N→4N scaling at bench size. Instead:

    1. parallel prefilter to a ~1.3n superset via an approximate priority
       quantile (loop doubles the quantile until the superset covers n —
       never drops a winner because the filter keeps all priority ties);
    2. heap-pruned exact top-n (orderBy().limit(n): per-partition heaps,
       tie-robust) + a trivial single-task rank over the n winners.

    Serial cost is O(superset log superset), bounded by the budget (plus
    quantile slack / priority ties) and INDEPENDENT of |keys| — the right
    trade for a crawl scheduler whose per-batch budget is fixed while the
    frontier grows to 10^10.

    ``keys`` is materialized (localCheckpoint) first: this function makes
    multiple passes (stats, filter) and the caller's window pipeline must
    execute once, not once per pass. Size is bounded by the caller's
    per-host caps (≈ hosts x max_active), not the frontier.

    Driver-side job count is kept minimal (it's serial overhead that eats
    scaling efficiency): one stats job computes the row count AND a grid
    of priority quantiles together; one count job validates the chosen
    cutoff (looping wider only in the rare under-coverage case)."""
    grid = [0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.15, 0.25, 0.35, 0.45, 0.55, 0.7, 0.85, 1.0]
    accuracy = 10_000
    # coalesce before materializing: the later stats/filter jobs run over
    # this tiny set, and hundreds of near-empty partitions cost more in
    # task launches (serial driver time) than they win in parallelism
    parallelism = keys.sparkSession.sparkContext.defaultParallelism
    keys = keys.coalesce(max(parallelism, 16)).localCheckpoint(eager=True)
    stats = keys.agg(
        F.count("*").alias("c"),
        F.percentile_approx("priority", F.array(*[F.lit(g) for g in grid]), F.lit(accuracy)).alias("cuts"),
    ).first()
    total, cuts = stats["c"], stats["cuts"]
    if total > n:
        target = min(1.0, 1.25 * n / total)
        idx = next(i for i, g in enumerate(grid) if g >= target)
        # quantile rank error ≤ total/accuracy; when that's within the 25%
        # slack the cutoff provably covers n and the validation count job
        # is skipped (it only runs for tiny-n-vs-huge-total batches)
        provably_covered = total / accuracy <= 0.2 * n
        while True:
            superset = keys.filter(F.col("priority") <= F.lit(cuts[idx]))
            if idx >= len(grid) - 1 or provably_covered or superset.count() >= n:
                break
            idx += 1  # approx-quantile under-covered (rare): widen
        keys = superset
    # final selection: orderBy().limit(n) = per-partition top-n heaps +
    # single-partition merge of ≤ n·n_parts rows. Because the superset was
    # coalesced to ≤ max(parallelism,16) partitions, the merge is bounded
    # even when priority ties inflate the superset past 1.3n (a uniform-
    # depth batch keeps every row at the cutoff value) — the heaps prune
    # the ties before the serial step ever sees them.
    w = Window.orderBy(*ORDER_COLS)  # ≤ n rows by now — trivial single task
    return (
        keys.orderBy(*ORDER_COLS).limit(n)
        .repartition(1)
        .withColumn("rank", F.row_number().over(w) - 1)
    )


def schedule(
    elig: DataFrame,
    politeness: DataFrame,
    cfg: CrawlConfig,
    broadcast_pol: bool = True,
) -> DataFrame:
    """O3+O4: per-host cap then global budget, all in the pinned total
    order. Returns scheduled rows with a ``rank`` column (0-based global
    rank within the batch — the crawl_order position).

    Scale shape: both window shuffles move only narrow scheduling keys
    (~40 B/row: host, priority, depth, seq, salt, cap) — url/parent strings
    never shuffle. Winners (≤ global_budget rows) broadcast-join back onto
    ``elig``, so the wide rows are touched scan-side only. The max_active
    dim join is size-aware like ``eligible`` (the caller decides from the
    politeness table's bytes): broadcast while small, shuffle-hash on
    host above the limit — the keys shuffle by host for the per-host
    window anyway."""
    keys = capped_keys(elig, politeness, cfg, broadcast_pol)
    if cfg.domain_cap is not None:
        keys = domain_capped(keys, cfg.domain_cap)
    # global budget (O3) + deterministic rank, bounded one-task selection
    winners = global_topk(keys.select(*ORDER_COLS), cfg.global_budget)
    return elig.join(F.broadcast(winners.select("seq", "rank")), "seq")


def capped_keys(
    elig: DataFrame,
    politeness: DataFrame,
    cfg: CrawlConfig,
    broadcast_pol: bool = True,
) -> DataFrame:
    """The per-host-capped scheduling keys (schedule()'s pre-budget
    stage, exposed so its plan is auditable — global_topk's
    localCheckpoint severs the lineage the audit would otherwise read):
    max_active dim join (size-aware) → per-host radix prefilter
    (``cfg.cap_prefilter``, see prefiltered_keys — the exact windows
    below then touch O(survivors), not O(frontier)) → two-phase salted
    per-host top-k.

    With ``cfg.window_group_limit`` on, both cap filters carry an extra
    LITERAL bound ≥ every per-host cap. ``rn <= cap`` alone is opaque to
    Catalyst's InferWindowGroupLimit (the limit must be foldable), so the
    per-(host, salt) top-k otherwise shuffles EVERY input row; the
    conjunct literal turns phase 1 into
    WindowGroupLimit(Partial) → exchange → WindowGroupLimit(Final) —
    each input partition pre-prunes each group to the bound map-side.
    In the 10^10-URL hot-host regime that cuts the phase-1 shuffle from
    O(frontier) rows to O(groups-per-partition × bound); the price is one
    extra map-side local sort of the narrow keys, which is why thin
    frontiers leave the knob off (config.py). Identical output either
    way: the literal is a superset bound of the per-host cap filter."""
    pol = politeness.select("host", "max_active")
    pol = F.broadcast(pol) if broadcast_pol else pol.hint("shuffle_hash")
    keys = elig.join(pol, "host", "left").select(
        "host",
        *ORDER_COLS,
        # salt from seq (unique, already in the scheduling key set) — NOT
        # url_hash, which would drag a 32-byte column into this scan for
        # nothing but sub-group assignment
        F.pmod(F.xxhash64("seq"), F.lit(cfg.n_salts)).alias("salt"),
        F.coalesce(F.col("max_active"), F.lit(cfg.default_max_active)).alias("cap"),
    )
    if cfg.cap_prefilter:
        keys = prefiltered_keys(keys, cfg, broadcast_pol)

    cap_ok = lambda rn: F.col(rn) <= F.col("cap")  # noqa: E731
    if cfg.window_group_limit:
        # one tiny agg job on the politeness dim (map-side combined to a
        # single value) buys the literal Catalyst needs; the dim may be
        # empty (bound falls back to the config default)
        dim_max = politeness.agg(F.max("max_active")).first()[0]
        bound = max(cfg.default_max_active, dim_max or 0)
        cap_ok = lambda rn: (F.col(rn) <= F.lit(bound)) & (F.col(rn) <= F.col("cap"))  # noqa: E731

    # phase 1: partial per-(host, salt) top-k — caps hot-host partition size
    w1 = Window.partitionBy("host", "salt").orderBy(*ORDER_COLS)
    keys = keys.withColumn("rn1", F.row_number().over(w1)).filter(cap_ok("rn1"))
    # phase 2: exact per-host top-k over ≤ n_salts*cap survivors
    w2 = Window.partitionBy("host").orderBy(*ORDER_COLS)
    return keys.withColumn("rn2", F.row_number().over(w2)).filter(cap_ok("rn2"))


def domain_capped(keys: DataFrame, cap: int) -> DataFrame:
    """Crawl-fairness stage (cfg.domain_cap) between the per-host caps
    and the global budget: at most ``cap`` rows per REGISTRABLE DOMAIN
    (eTLD+1, canon.registrable_domain_col) per batch, picked in the same
    pinned total order. Per-host caps can't bound a subdomain flood —
    10^6 ``*.blogspot.com`` hosts each get their own per-host cap and
    can fill the whole global budget; this window can.

    Scale shape: input is already ≤ hosts × per-host-cap narrow key
    rows; one more narrow-key exchange on the domain. A domain here is
    hot by construction (that's what the cap is for), so the window
    reuses the same two-phase trick as the host cap: partial top-cap
    per (domain, salt) — the salt already on the rows — then exact."""
    if cap <= 0:
        raise ValueError(f"domain_cap must be > 0, got {cap}")
    from loong_spark.canon import registrable_domain_col

    keys = keys.withColumn("_dom", registrable_domain_col(F.col("host")))
    w1 = Window.partitionBy("_dom", "salt").orderBy(*ORDER_COLS)
    w2 = Window.partitionBy("_dom").orderBy(*ORDER_COLS)
    return (
        keys.withColumn("rn_d1", F.row_number().over(w1))
        .filter(F.col("rn_d1") <= cap)
        .withColumn("rn_d2", F.row_number().over(w2))
        .filter(F.col("rn_d2") <= cap)
        .drop("_dom", "rn_d1", "rn_d2")
    )


def prefiltered_keys(keys: DataFrame, cfg: CrawlConfig, broadcast_cuts: bool) -> DataFrame:
    """Per-host radix prefilter (config.cap_prefilter): shrink ``keys`` to
    a provable superset of each host's top-``cap`` rows BEFORE the exact
    windows, so the O(frontier) narrow-key exchange + sort the windows
    would otherwise do becomes an O(survivors) one.

    How: bucket = floor(priority / width) is monotone in the order's
    leading key, so one fully-codegen histogram
    ``groupBy(host, bucket).count()`` (8-byte agg state per group —
    map-side combinable and safe at 10^7 hosts, where a per-host quantile
    sketch would hold KBs of partial-agg state per group) plus a window
    over the TINY histogram yields, per host, the smallest bucket whose
    cumulative count >= min(cap, host_total). Keeping rows with
    bucket <= cutoff keeps every top-cap row: rows in buckets strictly
    below the cap-th row's bucket number < cap, so the cutoff lands at or
    above that bucket and all its priority ties ride along. The exact
    salted top-k below decides the final set — output is bit-identical
    with the knob on or off (tests/test_skew.py).

    Cost model at 10^10 frontier rows: one extra codegen scan of the
    narrow key columns + a shuffle of occupied (host, bucket) pairs
    (~hosts x occupied-buckets rows of 24 B) instead of shuffling and
    sorting every frontier row — the survivor exchange is
    O(hosts x (cap + cutoff-bucket occupancy)). Worst case (all of a
    host's priorities in one bucket) degenerates to exactly the old
    work for that host, plus the cheap histogram pass."""
    width = cfg.cap_prefilter_width
    if width <= 0:
        raise ValueError(f"cap_prefilter_width must be > 0, got {width}")
    bucket = F.floor(F.col("priority") / F.lit(width))
    hist = keys.groupBy("host", "cap", bucket.alias("bucket")).count()
    w_cum = Window.partitionBy("host").orderBy("bucket")
    w_tot = Window.partitionBy("host")
    cuts = (
        hist.select(
            "host", "bucket",
            F.col("cap").cast("long").alias("cap"),
            F.sum("count").over(w_cum).alias("cum"),
            F.sum("count").over(w_tot).alias("total"),
        )
        .filter(F.col("cum") >= F.least("cap", "total"))
        .groupBy("host")
        .agg(F.min("bucket").alias("cut_bucket"))
    )
    # one cutoff row per distinct host — a host-keyed dim like the
    # politeness table, so it follows the caller's size-aware decision
    cuts = F.broadcast(cuts) if broadcast_cuts else cuts.hint("shuffle_hash")
    return keys.join(cuts, "host").filter(bucket <= F.col("cut_bucket")).drop("cut_bucket")


def robots_rule_regex(rule: Column) -> Column:
    """One robots rule path → an anchored Java regex, pure JVM string
    ops, per RFC 9309 §2.2.3: ``*`` matches any character sequence, a
    TRAILING ``$`` anchors the end of the path, everything else —
    including a non-trailing ``$`` — is literal. The JVM twin of
    canon_core._robots_rule_re (parity pytest-enforced)."""
    anchored = rule.endswith("$")
    body = F.when(anchored, F.regexp_replace(rule, r"\$$", "")).otherwise(rule)
    # escape every regex metacharacter EXCEPT '*' (the wildcard), then
    # turn the wildcard into '.*'
    esc = F.regexp_replace(body, r"([\\^$.|?+\[\]{}()])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def robots_rule_matches(path: Column, rule: Column) -> Column:
    """One rule against one path. Plain rules (no ``*``, no trailing
    ``$`` — the overwhelming majority in real robots files) stay on the
    startswith fast path; wildcard rules compile to the anchored regex.
    Both run JVM-side."""
    is_wild = rule.contains("*") | rule.endswith("$")
    return F.when(is_wild, F.rlike(path, robots_rule_regex(rule))).otherwise(
        path.startswith(rule)
    )


def robots_allowed(path: Column, disallow: Column, allow: Column) -> Column:
    """Most-specific-match-wins robots check with RFC 9309 wildcard
    support, pure built-ins (arrays stay JVM-side): allowed iff the best
    matching allow rule is at least as specific as the best matching
    disallow rule. Specificity = RULE LENGTH in characters, wildcards
    included — what Google's reference parser uses
    (LongestMatchRobotsMatchStrategy::MatchAllow returns
    pattern.length()); ties go to allow. Mirrors
    canon_core.robots_match."""

    def best(rules: Column) -> Column:
        return F.aggregate(
            F.filter(rules, lambda p: robots_rule_matches(path, p)),
            F.lit(-1),
            lambda acc, x: F.greatest(acc, F.length(x)),
        )

    return best(F.coalesce(allow, F.array())) >= best(F.coalesce(disallow, F.array()))
