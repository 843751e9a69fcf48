"""Crawl configuration — the Spark-side analogue of the reference's INI
config tree (/root/reference/lib/Loong/Config.pm:40-59,
conf/site/*/crawl.ini) plus engine-scale knobs.

All values are plain data so the whole config broadcasts cheaply.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field, fields


@dataclass(frozen=True)
class CrawlConfig:
    # -- scheduling discipline (reference semantics) -----------------------
    #: global in-flight budget per micro-batch
    #: (reference MAX_CONCURRENT=20 /root/reference/lib/Loong/Crawler.pm:27,
    #: times process_num=8 in conf/loong.ini → default 160)
    global_budget: int = 160
    #: default per-host cap when the politeness table has no row
    #: (reference `ua.max_active`, conf/site/*/crawl.ini: 2–20)
    default_max_active: int = 8
    #: default politeness delay in batch ticks (reference `ua.interval`;
    #: default rand(1) s pinned to 1 tick — SURVEY.md §2.6 O2)
    default_delay: int = 1
    #: retry ceiling for failed fetches (reference re-enqueues at tail,
    #: /root/reference/lib/Loong/Crawler.pm:69-76; cap is ours)
    max_attempts: int = 3

    # -- priority re-scoring (SURVEY.md §2.6 O7) ---------------------------
    #: priority = w_depth * depth + w_host * log1p(host_seen_count);
    #: lower sorts first. Ordering key is (priority, depth, seq).
    w_depth: float = 1.0
    w_host: float = 0.1

    # -- scale knobs -------------------------------------------------------
    #: bloom-filter shards (shard_id = xxhash64(url_hash) % n_shards);
    #: at 10^10 URLs with 10 bits/URL this is ~1.25 GB of bitset total,
    #: so n_shards must keep each shard « executor memory. 64 shards ×
    #: ~20 MB works at 10^9; scale n_shards linearly with frontier size.
    n_shards: int = 16
    #: bloom bits per expected URL (10 bits ≈ 0.9% FP with k=7)
    bloom_bits_per_url: int = 10
    bloom_num_hashes: int = 7
    #: expected URLs per shard used to size bitsets at bootstrap
    bloom_expected_per_shard: int = 1 << 17
    #: salts for hot-host skew in parse/dedup stages (SURVEY.md §4)
    n_salts: int = 8
    #: map-side pruning for the per-host top-k windows: when True, the
    #: cap filters carry an extra LITERAL bound (max over per-host caps,
    #: one tiny agg on the politeness dim per schedule call) so Catalyst
    #: inserts WindowGroupLimit(Partial) BELOW the exchange — each input
    #: partition pre-prunes every (host, salt) group to the bound before
    #: any row shuffles. Pays in the hot-host regime (a Zipf-head host
    #: holding 10^4+ frontier rows per partition ships ≤ bound instead),
    #: at the price of one extra map-side local sort of the narrow keys —
    #: pure overhead on THIN frontiers (rows-per-group-per-partition ≪
    #: cap), which is why it is an explicit operator knob, not always-on.
    #: Semantics-preserving either way (pinned by tests/test_skew.py).
    window_group_limit: bool = False
    #: per-host radix prefilter before the top-k windows: one fully-
    #: codegen, map-side-combinable `groupBy(host, floor(priority/width))
    #: count` histogram picks, per host, the smallest priority bucket
    #: whose cumulative count covers the per-host cap; keeping rows at or
    #: below that bucket is a PROVABLE superset of the per-host top-cap
    #: (every top-cap row's priority ≤ the cap-th smallest, whose bucket
    #: ≤ the cutoff; ties ride along), so the exact salted windows run
    #: over O(cap + one-bucket-occupancy) survivors per host instead of
    #: the whole frontier — the O(frontier) narrow-key exchange + sort
    #: becomes one extra codegen scan + an O(survivors) exchange. Agg
    #: state is 8 bytes per (host, bucket) group — safe at 10^7 hosts
    #: (unlike a per-host quantile sketch, whose partial-agg state is
    #: KBs per group). Degenerates gracefully: if a host's priorities
    #: all share one bucket the filter keeps that host whole and the
    #: windows do exactly the old work. Semantics-preserving
    #: (tests/test_skew.py pins prefilter on/off bit-equality).
    cap_prefilter: bool = True
    #: histogram bucket width in priority units. Priorities are
    #: w_depth-spaced per depth level plus the w_host*log1p term, so the
    #: default resolves ~100 buckets per depth level; occupied buckets
    #: per host ≈ priority_range/width (bounded, since priority ranges
    #: over ~[0, w_depth*max_depth + w_host*log1p(host_seen)]). Smaller
    #: width = tighter survivor sets, more (tiny) histogram rows.
    cap_prefilter_width: float = 0.01
    #: crawl-fairness cap per REGISTRABLE DOMAIN (eTLD+1) per batch,
    #: applied between the per-host caps and the global budget: per-host
    #: caps alone can't stop a subdomain flood (10^6 *.blogspot.com
    #: hosts each get their own max_active), a domain cap can. None =
    #: off (the default scheduling semantics are unchanged); when set,
    #: one more narrow-key window keyed on canon.registrable_domain_col
    #: — same pinned total order, deterministic across parallelism.
    domain_cap: int | None = None
    #: adaptive politeness backoff: a host whose batch had any
    #: server-side failure (status NULL — unreachable — or 5xx) gets its
    #: politeness clock advanced by floor(delay × backoff_mult) instead
    #: of delay for the NEXT wait — back off from distressed hosts, the
    #: AIMD half the static delay table can't express. 1.0 = off (exact
    #: base semantics). Memoryless on purpose: the penalty derives from
    #: THIS batch's fetched statuses, so no new host_state column, no
    #: schema migration for existing warehouses, and resume is
    #: unaffected. Deterministic; the Python oracle mirrors it
    #: (e2e-tested).
    backoff_mult: float = 1.0
    #: shuffle partitions for the pipeline's stages
    shuffle_partitions: int = 32
    #: size-aware join strategy for per-batch state tables (host_state
    #: live view, host_state_delta fold, dequeued tombstones): broadcast
    #: while the table's on-disk bytes stay under this limit, plain
    #: shuffle-hash equi-join above it. Mirrors bloom's 32 MB broadcast
    #: gate (bloom.BROADCAST_LIMIT_BYTES): at 10^7-10^8 known hosts the
    #: host_state broadcast would be a mandatory multi-GB ship per batch
    #: — above the limit the frontier shuffles by host instead (it
    #: shuffles by host for the per-host top-k anyway).
    broadcast_limit_bytes: int = 32 << 20

    # -- in-crawl robots fetch (north-rule polish; the reference has no
    # robots at all — SURVEY.md §7 non-goals) --------------------------------
    #: when True, politeness/robots rules are NOT fixed at bootstrap:
    #: discovering a new host enqueues http://<host>/robots.txt at
    #: priority -1 (ahead of all content URLs); the fetched file is
    #: parsed (robots.parse_robots) and merged into the politeness table
    #: for subsequent batches, and queued URLs that a newly-arrived rule
    #: disallows are dropped at schedule time.
    fetch_robots: bool = False
    #: the UA string robots.txt group selection matches (RFC 9309)
    robots_agent: str = "loong"
    #: sitemaps-protocol ingestion (sitemaps.org; beyond-reference like
    #: robots — the reference seeds only from static INI lists): when
    #: True, (a) a fetched 200 whose content type is XML and whose body
    #: is a urlset/sitemapindex document has its <loc> URLs injected
    #: into the batch's link stream (sitemap.sitemap_locs_col) — child
    #: sitemaps of an index are just URLs, re-fetched and re-parsed next
    #: round, with cycles killed by the URL-seen filter — and (b) with
    #: fetch_robots also on, `Sitemap:` lines of fetched robots files
    #: enqueue the advertised sitemap URLs the same way. Discovered locs
    #: ride the EXISTING canonicalize → dedup → robots → priority path:
    #: zero new shuffles or state tables, O(batch) extra work.
    fetch_sitemaps: bool = False
    #: weight of a sitemap-declared <priority> in O7 scoring (requires
    #: fetch_sitemaps): priority = w_depth*depth + w_host*log1p(prior)
    #: - w_sitemap*coalesce(sm_prio, 0) — lower schedules first, so a
    #: high sitemap priority jumps the queue. 0.0 (default) keeps the
    #: score expression (and the locs-based extraction) bit-identical
    #: to the boost-less path; >0 switches sitemap extraction to
    #: per-entry blocks (sitemap.sitemap_entries_col) so each loc rides
    #: with ITS declared priority. Links/seeds/robots rows carry NULL
    #: (no boost). Mirrored exactly in the oracle.
    w_sitemap: float = 0.0

    #: S6 raw-page cache (reference cache_resouce, /root/reference/
    #: lib/Loong/Crawler.pm:307-323 — per-md5(url) files on disk): when
    #: True and the graph carries raw bodies (parse mode), every fetched
    #: 200 response's exact bytes are appended to a `raw_pages` table
    #: keyed by url_hash — the debug/replay store, O(batch) per commit.
    cache_raw_pages: bool = False

    #: S10 media download stage (reference download(url, dir),
    #: /root/reference/lib/Loong/Lite.pm:50-60 — inline per-asset GETs):
    #: when True, each batch dedups its new docs' media refs
    #: (media_manifest), anti-joins refs already in the `media_blobs`
    #: table (assets download ONCE, not once per referring page), and
    #: runs the Arrow-batched fetch stage (stub kernel in-sandbox) —
    #: O(new distinct assets) per batch.
    download_media: bool = False

    #: S4 request assembly audit (reference prepare_http,
    #: /root/reference/lib/Loong/Crawler.pm:267-297): when True, every
    #: scheduled URL's outgoing headers — the rotating-UA pick (U3) and,
    #: if the pipeline was built with a CookieJar, the per-host cookie
    #: pick (U4) — are appended to a `requests` table, O(batch) per
    #: commit. This is the auditable record of what the fetch stage
    #: sends; the picks are deterministic (hash-for-RNG) so retries and
    #: re-runs log identical headers.
    log_requests: bool = False
    #: UA pool flavor for request assembly ('web' | 'mobile' — U3)
    ua_kind: str = "web"
    #: S4 proxy rotation (reference `ua.proxy`, applied per site at
    #: /root/reference/lib/Loong/Crawler.pm:50-52 from conf/site/*/
    #: crawl.ini, logged at :282): host → list of proxy endpoints; the
    #: '*' key is the default pool for hosts with no entry. Empty = no
    #: proxying (the reference's unset-knob case). The per-request pick
    #: is deterministic (xxhash64(url) % pool size — the same
    #: hash-for-RNG swap as U3/U4) and logged in the `requests` table.
    proxy_pools: dict[str, list[str]] = field(default_factory=dict)

    # -- frontier persistence ---------------------------------------------
    #: delta-write the frontier: a batch APPENDS its new entries to
    #: `queued` and its removals (scheduled seqs + robots-dropped seqs)
    #: to a `dequeued` tombstone table; reads anti-join the tombstones
    #: (broadcast while under broadcast_limit_bytes — bounded by
    #: frontier_compact_frac × frontier between folds).
    #: Per-batch frontier write I/O drops from O(frontier) — ~1 TB/batch
    #: at 10^10 URLs under the full rewrite — to O(batch). False = the
    #: original read-modify-write full snapshot per batch.
    frontier_deltas: bool = True
    #: fold tombstones into a fresh full `queued` snapshot when the live
    #: tombstone count exceeds this fraction of the frontier — write
    #: amplification is then bounded by 1/frac × O(dequeued rows), NOT a
    #: fixed-cadence O(frontier) rewrite (at 10^10 URLs a 200k budget
    #: dequeues 0.03% of the frontier in 16 batches; rewriting 10^10
    #: rows on that cadence is ~60 GB/batch amortized for nothing).
    #: Tombstone and frontier cardinalities are tracked arithmetically
    #: in the checkpoint, so the trigger costs zero jobs.
    frontier_compact_frac: float = 0.05
    #: fold the host_state delta table into its base every K batches —
    #: that rewrite is O(known hosts), orders cheaper than O(frontier),
    #: so a fixed cadence is fine; it bounds the fold side the live
    #: host_state view unions on.
    frontier_compact_every: int = 16

    # -- stopping ----------------------------------------------------------
    max_batches: int = 10_000
    #: use the sharded bloom prefilter (exact anti-join always backstops)
    use_bloom: bool = True
    #: bloom probe mode: 'broadcast' (snapshot to executors), 'cogroup'
    #: (per-partition shard probe — the 10^10-URL path), or 'auto'
    #: (switch on total bitset size; see bloom.BROADCAST_LIMIT_BYTES)
    bloom_mode: str = "auto"

    def __post_init__(self):
        # An EMPTY proxy pool would reach proxy_col as F.size(pool)=0 and
        # pmod-by-zero — NULL only with ANSI mode off, a whole-batch
        # runtime error under spark.sql.ansi.enabled=true (ADVICE r4).
        # Reject it at construction, where the config file is the clear
        # culprit: no proxying for a host = omit its key, not [].
        for h, pool in (self.proxy_pools or {}).items():
            if not pool:
                raise ValueError(
                    f"proxy_pools[{h!r}] is an empty list — omit the key for "
                    "a direct connection, or list at least one endpoint"
                )
        # The sitemap boost subtracts at most w_sitemap (priorities clamp
        # to the protocol's [0,1] in frontier.priority_col); keeping it
        # < 1 guarantees every content score stays above the robots
        # rows' pinned -1.0, preserving robots-fetch-first ordering.
        if self.backoff_mult < 1.0:
            raise ValueError(
                f"backoff_mult must be >= 1.0 (got {self.backoff_mult!r}): a "
                "failure must never SHORTEN the politeness wait"
            )
        if not (0.0 <= self.w_sitemap < 1.0):
            raise ValueError(
                f"w_sitemap must be in [0, 1) (got {self.w_sitemap!r}): the "
                "boost may not push a score below the robots-row -1.0 floor"
            )

    def to_dict(self) -> dict:
        """JSON-safe knob dump (persisted as <warehouse>/config.json at
        bootstrap so `resume` continues with the ORIGINAL settings —
        fetch_robots / log_requests / budgets must not silently reset to
        defaults on crash recovery)."""
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown CrawlConfig knobs: {sorted(unknown)}")
        return cls(**d)

    def delay_for(self, politeness: dict | None) -> int:
        return int(politeness["delay_s"]) if politeness else self.default_delay

    def max_active_for(self, politeness: dict | None) -> int:
        return int(politeness["max_active"]) if politeness else self.default_max_active


@dataclass
class HostPolicy:
    """One politeness-table row (FIXTURES.md §3)."""

    host: str
    delay_s: int = 1
    max_active: int = 8
    robots_disallow: list[str] = field(default_factory=list)
    robots_allow: list[str] = field(default_factory=list)
