"""Micro-batch crawl pipeline — the Spark rebuild of the reference's
dequeue→fetch→scrape→enqueue loop (/root/reference/lib/Loong/Crawler.pm:107-209),
one Structured-Streaming-style incremental batch per iteration
(Trigger.AvailableNow model: each batch reads + atomically commits
snapshot tables, so the run is resumable mid-crawl).

Per-batch dataflow (SURVEY.md §3.1 "Spark rebuild lifecycle"):

  read queued ──eligibility(politeness O2)──▶ two-phase per-host top-k (O4)
     ──global budget (O3)──▶ scheduled(rank) ──▶ crawl_order append
     ──fetch = broadcast join vs web_graph (S4)──▶
        ├─ 200+html ─▶ docs append (S5) + posexplode(out_links) (O6)
        │               ─▶ canonicalize (P1, hybrid JVM/pandas)
        │               ─▶ robots filter ─▶ within-batch dedup (row_number)
        │               ─▶ bloom prefilter + exact anti-join vs seen (F1/O5)
        │               ─▶ priority score (O7) ─▶ new queued entries
        └─ non-200 ─▶ retry at tail, attempt+1 (O8)
     ──▶ commit queued/seen/host_state/shards/metrics + checkpoint.json

Determinism: the total order is (priority, depth, seq); seq is assigned as
``batch_id<<40 | parent_rank<<20 | link_idx`` — a pure JVM expression,
fully parallel, and order-isomorphic to the oracle's contiguous counter
(only seq's ORDER ever matters: it is a tie-break key). Every batch's
output is therefore partition-count-independent and matches
loong_spark.oracle exactly (tested at local[1] == local[32]).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas
from .bloom import BloomFilterManager
from .canon import canonicalize_df, host_col, path_col, url_hash_col
from .config import CrawlConfig, HostPolicy
from .frontier import ORDER_COLS, eligible, priority_col, robots_allowed, schedule
from .cookies import prepare_http
from .media import MEDIA_BLOB, fetch_media, media_manifest
from .robots import parse_robots, politeness_from_robots
from .rules import links_of, parse_pages_bytes, spans_of
from .sitemap import (
    is_sitemap_col,
    sitemap_entries_col,
    sitemap_lines_col,
    sitemap_locs_col,
)
from .store import SnapshotStore

HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("next_eligible", T.LongType(), False),
        T.StructField("seen_count", T.LongType(), False),
    ]
)

#: per-batch host_state updates (frontier_deltas mode): _ne_new is the
#: new politeness clock for scheduled hosts (NULL when the host only
#: gained seen URLs), _added the batch's seen-count increment; the live
#: view folds these onto the base (last _ne_new by batch_id, sum _added)
HOST_STATE_DELTA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("_ne_new", T.LongType(), True),
        T.StructField("_added", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

#: seq bit-field widths: seq = batch_id<<40 | parent_rank<<20 | link_idx,
#: with bit 61 reserved for robots rows. Overflowing any field would
#: SILENTLY corrupt the pinned total order, so the bounds are enforced
#: loudly — parent_rank < 2^20 statically (parent_rank < global_budget,
#: checked at pipeline construction), batch_id < 2^21 per batch (bit 61
#: headroom: (2^21-1)<<40 < 2^61), link_idx < 2^20 per ROW inside the
#: seq expression (a single page emitting ≥2^20 links fails the batch
#: with a clear error instead of reordering the crawl).
SEQ_LINK_BITS = 20
SEQ_RANK_BITS = 20
SEQ_BATCH_MAX = 1 << 21

_CAND = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent", T.StringType(), True),
        T.StructField("parent_rank", T.IntegerType(), False),
        T.StructField("link_idx", T.IntegerType(), False),
        T.StructField("is_retry", T.BooleanType(), False),
        T.StructField("retry_priority", T.DoubleType(), True),
        T.StructField("attempt", T.IntegerType(), False),
        # sitemap-declared <priority> for the cfg.w_sitemap boost;
        # NULL for links/seeds/retries/robots rows (no boost)
        T.StructField("sm_prio", T.DoubleType(), True),
    ]
)


#: per-task build budget for the seen anti-join: on-disk bytes of `seen`
#: one task's hash map may cover (in-memory blowup ~3-5× on top)
SEEN_BUILD_PARTITION_BYTES = 32 << 20


def seen_anti_join(
    cand: DataFrame,
    seen: DataFrame,
    seen_bytes: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """F1 exact backstop: drop candidates whose url_hash is already in
    the seen set. The seen side pins ``shuffle_hash``: a stats
    mis-estimate must NEVER attempt a driver-side broadcast build of
    `seen` (same rationale as bench.run_cycle's dedup leg). The build
    side is necessarily `seen` — Spark's ShuffledHashJoin cannot
    BuildLeft for LEFT ANTI (a left-side hint silently degrades to
    sort-merge, verified on 4.1) — so the per-task map is
    |seen|/n_partitions rows, and n_partitions MUST scale with |seen|
    (ADVICE r4): when ``seen_bytes`` (the store's on-disk metadata
    probe, zero jobs) exceeds what ``min_partitions`` tasks can build
    within SEEN_BUILD_PARTITION_BYTES each, both sides repartition to
    ceil(seen_bytes / budget) — at 10^10 seen rows (~500 GB hashes)
    that's ~16k partitions of ~32 MB builds instead of 32 partitions of
    ~3e8-row maps. Below the threshold the plan is untouched. Audited
    in scripts/explain_audit.py (no Broadcast build of seen even when
    stats say it's tiny)."""
    seen = seen.select("url_hash")
    if seen_bytes is not None and min_partitions is not None:
        need = -(-seen_bytes // SEEN_BUILD_PARTITION_BYTES)
        if need > min_partitions:
            cand = cand.repartition(need, "url_hash")
            seen = seen.repartition(need, "url_hash")
    return cand.join(seen.hint("shuffle_hash"), "url_hash", "left_anti")


def next_eligible_for_scheduled(
    sched: DataFrame,
    politeness: DataFrame,
    batch_id: int,
    default_delay: int,
    pol_small: bool = True,
    fail_hosts: DataFrame | None = None,
    backoff_mult: float = 1.0,
) -> DataFrame:
    """Per-host politeness clocks for this batch's scheduled hosts:
    (host, _ne_new = batch_id + delay). The delay dim is size-aware:
    above broadcast_limit_bytes (``pol_small=False``) the politeness
    SCAN is first restricted to the scheduled hosts — a broadcast SEMI
    join whose broadcast side is ≤ global_budget hosts by construction —
    so the per-batch delay lookup never ships the full dim and never
    shuffles it for a budget-row probe side. Factored out of run_batch
    so both regimes' plans are pinned in scripts/explain_audit.py.

    Adaptive backoff (cfg.backoff_mult > 1): ``fail_hosts`` — this
    batch's hosts with a server-side failure, ⊆ scheduled hosts so its
    broadcast is budget-bounded too — wait floor(delay × mult) instead
    of delay. Memoryless: next batch's clock derives from next batch's
    statuses (oracle.py mirrors exactly)."""
    delay_dim = politeness.select("host", "delay_s")
    if not pol_small:
        delay_dim = delay_dim.join(
            F.broadcast(sched.select("host").distinct()), "host", "semi"
        )
    delay_dim = F.broadcast(delay_dim)
    out = sched.select("host").distinct().join(delay_dim, "host", "left")
    delay = F.coalesce(F.col("delay_s"), F.lit(default_delay))
    if fail_hosts is not None and backoff_mult > 1.0:
        out = out.join(
            F.broadcast(fail_hosts.select("host").distinct().withColumn("_boff", F.lit(True))),
            "host",
            "left",
        )
        delay = F.when(
            F.coalesce(F.col("_boff"), F.lit(False)),
            F.floor(delay * F.lit(backoff_mult)),
        ).otherwise(delay)
    return out.select(
        "host",
        (F.lit(batch_id) + delay).cast("long").alias("_ne_new"),
    )


def frontier_rewrite(
    queued: DataFrame, sched_seqs: DataFrame, new_entries: DataFrame
) -> DataFrame:
    """The frontier_deltas=False fallback: full read-modify-write of the
    frontier — scheduled rows leave via an anti-join on seq whose
    broadcast side is ≤ global_budget rows by construction (a bounded
    pin, not a stats guess), new entries append. Factored out of
    run_batch so the fallback's plan shape is pinned in
    scripts/explain_audit.py."""
    return queued.join(F.broadcast(sched_seqs), "seq", "left_anti").unionByName(
        new_entries
    )


def obs_vals(obs: Observation, **defaults: int) -> dict[str, int]:
    """Read an Observation's metrics with empty-plan resilience.

    When the optimizer / AQE proves the observed branch empty
    (PropagateEmptyRelation), the CollectMetrics node is pruned and the
    JVM observation holds a schemaless empty Row — ``obs.get`` then dies
    in toPyRow. For PASS-THROUGH counts (the metric counts/sums rows the
    caller then keeps) pruning implies zero input rows, so a 0 default
    is exact. For DROPPED-row counts that is NOT true — an AQE re-plan
    after a downstream-empty stage prunes a mid-plan CollectMetrics even
    though rows flowed into the filter (seen on all-duplicate admit
    batches) — so such callers must pass a sentinel default and recount
    (see _admit's obs_robots handling). NULL metrics (SUM over zero
    rows) get the same default treatment."""
    try:
        row = obs.get
    except Exception as e:  # Py4JJavaError from toPyRow on the empty row
        if "toPyRow" not in str(e) and "assertion" not in str(e).lower():
            raise
        return {k: int(v) for k, v in defaults.items()}
    d = row if isinstance(row, dict) else row.asDict()
    return {
        k: int(d[k]) if d.get(k) is not None else int(v) for k, v in defaults.items()
    }


class CrawlPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        cfg: CrawlConfig | None = None,
        cookie_jar=None,
    ):
        self.spark = spark
        if cfg is None:
            # resume path: pick up the ORIGINAL run's knobs (written by
            # bootstrap) instead of silently resetting to defaults
            saved = os.path.join(warehouse, "config.json")
            if os.path.isfile(saved):
                with open(saved) as f:
                    cfg = CrawlConfig.from_dict(json.load(f))
        self.cfg = cfg or CrawlConfig()
        # seq bit-field bounds (see SEQ_* above): fail loudly at
        # construction instead of silently corrupting the total order
        if self.cfg.global_budget >= (1 << SEQ_RANK_BITS):
            raise ValueError(
                f"global_budget {self.cfg.global_budget} >= 2^{SEQ_RANK_BITS} "
                "would overflow the seq parent_rank field and corrupt the "
                "pinned total order — widen SEQ_RANK_BITS before raising it"
            )
        if self.cfg.max_batches >= SEQ_BATCH_MAX:
            raise ValueError(
                f"max_batches {self.cfg.max_batches} >= 2^21 would collide "
                "the seq batch field with the robots bit 61"
            )
        self.store = SnapshotStore(spark, warehouse)
        self.bloom = BloomFilterManager(spark, self.cfg)
        self.warehouse = warehouse
        #: non-delta mode, delta→off flip: set once the stale tombstone
        #: table / outstanding host_state deltas have been folded and
        #: cleared (process-local; re-folding after a resume is
        #: idempotent — the tables are empty then)
        self._tombs_cleared = False
        self._hs_deltas_folded = False
        #: optional cookies.CookieJar — drives the per-host cookie pick
        #: in the `requests` audit table (cfg.log_requests)
        self.cookie_jar = cookie_jar

    # ------------------------------------------------------------------ util
    def _ckpt_path(self) -> str:
        return os.path.join(self.warehouse, "checkpoint.json")

    def _maybe_compact_frontier(self, tomb_rows: int, frontier_size: int) -> int:
        """Fold tombstones into a fresh full `queued` snapshot when the
        dead fraction exceeds frontier_compact_frac; returns the new live
        tombstone count (0 after a fold). Both cardinalities are tracked
        arithmetically — the trigger costs zero jobs."""
        if tomb_rows <= self.cfg.frontier_compact_frac * max(frontier_size, 1):
            return tomb_rows
        self.store.commit("queued", self._read_frontier())
        self.store.commit("dequeued", self.spark.createDataFrame([], schemas.DEQUEUED))
        return 0

    def _write_checkpoint(
        self,
        batch_id: int,
        frontier_size: int | None = None,
        tomb_rows: int | None = None,
    ) -> None:
        tables = [
            "queued", "dequeued", "seen", "host_state", "host_state_delta",
            "docs", "crawl_order", "metrics", "seen_shards", "politeness",
            "raw_pages", "requests", "media_blobs",
        ]
        ck = {
            "batch_id": batch_id,
            # live-frontier + tombstone cardinalities carried forward so
            # delta mode never needs a count job over the frontier (the
            # compaction trigger and join-size decisions read these)
            "frontier_size": frontier_size,
            "tomb_rows": tomb_rows,
            "versions": {t: self.store.current_version(t) for t in tables},
        }
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
        os.replace(tmp, self._ckpt_path())

    def load_checkpoint(self) -> dict | None:
        try:
            with open(self._ckpt_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _seq(self, batch_id: int):
        """seq = batch<<40 | parent_rank<<20 | link_idx (order-isomorphic
        to the oracle's contiguous counter; see module docstring). Field
        overflow is guarded loudly (SEQ_* constants): batch_id here,
        parent_rank at construction (< global_budget), link_idx per row
        inside the expression — a page emitting ≥2^20 links raises
        instead of silently reordering its siblings."""
        if not (0 <= int(batch_id) < SEQ_BATCH_MAX):
            raise ValueError(
                f"batch_id {batch_id} outside [0, 2^21) — seq batch field "
                "would collide with the robots bit 61"
            )
        li = F.col("link_idx").cast("long")
        li_ok = F.when(li < F.lit(1 << SEQ_LINK_BITS), li).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"seq overflow: link_idx >= 2^{SEQ_LINK_BITS} ("),
                    F.col("link_idx").cast("string"),
                    F.lit(") — one page emitted too many links"),
                )
            )
        )
        return (
            F.lit(int(batch_id) << 40)
            + F.shiftleft(F.col("parent_rank").cast("long"), 20)
            + li_ok
        ).cast("long")

    # -------------------------------------------------------------- bootstrap
    def bootstrap(
        self,
        web_graph: DataFrame,
        politeness: list[HostPolicy] | DataFrame,
        seeds: list[str],
    ) -> None:
        """Seed injection (S1, /root/reference/lib/Loong/Crawler.pm:84-105):
        batch 0 enqueues the seed list in seed_order through the same
        robots→dedup→priority path links use."""
        st = self.store
        cfgp = os.path.join(self.warehouse, "config.json")
        with open(cfgp + ".tmp", "w") as f:
            json.dump(self.cfg.to_dict(), f)
        os.replace(cfgp + ".tmp", cfgp)
        st.commit("web_graph", web_graph)
        if not isinstance(politeness, DataFrame):
            politeness = self.spark.createDataFrame(
                [
                    (p.host, p.delay_s, p.max_active, p.robots_disallow, p.robots_allow)
                    for p in politeness
                ],
                schemas.POLITENESS,
            )
        st.commit("politeness", politeness)

        cand = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], "url string, seed_order int"
        ).select(
            F.col("url"),
            url_hash_col(F.col("url")).alias("url_hash"),
            host_col(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("parent"),
            F.lit(0).alias("parent_rank"),
            F.col("seed_order").alias("link_idx"),
            F.lit(False).alias("is_retry"),
            F.lit(None).cast("double").alias("retry_priority"),
            F.lit(0).alias("attempt"),
            F.lit(None).cast("double").alias("sm_prio"),
        )
        empty_hs = self.spark.createDataFrame([], HOST_STATE)
        new_entries, new_seen, stats = self._admit(cand, empty_hs, batch_id=0)

        st.commit("queued", new_entries)
        st.commit("dequeued", self.spark.createDataFrame([], schemas.DEQUEUED))
        st.commit("seen", new_seen)
        st.commit(
            "host_state",
            new_seen.groupBy("host").count().select(
                "host", F.lit(0).cast("long").alias("next_eligible"),
                F.col("count").cast("long").alias("seen_count"),
            ),
        )
        st.commit("host_state_delta", self.spark.createDataFrame([], HOST_STATE_DELTA))
        st.commit("docs", self.spark.createDataFrame([], schemas.DOCS))
        st.commit("crawl_order", self.spark.createDataFrame([], schemas.CRAWL_ORDER))
        st.commit("metrics", self.spark.createDataFrame([], schemas.METRICS))
        shards0 = self.spark.createDataFrame([], schemas.SEEN_SHARDS)
        st.commit("seen_shards", self.bloom.updated_shards(shards0, self.bloom.hashed(new_seen), 0))
        self._write_checkpoint(0, frontier_size=stats["n_entries"], tomb_rows=0)

    # ----------------------------------------------------- admission pipeline
    def _admit(
        self,
        cand: DataFrame,
        host_state: DataFrame,
        batch_id: int,
        hs_broadcast: bool = True,
        pol_broadcast: bool = True,
    ) -> tuple[DataFrame, DataFrame, dict]:
        """Robots → within-batch dedup → bloom+exact seen anti-join →
        priority → seq. Returns (new queued entries, seen additions, stats).
        Retries bypass robots/dedup/priority but share seq numbering.

        MATERIALIZES the result to the store's _work area (cuts lineage);
        every count the caller needs rides the SAME write action as
        ``Observation`` metrics — zero extra driver jobs."""
        st = self.store
        # robots-rule dim: size-aware like host_state — the rule arrays
        # make this the WIDEST per-host table (multi-GB at 10^7 hosts),
        # so above broadcast_limit_bytes the candidates (bounded per
        # batch) shuffle-hash join it on host instead
        pol = st.read("politeness", schemas.POLITENESS).select(
            "host", "robots_disallow", "robots_allow"
        )
        pol = F.broadcast(pol) if pol_broadcast else pol.hint("shuffle_hash")

        links = cand.filter(~F.col("is_retry")).withColumn("is_robots", F.lit(False))
        retries = cand.filter(F.col("is_retry")).withColumn("is_robots", F.lit(False))

        if self.cfg.fetch_robots:
            # host discovery → /robots.txt candidate (one per candidate
            # host, keyed to the FIRST triggering link so ordering and
            # the per-host rank window are deterministic); the seen
            # anti-join below makes this once-per-host across the crawl.
            # Derived from the PRE-rules-filter link set: a link the
            # rules drop still reveals its host.
            rob = (
                links.groupBy("host")
                .agg(F.min(F.struct("parent_rank", "link_idx")).alias("_t"))
                .select(
                    F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt")).alias("url"),
                    "host",
                    F.col("_t.parent_rank").alias("parent_rank"),
                    F.col("_t.link_idx").alias("link_idx"),
                )
                .select(
                    "url",
                    url_hash_col(F.col("url")).alias("url_hash"),
                    "host",
                    F.lit(0).alias("depth"),
                    F.lit(None).cast("string").alias("parent"),
                    F.col("parent_rank").cast("int"),
                    F.col("link_idx").cast("int"),
                    F.lit(False).alias("is_retry"),
                    F.lit(None).cast("double").alias("retry_priority"),
                    F.lit(0).alias("attempt"),
                    F.lit(None).cast("double").alias("sm_prio"),
                    F.lit(True).alias("is_robots"),
                )
            )
            links = links.unionByName(rob)

        # robots (RFC 9309 most-specific-match allow/disallow incl.
        # wildcards, checked before seen —
        # excluded URLs never enter the seen set; /robots.txt itself is
        # exempt). The dropped-count is observed in-flight on the commit
        # action below, not recomputed.
        obs_robots = Observation()
        flagged = (
            links.join(pol, "host", "left")
            .withColumn("_path", path_col(F.col("url")))
            .withColumn(
                "_allowed",
                F.col("is_robots")
                | robots_allowed(F.col("_path"), F.col("robots_disallow"), F.col("robots_allow")),
            )
        )
        links = (
            flagged.observe(
                obs_robots,
                F.coalesce(
                    F.sum(F.when(~F.col("_allowed"), 1).otherwise(0)), F.lit(0)
                ).alias("robots_dropped"),
            )
            .filter(F.col("_allowed"))
            .drop("robots_disallow", "robots_allow", "_path", "_allowed")
        )

        # within-batch dedup: first enqueue attempt wins (mirrors the
        # test-and-set ordering of Filter.pm:9-27 applied sequentially).
        # Expressed as min(struct(order_key..., payload...)) — a hash agg
        # with map-side partial combine (no per-partition sort, unlike a
        # row_number window); (parent_rank, link_idx) is unique per row so
        # the pick is total-order deterministic.
        rest = [c for c in links.columns if c not in ("url_hash", "parent_rank", "link_idx")]
        links = (
            links.groupBy("url_hash")
            .agg(F.min(F.struct("parent_rank", "link_idx", *rest)).alias("_w"))
            .select("url_hash", "_w.*")
        )

        # seen filter: bloom prefilter + exact anti-join backstop (F1).
        # broadcast mode probes a driver-loaded snapshot; cogroup mode
        # (the 10^10 path) joins candidates with their shard's bitset —
        # no driver collect (bloom.maybe_seen_cogroup). The exact
        # anti-join pins shuffle_hash on the seen side: at 10^10 seen
        # rows a stats mis-estimate must never attempt a driver-side
        # broadcast build of `seen` (same rationale as bench.run_cycle).
        hashed = self.bloom.hashed(links)
        if self.cfg.use_bloom:
            if self.bloom.mode == "cogroup":
                hashed = self.bloom.maybe_seen_cogroup(
                    hashed, st.read("seen_shards", schemas.SEEN_SHARDS)
                )
            else:
                hashed = self.bloom.maybe_seen_col(hashed)
            fast_unseen = hashed.filter(~F.col("maybe_seen"))
            maybe = hashed.filter(F.col("maybe_seen"))
            checked = seen_anti_join(
                maybe, st.read("seen", schemas.SEEN),
                seen_bytes=st.table_bytes("seen"),
                min_partitions=self.cfg.shuffle_partitions,
            )
            winners = fast_unseen.unionByName(checked).drop("maybe_seen")
        else:
            winners = seen_anti_join(
                hashed, st.read("seen", schemas.SEEN),
                seen_bytes=st.table_bytes("seen"),
                min_partitions=self.cfg.shuffle_partitions,
            )

        # priority (O7): prior per-host seen count = base + rank-within-batch.
        # Robots rows share their trigger's (parent_rank, link_idx), so the
        # is_robots DESC tie-break pins them FIRST in the per-host rank —
        # same order the oracle counts them in. Join strategy is
        # size-aware like frontier.eligible: candidates shuffle by host
        # for the rank window anyway, so above broadcast_limit_bytes the
        # exchange is shared with a shuffle-hash join.
        hs = host_state.select("host", "seen_count")
        hs = F.broadcast(hs) if hs_broadcast else hs.hint("shuffle_hash")
        w_host = Window.partitionBy("host").orderBy(
            "parent_rank", "link_idx", F.col("is_robots").desc()
        )
        winners = (
            winners.join(hs, "host", "left")
            .withColumn(
                "_prior",
                F.coalesce(F.col("seen_count"), F.lit(0)) + F.row_number().over(w_host) - 1,
            )
            .withColumn(
                "priority",
                # robots fetches jump every content URL: priority -1 < any
                # w_d*depth + w_h*log1p(...) score (both weights ≥ 0)
                F.when(F.col("is_robots"), F.lit(-1.0)).otherwise(
                    priority_col(
                        F.col("depth"), F.col("_prior"), self.cfg,
                        F.col("sm_prio") if self.cfg.w_sitemap else None,
                    )
                ),
            )
            .drop("seen_count", "_prior", "_bh1", "_bh2", "shard_id")
        )

        base_seq = self._seq(batch_id)
        new_entries = winners.unionByName(
            retries.withColumn("priority", F.col("retry_priority"))
        ).select(
            "url", "url_hash", "host", "depth", "priority",
            # robots rows get bit 61 set: unique vs their trigger (which
            # shares parent_rank/link_idx) while keeping the same relative
            # order among robots rows — seq is only ever a tie-break key
            F.when(F.col("is_robots"), F.lit(1 << 61) + base_seq)
            .otherwise(base_seq)
            .alias("seq"),
            "parent",
            F.lit("queued").alias("state"),
            "attempt",
            F.lit(batch_id).cast("long").alias("enqueued_batch"),
            "is_robots",
        )

        obs_new = Observation()
        new_entries = new_entries.observe(
            obs_new,
            F.coalesce(
                F.sum(
                    F.when((F.col("attempt") == 0) & ~F.col("is_robots"), 1).otherwise(0)
                ), F.lit(0),
            ).alias("n_new"),
            F.count(F.lit(1)).alias("n_entries"),
        )
        st.commit("_work_new_entries", new_entries)  # the ONE action here
        new_entries = st.read("_work_new_entries")
        new_seen = new_entries.filter(F.col("attempt") == 0).select(
            "url_hash", "host", F.lit(batch_id).cast("long").alias("seen_batch")
        )
        stats = obs_vals(obs_new, n_new=0, n_entries=0)
        # obs_robots counts DROPPED rows, so the obs_vals zero-default is
        # NOT exact for it: when a batch admits zero entries, AQE's
        # empty-relation re-plan prunes the mid-plan CollectMetrics even
        # though candidate rows flowed INTO the filter (the pruned-means-
        # empty-input rule holds only for pass-through counts). Detect
        # the pruned case and recount exactly from the materialized
        # candidate set — O(batch), and only on all-duplicate batches.
        rd = obs_vals(obs_robots, robots_dropped=-1)["robots_dropped"]
        if rd < 0:
            rd = flagged.filter(~F.col("_allowed")).count()
        stats["robots_dropped"] = rd
        return new_entries.drop("is_robots"), new_seen, stats

    def _read_frontier(self) -> DataFrame:
        """Live frontier view: the `queued` table MINUS the `dequeued`
        tombstones. The anti-join runs whenever the tombstone table
        EXISTS — not only in delta mode — so flipping frontier_deltas
        off against a delta-mode warehouse cannot resurrect dequeued
        entries. The tombstone side broadcasts while small (bounded by
        frontier_compact_frac × frontier between folds) and degrades to
        a shuffle-hash join past broadcast_limit_bytes."""
        q = self.store.read("queued", schemas.FRONTIER)
        if not self.store.exists("dequeued"):
            return q
        tombs = self.store.read("dequeued", schemas.DEQUEUED)
        if self.store.table_bytes("dequeued") <= self.cfg.broadcast_limit_bytes:
            tombs = F.broadcast(tombs)
        else:
            tombs = tombs.hint("shuffle_hash")
        return q.join(tombs, "seq", "left_anti")

    def _read_host_state(self) -> DataFrame:
        """Live host_state. Delta mode: every host has exactly one base
        row (new hosts append a zero row on first sight), and per-batch
        updates fold on — next_eligible = last non-NULL _ne_new by
        batch_id, seen_count = base + Σ_added. The fold side is bounded
        by frontier_compact_every batches of O(touched hosts) rows; it
        broadcasts while under broadcast_limit_bytes and shuffle-hash
        joins above; compaction folds it into the base."""
        base = self.store.read("host_state", HOST_STATE)
        if not self.cfg.frontier_deltas:
            return base
        return self._fold_host_state(base)

    def _fold_host_state(self, base: DataFrame) -> DataFrame:
        """base + outstanding host_state_delta rows → the live view (the
        delta-mode read path, also used ONCE at a delta→off flip so
        pending clocks/counts aren't silently dropped)."""
        d = self.store.read("host_state_delta", HOST_STATE_DELTA)
        fold_small = (
            self.store.table_bytes("host_state_delta") <= self.cfg.broadcast_limit_bytes
        )
        fold = d.groupBy("host").agg(
            F.max(
                F.struct(
                    F.coalesce(
                        F.when(F.col("_ne_new").isNotNull(), F.col("batch_id")),
                        F.lit(-1),
                    ).alias("b"),
                    F.col("_ne_new").alias("v"),
                )
            ).alias("_ne"),
            F.sum("_added").alias("_add"),
        )
        fold = F.broadcast(fold) if fold_small else fold.hint("shuffle_hash")
        return base.join(fold, "host", "left").select(
            "host",
            F.coalesce(F.col("_ne.v"), F.col("next_eligible")).alias("next_eligible"),
            (F.col("seen_count") + F.coalesce(F.col("_add"), F.lit(0))).alias("seen_count"),
        )

    # ------------------------------------------------------------- one batch
    def run_batch(self, batch_id: int) -> dict:
        st, cfg = self.store, self.cfg
        if (
            not cfg.frontier_deltas
            and st.exists("host_state_delta")
            and not self._hs_deltas_folded
        ):
            # delta→off flip (ADVICE r5): per-batch politeness clocks /
            # seen counts may still sit unfolded in host_state_delta —
            # the non-delta read path only sees the base, so fold them
            # into it ONCE or the flip silently rewinds host state.
            # (isEmpty: one first-partition probe per process, so pure
            # non-delta warehouses — whose delta table exists but is
            # empty from bootstrap — never pay the O(hosts) rewrite.)
            self._hs_deltas_folded = True
            if not st.read("host_state_delta", HOST_STATE_DELTA).isEmpty():
                st.commit(
                    "host_state",
                    self._fold_host_state(st.read("host_state", HOST_STATE)),
                )
                st.commit(
                    "host_state_delta",
                    self.spark.createDataFrame([], HOST_STATE_DELTA),
                )
        queued = self._read_frontier()
        host_state = self._read_host_state()
        politeness = st.read("politeness", schemas.POLITENESS)
        # size-aware host_state strategy (metadata probe, zero jobs):
        # broadcast the per-host state while its on-disk bytes stay under
        # the limit; equi-join above it (10^7+ known hosts)
        hs_small = (
            st.table_bytes("host_state") + st.table_bytes("host_state_delta")
            <= cfg.broadcast_limit_bytes
        )
        pol_small = st.table_bytes("politeness") <= cfg.broadcast_limit_bytes

        prev_size = None
        tomb_rows = 0
        if cfg.frontier_deltas:
            ck = self.load_checkpoint()
            prev_size = ck.get("frontier_size") if ck else None
            if prev_size is None:  # pre-delta checkpoint: count once
                prev_size = queued.count()
            tomb_rows = ck.get("tomb_rows") if ck else None
            if tomb_rows is None:  # pre-r4 checkpoint: count once
                tomb_rows = st.read("dequeued", schemas.DEQUEUED).count()

        robots_dropped_q = None  # delta-mode tombstones for rule drops
        if cfg.fetch_robots:
            # rules that arrived AFTER a URL was enqueued enforce at
            # schedule time: newly-disallowed rows drop out of the
            # frontier permanently (full-rewrite mode commits the
            # filtered set below; delta mode tombstones their seqs).
            # /robots.txt itself is always fetchable.
            rules = politeness.select("host", "robots_disallow", "robots_allow")
            # size-aware like host_state: above the limit the frontier
            # shuffle-hash joins the rule dim on host (the exchange is
            # shared with the eligibility join on the same key)
            rules = F.broadcast(rules) if pol_small else rules.hint("shuffle_hash")
            with_rules = (
                queued.join(rules, "host", "left")
                .withColumn("_path", path_col(F.col("url")))
                .withColumn(
                    "_ok",
                    (F.col("_path") == "/robots.txt")
                    | robots_allowed(
                        F.col("_path"), F.col("robots_disallow"), F.col("robots_allow")
                    ),
                )
            )
            if cfg.frontier_deltas:
                robots_dropped_q = with_rules.filter(~F.col("_ok")).select("seq")
            queued = with_rules.filter(F.col("_ok")).drop(
                "robots_disallow", "robots_allow", "_path", "_ok"
            )

        # -- schedule (O1-O4) --------------------------------------------
        elig = eligible(queued, host_state, batch_id, broadcast_state=hs_small)
        sched = schedule(elig, politeness, cfg, broadcast_pol=pol_small)
        obs_sched = Observation()
        sched = sched.observe(obs_sched, F.count(F.lit(1)).alias("n"))
        st.commit("_work_scheduled", sched)
        n_sched = obs_vals(obs_sched, n=0)["n"]
        sched = st.read("_work_scheduled")

        st.append(
            "crawl_order",
            sched.select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.col("rank").cast("int").alias("within_batch_rank"),
                "url",
            ),
            schemas.CRAWL_ORDER,
        )

        # -- delta-mode removals: ONE O(removed)-write tombstone append
        # per batch (scheduled seqs + robots-rule drops); the oracle drops
        # rule-disallowed entries at the start of EVERY batch, so delta
        # mode tombstones them even on empty-schedule batches
        n_qdropped = 0
        if cfg.frontier_deltas:
            tombs = sched.select("seq")
            obs_drop = None
            if robots_dropped_q is not None:
                obs_drop = Observation()
                tombs = tombs.unionByName(
                    robots_dropped_q.observe(obs_drop, F.count(F.lit(1)).alias("n"))
                )
            if robots_dropped_q is not None or n_sched > 0:
                st.append("dequeued", tombs, schemas.DEQUEUED)
            if obs_drop is not None:
                n_qdropped = obs_vals(obs_drop, n=0)["n"]
            prev_size -= n_qdropped
            tomb_rows += n_qdropped + n_sched

        if n_sched == 0:
            fsize = prev_size if cfg.frontier_deltas else queued.count()
            if cfg.frontier_deltas:
                tomb_rows = self._maybe_compact_frontier(tomb_rows, fsize)
            elif st.exists("dequeued") and not self._tombs_cleared:
                # delta→off flip, nothing scheduled: live tombstones may
                # remain and their count is unknown — record None so a
                # later delta-mode resume counts once instead of trusting
                # a pinned 0 (ADVICE r5)
                tomb_rows = None
            m = self._metrics_row(batch_id, 0, 0, 0, 0, 0, 0, frontier_size=fsize)
            self._write_checkpoint(batch_id, frontier_size=fsize, tomb_rows=tomb_rows)
            return m

        # -- S4 request assembly audit (prepare_http, Crawler.pm:267-297):
        # log the exact UA/cookie headers the fetch stage sends. The host
        # collect is bounded by the global budget (sched is materialized
        # and capped), and the jar snapshot is politeness-table
        # cardinality — both driver-side O(live hosts), like politeness.
        if cfg.log_requests:
            snap = None
            if self.cookie_jar is not None:
                hosts = [r[0] for r in sched.select("host").distinct().collect()]
                snap = self.cookie_jar.snapshot(hosts)
            reqs = prepare_http(
                sched.select("url", "host", "rank"), snap,
                ua_kind=cfg.ua_kind, proxy_pools=cfg.proxy_pools,
            )
            st.append(
                "requests",
                reqs.select(
                    F.lit(batch_id).cast("long").alias("batch_id"),
                    F.col("rank").cast("int").alias("within_batch_rank"),
                    "url", "host", "ua", "cookie", "proxy",
                ),
                schemas.REQUESTS,
            )

        # -- fetch (S4): broadcast the small scheduled side into the scan;
        # docs/failed counts ride the commit action as observed metrics.
        # parse mode (web_graph carries raw `body` bytes) runs the
        # production fetch→decode→parse path; span mode joins pre-parsed
        # spans/links (the fetch SIMULATOR shape).
        graph = st.read("web_graph")
        parse_mode = "body" in graph.columns
        page_cols = ["body"] if parse_mode else ["body_spans", "out_links"]
        is_html = (F.col("status") == 200) & F.col("content_type").startswith("text/html")
        is_failed = F.col("status").isNull() | (F.col("status") != 200)
        is_robots_row = path_col(F.col("url")) == "/robots.txt"
        # F3 precedes F2: an empty-BODIED 200 response fails regardless of
        # content type (Crawler.pm:238-240 runs before the :241-252 gate);
        # html empties are counted separately as n_html - n_docs
        empty_body = (
            F.length("body") == 0 if parse_mode else F.size("body_spans") == 0
        )
        is_empty_nonhtml = (
            (F.col("status") == 200)
            & ~F.col("content_type").startswith("text/html")
            & empty_body
        )
        obs_fetch = Observation()
        fetched = (
            F.broadcast(sched)
            .join(graph.select("url", "status", "content_type", *page_cols), "url", "left")
            .observe(
                obs_fetch,
                F.coalesce(F.sum(F.when(is_html, 1).otherwise(0)), F.lit(0)).alias("n_html"),
                F.coalesce(F.sum(F.when(is_failed, 1).otherwise(0)), F.lit(0)).alias("n_failed"),
                F.coalesce(
                    F.sum(F.when(is_empty_nonhtml, 1).otherwise(0)), F.lit(0)
                ).alias("n_empty_nonhtml"),
                F.coalesce(
                    F.sum(
                        F.when((F.col("status") == 200) & is_robots_row, 1).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_robots_ok"),
            )
        )
        st.commit("_work_fetched", fetched)
        fvals = obs_vals(obs_fetch, n_html=0, n_failed=0, n_empty_nonhtml=0, n_robots_ok=0)
        n_html, n_failed = fvals["n_html"], fvals["n_failed"]
        fetched = st.read("_work_fetched")

        ok = fetched.filter(F.col("status") == 200)
        html = ok.filter(F.col("content_type").startswith("text/html"))  # F2 gate
        failed = fetched.filter(F.col("status").isNull() | (F.col("status") != 200))

        # S6 raw-page cache (cache_resouce, Crawler.pm:307-323): exact
        # fetched bytes per 200 response, keyed by url_hash=md5(url) like
        # the reference's cache files — O(batch) delta append
        if cfg.cache_raw_pages and parse_mode:
            st.append(
                "raw_pages",
                ok.select(
                    "url_hash", "url", "content_type", "body",
                    F.lit(batch_id).cast("long").alias("fetched_batch"),
                ),
                schemas.RAW_PAGES,
            )

        # F3/F7: empty-body / scraped-empty pages are non-retry failures —
        # no doc, links NOT followed (Crawler.pm:238-251). In span mode
        # emptiness is size(body_spans)==0; in parse mode it falls out of
        # the inner join with the parser's span output.
        if parse_mode:
            # U1/U2 production path: decode (P4 charset sniff) + parse via
            # one Arrow-batched mapInPandas, then re-join page metadata.
            # Materialized once — spans_of and links_of both consume it.
            parsed = parse_pages_bytes(html.select("url", "body", "content_type"))
            st.commit("_work_parsed", parsed)
            parsed = st.read("_work_parsed")
            # the span aggregate (groupBy + ordered collect_list) runs
            # ONCE and is materialized: docs and the F7 semi-join both
            # read it back — O(batch) extra write, one fewer span
            # aggregation job per batch
            st.commit("_work_spans", spans_of(parsed))
            spans_agg = st.read("_work_spans")
            docs_new = (
                html.select("url", "url_hash", "host", "parent")
                .join(spans_agg, "url")  # inner: 0-span pages fail out
                .select(
                    F.col("url_hash").alias("doc_id"),
                    "spans", "url", "host", "parent",
                    F.lit(batch_id).cast("long").alias("fetched_batch"),
                )
            )
            raw_links = (
                links_of(parsed)
                .join(
                    html.select(
                        F.col("url").alias("parent"),
                        F.col("rank").alias("parent_rank"),
                        (F.col("depth") + 1).alias("depth"),
                    ),
                    "parent",
                )
                # drop links found on scraped-empty pages (F7 croaks first)
                .join(
                    spans_agg.select(F.col("url").alias("parent")),
                    "parent",
                    "semi",
                )
            )
        else:
            html_ok = html.filter(F.size("body_spans") > 0)
            docs_new = html_ok.select(
                F.col("url_hash").alias("doc_id"),
                F.col("body_spans").alias("spans"),
                "url", "host", "parent",
                F.lit(batch_id).cast("long").alias("fetched_batch"),
            )
            raw_links = html_ok.select(
                F.col("url").alias("parent"),
                F.col("rank").alias("parent_rank"),
                (F.col("depth") + 1).alias("depth"),
                F.posexplode("out_links").alias("link_idx", "href"),
            )
        # <a href> links carry no sitemap priority (cfg.w_sitemap boost)
        raw_links = raw_links.withColumn("sm_prio", F.lit(None).cast("double"))

        # -- sitemaps-protocol discovery (cfg.fetch_sitemaps): fetched
        # urlset/sitemapindex XML emits its <loc> URLs, and (with
        # fetch_robots) a fetched robots file emits its `Sitemap:` lines
        # — both as ordinary rows of the raw-link stream (parent = the
        # sitemap/robots URL, link_idx = document/line order), so they
        # ride the existing canonicalize → dedup → robots-filter →
        # priority path with zero new shuffles or state. Child sitemaps
        # of an index are just URLs: re-fetched, re-gated by content
        # next round, cycles dedup away at the URL-seen filter. All
        # extraction is per-row codegen regex (sitemap.py); the oracle
        # twin mirrors both branches (oracle.py run_batch).
        if cfg.fetch_sitemaps:
            # try_element_at: empty-span pages (F3 empties) must yield
            # NULL here, not an ANSI out-of-bounds error — the robots
            # refresh below can use plain element_at only because its
            # input is pre-filtered to 200s with a body. In parse mode
            # the decode hides behind a lazy CASE on the content type:
            # gbk/latin-1 HTML bodies must never reach the UTF-8 decode
            # (ANSI malformed-coding error), while a non-UTF-8 sitemap
            # fails LOUDLY — the protocol mandates UTF-8 sitemaps.
            body_txt = (
                F.when(
                    F.col("content_type").rlike("(?i)xml") | is_robots_row,
                    F.decode(F.col("body"), "UTF-8"),
                )
                if parse_mode
                else F.try_element_at(F.col("body_spans"), F.lit(1))["text"]
            )
            # w_sitemap boost: per-<url>-block extraction so each loc
            # rides with ITS declared <priority> (identical loc sequence
            # on well-formed files); boost off keeps the locs-only path
            # bit-for-bit. Robots `Sitemap:` lines never carry one.
            use_entries = cfg.w_sitemap > 0
            nul = F.lit(None).cast("double")
            xml_ext = (
                sitemap_entries_col(body_txt)
                if use_entries
                else sitemap_locs_col(body_txt)
            )
            sm = ok.filter(~is_robots_row).filter(
                is_sitemap_col(F.col("content_type"), body_txt)
            ).select("url", "rank", "depth", xml_ext.alias("_locs"))
            if cfg.fetch_robots:
                lines = sitemap_lines_col(body_txt)
                if use_entries:
                    lines = F.transform(
                        lines,
                        lambda v: F.struct(v.alias("href"), nul.alias("sm_prio")),
                    )
                sm = sm.unionByName(
                    ok.filter(is_robots_row).select(
                        "url", "rank", "depth", lines.alias("_locs")
                    )
                )
            exploded = sm.select(
                F.col("url").alias("parent"),
                F.col("rank").alias("parent_rank"),
                (F.col("depth") + 1).alias("depth"),
                F.posexplode("_locs").alias("link_idx", "_e"),
            )
            exploded = (
                exploded.select(
                    "parent", "parent_rank", "depth", "link_idx",
                    F.col("_e.href").alias("href"),
                    F.col("_e.sm_prio").alias("sm_prio"),
                )
                if use_entries
                else exploded.withColumnRenamed("_e", "href").withColumn(
                    "sm_prio", nul
                )
            )
            raw_links = raw_links.unionByName(exploded)

        # -- docs (S5): idempotent by doc_id; append (doc_id unique by F1).
        # Written hash-partitioned on (host, salt): docs of one site
        # cluster into few files for downstream per-site scans, while the
        # salt splits hot domains (Zipf head) across up to n_salts
        # partitions so no single writer task absorbs a 10^7-doc host.
        # Hash-clustering, NOT a dir-per-host layout (10^7 dirs would
        # drown the metadata layer).
        obs_docs = Observation()
        docs_out = docs_new.observe(obs_docs, F.count(F.lit(1)).alias("n")).repartition(
            cfg.shuffle_partitions,
            F.col("host"),
            F.pmod(F.xxhash64("doc_id"), F.lit(cfg.n_salts)),
        )
        st.append("docs", docs_out, schemas.DOCS)
        n_docs = obs_vals(obs_docs, n=0)["n"]

        # -- S10 media sink: dedup this batch's media refs, anti-join the
        # already-downloaded set, fetch only the new ones (Lite.pm's
        # inline per-asset GET re-downloads per referring page — wrong
        # shape at scale; see media.py). O(new distinct assets) per batch.
        if cfg.download_media:
            docs_b = st.read("docs", schemas.DOCS).filter(
                F.col("fetched_batch") == batch_id
            )
            already = (
                st.read("media_blobs", MEDIA_BLOB)
                if st.exists("media_blobs")
                else None
            )
            st.append(
                "media_blobs",
                fetch_media(media_manifest(docs_b), already),
                MEDIA_BLOB,
            )
        n_empty = n_html - n_docs + fvals["n_empty_nonhtml"]

        # -- links (O6): canonicalize (P1) --------------------------------
        links = (
            canonicalize_df(raw_links, base_col="parent", href_col="href", out_col="url")
            .filter(F.col("url") != "")
            .select(
                "url",
                url_hash_col(F.col("url")).alias("url_hash"),
                host_col(F.col("url")).alias("host"),
                F.col("depth").cast("int"),
                "parent",
                F.col("parent_rank").cast("int"),
                F.col("link_idx").cast("int"),
                F.lit(False).alias("is_retry"),
                F.lit(None).cast("double").alias("retry_priority"),
                F.lit(0).alias("attempt"),
                "sm_prio",
            )
        )
        obs_links = Observation()
        links = links.observe(obs_links, F.count(F.lit(1)).alias("n"))
        st.commit("_work_links", links)
        n_links = obs_vals(obs_links, n=0)["n"]
        links = st.read("_work_links")

        # -- retries (O8) — failed robots fetches are never retried (the
        # host simply stays on default politeness)
        if cfg.fetch_robots:
            failed = failed.filter(~is_robots_row)
        retries = failed.filter(F.col("attempt") + 1 < cfg.max_attempts).select(
            "url", "url_hash", "host", F.col("depth").cast("int"), "parent",
            F.col("rank").cast("int").alias("parent_rank"),
            F.lit(0).cast("int").alias("link_idx"),
            F.lit(True).alias("is_retry"),
            F.col("priority").alias("retry_priority"),
            (F.col("attempt") + 1).cast("int").alias("attempt"),
            F.lit(None).cast("double").alias("sm_prio"),
        )

        # -- admit new frontier entries ------------------------------------
        cand = links.unionByName(retries)
        new_entries, new_seen, stats = self._admit(
            cand, host_state, batch_id, hs_broadcast=hs_small, pol_broadcast=pol_small
        )
        n_deduped = n_links - stats["n_new"] - stats["robots_dropped"]

        # -- state updates ---------------------------------------------------
        if cfg.frontier_deltas:
            # O(batch) frontier write: new entries append (tombstones for
            # this batch's removals were already appended above); the
            # live size is pure arithmetic — no count job
            st.append("queued", new_entries.select(*schemas.FRONTIER.names), schemas.FRONTIER)
            frontier_size = prev_size - n_sched + stats["n_entries"]
        else:
            obs_q = Observation()
            queued_next = frontier_rewrite(
                queued, sched.select("seq"), new_entries
            ).observe(obs_q, F.count(F.lit(1)).alias("n"))
            st.commit("queued", queued_next)
            frontier_size = obs_vals(obs_q, n=0)["n"]
            if st.exists("dequeued") and not self._tombs_cleared:
                # delta→off flip (ADVICE r5): queued_next derives from the
                # tombstone-folded live view, so this commit baked the
                # tombstones into the snapshot — clear them ONCE so later
                # _read_frontier calls anti-join an empty side instead of
                # the stale table forever, and the checkpoint's
                # tomb_rows=0 below is true rather than pinned
                st.commit(
                    "dequeued", self.spark.createDataFrame([], schemas.DEQUEUED)
                )
                self._tombs_cleared = True
            tomb_rows = 0
        st.append("seen", new_seen, schemas.SEEN)

        # host_state: politeness clocks + seen counts. The delay dim is
        # size-aware (see next_eligible_for_scheduled): above
        # broadcast_limit_bytes the politeness scan is semi-restricted to
        # this batch's ≤-budget scheduled hosts — never a full-dim
        # broadcast, never a dim shuffle for a budget-row probe side.
        fail_hosts = None
        if cfg.backoff_mult > 1.0:
            # server-side failures only (unreachable / 5xx): 3xx/4xx are
            # page-level verdicts, not host distress
            fail_hosts = fetched.filter(
                F.col("status").isNull() | (F.col("status") >= 500)
            ).select("host")
        sched_hosts = next_eligible_for_scheduled(
            sched, politeness, batch_id, cfg.default_delay, pol_small=pol_small,
            fail_hosts=fail_hosts, backoff_mult=cfg.backoff_mult,
        )
        win_counts = new_seen.groupBy("host").count().select(
            "host", F.col("count").cast("long").alias("_added")
        )
        if cfg.frontier_deltas:
            # O(touched hosts) writes: first-seen hosts append a zero
            # base row (scheduled hosts always have one — they were
            # admitted in an earlier batch), then the batch's updates
            # append to the delta table the live view folds on
            st.append(
                "host_state",
                win_counts.join(
                    st.read("host_state", HOST_STATE).select("host"),
                    "host",
                    "left_anti",
                ).select(
                    "host",
                    F.lit(0).cast("long").alias("next_eligible"),
                    F.lit(0).cast("long").alias("seen_count"),
                ),
                HOST_STATE,
            )
            st.append(
                "host_state_delta",
                sched_hosts.join(win_counts, "host", "full").select(
                    "host",
                    F.col("_ne_new").cast("long"),
                    F.coalesce(F.col("_added"), F.lit(0)).cast("long").alias("_added"),
                    F.lit(batch_id).cast("long").alias("batch_id"),
                ),
                HOST_STATE_DELTA,
            )
        else:
            hs_next = (
                host_state.join(sched_hosts, "host", "full")
                .join(win_counts, "host", "full")
                .select(
                    "host",
                    F.coalesce(F.col("_ne_new"), F.col("next_eligible"), F.lit(0)).alias("next_eligible"),
                    (F.coalesce(F.col("seen_count"), F.lit(0)) + F.coalesce(F.col("_added"), F.lit(0)))
                    .alias("seen_count"),
                )
            )
            st.commit("host_state", hs_next)

        # bloom shards: merge this batch's new hashes into the TOUCHED
        # shards only and delta-write just those (merge_keyed) — write
        # volume is O(touched bitsets) per batch, not O(all bitsets)
        # (~12.5 GB/batch at 10^10 URLs under a full rewrite). The
        # touched-id collect is ≤ n_shards ints off the already-
        # materialized new_seen.
        new_hashed = self.bloom.hashed(new_seen)
        touched = sorted(
            r[0] for r in new_hashed.select("shard_id").distinct().collect()
        )
        if touched:
            shards = st.read("seen_shards", schemas.SEEN_SHARDS)
            upd = self.bloom.updated_shards(
                shards.filter(F.col("shard_id").isin(touched)), new_hashed, batch_id
            )
            st.merge_keyed("seen_shards", upd, "shard_id", touched)

        # -- robots responses → politeness refresh (fetch_robots mode) ----
        # Parsed LAST so everything above this point used the rules known
        # at batch start (matches the oracle); the merged table steers the
        # NEXT batch's eligibility, enqueue checks, and delays. Written
        # only on batches that actually fetched a robots file, as a KEYED
        # DELTA (merge_keyed): the batch writes only the refreshed hosts'
        # rows — O(robots fetched) ≤ global_budget — while every other
        # host's row is carried forward in the manifest, so the per-batch
        # politeness write stays O(batch) even at 10^7+ known hosts.
        if cfg.fetch_robots and fvals["n_robots_ok"] > 0:
            ok_rob = fetched.filter((F.col("status") == 200) & is_robots_row)
            txt = (
                F.decode(F.col("body"), "UTF-8")
                if parse_mode
                else F.element_at(F.col("body_spans"), 1)["text"]
            )
            parsed = parse_robots(
                ok_rob.select("host", txt.alias("robots_txt")), agent=cfg.robots_agent
            )
            pol_rows = politeness_from_robots(
                parsed,
                default_interval_s=float(cfg.default_delay),
                default_max_active=cfg.default_max_active,
                min_interval_s=1.0,
            )
            new_pol = parsed.join(pol_rows, "host").select(
                "host",
                F.floor("interval_s").cast("int").alias("delay_s"),
                F.col("max_active").cast("int").alias("max_active"),
                F.col("disallow").alias("robots_disallow"),
                F.col("allow").alias("robots_allow"),
            )
            # bounded collect: hosts whose robots arrived this batch
            # (≤ scheduled robots fetches ≤ global_budget)
            hosts_new = [r[0] for r in new_pol.select("host").distinct().collect()]
            st.merge_keyed("politeness", new_pol, "host", hosts_new)

        # minor compaction, two independent triggers:
        # * queued/dequeued fold on TOMBSTONE FRACTION — rewrite the
        #   frontier only when the dead fraction justifies it, so write
        #   amplification is bounded by 1/frac × O(tombstones) instead of
        #   a fixed-cadence O(frontier) rewrite (at 10^10 URLs a 16-batch
        #   cadence would rewrite the frontier for a 0.03% dead fraction);
        # * host_state delta folds on batch cadence — that rewrite is
        #   O(known hosts), orders cheaper than the frontier.
        if cfg.frontier_deltas:
            # tomb_rows already includes this batch's n_sched + n_qdropped
            # (accumulated where the tombstones were appended)
            tomb_rows = self._maybe_compact_frontier(tomb_rows, frontier_size)
            if cfg.frontier_compact_every and batch_id % cfg.frontier_compact_every == 0:
                st.commit("host_state", self._read_host_state())
                st.commit("host_state_delta", self.spark.createDataFrame([], HOST_STATE_DELTA))

        m = self._metrics_row(
            batch_id, n_sched, n_deduped, n_docs, n_links, n_failed, n_empty,
            frontier_size=frontier_size,
        )
        self._write_checkpoint(batch_id, frontier_size=frontier_size, tomb_rows=tomb_rows)
        vac = [
            "queued", "dequeued", "seen", "host_state", "host_state_delta",
            "seen_shards", "docs", "crawl_order", "metrics", "politeness",
        ]
        if cfg.cache_raw_pages and parse_mode:
            vac.append("raw_pages")
        if cfg.log_requests:
            vac.append("requests")
        if cfg.download_media:
            vac.append("media_blobs")
        for t in vac:
            st.vacuum(t, keep=3)
        return m

    def _metrics_row(
        self, batch_id, n_sched, n_deduped, n_docs, n_links, n_failed, n_empty,
        frontier_size,
    ) -> dict:
        m = {
            "batch_id": batch_id,
            "urls_scheduled": n_sched,
            "urls_deduped": n_deduped,
            "docs_written": n_docs,
            "links_discovered": n_links,
            "failed": n_failed,
            "empty_failed": n_empty,
            "frontier_size": frontier_size,
        }
        self.store.append(
            "metrics",
            self.spark.createDataFrame(
                [tuple(m[f.name] for f in schemas.METRICS.fields)], schemas.METRICS
            ),
            schemas.METRICS,
        )
        return m

    # ------------------------------------------------------------------ run
    def run(self, max_batches: int | None = None) -> list[dict]:
        """Drive batches until the frontier drains (or max_batches).
        Resumes from the last committed checkpoint automatically."""
        ck = self.load_checkpoint()
        if ck is None:
            raise RuntimeError("bootstrap() first")
        for t, v in ck["versions"].items():
            cur = self.store.current_version(t)
            if v >= 0 and cur != v:
                self.store.rollback(t, v)  # undo any partially-committed batch
            elif v < 0 and cur >= 0:
                # table did not exist at checkpoint time (first
                # log_requests / download_media / cache_raw_pages batch
                # crashed mid-append): drop the partial table or the
                # re-run batch appends duplicate rows
                self.store.drop(t)
        batch_id = ck["batch_id"]
        cap = max_batches if max_batches is not None else self.cfg.max_batches
        out = []
        # live size from the checkpoint (delta mode writes it); fall back
        # to one count over the live view for pre-delta checkpoints
        fsize = ck.get("frontier_size")
        while batch_id < cap:
            if fsize is None:
                fsize = self._read_frontier().count()
            if fsize == 0:
                break
            if self.cfg.use_bloom and self.bloom.mode == "broadcast":
                self.bloom.load_broadcast(self.store.read("seen_shards", schemas.SEEN_SHARDS))
            batch_id += 1
            m = self.run_batch(batch_id)
            fsize = m["frontier_size"]
            out.append(m)
        return out
