"""Pure-Python scheduler oracle — the executable spec of the reference's
crawl semantics (golden crawl_order / url_seen / metrics generator).

Implements exactly the operators cited in SURVEY.md §2.6 with pinned
tie-breaks (the reference itself is nondeterministic under forks and
unordered-hash rule dispatch — SURVEY.md §7 "Hard parts" #1):

* O1 FIFO per-seed order  → monotone ``seq``; total order (priority, depth, seq)
  (/root/reference/lib/Loong/Crawler.pm:37, :91-100, :263)
* O2 politeness interval  → per-host next-eligible batch tick
  (/root/reference/lib/Loong/Crawler.pm:111-114, :299-301)
* O3 global cap           → first ``global_budget`` in total order
  (/root/reference/lib/Loong/Crawler.pm:27, :126-127)
* O4 per-host cap         → first ``max_active`` per host in total order
  (/root/reference/lib/Loong/Crawler.pm:128-129)
* O5/F1 dedup gate        → test-and-set seen at enqueue (check marks seen,
  /root/reference/lib/Loong/Filter.pm:9-27; pinned at enqueue time so a URL
  enters the frontier at most once — same final seen set on drained crawls)
* O6 link re-enqueue      → depth+1, parent propagated, fresh seq
  (/root/reference/lib/Loong/Crawler.pm:257-265)
* O7 priority re-scoring  → w_d*depth + w_h*log1p(host_seen_before); lower first
* O8 failed-task retry    → re-enqueue at tail, attempt+1, capped
  (/root/reference/lib/Loong/Crawler.pm:69-76; queue-tail per Queue.pm:20-23)
* F2 content-type gate    → only text/html parsed
  (/root/reference/lib/Loong/Crawler.pm:241-252)
* F4 status handling      → non-200 → failed (301 croaks in the reference,
  /root/reference/lib/Loong/Crawler.pm:147-164)
* robots (north-rule addition): RFC 9309 most-specific-match
  allow/disallow (wildcards included) checked at
  enqueue, before the seen test-and-set (excluded URLs never enter `seen`).

The Spark pipeline (loong_spark.pipeline) must reproduce this total order
and seen set EXACTLY, independent of partitioning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .canon_core import canonicalize, registrable_domain, robots_match, split_url, url_md5
from .config import CrawlConfig, HostPolicy
from .gen import GraphParams, build_graph, politeness_of, seeds_of
from .robots_core import delay_from_robots, parse_robots_text
from .sitemap_core import is_sitemap, sitemap_entries, sitemap_lines, sitemap_locs


@dataclass
class Entry:
    url: str
    url_hash: str
    host: str
    depth: int
    priority: float
    seq: int
    parent: str | None
    state: str = "queued"
    attempt: int = 0
    enqueued_batch: int = 0


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)          # url_hash
    docs: dict[str, list[dict]] = field(default_factory=dict)  # doc_id → spans
    metrics: list[dict] = field(default_factory=list)
    frontier_log: list[Entry] = field(default_factory=list)   # every entry ever enqueued


class Oracle:
    def __init__(
        self,
        graph: dict[str, dict],
        seeds: list[str],
        politeness: dict[str, HostPolicy],
        cfg: CrawlConfig,
    ):
        self.graph = graph
        self.seeds = seeds
        # fetch_robots mode: rules are NOT known upfront — the dict starts
        # empty and fills as /robots.txt fetches are parsed mid-crawl
        self.politeness = {} if cfg.fetch_robots else politeness
        self.cfg = cfg
        self.seen: set[str] = set()
        self.host_seen_count: dict[str, int] = {}
        self.host_next_eligible: dict[str, int] = {}
        self.queued: list[Entry] = []
        self.seq = 0
        self.res = OracleResult()
        self._batch_deduped = 0
        self._batch_robots = 0
        self._batch_empty = 0

    # -- enqueue path (O5/F1 + O7 + robots) --------------------------------
    def _enqueue_robots(self, host: str, batch: int) -> None:
        """fetch_robots host discovery: the first URL admitted for a host
        also enqueues that host's /robots.txt at priority -1 (ahead of
        every content URL); the seen test-and-set makes this once-per-host.
        Counts in host_seen_count BEFORE the triggering URL — the pipeline's
        per-host rank window orders robots rows first."""
        url = f"http://{host}/robots.txt"
        h = url_md5(url)
        if h in self.seen:
            return
        self.seen.add(h)
        self.host_seen_count[host] = self.host_seen_count.get(host, 0) + 1
        e = Entry(url, h, host, 0, -1.0, self.seq, None, "queued", 0, batch)
        self.seq += 1
        self.queued.append(e)
        self.res.frontier_log.append(e)

    def _enqueue(
        self,
        url: str,
        depth: int,
        parent: str | None,
        batch: int,
        sm_prio: float | None = None,
    ) -> None:
        _, host, path = split_url(url)
        if self.cfg.fetch_robots:
            # robots discovery fires on every enqueue ATTEMPT (even ones
            # the rules or dedup then drop) — mirrors the pipeline, which
            # derives robots candidates from the pre-filter link set
            self._enqueue_robots(host, batch)
        pol = self.politeness.get(host)
        if pol and not robots_match(path, pol.robots_disallow, pol.robots_allow):
            self._batch_robots += 1
            return
        h = url_md5(url)
        if h in self.seen:  # test-and-set: check marks seen (Filter.pm:9-27)
            self._batch_deduped += 1
            return
        self.seen.add(h)
        prior = self.host_seen_count.get(host, 0)
        self.host_seen_count[host] = prior + 1
        # quantized to 1e-9 to match frontier.quantize_priority exactly
        # (JVM/Python libm may differ in the last ulp of log1p)
        score = self.cfg.w_depth * depth + self.cfg.w_host * math.log1p(prior)
        if self.cfg.w_sitemap:
            # sitemap-declared priority boost, clamped to the protocol's
            # [0,1] like frontier.priority_col (robots -1.0 floor holds)
            score -= self.cfg.w_sitemap * min(max(sm_prio or 0.0, 0.0), 1.0)
        prio = math.floor(score * 1e9) / 1e9
        e = Entry(url, h, host, depth, prio, self.seq, parent, "queued", 0, batch)
        self.seq += 1
        self.queued.append(e)
        self.res.frontier_log.append(e)

    def _allowed_now(self, e: Entry) -> bool:
        """Schedule-time robots check against the CURRENT rules
        (fetch_robots mode): /robots.txt itself is always fetchable."""
        path = split_url(e.url)[2]
        if path == "/robots.txt":
            return True
        pol = self.politeness.get(e.host)
        if pol is None:
            return True
        return robots_match(path, pol.robots_disallow, pol.robots_allow)

    def _requeue_failed(self, e: Entry, batch: int) -> None:
        """O8: retry at queue tail with fresh seq; priority retained."""
        if e.attempt + 1 >= self.cfg.max_attempts:
            e.state = "failed_final"
            return
        r = Entry(
            e.url, e.url_hash, e.host, e.depth, e.priority, self.seq,
            e.parent, "queued", e.attempt + 1, batch,
        )
        self.seq += 1
        self.queued.append(r)
        self.res.frontier_log.append(r)

    # -- one micro-batch ----------------------------------------------------
    def run_batch(self, batch_id: int) -> dict:
        self._batch_deduped = 0
        self._batch_robots = 0
        self._batch_empty = 0
        if self.cfg.fetch_robots:
            # rules that arrived AFTER a URL was enqueued enforce at
            # schedule time: newly-disallowed queued entries are dropped
            # for good (robots.txt entries themselves are always allowed)
            self.queued = [e for e in self.queued if self._allowed_now(e)]
        eligible = [
            e for e in self.queued
            if self.host_next_eligible.get(e.host, 0) <= batch_id
        ]
        eligible.sort(key=lambda e: (e.priority, e.depth, e.seq))
        taken_per_host: dict[str, int] = {}
        taken_per_domain: dict[str, int] = {}
        scheduled: list[Entry] = []
        for e in eligible:
            if len(scheduled) >= self.cfg.global_budget:
                break
            cap = self.cfg.max_active_for(
                self.politeness[e.host].__dict__ if e.host in self.politeness else None
            )
            if taken_per_host.get(e.host, 0) >= cap:
                continue
            if self.cfg.domain_cap is not None:
                # per-registrable-domain fairness cap: greedy counting is
                # equivalent to the engine's stacked windows because a
                # host maps to exactly ONE domain — once a domain fills,
                # every later row of its hosts is dropped in both forms
                dom = registrable_domain(e.host)
                if taken_per_domain.get(dom, 0) >= self.cfg.domain_cap:
                    continue
                taken_per_domain[dom] = taken_per_domain.get(dom, 0) + 1
            taken_per_host[e.host] = taken_per_host.get(e.host, 0) + 1
            scheduled.append(e)

        sched_ids = {id(e) for e in scheduled}
        self.queued = [e for e in self.queued if id(e) not in sched_ids]

        docs_written = failed = links = 0
        robots_fetched: list[tuple[str, str]] = []
        backoff_hosts: set[str] = set()
        for rank, e in enumerate(scheduled):
            self.res.crawl_order.append((batch_id, rank, e.url))
            page = self.graph.get(e.url)
            if self.cfg.backoff_mult > 1.0 and (
                page is None or page["status"] >= 500
            ):
                # adaptive backoff signal: server-side failure
                # (unreachable / 5xx) — mirrors the pipeline's
                # fail_hosts filter over fetched statuses
                backoff_hosts.add(e.host)
            if self.cfg.fetch_robots and split_url(e.url)[2] == "/robots.txt":
                # robots responses: parsed (at end of batch), never
                # retried — a host without a robots file stays on defaults
                if page is None or page["status"] != 200:
                    e.state = "failed"
                    failed += 1
                else:
                    e.state = "fetched"
                    txt = page["body_spans"][0]["text"]
                    robots_fetched.append((e.host, txt))
                    if self.cfg.fetch_sitemaps:
                        # sitemaps-protocol discovery: `Sitemap:` lines
                        # enqueue as the robots page's links, in line
                        # order (pipeline's raw-link union twin)
                        for loc in sitemap_lines(txt):
                            canon = canonicalize(e.url, loc)
                            if canon:
                                links += 1
                                self._enqueue(canon, e.depth + 1, e.url, batch_id)
                continue
            if page is None or page["status"] != 200:
                e.state = "failed"
                failed += 1
                self._requeue_failed(e, batch_id)
                continue
            e.state = "fetched"
            if len(page["body_spans"]) == 0:
                # F3 empty body: non-retry failure, no doc, links NOT
                # followed — checked BEFORE the content-type gate, as the
                # reference does (Crawler.pm:238-240 precedes :241-252);
                # F7 scraped-empty (html that parses to zero spans) lands
                # here too in span representation
                e.state = "failed_empty"
                self._batch_empty += 1
                continue
            if self.cfg.fetch_sitemaps and is_sitemap(
                page["content_type"], page["body_spans"][0]["text"]
            ):
                # fetched urlset/sitemapindex: <loc> URLs enqueue as the
                # sitemap page's links in document order; an index's
                # children are just URLs (re-fetched + re-gated next
                # round, cycles killed by the seen filter). No doc is
                # written — sitemaps are frontier input, not content.
                # With w_sitemap, per-block extraction carries each
                # loc's declared <priority> into the score (pipeline's
                # use_entries twin).
                xml = page["body_spans"][0]["text"]
                pairs = (
                    sitemap_entries(xml)
                    if self.cfg.w_sitemap
                    else [(loc, None) for loc in sitemap_locs(xml)]
                )
                for loc, sp in pairs:
                    canon = canonicalize(e.url, loc)
                    if canon:
                        links += 1
                        self._enqueue(canon, e.depth + 1, e.url, batch_id, sm_prio=sp)
                continue
            if not page["content_type"].startswith("text/html"):
                continue  # F2 content gate: fetched, not parsed
            doc_id = e.url_hash
            self.res.docs[doc_id] = page["body_spans"]
            docs_written += 1
            for k, href in enumerate(page["out_links"]):
                canon = canonicalize(e.url, href)
                if canon:
                    links += 1
                    self._enqueue(canon, e.depth + 1, e.url, batch_id)

        for host in taken_per_host:
            delay = (
                self.politeness[host].delay_s
                if host in self.politeness
                else self.cfg.default_delay
            )
            if host in backoff_hosts:
                delay = math.floor(delay * self.cfg.backoff_mult)
            self.host_next_eligible[host] = batch_id + delay

        # fetch_robots: merge parsed rules LAST — they apply from the
        # next batch onward (this batch's enqueues and politeness clocks
        # used the rules known at batch start, like the pipeline)
        for host, txt in robots_fetched:
            parsed = parse_robots_text(txt, self.cfg.robots_agent)
            if parsed is None:
                continue  # no applicable section → defaults keep applying
            self.politeness[host] = HostPolicy(
                host=host,
                delay_s=delay_from_robots(
                    parsed["crawl_delay"], float(self.cfg.default_delay)
                ),
                max_active=self.cfg.default_max_active,
                robots_disallow=parsed["disallow"],
                robots_allow=parsed["allow"],
            )

        m = {
            "batch_id": batch_id,
            "urls_scheduled": len(scheduled),
            "urls_deduped": self._batch_deduped,
            "docs_written": docs_written,
            "links_discovered": links,
            "failed": failed,
            "empty_failed": self._batch_empty,
            "frontier_size": len(self.queued),
        }
        self.res.metrics.append(m)
        return m

    def run(self) -> OracleResult:
        # batch 0: seed injection in seed_order (S1, Crawler.pm:84-105)
        for s in self.seeds:
            self._enqueue(s, 0, None, 0)
        batch_id = 0
        while self.queued and batch_id < self.cfg.max_batches:
            batch_id += 1
            self.run_batch(batch_id)
        self.res.url_seen = set(self.seen)
        return self.res


def run_oracle(p: GraphParams, cfg: CrawlConfig | None = None) -> OracleResult:
    cfg = cfg or CrawlConfig()
    return Oracle(build_graph(p), seeds_of(p), politeness_of(p), cfg).run()
