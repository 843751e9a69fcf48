"""Physical-plan audit: assert the plans we ship are the plans we want.

For each audited query: capture .explain("formatted") and check
plan-shape properties that matter at 100 TB —

* parquet scans prune columns (ReadSchema never the full table when the
  query projects a subset) and push filters (PushedFilters non-empty
  where a filter targets a scan column);
* WholeStageCodegen spans exist (expressions stay JVM-side);
* small dimension joins are broadcast, big-side joins are not
  nested-loop;
* no CartesianProduct outside the intentionally-cross brute-force ANN
  baseline.

Usage: python scripts/explain_audit.py [sf_dir]   (writes EXPLAIN.md)
Exit 1 if any assertion fails — usable as a perf-regression gate.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from loong_spark.session import get_spark  # noqa: E402

# query -> (must_contain, must_not_contain) substring checks on the plan.
# Codegen spans: AQE's .explain("formatted") prints NO codegen markers at
# all for adaptive plans (and non-adaptive ones only get "[codegen id :")
# — the post-execution SIMPLE plan is where codegened operators carry the
# "*(n)" stage prefix. The audit captures formatted + simple together and
# greps the union, so both annotations satisfy the check.
CODEGEN = "*("
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    "tpch_q1": ([CODEGEN, "PushedFilters: [IsNotNull(l_shipdate)"], ["CartesianProduct"]),
    "tpch_q3": (["BroadcastHashJoin", "PushedFilters"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # q6: every predicate reaches the scan; projection prunes to 4 cols
    "tpch_q6": (
        [CODEGEN, "PushedFilters: [IsNotNull(l_shipdate)",
         "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"],
        ["CartesianProduct"],
    ),
    "tpch_q5": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "frontier_schedule_topk": ([CODEGEN, "TakeOrderedAndProject"], ["CartesianProduct"]),
    "dedup_anti_join": (["LeftAnti"], ["CartesianProduct", "SortMergeJoin"]),
    "docs_exact_dedup": (["HashAggregate"], ["CartesianProduct"]),
    "docs_quality": ([CODEGEN, "ReadSchema: struct<doc_id:bigint,text:string>"], ["Exchange"]),
    "docs_lang_id": (["ReadSchema: struct<doc_id:bigint,text:string>"], ["Exchange"]),
    "emb_cosine_topk": (["BroadcastNestedLoopJoin"], []),  # intentional cross: tiny query side
    "emb_ann_topk": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # IVF-Flat: probed-query side broadcasts onto the list_id equi-join;
    # assignment is the Arrow matmul, never per-row Python
    "emb_ivf_topk": (["BroadcastHashJoin", "ArrowEvalPython"], ["CartesianProduct", "BatchEvalPython"]),
    "mm_image_features": (["MapInPandas"], ["Exchange"]),
    "upsert_latest": (["WindowGroupLimit"], []),  # Spark pushes rn==1 into the sort
    # robots_filter: the higher-order aggregate/filter lambdas legitimately
    # BLOCK codegen for that one Project (known Spark limitation) — the
    # expressions still run JVM-side, so the gate asserts "no Python, no
    # shuffle" rather than a codegen span.
    "robots_filter": ([], ["Exchange", "BatchEvalPython", "ArrowEvalPython"]),
    # §3.4 ETL loader: broadcast related-source join, no cartesian
    "etl_export": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # P9/P6/P7 site transforms: pure scalar projections — JVM only,
    # zero shuffle (they ride the scan at 100 TB)
    "site_comic_decode": ([], ["Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"]),
    "site_term_map": ([], ["Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"]),
    "site_date_norm": ([], ["Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"]),
    # U1 parse path: Arrow-batched mapInPandas, no per-row Python UDF
    "parse_spans": (["MapInPandas"], ["BatchEvalPython"]),
    # sitemaps protocol: per-entry explode + regex extraction is all
    # JVM generate/project work riding the scan — zero shuffle, zero
    # Python (at 100 TB sitemap parsing is a map-only stage)
    "sitemap_parse": (
        ["Generate"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    ),
    "sitemap_discover": (
        [], ["Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"],
    ),
    # §3.3 Lite flow: dispatch + effective-body selection ride the page
    # scan (no join — joining pages onto routed would shuffle the body
    # corpus); parse is Arrow-batched; only the span/manifest groupBys
    # exchange
    "lite_scrape": (
        ["MapInPandas", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
    ),
    # WARC record builder: ONE codegen projection riding the page scan
    # — serializing 100 TB of pages must not shuffle or leave the JVM
    "warc_records": (
        [CODEGEN],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"],
    ),
    # CDX offsets: exactly the file_id exchange the writer needs (window
    # over each file's record order); no Python, no join
    "warc_cdx": (
        ["Window", "Exchange"],
        ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "SortMergeJoin"],
    ),
    # domain fairness cap: eTLD+1 extraction is pure split arithmetic
    # riding the scan (codegen In-set for the suffix list); the only
    # exchange is the domain window's — no Python, no join
    "url_domain_cap": (
        ["Window"],
        ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "SortMergeJoin"],
    ),
    # Gopher repetition: explode + map-side-combinable partial/final
    # aggregates; the per-doc join-back stays a hash join, never a
    # cartesian, and nothing leaves the JVM
    "docs_repetition": (
        ["Generate", "HashAggregate"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
}


def _schedule_shuffle(spark, queued, host_state):
    from pyspark.sql import functions as F

    from loong_spark.config import CrawlConfig
    from loong_spark.frontier import capped_keys

    pol = host_state.select(
        "host", (F.col("seen_count") % 4 + 1).cast("int").alias("max_active")
    )
    return capped_keys(queued, pol, CrawlConfig(global_budget=50), broadcast_pol=False)


def _schedule_wgl(spark, queued, host_state):
    from pyspark.sql import functions as F

    from loong_spark.config import CrawlConfig
    from loong_spark.frontier import capped_keys

    pol = host_state.select(
        "host", (F.col("seen_count") % 4 + 1).cast("int").alias("max_active")
    )
    cfg = CrawlConfig(global_budget=50, window_group_limit=True)
    return capped_keys(queued, pol, cfg)


def _schedule_prefilter(spark, queued, host_state):
    from pyspark.sql import functions as F

    from loong_spark.config import CrawlConfig
    from loong_spark.frontier import capped_keys

    pol = host_state.select(
        "host", (F.col("seen_count") % 4 + 1).cast("int").alias("max_active")
    )
    return capped_keys(queued, pol, CrawlConfig(global_budget=50))


def pipeline_plan_checks(spark) -> dict[str, tuple]:
    """Crawl-loop join-strategy audits (not entry queries): the
    size-aware host_state strategy at BOTH regimes (frontier.eligible
    broadcast below config.broadcast_limit_bytes, shuffle-hash equi-join
    above — the 10^7-host regime must never mandate a multi-GB broadcast
    per batch) and the admission seen anti-join (pipeline.seen_anti_join:
    `seen` must NEVER be a broadcast build, whatever stats claim).
    Returns name -> (df, must_contain, must_not_contain)."""
    from pyspark.sql import functions as F

    from loong_spark.frontier import eligible
    from loong_spark.pipeline import (
        frontier_rewrite,
        next_eligible_for_scheduled,
        seen_anti_join,
    )

    queued = spark.range(0, 100_000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 1000).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 1000).cast("string"), F.lit(".example")).alias("host"),
        F.lit(1).alias("depth"),
        F.lit(1.0).alias("priority"),
        F.col("id").alias("seq"),
    )
    host_state = spark.range(0, 1000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
        (F.col("id") % 7).cast("long").alias("next_eligible"),
        F.lit(3).cast("long").alias("seen_count"),
    )
    seen = spark.range(0, 1000).select(
        F.md5(F.col("id").cast("string")).alias("url_hash")
    )
    cand = queued.select("url_hash", "url", "host")
    return {
        # small-regime: per-host state broadcasts (one tiny ship, no
        # frontier shuffle for eligibility)
        "pipeline_eligible_broadcast": (
            eligible(queued, host_state, 5, broadcast_state=True),
            ["BroadcastHashJoin"], ["SortMergeJoin", "ShuffledHashJoin"],
        ),
        # big-regime: host_state past broadcast_limit_bytes → shuffle-hash
        # equi-join on host (exchange shared with the per-host top-k),
        # never a mandatory broadcast or a sort-merge
        "pipeline_eligible_shuffle": (
            eligible(queued, host_state, 5, broadcast_state=False),
            ["ShuffledHashJoin"], ["BroadcastHashJoin", "SortMergeJoin"],
        ),
        # admission backstop: seen side is TINY here (1000 rows — stats
        # would pick broadcast), yet the pinned hint must hold: at 10^10
        # seen rows a mis-estimate broadcasting `seen` kills the driver
        "pipeline_seen_anti_join": (
            seen_anti_join(cand, seen),
            ["ShuffledHashJoin", "LeftAnti"], ["BroadcastHashJoin", "SortMergeJoin"],
        ),
        # big-regime scheduling keys (schedule()'s pre-budget stage): the
        # max_active dim shuffle-hash joins on host — never a mandatory
        # full-politeness broadcast, never a sort-merge
        "pipeline_schedule_shuffle": (
            _schedule_shuffle(spark, queued, host_state),
            ["ShuffledHashJoin"], ["SortMergeJoin", "BroadcastHashJoin"],
        ),
        # frontier_deltas=False fallback rewrite: the scheduled side is
        # ≤ global_budget rows by construction, so ITS broadcast pin is
        # bounded — anti-join + union, never a frontier shuffle just to
        # remove a budget's worth of rows
        "pipeline_frontier_fallback_rewrite": (
            frontier_rewrite(
                queued.select("url", "url_hash", "host", "depth", "priority", "seq"),
                queued.limit(50).select("seq"),
                queued.limit(10).select("url", "url_hash", "host", "depth", "priority", "seq"),
            ),
            ["BroadcastHashJoin", "LeftAnti", "Union"],
            ["SortMergeJoin", "ShuffledHashJoin"],
        ),
        # per-host radix prefilter (cfg.cap_prefilter, default ON): the
        # windows' input must be the histogram-cutoff survivor join —
        # a codegen HashAggregate feeding a host-keyed cutoff dim that
        # BROADCASTS in the small regime (the exact windows then sort
        # O(survivors), never O(frontier))
        "pipeline_cap_prefilter": (
            _schedule_prefilter(spark, queued, host_state),
            ["HashAggregate", "BroadcastHashJoin"],
            ["SortMergeJoin", "CartesianProduct"],
        ),
        # hot-host map-side pruning (cfg.window_group_limit): the literal
        # cap bound must yield the WindowGroupLimit Partial+Final pair so
        # phase 1 pre-prunes each (host, salt) group BELOW the exchange —
        # in the 10^10 Zipf-head regime the phase-1 shuffle then moves
        # O(groups × bound) rows, not O(frontier)
        "pipeline_window_group_limit": (
            _schedule_wgl(spark, queued, host_state),
            ["WindowGroupLimit"], ["SortMergeJoin"],
        ),
        # >limit delay-dim path (pol_small=False): the politeness scan is
        # SEMI-restricted by a broadcast of the ≤-budget scheduled hosts,
        # then the restricted dim broadcasts back onto them — the full
        # dim never ships and never shuffles for a budget-row probe
        "pipeline_delay_dim_semi": (
            next_eligible_for_scheduled(
                queued.limit(100), host_state.select("host", F.lit(2).alias("delay_s")),
                batch_id=7, default_delay=1, pol_small=False,
            ),
            ["BroadcastHashJoin", "LeftSemi"],
            ["SortMergeJoin", "ShuffledHashJoin"],
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", cores=8)
    qs = entry.queries()
    failures: list[str] = []
    sections: list[str] = []
    audits = [(n, qs[n], need, forbid) for n, (need, forbid) in CHECKS.items()]
    audits += [
        (n, (lambda df=df: df), need, forbid)
        for n, (df, need, forbid) in pipeline_plan_checks(spark).items()
    ]
    for name, make_df, need, forbid in audits:
        df = make_df(spark, sf_dir) if name in CHECKS else make_df()
        # Execute THIS df's plan: AQE only finalizes — and only then
        # annotates codegen stages / chosen join strategies — on an
        # action over the same QueryExecution instance. df.count() or a
        # noop write each build a *new* QueryExecution around the plan
        # and leave this one isFinalPlan=false with no codegen markers;
        # only collect() runs the DataFrame's own. Audit inputs are
        # sf0.01-sized, so collecting is cheap.
        df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")  # pushdown / pruning / join strategy
            df.explain()  # simple: final AQE plan with *(n) codegen stages
        plan = buf.getvalue()
        probs = [f"missing: {s}" for s in need if s not in plan]
        probs += [f"forbidden: {s}" for s in forbid if s in plan]
        status = "OK " if not probs else "FAIL"
        if probs:
            failures.append(f"{name}: {'; '.join(probs)}")
        print(f"{status} {name}" + (f"  [{'; '.join(probs)}]" if probs else ""))
        head = "\n".join(plan.splitlines()[:40])
        sections.append(f"## {name} — {status.strip()}\n\n```\n{head}\n```\n")

    with open("EXPLAIN.md", "w") as f:
        f.write(
            "# EXPLAIN audit — physical-plan shape of headline queries\n\n"
            "Generated by scripts/explain_audit.py. Each section shows the "
            "first 40 lines of .explain('formatted'); the audit asserts "
            "column pruning, filter pushdown, codegen spans, and join "
            "strategy per query (see CHECKS in the script).\n\n"
            + "\n".join(sections)
        )
    print("FAILURES:", "; ".join(failures) if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
