"""spark-submit entry point: crawl / resume / bench subcommands.

Deploy (north_star: ``spark-submit --py-files`` on a multi-executor
cluster)::

    scripts/make_pyfiles_zip.sh              # → dist/loong_spark.zip
    spark-submit --master ... \\
        --py-files dist/loong_spark.zip \\
        -- loong_spark/cli.py crawl --warehouse /data/wh \\
           --graph /data/web_graph.parquet --seeds-file seeds.txt

In the sandbox the same commands run under plain ``python`` (local[N]).
The reference's CLI is script/task_invoker.pl (--site/--fork/--debug,
/root/reference/script/task_invoker.pl:71-97); ``crawl --max-batches 1
--seed URL`` is the ``--debug`` single-page analogue (beta_crawl,
/root/reference/lib/Loong/Crawler.pm:138).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from loong_spark.session import get_spark

    return get_spark("loong-cli", cores=args.cores)


def _jar_for(warehouse: str, cfg):
    """Cookie jar for crawl/resume when request logging is on: pools
    persist under <warehouse>/_cookies, so a resumed run re-reads the
    SAME cookies; the demo generator only fires on miss/expiry."""
    if not cfg.log_requests:
        return None
    import os

    from loong_spark.cookies import CookieJar, demo_cookie_generator

    return CookieJar(os.path.join(warehouse, "_cookies"), demo_cookie_generator)


def cmd_crawl(args) -> int:
    from loong_spark.config import CrawlConfig
    from loong_spark.pipeline import CrawlPipeline
    from loong_spark import schemas

    spark = _spark(args)
    # Config layering: an existing warehouse's persisted config.json is
    # the BASE (re-running `crawl` must not silently reset the original
    # run's knobs — fetch_robots / frontier_deltas flipping mid-crawl
    # corrupts state); the S11 config store (etcd://host:port or a
    # FileConfigStore directory) overlays it; explicit CLI flags overlay
    # last.
    import os

    saved = os.path.join(args.warehouse, "config.json")
    if os.path.isfile(saved):
        with open(saved) as f:
            cfg = CrawlConfig.from_dict(json.load(f))
    else:
        cfg = CrawlConfig()
    if args.config_store:
        from loong_spark.etcd import (
            ConfigSourceUnavailable,
            EtcdClient,
            FileConfigStore,
            load_crawl_config,
        )

        store = (
            EtcdClient(args.config_store[len("etcd://"):])
            if args.config_store.startswith("etcd://")
            else FileConfigStore(args.config_store)
        )
        try:
            cfg = load_crawl_config(store, args.config_key, base=cfg)
        except ConfigSourceUnavailable as e:
            print(f"config store unreachable: {e}", file=sys.stderr)
            return 2
    over = {}
    if args.budget is not None:
        over["global_budget"] = args.budget
    if args.max_batches is not None:
        over["max_batches"] = args.max_batches
    for flag, knob in (
        ("fetch_robots", "fetch_robots"),
        ("fetch_sitemaps", "fetch_sitemaps"),
        ("log_requests", "log_requests"),
        ("download_media", "download_media"),
        ("cache_raw", "cache_raw_pages"),
    ):
        if getattr(args, flag):
            over[knob] = True
    if getattr(args, "w_sitemap", None) is not None:
        over["w_sitemap"] = args.w_sitemap
    if getattr(args, "domain_cap", None) is not None:
        over["domain_cap"] = args.domain_cap
    if getattr(args, "backoff", None) is not None:
        over["backoff_mult"] = args.backoff
    # demo sitemaps are advertised via robots `Sitemap:` lines, so
    # discovery needs the robots fetch path on
    if args.demo and getattr(args, "fetch_sitemaps", False):
        over["fetch_robots"] = True
    if over:
        import dataclasses

        cfg = dataclasses.replace(cfg, **over)
    pipe = CrawlPipeline(
        spark, args.warehouse, cfg, cookie_jar=_jar_for(args.warehouse, cfg)
    )

    if pipe.load_checkpoint() is None:
        if args.demo:
            from loong_spark.gen import (
                GraphParams,
                graph_rows_for_spark,
                graph_rows_html_for_spark,
                politeness_of,
                seeds_of,
            )

            p = GraphParams(
                n_pages=args.demo_pages,
                robots_pages=cfg.fetch_robots,
                sitemap_pages=cfg.fetch_sitemaps,
            )
            if args.parse:  # raw-HTML bodies → production decode+parse path
                graph = spark.createDataFrame(
                    graph_rows_html_for_spark(p), schemas.WEB_GRAPH_HTML
                )
            else:
                graph = spark.createDataFrame(graph_rows_for_spark(p), schemas.WEB_GRAPH)
            # fetch_robots: rules are DISCOVERED by crawling /robots.txt,
            # not handed to bootstrap
            politeness = [] if cfg.fetch_robots else list(politeness_of(p).values())
            seeds = seeds_of(p)
        else:
            if not args.graph or not args.seeds_file:
                print("fresh crawl needs --graph and --seeds-file (or --demo)", file=sys.stderr)
                return 2
            graph = spark.read.parquet(args.graph)
            with open(args.seeds_file) as f:
                seeds = [line.strip() for line in f if line.strip()]
            politeness = spark.read.parquet(args.politeness) if args.politeness else []
        pipe.bootstrap(graph, politeness, seeds)

    metrics = pipe.run(max_batches=args.max_batches)
    for m in metrics:
        print(json.dumps(m))
    return 0


def cmd_resume(args) -> int:
    """Pure resume: refuses to bootstrap (crash-recovery entry point)."""
    from loong_spark.pipeline import CrawlPipeline

    spark = _spark(args)
    pipe = CrawlPipeline(spark, args.warehouse)  # cfg auto-loads from config.json
    pipe.cookie_jar = _jar_for(args.warehouse, pipe.cfg)
    if pipe.load_checkpoint() is None:
        print(f"no checkpoint under {args.warehouse}", file=sys.stderr)
        return 2
    for m in pipe.run(max_batches=args.max_batches):
        print(json.dumps(m))
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_stream(args) -> int:
    """§2.9 streaming surface as a product command: drain an events feed
    (file drops) with Trigger.AvailableNow through the watermarked
    per-host window rates and the stateful politeness gate, print JSON
    summaries. A parquet FILE input is staged into a drop directory
    first (streaming file sources watch directories)."""
    import os
    import shutil
    import tempfile

    from loong_spark.streaming import (
        host_fetch_rates,
        politeness_gate_stream,
        read_event_stream,
        run_available_now,
    )

    spark = _spark(args)
    src = args.events
    workdir = tempfile.mkdtemp(prefix="loong-stream-")
    if not os.path.exists(src):
        # checked FIRST: a nonexistent path ending in .parquet must get
        # this clean message, not shutil.copy's raw FileNotFoundError
        print(f"--events must be a parquet file or directory: {src}", file=sys.stderr)
        return 2
    if os.path.isfile(src):
        drop = os.path.join(workdir, "drop")
        os.makedirs(drop)
        shutil.copy(src, os.path.join(drop, "part-0.parquet"))
        src = drop
    elif os.path.isdir(src) and any(f.endswith(".parquet") for f in os.listdir(src)):
        pass  # already a drop directory
    else:
        print(f"--events must be a parquet file or directory: {src}", file=sys.stderr)
        return 2

    rates = run_available_now(
        host_fetch_rates(read_event_stream(spark, src), window=args.window),
        os.path.join(workdir, "ck_rates"),
        query_name="rates",
        output_mode="complete",
    )
    print(json.dumps({
        "stream": "host_fetch_rates",
        "windows": len({(r["win_start"], r["win_end"]) for r in rates}),
        "host_rows": len(rates),
        "max_events_per_window": max((r["n_events"] for r in rates), default=0),
    }))

    gated = run_available_now(
        politeness_gate_stream(read_event_stream(spark, src), delay_s=args.gate_delay),
        os.path.join(workdir, "ck_gate"),
        query_name="gated",
    )
    n_adm = sum(1 for r in gated if r["admitted"])
    print(json.dumps({
        "stream": "politeness_gate",
        "events": len(gated),
        "admitted": n_adm,
        "suppressed": len(gated) - n_adm,
        "delay_s": args.gate_delay,
    }))
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


def cmd_warc(args) -> int:
    """Archive-export surface: the warehouse's raw-page cache → WARC/1.1
    files + CDX index + manifest (warc.py). Only the exact fetched bytes
    are archivable, so this requires a parse-mode crawl run with
    --cache-raw (the raw_pages table); a span-mode warehouse exits 2
    with a clean message instead of fabricating payloads."""
    from pyspark.sql import functions as F

    from loong_spark.store import SnapshotStore
    from loong_spark.warc import (
        assign_files, cdx_index, warc_records, write_warc_files,
    )

    spark = _spark(args)
    st = SnapshotStore(spark, args.warehouse)
    if not st.exists("raw_pages"):
        print(
            f"no raw_pages table under {args.warehouse} — run a parse-mode "
            "crawl with --cache-raw to keep archivable bytes",
            file=sys.stderr,
        )
        return 2
    pages = st.read("raw_pages").select(
        "url",
        F.lit(200).alias("status"),  # the cache stores 200 responses only
        "content_type",
        "body",
    )
    recs = assign_files(
        warc_records(pages, warc_date=args.date), n_files=args.files
    ).localCheckpoint()  # records price once; files + index must agree
    if args.gzip:
        # member-per-record .warc.gz: offsets exist only after
        # compression, so the writer itself returns the CDX rows and
        # the manifest aggregates them
        from loong_spark.warc import write_warc_gz_files

        gz_cdx = write_warc_gz_files(
            recs, args.out, prefix=args.prefix, warc_date=args.date
        ).localCheckpoint()
        gz_cdx.drop("file_id", "file_sha256").write.mode("overwrite").parquet(
            os.path.join(args.out, "cdx")
        )
        manifest = (
            gz_cdx.groupBy("filename", "file_sha256")
            .agg(
                F.count(F.lit(1)).alias("n_records"),
                F.max(F.col("offset") + F.col("length")).alias("n_bytes"),
            )
            .collect()
        )
    else:
        manifest = write_warc_files(
            recs, args.out, prefix=args.prefix, warc_date=args.date
        ).collect()  # bounded: one row per archive file
        cdx_index(recs, warc_date=args.date, prefix=args.prefix).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out, "cdx"))
    for m in sorted(manifest, key=lambda m: m["filename"]):
        print(json.dumps(m.asDict()))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="loong-spark")
    ap.add_argument("--cores", type=int, default=None, help="local[N] (default $SPARK_GRAFT_CPUS)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="bootstrap (if fresh) + run micro-batches")
    c.add_argument("--warehouse", required=True)
    c.add_argument("--graph", help="web_graph parquet (fetch simulator input)")
    c.add_argument("--seeds-file")
    c.add_argument("--politeness", help="politeness table parquet")
    c.add_argument("--budget", type=int, default=None)
    c.add_argument(
        "--config-store", default=None,
        help="S11 config source: etcd://host:port or a FileConfigStore dir; "
        "stored knobs are the base, explicit flags overlay",
    )
    c.add_argument("--config-key", default="loong/crawl")
    c.add_argument("--max-batches", type=int, default=None)
    c.add_argument("--demo", action="store_true", help="synthetic fixture graph")
    c.add_argument(
        "--log-requests", action="store_true",
        help="append per-request UA/cookie headers to a `requests` audit table",
    )
    c.add_argument(
        "--download-media", action="store_true",
        help="run the S10 media stage per batch: dedup new docs' media refs "
        "and fetch unseen ones into `media_blobs` (stub kernel in-sandbox)",
    )
    c.add_argument("--demo-pages", type=int, default=300)
    c.add_argument(
        "--fetch-robots",
        action="store_true",
        help="fetch+parse /robots.txt on host discovery instead of "
        "bootstrapping politeness rules (demo graph gains robots pages)",
    )
    c.add_argument(
        "--fetch-sitemaps",
        action="store_true",
        help="ingest the sitemaps protocol: Sitemap: lines of fetched "
        "robots files and <loc> URLs of fetched sitemap XML join the "
        "link stream (implies --fetch-robots in demo mode, which is how "
        "the demo graph advertises its sitemaps)",
    )
    c.add_argument(
        "--w-sitemap", type=float, default=None, metavar="W",
        help="weight of a sitemap-declared <priority> in the scheduling "
        "score (0 <= W < 1; use with --fetch-sitemaps) — higher declared "
        "priorities schedule earlier",
    )
    c.add_argument(
        "--parse", action="store_true",
        help="demo graph carries raw HTML bytes → run the decode+parse path",
    )
    c.add_argument(
        "--domain-cap", type=int, default=None, metavar="N",
        help="crawl-fairness cap: at most N scheduled URLs per "
        "registrable domain (eTLD+1) per batch — bounds subdomain "
        "floods that per-host caps can't",
    )
    c.add_argument(
        "--backoff", type=float, default=None, metavar="M",
        help="adaptive politeness: hosts with an unreachable/5xx fetch "
        "this batch wait floor(delay x M) instead of delay (M >= 1; "
        "1 = off)",
    )
    c.add_argument(
        "--cache-raw", action="store_true",
        help="S6 raw-page cache: append each 200 response's exact bytes "
        "to a `raw_pages` table (parse mode only) — the source the "
        "`warc` export archives",
    )
    c.set_defaults(fn=cmd_crawl)

    r = sub.add_parser("resume", help="resume from checkpoint (no bootstrap)")
    r.add_argument("--warehouse", required=True)
    r.add_argument("--max-batches", type=int, default=None)
    r.set_defaults(fn=cmd_resume)

    b = sub.add_parser("bench", help="run the per-round benchmark")
    b.set_defaults(fn=cmd_bench)

    w = sub.add_parser("warc", help="export the raw-page cache as WARC/1.1 + CDX")
    w.add_argument("--warehouse", required=True)
    w.add_argument("--out", required=True, help="archive output directory")
    w.add_argument("--files", type=int, default=4, help="archive file count (bounds writer-task memory)")
    w.add_argument("--prefix", default="loong")
    w.add_argument("--date", default="2026-01-01T00:00:00Z", help="WARC-Date capture timestamp")
    w.add_argument(
        "--gzip", action="store_true",
        help="member-per-record .warc.gz (Common Crawl layout): CDX "
        "offsets point at gzip members, one seek+inflate per record",
    )
    w.set_defaults(fn=cmd_warc)

    s = sub.add_parser("stream", help="drain an events feed through the streaming ops")
    s.add_argument("--events", required=True, help="events parquet file or drop directory")
    s.add_argument("--window", default="1 minute")
    s.add_argument("--gate-delay", type=float, default=60.0)
    s.set_defaults(fn=cmd_stream)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
