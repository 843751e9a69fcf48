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
import sys


def _spark(args):
    from loong_spark.session import get_spark

    return get_spark("loong-cli", cores=args.cores)


def cmd_crawl(args) -> int:
    from loong_spark.config import CrawlConfig
    from loong_spark.pipeline import CrawlPipeline
    from loong_spark import schemas

    spark = _spark(args)
    cfg = CrawlConfig(global_budget=args.budget, max_batches=args.max_batches)
    pipe = CrawlPipeline(spark, args.warehouse, cfg)

    if pipe.load_checkpoint() is None:
        if args.demo:
            from loong_spark.gen import (
                GraphParams,
                graph_rows_for_spark,
                graph_rows_html_for_spark,
                politeness_of,
                seeds_of,
            )

            p = GraphParams(n_pages=args.demo_pages)
            if args.parse:  # raw-HTML bodies → production decode+parse path
                graph = spark.createDataFrame(
                    graph_rows_html_for_spark(p), schemas.WEB_GRAPH_HTML
                )
            else:
                graph = spark.createDataFrame(graph_rows_for_spark(p), schemas.WEB_GRAPH)
            politeness = list(politeness_of(p).values())
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
    pipe = CrawlPipeline(spark, args.warehouse)
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


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="loong-spark")
    ap.add_argument("--cores", type=int, default=None, help="local[N] (default $SPARK_GRAFT_CPUS)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="bootstrap (if fresh) + run micro-batches")
    c.add_argument("--warehouse", required=True)
    c.add_argument("--graph", help="web_graph parquet (fetch simulator input)")
    c.add_argument("--seeds-file")
    c.add_argument("--politeness", help="politeness table parquet")
    c.add_argument("--budget", type=int, default=160)
    c.add_argument("--max-batches", type=int, default=None)
    c.add_argument("--demo", action="store_true", help="synthetic fixture graph")
    c.add_argument("--demo-pages", type=int, default=300)
    c.add_argument(
        "--parse", action="store_true",
        help="demo graph carries raw HTML bytes → run the decode+parse path",
    )
    c.set_defaults(fn=cmd_crawl)

    r = sub.add_parser("resume", help="resume from checkpoint (no bootstrap)")
    r.add_argument("--warehouse", required=True)
    r.add_argument("--max-batches", type=int, default=None)
    r.set_defaults(fn=cmd_resume)

    b = sub.add_parser("bench", help="run the per-round benchmark")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
