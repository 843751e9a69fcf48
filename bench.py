"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Two groups:
* frontier_* — the engine's own metric (BASELINE.json): URLs
  scheduled+deduped/sec on a synthetic frontier (columnar generation,
  JVM-only scheduling ops). Sized by $LOONG_BENCH_URLS (default 2_000_000).
* entry queries — representative operators from __spark_entry__ at sf_dir.

Scaling-efficiency evidence (N vs 4N cores) is produced by
bench/scaling.py → BENCH/BASELINE.md; this file is the per-round snapshot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from loong_spark.config import CrawlConfig
from loong_spark.frontier import ORDER_COLS, quantize_priority
from loong_spark.session import get_spark


def gen_bench_frontier(spark: SparkSession, n_urls: int, n_hosts: int = 1000):
    """Columnar synthetic frontier: deterministic, JVM-only generation.
    Host distribution is power-law-skewed (u^3) so a few hosts are hot —
    the same shape the Zipf fixture graph has, at bench scale."""
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)) / 1_000_000.0)
    host_id = F.floor(F.lit(n_hosts) * F.pow(u, 3.0)).cast("int")
    df = spark.range(n_urls).select(
        F.col("id").alias("seq"),
        host_id.alias("host_id"),
    )
    url = F.concat(F.lit("http://h"), F.col("host_id").cast("string"),
                   F.lit(".example/p/"), F.col("seq").cast("string"))
    depth = F.pmod(F.col("seq"), F.lit(6)).cast("int")
    return df.select(
        url.alias("url"),
        F.md5(url).alias("url_hash"),
        F.concat(F.lit("h"), F.col("host_id").cast("string"), F.lit(".example")).alias("host"),
        depth.alias("depth"),
        quantize_priority(
            depth.cast("double") + 0.1 * F.log1p(F.pmod(F.xxhash64(url), F.lit(100)).cast("double"))
        ).alias("priority"),
        F.col("seq"),
        F.lit(None).cast("string").alias("parent"),
        F.lit("queued").alias("state"),
        F.lit(0).alias("attempt"),
        F.lit(0).cast("long").alias("enqueued_batch"),
    )


def bench_frontier(spark: SparkSession, n_urls: int) -> dict:
    """One full scheduling + dedup cycle over n_urls queued + n_urls/2
    candidate links; returns seconds + urls/sec."""
    cfg = CrawlConfig(global_budget=200_000, default_max_active=512, n_salts=8)
    frontier = gen_bench_frontier(spark, n_urls)
    frontier.write.mode("overwrite").parquet("/tmp/loong_bench/frontier")
    frontier = spark.read.parquet("/tmp/loong_bench/frontier")

    cand = gen_bench_frontier(spark, n_urls // 2).withColumn(
        "url_hash", F.md5(F.concat(F.col("url"), F.lit("?v=2")))
    )
    cand.write.mode("overwrite").parquet("/tmp/loong_bench/cand")
    cand = spark.read.parquet("/tmp/loong_bench/cand")
    # seen set ≈ 30% of candidates → dedup pressure
    seen = cand.filter(F.pmod(F.xxhash64("url_hash"), F.lit(10)) < 3).select("url_hash")
    seen.write.mode("overwrite").parquet("/tmp/loong_bench/seen")
    seen = spark.read.parquet("/tmp/loong_bench/seen")

    t0 = time.time()
    # schedule: two-phase per-host top-k + global budget (frontier.schedule
    # inlined with a constant cap — no politeness table at bench scale)
    salt = F.pmod(F.xxhash64("url_hash"), F.lit(cfg.n_salts))
    w1 = Window.partitionBy("host", salt).orderBy(*ORDER_COLS)
    w2 = Window.partitionBy("host").orderBy(*ORDER_COLS)
    sched = (
        frontier.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= cfg.default_max_active)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= cfg.default_max_active)
        .orderBy(*ORDER_COLS)
        .limit(cfg.global_budget)
    )
    n_sched = sched.count()
    t_sched = time.time() - t0

    t1 = time.time()
    w_dup = Window.partitionBy("url_hash").orderBy("seq")
    admitted = (
        cand.withColumn("rn", F.row_number().over(w_dup)).filter(F.col("rn") == 1)
        .join(seen, "url_hash", "left_anti")
    )
    n_admitted = admitted.count()
    t_dedup = time.time() - t1

    total = t_sched + t_dedup
    processed = n_urls + n_urls // 2
    return {
        "sec_schedule": round(t_sched, 3),
        "sec_dedup": round(t_dedup, 3),
        "n_scheduled": n_sched,
        "n_admitted": n_admitted,
        "urls_per_sec": round(processed / total, 1),
        "sec": round(total, 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = int(os.environ.get("LOONG_BENCH_URLS", "2000000"))
    spark = get_spark("loong-bench", cores=cpus)

    import __spark_entry__ as entry

    queries = {}
    t_all0 = time.time()

    fb = bench_frontier(spark, n_urls)
    queries["frontier_schedule"] = fb["sec_schedule"]
    queries["frontier_dedup"] = fb["sec_dedup"]

    headline = [
        "frontier_schedule_topk", "politeness_eligibility", "priority_rescore",
        "dedup_anti_join", "upsert_latest", "host_metrics",
        "tpch_q1", "tpch_q3", "tpch_q5",
        "docs_exact_dedup", "docs_minhash_lsh", "docs_simhash", "docs_quality",
        "emb_cosine_topk", "emb_ann_topk",
    ]
    qs = entry.queries()
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_all0, 3)
    print(json.dumps({
        "metric": "frontier urls scheduled+deduped/sec + headline query latencies",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "extra": {
            "frontier_urls_per_sec": fb["urls_per_sec"],
            "frontier_n_urls": n_urls,
            "n_scheduled": fb["n_scheduled"],
            "n_admitted": fb["n_admitted"],
            "cpus": cpus,
        },
    }))


if __name__ == "__main__":
    main()
