"""Size-aware state-join strategy (config.broadcast_limit_bytes): the
host_state/politeness joins broadcast while small and become shuffle-hash
equi-joins above the limit — the 10^7-known-hosts regime must never
mandate a multi-GB broadcast per batch, and results must be identical in
both regimes (the strategy is physical only).
"""

import contextlib
import io

from pyspark.sql import functions as F

from loong_spark.compare import assert_matches_oracle
from loong_spark.config import CrawlConfig
from loong_spark.frontier import eligible
from loong_spark.gen import TINY
from loong_spark.oracle import run_oracle
from tests.test_pipeline_e2e import make_pipeline


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _fixtures(spark):
    queued = spark.range(0, 5000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string"), F.lit(".example")).alias("host"),
        F.lit(1).alias("depth"),
        F.lit(1.0).alias("priority"),
        F.col("id").alias("seq"),
    )
    host_state = spark.range(0, 50).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
        (F.col("id") % 7).cast("long").alias("next_eligible"),
        F.lit(3).cast("long").alias("seen_count"),
    )
    return queued, host_state


def test_eligible_plan_shape_both_regimes(spark):
    queued, host_state = _fixtures(spark)
    small = _plan(eligible(queued, host_state, 5, broadcast_state=True))
    assert "BroadcastHashJoin" in small and "ShuffledHashJoin" not in small
    big = _plan(eligible(queued, host_state, 5, broadcast_state=False))
    assert "ShuffledHashJoin" in big and "BroadcastHashJoin" not in big
    assert "SortMergeJoin" not in big  # equi-join on host, hash build

    # physical only: both regimes admit the identical row set
    a = {r.seq for r in eligible(queued, host_state, 5, broadcast_state=True).collect()}
    b = {r.seq for r in eligible(queued, host_state, 5, broadcast_state=False).collect()}
    assert a == b and a  # non-trivial


def test_seen_anti_join_never_broadcasts_seen(spark):
    """The F1 exact backstop must keep its shuffle_hash build even when
    `seen` is tiny (the stats mis-estimate scenario: at 10^10 rows a
    broadcast attempt kills the driver)."""
    from loong_spark.pipeline import seen_anti_join

    cand = spark.range(0, 1000).select(
        F.md5(F.col("id").cast("string")).alias("url_hash"), F.col("id")
    )
    seen = spark.range(0, 10).select(F.md5(F.col("id").cast("string")).alias("url_hash"))
    plan = _plan(seen_anti_join(cand, seen))
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastHashJoin" not in plan
    assert seen_anti_join(cand, seen).count() == 990


def test_crawl_matches_oracle_in_shuffle_regime(spark, warehouse):
    """broadcast_limit_bytes=0 forces the big-regime strategy (shuffle
    joins for host_state, tombstones, delta folds) through the WHOLE
    crawl loop — oracle equality must be untouched."""
    cfg = CrawlConfig(global_budget=20, use_bloom=False, broadcast_limit_bytes=0)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run()
    assert_matches_oracle(pipe, golden)


def test_seen_anti_join_partitions_scale_with_seen_bytes(spark):
    """ADVICE r5: the build side is necessarily `seen` (SHJ can't
    BuildLeft for LEFT ANTI), so the partition count must scale with
    |seen| — above the per-task build budget both sides repartition to
    ceil(seen_bytes / SEEN_BUILD_PARTITION_BYTES); below it the plan is
    untouched. Results identical in both regimes."""
    from loong_spark.pipeline import SEEN_BUILD_PARTITION_BYTES, seen_anti_join

    cand = spark.range(0, 1000).select(
        F.md5(F.col("id").cast("string")).alias("url_hash"), F.col("id")
    )
    seen = spark.range(0, 10).select(F.md5(F.col("id").cast("string")).alias("url_hash"))

    big = seen_anti_join(cand, seen, seen_bytes=100 * SEEN_BUILD_PARTITION_BYTES,
                         min_partitions=32)
    plan = _plan(big)
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
    # the explicit repartition carries the scaled partition count
    assert "100" in plan.replace(",", " ")
    small = seen_anti_join(cand, seen, seen_bytes=1024, min_partitions=32)
    assert "ShuffledHashJoin" in _plan(small)
    assert big.count() == small.count() == 990
