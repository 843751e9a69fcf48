"""Checkpoint/resume (M5): kill mid-crawl, resume, end state identical.

The checkpoint is per-batch atomic (tables commit, then checkpoint.json
swaps), so resume = rollback to the last committed batch + continue —
equivalence with an uninterrupted run is exact, not approximate.
"""

from loong_spark.compare import assert_matches_oracle
from loong_spark.config import CrawlConfig
from loong_spark.gen import TINY
from loong_spark.oracle import run_oracle
from loong_spark.pipeline import CrawlPipeline
from tests.test_pipeline_e2e import make_pipeline


def test_kill_and_resume_equals_straight_run(spark, warehouse):
    cfg = CrawlConfig(global_budget=20, use_bloom=True, n_shards=4)
    golden = run_oracle(TINY, cfg)

    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=5)  # "crash" after batch 5

    # brand-new pipeline object over the same warehouse = process restart
    pipe2 = CrawlPipeline(spark, warehouse, cfg)
    assert pipe2.load_checkpoint()["batch_id"] == 5
    pipe2.run()  # continues from batch 6 to drain

    assert_matches_oracle(pipe2, golden)


def test_resume_discards_partial_commits(spark, warehouse):
    """Simulate a crash between a table commit and the checkpoint swap:
    the stray newer snapshot must be rolled back on resume."""
    cfg = CrawlConfig(global_budget=20, use_bloom=False)
    golden = run_oracle(TINY, cfg)

    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=3)

    # partial batch 4: docs got an extra (uncommitted-by-checkpoint) snapshot
    docs = pipe.store.read("docs")
    pipe.store.commit("docs", docs.limit(1))

    pipe2 = CrawlPipeline(spark, warehouse, cfg)
    pipe2.run()
    assert_matches_oracle(pipe2, golden)


def test_resume_discards_partial_tombstones(spark, warehouse):
    """Crash AFTER a batch appended its dequeued tombstones (and some
    host_state deltas) but BEFORE the checkpoint swap: resume must roll
    both delta tables back, or the re-run batch would double-remove."""
    from pyspark.sql import functions as F

    from loong_spark import schemas
    from loong_spark.pipeline import HOST_STATE_DELTA

    cfg = CrawlConfig(global_budget=20, use_bloom=False)
    golden = run_oracle(TINY, cfg)

    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=3)

    # partial batch 4: tombstone some live frontier rows + a stray
    # host_state delta, then "crash" (no checkpoint write)
    live = pipe._read_frontier().select("seq").limit(3)
    pipe.store.append("dequeued", live, schemas.DEQUEUED)
    pipe.store.append(
        "host_state_delta",
        pipe.store.read("host_state").limit(1).select(
            "host",
            F.lit(999).cast("long").alias("_ne_new"),
            F.lit(5).cast("long").alias("_added"),
            F.lit(4).cast("long").alias("batch_id"),
        ),
        HOST_STATE_DELTA,
    )

    pipe2 = CrawlPipeline(spark, warehouse, cfg)
    pipe2.run()
    assert_matches_oracle(pipe2, golden)
