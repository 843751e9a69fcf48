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


def test_resume_drops_tables_missing_at_checkpoint(spark, warehouse):
    """Crash during the FIRST log_requests batch, after its partial
    `requests` append but before the checkpoint swap: the checkpointed
    version is -1 (the table didn't exist yet), so resume must DROP the
    partial table — otherwise the re-run batch appends duplicate audit
    rows (requests has no self-healing anti-join, unlike media_blobs)."""
    from loong_spark import schemas

    cfg = CrawlConfig(global_budget=20, use_bloom=False, log_requests=True)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)  # checkpoint @ batch 0

    # partial batch 1: the requests append landed, nothing else did
    stray = spark.createDataFrame(
        [(1, 0, "http://stray.example/", "stray.example", "UA/1.0", None, None)],
        schemas.REQUESTS,
    )
    pipe.store.append("requests", stray, schemas.REQUESTS)

    pipe2 = CrawlPipeline(spark, warehouse, cfg)
    pipe2.run()
    reqs = pipe2.store.read("requests", schemas.REQUESTS).collect()
    order = pipe2.store.read("crawl_order").collect()
    assert len(reqs) == len(order)  # the stray partial append is gone
    assert {(r.batch_id, r.within_batch_rank, r.url) for r in reqs} == {
        (o.batch_id, o.within_batch_rank, o.url) for o in order
    }
    assert all(r.url != "http://stray.example/" for r in reqs)


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
