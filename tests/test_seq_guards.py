"""seq bit-field overflow guards (pipeline.SEQ_*): overflowing
global_budget / max_batches / batch_id / link_idx must fail LOUDLY —
silent wraparound would corrupt the pinned total order (the crawl's
determinism key) without any visible error.
"""

import pytest
from pyspark.sql import functions as F

from loong_spark.config import CrawlConfig
from loong_spark.pipeline import SEQ_BATCH_MAX, SEQ_LINK_BITS, SEQ_RANK_BITS, CrawlPipeline


def test_budget_overflow_rejected_at_construction(spark, warehouse):
    with pytest.raises(ValueError, match="parent_rank"):
        CrawlPipeline(spark, warehouse, CrawlConfig(global_budget=1 << SEQ_RANK_BITS))
    # one under the bound constructs fine
    CrawlPipeline(spark, warehouse, CrawlConfig(global_budget=(1 << SEQ_RANK_BITS) - 1))


def test_max_batches_overflow_rejected_at_construction(spark, warehouse):
    with pytest.raises(ValueError, match="robots bit"):
        CrawlPipeline(spark, warehouse, CrawlConfig(max_batches=SEQ_BATCH_MAX))


def test_batch_id_overflow_rejected_in_seq(spark, warehouse):
    pipe = CrawlPipeline(spark, warehouse, CrawlConfig())
    with pytest.raises(ValueError, match="batch_id"):
        pipe._seq(SEQ_BATCH_MAX)
    with pytest.raises(ValueError, match="batch_id"):
        pipe._seq(-1)


def test_link_idx_overflow_raises_in_execution(spark, warehouse):
    """A page emitting ≥ 2^20 links must fail the batch with a clear
    error inside the seq expression, not silently reorder its siblings
    by carrying into the parent_rank field."""
    pipe = CrawlPipeline(spark, warehouse, CrawlConfig(use_bloom=False))
    df = spark.createDataFrame(
        [(0, (1 << SEQ_LINK_BITS) - 1), (0, 1 << SEQ_LINK_BITS)],
        "parent_rank int, link_idx int",
    )
    ok = df.filter(F.col("link_idx") < (1 << SEQ_LINK_BITS)).select(
        pipe._seq(3).alias("seq")
    )
    assert ok.collect()[0].seq == (3 << 40) | ((1 << SEQ_LINK_BITS) - 1)
    with pytest.raises(Exception, match="seq overflow"):
        df.select(pipe._seq(3).alias("seq")).collect()
