"""Frontier delta persistence (frontier_deltas): a batch writes O(batch)
— new entries appended to `queued`, removals appended to `dequeued` —
instead of rewriting the whole frontier (O(frontier) ≈ 1 TB/batch at
10^10 URLs). Oracle equality of the delta path itself is covered by the
whole e2e suite (frontier_deltas defaults True); here we pin the write
volume, the tombstone fold, the size arithmetic, and the legacy path.
"""

import json
import os

from loong_spark import schemas
from loong_spark.compare import assert_matches_oracle
from loong_spark.config import CrawlConfig
from loong_spark.gen import TINY
from loong_spark.oracle import run_oracle
from tests.test_pipeline_e2e import make_pipeline


def _dir_rows(spark, warehouse, table, d):
    return spark.read.parquet(os.path.join(warehouse, table, d)).count()


def _manifest_dirs(warehouse, table):
    with open(os.path.join(warehouse, table, "MANIFEST.json")) as f:
        v = json.load(f)["version"]
    with open(os.path.join(warehouse, table, f"m{v}.json")) as f:
        return json.load(f)["dirs"]


def test_batch_writes_are_o_batch(spark, warehouse):
    """The newest queued data dir holds ONLY the batch's new entries and
    the newest dequeued dir ONLY its removals — not the whole frontier."""
    # frac=1e9 disables tombstone-fraction folds so every batch's write
    # shape is observable as its own data dir
    cfg = CrawlConfig(
        global_budget=5, use_bloom=False,
        frontier_compact_every=100, frontier_compact_frac=1e9,
    )
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    metrics = pipe.run(max_batches=4)
    m = metrics[-1]

    qdirs = _manifest_dirs(warehouse, "queued")
    assert len(qdirs) == 5  # bootstrap commit + one append per batch
    newest_q = _dir_rows(spark, warehouse, "queued", qdirs[-1])
    # newest dir = links admitted + retries that batch, NOT the frontier
    assert newest_q <= m["links_discovered"] + m["failed"]
    assert newest_q < m["frontier_size"]

    # write amplification: total rows ever written to queued == bootstrap
    # entries + Σ per-batch admissions — NO batch rewrote the frontier
    # (the tombstone-fraction trigger never fired)
    total_written = sum(_dir_rows(spark, warehouse, "queued", d) for d in qdirs)
    boot_rows = _dir_rows(spark, warehouse, "queued", qdirs[0])
    admitted = sum(
        _dir_rows(spark, warehouse, "queued", d) for d in qdirs[1:]
    )
    assert total_written == boot_rows + admitted  # dirs are disjoint appends
    live = m["frontier_size"]
    # every written row is either still live or tombstoned — nothing was
    # written twice (amplification factor exactly 1.0 between folds)
    tombs_total = pipe.store.read("dequeued", schemas.DEQUEUED).count()
    assert total_written == live + tombs_total

    ddirs = _manifest_dirs(warehouse, "dequeued")
    newest_d = _dir_rows(spark, warehouse, "dequeued", ddirs[-1])
    assert newest_d == m["urls_scheduled"]

    # host_state: base only gains first-seen-host rows; per-batch updates
    # land in the delta table (scheduled hosts + hosts with new URLs)
    hdirs = _manifest_dirs(warehouse, "host_state")
    n_hosts = pipe._read_host_state().count()
    assert _dir_rows(spark, warehouse, "host_state", hdirs[-1]) < n_hosts
    hd = _manifest_dirs(warehouse, "host_state_delta")
    assert _dir_rows(spark, warehouse, "host_state_delta", hd[-1]) <= n_hosts

    # docs land hash-clustered on (host, salt): any host's docs touch at
    # most n_salts files within a batch's data dir (north-rule layout)
    from pyspark.sql import functions as F

    docs_dirs = _manifest_dirs(warehouse, "docs")
    per_host_files = (
        spark.read.parquet(os.path.join(warehouse, "docs", docs_dirs[-1]))
        .select(F.input_file_name().alias("f"), "host")
        .distinct()
        .groupBy("host")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_host_files is not None and per_host_files <= CrawlConfig().n_salts

    # arithmetic live size == materialized live view
    assert pipe._read_frontier().count() == m["frontier_size"]

    # plan shape: the live view is a BROADCAST anti-join (the tombstone
    # side is bounded), never a sort-merge over the 10^10-row frontier
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pipe._read_frontier().explain("formatted")
    plan = buf.getvalue()
    assert "LeftAnti" in plan and "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_compaction_folds_tombstones(spark, warehouse):
    """The queued/dequeued fold triggers on TOMBSTONE FRACTION (any dead
    row with frac=0.0 → every batch folds); host_state deltas fold on the
    batch cadence; results still match the oracle."""
    cfg = CrawlConfig(
        global_budget=20, use_bloom=False,
        frontier_compact_every=2, frontier_compact_frac=0.0,
    )
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    metrics = pipe.run()

    assert_matches_oracle(pipe, golden)
    # frac=0.0: every batch that dequeued anything folded → exactly one
    # live queued dir and zero tombstones at rest
    assert _manifest_dirs(warehouse, "queued") == [
        f"d{pipe.store.current_version('queued')}"
    ]
    assert pipe.store.read("dequeued", schemas.DEQUEUED).count() == 0
    from loong_spark.pipeline import HOST_STATE_DELTA

    last = metrics[-1]["batch_id"]
    hs_deltas = pipe.store.read("host_state_delta", HOST_STATE_DELTA).count()
    if last % 2 == 0:
        assert hs_deltas == 0  # folded into the base on the cadence
    assert pipe._read_frontier().count() == metrics[-1]["frontier_size"]


def test_compaction_trigger_respects_fraction(spark, warehouse):
    """With the default-ish fraction the fold fires only when the dead
    fraction crosses it — not on a batch cadence. We pin the trigger
    arithmetic directly on _maybe_compact_frontier."""
    cfg = CrawlConfig(global_budget=5, use_bloom=False, frontier_compact_frac=0.25)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run(max_batches=1)
    v_before = pipe.store.current_version("queued")
    # below threshold: no fold, tomb count passes through
    assert pipe._maybe_compact_frontier(10, 1000) == 10
    assert pipe.store.current_version("queued") == v_before
    # above threshold: fold — queued rewritten, dequeued reset, count 0
    assert pipe._maybe_compact_frontier(300, 1000) == 0
    assert pipe.store.current_version("queued") == v_before + 1
    assert pipe.store.read("dequeued", schemas.DEQUEUED).count() == 0


def test_full_rewrite_mode_still_matches(spark, warehouse):
    """frontier_deltas=False keeps the original read-modify-write path."""
    cfg = CrawlConfig(global_budget=20, use_bloom=False, frontier_deltas=False)
    golden = run_oracle(TINY, cfg)
    pipe = make_pipeline(spark, warehouse, TINY, cfg)
    pipe.run()
    assert_matches_oracle(pipe, golden)
    assert len(_manifest_dirs(warehouse, "queued")) == 1


def test_delta_to_off_flip_folds_tombstones_once(spark, warehouse):
    """ADVICE r5: flipping frontier_deltas off against a delta-mode
    warehouse must fold the stale tombstones into the first non-delta
    queued snapshot and CLEAR the dequeued table (so later batches stop
    paying the anti-join and the checkpointed tomb_rows=0 is true, not
    pinned) — with the final crawl state still oracle-exact."""
    from loong_spark.pipeline import CrawlPipeline

    cfg_on = CrawlConfig(global_budget=20, use_bloom=False, frontier_deltas=True,
                         frontier_compact_frac=1e9)  # never fold on its own
    golden = run_oracle(TINY, cfg_on)
    pipe = make_pipeline(spark, warehouse, TINY, cfg_on)
    pipe.run(max_batches=2)
    assert pipe.store.read("dequeued", schemas.DEQUEUED).count() > 0  # live tombstones

    cfg_off = CrawlConfig(global_budget=20, use_bloom=False, frontier_deltas=False)
    pipe2 = CrawlPipeline(spark, warehouse, cfg_off)
    pipe2.run()

    assert_matches_oracle(pipe2, golden)  # physical knob only
    assert pipe2.store.read("dequeued", schemas.DEQUEUED).count() == 0
    ck = pipe2.load_checkpoint()
    assert ck["tomb_rows"] == 0
    # a later flip BACK to delta mode resumes with the truthful count
    pipe3 = CrawlPipeline(spark, warehouse, cfg_on)
    assert pipe3._read_frontier().count() == ck["frontier_size"]
