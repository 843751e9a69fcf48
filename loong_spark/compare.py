"""Golden comparison: Spark pipeline state vs the pure-Python oracle.

Used by pytest (FIXTURES.md §6 golden outputs) and the CLI's `verify`
subcommand. All comparisons are EXACT (order, sets, span sequences).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .oracle import OracleResult
from .pipeline import CrawlPipeline


def spark_crawl_order(pipe: CrawlPipeline) -> list[tuple[int, int, str]]:
    rows = (
        pipe.store.read("crawl_order")
        .orderBy("batch_id", "within_batch_rank")
        .collect()
    )
    return [(r["batch_id"], r["within_batch_rank"], r["url"]) for r in rows]


def spark_seen(pipe: CrawlPipeline) -> set[str]:
    return {r["url_hash"] for r in pipe.store.read("seen").select("url_hash").collect()}


def spark_docs(pipe: CrawlPipeline) -> dict[str, list[dict]]:
    out = {}
    for r in pipe.store.read("docs").collect():
        out[r["doc_id"]] = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in r["spans"]
        ]
    return out


def spark_metrics(pipe: CrawlPipeline) -> list[dict]:
    rows = pipe.store.read("metrics").orderBy("batch_id").collect()
    return [r.asDict() for r in rows]


def assert_matches_oracle(pipe: CrawlPipeline, golden: OracleResult, batches: int | None = None):
    """Exact-match assertions: crawl order, URL-seen set, per-row span
    sequences (kind, text, media_ref, order), and per-batch metrics."""
    got_order = spark_crawl_order(pipe)
    want_order = golden.crawl_order
    if batches is not None:
        got_order = [t for t in got_order if t[0] <= batches]
        want_order = [t for t in want_order if t[0] <= batches]
    assert got_order == want_order, (
        f"crawl order diverged: first diff at "
        f"{next((i, a, b) for i, (a, b) in enumerate(zip(got_order, want_order)) if a != b) if got_order and want_order else (len(got_order), len(want_order))}"
    )

    if batches is None:
        assert spark_seen(pipe) == golden.url_seen, "URL-seen set mismatch"

    got_docs = spark_docs(pipe)
    want_docs = golden.docs
    if batches is None:
        assert set(got_docs) == set(want_docs), "doc_id set mismatch"
    for doc_id, spans in got_docs.items():
        if doc_id in want_docs:
            assert spans == want_docs[doc_id], f"span sequence mismatch for {doc_id}"

    got_m = spark_metrics(pipe)
    want_m = golden.metrics
    if batches is not None:
        got_m = [m for m in got_m if m["batch_id"] <= batches]
        want_m = [m for m in want_m if m["batch_id"] <= batches]
    assert got_m == want_m, f"metrics mismatch:\n got={got_m}\nwant={want_m}"
