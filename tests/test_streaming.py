"""Structured Streaming surface: windowed per-host rates equal the batch
computation; the stateful politeness gate matches a sequential oracle and
carries state across micro-batches."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from loong_spark.streaming import (
    host_fetch_rates,
    politeness_gate_stream,
    read_event_stream,
    run_available_now,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """events split into two file drops by time (earlier half / later
    half), so multi-batch streaming order == global event-time order."""
    base = tmp_path_factory.mktemp("stream_events")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    mid = ev.select(F.unix_timestamp("ts").alias("u")).approxQuantile("u", [0.5], 0.0)[0]
    src = str(base / "src")
    ev.filter(F.unix_timestamp("ts") <= mid).coalesce(1).write.parquet(f"{src}/d1")
    ev.filter(F.unix_timestamp("ts") > mid).coalesce(1).write.parquet(f"{src}/d2")
    # file source wants a flat dir of files
    flat = str(base / "flat")
    os.makedirs(flat)
    n = 0
    for d in ("d1", "d2"):
        for f in sorted(os.listdir(f"{src}/{d}")):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{d}/{f}", f"{flat}/{d}_{f}")
                n += 1
    assert n == 2
    return flat


def test_windowed_rates_match_batch(spark, event_files, tmp_path):
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    out = run_available_now(
        host_fetch_rates(stream, window="1 minute", watermark="2 minutes"),
        str(tmp_path / "ck1"),
        "rates_stream",
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 minute").alias("win"), F.col("user_id").alias("host_key"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"),
            "host_key", "n_events", "sum_value",
        )
        .collect()
    )
    key = lambda r: (r["win_start"], r["host_key"])  # noqa: E731
    assert {key(r): (r["n_events"], r["sum_value"]) for r in out} == {
        key(r): (r["n_events"], r["sum_value"]) for r in batch
    }


def test_politeness_gate_matches_oracle(spark, event_files, tmp_path):
    delay = 120.0
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    out = run_available_now(
        politeness_gate_stream(stream, delay_s=delay),
        str(tmp_path / "ck2"),
        "gate_stream",
    )
    # sequential oracle: one clock per host over globally time-ordered events
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    clocks: dict[int, float] = {}
    expected = {}
    for _, r in ev.iterrows():
        e = pd.Timestamp(r["ts"]).value / 1e9
        last = clocks.get(r["user_id"])
        ok = last is None or e - last >= delay
        if ok:
            clocks[r["user_id"]] = e
        expected[r["event_id"]] = ok
    got = {r["event_id"]: r["admitted"] for r in out}
    assert len(got) == len(expected)
    assert got == expected
    assert any(expected.values()) and not all(expected.values())  # non-trivial


def test_gate_group_larger_than_one_arrow_batch(spark, tmp_path):
    """A hot host whose micro-batch group spans MANY Arrow chunks (the
    per-group memory-bound path: maxRecordsPerBatch lowered to 16) still
    admits in exact global event-time order — chunk boundaries and the
    shuffled on-disk row order must not leak into the clock."""
    import random
    from datetime import datetime, timedelta

    delay = 30.0
    n = 400  # one host, one trigger file → one group of 25 Arrow chunks
    rows = [(i, datetime(2026, 1, 1) + timedelta(seconds=7 * i)) for i in range(n)]
    random.Random(42).shuffle(rows)  # on-disk order != event-time order
    df = spark.createDataFrame(
        [(eid, ts, 7, "fetch", 1.0, "{}") for eid, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src = str(tmp_path / "hot_events")
    df.coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        out = run_available_now(
            politeness_gate_stream(read_event_stream(spark, src), delay_s=delay),
            str(tmp_path / "ck_hot"),
            "gate_hot",
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    # sequential oracle over event-time order: 7 s spacing, 30 s delay →
    # every 5th event admits
    expected = {eid: (eid % 5 == 0) for eid, _ in rows}
    got = {r["event_id"]: r["admitted"] for r in out}
    assert len(got) == n
    assert got == expected
