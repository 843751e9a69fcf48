"""Structured Streaming surface for the crawl engine.

The reference is an unbounded incremental dataflow (SURVEY.md §2.9:
``Mojo::IOLoop->recurring`` timer draining a queue,
/root/reference/lib/Loong/Crawler.pm:107-136). The batch pipeline
(pipeline.py) implements it as a resumable driver loop — the
Trigger.AvailableNow model. This module is the genuine ``readStream``
expression of the same dataflow for deployments where fetch events /
frontier feeds arrive continuously (file drops, Kafka):

* :func:`read_event_stream` — file-source stream over an events directory
  (schema-pinned parquet; maxFilesPerTrigger bounds batch size).
* :func:`host_fetch_rates` — watermarked tumbling-window per-host counts:
  the streaming twin of the A2 active-connection metric
  (/root/reference/lib/Loong/Mojo/UserAgent.pm:41-51) with late-data
  handling the reference lacks.
* :func:`politeness_gate_stream` — ``applyInPandasWithState`` custom
  stateful operator: a per-host politeness clock (O2,
  /root/reference/lib/Loong/Crawler.pm:111-114) that admits at most one
  event per host per ``delay_s`` of event time, state = last admitted
  timestamp per host. GroupStateTimeout evicts idle hosts so state stays
  bounded at 10^7+ hosts.

Scale notes: the windowed aggregation shuffles by (window, host) — the
same keys the batch engine uses, so state partitioning matches the
frontier's host hashing; watermark bounds state size; the stateful gate
keeps one 8-byte timestamp per active host per partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

GATED = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("admitted", T.BooleanType(), False),
    ]
)

_STATE = T.StructType([T.StructField("last_admit_epoch", T.DoubleType(), True)])


def read_event_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream (parquet drops into events_dir). Schema is
    pinned — streaming sources never infer."""
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def host_fetch_rates(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    host_col: str = "user_id",
) -> DataFrame:
    """Watermarked tumbling-window per-host event counts + value sum.
    Late rows beyond the watermark drop (bounded state); output appends
    once each window finalizes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col(host_col).alias("host_key"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host_key",
            "n_events",
            "sum_value",
        )
    )


def politeness_gate_stream(
    events: DataFrame,
    delay_s: float = 60.0,
    host_col: str = "user_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: per-host politeness clock over a stream.

    For each host (group), admit an event iff its event time is ≥
    ``delay_s`` after the last ADMITTED event's time; state is that one
    timestamp. Within a micro-batch the group's rows are processed in
    event-time order, so the admission sequence is deterministic and
    matches the batch engine's eligibility semantics (frontier.eligible)
    applied tick-by-tick.

    ``idle_timeout_ms``: enable ONLY on continuous deployments — it evicts
    idle hosts' state (bounded memory at 10^7+ hosts) via a processing-time
    timer, but a Trigger.AvailableNow drain then keeps running micro-batches
    until every timer fires, so bounded test/backfill runs must leave it
    None (NoTimeout).
    """

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last_admit,) = state.get if state.exists else (None,)
        # A host group larger than one Arrow batch arrives as MULTIPLE
        # chunks, and chunk order is NOT event-time order, so admission
        # (which depends on the group's global event-time sequence) needs
        # every row's ordering keys before the clock can run. Memory is
        # bounded by accumulating ONLY the two 8-byte admission keys per
        # row — payload columns (value, props: the wide part of EVENTS)
        # are dropped chunk-by-chunk as they stream in, and the HOST KEY
        # is constant within an applyInPandasWithState group, so it is
        # taken once from ``key`` and tiled only at emit time instead of
        # held as a per-row Python string (~60-100 B each — ADVICE r4).
        # A hot host therefore holds 16 B/row for the trigger (a
        # 10^8-event trigger group = 1.6 GB keys vs OOM with full rows;
        # bound the trigger itself with maxFilesPerTrigger for hotter
        # hosts).
        ts_parts: list = []
        eid_parts: list = []
        for pdf in pdfs:
            if len(pdf):
                ts_parts.append(pdf["ts"].to_numpy())
                eid_parts.append(pdf["event_id"].to_numpy())
        if ts_parts:
            import numpy as np

            (uid_val,) = key  # the group key: one value for every row
            ts = np.concatenate(ts_parts)
            eid = np.concatenate(eid_parts)
            order = np.lexsort((eid, ts))  # event-time order, id tie-break
            ts, eid = ts[order], eid[order]
            epochs = ts.astype("int64") / 1e9
            admitted = np.empty(len(ts), dtype=bool)
            for i, e in enumerate(epochs):  # per-host sequential clock
                # (tiny per-event work); the cross-host work parallelizes
                ok = last_admit is None or e - last_admit >= delay_s
                if ok:
                    last_admit = float(e)
                admitted[i] = ok
            # emit in bounded slices: the output frame never doubles the
            # group's working set
            step = 1 << 16
            for s in range(0, len(ts), step):
                n_out = len(ts[s : s + step])
                yield pd.DataFrame(
                    {
                        "user_id": np.repeat(uid_val, n_out),
                        "event_id": eid[s : s + step],
                        "ts": ts[s : s + step],
                        "admitted": admitted[s : s + step],
                    }
                )
        state.update((last_admit,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)

    return events.groupBy(F.col(host_col)).applyInPandasWithState(
        gate,
        outputStructType=GATED,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "loong_stream",
    output_mode: str = "append",
) -> list:
    """Drain all available input into an in-memory sink (tests/demos);
    production swaps format('memory') for the docs/metrics sink. Use
    output_mode='complete' for windowed aggs you want fully emitted
    (append withholds windows the watermark hasn't closed)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()
