"""Sharded bloom URL-seen filter (F1) — broadcast + per-partition state.

The reference keeps one Redis HyperLogLog per host with mutating
test-and-set membership (/root/reference/lib/Loong/Filter.pm:9-27).
The rebuild shards a bloom filter by ``shard_id = xxhash64(url_hash) %
n_shards``; each shard is a numpy bitset persisted in the ``seen_shards``
table and rebuilt/updated per micro-batch with cogrouped
``applyInPandas`` (SURVEY.md §4 custom #2). A compact snapshot of all
shards broadcasts to executors, where a pandas UDF answers "maybe seen?"
fully vectorized (numpy bit ops — no per-row Python).

Correctness: the bloom is a PREFILTER. "definitely unseen" rows skip the
exact anti-join entirely; "maybe seen" rows fall through to the exact
``seen``-table anti-join backstop, so false positives cost a lookup, never
a lost URL. No false negatives by construction.

Scale: bits are sized from ``bloom_expected_per_shard``; at 10^10 URLs
with 10 bits/URL ≈ 12.5 GB total, so n_shards grows to keep each shard
« executor memory. Two probe modes (``cfg.bloom_mode``, default auto):

* ``broadcast`` — collect+broadcast a snapshot of all shards; fastest
  while total bits ≤ BROADCAST_LIMIT_BYTES.
* ``cogroup`` — :meth:`BloomFilterManager.maybe_seen_cogroup`: candidates
  cogroup with ``seen_shards`` on shard_id (same hash both sides), each
  task probes exactly one shard — no driver collect, no broadcast, the
  only shape that survives 12.5 GB of bitsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from .config import CrawlConfig
from .schemas import SEEN_SHARDS

_HASH_COLS = ("_bh1", "_bh2")

#: above this total-bitset size the broadcast snapshot stops being viable
#: (driver collect + per-executor copy); the cogroup path takes over
BROADCAST_LIMIT_BYTES = 32 << 20


def shard_bytes(cfg: CrawlConfig) -> int:
    m_bits = cfg.bloom_expected_per_shard * cfg.bloom_bits_per_url
    return (m_bits + 7) // 8


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) probe bit positions, vectorized uint64 arithmetic."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1u[:, None] + i * h2u[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _test(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Membership: all k bits set. bits is a uint8 array."""
    byte_idx, bit_idx = pos >> 3, (pos & 7).astype(np.uint8)
    probed = (bits[byte_idx] >> bit_idx) & 1
    return probed.all(axis=1)


def _set(bits: np.ndarray, pos: np.ndarray) -> None:
    byte_idx, bit_idx = pos >> 3, (pos & 7).astype(np.uint8)
    np.bitwise_or.at(bits, byte_idx.ravel(), np.uint8(1) << bit_idx.ravel())


class BloomFilterManager:
    """Lifecycle of the seen_shards table for one pipeline run."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self.m_bits = shard_bytes(cfg) * 8
        self._bcast = None  # driver-held broadcast of {shard_id: np.uint8 array}

    @property
    def mode(self) -> str:
        """'broadcast' (snapshot to every executor — fastest while the
        total bitset is small) or 'cogroup' (per-partition shard probe —
        the 10^10-URL path: no driver collect, no broadcast; each task
        sees exactly one shard). cfg.bloom_mode='auto' switches on total
        bitset size."""
        if self.cfg.bloom_mode != "auto":
            return self.cfg.bloom_mode
        total = self.cfg.n_shards * shard_bytes(self.cfg)
        return "broadcast" if total <= BROADCAST_LIMIT_BYTES else "cogroup"

    # -- hashing ------------------------------------------------------------
    def hashed(self, df: DataFrame, url_hash_col: str = "url_hash") -> DataFrame:
        return (
            df.withColumn("_bh1", F.xxhash64(url_hash_col))
            .withColumn("_bh2", F.xxhash64(url_hash_col, F.lit(1)))
            .withColumn("shard_id", F.pmod(F.col("_bh1"), F.lit(self.cfg.n_shards)).cast("int"))
        )

    # -- broadcast snapshot ---------------------------------------------------
    def load_broadcast(self, shards_df: DataFrame) -> None:
        rows = shards_df.select("shard_id", "bits").collect()
        snap = {r["shard_id"]: np.frombuffer(r["bits"], dtype=np.uint8) for r in rows}
        if self._bcast is not None:
            self._bcast.unpersist()
        self._bcast = self.spark.sparkContext.broadcast(
            {"snap": snap, "k": self.cfg.bloom_num_hashes, "m": self.m_bits}
        )

    def maybe_seen_col(self, df: DataFrame) -> DataFrame:
        """Adds boolean ``maybe_seen`` using the broadcast snapshot.
        Rows with maybe_seen=false are PROVABLY unseen."""
        if self._bcast is None:
            return df.withColumn("maybe_seen", F.lit(True))  # no filter yet → exact path
        bcast = self._bcast

        @F.pandas_udf("boolean")
        def probe(h1: pd.Series, h2: pd.Series, shard: pd.Series) -> pd.Series:
            state = bcast.value
            snap, k, m = state["snap"], state["k"], state["m"]
            n = len(h1)
            out = np.zeros(n, dtype=bool)
            h1v, h2v, sv = h1.to_numpy(), h2.to_numpy(), shard.to_numpy()
            for sid in np.unique(sv):
                bits = snap.get(int(sid))
                if bits is None:
                    continue  # empty shard → definitely unseen
                mask = sv == sid
                pos = _positions(h1v[mask], h2v[mask], k, m)
                out[mask] = _test(bits, pos)
            return pd.Series(out)

        return df.withColumn("maybe_seen", probe("_bh1", "_bh2", "shard_id"))

    def maybe_seen_cogroup(self, df: DataFrame, shards_df: DataFrame) -> DataFrame:
        """Adds boolean ``maybe_seen`` WITHOUT any driver collect or
        broadcast: candidates cogroup with their bitset shard on shard_id
        (same hash both sides), so each task probes one shard for its
        slice of candidates — numpy-vectorized, O(candidates) shuffle of
        16-byte keys. This is the 10^10-URL path the broadcast snapshot
        cannot reach (~12.5 GB of bitsets at 10 bits/URL).

        ``df`` must be hashed() output with unique url_hash per row (the
        within-batch dedup upstream guarantees it)."""
        cfg_k, m = self.cfg.bloom_num_hashes, self.m_bits
        out_schema = T.StructType(
            [
                T.StructField("url_hash", T.StringType(), False),
                T.StructField("maybe_seen", T.BooleanType(), False),
            ]
        )

        def probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(cand_pdf):
                return pd.DataFrame(
                    {"url_hash": pd.Series(dtype="object"), "maybe_seen": pd.Series(dtype="bool")}
                )
            if not len(shard_pdf):  # no bitset for this shard yet → all unseen
                flags = np.zeros(len(cand_pdf), dtype=bool)
            else:
                bits = np.frombuffer(shard_pdf["bits"].iloc[0], dtype=np.uint8)
                pos = _positions(
                    cand_pdf["_bh1"].to_numpy(), cand_pdf["_bh2"].to_numpy(), cfg_k, m
                )
                flags = _test(bits, pos)
            return pd.DataFrame({"url_hash": cand_pdf["url_hash"], "maybe_seen": flags})

        cand_keys = df.select("url_hash", "_bh1", "_bh2", "shard_id")
        flags = (
            cand_keys.groupBy("shard_id")
            .cogroup(shards_df.select("shard_id", "bits").groupBy("shard_id"))
            .applyInPandas(probe, schema=out_schema)
        )
        return df.join(flags, "url_hash")

    # -- shard update (cogrouped applyInPandas) -------------------------------
    def updated_shards(
        self, shards_df: DataFrame, new_hashed: DataFrame, batch_id: int
    ) -> DataFrame:
        """Merge this batch's new url hashes into their shards. Cogrouped
        by shard_id so each task touches exactly one bitset."""
        cfg_k, m_bits, nbytes = self.cfg.bloom_num_hashes, self.m_bits, shard_bytes(self.cfg)

        def merge(key, shard_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(key[0])
            if len(shard_pdf):
                bits = np.frombuffer(shard_pdf["bits"].iloc[0], dtype=np.uint8).copy()
                n_items = int(shard_pdf["n_items"].iloc[0])
            else:
                bits = np.zeros(nbytes, dtype=np.uint8)
                n_items = 0
            if len(new_pdf):
                pos = _positions(
                    new_pdf["_bh1"].to_numpy(), new_pdf["_bh2"].to_numpy(), cfg_k, m_bits
                )
                _set(bits, pos)
                n_items += len(new_pdf)
            return pd.DataFrame(
                {
                    "shard_id": [sid],
                    "bits": [bits.tobytes()],
                    "n_items": [n_items],
                    "updated_batch": [batch_id],
                }
            )

        new_keys = new_hashed.select("shard_id", "_bh1", "_bh2")
        return (
            shards_df.groupBy("shard_id")
            .cogroup(new_keys.groupBy("shard_id"))
            .applyInPandas(merge, schema=SEEN_SHARDS)
        )
