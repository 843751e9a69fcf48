"""SnapshotStore — snapshot-versioned parquet tables with atomic commits
and O(batch) delta appends.

The sandbox has no Iceberg runtime jar, so this provides the same commit
model Iceberg gives us (immutable data files + manifests + an atomically
swapped pointer), backed by plain parquet directories:

    <warehouse>/<table>/d<N>/part-*.parquet   (immutable data dirs; a dir
                                               is written exactly once)
    <warehouse>/<table>/m<N>.json             (per-version manifest: the
                                               list of data dirs that make
                                               up snapshot N)
    <warehouse>/<table>/MANIFEST.json         (current version pointer,
                                               written via os.replace —
                                               atomic on POSIX)

Commit protocol (identical shape to Iceberg's):

* ``commit``  (replace) — write one new data dir, manifest = [that dir].
* ``append``  — write ONLY the new rows into a fresh data dir; the new
  manifest = previous manifest's dirs + the new dir. **I/O is O(batch),
  not O(table)** — this is the property that makes append-only tables
  (seen / docs / crawl_order / metrics) viable at 10^10 URLs, where a
  read-union-rewrite append would make total write cost O(n²).
* reads open the union of the manifest's dirs (Spark's multi-path
  parquet reader — still one distributed scan, partition-pruned).
* ``rollback`` just points MANIFEST.json at an older version's manifest;
  old data dirs stay on disk until ``vacuum``.

Appends amortize read cost with Iceberg-style compaction: when a
manifest would exceed ``compact_threshold`` dirs, the append rewrites
the union into a single dir (amortized O(total·log(total)/threshold)
over a run — the same trade Iceberg's rewrite_data_files makes).

On a real cluster with Iceberg configured (see session.py), each commit
maps to ``df.writeTo(f"loong.{table}")`` append/createOrReplace and the
manifest is Iceberg's own metadata; checkpoints then record Iceberg
snapshot ids instead of version numbers. The pipeline only touches this
interface, so the swap is one class.

Scale note: reads and writes stay fully distributed (executors write
part files); only the pointer swap is driver-side — identical to
Iceberg's commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _entry_dir(e) -> str:
    """Manifest entry → data dir name. Entries are plain strings (every
    row in the dir is live) or dicts {'dir', 'key', 'keys'|'except'}
    (only rows whose key column is in 'keys' / not in 'except' are live
    — the merge_keyed delta-write format)."""
    return e if isinstance(e, str) else e["dir"]


class SnapshotStore:
    def __init__(self, spark: SparkSession, warehouse: str, compact_threshold: int = 24):
        self.spark = spark
        self.warehouse = warehouse
        self.compact_threshold = compact_threshold
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _mpath(self, table: str) -> str:
        return os.path.join(self._tdir(table), "MANIFEST.json")

    def _vmpath(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), f"m{version}.json")

    def current_version(self, table: str) -> int:
        try:
            with open(self._mpath(table)) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return -1

    def _manifest(self, table: str, version: int) -> list[str]:
        """Data dir names for snapshot ``version``."""
        with open(self._vmpath(table, version)) as f:
            return json.load(f)["dirs"]

    def _swap(self, table: str, version: int, dirs: list[str]) -> None:
        """Write the version manifest, then atomically move the pointer.
        A crash between the two writes leaves the table at the old
        version with an orphan manifest — same failure model as Iceberg
        (metadata committed last wins)."""
        os.makedirs(self._tdir(table), exist_ok=True)
        vtmp = self._vmpath(table, version) + ".tmp"
        with open(vtmp, "w") as f:
            json.dump({"table": table, "version": version, "dirs": dirs}, f)
        os.replace(vtmp, self._vmpath(table, version))
        tmp = self._mpath(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"table": table, "version": version}, f)
        os.replace(tmp, self._mpath(table))  # atomic pointer swap

    # -- data ---------------------------------------------------------------
    def _ddir(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), f"d{version}")

    def exists(self, table: str) -> bool:
        return self.current_version(table) >= 0

    def read(
        self,
        table: str,
        schema: T.StructType | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot, or time-travel to an older
        ``version`` (Iceberg VERSION AS OF): any un-vacuumed snapshot is
        readable because its manifest still lists its data dirs."""
        v = self.current_version(table) if version is None else version
        if v < 0:
            if schema is None:
                raise FileNotFoundError(f"table {table} has no snapshot and no schema given")
            return self.spark.createDataFrame([], schema)
        if version is not None and not os.path.isfile(self._vmpath(table, version)):
            raise FileNotFoundError(
                f"{table} snapshot m{version}.json missing (vacuumed or never written)"
            )
        entries = self._manifest(table, v)
        base = self._tdir(table)
        if all(isinstance(e, str) for e in entries):
            return self.spark.read.parquet(*[os.path.join(base, e) for e in entries])
        # keyed entries (merge_keyed deltas): union of per-dir scans, each
        # filtered to the dir's live keys — the isin predicate pushes into
        # the parquet scan, so superseded key versions are row-group-pruned
        dfs = []
        for e in entries:
            df = self.spark.read.parquet(os.path.join(base, _entry_dir(e)))
            if isinstance(e, dict):
                if "keys" in e:
                    if not e["keys"]:
                        continue
                    df = df.filter(F.col(e["key"]).isin(e["keys"]))
                elif e.get("except"):
                    df = df.filter(~F.col(e["key"]).isin(e["except"]))
            dfs.append(df)
        if not dfs:
            if schema is None:
                raise FileNotFoundError(f"table {table} snapshot {v} is empty, no schema given")
            return self.spark.createDataFrame([], schema)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def table_bytes(self, table: str) -> int:
        """On-disk bytes of the current snapshot's data dirs — a pure
        metadata probe (no Spark job), used for size-aware join-strategy
        decisions (broadcast vs shuffle, config.broadcast_limit_bytes).
        Keyed-delta entries count their whole dir (masked rows included)
        — conservative in the safe direction for a broadcast gate. On a
        real Iceberg catalog this is the snapshot's total-file-size
        summary field."""
        v = self.current_version(table)
        if v < 0:
            return 0
        total = 0
        base = self._tdir(table)
        for e in self._manifest(table, v):
            d = os.path.join(base, _entry_dir(e))
            if not os.path.isdir(d):
                continue
            for root, _dirs, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
        return total

    def commit(self, table: str, df: DataFrame) -> int:
        """Write a full new snapshot and swap the pointer (replace)."""
        v = self.current_version(table) + 1
        df.write.mode("overwrite").parquet(self._ddir(table, v))
        self._swap(table, v, [f"d{v}"])
        return v

    def append(self, table: str, df: DataFrame, schema: T.StructType | None = None) -> int:
        """Delta append: write ONLY ``df``'s rows to a fresh data dir and
        publish a manifest of old dirs + the new one — O(batch) I/O.
        Compacts (rewrite-union) when the manifest grows past
        ``compact_threshold`` dirs, Iceberg-rewrite_data_files style."""
        cur = self.current_version(table)
        if cur < 0:
            return self.commit(table, df)
        v = cur + 1
        old_dirs = self._manifest(table, cur)
        if len(old_dirs) + 1 > self.compact_threshold:
            # amortized compaction: one rewrite every ~threshold appends
            return self.commit(table, self.read(table).unionByName(df))
        df.write.mode("overwrite").parquet(self._ddir(table, v))
        self._swap(table, v, old_dirs + [f"d{v}"])
        return v

    def merge_keyed(self, table: str, df: DataFrame, key_col: str, keys: list) -> int:
        """Key-partitioned delta write: ``df`` carries the complete NEW
        rows for ``keys`` (full per-key replacement); every other key is
        carried forward in the manifest, NOT rewritten — **I/O is
        O(touched keys), not O(table)**. This is what keeps the bloom
        seen_shards table viable per-batch at 10^10 URLs: a batch that
        touches 12 of 1024 shards writes 12 bitsets, not 12.5 GB.

        Old manifest entries get the new keys masked out ('except' for
        plain dirs, set-minus for keyed ones); the new dir is live for
        exactly ``keys``. Reads reconstruct the union (see read()).
        Compacts to a single plain dir past compact_threshold entries."""
        keys = sorted(keys)
        cur = self.current_version(table)
        if cur < 0:
            return self.commit(table, df)
        entries = self._manifest(table, cur)
        if len(entries) + 1 > self.compact_threshold:
            merged = self.read(table).filter(~F.col(key_col).isin(keys)).unionByName(df)
            return self.commit(table, merged)
        v = cur + 1
        df.write.mode("overwrite").parquet(self._ddir(table, v))
        dropped = set(keys)
        new_entries: list = []
        for e in entries:
            if isinstance(e, str):
                new_entries.append({"dir": e, "key": key_col, "except": keys})
            elif "keys" in e:
                kept = [k for k in e["keys"] if k not in dropped]
                if kept:
                    new_entries.append({"dir": e["dir"], "key": key_col, "keys": kept})
            else:
                new_entries.append(
                    {
                        "dir": e["dir"],
                        "key": key_col,
                        "except": sorted(set(e["except"]) | dropped),
                    }
                )
        new_entries.append(f"d{v}")  # the new dir is live in full
        self._swap(table, v, new_entries)
        return v

    def rollback(self, table: str, version: int) -> None:
        """Point the table back at an older snapshot (resume support) and
        DELETE everything above it: commit/append reuse version numbers
        after a rollback, so a stale orphan manifest m{v+1} (or its data
        dir) left behind would be readable via time-travel — or silently
        rewritten in place — during the window before the numbers are
        reused. Rolled-back snapshots are uncommitted by definition;
        dropping them is the correct (Iceberg-like) behavior."""
        if not os.path.isfile(self._vmpath(table, version)):
            raise FileNotFoundError(f"{table} m{version}.json missing")
        dirs = self._manifest(table, version)
        self._swap(table, version, dirs)
        tdir = self._tdir(table)
        live: set[str] = set()
        for name in list(os.listdir(tdir)):
            if name.startswith("m") and name[1:-5].isdigit() and name.endswith(".json"):
                v = int(name[1:-5])
                if v > version:
                    os.remove(os.path.join(tdir, name))
                else:
                    try:
                        live.update(_entry_dir(e) for e in self._manifest(table, v))
                    except FileNotFoundError:
                        pass
        for name in list(os.listdir(tdir)):
            if name.startswith("d") and name[1:].isdigit() and name not in live:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)

    def vacuum(self, table: str, keep: int = 2) -> None:
        """Drop snapshots older than the newest ``keep``: delete manifests
        below the horizon, then any data dir no kept manifest references
        (delta dirs shared by several snapshots survive until every
        referencing snapshot ages out — Iceberg expire_snapshots)."""
        cur = self.current_version(table)
        tdir = self._tdir(table)
        if cur < 0 or not os.path.isdir(tdir):
            return
        horizon = cur - keep + 1
        live: set[str] = set()
        for name in list(os.listdir(tdir)):
            if name.startswith("m") and name[1:-5].isdigit() and name.endswith(".json"):
                v = int(name[1:-5])
                if v < horizon:
                    os.remove(os.path.join(tdir, name))
                else:
                    try:
                        live.update(_entry_dir(e) for e in self._manifest(table, v))
                    except FileNotFoundError:
                        pass
        for name in list(os.listdir(tdir)):
            if name.startswith("d") and name[1:].isdigit() and name not in live:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
