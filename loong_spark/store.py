"""SnapshotStore — snapshot-versioned parquet tables with atomic commits.

The sandbox has no Iceberg runtime jar, so this provides the same commit
model Iceberg gives us (immutable snapshots + an atomically-swapped
pointer), backed by plain parquet directories:

    <warehouse>/<table>/v<N>/part-*.parquet     (immutable snapshot data)
    <warehouse>/<table>/MANIFEST.json           (current version pointer,
                                                 written via os.replace —
                                                 atomic on POSIX)

On a real cluster with Iceberg configured (see session.py), each commit
maps to ``df.writeTo(f"loong.{table}").createOrReplace()`` /
``MERGE INTO`` and the manifest is Iceberg's own metadata; checkpoints
then record Iceberg snapshot ids instead of version numbers. The pipeline
only touches this interface, so the swap is one class.

Scale note: reads and writes stay fully distributed (executors write
part files); only the pointer swap is driver-side — identical to
Iceberg's commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotStore:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    def _mpath(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "MANIFEST.json")

    def current_version(self, table: str) -> int:
        try:
            with open(self._mpath(table)) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return -1

    def _swap(self, table: str, version: int) -> None:
        tmp = self._mpath(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"table": table, "version": version}, f)
        os.replace(tmp, self._mpath(table))  # atomic pointer swap

    # -- data ---------------------------------------------------------------
    def _vdir(self, table: str, version: int) -> str:
        return os.path.join(self.warehouse, table, f"v{version}")

    def exists(self, table: str) -> bool:
        return self.current_version(table) >= 0

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        v = self.current_version(table)
        if v < 0:
            if schema is None:
                raise FileNotFoundError(f"table {table} has no snapshot and no schema given")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._vdir(table, v))

    def commit(self, table: str, df: DataFrame) -> int:
        """Write a full new snapshot and swap the pointer (replace)."""
        v = self.current_version(table) + 1
        df.write.mode("overwrite").parquet(self._vdir(table, v))
        self._swap(table, v)
        return v

    def append(self, table: str, df: DataFrame, schema: T.StructType) -> int:
        """Append = old snapshot ∪ new rows, committed as a new snapshot.
        (Iceberg would do a metadata-only append; at sandbox scale the
        rewrite is acceptable and keeps snapshots self-contained.)"""
        if self.exists(table):
            df = self.read(table).unionByName(df)
        return self.commit(table, df)

    def rollback(self, table: str, version: int) -> None:
        """Point the table back at an older snapshot (resume support)."""
        if not os.path.isdir(self._vdir(table, version)):
            raise FileNotFoundError(f"{table} v{version} missing")
        self._swap(table, version)

    def vacuum(self, table: str, keep: int = 2) -> None:
        """Drop snapshots older than the newest ``keep`` (bounded disk)."""
        cur = self.current_version(table)
        tdir = os.path.join(self.warehouse, table)
        if cur < 0 or not os.path.isdir(tdir):
            return
        for name in os.listdir(tdir):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if v <= cur - keep:
                    shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)

    def drop(self, table: str) -> None:
        shutil.rmtree(os.path.join(self.warehouse, table), ignore_errors=True)
