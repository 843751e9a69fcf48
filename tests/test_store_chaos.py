"""Chaos property test over the SnapshotStore manifest protocol
(Hypothesis stateful): random interleavings of commit / append /
merge_keyed / vacuum with CRASHES injected at every window of the commit
protocol —

* after the data dir is written but before the version manifest
  (orphan d{v}),
* after the version manifest but before the pointer swap (orphan
  m{v}.json),
* after a completed op but before the caller's checkpoint (the
  pipeline's recovery window → rollback).

Invariants after every step: the table reads exactly the model state,
the current version is the checkpointed one, and version numbers stay
reusable after rollback (the documented Iceberg-like behavior). This
generalizes tests/test_resume.py's hand-written crash points.
"""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    rule,
    run_state_machine_as_test,
)

from loong_spark.store import SnapshotStore

_ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=4
)


def _machine_for(spark):
    class StoreChaosMachine(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            self.spark = spark
            self.wh = tempfile.mkdtemp(prefix="chaos_wh_")
            self.store = SnapshotStore(self.spark, self.wh, compact_threshold=4)
            # live model state and the last CHECKPOINTED (version, state)
            self.model: list[tuple[int, int]] = []
            self.ck_version = -1
            self.ck_model: list[tuple[int, int]] = []

        def _df(self, rows):
            return self.spark.createDataFrame(rows, "k int, v int")

        def _checkpoint(self):
            self.ck_version = self.store.current_version("t")
            self.ck_model = list(self.model)

        # -- committed ops (op + checkpoint, the normal batch) -----------
        @rule(rows=_ROWS)
        def commit(self, rows):
            self.store.commit("t", self._df(rows))
            self.model = list(rows)
            self._checkpoint()

        @rule(rows=_ROWS)
        def append(self, rows):
            self.store.append("t", self._df(rows))
            self.model = self.model + list(rows)
            self._checkpoint()

        @rule(rows=_ROWS)
        def merge_keyed(self, rows):
            keys = sorted({k for k, _ in rows})
            self.store.merge_keyed("t", self._df(rows), "k", keys)
            self.model = [r for r in self.model if r[0] not in keys] + list(rows)
            self._checkpoint()

        @rule()
        def vacuum(self):
            self.store.vacuum("t", keep=2)

        # -- crash windows ------------------------------------------------
        @rule(rows=_ROWS)
        def crash_after_data_dir(self, rows):
            """Data dir written, no manifest: invisible to reads; the
            version number gets reused (overwritten) by the next op."""
            v = self.store.current_version("t") + 1
            self._df(rows).write.mode("overwrite").parquet(
                os.path.join(self.wh, "t", f"d{v}")
            )

        @rule(rows=_ROWS)
        def crash_after_version_manifest(self, rows):
            """Version manifest written, pointer NOT swapped: still
            invisible (the pointer is the commit)."""
            v = self.store.current_version("t") + 1
            self._df(rows).write.mode("overwrite").parquet(
                os.path.join(self.wh, "t", f"d{v}")
            )
            with open(os.path.join(self.wh, "t", f"m{v}.json"), "w") as f:
                json.dump({"table": "t", "version": v, "dirs": [f"d{v}"]}, f)

        @rule(rows=_ROWS, kind=st.sampled_from(["commit", "append", "merge"]))
        def crash_before_checkpoint_then_resume(self, rows, kind):
            """The op fully committed but the caller's checkpoint never
            landed — the pipeline recovery window: resume rolls the table
            back to the checkpointed version."""
            if self.ck_version < 0:
                return  # nothing checkpointed yet — rollback undefined
            if kind == "commit":
                self.store.commit("t", self._df(rows))
            elif kind == "append":
                self.store.append("t", self._df(rows))
            else:
                self.store.merge_keyed(
                    "t", self._df(rows), "k", sorted({k for k, _ in rows})
                )
            # resume: roll back to the checkpoint; model reverts
            self.store.rollback("t", self.ck_version)
            self.model = list(self.ck_model)

        # -- invariants -----------------------------------------------------
        @invariant()
        def reads_match_model(self):
            if self.store.current_version("t") < 0:
                assert self.model == []
                return
            got = sorted(
                (r.k, r.v) for r in self.store.read("t").collect()
            )
            assert got == sorted(self.model)

        @invariant()
        def version_is_checkpointed(self):
            assert self.store.current_version("t") == self.ck_version

    return StoreChaosMachine


def test_store_chaos(spark):
    run_state_machine_as_test(
        _machine_for(spark),
        settings=settings(
            max_examples=8, stateful_step_count=8, deadline=None,
            derandomize=True,
        ),
    )
