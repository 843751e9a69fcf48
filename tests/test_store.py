"""SnapshotStore delta-append semantics: append I/O is O(batch), reads
union the manifest's data dirs, rollback is metadata-only, vacuum drops
only unreferenced dirs, compaction bounds manifest growth."""

import json
import os

from loong_spark.store import SnapshotStore


def _mk(spark, tmp_path, **kw):
    return SnapshotStore(spark, str(tmp_path / "wh"), **kw)


def _dirs(store, table):
    v = store.current_version(table)
    with open(os.path.join(store.warehouse, table, f"m{v}.json")) as f:
        return json.load(f)["dirs"]


def test_append_writes_only_new_dir(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.commit("t", spark.range(10).selectExpr("id", "id * 2 AS v"))
    d0_mtime = os.path.getmtime(os.path.join(st.warehouse, "t", "d0"))

    st.append("t", spark.range(10, 15).selectExpr("id", "id * 2 AS v"))
    assert _dirs(st, "t") == ["d0", "d1"]
    # the original data dir was not rewritten by the append
    assert os.path.getmtime(os.path.join(st.warehouse, "t", "d0")) == d0_mtime
    assert st.read("t").count() == 15
    assert set(r["id"] for r in st.read("t").collect()) == set(range(15))


def test_append_chain_and_compaction(spark, tmp_path):
    st = _mk(spark, tmp_path, compact_threshold=4)
    st.commit("t", spark.range(2).selectExpr("id"))
    for i in range(1, 6):
        st.append("t", spark.range(2 * i, 2 * i + 2).selectExpr("id"))
        assert st.read("t").count() == 2 * (i + 1)
    # threshold=4 → at most 4 dirs in any manifest; a compaction happened
    assert len(_dirs(st, "t")) <= 4
    assert set(r["id"] for r in st.read("t").collect()) == set(range(12))


def test_time_travel_read(spark, tmp_path):
    import pytest

    st = _mk(spark, tmp_path)
    st.commit("t", spark.range(3).selectExpr("id"))
    st.append("t", spark.range(3, 6).selectExpr("id"))
    st.append("t", spark.range(6, 9).selectExpr("id"))
    assert st.read("t").count() == 9  # current
    assert st.read("t", version=0).count() == 3
    assert set(r["id"] for r in st.read("t", version=1).collect()) == set(range(6))
    # current pointer untouched by time-travel reads
    assert st.current_version("t") == 2
    with pytest.raises(FileNotFoundError, match="m7"):
        st.read("t", version=7)


def test_rollback_restores_old_union(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.commit("t", spark.range(3).selectExpr("id"))
    st.append("t", spark.range(3, 6).selectExpr("id"))
    v_after_first_append = st.current_version("t")
    st.append("t", spark.range(6, 9).selectExpr("id"))
    assert st.read("t").count() == 9
    st.rollback("t", v_after_first_append)
    assert st.read("t").count() == 6
    # appending after rollback branches cleanly
    st.append("t", spark.range(100, 102).selectExpr("id"))
    assert set(r["id"] for r in st.read("t").collect()) == set(range(6)) | {100, 101}


def test_vacuum_keeps_shared_delta_dirs(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.commit("t", spark.range(2).selectExpr("id"))        # v0: [d0]
    for i in range(1, 5):                                   # v1..v4 deltas
        st.append("t", spark.range(2 * i, 2 * i + 2).selectExpr("id"))
    st.vacuum("t", keep=2)                                  # keeps v3, v4
    # d0 is still referenced by the kept manifests (shared delta base)
    assert os.path.isdir(os.path.join(st.warehouse, "t", "d0"))
    assert st.read("t").count() == 10
    # old manifests are gone
    assert not os.path.exists(os.path.join(st.warehouse, "t", "m0.json"))


def test_rollback_purges_rolled_back_snapshots(spark, tmp_path):
    """After rollback, snapshots above the target are GONE: no stale
    orphan manifest stays time-travel-readable, and the reused version
    numbers start from clean dirs (the ADVICE rollback-reuse case)."""
    st = _mk(spark, tmp_path)
    st.commit("t", spark.range(3).selectExpr("id"))          # v0
    st.append("t", spark.range(3, 6).selectExpr("id"))       # v1
    st.append("t", spark.range(6, 9).selectExpr("id"))       # v2
    st.rollback("t", 0)
    tdir = os.path.join(st.warehouse, "t")
    assert not os.path.exists(os.path.join(tdir, "m1.json"))
    assert not os.path.exists(os.path.join(tdir, "m2.json"))
    assert not os.path.exists(os.path.join(tdir, "d1"))
    assert not os.path.exists(os.path.join(tdir, "d2"))
    import pytest
    with pytest.raises(FileNotFoundError):
        st.read("t", version=1)  # uncommitted snapshot no longer readable
    # version numbers are reused on fresh dirs — no mixed data
    st.append("t", spark.range(50, 52).selectExpr("id"))     # new v1
    assert set(r["id"] for r in st.read("t").collect()) == set(range(3)) | {50, 51}
    assert set(r["id"] for r in st.read("t", version=1).collect()) == set(range(3)) | {50, 51}


def test_merge_keyed_writes_only_touched_keys(spark, tmp_path):
    """merge_keyed I/O is O(touched keys): the new data dir holds ONLY
    the replaced keys' rows; untouched keys are carried in the manifest;
    reads see exactly one (latest) row per key."""
    st = _mk(spark, tmp_path)
    rows = [(k, f"v0-{k}") for k in range(8)]
    st.commit("s", spark.createDataFrame(rows, "k int, v string"))      # v0: plain
    st.merge_keyed("s", spark.createDataFrame([(2, "v1-2"), (5, "v1-5")],
                                              "k int, v string"), "k", [2, 5])
    got = {r["k"]: r["v"] for r in st.read("s").collect()}
    assert got == {k: (f"v1-{k}" if k in (2, 5) else f"v0-{k}") for k in range(8)}
    # the delta dir holds exactly the 2 touched rows
    d1 = spark.read.parquet(os.path.join(st.warehouse, "s", "d1"))
    assert d1.count() == 2
    # re-touching one key masks it out of BOTH earlier dirs
    st.merge_keyed("s", spark.createDataFrame([(2, "v2-2")], "k int, v string"), "k", [2])
    got = {r["k"]: r["v"] for r in st.read("s").collect()}
    assert got[2] == "v2-2" and got[5] == "v1-5" and got[0] == "v0-0"
    assert st.read("s").count() == 8
    # time travel still sees the old versions
    assert {r["k"]: r["v"] for r in st.read("s", version=0).collect()}[2] == "v0-2"
    assert {r["k"]: r["v"] for r in st.read("s", version=1).collect()}[2] == "v1-2"


def test_merge_keyed_compaction_and_rollback(spark, tmp_path):
    st = _mk(spark, tmp_path, compact_threshold=4)
    st.commit("s", spark.createDataFrame([(k, 0) for k in range(6)], "k int, ver int"))
    for i in range(1, 6):  # drives past the threshold → compaction
        st.merge_keyed(
            "s", spark.createDataFrame([(i % 6, i)], "k int, ver int"), "k", [i % 6]
        )
    assert st.read("s").count() == 6
    assert len(_dirs(st, "s")) <= 4
    got = {r["k"]: r["ver"] for r in st.read("s").collect()}
    assert got[5] == 5 and got[0] == 0
    v = st.current_version("s")
    st.merge_keyed("s", spark.createDataFrame([(0, 99)], "k int, ver int"), "k", [0])
    st.rollback("s", v)
    assert {r["k"]: r["ver"] for r in st.read("s").collect()}[0] == 0
