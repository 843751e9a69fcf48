"""ETL loader (§3.4): INI-DSL mapping → join/merge/map/upsert.

Covers the reference behaviors cited in loader.py, including the
3-source left-biased merge the reference gets WRONG (Loader.pm:97-101
rebinds so only the last source survives — we keep declaration order)
and MERGE-upsert against a pre-existing target (MySQL.pm:42-46)."""

from loong_spark.loader import (
    TableMapping,
    load_table,
    mapping_from_ini_section,
    transfer_tables,
    upsert,
)


def test_mapping_from_ini_splits_meta_keys():
    m = mapping_from_ini_section(
        "team",
        {
            "source": "teams,team_stat", "object_id": "url", "index": "name",
            "id": "auto_increase", "name": "name", "zh_name": "zh_name",
        },
    )
    assert m.source == ["teams", "team_stat"]
    assert m.object_id == ["url"]
    assert m.index == ["name"]
    assert m.columns == {"name": "name", "zh_name": "zh_name"}  # meta keys skipped


def test_three_source_left_biased_merge(spark):
    a = spark.createDataFrame(
        [("u1", "A1", None), ("u2", None, None)], "url string, x string, y string"
    )
    b = spark.createDataFrame([("u1", "B1", "B2")], "url string, x string, y string")
    c = spark.createDataFrame(
        [("u1", "C1", "C2", "C3"), ("u2", "Cx", "Cy", "Cz")],
        "url string, x string, y string, z string",
    )
    m = TableMapping(
        name="t",
        columns={"url": "url", "x": "x", "y": "y", "z": "z"},
        index=["url"], source=["a", "b", "c"], object_id=["url"],
    )
    rows = {r["url"]: r for r in load_table({"a": a, "b": b, "c": c}, m).collect()}
    # u1: a.x wins; y absent in a → b.y wins over c.y; z only in c
    assert (rows["u1"]["x"], rows["u1"]["y"], rows["u1"]["z"]) == ("A1", "B2", "C3")
    # u2: not in b at all → everything from c
    assert (rows["u2"]["x"], rows["u2"]["y"], rows["u2"]["z"]) == ("Cx", "Cy", "Cz")


def test_pattern_filter_restricts_driving_scan(spark):
    a = spark.createDataFrame(
        [("http://s/p/1", "v1"), ("http://s/q/2", "v2")], "url string, v string"
    )
    m = TableMapping(
        name="t", columns={"url": "url", "v": "v"}, index=["url"],
        source=["a"], pattern="/p/",
    )
    got = load_table({"a": a}, m).collect()
    assert [r["url"] for r in got] == ["http://s/p/1"]


def test_upsert_merge_semantics(spark):
    target = spark.createDataFrame(
        [("k1", 1, "old"), ("k2", 1, "keep")], "k string, ver int, v string"
    )
    batch = spark.createDataFrame(
        [("k1", 2, "new"), ("k1", 3, "newest"), ("k3", 1, "ins")],
        "k string, ver int, v string",
    )
    got = {r["k"]: r for r in upsert(target, batch, ["k"], ["ver"]).collect()}
    assert got["k1"]["v"] == "newest"  # matched → newest batch row wins
    assert got["k2"]["v"] == "keep"    # unmatched target survives
    assert got["k3"]["v"] == "ins"     # not-matched batch row inserts


def test_transfer_tables_order(spark):
    a = spark.createDataFrame([("u1", "x")], "url string, v string")
    ms = [
        TableMapping(name="t1", columns={"url": "url", "v": "v"}, index=["url"], source=["a"]),
        TableMapping(name="t2", columns={"url": "url"}, index=["url"], source=["a"]),
    ]
    out = transfer_tables({"a": a}, ms)
    assert set(out) == {"t1", "t2"}
    assert out["t1"].columns == ["url", "v"] and out["t2"].columns == ["url"]
