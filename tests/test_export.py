"""Export sinks (S9): file sinks roundtrip; JDBC gates cleanly without
vendor jars; the upsert handoff SQL is well-formed."""

import pytest

from loong_spark.export import (
    export_files,
    jdbc_available,
    jdbc_driver_for,
    write_jdbc,
    write_jdbc_upsert,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id int, grp string, v int"
    )


def test_export_parquet_roundtrip(frame, tmp_path):
    p = str(tmp_path / "out_parquet")
    export_files(frame, p, fmt="parquet", partition_by=["grp"], coalesce=1)
    back = frame.sparkSession.read.parquet(p)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, 10), (2, 20), (3, 30)]
    # partitioned layout exists for pruning
    assert (tmp_path / "out_parquet" / "grp=a").exists()


def test_export_csv_roundtrip(frame, tmp_path):
    p = str(tmp_path / "out_csv")
    export_files(frame, p, fmt="csv", coalesce=1)
    back = frame.sparkSession.read.option("header", "true").csv(p)
    assert back.count() == 3 and set(back.columns) == {"id", "grp", "v"}


def test_jdbc_gates_without_driver(frame):
    assert jdbc_driver_for("jdbc:mysql://h/db") == "com.mysql.cj.jdbc.Driver"
    assert jdbc_driver_for("jdbc:weird://h/db") is None
    assert not jdbc_available(frame.sparkSession, "com.mysql.cj.jdbc.Driver")
    with pytest.raises(RuntimeError, match="not on the Spark classpath"):
        write_jdbc(frame, "jdbc:mysql://localhost/db", "t")
    with pytest.raises(ValueError, match="no known driver"):
        write_jdbc(frame, "jdbc:weird://localhost/db", "t")


def test_upsert_sql_shape(frame, monkeypatch):
    import loong_spark.export as ex

    staged = {}
    monkeypatch.setattr(
        ex, "write_jdbc", lambda df, url, table, **kw: staged.setdefault("table", table)
    )
    sql = write_jdbc_upsert(frame, "jdbc:mysql://h/db", "match", index=["id"])
    assert staged["table"] == "match_stage"
    assert sql == (
        "INSERT INTO match (id, grp, v) SELECT id, grp, v FROM match_stage "
        "ON DUPLICATE KEY UPDATE grp=VALUES(grp), v=VALUES(v)"
    )


def test_jdbc_roundtrip_and_upsert_derby(spark, tmp_path):
    """S9 executed END-TO-END against a real JDBC database: Spark ships
    an embedded Derby driver, so write_jdbc bulk-loads, spark.read.jdbc
    reads back, and the write_jdbc_upsert MERGE actually runs
    (execute_jdbc) and upserts — no vendor jar, no mock."""
    from loong_spark.export import execute_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"

    def read_tbl(name):
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .load()
        )

    base = spark.createDataFrame([(1, "old", 1), (3, "keep", 3)], "id int, grp string, v int")
    write_jdbc(base, url, "t", mode="overwrite", num_partitions=2)
    assert sorted(tuple(r) for r in read_tbl("t").collect()) == [
        (1, "old", 1), (3, "keep", 3),
    ]

    batch = spark.createDataFrame([(1, "new", 10), (2, "ins", 20)], "id int, grp string, v int")
    merge_sql = write_jdbc_upsert(batch, url, "t", index=["id"], dialect="merge")
    execute_jdbc(spark, url, merge_sql)
    got = sorted(tuple(r) for r in read_tbl("t").collect())
    assert got == [(1, "new", 10), (2, "ins", 20), (3, "keep", 3)]
