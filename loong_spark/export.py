"""Relational export sinks (S9) — the reference's MySQL CRUD tail.

The reference row-loops ``insert_or_update`` over a DBI handle
(/root/reference/lib/Loong/DB/MySQL.pm:30-58, driven by
lib/Loong/Loader.pm:80-103). The Spark-first shape is: compute the MERGE
result set-orientedly (loader.upsert — one window, no per-row
roundtrips) and hand the WHOLE frame to a bulk sink:

* ``write_jdbc`` — real JDBC bulk write; gates on driver-class presence
  with a clear error instead of a Spark stack trace. Spark ships an
  embedded Derby driver, so this path is executed END-TO-END in tests
  (tests/test_export.py::test_jdbc_roundtrip_and_upsert_derby); MySQL/
  Postgres need their vendor jar on spark.jars. At scale:
  ``numPartitions``/``batchsize`` control parallel INSERT streams;
  ``truncate`` avoids re-DDL on overwrite.
* ``write_jdbc_upsert`` — MERGE against JDBC: stage the batch to a temp
  table then issue ONE server-side set-based upsert (ANSI ``MERGE`` or
  MySQL ``INSERT ... ON DUPLICATE KEY UPDATE``) — the set-based
  equivalent of the reference's per-row exists-check; never
  SELECT-then-branch per row from the driver. ``execute_jdbc`` runs the
  returned statement over a driver-side connection.
* ``export_files`` — parquet/csv/json directory sink (also the right
  landing format for warehouse consumers at 100 TB — partitioned
  columnar beats a row-store export).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: default vendor driver classes per jdbc scheme
_DRIVERS = {
    "mysql": "com.mysql.cj.jdbc.Driver",
    "postgresql": "org.postgresql.Driver",
    "sqlite": "org.sqlite.JDBC",
    # embedded, ships inside the Spark distribution — the sandbox-
    # executable JDBC target
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


def jdbc_driver_for(url: str) -> str | None:
    for scheme, cls in _DRIVERS.items():
        if url.startswith(f"jdbc:{scheme}:"):
            return cls
    return None


def jdbc_available(spark: SparkSession, driver_class: str) -> bool:
    """True iff the vendor driver class is loadable in the JVM."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def _require_driver(df: DataFrame, url: str, driver: str | None) -> str:
    driver = driver or jdbc_driver_for(url)
    if driver is None:
        raise ValueError(f"no known driver class for {url!r}; pass driver=")
    if not jdbc_available(df.sparkSession, driver):
        raise RuntimeError(
            f"JDBC driver {driver} is not on the Spark classpath — add the "
            "vendor jar via spark.jars. (Embedded Derby ships with Spark "
            "and works out of the box: url 'jdbc:derby:<dir>;create=true'.)"
        )
    return driver


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    num_partitions: int = 8,
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Bulk relational write. ``num_partitions`` parallel connections,
    ``batchsize`` rows per round-trip — the two knobs that matter when a
    1000-executor job must not open 32k connections against one DB."""
    driver = _require_driver(df, url, driver)
    (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
        .options(**options)
        .mode(mode)
        .save()
    )


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    index: list[str],
    driver: str | None = None,
    staging_suffix: str = "_stage",
    dialect: str = "mysql",
    **options: str,
) -> str:
    """MERGE-shaped export: bulk-load the batch into ``table_stage``
    then one server-side upsert statement keyed on ``index``. Returns
    the SQL the caller runs (execute_jdbc) — Spark's JDBC writer has no
    MERGE mode, and issuing per-row upserts from executors is exactly
    the reference's scale bug, so the handoff is explicit.

    dialect='mysql' → ``INSERT ... ON DUPLICATE KEY UPDATE``;
    dialect='merge' → ANSI ``MERGE INTO`` (Derby/Postgres 15+/MSSQL).
    Column identifiers are double-quoted in the merge form because
    Spark's JDBC writer creates them quoted (case-preserved)."""
    stage = table + staging_suffix
    write_jdbc(df, url, stage, mode="overwrite", driver=driver, **options)
    cols = df.columns
    non_key = [c for c in cols if c not in index]
    if dialect == "merge":
        on = " AND ".join(f'{table}."{c}" = s."{c}"' for c in index)
        updates = ", ".join(f'"{c}" = s."{c}"' for c in non_key)
        col_list = ", ".join(f'"{c}"' for c in cols)
        src_list = ", ".join(f's."{c}"' for c in cols)
        return (
            f"MERGE INTO {table} USING {stage} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {updates} "
            f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({src_list})"
        )
    col_list = ", ".join(cols)
    updates = ", ".join(f"{c}=VALUES({c})" for c in non_key)
    return (
        f"INSERT INTO {table} ({col_list}) SELECT {col_list} FROM {stage} "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )


def execute_jdbc(spark: SparkSession, url: str, sql: str, driver: str | None = None) -> None:
    """Run one statement (DDL / the MERGE from write_jdbc_upsert) over a
    driver-side JDBC connection. One statement, one connection — never a
    per-row loop."""
    driver = driver or jdbc_driver_for(url)
    if driver is not None:
        spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        st = conn.createStatement()
        st.execute(sql)
        st.close()
    finally:
        conn.close()


def export_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Columnar/flat-file export directory. ``partition_by`` gives
    consumers partition pruning; ``coalesce`` bounds small-file count
    for modest result sets (leave None for large exports — the upstream
    partitioning is already right)."""
    w = (df.coalesce(coalesce) if coalesce else df).write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)
