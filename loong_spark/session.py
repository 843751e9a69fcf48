"""SparkSession builder tuned for the frontier pipeline.

Local sandbox runs single-JVM (``local[N]``); on a real cluster the same
builder works under ``spark-submit --py-files loong_spark.zip`` — only
master/memory change. If an Iceberg runtime jar is on the classpath the
commented catalog block turns the table store into real Iceberg; the
sandbox has no Iceberg jar, so ``loong_spark.store.SnapshotStore`` provides
snapshot-versioned parquet tables with the same commit semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "loong_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 4x cores: enough task granularity that one straggler partition
    # doesn't idle the rest of the executor slots (AQE coalesces the
    # small ones back; parallelismFirst keeps >= cores)
    shuffle_partitions = shuffle_partitions or max(4 * cores, 16)
    # Shuffle/spill dir: memory-backed when available (the sandbox's /tmp is
    # spinning-disk-backed and serializes shuffle I/O across cores; a real
    # cluster uses NVMe-local dirs). Gated on actual free space — container
    # /dev/shm is often a tiny tmpfs (Docker default 64 MB) where shuffle
    # files would ENOSPC or squeeze application RAM. Overridable via
    # LOONG_LOCAL_DIR.
    local_dir = os.environ.get("LOONG_LOCAL_DIR")
    if local_dir is None:
        local_dir = "/tmp"
        if os.path.isdir("/dev/shm"):
            try:
                vfs = os.statvfs("/dev/shm")
                if vfs.f_bavail * vfs.f_frsize >= 8 << 30:  # ≥ 8 GiB free
                    local_dir = "/dev/shm/loong-spark-local"
            except OSError:
                pass
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("LOONG_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Iceberg (enable when iceberg-spark-runtime jar is present):
        # .config("spark.sql.extensions",
        #         "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        # .config("spark.sql.catalog.loong", "org.apache.iceberg.spark.SparkCatalog")
        # .config("spark.sql.catalog.loong.type", "hadoop")
        # .config("spark.sql.catalog.loong.warehouse", warehouse_dir)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
