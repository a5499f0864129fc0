"""SparkSession factory tuned for the CDC ingest engine.

Local-mode testing uses ``local[N]`` threads; the conf below is written for
a multi-executor cluster (AQE, skew-join handling, Arrow) and degrades
gracefully to local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mysql_secure_agent_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32. ``shuffle_partitions``
    defaults to 2x cores locally (on a real cluster you would size this to
    keep post-shuffle partitions under ~200 MB at the target data scale and
    let AQE coalesce the rest).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # int64-micros timestamps (the Iceberg/parquet-modern physical
        # type) instead of Spark's legacy INT96 default: INT96 columns
        # carry no usable min/max statistics, which would blind both the
        # manifests' listing-level ts pruning (LakeTable.stats_cols /
        # read_where) and executor-side row-group skipping on time filters
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # binlog order is a correctness contract; keep deterministic floats
        .config("spark.sql.legacy.allowUntypedScalaUDF", "false")
        # fork python workers from a daemon that has pandas/pyarrow preloaded
        # (otherwise every pandas-UDF stage of a fresh streaming query pays
        # ~1-2 s × worker-count of import time; see py_daemon.py)
        .config("spark.python.daemon.module", "mysql_secure_agent_spark.py_daemon")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
