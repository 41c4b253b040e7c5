"""SparkSession builder.

Local mode is one JVM with N executor threads; the same configuration keys
govern a real cluster, so everything scale-relevant (AQE, adaptive skew
join, shuffle partition sizing, Arrow transfer) is set here rather than
sprinkled through operators.

Scale posture (100 TB):
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
    dynamic broadcast conversion.
  - ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
    real cluster pass ``shuffle_partitions≈2-3× total cores``.
  - UTC session timezone pinned so timestamp semantics are stable across
    engines (DuckDB oracle comparisons, parquet instant semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "iconic-data-science-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # TIMESTAMP(NANOS) parquet columns (events.ts) read as long nanos;
        # the catalog normalizes them to micros timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_object_store(spark: SparkSession, conf: dict[str, str]) -> SparkSession:
    """S13: cloud-storage credential/endpoint passthrough.

    The reference hardcodes ADLS OAuth keys in notebooks
    (/root/reference/src/notebooks/scala/StaticNet.scala:16-39,
    MagDwarf.scala:41-53); the engine form takes S3A/ABFS/GCS Hadoop
    conf pairs and applies them to the active context, e.g.
    ``{"fs.s3a.endpoint": ..., "fs.s3a.access.key": ...}``.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable conf on an externally created session.

    The driver harness hands us its own SparkSession; timestamp semantics
    (session timezone) and AQE must still hold for oracle parity, so set
    every runtime-mutable key defensively.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.shuffle.partitions", str(default_parallelism())),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static or restricted conf on this session — keep going
    return spark
