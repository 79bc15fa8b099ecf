"""SparkSession factory with the engine's scale-oriented defaults.

Local mode here; on a real cluster the same confs ship via
``spark-submit --py-files s2geometry_spark.zip`` (SURVEY.md §7 Stage 6).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "s2geometry-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # Arrow batching for pandas UDFs — the only JVM↔Python boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Batches of (lat,lng)-width rows; 64k keeps Arrow buffers small
        # even when upstream rows carry wide text columns (SURVEY §4.4).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join backstop (explicit salting
        # of hot cells is still applied in operators/tiles.py — B20).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 32 task threads + Arrow buffers + broadcasts live in ONE JVM
        # in local mode; 16g leaves GC headroom on the 128 GiB host.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Engine arithmetic is deliberately overflow-free; keep ANSI on
        # (Spark 4 default) so real errors surface.
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
