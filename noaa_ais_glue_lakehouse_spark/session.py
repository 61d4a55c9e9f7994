"""SparkSession factory.

The reference builds its session through Glue (``pipelines/raw_to_staging.py:20-34``
in /root/reference) with dynamic partition overwrite + S3A committers. Here the
session is plain Spark, tuned for correctness-critical determinism (UTC
timezone; ANSI mode is left at Spark's default — every operator and query
runs clean under ANSI) and for scale-minded defaults (AQE on, adaptive
coalescing, Arrow for the pandas exchange paths).

On a real cluster the same builder works unchanged — only ``master`` and the
shuffle-partition count come from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "noaa-ais-lakehouse-spark") -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the bench harness
    and tests share one code path.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_parts = os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # deterministic timestamp semantics for the duckdb oracle comparison
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime shuffle coalescing + skew-join handling — the scale
        # story for 100 TB (replaces the reference's manual repartition(200)).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        # dynamic partition overwrite: the conf the reference actually relied
        # on (its parquet `replaceWhere` was a no-op; SURVEY §7.4.2)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Arrow for pandas_udf / applyInPandas exchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # read nanosecond-precision parquet timestamps as long (Spark has no
        # ns timestamp); sources.readers converts them to micros timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # codegen class cache sized for a large query catalog (round 10):
        # Spark's default 100 entries thrash when a session executes many
        # distinct plans, re-generating (and re-JITing from the
        # interpreter) every whole-stage-codegen class on each re-run —
        # measured 10x CPU on the LSH verify stages. A few thousand
        # entries keep generated classes (and their JIT state) stable.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
