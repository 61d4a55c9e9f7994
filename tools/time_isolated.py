"""Isolated steady-state timing: fresh session, 1 warmup + 3 recorded
noop-sink passes per query, median reported (bench.py methodology on a
subset — for before/after A-B measurements while optimizing).

Usage: python tools/time_isolated.py SF_DIR name [name ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time-isolated")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from noaa_ais_glue_lakehouse_spark.plans import catalog

    qs = catalog.queries()
    for name in names:
        runs = []
        for i in range(4):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                df.count()
            dt = round(time.time() - t0, 3)
            if i > 0:
                runs.append(dt)
            gc.collect()
            spark.catalog.clearCache()
            # no forced System.gc: it unloads the previous trial's
            # generated classes, deoptimizing still-hot JIT code (see
            # bench.py housekeeping note, round 10)
        print(f"{name}: median {sorted(runs)[1]:.3f}  runs {runs}", flush=True)


if __name__ == "__main__":
    main()
