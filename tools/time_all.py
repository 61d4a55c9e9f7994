"""Spark-only wall-time sweep over the whole catalog (noop sink).

Usage: python tools/time_all.py SF_DIR [OUT_JSON] [name ...]

Times ONE noop-sink execution per registered query (selfcheck's [Ns]
column includes the DuckDB oracle, which double-counts for optimization
targeting). No warmup — this ranks relative cost, it does not publish
medians; use bench.py for steady-state numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = set(sys.argv[3:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time-all")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from noaa_ais_glue_lakehouse_spark.plans import catalog

    qs = catalog.queries()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                df.count()
            times[name] = round(time.time() - t0, 3)
        except Exception:
            times[name] = -1.0
            traceback.print_exc()
        spark.catalog.clearCache()
        print(f"{times[name]:8.3f}  {name}", flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(times, fh, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
