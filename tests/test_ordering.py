"""O1 partition-local sort and A7 observe() counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.ordering import (
    sort_by_entity_time,
    with_row_observations,
)


def test_sort_by_entity_time_no_global_exchange(spark):
    df = spark.createDataFrame(
        [(2, 30), (1, 20), (2, 10), (1, 5)], ["mmsi", "t"]
    )
    out = sort_by_entity_time(df, "mmsi", "t", num_partitions=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()  # no global sort exchange
    # within each partition, rows of one entity are contiguous & time-ordered
    per_part = out.rdd.glom().collect()
    for part in per_part:
        times = {}
        for row in part:
            times.setdefault(row["mmsi"], []).append(row["t"])
        for ts in times.values():
            assert ts == sorted(ts)


def test_with_row_observations(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "v"])
    out, obs = with_row_observations(df, null_check_cols=["v"])
    out.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 2 and got["n_null_v"] == 1
