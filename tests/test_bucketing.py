"""Bucketed tables: co-located join must plan without an exchange on
either side — the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.sources.writers import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark):
    # saveAsTable uses the session's static warehouse dir; tables are
    # dropped on teardown (the dir itself is gitignored)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    write_bucketed_table(left, "bt_left", ["k"], 8, sort_cols=["k"])
    write_bucketed_table(right, "bt_right", ["k"], 8, sort_cols=["k"])
    yield spark.table("bt_left"), spark.table("bt_right")
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        s = joined.agg(F.sum(F.col("v") + F.col("w"))).first()[0]
        assert s == sum(2 * i + i % 7 for i in range(1000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
