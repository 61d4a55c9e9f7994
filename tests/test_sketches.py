"""Sketch accuracy vs exact answers on the real sf0.001 tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
)


def _events(spark):
    from noaa_ais_glue_lakehouse_spark.sources.readers import read_parquet_table

    return read_parquet_table(spark, "/root/testdata/sf0.001/events.parquet")


def test_approx_distinct_within_tolerance(spark):
    ev = _events(spark).withColumn("day", F.to_date("ts"))
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["day"]: r["approx_n_user_id"]
        for r in approx_distinct_by(ev, ["day"], "user_id").collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        rel = abs(approx[day] - n) / max(n, 1)
        assert rel <= 0.10, (day, n, approx[day])


def test_approx_quantiles_within_tolerance(spark):
    ev = _events(spark)
    got = approx_quantiles_by(ev, [], "value", [0.5, 0.95]).first()[0]
    exact_p50, exact_p95 = ev.stat.approxQuantile("value", [0.5, 0.95], 0.0)
    span = (
        ev.agg(F.max("value") - F.min("value")).first()[0]
    )
    assert abs(got[0] - exact_p50) <= 0.02 * span
    assert abs(got[1] - exact_p95) <= 0.02 * span


def test_mergeable_hll_union_matches_exact_within_tolerance(spark):
    """Daily HLL sketches unioned to a monthly estimate must land within
    the sketch's error bounds of the exact distinct count — the accuracy
    contract of the q102 incremental rollup."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = ev.select("user_id").distinct().count()
    est = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    assert abs(est - exact) / exact < 0.05, (est, exact)
