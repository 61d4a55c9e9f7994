"""Range join: matches a literal BETWEEN join, overlapping intervals,
left-join nulls, and bin-width invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.rangejoin import range_join


def _data(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 55.0), (3, 150.0), (4, 999.0)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 60.0), (20, 50.0, 200.0)], ["iid", "lo", "hi"]
    )
    return points, intervals


def test_range_join_matches_theta(spark):
    points, intervals = _data(spark)
    want = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals, F.col("x").between(F.col("lo"), F.col("hi"))
        ).collect()
    }
    for bw in (10.0, 37.0, 500.0):  # result must not depend on bin width
        got = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "x", "lo", "hi", bw).collect()
        }
        assert got == want, bw
    assert want == {(1, 10), (2, 10), (2, 20), (3, 20)}  # 55 hits both


def test_range_join_left_keeps_unmatched(spark):
    points, intervals = _data(spark)
    out = range_join(points, intervals, "x", "lo", "hi", 25.0, how="left")
    rows = {(r["pid"], r["iid"]) for r in out.collect()}
    assert (4, None) in rows
    assert len(rows) == 5
