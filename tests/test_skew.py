"""Salted join correctness: same rows as a plain join, spread over salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.skew import salted_join


def _skewed(spark):
    # key 1 is hot (100 rows), keys 2..5 have one row each
    left = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(k, 0) for k in range(2, 6)], ["k", "v"]
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (9, "unmatched")], ["k", "name"]
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = {(r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, ["k"], salt_factor=8).collect()
    }
    assert salted == plain
    assert len(plain) == 102  # 100 hot + 2 singleton matches


def test_salted_join_left_outer(spark):
    left, right = _skewed(spark)
    plain = {
        (r["k"], r["v"], r["name"])
        for r in left.join(right, "k", "left").collect()
    }
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, ["k"], salt_factor=4, how="left").collect()
    }
    assert salted == plain


def test_salt_actually_spreads_hot_key(spark):
    left, right = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)).cast("int")
    n_salts = (
        left.filter(F.col("k") == 1)
        .withColumn("_salt", salt)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts >= 6  # hot key's 100 rows hit most of the 8 salts
