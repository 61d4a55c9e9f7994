"""Empty-input robustness: every custom operator must return an EMPTY
result with the right schema — never crash — when a partition, day
window, or filtered subset yields zero rows. At scale, empty inputs are
routine (empty partitions, quiet entities, first-day runs), and an
operator that throws on them kills the whole job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.asof import asof_join
from noaa_ais_glue_lakehouse_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    minhash_near_duplicates,
)
from noaa_ais_glue_lakehouse_spark.operators.sessionize import sessionize
from noaa_ais_glue_lakehouse_spark.operators.skew import salted_join


def _empty_events(spark):
    return spark.createDataFrame(
        [], "user_id bigint, event_id bigint, ts timestamp, value double"
    )


def test_sessionize_empty(spark):
    out = sessionize(_empty_events(spark), "user_id", "ts", 1800.0)
    assert out.count() == 0
    assert "session_id" in out.columns


def test_asof_empty_probe_and_empty_ref(spark):
    ev = _empty_events(spark)
    ref = spark.createDataFrame([(1, None, 1.0)], "user_id bigint, ts timestamp, v double")
    # empty probe → empty output, schema intact
    out = asof_join(ev.select("user_id", "event_id", "ts"), ref, "user_id", "ts", ["v"])
    assert out.count() == 0 and "asof_v" in out.columns
    # empty reference → all-null asof values, probes preserved
    probe = spark.createDataFrame(
        [(1, 10, None)], "user_id bigint, event_id bigint, ts timestamp"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    out2 = asof_join(
        probe,
        ref.where(F.lit(False)),
        "user_id",
        "ts",
        ["v"],
        direction="forward",
    )
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["asof_v"] is None


def test_dedup_exact_empty(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    assert dedup_exact(df, ["text"], "doc_id").count() == 0


def test_minhash_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    assert (
        minhash_near_duplicates(df, "doc_id", "text", threshold=0.8).count() == 0
    )


def test_connected_components_empty_edges(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(pairs).count() == 0


def test_salted_join_empty_sides(spark):
    left = spark.createDataFrame([], "k bigint, x double")
    right = spark.createDataFrame([(1, 2.0)], "k bigint, y double")
    assert salted_join(left, right, ["k"]).count() == 0
    assert (
        salted_join(right, left.withColumnRenamed("x", "y2"), ["k"], how="left").count()
        == 1
    )
