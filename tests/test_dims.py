"""Dimension builders: key dedup (D2), standardization, union (U3),
broadcast lookup join (J1), schema registry contract."""

from __future__ import annotations

from pyspark.sql import types as T

from noaa_ais_glue_lakehouse_spark.operators.dims import (
    build_dim_country,
    build_dim_nav_status,
    build_dim_vessel_type,
    default_dim_nav_status,
    join_lookup,
)
from noaa_ais_glue_lakehouse_spark.schemas import SCHEMA_MAP


def test_dim_nav_status_dedup_and_names(spark):
    df = spark.createDataFrame(
        [(0, " Under way ", "engine"), (0, "dup", "dup"), (None, "x", "y")],
        ["Code", "Navigational_Status", "Meaning"],
    )
    out = build_dim_nav_status(df)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["StatusName"] == "Under way"
    assert out.columns == ["Code", "StatusName", "StatusDescription"]


def test_default_dim_nav_status(spark):
    out = default_dim_nav_status(spark)
    assert out.count() == 16
    got = {r["Code"]: r["StatusName"] for r in out.collect()}
    assert got[1] == "At anchor" and got[5] == "Moored"


def test_dim_vessel_type(spark):
    df = spark.createDataFrame(
        [("70", "Cargo", "Cargo ship", "General cargo"), ("70", "d", "d", "d")],
        ["AIS_Code", "Vessel_Group", "Vessel_Type", "Description"],
    )
    out = build_dim_vessel_type(df)
    assert out.count() == 1
    assert out.first()["AIS_Code"] == 70


def test_dim_country_union(spark):
    mid = spark.createDataFrame([(338, "USA ")], ["Digit", "Allocated_to"])
    cs = spark.createDataFrame([("K", "USA")], ["Series", "Allocated_to"])
    out = build_dim_country(mid, cs)
    assert out.count() == 2
    assert {r["Source"] for r in out.collect()} == {"MID", "CallSign"}
    assert {r["Country"] for r in out.collect()} == {"USA"}


def test_join_lookup_broadcast(spark):
    facts = spark.createDataFrame([(1, 0), (2, 5), (3, 99)], ["id", "Status"])
    dim = default_dim_nav_status(spark)
    out = join_lookup(facts, dim, "Status", "Code", "StatusName", "StatusText")
    got = {r["id"]: r["StatusText"] for r in out.collect()}
    assert got[2] == "Moored" and got[3] is None
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_schema_map_contract():
    assert set(SCHEMA_MAP) == {
        "raw", "staging", "state_snapshot", "voyage_segments",
        "voyage_summary_staging",
    }
    staging = SCHEMA_MAP["staging"]
    by_name = {f.name: f.dataType for f in staging.fields}
    # partition columns resolved to INT (SURVEY §7.4.4 decision)
    assert by_name["year"] == T.IntegerType()
    assert by_name["BaseDateTime"] == T.TimestampType()
    # raw keeps the unparsed string timestamp
    raw = {f.name: f.dataType for f in SCHEMA_MAP["raw"].fields}
    assert raw["BaseDateTime"] == T.StringType()
    assert "MovementFlag" not in raw
