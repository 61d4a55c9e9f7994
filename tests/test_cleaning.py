"""Unit tests for raw-zone cleaning operators (SURVEY §2.2 P1-P7, P13, D1).

Case inventory ported from the reference suites
``tests/unit/test_parse_base_datetime.py``, ``test_clean_coordinates.py``,
``test_clean_sog_cog_heading.py``, ``test_normalize_columns.py``,
``test_replace_empty_with_null.py``, ``test_derive_movement_flag.py``,
``test_drop_duplicates.py`` — plus NULL-preservation cases the reference
lacks (ADVICE r1: least() vs when/otherwise clamp).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from noaa_ais_glue_lakehouse_spark.operators.cleaning import (
    COLUMN_MAPPING,
    align_schema,
    clean_coordinates,
    clean_sog_cog_heading,
    dedup_by_content_hash,
    derive_movement_flag,
    add_movement_state,
    normalize_columns,
    parse_base_datetime,
    replace_empty_with_null,
    safe_cast_columns,
)


# ---- P4 parse_base_datetime (reference: test_parse_base_datetime.py) ----

def test_parse_valid(spark):
    df = spark.createDataFrame([("2024-01-01 10:00:00",)], ["BaseDateTime"])
    out = parse_base_datetime(df)
    assert out.count() == 1
    row = out.first()
    assert row["year"] == "2024" and row["month"] == "01" and row["day"] == "01"


def test_parse_invalid_dropped(spark):
    df = spark.createDataFrame([("not-a-date",)], ["BaseDateTime"])
    assert parse_base_datetime(df).count() == 0


def test_parse_mixed(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("invalid-date",)], ["BaseDateTime"]
    )
    out = parse_base_datetime(df)
    assert out.count() == 1
    assert out.first()["year"] == "2024"


def test_parse_empty_and_null(spark):
    schema = T.StructType([T.StructField("BaseDateTime", T.StringType())])
    df = spark.createDataFrame([("",), (None,)], schema)
    assert parse_base_datetime(df).count() == 0


def test_parse_iso_t_and_millis_and_zulu(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-05T06:07:08",),
            ("2024-03-05T06:07:08.123",),
            ("2024-03-05T06:07:08Z",),
            ("2024-03-05 06:07:08+00:00",),
        ],
        ["BaseDateTime"],
    )
    out = parse_base_datetime(df)
    assert out.count() == 4
    assert {r["day"] for r in out.collect()} == {"05"}


# ---- P5 clean_coordinates (reference: test_clean_coordinates.py) ----

def test_clean_coordinates_split(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0), (200.0, 30.0), (40.0, -300.0)], ["LAT", "LON"]
    )
    valid, invalid = clean_coordinates(df)
    assert valid.count() == 1
    r = valid.first()
    assert r["LAT"] == 10.0 and r["LON"] == 20.0
    assert invalid.count() == 2


def test_clean_coordinates_null_goes_to_quarantine(spark):
    schema = T.StructType(
        [T.StructField("LAT", T.DoubleType()), T.StructField("LON", T.DoubleType())]
    )
    df = spark.createDataFrame([(None, 10.0), (5.0, None), (1.0, 1.0)], schema)
    valid, invalid = clean_coordinates(df)
    assert valid.count() == 1
    assert invalid.count() == 2


def test_clean_coordinates_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [(90.0, 180.0), (-90.0, -180.0), (90.0001, 0.0)], ["LAT", "LON"]
    )
    valid, invalid = clean_coordinates(df)
    assert valid.count() == 2
    assert invalid.count() == 1


# ---- P6 clamp (reference: test_clean_sog_cog_heading.py + NULL case) ----

def test_clamp_upper_bounds(spark):
    df = spark.createDataFrame([(150.0, 500.0, 900.0)], ["SOG", "COG", "Heading"])
    r = clean_sog_cog_heading(df).first()
    assert r["SOG"] == 100.0 and r["COG"] == 360.0 and r["Heading"] == 511.0


def test_clamp_preserves_null_and_negative(spark):
    schema = T.StructType(
        [
            T.StructField("SOG", T.DoubleType()),
            T.StructField("COG", T.DoubleType()),
            T.StructField("Heading", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(None, -5.0, None)], schema)
    r = clean_sog_cog_heading(df).first()
    # NULL must stay NULL (not become the cap), negatives pass through
    assert r["SOG"] is None
    assert r["COG"] == -5.0
    assert r["Heading"] is None


# ---- P1 normalize_columns (reference: test_normalize_columns.py) ----

def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0, "x")], ["mmsi", "latitude", "longitude", "vessel_name"])
    out = normalize_columns(df)
    assert set(out.columns) == {"MMSI", "LAT", "LON", "VesselName"}
    assert set(COLUMN_MAPPING.values()) >= {"MMSI", "LAT", "LON"}


def test_normalize_keeps_canonical_and_unknown(spark):
    df = spark.createDataFrame([(1, "z")], ["LAT", "unknown_col"])
    out = normalize_columns(df)
    assert out.columns == ["LAT", "unknown_col"]


# ---- P2 align_schema ----

def test_align_schema_add_drop_cast(spark):
    target = T.StructType(
        [
            T.StructField("MMSI", T.IntegerType()),
            T.StructField("LAT", T.DoubleType()),
            T.StructField("VesselName", T.StringType()),
        ]
    )
    df = spark.createDataFrame([("123", "4.5", "junk")], ["MMSI", "LAT", "extra"])
    out = align_schema(df, target)
    assert [f.name for f in out.schema.fields] == ["MMSI", "LAT", "VesselName"]
    assert dict((f.name, f.dataType) for f in out.schema.fields)["MMSI"] == T.IntegerType()
    r = out.first()
    assert r["MMSI"] == 123 and r["LAT"] == 4.5 and r["VesselName"] is None


# ---- P3 replace_empty_with_null ----

def test_replace_empty_with_null(spark):
    df = spark.createDataFrame([("", "keep", 0)], ["a", "b", "n"])
    r = replace_empty_with_null(df).first()
    assert r["a"] is None and r["b"] == "keep" and r["n"] == 0


# ---- P7 / P8 movement ----

def test_movement_flag(spark):
    schema = T.StructType([T.StructField("SOG", T.DoubleType())])
    df = spark.createDataFrame([(0.0,), (0.1,), (None,)], schema)
    rows = derive_movement_flag(df).collect()
    assert [r["MovementFlag"] for r in rows] == [0, 1, 0]


def test_movement_state(spark):
    df = spark.createDataFrame([(0.4,), (0.5,), (12.0,)], ["SOG"])
    rows = add_movement_state(df).collect()
    assert [r["movement_state"] for r in rows] == ["anchored", "moving", "moving"]


# ---- D1 dedup (reference: test_drop_duplicates.py) ----

def test_dedup_by_content_hash(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["id", "v"]
    )
    assert dedup_by_content_hash(df).count() == 2


def test_dedup_null_vs_empty_not_collided(spark):
    # the fixed fingerprint spec distinguishes NULL from ''
    schema = T.StructType([T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(None,), ("",)], schema)
    assert dedup_by_content_hash(df).count() == 2


# ---- P13 safe_cast ----

def test_safe_cast_columns(spark):
    df = spark.createDataFrame([("1", "2.5")], ["a", "b"])
    out = safe_cast_columns(df, {"a": "int", "b": "double", "missing": "int"})
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert types == {"a": "int", "b": "double"}
