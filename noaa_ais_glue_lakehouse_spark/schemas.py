"""Central schema registry (SURVEY §1.3): fixed, explicitly declared
StructType per layer, CSV/parquet inference never trusted.

Reference: ``utils/schema_definitions.py:20-113`` (SCHEMA_MAP with raw /
staging / state_snapshot / voyage_segments / voyage_summary_staging).

Deliberate resolution of the reference's year/month/day inconsistency
(SURVEY §7.4.4: derived as zero-padded *strings* at
``utils/common_functions_raw.py:42-44`` but declared IntegerType in the
staging schema): here partition columns are **IntegerType everywhere**,
and the raw→staging pipeline casts the derived strings before the write.
Integer partition values compare correctly in pruning predicates
(``year >= 2024``) and avoid the '2' vs '02' zero-padding trap that
string partitions invite.
"""

from __future__ import annotations

from pyspark.sql import types as T

AIS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("MMSI", T.IntegerType(), True),
        T.StructField("BaseDateTime", T.StringType(), True),  # parsed in ETL
        T.StructField("LAT", T.DoubleType(), True),
        T.StructField("LON", T.DoubleType(), True),
        T.StructField("SOG", T.DoubleType(), True),
        T.StructField("COG", T.DoubleType(), True),
        T.StructField("Heading", T.DoubleType(), True),
        T.StructField("VesselName", T.StringType(), True),
        T.StructField("IMO", T.StringType(), True),  # string keeps leading zeros
        T.StructField("CallSign", T.StringType(), True),
        T.StructField("VesselType", T.IntegerType(), True),
        T.StructField("Status", T.IntegerType(), True),
        T.StructField("Length", T.DoubleType(), True),
        T.StructField("Width", T.DoubleType(), True),
        T.StructField("Draft", T.DoubleType(), True),
        T.StructField("Cargo", T.IntegerType(), True),
        T.StructField("TransceiverClass", T.StringType(), True),
    ]
)

AIS_STAGING_SCHEMA = T.StructType(
    list(AIS_RAW_SCHEMA.fields[:1])
    + [T.StructField("BaseDateTime", T.TimestampType(), True)]
    + list(AIS_RAW_SCHEMA.fields[2:])
    + [
        T.StructField("MovementFlag", T.IntegerType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
    ]
)

STATE_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("MMSI", T.IntegerType(), False),
        T.StructField("BaseDateTime", T.TimestampType(), True),
        T.StructField("LAT", T.DoubleType(), True),
        T.StructField("LON", T.DoubleType(), True),
        T.StructField("VoyageID", T.LongType(), True),
    ]
)

VOYAGE_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("mmsi", T.IntegerType(), False),
        T.StructField("voyageid", T.LongType(), False),
        T.StructField("day", T.StringType(), False),  # YYYY-MM-DD
        T.StructField("day_first_time", T.TimestampType(), True),
        T.StructField("day_last_time", T.TimestampType(), True),
    ]
)

VOYAGE_SUMMARY_STAGING_SCHEMA = T.StructType(
    [
        T.StructField("mmsi", T.IntegerType(), False),
        T.StructField("voyageid", T.LongType(), False),
        T.StructField("day", T.StringType(), False),
        T.StructField("day_distance_km", T.DoubleType(), True),
        T.StructField("day_sum_sog", T.DoubleType(), True),
        T.StructField("day_pointcount", T.LongType(), True),
        T.StructField("day_sum_lat", T.DoubleType(), True),
        T.StructField("day_sum_lon", T.DoubleType(), True),
    ]
)

SCHEMA_MAP: dict[str, T.StructType] = {
    "raw": AIS_RAW_SCHEMA,
    "staging": AIS_STAGING_SCHEMA,
    "state_snapshot": STATE_SNAPSHOT_SCHEMA,
    "voyage_segments": VOYAGE_SEGMENTS_SCHEMA,
    "voyage_summary_staging": VOYAGE_SUMMARY_STAGING_SCHEMA,
}
