"""Dimension builders (SURVEY §2 P14, D2, U3; reference
``transformations/dims/*.py``).

Pure ``DataFrame -> DataFrame`` builders: trim, standardize column
names, key-dedup (D2), literal source tags, unionByName for multi-source
dims (U3). Sources are caller-provided DataFrames (CSV lookups in the
reference); tiny static code tables ship as builders from embedded rows
for the public AIS nav-status codes so the dim layer is usable without
external lookup files.

Scale: dims are tiny by construction — they exist to be the broadcast
side of J1 lookup joins. Never partition them; write unpartitioned
single-file parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_dim_nav_status(df: DataFrame) -> DataFrame:
    """dim_nav_status — key-dedup on Code, standardized names.

    Reference: ``transformations/dims/dim_nav_status.py:18-40``.
    Input columns: Code, Navigational_Status, Meaning (any casing).
    """
    cols = {c.lower(): c for c in df.columns}
    out = df.select(
        F.col(cols["code"]).cast("int").alias("Code"),
        F.trim(F.col(cols.get("navigational_status", cols.get("statusname")))).alias(
            "StatusName"
        ),
        F.trim(F.col(cols.get("meaning", cols.get("statusdescription")))).alias(
            "StatusDescription"
        ),
    )
    return out.filter(F.col("Code").isNotNull()).dropDuplicates(["Code"])


# ITU-R M.1371 navigational status codes — public standard table
_NAV_STATUS_ROWS = [
    (0, "Under way using engine", "Vessel is navigating with engine power"),
    (1, "At anchor", "Vessel is anchored"),
    (2, "Not under command", "Vessel unable to manoeuvre"),
    (3, "Restricted manoeuverability", "Restricted in ability to manoeuvre"),
    (4, "Constrained by her draught", "Deep-draught constraint"),
    (5, "Moored", "Vessel is moored"),
    (6, "Aground", "Vessel is aground"),
    (7, "Engaged in fishing", "Vessel is fishing"),
    (8, "Under way sailing", "Vessel is sailing"),
    (9, "Reserved (HSC)", "Reserved for high-speed craft"),
    (10, "Reserved (WIG)", "Reserved for wing-in-ground craft"),
    (11, "Reserved", "Reserved for future use"),
    (12, "Reserved", "Reserved for future use"),
    (13, "Reserved", "Reserved for future use"),
    (14, "AIS-SART active", "Search and rescue transmitter"),
    (15, "Not defined", "Default / unavailable"),
]


def default_dim_nav_status(spark: SparkSession) -> DataFrame:
    """The public ITU nav-status code table as a ready dim."""
    df = spark.createDataFrame(
        _NAV_STATUS_ROWS, ["Code", "Navigational_Status", "Meaning"]
    )
    return build_dim_nav_status(df)


def build_dim_vessel_type(df: DataFrame) -> DataFrame:
    """dim_vessel_type — cast code to int, key-dedup, standardized names.

    Reference: ``transformations/dims/dim_vessel_type.py:18-43``.
    Input columns: AIS_Code, Vessel_Group, Vessel_Type, Description.
    """
    cols = {c.lower(): c for c in df.columns}
    out = df.select(
        F.col(cols["ais_code"]).cast("int").alias("AIS_Code"),
        F.trim(F.col(cols.get("vessel_group", cols.get("vesselgroup")))).alias(
            "VesselGroup"
        ),
        F.trim(F.col(cols.get("vessel_type", cols.get("vesseltype")))).alias(
            "VesselType"
        ),
        F.trim(F.col(cols.get("description", cols.get("vesseldescription")))).alias(
            "VesselDescription"
        ),
    )
    return out.filter(F.col("AIS_Code").isNotNull()).dropDuplicates(["AIS_Code"])


def build_dim_country(mid_df: DataFrame, callsign_df: DataFrame) -> DataFrame:
    """dim_country — MID rows ∪ call-sign rows, trimmed, key-deduped (U3).

    Reference: ``transformations/dims/dim_country.py:7-96``. Inputs:
    mid_df(Digit, Allocated_to), callsign_df(Series, Allocated_to).
    """
    mid = mid_df.select(
        F.col("Digit").cast("int").alias("MID"),
        F.trim(F.col("Allocated_to")).alias("Country"),
        F.lit(None).cast(T.StringType()).alias("CallSignPrefix"),
        F.lit("MID").alias("Source"),
    )
    cs = callsign_df.select(
        F.lit(None).cast(T.IntegerType()).alias("MID"),
        F.trim(F.col("Allocated_to")).alias("Country"),
        F.col("Series").cast("string").alias("CallSignPrefix"),
        F.lit("CallSign").alias("Source"),
    )
    return mid.unionByName(cs).dropDuplicates(["Country", "CallSignPrefix", "MID"])


def join_lookup(
    df: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_key: str,
    dim_value: str,
    out_col: str,
) -> DataFrame:
    """J1 — generic broadcast left lookup join (code → description).

    Reference: ``utils/common_functions_raw.py:163-175``. The dim side is
    explicitly broadcast — dims are small by contract, and at 100 TB the
    alternative (shuffling the fact table to join a 16-row dim) is the
    single most expensive accidental shuffle a pipeline can have.
    """
    lookup = F.broadcast(
        dim.select(F.col(dim_key).alias(key_col), F.col(dim_value).alias(out_col))
    )
    return df.join(lookup, on=key_col, how="left")
