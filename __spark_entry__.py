"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the voyage-summary-style
sessionize + two-level rollup) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator catalog from
``noaa_ais_glue_lakehouse_spark.plans.catalog`` — one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from noaa_ais_glue_lakehouse_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.q12_session_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
