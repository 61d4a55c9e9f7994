"""Query catalog exposed through ``__spark_entry__``."""

from noaa_ais_glue_lakehouse_spark.plans.catalog import (  # noqa: F401
    oracle_sql,
    queries,
)
