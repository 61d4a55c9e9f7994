"""Shared Spark fixture.

Deliberately a *vanilla* SparkSession (not our ``session.get_spark``
factory) so every operator is exercised the way the external driver runs
it — any dependency on factory-only confs is a bug the suite must catch
(the round-1 nanos-timestamp regression was exactly that class).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("noaa-ais-lakehouse-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()
