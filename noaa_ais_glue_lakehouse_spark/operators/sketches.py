"""Sketch-based approximate aggregates — the bounded-memory path for
100 TB cardinality/quantile questions.

``approx_count_distinct`` (HyperLogLog++) and ``approx_percentile``
(a mergeable quantile sketch) are Spark-native, partial-aggregable, and
shuffle one sketch per group instead of the value set — the difference
between a COUNT(DISTINCT) that re-shuffles every row and one that ships
kilobytes per partition. Accuracy is tunable (rsd / accuracy params);
tolerance vs exact answers is pinned in tests/test_sketches.py rather
than a DuckDB oracle (sketch implementations differ across engines by
design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative std dev rsd)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(f"approx_n_{value_col}")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles as an array column."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias(f"quantiles_{value_col}")
    )
