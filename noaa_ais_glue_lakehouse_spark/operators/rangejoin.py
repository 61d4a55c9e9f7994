"""Range (interval) join — match points to containing intervals without a
theta join (named alongside as-of join in the engine brief).

Naive ``point BETWEEN lo AND hi`` is a BroadcastNestedLoop/cartesian at
scale. The standard fix is grid binning: quantize both sides to cells of
width ``bin_width`` — an interval covers every cell it overlaps (explode
of a cell sequence), a point lands in exactly one cell — equi-join on
(key?, cell), then apply the exact BETWEEN predicate. One hash-shuffle on
the cell key; candidate volume ∝ interval length / bin_width, tunable to
the data's interval distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row containing them.

    Both inputs keep all their columns (name collisions are the caller's
    to alias). ``how`` supports 'inner' and 'left' (points with no
    containing interval keep NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    p = points.withColumn("_pid", F.monotonically_increasing_id()).withColumn(
        "_cell", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    cond = F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    matched = p.join(i, "_cell").filter(cond)
    if how == "inner":
        return matched.drop("_cell", "_pid")
    missing = p.join(matched.select("_pid").distinct(), "_pid", "left_anti")
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(missing).drop("_cell", "_pid")
