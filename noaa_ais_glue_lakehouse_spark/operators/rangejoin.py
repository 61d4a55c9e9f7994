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
    # A point lands in exactly ONE cell, so the binned join can be a plain
    # (left) join with the compound condition — no row-identity bookkeeping
    # needed for the unmatched side (and no reliance on
    # monotonically_increasing_id staying stable across recomputes).
    p = points.withColumn(
        "_pcell", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        "_icell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    cond = (F.col("_pcell") == F.col("_icell")) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    return p.join(i, cond, how).drop("_pcell", "_icell")
