"""Gap-based sessionization — the reference's voyage segmentation core
(SURVEY §2.5 W1-W4), generalized over (entity, timestamp) columns.

Reference algorithm (``utils/common_functions_curated.py:25-55``, seeded
variant ``transformations/facts/fact_voyage_trajectory.py:111-132``):

1. lag(ts) over (partitionBy entity orderBy ts)            [W1]
2. gap = ts - prev_ts                                       [W2]
3. boundary = 1 if gap > threshold (or first row)           —
4. session ordinal = running sum of boundary over the
   unbounded-preceding frame                                [W3]
5. optional seed: carry a prior-window base id per entity
   via first(seed, ignorenulls=True) over the whole
   partition; id = coalesce(base, 0) + ordinal              [W4]

This is the classic conditional-prefix-sum sessionization idiom; a single
shuffle on the entity key covers all window steps (same partitioning).
At 100 TB the partition key (entity) has bounded per-key cardinality
(~thousands of rows per vessel-day in the reference), so no salting is
needed — AQE handles stragglers (SURVEY §4 conclusion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_lag_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1/W2 — previous-row features per entity ordered by time.

    Adds ``prev_<ts_col>`` plus ``prev_<c>`` for each value column and
    ``gap_seconds``. Reference: ``fact_voyage_trajectory.py:111-124``.
    ``tiebreak_cols`` pins a total order for rows with equal timestamps so
    results are deterministic (the reference implicitly relied on input
    order; SURVEY §5 flags the risk).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    out = df.withColumn(f"prev_{ts_col}", F.lag(ts_col).over(w))
    for c in value_cols or []:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    out = out.withColumn(
        "gap_seconds",
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(f"prev_{ts_col}")))
        / F.lit(1_000_000.0),
    )
    return out


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    seed_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W3/W4 — assign a per-entity session ordinal via conditional prefix sum.

    Exact reference rule (``fact_voyage_trajectory.py:127-132``,
    ``common_functions_curated.py:25-55``):

        session = coalesce(first(seed, ignorenulls) over entity, 0)
                  + running_sum(gap > threshold ? 1 : 0)

    0-based within each entity (the first row's null gap contributes 0); a
    seed row carries the prior window's last session id so continuation rows
    inherit it and a fresh >gap row increments past it.
    """
    out = add_lag_features(df, entity_col, ts_col, tiebreak_cols=tiebreak_cols)
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)

    boundary = F.when(F.col("gap_seconds") > gap_seconds, 1).otherwise(0)
    increments = F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))

    if seed_col is not None:
        base = F.first(F.col(seed_col), ignorenulls=True).over(
            Window.partitionBy(entity_col)
        )
        session = (F.coalesce(base, F.lit(0)) + increments).cast("long")
    else:
        session = increments.cast("long")

    return out.withColumn(session_col, session).drop(f"prev_{ts_col}", "gap_seconds")


def session_bounds(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    session_col: str = "session_id",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: start/end/duration/count (+sum of value).

    The groupBy key prefix (entity) matches the sessionize shuffle key, so
    with AQE the aggregation reuses the existing partitioning where possible.
    """
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return df.groupBy(entity_col, session_col).agg(*aggs)


def latest_per_entity(
    df: DataFrame,
    entity_col: str | list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W6 — top-1 most-recent row per entity (state-snapshot seed).

    Reference: ``utils/state_io.py:52-59`` (row_number desc, keep rn==1).
    Deterministic via tiebreak columns on equal timestamps. ``entity_col``
    accepts a list for composite keys — partitioning on only the first
    component would silently drop same-first-component rows.
    """
    parts = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*parts).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
