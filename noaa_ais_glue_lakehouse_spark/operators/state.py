"""Stateful-batch operators: snapshot seeds, seeded unions, state merge
(SURVEY §2.7 U1, §2.3 J2, §2.9 T1-T4).

The reference simulates a stream with date-window batch runs + persisted
state snapshots; these operators are the composable pieces. The Structured
Streaming analogs live in ``noaa_ais_glue_lakehouse_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_seeded_union(
    state_df: DataFrame,
    window_df: DataFrame,
    session_col: str,
    seed_col: str = "seed_session_id",
) -> DataFrame:
    """U1 — tag state rows is_seed=True and carry their session id as the
    seed; tag window rows False/null; unionByName allowing missing columns.

    Reference: ``utils/common_functions_curated.py:255-281``.
    """
    seeds = state_df.withColumn("is_seed", F.lit(True)).withColumnRenamed(
        session_col, seed_col
    )
    fresh = window_df.withColumn("is_seed", F.lit(False)).withColumn(
        seed_col, F.lit(None).cast("long")
    )
    return seeds.unionByName(fresh, allowMissingColumns=True)


def merge_state_full_outer(
    state_df: DataFrame,
    delta_df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    """J2 — full-outer merge of running aggregates with window deltas:
    sums add, mins take least, maxes take greatest, with null-coalescing
    on both sides.

    Reference: ``transformations/facts/fact_voyage_summary.py:105-161``
    (the legacy incremental path — dead code there per SURVEY §7.4.1, but
    the merge semantics are the engine's incremental-aggregate primitive;
    on Delta-backed tables this is exactly ``MERGE INTO``).
    """
    s = state_df.alias("s")
    d = delta_df.alias("d")
    merged = s.join(d, keys, "full_outer")
    exprs = [F.coalesce(*[F.col(f"s.{k}"), F.col(f"d.{k}")]).alias(k) for k in keys]
    for c in sum_cols:
        exprs.append(
            (
                F.coalesce(F.col(f"s.{c}"), F.lit(0)) + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        exprs.append(
            F.when(
                F.col(f"s.{c}").isNull(), F.col(f"d.{c}")
            ).when(
                F.col(f"d.{c}").isNull(), F.col(f"s.{c}")
            ).otherwise(F.least(F.col(f"s.{c}"), F.col(f"d.{c}"))).alias(c)
        )
    for c in max_cols:
        exprs.append(
            F.when(
                F.col(f"s.{c}").isNull(), F.col(f"d.{c}")
            ).when(
                F.col(f"d.{c}").isNull(), F.col(f"s.{c}")
            ).otherwise(F.greatest(F.col(f"s.{c}"), F.col(f"d.{c}"))).alias(c)
        )
    return merged.select(*exprs)
