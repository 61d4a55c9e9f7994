"""Model-evaluation statistics computed scale-out: exact ROC-AUC without a
global rank window.

The reference engine has no model-eval surface; these operators extend the
catalog toward the training-data-pipeline use case (judging a filter or
classifier column at corpus scale) using only shuffle-bounded primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.ordering import global_running_sum


def exact_auc(
    df: DataFrame, score_col: str, positive_col: str
) -> DataFrame:
    """Exact ROC-AUC by the Mann-Whitney rank-sum identity — NO global
    single-partition rank window anywhere:

        AUC = sum_s  n_pos(s) * (n_neg_below(s) + n_neg(s)/2)  / (P*N)

    (ties get half credit — equivalent to average ranks). ``positive_col``
    must be 0/1. Returns one row: n_pos, n_neg, auc_num (= 2*U, exact
    integer), auc (rounded to 6 dp).

    Plan: one hash aggregation per distinct score, then the running count
    of negatives below each score comes from the two-phase parallel prefix
    scan (range partition + local window + driver-sized offset broadcast),
    so the global ordering never collapses into one task. Every
    intermediate before the final division is an exact integer.
    """
    g = df.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.col(positive_col).cast("long")).alias("n_pos"),
        F.sum(F.lit(1) - F.col(positive_col).cast("long")).alias("n_neg"),
    )
    run = global_running_sum(g, ["score"], "n_neg", out_col="cum_neg")
    u2 = F.sum(
        F.col("n_pos")
        * (2 * (F.col("cum_neg") - F.col("n_neg")) + F.col("n_neg"))
    )
    return run.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        u2.cast("long").alias("auc_num"),
        F.round(
            u2.cast("double") / (F.lit(2.0) * F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
    )
