"""Cross-shelf composite smoke queries.

The external driver's correctness gate samples a fixed subset of the
catalog, so a freshly shipped shelf can go rounds without driver-gate
exposure (round-9 verdict ask #4: q499–q503 were selfcheck-green but
never driver-sampled). A composite smoke query folds one round's new
shelf into a single small hash-checked result: each member contributes
integer summary metrics (counts, flag sums, int64 scalars) plus its
headline doubles taken VERBATIM from the member's own hash-checked
output — no cross-row float aggregation, so the composite is exactly as
portable as its members.

The oracle is composed mechanically from the members' REGISTERED oracle
texts (DuckDB allows CTEs inside derived tables), so the two sides can
never drift apart: editing a member's oracle edits the smoke oracle.
This module must therefore import AFTER every module it samples (it is
the last catalog import in ``__init__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (
    get_query,
    oracle_sql,
    register,
)

__all__ = ["q505_round9_shelf_smoke", "q539_round10_shelf_smoke"]

_O = oracle_sql()


def _metric_rows(df: DataFrame, *cols) -> DataFrame:
    """Explode a 1-row summary frame into (metric, value_long,
    value_double) rows — one struct per (name, long_col|None,
    double_col|None) spec, single scan of the source."""
    structs = []
    for name, long_col, double_col in cols:
        structs.append(
            F.struct(
                F.lit(name).alias("metric"),
                (
                    F.col(long_col).cast("long")
                    if long_col
                    else F.lit(None).cast("long")
                ).alias("value_long"),
                (
                    F.col(double_col).cast("double")
                    if double_col
                    else F.lit(None).cast("double")
                ).alias("value_double"),
            )
        )
    return df.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


@register(
    "q505_round9_shelf_smoke",
    allow_non_equi=(
        "composite smoke over q499-q503: inherits the members' "
        "documented 1-row scalar broadcast cross joins (Holm m-scalar, "
        "vocab total-mass, G-test grand total, Tukey pooled variance), "
        "all group-cardinality"
    ),
    oracle=f"""
    WITH s499 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tests,
             CAST(SUM(holm_discovery) AS BIGINT) AS holm,
             CAST(SUM(bonferroni_discovery) AS BIGINT) AS bonf
      FROM ({_O["q499_holm_stepdown_screen"]})
    ), s500 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS deciles,
             CAST(MAX(CASE WHEN decile = 0 THEN cum_mass_ppm END)
                  AS BIGINT) AS top_ppm,
             CAST(SUM(token_mass) AS BIGINT) AS mass
      FROM ({_O["q500_vocab_coverage_curve"]})
    ), s501 AS (
      SELECT * FROM ({_O["q501_gumbel_block_maxima"]})
    ), s502 AS (
      SELECT * FROM ({_O["q502_g_test_independence"]})
    ), s503 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS pairs,
             CAST(MAX(df_within) AS BIGINT) AS dfw,
             MAX(CASE WHEN rnk = 1 THEN q_stat END) AS top_q
      FROM ({_O["q503_tukey_hsd"]})
    )
    SELECT metric, value_long, value_double FROM (
      SELECT 'q499_tests' AS metric, tests AS value_long,
             CAST(NULL AS DOUBLE) AS value_double FROM s499
      UNION ALL SELECT 'q499_holm_hits', holm, NULL FROM s499
      UNION ALL SELECT 'q499_bonf_hits', bonf, NULL FROM s499
      UNION ALL SELECT 'q500_deciles', deciles, NULL FROM s500
      UNION ALL SELECT 'q500_top_decile_ppm', top_ppm, NULL FROM s500
      UNION ALL SELECT 'q500_token_mass', mass, NULL FROM s500
      UNION ALL SELECT 'q501_n_blocks', n_blocks, NULL FROM s501
      UNION ALL SELECT 'q501_obs_max_cents', observed_max_cents, NULL
                 FROM s501
      UNION ALL SELECT 'q501_gumbel_mu', NULL, gumbel_mu FROM s501
      UNION ALL SELECT 'q502_df', df, NULL FROM s502
      UNION ALL SELECT 'q502_g_stat', NULL, g_stat FROM s502
      UNION ALL SELECT 'q502_p_approx', NULL, p_approx FROM s502
      UNION ALL SELECT 'q503_pairs', pairs, NULL FROM s503
      UNION ALL SELECT 'q503_df_within', dfw, NULL FROM s503
      UNION ALL SELECT 'q503_top_q_stat', NULL, top_q FROM s503
    ) ORDER BY metric
    """,
)
def q505_round9_shelf_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 shelf smoke: 15 summary metrics drawn from the five
    round-9 statistics queries (q499 Holm step-down, q500 vocabulary
    coverage, q501 Gumbel EVT, q502 G-test, q503 Tukey HSD) in one
    hash-checked row set. Integer metrics aggregate exactly (counts,
    discovery-flag sums, int64 scalars); the three headline doubles
    (gumbel_mu, g_stat/p_approx, top q_stat) pass through verbatim from
    1-row member outputs, so no float summation order is introduced.

    Scale: strictly the members' own plans plus five tiny rollups —
    the most expensive member (q500) is one token-grain count."""
    g499 = get_query("q499_holm_stepdown_screen")(spark, sf_dir)
    s499 = g499.agg(
        F.count(F.lit(1)).cast("long").alias("tests"),
        F.sum("holm_discovery").cast("long").alias("holm"),
        F.sum("bonferroni_discovery").cast("long").alias("bonf"),
    )
    r499 = _metric_rows(
        s499,
        ("q499_tests", "tests", None),
        ("q499_holm_hits", "holm", None),
        ("q499_bonf_hits", "bonf", None),
    )

    g500 = get_query("q500_vocab_coverage_curve")(spark, sf_dir)
    s500 = g500.agg(
        F.count(F.lit(1)).cast("long").alias("deciles"),
        F.max(
            F.when(F.col("decile") == 0, F.col("cum_mass_ppm"))
        ).cast("long").alias("top_ppm"),
        F.sum("token_mass").cast("long").alias("mass"),
    )
    r500 = _metric_rows(
        s500,
        ("q500_deciles", "deciles", None),
        ("q500_top_decile_ppm", "top_ppm", None),
        ("q500_token_mass", "mass", None),
    )

    r501 = _metric_rows(
        get_query("q501_gumbel_block_maxima")(spark, sf_dir),
        ("q501_n_blocks", "n_blocks", None),
        ("q501_obs_max_cents", "observed_max_cents", None),
        ("q501_gumbel_mu", None, "gumbel_mu"),
    )

    r502 = _metric_rows(
        get_query("q502_g_test_independence")(spark, sf_dir),
        ("q502_df", "df", None),
        ("q502_g_stat", None, "g_stat"),
        ("q502_p_approx", None, "p_approx"),
    )

    g503 = get_query("q503_tukey_hsd")(spark, sf_dir)
    s503 = g503.agg(
        F.count(F.lit(1)).cast("long").alias("pairs"),
        F.max("df_within").cast("long").alias("dfw"),
        F.max(
            F.when(F.col("rnk") == 1, F.col("q_stat"))
        ).cast("double").alias("top_q"),
    )
    r503 = _metric_rows(
        s503,
        ("q503_pairs", "pairs", None),
        ("q503_df_within", "dfw", None),
        ("q503_top_q_stat", None, "top_q"),
    )

    return (
        r499.unionByName(r500)
        .unionByName(r501)
        .unionByName(r502)
        .unionByName(r503)
        .orderBy("metric")
    )


@register(
    "q539_round10_shelf_smoke",
    allow_non_equi=(
        "composite smoke over the round-10 shelf: inherits the members' "
        "documented bounded cross joins (JT band-cell pairs, Wasserstein "
        "name attach, NB 5-row class dimension), all group-cardinality"
    ),
    oracle=f"""
    WITH s513 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS lags,
             CAST(SUM(mk) AS BIGINT) AS mk_sum,
             MAX(q_lb) AS q7
      FROM ({_O["q513_ljung_box"]})
    ), s517 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS candidates,
             CAST(SUM(rows_to_remove) AS BIGINT) AS rm,
             CAST(MAX(g3_ppm) AS BIGINT) AS max_ppm
      FROM ({_O["q517_fd_violation_audit"]})
    ), s521 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS phrases,
             CAST(MAX(score_e6) AS BIGINT) AS top_score,
             CAST(SUM(occurrences) AS BIGINT) AS occ
      FROM ({_O["q521_rake_keywords"]})
    ), s523 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cells,
             CAST(SUM(n_docs) AS BIGINT) AS docs,
             CAST(SUM(CASE WHEN true_lang = pred_lang THEN n_docs
                           ELSE 0 END) AS BIGINT) AS correct
      FROM ({_O["q523_naive_bayes_langid"]})
    ), s528 AS (
      SELECT * FROM ({_O["q528_jonckheere_terpstra"]})
    ), s538 AS (
      SELECT * FROM ({_O["q538_wasserstein_1d"]})
    )
    SELECT metric, value_long, value_double FROM (
      SELECT 'q513_lags' AS metric, lags AS value_long,
             CAST(NULL AS DOUBLE) AS value_double FROM s513
      UNION ALL SELECT 'q513_mk_sum', mk_sum, NULL FROM s513
      UNION ALL SELECT 'q513_q_lb7', NULL, q7 FROM s513
      UNION ALL SELECT 'q517_candidates', candidates, NULL FROM s517
      UNION ALL SELECT 'q517_rows_to_remove', rm, NULL FROM s517
      UNION ALL SELECT 'q517_max_g3_ppm', max_ppm, NULL FROM s517
      UNION ALL SELECT 'q521_phrases', phrases, NULL FROM s521
      UNION ALL SELECT 'q521_top_score_e6', top_score, NULL FROM s521
      UNION ALL SELECT 'q521_occurrences', occ, NULL FROM s521
      UNION ALL SELECT 'q523_confusion_cells', cells, NULL FROM s523
      UNION ALL SELECT 'q523_test_docs', docs, NULL FROM s523
      UNION ALL SELECT 'q523_correct_docs', correct, NULL FROM s523
      UNION ALL SELECT 'q528_j2', j2, NULL FROM s528
      UNION ALL SELECT 'q528_z', NULL, z FROM s528
      UNION ALL SELECT 'q538_w1_num', w1_num, NULL FROM s538
      UNION ALL SELECT 'q538_w1_cents', NULL, w1_cents FROM s538
    ) ORDER BY metric
    """,
)
def q539_round10_shelf_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 shelf smoke (the q505 convention): 16 summary metrics
    drawn from six members spanning every module this round added —
    q513 Ljung-Box (inference), q517 FD audit (profiling), q521 RAKE
    and q523 Naive Bayes (textml), q528 Jonckheere-Terpstra, and q538
    Wasserstein — folded into one hash-checked row set so the driver's
    fixed sample gets exposure to the whole shelf through a single
    entry. Integer metrics aggregate exactly; the three headline
    doubles (lag-7 Q_LB via monotone MAX, the JT z and W1 distance
    from 1-row members) introduce no float summation order.

    The oracle is composed mechanically from the members' REGISTERED
    oracle texts, so editing a member's oracle edits this one."""
    s513 = get_query("q513_ljung_box")(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("lags"),
        F.sum("mk").cast("long").alias("mk_sum"),
        F.max("q_lb").cast("double").alias("q7"),
    )
    r513 = _metric_rows(
        s513,
        ("q513_lags", "lags", None),
        ("q513_mk_sum", "mk_sum", None),
        ("q513_q_lb7", None, "q7"),
    )
    s517 = get_query("q517_fd_violation_audit")(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("candidates"),
        F.sum("rows_to_remove").cast("long").alias("rm"),
        F.max("g3_ppm").cast("long").alias("max_ppm"),
    )
    r517 = _metric_rows(
        s517,
        ("q517_candidates", "candidates", None),
        ("q517_rows_to_remove", "rm", None),
        ("q517_max_g3_ppm", "max_ppm", None),
    )
    s521 = get_query("q521_rake_keywords")(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("phrases"),
        F.max("score_e6").cast("long").alias("top_score"),
        F.sum("occurrences").cast("long").alias("occ"),
    )
    r521 = _metric_rows(
        s521,
        ("q521_phrases", "phrases", None),
        ("q521_top_score_e6", "top_score", None),
        ("q521_occurrences", "occ", None),
    )
    s523 = get_query("q523_naive_bayes_langid")(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("cells"),
        F.sum("n_docs").cast("long").alias("docs"),
        F.sum(
            F.when(
                F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")
            ).otherwise(0)
        ).cast("long").alias("correct"),
    )
    r523 = _metric_rows(
        s523,
        ("q523_confusion_cells", "cells", None),
        ("q523_test_docs", "docs", None),
        ("q523_correct_docs", "correct", None),
    )
    r528 = _metric_rows(
        get_query("q528_jonckheere_terpstra")(spark, sf_dir),
        ("q528_j2", "j2", None),
        ("q528_z", None, "z"),
    )
    r538 = _metric_rows(
        get_query("q538_wasserstein_1d")(spark, sf_dir),
        ("q538_w1_num", "w1_num", None),
        ("q538_w1_cents", None, "w1_cents"),
    )
    return (
        r513.unionByName(r517)
        .unionByName(r521)
        .unionByName(r523)
        .unionByName(r528)
        .unionByName(r538)
        .orderBy("metric")
    )
