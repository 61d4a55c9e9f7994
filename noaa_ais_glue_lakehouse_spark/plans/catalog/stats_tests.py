"""Rank, contingency, and goodness-of-fit hypothesis tests
(round-9 carve-out of the oversized stats.py; blocks moved verbatim).

See _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403

@register(
    "q143_chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT c.event_type, c.dow, c.o,
             SUM(c.o) OVER (PARTITION BY c.event_type) AS row_total,
             SUM(c.o) OVER (PARTITION BY c.dow) AS col_total,
             SUM(c.o) OVER () AS grand
      FROM cells c
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(o AS BIGINT) AS observed,
           ROUND(CAST(row_total AS DOUBLE) * col_total / grand, 6) AS expected,
           ROUND(POW(o - CAST(row_total AS DOUBLE) * col_total / grand, 2)
                 / (CAST(row_total AS DOUBLE) * col_total / grand), 6)
             AS chi2_term
    FROM margins
    """,
)
def q143_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit (event type × day-of-week): per-cell
    observed vs expected-under-independence counts and the χ² terms whose
    sum decides whether behavior depends on weekday — the categorical
    companion of q140's PSI, everything derived from exact integer cell
    counts so the doubles are engine-identical. One aggregation to the
    |types × 7| contingency table; margins ride window sums over that
    tiny table, never the fact."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    m = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(w_row).alias("row_total"),
        F.sum("o").over(w_col).alias("col_total"),
        F.sum("o").over(w_all).alias("grand"),
    )
    expected = F.col("row_total").cast("double") * F.col("col_total") / F.col("grand")
    return m.select(
        "event_type",
        "dow",
        F.col("o").cast("long").alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(F.col("o") - expected, 2) / expected, 6).alias("chi2_term"),
    )



@register(
    "q202_ks_drift_test",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (n0, n1) half-size scalar attached to the |distinct-values| CDF table",
    oracle="""
    WITH tagged AS (
      SELECT value,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 0 ELSE 1 END AS half
      FROM events
    ),
    n AS (
      SELECT SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1
      FROM tagged
    ),
    per_val AS (
      -- per-VALUE rollup BEFORE the running sums: with tied values the
      -- raw-row CDF would be intra-tie-order dependent (rows of both
      -- halves interleave arbitrarily under ORDER BY value alone),
      -- making MAX(|F1-F2|) nondeterministic; the rollup matches the
      -- Spark side exactly
      SELECT value,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS d0,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS d1
      FROM tagged GROUP BY value
    ),
    cdf AS (
      SELECT value,
             SUM(d0) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c0,
             SUM(d1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1
      FROM per_val
    )
    SELECT CAST((SELECT n0 FROM n) AS BIGINT) AS n_first_half,
           CAST((SELECT n1 FROM n) AS BIGINT) AS n_second_half,
           ROUND(MAX(ABS(c0 / CAST((SELECT n0 FROM n) AS DOUBLE)
                         - c1 / CAST((SELECT n1 FROM n) AS DOUBLE))), 6)
             AS ks_statistic
    FROM cdf
    """,
)
def q202_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129 — exact two-sample Kolmogorov–Smirnov statistic between the
    first and second half of the month: sup |F1(x) − F2(x)| over the
    pooled sample — the nonparametric companion to q140's binned PSI
    (KS needs no bin choice and catches shape drift PSI's bins smear).

    Tie handling is the correctness subtlety: at a value present in
    both halves, the CDF comparison is only valid AFTER both halves'
    counts at that value have accumulated — so the running sums here
    run over the per-VALUE count rollup (exact integers), not raw rows,
    which also makes the sup deterministic. The global CDF ordering
    runs over |distinct values|; at unbounded cardinality it becomes
    the q172 two-phase scan, here a plain window on the rollup.
    """
    ev = load(spark, sf_dir, "events")
    tagged = ev.select(
        "value",
        F.when(
            F.col("ts") < F.to_timestamp(F.lit("2024-01-16 00:00:00")), 0
        )
        .otherwise(1)
        .alias("half"),
    )
    per_val = tagged.groupBy("value").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("d1"),
    )
    n = tagged.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_val.select(
        "value",
        F.sum("d0").over(w).alias("c0"),
        F.sum("d1").over(w).alias("c1"),
    )
    return cdf.crossJoin(F.broadcast(n)).agg(
        F.max("n0").cast("long").alias("n_first_half"),
        F.max("n1").cast("long").alias("n_second_half"),
        F.round(
            F.max(
                F.abs(
                    F.col("c0") / F.col("n0").cast("double")
                    - F.col("c1") / F.col("n1").cast("double")
                )
            ),
            6,
        ).alias("ks_statistic"),
    )



@register(
    "q210_kaplan_meier",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the observation horizon and the total-sessions scalar attached to the |durations|-sized risk table",
    oracle="""
    WITH sess AS (
      SELECT user_id, session_id,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 60000000
               AS dur_min,
             MAX(ts) = MAX(MAX(ts)) OVER () AS censored
      FROM (
        SELECT user_id, ts, event_id,
               SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events
        )
      ) GROUP BY user_id, session_id
    ),
    risk AS (
      SELECT dur_min,
             SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS ended_here
      FROM sess GROUP BY dur_min
    ),
    km AS (
      SELECT dur_min, d,
             (SELECT COUNT(*) FROM sess) -
               COALESCE(SUM(ended_here) OVER (ORDER BY dur_min
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM risk
    )
    SELECT dur_min, CAST(d AS BIGINT) AS n_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CASE WHEN MAX(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY dur_min ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE ROUND(EXP(SUM(ln(CASE WHEN d < n_at_risk
                                      THEN 1.0 - d / CAST(n_at_risk AS DOUBLE)
                                      ELSE 1.0 END))
                           OVER (ORDER BY dur_min ROWS UNBOUNDED PRECEDING)), 6)
           END AS survival
    FROM km WHERE d > 0
    """,
)
def q210_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137 — Kaplan–Meier product-limit survival curve over session
    durations (minutes), with right-censoring: sessions still open at
    the observation horizon (their last event is the corpus's last
    event) count in the risk set but never as deaths — the estimator
    churn/retention analyses should use instead of a plain ECDF, which
    treats cut-off sessions as ended.

    The product over risk sets is exp(Σ ln(1−d/n)) — a running-sum
    window over the |distinct durations| rollup, so the whole curve is
    two tiny window passes after the sessionize shuffle. The
    at-risk count is total minus the exclusive prefix of endings, all
    exact integers.
    """
    ev = load(spark, sf_dir, "events")
    s = sessionize(
        ev, "user_id", "ts", SESSION_GAP_SECONDS, tiebreak_cols=["event_id"]
    )
    sess = s.groupBy("user_id", "session_id").agg(
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / F.lit(60000000)
        )
        .cast("long")
        .alias("dur_min"),
        F.max("ts").alias("_end"),
    )
    horizon = sess.agg(F.max("_end").alias("_h"))
    sess = sess.crossJoin(F.broadcast(horizon)).withColumn(
        "censored", F.col("_end") == F.col("_h")
    )
    risk = sess.groupBy("dur_min").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("ended_here"),
    )
    total = sess.agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("dur_min")
    prior = F.coalesce(
        F.sum("ended_here").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    km = (
        risk.crossJoin(F.broadcast(total))
        .withColumn("n_at_risk", F.col("_n") - prior)
        .filter(F.col("d") > 0)
    )
    # guard the ln at the curve's terminal drop: when a risk set empties
    # (d == n_at_risk) the survival factor is exactly 0 and every later
    # point stays 0 — ln would blow up, so flag the prefix instead
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    hit_zero = (
        F.max(
            F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
        ).over(run)
        == 1
    )
    safe_factor = F.when(
        F.col("d") < F.col("n_at_risk"),
        1.0 - F.col("d") / F.col("n_at_risk").cast("double"),
    ).otherwise(F.lit(1.0))
    surv = F.when(hit_zero, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(F.log(safe_factor)).over(run)), 6)
    )
    return km.select(
        "dur_min",
        F.col("d").cast("long").alias("n_events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        surv.alias("survival"),
    )



@register(
    "q220_auc_rank_sum",
    oracle="""
    WITH s AS (
      SELECT CAST(list_sum(list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
             AS BIGINT) AS score,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
      FROM embeddings
    ),
    g AS (
      SELECT score, SUM(pos) AS n_pos, SUM(1 - pos) AS n_neg
      FROM s GROUP BY score
    ),
    r AS (
      SELECT score, n_pos, n_neg,
             SUM(n_neg) OVER (ORDER BY score) AS cum_neg
      FROM g
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg) AS BIGINT) AS n_neg,
           CAST(SUM(n_pos * (2*(cum_neg - n_neg) + n_neg)) AS BIGINT)
             AS auc_num,
           ROUND(CAST(SUM(n_pos * (2*(cum_neg - n_neg) + n_neg)) AS DOUBLE)
                 / (2.0 * SUM(n_pos) * SUM(n_neg)), 6) AS auc
    FROM r
    """,
)
def q220_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X147 — exact ROC-AUC by the Mann-Whitney rank-sum identity,
    WITHOUT a global single-partition rank window: AUC equals
    sum over distinct scores s of  n_pos(s) * (n_neg_below(s) + n_neg(s)/2)
    normalized by n_pos*n_neg (ties get the half credit — equivalent to
    average ranks). Scorer = squared L2 norm of the embedding in integer
    micros (exact, order-free); positive class = label < 5.

    Plan shape: one hash aggregation per distinct score, then the
    running count of negatives comes from the repo's two-phase parallel
    prefix scan (``global_running_sum``) — range partition + local
    window + driver-sized offset broadcast — so the global ordering
    never collapses to one task. The numerator is kept doubled (auc_num
    = 2U) so every intermediate is an exact integer.
    """
    from noaa_ais_glue_lakehouse_spark.operators.evaluation import exact_auc

    emb = load(spark, sf_dir, "embeddings")
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("long"),
    )
    score = F.aggregate(
        micro, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    labeled = emb.select(
        score.alias("score"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    return exact_auc(labeled, "score", "pos")



@register(
    "q226_two_proportion_ztest",
    oracle="""
    WITH c AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS success
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN success ELSE 0 END) AS x_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN success ELSE 0 END) AS x_b
      FROM c
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
           ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z
    FROM m
    """,
)
def q226_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153 — pooled two-proportion z-test (the A/B-test primitive):
    among click/purchase events, does the purchase share differ between
    the even/odd user-id cohorts? Completes the hypothesis-testing
    family (chi-square q143 for independence, KS q202 for distributions
    — this one for binomial rates). Event-level trials rather than
    user-level conversion because in this synthetic corpus every user
    eventually purchases (user-level p would be exactly 1 and the
    pooled variance exactly 0).

    Plan shape: the whole statistic is ONE conditional-sum scalar
    aggregate over a pushed-down dictionary filter — no join, no
    intermediate rollup; the z formula is a closed-form expression over
    exact integers, mirrored operation-for-operation in the oracle.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("event_type") == "purchase").cast("long").alias("success"),
    )
    m = c.agg(
        F.sum((F.col("grp") == 0).cast("long")).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("success")).otherwise(0)).alias(
            "x_a"
        ),
        F.sum((F.col("grp") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("success")).otherwise(0)).alias(
            "x_b"
        ),
    )
    na, xa = F.col("n_a"), F.col("x_a")
    nb, xb = F.col("n_b"), F.col("x_b")
    pool = (xa + xb).cast("double") / (na + nb)
    z = (xa.cast("double") / na - xb.cast("double") / nb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return m.select(
        na.cast("long").alias("n_a"),
        xa.cast("long").alias("x_a"),
        nb.cast("long").alias("n_b"),
        xb.cast("long").alias("x_b"),
        F.round(z, 6).alias("z"),
    )



@register(
    "q287_spearman_correlation",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             2*RANK() OVER (PARTITION BY event_type ORDER BY epoch_us(ts))
               + COUNT(*) OVER (PARTITION BY event_type, epoch_us(ts)) - 1
               AS rx2,
             2*RANK() OVER (PARTITION BY event_type ORDER BY value)
               + COUNT(*) OVER (PARTITION BY event_type, value) - 1
               AS ry2
      FROM events
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx2) AS sx, SUM(ry2) AS sy,
             SUM(rx2*rx2) AS sxx, SUM(ry2*ry2) AS syy,
             SUM(rx2*ry2) AS sxy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
             ROUND(
               CAST(n*sxy - sx*sy AS DOUBLE)
               / SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
               / SQRT(CAST(n*syy - sy*sy AS DOUBLE)), 6)
           END AS spearman_rho
    FROM s
    """,
)
def q287_spearman_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation (is `value` drifting over
    time?) per event type. Average fractional ranks are carried DOUBLED
    (2·avg_rank = 2·rank + |ties| − 1) so every moment stays an exact
    BIGINT — the Pearson-of-ranks closed form then divides two integer
    determinants once at the end, giving an order-independent float.
    Two window passes + one aggregation, all partitioned on event_type —
    no global sort at any scale. Complements q127 (Pearson): rho is
    outlier-robust and catches monotone-but-nonlinear drift."""
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    rx2 = (
        2 * F.rank().over(Window.partitionBy("event_type").orderBy(ts_us))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", ts_us))
        - 1
    )
    ry2 = (
        2 * F.rank().over(Window.partitionBy("event_type").orderBy("value"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "value"))
        - 1
    )
    ranked = ev.select(
        "event_type", rx2.cast("long").alias("rx2"), ry2.cast("long").alias("ry2")
    )
    # moment sums and determinants in DECIMAL(38,0): the oracle's HUGEINT
    # sums are 128-bit, and n*sxx ~ 1.3*n^4 leaves int64 at ~55k rows per
    # group — decimal gives the same headroom (1e38) on the Spark side,
    # then both engines convert to double at the same point
    dec = "decimal(38,0)"
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(dec)).alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(dec)).alias("syy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(dec)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    ddx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ddy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # a constant column (all ranks tied) has zero rank variance: rho is
    # undefined -> NULL, never a divide-by-zero (ANSI mode would raise;
    # found by tests/test_properties.py::test_spearman_matches_pure_python)
    rho = F.when(
        (ddx > 0) & (ddy > 0),
        F.round(num / F.sqrt(ddx.cast("double")) / F.sqrt(ddy.cast("double")), 6),
    )
    return s.select(
        "event_type", F.col("n").cast("long").alias("n"), rho.alias("spearman_rho")
    )



@register(
    "q338_srm_check",
    oracle="""
    WITH v AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1
      FROM v
    )
    SELECT n0, n1,
           ROUND(POWER(n0 - (n0+n1)/2.0, 2) / ((n0+n1)/2.0)
                 + POWER(n1 - (n0+n1)/2.0, 2) / ((n0+n1)/2.0), 6)
             AS chi_square,
           CAST(CASE WHEN
             POWER(n0 - (n0+n1)/2.0, 2) / ((n0+n1)/2.0)
             + POWER(n1 - (n0+n1)/2.0, 2) / ((n0+n1)/2.0) > 3.841
           THEN 1 ELSE 0 END AS BIGINT) AS srm_detected
    FROM w
    """,
)
def q338_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the A/B-test hygiene gate that must
    run BEFORE any effect readout (q226/q315/q316): chi-square of the
    observed variant split against the designed 50/50; above the 3.841
    critical value (p<0.05, 1 dof) the assignment itself is broken and
    every downstream metric is garbage. One distinct-count aggregation,
    then scalar arithmetic on two numbers."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "user_id"
    ).groupBy("variant").agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")) / 2.0
    chi = F.pow(F.col("n0") - exp, 2) / exp + F.pow(F.col("n1") - exp, 2) / exp
    return w.select(
        "n0",
        "n1",
        F.round(chi, 6).alias("chi_square"),
        F.when(chi > 3.841, 1).otherwise(0).cast("long").alias("srm_detected"),
    )



@register(
    "q374_ks_source_drift",
    allow_non_equi=(
        "deliberate bounded densification: |distinct doc lengths| x "
        "|sources| spine cross join - group-cardinality, never row-level"
    ),
    oracle="""
    WITH cnt AS (
      SELECT source, n_chars AS v, COUNT(*) AS c
      FROM documents GROUP BY 1, 2
    ), spine AS (
      SELECT s.source, v.v
      FROM (SELECT DISTINCT source FROM cnt) s
      CROSS JOIN (SELECT DISTINCT v FROM cnt) v
    ), filled AS (
      SELECT sp.source, sp.v, COALESCE(c.c, 0) AS c
      FROM spine sp LEFT JOIN cnt c USING (source, v)
    ), cums AS (
      SELECT source, v,
             SUM(c) OVER (PARTITION BY source ORDER BY v) AS s_cum
      FROM filled
    ), gcum AS (
      SELECT v, SUM(s_cum) AS g_cum FROM cums GROUP BY v
    ), tot AS (
      SELECT source, MAX(s_cum) AS n_src FROM cums GROUP BY source
    ), ntot AS (SELECT MAX(g_cum) AS n FROM gcum)
    SELECT c.source,
           CAST(t.n_src AS BIGINT) AS n_src,
           CAST(n - t.n_src AS BIGINT) AS n_rest,
           CAST(MAX(ABS(c.s_cum * (n - t.n_src)
                        - (g.g_cum - c.s_cum) * t.n_src)) AS BIGINT)
             AS ks_num,
           ROUND(CAST(MAX(ABS(c.s_cum * (n - t.n_src)
                              - (g.g_cum - c.s_cum) * t.n_src)) AS DOUBLE)
                 / (t.n_src * (n - t.n_src)), 6) AS ks_stat
    FROM cums c
    JOIN gcum g USING (v)
    JOIN tot t USING (source)
    CROSS JOIN ntot
    GROUP BY c.source, t.n_src, n
    """,
)
def q374_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X304 — EXACT one-vs-rest Kolmogorov–Smirnov statistic for EVERY
    source in one plan (each source's document-length distribution vs
    the rest of the corpus): D = max_v |F_src(v) − F_rest(v)| — the
    ingest-monitoring form of the two-sample KS whose single-pair anchor
    is q202 ("did this source's docs suddenly get shorter?"). The
    composition is what's new vs q202: N one-vs-rest tests priced as one
    densified cumulative pass, not N plan instantiations.

    Engine-exactness: ECDF differences are compared by integer
    cross-multiplication — |s_cum·n_rest − rest_cum·n_src| over the
    common denominator n_src·n_rest, so the max is over exact int64
    values (products bounded by N², the q361 3·10⁹ regime); one display
    division. The value spine is densified per source (q361 lesson) so
    cumulative counts align; the rest-ECDF needs NO second pass —
    because the spine is dense, g_cum(v) = Σ_sources s_cum(source, v),
    one aggregate over the already-computed per-source cumulatives.

    Scale: work is |distinct lengths|·|sources| after one (source,
    value) pre-aggregation of the corpus — group-cardinality. For
    continuous metrics, quantize values first (the q350 bucketing
    pattern) to bound the spine."""
    docs = load(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    spine = cnt.select("source").distinct().crossJoin(
        cnt.select("v").distinct()
    )
    filled = spine.join(cnt, ["source", "v"], "left").select(
        "source", "v", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = filled.select(
        "source", "v", F.sum("c").over(w_cum).alias("s_cum")
    )
    glob = cums.groupBy("v").agg(F.sum("s_cum").alias("g_cum"))
    tot = cums.groupBy("source").agg(F.max("s_cum").alias("n_src"))
    ntot = glob.agg(F.max("g_cum").alias("n"))
    d = (
        cums.join(F.broadcast(glob), "v")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(ntot))
        .select(
            "source",
            "n_src",
            (F.col("n") - F.col("n_src")).alias("n_rest"),
            F.abs(
                F.col("s_cum") * (F.col("n") - F.col("n_src"))
                - (F.col("g_cum") - F.col("s_cum")) * F.col("n_src")
            ).alias("diff_num"),
        )
    )
    return d.groupBy("source", "n_src", "n_rest").agg(
        F.max("diff_num").cast("long").alias("ks_num"),
        F.round(
            F.max("diff_num").cast("double")
            / (F.col("n_src") * F.col("n_rest")),
            6,
        ).alias("ks_stat"),
    ).select(
        "source",
        F.col("n_src").cast("long").alias("n_src"),
        F.col("n_rest").cast("long").alias("n_rest"),
        "ks_num",
        "ks_stat",
    )



@register(
    "q376_fleiss_kappa",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join pairing the item-"
        "agreement scalar with the rater-marginal scalar - "
        "group-cardinality, never row-level"
    ),
    oracle="""
    WITH r AS (
      SELECT event_id,
             CASE WHEN value < 167 THEN 0 WHEN value < 334 THEN 1 ELSE 2 END
               AS r1,
             CAST(((event_id % 3) * (2654435761 % 3)) % 3 AS BIGINT) AS r2,
             CAST(EXTRACT(hour FROM ts) % 3 AS BIGINT) AS r3
      FROM events
    ), s AS (
      SELECT SUM(CASE WHEN r1 = r2 AND r2 = r3 THEN 6
                      WHEN r1 = r2 OR r2 = r3 OR r1 = r3 THEN 2
                      ELSE 0 END) AS s_sum,
             COUNT(*) AS n_items
      FROM r
    ), votes AS (
      SELECT r1 AS cat FROM r UNION ALL
      SELECT r2 FROM r UNION ALL
      SELECT r3 FROM r
    ), marg AS (
      SELECT SUM(c * c) AS sum_cj2
      FROM (SELECT cat, COUNT(*) AS c FROM votes GROUP BY cat)
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(3 AS BIGINT) AS n_raters,
           CAST(s_sum AS BIGINT) AS s_sum,
           CAST(sum_cj2 AS BIGINT) AS sum_cj2,
           ROUND(CAST(s_sum AS DOUBLE) / (n_items * 6.0), 6) AS p_bar,
           ROUND(CAST(sum_cj2 AS DOUBLE) / (9.0 * n_items * n_items), 6)
             AS p_e,
           ROUND((CAST(s_sum AS DOUBLE) / (n_items * 6.0)
                  - CAST(sum_cj2 AS DOUBLE) / (9.0 * n_items * n_items))
                 / (1.0 - CAST(sum_cj2 AS DOUBLE)
                          / (9.0 * n_items * n_items)), 6) AS fleiss_kappa
    FROM s CROSS JOIN marg
    """,
)
def q376_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X306 — Fleiss' kappa for MULTI-rater agreement (Fleiss 1971): the
    statistic annotation pipelines publish when three or more labelers
    (or LLM judges) rate the same items on a category scale — q263 is
    the two-rater Cohen form; Fleiss generalizes to n raters via
    per-item agreement P_i = (Σ_j n_ij² − n)/(n(n−1)) against the
    chance agreement of the pooled marginals. Raters here are three
    deterministic category rules on each event (value band, hash digit,
    hour band) — swap in real annotator columns without changing the
    plan.

    Engine-exactness: with n=3 raters, Σ_j n_ij² − n is row-LOCAL
    ({6, 2, 0} for unanimous/majority/split — no per-item explode or
    pivot), so the corpus collapses in one aggregate; the marginal
    Σc_j² comes from a 3×-union vote rollup (|categories| rows). All
    aggregates are exact int64; P̄, P_e and κ are three mirrored final
    double expressions (the products n_items·6 and 9·n_items² would
    need int128 — the doubles are one-shot displays, not accumulators).

    Scale: one row-local pass + one 1-row aggregate + one
    category-cardinality rollup — corpus touched once, no joins on the
    big side."""
    ev = load(spark, sf_dir, "events")
    r = ev.select(
        F.when(F.col("value") < 167, 0)
        .when(F.col("value") < 334, 1)
        .otherwise(2)
        .cast("long")
        .alias("r1"),
        # mod-reduce BEFORE the multiply: (a·b) mod 3 ≡ ((a mod 3)·(b mod 3))
        # mod 3, so this is exact for ALL int64 event_ids, whereas the naive
        # event_id * 2654435761 overflows (and wraps negative, putting r2
        # outside {0,1,2}) beyond event_id ~3.5e9.
        F.pmod(F.pmod(F.col("event_id"), 3) * F.lit(2654435761 % 3), 3)
        .cast("long")
        .alias("r2"),
        (F.hour("ts") % 3).cast("long").alias("r3"),
    )
    s_agg = r.agg(
        F.sum(
            F.when(
                (F.col("r1") == F.col("r2")) & (F.col("r2") == F.col("r3")), 6
            )
            .when(
                (F.col("r1") == F.col("r2"))
                | (F.col("r2") == F.col("r3"))
                | (F.col("r1") == F.col("r3")),
                2,
            )
            .otherwise(0)
        ).alias("s_sum"),
        F.count(F.lit(1)).alias("n_items"),
    )
    votes = (
        r.select(F.col("r1").alias("cat"))
        .unionByName(r.select(F.col("r2").alias("cat")))
        .unionByName(r.select(F.col("r3").alias("cat")))
    )
    marg = (
        votes.groupBy("cat")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("sum_cj2"))
    )
    p_bar = "CAST(s_sum AS DOUBLE) / (n_items * 6.0)"
    p_e = "CAST(sum_cj2 AS DOUBLE) / (9.0 * n_items * n_items)"
    return s_agg.crossJoin(F.broadcast(marg)).select(
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(3).cast("long").alias("n_raters"),
        F.col("s_sum").cast("long").alias("s_sum"),
        F.col("sum_cj2").cast("long").alias("sum_cj2"),
        F.expr(f"ROUND({p_bar}, 6)").alias("p_bar"),
        F.expr(f"ROUND({p_e}, 6)").alias("p_e"),
        F.expr(f"ROUND(({p_bar} - {p_e}) / (1.0 - {p_e}), 6)").alias(
            "fleiss_kappa"
        ),
    )



@register(
    "q382_kendall_tau_b",
    allow_non_equi=(
        "deliberate bounded cell-pair cross join: the 10x8 contingency "
        "relation joined with itself (<=6400 pairs) plus SINGLE-ROW "
        "scalar cross joins - group-cardinality, never row-level"
    ),
    oracle="""
    WITH b AS (
      SELECT LEAST(9, CAST(FLOOR(value / 50) AS BIGINT)) AS bx,
             CAST(EXTRACT(hour FROM ts) // 3 AS BIGINT) AS by
      FROM events
    ), cells AS (
      SELECT bx, by, COUNT(*) AS n FROM b GROUP BY bx, by
    ), cd AS (
      SELECT SUM(CASE WHEN c2.bx > c1.bx AND c2.by > c1.by
                      THEN c1.n * c2.n ELSE 0 END) AS conc,
             SUM(CASE WHEN c2.bx > c1.bx AND c2.by < c1.by
                      THEN c1.n * c2.n ELSE 0 END) AS disc
      FROM cells c1 CROSS JOIN cells c2
    ), rows_t AS (
      SELECT SUM(t * (t - 1) // 2) AS n1
      FROM (SELECT bx, SUM(n) AS t FROM cells GROUP BY bx)
    ), cols_t AS (
      SELECT SUM(t * (t - 1) // 2) AS n2
      FROM (SELECT by, SUM(n) AS t FROM cells GROUP BY by)
    ), tot AS (
      SELECT SUM(n) AS nn FROM cells
    )
    SELECT CAST(nn AS BIGINT) AS n_rows,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           CAST(nn * (nn - 1) // 2 - n1 AS BIGINT) AS denom_x,
           CAST(nn * (nn - 1) // 2 - n2 AS BIGINT) AS denom_y,
           ROUND(CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(nn * (nn - 1) // 2 - n1 AS DOUBLE)
                        * CAST(nn * (nn - 1) // 2 - n2 AS DOUBLE)), 6)
             AS tau_b
    FROM cd CROSS JOIN rows_t CROSS JOIN cols_t CROSS JOIN tot
    """,
)
def q382_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X312 — Kendall's τ-b between two ORDINAL encodings (value band ×
    hour band), computed exactly from the contingency table: the
    tie-corrected rank-association statistic — completes the
    association family (q127 exact Pearson, q287 Spearman, q249
    Mann-Kendall trend, q339 mutual information; τ-b is the one built
    from concordant/discordant PAIRS, the right tool when both axes are
    coarse ordinal scales and ties dominate).

    Engine-exactness: over a c-cell contingency table, concordant/
    discordant pair counts are Σ n_ij·n_i'j' over cell pairs — exact
    int64 (bounded by n²/2; int64 to n < 3·10⁹, the q361 regime), and
    the tie terms are marginal-count arithmetic. The corpus collapses
    to ≤80 cells in ONE aggregate; C/D come from the bounded cell-pair
    cross join (≤6400 rows), and τ-b is one final double expression
    (sqrt of exact integers), rounded once.

    Scale: one groupBy on (band, band) touches the corpus; everything
    after is constant-size arithmetic — the same collapse that makes
    q370's split finder corpus-size-independent."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        F.least(F.lit(9), F.floor(F.col("value") / 50).cast("long")).alias(
            "bx"
        ),
        F.expr("CAST(hour(ts) DIV 3 AS BIGINT)").alias("by"),
    )
    cells = b.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("n"))
    c1 = cells.select(
        F.col("bx").alias("x1"), F.col("by").alias("y1"), F.col("n").alias("n1_")
    )
    c2 = cells.select(
        F.col("bx").alias("x2"), F.col("by").alias("y2"), F.col("n").alias("n2_")
    )
    cd = (
        c1.crossJoin(F.broadcast(c2))
        .agg(
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")),
                    F.col("n1_") * F.col("n2_"),
                ).otherwise(0)
            ).alias("conc"),
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1")),
                    F.col("n1_") * F.col("n2_"),
                ).otherwise(0)
            ).alias("disc"),
        )
    )
    rows_t = (
        cells.groupBy("bx")
        .agg(F.sum("n").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n1"))
    )
    cols_t = (
        cells.groupBy("by")
        .agg(F.sum("n").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n2"))
    )
    tot = cells.agg(F.sum("n").alias("nn"))
    return (
        cd.crossJoin(F.broadcast(rows_t))
        .crossJoin(F.broadcast(cols_t))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("nn").cast("long").alias("n_rows"),
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            F.expr("nn * (nn - 1) DIV 2 - n1").cast("long").alias("denom_x"),
            F.expr("nn * (nn - 1) DIV 2 - n2").cast("long").alias("denom_y"),
            F.expr(
                "ROUND(CAST(conc - disc AS DOUBLE)"
                " / sqrt(CAST(nn * (nn - 1) DIV 2 - n1 AS DOUBLE)"
                "        * CAST(nn * (nn - 1) DIV 2 - n2 AS DOUBLE)), 6)"
            ).alias("tau_b"),
        )
    )



@register(
    "q405_msprt_always_valid",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(user_id % 2 AS BIGINT) AS arm,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(value * 100) AS BIGINT)
                 * CAST(ROUND(value * 100) AS BIGINT)) AS s2
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT day, arm,
             SUM(n) OVER w AS n, SUM(s1) OVER w AS s1, SUM(s2) OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY arm ORDER BY day)
    ), wide AS (
      SELECT t.day,
             t.n AS n_t, c.n AS n_c,
             CAST(t.s1 AS DOUBLE) / t.n - CAST(c.s1 AS DOUBLE) / c.n
               AS delta,
             (CAST(t.n * t.s2 - t.s1 * t.s1 AS DOUBLE)
              / (t.n * (t.n - 1.0))) / t.n
             + (CAST(c.n * c.s2 - c.s1 * c.s1 AS DOUBLE)
                / (c.n * (c.n - 1.0))) / c.n AS v
      FROM cum t JOIN cum c ON c.day = t.day AND t.arm = 1 AND c.arm = 0
      WHERE t.n >= 2 AND c.n >= 2
    ), lam AS (
      SELECT day, n_t, n_c, delta, v,
             sqrt(v / (v + 10000.0))
             * exp(delta * delta * 10000.0 / (2.0 * v * (v + 10000.0)))
               AS lambda
      FROM wide WHERE v > 0
    )
    SELECT day,
           CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
           ROUND(delta, 6) AS delta_cents,
           ROUND(lambda, 6) AS mixture_lr,
           ROUND(LEAST(1.0, MIN(1.0 / lambda)
                 OVER (ORDER BY day)), 6) AS always_valid_p
    FROM lam
    """,
)
def q405_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X335 — mSPRT ALWAYS-VALID A/B inference (mixture sequential
    probability ratio test, Johari et al. 2017 — the "peeking-safe"
    p-value modern experimentation platforms publish): per day, the
    cumulative two-arm mean difference δ̂ (arms = user_id parity,
    metric = value cents), its variance V from exact integer moments,
    the normal-mixture likelihood ratio
    Λ = √(V/(V+τ²))·exp(δ̂²τ²/(2V(V+τ²))) with τ² = 10,000 (τ = 100
    cents, the prior effect scale), and the always-valid p-value
    p_t = min(1, min_{s≤t} 1/Λ_s) — monotone by construction, so the
    experimenter can stop ANY day without inflating false positives
    (the fixed-horizon tests q226/q315 can't offer that). Cumulative
    moments come from per-(day, arm) partials via prefix windows, so
    the corpus is touched once; every float enters through one fixed
    expression over exact int64 determinants.

    Scale: day×arm partials are map-side combinable; the sequential
    layer runs on |days| rows."""
    ev = load(spark, sf_dir, "events")
    v_c = cents(F.col("value"))
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.col("user_id") % 2).cast("long").alias("arm"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v_c).alias("s1"),
        F.sum(v_c * v_c).alias("s2"),
    )
    w = Window.partitionBy("arm").orderBy("day")
    cum = daily.select(
        "day",
        "arm",
        F.sum("n").over(w).alias("n"),
        F.sum("s1").over(w).alias("s1"),
        F.sum("s2").over(w).alias("s2"),
    )
    t = cum.filter(F.col("arm") == 1).select(
        "day",
        F.col("n").alias("n_t"),
        F.col("s1").alias("s1_t"),
        F.col("s2").alias("s2_t"),
    )
    c = cum.filter(F.col("arm") == 0).select(
        "day",
        F.col("n").alias("n_c"),
        F.col("s1").alias("s1_c"),
        F.col("s2").alias("s2_c"),
    )
    delta = F.col("s1_t").cast("double") / F.col("n_t") - F.col(
        "s1_c"
    ).cast("double") / F.col("n_c")
    var_t = (
        (F.col("n_t") * F.col("s2_t") - F.col("s1_t") * F.col("s1_t")).cast(
            "double"
        )
        / (F.col("n_t") * (F.col("n_t") - F.lit(1.0)))
    ) / F.col("n_t")
    var_c = (
        (F.col("n_c") * F.col("s2_c") - F.col("s1_c") * F.col("s1_c")).cast(
            "double"
        )
        / (F.col("n_c") * (F.col("n_c") - F.lit(1.0)))
    ) / F.col("n_c")
    wide = (
        t.join(c, "day")
        .filter((F.col("n_t") >= 2) & (F.col("n_c") >= 2))
        .select(
            "day",
            "n_t",
            "n_c",
            delta.alias("delta"),
            (var_t + var_c).alias("v"),
        )
        .filter(F.col("v") > 0)
    )
    lam = wide.withColumn(
        "lambda",
        F.sqrt(F.col("v") / (F.col("v") + 10000.0))
        * F.exp(
            F.col("delta")
            * F.col("delta")
            * 10000.0
            / (2.0 * F.col("v") * (F.col("v") + 10000.0))
        ),
    )
    wseq = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lam.select(
        "day",
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.round("delta", 6).alias("delta_cents"),
        F.round("lambda", 6).alias("mixture_lr"),
        F.round(
            F.least(F.lit(1.0), F.min(1.0 / F.col("lambda")).over(wseq)), 6
        ).alias("always_valid_p"),
    )



@register(
    "q409_bh_fdr_screen",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), d AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(vc) AS BIGINT) AS s_d
      FROM v GROUP BY event_type, day
    ), t AS (
      SELECT event_type,
             CAST(SUM(n_d) AS BIGINT) AS n_t,
             CAST(SUM(s_d) AS BIGINT) AS s_t
      FROM d GROUP BY event_type
    ), t2 AS (
      SELECT event_type, CAST(SUM(vc * vc) AS BIGINT) AS s2_t
      FROM v GROUP BY event_type
    ), z AS (
      SELECT d.event_type, d.day, d.n_d,
             {_Z_DAY_VS_TYPE_EXPR.replace("s_d", "d.s_d")
                                 .replace("n_d", "d.n_d")} AS z
      FROM d JOIN t USING (event_type) JOIN t2 USING (event_type)
    ), p AS (
      SELECT event_type, day, n_d, z, az, tt,
             ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_r
      FROM (SELECT *, ABS(z) AS az,
                   1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
            FROM z)
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY p_r, event_type, day) AS bh_rank,
             COUNT(*) OVER () AS m
      FROM p
    ), kstar AS (
      SELECT *,
             MAX(CASE WHEN p_r <= bh_rank * 0.05 / m
                      THEN bh_rank ELSE 0 END) OVER () AS k_star
      FROM ranked
    )
    SELECT event_type, day,
           CAST(n_d AS BIGINT) AS n,
           ROUND(z, 6) AS z_score,
           p_r AS p_value,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           CAST(CASE WHEN bh_rank <= k_star THEN 1 ELSE 0 END AS BIGINT)
             AS discovery
    FROM kstar
    """,
)
def q409_bh_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X339 — BENJAMINI–HOCHBERG FDR screen (Benjamini & Hochberg 1995
    step-up at q=0.05) over a grid of per-(type, day) anomaly tests:
    each day's mean value is z-tested against its event type's global
    moments, p-values come from the shared-text normal-CDF polynomial
    (Zelen & Severo 26.2.17 — the module-level ``_P_TWO_SIDED_EXPR``
    both engines evaluate VERBATIM), and the BH step-up then controls
    the false-discovery rate across all m tests — the multiple-
    comparisons gate a metrics platform needs before paging anyone on
    "day X of metric Y looks anomalous" (one z-screen per day per
    metric is m≈150 shots at α; BH is the standard correction).
    Discoveries = ranks ≤ k* where k* = max{k : p(k) ≤ k·q/m}, ranked
    on ROUNDED p with (type, day) tie-breaks so the ordering is
    engine-exact.

    Scale: two map-side-combinable integer-moment aggregates (day
    grain, then type grain from day partials); the BH window ranks the
    TEST GRID (|types|×|days| rows — bounded by the experiment design,
    never by event volume), so the partitionless window is over ~150
    rows by construction."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        cents(F.col("value")).alias("vc"),
    )
    d = v.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("vc").cast("long").alias("s_d"),
    )
    t = d.groupBy("event_type").agg(
        F.sum("n_d").cast("long").alias("n_t"),
        F.sum("s_d").cast("long").alias("s_t"),
    )
    t2 = v.groupBy("event_type").agg(
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2_t")
    )
    z = (
        d.join(F.broadcast(t), "event_type")
        .join(F.broadcast(t2), "event_type")
        .withColumn("z", F.expr(_Z_DAY_VS_TYPE_EXPR))
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
        .withColumn("p_r", F.round(F.expr(_P_TWO_SIDED_EXPR), 6))
    )
    w = Window.orderBy("p_r", "event_type", "day")
    ranked = z.select(
        "event_type", "day", "n_d", "z", "p_r",
        F.row_number().over(w).alias("bh_rank"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("m"),
    )
    kstar = ranked.withColumn(
        "k_star",
        F.max(
            F.when(
                F.col("p_r") <= F.col("bh_rank") * 0.05 / F.col("m"),
                F.col("bh_rank"),
            ).otherwise(F.lit(0))
        ).over(Window.partitionBy()),
    )
    return kstar.select(
        "event_type",
        "day",
        F.col("n_d").cast("long").alias("n"),
        F.round("z", 6).alias("z_score"),
        F.col("p_r").alias("p_value"),
        F.col("bh_rank").cast("long").alias("bh_rank"),
        F.when(F.col("bh_rank") <= F.col("k_star"), 1)
        .otherwise(0)
        .cast("long")
        .alias("discovery"),
    )



@register(
    "q421_qq_table",
    allow_non_equi=(
        "the 19-row percentile spine crossJoins the 2-row group-count "
        "relation to form 38 target ranks; ranked events are then "
        "reached by a keyed equi-join on (group, rank)"
    ),
    oracle="""
    WITH v AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), ranked AS (
      SELECT grp, vc,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY vc, event_id)
               AS rk
      FROM v
    ), n AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY grp
    ), spine AS (
      SELECT u.i * 5 AS pct FROM UNNEST(generate_series(1, 19)) AS u(i)
    ), targets AS (
      SELECT n.grp, spine.pct,
             (spine.pct * n.n + 99) // 100 AS rk
      FROM n, spine
    ), qv AS (
      SELECT t.pct, t.grp, r.vc
      FROM targets t JOIN ranked r ON r.grp = t.grp AND r.rk = t.rk
    )
    SELECT a.pct AS percentile,
           CAST(a.vc AS BIGINT) AS q_purchase_cents,
           CAST(b.vc AS BIGINT) AS q_other_cents,
           CAST(a.vc - b.vc AS BIGINT) AS qq_gap_cents
    FROM (SELECT pct, vc FROM qv WHERE grp = 1) a
    JOIN (SELECT pct, vc FROM qv WHERE grp = 0) b USING (pct)
    """,
)
def q421_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X351 — EXACT QQ (quantile-quantile) TABLE between the purchase
    and non-purchase value distributions: 19 matched counting
    quantiles (5%..95%) per group and their gaps — the
    distribution-comparison view that says WHERE two samples differ
    (tails vs body), which the scalar verdicts can't (q202/q374 KS
    gives one max-gap statistic, q412's U one rank-sum; a QQ table is
    what you plot before believing either). Quantiles are exact lower
    counting quantiles at integer ceil-rank (p·n+99)//100 over the
    (value, event_id) total order — no percentile_approx, no float
    rank arithmetic — and the target ranks form a 38-row broadcast
    relation so the quantile LOOKUP is a keyed equi-join against the
    ranked stream, not 19 separate scans.

    Scale: one per-group window rank (2-partition hash exchange) and
    a broadcast spine join; the QQ pivot joins two 19-row sides."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        "event_id",
        cents(F.col("value")).alias("vc"),
    )
    ranked = v.select(
        "grp",
        "vc",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("vc", "event_id"))
        .alias("rk"),
    )
    n = v.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = spark.range(1, 20).select((F.col("id") * 5).alias("pct"))
    targets = n.crossJoin(F.broadcast(spine)).select(
        "grp",
        "pct",
        F.expr("(pct * n + 99) DIV 100").alias("rk"),
    )
    qv = ranked.join(F.broadcast(targets), ["grp", "rk"]).select(
        "pct", "grp", "vc"
    )
    a = qv.filter(F.col("grp") == 1).select(
        "pct", F.col("vc").alias("q_purchase_cents")
    )
    b = qv.filter(F.col("grp") == 0).select(
        "pct", F.col("vc").alias("q_other_cents")
    )
    return a.join(b, "pct").select(
        F.col("pct").alias("percentile"),
        F.col("q_purchase_cents").cast("long"),
        F.col("q_other_cents").cast("long"),
        (F.col("q_purchase_cents") - F.col("q_other_cents"))
        .cast("long")
        .alias("qq_gap_cents"),
    )



@register(
    "q426_dispersion_test",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, day
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM dc GROUP BY event_type
    ), stat AS (
      SELECT event_type, g, s, s2,
             CAST(g * s2 - s * s AS DOUBLE) / s AS chi2,
             CAST(g AS DOUBLE) - 1.0 AS df
      FROM m
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM stat
    ), n1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), n2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM n1
    ), wh AS (
      SELECT *,
             (t2 - (1.0 - 2.0 / (9.0 * df)))
             / SQRT(2.0 / (9.0 * df)) AS z
      FROM n2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM wh
    )
    SELECT event_type,
           g AS n_days,
           ROUND(CAST(s AS DOUBLE) / g, 6) AS mean_daily_count,
           ROUND((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / g)
                 / (g - 1), 6) AS var_daily_count,
           ROUND((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / g)
                 / (g - 1) / (CAST(s AS DOUBLE) / g), 6) AS dispersion,
           ROUND(chi2, 6) AS chi2_stat,
           ROUND(z, 6) AS wh_z,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_overdispersed
    FROM p
    """,
)
def q426_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X356 — INDEX-OF-DISPERSION test (Fisher; Cox & Lewis 1966) per
    event type: is the daily event count Poisson (D≈1), or
    overdispersed/bursty (D>1) — the distribution-shape triage a
    capacity planner and an anomaly-threshold tuner both need before
    assuming Poisson tails (q356 measures burstiness per ENTITY; this
    tests the aggregate arrival process, with significance). The
    statistic Σ(x−x̄)²/x̄ = (g·S2 − S²)/S folds from exact int64 daily-
    count moments; significance uses the Wilson–Hilferty cube-root
    normal approximation of the chi-square CDF feeding the SAME
    shared-text normal polynomial as q409/q412. The cube root is the
    engine's POW(x, 1/3) POLISHED by two shared-text Newton steps —
    raw pow differs between libms at the 1e-7 level (measured: a
    6th-decimal z flip), while one Newton step contracts that gap
    quadratically to sub-ulp, so both engines publish identical
    rounded statistics.

    Scale: two map-side-combinable aggregates (day grain, then type
    grain); everything after is a ~5-row projection."""
    ev = load(spark, sf_dir, "events")
    dc = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    m = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    stat = m.select(
        "event_type",
        "g",
        "s",
        "s2",
        F.expr("CAST(g * s2 - s * s AS DOUBLE) / s").alias("chi2"),
        F.expr("CAST(g AS DOUBLE) - 1.0").alias("df"),
    ).withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)")).withColumn(
        "t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0")
    ).withColumn(
        "t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0")
    ).withColumn(
        "z",
        F.expr("(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"),
    )
    p = stat.withColumn("az", F.expr("ABS(z)")).withColumn(
        "tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))")
    )
    return p.select(
        "event_type",
        F.col("g").alias("n_days"),
        F.round(F.col("s").cast("double") / F.col("g"), 6).alias(
            "mean_daily_count"
        ),
        F.round(
            (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("g"))
            / (F.col("g") - 1),
            6,
        ).alias("var_daily_count"),
        F.round(
            (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("g"))
            / (F.col("g") - 1)
            / (F.col("s").cast("double") / F.col("g")),
            6,
        ).alias("dispersion"),
        F.round("chi2", 6).alias("chi2_stat"),
        F.round("z", 6).alias("wh_z"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_overdispersed"),
    )



@register(
    "q431_logrank_test",
    allow_non_equi=(
        "one 1-row moment aggregate crossJoin-attached to compose the "
        "single published test row"
    ),
    oracle=f"""
    WITH sess AS (
      SELECT user_id % 2 AS grp,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 60000000
               AS dur_min,
             MAX(ts) = MAX(MAX(ts)) OVER () AS censored
      FROM (
        SELECT user_id, ts, event_id,
               SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events
        )
      ) GROUP BY user_id, session_id
    ), risk AS (
      SELECT dur_min,
             CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)
                  AS BIGINT) AS d,
             CAST(SUM(CASE WHEN NOT censored AND grp = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(COUNT(*) AS BIGINT) AS ended_here,
             CAST(SUM(grp) AS BIGINT) AS ended_here_1
      FROM sess GROUP BY dur_min
    ), atrisk AS (
      SELECT dur_min, d, d1,
             (SELECT COUNT(*) FROM sess)
               - COALESCE(SUM(ended_here) OVER (ORDER BY dur_min
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
             (SELECT SUM(grp) FROM sess)
               - COALESCE(SUM(ended_here_1) OVER (ORDER BY dur_min
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
      FROM risk
    ), terms AS (
      SELECT d, d1, n, n1,
             d1 * 1000000 AS o_e6,
             (d * n1 * 1000000) // n AS e_e6,
             CASE WHEN n > 1
                  THEN ((((d * (n - d) * 1000000) // (n - 1)) * n1)
                        // n * (n - n1)) // n
                  ELSE 0 END AS v_e6
      FROM atrisk WHERE d > 0
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
             CAST(SUM(o_e6) AS BIGINT) AS o_e6,
             CAST(SUM(e_e6) AS BIGINT) AS e_e6,
             CAST(SUM(v_e6) AS BIGINT) AS v_e6
      FROM terms
    ), stat AS (
      SELECT n_times, o_e6, e_e6, v_e6,
             CAST(o_e6 - e_e6 AS DOUBLE)
               / SQRT(GREATEST(CAST(v_e6 AS DOUBLE), 1.0) * 1000000.0) AS z
      FROM m
    )
    SELECT n_times,
           ROUND(CAST(o_e6 AS DOUBLE) / 1e6, 6) AS observed_grp1,
           ROUND(CAST(e_e6 AS DOUBLE) / 1e6, 6) AS expected_grp1,
           ROUND(z, 6) AS logrank_z,
           ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_value
    FROM (SELECT *, ABS(z) AS az,
                 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
          FROM stat)
    """,
)
def q431_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X361 — LOG-RANK TEST (Mantel 1966) between two session-survival
    curves (even- vs odd-id users, the q210 Kaplan–Meier population
    split in two): at every distinct event time the observed group-1
    deaths compare against the hypergeometric expectation d·n1/n with
    variance d·(n1/n)(n0/n)(n−d)/(n−1), and the summed O−E over
    √ΣV is the z — THE standard two-sample censored-survival test
    (q210 draws the curves; this says whether they differ). All O, E,
    V terms are micro-unit INTEGERS via staged floor division (each
    stage bounded so no int64 overflow at any corpus size), so the
    per-time terms and their sums are engine-exact in any aggregation
    order; censoring matches q210's last-timestamp convention.

    Scale: the sessionize window is per-user (the q11 exchange);
    everything after lives at duration grain with one ordered prefix
    scan, ending in a 1-row test."""
    ev = load(spark, sf_dir, "events")
    wue = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(wue)
        ).alias("gap_us"),
    )
    sids = gaps.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.when(F.col("gap_us") > 1800000000, 1).otherwise(0))
        .over(wue.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    horizon = sids.agg(F.max("ts").alias("h_ts"))
    sess = (
        sids.groupBy("user_id", "session_id")
        .agg(
            F.expr(
                "(MAX(unix_micros(ts)) - MIN(unix_micros(ts))) DIV 60000000"
            ).alias("dur_min"),
            F.max("ts").alias("end_ts"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("user_id") % 2).alias("grp"),
            "dur_min",
            (F.col("end_ts") == F.col("h_ts")).alias("censored"),
        )
    )
    risk = sess.groupBy("dur_min").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when((~F.col("censored")) & (F.col("grp") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.count(F.lit(1)).cast("long").alias("ended_here"),
        F.sum("grp").cast("long").alias("ended_here_1"),
    )
    tots = sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum("grp").cast("long").alias("n1_tot"),
    )
    wprev = Window.orderBy("dur_min").rowsBetween(
        Window.unboundedPreceding, -1
    )
    atrisk = (
        risk.crossJoin(F.broadcast(tots))
        .select(
            "dur_min",
            "d",
            "d1",
            (
                F.col("n_tot")
                - F.coalesce(F.sum("ended_here").over(wprev), F.lit(0))
            ).alias("n"),
            (
                F.col("n1_tot")
                - F.coalesce(F.sum("ended_here_1").over(wprev), F.lit(0))
            ).alias("n1"),
        )
    )
    terms = atrisk.filter(F.col("d") > 0).select(
        (F.col("d1") * 1000000).alias("o_e6"),
        F.expr("(d * n1 * 1000000) DIV n").alias("e_e6"),
        F.expr(
            "CASE WHEN n > 1"
            " THEN ((((d * (n - d) * 1000000) DIV (n - 1)) * n1)"
            " DIV n * (n - n1)) DIV n"
            " ELSE 0 END"
        ).alias("v_e6"),
    )
    m = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("o_e6").cast("long").alias("o_e6"),
        F.sum("e_e6").cast("long").alias("e_e6"),
        F.sum("v_e6").cast("long").alias("v_e6"),
    )
    stat = m.withColumn(
        "z",
        F.expr(
            "CAST(o_e6 - e_e6 AS DOUBLE)"
            " / SQRT(GREATEST(CAST(v_e6 AS DOUBLE), 1.0) * 1000000.0)"
        ),
    ).withColumn("az", F.expr("ABS(z)")).withColumn(
        "tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))")
    )
    return stat.select(
        "n_times",
        F.round(F.col("o_e6").cast("double") / 1e6, 6).alias("observed_grp1"),
        F.round(F.col("e_e6").cast("double") / 1e6, 6).alias("expected_grp1"),
        F.round("z", 6).alias("logrank_z"),
        F.round(F.expr(_P_TWO_SIDED_EXPR), 6).alias("p_value"),
    )



@register(
    "q439_mcnemar_paired",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS before_p,
             MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS after_p
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN before_p = 0 AND after_p = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(SUM(CASE WHEN before_p = 0 AND after_p = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN before_p = 1 AND after_p = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN before_p = 1 AND after_p = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n11
      FROM u
    ), stat AS (
      SELECT *,
             CAST(n10 - n01 AS DOUBLE)
               / SQRT(GREATEST(CAST(n10 + n01 AS DOUBLE), 1.0)) AS z
      FROM cells
    )
    SELECT n_users, n00, n01, n10, n11,
           ROUND(z, 6) AS mcnemar_z,
           ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_value
    FROM (SELECT *, ABS(z) AS az,
                 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
          FROM stat)
    """,
)
def q439_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X369 — McNEMAR PAIRED-PROPORTIONS test (McNemar 1947): did the
    per-user purchase propensity CHANGE between the first and second
    half of the window, using each user as their own control? Only the
    discordant cells matter — z = (n10 − n01)/√(n10+n01) — which is
    why the paired test detects within-user change the two-sample
    machinery (q226/q412) dilutes with between-user variance. The 2×2
    concordance table is exact int64; z and the shared-polynomial p
    are the only floats.

    Scale: one user-grain aggregate (map-side combine), one 1-row
    fold."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("ts") < cutoff) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("before_p"),
        F.max(
            F.when(
                (F.col("ts") >= cutoff) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        ).alias("after_p"),
    )
    cells = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when((F.col("before_p") == 0) & (F.col("after_p") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
        F.sum(F.when((F.col("before_p") == 0) & (F.col("after_p") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("before_p") == 1) & (F.col("after_p") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("before_p") == 1) & (F.col("after_p") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
    )
    stat = cells.withColumn(
        "z",
        F.expr(
            "CAST(n10 - n01 AS DOUBLE)"
            " / SQRT(GREATEST(CAST(n10 + n01 AS DOUBLE), 1.0))"
        ),
    ).withColumn("az", F.expr("ABS(z)")).withColumn(
        "tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))")
    )
    return stat.select(
        "n_users",
        "n00",
        "n01",
        "n10",
        "n11",
        F.round("z", 6).alias("mcnemar_z"),
        F.round(F.expr(_P_TWO_SIDED_EXPR), 6).alias("p_value"),
    )



@register(
    "q442_kendalls_w",
    allow_non_equi=(
        "one 1-row document-count scalar crossJoin-attached onto the "
        "rank table to double-center the rank sums"
    ),
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tok,
             len(list_distinct(list_filter(
                 string_split_regex(lower(trim(text)), '\\s+'),
                 x -> x <> ''))) AS n_dist,
             n_chars
      FROM documents
    ), ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS r1,
             ROW_NUMBER() OVER (ORDER BY n_dist, doc_id) AS r2,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r3
      FROM feats
    ), dev AS (
      SELECT doc_id,
             CAST(2 * (r1 + r2 + r3) AS BIGINT)
               - 3 * ((SELECT COUNT(*) FROM ranked) + 1) AS d2x
      FROM ranked
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d2x * d2x) AS BIGINT) AS s4
      FROM dev
    )
    SELECT n AS n_docs,
           CAST(3 AS BIGINT) AS n_rankers,
           ROUND(3.0 * s4
                 / (9.0 * (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS kendall_w,
           ROUND(3.0 * (n - 1)
                 * (3.0 * s4 / (9.0 * (CAST(n AS DOUBLE) * n * n - n))), 6)
             AS friedman_chi2
    FROM m
    """,
)
def q442_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X372 — KENDALL'S W coefficient of concordance (Kendall & Babington
    Smith 1939) across three deterministic document rankers (token
    count, distinct-token count, character length — three "judges" of
    document size/richness): W = 12·S/(k²(n³−n)) says how much k
    rankers agree OVER ALL n items at once — the multi-ranker
    generalization of the pairwise agreement family (Spearman q287,
    Kendall τ q382, RBO q253, Fleiss' κ q376 for labels), and the gate
    a rank-fusion pipeline (q227 RRF) should check before fusing:
    fusing discordant rankers averages noise. Ranks are total-ordered
    (feature, doc_id) so no ties exist by construction; the rank-sum
    deviations are DOUBLED to stay integer (2ΣR − k(n+1)), making
    S4 = 4S an exact int64 in any aggregation order; Friedman's
    χ² = k(n−1)W is published alongside.

    Scale: three n-row global rank windows at DOCUMENT grain feeding
    one 1-row moment fold — at corpus scale swap the windows for the
    q304 two-phase prefix-scan ranks; the W fold is unchanged."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != ""
    )
    feats = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_dist"),
        "n_chars",
    )
    ranked = feats.select(
        "doc_id",
        F.row_number().over(Window.orderBy("n_tok", "doc_id")).alias("r1"),
        F.row_number().over(Window.orderBy("n_dist", "doc_id")).alias("r2"),
        F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("r3"),
    )
    cnt = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dev = ranked.crossJoin(F.broadcast(cnt)).select(
        (
            2 * (F.col("r1") + F.col("r2") + F.col("r3"))
            - 3 * (F.col("n") + 1)
        )
        .cast("long")
        .alias("d2x")
    )
    m = dev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("d2x") * F.col("d2x")).cast("long").alias("s4"),
    )
    w_expr = F.expr(
        "3.0 * s4 / (9.0 * (CAST(n AS DOUBLE) * n * n - n))"
    )
    return m.select(
        F.col("n").alias("n_docs"),
        F.lit(3).cast("long").alias("n_rankers"),
        F.round(w_expr, 6).alias("kendall_w"),
        F.round(3.0 * (F.col("n") - 1) * w_expr, 6).alias("friedman_chi2"),
    )



@register(
    "q444_mantel_haenszel",
    allow_non_equi=(
        "one 1-row MH-pool aggregate crossJoin-attached onto the "
        "bounded stratum table"
    ),
    oracle="""
    WITH u AS (
      SELECT user_id,
             LEAST(COUNT(*) // 16, 7) AS stratum,
             CAST(CASE WHEN SUM(CASE WHEN event_type = 'signup'
                                     THEN 1 ELSE 0 END)
                      >= SUM(CASE WHEN event_type = 'click'
                                  THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS BIGINT) AS t,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ), s AS (
      SELECT stratum,
             CAST(SUM(t * y) AS BIGINT) AS a,
             CAST(SUM(t * (1 - y)) AS BIGINT) AS b,
             CAST(SUM((1 - t) * y) AS BIGINT) AS c,
             CAST(SUM((1 - t) * (1 - y)) AS BIGINT) AS d
      FROM u GROUP BY stratum
    ), terms AS (
      SELECT stratum, a, b, c, d, a + b + c + d AS n,
             (a * d * 1000000) // (a + b + c + d) AS ad_e6,
             (b * c * 1000000) // (a + b + c + d) AS bc_e6,
             (a * 1000000) // (a + b) - (c * 1000000) // (c + d) AS rd_e6
      FROM s WHERE a + b > 0 AND c + d > 0
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(ad_e6) AS BIGINT) AS sum_ad,
             CAST(SUM(bc_e6) AS BIGINT) AS sum_bc,
             CAST(SUM(n) AS BIGINT) AS n_total
      FROM terms
    )
    SELECT t.stratum,
           t.a AS treated_conv, t.b AS treated_no,
           t.c AS ctrl_conv, t.d AS ctrl_no,
           ROUND(CAST(t.rd_e6 AS DOUBLE) / 1e6, 6) AS risk_diff,
           ROUND(CAST(m.sum_ad AS DOUBLE) / GREATEST(m.sum_bc, 1), 6)
             AS mh_odds_ratio,
           m.n_strata, m.n_total
    FROM terms t, m
    """,
)
def q444_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X374 — MANTEL–HAENSZEL pooled odds ratio (Mantel & Haenszel
    1959) across activity strata (the q419 covariate bins): the classic fixed-
    effects pooling of per-stratum 2×2 tables — OR_MH = Σ(aᵢdᵢ/nᵢ)/
    Σ(bᵢcᵢ/nᵢ) — that keeps Simpson's paradox from flipping the
    treated-vs-control conversion story when strata sizes differ (the
    odds-ratio companion of q419's risk-difference stratification,
    pooling on the ODDS scale the way meta-analyses and epidemiology
    do). Per-stratum cross products quantize to ppm integers by floor
    division before pooling, so both MH sums are exact int64 in any
    aggregation order; degenerate strata (an empty arm) are excluded
    by the same visible rule as q419. Per-stratum risk differences
    publish alongside so effect-measure modification is readable.

    Scale: one user-grain aggregate, a ≤7-row stratum reduce, a 1-row
    pool."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.least(F.expr("COUNT(*) DIV 16"), F.lit(7)).cast("long").alias("stratum"),
        F.when(
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            >= F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("t"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    s = u.groupBy("stratum").agg(
        F.sum(F.col("t") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("t") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("t")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    terms = s.filter(
        ((F.col("a") + F.col("b")) > 0) & ((F.col("c") + F.col("d")) > 0)
    ).select(
        "stratum",
        "a",
        "b",
        "c",
        "d",
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
        F.expr("(a * d * 1000000) DIV (a + b + c + d)").alias("ad_e6"),
        F.expr("(b * c * 1000000) DIV (a + b + c + d)").alias("bc_e6"),
        F.expr(
            "(a * 1000000) DIV (a + b) - (c * 1000000) DIV (c + d)"
        ).alias("rd_e6"),
    )
    m = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("ad_e6").cast("long").alias("sum_ad"),
        F.sum("bc_e6").cast("long").alias("sum_bc"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return terms.crossJoin(F.broadcast(m)).select(
        "stratum",
        F.col("a").alias("treated_conv"),
        F.col("b").alias("treated_no"),
        F.col("c").alias("ctrl_conv"),
        F.col("d").alias("ctrl_no"),
        F.round(F.col("rd_e6").cast("double") / 1e6, 6).alias("risk_diff"),
        F.round(
            F.col("sum_ad").cast("double") / F.greatest(F.col("sum_bc"), F.lit(1)),
            6,
        ).alias("mh_odds_ratio"),
        "n_strata",
        "n_total",
    )



@register(
    "q448_kruskal_wallis",
    allow_non_equi=(
        "two 1-row scalar relations (grand totals, tie sum) crossJoin-"
        "attached onto the k-row per-type rank-sum table"
    ),
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), g1 AS (
      SELECT et, vc, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY et, vc
    ), gv AS (
      SELECT vc, CAST(SUM(t) AS BIGINT) AS tv,
             COALESCE(SUM(SUM(t)) OVER (ORDER BY vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM g1 GROUP BY vc
    ), rj AS (
      SELECT g1.et,
             CAST(SUM(g1.t) AS BIGINT) AS nj,
             CAST(SUM(g1.t * (2 * gv.below + gv.tv + 1)) AS BIGINT) AS r2j
      FROM g1 JOIN gv USING (vc) GROUP BY g1.et
    ), ties AS (
      SELECT CAST(SUM(tv * tv * tv - tv) AS BIGINT) AS tsum FROM gv
    ), tot AS (
      SELECT CAST(SUM(nj) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0,
               list((CAST(r2j AS DOUBLE) / 2.0) * (CAST(r2j AS DOUBLE) / 2.0)
                    / nj ORDER BY et)),
               (acc, x) -> acc + x) AS sum_term
      FROM rj
    ), stat AS (
      SELECT n, k,
             12.0 * sum_term / (CAST(n AS DOUBLE) * (n + 1))
               - 3.0 * (n + 1) AS h,
             CAST(k AS DOUBLE) - 1.0 AS df,
             1.0 - (CAST(tsum AS DOUBLE) / n)
                   / (CAST(n AS DOUBLE) * n - 1.0) AS c
      FROM tot, ties
    ), chi AS (
      SELECT n, k, h, df, c, h / c AS chi2 FROM stat
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM chi
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt FROM wh
    )
    SELECT n AS n_rows, k AS n_groups,
           ROUND(h, 6) AS h_stat,
           ROUND(h / c, 6) AS h_corrected,
           df,
           ROUND(z, 6) AS wh_z,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_value
    FROM p
    """,
)
def q448_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X378 — KRUSKAL–WALLIS H (tie-corrected, Wilson–Hilferty p): the
    k-group generalization of q412's Mann–Whitney — "do the k event
    types draw value from the same distribution?" asked rank-wise, the
    right omnibus test when heavy tails make ANOVA's means the wrong
    summary. Rank machinery is q412's doubled-integer form lifted to a
    GLOBAL ranking: tied ranks collapse to (value, type) grain, the
    per-type doubled rank sum 2·R_j = Σ t_j·(2·below+t+1) stays exact
    int64, and the tie sum Σ(t³−t) is an integer aggregate. The one
    float reduction Σ R_j²/n_j folds over a SORTED k-element array
    (list_reduce / F.aggregate — the q158 fold discipline), so both
    engines add the same doubles in the same order. The chi-square
    upper tail uses the q426 Wilson–Hilferty chain (POW seed + two
    Newton cube-root rounds, identical text) at df = k−1.

    Scale: one aggregate to (value, type) grain, one prefix sum at
    value-group grain (single ordered exchange over GROUP-grain rows,
    not raw rows), a k-row reduce; map-side combine everywhere."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
    )
    g1 = v.groupBy("et", "vc").agg(F.count(F.lit(1)).cast("long").alias("t"))
    gv = g1.groupBy("vc").agg(F.sum("t").cast("long").alias("tv"))
    wv = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, -1)
    gv = gv.select(
        "vc", "tv", F.coalesce(F.sum("tv").over(wv), F.lit(0)).alias("below")
    )
    rj = (
        g1.join(gv, "vc")
        .groupBy("et")
        .agg(
            F.sum("t").cast("long").alias("nj"),
            F.sum(F.col("t") * (2 * F.col("below") + F.col("tv") + 1))
            .cast("long")
            .alias("r2j"),
        )
    )
    ties = gv.agg(
        F.sum(F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv"))
        .cast("long")
        .alias("tsum")
    )
    term = (
        (F.col("r2j").cast("double") / 2.0)
        * (F.col("r2j").cast("double") / 2.0)
        / F.col("nj")
    )
    tot = rj.agg(
        F.sum("nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", term.alias("term")))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("sum_term"),
    )
    stat = tot.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        (
            12.0 * F.col("sum_term")
            / (F.col("n").cast("double") * (F.col("n") + 1))
            - 3.0 * (F.col("n") + 1)
        ).alias("h"),
        (F.col("k").cast("double") - 1.0).alias("df"),
        (
            1.0
            - (F.col("tsum").cast("double") / F.col("n"))
            / (F.col("n").cast("double") * F.col("n") - 1.0)
        ).alias("c"),
    )
    chi = stat.withColumn("chi2", F.col("h") / F.col("c"))
    wh = (
        chi.withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)"))
        .withColumn("t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0"))
        .withColumn("t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0"))
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round("h", 6).alias("h_stat"),
        F.round(F.col("h") / F.col("c"), 6).alias("h_corrected"),
        "df",
        F.round("z", 6).alias("wh_z"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_value"),
    )


@register(
    "q449_cochrans_q",
    allow_non_equi=(
        "one 1-row column-totals scalar crossJoin-attached onto the "
        "1-row row-totals scalar to assemble the closed-form Q ratio"
    ),
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk,
             event_type AS et
      FROM events
      WHERE event_type IN ('click', 'purchase', 'error')
    ), rowt AS (
      SELECT user_id, wk, CAST(COUNT(*) AS BIGINT) AS r
      FROM wk GROUP BY user_id, wk
    ), rsum AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             CAST(SUM(r) AS BIGINT) AS s,
             CAST(SUM(r * r) AS BIGINT) AS r2
      FROM rowt
    ), colt AS (
      SELECT CAST(SUM(CASE WHEN et = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2,
             CAST(SUM(CASE WHEN et = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS c3
      FROM wk
    ), q AS (
      SELECT n_subjects, s,
             2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - s * s)
               / (3 * s - r2) AS q_stat
      FROM rsum, colt
    )
    SELECT n_subjects,
           CAST(s AS BIGINT) AS s_total,
           ROUND(q_stat, 6) AS q_stat,
           CAST(2 AS BIGINT) AS df,
           ROUND(EXP(-q_stat / 2.0), 6) AS p_value
    FROM q
    """,
)
def q449_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X379 — COCHRAN'S Q (the k-treatment McNemar, q439's
    generalization): across (user, week) subjects, do the three binary
    behaviors click / purchase / error occur at the same rate, paired
    WITHIN subject so between-user activity differences cancel — the
    matched-design omnibus a product team needs before reading three
    marginal rates against each other. Entirely exact integer
    arithmetic: Q = (k−1)·(k·ΣC_j² − S²)/(k·S − ΣR_u²) is a ratio of
    integer aggregates (k = 3 fixed, C_j column totals as three
    conditional sums — order-free), and the df = 2 chi-square upper
    tail has the CLOSED FORM p = exp(−Q/2), so no polynomial
    approximation is even needed.

    Scale: one distinct-ify to (user, week, type) grain, one subject-
    grain rollup, two scalar reduces; nothing wider than a subject row
    shuffles."""
    ev = load(spark, sf_dir, "events")
    k = 3
    wk = (
        ev.filter(F.col("event_type").isin("click", "purchase", "error"))
        .select(
            "user_id",
            F.expr("unix_micros(ts) DIV 604800000000").alias("wk"),
            F.col("event_type").alias("et"),
        )
        .distinct()
    )
    rowt = wk.groupBy("user_id", "wk").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    rsum = rowt.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("r").cast("long").alias("s"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("r2"),
    )
    colt = wk.agg(
        *[
            F.sum(F.when(F.col("et") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i + 1}")
            for i, t in enumerate(["click", "purchase", "error"])
        ]
    )
    q = rsum.crossJoin(F.broadcast(colt)).select(
        "n_subjects",
        "s",
        (
            (k - 1)
            * (
                k
                * (
                    F.col("c1") * F.col("c1")
                    + F.col("c2") * F.col("c2")
                    + F.col("c3") * F.col("c3")
                )
                - F.col("s") * F.col("s")
            ).cast("double")
            / (k * F.col("s") - F.col("r2"))
        ).alias("q_stat"),
    )
    return q.select(
        "n_subjects",
        F.col("s").alias("s_total"),
        F.round("q_stat", 6).alias("q_stat"),
        F.lit(2).cast("long").alias("df"),
        F.round(F.exp(-F.col("q_stat") / 2.0), 6).alias("p_value"),
    )


@register(
    "q450_dunn_posthoc",
    allow_non_equi=(
        "the k-row per-type rank table self-joins on et_a < et_b "
        "(k*(k-1)/2 = 10 pairs, group-cardinality) and two 1-row "
        "scalars (N, tie sum) broadcast-attach onto it"
    ),
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), g1 AS (
      SELECT et, vc, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY et, vc
    ), gv AS (
      SELECT vc, CAST(SUM(t) AS BIGINT) AS tv,
             COALESCE(SUM(SUM(t)) OVER (ORDER BY vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM g1 GROUP BY vc
    ), rj AS (
      SELECT g1.et,
             CAST(SUM(g1.t) AS BIGINT) AS nj,
             CAST(SUM(g1.t * (2 * gv.below + gv.tv + 1)) AS BIGINT) AS r2j
      FROM g1 JOIN gv USING (vc) GROUP BY g1.et
    ), ties AS (
      SELECT CAST(SUM(tv * tv * tv - tv) AS BIGINT) AS tsum FROM gv
    ), tot AS (SELECT CAST(SUM(nj) AS BIGINT) AS n FROM rj),
    pairs AS (
      SELECT a.et AS et_a, b.et AS et_b,
             a.nj AS na, b.nj AS nb,
             CAST(a.r2j AS DOUBLE) / (2.0 * a.nj)
               - CAST(b.r2j AS DOUBLE) / (2.0 * b.nj) AS rdiff,
             (CAST(n AS DOUBLE) * (n + 1) / 12.0
              - CAST(tsum AS DOUBLE) / (12.0 * (n - 1)))
             * (1.0 / a.nj + 1.0 / b.nj) AS varr
      FROM rj a JOIN rj b ON a.et < b.et, tot, ties
    ), z AS (
      SELECT et_a, et_b, na, nb,
             rdiff / SQRT(varr) AS z
      FROM pairs
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt FROM z
    )
    SELECT et_a, et_b, na AS n_a, nb AS n_b,
           ROUND(z, 6) AS z_score,
           ROUND(LEAST(1.0, 10.0 * ({_P_TWO_SIDED_EXPR})), 6)
             AS p_bonferroni
    FROM p
    """,
)
def q450_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X380 — DUNN'S POST-HOC pairwise test (Dunn 1964), the follow-up
    q448's omnibus demands: WHICH event-type pairs differ in value
    rank? Each pair's z uses the pooled rank variance N(N+1)/12 minus
    the shared tie correction Σ(t³−t)/(12(N−1)) — the mean ranks and
    tie sum come from the SAME doubled-integer machinery as q448 (one
    global tie-group pass feeds both the omnibus and all 10 pairwise
    tests), and p-values are Bonferroni-adjusted by the k(k−1)/2 = 10
    comparisons (capped at 1). Running Dunn without the tie term or
    with per-pair re-ranking are the two classic implementation bugs;
    both are structurally impossible here because there is exactly one
    ranking.

    Scale: identical to q448 plus a k×k self-join at GROUP grain."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
    )
    g1 = v.groupBy("et", "vc").agg(F.count(F.lit(1)).cast("long").alias("t"))
    gv = g1.groupBy("vc").agg(F.sum("t").cast("long").alias("tv"))
    wv = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, -1)
    gv = gv.select(
        "vc", "tv", F.coalesce(F.sum("tv").over(wv), F.lit(0)).alias("below")
    )
    rj = (
        g1.join(gv, "vc")
        .groupBy("et")
        .agg(
            F.sum("t").cast("long").alias("nj"),
            F.sum(F.col("t") * (2 * F.col("below") + F.col("tv") + 1))
            .cast("long")
            .alias("r2j"),
        )
    )
    ties = gv.agg(
        F.sum(F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv"))
        .cast("long")
        .alias("tsum")
    )
    tot = rj.agg(F.sum("nj").cast("long").alias("n"))
    a = rj.select(
        F.col("et").alias("et_a"), F.col("nj").alias("na"), F.col("r2j").alias("r2a")
    )
    b = rj.select(
        F.col("et").alias("et_b"), F.col("nj").alias("nb"), F.col("r2j").alias("r2b")
    )
    pairs = (
        a.join(b, F.col("et_a") < F.col("et_b"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "et_a",
            "et_b",
            "na",
            "nb",
            (
                F.col("r2a").cast("double") / (2.0 * F.col("na"))
                - F.col("r2b").cast("double") / (2.0 * F.col("nb"))
            ).alias("rdiff"),
            (
                (
                    F.col("n").cast("double") * (F.col("n") + 1) / 12.0
                    - F.col("tsum").cast("double") / (12.0 * (F.col("n") - 1))
                )
                * (1.0 / F.col("na") + 1.0 / F.col("nb"))
            ).alias("varr"),
        )
    )
    z = pairs.withColumn("z", F.col("rdiff") / F.sqrt(F.col("varr")))
    p = z.withColumn("az", F.expr("ABS(z)")).withColumn(
        "tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))")
    )
    return p.select(
        "et_a",
        "et_b",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("z", 6).alias("z_score"),
        F.round(
            F.least(F.lit(1.0), 10.0 * F.expr(_P_TWO_SIDED_EXPR)), 6
        ).alias("p_bonferroni"),
    )


@register(
    "q451_cliffs_delta",
    oracle="""
    WITH v AS (
      SELECT dayofweek(CAST(ts AS DATE)) AS wd,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), grp AS (
      SELECT wd, vc,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(g1) AS BIGINT) AS t1
      FROM v GROUP BY wd, vc
    ), rk AS (
      SELECT wd, vc, t, t1,
             COALESCE(SUM(t) OVER (PARTITION BY wd ORDER BY vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM grp
    ), agg AS (
      SELECT wd,
             CAST(SUM(t1) AS BIGINT) AS n1,
             CAST(SUM(t - t1) AS BIGINT) AS n2,
             CAST(SUM(t1 * (2 * (below + 1) + t - 1)) AS BIGINT) AS r1x2
      FROM rk GROUP BY wd
    ), d AS (
      SELECT wd, n1, n2,
             r1x2 - n1 * (n1 + 1) - n1 * n2 AS signed2
      FROM agg
    )
    SELECT wd AS weekday, n1, n2,
           ROUND(CAST(signed2 AS DOUBLE) / (n1 * n2), 6) AS cliffs_delta,
           CASE WHEN ABS(CAST(signed2 AS DOUBLE) / (n1 * n2)) < 0.147
                  THEN 'negligible'
                WHEN ABS(CAST(signed2 AS DOUBLE) / (n1 * n2)) < 0.33
                  THEN 'small'
                WHEN ABS(CAST(signed2 AS DOUBLE) / (n1 * n2)) < 0.474
                  THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM d
    """,
)
def q451_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X381 — CLIFF'S DELTA ordinal effect size (Cliff 1993), the
    magnitude companion to q412's Mann–Whitney significance (the same
    pairing q443 gives q143 and q438 gives q315): δ = P(X>Y) − P(X<Y)
    for purchase-vs-other values per weekday, read off the SAME
    doubled-integer rank machinery — δ·n1·n2 = 2·U1 − n1·n2 =
    (2·R1 − n1(n1+1)) − n1·n2 is exact int64 (ties cancel in the
    subtraction), so the only float is the final normalization.
    Magnitude bands are Romano et al. (2006) thresholds as an
    identical-text CASE. A metrics reviewer needs δ because with 10⁵
    rows per arm U rejects at practically-zero effects; δ is
    sample-size-free.

    Scale: q412's exact shape — one (weekday, value)-grain aggregate,
    one group-grain prefix sum, a 7-row reduce."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        (F.dayofweek(F.to_date("ts")) - 1).cast("long").alias("wd"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        cents(F.col("value")).alias("vc"),
    )
    grp = v.groupBy("wd", "vc").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("g1").cast("long").alias("t1"),
    )
    wwd = (
        Window.partitionBy("wd")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = grp.select(
        "wd",
        "vc",
        "t",
        "t1",
        F.coalesce(F.sum("t").over(wwd), F.lit(0)).alias("below"),
    )
    agg = rk.groupBy("wd").agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * (2 * (F.col("below") + 1) + F.col("t") - 1))
        .cast("long")
        .alias("r1x2"),
    )
    d = agg.select(
        "wd",
        "n1",
        "n2",
        (
            F.col("r1x2")
            - F.col("n1") * (F.col("n1") + 1)
            - F.col("n1") * F.col("n2")
        ).alias("signed2"),
    )
    delta = F.col("signed2").cast("double") / (F.col("n1") * F.col("n2"))
    return d.select(
        F.col("wd").alias("weekday"),
        "n1",
        "n2",
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@register(
    "q453_brown_forsythe",
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), g1 AS (
      SELECT et, vc, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY et, vc
    ), nj AS (
      SELECT et, CAST(SUM(t) AS BIGINT) AS n FROM g1 GROUP BY et
    ), rk AS (
      SELECT g1.et, g1.vc, g1.t, nj.n,
             COALESCE(SUM(g1.t) OVER (PARTITION BY g1.et ORDER BY g1.vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM g1 JOIN nj USING (et)
    ), med AS (
      SELECT et, vc AS m
      FROM rk
      WHERE below < (n + 1) // 2 AND below + t >= (n + 1) // 2
    ), z AS (
      SELECT g1.et, ABS(g1.vc - med.m) AS zv, g1.t
      FROM g1 JOIN med USING (et)
    ), per AS (
      SELECT et,
             CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * zv) AS BIGINT) AS sz,
             CAST(SUM(t * zv * zv) AS BIGINT) AS sz2
      FROM z GROUP BY et
    ), folds AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(sz) AS BIGINT) AS s,
             list_reduce(list_prepend(0.0,
               list(CAST(sz AS DOUBLE) * sz / n ORDER BY et)),
               (acc, x) -> acc + x) AS sum_b,
             list_reduce(list_prepend(0.0,
               list(CAST(sz2 AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n
                    ORDER BY et)),
               (acc, x) -> acc + x) AS sum_w
      FROM per
    ), f AS (
      SELECT nn, k,
             ((sum_b - CAST(s AS DOUBLE) * s / nn) / (k - 1))
             / (sum_w / (nn - k)) AS f_stat,
             CAST(k AS DOUBLE) - 1.0 AS df
      FROM folds
    ), chi AS (
      SELECT nn, k, f_stat, df, (k - 1) * f_stat AS chi2 FROM f
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM chi
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt FROM wh
    )
    SELECT nn AS n_rows, k AS n_groups,
           ROUND(f_stat, 6) AS f_stat,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(nn - k AS BIGINT) AS df2,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_approx
    FROM p
    """,
)
def q453_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X383 — BROWN–FORSYTHE variance-homogeneity test (Levene's test
    with the MEDIAN center — the robust form): do the k event types
    have equal value SPREAD? This is the assumption check the
    equal-variance tests (q315 CUPED, q438 pooled effect sizes) lean
    on, and heteroscedasticity is itself the finding when a segment's
    values fan out. Per-group medians are exact counting quantiles at
    (type, value)-group grain (lower median, below < target ≤ below+t);
    absolute deviations stay integers, so the per-group moments (Σz,
    Σz²) are exact int64, and both F-ratio sums fold over SORTED
    k-element arrays (the q448 discipline — between-group Σ S_j²/n_j
    squares would pass 2^63). The upper tail is the large-N chi-square
    approximation (k−1)·F ~ χ²_{k−1} through the q426 Wilson–Hilferty
    chain; exact F-distribution tails need the incomplete beta, which
    neither engine exposes portably — df1/df2 are published so a
    caller can do the exact lookup.

    Scale: two (type, value)-grain aggregates, a per-type prefix sum
    at group grain, a k-row reduce; map-side combine everywhere."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
    )
    g1 = v.groupBy("et", "vc").agg(F.count(F.lit(1)).cast("long").alias("t"))
    nj = g1.groupBy("et").agg(F.sum("t").cast("long").alias("n"))
    wet = (
        Window.partitionBy("et")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = g1.join(F.broadcast(nj), "et").select(
        "et",
        "vc",
        "t",
        "n",
        F.coalesce(F.sum("t").over(wet), F.lit(0)).alias("below"),
    )
    med = rk.filter(
        (F.col("below") < F.expr("(n + 1) DIV 2"))
        & (F.col("below") + F.col("t") >= F.expr("(n + 1) DIV 2"))
    ).select("et", F.col("vc").alias("m"))
    z = g1.join(F.broadcast(med), "et").select(
        "et", F.abs(F.col("vc") - F.col("m")).alias("zv"), "t"
    )
    per = z.groupBy("et").agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("zv")).cast("long").alias("sz"),
        F.sum(F.col("t") * F.col("zv") * F.col("zv")).cast("long").alias("sz2"),
    )
    term_b = F.col("sz").cast("double") * F.col("sz") / F.col("n")
    term_w = (
        F.col("sz2").cast("double")
        - F.col("sz").cast("double") * F.col("sz") / F.col("n")
    )
    folds = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sz").cast("long").alias("s"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", term_b.alias("tb")))),
            F.lit(0.0),
            lambda acc, r: acc + r["tb"],
        ).alias("sum_b"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", term_w.alias("tw")))),
            F.lit(0.0),
            lambda acc, r: acc + r["tw"],
        ).alias("sum_w"),
    )
    f = folds.select(
        "nn",
        "k",
        (
            (
                (
                    F.col("sum_b")
                    - F.col("s").cast("double") * F.col("s") / F.col("nn")
                )
                / (F.col("k") - 1)
            )
            / (F.col("sum_w") / (F.col("nn") - F.col("k")))
        ).alias("f_stat"),
        (F.col("k").cast("double") - 1.0).alias("df"),
    )
    wh = (
        f.withColumn("chi2", (F.col("k") - 1) * F.col("f_stat"))
        .withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)"))
        .withColumn("t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0"))
        .withColumn("t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0"))
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.select(
        F.col("nn").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round("f_stat", 6).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("nn") - F.col("k")).cast("long").alias("df2"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q464_runs_test",
    oracle=f"""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), mv AS (
      SELECT day, yc, LAG(yc) OVER (ORDER BY day) AS prev FROM d0
    ), signs AS (
      SELECT day, CASE WHEN yc > prev THEN 1 ELSE 0 END AS s
      FROM mv WHERE prev IS NOT NULL AND yc <> prev
    ), runs AS (
      SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                       OR LAG(s) OVER (ORDER BY day) <> s
                     THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), agg AS (
      SELECT CAST(SUM(new_run) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n_up,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_down
      FROM runs
    ), z AS (
      SELECT r, n_up, n_down,
             1.0 + 2.0 * n_up * n_down / (n_up + n_down) AS mu,
             (2.0 * n_up * n_down
              * (2.0 * n_up * n_down - n_up - n_down))
             / ((n_up + n_down) * (n_up + n_down)
                * (n_up + n_down - 1.0)) AS var
      FROM agg
    ), p AS (
      SELECT r, n_up, n_down, mu,
             (r - mu) / SQRT(GREATEST(var, 1e-12)) AS z
      FROM z
    )
    SELECT r AS n_runs, n_up, n_down,
           ROUND(mu, 6) AS expected_runs,
           ROUND(z, 6) AS z_score,
           ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_value
    FROM (SELECT *, ABS(z) AS az,
                 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt FROM p)
    """,
)
def q464_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X394 — WALD–WOLFOWITZ RUNS TEST on daily revenue direction: are
    up/down moves random, or do they streak (momentum) / alternate
    (mean-reversion)? The distribution-free companion to q462's Hurst
    exponent — Hurst measures the MAGNITUDE memory, runs the SIGN
    memory. Runs, up-count and down-count are exact integers from one
    day-ordered lag (ties yc = prev are dropped, the standard
    treatment); μ and σ² have the classic closed forms, z and the
    two-sided p use the shared normal polynomial. At day grain the
    whole test is a ~60-row relation after one events rollup.

    Scale: one day rollup + two ordered lags at day grain."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    w = Window.orderBy("day")
    mv = d0.select("day", "yc", F.lag("yc").over(w).alias("prev"))
    signs = mv.filter(
        F.col("prev").isNotNull() & (F.col("yc") != F.col("prev"))
    ).select("day", F.when(F.col("yc") > F.col("prev"), 1).otherwise(0).alias("s"))
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(Window.orderBy("day")).isNull()
            | (F.lag("s").over(Window.orderBy("day")) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n_down"),
    )
    z = agg.select(
        "r",
        "n_up",
        "n_down",
        (
            1.0
            + 2.0 * F.col("n_up") * F.col("n_down")
            / (F.col("n_up") + F.col("n_down"))
        ).alias("mu"),
        (
            (
                2.0 * F.col("n_up") * F.col("n_down")
                * (
                    2.0 * F.col("n_up") * F.col("n_down")
                    - F.col("n_up")
                    - F.col("n_down")
                )
            )
            / (
                (F.col("n_up") + F.col("n_down"))
                * (F.col("n_up") + F.col("n_down"))
                * (F.col("n_up") + F.col("n_down") - 1.0)
            )
        ).alias("var"),
    )
    p = z.withColumn(
        "z", (F.col("r") - F.col("mu")) / F.sqrt(F.greatest(F.col("var"), F.lit(1e-12)))
    ).withColumn("az", F.expr("ABS(z)")).withColumn(
        "tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))")
    )
    return p.select(
        F.col("r").alias("n_runs"),
        "n_up",
        "n_down",
        F.round("mu", 6).alias("expected_runs"),
        F.round("z", 6).alias("z_score"),
        F.round(F.expr(_P_TWO_SIDED_EXPR), 6).alias("p_value"),
    )


@register(
    "q465_jarque_bera",
    allow_non_equi=(
        "one 1-row integer-moment scalar crossJoin-attached onto the "
        "day relation to standardize before the ordered folds"
    ),
    oracle="""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yc) AS BIGINT) AS s,
             CAST(SUM(yc * yc) AS BIGINT) AS s2
      FROM d0
    ), z AS (
      SELECT d0.day,
             (CAST(d0.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
             / SQRT(GREATEST((CAST(m.s2 AS DOUBLE)
                    - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n, 1e-12)) AS z
      FROM d0, m
    ), folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list_prepend(0.0, list(z * z * z ORDER BY day)),
               (acc, x) -> acc + x) AS s3,
             list_reduce(list_prepend(0.0, list(z * z * z * z ORDER BY day)),
               (acc, x) -> acc + x) AS s4
      FROM z
    ), jb AS (
      SELECT n, s3 / n AS skew, s4 / n - 3.0 AS exkurt,
             (n / 6.0) * ((s3 / n) * (s3 / n)
                          + (s4 / n - 3.0) * (s4 / n - 3.0) / 4.0) AS jb
      FROM folds
    )
    SELECT n AS n_days,
           ROUND(skew, 6) AS skewness,
           ROUND(exkurt, 6) AS excess_kurtosis,
           ROUND(jb, 6) AS jb_stat,
           ROUND(EXP(-jb / 2.0), 6) AS p_value
    FROM jb
    """,
)
def q465_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X395 — JARQUE–BERA normality test of daily revenue: skewness and
    excess kurtosis folded into one statistic, JB = n/6·(S² + K²/4),
    with the EXACT df = 2 chi-square tail p = exp(−JB/2) (the q449
    closed form). The gate before any test that assumes Gaussian daily
    totals (q315's CUPED variance math, q438's pooled d) — heavy-tailed
    revenue fails here first. Standardization uses exact integer
    (n, Σy, Σy²); the 3rd/4th-power sums are per-row doubles folded in
    DAY order (int64 can't hold Σy⁴ at cents scale, so the fold
    discipline — q448/q462 — carries the higher moments instead).

    Scale: one day rollup; everything else is a ~60-row relation."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    m = d0.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("s2"),
    )
    z = d0.crossJoin(F.broadcast(m)).select(
        "day",
        (
            (F.col("yc").cast("double") - F.col("s").cast("double") / F.col("n"))
            / F.sqrt(
                F.greatest(
                    (
                        F.col("s2").cast("double")
                        - F.col("s").cast("double") * F.col("s") / F.col("n")
                    )
                    / F.col("n"),
                    F.lit(1e-12),
                )
            )
        ).alias("z"),
    )
    folds = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("day", (F.col("z") ** 3).alias("z3"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["z3"],
        ).alias("s3"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("day", (F.col("z") ** 4).alias("z4"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["z4"],
        ).alias("s4"),
    )
    jb = folds.select(
        "n",
        (F.col("s3") / F.col("n")).alias("skew"),
        (F.col("s4") / F.col("n") - 3.0).alias("exkurt"),
        (
            (F.col("n") / 6.0)
            * (
                (F.col("s3") / F.col("n")) * (F.col("s3") / F.col("n"))
                + (F.col("s4") / F.col("n") - 3.0)
                * (F.col("s4") / F.col("n") - 3.0)
                / 4.0
            )
        ).alias("jb"),
    )
    return jb.select(
        F.col("n").alias("n_days"),
        F.round("skew", 6).alias("skewness"),
        F.round("exkurt", 6).alias("excess_kurtosis"),
        F.round("jb", 6).alias("jb_stat"),
        F.round(F.exp(-F.col("jb") / 2.0), 6).alias("p_value"),
    )


@register(
    "q466_durbin_watson",
    allow_non_equi=(
        "one 1-row OLS-moment scalar crossJoin-attached onto the day "
        "relation to compute residuals before the ordered folds"
    ),
    oracle="""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), days AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS x, yc
      FROM d0
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * yc) AS BIGINT) AS sxy
      FROM days
    ), fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
             CAST(sy AS DOUBLE) / n AS ybar,
             CAST(sx AS DOUBLE) / n AS xbar
      FROM m
    ), e AS (
      SELECT days.x,
             CAST(days.yc AS DOUBLE)
               - (fit.ybar + fit.beta * (days.x - fit.xbar)) AS e
      FROM days, fit
    ), lagd AS (
      SELECT x, e, LAG(e) OVER (ORDER BY x) AS ep FROM e
    ), folds AS (
      SELECT (SELECT list_reduce(list_prepend(0.0,
                list(e * e ORDER BY x)), (acc, v) -> acc + v) FROM e) AS see,
             (SELECT list_reduce(list_prepend(0.0,
                list((e - ep) * (e - ep) ORDER BY x)), (acc, v) -> acc + v)
              FROM lagd WHERE ep IS NOT NULL) AS sdd,
             (SELECT n FROM fit) AS n
    )
    SELECT n AS n_days,
           ROUND(sdd / GREATEST(see, 1e-12), 6) AS dw_stat,
           ROUND(1.0 - (sdd / GREATEST(see, 1e-12)) / 2.0, 6) AS rho1_approx
    FROM folds
    """,
)
def q466_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X396 — DURBIN–WATSON autocorrelation test on the residuals of
    the daily-revenue trend fit: DW = Σ(e_t − e_{t−1})²/Σe_t², with
    DW ≈ 2(1−ρ₁) published as rho1_approx. THE diagnostic q234's
    per-group OLS forecast needs before its confidence claims: DW ≪ 2
    (positive residual autocorrelation) means the trend's standard
    errors are optimistic and a lagged term belongs in the model —
    complementing q462 (long memory) and q464 (sign memory) with the
    residual-level check. The fit comes from exact integer moments;
    residuals are row-local doubles; both quadratic forms fold in day
    order (the q448 discipline).

    Scale: one day rollup; day-grain windows and folds after."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    days = d0.select(
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("x"),
        "yc",
    )
    m = days.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("yc")).cast("long").alias("sxy"),
    )
    fit = m.select(
        "n",
        (
            (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("beta"),
        (F.col("sy").cast("double") / F.col("n")).alias("ybar"),
        (F.col("sx").cast("double") / F.col("n")).alias("xbar"),
    )
    e = days.crossJoin(F.broadcast(fit)).select(
        "x",
        "n",
        (
            F.col("yc").cast("double")
            - (F.col("ybar") + F.col("beta") * (F.col("x") - F.col("xbar")))
        ).alias("e"),
    )
    lagd = e.select(
        "x", "e", F.lag("e").over(Window.orderBy("x")).alias("ep")
    )
    see = e.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("x", (F.col("e") * F.col("e")).alias("v")))),
            F.lit(0.0),
            lambda acc, r: acc + r["v"],
        ).alias("see"),
        F.max("n").alias("n"),
    )
    sdd = lagd.filter(F.col("ep").isNotNull()).agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "x",
                        ((F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))).alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["v"],
        ).alias("sdd")
    )
    dw = F.col("sdd") / F.greatest(F.col("see"), F.lit(1e-12))
    return see.crossJoin(F.broadcast(sdd)).select(
        F.col("n").alias("n_days"),
        F.round(dw, 6).alias("dw_stat"),
        F.round(1.0 - dw / 2.0, 6).alias("rho1_approx"),
    )


@register(
    "q470_by_fdr_screen",
    allow_non_equi=(
        "the 1-row harmonic-constant aggregate and the 1-row k* "
        "aggregates crossJoin back onto the bounded test grid "
        "(~|types|x|days| rows, never raw events)"
    ),
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), d AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(vc) AS BIGINT) AS s_d
      FROM v GROUP BY event_type, day
    ), t AS (
      SELECT event_type,
             CAST(SUM(n_d) AS BIGINT) AS n_t,
             CAST(SUM(s_d) AS BIGINT) AS s_t
      FROM d GROUP BY event_type
    ), t2 AS (
      SELECT event_type, CAST(SUM(vc * vc) AS BIGINT) AS s2_t
      FROM v GROUP BY event_type
    ), z AS (
      SELECT d.event_type, d.day, d.n_d,
             {_Z_DAY_VS_TYPE_EXPR.replace("s_d", "d.s_d")
                                 .replace("n_d", "d.n_d")} AS z
      FROM d JOIN t USING (event_type) JOIN t2 USING (event_type)
    ), p AS (
      SELECT event_type, day, n_d, z, az, tt,
             ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_r
      FROM (SELECT *, ABS(z) AS az,
                   1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
            FROM z)
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY p_r, event_type, day) AS bh_rank,
             COUNT(*) OVER () AS m
      FROM p
    ), harm AS (
      SELECT list_reduce(list_prepend(0.0,
               list(1.0 / bh_rank ORDER BY bh_rank)),
               (acc, x) -> acc + x) AS c_m
      FROM ranked
    ), kstar AS (
      SELECT r.*,
             MAX(CASE WHEN r.p_r <= r.bh_rank * 0.05 / (r.m * h.c_m)
                      THEN r.bh_rank ELSE 0 END) OVER () AS k_star_by,
             MAX(CASE WHEN r.p_r <= r.bh_rank * 0.05 / r.m
                      THEN r.bh_rank ELSE 0 END) OVER () AS k_star_bh,
             h.c_m AS c_m
      FROM ranked r, harm h
    )
    SELECT event_type, day,
           ROUND(z, 6) AS z_score,
           p_r AS p_value,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           ROUND(c_m, 6) AS harmonic_m,
           CAST(CASE WHEN bh_rank <= k_star_bh THEN 1 ELSE 0 END AS BIGINT)
             AS discovery_bh,
           CAST(CASE WHEN bh_rank <= k_star_by THEN 1 ELSE 0 END AS BIGINT)
             AS discovery_by
    FROM kstar
    """,
)
def q470_by_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X400 — BENJAMINI–YEKUTIELI FDR screen (Benjamini & Yekutieli
    2001): q409's BH step-up assumes independent-or-PRDS p-values, but
    the per-(type, day) anomaly grid is NOT independent — one bursty
    day moves every type's moments — and BY is the dependence-robust
    form: the threshold shrinks by the harmonic constant c(m) = Σ 1/i.
    Both discovery columns are published side by side, so the reader
    sees exactly which alerts only survive the optimistic assumption.
    The harmonic constant folds in rank order (the q448 discipline);
    everything upstream is q409's machinery verbatim — same z grid,
    same shared-text normal polynomial.

    Scale: identical to q409 — the grid is |types|×|days|, never raw
    events; one extra rank-ordered fold."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        cents(F.col("value")).alias("vc"),
    )
    d = v.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("vc").cast("long").alias("s_d"),
    )
    t = d.groupBy("event_type").agg(
        F.sum("n_d").cast("long").alias("n_t"),
        F.sum("s_d").cast("long").alias("s_t"),
    )
    t2 = v.groupBy("event_type").agg(
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2_t")
    )
    z = (
        d.join(F.broadcast(t), "event_type")
        .join(F.broadcast(t2), "event_type")
        .withColumn("z", F.expr(_Z_DAY_VS_TYPE_EXPR))
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
        .withColumn("p_r", F.round(F.expr(_P_TWO_SIDED_EXPR), 6))
    )
    w = Window.orderBy("p_r", "event_type", "day")
    ranked = z.select(
        "event_type",
        "day",
        "z",
        "p_r",
        F.row_number().over(w).alias("bh_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    harm = ranked.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("bh_rank", (1.0 / F.col("bh_rank")).alias("h"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["h"],
        ).alias("c_m")
    )
    kstar = (
        ranked.crossJoin(F.broadcast(harm))
        .withColumn(
            "k_star_by",
            F.max(
                F.when(
                    F.col("p_r")
                    <= F.col("bh_rank") * 0.05 / (F.col("m") * F.col("c_m")),
                    F.col("bh_rank"),
                ).otherwise(F.lit(0))
            ).over(Window.partitionBy()),
        )
        .withColumn(
            "k_star_bh",
            F.max(
                F.when(
                    F.col("p_r") <= F.col("bh_rank") * 0.05 / F.col("m"),
                    F.col("bh_rank"),
                ).otherwise(F.lit(0))
            ).over(Window.partitionBy()),
        )
    )
    return kstar.select(
        "event_type",
        "day",
        F.round("z", 6).alias("z_score"),
        F.col("p_r").alias("p_value"),
        F.col("bh_rank").cast("long").alias("bh_rank"),
        F.round("c_m", 6).alias("harmonic_m"),
        F.when(F.col("bh_rank") <= F.col("k_star_bh"), 1)
        .otherwise(0)
        .cast("long")
        .alias("discovery_bh"),
        F.when(F.col("bh_rank") <= F.col("k_star_by"), 1)
        .otherwise(0)
        .cast("long")
        .alias("discovery_by"),
    )


@register(
    "q472_lin_concordance",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY day
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM d
    ), stat AS (
      SELECT n,
             CAST(sx AS DOUBLE) / n AS mx,
             CAST(sy AS DOUBLE) / n AS my,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n AS vx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n AS vy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n AS cxy
      FROM m
    )
    SELECT n AS n_days,
           ROUND(cxy / SQRT(GREATEST(vx * vy, 1e-12)), 6) AS pearson_r,
           ROUND(2.0 * cxy
                 / (vx + vy + (mx - my) * (mx - my)), 6) AS lin_ccc,
           ROUND((2.0 * cxy / (vx + vy + (mx - my) * (mx - my)))
                 / GREATEST(ABS(cxy / SQRT(GREATEST(vx * vy, 1e-12))),
                            1e-12), 6) AS accuracy_cb
    FROM stat
    """,
)
def q472_lin_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X402 — LIN'S CONCORDANCE CORRELATION COEFFICIENT (Lin 1989)
    between daily purchase and click revenue: Pearson's r rewards any
    linear relationship, but CCC = 2·cov/(σx²+σy²+(μx−μy)²) only
    rewards agreement with the y = x line — the AGREEMENT statistic for
    method comparison (does the cheap metric reproduce the expensive
    one, does the replica pipeline reproduce the primary?). The ratio
    CCC/|r| is Lin's accuracy (bias-correction) factor C_b, isolating
    how much disagreement is location/scale shift vs scatter. Entirely
    exact integer moments (n, Σx, Σy, Σx², Σy², Σxy) and one-row
    identical-text float closed forms — zero float aggregation.

    Scale: one conditional-sum day rollup + a 1-row reduce."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    stat = m.select(
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (
            (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
            / F.col("n")
        ).alias("vx"),
        (
            (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
            / F.col("n")
        ).alias("vy"),
        (
            (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
            / F.col("n")
        ).alias("cxy"),
    )
    r = F.col("cxy") / F.sqrt(F.greatest(F.col("vx") * F.col("vy"), F.lit(1e-12)))
    ccc = (
        2.0
        * F.col("cxy")
        / (F.col("vx") + F.col("vy") + (F.col("mx") - F.col("my")) * (F.col("mx") - F.col("my")))
    )
    return stat.select(
        F.col("n").alias("n_days"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc, 6).alias("lin_ccc"),
        F.round(ccc / F.greatest(F.abs(r), F.lit(1e-12)), 6).alias("accuracy_cb"),
    )


@register(
    "q477_welch_anova",
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), per AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc * vc) AS BIGINT) AS s2
      FROM v GROUP BY et
    ), d AS (
      SELECT et, n,
             CAST(s AS DOUBLE) / n AS m,
             CAST(n AS DOUBLE)
             / GREATEST((CAST(s2 AS DOUBLE)
                         - CAST(s AS DOUBLE) * s / n) / (n - 1),
                        1e-9) AS w
      FROM per
    ), folds AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0, list(w ORDER BY et)),
                         (acc, x) -> acc + x) AS bw,
             list_reduce(list_prepend(0.0, list(w * m ORDER BY et)),
                         (acc, x) -> acc + x) AS swm,
             list_reduce(list_prepend(0.0, list(w * m * m ORDER BY et)),
                         (acc, x) -> acc + x) AS swm2,
             list_reduce(list_prepend(0.0,
                         list(1.0 / (n - 1) ORDER BY et)),
                         (acc, x) -> acc + x) AS c1,
             list_reduce(list_prepend(0.0,
                         list(w / (n - 1) ORDER BY et)),
                         (acc, x) -> acc + x) AS c2,
             list_reduce(list_prepend(0.0,
                         list(w * w / (n - 1) ORDER BY et)),
                         (acc, x) -> acc + x) AS c3
      FROM d
    ), lam AS (
      SELECT nn, k, bw, swm, swm2,
             c1 - 2.0 * c2 / bw + c3 / (bw * bw) AS lambda
      FROM folds
    ), f AS (
      SELECT nn, k, lambda,
             ((swm2 - swm * swm / bw) / (k - 1))
             / (1.0 + (2.0 * (k - 2) / (k * k - 1.0)) * lambda) AS f_stat
      FROM lam
    ), chi AS (
      SELECT nn, k, lambda, f_stat,
             (k - 1) * f_stat AS chi2, CAST(k AS DOUBLE) - 1.0 AS df
      FROM f
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM chi
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM wh
    )
    SELECT nn AS n_rows, k AS n_groups,
           ROUND(f_stat, 6) AS f_stat,
           CAST(k - 1 AS BIGINT) AS df1,
           ROUND((k * k - 1.0) / (3.0 * lambda), 6) AS df2,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_approx
    FROM p
    """,
)
def q477_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X407 — WELCH'S HETEROSCEDASTIC ONE-WAY ANOVA: do the k event
    types have equal mean value WITHOUT assuming equal variances — the
    test q453 (Brown–Forsythe) says classic ANOVA would get wrong here
    (the synthetic types have very different spreads). Weights
    w_j = n_j/s_j²; the between-group numerator uses the expansion
    Σw(m−m̄_w)² = Σwm² − (Σwm)²/Σw and Welch's Λ = Σ(1−w/W)²/(n−1)
    expands to per-group folds c1 − 2c2/W + c3/W², so EVERY k-element
    float reduction is a fold over a SORTED array (the q448/q453
    discipline) built from exact int64 moments. Satterthwaite df2 is
    published; the tail is the (k−1)F ~ χ²_{k−1} large-N approximation
    through the q426 Wilson–Hilferty chain (exact Welch tails need the
    incomplete beta — df1/df2 let a caller do the lookup).

    Scale: one (type)-grain integer aggregate, one k-row fold."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.select(
            F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vc").cast("long").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2"),
        )
    )
    d = per.select(
        "et",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        (
            F.col("n").cast("double")
            / F.greatest(
                (
                    F.col("s2").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                / (F.col("n") - 1),
                F.lit(1e-9),
            )
        ).alias("w"),
    )

    def _fold(term, alias):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", term.alias("x")))),
            F.lit(0.0),
            lambda acc, r: acc + r["x"],
        ).alias(alias)

    folds = d.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        _fold(F.col("w"), "bw"),
        _fold(F.col("w") * F.col("m"), "swm"),
        _fold(F.col("w") * F.col("m") * F.col("m"), "swm2"),
        _fold(F.lit(1.0) / (F.col("n") - 1), "c1"),
        _fold(F.col("w") / (F.col("n") - 1), "c2"),
        _fold(F.col("w") * F.col("w") / (F.col("n") - 1), "c3"),
    )
    wh = (
        folds.withColumn(
            "lambda",
            F.expr("c1 - 2.0 * c2 / bw + c3 / (bw * bw)"),
        )
        .withColumn(
            "f_stat",
            F.expr(
                "((swm2 - swm * swm / bw) / (k - 1))"
                " / (1.0 + (2.0 * (k - 2) / (k * k - 1.0)) * lambda)"
            ),
        )
        .withColumn("chi2", F.expr("(k - 1) * f_stat"))
        .withColumn("df", F.expr("CAST(k AS DOUBLE) - 1.0"))
        .withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)"))
        .withColumn("t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0"))
        .withColumn("t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0"))
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.select(
        F.col("nn").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round("f_stat", 6).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        F.round(F.expr("(k * k - 1.0) / (3.0 * lambda)"), 6).alias("df2"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q478_bartlett_test",
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), per AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc * vc) AS BIGINT) AS s2
      FROM v GROUP BY et
    ), d AS (
      SELECT et, n,
             GREATEST((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * s / n) / (n - 1),
                      1e-9) AS var
      FROM per
    ), folds AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0,
                         list((n - 1) * var ORDER BY et)),
                         (acc, x) -> acc + x) AS sp_num,
             list_reduce(list_prepend(0.0,
                         list((n - 1) * ln(var) ORDER BY et)),
                         (acc, x) -> acc + x) AS sl,
             list_reduce(list_prepend(0.0,
                         list(1.0 / (n - 1) ORDER BY et)),
                         (acc, x) -> acc + x) AS c1
      FROM d
    ), t AS (
      SELECT nn, k,
             ((nn - k) * ln(sp_num / (nn - k)) - sl)
             / (1.0 + (c1 - 1.0 / (nn - k)) / (3.0 * (k - 1))) AS chi2,
             CAST(k AS DOUBLE) - 1.0 AS df
      FROM folds
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM t
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM wh
    )
    SELECT nn AS n_rows, k AS n_groups,
           ROUND(chi2, 6) AS bartlett_chi2,
           CAST(k - 1 AS BIGINT) AS df,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_approx
    FROM p
    """,
)
def q478_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X408 — BARTLETT'S TEST of variance homogeneity: the classic
    (normality-sensitive) counterpart to q453's robust Brown–Forsythe —
    publishing both is how a stats shelf lets the caller trade power
    against robustness. Per-group variances come from exact int64
    moments; the two k-element float reductions (Σ(n−1)s², Σ(n−1)ln s²)
    fold over SORTED arrays; ln is the single libm call per group
    (q378's convention), and the χ²_{k−1} upper tail goes through the
    q426 Wilson–Hilferty chain.

    Scale: one (type)-grain integer aggregate, one k-row fold."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.select(
            F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vc").cast("long").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2"),
        )
    )
    d = per.select(
        "et",
        "n",
        F.greatest(
            (
                F.col("s2").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1),
            F.lit(1e-9),
        ).alias("var"),
    )

    def _fold(term, alias):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", term.alias("x")))),
            F.lit(0.0),
            lambda acc, r: acc + r["x"],
        ).alias(alias)

    folds = d.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        _fold((F.col("n") - 1) * F.col("var"), "sp_num"),
        _fold((F.col("n") - 1) * F.log(F.col("var")), "sl"),
        _fold(F.lit(1.0) / (F.col("n") - 1), "c1"),
    )
    wh = (
        folds.withColumn(
            "chi2",
            F.expr(
                "((nn - k) * ln(sp_num / (nn - k)) - sl)"
                " / (1.0 + (c1 - 1.0 / (nn - k)) / (3.0 * (k - 1)))"
            ),
        )
        .withColumn("df", F.expr("CAST(k AS DOUBLE) - 1.0"))
        .withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)"))
        .withColumn("t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0"))
        .withColumn("t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0"))
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.select(
        F.col("nn").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round("chi2", 6).alias("bartlett_chi2"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q479_mood_median_test",
    allow_non_equi=(
        "1-row broadcast scalars (grand median, grand totals) "
        "crossJoin-attached onto the value rollup and the k-row "
        "per-type table - group-cardinality, never row-level"
    ),
    oracle=f"""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), g1 AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY vc
    ), tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n FROM g1
    ), rk AS (
      SELECT g1.vc, g1.t, tot.n,
             COALESCE(SUM(g1.t) OVER (ORDER BY g1.vc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM g1 CROSS JOIN tot
    ), med AS (
      SELECT vc AS m FROM rk
      WHERE below < (n + 1) // 2 AND below + t >= (n + 1) // 2
    ), per AS (
      SELECT v.et,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN v.vc > med.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS a_i
      FROM v CROSS JOIN med GROUP BY v.et
    ), g AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
             CAST(SUM(a_i) AS BIGINT) AS aa,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM per
    ), chi AS (
      SELECT g.nn, g.aa, g.k,
             list_reduce(list_prepend(0.0, list(
               POW(a_i - CAST(n_i AS DOUBLE) * g.aa / g.nn, 2)
                 / (CAST(n_i AS DOUBLE) * g.aa / g.nn)
               + POW((n_i - a_i)
                     - CAST(n_i AS DOUBLE) * (g.nn - g.aa) / g.nn, 2)
                 / (CAST(n_i AS DOUBLE) * (g.nn - g.aa) / g.nn)
               ORDER BY et)),
               (acc, x) -> acc + x) AS chi2
      FROM per CROSS JOIN g
      GROUP BY g.nn, g.aa, g.k
    ), t AS (
      SELECT nn, aa, k, chi2, CAST(k AS DOUBLE) - 1.0 AS df FROM chi
    ), seed AS (
      SELECT *, POW(chi2 / df, 1.0 / 3.0) AS t0 FROM t
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0 AS t1 FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0 AS t2 FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM wh
    ), m2 AS (SELECT m FROM med)
    SELECT p.nn AS n_rows, p.k AS n_groups,
           m2.m AS grand_median_cents,
           p.aa AS n_above,
           ROUND(p.chi2, 6) AS chi2,
           CAST(p.k - 1 AS BIGINT) AS df,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_approx
    FROM p CROSS JOIN m2
    """,
)
def q479_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X409 — MOOD'S MEDIAN TEST: the k-group location test that only
    asks "above or below the GRAND median?" — maximally robust (cares
    about nothing but the sign of the deviation), the standard
    companion to Kruskal–Wallis (q448) when outliers or heavy ties make
    even rank sums suspect. The grand median is the exact counting
    quantile at (value)-group grain (the q453 lower-median rule);
    per-group above-counts are pure int64; the 2×k chi-square folds
    per-group double terms over a SORTED array; χ²_{k−1} tail via the
    q426 Wilson–Hilferty chain.

    Scale: a value-grain rollup + one prefix-sum window for the
    median, one (type)-grain conditional count, one k-row fold. The
    1-row median/totals attach by broadcast."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
    )
    g1 = v.groupBy("vc").agg(F.count(F.lit(1)).cast("long").alias("t"))
    w_all = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, -1)
    n_total = g1.agg(F.sum("t").cast("long").alias("n"))
    rk = g1.join(F.broadcast(n_total)).select(
        "vc", "t", "n", F.coalesce(F.sum("t").over(w_all), F.lit(0)).alias("below")
    )
    med = rk.filter(
        (F.col("below") < F.expr("(n + 1) DIV 2"))
        & (F.col("below") + F.col("t") >= F.expr("(n + 1) DIV 2"))
    ).select(F.col("vc").alias("m"))
    per = (
        v.join(F.broadcast(med))
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum(F.when(F.col("vc") > F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("a_i"),
        )
    )
    g = per.agg(
        F.sum("n_i").cast("long").alias("nn"),
        F.sum("a_i").cast("long").alias("aa"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    term = F.expr(
        "POW(a_i - CAST(n_i AS DOUBLE) * aa / nn, 2)"
        " / (CAST(n_i AS DOUBLE) * aa / nn)"
        " + POW((n_i - a_i) - CAST(n_i AS DOUBLE) * (nn - aa) / nn, 2)"
        " / (CAST(n_i AS DOUBLE) * (nn - aa) / nn)"
    )
    chi = (
        per.join(F.broadcast(g))
        .groupBy("nn", "aa", "k")
        .agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("et", term.alias("x")))
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["x"],
            ).alias("chi2")
        )
    )
    wh = (
        chi.withColumn("df", F.expr("CAST(k AS DOUBLE) - 1.0"))
        .withColumn("t0", F.expr("POW(chi2 / df, 1.0 / 3.0)"))
        .withColumn("t1", F.expr("(2.0 * t0 + (chi2 / df) / (t0 * t0)) / 3.0"))
        .withColumn("t2", F.expr("(2.0 * t1 + (chi2 / df) / (t1 * t1)) / 3.0"))
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.join(F.broadcast(med)).select(
        F.col("nn").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.col("m").alias("grand_median_cents"),
        F.col("aa").alias("n_above"),
        F.round("chi2", 6).alias("chi2"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q480_grubbs_test",
    oracle="""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), per AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc * vc) AS BIGINT) AS s2,
             CAST(MIN(vc) AS BIGINT) AS mn,
             CAST(MAX(vc) AS BIGINT) AS mx
      FROM v GROUP BY et
    ), d AS (
      SELECT et, n, mn, mx,
             CAST(s AS DOUBLE) / n AS mean,
             SQRT(GREATEST((CAST(s2 AS DOUBLE)
                            - CAST(s AS DOUBLE) * s / n) / (n - 1),
                           1e-9)) AS sd,
             (n * (mx + mn) >= 2 * s) AS hi_side
      FROM per
    )
    SELECT et AS event_type, n,
           ROUND(mean, 6) AS mean_cents,
           ROUND(sd, 6) AS sd_cents,
           ROUND(GREATEST(mx - mean, mean - mn) / sd, 6) AS g_stat,
           CASE WHEN hi_side THEN mx ELSE mn END AS outlier_cents
    FROM d ORDER BY et
    """,
)
def q480_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X410 — GRUBBS' OUTLIER TEST statistic per event type: the most
    extreme deviation from the group mean in sd units,
    G = max(x̄−min, max−x̄)/s, with the offending value published — the
    single-most-suspicious-point audit that complements the bulk
    outlier screens (q94 zscore, q145 robust, q351 HBOS). Entirely
    closed-form from five exact int64 moments (n, Σx, Σx², min, max) —
    no row-level doubles at all — and the WHICH-side decision
    (max-or-min) is the INTEGER comparison n·(max+min) ≥ 2·Σx, so the
    published outlier value can never flip on a float boundary. G's
    critical value needs the t quantile (not portably expressible);
    n is published so a caller can do the lookup.

    Scale: one (type)-grain integer aggregate; k rows out."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.select(
            F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vc").cast("long").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2"),
            F.min("vc").cast("long").alias("mn"),
            F.max("vc").cast("long").alias("mx"),
        )
    )
    d = per.select(
        "et",
        "n",
        "mn",
        "mx",
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                (
                    F.col("s2").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                / (F.col("n") - 1),
                F.lit(1e-9),
            )
        ).alias("sd"),
        (F.col("n") * (F.col("mx") + F.col("mn")) >= 2 * F.col("s")).alias(
            "hi_side"
        ),
    )
    return d.select(
        F.col("et").alias("event_type"),
        "n",
        F.round("mean", 6).alias("mean_cents"),
        F.round("sd", 6).alias("sd_cents"),
        F.round(
            F.greatest(
                F.col("mx") - F.col("mean"), F.col("mean") - F.col("mn")
            )
            / F.col("sd"),
            6,
        ).alias("g_stat"),
        F.when(F.col("hi_side"), F.col("mx"))
        .otherwise(F.col("mn"))
        .cast("long")
        .alias("outlier_cents"),
    ).orderBy("event_type")


@register(
    "q481_permutation_test_portable",
    allow_non_equi=(
        "1-row broadcast observed-statistic scalar crossJoin-attached "
        "onto the 64-row permutation table - group-cardinality, never "
        "row-level"
    ),
    oracle="""
    WITH base AS (
      SELECT event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS treat
      FROM events WHERE event_type IN ('purchase', 'view')
    ), obs AS (
      SELECT CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN treat = 1 THEN vc ELSE 0 END) AS BIGINT)
               AS s_t,
             CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN treat = 0 THEN vc ELSE 0 END) AS BIGINT)
               AS s_c
      FROM base
    ), perms AS (
      SELECT b.event_id, b.vc, i.i,
             CASE WHEN (b.treat
                        + CAST(concat('0x', substr(md5(concat('perm|',
                              CAST(b.event_id AS VARCHAR), '|',
                              CAST(i.i AS VARCHAR))), 1, 15))
                           AS BIGINT) % 2) % 2 = 1
                  THEN 1 ELSE 0 END AS lbl
      FROM base b CROSS JOIN range(1, 65) i(i)
    ), per AS (
      SELECT i,
             CAST(SUM(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN lbl = 1 THEN vc ELSE 0 END) AS BIGINT)
               AS s_t,
             CAST(SUM(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN lbl = 0 THEN vc ELSE 0 END) AS BIGINT)
               AS s_c
      FROM perms GROUP BY i
    ), diffs AS (
      SELECT per.i,
             CAST(per.s_t AS DOUBLE) / per.n_t
             - CAST(per.s_c AS DOUBLE) / per.n_c AS d,
             CAST(obs.s_t AS DOUBLE) / obs.n_t
             - CAST(obs.s_c AS DOUBLE) / obs.n_c AS d_obs
      FROM per CROSS JOIN obs
      WHERE per.n_t > 0 AND per.n_c > 0
    )
    SELECT o.n_t AS n_treat, o.n_c AS n_ctrl,
           ROUND(CAST(o.s_t AS DOUBLE) / o.n_t
                 - CAST(o.s_c AS DOUBLE) / o.n_c, 6) AS d_obs_cents,
           CAST(COUNT(*) AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN ABS(d) >= ABS(d_obs) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           ROUND((SUM(CASE WHEN ABS(d) >= ABS(d_obs) THEN 1 ELSE 0 END)
                  + 1.0) / (COUNT(*) + 1.0), 6) AS p_mc
    FROM diffs CROSS JOIN obs o
    GROUP BY o.n_t, o.n_c, o.s_t, o.s_c
    """,
)
def q481_permutation_test_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X411 — PORTABLE RANDOMIZATION (PERMUTATION) TEST for the
    purchase-vs-view mean value difference: 64 deterministic
    md5-seeded relabelings (the random-REALLOCATION variant — each
    row's group flips on a hash bit of (event_id, perm), so both
    engines materialize the IDENTICAL null ensemble literal-for-
    literal), the observed |mean diff| compared against the ensemble,
    Monte-Carlo p = (#extreme + 1)/(B + 1). This is the
    distribution-free significance machine the parametric shelf
    (q226 z, q477 Welch) gets audited against — no normality, no
    variance model, just exchangeability. All per-perm moments are
    exact int64 (cents); only the final 64 mean-diffs are doubles,
    computed from identical integer operands on both engines.

    Scale: the 64× blowup happens INSIDE one map-side-combinable
    aggregate to (perm, label) grain — 130 rows out of the shuffle
    regardless of corpus size; the observed scalar broadcasts."""
    ev = load(spark, sf_dir, "events")
    base = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "event_id",
        cents(F.col("value")).alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "treat"
        ),
    )
    obs = base.agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("s_c"),
    )
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm|"),
                        F.col("event_id").cast("string"),
                        F.lit("|"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    perms = base.select(
        "event_id",
        "vc",
        "treat",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("i"),
    ).select(
        "i",
        "vc",
        F.when((F.col("treat") + flip) % 2 == 1, 1).otherwise(0).alias("lbl"),
    )
    per = perms.groupBy("i").agg(
        F.sum(F.when(F.col("lbl") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("lbl") == 1, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("lbl") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("lbl") == 0, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("s_c"),
    )
    obs_r = obs.select(
        F.col("n_t").alias("o_n_t"),
        F.col("s_t").alias("o_s_t"),
        F.col("n_c").alias("o_n_c"),
        F.col("s_c").alias("o_s_c"),
    )
    d = F.col("s_t").cast("double") / F.col("n_t") - F.col("s_c").cast(
        "double"
    ) / F.col("n_c")
    d_obs = F.col("o_s_t").cast("double") / F.col("o_n_t") - F.col(
        "o_s_c"
    ).cast("double") / F.col("o_n_c")
    return (
        per.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
        .join(F.broadcast(obs_r))
        .select(
            "o_n_t",
            "o_n_c",
            d.alias("d"),
            d_obs.alias("d_obs"),
        )
        .groupBy("o_n_t", "o_n_c", "d_obs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_perms"),
            F.sum(
                F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
        .select(
            F.col("o_n_t").alias("n_treat"),
            F.col("o_n_c").alias("n_ctrl"),
            F.round("d_obs", 6).alias("d_obs_cents"),
            "n_perms",
            "n_extreme",
            F.round(
                (F.col("n_extreme") + F.lit(1.0))
                / (F.col("n_perms") + F.lit(1.0)),
                6,
            ).alias("p_mc"),
        )
    )


@register(
    "q487_bayes_ab_normal_approx",
    oracle=f"""
    WITH arms AS (
      SELECT user_id % 2 AS arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY arm
    ), post AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
        MAX(CASE WHEN arm = 0 THEN x END) AS x_a,
        MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
        MAX(CASE WHEN arm = 1 THEN x END) AS x_b
      FROM arms
    ), m AS (
      SELECT n_a, x_a, n_b, x_b,
             (x_a + 1.0) / (n_a + 2.0) AS ma,
             (x_b + 1.0) / (n_b + 2.0) AS mb,
             ((x_a + 1.0) / (n_a + 2.0)) * (1.0 - (x_a + 1.0) / (n_a + 2.0))
               / (n_a + 3.0) AS va,
             ((x_b + 1.0) / (n_b + 2.0)) * (1.0 - (x_b + 1.0) / (n_b + 2.0))
               / (n_b + 3.0) AS vb
      FROM post
    ), z AS (
      SELECT *, (mb - ma) / SQRT(va + vb) AS z FROM m
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM z
    )
    SELECT n_a, x_a, n_b, x_b,
           ROUND(ma, 6) AS post_mean_a,
           ROUND(mb, 6) AS post_mean_b,
           ROUND(z, 6) AS z_score,
           ROUND(CASE WHEN z >= 0 THEN 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_b_beats_a
    FROM p
    """,
)
def q487_bayes_ab_normal_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X417 — BAYESIAN A/B on purchase conversion (uniform-prior
    Beta-Binomial posteriors, normal approximation): the
    decision-quantity P(B > A) that the frequentist shelf (q226 z-test,
    q405 mSPRT) never emits — posterior means mₐ=(x+1)/(n+2), posterior
    variances m(1−m)/(n+3), and P(B>A) ≈ Φ((m_b−m_a)/√(v_a+v_b)) through
    the house Zelen–Severo Φ polynomial. Arms split on the user-id
    parity hash (the q338 SRM convention). Exact posterior would need
    the incomplete beta; the normal approximation is standard at these
    n and the exact int64 (n, x) counts are published for any offline
    refinement.

    Scale: one conditional-count aggregate; a 2-row pivot; one row out."""
    ev = load(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    post = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x_b"),
    )
    m = (
        post.withColumn(
            "ma", F.expr("(CAST(x_a AS DOUBLE) + 1.0) / (n_a + 2.0)")
        )
        .withColumn(
            "mb", F.expr("(CAST(x_b AS DOUBLE) + 1.0) / (n_b + 2.0)")
        )
        .withColumn(
            "va", F.expr("ma * (1.0 - ma) / CAST(n_a + 3 AS DOUBLE)")
        )
        .withColumn(
            "vb", F.expr("mb * (1.0 - mb) / CAST(n_b + 3 AS DOUBLE)")
        )
        .withColumn("z", F.expr("(mb - ma) / SQRT(va + vb)"))
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return m.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round("ma", 6).alias("post_mean_a"),
        F.round("mb", 6).alias("post_mean_b"),
        F.round("z", 6).alias("z_score"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_b_beats_a"),
    )


@register(
    "q488_power_curve_planner",
    allow_non_equi=(
        "the 5-row MDE spine crossJoins the 1-row baseline-rate scalar "
        "- group-cardinality, never row-level"
    ),
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events
    ), spine AS (
      SELECT CAST(lift_pct AS BIGINT) AS lift_pct
      FROM (VALUES (1), (2), (5), (10), (20)) t(lift_pct)
    ), calc AS (
      SELECT s.lift_pct, b.n, b.x,
             CAST(b.x AS DOUBLE) / b.n AS p0,
             (CAST(b.x AS DOUBLE) / b.n) * (1.0 + s.lift_pct / 100.0)
               AS p1
      FROM spine s CROSS JOIN base b
    ), nn AS (
      SELECT lift_pct, n, x, p0, p1,
             POW(1.959964 * SQRT(2.0 * ((p0 + p1) / 2.0)
                                 * (1.0 - (p0 + p1) / 2.0))
                 + 0.841621 * SQRT(p0 * (1.0 - p0) + p1 * (1.0 - p1)), 2)
             / POW(p1 - p0, 2) AS n_per_arm
      FROM calc
    )
    SELECT lift_pct,
           ROUND(p0, 6) AS baseline_rate,
           ROUND(p1, 6) AS target_rate,
           ROUND(n_per_arm, 2) AS n_per_arm,
           ROUND(n_per_arm * 2.0 / n, 4) AS corpus_multiples
    FROM nn ORDER BY lift_pct
    """,
)
def q488_power_curve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X418 — EXPERIMENT POWER / SAMPLE-SIZE PLANNER: for the measured
    baseline purchase rate, the two-proportion sample size per arm at
    α=0.05 (two-sided, z=1.959964) and power 0.80 (z=0.841621) across a
    relative-MDE spine (1/2/5/10/20%) — the design table an
    experimentation platform serves BEFORE q226/q405/q487 ever run, and
    the second engine-design-as-a-query member after q485: it justifies
    which effect sizes this corpus can even detect (corpus_multiples
    says how many corpora the 1% MDE needs). Baseline rate is an exact
    integer ratio; the z literals are written, not computed, so both
    engines evaluate one identical closed form per spine row.

    Scale: one count aggregate + a 5-row literal spine."""
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    spine = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v).cast("long") for v in (1, 2, 5, 10, 20)])
        ).alias("lift_pct")
    )
    calc = (
        spine.join(F.broadcast(base))
        .withColumn("p0", F.expr("CAST(x AS DOUBLE) / n"))
        .withColumn("p1", F.expr("p0 * (1.0 + lift_pct / 100.0)"))
        .withColumn(
            "n_per_arm",
            F.expr(
                "POW(1.959964 * SQRT(2.0 * ((p0 + p1) / 2.0)"
                " * (1.0 - (p0 + p1) / 2.0))"
                " + 0.841621 * SQRT(p0 * (1.0 - p0) + p1 * (1.0 - p1)), 2)"
                " / POW(p1 - p0, 2)"
            ),
        )
    )
    return calc.select(
        "lift_pct",
        F.round("p0", 6).alias("baseline_rate"),
        F.round("p1", 6).alias("target_rate"),
        F.round("n_per_arm", 2).alias("n_per_arm"),
        F.round(F.expr("n_per_arm * 2.0 / n"), 4).alias("corpus_multiples"),
    ).orderBy("lift_pct")


@register(
    "q490_cochran_armitage_trend",
    oracle=f"""
    WITH b AS (
      SELECT CAST(hour(ts) // 6 AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), per AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS x
      FROM b GROUP BY s
    ), g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(x) AS BIGINT) AS xx,
             CAST(SUM(s * x) AS BIGINT) AS sx,
             CAST(SUM(s * n) AS BIGINT) AS sn,
             CAST(SUM(s * s * n) AS BIGINT) AS s2n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM per
    ), z AS (
      SELECT nn, xx, sx, sn, s2n, k,
             (sx - CAST(xx AS DOUBLE) * sn / nn)
             / SQRT((CAST(xx AS DOUBLE) / nn)
                    * (1.0 - CAST(xx AS DOUBLE) / nn)
                    * (s2n - CAST(sn AS DOUBLE) * sn / nn)) AS z
      FROM g
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM z
    )
    SELECT nn AS n_rows, xx AS n_success, k AS n_buckets,
           ROUND(z, 6) AS z_trend,
           ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_value
    FROM p
    """,
)
def q490_cochran_armitage_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X420 — COCHRAN–ARMITAGE TREND TEST: does purchase propensity
    trend MONOTONICALLY across the ordered time-of-day buckets
    (0–5/6–11/12–17/18–23h, scores 0..3)? The ordered-groups
    counterpart to the unordered chi-square (q143) — against an
    ordered alternative it concentrates the k−1 df into one trend df
    and beats the omnibus test's power. Everything up to the final z
    is five exact int64 sums (N, X, Σsx, Σsn, Σs²n); the statistic is
    one closed form over them; two-sided p through the house Φ
    polynomial.

    Scale: one (bucket)-grain conditional count, one 4-row rollup."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.select(
            F.expr("CAST(hour(ts) DIV 6 AS BIGINT)").alias("s"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("x"),
        )
    )
    g = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("x").cast("long").alias("xx"),
        F.sum(F.col("s") * F.col("x")).cast("long").alias("sx"),
        F.sum(F.col("s") * F.col("n")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n"))
        .cast("long")
        .alias("s2n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    z = (
        g.withColumn(
            "z",
            F.expr(
                "(sx - CAST(xx AS DOUBLE) * sn / nn)"
                " / SQRT((CAST(xx AS DOUBLE) / nn)"
                " * (1.0 - CAST(xx AS DOUBLE) / nn)"
                " * (s2n - CAST(sn AS DOUBLE) * sn / nn))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return z.select(
        F.col("nn").alias("n_rows"),
        F.col("xx").alias("n_success"),
        F.col("k").alias("n_buckets"),
        F.round("z", 6).alias("z_trend"),
        F.round(F.expr(_P_TWO_SIDED_EXPR), 6).alias("p_value"),
    )


@register(
    "q491_page_trend_test",
    oracle=f"""
    WITH wk AS (
      SELECT user_id, CAST(week(ts) AS BIGINT) AS w,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events
      WHERE week(ts) IN (1, 2, 3) AND year(ts) = 2024
      GROUP BY user_id, w
    ), complete AS (
      SELECT user_id FROM wk GROUP BY user_id HAVING COUNT(*) = 3
    ), ranked AS (
      SELECT wk.user_id, wk.w,
             CAST(ROW_NUMBER() OVER (PARTITION BY wk.user_id
                  ORDER BY wk.vc, wk.w) AS BIGINT) AS r
      FROM wk JOIN complete USING (user_id)
    ), l AS (
      SELECT CAST(SUM(w * r) AS BIGINT) AS big_l,
             CAST(COUNT(*) / 3 AS BIGINT) AS b
      FROM ranked
    ), z AS (
      SELECT big_l, b,
             (big_l - b * 12.0) / SQRT(b * 2.0) AS z
      FROM l
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM z
    )
    SELECT b AS n_blocks, big_l AS page_l,
           CAST(b * 12 AS BIGINT) AS expected_l,
           ROUND(z, 6) AS z_score,
           ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_value
    FROM p
    """,
)
def q491_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X421 — PAGE'S L TREND TEST for ordered alternatives in blocked
    ranks: across ISO weeks 1→2→3, does per-user weekly spend trend in
    a CONSISTENT direction? The ordered-weeks counterpart to the
    unordered Friedman/Kendall-W machinery (q442) — L = Σ_j j·R_j
    weights the per-week rank sums by week order, so a monotone drift
    that Friedman splits across df lands in one statistic. Blocks are
    users present in ALL THREE weeks (complete blocks, as the test
    requires); within-user ranks use the deterministic (value, week)
    tiebreak; L, E[L] = 12b and Var[L] = 2b (k=3) are exact integers;
    only the final z and its two-sided tail are doubles.

    Scale: a (user, week)-grain integer rollup, a complete-blocks
    semi-join, a 3-row-per-user rank window, one global sum."""
    ev = load(spark, sf_dir, "events")
    wk = (
        ev.filter(
            F.expr("weekofyear(ts) IN (1, 2, 3) AND year(ts) = 2024")
        )
        .groupBy(
            "user_id", F.expr("CAST(weekofyear(ts) AS BIGINT)").alias("w")
        )
        .agg(F.sum(cents(F.col("value"))).cast("long").alias("vc"))
    )
    complete = (
        wk.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 3)
        .select("user_id")
    )
    wr = Window.partitionBy("user_id").orderBy("vc", "w")
    ranked = wk.join(complete, "user_id").select(
        "user_id", "w", F.row_number().over(wr).cast("long").alias("r")
    )
    l = ranked.agg(
        F.sum(F.col("w") * F.col("r")).cast("long").alias("big_l"),
        (F.count(F.lit(1)) / 3).cast("long").alias("b"),
    )
    z = (
        l.withColumn("z", F.expr("(big_l - b * 12.0) / SQRT(b * 2.0)"))
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return z.select(
        F.col("b").alias("n_blocks"),
        F.col("big_l").alias("page_l"),
        (F.col("b") * 12).cast("long").alias("expected_l"),
        F.round("z", 6).alias("z_score"),
        F.round(F.expr(_P_TWO_SIDED_EXPR), 6).alias("p_value"),
    )


@register(
    "q499_holm_stepdown_screen",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), d AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(vc) AS BIGINT) AS s_d
      FROM v GROUP BY event_type, day
    ), t AS (
      SELECT event_type,
             CAST(SUM(n_d) AS BIGINT) AS n_t,
             CAST(SUM(s_d) AS BIGINT) AS s_t
      FROM d GROUP BY event_type
    ), t2 AS (
      SELECT event_type, CAST(SUM(vc * vc) AS BIGINT) AS s2_t
      FROM v GROUP BY event_type
    ), z AS (
      SELECT d.event_type, d.day, d.n_d,
             {_Z_DAY_VS_TYPE_EXPR.replace("s_d", "d.s_d")
                                 .replace("n_d", "d.n_d")} AS z
      FROM d JOIN t USING (event_type) JOIN t2 USING (event_type)
    ), p AS (
      SELECT event_type, day, n_d, z,
             ROUND({_P_TWO_SIDED_EXPR}, 6) AS p_r
      FROM (SELECT *, ABS(z) AS az,
                   1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
            FROM z)
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY p_r, event_type, day) AS rnk,
             COUNT(*) OVER () AS m
      FROM p
    ), gate AS (
      SELECT *,
             MIN(CASE WHEN p_r > 0.05 / (m - rnk + 1)
                      THEN rnk END) OVER () AS fail_rank
      FROM ranked
    )
    SELECT event_type, day,
           CAST(n_d AS BIGINT) AS n,
           ROUND(z, 6) AS z_score,
           p_r AS p_value,
           CAST(rnk AS BIGINT) AS holm_rank,
           CAST(CASE WHEN rnk < COALESCE(fail_rank, m + 1)
                     THEN 1 ELSE 0 END AS BIGINT) AS holm_discovery,
           CAST(CASE WHEN p_r <= 0.05 / m THEN 1 ELSE 0 END AS BIGINT)
             AS bonferroni_discovery
    FROM gate
    """,
)
def q499_holm_stepdown_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X429 — HOLM STEP-DOWN FWER screen on q409's (type, day) anomaly
    grid: reject p_(i) while p_(i) ≤ α/(m−i+1), stop at the first
    failure — uniformly more powerful than Bonferroni at the SAME
    family-wise error guarantee (published side by side so the three
    multiplicity regimes — FWER Holm/Bonferroni here, FDR BH q409, FDR
    BY q470 — are directly comparable on one grid). The step-down stop
    rule is one windowed MIN over the ranked grid; ranks use the
    deterministic (p, type, day) total order.

    Scale: identical to q409 — raw events collapse to the (type, day)
    grid before any window; the global window rides ~|types|×|days|
    rows by construction."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        cents(F.col("value")).alias("vc"),
    )
    d = v.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("vc").cast("long").alias("s_d"),
    )
    t = d.groupBy("event_type").agg(
        F.sum("n_d").cast("long").alias("n_t"),
        F.sum("s_d").cast("long").alias("s_t"),
    )
    t2 = v.groupBy("event_type").agg(
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2_t")
    )
    z = (
        d.join(F.broadcast(t), "event_type")
        .join(F.broadcast(t2), "event_type")
        .withColumn("z", F.expr(_Z_DAY_VS_TYPE_EXPR))
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
        .withColumn("p_r", F.round(F.expr(_P_TWO_SIDED_EXPR), 6))
    )
    w = Window.orderBy("p_r", "event_type", "day")
    ranked = z.select(
        "event_type", "day", "n_d", "z", "p_r",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    gate = ranked.withColumn(
        "fail_rank",
        F.min(
            F.when(
                F.col("p_r") > 0.05 / (F.col("m") - F.col("rnk") + 1),
                F.col("rnk"),
            )
        ).over(Window.partitionBy()),
    )
    return gate.select(
        "event_type",
        "day",
        F.col("n_d").cast("long").alias("n"),
        F.round("z", 6).alias("z_score"),
        F.col("p_r").alias("p_value"),
        F.col("rnk").cast("long").alias("holm_rank"),
        F.when(
            F.col("rnk")
            < F.coalesce(F.col("fail_rank"), F.col("m") + 1),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("holm_discovery"),
        F.when(F.col("p_r") <= 0.05 / F.col("m"), 1)
        .otherwise(0)
        .cast("long")
        .alias("bonferroni_discovery"),
    )


@register(
    "q502_g_test_independence",
    allow_non_equi=(
        "1-row grand-total scalar crossJoin-attached onto the bounded "
        "(type x hour-bucket) contingency cells - group-cardinality, "
        "never row-level"
    ),
    oracle=f"""
    WITH b AS (
      SELECT event_type AS et, CAST(hour(ts) // 6 AS BIGINT) AS s
      FROM events
    ), cells AS (
      SELECT et, s, CAST(COUNT(*) AS BIGINT) AS o
      FROM b GROUP BY et, s
    ), mr AS (
      SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY et
    ), mc AS (
      SELECT s, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY s
    ), tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    g AS (
      SELECT CAST(COUNT(DISTINCT cells.et) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT cells.s) AS BIGINT) AS nc,
             MAX(tot.n) AS n,
             2.0 * list_reduce(list_prepend(0.0, list(
               cells.o * ln(CAST(cells.o AS DOUBLE) * tot.n
                            / (CAST(mr.r AS DOUBLE) * mc.c))
               ORDER BY cells.et, cells.s)),
               (acc, x) -> acc + x) AS g_stat
      FROM cells JOIN mr USING (et) JOIN mc USING (s) CROSS JOIN tot
    ), t AS (
      SELECT n, nr, nc, g_stat,
             CAST((nr - 1) * (nc - 1) AS DOUBLE) AS df
      FROM g
    ), seed AS (
      SELECT *, POW(g_stat / df, 1.0 / 3.0) AS t0 FROM t
    ), wh1 AS (
      SELECT *, (2.0 * t0 + (g_stat / df) / (t0 * t0)) / 3.0 AS t1
      FROM seed
    ), wh2 AS (
      SELECT *, (2.0 * t1 + (g_stat / df) / (t1 * t1)) / 3.0 AS t2
      FROM wh1
    ), wh AS (
      SELECT *, (t2 - (1.0 - 2.0 / (9.0 * df)))
                / SQRT(2.0 / (9.0 * df)) AS z
      FROM wh2
    ), p AS (
      SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM wh
    )
    SELECT n AS n_rows, nr AS n_types, nc AS n_buckets,
           ROUND(g_stat, 6) AS g_stat,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
           ROUND(CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0
                      ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END, 6)
             AS p_approx
    FROM p
    """,
)
def q502_g_test_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X432 — LIKELIHOOD-RATIO G-TEST of independence on the
    (event type × time-of-day bucket) contingency table: G = 2·Σ O·ln(O·N/(R·C)),
    the information-theoretic twin of Pearson's chi-square (q143) —
    additive across table partitions (G decomposes exactly where χ²
    does not) and the test of choice when any cell is sparse-ish. O/R/C
    are exact int64 counts; the single float reduction folds per-cell
    G terms over the SORTED (type, bucket) cell array; χ² tail via the
    q426 Wilson–Hilferty chain on (r−1)(c−1) df.

    Scale: one (type, bucket)-grain count, marginals at type/bucket
    grain, one ≤20-row fold."""
    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("event_type").alias("et"),
            F.expr("CAST(hour(ts) DIV 6 AS BIGINT)").alias("s"),
        )
        .groupBy("et", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    mr = cells.groupBy("et").agg(F.sum("o").cast("long").alias("r"))
    mc = cells.groupBy("s").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    term = F.expr(
        "o * ln(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c))"
    )
    g = (
        cells.join(F.broadcast(mr), "et")
        .join(F.broadcast(mc), "s")
        .join(F.broadcast(tot))
        .agg(
            F.countDistinct("et").cast("long").alias("nr"),
            F.countDistinct("s").cast("long").alias("nc"),
            F.max("n").alias("n"),
            (
                F.lit(2.0)
                * F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct("et", "s", term.alias("x"))
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, r: acc + r["x"],
                )
            ).alias("g_stat"),
        )
    )
    wh = (
        g.withColumn("df", F.expr("CAST((nr - 1) * (nc - 1) AS DOUBLE)"))
        .withColumn("t0", F.expr("POW(g_stat / df, 1.0 / 3.0)"))
        .withColumn(
            "t1", F.expr("(2.0 * t0 + (g_stat / df) / (t0 * t0)) / 3.0")
        )
        .withColumn(
            "t2", F.expr("(2.0 * t1 + (g_stat / df) / (t1 * t1)) / 3.0")
        )
        .withColumn(
            "z",
            F.expr(
                "(t2 - (1.0 - 2.0 / (9.0 * df))) / SQRT(2.0 / (9.0 * df))"
            ),
        )
        .withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
    )
    return wh.select(
        F.col("n").alias("n_rows"),
        F.col("nr").alias("n_types"),
        F.col("nc").alias("n_buckets"),
        F.round("g_stat", 6).alias("g_stat"),
        F.expr("CAST((nr - 1) * (nc - 1) AS BIGINT)").alias("df"),
        F.round(
            F.expr(
                f"CASE WHEN z >= 0 THEN ({_P_TWO_SIDED_EXPR}) / 2.0"
                f" ELSE 1.0 - ({_P_TWO_SIDED_EXPR}) / 2.0 END"
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q503_tukey_hsd",
    allow_non_equi=(
        "the k-row per-type moment table self-joins into k(k-1)/2 "
        "pairs and the 1-row pooled-variance scalar crossJoin-attaches "
        "- group-cardinality, never row-level"
    ),
    oracle="""
    WITH v AS (
      SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), per AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc * vc) AS BIGINT) AS s2
      FROM v GROUP BY et
    ), msw AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0, list(
               CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n
               ORDER BY et)),
               (acc, x) -> acc + x) AS ssw
      FROM per
    ), pairs AS (
      SELECT a.et AS et_a, b.et AS et_b,
             CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n
               AS mean_diff,
             a.n AS n_a, b.n AS n_b
      FROM per a JOIN per b ON a.et < b.et
    )
    SELECT p.et_a, p.et_b,
           ROUND(p.mean_diff, 6) AS mean_diff_cents,
           ROUND(ABS(p.mean_diff)
                 / SQRT((m.ssw / (m.nn - m.k)) / 2.0
                        * (1.0 / p.n_a + 1.0 / p.n_b)), 6) AS q_stat,
           CAST(m.nn - m.k AS BIGINT) AS df_within,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(p.mean_diff)
                / SQRT((m.ssw / (m.nn - m.k)) / 2.0
                       * (1.0 / p.n_a + 1.0 / p.n_b)) DESC,
                p.et_a, p.et_b) AS BIGINT) AS rnk
    FROM pairs p CROSS JOIN msw m
    ORDER BY rnk
    """,
)
def q503_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X433 — TUKEY HSD studentized-range statistics for all k(k−1)/2
    pairwise mean comparisons (Tukey–Kramer unequal-n form,
    q = |m_i−m_j| / √(MSW/2·(1/n_i+1/n_j))) — the PARAMETRIC post-hoc
    after an ANOVA (q477 Welch) the way Dunn (q450) is the rank-based
    post-hoc after Kruskal–Wallis; ranking all pairs by q shows which
    type pairs actually drive the omnibus rejection. Per-type moments
    are exact int64; the pooled within-group SS folds over a SORTED
    k-array; the studentized-range critical value is not portably
    expressible, so q and df_within publish for the caller's lookup
    (the q453/q480 convention).

    Scale: one (type)-grain aggregate, a k×k/2 self-join of a 5-row
    table, one 1-row scalar broadcast."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.select(
            F.col("event_type").alias("et"), cents(F.col("value")).alias("vc")
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vc").cast("long").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).cast("long").alias("s2"),
        )
    )
    msw = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "et",
                        F.expr(
                            "CAST(s2 AS DOUBLE)"
                            " - CAST(s AS DOUBLE) * s / n"
                        ).alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["x"],
        ).alias("ssw"),
    )
    a = per.select(
        F.col("et").alias("et_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
    )
    b = per.select(
        F.col("et").alias("et_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    pairs = a.join(b, F.col("et_a") < F.col("et_b")).select(
        "et_a",
        "et_b",
        F.expr(
            "CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b"
        ).alias("mean_diff"),
        "n_a",
        "n_b",
    )
    q_expr = (
        "ABS(mean_diff) / SQRT((ssw / (nn - k)) / 2.0"
        " * (1.0 / n_a + 1.0 / n_b))"
    )
    w = Window.orderBy(F.expr(q_expr).desc(), "et_a", "et_b")
    return (
        pairs.join(F.broadcast(msw))
        .select(
            "et_a",
            "et_b",
            F.round("mean_diff", 6).alias("mean_diff_cents"),
            F.round(F.expr(q_expr), 6).alias("q_stat"),
            F.expr("CAST(nn - k AS BIGINT)").alias("df_within"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


@register(
    "q507_anderson_darling",
    allow_non_equi=(
        "one 1-row integer-moment scalar crossJoin-attached onto the "
        "day relation to standardize before the ordered fold"
    ),
    oracle="""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yc) AS BIGINT) AS s,
             CAST(SUM(yc * yc) AS BIGINT) AS s2
      FROM d0
    ), z AS (
      SELECT d0.day,
             (CAST(d0.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
             / SQRT(GREATEST((CAST(m.s2 AS DOUBLE)
                    - CAST(m.s AS DOUBLE) * m.s / m.n) / (m.n - 1), 1e-12))
               AS z
      FROM d0, m
    ), ph AS (
      SELECT day, z, ABS(z) AS az,
             1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM z
    ), cdf AS (
      SELECT day, z,
             CASE WHEN z >= 0
                  THEN 1.0 - (EXP(-az * az / 2.0) / SQRT(2.0 * PI())) * (
                       0.319381530 * tt - 0.356563782 * tt * tt
                       + 1.781477937 * tt * tt * tt
                       - 1.821255978 * tt * tt * tt * tt
                       + 1.330274429 * tt * tt * tt * tt * tt)
                  ELSE (EXP(-az * az / 2.0) / SQRT(2.0 * PI())) * (
                       0.319381530 * tt - 0.356563782 * tt * tt
                       + 1.781477937 * tt * tt * tt
                       - 1.821255978 * tt * tt * tt * tt
                       + 1.330274429 * tt * tt * tt * tt * tt)
             END AS f
      FROM ph
    ), ranked AS (
      SELECT day, z, f,
             ROW_NUMBER() OVER (ORDER BY z, day) AS i,
             COUNT(*) OVER () AS n
      FROM cdf
    ), terms AS (
      SELECT z, day, n,
             (2.0 * i - 1.0) * LN(GREATEST(f, 1e-300))
             + (2.0 * (n - i) + 1.0) * LN(GREATEST(1.0 - f, 1e-300))
               AS term
      FROM ranked
    ), fold AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             list_reduce(list_prepend(0.0, list(term ORDER BY z, day)),
               (acc, x) -> acc + x) AS s
      FROM terms
    )
    SELECT n AS n_days,
           ROUND(-CAST(n AS DOUBLE) - s / n, 6) AS ad_stat,
           ROUND((-CAST(n AS DOUBLE) - s / n)
                 * (1.0 + 0.75 / n + 2.25 / (n * n)), 6) AS ad_stat_adjusted
    FROM fold
    """,
)
def q507_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X435 — ANDERSON–DARLING normality test of daily revenue: the
    tail-weighted EDF statistic A² = −n − (1/n)·Σ(2i−1)[ln F(z_(i)) +
    ln(1−F(z_(n+1−i)))], published with the Stephens small-sample
    adjustment A*² = A²(1 + 0.75/n + 2.25/n²) for the caller's critical-
    value lookup (the q503 convention). Complements the shelf's JB
    (q465, moment-based) and KS (q202, sup-norm): AD weights the EDF
    discrepancy by 1/(F(1−F)), so it is the most powerful of the three
    against TAIL departures — exactly where heavy-tailed revenue breaks
    normality first, and the right gate before the EVT fits (q501/q506)
    are trusted over a Gaussian one.

    Standardization uses exact integer day moments (n, Σy, Σy²); the
    normal CDF is the shelf's shared Abramowitz–Stegun 26.2.17
    polynomial (identical text in both engines); and the float term sum
    folds in (z, day) order — the q465/q448 fold discipline — so the
    result is bitwise portable.

    Scale: one day rollup, one |days|-row rank window, one |days|-array
    fold. Nothing touches raw-event grain after the first aggregation."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    m = d0.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("s2"),
    )
    z = d0.crossJoin(F.broadcast(m)).select(
        "day",
        (
            (
                F.col("yc").cast("double")
                - F.col("s").cast("double") / F.col("n")
            )
            / F.sqrt(
                F.greatest(
                    (
                        F.col("s2").cast("double")
                        - F.col("s").cast("double") * F.col("s") / F.col("n")
                    )
                    / (F.col("n") - 1),
                    F.lit(1e-12),
                )
            )
        ).alias("z"),
    )
    phi_poly = (
        "(EXP(-az * az / 2.0) / SQRT(2.0 * PI())) * ("
        "0.319381530 * tt - 0.356563782 * tt * tt"
        " + 1.781477937 * tt * tt * tt"
        " - 1.821255978 * tt * tt * tt * tt"
        " + 1.330274429 * tt * tt * tt * tt * tt)"
    )
    cdf = (
        z.withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
        .withColumn(
            "f",
            F.expr(
                f"CASE WHEN z >= 0 THEN 1.0 - {phi_poly}"
                f" ELSE {phi_poly} END"
            ),
        )
    )
    wr = Window.orderBy("z", "day")
    ranked = cdf.select(
        "day",
        "z",
        "f",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    terms = ranked.select(
        "z",
        "day",
        "n",
        F.expr(
            "(2.0 * i - 1.0) * LN(GREATEST(f, 1e-300))"
            " + (2.0 * (n - i) + 1.0) * LN(GREATEST(1.0 - f, 1e-300))"
        ).alias("term"),
    )
    fold = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("z", "day", "term"))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["term"],
        ).alias("s"),
    )
    return fold.select(
        F.col("n").alias("n_days"),
        F.round(
            F.expr("-CAST(n AS DOUBLE) - s / n"), 6
        ).alias("ad_stat"),
        F.round(
            F.expr(
                "(-CAST(n AS DOUBLE) - s / n)"
                " * (1.0 + 0.75 / n + 2.25 / (n * n))"
            ),
            6,
        ).alias("ad_stat_adjusted"),
    )


@register(
    "q509_cramer_von_mises",
    allow_non_equi=(
        "one 1-row x 1-row cross join assembling the per-group "
        "U-statistic totals with the picked type-name row"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY et, day
    ), pick AS (
      SELECT et, DENSE_RANK() OVER (ORDER BY et) AS rk
      FROM (SELECT DISTINCT et FROM d)
    ), s AS (
      SELECT p.rk AS grp, d.yc
      FROM d JOIN pick p USING (et) WHERE p.rk <= 2
    ), r AS (
      SELECT grp, yc,
             2 * RANK() OVER (ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY yc) - 1 AS r2,
             2 * RANK() OVER (PARTITION BY grp ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY grp, yc) - 1 AS i2
      FROM s
    ), g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((r2 - i2) * (r2 - i2)) AS BIGINT) AS sd
      FROM r GROUP BY grp
    ), u AS (
      SELECT CAST(MAX(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS na,
             CAST(MAX(CASE WHEN grp = 2 THEN n END) AS BIGINT) AS nb,
             CAST(MAX(CASE WHEN grp = 1 THEN sd END) AS BIGINT) AS sa,
             CAST(MAX(CASE WHEN grp = 2 THEN sd END) AS BIGINT) AS sb
      FROM g
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ta,
             MAX(CASE WHEN rk = 2 THEN et END) AS tb
      FROM pick WHERE rk <= 2
    )
    SELECT ta AS type_a, tb AS type_b, na AS n_a, nb AS n_b,
           CAST(na * sa + nb * sb AS BIGINT) AS cvm_u4,
           CAST(3 * (na * sa + nb * sb)
                - 2 * na * nb * (4 * na * nb - 1) AS BIGINT) AS cvm_t_num,
           CAST(12 * na * nb * (na + nb) AS BIGINT) AS cvm_t_den,
           CAST(3 * (na * sa + nb * sb)
                - 2 * na * nb * (4 * na * nb - 1) AS DOUBLE)
             / (12 * na * nb * (na + nb)) AS cvm_t
    FROM u CROSS JOIN names
    """,
)
def q509_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X437 — TWO-SAMPLE CRAMÉR–VON MISES test between the daily
    revenue distributions of the two lexicographically-first event
    types: T = U/(nm(n+m)) − (4nm−1)/(6(n+m)) with U = n·Σ(r_i−i)² +
    m·Σ(s_j−j)² over pooled midranks. The integral-squared complement
    of the shelf's KS (q202, sup-norm — sensitive to one big gap) and
    AD (q507, tail-weighted): CvM weighs the WHOLE EDF discrepancy
    equally, the right omnibus when two sources differ by many small
    shifts rather than one large one.

    The statistic is EXACT INTEGER until the final normalization: the
    midrank trick 2·midrank = 2·RANK() + tiecount − 1 keeps pooled and
    within-sample ranks in int64 (no float rank arithmetic, no ordered
    fold needed — Σ(r−i)² is order-independent integer math), so the
    result publishes as the exact int64 ``cvm_u4`` = 4U and the exact
    RATIONAL T = (3·4U − 2nm(4nm−1)) / (12nm(n+m)) as num/den int64
    columns; the ``cvm_t`` double is the single division of those two
    integers — no ROUND at all (a rational T can land exactly on a
    decimal .5 boundary, where engine ROUND semantics diverge — it did
    at sf0.01). Sample pick is deterministic: DENSE_RANK over names.

    Scale: day-grain from the first aggregation; the rank windows ride
    ~2·|days| rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    pick = (
        d.select("et")
        .distinct()
        .select("et", F.dense_rank().over(Window.orderBy("et")).alias("rk"))
    )
    s = d.join(pick, "et").where(F.col("rk") <= 2).select(
        F.col("rk").alias("grp"), "yc"
    )
    r = s.select(
        "grp",
        (
            2 * F.rank().over(Window.orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("yc"))
            - 1
        ).alias("r2"),
        (
            2 * F.rank().over(Window.partitionBy("grp").orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("grp", "yc"))
            - 1
        ).alias("i2"),
    )
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("r2") - F.col("i2")) * (F.col("r2") - F.col("i2"))
        ).cast("long").alias("sd"),
    )
    u = g.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).cast("long").alias("na"),
        F.max(F.when(F.col("grp") == 2, F.col("n"))).cast("long").alias("nb"),
        F.max(F.when(F.col("grp") == 1, F.col("sd"))).cast("long").alias("sa"),
        F.max(F.when(F.col("grp") == 2, F.col("sd"))).cast("long").alias("sb"),
    )
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ta"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tb"),
    )
    return u.crossJoin(F.broadcast(names)).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        (F.col("na") * F.col("sa") + F.col("nb") * F.col("sb"))
        .cast("long")
        .alias("cvm_u4"),
        F.expr(
            "CAST(3 * (na * sa + nb * sb)"
            " - 2 * na * nb * (4 * na * nb - 1) AS BIGINT)"
        ).alias("cvm_t_num"),
        F.expr("CAST(12 * na * nb * (na + nb) AS BIGINT)").alias(
            "cvm_t_den"
        ),
        F.expr(
            "CAST(3 * (na * sa + nb * sb)"
            " - 2 * na * nb * (4 * na * nb - 1) AS DOUBLE)"
            " / (12 * na * nb * (na + nb))"
        ).alias("cvm_t"),
    )


@register(
    "q512_brunner_munzel",
    allow_non_equi=(
        "one 1-row x 1-row cross join assembling the per-group exact "
        "integer rank moments with the picked type-name row"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY et, day
    ), pick AS (
      SELECT et, DENSE_RANK() OVER (ORDER BY et) AS rk
      FROM (SELECT DISTINCT et FROM d)
    ), s AS (
      SELECT p.rk AS grp, d.yc
      FROM d JOIN pick p USING (et) WHERE p.rk <= 2
    ), r AS (
      SELECT grp, yc,
             2 * RANK() OVER (ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY yc) - 1 AS r2,
             2 * RANK() OVER (PARTITION BY grp ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY grp, yc) - 1 AS i2
      FROM s
    ), gm AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2) AS BIGINT) AS sum_r2
      FROM r GROUP BY grp
    ), t AS (
      SELECT r.grp,
             gm.n * (r.r2 - r.i2 + gm.n + 1) - gm.sum_r2 AS tk
      FROM r JOIN gm USING (grp)
    ), st AS (
      SELECT grp, CAST(SUM(tk * tk) AS BIGINT) AS st2
      FROM t GROUP BY grp
    ), g AS (
      SELECT CAST(MAX(CASE WHEN gm.grp = 1 THEN gm.n END) AS BIGINT) AS n1,
             CAST(MAX(CASE WHEN gm.grp = 2 THEN gm.n END) AS BIGINT) AS n2,
             CAST(MAX(CASE WHEN gm.grp = 1 THEN gm.sum_r2 END) AS BIGINT)
               AS sr1,
             CAST(MAX(CASE WHEN gm.grp = 2 THEN gm.sum_r2 END) AS BIGINT)
               AS sr2,
             CAST(MAX(CASE WHEN st.grp = 1 THEN st.st2 END) AS BIGINT)
               AS st1,
             CAST(MAX(CASE WHEN st.grp = 2 THEN st.st2 END) AS BIGINT)
               AS st2
      FROM gm JOIN st USING (grp)
    ), f AS (
      SELECT n1, n2, st1, st2,
             CAST(sr1 AS DOUBLE) / (2 * n1) AS rb1,
             CAST(sr2 AS DOUBLE) / (2 * n2) AS rb2,
             CAST(st1 AS DOUBLE) / (4.0 * n1 * n1 * (n1 - 1)) AS s1sq,
             CAST(st2 AS DOUBLE) / (4.0 * n2 * n2 * (n2 - 1)) AS s2sq
      FROM g
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ta,
             MAX(CASE WHEN rk = 2 THEN et END) AS tb
      FROM pick WHERE rk <= 2
    )
    SELECT ta AS type_a, tb AS type_b,
           n1 AS n_a, n2 AS n_b,
           st1 AS t2sum_a, st2 AS t2sum_b,
           (rb2 - (CAST(n2 AS DOUBLE) + 1.0) / 2.0) / n1 AS p_hat,
           CAST(n1 AS DOUBLE) * n2 * (rb2 - rb1) / (n1 + n2)
             / SQRT(n1 * s1sq + n2 * s2sq) AS bm_stat,
           POW(n1 * s1sq + n2 * s2sq, 2.0)
             / (POW(n1 * s1sq, 2.0) / (n1 - 1)
                + POW(n2 * s2sq, 2.0) / (n2 - 1)) AS bm_df
    FROM f CROSS JOIN names
    """,
)
def q512_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X440 — BRUNNER–MUNZEL test between the daily revenue
    distributions of the two lexicographically-first event types: the
    modern replacement for Mann–Whitney U (q412) when the two
    distributions may differ in SHAPE/variance, not just location —
    MWU's null assumes exchangeability, BM tests the stochastic-
    equality functional p = P(X<Y) + ½P(X=Y) directly with a
    studentized statistic and Welch–Satterthwaite df (scipy's
    ``brunnermunzel`` formulation).

    The rank moments are EXACT int64 end-to-end via the q509 doubled-
    midrank trick: with T_k = n_i(r2_k − i2_k + n_i + 1) − Σr2 (pure
    integer), Σ T_k² carries the BM rank variance exactly and
    S_i² = ΣT²/(4n_i²(n_i−1)) falls out as one division — no float rank
    arithmetic, no ordered fold. The published doubles (p̂, W, df) are
    single closed-form expressions of those integers, identical text in
    both engines, deliberately UNROUNDED (the q509 lesson: rationals of
    small integers can land exactly on a decimal .5 where engine ROUND
    semantics diverge).

    Scale: day-grain after the first aggregation; rank windows ride
    ~2·|days| rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    pick = (
        d.select("et")
        .distinct()
        .select("et", F.dense_rank().over(Window.orderBy("et")).alias("rk"))
    )
    s = d.join(pick, "et").where(F.col("rk") <= 2).select(
        F.col("rk").alias("grp"), "yc"
    )
    r = s.select(
        "grp",
        (
            2 * F.rank().over(Window.orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("yc"))
            - 1
        ).alias("r2"),
        (
            2 * F.rank().over(Window.partitionBy("grp").orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("grp", "yc"))
            - 1
        ).alias("i2"),
    )
    gm = r.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2").cast("long").alias("sum_r2"),
    )
    t = r.join(gm, "grp").select(
        "grp",
        (
            F.col("n") * (F.col("r2") - F.col("i2") + F.col("n") + 1)
            - F.col("sum_r2")
        ).alias("tk"),
    )
    st = t.groupBy("grp").agg(
        F.sum(F.col("tk") * F.col("tk")).cast("long").alias("st2")
    )
    g = gm.join(st, "grp").agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("grp") == 2, F.col("n"))).cast("long").alias("n2"),
        F.max(F.when(F.col("grp") == 1, F.col("sum_r2")))
        .cast("long")
        .alias("sr1"),
        F.max(F.when(F.col("grp") == 2, F.col("sum_r2")))
        .cast("long")
        .alias("sr2"),
        F.max(F.when(F.col("grp") == 1, F.col("st2")))
        .cast("long")
        .alias("st1"),
        F.max(F.when(F.col("grp") == 2, F.col("st2")))
        .cast("long")
        .alias("st2"),
    )
    f = g.select(
        "n1",
        "n2",
        "st1",
        "st2",
        F.expr("CAST(sr1 AS DOUBLE) / (2 * n1)").alias("rb1"),
        F.expr("CAST(sr2 AS DOUBLE) / (2 * n2)").alias("rb2"),
        F.expr("CAST(st1 AS DOUBLE) / (4.0 * n1 * n1 * (n1 - 1))").alias(
            "s1sq"
        ),
        F.expr("CAST(st2 AS DOUBLE) / (4.0 * n2 * n2 * (n2 - 1))").alias(
            "s2sq"
        ),
    )
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ta"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tb"),
    )
    return f.crossJoin(F.broadcast(names)).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.col("st1").alias("t2sum_a"),
        F.col("st2").alias("t2sum_b"),
        F.expr(
            "(rb2 - (CAST(n2 AS DOUBLE) + 1.0) / 2.0) / n1"
        ).alias("p_hat"),
        F.expr(
            "CAST(n1 AS DOUBLE) * n2 * (rb2 - rb1) / (n1 + n2)"
            " / SQRT(n1 * s1sq + n2 * s2sq)"
        ).alias("bm_stat"),
        F.expr(
            "POW(n1 * s1sq + n2 * s2sq, 2.0)"
            " / (POW(n1 * s1sq, 2.0) / (n1 - 1)"
            " + POW(n2 * s2sq, 2.0) / (n2 - 1))"
        ).alias("bm_df"),
    )
