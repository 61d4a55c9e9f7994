"""Inference wave 2: serial-correlation portmanteau, exact small-table
tests, lag-causality, and ordinal-pattern complexity (round-10 module —
stats_tests.py is at its size budget).

Portability discipline (see _shared): every statistic is a closed-form
double over EXACT int64 moments with identical expression text in both
engines; any multi-row double reduction rides a deterministic ordered
fold (window running sum) instead of an order-sensitive SUM().

See _registry for the decorator; reference parity: the reference repo
has no statistics layer at all (its QA is athena_analysis_curated.sql
row counts), so this module is beyond-reference surface mandated by the
brief's training-data-pipeline analytics scope.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403

# Daily revenue in exact integer cents — the shared spine of this module.
# Day grain is the scale story: a 100 TB corpus still has O(days) rows
# after the first aggregation, so every downstream window/join here is
# bounded by the calendar, not the fact table.
_DAILY_CTE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY day
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )


# Ljung-Box autocovariance at lag k from exact integers: with S = sum(x),
# n = count, head/tail the partial sums of the overlapped prefix/suffix
# and m_k = sum(x_t * x_{t+k}), the mean-centered covariance is
#   c_k = m_k - (S/n) * (head + tail) + (n - k) * (S/n)^2
# — one closed-form double over int64s, identical text both engines.
_LB_CK = (
    "CAST(mk AS DOUBLE) - (CAST(s AS DOUBLE) / n) * (hk + tk)"
    " + (n - lag) * POW(CAST(s AS DOUBLE) / n, 2.0)"
)
_LB_C0 = "CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n"


@register(
    "q513_ljung_box",
    oracle=_DAILY_CTE
    + """
    , l AS (
      SELECT yc,
             LEAD(yc, 1) OVER w AS e1, LEAD(yc, 2) OVER w AS e2,
             LEAD(yc, 3) OVER w AS e3, LEAD(yc, 4) OVER w AS e4,
             LEAD(yc, 5) OVER w AS e5, LEAD(yc, 6) OVER w AS e6,
             LEAD(yc, 7) OVER w AS e7
      FROM d WINDOW w AS (ORDER BY day)
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yc) AS BIGINT) AS s,
             CAST(SUM(yc * yc) AS BIGINT) AS s2,
             CAST(SUM(yc * e1) AS BIGINT) AS m1,
             CAST(SUM(CASE WHEN e1 IS NOT NULL THEN yc END) AS BIGINT) AS h1,
             CAST(SUM(e1) AS BIGINT) AS t1,
             CAST(SUM(yc * e2) AS BIGINT) AS m2,
             CAST(SUM(CASE WHEN e2 IS NOT NULL THEN yc END) AS BIGINT) AS h2,
             CAST(SUM(e2) AS BIGINT) AS t2,
             CAST(SUM(yc * e3) AS BIGINT) AS m3,
             CAST(SUM(CASE WHEN e3 IS NOT NULL THEN yc END) AS BIGINT) AS h3,
             CAST(SUM(e3) AS BIGINT) AS t3,
             CAST(SUM(yc * e4) AS BIGINT) AS m4,
             CAST(SUM(CASE WHEN e4 IS NOT NULL THEN yc END) AS BIGINT) AS h4,
             CAST(SUM(e4) AS BIGINT) AS t4,
             CAST(SUM(yc * e5) AS BIGINT) AS m5,
             CAST(SUM(CASE WHEN e5 IS NOT NULL THEN yc END) AS BIGINT) AS h5,
             CAST(SUM(e5) AS BIGINT) AS t5,
             CAST(SUM(yc * e6) AS BIGINT) AS m6,
             CAST(SUM(CASE WHEN e6 IS NOT NULL THEN yc END) AS BIGINT) AS h6,
             CAST(SUM(e6) AS BIGINT) AS t6,
             CAST(SUM(yc * e7) AS BIGINT) AS m7,
             CAST(SUM(CASE WHEN e7 IS NOT NULL THEN yc END) AS BIGINT) AS h7,
             CAST(SUM(e7) AS BIGINT) AS t7
      FROM l
    ), u AS (
      SELECT CAST(1 AS BIGINT) AS lag, m1 AS mk, h1 AS hk, t1 AS tk,
             n, s, s2 FROM m
      UNION ALL SELECT 2, m2, h2, t2, n, s, s2 FROM m
      UNION ALL SELECT 3, m3, h3, t3, n, s, s2 FROM m
      UNION ALL SELECT 4, m4, h4, t4, n, s, s2 FROM m
      UNION ALL SELECT 5, m5, h5, t5, n, s, s2 FROM m
      UNION ALL SELECT 6, m6, h6, t6, n, s, s2 FROM m
      UNION ALL SELECT 7, m7, h7, t7, n, s, s2 FROM m
    ), r AS (
      SELECT lag, mk, hk, tk, n,
             ("""
    + _LB_CK
    + """) / ("""
    + _LB_C0
    + """) AS r_k
      FROM u
    )
    SELECT lag, mk, hk, tk, r_k,
           n * (n + 2.0) * SUM(POW(r_k, 2.0) / (n - lag)) OVER
             (ORDER BY lag ROWS UNBOUNDED PRECEDING) AS q_lb
    FROM r
    """,
)
def q513_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X441 — LJUNG-BOX portmanteau test of serial correlation in the
    daily-revenue series, lags 1..7: the standard "is this residual
    series white noise" gate (Box/Jenkins) that the existing
    autocorrelation surfaces (q162 daily autocorr, q257 ACF periodicity,
    q466 Durbin-Watson lag-1) stop short of — Q_LB accumulates ALL lags
    into one chi-square(k) statistic, so a weak-but-persistent
    correlation structure that no single lag flags still fails the test.

    Exactness: each lag-k autocovariance is recovered from four int64
    moments (m_k = Σ x_t·x_{t+k}, the overlapped head/tail partial sums,
    and the global S, Σx²) via one closed-form double with identical
    text in both engines — no float mean subtraction row-by-row. The
    Q_LB accumulation over lags is a deterministic ordered fold (window
    running sum over the 7-row lag table).

    Scale: one day-grain aggregation (O(days) rows after the first
    shuffle); the 7 LEAD columns and the lag table ride that tiny frame.
    Int64 headroom: daily cents ≤ ~2e8 at sf1, so Σ x_t·x_{t+k} ≤
    ~1.5e18 stays in-range; beyond that, quantize the spine to whole
    units upstream."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    leads = d.select(
        "yc", *[F.lead("yc", k).over(w).alias(f"e{k}") for k in range(1, 8)]
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("s2"),
    ]
    for k in range(1, 8):
        e = F.col(f"e{k}")
        aggs += [
            F.sum(F.col("yc") * e).cast("long").alias(f"m{k}"),
            F.sum(F.when(e.isNotNull(), F.col("yc")))
            .cast("long")
            .alias(f"h{k}"),
            F.sum(e).cast("long").alias(f"t{k}"),
        ]
    m = leads.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), m{k}, h{k}, t{k}" for k in range(1, 8)
    )
    u = m.select(
        F.expr(f"stack(7, {stack_args}) AS (lag, mk, hk, tk)"),
        "n",
        "s",
        "s2",
    )
    r = u.select(
        "lag",
        "mk",
        "hk",
        "tk",
        "n",
        F.expr(f"({_LB_CK}) / ({_LB_C0})").alias("r_k"),
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return r.select(
        "lag",
        "mk",
        "hk",
        "tk",
        "r_k",
        (
            F.expr("n * (n + 2.0)")
            * F.sum(F.expr("POW(r_k, 2.0) / (n - lag)")).over(wq)
        ).alias("q_lb"),
    )


@register(
    "q514_fisher_exact",
    allow_non_equi=(
        "1-row margin scalars broadcast onto the <=|days| hypergeometric "
        "support spine and the 1-row observed-cell probability broadcast "
        "back for the two-sided inclusion rule"
    ),
    oracle=_DAILY_CTE
    + """
    , g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(yc) AS BIGINT) AS tot FROM d
    ), cells AS (
      SELECT
        CAST(SUM(CASE WHEN (day - DATE '1970-01-01') % 7 IN (2, 3)
                       AND yc * nd > tot THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN (day - DATE '1970-01-01') % 7 IN (2, 3)
                       AND NOT yc * nd > tot THEN 1 ELSE 0 END) AS BIGINT)
          AS b,
        CAST(SUM(CASE WHEN NOT (day - DATE '1970-01-01') % 7 IN (2, 3)
                       AND yc * nd > tot THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT (day - DATE '1970-01-01') % 7 IN (2, 3)
                       AND NOT yc * nd > tot THEN 1 ELSE 0 END) AS BIGINT)
          AS dd
      FROM d CROSS JOIN g
    ), mrg AS (
      SELECT a, b, c, dd, a + b AS r1, a + c AS c1,
             a + b + c + dd AS n FROM cells
    ), lf AS (
      SELECT i,
             SUM(CASE WHEN i > 0 THEN LN(CAST(i AS DOUBLE)) ELSE 0.0 END)
               OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS lf
      FROM (SELECT UNNEST(generate_series(0, (SELECT n FROM mrg))) AS i)
    ), sup AS (
      SELECT m.*, k.i AS k
      FROM mrg m JOIN lf k
        ON k.i BETWEEN GREATEST(0, m.r1 + m.c1 - m.n)
                   AND LEAST(m.r1, m.c1)
    ), p AS (
      SELECT s.a, s.b, s.c, s.dd, s.n, s.k,
             EXP(lr1.lf + lr2.lf + lc1.lf + lc2.lf - ln_.lf
                 - lk.lf - lrk.lf - lck.lf - lnk.lf) AS pk
      FROM sup s
      JOIN lf lr1 ON lr1.i = s.r1
      JOIN lf lr2 ON lr2.i = s.n - s.r1
      JOIN lf lc1 ON lc1.i = s.c1
      JOIN lf lc2 ON lc2.i = s.n - s.c1
      JOIN lf ln_ ON ln_.i = s.n
      JOIN lf lk  ON lk.i = s.k
      JOIN lf lrk ON lrk.i = s.r1 - s.k
      JOIN lf lck ON lck.i = s.c1 - s.k
      JOIN lf lnk ON lnk.i = s.n - s.r1 - s.c1 + s.k
    ), obs AS (
      SELECT pk AS p_obs FROM p WHERE k = a
    ), fold AS (
      SELECT p.a, p.b, p.c, p.dd, p.n, p.k, p.pk, o.p_obs,
             SUM(CASE WHEN p.pk <= o.p_obs * (1.0 + 1e-7)
                      THEN p.pk ELSE 0.0 END)
               OVER (ORDER BY p.k ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CASE WHEN p.pk <= o.p_obs * (1.0 + 1e-7)
                      THEN 1 ELSE 0 END) OVER () AS n_inc,
             COUNT(*) OVER () AS n_sup
      FROM p CROSS JOIN obs o
    )
    SELECT a, b, c, dd AS d, n,
           CAST(n_sup AS BIGINT) AS support_size,
           CAST(n_inc AS BIGINT) AS n_included,
           p_obs AS p_point, MAX(cum) AS p_two_sided,
           CAST(a AS DOUBLE) * dd / (CAST(b AS DOUBLE) * c) AS odds_ratio
    FROM fold
    GROUP BY a, b, c, dd, n, n_sup, n_inc, p_obs
    """,
)
def q514_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X442 — FISHER EXACT TEST on the day-grain 2x2 table
    (weekend day? x above-mean-revenue day?): the exact small-sample
    companion to q143's asymptotic chi-square — at |days| cells the
    chi-square approximation is unreliable, and Fisher's hypergeometric
    enumeration is the textbook answer.

    Exactness levers: the "above mean" classification is the pure
    integer predicate yc * n_days > total (no float mean); weekday is
    the portable epoch-day (day − 1970-01-01) % 7 ∈ {2,3} (Sat/Sun) so
    neither engine's DOW numbering is trusted; log-factorials come from
    ONE deterministic prefix-sum fold over the 0..n spine (identical
    accumulation order in both engines), each point probability is a
    single EXP of 9 table lookups, and the two-sided p (scipy
    convention: sum of all pk ≤ p_obs·(1+1e-7)) is an ordered fold over
    the support, surfaced with an order-insensitive MAX of the monotone
    running sum.

    Scale: everything after the first aggregation is day-grain — the
    spine, support, and folds are O(days) forever, which is exactly the
    regime where the exact test (vs q143) is statistically needed."""
    d = _daily(spark, sf_dir)
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("yc").cast("long").alias("tot"),
    )
    wknd = "(DATEDIFF(day, DATE '1970-01-01')) % 7 IN (2, 3)"
    hi = "yc * nd > tot"
    cells = (
        d.crossJoin(F.broadcast(g))
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN {wknd} AND {hi} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("a"),
            F.expr(
                f"CAST(SUM(CASE WHEN {wknd} AND NOT {hi} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("b"),
            F.expr(
                f"CAST(SUM(CASE WHEN NOT {wknd} AND {hi} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("c"),
            F.expr(
                f"CAST(SUM(CASE WHEN NOT {wknd} AND NOT {hi} THEN 1 ELSE 0"
                " END) AS BIGINT)"
            ).alias("dd"),
        )
    )
    mrg = cells.select(
        "a",
        "b",
        "c",
        "dd",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("a") + F.col("c")).alias("c1"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("dd")).alias("n"),
    )
    lf = (
        mrg.select(F.explode(F.expr("sequence(0, n)")).alias("i"))
        .select(
            "i",
            F.sum(
                F.expr(
                    "CASE WHEN i > 0 THEN LN(CAST(i AS DOUBLE)) ELSE 0.0 END"
                )
            )
            .over(
                Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("lf"),
        )
    )
    sup = mrg.crossJoin(lf.withColumnRenamed("i", "k")).where(
        F.expr(
            "k BETWEEN GREATEST(0, r1 + c1 - n) AND LEAST(r1, c1)"
        )
    ).drop("lf")

    def lkp(alias, key_expr):
        return (
            lf.select(
                F.col("i").alias(f"{alias}_i"), F.col("lf").alias(alias)
            ),
            key_expr,
        )

    p = sup
    for alias, key in [
        ("lr1", "r1"),
        ("lr2", "n - r1"),
        ("lc1", "c1"),
        ("lc2", "n - c1"),
        ("lnn", "n"),
        ("lk", "k"),
        ("lrk", "r1 - k"),
        ("lck", "c1 - k"),
        ("lnk", "n - r1 - c1 + k"),
    ]:
        tbl, _ = lkp(alias, key)
        p = p.join(tbl, F.expr(f"{alias}_i = {key}")).drop(f"{alias}_i")
    p = p.select(
        "a",
        "b",
        "c",
        "dd",
        "n",
        "k",
        F.expr(
            "EXP(lr1 + lr2 + lc1 + lc2 - lnn - lk - lrk - lck - lnk)"
        ).alias("pk"),
    )
    obs = p.where(F.expr("k = a")).select(F.col("pk").alias("p_obs"))
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    fold = p.crossJoin(F.broadcast(obs)).select(
        "a",
        "b",
        "c",
        "dd",
        "n",
        "k",
        "pk",
        "p_obs",
        F.sum(
            F.expr(
                "CASE WHEN pk <= p_obs * (1.0 + 1e-7) THEN pk ELSE 0.0 END"
            )
        )
        .over(wk)
        .alias("cum"),
        F.sum(
            F.expr("CASE WHEN pk <= p_obs * (1.0 + 1e-7) THEN 1 ELSE 0 END")
        )
        .over(Window.partitionBy())
        .alias("n_inc"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sup"),
    )
    return fold.groupBy(
        "a", "b", "c", "dd", "n", "n_sup", "n_inc", "p_obs"
    ).agg(F.max("cum").alias("p_two_sided")).select(
        "a",
        "b",
        "c",
        F.col("dd").alias("d"),
        "n",
        F.col("n_sup").cast("long").alias("support_size"),
        F.col("n_inc").cast("long").alias("n_included"),
        F.col("p_obs").alias("p_point"),
        "p_two_sided",
        F.expr("CAST(a AS DOUBLE) * dd / (CAST(b AS DOUBLE) * c)").alias(
            "odds_ratio"
        ),
    )


# Granger closed forms (doubles over exact int64 centered moments).
_GR_EXPRS = """
    CAST(cyy1 AS DOUBLE) / cy1y1 AS beta_r,
    (CAST(cy1y1 AS DOUBLE) * cx1x1 - CAST(cy1x1 AS DOUBLE) * cy1x1)
      AS det_u,
    (CAST(cyy1 AS DOUBLE) * cx1x1 - CAST(cyx1 AS DOUBLE) * cy1x1)
      / (CAST(cy1y1 AS DOUBLE) * cx1x1 - CAST(cy1x1 AS DOUBLE) * cy1x1)
      AS beta_y1,
    (CAST(cyx1 AS DOUBLE) * cy1y1 - CAST(cyy1 AS DOUBLE) * cy1x1)
      / (CAST(cy1y1 AS DOUBLE) * cx1x1 - CAST(cy1x1 AS DOUBLE) * cy1x1)
      AS beta_x1,
    (CAST(cyy AS DOUBLE) - CAST(cyy1 AS DOUBLE) * cyy1 / cy1y1)
      / CAST(n AS DOUBLE) AS sse_r
"""

_GR_SSEU = (
    "(CAST(cyy AS DOUBLE) - beta_y1 * cyy1 - beta_x1 * cyx1)"
    " / CAST(n AS DOUBLE)"
)


@register(
    "q515_granger_lag1",
    allow_non_equi=(
        "one 1-row x 1-row cross join attaching the two picked type "
        "names to the single-row moment fold"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY et, day
    ), pick AS (
      SELECT et, DENSE_RANK() OVER (ORDER BY et) AS rk
      FROM (SELECT DISTINCT et FROM d)
    ), al AS (
      SELECT a.day, a.yc AS y, b.yc AS x
      FROM (SELECT d.day, d.yc FROM d JOIN pick p USING (et)
            WHERE p.rk = 1) a
      JOIN (SELECT d.day, d.yc FROM d JOIN pick p USING (et)
            WHERE p.rk = 2) b USING (day)
    ), lagd AS (
      SELECT y, LAG(y) OVER (ORDER BY day) AS y1,
             LAG(x) OVER (ORDER BY day) AS x1
      FROM al
    ), t AS (
      SELECT y, y1, x1 FROM lagd WHERE y1 IS NOT NULL
    ), mm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y1) AS BIGINT) AS sy1,
             CAST(SUM(x1) AS BIGINT) AS sx1,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(y1 * y1) AS BIGINT) AS sy1y1,
             CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
             CAST(SUM(y * y1) AS BIGINT) AS syy1,
             CAST(SUM(y * x1) AS BIGINT) AS syx1,
             CAST(SUM(y1 * x1) AS BIGINT) AS sy1x1
      FROM t
    ), cm AS (
      SELECT n,
             n * syy - sy * sy AS cyy,
             n * sy1y1 - sy1 * sy1 AS cy1y1,
             n * sx1x1 - sx1 * sx1 AS cx1x1,
             n * syy1 - sy * sy1 AS cyy1,
             n * syx1 - sy * sx1 AS cyx1,
             n * sy1x1 - sy1 * sx1 AS cy1x1
      FROM mm
    ), fit AS (
      SELECT n, cyy, cy1y1, cx1x1, cyy1, cyx1, cy1x1,
    """
    + _GR_EXPRS
    + """
      FROM cm
    ), fin AS (
      SELECT *, """
    + _GR_SSEU
    + """ AS sse_u FROM fit
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ty,
             MAX(CASE WHEN rk = 2 THEN et END) AS tx
      FROM pick WHERE rk <= 2
    )
    SELECT ty AS effect_type, tx AS cause_type, n,
           cyy, cy1y1, cx1x1, cyy1, cyx1, cy1x1,
           beta_r, beta_y1, beta_x1, sse_r, sse_u,
           (sse_r - sse_u) / (sse_u / (n - 3.0)) AS f_stat
    FROM fin CROSS JOIN names
    """,
)
def q515_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X443 — GRANGER CAUSALITY (lag-1) between the two
    lexicographically-first event types' daily revenue series: does
    yesterday's type-B revenue improve the AR(1) forecast of today's
    type-A revenue?  The restricted model y_t ~ y_{t-1} and the
    unrestricted y_t ~ y_{t-1} + x_{t-1} are both solved in CLOSED FORM
    (Cramer's rule on the 2x2 normal equations) from nine exact int64
    raw moments; the F statistic compares their SSEs.  Complements the
    symmetric lagged cross-correlation (q221) with the directional,
    regression-adjusted version.

    Exactness: centered moments c__ = n·S__ − S_·S_ stay int64 (daily
    cents ≤ 2e8 at sf1 → |c| ≤ ~1.5e18); only the final
    Cramer/SSE/F expressions are doubles, with identical text in both
    engines.  Aligned-day LAG defines t−1 as the previous COMMON
    observation day (documented convention; the day spine is contiguous
    here).

    Scale: two day-grain series joined on day; the moment fold is one
    1-row aggregate — O(days) forever."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    pick = (
        d.select("et")
        .distinct()
        .select("et", F.dense_rank().over(Window.orderBy("et")).alias("rk"))
    )
    a = (
        d.join(F.broadcast(pick.where("rk = 1")), "et")
        .select("day", F.col("yc").alias("y"))
    )
    b = (
        d.join(F.broadcast(pick.where("rk = 2")), "et")
        .select("day", F.col("yc").alias("x"))
    )
    al = a.join(b, "day")
    w = Window.orderBy("day")
    t = (
        al.select(
            "y",
            F.lag("y").over(w).alias("y1"),
            F.lag("x").over(w).alias("x1"),
        )
        .where(F.col("y1").isNotNull())
    )
    mm = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("y1").cast("long").alias("sy1"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"),
        F.sum(F.expr("y1 * y1")).cast("long").alias("sy1y1"),
        F.sum(F.expr("x1 * x1")).cast("long").alias("sx1x1"),
        F.sum(F.expr("y * y1")).cast("long").alias("syy1"),
        F.sum(F.expr("y * x1")).cast("long").alias("syx1"),
        F.sum(F.expr("y1 * x1")).cast("long").alias("sy1x1"),
    )
    cm = mm.select(
        "n",
        F.expr("n * syy - sy * sy").alias("cyy"),
        F.expr("n * sy1y1 - sy1 * sy1").alias("cy1y1"),
        F.expr("n * sx1x1 - sx1 * sx1").alias("cx1x1"),
        F.expr("n * syy1 - sy * sy1").alias("cyy1"),
        F.expr("n * syx1 - sy * sx1").alias("cyx1"),
        F.expr("n * sy1x1 - sy1 * sx1").alias("cy1x1"),
    )
    fit = cm.select("*", *[F.expr(e) for e in _split_select(_GR_EXPRS)])
    fin = fit.withColumn("sse_u", F.expr(_GR_SSEU))
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ty"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tx"),
    )
    return fin.crossJoin(F.broadcast(names)).select(
        F.col("ty").alias("effect_type"),
        F.col("tx").alias("cause_type"),
        "n",
        "cyy",
        "cy1y1",
        "cx1x1",
        "cyy1",
        "cyx1",
        "cy1x1",
        "beta_r",
        "beta_y1",
        "beta_x1",
        "sse_r",
        "sse_u",
        F.expr("(sse_r - sse_u) / (sse_u / (n - 3.0))").alias("f_stat"),
    )


def _split_select(block: str) -> list[str]:
    """Split a shared SELECT-list text block into its top-level
    comma-separated expressions (parens-aware), so the Spark side can
    apply the EXACT same expression text the oracle embeds."""
    out, depth, cur = [], 0, []
    for ch in block:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


@register(
    "q516_permutation_entropy",
    oracle=_DAILY_CTE
    + """
    , tri AS (
      SELECT yc AS a, LEAD(yc, 1) OVER w AS b, LEAD(yc, 2) OVER w AS c
      FROM d WINDOW w AS (ORDER BY day)
    ), pat AS (
      SELECT (CASE WHEN b < a THEN 1 ELSE 0 END)
           + (CASE WHEN c < a THEN 1 ELSE 0 END) * 2
           + (CASE WHEN c < b THEN 1 ELSE 0 END) * 4 AS code
      FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
    ), cnts AS (
      SELECT code, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS m
      FROM pat GROUP BY code
    ), h AS (
      SELECT code, cnt, m,
             CAST(cnt AS DOUBLE) / m AS p,
             -(CAST(cnt AS DOUBLE) / m) * LN(CAST(cnt AS DOUBLE) / m)
               AS neg_plnp,
             SUM(-(CAST(cnt AS DOUBLE) / m) * LN(CAST(cnt AS DOUBLE) / m))
               OVER (ORDER BY code ROWS UNBOUNDED PRECEDING) AS running
      FROM cnts
    )
    SELECT code, cnt, m, p, neg_plnp, running,
           MAX(running) OVER () AS h_total,
           MAX(running) OVER () / LN(6.0) AS h_norm
    FROM h
    """,
)
def q516_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X444 — PERMUTATION ENTROPY (Bandt-Pompe, order 3) of the daily
    revenue series: the distribution of ordinal patterns of embedded
    triples (x_t, x_{t+1}, x_{t+2}) and its normalized Shannon entropy
    — a noise-robust complexity measure (near 1 = white noise, low =
    deterministic structure) that complements the magnitude-based
    Hurst exponent (q462) with a purely ORDINAL lens.

    Patterns are encoded by three exact integer comparisons (ties break
    toward the earlier index, the standard convention), so the 3-bit
    code is engine-exact; the ≤6-term entropy sum rides a deterministic
    ordered fold with the total surfaced via an order-insensitive MAX
    of the monotone running sum.

    Scale: day-grain after one aggregation; two LEADs and a ≤6-row
    group — O(days) forever."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    tri = d.select(
        F.col("yc").alias("a"),
        F.lead("yc", 1).over(w).alias("b"),
        F.lead("yc", 2).over(w).alias("c"),
    )
    pat = tri.where("b IS NOT NULL AND c IS NOT NULL").select(
        F.expr(
            "(CASE WHEN b < a THEN 1 ELSE 0 END)"
            " + (CASE WHEN c < a THEN 1 ELSE 0 END) * 2"
            " + (CASE WHEN c < b THEN 1 ELSE 0 END) * 4"
        ).alias("code")
    )
    cnts = pat.groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).select(
        "code",
        "cnt",
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("m"),
    )
    wc = Window.orderBy("code").rowsBetween(Window.unboundedPreceding, 0)
    h = cnts.select(
        "code",
        "cnt",
        "m",
        F.expr("CAST(cnt AS DOUBLE) / m").alias("p"),
        F.expr(
            "-(CAST(cnt AS DOUBLE) / m) * LN(CAST(cnt AS DOUBLE) / m)"
        ).alias("neg_plnp"),
        F.sum(
            F.expr(
                "-(CAST(cnt AS DOUBLE) / m) * LN(CAST(cnt AS DOUBLE) / m)"
            )
        )
        .over(wc)
        .alias("running"),
    )
    return h.select(
        "code",
        "cnt",
        "m",
        "p",
        "neg_plnp",
        "running",
        F.max("running").over(Window.partitionBy()).alias("h_total"),
        (F.max("running").over(Window.partitionBy()) / F.expr("LN(6.0)"))
        .alias("h_norm"),
    )


@register(
    "q520_somers_d_gamma",
    allow_non_equi=(
        "bounded 240x240 (hour x value-band) contingency-cell pair "
        "enumeration plus the 1-row tie-count scalar attach; both sides "
        "are fixed-size regardless of corpus scale"
    ),
    oracle="""
    WITH cells AS (
      SELECT CAST(hour(ts) AS BIGINT) AS x,
             LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000, 9)
               AS y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY x, y
    ), pairs AS (
      SELECT
        CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
        CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y < b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tx_only,
        CAST(SUM(CASE WHEN a.y = b.y AND a.x < b.x
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS ty_only
      FROM cells a CROSS JOIN cells b
    ), same AS (
      SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS txy,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM cells
    )
    SELECT c_pairs, d_pairs, tx_only, ty_only, txy, n_rows,
           CAST(c_pairs - d_pairs AS DOUBLE) / (c_pairs + d_pairs)
             AS gamma,
           CAST(c_pairs - d_pairs AS DOUBLE)
             / (c_pairs + d_pairs + ty_only) AS somers_d_yx,
           CAST(c_pairs - d_pairs AS DOUBLE)
             / (c_pairs + d_pairs + tx_only) AS somers_d_xy,
           CAST(c_pairs - d_pairs AS DOUBLE)
             / SQRT(CAST(c_pairs + d_pairs + tx_only AS DOUBLE)
                    * (c_pairs + d_pairs + ty_only)) AS tau_b
    FROM pairs CROSS JOIN same
    """,
)
def q520_somers_d_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X448 — ORDINAL ASSOCIATION panel (Goodman-Kruskal gamma, Somers'
    D both directions, Kendall tau-b) between hour-of-day and the
    event-value band: the full concordant/discordant-pair decomposition
    (C, D, ties on X only, Y only, both) published as exact int64s, so
    every coefficient is one closed-form double over integers.  Somers'
    d_yx is THE effect size for "does value rank increase with hour" —
    asymmetric, unlike q287's Spearman — and the published pair counts
    let a reader derive any other ordinal coefficient for free.

    Exactness: pair counts come from the bounded 24x10 contingency
    table — an ordered cell-pair enumeration (a.x < b.x counts each
    unordered pair exactly once), all int64 (cell products ≤ ~1e16 at
    sf1).  The within-cell tie term n(n−1)//2 is exact integer
    division.

    Scale: ONE map-side-combining aggregation to ≤240 cells; the
    240×240 pair enumeration is constant work regardless of corpus
    size — this is how rank statistics survive 100 TB (same design as
    q382/q412)."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("CAST(hour(ts) AS BIGINT)").alias("x"),
        F.expr(
            "LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 5000, 9)"
        ).alias("y"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("n").alias("an")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("n").alias("bn")
    )
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.expr(
                "CASE WHEN ax < bx AND ay < by THEN an * bn ELSE 0 END"
            )
        ).cast("long").alias("c_pairs"),
        F.sum(
            F.expr(
                "CASE WHEN ax < bx AND ay > by THEN an * bn ELSE 0 END"
            )
        ).cast("long").alias("d_pairs"),
        F.sum(
            F.expr(
                "CASE WHEN ax = bx AND ay < by THEN an * bn ELSE 0 END"
            )
        ).cast("long").alias("tx_only"),
        F.sum(
            F.expr(
                "CASE WHEN ay = by AND ax < bx THEN an * bn ELSE 0 END"
            )
        ).cast("long").alias("ty_only"),
    )
    same = cells.agg(
        F.sum(F.expr("n * (n - 1) DIV 2")).cast("long").alias("txy"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return pairs.crossJoin(F.broadcast(same)).select(
        "c_pairs",
        "d_pairs",
        "tx_only",
        "ty_only",
        "txy",
        "n_rows",
        F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE) / (c_pairs + d_pairs)"
        ).alias("gamma"),
        F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE)"
            " / (c_pairs + d_pairs + ty_only)"
        ).alias("somers_d_yx"),
        F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE)"
            " / (c_pairs + d_pairs + tx_only)"
        ).alias("somers_d_xy"),
        F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE)"
            " / SQRT(CAST(c_pairs + d_pairs + tx_only AS DOUBLE)"
            " * (c_pairs + d_pairs + ty_only))"
        ).alias("tau_b"),
    )


# Indexed daily series: deterministic 0-based day index + global count.
_IDX_CTE = _DAILY_CTE + """
    , ix AS (
      SELECT day, yc,
             CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d
    )
"""


def _ix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily(spark, sf_dir)
    return d.select(
        "day",
        "yc",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )


@register(
    "q524_breusch_pagan",
    allow_non_equi=(
        "1-row OLS-coefficient scalars broadcast back onto the day-grain "
        "series for residual computation, and the 1-row final fold"
    ),
    oracle=_IDX_CTE
    + """
    , mo AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(t * yc) AS BIGINT) AS sty
      FROM ix
    ), co AS (
      SELECT n, st, stt, sy, sty,
             (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b
      FROM mo
    ), co2 AS (
      SELECT *, (CAST(sy AS DOUBLE) - b * st) / n AS a FROM co
    ), res AS (
      SELECT ix.t, ix.n, co2.st, co2.stt,
             (ix.yc - co2.a - co2.b * ix.t)
               * (ix.yc - co2.a - co2.b * ix.t) AS u
      FROM ix CROSS JOIN co2
    ), fold AS (
      SELECT t, n, st, stt,
             SUM(u) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS su,
             SUM(u * t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sut,
             SUM(u * u) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS suu
      FROM res
    ), fin AS (
      SELECT n, su, sut, suu,
             POW(n * sut - su * st, 2.0)
               / ((n * suu - su * su)
                  * (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st))
               AS r2_aux
      FROM fold WHERE t = n - 1
    )
    SELECT n, su AS sum_u, sut AS sum_ut, suu AS sum_uu, r2_aux,
           n * r2_aux AS lm_stat
    FROM fin
    """,
)
def q524_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X452 — BREUSCH-PAGAN heteroskedasticity test of the daily-revenue
    trend regression: OLS y~t in closed form from int64 moments, then
    the LM statistic n·R² of the auxiliary regression of SQUARED
    residuals on t.  A significant LM means revenue VARIANCE drifts
    over the window — exactly the condition under which q234's linear
    forecast intervals and q317's backtests are mis-calibrated, so this
    is their diagnostic gate.

    Exactness: slope/intercept are closed-form doubles over exact int64
    (t, y) moments; per-day squared residuals are deterministic doubles
    (identical expression text), and the auxiliary moments Σu, Σut, Σu²
    ride ONE deterministic ordered fold over the day index (the q507
    pattern) — no order-sensitive double SUM anywhere.

    Scale: day-grain after one aggregation; the fold is a single-
    partition window over O(days) rows, constant at any corpus size."""
    ix = _ix(spark, sf_dir)
    mo = ix.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.expr("t * t")).cast("long").alias("stt"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.expr("t * yc")).cast("long").alias("sty"),
    )
    co = mo.select(
        "*",
        F.expr(
            "(CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)"
            " / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)"
        ).alias("b"),
    )
    co2 = co.select("*", F.expr("(CAST(sy AS DOUBLE) - b * st) / n").alias("a"))
    res = ix.crossJoin(F.broadcast(co2.select("st", "stt", "a", "b"))).select(
        "t",
        "n",
        "st",
        "stt",
        F.expr(
            "(yc - a - b * t) * (yc - a - b * t)"
        ).alias("u"),
    )
    wf = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    fold = res.select(
        "t",
        "n",
        "st",
        "stt",
        F.sum("u").over(wf).alias("su"),
        F.sum(F.expr("u * t")).over(wf).alias("sut"),
        F.sum(F.expr("u * u")).over(wf).alias("suu"),
    )
    fin = fold.where("t = n - 1").select(
        "n",
        "su",
        "sut",
        "suu",
        F.expr(
            "POW(n * sut - su * st, 2.0)"
            " / ((n * suu - su * su)"
            " * (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st))"
        ).alias("r2_aux"),
    )
    return fin.select(
        "n",
        F.col("su").alias("sum_u"),
        F.col("sut").alias("sum_ut"),
        F.col("suu").alias("sum_uu"),
        "r2_aux",
        F.expr("n * r2_aux").alias("lm_stat"),
    )


_CHOW_SSE = (
    "(CAST(cyy{s} AS DOUBLE)"
    " - CAST(cty{s} AS DOUBLE) * cty{s} / ctt{s}) / n{s}"
)


@register(
    "q525_chow_test",
    oracle=_IDX_CTE
    + """
    , seg AS (
      SELECT t, yc, n, CASE WHEN t < n // 2 THEN 1 ELSE 2 END AS s
      FROM ix
    ), sm AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(t * yc) AS BIGINT) AS sty,
             CAST(SUM(yc * yc) AS BIGINT) AS syy
      FROM seg GROUP BY s
    ), g AS (
      SELECT
        CAST(SUM(ns) AS BIGINT) AS n,
        CAST(MAX(CASE WHEN s = 1 THEN ns END) AS BIGINT) AS n1,
        CAST(MAX(CASE WHEN s = 2 THEN ns END) AS BIGINT) AS n2,
        CAST(MAX(CASE WHEN s = 1 THEN ns * stt - st * st END) AS BIGINT)
          AS ctt1,
        CAST(MAX(CASE WHEN s = 2 THEN ns * stt - st * st END) AS BIGINT)
          AS ctt2,
        CAST(MAX(CASE WHEN s = 1 THEN ns * sty - st * sy END) AS BIGINT)
          AS cty1,
        CAST(MAX(CASE WHEN s = 2 THEN ns * sty - st * sy END) AS BIGINT)
          AS cty2,
        CAST(MAX(CASE WHEN s = 1 THEN ns * syy - sy * sy END) AS BIGINT)
          AS cyy1,
        CAST(MAX(CASE WHEN s = 2 THEN ns * syy - sy * sy END) AS BIGINT)
          AS cyy2,
        CAST(SUM(st) AS BIGINT) AS pst,
        CAST(SUM(stt) AS BIGINT) AS pstt,
        CAST(SUM(sy) AS BIGINT) AS psy,
        CAST(SUM(sty) AS BIGINT) AS psty,
        CAST(SUM(syy) AS BIGINT) AS psyy
      FROM sm
    ), f AS (
      SELECT n, n1, n2, ctt1, ctt2, cty1, cty2, cyy1, cyy2,
             (CAST(n * psyy - psy * psy AS DOUBLE)
              - CAST(n * psty - pst * psy AS DOUBLE)
                * (n * psty - pst * psy)
                / (n * pstt - pst * pst)) / n AS sse_p,
             """
    + _CHOW_SSE.format(s="1")
    + """ AS sse_1,
             """
    + _CHOW_SSE.format(s="2")
    + """ AS sse_2
      FROM g
    )
    SELECT n, n1, n2, cyy1, cyy2, sse_p, sse_1, sse_2,
           ((sse_p - sse_1 - sse_2) / 2.0)
             / ((sse_1 + sse_2) / (n - 4.0)) AS f_stat
    FROM f
    """,
)
def q525_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X453 — CHOW TEST for a structural break at the window midpoint:
    fit y~t over the full span and over each half, compare SSEs with
    the classic F((SSE_p − SSE_1 − SSE_2)/2, (SSE_1+SSE_2)/(n−4)).
    The KNOWN-breakpoint hypothesis test that complements q492's
    broken-stick SEARCH (which finds the best breakpoint but gives no
    test) and q208's CUSUM (which detects level shifts, not slope
    changes).

    Exactness: per-segment centered moments are pure int64
    (n·S__ − S_·S_); the three SSEs and F are closed-form doubles with
    identical text.  No folds needed — this one is moments-only.

    Scale: day-grain; one aggregation to 2 segment rows, then a 1-row
    closed form."""
    ix = _ix(spark, sf_dir)
    seg = ix.select(
        "t", "yc", "n",
        F.expr("CASE WHEN t < n DIV 2 THEN 1 ELSE 2 END").alias("s"),
    )
    sm = seg.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.expr("t * t")).cast("long").alias("stt"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.expr("t * yc")).cast("long").alias("sty"),
        F.sum(F.expr("yc * yc")).cast("long").alias("syy"),
    )
    g = sm.agg(
        F.sum("ns").cast("long").alias("n"),
        F.max(F.when(F.col("s") == 1, F.col("ns"))).cast("long").alias("n1"),
        F.max(F.when(F.col("s") == 2, F.col("ns"))).cast("long").alias("n2"),
        F.max(F.when(F.col("s") == 1, F.expr("ns * stt - st * st")))
        .cast("long")
        .alias("ctt1"),
        F.max(F.when(F.col("s") == 2, F.expr("ns * stt - st * st")))
        .cast("long")
        .alias("ctt2"),
        F.max(F.when(F.col("s") == 1, F.expr("ns * sty - st * sy")))
        .cast("long")
        .alias("cty1"),
        F.max(F.when(F.col("s") == 2, F.expr("ns * sty - st * sy")))
        .cast("long")
        .alias("cty2"),
        F.max(F.when(F.col("s") == 1, F.expr("ns * syy - sy * sy")))
        .cast("long")
        .alias("cyy1"),
        F.max(F.when(F.col("s") == 2, F.expr("ns * syy - sy * sy")))
        .cast("long")
        .alias("cyy2"),
        F.sum("st").cast("long").alias("pst"),
        F.sum("stt").cast("long").alias("pstt"),
        F.sum("sy").cast("long").alias("psy"),
        F.sum("sty").cast("long").alias("psty"),
        F.sum("syy").cast("long").alias("psyy"),
    )
    f = g.select(
        "n", "n1", "n2", "ctt1", "ctt2", "cty1", "cty2", "cyy1", "cyy2",
        F.expr(
            "(CAST(n * psyy - psy * psy AS DOUBLE)"
            " - CAST(n * psty - pst * psy AS DOUBLE)"
            " * (n * psty - pst * psy)"
            " / (n * pstt - pst * pst)) / n"
        ).alias("sse_p"),
        F.expr(_CHOW_SSE.format(s="1")).alias("sse_1"),
        F.expr(_CHOW_SSE.format(s="2")).alias("sse_2"),
    )
    return f.select(
        "n", "n1", "n2", "cyy1", "cyy2", "sse_p", "sse_1", "sse_2",
        F.expr(
            "((sse_p - sse_1 - sse_2) / 2.0)"
            " / ((sse_1 + sse_2) / (n - 4.0))"
        ).alias("f_stat"),
    )


@register(
    "q526_friedman_test",
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY et, day
    ), kk AS (
      SELECT CAST(COUNT(DISTINCT et) AS BIGINT) AS k FROM d
    ), comp AS (
      SELECT d.day FROM d CROSS JOIN kk
      GROUP BY d.day, kk.k HAVING COUNT(*) = MAX(kk.k)
    ), cd AS (
      SELECT d.et, d.day, d.yc FROM d JOIN comp USING (day)
    ), r AS (
      SELECT et, day, yc,
             2 * RANK() OVER (PARTITION BY day ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY day, yc) - 1 AS r2
      FROM cd
    ), ties AS (
      SELECT CAST(SUM(tt * tt * tt - tt) AS BIGINT) AS tsum
      FROM (SELECT COUNT(*) AS tt FROM cd GROUP BY day, yc)
    ), pt AS (
      SELECT et, CAST(SUM(r2) AS BIGINT) AS r2sum,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM r GROUP BY et
    ), gl AS (
      SELECT CAST(SUM(r2sum * r2sum) AS BIGINT) AS srq,
             CAST(MAX(n_days) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM pt
    ), st AS (
      SELECT srq, n, k, t.tsum,
             (12.0 * CAST(srq AS DOUBLE) / (4.0 * n * k * (k + 1))
              - 3.0 * CAST(n AS DOUBLE) * (k + 1))
               / (1.0 - CAST(t.tsum AS DOUBLE) / (n * k * (k * k - 1)))
               AS chi2_adj
      FROM gl CROSS JOIN ties t
    )
    SELECT p.et AS event_type, p.r2sum, p.n_days,
           s.tsum, s.chi2_adj,
           (CAST(s.n AS DOUBLE) - 1.0) * s.chi2_adj
             / (s.n * (s.k - 1) - s.chi2_adj) AS imandav_f
    FROM pt p CROSS JOIN st s
    """,
    allow_non_equi=(
        "1-row global-statistic scalars (k, tie sum, chi2) cross-joined "
        "onto the <=|event types| per-treatment rank rows"
    ),
)
def q526_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X454 — FRIEDMAN TEST (with tie correction and the Iman-Davenport
    F transform): days are blocks, event types are treatments, daily
    revenue is ranked WITHIN each complete day — the nonparametric
    repeated-measures ANOVA asking "do the types rank consistently
    across days?".  Kendall's W (q442) is this statistic's effect-size
    normalization; this query publishes the TEST with the tie-corrected
    χ² and the small-sample F form the W query lacks.

    Exactness: within-day ranks use the q509/q512 doubled-midrank trick
    (pure integers), per-type rank sums and the tie term Σ(t³−t) are
    exact int64, and the χ²/F are single closed-form doubles.  Only
    complete blocks (days observing every type) enter, the standard
    Friedman requirement.

    Scale: (type, day) grain after one aggregation; rank windows ride
    per-day partitions of k rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    kk = d.agg(F.countDistinct("et").cast("long").alias("k"))
    comp = (
        d.crossJoin(F.broadcast(kk))
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .where("c = k")
        .select("day")
    )
    cd = d.join(comp, "day")
    r = cd.select(
        "et",
        "day",
        "yc",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("day", "yc"))
            - 1
        ).alias("r2"),
    )
    ties = (
        cd.groupBy("day", "yc")
        .agg(F.count(F.lit(1)).alias("tt"))
        .agg(F.sum(F.expr("tt * tt * tt - tt")).cast("long").alias("tsum"))
    )
    pt = r.groupBy("et").agg(
        F.sum("r2").cast("long").alias("r2sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    gl = pt.agg(
        F.sum(F.expr("r2sum * r2sum")).cast("long").alias("srq"),
        F.max("n_days").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    st = gl.crossJoin(F.broadcast(ties)).select(
        "srq",
        "n",
        "k",
        "tsum",
        F.expr(
            "(12.0 * CAST(srq AS DOUBLE) / (4.0 * n * k * (k + 1))"
            " - 3.0 * CAST(n AS DOUBLE) * (k + 1))"
            " / (1.0 - CAST(tsum AS DOUBLE) / (n * k * (k * k - 1)))"
        ).alias("chi2_adj"),
    )
    return pt.crossJoin(F.broadcast(st)).select(
        F.col("et").alias("event_type"),
        "r2sum",
        "n_days",
        "tsum",
        "chi2_adj",
        F.expr(
            "(CAST(n AS DOUBLE) - 1.0) * chi2_adj"
            " / (n * (k - 1) - chi2_adj)"
        ).alias("imandav_f"),
    )


@register(
    "q527_sample_entropy",
    allow_non_equi=(
        "bounded day-grain template pair enumeration (i < j over the "
        "daily series; O(days^2) with days calendar-bounded at any "
        "corpus scale) plus the 1-row tolerance scalar broadcast"
    ),
    oracle=_IDX_CTE
    + """
    , tpl AS (
      SELECT t, yc,
             LEAD(yc, 1) OVER (ORDER BY t) AS y1,
             LEAD(yc, 2) OVER (ORDER BY t) AS y2,
             n
      FROM ix
    ), tm AS (
      SELECT t, yc, y1, y2 FROM tpl WHERE t <= n - 3
    ), rr AS (
      SELECT SQRT((CAST(MAX(n) AS DOUBLE) * SUM(yc * yc)
                   - CAST(SUM(yc) AS DOUBLE) * SUM(yc))
                  / (CAST(MAX(n) AS DOUBLE) * MAX(n))) * 0.2 AS r,
             CAST(MAX(n) AS BIGINT) AS n
      FROM ix
    ), pairs AS (
      SELECT
        CAST(SUM(CASE WHEN ABS(a.yc - b.yc) <= rr.r
                       AND ABS(a.y1 - b.y1) <= rr.r
                      THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
        CAST(SUM(CASE WHEN ABS(a.yc - b.yc) <= rr.r
                       AND ABS(a.y1 - b.y1) <= rr.r
                       AND ABS(a.y2 - b.y2) <= rr.r
                      THEN 1 ELSE 0 END) AS BIGINT) AS a_count,
        MAX(rr.r) AS r, MAX(rr.n) AS n
      FROM tm a JOIN tm b ON a.t < b.t CROSS JOIN rr
    )
    SELECT n, r, b_count, a_count,
           CASE WHEN a_count > 0
                THEN -LN(CAST(a_count AS DOUBLE) / b_count) END AS sampen
    FROM pairs
    """,
)
def q527_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X455 — SAMPLE ENTROPY (Richman-Moorman, m=2, r=0.2σ) of the
    daily-revenue series: the fraction of length-2 template matches
    that remain matches at length 3, −ln(A/B) — the regularity measure
    that complements q516's ordinal permutation entropy with a
    MAGNITUDE-tolerance lens (SampEn is the standard irregularity
    score in physiological/ops time series).

    Exactness: the tolerance r = 0.2σ is one closed-form double from
    exact int64 moments (population σ), template comparisons are
    |int − int| ≤ r with both engines computing the identical r, so
    every match decision is deterministic; A and B are exact integer
    pair counts and SampEn is a single closed form.  Both A and B
    count over the same template index set i,j ≤ n−2 (the R&M
    convention), so A ≤ B by construction.

    Scale: the pair enumeration is day-grain (O(days²) with the day
    count calendar-bounded — a decade of days is ~3.7k rows, ~7M
    pairs), the same bounded-quadratic regime as the q26-style oracle
    anchors but on a spine that CANNOT grow with corpus size."""
    ix = _ix(spark, sf_dir)
    w = Window.orderBy("t")
    tpl = ix.select(
        "t",
        "yc",
        F.lead("yc", 1).over(w).alias("y1"),
        F.lead("yc", 2).over(w).alias("y2"),
        "n",
    )
    tm = tpl.where("t <= n - 3").select("t", "yc", "y1", "y2")
    rr = ix.agg(
        F.expr(
            "SQRT((CAST(MAX(n) AS DOUBLE) * SUM(yc * yc)"
            " - CAST(SUM(yc) AS DOUBLE) * SUM(yc))"
            " / (CAST(MAX(n) AS DOUBLE) * MAX(n))) * 0.2"
        ).alias("r"),
        F.max("n").cast("long").alias("n"),
    )
    a = tm.select(
        F.col("t").alias("at"), F.col("yc").alias("ax"),
        F.col("y1").alias("ay"), F.col("y2").alias("az"),
    )
    b = tm.select(
        F.col("t").alias("bt"), F.col("yc").alias("bx"),
        F.col("y1").alias("by"), F.col("y2").alias("bz"),
    )
    pairs = (
        a.join(b, F.col("at") < F.col("bt"))
        .crossJoin(F.broadcast(rr))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN ABS(ax - bx) <= r AND ABS(ay - by) <= r"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("long").alias("b_count"),
            F.sum(
                F.expr(
                    "CASE WHEN ABS(ax - bx) <= r AND ABS(ay - by) <= r"
                    " AND ABS(az - bz) <= r THEN 1 ELSE 0 END"
                )
            ).cast("long").alias("a_count"),
            F.max("r").alias("r"),
            F.max("n").alias("n"),
        )
    )
    return pairs.select(
        "n",
        "r",
        "b_count",
        "a_count",
        F.expr(
            "CASE WHEN a_count > 0"
            " THEN -LN(CAST(a_count AS DOUBLE) / b_count) END"
        ).alias("sampen"),
    )


@register(
    "q528_jonckheere_terpstra",
    allow_non_equi=(
        "ordered-band cell-pair enumeration: both operands are the "
        "(6-hour band x daily-revenue-value) cell table, day-grain "
        "bounded (~|days| rows per band) at any corpus scale"
    ),
    oracle="""
    WITH d AS (
      SELECT CAST(hour(ts) // 6 AS BIGINT) AS band, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY band, day
    ), cells AS (
      SELECT band, yc, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d GROUP BY band, yc
    ), gn AS (
      SELECT band, CAST(SUM(cnt) AS BIGINT) AS ns FROM cells GROUP BY band
    ), j AS (
      SELECT CAST(SUM(a.cnt * b.cnt *
                      (2 * CASE WHEN a.yc < b.yc THEN 1 ELSE 0 END
                       + CASE WHEN a.yc = b.yc THEN 1 ELSE 0 END))
                  AS BIGINT) AS j2
      FROM cells a JOIN cells b ON a.band < b.band
    ), g AS (
      SELECT CAST(SUM(ns) AS BIGINT) AS n,
             CAST(SUM(ns * ns) AS BIGINT) AS sn2,
             CAST(SUM(ns * ns * (2 * ns + 3)) AS BIGINT) AS sn23,
             CAST(COUNT(*) AS BIGINT) AS n_bands
      FROM gn
    )
    SELECT g.n, g.n_bands, j.j2,
           (CAST(g.n AS DOUBLE) * g.n - g.sn2) / 4.0 AS e_j,
           (CAST(g.n AS DOUBLE) * g.n * (2 * g.n + 3) - g.sn23) / 72.0
             AS var_j,
           (j.j2 / 2.0 - (CAST(g.n AS DOUBLE) * g.n - g.sn2) / 4.0)
             / SQRT((CAST(g.n AS DOUBLE) * g.n * (2 * g.n + 3) - g.sn23)
                    / 72.0) AS z
    FROM j CROSS JOIN g
    """,
)
def q528_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X456 — JONCKHEERE-TERPSTRA ordered-alternative test: do daily
    revenues stochastically INCREASE across the four ordered six-hour
    bands of the day?  The k-sample generalization of Mann-Whitney
    (q412) against an ORDERED alternative — strictly more powerful than
    Kruskal-Wallis (q448) when the hypothesis has a direction, which is
    exactly the "later hours earn more" question q490's
    Cochran-Armitage asks for proportions.

    Exactness: J is assembled as the doubled count J2 = 2·#{x<y} + #{=}
    over between-band cell pairs ((band, value, count) grain — pure
    int64), and the null mean/variance are the closed-form no-ties
    moments of exact group counts; tie pairs are visible in J2's parity.

    Scale: cells are day-grain per band (calendar-bounded); the ordered
    band-pair enumeration is a join on band order over those bounded
    cell tables — constant work at any corpus size."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("CAST(hour(ts) DIV 6 AS BIGINT)").alias("band"),
        F.to_date("ts").alias("day"),
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    cells = d.groupBy("band", "yc").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    gn = cells.groupBy("band").agg(F.sum("cnt").cast("long").alias("ns"))
    a = cells.select(
        F.col("band").alias("ab"), F.col("yc").alias("ay"),
        F.col("cnt").alias("an")
    )
    b = cells.select(
        F.col("band").alias("bb"), F.col("yc").alias("byc"),
        F.col("cnt").alias("bn")
    )
    j = a.join(b, F.col("ab") < F.col("bb")).agg(
        F.sum(
            F.expr(
                "an * bn * (2 * CASE WHEN ay < byc THEN 1 ELSE 0 END"
                " + CASE WHEN ay = byc THEN 1 ELSE 0 END)"
            )
        ).cast("long").alias("j2")
    )
    g = gn.agg(
        F.sum("ns").cast("long").alias("n"),
        F.sum(F.expr("ns * ns")).cast("long").alias("sn2"),
        F.sum(F.expr("ns * ns * (2 * ns + 3)")).cast("long").alias("sn23"),
        F.count(F.lit(1)).cast("long").alias("n_bands"),
    )
    return j.crossJoin(F.broadcast(g)).select(
        "n",
        "n_bands",
        "j2",
        F.expr("(CAST(n AS DOUBLE) * n - sn2) / 4.0").alias("e_j"),
        F.expr(
            "(CAST(n AS DOUBLE) * n * (2 * n + 3) - sn23) / 72.0"
        ).alias("var_j"),
        F.expr(
            "(j2 / 2.0 - (CAST(n AS DOUBLE) * n - sn2) / 4.0)"
            " / SQRT((CAST(n AS DOUBLE) * n * (2 * n + 3) - sn23) / 72.0)"
        ).alias("z"),
    )


@register(
    "q529_ansari_bradley",
    allow_non_equi=(
        "one 1-row x 1-row cross join attaching the picked type names "
        "to the single-row score-moment fold"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
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
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM s
    ), sc AS (
      SELECT grp, n, LEAST(r2, 2 * (n + 1) - r2) AS s2 FROM r
    ), m AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN grp = 1 THEN s2 ELSE 0 END) AS BIGINT)
               AS a2,
             CAST(SUM(s2) AS BIGINT) AS ss2,
             CAST(SUM(s2 * s2) AS BIGINT) AS ss2q
      FROM sc
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ta,
             MAX(CASE WHEN rk = 2 THEN et END) AS tb
      FROM pick WHERE rk <= 2
    )
    SELECT ta AS type_a, tb AS type_b, n1 AS n_a, n2 AS n_b,
           a2 AS ab_score2_a, ss2 AS score2_sum, ss2q AS score2_sq_sum,
           CAST(n1 AS DOUBLE) * ss2 / n AS e_a2,
           CAST(n1 AS DOUBLE) * n2
             * (CAST(n AS DOUBLE) * ss2q - CAST(ss2 AS DOUBLE) * ss2)
             / (CAST(n AS DOUBLE) * n * (n - 1)) AS var_a2,
           (a2 - CAST(n1 AS DOUBLE) * ss2 / n)
             / SQRT(CAST(n1 AS DOUBLE) * n2
                    * (CAST(n AS DOUBLE) * ss2q
                       - CAST(ss2 AS DOUBLE) * ss2)
                    / (CAST(n AS DOUBLE) * n * (n - 1))) AS z
    FROM m CROSS JOIN names
    """,
)
def q529_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X457 — ANSARI-BRADLEY two-sample SCALE test between the two
    lexicographically-first event types' daily revenue distributions:
    AB scores min(rank, N+1−rank) concentrate at the extremes, so a
    group with larger DISPERSION collects smaller scores — the rank
    test for "same center, different spread" that complements the
    location tests (q412 MWU, q512 Brunner-Munzel) and the parametric
    spread tests (q453 Brown-Forsythe, q478 Bartlett).

    Exactness: scores ride the q509 doubled-midrank trick —
    s2 = min(r2, 2(N+1) − r2) is exact int64 with ties at midranks —
    and the null moments are the exact RANDOMIZATION moments of the
    realized score multiset (E[A] = n1·ΣS/N,
    Var = n1n2(NΣS² − (ΣS)²)/(N²(N−1))), which absorb ties without a
    separate correction term.  A2/score sums publish as integers; z is
    one closed-form double.

    Scale: day-grain after the first aggregation (the q512 shape)."""
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
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    sc = r.select(
        "grp", "n", F.expr("LEAST(r2, 2 * (n + 1) - r2)").alias("s2")
    )
    m = sc.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("s2")).otherwise(0))
        .cast("long")
        .alias("a2"),
        F.sum("s2").cast("long").alias("ss2"),
        F.sum(F.expr("s2 * s2")).cast("long").alias("ss2q"),
    )
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ta"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tb"),
    )
    return m.crossJoin(F.broadcast(names)).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.col("a2").alias("ab_score2_a"),
        F.col("ss2").alias("score2_sum"),
        F.col("ss2q").alias("score2_sq_sum"),
        F.expr("CAST(n1 AS DOUBLE) * ss2 / n").alias("e_a2"),
        F.expr(
            "CAST(n1 AS DOUBLE) * n2"
            " * (CAST(n AS DOUBLE) * ss2q - CAST(ss2 AS DOUBLE) * ss2)"
            " / (CAST(n AS DOUBLE) * n * (n - 1))"
        ).alias("var_a2"),
        F.expr(
            "(a2 - CAST(n1 AS DOUBLE) * ss2 / n)"
            " / SQRT(CAST(n1 AS DOUBLE) * n2"
            " * (CAST(n AS DOUBLE) * ss2q - CAST(ss2 AS DOUBLE) * ss2)"
            " / (CAST(n AS DOUBLE) * n * (n - 1)))"
        ).alias("z"),
    )


@register(
    "q530_theil_u2_drift_eval",
    allow_non_equi=(
        "1-row series-endpoint scalars (y_0, y_n) broadcast onto the "
        "day-grain difference rows"
    ),
    oracle=_IDX_CTE
    + """
    , dif AS (
      SELECT t, yc, n,
             yc - LAG(yc) OVER (ORDER BY t) AS dy
      FROM ix
    ), ends AS (
      SELECT CAST(MAX(CASE WHEN t = 0 THEN yc END) AS BIGINT) AS y0,
             CAST(MAX(CASE WHEN t = n - 1 THEN yc END) AS BIGINT) AS yn
      FROM dif
    ), e AS (
      SELECT d.n, d.dy, en.y0, en.yn,
             d.dy * (d.n - 1) - (en.yn - en.y0) AS num
      FROM dif d CROSS JOIN ends en
      WHERE d.dy IS NOT NULL
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(yn - y0) AS BIGINT) AS total_drift,
             CAST(SUM(num * num) AS BIGINT) AS sse_drift_scaled,
             CAST(SUM(dy * dy) AS BIGINT) AS sse_naive
      FROM e
    )
    SELECT n, total_drift, sse_drift_scaled, sse_naive,
           SQRT(CAST(sse_drift_scaled AS DOUBLE))
             / ((n - 1) * SQRT(CAST(sse_naive AS DOUBLE))) AS theil_u2
    FROM agg
    """,
)
def q530_theil_u2_drift_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X458 — THEIL'S U2 forecast-quality ratio for the DRIFT forecast
    (y_{t-1} + mean daily change) against the naive random walk on
    daily revenue: U2 < 1 means modeling the trend beats carrying
    yesterday forward; U2 ≥ 1 means the drift adds nothing.  The
    missing scale-free companion to q434's MASE/sMAPE (which grade a
    seasonal-naive) and q234's linear forecast (which publishes no
    benchmark ratio).

    Exactness: the drift forecast error is kept as the exact integer
    numerator e·(n−1) = Δy·(n−1) − (y_n − y_0), so both SSEs are exact
    int64 and U2 is one closed-form double (the (n−1) scaling divides
    back out).  Int64 headroom: |Δy·(n−1)| ≤ ~6e9·|days| at sf1.

    Scale: day-grain; one LAG window plus a 1-row fold."""
    ix = _ix(spark, sf_dir)
    w = Window.orderBy("t")
    dif = ix.select(
        "t", "yc", "n", (F.col("yc") - F.lag("yc").over(w)).alias("dy")
    )
    ends = dif.agg(
        F.max(F.when(F.col("t") == 0, F.col("yc"))).cast("long").alias("y0"),
        F.max(F.expr("CASE WHEN t = n - 1 THEN yc END"))
        .cast("long")
        .alias("yn"),
    )
    e = (
        dif.where(F.col("dy").isNotNull())
        .crossJoin(F.broadcast(ends))
        .select(
            "n",
            "dy",
            "y0",
            "yn",
            F.expr("dy * (n - 1) - (yn - y0)").alias("num"),
        )
    )
    agg = e.agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.expr("yn - y0")).cast("long").alias("total_drift"),
        F.sum(F.expr("num * num")).cast("long").alias("sse_drift_scaled"),
        F.sum(F.expr("dy * dy")).cast("long").alias("sse_naive"),
    )
    return agg.select(
        "n",
        "total_drift",
        "sse_drift_scaled",
        "sse_naive",
        F.expr(
            "SQRT(CAST(sse_drift_scaled AS DOUBLE))"
            " / ((n - 1) * SQRT(CAST(sse_naive AS DOUBLE)))"
        ).alias("theil_u2"),
    )


@register(
    "q531_quade_test",
    allow_non_equi=(
        "1-row global-statistic scalars cross-joined onto the "
        "<=|event types| per-treatment score rows"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY et, day
    ), kk AS (
      SELECT CAST(COUNT(DISTINCT et) AS BIGINT) AS k FROM d
    ), comp AS (
      SELECT d.day FROM d CROSS JOIN kk
      GROUP BY d.day, kk.k HAVING COUNT(*) = MAX(kk.k)
    ), cd AS (
      SELECT d.et, d.day, d.yc FROM d JOIN comp USING (day)
    ), rng AS (
      SELECT day, CAST(MAX(yc) - MIN(yc) AS BIGINT) AS rg
      FROM cd GROUP BY day
    ), q AS (
      SELECT day,
             2 * RANK() OVER (ORDER BY rg)
               + COUNT(*) OVER (PARTITION BY rg) - 1 AS q2
      FROM rng
    ), r AS (
      SELECT cd.et, cd.day,
             2 * RANK() OVER (PARTITION BY cd.day ORDER BY cd.yc)
               + COUNT(*) OVER (PARTITION BY cd.day, cd.yc) - 1 AS r2
      FROM cd
    ), s AS (
      SELECT r.et, r.day, kq.q2,
             CAST(kq.q2 * (r.r2 - kk.k - 1) AS BIGINT) AS s4
      FROM r JOIN q kq USING (day) CROSS JOIN kk
    ), pt AS (
      SELECT et, CAST(SUM(s4) AS BIGINT) AS s4j,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM s GROUP BY et
    ), aa AS (
      SELECT CAST(SUM(s4 * s4) AS BIGINT) AS a16 FROM s
    ), bb AS (
      SELECT CAST(SUM(s4j * s4j) AS BIGINT) AS b16b,
             CAST(MAX(n_days) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM pt
    ), st AS (
      SELECT aa.a16, bb.b16b, bb.b, bb.k,
             (CAST(bb.b AS DOUBLE) - 1)
               * (CAST(bb.b16b AS DOUBLE) / bb.b)
               / (CAST(aa.a16 AS DOUBLE) - CAST(bb.b16b AS DOUBLE) / bb.b)
               AS quade_f
      FROM aa CROSS JOIN bb
    )
    SELECT p.et AS event_type, p.s4j, p.n_days,
           s.a16, s.b16b, s.quade_f
    FROM pt p CROSS JOIN st s
    """,
)
def q531_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X459 — QUADE TEST: the block-weighted Friedman (q526) — days
    with a LARGER spread across event types get a larger weight (the
    rank of their within-day range), so the test emphasizes the blocks
    that actually discriminate.  More powerful than Friedman for small
    k (here k=5), and its per-type weighted score sums S_j are the
    effect decomposition Friedman cannot give.

    Exactness: both rank layers (within-day value ranks and across-day
    range ranks) use the doubled-midrank trick; the Quade score is
    kept at the exact 4x integer scaling S4 = Q2·(r2 − k − 1), so
    A = ΣS², B = ΣS_j²/b, and F = (b−1)B/(A−B) are closed-form doubles
    of exact int64s (the scaling cancels in the ratio).

    Scale: (type, day) grain; every window rides per-day partitions of
    k rows or the day-grain range table."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("yc"))
    kk = d.agg(F.countDistinct("et").cast("long").alias("k"))
    comp = (
        d.crossJoin(F.broadcast(kk))
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .where("c = k")
        .select("day")
    )
    cd = d.join(comp, "day")
    rng = cd.groupBy("day").agg(
        (F.max("yc") - F.min("yc")).cast("long").alias("rg")
    )
    q = rng.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("rg"))
            + F.count(F.lit(1)).over(Window.partitionBy("rg"))
            - 1
        ).alias("q2"),
    )
    r = cd.select(
        "et",
        "day",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("day", "yc"))
            - 1
        ).alias("r2"),
    )
    s = (
        r.join(q, "day")
        .crossJoin(F.broadcast(kk))
        .select(
            "et",
            "day",
            "q2",
            F.expr("CAST(q2 * (r2 - k - 1) AS BIGINT)").alias("s4"),
        )
    )
    pt = s.groupBy("et").agg(
        F.sum("s4").cast("long").alias("s4j"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    aa = s.agg(F.sum(F.expr("s4 * s4")).cast("long").alias("a16"))
    bb = pt.agg(
        F.sum(F.expr("s4j * s4j")).cast("long").alias("b16b"),
        F.max("n_days").cast("long").alias("b"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    st = aa.crossJoin(F.broadcast(bb)).select(
        "a16",
        "b16b",
        "b",
        "k",
        F.expr(
            "(CAST(b AS DOUBLE) - 1) * (CAST(b16b AS DOUBLE) / b)"
            " / (CAST(a16 AS DOUBLE) - CAST(b16b AS DOUBLE) / b)"
        ).alias("quade_f"),
    )
    return pt.crossJoin(F.broadcast(st)).select(
        F.col("et").alias("event_type"),
        "s4j",
        "n_days",
        "a16",
        "b16b",
        "quade_f",
    )


# One-sided standard normal CDF from the shelf's shared A&S 26.2.17
# two-sided tail (needs az = |z| and tt = 1/(1 + 0.2316419*az) in scope).
_PHI_EXPR = (
    "CASE WHEN z >= 0 THEN 1.0 - (" + _P_TWO_SIDED_EXPR + ") / 2.0"
    " ELSE (" + _P_TWO_SIDED_EXPR + ") / 2.0 END"
)


@register(
    "q532_lilliefors_normality",
    allow_non_equi=(
        "1-row moment scalars (mu, sigma, n) broadcast onto the "
        "day-grain series for per-row z/EDF terms"
    ),
    oracle=_IDX_CTE
    + """
    , mo AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(yc) AS BIGINT) AS s,
             CAST(SUM(yc * yc) AS BIGINT) AS s2
      FROM ix
    ), zz AS (
      SELECT ix.day, ix.yc, mo.n,
             (ix.yc - CAST(mo.s AS DOUBLE) / mo.n)
               / SQRT((CAST(mo.s2 AS DOUBLE) * mo.n - CAST(mo.s AS DOUBLE)
                       * mo.s) / (CAST(mo.n AS DOUBLE) * mo.n)) AS z,
             ROW_NUMBER() OVER (ORDER BY ix.yc, ix.day) AS i
      FROM ix CROSS JOIN mo
    ), ph AS (
      SELECT day, yc, n, z, i,
             ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
      FROM zz
    ), ed AS (
      SELECT n,
             CAST(i AS DOUBLE) / n - ("""
    + _PHI_EXPR
    + """) AS dp,
             ("""
    + _PHI_EXPR
    + """) - (CAST(i AS DOUBLE) - 1.0) / n AS dm
      FROM ph
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           MAX(dp) AS d_plus, MAX(dm) AS d_minus,
           GREATEST(MAX(dp), MAX(dm)) AS d_stat,
           GREATEST(MAX(dp), MAX(dm))
             * (SQRT(CAST(MAX(n) AS DOUBLE)) - 0.01
                + 0.85 / SQRT(CAST(MAX(n) AS DOUBLE))) AS dw_scaled
    FROM ed
    """,
)
def q532_lilliefors_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X460 — LILLIEFORS normality test of daily revenue: the KS
    statistic against a normal with ESTIMATED mean/sd — the correct
    null when parameters come from the data (plain KS critical values
    are badly conservative then), published with the Dallal-Wilkinson
    scaling √n − 0.01 + 0.85/√n whose fixed critical points (0.895 at
    5%) make the decision table-free.  Completes the normality shelf:
    q465 Jarque-Bera (moments), q507 Anderson-Darling (tail-weighted
    EDF), q421 QQ — this is the plain-EDF member.

    Exactness: μ and population σ are closed-form doubles from exact
    int64 moments; per-row Φ uses the shelf's shared A&S 26.2.17
    polynomial; D⁺/D⁻ surface via order-insensitive MAX, with order
    statistics tie-broken deterministically by (value, day).

    Scale: day-grain; one broadcast of the 1-row moments and one
    ranking window."""
    ix = _ix(spark, sf_dir)
    mo = ix.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(F.expr("yc * yc")).cast("long").alias("s2"),
    )
    zz = (
        ix.drop("n")
        .crossJoin(F.broadcast(mo.select("n", "s", "s2")))
        .select(
            "day",
            "yc",
            "n",
            F.expr(
                "(yc - CAST(s AS DOUBLE) / n)"
                " / SQRT((CAST(s2 AS DOUBLE) * n - CAST(s AS DOUBLE) * s)"
                " / (CAST(n AS DOUBLE) * n))"
            ).alias("z"),
            F.row_number().over(Window.orderBy("yc", "day")).alias("i"),
        )
    )
    ph = zz.select(
        "day",
        "yc",
        "n",
        "z",
        "i",
        F.expr("ABS(z)").alias("az"),
        F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))").alias("tt"),
    )
    ed = ph.select(
        "n",
        F.expr(f"CAST(i AS DOUBLE) / n - ({_PHI_EXPR})").alias("dp"),
        F.expr(f"({_PHI_EXPR}) - (CAST(i AS DOUBLE) - 1.0) / n").alias("dm"),
    )
    return ed.agg(
        F.max("n").cast("long").alias("n"),
        F.max("dp").alias("d_plus"),
        F.max("dm").alias("d_minus"),
        F.greatest(F.max("dp"), F.max("dm")).alias("d_stat"),
        (
            F.greatest(F.max("dp"), F.max("dm"))
            * F.expr(
                "SQRT(CAST(MAX(n) AS DOUBLE)) - 0.01"
                " + 0.85 / SQRT(CAST(MAX(n) AS DOUBLE))"
            )
        ).alias("dw_scaled"),
    )


@register(
    "q533_wilcoxon_signed_rank",
    oracle=_IDX_CTE
    + """
    , pr AS (
      SELECT a.t AS ta, b.yc - a.yc AS d
      FROM ix a JOIN ix b ON b.t = a.t + a.n // 2
      WHERE a.t < a.n // 2
    ), nz AS (
      SELECT ta, d, ABS(d) AS ad FROM pr WHERE d <> 0
    ), r AS (
      SELECT d,
             2 * RANK() OVER (ORDER BY ad)
               + COUNT(*) OVER (PARTITION BY ad) - 1 AS r2
      FROM nz
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT)
             AS w2_plus,
           CAST(SUM(r2) AS BIGINT) AS r2_sum,
           CAST(SUM(r2 * r2) AS BIGINT) AS r2_sq_sum,
           (SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END)
            - SUM(r2) / 2.0) / SQRT(SUM(r2 * r2) / 4.0) AS z
    FROM r
    """,
)
def q533_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X461 — WILCOXON SIGNED-RANK test, first half-month vs second
    half-month daily revenue PAIRED by day offset: the nonparametric
    paired-location test missing between q412 (unpaired MWU) and q439
    (paired binary McNemar).  "Did revenue shift between the halves,
    accounting for each day's own level?"

    Exactness: differences are exact int64; |d| ranks use the doubled-
    midrank trick (zeros dropped per the standard convention), and the
    null moments are the exact randomization moments of the realized
    rank multiset — E[W2⁺] = Σr2/2, Var[W2⁺] = Σr2²/4 (sign-flip
    argument), which absorb ties with no separate correction.  W2⁺ and
    both moments publish as integers; z is one closed form.

    Scale: day-grain; the pairing join is an equi-join on the computed
    day index."""
    ix = _ix(spark, sf_dir)
    a = ix.select(
        F.col("t").alias("ta"), F.col("yc").alias("ya"), F.col("n").alias("na")
    )
    b = ix.select(F.col("t").alias("tb"), F.col("yc").alias("yb"))
    pr = a.join(b, F.expr("tb = ta + na DIV 2")).where(
        F.expr("ta < na DIV 2")
    ).select((F.col("yb") - F.col("ya")).alias("d"))
    nz = pr.where("d <> 0").select("d", F.expr("ABS(d)").alias("ad"))
    r = nz.select(
        "d",
        (
            2 * F.rank().over(Window.orderBy("ad"))
            + F.count(F.lit(1)).over(Window.partitionBy("ad"))
            - 1
        ).alias("r2"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("w2_plus"),
        F.sum("r2").cast("long").alias("r2_sum"),
        F.sum(F.expr("r2 * r2")).cast("long").alias("r2_sq_sum"),
        F.expr(
            "(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) - SUM(r2) / 2.0)"
            " / SQRT(SUM(r2 * r2) / 4.0)"
        ).alias("z"),
    )


@register(
    "q534_pettitt_changepoint",
    oracle=_IDX_CTE
    + """
    , v AS (
      SELECT day, t, n,
             2 * RANK() OVER (ORDER BY yc)
               + COUNT(*) OVER (PARTITION BY yc) - n - 2 AS vt
      FROM ix
    ), u AS (
      SELECT day, t, n,
             CAST(SUM(vt) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS ut
      FROM v
    ), k AS (
      SELECT day, t, n, ut, ABS(ut) AS au,
             CAST(MAX(ABS(ut)) OVER () AS BIGINT) AS k_max
      FROM u WHERE t < n - 1
    )
    SELECT day, t, ut, au, k_max,
           ROUND(2.0 * EXP(-6.0 * CAST(k_max AS DOUBLE) * k_max
                     / (CAST(n AS DOUBLE) * n * n
                        + CAST(n AS DOUBLE) * n)), 8) AS p_approx
    FROM k
    """,
)
def q534_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X462 — PETTITT change-point test on daily revenue: the rank-
    based single-change-point test (a Mann-Whitney statistic at every
    split, K = max|U_t|) — the DISTRIBUTION-FREE companion to q208's
    CUSUM (parametric, mean-shift) and q440's localization (which
    assumes a change exists); Pettitt also delivers the significance
    p ≈ 2·exp(−6K²/(n³+n²)).

    Exactness: uses the O(n) identity U_t = Σ_{i≤t} V_i with
    V_i = 2·RANK + #ties − n − 2 (each V_i the exact signed comparison
    count of day i against the whole series — pure integers via the
    doubled-midrank decomposition), so no pairwise join is needed at
    all; the cumulative U_t is an ordered integer fold and K surfaces
    via order-insensitive MAX.

    Scale: day-grain, one global ranking window + one fold — O(days)
    even though the statistic is defined over O(n²) pairs."""
    ix = _ix(spark, sf_dir)
    v = ix.select(
        "day",
        "t",
        "n",
        (
            2 * F.rank().over(Window.orderBy("yc"))
            + F.count(F.lit(1)).over(Window.partitionBy("yc"))
            - F.col("n")
            - 2
        ).alias("vt"),
    )
    u = v.select(
        "day",
        "t",
        "n",
        F.sum("vt")
        .over(Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("ut"),
    )
    k = u.where("t < n - 1").select(
        "day",
        "t",
        "n",
        "ut",
        F.expr("ABS(ut)").alias("au"),
        F.max(F.expr("ABS(ut)"))
        .over(Window.partitionBy())
        .cast("long")
        .alias("k_max"),
    )
    return k.select(
        "day",
        "t",
        "ut",
        "au",
        "k_max",
        F.round(
            F.expr(
                "2.0 * EXP(-6.0 * CAST(k_max AS DOUBLE) * k_max"
                " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))"
            ),
            8,
        ).alias("p_approx"),
    )


@register(
    "q535_page_hinkley_drift",
    oracle=_IDX_CTE
    + """
    , lam AS (
      SELECT CAST(SUM(yc) AS BIGINT) AS s, CAST(MAX(n) AS BIGINT) AS n
      FROM ix
    ), rs AS (
      SELECT day, t, yc,
             SUM(yc) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS run_s,
             CAST(t + 1 AS BIGINT) AS cnt
      FROM ix
    ), term AS (
      SELECT day, t, yc,
             yc - CAST(run_s AS DOUBLE) / cnt AS dev
      FROM rs
    ), mt AS (
      SELECT day, t, yc, dev,
             SUM(dev) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS m_t
      FROM term
    ), phs AS (
      SELECT day, t, yc, m_t,
             MIN(m_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS min_m
      FROM mt
    )
    SELECT p.day, p.t, p.yc, p.m_t, p.min_m,
           p.m_t - p.min_m AS ph_stat,
           CASE WHEN p.m_t - p.min_m
                     > 0.05 * CAST(l.s AS DOUBLE) / l.n
                THEN 1 ELSE 0 END AS alarm,
           0.05 * CAST(l.s AS DOUBLE) / l.n AS lambda_thr
    FROM phs p CROSS JOIN lam l
    """,
    allow_non_equi=(
        "1-row threshold scalar (0.05 x global mean) broadcast onto the "
        "day-grain fold rows"
    ),
)
def q535_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X463 — PAGE-HINKLEY upward-drift detector over daily revenue:
    the sequential m_t = Σ(x_i − x̄_i) accumulation against its running
    minimum, alarming when the gap exceeds λ = 5% of the global mean —
    the standard streaming concept-drift monitor (the online sibling
    of q208's retrospective CUSUM), published at day grain exactly as
    a monitoring job would emit it.

    Exactness: every layer is a deterministic ordered fold — running
    sum (exact int), running mean (closed-form double of the exact
    prefix), deviation cumsum, running MIN — so both engines walk the
    identical sequential recursion; λ is one closed form of the global
    int64 moments.

    Scale: day-grain single-partition folds; at production grain the
    same plan runs per-entity by adding the key to every window
    PARTITION BY."""
    ix = _ix(spark, sf_dir)
    lam = ix.agg(
        F.sum("yc").cast("long").alias("s"),
        F.max("n").cast("long").alias("n"),
    )
    wf = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    rs = ix.select(
        "day",
        "t",
        "yc",
        F.sum("yc").over(wf).alias("run_s"),
        (F.col("t") + 1).cast("long").alias("cnt"),
    )
    term = rs.select(
        "day", "t", "yc",
        F.expr("yc - CAST(run_s AS DOUBLE) / cnt").alias("dev"),
    )
    mt = term.select(
        "day", "t", "yc", "dev", F.sum("dev").over(wf).alias("m_t")
    )
    phs = mt.select(
        "day", "t", "yc", "m_t", F.min("m_t").over(wf).alias("min_m")
    )
    return phs.crossJoin(F.broadcast(lam)).select(
        "day",
        "t",
        "yc",
        "m_t",
        "min_m",
        F.expr("m_t - min_m").alias("ph_stat"),
        F.expr(
            "CASE WHEN m_t - min_m > 0.05 * CAST(s AS DOUBLE) / n"
            " THEN 1 ELSE 0 END"
        ).alias("alarm"),
        F.expr("0.05 * CAST(s AS DOUBLE) / n").alias("lambda_thr"),
    )


@register(
    "q536_block_bootstrap_ci",
    allow_non_equi=(
        "1-row series parameters (n, block count) broadcast to expand "
        "the fixed 64-replicate x m-draw spine; draws join block sums "
        "by equi key"
    ),
    oracle=_IDX_CTE
    + """
    , par AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(n) - 5 + 1 AS BIGINT) AS nb,
             CAST((MAX(n) + 4) // 5 AS BIGINT) AS m,
             CAST(SUM(yc) AS BIGINT) AS s
      FROM ix
    ), bs AS (
      SELECT t AS bidx,
             CAST(SUM(yc) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                                AND 4 FOLLOWING) AS BIGINT) AS bsum,
             n
      FROM ix QUALIFY t <= n - 5
    ), draws AS (
      SELECT r.r, i.i,
             CAST(concat('0x', substr(md5('bb|' || CAST(r.r AS VARCHAR)
                  || ':' || CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT)
               % p.nb AS bidx
      FROM par p,
           (SELECT UNNEST(range(0, 64)) AS r) r,
           LATERAL (SELECT UNNEST(range(0, p.m)) AS i) i
    ), rep AS (
      SELECT d.r, CAST(SUM(b.bsum) AS BIGINT) AS total
      FROM draws d JOIN bs b ON b.bidx = d.bidx
      GROUP BY d.r
    ), ranked AS (
      SELECT total, ROW_NUMBER() OVER (ORDER BY total, r) AS rk
      FROM rep
    ), qs AS (
      SELECT CAST(MAX(CASE WHEN rk = 2 THEN total END) AS BIGINT) AS lo,
             CAST(MAX(CASE WHEN rk = 63 THEN total END) AS BIGINT) AS hi,
             CAST(SUM(total) AS BIGINT) AS reps_sum,
             CAST(COUNT(*) AS BIGINT) AS n_reps
      FROM ranked
    )
    SELECT p.n, CAST(5 AS BIGINT) AS block_len, p.m, p.nb, q.n_reps,
           CAST(p.s AS DOUBLE) / p.n AS obs_mean,
           CAST(q.reps_sum AS DOUBLE) / (q.n_reps * p.m * 5) AS boot_mean,
           q.lo AS lo_total, q.hi AS hi_total,
           CAST(q.lo AS DOUBLE) / (p.m * 5) AS ci_lo_mean,
           CAST(q.hi AS DOUBLE) / (p.m * 5) AS ci_hi_mean
    FROM par p CROSS JOIN qs q
    """,
)
def q536_block_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X464 — MOVING-BLOCK BOOTSTRAP confidence interval for mean daily
    revenue (Künsch): 64 md5-seeded replicates, each resampling
    m = ⌈n/5⌉ overlapping length-5 blocks, CI from the replicate order
    statistics (#2 / #63 of 64).  The iid Poisson bootstrap (q402) is
    WRONG for an autocorrelated series — q513's Ljung-Box measures the
    very dependence that blocks preserve; this is the
    resampling-under-dependence member of the uncertainty shelf.

    Determinism: replicate draws are the portable md5 integer idiom
    (identical hex→int in both engines), block sums are exact int64
    window sums, replicate totals are exact integer sums over an
    equi-join of draws to block sums, and the CI picks are
    deterministic order statistics (ties broken by replicate id).
    Replicate means use the m·5-day resample length as denominator
    (the standard trimmed convention).

    Scale: the series is day-grain; the spine is a FIXED 64 × m grid
    joined to the O(days) block-sum table by key — constant work at
    any corpus size."""
    ix = _ix(spark, sf_dir)
    par = ix.agg(
        F.max("n").cast("long").alias("n"),
        (F.max("n") - 4).cast("long").alias("nb"),
        F.expr("CAST((MAX(n) + 4) DIV 5 AS BIGINT)").alias("m"),
        F.sum("yc").cast("long").alias("s"),
    )
    wb = Window.orderBy("t").rowsBetween(0, 4)
    bs = (
        ix.select(
            F.col("t").alias("bidx"),
            F.sum("yc").over(wb).cast("long").alias("bsum"),
            "n",
        )
        .where("bidx <= n - 5")
        .drop("n")
    )
    draws = (
        par.select("nb", "m")
        .select("nb", F.explode(F.expr("sequence(0, 63)")).alias("r"), "m")
        .select(
            "nb",
            "r",
            F.explode(F.expr("sequence(0, m - 1)")).alias("i"),
        )
        .select(
            "r",
            F.expr(
                "CAST(conv(substring(md5(concat('bb|', CAST(r AS STRING),"
                " ':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                " % nb"
            ).alias("bidx"),
        )
    )
    rep = draws.join(bs, "bidx").groupBy("r").agg(
        F.sum("bsum").cast("long").alias("total")
    )
    ranked = rep.select(
        "total",
        F.row_number().over(Window.orderBy("total", "r")).alias("rk"),
    )
    qs = ranked.agg(
        F.max(F.when(F.col("rk") == 2, F.col("total")))
        .cast("long")
        .alias("lo"),
        F.max(F.when(F.col("rk") == 63, F.col("total")))
        .cast("long")
        .alias("hi"),
        F.sum("total").cast("long").alias("reps_sum"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
    )
    return par.crossJoin(F.broadcast(qs)).select(
        "n",
        F.lit(5).cast("long").alias("block_len"),
        "m",
        "nb",
        "n_reps",
        F.expr("CAST(s AS DOUBLE) / n").alias("obs_mean"),
        F.expr(
            "CAST(reps_sum AS DOUBLE) / (n_reps * m * 5)"
        ).alias("boot_mean"),
        F.col("lo").alias("lo_total"),
        F.col("hi").alias("hi_total"),
        F.expr("CAST(lo AS DOUBLE) / (m * 5)").alias("ci_lo_mean"),
        F.expr("CAST(hi AS DOUBLE) / (m * 5)").alias("ci_hi_mean"),
    )


@register(
    "q537_freedman_diaconis_bins",
    allow_non_equi=(
        "1-row bin-geometry scalars (IQR-derived width, min) broadcast "
        "onto the day-grain rows for bin assignment"
    ),
    oracle=_IDX_CTE
    + """
    , ranked AS (
      SELECT yc, n, ROW_NUMBER() OVER (ORDER BY yc, day) AS i
      FROM ix
    ), st AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN i = CAST(CEIL(0.25 * n) AS BIGINT)
                           THEN yc END) AS BIGINT) AS q1,
             CAST(MAX(CASE WHEN i = CAST(CEIL(0.75 * n) AS BIGINT)
                           THEN yc END) AS BIGINT) AS q3,
             CAST(MIN(yc) AS BIGINT) AS lo,
             CAST(MAX(yc) AS BIGINT) AS hi
      FROM ranked
    ), geo AS (
      SELECT n, q1, q3, lo, hi,
             2.0 * (q3 - q1) / POW(CAST(n AS DOUBLE), CAST(1 AS DOUBLE) / 3) AS h
      FROM st
    ), bins AS (
      SELECT g.n, g.q1, g.q3, g.h,
             CAST(LEAST(FLOOR((ix.yc - g.lo) / g.h),
                        CEIL((g.hi - g.lo) / g.h) - 1) AS BIGINT) AS bin
      FROM ix CROSS JOIN geo g
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(q1) AS q1_cents, MAX(q3) AS q3_cents,
           MAX(h) AS bin_width
    FROM bins GROUP BY bin
    """,
)
def q537_freedman_diaconis_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X465 — FREEDMAN-DIACONIS histogram advisor + the histogram it
    recommends, over daily revenue: bin width h = 2·IQR/n^⅓ — the
    robust, theory-backed default that the fixed-width (q89),
    equi-depth (q187/q379), and split-finder (q370) histogram surfaces
    all leave to the caller.  Publishing the realized (bin, count)
    table makes the advisor directly consumable by a plotting or
    sketch-sizing layer.

    Determinism: Q1/Q3 are explicit order-statistic picks (rank
    ⌈0.25n⌉/⌈0.75n⌉, ties broken by day — no engine quantile
    semantics); h is one closed-form double, and bin assignment is
    FLOOR over identical doubles in both engines (the top edge folds
    into the last bin via the standard LEAST guard).

    Scale: day-grain ranking window plus a broadcast of the 1-row
    geometry; at fact grain the same plan runs with the ranking
    replaced by the q63 sketch quantiles."""
    ix = _ix(spark, sf_dir)
    ranked = ix.select(
        "yc",
        "n",
        F.row_number().over(Window.orderBy("yc", "day")).alias("i"),
    )
    st = ranked.agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.expr(
                "CASE WHEN i = CAST(CEIL(0.25 * n) AS BIGINT) THEN yc END"
            )
        ).cast("long").alias("q1"),
        F.max(
            F.expr(
                "CASE WHEN i = CAST(CEIL(0.75 * n) AS BIGINT) THEN yc END"
            )
        ).cast("long").alias("q3"),
        F.min("yc").cast("long").alias("lo"),
        F.max("yc").cast("long").alias("hi"),
    )
    geo = st.select(
        "n",
        "q1",
        "q3",
        "lo",
        "hi",
        F.expr(
            "2.0 * (q3 - q1) / POW(CAST(n AS DOUBLE),"
            " CAST(1 AS DOUBLE) / 3)"
        ).alias("h"),
    )
    bins = ix.drop("n").crossJoin(F.broadcast(geo)).select(
        "n",
        "q1",
        "q3",
        "h",
        F.expr(
            "CAST(LEAST(FLOOR((yc - lo) / h),"
            " CEIL((hi - lo) / h) - 1) AS BIGINT)"
        ).alias("bin"),
    )
    return bins.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("n").cast("long").alias("n"),
        F.max("q1").alias("q1_cents"),
        F.max("q3").alias("q3_cents"),
        F.max("h").alias("bin_width"),
    )


@register(
    "q538_wasserstein_1d",
    allow_non_equi=(
        "one 1-row x 1-row cross join attaching the picked type names "
        "and group sizes to the single-row distance fold"
    ),
    oracle="""
    WITH d AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS yc
      FROM events GROUP BY et, day
    ), pick AS (
      SELECT et, DENSE_RANK() OVER (ORDER BY et) AS rk
      FROM (SELECT DISTINCT et FROM d)
    ), s AS (
      SELECT p.rk AS grp, d.yc
      FROM d JOIN pick p USING (et) WHERE p.rk <= 2
    ), gm AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM s
    ), sup AS (
      SELECT yc,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
      FROM s GROUP BY yc
    ), cum AS (
      SELECT yc,
             CAST(SUM(c1) OVER (ORDER BY yc ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY yc ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum2,
             LEAD(yc) OVER (ORDER BY yc) AS nxt
      FROM sup
    ), w AS (
      SELECT CAST(SUM(ABS(cum1 * gm.n2 - cum2 * gm.n1) * (nxt - yc))
                  AS BIGINT) AS w1_num,
             CAST(MAX(gm.n1) AS BIGINT) AS n1,
             CAST(MAX(gm.n2) AS BIGINT) AS n2
      FROM cum CROSS JOIN gm WHERE nxt IS NOT NULL
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ta,
             MAX(CASE WHEN rk = 2 THEN et END) AS tb
      FROM pick WHERE rk <= 2
    )
    SELECT ta AS type_a, tb AS type_b, n1, n2, w1_num,
           CAST(w1_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
             AS w1_cents
    FROM w CROSS JOIN names
    """,
)
def q538_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X466 — EXACT 1-D WASSERSTEIN (earth mover's) distance between
    the two lexicographically-first event types' daily revenue
    distributions: ∫|F₁ − F₂| over the value axis, computed as the sum
    over support gaps of the cross-multiplied integer CDF difference
    |cum₁·n₂ − cum₂·n₁|·gap.  The METRIC member of the
    distribution-distance shelf — KS (q202/q374) takes the max
    deviation, JS (q178) needs binning; W1 integrates the full shape
    difference in the units of the variable (cents), which is what a
    drift SLO wants to threshold.

    Exactness: the entire integral is one exact int64 sum (counts
    cross-multiplied by group sizes avoid any rational CDF), divided
    once at publish time.  No folds needed — integer summands are
    order-insensitive.

    Scale: support is day-grain (distinct daily values of two types);
    one ranking-free pass: aggregate to support, two cumulative
    windows, one fold."""
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
    gm = s.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    sup = s.groupBy("yc").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    wv = Window.orderBy("yc").rowsBetween(Window.unboundedPreceding, 0)
    cum = sup.select(
        "yc",
        F.sum("c1").over(wv).cast("long").alias("cum1"),
        F.sum("c2").over(wv).cast("long").alias("cum2"),
        F.lead("yc").over(Window.orderBy("yc")).alias("nxt"),
    )
    w = (
        cum.where(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(gm))
        .agg(
            F.sum(
                F.expr("ABS(cum1 * n2 - cum2 * n1) * (nxt - yc)")
            ).cast("long").alias("w1_num"),
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
        )
    )
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ta"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tb"),
    )
    return w.crossJoin(F.broadcast(names)).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n1",
        "n2",
        "w1_num",
        F.expr(
            "CAST(w1_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)"
        ).alias("w1_cents"),
    )


@register(
    "q541_hellinger_bhattacharyya",
    allow_non_equi=(
        "one 1-row x 1-row cross join attaching the picked type names "
        "and group sizes to the <=10-row band fold"
    ),
    oracle="""
    WITH b AS (
      SELECT event_type AS et,
             LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000, 9)
               AS band
      FROM events
    ), pick AS (
      SELECT et, DENSE_RANK() OVER (ORDER BY et) AS rk
      FROM (SELECT DISTINCT et FROM b)
    ), s AS (
      SELECT p.rk AS grp, b.band
      FROM b JOIN pick p USING (et) WHERE p.rk <= 2
    ), gm AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM s
    ), cells AS (
      SELECT band,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
      FROM s GROUP BY band
    ), fold AS (
      SELECT band, c1, c2,
             SUM(SQRT(CAST(c1 AS DOUBLE) * c2))
               OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS run
      FROM cells
    ), fin AS (
      SELECT MAX(run) AS bc_num FROM fold
    ), names AS (
      SELECT MAX(CASE WHEN rk = 1 THEN et END) AS ta,
             MAX(CASE WHEN rk = 2 THEN et END) AS tb
      FROM pick WHERE rk <= 2
    )
    SELECT ta AS type_a, tb AS type_b, gm.n1, gm.n2,
           f.bc_num / SQRT(CAST(gm.n1 AS DOUBLE) * gm.n2) AS bc_coeff,
           SQRT(GREATEST(1.0 - f.bc_num
                / SQRT(CAST(gm.n1 AS DOUBLE) * gm.n2), 0.0))
             AS hellinger,
           -LN(f.bc_num / SQRT(CAST(gm.n1 AS DOUBLE) * gm.n2))
             AS bhattacharyya_dist
    FROM fin f CROSS JOIN gm CROSS JOIN names
    """,
)
def q541_hellinger_bhattacharyya(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X468 — HELLINGER distance and BHATTACHARYYA coefficient/distance
    between the two lexicographically-first event types' value-band
    distributions (the q520 10-band grid at event grain): the bounded
    [0,1] metric (Hellinger) and the overlap integral (BC) that
    complete the distribution-distance shelf — KS takes a max, JS
    needs a log mixture, W1 (q538) is unbounded in value units;
    Hellinger is THE thresholdable bounded metric for drift SLOs.

    Exactness: band counts are exact int64; the ≤10-term Σ√(c1·c2)
    rides a deterministic ordered fold surfaced by MAX of the monotone
    running sum, and the three published statistics are closed forms
    of that one fold value and the exact group sizes (BC computed as
    Σ√(c1c2)/√(n1n2), so no per-band rational probabilities exist to
    diverge).

    Scale: one event-grain aggregation to ≤10 band cells — constant
    state at any corpus size."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        F.col("event_type").alias("et"),
        F.expr(
            "LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 5000, 9)"
        ).alias("band"),
    )
    pick = (
        b.select("et")
        .distinct()
        .select("et", F.dense_rank().over(Window.orderBy("et")).alias("rk"))
    )
    s = b.join(F.broadcast(pick), "et").where(F.col("rk") <= 2).select(
        F.col("rk").alias("grp"), "band"
    )
    gm = s.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    cells = s.groupBy("band").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    wf = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    fold = cells.select(
        "band",
        F.sum(F.expr("SQRT(CAST(c1 AS DOUBLE) * c2)")).over(wf).alias("run"),
    )
    fin = fold.agg(F.max("run").alias("bc_num"))
    names = pick.where(F.col("rk") <= 2).agg(
        F.max(F.when(F.col("rk") == 1, F.col("et"))).alias("ta"),
        F.max(F.when(F.col("rk") == 2, F.col("et"))).alias("tb"),
    )
    return (
        fin.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(names))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n1",
            "n2",
            F.expr(
                "bc_num / SQRT(CAST(n1 AS DOUBLE) * n2)"
            ).alias("bc_coeff"),
            F.expr(
                "SQRT(GREATEST(1.0 - bc_num"
                " / SQRT(CAST(n1 AS DOUBLE) * n2), 0.0))"
            ).alias("hellinger"),
            F.expr(
                "-LN(bc_num / SQRT(CAST(n1 AS DOUBLE) * n2))"
            ).alias("bhattacharyya_dist"),
        )
    )
