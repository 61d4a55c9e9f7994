"""Query catalog: every SURVEY.md §2 operator expressed over the driver's
testdata tables, each paired with a DuckDB oracle.

Cross-engine determinism conventions (so the order-insensitive value-hash
matches):

- all output column names lowercase snake_case, aliased identically on both
  sides;
- sums over double columns go through integer cents: ``sum(cast(round(x*100)
  as bigint))`` — exact integer arithmetic is order-independent, unlike
  float summation;
- averages/derived ratios are computed as exact-int-sum / count and
  ``round(..., 6)``;
- time arithmetic uses microseconds (``unix_micros`` ⟷ ``epoch_us``), never
  DuckDB's fractional ``epoch()``;
- every window/top-k order has an id tiebreak so ranks are total.

The mapping reference-operator → query is noted on each entry (SURVEY §2
codes: S=sources, P=projections, J=joins, A=aggregations, W=windows,
O=sorts, U=set-ops, D=dedup, T=stateful, Q=SQL corpus).
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.functions.spatial import grid_cell, haversine_km
from noaa_ais_glue_lakehouse_spark.functions.text import (
    LANG_MARKERS,
    langid_guess,
    quality_features,
    tokenize,
)
from noaa_ais_glue_lakehouse_spark.operators import cleaning
from noaa_ais_glue_lakehouse_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs_exact,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from noaa_ais_glue_lakehouse_spark.operators.sampling import sample_trajectory
from noaa_ais_glue_lakehouse_spark.operators.sessionize import (
    latest_per_entity,
    sessionize,
)
from noaa_ais_glue_lakehouse_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)
from noaa_ais_glue_lakehouse_spark.operators.state import merge_state_full_outer

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}
_BASELINE_ONLY: set[str] = set()
_ALLOW_NON_EQUI: dict[str, str] = {}
_BUILD_TIME_EXEC: dict[str, str] = {}


def register(
    name: str,
    oracle: str | None = None,
    baseline_only: bool = False,
    allow_non_equi: str | None = None,
    build_time_exec: str | None = None,
):
    """``baseline_only=True`` marks a deliberately O(n²) oracle anchor
    (brute-force ground truth for an LSH/prefix-filter scale path). Such
    queries stay in the catalog so the scale paths keep a measurable
    recall target, but downstream runners — and the plan-audit cartesian
    scan — treat them as non-production surfaces.

    ``allow_non_equi`` exempts the query from the plan audit's
    accidental-cartesian scan; the value MUST be a reason string
    explaining why the non-equi/cross join is deliberate and bounded
    (e.g. a 1-row scalar broadcast). The justification lives HERE, next
    to the query it describes — the audit derives its allowlist from the
    registry instead of a hand-maintained test-file set.

    ``build_time_exec`` (also a mandatory reason string) marks queries
    that execute driver-side work at plan-BUILD time (iterative
    components, k-means/BPE training rounds); the sweeping plan scan
    skips building them for speed, and their plans are pinned by their
    own recall/oracle tests instead."""
    for flag, label in ((allow_non_equi, "allow_non_equi"),
                        (build_time_exec, "build_time_exec")):
        if flag is not None and (not isinstance(flag, str) or len(flag) < 15):
            raise ValueError(
                f"register({name!r}): {label} must be a substantive reason "
                f"string, got {flag!r}"
            )

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if baseline_only:
            _BASELINE_ONLY.add(name)
        if allow_non_equi is not None:
            _ALLOW_NON_EQUI[name] = allow_non_equi
        if build_time_exec is not None:
            _BUILD_TIME_EXEC[name] = build_time_exec
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def baseline_only_queries() -> set[str]:
    """Names registered with ``baseline_only=True`` — deliberate
    brute-force oracle anchors, never production paths."""
    return set(_BASELINE_ONLY)


def allow_non_equi_queries() -> dict[str, str]:
    """name → reason for every query registered with a justified
    non-equi/cross join (bounded scalar broadcasts, literal spines)."""
    return dict(_ALLOW_NON_EQUI)


def build_time_exec_queries() -> dict[str, str]:
    """name → reason for every query that runs driver-side work at
    plan-build time (iterative/trained operators)."""
    return dict(_BUILD_TIME_EXEC)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from noaa_ais_glue_lakehouse_spark.sources.readers import read_parquet_table

    # Pinned at call time (not only in the session factory) because the
    # external driver passes its OWN SparkSession: any timestamp the catalog
    # constructs (to_timestamp/date_format) is interpreted in the session
    # timezone at EXECUTION time, and the DuckDB oracle is timezone-naive
    # (effectively UTC). Left set deliberately — execution happens lazily
    # after this returns, so a save/restore here would un-pin it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_parquet_table(spark, f"{sf_dir}/{name}.parquet")


def cents(col) -> F.Column:
    """Exact integer-cents of a double column (order-independent sums)."""
    return F.round(col * 100).cast("long")


SESSION_GAP_SECONDS = 1800.0


# ---------------------------------------------------------------------------
# TPC-H-ish relational core (S2/S3 scans, A1-A4 aggregations, J1-J5 joins)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_charge,
           ROUND(CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/COUNT(*)/100.0, 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/CAST(COUNT(*) AS DOUBLE)/100.0, 6) AS avg_price,
           ROUND(CAST(SUM(CAST(ROUND(l_discount*10000) AS BIGINT)) AS DOUBLE)/COUNT(*)/10000.0, 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the A1/A2 groupBy-agg core with derived metrics (A4).

    Filter + projection push down to the parquet scan; the aggregate is a
    single hash-agg with map-side partials.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    disc_price_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    charge_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
    ).cast("long")
    disc_bp = F.round(F.col("l_discount") * 10000).cast("long")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(disc_price_c).cast("double") / 100.0).alias("sum_disc_price"),
        (F.sum(charge_c).cast("double") / 100.0).alias("sum_charge"),
        F.round(F.sum(qty_c).cast("double") / n / 100.0, 6).alias("avg_qty"),
        F.round(F.sum(price_c) / n.cast("double") / 100.0, 6).alias("avg_price"),
        F.round(F.sum(disc_bp).cast("double") / n / 10000.0, 6).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "q02_rows_per_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events GROUP BY 1
    """,
)
def q02_rows_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 corpus shape — rows per day (partition-grain count)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )


@register(
    "q03_distinct_users_per_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def q03_distinct_users_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 corpus shape — COUNT(DISTINCT entity) per day."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )


@register(
    "q04_entity_timeline",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events WHERE user_id = 7 AND CAST(ts AS DATE) = DATE '2024-01-05'
    """,
)
def q04_entity_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 corpus shape — point timeline for one entity/day."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        (F.col("user_id") == 7) & (F.to_date("ts") == F.lit("2024-01-05").cast("date"))
    ).select("event_id", "ts", "event_type", "value")


@register(
    "q05_type_distribution",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2, 3
    """,
)
def q05_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 corpus shape — categorical distribution per entity/day."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q06_minmax_ts_per_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY 1
    """,
)
def q06_minmax_ts_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 corpus shape — MIN/MAX timestamp per day."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )


@register(
    "q07_conditional_sums",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q07_conditional_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7/Q8 corpus shape — CASE WHEN conditional aggregation (A5)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("sum_value"),
    )


@register(
    "q08_topk_entities",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id ASC LIMIT 10
    """,
)
def q08_topk_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9/O4 — top-k by count (TakeOrderedAndProject, no full sort)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "q09_pct_active",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           ROUND(100.0 * SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 / COUNT(*), 4) AS pct_purchase
    FROM events GROUP BY 1
    """,
)
def q09_pct_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 corpus shape — ROUND + conditional agg ratio."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("pct_purchase")
    )


@register(
    "q10_gap_stats",
    oracle="""
    WITH lagged AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST((2 * SUM(gap_us) + COUNT(gap_us)) // (2 * COUNT(gap_us)) AS BIGINT)
             AS avg_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM lagged GROUP BY user_id
    """,
)
def q10_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 corpus shape — LAG window + gap statistics (W1/W2).

    The average is EXACT half-up integer microseconds:
    ``(2·sum + n) // (2·n)`` in pure BIGINT arithmetic. The earlier
    ``round(sum/n/1e6, 6)`` double form hash-diverged between engines at
    sf0.1 (one group's quotient landed in the ULP region where Spark's
    BigDecimal HALF_UP and the oracle's float rounding disagree) —
    integer division cannot.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    lagged = ev.withColumn("gap_us", gap)
    g = lagged.groupBy("user_id").agg(
        F.count("gap_us").alias("_n"),
        F.sum("gap_us").alias("_s"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    return g.select(
        "user_id",
        F.col("_n").cast("long").alias("n_gaps"),
        # `div` is true integer division (long / on longs is double division
        # and its floor can be off by one ULP)
        F.expr("(2 * _s + _n) div (2 * _n)").cast("long").alias("avg_gap_us"),
        "min_gap_us",
        "max_gap_us",
    )


# ---------------------------------------------------------------------------
# Sessionization core (W1-W4) and the voyage-summary rollup (A1/A2/A4, T5)
# ---------------------------------------------------------------------------

_SESSIONIZED_CTE = """
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, value,
             SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id
      FROM lagged
    )
"""


@register(
    "q11_sessionize",
    oracle=_SESSIONIZED_CTE
    + """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY 1, 2
    """,
)
def q11_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — the voyage-segmentation conditional prefix sum (the reference's
    computational heart) on (user_id, ts) with a 30-minute gap rule.
    """
    ev = load(spark, sf_dir, "events")
    s = sessionize(
        ev, "user_id", "ts", SESSION_GAP_SECONDS, tiebreak_cols=["event_id"]
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q12_session_rollup",
    oracle=_SESSIONIZED_CTE
    + """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))/3600000000.0, 6) AS duration_hours,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
           ROUND(CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/COUNT(*)/100.0, 6) AS avg_value
    FROM sess GROUP BY 1, 2
    """,
)
def q12_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — daily partials (A1) re-aggregated to per-session finals (A2) with
    derived metrics (A4): the reference's voyage_summary two-level rollup.
    The two-level decomposition must equal the single-level oracle.
    """
    ev = load(spark, sf_dir, "events")
    s = sessionize(
        ev, "user_id", "ts", SESSION_GAP_SECONDS, tiebreak_cols=["event_id"]
    ).withColumn("day", F.to_date("ts"))
    partials = s.groupBy("user_id", "session_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("day_n"),
        F.sum(cents(F.col("value"))).alias("day_cents"),
        F.min("ts").alias("day_first"),
        F.max("ts").alias("day_last"),
    )
    final = partials.groupBy("user_id", "session_id").agg(
        F.sum("day_n").cast("long").alias("n_events"),
        F.sum("day_cents").alias("sum_cents"),
        F.min("day_first").alias("session_start"),
        F.max("day_last").alias("session_end"),
    )
    return final.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        F.round(
            (F.unix_micros("session_end") - F.unix_micros("session_start")) / 3.6e9, 6
        ).alias("duration_hours"),
        "n_events",
        (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
        F.round(F.col("sum_cents").cast("double") / F.col("n_events") / 100.0, 6).alias(
            "avg_value"
        ),
    )


@register(
    "q13_latest_per_entity",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q13_latest_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — top-1 most-recent row per entity (the state-snapshot seed)."""
    ev = load(spark, sf_dir, "events")
    return latest_per_entity(ev, "user_id", "ts", tiebreak_cols=["event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


@register(
    "q14_state_merge",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def q14_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/T4 — full-outer state merge: running aggregates over the first half
    of the month merged with second-half deltas must equal a full recompute
    (the oracle). This is the reference's incremental voyage-summary merge.
    """
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def agg_half(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    state = agg_half(ev.filter(F.col("ts") < cut))
    delta = agg_half(ev.filter(F.col("ts") >= cut))
    merged = merge_state_full_outer(
        state,
        delta,
        keys=["user_id"],
        sum_cols=["n_events", "sum_cents"],
        min_cols=["first_ts"],
        max_cols=["last_ts"],
    )
    return merged.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
        "first_ts",
        "last_ts",
    )


# ---------------------------------------------------------------------------
# Joins (J1-J5)
# ---------------------------------------------------------------------------


@register(
    "q15_revenue_per_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q15_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4 — fact-to-dim equi-join chain with explicit broadcast of the
    small dimensions (nation: 25 rows; customer at sf — AQE decides).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(rev_c).cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


@register(
    "q16_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q16_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — anti-join (the QA 'missing voyages' check)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q17_priority_semi",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q17_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — semi-join restriction (voyage-key filtering idiom)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@register(
    "q18_supplier_lookup",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name
    FROM supplier s
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q18_supplier_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — generic left lookup-join chain against broadcast dims (the
    reference's join_lookup, ``utils/common_functions_raw.py:163-175``).
    """
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


# ---------------------------------------------------------------------------
# Spatial kernels over synthetic deterministic coordinates (P5, P9, P10, Q16)
# ---------------------------------------------------------------------------

_COORDS_CTE = """
    WITH coords AS (
      SELECT user_id, event_id, ts,
             CAST(event_id % 1800 AS DOUBLE)/10.0 - 90.0 AS lat,
             CAST((event_id * 7) % 3600 AS DOUBLE)/10.0 - 180.0 AS lon
      FROM events
    )
"""


def _with_coords(ev: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    lat = (F.col("event_id") % 1800).cast("double") / 10.0 - 90.0
    lon = ((F.col("event_id") * 7) % 3600).cast("double") / 10.0 - 180.0
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        lat.alias("lat"),
        lon.alias("lon"),
        *extra_cols,
    )


@register(
    "q19_haversine_jumps",
    oracle=_COORDS_CTE
    + """
    , lagged AS (
      SELECT user_id, event_id, lat, lon,
             LAG(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_lat,
             LAG(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_lon
      FROM coords
    )
    SELECT user_id, event_id,
           ROUND(2*6371*ASIN(LEAST(SQRT(
             POW(SIN(RADIANS(lat-prev_lat)/2),2)
             + COS(RADIANS(prev_lat))*COS(RADIANS(lat))*POW(SIN(RADIANS(lon-prev_lon)/2),2)
           ), 1.0)), 2) AS dist_km
    FROM lagged
    WHERE prev_lat IS NOT NULL
      AND 2*6371*ASIN(LEAST(SQRT(
             POW(SIN(RADIANS(lat-prev_lat)/2),2)
             + COS(RADIANS(prev_lat))*COS(RADIANS(lat))*POW(SIN(RADIANS(lon-prev_lon)/2),2)
           ), 1.0)) > 15000
    """,
)
def q19_haversine_jumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 + Q16 corpus — lag + haversine jump-anomaly detection on
    deterministic synthetic coordinates.
    """
    ev = _with_coords(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_lat", F.lag("lat").over(w)).withColumn(
        "prev_lon", F.lag("lon").over(w)
    )
    dist = haversine_km(
        F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon")
    )
    return (
        lagged.filter(F.col("prev_lat").isNotNull())
        .withColumn("_d", dist)
        .filter(F.col("_d") > 15000)
        .select("user_id", "event_id", F.round("_d", 2).alias("dist_km"))
    )


@register(
    "q20_grid_density",
    oracle=_COORDS_CTE
    + """
    SELECT CAST(FLOOR(lat/5.0) AS BIGINT) AS lat_cell,
           CAST(FLOOR(lon/5.0) AS BIGINT) AS lon_cell,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM coords GROUP BY 1, 2
    """,
)
def q20_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — floor-quantized spatial grid density."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    return ev.groupBy(
        grid_cell(F.col("lat"), 5.0).alias("lat_cell"),
        grid_cell(F.col("lon"), 5.0).alias("lon_cell"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q21_coordinate_quarantine",
    oracle="""
    SELECT event_id,
           value * 0.5 - 95.0 AS lat,
           value - 200.0 AS lon,
           CAST(CASE WHEN (value*0.5 - 95.0) BETWEEN -90 AND 90
                      AND (value - 200.0) BETWEEN -180 AND 180
                     THEN 1 ELSE 0 END AS BIGINT) AS is_valid
    FROM events
    """,
)
def q21_coordinate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/S6 — the clean_coordinates valid/quarantine split, re-unioned with
    a validity flag so one query checks both halves.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("value") * 0.5 - 95.0).alias("lat"),
        (F.col("value") - 200.0).alias("lon"),
    )
    valid, invalid = cleaning.clean_coordinates(ev, "lat", "lon")
    return valid.withColumn("is_valid", F.lit(1).cast("long")).unionByName(
        invalid.withColumn("is_valid", F.lit(0).cast("long"))
    )


# ---------------------------------------------------------------------------
# Cleaning chain analogs (P4, P6/P7/P8) with oracle parity
# ---------------------------------------------------------------------------


@register(
    "q22_parse_timestamps",
    oracle="""
    WITH s AS (
      SELECT event_id,
             CASE CAST(event_id % 3 AS INTEGER)
               WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
               WHEN 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
               ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
             END AS raw
      FROM events
    ),
    p AS (
      SELECT event_id,
             try_strptime(regexp_replace(regexp_replace(raw, 'Z$', ''),
                                         '[+-][0-9]{2}:[0-9]{2}$', ''),
                          ['%Y-%m-%d %H:%M:%S', '%Y-%m-%dT%H:%M:%S']) AS base_datetime
      FROM s
    )
    SELECT event_id,
           strftime(base_datetime, '%Y-%m-%d %H:%M:%S') AS base_datetime,
           strftime(base_datetime, '%Y') AS year,
           strftime(base_datetime, '%m') AS month,
           strftime(base_datetime, '%d') AS day
    FROM p WHERE base_datetime IS NOT NULL
    """,
)
def q22_parse_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — multi-format timestamp parsing (Z-strip, 3-format coalesce,
    partition derivation) round-tripped through formatted strings.

    ``base_datetime`` is emitted as a formatted STRING on both sides: this is
    the only catalog query that constructs timestamps (rather than passing
    reader-produced ones through), and constructed-timestamp dtype/instant
    mapping is the one thing an externally owned SparkSession can change out
    from under us (round-2 driver red: rows ✓ schema ✗ hash ✗).
    """
    ev = load(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .otherwise(F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")))
    )
    df = ev.select("event_id", raw.alias("BaseDateTime"))
    parsed = cleaning.parse_base_datetime(df, "BaseDateTime")
    return parsed.select(
        "event_id",
        F.date_format("BaseDateTime", "yyyy-MM-dd HH:mm:ss").alias("base_datetime"),
        "year",
        "month",
        "day",
    )


@register(
    "q23_clean_clamp",
    oracle="""
    SELECT event_id,
           LEAST(value, 100.0) AS value_clamped,
           CAST(CASE WHEN value > 0 THEN 1 ELSE 0 END AS BIGINT) AS movement_flag,
           CASE WHEN value < 50 THEN 'anchored' ELSE 'moving' END AS movement_state
    FROM events
    """,
)
def q23_clean_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7/P8 — upper-bound clamp, movement flag, movement state."""
    ev = load(spark, sf_dir, "events").select("event_id", F.col("value").alias("SOG"))
    out = cleaning.clean_sog_cog_heading(ev)
    out = cleaning.derive_movement_flag(out)
    out = cleaning.add_movement_state(out, threshold=50.0)
    return out.select(
        "event_id",
        F.col("SOG").alias("value_clamped"),
        F.col("MovementFlag").cast("long").alias("movement_flag"),
        "movement_state",
    )


# ---------------------------------------------------------------------------
# Sampling (T6) — endpoint-preserving thinning
# ---------------------------------------------------------------------------


@register(
    "q24_sample_trajectory",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, value, CAST(ts AS DATE) AS day,
             (epoch_us(ts) // 1000000)
               // (CASE WHEN value >= 10 THEN 600 ELSE 900 END) AS bucket
      FROM events
    ),
    flags AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rd1,
        ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rd2,
        ROW_NUMBER() OVER (PARTITION BY user_id, day, bucket ORDER BY ts, event_id) AS rb1,
        ROW_NUMBER() OVER (PARTITION BY user_id, day, bucket ORDER BY ts DESC, event_id DESC) AS rb2
      FROM base
    )
    SELECT user_id, event_id, ts, day
    FROM flags
    WHERE rd1 = 1 OR rd2 = 1 OR (value >= 50 AND (rb1 = 1 OR rb2 = 1))
    """,
)
def q24_sample_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6/W5/W7 — the reference's trajectory thinning: day endpoints plus
    speed-conditional time-bucket endpoints for moving rows.
    """
    ev = (
        load(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .withColumn(
            "movement_state",
            F.when(F.col("value") < 50, F.lit("anchored")).otherwise(F.lit("moving")),
        )
    )
    sampled = sample_trajectory(
        ev,
        entity_col="user_id",
        ts_col="ts",
        session_col="day",
        speed_col="value",
        day_col="day",
        tiebreak_cols=["event_id"],
    )
    return sampled.select("user_id", "event_id", "ts", "day")


# ---------------------------------------------------------------------------
# Dedup family (D1/D2 + near-dup extensions)
# ---------------------------------------------------------------------------


@register(
    "q25_dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT *, md5(concat_ws('', coalesce(CAST(text AS VARCHAR), ' <NULL> '))) AS f
      FROM documents
    ),
    w AS (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f)
    SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM fp d JOIN w ON d.f = w.f AND d.doc_id = w.doc_id
    """,
)
def q25_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — exact content-fingerprint dedup with deterministic min-id
    survivor (fixing the reference's arbitrary dropDuplicates survivor).
    """
    docs = load(spark, sf_dir, "documents")
    out = dedup_exact(docs, content_cols=["text"], id_col="doc_id")
    return out.select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "q26_jaccard_pairs",
    baseline_only=True,  # O(n²) oracle anchor for q27/q171 recall
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                       x -> x <> '')) AS sh
      FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (a.n + b.n - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sized a, sized b
    WHERE a.doc_id < b.doc_id
      AND LEAST(a.n, b.n) >= GREATEST(a.n, b.n) * 0.8
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (a.n + b.n - len(list_intersect(a.sh, b.sh))) >= 0.8
    """,
)
def q26_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup (exact pairwise baseline, token shingles)."""
    docs = load(spark, sf_dir, "documents")
    return jaccard_pairs_exact(docs, "doc_id", "text", threshold=0.8)


@register("q27_minhash_near_dups")  # rows-only: xxhash64 not expressible in the oracle
def q27_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified (the at-scale dedup
    path: banded signature equi-join, no cross product). Recall vs the
    exact baseline is asserted in tests/test_dedup.py.
    """
    docs = load(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, use_char_ngrams=False
    )


def _simhash_md5_oracle(max_hamming: int = 3, n_blocks: int = 4) -> str:
    """DuckDB oracle that rebuilds simhash64_portable BIT-IDENTICALLY
    (md5 nibble votes; bit-63 mask is the literal −2⁶³ — emitted FIRST so
    the + chain's partial sums stay inside int64) and enumerates the
    SAME pair set: with n_blocks > max_hamming the pigeonhole blocking
    has recall exactly 1.0, so block-join candidates + Hamming verify
    equals brute force, and the whole LSH pipeline is hash-checkable."""
    terms = []
    for b in range(63, -1, -1):
        nib, sh = b // 4 + 1, b % 4
        mask = (1 << b) if b < 63 else -(1 << 63)
        vote = (
            f"coalesce(list_sum(list_transform(hx, h -> CASE WHEN "
            f"((strpos('0123456789abcdef', h[{nib}]) - 1) >> {sh}) & 1 = 1 "
            f"THEN 1 ELSE -1 END)), 0)"
        )
        terms.append(
            f"(CASE WHEN {vote} > 0 THEN CAST({mask} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    sim_expr = "\n        + ".join(terms)
    bits = 64 // n_blocks
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ), hxs AS (
      SELECT doc_id, list_transform(tk, t -> md5(t)) AS hx FROM toks
    ), sims AS (
      SELECT doc_id, ({sim_expr}) AS sim FROM hxs
    ), off AS (SELECT UNNEST(range({n_blocks})) AS bi),
    blocks AS (
      SELECT doc_id, sim, bi,
             (sim >> CAST(bi * {bits} AS INT)) & {(1 << bits) - 1} AS bv
      FROM sims, off
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.sim AS sa, b.sim AS sb
      FROM blocks a JOIN blocks b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@register("q28_simhash_near_dups", oracle=_simhash_md5_oracle(3, 4))
def q28_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via block-permutation LSH + Hamming verify
    — FULLY hash-oracle-checked since round 5: the md5-based portable
    hash family (functions/hashing.py simhash64_portable, the q284
    cross-engine trick) lets DuckDB rebuild identical simhashes, and
    pigeonhole blocking's exact recall makes the LSH output equal brute
    force, so the oracle enumerates the identical pair set end-to-end.
    xxhash64 simhash (the marginally cheaper production kernel) keeps
    its own recall/Hamming pins in tests/test_dedup.py."""
    docs = load(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=3, portable_hash=True
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data curation surface)
# ---------------------------------------------------------------------------


@register(
    "q29_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / len(toks), 6) AS avg_token_len
    FROM t WHERE len(toks) > 0
    """,
)
def q29_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) per document."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    out = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
                "double"
            )
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )
    return out.filter(F.col("n_tokens") > 0)


@register(
    "q30_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             text,
             length(text) AS n_chars,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a'))) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           CAST(CASE WHEN len(toks) >= 10
                      AND CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)/n_chars <= 0.1
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM t WHERE len(toks) > 0 AND n_chars > 0
    """,
)
def q30_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword features + keep flag."""
    docs = load(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    out = docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    keep = (F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.1)
    return out.withColumn("keep", F.when(keep, 1).otherwise(0).cast("long"))


def _langid_oracle() -> str:
    counts = []
    for lang, words in LANG_MARKERS.items():
        inlist = ",".join(f"'{w}'" for w in words)
        counts.append(
            f"len(list_filter(toks, x -> x IN ({inlist}))) AS c_{lang}"
        )
    count_sql = ",\n             ".join(counts)
    langs = list(LANG_MARKERS.keys())
    greatest = "GREATEST(" + ", ".join(f"c_{la}" for la in langs) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for la in langs:
        case += f"WHEN c_{la} = {greatest} THEN '{la}' "
    case += "END"
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             {count_sql}
      FROM t
    )
    SELECT doc_id, lang, {case} AS guess,
           CAST(CASE WHEN ({case}) = lang THEN 1 ELSE 0 END AS BIGINT) AS correct
    FROM c
    """


@register("q31_langid", oracle=_langid_oracle())
def q31_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language marker-token counts
    with fixed precedence, compared against the labeled lang.
    """
    docs = load(spark, sf_dir, "documents")
    guess = langid_guess(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("guess"),
        F.when(guess == F.col("lang"), 1).otherwise(0).cast("long").alias("correct"),
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COSINE_ORACLE = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
    s AS (
      SELECT qid AS query_id, cid AS neighbor_id,
             ROUND(
               list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
                  * SQRT(list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))))), 6) AS score
      FROM q, c WHERE cid <> qid
    )
    SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS rank
          FROM s)
    WHERE rank <= 5
"""


@register("q32_cosine_topk", allow_non_equi="broadcast-cross-join top-k whose query side is bounded by construction (the query set broadcasts; corpus side is linear)", oracle=_COSINE_ORACLE)
def q32_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: queries broadcast against the
    corpus, native zip_with/aggregate dot products, deterministic ranks.
    """
    emb = load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries_df, id_col="vec_id", vec_col="embedding", k=5)


@register("q33_ann_lsh_topk")  # rows-only: approximate by design
def q33_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the scale path). Recall vs the exact
    baseline is asserted in tests/test_similarity.py.
    """
    emb = load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk(
        emb, queries_df, dim=64, id_col="vec_id", vec_col="embedding", k=5, n_planes=8
    )


# ---------------------------------------------------------------------------
# Set ops, running windows, distinct enumeration (U1, W3-general, A6)
# ---------------------------------------------------------------------------


@register(
    "q34_union_by_name",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, CAST(NULL AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey % 2 = 1
    """,
)
def q34_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — unionByName with missing columns (the seeded-union idiom)."""
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    b = cust.filter(F.col("c_custkey") % 2 == 1).select("c_custkey", "c_mktsegment")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "q35_running_total",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0 AS running_value
    FROM events
    """,
)
def q35_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3-general — running prefix sum per entity (exact integer cents)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents(F.col("value"))).over(w).cast("double") / 100.0).alias(
            "running_value"
        ),
    )


@register(
    "q36_distinct_days",
    oracle="""
    SELECT DISTINCT strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
                    strftime(ts, '%d') AS day
    FROM events
    """,
)
def q36_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — distinct partition-tuple enumeration (zero-padded strings, the
    reference's partition-listing idiom)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.date_format("ts", "yyyy").alias("year"),
        F.date_format("ts", "MM").alias("month"),
        F.date_format("ts", "dd").alias("day"),
    ).distinct()


@register(
    "q37_summary_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events GROUP BY event_type
    """,
)
def q37_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — count / countDistinct / conditional-count summary stats."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).cast("long").alias(
            "n_outliers"
        ),
    )


# ---------------------------------------------------------------------------
# Geohash (P11), dims (P14/D2/J1), SQL consumption layer (S10/W9/O4),
# multimodal columns — round-2 coverage additions
# ---------------------------------------------------------------------------


def _geohash_oracle_sql(precision: int = 6) -> str:
    """Generate the DuckDB SQL that reproduces geohash_expr exactly:
    quantize → interleave → base-32 slice, written out as integer math."""
    bpa = precision * 5 // 2
    scale = 1 << bpa
    parts = []
    for i in range(bpa):
        parts.append(f"(((lon_q >> {bpa - 1 - i}) & 1) << {2 * bpa - 1 - 2 * i})")
        parts.append(f"(((lat_q >> {bpa - 1 - i}) & 1) << {2 * bpa - 2 - 2 * i})")
    inter = " + ".join(parts)
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = [
        f"substr('{b32}', CAST(((inter >> {5 * (precision - 1 - k)}) & 31) + 1 AS INT), 1)"
        for k in range(precision)
    ]
    return (
        _COORDS_CTE
        + f"""
    , q AS (
      SELECT event_id,
             LEAST(CAST(FLOOR((lon + 180.0)/360.0*{scale}.0) AS BIGINT), {scale - 1}) AS lon_q,
             LEAST(CAST(FLOOR((lat + 90.0)/180.0*{scale}.0) AS BIGINT), {scale - 1}) AS lat_q
      FROM coords
    ), inter_t AS (
      SELECT event_id, {inter} AS inter FROM q
    )
    SELECT event_id, {" || ".join(chars)} AS gh
    FROM inter_t
    """
    )


@register("q38_geohash_encode", oracle=_geohash_oracle_sql(6))
def q38_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — the reference's single Python UDF (geohash encoder,
    ``utils/common_functions_curated.py:164-185,283-317``) as a native
    column expression, hash-checked against an integer-math SQL oracle.
    """
    from noaa_ais_glue_lakehouse_spark.functions.spatial import geohash_expr

    ev = _with_coords(load(spark, sf_dir, "events"))
    return ev.select(
        "event_id", geohash_expr(F.col("lat"), F.col("lon"), 6).alias("gh")
    )


def _nav_status_values_sql() -> str:
    from noaa_ais_glue_lakehouse_spark.operators.dims import _NAV_STATUS_ROWS

    rows = ", ".join(f"({c}, '{n}')" for c, n, _ in _NAV_STATUS_ROWS)
    return f"dim(code, status_name) AS (VALUES {rows})"


@register(
    "q39_nav_status_lookup",
    oracle=f"""
    WITH {_nav_status_values_sql()}
    SELECT d.status_name, CAST(COUNT(*) AS BIGINT) AS n
    FROM events e LEFT JOIN dim d ON (e.event_id % 16) = d.code
    GROUP BY d.status_name
    """,
)
def q39_nav_status_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/D2/J1 — dim built with key-dedup from a dirty source, consumed
    via the broadcast lookup join (reference dim_nav_status + join_lookup).
    """
    from noaa_ais_glue_lakehouse_spark.operators.dims import (
        _NAV_STATUS_ROWS,
        build_dim_nav_status,
        join_lookup,
    )

    dirty = spark.createDataFrame(
        _NAV_STATUS_ROWS + _NAV_STATUS_ROWS[:4],  # injected dup keys → D2 dedup
        ["Code", "Navigational_Status", "Meaning"],
    )
    dim = build_dim_nav_status(dirty)
    ev = load(spark, sf_dir, "events").withColumn(
        "Status", (F.col("event_id") % 16).cast("int")
    )
    joined = join_lookup(ev, dim, "Status", "Code", "StatusName", "status_name")
    return joined.groupBy("status_name").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def _register_views(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    from noaa_ais_glue_lakehouse_spark.sources.writers import register_table_views

    register_table_views(spark, sf_dir, tables)


@register(
    "q40_sql_rows_per_day",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def q40_sql_rows_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + Q1 corpus — the rows-per-day shape through ``spark.sql`` over
    a registered view (the Athena external-table analog)."""
    _register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT date_format(ts, 'yyyy-MM-dd') AS day,
               CAST(COUNT(*) AS LONG) AS n
        FROM events GROUP BY 1
        """
    )


@register(
    "q41_sql_topk_users",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id ASC LIMIT 10
    """,
)
def q41_sql_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + O4/Q9 corpus — top-k via SQL text (TakeOrderedAndProject)."""
    _register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT user_id, CAST(COUNT(*) AS LONG) AS n
        FROM events GROUP BY user_id
        ORDER BY n DESC, user_id ASC LIMIT 10
        """
    )


@register(
    "q42_sql_gap_stats",
    oracle="""
    WITH lagged AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM lagged GROUP BY user_id
    """,
)
def q42_sql_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + W9/Q12 corpus — the LAG-gap analysis as pure SQL text
    (reference ``docs/09-qa-curated-data.md:278-307``)."""
    _register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH lagged AS (
          SELECT user_id,
                 unix_micros(ts) - unix_micros(LAG(ts) OVER (PARTITION BY user_id
                                                             ORDER BY ts, event_id)) AS gap_us
          FROM events
        )
        SELECT user_id,
               CAST(COUNT(gap_us) AS LONG) AS n_gaps,
               CAST(MIN(gap_us) AS LONG) AS min_gap_us,
               CAST(MAX(gap_us) AS LONG) AS max_gap_us,
               CAST(SUM(gap_us) AS LONG) AS sum_gap_us
        FROM lagged GROUP BY user_id
        """
    )


@register(
    "q43_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS asset_bytes,
           md5(text) AS asset_fingerprint
    FROM documents
    """,
)
def q43_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — opaque binary payload (document bytes stand in for an
    image blob) + typed metadata columns, all JVM-side expressions."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import binary_metadata

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = binary_metadata(docs, "payload")
    return out.select("doc_id", "asset_bytes", "asset_fingerprint")


@register(
    "q44_image_decode_stub",
    oracle="""
    SELECT doc_id AS id,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 7) % 640 AS INT) END AS width,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 13) % 480 AS INT) END AS height,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 31) % 4 AS INT) END AS channels,
           octet_length(encode(text)) > 0 AS decode_ok
    FROM documents
    """,
)
def q44_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batched ``mapInPandas`` decode plumbing run in
    ``use_stub=True`` mode. NAMING NOTE: "stub" here is the
    ORACLE-REPRODUCIBILITY mode, not a placeholder decoder — the REAL
    header decoders (PNG/JPEG/GIF/BMP byte parsing) exist in
    ``operators/multimodal.py`` and are hash-checked by q259 over
    synthesized-valid payloads. This entry deliberately feeds arbitrary
    (non-image) bytes through the same mapInPandas pipeline with the
    deterministic fake decoder, because arbitrary bytes have no real
    header to parse yet the SQL oracle must still reproduce every output
    value — it pins the Arrow batch plumbing, schema, and null handling
    independently of decode logic. The name is kept for driver-gate
    continuity (the per-round CORRECTNESS artifacts key on it)."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import decode_images

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_images(docs, "doc_id", "payload", use_stub=True)


@register(
    "q45_frame_sample",
    oracle="""
    SELECT event_id,
           CAST(unnest(range(0, CAST(event_id % 50 AS BIGINT), 7)) AS BIGINT) AS frame_idx
    FROM events
    """,
)
def q45_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — frame-sampling keep-rule as a pure Spark plan
    (sequence + explode); the decode of kept frames would chain a
    mapInPandas step like q44."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import sample_frames

    ev = load(spark, sf_dir, "events").withColumn(
        "n_frames", (F.col("event_id") % 50).cast("long")
    )
    return sample_frames(ev, "event_id", "n_frames", 7)


@register(
    "q46_cosine_dup_exact",
    baseline_only=True,  # O(n²) oracle anchor for q47/q64 recall
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) >= 0.4
    """,
)
def q46_cosine_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, exact all-pairs baseline (the oracle
    anchor for the LSH scale path q47)."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import cosine_pairs_exact

    emb = load(spark, sf_dir, "embeddings")
    return cosine_pairs_exact(emb, "vec_id", "embedding", threshold=0.4)


@register("q47_cosine_dup_lsh")  # rows-only: LSH recall < 1 by design
def q47_cosine_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via multi-table hyperplane LSH + exact
    verify — the mid-scale embedding dedup path; recall vs q46 is
    asserted in tests/test_similarity.py. Since round 6 this production
    path runs CORPUS-SIZED geometry (``lsh_geometry_for``: planes ~
    log2(n), tables from the recall integral — the library default),
    retiring the fixed 4×16 geometry whose decade exponent measured 1.88
    (SCALING.md); the fixed form survives only as a pinned test surface
    via explicit ``n_planes=/n_tables=``. Verify is the default
    join-attach form (vectors re-attach to the candidate pairs via two
    equi-joins): no driver-side collect anywhere on this path, so it
    survives a corpus that outgrows driver memory. The broadcast-matrix
    verify (16-byte pair transport) remains available behind
    ``broadcast_matrix_verify=True`` for corpora known to fit in
    executor memory; the truly-at-scale variants are the clustered
    (q64) and IVF (q55) paths."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        cosine_near_duplicates,
    )

    emb = load(spark, sf_dir, "embeddings")
    return cosine_near_duplicates(emb, dim=64, threshold=0.4)


@register(
    "q48_bpe_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
             AS n_distinct
    FROM documents
    """,
)
def q48_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer-style token counting (letter runs / digit runs /
    punctuation) — the no-vocab LLM token-budget proxy."""
    from noaa_ais_glue_lakehouse_spark.functions.text import bpe_ish_tokens

    docs = load(spark, sf_dir, "documents")
    toks = bpe_ish_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


@register(
    "q49_winnow_fingerprints",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) - 6),
                            i -> md5(substr(lower(text), i, 8))) AS hashes
      FROM documents
      WHERE length(text) >= 8
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hashes) - 2),
                           j -> list_min(hashes[j : j + 3]))) AS fps
      FROM grams
      WHERE len(hashes) >= 4
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM wins
    """,
)
def q49_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (k=8, w=4), exploded to one row per
    (doc, fingerprint) — the local-fingerprint index a plagiarism/overlap
    detector joins on."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_fingerprint_index,
    )

    docs = load(spark, sf_dir, "documents")
    return winnow_fingerprint_index(docs, "doc_id", "text", 8, 4)


@register(
    "q50_day_boundary_span",
    oracle="""
    WITH bounds AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, d, last_ts,
             LEAD(first_ts) OVER (PARTITION BY user_id ORDER BY d) AS next_first,
             LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
      FROM bounds
    )
    SELECT user_id, CAST(d AS VARCHAR) AS day,
           CAST((epoch_us(next_first) - epoch_us(last_ts)) // 60000000 AS BIGINT)
             AS boundary_gap_min
    FROM spans
    WHERE next_d = d + INTERVAL 1 DAY
      AND epoch_us(next_first) - epoch_us(last_ts) < CAST(7200 AS BIGINT) * 1000000
    """,
)
def q50_day_boundary_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + Q15 corpus — day-boundary span check: entities whose last
    event of day D and first event of day D+1 are within 2h (the
    continuity QA the reference runs on voyage day boundaries,
    ``docs/09-qa-curated-data.md:703-723``)."""
    _register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH bounds AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
                 MIN(ts) AS first_ts, MAX(ts) AS last_ts
          FROM events GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, d, last_ts,
                 LEAD(first_ts) OVER (PARTITION BY user_id ORDER BY d) AS next_first,
                 LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
          FROM bounds
        )
        SELECT user_id, CAST(d AS STRING) AS day,
               CAST((unix_micros(next_first) - unix_micros(last_ts)) DIV 60000000 AS LONG)
                 AS boundary_gap_min
        FROM spans
        WHERE next_d = d + INTERVAL 1 DAY
          AND unix_micros(next_first) - unix_micros(last_ts) < CAST(7200 AS BIGINT) * 1000000
        """
    )


@register(
    "q51_movement_distribution",
    oracle="""
    SELECT CASE WHEN value < 250.0 THEN 'anchored' ELSE 'moving' END AS movement_state,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def q51_movement_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 + Q4 corpus — movement_state distribution (threshold applied to
    the synthetic value column standing in for SOG)."""
    ev = load(spark, sf_dir, "events")
    out = cleaning.add_movement_state(ev, sog_col="value", threshold=250.0)
    return out.groupBy("movement_state").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "q52_jump_outliers",
    oracle=_COORDS_CTE
    + """
    , lagged AS (
      SELECT user_id, event_id, lat, lon, ts,
             LAG(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
             LAG(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon
      FROM coords
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_outliers,
           CAST(MAX(CAST(ROUND(2*6371*ASIN(LEAST(SQRT(
             POW(SIN(RADIANS(lat-plat)/2),2)
             + COS(RADIANS(plat))*COS(RADIANS(lat))*POW(SIN(RADIANS(lon-plon)/2),2)
           ), 1.0)) * 100) AS BIGINT)) AS DOUBLE)/100.0 AS max_jump_km
    FROM lagged
    WHERE plat IS NOT NULL AND 2*6371*ASIN(LEAST(SQRT(
             POW(SIN(RADIANS(lat-plat)/2),2)
             + COS(RADIANS(plat))*COS(RADIANS(lat))*POW(SIN(RADIANS(lon-plon)/2),2)
           ), 1.0)) > 20
    GROUP BY user_id
    """,
)
def q52_jump_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 corpus — segment-distance outlier filter (>20 km) rolled up per
    entity (reference ``docs/09-qa-curated-data.md:431-445``)."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = haversine_km(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    return (
        ev.withColumn("_d", d)
        .filter(F.col("_d") > 20)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_outliers"),
            (F.max(F.round(F.col("_d") * 100).cast("long")).cast("double") / 100.0)
            .alias("max_jump_km"),
        )
    )


@register(
    "q53_voyage_continuity",
    oracle="""
    WITH sess AS (
      SELECT user_id, ts,
             SUM(CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM (
        SELECT user_id, ts, event_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)) AS gap_us
        FROM events
      )
    )
    SELECT user_id,
           CAST(MIN(sid) AS BIGINT) AS first_session,
           CAST(MAX(sid) AS BIGINT) AS last_session,
           CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions
    FROM sess GROUP BY user_id
    """,
)
def q53_voyage_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 corpus — voyage/session continuity check: ids per entity must
    run 0..n-1 densely (min/max/count-distinct agree), the invariant the
    reference validates after incremental runs (``docs/09:567-581``)."""
    ev = load(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap_seconds=SESSION_GAP_SECONDS,
        tiebreak_cols=["event_id"],
    )
    return sess.groupBy("user_id").agg(
        F.min("session_id").cast("long").alias("first_session"),
        F.max("session_id").cast("long").alias("last_session"),
        F.countDistinct("session_id").cast("long").alias("n_sessions"),
    )


@register(
    "q54_seeded_sessionize",
    oracle="""
    WITH sess AS (
      SELECT user_id, event_id, ts,
             SUM(CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM (
        SELECT user_id, ts, event_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)) AS gap_us
        FROM events
      )
    )
    SELECT user_id, event_id, CAST(sid AS BIGINT) AS session_id
    FROM sess WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    """,
)
def q54_seeded_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/T1 — the reference's hardest semantic, oracle-checked: the
    incremental path (sessionize the first half-month, snapshot the last
    row per entity, run the second half seeded from the snapshot) must
    equal a full-recompute — and the oracle IS that full recompute,
    restricted to second-half rows. Day-boundary voyages keep their ids.
    """
    import datetime as dt

    from noaa_ais_glue_lakehouse_spark.operators.sessionize import (
        latest_per_entity,
    )
    from noaa_ais_glue_lakehouse_spark.operators.state import prepare_seeded_union

    split = dt.datetime(2024, 1, 16)
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    d1 = ev.filter(F.col("ts") < F.lit(split))
    d2 = ev.filter(F.col("ts") >= F.lit(split))

    s1 = sessionize(
        d1, "user_id", "ts", gap_seconds=SESSION_GAP_SECONDS,
        tiebreak_cols=["event_id"],
    )
    state = latest_per_entity(s1, "user_id", "ts", tiebreak_cols=["event_id"])

    seeded = prepare_seeded_union(
        state, d2, session_col="session_id", seed_col="seed_session_id"
    )
    out = sessionize(
        seeded, "user_id", "ts", gap_seconds=SESSION_GAP_SECONDS,
        session_col="session_id", seed_col="seed_session_id",
        tiebreak_cols=["event_id"],
    )
    return (
        out.filter(~F.col("is_seed"))
        .select("user_id", "event_id", F.col("session_id").cast("long"))
    )


@register("q55_ivf_topk", build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests")  # rows-only: k-means assignment not SQL-expressible
def q55_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (coarse k-means quantizer + probed exact
    scoring) — the inverted-file alternative to the q33 LSH path; recall
    vs brute force asserted in tests/test_similarity.py."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(10)
    return ivf_topk(emb, queries, dim=64, k=5)


@register(
    "q56_enforced_read_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q56_enforced_read_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — schema-enforced parquet read with cast-by-name fallback: the
    declared read schema drops to exactly the needed columns (projection
    enforced at the scan) and survives type drift via the fallback path."""
    from pyspark.sql import types as T

    from noaa_ais_glue_lakehouse_spark.sources.readers import read_parquet_enforced

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    ev = read_parquet_enforced(spark, f"{sf_dir}/events.parquet", schema)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias(
            "sum_value"
        ),
    )


@register(
    "q57_asof_join",
    oracle="""
    WITH ref AS (
      SELECT user_id, ts, MAX(value) AS ref_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), probe AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type <> 'view'
    )
    SELECT p.event_id,
           CAST(ROUND(r.ref_value * 100) AS BIGINT) AS asof_value_cents
    FROM probe p ASOF LEFT JOIN ref r
      ON p.user_id = r.user_id AND p.ts >= r.ts
    """,
)
def q57_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator Spark lacks): each non-view event gets
    the latest at-or-before 'view' value for its user — one shuffle via
    the union + last-known-value window, hash-checked against DuckDB's
    native ASOF JOIN."""
    from noaa_ais_glue_lakehouse_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
    )
    probe = ev.filter(F.col("event_type") != "view").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(probe, ref, "user_id", "ts", ["ref_value"])
    return out.select(
        "event_id",
        F.round(F.col("asof_ref_value") * 100).cast("long").alias("asof_value_cents"),
    )


@register(
    "q58_rolling_1h_window",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q58_rolling_1h_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame rolling window: per-entity trailing-1h event count and
    sum — the time-range frame (vs the rows frames used elsewhere),
    ordered on epoch micros so both engines share tie semantics."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("sum_cents_1h"),
    )


@register(
    "q59_range_join",
    oracle="""
    WITH bands AS (
      SELECT CAST(i AS INT) AS band_id,
             i * 100.0 AS lo, i * 100.0 + 120.0 AS hi
      FROM generate_series(0, 4) AS t(i)
    )
    SELECT b.band_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
    GROUP BY b.band_id
    """,
)
def q59_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join via grid binning (no theta join): events whose
    value falls inside overlapping 120-wide bands — each event lands in
    one bin, each band explodes to its bins, equi-join + exact BETWEEN."""
    from noaa_ais_glue_lakehouse_spark.operators.rangejoin import range_join

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(
        [(i, i * 100.0, i * 100.0 + 120.0) for i in range(5)],
        ["band_id", "lo", "hi"],
    )
    joined = range_join(ev, bands, "value", "lo", "hi", bin_width=50.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


@register(
    "q60_time_bucket_rollup",
    oracle="""
    SELECT user_id,
           make_timestamp(epoch_us(ts) // 21600000000 * 21600000000) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """,
)
def q60_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket rollup: arbitrary-width (6h) aligned
    buckets per entity — the continuous-aggregate shape; partials are
    map-side combinable and an incremental refresh only rewrites dirty
    buckets (the daily-partials pipeline is the day-width instance)."""
    ev = load(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 21600).cast("long") * 21600
    )
    return ev.groupBy("user_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


_WINNOW_PAIRS_SQL = """
      WITH grams AS (
        SELECT doc_id,
               list_transform(range(1, length(lower(text)) - 6),
                              i -> md5(substr(lower(text), i, 8))) AS hashes
        FROM documents WHERE length(text) >= 8
      ), wins AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hashes) - 2),
                             j -> list_min(hashes[j : j + 3]))) AS fps
        FROM grams WHERE len(hashes) >= 4
      ), idx AS (
        SELECT doc_id, unnest(fps) AS fp FROM wins
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
"""


def _cc_oracle(tail: str, pairs_sql: str = _WINNOW_PAIRS_SQL, rounds: int = 8) -> str:
    """Bounded-iteration connected-components oracle over a pair list —
    chained CTEs instead of an unbounded ``WITH RECURSIVE``, which on the
    sf0.1 duplicate graph (~4M pairs, quasi-clique components) explodes
    its intermediate (node, label) set and never finishes; the chained
    form completes in minutes at sf0.1 (the q235/q236 LPA/k-core
    pattern), closing the round-3 sf0.1 verification gap for the
    dup-graph family.

    Each round applies the monotone map
    ``label' = min(label, min neighbor label, label(label))``
    (min-label propagation + pointer jumping → O(log diameter) rounds).
    ``comp`` keeps only nodes whose label did NOT change in the final
    round, so an unconverged run DROPS rows and fails the gate's
    row-count check instead of silently passing with wrong components.
    A run where all rows survive is provably exact: labels are node ids
    within the component and monotone non-increasing, and at a per-node
    fixpoint ``label(u) <= label(w)`` along every edge, which forces
    ``label == component-min`` along any path to the min node.

    ``tail`` is the oracle's final SELECT (and any extra CTEs, comma-
    prefixed); it sees ``p(id_a, id_b)``, ``edges(src, dst)``, and
    ``comp(node, component)``.
    """
    ctes = [
        f"p AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p"
        " UNION ALL SELECT id_b, id_a FROM p)",
        "l0 AS MATERIALIZED (SELECT src AS node, LEAST(src, MIN(dst)) AS label"
        " FROM edges GROUP BY src)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
      SELECT cur.node,
             LEAST(cur.label, jmp.label, COALESCE(nb.minlbl, cur.label)) AS label
      FROM l{k - 1} cur
      JOIN l{k - 1} jmp ON jmp.node = cur.label
      LEFT JOIN (SELECT e.dst AS node, MIN(c2.label) AS minlbl
                 FROM edges e JOIN l{k - 1} c2 ON c2.node = e.src
                 GROUP BY e.dst) nb ON nb.node = cur.node
    )"""
        )
    ctes.append(
        f"""comp AS (
      SELECT a.node, CAST(a.label AS BIGINT) AS component
      FROM l{rounds} a JOIN l{rounds - 1} b ON a.node = b.node
      WHERE a.label = b.label
    )"""
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + tail


@register(
    "q61_winnow_near_dups",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) - 6),
                            i -> md5(substr(lower(text), i, 8))) AS hashes
      FROM documents WHERE length(text) >= 8
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hashes) - 2),
                           j -> list_min(hashes[j : j + 3]))) AS fps
      FROM grams WHERE len(hashes) >= 4
    ), idx AS (
      SELECT doc_id, unnest(fps) AS fp FROM wins
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 10
    """,
)
def q61_winnow_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-based near-dup pairs: self-join the fingerprint index on
    fingerprint, keep pairs sharing ≥10 fingerprints. Deterministic (no
    randomness), so unlike the MinHash path this near-dup family is fully
    oracle-checked. Equi-join on fingerprint — same no-cross-product
    shape as LSH banding."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    return winnow_near_duplicates(docs, "doc_id", "text", 8, 4, min_shared=10)


@register(
    "q62_dedup_components",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle=_cc_oracle(
        """SELECT node AS doc_id, component FROM comp"""
    ),
)
def q62_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the winnowing near-dup graph — the
    pairs→groups step of dedup. Deterministic input graph (q61), so the
    distributed min-label + pointer-doubling loop is hash-checked against
    a recursive-CTE reachability oracle."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import connected_components

    pairs = q61_winnow_near_dups(spark, sf_dir).select("id_a", "id_b")
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("component")
    )


@register(
    "q63_sketch_distinct_quantiles",
    oracle="""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day, user_id, value, event_id
      FROM events
    ), h AS (
      SELECT day,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                  AS BIGINT) AS reg,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 3, 13))
                  AS BIGINT) AS v52
      FROM base
    ), regs AS (
      SELECT day, reg,
             MAX(CASE WHEN v52 = 0 THEN 53
                      ELSE 53 - length(bin(v52)) END) AS m_j
      FROM h GROUP BY day, reg
    ), agg AS (
      SELECT day, COUNT(*) AS n_present,
             SUM(9007199254740992 >> m_j) AS sum_u
      FROM regs GROUP BY day
    ), est AS (
      SELECT day,
             ROUND(
               CASE
                 WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                      * 9007199254740992.0
                      / (sum_u + (256 - n_present) * 9007199254740992.0)
                      <= 640.0
                  AND n_present < 256
                 THEN 256.0 * ln(256.0 / GREATEST(256 - n_present, 1))
                 ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                      * 9007199254740992.0
                      / (sum_u + (256 - n_present) * 9007199254740992.0)
               END, 2) AS approx_users
      FROM agg
    ), samp AS (
      SELECT day, value, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY day
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS hrk
      FROM base
    ), rk AS (
      SELECT day, value,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY value, event_id) AS vrk,
             COUNT(*) OVER (PARTITION BY day) AS ns
      FROM samp WHERE hrk <= 1024
    ), qs AS (
      SELECT day,
             MAX(CASE WHEN vrk = CEIL(0.5 * ns) THEN value END) AS p50_value,
             MAX(CASE WHEN vrk = CEIL(0.95 * ns) THEN value END) AS p95_value
      FROM rk GROUP BY day
    )
    SELECT est.day, est.approx_users, qs.p50_value, qs.p95_value
    FROM est JOIN qs USING (day)
    """,
)
def q63_sketch_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates under the driver's eye — since round 7 on the
    PORTABLE md5 family (operators/sketches.py), so the per-day HLL
    distinct-user estimate AND the sampled p50/p95 value quantiles are
    themselves hash-checked against the oracle, not just
    tolerance-pinned: both engines build identical registers (md5 first
    byte → register, next 52 bits → ρ) and draw the identical
    1024-row min-hash sample per day. The Spark-native HLL++ /
    approx_percentile forms stay available as the fast engine twins
    (approx_distinct_by / approx_quantiles_by, tolerance-pinned in
    tests/test_sketches.py).

    Scale: register state is ≤256 rows/day and the quantile sample
    ≤1024 rows/day regardless of corpus size; the register groupBy is
    map-side combinable, the sample top-k is the standard per-group
    window. The shuffle carries sketches, never the value set."""
    from noaa_ais_glue_lakehouse_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
        portable_sample_quantiles,
    )

    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    distinct = portable_hll_estimate(
        portable_hll_registers(ev, ["day"], "user_id"), ["day"]
    )
    quants = portable_sample_quantiles(
        ev, ["day"], "value", "event_id", [0.5, 0.95], k=1024
    )
    return distinct.join(quants, "day").select(
        "day",
        F.col("hll_estimate").alias("approx_users"),
        F.col("q50_value").alias("p50_value"),
        F.col("q95_value").alias("p95_value"),
    )


@register("q64_cosine_dup_cluster", build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests")  # rows-only: k-means clustering not SQL-expressible
def q64_cosine_dup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered embedding dedup (SemDeDup shape): k-means multi-assign +
    per-cluster BLAS similarity matrix via applyInPandas — the scale path
    when the threshold sits too close to the random-pair cosine for
    sign-LSH to prune. Precision exact (scores match q46 on found pairs);
    recall vs q46 asserted in tests/test_similarity.py."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        cosine_near_duplicates_clustered,
    )

    emb = load(spark, sf_dir, "embeddings")
    return cosine_near_duplicates_clustered(emb, dim=64, threshold=0.4)


@register(
    "q65_dedup_survivors",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle=_cc_oracle(
        """, losers AS (SELECT node FROM comp WHERE component <> node)
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
    FROM documents d ANTI JOIN losers l ON d.doc_id = l.node"""
    ),
)
def q65_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup: winnowing near-dup pairs → connected components →
    min-id survivor per component + all untouched docs (dedup_by_components)
    — the full pairs→groups→survivors chain a training pipeline runs, fully
    hash-checked against a recursive-CTE oracle (deterministic family)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        dedup_by_components,
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = winnow_near_duplicates(docs, "doc_id", "text", 8, 4, min_shared=10)
    survivors = dedup_by_components(docs, pairs.select("id_a", "id_b"), "doc_id")
    return survivors.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )


@register(
    "q66_stratified_sample",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE CAST(((event_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
          < CASE event_type WHEN 'view' THEN 0.1 WHEN 'click' THEN 0.5 ELSE 1.0 END
    """,
)
def q66_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-class subsampling (corpus rebalancing): keep 10%
    of views, 50% of clicks, everything else — id-hash order, not RNG, so
    the sample is reproducible across runs AND engines (the oracle runs
    the identical arithmetic). Row-local filter, no shuffle."""
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        deterministic_stratified_sample,
    )

    ev = load(spark, sf_dir, "events")
    return deterministic_stratified_sample(
        ev, "event_id", "event_type", {"view": 0.1, "click": 0.5}
    ).select("event_id", "event_type")


@register(
    "q67_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 32 AS INT) AS shard,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / 512.0) AS BIGINT) AS bin_id
    FROM t
    """,
)
def q67_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concatenate-then-chop): documents
    stream in id order per shard; window id = floor(tokens_before / 512).
    One window pass partitioned by shard — shards pack independently, so
    there is no global-ordering bottleneck at any corpus size."""
    from noaa_ais_glue_lakehouse_spark.operators.training import pack_sequences

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    with_counts = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(
        with_counts, "doc_id", "n_tokens", context_tokens=512, n_shards=32
    )
    return packed.select("doc_id", "shard", "n_tokens", "bin_id")


@register(
    "q68_json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q68_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column with a
    declared schema (from_json — JVM-side, no UDF) and aggregate the
    extracted field. Schema-on-read for event payloads; malformed rows
    yield NULL and are filtered, never crash the scan."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "struct<k:int>").getField("k")
    return (
        ev.withColumn("_k", k)
        .filter(F.col("_k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.max("_k").cast("long").alias("max_k"),
        )
    )


@register(
    "q69_dedup_survivors_quality",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle=_cc_oracle(
        """, ranked AS (
      SELECT c.node,
             ROW_NUMBER() OVER (
               PARTITION BY c.component
               ORDER BY length(d.text) DESC, c.node ASC
             ) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ), losers AS (
      SELECT node FROM ranked WHERE rn > 1
    )
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
    FROM documents d ANTI JOIN losers l ON d.doc_id = l.node"""
    ),
)
def q69_dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: per near-dup component keep the
    LONGEST document (ties → min id) instead of the min-id representative
    — what production corpus dedup keeps. Same recursive-CTE oracle as
    q65 with an argmax-per-component ranking."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        dedup_by_components,
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents").withColumn(
        "_len", F.length("text").cast("long")
    )
    pairs = winnow_near_duplicates(docs, "doc_id", "text", 8, 4, min_shared=10)
    survivors = dedup_by_components(
        docs, pairs.select("id_a", "id_b"), "doc_id", quality_col="_len"
    )
    return survivors.select("doc_id", F.col("_len").alias("n_chars"))


@register(
    "q70_streaming_sessionize",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts,
             EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
      FROM events
    )
    SELECT user_id, ts,
           CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM lagged
    """,
)
def q70_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming under the driver's gate: a file-source
    stream (availableNow) over the events table, sessionized with the
    applyInPandasWithState custom stateful operator, materialized through
    a memory sink — and hash-checked against the batch prefix-sum SQL.
    Streaming == batch semantics is the property the reference's
    batch-simulated streaming (SURVEY §2.9) relies on; here it is proven
    per run, not assumed. The blocking awaitTermination happens at plan
    build (bounded: availableNow drains and stops), like the IVF
    trainer's bounded collect."""
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import stateful_sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    # the file stream source requires a DIRECTORY; the testdata table is a
    # single parquet file, so stage a temp dir holding a symlink to it
    # (zero-copy drop directory)
    import os

    drop_dir = tempfile.mkdtemp(prefix="q70_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(file_schema)
        .parquet(drop_dir)
        .select(
            F.col("user_id"),
            F.col("ts").cast(T.TimestampType()).alias("ts"),
        )
    )
    out = stateful_sessionize(stream, "user_id", "ts", gap_seconds=1800.0)
    name = f"q70_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q70_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("user_id", "ts", "session_id")


@register(
    "q71_normalize_stopwords",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks,
             list_filter(toks, x -> x NOT IN
               ('a','an','and','are','as','at','be','by','for',
                'in','is','it','of','on','or','the','to','with')) AS kept
      FROM t
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS normalized,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
    FROM f
    """,
)
def q71_normalize_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization: stopword removal (the cleaning step before
    quality scoring / fingerprinting), emitting the normalized text and
    the removed-token count. Pure JVM column expressions; verified
    byte-for-byte against the DuckDB list_filter oracle."""
    from noaa_ais_glue_lakehouse_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    kept = remove_stopwords(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("normalized"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


@register(
    "q72_part_type_revenue",
    oracle="""
    SELECT p.p_type,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE)/100.0
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    """,
)
def q72_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape fact⋈dim revenue rollup over the part table: the
    dimension side broadcasts (|part| « |lineitem|), integer-cents sums
    keep the aggregate order-independent for cross-engine hashing."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type")
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                        "long"
                    )
                ).cast("double")
                / 100.0
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q73_rollup_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q73_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — one pass produces the
    (flag, status), (flag), and grand-total grains (Spark expands to a
    single expand+aggregate, no re-scan per grain). NULL grouping slots
    coalesced to 'ALL' so the cross-engine hash is unambiguous."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_lines",
        )
    )


@register(
    "q74_pivot_event_types",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup
    FROM events GROUP BY 1
    """,
)
def q74_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide per-day type counts with an EXPLICIT value list —
    without it Spark runs a driver-side distinct scan to discover pivot
    columns (a hidden extra job at 100 TB) and the output schema becomes
    data-dependent."""
    ev = load(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "error", "signup"]
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


@register(
    "q75_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q75_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the spark.sql surface (S10): Catalyst
    decorrelates to a left-semi hash join — the rewrite the reference
    relied on Athena for. Registered views keep the query text engine-
    portable."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@register(
    "q76_median_value_per_type",
    oracle="""
    SELECT event_type,
           ROUND(MEDIAN(value), 6) AS median_value,
           ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90_value
    FROM events GROUP BY event_type
    """,
)
def q76_median_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median/percentile (percentile_cont) — the exact
    counterpart of the q63 sketch quantiles; linear-interpolation
    semantics match across engines, rounded to 6dp for hash stability.
    At 100 TB the sketch path (q63) is the default; this is the
    verification-grade variant for bounded groups."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"), 6).alias(
            "median_value"
        ),
        F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)"), 6).alias(
            "p90_value"
        ),
    )


# ---------------------------------------------------------------------------
# Timeseries imputation, multidim aggregation, reshaping, rank analytics
# (round-3 widening: W-family + A-family shapes the reference's SQL corpus
# implies but never names, plus training-data curation signals)
# ---------------------------------------------------------------------------


@register(
    "q77_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS filled_value
    FROM events
    """,
)
def q77_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward) per entity: the
    standard sensor-gap imputation the reference's cleaning stage leaves to
    consumers. `last(ignorenulls=True)` over a running row frame is one
    window pass on the entity shuffle — no self-join, no explode. Values
    observed during 'error' events are masked to NULL and re-imputed from
    the most recent healthy observation."""
    ev = load(spark, sf_dir, "events")
    healthy = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(healthy, ignorenulls=True).over(w), 6).alias("filled_value"),
    )


@register(
    "q78_resample_hourly",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS n_in_hour
      FROM events
    ), hourly AS (
      SELECT user_id, hour_ts, n_in_hour AS n_events, value AS last_value
      FROM ranked WHERE rn = 1
    ), spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
      FROM spans
    )
    SELECT g.user_id,
           strftime(g.hour_ts, '%Y-%m-%d %H:%M') AS hour,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
           ROUND(LAST_VALUE(h.last_value IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.hour_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour_ts = h.hour_ts
    """,
)
def q78_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling (downsample-to-hour + gap-fill): per entity,
    materialize the full hourly grid between first and last observation
    (`sequence` + `explode` — grid rows are generated distributed, never on
    the driver), left-join the per-hour rollup, and forward-fill empty
    hours from the last observed value.

    Scale shape: the per-hour rollup, the span agg, the grid join and the
    fill window all share the `user_id` hash partitioning, so the whole
    resample is one shuffle of the input plus a skinny |entities|-sized
    span table. Grid cardinality is bounded by time-range/step per entity,
    independent of event count — safe at 100 TB where events/entity is the
    thing that explodes, not the calendar."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour_ts")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
    )
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts"),
    )
    joined = grid.join(hourly, ["user_id", "hour_ts"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.last("last_value", ignorenulls=True).over(w), 6).alias("filled_value"),
    )


@register(
    "q79_cube_event_counts",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS gid
    FROM events
    GROUP BY CUBE(event_type, CAST(ts AS DATE))
    """,
)
def q79_cube_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, day) with `grouping_id` disambiguation — the
    all-subtotal companion of q73's ROLLUP. Spark expands the cube
    map-side (one shuffle carries all 4 grouping sets with partial
    aggregation), so the cost is ~the grouping-set count, not 4 scans."""
    ev = load(spark, sf_dir, "events")
    cubed = ev.cube("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.grouping_id().cast("long").alias("gid"),
    )
    return cubed.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
        "n_events",
        "gid",
    )


@register(
    "q80_unpivot_daily_counts",
    oracle="""
    WITH wide AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
             CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
             CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup
      FROM events GROUP BY 1
    )
    SELECT day, 'n_view' AS metric, n_view AS cnt FROM wide
    UNION ALL SELECT day, 'n_click', n_click FROM wide
    UNION ALL SELECT day, 'n_purchase', n_purchase FROM wide
    UNION ALL SELECT day, 'n_error', n_error FROM wide
    UNION ALL SELECT day, 'n_signup', n_signup FROM wide
    """,
)
def q80_unpivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt), the inverse of q74's pivot. Spark's
    `unpivot` compiles to a generate/expand projection — no shuffle beyond
    the one that built the wide table, and no driver-side column
    discovery."""
    ev = load(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "error", "signup"]
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in types
            ],
        )
    )
    return wide.unpivot(["day"], [f"n_{t}" for t in types], "metric", "cnt")


@register(
    "q81_user_value_ranks",
    oracle="""
    WITH totals AS (
      SELECT event_type, user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, total_cents,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM totals
    WINDOW w AS (PARTITION BY event_type ORDER BY total_cents DESC, user_id)
    """,
)
def q81_user_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-analytics family in one pass: row_number / ntile / percent_rank
    / cume_dist over a per-type leaderboard. The user_id tiebreak makes the
    order total, so every rank function is deterministic cross-engine. Agg
    and all four window functions share the event_type partitioning."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(cents(F.col("value"))).alias("total_cents")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_cents"), "user_id")
    return totals.select(
        "event_type",
        "user_id",
        "total_cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism — ONLY when the scan
    produced fewer partitions than cores (round 6). The gram-explode
    family does heavy row-local compute per input row (tokenize →
    n-grams → md5 per gram), and a corpus that fits one parquet split
    runs all of it in ONE task: q372 measured 12 s → 4.5 s at sf0.1
    from this spread alone. At 100 TB the scan already has ~10⁶ splits
    and the condition is false, so no shuffle is added where shuffling
    the raw text would actually cost something.

    Round 7: delegates to the library operator (promoted per round-6
    verdict) so user pipelines get the same fix — also reachable via
    ``read_parquet_table(..., spread_small_scans=True)``."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        spread_partitions,
    )

    return spread_partitions(df)


def _word_ngrams(toks: F.Column, n: int) -> F.Column:
    """Word n-grams of a token array as joined strings — pure column
    expressions (sequence + transform + slice), JVM-side, no explode until
    the caller asks for one."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "q82_dup_ngram_rate",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 5
                  THEN list_transform(range(1, len(toks) - 3),
                                      i -> array_to_string(toks[i:i+4], ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
             AS dup_rate
    FROM g WHERE len(grams) > 0
    """,
)
def q82_dup_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-5-gram rate — the repetition signal
    used to flag boilerplate/spam docs in LLM corpus curation (high
    dup-rate ⇒ templated or looping text). Entirely column expressions:
    n-grams built with sequence+transform+slice, counted with
    array_distinct — zero explode, zero shuffle beyond the scan."""
    docs = load(spark, sf_dir, "documents")
    grams = _word_ngrams(tokenize(F.col("text")), 5)
    out = docs.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
    ).where(F.col("n_grams") > 0)
    return out.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 6).alias("dup_rate"),
    )


@register(
    "q83_benchmark_contamination",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 8
                  THEN list_distinct(list_transform(range(1, len(toks) - 6),
                                     i -> array_to_string(toks[i:i+7], ' ')))
                  ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM t
    ), bench AS (
      SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id < 50
    ), corpus AS (
      SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id >= 50
    )
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM corpus c JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
    """,
)
def q83_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 8-gram with a
    held-out benchmark set (here: doc_id < 50), with the shared-gram count
    per contaminated doc. The benchmark gram set is tiny relative to the
    corpus, so the join broadcasts — at 100 TB the corpus side streams
    through map-side hash probes with no corpus shuffle at all. Distinct
    grams per doc before the join bounds the explode at
    (doc_len - 7) rows per doc."""
    docs = load(spark, sf_dir, "documents")
    grams = F.array_distinct(_word_ngrams(tokenize(F.col("text")), 8))
    with_grams = docs.select("doc_id", grams.alias("grams"))
    bench = (
        with_grams.where(F.col("doc_id") < 50)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus = with_grams.where(F.col("doc_id") >= 50).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


@register(
    "q84_native_session_window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM d
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q84_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in `session_window` aggregation, pinned against the
    gap-break prefix-sum oracle (the same semantics q11 implements
    manually): window start = first event, end = last event + gap, a new
    session opens when the inter-event gap EXCEEDS 30 min — an event at
    exactly prev_ts+gap still merges (verified empirically in
    tests/test_timeseries.py; break condition is strictly `gap > threshold`,
    identical to our prefix-sum sessionize).
    Having both forms oracle-checked proves our sessionize and Spark's
    native operator agree — and the native form is the one Structured
    Streaming can run incrementally."""
    ev = load(spark, sf_dir, "events")
    sw = ev.groupBy("user_id", F.session_window("ts", "1800 seconds")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return sw.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
    )


@register(
    "q85_streaming_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q85_streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window rollup under the correctness
    gate (T7 companion to q70's stateful sessionize): a file-source stream
    drained with availableNow through a windowed groupBy into a memory
    sink, hash-checked against the batch GROUP BY. Complete output mode
    is what makes streaming == batch EXACT here — append mode would
    withhold windows the watermark hasn't closed when the bounded stream
    ends (the classic missing-last-window pitfall); the watermarked
    append path with genuinely late rows is exercised in
    tests/test_streaming.py, where per-batch emission is the thing under
    test. 1-hour tumbling windows align to the epoch, so
    `window(ts, '1 hour').start == date_trunc('hour', ts)` on both
    engines."""
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    drop_dir = tempfile.mkdtemp(prefix="q85_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "events.parquet"))
    stream = spark.readStream.schema(file_schema).parquet(drop_dir)
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )
    name = f"q85_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q85_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour"),
        "event_type",
        "n_events",
        "value_cents",
    )


@register(
    "q86_set_ops_users",
    oracle="""
    SELECT 'both' AS tag, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'purchase_only' AS tag, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    """,
)
def q86_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (U-family completion beyond
    union): purchasers who also errored vs purchasers who never did.
    Catalyst plans both as left-semi / left-anti hash joins over the
    distinct sets — same scale shape as q16/q17."""
    ev = load(spark, sf_dir, "events")
    purchasers = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    errorers = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    both = purchasers.intersect(errorers).select(
        F.lit("both").alias("tag"), "user_id"
    )
    only = purchasers.exceptAll(errorers).select(
        F.lit("purchase_only").alias("tag"), "user_id"
    )
    return both.unionByName(only)


@register(
    "q87_event_type_profile",
    oracle="""
    SELECT user_id,
           list_sort(list(DISTINCT event_type)) AS types,
           CAST(len(list(DISTINCT event_type)) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def q87_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with a deterministic (sorted) order — collect_set
    order is partition-dependent, so sort_array is what makes an array
    column hash-comparable cross-engine (and reproducible run-to-run, the
    same discipline every array-producing operator here follows)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types"),
        F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
    )


@register(
    "q88_hopping_window_counts",
    oracle="""
    WITH h AS (
      SELECT event_type, UNNEST([
        make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
        make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
      ]) AS wstart
      FROM events
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM h GROUP BY 1, 2
    """,
)
def q88_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — 1-hour windows every 30
    minutes, so each event contributes to exactly two windows. Spark's
    `window(ts, '1 hour', '30 minutes')` replicates rows map-side before
    the hash aggregation (no self-join); the oracle unrolls the same two
    epoch-aligned window starts per event explicitly. The hop/width pair
    is the smoothing tool the tumbling rollup (q60/q85) can't express."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n_events",
    )


@register(
    "q89_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           ROUND(FLOOR(value / 25.0) * 25.0, 6) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q89_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning per type — the distribution-profiling
    pass a curation pipeline runs before choosing quality thresholds.
    Pure integer bin arithmetic (no percentile state), one map-side
    combinable aggregation; at 100 TB the bin cardinality is bounded by
    range/width, independent of row count."""
    ev = load(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / 25.0).cast("long")
    return ev.groupBy(
        "event_type",
        bin_col.alias("bin"),
        F.round(bin_col * 25.0, 6).alias("bin_lo"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q90_salted_join_totals",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS user_total_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, d.user_total_cents
    FROM events e LEFT JOIN dim d ON e.user_id = d.user_id
    """,
)
def q90_salted_join_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join skew mitigation under the correctness gate: a
    left join through `salted_join` (right side replicated salt_factor×,
    left rows scattered across salts) must be row-for-row identical to
    the plain join the oracle runs. Salting spreads a hot key over
    salt_factor tasks — the standard fix when one entity dominates the
    events stream and AQE's skew split isn't available (e.g. a
    broadcast-ineligible mid-size dim)."""
    from noaa_ais_glue_lakehouse_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    dim = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(cents(F.col("value"))).alias("user_total_cents"))
    )
    return salted_join(
        ev.select("event_id", "user_id"), dim, keys=["user_id"], how="left"
    ).select("event_id", "user_id", "user_total_cents")


@register(
    "q91_vocab_top_tokens",
    oracle="""
    WITH t AS (
      SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok
    )
    SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 100
    """,
)
def q91_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-100 — the vocabulary/stopword
    derivation pass of a tokenizer-training pipeline. Explode + count is
    map-side combinable (the shuffle carries one row per distinct token
    per partition, not per occurrence); top-k with a token tiebreak is a
    TakeOrdered, no global sort materialized."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(100)
    )


@register(
    "q92_tfidf_top_terms",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the corpus count scalar (idf denominator) \u2014 O(|tf|) rows \u00d7 1, not a fallback",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), n AS (
      SELECT COUNT(*) AS n FROM documents
    ), s AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    ), r AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rn
      FROM s
    )
    SELECT doc_id, tok, tfidf, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def q92_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF top-3 terms. The document-frequency table is
    tiny relative to the corpus (|vocab| rows) and broadcasts; the
    row_number ranks over the 6dp-ROUNDED score on BOTH engines so float
    ulps in ln() can't reorder ties. Scale shape: one shuffle for tf
    (doc, token), one |vocab|-sized agg for df, one doc-partition window."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    s = tf.join(F.broadcast(df_), "tok").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        s.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
    )


@register(
    "q93_share_of_daily_value",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS type_cents
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, type_cents,
           ROUND(CAST(type_cents AS DOUBLE)
                 / SUM(type_cents) OVER (PARTITION BY day), 6) AS share
    FROM d
    """,
)
def q93_share_of_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each type's share of the day's
    value. The window sum rides the same day partitioning the aggregation
    produced — agg + window is one shuffle total; integer-cents numerators
    keep the ratio exact-input deterministic."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.sum(cents(F.col("value"))).alias("type_cents")
    )
    w = Window.partitionBy("day")
    return d.select(
        "day",
        "event_type",
        "type_cents",
        F.round(
            F.col("type_cents").cast("double") / F.sum("type_cents").over(w), 6
        ).alias("share"),
    )


@register(
    "q94_zscore_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(value * 100) AS BIGINT) * CAST(ROUND(value * 100) AS BIGINT)) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(ABS(CAST(ROUND(e.value * 100) AS BIGINT) * m.n - m.s1) AS DOUBLE)
             > 3.0 * SQRT(GREATEST(CAST(m.n AS DOUBLE) * m.s2 - CAST(m.s1 AS DOUBLE) * m.s1, 0.0))
             AS is_outlier
    FROM events e JOIN m USING (event_type)
    """,
)
def q94_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3σ outlier flags — the statistical quality filter of a
    curation pipeline — computed from EXACT integer moments (Σcents,
    Σcents²) instead of stddev_samp: engines disagree on streaming
    variance algorithms (Welford vs textbook) at float precision, while
    integer sums are order-independent and identical everywhere. The
    comparison |x·n − s1| > 3·√(n·s2 − s1²) is the z-score test scaled
    through by n to stay in exact integers until the final sqrt. One
    |types|-sized broadcast joins the moments back — no second scan
    shuffle."""
    ev = load(spark, sf_dir, "events")
    c = cents(F.col("value"))
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    joined = ev.select("event_id", "event_type", c.alias("_c")).join(
        F.broadcast(m), "event_type"
    )
    lhs = F.abs(F.col("_c") * F.col("n") - F.col("s1")).cast("double")
    rhs = 3.0 * F.sqrt(
        F.greatest(
            F.col("n").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1"),
            F.lit(0.0),
        )
    )
    return joined.select("event_id", "event_type", (lhs > rhs).alias("is_outlier"))


@register(
    "q95_asof_join_forward",
    oracle="""
    WITH ref AS (
      SELECT user_id, ts, MAX(value) AS ref_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), probe AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type <> 'view'
    )
    SELECT p.event_id,
           CAST(ROUND(r.ref_value * 100) AS BIGINT) AS next_value_cents
    FROM probe p ASOF LEFT JOIN ref r
      ON p.user_id = r.user_id AND p.ts <= r.ts
    """,
)
def q95_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (q57's mirror): each non-view event gets the
    EARLIEST at-or-after 'view' value for its user — the "next reading
    after the event" lookup of alert-enrichment pipelines. Same single
    key shuffle, window order reversed; DuckDB's native ASOF with
    ``p.ts <= r.ts`` is the oracle."""
    from noaa_ais_glue_lakehouse_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
    )
    probe = ev.filter(F.col("event_type") != "view").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(probe, ref, "user_id", "ts", ["ref_value"], direction="forward")
    return out.select(
        "event_id",
        F.round(F.col("asof_ref_value") * 100).cast("long").alias("next_value_cents"),
    )


@register(
    "q96_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND epoch_us(v.ts) <= epoch_us(p.ts)
     AND epoch_us(v.ts) >= epoch_us(p.ts) - 600000000
    """,
)
def q96_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join under the correctness gate: purchases
    joined to the same user's views from the preceding 10 minutes, both
    sides real file-source streams with event-time watermarks, drained
    with availableNow into a memory sink and hash-checked against the
    batch time-bounded join. The watermark + time-bound condition is what
    lets Spark expire join state at scale (state holds only the
    watermark-deep tail of each side, not the full history) — the
    streaming analog of the q59 range join. Inner-join emission is
    complete regardless of watermark progress, so streaming == batch
    exactly."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    # cast through the EXPLICIT TimestampType (LTZ): under a session whose
    # default timestampType is NTZ, cast("timestamp") resolves to NTZ and
    # watermarks reject it (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    views = (
        _stream("q96_v_")
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q96_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
    )
    name = f"q96_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q96_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id")
    )


@register(
    "q97_type_transition_counts",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q97_type_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition (bigram) counts — the Markov-chain feature
    table of behavioral modeling / next-event prediction pipelines. One
    lag window on the entity shuffle, then a tiny |types|² aggregation;
    the transition matrix never materializes per-user state."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    return seq.groupBy(
        F.col("prev_type"), F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q98_signup_purchase_funnel",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           first_signup_us IS NOT NULL AND first_purchase_us IS NOT NULL
             AND first_purchase_us >= first_signup_us AS converted,
           CASE WHEN first_signup_us IS NOT NULL AND first_purchase_us >= first_signup_us
                THEN (first_purchase_us - first_signup_us) // 1000000 END
             AS latency_seconds
    FROM f WHERE first_signup_us IS NOT NULL
    """,
)
def q98_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: per signed-up user, whether (and how fast) the
    first purchase followed the first signup. Conditional-min aggregation
    collapses each user to one row in a single map-side-combinable pass —
    no self-join of the two event subsets, no window. Microsecond
    integer arithmetic end-to-end (the cross-engine time convention)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("su"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("pu"),
    )
    converted = F.col("su").isNotNull() & F.col("pu").isNotNull() & (
        F.col("pu") >= F.col("su")
    )
    latency = F.when(
        F.col("su").isNotNull() & (F.col("pu") >= F.col("su")),
        F.floor((F.col("pu") - F.col("su")) / 1_000_000).cast("long"),
    )
    return f.where(F.col("su").isNotNull()).select(
        "user_id", converted.alias("converted"), latency.alias("latency_seconds")
    )


@register(
    "q99_streaming_dedup",
    oracle="""
    WITH d AS (
      SELECT DISTINCT ON (event_id) event_id, event_type
      FROM (SELECT event_id, event_type FROM events
            UNION ALL SELECT event_id, event_type FROM events)
      ORDER BY event_id
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct_events
    FROM d GROUP BY event_type
    """,
)
def q99_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: the events file is staged TWICE into
    the drop directory (every row arrives duplicated), and
    `dropDuplicatesWithinWatermark` on event_id must collapse the stream
    back to one row per event — the at-least-once-delivery dedup every
    production ingest needs. Watermark-scoped state means the dedup
    buffer holds only the watermark-deep tail at scale, not every key
    ever seen (the unbounded-state trap of plain dropDuplicates on a
    stream). Hash-checked against batch DISTINCT."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    drop_dir = tempfile.mkdtemp(prefix="q99_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "a.parquet"))
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "b.parquet"))
    stream = (
        spark.readStream.schema(file_schema)
        .parquet(drop_dir)
        .select(
            "event_id",
            "event_type",
            F.col("ts").cast(T.TimestampType()).alias("ts"),
        )
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"q99_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q99_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_events"))
    )


@register(
    "q100_curation_funnel",
    oracle=_cc_oracle(
        """, losers AS (
      SELECT node FROM comp WHERE component <> node
    ), q2 AS (
      SELECT doc_id, text FROM documents WHERE length(text) >= 200
    ), ex2 AS (
      SELECT MIN(doc_id) AS doc_id FROM q2 GROUP BY text
    ), surv AS (
      SELECT e.doc_id FROM ex2 e ANTI JOIN losers l ON e.doc_id = l.node
    )
    SELECT 1 AS stage_id, 'input' AS stage,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
    UNION ALL SELECT 2, 'quality_filter', (SELECT COUNT(*) FROM q2)
    UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM ex2)
    UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM surv)""",
        pairs_sql="""
      WITH q AS (
        SELECT doc_id, text FROM documents WHERE length(text) >= 200
      ), ex AS (
        SELECT MIN(doc_id) AS doc_id, text FROM q GROUP BY text
      ), grams AS (
        SELECT doc_id,
               list_transform(range(1, length(lower(text)) - 6),
                              i -> md5(substr(lower(text), i, 8))) AS hashes
        FROM ex WHERE length(text) >= 8
      ), wins AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hashes) - 2),
                             j -> list_min(hashes[j : j + 3]))) AS fps
        FROM grams WHERE len(hashes) >= 4
      ), idx AS (
        SELECT doc_id, unnest(fps) AS fp FROM wins
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
    """,
    ),
)
def q100_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP curation pipeline report: the end-to-end LLM-corpus prep
    chain — quality filter → exact dedup (min-id survivor) → winnowing
    near-dup survivors — reported as a funnel of per-stage document
    counts, the top-level artifact a curation run publishes. Every stage
    is the REAL operator (dedup_exact, winnow_near_duplicates,
    dedup_by_components), and the whole funnel is hash-checked against a
    recursive-CTE oracle because the winnowing family is deterministic.
    At production scale each stage's output would persist to a table and
    the counts would ride observe() metrics; here the four counts are one
    unioned plan so the driver's single action sees a consistent
    snapshot."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        dedup_by_components,
        dedup_exact,
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    quality = docs.where(F.length("text") >= 200)
    exact = dedup_exact(quality, ["text"], "doc_id")
    pairs = winnow_near_duplicates(exact, "doc_id", "text", 8, 4, min_shared=10)
    surv = dedup_by_components(exact, pairs.select("id_a", "id_b"), "doc_id")

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    return (
        stage(1, "input", docs)
        .unionByName(stage(2, "quality_filter", quality))
        .unionByName(stage(3, "exact_dedup", exact))
        .unionByName(stage(4, "near_dedup", surv))
    )


@register(
    "q101_custom_source_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def q101_custom_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource under the gate: the same per-day/type
    rollup every other query computes over the native reader, but scanned
    through the row-group-partitioned Arrow connector
    (sources/pysource.py) — proving a from-scratch connector delivers
    byte-identical data to Spark's built-in parquet path."""
    from noaa_ais_glue_lakehouse_spark.sources.pysource import register as reg

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reg(spark)
    ev = (
        spark.read.format("pyrowgroup")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    return ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )


@register(
    "q102_mergeable_hll_rollup",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join pairing the merged "
        "sketch-estimate scalar with the day/row-count scalar - "
        "group-cardinality, never row-level"
    ),
    oracle="""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                  AS BIGINT) AS reg,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 3, 13))
                  AS BIGINT) AS v52
      FROM events
    ), daily_regs AS (
      SELECT day, reg,
             MAX(CASE WHEN v52 = 0 THEN 53
                      ELSE 53 - length(bin(v52)) END) AS m_j
      FROM h GROUP BY day, reg
    ), merged AS (
      SELECT reg, MAX(m_j) AS m_j FROM daily_regs GROUP BY reg
    ), agg AS (
      SELECT COUNT(*) AS n_present,
             SUM(9007199254740992 >> m_j) AS sum_u
      FROM merged
    ), meta AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS n_days_merged
      FROM events
    )
    SELECT ROUND(
             CASE
               WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (sum_u + (256 - n_present) * 9007199254740992.0)
                    <= 640.0
                AND n_present < 256
               THEN 256.0 * ln(256.0 / GREATEST(256 - n_present, 1))
               ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (sum_u + (256 - n_present) * 9007199254740992.0)
             END, 2) AS est_monthly_distinct_users,
           meta.n_rows, meta.n_days_merged
    FROM agg CROSS JOIN meta
    """,
)
def q102_mergeable_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the incremental-rollup pattern
    q63's one-shot estimate can't express: build one register relation
    per day (the persistable sketch state the reference's
    daily-partials → monthly-rebuild chain T5 would store), then UNION
    the daily sketches into the monthly estimate by register-wise MAX —
    without ever recounting the raw rows. At 100 TB this is a daily
    O(day) sketch job + O(days × 256 registers) merge instead of a
    monthly O(month) recount.

    Since round 7 the rollup runs on the PORTABLE md5 family
    (operators/sketches.py portable_hll_registers/estimate), so the
    merged monthly estimate itself is hash-checked against the oracle —
    the register relation, the MAX-merge, and the harmonic sum (exact
    integer units of 2⁻⁵³) are engine-identical. The Spark-native
    Datasketches form (`hll_sketch_agg`/`hll_union_agg`) remains the
    fast binary-payload twin, tolerance-pinned in
    tests/test_sketches.py."""
    from noaa_ais_glue_lakehouse_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily_regs = portable_hll_registers(ev, ["day"], "user_id")
    est = portable_hll_estimate(daily_regs, []).select(
        F.col("hll_estimate").alias("est_monthly_distinct_users")
    )
    meta = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("day").cast("long").alias("n_days_merged"),
    )
    return est.crossJoin(F.broadcast(meta))


# ---------------------------------------------------------------------------
# Curation surface round 3: PII scrubbing, embedding quantization, mixture
# sampling, Gopher quality rules, skew audit, SCD2, compaction planning
# ---------------------------------------------------------------------------


@register(
    "q103_scrub_pii",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call +1-555-867-5309 ref '
                  || CAST(doc_id * 98765 AS VARCHAR) AS raw
      FROM documents
    ),
    scrub AS (
      SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}', '<PHONE>', 'g'),
               '[0-9]{5,}', '<NUM>', 'g') AS scrubbed
      FROM synth
    )
    SELECT doc_id, md5(scrubbed) AS scrub_md5,
           CAST(length(raw) - length(scrubbed) AS BIGINT) AS chars_delta,
           CAST(CASE WHEN scrubbed <> raw THEN 1 ELSE 0 END AS BIGINT) AS changed
    FROM scrub
    """,
)
def q103_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the curation path: emails → <EMAIL>, phone-like
    groups → <PHONE>, long digit runs → <NUM> (functions/text.py scrub_pii,
    a pure regexp_replace chain — JVM-side, codegen, RE2-compatible
    patterns). The synthetic corpus contains no PII, so each document gets
    a deterministic doc_id-derived contact line appended IN BOTH ENGINES
    before scrubbing — the oracle value-checks the full transform via the
    md5 of the scrubbed text, not just counts. Row-local projection: no
    shuffle at any scale."""
    from noaa_ais_glue_lakehouse_spark.functions.text import scrub_pii

    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1-555-867-5309 ref "),
        (F.col("doc_id") * 98765).cast("string"),
    )
    scrubbed = scrub_pii(raw)
    return docs.select(
        "doc_id",
        F.md5(scrubbed.cast("binary")).alias("scrub_md5"),
        (F.length(raw) - F.length(scrubbed)).cast("long").alias("chars_delta"),
        F.when(scrubbed != raw, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "changed"
        ),
    )


@register(
    "q104_quantize_embeddings",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           array_to_string(
             list_transform(e, x -> CAST(CAST(ROUND(x / scale) AS INTEGER) AS VARCHAR)),
             ',') AS q_csv,
           CAST(len(list_filter(e, x -> CAST(ROUND(abs(x) / scale) AS INTEGER) = 127))
                AS BIGINT) AS n_saturated
    FROM s WHERE scale > 0
    """,
)
def q104_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the 4× storage/bandwidth
    reduction step an embedding lakehouse applies before ANN serving:
    per-vector scale = max|v|/127, q_i = round(v_i/scale) ∈ [-127, 127].
    Pure array expressions (transform/array_max — JVM-side, no UDF); the
    full quantized vector is value-checked via its CSV rendering, so the
    oracle pins every element, not a summary. Row-local: no shuffle.
    Zero vectors (scale 0) are excluded on both sides."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    df = emb.select("vec_id", e.alias("_e")).withColumn(
        "_scale", F.array_max(F.transform("_e", F.abs)) / F.lit(127.0)
    )
    q = F.transform("_e", lambda x: F.round(x / F.col("_scale")).cast("int"))
    sat = F.size(
        F.filter(
            "_e", lambda x: F.round(F.abs(x) / F.col("_scale")).cast("int") == 127
        )
    ).cast("long")
    return df.filter(F.col("_scale") > 0).select(
        "vec_id",
        F.round("_scale", 6).alias("scale"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q_csv"),
        sat.alias("n_saturated"),
    )


@register(
    "q105_mixture_sample",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tokens_before
      FROM t
    ),
    kept AS (
      SELECT * FROM ranked
      WHERE tokens_before < CASE lang WHEN 'en' THEN 20000 ELSE 8000 END
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM kept GROUP BY lang
    """,
)
def q105_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining data-mixture assembly: cap each language at a TOKEN
    budget (20k for en, 8k otherwise here) — mixtures are specified in
    tokens, not row fractions. Ranking inside each class is md5(doc_id) —
    a deterministic shuffle every engine reproduces — and the greedy
    prefix under budget is kept (operators/training.py
    mixture_sample_to_budget). One class-key shuffle + one window pass;
    classes sample independently, so the plan holds at any corpus size."""
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
    )

    docs = load(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", "lang", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    kept = mixture_sample_to_budget(
        with_counts, "doc_id", "lang", "n_tokens", {"en": 20000}, default_budget=8000
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


@register(
    "q106_gopher_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(toks) AS n_words,
             list_sum(list_transform(toks, x -> length(x))) AS sum_len,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha
      FROM t
    ),
    r AS (
      SELECT doc_id,
             CAST(n_words AS BIGINT) AS n_words,
             ROUND(CAST(sum_len AS DOUBLE) / n_words, 4) AS mean_word_len,
             ROUND(CAST(n_alpha AS DOUBLE) / n_words, 4) AS frac_alpha_words
      FROM s WHERE n_words > 0
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND mean_word_len BETWEEN 3.0 AND 10.0
                      AND frac_alpha_words >= 0.8
                     THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM r
    """,
)
def q106_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 A1.1): word count in
    [50, 100k], mean word length in [3, 10], ≥80% words containing an
    alphabetic character — the published heuristic pretraining filter,
    as native column expressions (functions/text.py gopher_word_stats).
    Row-local projection, no shuffle; every intermediate ratio is
    emitted so the oracle pins the arithmetic, not just the verdict."""
    from noaa_ais_glue_lakehouse_spark.functions.text import gopher_word_stats

    docs = load(spark, sf_dir, "documents")
    stats = gopher_word_stats(F.col("text"))
    return (
        docs.select(
            "doc_id",
            stats["n_words"].alias("n_words"),
            stats["mean_word_len"].alias("mean_word_len"),
            stats["frac_alpha_words"].alias("frac_alpha_words"),
            stats["passes"].cast("long").alias("passes"),
        )
        .filter(F.col("n_words") > 0)
    )


@register(
    "q107_hot_key_audit",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           ROUND(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 4) AS skew_factor,
           ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top1_share
    FROM c
    """,
)
def q107_hot_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit — the diagnostic a 100 TB job runs BEFORE choosing a
    join strategy: per-key cardinality profile reduced to key count, max
    partition weight, skew factor (max/mean) and the hottest key's share.
    Two-level aggregation: the per-key count is map-side combinable, the
    final reduce sees |keys| rows, not |rows|. Feeds the
    salted_join/broadcast decision (operators/skew.py, q90)."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.round(
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n"), 4
        ).alias("skew_factor"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top1_share"),
    )


@register(
    "q108_scd2_dim",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           CAST(CASE WHEN LEAD(valid_from) OVER (
                  PARTITION BY user_id ORDER BY valid_from, event_id)
                IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM changes
    """,
)
def q108_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse consecutive
    equal states per entity into validity intervals
    [valid_from, valid_to), open-ended on the current state — the
    lakehouse dimension-history pattern. Both window passes (change
    detection, then interval close-off) share the entity partition key:
    the filter between them preserves the hash partitioning, so the plan
    shuffles ONCE regardless of history depth."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "is_current"
        ),
    )


@register(
    "q109_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS h,
             COUNT(*) AS n_rows
      FROM events GROUP BY 1, 2
    ),
    planned AS (
      SELECT day, n_rows,
             CAST(FLOOR(COALESCE(SUM(n_rows) OVER (
               PARTITION BY day ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 500.0) AS BIGINT) AS out_file
      FROM files
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_input_files,
           CAST(MAX(out_file) + 1 AS BIGINT) AS n_output_files,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows
    FROM planned GROUP BY day
    """,
)
def q109_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the table-maintenance pass every
    parquet lakehouse schedules: per partition (day), bin-pack the
    hour-grain file fragments into ~target-row output files by prefix-sum
    binning (same greedy shape as q67's sequence packing, applied to file
    manifests). The plan is computed from per-file row counts only —
    |files| rows, never the data — so planning cost is independent of
    table size; execution would rewrite each bin with one task."""
    ev = load(spark, sf_dir, "events")
    files = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = (
        Window.partitionBy("day")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "out_file",
        F.floor(F.coalesce(F.sum("n_rows").over(w), F.lit(0)) / F.lit(500.0)).cast(
            "long"
        ),
    )
    return planned.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_input_files"),
        (F.max("out_file") + 1).cast("long").alias("n_output_files"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )


@register(
    "q110_stateful_running_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """,
)
def q110_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming aggregation under the correctness gate:
    the events table is replayed as a THREE-microbatch file stream
    (range-split drop directory, maxFilesPerTrigger=1), a per-key stateful
    processor maintains per-user running (count, cents) totals across the
    batches, and the final emission per key is hash-checked against the
    batch GROUP BY — streaming-state == batch-aggregate equality, proven
    per run. The operator (streaming/sessions.py running_totals) uses
    Spark 4's ``transformWithState`` typed-ValueState API where the
    protobuf runtime it requires exists, and an identical-semantics
    ``applyInPandasWithState`` processor otherwise. Integer-cents state
    makes the totals exact and replay-order-independent. The last
    emission per key is selected by max_by on the strictly-increasing
    running count (update-mode memory sinks append every refresh)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import running_totals

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    # stage a 3-file drop directory so availableNow + maxFilesPerTrigger=1
    # actually exercises state persistence ACROSS microbatches (a single
    # file would fold the whole table into one batch and never re-read
    # state)
    drop_dir = tempfile.mkdtemp(prefix="q110_drop_")
    (
        spark.read.parquet(path)
        .repartitionByRange(3, "ts")
        .write.mode("overwrite")
        .parquet(drop_dir)
    )
    file_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(
            F.col("user_id"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )
    out = running_totals(stream, "user_id", "value_cents")
    name = f"q110_totals_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q110_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emissions = spark.table(name)
    # n is strictly increasing per key across emissions, so max_by(n) is
    # the final state
    return emissions.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n"),
        F.max_by("value_cents", "n").cast("long").alias("value_cents"),
    )


@register(
    "q111_variant_props",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def q111_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    ``parse_json`` shreds the payload once into the binary Variant
    encoding, ``try_variant_get`` extracts typed fields without
    re-parsing — the schema-flexible complement of q68's fixed-schema
    ``from_json`` (Variant keeps fields the declared schema would drop,
    and malformed payloads yield NULL via the try_ form instead of
    failing the scan). Per-day rollup of the extracted field,
    hash-checked against the DuckDB JSON oracle."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.withColumn("_k", k)
        .filter(F.col("_k").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.min("_k").cast("long").alias("min_k"),
        )
    )


@register(
    "q112_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_custkey + CASE WHEN o_custkey % 10 = 0 THEN 1000000 ELSE 0 END AS key,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS new_bal
      FROM orders GROUP BY 1
    ),
    srcf AS (
      SELECT key, new_bal, (key % 7 = 3) AS del FROM src
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey NOT IN (SELECT key FROM srcf)
    UNION ALL
    SELECT key AS c_custkey,
           'Merged#' || CAST(key AS VARCHAR) AS c_name,
           CAST(key % 25 AS INTEGER) AS c_nationkey,
           new_bal AS c_acctbal,
           'MERGED' AS c_mktsegment
    FROM srcf WHERE NOT del
    """,
)
def q112_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: the customer snapshot
    merged with an order-derived delta — matched keys updated (balance
    replaced), unmatched source keys inserted (the %10 key shift
    manufactures them), matched keys flagged for delete removed, untouched
    target rows kept (operators/state.py merge_upsert). This is the
    parquet-era MERGE the reference's replaceWhere never actually was;
    pairing the result with the dynamic-overwrite writer rewrites only
    affected partitions. One anti-join + union — no full-outer wide rows;
    bucket both sides on the key and the exchange disappears."""
    from noaa_ais_glue_lakehouse_spark.operators.state import merge_upsert

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    key = F.col("o_custkey") + F.when(
        F.col("o_custkey") % 10 == 0, F.lit(1000000)
    ).otherwise(F.lit(0))
    src = (
        orders.groupBy(key.alias("c_custkey"))
        .agg(
            (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias(
                "c_acctbal"
            )
        )
        .select(
            "c_custkey",
            F.concat(F.lit("Merged#"), F.col("c_custkey").cast("string")).alias(
                "c_name"
            ),
            (F.col("c_custkey") % 25).cast("int").alias("c_nationkey"),
            "c_acctbal",
            F.lit("MERGED").alias("c_mktsegment"),
            (F.col("c_custkey") % 7 == 3).alias("_del"),
        )
    )
    return merge_upsert(cust, src, ["c_custkey"], delete_col="_del")


@register(
    "q113_cdc_apply",
    oracle="""
    WITH snap AS (
      SELECT DISTINCT
             user_id + CASE WHEN user_id % 9 = 0 THEN 1000 ELSE 0 END AS user_id,
             'init' AS status, CAST(0 AS BIGINT) AS value_cents
      FROM events WHERE user_id < 100
    ),
    latest AS (
      SELECT user_id, op, status, value_cents FROM (
        SELECT user_id,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D' ELSE 'U' END AS op,
               event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT user_id, status, value_cents FROM snap
    WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, status, value_cents FROM latest WHERE op IN ('I', 'U')
    """,
)
def q113_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog replay (Debezium/DMS-shape): the events feed becomes
    an I/U/D changelog (signup=insert, error=delete, rest=update), applied
    to a user snapshot — per key only the LATEST change decides, deletes
    drop the key, untouched snapshot keys (the %9 shift manufactures
    them) pass through (operators/state.py apply_cdc). The changelog
    collapses via one map-side-combinable max_by aggregation — a key
    changed a million times reduces to one row before the shuffle — then
    the same anti-join + union as MERGE. This is how a lakehouse applies
    upstream-database change feeds at 100 TB."""
    from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc

    ev = load(spark, sf_dir, "events")
    snap = (
        ev.filter(F.col("user_id") < 100)
        .select(
            (
                F.col("user_id")
                + F.when(F.col("user_id") % 9 == 0, F.lit(1000)).otherwise(F.lit(0))
            ).alias("user_id")
        )
        .distinct()
        .select(
            "user_id",
            F.lit("init").alias("status"),
            F.lit(0).cast("long").alias("value_cents"),
        )
    )
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return apply_cdc(snap, changes, ["user_id"], ["ts", "event_id"], "op")


@register(
    "q114_grouping_sets",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT)
             AS gid
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    """,
)
def q114_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the explicit-subtotal form between q73's
    ROLLUP and q79's CUBE: per-type totals, per-day totals, and the grand
    total in ONE pass (Spark expands the sets map-side and aggregates
    once; three separate GROUP BYs would scan the fact three times).
    grouping_id disambiguates the NULL-vs-'ALL' encoding exactly as the
    oracle does."""
    ev = load(spark, sf_dir, "events")
    ev.select(
        "event_type", F.to_date("ts").alias("day"), cents(F.col("value")).alias("_c")
    ).createOrReplaceTempView("q114_ev")
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(day AS STRING), 'ALL') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(_c) AS BIGINT) AS value_cents,
               CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS gid
        FROM q114_ev
        GROUP BY GROUPING SETS ((event_type), (day), ())
        """
    )


@register(
    "q115_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(user_id % 10, 7) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(user_id % 10, 7) AS bucket,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1
    )
    SELECT a.bucket, a.n_events, b.value_cents
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    """,
)
def q115_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL join keys
    match each other instead of silently dropping — the semantics data
    reconciliation needs when NULL is a real category (here a NULLIF'd
    bucket). eqNullSafe keys still hash-partition (NULLs co-locate in one
    partition), so the plan stays a hash join, never a cross product;
    both sides are pre-aggregated to |buckets| rows so the NULL bucket
    cannot hot-spot the join itself."""
    ev = load(spark, sf_dir, "events")
    bucket = F.nullif(F.col("user_id") % 10, F.lit(7))
    a = ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    b = ev.groupBy(bucket.alias("bucket")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("value_cents")
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.bucket").eqNullSafe(F.col("b.bucket")))
        .select("a.bucket", "a.n_events", "b.value_cents")
    )


@register(
    "q116_training_corpus_assembly",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / len(toks), 4) AS mean_len,
             ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                   AS DOUBLE) / len(toks), 4) AS frac_alpha
      FROM t WHERE len(toks) > 0
    ),
    q AS (
      SELECT doc_id, lang, text, n_tokens FROM g
      WHERE n_tokens BETWEEN 20 AND 100000
        AND mean_len BETWEEN 3.0 AND 10.0
        AND frac_alpha >= 0.8
    ),
    ex AS (
      SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text
    ),
    qq AS (
      SELECT q.doc_id, q.lang, q.n_tokens FROM q JOIN ex USING (doc_id)
    ),
    mix AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tokens_before
      FROM qq
    ),
    kept AS (
      SELECT doc_id, lang, n_tokens FROM mix
      WHERE tokens_before < CASE lang WHEN 'en' THEN 12000 ELSE 5000 END
    ),
    sp AS (
      SELECT doc_id, n_tokens,
             CASE WHEN frac < 0.05 THEN 'val'
                  WHEN frac < 0.10 THEN 'test'
                  ELSE 'train' END AS split
      FROM (
        SELECT *, CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
                    / 4294967296.0 AS frac
        FROM kept
      )
    ),
    binned AS (
      SELECT split, n_tokens,
             CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 8 AS INT) AS shard,
             doc_id
      FROM sp
    ),
    packed AS (
      SELECT split, shard, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY split, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 512.0) AS BIGINT) AS bin_id
      FROM binned
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT (shard, bin_id)) AS BIGINT) AS n_bins
    FROM packed GROUP BY split
    """,
)
def q116_training_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP training-corpus assembly — the full path from raw corpus
    to trainer-ready windows, every stage the REAL operator: Gopher-rule
    quality filter (word/length/alpha bounds, adjusted min-words for this
    corpus) → exact dedup (min-id survivor) → token-budget mixture
    sampling per language → deterministic train/val/test split → per-split
    sequence packing into 512-token windows (group_cols packing so a val
    doc never shares a window with a train doc). Reported per split:
    documents, tokens, packed windows — the manifest a pretraining run
    starts from, hash-checked end-to-end against a single DuckDB CTE.

    Scale: quality/split stages are row-local; dedup shuffles on the text
    hash; mixture + packing are one window pass each on small keys. No
    stage materializes more than |docs| rows."""
    from noaa_ais_glue_lakehouse_spark.functions.text import gopher_word_stats
    from noaa_ais_glue_lakehouse_spark.operators.dedup import dedup_exact
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
        pack_sequences,
        train_val_test_split,
    )

    docs = load(spark, sf_dir, "documents")
    stats = gopher_word_stats(F.col("text"))
    quality = docs.select(
        "doc_id",
        "lang",
        "text",
        stats["n_words"].alias("n_tokens"),
        stats["mean_word_len"].alias("_mean"),
        stats["frac_alpha_words"].alias("_alpha"),
    ).filter(
        F.col("n_tokens").between(20, 100000)
        & F.col("_mean").between(3.0, 10.0)
        & (F.col("_alpha") >= 0.8)
    )
    deduped = dedup_exact(quality, ["text"], "doc_id").select(
        "doc_id", "lang", "n_tokens"
    )
    kept = mixture_sample_to_budget(
        deduped, "doc_id", "lang", "n_tokens", {"en": 12000}, default_budget=5000
    ).drop("tokens_before")
    split = train_val_test_split(kept, "doc_id", 0.05, 0.05)
    packed = pack_sequences(
        split,
        "doc_id",
        "n_tokens",
        context_tokens=512,
        n_shards=8,
        group_cols=["split"],
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("shard", "bin_id").cast("long").alias("n_bins"),
    )


@register(
    "q117_map_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COALESCE(SUM(n) FILTER (WHERE event_type = 'view'), 0) AS BIGINT)
             AS n_views,
           CAST(COALESCE(SUM(n) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
             AS n_purchases,
           CAST(SUM(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_frequent_types
    FROM c GROUP BY user_id
    """,
)
def q117_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed per-entity profile: per user, the event-type→count map is
    built with map_from_entries(collect_list(struct)), then consumed with
    the map kernel functions — map_keys/size for the type count,
    try_element_at for point lookups (NULL, never an error, on absent
    keys), map_filter for the ≥10-occurrence subset. The map column is
    the profile shape a feature store serves; the oracle computes the
    same values relationally, proving the map path loses nothing. One
    two-level aggregation — map construction is map-side combinable on
    (user, type) first."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    profiles = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    m = F.col("type_counts")
    return profiles.select(
        "user_id",
        F.size(F.map_keys(m)).cast("long").alias("n_types"),
        F.coalesce(F.try_element_at(m, F.lit("view")), F.lit(0))
        .cast("long")
        .alias("n_views"),
        F.coalesce(F.try_element_at(m, F.lit("purchase")), F.lit(0))
        .cast("long")
        .alias("n_purchases"),
        F.size(F.map_keys(F.map_filter(m, lambda k, v: v >= 10)))
        .cast("long")
        .alias("n_frequent_types"),
    )


@register(
    "q118_collated_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS label,
             value
      FROM events
    )
    SELECT lower(label) AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM mixed GROUP BY lower(label)
    """,
)
def q118_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a mixed-case label
    column grouped under UTF8_LCASE collation folds 'VIEW' and 'view'
    into one group WITHOUT rewriting the data — the engine-level answer
    to case-divergent sources that the reference handled by hand-
    lowercasing every column. The output key is canonicalized with
    lower() only for cross-engine comparison; the grouping itself is
    collation-native."""
    ev = load(spark, sf_dir, "events")
    label = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    mixed = ev.select(
        F.collate(label, "UTF8_LCASE").alias("label"),
        cents(F.col("value")).alias("_c"),
    )
    return mixed.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_c").cast("long").alias("value_cents"),
    ).select(
        # strip the collation for a plain-string schema the oracle matches
        F.lower(F.col("label").cast("string")).alias("label"),
        "n",
        "value_cents",
    )


@register(
    "q119_recursive_date_spine",
    oracle="""
    WITH RECURSIVE d(day, max_day) AS (
      SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events
      UNION ALL
      SELECT CAST(day + INTERVAL 1 DAY AS DATE), max_day FROM d WHERE day < max_day
    )
    SELECT d.day, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
    FROM d LEFT JOIN events e ON CAST(e.ts AS DATE) = d.day
    GROUP BY d.day
    """,
)
def q119_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE): generate the
    complete calendar spine between the table's first and last day by
    recursion — no driver-side date loop, no sequence() row — and
    left-join daily counts onto it so silent zero-event days surface as
    explicit rows (the data-freshness report a lakehouse runs nightly).
    Recursion bounds travel as columns of the working set, so the whole
    spine derives from ONE anchor aggregate; the iterative union runs
    inside the engine exactly like the q62 connected-components loop,
    but declared in SQL."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q119_events")
    return spark.sql(
        """
        WITH RECURSIVE d(day, max_day) AS (
          SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM q119_events
          UNION ALL
          SELECT date_add(day, 1), max_day FROM d WHERE day < max_day
        )
        SELECT d.day, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
        FROM d LEFT JOIN q119_events e ON CAST(e.ts AS DATE) = d.day
        GROUP BY d.day
        """
    )


@register(
    "q120_lateral_topk",
    oracle="""
    SELECT t.event_type, l.user_id, l.n
    FROM (SELECT DISTINCT event_type FROM events) t,
    LATERAL (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events e WHERE e.event_type = t.event_type
      GROUP BY user_id ORDER BY n DESC, user_id LIMIT 3
    ) l
    """,
)
def q120_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group LIMIT — top-3 users per
    event type in the SQL form analysts write. Catalyst decorrelates the
    lateral into a window/aggregate plan (no per-outer-row re-execution),
    so the declarative form costs the same as q08's hand-written
    row_number top-k; id tiebreak keeps the cut total across engines."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q120_events")
    return spark.sql(
        """
        SELECT t.event_type, l.user_id, l.n
        FROM (SELECT DISTINCT event_type FROM q120_events) t,
        LATERAL (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM q120_events e WHERE e.event_type = t.event_type
          GROUP BY user_id ORDER BY n DESC, user_id LIMIT 3
        ) l
        """
    )


@register(
    "q121_streaming_merge_sink",
    oracle="""
    SELECT user_id, status, value_cents FROM (
      SELECT user_id, event_type AS status,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q121_streaming_merge_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink — the streaming-upsert pattern every
    lakehouse runs where a native sink doesn't exist: events replay as a
    THREE-microbatch stream (three sequentially-staged files so arrival
    order follows event time, like an ordered CDC feed), each batch
    collapses to its latest row per user and MERGEs into a parquet
    snapshot via stage-then-swap (streaming/sessions.py
    start_merge_upsert_sink; never collected, never O(history) per
    batch). The final snapshot is hash-checked against the batch
    latest-per-user — continuous maintenance == one-shot rebuild."""
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        start_merge_upsert_sink,
    )

    ev_src = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    # three sequential writes → strictly increasing mtimes → the file
    # source replays batches in event-time order (an ordered feed, the
    # precondition for blind upsert; an unordered feed would use the
    # ts-aware latest_per_entity merge instead)
    drop_dir = tempfile.mkdtemp(prefix="q121_drop_")
    ts_day = F.dayofmonth("ts")
    for i, (lo, hi) in enumerate([(1, 10), (11, 20), (21, 31)]):
        ev_src.filter(ts_day.between(lo, hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(drop_dir, f"part{i}"))
    stage_dir = tempfile.mkdtemp(prefix="q121_files_")
    n = 0
    for i in range(3):
        part = os.path.join(drop_dir, f"part{i}")
        for f in sorted(os.listdir(part)):
            if f.endswith(".parquet"):
                os.symlink(
                    os.path.join(part, f), os.path.join(stage_dir, f"{i}_{f}")
                )
                n += 1
    stream = (
        spark.readStream.schema(ev_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    target = os.path.join(tempfile.mkdtemp(prefix="q121_tgt_"), "snapshot")
    q = start_merge_upsert_sink(
        stream,
        target,
        tempfile.mkdtemp(prefix="q121_ckpt_"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )
    q.awaitTermination()
    return spark.read.parquet(target).select("user_id", "status", "value_cents")


@register(
    "q122_image_decode_arrow",
    oracle="""
    SELECT doc_id AS id,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 7) % 640 AS INT) END AS width,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 13) % 480 AS INT) END AS height,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 31) % 4 AS INT) END AS channels,
           octet_length(encode(text)) > 0 AS decode_ok
    FROM documents
    """,
)
def q122_image_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — the q44 decode as ``mapInArrow``: RecordBatches in
    and out, metadata computed from Arrow buffer offsets, binary payloads
    never copied into Python objects (the pandas boxing q44's
    mapInPandas pays per batch). Same oracle as q44, so the two Python
    execution paths are pinned bit-identical."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_images_arrow,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_images_arrow(docs, "doc_id", "payload")


@register(
    "q123_try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN (event_id % 5) <> 0
                THEN CAST(ROUND(value * 100) AS BIGINT) / (event_id % 5) END
             AS cents_per_bucket,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed_id,
           CAST(ROUND(value * 100) AS BIGINT) <= 807 AS add_survives
    FROM events
    """,
)
def q123_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defensive-ingestion arithmetic (ANSI mode survival kit): try_divide
    yields NULL on the zero buckets instead of aborting the job under
    ANSI semantics, try_cast turns malformed literals into NULLs (the
    raw-zone cast-by-name fallback as an expression), and the overflow
    probe documents try_add's contract. A 100 TB ingest cannot die on
    row 40 billion because one bucket is zero — these expressions are
    why."""
    ev = load(spark, sf_dir, "events")
    bucket = F.col("event_id") % 5
    raw = F.when(F.col("event_id") % 3 == 0, F.lit("not-a-number")).otherwise(
        F.col("event_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.try_divide(cents(F.col("value")), bucket).alias("cents_per_bucket"),
        raw.try_cast("long").alias("parsed_id"),
        # overflow → NULL, not a crash: cents + (MAX-807) survives only for
        # cents ≤ 807, which the oracle states arithmetically (DuckDB has
        # no non-throwing add to run the real thing)
        F.try_add(cents(F.col("value")), F.lit(9223372036854775000))
        .isNotNull()
        .alias("add_survives"),
    )


@register(
    "q124_udtf_chunks",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, len(toks), 24)) AS s
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(s / 24 AS INT) AS chunk_idx,
           array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text,
           CAST(LEAST(32, len(toks) - s) AS INT) AS n_tokens
    FROM c
    """,
)
def q124_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (§2.10): overlapping 32-token / stride-24
    document chunking — the RAG/embedding-index prep step — as a
    registered table function consumed with LATERAL. The oracle expands
    the identical windows natively, so the UDTF's row expansion is
    hash-checked, not just counted. Deliberately the one row-at-a-time
    Python operator in the catalog: it demonstrates the API, and its
    docstring (functions/text.py chunk_udtf) points hot paths at the
    native sequence/slice form instead."""
    from noaa_ais_glue_lakehouse_spark.functions.text import chunk_udtf

    spark.udtf.register("q124_chunks", chunk_udtf(32, 24))
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("q124_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM q124_docs d, LATERAL q124_chunks(d.text) c
        """
    )


@register(
    "q125_expectations_report",
    allow_non_equi="deliberate 1-row \u00d7 1-row cross join: pairing the FK-orphan count aggregate with the total-rows aggregate in the expectations report",
    oracle="""
    WITH base AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_notnull,
             SUM(CASE WHEN value IS NOT NULL
                       AND NOT (value BETWEEN 0 AND 100) THEN 1 ELSE 0 END)
               AS v_range,
             SUM(CASE WHEN event_type IS NOT NULL
                       AND NOT regexp_matches(event_type, '^[a-z]+$')
                      THEN 1 ELSE 0 END) AS v_regex,
             SUM(CASE WHEN event_type IS NOT NULL
                       AND event_type NOT IN
                         ('view','click','purchase','signup','error')
                      THEN 1 ELSE 0 END) AS v_set,
             COUNT(event_id) - COUNT(DISTINCT event_id) AS v_unique
      FROM events
    ),
    fk AS (
      SELECT COUNT(*) AS v_fk FROM events e
      WHERE user_id IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    )
    SELECT rule, kind, n_violations, n_rows,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM (
      SELECT 'user_id_not_null' AS rule, 'not_null' AS kind,
             CAST(v_notnull AS BIGINT) AS n_violations, CAST(n AS BIGINT) AS n_rows
      FROM base
      UNION ALL SELECT 'value_in_range', 'in_range', CAST(v_range AS BIGINT),
                       CAST(n AS BIGINT) FROM base
      UNION ALL SELECT 'event_type_matches', 'matches', CAST(v_regex AS BIGINT),
                       CAST(n AS BIGINT) FROM base
      UNION ALL SELECT 'event_type_in_set', 'in_set', CAST(v_set AS BIGINT),
                       CAST(n AS BIGINT) FROM base
      UNION ALL SELECT 'event_id_unique', 'unique', CAST(v_unique AS BIGINT),
                       CAST(n AS BIGINT) FROM base
      UNION ALL SELECT 'user_id_fk', 'foreign_key', CAST(v_fk AS BIGINT),
                       CAST(n AS BIGINT) FROM base, fk
    )
    """,
)
def q125_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (Deequ/dbt-test shape): six rules —
    not-null, numeric range, regex, value set, uniqueness, and a
    broadcast foreign-key probe against the customer dimension —
    evaluated over the events table and reported one row per rule
    (operators/expectations.py). All row-level and uniqueness rules ride
    ONE scan as conditional aggregates; rule count doesn't multiply
    jobs. This is the publish gate a lakehouse runs per ingest before a
    partition goes live."""
    from noaa_ais_glue_lakehouse_spark.operators import expectations as X

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    rules = [
        X.not_null("user_id", "user_id_not_null"),
        X.in_range("value", 0, 100, "value_in_range"),
        X.matches("event_type", "^[a-z]+$", "event_type_matches"),
        X.in_set(
            "event_type",
            ["view", "click", "purchase", "signup", "error"],
            "event_type_in_set",
        ),
        X.unique("event_id", "event_id_unique"),
        X.foreign_key("user_id", cust, "c_custkey", "user_id_fk"),
    ]
    return X.check(ev, rules)


@register(
    "q126_string_kernels",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+')[1] AS w1,
             list_last(string_split_regex(lower(trim(text)), '\\s+')) AS w2
      FROM documents
    )
    SELECT doc_id,
           levenshtein(w1, w2) AS edit_dist,
           reverse(w1) AS w1_rev,
           translate(w1, 'aeiou', '.....') AS w1_devoweled,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           left(w2, 3) AS w2_prefix,
           CAST(ascii(w1) AS BIGINT) AS w1_first_cp
    FROM t
    """,
)
def q126_string_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-kernel surface sweep: edit distance (fuzzy matching),
    reverse, translate (character-class scrubbing), zero-padded id
    rendering, prefix slice, codepoint probe — each a JVM codegen
    expression the cleaning/standardization layer leans on, pinned
    byte-for-byte against the oracle's implementations. Row-local, no
    shuffle."""
    ev = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    w1 = F.element_at(toks, 1)
    w2 = F.element_at(toks, -1)
    return ev.select(
        "doc_id",
        F.levenshtein(w1, w2).alias("edit_dist"),
        F.reverse(w1).alias("w1_rev"),
        F.translate(w1, "aeiou", ".....").alias("w1_devoweled"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.substring(w2, 1, 3).alias("w2_prefix"),
        F.ascii(w1).cast("long").alias("w1_first_cp"),
    )


@register(
    "q127_exact_correlation",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sx,
             SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sy,
             SUM(CAST(ROUND(value * 100) AS BIGINT)
                 * CAST(ROUND(value * 100) AS BIGINT)) AS sxx,
             SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)
                 * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS syy,
             SUM(CAST(ROUND(value * 100) AS BIGINT)
                 * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * n - 1.0), 6) AS covar_scaled,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS corr_value_hour
    FROM m
    """,
)
def q127_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/covariance from EXACT integer moments — the q94
    framework extended to second-order cross-moments: built-in corr()
    accumulates floating partials whose value depends on partition
    order, so cross-engine (and cross-run) hashes can't match; integer
    sums of x, y, x², y², xy are order-independent, and the final
    double arithmetic is a deterministic function of them. This is how
    an engine reports reproducible statistics at 100 TB."""
    ev = load(spark, sf_dir, "events")
    x = cents(F.col("value"))
    y = F.hour("ts").cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    num = nd * sxy - sx * sy
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(num / (nd * F.col("n") - 1.0), 6).alias("covar_scaled"),
        F.round(
            num / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)), 6
        ).alias("corr_value_hour"),
    )


@register(
    "q128_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           CAST(median(CAST(ROUND(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS med_cents_5
    FROM events
    """,
)
def q128_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median over a 5-row window — the robust-smoothing
    companion of q58's rolling mean (outlier-resistant trajectory/price
    smoothing). Spark has no exact median window function; the window
    collects the integer-cents values, sorts the ≤5-element array, and
    takes the middle (odd) or mid-pair average (even) — O(w log w) per
    row for constant w, one shuffle on the entity key. Integer cents
    make the median identical across engines."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(cents(F.col("value"))).over(w))
    n = F.size(arr)
    mid = (n + 1) / 2
    med = F.when(
        n % 2 == 1, F.element_at(arr, F.floor(mid).cast("int")).cast("double")
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2).cast("int") + 1)
        ).cast("double")
        / 2.0
    )
    return ev.select("event_id", "user_id", med.alias("med_cents_5"))


@register(
    "q129_dup_graph_degree",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) - 6),
                            i -> md5(substr(lower(text), i, 8))) AS hashes
      FROM documents WHERE length(text) >= 8
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hashes) - 2),
                           j -> list_min(hashes[j : j + 3]))) AS fps
      FROM grams WHERE len(hashes) >= 4
    ), idx AS (
      SELECT doc_id, unnest(fps) AS fp FROM wins
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT id_a AS node FROM pairs
        UNION ALL SELECT id_b FROM pairs
      ) GROUP BY node
    )
    SELECT degree,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
)
def q129_dup_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-graph degree distribution — the diagnostic a dedup run
    publishes BEFORE committing survivors: how many documents have 1, 2,
    …, k near-dup partners (heavy tails reveal boilerplate/template
    families that deserve their own handling rather than pairwise
    dedup). Built on the deterministic winnowing pairs (q61) so the
    whole profile is hash-checked; degrees come from one explode +
    count, |pairs| work."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = winnow_near_duplicates(docs, "doc_id", "text", 8, 4, min_shared=10)
    nodes = pairs.select(F.col("id_a").alias("node")).unionAll(
        pairs.select(F.col("id_b").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "q130_user_trend",
    oracle="""
    WITH m AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(epoch_us(ts) // 1000000 - 1704067200) AS sx,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sy,
             SUM((epoch_us(ts) // 1000000 - 1704067200)
                 * (epoch_us(ts) // 1000000 - 1704067200)) AS sxx,
             SUM((epoch_us(ts) // 1000000 - 1704067200)
                 * CAST(ROUND(value * 100) AS BIGINT)) AS sxy
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * 86400.0, 6) AS cents_per_day
    FROM m WHERE n >= 2
    """,
)
def q130_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity OLS trend from EXACT integer moments — closed-form
    linear regression (slope of value-cents over time) without MLlib,
    sampling, or iterative fitting: one map-side-combinable aggregation
    of Σx, Σy, Σx², Σxy per user, then deterministic double arithmetic.
    Timestamps ride as SECONDS re-based to 2024-01-01 so the int64
    x²-sums stay far from overflow (a month window in µs would overflow
    the square; seconds give 10⁶× headroom — re-base per partition
    window at decade spans).
    The feature-engineering shape a churn/LTV pipeline computes per
    entity at 100 TB."""
    ev = load(spark, sf_dir, "events")
    x = F.expr("unix_micros(ts) div 1000000") - F.lit(1704067200)
    y = cents(F.col("value"))
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope_per_s = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return m.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.round(slope_per_s * 86400.0, 6).alias("cents_per_day"),
    )


@register(
    "q131_weekday_profile",
    oracle="""
    SELECT dayofweek(CAST(ts AS DATE)) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST((2 * SUM(CAST(ROUND(value * 100) AS BIGINT)) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS avg_cents
    FROM events GROUP BY 1
    """,
)
def q131_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality profile: per day-of-week totals and exact
    half-up average cents (the q10 integer-division form). Day-of-week
    numbering is normalized to DuckDB's Sunday=0 convention (Spark's
    dayofweek is Sunday=1); the q119 date spine + this profile are the
    freshness/seasonality pair a nightly report publishes."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dow")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(cents(F.col("value"))).alias("_s"),
    )
    return g.select(
        "dow",
        F.col("_n").cast("long").alias("n_events"),
        F.col("_s").cast("long").alias("value_cents"),
        F.expr("(2 * _s + _n) div (2 * _n)").cast("long").alias("avg_cents"),
    )


@register(
    "q132_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE) - CAST(EXTRACT(dow FROM ts) AS INTEGER))
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             (CAST(ts AS DATE) - CAST(EXTRACT(dow FROM ts) AS INTEGER)
              - cohort_week) // 7 AS week_offset
      FROM events e JOIN first_seen f USING (user_id)
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM first_seen GROUP BY cohort_week
    )
    SELECT CAST(a.cohort_week AS DATE) AS cohort_week,
           CAST(a.week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 4) AS retention
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def q132_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — THE product-analytics table: users bucketed by
    first-seen week (weeks start Sunday, matching the oracle's dow
    arithmetic), then for each (cohort, week-offset) the fraction of the
    cohort still active. Two aggregations over the events scan plus a
    BROADCAST join of the |cohorts|-sized size table; the per-user
    first-seen reduce is map-side combinable, so the whole report is two
    shuffles end-to-end regardless of history depth."""
    ev = load(spark, sf_dir, "events")
    week = F.date_sub(F.to_date("ts"), F.dayofweek("ts") - 1)
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.select("user_id", week.alias("_w"))
        .join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("_w", F.col("cohort_week")) / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


@register(
    "q133_blame_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT l1.l_suppkey AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY l1.l_suppkey
    """,
)
def q133_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest subquery pattern in the corpus:
    doubly-correlated EXISTS + NOT EXISTS over a self-joined fact
    ("suppliers who were the SOLE late shipper in a multi-supplier
    order"). Catalyst decorrelates both subqueries into left-semi and
    left-anti hash joins on l_orderkey — no per-row re-execution, three
    hash joins total, all on the same key so co-partitioning (bucketing
    by orderkey) removes every exchange at scale. 'Late' is shipdate
    more than 90 days after the order date (this dataset carries no
    receipt/commit dates)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    li.createOrReplaceTempView("q133_lineitem")
    orders.createOrReplaceTempView("q133_orders")
    return spark.sql(
        """
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM q133_lineitem l JOIN q133_orders o
            ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        SELECT l1.l_suppkey AS suppkey,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        WHERE EXISTS (
                SELECT 1 FROM q133_lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
              )
        GROUP BY l1.l_suppkey
        """
    )


@register(
    "q134_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT user_id, status, value_cents FROM (
        SELECT user_id, event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'
      ) WHERE rn = 1
    ),
    new AS (
      SELECT user_id, status, value_cents FROM (
        SELECT user_id, event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT COALESCE(n.user_id, o.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.status AS old_status, o.value_cents AS old_value_cents,
           n.status AS new_status, n.value_cents AS new_value_cents
    FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.status IS DISTINCT FROM n.status
       OR o.value_cents IS DISTINCT FROM n.value_cents
    """,
)
def q134_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff): the day-14 latest-state
    snapshot diffed against the month-end snapshot — one row per key
    that was added, removed, or changed, with old/new values side by
    side (operators/state.py snapshot_diff). The audit a lakehouse runs
    after every ingest ("what did this run actually change?") and the
    generator of an I/U/D changelog for downstream apply_cdc replay.
    |changes|-sized output off one full-outer key join."""
    from noaa_ais_glue_lakehouse_spark.operators.sessionize import latest_per_entity
    from noaa_ais_glue_lakehouse_spark.operators.state import snapshot_diff

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    def snap(df):
        return latest_per_entity(df, "user_id", "ts", ["event_id"]).select(
            "user_id", "status", "value_cents"
        )

    old = snap(ev.filter(F.to_date("ts") < F.lit("2024-01-15").cast("date")))
    new = snap(ev)
    return snapshot_diff(old, new, ["user_id"])


@register(
    "q135_week_type_drift",
    oracle="""
    WITH w AS (
      SELECT user_id,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15' THEN 0 ELSE 1 END
               AS half,
             event_type
      FROM events
    ),
    s AS (
      SELECT user_id,
             COALESCE(list_sort(list_distinct(list(event_type)
               FILTER (WHERE half = 0))), []) AS t1,
             COALESCE(list_sort(list_distinct(list(event_type)
               FILTER (WHERE half = 1))), []) AS t2
      FROM w GROUP BY user_id
    )
    SELECT user_id,
           COALESCE(array_to_string(t1, ','), '') AS first_half_types,
           COALESCE(array_to_string(
             list_sort(list_filter(t2, x -> NOT list_contains(t1, x))), ','), '')
             AS gained,
           COALESCE(array_to_string(
             list_sort(list_filter(t1, x -> NOT list_contains(t2, x))), ','), '')
             AS lost,
           CAST(len(list_filter(t2, x -> list_contains(t1, x))) AS BIGINT)
             AS n_retained
    FROM s
    """,
)
def q135_week_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral drift via ARRAY SET ALGEBRA: each user's distinct
    event-type set in the first vs second half of the month, with
    array_except/array_intersect computing gained, lost, and retained
    behaviors — the array-typed churn signal. collect_set aggregates are
    map-side combinable over tiny sets; everything else is row-local
    array math. Arrays ride as sorted CSV so the oracle pins every
    element."""
    ev = load(spark, sf_dir, "events")
    half = F.when(
        F.to_date("ts") < F.lit("2024-01-15").cast("date"), F.lit(0)
    ).otherwise(F.lit(1))
    s = ev.withColumn("_h", half).groupBy("user_id").agg(
        F.array_sort(
            F.collect_set(F.when(F.col("_h") == 0, F.col("event_type")))
        ).alias("t1"),
        F.array_sort(
            F.collect_set(F.when(F.col("_h") == 1, F.col("event_type")))
        ).alias("t2"),
    )
    return s.select(
        "user_id",
        F.array_join("t1", ",").alias("first_half_types"),
        F.array_join(F.array_sort(F.array_except("t2", "t1")), ",").alias("gained"),
        F.array_join(F.array_sort(F.array_except("t1", "t2")), ",").alias("lost"),
        F.size(F.array_intersect("t2", "t1")).cast("long").alias("n_retained"),
    )


@register(
    "q136_regex_group_extract",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT)
             AS name_id,
           CAST(CASE WHEN CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1)
                          AS BIGINT) = c_custkey
                     THEN 1 ELSE 0 END AS BIGINT) AS name_consistent
    FROM customer
    """,
)
def q136_regex_group_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex CAPTURE-GROUP extraction (regexp_extract group 1) — the
    parse-structured-ids-out-of-strings step every raw zone needs,
    plus a consistency audit of the extracted id against the surrogate
    key. Codegen JVM regex; the pattern sticks to the RE2-compatible
    subset so the oracle runs it verbatim."""
    cust = load(spark, sf_dir, "customer")
    name_id = F.regexp_extract("c_name", r"Customer#([0-9]+)", 1).cast("long")
    return cust.select(
        "c_custkey",
        name_id.alias("name_id"),
        F.when(name_id == F.col("c_custkey"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("name_consistent"),
    )


@register(
    "q137_unigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the corpus (total, vocab-size) scalar to the token stream for LM smoothing",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))
               AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ),
    totals AS (
      SELECT SUM(c) AS total, COUNT(*) AS v FROM vocab
    ),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(ln((v2.c + 1.0) / (tt.total + tt.v))) AS lp
      FROM toks t JOIN vocab v2 USING (tok) CROSS JOIN totals tt
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_logprob
    FROM scored
    """,
)
def q137_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring without an external LM: a unigram
    language model fit on the corpus itself (add-one smoothed), each
    document scored by its mean token log-probability — the
    perplexity-proxy filter a curation pipeline applies when KenLM isn't
    on the cluster, and the exact aggregation shape (explode → broadcast
    vocab join → map-side-combinable log-sum) a real LM-scoring job
    uses. The vocab is |types|-sized and broadcast; the corpus-total
    scalar rides a literal-sized cross join. Log floats round to 6dp for
    cross-engine hash stability (same doubles in, same libm class
    out)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log((F.col("c") + 1.0) / (F.col("total") + F.col("v")))
            ).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_logprob"),
    )


@register(
    "q138_leakage_safe_split",
    build_time_exec="connected components iterate at plan build; the final report also carries a deliberate 1-row violations-count broadcast cross join",
    oracle=_cc_oracle(
        """, assigned AS (
      SELECT d.doc_id,
             COALESCE(r.component, d.doc_id) AS rep_id,
             CASE WHEN CAST(((COALESCE(r.component, d.doc_id) % 2147483648) * 2654435761)
                            % 4294967296 AS DOUBLE) / 4294967296.0 < 0.05
                    THEN 'val'
                  WHEN CAST(((COALESCE(r.component, d.doc_id) % 2147483648) * 2654435761)
                            % 4294967296 AS DOUBLE) / 4294967296.0 < 0.10
                    THEN 'test'
                  ELSE 'train' END AS split
      FROM documents d LEFT JOIN comp r ON d.doc_id = r.node
    ),
    viol AS (
      SELECT COUNT(*) AS n FROM p
      JOIN assigned a ON p.id_a = a.doc_id
      JOIN assigned b ON p.id_b = b.doc_id
      WHERE a.split <> b.split
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((SELECT n FROM viol) AS BIGINT) AS n_split_violations
    FROM assigned GROUP BY split"""
    ),
)
def q138_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split hash rides the
    near-dup COMPONENT representative, so a duplicate family can never
    straddle splits (a val doc with a near-identical twin in train
    silently inflates eval — the contamination the published dedup
    studies warn about). Uses the deterministic winnowing pair graph, so
    the whole assignment — and the zero-violation property itself,
    emitted as a column — is hash-checked against the recursive-CTE
    oracle."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_near_duplicates,
    )
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        leakage_safe_split,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = winnow_near_duplicates(docs, "doc_id", "text", 8, 4, min_shared=10)
    assigned = leakage_safe_split(
        docs.select("doc_id"), "doc_id", pairs.select("id_a", "id_b")
    )
    a = assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("_sa"))
    b = assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("_sb"))
    viol = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_split_violations"))
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(viol))
    )


@register(
    "q139_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (
      SELECT DISTINCT day FROM du
    )
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau,
           CAST(COUNT(*) AS BIGINT) AS n_day_user_pairs
    FROM days d JOIN du u
      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def q139_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU) — the sliding-DISTINCT metric a
    window function cannot express (distinct is not frame-combinable).
    The scale trick: collapse the fact to DISTINCT (day, user) pairs
    FIRST (map-side combinable, |active-days| rows), then EXPLODE each
    pair into the ≤7 window-end days it contributes to — a pure
    equi-aggregation, no range join, no nested loop; window work is
    O(|pairs| × 7), independent of raw event volume. The day-grain pair
    table is exactly what an incremental job persists daily; at extreme
    cardinality the HLL-sketch form (q102's mergeable sketches)
    replaces the exact count."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    # keep only window-end days that exist in the data (the oracle's day
    # spine): a LEFT SEMI equi-join on the tiny distinct-day table
    observed = contrib.join(days, "day", "left_semi")
    return observed.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau"),
        F.count(F.lit(1)).cast("long").alias("n_day_user_pairs"),
    )


@register(
    "q140_psi_drift",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the half- totals scalar to the |bins|-sized PSI table",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15' THEN 0 ELSE 1 END
               AS half,
             LEAST(CAST(FLOOR(value / 10.0) AS BIGINT), 9) AS bin
      FROM events
    ),
    c AS (
      SELECT bin,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1
      FROM b GROUP BY bin
    ),
    t AS (
      SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM c
    ),
    p AS (
      SELECT bin,
             (n0 + 0.5) / (t0 + 5.0) AS p0,
             (n1 + 0.5) / (t1 + 5.0) AS p1
      FROM c, t
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           ROUND(p0, 6) AS p_ref,
           ROUND(p1, 6) AS p_cur,
           ROUND((p1 - p0) * ln(p1 / p0), 6) AS psi_term
    FROM p
    """,
)
def q140_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ML-ops drift metric that decides
    whether a feature's distribution moved enough to retrain: the value
    column binned into fixed-width deciles, first-half vs second-half
    month proportions (Laplace-smoothed so empty bins can't produce
    ±inf), per-bin PSI terms emitted (sum ≥ 0.2 is the standard 'retrain'
    flag). Two conditional-sum aggregations over one scan + a scalar
    totals join; every proportion derives from exact integer counts, so
    the doubles are engine-identical."""
    ev = load(spark, sf_dir, "events")
    half = F.when(
        F.to_date("ts") < F.lit("2024-01-15").cast("date"), F.lit(0)
    ).otherwise(F.lit(1))
    bin_ = F.least(F.floor(F.col("value") / 10.0).cast("long"), F.lit(9))
    c = ev.select(half.alias("_h"), bin_.alias("bin")).groupBy("bin").agg(
        F.sum(F.when(F.col("_h") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("_h") == 1, 1).otherwise(0)).alias("n1"),
    )
    t = c.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    p = c.crossJoin(F.broadcast(t)).select(
        "bin",
        ((F.col("n0") + 0.5) / (F.col("t0") + 5.0)).alias("p0"),
        ((F.col("n1") + 0.5) / (F.col("t1") + 5.0)).alias("p1"),
    )
    return p.select(
        F.col("bin").cast("long").alias("bin"),
        F.round("p0", 6).alias("p_ref"),
        F.round("p1", 6).alias("p_cur"),
        F.round((F.col("p1") - F.col("p0")) * F.log(F.col("p1") / F.col("p0")), 6).alias(
            "psi_term"
        ),
    )


@register(
    "q141_session_entry_exit",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts, event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id
      FROM lagged
    ),
    flows AS (
      SELECT user_id, session_id,
             FIRST_VALUE(event_type) OVER w AS entry_type,
             LAST_VALUE(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_type,
             ROW_NUMBER() OVER w AS rn
      FROM sess
      WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM flows WHERE rn = 1
    GROUP BY entry_type, exit_type
    """,
)
def q141_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry→exit flow matrix: how sessions start vs how they end
    (landing/exit analysis) — first_value/last_value over the session
    frame, one row per session via rn=1, counted into the |types|² flow
    matrix. The sessionize → entry/exit windows all share the entity
    shuffle; the matrix reduce is map-side combinable."""
    ev = load(spark, sf_dir, "events")
    from noaa_ais_glue_lakehouse_spark.operators.sessionize import sessionize

    sess = sessionize(
        ev.select("user_id", "ts", "event_id", "event_type"),
        "user_id",
        "ts",
        gap_seconds=SESSION_GAP_SECONDS,
        tiebreak_cols=["event_id"],
    )
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    flows = sess.select(
        "user_id",
        "session_id",
        F.first("event_type").over(w).alias("entry_type"),
        F.last("event_type").over(w_full).alias("exit_type"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") == 1)
    return flows.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


@register(
    "q142_order_reconciliation",
    oracle="""
    WITH line_sums AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 100) AS BIGINT)) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus AS orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN ls.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missing_lines,
           CAST(SUM(CASE WHEN ls.l_orderkey IS NOT NULL
                          AND ABS(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                                  - ls.line_cents) > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           CAST(MAX(CASE WHEN ls.l_orderkey IS NULL THEN 0
                         ELSE ABS(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                                  - ls.line_cents) END) AS BIGINT)
             AS max_abs_delta_cents
    FROM orders o LEFT JOIN line_sums ls ON o.o_orderkey = ls.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q142_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact reconciliation: every order's header total audited
    against the integer-cents sum of its line items (headers with no
    lines and deltas beyond a cent tolerance surfaced per status) — the
    cross-table consistency check a lakehouse publishes alongside the
    q125 single-table rules. Line sums pre-aggregate to |orders| rows
    before the join; both sides key on orderkey, so bucketing both
    tables makes the whole audit exchange-free (test_bucketing.py shows
    the layout)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    line_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("long")
    sums = li.groupBy("l_orderkey").agg(F.sum(line_cents).alias("line_cents"))
    joined = orders.join(
        sums, orders["o_orderkey"] == sums["l_orderkey"], "left"
    )
    delta = F.abs(cents(F.col("o_totalprice")) - F.col("line_cents"))
    missing = F.col("l_orderkey").isNull()
    return joined.groupBy(F.col("o_orderstatus").alias("orderstatus")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(missing, 1).otherwise(0)).cast("long").alias("n_missing_lines"),
        F.sum(F.when(~missing & (delta > 1), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.max(F.when(missing, F.lit(0)).otherwise(delta))
        .cast("long")
        .alias("max_abs_delta_cents"),
    )


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
    "q144_type_affinity",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the distinct-user-count scalar attached to the |type-pairs|-sized affinity table",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (
      SELECT COUNT(DISTINCT user_id) AS n FROM events
    ),
    singles AS (
      SELECT event_type, COUNT(*) AS c FROM u GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS c_ab
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.c_ab AS BIGINT) AS n_both,
           ROUND(CAST(p.c_ab AS DOUBLE) / nu.n, 6) AS support,
           ROUND(CAST(p.c_ab AS DOUBLE) * nu.n
                 / (CAST(sa.c AS DOUBLE) * sb.c), 6) AS lift
    FROM pairs p
    JOIN singles sa ON p.type_a = sa.event_type
    JOIN singles sb ON p.type_b = sb.event_type
    CROSS JOIN n_users nu
    """,
)
def q144_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (support & lift) over per-user behavior
    sets: which event types co-occur in the same users beyond chance —
    the association-rule primitive. The fact collapses to DISTINCT
    (user, type) first (|users|·|types| max), the pair join is per-user
    with a bounded item vocabulary (k types → ≤ k² pair rows per user),
    and lift derives from exact integer counts. At a real catalog scale
    the same plan runs on the top-N items (q91's vocabulary) to bound
    the pair fan-out."""
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").alias("n"))
    singles = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = u.alias("a")
    b = u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("_ca"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("_cb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("c_ab").cast("long").alias("n_both"),
            F.round(F.col("c_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("_ca").cast("double") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "q145_robust_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, MEDIAN(cents) AS m FROM c GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, c.cents, med.m,
             ABS(c.cents - med.m) AS adev
      FROM c JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(CAST(MIN(d.m) AS DOUBLE), 6) AS median_cents,
           ROUND(CAST(MIN(mad.mad) AS DOUBLE), 6) AS mad_cents,
           CAST(SUM(CASE WHEN mad.mad > 0
                          AND 0.6745 * ABS(d.cents - d.m) / mad.mad > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def q145_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MAD (median absolute deviation) and
    the modified z-score (0.6745·|x−med|/MAD > 3.5, Iglewicz–Hoaglin) —
    the outlier rule that, unlike q94's 3σ, is not itself dragged by the
    outliers it hunts. Two exact-median passes (percentile_cont over
    integer cents) sharing the type partition key; deviations join the
    |types|-sized median table by broadcast. The per-type medians ride
    MIN() through the final rollup (constant within the group) so the
    whole report is one row per type."""
    ev = load(spark, sf_dir, "events")
    c = ev.select("event_type", cents(F.col("value")).alias("cents"))
    med = c.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)").alias("m")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    d = dev.join(F.broadcast(mad), "event_type")
    return d.groupBy("event_type").agg(
        F.round(F.min("m").cast("double"), 6).alias("median_cents"),
        F.round(F.min("mad").cast("double"), 6).alias("mad_cents"),
        F.sum(
            F.when(
                (F.col("mad") > 0)
                & (0.6745 * F.abs(F.col("cents") - F.col("m")) / F.col("mad") > 3.5),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "q146_dedup_savings",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS n_tokens,
             MIN(doc_id) OVER (PARTITION BY text) AS keeper
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS docs_before,
           CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_after,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
           CAST(SUM(CASE WHEN doc_id = keeper THEN n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_after,
           ROUND(1.0 - CAST(SUM(CASE WHEN doc_id = keeper THEN n_tokens
                                     ELSE 0 END) AS DOUBLE)
                 / SUM(n_tokens), 6) AS token_savings
    FROM t
    """,
)
def q146_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report — the number a curation run publishes to
    justify itself: document and TOKEN counts before/after exact dedup
    and the fraction of training compute the dedup saved. The survivor
    flag is a min-id window over the content key (no join-back), so the
    whole report is one window pass + one 1-row aggregate."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text")
    t = docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        F.min("doc_id").over(w).alias("keeper"),
    )
    kept = F.when(F.col("doc_id") == F.col("keeper"), F.col("n_tokens")).otherwise(
        F.lit(0)
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("docs_before"),
        F.sum(F.when(F.col("doc_id") == F.col("keeper"), 1).otherwise(0))
        .cast("long")
        .alias("docs_after"),
        F.sum("n_tokens").cast("long").alias("tokens_before"),
        F.sum(kept).cast("long").alias("tokens_after"),
        F.round(
            1.0 - F.sum(kept).cast("double") / F.sum("n_tokens"), 6
        ).alias("token_savings"),
    )


@register(
    "q147_longest_streak",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS anchor
      FROM d
    ),
    runs AS (
      SELECT user_id, COUNT(*) AS run_len
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def q147_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per user
    via the classic date-minus-row_number anchor (consecutive days share
    an anchor; a gap starts a new island) — the engagement metric and
    THE canonical islands pattern, with zero joins: distinct day grain,
    one window, two aggregations, all sharing the user key."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = d.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    runs = grp.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_streak_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


@register(
    "q148_doc_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(w) - 3),
               i -> array_to_string(w[i : i + 4], ' ')))) AS g
      FROM toks WHERE len(w) >= 5
    ),
    counts AS (
      SELECT g, COUNT(*) AS df FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           ROUND(CAST(SUM(CASE WHEN c.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM grams gr JOIN counts c USING (g)
    GROUP BY gr.doc_id
    """,
)
def q148_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty — the inverse of the boilerplate signal: the
    fraction of a document's distinct word 5-grams that occur NOWHERE
    else in the corpus (document frequency 1). Low novelty = template/
    near-dup material the near-dup families should catch; high novelty =
    unique content worth keeping. One gram explode (distinct within doc),
    one map-side-combinable df count, one join back — the same inverted-
    index shape as contamination checking (q83), pointed at the corpus
    itself."""
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(_word_ngrams(tokenize(F.col("text")), 5))
        ).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    joined = grams.join(counts, "g")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_unique"),
        F.round(
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("novelty"),
    )


@register(
    "q149_type_bitmask",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                             WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                             ELSE 16 END AS mask,
             CAST(ts AS DATE) AS day
      FROM events
    )
    SELECT user_id,
           CAST(BIT_OR(mask) AS BIGINT) AS type_mask,
           CAST(BIT_COUNT(BIT_OR(mask)) AS BIGINT) AS n_distinct_types,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS days_active
    FROM m GROUP BY user_id
    """,
)
def q149_type_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregation: each event type one bit, BIT_OR folding a
    user's whole history into a single long whose popcount is the
    distinct-type count — the bitmap-index trick for set-membership
    rollups (a 64-slot vocabulary compresses 'which features has this
    entity touched' into 8 bytes, mergeable across partitions and days
    like a sketch, but exact). One map-side-combinable aggregation."""
    ev = load(spark, sf_dir, "events")
    mask = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
    )
    m = ev.select("user_id", mask.alias("mask"), F.to_date("ts").alias("day"))
    return m.groupBy("user_id").agg(
        F.bit_or("mask").cast("long").alias("type_mask"),
        F.bit_count(F.bit_or("mask")).cast("long").alias("n_distinct_types"),
        F.countDistinct("day").cast("long").alias("days_active"),
    )


@register(
    "q150_weighted_median",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS w
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag, price_cents, w,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY price_cents, w
                          ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM t
    ),
    m AS (
      SELECT l_returnflag, price_cents,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY price_cents, w) AS rn
      FROM c WHERE 2 * cum_w >= tot_w
    )
    SELECT l_returnflag,
           CAST(price_cents AS BIGINT) AS weighted_median_cents
    FROM m WHERE rn = 1
    """,
)
def q150_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted median price per return flag — the weighted
    quantile no built-in aggregate computes: cumulative-weight prefix
    sums over the ordered values, first row whose cumulative weight
    reaches half the total. Integer-cents weights make the crossing
    point exact; the cum-sum and selection windows share one partition
    key, so the whole statistic is one shuffle. (The unweighted exact
    form is q76; the sketch form is q63.)"""
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        cents(F.col("l_extendedprice")).alias("price_cents"),
        cents(F.col("l_quantity")).alias("w"),
    )
    w_ord = Window.partitionBy("l_returnflag").orderBy("price_cents", "w")
    c = t.select(
        "l_returnflag",
        "price_cents",
        "w",
        F.sum("w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_w"
        ),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tot_w"),
    )
    m = c.filter(2 * F.col("cum_w") >= F.col("tot_w")).withColumn(
        "_rn", F.row_number().over(w_ord)
    )
    return m.filter(F.col("_rn") == 1).select(
        "l_returnflag", F.col("price_cents").cast("long").alias("weighted_median_cents")
    )


@register(
    "q151_k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS k
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS n_reidentifiable_rows,
           CAST(MIN(k) AS BIGINT) AS min_k
    FROM g
    """,
)
def q151_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation, market
    segment): how many equivalence classes fall below k=5 and how many
    rows they expose — the privacy check a dataset release runs AFTER
    PII scrubbing (q103 removes direct identifiers; this measures
    re-identification risk from the indirect ones; remediation is
    generalization or the q125 quarantine). Two-level aggregation,
    |classes| rows at the final reduce."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("long")
        .alias("n_reidentifiable_rows"),
        F.min("k").cast("long").alias("min_k"),
    )


@register(
    "q152_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                    - CAST(ROUND(p.p_retailprice * 70) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
             AS profit_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def q152_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — the widest join in the corpus: the lineitem fact
    enriched through orders (fact⋈fact on orderkey), part and supplier
    (broadcast-sized here; bucketed co-partition at scale) and the
    nation dim, rolled up to profit per nation-year (revenue minus a
    70%-of-retail supply-cost proxy — this dataset carries no partsupp
    cost table). Catalyst orders the joins; the dims broadcast, so the
    fact is shuffled only for the orderkey join and the final rollup."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cost = F.round(F.col("p_retailprice") * 70).cast("long") * F.col(
        "l_quantity"
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(revenue - cost).cast("long").alias("profit_cents"))
    )


@register(
    "q153_decimal_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def q153_decimal_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL-typed money arithmetic: totals accumulated as
    DECIMAL(18,2) — Spark's exact base-10 path (Tungsten's long-backed
    Decimal with overflow widening), the type a finance-grade pipeline
    declares instead of the double+integer-cents idiom the rest of the
    catalog uses. Both engines sum exactly in decimal, so the final
    double render is identical without any rounding step — the same
    order-independence the cents idiom buys, provided natively by the
    type system."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q154_first_touch",
    oracle="""
    SELECT user_id, first_ts, first_type, first_cents FROM (
      SELECT user_id, ts AS first_ts, event_type AS first_type,
             CAST(ROUND(value * 100) AS BIGINT) AS first_cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q154_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution row per user via MIN over an ordered
    STRUCT — the aggregation-based argmin. Unlike the window row_number
    form (q13's latest_per_entity), a struct-min is a plain aggregate:
    map-side combinable, no per-partition sort, no row_number
    materialization — at 100 TB the partial aggregates reduce each
    partition to |keys| rows BEFORE the shuffle, which the window form
    cannot. Struct comparison is lexicographic (ts, then event_id), so
    the winner matches the window oracle exactly."""
    ev = load(spark, sf_dir, "events")
    s = F.struct(
        F.col("ts"),
        F.col("event_id"),
        F.col("event_type"),
        cents(F.col("value")).alias("_c"),
    )
    first = ev.groupBy("user_id").agg(F.min(s).alias("_f"))
    return first.select(
        "user_id",
        F.col("_f.ts").alias("first_ts"),
        F.col("_f.event_type").alias("first_type"),
        F.col("_f._c").cast("long").alias("first_cents"),
    )


@register(
    "q155_winsorized_stats",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(ROUND(value * 100) AS BIGINT),
                                         event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), b AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(FLOOR(0.01 * (n - 1)) AS BIGINT) + 1
                      THEN cents END) AS lo_cents,
             MAX(CASE WHEN rn = CAST(FLOOR(0.99 * (n - 1)) AS BIGINT) + 1
                      THEN cents END) AS hi_cents
      FROM r GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           b.lo_cents, b.hi_cents,
           ROUND(CAST(SUM(LEAST(GREATEST(r.cents, b.lo_cents), b.hi_cents))
                      AS DOUBLE) / COUNT(*), 6) AS winsorized_mean_cents
    FROM r JOIN b USING (event_type)
    GROUP BY r.event_type, b.lo_cents, b.hi_cents
    """,
)
def q155_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) per-type value stats — the outlier-robust
    normalization a feature pipeline applies before model training: clamp
    each value into its group's exact [p01, p99] band, then average.
    Percentile bounds are RANK-BASED (the sorted element at
    floor(p*(n-1))+1), not interpolated — integers survive the
    cross-engine hash where interpolated floats would not. One shuffle:
    row_number, the partition count, and both bound picks all ride the
    same hash-partition by event_type; the final groupBy reuses that
    partitioning (no second exchange), and the clamped sum is exact
    integer cents. At 100 TB the per-group sort is the cost — the same
    cost any exact-percentile requires; for sketch-based bounds at scale
    see q63 (KLL quantiles)."""
    ev = load(spark, sf_dir, "events")
    r = ev.select(
        "event_type", "event_id", cents(F.col("value")).alias("cents")
    )
    wo = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wp = Window.partitionBy("event_type")
    r = r.withColumn("rn", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    lo_idx = F.floor(0.01 * (F.col("n") - 1)).cast("long") + 1
    hi_idx = F.floor(0.99 * (F.col("n") - 1)).cast("long") + 1
    r = r.withColumn(
        "lo_cents",
        F.max(F.when(F.col("rn") == lo_idx, F.col("cents"))).over(wp),
    ).withColumn(
        "hi_cents",
        F.max(F.when(F.col("rn") == hi_idx, F.col("cents"))).over(wp),
    )
    clamped = F.least(
        F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents")
    )
    return (
        r.groupBy("event_type", "lo_cents", "hi_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean_cents"),
        )
        .select(
            "event_type", "n", "lo_cents", "hi_cents", "winsorized_mean_cents"
        )
    )


@register(
    "q156_embedding_dim_stats",
    oracle="""
    WITH e AS (
      SELECT UNNEST(range(len(embedding))) AS dim,
             -- cast BEFORE the multiply: DuckDB would otherwise compute
             -- float32 * int in float32, rounding differently from the
             -- Spark side's float->double->multiply path
             CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS mean_micro,
           ROUND(SQRT(GREATEST(
             (CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE)
              - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE) / COUNT(*))
             / COUNT(*), 0)), 6) AS std_micro
    FROM e GROUP BY dim
    """,
)
def q156_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column — the
    mean/std a whitening or PCA-prep step needs before similarity work
    (a dimension with near-zero variance is dead weight in every cosine).
    posexplode turns vectors into (dim, component) rows; components are
    quantized to exact integer micro-units so the sums are
    order-independent, the square-sums accumulate in DECIMAL(38,0)
    (HUGEINT on the oracle side) to dodge 64-bit overflow at corpus
    scale, and mean/std are derived from those exact moments at the end.
    One explode + one hash-shuffle on dim (64 keys); partial aggregation
    reduces each partition to |dims| rows before the exchange, so at
    100 TB the shuffle moves kilobytes."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    s_d = F.sum("q").cast("double")
    sq_d = F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).cast("double")
    n = F.count(F.lit(1))
    return e.groupBy("dim").agg(
        n.cast("long").alias("n"),
        F.round(s_d / n, 6).alias("mean_micro"),
        F.round(
            F.sqrt(F.greatest((sq_d - s_d * s_d / n) / n, F.lit(0.0))), 6
        ).alias("std_micro"),
    )


@register(
    "q157_profile_report",
    oracle="""
    SELECT 'o_custkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)
    FROM orders
    """,
)
def q157_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column-profile report (row count, null count, exact
    distinct count per column) in long format — the first thing a data
    platform computes on an unfamiliar 100 TB drop, and the statistics
    the q125 expectations engine's thresholds are calibrated from. All
    columns profile in ONE scan: the multi-column COUNT(DISTINCT ...)
    lowers to a single Expand (k row-replicas, one per column) feeding
    one partial+final aggregate — k× shuffle rows but each partition
    pre-reduces to its distinct set, vs k full scans for the naive
    per-column loop. The wide 1-row result is unpivoted driver-side-free
    via an inline array+explode. For approximate profiles at petabyte
    scale swap COUNT(DISTINCT) for approx_count_distinct (q63's sketch
    path) — same plan minus the Expand."""
    cols = [
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
        "o_totalprice",
    ]
    o = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"))
    wide = o.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select(
        "p.column_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


@register(
    "q158_ewma_baseline",
    oracle="""
    WITH recent AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_recent,
           list_reduce(
             list_prepend(0.0,
               list(CAST(cents AS DOUBLE) ORDER BY ts, event_id)),
             (acc, x) -> acc / 2 + x / 2) AS ewma_cents
    FROM recent WHERE rn <= 16
    GROUP BY user_id
    """,
)
def q158_ewma_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average over the 16 most
    recent events (alpha = 1/2, zero-seeded) — the anomaly baseline a
    monitoring pipeline keeps per entity: the next value is compared
    against this decayed history. The fold is a higher-order array
    expression (F.aggregate), entirely JVM-side — no UDF, no state
    store; the bounded-window + ordered-fold shape is exactly what a
    transformWithState handler would do incrementally (q110), computed
    here as a batch backfill. Determinism: alpha = 1/2 keeps every
    partial sum an exact dyadic rational (integer cents x 2^-k, k <= 17
    mantissa bits + 16 shift bits < 53), so the unrounded double is
    bit-identical across engines and fold orders are pinned by the
    sorted (ts, event_id) array. One shuffle on user_id; the per-user
    state is 16 rows regardless of history length."""
    ev = load(spark, sf_dir, "events")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.select(
            "user_id", "ts", "event_id", cents(F.col("value")).alias("cents")
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 16)
    )
    arr = F.transform(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", F.col("cents")))
        ),
        lambda s: s["cents"].cast("double"),
    )
    folded = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc / 2 + x / 2
    )
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_recent"),
        folded.alias("ewma_cents"),
    )


@register(
    "q159_label_centroid_dist",
    oracle="""
    WITH e AS (
      SELECT label, UNNEST(range(len(embedding))) AS dim,
             CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings
    ), cent AS (
      SELECT label, dim,
             CAST(ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
      FROM e GROUP BY label, dim
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(SQRT(CAST(SUM((a.cm - b.cm) * (a.cm - b.cm)) AS DOUBLE)),
                 6) AS dist_micro
    FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def q159_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distances between per-label embedding centroids — the
    class-separation diagnostic behind SemDeDup-style semantic dedup
    (q64) and stratified mixture design (q105): labels whose centroids
    nearly coincide are candidates for merging or re-labeling. Centroid
    components are rounded to exact integer micro-units at the reduce, so
    the pairwise stage is pure integer arithmetic until the final sqrt.
    Scale shape: the only corpus-sized stage is the (label, dim) partial
    aggregate — map-side combine reduces each partition to
    |labels|x|dims| rows before the shuffle; the self-join runs on that
    tiny centroid table (|labels|x|dims| rows), never on the corpus."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    cent = e.groupBy("label", "dim").agg(
        F.round(F.sum("q").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("cm")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("cm").alias("cm_a")
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("cm").alias("cm_b"),
    )
    d = F.col("cm_a") - F.col("cm_b")
    return (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.round(F.sqrt(F.sum(d * d).cast("double")), 6).alias(
                "dist_micro"
            )
        )
    )


@register(
    "q160_inverted_index",
    oracle="""
    WITH t AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), g AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
             (list_sort(list(doc_id)))[1:20] AS postings
      FROM t GROUP BY tok
    )
    SELECT tok, df, postings FROM g ORDER BY df DESC, tok LIMIT 50
    """,
)
def q160_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> document-frequency + (capped,
    sorted) posting list, top-50 tokens by df — the keyword-search /
    corpus-exploration structure a curation team queries to find "all
    docs mentioning X" without a rescan. (doc, token) pairs are
    DISTINCTed before the index reduce (presence, not term frequency —
    q92's TF-IDF covers weighting), posting lists are built with
    collect_set + sort_array and capped with slice() so a stopword's
    postings can't blow up a reduce task; df keeps the full count.
    Map-side combine on the distinct + count; top-k is a TakeOrdered,
    no global sort. At 100 TB the cap is what makes the reduce safe —
    uncapped boilerplate-token postings are the classic index hot key."""
    docs = load(spark, sf_dir, "documents")
    t = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .distinct()
    )
    g = t.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20).alias(
            "postings"
        ),
    )
    return g.orderBy(F.desc("df"), "tok").limit(50)


@register(
    "q161_user_deciles",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS spend_cents
      FROM events GROUP BY user_id
    ), d AS (
      SELECT user_id, spend_cents,
             NTILE(10) OVER (ORDER BY spend_cents DESC, user_id) AS decile
      FROM u
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(spend_cents) AS BIGINT) AS decile_cents,
           CAST(MIN(spend_cents) AS BIGINT) AS floor_cents,
           ROUND(CAST(SUM(spend_cents) AS DOUBLE)
                 / (SELECT SUM(spend_cents) FROM u), 6) AS revenue_share
    FROM d GROUP BY decile
    """,
)
def q161_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation: users ranked by lifetime spend, cut into ten
    equal-count bands, each with its population, revenue, entry floor,
    and share of total revenue — the whale-curve report behind every
    "top 10% of users drive X% of revenue" decision. Two-stage: the
    corpus-sized groupBy(user_id) pre-reduces with map-side combine;
    NTILE then runs over the |users|-sized aggregate (a single-partition
    window — bounded by the entity count, and NTILE is rank-arithmetic
    that cannot be hash-partitioned; at 10^9 users swap in q63's KLL
    quantile cuts and a range join). The revenue-share denominator rides
    a 1-row scalar subquery (broadcast on the Spark side via a window
    total over the 10-row result). Ties are broken by user_id so the
    decile assignment is total and the hash check deterministic."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).alias("spend_cents")
    )
    wd = Window.orderBy(F.desc("spend_cents"), "user_id")
    d = u.withColumn("decile", F.ntile(10).over(wd))
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("spend_cents").cast("long").alias("decile_cents"),
        F.min("spend_cents").cast("long").alias("floor_cents"),
    )
    wt = Window.partitionBy()
    return g.select(
        "decile",
        "n_users",
        "decile_cents",
        "floor_cents",
        F.round(
            F.col("decile_cents").cast("double")
            / F.sum("decile_cents").over(wt),
            6,
        ).alias("revenue_share"),
    )


@register(
    "q162_daily_autocorr",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents
      FROM events GROUP BY 1
    ), p AS (
      SELECT total_cents AS y,
             LAG(total_cents) OVER (ORDER BY day) AS x
      FROM d
    ), m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p WHERE x IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * SQRT(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS r_lag1
    FROM m
    """,
)
def q162_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily-revenue series — the
    seasonality/momentum screen a forecasting pipeline runs before
    choosing model structure (high r_lag1 -> trend-following models;
    near zero -> treat days as independent). Two-stage: the corpus-sized
    groupBy(day) reduces to |days| rows with map-side combine; the lag +
    Pearson moments then run on that tiny series (the single-partition
    window is |days| rows — bounded by calendar length, not data scale).
    All moments are exact integer sums of cents products; the one
    floating-point expression is the final closed-form r, written
    identically on both engines."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents(F.col("value"))).alias("total_cents")
    )
    w = Window.orderBy("day")
    p = d.select(
        F.col("total_cents").alias("y"),
        F.lag("total_cents").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    m = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            (n_d * F.col("sxy") - sx_d * F.col("sy"))
            / (
                F.sqrt(n_d * F.col("sxx") - sx_d * F.col("sx"))
                * F.sqrt(n_d * F.col("syy") - sy_d * F.col("sy"))
            ),
            6,
        ).alias("r_lag1"),
    )


@register(
    "q163_pareto_frontier",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS spend_cents
      FROM events GROUP BY user_id
    ), b AS (
      SELECT n_events, MAX(spend_cents) AS best
      FROM u GROUP BY n_events
    ), f AS (
      SELECT n_events, best,
             MAX(best) OVER (ORDER BY n_events
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prior_best
      FROM b
    )
    SELECT u.user_id, u.n_events, u.spend_cents
    FROM u JOIN f ON u.n_events = f.n_events AND u.spend_cents = f.best
    WHERE f.prior_best IS NULL OR f.best > f.prior_best
    """,
)
def q163_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (skyline) frontier: users not dominated on the
    (fewer-events, higher-spend) trade-off — the multi-objective data-
    selection operator behind "highest quality per token" corpus picks
    and efficiency frontiers generally. Instead of the O(n²)
    dominance self-join, the skyline reduces to a cumulative-max window:
    collapse to the per-x best y (map-side combinable), sort the
    |distinct x| frontier candidates once, keep x-values whose best y
    strictly exceeds every smaller-x best, then join winners back
    (broadcast — the frontier is tiny by construction). The corpus-sized
    stages are the two aggregates; the window touches |distinct x| rows
    only. Ties on the frontier keep all attaining users, so the result
    is set-deterministic with no arbitrary tiebreak."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("spend_cents"),
    )
    b = u.groupBy("n_events").agg(F.max("spend_cents").alias("best"))
    wf = Window.orderBy("n_events").rowsBetween(
        Window.unboundedPreceding, -1
    )
    f = (
        b.withColumn("prior_best", F.max("best").over(wf))
        .filter(
            F.col("prior_best").isNull()
            | (F.col("best") > F.col("prior_best"))
        )
        # disambiguate: b derives from u, so the join below is a self-join
        # by lineage — rename the frontier's key columns outright
        .select(
            F.col("n_events").alias("f_n_events"), F.col("best").alias("f_best")
        )
    )
    return u.join(
        F.broadcast(f),
        (F.col("n_events") == F.col("f_n_events"))
        & (F.col("spend_cents") == F.col("f_best")),
    ).select("user_id", "n_events", "spend_cents")


@register(
    "q164_lexical_diversity",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(n), 6) AS type_token_ratio,
           ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_fraction
    FROM c GROUP BY source
    """,
)
def q164_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: token count, vocabulary
    size, hapax legomena (once-only tokens) and the derived type-token /
    hapax ratios — the corpus-QA screen that separates natural prose
    (high diversity) from boilerplate and template spam (low TTR, low
    hapax fraction) before documents reach training. Two-stage
    aggregation: (source, token) counts pre-reduce map-side so the
    shuffle carries one row per distinct term per partition — never per
    occurrence — and the per-source reduce is |vocab|-sized. The same
    two-level shape as q91's vocabulary; the ratios are exact-count
    divisions rendered once at the end."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    c = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("n"), 6
        ).alias("type_token_ratio"),
        F.round(
            hapax.cast("double") / F.count(F.lit(1)), 6
        ).alias("hapax_fraction"),
    )


@register(
    "q165_embedding_norm_audit",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the (mean, std) moment scalar attached to the row-local norm projection, and the 1-row outlier count attached to the 1-row stats report",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             CAST(ROUND(SQRT(CAST(list_sum(list_transform(
               list_transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
               q -> q * q)) AS DOUBLE))) AS BIGINT) AS norm_micro
      FROM embeddings
    ), m AS (
      SELECT COUNT(*) AS n, SUM(norm_micro) AS s,
             SUM(CAST(norm_micro AS HUGEINT) * norm_micro) AS sq
      FROM v
    )
    SELECT CAST(m.n AS BIGINT) AS n_vecs,
           ROUND(CAST(m.s AS DOUBLE) / m.n, 6) AS mean_norm_micro,
           ROUND(SQRT(GREATEST(
             (CAST(m.sq AS DOUBLE) - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
              / m.n) / m.n, 0)), 6) AS std_norm_micro,
           CAST((SELECT COUNT(*) FROM v, m
                 WHERE ABS(CAST(v.norm_micro AS DOUBLE)
                           - CAST(m.s AS DOUBLE) / m.n)
                       > 3 * SQRT(GREATEST(
                           (CAST(m.sq AS DOUBLE)
                            - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
                           / m.n, 0))) AS BIGINT) AS n_outliers_3sigma
    FROM m
    """,
)
def q165_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm audit: the L2-norm distribution of the corpus
    vectors plus a 3-sigma outlier count — the first sanity check on any
    embedding drop (a cluster of near-zero or huge norms means a broken
    encoder batch; cosine pipelines silently degrade on them). Norms are
    computed row-local from integer micro components (one array fold, no
    shuffle), quantized to integer micro-units so the moment sums are
    exact, and the outlier pass re-uses the same tiny (n, s, sq) scalar
    via a broadcast — two scans of a row-local projection, zero
    corpus-sized shuffles; the only reduce carries three numbers."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("long"),
    )
    v = emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    q, F.lit(0).cast("long"), lambda acc, x: acc + x * x
                ).cast("double")
            )
        )
        .cast("long")
        .alias("norm_micro"),
    )
    m = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("norm_micro").alias("s"),
        F.sum(
            F.col("norm_micro").cast("decimal(38,0)") * F.col("norm_micro")
        ).alias("sq"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    sq_d = F.col("sq").cast("double")
    mean = s_d / F.col("n")
    std = F.sqrt(F.greatest((sq_d - s_d * s_d / F.col("n")) / F.col("n"), F.lit(0.0)))
    stats = m.select(
        F.col("n").cast("long").alias("n_vecs"),
        F.round(mean, 6).alias("mean_norm_micro"),
        F.round(std, 6).alias("std_norm_micro"),
        mean.alias("_mean"),
        std.alias("_std"),
    )
    out = (
        v.crossJoin(F.broadcast(stats))
        .filter(
            F.abs(F.col("norm_micro").cast("double") - F.col("_mean"))
            > 3 * F.col("_std")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_outliers_3sigma"))
    )
    return stats.select(
        "n_vecs", "mean_norm_micro", "std_norm_micro"
    ).crossJoin(F.broadcast(out))


@register(
    "q166_source_vocab_overlap",
    oracle="""
    WITH t AS (
      SELECT DISTINCT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), sz AS (
      SELECT source, COUNT(*) AS n FROM t GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(i.n_shared AS DOUBLE)
                 / (sa.n + sb.n - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.source_a
    JOIN sz sb ON sb.source = i.source_b
    """,
)
def q166_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap (Jaccard) between sources — the
    mixture-design diagnostic telling you whether two corpus slices are
    redundant (near-identical vocabularies) or complementary before
    weighting them (q105). The (source, token) presence set is
    DISTINCTed map-side; the only corpus-sized shuffle is that distinct.
    The overlap self-join is keyed on token — an equi-join over
    |vocab|x|sources| rows, NOT documents — and source< ordering halves
    the pair space; vocabulary sizes broadcast back onto the
    |source-pairs| result. At web scale the token join inherits the
    stopword hot keys, which is exactly what q107's skew audit flags and
    a salt (operators/skew.py) spreads."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    sz = t.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = t.select(F.col("source").alias("source_a"), "tok")
    b = t.select(F.col("source").alias("source_b"), F.col("tok").alias("tok_b"))
    inter = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H shapes not yet in the catalog: Q19 disjunctive predicates, Q13
# count-distribution, Q11 scalar-subquery HAVING, Q22 anti-join + global
# average gate (SURVEY 2.12 X97)
# ---------------------------------------------------------------------------


@register(
    "q167_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 15 AND 35)
       OR (p_type  = 'PROMO'   AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 30 AND 50)
    """,
)
def q167_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR-of-ANDs predicate spanning both join sides.

    Catalyst cannot push the full disjunction below the join (each arm
    references both tables), so the classic manual rewrite applies: the
    part-side projection of the disjunction IS pushable, and prefiltering
    part before the broadcast join shrinks the build side to the union of
    the three arms. The residual disjunction is evaluated post-join as a
    single codegen'd predicate. At 100 TB the fact side streams through
    one broadcast join with no shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    part_side = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(20, 50))
    )
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(15, 35)
    )
    arm3 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(30, 50)
    )
    return (
        li.join(
            F.broadcast(part.filter(part_side)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(arm1 | arm2 | arm3)
        .agg(
            (F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0)
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q168_custdist",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q168_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of per-customer order counts,
    including zero-order customers (the left join keeps them; COUNT of a
    nullable column counts only matches).

    Two aggregations: the first shuffles on c_custkey (the join key, so
    AQE reuses the exchange), the second is over |customers| rows and
    collapses to |distinct counts| — tiny. The join-side filter on
    o_orderpriority is part of the JOIN condition, not a WHERE (a WHERE
    would turn the left join into an inner one).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q169_important_parts",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (total, n_parts) scalar attached to the |parts|-sized rollup (TPC-H Q11's scalar subquery in HAVING)",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS value_cents
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           CAST(value_cents AS DOUBLE)/100.0 AS part_value
    FROM pv
    WHERE CAST(value_cents AS DOUBLE)
          > CAST((SELECT SUM(value_cents) FROM pv) AS DOUBLE)
            / (SELECT COUNT(*) FROM pv) * 1.3
    """,
)
def q169_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — groups whose value exceeds a threshold derived
    from a GLOBAL aggregate (scalar subquery in HAVING; here 1.3x the
    mean per-part value, which is scale-invariant where Q11's fixed
    fraction would select everything or nothing as |parts| grows).

    One shuffle builds the per-part rollup; the global total is an
    aggregate of that |parts|-sized result, broadcast back as a
    single-row cross join — the rollup is computed once and reused for
    both sides (cache-free: Catalyst's ReuseExchange dedups the scan).
    Value arithmetic is exact integer cents; only the final comparison is
    double.
    """
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(cents(F.col("l_extendedprice"))).alias("value_cents")
    )
    total = pv.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents").cast("double")
            > F.col("total_cents").cast("double") / F.col("n_parts") * 1.3
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


@register(
    "q170_rich_inactive_customers",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the global average- balance gate attached to the customer scan (TPC-H Q22's scalar subquery)",
    oracle="""
    WITH gate AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT substr(c_name, length(c_name)-1, 2) AS code,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_bal
    FROM customer, gate
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def q170_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — above-global-average balance AND no urgent
    orders (scalar-subquery gate + anti-join), grouped by a derived code
    (last two digits of the customer name, standing in for Q22's country
    code; the urgency filter stands in for Q22's 7-year recency window,
    which this dataset's 30-day span can't express).

    The global average is exact (integer-cents sum / count, one double
    division both engines perform identically) and broadcast as a
    single row; the NOT EXISTS is a left-anti hash join on c_custkey.
    At scale: one shuffle for the anti-join (or none if orders' custkey
    projection is small enough to broadcast), then a tiny group-by on
    the 2-digit code.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    gate = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                (F.sum(cents(F.col("c_acctbal"))).cast("double") / 100.0)
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cust.crossJoin(F.broadcast(gate))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy(
            F.substring(F.col("c_name"), -2, 2).alias("code")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            (F.sum(cents(F.col("c_acctbal"))) / 100.0).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Scale-path additions: prefix-filter exact Jaccard join, parallel global
# prefix-scan concurrency, duration-weighted averages, OHLC downsampling
# (X98-X101)
# ---------------------------------------------------------------------------


@register(
    "q171_jaccard_prefix_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                       x -> x <> '')) AS sh
      FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (a.n + b.n - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sized a, sized b
    WHERE a.doc_id < b.doc_id
      AND LEAST(a.n, b.n) >= GREATEST(a.n, b.n) * 0.8
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (a.n + b.n - len(list_intersect(a.sh, b.sh))) >= 0.8
    """,
)
def q171_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98 — EXACT near-dup pairs via the AllPairs/PPJoin prefix filter:
    identical output to the O(n²) baseline (the oracle IS the brute-force
    query), but every join is a keyed equi-join on rarest-first prefix
    tokens. The scale path when dedup policy demands exactness — unlike
    q27/q28 there is no recall to argue about.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        jaccard_pairs_prefix_filter,
    )

    docs = load(spark, sf_dir, "documents")
    return jaccard_pairs_prefix_filter(docs, "doc_id", "text", threshold=0.8)


@register(
    "q172_max_concurrent_sessions",
    oracle=_SESSIONIZED_CTE
    + """,
    sessions AS (
      SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
      FROM sess GROUP BY user_id, session_id
    ),
    b AS (
      SELECT st AS ts, 1 AS delta FROM sessions
      UNION ALL
      SELECT en AS ts, -1 AS delta FROM sessions
    ),
    r AS (
      SELECT ts, SUM(delta) OVER (ORDER BY ts, delta DESC
                                  ROWS UNBOUNDED PRECEDING) AS c
      FROM b
    )
    SELECT CAST(MAX(c) AS BIGINT) AS max_concurrent,
           strftime(MIN(ts) FILTER (WHERE c = (SELECT MAX(c) FROM r)),
                    '%Y-%m-%d %H:%M:%S') AS at_ts
    FROM r
    """,
)
def q172_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X99 — peak concurrency via sweep line: +1 at each session start,
    -1 at each end (starts before ends on ties, so instantaneous sessions
    count), running-sum over the global time order, max + first time it
    is reached.

    The global running sum is the interesting part at scale: a bare
    ``SUM() OVER (ORDER BY ts)`` is a one-task window, so this uses
    ``global_running_sum`` — a two-phase parallel prefix scan
    (range-repartition → per-partition local scan → broadcast exclusive
    offsets). The final aggregate is one ``max(struct(c, -micros))``:
    max concurrency and the earliest timestamp achieving it in a single
    combinable pass.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    ev = load(spark, sf_dir, "events")
    s = sessionize(
        ev, "user_id", "ts", SESSION_GAP_SECONDS, tiebreak_cols=["event_id"]
    )
    sessions = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    b = sessions.select(F.col("st").alias("ts"), F.lit(1).alias("delta")).unionAll(
        sessions.select(F.col("en").alias("ts"), F.lit(-1).alias("delta"))
    )
    # order by (ts, -delta): +1 boundaries sort before -1 at equal ts,
    # matching the oracle's ORDER BY ts, delta DESC
    r = global_running_sum(
        b.withColumn("_negdelta", -F.col("delta")),
        ["ts", "_negdelta"],
        "delta",
        out_col="c",
    )
    top = r.agg(
        F.max(F.struct(F.col("c"), (-F.unix_micros("ts")).alias("_negus"))).alias(
            "_m"
        )
    )
    return top.select(
        F.col("_m.c").cast("long").alias("max_concurrent"),
        F.date_format(
            F.timestamp_micros(-F.col("_m._negus")), "yyyy-MM-dd HH:mm:ss"
        ).alias("at_ts"),
    )


@register(
    "q173_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - epoch_us(ts)
               AS dur_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           ROUND(CAST(SUM(CAST(ROUND(value*100) AS BIGINT) * dur_us) AS DOUBLE)
                 / CAST(SUM(dur_us) AS DOUBLE) / 100.0, 6) AS twa_value
    FROM d WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
)
def q173_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100 — duration-weighted average: each reading holds until the
    next one, so its weight is the microsecond gap to the successor
    (last reading carries no span). The irregular-sampling-proof mean —
    an arithmetic mean over-weights bursts, exactly the bias q78's grid
    resample also fights.

    One shuffle: the lead window and the group-by share the user_id
    key. Exact arithmetic: integer cents x integer microseconds sums in
    BIGINT (cents, not millionths: |value|<=~10^3 and per-user spans sum
    to <=30 days ~ 2.6e12 us, so cents keeps the sum under 2^63 where
    millionths would overflow Spark's ANSI BIGINT sum — DuckDB hides
    this by summing in HUGEINT); one double division at the end.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn(
        "dur_us", F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    vi = F.round(F.col("value") * 100).cast("long")
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.round(
            F.sum(vi * F.col("dur_us")).cast("double")
            / F.sum("dur_us").cast("double")
            / 100.0,
            6,
        ).alias("twa_value"),
    )


@register(
    "q174_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
             value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, hr,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM e GROUP BY event_type, hr
    """,
)
def q174_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101 — OHLC downsampling: per (series, hour) the first, max, min
    and last reading. open/close use ``min_by``/``max_by`` on a
    (ts, event_id) struct key — combinable aggregates (map-side partials,
    one shuffle), NOT a row_number window + filter, which would shuffle
    the full table twice. The (ts, event_id) struct makes first/last
    total even with duplicate timestamps. Values pass through unsummed,
    so doubles match the oracle bit-for-bit.
    """
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hr"
            ),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
        )
    )


# ---------------------------------------------------------------------------
# Replication parity, trend, information-theoretic drift, graph rank,
# throttling (X102-X107)
# ---------------------------------------------------------------------------


@register(
    "q175_table_checksum",
    oracle="""
    WITH h AS (
      SELECT md5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
                           CAST(n_chars AS VARCHAR))) AS md
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT md) AS BIGINT) AS n_distinct_rows,
           CAST(bit_xor(CAST(concat('0x', substr(md, 1, 15)) AS BIGINT))
                AS BIGINT) AS xor_checksum
    FROM h
    """,
)
def q175_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102 — order-independent whole-table fingerprint for replication /
    migration parity checks (did the copy land bit-identical?): XOR of a
    per-row md5-derived 60-bit integer plus row and distinct-row counts.

    XOR is commutative+associative, so the checksum is independent of
    row order AND partitioning — comparable across engines, file layouts
    and cluster sizes, with map-side partial aggregation (one scalar per
    partition, one 1-row shuffle). md5 (not xxhash64) because the
    fingerprint must be engine-portable — this query IS the cross-engine
    proof, the same value computed by Spark and DuckDB.
    """
    docs = load(spark, sf_dir, "documents")
    md = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("text"),
            F.col("lang"),
            F.col("source"),
            F.col("n_chars").cast("string"),
        )
    )
    h = docs.select(
        md.alias("md"),
        F.conv(F.substring(md, 1, 15), 16, 10).cast("long").alias("h"),
    )
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("md").cast("long").alias("n_distinct_rows"),
        F.bit_xor("h").cast("long").alias("xor_checksum"),
    )


@register(
    "q176_week_over_week",
    oracle="""
    WITH wk AS (
      SELECT event_type,
             strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_start,
           CAST(n AS BIGINT) AS n_events,
           CAST(LAG(n) OVER (PARTITION BY event_type ORDER BY week_start)
                AS BIGINT) AS prev_week,
           ROUND((n - LAG(n) OVER (PARTITION BY event_type ORDER BY week_start))
                 * 100.0
                 / LAG(n) OVER (PARTITION BY event_type ORDER BY week_start),
                 6) AS growth_pct
    FROM wk
    """,
)
def q176_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X103 — period-over-period trend: weekly volumes per series with
    the previous period and percent growth (NULL on each series' first
    week — no fabricated baseline). The windows run over the
    |series x weeks| rollup, not the raw table; Monday-start
    ``date_trunc('week')`` agrees between Spark and DuckDB.
    """
    ev = load(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week_start"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week_start")
    prev = F.lag("n").over(w)
    return wk.select(
        "event_type",
        "week_start",
        F.col("n").cast("long").alias("n_events"),
        prev.cast("long").alias("prev_week"),
        F.round((F.col("n") - prev) * 100.0 / prev, 6).alias("growth_pct"),
    )


@register(
    "q177_source_token_entropy",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
    ), s AS (
      SELECT source, SUM(n) AS tot FROM c GROUP BY 1
    )
    SELECT c.source,
           CAST(MAX(s.tot) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(-SUM((n / CAST(s.tot AS DOUBLE))
                      * ln(n / CAST(s.tot AS DOUBLE))) / ln(2.0), 6)
             AS entropy_bits
    FROM c JOIN s ON c.source = s.source
    GROUP BY c.source
    """,
)
def q177_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104 — Shannon entropy (bits) of each source's unigram
    distribution: the one-number diversity/repetitiveness signal per
    corpus slice (boilerplate-heavy sources score low — prime dedup /
    downweight candidates before mixing, complementing q137's
    per-document LM score with a per-slice view).

    Two keyed shuffles: (source, token) counts, then per-source
    aggregation; per-source totals ride along as max(tot) instead of a
    second join. Entropy terms are exact count ratios; only the final
    sum is float (round 6 absorbs association-order noise).
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("source"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.withColumn("tot", tot)
        .groupBy("source")
        .agg(
            F.max("tot").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6
            ).alias("entropy_bits"),
        )
    )


@register(
    "q178_source_js_divergence",
    allow_non_equi="deliberate |sources|\u00b2 pair-spine theta self-join (tiny broadcast): disjoint-vocabulary pairs must appear with JSD = 1",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
    ), s AS (
      SELECT source, SUM(n) AS tot FROM c GROUP BY 1
    ), p AS (
      SELECT c.source, c.tok, c.n / CAST(s.tot AS DOUBLE) AS p
      FROM c JOIN s ON c.source = s.source
    ), shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             SUM(a.p * ln(2.0 * a.p / (a.p + b.p))) AS s1,
             SUM(b.p * ln(2.0 * b.p / (a.p + b.p))) AS s2,
             SUM(a.p) AS ma, SUM(b.p) AS mb
      FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    ), spine AS (
      -- every source pair, even ones sharing ZERO tokens: the inner
      -- token join emits nothing for them, and absence would read as
      -- "no drift" for exactly the maximally-diverged (JSD = 1) pairs
      SELECT a.source AS source_a, b.source AS source_b
      FROM s a JOIN s b ON a.source < b.source
    )
    SELECT sp.source_a, sp.source_b,
           ROUND((0.5 * (COALESCE(sh.s1, 0.0)
                         + (1.0 - COALESCE(sh.ma, 0.0)) * ln(2.0))
                  + 0.5 * (COALESCE(sh.s2, 0.0)
                           + (1.0 - COALESCE(sh.mb, 0.0)) * ln(2.0)))
                 / ln(2.0), 6) AS jsd_bits
    FROM spine sp
    LEFT JOIN shared sh
      ON sh.source_a = sp.source_a AND sh.source_b = sp.source_b
    """,
)
def q178_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X105 — Jensen-Shannon divergence (bits) between every pair of
    source unigram distributions: the distribution-aware complement to
    q166's vocabulary Jaccard (two slices can share vocab yet use it
    with very different frequencies) and the principled mixture-design /
    drift metric (symmetric, bounded [0,1] in bits).

    The trick that keeps it one INNER equi-join on token: for tokens
    present only in P, the JSD integrand collapses to p·ln2 — so each
    side's exclusive mass contributes (1 − shared_mass)·ln2 in closed
    form, and only shared tokens need the pairwise term. No full-outer
    join, no union of vocabularies; the join is |vocab|x|sources|-sized,
    never document-sized, and inherits q166's skew note on stopword keys.
    A |sources|²-row pair spine left-joins the shared aggregate so pairs
    with fully disjoint vocabularies still report (JSD = 1) instead of
    silently vanishing from the drift report.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pcol = (F.col("n") / F.sum("n").over(Window.partitionBy("source"))).alias(
        "p"
    )
    p = c.select("source", "tok", pcol)
    a = p.select(
        F.col("source").alias("source_a"), "tok", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("source_b"),
        F.col("tok").alias("tok_b"),
        F.col("p").alias("pb"),
    )
    ln2 = F.log(F.lit(2.0))
    shared = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.col("pa")
                * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))
            ).alias("s1"),
            F.sum(
                F.col("pb")
                * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("s2"),
            F.sum("pa").alias("ma"),
            F.sum("pb").alias("mb"),
        )
    )
    # pair spine over the |sources|-sized distinct list: pairs sharing
    # no token at all must still appear (their JSD is exactly 1 bit) —
    # a tiny broadcast theta self-join, |sources|² rows. Derived from
    # the COUNTS table, not documents: a source whose texts all tokenize
    # to nothing has no distribution to diverge from and is absent from
    # the oracle's CTEs too.
    srcs = c.select("source").distinct()
    spine = srcs.select(F.col("source").alias("source_a")).join(
        F.broadcast(srcs.select(F.col("source").alias("source_b"))),
        F.col("source_a") < F.col("source_b"),
    )
    j = spine.join(shared, ["source_a", "source_b"], "left")
    s1 = F.coalesce("s1", F.lit(0.0))
    s2 = F.coalesce("s2", F.lit(0.0))
    ma = F.coalesce("ma", F.lit(0.0))
    mb = F.coalesce("mb", F.lit(0.0))
    return j.select(
        "source_a",
        "source_b",
        F.round(
            (
                0.5 * (s1 + (1.0 - ma) * ln2)
                + 0.5 * (s2 + (1.0 - mb) * ln2)
            )
            / ln2,
            6,
        ).alias("jsd_bits"),
    )


@register(
    "q179_event_type_pagerank",
    build_time_exec="pagerank counts |V| once at plan build to seed the uniform vector",
    oracle="""
    WITH lg AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), t AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM e
    ), nodes AS (
      SELECT src AS node FROM t UNION SELECT dst FROM t
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (
      SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ),
    pr1 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr0 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    ),
    pr2 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr1 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    ),
    pr3 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr2 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    )
    SELECT node AS event_type, ROUND(rank, 6) AS pagerank FROM pr3
    """,
)
def q179_event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X106 — weighted PageRank over the event-type transition graph
    (the Markov edges of q97), 3 fixed iterations, d=0.85. On web-crawl
    corpora the same operator ranks domain authority for crawl-frontier
    and quality filtering; the graph here is tiny but the operator is
    the generic DataFrame-join iteration (two keyed shuffles per round,
    no driver state — see operators/graph.py). The oracle unrolls the
    identical recurrence as chained CTEs (DuckDB's recursive CTEs don't
    allow the aggregate in the recursive term).
    """
    from noaa_ais_glue_lakehouse_spark.operators.graph import pagerank

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, "src", "dst", "w", iterations=3, damping=0.85)
    return ranks.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
    )


@register(
    "q180_event_throttle",
    oracle="""
    WITH lg AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE gap_us IS NULL OR gap_us >= 1800000000)
                AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE gap_us < 1800000000)
                AS BIGINT) AS n_dropped
    FROM lg GROUP BY user_id
    """,
)
def q180_event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X107 — per-(user, type) throttle audit: an event is dropped when
    it follows the previous RAW event of the same stream by under 30
    minutes. One-pass lag semantics (gap measured to the raw
    predecessor, not the last KEPT event — true debounce is inherently
    sequential; the one-pass form is the standard distributed
    approximation and is stated, not hidden). One shuffle: lag window
    and rollup share the user key.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    lim = 1800 * 1000000
    d = ev.withColumn("gap_us", gap)
    return d.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") >= lim), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("gap_us") < lim, 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Stream-static enrichment, bigram LM scoring, zone-map skipping audit,
# mixture temperature (X108-X111)
# ---------------------------------------------------------------------------


@register(
    "q181_stream_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def q181_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join under the correctness gate: the event stream
    enriched with a static dimension (customer segment) and aggregated,
    drained with availableNow and hash-checked against the batch join.

    The static side is a plain batch DataFrame — Spark broadcasts it
    into every microbatch with NO join state at all (unlike q96's
    stream-stream state store); this is the canonical streaming
    dimension-enrichment shape. Complete-mode aggregation makes the
    final table equal the batch result exactly.
    """
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    d = tempfile.mkdtemp(prefix="q181_")
    os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
    stream = spark.readStream.schema(file_schema).parquet(d)

    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )
    name = f"q181_sse_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q181_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "segment", "event_type", "n_events", "total_value"
    )


@register(
    "q182_bigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the vocab-size scalar attached to the bigram stream for add-one smoothing",
    oracle="""
    WITH lst AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents
    ), toks AS (
      SELECT doc_id, UNNEST(l) AS tok,
             UNNEST(range(1, len(l) + 1)) AS pos
      FROM lst
    ), bg AS (
      SELECT doc_id, tok AS w2,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM toks
    ), bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w1 IS NOT NULL),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bgn GROUP BY 1, 2),
    c1 AS (SELECT tok AS w1, COUNT(*) AS n1 FROM toks GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab FROM toks)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(ln((c2.n2 + 1.0) / (c1.n1 + (SELECT vocab FROM v))))
                 / COUNT(*), 6) AS avg_logprob
    FROM bgn d
    JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
    JOIN c1 ON c1.w1 = d.w1
    GROUP BY d.doc_id
    """,
)
def q182_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109 — corpus-bigram LM quality score: each document's mean
    add-one-smoothed conditional bigram log-probability
    ln((C(w1,w2)+1)/(C(w1)+|V|)) under the corpus's own statistics —
    the sequence-aware upgrade of q137's unigram score (word-salad text
    with plausible unigrams scores low here).

    Shape: one doc-keyed lag window extracts bigrams; corpus bigram and
    unigram tables are built once and equi-joined back (the n-gram keyed
    joins carry stopword-pair hot keys — q107's skew audit applies).
    Every count is exact-integer; only the final mean is float.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgn = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w2"),
            F.lag("tok").over(w).alias("w1"),
        )
        .where(F.col("w1").isNotNull())
    )
    c2 = bgn.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = toks.groupBy(F.col("tok").alias("w1")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    v = toks.agg(
        F.countDistinct("tok").cast("double").alias("vocab")
    )
    return (
        bgn.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.log(
                        (F.col("n2") + 1.0)
                        / (F.col("n1") + F.col("vocab"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


@register(
    "q183_zone_map_audit",
    oracle="""
    WITH z AS (
      SELECT CAST(FLOOR(event_id / 2048) AS BIGINT) AS zone,
             MIN(ts) AS min_ts, MAX(ts) AS max_ts, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT zone,
           strftime(min_ts, '%Y-%m-%d %H:%M:%S') AS min_ts,
           strftime(max_ts, '%Y-%m-%d %H:%M:%S') AS max_ts,
           CAST(n AS BIGINT) AS n_rows,
           max_ts < TIMESTAMP '2024-01-25 00:00:00' AS skippable
    FROM z
    """,
)
def q183_zone_map_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X110 — zone-map (data-skipping) effectiveness audit: per
    2048-row ingestion zone (the row-group/file proxy — event_id is
    ~perfectly ingestion-time ordered in this data, exactly the layout
    the Morton writer in sources/writers.py produces for 2-D keys),
    min/max statistics on the SECONDARY predicate column and whether a
    ``ts >= cutoff`` scan could skip the zone entirely.

    This is the planner's-eye view of q109's compaction work: zone
    min/max on a well-clustered layout is what turns a full scan into a
    tail read at 100 TB. The audit itself is one hash aggregation.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("event_id") / 2048).cast("long").alias("zone")
        )
        .agg(
            F.min("ts").alias("_min_ts"),
            F.max("ts").alias("_max_ts"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(
            "zone",
            F.date_format("_min_ts", "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
            F.date_format("_max_ts", "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
            "n_rows",
            (
                F.col("_max_ts") < F.to_timestamp(F.lit("2024-01-25 00:00:00"))
            ).alias("skippable"),
        )
    )


@register(
    "q184_mixture_temperature",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the token-total and weight-total scalars attached to the |sources|-sized mixture table",
    oracle="""
    WITH n AS (
      SELECT source,
             SUM(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> ''))) AS n_tokens
      FROM documents GROUP BY 1
    ), p AS (
      SELECT source, n_tokens,
             CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM n) AS share,
             pow(CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM n), 0.7)
               AS raw_w
      FROM n
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(share, 6) AS natural_share,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM p), 6) AS sampled_share,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM p) / share, 6) AS upweight
    FROM p
    """,
)
def q184_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X111 — temperature-based mixture reweighting (alpha=0.7, the
    standard multilingual/multi-source sampling exponent): each slice's
    natural token share is flattened to share^alpha and renormalized,
    up-weighting small sources without letting any source dominate.
    Feeds q105's budgeted sampler with principled per-source budgets
    instead of hand-set ones.

    All heavy work is one per-source token-count aggregation; the
    normalizations are single-row broadcasts over a |sources|-sized
    table.
    """
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).alias("n_tokens")
    )
    tot = n.agg(F.sum("n_tokens").alias("_tot"))
    p = n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot")).alias("share"),
        F.pow(
            F.col("n_tokens").cast("double") / F.col("_tot"), F.lit(0.7)
        ).alias("raw_w"),
    )
    wtot = p.agg(F.sum("raw_w").alias("_wtot"))
    return p.crossJoin(F.broadcast(wtot)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("share", 6).alias("natural_share"),
        F.round(F.col("raw_w") / F.col("_wtot"), 6).alias("sampled_share"),
        F.round(F.col("raw_w") / F.col("_wtot") / F.col("share"), 6).alias(
            "upweight"
        ),
    )


# ---------------------------------------------------------------------------
# Point-in-time SCD2 lookup and K-step ordered funnel (X112-X113)
# ---------------------------------------------------------------------------


@register(
    "q185_scd2_point_in_time",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, event_id) AS valid_to
      FROM changes
    ),
    f AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_id % 10 = 7
    )
    SELECT f.event_id, f.user_id,
           d.event_type AS state_at_event,
           CAST(ROUND(f.value*100) AS BIGINT) AS value_cents
    FROM f JOIN dim d
      ON d.user_id = f.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def q185_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X112 — point-in-time (temporal) lookup against the SCD2 dimension
    q108 builds: each fact row enriched with the dimension state whose
    validity interval [valid_from, valid_to) contains its timestamp.

    The oracle states it as the natural interval join; the Spark plan
    deliberately does NOT — an inequality join would be a broadcast
    nested loop (or range-bucket dance). Instead: union dimension
    starts and facts, one per-entity window pass, ``last_value(state,
    ignorenulls)`` carries the in-effect state onto every fact row —
    one hash shuffle total, O(n log n) in the partition, no join at
    all. Dim rows sort before facts at equal timestamps so a
    fact at exactly valid_from sees the NEW state, matching the
    oracle's half-open intervals.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("ts"),
            "event_id",
            F.lit(0).alias("_src"),
            F.col("event_type").alias("_state"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    facts = ev.filter(F.col("event_id") % 10 == 7).select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("_src"),
        F.lit(None).cast("string").alias("_state"),
        "value",
    )
    tagged = dim.unionByName(facts)
    # _src BEFORE event_id: ALL dim changes at time T must precede any
    # fact at T regardless of their event ids — the oracle's interval
    # predicate (valid_from <= ts) compares timestamps only, so a fact
    # whose event_id is lower than a same-instant change event still
    # sees the NEW state
    w2 = Window.partitionBy("user_id").orderBy("ts", "_src", "event_id")
    carried = tagged.withColumn(
        "state_at_event",
        F.last("_state", ignorenulls=True).over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return carried.filter(F.col("_src") == 1).select(
        "event_id",
        "user_id",
        "state_at_event",
        cents(F.col("value")).alias("value_cents"),
    )


@register(
    "q186_ordered_funnel",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    s1 AS (SELECT user_id, MIN(rn) AS r1 FROM o
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT o.user_id, MIN(rn) AS r2 FROM o JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND rn > r1 GROUP BY 1),
    s3 AS (SELECT o.user_id, MIN(rn) AS r3 FROM o JOIN s2 USING (user_id)
           WHERE event_type = 'signup' AND rn > r2 GROUP BY 1),
    s4 AS (SELECT o.user_id, MIN(rn) AS r4 FROM o JOIN s3 USING (user_id)
           WHERE event_type = 'purchase' AND rn > r3 GROUP BY 1)
    SELECT u.user_id,
           CAST(CASE WHEN r4 IS NOT NULL THEN 4
                     WHEN r3 IS NOT NULL THEN 3
                     WHEN r2 IS NOT NULL THEN 2
                     WHEN r1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS steps_completed,
           r4 IS NOT NULL AS converted
    FROM (SELECT DISTINCT user_id FROM o) u
    LEFT JOIN s1 ON s1.user_id = u.user_id
    LEFT JOIN s2 ON s2.user_id = u.user_id
    LEFT JOIN s3 ON s3.user_id = u.user_id
    LEFT JOIN s4 ON s4.user_id = u.user_id
    """,
)
def q186_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X113 — K-step STRICTLY-ORDERED funnel (view → click → signup →
    purchase, each step after the previous one) — the general form of
    q98's 2-step funnel. A greedy scan of each user's time-ordered
    events is equivalent to the nested first-match-after-previous-step
    definition, so the whole state machine is ONE ``aggregate`` fold
    over a per-user sorted event array: one shuffle, no K-way self-join
    (the oracle does the 4-chained-subquery form). Array size is one
    user's history — bounded per the same per-entity-cardinality
    argument as sessionization; for unbounded entities the K-pass
    conditional-min window form trades K plan passes for O(1) memory.
    """
    ev = load(spark, sf_dir, "events")
    arr = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("event_type").alias("y"),
                    )
                )
            ).alias("evs")
        )
    )
    steps = F.aggregate(
        F.col("evs"),
        F.lit(0),
        lambda acc, x: F.when((acc == 0) & (x["y"] == "view"), 1)
        .when((acc == 1) & (x["y"] == "click"), 2)
        .when((acc == 2) & (x["y"] == "signup"), 3)
        .when((acc == 3) & (x["y"] == "purchase"), 4)
        .otherwise(acc),
    )
    return arr.select(
        "user_id",
        steps.cast("long").alias("steps_completed"),
        (steps == 4).alias("converted"),
    )


# ---------------------------------------------------------------------------
# Distribution profiling, mode, ties, Benford audit, weighted sampling
# (X114-X118)
# ---------------------------------------------------------------------------


@register(
    "q187_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM b GROUP BY bucket
    """,
)
def q187_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114 — exact equi-depth (equi-height) histogram: 10 buckets of
    equal row count with their value boundaries — the histogram a
    cost-based optimizer actually wants (equi-WIDTH q89 starves on
    skewed data; equi-depth adapts bucket width to density).

    NTILE over a total order needs a global sort — acceptable here
    because the input is the |orders| rollup side, and the oracle pins
    the exact semantics. The at-scale variant for raw facts is
    approx_percentile boundaries (q63) + one hash-agg; this query is the
    exact reference for that sketch. Boundary values pass through
    un-summed, so doubles match bit-for-bit.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    b = orders.select(
        "o_totalprice", F.ntile(10).over(w).alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q188_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_events
    FROM r WHERE rk = 1
    """,
)
def q188_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115 — mode (most frequent value) per group with a deterministic
    tiebreak (higher count wins, then lexicographically smaller value).

    Two-level combinable aggregation: (user, type) counts, then ONE
    ``min_by`` over the ordering struct (-n, type) — negating the count
    turns "highest count, then smallest string" into a single ascending
    struct comparison, so the whole tiebreak is one map-side-combinable
    aggregate instead of the row_number window the oracle uses.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # min_by over (-n, event_type): highest count first, then smallest
    # type string — single combinable aggregate, no window
    key = F.struct((-F.col("n")).alias("negn"), F.col("event_type"))
    return c.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("mode_type"),
        F.min_by("n", key).cast("long").alias("n_events"),
    )


@register(
    "q189_topk_with_ties",
    oracle="""
    WITH s AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS spend_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT nationkey, o_custkey, spend_cents,
             RANK() OVER (PARTITION BY nationkey
                          ORDER BY spend_cents DESC) AS rk
      FROM s
    )
    SELECT nationkey, o_custkey AS custkey,
           CAST(spend_cents AS DOUBLE)/100.0 AS spend,
           CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def q189_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X116 — top-k WITH TIES per group (``RANK() <= k``, the FETCH
    FIRST k ROWS WITH TIES semantics): every customer tied at the k-th
    spend boundary is kept, unlike row_number top-k (q08/q120) which
    cuts ties arbitrarily — the difference matters whenever the ranking
    key is coarse (integer cents here can tie).

    The rank window rides the same nationkey shuffle as the rollup
    — and the rollup itself pre-shrinks the window input to
    |customers| rows.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    s = (
        orders.join(
            F.broadcast(
                cust.select("c_custkey", "c_nationkey")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("spend_cents"))
    )
    w = Window.partitionBy("nationkey").orderBy(F.col("spend_cents").desc())
    return (
        s.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "nationkey",
            F.col("o_custkey").alias("custkey"),
            (F.col("spend_cents").cast("double") / 100.0).alias("spend"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "q190_benford_audit",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the value-count total attached to the 9-row digit table",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n_values,
           ROUND(n / CAST((SELECT tot FROM t) AS DOUBLE), 6) AS observed_p,
           ROUND(ln(1.0 + 1.0/digit) / ln(10.0), 6) AS benford_p,
           ROUND(ABS(n / CAST((SELECT tot FROM t) AS DOUBLE)
                     - ln(1.0 + 1.0/digit) / ln(10.0)), 6) AS abs_dev
    FROM c
    """,
)
def q190_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X117 — Benford's-law first-digit audit: the distribution of
    leading significant digits vs log10(1+1/d) — the classic
    fabricated-data / broken-generator detector for financial columns
    (synthetic uniform generators fail it loudly, which is itself the
    signal here).

    First digit extracted from the DECIMAL(18,2) string form (exact —
    no float-format drift between engines); one 9-row aggregation after
    a row-local projection, total attached as a single-row broadcast.
    """
    orders = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("long")
    c = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("tot"))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    obs = F.col("n") / F.col("tot").cast("double")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("long").alias("n_values"),
        F.round(obs, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.abs(obs - benford), 6).alias("abs_dev"),
    )


@register(
    "q191_weighted_sample",
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             -ln((CAST(CAST(concat('0x', substr(md5(concat('es|', CAST(doc_id AS VARCHAR))), 1, 13))
                       AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
             / n_chars AS key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM k ORDER BY key, doc_id LIMIT 100
    """,
)
def q191_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X118 — deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ExpJ form): each row draws u from a seeded
    md5 hash of its id (uniform in (0,1), identical in any engine),
    gets key = -ln(u)/w, and the k smallest keys are the sample —
    inclusion probability proportional to weight (n_chars: longer
    documents sampled more, the token-budget-aware doc sampler).

    Fully distributed: the per-row key is a row-local projection and
    the k smallest are a TakeOrdered (per-partition heaps + driver
    merge of k·|partitions| rows) — no global sort, no RNG state, and
    re-running on any partitioning returns the identical sample.
    """
    from noaa_ais_glue_lakehouse_spark.functions.hashing import hash_uniform

    docs = load(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id").cast("string"), "es|")
    key = -F.log(u) / F.col("n_chars")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("long").alias("weight"),
                key.alias("_key"))
        .orderBy("_key", "doc_id")
        .limit(100)
        .drop("_key")
    )


# ---------------------------------------------------------------------------
# Incremental recompute planning, sequence completeness, cross-source dups
# (X119-X121)
# ---------------------------------------------------------------------------


@register(
    "q192_affected_partition_recompute",
    oracle="""
    WITH late AS (
      SELECT * FROM events WHERE event_id % 17 = 3
    ),
    affected AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM late
    )
    SELECT CAST(e.ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM events e JOIN affected a ON CAST(e.ts AS DATE) = a.day
    GROUP BY 1
    """,
)
def q192_affected_partition_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X119 — incremental-maintenance planning: given a late-arriving
    batch (here: events with id % 17 = 3 standing in for a CDC delta),
    derive the set of affected day-partitions and recompute the daily
    rollup for ONLY those partitions — the partition-pruned alternative
    to a full-table rebuild, and exactly the logic T5's monthly runner
    applies at file level.

    The affected-day set (|days| rows) broadcasts; on a date-partitioned
    table the semi-join collapses to partition pruning at the scan (the
    pin in test_readers.py::test_partition_pruning). Equal by
    construction to the full rollup restricted to those days, which is
    what the oracle states.
    """
    ev = load(spark, sf_dir, "events")
    late = ev.filter(F.col("event_id") % 17 == 3)
    affected = late.select(
        F.to_date("ts").alias("day")
    ).distinct()
    return (
        ev.join(F.broadcast(affected), F.to_date(F.col("ts")) == F.col("day"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )


@register(
    "q193_sequence_gap_audit",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             LEAD(event_id) OVER (PARTITION BY user_id
                                  ORDER BY event_id) AS next_id
      FROM events
    )
    SELECT user_id,
           event_id + 1 AS gap_start,
           next_id - 1 AS gap_end,
           CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
    FROM s
    WHERE next_id - event_id > 1
      AND next_id - event_id - 1 <= 50
    """,
)
def q193_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 — sequence-completeness audit: missing-id ranges within each
    entity's event-id stream (the CDC/replication "did we drop rows?"
    check). One lead window per entity emits each gap as a closed range
    [gap_start, gap_end]; ranges wider than 50 are excluded as expected
    inter-entity striding rather than loss (the threshold is the audit's
    sensitivity knob). One shuffle on the entity key.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        "event_id",
        F.lead("event_id").over(w).alias("next_id"),
    )
    width = F.col("next_id") - F.col("event_id")
    return s.filter((width > 1) & (width - 1 <= 50)).select(
        "user_id",
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (width - 1).cast("long").alias("n_missing"),
    )


@register(
    "q194_cross_source_dups",
    oracle="""
    WITH fp AS (
      SELECT DISTINCT
             md5(array_to_string(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '')[1:8], ' ')) AS f,
             source
      FROM documents
    ),
    g AS (
      SELECT f,
             CAST(COUNT(*) AS BIGINT) AS n_sources,
             list_sort(list(source)) AS sources
      FROM fp GROUP BY f
    )
    SELECT f AS fingerprint, n_sources,
           array_to_string(sources, ',') AS sources
    FROM g WHERE n_sources >= 2
    """,
)
def q194_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121 — cross-slice contamination audit: document-HEAD
    fingerprints (md5 of the first 8 tokens — the shared-boilerplate /
    template detector; whole-text md5 finds only byte-identical copies,
    which near-dup corpora rarely contain across slices) appearing in
    TWO OR MORE sources, with the sorted source list. This is the
    slice-level leakage check run before mixture weighting (q184) or
    split assignment (q138): if a benchmark slice shares text with a
    train slice, downweighting one of them doesn't deduplicate it.

    One distinct on (fingerprint, source) — map-side combinable — then
    a fingerprint-keyed rollup; the sorted-list column uses the q87
    deterministic array_agg shape, emitted as a joined string so the
    hash compare is collation-stable.
    """
    docs = load(spark, sf_dir, "documents")
    head = F.array_join(
        F.slice(tokenize(F.col("text")), 1, 8), " "
    )
    fp = docs.select(
        F.md5(head).alias("f"), "source"
    ).distinct()
    g = fp.groupBy("f").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.array_join(F.array_sort(F.collect_list("source")), ",").alias(
            "sources"
        ),
    )
    return g.filter(F.col("n_sources") >= 2).select(
        F.col("f").alias("fingerprint"), "n_sources", "sources"
    )


# ---------------------------------------------------------------------------
# Search, privacy release, diversity audit (X122-X124)
# ---------------------------------------------------------------------------


@register(
    "q195_conjunctive_search",
    oracle="""
    WITH post AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    q(qid, tok) AS (
      VALUES (1, 'batch'), (1, 'scan'),
             (2, 'data'), (2, 'join'),
             (3, 'hash'), (3, 'merge'), (3, 'filter')
    ),
    hits AS (
      SELECT q.qid, post.doc_id, COUNT(*) AS n_matched
      FROM q JOIN post ON post.tok = q.tok
      GROUP BY 1, 2
    ),
    need AS (SELECT qid, COUNT(*) AS n_terms FROM q GROUP BY 1)
    SELECT h.qid AS query_id, h.doc_id
    FROM hits h JOIN need n ON n.qid = h.qid AND h.n_matched = n.n_terms
    """,
)
def q195_conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122 — conjunctive (boolean-AND) search over the q160 inverted
    index: a document matches a query iff it contains EVERY query term.
    The standard distributed evaluation — postings equi-join on token,
    count matched terms per (query, doc), keep docs where the count
    equals the query's term count — never intersects posting lists
    pairwise and never touches documents that match no term. The query
    table broadcasts; the only corpus-sized work is the (doc, token)
    distinct that q160 already materializes at scale.
    """
    docs = load(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    q = spark.createDataFrame(
        [
            (1, "batch"), (1, "scan"),
            (2, "data"), (2, "join"),
            (3, "hash"), (3, "merge"), (3, "filter"),
        ],
        ["qid", "tok"],
    )
    hits = (
        post.join(F.broadcast(q), "tok")
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    need = q.groupBy("qid").agg(F.count(F.lit(1)).alias("n_terms"))
    return (
        hits.join(
            F.broadcast(need),
            (hits["qid"] == need["qid"]) & (F.col("n_matched") == F.col("n_terms")),
        )
        .select(hits["qid"].alias("query_id"), "doc_id")
    )


@register(
    "q196_dp_noisy_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT event_type, day, n,
             (CAST(CAST(concat('0x', substr(md5(concat('dp|', event_type, '|',
                    CAST(day AS VARCHAR))), 1, 13)) AS BIGINT) AS DOUBLE) + 0.5)
               / 4503599627370496.0 AS uu
      FROM c
    )
    SELECT event_type, day,
           ROUND(n + (CASE WHEN uu < 0.5 THEN 1.0 ELSE -1.0 END)
                     * ln(1.0 - 2.0*ABS(uu - 0.5)), 6) AS noisy_count
    FROM u
    """,
)
def q196_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123 — ε-differential-privacy histogram release (ε=1, Laplace
    mechanism): per-(type, day) counts plus Laplace(1/ε) noise drawn by
    inverse-CDF from a SEEDED hash-uniform — the release is reproducible
    across engines and re-runs (the determinism is for the correctness
    gate; a production release would swap the seed per publication).
    The true counts never leave the aggregation: noise is applied in the
    same projection that would be written out.

    Note sign convention: u<0.5 maps to +ln(1-2|u-0.5|)·(+1)... the
    inverse-CDF here is the symmetric form noise = -b·sgn(u-0.5)·
    ln(1-2|u-0.5|), b=1 — identical expression both engines.
    """
    from noaa_ais_glue_lakehouse_spark.functions.hashing import hash_uniform

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    u = hash_uniform(
        F.concat(F.col("event_type"), F.lit("|"), F.col("day").cast("string")),
        "dp|",
    )
    noise = (
        F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return c.select(
        "event_type",
        "day",
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    )


@register(
    "q197_l_diversity_audit",
    oracle="""
    WITH cls AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT n_chars // 100) AS BIGINT) AS l_distinct
      FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, class_size, l_distinct,
           l_distinct < 3 AS below_l3
    FROM cls
    """,
)
def q197_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124 — l-diversity audit, the companion to q151's k-anonymity:
    within each quasi-identifier class (lang, source), how many DISTINCT
    values of the sensitive attribute (length bucket standing in for a
    sensitive column) appear — a class can be k-anonymous yet leak
    everything if all its members share one sensitive value. Classes
    with fewer than l=3 distinct values are flagged for suppression or
    generalization. One aggregation; COUNT(DISTINCT) expands via Expand
    exactly as q157's profiler does.
    """
    docs = load(spark, sf_dir, "documents")
    sens = F.floor(F.col("n_chars") / 100)
    cls = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct(sens).cast("long").alias("l_distinct"),
    )
    return cls.select(
        "lang",
        "source",
        "class_size",
        "l_distinct",
        (F.col("l_distinct") < 3).alias("below_l3"),
    )


# ---------------------------------------------------------------------------
# Adoption, churn, stickiness (X125-X127)
# ---------------------------------------------------------------------------


@register(
    "q198_adoption_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
    ),
    daily AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def q198_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X125 — cumulative adoption curve: per day, how many users appear
    for the FIRST time, and the running total of users ever seen — the
    cumulative-DISTINCT metric, made combinable by reducing to each
    user's first-seen day (min per user, map-side partials) so the
    cumulative sum runs over the |days|-sized rollup, not the fact
    table. The unpartitioned window here is over ~30 rows by
    construction; at unbounded day counts it swaps for
    ``global_running_sum`` (q172) unchanged.
    """
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "q199_weekly_churn",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the max-observed-week gate attached to the |user-weeks| table",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    nxt AS (
      SELECT user_id, wk,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM uw
    ),
    mx AS (SELECT MAX(wk) AS max_wk FROM uw)
    SELECT strftime(wk, '%Y-%m-%d') AS week_start,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(*) FILTER (WHERE next_wk IS NULL
                                    OR next_wk > wk + INTERVAL 7 DAY)
                AS BIGINT) AS n_churned,
           ROUND(COUNT(*) FILTER (WHERE next_wk IS NULL
                                     OR next_wk > wk + INTERVAL 7 DAY)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
    FROM nxt, mx
    WHERE wk < max_wk
    GROUP BY 1
    """,
)
def q199_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126 — weekly churn: of the users active in week w, how many do
    NOT return in week w+1 (their next active week is later or never).
    The final observed week is excluded — churn there is not yet
    observable, and silently reporting it as 100% is the classic
    retention-dashboard bug. One shuffle: the distinct (user, week)
    reduction and the lead window share the user key; the max-week
    gate is a single-row broadcast.
    """
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    nxt = uw.withColumn("next_wk", F.lead("wk").over(w))
    mx = uw.agg(F.max("wk").alias("max_wk"))
    churned = F.col("next_wk").isNull() | (
        F.col("next_wk") > F.col("wk") + F.expr("INTERVAL 7 DAYS")
    )
    return (
        nxt.crossJoin(F.broadcast(mx))
        .filter(F.col("wk") < F.col("max_wk"))
        .groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(churned, 1).otherwise(0))
            .cast("long")
            .alias("n_churned"),
            F.round(
                F.sum(F.when(churned, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("churn_rate"),
        )
    )


@register(
    "q200_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
    contrib AS (
      SELECT user_id, day + CAST(x AS INTEGER) AS day
      FROM du, UNNEST(range(0, 7)) AS t(x)
    ),
    wau AS (
      SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
      FROM contrib c JOIN dau d ON d.day = c.day
      GROUP BY 1
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           ROUND(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def q200_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127 — DAU/WAU stickiness ratio per day: what fraction of the
    trailing week's actives showed up today. Composes q139's
    explode-based sliding DISTINCT (no range join) with the plain daily
    distinct; both reduce the fact table to (day, user) pairs first, so
    every stage after the first distinct is |pairs|-sized. Day spine =
    days that actually have actives (inner join), matching the oracle.
    """
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    wau = (
        contrib.join(F.broadcast(dau.select("day")), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(
                F.col("dau") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


@register("q201_audio_features")  # rows-only: per-sample PCM math is not SQL-expressible
def q201_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X128 — multimodal audio path: document bytes stand in for raw
    PCM16 payloads; per-frame RMS energy + zero-crossing rate extracted
    with the REAL numpy feature math (PCM needs no codec — this is the
    one multimodal decode that runs fully, not as a stub) inside
    Arrow-batched mapInPandas. Known-waveform values are pinned in
    tests/test_multimodal.py; the per-frame explode happens inside the
    Arrow batch and payloads never reach the driver.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = extract_audio_features(docs, "doc_id", "payload", frame_samples=64)
    return out.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
    )


# ---------------------------------------------------------------------------
# Statistical audits: KS drift, Gini, HHI (X129-X131)
# ---------------------------------------------------------------------------


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
    "q203_gini_coefficient",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
      FROM spend
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(cents) AS tot, SUM(i * cents) AS weighted
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(CAST(tot AS DOUBLE)/100.0 AS DOUBLE) AS total_spend,
           ROUND(2.0 * weighted / (n * CAST(tot AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM agg
    """,
)
def q203_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130 — Gini coefficient of customer spend (inequality /
    concentration of the revenue base): the exact rank formula
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over integer-cents totals, with
    an id tiebreak making ranks total (ties in x leave G unchanged —
    the formula is tie-invariant — but determinism wants a total
    order anyway).

    The global rank runs over the |customers| rollup, not raw orders;
    at an unbounded entity count the rank becomes the q172 two-phase
    scan. Everything before the final division is exact integers.
    """
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = spend.select(
        "cents", F.row_number().over(w).alias("i")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("cents").cast("double") / 100.0).alias("total_spend"),
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("cents"))
            / (F.count(F.lit(1)) * F.sum("cents").cast("double"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "q204_hhi_concentration",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT segment, SUM(cents) AS seg_total FROM seg GROUP BY 1)
    SELECT s.segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(POW(s.cents / CAST(t.seg_total AS DOUBLE), 2)) * 10000.0,
                 6) AS hhi
    FROM seg s JOIN tot t ON t.segment = s.segment
    GROUP BY s.segment
    """,
)
def q204_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X131 — Herfindahl–Hirschman concentration index per market
    segment (Σ share² × 10000, the antitrust scale): does one customer
    dominate a segment's revenue? The within-segment share denominator
    rides along as a window sum over the |segment × customer| rollup —
    no second join, one shuffle keyed on the segment after the rollup's
    customer-key shuffle.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    seg = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey")
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("cents"))
    )
    share = F.col("cents") / F.sum("cents").over(
        Window.partitionBy("segment")
    ).cast("double")
    return (
        seg.withColumn("share", share)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum(F.pow("share", 2)) * 10000.0, 6).alias("hhi"),
        )
    )


@register(
    "q205_custom_stream_source",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM events GROUP BY 1
    """,
)
def q205_custom_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132 — CUSTOM PYTHON STREAMING SOURCE under the correctness gate:
    the row-group connector's streaming face (offsets = row-group
    cursor, executor-side Arrow reads, rate-limited microbatches via
    rowGroupsPerBatch) drained into a complete-mode aggregation and
    hash-checked against the batch SQL over the native reader. This is
    the queue/CDC-log source contract end-to-end: durable offsets,
    deterministic replay between offsets, per-split executor reads.
    """
    import tempfile
    import uuid

    from noaa_ais_glue_lakehouse_spark.sources import pysource

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pysource.register(spark)
    # no rowGroupsPerBatch here: availableNow snapshots latestOffset
    # once, so rate limiting belongs to processing-time triggers (the
    # multi-batch path is pinned in test_pysource.py)
    stream = (
        spark.readStream.format("pyrowgroup")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
    )
    name = f"q205_css_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q205_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "q206_rfm_segmentation",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the global max-order- date anchor attached to the |customers| RFM rollup",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS monetary_cents
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS DOUBLE)/100.0 AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q206_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133 — RFM (recency / frequency / monetary) segmentation, the
    canonical customer-value grid: per-customer stats scored into
    quintiles (recency reversed — most RECENT gets the highest score),
    rolled up per (r, f, m) cell. Per-customer rollup is combinable on
    one shuffle; the three NTILEs run over the |customers| reduction
    with id tiebreaks making quintile boundaries total. The global-max
    anchor date is a single-row broadcast.
    """
    orders = load(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("_anchor")
    )
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents(F.col("o_totalprice"))).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("_anchor", "_last"))
    )
    r_w = Window.orderBy(F.col("recency_days").desc(), "o_custkey")
    f_w = Window.orderBy("frequency", "o_custkey")
    m_w = Window.orderBy("monetary_cents", "o_custkey")
    scored = rfm.select(
        "monetary_cents",
        F.ntile(5).over(r_w).alias("r_score"),
        F.ntile(5).over(f_w).alias("f_score"),
        F.ntile(5).over(m_w).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("monetary_cents").cast("double") / 100.0).alias(
            "segment_value"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-slice generalization and change detection (X134-X135)
# ---------------------------------------------------------------------------


@register(
    "q207_heldout_cross_entropy",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (grand, vocab) scalar attached to the |vocab x sources| token table",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
    ), g AS (
      SELECT tok, SUM(n) AS gn FROM c GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS grand,
             CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab
      FROM c
    ), st AS (
      SELECT source, SUM(n) AS sn FROM c GROUP BY 1
    )
    SELECT c.source,
           CAST(st.sn AS BIGINT) AS n_tokens,
           ROUND(-SUM((c.n / CAST(st.sn AS DOUBLE))
                      * ln((g.gn - c.n + 1.0)
                           / ((SELECT grand FROM tot) - st.sn
                              + (SELECT vocab FROM tot))))
                 / ln(2.0), 6) AS cross_entropy_bits
    FROM c
    JOIN g ON g.tok = c.tok
    JOIN st ON st.source = c.source
    GROUP BY c.source, st.sn
    """,
)
def q207_heldout_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134 — held-out cross-entropy per corpus slice: each source's
    unigram distribution scored under the add-one-smoothed model of the
    REST of the corpus (leave-one-slice-out). The data-valuation signal
    behind mixture design: a slice scoring near the corpus entropy is
    redundant with the rest; a high-scoring slice carries novel
    distribution mass (and a suspiciously LOW one is likely duplicated
    wholesale into other slices). Complements q178's symmetric JSD with
    the directional, model-based view.

    The complement model needs no second pass: per-token complement
    count = global − own, so one (source, token) rollup plus a
    token-keyed join to the |vocab| global table covers every slice's
    held-out model simultaneously. Exact integer counts everywhere;
    logs only at the end.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = c.groupBy("tok").agg(F.sum("n").alias("gn"))
    tot = c.agg(
        F.sum("n").alias("grand"),
        F.countDistinct("tok").cast("double").alias("vocab"),
    )
    st = F.sum("n").over(Window.partitionBy("source"))
    scored = (
        c.withColumn("sn", st)
        .join(g, "tok")
        .crossJoin(F.broadcast(tot))
    )
    p_own = F.col("n") / F.col("sn").cast("double")
    p_comp = (F.col("gn") - F.col("n") + 1.0) / (
        F.col("grand") - F.col("sn") + F.col("vocab")
    )
    return scored.groupBy("source").agg(
        F.max("sn").cast("long").alias("n_tokens"),
        F.round(
            -F.sum(p_own * F.log(p_comp)) / F.log(F.lit(2.0)), 6
        ).alias("cross_entropy_bits"),
    )


@register(
    "q208_cusum_changepoints",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the global-mean and peak scalars attached to the |days|-sized CUSUM table",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
             COUNT(*) AS n_days
      FROM d
    ),
    c AS (
      SELECT day, n,
             SUM(n - (SELECT mu FROM m)) OVER (ORDER BY day
                                               ROWS UNBOUNDED PRECEDING)
               AS cusum
      FROM d
    )
    SELECT day, CAST(n AS BIGINT) AS n_events,
           ROUND(cusum, 6) AS cusum,
           ABS(cusum) = (SELECT MAX(ABS(cusum)) FROM c) AS is_peak
    FROM c
    """,
)
def q208_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135 — CUSUM change-point signal: the running sum of deviations
    from the global mean daily volume, with the maximal-|CUSUM| day
    flagged — the classic single-change-point estimator (the peak of
    the CUSUM curve is where the level shift happened). Complements
    q158's EWMA (local anomaly) with the global-shift view.

    One |days|-sized rollup carries everything; the global mean is a
    single-row broadcast and the running sum is a window over ~30 rows
    (the q172 scan at unbounded day counts). Exact integer counts; the
    mean subtraction is the only float, identical in both engines.
    """
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = d.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.crossJoin(F.broadcast(m)).withColumn(
        "cusum", F.sum(F.col("n") - F.col("mu")).over(w)
    )
    peak = c.agg(F.max(F.abs("cusum")).alias("peak"))
    return c.crossJoin(F.broadcast(peak)).select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.round("cusum", 6).alias("cusum"),
        (F.abs("cusum") == F.col("peak")).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# Attribution and survival analysis (X136-X137)
# ---------------------------------------------------------------------------


@register(
    "q209_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts,
             CAST(ROUND(value*100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts FROM events
      WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.purchase_id, p.user_id, p.cents, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.ts, c.click_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.ts DESC, c.click_id DESC) AS rn_last
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND epoch_us(c.ts) >= epoch_us(p.ts) - 86400000000
    )
    SELECT purchase_id, user_id,
           CAST(MAX(cents) AS DOUBLE)/100.0 AS revenue,
           MAX(CASE WHEN rn_first = 1 THEN click_id END) AS first_click,
           MAX(CASE WHEN rn_last = 1 THEN click_id END) AS last_click
    FROM ranked GROUP BY purchase_id, user_id
    """,
)
def q209_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X136 — first-touch / last-touch revenue attribution: each
    purchase credited to the first and last click in its trailing 24 h
    window. The oracle states the range join; the Spark plan avoids it —
    purchases and clicks union into ONE per-user time-ordered stream,
    a last_value carry gives the most recent click at each purchase
    (last-touch), and a window min over the purchase's trailing range
    gives first-touch — all on a single user-key shuffle, O(n log n)
    per user instead of |purchases|x|clicks|.

    Purchases with no qualifying click are excluded (matching the
    oracle's inner join): unattributed revenue is a different report,
    not a NULL row here.
    """
    # NULL users are excluded up front: the oracle's equality join never
    # matches NULL = NULL, while a window PARTITION BY would group the
    # NULL users together and fabricate attributions for them
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        cents(F.col("value")).alias("cents_i"),
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("_src"),
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("long").alias("cents_i"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("_src"),
            F.lit(None).cast("long").alias("click_id"),
            "purchase_id",
            "cents_i",
        )
    )
    order = [F.col("ts"), F.col("_src"), F.coalesce("click_id", "purchase_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lim = 86400 * 1000000
    us = F.unix_micros("ts")
    # last-touch: most recent click at-or-before the purchase
    last_click = F.last(F.col("click_id"), ignorenulls=True).over(run)
    last_click_us = F.last(
        F.when(F.col("_src") == 0, us), ignorenulls=True
    ).over(run)
    # first-touch inside the 24h window: min (click_us, click_id) among
    # clicks in the trailing range — a RANGE frame over microseconds
    wr = (
        Window.partitionBy("user_id")
        .orderBy(us.cast("long"))
        .rangeBetween(-lim, 0)
    )
    first_struct = F.min(
        F.when(
            F.col("_src") == 0,
            F.struct(us.alias("u"), F.col("click_id").alias("i")),
        )
    ).over(wr)
    out = (
        tagged.withColumn("_last", last_click)
        .withColumn("_last_us", last_click_us)
        .withColumn("_first", first_struct)
        .filter(
            (F.col("_src") == 1)
            & F.col("_last").isNotNull()
            & (F.col("_last_us") >= us - lim)
        )
    )
    return out.select(
        "purchase_id",
        "user_id",
        (F.col("cents_i").cast("double") / 100.0).alias("revenue"),
        F.col("_first.i").alias("first_click"),
        F.col("_last").alias("last_click"),
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
    "q211_line_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    segs AS (
      SELECT doc_id, x AS seg_idx,
             array_to_string(l[(x*8+1):(x*8+8)], ' ') AS seg
      FROM toks, UNNEST(range(0, CAST(ceil(len(l)/8.0) AS BIGINT))) AS t(x)
      WHERE len(l) > 0
    ),
    df AS (
      SELECT seg, COUNT(DISTINCT doc_id) AS d FROM segs GROUP BY 1
    ),
    tagged AS (
      SELECT s.doc_id, s.seg_idx, s.seg, df.d FROM segs s JOIN df USING (seg)
    )
    SELECT t.doc_id,
           CAST(COUNT(s.seg_idx) AS BIGINT) AS n_segments,
           CAST(COUNT(CASE WHEN s.d <= 2 THEN 1 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN s.d <= 2 THEN s.seg END, ' '
                               ORDER BY s.seg_idx), '') AS cleaned_text
    FROM toks t LEFT JOIN tagged s ON s.doc_id = t.doc_id
    GROUP BY t.doc_id
    """,
)
def q211_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138 — C4-style line-level dedup over 8-token segments: any
    segment appearing in MORE than 2 documents is corpus boilerplate and
    is stripped from every document, survivors reassembled in order —
    the within-document complement to whole-document dedup (a doc can be
    globally unique yet 80% navigation chrome). The cleaned_text
    hash-compare pins the full reassembly, not just counts.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        drop_boilerplate_segments,
    )

    docs = load(spark, sf_dir, "documents")
    return drop_boilerplate_segments(
        docs, "doc_id", "text", seg_tokens=8, max_df=2
    )


@register(
    "q212_quantile_normalize",
    oracle="""
    WITH ex AS (
      SELECT vec_id, UNNEST(embedding) AS val,
             UNNEST(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    pr AS (
      SELECT vec_id, dim,
             PERCENT_RANK() OVER (PARTITION BY dim ORDER BY val) AS q
      FROM ex
    )
    SELECT vec_id,
           string_agg(CAST(CAST(ROUND(q, 6) AS DECIMAL(8,6)) AS VARCHAR),
                      ',' ORDER BY dim) AS normalized
    FROM pr GROUP BY vec_id
    """,
)
def q212_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139 — per-dimension quantile (rank) normalization of embeddings:
    each coordinate replaced by its percent rank within that dimension —
    the distribution-free rescaling that makes dimensions with wildly
    different scales comparable before distance-based work (q32/q47),
    immune to the outliers that break min-max scaling.

    Shape: one posexplode to (vec, dim, val) — |vecs|x|dims| rows — a
    percent_rank window per dimension (dims are the partition key, so
    all 64 rank passes are ONE shuffle), and an ordered re-aggregation.
    percent_rank gives ties equal ranks, so the output is total-order-
    free and deterministic; emitted as a fixed-point DECIMAL(8,6) CSV
    string (the q104 pattern) so the hash compare pins every coordinate
    — raw double-to-string would print small ranks as scientific
    notation in Spark ('2.0E-4') but decimal in DuckDB ('0.0002').
    """
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    )
    w = Window.partitionBy("dim").orderBy("val")
    pr = ex.withColumn("q", F.percent_rank().over(w))
    return (
        pr.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("dim").alias("d"),
                                F.round("q", 6)
                                .cast("decimal(8,6)")
                                .cast("string")
                                .alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                ",",
            ).alias("normalized")
        )
    )


@register(
    "q213_data_card",
    allow_non_equi="deliberate 1-row x 1-row cross joins: the vocab-size and top-lang scalars attached to the 1-row data-card aggregate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    flat AS (SELECT UNNEST(l) AS tok FROM toks),
    langs AS (
      SELECT lang, COUNT(*) AS n FROM toks GROUP BY 1
    ),
    top_lang AS (
      SELECT lang FROM langs ORDER BY n DESC, lang LIMIT 1
    ),
    dups AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(array_to_string(l, ' ')))
        AS n_dup_docs
      FROM toks
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(l)) AS BIGINT) AS total_tokens,
           CAST((SELECT COUNT(DISTINCT tok) FROM flat) AS BIGINT)
             AS vocab_size,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           (SELECT lang FROM top_lang) AS top_lang,
           CAST((SELECT n_dup_docs FROM dups) AS BIGINT) AS n_dup_docs,
           ROUND(CAST(SUM(len(l)) AS DOUBLE) / COUNT(*), 6)
             AS mean_doc_tokens,
           ROUND(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS short_doc_rate
    FROM toks
    """,
)
def q213_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140 — one-row corpus data card (the Datasheets-for-Datasets /
    data-card summary a curation run publishes next to its output):
    document and token volumes, vocabulary size, language spread with
    the dominant language, normalized-content duplicate count, mean
    document length and short-document rate.

    Everything reduces in two passes over the documents scan: one doc-
    grain aggregate (counts, sums, lang distinct, duplicate
    fingerprints) and one token-grain distinct for the vocabulary; the
    mode-of-language and scalar attachments are |langs|- and 1-row
    broadcasts. The duplicate count is over tokenized-normalized text
    (same canonicalization as q25's fingerprint), so byte-level noise
    doesn't hide duplicates.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        tokenize(F.col("text")).alias("l"),
    )
    vocab = (
        toks.select(F.explode("l").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    top_lang = (
        toks.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.min_by(
                "lang", F.struct((-F.col("n")).alias("negn"), F.col("lang"))
            ).alias("top_lang")
        )
    )
    base = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("l")).cast("long").alias("total_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.md5(F.array_join("l", " ")))
        )
        .cast("long")
        .alias("n_dup_docs"),
        F.round(
            F.sum(F.size("l")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_doc_tokens"),
        F.round(
            F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("short_doc_rate"),
    )
    return (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(top_lang))
        .select(
            "n_docs",
            "total_tokens",
            "vocab_size",
            "n_langs",
            "top_lang",
            "n_dup_docs",
            "mean_doc_tokens",
            "short_doc_rate",
        )
    )


@register(
    "q214_triangle_count",
    allow_non_equi="deliberate 1-row x 1-row cross join: the edge-count scalar attached to the 1-row triangle-count aggregate",
    oracle="""
    WITH pairs AS (
      SELECT doc_id_a AS a, doc_id_b AS b FROM (
        SELECT f.doc_id AS doc_id_a, g.doc_id AS doc_id_b
        FROM (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) f
        JOIN (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) g ON f.f = g.f AND f.doc_id < g.doc_id
      )
    ),
    deg AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.a ELSE p.b END AS lo,
             CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.b ELSE p.a END AS hi
      FROM pairs p
      JOIN deg da ON da.v = p.a
      JOIN deg db ON db.v = p.b
    ),
    wedges AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM oriented e1 JOIN oriented e2
        ON e1.lo = e2.lo AND e1.hi < e2.hi
    )
    SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w
    JOIN oriented e3
      ON (e3.lo = w.y AND e3.hi = w.z) OR (e3.lo = w.z AND e3.hi = w.y)
    """,
)
def q214_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141 — distributed triangle counting on the duplicate graph (the
    clustering-coefficient numerator: high triangle density means dup
    CLUSTERS, not chains — evidence the near-dup threshold is finding
    real families rather than transitive noise). Edges are the
    deterministic document-head fingerprint collisions (q194's
    fingerprint).

    The classic degree-oriented algorithm: orient each edge from its
    lower-(degree, id) endpoint, enumerate wedges by joining oriented
    edges on their source — each wedge's apex is responsible only for
    its O(sqrt(|E|))-bounded out-neighborhood, which is what kills the
    quadratic hub blowup a naive neighbor join has — then close wedges
    against the oriented edge set. Every step is a keyed equi-join.
    """
    # shared edge construction with the q235-q237 graph family (defined
    # below; resolved at call time)
    pairs = _dup_edges(spark, sf_dir)
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    key_a = F.struct(F.col("da").alias("d"), F.col("a").alias("v"))
    key_b = F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
    oriented = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            F.when(key_a < key_b, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(key_a < key_b, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    e1 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "lo").filter(F.col("y") < F.col("z"))
    # wedges enforce y < z by doc_id, so one id-normalized projection of
    # the edge set (|E| rows) closes them — unioning both orientations
    # would double the join's build volume for no semantic difference
    closing = oriented.select(
        F.least("lo", "hi").alias("y"), F.greatest("lo", "hi").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"])
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"), "n_triangles"
        )
    )


@register(
    "q215_zipf_slope",
    oracle="""
    WITH c AS (
      SELECT source, tok, COUNT(*) AS n FROM (
        SELECT source,
               UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                      x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, tok) AS rk
      FROM c
    ),
    pts AS (
      SELECT source, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
      FROM ranked WHERE rk <= 100
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS zipf_slope
    FROM pts GROUP BY source
    """,
)
def q215_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142 — Zipf-law fit per source: OLS slope of log-frequency on
    log-rank over each slice's top-100 tokens. Natural language sits
    near −1; machine-generated, template or keyword-stuffed slices
    deviate hard — a one-number distribution-shape screen that catches
    what per-document quality scores (q30/q106) miss at the slice
    level.

    The rank window runs over the |vocab x sources| rollup (same key as
    the counting shuffle); the regression is the exact closed-form
    moment ratio (q130's pattern) over ≤100 points per source. Slope
    only — the intercept is scale and adds nothing to the diagnostic.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "tok")
    pts = (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
        .select(
            "source",
            F.log(F.col("rk").cast("double")).alias("x"),
            F.log(F.col("n").cast("double")).alias("y"),
        )
    )
    cnt = F.count(F.lit(1))
    return pts.groupBy("source").agg(
        cnt.cast("long").alias("n_points"),
        F.round(
            (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Extension round 3 batch 2 (X143-X150): substring-level dedup, fuzzy
# linkage, ranked retrieval + eval, spatial KNN, model-eval statistics
# ---------------------------------------------------------------------------

_SPAN_N = 8  # tokens per repeated-span shingle (Lee et al. 2022 use 50;
# the synthetic docs average ~54 tokens, so 8 keeps spans sub-document)


@register(
    "q216_repeated_ngram_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             md5(array_to_string(ts[i:i+7], ' ')) AS g
      FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS u(i)
      WHERE len(ts) >= 8
    ),
    shared AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hit AS (SELECT doc_id, source, g FROM grams JOIN shared USING (g)),
    base AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(f.c, 0) AS BIGINT) AS n_docs_with_shared_span,
           CAST(COALESCE(sg.c, 0) AS BIGINT) AS n_shared_grams
    FROM base b
    LEFT JOIN (SELECT source, COUNT(DISTINCT doc_id) AS c FROM hit
               GROUP BY source) f USING (source)
    LEFT JOIN (SELECT source, COUNT(DISTINCT g) AS c FROM hit
               GROUP BY source) sg USING (source)
    """,
)
def q216_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143 — substring-level duplication audit (the Lee et al. 2022
    "Deduplicating Training Data" signal): positional 8-token shingles,
    flag every gram appearing in >= 2 distinct documents, report per
    source how many docs carry at least one cross-document repeated span
    and how many distinct shared grams touch the source. Complements
    q194 (document-HEAD fingerprints only) and q27/q211 (whole-doc /
    line-level): this catches verbatim spans at ANY offset.

    Plan shape: gram generation is a pure projection (sequence +
    transform + slice, all codegen — no shuffle, no Python); the only
    shuffles are the hash aggregation on the gram key and the semi-join
    back on the same key. At 100 TB you would swap md5 for xxhash64 to
    shrink the shuffle payload 4x; md5 is kept here because the DuckDB
    oracle must compute the identical key.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_span_grams,
    )

    docs = load(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    grams = repeated_span_grams(docs, "doc_id", "text", n=_SPAN_N)
    shared = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    # attach source AFTER the shared-gram semi-join: hit is the reduced
    # set, and the doc_id equi-join needs no broadcast assumption at scale
    hit = grams.join(shared, "g").join(src, "doc_id")
    f = hit.select("doc_id", "source").distinct().groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with_shared_span")
    )
    sg = hit.select("source", "g").distinct().groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_grams")
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        base.join(f, "source", "left")
        .join(sg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_docs_with_shared_span", F.lit(0)).alias(
                "n_docs_with_shared_span"
            ),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
    )


# Shared fuzzy-linkage candidate machinery for q217 (pair audit) and
# q250 (transitive entity clusters): block on the last name token, verify
# with Levenshtein <= 3. ONE definition per engine — tune the blocking
# key or threshold here and both queries (and both oracles) follow.
_FUZZY_PAIRS_CTE = """
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    blocked AS (
      SELECT name, string_split(name, ' ')[-1] AS block FROM names
    ),
    fuzzy AS (
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    )
"""


def _fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate fuzzy-match pairs over the DISTINCT part names:
    equi-join within last-token blocks, Levenshtein <= 3 verify.
    Returns (name_a, name_b, edit_dist) with name_a < name_b."""
    part = load(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    blocked = names.select(
        "name", F.element_at(F.split(F.col("name"), " "), -1).alias("block")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name"))
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 3)
    )


@register(
    "q217_fuzzy_blocked_linkage",
    oracle=_FUZZY_PAIRS_CTE
    + """
    SELECT name_a, name_b, edit_dist FROM fuzzy
    """,
)
def q217_fuzzy_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X144 — fuzzy record linkage: blocking + edit-distance verify, the
    classic entity-resolution pattern (Fellegi-Sunter style candidate
    generation). Block key = last name token; candidates are an
    equi-join WITHIN blocks only (never the O(n^2) cross product);
    verify = Levenshtein <= 3, JVM-side ``levenshtein`` expression.

    Runs on the DISTINCT name set — the dimension-sized side — so block
    sizes are bounded by name-space cardinality, not row count; at
    100 TB the distinct-project is the only full-data shuffle and the
    pair join stays dimension-sized. A skewed block (one very common
    token) would be salted; here blocks are the ~16 part nouns.
    """
    return _fuzzy_name_pairs(spark, sf_dir)


_BM25_TERMS = ("spark", "join", "window")

# Shared CTE: per-doc length + per-query-term term frequencies, then the
# corpus scalars (N, sum_dl, per-term df). Mirrored exactly by _bm25_base.
_BM25_SQL_BASE = """
    WITH base AS (
      SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS dl,
             CAST(len(list_filter(ts, x -> x = 'spark')) AS BIGINT) AS tf_spark,
             CAST(len(list_filter(ts, x -> x = 'join')) AS BIGINT) AS tf_join,
             CAST(len(list_filter(ts, x -> x = 'window')) AS BIGINT) AS tf_window
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents
      )
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) AS sum_dl,
             CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
             CAST(SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_join,
             CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_window
      FROM base
    ),
    scored AS (
      SELECT doc_id, tf_spark, tf_join, tf_window,
             CAST(ROUND(ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
                  * CAST(tf_spark AS DOUBLE) * 2.2
                  / (CAST(tf_spark AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))
                  * 1000000) AS BIGINT)
             + CAST(ROUND(ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
                  * CAST(tf_join AS DOUBLE) * 2.2
                  / (CAST(tf_join AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))
                  * 1000000) AS BIGINT)
             + CAST(ROUND(ln((n_docs - df_window + 0.5) / (df_window + 0.5) + 1.0)
                  * CAST(tf_window AS DOUBLE) * 2.2
                  / (CAST(tf_window AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))
                  * 1000000) AS BIGINT) AS score_micro
      FROM base, stats
    )
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) for the fixed query ``_BM25_TERMS``
    over ``documents`` — shared by q218 (retrieval) and q223 (NDCG eval).

    Everything is a per-row projection: tf via ``filter`` on the token
    array, dl via ``size`` — no explode, no per-term shuffle. The corpus
    scalars (N, Σdl, per-term df) are ONE scalar aggregate broadcast
    back with a 1-row cross join. Cross-engine determinism: each term's
    contribution is rounded to integer micros BEFORE the (order-free)
    integer sum, so float addition order can never flip a rank.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))

    # closure FACTORY, not a defaulted lambda: a 2-parameter lambda would be
    # interpreted by Spark's higher-order-function binder as (element, index)
    def _eq(term: str):
        return lambda t: t == F.lit(term)

    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(term)))
            .cast("long")
            .alias(f"tf_{term}")
            for term in _BM25_TERMS
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")

    def contrib(t: str) -> F.Column:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        c = (
            idf
            * tf
            * F.lit(2.2)
            / (
                tf
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / avgdl)
            )
        )
        return F.round(c * 1000000).cast("long")

    score = contrib("spark") + contrib("join") + contrib("window")
    return j.select(
        "doc_id",
        *[F.col(f"tf_{t}") for t in _BM25_TERMS],
        score.alias("score_micro"),
    )


@register(
    "q218_bm25_topk",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the corpus (N, \u03a3dl, per-term df) scalar attached to the per-doc BM25 projection",
    oracle=_BM25_SQL_BASE
    + """
    SELECT doc_id, score_micro,
           ROUND(score_micro / 1000000.0, 6) AS bm25
    FROM scored ORDER BY score_micro DESC, doc_id LIMIT 20
    """,
)
def q218_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145 — BM25 ranked retrieval, top-20 for a fixed 3-term query.
    orderBy+limit compiles to TakeOrderedAndProject (parallel partial
    top-k per partition, k-row merge on the driver — never a global
    sort). Tiebreak doc_id makes rank 20's cut deterministic.
    """
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "score_micro",
            F.round(F.col("score_micro") / 1000000.0, 6).alias("bm25"),
        )
    )


@register(
    "q223_ndcg_eval",
    allow_non_equi="same BM25 scalar cross join, plus the 1-row DCG x 1-row IDCG pairing",
    oracle=_BM25_SQL_BASE
    + """
    , rel AS (
      SELECT doc_id, score_micro,
             CAST((CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rel
      FROM scored
    ),
    sys AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rk
      FROM rel
    ),
    ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rk
      FROM rel
    ),
    dcg AS (
      SELECT SUM(CAST(ROUND(1000000.0 * rel / log2(CAST(rk + 1 AS DOUBLE))
                 ) AS BIGINT)) AS dcg_micro
      FROM sys WHERE rk <= 10
    ),
    idcg AS (
      SELECT SUM(CAST(ROUND(1000000.0 * rel / log2(CAST(rk + 1 AS DOUBLE))
                 ) AS BIGINT)) AS idcg_micro
      FROM ideal WHERE rk <= 10
    )
    SELECT CAST(dcg_micro AS BIGINT) AS dcg_micro,
           CAST(idcg_micro AS BIGINT) AS idcg_micro,
           ROUND(CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE), 6)
             AS ndcg
    FROM dcg, idcg
    """,
)
def q223_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X150 — NDCG@10 of the BM25 ranking (q218) against graded
    relevance = number of distinct query terms present (0-3). The two
    top-10s (system by score, ideal by relevance) come from
    orderBy+limit (TakeOrdered, parallel); the rank index is then a
    window over the 10 SURVIVING rows — a bounded-by-k single partition,
    not a global sort. Per-rank DCG terms are rounded to integer micros
    before summation so the result is addition-order-free and
    hash-matches the oracle exactly.
    """
    rel = _bm25_scored(spark, sf_dir).select(
        "doc_id",
        "score_micro",
        (
            (F.col("tf_spark") > 0).cast("long")
            + (F.col("tf_join") > 0).cast("long")
            + (F.col("tf_window") > 0).cast("long")
        ).alias("rel"),
    )

    def dcg10(df: DataFrame, order_cols, out: str) -> DataFrame:
        top = df.orderBy(*order_cols).limit(10)
        # window over <=10 rows (post-limit): bounded by k, by design
        w = Window.orderBy(*order_cols)
        return (
            top.withColumn("rk", F.row_number().over(w))
            .select(
                F.round(
                    F.lit(1000000.0)
                    * F.col("rel")
                    / F.log2((F.col("rk") + 1).cast("double"))
                )
                .cast("long")
                .alias("term")
            )
            .agg(F.sum("term").cast("long").alias(out))
        )

    sys_dcg = dcg10(rel, [F.col("score_micro").desc(), F.col("doc_id")], "dcg_micro")
    ideal_dcg = dcg10(rel, [F.col("rel").desc(), F.col("doc_id")], "idcg_micro")
    return (
        sys_dcg.crossJoin(F.broadcast(ideal_dcg))
        .select(
            "dcg_micro",
            "idcg_micro",
            F.round(
                F.col("dcg_micro").cast("double")
                / F.col("idcg_micro").cast("double"),
                6,
            ).alias("ndcg"),
        )
    )


_KNN_R = 6.0  # degrees; also the grid cell size, which makes 3x3 exact
_KNN_K = 3


@register(
    "q219_grid_knn_join",
    oracle="""
    WITH pts AS (
      SELECT event_id, event_type,
             CAST(event_id % 1800 AS DOUBLE)/10.0 - 90.0 AS lat,
             CAST((event_id * 7) % 3600 AS DOUBLE)/10.0 - 180.0 AS lon
      FROM events
    ),
    refs AS (
      SELECT event_id AS ref_id, lat AS rlat, lon AS rlon
      FROM pts WHERE event_id % 97 = 0
    ),
    qs AS (SELECT event_id, lat, lon FROM pts WHERE event_type = 'click'),
    cand AS (
      SELECT q.event_id, r.ref_id,
             (q.lat - r.rlat)*(q.lat - r.rlat)
             + (q.lon - r.rlon)*(q.lon - r.rlon) AS dist2
      FROM qs q, refs r
      WHERE (q.lat - r.rlat)*(q.lat - r.rlat)
            + (q.lon - r.rlon)*(q.lon - r.rlon) <= 36.0
    ),
    ranked AS (
      SELECT event_id, ref_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY dist2, ref_id) AS knn_rank
      FROM cand
    )
    SELECT event_id, CAST(knn_rank AS BIGINT) AS knn_rank, ref_id,
           ROUND(sqrt(dist2), 6) AS dist_deg
    FROM ranked WHERE knn_rank <= 3
    """,
)
def q219_grid_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X146 — radius-bounded exact K-nearest-neighbor join via grid
    neighborhoods: for every 'click' event-point, its 3 nearest landmark
    points within R=6 degrees (Euclidean in degree space). The oracle
    is the BRUTE-FORCE cross join — this query's grid pruning must
    reproduce it exactly, which it does because cell size == R: any
    point within Euclidean R of q lies within one cell of q's cell on
    each axis, so the 3x3 neighborhood is a complete candidate set.

    Plan shape: the landmark side is exploded x9 into (cell_y, cell_x)
    neighbor keys and BROADCAST; candidates come from an equi-join on
    the cell key — no cross product anywhere on the big side; the final
    top-k is a window partitioned by the query point (bounded fan-in:
    one 3x3 neighborhood of landmarks). NOTE the broadcast precondition:
    the 1% modulus sample here stands in for a genuinely dimension-sized
    landmark table (ports, geofences); a corpus-FRACTION landmark set
    grows with the fact table and would blow the broadcast at 100 TB —
    at scale pass a bounded landmark dim, or swap grid_knn_join's
    broadcast for a shuffle equi-join on the cell key (same exactness
    argument, one extra exchange).
    """
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        grid_knn_join,
    )

    ev = load(spark, sf_dir, "events")
    pts = _with_coords(ev.filter(F.col("event_type") == "click"))
    refs = _with_coords(ev).filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("ref_id"),
        F.col("lat").alias("rlat"),
        F.col("lon").alias("rlon"),
    )
    return grid_knn_join(pts, refs, k=_KNN_K, radius=_KNN_R)


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
    "q221_lagged_cross_correlation",
    allow_non_equi="deliberate 7-row broadcast literal cross join: the lag spine attached to the |days|-sized daily rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM events GROUP BY 1
    ),
    lags AS (SELECT UNNEST(generate_series(-3, 3)) AS lag),
    j AS (
      SELECT l.lag, da.a, db.b
      FROM daily da
      CROSS JOIN lags l
      JOIN daily db ON db.d = da.d + CAST(l.lag AS INTEGER)
    ),
    m AS (
      SELECT lag, COUNT(*) AS n,
             SUM(a) AS sx, SUM(b) AS sy,
             SUM(a*a) AS sxx, SUM(b*b) AS syy, SUM(a*b) AS sxy
      FROM j GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                        * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS xcorr
    FROM m
    """,
)
def q221_lagged_cross_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X148 — lagged cross-correlation between two daily series (clicks
    leading purchases): Pearson r of (clicks on day t, purchases on day
    t+lag) for lag in -3..+3. The lead/lag diagnostic that q162's lag-1
    AUTOcorrelation can't answer — does one series predict the other,
    and at what offset?

    Plan shape: ONE pass builds both daily series as conditional sums
    (|days| rows); the 7 lags are a broadcast literal cross join on the
    day-level rollup, re-joined to itself on the shifted date — all
    joins are day-keyed equi-joins on dimension-sized data after the
    single big aggregation. Moments are exact integers; only the final
    normalization touches floats, mirrored operation-for-operation in
    the oracle.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("z"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    return _lagged_pearson(
        daily.select("d", "x"),
        daily.select(F.col("d").alias("d2"), "z"),
        lags,
        n_alias="n_days",
        r_alias="xcorr",
    )


def _lagged_pearson(
    left: DataFrame,
    right: DataFrame,
    lags: DataFrame,
    n_alias: str = "n_pairs",
    r_alias: str = "r",
) -> DataFrame:
    """Per-lag exact-integer Pearson correlation between two daily
    series: ``left(d, x)`` joined to ``right(d2, z)`` on the lag-shifted
    date for every lag in the (broadcast, literal) ``lags`` spine —
    shared by q221 (cross-correlation of two series) and q257 (ACF of
    one series). Moments are exact integers; the closed-form r is the
    one float expression, mirrored by both oracles.
    """
    j = left.crossJoin(F.broadcast(lags)).join(
        right, F.date_add(F.col("d"), F.col("lag")) == F.col("d2")
    )
    n = F.count(F.lit(1))
    sx, sz = F.sum("x"), F.sum("z")
    sxx = F.sum(F.col("x") * F.col("x"))
    szz = F.sum(F.col("z") * F.col("z"))
    sxz = F.sum(F.col("x") * F.col("z"))
    return j.groupBy("lag").agg(
        n.cast("long").alias(n_alias),
        F.round(
            (n * sxz - sx * sz).cast("double")
            / F.sqrt(
                (n * sxx - sx * sx).cast("double")
                * (n * szz - sz * sz).cast("double")
            ),
            6,
        ).alias(r_alias),
    )


@register(
    "q222_maxsim_late_interaction",
    allow_non_equi="deliberate 3-row broadcast cross join: the multi-vector query side of MaxSim attached to the corpus scan (bounded by query size)",
    oracle="""
    WITH m AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM m WHERE vec_id < 3),
    dots AS (
      SELECT d.label, d.vec_id, q.qid,
             list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> q.qv[i] * d.v[i])) AS dot
      FROM m d, q
    ),
    mx AS (
      SELECT label, qid, MAX(dot) AS best FROM dots GROUP BY label, qid
    )
    SELECT label,
           CAST(SUM(best) AS BIGINT) AS maxsim_milli2,
           ROUND(CAST(SUM(best) AS DOUBLE) / 1000000.0, 6) AS maxsim
    FROM mx GROUP BY label
    """,
)
def q222_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X149 — ColBERT-style late-interaction retrieval (MaxSim): score a
    candidate GROUP of vectors against a multi-vector query by, for each
    query vector, taking the max dot product over the group's vectors,
    then summing over query vectors. Groups = embedding labels (each
    label's vectors play the role of one document's token embeddings);
    query = vectors 0-2.

    Plan shape: the query side is 3 rows — broadcast; the corpus side is
    scanned once; dot products are an integer ``zip_with`` +
    ``aggregate`` fold in milli units (exact, order-free); the two
    reductions (max per label x query-vec, sum per label) share the
    label shuffle key so the second agg is map-side-combinable on the
    first's output. No pairwise corpus x corpus work anywhere. At
    100 TB with a real query batch you shard queries into the broadcast
    in batches; the corpus-side cost stays one scan per batch.
    """
    emb = load(spark, sf_dir, "embeddings")
    milli = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("long"),
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), milli.alias("qv")
    )
    corpus = emb.select("label", "vec_id", milli.alias("dv"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("dv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dots = corpus.crossJoin(F.broadcast(qs)).select(
        "label", "qid", dot.alias("dot")
    )
    mx = dots.groupBy("label", "qid").agg(F.max("dot").alias("best"))
    return mx.groupBy("label").agg(
        F.sum("best").cast("long").alias("maxsim_milli2"),
        F.round(F.sum("best").cast("double") / 1000000.0, 6).alias("maxsim"),
    )


@register(
    "q225_sorted_neighborhood_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    r AS (SELECT name, ROW_NUMBER() OVER (ORDER BY name) AS idx FROM names)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(b.idx - a.idx AS BIGINT) AS idx_gap,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
    FROM r a JOIN r b ON b.idx > a.idx AND b.idx - a.idx < 3
    WHERE levenshtein(a.name, b.name) <= 4
    """,
)
def q225_sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X152 — sorted-neighborhood record linkage (Hernandez-Stolfo): sort
    keys, compare each record only with its w-1 successors in sort order,
    verify with Levenshtein. The OTHER classic candidate generator next
    to q217's blocking — catches near-matches that straddle block
    boundaries (e.g. a typo in the blocking token itself would defeat
    q217; sort order keeps the pair adjacent).

    Scale shape: the global sort POSITION comes from the two-phase
    parallel prefix scan (global_running_sum of 1 — range partition +
    local window + offset broadcast), never a single-partition
    ROW_NUMBER; neighborhood candidates are an equi-join on
    floor(idx/w) bucket keys (each row probes its own and the next
    bucket — any pair with idx gap < w differs by at most one bucket),
    so the candidate volume is |rows| x w with no sort-order self-join.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    w = 3
    names = (
        load(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    idx = global_running_sum(
        names.withColumn("_one", F.lit(1)), ["name"], "_one", out_col="idx"
    ).drop("_one")
    b = idx.withColumn("bkt", F.floor((F.col("idx") - 1) / w))
    probe = b.select(
        F.col("name").alias("name_a"),
        F.col("idx").alias("ia"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("jb"),
    )
    build = b.select(
        F.col("name").alias("name_b"),
        F.col("idx").alias("ib"),
        F.col("bkt").alias("jb"),
    )
    return (
        probe.join(build, "jb")
        .filter(
            (F.col("ib") > F.col("ia")) & (F.col("ib") - F.col("ia") < w)
        )
        .select(
            "name_a",
            "name_b",
            (F.col("ib") - F.col("ia")).cast("long").alias("idx_gap"),
            F.levenshtein(F.col("name_a"), F.col("name_b"))
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
    )


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
    "q227_reciprocal_rank_fusion",
    allow_non_equi="inherits the BM25 single-row stats cross join via _bm25_scored",
    oracle=_BM25_SQL_BASE
    + """
    , r1 AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rk1
      FROM scored
    ),
    r2 AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk2
      FROM documents
    ),
    fused AS (
      SELECT r1.doc_id,
             CAST(ROUND(1000000.0 / (60.0 + rk1)) AS BIGINT)
             + CAST(ROUND(1000000.0 / (60.0 + rk2)) AS BIGINT) AS rrf_micro
      FROM r1 JOIN r2 ON r1.doc_id = r2.doc_id
    )
    SELECT doc_id, rrf_micro,
           ROUND(rrf_micro / 1000000.0, 6) AS rrf
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
)
def q227_reciprocal_rank_fusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X154 — hybrid-search rank fusion: RRF(d) = sum over rankers of
    1/(60 + rank_r(d)), here fusing the BM25 ranking (q218) with a
    document-length prior ranking. The standard way to combine lexical
    and secondary signals without score calibration.

    Scale shape: each GLOBAL ranking is a two-phase parallel prefix scan
    (running count of 1 over the ranking's total order — range
    partition + local window + broadcast offsets), NEVER a
    single-partition ROW_NUMBER over the corpus; the fusion is a
    doc_id equi-join; per-ranker RRF terms are rounded to integer
    micros before the order-free sum; final top-20 is TakeOrdered.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    scored = _bm25_scored(spark, sf_dir).select(
        "doc_id", (-F.col("score_micro")).alias("neg_score")
    )
    r1 = global_running_sum(
        scored.withColumn("_one", F.lit(1)),
        ["neg_score", "doc_id"],
        "_one",
        out_col="rk1",
    ).select("doc_id", "rk1")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (-F.col("n_chars")).alias("neg_len")
    )
    r2 = global_running_sum(
        docs.withColumn("_one", F.lit(1)),
        ["neg_len", "doc_id"],
        "_one",
        out_col="rk2",
    ).select("doc_id", "rk2")
    term = lambda rk: F.round(F.lit(1000000.0) / (F.lit(60.0) + F.col(rk))).cast(  # noqa: E731
        "long"
    )
    fused = r1.join(r2, "doc_id").select(
        "doc_id", (term("rk1") + term("rk2")).alias("rrf_micro")
    )
    return (
        fused.orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "rrf_micro",
            F.round(F.col("rrf_micro") / 1000000.0, 6).alias("rrf"),
        )
    )


def _bpe_round_sql(i: int) -> str:
    """One BPE round of the oracle: pair counts over the current symbol
    strings, deterministic argmax, 4-pass non-overlapping merge."""
    prev = f"r{i}"
    merged = "s"
    for _ in range(4):
        merged = (
            f"replace({merged}, ' '||m{i}.a||' '||m{i}.b||' ', "
            f"' '||m{i}.a||m{i}.b||' ')"
        )
    return f"""
    p{i} AS (
      SELECT t[j] AS a, t[j+1] AS b, SUM(c) AS cnt
      FROM (SELECT c, list_filter(string_split(trim(s), ' '),
                                  x -> x <> '') AS t FROM {prev}),
           UNNEST(generate_series(1, len(t) - 1)) AS u(j)
      WHERE len(t) >= 2
      GROUP BY 1, 2
    ),
    m{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
    r{i + 1} AS (SELECT w, c, {merged} AS s FROM {prev}, m{i})
    """


@register(
    "q224_bpe_merges",
    build_time_exec="each BPE round's argmax pair is a 1-row collect at plan build",
    oracle="""
    WITH wf AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)),
                     '\\s+'), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    r1 AS (
      SELECT w, c,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM wf
    ),
    """
    + _bpe_round_sql(1)
    + ","
    + _bpe_round_sql(2)
    + ","
    + _bpe_round_sql(3)
    + """
    SELECT CAST(1 AS INTEGER) AS merge_rank, a AS sym_a, b AS sym_b,
           CAST(cnt AS BIGINT) AS pair_count FROM m1
    UNION ALL
    SELECT CAST(2 AS INTEGER), a, b, CAST(cnt AS BIGINT) FROM m2
    UNION ALL
    SELECT CAST(3 AS INTEGER), a, b, CAST(cnt AS BIGINT) FROM m3
    """,
)
def q224_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151 — BPE tokenizer training, first 3 merge rounds: the
    byte-pair-encoding vocabulary-induction loop every modern tokenizer
    starts from. Each round counts adjacent symbol pairs weighted by
    word frequency, picks the most frequent pair (tiebreak: count desc,
    then pair lexicographic), and fuses it everywhere.

    Scale shape: BPE statistics live on the WORD-FREQUENCY table, not
    the corpus — the one corpus-sized shuffle is the initial word count;
    every round after that runs on the vocabulary (dimension-sized, here
    ~40 rows, in practice ~10^6 — still thousands of times smaller than
    the corpus). The per-round argmax is a 1-row collect by design
    (bounded driver work, like q55's k-means sample); the merge itself
    is 4 fixed non-overlapping ``replace`` passes over the padded
    symbol string — enough to reach the greedy-BPE fixpoint for any
    realistic word, and mirrored pass-for-pass in the oracle so both
    engines compute the identical (if pathological-repeat-inexact)
    semantics.
    """
    docs = load(spark, sf_dir, "documents")
    from noaa_ais_glue_lakehouse_spark.operators.tokenizer import bpe_merges

    wf = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bpe_merges caches wf for its per-round collects and unpersists it
    # before returning — no storage leak across the session
    return bpe_merges(spark, wf, rounds=3, replace_passes=4)


@register(
    "q228_seasonal_decomposition",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the grand-mean scalar attached to the |days|-sized decomposition table",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    ),
    t AS (
      SELECT d, n, (isodow(d) - 1) AS wd,
             SUM(n) OVER w7 AS s7, COUNT(*) OVER w7 AS c7
      FROM daily
      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    w AS (
      SELECT (isodow(d) - 1) AS wd, SUM(n) AS swd, COUNT(*) AS cwd
      FROM daily GROUP BY 1
    ),
    g AS (SELECT SUM(n) AS tot, COUNT(*) AS nd FROM daily)
    SELECT t.d, CAST(t.n AS BIGINT) AS n,
           ROUND(s7 / 7.0, 6) AS trend,
           ROUND(CAST(swd AS DOUBLE) / cwd - CAST(tot AS DOUBLE) / nd, 6)
             AS seasonal,
           ROUND(t.n - s7 / 7.0
                 - (CAST(swd AS DOUBLE) / cwd - CAST(tot AS DOUBLE) / nd), 6)
             AS resid
    FROM t JOIN w ON w.wd = t.wd, g
    WHERE c7 = 7
    """,
)
def q228_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X155 — naive additive seasonal decomposition of the daily volume
    series: trend = 7-day centered moving average (complete windows
    only), seasonal = weekday mean minus grand mean, resid = n - trend
    - seasonal. The classic first look at any daily operational series
    — "is Monday really down, or is the whole week trending down?".

    Plan shape: ONE corpus-sized shuffle (the daily rollup); everything
    after runs on the |days| table — the centered-MA window is a
    single-partition window over the day-level rollup BY DESIGN (like
    q208's CUSUM: the post-aggregation series is driver-sized), the
    weekday means join on a 7-row key, and the grand mean is a 1-row
    broadcast cross join. Means are exact-integer sums over counts; the
    only float ops are the mirrored final divisions.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "n",
        F.expr("weekday(d)").alias("wd"),
        F.sum("n").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    wdm = daily.groupBy(F.expr("weekday(d)").alias("wd")).agg(
        F.sum("n").alias("swd"), F.count(F.lit(1)).alias("cwd")
    )
    g = daily.agg(F.sum("n").alias("tot"), F.count(F.lit(1)).alias("nd"))
    seasonal = (
        F.col("swd").cast("double") / F.col("cwd")
        - F.col("tot").cast("double") / F.col("nd")
    )
    trend = F.col("s7") / F.lit(7.0)
    return (
        t.join(F.broadcast(wdm), "wd")
        .crossJoin(F.broadcast(g))
        .filter(F.col("c7") == 7)
        .select(
            "d",
            F.col("n").cast("long").alias("n"),
            F.round(trend, 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(F.col("n") - trend - seasonal, 6).alias("resid"),
        )
    )


@register(
    "q229_calibration_bins",
    oracle="""
    WITH s AS (
      SELECT CAST(LEAST(FLOOR(value / 50.0), 9) AS INTEGER) AS bin,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 50000.0, 6)
             AS mean_score,
           ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           ROUND(abs(CAST(SUM(pos) AS DOUBLE) / COUNT(*)
                     - CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 50000.0), 6)
             AS gap
    FROM s GROUP BY bin
    """,
)
def q229_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156 — calibration / reliability diagram: treat value/500 as a
    predicted purchase probability, bin into deciles, and compare each
    bin's mean prediction against its observed purchase rate; ``gap``
    is the per-bin |confidence - accuracy| whose n-weighted sum is the
    Expected Calibration Error. The standard diagnostic before trusting
    any model-score column as a probability.

    Plan shape: one hash aggregation on the 10-key bin column (fully
    map-side combinable); mean scores go through exact integer cents so
    the only floats are the mirrored final divisions.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9))
        .cast("int")
        .alias("bin"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    n = F.count(F.lit(1))
    mean_score = F.sum("cents").cast("double") / n / F.lit(50000.0)
    frac = F.sum("pos").cast("double") / n
    return s.groupBy("bin").agg(
        n.cast("long").alias("n"),
        F.round(mean_score, 6).alias("mean_score"),
        F.round(frac, 6).alias("frac_pos"),
        F.round(F.abs(frac - mean_score), 6).alias("gap"),
    )


@register("q230_spectral_features")  # rows-only: FFT floats are
# library/platform-specific; known-waveform values pinned in pytest
def q230_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157 — multimodal frequency-domain path: per-frame spectral
    centroid + octave-band energy split over PCM16 payloads (document
    bytes stand in, as in q201), REAL numpy.fft math inside
    Arrow-batched mapInPandas. Complements q201's time-domain RMS/ZCR;
    together they are the standard pre-codec audio quality screen.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        extract_spectral_features,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = extract_spectral_features(docs, "doc_id", "payload", frame_samples=64)
    return out.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        F.round("centroid", 6).alias("centroid"),
        F.round("band_0", 6).alias("band_0"),
        F.round("band_1", 6).alias("band_1"),
        F.round("band_2", 6).alias("band_2"),
        F.round("band_3", 6).alias("band_3"),
    )


@register(
    "q231_embedding_covariance",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the corpus row count attached to the 2080-row covariance triangle",
    oracle="""
    WITH m AS (
      SELECT list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    marg AS (
      SELECT i, SUM(v[i]) AS s
      FROM m, UNNEST(generate_series(1, len(v))) AS u(i)
      GROUP BY i
    ),
    pairs AS (
      SELECT i, j, SUM(vi * vj) AS sij FROM (
        SELECT u.i AS i, w.j AS j, v[u.i] AS vi, v[w.j] AS vj
        FROM m,
             UNNEST(generate_series(1, len(v))) AS u(i),
             UNNEST(generate_series(1, len(v))) AS w(j)
        WHERE w.j >= u.i
      ) GROUP BY i, j
    ),
    g AS (SELECT COUNT(*) AS n FROM m)
    SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
           CAST(n * sij - ma.s * mb.s AS BIGINT) AS cov_num,
           ROUND(CAST(n * sij - ma.s * mb.s AS DOUBLE)
                 / (n * (n - 1.0)) / 1000000.0, 6) AS cov
    FROM pairs p
    JOIN marg ma ON ma.i = p.i
    JOIN marg mb ON mb.i = p.j, g
    """,
)
def q231_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158 — distributed covariance matrix of the embedding columns
    (upper triangle, sample covariance): the input to PCA/whitening and
    the redundancy screen for learned representations. cov_ij =
    (n*S_ij - S_i*S_j) / (n*(n-1)) over integer-milli components, so
    every term before the mirrored final division is an exact integer.

    Plan shape: the CORRECT 100 TB decomposition — the data is huge but
    the matrix is tiny (64x64), so each row emits its d(d+1)/2 = 2080
    upper-triangle products and ONE hash aggregation reduces them; the
    marginal sums ride a 64-key aggregation and join back broadcast.
    No driver-side matrix math, no per-row Python. (At bigger n than
    ~10^9 the milli-int products approach int64 range — swap to DECIMAL
    sums or per-partition float Welford then.)
    """
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("long"),
    )
    rows = emb.select(v.alias("v"))
    d = F.size(F.col("v"))
    idx = F.sequence(F.lit(1), d)
    marg = (
        rows.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("i"), F.element_at(F.col("v"), i).alias("x")
                    ),
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"))
        .agg(F.sum("e.x").alias("s"))
    )
    pairs = (
        rows.select(
            F.explode(
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            F.sequence(i, d),
                            lambda j: F.struct(
                                i.alias("i"),
                                j.alias("j"),
                                (
                                    F.element_at(F.col("v"), i)
                                    * F.element_at(F.col("v"), j)
                                ).alias("p"),
                            ),
                        ),
                    )
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.sum("e.p").alias("sij"))
    )
    g = rows.agg(F.count(F.lit(1)).alias("n"))
    ma = marg.select(F.col("i"), F.col("s").alias("sa"))
    mb = marg.select(F.col("i").alias("j"), F.col("s").alias("sb"))
    num = F.col("n") * F.col("sij") - F.col("sa") * F.col("sb")
    return (
        pairs.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(g))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            num.cast("long").alias("cov_num"),
            F.round(
                num.cast("double")
                / (F.col("n") * (F.col("n") - F.lit(1.0)))
                / F.lit(1000000.0),
                6,
            ).alias("cov"),
        )
    )


@register(
    "q232_prf_expansion",
    allow_non_equi="inherits the BM25 single-row stats cross join via _bm25_scored",
    oracle=_BM25_SQL_BASE
    + """
    , top10 AS (
      SELECT doc_id FROM scored ORDER BY score_micro DESC, doc_id LIMIT 10
    ),
    toks AS (
      SELECT d.doc_id,
             list_filter(string_split_regex(lower(trim(d.text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents d JOIN top10 USING (doc_id)
    ),
    inst AS (
      SELECT doc_id, UNNEST(ts) AS tok, len(ts) AS dl FROM toks
    ),
    w AS (
      SELECT tok,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             SUM(CAST(ROUND(1000000.0 / dl) AS BIGINT)) AS weight_micro
      FROM inst
      WHERE tok NOT IN ('spark', 'join', 'window')
      GROUP BY tok
    )
    SELECT tok, n_docs, weight_micro,
           ROUND(weight_micro / 1000000.0, 6) AS weight
    FROM w ORDER BY weight_micro DESC, tok LIMIT 10
    """,
)
def q232_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159 — pseudo-relevance feedback (RM1-style query expansion): take
    the BM25 top-10 (q218), weight every non-query term by its relative
    frequency mass across those docs (sum of tf/dl == sum of 1/dl over
    token INSTANCES — the instance form needs no per-doc-term rollup),
    emit the 10 strongest expansion terms. The classic second-pass
    retrieval step when the raw query underspecifies.

    Plan shape: the feedback set is 10 doc ids — broadcast back onto the
    documents scan as an equi-semi-join; instance weights are rounded to
    integer micros per token instance so the term sum is order-free; the
    final cut is TakeOrdered. Corpus-sized work: one scan + one
    |feedback-tokens| aggregation.
    """
    scored = _bm25_scored(spark, sf_dir)
    top10 = (
        scored.orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    docs = load(spark, sf_dir, "documents")
    toks = docs.join(F.broadcast(top10), "doc_id").select(
        "doc_id", tokenize(F.col("text")).alias("ts")
    )
    inst = toks.select(
        "doc_id", F.explode("ts").alias("tok"), F.size("ts").alias("dl")
    )
    w = (
        inst.filter(~F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum(
                F.round(F.lit(1000000.0) / F.col("dl")).cast("long")
            ).alias("weight_micro"),
        )
    )
    return (
        w.orderBy(F.col("weight_micro").desc(), "tok")
        .limit(10)
        .select(
            "tok",
            "n_docs",
            "weight_micro",
            F.round(F.col("weight_micro") / 1000000.0, 6).alias("weight"),
        )
    )


@register(
    "q233_conformal_interval",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents
      FROM events GROUP BY event_type
    ),
    s AS (
      SELECT e.event_type,
             abs(CAST(ROUND(e.value * 100) AS BIGINT) * m.n - m.sum_cents)
               AS score
      FROM events e JOIN m USING (event_type)
    ),
    r AS (
      SELECT event_type, score, COUNT(*) AS c FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, score,
             SUM(c) OVER (PARTITION BY event_type ORDER BY score) AS cc
      FROM r
    ),
    q AS (
      SELECT cum.event_type, MIN(score) AS q_scaled
      FROM cum JOIN m ON m.event_type = cum.event_type
      WHERE cc >= (9 * n + 9) // 10
      GROUP BY cum.event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           ROUND(CAST(m.sum_cents AS DOUBLE) / m.n / 100.0, 6) AS mu,
           ROUND(CAST(q_scaled AS DOUBLE) / (m.n * 100.0), 6) AS q90_abs_resid
    FROM m JOIN q USING (event_type)
    """,
)
def q233_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X160 — split-conformal prediction interval: per event type,
    predict value by the group mean and report the exact 90th-percentile
    absolute residual — the half-width of a distribution-free 90%
    prediction interval (the modern uncertainty wrapper for any point
    predictor). EXACT integer arithmetic throughout: the conformity
    score is |cents*n - sum_cents| (the absolute residual scaled by
    100n, monotone-equivalent within a group), and the quantile is the
    smallest score whose cumulative count reaches ceil(0.9n) — computed
    by rank logic, not an engine quantile function whose interpolation
    convention could differ.

    Plan shape: one 5-key scalar rollup broadcast back onto the scan,
    one (type, score) hash aggregation, then the cumulative window runs
    on the ROLLUP (|distinct scores| rows, partitioned per type) — the
    standard two-pass counting quantile that replaces a memory-bounded
    exact-percentile aggregate at scale.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sum_cents")
    )
    s = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.abs(cents * F.col("n") - F.col("sum_cents")).alias("score"),
    )
    r = s.groupBy("event_type", "score").agg(F.count(F.lit(1)).alias("c"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = r.withColumn("cc", F.sum("c").over(win))
    q = (
        cum.join(F.broadcast(m.select("event_type", "n")), "event_type")
        .filter(F.col("cc") >= F.expr("(9 * n + 9) div 10"))
        .groupBy("event_type")
        .agg(F.min("score").alias("q_scaled"))
    )
    return m.join(q, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("sum_cents").cast("double") / F.col("n") / F.lit(100.0), 6
        ).alias("mu"),
        F.round(
            F.col("q_scaled").cast("double") / (F.col("n") * F.lit(100.0)), 6
        ).alias("q90_abs_resid"),
    )


@register(
    "q234_linear_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    anchored AS (
      SELECT event_type, y,
             date_diff('day', MIN(d) OVER (PARTITION BY event_type), d) AS t
      FROM daily
    ),
    mo AS (
      SELECT event_type, COUNT(*) AS k, SUM(t) AS st, SUM(y) AS sy,
             SUM(t * t) AS stt, SUM(t * y) AS sty, MAX(t) AS tmax
      FROM anchored GROUP BY event_type
    )
    SELECT event_type, CAST(k AS BIGINT) AS n_days,
           ROUND(CAST(k * sty - st * sy AS DOUBLE)
                 / (k * stt - st * st), 6) AS slope,
           ROUND((sy - CAST(k * sty - st * sy AS DOUBLE)
                       / (k * stt - st * st) * st) / k, 6) AS intercept,
           ROUND((sy - CAST(k * sty - st * sy AS DOUBLE)
                       / (k * stt - st * st) * st) / k
                 + CAST(k * sty - st * sy AS DOUBLE)
                   / (k * stt - st * st) * (tmax + 1), 6) AS forecast
    FROM mo
    """,
)
def q234_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X161 — per-group linear trend forecast: OLS of daily event volume
    on the day index per event type, extrapolated one day past the end
    of the series (the simplest defensible capacity-planning forecast,
    and the trend leg q228's decomposition smooths rather than
    projects). Moments are exact integers; slope/intercept/forecast are
    the closed-form ratios, mirrored operation-for-operation.

    Plan shape: one corpus-sized rollup to (type, day); the day-index
    anchor is a per-type MIN window over the |type x days| rollup, and
    the regression is one 5-key moment aggregation. No joins on the big
    side at all.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    wmin = Window.partitionBy("event_type")
    anchored = daily.select(
        "event_type",
        "y",
        F.datediff(F.col("d"), F.min("d").over(wmin)).alias("t"),
    )
    k = F.count(F.lit(1))
    st, sy = F.sum("t"), F.sum("y")
    stt = F.sum(F.col("t") * F.col("t"))
    sty = F.sum(F.col("t") * F.col("y"))
    mo = anchored.groupBy("event_type").agg(
        k.alias("k"),
        st.alias("st"),
        sy.alias("sy"),
        stt.alias("stt"),
        sty.alias("sty"),
        F.max("t").alias("tmax"),
    )
    slope = (
        F.col("k") * F.col("sty") - F.col("st") * F.col("sy")
    ).cast("double") / (
        F.col("k") * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sy") - slope * F.col("st")) / F.col("k")
    return mo.select(
        "event_type",
        F.col("k").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(intercept + slope * (F.col("tmax") + 1), 6).alias("forecast"),
    )


# Shared dup-graph edge set (q214's head-fingerprint collisions), as a
# reusable CTE/helper for the graph-analytics family q235-q237.
_DUP_EDGES_CTE = """
    WITH fp AS (
      SELECT DISTINCT
             md5(array_to_string(list_filter(string_split_regex(
                  lower(trim(text)), '\\s+'), x -> x <> '')[1:8], ' ')) AS f,
             doc_id
      FROM documents
    ),
    edges AS (
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
    ),
    sym AS (
      SELECT a AS src, b AS dst FROM edges
      UNION ALL
      SELECT b AS src, a AS dst FROM edges
    )
"""


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected dup-graph edges (a < b): 8-token document-head
    fingerprint collisions — the same graph q214 counts triangles on."""
    docs = load(spark, sf_dir, "documents")
    head = F.md5(F.array_join(F.slice(tokenize(F.col("text")), 1, 8), " "))
    fp = docs.select(head.alias("f"), "doc_id").distinct()
    return (
        fp.alias("x")
        .join(
            fp.alias("y"),
            (F.col("x.f") == F.col("y.f"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )


def _sym_edges(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def _lpa_round_sql(i: int) -> str:
    """One deterministic label-propagation round: each node adopts its
    neighbors' most frequent label (count desc, label asc tiebreak),
    keeping its own label when isolated."""
    return f"""
    nl{i} AS (
      SELECT s.dst AS v, l.lab, COUNT(*) AS c
      FROM sym s JOIN lab{i} l ON l.v = s.src
      GROUP BY 1, 2
    ),
    pick{i} AS (
      SELECT v, lab FROM (
        SELECT v, lab,
               ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
        FROM nl{i}
      ) WHERE rn = 1
    ),
    lab{i + 1} AS (
      SELECT l.v, COALESCE(p.lab, l.lab) AS lab
      FROM lab{i} l LEFT JOIN pick{i} p USING (v)
    )
    """


@register(
    "q235_label_propagation",
    oracle=_DUP_EDGES_CTE
    + """
    , nodes AS (SELECT DISTINCT src AS v FROM sym),
    lab1 AS (SELECT v, v AS lab FROM nodes),
    """
    + _lpa_round_sql(1)
    + ","
    + _lpa_round_sql(2)
    + ","
    + _lpa_round_sql(3)
    + """
    SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS size
    FROM lab4 GROUP BY lab
    """,
)
def q235_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162 — community detection by label propagation (Raghavan et al.),
    3 synchronous rounds with a DETERMINISTIC update (most frequent
    neighbor label, tiebreak count desc then label asc — vanilla LPA's
    random tie flip makes results unreproducible, which is useless for
    a data-dedup audit). Complements connected components (q62): LPA
    splits bridge-connected families that CC would glue together.

    Plan shape: each round is (edge join labels) -> per-node mode via a
    count aggregation + per-node top-1 window — all hash-partitioned on
    the node key, no driver-side iteration state (3 rounds compose
    lazily into one plan). Isolated nodes keep their label via the left
    join.
    """
    edges = _dup_edges(spark, sf_dir)
    sym = _sym_edges(edges)
    nodes = sym.select(F.col("src").alias("v")).distinct()
    lab = nodes.select("v", F.col("v").alias("lab"))
    for _ in range(3):
        nl = (
            sym.join(lab.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("v").orderBy(F.col("c").desc(), "lab")
        pick = (
            nl.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", F.col("lab").alias("new_lab"))
        )
        lab = lab.join(pick, "v", "left").select(
            "v", F.coalesce("new_lab", "lab").alias("lab")
        )
    return lab.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )


def _kcore_round_sql(i: int, k: int = 2) -> str:
    return f"""
    deg{i} AS (SELECT src AS v, COUNT(*) AS d FROM sym{i} GROUP BY src),
    keep{i} AS (SELECT v FROM deg{i} WHERE d >= {k}),
    sym{i + 1} AS (
      SELECT s.src, s.dst FROM sym{i} s
      JOIN keep{i} ka ON ka.v = s.src
      JOIN keep{i} kb ON kb.v = s.dst
    )
    """


@register(
    "q236_kcore_decomposition",
    allow_non_equi="deliberate 1-row x 1-row cross join: node-count x edge-count report",
    oracle=_DUP_EDGES_CTE
    + """
    , sym1 AS (SELECT src, dst FROM sym),
    """
    + _kcore_round_sql(1)
    + ","
    + _kcore_round_sql(2)
    + ","
    + _kcore_round_sql(3)
    + """
    SELECT CAST((SELECT COUNT(DISTINCT src) FROM sym4) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM sym4) / 2 AS BIGINT) AS n_edges
    """,
)
def q236_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X163 — k-core peeling (3 rounds toward the 2-core): repeatedly
    drop nodes with degree < 2 and re-count. The dup-graph's 2-core is
    the set of documents in genuinely DENSE duplication structures —
    pendant one-off matches (the usual false positives of head
    fingerprints) peel away. Three fixed rounds compose lazily into one
    plan; each round is a degree aggregation + two semi-shaped joins on
    the node key.
    """
    sym = _sym_edges(_dup_edges(spark, sf_dir))
    for _ in range(3):
        deg = sym.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("d")
        )
        keep = deg.filter(F.col("d") >= 2).select("v")
        sym = (
            sym.join(keep.withColumnRenamed("v", "src"), "src")
            .join(keep.withColumnRenamed("v", "dst"), "dst")
            .select("src", "dst")
        )
    n_nodes = sym.select("src").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    n_edges = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("n_edges"))
    return n_nodes.crossJoin(F.broadcast(n_edges))


@register(
    "q237_degree_assortativity",
    oracle=_DUP_EDGES_CTE
    + """
    , deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
    ep AS (
      SELECT da.d AS x, db.d AS y
      FROM sym s JOIN deg da ON da.v = s.src JOIN deg db ON db.v = s.dst
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM ep
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM m
    """,
)
def q237_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X164 — degree assortativity of the dup graph: Pearson correlation
    of endpoint degrees over all directed edge instances (the standard
    Newman definition; using both orientations makes it symmetric).
    Positive = dup families are degree-stratified hubs-with-hubs;
    negative = star-shaped boilerplate centers. One number that
    distinguishes template explosions from mutual near-dup clusters.

    Plan shape: degree aggregation, two broadcast-able joins back onto
    the edge list, one exact-integer moment aggregation — the same
    closed-form Pearson machinery as q221/q234.
    """
    sym = _sym_edges(_dup_edges(spark, sf_dir))
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ep = (
        sym.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("x")), "src"
        )
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    return ep.agg(
        (n / 2).cast("long").alias("n_edges"),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / F.sqrt(
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            ),
            6,
        ).alias("assortativity"),
    )


@register(
    "q238_token_pmi",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the document-count scalar attached to the PMI pair table / burstiness token table",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT doc_id, UNNEST(list_filter(string_split_regex(
               lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    n_a AS (SELECT tok, COUNT(*) AS na FROM inc GROUP BY tok),
    g AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM inc),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS nab
      FROM inc a JOIN inc b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
    )
    SELECT tok_a, tok_b, CAST(nab AS BIGINT) AS n_ab,
           CAST(ROUND(1000000.0 * ln(CAST(nab * nd AS DOUBLE)
                / (ma.na * mb.na))) AS BIGINT) AS pmi_micro
    FROM pairs
    JOIN n_a ma ON ma.tok = pairs.tok_a
    JOIN n_a mb ON mb.tok = pairs.tok_b, g
    WHERE nab >= 5
    ORDER BY pmi_micro DESC, tok_a, tok_b LIMIT 50
    """,
)
def q238_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X165 — pointwise mutual information of token pairs by document
    co-occurrence (presence-based): PMI = ln(P(a,b)/(P(a)P(b))), the
    classic distributional-semantics association score (the PPMI matrix
    underlying pre-neural word vectors) and a collocation detector for
    template mining. Top-50 associated pairs with support >= 5.

    Plan shape: the pair counts come from an equi-self-join on doc_id
    over the DISTINCT (doc, token) incidence — fan-out per doc is
    C(per-doc vocab, 2), bounded by document length, never |vocab|^2;
    marginals ride a token-key aggregation and join back broadcast-
    sized. PMI is rounded to integer micros so the top-50 order is
    engine-exact.
    """
    docs = load(spark, sf_dir, "documents")
    inc = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    na = inc.groupBy("tok").agg(F.count(F.lit(1)).alias("na"))
    g = inc.agg(F.countDistinct("doc_id").alias("nd"))
    pairs = (
        inc.alias("a")
        .join(
            inc.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    ma = na.select(F.col("tok").alias("tok_a"), F.col("na").alias("na_a"))
    mb = na.select(F.col("tok").alias("tok_b"), F.col("na").alias("na_b"))
    pmi = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("nab") * F.col("nd")).cast("double")
            / (F.col("na_a") * F.col("na_b"))
        )
    ).cast("long")
    return (
        pairs.join(F.broadcast(ma), "tok_a")
        .join(F.broadcast(mb), "tok_b")
        .crossJoin(F.broadcast(g))
        .select(
            "tok_a",
            "tok_b",
            F.col("nab").cast("long").alias("n_ab"),
            pmi.alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "tok_a", "tok_b")
        .limit(50)
    )


@register(
    "q239_token_burstiness",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the document-count scalar attached to the PMI pair table / burstiness token table",
    oracle="""
    WITH dc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM (
        SELECT doc_id, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    g AS (SELECT COUNT(*) AS nd FROM documents),
    t AS (
      SELECT tok, SUM(c) AS sc, SUM(c * c) AS scc, COUNT(*) AS docs_with
      FROM dc GROUP BY tok
    )
    SELECT tok, CAST(sc AS BIGINT) AS n_total,
           CAST(docs_with AS BIGINT) AS n_docs,
           ROUND(CAST(nd * scc - sc * sc AS DOUBLE) / (nd * sc), 6)
             AS fano
    FROM t, g
    WHERE sc >= 50
    """,
)
def q239_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X166 — token burstiness via the Fano factor (variance-to-mean
    ratio of per-document counts, zeros included): content words burst
    (Fano >> 1 — when they appear, they appear repeatedly), function
    words and template filler spread evenly (Fano ~ 1, the Poisson
    line). A corpus-quality signal Zipf slope (q215) and TTR (q164)
    can't see: it distinguishes topical concentration from uniform
    keyword stuffing.

    The zero-count documents never materialize: with Z zero docs,
    var = (sum c^2 - (sum c)^2 / N) / N needs only the nonzero rollup
    plus the document count N — so fano = (N*scc - sc^2)/(N*sc) is
    exact integer arithmetic over the (doc, token) rollup. One explode
    + two stacked aggregations sharing the token key.
    """
    docs = load(spark, sf_dir, "documents")
    dc = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = docs.agg(F.count(F.lit(1)).alias("nd"))
    t = dc.groupBy("tok").agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.count(F.lit(1)).alias("docs_with"),
    )
    return (
        t.crossJoin(F.broadcast(g))
        .filter(F.col("sc") >= 50)
        .select(
            "tok",
            F.col("sc").cast("long").alias("n_total"),
            F.col("docs_with").cast("long").alias("n_docs"),
            F.round(
                (F.col("nd") * F.col("scc") - F.col("sc") * F.col("sc"))
                .cast("double")
                / (F.col("nd") * F.col("sc")),
                6,
            ).alias("fano"),
        )
    )


@register(
    "q240_heaps_law",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
      FROM (
        SELECT source, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY source
    ),
    pts AS (
      SELECT ln(CAST(n_tokens AS DOUBLE)) AS x,
             ln(CAST(vocab AS DOUBLE)) AS y
      FROM per_src
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS heaps_beta,
           ROUND((SUM(y) - (COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                           / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x))
                           * SUM(x)) / COUNT(*), 6) AS log_k
    FROM pts
    """,
)
def q240_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167 — Heaps'-law fit: vocabulary growth V = K * n^beta across
    corpus slices, estimated by log-log OLS over the per-source
    (token count, vocab size) points. Natural text sits near beta ~
    0.4-0.6; beta near 0 means a closed template vocabulary, near 1
    means id-like token churn. The companion corpus-law screen to
    Zipf's slope (q215) — together they characterize the frequency
    distribution AND its growth.

    Plan shape: one explode + per-source count/distinct aggregation
    (the only corpus-sized work), then the regression is the exact
    closed-form moment ratio over |sources| points.
    """
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
        )
    )
    pts = per_src.select(
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    cnt = F.count(F.lit(1))
    slope = (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    return pts.agg(
        cnt.cast("long").alias("n_points"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.sum("y") - slope * F.sum("x")) / cnt, 6).alias("log_k"),
    )


@register(
    "q241_next_event_accuracy",
    oracle="""
    WITH tr AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER w AS nxt,
             LEAD(CAST(ts AS DATE)) OVER w AS nd
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    t2 AS (SELECT cur, nxt, nd FROM tr WHERE nxt IS NOT NULL),
    train AS (
      SELECT cur, nxt, COUNT(*) AS c FROM t2
      WHERE nd < DATE '2024-01-21' GROUP BY 1, 2
    ),
    pred AS (
      SELECT cur, nxt AS p FROM (
        SELECT cur, nxt,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY c DESC, nxt) AS rn
        FROM train
      ) WHERE rn = 1
    )
    SELECT t2.cur AS cur_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t2.nxt = p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           ROUND(CAST(SUM(CASE WHEN t2.nxt = p THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy
    FROM t2 JOIN pred ON pred.cur = t2.cur
    WHERE t2.nd >= DATE '2024-01-21'
    GROUP BY t2.cur
    """,
)
def q241_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X168 — sequence-model evaluation: train a first-order Markov
    next-event predictor (argmax transition count, deterministic
    tiebreak) on the first 20 days, score top-1 accuracy per current
    event type on the rest. The time-based split is the leakage-safe
    one for sequences (q138's hash split would leak future transitions
    into train).

    Plan shape: ONE user-partitioned window pass builds every
    transition; the train matrix and the predictions are 25-key /
    5-key aggregations broadcast back onto the test transitions. The
    temporal split is a filter on the SAME transition set, so train and
    test can never disagree about sessionization.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
        F.lead(F.to_date("ts")).over(w).alias("nd"),
    ).filter(F.col("nxt").isNotNull())
    split = F.lit("2024-01-21").cast("date")
    train = (
        tr.filter(F.col("nd") < split)
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wp = Window.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
    pred = (
        train.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("p"))
    )
    test = tr.filter(F.col("nd") >= split)
    hit = F.sum((F.col("nxt") == F.col("p")).cast("long"))
    return (
        test.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("cur_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            hit.cast("long").alias("n_correct"),
            F.round(hit.cast("double") / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
    )


@register(
    "q242_woe_iv_encoding",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (pos, neg) totals scalar attached to the 10-row WoE table",
    oracle="""
    WITH f AS (
      SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER) % 10
               AS bucket,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    c AS (
      SELECT bucket, SUM(pos) AS p, SUM(1 - pos) AS q FROM f GROUP BY bucket
    ),
    g AS (SELECT SUM(p) AS pt, SUM(q) AS qt FROM c)
    SELECT bucket, CAST(p AS BIGINT) AS n_pos, CAST(q AS BIGINT) AS n_neg,
           ROUND(ln((CAST(p AS DOUBLE) / pt) / (CAST(q AS DOUBLE) / qt)), 6)
             AS woe,
           ROUND((CAST(p AS DOUBLE) / pt - CAST(q AS DOUBLE) / qt)
                 * ln((CAST(p AS DOUBLE) / pt) / (CAST(q AS DOUBLE) / qt)), 6)
             AS iv_contrib
    FROM c, g
    """,
)
def q242_woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X169 — weight-of-evidence encoding + information value (the
    credit-scoring feature screen): per feature bucket (the JSON prop
    ``k`` mod 10 — parsed with a mirrored regexp, no engine JSON
    divergence), WoE = ln((pos share)/(neg share)); the IV contribution
    sums to the feature's predictive-power score. The standard
    categorical encoding when a model needs monotone, target-aware
    numeric features.

    Plan shape: one 10-key conditional rollup; totals are a 1-row
    broadcast; all shares are exact-integer ratios inside mirrored
    float expressions.
    """
    ev = load(spark, sf_dir, "events")
    f = ev.select(
        (
            F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
            % 10
        ).alias("bucket"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    c = f.groupBy("bucket").agg(
        F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("q")
    )
    g = c.agg(F.sum("p").alias("pt"), F.sum("q").alias("qt"))
    ps = F.col("p").cast("double") / F.col("pt")
    qs = F.col("q").cast("double") / F.col("qt")
    woe = F.log(ps / qs)
    return c.crossJoin(F.broadcast(g)).select(
        "bucket",
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        F.round(woe, 6).alias("woe"),
        F.round((ps - qs) * woe, 6).alias("iv_contrib"),
    )


@register(
    "q243_loo_target_encoding",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(cents) AS sc
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(CAST(m.sc - e.cents AS DOUBLE) / ((m.n - 1) * 100.0), 6)
             AS loo_mean
    FROM e JOIN m USING (event_type)
    """,
)
def q243_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X170 — leave-one-out target encoding: replace each row's category
    with the mean target of all OTHER rows in the category,
    (sum_cat - y_i) / (n_cat - 1) — the standard high-cardinality
    categorical encoding that avoids leaking each row's own label into
    its feature (plain target encoding overfits exactly this way).

    Plan shape: the encoding needs only the per-category (count, sum)
    rollup broadcast back onto the scan — one aggregation + one
    broadcast equi-join, NO self-join and no window, which is what
    makes LOO encoding viable on 10^11-row fact tables. Integer cents
    until the mirrored final division.
    """
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sc")
    )
    return e.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        F.round(
            (F.col("sc") - F.col("cents")).cast("double")
            / ((F.col("n") - 1) * F.lit(100.0)),
            6,
        ).alias("loo_mean"),
    )


_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@register("q244_parquet_footer_audit")  # rows-only: filesystem metadata
# has no SQL-oracle form; per-row-group facts pinned by pytest instead
def q244_parquet_footer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X171 — table-maintenance audit: per-row-group parquet footer
    statistics for every table in the scale-factor directory, read on
    the executors (mapInPandas over the path list — the driver opens no
    files). The input to row-group sizing and compaction decisions; at
    100 TB this is the same operator pointed at a 100k-file table
    listing.
    """
    from noaa_ais_glue_lakehouse_spark.operators.maintenance import (
        parquet_footer_stats,
    )

    paths = [f"{sf_dir}/{t}.parquet" for t in _TABLES]
    out = parquet_footer_stats(spark, paths)
    return out.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
        "rg_idx",
        "n_rows",
        "n_cols",
        "compressed_bytes",
        "uncompressed_bytes",
    )


@register("q245_compaction_plan")  # rows-only: consumes q244's
# filesystem metadata; packing determinism pinned by pytest
def q245_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X172 — small-file compaction planner: next-fit bin packing of the
    sf directory's files into ~4 MiB output groups via an
    exclusive-prefix-sum bucket (two-phase prefix scan — planning never
    single-tasks). Demonstrated over the 10 table files; the operator
    is the one a nightly OPTIMIZE job would run over a streaming
    table's commit log.
    """
    from noaa_ais_glue_lakehouse_spark.operators.maintenance import (
        parquet_footer_stats,
        plan_compaction,
    )

    paths = [f"{sf_dir}/{t}.parquet" for t in _TABLES]
    stats = parquet_footer_stats(spark, paths)
    plan = plan_compaction(stats, target_bytes=4 * 1024 * 1024)
    return plan.select(
        "bin",
        "n_files",
        "total_bytes",
        F.transform(
            F.col("files"), lambda p: F.element_at(F.split(p, "/"), -1)
        ).alias("files"),
    )


@register(
    "q246_doremi_reweight",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: corpus token total / mean-CE / weight-total scalars on the |sources|-sized tables",
    oracle="""
    WITH tc AS (
      SELECT source, tok, COUNT(*) AS n FROM (
        SELECT source, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    st AS (SELECT source, SUM(n) AS ns FROM tc GROUP BY source),
    ct AS (SELECT tok, SUM(n) AS nt FROM tc GROUP BY tok),
    g AS (SELECT SUM(n) AS nn FROM tc),
    ce AS (
      SELECT tc.source,
             SUM(CAST(ROUND(1000000.0 * tc.n
                  * (-ln(CAST(nt AS DOUBLE) / nn)) / ns) AS BIGINT))
               AS ce_micro
      FROM tc JOIN st USING (source) JOIN ct USING (tok), g
      GROUP BY tc.source
    ),
    m AS (
      SELECT CAST(SUM(ce_micro) AS DOUBLE) / COUNT(*) AS mean_ce_micro,
             COUNT(*) AS n_src
      FROM ce
    ),
    raw AS (
      SELECT ce.source, ce.ce_micro,
             CAST(ROUND(1000000000.0 * (CAST(ns AS DOUBLE) / nn)
                  * exp((ce_micro - mean_ce_micro) / 1000000.0))
               AS BIGINT) AS raw_nano
      FROM ce JOIN st USING (source), g, m
    ),
    tot AS (SELECT SUM(raw_nano) AS traw FROM raw)
    SELECT source,
           ROUND(ce_micro / 1000000.0, 6) AS cross_entropy,
           ROUND(CAST(raw_nano AS DOUBLE) / traw, 6) AS new_weight
    FROM raw, tot
    """,
)
def q246_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X174 — DoReMi-flavored mixture reweighting: each source's new
    sampling weight is its token share scaled by exp(excess loss),
    where loss is the source's cross-entropy against the CORPUS unigram
    distribution — sources that diverge from the mixture get upweighted
    (eta = 1), the one-step form of the DoReMi group-DRO update. The
    companion to q184's temperature reweighting: that one only sees
    sizes, this one sees distributions.

    Determinism: every float SUM is pre-rounded to integer micros/nanos
    per term (CE terms, raw weights) so accumulation order can never
    change the output; ln/exp appear only inside mirrored per-row
    expressions. Plan shape: one (source, token) rollup feeds source
    totals, corpus totals and the CE join — all token-key equi-joins;
    scalars ride 1-row broadcasts.
    """
    docs = load(spark, sf_dir, "documents")
    tc = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    st = tc.groupBy("source").agg(F.sum("n").alias("ns"))
    ct = tc.groupBy("tok").agg(F.sum("n").alias("nt"))
    g = tc.agg(F.sum("n").alias("nn"))
    term = F.round(
        F.lit(1000000.0)
        * F.col("n")
        * (-F.log(F.col("nt").cast("double") / F.col("nn")))
        / F.col("ns")
    ).cast("long")
    ce = (
        tc.join(F.broadcast(st), "source")
        .join(F.broadcast(ct), "tok")
        .crossJoin(F.broadcast(g))
        .groupBy("source")
        .agg(F.sum(term).alias("ce_micro"))
    )
    m = ce.agg(
        (F.sum("ce_micro").cast("double") / F.count(F.lit(1))).alias(
            "mean_ce_micro"
        )
    )
    raw = (
        ce.join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(m))
        .select(
            "source",
            "ce_micro",
            F.round(
                F.lit(1000000000.0)
                * (F.col("ns").cast("double") / F.col("nn"))
                * F.exp(
                    (F.col("ce_micro") - F.col("mean_ce_micro"))
                    / F.lit(1000000.0)
                )
            )
            .cast("long")
            .alias("raw_nano"),
        )
    )
    tot = raw.agg(F.sum("raw_nano").alias("traw"))
    return raw.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(F.col("ce_micro") / 1000000.0, 6).alias("cross_entropy"),
        F.round(F.col("raw_nano").cast("double") / F.col("traw"), 6).alias(
            "new_weight"
        ),
    )


@register(
    "q247_benchmark_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, doc_id % 97 = 0 AS is_bench,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source, is_bench,
             md5(array_to_string(ts[i:i+7], ' ')) AS g
      FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS u(i)
      WHERE len(ts) >= 8
    ),
    bench_grams AS (SELECT DISTINCT g FROM grams WHERE is_bench),
    contaminated AS (
      SELECT DISTINCT doc_id, source
      FROM grams JOIN bench_grams USING (g)
      WHERE NOT is_bench
    ),
    base AS (
      SELECT source, COUNT(*) AS n_docs
      FROM documents WHERE doc_id % 97 <> 0 GROUP BY source
    )
    SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / b.n_docs, 6)
             AS contamination_rate
    FROM base b
    LEFT JOIN (SELECT source, COUNT(*) AS n FROM contaminated
               GROUP BY source) c USING (source)
    """,
)
def q247_benchmark_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X175 — benchmark-contamination screen (the decontamination step
    of every serious pretraining pipeline): flag corpus documents that
    share an 8-token span with any document in the held-out benchmark
    set (here the doc_id % 97 sample stands in for the benchmark), and
    report the contamination rate per source. Same span machinery as
    q216 but an ASYMMETRIC question — corpus vs a designated eval set —
    which is what you actually run before training.

    Plan shape: spans come from the shared ``repeated_span_grams``
    projection; the benchmark gram set is corpus-fraction-sized and the
    contamination test is one semi-join on the gram key.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_span_grams,
    )

    docs = load(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id", "source", (F.col("doc_id") % 97 == 0).alias("is_bench")
    )
    grams = repeated_span_grams(docs, "doc_id", "text", n=8).join(meta, "doc_id")
    bench_grams = grams.filter(F.col("is_bench")).select("g").distinct()
    contaminated = (
        grams.filter(~F.col("is_bench"))
        .join(bench_grams, "g")
        .select("doc_id", "source")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return base.join(contaminated, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_contaminated"),
        F.round(
            F.coalesce("n", F.lit(0)).cast("double") / F.col("n_docs"), 6
        ).alias("contamination_rate"),
    )


_DAILY_PAIRS_CTE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.d AS d1, b.d AS d2, a.y AS y1, b.y AS y2,
             date_diff('day', a.d, b.d) AS dt
      FROM daily a JOIN daily b ON b.d > a.d
    )
"""


@register(
    "q248_theil_sen_slope",
    allow_non_equi="deliberate |days|^2 theta self-joins ON THE DAY ROLLUP (dimension- sized pair spines for robust trend statistics) + 1-row scalars",
    oracle=_DAILY_PAIRS_CTE
    + """
    , slopes AS (
      SELECT CAST(y2 - y1 AS DOUBLE) / dt AS s, d1, d2 FROM pairs
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, d1, d2) AS rn,
             COUNT(*) OVER () AS m
      FROM slopes
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(m AS BIGINT) AS n_pairs,
           ROUND(s, 6) AS theil_sen_slope
    FROM ranked WHERE rn = (m + 1) // 2
    """,
)
def q248_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X176 — Theil-Sen robust trend estimator: the (lower) median of
    all pairwise slopes of the daily-volume series. Unlike q234's OLS
    it shrugs off outlier days (29% breakdown point) — the robust
    companion the MAD outlier screen (q145) pairs with for trends.

    Plan shape: the pair spine is a |days|^2 theta self-join ON THE
    DAY-LEVEL ROLLUP — dimension-sized by construction (435 pairs for a
    month), never the event table; the median is rank-selected with a
    total (slope, d1, d2) order so ties can't make it nondeterministic.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.d") > F.col("a.d")).select(
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("s"),
    )
    w = Window.orderBy("s", "d1", "d2")
    ranked = pairs.select(
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        ranked.filter(F.col("rn") == F.expr("(m + 1) div 2"))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            F.col("m").cast("long").alias("n_pairs"),
            F.round(F.col("s"), 6).alias("theil_sen_slope"),
        )
    )


@register(
    "q249_mann_kendall",
    allow_non_equi="deliberate |days|^2 theta self-joins ON THE DAY ROLLUP (dimension- sized pair spines for robust trend statistics) + 1-row scalars",
    oracle=_DAILY_PAIRS_CTE
    + """
    , s AS (
      SELECT SUM(CASE WHEN y2 > y1 THEN 1 WHEN y2 < y1 THEN -1 ELSE 0 END)
               AS mk_s
      FROM pairs
    ),
    n AS (SELECT COUNT(*) AS n FROM daily),
    ties AS (
      SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
      FROM (SELECT y, COUNT(*) AS t FROM daily GROUP BY y HAVING COUNT(*) > 1)
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(mk_s AS BIGINT) AS mk_s,
           ROUND((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term)
                 / 18.0, 6) AS var_s,
           ROUND(CASE WHEN mk_s = 0 THEN 0.0
                 ELSE (mk_s - CASE WHEN mk_s > 0 THEN 1 ELSE -1 END)
                      / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                              - tie_term) / 18.0) END, 6) AS z
    FROM s, n, ties
    """,
)
def q249_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X177 — Mann-Kendall trend test with tie correction: S = sum of
    pairwise signs over the daily series, continuity-corrected Z
    against the tie-adjusted variance. The nonparametric "is there a
    monotone trend at all" gate that belongs in front of any slope
    estimate (q234 OLS / q248 Theil-Sen) — it needs no distributional
    assumption the synthetic series would violate.

    Same dimension-sized day-pair spine as q248; the tie term is a
    second tiny aggregation on the day rollup; every input to the final
    mirrored float expression is an exact integer.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = F.when(F.col("b.y") > F.col("a.y"), 1).when(
        F.col("b.y") < F.col("a.y"), -1
    ).otherwise(0)
    s = a.join(b, F.col("b.d") > F.col("a.d")).agg(
        F.sum(sgn).alias("mk_s")
    )
    n = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    z = F.when(F.col("mk_s") == 0, F.lit(0.0)).otherwise(
        (
            F.col("mk_s")
            - F.when(F.col("mk_s") > 0, F.lit(1)).otherwise(F.lit(-1))
        )
        / F.sqrt(var_s)
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("mk_s").cast("long").alias("mk_s"),
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 6).alias("z"),
        )
    )


@register(
    "q250_fuzzy_entity_clusters",
    build_time_exec="connected components iterate at plan build (fuzzy entity closure)",
    oracle=_FUZZY_PAIRS_CTE
    + """
    , sym AS (
      SELECT name_a AS src, name_b AS dst FROM fuzzy
      UNION ALL SELECT name_b, name_a FROM fuzzy
    ),
    rec AS (
      WITH RECURSIVE cc(v, rep) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.dst, cc.rep FROM cc JOIN sym s ON s.src = cc.v
        WHERE cc.rep < s.dst OR cc.rep < s.src
      )
      SELECT v, MIN(rep) AS rep FROM cc GROUP BY v
    )
    SELECT rep AS entity, CAST(COUNT(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list(v)), '|') AS members
    FROM rec GROUP BY rep
    """,
)
def q250_fuzzy_entity_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X178 — end-to-end entity resolution: fuzzy candidate pairs
    (q217's blocking + Levenshtein verify) closed into transitive
    entity clusters by the repo's pointer-doubling connected
    components, with the lexicographically smallest member as the
    canonical entity id. The pairs→groups→canonical step every master-
    data pipeline needs; composes three existing operators rather than
    reimplementing any.

    The components run on STRING labels (min-label propagation is
    ordering-generic); the oracle closes the same graph with a
    recursive CTE. Isolated names (no fuzzy match) are not entities and
    are excluded by both sides.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    pairs = _fuzzy_name_pairs(spark, sf_dir).select(
        F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
    )
    cc = connected_components(pairs)
    return cc.groupBy(F.col("component").alias("entity")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.array_join(F.array_sort(F.collect_list("id")), "|").alias(
            "members"
        ),
    )


@register(
    "q251_sequence_packing",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id) AS c
      FROM d
    ),
    binned AS (
      SELECT doc_id, n_tokens, (c - n_tokens) // 512 AS bin FROM cum
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 512.0, 6) AS fill_rate
    FROM binned GROUP BY bin
    """,
)
def q251_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179 — training sequence packing: pack documents (in stable
    doc_id order) into 512-token context windows by next-fit on the
    exclusive prefix sum — the step that turns a cleaned corpus into
    dense training batches, with fill_rate the packing-efficiency
    number the training team actually asks for. The same prefix-scan
    bucket algebra as the compaction planner (q245), applied to tokens
    instead of bytes — one mechanism, two maintenance surfaces.

    Plan shape: one projection for token counts, one two-phase parallel
    prefix scan (never a single-task window at scale — mirrored here by
    the oracle's window over the same total order), one bin rollup.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    run = global_running_sum(d, ["doc_id"], "n_tokens", out_col="c")
    binned = run.select(
        "n_tokens",
        F.expr("(c - n_tokens) div 512").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.sum("n_tokens").cast("double") / F.lit(512.0), 6).alias(
            "fill_rate"
        ),
    )


@register(
    "q252_budgeted_selection",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, ts AS toks FROM (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents
      )
    ),
    scored AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             CAST(ROUND(1000000.0 * len(list_distinct(toks)) / len(toks))
               AS BIGINT) AS quality_micro
      FROM d WHERE len(toks) > 0
    ),
    cum AS (
      SELECT doc_id, source, n_tokens, quality_micro,
             SUM(n_tokens) OVER (ORDER BY quality_micro DESC, doc_id) AS c
      FROM scored
    ),
    sel AS (SELECT * FROM cum WHERE c <= 10000)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           ROUND(CAST(SUM(quality_micro) AS DOUBLE) / COUNT(*) / 1000000.0,
                 6) AS mean_quality
    FROM sel GROUP BY source
    """,
)
def q252_budgeted_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X180 — data selection under a token budget: rank documents by a
    quality score (here lexical diversity = distinct/total tokens, in
    integer micros) and greedily take the best until a 10k-token budget
    is exhausted (the rows whose running token total stays inside the
    budget). The curation step between quality scoring (q30/q106) and
    training-set assembly (q116): "given 10k tokens of budget, which
    docs make the cut and what does each source contribute?"

    Plan shape: per-doc scores are a pure projection; the greedy
    cutoff is the two-phase prefix scan over the (quality desc, doc_id)
    total order; reporting is a per-source rollup of the selected set.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.lit(1000000.0)
            * F.size(F.array_distinct(toks))
            / F.size(toks)
        )
        .cast("long")
        .alias("quality_micro"),
    ).filter(F.col("n_tokens") > 0)
    run = global_running_sum(
        scored.withColumn("neg_q", -F.col("quality_micro")),
        ["neg_q", "doc_id"],
        "n_tokens",
        out_col="c",
    )
    sel = run.filter(F.col("c") <= 10000)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("n_tokens").cast("long").alias("tokens_selected"),
        F.round(
            F.sum("quality_micro").cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0),
            6,
        ).alias("mean_quality"),
    )


@register(
    "q253_rank_biased_overlap",
    allow_non_equi="BM25 stats cross join + the bounded 20-row depth-spine cross join",
    oracle=_BM25_SQL_BASE
    + """
    , r1 AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rk1
      FROM scored
    ),
    r2 AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk2
      FROM documents
    ),
    j AS (SELECT r1.rk1, r2.rk2 FROM r1 JOIN r2 USING (doc_id)),
    depths AS (SELECT UNNEST(generate_series(1, 20)) AS depth),
    ov AS (
      SELECT depth,
             SUM(CASE WHEN rk1 <= depth AND rk2 <= depth THEN 1 ELSE 0 END)
               AS o
      FROM depths, j GROUP BY depth
    ),
    terms AS (
      SELECT depth, o,
             CAST(ROUND(1000000.0 * 0.1 * (CAST(o AS DOUBLE) / depth)
                  * power(0.9, depth - 1)) AS BIGINT) AS term_micro
      FROM ov
    )
    SELECT CAST(SUM(CASE WHEN depth = 20 THEN o END) AS BIGINT)
             AS overlap_at_20,
           CAST(SUM(term_micro) AS BIGINT) AS rbo_micro,
           ROUND(SUM(term_micro) / 1000000.0, 6) AS rbo
    FROM terms
    """,
)
def q253_rank_biased_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X181 — rank-biased overlap (Webber et al.) between the BM25
    ranking and the length-prior ranking, truncated at depth 20 with
    persistence p=0.9: RBO = (1-p) * sum_d (overlap@d / d) * p^(d-1).
    The top-weighted way to ask "do two rankers agree where it
    matters?" — Kendall/Spearman weight rank 1 and rank 5000 equally,
    which is wrong for retrieval.

    Plan shape: both global ranks come from single window passes in the
    oracle and, on the Spark side, from TakeOrdered-limited top-k sets
    (only ranks <= 20 can contribute, so the full global rank is never
    materialized — top-k each side, join, and a 20-row depth spine
    cross join). Per-depth terms are rounded to integer micros before
    the order-free sum.
    """
    scored = _bm25_scored(spark, sf_dir)
    # windows run over the 20 SURVIVING rows post-limit (bounded by k),
    # ordered by the same keys as the TakeOrdered so ranks are exact
    top1 = (
        scored.orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(20)
        .withColumn(
            "rk1",
            F.row_number().over(
                Window.orderBy(F.col("score_micro").desc(), "doc_id")
            ),
        )
        .select("doc_id", "rk1")
    )
    docs = load(spark, sf_dir, "documents")
    top2 = (
        docs.orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(20)
        .withColumn(
            "rk2",
            F.row_number().over(
                Window.orderBy(F.col("n_chars").desc(), "doc_id")
            ),
        )
        .select("doc_id", "rk2")
    )
    j = top1.join(top2, "doc_id").select("rk1", "rk2")
    depths = spark.range(1, 21).select(F.col("id").cast("int").alias("depth"))
    # left-join back onto the depth spine: when the two top-20s are
    # DISJOINT, j is empty and every depth must still report overlap 0
    # (the oracle's cross join keeps all-docs rank pairs, so its o=0
    # rows survive; without this the Spark side would aggregate nothing
    # and emit NULLs)
    ov = depths.join(
        depths.crossJoin(F.broadcast(j))
        .groupBy("depth")
        .agg(
            F.sum(
                (
                    (F.col("rk1") <= F.col("depth"))
                    & (F.col("rk2") <= F.col("depth"))
                ).cast("long")
            ).alias("o")
        ),
        "depth",
        "left",
    ).withColumn("o", F.coalesce("o", F.lit(0)))
    term = F.round(
        F.lit(1000000.0)
        * F.lit(0.1)
        * (F.col("o").cast("double") / F.col("depth"))
        * F.pow(F.lit(0.9), F.col("depth") - 1)
    ).cast("long")
    return ov.select("depth", "o", term.alias("term_micro")).agg(
        F.sum(F.when(F.col("depth") == 20, F.col("o")))
        .cast("long")
        .alias("overlap_at_20"),
        F.sum("term_micro").cast("long").alias("rbo_micro"),
        F.round(F.sum("term_micro") / 1000000.0, 6).alias("rbo"),
    )


@register(
    "q254_conversion_latency",
    allow_non_equi="deliberate 1-row broadcast scalars: total-count / x_k order stat",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_us
      FROM events
    ),
    lat AS (
      SELECT epoch_us(ts) - last_click_us AS us
      FROM seq
      WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
    ),
    r AS (SELECT us, COUNT(*) AS c FROM lat GROUP BY us),
    cum AS (
      SELECT us, SUM(c) OVER (ORDER BY us) AS cc FROM r
    ),
    n AS (SELECT COUNT(*) AS n FROM lat)
    SELECT CAST(n AS BIGINT) AS n_conversions,
           ROUND((SELECT MIN(us) FROM cum, n WHERE cc >= (5*n + 9) // 10)
                 / 1000000.0, 6) AS p50_seconds,
           ROUND((SELECT MIN(us) FROM cum, n WHERE cc >= (9*n + 9) // 10)
                 / 1000000.0, 6) AS p90_seconds
    FROM n
    """,
)
def q254_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X182 — conversion-latency distribution: for every purchase, the
    time since the SAME user's most recent preceding click (a running
    conditional max — the single-pass form of a per-row as-of join),
    then exact rank-based p50/p90 over the latency population. The
    product-analytics question behind every funnel: not whether users
    convert (q186) but how long conversion takes.

    Plan shape: ONE user-partitioned window pass attaches the last
    click; the quantiles use the two-pass counting method (distinct-
    value rollup + cumulative window on the rollup), not a memory-bound
    percentile aggregate — q233's machinery on a new population. The
    ceil thresholds are exact integer arithmetic.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros(F.col("ts")))
    ).over(w)
    lat = (
        ev.select(
            "event_type",
            (F.unix_micros(F.col("ts")) - last_click).alias("us"),
        )
        .filter((F.col("event_type") == "purchase") & F.col("us").isNotNull())
        .select("us")
    )
    r = lat.groupBy("us").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("us").rowsBetween(Window.unboundedPreceding, 0)
    cum = r.withColumn("cc", F.sum("c").over(wc))
    n = lat.agg(F.count(F.lit(1)).alias("n"))
    qc = cum.crossJoin(F.broadcast(n))

    def q_at(mult: int) -> F.Column:
        return F.min(
            F.when(
                F.col("cc") >= F.expr(f"({mult} * n + 9) div 10"),
                F.col("us"),
            )
        )

    quants = qc.agg(
        F.round(q_at(5) / 1000000.0, 6).alias("p50_seconds"),
        F.round(q_at(9) / 1000000.0, 6).alias("p90_seconds"),
    )
    # n rides its own scalar aggregate (always exactly one row) so that
    # with ZERO conversions the result is (0, NULL, NULL) like the
    # oracle — aggregating n out of the empty qc frame would yield NULL
    return (
        n.crossJoin(F.broadcast(quants))
        .select(
            F.col("n").cast("long").alias("n_conversions"),
            "p50_seconds",
            "p90_seconds",
        )
    )


@register(
    "q255_hill_tail_index",
    allow_non_equi="deliberate 1-row broadcast scalars: total-count / x_k order stat",
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id
      FROM events WHERE value > 0
    ),
    topk AS (
      SELECT cents FROM c ORDER BY cents DESC, event_id LIMIT 100
    ),
    xk AS (SELECT MIN(cents) AS mk FROM topk),
    terms AS (
      SELECT CAST(ROUND(1000000.0
               * ln(CAST(cents AS DOUBLE) / mk)) AS BIGINT) AS t
      FROM topk, xk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS hill_estimate,
           ROUND(CASE WHEN SUM(t) > 0
                 THEN 1.0 / (CAST(SUM(t) AS DOUBLE) / COUNT(*) / 1000000.0)
                 ELSE NULL END, 6) AS tail_alpha
    FROM terms
    """,
)
def q255_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X183 — Hill estimator of the tail index over the top-100 order
    statistics of event value: hill = mean ln(x_i / x_k), alpha =
    1/hill. The standard "how heavy is this tail" number — whether
    revenue concentration (q203 Gini) comes from a power law (alpha <
    2: variance infinite, sampling plans must change) or merely a
    skewed-but-tame distribution.

    Plan shape: the order statistics are one TakeOrdered top-k (never a
    sort); x_k is a 1-row broadcast; per-term logs are rounded to
    integer micros before the order-free sum.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("value") > 0).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"), "event_id"
    )
    topk = c.orderBy(F.col("cents").desc(), "event_id").limit(100).select(
        "cents"
    )
    xk = topk.agg(F.min("cents").alias("mk"))
    terms = topk.crossJoin(F.broadcast(xk)).select(
        F.round(
            F.lit(1000000.0)
            * F.log(F.col("cents").cast("double") / F.col("mk"))
        )
        .cast("long")
        .alias("t")
    )
    hill = F.sum("t").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.round(hill, 6).alias("hill_estimate"),
        F.round(
            F.when(F.sum("t") > 0, F.lit(1.0) / hill).otherwise(F.lit(None)),
            6,
        ).alias("tail_alpha"),
    )


@register(
    "q256_join_cardinality_estimate",
    allow_non_equi="deliberate 1-row x 1-row cross join: exact vs sampled join size",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS k, COUNT(*) AS na FROM orders GROUP BY 1
    ),
    b AS (
      SELECT c_custkey AS k, COUNT(*) AS nb FROM customer GROUP BY 1
    ),
    tru AS (
      SELECT SUM(na * nb) AS true_size FROM a JOIN b USING (k)
    ),
    est AS (
      SELECT SUM(na * nb) * 100 AS est_size
      FROM a JOIN b USING (k) WHERE k % 100 = 0
    )
    SELECT CAST(true_size AS BIGINT) AS true_size,
           CAST(COALESCE(est_size, 0) AS BIGINT) AS est_size,
           ROUND(abs(CAST(COALESCE(est_size, 0) AS DOUBLE) - true_size)
                 / true_size, 6) AS rel_error
    FROM tru, est
    """,
)
def q256_join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X185 — join-cardinality estimation, the optimizer statistic:
    |A join B| = sum over keys of n_a(k)*n_b(k), estimated from a
    deterministic 1% key sample (k % 100 — same keys sampled on BOTH
    sides, which is the trick: uniform row sampling underestimates
    joins badly, synchronized KEY sampling is unbiased) and compared
    against the exact size. The audit you run before trusting a join
    reorder on a new table pair.

    Plan shape: two key-count rollups (the only big shuffles), a
    key equi-join of the |keys|-sized count tables, and the sampled
    estimate rides the same join with a pushed-down key predicate.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = customer.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    j = a.join(b, "k").select(
        "k", (F.col("na") * F.col("nb")).alias("prod")
    )
    tru = j.agg(F.sum("prod").alias("true_size"))
    est = j.filter(F.col("k") % 100 == 0).agg(
        (F.sum("prod") * 100).alias("est_size")
    )
    return tru.crossJoin(F.broadcast(est)).select(
        F.col("true_size").cast("long").alias("true_size"),
        F.coalesce("est_size", F.lit(0)).cast("long").alias("est_size"),
        F.round(
            F.abs(
                F.coalesce("est_size", F.lit(0)).cast("double")
                - F.col("true_size")
            )
            / F.col("true_size"),
            6,
        ).alias("rel_error"),
    )


@register(
    "q257_acf_periodicity",
    allow_non_equi="deliberate 7-row broadcast literal cross join: the lag spine attached to the |days|-sized daily rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y FROM events GROUP BY 1
    ),
    lags AS (SELECT UNNEST(generate_series(1, 14)) AS lag),
    j AS (
      SELECT l.lag, a.y AS x, b.y AS z
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    m AS (
      SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(z) AS sz,
             SUM(x*x) AS sxx, SUM(z*z) AS szz, SUM(x*z) AS sxz
      FROM j GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n*sxz - sx*sz AS DOUBLE)
                 / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                        * CAST(n*szz - sz*sz AS DOUBLE)), 6) AS acf
    FROM m
    """,
)
def q257_acf_periodicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X186 — full autocorrelation function of the daily volume series
    at lags 1..14: the periodicity detector (Wiener-Khinchin: the ACF
    carries the same periodicity information as the power spectrum,
    but — unlike a cross-engine DFT, whose cos/sin differ between
    engines in the last ulp, measured 4/1000 angles here — it is exact
    integer moments end to end). A peak at lag 7 confirms the weekly
    cycle q228's decomposition assumes; q162 computes only lag 1.

    Plan shape: one corpus-sized daily rollup; the 14 lags are a
    broadcast literal spine; each lag's Pearson r is the closed-form
    integer-moment ratio (q221's machinery, self-joined on the shifted
    date key).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("lag"))
    return _lagged_pearson(
        daily.select("d", F.col("y").alias("x")),
        daily.select(F.col("d").alias("d2"), F.col("y").alias("z")),
        lags,
        n_alias="n_pairs",
        r_alias="acf",
    )


@register(
    "q258_waiting_supplier",
    oracle="""
    WITH j AS (
      SELECT l_orderkey, l_suppkey,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) > 365 AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM j l1
    WHERE late
      AND EXISTS (SELECT 1 FROM j l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM j l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 10
    """,
)
def q258_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-corpus — TPC-H Q21's shape (suppliers who kept orders waiting):
    late lines on multi-supplier orders where NO other supplier was
    late. The oracle states it in the literal correlated
    EXISTS / NOT EXISTS form; this side is the DECORRELATED rewrite a
    100 TB plan needs — both quantifiers collapse into one per-order
    aggregate:

      EXISTS(other supplier)        <=> n_suppliers(order) >= 2
      NOT EXISTS(other late suppl.) <=> n_late_suppliers(order) = 1
                                        (given this line is late)

    so instead of two correlated self-joins over lineitem the plan is
    ONE per-order aggregation joined back on the order key — the same
    shuffle the lines already need. "Late" = shipped > 365 days after
    the order date (this synthetic corpus has no commit/receipt dates).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            > 365
        ).alias("late"),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    qual = (
        j.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        qual.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(10)
    )


@register(
    "q259_image_header_decode",
    oracle="""
    SELECT doc_id AS id,
           CAST(1 + doc_id % 48 AS INT) AS width,
           CAST(1 + doc_id % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 3 END AS INT) AS channels,
           TRUE AS decode_ok
    FROM documents
    """,
)
def q259_image_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188 — REAL image header decode, end-to-end hash-checked: real
    PNG/GIF/BMP/JPEG payloads (CRC-correct chunks, valid zlib IDAT,
    marker-walked SOF frames) are synthesized on the executors with
    dimensions derived from doc_id, then ``decode_images`` recovers the
    dimensions by parsing the ACTUAL format headers — pure Python, no
    imaging library, no length stub anywhere on this path. The oracle
    recomputes the expected dimensions from the doc_id formulas, so a
    parser that mis-reads any byte offset hash-mismatches immediately.
    Channels: gif is palette-indexed (1 band); png(rgb)/bmp(24bpp)/
    jpeg(YCbCr) are 3. The stub remains only for payloads whose magic
    bytes nothing recognizes (q44 pins that mode).

    Scale shape: two chained Arrow-batched ``mapInPandas`` stages
    (synthesize → decode), zero shuffles, payload bytes never leave the
    executors — the plan a 100 TB thumbnail-metadata backfill wants.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_images,
        synthesize_image_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_image_assets(docs, "doc_id")
    return decode_images(assets, "id", "payload", use_stub=False)


@register(
    "q260_bpe_encode",
    build_time_exec="BPE encode learns its merges at plan build (same argmax collects)",
    oracle="""
    WITH wf AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)),
                     '\\s+'), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    r1 AS (
      SELECT w, c,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM wf
    ),
    """
    + _bpe_round_sql(1)
    + ","
    + _bpe_round_sql(2)
    + ","
    + _bpe_round_sql(3)
    + """,
    enc AS (
      SELECT w,
             len(list_filter(string_split(trim(s), ' '), x -> x <> ''))
               AS n_sym
      FROM r4
    ),
    dt AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x <> '')) AS w
      FROM documents
    )
    SELECT dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_sym) AS BIGINT) AS n_symbols
    FROM dt JOIN enc e USING (w)
    GROUP BY dt.doc_id
    """,
)
def q260_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189 — BPE ENCODING, the apply half of q224's training: learn 3
    merges from the corpus word frequencies, apply them to the
    vocabulary (same fixed 4-pass non-overlapping replace chain as
    training, mirrored in the oracle), then report per-document word and
    post-merge symbol counts — the token-budget number a trained
    tokenizer actually produces.

    Scale shape: merges apply to the VOCABULARY (dimension-sized), never
    to the corpus text — encoding is a word equi-join against the
    encoded vocab, so per-token cost at 100 TB is a hash lookup. The
    merge learning is the same bounded 1-row-per-round driver argmax as
    q224 (plan-build execution, see BUILD_TIME_EXECUTION).
    """
    from noaa_ais_glue_lakehouse_spark.operators.tokenizer import (
        bpe_apply,
        bpe_learn,
    )

    docs = load(spark, sf_dir, "documents")
    dt = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
    wf = dt.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    merges = bpe_learn(spark, wf, rounds=3, replace_passes=4)
    enc = bpe_apply(wf.select("w"), merges).select(
        "w",
        F.size(
            F.filter(
                F.split(F.trim(F.col("s")), " "), lambda x: x != F.lit("")
            )
        ).alias("n_sym"),
    )
    return (
        dt.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_symbols"),
        )
    )


@register(
    "q261_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    s AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0)
    SELECT doc_id,
           CAST(start // 48 AS INT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(LEAST(64, n - start) AS BIGINT) AS n_tok,
           w[start + 1] AS first_tok
    FROM (SELECT doc_id, w, n, UNNEST(range(0, n, 48)) AS start FROM s)
    """,
)
def q261_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X190 — RAG-style document chunking: fixed 64-token windows with
    16-token overlap (stride 48), one output row per chunk with its
    token offset, length, and first token (the first-token column pins
    offset arithmetic against the oracle, not just counts). The chunk
    grid is pure ``sequence`` + ``explode`` — row-local, zero shuffles
    at any corpus size; the downstream embed step would chain a
    mapInPandas like q44's decode.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select("doc_id", toks.alias("w"), F.size(toks).alias("n")).filter(
        F.col("n") > 0
    )
    start = F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("n") - 1, F.lit(48).cast("long"))
    )
    out = t.select("doc_id", "w", "n", start.alias("start_tok"))
    return out.select(
        "doc_id",
        (F.col("start_tok") / 48).cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("long"),
        F.least(F.lit(64), F.col("n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok"),
        F.element_at("w", (F.col("start_tok") + 1).cast("int")).alias(
            "first_tok"
        ),
    )


@register(
    "q262_touch_attribution",
    oracle="""
    WITH fb AS (
      SELECT user_id, MIN(ts) AS bts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    t AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type
      FROM events e JOIN fb USING (user_id)
      WHERE e.ts < fb.bts AND e.event_type <> 'purchase'
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_f,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_l
      FROM t
    )
    SELECT user_id,
           MAX(CASE WHEN rn_f = 1 THEN event_type END) AS first_touch,
           MAX(CASE WHEN rn_l = 1 THEN event_type END) AS last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM r GROUP BY user_id
    """,
)
def q262_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191 — first/last-touch conversion attribution: for every user
    with a purchase, the type of the first and of the last non-purchase
    event strictly before their first purchase, plus the touch count.

    Plan shape: the converter table is an aggregation (|users| rows)
    joined back on the user key, and both attributions come from ONE
    combinable min_by/max_by aggregation over (ts, event_id) structs —
    no window pass, no second shuffle beyond the user key, where the
    oracle's double row_number form would sort each partition twice.
    Ties are impossible by construction (the struct tiebreaks on
    event_id), so the hash check pins determinism.
    """
    ev = load(spark, sf_dir, "events")
    fb = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("bts"))
    )
    t = ev.join(fb, "user_id").filter(
        (F.col("ts") < F.col("bts")) & (F.col("event_type") != "purchase")
    )
    order = F.struct("ts", "event_id")
    return t.groupBy("user_id").agg(
        F.min_by("event_type", order).alias("first_touch"),
        F.max_by("event_type", order).alias("last_touch"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )


def _kappa_oracle() -> str:
    """Cohen's kappa between the declared ``lang`` label and the langid
    heuristic's guess — reuses q31's marker-count CASE so both raters
    are defined once. All statistics are integer counts; the only float
    ops are the three mirrored final divisions."""
    counts = []
    for lang, words in LANG_MARKERS.items():
        inlist = ",".join(f"'{w}'" for w in words)
        counts.append(f"len(list_filter(toks, x -> x IN ({inlist}))) AS c_{lang}")
    count_sql = ",\n             ".join(counts)
    langs = list(LANG_MARKERS.keys())
    greatest = "GREATEST(" + ", ".join(f"c_{la}" for la in langs) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for la in langs:
        case += f"WHEN c_{la} = {greatest} THEN '{la}' "
    case += "END"
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT lang AS label_a, {case} AS label_b
      FROM (SELECT doc_id, lang, {count_sql} FROM t)
    ),
    tot AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN label_a = label_b THEN 1 ELSE 0 END) AS agree
      FROM g
    ),
    ma AS (SELECT label_a AS l, COUNT(*) AS ca FROM g GROUP BY 1),
    mb AS (SELECT label_b AS l, COUNT(*) AS cb FROM g GROUP BY 1),
    ex AS (SELECT SUM(ca * cb) AS sum_ab FROM ma JOIN mb USING (l))
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
           ROUND(CAST(sum_ab AS DOUBLE) / (n * n), 6) AS pe,
           ROUND((CAST(agree AS DOUBLE) / n - CAST(sum_ab AS DOUBLE) / (n * n))
                 / (1 - CAST(sum_ab AS DOUBLE) / (n * n)), 6) AS kappa
    FROM tot, ex
    """


@register("q263_rater_agreement", allow_non_equi="deliberate 1-row x 1-row cross join: (n, agree) totals paired with the chance-agreement scalar for Cohen's kappa", oracle=_kappa_oracle())
def q263_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X192 — inter-rater agreement (Cohen's kappa) between two labelers:
    the declared ``lang`` column and the langid heuristic (q31) — the
    label-QA statistic an annotation pipeline publishes before trusting
    a labeler (kappa corrects raw agreement for chance agreement of the
    two raters' marginal distributions).

    Plan shape: one row-local labeling pass, one 1-row (n, agree)
    aggregate, two |labels|-sized marginal rollups equi-joined and
    reduced to a 1-row chance-agreement scalar, then a deliberate
    1-row x 1-row cross join pairing the two scalars. Every statistic is
    an exact integer count until the three mirrored final divisions.
    """
    docs = load(spark, sf_dir, "documents")
    g = docs.select(
        F.col("lang").alias("label_a"),
        langid_guess(F.col("text")).alias("label_b"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0)
        ).alias("agree"),
    )
    ma = g.groupBy(F.col("label_a").alias("l")).agg(F.count(F.lit(1)).alias("ca"))
    mb = g.groupBy(F.col("label_b").alias("l")).agg(F.count(F.lit(1)).alias("cb"))
    ex = ma.join(mb, "l").agg(F.sum(F.col("ca") * F.col("cb")).alias("sum_ab"))
    n = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n
    pe = F.col("sum_ab").cast("double") / (n * n)
    return (
        tot.crossJoin(F.broadcast(ex))
        .select(
            F.col("n").cast("long").alias("n"),
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.round((po - pe) / (1 - pe), 6).alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 widening: remaining classic TPC-H decorrelation shapes over the
# available tables (no partsupp in the testdata, so Q2/Q11/Q16/Q20's
# supplier-part bridge shapes are out of reach by construction).
# ---------------------------------------------------------------------------


@register(
    "q264_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS rc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rc AS DOUBLE)/100.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE rc = (SELECT MAX(rc) FROM revenue)
    """,
)
def q264_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier(s) by quarter revenue: a revenue
    "view" (per-supplier rollup), its scalar MAX, and an equality gate.

    Decorrelation: the classic form creates a view and compares against
    ``(SELECT MAX(...) FROM view)``. Here the rollup is computed once and
    the max attached by an EQUI-join on the revenue value itself (the
    1-row max side broadcasts) — no second scan of lineitem, no non-equi
    join, ties kept exactly as the SQL does. Revenue sums are exact
    integer cents so both engines agree on which suppliers tie at max.
    The supplier dim (100 rows at sf0.01) broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("rc")
        )
    )
    mx = rev.agg(F.max("rc").alias("rc"))
    return (
        rev.join(F.broadcast(mx), "rc")
        .join(
            F.broadcast(supp),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rc").cast("double") / 100.0).alias("total_revenue"),
        )
    )


@register(
    "q265_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
             / 100.0 / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
      AND 5 * CAST(ROUND(l_quantity*100) AS BIGINT) * cnt < sq
    """,
)
def q265_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from lines whose quantity is under 20%
    of the part's average quantity (the correlated AVG subquery).

    Decorrelated into a per-part rollup joined back on l_partkey — both
    the rollup and the join shuffle on the SAME key, so the exchange is
    computed once and reused. The 20%-of-average gate is evaluated in
    exact integers (``5·qty·cnt < sum``) instead of a float division, so
    boundary rows can't flip between engines. The filtered part dim
    broadcasts; its filter prunes before the join (PushedFilters).
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    qtyc = cents(F.col("l_quantity"))
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qtyc).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") == "Brand#3")
                    & (F.col("p_type") == "ECONOMY")
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(pavg, F.col("pk") == F.col("l_partkey"))
        .filter(F.lit(5) * qtyc * F.col("cnt") < F.col("sq"))
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice"))).cast("double")
                / 100.0
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q266_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS ok,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sumq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 19000
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           CAST(sumq AS DOUBLE)/100.0 AS total_qty
    FROM big
    JOIN orders ON o_orderkey = ok
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q266_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — customers with orders whose line quantities sum
    past a threshold (the ``IN (GROUP BY ... HAVING)`` subquery).

    Decorrelated: the HAVING rollup IS the driving table — no IN, no
    semi-join-then-rejoin double scan of lineitem. The surviving order
    keys (few) join orders on its key, then the customer dim broadcasts.
    Quantity sums are exact integer cents so threshold ties agree across
    engines.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(cents(F.col("l_quantity"))).alias("sumq"))
        .filter(F.col("sumq") > 19000)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("ok"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            (F.col("sumq").cast("double") / 100.0).alias("total_qty"),
        )
    )


@register(
    "q267_late_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q267_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority counts over orders having at
    least one late line (EXISTS with a correlated date comparison; the
    testdata has no commitdate, so "late" is shipped >60 days after the
    order date).

    The EXISTS decorrelates to LEFT SEMI join with the date predicate
    inside the join condition — one pass over lineitem, no DISTINCT
    dedup of multiple matching lines (semi join stops at the first
    match per order). The orders date filter prunes before the join.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "q268_nation_pair_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(vol) AS DOUBLE)/100.0 AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS vol
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q268_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — shipping volume between a nation pair, both
    directions, by ship year.

    Join order is the scale-aware one: the only big table (lineitem,
    date-filtered at the scan) joins orders on the order key, then every
    dimension side — customer, supplier, and both nation legs —
    BROADCASTS (all are ≤ |customers| rows). The disjunctive nation-pair
    predicate runs after both nation names are attached, exactly as the
    reference SQL's WHERE does; at 100 TB one could pre-filter the two
    nation keys into the supplier/customer broadcasts, but the predicate
    here keeps the oracle's both-directions tie handling obvious.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("_nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("_ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("_nc_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("yr"),
        )
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .cast("double")
                / 100.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Round-4 widening: Gopher repetition suite, epoch shuffle/sharding, FIM
# ---------------------------------------------------------------------------


@register(
    "q269_gopher_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks,
             len(array_to_string(toks, ' ')) AS doc_len
      FROM t WHERE len(toks) >= 5
    ), g2 AS (
      SELECT doc_id, doc_len, UNNEST(
        list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' '))) AS gram
      FROM f
    ), c2 AS (
      SELECT doc_id, doc_len, gram, COUNT(*) AS cnt
      FROM g2 GROUP BY doc_id, doc_len, gram
    ), top2 AS (
      SELECT doc_id, doc_len, gram, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, gram) AS rn
      FROM c2
    ), g5 AS (
      SELECT doc_id, UNNEST(
        list_transform(range(1, len(toks) - 3),
                       i -> array_to_string(toks[i:i+4], ' '))) AS gram
      FROM f
    ), c5 AS (
      SELECT doc_id, gram, COUNT(*) AS cnt
      FROM g5 GROUP BY doc_id, gram
    ), d5 AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt >= 2 THEN cnt * len(gram) ELSE 0 END) AS dupchars
      FROM c5 GROUP BY doc_id
    )
    SELECT top2.doc_id AS doc_id,
           top2.gram AS top2_gram,
           ROUND(CAST(top2.cnt * len(top2.gram) AS DOUBLE) / top2.doc_len, 6)
             AS top2_char_frac,
           ROUND(CAST(COALESCE(d5.dupchars, 0) AS DOUBLE) / top2.doc_len, 6)
             AS dup5_char_frac
    FROM top2 LEFT JOIN d5 ON top2.doc_id = d5.doc_id
    WHERE top2.rn = 1
    """,
)
def q269_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-filter signals (Rae et al. 2021 §A1.1): the
    character fraction of the single most frequent word 2-gram, and the
    character fraction covered by duplicated 5-grams (all occurrences of
    grams appearing ≥2×; Gopher's once-per-character variant needs
    positional interval union — this is the standard counting proxy).

    Shape: one token projection feeds both gram sizes; each explodes and
    hash-aggregates on (doc_id, gram) — the same shuffle key, so AQE
    reuses the exchange layout; the per-doc argmax is a combinable
    MIN(struct(-cnt, gram)) (most frequent, lexicographically first on
    ties), never a per-doc sort. Docs with <5 tokens are excluded so
    both signals are defined.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.length(F.array_join(toks, " ")).alias("doc_len"),
    ).filter(F.size("_toks") >= 5)
    g2 = base.select(
        "doc_id", "doc_len", F.explode(_word_ngrams(F.col("_toks"), 2)).alias("gram")
    )
    c2 = g2.groupBy("doc_id", "doc_len", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    top2 = (
        c2.groupBy("doc_id", "doc_len")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("_neg"), F.col("gram").alias("gram"))
            ).alias("_m")
        )
        .select(
            "doc_id",
            "doc_len",
            F.col("_m.gram").alias("top2_gram"),
            (-F.col("_m._neg")).alias("top2_cnt"),
        )
    )
    g5 = base.select(
        "doc_id", F.explode(_word_ngrams(F.col("_toks"), 5)).alias("gram")
    )
    c5 = g5.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    d5 = c5.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dupchars")
    )
    return (
        top2.join(d5, "doc_id", "left")
        .select(
            "doc_id",
            "top2_gram",
            F.round(
                (F.col("top2_cnt") * F.length("top2_gram")).cast("double")
                / F.col("doc_len"),
                6,
            ).alias("top2_char_frac"),
            F.round(
                F.coalesce(F.col("dupchars"), F.lit(0)).cast("double")
                / F.col("doc_len"),
                6,
            ).alias("dup5_char_frac"),
        )
    )


@register(
    "q270_epoch_shuffle_shards",
    oracle="""
    WITH e AS (
      SELECT doc_id, epoch,
             ((doc_id * 31 + epoch + 1) % 2147483648) * 2654435761 % 4294967296
               AS shuffle_key
      FROM documents, (SELECT UNNEST([0, 1]) AS epoch)
    )
    SELECT doc_id, epoch, shuffle_key,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                   ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
             AS pos,
           CAST((ROW_NUMBER() OVER (PARTITION BY epoch
                                    ORDER BY shuffle_key, doc_id) - 1) % 8
                AS BIGINT) AS shard
    FROM e
    """,
)
def q270_epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle + shard manifest — the
    "different order every epoch, same order every rerun" contract a
    training dataloader needs. Each (doc, epoch) gets a Knuth
    multiplicative shuffle key (pure integer arithmetic, identical in
    both engines — no RNG), a global position in its epoch's order, and
    a round-robin shard.

    Scale shape: the per-epoch global position would be a 2-partition
    window if written as ROW_NUMBER() PARTITION BY epoch — a non-starter
    at 100 TB. Instead ONE two-phase parallel prefix scan over
    (epoch, shuffle_key, doc_id) yields the cross-epoch running count,
    and the per-epoch position is recovered by subtracting each epoch's
    minimum (a |epochs|-row broadcast join).
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    ).select(
        "doc_id",
        "epoch",
        (
            ((F.col("doc_id") * 31 + F.col("epoch") + 1) % F.lit(2147483648))
            * F.lit(2654435761)
            % F.lit(4294967296)
        ).alias("shuffle_key"),
    )
    r = global_running_sum(
        e.withColumn("_one", F.lit(1)),
        ["epoch", "shuffle_key", "doc_id"],
        "_one",
        out_col="_rk",
    )
    mins = r.groupBy(F.col("epoch").alias("_ep")).agg(F.min("_rk").alias("_min_rk"))
    return (
        r.join(F.broadcast(mins), F.col("epoch") == F.col("_ep"))
        .select(
            "doc_id",
            "epoch",
            "shuffle_key",
            (F.col("_rk") - F.col("_min_rk")).cast("long").alias("pos"),
            ((F.col("_rk") - F.col("_min_rk")) % 8).cast("long").alias("shard"),
        )
    )


@register(
    "q271_fim_transform",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks, len(toks) AS n,
             1 + (doc_id % 2147483648) * 2654435761 % 4294967296
                   % (len(toks) - 2) AS a
      FROM t WHERE len(toks) >= 5
    ), s AS (
      SELECT doc_id, toks, n, a,
             a + 1 + ((doc_id + 7) % 2147483648) * 2654435761 % 4294967296
                       % (n - a - 1) AS b
      FROM f
    )
    SELECT doc_id, CAST(a AS BIGINT) AS cut_a, CAST(b AS BIGINT) AS cut_b,
           array_to_string(toks[1:a], ' ') AS prefix,
           array_to_string(toks[a+1:b], ' ') AS middle,
           array_to_string(toks[b+1:n], ' ') AS suffix,
           '<PRE>' || array_to_string(toks[1:a], ' ')
             || '<SUF>' || array_to_string(toks[b+1:n], ' ')
             || '<MID>' || array_to_string(toks[a+1:b], ' ') AS fim_text
    FROM s
    """,
)
def q271_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    PSM→SPM reorder): split each document's tokens at two deterministic
    cut points into prefix/middle/suffix, and emit the FIM-reordered
    training text ``<PRE>prefix<SUF>suffix<MID>middle``.

    Cut points come from the same Knuth multiplicative hash both engines
    compute exactly (no RNG): a ∈ [1, n-2], b ∈ [a+1, n-1], so all three
    segments are non-empty. Entirely row-local column expressions —
    tokenize, two hash mods, three slices, concat — zero shuffles, zero
    UDFs; Catalyst keeps the whole projection in one codegen stage.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") >= 5
    )
    n = F.size("_toks")
    knuth = lambda c: (c % F.lit(2147483648)) * F.lit(2654435761) % F.lit(4294967296)
    a = (F.lit(1) + knuth(F.col("doc_id")) % (n - 2)).alias("a")
    base = base.select("doc_id", "_toks", n.alias("n"), a)
    b = (
        F.col("a") + 1 + knuth(F.col("doc_id") + 7) % (F.col("n") - F.col("a") - 1)
    ).alias("b")
    base = base.select("doc_id", "_toks", "n", "a", b)
    prefix = F.array_join(F.slice("_toks", F.lit(1), F.col("a")), " ")
    middle = F.array_join(
        F.slice("_toks", F.col("a") + 1, F.col("b") - F.col("a")), " "
    )
    suffix = F.array_join(
        F.slice("_toks", F.col("b") + 1, F.col("n") - F.col("b")), " "
    )
    return base.select(
        "doc_id",
        F.col("a").cast("long").alias("cut_a"),
        F.col("b").cast("long").alias("cut_b"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.concat(
            F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
        ).alias("fim_text"),
    )


@register(
    "q272_stream_stream_left_join",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the explicit outer- completeness cutoff scalar attached to the DRAINED (batch) result of the stream-stream left-outer join",
    oracle="""
    WITH p AS (
      SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id AS v_user, ts AS v_ts, event_id AS view_id
      FROM events WHERE event_type = 'view'
    ), cut AS (
      SELECT MAX(epoch_us(p_ts)) - 7200000000 AS c FROM p
    ), j AS (
      SELECT p.purchase_id, v.view_id, p.p_user, p.p_ts
      FROM p LEFT JOIN v
        ON p.p_user = v.v_user
       AND epoch_us(v.v_ts) <= epoch_us(p.p_ts)
       AND epoch_us(v.v_ts) >= epoch_us(p.p_ts) - 600000000
    )
    SELECT purchase_id, view_id, p_user AS user_id
    FROM j, cut
    WHERE view_id IS NOT NULL OR epoch_us(p_ts) <= c
    """,
)
def q272_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join under the correctness gate:
    purchases left-joined to same-user views from the preceding 10
    minutes, both sides watermarked file streams drained with
    availableNow. The semantics worth pinning: OUTER emission is
    watermark-gated — an unmatched purchase is emitted (null view) only
    once the join watermark passes it, so when the stream ends, the
    watermark-deep TAIL of unmatched purchases is still held back in
    state. That is not a bug but the contract: outer completeness lags
    the watermark, and a downstream consumer must treat the last
    watermark-interval as open.

    Instead of reverse-engineering Spark's internal watermark (max event
    time ms-floored minus delay — an implementation detail), both the
    streaming result and the batch oracle apply an EXPLICIT cutoff 2h
    before the max purchase time (1h of slack past the 1h watermark):
    every unmatched purchase at or below it is guaranteed emitted, the
    tail above it is excluded on both sides, and matched rows — whose
    inner emission is complete regardless of watermark — pass untouched.
    The cutoff scalar is a deliberate 1-row broadcast cross join on the
    DRAINED (batch) result, not in the stream.
    """
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    views = (
        _stream("q272_v_")
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q272_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    name = f"q272_sslj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q272_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    cut = (
        spark.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        .agg(
            (F.max(F.unix_micros(F.col("ts").cast(T.TimestampType()))) - 7200000000)
            .alias("_cut")
        )
    )
    return (
        drained.crossJoin(F.broadcast(cut))
        .filter(
            F.col("view_id").isNotNull()
            | (F.unix_micros("p_ts") <= F.col("_cut"))
        )
        .select("purchase_id", "view_id", F.col("p_user").alias("user_id"))
    )


@register(
    "q273_quality_classifier",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS toks
      FROM documents
    ), e AS (
      SELECT doc_id, UNNEST(toks) AS tok FROM t WHERE len(toks) > 0
    ), w AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 2001 - 1000
               AS w_milli
      FROM e
    ), s AS (
      SELECT doc_id,
             CAST(SUM(w_milli) AS BIGINT) AS z_milli,
             CAST(COUNT(*) AS BIGINT) AS n_features
      FROM w GROUP BY doc_id
    )
    SELECT doc_id, n_features, z_milli,
           ROUND(1.0 / (1.0 + exp(-(CAST(z_milli AS DOUBLE) / 1000.0
                                    / n_features))), 6) AS quality_score,
           z_milli > 0 AS keep
    FROM s
    """,
)
def q273_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier inference (the fastText /
    DSIR-style fasttext-filter shape): each distinct token is a presence
    feature whose weight comes from a hash-indexed weight vector — here a
    deterministic md5-derived integer-milli weight so both engines score
    identically; a trained model swaps in the same-shape broadcast weight
    table without changing the plan. Score = sigmoid of the mean feature
    weight; the keep decision is made on the EXACT integer logit sum, so
    classification never hinges on float rounding.

    Shape: distinct-token explode → row-local weight expression (no
    weight-table join needed under the hashing trick) → one (doc_id)
    hash aggregation. The sigmoid is display-only.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(tokenize(F.col("text")))
    e = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") > 0
    ).select("doc_id", F.explode("_toks").alias("tok"))
    w_milli = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % 2001
        - 1000
    )
    s = e.select("doc_id", w_milli.alias("w_milli")).groupBy("doc_id").agg(
        F.sum("w_milli").cast("long").alias("z_milli"),
        F.count(F.lit(1)).cast("long").alias("n_features"),
    )
    return s.select(
        "doc_id",
        "n_features",
        "z_milli",
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    -(
                        F.col("z_milli").cast("double")
                        / 1000.0
                        / F.col("n_features")
                    )
                )
            ),
            6,
        ).alias("quality_score"),
        (F.col("z_milli") > 0).alias("keep"),
    )


@register(
    "q274_dsir_selection",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (totals, vocab) LM-smoothing scalar attached to the |vocab|-sized table before it joins the token stream",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), v AS (
      SELECT tok,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt,
             COUNT(*) AS nc
      FROM t GROUP BY tok
    ), tot AS (
      SELECT SUM(nt) AS tt, SUM(nc) AS tc,
             CAST(COUNT(*) AS DOUBLE) AS vocab
      FROM v
    ), scored AS (
      SELECT t.doc_id,
             SUM(ln((v.nt + 1.0) / (tot.tt + tot.vocab))
                 - ln((v.nc + 1.0) / (tot.tc + tot.vocab))) AS lw
      FROM t JOIN v ON v.tok = t.tok, tot
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(lw, 6) AS log_importance
    FROM scored
    ORDER BY ROUND(lw, 6) DESC, doc_id
    LIMIT 50
    """,
)
def q274_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023): rank documents
    by the log-likelihood ratio of a target-domain unigram LM (docs from
    'src0', add-one smoothed) over the whole-corpus LM, and keep the
    top 50 — the "select pretraining data that looks like the target"
    primitive.

    Both LMs come from ONE (token) rollup with a conditional target
    count — no second pass; the (total, vocab) scalars attach to the
    |vocab|-sized table by a deliberate 1-row broadcast cross join
    BEFORE it joins the token stream, so the stream-side join stays a
    pure token equi-join (broadcast: vocab ≪ corpus). Ranking uses the
    6-dp-rounded weight with a doc_id tiebreak so float ulps can't
    reorder the cut; top-50 is TakeOrdered, never a global sort.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    v = t.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("nt"),
        F.count(F.lit(1)).alias("nc"),
    )
    tot = v.agg(
        F.sum("nt").alias("tt"),
        F.sum("nc").alias("tc"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    vw = v.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("nt") + 1.0) / (F.col("tt") + F.col("vocab")))
            - F.log((F.col("nc") + 1.0) / (F.col("tc") + F.col("vocab")))
        ).alias("term"),
    )
    scored = (
        t.join(F.broadcast(vw), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.sum("term"), 6).alias("log_importance"))
    )
    return scored.orderBy(
        F.col("log_importance").desc(), F.col("doc_id")
    ).limit(50)


@register(
    "q275_preference_pairs",
    oracle="""
    WITH s AS (
      SELECT doc_id, source, lang,
             len(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS score
      FROM documents
    )
    SELECT source, lang,
           (MIN({'n': -score, 'id': doc_id})).id AS chosen_id,
           CAST(MAX(score) AS BIGINT) AS chosen_score,
           -(MIN({'p': score, 'nid': -doc_id})).nid AS rejected_id,
           CAST(MIN(score) AS BIGINT) AS rejected_score,
           CAST(MAX(score) - MIN(score) AS BIGINT) AS margin
    FROM s
    GROUP BY source, lang
    HAVING COUNT(*) >= 2 AND MAX(score) > MIN(score)
    """,
)
def q275_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model training: within
    each (source, lang) bucket, pair the highest-scoring document
    (chosen) with the lowest-scoring one (rejected) under a lexical
    quality score (distinct-token count), keeping only buckets with a
    real margin. The RLHF data-prep shape: per-group argmax AND argmin
    in one combinable aggregation — MIN over (±score, ±id) structs, no
    window, no per-group sort, one shuffle on the bucket key.

    Tiebreaks are pinned both ways (lowest doc_id among chosen ties,
    HIGHEST doc_id among rejected ties) so the pair is unique even in
    all-equal buckets — which the margin filter then drops.
    """
    docs = load(spark, sf_dir, "documents")
    score = F.size(F.array_distinct(tokenize(F.col("text"))))
    s = docs.select("doc_id", "source", "lang", score.alias("score"))
    agg = s.groupBy("source", "lang").agg(
        F.min(
            F.struct((-F.col("score")).alias("_n"), F.col("doc_id").alias("id"))
        ).alias("_ch"),
        F.min(
            F.struct(F.col("score").alias("_p"), (-F.col("doc_id")).alias("_nid"))
        ).alias("_rj"),
        F.count(F.lit(1)).alias("_n_docs"),
    )
    return (
        agg.filter(
            (F.col("_n_docs") >= 2) & (-F.col("_ch._n") > F.col("_rj._p"))
        )
        .select(
            "source",
            "lang",
            F.col("_ch.id").alias("chosen_id"),
            (-F.col("_ch._n")).cast("long").alias("chosen_score"),
            (-F.col("_rj._nid")).alias("rejected_id"),
            F.col("_rj._p").cast("long").alias("rejected_score"),
            (-F.col("_ch._n") - F.col("_rj._p")).cast("long").alias("margin"),
        )
    )


@register(
    "q276_dynamic_gap_sessions",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) AS us,
             epoch_us(ts) + CASE WHEN event_type = 'view'
                                 THEN 600000000 ELSE 1800000000 END AS end_us
      FROM events
    ), m AS (
      SELECT user_id, us, end_us,
             MAX(end_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max_end
      FROM g
    ), b AS (
      SELECT user_id, us, end_us,
             CASE WHEN prev_max_end IS NULL OR us >= prev_max_end
                  THEN 1 ELSE 0 END AS is_start
      FROM m
    ), sid AS (
      SELECT user_id, us, end_us,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM b
    )
    SELECT user_id,
           strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(make_timestamp(MAX(end_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sid
    GROUP BY user_id, session_no
    """,
)
def q276_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows — Spark's ``session_window`` with a
    per-event gap EXPRESSION (views time out after 10 minutes, everything
    else after 30): each event spans [ts, ts+gap(event)); overlapping
    spans merge. The native operator replaces the fixed-gap prefix-sum
    sessionize when inactivity tolerance depends on the event itself.

    The oracle pins the exact merge semantics independently: interval
    merge via running MAX of span ends (a new session starts iff the
    event's start is ≥ every earlier event's end — boundary-touching
    spans do NOT merge, matching session_window's end-exclusive
    intervals). One shuffle on user_id; the session assembly is
    map-side within each entity partition.
    """
    from pyspark.sql import types as T

    docs = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "view", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    ev = docs.select(
        "user_id",
        F.col("ts").cast(T.TimestampType()).alias("ts"),
        "event_type",
    )
    out = ev.groupBy(
        "user_id", F.session_window("ts", gap).alias("sw")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return out.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "n_events",
    )


_EXACT_DIV_SQL = (
    "CASE WHEN {a} >= 0 THEN CAST(({a} - {a} % {s}) / {s} AS BIGINT) "
    "ELSE -CAST(((-{a}) - (-{a}) % {s}) / {s} AS BIGINT) END"
)


def _power_round_sql(r: int) -> str:
    """One deterministic power-iteration round as a chained CTE pair:
    w = A'·v (integer matmul), then v rescaled to |v| ≤ 1000 by an
    exact integer division with the round's own max-|w| scalar."""
    div = _EXACT_DIV_SQL.format(a="w", s="sv")
    return f"""
    w{r} AS (
      SELECT a.i AS i, SUM(a.a2 * v.v) AS w
      FROM a2 a JOIN v{r - 1} v ON v.i = a.j
      GROUP BY a.i
    ), sw{r} AS (
      SELECT CAST(MAX(ABS(w)) AS BIGINT) // 1000 + 1 AS sv FROM w{r}
    ), v{r} AS (
      SELECT i, {div} AS v FROM w{r}, sw{r}
    )"""


@register(
    "q277_power_iteration_pca",
    allow_non_equi="deliberate 1-row broadcast cross joins throughout the iteration: the n scalar on the d\u00b2-row matrix and the per-round rescale scalars on the d-row vector (operators/linalg.py)",
    oracle="""
    WITH m AS (
      SELECT list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    marg AS (
      SELECT i, SUM(v[i]) AS s
      FROM m, UNNEST(generate_series(1, len(v))) AS u(i)
      GROUP BY i
    ),
    pairs AS (
      SELECT i, j, SUM(vi * vj) AS sij FROM (
        SELECT u.i AS i, w.j AS j, v[u.i] AS vi, v[w.j] AS vj
        FROM m,
             UNNEST(generate_series(1, len(v))) AS u(i),
             UNNEST(generate_series(1, len(v))) AS w(j)
        WHERE w.j >= u.i
      ) GROUP BY i, j
    ),
    g AS (SELECT COUNT(*) AS n FROM m),
    tri AS (
      SELECT p.i, p.j, CAST(n * sij - ma.s * mb.s AS BIGINT) AS a
      FROM pairs p
      JOIN marg ma ON ma.i = p.i
      JOIN marg mb ON mb.i = p.j, g
    ),
    asym AS (
      SELECT i, j, a FROM tri
      UNION ALL
      SELECT j AS i, i AS j, a FROM tri WHERE i <> j
    ),
    sa AS (
      SELECT CAST(MAX(ABS(a)) AS BIGINT) // 1000000 + 1 AS s FROM asym
    ),
    a2 AS (
      SELECT i, j,
             CASE WHEN a >= 0 THEN CAST((a - a % s) / s AS BIGINT)
                  ELSE -CAST(((-a) - (-a) % s) / s AS BIGINT) END AS a2
      FROM asym, sa
    ),
    v0 AS (
      SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM a2
    ),
    """
    + ",".join(_power_round_sql(r).strip().rstrip() for r in (1, 2, 3))
    + """
    SELECT CAST(i AS INTEGER) AS dim, CAST(v AS BIGINT) AS component_scaled
    FROM v3
    """,
)
def q277_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-eigenvector power iteration over the embedding covariance —
    the PCA direction extracted with DISTRIBUTED, ENGINE-EXACT integer
    linear algebra (operators/linalg.py): the d×d covariance numerators
    (q231's exact-integer form) are rescaled once, then 3 rounds of
    w=A·v matmul (a (j)-keyed join + (i)-keyed hash aggregation over the
    64²-row matrix table) with each round's vector renormalized to
    |v|≤1000 by an exact truncating integer division. No float enters
    the iteration, so both engines produce bit-identical iterates — no
    tolerance, no rounding, a HASH-exact oracle for an iterative
    numerical algorithm. The contract is the exact 3-round ITERATE;
    convergence to the eigenvector needs more rounds when the spectrum
    is flat (as with this near-isotropic synthetic data) — the
    planted-dominant-direction case converges in 3 and is pinned in
    tests/test_linalg.py alongside exact numpy parity on this table.

    100 TB shape: the corpus-sized work is the one covariance pass
    (each row emits its d(d+1)/2 upper-triangle products into one hash
    agg); the iteration then runs on the d²-row matrix — cluster-trivial
    — without ever collecting it to the driver. The four 1-row scalar
    attaches (matrix scale + one per round) are deliberate broadcast
    cross joins.
    """
    from noaa_ais_glue_lakehouse_spark.operators.linalg import (
        integer_covariance_numerators,
        power_iteration_top_direction,
    )

    emb = load(spark, sf_dir, "embeddings")
    matrix = integer_covariance_numerators(emb, "embedding", scale=1000)
    v = power_iteration_top_direction(matrix, rounds=3)
    return v.select(
        F.col("i").cast("int").alias("dim"),
        F.col("v").cast("long").alias("component_scaled"),
    )


@register(
    "q278_matryoshka_truncation",
    oracle="""
    WITH t AS (
      SELECT vec_id, embedding[1:16] AS head,
             list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)
                                                       * 1000000) AS BIGINT)) AS fm,
             list_transform(embedding[1:16],
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                      AS BIGINT)) AS hm
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(hm) AS BIGINT) AS dim_kept,
           CAST(list_sum(list_transform(hm, x -> x * x)) AS BIGINT)
             AS head_sq_micro,
           CAST(list_sum(list_transform(fm, x -> x * x)) AS BIGINT)
             AS full_sq_micro,
           ROUND(sqrt(CAST(list_sum(list_transform(hm, x -> x * x)) AS DOUBLE))
                 / sqrt(CAST(list_sum(list_transform(fm, x -> x * x)) AS DOUBLE)),
                 6) AS energy_kept
    FROM t
    """,
)
def q278_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka embedding truncation audit (Kusupati et al. 2022):
    keep the first 16 of 64 dimensions and report, per vector, the
    fraction of the L2 norm the truncated head retains — the signal for
    choosing a cheaper ANN index dimension. Squared norms are exact
    integer micro sums (order-free); only the final sqrt ratio is float,
    rounded 6dp identically in both engines. Row-local array expressions
    — zero shuffles, zero explodes.
    """
    emb = load(spark, sf_dir, "embeddings")
    micro = lambda c: F.transform(
        c, lambda x: F.round(x.cast("double") * 1000000).cast("long")
    )
    sq = lambda c: F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    head = F.slice(F.col("embedding"), 1, 16)
    t = emb.select(
        "vec_id",
        sq(micro(head)).alias("head_sq_micro"),
        sq(micro(F.col("embedding"))).alias("full_sq_micro"),
        F.size(head).cast("long").alias("dim_kept"),
    )
    return t.select(
        "vec_id",
        "dim_kept",
        "head_sq_micro",
        "full_sq_micro",
        F.round(
            F.sqrt(F.col("head_sq_micro").cast("double"))
            / F.sqrt(F.col("full_sq_micro").cast("double")),
            6,
        ).alias("energy_kept"),
    )


@register(
    "q279_largest_remainder_alloc",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the corpus-total scalar on the |sources| rollup and the allocated-seats scalar on the |sources| quota table",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n) AS t FROM s
    ), q AS (
      SELECT source, n,
             (n * 1000) // t AS fl,
             (n * 1000) % t AS rem
      FROM s, tot
    ), base AS (
      SELECT SUM(fl) AS allocated FROM q
    ), r AS (
      SELECT source, n, fl, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM q
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(fl + CASE WHEN rk <= 1000 - (SELECT allocated FROM base)
                          THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM r
    """,
)
def q279_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) quota allocation: split a budget of
    1000 sampled documents across sources EXACTLY proportionally — floor
    quotas first, then the leftover seats go to the largest fractional
    remainders. The sampling-design primitive behind "exact N-doc
    stratified sample" requests, where naive rounding over- or
    under-shoots the budget.

    All quota arithmetic is exact integers (n·1000 // total and its
    remainder); the seat ranking is over |sources| rows — driver-scale
    AFTER the one corpus-count aggregation, so the window's single
    partition is by construction tiny, and the leftover-seat count is a
    1-row broadcast attach.
    """
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = s.agg(F.sum("n").alias("t"))
    q = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        ((F.col("n") * 1000) / F.col("t")).cast("long").alias("fl"),
        ((F.col("n") * 1000) % F.col("t")).alias("rem"),
    )
    base = q.agg(F.sum("fl").alias("allocated"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    r = q.withColumn("rk", F.row_number().over(w))
    return r.crossJoin(F.broadcast(base)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        (
            F.col("fl")
            + F.when(F.col("rk") <= 1000 - F.col("allocated"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )


@register(
    "q280_incremental_dedup",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) - 6),
                            i -> md5(substr(lower(text), i, 8))) AS hashes
      FROM documents WHERE length(text) >= 8
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hashes) - 2),
                           j -> list_min(hashes[j : j + 3]))) AS fps
      FROM grams WHERE len(hashes) >= 4
    ), idx AS (
      SELECT doc_id, (doc_id % 10) >= 8 AS is_new, unnest(fps) AS fp FROM wins
    ), pairs AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
             GREATEST(a.doc_id, b.doc_id) AS id_b,
             a.fp AS fp,
             (a.is_new AND b.is_new) AS bn
      FROM idx a JOIN idx b
        ON a.fp = b.fp AND a.doc_id <> b.doc_id AND b.is_new
    )
    SELECT id_a, id_b,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS shared_fps,
           CASE WHEN BOOL_OR(bn) THEN 'new-new' ELSE 'hist-new' END AS pair_kind
    FROM pairs
    GROUP BY id_a, id_b
    HAVING COUNT(DISTINCT fp) >= 10
    """,
)
def q280_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup of a new document batch against the
    already-deduped historical corpus (docs with id%10 ≥ 8 play the new
    batch): winnowing candidate pairs where at least one side is new —
    hist×hist pairs, yesterday's quadratic work, are never generated.
    The daily-ingest shape every production dedup pipeline runs; at
    100 TB the historical fingerprint index is a saved table and only
    the |index| × |new-batch| join remains. Deterministic fingerprints
    make the whole incremental family fully oracle-checkable (unlike
    MinHash).
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_incremental_pairs,
    )

    docs = load(spark, sf_dir, "documents").withColumn(
        "_is_new", (F.col("doc_id") % 10) >= 8
    )
    return winnow_incremental_pairs(docs, "doc_id", "text", "_is_new")


@register(
    "q281_contrastive_chunk_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    s AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
    chunks AS (
      SELECT doc_id,
             CAST(start // 48 AS INT) AS chunk_idx,
             array_to_string(w[start + 1 : LEAST(start + 64, n)], ' ') AS chunk_text
      FROM (SELECT doc_id, w, n, UNNEST(range(0, n, 48)) AS start FROM s)
    )
    SELECT a.doc_id AS doc_id, a.chunk_idx AS anchor_idx,
           a.chunk_text AS anchor_text, p.chunk_text AS positive_text
    FROM chunks a JOIN chunks p
      ON p.doc_id = a.doc_id AND p.chunk_idx = a.chunk_idx + 1
    """,
)
def q281_contrastive_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair construction for embedding models
    (SimCSE/DPR-style in-document positives): adjacent overlapping
    chunks of the same document form (anchor, positive) pairs;
    in-batch negatives come free at training time, so the data job only
    has to emit aligned positives. Chunk grid is the q261 shape
    (64-token windows, stride 48) built row-locally with
    sequence+explode; pairing is a (doc_id, idx+1) EQUI self-join —
    one hash shuffle on doc_id, no window, no per-doc sort.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select("doc_id", toks.alias("w"), F.size(toks).alias("n")).filter(
        F.col("n") > 0
    )
    chunks = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(48))
        ).alias("start"),
        "w",
        "n",
    ).select(
        "doc_id",
        (F.col("start") / 48).cast("int").alias("chunk_idx"),
        F.array_join(
            F.slice(
                "w",
                F.col("start") + 1,
                F.least(F.lit(64), F.col("n") - F.col("start")),
            ),
            " ",
        ).alias("chunk_text"),
    )
    a = chunks.alias("a")
    p = chunks.alias("p")
    return a.join(
        p,
        (F.col("p.doc_id") == F.col("a.doc_id"))
        & (F.col("p.chunk_idx") == F.col("a.chunk_idx") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.chunk_idx").alias("anchor_idx"),
        F.col("a.chunk_text").alias("anchor_text"),
        F.col("p.chunk_text").alias("positive_text"),
    )


@register(
    "q282_bm25_hard_negatives",
    allow_non_equi="inherits _bm25_scored's documented 1-row corpus-stats broadcast cross join (same as q218/q223/q227)",
    oracle=_BM25_SQL_BASE
    + """,
    pos AS (
      SELECT doc_id, score_micro,
             ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rk
      FROM scored
      WHERE tf_spark > 0 AND tf_join > 0 AND tf_window > 0
    ), neg AS (
      SELECT doc_id, score_micro,
             ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rk
      FROM scored
      WHERE NOT (tf_spark > 0 AND tf_join > 0 AND tf_window > 0)
    )
    SELECT CAST(p.rk AS BIGINT) AS rank,
           p.doc_id AS positive_id, p.score_micro AS positive_score_micro,
           n.doc_id AS negative_id, n.score_micro AS negative_score_micro
    FROM pos p JOIN neg n ON n.rk = p.rk
    WHERE p.rk <= 5 AND n.rk <= 5
    """,
)
def q282_bm25_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training (DPR/ANCE data prep):
    the top-5 fully-matching documents (every query term present) are
    positives; the top-5 highest-BM25 docs that do NOT match all terms
    are the hard negatives — lexically close, semantically non-relevant,
    exactly the pairs that make a dual-encoder learn. Rank r positive
    pairs with rank r negative → 5 training triplets for the fixed
    query.

    The corpus-sized work is the shared BM25 projection (q218's
    integer-micro scoring); both top-5s are TakeOrdered (never a global
    sort), and the rank-alignment join runs on two 5-row sides.
    """
    scored = _bm25_scored(spark, sf_dir)
    all_match = (
        (F.col("tf_spark") > 0) & (F.col("tf_join") > 0) & (F.col("tf_window") > 0)
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    pos = (
        scored.filter(all_match)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(5)
        .withColumn("rank", F.row_number().over(w))
    )
    neg = (
        scored.filter(~all_match)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(5)
        .withColumn("rank", F.row_number().over(w))
    )
    return pos.alias("p").join(neg.alias("n"), "rank").select(
        F.col("rank").cast("long").alias("rank"),
        F.col("p.doc_id").alias("positive_id"),
        F.col("p.score_micro").alias("positive_score_micro"),
        F.col("n.doc_id").alias("negative_id"),
        F.col("n.score_micro").alias("negative_score_micro"),
    )


# ---------------------------------------------------------------------------
# Scale/storage operators: Z-order layout, Bloom join pruning, Count-Min,
# watermark sizing (q283-q286)
# ---------------------------------------------------------------------------


def _morton_sql(xe: str, ye: str, bits: int) -> str:
    """DuckDB rendering of functions/spatial.py morton_key (x even bits)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xe}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({ye}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "q283_zorder_layout_audit",
    oracle=_COORDS_CTE
    + f"""
    , q AS (
      SELECT LEAST(CAST(FLOOR((lon + 180.0)/360.0*256) AS BIGINT), 255) AS lon_q,
             LEAST(CAST(FLOOR((lat + 90.0)/180.0*256) AS BIGINT), 255) AS lat_q
      FROM coords
    ), z AS (
      SELECT lon_q, lat_q, ({_morton_sql("lon_q", "lat_q", 8)}) >> 8 AS zbucket
      FROM q
    )
    SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(lat_q) AS min_lat_q, MAX(lat_q) AS max_lat_q,
           MIN(lon_q) AS min_lon_q, MAX(lon_q) AS max_lon_q,
           (MAX(lat_q) - MIN(lat_q) + 1) * (MAX(lon_q) - MIN(lon_q) + 1)
             AS cell_span
    FROM z GROUP BY zbucket
    """,
)
def q283_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit — the layout that makes 2-D
    data skipping work at 100 TB. Coordinates are quantized to an 8-bit
    grid, bit-interleaved into a 16-bit z-value (``morton_key``, a pure
    column expression), and rows are grouped by the z-value's top 8 bits
    — exactly the rows one z-ordered file would hold. The per-bucket
    lat/lon min-max spans ARE the parquet zone maps such a file would
    publish: ``cell_span`` stays a tight square (≤ 16×16 cells per
    bucket) instead of a full-width stripe, which is why a z-sorted
    write (``repartitionByRange(zkey) + sortWithinPartitions(zkey)``)
    lets BOTH a lat predicate and a lon predicate prune files, where a
    lat-major sort prunes only one. One hash aggregation; the key math
    is whole-stage-codegen'd."""
    from noaa_ais_glue_lakehouse_spark.functions.spatial import morton_key

    ev = _with_coords(load(spark, sf_dir, "events"))
    lon_q = F.least(
        F.floor((F.col("lon") + 180.0) / 360.0 * 256).cast("long"), F.lit(255)
    )
    lat_q = F.least(
        F.floor((F.col("lat") + 90.0) / 180.0 * 256).cast("long"), F.lit(255)
    )
    q = ev.select(lon_q.alias("lon_q"), lat_q.alias("lat_q"))
    z = q.select(
        "lon_q",
        "lat_q",
        F.shiftright(
            morton_key(F.col("lon_q"), F.col("lat_q"), 8), 8
        ).alias("zbucket"),
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("lat_q").alias("min_lat_q"),
        F.max("lat_q").alias("max_lat_q"),
        F.min("lon_q").alias("min_lon_q"),
        F.max("lon_q").alias("max_lon_q"),
        (
            (F.max("lat_q") - F.min("lat_q") + 1)
            * (F.max("lon_q") - F.min("lon_q") + 1)
        ).alias("cell_span"),
    )


def _bloom_oracle(m: int, k: int) -> str:
    from noaa_ais_glue_lakehouse_spark.operators.sketches import hash_pos_sql

    return f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS x FROM orders),
    hs AS (SELECT UNNEST(range({k})) AS i),
    bits AS (
      SELECT DISTINCT {hash_pos_sql("x", "i", m)} AS bitpos FROM keys, hs
    ),
    probe AS (
      SELECT c_custkey, i, {hash_pos_sql("c_custkey", "i", m)} AS bitpos
      FROM customer, hs
    ),
    pass AS (
      SELECT c_custkey FROM probe JOIN bits USING (bitpos)
      GROUP BY c_custkey HAVING COUNT(DISTINCT i) = {k}
    ),
    truth AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN p.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN t.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_orders,
           CAST(SUM(CASE WHEN p.c_custkey IS NOT NULL AND t.o_custkey IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM customer c
    LEFT JOIN pass p ON p.c_custkey = c.c_custkey
    LEFT JOIN truth t ON t.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """


@register("q284_bloom_filter_join", oracle=_bloom_oracle(65536, 3))
def q284_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning audit (runtime row-level filtering, the
    trick behind Spark's own `spark.sql.optimizer.runtime.bloomFilter`):
    a Bloom filter over the orders build side is materialized as its SET
    bit positions — a relation bounded by m_bits (65536 rows max)
    regardless of build-side row count, so it broadcasts even when the
    build side is 100 TB — and customers probe it with k deterministic
    hashes (a broadcast equi-join + count(distinct i)=k). Per market
    segment: how many probe rows the Bloom pass admits vs the exact
    semi-join truth, and the false-positive overhead the m/k geometry
    costs. No false negative is possible (CM/Bloom guarantee — the same
    integer hash family runs in the DuckDB oracle, making a
    probabilistic structure exactly checkable)."""
    from noaa_ais_glue_lakehouse_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_probe,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    bits = bloom_bit_positions(orders.select("o_custkey"), "o_custkey", 65536, 3)
    probed = bloom_probe(customer, "c_custkey", bits, 65536, 3)
    truth = (
        orders.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_orders", F.lit(1))
    )
    flagged = probed.join(F.broadcast(truth), "c_custkey", "left")
    return flagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("has_orders").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_orders"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("has_orders").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    )


def _cms_oracle(depth: int, width: int) -> str:
    from noaa_ais_glue_lakehouse_spark.operators.sketches import hash_pos_sql

    return f"""
    WITH hs AS (SELECT UNNEST(range({depth})) AS i),
    cells AS (
      SELECT i, {hash_pos_sql("user_id", "i", width)} AS pos,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events, hs GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM events GROUP BY 1
    ),
    keyed AS (
      SELECT u.user_id, hs.i,
             {hash_pos_sql("u.user_id", "hs.i", width)} AS pos
      FROM exact u, hs
    ),
    est AS (
      SELECT user_id, CAST(MIN(COALESCE(n, 0)) AS BIGINT) AS est_count
      FROM keyed LEFT JOIN cells USING (i, pos) GROUP BY user_id
    )
    SELECT e.user_id, e.est_count, x.exact_count,
           e.est_count - x.exact_count AS overestimate
    FROM est e JOIN exact x USING (user_id)
    ORDER BY e.est_count DESC, e.user_id LIMIT 10
    """


@register("q285_countmin_heavy_hitters", oracle=_cms_oracle(4, 2048))
def q285_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: the sketch is built as a (i, pos, n)
    relation of at most depth×width = 8192 rows — one map-side-combined
    hash aggregation over the stream, mergeable across shards/days by
    summing n — then each candidate key is point-estimated by the MIN of
    its depth cells via a broadcast equi-join. Top-10 users by estimated
    frequency, with the exact count and the CM overestimate attached
    (est ≥ exact always; the one-sided error is pinned in
    tests/test_sketches.py). The deterministic cross-engine hash family
    is what lets an approximate structure sit under the exact hash
    gate."""
    from noaa_ais_glue_lakehouse_spark.operators.sketches import (
        count_min_cells,
        count_min_estimate,
    )

    ev = load(spark, sf_dir, "events")
    cells = count_min_cells(ev.select("user_id"), "user_id", 4, 2048)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    est = count_min_estimate(exact.select("user_id"), "user_id", cells, 4, 2048)
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("est_count").desc(), "user_id")
        .limit(10)
    )


@register(
    "q286_watermark_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT user_id, ts, epoch_us(ts) AS ts_us,
             MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max_us
      FROM events
    ), late AS (
      SELECT user_id,
             GREATEST(0, COALESCE(prev_max_us - ts_us, 0)) AS late_us
      FROM arr
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us,
           CAST(SUM(late_us) AS BIGINT) AS total_late_us
    FROM late GROUP BY user_id
    """,
)
def q286_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the measurement that SIZES a streaming
    watermark instead of guessing it. Arrival order is the ingest-
    monotone event_id; an event is late by (running max event-time seen
    before it) − (its own event-time), clamped at 0 — the exact quantity
    `withWatermark` must exceed for the event not to be dropped. Per
    user: event count, late count, worst lateness, total lateness (µs,
    exact integer arithmetic). One window (prefix max over arrival
    order, single hash-partition shuffle on user_id) + one aggregation —
    the same shape at any scale."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(
        F.lit(0),
        F.coalesce(
            F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"),
            F.lit(0),
        ),
    )
    late = ev.select("user_id", late_us.alias("late_us"))
    return late.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.max("late_us").cast("long").alias("max_late_us"),
        F.sum("late_us").cast("long").alias("total_late_us"),
    )


# ---------------------------------------------------------------------------
# Rank statistics, link prediction, interval coverage, path mining
# (q287-q290)
# ---------------------------------------------------------------------------


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
    "q288_adamic_adar_linkpred",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    deg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS d FROM ut GROUP BY user_id
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_common_users,
           CAST(SUM(CAST(ROUND(1000000.0 / LN(CAST(g.d AS DOUBLE))) AS BIGINT))
                AS BIGINT) AS aa_score_micro
    FROM ut a
    JOIN ut b ON b.user_id = a.user_id AND a.event_type < b.event_type
    JOIN deg g ON g.user_id = a.user_id
    WHERE g.d >= 2
    GROUP BY 1, 2
    """,
)
def q288_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the user/event-type bipartite
    graph: score(t1,t2) = Σ over common users of 1/ln(user degree) —
    rare shared neighbors count more than promiscuous ones. Per-term
    scores are rounded to integer micro-units BEFORE summation so the
    float total is order-independent under the exact hash gate. The
    self-join explodes per-user type pairs — bounded by |types|² per
    user (types is a small domain), the standard wedge-enumeration
    shape; one shuffle on user_id, one on the pair."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    deg = ut.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    )
    term = F.round(F.lit(1_000_000.0) / F.log(F.col("d").cast("double"))).cast("long")
    return (
        pairs.join(deg.filter(F.col("d") >= 2), "user_id")
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common_users"),
            F.sum(term).cast("long").alias("aa_score_micro"),
        )
    )


@register(
    "q289_interval_union_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), -1) THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island_id
      FROM flagged
    ), merged AS (
      SELECT user_id, island_id, MIN(s) AS si, MAX(e) AS ei
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(ei - si) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def q289_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user (each event opens a 5-minute
    activity interval; overlaps merge): the island technique — a prefix
    max over interval ends marks each interval that starts past
    everything seen before as a new island, a prefix sum numbers the
    islands, and per-island min(start)/max(end) give the merged spans.
    Two windows + two aggregations, all partitioned on user_id, exact µs
    integers throughout. The same shape computes SLA uptime, sensor
    coverage, and ad-exposure time at any scale."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("si"), F.max("e").alias("ei")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("ei") - F.col("si")).cast("long").alias("covered_us"),
    )


@register(
    "q290_session_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             LEAD(event_type, 1) OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id
             ) AS t2,
             LEAD(event_type, 2) OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id
             ) AS t3
      FROM events
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """,
)
def q290_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral trigrams (3-step event-type paths within a
    user-day): two LEADs over one (user, day)-partitioned window — the
    sequence-mining shape that needs no self-join because consecutive
    steps are adjacency, not equi-match. TakeOrdered top-k; tiebreak on
    the path string keeps the cut deterministic."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Text-analysis widening: readability, tokenizer fertility, curriculum
# staging, blocklist screening (q291-q294)
# ---------------------------------------------------------------------------


@register(
    "q291_flesch_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      1) AS n_sentences
      FROM documents
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           ROUND(206.835
                 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
                 - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 4)
             AS flesch
    FROM m WHERE n_words > 0
    """,
)
def q291_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with the classic no-dictionary
    syllable heuristic (a syllable ≈ one contiguous vowel-group
    [aeiouy]+; sentences ≈ terminal-punctuation runs, floored at 1).
    The difficulty signal readability-based curation filters (child-
    safe corpora, ELI5-style selection) run at corpus scale: three
    regexp counts per row — pure codegen projection, no shuffle at
    all."""
    docs = load(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_words = F.size(F.regexp_extract_all(lower, F.lit("[a-z]+"), F.lit(0))).cast("long")
    n_syll = F.size(F.regexp_extract_all(lower, F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))).cast("long"),
        F.lit(1),
    )
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        n_sent.alias("n_sentences"),
    ).filter(F.col("n_words") > 0)
    return m.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_sentences",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * F.col("n_words").cast("double") / F.col("n_sentences")
            - F.lit(84.6) * F.col("n_syllables").cast("double") / F.col("n_words"),
            4,
        ).alias("flesch"),
    )


@register(
    "q292_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6)
             AS chars_per_token
    FROM t WHERE n_words > 0 GROUP BY lang
    """,
)
def q292_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — subword tokens per whitespace
    word and characters per token, THE per-language cost model for a
    multilingual token budget (a high-fertility language pays more
    context window per word; the metric that drives per-language
    sampling corrections in multilingual pretraining). Integer token
    counts are summed exactly per language; the two ratios divide once
    at the end. Pure projection + one small aggregation."""
    from noaa_ais_glue_lakehouse_spark.functions.text import bpe_ish_tokens

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select(
        "lang",
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("n_bpe"),
        F.size(toks).cast("long").alias("n_words"),
        "n_chars",
    ).filter(F.col("n_words") > 0)
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("total_bpe"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(
            F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
        ).alias("chars_per_token"),
    )


@register(
    "q293_curriculum_stages",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the corpus-count scalar attached to the prefix-scan rank column for the NTILE(4) formula",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words,
             n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id, source, n_words,
             CAST(ROUND(1000000.0 * n_chars / n_words) AS BIGINT)
               AS difficulty_micro
      FROM d WHERE n_words > 0
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY difficulty_micro, doc_id) AS rk,
             COUNT(*) OVER () AS n_total
      FROM scored
    )
    SELECT CAST(FLOOR((rk - 1) * 4.0 / n_total) AS INT) + 1 AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(MIN(difficulty_micro) AS BIGINT) AS min_difficulty_micro,
           CAST(MAX(difficulty_micro) AS BIGINT) AS max_difficulty_micro
    FROM ranked GROUP BY 1
    """,
)
def q293_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: documents ordered easy→hard by mean word
    length (integer micros) and cut into 4 equal-count training stages —
    the data-side half of curriculum learning (feed stage 1 first, then
    widen). The global position comes from the two-phase parallel prefix
    scan (global_running_sum of 1 — never a single-task window over the
    corpus), and the corpus count rides a deliberate 1-row broadcast
    cross join; the stage formula floor((rank-1)·4/N)+1 reproduces
    NTILE(4) exactly for every N."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        "n_chars",
    ).filter(F.col("n_words") > 0)
    scored = scored.withColumn(
        "difficulty_micro",
        F.round(F.lit(1_000_000.0) * F.col("n_chars") / F.col("n_words")).cast(
            "long"
        ),
    )
    ranked = global_running_sum(
        scored.withColumn("_one", F.lit(1)),
        ["difficulty_micro", "doc_id"],
        "_one",
        out_col="rk",
    )
    # count the PRE-scan relation (row-count-preserving scan; counting
    # `ranked` would re-run the repartitionByRange + window pipeline)
    total = scored.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    staged = ranked.crossJoin(F.broadcast(total)).withColumn(
        "stage",
        (
            F.floor((F.col("rk") - 1) * 4.0 / F.col("n_total")).cast("int") + 1
        ),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.min("difficulty_micro").cast("long").alias("min_difficulty_micro"),
        F.max("difficulty_micro").cast("long").alias("max_difficulty_micro"),
    )


_BLOCKLIST = {
    "latency": ["slow", "big"],
    "vendor": ["spark", "hash"],
    "pii": ["customer", "key"],
}


@register(
    "q294_blocklist_screen",
    oracle="""
    WITH terms AS (
      SELECT * FROM (VALUES
        ('latency', 'slow'), ('latency', 'big'),
        ('vendor', 'spark'), ('vendor', 'hash'),
        ('pii', 'customer'), ('pii', 'key')
      ) t(category, term)
    ), toks AS (
      SELECT doc_id, source,
             UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')))
               AS tok
      FROM documents
    ), hits AS (
      SELECT DISTINCT t.doc_id, t.source, m.category
      FROM toks t JOIN terms m ON m.term = t.tok
    ), perdoc AS (
      SELECT d.doc_id, d.source,
             COALESCE(h.n_categories, 0) AS n_categories
      FROM documents d
      LEFT JOIN (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_categories
        FROM hits GROUP BY doc_id
      ) h ON h.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_categories > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN n_categories >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_category
    FROM perdoc GROUP BY source
    """,
)
def q294_blocklist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category blocklist screening (safety/PII term taxonomy → per-doc
    category hits → per-source flag rates) — the filter stage every
    production corpus runs before training. Token-exact matching (never
    substring: 'key' must not flag 'monkey'): the doc's DISTINCT token
    set explodes once and equi-joins the broadcast taxonomy; per-doc
    distinct categories then roll up to source-level flagged /
    multi-category counts. Left join keeps zero-hit docs in the
    denominator. Swap the VALUES taxonomy for a real one (CSAM/PII/
    toxicity lists) without touching the plan."""
    docs = load(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        [(c, t) for c, ts in _BLOCKLIST.items() for t in ts],
        ["category", "term"],
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(terms), toks.tok == terms.term)
        .select("doc_id", "category")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_categories"))
    )
    perdoc = docs.select("doc_id", "source").join(hits, "doc_id", "left").select(
        "source", F.coalesce("n_categories", F.lit(0)).alias("n_categories")
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_categories") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("n_categories") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_category"),
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H join/agg shapes expressible on these tables:
# Q3, Q5, Q8, Q10, Q14 (q295-q299)
# ---------------------------------------------------------------------------


@register(
    "q295_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           o.o_orderdate AS orderdate, o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue_cents DESC, orderkey LIMIT 10
    """,
)
def q295_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): the classic 3-way sel-join-agg —
    segment-filtered customers broadcast into orders, date predicates
    pushed to BOTH fact scans before the orderkey join, revenue in exact
    integer cents, top-10 via TakeOrdered (never a global sort). The
    shape AQE loves: both filters are scan-level PushedFilters, and the
    customer side collapses to a broadcast."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue_cents")
        )
        .select("orderkey", "revenue_cents", "orderdate", "orderpriority")
        .orderBy(F.col("revenue_cents").desc(), "orderkey")
        .limit(10)
    )


@register(
    "q296_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q296_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue where the supplier and
    the customer share a nation inside one region — the 6-way star whose
    selective dims (nation⋈region, supplier) all broadcast, leaving the
    orders⋈lineitem hash join as the only real shuffle. The
    same-nation condition rides the supplier join (equi on BOTH keys),
    never a post-join filter."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (supp.s_suppkey == li.l_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nr), nr.n_nationkey == supp.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue_cents")
        )
    )


@register(
    "q297_national_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS vol_cents,
             sn.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol_cents
                         ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(SUM(vol_cents) AS BIGINT) AS market_cents,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol_cents
                              ELSE 0 END) AS DOUBLE)
                 / SUM(vol_cents), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q297_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): of all PROMO-part revenue sold
    into the AMERICA region's market, what fraction came from NATION_7
    suppliers, per year — the conditional-sum-over-star shape. The share
    is a single pass (CASE inside SUM, no self-join of the market
    against itself); every dim broadcasts; the only big shuffle is
    lineitem⋈orders."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nat.alias("cn").join(
        F.broadcast(reg), F.col("cn.n_regionkey") == reg.r_regionkey
    )
    sn = nat.alias("sn")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(cn), F.col("cn.n_nationkey") == cust.c_nationkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn.n_nationkey") == supp.s_nationkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "vol_cents"
            ),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("vol_cents")).otherwise(0)
    ).cast("long")
    return vol.groupBy("o_year").agg(
        nation_cents.alias("nation_cents"),
        F.sum("vol_cents").cast("long").alias("market_cents"),
        F.round(
            nation_cents.cast("double") / F.sum("vol_cents"), 6
        ).alias("mkt_share"),
    )


@register(
    "q298_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           n.n_name AS nation, c.c_acctbal AS acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue_cents DESC, custkey LIMIT 20
    """,
)
def q298_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue in a quarter — returnflag filter pushed to the lineitem
    scan, date filter to orders, nation broadcast, one hash aggregation
    on the customer grain, top-20 TakeOrdered."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue_cents")
        )
        .select("custkey", "name", "revenue_cents", "nation", "acctbal")
        .orderBy(F.col("revenue_cents").desc(), "custkey")
        .limit(20)
    )


@register(
    "q299_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                         * 100) AS BIGINT) ELSE 0 END)
                 / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                       * 100) AS BIGINT)), 6) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q299_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO parts' share of one month's
    shipped revenue — conditional sum over a broadcast part join, month
    predicate pushed to the lineitem scan, exact cents inside both the
    numerator and the denominator, one division at the end."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    )
    return j.agg(
        F.round(F.lit(100.0) * promo / F.sum(rev), 6).alias("promo_pct"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# RL-data prep, batching efficiency, entropy filtering, chunk stitching,
# exact global percentiles (q300-q304)
# ---------------------------------------------------------------------------


@register(
    "q300_grpo_advantages",
    oracle="""
    WITH g AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS r_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s1,
             SUM(CAST(ROUND(value * 100) AS BIGINT)
                 * CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
    )
    SELECT event_id,
           ROUND(CASE WHEN n >= 2 AND n*s2 > s1*s1 THEN
             (n*r_cents - s1)
             / SQRT(CAST(n AS DOUBLE)) / SQRT(CAST(n*s2 - s1*s1 AS DOUBLE))
           ELSE 0.0 END, 6) AS advantage
    FROM g
    """,
)
def q300_grpo_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage normalization (the GRPO/RLOO data-prep
    step: per prompt-group, advantage = (r − mean)/std over the group's
    sampled completions — here user-day groups standing in for
    prompt-groups, value for reward). Computed from exact integer-cent
    moment sums via one partitioned window — the algebra
    (n·r − S₁)/(√n·√(n·S₂ − S₁²)) divides integer determinants once, so
    no running float accumulates and the result is order-independent.
    Degenerate groups (n<2 or zero variance) emit 0, matching the
    RL-trainer convention of skipping constant-reward groups."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts"))
    r = cents(F.col("value"))
    g = ev.select(
        "event_id",
        r.alias("r_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum(r).over(w).alias("s1"),
        F.sum(r * r).over(w).alias("s2"),
    )
    var_det = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    adv = (
        (F.col("n") * F.col("r_cents") - F.col("s1"))
        / F.sqrt(F.col("n").cast("double"))
        / F.sqrt(var_det.cast("double"))
    )
    return g.select(
        "event_id",
        F.round(
            F.when((F.col("n") >= 2) & (var_det > 0), adv).otherwise(0.0), 6
        ).alias("advantage"),
    )


@register(
    "q301_padding_waste_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), b AS (
      SELECT n_tokens,
             CAST(POWER(2, CEIL(LOG2(GREATEST(n_tokens, 1)))) AS BIGINT)
               AS bucket
      FROM d WHERE n_tokens > 0
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           ROUND(1.0 - CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * bucket), 6)
             AS waste_frac
    FROM b GROUP BY bucket
    """,
)
def q301_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching: sequences are
    rounded up to power-of-2 length buckets (the kernel-friendly
    static-shape scheme) and each bucket reports the fraction of
    compute that pads instead of trains — the number you compare against
    q251's packed layout to justify sequence packing. Pure projection +
    one aggregation; the bucket is integer bit math, no UDF."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select(F.size(toks).cast("long").alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1))))
    ).cast("long")
    b = d.select("n_tokens", bucket.alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("real_tokens"),
        (F.count(F.lit(1)) * F.col("bucket")).cast("long").alias("padded_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.col("bucket")),
            6,
        ).alias("waste_frac"),
    )


@register(
    "q302_doc_entropy_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2, 3
    ), dn AS (
      SELECT doc_id, SUM(c) AS dn_total FROM tf GROUP BY doc_id
    ), terms AS (
      SELECT tf.doc_id, tf.source, tf.c, dn.dn_total,
             CAST(ROUND(-1000000.0 * tf.c
                  * LN(CAST(tf.c AS DOUBLE) / dn.dn_total)
                  / LN(2.0)) AS BIGINT) AS t_micro
      FROM tf JOIN dn USING (doc_id)
    ), tot AS (
      SELECT doc_id, source, MAX(dn_total) AS n, SUM(t_micro) AS w_micro
      FROM terms GROUP BY doc_id, source
    ), ent AS (
      SELECT doc_id, source,
             CAST(ROUND(CAST(w_micro AS DOUBLE) / n) AS BIGINT)
               AS entropy_micro
      FROM tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN entropy_micro < 3000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy,
           CAST(MIN(entropy_micro) AS BIGINT) AS min_entropy_micro,
           CAST(MAX(entropy_micro) AS BIGINT) AS max_entropy_micro
    FROM ent GROUP BY source
    """,
)
def q302_doc_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document token-entropy filter (low-entropy docs are
    boilerplate/keyword-stuffing/degenerate repetition — the classic
    cheap quality gate next to Gopher rules q106): per doc, Shannon
    entropy of its own token distribution in bits, micro-rounded per
    TERM before the sum so the float total is order-independent, then
    per-source counts under the 3-bit threshold. One explode + two hash
    aggregations, all keyed on doc_id — embarrassingly parallel."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(tokenize(F.col("text"))).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wdoc = Window.partitionBy("doc_id")
    n_doc = F.sum("c").over(wdoc)
    term_micro = F.round(
        F.lit(-1_000_000.0)
        * F.col("c")
        * F.log(F.col("c").cast("double") / n_doc)
        / F.log(F.lit(2.0))
    ).cast("long")
    tot = tf.select(
        "doc_id", "source", F.col("c"), term_micro.alias("t_micro")
    ).groupBy("doc_id", "source").agg(
        F.sum("c").alias("n"), F.sum("t_micro").alias("w_micro")
    )
    ent = tot.select(
        "source",
        F.round(F.col("w_micro").cast("double") / F.col("n"))
        .cast("long")
        .alias("entropy_micro"),
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("entropy_micro") < 3_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_low_entropy"),
        F.min("entropy_micro").cast("long").alias("min_entropy_micro"),
        F.max("entropy_micro").cast("long").alias("max_entropy_micro"),
    )


@register(
    "q303_chunk_stitch_detect",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), edges AS (
      SELECT doc_id,
             array_to_string(w[1:8], ' ') AS head8,
             array_to_string(w[GREATEST(len(w) - 7, 1):len(w)], ' ') AS tail8,
             len(w) AS n
      FROM t WHERE len(w) >= 8
    )
    SELECT a.doc_id AS tail_doc, b.doc_id AS head_doc,
           a.tail8 AS boundary_text
    FROM edges a JOIN edges b
      ON b.head8 = a.tail8 AND b.doc_id <> a.doc_id
    """,
)
def q303_chunk_stitch_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document stitching detector: if doc A's last 8 tokens equal
    doc B's first 8 tokens, A and B are almost certainly fragments of
    one original (the artifact a fixed-size chunker leaves at shard
    boundaries) and should be re-joined before dedup/training. One
    projection computes each doc's head/tail 8-gram; detection is a
    fingerprint EQUI-join (hash shuffle on the 8-gram), never a
    pairwise scan — the q216/q49 fingerprint idiom applied to document
    boundaries."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select("doc_id", toks.alias("w"), F.size(toks).alias("n"))
    edges = t.filter(F.col("n") >= 8).select(
        "doc_id",
        F.array_join(F.slice("w", 1, 8), " ").alias("head8"),
        F.array_join(
            F.slice("w", F.greatest(F.col("n") - 7, F.lit(1)), 8), " "
        ).alias("tail8"),
    )
    a = edges.alias("a")
    b = edges.alias("b")
    return a.join(
        b,
        (F.col("b.head8") == F.col("a.tail8"))
        & (F.col("b.doc_id") != F.col("a.doc_id")),
    ).select(
        F.col("a.doc_id").alias("tail_doc"),
        F.col("b.doc_id").alias("head_doc"),
        F.col("a.tail8").alias("boundary_text"),
    )


@register(
    "q304_exact_global_percentiles",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join (corpus count) + 3-row broadcast percentile spine on a non-equi rank pick",
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
             event_id,
             ROW_NUMBER() OVER (ORDER BY CAST(ROUND(value * 100) AS BIGINT),
                                event_id) AS rk,
             COUNT(*) OVER () AS n
      FROM events
    )
    SELECT p, CAST(v_cents AS BIGINT) AS value_cents
    FROM v
    JOIN (VALUES (50), (90), (99)) q(p)
      ON rk = CAST(CEIL(p * n / 100.0) AS BIGINT)
    """,
)
def q304_exact_global_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global p50/p90/p99 without a single-task sort: the global
    position of every row comes from the two-phase parallel prefix scan
    (global_running_sum of 1 over the (value, id) total order), the row
    count rides the same deliberate 1-row broadcast as q293, and the
    three percentile rows are picked by rank = ceil(p·n/100) — the
    nearest-rank definition. The exact complement to q63's sketch
    quantiles: same answer shape, zero approximation, still
    shuffle-parallel."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    ev = load(spark, sf_dir, "events")
    v = ev.select(
        cents(F.col("value")).alias("v_cents"), "event_id"
    ).withColumn("_one", F.lit(1))
    ranked = global_running_sum(v, ["v_cents", "event_id"], "_one", out_col="rk")
    # count the PRE-scan relation: global_running_sum preserves row count,
    # and counting its output would re-execute the whole two-phase scan
    total = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    withn = ranked.crossJoin(F.broadcast(total))
    ps = spark.createDataFrame([(50,), (90,), (99,)], ["p"])
    return withn.join(
        F.broadcast(ps),
        F.col("rk") == F.ceil(F.col("p") * F.col("n") / 100.0).cast("long"),
    ).select("p", F.col("v_cents").cast("long").alias("value_cents"))


# ---------------------------------------------------------------------------
# Training-data planning: data-constrained epochs, shard balance, OOV,
# truncation, timestamp delta compression (q305-q309)
# ---------------------------------------------------------------------------


@register(
    "q305_data_constrained_epochs",
    oracle="""
    WITH s AS (
      SELECT source,
             SUM(CAST(len(list_filter(string_split_regex(lower(trim(text)),
                 '\\s+'), x -> x <> '')) AS BIGINT)) AS unique_tokens
      FROM documents GROUP BY source
    )
    SELECT source, unique_tokens,
           ROUND(50000.0 / unique_tokens, 6) AS epochs,
           CAST(ROUND(1000000.0 *
                (1 - EXP(-(50000.0 / unique_tokens) / 2.5)) * 2.5
                * unique_tokens / 50000.0) AS BIGINT)
             AS effective_frac_micro
    FROM s
    """,
)
def q305_data_constrained_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained scaling plan (the Muennighoff et al. 2023 shape,
    public paper): per source, how many EPOCHS a 50k-token training
    budget implies over its unique tokens, and the effective-data
    fraction under exponentially-decaying repeated-token value
    (R* ≈ 2.5 half-value epochs): effective/budget =
    (1 − e^(−epochs/R*))·R*/epochs. The report that says "source X is
    about to be repeated 14× — its marginal tokens are worth 11% of
    fresh ones; go find more data". One token-count aggregation; the
    decay algebra is a closed-form projection over |sources| rows."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    s = docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("unique_tokens")
    )
    epochs = F.lit(50000.0) / F.col("unique_tokens")
    eff = (
        (F.lit(1.0) - F.exp(-epochs / F.lit(2.5)))
        * F.lit(2.5)
        * F.col("unique_tokens")
        / F.lit(50000.0)
    )
    return s.select(
        "source",
        "unique_tokens",
        F.round(epochs, 6).alias("epochs"),
        F.round(F.lit(1_000_000.0) * eff).cast("long").alias(
            "effective_frac_micro"
        ),
    )


@register(
    "q306_shard_balance_audit",
    oracle="""
    WITH sh AS (
      SELECT CAST((doc_id * 2654435761 + 1013904223) % 4294967291 % 16
                  AS BIGINT) AS shard,
             n_chars,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), per AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS shard_chars
      FROM sh GROUP BY shard
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(shard_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(shard_tokens) AS BIGINT) AS max_tokens,
           ROUND(CAST(MAX(shard_tokens) AS DOUBLE) * COUNT(*)
                 / SUM(shard_tokens), 6) AS straggler_factor
    FROM per
    """,
)
def q306_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard balance audit: docs hash-assigned to 16 shards
    (the same deterministic affine hash family as q284/q285), then the
    straggler factor — max shard's token load relative to perfect
    balance — which IS the step-time multiplier a synchronous data-
    parallel job pays (every rank waits for the heaviest shard). Two
    hash aggregations; at 10⁹ docs identical shape. >1.05 straggler
    factor on token-weighted shards means switch doc-count sharding to
    token-budget packing (q270's epoch shards)."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    shard = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223))
        % F.lit(4294967291)
        % F.lit(16)
    ).cast("long")
    sh = docs.select(
        shard.alias("shard"),
        "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
    )
    per = sh.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.sum("n_chars").cast("long").alias("shard_chars"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.min("shard_tokens").cast("long").alias("min_tokens"),
        F.max("shard_tokens").cast("long").alias("max_tokens"),
        F.round(
            F.max("shard_tokens").cast("double")
            * F.count(F.lit(1))
            / F.sum("shard_tokens"),
            6,
        ).alias("straggler_factor"),
    )


@register(
    "q307_vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= 32
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY source
    """,
)
def q307_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against a frequency-built
    vocabulary (top-32 corpus tokens standing in for a fixed tokenizer
    vocab): the coverage check run before committing a tokenizer to a
    corpus — a source with high OOV will fragment into bytes/UNKs and
    train badly. The vocab is a TakeOrdered top-k (deterministic
    tiebreak) that BROADCASTS into the token stream; counting is one
    aggregation. At a 100k-entry real vocab the same broadcast join
    holds (megabytes)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(32)
        .select("tok")
        .withColumn("in_vocab", F.lit(1))
    )
    j = toks.join(F.broadcast(vocab), "tok", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


@register(
    "q308_truncation_loss_audit",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens > 128 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(SUM(GREATEST(n_tokens - 128, 0)) AS BIGINT) AS tokens_lost,
           ROUND(CAST(SUM(GREATEST(n_tokens - 128, 0)) AS DOUBLE)
                 / SUM(n_tokens), 6) AS loss_frac
    FROM d GROUP BY source
    """,
)
def q308_truncation_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-loss audit at max_seq_len=128: per source, how many
    documents overflow the context window and what fraction of their
    tokens a hard truncation throws away — the number that decides
    between truncate / chunk (q261) / pack (q251) for each source.
    Pure projection + one aggregation."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select(
        "source", F.size(toks).cast("long").alias("n_tokens")
    )
    lost = F.greatest(F.col("n_tokens") - 128, F.lit(0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_tokens") > 128, 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
        F.sum(lost).cast("long").alias("tokens_lost"),
        F.round(
            F.sum(lost).cast("double") / F.sum("n_tokens"), 6
        ).alias("loss_frac"),
    )


@register(
    "q309_timestamp_delta_compression",
    oracle="""
    WITH d AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS delta_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_deltas,
           CAST(SUM(LENGTH(BIN(GREATEST(delta_us, 1)))) AS BIGINT)
             AS delta_bits,
           CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
           ROUND(CAST(COUNT(*) * 64 AS DOUBLE)
                 / SUM(LENGTH(BIN(GREATEST(delta_us, 1)))), 6)
             AS compression_ratio
    FROM d WHERE delta_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q309_timestamp_delta_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-encoding payoff audit — WHY a time-series table should be
    written sorted (user, ts): per user, the bits a varint delta
    encoding of consecutive-timestamp gaps needs vs raw 64-bit
    timestamps. Parquet's DELTA_BINARY_PACKED gets exactly this win,
    but ONLY if rows arrive at the writer in sorted order — the audit
    quantifies what a `sortWithinPartitions(user, ts)` before write is
    worth (typically 4-8× on the timestamp column). One lag window +
    one aggregation, exact integer bit math."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "delta_us"
        ),
    ).filter(F.col("delta_us").isNotNull())
    # bit width via the EXACT integer route (length of the base-2 string),
    # never ceil(log2(x)): float log2 lands 1 ulp above the integer on
    # exact powers of two and flips the ceil (Spark 4.1.2 measured:
    # ceil(log2(2^29)) = 30 vs DuckDB 29)
    bits = F.length(F.bin(F.greatest(F.col("delta_us"), F.lit(1)))).cast("long")
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_deltas"),
        F.sum(bits).cast("long").alias("delta_bits"),
        (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
        F.round(
            (F.count(F.lit(1)) * 64).cast("double") / F.sum(bits), 6
        ).alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# Trajectory analytics: zone dwell, freshness, simplification, turn rate,
# rendezvous (q310-q314)
# ---------------------------------------------------------------------------


@register(
    "q310_zone_dwell_time",
    oracle=_COORDS_CTE
    + """
    , z AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(FLOOR(lat/10.0) AS BIGINT) AS lat_zone,
             CAST(FLOOR(lon/10.0) AS BIGINT) AS lon_zone,
             event_id
      FROM coords
    ), seq AS (
      SELECT user_id, lat_zone, lon_zone,
             LEAD(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) - ts_us AS dwell_us
      FROM z
    )
    SELECT user_id, lat_zone, lon_zone,
           CAST(COUNT(*) AS BIGINT) AS n_pings,
           CAST(SUM(COALESCE(dwell_us, 0)) AS BIGINT) AS dwell_us
    FROM seq GROUP BY 1, 2, 3
    """,
)
def q310_zone_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone dwell time (the port-dwell / loitering report): each ping's
    time-to-next-ping is attributed to the 10° zone the entity pinged
    FROM, then rolled up per (entity, zone) — the AIS question "how long
    did vessel V sit in area Z". One lead window on the entity partition
    + one hash aggregation; exact µs integers; the trailing ping of each
    entity contributes 0 (open interval, matching the reference's
    span-end convention in SURVEY §2.5 gap analysis)."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    z = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        grid_cell(F.col("lat"), 10.0).alias("lat_zone"),
        grid_cell(F.col("lon"), 10.0).alias("lon_zone"),
        "event_id",
    )
    seq = z.select(
        "user_id",
        "lat_zone",
        "lon_zone",
        (F.lead("ts_us").over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        ) - F.col("ts_us")).alias("dwell_us"),
    )
    return seq.groupBy("user_id", "lat_zone", "lon_zone").agg(
        F.count(F.lit(1)).cast("long").alias("n_pings"),
        F.sum(F.coalesce("dwell_us", F.lit(0))).cast("long").alias("dwell_us"),
    )


@register(
    "q311_freshness_audit",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the global-max-watermark scalar attached to the |event-types| freshness rollup",
    oracle="""
    WITH g AS (SELECT MAX(epoch_us(ts)) AS global_max FROM events),
    s AS (
      SELECT event_type, MAX(epoch_us(ts)) AS src_max,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(g.global_max - s.src_max AS BIGINT) AS staleness_us,
           CAST(CASE WHEN g.global_max - s.src_max > 3600000000
                     THEN 1 ELSE 0 END AS BIGINT) AS is_stale
    FROM s, g
    """,
)
def q311_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness audit: each event type's latest watermark
    against the newest event anywhere — the pipeline-health check that
    catches a silently-dead upstream feed (staleness > 1 h ⇒ stale).
    Anchoring on the data's own global max (never wall-clock `now()`)
    keeps the report deterministic and replayable. One aggregation + a
    deliberate 1-row broadcast scalar attach."""
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("src_max"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    g = ev.agg(F.max(F.unix_micros("ts")).alias("global_max"))
    j = s.crossJoin(F.broadcast(g))
    stale_us = (F.col("global_max") - F.col("src_max")).cast("long")
    return j.select(
        "event_type",
        "n",
        stale_us.alias("staleness_us"),
        F.when(stale_us > 3_600_000_000, 1).otherwise(0).cast("long").alias(
            "is_stale"
        ),
    )


@register(
    "q312_trajectory_simplify",
    oracle=_COORDS_CTE
    + """
    , p AS (
      SELECT user_id, event_id, lat, lon,
             LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
             LEAD(lat) OVER w AS nlat, LEAD(lon) OVER w AS nlon
      FROM coords
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), d AS (
      SELECT user_id,
             CASE WHEN plat IS NULL OR nlat IS NULL THEN 1
                  WHEN SQRT((nlon-plon)*(nlon-plon) + (nlat-plat)*(nlat-plat))
                       = 0 THEN 1
                  WHEN ABS((nlon-plon)*(plat-lat) - (plon-lon)*(nlat-plat))
                       / SQRT((nlon-plon)*(nlon-plon)
                              + (nlat-plat)*(nlat-plat)) > 0.5
                  THEN 1 ELSE 0 END AS keep
      FROM p
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_frac
    FROM d GROUP BY user_id
    """,
)
def q312_trajectory_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass trajectory simplification (the streaming-friendly
    offset filter, not recursive Douglas-Peucker): a point survives if
    its perpendicular deviation from the chord between its temporal
    neighbors exceeds 0.5° — straight-line cruising collapses to its
    endpoints, maneuvers are kept. Per entity: points in, points kept,
    keep fraction. Recursive DP needs O(log n) passes over unbounded
    spans; the neighbor-chord filter is ONE lag/lead window — the right
    cost/fidelity trade for 100 TB track compaction (and the shape the
    reference's sampling stage T6 approximates with keep-flags)."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lead("lat").over(w).alias("nlat"),
        F.lead("lon").over(w).alias("nlon"),
    )
    chord = F.sqrt(
        (F.col("nlon") - F.col("plon")) * (F.col("nlon") - F.col("plon"))
        + (F.col("nlat") - F.col("plat")) * (F.col("nlat") - F.col("plat"))
    )
    dev = (
        F.abs(
            (F.col("nlon") - F.col("plon")) * (F.col("plat") - F.col("lat"))
            - (F.col("plon") - F.col("lon")) * (F.col("nlat") - F.col("plat"))
        )
        / chord
    )
    keep = (
        F.when(F.col("plat").isNull() | F.col("nlat").isNull(), 1)
        .when(chord == 0, 1)
        .when(dev > 0.5, 1)
        .otherwise(0)
    )
    d = p.select("user_id", keep.alias("keep"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(F.sum("keep").cast("double") / F.count(F.lit(1)), 6).alias(
            "keep_frac"
        ),
    )


@register(
    "q313_turn_rate_anomalies",
    oracle=_COORDS_CTE
    + """
    , legs AS (
      SELECT user_id, ts, event_id,
             DEGREES(ATAN2(
               SIN(RADIANS(lon - LAG(lon) OVER w)) * COS(RADIANS(lat)),
               COS(RADIANS(LAG(lat) OVER w)) * SIN(RADIANS(lat))
                 - SIN(RADIANS(LAG(lat) OVER w)) * COS(RADIANS(lat))
                   * COS(RADIANS(lon - LAG(lon) OVER w))
             )) AS bearing,
             epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS dt_us
      FROM coords
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), turns AS (
      SELECT user_id,
             LEAST(ABS(bearing - LAG(bearing) OVER v),
                   360.0 - ABS(bearing - LAG(bearing) OVER v)) AS turn,
             dt_us
      FROM legs WHERE bearing IS NOT NULL
      WINDOW v AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN turn > 90 AND dt_us < 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sharp,
           ROUND(MAX(turn), 4) AS max_turn_deg
    FROM turns WHERE turn IS NOT NULL
    GROUP BY user_id
    """,
)
def q313_turn_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-rate anomaly screen: initial great-circle bearing of each
    leg (the standard atan2 formula), then the heading CHANGE between
    consecutive legs folded into [0°, 180°]; a >90° turn completed
    within an hour is flagged — the AIS track-quality / evasive-
    maneuver signal (a transponder glitch or a spoofed position shows
    up as an impossible turn). Two stacked lag windows on the same
    entity partition — one shuffle total; trig stays in codegen."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dlon = F.radians(F.col("lon") - F.lag("lon").over(w))
    plat = F.radians(F.lag("lat").over(w))
    clat = F.radians(F.col("lat"))
    bearing = F.degrees(
        F.atan2(
            F.sin(dlon) * F.cos(clat),
            F.cos(plat) * F.sin(clat)
            - F.sin(plat) * F.cos(clat) * F.cos(dlon),
        )
    )
    legs = ev.select(
        "user_id",
        "ts",
        "event_id",
        bearing.alias("bearing"),
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("dt_us"),
    ).filter(F.col("bearing").isNotNull())
    v = Window.partitionBy("user_id").orderBy("ts", "event_id")
    diff = F.abs(F.col("bearing") - F.lag("bearing").over(v))
    turns = legs.select(
        "user_id",
        F.least(diff, F.lit(360.0) - diff).alias("turn"),
        "dt_us",
    ).filter(F.col("turn").isNotNull())
    return turns.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(
            F.when(
                (F.col("turn") > 90) & (F.col("dt_us") < 3_600_000_000), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_sharp"),
        F.round(F.max("turn"), 4).alias("max_turn_deg"),
    )


@register(
    "q314_rendezvous_detection",
    oracle=_COORDS_CTE
    + """
    , g AS (
      SELECT user_id, event_id, lat, lon,
             CAST(FLOOR(lat) AS BIGINT) AS lat_c,
             CAST(FLOOR(lon) AS BIGINT) AS lon_c,
             CAST(FLOOR(epoch_us(ts) / 600000000) AS BIGINT) AS bucket
      FROM coords
    ), a AS (
      SELECT user_id, event_id, lat, lon, bucket,
             lat_c + o1.dlat AS lat_c, lon_c + o2.dlon AS lon_c
      FROM g
      CROSS JOIN (VALUES (-1), (0), (1)) o1(dlat)
      CROSS JOIN (VALUES (-1), (0), (1)) o2(dlon)
    ), hits AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, a.bucket,
             2 * 6371.0 * ASIN(LEAST(SQRT(
               POWER(SIN(RADIANS(b.lat - a.lat) / 2), 2)
               + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                 * POWER(SIN(RADIANS(b.lon - a.lon) / 2), 2)
             ), 1.0)) AS dist_km
      FROM a JOIN g b
        ON b.lat_c = a.lat_c AND b.lon_c = a.lon_c AND b.bucket = a.bucket
      WHERE a.user_id < b.user_id
    )
    SELECT user_a, user_b,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
           ROUND(MIN(dist_km), 3) AS min_dist_km
    FROM hits WHERE dist_km <= 100.0
    GROUP BY user_a, user_b
    """,
)
def q314_rendezvous_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous detection (the AIS transshipment screen): pairs of
    entities within 100 km of each other inside the same 10-minute
    bucket. The proximity join is an EQUI-join on (1° cell, bucket) —
    one side explodes to its 3×3 cell neighborhood so cross-cell
    neighbors are never missed (the q219 grid idiom) — then the exact
    haversine verifies the bounded candidate set; never a cross join.
    Per pair: co-location events, distinct time buckets, closest
    approach. Longitude wraparound at ±180° is not stitched (documented
    domain bound, matching grid_knn_join)."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    g = ev.select(
        "user_id",
        "event_id",
        "lat",
        "lon",
        F.floor("lat").cast("long").alias("lat_c"),
        F.floor("lon").cast("long").alias("lon_c"),
        F.floor(F.unix_micros("ts") / 600_000_000).cast("long").alias("bucket"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("dlat"), F.lit(j).alias("dlon"))
                for i in (-1, 0, 1)
                for j in (-1, 0, 1)
            ]
        )
    )
    a = g.select(
        F.col("user_id").alias("user_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "bucket",
        "lat_c",
        "lon_c",
        offsets.alias("o"),
    ).select(
        "user_a",
        "lat_a",
        "lon_a",
        "bucket",
        (F.col("lat_c") + F.col("o.dlat")).alias("lat_c"),
        (F.col("lon_c") + F.col("o.dlon")).alias("lon_c"),
    )
    b = g.select(
        F.col("user_id").alias("user_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "bucket",
        "lat_c",
        "lon_c",
    )
    hits = (
        a.join(b, ["lat_c", "lon_c", "bucket"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select(
            "user_a",
            "user_b",
            "bucket",
            haversine_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            ).alias("dist_km"),
        )
        .filter(F.col("dist_km") <= 100.0)
    )
    return hits.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("bucket").cast("long").alias("n_buckets"),
        F.round(F.min("dist_km"), 3).alias("min_dist_km"),
    )


# ---------------------------------------------------------------------------
# Experimentation stats and engine-exact clustering (q315-q318)
# ---------------------------------------------------------------------------


@register(
    "q315_cuped_adjustment",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the global CUPED moment scalar (n, Sx, Sy, Sxx, Sxy) attached to the 2-row variant rollup",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS pre,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS post
      FROM events GROUP BY user_id
    ), g AS (
      SELECT COUNT(*) AS n, SUM(pre) AS sx, SUM(post) AS sy,
             SUM(pre*pre) AS sxx, SUM(pre*post) AS sxy
      FROM u
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(post) AS DOUBLE) / COUNT(*), 6) AS mean_post_cents,
           ROUND(CAST(SUM(post) AS DOUBLE) / COUNT(*)
                 - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                    / (g.n * g.sxx - g.sx * g.sx))
                   * (CAST(SUM(pre) AS DOUBLE) / COUNT(*)
                      - CAST(g.sx AS DOUBLE) / g.n), 6)
             AS mean_adjusted_cents
    FROM u, g
    GROUP BY variant, g.n, g.sx, g.sy, g.sxx, g.sxy
    """,
)
def q315_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B tests (Deng et al. 2013, public):
    each user's post-period metric is adjusted by θ·(pre − mean_pre),
    θ = cov(pre,post)/var(pre) fit on ALL users — the pre-period
    explains away between-user variance so the experiment needs fewer
    samples. Everything reduces to exact integer moment sums: the
    per-variant adjusted mean has the closed form mean_post −
    θ·(mean_pre_variant − mean_pre_global), so no per-user float is ever
    summed. One user-grain aggregation + a deliberate 1-row moments
    broadcast."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    r = cents(F.col("value"))
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, r).otherwise(0)).alias("pre"),
        F.sum(F.when(F.col("ts") >= cut, r).otherwise(0)).alias("post"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("long"))
    dec = "decimal(38,0)"
    # moments in DECIMAL(38,0): sx*sx grows quadratically with data size
    # and leaves int64 around sf3-10; the oracle's HUGEINT widens the
    # same way
    g = u.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("pre").cast(dec)).alias("sx"),
        F.sum(F.col("post").cast(dec)).alias("sy"),
        F.sum((F.col("pre") * F.col("pre")).cast(dec)).alias("sxx"),
        F.sum((F.col("pre") * F.col("post")).cast(dec)).alias("sxy"),
    )
    per = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pre").alias("vsx"),
        F.sum("post").alias("vsy"),
    )
    j = per.crossJoin(F.broadcast(g))
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    mean_post = F.col("vsy").cast("double") / F.col("n_users")
    mean_pre_v = F.col("vsx").cast("double") / F.col("n_users")
    mean_pre_g = F.col("sx").cast("double") / F.col("n")
    return j.select(
        "variant",
        "n_users",
        F.round(mean_post, 6).alias("mean_post_cents"),
        F.round(mean_post - theta * (mean_pre_v - mean_pre_g), 6).alias(
            "mean_adjusted_cents"
        ),
    )


@register(
    "q316_did_estimate",
    oracle="""
    WITH c AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS post,
             CAST(ROUND(value*100) AS BIGINT) AS v
      FROM events
    ), cells AS (
      SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS s
      FROM c GROUP BY treat, post
    ), wide AS (
      SELECT
        MAX(CASE WHEN treat=1 AND post=1 THEN CAST(s AS DOUBLE)/n END) AS t1,
        MAX(CASE WHEN treat=1 AND post=0 THEN CAST(s AS DOUBLE)/n END) AS t0,
        MAX(CASE WHEN treat=0 AND post=1 THEN CAST(s AS DOUBLE)/n END) AS c1,
        MAX(CASE WHEN treat=0 AND post=0 THEN CAST(s AS DOUBLE)/n END) AS c0
      FROM cells
    )
    SELECT ROUND(t1, 6) AS treat_post, ROUND(t0, 6) AS treat_pre,
           ROUND(c1, 6) AS ctrl_post, ROUND(c0, 6) AS ctrl_pre,
           ROUND((t1 - t0) - (c1 - c0), 6) AS did_cents
    FROM wide
    """,
)
def q316_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: (treated post − pre) − (control post −
    pre) — the causal-effect estimate when assignment isn't random but
    trends are parallel. One conditional aggregation produces the 2×2
    cell means (exact integer cents / counts); the estimate is pure
    arithmetic on four scalars. The entire query is one shuffle."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    v = cents(F.col("value"))
    treat = (F.col("user_id") % 2 == 1)
    post = F.col("ts") >= cut

    def cell_mean(t: bool, p: bool):
        cond = (treat if t else ~treat) & (post if p else ~post)
        return F.sum(F.when(cond, v).otherwise(0)).cast("double") / F.sum(
            F.when(cond, 1).otherwise(0)
        )

    t1, t0, c1, c0 = (
        cell_mean(True, True),
        cell_mean(True, False),
        cell_mean(False, True),
        cell_mean(False, False),
    )
    return ev.agg(
        F.round(t1, 6).alias("treat_post"),
        F.round(t0, 6).alias("treat_pre"),
        F.round(c1, 6).alias("ctrl_post"),
        F.round(c0, 6).alias("ctrl_pre"),
        F.round((t1 - t0) - (c1 - c0), 6).alias("did_cents"),
    )


@register(
    "q317_rolling_backtest",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value*100) AS BIGINT)) AS actual
      FROM events GROUP BY 1, 2
    ), f AS (
      SELECT event_type, day, actual,
             CAST(ROUND(
               CAST(SUM(actual) OVER w AS DOUBLE) / COUNT(*) OVER w
             ) AS BIGINT) AS pred
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(ABS(actual - pred)) AS BIGINT) AS abs_err_cents,
           ROUND(CAST(SUM(ABS(actual - pred)) AS DOUBLE) / COUNT(*), 6)
             AS mae_cents
    FROM f WHERE pred IS NOT NULL
    GROUP BY event_type
    """,
)
def q317_rolling_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: for every day, 'train' an
    expanding-mean model on STRICTLY prior days and score it on the day
    — the leak-free evaluation loop every production forecast needs,
    expressed as one prefix window (no per-cutoff refits, no loop).
    Daily rollup first (corpus-sized work), then the backtest runs on
    |types|×|days| rows. Predictions round to integer cents before the
    error so MAE is an exact integer ratio."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).alias("actual"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pred = F.round(
        F.sum("actual").over(w).cast("double") / F.count(F.lit(1)).over(w)
    ).cast("long")
    f = d.select("event_type", "actual", pred.alias("pred")).filter(
        F.col("pred").isNotNull()
    )
    err = F.abs(F.col("actual") - F.col("pred"))
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(err).cast("long").alias("abs_err_cents"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6).alias(
            "mae_cents"
        ),
    )


def _kmeans_oracle(rounds: int, k: int) -> str:
    """Chained-CTE Lloyd iterations (the q277 engine-exact idiom):
    assignment a{r} vs centroids c{r-1}; update c{r} from a{r}."""
    parts = [
        """
    WITH dims AS (
      SELECT vec_id, u.i AS i,
             CAST(ROUND(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (SELECT vec_id AS c, i, x AS ci FROM dims WHERE vec_id < """
        + str(k)
        + ")"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    a{r} AS (
      SELECT vec_id, c, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rk
      FROM (
        SELECT d.vec_id, c.c, SUM((d.x - c.ci) * (d.x - c.ci)) AS d2
        FROM dims d JOIN c{r - 1} c ON c.i = d.i
        GROUP BY d.vec_id, c.c
      )
    )"""
        )
        if r < rounds:
            parts.append(
                f""",
    c{r} AS (
      SELECT a.c, d.i,
             CAST(ROUND(CAST(SUM(d.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
      FROM a{r} a JOIN dims d ON d.vec_id = a.vec_id
      WHERE a.rk = 1
      GROUP BY a.c, d.i
    )"""
            )
    parts.append(
        f"""
    SELECT c AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(d2) AS BIGINT) AS inertia
    FROM a{rounds} WHERE rk = 1 GROUP BY c
    """
    )
    return "".join(parts)


@register("q318_kmeans_lloyd", oracle=_kmeans_oracle(3, 4))
def q318_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED, ENGINE-EXACT Lloyd k-means (k=4, 3 assignment
    rounds, first-k-ids init): coordinates quantize to integer micros,
    distances are exact BIGINT sums of squares, centroid updates round
    once per coordinate — so every engine running the same algebra lands
    on the SAME clusters, and an iterative-algorithm hash gate becomes
    possible (the q277 PCA idiom applied to clustering). Per round: one
    broadcast join against the k·d-row centroid relation, one argmin
    window partitioned by vector, one centroid aggregation — the plan a
    1000-executor Lloyd actually wants (the k·d side never grows with
    the corpus). Degenerate empty clusters would drop out symmetrically
    in both engines (inner joins; none occur on this data). Contrast
    with q64's SAMPLED k-means (driver-trained, fast, rows-only): this
    one is slower per round but exactly replayable."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("xf").cast("double") * 1_000_000).cast("long").alias("x"),
    )
    # dims feeds ~6 subtrees across the unrolled rounds (each assignment
    # AND each centroid update re-joins it); cache() so the corpus is
    # scanned+exploded once, not six times (the minhash materialize_index
    # precedent — MEMORY_AND_DISK, LRU-evictable)
    dims = dims.cache()
    cent = dims.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c"), "i", F.col("x").alias("ci")
    )
    assign = None
    for r in range(3):
        d2 = (
            dims.join(F.broadcast(cent), "i")
            .groupBy("vec_id", "c")
            .agg(
                F.sum(
                    (F.col("x") - F.col("ci")) * (F.col("x") - F.col("ci"))
                ).alias("d2")
            )
        )
        rk = F.row_number().over(
            Window.partitionBy("vec_id").orderBy("d2", "c")
        )
        assign = d2.withColumn("rk", rk).filter(F.col("rk") == 1)
        if r < 2:
            cent = (
                assign.select("vec_id", "c")
                .join(dims, "vec_id")
                .groupBy("c", "i")
                .agg(
                    F.round(
                        F.sum("x").cast("double") / F.count(F.lit(1))
                    )
                    .cast("long")
                    .alias("ci")
                )
            )
    return assign.groupBy(F.col("c").alias("cluster")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("d2").cast("long").alias("inertia"),
    )


# ---------------------------------------------------------------------------
# Scaling-law subsets, prefix sharing, skip-gram pairs, uncertainty
# sampling (q319-q322)
# ---------------------------------------------------------------------------


@register(
    "q319_scaling_law_subsets",
    allow_non_equi="deliberate 4-row broadcast threshold-spine theta join: nested scaling-law subsets require h < threshold per spine row",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             (doc_id * 2654435761 + 1013904223) % 4294967291 % 1000 AS h
      FROM documents
    ), spine AS (
      SELECT * FROM (VALUES (100), (250), (500), (1000)) s(mille)
    )
    SELECT mille,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS subset_tokens
    FROM spine JOIN d ON d.h < spine.mille
    GROUP BY mille
    """,
)
def q319_scaling_law_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED dataset subsets for scaling-law sweeps (10% ⊂ 25% ⊂ 50% ⊂
    100%): membership is `hash(doc_id) < threshold`, so every smaller
    subset is contained in every larger one BY CONSTRUCTION — the
    property scaling-law fits require (a 25% run must see a superset of
    the 10% run's data) and random sampling per size does not give.
    The 4-row threshold spine broadcasts into one theta-join; the same
    deterministic affine hash family as q284/q306 keeps both engines
    bit-identical. At 100 TB each subset is a scan predicate, never a
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    h = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223))
        % F.lit(4294967291)
        % F.lit(1000)
    )
    d = docs.select(
        F.size(toks).cast("long").alias("n_tokens"), h.alias("h")
    )
    spine = spark.createDataFrame([(100,), (250,), (500,), (1000,)], ["mille"])
    return (
        F.broadcast(spine)
        .join(d, d.h < F.col("mille"))
        .groupBy("mille")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("subset_tokens"),
        )
    )


@register(
    "q320_shared_prefix_savings",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), heads AS (
      SELECT doc_id, array_to_string(w[1:16], ' ') AS head16
      FROM t WHERE len(w) >= 16
    ), g AS (
      SELECT head16, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM heads GROUP BY head16
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_prefix_groups,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM((n_docs - 1) * 16) AS BIGINT) AS reusable_prefix_tokens
    FROM g
    """,
)
def q320_shared_prefix_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prompt-prefix audit (the inference-side dedup): documents
    whose first 16 tokens coincide can share one KV-cache prefix; the
    reusable-token total is the compute a prefix-caching server saves.
    One fingerprint aggregation (the q303 boundary idiom pointed at
    heads only) — at serving scale this is the report that justifies
    prefix-cache memory."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select("doc_id", toks.alias("w"), F.size(toks).alias("n"))
    heads = t.filter(F.col("n") >= 16).select(
        F.array_join(F.slice("w", 1, 16), " ").alias("head16")
    )
    g = heads.groupBy("head16").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_prefix_groups"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_groups"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum((F.col("n_docs") - 1) * 16)
        .cast("long")
        .alias("reusable_prefix_tokens"),
    )


@register(
    "q321_skipgram_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), pos AS (
      SELECT doc_id, u.p AS p, w[u.p] AS center, len(w) AS n
      FROM t, UNNEST(generate_series(1, len(w))) AS u(p)
    ), pairs AS (
      SELECT center, ctx.tok AS context
      FROM pos, LATERAL (
        SELECT UNNEST([p - 2, p - 1, p + 1, p + 2]) AS q
      ) o, LATERAL (
        SELECT CASE WHEN o.q BETWEEN 1 AND n THEN
          (SELECT w[o.q] FROM t t2 WHERE t2.doc_id = pos.doc_id)
        END AS tok
      ) ctx
      WHERE ctx.tok IS NOT NULL
    )
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY center, context
    ORDER BY n DESC, center, context LIMIT 50
    """,
)
def q321_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction, window=2 — the
    word2vec/SGNS training-pair generator: one position explode + four
    row-local array index lookups (the context IS adjacency in the same
    row's array; NO self-join, no window shuffle), then a count
    aggregation and TakeOrdered top-50. The per-row expansion factor is
    the constant 4, so a 100 TB corpus streams through map-side."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select(toks.alias("w"), F.size(toks).alias("n"))
    pos = t.select(
        "w",
        "n",
        F.posexplode("w").alias("p0", "center"),
    ).select("w", "n", (F.col("p0") + 1).alias("p"), "center")
    # F.get is 0-based and returns NULL out-of-bounds (element_at raises
    # on index 0, so p-2 at the array head would kill the job)
    ctx = F.explode(
        F.array(
            *[
                F.get("w", (F.col("p") + F.lit(o) - 1).cast("int"))
                for o in (-2, -1, 1, 2)
            ]
        )
    )
    pairs = pos.select("center", ctx.alias("context")).filter(
        F.col("context").isNotNull()
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "center", "context")
        .limit(50)
    )


@register(
    "q322_uncertainty_sampling",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS BIGINT)
               AS n_vowels,
             n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(ROUND(2000000.0 * n_vowels / n_chars
                  + 1000000.0 * n_words / 200 - 1200000) AS BIGINT)
               AS logit_micro
      FROM f WHERE n_words > 0 AND n_chars > 0
    )
    SELECT doc_id, CAST(logit_micro AS BIGINT) AS logit_micro,
           CAST(ABS(logit_micro) AS BIGINT) AS margin_micro
    FROM scored
    ORDER BY ABS(logit_micro), doc_id LIMIT 20
    """,
)
def q322_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for active labeling: score every document
    with a cheap linear quality model (integer-micro logit — the q273
    classifier shape) and pick the 20 docs CLOSEST to the decision
    boundary (smallest |logit|) — the examples whose human labels
    improve the classifier fastest. Margin ordering is exact integer
    arithmetic; selection is TakeOrdered, never a global sort."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_words = F.size(toks).cast("long")
    n_vowels = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiou]"), F.lit(0))
    ).cast("long")
    f = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_vowels.alias("n_vowels"),
        "n_chars",
    ).filter((F.col("n_words") > 0) & (F.col("n_chars") > 0))
    logit = F.round(
        F.lit(2_000_000.0) * F.col("n_vowels") / F.col("n_chars")
        + F.lit(1_000_000.0) * F.col("n_words") / F.lit(200)
        - F.lit(1_200_000.0)
    ).cast("long")
    scored = f.select("doc_id", logit.alias("logit_micro"))
    return (
        scored.select(
            "doc_id",
            "logit_micro",
            F.abs("logit_micro").alias("margin_micro"),
        )
        .orderBy("margin_micro", "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Class weights, JL random projection, seasonality strength, peak
# detection (q323-q326)
# ---------------------------------------------------------------------------


@register(
    "q323_class_weights",
    allow_non_equi="deliberate 1-row broadcast cross join: the (n_total, k) scalar on the |labels|-sized class table",
    oracle="""
    WITH c AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_class FROM embeddings
      GROUP BY label
    ), g AS (
      SELECT SUM(n_class) AS n_total, COUNT(*) AS k FROM c
    )
    SELECT label, n_class,
           CAST(ROUND(1000000.0 * g.n_total / (g.k * n_class)) AS BIGINT)
             AS weight_micro
    FROM c, g
    """,
)
def q323_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula
    n_total/(k·n_c), in integer micros) — the loss-reweighting table a
    classifier trained on skewed labels broadcasts to every executor.
    One aggregation + a 1-row totals broadcast."""
    emb = load(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_class")
    )
    g = c.agg(
        F.sum("n_class").alias("n_total"), F.count(F.lit(1)).alias("k")
    )
    return c.crossJoin(F.broadcast(g)).select(
        "label",
        "n_class",
        F.round(
            F.lit(1_000_000.0)
            * F.col("n_total")
            / (F.col("k") * F.col("n_class"))
        )
        .cast("long")
        .alias("weight_micro"),
    )


@register(
    "q324_random_projection",
    allow_non_equi="deliberate 64x8 literal sign-matrix build (two bounded literal spines crossed once; the corpus-sized projection is an equi-join)",
    oracle="""
    WITH dims AS (
      SELECT vec_id, u.i AS i,
             CAST(ROUND(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    ), pj AS (SELECT UNNEST(range(8)) AS j),
    signs AS (
      SELECT i, j,
             CASE WHEN ((i * 2654435761 + j * 2246822519 + 1013904223)
                        % 4294967291) % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM (SELECT DISTINCT i FROM dims), pj
    )
    SELECT vec_id, j, CAST(SUM(s * x) AS BIGINT) AS proj_micro
    FROM dims JOIN signs USING (i)
    GROUP BY vec_id, j
    """,
)
def q324_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection 64→8 dims, ENGINE-
    EXACT: the ±1 projection matrix comes from the deterministic affine
    hash family (q284's), coordinates are integer micros, so the
    projected vectors are exact BIGINTs — the dimensionality-reduction
    front end for LSH/clustering that both engines reproduce bit-for-
    bit. The 64×8 sign matrix is a 512-row broadcast relation; the
    projection is one equi-join + hash aggregation, linear in the
    corpus."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("xf").cast("double") * 1_000_000).cast("long").alias("x"),
    )
    pj = spark.createDataFrame([(j,) for j in range(8)], ["j"])
    axes = spark.createDataFrame([(i,) for i in range(1, 65)], ["i"])
    s = (
        (
            F.col("i") * F.lit(2654435761)
            + F.col("j") * F.lit(2246822519)
            + F.lit(1013904223)
        )
        % F.lit(4294967291)
        % F.lit(2)
    )
    signs = axes.crossJoin(pj).select(
        "i", "j", F.when(s == 0, 1).otherwise(-1).alias("s")
    )
    return (
        dims.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("x")).cast("long").alias("proj_micro"))
    )


@register(
    "q325_seasonality_strength",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(dayofweek(ts) AS BIGINT) AS dow,
             SUM(CAST(ROUND(value*100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2, 3
    ), per_dow AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS s, SUM(v*v) AS ss
      FROM d GROUP BY event_type, dow
    ), agg AS (
      SELECT event_type,
             SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss,
             SUM(ss - CAST(s*s AS DOUBLE)/n) AS sse_within
      FROM per_dow GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND(1.0 - sse_within / (ss - CAST(s*s AS DOUBLE)/n), 6)
             AS seasonality_strength
    FROM agg WHERE ss - CAST(s*s AS DOUBLE)/n > 0
    """,
)
def q325_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality strength per series: the fraction of daily-
    total variance explained by day-of-week (1 − SSE_within/SS_total,
    the eta-squared of the dow grouping) — the triage stat that says
    WHICH series deserve the full q228 seasonal decomposition. All
    moments are exact integer sums; the two float divisions happen once
    per (type, dow) and once per type, so the result is order-
    independent. Two small aggregations after the daily rollup."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.dayofweek("ts").cast("long").alias("dow"),
    ).agg(F.sum(cents(F.col("value"))).alias("v"))
    per_dow = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    agg = per_dow.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.sum(
            F.col("ss") - (F.col("s") * F.col("s")).cast("double") / F.col("n")
        ).alias("sse_within"),
    )
    ss_total = F.col("ss") - (F.col("s") * F.col("s")).cast("double") / F.col(
        "n"
    )
    return agg.filter(ss_total > 0).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.lit(1.0) - F.col("sse_within") / ss_total, 6).alias(
            "seasonality_strength"
        ),
    )


@register(
    "q326_daily_peaks",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value*100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), n AS (
      SELECT event_type, day, v,
             LAG(v) OVER w AS pv, LEAD(v) OVER w AS nv
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, v AS peak_cents,
           CAST(v - GREATEST(pv, nv) AS BIGINT) AS prominence_cents
    FROM n
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND v > pv AND v > nv
      AND v - GREATEST(pv, nv) > 1000
    """,
)
def q326_daily_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection with a prominence floor: a day whose total
    strictly exceeds BOTH neighbors by >10.00 — the alerting primitive
    for spike detection on rolled-up series. Daily rollup (corpus-sized
    work, map-side combined) then one lag/lead window over the tiny
    series table."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    n = d.select(
        "event_type",
        "day",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lead("v").over(w).alias("nv"),
    )
    prom = F.col("v") - F.greatest("pv", "nv")
    return (
        n.filter(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("v") > F.col("pv"))
            & (F.col("v") > F.col("nv"))
            & (prom > 1000)
        )
        .select(
            "event_type",
            "day",
            F.col("v").alias("peak_cents"),
            prom.cast("long").alias("prominence_cents"),
        )
    )


@register(
    "q327_video_container_metadata",
    oracle="""
    SELECT doc_id AS id,
           CAST(1000 * (1 + doc_id % 4) AS BIGINT) AS timescale,
           CAST(1000 * (1 + doc_id % 300) AS BIGINT) AS duration_ms,
           CAST(16 * (1 + doc_id % 120) AS BIGINT) AS width,
           CAST(16 * (1 + doc_id % 68) AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_tracks,
           TRUE AS parse_ok
    FROM documents
    """,
)
def q327_video_container_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata decode, end-to-end hash-checked
    (the q259 idiom for VIDEO): valid ISO-BMFF/MP4 payloads — spec-
    correct ftyp/moov/mvhd/trak/tkhd/mdat box trees — are synthesized on
    the executors with timescale/duration/dimensions derived from
    doc_id, then ``decode_video_metadata`` walks the ACTUAL box tree
    (pure Python over ISO/IEC 14496-12, no media library) to recover
    them; the oracle recomputes the expectations from the id formulas,
    so any mis-read byte offset in the box walk hash-mismatches.
    duration_ms is exact (synthesized durations are timescale
    multiples). Two chained Arrow-batched ``mapInPandas`` stages, zero
    shuffles, payloads never leave the executors — the 100 TB
    video-catalog backfill plan."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_video_metadata,
        synthesize_video_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_video_assets(docs, "doc_id")
    return decode_video_metadata(assets, "id", "payload")


# ---------------------------------------------------------------------------
# Storage encoding advice, association rules, cross-source score
# normalization (q328-q330)
# ---------------------------------------------------------------------------


@register(
    "q328_encoding_advisor",
    oracle="""
    WITH per AS (
      SELECT 'l_returnflag' AS col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_distinct
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', COUNT(*), COUNT(DISTINCT l_linestatus)
      FROM lineitem
      UNION ALL
      SELECT 'l_partkey', COUNT(*), COUNT(DISTINCT l_partkey) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*), COUNT(DISTINCT l_extendedprice)
      FROM lineitem
    )
    SELECT col, n, n_distinct,
           ROUND(CAST(n_distinct AS DOUBLE) / n, 6) AS distinct_ratio,
           CASE WHEN CAST(n_distinct AS DOUBLE) / n < 0.1
                THEN 'dictionary' ELSE 'plain' END AS suggested_encoding
    FROM per
    """,
)
def q328_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet encoding advisor: per column, the distinct-value ratio
    that decides dictionary vs plain encoding (parquet writers fall back
    to plain when the dictionary page overflows — a <0.1 ratio is the
    safe dictionary regime; a near-1.0 ratio wastes the dictionary
    attempt). One pass computes all columns' exact distinct counts
    (several COUNT(DISTINCT) in one aggregation — Spark expands to an
    expand+two-phase agg, still one scan). The input to row-group
    sizing alongside q244's footer audit."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("l_returnflag").cast("long").alias("d1"),
        F.countDistinct("l_linestatus").cast("long").alias("d2"),
        F.countDistinct("l_partkey").cast("long").alias("d3"),
        F.countDistinct("l_extendedprice").cast("long").alias("d4"),
    )
    per = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_returnflag").alias("col"),
                    F.col("n"),
                    F.col("d1").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("l_linestatus").alias("col"),
                    F.col("n"),
                    F.col("d2").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("l_partkey").alias("col"),
                    F.col("n"),
                    F.col("d3").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("l_extendedprice").alias("col"),
                    F.col("n"),
                    F.col("d4").alias("n_distinct"),
                ),
            )
        ).alias("s")
    ).select("s.col", "s.n", "s.n_distinct")
    ratio = F.col("n_distinct").cast("double") / F.col("n")
    return per.select(
        "col",
        "n",
        "n_distinct",
        F.round(ratio, 6).alias("distinct_ratio"),
        F.when(ratio < 0.1, "dictionary")
        .otherwise("plain")
        .alias("suggested_encoding"),
    )


@register(
    "q329_association_rules",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the basket-count scalar on the |type-pairs|-sized rule table",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events
    ), nb AS (SELECT COUNT(DISTINCT (user_id, day)) AS n_baskets
              FROM baskets),
    item AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
      FROM baskets GROUP BY event_type
    ),
    pair AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs,
             CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM baskets a
      JOIN baskets b ON b.user_id = a.user_id AND b.day = a.day
                    AND b.event_type <> a.event_type
      GROUP BY 1, 2
    )
    SELECT p.lhs, p.rhs, p.n_pair,
           ROUND(CAST(p.n_pair AS DOUBLE) / li.n_item, 6) AS confidence,
           ROUND(CAST(p.n_pair AS DOUBLE) * nb.n_baskets
                 / (li.n_item * lr.n_item), 6) AS lift
    FROM pair p
    JOIN item li ON li.event_type = p.lhs
    JOIN item lr ON lr.event_type = p.rhs, nb
    WHERE p.n_pair >= 5
    """,
)
def q329_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over (user, day) baskets: confidence
    P(rhs|lhs) and lift P(lhs,rhs)/(P(lhs)P(rhs)) for every directed
    type pair with support ≥ 5 — the market-basket report. Pair counts
    come from the bounded within-basket self-join (|types|² per basket,
    types is a small domain — q288's wedge shape); the basket total is a
    deliberate 1-row broadcast; item counts broadcast into the pair
    table. Exact integer counts, one float division per output row."""
    ev = load(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.day") == F.col("a.day"))
            & (F.col("b.event_type") != F.col("a.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("lhs"),
            F.col("b.event_type").alias("rhs"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    li = item.select(
        F.col("event_type").alias("lhs"), F.col("n_item").alias("n_lhs")
    )
    lr = item.select(
        F.col("event_type").alias("rhs"), F.col("n_item").alias("n_rhs")
    )
    j = (
        pair.join(F.broadcast(li), "lhs")
        .join(F.broadcast(lr), "rhs")
        .crossJoin(F.broadcast(nb))
    )
    return j.select(
        "lhs",
        "rhs",
        "n_pair",
        F.round(F.col("n_pair").cast("double") / F.col("n_lhs"), 6).alias(
            "confidence"
        ),
        F.round(
            F.col("n_pair").cast("double")
            * F.col("n_baskets")
            / (F.col("n_lhs") * F.col("n_rhs")),
            6,
        ).alias("lift"),
    )


@register(
    "q330_within_source_percentile",
    oracle="""
    WITH q AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(list_filter(string_split_regex(
                  lower(trim(text)), '\\s+'), x -> x <> ''))) AS BIGINT)
               AS quality
      FROM documents
    ), r AS (
      SELECT doc_id, source, quality,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id) AS pr
      FROM q
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pr >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top_decile,
           CAST(MIN(CASE WHEN pr >= 0.9 THEN quality END) AS BIGINT)
             AS top_decile_floor
    FROM r GROUP BY source
    """,
)
def q330_within_source_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-source percentile normalization: a raw quality score is
    not comparable across sources (Wikipedia's median beats CommonCrawl's
    p95), so curation selects the top decile PER SOURCE — percent_rank
    partitioned by source, then the per-source selection floor the cut
    implies. One partitioned window (hash shuffle on source; at skewed
    source sizes use the q293 prefix-scan per source) + one rollup."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    q = docs.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(toks)).cast("long").alias("quality"),
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    r = q.select("source", "quality", F.percent_rank().over(w).alias("pr"))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("pr") >= 0.9, 1).otherwise(0))
        .cast("long")
        .alias("n_top_decile"),
        F.min(F.when(F.col("pr") >= 0.9, F.col("quality")))
        .cast("long")
        .alias("top_decile_floor"),
    )


# ---------------------------------------------------------------------------
# Positional phrase search, event debouncing, speed consistency
# (q331-q333)
# ---------------------------------------------------------------------------


@register(
    "q331_phrase_search",
    oracle="""
    WITH pos AS (
      SELECT doc_id, u.p AS p, w[u.p] AS tok
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
      ), UNNEST(generate_series(1, len(w))) AS u(p)
    ), a AS (SELECT doc_id, p FROM pos WHERE tok = 'hash'),
    b AS (SELECT doc_id, p FROM pos WHERE tok = 'join')
    SELECT a.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(a.p) AS BIGINT) AS first_pos
    FROM a JOIN b ON b.doc_id = a.doc_id AND b.p = a.p + 1
    GROUP BY a.doc_id
    """,
)
def q331_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search ("hash join", adjacency required) through a
    positional inverted index: each term's postings carry token
    positions, and the phrase match is the equi-join posting_b.pos =
    posting_a.pos + 1 — the way a search engine verifies phrases without
    re-reading documents. Both postings lists are term-filtered BEFORE
    the join (pushed predicates), so the join is |postings(hash)| ×
    matching positions, never corpus-sized. Extends q160's inverted
    index and q195's conjunctive search with position semantics."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    pos = docs.select(
        "doc_id", F.posexplode(toks).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    a = pos.filter(F.col("tok") == "hash").select("doc_id", "p")
    b = pos.filter(F.col("tok") == "join").select(
        "doc_id", F.col("p").alias("pb")
    )
    return (
        a.join(b, (b.doc_id == a.doc_id) & (F.col("pb") == F.col("p") + 1))
        .select(a.doc_id.alias("doc_id"), "p")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("p").cast("long").alias("first_pos"),
        )
    )


@register(
    "q332_debounce_events",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us < 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced,
           ROUND(CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us < 1000000
                              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS debounce_frac
    FROM g GROUP BY event_type
    """,
)
def q332_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debouncing: a repeat of the same (user, type) within
    1 s is a double-fire (button mash, retry storm, duplicate beacon)
    and gets dropped before sessionization/attribution. The keep/drop
    decision is one lag gap per (user, type) partition — the dedup that
    content hashing (q25) cannot do because the payloads legitimately
    differ. Reported per type so a chatty SDK shows up immediately."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    is_dup = F.col("gap_us").isNotNull() & (F.col("gap_us") < 1_000_000)
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(is_dup, 1).otherwise(0)).cast("long").alias("n_debounced"),
        F.round(
            F.sum(F.when(is_dup, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("debounce_frac"),
    )


@register(
    "q333_speed_consistency",
    oracle=_COORDS_CTE
    + """
    , legs AS (
      SELECT user_id, value AS reported,
             2 * 6371.0 * ASIN(LEAST(SQRT(
               POWER(SIN(RADIANS(lat - LAG(lat) OVER w) / 2), 2)
               + COS(RADIANS(LAG(lat) OVER w)) * COS(RADIANS(lat))
                 * POWER(SIN(RADIANS(lon - LAG(lon) OVER w) / 2), 2)
             ), 1.0)) AS dist_km,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) / 3600000000.0
               AS dt_h
      FROM (SELECT c.*, e.value FROM coords c
            JOIN events e USING (event_id)) t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), d AS (
      SELECT user_id, reported, dist_km / dt_h AS derived_kmh
      FROM legs WHERE dt_h > 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_legs,
           CAST(SUM(CASE WHEN ABS(derived_kmh - reported) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inconsistent,
           ROUND(MAX(derived_kmh), 4) AS max_derived_kmh
    FROM d GROUP BY user_id
    """,
)
def q333_speed_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reported-vs-derived speed consistency (the AIS transponder-quality
    check): the speed each leg IMPLIES (haversine distance / elapsed
    time) against the reported speed field; a >50 km/h disagreement
    marks a bad GPS fix or a spoofed speed. One lag window per entity +
    one rollup; the same trig codegen as q19/q313."""
    ev = load(spark, sf_dir, "events")
    # value rides the same coords projection — never a self-join on
    # event_id just to re-attach a column the scan already has
    c = _with_coords(ev, extra_cols=("value",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = c.select(
        "user_id",
        F.col("value").alias("reported"),
        haversine_km(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ).alias("dist_km"),
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / F.lit(3_600_000_000.0)
        ).alias("dt_h"),
    )
    d = legs.filter(F.col("dt_h") > 0).select(
        "user_id",
        "reported",
        (F.col("dist_km") / F.col("dt_h")).alias("derived_kmh"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_legs"),
        F.sum(
            F.when(F.abs(F.col("derived_kmh") - F.col("reported")) > 50, 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_inconsistent"),
        F.round(F.max("derived_kmh"), 4).alias("max_derived_kmh"),
    )


# ---------------------------------------------------------------------------
# Partition-straddle audit, RLE sort benefit, multi-horizon conversions
# (q334-q336)
# ---------------------------------------------------------------------------


@register(
    "q334_partition_straddle",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid,
             ts
      FROM g
    ), spans AS (
      SELECT user_id, sid,
             CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN d1 > d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddling,
           ROUND(CAST(SUM(CASE WHEN d1 > d0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS straddle_frac
    FROM spans
    """,
)
def q334_partition_straddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-straddle audit: how many 30-minute-gap sessions CROSS a
    day boundary — the number that decides whether day-partitioned
    storage can process sessions partition-locally (low straddle ⇒ a
    per-day job plus a boundary patch; high straddle ⇒ sessionize before
    partitioning, the reference's seeded cross-window design T1). The
    sessionizer is the q11 prefix-sum shape; spans and the straddle flag
    are one rollup."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = ev.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias(
            "new_s"
        ),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.select(
        "user_id", "ts", F.sum("new_s").over(wrun).alias("sid")
    )
    spans = s.groupBy("user_id", "sid").agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    straddle = F.when(F.col("d1") > F.col("d0"), 1).otherwise(0)
    return spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(straddle).cast("long").alias("n_straddling"),
        F.round(
            F.sum(straddle).cast("double") / F.count(F.lit(1)), 6
        ).alias("straddle_frac"),
    )


@register(
    "q335_rle_sort_benefit",
    oracle="""
    WITH arrival AS (
      SELECT user_id,
             CASE WHEN event_type <> LAG(event_type) OVER (
                    PARTITION BY user_id ORDER BY event_id)
                  OR LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY event_id) IS NULL
             THEN 1 ELSE 0 END AS run_start
      FROM events
    ), sorted_rt AS (
      SELECT user_id,
             CASE WHEN event_type <> LAG(event_type) OVER (
                    PARTITION BY user_id ORDER BY event_type, ts, event_id)
                  OR LAG(event_type) OVER (PARTITION BY user_id
                         ORDER BY event_type, ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS run_start
      FROM events
    )
    SELECT a.user_id,
           CAST(a.runs AS BIGINT) AS arrival_runs,
           CAST(b.runs AS BIGINT) AS sorted_runs,
           ROUND(CAST(a.runs AS DOUBLE) / b.runs, 6) AS rle_gain
    FROM (SELECT user_id, SUM(run_start) AS runs FROM arrival
          GROUP BY user_id) a
    JOIN (SELECT user_id, SUM(run_start) AS runs FROM sorted_rt
          GROUP BY user_id) b USING (user_id)
    """,
)
def q335_rle_sort_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length-encoding payoff of sorting by a low-cardinality column:
    per user, the count of event_type RUNS under arrival order vs under
    (event_type, ts) clustering — parquet's RLE_DICTIONARY stores one
    entry per run, so the ratio IS the column-size shrink a
    sortWithinPartitions(type) write buys. The layout twin of q309's
    timestamp-delta audit; two lag windows + one join on the user
    rollup."""
    ev = load(spark, sf_dir, "events")
    wa = Window.partitionBy("user_id").orderBy("event_id")
    ws = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")

    def runs(w):
        prev = F.lag("event_type").over(w)
        flag = F.when(
            prev.isNull() | (F.col("event_type") != prev), 1
        ).otherwise(0)
        return flag

    a = ev.select("user_id", runs(wa).alias("r")).groupBy("user_id").agg(
        F.sum("r").cast("long").alias("arrival_runs")
    )
    b = ev.select("user_id", runs(ws).alias("r")).groupBy("user_id").agg(
        F.sum("r").cast("long").alias("sorted_runs")
    )
    return a.join(b, "user_id").select(
        "user_id",
        "arrival_runs",
        "sorted_runs",
        F.round(
            F.col("arrival_runs").cast("double") / F.col("sorted_runs"), 6
        ).alias("rle_gain"),
    )


@register(
    "q336_conversion_horizons",
    allow_non_equi="deliberate 3-row broadcast horizon spine over the |users| rollup",
    oracle="""
    WITH sig AS (
      SELECT user_id, ts FROM events WHERE event_type = 'signup'
    ), pur AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), firsts AS (
      SELECT s.user_id, MIN(epoch_us(s.ts)) AS s_us
      FROM sig s GROUP BY s.user_id
    ), conv AS (
      SELECT f.user_id, f.s_us,
             MIN(CASE WHEN epoch_us(p.ts) >= f.s_us
                      THEN epoch_us(p.ts) END) AS p_us
      FROM firsts f LEFT JOIN pur p ON p.user_id = f.user_id
      GROUP BY f.user_id, f.s_us
    ), h AS (SELECT * FROM (VALUES (1), (24), (168)) t(horizon_h))
    SELECT horizon_h,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(CASE WHEN p_us IS NOT NULL
                         AND p_us - s_us <= horizon_h * 3600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(CASE WHEN p_us IS NOT NULL
                              AND p_us - s_us <= horizon_h * 3600000000
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
    FROM conv, h
    GROUP BY horizon_h
    """,
)
def q336_conversion_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon conversion rates (1 h / 24 h / 7 d after first
    signup): ONE pass computes each user's first signup and first
    subsequent purchase (conditional min aggregates — never one query
    per horizon), then a 3-row horizon spine broadcasts over the
    |users|-sized table to produce every horizon's rate. Extends q254's
    single-horizon latency with the retention-curve shape."""
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_ts")
    )
    conv = (
        firsts.join(pur, "user_id", "left")
        .groupBy("user_id", "s_us")
        .agg(
            F.min(
                F.when(F.col("p_ts") >= F.col("s_us"), F.col("p_ts"))
            ).alias("p_us")
        )
    )
    h = spark.createDataFrame([(1,), (24,), (168,)], ["horizon_h"])
    j = conv.crossJoin(F.broadcast(h))
    hit = F.when(
        F.col("p_us").isNotNull()
        & (F.col("p_us") - F.col("s_us") <= F.col("horizon_h") * 3_600_000_000),
        1,
    ).otherwise(0)
    return j.groupBy("horizon_h").agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.sum(hit).cast("long").alias("n_converted"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
            "conversion_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Exact group percentiles, SRM check, mutual information (q337-q339)
# ---------------------------------------------------------------------------


@register(
    "q337_group_quantiles_exact",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, v,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cm,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN cm >= CEIL(10 * n / 100.0) THEN v END)
                AS BIGINT) AS p10_cents,
           CAST(MIN(CASE WHEN cm >= CEIL(50 * n / 100.0) THEN v END)
                AS BIGINT) AS p50_cents,
           CAST(MIN(CASE WHEN cm >= CEIL(90 * n / 100.0) THEN v END)
                AS BIGINT) AS p90_cents
    FROM cum GROUP BY event_type
    """,
)
def q337_group_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group p10/p50/p90 by counting quantile — no spine join,
    no percentile UDAF: pre-aggregate to (group, value) counts (the
    corpus-sized shuffle, map-side combined), one cumulative window per
    group over the |distinct values| rows, then each percentile is a
    CONDITIONAL MIN in a single rollup (nearest-rank definition, q304's
    formula per group). The per-group exact complement to q63's sketch
    quantiles — the right path when |distinct values| per group is
    bounded (prices, durations, scores), as here with integer cents."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", cents(F.col("value")).alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = c.select(
        "event_type",
        "v",
        F.sum("cnt").over(wcum).alias("cm"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def pick(p: int):
        rank = F.ceil(F.lit(p) * F.col("n") / 100.0)
        return (
            F.min(F.when(F.col("cm") >= rank, F.col("v")))
            .cast("long")
            .alias(f"p{p}_cents")
        )

    return cum.groupBy("event_type").agg(pick(10), pick(50), pick(90))


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
    "q339_mutual_information",
    oracle="""
    WITH j AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, dow, c,
             SUM(c) OVER (PARTITION BY event_type) AS cx,
             SUM(c) OVER (PARTITION BY dow) AS cy,
             SUM(c) OVER () AS n
      FROM j
    )
    SELECT CAST(SUM(CAST(ROUND(
             1000000.0 * c / n
             * LN(CAST(c AS DOUBLE) * n / (cx * cy))) AS BIGINT)) AS BIGINT)
             AS mi_micro_nats,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM m
    """,
)
def q339_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; day-of-week) — the dependence
    screen between two categorical columns (feature-selection /
    leakage-detection primitive; 0 = independent). The joint table is
    the only corpus-sized aggregation; marginals and the total are
    windows over the |types|×|dow| cells (bounded, single-digit rows —
    the q161 bounded-window idiom), and each cell's contribution is
    micro-rounded BEFORE the sum so the float total is order-
    independent. Complements q238's per-pair token PMI with the
    single-statistic column-level view."""
    ev = load(spark, sf_dir, "events")
    j = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = j.select(
        "c",
        F.sum("c").over(Window.partitionBy("event_type")).alias("cx"),
        F.sum("c").over(Window.partitionBy("dow")).alias("cy"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    term = F.round(
        F.lit(1_000_000.0)
        * F.col("c")
        / F.col("n")
        * F.log(
            F.col("c").cast("double") * F.col("n") / (F.col("cx") * F.col("cy"))
        )
    ).cast("long")
    return m.select(term.alias("t"), "n").agg(
        F.sum("t").cast("long").alias("mi_micro_nats"),
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )


@register(
    "q340_linear_interpolation",
    oracle="""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CAST(ROUND(value*100) AS BIGINT) AS v
      FROM events
    ), span AS (
      SELECT user_id,
             CAST(FLOOR(MIN(t_us) / 21600000000) AS BIGINT) * 21600000000
               AS h0,
             CAST(FLOOR(MAX(t_us) / 21600000000) AS BIGINT) * 21600000000
               AS h1
      FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, 21600000000)) AS t_us
      FROM span
    ), u AS (
      SELECT user_id, t_us, v, 1 AS is_obs FROM obs
      UNION ALL
      SELECT user_id, t_us, NULL, 0 FROM grid
    ), f AS (
      SELECT user_id, t_us, is_obs,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, is_obs DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_obs DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, is_obs
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_obs
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM u
    )
    SELECT user_id, t_us,
           ROUND(CASE
             WHEN nt IS NULL THEN CAST(pv AS DOUBLE)
             WHEN pt IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nt = pt THEN CAST(pv AS DOUBLE)
             ELSE pv + (nv - pv) * CAST(t_us - pt AS DOUBLE) / (nt - pt)
           END, 6) AS interp_cents
    FROM f WHERE is_obs = 0
    """,
)
def q340_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation onto a regular 6-hour grid (the resampling
    mode q78's forward-fill cannot express): union the observations with
    the per-entity grid, then ONE entity-partitioned pass computes, for
    every grid point, the surrounding observations via last/first-value
    IGNORE NULLS windows in both directions — the standard union-spine
    idiom, never an as-of join per grid point. Tie order (t, is_obs)
    makes a grid point that lands ON an observation reproduce it
    exactly; edges degrade to nearest-value. Exact integer inputs; one
    float blend per output row."""
    ev = load(spark, sf_dir, "events")
    step = 21_600_000_000
    obs = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        cents(F.col("value")).alias("v"),
    )
    span = obs.groupBy("user_id").agg(
        (F.floor(F.min("t_us") / step) * step).cast("long").alias("h0"),
        (F.floor(F.max("t_us") / step) * step).cast("long").alias("h1"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.lit(step))
        ).alias("t_us"),
    )
    u = obs.withColumn("is_obs", F.lit(1)).unionByName(
        grid.select(
            "user_id", "t_us", F.lit(None).cast("long").alias("v"),
            F.lit(0).alias("is_obs"),
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us"), F.col("is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us"), F.col("is_obs"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("v").isNotNull(), F.col("t_us"))
    f = u.select(
        "user_id",
        "t_us",
        "is_obs",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = (
        F.when(F.col("nt").isNull(), F.col("pv").cast("double"))
        .when(F.col("pt").isNull(), F.col("nv").cast("double"))
        .when(F.col("nt") == F.col("pt"), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t_us") - F.col("pt")).cast("double")
            / (F.col("nt") - F.col("pt"))
        )
    )
    return f.filter(F.col("is_obs") == 0).select(
        "user_id", "t_us", F.round(interp, 6).alias("interp_cents")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve, bitmap sliding MAU (q341-q342)
# ---------------------------------------------------------------------------


@register(
    "q341_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR((epoch_us(MIN(ts)) - 1704067200000000)
                  / 604800000000) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT e.user_id, f.cohort_week,
             CAST(FLOOR((epoch_us(e.ts) - 1704067200000000)
                  / 604800000000) AS BIGINT) - f.cohort_week AS age_weeks,
             CAST(ROUND(e.value*100) AS BIGINT) AS cents
      FROM events e JOIN firsts f USING (user_id)
    ), wk AS (
      SELECT cohort_week, age_weeks,
             SUM(cents) AS week_cents,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
      FROM rev GROUP BY cohort_week, age_weeks
    ), sz AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    )
    SELECT w.cohort_week, w.age_weeks, s.cohort_size, w.active_users,
           CAST(SUM(w.week_cents) OVER (
             PARTITION BY w.cohort_week ORDER BY w.age_weeks
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_cents,
           ROUND(CAST(SUM(w.week_cents) OVER (
             PARTITION BY w.cohort_week ORDER BY w.age_weeks
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / s.cohort_size, 6) AS ltv_cents_per_user
    FROM wk w JOIN sz s USING (cohort_week)
    """,
)
def q341_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen week,
    cumulative revenue per cohort by week-age, normalized per cohort
    member — the retention-economics complement to q132's count-based
    retention matrix. Two corpus-sized aggregations (firsts, weekly
    revenue), then windows over the tiny cohort×age grid; exact integer
    cents until the one per-user division."""
    ev = load(spark, sf_dir, "events")
    # numeric epoch anchor (2024-01-01 UTC): a literal-timestamp
    # unix_micros() breaks under the driver's TIMESTAMP_NTZ session type
    epoch0 = F.lit(1_704_067_200_000_000)
    week = F.floor(
        (F.unix_micros("ts") - epoch0) / F.lit(604_800_000_000)
    ).cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    rev = ev.select(
        "user_id", week.alias("w"), cents(F.col("value")).alias("cents")
    ).join(firsts, "user_id")
    wk = rev.groupBy(
        "cohort_week", (F.col("w") - F.col("cohort_week")).alias("age_weeks")
    ).agg(
        F.sum("cents").alias("week_cents"),
        F.countDistinct("user_id").cast("long").alias("active_users"),
    )
    sz = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = wk.join(F.broadcast(sz), "cohort_week")
    cum = F.sum("week_cents").over(wcum)
    return j.select(
        "cohort_week",
        "age_weeks",
        "cohort_size",
        "active_users",
        cum.cast("long").alias("cum_cents"),
        F.round(cum.cast("double") / F.col("cohort_size"), 6).alias(
            "ltv_cents_per_user"
        ),
    )


@register(
    "q342_sliding_mau_bitmask",
    allow_non_equi="deliberate 24-row broadcast window-offset spine over the per-user 8-byte day-bitmask rollup",
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(FLOOR((epoch_us(ts) - 1704067200000000)
                        / 86400000000) AS INT) AS day_idx
      FROM events
    ), m AS (
      SELECT user_id,
             BIT_OR(CAST(1 AS BIGINT) << day_idx) AS day_mask
      FROM d WHERE day_idx BETWEEN 0 AND 63 GROUP BY user_id
    ), off AS (SELECT UNNEST(range(24)) AS start_day)
    SELECT start_day,
           CAST(SUM(CASE WHEN (day_mask >> CAST(start_day AS INT)) & 127 <> 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS active_users_7d
    FROM m, off
    GROUP BY start_day
    """,
)
def q342_sliding_mau_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding 7-day active users from per-user day BITMASKS: one
    aggregation ORs each user's active days into a 30-bit mask (8 bytes
    per user, the bitmap-index idea), then every window position is a
    shift-and-mask test — 24 window answers from ONE corpus pass,
    where the naive COUNT(DISTINCT) recomputes the corpus per window
    (q139's rolling WAU pays a window-sized state instead). The offset
    spine is a bounded 24-row broadcast; per (user, offset) work is
    pure bit math. Day indices outside [0, 63] are filtered out in BOTH
    engines before the shift — a 64-bit mask can only carry 64 days, and
    an unguarded 1<<d wraps mod 64 in Spark while DuckDB yields 0/error,
    silently corrupting counts if the events window ever moves."""
    ev = load(spark, sf_dir, "events")
    epoch0 = F.lit(1_704_067_200_000_000)
    day_idx = F.floor(
        (F.unix_micros("ts") - epoch0) / F.lit(86_400_000_000)
    ).cast("int")
    # shiftleft/shiftright take a literal bit count in the Python API;
    # a COLUMN shift goes through expr()
    m = (
        ev.select("user_id", day_idx.alias("d"))
        .filter(F.col("d").between(0, 63))
        .select("user_id", F.expr("shiftleft(cast(1 as bigint), d)").alias("bit"))
        .groupBy("user_id")
        .agg(F.expr("bit_or(bit)").alias("day_mask"))
    )
    off = spark.createDataFrame([(i,) for i in range(24)], ["start_day"])
    j = m.crossJoin(F.broadcast(off))
    active = (
        F.expr("shiftright(day_mask, cast(start_day as int))")
        .bitwiseAND(F.lit(127))
        != 0
    )
    return j.groupBy("start_day").agg(
        F.sum(F.when(active, 1).otherwise(0))
        .cast("long")
        .alias("active_users_7d")
    )


# ---------------------------------------------------------------------------
# At-scale near-dup variants from the round-5 decade measurement (q343-q344)
# ---------------------------------------------------------------------------


@register(
    "q343_winnow_near_dups_capped",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, length(lower(text)) - 6),
                            i -> md5(substr(lower(text), i, 8))) AS hashes
      FROM documents WHERE length(text) >= 8
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hashes) - 2),
                           j -> list_min(hashes[j : j + 3]))) AS fps
      FROM grams WHERE len(hashes) >= 4
    ), idx0 AS (
      SELECT doc_id, unnest(fps) AS fp FROM wins
    ), hot AS (
      SELECT fp FROM idx0 GROUP BY fp HAVING COUNT(*) > 64
    ), idx AS (
      SELECT i.doc_id, i.fp FROM idx0 i ANTI JOIN hot h ON i.fp = h.fp
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 10
    """,
)
def q343_winnow_near_dups_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98-adjacent — winnowing near-dup pairs with a document-frequency
    CAP on fingerprints (max_df=64), the at-scale form of q61. The
    round-5 decade measurement (SCALING.md) showed char-8-gram diversity
    saturating as the corpus grows: 10× docs → mean fingerprint df
    2.8 → 9.4 and candidate pairs 5.5M → 513M (~n²). Dropping
    fingerprints held by >max_df documents before the self-join (the
    MOSS boilerplate rule) bounds candidates at |fps|·max_df²/2 —
    linear in the corpus — while truly-duplicated content still shares
    ≥10 RARE fingerprints and survives. Fully oracle-checked (the cap
    is one more relational step: df rollup + anti join, identical in
    DuckDB)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    return winnow_near_duplicates(
        docs, "doc_id", "text", 8, 4, min_shared=10, max_df=64
    )


@register("q344_cosine_dup_lsh_auto")  # rows-only: numpy hyperplane LSH
def q344_cosine_dup_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with CORPUS-SIZED LSH geometry
    (lsh_geometry_for): plane count grows with log2(n) so bucket
    sizes — and candidate volume — stay ~linear in the corpus, where
    q47's fixed 4×16 geometry grows candidates ~n²/2^b (measured
    exponent 1.83 over a real decade at dedup threshold 0.85; auto
    geometry brings it to ~linear — SCALING.md). Threshold 0.5 here
    because the driver's embedding table is isotropic (zero pairs
    above 0.6); the dedup-regime recall pin (0.85 on planted
    near-dups) lives in tests/test_similarity.py. Precision is exact
    (verify step). Rows-only by design (numpy hyperplanes are
    deterministic but not SQL-expressible)."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        cosine_near_duplicates,
    )

    emb = load(spark, sf_dir, "embeddings")
    return cosine_near_duplicates(
        emb, 64, "vec_id", "embedding", threshold=0.5, auto_geometry=True
    )


# ---------------------------------------------------------------------------
# Round-5 widening: exact substring dedup spans, bigram LM scoring (q345-q347)
# ---------------------------------------------------------------------------


_REPEATED_SPAN_ORACLE = r"""
    WITH base AS (
      SELECT doc_id, lower(text) AS s FROM documents
      WHERE len(lower(text)) >= 20
    ), grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(s, CAST(i AS INT), 20) AS gram
      FROM base, UNNEST(range(1, len(s) - 18)) AS t(i)
    ), hot AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), rep AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN hot USING (gram)
    ), lagged AS (
      SELECT doc_id, pos,
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM rep
    ), isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos > prev + 20 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM lagged
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 20 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 20 - MIN(pos) AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, island
"""


@register("q345_repeated_substring_spans", oracle=_REPEATED_SPAN_ORACLE)
def q345_repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X275 — exact repeated-substring spans (the relational form of
    Lee et al. 2021 suffix-array exact-substring dedup): maximal
    character intervals whose every 20-char window occurs ≥2 times
    corpus-wide. Float-free and deterministic, so fully hash-oracle-
    checked. No pairwise join anywhere — gram rollup + semi-join +
    per-doc island windows, all linear in total characters (the
    SCALING.md gram-saturation n² failure mode cannot apply)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_substring_spans,
    )

    docs = _spread(load(spark, sf_dir, "documents"))
    return repeated_substring_spans(docs, "doc_id", "text", k=20, min_count=2)


@register(
    "q346_repeated_substring_stats",
    oracle=r"""
    WITH spans AS (
""" + _REPEATED_SPAN_ORACLE + r"""
    ), per_doc AS (
      SELECT doc_id, SUM(span_len) AS repeated_chars
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(lower(d.text)) AS BIGINT) AS char_len,
           CAST(COALESCE(p.repeated_chars, 0) AS BIGINT) AS repeated_chars,
           ROUND(CAST(COALESCE(p.repeated_chars, 0) AS DOUBLE)
                 / len(lower(d.text)), 6) AS repeated_frac,
           COALESCE(p.repeated_chars, 0) < 0.2 * len(lower(d.text)) AS keep
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    WHERE len(lower(d.text)) > 0
    """,
)
def q346_repeated_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X276 — per-document repeated-substring budget: total characters
    inside q345's spans, the repeated fraction, and the Lee-et-al-style
    keep/drop gate (drop when ≥20% of the document is verbatim-repeated
    content). Spans are disjoint by construction so the per-doc rollup
    is a plain sum; docs with no spans keep frac 0 via left join."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_substring_spans,
    )

    docs = _spread(load(spark, sf_dir, "documents"))
    spans = repeated_substring_spans(docs, "doc_id", "text", k=20, min_count=2)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("repeated_chars")
    )
    base = docs.select(
        "doc_id", F.length(F.lower(F.col("text"))).cast("long").alias("char_len")
    ).filter(F.col("char_len") > 0)
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "char_len",
            F.coalesce(F.col("repeated_chars"), F.lit(0))
            .cast("long")
            .alias("repeated_chars"),
            F.round(
                F.coalesce(F.col("repeated_chars"), F.lit(0)).cast("double")
                / F.col("char_len"),
                6,
            ).alias("repeated_frac"),
            (
                F.coalesce(F.col("repeated_chars"), F.lit(0))
                < 0.2 * F.col("char_len")
            ).alias("keep"),
        )
    )


@register(
    "q347_bigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the vocabulary-size scalar for LM smoothing (same shape as q137)",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), nz AS (
      SELECT doc_id, tk FROM toks WHERE len(tk) > 0
    ), big AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk) + 1),
               i -> struct_pack(
                 p := CASE WHEN i = 1 THEN '<s>' ELSE tk[i - 1] END,
                 c := tk[i]))) AS pc
      FROM nz
    ), b AS (
      SELECT doc_id, pc.p AS p, pc.c AS c FROM big
    ), mb AS (
      SELECT p, c, COUNT(*) AS cb FROM b GROUP BY p, c
    ), mp AS (
      SELECT p, COUNT(*) AS cp FROM b GROUP BY p
    ), vv AS (
      SELECT COUNT(DISTINCT c) AS v FROM b
    ), scored AS (
      SELECT b.doc_id, COUNT(*) AS n_tokens,
             SUM(ln((mb.cb + 1.0) / (mp.cp + vv.v))) AS lp
      FROM b JOIN mb USING (p, c) JOIN mp USING (p) CROSS JOIN vv
      GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_bigram_logprob
    FROM scored
    """,
)
def q347_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277 — add-one-smoothed BIGRAM language model fit on the corpus
    itself, each document scored by mean token log-probability with a
    BOS context — the next step up from q137's unigram perplexity proxy
    and the actual filter shape (KenLM-style n-gram scoring) curation
    pipelines run when a trained LM isn't on the cluster.

    Plan: one zip_with builds each document's (prev, cur) pairs
    row-locally (no self-join); the bigram model is a hash aggregate on
    (p, c); scoring joins the token stream back to the model on the
    SAME (p, c) key (equi-join, AQE-skew-safe), the |contexts|-sized
    count table broadcasts, and the vocab-size scalar rides a 1-row
    cross join. Log floats round to 6dp for cross-engine hash
    stability (q137's policy)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    base = docs.select("doc_id", toks.alias("_t")).filter(F.size("_t") > 0)
    prevs = F.concat(
        F.array(F.lit("<s>")), F.slice(F.col("_t"), 1, F.size("_t") - 1)
    )
    b = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                prevs,
                F.col("_t"),
                lambda p, c: F.struct(p.alias("p"), c.alias("c")),
            )
        ).alias("_pc"),
    ).select("doc_id", F.col("_pc.p").alias("p"), F.col("_pc.c").alias("c"))
    mb = b.groupBy("p", "c").agg(F.count(F.lit(1)).alias("cb"))
    mp = b.groupBy("p").agg(F.count(F.lit(1)).alias("cp"))
    vv = b.agg(F.countDistinct("c").alias("v"))
    scored = (
        b.join(mb, ["p", "c"])
        .join(F.broadcast(mp), "p")
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log((F.col("cb") + 1.0) / (F.col("cp") + F.col("v")))
            ).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_bigram_logprob"),
    )


@register(
    "q348_repeated_span_excision",
    oracle=r"""
    WITH spans AS (
""" + _REPEATED_SPAN_ORACLE + r"""
    ), segs AS (
      SELECT doc_id, span_start, span_end,
             COALESCE(LAG(span_end) OVER (PARTITION BY doc_id
                                          ORDER BY span_start), 1) AS keep_from
      FROM spans
    ), kept AS (
      SELECT doc_id,
             string_agg(substr(lower(text), CAST(keep_from AS INT),
                               CAST(span_start - keep_from AS INT)),
                        '' ORDER BY span_start) AS head_part,
             MAX(span_end) AS last_end,
             SUM(span_end - span_start) AS removed_chars
      FROM segs JOIN documents USING (doc_id)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN k.doc_id IS NULL THEN lower(d.text)
                ELSE COALESCE(k.head_part, '')
                     || substr(lower(d.text), CAST(k.last_end AS INT))
           END AS new_text,
           CAST(COALESCE(k.removed_chars, 0) AS BIGINT) AS removed_chars
    FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
    """,
)
def q348_repeated_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X278 — repeated-span EXCISION: rewrite each document with q345's
    verbatim-repeated spans cut out (the action step of exact-substring
    dedup; policy here is remove-everywhere, the conservative variant of
    Lee et al.'s drop-one-occurrence — documented, deterministic, and
    hash-checkable; output text is the lower() normalization q345's
    offsets index).

    Plan: spans (already per-doc disjoint) get their keep-segment start
    via one lag window; per-doc string surgery is a sort-free aggregation
    — min-struct/concat of ordered segments via sort_array(collect_list)
    of (start, segment) structs, then one substr for the tail. Docs with
    no spans pass through via left join. Everything is per-doc bounded;
    the only shuffles are q345's plus one (doc_id) aggregation."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_substring_spans,
    )

    docs = _spread(load(spark, sf_dir, "documents"))
    spans = repeated_substring_spans(docs, "doc_id", "text", k=20, min_count=2)
    w = Window.partitionBy("doc_id").orderBy("span_start")
    segs = spans.select(
        "doc_id",
        "span_start",
        "span_end",
        F.coalesce(F.lag("span_end").over(w), F.lit(1)).alias("keep_from"),
    )
    low = F.lower(F.col("text"))
    kept = (
        segs.join(docs.select("doc_id", "text"), "doc_id")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("span_start").alias("s"),
                                low.substr(
                                    F.col("keep_from").cast("int"),
                                    (F.col("span_start") - F.col("keep_from")).cast(
                                        "int"
                                    ),
                                ).alias("seg"),
                            )
                        )
                    ),
                    lambda st: st["seg"],
                ),
                "",
            ).alias("head_part"),
            F.max("span_end").alias("last_end"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("removed_chars"),
        )
    )
    return (
        docs.select("doc_id", "text")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("last_end").isNull(), low)
            .otherwise(
                F.concat(
                    F.coalesce(F.col("head_part"), F.lit("")),
                    low.substr(F.col("last_end").cast("int"), F.length(low)),
                )
            )
            .alias("new_text"),
            F.coalesce(F.col("removed_chars"), F.lit(0))
            .cast("long")
            .alias("removed_chars"),
        )
    )


@register(
    "q349_ngram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(tk) - 2),
                    i -> array_to_string(tk[i:i+3], ' '))) AS gram
      FROM toks WHERE len(tk) >= 4
    ), df AS (
      SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_grams,
           ROUND(CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_frac
    FROM g JOIN df USING (gram)
    GROUP BY g.doc_id
    """,
)
def q349_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X279 — distinct-4-gram novelty: for each document, the fraction
    of its distinct word 4-grams appearing in NO other document — the
    corpus-diversity / memorization screen used on generated corpora
    (low novelty = the doc is stitched from corpus-common phrasing; the
    per-corpus aggregate is the standard distinct-n metric).

    Shape: row-local 4-gram arrays (no explode until needed),
    array_distinct before the explode so the (doc, gram) relation is
    set-valued, one hash aggregate for document frequency, and an
    equi-join back — the exact inverted-index shuffle q345 uses, linear
    in corpus grams. DuckDB's list slicing is end-INCLUSIVE (tk[i:i+3]
    is 4 items) where Spark's slice(toks, i, 4) takes a length — both
    sides emit 4-token grams."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    g = (
        docs.select("doc_id", F.array_distinct(_word_ngrams(toks, 4)).alias("_g"))
        .filter(F.size("_g") > 0)
        .select("doc_id", F.explode("_g").alias("gram"))
    )
    df_ = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        g.join(df_, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
            .cast("long")
            .alias("novel_grams"),
            F.round(
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series symbolization + histogram outlier scoring (q350-q351)
# ---------------------------------------------------------------------------


@register(
    "q350_sax_words",
    oracle=r"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), u AS (
      SELECT user_id, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ssq
      FROM daily GROUP BY user_id HAVING COUNT(*) >= 6
    ), pos AS (
      SELECT d.user_id, d.c, u.n, u.s, u.ssq,
             ROW_NUMBER() OVER (PARTITION BY d.user_id ORDER BY d.day) - 1 AS p
      FROM daily d JOIN u USING (user_id)
    ), seg AS (
      SELECT user_id,
             CAST(FLOOR((p * 6) / CAST(n AS DOUBLE)) AS BIGINT) AS sg,
             SUM(c) AS seg_s, COUNT(*) AS seg_n,
             MAX(n) AS n, MAX(s) AS s, MAX(ssq) AS ssq
      FROM pos
      GROUP BY user_id, CAST(FLOOR((p * 6) / CAST(n AS DOUBLE)) AS BIGINT)
    ), sym AS (
      SELECT user_id, sg,
             CASE
               WHEN n * ssq - s * s = 0 THEN 'c'
               WHEN CAST(n * seg_s - seg_n * s AS DOUBLE)
                    / (CAST(seg_n AS DOUBLE)
                       * sqrt(CAST(n * ssq - s * s AS DOUBLE))) < -0.6745 THEN 'a'
               WHEN CAST(n * seg_s - seg_n * s AS DOUBLE)
                    / (CAST(seg_n AS DOUBLE)
                       * sqrt(CAST(n * ssq - s * s AS DOUBLE))) < 0.0 THEN 'b'
               WHEN CAST(n * seg_s - seg_n * s AS DOUBLE)
                    / (CAST(seg_n AS DOUBLE)
                       * sqrt(CAST(n * ssq - s * s AS DOUBLE))) < 0.6745 THEN 'c'
               ELSE 'd'
             END AS symbol
      FROM seg
    ), words AS (
      SELECT user_id, STRING_AGG(symbol, '' ORDER BY sg) AS sax_word
      FROM sym GROUP BY user_id
    )
    SELECT sax_word, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS example_user
    FROM words GROUP BY sax_word
    """,
)
def q350_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X280 — SAX (Symbolic Aggregate approXimation) words over each
    user's daily-spend series: PAA into 6 segments, per-user
    z-normalization, 4-symbol Gaussian breakpoints (±0.6745, 0), then
    the corpus motif table (word → user count) — the standard symbolic
    compaction that turns a 100 TB series store into a string column
    motif-mining / anomaly screens can index (Lin et al., DMKD 2007).

    Engine-exactness is the design constraint: a naive z-score averages
    doubles per segment, and cross-engine double-summation order breaks
    hash equality. Instead both sides compute the segment z-score in one
    exact algebraic step from INTEGER aggregates — z_seg = (n·seg_s −
    seg_n·s) / (seg_n·√(n·ssq − s²)) — every operand an int64, the only
    float ops a correctly-rounded sqrt/mul/div chain, so Spark and
    DuckDB produce bit-identical symbols. Zero-variance series map to
    'c' (flat) explicitly.

    Shape: one (user, day) hash aggregate, one per-user window for the
    position index (partition-local sort), one (user, segment)
    aggregate, one per-user word roll-up — all on the same user_id
    exchange, no data-dependent joins; at 1000 executors this is a
    single shuffle family keyed by user."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).alias("c"))
    u = (
        daily.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ssq"),
        )
        .filter(F.col("n") >= 6)
    )
    wpos = Window.partitionBy("user_id").orderBy("day")
    pos = daily.join(u, "user_id").withColumn(
        "p", F.row_number().over(wpos) - F.lit(1)
    )
    seg = pos.groupBy(
        "user_id",
        F.floor((F.col("p") * 6) / F.col("n").cast("double"))
        .cast("long")
        .alias("sg"),
    ).agg(
        F.sum("c").alias("seg_s"),
        F.count(F.lit(1)).alias("seg_n"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("ssq").alias("ssq"),
    )
    var_num = F.col("n") * F.col("ssq") - F.col("s") * F.col("s")
    z = (F.col("n") * F.col("seg_s") - F.col("seg_n") * F.col("s")).cast(
        "double"
    ) / (F.col("seg_n").cast("double") * F.sqrt(var_num.cast("double")))
    sym = seg.select(
        "user_id",
        "sg",
        F.when(var_num == 0, F.lit("c"))
        .when(z < -0.6745, F.lit("a"))
        .when(z < 0.0, F.lit("b"))
        .when(z < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("symbol"),
    )
    words = sym.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sg"), F.col("symbol")))
                ),
                lambda st: st["symbol"],
            ),
            "",
        ).alias("sax_word")
    )
    return words.groupBy("sax_word").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("user_id").cast("long").alias("example_user"),
    )


@register(
    "q351_hbos_outliers",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross joins: attaching the "
        "global (min,max,count) feature-stats scalar to the per-user "
        "feature frame for fixed-width binning - O(|users|) x 1"
    ),
    oracle=r"""
    WITH u AS (
      SELECT user_id, COUNT(*) AS n_ev,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s_c,
             COUNT(DISTINCT CAST(ts AS DATE)) AS n_d
      FROM events GROUP BY user_id
    ), st AS (
      SELECT MIN(n_ev) AS mn1, MAX(n_ev) AS mx1,
             MIN(s_c)  AS mn2, MAX(s_c)  AS mx2,
             MIN(n_d)  AS mn3, MAX(n_d)  AS mx3,
             COUNT(*) AS n FROM u
    ), b AS (
      SELECT u.user_id, st.n,
        CASE WHEN mx1 = mn1 THEN 0 ELSE LEAST(9, CAST(FLOOR(
          ((n_ev - mn1) * 10) / CAST(mx1 - mn1 AS DOUBLE)) AS BIGINT)) END AS b1,
        CASE WHEN mx2 = mn2 THEN 0 ELSE LEAST(9, CAST(FLOOR(
          ((s_c - mn2) * 10) / CAST(mx2 - mn2 AS DOUBLE)) AS BIGINT)) END AS b2,
        CASE WHEN mx3 = mn3 THEN 0 ELSE LEAST(9, CAST(FLOOR(
          ((n_d - mn3) * 10) / CAST(mx3 - mn3 AS DOUBLE)) AS BIGINT)) END AS b3
      FROM u CROSS JOIN st
    ), c1 AS (SELECT b1, COUNT(*) AS c FROM b GROUP BY b1),
       c2 AS (SELECT b2, COUNT(*) AS c FROM b GROUP BY b2),
       c3 AS (SELECT b3, COUNT(*) AS c FROM b GROUP BY b3)
    SELECT b.user_id,
           ROUND(3 * LOG10(CAST(b.n AS DOUBLE))
                 - LOG10(CAST(c1.c AS DOUBLE))
                 - LOG10(CAST(c2.c AS DOUBLE))
                 - LOG10(CAST(c3.c AS DOUBLE)), 6) AS hbos_score
    FROM b JOIN c1 USING (b1) JOIN c2 USING (b2) JOIN c3 USING (b3)
    ORDER BY hbos_score DESC, b.user_id
    LIMIT 20
    """,
)
def q351_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X281 — HBOS (Histogram-Based Outlier Score, Goldstein & Dengel
    2012) over per-user behavioral features (event count, total spend
    cents, active days): 10 fixed-width bins per feature, score =
    Σ_f −log10(binCount_f(x)/N) — the linear-time, embarrassingly
    parallel anomaly detector you reach for at 100 TB when isolation
    forests / kNN-based LOF can't shard (each feature's histogram is one
    tiny aggregate; scoring is a 3-way broadcast join).

    Engine-exactness: features and bin edges are pure integers; the bin
    index is floor((x−min)·10 / (max−min)) — an exact int64 numerator
    divided by an exact int64, one correctly-rounded IEEE division both
    engines share, so bins match bit-for-bit. log10 of small-int-valued
    doubles is the only libm call; scores are ROUND(...,6) and the
    top-20 is ordered by the ROUNDED score (then user_id) so a last-ulp
    libm divergence cannot reorder the result.

    Shape: one user aggregate, one 1-row stats scalar (broadcast), three
    ≤10-row histogram aggregates (broadcast joins), one TakeOrdered
    top-k — no wide shuffle beyond the initial user_id aggregation."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.sum(cents(F.col("value"))).alias("s_c"),
        F.countDistinct(F.to_date("ts")).alias("n_d"),
    )
    st = u.agg(
        F.min("n_ev").alias("mn1"), F.max("n_ev").alias("mx1"),
        F.min("s_c").alias("mn2"), F.max("s_c").alias("mx2"),
        F.min("n_d").alias("mn3"), F.max("n_d").alias("mx3"),
        F.count(F.lit(1)).alias("n"),
    )

    def _bin(x, mn, mx):
        return (
            F.when(F.col(mx) == F.col(mn), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(9),
                    F.floor(
                        ((F.col(x) - F.col(mn)) * 10)
                        / (F.col(mx) - F.col(mn)).cast("double")
                    ).cast("long"),
                )
            )
        )

    b = u.crossJoin(F.broadcast(st)).select(
        "user_id",
        "n",
        _bin("n_ev", "mn1", "mx1").alias("b1"),
        _bin("s_c", "mn2", "mx2").alias("b2"),
        _bin("n_d", "mn3", "mx3").alias("b3"),
    )
    c1 = b.groupBy("b1").agg(F.count(F.lit(1)).alias("c_1"))
    c2 = b.groupBy("b2").agg(F.count(F.lit(1)).alias("c_2"))
    c3 = b.groupBy("b3").agg(F.count(F.lit(1)).alias("c_3"))
    scored = (
        b.join(F.broadcast(c1), "b1")
        .join(F.broadcast(c2), "b2")
        .join(F.broadcast(c3), "b3")
        .select(
            "user_id",
            F.round(
                3 * F.log10(F.col("n").cast("double"))
                - F.log10(F.col("c_1").cast("double"))
                - F.log10(F.col("c_2").cast("double"))
                - F.log10(F.col("c_3").cast("double")),
                6,
            ).alias("hbos_score"),
        )
    )
    return scored.orderBy(F.desc("hbos_score"), F.asc("user_id")).limit(20)


@register("q352_dtw_route_change")  # rows-only: DTW recurrence is not ANSI-SQL
def q352_dtw_route_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X282 — banded-DTW day-over-day route-change detection on the
    deterministic synthetic coordinates (P9's _with_coords): for each
    user and each adjacent day pair, the Sakoe-Chiba-banded dynamic-
    time-warping haversine distance between the two day tracks,
    normalized per step — the AIS "did the route change" screen that
    pointwise lag distances (q19) cannot express because it must align
    tracks of different lengths/phases.

    Scale shape (see operators/trajectory.py): pairing is structural —
    day d vs day d+1 within a user — so comparisons are linear in the
    fact table, one applyInPandas shuffle on user_id, per-pair DP
    bounded by max_points·(2r+1). No SQL oracle BY DESIGN: the DTW
    recurrence (per-cell min over three predecessors) has no fixed
    ANSI-SQL form; correctness is pinned by known-value and
    band-equivalence tests in tests/test_trajectory.py."""
    from noaa_ais_glue_lakehouse_spark.operators.trajectory import (
        dtw_day_over_day,
    )

    ev = _with_coords(load(spark, sf_dir, "events"))
    return dtw_day_over_day(
        ev, "user_id", "ts", "lat", "lon", radius=5, max_points=32
    )


# ---------------------------------------------------------------------------
# Trajectory analytics: OD flows + straightness index (q353-q354)
# ---------------------------------------------------------------------------

_HAV_HM_SQL = """CAST(ROUND(2*6371*ASIN(LEAST(SQRT(
  POW(SIN(RADIANS({la2}-{la1})/2),2)
  + COS(RADIANS({la1}))*COS(RADIANS({la2}))*POW(SIN(RADIANS({lo2}-{lo1})/2),2)
), 1.0)) * 10) AS BIGINT)"""


@register(
    "q353_od_flow_matrix",
    oracle=_COORDS_CTE
    + """
    , c AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
             CAST(FLOOR(lat / 5.0) AS BIGINT) AS lat_cell,
             CAST(FLOOR(lon / 5.0) AS BIGINT) AS lon_cell
      FROM coords
    ), r AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, day
                           ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY user_id, day
                           ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM c
    ), trips AS (
      SELECT user_id, day,
             MAX(CASE WHEN rn_a = 1 THEN lat_cell END) AS o_lat_cell,
             MAX(CASE WHEN rn_a = 1 THEN lon_cell END) AS o_lon_cell,
             MAX(CASE WHEN rn_d = 1 THEN lat_cell END) AS d_lat_cell,
             MAX(CASE WHEN rn_d = 1 THEN lon_cell END) AS d_lon_cell
      FROM r GROUP BY user_id, day
    )
    SELECT o_lat_cell, o_lon_cell, d_lat_cell, d_lon_cell,
           CAST(COUNT(*) AS BIGINT) AS n_trips,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM trips
    GROUP BY o_lat_cell, o_lon_cell, d_lat_cell, d_lon_cell
    """,
)
def q353_od_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X283 — origin-destination flow matrix: each (user, day) is a
    trip from its first to its last 5° grid cell (ts-ordered); flows
    aggregate trips and distinct travellers per (origin, destination)
    cell pair — the transport-analytics rollup (and the AIS voyage
    origin/destination table) built from raw pings.

    Shape: the first/last extraction is the two-window ROW_NUMBER
    trick folded into ONE aggregate (MAX over rn=1 flags), so the whole
    query is a single (user, day) exchange — both windows and the
    group-by share the partitioning — followed by a low-cardinality
    flow rollup. No joins at all; at 1000 executors this is two hash
    aggregates on naturally high-cardinality keys."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    c = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        grid_cell(F.col("lat"), 5.0).alias("lat_cell"),
        grid_cell(F.col("lon"), 5.0).alias("lon_cell"),
    )
    wa = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = c.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    trips = r.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("lat_cell"))).alias("o_lat_cell"),
        F.max(F.when(F.col("rn_a") == 1, F.col("lon_cell"))).alias("o_lon_cell"),
        F.max(F.when(F.col("rn_d") == 1, F.col("lat_cell"))).alias("d_lat_cell"),
        F.max(F.when(F.col("rn_d") == 1, F.col("lon_cell"))).alias("d_lon_cell"),
    )
    return trips.groupBy(
        "o_lat_cell", "o_lon_cell", "d_lat_cell", "d_lon_cell"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_trips"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "q354_trajectory_straightness",
    oracle=_COORDS_CTE
    + """
    , c AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, lat, lon
      FROM coords
    ), lagged AS (
      SELECT *,
        LAG(lat) OVER (PARTITION BY user_id, day
                       ORDER BY ts, event_id) AS prev_lat,
        LAG(lon) OVER (PARTITION BY user_id, day
                       ORDER BY ts, event_id) AS prev_lon,
        ROW_NUMBER() OVER (PARTITION BY user_id, day
                           ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY user_id, day
                           ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM c
    ), agg AS (
      SELECT user_id, day,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             SUM(CASE WHEN prev_lat IS NULL THEN 0 ELSE """
    + _HAV_HM_SQL.format(la1="prev_lat", lo1="prev_lon", la2="lat", lo2="lon")
    + """ END) AS path_hm,
             MAX(CASE WHEN rn_a = 1 THEN lat END) AS f_lat,
             MAX(CASE WHEN rn_a = 1 THEN lon END) AS f_lon,
             MAX(CASE WHEN rn_d = 1 THEN lat END) AS l_lat,
             MAX(CASE WHEN rn_d = 1 THEN lon END) AS l_lon
      FROM lagged GROUP BY user_id, day
    )
    SELECT user_id, day, n_points, CAST(path_hm AS BIGINT) AS path_hm,
           """
    + _HAV_HM_SQL.format(la1="f_lat", lo1="f_lon", la2="l_lat", lo2="l_lon")
    + """ AS net_hm,
           CASE WHEN path_hm > 0 THEN ROUND(CAST("""
    + _HAV_HM_SQL.format(la1="f_lat", lo1="f_lon", la2="l_lat", lo2="l_lon")
    + """ AS DOUBLE) / CAST(path_hm AS DOUBLE), 6) END AS straightness
    FROM agg
    WHERE n_points >= 2
    """,
)
def q354_trajectory_straightness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X284 — trajectory straightness index (movement-ecology standard:
    net displacement / path length, Batschelet 1981): per (user, day),
    the summed consecutive-ping haversine path vs the first→last
    great-circle displacement — ~1 means directed transit, ~0 means
    loitering/circling; the screen that separates passage legs from
    fishing/station-keeping behavior in AIS analytics.

    Engine-exactness: each leg is rounded to an INTEGER 100 m unit
    before summation (CAST(ROUND(hav·10) AS BIGINT)), so the path sum
    is an exact int64 in any aggregation order — summing raw haversine
    doubles would be order-dependent and break cross-engine hashing.
    The 100 m quantum also keeps libm last-ulp sin/asin divergence
    ~10 orders of magnitude away from any rounding boundary.
    The final ratio is one deterministic int/int double division,
    ROUND(...,6).

    Shape: lag + two row_number flags + the aggregate all share one
    (user, day) exchange; no joins. Same single-shuffle family as
    q353."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    c = ev.select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id", "lat", "lon"
    )
    wa = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    lagged = (
        c.withColumn("prev_lat", F.lag("lat").over(wa))
        .withColumn("prev_lon", F.lag("lon").over(wa))
        .withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
    )
    leg_hm = F.round(
        haversine_km(
            F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon")
        )
        * 10
    ).cast("long")
    agg = lagged.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(
            F.when(F.col("prev_lat").isNull(), F.lit(0)).otherwise(leg_hm)
        ).alias("path_hm"),
        F.max(F.when(F.col("rn_a") == 1, F.col("lat"))).alias("f_lat"),
        F.max(F.when(F.col("rn_a") == 1, F.col("lon"))).alias("f_lon"),
        F.max(F.when(F.col("rn_d") == 1, F.col("lat"))).alias("l_lat"),
        F.max(F.when(F.col("rn_d") == 1, F.col("lon"))).alias("l_lon"),
    )
    net_hm = F.round(
        haversine_km(
            F.col("f_lat"), F.col("f_lon"), F.col("l_lat"), F.col("l_lon")
        )
        * 10
    ).cast("long")
    return agg.filter(F.col("n_points") >= 2).select(
        "user_id",
        "day",
        "n_points",
        F.col("path_hm").cast("long").alias("path_hm"),
        net_hm.alias("net_hm"),
        F.when(
            F.col("path_hm") > 0,
            F.round(net_hm.cast("double") / F.col("path_hm").cast("double"), 6),
        ).alias("straightness"),
    )


@register(
    "q355_radius_of_gyration",
    oracle="""
    WITH ci AS (
      SELECT user_id,
             event_id % 1800 - 900 AS lat_dd,
             (event_id * 7) % 3600 - 1800 AS lon_dd
      FROM events
    ), cent AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(lat_dd) AS s_lat, SUM(lon_dd) AS s_lon
      FROM ci GROUP BY user_id
    ), d AS (
      SELECT ci.user_id, cent.n,
        CAST(ROUND(2*6371*ASIN(LEAST(SQRT(
          POW(SIN(RADIANS(CAST(ci.lat_dd AS DOUBLE)/10.0
                  - (CAST(cent.s_lat AS DOUBLE)/cent.n)/10.0)/2),2)
          + COS(RADIANS((CAST(cent.s_lat AS DOUBLE)/cent.n)/10.0))
            * COS(RADIANS(CAST(ci.lat_dd AS DOUBLE)/10.0))
            * POW(SIN(RADIANS(CAST(ci.lon_dd AS DOUBLE)/10.0
                  - (CAST(cent.s_lon AS DOUBLE)/cent.n)/10.0)/2),2)
        ), 1.0)) * 10) AS BIGINT) AS d_hm
      FROM ci JOIN cent USING (user_id)
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_points,
           ROUND(SQRT(CAST(SUM(d_hm * d_hm) AS DOUBLE)
                      / MAX(n)) / 10.0, 6) AS rog_km
    FROM d GROUP BY user_id
    """,
)
def q355_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X285 — radius of gyration per user (González/Hidalgo/Barabási,
    Nature 2008): √(mean squared great-circle distance from the user's
    centroid of visited points) — THE standard mobility-range statistic
    (home-range size in movement ecology, vessel operating radius in
    AIS analytics).

    Engine-exactness: the synthetic coordinates are exact integer
    DECIdegrees (event_id % 1800 − 900), so the centroid numerators are
    int64 sums; each point→centroid distance is rounded to an integer
    100 m unit, its square summed in int64, and the final
    √(Σd²/n)/10 is one deterministic sqrt/div chain. No
    order-dependent double summation anywhere. (Arithmetic-mean
    centroid is the standard approximation; exact geodesic centroids
    need iteration and change answers by O(d²/R²).)

    Shape: one user aggregate for the centroid, one broadcast-join back
    (|users| rows), one user aggregate for the moment — two exchanges
    on user_id, no wide join."""
    ev = load(spark, sf_dir, "events")
    ci = ev.select(
        "user_id",
        (F.col("event_id") % 1800 - 900).alias("lat_dd"),
        ((F.col("event_id") * 7) % 3600 - 1800).alias("lon_dd"),
    )
    cent = ci.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lat_dd").alias("s_lat"),
        F.sum("lon_dd").alias("s_lon"),
    )
    lat_c = (F.col("s_lat").cast("double") / F.col("n")) / 10.0
    lon_c = (F.col("s_lon").cast("double") / F.col("n")) / 10.0
    d_hm = F.round(
        haversine_km(
            F.col("lat_dd").cast("double") / 10.0,
            F.col("lon_dd").cast("double") / 10.0,
            lat_c,
            lon_c,
        )
        * 10
    ).cast("long")
    d = ci.join(F.broadcast(cent), "user_id").select(
        "user_id", F.col("n"), d_hm.alias("d_hm")
    )
    return d.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_points"),
        F.round(
            F.sqrt(
                F.sum(F.col("d_hm") * F.col("d_hm")).cast("double") / F.max("n")
            )
            / 10.0,
            6,
        ).alias("rog_km"),
    )


@register(
    "q356_burstiness_memory",
    oracle="""
    WITH g0 AS (
      SELECT user_id, ts, event_id,
             (epoch_us(ts) // 1000000)
               - LAG((epoch_us(ts) // 1000000))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ), g AS (
      SELECT user_id, gap,
             LEAD(gap) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS next_gap
      FROM g0
    ), m AS (
      SELECT user_id, COUNT(gap) AS n, SUM(gap) AS s,
             SUM(gap * gap) AS ssq,
             COUNT(next_gap) AS np,
             SUM(CASE WHEN next_gap IS NOT NULL THEN gap END) AS sx,
             SUM(CASE WHEN next_gap IS NOT NULL THEN gap * gap END) AS sxx,
             SUM(next_gap) AS sy,
             SUM(next_gap * next_gap) AS syy,
             SUM(gap * next_gap) AS sxy
      FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(gap) >= 3
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           ROUND((SQRT(CAST(n * ssq - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
                 / (SQRT(CAST(n * ssq - s * s AS DOUBLE)) + CAST(s AS DOUBLE)),
                 6) AS burstiness,
           CASE WHEN (np * sxx - sx * sx) > 0 AND (np * syy - sy * sy) > 0
                THEN ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
                      / (SQRT(CAST(np * sxx - sx * sx AS DOUBLE))
                         * SQRT(CAST(np * syy - sy * sy AS DOUBLE))), 6)
           END AS memory_coef
    FROM m
    """,
)
def q356_burstiness_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X286 — Goh–Barabási burstiness B = (σ−μ)/(σ+μ) and memory
    coefficient M = corr(gap_i, gap_{i+1}) of each user's inter-event
    times (EPL 2008) — the (B, M) phase plane that separates Poisson
    traffic (0,0) from bursty human/vessel activity (B→1) and from
    periodic beacons (B→−1); a standard upstream screen for
    bot/beacon filtering in training-data event streams.

    Engine-exactness: gaps are integer epoch-seconds; every moment
    (Σg, Σg², Σg·g₊, pair-restricted marginals) is an int64 sum, so
    B = (√(n·ssq−s²) − s)/(√(n·ssq−s²) + s) and the Pearson M are
    fixed sqrt/div chains over exact integers — bit-identical across
    engines, no order-dependent double accumulation. Degenerate users
    (<3 gaps, zero-variance pairs) are filtered/NULLed explicitly.

    Shape: one lag+lead window and one aggregate, all on the user_id
    exchange; no joins."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.expr("unix_micros(ts) DIV 1000000")
    g = ev.select(
        "user_id",
        (epoch - F.lag(epoch).over(w)).alias("gap"),
        "ts",
        "event_id",
    ).withColumn("next_gap", F.lead("gap").over(w))
    m = (
        g.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap").alias("n"),
            F.sum("gap").alias("s"),
            F.sum(F.col("gap") * F.col("gap")).alias("ssq"),
            F.count("next_gap").alias("np"),
            F.sum(F.when(F.col("next_gap").isNotNull(), F.col("gap"))).alias("sx"),
            F.sum(
                F.when(F.col("next_gap").isNotNull(), F.col("gap") * F.col("gap"))
            ).alias("sxx"),
            F.sum("next_gap").alias("sy"),
            F.sum(F.col("next_gap") * F.col("next_gap")).alias("syy"),
            F.sum(F.col("gap") * F.col("next_gap")).alias("sxy"),
        )
        .filter(F.col("n") >= 3)
    )
    sd = F.sqrt((F.col("n") * F.col("ssq") - F.col("s") * F.col("s")).cast("double"))
    var_x = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(
            (sd - F.col("s").cast("double")) / (sd + F.col("s").cast("double")), 6
        ).alias("burstiness"),
        F.when(
            (var_x > 0) & (var_y > 0),
            F.round(
                (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
                6,
            ),
        ).alias("memory_coef"),
    )


@register(
    "q357_stop_detection",
    oracle="""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             (event_id * 13) % 300 AS sog_ds,
             event_id % 1800 - 900 AS lat_dd,
             (event_id * 7) % 3600 - 1800 AS lon_dd
      FROM events
    ), seq AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_all,
             CASE WHEN sog_ds < 100 THEN
               ROW_NUMBER() OVER (PARTITION BY user_id, sog_ds < 100
                                  ORDER BY ts, event_id)
             END AS rn_low
      FROM pts
    ), runs AS (
      SELECT user_id, rn_all - rn_low AS grp,
             COUNT(*) AS n_points,
             MIN(ts) AS start_ts, MAX(ts) AS end_ts,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dwell_s,
             SUM(lat_dd) AS s_lat, SUM(lon_dd) AS s_lon
      FROM seq WHERE rn_low IS NOT NULL
      GROUP BY user_id, rn_all - rn_low
      HAVING COUNT(*) >= 2
    )
    SELECT user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY start_ts, grp) AS stop_seq,
           CAST(n_points AS BIGINT) AS n_points,
           start_ts, end_ts,
           CAST(dwell_s AS BIGINT) AS dwell_s,
           ROUND(CAST(s_lat AS DOUBLE) / n_points / 10.0, 6) AS stop_lat,
           ROUND(CAST(s_lon AS DOUBLE) / n_points / 10.0, 6) AS stop_lon
    FROM runs
    """,
)
def q357_stop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X287 — stop / port-call detection: maximal runs of consecutive
    low-speed points per entity (the AIS "vessel stopped" primitive
    behind port-call tables, berth dwell, and loitering screens).
    Classic gaps-and-islands: a run is identified by
    rn_all − rn_low_only, constant exactly across consecutive low-speed
    rows; runs shorter than 2 points are noise-filtered. Reference
    parity: the movement-state flag (`common_functions_curated.py`
    movement classification) marks single rows; this aggregates the
    flag into dwell episodes with duration and a mean stop position.

    Engine-exactness: speed is an exact synthetic integer deci-knot
    channel ((event_id*13) % 300), coordinates exact integer
    deci-degrees; dwell is integer epoch-microsecond difference; the
    stop centroid is one int-sum/count division rounded to 6 dp. The
    stop_seq window is totalized by (start_ts, grp).

    Scale: two windows and one aggregate, all on the user_id exchange —
    a single shuffle at any corpus size; no joins."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 13) % 300).alias("sog_ds"),
        (F.col("event_id") % 1800 - 900).alias("lat_dd"),
        ((F.col("event_id") * 7) % 3600 - 1800).alias("lon_dd"),
    ).withColumn("is_low", F.col("sog_ds") < 100)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_low = Window.partitionBy("user_id", "is_low").orderBy("ts", "event_id")
    seq = pts.withColumn("rn_all", F.row_number().over(w_all)).withColumn(
        "rn_low", F.when(F.col("is_low"), F.row_number().over(w_low))
    )
    runs = (
        seq.filter(F.col("rn_low").isNotNull())
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_low")).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(1000000)
            )
            .cast("long")
            .alias("dwell_s"),
            F.sum("lat_dd").alias("s_lat"),
            F.sum("lon_dd").alias("s_lon"),
        )
        .filter(F.col("n_points") >= 2)
    )
    w_seq = Window.partitionBy("user_id").orderBy("start_ts", "grp")
    return runs.select(
        "user_id",
        F.row_number().over(w_seq).alias("stop_seq"),
        F.col("n_points").cast("long").alias("n_points"),
        "start_ts",
        "end_ts",
        "dwell_s",
        F.round(
            F.col("s_lat").cast("double") / F.col("n_points") / 10.0, 6
        ).alias("stop_lat"),
        F.round(
            F.col("s_lon").cast("double") / F.col("n_points") / 10.0, 6
        ).alias("stop_lon"),
    )


@register(
    "q358_geofence_containment",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id,
             CAST(event_id % 1800 - 900 AS DOUBLE) AS py,
             CAST((event_id * 7) % 3600 - 1800 AS DOUBLE) AS px
      FROM events
    ), edges(x1, y1, x2, y2) AS (
      VALUES (-900.5, -450.5, 200.5, -700.5),
             (200.5, -700.5, 900.5, -100.5),
             (900.5, -100.5, 400.5, 650.5),
             (400.5, 650.5, -100.5, 200.5),
             (-100.5, 200.5, -800.5, 550.5),
             (-800.5, 550.5, -900.5, -450.5)
    ), per_pt AS (
      SELECT user_id, event_id,
             SUM(CASE WHEN (y1 > py) <> (y2 > py)
                       AND px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                      THEN 1 ELSE 0 END) AS nc
      FROM pts CROSS JOIN edges
      GROUP BY user_id, event_id
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN nc % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inside,
           ROUND(CAST(SUM(CASE WHEN nc % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS inside_share
    FROM per_pt GROUP BY user_id
    """,
    allow_non_equi=(
        "deliberate bounded theta-join: every point is ray-cast against a "
        "broadcast 6-row polygon-edge relation (crossing-count "
        "point-in-polygon); candidate space is 6x|events|, linear in input"
    ),
)
def q358_geofence_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X288 — geofence containment: even–odd ray-casting point-in-polygon
    against a CONCAVE hexagon held as a broadcast edge relation (the
    polygon is data, not code — swap the VALUES for a zones table and the
    same plan answers "which vessels are inside the anchorage"). Crossing
    rule: a horizontal ray from the point crosses edge (v1,v2) iff the
    edge straddles the point's latitude and the intersection longitude
    lies strictly east of the point; inside ⟺ odd crossings.

    Engine-exactness: point coords are exact integer deci-degrees;
    polygon vertices sit on .5 offsets (exact dyadic doubles), so no
    point is ever on an edge's latitude and no edge is horizontal —
    the straddle test is unambiguous and the single division is by a
    nonzero exact constant. Both engines evaluate the identical IEEE
    expression tree, so even boundary comparisons agree bit-for-bit.

    Scale: BroadcastNestedLoopJoin against 6 rows (never a shuffled
    cartesian); the crossing count is map-side combinable, collapsing
    6 rows/point to 1 before the user_id exchange."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") % 1800 - 900).cast("double").alias("py"),
        ((F.col("event_id") * 7) % 3600 - 1800).cast("double").alias("px"),
    )
    verts = [
        (-900.5, -450.5),
        (200.5, -700.5),
        (900.5, -100.5),
        (400.5, 650.5),
        (-100.5, 200.5),
        (-800.5, 550.5),
    ]
    edges = spark.createDataFrame(
        [
            (verts[i][0], verts[i][1], verts[(i + 1) % 6][0], verts[(i + 1) % 6][1])
            for i in range(6)
        ],
        "x1 double, y1 double, x2 double, y2 double",
    )
    crosses = (
        (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    ) & (
        F.col("px")
        < F.col("x1")
        + (F.col("py") - F.col("y1"))
        * (F.col("x2") - F.col("x1"))
        / (F.col("y2") - F.col("y1"))
    )
    per_pt = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("user_id", "event_id")
        .agg(F.sum(F.when(crosses, 1).otherwise(0)).alias("nc"))
    )
    inside = F.when(F.col("nc") % 2 == 1, 1).otherwise(0)
    return per_pt.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(inside).cast("long").alias("n_inside"),
        F.round(
            F.sum(inside).cast("double") / F.count(F.lit(1)), 6
        ).alias("inside_share"),
    )


_DENSE_CELLS_SQL = """
      SELECT (lon_dd + 1800) // 50 AS cx, (lat_dd + 900) // 50 AS cy,
             ((lon_dd + 1800) // 50) * 100 + ((lat_dd + 900) // 50) AS cell_id,
             COUNT(*) AS n_pts
      FROM (SELECT event_id % 1800 - 900 AS lat_dd,
                   (event_id * 7) % 3600 - 1800 AS lon_dd
            FROM events)
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
"""

_DENSE_PAIRS_SQL = f"""
    SELECT a.cell_id AS id_a, b.cell_id AS id_b
    FROM ({_DENSE_CELLS_SQL}) a
    CROSS JOIN (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
                       (0, 1), (1, -1), (1, 0), (1, 1)) o(dx, dy)
    JOIN ({_DENSE_CELLS_SQL}) b
      ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
     AND a.cell_id < b.cell_id
"""


@register(
    "q359_grid_dbscan_clusters",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle=_cc_oracle(
        f""", dense AS ({_DENSE_CELLS_SQL}),
    lab AS (
      SELECT d.cell_id, d.n_pts,
             COALESCE(c.component, d.cell_id) AS cluster_id
      FROM dense d LEFT JOIN comp c ON c.node = d.cell_id
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_pts) AS BIGINT) AS n_points
    FROM lab GROUP BY cluster_id""",
        pairs_sql=_DENSE_PAIRS_SQL,
    ),
)
def q359_grid_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X289 — grid-density clustering (GDBSCAN on cells): bucket points
    into fixed 5°×5° grid cells, keep cells with ≥5 points (the DBSCAN
    core condition at cell granularity), connect 8-adjacent dense cells,
    and label clusters with distributed connected components. The
    standard scalable surrogate for point-DBSCAN on AIS density maps
    (anchorages, shipping lanes): the per-point neighborhood query
    becomes one groupBy plus an equi-join of the BOUNDED dense-cell
    relation against an 8-row offset table — no point-level self-join
    ever happens, so the plan is corpus-linear at any scale.

    Isolated dense cells (no dense neighbor) are their own single-cell
    cluster — the LEFT JOIN + COALESCE keeps them, matching GDBSCAN
    semantics where any core cell founds a cluster.

    Cross-engine: cell ids and counts are exact integers; the CC loop is
    hash-checked against the bounded-iteration min-label oracle
    (`_cc_oracle`), whose convergence guard drops rows — and fails the
    gate — rather than pass wrong labels."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 1800 - 900).alias("lat_dd"),
            ((F.col("event_id") * 7) % 3600 - 1800).alias("lon_dd"),
        )
        .select(
            F.floor((F.col("lon_dd") + 1800) / F.lit(50)).alias("cx"),
            F.floor((F.col("lat_dd") + 900) / F.lit(50)).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .filter(F.col("n_pts") >= 5)
        .withColumn("cell_id", F.col("cx") * 100 + F.col("cy"))
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx long, dy long",
    )
    a = cells.select(
        F.col("cx").alias("acx"),
        F.col("cy").alias("acy"),
        F.col("cell_id").alias("id_a"),
    )
    b = cells.select(
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
        F.col("cell_id").alias("id_b"),
    )
    pairs = (
        a.crossJoin(F.broadcast(offsets))
        .join(
            b,
            (F.col("bcx") == F.col("acx") + F.col("dx"))
            & (F.col("bcy") == F.col("acy") + F.col("dy"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs).select(
        F.col("id").alias("cell_id"), "component"
    )
    lab = cells.join(comp, "cell_id", "left").select(
        F.coalesce("component", "cell_id").alias("cluster_id"), "n_pts"
    )
    return lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_pts").cast("long").alias("n_points"),
    )


@register(
    "q360_average_precision",
    oracle="""
    WITH ranked AS (
      SELECT label,
             (1000003 - (vec_id * 2654435761) % 1000003) AS skey,
             vec_id,
             ROW_NUMBER() OVER (ORDER BY
               (1000003 - (vec_id * 2654435761) % 1000003), vec_id) AS rk,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY
               (1000003 - (vec_id * 2654435761) % 1000003), vec_id) AS cum_rel
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_rel,
           ROUND(CAST(SUM((cum_rel * 1000000) // rk) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS ap
    FROM ranked GROUP BY label
    """,
)
def q360_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X290 — EXACT average precision per label over one shared ranking
    (the retrieval/classifier eval primitive; mean over labels = mAP).
    Scoring is a deterministic integer channel so the ranking is total
    and reproducible; each label is scored as its own binary-relevance
    task over the same ranked list: AP = (1/R)·Σ_{relevant k} P@k.

    Engine-exactness: P@k terms are computed in integer micro-units with
    FLOOR division — (cum_rel·10⁶) // k — so the per-term values are
    exact int64 on both engines and their sum is order-independent; the
    single final division is rounded to 6 dp. No float accumulation.

    Scale: the global rank comes from the two-phase parallel prefix scan
    (`global_running_sum`), NOT a single-task global window; per-label
    cumulative relevance is an ordinary partitioned row_number. Two
    exchanges total."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "label",
        "vec_id",
        (F.lit(1000003) - (F.col("vec_id") * F.lit(2654435761)) % 1000003).alias(
            "skey"
        ),
    ).withColumn("_one", F.lit(1))
    ranked = global_running_sum(scored, ["skey", "vec_id"], "_one", out_col="rk")
    w_lbl = Window.partitionBy("label").orderBy("skey", "vec_id")
    terms = ranked.withColumn("cum_rel", F.row_number().over(w_lbl)).select(
        "label",
        F.expr("(cum_rel * 1000000) DIV rk").alias("term_u"),
    )
    return terms.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"),
        F.round(
            F.sum("term_u").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("ap"),
    )


@register(
    "q361_t_closeness_audit",
    allow_non_equi=(
        "deliberate bounded cartesians: the (distinct event_type) x (10-row "
        "bucket spine) densification and a SINGLE-ROW corpus-total broadcast "
        "- both O(|groups|), never row-level"
    ),
    oracle="""
    WITH b AS (
      SELECT event_type,
             LEAST(9, CAST(FLOOR(value / 50) AS BIGINT)) AS bkt
      FROM events
    ), types AS (SELECT DISTINCT event_type FROM b),
    spine AS (
      SELECT event_type, bkt
      FROM types CROSS JOIN (SELECT unnest(range(0, 10)) AS bkt)
    ),
    gcnt AS (SELECT event_type, bkt, COUNT(*) AS c FROM b GROUP BY 1, 2),
    filled AS (
      SELECT s.event_type, s.bkt, COALESCE(g.c, 0) AS c
      FROM spine s LEFT JOIN gcnt g USING (event_type, bkt)
    ),
    cums AS (
      SELECT event_type, bkt,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bkt) AS c_cum,
             SUM(c) OVER (PARTITION BY event_type) AS n_g
      FROM filled
    ),
    gcum AS (SELECT bkt, SUM(c_cum) AS g_cum FROM cums GROUP BY bkt),
    tot AS (SELECT SUM(n_g) AS n
            FROM (SELECT DISTINCT event_type, n_g FROM cums))
    SELECT event_type, CAST(MAX(n_g) AS BIGINT) AS n_group,
           ROUND(CAST(SUM(ABS(c_cum * n - g_cum * n_g)) AS DOUBLE)
                 / (MAX(n_g) * MAX(n) * 9.0), 6) AS t_closeness
    FROM cums JOIN gcum USING (bkt) CROSS JOIN tot
    WHERE bkt < 9
    GROUP BY event_type
    """,
)
def q361_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X291 — t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007):
    for each quasi-identifier group, the Earth Mover's Distance between
    the group's distribution of an ORDERED sensitive attribute and the
    global distribution; a group with t above threshold leaks the
    attribute. For ordered buckets EMD has the closed form
    (1/(m−1))·Σ_j |P_cum_j − Q_cum_j| — pure cumulative counting.
    Completes the privacy family (q151 k-anonymity, q197 l-diversity,
    q196 DP counts).

    Engine-exactness: cumulative-fraction differences are compared by
    integer cross-multiplication — |c_cum·N − g_cum·n_g| is an exact
    int64 numerator over the COMMON denominator n_g·N, so the bucket
    sum is order-independent; one final division, rounded to 6 dp.
    (At ≥3·10⁹-row corpora the products overflow int64 — now a RUNTIME
    `raise_error` guard engine-side rather than a silent non-ANSI wrap;
    the escape is decimal(38,0) widening, the q287/q315 pattern.) The
    10-bucket spine is densified per group so
    cumulative sums stay aligned when a group has empty buckets.

    Scale: one groupBy on (type, bucket), windows over ≤10-row
    partitions, a 1-row total broadcast — group-cardinality work."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.least(F.lit(9), F.floor(F.col("value") / 50).cast("long")).alias("bkt"),
    )
    types = b.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bkt"))))
    gcnt = b.groupBy("event_type", "bkt").agg(F.count(F.lit(1)).alias("c"))
    filled = spine.join(gcnt, ["event_type", "bkt"], "left").select(
        "event_type", "bkt", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cums = filled.select(
        "event_type",
        "bkt",
        F.sum("c").over(w_cum).alias("c_cum"),
        F.sum("c").over(w_all).alias("n_g"),
    )
    glob = cums.groupBy("bkt").agg(F.sum("c_cum").alias("g_cum"))
    tot = (
        cums.select("event_type", "n_g")
        .distinct()
        .agg(F.sum("n_g").alias("n"))
    )
    return (
        cums.join(F.broadcast(glob), "bkt")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("bkt") < 9)
        .groupBy("event_type")
        .agg(
            F.max("n_g").cast("long").alias("n_group"),
            F.round(
                F.sum(
                    # c_cum·N and g_cum·n_g are ≤ N², so int64 holds only
                    # while N < 3·10⁹ — guard at runtime instead of
                    # wrapping silently (non-ANSI Spark) where DuckDB
                    # would raise; past the bound widen to decimal(38,0)
                    # (q287/q315 pattern), as the docstring states.
                    F.expr(
                        "IF(n < 3000000000,"
                        " ABS(c_cum * n - g_cum * n_g),"
                        " CAST(raise_error('q361: corpus rows >= 3e9"
                        " overflow the int64 cross-multiplication;"
                        " widen to decimal(38,0)') AS BIGINT))"
                    )
                ).cast("double")
                / (F.max("n_g") * F.max("n") * F.lit(9.0)),
                6,
            ).alias("t_closeness"),
        )
    )


@register(
    "q362_retrieval_recall_mrr",
    allow_non_equi=(
        "broadcast-cross-join eval whose query side is 20 rows by "
        "construction (the query set broadcasts); corpus side is linear"
    ),
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS cid, embedding AS ce, label AS clabel
          FROM embeddings),
    s AS (
      SELECT qid, qlabel, cid, clabel,
             ROUND(
               list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
                  * SQRT(list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))))),
               6) AS score
      FROM q, c WHERE cid <> qid
    ), r AS (
      SELECT qid, qlabel, clabel,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, cid) AS rnk
      FROM s
    )
    SELECT qid AS query_id,
           CAST(SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rel,
           ROUND(1.0 / MIN(CASE WHEN clabel = qlabel THEN rnk END), 6) AS rr,
           ROUND(CAST(SUM(CASE WHEN clabel = qlabel AND rnk <= 10
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END), 6)
             AS recall_at_10
    FROM r GROUP BY qid
    """,
)
def q362_retrieval_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X292 — retrieval-eval metrics over a full exact ranking: per query,
    MRR (reciprocal rank of the first same-label neighbor) and
    recall@10 (share of the relevant set found in the top 10).
    Complements q223 NDCG / q220 AUC / q253 RBO with the two metrics
    every embedding-model eval reports first.

    Cross-engine: scores are the shared q32 convention (index-ordered
    left-fold dot product, rounded to 6 dp) so ranks are total under
    the (score desc, cid) tiebreak; rr and recall are single divisions
    of exact integers, rounded once.

    Scale: 20-query broadcast against a linear corpus scan; per-query
    windows are bounded by corpus size and parallel across queries —
    for production-sized query sets, swap the broadcast for the LSH
    bucket join (q33) and evaluate on its candidates."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        cosine_similarity,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("clabel"),
    )
    s = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "cid",
            "clabel",
            F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    r = s.withColumn("rnk", F.row_number().over(w))
    rel = F.when(F.col("clabel") == F.col("qlabel"), 1).otherwise(0)
    return r.groupBy("qid").agg(
        F.sum(rel).cast("long").alias("n_rel"),
        F.round(
            F.lit(1.0)
            / F.min(F.when(F.col("clabel") == F.col("qlabel"), F.col("rnk"))),
            6,
        ).alias("rr"),
        F.round(
            F.sum(
                F.when(
                    (F.col("clabel") == F.col("qlabel")) & (F.col("rnk") <= 10), 1
                ).otherwise(0)
            ).cast("double")
            / F.sum(rel),
            6,
        ).alias("recall_at_10"),
    ).withColumnRenamed("qid", "query_id")


@register(
    "q363_cpa_screening",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 3600000000 AS hr,
             ((event_id * 7) % 3600) // 50 AS cx,
             (event_id % 1800) // 50 AS cy
      FROM events
    ), f AS (
      SELECT user_id, hr, cx, cy, MIN(event_id) AS eid
      FROM pts GROUP BY 1, 2, 3, 4
    ), s AS (
      SELECT user_id, hr, cx, cy,
             (eid * 7) % 3600 AS x, eid % 1800 AS y,
             (eid * 11) % 21 - 10 AS vx, (eid * 17) % 21 - 10 AS vy
      FROM f
    ), pr AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, a.hr, a.cx, a.cy,
             a.x - b.x AS dx, a.y - b.y AS dy,
             a.vx - b.vx AS dvx, a.vy - b.vy AS dvy
      FROM s a JOIN s b
        ON a.hr = b.hr AND a.cx = b.cx AND a.cy = b.cy
       AND a.user_id < b.user_id
    ), cpa AS (
      SELECT user_a, user_b, hr, cx, cy,
             CASE WHEN (dvx*dvx + dvy*dvy) = 0
                       OR -(dx*dvx + dy*dvy) <= 0 THEN 0
                  WHEN -(dx*dvx + dy*dvy) >= (dvx*dvx + dvy*dvy)
                       THEN (dvx*dvx + dvy*dvy)
                  ELSE -(dx*dvx + dy*dvy) END AS pn,
             CASE WHEN (dvx*dvx + dvy*dvy) = 0 THEN 1
                  ELSE (dvx*dvx + dvy*dvy) END AS qd,
             dx, dy, dvx, dvy
      FROM pr
    )
    SELECT user_a, user_b, CAST(hr AS BIGINT) AS hr,
           CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
           ROUND(CAST(pn AS DOUBLE) / qd, 6) AS tcpa_h,
           ROUND(SQRT(CAST((dx*qd + dvx*pn)*(dx*qd + dvx*pn)
                           + (dy*qd + dvy*pn)*(dy*qd + dvy*pn) AS DOUBLE))
                 / qd, 6) AS dcpa
    FROM cpa
    WHERE SQRT(CAST((dx*qd + dvx*pn)*(dx*qd + dvx*pn)
                    + (dy*qd + dvy*pn)*(dy*qd + dvy*pn) AS DOUBLE)) / qd < 25
    """,
)
def q363_cpa_screening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X293 — closest point of approach (CPA) screening: for every pair
    of entities sharing a grid cell in the same hour, the minimum
    separation over the next hour under constant-velocity motion and
    the time it occurs — the collision-risk primitive of every vessel
    traffic service (dCPA/tCPA), here as a distributed pair screen.

    Exact rational arithmetic: with integer positions/velocities, the
    unclamped optimum is t* = pn/qd where pn = −(Δp·Δv), qd = |Δv|²
    (both int64); clamping to [0,1] h keeps (pn,qd) integer (0/1, qd/qd,
    pn/qd), and the squared distance at t* is the integer
    ((Δx·qd+Δvx·pn)² + (Δy·qd+Δvy·pn)²)/qd² — so dCPA is ONE
    sqrt-of-int64 divided by an int, bit-identical across engines; the
    zero-relative-velocity pair degenerates to current distance.

    Scale: the pair generator is the q314 rendezvous shape — one
    representative per (entity, hour, cell) via min(event_id), then an
    equi-join on (hour, cell); per-bucket density is constant along the
    time axis, so candidates grow linearly (measured at 10×: SCALING.md
    q314 exponent 0.86). No cross product anywhere."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) DIV 3600000000").alias("hr"),
        (((F.col("event_id") * 7) % 3600) / 50).cast("long").alias("cx"),
        ((F.col("event_id") % 1800) / 50).cast("long").alias("cy"),
    )
    f = pts.groupBy("user_id", "hr", "cx", "cy").agg(F.min("event_id").alias("eid"))
    s = f.select(
        "user_id",
        "hr",
        "cx",
        "cy",
        ((F.col("eid") * 7) % 3600).alias("x"),
        (F.col("eid") % 1800).alias("y"),
        ((F.col("eid") * 11) % 21 - 10).alias("vx"),
        ((F.col("eid") * 17) % 21 - 10).alias("vy"),
    )
    a = s.select(*[F.col(c).alias(f"a_{c}") for c in s.columns])
    b = s.select(*[F.col(c).alias(f"b_{c}") for c in s.columns])
    pr = a.join(
        b,
        (F.col("a_hr") == F.col("b_hr"))
        & (F.col("a_cx") == F.col("b_cx"))
        & (F.col("a_cy") == F.col("b_cy"))
        & (F.col("a_user_id") < F.col("b_user_id")),
    ).select(
        F.col("a_user_id").alias("user_a"),
        F.col("b_user_id").alias("user_b"),
        F.col("a_hr").alias("hr"),
        F.col("a_cx").alias("cx"),
        F.col("a_cy").alias("cy"),
        (F.col("a_x") - F.col("b_x")).alias("dx"),
        (F.col("a_y") - F.col("b_y")).alias("dy"),
        (F.col("a_vx") - F.col("b_vx")).alias("dvx"),
        (F.col("a_vy") - F.col("b_vy")).alias("dvy"),
    )
    q2 = F.col("dvx") * F.col("dvx") + F.col("dvy") * F.col("dvy")
    pneg = -(F.col("dx") * F.col("dvx") + F.col("dy") * F.col("dvy"))
    cpa = pr.select(
        "user_a",
        "user_b",
        "hr",
        "cx",
        "cy",
        "dx",
        "dy",
        "dvx",
        "dvy",
        F.when((q2 == 0) | (pneg <= 0), F.lit(0))
        .when(pneg >= q2, q2)
        .otherwise(pneg)
        .alias("pn"),
        F.when(q2 == 0, F.lit(1)).otherwise(q2).alias("qd"),
    )
    num = (F.col("dx") * F.col("qd") + F.col("dvx") * F.col("pn")) * (
        F.col("dx") * F.col("qd") + F.col("dvx") * F.col("pn")
    ) + (F.col("dy") * F.col("qd") + F.col("dvy") * F.col("pn")) * (
        F.col("dy") * F.col("qd") + F.col("dvy") * F.col("pn")
    )
    dcpa = F.sqrt(num.cast("double")) / F.col("qd")
    return cpa.filter(dcpa < 25).select(
        "user_a",
        "user_b",
        F.col("hr").cast("long").alias("hr"),
        F.col("cx").cast("long").alias("cx"),
        F.col("cy").cast("long").alias("cy"),
        F.round(F.col("pn").cast("double") / F.col("qd"), 6).alias("tcpa_h"),
        F.round(dcpa, 6).alias("dcpa"),
    )


@register(
    "q364_knn_label_noise",
    oracle="""
    WITH pts AS (
      SELECT event_id, event_type,
             CAST(event_id % 1800 AS DOUBLE)/10.0 - 90.0 AS lat,
             CAST((event_id * 7) % 3600 AS DOUBLE)/10.0 - 180.0 AS lon
      FROM events
    ),
    refs AS (
      SELECT event_id AS ref_id, event_type AS r_type,
             lat AS rlat, lon AS rlon
      FROM pts WHERE event_id % 97 = 0
    ),
    cand AS (
      SELECT q.event_id, q.event_type, r.ref_id, r.r_type,
             (q.lat - r.rlat)*(q.lat - r.rlat)
             + (q.lon - r.rlon)*(q.lon - r.rlon) AS dist2
      FROM pts q, refs r
      WHERE (q.lat - r.rlat)*(q.lat - r.rlat)
            + (q.lon - r.rlon)*(q.lon - r.rlon) <= 36.0
    ),
    ranked AS (
      SELECT event_id, event_type, ref_id, r_type,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY dist2, ref_id) AS knn_rank
      FROM cand
    ),
    per_pt AS (
      SELECT event_id, event_type,
             COUNT(*) AS n_nbrs,
             SUM(CASE WHEN r_type = event_type THEN 1 ELSE 0 END) AS n_match
      FROM ranked
      WHERE knn_rank <= 3 AND ref_id <> event_id
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(n_nbrs) AS BIGINT) AS total_nbrs,
           ROUND(CAST(SUM(n_match) AS DOUBLE) / SUM(n_nbrs), 6) AS agreement,
           CAST(SUM(CASE WHEN n_match = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect,
           ROUND(CAST(SUM(CASE WHEN n_match = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS suspect_share
    FROM per_pt GROUP BY event_type
    """,
)
def q364_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X294 — label-noise audit via k-NN disagreement (the
    confident-learning screen): every point votes its label against its
    3 nearest labeled landmarks; a point whose neighborhood unanimously
    disagrees is a suspect. Reported per class: micro-averaged neighbor
    agreement and the share of zero-agreement suspects — the standard
    pre-training triage for mislabeled examples.

    Semantics: ranks are computed INCLUDING a landmark identical to the
    point (so k slots are filled identically in both engines), but a
    self-landmark never votes (ref_id <> event_id after ranking) — the
    vote would be trivially self-confirming. Micro-average
    (Σmatch/Σnbrs) keeps the aggregate an exact integer ratio — a mean
    of per-point fractions would be an order-dependent double sum.

    Scale: the q219 grid-KNN join — landmark side exploded ×9 and
    broadcast, equi-join on cell key, bounded per-point window. Exact
    within radius 6°, corpus-linear."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import grid_knn_join

    ev = load(spark, sf_dir, "events")
    pts = _with_coords(ev)
    refs = pts.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("ref_id"),
        F.col("lat").alias("rlat"),
        F.col("lon").alias("rlon"),
    )
    knn = grid_knn_join(pts, refs, k=_KNN_K, radius=_KNN_R)
    qtypes = ev.select("event_id", F.col("event_type").alias("q_type"))
    rtypes = ev.select(
        F.col("event_id").alias("ref_id"), F.col("event_type").alias("r_type")
    ).filter(F.col("ref_id") % 97 == 0)
    per_pt = (
        knn.filter(F.col("ref_id") != F.col("event_id"))
        .join(qtypes, "event_id")
        .join(F.broadcast(rtypes), "ref_id")
        .groupBy("event_id", "q_type")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum(
                F.when(F.col("r_type") == F.col("q_type"), 1).otherwise(0)
            ).alias("n_match"),
        )
    )
    return (
        per_pt.groupBy("q_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("n_nbrs").cast("long").alias("total_nbrs"),
            F.round(
                F.sum("n_match").cast("double") / F.sum("n_nbrs"), 6
            ).alias("agreement"),
            F.sum(F.when(F.col("n_match") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_suspect"),
            F.round(
                F.sum(F.when(F.col("n_match") == 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("suspect_share"),
        )
        .withColumnRenamed("q_type", "event_type")
    )


def _bt_iteration_sql(k: int) -> str:
    """One Bradley–Terry MM round as a CTE (integer micro-units).

    The pair-term denominator is GREATEST(p_i+p_j, 1): with zero-win
    types seeded into the strength vector (round 6), a type's strength
    can reach exactly 0 after an update, and 0+0 would otherwise be an
    integer division by zero (DuckDB raises; Spark nulls)."""
    return f"""it{k} AS (
      SELECT w.t, (w.wins * 1000000000000) //
             GREATEST(SUM((pp.n * 1000000000000)
                          // GREATEST(pi.p_u + pj.p_u, 1)), 1) AS p_u
      FROM wins w
      JOIN pair_stats pp ON pp.ti = w.t OR pp.tj = w.t
      JOIN it{k - 1} pi ON pi.t = w.t
      JOIN it{k - 1} pj
        ON pj.t = CASE WHEN pp.ti = w.t THEN pp.tj ELSE pp.ti END
      GROUP BY w.t, w.wins
    )"""


@register(
    "q365_bradley_terry",
    allow_non_equi=(
        "deliberate OR-key join over the pair-stats relation, which is "
        "bounded by |types|^2 (<=25 rows) by construction - the MM "
        "iteration state is group-cardinality, never row-level"
    ),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_value
      FROM events
    ), comps AS (
      SELECT CASE WHEN value > prev_value THEN event_type
                  ELSE prev_type END AS winner,
             CASE WHEN value > prev_value THEN prev_type
                  ELSE event_type END AS loser
      FROM seq
      WHERE prev_type IS NOT NULL AND prev_type <> event_type
        AND value <> prev_value
    ), wins AS (
      -- every type that ever PARTICIPATED gets a row (wins may be 0):
      -- dropping zero-win types would delete their pair terms from
      -- opponents' MM denominators, inflating those opponents
      SELECT t, SUM(w) AS wins FROM (
        SELECT winner AS t, 1 AS w FROM comps
        UNION ALL
        SELECT loser AS t, 0 AS w FROM comps
      ) GROUP BY t
    ), pair_stats AS (
      SELECT LEAST(winner, loser) AS ti, GREATEST(winner, loser) AS tj,
             COUNT(*) AS n
      FROM comps GROUP BY 1, 2
    ), it0 AS (
      SELECT t, CAST(1000000 AS BIGINT) AS p_u FROM wins
    ),
    """
    + ",\n    ".join(_bt_iteration_sql(k) for k in (1, 2, 3))
    + """
    SELECT t AS event_type, CAST(p_u AS BIGINT) AS bt_score_u,
           ROUND(CAST(p_u AS DOUBLE)
                 / (SELECT SUM(p_u) FROM it3), 6) AS bt_share
    FROM it3
    """,
)
def q365_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X295 — Bradley–Terry strength scores from pairwise outcomes via
    the MM algorithm (Hunter 2004), the model behind chatbot-arena
    leaderboards and RLHF preference aggregation. Comparisons are
    consecutive same-user events of different types, the higher value
    winning; three MM rounds of p_i ← W_i / Σ_j n_ij/(p_i+p_j).

    The strength vector is seeded from EVERY participating type (union
    of winners and losers, wins coalesced to 0) — round 6: previously
    zero-win types were dropped, which also deleted their pair terms
    from opponents' MM denominators and inflated those opponents. A
    zero-win type's strength converges to 0 (its MLE limit), so pair
    denominators carry GREATEST(p_i+p_j, 1) on both engines.

    Engine-exactness: strengths live in integer micro-units; each
    denominator term is the FLOOR division (n_ij·10¹²)//(p_i+p_j), so
    the per-type denominator is an exact int64 sum (order-free) and the
    update (W_i·10¹²)//D is one floor division — every iteration is
    bit-identical across engines (the q318 k-means / q277 PCA pattern
    applied to preference aggregation). Magnitude: n_ij·10¹² needs
    n_ij < 9·10⁶ per pair — now a RUNTIME guard (`raise_error`) on the
    engine side, since non-ANSI Spark would wrap silently where DuckDB
    raises; beyond it drop to 10⁹ scaling.

    Scale: one lag window on the user exchange builds comparisons; all
    iteration state is |types|²-bounded relations joined with broadcast
    hash joins — corpus touches exactly once."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
    )
    comps = seq.filter(
        F.col("prev_type").isNotNull()
        & (F.col("prev_type") != F.col("event_type"))
        & (F.col("value") != F.col("prev_value"))
    ).select(
        F.when(F.col("value") > F.col("prev_value"), F.col("event_type"))
        .otherwise(F.col("prev_type"))
        .alias("winner"),
        F.when(F.col("value") > F.col("prev_value"), F.col("prev_type"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    # Every participating type gets a strength row, wins coalesced to 0
    # (round 6, ADVICE): dropping zero-win types would delete their pair
    # terms from opponents' MM denominators and inflate those opponents.
    wins = (
        comps.select(F.col("winner").alias("t"), F.lit(1).alias("w"))
        .unionByName(comps.select(F.col("loser").alias("t"), F.lit(0).alias("w")))
        .groupBy("t")
        .agg(F.sum("w").cast("long").alias("wins"))
    )
    pair_stats = comps.groupBy(
        F.least("winner", "loser").alias("ti"),
        F.greatest("winner", "loser").alias("tj"),
    ).agg(F.count(F.lit(1)).alias("n"))
    p = wins.select("t", F.lit(1000000).cast("long").alias("p_u"))
    # n_ij·10¹² must stay inside int64 (n_ij < 9·10⁶); Spark (non-ANSI)
    # would wrap silently where DuckDB raises, so fail loudly instead of
    # answering wrong — the documented escape is 10⁹ scaling.
    term_expr = (
        "IF(n < 9000000,"
        " (n * 1000000000000) DIV GREATEST(pi_u + pj_u, 1),"
        " CAST(raise_error('q365: pair count n_ij >= 9e6 overflows the"
        " 1e12 micro-unit channel; rescale to 1e9') AS BIGINT))"
    )
    for _ in range(3):
        terms = (
            wins.join(
                pair_stats,
                (F.col("ti") == F.col("t")) | (F.col("tj") == F.col("t")),
            )
            .withColumn(
                "other",
                F.when(F.col("ti") == F.col("t"), F.col("tj")).otherwise(
                    F.col("ti")
                ),
            )
            .join(p.select(F.col("t").alias("other"), F.col("p_u").alias("pj_u")), "other")
            .join(p.select("t", F.col("p_u").alias("pi_u")), "t")
            .select("t", "wins", F.expr(term_expr).alias("term"))
        )
        p = terms.groupBy("t", "wins").agg(
            F.expr(
                "(MAX(wins) * 1000000000000) DIV GREATEST(SUM(term), 1)"
            ).alias("p_u")
        ).select("t", "p_u")
    tot = p.agg(F.sum("p_u").alias("tot"))
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("event_type"),
            F.col("p_u").cast("long").alias("bt_score_u"),
            F.round(F.col("p_u").cast("double") / F.col("tot"), 6).alias(
                "bt_share"
            ),
        )
    )


@register(
    "q366_unimax_allocation",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross joins (corpus totals, "
        "capped-mass totals) onto the |sources|-bounded allocation "
        "relation - group-cardinality, never row-level"
    ),
    oracle="""
    WITH src AS (
      SELECT source, SUM(n_chars) AS tok FROM documents GROUP BY source
    ), tot AS (SELECT SUM(tok) AS total, COUNT(*) AS n FROM src),
    r AS (
      SELECT source, tok, 2 * tok AS cap,
             ROW_NUMBER() OVER (ORDER BY 2 * tok, source) AS rk,
             SUM(2 * tok) OVER (ORDER BY 2 * tok, source) - 2 * tok
               AS prefix_before
      FROM src
    ), flag AS (
      SELECT r.*, n, (18 * total) // 10 AS budget,
             CASE WHEN cap * (n - rk + 1)
                       <= (18 * total) // 10 - prefix_before
                  THEN 1 ELSE 0 END AS capped
      FROM r CROSS JOIN tot
    ), agg AS (
      SELECT SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) AS s_capped,
             SUM(1 - capped) AS n_unc
      FROM flag
    ), unc AS (
      SELECT f.*, s_capped, n_unc,
             CASE WHEN capped = 0 THEN
               ROW_NUMBER() OVER (PARTITION BY capped
                                  ORDER BY cap DESC, source)
             END AS rk_unc
      FROM flag f CROSS JOIN agg
    ), alloc AS (
      SELECT source, tok, cap,
             CASE WHEN capped = 1 THEN cap
                  ELSE (budget - s_capped) // GREATEST(n_unc, 1)
                       + CASE WHEN rk_unc <= (budget - s_capped)
                                             % GREATEST(n_unc, 1)
                              THEN 1 ELSE 0 END
             END AS allocation
      FROM unc
    )
    SELECT source, CAST(tok AS BIGINT) AS tokens,
           CAST(cap AS BIGINT) AS cap,
           CAST(allocation AS BIGINT) AS allocation,
           ROUND(CAST(allocation AS DOUBLE) / tok, 6) AS epochs_used
    FROM alloc
    """,
)
def q366_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296 — UniMax sampling allocation (Chung et al. 2023): distribute
    a token budget across sources as uniformly as possible subject to a
    per-source epoch cap — the mixing rule that replaced
    temperature-sampling in PaLM-2-era multilingual pretraining.
    Water-filling closed form: sort sources by cap ascending; source at
    rank r is capped iff its cap ≤ the even split of what remains after
    all smaller caps are paid out (the predicate is provably monotone in
    r, so a per-row window test reproduces the iterative algorithm); the
    leftover splits evenly across uncapped sources, remainder to the
    largest caps first (q279 largest-remainder convention).

    Engine-exactness: token counts, caps, prefix sums, the capped
    predicate (integer cross-multiplication), the even split (floor
    div) and remainder distribution are ALL int64 — zero float until
    the final epochs_used display division. Budget = 1.8× corpus
    tokens, cap = 2 epochs.

    Scale: one groupBy collapses the corpus to |sources| rows; every
    window/join after that is on the bounded allocation relation."""
    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("tok"))
    tot = src.agg(
        F.sum("tok").alias("total"), F.count(F.lit(1)).alias("n")
    )
    w_rank = Window.orderBy(F.col("cap"), F.col("source"))
    r = src.withColumn("cap", 2 * F.col("tok")).select(
        "source",
        "tok",
        "cap",
        F.row_number().over(w_rank).alias("rk"),
        (F.sum("cap").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)) - F.col("cap")).alias(
            "prefix_before"
        ),
    )
    flag = (
        r.crossJoin(F.broadcast(tot))
        .withColumn("budget", F.expr("(18 * total) DIV 10"))
        .withColumn(
            "capped",
            F.when(
                F.col("cap") * (F.col("n") - F.col("rk") + 1)
                <= F.col("budget") - F.col("prefix_before"),
                1,
            ).otherwise(0),
        )
    )
    agg = flag.agg(
        F.sum(F.when(F.col("capped") == 1, F.col("cap")).otherwise(0)).alias(
            "s_capped"
        ),
        F.sum(1 - F.col("capped")).alias("n_unc"),
    )
    w_unc = Window.partitionBy("capped").orderBy(
        F.col("cap").desc(), F.col("source")
    )
    unc = flag.crossJoin(F.broadcast(agg)).withColumn(
        "rk_unc", F.when(F.col("capped") == 0, F.row_number().over(w_unc))
    )
    allocation = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        F.expr("(budget - s_capped) DIV GREATEST(n_unc, 1)")
        + F.when(
            F.col("rk_unc")
            <= F.expr("(budget - s_capped) % GREATEST(n_unc, 1)"),
            1,
        ).otherwise(0)
    )
    return unc.select(
        "source",
        F.col("tok").cast("long").alias("tokens"),
        F.col("cap").cast("long").alias("cap"),
        allocation.cast("long").alias("allocation"),
        F.round(allocation.cast("double") / F.col("tok"), 6).alias(
            "epochs_used"
        ),
    )


@register(
    "q367_golden_record",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle=_cc_oracle(
        """, m AS (
      SELECT c.component, d.doc_id, d.text, d.lang, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ), base AS (
      SELECT component, COUNT(*) AS n_members, MIN(doc_id) AS min_doc_id,
             MAX(n_chars) AS max_n_chars
      FROM m GROUP BY 1
    ), canon AS (
      SELECT component, doc_id AS canonical_doc_id
      FROM (SELECT component, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY LENGTH(text) DESC, doc_id)
                     AS rn
            FROM m) WHERE rn = 1
    ), lmode AS (
      SELECT component, lang AS canonical_lang
      FROM (SELECT component, lang,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY COUNT(*) DESC, lang) AS rn
            FROM m GROUP BY component, lang) WHERE rn = 1
    )
    SELECT b.component, CAST(b.n_members AS BIGINT) AS n_members,
           canonical_doc_id, canonical_lang,
           CAST(b.max_n_chars AS BIGINT) AS max_n_chars, b.min_doc_id
    FROM base b
    JOIN canon USING (component) JOIN lmode USING (component)"""
    ),
)
def q367_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297 — golden-record survivorship (the MDM step after entity
    resolution): for every near-duplicate cluster, assemble ONE
    canonical record by per-attribute survivorship rules — longest text
    wins (tiebreak: lowest id), language by cluster majority (tiebreak:
    lexicographic), size by max, lineage by min id. Downstream of the
    same winnowing-pair CC as q62/q65; where q65 picks a surviving ROW,
    this composes a record that need not equal any single member —
    the actual contract of master-data golden records.

    Cross-engine: every rule is a deterministic total order (explicit
    tiebreaks), so the composed record is hash-identical; the CC labels
    ride the bounded-iteration min-label oracle with its convergence
    guard.

    Scale: attribute relations are per-cluster windows on the component
    exchange; mode-per-group is count + row_number (no collect, no
    UDF)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = q61_winnow_near_dups(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    m = comp.join(docs, "doc_id")
    base = m.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("n_chars").cast("long").alias("max_n_chars"),
    )
    w_canon = Window.partitionBy("component").orderBy(
        F.length("text").desc(), "doc_id"
    )
    canon = (
        m.withColumn("rn", F.row_number().over(w_canon))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("canonical_doc_id"))
    )
    w_mode = Window.partitionBy("component").orderBy(
        F.col("cnt").desc(), "lang"
    )
    lmode = (
        m.groupBy("component", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select("component", F.col("lang").alias("canonical_lang"))
    )
    return (
        base.join(canon, "component")
        .join(lmode, "component")
        .select(
            "component",
            "n_members",
            "canonical_doc_id",
            "canonical_lang",
            "max_n_chars",
            "min_doc_id",
        )
    )


@register(
    "q368_nearest_centroid_confusion",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               + 10000000 AS xu
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    ), cent AS (
      SELECT label AS clabel, dim, SUM(xu) // COUNT(*) AS cu
      FROM ex GROUP BY 1, 2
    ), d AS (
      SELECT e.vec_id, e.label, c.clabel,
             SUM((e.xu - c.cu) * (e.xu - c.cu)) AS d2
      FROM ex e JOIN cent c ON c.dim = e.dim
      GROUP BY 1, 2, 3
    ), pred AS (
      SELECT vec_id, label,
             clabel AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2, clabel) AS rn
      FROM d
    )
    SELECT label AS true_label, pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q368_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X298 — nearest-centroid classifier confusion matrix over the
    embedding table: per-label centroids, every vector assigned to its
    closest centroid, (true, predicted) counts — the quickest
    label-quality / cluster-separability diagnostic before training a
    probe.

    Engine-exactness: coordinates are quantized to integer micro-units
    (with a +10⁷ shift so all values are nonnegative — Spark's DIV
    truncates toward zero while DuckDB's // floors, and they agree only
    on nonnegative operands); the centroid is the FLOOR of the exact
    mean in micro-units (a defined, reproducible quantization), so
    every squared distance is an exact int64 sum (≤64·(2·10⁷)² ≈
    2.6·10¹⁶) and argmin ties break on label. Zero float anywhere.

    Scale: explode to (vector, dim) rows once; centroids are a
    64·|labels| relation joined back per-dim (broadcast), partial-agg
    collapses dims before the (vec, label) exchange."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        (
            F.round(F.col("x").cast("double") * 1000000).cast("long")
            + 10000000
        ).alias("xu"),
    )
    cent = ex.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("SUM(xu) DIV COUNT(*)").alias("cu")
    )
    d = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("xu") - F.col("cu")) * (F.col("xu") - F.col("cu"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    pred = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return pred.groupBy(
        F.col("label").alias("true_label"),
        F.col("clabel").alias("pred_label"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q369_containment_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g0 AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
      FROM t WHERE len(toks) >= 5
    ), kept AS (
      SELECT gram FROM g0 GROUP BY gram HAVING COUNT(*) <= 1000
    ), g AS (
      SELECT g0.* FROM g0 JOIN kept USING (gram)
    ), sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT src_id, dst_id, CAST(shared AS BIGINT) AS shared_grams,
           CAST(sa.n AS BIGINT) AS src_grams,
           ROUND(CAST(shared AS DOUBLE) / sa.n, 6) AS containment
    FROM inter JOIN sz sa ON sa.doc_id = src_id
    WHERE shared * 10 >= sa.n * 9
    """,
)
def q369_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X299 — DIRECTED near-containment pairs: doc A is (≥90%) contained
    in doc B when ≥90% of A's distinct word-5-grams also occur in B —
    the quote/subsumption/boilerplate relation that symmetric Jaccard
    (q26/q171) misses: a paragraph quoted inside a long article has low
    Jaccard but containment ≈ 1. Asymmetric by construction, so pairs
    are emitted per direction.

    Cross-engine: shared-gram counts and set sizes are exact integers;
    the ≥0.9 threshold is the integer cross-multiplication
    shared·10 ≥ |A|·9 (no float compare); display ratio rounded once.

    Scale: inverted-index equi-join on distinct grams — candidates are
    Σ df² over gram posting lists, the q61 winnowing shape. Since round
    6 the q343 df-cap is APPLIED, not just cited (ADVICE): grams with
    document frequency > 1000 are dropped before the join on BOTH
    engines, bounding candidates at |grams|·df_cap²/2 so the
    adversarially-uniform-vocabulary regime stays linear instead of
    quadratic. Semantics: containment over INFORMATIVE grams — |A|
    (src_grams) counts only kept grams, so numerator and denominator
    stay consistent; a gram in >1000 docs is boilerplate by
    construction, and at natural-text dfs the cap never fires (the
    sf-scale results are unchanged)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    df_cap = 1000
    grams = F.array_distinct(_word_ngrams(tokenize(F.col("text")), 5))
    g0 = docs.select("doc_id", F.explode(grams).alias("gram"))
    kept = (
        g0.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("gram")
    )
    g = g0.join(kept, "gram")
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("src_id"), "gram")
    b = g.select(F.col("doc_id").alias("dst_id"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(
            sz.select(F.col("doc_id").alias("src_id"), "n"), "src_id"
        )
        .filter(F.col("shared") * 10 >= F.col("n") * 9)
        .select(
            "src_id",
            "dst_id",
            F.col("shared").cast("long").alias("shared_grams"),
            F.col("n").cast("long").alias("src_grams"),
            F.round(F.col("shared").cast("double") / F.col("n"), 6).alias(
                "containment"
            ),
        )
    )


@register(
    "q370_histogram_split_finder",
    allow_non_equi=(
        "deliberate bounded cartesians: the 256-row bin spine x |classes| "
        "densification and a SINGLE-ROW corpus-total broadcast - "
        "group-cardinality, never row-level"
    ),
    oracle="""
    WITH v AS (
      SELECT LEAST(255, CAST(ROUND(value * 100) AS BIGINT) // 200) AS bin,
             event_type
      FROM events
    ), h AS (
      SELECT bin, event_type, COUNT(*) AS c FROM v GROUP BY 1, 2
    ), classes AS (SELECT DISTINCT event_type FROM v),
    spine AS (
      SELECT bin, event_type
      FROM (SELECT unnest(range(0, 256)) AS bin) CROSS JOIN classes
    ),
    filled AS (
      SELECT s.bin, s.event_type, COALESCE(h.c, 0) AS c
      FROM spine s LEFT JOIN h USING (bin, event_type)
    ),
    pre AS (
      SELECT bin, event_type,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS c_cum,
             SUM(c) OVER (PARTITION BY event_type) AS ct
      FROM filled
    ),
    cuts AS (
      SELECT bin,
             SUM(c_cum) AS n_l,
             SUM(ct) - SUM(c_cum) AS n_r,
             SUM(c_cum * c_cum) AS term_l,
             SUM((ct - c_cum) * (ct - c_cum)) AS term_r
      FROM pre GROUP BY bin
    ),
    scored AS (
      SELECT bin, n_l, n_r,
             (term_l * 1000000) // n_l + (term_r * 1000000) // n_r
               AS score_u,
             term_l, term_r
      FROM cuts WHERE n_l > 0 AND n_r > 0 AND bin < 255
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST((bin + 1) * 200 AS BIGINT) AS cut_cents,
           CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
           CAST(score_u AS BIGINT) AS score_u,
           ROUND((CAST(n_l + n_r AS DOUBLE)
                  - (CAST(term_l AS DOUBLE) / n_l
                     + CAST(term_r AS DOUBLE) / n_r))
                 / (n_l + n_r), 6) AS weighted_gini
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score_u DESC, bin) AS rk
          FROM scored)
    WHERE rk <= 5
    """,
)
def q370_histogram_split_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X300 — histogram-based best-split finding (the LightGBM/XGBoost
    `hist` kernel): bucket the feature into 256 fixed-width bins, build
    per-class cumulative counts, and score every cut by exact Gini gain
    — maximizing Σ_sides Σ_classes cnt²/n_side, which is equivalent to
    minimizing weighted impurity. Returns the 5 best cuts: one
    distributed pass over the corpus, then 256-row arithmetic — exactly
    how production GBDT frameworks make split finding
    corpus-size-independent.

    Engine-exactness: bin counts, cumulative counts and squared-count
    sums are int64; each side's score is the FLOOR division
    (term·10⁶)//n_side so the cut ranking is a total integer order
    (tiebreak: lower bin). The displayed weighted Gini is one fixed
    double expression from those same integers. The bin×class spine is
    densified so sparse bins can't misalign the cumulative sums (the
    q361 lesson).

    Scale: one groupBy(bin, class) collapses the corpus to ≤1280 rows;
    everything after is bounded-relation windows."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        F.least(
            F.lit(255), F.expr("CAST(ROUND(value * 100) AS BIGINT) DIV 200")
        ).alias("bin"),
        "event_type",
    )
    h = v.groupBy("bin", "event_type").agg(F.count(F.lit(1)).alias("c"))
    classes = v.select("event_type").distinct()
    spine = (
        spark.range(256)
        .select(F.col("id").alias("bin"))
        .crossJoin(F.broadcast(classes))
    )
    filled = spine.join(h, ["bin", "event_type"], "left").select(
        "bin", "event_type", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    pre = filled.select(
        "bin",
        F.sum("c").over(w_cum).alias("c_cum"),
        F.sum("c").over(w_all).alias("ct"),
    )
    cuts = pre.groupBy("bin").agg(
        F.sum("c_cum").alias("n_l"),
        (F.sum("ct") - F.sum("c_cum")).alias("n_r"),
        F.sum(F.col("c_cum") * F.col("c_cum")).alias("term_l"),
        F.sum(
            (F.col("ct") - F.col("c_cum")) * (F.col("ct") - F.col("c_cum"))
        ).alias("term_r"),
    )
    scored = cuts.filter(
        (F.col("n_l") > 0) & (F.col("n_r") > 0) & (F.col("bin") < 255)
    ).withColumn(
        "score_u",
        F.expr("(term_l * 1000000) DIV n_l + (term_r * 1000000) DIV n_r"),
    )
    w_rk = Window.orderBy(F.col("score_u").desc(), F.col("bin"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("bin").cast("long").alias("bin"),
            ((F.col("bin") + 1) * 200).cast("long").alias("cut_cents"),
            F.col("n_l").cast("long").alias("n_left"),
            F.col("n_r").cast("long").alias("n_right"),
            F.col("score_u").cast("long").alias("score_u"),
            F.round(
                (
                    (F.col("n_l") + F.col("n_r")).cast("double")
                    - (
                        F.col("term_l").cast("double") / F.col("n_l")
                        + F.col("term_r").cast("double") / F.col("n_r")
                    )
                )
                / (F.col("n_l") + F.col("n_r")),
                6,
            ).alias("weighted_gini"),
        )
    )


@register(
    "q371_stratified_kfold",
    oracle="""
    WITH ranked AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY md5('kfold:' || vec_id), vec_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY label) AS n_label
      FROM embeddings
    )
    SELECT CAST((rn - 1) % 5 AS BIGINT) AS fold, label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(n_label) AS BIGINT) AS n_label,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_label), 6) AS share
    FROM ranked GROUP BY 1, 2
    """,
)
def q371_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X301 — stratified k-fold assignment + balance audit: within each
    label, rows are ordered by a seeded deterministic hash (the q191
    md5 convention — reproducible "randomness" both engines compute
    identically) and dealt round-robin into 5 folds, guaranteeing
    per-label fold sizes within ±1 — the assignment eval pipelines need
    before cross-validation. The output is the audit matrix
    (fold × label counts and shares); the fold column itself is the
    assignment rule, reusable as a projection.

    Scale: one window per label partition, one aggregate — a single
    exchange on label; no joins, no collect."""
    emb = load(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.lit("kfold:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    w_all = Window.partitionBy("label")
    ranked = emb.select(
        "label",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_label"),
    )
    return (
        ranked.groupBy(((F.col("rn") - 1) % 5).alias("fold"), "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("n_label").cast("long").alias("n_label"),
        )
        .select(
            F.col("fold").cast("long").alias("fold"),
            "label",
            "n",
            "n_label",
            F.round(F.col("n").cast("double") / F.col("n_label"), 6).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: hashed-gram novelty twin (q372)
# ---------------------------------------------------------------------------


@register(
    "q372_ngram_novelty_hashed",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(
               list_transform(range(1, len(tk) - 2),
                              i -> array_to_string(tk[i:i+3], ' ')),
               s -> substr(md5(s), 1, 16))) AS hkey
      FROM toks WHERE len(tk) >= 4
    ), df AS (
      SELECT hkey, COUNT(*) AS n_docs FROM g GROUP BY hkey
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_grams,
           ROUND(CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_frac
    FROM g JOIN df USING (hkey)
    GROUP BY g.doc_id
    """,
)
def q372_ngram_novelty_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X302 — q349's PRODUCTION twin with hashed gram keys (round-6
    verdict #6): the df aggregation and the inverted-index join ship a
    fixed 16-hex-char (64-bit) md5-prefix key instead of the raw 4-word
    gram string, cutting the shuffle's per-row payload to a constant —
    SCALING.md measured q349's decade wall as dominated by materializing
    gram STRINGS through the exchange. The hash family is the portable
    md5 convention (q28/q191), computed identically by both engines, so
    unlike an engine-native xxhash/hash() pair a collision would hit
    both sides identically and the gate stays deterministic.

    Semantics: identical to q349 up to 64-bit-prefix collisions — at M
    distinct grams the expected collision count is ~M²/2⁶⁵ (≈3·10⁻⁸ at
    1M grams; at a petabyte-scale 10¹² grams, ~27 collisions corpus-wide
    each perturbing one document's novel-gram count by ≤2 — noise far
    below the metric's meaning). tests pin q372 ≡ q349 exactly on the
    fixture corpora. String-keyed q349 remains the oracle-exact anchor.

    Shape: row-local transform(md5) BEFORE array_distinct/explode — the
    hash is computed once per (doc, gram) inside whole-stage codegen and
    the raw gram string never leaves its scan task."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    hgrams = F.transform(
        _word_ngrams(toks, 4), lambda s: F.substring(F.md5(s), 1, 16)
    )
    g = (
        docs.select("doc_id", F.array_distinct(hgrams).alias("_g"))
        .filter(F.size("_g") > 0)
        .select("doc_id", F.explode("_g").alias("hkey"))
    )
    df_ = g.groupBy("hkey").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        g.join(df_, "hkey")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
            .cast("long")
            .alias("novel_grams"),
            F.round(
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6 batch: decontamination, distribution drift, corpus statistics,
# agreement, vocabulary growth, portable HLL, equi-depth binning
# (q373-q379, X303-X309)
# ---------------------------------------------------------------------------


@register(
    "q373_contamination_report",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id, source,
             UNNEST(list_transform(range(1, len(tk) - 6),
                    i -> array_to_string(tk[i:i+7], ' '))) AS gram
      FROM toks WHERE len(tk) >= 8
    ), bench AS (
      SELECT doc_id AS bdoc, gram FROM g WHERE source = 'src0'
    ), bkept AS (
      SELECT gram FROM bench GROUP BY gram HAVING COUNT(DISTINCT bdoc) <= 100
    ), train AS (
      SELECT doc_id, source, gram FROM g WHERE source <> 'src0'
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id
    ), hits AS (
      SELECT t.doc_id, t.source,
             COUNT(DISTINCT t.gram) AS shared_grams
      FROM train t
      JOIN bkept k ON k.gram = t.gram
      GROUP BY t.doc_id, t.source
    ), doc_level AS (
      SELECT h.doc_id, h.source, h.shared_grams,
             (h.shared_grams * 1000000) // sz.n_grams AS frac_u
      FROM hits h JOIN sz USING (doc_id)
    ), src_totals AS (
      SELECT source, COUNT(*) AS n_docs
      FROM documents WHERE source <> 'src0' GROUP BY source
    )
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(COUNT(d.doc_id), 0) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COALESCE(COUNT(d.doc_id), 0) AS DOUBLE) / s.n_docs, 6)
             AS contamination_rate,
           CAST(COALESCE(SUM(d.shared_grams), 0) AS BIGINT)
             AS total_shared_grams,
           CAST(COALESCE(MAX(d.frac_u), 0) AS BIGINT) AS worst_doc_frac_u
    FROM src_totals s LEFT JOIN doc_level d USING (source)
    GROUP BY s.source, s.n_docs
    """,
)
def q373_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X303 — SOURCE-LEVEL decontamination report (the GPT-3 Appendix-C /
    PaLM n-gram screen, aggregated to the decision grain): treating
    source 'src0' as the held-out benchmark, roll per-document 8-gram
    overlap up to each training SOURCE — how many of its docs touch the
    benchmark, at what rate, and how bad the worst doc is. q83 emits the
    doc-level flag list (which docs to drop); this is the report that
    decides whether a SOURCE is poisoned enough to quarantine wholesale.
    Grams occurring in >100 benchmark docs are excluded as
    non-discriminative boilerplate — standard decontamination practice
    and the df-cap that bounds the join's posting lists (q343 pattern).

    Engine-exactness: per-doc contamination fraction is carried as the
    integer floor (shared·10⁶)//n_grams so the per-source MAX is a total
    integer order; the one display division is the source rate.

    Scale: inverted-index equi-join gram→gram; the benchmark side is
    capped at 100 docs per gram, bounding candidates at |train
    grams|·100, and broadcasts when the benchmark is small (the common
    case: benchmarks are KBs, corpora are TBs). Sources with zero hits
    still get a row (LEFT join from source totals) — absence of
    contamination is a finding."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    g = (
        docs.select(
            "doc_id",
            "source",
            F.array_distinct(_word_ngrams(toks, 8)).alias("_g"),
        )
        .filter(F.size("_g") > 0)
        .select("doc_id", "source", F.explode("_g").alias("gram"))
    )
    bench = g.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("bdoc"), "gram"
    )
    bkept = (
        bench.groupBy("gram")
        .agg(F.countDistinct("bdoc").alias("bdf"))
        .filter(F.col("bdf") <= 100)
        .select("gram")
    )
    train = g.filter(F.col("source") != "src0")
    sz = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bkept), "gram")
        .groupBy("doc_id", "source")
        .agg(F.countDistinct("gram").alias("shared_grams"))
    )
    doc_level = hits.join(sz, "doc_id").select(
        "doc_id",
        "source",
        "shared_grams",
        F.expr("(shared_grams * 1000000) DIV n_grams").alias("frac_u"),
    )
    src_totals = (
        docs.filter(F.col("source") != "src0")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        src_totals.join(doc_level, "source", "left")
        .groupBy("source", "n_docs")
        .agg(
            F.count("doc_id").cast("long").alias("n_contaminated"),
            F.round(
                F.count("doc_id").cast("double") / F.col("n_docs"), 6
            ).alias("contamination_rate"),
            F.coalesce(F.sum("shared_grams"), F.lit(0))
            .cast("long")
            .alias("total_shared_grams"),
            F.coalesce(F.max("frac_u"), F.lit(0))
            .cast("long")
            .alias("worst_doc_frac_u"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_contaminated",
            "contamination_rate",
            "total_shared_grams",
            "worst_doc_frac_u",
        )
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
    "q375_source_signature_terms",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join of the corpus doc "
        "count onto the (source, token) relation - group-cardinality"
    ),
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), e AS (
      SELECT doc_id, source, UNNEST(tk) AS tok FROM toks
    ), tf AS (
      SELECT source, tok, COUNT(*) AS tf FROM e GROUP BY 1, 2
    ), df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM e GROUP BY tok
    ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.source, tf.tok, tf.tf, df.df,
             tf.tf * (length(bin(CAST(n_docs // df.df AS BIGINT))) - 1)
               AS score_u
      FROM tf JOIN df USING (tok) CROSS JOIN nd
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY score_u DESC, tok) AS rk
      FROM scored
    )
    SELECT source, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score_u AS BIGINT) AS score_u, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def q375_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X305 — top-5 characteristic terms per SOURCE by tf·idf with a
    DISCRETE idf (q92 is the per-DOCUMENT float-log form; this is the
    corpus-profiling grain — "what is each source about" — with an
    integer-exact score channel): idf_int = floor(log2(N/df)) computed exactly via
    binary-representation length (bit_length(N//df) − 1 — `bin()` on
    both engines), so the score tf·idf_int is a pure int64 and the
    ranking is a total integer order with no float log anywhere — the
    cross-engine-safe form of the corpus-characterization staple.
    Rounding idf to a power of two preserves the ranking semantics
    (boilerplate terms with df≈N score 0; rare terms dominate).

    Scale: two hash aggregations (tf on (source, token), df on token),
    one equi-join on token, a 1-row doc-count broadcast, and a top-5
    window per source — no explode beyond the token stream itself."""
    docs = load(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    tf = e.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = e.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "source",
            "tok",
            "tf",
            "df",
            # bin() never emits leading zeros for non-negative inputs on
            # either engine, so bit_length(x) = length(bin(x)) directly
            (
                F.col("tf") * (F.length(F.bin(F.expr("n_docs DIV df"))) - 1)
            ).alias("score_u"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score_u").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "source",
            "tok",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score_u").cast("long").alias("score_u"),
            F.col("rk").cast("long").alias("rk"),
        )
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
    "q377_vocab_growth_curve",
    allow_non_equi=(
        "deliberate bounded join of the checkpoint spine (n_docs/50 rows) "
        "onto per-bucket vocabulary counts - group-cardinality"
    ),
    oracle=r"""
    WITH d AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
      FROM documents
    ), e AS (
      SELECT rnk, UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x <> ''))) AS tok
      FROM d
    ), fr AS (
      SELECT tok, MIN(rnk) AS first_rank FROM e GROUP BY tok
    ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    bucketed AS (
      SELECT ((first_rank + 49) // 50) * 50 AS ck, COUNT(*) AS new_toks
      FROM fr GROUP BY 1
    ), spine AS (
      SELECT UNNEST(range(50, CAST(((n_docs + 49) // 50) * 50 + 1 AS BIGINT),
                          50)) AS ck
      FROM nd
    )
    SELECT CAST(s.ck AS BIGINT) AS checkpoint_docs,
           CAST(COALESCE(b.new_toks, 0) AS BIGINT) AS new_tokens,
           CAST(SUM(COALESCE(b.new_toks, 0))
                OVER (ORDER BY s.ck) AS BIGINT) AS vocab_size
    FROM spine s LEFT JOIN bucketed b ON b.ck = s.ck
    """,
)
def q377_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X307 — EXACT vocabulary-growth curve: distinct vocabulary size
    after the first k documents (doc_id order), at checkpoints of 50 —
    the curve whose Heaps'-law exponent q240 estimates by per-source
    log-log OLS; this computes the curve itself (a flattening curve
    means new data stops adding new language; near-linear growth flags
    noise/IDs, and the curve localizes WHERE growth breaks, which a
    fitted β cannot). Exact, not sampled: a token's contribution is its
    FIRST document rank, so the curve needs one min-aggregate per
    distinct token, not a cumulative-distinct scan.

    Scale: doc ranks come from the two-phase parallel prefix scan
    (`global_running_sum`, q360 pattern — no single-task global window
    over the corpus); per-token min is one hash aggregate; everything
    after lives on the checkpoint spine (n/50 rows), where the
    cumulative window is group-cardinality by construction."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = _spread(load(spark, sf_dir, "documents"))
    ranked = global_running_sum(
        docs.select("doc_id", "text").withColumn("_one", F.lit(1)),
        ["doc_id"],
        "_one",
        out_col="rnk",
    )
    e = ranked.select(
        "rnk",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    fr = e.groupBy("tok").agg(F.min("rnk").alias("first_rank"))
    bucketed = fr.groupBy(
        F.expr("((first_rank + 49) DIV 50) * 50").alias("ck")
    ).agg(F.count(F.lit(1)).alias("new_toks"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    spine = nd.select(
        F.explode(
            F.expr("sequence(50L, ((n_docs + 49) DIV 50) * 50, 50L)")
        ).alias("ck")
    )
    w = Window.orderBy("ck").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the global window here runs on the CHECKPOINT spine (n_docs/50
    # rows), not the corpus - bounded by construction
    return (
        spine.join(bucketed, "ck", "left")
        .select("ck", F.coalesce("new_toks", F.lit(0)).alias("new_toks"))
        .select(
            F.col("ck").cast("long").alias("checkpoint_docs"),
            F.col("new_toks").cast("long").alias("new_tokens"),
            F.sum("new_toks").over(w).cast("long").alias("vocab_size"),
        )
    )


@register(
    "q378_hll_distinct_portable",
    oracle="""
    WITH e AS (
      SELECT source, UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS tok
      FROM documents
    ), h AS (
      SELECT source, tok,
             CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT) AS reg,
             CAST(concat('0x', substr(md5(tok), 3, 13)) AS BIGINT) AS v52
      FROM e
    ), regs AS (
      SELECT source, reg,
             MAX(CASE WHEN v52 = 0 THEN 53
                      ELSE 53 - length(bin(v52)) END) AS m_j
      FROM h GROUP BY source, reg
    ), agg AS (
      SELECT source,
             COUNT(*) AS n_present,
             SUM(9007199254740992 >> m_j) AS sum_u
      FROM regs GROUP BY source
    ), ex AS (
      SELECT source, COUNT(DISTINCT tok) AS n_exact FROM e GROUP BY source
    )
    SELECT a.source,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           CAST(256 - a.n_present AS BIGINT) AS n_zero_regs,
           ROUND(
             CASE
               WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (a.sum_u + (256 - a.n_present) * 9007199254740992.0)
                    <= 640.0
                AND a.n_present < 256
               THEN 256.0 * ln(256.0 / GREATEST(256 - a.n_present, 1))
               ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (a.sum_u + (256 - a.n_present) * 9007199254740992.0)
             END, 2) AS hll_estimate
    FROM agg a JOIN ex x USING (source)
    """,
)
def q378_hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X308 — HyperLogLog distinct-token estimate per source with a
    PORTABLE register construction, upgrading the sketch family
    (q63/q102 are rows-only) to a fully oracle-checked member: the
    md5 hash family (q28/q175 convention) gives both engines identical
    registers, so the estimate itself — not just its error bound — is
    cross-engine reproducible. 256 registers (p=8): register = first 8
    hash bits, ρ = leading-zero count of the next 52 bits + 1 (via
    binary-representation length, exact integer).

    Engine-exactness: the harmonic sum Σ 2^−M_j is computed in integer
    units of 2⁻⁵³ — each term is the exact int64 (2⁵³ >> M_j), so the
    sum is order-independent; the HLL constant α_m·m² and the final
    division happen once, in one fixed double expression. The
    small-range linear-counting correction (E ≤ 2.5m with empty
    registers, Flajolet et al. 2007) applies on both engines; its ln()
    is the single libm call, displayed rounded to 2 dp. Exact distinct
    count is emitted alongside for error auditing.

    Scale: this is THE count-distinct for 100 TB — register state is
    256 int64s per group regardless of corpus size, map-side
    combinable; the exact countDistinct column is the test-scale audit
    and would be dropped at scale."""
    docs = load(spark, sf_dir, "documents")
    e = docs.select(
        "source",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    md = F.md5(F.col("tok"))
    h = e.select(
        "source",
        "tok",
        F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("reg"),
        F.conv(F.substring(md, 3, 13), 16, 10).cast("long").alias("v52"),
    )
    regs = h.groupBy("source", "reg").agg(
        F.max(
            F.when(F.col("v52") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.bin(F.col("v52")))
            )
        ).alias("m_j")
    )
    agg = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftright(9007199254740992L, CAST(m_j AS INT))")).alias(
            "sum_u"
        ),
    )
    ex = e.groupBy("source").agg(F.countDistinct("tok").alias("n_exact"))
    raw_est = (
        "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0"
        " * 9007199254740992.0"
        " / (sum_u + (256 - n_present) * 9007199254740992.0)"
    )
    return agg.join(ex, "source").select(
        "source",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.lit(256) - F.col("n_present")).cast("long").alias("n_zero_regs"),
        F.round(
            F.expr(
                f"CASE WHEN {raw_est} <= 640.0 AND n_present < 256"
                f" THEN 256.0 * ln(256.0 / GREATEST(256 - n_present, 1))"
                f" ELSE {raw_est} END"
            ),
            2,
        ).alias("hll_estimate"),
    )


@register(
    "q379_equidepth_bins",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join of the corpus row "
        "count onto the ranked relation - group-cardinality"
    ),
    oracle="""
    WITH r AS (
      SELECT value,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk
      FROM events
    ), n AS (SELECT COUNT(*) AS n FROM events)
    SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS bin,
           MIN(value) AS lo,
           MAX(value) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM r CROSS JOIN n
    GROUP BY 1
    """,
)
def q379_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X309 — exact equi-depth (equal-frequency) histogram of the value
    column, 10 bins, AT SCALE: q187 is the NTILE-over-global-sort anchor
    (single-task window, documented as the exact reference); this is its
    production twin on the q360 two-phase prefix-scan rank — same
    pattern as q26/q27 and q349/q372, exact-anchor + scale-path pairs.
    Bin of a row = ((rank−1)·k) // N + 1 — pure integer arithmetic on
    the global rank, so bin populations differ by at most 1 and both
    engines agree exactly (ties broken by event_id, making the rank
    total).

    Scale: the global rank comes from the two-phase parallel prefix
    scan (`global_running_sum`, q360 pattern), not a single-task global
    window; then one hash aggregate on the bin id. ((rk−1)·10 stays in
    int64 to N < 9·10¹⁷.)"""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    ev = load(spark, sf_dir, "events")
    ranked = global_running_sum(
        ev.select("value", "event_id").withColumn("_one", F.lit(1)),
        ["value", "event_id"],
        "_one",
        out_col="rk",
    )
    n = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .groupBy(F.expr("((rk - 1) * 10) DIV n").alias("_b"))
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(
            (F.col("_b") + 1).cast("long").alias("bin"),
            "lo",
            "hi",
            "n_rows",
        )
    )


@register(
    "q380_image_header_decode_ext",
    oracle="""
    SELECT doc_id AS id,
           CAST(1 + doc_id % 48 AS INT) AS width,
           CAST(1 + doc_id % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 6 = 1 THEN 1 ELSE 3 END AS INT) AS channels,
           TRUE AS decode_ok
    FROM documents
    """,
)
def q380_image_header_decode_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X310 — q259's end-to-end header-decode gate EXTENDED to all six
    supported raster formats (round 6 adds WebP and TIFF): real
    PNG/GIF/BMP/JPEG/WebP-VP8L/TIFF payloads synthesized on the
    executors with doc_id-derived dimensions, decoded back by parsing
    the actual format bytes (RIFF chunk walk + VP8L bit unpacking; TIFF
    IFD entry walk in either byte order). The oracle recomputes the
    expected dimensions from the doc_id formulas — any mis-read byte
    offset in the two new parsers hash-mismatches here. Channels: gif
    is palette-indexed (1); png(rgb)/bmp(24bpp)/jpeg(YCbCr)/
    webp(VP8L, no alpha bit)/tiff(SamplesPerPixel=3) are 3.

    Scale shape: identical to q259 — two chained Arrow-batched
    ``mapInPandas`` stages, zero shuffles, payloads never leave the
    executors."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        _ASSET_FORMAT_CYCLE_EXT,
        decode_images,
        synthesize_image_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_image_assets(
        docs, "doc_id", formats=_ASSET_FORMAT_CYCLE_EXT
    )
    return decode_images(assets, "id", "payload", use_stub=False)


@register(
    "q381_knn_adaptive_radius",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross joins of the ref-density "
        "stats row (count + extents -> radius) onto points and refs - "
        "group-cardinality, never row-level"
    ),
    oracle="""
    WITH pts AS (
      SELECT event_id,
             CAST(CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                                           1, 6)) AS BIGINT) % 1800
                  AS DOUBLE)/10.0 - 90.0 AS lat,
             CAST(CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                                           7, 6)) AS BIGINT) % 3600
                  AS DOUBLE)/10.0 - 180.0 AS lon
      FROM events
    ), refs AS (
      SELECT event_id AS ref_id, lat AS rlat, lon AS rlon
      FROM pts WHERE event_id % 97 = 0
    ), st AS (
      SELECT COUNT(*) AS n_refs,
             MIN(rlat) AS minlat, MAX(rlat) AS maxlat,
             MIN(rlon) AS minlon, MAX(rlon) AS maxlon
      FROM refs
    ), rr AS (
      SELECT n_refs,
             GREATEST(LEAST(sqrt((24.0 * (maxlat - minlat) * (maxlon - minlon))
                        / (3.141592653589793 * n_refs)), 90.0), 0.000001) AS r
      FROM st
    ), rc AS (
      SELECT ref_id, rlat, rlon, r,
             FLOOR(rlat / r) + dy.d AS cy, FLOOR(rlon / r) + dx.d AS cx
      FROM refs CROSS JOIN rr
      CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dy
      CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dx
    ), q AS (
      SELECT event_id, lat, lon, FLOOR(lat / r) AS cy, FLOOR(lon / r) AS cx
      FROM pts CROSS JOIN rr
    ), cand AS (
      SELECT q.event_id, rc.ref_id,
             (q.lat - rc.rlat)*(q.lat - rc.rlat)
             + (q.lon - rc.rlon)*(q.lon - rc.rlon) AS dist2,
             rc.r
      FROM q JOIN rc USING (cy, cx)
      WHERE q.event_id <> rc.ref_id
        AND (q.lat - rc.rlat)*(q.lat - rc.rlat)
            + (q.lon - rc.rlon)*(q.lon - rc.rlon) <= rc.r * rc.r
    ), ranked AS (
      SELECT event_id, ref_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY dist2, ref_id) AS knn_rank
      FROM cand
    )
    SELECT CAST(knn_rank AS BIGINT) AS knn_rank,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT ref_id) AS BIGINT) AS n_distinct_refs,
           CAST(SUM(CAST(FLOOR(sqrt(dist2) * 100.0) AS BIGINT))
                // COUNT(*) AS BIGINT) AS mean_dist_cdeg
    FROM ranked WHERE knn_rank <= 3
    GROUP BY knn_rank
    """,
)
def q381_knn_adaptive_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X311 — DENSITY-ADAPTIVE kNN radius: the spatial analog of
    lsh_geometry_for (q344). The round-6 decade probe measured q364's
    fixed 6°-radius grid-kNN at exponent 1.39 — with a fixed radius,
    per-cell density grows ∝ n, so candidates per point grow ∝ n and
    total work ∝ n². The escape is the same corpus-sized-geometry move:
    size the radius FROM the data, r = √(c·k·A/(π·n_refs)) (expected
    refs inside the circle ≈ c·k = 24, constant), so per-point candidate
    volume stays O(k) at any density and total work stays ~linear. The
    radius derives from one count+extent aggregate — the same bounded
    stats action as q344's corpus count — and is data-identical on both
    engines: IEEE-exact-rounded *, /, √ on the same inputs in the same
    order, literal π, LEAST-clamped at 90°.

    Semantics: k=3 nearest within the adaptive radius (points in sparse
    pockets may return fewer — both engines agree exactly, the oracle
    shares the radius formula). Distances reported as exact integer
    centi-degrees (floor(√d·100) — total integer order, order-free sum).

    Scale: grid cell size == radius keeps the 3×3 neighborhood a
    complete candidate set (grid_knn_join's exactness argument) at any
    corpus size; the ref side explodes ×9 and broadcasts.

    Coordinates are hash-derived (md5 of event_id, two disjoint 24-bit
    substrings for lat/lon) rather than the modular event-id lattice
    other spatial probes use: the lattice puts every point on slope-7
    1D LINES (3,600 distinct positions total), which violates the
    2D-uniformity the adaptive-radius formula assumes — round 7
    measured candidates/point GROWING 34.9→53.8 across the probe
    decade on lattice coords (the O(k) invariant only holds against
    the assumed density model) vs flat on hash coords. Both engines
    compute the identical hash, so the gate stays exact."""
    ev = load(spark, sf_dir, "events")
    idmd = F.md5(F.col("event_id").cast("string"))
    pts = ev.select(
        "event_id",
        (
            F.conv(F.substring(idmd, 1, 6), 16, 10).cast("long") % 1800
        ).cast("double").alias("lat"),
        (
            F.conv(F.substring(idmd, 7, 6), 16, 10).cast("long") % 3600
        ).cast("double").alias("lon"),
    ).select(
        "event_id",
        (F.col("lat") / 10.0 - 90.0).alias("lat"),
        (F.col("lon") / 10.0 - 180.0).alias("lon"),
    )
    refs = pts.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("ref_id"),
        F.col("lat").alias("rlat"),
        F.col("lon").alias("rlon"),
    )
    st = refs.agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.min("rlat").alias("minlat"),
        F.max("rlat").alias("maxlat"),
        F.min("rlon").alias("minlon"),
        F.max("rlon").alias("maxlon"),
    )
    # GREATEST(..., 1e-6): a degenerate reference extent (single ref, or
    # all refs sharing a lat/lon) would give r=0 and divide the cell keys
    # by zero (NaN cells -> silently empty result); the epsilon floor keeps
    # the query well-defined and is mirrored in the oracle.
    rr = st.select(
        F.expr(
            "GREATEST(LEAST(sqrt((24.0 * (maxlat - minlat) * (maxlon - minlon))"
            " / (3.141592653589793 * n_refs)), 90.0), 0.000001)"
        ).alias("r")
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    rc = (
        refs.crossJoin(F.broadcast(rr))
        .withColumn("dy", F.explode(off))
        .withColumn("dx", F.explode(off))
        .select(
            (F.floor(F.col("rlat") / F.col("r")) + F.col("dy")).alias("cy"),
            (F.floor(F.col("rlon") / F.col("r")) + F.col("dx")).alias("cx"),
            "ref_id",
            "rlat",
            "rlon",
            "r",
        )
    )
    # Repartition the POINT side by cell BEFORE the broadcast join: the
    # broadcast hash join preserves this partitioning, and the ranking
    # window below declares (cy, cx, event_id) — a superset of the hash
    # keys — so Catalyst reuses THIS exchange instead of shuffling the
    # ~k-per-point CANDIDATE stream (the candidate exchange was the
    # dominant super-constant at decade-B; points are 1/k the rows).
    # Each event has exactly one (cy, cx), so per-(cy, cx, event_id)
    # ranks equal per-event ranks.
    q = (
        pts.crossJoin(F.broadcast(rr))
        .select(
            "event_id",
            "lat",
            "lon",
            F.floor(F.col("lat") / F.col("r")).alias("cy"),
            F.floor(F.col("lon") / F.col("r")).alias("cx"),
        )
        .repartition(F.col("cy"), F.col("cx"))
    )
    dist2 = (F.col("lat") - F.col("rlat")) * (F.col("lat") - F.col("rlat")) + (
        F.col("lon") - F.col("rlon")
    ) * (F.col("lon") - F.col("rlon"))
    cand = (
        q.join(F.broadcast(rc), ["cy", "cx"])
        .filter(F.col("event_id") != F.col("ref_id"))
        .select(
            "cy", "cx", "event_id", "ref_id", dist2.alias("dist2"), "r"
        )
        .filter(F.col("dist2") <= F.col("r") * F.col("r"))
    )
    w = Window.partitionBy("cy", "cx", "event_id").orderBy(
        "dist2", "ref_id"
    )
    return (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= 3)
        .groupBy(F.col("knn_rank").cast("long").alias("knn_rank"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("ref_id").cast("long").alias("n_distinct_refs"),
            F.expr(
                "SUM(CAST(FLOOR(sqrt(dist2) * 100.0) AS BIGINT)) DIV COUNT(*)"
            )
            .cast("long")
            .alias("mean_dist_cdeg"),
        )
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


def _minhash_portable_oracle(
    threshold: float = 0.8, num_hashes: int = 32, bands: int = 8
) -> str:
    """DuckDB oracle that rebuilds the ENTIRE portable-minhash pipeline
    bit-identically: 60-bit md5-prefix shingle hashes, the
    (a_i·x+b_i) mod 2³¹−1 slot family, per-band signature-tuple
    equality for candidates (OR of bands — each unordered pair emitted
    once), and the exact hashed-set Jaccard verify with the same
    rounded-threshold compare. Any divergence in any stage of the LSH
    pipeline hash-mismatches at the gate."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        minhash_portable_slot_consts,
    )

    p = 2147483647
    r = num_hashes // bands
    consts = minhash_portable_slot_consts(num_hashes)
    sig_cols = ",\n             ".join(
        f"MIN((hp * {a} + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_eq = " OR\n        ".join(
        "("
        + " AND ".join(f"a.h{bi * r + j} = b.h{bi * r + j}" for j in range(r))
        + ")"
        for bi in range(bands)
    )
    t10 = int(threshold * 10)
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS tk
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h60
      FROM (SELECT doc_id, UNNEST(tk) AS tok FROM toks)
    ), hp AS (
      SELECT doc_id, h60, h60 % {p} AS hp FROM sh
    ), sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hp GROUP BY doc_id
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
        {band_eq})
    ), sized AS (
      SELECT c.id_a, c.id_b, sa.n AS na, sb.n AS nb
      FROM cand c
      JOIN sz sa ON sa.doc_id = c.id_a
      JOIN sz sb ON sb.doc_id = c.id_b
      WHERE LEAST(sa.n, sb.n) * 10 >= GREATEST(sa.n, sb.n) * {t10}
    ), inter AS (
      SELECT s.id_a, s.id_b, s.na, s.nb, COUNT(*) AS i
      FROM sized s
      JOIN sh a ON a.doc_id = s.id_a
      JOIN sh b ON b.doc_id = s.id_b AND b.h60 = a.h60
      GROUP BY s.id_a, s.id_b, s.na, s.nb
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
    FROM inter
    WHERE ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) >= {threshold}
    """


@register("q383_minhash_portable", oracle=_minhash_portable_oracle())
def q383_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X313 — minhash-LSH near-dup pairs with the PORTABLE md5 hash
    family: the first fully ORACLE-CHECKED member of the minhash family
    (q27's xxhash64 family is engine-private, so q27 is rows-only with
    pytest recall pins; this twin trades ~2× string-hash cost for a
    DuckDB oracle that rebuilds signatures, banding, candidates and the
    exact-Jaccard verify bit-identically — the same upgrade q28 gave
    simhash in round 5). Every LSH stage is now under the hash gate:
    a wrong slot constant, band split, pair-dedup rule or set
    intersection mismatches immediately.

    See ``operators/dedup.py:minhash_near_duplicates_portable`` for the
    construction and the overflow-safety argument (all slot products
    < 2⁶²)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        minhash_near_duplicates_portable,
    )

    docs = load(spark, sf_dir, "documents")
    return minhash_near_duplicates_portable(
        docs, "doc_id", "text", threshold=0.8
    )


def _cosine_lsh_portable_oracle(
    threshold: float = 0.85, n_planes: int = 6, n_tables: int = 8, dim: int = 64
) -> str:
    """DuckDB oracle rebuilding the portable hyperplane-LSH pipeline
    bit-identically: the SAME ±1 sign literals (generated by the same
    Python function the engine embeds), the same left-to-right float
    dot (q46 precedent: list_sum matches the engine's zip_with left
    fold), the same ≥0→1 tie rule and bit packing, OR-of-tables
    candidates (each unordered pair once), and the q46 4-dp-rounded
    exact-cosine verify."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        portable_hyperplane_signs,
    )

    signs = portable_hyperplane_signs(n_tables, n_planes, dim)
    bucket_exprs = []
    for t in range(n_tables):
        bits = []
        for j in range(n_planes):
            arr = "[" + ", ".join(
                f"{float(s):.1f}" for s in signs[t][j]
            ) + "]"
            dot = (
                f"list_sum(list_transform(list_zip(embedding, {arr}),"
                f" p -> CAST(p[1] AS DOUBLE) * p[2]))"
            )
            bits.append(
                f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)"
            )
        bucket_exprs.append("(" + " + ".join(bits) + f") AS bk{t}")
    band_eq = " OR ".join(f"a.bk{t} = b.bk{t}" for t in range(n_tables))
    cos = (
        "ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        " / (SQRT(list_sum(list_transform(a.embedding,"
        " x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
        " * SQRT(list_sum(list_transform(b.embedding,"
        " x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4)"
    )
    buckets = ",\n             ".join(bucket_exprs)
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {buckets}
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
    FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({band_eq})
    WHERE {cos} >= {threshold}
    """


@register("q384_cosine_lsh_portable",
          oracle=_cosine_lsh_portable_oracle(0.45, 4, 12))
def q384_cosine_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X314 — cosine near-dup via hyperplane LSH with a PORTABLE
    deterministic ±1 plane family: the first fully ORACLE-CHECKED
    member of the embedding-LSH family (q47/q344/q33 use the fast
    numpy-Gaussian family — engine-private, rows-only). Together with
    q383 (portable minhash) and q28 (portable simhash), every LSH
    modality now has a hash-checked anchor: signatures, bucket keys,
    the first-agreeing-table candidate dedup and the exact-cosine
    verify all reproduce bit-identically on DuckDB.

    See ``operators/similarity.py:cosine_near_duplicates_portable``
    for the Rademacher-family argument and the float-determinism
    conventions (left-fold dots, ≥0→1 tie rule, q46's 4-dp rounded
    verify)."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        cosine_near_duplicates_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    # t=0.45 with (4 planes, 12 tables): recall 1-(1-p^4)^12 = 0.90 at
    # the boundary, and — unlike the dedup-regime 0.85 — NON-EMPTY on
    # the driver corpus (14 true pairs >= 0.45 at sf0.01; its planted
    # cosine dups live near 0.4-0.5), so the oracle gate is checking
    # real pairs, not 0 == 0.
    return cosine_near_duplicates_portable(
        emb, dim=64, threshold=0.45, n_planes=4, n_tables=12
    )


@register(
    "q385_kmv_vocab_overlap",
    allow_non_equi=(
        "deliberate bounded OR-join attaching each source PAIR (<=190 "
        "rows) to its two 16-row sketches - pair-cardinality x sketch "
        "size, never corpus rows"
    ),
    oracle="""
    WITH t AS (
      SELECT DISTINCT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h60
      FROM t
    ), sk AS (
      SELECT source, h60 FROM (
        SELECT source, h60,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h60) AS rk
        FROM h) WHERE rk <= 16
    ), prs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM (SELECT DISTINCT source FROM sk) a
      JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    ), mv AS (
      SELECT p.src_a, p.src_b, v.h60,
             MAX(CASE WHEN v.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN v.source = p.src_b THEN 1 ELSE 0 END) AS in_b
      FROM prs p JOIN sk v ON v.source = p.src_a OR v.source = p.src_b
      GROUP BY p.src_a, p.src_b, v.h60
    ), rkd AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
                                   ORDER BY h60) AS rk,
             COUNT(*) OVER (PARTITION BY src_a, src_b) AS n_merged
      FROM mv
    ), agg AS (
      SELECT src_a, src_b,
             LEAST(16, MAX(n_merged)) AS km,
             MAX(CASE WHEN rk = LEAST(16, n_merged) THEN h60 END) AS theta,
             SUM(CASE WHEN rk <= LEAST(16, n_merged)
                       AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS shared,
             MAX(n_merged) AS n_merged
      FROM rkd GROUP BY src_a, src_b
    )
    SELECT src_a, src_b,
           CAST(km AS BIGINT) AS km,
           CAST(shared AS BIGINT) AS shared_topk,
           ROUND(CAST(shared AS DOUBLE) / km, 6) AS kmv_jaccard,
           ROUND(CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)
                 ELSE (km - 1) * 1152921504606846976.0 / theta END, 2)
             AS est_union,
           ROUND((CAST(shared AS DOUBLE) / km)
                 * CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)
                   ELSE (km - 1) * 1152921504606846976.0 / theta END, 2)
             AS est_inter
    FROM agg
    """,
)
def q385_kmv_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X315 — pairwise source-vocabulary overlap from K-MINIMUM-VALUES
    sketches (Bar-Yossef et al. 2002): the distinct sketch that, unlike
    HLL (q378), supports SET OPERATIONS — union via merged top-k,
    intersection via the Jaccard share of the merged threshold region —
    so cross-source overlap at 100 TB costs O(k) state per source
    instead of the |vocab|-row token join (q166 is that exact anchor).
    Portable md5 hash family (q175/q378 convention): both engines hold
    IDENTICAL sketches, so estimates — not just error bounds — are
    hash-checked.

    Estimator: sketch = 16 smallest distinct 60-bit token hashes per
    source; for a pair, km = min(16, |merged values|), θ = km-th
    smallest merged value, ρ = |values ≤ θ in both sketches|/km,
    U ≈ (km−1)·2⁶⁰/θ (or the exact merged count when the sketches are
    complete), I ≈ ρ·U. All sketch arithmetic is exact integers; the
    two estimates are one-shot double expressions rounded once.

    Scale: one corpus-sized distinct on (source, token); sketches come
    from a per-source window over the distinct-hash relation (k rows
    survive per source, map-side-prunable); everything after is
    pair-cardinality (≤190 rows × 32 sketch values)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    h = t.select(
        "source",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("long")
        .alias("h60"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("h60")
    sk = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 16)
        .select("source", "h60")
    )
    srcs = sk.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(
            srcs.select(F.col("source").alias("src_b")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    mv = (
        prs.join(
            F.broadcast(sk.select(F.col("source").alias("s"), "h60")),
            (F.col("s") == F.col("src_a")) | (F.col("s") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "h60")
        .agg(
            F.max(
                F.when(F.col("s") == F.col("src_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("s") == F.col("src_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h60")
    wc = Window.partitionBy("src_a", "src_b")
    rkd = mv.select(
        "src_a",
        "src_b",
        "h60",
        "in_a",
        "in_b",
        F.row_number().over(wp).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_merged"),
    )
    agg = rkd.groupBy("src_a", "src_b").agg(
        F.least(F.lit(16), F.max("n_merged")).alias("km"),
        F.max(
            F.when(
                F.col("rk") == F.least(F.lit(16), F.col("n_merged")),
                F.col("h60"),
            )
        ).alias("theta"),
        F.sum(
            F.when(
                (F.col("rk") <= F.least(F.lit(16), F.col("n_merged")))
                & (F.col("in_a") == 1)
                & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        ).alias("shared"),
        F.max("n_merged").alias("n_merged"),
    )
    u_est = (
        "CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)"
        " ELSE (km - 1) * 1152921504606846976.0 / theta END"
    )
    return agg.select(
        "src_a",
        "src_b",
        F.col("km").cast("long").alias("km"),
        F.col("shared").cast("long").alias("shared_topk"),
        F.round(F.col("shared").cast("double") / F.col("km"), 6).alias(
            "kmv_jaccard"
        ),
        F.expr(f"ROUND({u_est}, 2)").alias("est_union"),
        F.expr(
            f"ROUND((CAST(shared AS DOUBLE) / km) * ({u_est}), 2)"
        ).alias("est_inter"),
    )


def _dtw6_alias_chain() -> list[tuple[str, str]]:
    """The 6×6 DTW dynamic program UNROLLED as 36 (alias, expression)
    pairs over integer segment columns a1..a6 / b1..b6 — emitted as the
    SAME text for Spark and DuckDB (both support lateral column-alias
    references, so the chain is one projection on either engine). Cost
    is |a_i − b_j| (exact int64); D_ij = cost + min of the three
    predecessors — the full recurrence with no band, no recursion, no
    UDF. This is the hash-checkable anchor for the DTW family (q352's
    banded applyInPandas form is rows-only by design)."""
    out = []
    for i in range(1, 7):
        for j in range(1, 7):
            c = f"ABS(a{i} - b{j})"
            if i == 1 and j == 1:
                e = c
            elif i == 1:
                e = f"{c} + d1{j - 1}"
            elif j == 1:
                e = f"{c} + d{i - 1}1"
            else:
                e = (
                    f"{c} + LEAST(d{i - 1}{j}, d{i}{j - 1},"
                    f" d{i - 1}{j - 1})"
                )
            out.append((f"d{i}{j}", e))
    return out


@register(
    "q386_dtw_day_profile_portable",
    oracle="""
    WITH seg AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
    """
    + ",\n".join(
        f"             SUM(CASE WHEN EXTRACT(hour FROM ts) // 4 = {s}"
        f" THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS s{s + 1}"
        for s in range(6)
    )
    + """
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), paired AS (
      SELECT user_id, day,
             s1 AS b1, s2 AS b2, s3 AS b3, s4 AS b4, s5 AS b5, s6 AS b6,
             LAG(day) OVER w AS prev_day,
             LAG(s1) OVER w AS a1, LAG(s2) OVER w AS a2,
             LAG(s3) OVER w AS a3, LAG(s4) OVER w AS a4,
             LAG(s5) OVER w AS a5, LAG(s6) OVER w AS a6
      FROM seg WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ), adj AS (
      SELECT * FROM paired
      WHERE prev_day IS NOT NULL AND day = prev_day + INTERVAL 1 DAY
    ), dp AS (
      SELECT user_id, day,
    """
    + ",\n".join(
        f"             {e} AS {a}" for a, e in _dtw6_alias_chain()
    )
    + """,
             ABS(a1-b1)+ABS(a2-b2)+ABS(a3-b3)+ABS(a4-b4)
             +ABS(a5-b5)+ABS(a6-b6) AS l1
      FROM adj
    )
    SELECT user_id, CAST(day AS DATE) AS day,
           CAST(d66 AS BIGINT) AS dtw_cost_cents,
           CAST(l1 AS BIGINT) AS l1_cost_cents,
           CAST(l1 - d66 AS BIGINT) AS warp_gain_cents
    FROM dp
    """,
)
def q386_dtw_day_profile_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X316 — day-over-day activity-profile DTW, EXACT and fully
    oracle-checked: each (user, day) collapses to a fixed 6-segment
    integer-cents profile (4-hour buckets), and adjacent days are
    compared with the full 6×6 DTW recurrence UNROLLED into 36 lateral
    column aliases — the same expression text on both engines, all
    int64, no recursion, no Python. This anchors the DTW family's
    semantics under the hash gate (q352's banded per-trajectory
    applyInPandas form stays rows-only by design — variable-length
    sequences don't unroll); warp_gain = L1 − DTW ≥ 0 quantifies how
    much alignment flexibility explains the day's change (a pure time
    SHIFT has high L1 but low DTW; a volume change moves both).

    Scale: one (user, day) hash aggregate over the corpus, one lag
    window on the user exchange, then 36 row-local integer
    expressions — corpus touched once, state bounded by user-days."""
    ev = load(spark, sf_dir, "events")
    seg = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"hour(ts) DIV 4 = {s}"),
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(F.lit(0))
            ).alias(f"s{s + 1}")
            for s in range(6)
        ]
    )
    w = Window.partitionBy("user_id").orderBy("day")
    paired = seg.select(
        "user_id",
        "day",
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(1, 7)],
        F.lag("day").over(w).alias("prev_day"),
        *[F.lag(f"s{k}").over(w).alias(f"a{k}") for k in range(1, 7)],
    )
    adj = paired.filter(
        F.col("prev_day").isNotNull()
        & (F.col("day") == F.date_add(F.col("prev_day"), 1))
    )
    dp = adj
    for alias, expr in _dtw6_alias_chain():
        dp = dp.withColumn(alias, F.expr(expr))
    l1 = "+".join(f"ABS(a{k} - b{k})" for k in range(1, 7))
    return dp.select(
        "user_id",
        F.col("day").cast("date").alias("day"),
        F.col("d66").cast("long").alias("dtw_cost_cents"),
        F.expr(l1).cast("long").alias("l1_cost_cents"),
        (F.expr(l1) - F.col("d66")).cast("long").alias("warp_gain_cents"),
    )


# ---------------------------------------------------------------------------
# Round 7: versioned-table audit through the oracle gate, portable sketch
# upgrades, and the operator additions of this round
# ---------------------------------------------------------------------------


@register(
    "q387_time_travel_diff",
    build_time_exec=(
        "writes two table versions (write_versioned) into a tempdir at "
        "plan-build time so read_version time travel is exercised under "
        "the oracle gate; bounded |users| snapshot writes"
    ),
    oracle="""
    WITH old AS (
      SELECT user_id, status, value_cents FROM (
        SELECT user_id, event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'
      ) WHERE rn = 1
    ),
    new AS (
      SELECT user_id, status, value_cents FROM (
        SELECT user_id, event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT COALESCE(n.user_id, o.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.status AS old_status, o.value_cents AS old_value_cents,
           n.status AS new_status, n.value_cents AS new_value_cents
    FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.status IS DISTINCT FROM n.status
       OR o.value_cents IS DISTINCT FROM n.value_cents
    """,
)
def q387_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X317 — TIME-TRAVEL AUDIT: q134's snapshot diff computed between
    two PINNED VERSIONS of a versioned table (write_versioned →
    read_version(1) vs read_version(2)) instead of two ad-hoc filters —
    the "what did this publish actually change?" audit exactly as a
    lakehouse runs it against its table format. The day-14 snapshot is
    committed as v1, the month-end snapshot as v2, then both flow back
    through read_version and operators/state.snapshot_diff; the oracle
    recomputes both relations directly from events, so a value-hash
    match proves the versioned store's write→commit→time-travel round
    trip is byte-faithful (not just row-countable) AND that version
    pins return the exact relation that was committed — through the
    manifest-CAS commit protocol added this round.

    Scale: both snapshots are |users|-sized latest-state rollups; the
    diff is one full-outer equi-join on the key. The versioned layer
    adds no data movement beyond the parquet write/read."""
    import tempfile

    from noaa_ais_glue_lakehouse_spark.operators.sessionize import (
        latest_per_entity,
    )
    from noaa_ais_glue_lakehouse_spark.operators.state import snapshot_diff
    from noaa_ais_glue_lakehouse_spark.sources.writers import (
        read_version,
        write_versioned,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )

    def snap(df):
        return latest_per_entity(df, "user_id", "ts", ["event_id"]).select(
            "user_id", "status", "value_cents"
        )

    table = tempfile.mkdtemp(prefix="q387_versions_")
    v1 = write_versioned(
        snap(ev.filter(F.to_date("ts") < F.lit("2024-01-15").cast("date"))),
        table,
    )
    v2 = write_versioned(snap(ev), table)
    old = read_version(spark, table, v1)
    new = read_version(spark, table, v2)
    return snapshot_diff(old, new, ["user_id"])


@register(
    "q388_tpch_q6_revenue_delta",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
             AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q388_tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X318 — TPC-H Q6 shape (forecasting revenue change): the revenue
    that would have been gained by eliminating small discounts on
    small-quantity orders in one year — a pure filter-and-aggregate
    whose entire predicate set (date range, discount band, quantity
    cap) must reach the parquet scan as pushed filters; completes the
    engine's TPC-H shape coverage to all 22 together with q389–q392.
    Revenue summed in exact integer cents (order-free).

    Scale: zero shuffles beyond the final 1-row aggregate; the scan
    reads 4 columns of the 11 (ReadSchema pruning)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q389_tpch_q12_priority_by_class",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_returnflag
    """,
)
def q389_tpch_q12_priority_by_class(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X319 — TPC-H Q12 shape (shipping modes and order priority): per
    shipping class, how many high- vs low-priority orders it carried —
    the join + dual-conditional-count pattern that audits whether
    cheaper ship modes delay critical orders. The testdata star schema
    has no l_shipmode column, so l_returnflag is the class dimension;
    the SHAPE (fact-to-dim equi-join, IN-list priority split, the
    shipped-after-ordered sanity predicate as a non-equi filter ON TOP
    of the equi-join) is Q12's. reference: the Athena corpus' Q16-Q18
    analytic family (SURVEY §2.11) stops at single-table rollups.

    Scale: one shuffle on orderkey (or broadcast at dim-sized orders);
    the priority split is conditional aggregation, not a second scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "q390_tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS supplycost_cents
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), cand AS (
      SELECT p.p_partkey, p.p_type, ps.suppkey, ps.supplycost_cents,
             MIN(ps.supplycost_cents) OVER (PARTITION BY p.p_partkey)
               AS min_cost_cents
      FROM part p
      JOIN ps ON ps.partkey = p.p_partkey
      JOIN eu ON eu.s_suppkey = ps.suppkey
      WHERE p.p_size = 25 AND p.p_type = 'STANDARD'
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           c.p_partkey, c.supplycost_cents
    FROM cand c JOIN eu ON eu.s_suppkey = c.suppkey
    WHERE c.supplycost_cents = c.min_cost_cents
    """,
)
def q390_tpch_q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X320 — TPC-H Q2 shape (minimum-cost supplier): for every size-25
    STANDARD part, the European supplier(s) offering it at the minimum
    supply cost — the classic correlated-scalar-subquery (cost =
    (SELECT MIN(...) for this part)) DECORRELATED into a per-part
    window-min, the plan Catalyst itself rewrites correlated subqueries
    into. The star schema has no partsupp table, so the (part, supplier)
    cost relation derives from lineitem: supplycost = min observed unit
    price in exact cents (IEEE-identical division both engines).

    Scale: the region/nation/supplier side collapses to a broadcast;
    the ps rollup is one map-side-combinable aggregation on
    (part, supplier); the per-part min is a window over the already
    part-clustered join output — no row explosion anywhere."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(
        F.min(
            cents(F.col("l_extendedprice") / F.col("l_quantity"))
        ).alias("supplycost_cents")
    )
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(
            F.broadcast(nat), nat.n_nationkey == sup.s_nationkey
        )
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        part.join(ps, ps.partkey == part.p_partkey)
        .join(F.broadcast(eu), eu.s_suppkey == ps.suppkey)
        .withColumn(
            "min_cost_cents",
            F.min("supplycost_cents").over(
                Window.partitionBy("p_partkey")
            ),
        )
    )
    return cand.filter(
        F.col("supplycost_cents") == F.col("min_cost_cents")
    ).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "supplycost_cents"
    )


@register(
    "q391_tpch_q16_supplier_relationship",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem
    ), excluded AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO')
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q391_tpch_q16_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X321 — TPC-H Q16 shape (parts/supplier relationship): how many
    suppliers can supply parts of given brand/type/size combinations,
    EXCLUDING suppliers on a complaints list — the NOT IN
    anti-join + COUNT(DISTINCT) rollup. partsupp derives from lineitem
    (distinct (part, supplier) pairs); the complaints list is the
    negative-balance suppliers (the schema has no comment column to
    regex, the exclusion SHAPE is what Q16 exercises).

    Scale: the exclusion list is tiny → broadcast LEFT ANTI join (never
    a NOT-IN NULL trap: keys are non-null by construction); the distinct
    pair relation partial-aggregates map-side before the shuffle."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).distinct()
    excluded = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        ps.join(
            F.broadcast(excluded),
            ps.suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, part.p_partkey == F.col("partkey"))
        .groupBy(
            "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
        )
        .agg(F.countDistinct("suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q392_tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), small_parts AS (
      SELECT p_partkey FROM part WHERE p_type = 'SMALL'
    ), dominant AS (
      SELECT s.suppkey
      FROM shipped s
      JOIN small_parts sp ON sp.p_partkey = s.partkey
      JOIN (SELECT partkey, SUM(qty) AS total_qty
            FROM shipped GROUP BY 1) t ON t.partkey = s.partkey
      WHERE 2 * s.qty > t.total_qty
    )
    SELECT DISTINCT sup.s_name, n.n_name
    FROM supplier sup
    JOIN nation n ON n.n_nationkey = sup.s_nationkey
    WHERE sup.s_suppkey IN (SELECT suppkey FROM dominant)
    """,
)
def q392_tpch_q20_dominant_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X322 — TPC-H Q20 shape (potential part promotion): suppliers who
    shipped MORE THAN HALF of some SMALL part's total 1997 volume — the
    doubly-nested IN subquery with a correlated aggregate threshold
    (availqty > 0.5·sum(qty) in stock Q20), decorrelated into a
    per-part total join with the integer-safe 2·qty > total comparison
    (no 0.5 float). Quantities are integral in this corpus; ROUND
    makes that explicit so the sums are exact int64 on both engines.

    Scale: threshold decorrelation turns the correlated subquery into
    one extra map-side-combinable rollup on partkey reusing the same
    shuffle key as the (part, supplier) aggregate; the supplier→nation
    resolution is a broadcast semi-join at |dominant| rows."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    small_parts = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    totals = shipped.groupBy("partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(
            F.broadcast(small_parts),
            small_parts.p_partkey == shipped.partkey,
        )
        .join(totals, "partkey")
        .filter(2 * F.col("qty") > F.col("total_qty"))
        .select("suppkey")
    )
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    return (
        sup.join(
            F.broadcast(dominant), dominant.suppkey == sup.s_suppkey,
            "left_semi",
        )
        .join(F.broadcast(nat), nat.n_nationkey == sup.s_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "q393_versioned_cdc_rollforward",
    build_time_exec=(
        "writes three table versions (initial snapshot + two CDC-batch "
        "merges) into a tempdir at plan-build time so the incremental "
        "rollforward v(n+1) = apply_cdc(read_version(n), batch) is "
        "exercised under the oracle gate; bounded |users| writes"
    ),
    oracle="""
    WITH snap AS (
      SELECT DISTINCT
             user_id + CASE WHEN user_id % 9 = 0 THEN 1000 ELSE 0 END AS user_id,
             'init' AS status, CAST(0 AS BIGINT) AS value_cents
      FROM events WHERE user_id < 100
    ),
    latest AS (
      SELECT user_id, op, status, value_cents FROM (
        SELECT user_id,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D' ELSE 'U' END AS op,
               event_type AS status,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT user_id, status, value_cents FROM snap
    WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, status, value_cents FROM latest WHERE op IN ('I', 'U')
    """,
)
def q393_versioned_cdc_rollforward(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X323 — INCREMENTAL VERSIONED ROLL-FORWARD: the nightly lakehouse
    loop state_v(n+1) = apply_cdc(read_version(n), batch_n) →
    write_versioned, run for an initial snapshot plus two time-ordered
    CDC batches (month split at day 15), returning the latest version.
    Composes q113's changelog replay with q387's versioned store: the
    oracle replays the WHOLE changelog in one pass, so a hash match
    proves that incremental per-batch merges committed through the
    manifest-CAS store compose to exactly the full-replay state
    (latest-wins over time-ordered batches is associative) — the
    property that makes incremental nightly merges + time-travel
    rollback SAFE to run instead of monthly recomputes.

    Scale: each batch collapses map-side to one row per changed key
    before its merge shuffle; version writes are |users|-sized. At
    100 TB this is the difference between touching |changed| rows
    nightly and |table| rows monthly, with every intermediate state
    pinned for rollback."""
    import tempfile

    from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc
    from noaa_ais_glue_lakehouse_spark.sources.writers import (
        read_version,
        write_versioned,
    )

    ev = load(spark, sf_dir, "events")
    snap = (
        ev.filter(F.col("user_id") < 100)
        .select(
            (
                F.col("user_id")
                + F.when(F.col("user_id") % 9 == 0, F.lit(1000)).otherwise(
                    F.lit(0)
                )
            ).alias("user_id")
        )
        .distinct()
        .select(
            "user_id",
            F.lit("init").alias("status"),
            F.lit(0).cast("long").alias("value_cents"),
        )
    )
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    cut = F.lit("2024-01-15").cast("date")
    table = tempfile.mkdtemp(prefix="q393_versions_")
    write_versioned(snap, table)
    for batch in (
        changes.filter(F.to_date("ts") < cut),
        changes.filter(F.to_date("ts") >= cut),
    ):
        state = apply_cdc(
            read_version(spark, table),
            batch,
            ["user_id"],
            ["ts", "event_id"],
            "op",
        )
        write_versioned(state, table)
    return read_version(spark, table)


# --- q394: portable product quantization (codebook + identical-text exprs) --

_PQ_M, _PQ_K, _PQ_D = 8, 8, 8  # subspaces × centroids/subspace × dims/subspace


def _pq_codebook() -> list:
    """Deterministic public PQ codebook, c[s][k][d] ∈ [-1.00, 1.00] with
    two decimals from md5 of the coordinate — the q384 portable-planes
    move applied to product quantization: both engines parse the SAME
    decimal literals, so assignments and reconstruction errors are
    bit-identical."""
    import hashlib

    return [
        [
            [
                round(
                    (hashlib.md5(f"pq:{s}:{k}:{d}".encode()).digest()[0] % 201 - 100)
                    / 100.0,
                    2,
                )
                for d in range(_PQ_D)
            ]
            for k in range(_PQ_K)
        ]
        for s in range(_PQ_M)
    ]


def _pq_exprs(vec_sql: str) -> tuple[list, list, list]:
    """(dist_aliases, code_exprs, mindist_exprs) — textual SQL fragments
    shared VERBATIM by the Spark plan (F.expr) and the DuckDB oracle.
    ``vec_sql(i)`` must be the 1-based element access for each engine's
    array syntax; argmin ties break to the lowest centroid index via the
    strict < comparison chain (first minimum wins)."""
    cb = _pq_codebook()
    dist_aliases = []
    code_exprs = []
    mindist_exprs = []
    for s in range(_PQ_M):
        names = []
        for k in range(_PQ_K):
            terms = " + ".join(
                f"({vec_sql.format(i=s * _PQ_D + d + 1)} - ({cb[s][k][d]}))"
                f" * ({vec_sql.format(i=s * _PQ_D + d + 1)} - ({cb[s][k][d]}))"
                for d in range(_PQ_D)
            )
            names.append(f"_pqd{s}_{k}")
            dist_aliases.append((f"_pqd{s}_{k}", terms))
        def _rest_min(rest: list) -> str:
            return rest[0] if len(rest) == 1 else f"LEAST({', '.join(rest)})"

        cases = " ".join(
            f"WHEN {names[k]} <= {_rest_min(names[k+1:])} THEN {k}"
            for k in range(_PQ_K - 1)
        )
        code_exprs.append(f"CASE {cases} ELSE {_PQ_K - 1} END")
        mindist_exprs.append(f"LEAST({', '.join(names)})")
    return dist_aliases, code_exprs, mindist_exprs


def _pq_oracle() -> str:
    dists, codes, mins = _pq_exprs("CAST(embedding[{i}] AS DOUBLE)")
    dist_sql = ",\n             ".join(f"{t} AS {n}" for n, t in dists)
    code_sql = " || ".join(f"CAST(({c}) AS VARCHAR)" for c in codes)
    err_sql = " + ".join(mins)
    return f"""
    WITH d AS (
      SELECT vec_id,
             {dist_sql}
      FROM embeddings
    )
    SELECT vec_id,
           {code_sql} AS pq_code,
           CAST(FLOOR(({err_sql}) * 1000000) AS BIGINT) AS recon_err_e6
    FROM d
    """


@register("q394_product_quantization_portable", oracle=_pq_oracle())
def q394_product_quantization_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X324 — PORTABLE PRODUCT QUANTIZATION (Jégou et al. 2011): each
    64-dim embedding compressed to 8 sub-codes (8 subspaces × 8
    centroids → 3 bits each, 24 bits/vector vs 2048) by per-subspace
    nearest-centroid assignment, with the exact reconstruction error
    (sum of squared distances to the chosen centroids) emitted in
    integer micro-units. PQ is THE memory layout behind IVF-ADC ANN
    serving (q55's list-probing + PQ codes = FAISS IVFADC); this gives
    the engine the code-assignment kernel as a hash-checked relational
    operator. The codebook is the q384 portable-family move: md5-derived
    two-decimal literals both engines parse identically; distances are
    fixed-order sums, argmin ties break to the lowest index via an
    identical-text CASE/LEAST chain (k-means-trained codebooks swap in
    without changing the plan — q318 trains them).

    Scale: pure row-local projection — zero shuffles, zero joins; 64
    distance expressions per row inside whole-stage codegen. At 100 TB
    the quantization pass is scan-bound, exactly what a compression
    kernel should be."""
    emb = load(spark, sf_dir, "embeddings")
    dists, codes, mins = _pq_exprs("CAST(element_at(embedding, {i}) AS DOUBLE)")
    d = emb.select(
        "vec_id", *[F.expr(t).alias(n) for n, t in dists]
    )
    code_col = F.concat(
        *[F.expr(c).cast("string") for c in codes]
    )
    err_col = F.expr(" + ".join(mins))
    return d.select(
        "vec_id",
        code_col.alias("pq_code"),
        F.floor(err_col * 1000000).cast("long").alias("recon_err_e6"),
    )


@register(
    "q395_span_corruption",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
      ), LATERAL (
        SELECT UNNEST(tk) AS tok,
               UNNEST(range(0, len(tk))) AS pos
      ) t
    ), flagged AS (
      SELECT doc_id, tok, pos,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':'
                  || CAST(pos AS VARCHAR)), 1, 2)) AS BIGINT) < 38 AS masked
      FROM toks
    ), m AS (
      SELECT doc_id, tok, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS grp
      FROM flagged WHERE masked
    ), spans AS (
      SELECT doc_id, tok, pos, grp,
             DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY grp) - 1
               AS span_id,
             MIN(pos) OVER (PARTITION BY doc_id, grp) AS span_start
      FROM m
    ), corrupted_pieces AS (
      SELECT doc_id, pos, tok AS piece
      FROM flagged WHERE NOT masked
      UNION ALL
      SELECT doc_id, pos,
             '<X' || CAST(span_id AS VARCHAR) || '>' AS piece
      FROM spans WHERE pos = span_start
    ), target_pieces AS (
      SELECT doc_id, pos,
             CASE WHEN pos = span_start
                  THEN '<X' || CAST(span_id AS VARCHAR) || '> ' || tok
                  ELSE tok END AS piece
      FROM spans
    ), c AS (
      SELECT doc_id, md5(string_agg(piece, ' ' ORDER BY pos))
               AS corrupted_md5
      FROM corrupted_pieces GROUP BY doc_id
    ), t2 AS (
      SELECT doc_id,
             md5(string_agg(piece, ' ' ORDER BY pos)) AS targets_md5,
             CAST(COUNT(*) AS BIGINT) AS n_masked,
             CAST(COUNT(DISTINCT span_start) AS BIGINT) AS n_spans
      FROM target_pieces
      JOIN spans USING (doc_id, pos)
      GROUP BY doc_id
    )
    SELECT c.doc_id, c.corrupted_md5, t2.targets_md5, t2.n_spans,
           t2.n_masked
    FROM c JOIN t2 USING (doc_id)
    """,
)
def q395_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X325 — T5-STYLE SPAN CORRUPTION (Raffel et al. 2020 §3.1.4): the
    denoising-pretraining transform — ~15% of token positions masked by
    a DETERMINISTIC public hash (first md5 byte of doc_id:pos < 38),
    adjacent masked positions merged into numbered sentinel spans, the
    corrupted input keeping <Xn> where each span was and the target
    sequence carrying <Xn> + the removed tokens. Seeded-by-hash means
    the augmentation is reproducible across reruns AND engines — both
    sides build byte-identical corrupted/target strings (compared by
    md5), the property that makes augmented corpora cacheable and
    auditable instead of RNG-dependent. Docs with no masked position
    drop out (inner join), matching the trainer convention of skipping
    unmasked examples.

    Plan: posexplode → hash flag → gaps-and-islands (pos − rank) for
    span merge → two ordered reassemblies via array_sort(collect_list)
    (DuckDB mirrors with ORDER BY string_agg). One shuffle on doc_id
    feeds every window; reassembly reuses the same clustering.

    Scale: everything is per-document; the shuffle carries (doc, pos,
    token) — linear in corpus tokens, the same transport as the gram
    family with `_spread` available for single-split corpora."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    )
    flagged = toks.select(
        "doc_id",
        "tok",
        F.col("pos").cast("long").alias("pos"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("doc_id").cast("string"),
                            F.col("pos").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            < 38
        ).alias("masked"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    m = flagged.filter("masked").withColumn(
        "grp", F.col("pos") - F.row_number().over(wdoc)
    )
    spans = m.select(
        "doc_id",
        "tok",
        "pos",
        (
            F.dense_rank().over(Window.partitionBy("doc_id").orderBy("grp"))
            - 1
        ).alias("span_id"),
        F.min("pos")
        .over(Window.partitionBy("doc_id", "grp"))
        .alias("span_start"),
    )
    corrupted_pieces = flagged.filter(~F.col("masked")).select(
        "doc_id", "pos", F.col("tok").alias("piece")
    ).unionByName(
        spans.filter(F.col("pos") == F.col("span_start")).select(
            "doc_id",
            "pos",
            F.concat(
                F.lit("<X"), F.col("span_id").cast("string"), F.lit(">")
            ).alias("piece"),
        )
    )
    target_pieces = spans.select(
        "doc_id",
        "pos",
        "span_start",
        F.when(
            F.col("pos") == F.col("span_start"),
            F.concat(
                F.lit("<X"),
                F.col("span_id").cast("string"),
                F.lit("> "),
                F.col("tok"),
            ),
        )
        .otherwise(F.col("tok"))
        .alias("piece"),
    )

    def _joined(df):
        return F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "piece"))
                    ),
                    lambda s: s.piece,
                ),
                " ",
            )
        )

    c = corrupted_pieces.groupBy("doc_id").agg(
        _joined(None).alias("corrupted_md5")
    )
    t2 = target_pieces.groupBy("doc_id").agg(
        _joined(None).alias("targets_md5"),
        F.count(F.lit(1)).cast("long").alias("n_masked"),
        F.countDistinct("span_start").cast("long").alias("n_spans"),
    )
    return c.join(t2, "doc_id").select(
        "doc_id", "corrupted_md5", "targets_md5", "n_spans", "n_masked"
    )


@register(
    "q396_kneser_ney_logprob",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join: attaching the "
        "distinct-bigram-count scalar for the continuation term (same "
        "shape as q347's vocabulary scalar)"
    ),
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), nz AS (
      SELECT doc_id, tk FROM toks WHERE len(tk) > 0
    ), big AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk) + 1),
               i -> struct_pack(
                 p := CASE WHEN i = 1 THEN '<s>' ELSE tk[i - 1] END,
                 c := tk[i]))) AS pc
      FROM nz
    ), b AS (
      SELECT doc_id, pc.p AS p, pc.c AS c FROM big
    ), mb AS (
      SELECT p, c, COUNT(*) AS cb FROM b GROUP BY p, c
    ), mp AS (
      SELECT p, SUM(cb) AS cp, COUNT(*) AS fanout FROM mb GROUP BY p
    ), cont AS (
      SELECT c, COUNT(*) AS n_left FROM mb GROUP BY c
    ), tot AS (
      SELECT COUNT(*) AS n_bigram_types FROM mb
    ), scored AS (
      SELECT b.doc_id, COUNT(*) AS n_tokens,
             SUM(ln((mb.cb - 0.75) / mp.cp
                    + (0.75 * mp.fanout / mp.cp)
                      * (CAST(cont.n_left AS DOUBLE) / tot.n_bigram_types)))
               AS lp
      FROM b
      JOIN mb USING (p, c) JOIN mp USING (p) JOIN cont USING (c)
      CROSS JOIN tot
      GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_kn_logprob
    FROM scored
    """,
)
def q396_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X326 — interpolated KNESER-NEY bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1998 eq. 4.3) — the differentiated twin of q347's
    add-one model (its docstring is this one's anchor): instead of
    uniform +1 smoothing, absolute discounting D=0.75 with the mass
    redistributed by CONTINUATION probability — how many distinct
    contexts a word follows (n_left/|bigram types|), the correction
    that stops frequent-but-context-locked words ("francisco") from
    stealing probability. This is the actual KenLM default smoother,
    i.e. what a quality-filter LM scores with in production pipelines.

    Every count (cb, cp, fanout = N1+(p·), n_left = N1+(·c),
    |bigram types|) is an exact int64 relational aggregate; the model
    is self-fit so every scored bigram has cb ≥ 1 and the discounted
    term stays positive (cb − 0.75 > 0) — no backoff branch needed.
    Per-doc mean log-prob follows q347's rounding convention.

    Plan: identical transport to q347 — row-local bigram construction,
    hash-agg model on (p, c), the context/continuation rollups derive
    from the (p, c) model relation (bounded by |bigram types|, NOT the
    corpus), scoring joins the token stream to the model on (p, c).

    Scale: one corpus-linear shuffle on (p, c) plus model-sized
    rollups; the continuation statistics are free once mb exists."""
    docs = load(spark, sf_dir, "documents")
    nz = docs.select("doc_id", tokenize(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    b = nz.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk")),
                lambda i: F.struct(
                    F.when(i == 1, F.lit("<s>"))
                    .otherwise(F.element_at(F.col("tk"), i - 1))
                    .alias("p"),
                    F.element_at(F.col("tk"), i).alias("c"),
                ),
            )
        ).alias("pc"),
    ).select("doc_id", F.col("pc.p").alias("p"), F.col("pc.c").alias("c"))
    mb = b.groupBy("p", "c").agg(F.count(F.lit(1)).alias("cb"))
    mp = mb.groupBy("p").agg(
        F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("fanout")
    )
    cont = mb.groupBy("c").agg(F.count(F.lit(1)).alias("n_left"))
    tot = mb.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    prob = (
        (F.col("cb") - 0.75) / F.col("cp")
        + (0.75 * F.col("fanout") / F.col("cp"))
        * (
            F.col("n_left").cast("double")
            / F.col("n_bigram_types")
        )
    )
    scored = (
        b.join(mb, ["p", "c"])
        .join(mp, "p")
        .join(cont, "c")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(prob)).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_kn_logprob"),
    )


def _bfs_oracle(rounds: int = 4) -> str:
    """Bounded-hop BFS oracle over the winnowing dup graph — chained
    CTEs (the _cc_oracle move), one relaxation per hop: dist' =
    min(dist, 1 + min over in-neighbors' dist). Exact for nodes within
    ``rounds`` hops of a seed; farther nodes are absent BY CONTRACT on
    both engines, so the row-count gate catches a short engine loop."""
    ctes = [
        f"p AS MATERIALIZED ({_WINNOW_PAIRS_SQL})",
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p"
        " UNION ALL SELECT id_b, id_a FROM p)",
        "d0 AS (SELECT DISTINCT src AS node, 0 AS hop FROM edges"
        " WHERE src % 50 = 0)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""d{k} AS (
      SELECT node, MIN(hop) AS hop FROM (
        SELECT node, hop FROM d{k - 1}
        UNION ALL
        SELECT e.dst AS node, d.hop + 1 AS hop
        FROM d{k - 1} d JOIN edges e ON e.src = d.node
      ) GROUP BY node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS doc_id, CAST(hop AS BIGINT) AS hop
    FROM d{rounds}"""
    )


@register(
    "q397_bfs_hops",
    build_time_exec=(
        "driver-side work at plan-build time; plan pinned by its own "
        "recall/oracle tests (winnowing pair generation, q62's input)"
    ),
    oracle=_bfs_oracle(4),
)
def q397_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X327 — bounded-hop BFS DISTANCES from a seed set over the dup
    graph: how many hops each document sits from a seed (doc_id % 50
    == 0 among graph nodes), capped at 4 hops. Complements the
    component family (q62 tells you WHICH group; this tells you HOW
    FAR — the contamination-propagation question "is this doc within k
    near-dup hops of a benchmark/blocklisted doc?" that transitive
    blocklists and leakage audits ask). Fixed-iteration relational BFS:
    each round is union + min-rollup (the q179 pagerank shape), so the
    4-round plan is Catalyst-composed with no driver convergence loop;
    the oracle runs the identical relaxation as chained CTEs.

    Scale: each round shuffles (node, hop) — frontier-sized, bounded by
    |graph nodes|, with map-side min-combine; the edge relation is the
    winnowing pair stream (q61's exact contract; swap q343's df-capped
    pairs for the production path at corpus scale)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = winnow_near_duplicates(
        docs, "doc_id", "text", 8, 4, min_shared=10
    ).select("id_a", "id_b")
    edges = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    dist = (
        edges.select("src")
        .distinct()
        .filter(F.col("src") % 50 == 0)
        .select(F.col("src").alias("node"), F.lit(0).alias("hop"))
    )
    for _ in range(4):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("hop") + 1).alias("hop"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
        )
    return dist.select(
        F.col("node").alias("doc_id"), F.col("hop").cast("long").alias("hop")
    )


@register(
    "q398_randomized_response",
    oracle="""
    WITH rr AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
             CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                  AS BIGINT) AS h1,
             CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 3, 2))
                  AS BIGINT) % 2 AS coin
      FROM events
    ), reported AS (
      SELECT day, truth,
             CASE WHEN h1 < 64 THEN coin ELSE truth END AS reported
      FROM rr
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(reported) AS BIGINT) AS n_reported,
           ROUND((CAST(SUM(reported) AS DOUBLE) / COUNT(*) - 0.25 * 0.5)
                 / 0.75, 6) AS pi_hat,
           ROUND(CAST(SUM(truth) AS DOUBLE) / COUNT(*), 6) AS pi_true
    FROM reported
    GROUP BY day
    """,
)
def q398_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X328 — RANDOMIZED RESPONSE (Warner 1965) local-DP telemetry: each
    event reports its sensitive bit truthfully with probability 1−f and
    a fair coin with probability f=0.25 (ε = ln((1−f/2)/(f/2)) ≈ 1.95
    local DP), then the per-day rate is DEBIASED by the closed form
    π̂ = (obs − f/2)/(1−f) — the aggregate-utility-from-private-reports
    pattern (RAPPOR's core mechanism). Complements the central-DP
    Laplace release (q196): there noise is added at the aggregator;
    here each ROW is privatized before collection. The flip decisions
    are hash-seeded (md5 bytes of event_id), so the "randomization" is
    reproducible across engines and the debiased estimate itself is
    hash-checked against the true rate emitted alongside.

    Scale: row-local projection + one day-grained aggregate; nothing
    but counts crosses the shuffle."""
    ev = load(spark, sf_dir, "events")
    md = F.md5(F.col("event_id").cast("string"))
    rr = ev.select(
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "truth"
        ),
        F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("h1"),
        (F.conv(F.substring(md, 3, 2), 16, 10).cast("long") % 2).alias(
            "coin"
        ),
    )
    reported = rr.select(
        "day",
        "truth",
        F.when(F.col("h1") < 64, F.col("coin"))
        .otherwise(F.col("truth"))
        .alias("reported"),
    )
    return reported.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("reported").cast("long").alias("n_reported"),
        F.round(
            (F.sum("reported").cast("double") / F.count(F.lit(1)) - 0.25 * 0.5)
            / 0.75,
            6,
        ).alias("pi_hat"),
        F.round(F.sum("truth").cast("double") / F.count(F.lit(1)), 6).alias(
            "pi_true"
        ),
    )


def _minhash_contamination_oracle(
    threshold: float = 0.5, num_hashes: int = 32, bands: int = 8,
    bench_mod: int = 37,
) -> str:
    """Asymmetric mirror of _minhash_portable_oracle: identical shingle
    hashes, slot family and per-band equality, but candidates come from
    the corpus×benchmark join (bench = doc_id % bench_mod = 0) and the
    output aggregates per contaminated corpus doc."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        minhash_portable_slot_consts,
    )

    p = 2147483647
    r = num_hashes // bands
    consts = minhash_portable_slot_consts(num_hashes)
    sig_cols = ",\n             ".join(
        f"MIN((hp * {a} + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_eq = " OR\n        ".join(
        "("
        + " AND ".join(f"a.h{bi * r + j} = b.h{bi * r + j}" for j in range(r))
        + ")"
        for bi in range(bands)
    )
    t10 = int(threshold * 10)
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS tk
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h60
      FROM (SELECT doc_id, UNNEST(tk) AS tok FROM toks)
    ), hp AS (
      SELECT doc_id, h60, h60 % {p} AS hp FROM sh
    ), sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM hp GROUP BY doc_id
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.doc_id % {bench_mod} <> 0 AND b.doc_id % {bench_mod} = 0 AND (
        {band_eq})
    ), sized AS (
      SELECT c.id_a, c.id_b, sa.n AS na, sb.n AS nb
      FROM cand c
      JOIN sz sa ON sa.doc_id = c.id_a
      JOIN sz sb ON sb.doc_id = c.id_b
      WHERE LEAST(sa.n, sb.n) * 10 >= GREATEST(sa.n, sb.n) * {t10}
    ), inter AS (
      SELECT s.id_a, s.id_b, s.na, s.nb, COUNT(*) AS i
      FROM sized s
      JOIN sh a ON a.doc_id = s.id_a
      JOIN sh b ON b.doc_id = s.id_b AND b.h60 = a.h60
      GROUP BY s.id_a, s.id_b, s.na, s.nb
    ), verified AS (
      SELECT id_a, id_b,
             ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) AS j
      FROM inter
      WHERE ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) >= {threshold}
    )
    SELECT id_a AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
           MAX(j) AS max_jaccard
    FROM verified GROUP BY id_a
    """


@register(
    "q399_fuzzy_decontamination",
    oracle=_minhash_contamination_oracle(),
)
def q399_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X329 — FUZZY benchmark decontamination via asymmetric portable
    minhash-LSH: corpus docs within Jaccard 0.5 of ANY held-out
    benchmark doc (doc_id % 37 here), with match count and max
    similarity per flagged doc. The paraphrase-robust complement of the
    exact 8-gram screens — q83/q247 catch verbatim spans, but a lightly
    reworded eval item shares few 8-grams while keeping high
    token-Jaccard (the contamination mode GPT-3's Appendix C and the
    Llama decontamination notes both flag); near-dup-level screens are
    what serious pipelines run IN ADDITION to exact ones. Every stage —
    shingle hashes, slot family, banding, candidate set, exact
    set-Jaccard verify — is the q383 portable family, so the whole
    asymmetric pipeline is hash-checked.

    Scale: the benchmark side is eval-suite-sized → its banded
    signatures BROADCAST and the corpus never shuffles for candidate
    generation (q83's asymmetry argument applied to LSH); the verify is
    |candidates|-bounded. operators/dedup.py
    minhash_contamination_portable."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        minhash_contamination_portable,
    )

    docs = load(spark, sf_dir, "documents")
    return minhash_contamination_portable(
        docs, "doc_id", "text", F.col("doc_id") % 37 == 0, threshold=0.5
    )


def _ivf_adc_bucket_expr(elem: str, n_planes: int = 6, dim: int = 64) -> str:
    """Coarse-quantizer bucket as IDENTICAL text for both engines: bit j
    = (explicit left-to-right ±1 dot of plane j with the vector) >= 0,
    packed into an integer. Planes are q384's portable Rademacher
    family (table 0)."""
    from noaa_ais_glue_lakehouse_spark.operators.similarity import (
        portable_hyperplane_signs,
    )

    signs = portable_hyperplane_signs(1, n_planes, dim)[0]
    bits = []
    for j in range(n_planes):
        dot = " + ".join(
            f"{elem.format(i=d + 1)} * ({float(signs[j][d])})"
            for d in range(dim)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def _ivf_adc_dist_expr(elem: str) -> str:
    """Subspace squared distance (vector slice vs codebook row columns
    c1..c8) as identical text; `s` and `c1..c8` are relation columns."""
    return " + ".join(
        f"({elem.format(i=f'(s * 8 + {d + 1})')} - c{d + 1})"
        f" * ({elem.format(i=f'(s * 8 + {d + 1})')} - c{d + 1})"
        for d in range(8)
    )


def _ivf_adc_codebook_values() -> str:
    """The q394 PQ codebook as a VALUES relation (s, k, c1..c8)."""
    cb = _pq_codebook()
    rows = ", ".join(
        f"({s}, {k}, {', '.join(str(v) for v in cb[s][k])})"
        for s in range(_PQ_M)
        for k in range(_PQ_K)
    )
    return rows


def _ivf_adc_oracle(query_mod: int = 17, topk: int = 10) -> str:
    bucket = _ivf_adc_bucket_expr("CAST(embedding[{i}] AS DOUBLE)")
    dist = _ivf_adc_dist_expr("CAST(e.embedding[{i}] AS DOUBLE)")
    return f"""
    WITH cb (s, k, c1, c2, c3, c4, c5, c6, c7, c8) AS (
      VALUES {_ivf_adc_codebook_values()}
    ), v AS (
      SELECT vec_id, embedding, {bucket} AS bkt FROM embeddings
    ), pd AS (
      SELECT e.vec_id, cb.s, cb.k, {dist} AS d2
      FROM v e CROSS JOIN cb
    ), codes AS (
      SELECT vec_id, s, k FROM (
        SELECT vec_id, s, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, k) AS rn
        FROM pd
      ) WHERE rn = 1
    ), lut AS (
      SELECT vec_id AS q_id, s, k,
             CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_e6
      FROM pd WHERE vec_id % {query_mod} = 0
    ), cand AS (
      SELECT q.vec_id AS q_id, x.vec_id AS x_id
      FROM v q JOIN v x ON x.bkt = q.bkt AND x.vec_id <> q.vec_id
      WHERE q.vec_id % {query_mod} = 0
    ), adc AS (
      SELECT c.q_id, c.x_id, SUM(l.d2_e6) AS adc_e6
      FROM cand c
      JOIN codes cd ON cd.vec_id = c.x_id
      JOIN lut l ON l.q_id = c.q_id AND l.s = cd.s AND l.k = cd.k
      GROUP BY c.q_id, c.x_id
    )
    SELECT q_id, x_id, CAST(adc_e6 AS BIGINT) AS adc_e6,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT q_id, x_id, adc_e6,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY adc_e6, x_id) AS rnk
      FROM adc
    ) WHERE rnk <= {topk}
    """


@register(
    "q400_ivf_adc_portable",
    allow_non_equi=(
        "deliberate bounded cross join of vectors with the 64-row "
        "broadcast PQ codebook relation (per-subspace distance "
        "evaluation) - group-cardinality, never row-level"
    ),
    oracle=_ivf_adc_oracle(),
)
def q400_ivf_adc_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X330 — the FULL ANN SERVING STACK, hash-checked end to end:
    IVF-ADC (FAISS's IVFADC layout, Jégou et al. 2011) with a portable
    coarse quantizer (q384's Rademacher hyperplanes → 64 inverted
    lists) over PQ-compressed base vectors (q394's codebook), queried
    by ASYMMETRIC DISTANCE COMPUTATION: each query precomputes its
    8×8 subspace-distance LUT once, then every candidate's distance is
    8 integer LUT lookups summed — never touching the base vectors.
    Top-10 per query by (ADC, id). Composes the round's portable
    anchors into the actual serving topology: coarse bucketing bounds
    candidates (probed-list-sized), PQ codes shrink the index 85×, the
    LUT join replaces all float math at query time. LUT entries are
    floored to integer micro-units BEFORE summation so the ADC total is
    order-free on both engines.

    Plan: codebook (64 rows) and query LUTs broadcast; the base-side
    code assignment is one broadcast-join + min-struct rollup (shuffle
    on (vec, s), map-side combinable); candidates come from the
    bucket equi-join; the ADC join touches |candidates|×8 rows.

    Scale: at corpus size the coarse quantizer grows like q344
    (planes ~ log2 n → lists ~ n, candidates/query bounded); the ADC
    path is the memory-bound layout real serving uses — this query is
    the correctness anchor for it (q55's IVF is the measured scale
    probe)."""
    from pyspark.sql import Row

    emb = load(spark, sf_dir, "embeddings")
    cb_rows = [
        Row(s=s, k=k, **{f"c{d+1}": float(v) for d, v in enumerate(_pq_codebook()[s][k])})
        for s in range(_PQ_M)
        for k in range(_PQ_K)
    ]
    cb = spark.createDataFrame(cb_rows)
    bucket = F.expr(
        _ivf_adc_bucket_expr("CAST(element_at(embedding, {i}) AS DOUBLE)")
    )
    v = emb.select("vec_id", "embedding", bucket.alias("bkt"))
    dist = F.expr(
        _ivf_adc_dist_expr(
            "CAST(element_at(e.embedding, CAST({i} AS INT)) AS DOUBLE)"
        )
    )
    pd = v.alias("e").crossJoin(F.broadcast(cb)).select(
        F.col("e.vec_id").alias("vec_id"), "s", "k", dist.alias("d2")
    )
    codes = (
        pd.groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "k")).alias("m"))
        .select("vec_id", "s", F.col("m.k").alias("k"))
    )
    lut = pd.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("q_id"),
        "s",
        "k",
        F.floor(F.col("d2") * 1000000).cast("long").alias("d2_e6"),
    )
    q = v.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("bkt")
    )
    cand = q.join(
        v.select(F.col("vec_id").alias("x_id"), "bkt"), "bkt"
    ).filter(F.col("x_id") != F.col("q_id")).select("q_id", "x_id")
    adc = (
        cand.join(
            codes.select(F.col("vec_id").alias("x_id"), "s", "k"), "x_id"
        )
        .join(F.broadcast(lut), ["q_id", "s", "k"])
        .groupBy("q_id", "x_id")
        .agg(F.sum("d2_e6").alias("adc_e6"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_e6", "x_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "q_id",
            "x_id",
            F.col("adc_e6").cast("long").alias("adc_e6"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def _pq_code_oracle_cte() -> str:
    """Shared oracle CTE: per-vector per-subspace PQ code assignment
    (q394's construction, reused by the audit queries)."""
    dists, codes, _ = _pq_exprs("CAST(embedding[{i}] AS DOUBLE)")
    dist_sql = ",\n             ".join(f"{t} AS {n}" for n, t in dists)
    code_rows = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS s, ({codes[s]}) AS k FROM d"
        for s in range(_PQ_M)
    )
    return f"""
    WITH d AS (
      SELECT vec_id,
             {dist_sql}
      FROM embeddings
    ), assign AS (
      {code_rows}
    )"""


@register(
    "q401_pq_codebook_balance",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join attaching the "
        "corpus-size scalar to the per-subspace rollup - "
        "group-cardinality, never row-level"
    ),
    oracle=_pq_code_oracle_cte()
    + """
    , cells AS (
      SELECT s, k, COUNT(*) AS n FROM assign GROUP BY s, k
    ), tot AS (SELECT COUNT(*) AS n_vec FROM embeddings)
    SELECT s,
           CAST(COUNT(*) AS BIGINT) AS n_codes_used,
           CAST(MAX(n) AS BIGINT) AS max_cell,
           ROUND(SUM(CAST(n AS DOUBLE) * n) * 8.0
                 / (CAST(t.n_vec AS DOUBLE) * t.n_vec), 6)
             AS imbalance_factor,
           ROUND(-SUM((CAST(n AS DOUBLE) / t.n_vec)
                      * ln(CAST(n AS DOUBLE) / t.n_vec)) / ln(8.0), 6)
             AS utilization_entropy
    FROM cells CROSS JOIN tot t
    GROUP BY s, t.n_vec
    """,
)
def q401_pq_codebook_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X331 — PQ CODEBOOK-BALANCE AUDIT: per subspace, how evenly the
    corpus spreads over the 8 codes — codes used, largest cell, the
    FAISS imbalance factor K·Σp² (1.0 = perfectly balanced, K = one
    cell holds everything; quantizer-health metric served alongside
    every FAISS index), and normalized utilization entropy. A skewed
    subspace means its codebook wastes bits and ADC (q400) loses
    resolution — this is the audit that tells you to retrain the
    codebook (q318's k-means) on your corpus instead of shipping the
    default. Assignment is q394's identical-text construction, so the
    audit itself is hash-checked.

    Scale: row-local assignment → one ≤64-cell rollup; the corpus is
    touched once with zero joins on the big side."""
    emb = load(spark, sf_dir, "embeddings")
    dists, codes, _ = _pq_exprs(
        "CAST(element_at(embedding, CAST({i} AS INT)) AS DOUBLE)"
    )
    d = emb.select("vec_id", *[F.expr(t).alias(n) for n, t in dists])
    assign = None
    for s in range(_PQ_M):
        part = d.select(
            "vec_id", F.lit(s).alias("s"), F.expr(codes[s]).alias("k")
        )
        assign = part if assign is None else assign.unionByName(part)
    cells = assign.groupBy("s", "k").agg(F.count(F.lit(1)).alias("n"))
    tot = emb.agg(F.count(F.lit(1)).alias("n_vec"))
    p = F.col("n").cast("double") / F.col("n_vec")
    return (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("s", "n_vec")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_codes_used"),
            F.max("n").cast("long").alias("max_cell"),
            F.round(
                F.sum(F.col("n").cast("double") * F.col("n"))
                * 8.0
                / (F.col("n_vec").cast("double") * F.col("n_vec")),
                6,
            ).alias("imbalance_factor"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.lit(8.0)), 6
            ).alias("utilization_entropy"),
        )
        .select(
            "s",
            "n_codes_used",
            "max_cell",
            "imbalance_factor",
            "utilization_entropy",
        )
    )


# Poisson(1) CDF thresholds as shared literals (identical text in both
# engines): weight w = first k with u < F(k), else 8.
_POIS1_CDF = (
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
    "0.9999167588507119", "0.9999897508637437",
)


def _pois_weight_expr(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {f} THEN {k}" for k, f in enumerate(_POIS1_CDF)
    )
    return f"CASE {cases} ELSE 8 END"


@register(
    "q402_poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
             r.r AS r,
             {_pois_weight_expr(
                 "CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)"
                 " || ':' || CAST(r.r AS VARCHAR)), 1, 8)) AS BIGINT)"
                 " / 4294967296.0")} AS w
      FROM events
      CROSS JOIN (SELECT UNNEST(range(0, 8)) AS r) r
    ), rep_means AS (
      SELECT day, r,
             CAST(ROUND(CAST(SUM(w * v_cents) AS DOUBLE) / SUM(w))
                  AS BIGINT) AS m_c
      FROM reps GROUP BY day, r HAVING SUM(w) > 0
    ), boot AS (
      SELECT day, COUNT(*) AS nr, SUM(m_c) AS s1, SUM(m_c * m_c) AS s2
      FROM rep_means GROUP BY day
    ), pt AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sv
      FROM events GROUP BY day
    )
    SELECT p.day, CAST(p.n AS BIGINT) AS n,
           ROUND(CAST(p.sv AS DOUBLE) / p.n, 6) AS mean_cents,
           ROUND(sqrt(CAST(b.nr * b.s2 - b.s1 * b.s1 AS DOUBLE)
                      / (b.nr * (b.nr - 1.0)) / b.nr) * 2.0, 6)
             AS ci_halfwidth_cents
    FROM pt p JOIN boot b USING (day)
    """,
)
def q402_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X332 — POISSON BOOTSTRAP confidence intervals (the
    streaming/distributed bootstrap: each row enters replica r with a
    Poisson(1) weight, so resampling never needs n or a shuffle —
    Chamandy et al. 2012, the standard production bootstrap at scale):
    per-day mean value with a ±2·SE(bootstrap) half-width from 8
    replicas. Weights are hash-seeded (md5 of event_id:replica mapped
    through the Poisson(1) inverse CDF as shared literals), so the
    "resampling" is reproducible across engines and the CI itself is
    hash-checked — the q66/q191 determinism move applied to uncertainty
    quantification. Replica means round to integer cents BEFORE the
    across-replica variance, which then computes from exact int64
    moments (n·s2 − s1², one double division) — order-free.

    Scale: the ×8 replica explode is row-local; per-(day, replica)
    sums are map-side combinable; nothing but 8 rows/day crosses the
    final stage. The same plan gives CIs for ANY weighted aggregate."""
    ev = load(spark, sf_dir, "events")
    u = (
        "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), ':',"
        " CAST(r AS STRING))), 1, 8), 16, 10) AS BIGINT) / 4294967296.0"
    )
    reps = (
        ev.select(
            F.to_date("ts").alias("day"),
            cents(F.col("value")).alias("v_cents"),
            "event_id",
        )
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(7))))
        .withColumn("w", F.expr(_pois_weight_expr(u)))
    )
    rep_means = (
        reps.groupBy("day", "r")
        .agg(
            F.sum(F.col("w") * F.col("v_cents")).alias("swv"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "day",
            F.round(F.col("swv").cast("double") / F.col("sw"))
            .cast("long")
            .alias("m_c"),
        )
    )
    boot = rep_means.groupBy("day").agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum("m_c").alias("s1"),
        F.sum(F.col("m_c") * F.col("m_c")).alias("s2"),
    )
    pt = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("sv"),
    )
    var_det = (
        (F.col("nr") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
        / (F.col("nr") * (F.col("nr") - F.lit(1.0)))
        / F.col("nr")
    )
    return pt.join(boot, "day").select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sv").cast("double") / F.col("n"), 6).alias(
            "mean_cents"
        ),
        F.round(F.sqrt(var_det) * 2.0, 6).alias("ci_halfwidth_cents"),
    )


@register(
    "q403_path_regex_screen",
    oracle="""
    WITH paths AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(SUM(CASE WHEN regexp_matches(path, '^v+c+p+$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pure_funnel,
           CAST(SUM(CASE WHEN regexp_matches(path, 'v.*c.*p')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_contains_funnel,
           CAST(SUM(CASE WHEN regexp_matches(path, 'e(e|.e)')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_error_bursts,
           CAST(MAX(length(path)) AS BIGINT) AS max_path_len
    FROM paths GROUP BY day
    """,
)
def q403_path_regex_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X333 — PATH-REGEX event screening (MATCH_RECOGNIZE-lite / CEP):
    each user-day's ordered event sequence collapses to an initials
    string ('vvcp…'), and behavioral patterns become plain regexes —
    the pure browse→click→buy funnel (full-match ^v+c+p+$), funnel
    containment (v.*c.*p), and error bursts (two errors at distance
    ≤2: e(e|.e)). Spark has no MATCH_RECOGNIZE; this is the idiomatic
    relational encoding of per-entity sequence patterns (q186's array
    fold generalized from a fixed step list to arbitrary regular
    expressions), with a per-day rollup. Both engines apply the same
    RE2-compatible patterns to byte-identical strings, so the CEP
    screen itself is hash-checked.

    Scale: one shuffle on (user, day) builds the path (array_sort over
    collect_list — per-entity sequences are session-sized); the regex
    evaluation is row-local on |entities| rows, and the rollup is
    day-grained. Paths are bounded by per-user-day event counts; a
    pathological entity would cap via the q24-style sampling guard
    upstream."""
    ev = load(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts",
                                "event_id",
                                F.substring("event_type", 1, 1).alias(
                                    "ini"
                                ),
                            )
                        )
                    ),
                    lambda s: s.ini,
                ),
                "",
            ).alias("path")
        )
    )
    return paths.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.sum(
            F.when(F.col("path").rlike("^v+c+p+$"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_pure_funnel"),
        F.sum(F.when(F.col("path").rlike("v.*c.*p"), 1).otherwise(0))
        .cast("long")
        .alias("n_contains_funnel"),
        F.sum(F.when(F.col("path").rlike("e(e|.e)"), 1).otherwise(0))
        .cast("long")
        .alias("n_error_bursts"),
        F.max(F.length("path")).cast("long").alias("max_path_len"),
    )


@register(
    "q404_stream_stream_full_join",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join: the explicit "
        "outer-completeness cutoff scalar attached to the DRAINED "
        "(batch) result of the stream-stream full-outer join"
    ),
    oracle="""
    WITH p AS (
      SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id AS v_user, ts AS v_ts, event_id AS view_id
      FROM events WHERE event_type IN ('view') AND user_id % 5 = 0
    ), cut AS (
      SELECT MAX(epoch_us(ts)) - 7200000000 AS c FROM events
      WHERE event_type IN ('purchase', 'view')
    ), j AS (
      SELECT p.purchase_id, v.view_id,
             COALESCE(p.p_user, v.v_user) AS user_id, p.p_ts, v.v_ts
      FROM p FULL JOIN v
        ON p.p_user = v.v_user
       AND epoch_us(v.v_ts) <= epoch_us(p.p_ts)
       AND epoch_us(v.v_ts) >= epoch_us(p.p_ts) - 600000000
    )
    SELECT purchase_id, view_id, user_id,
           CASE WHEN purchase_id IS NOT NULL AND view_id IS NOT NULL
                THEN 'both'
                WHEN view_id IS NULL THEN 'purchase_only'
                ELSE 'view_only' END AS match_type
    FROM j, cut
    WHERE (purchase_id IS NOT NULL AND view_id IS NOT NULL)
       OR (view_id IS NULL AND epoch_us(p_ts) <= c)
       OR (purchase_id IS NULL AND epoch_us(v_ts) <= c)
    """,
)
def q404_stream_stream_full_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X334 — STREAM-STREAM FULL OUTER join under the correctness gate,
    completing the streaming outer-join family (inner q96, left-outer
    q272): purchases ⟗ same-user views from the preceding 10 minutes,
    both sides watermarked file streams drained with availableNow. The
    FULL form is the reconciliation shape — "every purchase AND every
    view, matched where possible" — and pins the symmetric contract:
    UNMATCHED rows on EITHER side are emitted only once the join
    watermark passes them, so both tails are held in state at
    end-of-stream. Like q272, both engines apply an EXPLICIT 2h cutoff
    below the max event time instead of reverse-engineering Spark's
    internal watermark: matched rows pass untouched, each side's
    unmatched rows are kept only at-or-below the cutoff. The view side
    is thinned to user_id % 5 so view-only rows exercise real volume
    without drowning the match classes.

    Scale: stream-stream joins shuffle both sides on the key; state is
    bounded by watermark × arrival rate per side — the time-bound
    condition on BOTH sides is what lets Spark evict (without it,
    full-outer state grows unboundedly)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    views = (
        _stream("q404_v_")
        .where((F.col("event_type") == "view") & (F.col("user_id") % 5 == 0))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q404_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    )
    name = f"q404_ssfj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q404_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    cut = (
        spark.read.parquet(path)
        .where(F.col("event_type").isin("purchase", "view"))
        .agg(
            (
                F.max(F.unix_micros(F.col("ts").cast(T.TimestampType())))
                - 7200000000
            ).alias("_cut")
        )
    )
    matched = F.col("purchase_id").isNotNull() & F.col("view_id").isNotNull()
    return (
        drained.crossJoin(F.broadcast(cut))
        .filter(
            matched
            | (
                F.col("view_id").isNull()
                & (F.unix_micros("p_ts") <= F.col("_cut"))
            )
            | (
                F.col("purchase_id").isNull()
                & (F.unix_micros("v_ts") <= F.col("_cut"))
            )
        )
        .select(
            "purchase_id",
            "view_id",
            F.coalesce("p_user", "v_user").alias("user_id"),
            F.when(matched, "both")
            .when(F.col("view_id").isNull(), "purchase_only")
            .otherwise("view_only")
            .alias("match_type"),
        )
    )
