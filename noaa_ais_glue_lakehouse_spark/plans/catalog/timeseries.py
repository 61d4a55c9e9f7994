"""Time-series profiling, gap handling, forecasting and its evaluation.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


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

    Scale shape (round-10 single-pass rewrite, guide §2.4): ONE scan of
    events feeds the per-hour rollup; the span, the grid and the
    forward fill all derive from the HOURLY relation instead of a
    second events scan + grid left-join. Each observed hour row emits
    itself plus every empty hour up to (but excluding) the entity's
    next observed hour via sequence+explode — the union of those spans
    is exactly [first observed hour, last observed hour], so the grid
    is identical to the old spans+join form; the carried value is the
    window forward-fill computed over HOURLY rows (|entities × active
    hours|, far smaller than the exploded grid the old window sorted).
    Before: 2 events scans, 4 Exchanges, SortMergeJoin, grid-sized
    window sort. After: 1 scan, 2 Exchanges (hour rollup, user_id
    window), no join. Grid cardinality is bounded by time-range/step
    per entity, independent of event count — safe at 100 TB where
    events/entity is the thing that explodes, not the calendar."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour_ts")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("hour_ts")
    # forward fill over OBSERVED hours: generated (empty) grid hours
    # inherit their predecessor's fill by construction, because every
    # generated hour is emitted BY its most recent observed hour
    filled = F.last("last_value", ignorenulls=True).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h2 = hourly.select(
        "user_id",
        "hour_ts",
        "n_events",
        filled.alias("_filled"),
        F.lead("hour_ts").over(w_ord).alias("_next"),
    )
    span_end = F.coalesce(
        F.col("_next") - F.expr("INTERVAL 1 HOUR"), F.col("hour_ts")
    )
    g = h2.select(
        "user_id",
        "hour_ts",
        "n_events",
        "_filled",
        F.explode(
            F.sequence(F.col("hour_ts"), span_end, F.expr("INTERVAL 1 HOUR"))
        ).alias("_grid_ts"),
    )
    return g.select(
        "user_id",
        F.date_format("_grid_ts", "yyyy-MM-dd HH:mm").alias("hour"),
        F.when(F.col("_grid_ts") == F.col("hour_ts"), F.col("n_events"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        F.round("_filled", 6).alias("filled_value"),
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
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
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
    SELECT event_type, day, CAST(v AS BIGINT) AS peak_cents,
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
    off = _lit_spine(spark, "start_day", list(range(24)))
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
    "q425_ransac_trend",
    allow_non_equi=(
        "the 32-row hypothesis spine crossJoins the ~30-row day-grain "
        "series for inlier verification (bounded 960-row lattice); raw "
        "events never enter a non-equi join"
    ),
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ), pts AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS x,
             s // n AS y, day
      FROM d
    ), g AS (SELECT CAST(COUNT(*) AS BIGINT) AS g FROM pts),
    hyp AS (
      SELECT u.h AS hid,
             CAST(concat('0x', substr(md5(concat('a', CAST(u.h AS VARCHAR))),
                  1, 13)) AS BIGINT) % g.g AS i1,
             CAST(concat('0x', substr(md5(concat('b', CAST(u.h AS VARCHAR))),
                  1, 13)) AS BIGINT) % (g.g - 1) AS i2r
      FROM UNNEST(generate_series(1, 32)) AS u(h), g
    ), hyp2 AS (
      SELECT hid, i1,
             CASE WHEN i2r >= i1 THEN i2r + 1 ELSE i2r END AS i2
      FROM hyp
    ), lines AS MATERIALIZED (
      SELECT h.hid,
             CAST(p2.y - p1.y AS DOUBLE) / (p2.x - p1.x) AS a,
             CAST(p1.y AS DOUBLE)
               - CAST(p2.y - p1.y AS DOUBLE) / (p2.x - p1.x) * p1.x AS b
      FROM hyp2 h
      JOIN pts p1 ON p1.x = h.i1
      JOIN pts p2 ON p2.x = h.i2
    ), votes AS (
      SELECT l.hid, l.a, l.b,
             CAST(SUM(CASE WHEN ABS(p.y - (l.a * p.x + l.b)) < 500.0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
      FROM lines l, pts p
      GROUP BY l.hid, l.a, l.b
    ), best AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_inliers DESC, hid) AS rk
        FROM votes
      ) WHERE rk = 1
    ), refit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(p.x) AS BIGINT) AS sx,
             CAST(SUM(p.y) AS BIGINT) AS sy,
             CAST(SUM(p.x * p.x) AS BIGINT) AS sxx,
             CAST(SUM(p.x * p.y) AS BIGINT) AS sxy
      FROM pts p, best
      WHERE ABS(p.y - (best.a * p.x + best.b)) < 500.0
    )
    SELECT g.g AS n_points,
           best.hid AS best_hypothesis,
           best.n_inliers,
           ROUND(best.a, 6) AS slope_ransac,
           ROUND(best.b, 6) AS intercept_ransac,
           ROUND(CAST(refit.m * refit.sxy - refit.sx * refit.sy AS DOUBLE)
                 / (refit.m * refit.sxx - refit.sx * refit.sx), 6)
             AS slope_refit,
           ROUND((CAST(refit.sy AS DOUBLE)
                  - CAST(refit.m * refit.sxy - refit.sx * refit.sy AS DOUBLE)
                    / (refit.m * refit.sxx - refit.sx * refit.sx)
                    * refit.sx) / refit.m, 6) AS intercept_refit
    FROM best, refit, g
    """,
)
def q425_ransac_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X355 — RANSAC robust trend fit (Fischler & Bolles 1981) on the
    daily mean-value series: 32 hash-seeded two-point line hypotheses,
    each verified against all days (inlier = residual < 500 cents),
    winner by (inlier count, hypothesis id), then an exact-integer-
    moment OLS REFIT on the winner's consensus set — the
    hypothesize-verify-refit robust estimator that survives gross
    outliers Theil–Sen (q248) merely dilutes and MAD screens (q145)
    only FLAG. Sample indices are md5-seeded with the standard
    skip-collision adjustment (i2 >= i1 → i2+1) so the two points are
    always distinct and both engines draw identical hypotheses; day
    means are floor-divided integer cents so hypothesis lines and
    residuals are identical-text double arithmetic on identical
    integers.

    Scale: one day-grain aggregate; the verify lattice is |hypotheses|
    × |days| (bounded by experiment design), the argmax a 32-row
    window, the refit a second pass over the day table."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    pts = d.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("x"),
        F.expr("s DIV n").alias("y"),
    )
    g = pts.agg(F.count(F.lit(1)).cast("long").alias("g"))
    hyp = (
        spark.range(1, 33)
        .select(F.col("id").alias("hid"))
        .crossJoin(F.broadcast(g))
        .select(
            "hid",
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("a"), F.col("hid").cast("string"))), 1, 13),
                    16,
                    10,
                ).cast("long")
                % F.col("g")
            ).alias("i1"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("b"), F.col("hid").cast("string"))), 1, 13),
                    16,
                    10,
                ).cast("long")
                % (F.col("g") - 1)
            ).alias("i2r"),
        )
        .select(
            "hid",
            "i1",
            F.when(F.col("i2r") >= F.col("i1"), F.col("i2r") + 1)
            .otherwise(F.col("i2r"))
            .alias("i2"),
        )
    )
    p1 = pts.select(F.col("x").alias("i1"), F.col("y").alias("y1"))
    p2 = pts.select(F.col("x").alias("i2"), F.col("y").alias("y2"))
    lines = (
        hyp.join(F.broadcast(p1), "i1")
        .join(F.broadcast(p2), "i2")
        .select(
            "hid",
            ((F.col("y2") - F.col("y1")).cast("double") / (F.col("i2") - F.col("i1"))).alias("a"),
            (
                F.col("y1").cast("double")
                - (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("i2") - F.col("i1"))
                * F.col("i1")
            ).alias("b"),
        )
    )
    votes = (
        lines.crossJoin(F.broadcast(pts))
        .groupBy("hid", "a", "b")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("y") - (F.col("a") * F.col("x") + F.col("b"))) < 500.0,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_inliers")
        )
    )
    best = (
        votes.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.desc("n_inliers"), "hid"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    refit = (
        pts.crossJoin(F.broadcast(best))
        .filter(
            F.abs(F.col("y") - (F.col("a") * F.col("x") + F.col("b"))) < 500.0
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    slope_refit = (
        F.expr("CAST(m * sxy - sx * sy AS DOUBLE)")
        / F.expr("m * sxx - sx * sx")
    )
    return (
        best.crossJoin(F.broadcast(refit))
        .crossJoin(F.broadcast(g))
        .select(
            F.col("g").alias("n_points"),
            F.col("hid").alias("best_hypothesis"),
            "n_inliers",
            F.round("a", 6).alias("slope_ransac"),
            F.round("b", 6).alias("intercept_ransac"),
            F.round(slope_refit, 6).alias("slope_refit"),
            F.round(
                (F.col("sy").cast("double") - slope_refit * F.col("sx"))
                / F.col("m"),
                6,
            ).alias("intercept_refit"),
        )
    )



@register(
    "q434_mase_smape_eval",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), f AS (
      SELECT event_type, day, y,
             LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc,
             LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM d
    ), terms AS (
      SELECT event_type,
             CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END AS is_f,
             CASE WHEN fc IS NOT NULL THEN ABS(y - fc) ELSE 0 END AS ae,
             CASE WHEN fc IS NOT NULL
                  THEN (2 * ABS(y - fc) * 1000000) // GREATEST(y + fc, 1)
                  ELSE 0 END AS smape_e6,
             CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END AS is_n,
             CASE WHEN prev IS NOT NULL THEN ABS(y - prev) ELSE 0 END
               AS ae_naive
      FROM f
    )
    SELECT event_type,
           CAST(SUM(is_f) AS BIGINT) AS n_forecasts,
           ROUND(CAST(SUM(ae) AS DOUBLE) / SUM(is_f), 6)
             AS mae_forecast_cents,
           ROUND(CAST(SUM(ae_naive) AS DOUBLE) / SUM(is_n), 6)
             AS mae_naive_cents,
           ROUND((CAST(SUM(ae) AS DOUBLE) * SUM(is_n))
                 / (CAST(SUM(is_f) AS DOUBLE)
                    * GREATEST(SUM(ae_naive), 1)), 6) AS mase,
           ROUND(CAST(SUM(smape_e6) AS DOUBLE) / SUM(is_f) / 1e6, 6)
             AS smape
    FROM terms GROUP BY event_type
    """,
)
def q434_mase_smape_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X364 — MASE + sMAPE forecast evaluation (Hyndman & Koehler
    2006; the M-competition metrics) for a weekly-seasonal-naive
    forecast of daily revenue per type: MASE scales the forecast's MAE
    by the in-sample naive one-step MAE — the scale-free skill score
    that says "beats naive" at MASE < 1 without unit traps — and
    sMAPE bounds percentage error symmetrically. Complements q317
    (rolling-origin MAE backtest) and q416 (quantile pinball) with the
    standard POINT-forecast skill metrics. Every error term is integer
    cents; each day's sMAPE term quantizes to ppm by floor division
    BEFORE summing, so both metrics fold from exact int64 in any
    aggregation order.

    Scale: one (type, day) aggregate, two lags at that bounded grain,
    one type-grain reduce."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("y")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    f = d.select(
        "event_type",
        "y",
        F.lag("y", 7).over(wt).alias("fc"),
        F.lag("y", 1).over(wt).alias("prev"),
    )
    terms = f.select(
        "event_type",
        F.when(F.col("fc").isNotNull(), 1).otherwise(0).alias("is_f"),
        F.when(F.col("fc").isNotNull(), F.abs(F.col("y") - F.col("fc")))
        .otherwise(0)
        .alias("ae"),
        F.when(
            F.col("fc").isNotNull(),
            F.expr(
                "(2 * ABS(y - fc) * 1000000) DIV GREATEST(y + fc, 1)"
            ),
        )
        .otherwise(0)
        .alias("smape_e6"),
        F.when(F.col("prev").isNotNull(), 1).otherwise(0).alias("is_n"),
        F.when(F.col("prev").isNotNull(), F.abs(F.col("y") - F.col("prev")))
        .otherwise(0)
        .alias("ae_naive"),
    )
    return terms.groupBy("event_type").agg(
        F.sum("is_f").cast("long").alias("n_forecasts"),
        F.round(F.sum("ae").cast("double") / F.sum("is_f"), 6).alias(
            "mae_forecast_cents"
        ),
        F.round(F.sum("ae_naive").cast("double") / F.sum("is_n"), 6).alias(
            "mae_naive_cents"
        ),
        F.round(
            (F.sum("ae").cast("double") * F.sum("is_n"))
            / (
                F.sum("is_f").cast("double")
                * F.greatest(F.sum("ae_naive"), F.lit(1))
            ),
            6,
        ).alias("mase"),
        F.round(
            F.sum("smape_e6").cast("double") / F.sum("is_f") / 1e6, 6
        ).alias("smape"),
    )



@register(
    "q435_nelson_aalen",
    allow_non_equi=(
        "two 1-row scalar-broadcast crossJoin attaches (the censoring "
        "horizon and the total-sessions scalar onto the duration-grain "
        "risk table) - the q210 shape"
    ),
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
    ), risk AS (
      SELECT dur_min,
             CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)
                  AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS ended_here
      FROM sess GROUP BY dur_min
    ), na AS (
      SELECT dur_min, d,
             (SELECT COUNT(*) FROM sess)
               - COALESCE(SUM(ended_here) OVER (ORDER BY dur_min
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM risk
    ), hz AS (
      SELECT dur_min, d, n_at_risk,
             (d * 1000000000) // n_at_risk AS h_e9,
             ((d * (n_at_risk - d)) * 1000000000)
               // n_at_risk // n_at_risk // n_at_risk AS vh_e9
      FROM na WHERE d > 0
    )
    SELECT dur_min,
           CAST(d AS BIGINT) AS n_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           ROUND(CAST(SUM(h_e9) OVER (ORDER BY dur_min
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e9, 6)
             AS cumulative_hazard,
           ROUND(SQRT(CAST(SUM(vh_e9) OVER (ORDER BY dur_min
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e9), 6)
             AS hazard_se
    FROM hz
    """,
)
def q435_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X365 — NELSON–AALEN cumulative hazard H(t) = Σ d_i/n_i with its
    Poisson-variance standard error Σ d_i(n_i−d_i)/n_i³ — the hazard-
    scale companion of q210's Kaplan–Meier survival (same sessions,
    same last-timestamp censoring): KM answers "what fraction
    survives", NA answers "how much failure intensity has
    accumulated", the natural input for hazard-ratio eyeballing and
    the exp(−H) Breslow survival check. Each increment quantizes to
    nano-units by floor division (d·1e9 DIV n is exact int64 — n³ ≤
    1e15 for n ≤ 1e5 sessions per grain stays in range; at larger
    corpora the duration grain coarsens first), so the prefix sums
    are order-free integers and only the two published columns are
    float.

    Scale: per-user sessionize window (q11's exchange) + one ordered
    prefix scan at duration grain."""
    ev = load(spark, sf_dir, "events")
    wue = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wue)).alias(
            "gap_us"
        ),
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
        .select("dur_min", (F.col("end_ts") == F.col("h_ts")).alias("censored"))
    )
    risk = sess.groupBy("dur_min").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
        F.count(F.lit(1)).cast("long").alias("ended_here"),
    )
    tot = sess.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    wprev = Window.orderBy("dur_min").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("dur_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = (
        risk.crossJoin(F.broadcast(tot))
        .select(
            "dur_min",
            "d",
            (
                F.col("n_tot")
                - F.coalesce(F.sum("ended_here").over(wprev), F.lit(0))
            ).alias("n_at_risk"),
        )
        .filter(F.col("d") > 0)
        .select(
            "dur_min",
            "d",
            "n_at_risk",
            F.expr("(d * 1000000000) DIV n_at_risk").alias("h_e9"),
            # Staged DIV (floor(floor(floor(x/n)/n)/n) == floor(x/n^3) for n>0)
            # keeps every intermediate <= d*(n-d)*1e9 / n — bounded even when
            # n_at_risk (= total sessions at the first duration) exceeds ~2.1M,
            # where n^3 would overflow int64 (Spark wraps, DuckDB errors).
            F.expr(
                "(((d * (n_at_risk - d)) * 1000000000)"
                " DIV n_at_risk DIV n_at_risk) DIV n_at_risk"
            ).alias("vh_e9"),
        )
    )
    return na.select(
        "dur_min",
        F.col("d").alias("n_events"),
        "n_at_risk",
        F.round(
            F.sum("h_e9").over(wcum).cast("double") / 1e9, 6
        ).alias("cumulative_hazard"),
        F.round(
            F.sqrt(F.sum("vh_e9").over(wcum).cast("double") / 1e9), 6
        ).alias("hazard_se"),
    )



@register(
    "q440_changepoint_localization",
    allow_non_equi=(
        "the day-grain prefix table self-joins against its own 1-row "
        "total and the candidate-split lattice is |days| rows; raw "
        "events never enter a non-equi join"
    ),
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ), idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS k, day,
             s // n AS y
      FROM d
    ), pre AS (
      SELECT k, day, y,
             CAST(SUM(y) OVER (ORDER BY k) AS BIGINT) AS ps,
             CAST(SUM(y * y) OVER (ORDER BY k) AS BIGINT) AS ps2
      FROM idx
    ), tot AS (
      SELECT MAX(k) AS g, MAX(ps) AS ts_, MAX(ps2) AS ts2 FROM pre
    ), cand AS (
      SELECT p.k AS split_k, p.day AS split_day,
             (CAST(p.ps2 AS DOUBLE) - CAST(p.ps AS DOUBLE) * p.ps / p.k)
             + (CAST(t.ts2 - p.ps2 AS DOUBLE)
                - CAST(t.ts_ - p.ps AS DOUBLE) * (t.ts_ - p.ps)
                  / (t.g - p.k)) AS sse_split,
             CAST(t.ts2 AS DOUBLE)
               - CAST(t.ts_ AS DOUBLE) * t.ts_ / t.g AS sse_total
      FROM pre p, tot t
      WHERE p.k >= 2 AND p.k <= t.g - 2
    ), best AS (
      SELECT MIN(ROUND(sse_split, 6)) AS best_sse FROM cand
    ), best_k AS (
      SELECT MIN(split_k) AS bk FROM cand, best
      WHERE ROUND(sse_split, 6) = best.best_sse
    )
    SELECT c.split_k, c.split_day,
           ROUND(c.sse_split, 4) AS sse_split,
           ROUND(1.0 - c.sse_split / c.sse_total, 6) AS variance_explained,
           CAST(CASE WHEN c.split_k = bk.bk THEN 1 ELSE 0 END AS BIGINT)
             AS is_best
    FROM cand c, best_k bk
    """,
)
def q440_changepoint_localization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X370 — CHANGEPOINT LOCALIZATION by binary segmentation (one
    split, exact SSE argmin — Scott & Knott / the first step of every
    binseg/PELT detector): for each candidate day k the two-segment
    SSE folds from integer prefix moments (Σy, Σy² to the left; totals
    minus prefixes to the right), and the split minimizing rounded SSE
    is flagged with its variance-explained. CUSUM (q208) DETECTS that
    a shift happened and roughly when; this is the estimator that
    pinpoints WHERE and quantifies HOW MUCH of the series' variance
    one break absorbs — the retrain/incident-start localizer. Prefix
    sums are exact int64 at day grain; each candidate's SSE is
    identical-text double arithmetic on those integers, and the
    argmin compares ROUNDED values with a lowest-k tie rule.

    Scale: one day-grain aggregate + one ordered prefix scan; the
    candidate lattice is |days| rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    idx = d.select(
        F.row_number().over(Window.orderBy("day")).alias("k"),
        "day",
        F.expr("s DIV n").alias("y"),
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = idx.select(
        "k",
        "day",
        F.sum("y").over(wk).cast("long").alias("ps"),
        F.sum(F.col("y") * F.col("y")).over(wk).cast("long").alias("ps2"),
    )
    tot = pre.agg(
        F.max("k").alias("g"), F.max("ps").alias("ts_"), F.max("ps2").alias("ts2")
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter((F.col("k") >= 2) & (F.col("k") <= F.col("g") - 2))
        .select(
            F.col("k").alias("split_k"),
            F.col("day").alias("split_day"),
            (
                (F.col("ps2").cast("double") - F.col("ps").cast("double") * F.col("ps") / F.col("k"))
                + (
                    (F.col("ts2") - F.col("ps2")).cast("double")
                    - (F.col("ts_") - F.col("ps")).cast("double")
                    * (F.col("ts_") - F.col("ps"))
                    / (F.col("g") - F.col("k"))
                )
            ).alias("sse_split"),
            (
                F.col("ts2").cast("double")
                - F.col("ts_").cast("double") * F.col("ts_") / F.col("g")
            ).alias("sse_total"),
        )
    )
    best = cand.agg(F.min(F.round("sse_split", 6)).alias("best_sse"))
    best_k = (
        cand.crossJoin(F.broadcast(best))
        .filter(F.round("sse_split", 6) == F.col("best_sse"))
        .agg(F.min("split_k").alias("bk"))
    )
    return cand.crossJoin(F.broadcast(best_k)).select(
        "split_k",
        "split_day",
        F.round("sse_split", 4).alias("sse_split"),
        F.round(1.0 - F.col("sse_split") / F.col("sse_total"), 6).alias(
            "variance_explained"
        ),
        F.when(F.col("split_k") == F.col("bk"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_best"),
    )




def _hurst_oracle() -> str:
    # R/S at one block size w: blocks of w consecutive days; within a
    # block, R = max - min of the centered prefix sums, S = population
    # std; both engines see identical text. Means over blocks and the
    # final 3-point log-log slope fold in sorted order.
    per_w = """
    , blk{w} AS (
      SELECT (di // {w}) AS b, di, yc,
             SUM(yc) OVER (PARTITION BY (di // {w})) AS bs,
             COUNT(*) OVER (PARTITION BY (di // {w})) AS bn
      FROM days WHERE di < (SELECT (COUNT(*) // {w}) * {w} FROM days)
    ), pre{w} AS (
      SELECT b, di,
             SUM(CAST(yc AS DOUBLE) - CAST(bs AS DOUBLE) / bn)
               OVER (PARTITION BY b ORDER BY di) AS cum,
             CAST(yc AS DOUBLE) - CAST(bs AS DOUBLE) / bn AS dev
      FROM blk{w}
    ), mom{w} AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(yc * yc) AS BIGINT) AS sy2
      FROM blk{w} GROUP BY b
    ), rs{w} AS (
      SELECT p.b,
             (MAX(p.cum) - MIN(p.cum))
             / GREATEST(SQRT((CAST(m.sy2 AS DOUBLE)
                              - CAST(m.sy AS DOUBLE) * m.sy / m.n) / m.n),
                        1e-9) AS rs
      FROM pre{w} p JOIN mom{w} m USING (b)
      GROUP BY p.b, m.sy2, m.sy, m.n
    ), m{w} AS (
      SELECT list_reduce(list_prepend(0.0, list(rs ORDER BY b)),
               (acc, x) -> acc + x) / COUNT(*) AS mean_rs,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM rs{w}
    )"""
    return (
        """
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), days AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS di, yc
      FROM d0
    )"""
        + "".join(per_w.format(w=w) for w in (7, 14, 28))
        + """
    , pts AS (
      SELECT LN(7.0) AS x1, LN(m7.mean_rs) AS y1,
             LN(14.0) AS x2, LN(m14.mean_rs) AS y2,
             LN(28.0) AS x3, LN(m28.mean_rs) AS y3,
             m7.n_blocks AS b7, m14.n_blocks AS b14, m28.n_blocks AS b28,
             m7.mean_rs AS rs7, m14.mean_rs AS rs14, m28.mean_rs AS rs28
      FROM m7, m14, m28
    )
    SELECT b7 AS n_blocks_7, b14 AS n_blocks_14, b28 AS n_blocks_28,
           ROUND(rs7, 6) AS mean_rs_7,
           ROUND(rs14, 6) AS mean_rs_14,
           ROUND(rs28, 6) AS mean_rs_28,
           ROUND((3.0 * (x1*y1 + x2*y2 + x3*y3)
                  - (x1 + x2 + x3) * (y1 + y2 + y3))
                 / (3.0 * (x1*x1 + x2*x2 + x3*x3)
                    - (x1 + x2 + x3) * (x1 + x2 + x3)), 6) AS hurst_h
    FROM pts
    """
    )


@register(
    "q462_hurst_exponent",
    allow_non_equi=(
        "three 1-row per-block-size mean-R/S scalars crossJoin-combined "
        "into the 1-row log-log fit"
    ),
    oracle=_hurst_oracle(),
)
def q462_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X392 — HURST EXPONENT of daily revenue by rescaled-range (R/S)
    analysis (Hurst 1951; Mandelbrot & Wallis 1969): long-range
    dependence triage — H ≈ 0.5 means increments are memoryless (q426's
    world), H > 0.5 persistent trends (todays's highs beget tomorrow's
    — q317's backtest horizons should stretch), H < 0.5 mean-reversion.
    Blocks of w ∈ {7, 14, 28} days; per block R = range of centered
    prefix sums over S = population std (identical-text doubles); mean
    R/S per w folds over blocks in block order (the q448 discipline);
    H = 3-point closed-form OLS slope of ln(R/S) on ln(w). Day counts
    are exact integer cents until the per-block float step, and every
    float reduction is ordered.

    Scale: the series lives at DAY grain — one events rollup, then
    window math over a relation with one row per day; the three block
    sizes reuse the same day relation."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    days = d0.select(
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("di"),
        "yc",
    )
    n_days = days.agg(F.count(F.lit(1)).alias("nd"))
    ms = []
    for w in (7, 14, 28):
        blk = (
            days.crossJoin(F.broadcast(n_days))
            .filter(F.col("di") < F.expr(f"(nd DIV {w}) * {w}"))
            .select(
                F.expr(f"di DIV {w}").alias("b"),
                "di",
                "yc",
            )
        )
        wb = Window.partitionBy("b")
        mom = blk.groupBy("b").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("yc").cast("long").alias("sy"),
            F.sum(F.col("yc") * F.col("yc")).cast("long").alias("sy2"),
        )
        dev = blk.select(
            "b",
            "di",
            (
                F.col("yc").cast("double")
                - F.sum("yc").over(wb).cast("double") / F.count("*").over(wb)
            ).alias("dev"),
        )
        pre = dev.withColumn(
            "cum",
            F.sum("dev").over(
                Window.partitionBy("b")
                .orderBy("di")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        # R from order-pinned prefix sums (MAX/MIN are order-free); S from
        # EXACT integer block moments - no float group-aggregation anywhere
        rs = (
            pre.groupBy("b")
            .agg(F.max("cum").alias("mx"), F.min("cum").alias("mn"))
            .join(F.broadcast(mom), "b")
            .select(
                "b",
                (
                    (F.col("mx") - F.col("mn"))
                    / F.greatest(
                        F.sqrt(
                            (
                                F.col("sy2").cast("double")
                                - F.col("sy").cast("double") * F.col("sy") / F.col("n")
                            )
                            / F.col("n")
                        ),
                        F.lit(1e-9),
                    )
                ).alias("rs"),
            )
        )
        m = rs.agg(
            (
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("b", F.col("rs").alias("r")))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["r"],
                )
                / F.count(F.lit(1))
            ).alias(f"rs{w}"),
            F.count(F.lit(1)).cast("long").alias(f"b{w}"),
        )
        ms.append(m)
    pts = (
        ms[0]
        .crossJoin(F.broadcast(ms[1]))
        .crossJoin(F.broadcast(ms[2]))
        .select(
            "*",
            *[
                F.log(F.lit(float(w))).alias(f"x{i+1}")
                for i, w in enumerate((7, 14, 28))
            ],
            F.log("rs7").alias("y1"),
            F.log("rs14").alias("y2"),
            F.log("rs28").alias("y3"),
        )
    )
    slope = F.expr(
        "(3.0 * (x1*y1 + x2*y2 + x3*y3)"
        " - (x1 + x2 + x3) * (y1 + y2 + y3))"
        " / (3.0 * (x1*x1 + x2*x2 + x3*x3)"
        " - (x1 + x2 + x3) * (x1 + x2 + x3))"
    )
    return pts.select(
        F.col("b7").alias("n_blocks_7"),
        F.col("b14").alias("n_blocks_14"),
        F.col("b28").alias("n_blocks_28"),
        F.round("rs7", 6).alias("mean_rs_7"),
        F.round("rs14", 6).alias("mean_rs_14"),
        F.round("rs28", 6).alias("mean_rs_28"),
        F.round(slope, 6).alias("hurst_h"),
    )


@register(
    "q471_pacf_durbin_levinson",
    allow_non_equi=(
        "day-grain lag self-joins (t vs t+k) and a 1-row moment scalar; "
        "never raw events"
    ),
    oracle="""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY day
    ), days AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, yc
      FROM d0
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(yc) AS BIGINT) AS s
      FROM days
    ), c AS (
      SELECT a.t,
             (CAST(a.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
               * (CAST(a.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n) AS p0,
             (CAST(a.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
               * (CAST(b1.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n) AS p1,
             (CAST(a.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
               * (CAST(b2.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n) AS p2,
             (CAST(a.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
               * (CAST(b3.yc AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n) AS p3
      FROM days a
      LEFT JOIN days b1 ON b1.t = a.t + 1
      LEFT JOIN days b2 ON b2.t = a.t + 2
      LEFT JOIN days b3 ON b3.t = a.t + 3, m
    ), folds AS (
      SELECT
        list_reduce(list_prepend(0.0, list(p0 ORDER BY t)),
          (acc, x) -> acc + x) AS c0,
        list_reduce(list_prepend(0.0,
          list(COALESCE(p1, 0.0) ORDER BY t)), (acc, x) -> acc + x) AS c1,
        list_reduce(list_prepend(0.0,
          list(COALESCE(p2, 0.0) ORDER BY t)), (acc, x) -> acc + x) AS c2,
        list_reduce(list_prepend(0.0,
          list(COALESCE(p3, 0.0) ORDER BY t)), (acc, x) -> acc + x) AS c3
      FROM c
    ), rho AS (
      SELECT c1 / c0 AS r1, c2 / c0 AS r2, c3 / c0 AS r3 FROM folds
    ), dl AS (
      SELECT r1, r2, r3,
             r1 AS phi11,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
      FROM rho
    ), dl2 AS (
      SELECT *,
             r1 * (1.0 - phi22) AS phi21
      FROM dl
    )
    SELECT ROUND(r1, 6) AS rho1, ROUND(r2, 6) AS rho2, ROUND(r3, 6) AS rho3,
           ROUND(phi11, 6) AS pacf1,
           ROUND(phi22, 6) AS pacf2,
           ROUND((r3 - phi21 * r2 - phi22 * r1)
                 / (1.0 - phi21 * r1 - phi22 * r2), 6) AS pacf3
    FROM dl2
    """,
)
def q471_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X401 — PARTIAL AUTOCORRELATION (lags 1–3) of daily revenue via
    the Durbin–Levinson recursion unrolled: the AR-ORDER diagnostic —
    q257's raw ACF decays geometrically under ANY AR(1), so it can't
    tell AR(1) from AR(3); PACF cuts off sharply at the true order,
    which is the lag count q234's forecast and q466's DW correction
    actually need. Autocovariances are day-ordered float folds over
    the centered lag products (the q448 discipline; means from exact
    integer moments); φ11/φ22/φ33 are the closed-form DL steps on a
    1-row relation — identical text, no iteration.

    Scale: one day rollup; three day-grain lag equi-joins (t = t+k);
    folds over ≤|days| rows."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("yc")
    )
    days = d0.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        "yc",
    )
    m = days.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
    )
    a = days.select(F.col("t"), F.col("yc").alias("y0"))
    for k in (1, 2, 3):
        a = a.join(
            days.select(
                (F.col("t") - k).alias("t"), F.col("yc").alias(f"y{k}")
            ),
            "t",
            "left",
        )
    ybar = F.col("s").cast("double") / F.col("n")
    c = a.crossJoin(F.broadcast(m)).select(
        "t",
        ((F.col("y0") - ybar) * (F.col("y0") - ybar)).alias("p0"),
        *[
            F.when(
                F.col(f"y{k}").isNotNull(),
                (F.col("y0") - ybar) * (F.col(f"y{k}") - ybar),
            )
            .otherwise(0.0)
            .alias(f"p{k}")
            for k in (1, 2, 3)
        ],
    )
    def fold(col):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", F.col(col).alias("v")))),
            F.lit(0.0),
            lambda acc, r: acc + r["v"],
        )

    folds = c.agg(
        fold("p0").alias("c0"),
        fold("p1").alias("c1"),
        fold("p2").alias("c2"),
        fold("p3").alias("c3"),
    )
    rho = folds.select(
        (F.col("c1") / F.col("c0")).alias("r1"),
        (F.col("c2") / F.col("c0")).alias("r2"),
        (F.col("c3") / F.col("c0")).alias("r3"),
    )
    dl = rho.select(
        "*",
        F.col("r1").alias("phi11"),
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1.0 - F.col("r1") * F.col("r1"))
        ).alias("phi22"),
    ).withColumn("phi21", F.col("r1") * (1.0 - F.col("phi22")))
    return dl.select(
        F.round("r1", 6).alias("rho1"),
        F.round("r2", 6).alias("rho2"),
        F.round("r3", 6).alias("rho3"),
        F.round("phi11", 6).alias("pacf1"),
        F.round("phi22", 6).alias("pacf2"),
        F.round(
            (F.col("r3") - F.col("phi21") * F.col("r2") - F.col("phi22") * F.col("r1"))
            / (1.0 - F.col("phi21") * F.col("r1") - F.col("phi22") * F.col("r2")),
            6,
        ).alias("pacf3"),
    )


@register(
    "q492_broken_stick_regression",
    allow_non_equi=(
        "the ~30-row day-grain series crossJoins the 21-row candidate-"
        "breakpoint spine for the segmented-OLS grid (bounded ~630-row "
        "lattice), and the 1-row winner/global scalars attach by "
        "broadcast - group-cardinality, never row-level"
    ),
    oracle="""
    WITH d0 AS (
      SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  + 1 AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY t
    ), cand AS (
      SELECT CAST(b AS BIGINT) AS b FROM range(5, 26) r(b)
    ), lattice AS (
      SELECT c.b, d.t, d.y, CASE WHEN d.t <= c.b THEN 0 ELSE 1 END AS side
      FROM d0 d CROSS JOIN cand c
    ), seg AS (
      SELECT b, side,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM lattice GROUP BY b, side
    ), fits AS (
      SELECT b, side, n, sy, sty,
             (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
               / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
               AS slope,
             st, stt, syy
      FROM seg WHERE n >= 2
    ), sses AS (
      SELECT b, side, slope,
             syy - ((sy - slope * st) / n) * sy - slope * sty AS sse
      FROM fits
    ), broken AS (
      SELECT b,
             SUM(sse) AS sse_broken,
             MAX(CASE WHEN side = 0 THEN slope END) AS slope_left,
             MAX(CASE WHEN side = 1 THEN slope END) AS slope_right
      FROM sses GROUP BY b HAVING COUNT(*) = 2
    ), single AS (
      SELECT syy - ((sy - slope * st) / n) * sy - slope * sty AS sse_single
      FROM (
        SELECT n, st, sy, stt, sty, syy,
               (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
                 / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                 AS slope
        FROM (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS st,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(t * t) AS BIGINT) AS stt,
                 CAST(SUM(t * y) AS BIGINT) AS sty,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM d0
        )
      )
    ), best AS (
      SELECT b, sse_broken, slope_left, slope_right,
             ROW_NUMBER() OVER (ORDER BY sse_broken, b) AS rk
      FROM broken
    )
    SELECT best.b AS break_day,
           CAST(DATE '2024-01-01' + CAST(best.b - 1 AS INT) AS DATE)
             AS break_date,
           ROUND(single.sse_single, 2) AS sse_single,
           ROUND(best.sse_broken, 2) AS sse_broken,
           ROUND(1000000.0 * (single.sse_single - best.sse_broken)
                 / single.sse_single, 2) AS gain_ppm,
           ROUND(best.slope_left, 6) AS slope_left,
           ROUND(best.slope_right, 6) AS slope_right
    FROM best CROSS JOIN single WHERE best.rk = 1
    """,
)
def q492_broken_stick_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X422 — BROKEN-STICK (one-breakpoint segmented) REGRESSION of
    daily revenue: fit two OLS lines split at every candidate day
    5..25, pick the breakpoint minimizing total SSE, and publish the
    single-line SSE alongside — the REGRESSION view of changepoint
    detection (q? cusum flags WHERE the level shifts; this fits WHAT
    the trend was on each side and how much the kink explains,
    gain_ppm). Classic grid-search segmentation (Bai–Perron shape,
    m=1): every per-side moment is an exact int64 sum over the
    day×candidate lattice, each side's SSE is the closed-form
    Syy − â·Sy − b̂·Sty, and the argmin is rank-picked with the
    deterministic (sse, b) tiebreak.

    Scale: the lattice is |days|×21 — day-grain, corpus-independent
    after the first rollup; everything else is 21-row arithmetic."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')"
            " + 1 AS BIGINT)"
        ).alias("t")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("y"))
    cand = spark.range(5, 26).select(F.col("id").cast("long").alias("b"))
    lattice = d0.join(F.broadcast(cand)).select(
        "b",
        "t",
        "y",
        F.when(F.col("t") <= F.col("b"), 0).otherwise(1).alias("side"),
    )
    seg = lattice.groupBy("b", "side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    slope_expr = (
        "(n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)"
        " / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)"
    )
    sses = (
        seg.filter(F.col("n") >= 2)
        .withColumn("slope", F.expr(slope_expr))
        .withColumn(
            "sse",
            F.expr("syy - ((sy - slope * st) / n) * sy - slope * sty"),
        )
    )
    broken = (
        sses.groupBy("b")
        .agg(
            F.sum("sse").alias("sse_broken"),
            F.max(F.when(F.col("side") == 0, F.col("slope"))).alias(
                "slope_left"
            ),
            F.max(F.when(F.col("side") == 1, F.col("slope"))).alias(
                "slope_right"
            ),
            F.count(F.lit(1)).alias("_sides"),
        )
        .filter(F.col("_sides") == 2)
    )
    single = (
        d0.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t").cast("long").alias("st"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        .withColumn("slope", F.expr(slope_expr))
        .select(
            F.expr(
                "syy - ((sy - slope * st) / n) * sy - slope * sty"
            ).alias("sse_single")
        )
    )
    w = Window.orderBy("sse_broken", "b")
    best = broken.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return best.join(F.broadcast(single)).select(
        F.col("b").alias("break_day"),
        F.expr(
            "CAST(date_add(DATE '2024-01-01', CAST(b - 1 AS INT)) AS DATE)"
        ).alias("break_date"),
        F.round("sse_single", 2).alias("sse_single"),
        F.round("sse_broken", 2).alias("sse_broken"),
        F.round(
            F.expr(
                "1000000.0 * (sse_single - sse_broken) / sse_single"
            ),
            2,
        ).alias("gain_ppm"),
        F.round("slope_left", 6).alias("slope_left"),
        F.round("slope_right", 6).alias("slope_right"),
    )


@register(
    "q495_dow_adjusted_anomalies",
    oracle="""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  % 7 AS BIGINT) AS dow,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY day, dow
    ), per AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS s2
      FROM d0 GROUP BY dow
    ), z AS (
      SELECT d0.day, d0.dow, d0.y,
             (d0.y - CAST(p.s AS DOUBLE) / p.n)
             / SQRT(GREATEST((CAST(p.s2 AS DOUBLE)
                              - CAST(p.s AS DOUBLE) * p.s / p.n)
                             / (p.n - 1), 1e-9)) AS z
      FROM d0 JOIN per p USING (dow) WHERE p.n >= 2
    )
    SELECT day, dow, y AS revenue_cents, ROUND(z, 6) AS z_score,
           CAST(CASE WHEN ABS(z) > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             AS is_anomaly
    FROM z ORDER BY day
    """,
)
def q495_dow_adjusted_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X425 — DAY-OF-WEEK-ADJUSTED revenue anomalies: each day's total
    scored against ITS OWN weekday's mean/sd, so weekend dips and
    Monday spikes stop masquerading as anomalies (the seasonality trap
    a raw daily z-screen like q94 falls into). Weekday index is the
    portable (day − epoch) mod 7 integer — Spark's dayofweek() and
    DuckDB's disagree on week start, so neither is used. Per-weekday
    moments are exact int64; only the final z is a double; every day
    publishes its weekday-adjusted z with an |z| > 1.5 anomaly flag so
    the reviewer sees both the flagged days and the baseline that was
    applied.

    Scale: day-grain rollup, 7-row broadcast of weekday moments."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') % 7"
            " AS BIGINT)"
        ).alias("dow"),
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("y"))
    per = d0.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
    )
    z = (
        d0.join(F.broadcast(per.filter(F.col("n") >= 2)), "dow")
        .withColumn(
            "z",
            F.expr(
                "(y - CAST(s AS DOUBLE) / n)"
                " / SQRT(GREATEST((CAST(s2 AS DOUBLE)"
                " - CAST(s AS DOUBLE) * s / n) / (n - 1), 1e-9))"
            ),
        )
    )
    return z.select(
        "day",
        "dow",
        F.col("y").alias("revenue_cents"),
        F.round("z", 6).alias("z_score"),
        F.when(F.abs(F.col("z")) > 1.5, 1)
        .otherwise(0)
        .cast("long")
        .alias("is_anomaly"),
    ).orderBy("day")


@register(
    "q501_gumbel_block_maxima",
    oracle="""
    WITH bm AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY day
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS s,
             CAST(SUM(m * m) AS BIGINT) AS s2,
             CAST(MAX(m) AS BIGINT) AS obs_max
      FROM bm
    ), fit AS (
      SELECT n, obs_max,
             CAST(s AS DOUBLE) / n AS mean,
             SQRT(6.0 * GREATEST((CAST(s2 AS DOUBLE)
                                  - CAST(s AS DOUBLE) * s / n) / (n - 1),
                                 1e-9)) / PI() AS beta
      FROM g
    ), p AS (
      SELECT n, obs_max, beta,
             mean - 0.5772156649015329 * beta AS mu
      FROM fit
    )
    SELECT n AS n_blocks, obs_max AS observed_max_cents,
           ROUND(mu, 6) AS gumbel_mu,
           ROUND(beta, 6) AS gumbel_beta,
           ROUND(mu - beta * ln(-ln(CAST(0.9666666666666667 AS DOUBLE))), 6)
             AS return_level_30d,
           ROUND(mu - beta * ln(-ln(CAST(0.9972602739726028 AS DOUBLE))), 6)
             AS return_level_365d
    FROM p
    """,
)
def q501_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X431 — EXTREME-VALUE ANALYSIS via Gumbel block maxima: daily
    maxima of event value fitted to a Gumbel distribution by method of
    moments (β = √(6·Var)/π, μ = mean − γ·β) and extrapolated to the
    30-day and 365-day RETURN LEVELS — "how big a value should we
    provision for per month / per year", the tail question the bulk
    statistics (q37, q94, q480) cannot answer because they model the
    body, not the max-domain-of-attraction. Opens the EVT shelf: block
    maxima are exact int64 (MAX of cents), the two moments are exact
    integer sums over ~30 blocks, and the fit + return levels are one
    closed-form double expression (γ Euler–Mascheroni literal, single
    ln calls; the 1−1/T probabilities are embedded as precomputed
    double literals because Spark parses `1.0/30.0` as DECIMAL division
    and truncates scale — the q487 pitfall).

    Scale: one day-grain MAX rollup (map-side combinable), one 1-row
    moment aggregate — corpus-independent after the first pass."""
    ev = load(spark, sf_dir, "events")
    bm = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.max(cents(F.col("value"))).cast("long").alias("m")
    )
    g = bm.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("m").cast("long").alias("s"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("s2"),
        F.max("m").cast("long").alias("obs_max"),
    )
    p = (
        g.withColumn("mean", F.expr("CAST(s AS DOUBLE) / n"))
        .withColumn(
            "beta",
            F.expr(
                "SQRT(6.0 * GREATEST((CAST(s2 AS DOUBLE)"
                " - CAST(s AS DOUBLE) * s / n) / (n - 1), 1e-9)) / PI()"
            ),
        )
        .withColumn("mu", F.expr("mean - 0.5772156649015329 * beta"))
    )
    return p.select(
        F.col("n").alias("n_blocks"),
        F.col("obs_max").alias("observed_max_cents"),
        F.round("mu", 6).alias("gumbel_mu"),
        F.round("beta", 6).alias("gumbel_beta"),
        F.round(
            F.expr(
                "mu - beta * ln(-ln(CAST(0.9666666666666667 AS DOUBLE)))"
            ),
            6,
        ).alias("return_level_30d"),
        F.round(
            F.expr(
                "mu - beta * ln(-ln(CAST(0.9972602739726028 AS DOUBLE)))"
            ),
            6,
        ).alias("return_level_365d"),
    )


@register(
    "q506_gpd_peaks_over_threshold",
    allow_non_equi=(
        "two 1-row scalar broadcast attaches: the order-statistic "
        "threshold scalar onto the event scan, then the exceedance-"
        "moment row onto the totals row - group-cardinality"
    ),
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
    ), hist AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY vc
    ), cum AS (
      SELECT vc, SUM(c) OVER (ORDER BY vc DESC
                              ROWS UNBOUNDED PRECEDING) AS n_ge
      FROM hist
    ), thr AS (
      SELECT CAST(MAX(vc) AS BIGINT) AS u
      FROM cum, tot WHERE n_ge >= tot.n // 10
    ), exc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_e,
             CAST(SUM(vc - u) AS BIGINT) AS s1,
             CAST(SUM((vc - u) * (vc - u)) AS BIGINT) AS s2
      FROM v, thr WHERE vc > u
    ), fit AS (
      SELECT t.n, h.u, e.n_e,
             CAST(e.s1 AS DOUBLE) / e.n_e AS m,
             (CAST(e.s2 AS DOUBLE)
              - CAST(e.s1 AS DOUBLE) * e.s1 / e.n_e) / (e.n_e - 1) AS var
      FROM exc e CROSS JOIN thr h CROSS JOIN tot t
    ), par AS (
      SELECT n, u, n_e, m, var,
             0.5 * (1.0 - m * m / var) AS xi,
             0.5 * m * (m * m / var + 1.0) AS beta,
             CAST(n_e AS DOUBLE) / n AS lam
      FROM fit
    )
    SELECT n AS n_events, u AS threshold_cents, n_e AS n_exceedances,
           ROUND(xi, 6) AS gpd_xi,
           ROUND(beta, 6) AS gpd_beta,
           ROUND(u + beta / xi * (POW(lam * 10000.0, xi) - 1.0), 6)
             AS return_level_10k,
           ROUND(u + beta / xi * (POW(lam * 100000.0, xi) - 1.0), 6)
             AS return_level_100k
    FROM par
    """,
)
def q506_gpd_peaks_over_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X434 — PEAKS-OVER-THRESHOLD extreme-value analysis: generalized
    Pareto fit (method of moments: ξ = ½(1−m²/s²), β = ½m(m²/s²+1)) to
    the exceedances above the empirical 90th-percentile threshold, with
    N-observation return levels x_N = u + β/ξ·((λN)^ξ − 1). The second
    half of the EVT shelf q501 opened: block maxima discard all but one
    observation per block, POT keeps EVERY tail observation, so the fit
    sees 10× the tail data — the estimator of choice when blocks are
    short or the tail is the whole point (p999 capacity planning).

    The threshold is an exact ORDER STATISTIC computed scale-safely: no
    row-grain sort — the cent-quantized value HISTOGRAM (|distinct
    values| rows, bounded by the value domain, not the corpus) carries
    a top-down cumulative count, and u = max value whose ≥-count
    reaches ⌊n/10⌋. Exceedance moments are exact int64; the fit and
    return levels are one closed-form double row.

    Scale: one value-grain count + one |values|-row window + one
    broadcast scalar pass over the scan — no global sort, no window
    over raw events."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(cents(F.col("value")).alias("vc"))
    tot = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    hist = v.groupBy("vc").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.orderBy(F.desc("vc")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select("vc", F.sum("c").over(wcum).alias("n_ge"))
    thr = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("n_ge") >= F.expr("n DIV 10"))
        .agg(F.max("vc").cast("long").alias("u"))
    )
    exc = (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("vc") > F.col("u"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_e"),
            F.sum(F.col("vc") - F.col("u")).cast("long").alias("s1"),
            F.sum(
                (F.col("vc") - F.col("u")) * (F.col("vc") - F.col("u"))
            ).cast("long").alias("s2"),
        )
    )
    fit = (
        exc.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "u",
            "n_e",
            (F.col("s1").cast("double") / F.col("n_e")).alias("m"),
            (
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1")
                    / F.col("n_e")
                )
                / (F.col("n_e") - 1)
            ).alias("var"),
        )
    )
    par = fit.select(
        "n",
        "u",
        "n_e",
        "m",
        "var",
        (0.5 * (1.0 - F.col("m") * F.col("m") / F.col("var"))).alias("xi"),
        (
            0.5
            * F.col("m")
            * (F.col("m") * F.col("m") / F.col("var") + 1.0)
        ).alias("beta"),
        (F.col("n_e").cast("double") / F.col("n")).alias("lam"),
    )
    return par.select(
        F.col("n").alias("n_events"),
        F.col("u").alias("threshold_cents"),
        F.col("n_e").alias("n_exceedances"),
        F.round("xi", 6).alias("gpd_xi"),
        F.round("beta", 6).alias("gpd_beta"),
        F.round(
            F.expr(
                "u + beta / xi * (POW(lam * 10000.0, xi) - 1.0)"
            ),
            6,
        ).alias("return_level_10k"),
        F.round(
            F.expr(
                "u + beta / xi * (POW(lam * 100000.0, xi) - 1.0)"
            ),
            6,
        ).alias("return_level_100k"),
    )


@register(
    "q510_seasonal_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             date_trunc('month', CAST(ts AS DATE)) AS mo,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), sm AS (
      SELECT a.mo,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_m
      FROM daily a JOIN daily b ON b.mo = a.mo AND b.d > a.d
      GROUP BY a.mo
    ), nm AS (
      SELECT mo, CAST(COUNT(*) AS BIGINT) AS n_m FROM daily GROUP BY mo
    ), tm AS (
      SELECT mo,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_m
      FROM (SELECT mo, y, COUNT(*) AS t FROM daily GROUP BY mo, y
            HAVING COUNT(*) > 1)
      GROUP BY mo
    ), per AS (
      SELECT n.mo, n.n_m, COALESCE(s.s_m, 0) AS s_m,
             n.n_m * (n.n_m - 1) * (2 * n.n_m + 5)
               - COALESCE(t.tie_m, 0) AS var_num_m
      FROM nm n LEFT JOIN sm s ON s.mo = n.mo
                LEFT JOIN tm t ON t.mo = n.mo
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
             CAST(SUM(n_m) AS BIGINT) AS n_days,
             CAST(SUM(s_m) AS BIGINT) AS smk_s,
             CAST(SUM(var_num_m) AS BIGINT) AS var_num
      FROM per
    )
    SELECT n_months, n_days, smk_s, var_num,
           ROUND(CAST(var_num AS DOUBLE) / 18.0, 6) AS var_s,
           ROUND(CASE WHEN smk_s = 0 THEN 0.0
                 ELSE (smk_s - CASE WHEN smk_s > 0 THEN 1 ELSE -1 END)
                      / SQRT(CAST(var_num AS DOUBLE) / 18.0) END, 6) AS z
    FROM tot
    """,
)
def q510_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X438 — SEASONAL (Hirsch–Slack) Mann–Kendall trend test: the MK
    pairwise-sign statistic computed WITHIN each calendar month and
    summed, S' = Σ_m S_m with tie-corrected Var = Σ_m Var_m — so a
    strong monthly cycle (which inflates plain q249's cross-month pairs
    with seasonal signal) cannot masquerade as a monotone trend; only
    like-vs-like comparisons count. The standard upgrade when the
    series has known periodicity (q257 ACF / q325 seasonality strength
    decide WHETHER it does; this tests trend GIVEN it does).

    Every component stays exact int64 through the final expression: S'
    is a sum of pairwise signs, and the variance is carried as its
    integer NUMERATOR Σ_m [n_m(n_m−1)(2n_m+5) − tie_m] with the single
    /18 applied once at the end — no float accumulation across months
    at all (a float Σ var_m would be partition-order-dependent; the
    integer numerator is not).

    Scale: within-month day-pair spines on the DAY rollup (≤31² per
    month — dimension-sized, the q248/q249 adjudication), never raw
    events; unlike q249's pure theta spine this one EQUI-joins on the
    month key (b.d > a.d is a join filter), so Catalyst plans a hash
    join, not a nested loop — no allowlist entry needed."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.trunc(F.to_date("ts"), "month").alias("mo"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.y") > F.col("a.y"), 1)
        .when(F.col("b.y") < F.col("a.y"), -1)
        .otherwise(0)
    )
    sm = (
        a.join(
            b,
            (F.col("b.mo") == F.col("a.mo")) & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.mo").alias("mo"))
        .agg(F.sum(sgn).cast("long").alias("s_m"))
    )
    nm = daily.groupBy("mo").agg(F.count(F.lit(1)).cast("long").alias("n_m"))
    tm = (
        daily.groupBy("mo", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("mo")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("long").alias("tie_m")
        )
    )
    per = (
        nm.join(sm, "mo", "left")
        .join(tm, "mo", "left")
        .select(
            "mo",
            "n_m",
            F.coalesce(F.col("s_m"), F.lit(0)).alias("s_m"),
            (
                F.col("n_m") * (F.col("n_m") - 1) * (2 * F.col("n_m") + 5)
                - F.coalesce(F.col("tie_m"), F.lit(0))
            ).alias("var_num_m"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("n_m").cast("long").alias("n_days"),
        F.sum("s_m").cast("long").alias("smk_s"),
        F.sum("var_num_m").cast("long").alias("var_num"),
    )
    return tot.select(
        "n_months",
        "n_days",
        "smk_s",
        "var_num",
        F.round(F.expr("CAST(var_num AS DOUBLE) / 18.0"), 6).alias("var_s"),
        F.round(
            F.expr(
                "CASE WHEN smk_s = 0 THEN 0.0"
                " ELSE (smk_s - CASE WHEN smk_s > 0 THEN 1 ELSE -1 END)"
                " / SQRT(CAST(var_num AS DOUBLE) / 18.0) END"
            ),
            6,
        ).alias("z"),
    )
