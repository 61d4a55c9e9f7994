"""Spatial / trajectory / AIS-domain operators.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


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



@register(
    "q101_custom_source_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
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
    ps = _lit_spine(spark, "p", [50, 90, 99])
    return withn.join(
        F.broadcast(ps),
        F.col("rk") == F.ceil(F.col("p") * F.col("n") / 100.0).cast("long"),
    ).select("p", F.col("v_cents").cast("long").alias("value_cents"))


# ---------------------------------------------------------------------------
# Training-data planning: data-constrained epochs, shard balance, OOV,
# truncation, timestamp delta compression (q305-q309)
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
    "q414_tile_pyramid",
    oracle=_COORDS_CTE.rstrip()
    + f""",
    t6 AS (
      SELECT {_TILE_X6_EXPR} AS x, {_TILE_Y6_EXPR} AS y,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
      FROM coords GROUP BY 1, 2
    ), t5 AS (
      SELECT x // 2 AS x, y // 2 AS y,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(MAX(users) AS BIGINT) AS max_child_users
      FROM t6 GROUP BY 1, 2
    ), t4 AS (
      SELECT x // 2 AS x, y // 2 AS y,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(MAX(max_child_users) AS BIGINT) AS max_child_users
      FROM t5 GROUP BY 1, 2
    )
    SELECT CAST(6 AS BIGINT) AS zoom, x, y, n,
           users AS max_child_users FROM t6
    UNION ALL
    SELECT CAST(5 AS BIGINT), x, y, n, max_child_users FROM t5
    UNION ALL
    SELECT CAST(4 AS BIGINT), x, y, n, max_child_users FROM t4
    """,
)
def q414_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X344 — WEB-MERCATOR TILE PYRAMID (slippy-map z/x/y rollup, zooms
    6→4): events aggregate ONCE at the finest zoom via the shared-text
    mercator projection (tan/ln on clamped latitude — module-level
    expression both engines evaluate verbatim), and every coarser zoom
    folds the CHILD TILE table with integer x//2, y//2 parent keys —
    4 child rows per parent, never a re-scan of events. This is how a
    density tile server (heatmap basemaps, AIS traffic maps) builds its
    pyramid: one O(|events|) pass, then O(|tiles|) per zoom level, with
    exact counts at every level because parents sum child INTEGERS.
    max_child_users carries the finest-grain distinct-user count up the
    pyramid as a hotness bound (distinct counts don't sum; the bound is
    the honest mergeable statistic).

    Scale: one map-side-combinable aggregate at tile-6 grain (<= 64×64
    cells), then two constant-size folds; the only per-event work is
    the projection expression inside whole-stage codegen."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    t6 = (
        ev.withColumn("x", F.expr(_TILE_X6_EXPR))
        .withColumn("y", F.expr(_TILE_Y6_EXPR))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("users"),
        )
    )
    t5 = (
        t6.groupBy(
            (F.col("x") / 2).cast("long").alias("x"),
            (F.col("y") / 2).cast("long").alias("y"),
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.max("users").cast("long").alias("max_child_users"),
        )
    )
    t4 = (
        t5.groupBy(
            (F.col("x") / 2).cast("long").alias("x"),
            (F.col("y") / 2).cast("long").alias("y"),
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.max("max_child_users").cast("long").alias("max_child_users"),
        )
    )
    return (
        t6.select(
            F.lit(6).cast("long").alias("zoom"),
            "x",
            "y",
            "n",
            F.col("users").alias("max_child_users"),
        )
        .unionByName(
            t5.select(F.lit(5).cast("long").alias("zoom"), "x", "y", "n", "max_child_users")
        )
        .unionByName(
            t4.select(F.lit(4).cast("long").alias("zoom"), "x", "y", "n", "max_child_users")
        )
    )



@register(
    "q416_pinball_quantile_eval",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ts AS DATE) AS day, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ), ranked AS (
      SELECT event_type, day, vc,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY vc, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type, day) AS n
      FROM v
    ), q90 AS (
      SELECT event_type, day, vc AS q_cents
      FROM ranked WHERE rk = (9 * n + 9) // 10
    ), fc AS (
      SELECT event_type, day,
             LAG(q_cents) OVER (PARTITION BY event_type ORDER BY day)
               AS q_prev
      FROM q90
    ), scored AS (
      SELECT v.event_type, v.vc, f.q_prev,
             GREATEST(9 * (v.vc - f.q_prev), f.q_prev - v.vc) AS pb_x10,
             CASE WHEN v.vc <= f.q_prev THEN 1 ELSE 0 END AS covered
      FROM v JOIN fc f
        ON f.event_type = v.event_type AND f.day = v.day
      WHERE f.q_prev IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(pb_x10) AS DOUBLE) / (10.0 * COUNT(*)), 6)
             AS pinball_loss_cents,
           ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scored GROUP BY event_type
    """,
)
def q416_pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X346 — QUANTILE-FORECAST EVALUATION with PINBALL LOSS (the
    M5/GEFCom quantile-scoring rule) at τ=0.9: yesterday's exact
    per-type P90 is today's quantile forecast, and each event scores
    max(τ·(y−q), (τ−1)·(y−q)) — the proper scoring rule for quantiles
    (complements q317's point-forecast MAE backtest and q233's
    conformal intervals: this grades a QUANTILE claim, with COVERAGE
    alongside to read calibration — coverage ≈ 0.9 means the P90
    claim is honest). Exact end to end: the P90 is a counting quantile
    at rank ceil(0.9n) computed as (9n+9)//10 in INTEGER arithmetic
    (0.9·n in IEEE doubles rounds 27 up to 27.000…004 — ceil would be
    OFF BY ONE for every n divisible by 10), and the loss is
    accumulated in deci-cent int64 (τ=0.9 → max(9Δ, −Δ) over Δ in
    cents), so only the two published ratios are float.

    Scale: one (type, day)-partitioned window for the quantile, a lag
    at (type, day) GRAIN (bounded), and a broadcast join of that tiny
    forecast table back onto events; integer sums map-side combine."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "event_id",
        cents(F.col("value")).alias("vc"),
    )
    wtd = Window.partitionBy("event_type", "day")
    ranked = v.select(
        "event_type",
        "day",
        "vc",
        F.row_number().over(wtd.orderBy("vc", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(wtd).alias("n"),
    )
    q90 = ranked.filter(
        F.col("rk") == F.expr("(9 * n + 9) DIV 10")
    ).select("event_type", "day", F.col("vc").alias("q_cents"))
    fc = q90.select(
        "event_type",
        "day",
        F.lag("q_cents")
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("q_prev"),
    ).filter(F.col("q_prev").isNotNull())
    scored = v.join(F.broadcast(fc), ["event_type", "day"]).select(
        "event_type",
        F.greatest(
            9 * (F.col("vc") - F.col("q_prev")),
            F.col("q_prev") - F.col("vc"),
        ).alias("pb_x10"),
        F.when(F.col("vc") <= F.col("q_prev"), 1).otherwise(0).alias("covered"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("pb_x10").cast("double") / (10.0 * F.count(F.lit(1))), 6
        ).alias("pinball_loss_cents"),
        F.round(
            F.sum("covered").cast("double") / F.count(F.lit(1)), 6
        ).alias("coverage"),
    )



@register("q422_hilbert_layout_audit", oracle=_hilbert_oracle())
def q422_hilbert_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X352 — HILBERT-CURVE vs MORTON layout audit: every event's
    coordinate maps onto a 1024×1024 grid, its 20-bit Hilbert index is
    composed by FIVE BROADCAST EQUI-JOINS against the 64-row 2-bit
    block automaton (HILBERT_LUT_2BIT in functions/spatial.py — the 4
    curve orientations, derived offline from the standard xy2d
    recurrence and pinned exhaustively by tests/test_hilbert_lut.py),
    both orders bucket into 64 equal key ranges, and each bucket
    publishes its bounding-box AREA — Hilbert's buckets bound tighter
    boxes than Morton's Z-diagonal jumps, which is the measurable
    reason Hilbert clustering beats Z-order (q283/q335's audits) for
    range scans. The LUT-join form is deliberate engine craft: the
    textbook loop-carried recurrence unrolled into 10 chained
    projections EXPLODES Catalyst (each round references (x, y, d)
    ~7×, projection collapse makes the expression tree 7^10 nodes —
    measured driver OOM), while byte-at-a-time LUT composition is how
    production systems evaluate space-filling curves anyway: the
    per-round state is one join key, the plan is 5 BroadcastHashJoins,
    and nothing grows with round count.

    Scale: 5 broadcast joins against a 64-row LUT (no shuffle until
    the two 64-bucket aggregates); the full-outer join joins two
    64-row profiles."""
    from noaa_ais_glue_lakehouse_spark.functions.spatial import (
        HILBERT_LUT_2BIT,
    )

    ev = _with_coords(load(spark, sf_dir, "events"))
    lut = spark.createDataFrame(
        list(HILBERT_LUT_2BIT), "st long, bx long, by long, dd long, ns long"
    )
    cur = ev.select(
        F.least(
            F.floor((F.col("lon") + 180.0) / 360.0 * 1024.0).cast("long"),
            F.lit(1023),
        ).alias("xi"),
        F.least(
            F.floor((F.col("lat") + 90.0) / 180.0 * 1024.0).cast("long"),
            F.lit(1023),
        ).alias("yi"),
        F.lit(0).cast("long").alias("d"),
        F.lit(0).cast("long").alias("st"),
    )
    for blk in range(5):
        sh = 8 - 2 * blk
        cur = (
            cur.withColumn("bx", F.expr(f"shiftright(xi, {sh}) & 3"))
            .withColumn("by", F.expr(f"shiftright(yi, {sh}) & 3"))
            .join(F.broadcast(lut), ["st", "bx", "by"])
            .select(
                "xi",
                "yi",
                (F.col("d") * 16 + F.col("dd")).alias("d"),
                F.col("ns").alias("st"),
            )
        )
    keyed = cur.select(
        F.expr("d DIV 16384").alias("hb"),
        F.expr(f"({_MORTON20_SQL}) DIV 16384").alias("mb"),
        "xi",
        "yi",
    )
    h = keyed.groupBy(F.col("hb").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_hilbert"),
        ((F.max("xi") - F.min("xi") + 1) * (F.max("yi") - F.min("yi") + 1))
        .cast("long")
        .alias("hilbert_bbox_area"),
    )
    m = keyed.groupBy(F.col("mb").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_morton"),
        ((F.max("xi") - F.min("xi") + 1) * (F.max("yi") - F.min("yi") + 1))
        .cast("long")
        .alias("morton_bbox_area"),
    )
    return h.join(m, "bucket", "full_outer").select(
        "bucket",
        "n_hilbert",
        "hilbert_bbox_area",
        "n_morton",
        "morton_bbox_area",
    )




@register(
    "q519_rayleigh_bearing_test",
    oracle=_COORDS_CTE
    + """
    , legs AS (
      SELECT user_id, ts, event_id,
             ATAN2(
               SIN(RADIANS(lon - LAG(lon) OVER w)) * COS(RADIANS(lat)),
               COS(RADIANS(LAG(lat) OVER w)) * SIN(RADIANS(lat))
                 - SIN(RADIANS(LAG(lat) OVER w)) * COS(RADIANS(lat))
                   * COS(RADIANS(lon - LAG(lon) OVER w))
             ) AS theta
      FROM coords
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), folds AS (
      SELECT user_id,
             SUM(COS(theta)) OVER v AS run_c,
             SUM(SIN(theta)) OVER v AS run_s,
             ROW_NUMBER() OVER v AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM legs WHERE theta IS NOT NULL
      WINDOW v AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ), fin AS (
      SELECT user_id, CAST(n AS BIGINT) AS n_bearings,
             SQRT(run_c * run_c + run_s * run_s) / n AS r_bar,
             ATAN2(run_s, run_c) AS mean_dir,
             n * (run_c * run_c + run_s * run_s) / (CAST(n AS DOUBLE) * n)
               AS z
      FROM folds WHERE rn = n AND n >= 5
    )
    SELECT user_id, n_bearings,
           ROUND(r_bar, 6) AS r_bar, ROUND(mean_dir, 6) AS mean_dir,
           ROUND(z, 6) AS rayleigh_z,
           ROUND(EXP(-z) * (1.0 + (2.0 * z - z * z) / (4.0 * n_bearings)
             - (24.0 * z - 132.0 * z * z + 76.0 * POW(z, 3.0)
                - 9.0 * POW(z, 4.0))
               / (288.0 * CAST(n_bearings AS DOUBLE) * n_bearings)), 8)
             AS p_approx
    FROM fin
    """,
)
def q519_rayleigh_bearing_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X447 — RAYLEIGH TEST of bearing uniformity per user: circular
    statistics over each user's leg bearings (the q313 atan2 formula,
    kept in radians) — mean resultant length R-bar, circular mean
    direction, and the Rayleigh statistic z = n*R-bar^2 with Zar's
    small-n series for the p-value. R-bar near 0 = headings uniform
    (random wander); near 1 = a directed track — the circular-data
    complement to q354's straightness index, which measures
    displacement, not heading concentration.

    Portability: SUM(COS)/SUM(SIN) over doubles is order-sensitive, so
    both resultant components ride a DETERMINISTIC ordered fold (per-
    user running sum in (ts, event_id) order; the rn = n row is the
    total) — the same sequential accumulation in both engines.  All
    downstream scalars are closed forms of (run_c, run_s, n) with
    identical text.

    Scale: one shuffle on user_id; every window shares that partition.
    Per-user state is two doubles — no pairwise work anywhere."""
    ev = _with_coords(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dlon = F.radians(F.col("lon") - F.lag("lon").over(w))
    plat = F.radians(F.lag("lat").over(w))
    clat = F.radians(F.col("lat"))
    theta = F.atan2(
        F.sin(dlon) * F.cos(clat),
        F.cos(plat) * F.sin(clat)
        - F.sin(plat) * F.cos(clat) * F.cos(dlon),
    )
    legs = ev.select(
        "user_id", "ts", "event_id", theta.alias("theta")
    ).filter(F.col("theta").isNotNull())
    v = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    folds = legs.select(
        "user_id",
        F.sum(F.cos("theta")).over(v).alias("run_c"),
        F.sum(F.sin("theta")).over(v).alias("run_s"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    fin = folds.where("rn = n AND n >= 5").select(
        "user_id",
        F.col("n").cast("long").alias("n_bearings"),
        F.expr("SQRT(run_c * run_c + run_s * run_s) / n").alias("r_bar"),
        F.expr("ATAN2(run_s, run_c)").alias("mean_dir"),
        F.expr(
            "n * (run_c * run_c + run_s * run_s)"
            " / (CAST(n AS DOUBLE) * n)"
        ).alias("z"),
    )
    return fin.select(
        "user_id",
        "n_bearings",
        F.round("r_bar", 6).alias("r_bar"),
        F.round("mean_dir", 6).alias("mean_dir"),
        F.round("z", 6).alias("rayleigh_z"),
        F.round(
            F.expr(
                "EXP(-z) * (1.0 + (2.0 * z - z * z) / (4.0 * n_bearings)"
                " - (24.0 * z - 132.0 * z * z + 76.0 * POW(z, 3.0)"
                " - 9.0 * POW(z, 4.0))"
                " / (288.0 * CAST(n_bearings AS DOUBLE) * n_bearings))"
            ),
            8,
        ).alias("p_approx"),
    )
