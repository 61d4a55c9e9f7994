"""Table-format / layout / maintenance operators: versioned tables, CDC, MERGE, compaction, audits.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


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
    "q90_salted_join_totals",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS user_total_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           CAST(d.user_total_cents AS BIGINT) AS user_total_cents
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
    "q142_order_reconciliation",
    oracle=f"""
    WITH line_sums AS (
      SELECT l_orderkey,
             SUM({sql_charge_cents()}) AS line_cents
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
    line_cents = charge_cents()
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
    # ONE events pass (round 10, guide §2.4): the union of the dim-change
    # branch (needs the lag window) and the facts branch previously
    # scanned events twice and exchanged twice (dim's window + the
    # union's carry window). Instead, compute the lag once and let each
    # row EMIT 0-2 tagged rows (its dim-change row, its fact row) via a
    # 2-element filtered explode; explode preserves the user_id hash
    # partitioning, so the carry window below reuses the SAME exchange —
    # 2 scans -> 1, 2 exchanges -> 1. Row set and sort keys are identical
    # to the union form.
    is_dim = F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type"))
    is_fact = F.col("event_id") % 10 == 7
    emit = F.array(
        F.struct(
            F.lit(0).alias("_src"),
            F.col("event_type").alias("_state"),
            F.lit(None).cast("double").alias("value"),
            is_dim.alias("_keep"),
        ),
        F.struct(
            F.lit(1).alias("_src"),
            F.lit(None).cast("string").alias("_state"),
            F.col("value").alias("value"),
            is_fact.alias("_keep"),
        ),
    )
    tagged = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.explode(F.filter(emit, lambda x: x["_keep"])).alias("_e"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("_e._src").alias("_src"),
            F.col("_e._state").alias("_state"),
            F.col("_e.value").alias("value"),
        )
    )
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



@register(
    "q306_shard_balance_audit",
    oracle="""
    WITH sh AS (
      SELECT CAST(((doc_id % 2147483648) * 2654435761 + 1013904223)
                  % 4294967291 % 16
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
    # doc_id pre-reduced mod 2^31 so the prime multiply stays in int64
    shard = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
         + F.lit(1013904223))
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



@register(
    "q489_consistent_hash_shards",
    allow_non_equi=(
        "deliberate bounded cross join of the doc-hash relation with "
        "the 72-row broadcast virtual-node ring - group-cardinality, "
        "never row-level"
    ),
    oracle="""
    WITH ring AS (
      SELECT s.s AS s, v.v AS v,
             CAST(concat('0x', substr(md5(concat('ring|',
                  CAST(s.s AS VARCHAR), '|', CAST(v.v AS VARCHAR))),
                  1, 13)) AS BIGINT) AS vpos
      FROM range(0, 9) s(s) CROSS JOIN range(0, 8) v(v)
    ), docs AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('doc|',
                  CAST(doc_id AS VARCHAR))), 1, 13)) AS BIGINT) AS dpos
      FROM documents
    ), deltas AS (
      SELECT d.doc_id, r.s, r.v,
             ((r.vpos - d.dpos) % 4503599627370496
              + 4503599627370496) % 4503599627370496 AS delta
      FROM docs d CROSS JOIN ring r
    ), assign AS (
      SELECT doc_id,
             MIN(CASE WHEN s < 8 THEN delta * 256 + s * 8 + v END) AS kb,
             MIN(delta * 256 + s * 8 + v) AS ka
      FROM deltas GROUP BY doc_id
    ), sd AS (
      SELECT doc_id,
             (kb % 256) // 8 AS sb,
             (ka % 256) // 8 AS sa
      FROM assign
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sd),
    after AS (
      SELECT sa AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_after,
             CAST(SUM(CASE WHEN sb <> sa THEN 1 ELSE 0 END) AS BIGINT)
               AS moved_in
      FROM sd GROUP BY sa
    ), before AS (
      SELECT sb AS shard, CAST(COUNT(*) AS BIGINT) AS n_before
      FROM sd GROUP BY sb
    )
    SELECT a.shard, COALESCE(b.n_before, 0) AS n_before, a.n_after,
           a.moved_in,
           CAST(a.n_after * 1000000 // t.n_docs AS BIGINT)
             AS load_after_ppm
    FROM after a LEFT JOIN before b ON b.shard = a.shard
    CROSS JOIN tot t
    ORDER BY a.shard
    """,
)
def q489_consistent_hash_shards(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X419 — CONSISTENT-HASHING SHARD PLANNER with virtual nodes
    (Karger et al. 1997): documents placed on a 2⁵² md5 ring against
    8 shards × 8 vnodes, then the ring re-evaluated WITH A 9TH SHARD
    ADDED — per shard: load before/after, ppm load factor, and
    moved_in, which makes consistent hashing's defining invariant
    VISIBLE IN THE OUTPUT (only the new shard may gain docs;
    moved_in = 0 on shards 0–7, ~1/9 of the corpus lands on shard 8).
    This is the data-placement layer a 100 TB lakehouse rebalances
    with — add capacity without reshuffling the world. Successor
    lookup is relational: min over the 72-row ring of the sign-safe
    clockwise distance, tie-broken by (shard, vnode) inside one
    packed int64 key (delta·256 + s·8 + v) so both engines pick the
    identical vnode bit-for-bit.

    Scale: |docs|×72 rows through ONE map-side-combinable min
    aggregate (the ring broadcasts); everything downstream is
    shard-grain."""
    docs = load(spark, sf_dir, "documents")
    ring = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("s"),
                        F.lit(v).cast("long").alias("v"),
                    )
                    for s in range(9)
                    for v in range(8)
                ]
            )
        ).alias("r")
    ).select("r.s", "r.v").withColumn(
        "vpos",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ring|"),
                        F.col("s").cast("string"),
                        F.lit("|"),
                        F.col("v").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long"),
    )
    d = docs.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("doc|"), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("dpos"),
    )
    M = 4503599627370496
    deltas = d.join(F.broadcast(ring)).select(
        "doc_id",
        "s",
        "v",
        (
            F.pmod(F.col("vpos") - F.col("dpos"), F.lit(M))
        ).alias("delta"),
    )
    key = F.col("delta") * 256 + F.col("s") * 8 + F.col("v")
    assign = deltas.groupBy("doc_id").agg(
        F.min(F.when(F.col("s") < 8, key)).alias("kb"),
        F.min(key).alias("ka"),
    )
    sd = assign.select(
        F.expr("(kb % 256) DIV 8").alias("sb"),
        F.expr("(ka % 256) DIV 8").alias("sa"),
    )
    tot = sd.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    after = sd.groupBy(F.col("sa").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(F.when(F.col("sb") != F.col("sa"), 1).otherwise(0))
        .cast("long")
        .alias("moved_in"),
    )
    before = sd.groupBy(F.col("sb").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    return (
        after.join(before, "shard", "left")
        .join(F.broadcast(tot))
        .select(
            "shard",
            F.coalesce(F.col("n_before"), F.lit(0))
            .cast("long")
            .alias("n_before"),
            "n_after",
            "moved_in",
            F.expr("CAST(n_after * 1000000 DIV n_docs AS BIGINT)").alias(
                "load_after_ppm"
            ),
        )
        .orderBy("shard")
    )


@register(
    "q498_shuffle_partition_advisor",
    oracle="""
    WITH li AS (
      SELECT 'lineitem' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) * 68
                  + SUM(length(l_returnflag) + length(l_linestatus))
                  AS BIGINT) AS est_bytes
      FROM lineitem
    ), o AS (
      SELECT 'orders', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) * 32
                  + SUM(length(o_orderstatus) + length(o_orderpriority))
                  AS BIGINT)
      FROM orders
    ), ev AS (
      SELECT 'events', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) * 32
                  + SUM(length(event_type) + length(props)) AS BIGINT)
      FROM events
    ), d AS (
      SELECT 'documents', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) * 16
                  + SUM(n_chars + length(lang) + length(source))
                  AS BIGINT)
      FROM documents
    ), em AS (
      SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) * (8 + 64 * 4) AS BIGINT)
      FROM embeddings
    ), u AS (
      SELECT * FROM li UNION ALL SELECT * FROM o
      UNION ALL SELECT * FROM ev UNION ALL SELECT * FROM d
      UNION ALL SELECT * FROM em
    )
    SELECT table_name, n_rows, est_bytes,
           CAST((est_bytes + 134217727) // 134217728 AS BIGINT)
             AS rec_shuffle_partitions,
           CAST((est_bytes + 134217727) // 134217728 AS BIGINT)
             AS rec_files_128mb,
           CAST(est_bytes // GREATEST(n_rows, 1) AS BIGINT)
             AS est_row_bytes
    FROM u ORDER BY table_name
    """,
)
def q498_shuffle_partition_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X428 — SHUFFLE-PARTITION / FILE-COUNT ADVISOR: per table, the
    in-memory byte estimate from the data itself (exact row counts ×
    fixed column widths + exact string-length sums — the arithmetic a
    planner does from catalog stats) and the recommended
    ``spark.sql.shuffle.partitions`` / output-file count for the 128 MB
    target, as integer ceiling division (x+M−1) DIV M — no float, no
    CEIL boundary. The fourth engine-design-as-a-query member
    (q485/q488/q496): the tuning rule this repo applies by hand
    ("size shuffle partitions so partitions fit in executor memory at
    the target SF") expressed as a first-class query that scales its
    answer WITH the data — at sf0.01 everything says 1; at 100 TB
    lineitem says tens of thousands, which is the point.

    Scale: five single-pass aggregates (count + length sums); 5 rows."""
    def est(df, name, fixed, strcols):
        slen = (
            sum((F.sum(F.length(c)) for c in strcols), F.lit(0))
            if strcols
            else F.lit(0)
        )
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) * fixed + slen).cast("long").alias(
                "est_bytes"
            ),
        ).select(F.lit(name).alias("table_name"), "n_rows", "est_bytes")

    li = est(
        load(spark, sf_dir, "lineitem"), "lineitem", 68,
        ["l_returnflag", "l_linestatus"],
    )
    o = est(
        load(spark, sf_dir, "orders"), "orders", 32,
        ["o_orderstatus", "o_orderpriority"],
    )
    ev = est(
        load(spark, sf_dir, "events"), "events", 32,
        ["event_type", "props"],
    )
    docs = load(spark, sf_dir, "documents")
    d = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (
            F.count(F.lit(1)) * 16
            + F.sum(
                F.col("n_chars") + F.length("lang") + F.length("source")
            )
        )
        .cast("long")
        .alias("est_bytes"),
    ).select(F.lit("documents").alias("table_name"), "n_rows", "est_bytes")
    em = (
        load(spark, sf_dir, "embeddings")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.lit("embeddings").alias("table_name"),
            "n_rows",
            (F.col("n_rows") * (8 + 64 * 4)).cast("long").alias("est_bytes"),
        )
    )
    u = li.unionByName(o).unionByName(ev).unionByName(d).unionByName(em)
    ceil_div = "CAST((est_bytes + 134217727) DIV 134217728 AS BIGINT)"
    return u.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.expr(ceil_div).alias("rec_shuffle_partitions"),
        F.expr(ceil_div).alias("rec_files_128mb"),
        F.expr("CAST(est_bytes DIV GREATEST(n_rows, 1) AS BIGINT)").alias(
            "est_row_bytes"
        ),
    ).orderBy("table_name")


@register(
    "q508_shuffle_interleave_audit",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source,
             ((doc_id * 31 + 1) % 2147483648) * 2654435761 % 4294967296
               AS shuffle_key
      FROM documents
    ), sh AS (
      SELECT doc_id, source, shuffle_key,
             CAST(shuffle_key % 8 AS BIGINT) AS shard
      FROM keyed
    ), flagged AS (
      SELECT shard, source, shuffle_key, doc_id,
             CASE WHEN LAG(source) OVER (PARTITION BY shard
                        ORDER BY shuffle_key, doc_id) IS DISTINCT FROM source
                  THEN 1 ELSE 0 END AS chg
      FROM sh
    ), runs0 AS (
      SELECT shard, source,
             SUM(chg) OVER (PARTITION BY shard
                            ORDER BY shuffle_key, doc_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), runs AS (
      SELECT shard, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM runs0 GROUP BY shard, run_id
    ), per_shard_runs AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_runs,
             CAST(MAX(run_len) AS BIGINT) AS longest_run
      FROM runs GROUP BY shard
    ), src_counts AS (
      SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS ns
      FROM sh GROUP BY shard, source
    ), per_shard AS (
      SELECT shard, CAST(SUM(ns) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(SUM(ns * (ns - 1)) AS BIGINT) AS pair_mass
      FROM src_counts GROUP BY shard
    )
    SELECT p.shard, p.n_docs, p.n_sources, r.n_runs, r.longest_run,
           CAST(p.n_docs - r.n_runs AS BIGINT) AS adj_same_observed,
           CAST(p.pair_mass * 1000 // p.n_docs AS BIGINT)
             AS adj_same_expected_milli
    FROM per_shard p JOIN per_shard_runs r USING (shard)
    ORDER BY p.shard
    """,
)
def q508_shuffle_interleave_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X436 — SHUFFLE INTERLEAVE AUDIT of the training shard order: did
    the deterministic corpus shuffle (q270's Knuth multiplicative key,
    epoch 0) actually interleave sources within each shard, or does a
    skewed hash leave same-source documents clumped? Per shard: run
    statistics of the source sequence in shard order (run count,
    longest same-source run, observed same-source adjacencies) against
    the EXACT expectation under a uniform random permutation,
    E[adjacent same-source pairs] = Σ_s n_s(n_s−1)/n, published in
    exact integer milli-units (pair_mass·1000 DIV n — no float). A
    shard whose observed adjacency far exceeds expectation feeds
    correlated batches to the trainer (the data-ordering pathology
    curriculum/shuffle papers warn about); q270 builds the order, this
    audits it.

    Scale: shard = key mod k is one hash partition; the within-shard
    order ((shuffle_key, doc_id)) is the order a shard manifest is
    WRITTEN in anyway, so the run window rides the exchange the sink
    already needs (repartition + sortWithinPartitions, the O1 shape) —
    no extra shuffle at any corpus size. Run lengths come from one
    prefix-sum window + a (shard, run) count; everything else is
    (shard, source)-grain integer math."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        (
            ((F.col("doc_id") * 31 + 1) % F.lit(2147483648))
            * F.lit(2654435761)
            % F.lit(4294967296)
        ).alias("shuffle_key"),
    ).withColumn("shard", (F.col("shuffle_key") % 8).cast("long"))
    worder = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    flagged = sh.withColumn(
        "chg",
        F.when(
            ~F.lag("source").over(worder).eqNullSafe(F.col("source")), 1
        ).otherwise(0),
    )
    runs0 = flagged.withColumn(
        "run_id",
        F.sum("chg").over(
            worder.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = runs0.groupBy("shard", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    per_shard_runs = runs.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("longest_run"),
    )
    src_counts = sh.groupBy("shard", "source").agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    )
    per_shard = src_counts.groupBy("shard").agg(
        F.sum("ns").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum(F.col("ns") * (F.col("ns") - 1)).cast("long").alias(
            "pair_mass"
        ),
    )
    return (
        per_shard.join(per_shard_runs, "shard")
        .select(
            "shard",
            "n_docs",
            "n_sources",
            "n_runs",
            "longest_run",
            (F.col("n_docs") - F.col("n_runs")).cast("long").alias(
                "adj_same_observed"
            ),
            F.expr("CAST(pair_mass * 1000 DIV n_docs AS BIGINT)").alias(
                "adj_same_expected_milli"
            ),
        )
        .orderBy("shard")
    )
