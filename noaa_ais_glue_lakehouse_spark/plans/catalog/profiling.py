"""Schema-profiling audits: approximate functional-dependency and
inclusion-dependency (foreign-key) discovery over the lakehouse tables
(round-10 module).

A 100 TB lake accumulates tables whose constraints are undocumented;
FD/IND discovery is the profiling layer (Papenbrock et al., "Functional
Dependency Discovery", VLDB'15; the g3 error measure is Kivinen &
Mannila's) that tells a pipeline author which joins are safe, which
keys are really keys, and how dirty a "should-be-FD" column pair is.
Both audits are pure key-grain aggregations — every candidate is one
hash shuffle on its LHS, so the plans scale exactly like the exact-
dedup family.

The reference repo has no profiling layer; this is beyond-reference
surface mandated by the brief's training-data-pipeline scope.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403

# Candidate FDs A -> B: (label, table, lhs, rhs). Mix of true FDs
# (nation's key) and deliberately-false ones whose g3 DEGREE is the
# interesting output (how many rows must be removed for the FD to hold).
_FD_CANDIDATES = [
    ("nation.n_nationkey->n_regionkey", "nation", "n_nationkey",
     "n_regionkey"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey",
     "l_suppkey"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
    ("documents.source->lang", "documents", "source", "lang"),
]


def _fd_sql(label: str, table: str, a: str, b: str) -> str:
    return f"""
    SELECT '{label}' AS fd,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(cnt) - SUM(mx) AS BIGINT) AS rows_to_remove,
           CAST(((SUM(cnt) - SUM(mx)) * 1000000) {{div}} SUM(cnt) AS BIGINT)
             AS g3_ppm
    FROM (
      SELECT {a} AS av, COUNT(*) AS nb, SUM(c) AS cnt, MAX(c) AS mx
      FROM (SELECT {a}, {b}, COUNT(*) AS c FROM {table} GROUP BY {a}, {b})
      GROUP BY {a}
    )
    """


@register(
    "q517_fd_violation_audit",
    oracle=" UNION ALL ".join(
        _fd_sql(*cand).format(div="//") for cand in _FD_CANDIDATES
    ),
)
def q517_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X445 — APPROXIMATE FUNCTIONAL-DEPENDENCY audit over five
    candidate A→B pairs: per candidate, the distinct-LHS group count,
    how many groups see >1 distinct RHS value, and the exact g3 error
    (minimum rows to delete so the FD holds = n − Σ_A max_B |A,B|,
    Kivinen–Mannila) as an integer-division ppm. nation's key FD reads
    0; the deliberately-false candidates (does a customer always order
    at the same priority? does a user emit one event type?) read their
    true violation DEGREE — the profiling signal that decides whether a
    column is usable as a dedup/partition key.

    Exactness: all counts int64; g3_ppm is pure integer division, no
    doubles anywhere. Scale: each candidate is two map-side-combining
    hash aggregations on its LHS key — the same shape as exact dedup
    (q25); candidates are independent and union at 1-row grain."""
    parts = []
    for label, table, a, b in _FD_CANDIDATES:
        t = load(spark, sf_dir, table)
        cell = t.groupBy(F.col(a).alias("av"), F.col(b).alias("bv")).agg(
            F.count(F.lit(1)).alias("c")
        )
        grp = cell.groupBy("av").agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("c").alias("cnt"),
            F.max("c").alias("mx"),
        )
        parts.append(
            grp.agg(
                F.lit(label).alias("fd"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("nb") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
                (F.sum("cnt") - F.sum("mx")).cast("long").alias(
                    "rows_to_remove"
                ),
                F.expr(
                    "CAST(((SUM(cnt) - SUM(mx)) * 1000000) DIV SUM(cnt)"
                    " AS BIGINT)"
                ).alias("g3_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Candidate INDs lhs_col ⊆ rhs_col: (label, lhs_table, lhs_col,
# rhs_table, rhs_col). True TPC-H FKs plus two partial/reversed probes.
_IND_CANDIDATES = [
    ("lineitem.l_orderkey<=orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey<=part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey<=supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey<=customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey<=nation.n_nationkey", "customer",
     "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id<=customer.c_custkey", "events", "user_id",
     "customer", "c_custkey"),
    ("orders.o_orderkey<=lineitem.l_orderkey", "orders", "o_orderkey",
     "lineitem", "l_orderkey"),
]


def _ind_sql(label, lt, lc, rt, rc) -> str:
    return f"""
    SELECT '{label}' AS ind,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_lhs,
           CAST(SUM(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contained,
           CAST((SUM(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
                {{div}} COUNT(*) AS BIGINT) AS containment_ppm,
           CAST(SUM(cnt) AS BIGINT) AS n_rows_lhs,
           CAST(SUM(CASE WHEN rv IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT)
             AS n_rows_contained,
           CAST((SUM(CASE WHEN rv IS NOT NULL THEN cnt ELSE 0 END) * 1000000)
                {{div}} SUM(cnt) AS BIGINT) AS row_containment_ppm
    FROM (
      SELECT l.v, l.cnt, r.rv
      FROM (SELECT {lc} AS v, COUNT(*) AS cnt FROM {lt} GROUP BY {lc}) l
      LEFT JOIN (SELECT DISTINCT {rc} AS rv FROM {rt}) r ON l.v = r.rv
    )
    """


@register(
    "q518_inclusion_dependency_audit",
    oracle=" UNION ALL ".join(
        _ind_sql(*cand).format(div="//") for cand in _IND_CANDIDATES
    ),
)
def q518_inclusion_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X446 — INCLUSION-DEPENDENCY (foreign-key discovery) audit over
    seven candidate column pairs: distinct-grain containment (how many
    distinct LHS values exist in the RHS column) and row-weighted
    containment, both as exact integer-division ppm. The five true
    TPC-H FKs read 1e6; ``events.user_id ⊆ customer.c_custkey`` reads
    its true partial overlap, and the reversed
    ``o_orderkey ⊆ l_orderkey`` probe surfaces orders with no
    lineitems. This is the audit a pipeline runs before trusting a
    join: a sub-1e6 FK means an inner join silently drops facts.

    Exactness: int64 counts + integer-division ppm only. Scale: each
    candidate aggregates both sides to DISTINCT-KEY grain first (map-
    side combine), then one equi left-join at key grain — dims end up
    broadcast by AQE, fact-fact key joins shuffle on the key hash; no
    row-grain join anywhere."""
    parts = []
    for label, lt, lc, rt, rc in _IND_CANDIDATES:
        lhs = (
            load(spark, sf_dir, lt)
            .groupBy(F.col(lc).alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        rhs = (
            load(spark, sf_dir, rt)
            .select(F.col(rc).alias("rv"))
            .distinct()
        )
        j = lhs.join(rhs, F.col("v") == F.col("rv"), "left")
        parts.append(
            j.agg(
                F.lit(label).alias("ind"),
                F.count(F.lit(1)).cast("long").alias("n_distinct_lhs"),
                F.sum(F.when(F.col("rv").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_contained"),
                F.expr(
                    "CAST((SUM(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END)"
                    " * 1000000) DIV COUNT(*) AS BIGINT)"
                ).alias("containment_ppm"),
                F.sum("cnt").cast("long").alias("n_rows_lhs"),
                F.sum(F.when(F.col("rv").isNotNull(), F.col("cnt"))
                      .otherwise(0))
                .cast("long")
                .alias("n_rows_contained"),
                F.expr(
                    "CAST((SUM(CASE WHEN rv IS NOT NULL THEN cnt ELSE 0 END)"
                    " * 1000000) DIV SUM(cnt) AS BIGINT)"
                ).alias("row_containment_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
