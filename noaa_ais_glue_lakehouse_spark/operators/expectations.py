"""Declarative data-quality expectations (Deequ/dbt-test shape): a rule
set evaluated over a table in ONE aggregation pass, producing a per-rule
violations report — the quality gate a lakehouse runs on every ingest
before publishing a partition.

Extends the reference's ad-hoc validation (coordinate quarantine,
``utils/common_functions_raw.py:73-92``; Athena row-count checks,
``eda/reports/athena_row_count_check.md``) into a composable engine:

- each rule contributes a violation-count expression (a conditional sum),
  so N rules cost one scan + one 1-row aggregate, not N jobs;
- ``unique`` rules need a distinct count and ride the same scan via
  ``count_distinct``;
- ``foreign_key`` rules join a (small, broadcast) dimension — counted as
  unmatched keys;
- ``check()`` returns the report; ``quarantine()`` splits the violating
  ROWS (any row-level rule) from the clean ones, the S6 side-output
  generalized.

Scale shape: the report is map-side-combinable conditional aggregation —
one pass over the fact regardless of rule count; FK probes broadcast the
dimension key set. Nothing is collected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, in_range, matches, in_set,
    unique, foreign_key}; row-level kinds contribute a per-row violation
    predicate, table-level kinds (unique) a dedicated aggregate."""

    name: str
    kind: str
    col: str
    params: dict = field(default_factory=dict)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"{col}_not_null", "not_null", col)


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"{col}_in_range", "in_range", col, {"lo": lo, "hi": hi})


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(name or f"{col}_matches", "matches", col, {"pattern": pattern})


def in_set(col: str, values: list, name: str | None = None) -> Rule:
    return Rule(name or f"{col}_in_set", "in_set", col, {"values": list(values)})


def unique(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"{col}_unique", "unique", col)


def foreign_key(
    col: str, dim: DataFrame, dim_col: str, name: str | None = None
) -> Rule:
    return Rule(
        name or f"{col}_fk", "foreign_key", col, {"dim": dim, "dim_col": dim_col}
    )


def _violation_pred(rule: Rule) -> F.Column:
    """Row-level violation predicate (NULL-safe: a NULL that isn't the
    thing being tested never counts as a violation of range/regex/set
    rules — that's not_null's job)."""
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.params["pattern"])
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(*rule.params["values"])
    raise ValueError(f"not a row-level rule: {rule.kind}")


ROW_KINDS = ("not_null", "in_range", "matches", "in_set")


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; return (rule, kind, n_violations, n_rows,
    passed) — one row per rule, computed in one scan (+ one broadcast
    anti-join per foreign_key rule, unioned in)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    row_rules = [r for r in rules if r.kind in ROW_KINDS]
    for r in row_rules:
        aggs.append(
            F.sum(F.when(_violation_pred(r), 1).otherwise(0)).cast("long").alias(r.name)
        )
    unique_rules = [r for r in rules if r.kind == "unique"]
    for r in unique_rules:
        # duplicates = non-null rows minus distinct non-null values
        aggs.append(
            (
                F.count(F.col(r.col)) - F.count_distinct(F.col(r.col))
            ).cast("long").alias(r.name)
        )
    base = df.agg(*aggs)

    reports = []
    single = base.select(
        F.col("_n"),
        *[F.col(r.name) for r in row_rules + unique_rules],
    )
    for r in row_rules + unique_rules:
        reports.append(
            single.select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.col(r.name).alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows"),
            )
        )
    for r in [r for r in rules if r.kind == "foreign_key"]:
        dim, dim_col = r.params["dim"], r.params["dim_col"]
        keys = F.broadcast(dim.select(F.col(dim_col).alias(r.col)).distinct())
        orphans = (
            df.filter(F.col(r.col).isNotNull())
            .join(keys, r.col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        reports.append(
            orphans.crossJoin(total).select(
                F.lit(r.name).alias("rule"),
                F.lit("foreign_key").alias("kind"),
                "n_violations",
                "n_rows",
            )
        )
    if not reports:
        raise ValueError(
            "check() needs at least one rule — an empty rule list would "
            "silently report nothing as verified"
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", (F.col("n_violations") == 0).cast("long"))


def quarantine(
    df: DataFrame, rules: list[Rule], reason_col: str = "_violated_rules"
) -> tuple[DataFrame, DataFrame]:
    """Split rows by the ROW-LEVEL rules: (clean, violating). Violating
    rows carry the sorted array of rule names they broke — the S6
    quarantine sink generalized to arbitrary rule sets. One projection,
    no shuffle."""
    row_rules = [r for r in rules if r.kind in ROW_KINDS]
    if not row_rules:
        raise ValueError("quarantine needs at least one row-level rule")
    reasons = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(_violation_pred(r), F.lit(r.name)) for r in row_rules
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn(reason_col, reasons)
    clean = tagged.filter(F.size(reason_col) == 0).drop(reason_col)
    bad = tagged.filter(F.size(reason_col) > 0)
    return clean, bad
