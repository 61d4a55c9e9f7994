"""Declarative data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest

from noaa_ais_glue_lakehouse_spark.operators import expectations as X


def _df(spark):
    rows = [
        (1, 10.0, "view", 5),
        (2, -3.0, "click", 5),      # range violation
        (3, 50.0, "BAD!", 6),       # regex + set violation
        (None, 20.0, "view", 7),    # null violation
        (5, 200.0, "view", 7),      # range violation
        (5, 30.0, "view", 99),      # duplicate id + fk orphan
    ]
    return spark.createDataFrame(rows, "id bigint, v double, t string, fk bigint")


def _rules(spark):
    dim = spark.createDataFrame([(5,), (6,), (7,)], "k bigint")
    return [
        X.not_null("id"),
        X.in_range("v", 0, 100),
        X.matches("t", "^[a-z]+$"),
        X.in_set("t", ["view", "click"]),
        X.unique("id"),
        X.foreign_key("fk", dim, "k"),
    ]


def test_check_counts(spark):
    got = {r["rule"]: r["n_violations"] for r in X.check(_df(spark), _rules(spark)).collect()}
    assert got == {
        "id_not_null": 1,
        "v_in_range": 2,
        "t_matches": 1,
        "t_in_set": 1,
        "id_unique": 1,
        "fk_fk": 1,
    }
    passed = {r["rule"]: r["passed"] for r in X.check(_df(spark), _rules(spark)).collect()}
    assert all(p == 0 for p in passed.values())


def test_check_all_pass(spark):
    df = spark.createDataFrame([(1, 1.0, "view", 5)], "id bigint, v double, t string, fk bigint")
    rep = X.check(df, _rules(df.sparkSession)).collect()
    assert all(r["passed"] == 1 and r["n_violations"] == 0 for r in rep)


def test_quarantine_split_and_reasons(spark):
    rules = [r for r in _rules(spark) if r.kind in X.ROW_KINDS]
    clean, bad = X.quarantine(_df(spark), rules)
    assert clean.count() == 2  # rows 1 and the duplicate-but-row-clean id=5/30
    reasons = {r["id"]: r["_violated_rules"] for r in bad.collect()}
    assert reasons[2] == ["v_in_range"]
    assert reasons[3] == ["t_in_set", "t_matches"]
    assert reasons[None] == ["id_not_null"]
    # clean ∪ bad = input (no rows lost)
    assert clean.count() + bad.count() == 6


def test_quarantine_requires_row_rule(spark):
    with pytest.raises(ValueError):
        X.quarantine(_df(spark), [X.unique("id")])
