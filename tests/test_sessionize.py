"""Sessionization (W1-W4, W6) — including the day-boundary seeded
continuity semantic, the reference's hardest invariant
(``transformations/facts/fact_voyage_trajectory.py:310-332``): running
day 2 seeded from day 1's state snapshot must produce the same session
ids as a full two-day recompute.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.sessionize import (
    add_lag_features,
    latest_per_entity,
    session_bounds,
    sessionize,
)
from noaa_ais_glue_lakehouse_spark.operators.state import prepare_seeded_union


def _ts(h, m=0, day=1):
    return dt.datetime(2024, 1, day, h, m, 0)


def test_lag_and_gap(spark):
    df = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(1)), ("b", _ts(5))], ["mmsi", "ts"]
    )
    out = add_lag_features(df, "mmsi", "ts").orderBy("mmsi", "ts").collect()
    assert out[0]["prev_ts"] is None and out[0]["gap_seconds"] is None
    assert out[1]["gap_seconds"] == 3600.0
    assert out[2]["prev_ts"] is None


def test_sessionize_gap_splits(spark):
    # gaps: 1h, 4h (split at >3h), 1h
    rows = [("a", _ts(0)), ("a", _ts(1)), ("a", _ts(5)), ("a", _ts(6))]
    df = spark.createDataFrame(rows, ["mmsi", "ts"])
    out = sessionize(df, "mmsi", "ts", gap_seconds=3 * 3600).orderBy("ts").collect()
    assert [r["session_id"] for r in out] == [0, 0, 1, 1]


def test_sessionize_exact_gap_not_split(spark):
    rows = [("a", _ts(0)), ("a", _ts(3))]  # exactly 3h: rule is strict >
    df = spark.createDataFrame(rows, ["mmsi", "ts"])
    out = sessionize(df, "mmsi", "ts", gap_seconds=3 * 3600).collect()
    assert {r["session_id"] for r in out} == {0}


def test_seeded_day_boundary_continuity(spark):
    """Incremental day-2 run seeded from day-1 state == full recompute."""
    gap = 3 * 3600
    day1 = [("a", _ts(20, day=1)), ("a", _ts(22, day=1))]   # session 0
    day2_cont = ("a", _ts(23, 30, day=1))                   # 1.5h gap: continues
    day2_new = ("a", _ts(9, day=2))                         # >3h gap: new session
    full = spark.createDataFrame(day1 + [day2_cont, day2_new], ["mmsi", "ts"])

    expected = {
        (r["mmsi"], r["ts"]): r["session_id"]
        for r in sessionize(full, "mmsi", "ts", gap).collect()
    }

    # incremental: sessionize day 1, snapshot latest row per entity
    d1 = sessionize(
        spark.createDataFrame(day1, ["mmsi", "ts"]), "mmsi", "ts", gap
    )
    state = latest_per_entity(d1, "mmsi", "ts")
    d2 = spark.createDataFrame([day2_cont, day2_new], ["mmsi", "ts"])
    seeded = prepare_seeded_union(state, d2, "session_id")
    out = sessionize(seeded, "mmsi", "ts", gap, seed_col="seed_session_id")
    got = {
        (r["mmsi"], r["ts"]): r["session_id"]
        for r in out.filter(~F.col("is_seed")).collect()
    }
    for k, v in got.items():
        assert expected[k] == v, f"{k}: incremental {v} != full {expected[k]}"


def test_session_bounds(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(1), 2.0)]
    df = sessionize(
        spark.createDataFrame(rows, ["mmsi", "ts", "v"]), "mmsi", "ts", 3600 * 3
    )
    b = session_bounds(df, "mmsi", "ts", value_col="v").first()
    assert b["n_events"] == 2 and b["sum_v"] == 3.0
    assert b["session_start"] == _ts(0) and b["session_end"] == _ts(1)


def test_latest_per_entity(spark):
    rows = [("a", _ts(0), "old"), ("a", _ts(5), "new"), ("b", _ts(1), "only")]
    df = spark.createDataFrame(rows, ["mmsi", "ts", "v"])
    out = {r["mmsi"]: r["v"] for r in latest_per_entity(df, "mmsi", "ts").collect()}
    assert out == {"a": "new", "b": "only"}
