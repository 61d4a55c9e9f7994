"""As-of join: basic semantics, ties, no-match, tolerance."""

from __future__ import annotations

import datetime as dt

from noaa_ais_glue_lakehouse_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_basic(spark):
    probe = spark.createDataFrame(
        [("a", 1, _t(10)), ("a", 2, _t(30)), ("b", 3, _t(5))],
        ["k", "pid", "ts"],
    )
    ref = spark.createDataFrame(
        [("a", _t(0), 100.0), ("a", _t(20), 200.0), ("b", _t(50), 900.0)],
        ["k", "ts", "price"],
    )
    got = {r["pid"]: r["asof_price"] for r in asof_join(probe, ref, "k", "ts", ["price"]).collect()}
    assert got == {1: 100.0, 2: 200.0, 3: None}  # b's ref is in the future


def test_asof_tie_takes_reference(spark):
    probe = spark.createDataFrame([("a", 1, _t(20))], ["k", "pid", "ts"])
    ref = spark.createDataFrame([("a", _t(20), 7.0)], ["k", "ts", "v"])
    r = asof_join(probe, ref, "k", "ts", ["v"]).first()
    assert r["asof_v"] == 7.0  # equal timestamps match (>= semantics)


def test_asof_tolerance(spark):
    probe = spark.createDataFrame(
        [("a", 1, _t(10)), ("a", 2, _t(59))], ["k", "pid", "ts"]
    )
    ref = spark.createDataFrame([("a", _t(0), 5.0)], ["k", "ts", "v"])
    got = {
        r["pid"]: r["asof_v"]
        for r in asof_join(
            probe, ref, "k", "ts", ["v"], tolerance_seconds=1800
        ).collect()
    }
    assert got[1] == 5.0      # 10 min old: within tolerance
    assert got[2] is None     # 59 min old: stale


def test_asof_null_reference_value_honored(spark):
    """The latest reference row wins even when its value is NULL — a
    per-column ignorenulls carry would wrongly return the older value."""
    from pyspark.sql import types as T

    probe = spark.createDataFrame([("a", 1, _t(30))], ["k", "pid", "ts"])
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    ref = spark.createDataFrame([("a", _t(0), 5.0), ("a", _t(20), None)], schema)
    r = asof_join(probe, ref, "k", "ts", ["v"]).first()
    assert r["asof_v"] is None


def test_asof_tolerance_judges_same_row_as_value(spark):
    """Staleness must be judged against the row the value came from."""
    from pyspark.sql import types as T

    probe = spark.createDataFrame([("a", 1, _t(50))], ["k", "pid", "ts"])
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    # old row has the value; a fresh row exists but with NULL value
    ref = spark.createDataFrame([("a", _t(0), 5.0), ("a", _t(45), None)], schema)
    r = asof_join(probe, ref, "k", "ts", ["v"], tolerance_seconds=600).first()
    # latest row (t=45, within tolerance) is the match; its value is NULL —
    # NOT the stale t=0 value smuggled past the tolerance check
    assert r["asof_v"] is None


def test_asof_keeps_left_columns_only_plus_values(spark):
    probe = spark.createDataFrame([("a", 1, _t(10), "x")], ["k", "pid", "ts", "extra"])
    ref = spark.createDataFrame([("a", _t(0), 1.0)], ["k", "ts", "v"])
    out = asof_join(probe, ref, "k", "ts", ["v"])
    assert out.columns == ["k", "pid", "ts", "extra", "asof_v"]


def test_asof_forward_direction(spark):
    """Forward as-of: earliest reference at or after the probe ts;
    equal-ts reference matches; tolerance voids matches too far AHEAD."""
    probe = spark.createDataFrame(
        [("a", 1, _t(10)), ("a", 2, _t(30)), ("a", 3, _t(55))],
        ["k", "pid", "ts"],
    )
    ref = spark.createDataFrame(
        [("a", _t(30), 1.0), ("a", _t(40), 2.0)], ["k", "ts", "v"]
    )
    out = {
        r["pid"]: r["asof_v"]
        for r in asof_join(
            probe, ref, "k", "ts", ["v"], direction="forward"
        ).collect()
    }
    assert out == {1: 1.0, 2: 1.0, 3: None}  # pid2: equal-ts match; pid3: nothing after
    bounded = {
        r["pid"]: r["asof_v"]
        for r in asof_join(
            probe, ref, "k", "ts", ["v"], direction="forward", tolerance_seconds=900
        ).collect()
    }
    assert bounded == {1: None, 2: 1.0, 3: None}  # pid1's match is 20min ahead > 15min


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=59), min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=59), min_size=0, max_size=12),
    st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_pandas_merge_asof(spark, probe_mins, ref_mins, direction):
    """Both directions pinned against pandas merge_asof on random series
    (the public reference semantics the operator claims)."""
    import pandas as pd

    probe_mins = sorted(set(probe_mins))
    ref_mins = sorted(set(ref_mins))
    probe = spark.createDataFrame(
        [("k", i, _t(m)) for i, m in enumerate(probe_mins)], ["k", "pid", "ts"]
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    ref = spark.createDataFrame(
        [("k", _t(m), float(m)) for m in ref_mins], schema
    )
    got = {
        r["pid"]: r["asof_v"]
        for r in asof_join(probe, ref, "k", "ts", ["v"], direction=direction).collect()
    }
    pdf_p = pd.DataFrame({"ts": [_t(m) for m in probe_mins], "pid": range(len(probe_mins))})
    pdf_r = pd.DataFrame(
        {
            "ts": pd.Series([_t(m) for m in ref_mins], dtype="datetime64[ns]"),
            "v": pd.Series([float(m) for m in ref_mins], dtype="float64"),
        }
    )
    merged = pd.merge_asof(pdf_p, pdf_r, on="ts", direction=direction)
    want = {
        int(row.pid): (None if pd.isna(row.v) else float(row.v))
        for row in merged.itertuples()
    }
    assert got == want
