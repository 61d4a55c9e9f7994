"""Property-based tests (hypothesis) for the highest-risk kernels:
sessionization invariants, geohash vs a reference bisection encoder,
haversine metric properties, winnowing guarantees.

One shared Spark job per example would be slow; instead each property
generates a batch of cases and runs them through ONE DataFrame per
property (hypothesis drives the data, Spark evaluates vectorized).
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.functions.spatial import geohash_expr, haversine_km
from noaa_ais_glue_lakehouse_spark.operators.sessionize import sessionize


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Canonical bisection encoder (independent reference implementation)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = "", 0, 0, True
    while len(out) < precision:
        r, x = (lonr, lon) if even else (latr, lat)
        mid = (r[0] + r[1]) / 2
        if x >= mid:
            ch = (ch << 1) | 1
            r[0] = mid
        else:
            ch = ch << 1
            r[1] = mid
        even = not even
        bit += 1
        if bit == 5:
            out += b32[ch]
            bit, ch = 0, 0
    return out


# Coordinates rounded to 6 decimals — the AIS data contract (~0.1 m).
# Unrounded floats let hypothesis find denormals like -1e-308 where the
# quantizer's (x+180) addition absorbs the value while exact bisection
# keeps its sign — below any physical coordinate's resolution, accepted
# as out of contract.
coords = st.tuples(
    st.floats(min_value=-89.999, max_value=89.999, allow_nan=False).map(
        lambda x: round(x, 6)
    ),
    st.floats(min_value=-179.999, max_value=179.999, allow_nan=False).map(
        lambda x: round(x, 6)
    ),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(coords, min_size=1, max_size=20))
def test_geohash_matches_bisection_encoder(spark, pts):
    # even AND odd precisions — odd lengths give lon the extra bit
    # (asymmetric split), the branch the quantizer must get right
    df = spark.createDataFrame(pts, ["lat", "lon"])
    for precision in (5, 6, 7):
        got = [
            r[0]
            for r in df.select(
                geohash_expr(F.col("lat"), F.col("lon"), precision)
            ).collect()
        ]
        want = [_ref_geohash(lat, lon, precision) for lat, lon in pts]
        assert got == want, f"precision {precision}"


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=20))
def test_haversine_metric_properties(spark, pairs):
    rows = [(a[0], a[1], b[0], b[1]) for a, b in pairs]
    df = spark.createDataFrame(rows, ["lat1", "lon1", "lat2", "lon2"])
    out = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
        haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1")).alias("rev"),
    ).collect()
    for r, (a, b) in zip(out, pairs):
        assert r["d"] >= 0.0
        assert r["d"] <= 20015.1  # half circumference bound
        assert abs(r["d"] - r["rev"]) < 1e-9  # symmetry
        if a == b:
            assert r["d"] < 1e-9


_doc_text = st.text(
    alphabet="abcdefgh ", min_size=0, max_size=60
)


@settings(max_examples=8, deadline=None)
@given(_doc_text, _doc_text, st.text(alphabet="xyzw", min_size=11, max_size=25))
def test_winnowing_guarantee(spark, prefix, suffix, planted):
    """Winnowing's defining guarantee: two documents sharing a substring of
    length ≥ k + w - 1 (= 11 for k=8, w=4) share at least one fingerprint."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        winnow_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(1, prefix + planted + suffix), (2, "QQ " + planted + " PP")],
        ["doc_id", "text"],
    )
    idx = winnow_fingerprint_index(df, "doc_id", "text", 8, 4)
    fps = {1: set(), 2: set()}
    for r in idx.collect():
        fps[r["doc_id"]].add(r["fingerprint"])
    assert fps[1] & fps[2], (prefix, planted, suffix)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=100_000),  # offsets in seconds
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_invariants(spark, offsets):
    """Session ids start at 0, are non-decreasing in time, and increment
    exactly where a strict >gap occurs."""
    base = dt.datetime(2024, 1, 1)
    ts = sorted(base + dt.timedelta(seconds=o) for o in offsets)
    df = spark.createDataFrame([("e", t) for t in ts], ["mmsi", "ts"])
    gap = 600.0
    out = (
        sessionize(df, "mmsi", "ts", gap_seconds=gap)
        .orderBy("ts")
        .collect()
    )
    sids = [r["session_id"] for r in out]
    times = [r["ts"] for r in out]
    assert sids[0] == 0
    for i in range(1, len(sids)):
        expected_inc = 1 if (times[i] - times[i - 1]).total_seconds() > gap else 0
        assert sids[i] - sids[i - 1] == expected_inc, (i, times, sids)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.5, 0.7, 0.8]),
)
def test_prefix_filter_jaccard_equals_brute_force(spark, texts, threshold):
    """AllPairs prefix filter ≡ O(n²) brute force on arbitrary text —
    including empty docs, duplicate docs and tiny two-letter vocabularies
    where prefixes collapse to one token and every posting list is hot."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        jaccard_pairs_exact,
        jaccard_pairs_prefix_filter,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_exact(df, "doc_id", "text", threshold).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_prefix_filter(
            df, "doc_id", "text", threshold
        ).collect()
    }
    assert fast == exact


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(-5, 5)),
        min_size=1,
        max_size=60,
    )
)
def test_global_running_sum_property(spark, rows):
    """Parallel prefix scan ≡ sequential cumsum under the same total
    order, for arbitrary keys/values and a partition count that forces
    multi-partition offsets."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "v", "rid"])
    got = {
        (r["k"], r["rid"]): r["c"]
        for r in global_running_sum(
            df, ["k", "rid"], "v", out_col="c", num_partitions=5
        ).collect()
    }
    acc = 0
    for k, v, rid in sorted(data, key=lambda t: (t[0], t[2])):
        acc += v
        assert got[(k, rid)] == acc
