"""Known-value and property pins for the banded-DTW trajectory family
(q352) — the no-SQL-oracle operator's correctness contract."""

import datetime as dt
import math

import pytest

from noaa_ais_glue_lakehouse_spark.operators.trajectory import (
    _downsample,
    dtw_banded_km,
    dtw_day_over_day,
)


def _hav_km(lat1, lon1, lat2, lon2):
    """Independent haversine (test-local, written from the formula)."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_dtw_identity_is_zero():
    import numpy as np

    a = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 1.5], [3.0, 2.0]])
    assert dtw_banded_km(a, a, radius=5) == 0.0


def test_dtw_two_by_two_hand_value():
    """2×2 DP by hand: D(1,1)=c11; D(2,2)=c22+min(D(1,2),D(2,1),D(1,1));
    D(1,2)=c12+c11... the diagonal wins here."""
    import numpy as np

    a = np.array([[0.0, 0.0], [0.0, 1.0]])
    b = np.array([[0.0, 0.0], [0.0, 1.0]])
    assert dtw_banded_km(a, b, radius=5) == 0.0
    # shift b by one point: alignment must pay exactly one hop
    b2 = np.array([[0.0, 1.0], [0.0, 2.0]])
    c11 = _hav_km(0, 0, 0, 1)
    c12 = _hav_km(0, 0, 0, 2)
    c21 = 0.0  # a2 == b2[0]
    c22 = _hav_km(0, 1, 0, 2)
    d11 = c11
    d12 = d11 + c12
    d21 = d11 + c21
    d22 = c22 + min(d11, d12, d21)
    got = dtw_banded_km(a, b2, radius=5)
    assert got == pytest.approx(d22, rel=1e-9)


def test_dtw_absorbs_phase_shift_where_euclidean_cannot():
    """A track vs the same track delayed one step: DTW stays near zero
    (one unmatched endpoint), while pointwise pairing pays every step."""
    import numpy as np

    pts = [[0.0, float(i) * 0.1] for i in range(10)]
    a = np.array(pts[:-1])
    b = np.array(pts[1:])  # same shape, phase-shifted
    dtw = dtw_banded_km(a, b, radius=5)
    pointwise = sum(
        _hav_km(*a[i], *b[i]) for i in range(len(a))
    )
    # DTW aligns i -> i-1 and pays only the two boundary cells
    assert dtw < pointwise / 3
    assert dtw == pytest.approx(
        _hav_km(0.0, 0.0, 0.0, 0.1) * 2, rel=1e-6
    )


def test_band_equals_full_dp_when_wide():
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, size=(12, 2))
    b = rng.uniform(-1, 1, size=(9, 2))
    assert dtw_banded_km(a, b, radius=100) == pytest.approx(
        dtw_banded_km(a, b, radius=12), rel=1e-12
    )


def test_band_feasible_despite_length_gap():
    """radius < |n-m| must still reach the corner (band auto-widens)."""
    import numpy as np

    a = np.array([[0.0, 0.0]] * 3)
    b = np.array([[0.0, 0.0]] * 10)
    assert dtw_banded_km(a, b, radius=1) == 0.0


def test_downsample_stride_bounds():
    import numpy as np

    arr = np.arange(200).reshape(100, 2)
    out = _downsample(arr, 32)
    assert len(out) <= 32
    assert (out[0] == arr[0]).all()
    arr2 = np.arange(20).reshape(10, 2)
    assert (_downsample(arr2, 32) == arr2).all()


def test_dtw_day_over_day_end_to_end(spark):
    """Two users, three days: user 1 repeats its route (dtw 0), user 2
    shifts longitude by 1° on day 2 (dtw = 10 hops of 1° at equator);
    day 3 is non-adjacent (day 4) and must produce no pair row."""
    rows = []
    for day, shift in ((1, 0.0), (2, 1.0), (4, 1.0)):
        for i in range(10):
            ts = dt.datetime(2024, 1, day, 6, i)
            rows.append((1, ts, 0.0, i * 1.0))
            rows.append((2, ts, 0.0, i * 1.0 + shift))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "lat", "lon"])
    out = {
        (r["user_id"], r["day"].isoformat()): r
        for r in dtw_day_over_day(ev, radius=5, max_points=32).collect()
    }
    assert set(out) == {(1, "2024-01-02"), (2, "2024-01-02")}
    assert out[(1, "2024-01-02")]["dtw_km"] == 0.0
    r2 = out[(2, "2024-01-02")]
    assert r2["n_prev"] == 10 and r2["n_cur"] == 10
    # user 2: same shape shifted along its own axis -> boundary cells only
    one_deg = _hav_km(0.0, 0.0, 0.0, 1.0)
    assert r2["dtw_km"] == pytest.approx(2 * one_deg, rel=1e-5)
    assert r2["dtw_km_per_step"] == pytest.approx(
        r2["dtw_km"] / 20, abs=1e-6
    )


def test_q352_catalog_runs(spark):
    from noaa_ais_glue_lakehouse_spark.plans.catalog import queries

    df = queries()["q352_dtw_route_change"](spark, "/root/testdata/sf0.001")
    rows = df.limit(50).collect()
    assert {f.name for f in df.schema.fields} == {
        "user_id", "day", "n_prev", "n_cur", "dtw_km", "dtw_km_per_step"
    }
    assert all(r["dtw_km"] >= 0 for r in rows)
