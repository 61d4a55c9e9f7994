"""Banded Dynamic Time Warping over per-entity trajectories.

Training-data / AIS-analytics extension (SURVEY §7.2 phase 9 family):
route-shape similarity between an entity's consecutive-day tracks — the
classic "did the vessel change its route today" screen (DTW absorbs
speed/timing differences that defeat pointwise distances; cf. the
reference's trajectory fact tables, fact_voyage_trajectory.py, which
stop at per-point lag features).

Design for scale:

- **Pairing is structural, not pairwise-corpus.** Each entity's day-d
  track is compared only to its day-(d+1) track, so the comparison count
  is O(entities × days) — linear in the fact table, never a self-join.
  (Cross-entity route clustering would reuse this kernel behind an LSH /
  grid blocking stage, exactly like the dedup family's candidate
  generation.)
- **One shuffle.** ``applyInPandas`` groups by the entity key; every
  track build, downsample, and DP run happens inside the entity's
  partition. At 1000 executors this is a single hash exchange on a
  high-cardinality key.
- **Bounded kernel.** Tracks are stride-downsampled to ``max_points``
  before the DP, so the per-pair cost is ≤ max_points · (2·radius+1)
  regardless of raw ping density — the Sakoe-Chiba band (1978) both
  bounds cost and regularizes pathological warpings.
- **Arrow path.** Grouped-map pandas UDF (Arrow batches); the inner DP
  is numpy with a vectorized haversine row per DP step. No row-at-a-time
  Python UDFs (package hygiene rule, tests/test_code_hygiene.py).

No SQL oracle by design: DTW's recurrence is not expressible as a fixed
ANSI-SQL query (per-cell min over three predecessors along an
anti-diagonal frontier). Correctness is pinned by known-value tests
(identity ⇒ 0, hand-computed 2×2 and shifted-track cases, band ≡ full
DP when wide) in tests/test_trajectory.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EARTH_KM = 6371.0

def _dtw_schema(entity_col: str) -> str:
    return (
        f"{entity_col} long, day date, n_prev int, n_cur int, "
        "dtw_km double, dtw_km_per_step double"
    )


def _haversine_row(lat1, lon1, lat2s, lon2s):
    """Vectorized haversine km from one point to arrays of points."""
    import numpy as np

    p1, l1 = math.radians(lat1), math.radians(lon1)
    p2 = np.radians(lat2s)
    l2 = np.radians(lon2s)
    dp = p2 - p1
    dl = l2 - l1
    a = np.sin(dp / 2.0) ** 2 + math.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * _EARTH_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def dtw_banded_km(a, b, radius: int) -> float:
    """Sakoe-Chiba banded DTW between two (n,2) [lat,lon] arrays, km.

    The band half-width is widened to at least |n−m| so the corner
    (n, m) stays reachable; cells outside the band are +inf. Classic
    O(n·band) DP over a two-row frontier.
    """
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    r = max(radius, abs(n - m))
    inf = float("inf")
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        jlo, jhi = max(1, i - r), min(m, i + r)
        costs = _haversine_row(
            a[i - 1, 0], a[i - 1, 1], b[jlo - 1 : jhi, 0], b[jlo - 1 : jhi, 1]
        )
        for j in range(jlo, jhi + 1):
            c = costs[j - jlo]
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])


def _downsample(arr, max_points: int):
    if len(arr) <= max_points:
        return arr
    stride = -(-len(arr) // max_points)  # ceil
    return arr[::stride]


def dtw_day_over_day(
    ev: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius: int = 5,
    max_points: int = 32,
) -> DataFrame:
    """Per-entity, consecutive-day banded-DTW route distance.

    Returns one row per (entity, day) with a previous-day track:
    ``dtw_km`` (total warped haversine cost) and ``dtw_km_per_step``
    (normalized by n+m — the length-invariant score thresholds are set
    on). Day tracks are ts-ordered and stride-downsampled to
    ``max_points`` before the DP.
    """

    def _per_entity(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts_col])
        days = {}
        for day, g in pdf.groupby(pdf[ts_col].dt.date, sort=True):
            days[day] = _downsample(
                g[[lat_col, lon_col]].to_numpy(dtype="float64"), max_points
            )
        uid = int(pdf[entity_col].iloc[0])
        out = []
        ordered = sorted(days)
        for d_prev, d_cur in zip(ordered, ordered[1:]):
            if (d_cur - d_prev).days != 1:
                continue  # only adjacent days form a comparison
            a, b = days[d_prev], days[d_cur]
            total = dtw_banded_km(a, b, radius)
            out.append(
                (
                    uid,
                    d_cur,
                    len(a),
                    len(b),
                    round(total, 6),
                    round(total / (len(a) + len(b)), 6),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                entity_col,
                "day",
                "n_prev",
                "n_cur",
                "dtw_km",
                "dtw_km_per_step",
            ],
        )

    cols = [entity_col, ts_col, lat_col, lon_col]
    return (
        ev.select(*cols)
        .groupBy(entity_col)
        .applyInPandas(_per_entity, schema=_dtw_schema(entity_col))
    )
