"""Spatial scalar kernels.

Reference parity (all citations into /root/reference):

- haversine: ``utils/common_functions_curated.py:113-138`` — great-circle km,
  R=6371, computed with Spark column trig. Same formula here.
- spatial grid: ``utils/common_functions_curated.py:62-88`` — floor-quantize
  lat/lon to bucket ids.
- geohash: ``utils/common_functions_curated.py:164-185`` wraps a pure-Python
  base-32 encoder (``:283-317``) in a row-at-a-time ``F.udf`` — the single
  biggest physical-execution defect of the reference (SURVEY §4). Here the
  encoder is a **native column expression**: quantize lat/lon to 15-bit grid
  ordinates, interleave the bits, slice 5-bit groups into base-32 characters.
  Stays inside whole-stage codegen; no Python worker hop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two points (R=6371).

    Pure column expression — codegen'd, no UDF. Matches the reference
    formula at ``utils/common_functions_curated.py:113-138``.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    # Clamp the asin argument against FP drift just past 1.0 with
    # when/otherwise, NOT least(): least ignores NULLs, so a NULL input
    # (e.g. lag() on the first point of an entity) would silently become
    # asin(1.0) = a half-circumference 20015 km "jump" instead of NULL.
    root = F.sqrt(a)
    return 2 * EARTH_RADIUS_KM * F.asin(
        F.when(root > 1.0, F.lit(1.0)).otherwise(root)
    )


def grid_cell(coord: Column, precision_deg: float) -> Column:
    """Floor-quantize a coordinate into a grid bucket id (long).

    Reference: ``utils/common_functions_curated.py:62-88``.
    """
    return F.floor(coord / F.lit(precision_deg)).cast("long")


def _interleave_bits(lon_q: Column, lat_q: Column, lon_bits: int, lat_bits: int) -> Column:
    """Interleave lon_bits+lat_bits integers, lon bit first (geohash order).

    lon occupies output bits total-1, total-3, …; lat occupies total-2,
    total-4, … — with lon_bits == lat_bits (even precision) or
    lon_bits == lat_bits+1 (odd precision, lon gets the extra bit per the
    public geohash spec).
    """
    total = lon_bits + lat_bits
    parts = []
    for i in range(lon_bits):
        # bit (lon_bits-1-i) of lon goes to output bit (total-1-2i)
        parts.append(
            F.shiftleft(
                F.shiftright(lon_q, lon_bits - 1 - i).bitwiseAND(F.lit(1)),
                total - 1 - 2 * i,
            )
        )
    for i in range(lat_bits):
        parts.append(
            F.shiftleft(
                F.shiftright(lat_q, lat_bits - 1 - i).bitwiseAND(F.lit(1)),
                total - 2 - 2 * i,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def geohash_expr(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Base-32 geohash of (lat, lon) as a native column expression.

    Equivalent to the standard bisection encoder the reference wraps in a
    Python UDF (``utils/common_functions_curated.py:283-317``): the lon
    axis gets ceil(precision*5/2) bits (the extra bit on odd lengths, per
    the public spec), lat gets the rest, and quantization
    ``floor((x-min)/range * 2^bits)`` reproduces the bisection bit
    pattern exactly. Precisions 1–12 (total bits ≤ 60 stay inside long).
    """
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    total = precision * 5
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    lon_q = F.least(
        F.floor(
            (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
        ).cast("long"),
        F.lit((1 << lon_bits) - 1),
    )
    lat_q = F.least(
        F.floor(
            (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
        ).cast("long"),
        F.lit((1 << lat_bits) - 1),
    )
    inter = _interleave_bits(lon_q, lat_q, lon_bits, lat_bits)

    chars = []
    for k in range(precision):
        idx = F.shiftright(inter, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
        chars.append(_b32_char(idx))
    return F.concat(*chars)


def _b32_char(idx: Column) -> Column:
    """Map a 0..31 column to its base-32 geohash character (JVM-side)."""
    arr = F.array(*[F.lit(c) for c in _GEOHASH_B32])
    # element_at requires an INT ordinal; the interleaved bit math is LONG
    return F.element_at(arr, (idx + 1).cast("int"))


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-order (Morton) key of two non-negative integer columns — bit
    interleaving x and y into one long, x taking the even output bits
    (bit 0, 2, …) and y the odd. Writing a table sorted by this key
    clusters rows that are close in BOTH dimensions into the same
    parquet row groups, so min/max column statistics prune scans for 2-D
    predicates (id-range × time-range, lat × lon cells) — the layout
    trick table formats call Z-ORDER, as a plain column expression any
    writer can `sortWithinPartitions` by. ``bits`` per dimension, ≤ 31
    so the interleave stays inside a long. Inputs are masked to
    ``bits`` (callers quantize first, e.g. grid_cell).
    """
    if not 1 <= bits <= 31:
        raise ValueError("morton bits must be in 1..31")
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out
