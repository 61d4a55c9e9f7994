"""As-of join — match each left row to the latest right row at or before
its timestamp, per key (the time-series join Spark lacks natively;
named in the engine brief as a flagship custom operator).

Implementation is the union + last-known-value window idiom, not a UDF
and not a range self-join:

1. tag left (probe) and right (reference) rows, union by name;
2. one window per key ordered by (ts, tag): ``last(right_value,
   ignorenulls=True)`` over unbounded-preceding rows carries the most
   recent reference value forward onto every probe row;
3. keep probe rows.

Cost: ONE shuffle on the key — same partitioning the downstream
per-key logic wants — versus the naive ``left.ts >= right.ts`` theta
join which is a cross product per key. Ties (probe.ts == ref.ts) take
the reference row (tag orders refs first), matching DuckDB/pandas
ASOF semantics (the oracle uses DuckDB's native ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: left columns + nearest-reference ``value_cols``.

    ``direction="backward"`` (default) matches the latest reference at or
    before the probe timestamp; ``"forward"`` matches the earliest at or
    after (pandas ``merge_asof(direction=…)`` semantics). Forward is the
    same one-shuffle window idiom run over a DESCENDING timestamp order —
    "carry the last seen reference" becomes "carry the next upcoming
    one"; equal timestamps still take the reference row (tag sorts refs
    first within a timestamp in both directions).

    ``tolerance_seconds`` optionally voids matches farther than the
    window (value columns become NULL), like pandas
    ``merge_asof(tolerance=…)``; staleness is |probe.ts − ref.ts| in the
    match direction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    probe = left.withColumn("_tag", F.lit(1))
    ref = right.select(
        key_col, ts_col, *value_cols
    ).withColumn("_tag", F.lit(0))
    unioned = probe.unionByName(ref, allowMissingColumns=True)

    order_ts = (
        F.col(ts_col) if direction == "backward" else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_ts, F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the whole reference row as ONE struct: last(…, ignorenulls)
    # then skips probe rows (struct is null there) but never a reference
    # row whose VALUE is genuinely NULL — per-column carries would return
    # a stale older value where ASOF semantics demand the latest row's
    # NULL, and would let the tolerance check judge staleness against a
    # different row than the value came from.
    ref_row = F.when(
        F.col("_tag") == 0,
        F.struct(F.col(ts_col).alias("_ts"), *[F.col(c) for c in value_cols]),
    )
    out = unioned.withColumn("_asof", F.last(ref_row, ignorenulls=True).over(w))

    out = out.filter(F.col("_tag") == 1)
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_asof._ts"))
        if direction == "forward":
            gap = -gap
        stale = gap > tolerance_seconds * 1_000_000
        out = out.withColumn(
            "_asof", F.when(stale, F.lit(None)).otherwise(F.col("_asof"))
        )

    keep = [c for c in left.columns] + [
        F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols
    ]
    return out.select(*keep)
