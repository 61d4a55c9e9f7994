"""Skew-mitigation operators: salted joins for hot keys.

AQE's runtime skew-join handling (enabled in the session factory) covers
most cases; explicit salting remains the tool when a join's hot keys are
known ahead of time or AQE is unavailable (e.g. writing to a
pre-partitioned layout). The pattern: replicate each right-side row
``salt_factor`` times with a salt id, scatter left-side rows uniformly
across salts, join on (key, salt) — a hot key's rows spread over
``salt_factor`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting (left = big/skewed side).

    The right side is replicated salt_factor× (explode of a literal
    range) — correct for any join cardinality because each left row
    matches exactly one replica (its own salt). Salts come from a hash of
    the whole left row *plus* a row-unique component (partition id + the
    per-partition monotonic id): hot keys are often fully identical
    duplicate rows, and a content-only hash would give them all the same
    salt, landing the entire hot key back in one task. Still
    deterministic for a fixed input partitioning (no rand()), which keeps
    reruns and debugging sane.
    """
    if how not in ("inner", "left"):
        # right/full joins would emit salt_factor copies of every
        # unmatched right row (each replica fails the join independently)
        raise ValueError(f"unsupported how={how!r}: salting replicates the right side")
    salt = F.pmod(
        F.xxhash64(
            F.spark_partition_id(),
            F.monotonically_increasing_id(),
            *[F.col(c) for c in left.columns],
        ),
        F.lit(salt_factor),
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>")),
    )
    return l_salted.join(r_salted, keys + ["_salt"], how).drop("_salt")
