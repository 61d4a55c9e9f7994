"""Sketch-based approximate aggregates — the bounded-memory path for
100 TB cardinality/quantile questions.

``approx_count_distinct`` (HyperLogLog++) and ``approx_percentile``
(a mergeable quantile sketch) are Spark-native, partial-aggregable, and
shuffle one sketch per group instead of the value set — the difference
between a COUNT(DISTINCT) that re-shuffles every row and one that ships
kilobytes per partition. Accuracy is tunable (rsd / accuracy params);
tolerance vs exact answers is pinned in tests/test_sketches.py rather
than a DuckDB oracle (sketch implementations differ across engines by
design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative std dev rsd)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(f"approx_n_{value_col}")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles as an array column."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias(f"quantiles_{value_col}")
    )


# ---------------------------------------------------------------------------
# Deterministic integer hash family (Bloom / Count-Min)
# ---------------------------------------------------------------------------
#
# Kirsch-Mitzenmacher enhanced double hashing over two affine base hashes:
#
#     g1(x) = (x*2654435761 + 1013904223) mod 4294967291
#     g2(x) = (x*2246822519 + 3266489917) mod 4294967291
#     h_i(x) = (g1 + i*g2 + i*i) mod m
#
# Every intermediate stays under 2^63 for |x| < 2^31, so the SAME integer
# arithmetic runs as a Spark column expression AND as ANSI SQL in the
# DuckDB oracle — the sketch cell layout is bit-identical across engines,
# which is what lets a probabilistic structure sit under an exact
# correctness gate. (Spark's own BloomFilter/CountMinSketch aggregates use
# engine-private murmur seeds and opaque binary payloads; this family
# trades a little mixing quality for cross-engine replayability.)

_H1_MUL, _H1_ADD = 2654435761, 1013904223
_H2_MUL, _H2_ADD = 2246822519, 3266489917
_H_MOD = 4294967291  # largest prime < 2^32


def _hash_pos(key, i: int, m: int) -> "F.Column":
    g1 = (key * F.lit(_H1_MUL) + F.lit(_H1_ADD)) % F.lit(_H_MOD)
    g2 = (key * F.lit(_H2_MUL) + F.lit(_H2_ADD)) % F.lit(_H_MOD)
    return (g1 + F.lit(i) * g2 + F.lit(i * i)) % F.lit(m)


def hash_pos_sql(key_expr: str, i_expr: str, m: int) -> str:
    """The DuckDB-side rendering of ``_hash_pos`` (same integer math)."""
    g1 = f"(({key_expr})*{_H1_MUL} + {_H1_ADD}) % {_H_MOD}"
    g2 = f"(({key_expr})*{_H2_MUL} + {_H2_ADD}) % {_H_MOD}"
    return f"(({g1}) + ({i_expr})*({g2}) + ({i_expr})*({i_expr})) % {m}"


def bloom_bit_positions(
    df: DataFrame, key_col: str, m_bits: int = 65536, k: int = 3
) -> DataFrame:
    """The SET bit positions of a Bloom filter over ``key_col`` — one row
    per distinct position (column ``bitpos``), at most ``min(k*|keys|,
    m_bits)`` rows regardless of the build side's row count.

    This is the filter in relational form: bounded by ``m_bits`` — never
    by data size — so on a 100 TB build side it still broadcasts. Probing
    is an equi-join against it (``bloom_probe``), which is how engines
    push runtime row-level filters to the scan without shuffling the full
    key set.
    """
    key = F.col(key_col).cast("long")
    pos = [_hash_pos(key, i, m_bits).alias("bitpos") for i in range(k)]
    stacked = df.select(F.explode(F.array(*pos)).alias("bitpos"))
    return stacked.distinct()


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bits: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Probe rows against a Bloom bit set: append boolean ``bloom_pass``.

    Each probe key expands to its k candidate positions with the hash
    index carried along; a broadcast equi-join against the (≤ m_bits-row)
    bit set and a ``count(distinct i) == k`` test decide membership.
    Carrying ``i`` (not just the position) keeps the test exact when two
    hash functions of one key collide on the same bit.
    """
    key = F.col(key_col).cast("long")
    exploded = probe.select(
        key.alias("_k"),
        F.posexplode(
            F.array(*[_hash_pos(key, i, m_bits) for i in range(k)])
        ).alias("_i", "bitpos"),
    )
    hits = (
        exploded.join(F.broadcast(bits), "bitpos")
        .groupBy("_k")
        .agg(F.countDistinct("_i").alias("_nhit"))
        .filter(F.col("_nhit") == k)
        .select(F.col("_k"))
    )
    return probe.join(
        hits.withColumnRenamed("_k", key_col).withColumn(
            "bloom_pass", F.lit(True)
        ),
        key_col,
        "left",
    ).withColumn("bloom_pass", F.coalesce("bloom_pass", F.lit(False)))


def count_min_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Count-Min sketch as a relation: one row per non-empty cell —
    columns ``(i, pos, n)``, at most ``depth*width`` rows total.

    The build is a single hash aggregation over ``depth`` replicas of the
    input (map-side combined, so the shuffle carries ≤ depth*width rows
    per partition, not the raw stream). Cells are mergeable across
    shards/days by summing ``n`` — the property that makes CM the
    standard heavy-hitter structure on unbounded streams.
    """
    key = F.col(key_col).cast("long")
    replicas = df.select(
        F.posexplode(
            F.array(*[_hash_pos(key, i, width) for i in range(depth)])
        ).alias("i", "pos")
    )
    return replicas.groupBy("i", "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def count_min_estimate(
    keys: DataFrame, key_col: str, cells: DataFrame, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point-estimate keys against CM cells: min over the key's
    ``depth`` cells (missing cell ⇒ 0). Returns a two-column frame
    ``(key_col, est_count)`` with ONE ROW PER DISTINCT KEY — other
    columns of ``keys`` are dropped and duplicate keys collapse (the
    groupBy is the probe); callers needing the estimate alongside a
    wider frame should join the result back on ``key_col``. The
    estimate never under-counts (CM guarantee), so ``est_count ≥`` the
    true frequency — pinned in tests/test_sketches.py.
    """
    key = F.col(key_col).cast("long")
    exploded = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_hash_pos(key, i, width) for i in range(depth)])
        ).alias("i", "pos"),
    )
    return (
        exploded.join(F.broadcast(cells), ["i", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("est_count"))
    )
