"""Sketch-based approximate aggregates — the bounded-memory path for
100 TB cardinality/quantile questions.

The DEFAULT sketch surface is the PORTABLE md5 family
(:func:`portable_hll_registers` / :func:`portable_hll_estimate` /
:func:`portable_sample_quantiles`): the hash family is public and
deterministic, so an independent SQL engine rebuilds the registers —
and therefore the estimates themselves — bit-for-bit, which puts the
production sketch path under the exact cross-engine correctness gate
(q63/q102), not just a tolerance test. Mergeability is relational:
union of HLL sketches = register-wise MAX, union of min-k samples =
re-take the k smallest hashes.

The Spark-native forms (``approx_count_distinct`` HLL++,
``approx_percentile``) remain as the fast engine-optimized twins —
partial-aggregable JVM aggregates with engine-private seeds, pinned by
tolerance tests in tests/test_sketches.py rather than an oracle (their
estimates differ across engines by design). The portable family pays
~2× the constants for hash-checkability; both shuffle one
bounded-size sketch per group instead of the value set.
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
# Portable md5 sketch family — the hash-checkable production default
# ---------------------------------------------------------------------------

_U53 = 9007199254740992  # 2^53: exact-integer unit for the harmonic sum
_HLL_M = 256  # p=8 -> 256 registers; alpha_256 = 0.7213/(1+1.079/256)


def portable_hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL register relation ``(group..., reg, m_j)`` with a
    PORTABLE construction — THE persistable sketch state for
    incremental rollups (q102's daily partials).

    Register index = first 8 bits of ``md5(value)``; M_j = max over
    values of (leading-zero count of the next 52 bits + 1), computed
    exactly as ``53 - length(bin(v52))``. The md5 family is public, so
    an independent engine rebuilds this relation row-for-row — unlike
    Spark's ``hll_sketch_agg`` binary payloads (engine-private seeds).
    State is ≤256 rows per group at any corpus size; the groupBy(max)
    is map-side combinable, so the shuffle carries registers, never the
    value set. Merging two sketches = unioning their register relations
    and re-taking MAX(m_j) per (group, reg) — see
    :func:`portable_hll_estimate`.
    """
    md = F.md5(F.col(value_col).cast("string"))
    h = df.select(
        *group_cols,
        F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("reg"),
        F.conv(F.substring(md, 3, 13), 16, 10).cast("long").alias("v52"),
    )
    return h.groupBy(*group_cols, "reg").agg(
        F.max(
            F.when(F.col("v52") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.bin(F.col("v52")))
            )
        ).alias("m_j")
    )


def portable_hll_estimate(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge register relations (register-wise MAX — HLL union) and emit
    the per-group cardinality estimate, cross-engine EXACT.

    The harmonic sum Σ 2^−M_j accumulates in integer units of 2⁻⁵³
    (each term the exact int64 ``2^53 >> M_j``), so it is
    order-independent; the α_m·m² scaling and final division happen
    once in one fixed double expression, with Flajolet's small-range
    linear-counting correction (E ≤ 2.5m with empty registers) applied
    identically on both engines. Rounded to 2 dp for display stability.
    Pass registers from one batch or a UNION of many batches — the
    merge is the same groupBy.
    """
    merged = registers.groupBy(*group_cols, "reg").agg(
        F.max("m_j").alias("m_j")
    )
    agg = merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftright({_U53}L, CAST(m_j AS INT))")
        ).alias("sum_u"),
    )
    raw_est = (
        f"(0.7213 / (1.0 + 1.079 / {_HLL_M}.0)) * {_HLL_M}.0 * {_HLL_M}.0"
        f" * {_U53}.0 / (sum_u + ({_HLL_M} - n_present) * {_U53}.0)"
    )
    return agg.select(
        *group_cols,
        F.round(
            F.expr(
                f"CASE WHEN {raw_est} <= 2.5 * {_HLL_M}.0"
                f" AND n_present < {_HLL_M}"
                f" THEN {_HLL_M}.0 * ln({_HLL_M}.0"
                f" / GREATEST({_HLL_M} - n_present, 1))"
                f" ELSE {raw_est} END"
            ),
            2,
        ).alias("hll_estimate"),
    )


def portable_sample_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    probabilities: list[float] = (0.5, 0.95),
    k: int = 1024,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a deterministic bounded-state
    sample — the portable twin of ``approx_percentile``.

    The k rows with the smallest ``md5(id)`` per group form a uniform
    without-replacement sample (a fixed public hash as the random key,
    so both engines draw the SAME sample); the estimate for probability
    q is the exact sample order statistic at rank ``ceil(q·n_s)``
    (ties broken by id — fully deterministic). Rank error is
    O(1/√k) whp. State is bounded at k rows per group and mergeable by
    re-taking the k smallest hashes of a union. The per-group top-k is
    one repartition+sort (window row_number), the standard distributed
    top-k shape.
    """
    from pyspark.sql import Window

    hkey = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(hkey, F.col(id_col))
    sample = (
        df.select(*group_cols, value_col, id_col)
        .withColumn("_hrk", F.row_number().over(w))
        .filter(F.col("_hrk") <= k)
    )
    wv = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col), F.col(id_col)
    )
    ranked = sample.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(wv).alias("_vrk"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*group_cols))
        .alias("_ns"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("_vrk") == F.ceil(F.lit(float(q)) * F.col("_ns")),
                F.col(value_col),
            )
        ).alias(f"q{int(round(q * 100)):02d}_{value_col}")
        for q in probabilities
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


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
    # pre-reduce mod 2^31 BEFORE the prime multiply: (2^31-1)*_H1_MUL
    # stays under 2^63, where an unreduced 64-bit key would wrap in Spark
    # and error in DuckDB (divergent failure modes at corpus-scale ids).
    # SIGN-SAFE reduction (pmod, not %): % keeps the dividend's sign in
    # both engines, so a signed hash key (e.g. xxhash64) would otherwise
    # yield NEGATIVE positions, silently breaking the [0, m) contract.
    k = F.pmod(key, F.lit(2147483648))
    g1 = (k * F.lit(_H1_MUL) + F.lit(_H1_ADD)) % F.lit(_H_MOD)
    g2 = (k * F.lit(_H2_MUL) + F.lit(_H2_ADD)) % F.lit(_H_MOD)
    return (g1 + F.lit(i) * g2 + F.lit(i * i)) % F.lit(m)


def hash_pos_sql(key_expr: str, i_expr: str, m: int) -> str:
    """The DuckDB-side rendering of ``_hash_pos`` (same integer math,
    same sign-safe mod-2^31 pre-reduction — the double-% idiom is
    DuckDB's pmod)."""
    k = f"((({key_expr}) % 2147483648 + 2147483648) % 2147483648)"
    g1 = f"({k}*{_H1_MUL} + {_H1_ADD}) % {_H_MOD}"
    g2 = f"({k}*{_H2_MUL} + {_H2_ADD}) % {_H_MOD}"
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
