"""Distributed integer linear algebra: exact covariance numerators and
engine-exact power iteration (beyond-reference PCA primitive for the
embedding-curation surface).

Design for 100 TB: the corpus-sized work is ONE pass over the vectors
(each row emits its d(d+1)/2 upper-triangle products into a single hash
aggregation); every later step — symmetrize, rescale, matmul rounds —
runs on the d²-row matrix table, which is cluster-trivial and never
collected to the driver. All iteration arithmetic is exact int64 (the
per-step rescale is a truncating integer division by a 1-row scalar),
so two engines implementing the same spec produce bit-identical
iterates: the property that makes an iterative numerical algorithm
HASH-exact oracle-checkable rather than tolerance-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_div(a: F.Column, s: F.Column) -> F.Column:
    """Exact truncate-toward-zero integer division identical in Spark
    and DuckDB: (a - a % s) / s on the absolute value, sign reapplied.
    Both engines' % follows the dividend's sign.

    Precondition for the cross-engine bit-identity contract:
    |a - a % s| < 2^53 — the NUMERATOR (not the quotient) must fit a
    double's mantissa, because both engines route the division through a
    double and an inexact numerator rounds BEFORE the divide; past that
    point Spark's truncating cast and DuckDB's rounding cast can land on
    different longs. Every call site here satisfies it: the power-
    iteration rescales divide values ≤ 64·10⁶·10³ ≈ 6.4×10¹⁰ ≪ 2^53.
    Callers with larger numerators must widen to decimal first (as
    integer_covariance_numerators does for its sums)."""
    pos = ((a - a % s) / s).cast("long")
    neg = -(((-a) - (-a) % s) / s).cast("long")
    return F.when(a >= 0, pos).otherwise(neg)


def integer_covariance_numerators(
    df: DataFrame, vec_col: str, scale: int = 1000
) -> DataFrame:
    """Exact-integer covariance numerators of an array<float> column →
    (i, j, a) for the FULL symmetric matrix, 1-based dims, where
    a = n·S_ij − S_i·S_j over components rounded to ``scale`` units
    (sample covariance = a / (n·(n−1)) / scale²).

    One corpus pass: each row explodes its upper-triangle component
    products into a (i, j) hash aggregation; marginal sums ride a d-key
    aggregation and join back broadcast; the triangle is mirrored to the
    full matrix with a union.

    Overflow envelope: per-row products are ≤ (scale·max|x|)² = 10¹²
    (long-safe), but the SUMS and the n·S_ij − S_i·S_j combination are
    carried in decimal(38,0) — exact to n ≈ 10¹⁶ — because the int64
    worst case |a| ≤ 2·n²·(scale·max|x|)² already overflows at
    n ≈ 2.1×10⁶ (NOT 10⁹: 2×10⁶·n² > 2⁶³ ⇒ n > 2.1×10⁶), and Spark
    would wrap silently while DuckDB's hugeint sums stay exact. The
    final cast of ``a`` back to long is the guard: it requires the
    ANSWER itself to fit int64 (|a| < 9.2×10¹⁸, guaranteed for
    n ≤ 2.1×10⁶ and data-dependent beyond), and under Spark's default
    ANSI mode an overflowing cast fails loudly instead of wrapping.
    """
    vv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    rows = df.select(vv.alias("v"))
    d = F.size(F.col("v"))
    idx = F.sequence(F.lit(1), d)
    marg = (
        rows.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("i"), F.element_at(F.col("v"), i).alias("x")
                    ),
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"))
        .agg(F.sum(F.col("e.x").cast("decimal(38,0)")).alias("s"))
    )
    pairs = (
        rows.select(
            F.explode(
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            F.sequence(i, d),
                            lambda j: F.struct(
                                i.alias("i"),
                                j.alias("j"),
                                (
                                    F.element_at(F.col("v"), i)
                                    * F.element_at(F.col("v"), j)
                                ).alias("p"),
                            ),
                        ),
                    )
                )
            ).alias("e")
        )
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.sum(F.col("e.p").cast("decimal(38,0)")).alias("sij"))
    )
    n1 = rows.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    tri = (
        pairs.crossJoin(F.broadcast(n1))
        .join(F.broadcast(marg.select(F.col("i"), F.col("s").alias("_sa"))), "i")
        .join(
            F.broadcast(marg.select(F.col("i").alias("j"), F.col("s").alias("_sb"))),
            "j",
        )
        .select(
            "i",
            "j",
            (F.col("n") * F.col("sij") - F.col("_sa") * F.col("_sb"))
            .cast("long")
            .alias("a"),
        )
    )
    return tri.unionByName(
        tri.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "a"
        )
    )


def power_iteration_top_direction(
    matrix: DataFrame, rounds: int = 3
) -> DataFrame:
    """``rounds`` exact-integer power-iteration steps over a symmetric
    (i, j, a) int64 matrix table → (i, v) with |v| ≤ 1000.

    The matrix is rescaled ONCE to |a'| ≤ 10⁶ and the vector after each
    w = A'·v matmul to |v| ≤ 1000 — both by truncating integer division
    with a 1-row max scalar (broadcast cross join), keeping every
    intermediate below 64·10⁶·10³ < int64 max with zero float drift.

    Contract: the EXACT r-round iterate (engine-bit-identical), not a
    converged eigenvector — convergence needs O(log(1/ε)/log(λ1/λ2))
    rounds, so a near-flat spectrum (λ2/λ1 → 1, e.g. isotropic random
    vectors) converges arbitrarily slowly no matter the implementation,
    while a dominant direction is found in a few rounds (pinned by the
    planted-direction test).
    """
    sa = matrix.agg(
        (
            (F.max(F.abs(F.col("a"))).cast("long") / F.lit(1000000)).cast("long")
            + 1
        ).alias("s")
    )
    a2 = matrix.crossJoin(F.broadcast(sa)).select(
        "i", "j", exact_div(F.col("a"), F.col("s")).alias("a2")
    )
    v = a2.select("i").distinct().select("i", F.lit(1000).cast("long").alias("v"))
    for _ in range(rounds):
        w = (
            a2.join(F.broadcast(v.select(F.col("i").alias("j"), F.col("v"))), "j")
            .groupBy("i")
            .agg(F.sum(F.col("a2") * F.col("v")).alias("w"))
        )
        sv = w.agg(
            (
                (F.max(F.abs(F.col("w"))).cast("long") / F.lit(1000)).cast("long")
                + 1
            ).alias("sv")
        )
        v = w.crossJoin(F.broadcast(sv)).select(
            "i", exact_div(F.col("w"), F.col("sv")).alias("v")
        )
    return v
