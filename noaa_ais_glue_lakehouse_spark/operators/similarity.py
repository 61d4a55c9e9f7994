"""Vector similarity search over embedding columns (array<float>).

Training-data-pipeline extension (SURVEY §7.2 phase 9): brute-force cosine
top-k as the exact baseline, plus an LSH-bucketed approximate variant as
the scale path. Dot products are native ``zip_with``/``aggregate`` column
expressions (JVM-side, no Python). Deterministic top-k via (score desc,
id asc) tie-breaking.

Scale notes: brute-force is O(|Q|·|C|) — fine when the query set is small
(broadcast the queries); the LSH path buckets candidates by random
hyperplane signs so each query only scores its bucket's candidates, one
equi-join shuffle. For billion-vector corpora the same plan holds with the
bucket join pre-partitioned (bucketed tables) and signatures precomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a, b):
    """Cosine similarity between two array<numeric> columns (double)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Cross join (queries broadcast — the small side by construction) →
    per-pair cosine → rank per query with deterministic ties → keep k.
    Excludes self-matches on id equality.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via a splitmix-style
    integer mix — reproducible across engines and runs without RNG state.
    """
    vals = []
    for j in range(dim):
        x = (plane_idx * 1_000_003 + j * 97 + 12345) & 0xFFFFFFFF
        x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
        x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
        x = x ^ (x >> 16)
        vals.append((x / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables, each bucketing on the sign bits
    of ``n_planes`` hyperplanes (OR-amplification): a true neighbor at
    angular agreement p is recovered with probability 1-(1-p^b)^L instead
    of the single-table p^b, which is what makes recall tunable rather
    than hoped-for. Candidates are the union over tables of same-bucket
    pairs; each candidate is scored exactly once (distinct before scoring)
    so precision of scores is exact.

    Scale shape: corpus rows are exploded L× into (table, bucket) keys —
    one equi-join shuffle against the broadcast query signatures, never a
    cross product. Raise ``n_planes`` (smaller buckets) as the corpus
    grows and ``n_tables`` to buy recall back; both are embarrassingly
    partition-parallel. Recall vs ``brute_force_topk`` is asserted in
    ``tests/test_similarity.py::test_lsh_recall_at_k``.
    """
    from pyspark.sql import Window

    def signature(vec, table: int):
        bits = []
        for p in range(n_planes):
            plane = F.array(
                *[F.lit(v) for v in _hyperplane(dim, table * n_planes + p)]
            )
            bits.append(
                F.when(_dot(vec, plane) >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
            )
        sig = bits[0]
        for x in bits[1:]:
            sig = sig.bitwiseOR(x)
        return sig

    def keys(vec):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), signature(vec, t).alias("sig")
                    )
                    for t in range(n_tables)
                ]
            )
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        keys(F.col(vec_col)).alias("_k"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        keys(F.col(vec_col)).alias("_k"),
    )
    cands = (
        c.join(F.broadcast(q), "_k")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()
    )
    scored = cands.withColumn(
        "score", F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
    )
