"""Integer linear algebra operators: exact numpy parity for the
power-iteration iterate (the bit-identical contract the q277 oracle
relies on) and planted-direction convergence (the behavior the operator
exists for when the spectrum has a real gap).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.linalg import (
    integer_covariance_numerators,
    power_iteration_top_direction,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_iterate(vecs: np.ndarray, rounds: int) -> np.ndarray:
    """Independent reimplementation of the exact-integer spec."""
    m = np.round(vecs * 1000).astype(np.int64)
    n, d = m.shape
    s = m.sum(axis=0)
    a = n * (m.T @ m) - np.outer(s, s)  # exact int64 covariance numerators
    sa = np.abs(a).max() // 1000000 + 1
    a2 = np.sign(a) * (np.abs(a) // sa)
    v = np.full(d, 1000, dtype=np.int64)
    for _ in range(rounds):
        w = a2 @ v
        sv = np.abs(w).max() // 1000 + 1
        v = np.sign(w) * (np.abs(w) // sv)
    return v


def test_power_iteration_exact_numpy_parity(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r["i"]: r["v"]
        for r in power_iteration_top_direction(
            integer_covariance_numerators(emb, "embedding"), rounds=3
        ).collect()
    }
    vecs = np.array(
        pq.read_table(f"{SF_DIR}/embeddings.parquet")["embedding"].to_pylist()
    )
    want = _numpy_iterate(vecs, 3)
    assert len(got) == vecs.shape[1]
    for i in range(vecs.shape[1]):
        assert got[i + 1] == want[i], f"dim {i}: {got[i + 1]} != {want[i]}"


def test_power_iteration_converges_on_planted_direction(spark):
    """With a dominant direction (big spectral gap), 3 rounds recover it:
    |cos(v3, u)| >= 0.99."""
    rng_free = [((k * 2654435761) % 97) / 97.0 - 0.5 for k in range(200 * 8)]
    d = 8
    u = np.array([1.0, -1.0, 0.5, 0.0, 0.25, -0.5, 0.0, 1.0])
    u /= np.linalg.norm(u)
    rows = []
    for r in range(200):
        noise = np.array(rng_free[r * d : (r + 1) * d]) * 0.05
        sign = 1.0 if r % 2 == 0 else -1.0
        rows.append((r, (sign * u + noise).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    v = power_iteration_top_direction(
        integer_covariance_numerators(df, "embedding"), rounds=3
    )
    got = {r["i"]: r["v"] for r in v.collect()}
    vec = np.array([got[i + 1] for i in range(d)], dtype=float)
    cos = abs(vec @ u) / np.linalg.norm(vec)
    assert cos >= 0.99, f"cos {cos:.4f}"
