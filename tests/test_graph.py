"""PageRank operator: fixed-point sanity and parity with a plain
power-iteration reference implementing the identical recurrence.
"""

from __future__ import annotations

import pytest

from noaa_ais_glue_lakehouse_spark.operators.graph import pagerank


def test_pagerank_symmetric_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src", "dst", "w", iterations=5).collect()
    }
    # a symmetric cycle's stationary distribution is uniform, and uniform
    # is also the starting vector -> every iterate is exactly 1/3
    for v in out.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_pagerank_matches_power_iteration(spark):
    edges_py = [
        ("a", "b", 2.0),
        ("a", "c", 1.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("d", "a", 1.0),  # d is a source-only node (rank sink for itself)
    ]
    edges = spark.createDataFrame(edges_py, ["src", "dst", "w"])
    iters, d = 4, 0.85

    nodes = sorted({s for s, _, _ in edges_py} | {t for _, t, _ in edges_py})
    out_w = {}
    for s, _, w in edges_py:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(iters):
        incoming = {n: 0.0 for n in nodes}
        for s, t, w in edges_py:
            incoming[t] += rank[s] * w / out_w[s]
        rank = {
            n: (1 - d) / len(nodes) + d * incoming[n] for n in nodes
        }

    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "src", "dst", "w", iterations=iters, damping=d
        ).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n] == pytest.approx(rank[n], abs=1e-12)


def test_pagerank_unweighted_defaults_to_uniform_edges(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], ["src", "dst"]
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src", "dst", iterations=3).collect()
    }
    assert out["a"] > out["b"] and abs(out["b"] - out["c"]) < 1e-12
