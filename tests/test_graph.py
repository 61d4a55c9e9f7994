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


# ---- dup-graph analytics (q235-q237): python parity at sf0.001 ----

def _dup_edges_py(spark, sf_dir):
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    fp = {}
    for r in docs:
        toks = r["text"].lower().split()[:8]
        f = hashlib.md5(" ".join(toks).encode()).hexdigest()
        fp.setdefault(f, set()).add(r["doc_id"])
    edges = set()
    for ids in fp.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                edges.add((a, b))
    return edges


def test_label_propagation_matches_python(spark):
    from noaa_ais_glue_lakehouse_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    edges = _dup_edges_py(spark, sf)
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v in adj:
            counts: dict[int, int] = {}
            for u in adj[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            new[v] = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    expect: dict[int, int] = {}
    for v, c in lab.items():
        expect[c] = expect.get(c, 0) + 1
    got = {
        r["community"]: r["size"]
        for r in catalog.queries()["q235_label_propagation"](
            spark, sf
        ).collect()
    }
    assert got == expect


def test_kcore_matches_python(spark):
    from noaa_ais_glue_lakehouse_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    edges = _dup_edges_py(spark, sf)
    cur = set(edges)
    for _ in range(3):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 2}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    nodes = {v for e in cur for v in e}
    row = catalog.queries()["q236_kcore_decomposition"](spark, sf).collect()[0]
    assert (row["n_nodes"], row["n_edges"]) == (len(nodes), len(cur))


def test_assortativity_matches_python(spark):
    import math

    from noaa_ais_glue_lakehouse_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    edges = _dup_edges_py(spark, sf)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pts = [(deg[a], deg[b]) for a, b in edges]
    pts += [(y, x) for x, y in pts]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = catalog.queries()["q237_degree_assortativity"](
        spark, sf
    ).collect()[0]
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - round(r, 6)) < 1e-9
