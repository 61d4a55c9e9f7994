"""Connected components vs a pure-Python union-find reference, and
survivor selection."""

from __future__ import annotations

import random

from noaa_ais_glue_lakehouse_spark.operators.dedup import (
    connected_components,
    dedup_by_components,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def test_components_match_union_find_random_graph(spark):
    rng = random.Random(11)
    pairs = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(200), rng.randrange(200)) for _ in range(150))
                  if a != b})
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(pairs)
    assert got == want


def test_components_chain(spark):
    # a path graph needs label propagation across multiple hops
    chain = [(i, i + 1) for i in range(0, 30)]
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0}  # one component labeled by min id


def test_dedup_by_components(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"]
    )
    out = dedup_by_components(docs, pairs, "doc_id")
    # components {0,1,2} -> keep 0; {4,5} -> keep 4; 3 untouched
    assert {r["doc_id"] for r in out.collect()} == {0, 3, 4}


def test_quality_survivor_null_quality_loses(spark):
    """A NULL-quality member must never beat a scored member (struct
    ordering is nulls-first, so the negated key needs the -inf
    coalesce)."""
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        dedup_by_components,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 1.0)], "doc_id bigint, q double"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    kept = [
        r["doc_id"]
        for r in dedup_by_components(
            df, pairs, "doc_id", quality_col="q"
        ).collect()
    ]
    assert kept == [2]
