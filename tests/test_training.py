"""Training-data assembly: deterministic sampling, split assignment,
sequence packing (operators/training.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.training import (
    deterministic_stratified_sample,
    pack_sequences,
    train_val_test_split,
)


def _events(spark, n=2000):
    rows = [(i, ["view", "click", "purchase"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, ["event_id", "event_type"])


def test_stratified_sample_rates_and_determinism(spark):
    df = _events(spark)
    got = deterministic_stratified_sample(
        df, "event_id", "event_type", {"view": 0.1, "click": 0.5}
    )
    counts = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    base = {r["event_type"]: r["n"] for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts["purchase"] == base["purchase"]  # default rate 1.0 keeps all
    assert 0.05 < counts["view"] / base["view"] < 0.2
    assert 0.4 < counts["click"] / base["click"] < 0.6
    # determinism: identical id set on re-run
    again = deterministic_stratified_sample(
        df, "event_id", "event_type", {"view": 0.1, "click": 0.5}
    )
    assert sorted(r[0] for r in got.select("event_id").collect()) == sorted(
        r[0] for r in again.select("event_id").collect()
    )


def test_split_partitions_and_covers(spark):
    df = _events(spark)
    got = train_val_test_split(df, "event_id", 0.1, 0.1)
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # partition: every row exactly once
    assert 0.05 < counts["val"] / 2000 < 0.15
    assert 0.05 < counts["test"] / 2000 < 0.15
    assert counts["train"] > 1000


def test_pack_sequences_invariants(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_sequences(df, "doc_id", "n_tokens", context_tokens=256, n_shards=8)
    data = packed.orderBy("shard", "doc_id").collect()
    assert len(data) == 500  # every doc packed exactly once
    by_shard: dict[int, list] = {}
    for r in data:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        # bin ids are the running-sum chop: non-decreasing in id order,
        # starting at 0, and tokens_before of the first doc in a bin is
        # below bin_id*C + C
        cum = 0
        for r in shard_rows:
            assert r["bin_id"] == cum // 256
            cum += r["n_tokens"]


def test_pack_sequences_null_token_counts(spark):
    """NULL token counts contribute nothing to the running sum (SQL SUM
    semantics) and the row still lands in a bin."""
    rows = [(1, 100), (2, None), (3, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = pack_sequences(df, "doc_id", "n_tokens", context_tokens=150, n_shards=1)
    assert got.count() == 3
    assert got.filter("bin_id IS NULL").count() == 0


def test_mixture_sample_budget_invariants(spark):
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
    )

    rows = [(i, ["en", "fr"][i % 2], 10 + (i * 13) % 40) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
    got = mixture_sample_to_budget(
        df, "doc_id", "lang", "n_tokens", {"en": 500}, default_budget=200
    )
    data = got.collect()
    per_class: dict[str, list] = {}
    for r in data:
        per_class.setdefault(r["lang"], []).append(r)
    budgets = {"en": 500, "fr": 200}
    for lang, cls_rows in per_class.items():
        total = sum(r["n_tokens"] for r in cls_rows)
        max_doc = max(r["n_tokens"] for r in cls_rows)
        # greedy prefix: reaches the budget, overshoots by at most one doc
        assert total >= budgets[lang] or len(cls_rows) == 200
        assert total < budgets[lang] + max_doc
        # every kept doc's preceding cumulative count is under budget
        assert all(r["tokens_before"] < budgets[lang] for r in cls_rows)
    # determinism: identical selection on re-run
    again = mixture_sample_to_budget(
        df, "doc_id", "lang", "n_tokens", {"en": 500}, default_budget=200
    )
    assert sorted(r["doc_id"] for r in data) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mixture_sample_budget_smaller_than_any_doc(spark):
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
    )

    df = spark.createDataFrame([(1, "en", 100), (2, "en", 100)], ["doc_id", "lang", "n_tokens"])
    got = mixture_sample_to_budget(
        df, "doc_id", "lang", "n_tokens", {}, default_budget=1
    ).collect()
    # tokens_before of the first doc is 0 < 1: exactly one doc survives
    assert len(got) == 1


def test_pack_sequences_group_cols_isolate_splits(spark):
    from noaa_ais_glue_lakehouse_spark.operators.training import pack_sequences

    rows = [(i, ["train", "val"][i % 2], 100) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "split", "n_tokens"])
    packed = pack_sequences(
        df, "doc_id", "n_tokens", context_tokens=256, n_shards=4, group_cols=["split"]
    ).collect()
    # each (split, shard) packs independently from bin 0
    by_group: dict[tuple, list] = {}
    for r in packed:
        by_group.setdefault((r["split"], r["shard"]), []).append(r)
    for rows_g in by_group.values():
        rows_g.sort(key=lambda r: r["doc_id"])
        assert rows_g[0]["bin_id"] == 0  # every group restarts at bin 0
        # 100-token docs in 256-token bins: bin increments every 2-3 docs
        bins = [r["bin_id"] for r in rows_g]
        assert bins == sorted(bins)


def test_leakage_safe_split_families_share_split(spark):
    from noaa_ais_glue_lakehouse_spark.operators.training import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    # three families: {1,2,3}, {10,11}, {50,60,70} (chain)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (50, 60), (60, 70)], "id_a bigint, id_b bigint"
    )
    got = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        docs, "doc_id", pairs
    ).collect()}
    assert len(got) == 200  # every doc assigned exactly once
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]
    assert got[50] == got[60] == got[70]
    # unpaired docs use their own id (same as plain split)
    from noaa_ais_glue_lakehouse_spark.operators.training import train_val_test_split
    plain = {r["doc_id"]: r["split"] for r in train_val_test_split(
        docs, "doc_id"
    ).collect()}
    unpaired = set(range(200)) - {1, 2, 3, 10, 11, 50, 60, 70}
    assert all(got[i] == plain[i] for i in unpaired)
