"""MERGE upsert and CDC changelog replay (operators/state.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc, merge_upsert


def test_merge_upsert_update_insert_delete_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["k", "name", "bal"],
    )
    # k=1 update, k=3 delete, k=9 insert, k=5 delete-of-unmatched (no-op)
    source = spark.createDataFrame(
        [
            (1, "a2", 11.0, False),
            (3, "c2", 0.0, True),
            (9, "new", 90.0, False),
            (5, "ghost", 0.0, True),
        ],
        ["k", "name", "bal", "_del"],
    )
    got = {r["k"]: (r["name"], r["bal"]) for r in merge_upsert(
        target, source, ["k"], delete_col="_del"
    ).collect()}
    assert got == {
        1: ("a2", 11.0),   # matched update
        2: ("b", 20.0),    # untouched keep
        4: ("d", 40.0),    # untouched keep
        9: ("new", 90.0),  # unmatched insert
        # 3 deleted; 5's delete of a missing key is a no-op insert-nothing
    }


def test_merge_upsert_without_delete_col(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "v"])
    source = spark.createDataFrame([(1, "a2"), (2, "b")], ["k", "v"])
    got = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "a2", 2: "b"}


def test_apply_cdc_latest_wins_and_delete(spark):
    snap = spark.createDataFrame(
        [(1, "init", 0), (2, "init", 0), (3, "init", 0)], ["k", "status", "v"]
    )
    # k=1: U then D (delete wins - later seq); k=2: D then U (update wins);
    # k=4: I (insert); k=3: untouched
    changes = spark.createDataFrame(
        [
            (1, 1, "U", "up", 5),
            (1, 2, "D", "gone", 0),
            (2, 1, "D", "gone", 0),
            (2, 2, "U", "up", 7),
            (4, 1, "I", "new", 9),
        ],
        ["k", "seq", "op", "status", "v"],
    )
    got = {r["k"]: (r["status"], r["v"]) for r in apply_cdc(
        snap, changes, ["k"], ["seq"], "op"
    ).collect()}
    assert got == {2: ("up", 7), 3: ("init", 0), 4: ("new", 9)}


# ---- property: apply_cdc == sequential pandas replay ----------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _changelogs(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for seq in range(n):
        k = draw(st.integers(0, 6))
        op = draw(st.sampled_from(["I", "U", "D"]))
        rows.append((k, seq, op, f"s{seq}", draw(st.integers(0, 99))))
    snap_keys = draw(st.lists(st.integers(0, 9), max_size=6, unique=True))
    return rows, snap_keys


@settings(max_examples=12, deadline=None)
@given(_changelogs())
def test_apply_cdc_matches_sequential_replay(spark, data):
    from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc

    rows, snap_keys = data
    snap = spark.createDataFrame(
        [(k, "init", -1) for k in snap_keys] or [],
        "k bigint, status string, v bigint",
    )
    changes = spark.createDataFrame(rows, "k bigint, seq bigint, op string, status string, v bigint")
    got = {
        r["k"]: (r["status"], r["v"])
        for r in apply_cdc(snap, changes, ["k"], ["seq"], "op").collect()
    }
    # reference: replay the log in seq order over a dict
    state = {k: ("init", -1) for k in snap_keys}
    for k, seq, op, status, v in sorted(rows, key=lambda r: r[1]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (status, v)
    # apply_cdc's delete removes the key only if D is the LATEST op for it;
    # sequential replay agrees because any later I/U re-creates the key
    assert got == state


def test_snapshot_diff_statuses(spark):
    from noaa_ais_glue_lakehouse_spark.operators.state import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "k bigint, s string, v bigint",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b2", 20), (3, None, 30), (5, "e", 50)],
        "k bigint, s string, v bigint",
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=1 unchanged (dropped), k=3 unchanged incl. null-safe equal NULLs
    assert got == {2: "changed", 4: "removed", 5: "added"}
    row = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}[2]
    assert (row["old_s"], row["new_s"]) == ("b", "b2")


def test_apply_cdc_tied_sequence_never_mixes_columns(spark):
    """Two changes with IDENTICAL sequence values must resolve to ONE of
    the two rows intact — never a per-column mix ('frankenrow')."""
    from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc

    snap = spark.createDataFrame(
        [(1, "old", 1.0)], "k int, status string, v double"
    )
    changes = spark.createDataFrame(
        [
            (1, 10, "U", "a", 100.0),
            (1, 10, "U", "b", 200.0),  # same seq=10: full-tuple tiebreak
        ],
        "k int, seq int, op string, status string, v double",
    )
    out = apply_cdc(snap, changes, keys=["k"], seq_cols=["seq"]).collect()
    assert len(out) == 1
    row = (out[0]["status"], out[0]["v"])
    # full-tuple max picks ('b', 200.0) deterministically; the essential
    # property is that it is one of the REAL rows
    assert row == ("b", 200.0)


def test_snapshot_diff_null_key_rows(spark):
    """NULL-key rows present and unchanged on both sides must NOT be
    reported; a changed NULL-key row must be 'changed', not 'added'."""
    from noaa_ais_glue_lakehouse_spark.operators.state import snapshot_diff

    old = spark.createDataFrame(
        [(None, 1.0), (1, 2.0)], "k int, v double"
    )
    new_same = spark.createDataFrame(
        [(None, 1.0), (1, 2.0)], "k int, v double"
    )
    assert snapshot_diff(old, new_same, ["k"]).count() == 0
    new_changed = spark.createDataFrame(
        [(None, 9.0), (1, 2.0)], "k int, v double"
    )
    rows = snapshot_diff(old, new_changed, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["change"] == "changed"
    assert rows[0]["k"] is None


def test_apply_cdc_handles_map_payload_columns(spark):
    """Map-typed payload columns can't join the ordering struct (maps
    aren't orderable) but must still ride in the carried payload."""
    from noaa_ais_glue_lakehouse_spark.operators.state import apply_cdc

    snap = spark.createDataFrame(
        [(1, {"a": "1"})], "k int, props map<string,string>"
    )
    changes = spark.createDataFrame(
        [(1, 5, "U", {"b": "2"}), (2, 6, "I", {"c": "3"})],
        "k int, seq int, op string, props map<string,string>",
    )
    out = {
        r["k"]: dict(r["props"])
        for r in apply_cdc(snap, changes, keys=["k"], seq_cols=["seq"]).collect()
    }
    assert out == {1: {"b": "2"}, 2: {"c": "3"}}
