"""Stateful-batch operators: snapshot seeds, seeded unions, state merge
(SURVEY §2.7 U1, §2.3 J2, §2.9 T1-T4).

The reference simulates a stream with date-window batch runs + persisted
state snapshots; these operators are the composable pieces. The Structured
Streaming analogs live in ``noaa_ais_glue_lakehouse_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def prepare_seeded_union(
    state_df: DataFrame,
    window_df: DataFrame,
    session_col: str,
    seed_col: str = "seed_session_id",
) -> DataFrame:
    """U1 — tag state rows is_seed=True and carry their session id as the
    seed; tag window rows False/null; unionByName allowing missing columns.

    Reference: ``utils/common_functions_curated.py:255-281``.
    """
    seeds = state_df.withColumn("is_seed", F.lit(True)).withColumnRenamed(
        session_col, seed_col
    )
    fresh = window_df.withColumn("is_seed", F.lit(False)).withColumn(
        seed_col, F.lit(None).cast("long")
    )
    return seeds.unionByName(fresh, allowMissingColumns=True)


def merge_state_full_outer(
    state_df: DataFrame,
    delta_df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    """J2 — full-outer merge of running aggregates with window deltas:
    sums add, mins take least, maxes take greatest, with null-coalescing
    on both sides.

    Reference: ``transformations/facts/fact_voyage_summary.py:105-161``
    (the legacy incremental path — dead code there per SURVEY §7.4.1, but
    the merge semantics are the engine's incremental-aggregate primitive;
    on Delta-backed tables this is exactly ``MERGE INTO``).
    """
    s = state_df.alias("s")
    d = delta_df.alias("d")
    merged = s.join(d, keys, "full_outer")
    exprs = [F.coalesce(*[F.col(f"s.{k}"), F.col(f"d.{k}")]).alias(k) for k in keys]
    for c in sum_cols:
        exprs.append(
            (
                F.coalesce(F.col(f"s.{c}"), F.lit(0)) + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        exprs.append(
            F.when(
                F.col(f"s.{c}").isNull(), F.col(f"d.{c}")
            ).when(
                F.col(f"d.{c}").isNull(), F.col(f"s.{c}")
            ).otherwise(F.least(F.col(f"s.{c}"), F.col(f"d.{c}"))).alias(c)
        )
    for c in max_cols:
        exprs.append(
            F.when(
                F.col(f"s.{c}").isNull(), F.col(f"d.{c}")
            ).when(
                F.col(f"d.{c}").isNull(), F.col(f"s.{c}")
            ).otherwise(F.greatest(F.col(f"s.{c}"), F.col(f"d.{c}"))).alias(c)
        )
    return merged.select(*exprs)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames: matched target rows are
    replaced by the source row (WHEN MATCHED THEN UPDATE SET *),
    unmatched source rows are inserted (WHEN NOT MATCHED THEN INSERT *),
    unmatched target rows are kept — and, when ``delete_col`` names a
    boolean column on the source, matched rows with it true are deleted
    instead of updated (WHEN MATCHED AND cond THEN DELETE).

    The result is the merged snapshot; pairing it with the
    dynamic-partition-overwrite writer (sources/writers.py) gives the
    parquet-era equivalent of a Delta/Iceberg MERGE — rewrite only the
    partitions the merged rows land in. Columns are taken positionally
    from the TARGET schema; the source must carry the same columns
    (extra source columns beyond ``delete_col`` are dropped).

    Scale shape: upsert = one anti-join (target rows whose key has no
    source row) + union with the surviving source rows — both hash
    shuffles on the merge key, no window, no full-outer wide row. At 100
    TB the anti-join side is the big table and the source is the day's
    delta; with both bucketed on the key the exchange disappears
    entirely (tests/test_bucketing.py shows the layout).
    """
    out_cols = target.columns
    live = source
    if delete_col is not None:
        live = source.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    live = live.select(*out_cols)
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(live)


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete rows ordered by a
    sequence) to a snapshot — the change-data-capture replay every
    lakehouse ingestion pipeline runs against Debezium/DMS-style feeds.

    Per key, only the LATEST change (by ``seq_cols``, ties broken by the
    full tuple) decides: upsert ops replace/insert the row, the delete op
    removes the key; keys untouched by the changelog pass through. The
    whole replay is one max_by aggregation over the changelog (map-side
    combinable — a key changed 10⁶ times reduces to one row before the
    shuffle) plus the same anti-join + union as :func:`merge_upsert`.
    """
    value_cols = [c for c in changes.columns if c not in keys]
    # ONE max_by of the whole payload struct, ordered by (seq, payload):
    # per-column max_by calls would each break seq ties independently and
    # could stitch a "frankenrow" mixing columns from different tied
    # changes (op from one, values from another). The payload inside the
    # ordering struct IS the documented full-tuple tiebreak — restricted
    # to ORDERABLE column types (maps/arrays-of-maps can ride in the
    # payload but not the sort key); ties identical on every orderable
    # column resolve to ONE intact row either way, just not a pinned one.
    orderable = {
        c
        for c in value_cols
        if not isinstance(
            changes.schema[c].dataType, T.MapType
        )
    }
    payload = F.struct(*[F.col(c) for c in value_cols])
    order_key = F.struct(
        *[F.col(c) for c in seq_cols],
        *[F.col(c) for c in value_cols if c in orderable],
    )
    latest = changes.groupBy(*keys).agg(
        F.max_by(payload, order_key).alias("_p")
    )
    latest = latest.select(
        *keys, *[F.col(f"_p.{c}").alias(c) for c in value_cols]
    )
    live = latest.filter(F.col(op_col).isin(*upsert_ops)).drop(op_col, *seq_cols)
    dropped_keys = latest.select(*keys)  # any changed key leaves the snapshot row
    kept = snapshot.join(dropped_keys, keys, "left_anti")
    return kept.unionByName(live.select(*snapshot.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    change_status_col: str = "change",
) -> DataFrame:
    """Reconcile two snapshot versions: one row per key that differs,
    tagged 'added' (key only in new), 'removed' (only in old), or
    'changed' (both, any non-key column differs) — the table-diff a
    lakehouse runs to audit what an ingest actually did, and the
    generator for an I/U/D changelog (:func:`apply_cdc`'s inverse).

    Unchanged keys are dropped INSIDE the join projection, so the output
    is |changes|-sized. Comparison is per-column null-safe equality
    (eqNullSafe), not a serialized-row hash, so column order and
    encoding can't cause false diffs. One full-outer hash join on the
    key; bucket both versions and the exchange disappears.
    """
    value_cols = [c for c in new.columns if c not in keys]
    # presence markers, NOT key-isNotNull: the join matches NULL keys via
    # eqNullSafe, so a NULL-key row present on both sides would read as
    # "absent from old" under an isNotNull test and be mislabeled 'added'
    o = old.withColumn("_in_o", F.lit(True)).alias("o")
    n = new.withColumn("_in_n", F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("o._in_o").isNotNull()
    in_new = F.col("n._in_n").isNotNull()
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    key_exprs = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    old_vals = [F.col(f"o.{c}").alias(f"old_{c}") for c in value_cols]
    new_vals = [F.col(f"n.{c}").alias(f"new_{c}") for c in value_cols]
    return (
        joined.withColumn(change_status_col, status)
        .filter(F.col(change_status_col).isNotNull())
        .select(*key_exprs, F.col(change_status_col), *old_vals, *new_vals)
    )
