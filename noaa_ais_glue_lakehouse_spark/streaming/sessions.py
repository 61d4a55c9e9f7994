"""Structured Streaming analogs of the batch-simulated stateful operators
(SURVEY §2.9): the reference emulates a stream with date-window batch runs
plus persisted snapshots; these are the native streaming forms.

Mapping (SURVEY §2.9 table):

- T1 seeded gap sessionization  → ``session_window`` aggregation with a
  watermark (the >3h gap rule is exactly a session window's gap timeout);
- T2 state snapshot update      → streaming ``latest_per_entity`` via
  max_by aggregation in update mode;
- T7 late data                  → the watermark replaces the reference's
  24h "gap cushion" (``fact_voyage_summary.py:105-151``).

Every transformation here is expressed so it works on BOTH a batch
DataFrame and a streaming one — ``session_window`` and the aggregations
are mode-agnostic — so unit tests exercise the exact expressions in
batch, and a streaming smoke test runs the file-source → memory-sink
loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionized_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: str = "3 hours",
    watermark: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """T1 streaming form — per-(entity, session-window) aggregate.

    ``session_window(ts, gap)`` merges events whose gaps are < gap into
    one window — the same semantics as the batch prefix-sum sessionizer
    (``operators/sessionize.py``) with ids replaced by (start, end)
    window bounds. Works on batch DataFrames too (no watermark needed
    there), which is how the equivalence test pins it to the batch
    operator.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return (
        src.groupBy(F.col(entity_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .drop("session_window")
    )


def latest_state(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """T2 streaming form — last-known row per entity via ``max_by``.

    In a streaming query run with ``outputMode("update")`` this emits the
    refreshed snapshot rows each microbatch — the continuous version of
    the dated state-snapshot sink (``utils/state_io.py:36-45``).
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    aggs = [F.max(ts_col).alias(ts_col)] + [
        F.max_by(c, F.col(ts_col)).alias(c) for c in value_cols
    ]
    return src.groupBy(entity_col).agg(*aggs)


def stateful_sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """T1 as a *custom stateful operator*: per-entity voyage-id assignment
    across microbatches via ``applyInPandasWithState``.

    Unlike :func:`sessionized_stats` (which re-keys sessions by window
    bounds), this emits every event with its running session ordinal —
    the exact streaming analog of the batch prefix-sum sessionizer plus
    the prior-day state seed (``operators/sessionize.sessionize`` with
    ``seed_col``): state = (last event time, last session id) per entity,
    exactly what the reference persists in its daily snapshots
    (``utils/state_io.py``).

    Assumes event-time-ordered arrival per entity across batches (the
    drop-directory replay case); late data needs the session_window path.
    Entity ids are LONG and timestamps TIMESTAMP in the emitted schema.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{entity_col} long, {ts_col} timestamp, session_id long"
    state_schema = "last_ts timestamp, last_sid long"

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        batch = pd.concat(list(pdfs)).sort_values(ts_col)
        if state.exists:
            last_ts, last_sid = state.get
        else:
            last_ts, last_sid = None, None
        sids = []
        for t in batch[ts_col]:
            if last_ts is not None and (t - last_ts).total_seconds() > gap_seconds:
                last_sid = (last_sid or 0) + 1
            elif last_sid is None:
                last_sid = 0
            last_ts = t
            sids.append(last_sid)
        last_py = (
            last_ts.to_pydatetime() if hasattr(last_ts, "to_pydatetime") else last_ts
        )
        state.update((last_py, int(last_sid if last_sid is not None else 0)))
        yield pd.DataFrame(
            {
                entity_col: batch[entity_col],
                ts_col: batch[ts_col],
                "session_id": sids,
            }
        )

    return (
        df.groupBy(entity_col)
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals(
    df: DataFrame,
    entity_col: str,
    cents_col: str = "value_cents",
) -> DataFrame:
    """Per-entity running (count, integer-cents sum) across microbatches
    via ``transformWithState`` — Spark 4's arbitrary-stateful-processing
    API (the successor of ``applyInPandasWithState``): explicit typed
    ``ValueState`` per key, Arrow-batched row iteration, update-mode
    emission of the refreshed totals each time a key appears in a batch.

    This is the streaming form of the daily-partials → running-rollup
    chain (T2/T5): the ValueState the processor keeps IS the state
    snapshot the reference persists to dated parquet between batch runs
    (``utils/state_io.py``), maintained continuously instead. Sums ride
    integer cents so the emitted totals are exact and order-independent —
    batch-replay order across microbatches cannot change the result.

    Scale shape: state is O(|entities|) longs in the state store, input
    is streamed through Arrow batches per key group; nothing is
    collected. Works identically under availableNow replay and a live
    source.

    The transformWithState Python worker speaks protobuf to the JVM state
    server; in environments without the protobuf package the operator
    falls back to an ``applyInPandasWithState`` processor with the
    IDENTICAL per-key state transition and emission (the equivalence is
    what tests pin), so callers see one API either way.
    """
    out_schema = f"{entity_col} long, n long, {cents_col} long"

    try:  # transformWithState requires google.protobuf at worker runtime
        from google.protobuf import descriptor  # noqa: F401

        _has_protobuf = True
    except ImportError:  # pragma: no cover - depends on environment
        _has_protobuf = False

    if _has_protobuf:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class _RunningTotals(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getValueState("totals", "n long, cents long")

            def handleInputRows(self, key, rows, timerValues):
                import pandas as pd

                if self._state.exists():
                    n, cents = self._state.get()
                else:
                    n, cents = 0, 0
                for pdf in rows:
                    n += int(len(pdf))
                    cents += int(pdf[cents_col].sum())
                self._state.update((n, cents))
                yield pd.DataFrame(
                    {entity_col: [key[0]], "n": [n], cents_col: [cents]}
                )

            def close(self) -> None:
                pass

        return df.groupBy(entity_col).transformWithStateInPandas(
            _RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += int(len(pdf))
            cents += int(pdf[cents_col].sum())
        state.update((int(n), int(cents)))
        yield pd.DataFrame({entity_col: [key[0]], "n": [n], cents_col: [cents]})

    return df.groupBy(entity_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_merge_upsert_sink(
    stream: DataFrame,
    target_dir: str,
    checkpoint: str,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
):
    """Streaming MERGE sink via ``foreachBatch``: each microbatch is
    collapsed to its latest row per key, merged into the parquet target
    with :func:`~noaa_ais_glue_lakehouse_spark.operators.state.merge_upsert`,
    and the target rewritten — the continuously-maintained state snapshot
    the reference rebuilt once per daily batch run
    (``utils/state_io.py``), and the standard streaming-upsert pattern a
    Delta ``MERGE`` sink runs per batch.

    foreachBatch is the escape hatch for sinks the streaming engine has
    no native writer for: the batch DataFrame inside the callback is a
    plain batch frame, so the whole batch operator library applies. The
    rewrite here is read-merge-overwrite on parquet (atomic enough under
    a single writer; a table format would make it transactional) — batch
    contents are collapsed to |keys in batch| rows BEFORE the merge, so
    per-batch cost is O(target + batch-keys), never O(history).

    Returns the StreamingQuery (availableNow; caller awaits).
    """
    from noaa_ais_glue_lakehouse_spark.operators.sessionize import (
        latest_per_entity,
    )
    from noaa_ais_glue_lakehouse_spark.operators.state import merge_upsert

    spark = stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        # collapse on the FULL key list: partitioning on keys[0] alone
        # would keep one row per first component and silently drop
        # updates for composite keys
        latest = latest_per_entity(batch_df, keys, ts_col, tiebreak_cols)
        base = target_dir.rstrip("/")
        if os.path.exists(base):
            # target exists: a read/merge failure here must PROPAGATE —
            # swallowing it would fall through to merged=latest and
            # overwrite the accumulated snapshot with one batch
            target = spark.read.parquet(target_dir)
            merged = merge_upsert(target, latest, keys)
        else:  # genuinely the first batch: no target yet
            merged = latest
        # stage-then-swap: the merged plan READS the files it replaces, so
        # write to a staging dir (distributed, never collected) and swap
        # directories after the write commits — the parquet-era version of
        # the snapshot-commit a table format does transactionally
        staging = f"{base}._staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{base}._old_{batch_id}"
        if os.path.exists(base):
            os.rename(base, old)
        os.rename(staging, base)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream over a drop directory — the streaming analog of
    the reference's daily-drop raw zone (``ingestion/ingest_2024.sh``)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )


def start_partitioned_stream_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str],
    trigger_once: bool = True,
):
    """S4 streaming form — partitioned parquet sink with checkpointing.

    ``trigger_once`` drains everything available then stops (the batch-
    compatible mode); continuous jobs pass False and their own trigger.
    Returns the StreamingQuery handle.
    """
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_cols)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
    until the watermark passes it, so duplicate deliveries inside the
    lateness bound are suppressed while state stays finite — the
    at-least-once → effectively-once repair every ingest topology needs
    (plain ``dropDuplicates`` on a stream grows state forever).

    Mode-agnostic like the rest of this module: on a batch DataFrame it
    degrades to plain ``dropDuplicates`` over the same keys (batch
    inputs are finite, so unbounded state is not a concern and the
    semantics coincide when duplicates fall inside the watermark).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
