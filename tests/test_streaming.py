"""Streaming module: batch-mode equivalence of the mode-agnostic
expressions, plus a real file-source → sink streaming smoke test."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.sessionize import sessionize, session_bounds
from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
    latest_state,
    read_event_stream,
    sessionized_stats,
    start_partitioned_stream_sink,
)


def _events(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0), 1.0),
        ("a", dt.datetime(2024, 1, 1, 1), 2.0),
        ("a", dt.datetime(2024, 1, 1, 5), 3.0),   # >3h gap → new session
        ("b", dt.datetime(2024, 1, 1, 2), 4.0),
    ]
    return spark.createDataFrame(rows, ["mmsi", "ts", "v"])


def test_session_window_matches_batch_sessionizer(spark):
    """session_window(gap) must produce the same session bounds as the
    prefix-sum sessionizer for strict-gap data."""
    df = _events(spark)
    stream_form = sessionized_stats(df, "mmsi", "ts", gap="3 hours", value_col="v")
    batch_form = session_bounds(
        sessionize(df, "mmsi", "ts", gap_seconds=3 * 3600), "mmsi", "ts", value_col="v"
    )
    got = {
        (r["mmsi"], r["session_start"], r["session_end"], r["n_events"], r["sum_v"])
        for r in stream_form.collect()
    }
    want = {
        (r["mmsi"], r["session_start"], r["session_end"], r["n_events"], r["sum_v"])
        for r in batch_form.collect()
    }
    assert got == want


def test_latest_state_batch(spark):
    df = _events(spark)
    out = {r["mmsi"]: (r["ts"], r["v"]) for r in latest_state(df, "mmsi", "ts", ["v"]).collect()}
    assert out["a"] == (dt.datetime(2024, 1, 1, 5), 3.0)
    assert out["b"] == (dt.datetime(2024, 1, 1, 2), 4.0)


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    """applyInPandasWithState continuity: day-2 events arriving in a later
    microbatch must continue day-1 voyages exactly like a batch recompute."""
    import datetime as dt

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import stateful_sessionize

    d1 = [(7, dt.datetime(2024, 1, 1, 20)), (7, dt.datetime(2024, 1, 1, 22))]
    d2 = [(7, dt.datetime(2024, 1, 2, 0, 30)), (7, dt.datetime(2024, 1, 2, 9))]
    src = str(tmp_path / "drop")
    schema = "user_id long, ts timestamp"
    # two files → two microbatches with maxFilesPerTrigger=1
    spark.createDataFrame(d1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(d2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_sessionize(stream, "user_id", "ts", gap_seconds=3 * 3600)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    want = {
        (r["mmsi"], r["ts"]): r["session_id"]
        for r in sessionize(
            spark.createDataFrame(
                [("m", t) for _, t in d1 + d2], ["mmsi", "ts"]
            ).withColumnRenamed("mmsi", "mmsi"),
            "mmsi", "ts", gap_seconds=3 * 3600,
        ).collect()
    }
    # same ordinal sequence: midnight crossing stays session 0, 9:00 is 1
    assert got[(7, d2[0][1])] == 0
    assert got[(7, d2[1][1])] == 1
    assert len(got) == 4
    assert sorted(got.values()) == sorted(
        v for (_, t), v in want.items()
    )


def test_streaming_file_source_to_partitioned_sink(spark, tmp_path):
    """Real streaming smoke: parquet drop dir → readStream → session agg →
    partitioned parquet sink with checkpoint, drained with availableNow."""
    src = str(tmp_path / "drop")
    _events(spark).write.parquet(src)
    schema = _events(spark).schema

    stream = read_event_stream(spark, src, schema)
    assert stream.isStreaming
    agg = sessionized_stats(
        stream, "mmsi", "ts", gap="3 hours", watermark="1 hour", value_col="v"
    ).withColumn("day", F.to_date("session_start"))

    q = start_partitioned_stream_sink(
        agg, str(tmp_path / "out"), str(tmp_path / "ckpt"), ["day"]
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    # watermark holds back the open sessions; at least the closed 'a'
    # session (0:00-1:00) must have been finalized and written
    rows = {(r["mmsi"], r["session_start"]) for r in got.collect()}
    assert ("a", dt.datetime(2024, 1, 1, 0)) in rows


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithState ValueState survives across microbatches: a
    3-file drop dir with maxFilesPerTrigger=1 forces 3 batches; the final
    emission per key must equal the batch aggregate (exact integer
    cents)."""
    import uuid

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import running_totals

    rows = [(i % 5, 0.25 * (i + 1)) for i in range(60)]
    src = spark.createDataFrame(rows, ["user_id", "value"]).withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    drop = str(tmp_path / "drop")
    src.repartitionByRange(3, "value").write.parquet(drop)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
        .select("user_id", "value_cents")
    )
    out = running_totals(stream, "user_id", "value_cents")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emissions = spark.table(name)
    # >5 emissions proves keys were refreshed in more than one batch
    assert emissions.count() > 5
    final = {
        r["user_id"]: (r["n"], r["value_cents"])
        for r in emissions.groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max_by("value_cents", "n").alias("value_cents"))
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], r["value_cents"])
        for r in src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("value_cents").alias("value_cents")
        )
        .collect()
    }
    assert final == want


def test_foreach_batch_merge_sink(spark, tmp_path):
    """foreachBatch MERGE sink: later (ordered) batches overwrite earlier
    per-key rows; final snapshot == batch latest-per-key."""
    import datetime as dt2
    import os
    import time as time2

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        start_merge_upsert_sink,
    )

    t0 = dt2.datetime(2024, 1, 1)
    batches = [
        [(1, t0, 10, "a"), (2, t0, 20, "b")],
        [(1, t0 + dt2.timedelta(hours=1), 11, "a2"), (3, t0, 30, "c")],
        [(2, t0 + dt2.timedelta(hours=2), 22, "b2")],
    ]
    drop = tmp_path / "drop"
    drop.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k long, ts timestamp, v long, s string")
        part = str(tmp_path / f"part{i}")
        df.coalesce(1).write.parquet(part)
        for f in sorted(os.listdir(part)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(part, f), str(drop / f"{i}_{f}"))
        time2.sleep(0.05)  # distinct mtimes: ordered replay

    schema = "k long, ts timestamp, v long, s string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    target = str(tmp_path / "snapshot")
    q = start_merge_upsert_sink(
        stream, target, str(tmp_path / "ckpt"), keys=["k"], ts_col="ts"
    )
    q.awaitTermination(120)
    got = {r["k"]: (r["v"], r["s"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: (11, "a2"), 2: (22, "b2"), 3: (30, "c")}


def test_merge_sink_composite_keys_keep_all_key_tuples(spark, tmp_path):
    """Composite merge keys: a batch with two rows sharing the first key
    component must upsert BOTH (partitioning on keys[0] alone would
    silently drop one)."""
    import os

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        start_merge_upsert_sink,
    )

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [
            (1, "a", 10, 1.0),
            (1, "b", 10, 2.0),
            (2, "a", 10, 3.0),
        ],
        "tenant int, user string, ts int, v double",
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    target = str(tmp_path / "target")
    q = start_merge_upsert_sink(
        stream,
        target,
        str(tmp_path / "ckpt"),
        keys=["tenant", "user"],
        ts_col="ts",
        tiebreak_cols=["v"],
    )
    q.awaitTermination()
    assert os.path.exists(target)
    got = {
        (r["tenant"], r["user"]): r["v"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == {(1, "a"): 1.0, (1, "b"): 2.0, (2, "a"): 3.0}


def test_dedup_within_watermark_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered event in a later
    microbatch (inside the watermark) must be suppressed; the memory
    sink sees each event_id exactly once."""
    import datetime as dt

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        dedup_within_watermark,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    b1 = [(1, t0, "a"), (2, t0 + dt.timedelta(minutes=1), "b")]
    # batch 2 redelivers event 1 (dup within watermark) + one new event
    b2 = [(1, t0, "a"), (3, t0 + dt.timedelta(minutes=2), "c")]
    src = str(tmp_path / "dedup_src")
    schema = "event_id long, ts timestamp, payload string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_within_watermark(stream, ["event_id"], "ts", "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]  # event 1 exactly once


def test_dedup_within_watermark_batch_degrades_to_dropduplicates(spark):
    import datetime as dt

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        dedup_within_watermark,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, "a"), (1, t0, "a"), (2, t0, "b")],
        "event_id long, ts timestamp, payload string",
    )
    out = dedup_within_watermark(df, ["event_id"], "ts")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]
