"""Structured Streaming parity queries (availableNow batch-equivalence).

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


@register(
    "q67_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 32 AS INT) AS shard,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / 512.0) AS BIGINT) AS bin_id
    FROM t
    """,
)
def q67_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concatenate-then-chop): documents
    stream in id order per shard; window id = floor(tokens_before / 512).
    One window pass partitioned by shard — shards pack independently, so
    there is no global-ordering bottleneck at any corpus size."""
    from noaa_ais_glue_lakehouse_spark.operators.training import pack_sequences

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    with_counts = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(
        with_counts, "doc_id", "n_tokens", context_tokens=512, n_shards=32
    )
    return packed.select("doc_id", "shard", "n_tokens", "bin_id")



@register(
    "q70_streaming_sessionize",
    build_time_exec="driver-side work at plan-build time; plan pinned by its own recall/oracle tests",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts,
             EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
      FROM events
    )
    SELECT user_id, ts,
           CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM lagged
    """,
)
def q70_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming under the driver's gate: a file-source
    stream (availableNow) over the events table, sessionized with the
    applyInPandasWithState custom stateful operator, materialized through
    a memory sink — and hash-checked against the batch prefix-sum SQL.
    Streaming == batch semantics is the property the reference's
    batch-simulated streaming (SURVEY §2.9) relies on; here it is proven
    per run, not assumed. The blocking awaitTermination happens at plan
    build (bounded: availableNow drains and stops), like the IVF
    trainer's bounded collect."""
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import stateful_sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    # the file stream source requires a DIRECTORY; the testdata table is a
    # single parquet file, so stage a temp dir holding a symlink to it
    # (zero-copy drop directory)
    import os

    drop_dir = tempfile.mkdtemp(prefix="q70_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(file_schema)
        .parquet(drop_dir)
        .select(
            F.col("user_id"),
            F.col("ts").cast(T.TimestampType()).alias("ts"),
        )
    )
    out = stateful_sessionize(stream, "user_id", "ts", gap_seconds=1800.0)
    name = f"q70_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q70_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("user_id", "ts", "session_id")



@register(
    "q85_streaming_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q85_streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window rollup under the correctness
    gate (T7 companion to q70's stateful sessionize): a file-source stream
    drained with availableNow through a windowed groupBy into a memory
    sink, hash-checked against the batch GROUP BY. Complete output mode
    is what makes streaming == batch EXACT here — append mode would
    withhold windows the watermark hasn't closed when the bounded stream
    ends (the classic missing-last-window pitfall); the watermarked
    append path with genuinely late rows is exercised in
    tests/test_streaming.py, where per-batch emission is the thing under
    test. 1-hour tumbling windows align to the epoch, so
    `window(ts, '1 hour').start == date_trunc('hour', ts)` on both
    engines."""
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    drop_dir = tempfile.mkdtemp(prefix="q85_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "events.parquet"))
    stream = spark.readStream.schema(file_schema).parquet(drop_dir)
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )
    name = f"q85_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q85_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour"),
        "event_type",
        "n_events",
        "value_cents",
    )



@register(
    "q96_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND epoch_us(v.ts) <= epoch_us(p.ts)
     AND epoch_us(v.ts) >= epoch_us(p.ts) - 600000000
    """,
)
def q96_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join under the correctness gate: purchases
    joined to the same user's views from the preceding 10 minutes, both
    sides real file-source streams with event-time watermarks, drained
    with availableNow into a memory sink and hash-checked against the
    batch time-bounded join. The watermark + time-bound condition is what
    lets Spark expire join state at scale (state holds only the
    watermark-deep tail of each side, not the full history) — the
    streaming analog of the q59 range join. Inner-join emission is
    complete regardless of watermark progress, so streaming == batch
    exactly."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    # cast through the EXPLICIT TimestampType (LTZ): under a session whose
    # default timestampType is NTZ, cast("timestamp") resolves to NTZ and
    # watermarks reject it (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    views = (
        _stream("q96_v_")
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q96_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
    )
    name = f"q96_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q96_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id")
    )



@register(
    "q99_streaming_dedup",
    oracle="""
    WITH d AS (
      SELECT DISTINCT ON (event_id) event_id, event_type
      FROM (SELECT event_id, event_type FROM events
            UNION ALL SELECT event_id, event_type FROM events)
      ORDER BY event_id
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct_events
    FROM d GROUP BY event_type
    """,
)
def q99_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: the events file is staged TWICE into
    the drop directory (every row arrives duplicated), and
    `dropDuplicatesWithinWatermark` on event_id must collapse the stream
    back to one row per event — the at-least-once-delivery dedup every
    production ingest needs. Watermark-scoped state means the dedup
    buffer holds only the watermark-deep tail at scale, not every key
    ever seen (the unbounded-state trap of plain dropDuplicates on a
    stream). Hash-checked against batch DISTINCT."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    drop_dir = tempfile.mkdtemp(prefix="q99_drop_")
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "a.parquet"))
    os.symlink(os.path.abspath(path), os.path.join(drop_dir, "b.parquet"))
    stream = (
        spark.readStream.schema(file_schema)
        .parquet(drop_dir)
        .select(
            "event_id",
            "event_type",
            F.col("ts").cast(T.TimestampType()).alias("ts"),
        )
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"q99_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q99_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_events"))
    )



@register(
    "q110_stateful_running_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """,
)
def q110_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming aggregation under the correctness gate:
    the events table is replayed as a THREE-microbatch file stream
    (range-split drop directory, maxFilesPerTrigger=1), a per-key stateful
    processor maintains per-user running (count, cents) totals across the
    batches, and the final emission per key is hash-checked against the
    batch GROUP BY — streaming-state == batch-aggregate equality, proven
    per run. The operator (streaming/sessions.py running_totals) uses
    Spark 4's ``transformWithState`` typed-ValueState API where the
    protobuf runtime it requires exists, and an identical-semantics
    ``applyInPandasWithState`` processor otherwise. Integer-cents state
    makes the totals exact and replay-order-independent. The last
    emission per key is selected by max_by on the strictly-increasing
    running count (update-mode memory sinks append every refresh)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from noaa_ais_glue_lakehouse_spark.streaming.sessions import running_totals

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    # stage a 3-file drop directory so availableNow + maxFilesPerTrigger=1
    # actually exercises state persistence ACROSS microbatches (a single
    # file would fold the whole table into one batch and never re-read
    # state)
    drop_dir = tempfile.mkdtemp(prefix="q110_drop_")
    (
        spark.read.parquet(path)
        .repartitionByRange(3, "ts")
        .write.mode("overwrite")
        .parquet(drop_dir)
    )
    file_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(
            F.col("user_id"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )
    out = running_totals(stream, "user_id", "value_cents")
    name = f"q110_totals_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q110_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emissions = spark.table(name)
    # n is strictly increasing per key across emissions, so max_by(n) is
    # the final state
    return emissions.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n"),
        F.max_by("value_cents", "n").cast("long").alias("value_cents"),
    )



@register(
    "q121_streaming_merge_sink",
    oracle="""
    SELECT user_id, status, value_cents FROM (
      SELECT user_id, event_type AS status,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q121_streaming_merge_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink — the streaming-upsert pattern every
    lakehouse runs where a native sink doesn't exist: events replay as a
    THREE-microbatch stream (three sequentially-staged files so arrival
    order follows event time, like an ordered CDC feed), each batch
    collapses to its latest row per user and MERGEs into a parquet
    snapshot via stage-then-swap (streaming/sessions.py
    start_merge_upsert_sink; never collected, never O(history) per
    batch). The final snapshot is hash-checked against the batch
    latest-per-user — continuous maintenance == one-shot rebuild."""
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
        start_merge_upsert_sink,
    )

    ev_src = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    # three sequential writes → strictly increasing mtimes → the file
    # source replays batches in event-time order (an ordered feed, the
    # precondition for blind upsert; an unordered feed would use the
    # ts-aware latest_per_entity merge instead)
    drop_dir = tempfile.mkdtemp(prefix="q121_drop_")
    ts_day = F.dayofmonth("ts")
    for i, (lo, hi) in enumerate([(1, 10), (11, 20), (21, 31)]):
        ev_src.filter(ts_day.between(lo, hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(drop_dir, f"part{i}"))
    stage_dir = tempfile.mkdtemp(prefix="q121_files_")
    n = 0
    for i in range(3):
        part = os.path.join(drop_dir, f"part{i}")
        for f in sorted(os.listdir(part)):
            if f.endswith(".parquet"):
                os.symlink(
                    os.path.join(part, f), os.path.join(stage_dir, f"{i}_{f}")
                )
                n += 1
    stream = (
        spark.readStream.schema(ev_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    target = os.path.join(tempfile.mkdtemp(prefix="q121_tgt_"), "snapshot")
    q = start_merge_upsert_sink(
        stream,
        target,
        tempfile.mkdtemp(prefix="q121_ckpt_"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    )
    q.awaitTermination()
    return spark.read.parquet(target).select("user_id", "status", "value_cents")



@register(
    "q181_stream_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def q181_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join under the correctness gate: the event stream
    enriched with a static dimension (customer segment) and aggregated,
    drained with availableNow and hash-checked against the batch join.

    The static side is a plain batch DataFrame — Spark broadcasts it
    into every microbatch with NO join state at all (unlike q96's
    stream-stream state store); this is the canonical streaming
    dimension-enrichment shape. Complete-mode aggregation makes the
    final table equal the batch result exactly.
    """
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema
    d = tempfile.mkdtemp(prefix="q181_")
    os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
    stream = spark.readStream.schema(file_schema).parquet(d)

    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )
    name = f"q181_sse_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q181_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "segment", "event_type", "n_events", "total_value"
    )



@register(
    "q193_sequence_gap_audit",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             LEAD(event_id) OVER (PARTITION BY user_id
                                  ORDER BY event_id) AS next_id
      FROM events
    )
    SELECT user_id,
           event_id + 1 AS gap_start,
           next_id - 1 AS gap_end,
           CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
    FROM s
    WHERE next_id - event_id > 1
      AND next_id - event_id - 1 <= 50
    """,
)
def q193_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 — sequence-completeness audit: missing-id ranges within each
    entity's event-id stream (the CDC/replication "did we drop rows?"
    check). One lead window per entity emits each gap as a closed range
    [gap_start, gap_end]; ranges wider than 50 are excluded as expected
    inter-entity striding rather than loss (the threshold is the audit's
    sensitivity knob). One shuffle on the entity key.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        "event_id",
        F.lead("event_id").over(w).alias("next_id"),
    )
    width = F.col("next_id") - F.col("event_id")
    return s.filter((width > 1) & (width - 1 <= 50)).select(
        "user_id",
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (width - 1).cast("long").alias("n_missing"),
    )



@register(
    "q205_custom_stream_source",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM events GROUP BY 1
    """,
)
def q205_custom_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132 — CUSTOM PYTHON STREAMING SOURCE under the correctness gate:
    the row-group connector's streaming face (offsets = row-group
    cursor, executor-side Arrow reads, rate-limited microbatches via
    rowGroupsPerBatch) drained into a complete-mode aggregation and
    hash-checked against the batch SQL over the native reader. This is
    the queue/CDC-log source contract end-to-end: durable offsets,
    deterministic replay between offsets, per-split executor reads.
    """
    import tempfile
    import uuid

    from noaa_ais_glue_lakehouse_spark.sources import pysource

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pysource.register(spark)
    # no rowGroupsPerBatch here: availableNow snapshots latestOffset
    # once, so rate limiting belongs to processing-time triggers (the
    # multi-batch path is pinned in test_pysource.py)
    stream = (
        spark.readStream.format("pyrowgroup")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
    )
    name = f"q205_css_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q205_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)



@register(
    "q272_stream_stream_left_join",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the explicit outer- completeness cutoff scalar attached to the DRAINED (batch) result of the stream-stream left-outer join",
    oracle="""
    WITH p AS (
      SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id AS v_user, ts AS v_ts, event_id AS view_id
      FROM events WHERE event_type = 'view'
    ), cut AS (
      SELECT MAX(epoch_us(p_ts)) - 7200000000 AS c FROM p
    ), j AS (
      SELECT p.purchase_id, v.view_id, p.p_user, p.p_ts
      FROM p LEFT JOIN v
        ON p.p_user = v.v_user
       AND epoch_us(v.v_ts) <= epoch_us(p.p_ts)
       AND epoch_us(v.v_ts) >= epoch_us(p.p_ts) - 600000000
    )
    SELECT purchase_id, view_id, p_user AS user_id
    FROM j, cut
    WHERE view_id IS NOT NULL OR epoch_us(p_ts) <= c
    """,
)
def q272_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join under the correctness gate:
    purchases left-joined to same-user views from the preceding 10
    minutes, both sides watermarked file streams drained with
    availableNow. The semantics worth pinning: OUTER emission is
    watermark-gated — an unmatched purchase is emitted (null view) only
    once the join watermark passes it, so when the stream ends, the
    watermark-deep TAIL of unmatched purchases is still held back in
    state. That is not a bug but the contract: outer completeness lags
    the watermark, and a downstream consumer must treat the last
    watermark-interval as open.

    Instead of reverse-engineering Spark's internal watermark (max event
    time ms-floored minus delay — an implementation detail), both the
    streaming result and the batch oracle apply an EXPLICIT cutoff 2h
    before the max purchase time (1h of slack past the 1h watermark):
    every unmatched purchase at or below it is guaranteed emitted, the
    tail above it is excluded on both sides, and matched rows — whose
    inner emission is complete regardless of watermark — pass untouched.
    The cutoff scalar is a deliberate 1-row broadcast cross join on the
    DRAINED (batch) result, not in the stream.
    """
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    views = (
        _stream("q272_v_")
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q272_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    name = f"q272_sslj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q272_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    cut = (
        spark.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        .agg(
            (F.max(F.unix_micros(F.col("ts").cast(T.TimestampType()))) - 7200000000)
            .alias("_cut")
        )
    )
    return (
        drained.crossJoin(F.broadcast(cut))
        .filter(
            F.col("view_id").isNotNull()
            | (F.unix_micros("p_ts") <= F.col("_cut"))
        )
        .select("purchase_id", "view_id", F.col("p_user").alias("user_id"))
    )



@register("q285_countmin_heavy_hitters", oracle=_cms_oracle(4, 2048))
def q285_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: the sketch is built as a (i, pos, n)
    relation of at most depth×width = 8192 rows — one map-side-combined
    hash aggregation over the stream, mergeable across shards/days by
    summing n — then each candidate key is point-estimated by the MIN of
    its depth cells via a broadcast equi-join. Top-10 users by estimated
    frequency, with the exact count and the CM overestimate attached
    (est ≥ exact always; the one-sided error is pinned in
    tests/test_sketches.py). The deterministic cross-engine hash family
    is what lets an approximate structure sit under the exact hash
    gate."""
    from noaa_ais_glue_lakehouse_spark.operators.sketches import (
        count_min_cells,
        count_min_estimate,
    )

    ev = load(spark, sf_dir, "events")
    cells = count_min_cells(ev.select("user_id"), "user_id", 4, 2048)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    est = count_min_estimate(exact.select("user_id"), "user_id", cells, 4, 2048)
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("est_count").desc(), "user_id")
        .limit(10)
    )



@register(
    "q286_watermark_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT user_id, ts, epoch_us(ts) AS ts_us,
             MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max_us
      FROM events
    ), late AS (
      SELECT user_id,
             GREATEST(0, COALESCE(prev_max_us - ts_us, 0)) AS late_us
      FROM arr
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us,
           CAST(SUM(late_us) AS BIGINT) AS total_late_us
    FROM late GROUP BY user_id
    """,
)
def q286_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the measurement that SIZES a streaming
    watermark instead of guessing it. Arrival order is the ingest-
    monotone event_id; an event is late by (running max event-time seen
    before it) − (its own event-time), clamped at 0 — the exact quantity
    `withWatermark` must exceed for the event not to be dropped. Per
    user: event count, late count, worst lateness, total lateness (µs,
    exact integer arithmetic). One window (prefix max over arrival
    order, single hash-partition shuffle on user_id) + one aggregation —
    the same shape at any scale."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(
        F.lit(0),
        F.coalesce(
            F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"),
            F.lit(0),
        ),
    )
    late = ev.select("user_id", late_us.alias("late_us"))
    return late.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.max("late_us").cast("long").alias("max_late_us"),
        F.sum("late_us").cast("long").alias("total_late_us"),
    )


# ---------------------------------------------------------------------------
# Rank statistics, link prediction, interval coverage, path mining
# (q287-q290)
# ---------------------------------------------------------------------------



@register(
    "q404_stream_stream_full_join",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join: the explicit "
        "outer-completeness cutoff scalar attached to the DRAINED "
        "(batch) result of the stream-stream full-outer join"
    ),
    oracle="""
    WITH p AS (
      SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id AS v_user, ts AS v_ts, event_id AS view_id
      FROM events WHERE event_type IN ('view') AND user_id % 5 = 0
    ), cut AS (
      SELECT MAX(epoch_us(ts)) - 7200000000 AS c FROM events
      WHERE event_type IN ('purchase', 'view')
    ), j AS (
      SELECT p.purchase_id, v.view_id,
             COALESCE(p.p_user, v.v_user) AS user_id, p.p_ts, v.v_ts
      FROM p FULL JOIN v
        ON p.p_user = v.v_user
       AND epoch_us(v.v_ts) <= epoch_us(p.p_ts)
       AND epoch_us(v.v_ts) >= epoch_us(p.p_ts) - 600000000
    )
    SELECT purchase_id, view_id, user_id,
           CASE WHEN purchase_id IS NOT NULL AND view_id IS NOT NULL
                THEN 'both'
                WHEN view_id IS NULL THEN 'purchase_only'
                ELSE 'view_only' END AS match_type
    FROM j, cut
    WHERE (purchase_id IS NOT NULL AND view_id IS NOT NULL)
       OR (view_id IS NULL AND epoch_us(p_ts) <= c)
       OR (purchase_id IS NULL AND epoch_us(v_ts) <= c)
    """,
)
def q404_stream_stream_full_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X334 — STREAM-STREAM FULL OUTER join under the correctness gate,
    completing the streaming outer-join family (inner q96, left-outer
    q272): purchases ⟗ same-user views from the preceding 10 minutes,
    both sides watermarked file streams drained with availableNow. The
    FULL form is the reconciliation shape — "every purchase AND every
    view, matched where possible" — and pins the symmetric contract:
    UNMATCHED rows on EITHER side are emitted only once the join
    watermark passes them, so both tails are held in state at
    end-of-stream. Like q272, both engines apply an EXPLICIT 2h cutoff
    below the max event time instead of reverse-engineering Spark's
    internal watermark: matched rows pass untouched, each side's
    unmatched rows are kept only at-or-below the cutoff. The view side
    is thinned to user_id % 5 so view-only rows exercise real volume
    without drowning the match classes.

    Scale: stream-stream joins shuffle both sides on the key; state is
    bounded by watermark × arrival rate per side — the time-bound
    condition on BOTH sides is what lets Spark evict (without it,
    full-outer state grows unboundedly)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    file_schema = spark.read.parquet(path).schema

    def _stream(prefix: str):
        d = tempfile.mkdtemp(prefix=prefix)
        os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
        return spark.readStream.schema(file_schema).parquet(d)

    views = (
        _stream("q404_v_")
        .where((F.col("event_type") == "view") & (F.col("user_id") % 5 == 0))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast(T.TimestampType()).alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _stream("q404_p_")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast(T.TimestampType()).alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    )
    name = f"q404_ssfj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q404_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    cut = (
        spark.read.parquet(path)
        .where(F.col("event_type").isin("purchase", "view"))
        .agg(
            (
                F.max(F.unix_micros(F.col("ts").cast(T.TimestampType())))
                - 7200000000
            ).alias("_cut")
        )
    )
    matched = F.col("purchase_id").isNotNull() & F.col("view_id").isNotNull()
    return (
        drained.crossJoin(F.broadcast(cut))
        .filter(
            matched
            | (
                F.col("view_id").isNull()
                & (F.unix_micros("p_ts") <= F.col("_cut"))
            )
            | (
                F.col("purchase_id").isNull()
                & (F.unix_micros("v_ts") <= F.col("_cut"))
            )
        )
        .select(
            "purchase_id",
            "view_id",
            F.coalesce("p_user", "v_user").alias("user_id"),
            F.when(matched, "both")
            .when(F.col("view_id").isNull(), "purchase_only")
            .otherwise("view_only")
            .alias("match_type"),
        )
    )


