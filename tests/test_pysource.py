"""Custom Python DataSource (row-group parquet connector): full-table
parity with the native reader, partition planning, and schema mapping.
"""

from __future__ import annotations

import pytest

from noaa_ais_glue_lakehouse_spark.sources.pysource import (
    RowGroupParquetSource,
    _arrow_field_ddl,
    register,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("table", ["events", "documents", "embeddings", "nation"])
def test_custom_source_matches_native_reader(spark, table):
    register(spark)
    path = f"{SF}/{table}.parquet"
    custom = (
        spark.read.format("pyrowgroup").option("path", path).load()
    )
    native = spark.read.parquet(path)
    assert custom.columns == native.columns
    assert custom.count() == native.count()
    # order-insensitive full-content parity via exceptAll both ways
    c = custom.selectExpr(*[f"cast({x} as string) as {x}" for x in custom.columns])
    n = native.selectExpr(*[f"cast({x} as string) as {x}" for x in native.columns])
    assert c.exceptAll(n).count() == 0
    assert n.exceptAll(c).count() == 0


def test_custom_source_schema_mapping():
    import pyarrow as pa

    f = pa.field("x", pa.list_(pa.float32()))
    assert _arrow_field_ddl(f) == "array<float>"
    assert _arrow_field_ddl(pa.field("t", pa.timestamp("us"))) == "timestamp_ntz"
    with pytest.raises(ValueError):
        _arrow_field_ddl(pa.field("bad", pa.decimal128(10, 2)))


def test_custom_source_partitions_track_row_groups(spark):
    register(spark)
    import pyarrow.parquet as pq

    path = f"{SF}/events.parquet"
    src = RowGroupParquetSource({"path": path})
    parts = src.reader(None).partitions()
    assert len(parts) == max(pq.ParquetFile(path).num_row_groups, 1)


def test_jsonl_sink_round_trip(spark, tmp_path):
    from noaa_ais_glue_lakehouse_spark.sources.pysource import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(500).selectExpr("id", "id * 2 as dbl", "cast(id as string) as s")
    df.write.format("pyjsonl").option("path", out).mode("append").save()

    import json
    import os

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 500
    # no uncommitted temp shards remain
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    # every manifest shard exists; read back equals input
    for f in manifest["files"]:
        assert os.path.exists(os.path.join(out, f))
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == 500
    assert back.agg({"dbl": "sum"}).collect()[0][0] == df.agg({"dbl": "sum"}).collect()[0][0]


def test_stream_source_drains_in_rate_limited_microbatches(spark, tmp_path):
    """The streaming face must (a) reproduce the batch read exactly and
    (b) actually advance the row-group cursor incrementally when
    rowGroupsPerBatch caps each microbatch — the rate-limit path a
    single-row-group file never exercises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from noaa_ais_glue_lakehouse_spark.sources.pysource import register

    path = str(tmp_path / "multi_rg.parquet")
    tbl = pa.table(
        {"k": list(range(1000)), "grp": [i % 7 for i in range(1000)]}
    )
    pq.write_table(tbl, path, row_group_size=100)  # 10 row groups
    assert pq.ParquetFile(path).num_row_groups == 10

    register(spark)
    stream = (
        spark.readStream.format("pyrowgroup")
        .option("path", path)
        .option("rowGroupsPerBatch", "3")
        .load()
    )
    import uuid

    name = f"t_stream_{uuid.uuid4().hex[:8]}"
    # processing-time trigger, NOT availableNow: availableNow snapshots
    # latestOffset once, which caps a rate-limited source at its first
    # batch — the limitation pysource.py documents
    q = (
        stream.groupBy("grp")
        .count()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    batches = [
        p for p in q.recentProgress if p["numInputRows"] > 0
    ]
    got = {r["grp"]: r["count"] for r in spark.table(name).collect()}
    want = {
        r["grp"]: r["count"]
        for r in spark.read.parquet(path).groupBy("grp").count().collect()
    }
    assert got == want
    # 10 row groups at <=3/batch -> at least 4 non-empty microbatches
    assert len(batches) >= 4, [p["numInputRows"] for p in q.recentProgress]
