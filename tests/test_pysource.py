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
