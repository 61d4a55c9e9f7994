"""Custom Python DataSource (PySpark 4 DataSource API): a parquet
connector that plans one Spark partition per parquet ROW GROUP and
serves Arrow record batches from each.

Why it exists (S-family completion): the reference's connectors are
Glue-catalog wrappers; this is the from-scratch path — the engine-side
contract (schema planning on the driver, partition planning, per-
partition Arrow-batch iteration) that any custom source (internal blob
store, proprietary format, service API) plugs into. Row-group
granularity is the right partition unit for parquet: each task reads an
independent byte range, so parallelism tracks file layout exactly like
the native reader's split planning.

Data flows Arrow-batch-wise (``read`` yields ``pyarrow.RecordBatch``),
never row-by-row Python objects — the same batch-transfer discipline as
every pandas UDF here. The native reader remains the default path;
q101 pins this connector's results against it via the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "date32[day]": "date",
}


def _arrow_field_ddl(field) -> str:
    t = field.type
    s = str(t)
    if s in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[s]
    if s.startswith("timestamp"):
        # naive parquet timestamps surface as NTZ — the caller (or the
        # oracle harness) owns the tz policy, matching readers.py
        return "timestamp_ntz" if "tz=" not in s else "timestamp"
    if s.startswith("list<"):
        return f"array<{_arrow_field_ddl(t.field(0) if hasattr(t, 'field') else t.value_field)}>"
    raise ValueError(f"unmapped arrow type for column {field.name}: {s}")


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class _RowGroupReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroupPartition(self.path, i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        if partition.row_group >= f.num_row_groups:
            return
        for batch in f.read_row_group(partition.row_group).to_batches():
            yield batch


class _RowGroupStreamReader(DataSourceStreamReader):
    """Streaming face of the row-group connector: the file's row groups
    are an append-only queue; the stream offset is simply the next
    unread row-group index — the same durable-cursor contract a queue
    or CDC-log source implements.

    Reads happen on EXECUTORS (``partitions`` plans one input split per
    row group; ``read`` serves Arrow batches), unlike the
    SimpleDataSourceStreamReader convenience base whose reads run on
    the driver — the wrong place for data at scale. ``rowGroupsPerBatch``
    caps each microbatch (rate limiting) — use it ONLY with
    processing-time triggers: Trigger.AvailableNow snapshots
    ``latestOffset`` once and would stop after the first capped batch
    (the Python stream-reader API exposes no ReadLimit hook). Offsets
    are plain dicts; ``commit`` re-syncs the cursor so a
    checkpoint-restarted query resumes from the committed offset rather
    than rate-limiting from zero.
    """

    def __init__(self, options):
        self._path = options["path"]
        self._per_batch = int(options.get("rowGroupsPerBatch", "0") or 0)
        self._cursor = 0

    def _num_row_groups(self) -> int:
        # re-read per poll, NOT cached from __init__: the queue contract
        # is append-only, so row groups added after stream start must
        # become visible to later latestOffset calls
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._path).num_row_groups

    def initialOffset(self):
        return {"rg": 0}

    def latestOffset(self):
        n = self._num_row_groups()
        if self._per_batch > 0:
            self._cursor = min(self._cursor + self._per_batch, n)
            return {"rg": self._cursor}
        return {"rg": n}

    def partitions(self, start, end):
        return [
            _RowGroupPartition(self._path, i)
            for i in range(start["rg"], end["rg"])
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        for batch in f.read_row_group(partition.row_group).to_batches():
            yield batch

    def commit(self, end):
        self._cursor = max(self._cursor, end["rg"])


class RowGroupParquetSource(DataSource):
    """``spark.read.format("pyrowgroup").option("path", …)`` — and the
    same format under ``spark.readStream`` (row groups as microbatches).
    """

    @classmethod
    def name(cls) -> str:
        return "pyrowgroup"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.read_schema(self.options["path"])
        return ", ".join(f"{f.name} {_arrow_field_ddl(f)}" for f in sch)

    def reader(self, schema):
        return _RowGroupReader(self.options)

    def streamReader(self, schema):
        return _RowGroupStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(RowGroupParquetSource)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    """Two-phase commit, the same contract FileOutputCommitter gives the
    native sinks: each task writes to a ``.tmp`` name and reports it in
    its commit message; only the DRIVER's commit() renames temp files to
    final names and publishes a ``_MANIFEST.json`` (file list + row
    count). A reader that honors the manifest never sees partial output
    from failed/speculative tasks; abort() deletes the temps."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fn = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(fn, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(fn, n)

    def commit(self, messages):
        import json
        import os

        total, kept = 0, []
        for m in messages:
            final = m.file[: -len(".tmp")]
            os.rename(m.file, final)
            kept.append(os.path.basename(final))
            total += m.rows
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump({"files": sorted(kept), "rows": total}, f)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.file)
            except OSError:
                pass


class JsonLinesSink(DataSource):
    """``df.write.format("pyjsonl").option("path", …).mode("append")`` —
    the sink half of the custom-connector story (S-family): JSONL shards,
    one per task, atomically published via rename + manifest."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonLinesSink)
