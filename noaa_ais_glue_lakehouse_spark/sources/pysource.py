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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class RowGroupParquetSource(DataSource):
    """``spark.read.format("pyrowgroup").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "pyrowgroup"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.read_schema(self.options["path"])
        return ", ".join(f"{f.name} {_arrow_field_ddl(f)}" for f in sch)

    def reader(self, schema):
        return _RowGroupReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(RowGroupParquetSource)
