"""Table-maintenance operators (q244/q245): footer stats vs pyarrow
ground truth, and exact next-fit packing semantics.
"""

from __future__ import annotations

from noaa_ais_glue_lakehouse_spark.operators.maintenance import (
    parquet_footer_stats,
    plan_compaction,
)

SF_DIR = "/root/testdata/sf0.001"


def test_footer_stats_match_pyarrow(spark):
    import pyarrow.parquet as pq

    paths = [f"{SF_DIR}/{t}.parquet" for t in ("events", "documents")]
    got = {
        (r["path"], r["rg_idx"]): r
        for r in parquet_footer_stats(spark, paths).collect()
    }
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            comp = sum(
                rg.column(c).total_compressed_size
                for c in range(rg.num_columns)
            )
            r = got[(p, i)]
            assert r["n_rows"] == rg.num_rows
            assert r["n_cols"] == md.num_columns
            assert r["compressed_bytes"] == comp
            assert r["uncompressed_bytes"] == rg.total_byte_size
    assert len(got) == sum(
        pq.ParquetFile(p).metadata.num_row_groups for p in paths
    )


def test_plan_compaction_next_fit_semantics(spark):
    # sizes chosen so the exclusive-prefix buckets are unambiguous:
    # cum-before: a=0, b=30, c=80, d=90, e=170 with target 100
    stats = spark.createDataFrame(
        [("a", 0, 30), ("b", 0, 50), ("c", 0, 10), ("d", 0, 80), ("e", 0, 40)],
        ["path", "rg_idx", "compressed_bytes"],
    )
    plan = {
        r["bin"]: (r["n_files"], r["total_bytes"], list(r["files"]))
        for r in plan_compaction(stats, target_bytes=100).collect()
    }
    assert plan == {
        0: (4, 170, ["a", "b", "c", "d"]),
        1: (1, 40, ["e"]),
    }


def test_plan_compaction_sums_row_groups_per_file(spark):
    # two row groups of one file are packed as ONE unit
    stats = spark.createDataFrame(
        [("a", 0, 60), ("a", 1, 60), ("b", 0, 10)],
        ["path", "rg_idx", "compressed_bytes"],
    )
    plan = {
        r["bin"]: (r["n_files"], r["total_bytes"])
        for r in plan_compaction(stats, target_bytes=100).collect()
    }
    assert plan == {0: (1, 120), 1: (1, 10)}


def test_footer_stats_empty_path_list(spark):
    out = parquet_footer_stats(spark, [])
    assert out.count() == 0
    assert out.columns == [
        "path", "rg_idx", "n_rows", "n_cols",
        "compressed_bytes", "uncompressed_bytes",
    ]


def test_footer_stats_match_duckdb_metadata(spark):
    """Cross-engine pin for the rows-only q244: every (file, row-group)
    statistic from parquet_footer_stats (pyarrow on executors) must
    equal DuckDB's parquet_metadata() exactly - rows, column count,
    compressed and uncompressed bytes. The gate can't oracle this
    (oracle SQL can't take per-sf file paths), so the equality lives
    here at full strength instead."""
    import duckdb

    from noaa_ais_glue_lakehouse_spark.operators.maintenance import (
        parquet_footer_stats,
    )

    tables = ["events", "documents", "embeddings", "lineitem", "orders"]
    paths = [f"/root/testdata/sf0.001/{t}.parquet" for t in tables]
    got = {
        (r["path"].split("/")[-1], r["rg_idx"]): (
            r["n_rows"], r["n_cols"], r["compressed_bytes"],
            r["uncompressed_bytes"],
        )
        for r in parquet_footer_stats(spark, paths).collect()
    }
    con = duckdb.connect()
    expect = {}
    for p in paths:
        for f, rg, nr, nc, comp, unc in con.sql(
            f"""SELECT file_name, row_group_id,
                       MAX(row_group_num_rows), COUNT(*),
                       SUM(total_compressed_size), MAX(row_group_bytes)
                FROM parquet_metadata('{p}') GROUP BY 1, 2"""
        ).fetchall():
            expect[(f.split("/")[-1], rg)] = (nr, nc, int(comp), unc)
    assert got == expect and len(got) >= len(tables)
