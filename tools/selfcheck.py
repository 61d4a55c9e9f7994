"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, comparing row count, sorted column names, per-column
dtypes (Spark ``df.dtypes`` vs the oracle's Arrow schema, both canonicalized
— see ``_canon_spark_dtype``/``_canon_arrow_dtype`` for the explicit
timestamp ltz/ntz policy), and an order-insensitive value hash (rows
canonicalized to strings, sorted).

``--hostile`` runs the Spark side on a deliberately adversarial session —
non-UTC timezone, TIMESTAMP_NTZ as the session timestamp type, none of our
session-factory confs pre-set — mimicking the external driver, which passes
its OWN SparkSession. Round 1 lost 22 queries and round 2 lost q22 to
confs that were only set in the session factory; hostile mode makes that
failure class reproducible locally. The dtype + hash checks under --hostile
strictly dominate the driver's gate.

Usage: python tools/selfcheck.py [--hostile] [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_spark_dtype(dt: str) -> str:
    """Spark dtype string → canonical type word.

    Policy: TIMESTAMP and TIMESTAMP_NTZ both canonicalize to ``timestamp``
    (matching DuckDB TIMESTAMP/TIMESTAMPTZ) — the driver accepted Spark-ltz
    vs DuckDB-ntz for every reader-produced timestamp in round 2, and the
    *instant* drift an ltz/ntz mixup causes is caught by the value hash
    (under --hostile, with a non-UTC session tz). decimal(p,0) counts as
    int, other decimals as float.
    """
    dt = dt.lower().strip()
    if dt.startswith("array<") and dt.endswith(">"):
        return "array<" + _canon_spark_dtype(dt[6:-1]) + ">"
    if dt.startswith("decimal"):
        try:
            scale = int(dt[dt.index("(") + 1 : -1].split(",")[1])
        except Exception:
            scale = 0
        return "int" if scale == 0 else "float"
    return {
        "tinyint": "int",
        "smallint": "int",
        "int": "int",
        "bigint": "int",
        "float": "float",
        "double": "float",
        "string": "str",
        "boolean": "bool",
        "date": "date",
        "binary": "bytes",
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
    }.get(dt, dt)


def _canon_arrow_dtype(t) -> str:
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array<" + _canon_arrow_dtype(t.value_type) + ">"
    if pa.types.is_decimal(t):
        return "int" if t.scale == 0 else "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def oracle_dtypes(con, sql: str) -> dict[str, str]:
    """Canonical per-column dtypes of an oracle query via a LIMIT-0 Arrow
    schema (the DBAPI ``description`` type codes collapse all numerics to
    'NUMBER' — useless for the int-vs-float drift the driver's schema_match
    catches)."""
    schema = con.execute(f"SELECT * FROM ({sql}) __sub LIMIT 0").arrow().schema
    return {f.name.lower(): _canon_arrow_dtype(f.type) for f in schema}


def hostile_spark():
    """An adversarial stand-in for the external driver's SparkSession: no
    factory confs, non-UTC tz, NTZ session timestamp type. Everything the
    engine needs must be (re)settable at call time for this to pass."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[16]")
        .appName("selfcheck-hostile")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        "|".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--hostile"]
    hostile = "--hostile" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if hostile:
        spark = hostile_spark()
    else:
        from noaa_ais_glue_lakehouse_spark.session import get_spark

        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            sdtypes = {c.lower(): _canon_spark_dtype(t) for c, t in sdf.dtypes}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            try:
                odtypes = oracle_dtypes(con, oracles[name])
            except Exception as e:
                odtypes = {}
                problems.append(f"oracle dtype probe failed: {e}")
            for c in scols:
                if c in odtypes and sdtypes[c] != odtypes[c]:
                    problems.append(
                        f"dtype[{c}] spark={sdtypes[c]} oracle={odtypes[c]}"
                    )
        if not problems:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a sample diff
                so = sorted(
                    "|".join(
                        _canon_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "|".join(
                        _canon_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
