"""Static anti-pattern guards over the package source: the scale rules
VERDICT audits (no row-at-a-time Python UDFs, no driver-side collection
outside the documented bounded sites) pinned as tests so a refactor
can't silently regress them."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "noaa_ais_glue_lakehouse_spark"

# Documented bounded collects: broadcast-matrix build (|corpus| vectors,
# caller-bounded memory regime), 10k-row k-means training sample, the
# partition-tuple listing for dynamic-overwrite bookkeeping, and the
# 1-row-per-round BPE argmax.
ALLOWED_COLLECT_FILES = {
    "operators/similarity.py",
    "sources/writers.py",
    "operators/tokenizer.py",
}


def _sources():
    for p in PKG.rglob("*.py"):
        yield p.relative_to(PKG).as_posix(), p.read_text()


def test_no_row_at_a_time_python_udfs():
    pat = re.compile(r"(^|\W)(F\.udf\(|@udf\(|pandas_udf\s*=)", re.M)
    offenders = [f for f, src in _sources() if pat.search(src)]
    assert not offenders, f"row-at-a-time UDF in: {offenders}"


def test_no_topandas_in_package():
    offenders = [f for f, src in _sources() if ".toPandas()" in src]
    assert not offenders, f"toPandas in: {offenders}"


def test_collect_only_at_documented_sites():
    offenders = []
    for f, src in _sources():
        if ".collect()" in src and f not in ALLOWED_COLLECT_FILES:
            offenders.append(f)
    assert not offenders, f"undocumented collect in: {offenders}"


def test_no_rdd_api():
    # allowed: the partition-COUNT probe in spread_partitions (metadata
    # only — no data crosses the RDD boundary, no job runs)
    pat = re.compile(r"\.rdd\b(?!\.getNumPartitions)|sparkContext\.parallelize")
    offenders = [f for f, src in _sources() if pat.search(src)]
    assert not offenders, f"RDD API in: {offenders}"
