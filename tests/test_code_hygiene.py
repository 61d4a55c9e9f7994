"""Static anti-pattern guards over the package source: the scale rules
VERDICT audits (no row-at-a-time Python UDFs, no driver-side collection
outside the documented bounded sites) pinned as tests so a refactor
can't silently regress them."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "noaa_ais_glue_lakehouse_spark"

# Documented bounded collects, pinned to (file, enclosing function,
# exact occurrence count). A new collect anywhere — including inside an
# already-allowlisted file — fails this test until it's reviewed and
# added here with its bound documented:
#   - _pair_cosine_by_index_udf: broadcast-matrix build (|corpus|
#     vectors; opt-in path, caller-bounded memory regime)
#   - _train_centroids: k-means training sample, .limit(kmeans_sample)
#     (default 10k rows) precedes the collect
#   - _bpe_merge_rounds (bpe_merges body): .limit(1) argmax, one row
#     per merge round
#   - list_partitions: distinct partition TUPLES (bounded by partition
#     count, not row count)
#   - delete_keys_partition_scoped: affected-partition tuples ×2 plus
#     emptied-partition tuples — all distinct-partition-bounded
ALLOWED_COLLECT_SITES = {
    ("operators/similarity.py", "_pair_cosine_by_index_udf"): 1,
    ("operators/similarity.py", "_train_centroids"): 1,
    ("operators/tokenizer.py", "_bpe_merge_rounds"): 1,
    ("sources/writers.py", "list_partitions"): 1,
    ("sources/writers.py", "delete_keys_partition_scoped"): 3,
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


def _collect_sites(src: str) -> dict[str, int]:
    """Map enclosing top-level ``def`` name -> number of ``.collect()``
    occurrences inside it (module-level collects map to ``<module>``)."""
    sites: dict[str, int] = {}
    current = "<module>"
    for line in src.splitlines():
        m = re.match(r"def\s+(\w+)", line)
        if m:
            current = m.group(1)
        if ".collect()" in line:
            sites[current] = sites.get(current, 0) + 1
    return sites


def test_collect_only_at_documented_sites():
    found: dict[tuple[str, str], int] = {}
    for f, src in _sources():
        for func, n in _collect_sites(src).items():
            found[(f, func)] = n
    assert found == ALLOWED_COLLECT_SITES, (
        "collect sites drifted from the documented allowlist: "
        f"unexpected={{k: v for k, v in found.items() if ALLOWED_COLLECT_SITES.get(k) != v}} "
        f"found={found}"
    )


def test_no_rdd_api():
    # allowed: the partition-COUNT probe in spread_partitions (metadata
    # only — no data crosses the RDD boundary, no job runs)
    pat = re.compile(r"\.rdd\b(?!\.getNumPartitions)|sparkContext\.parallelize")
    offenders = [f for f, src in _sources() if pat.search(src)]
    assert not offenders, f"RDD API in: {offenders}"
