"""End-to-end pipeline tests: raw→staging integration slice (mirrors the
reference's only e2e test) and the incremental-vs-full trajectory
equality — the invariant the state-snapshot machinery exists for.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.pipelines.raw_to_staging import (
    run_raw_to_staging,
    transform_raw_to_staging,
)
from noaa_ais_glue_lakehouse_spark.pipelines.staging_to_curated import (
    compute_trajectory,
    monthly_voyage_summary,
    run_trajectory_window,
    voyage_daily_partials,
)


def _raw_rows():
    # 4-row slice like the reference integration test: one survivor, one
    # duplicate replay, one bad timestamp, one bad coordinate
    return [
        ("100", "2024-01-01 10:00:00", "10.0", "20.0", "5.0", "90.0", "91.0"),
        ("100", "2024-01-01 10:00:00", "10.0", "20.0", "5.0", "90.0", "91.0"),
        ("101", "not-a-date", "10.0", "20.0", "1.0", "1.0", "1.0"),
        ("102", "2024-01-01 11:00:00", "95.0", "20.0", "1.0", "1.0", "1.0"),
    ]


_RAW_COLS = ["mmsi", "base_date_time", "latitude", "longitude", "sog", "cog", "heading"]


def test_transform_raw_to_staging_slice(spark):
    df = spark.createDataFrame(_raw_rows(), _RAW_COLS)
    staging, quarantine = transform_raw_to_staging(df)
    rows = staging.collect()
    assert len(rows) == 1  # dup dropped, bad ts dropped, bad coord quarantined
    r = rows[0]
    assert r["MMSI"] == 100
    assert r["BaseDateTime"] == dt.datetime(2024, 1, 1, 10)
    assert r["MovementFlag"] == 1
    assert (r["year"], r["month"], r["day"]) == (2024, 1, 1)
    assert quarantine.count() == 1
    assert quarantine.first()["MMSI"] == 102


def test_run_raw_to_staging_files(spark, tmp_path):
    src = str(tmp_path / "raw.csv")
    import csv

    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(_RAW_COLS)
        w.writerows(_raw_rows())
    out = str(tmp_path / "staging")
    q = str(tmp_path / "quarantine")
    counters = run_raw_to_staging(spark, src, out, q)
    assert counters["quarantined"] == 1
    assert counters["rows_written"] == 1  # observe() metric, no extra job
    assert counters["null_mmsi"] == 0
    got = spark.read.parquet(out)
    assert got.count() == 1
    assert got.first()["year"] == 2024


def test_trajectory_window_sampled_path(spark, tmp_path):
    """sample=True endpoint-preserving thinning through the runner: per
    (entity, day) the first and last points always survive and distances
    are recomputed on the thinned timeline (window-first rows NULL)."""
    staging_path = str(tmp_path / "staging")
    _staging_df(spark).write.parquet(staging_path)
    out = run_trajectory_window(
        spark, staging_path, str(tmp_path / "curated"), str(tmp_path / "state"),
        "2024-01-01", "2024-01-02", mode="full", sample=True,
    )
    rows = out.filter(F.col("MMSI") == 1).orderBy("BaseDateTime").collect()
    times = [r["BaseDateTime"] for r in rows]
    import datetime as dt

    assert times[0] == dt.datetime(2024, 1, 1, 20)   # day-1 first kept
    assert dt.datetime(2024, 1, 1, 22) in times      # day-1 last kept
    assert times[-1] == dt.datetime(2024, 1, 2, 10)  # day-2 last kept
    assert rows[0]["SegmentDistanceKM"] is None      # thinned re-lag


def _staging_df(spark):
    """Two days of per-vessel points with a voyage crossing midnight."""
    rows = []
    for mmsi in (1, 2):
        # day-1 evening voyage ...
        rows += [
            (mmsi, dt.datetime(2024, 1, 1, 20), 10.0 + mmsi, 20.0, 5.0),
            (mmsi, dt.datetime(2024, 1, 1, 22), 10.1 + mmsi, 20.1, 6.0),
            # ... continues across midnight (2h gap < 3h threshold)
            (mmsi, dt.datetime(2024, 1, 2, 0, 30), 10.2 + mmsi, 20.2, 7.0),
            # new voyage after >3h silence
            (mmsi, dt.datetime(2024, 1, 2, 9), 11.0 + mmsi, 21.0, 0.0),
            (mmsi, dt.datetime(2024, 1, 2, 10), 11.0 + mmsi, 21.0, 0.2),
        ]
    return spark.createDataFrame(
        rows, ["MMSI", "BaseDateTime", "LAT", "LON", "SOG"]
    )


def test_incremental_equals_full_recompute(spark, tmp_path):
    staging_path = str(tmp_path / "staging")
    _staging_df(spark).write.parquet(staging_path)

    # full: both days in one window, no seeding
    full = run_trajectory_window(
        spark,
        staging_path,
        str(tmp_path / "curated_full"),
        str(tmp_path / "state_full"),
        "2024-01-01",
        "2024-01-02",
        mode="full",
        sample=False,
    )
    want = {
        (r["MMSI"], r["BaseDateTime"]): r["VoyageID"]
        for r in full.collect()
    }

    # incremental: day 1, then day 2 seeded from day 1's snapshot
    curated = str(tmp_path / "curated_inc")
    state = str(tmp_path / "state_inc")
    run_trajectory_window(
        spark, staging_path, curated, state, "2024-01-01", "2024-01-01",
        mode="incremental", sample=False,
    )
    run_trajectory_window(
        spark, staging_path, curated, state, "2024-01-02", "2024-01-02",
        mode="incremental", sample=False,
    )
    got = {
        (r["MMSI"], r["BaseDateTime"]): r["VoyageID"]
        for r in spark.read.parquet(curated).collect()
    }
    assert got == want
    # the midnight-crossing voyage must keep one id; the 9:00 voyage a new one
    assert want[(1, dt.datetime(2024, 1, 2, 0, 30))] == want[(1, dt.datetime(2024, 1, 1, 20))]
    assert want[(1, dt.datetime(2024, 1, 2, 9))] == want[(1, dt.datetime(2024, 1, 2, 0, 30))] + 1


def test_silent_entity_keeps_voyage_counter(spark, tmp_path):
    """An entity with no data in a window must keep its snapshot row, so a
    later reappearance continues its voyage ids instead of restarting at 0
    and colliding with historical keys."""
    rows = [
        # day 1: two separate voyages (gap > 3h) → ids 0 and 1
        (5, dt.datetime(2024, 1, 1, 1), 10.0, 20.0, 5.0),
        (5, dt.datetime(2024, 1, 1, 10), 10.5, 20.5, 5.0),
        # day 2: silence
        # day 3: reappears after a long gap → must be voyage 2, not 0
        (5, dt.datetime(2024, 1, 3, 1), 11.0, 21.0, 5.0),
    ]
    staging = str(tmp_path / "staging")
    spark.createDataFrame(
        rows, ["MMSI", "BaseDateTime", "LAT", "LON", "SOG"]
    ).write.parquet(staging)
    curated = str(tmp_path / "curated")
    state = str(tmp_path / "state")
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        run_trajectory_window(
            spark, staging, curated, state, d, d, mode="incremental", sample=False
        )
    got = {
        r["BaseDateTime"]: r["VoyageID"]
        for r in spark.read.parquet(curated).collect()
    }
    assert got[dt.datetime(2024, 1, 3, 1)] == 2


def test_monthly_rerun_preserves_other_months_voyages(spark, tmp_path):
    """Dynamic overwrite of a voyagestartdate partition must not delete
    summaries of voyages that start the same date but belong to a
    different month's run."""
    from noaa_ais_glue_lakehouse_spark.pipelines.staging_to_curated import (
        run_voyage_summary_monthly,
    )

    # voyage A: Jan 31 only. voyage B: starts Jan 31, continues into Feb.
    rows = [
        (1, dt.datetime(2024, 1, 31, 8), 10.0, 20.0, 5.0),
        (1, dt.datetime(2024, 1, 31, 9), 10.1, 20.1, 5.0),
        (2, dt.datetime(2024, 1, 31, 22), 30.0, 40.0, 5.0),
        (2, dt.datetime(2024, 2, 1, 0, 30), 30.1, 40.1, 5.0),
    ]
    curated = str(tmp_path / "curated")
    compute_trajectory(
        spark.createDataFrame(rows, ["MMSI", "BaseDateTime", "LAT", "LON", "SOG"])
    ).write.parquet(curated)
    partials = str(tmp_path / "partials")
    summary = str(tmp_path / "summary")
    run_voyage_summary_monthly(spark, curated, partials, summary, "2024-01")
    run_voyage_summary_monthly(spark, curated, partials, summary, "2024-02")
    got = spark.read.parquet(summary)
    rows_by_key = {(r["mmsi"], r["voyageid"]): r for r in got.collect()}
    # voyage A must survive the Feb run's rewrite of the Jan-31 partition
    assert (1, 0) in rows_by_key
    assert (2, 0) in rows_by_key
    # and voyage B's Feb rollup covers both days
    assert rows_by_key[(2, 0)]["pointcount"] == 2


def test_quarantine_second_day_preserves_first(spark, tmp_path):
    from noaa_ais_glue_lakehouse_spark.sources.writers import write_quarantine

    q = str(tmp_path / "q")
    d1 = spark.createDataFrame([(1, 2024, 1, 1)], ["v", "year", "month", "day"])
    d2 = spark.createDataFrame([(2, 2024, 1, 2)], ["v", "year", "month", "day"])
    assert write_quarantine(d1, q) == 1
    assert write_quarantine(d2, q) == 1
    import os

    assert os.path.isdir(q + "/year=2024/month=1/day=1")
    assert os.path.isdir(q + "/year=2024/month=1/day=2")


def test_trajectory_columns(spark):
    df = _staging_df(spark)
    out = compute_trajectory(df)
    cols = set(out.columns)
    assert {"VoyageID", "SegmentDistanceKM", "GeoHash", "movement_state"} <= cols
    g = out.filter(F.col("GeoHash").isNull()).count()
    assert g == 0


def test_run_voyage_summary_monthly_files(spark, tmp_path):
    """T5 through real file IO: partials partitioned by day, semi-join on
    month voyage keys, summary partitioned by start date; rerunnable."""
    curated = str(tmp_path / "curated")
    compute_trajectory(_staging_df(spark)).withColumn(
        "year", F.year("BaseDateTime")
    ).write.parquet(curated)

    from noaa_ais_glue_lakehouse_spark.pipelines.staging_to_curated import (
        run_voyage_summary_monthly,
    )

    out = run_voyage_summary_monthly(
        spark, curated, str(tmp_path / "partials"), str(tmp_path / "summary"),
        "2024-01",
    )
    rows = {(r["mmsi"], r["voyageid"]): r for r in out.collect()}
    assert len(rows) == 4  # 2 vessels × 2 voyages
    assert rows[(1, 0)]["pointcount"] == 3
    # rerun is idempotent (dynamic overwrite both layers)
    out2 = run_voyage_summary_monthly(
        spark, curated, str(tmp_path / "partials"), str(tmp_path / "summary"),
        "2024-01",
    )
    assert out2.count() == 4
    got = spark.read.parquet(str(tmp_path / "summary"))
    assert got.count() == 4


def test_list_partitions(spark):
    from noaa_ais_glue_lakehouse_spark.sources.writers import list_partitions

    df = spark.createDataFrame(
        [(1, 2024, 2), (2, 2024, 1), (3, 2024, 2)], ["v", "year", "day"]
    )
    assert list_partitions(df, ["year", "day"]) == [(2024, 1), (2024, 2)]


def test_daily_partials_and_monthly_rollup(spark):
    df = compute_trajectory(_staging_df(spark))
    partials = voyage_daily_partials(df)
    # voyage 0 of mmsi 1 spans two 'day' partials
    v0 = partials.filter((F.col("mmsi") == 1) & (F.col("voyageid") == 0))
    assert v0.count() == 2
    summary = monthly_voyage_summary(partials)
    row = summary.filter((F.col("mmsi") == 1) & (F.col("voyageid") == 0)).first()
    assert row["pointcount"] == 3
    assert row["voyagestart"] == dt.datetime(2024, 1, 1, 20)
    assert row["voyageend"] == dt.datetime(2024, 1, 2, 0, 30)
    assert abs(row["duration_hours"] - 4.5) < 1e-6
    # avg position = mean of the three points
    assert abs(row["avglat"] - (11.0 + 11.1 + 11.2) / 3) < 1e-4
