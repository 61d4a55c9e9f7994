"""Seasonal decomposition, calibration, spectral features, covariance
(q228-q231): Python/numpy recompute parity at sf0.001 plus a
known-waveform pin for the FFT path.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict  # noqa: F401

from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
    extract_spectral_features,
)
from noaa_ais_glue_lakehouse_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_seasonal_decomposition_matches_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = Counter(r["ts"].date() for r in ev)
    days = sorted(daily)
    grand = sum(daily.values()) / len(days)
    wd_mean = defaultdict(list)
    for d in days:
        wd_mean[d.weekday()].append(daily[d])
    expect = {}
    for k, d in enumerate(days):
        if k < 3 or k >= len(days) - 3:
            continue
        trend = sum(daily[days[k + o]] for o in range(-3, 4)) / 7.0
        seas = sum(wd_mean[d.weekday()]) / len(wd_mean[d.weekday()]) - grand
        expect[d] = (
            daily[d],
            round(trend, 6),
            round(seas, 6),
            round(daily[d] - trend - seas, 6),
        )
    got = {
        r["d"]: (r["n"], r["trend"], r["seasonal"], r["resid"])
        for r in catalog.queries()["q228_seasonal_decomposition"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        for a, b in zip(got[d], expect[d]):
            assert abs(a - b) < 1e-9, (d, got[d], expect[d])


def test_calibration_bins_match_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n, cents, pos
    for r in ev:
        b = min(int(r["value"] // 50.0), 9)
        agg[b][0] += 1
        agg[b][1] += int(round(r["value"] * 100))
        agg[b][2] += r["event_type"] == "purchase"
    got = {
        r["bin"]: r
        for r in catalog.queries()["q229_calibration_bins"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(agg)
    for b, (n, cents, pos) in agg.items():
        assert got[b]["n"] == n
        assert abs(got[b]["mean_score"] - round(cents / n / 50000.0, 6)) < 1e-9
        assert abs(got[b]["frac_pos"] - round(pos / n, 6)) < 1e-9


def test_spectral_features_pure_tone(spark):
    import numpy as np

    n = 64
    cycles = 8  # tone at normalized frequency 8/64 = 0.125
    t = np.arange(n * 4)
    wave = (10000 * np.sin(2 * math.pi * cycles * t / n)).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(wave.tobytes()))], ["doc_id", "payload"]
    )
    rows = extract_spectral_features(
        df, "doc_id", "payload", frame_samples=n
    ).collect()
    assert len(rows) == 4
    for r in rows:
        # centroid at the tone frequency; for N=64 the tone's rfft bin 8
        # lands in band_2 = [N/8, N/4) = bins [8, 16)
        assert abs(r["centroid"] - cycles / n) < 0.01
        assert r["band_2"] > 0.95
        assert r["band_0"] < 0.05 and r["band_3"] < 0.05


def test_spectral_silence_and_short_payloads(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(b"\x00" * 256)),  # 128 zero samples -> 2 frames of 64
            (2, bytearray(b"\x01")),  # shorter than one frame -> no rows
        ],
        ["doc_id", "payload"],
    )
    rows = extract_spectral_features(
        df, "doc_id", "payload", frame_samples=64
    ).collect()
    assert {r["id"] for r in rows} == {1}
    for r in rows:
        assert r["centroid"] == 0.0
        assert r["band_0"] == r["band_1"] == r["band_2"] == r["band_3"] == 0.0


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    M = np.array(
        [
            np.round(np.array(r["embedding"], dtype=np.float64) * 1000)
            for r in emb
        ],
        dtype=np.int64,
    )
    n, d = M.shape
    S = M.sum(axis=0)
    G = M.T @ M
    got = {
        (r["i"], r["j"]): (r["cov_num"], r["cov"])
        for r in catalog.queries()["q231_embedding_covariance"](
            spark, SF_DIR
        ).collect()
    }
    assert len(got) == d * (d + 1) // 2
    for (i, j), (num, cov) in got.items():
        expect_num = int(n * G[i - 1, j - 1] - S[i - 1] * S[j - 1])
        assert num == expect_num
        assert abs(cov - round(expect_num / (n * (n - 1.0)) / 1e6, 6)) < 1e-9


def test_next_event_accuracy_matches_python(spark):
    from datetime import date

    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    split = date(2024, 1, 21)
    trans = []
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            trans.append((a["event_type"], b["event_type"], b["ts"].date()))
    train = defaultdict(Counter)
    for cur, nxt, nd in trans:
        if nd < split:
            train[cur][nxt] += 1
    pred = {
        cur: min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for cur, cnt in train.items()
    }
    stats = defaultdict(lambda: [0, 0])
    for cur, nxt, nd in trans:
        if nd >= split and cur in pred:
            stats[cur][0] += 1
            stats[cur][1] += nxt == pred[cur]
    got = {
        r["cur_type"]: (r["n_test"], r["n_correct"], r["accuracy"])
        for r in catalog.queries()["q241_next_event_accuracy"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(stats)
    for cur, (n, c) in stats.items():
        assert got[cur][0] == n and got[cur][1] == c
        assert abs(got[cur][2] - round(c / n, 6)) < 1e-9


def test_woe_iv_matches_python(spark):
    import math
    import re

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        b = int(re.search(r'"k":\s*(\d+)', r["props"]).group(1)) % 10
        if r["event_type"] == "purchase":
            agg[b][0] += 1
        else:
            agg[b][1] += 1
    pt = sum(v[0] for v in agg.values())
    qt = sum(v[1] for v in agg.values())
    got = {
        r["bucket"]: r
        for r in catalog.queries()["q242_woe_iv_encoding"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(agg)
    for b, (p, q) in agg.items():
        woe = math.log((p / pt) / (q / qt))
        assert got[b]["n_pos"] == p and got[b]["n_neg"] == q
        assert abs(got[b]["woe"] - round(woe, 6)) < 1e-9
        assert (
            abs(got[b]["iv_contrib"] - round((p / pt - q / qt) * woe, 6))
            < 1e-9
        )


def test_loo_target_encoding_matches_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    m = defaultdict(lambda: [0, 0])
    for r in ev:
        c = int(round(r["value"] * 100))
        m[r["event_type"]][0] += 1
        m[r["event_type"]][1] += c
    got = {
        r["event_id"]: r["loo_mean"]
        for r in catalog.queries()["q243_loo_target_encoding"](
            spark, SF_DIR
        ).collect()
    }
    assert len(got) == len(ev)
    for r in ev:
        n, sc = m[r["event_type"]]
        c = int(round(r["value"] * 100))
        expect = round((sc - c) / ((n - 1) * 100.0), 6)
        assert abs(got[r["event_id"]] - expect) < 1e-9


def _daily_counts(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    return Counter(r["ts"].date() for r in ev)


def test_theil_sen_matches_python(spark):
    daily = _daily_counts(spark)
    days = sorted(daily)
    slopes = []
    for i, d1 in enumerate(days):
        for d2 in days[i + 1 :]:
            slopes.append(
                ((daily[d2] - daily[d1]) / (d2 - d1).days, d1, d2)
            )
    slopes.sort()
    m = len(slopes)
    med = slopes[(m + 1) // 2 - 1][0]
    row = catalog.queries()["q248_theil_sen_slope"](spark, SF_DIR).collect()[0]
    assert row["n_days"] == len(days) and row["n_pairs"] == m
    assert abs(row["theil_sen_slope"] - round(med, 6)) < 1e-9


def test_mann_kendall_matches_python(spark):
    daily = _daily_counts(spark)
    days = sorted(daily)
    n = len(days)
    s = 0
    for i, d1 in enumerate(days):
        for d2 in days[i + 1 :]:
            diff = daily[d2] - daily[d1]
            s += (diff > 0) - (diff < 0)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(daily.values()).values()
        if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var)
    row = catalog.queries()["q249_mann_kendall"](spark, SF_DIR).collect()[0]
    assert (row["n_days"], row["mk_s"]) == (n, s)
    assert abs(row["var_s"] - round(var, 6)) < 1e-9
    assert abs(row["z"] - round(z, 6)) < 1e-9


def test_fuzzy_entity_clusters_transitive(spark):
    rows = catalog.queries()["q250_fuzzy_entity_clusters"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        members = r["members"].split("|")
        assert r["n_members"] == len(members) >= 2
        assert r["entity"] == min(members)  # canonical = lexicographic min
        assert sorted(members) == members
    # every name appears in at most one cluster
    all_members = [m for r in rows for m in r["members"].split("|")]
    assert len(all_members) == len(set(all_members))


def test_join_cardinality_estimate_matches_python(spark):
    from collections import Counter

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    na = Counter(r["o_custkey"] for r in orders)
    nb = Counter(r["c_custkey"] for r in cust)
    true_size = sum(na[k] * nb[k] for k in na if k in nb)
    est = 100 * sum(
        na[k] * nb[k] for k in na if k in nb and k % 100 == 0
    )
    row = catalog.queries()["q256_join_cardinality_estimate"](
        spark, SF_DIR
    ).collect()[0]
    assert (row["true_size"], row["est_size"]) == (true_size, est)
    assert (
        abs(row["rel_error"] - round(abs(est - true_size) / true_size, 6))
        < 1e-9
    )


def test_acf_periodicity_matches_python(spark):
    daily = _daily_counts(spark)
    days = sorted(daily)
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in catalog.queries()["q257_acf_periodicity"](
            spark, SF_DIR
        ).collect()
    }
    import datetime as dt

    for lag in range(1, 15):
        pts = [
            (daily[d], daily[d + dt.timedelta(days=lag)])
            for d in days
            if d + dt.timedelta(days=lag) in daily
        ]
        if not pts:
            assert lag not in got
            continue
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sz = sum(z for _, z in pts)
        sxx = sum(x * x for x, _ in pts)
        szz = sum(z * z for _, z in pts)
        sxz = sum(x * z for x, z in pts)
        r = (n * sxz - sx * sz) / math.sqrt(
            (n * sxx - sx * sx) * (n * szz - sz * sz)
        )
        assert got[lag][0] == n
        assert abs(got[lag][1] - round(r, 6)) < 1e-9
