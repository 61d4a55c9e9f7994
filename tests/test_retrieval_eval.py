"""Retrieval + model-eval batch (q216-q223): hand-computed pins for the
operator extractions and formula-level cross-checks for the catalog
queries the DuckDB oracle can only verify end-to-end.
"""

from __future__ import annotations

import math

from noaa_ais_glue_lakehouse_spark.operators.dedup import repeated_span_grams
from noaa_ais_glue_lakehouse_spark.operators.evaluation import exact_auc
from noaa_ais_glue_lakehouse_spark.operators.similarity import grid_knn_join
from noaa_ais_glue_lakehouse_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_repeated_span_grams_flags_planted_span(spark):
    span = "a b c d e f g h"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"x y {span} z w"),
            (2, f"{span} q r s t u v"),
            (3, "entirely different tokens with no overlap at all here ok"),
        ],
        ["doc_id", "text"],
    )
    grams = repeated_span_grams(docs, "doc_id", "text", n=8)
    shared = (
        grams.groupBy("g").count().filter("count >= 2").join(grams, "g")
    )
    flagged = {r["doc_id"] for r in shared.select("doc_id").distinct().collect()}
    assert flagged == {1, 2}


def test_repeated_span_grams_short_doc_yields_no_grams(spark):
    docs = spark.createDataFrame([(1, "only three tokens")], ["doc_id", "text"])
    assert repeated_span_grams(docs, n=8).count() == 0


def test_exact_auc_hand_computed_with_ties(spark):
    # scores: pos={3, 2}, neg={2, 1}. Pairs: (3>2)=1, (3>1)=1, (2==2)=.5,
    # (2>1)=1 -> U=3.5, AUC = 3.5/4 = 0.875
    df = spark.createDataFrame(
        [(3, 1), (2, 1), (2, 0), (1, 0)], ["score", "pos"]
    )
    row = exact_auc(df, "score", "pos").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (2, 2)
    assert row["auc_num"] == 7  # 2U
    assert abs(row["auc"] - 0.875) < 1e-9


def test_exact_auc_perfect_and_inverted(spark):
    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], ["score", "pos"]
    )
    assert exact_auc(perfect, "score", "pos").collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 0), (10, 0)], ["score", "pos"]
    )
    assert exact_auc(inverted, "score", "pos").collect()[0]["auc"] == 0.0


def test_grid_knn_join_matches_brute_force(spark):
    # deterministic pseudo-random points; refs on a coarse lattice
    pts = spark.createDataFrame(
        [(i, (i * 37 % 180) - 90.0, (i * 53 % 360) - 180.0) for i in range(200)],
        ["event_id", "lat", "lon"],
    )
    refs = spark.createDataFrame(
        [(j, (j * 61 % 180) - 90.0, (j * 29 % 360) - 180.0) for j in range(25)],
        ["ref_id", "rlat", "rlon"],
    )
    got = {
        (r["event_id"], r["knn_rank"]): (r["ref_id"], r["dist_deg"])
        for r in grid_knn_join(pts, refs, k=2, radius=10.0).collect()
    }
    # brute force in python
    P = {r["event_id"]: (r["lat"], r["lon"]) for r in pts.collect()}
    R = {r["ref_id"]: (r["rlat"], r["rlon"]) for r in refs.collect()}
    for eid, (la, lo) in P.items():
        cands = sorted(
            (
                ((la - ra) ** 2 + (lo - ro) ** 2, rid)
                for rid, (ra, ro) in R.items()
                if (la - ra) ** 2 + (lo - ro) ** 2 <= 100.0
            )
        )
        for rank, (d2, rid) in enumerate(cands[:2], start=1):
            assert got[(eid, rank)][0] == rid, (eid, rank)
            assert abs(got[(eid, rank)][1] - round(math.sqrt(d2), 6)) < 1e-9
        assert (eid, len(cands[:2]) + 1) not in got


def test_bm25_top1_matches_python_recompute(spark):
    rows = catalog.queries()["q218_bm25_topk"](spark, SF_DIR).collect()
    assert len(rows) == 20
    # scores must be non-increasing with doc_id tiebreak
    keys = [(-r["score_micro"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # recompute the winner's score from raw tokens
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n = float(len(docs))
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = ("spark", "join", "window")
    df = {t: float(sum(1 for toks in docs.values() if t in toks)) for t in terms}
    top = rows[0]
    expect = 0
    for t in terms:
        tf = float(docs[top["doc_id"]].count(t))
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        dl = float(len(docs[top["doc_id"]]))
        c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        expect += int(round(c * 1e6))
    assert top["score_micro"] == expect


def test_ndcg_bounded_and_consistent(spark):
    row = catalog.queries()["q223_ndcg_eval"](spark, SF_DIR).collect()[0]
    assert 0 < row["dcg_micro"] <= row["idcg_micro"]
    assert 0.0 < row["ndcg"] <= 1.0
    assert abs(row["ndcg"] - round(row["dcg_micro"] / row["idcg_micro"], 6)) < 1e-12


def test_cross_correlation_is_bounded_and_full_lag_spine(spark):
    rows = catalog.queries()["q221_lagged_cross_correlation"](
        spark, SF_DIR
    ).collect()
    lags = sorted(r["lag"] for r in rows)
    assert lags == list(range(-3, 4))
    for r in rows:
        assert -1.0 <= r["xcorr"] <= 1.0
        assert r["n_days"] >= 1


def test_maxsim_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    milli = {
        r["vec_id"]: np.round(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in emb
    }
    labels = {r["vec_id"]: r["label"] for r in emb}
    queries = {i: milli[i] for i in (0, 1, 2) if i in milli}
    expect: dict[int, int] = {}
    for lbl in set(labels.values()):
        group = [v for vid, v in milli.items() if labels[vid] == lbl]
        expect[lbl] = sum(
            int(max(int(q @ d) for d in group)) for q in queries.values()
        )
    got = {
        r["label"]: r["maxsim_milli2"]
        for r in catalog.queries()["q222_maxsim_late_interaction"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expect


def test_token_pmi_matches_python(spark):
    import math
    from itertools import combinations

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    incidence = {r["doc_id"]: set(r["text"].lower().split()) for r in docs}
    nd = len(incidence)
    na: dict[str, int] = {}
    nab: dict[tuple, int] = {}
    for toks in incidence.values():
        for t in toks:
            na[t] = na.get(t, 0) + 1
        for a, b in combinations(sorted(toks), 2):
            nab[(a, b)] = nab.get((a, b), 0) + 1
    scored = [
        (a, b, c, int(round(1e6 * math.log(c * nd / (na[a] * na[b])))))
        for (a, b), c in nab.items()
        if c >= 5
    ]
    expect = sorted(scored, key=lambda x: (-x[3], x[0], x[1]))[:50]
    got = [
        (r["tok_a"], r["tok_b"], r["n_ab"], r["pmi_micro"])
        for r in catalog.queries()["q238_token_pmi"](spark, SF_DIR).collect()
    ]
    assert got == expect


def test_burstiness_matches_python(spark):
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    nd = len(docs)
    sc: dict[str, int] = {}
    scc: dict[str, int] = {}
    dw: dict[str, int] = {}
    for r in docs:
        for t, c in Counter(r["text"].lower().split()).items():
            sc[t] = sc.get(t, 0) + c
            scc[t] = scc.get(t, 0) + c * c
            dw[t] = dw.get(t, 0) + 1
    got = {
        r["tok"]: r
        for r in catalog.queries()["q239_token_burstiness"](
            spark, SF_DIR
        ).collect()
    }
    expect_toks = {t for t, s in sc.items() if s >= 50}
    assert set(got) == expect_toks
    for t in expect_toks:
        fano = (nd * scc[t] - sc[t] * sc[t]) / (nd * sc[t])
        assert got[t]["n_total"] == sc[t] and got[t]["n_docs"] == dw[t]
        assert abs(got[t]["fano"] - round(fano, 6)) < 1e-9


def test_heaps_law_matches_python(spark):
    import math

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per_src: dict[str, list] = {}
    for r in docs:
        e = per_src.setdefault(r["source"], [0, set()])
        toks = r["text"].lower().split()
        e[0] += len(toks)
        e[1].update(toks)
    pts = [
        (math.log(n), math.log(len(v))) for n, v in per_src.values()
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    logk = (sy - slope * sx) / k
    row = catalog.queries()["q240_heaps_law"](spark, SF_DIR).collect()[0]
    assert row["n_points"] == k
    assert abs(row["heaps_beta"] - round(slope, 6)) < 1e-6
    assert abs(row["log_k"] - round(logk, 6)) < 1e-6


def test_doremi_reweight_matches_python(spark):
    import math
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tc: dict[tuple, int] = Counter()
    for r in docs:
        for t in r["text"].lower().split():
            tc[(r["source"], t)] += 1
    ns = Counter()
    nt = Counter()
    for (s, t), n in tc.items():
        ns[s] += n
        nt[t] += n
    nn = sum(tc.values())
    ce = {
        s: sum(
            int(round(1e6 * n * (-math.log(nt[t] / nn)) / ns[s]))
            for (s2, t), n in tc.items()
            if s2 == s
        )
        for s in ns
    }
    mean_ce = sum(ce.values()) / len(ce)
    raw = {
        s: int(
            round(1e9 * (ns[s] / nn) * math.exp((ce[s] - mean_ce) / 1e6))
        )
        for s in ns
    }
    traw = sum(raw.values())
    got = {
        r["source"]: r
        for r in catalog.queries()["q246_doremi_reweight"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(ns)
    wsum = 0.0
    for s in ns:
        assert abs(got[s]["cross_entropy"] - round(ce[s] / 1e6, 6)) < 1e-9
        assert abs(got[s]["new_weight"] - round(raw[s] / traw, 6)) < 1e-9
        wsum += got[s]["new_weight"]
    assert abs(wsum - 1.0) < 1e-4  # weights normalize


def test_contamination_screen_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    bench_grams = set()
    grams_by_doc = {}
    for r in docs:
        toks = r["text"].lower().split()
        gs = {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        }
        grams_by_doc[r["doc_id"]] = gs
        if r["doc_id"] % 97 == 0:
            bench_grams |= gs
    n_docs = {}
    n_cont = {}
    for r in docs:
        if r["doc_id"] % 97 == 0:
            continue
        n_docs[r["source"]] = n_docs.get(r["source"], 0) + 1
        if grams_by_doc[r["doc_id"]] & bench_grams:
            n_cont[r["source"]] = n_cont.get(r["source"], 0) + 1
    got = {
        r["source"]: (r["n_docs"], r["n_contaminated"])
        for r in catalog.queries()["q247_benchmark_contamination"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {
        s: (n, n_cont.get(s, 0)) for s, n in n_docs.items()
    }


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()


def test_sequence_packing_matches_python(spark):
    docs = sorted(_docs(spark), key=lambda r: r["doc_id"])
    bins: dict[int, list[int]] = {}
    cum = 0
    for r in docs:
        n = len(r["text"].lower().split())
        b = cum // 512
        bins.setdefault(b, []).append(n)
        cum += n
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"])
        for r in catalog.queries()["q251_sequence_packing"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {b: (len(v), sum(v)) for b, v in bins.items()}
    # next-fit fill rates hover around 1: a bin can undershoot only by
    # less than one document (the straddling doc lands in the next bin)
    max_doc = max(n for v in bins.values() for n in v)
    for r in catalog.queries()["q251_sequence_packing"](
        spark, SF_DIR
    ).collect():
        if r["bin"] != max(bins):
            assert r["n_tokens"] > 512 - max_doc


def test_budgeted_selection_matches_python(spark):
    docs = _docs(spark)
    scored = []
    for r in docs:
        toks = r["text"].lower().split()
        if not toks:
            continue
        q = int(round(1e6 * len(set(toks)) / len(toks)))
        scored.append((r["doc_id"], r["source"], len(toks), q))
    scored.sort(key=lambda x: (-x[3], x[0]))
    cum, sel = 0, []
    for doc_id, src, n, q in scored:
        cum += n
        if cum <= 10000:
            sel.append((src, n, q))
    expect: dict[str, list] = {}
    for src, n, q in sel:
        e = expect.setdefault(src, [0, 0, 0])
        e[0] += 1
        e[1] += n
        e[2] += q
    got = {
        r["source"]: r
        for r in catalog.queries()["q252_budgeted_selection"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(expect)
    for src, (n_sel, toks, qsum) in expect.items():
        assert got[src]["n_selected"] == n_sel
        assert got[src]["tokens_selected"] == toks
        assert (
            abs(got[src]["mean_quality"] - round(qsum / n_sel / 1e6, 6))
            < 1e-9
        )


def test_rbo_matches_python(spark):
    bm25 = {
        r["doc_id"]: r["score_micro"]
        for r in catalog._bm25_scored(spark, SF_DIR).collect()
    }
    lens = {r["doc_id"]: r["n_chars"] for r in _docs(spark)}
    r1 = {
        d: i + 1
        for i, d in enumerate(sorted(bm25, key=lambda d: (-bm25[d], d)))
    }
    r2 = {
        d: i + 1
        for i, d in enumerate(sorted(lens, key=lambda d: (-lens[d], d)))
    }
    rbo_micro = 0
    for depth in range(1, 21):
        o = sum(1 for d in bm25 if r1[d] <= depth and r2[d] <= depth)
        rbo_micro += int(round(1e6 * 0.1 * (o / depth) * 0.9 ** (depth - 1)))
    o20 = sum(1 for d in bm25 if r1[d] <= 20 and r2[d] <= 20)
    row = catalog.queries()["q253_rank_biased_overlap"](
        spark, SF_DIR
    ).collect()[0]
    assert row["overlap_at_20"] == o20
    assert row["rbo_micro"] == rbo_micro
