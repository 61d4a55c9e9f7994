"""BPE training, sorted-neighborhood linkage, z-test, RRF (q224-q227):
full Python-recompute parity pins at sf0.001 on top of the DuckDB
oracles (which check sf0.01/sf0.1 end-to-end).
"""

from __future__ import annotations

import math

from noaa_ais_glue_lakehouse_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()


def _python_bpe(word_counts: dict[str, int], rounds: int = 3):
    """Greedy BPE with the exact q224 semantics: overlapping adjacent
    pair counts, argmax tiebreak (count desc, a, b), 4-pass
    non-overlapping string replace."""
    cur = {
        " " + " ".join(w) + " ": c for w, c in word_counts.items()
    }
    merges = []
    for r in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for s, c in cur.items():
            toks = s.split()
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r + 1, a, b, cnt))
        needle, repl = f" {a} {b} ", f" {a}{b} "
        nxt: dict[str, int] = {}
        for s, c in cur.items():
            for _ in range(4):
                s = s.replace(needle, repl)
            nxt[s] = nxt.get(s, 0) + c
        cur = nxt
    return merges


def test_bpe_merges_match_python_reference(spark):
    wc: dict[str, int] = {}
    for r in _docs(spark):
        for w in r["text"].lower().split():
            wc[w] = wc.get(w, 0) + 1
    expect = _python_bpe(wc, rounds=3)
    got = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in sorted(
            catalog.queries()["q224_bpe_merges"](spark, SF_DIR).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    assert got == expect


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_python(spark):
    names = sorted(
        {
            r["p_name"]
            for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
        }
    )
    expect = set()
    for i, a in enumerate(names):
        for j in range(i + 1, min(i + 3, len(names))):
            d = _lev(a, names[j])
            if d <= 4:
                expect.add((a, names[j], j - i, d))
    got = {
        (r["name_a"], r["name_b"], r["idx_gap"], r["edit_dist"])
        for r in catalog.queries()["q225_sorted_neighborhood_pairs"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expect


def test_ztest_matches_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    n = {0: 0, 1: 0}
    x = {0: 0, 1: 0}
    for r in ev:
        if r["event_type"] in ("click", "purchase"):
            g = r["user_id"] % 2
            n[g] += 1
            x[g] += r["event_type"] == "purchase"
    pool = (x[0] + x[1]) / (n[0] + n[1])
    z = (x[0] / n[0] - x[1] / n[1]) / math.sqrt(
        pool * (1 - pool) * (1 / n[0] + 1 / n[1])
    )
    row = catalog.queries()["q226_two_proportion_ztest"](
        spark, SF_DIR
    ).collect()[0]
    assert (row["n_a"], row["x_a"], row["n_b"], row["x_b"]) == (
        n[0],
        x[0],
        n[1],
        x[1],
    )
    assert abs(row["z"] - round(z, 6)) < 1e-9


def test_rrf_fuses_bm25_and_length_rankings(spark):
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
    fused = {
        d: int(round(1e6 / (60 + r1[d]))) + int(round(1e6 / (60 + r2[d])))
        for d in bm25
    }
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["doc_id"], r["rrf_micro"])
        for r in catalog.queries()["q227_reciprocal_rank_fusion"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == expect


def test_prf_expansion_matches_python(spark):
    bm25 = {
        r["doc_id"]: r["score_micro"]
        for r in catalog._bm25_scored(spark, SF_DIR).collect()
    }
    top10 = sorted(bm25, key=lambda d: (-bm25[d], d))[:10]
    texts = {r["doc_id"]: r["text"].lower().split() for r in _docs(spark)}
    w: dict[str, list] = {}
    for d in top10:
        toks = texts[d]
        for t in toks:
            if t in ("spark", "join", "window"):
                continue
            e = w.setdefault(t, [set(), 0])
            e[0].add(d)
            e[1] += int(round(1e6 / len(toks)))
    expect = sorted(
        ((t, len(e[0]), e[1]) for t, e in w.items()),
        key=lambda x: (-x[2], x[0]),
    )[:10]
    got = [
        (r["tok"], r["n_docs"], r["weight_micro"])
        for r in catalog.queries()["q232_prf_expansion"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == expect


def test_conformal_interval_matches_python(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type: dict[str, list[int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            int(round(r["value"] * 100))
        )
    got = {
        r["event_type"]: r
        for r in catalog.queries()["q233_conformal_interval"](
            spark, SF_DIR
        ).collect()
    }
    for t, cents in by_type.items():
        n, sc = len(cents), sum(cents)
        scores = sorted(abs(c * n - sc) for c in cents)
        q = scores[(9 * n + 9) // 10 - 1]
        assert got[t]["n"] == n
        assert abs(got[t]["mu"] - round(sc / n / 100.0, 6)) < 1e-9
        assert abs(got[t]["q90_abs_resid"] - round(q / (n * 100.0), 6)) < 1e-9


def test_linear_forecast_matches_python(spark):
    from collections import Counter

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = Counter((r["event_type"], r["ts"].date()) for r in ev)
    got = {
        r["event_type"]: r
        for r in catalog.queries()["q234_linear_forecast"](
            spark, SF_DIR
        ).collect()
    }
    types = {t for t, _ in daily}
    for typ in types:
        pts = sorted((d, y) for (t, d), y in daily.items() if t == typ)
        d0 = pts[0][0]
        xy = [((d - d0).days, y) for d, y in pts]
        k = len(xy)
        st = sum(t for t, _ in xy)
        sy = sum(y for _, y in xy)
        stt = sum(t * t for t, _ in xy)
        sty = sum(t * y for t, y in xy)
        slope = (k * sty - st * sy) / (k * stt - st * st)
        intercept = (sy - slope * st) / k
        fc = intercept + slope * (max(t for t, _ in xy) + 1)
        assert got[typ]["n_days"] == k
        assert abs(got[typ]["slope"] - round(slope, 6)) < 1e-9
        assert abs(got[typ]["intercept"] - round(intercept, 6)) < 1e-9
        assert abs(got[typ]["forecast"] - round(fc, 6)) < 1e-9


def test_bpe_apply_matches_training_fusion(spark):
    """Encoding with the learned merges reproduces training's fusion on a
    known corpus: with 'abab' dominant, round 1 merges (a, b) and round 2
    merges (ab, ab); applying both to the vocabulary yields the expected
    symbol strings."""
    from noaa_ais_glue_lakehouse_spark.operators.tokenizer import (
        bpe_apply,
        bpe_learn,
    )

    wf = spark.createDataFrame(
        [("abab", 10), ("abc", 2)], ["w", "c"]
    )
    merges = bpe_learn(spark, wf, rounds=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("ab", "ab")]
    enc = {
        r["w"]: r["s"].split()
        for r in bpe_apply(wf.select("w"), merges).collect()
    }
    assert enc["abab"] == ["abab"]
    assert enc["abc"] == ["ab", "c"]
