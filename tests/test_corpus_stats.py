"""Round-6 corpus-statistics operators: contamination report (q373),
KS drift (q374), signature terms (q375), Fleiss' kappa (q376), vocab
growth curve (q377), portable HLL (q378), equi-depth bins (q379).

The DuckDB oracle gate (tools/selfcheck.py) checks cross-engine
equality; these tests pin ALGORITHMIC properties on hand-built inputs
where the right answer is known independently of any engine.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.plans.catalog import queries

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_contamination_report_flags_planted_copy(spark, tmp_path):
    """A train doc that verbatim-copies a benchmark doc must be its
    source's contaminated doc; an unrelated source reports zero."""
    bench_text = " ".join(f"b{i}" for i in range(12))
    clean_text = " ".join(f"c{i}" for i in range(12))
    rows = [
        (1, bench_text, "en", "src0", len(bench_text)),
        (2, bench_text, "en", "srcA", len(bench_text)),  # full copy
        (3, clean_text, "en", "srcA", len(clean_text)),
        (4, clean_text, "en", "srcB", len(clean_text)),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r
        for r in queries()["q373_contamination_report"](spark, d).collect()
    }
    assert got["srcA"]["n_docs"] == 2
    assert got["srcA"]["n_contaminated"] == 1
    # the copy shares every one of its 5 distinct 8-grams -> frac_u 10^6
    assert got["srcA"]["worst_doc_frac_u"] == 1_000_000
    assert got["srcB"]["n_contaminated"] == 0
    assert got["srcB"]["worst_doc_frac_u"] == 0


def test_ks_drift_known_two_sample(spark, tmp_path):
    """Hand-computable KS: srcX lengths {10,20}, srcY lengths {30,40}
    (each x2 docs). Disjoint supports => D = 1 exactly for both."""
    rows = []
    did = 0
    for ln in (10, 10, 20, 20):
        rows.append((did, "t", "en", "srcX", ln))
        did += 1
    for ln in (30, 30, 40, 40):
        rows.append((did, "t", "en", "srcY", ln))
        did += 1
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r for r in queries()["q374_ks_source_drift"](spark, d).collect()
    }
    assert got["srcX"]["ks_stat"] == 1.0 and got["srcY"]["ks_stat"] == 1.0
    assert got["srcX"]["n_src"] == 4 and got["srcX"]["n_rest"] == 4
    # numerator is D * n_src * n_rest
    assert got["srcX"]["ks_num"] == 16


def test_signature_terms_discrete_idf(spark, tmp_path):
    """A term in every doc scores 0 (idf floor(log2(1)) = 0); a term
    unique to one source dominates its ranking."""
    rows = [
        (1, "common rare1 common", "en", "sA", 19),
        (2, "common common", "en", "sB", 13),
        (3, "common", "en", "sB", 6),
        (4, "common", "en", "sB", 6),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = queries()["q375_source_signature_terms"](spark, d).collect()
    sa = {r["tok"]: r for r in out if r["source"] == "sA"}
    # rare1: tf=1, df=1, N=4 -> idf = floor(log2(4)) = 2 -> score 2
    assert sa["rare1"]["score_u"] == 2 and sa["rare1"]["rk"] == 1
    # common: df=4 -> idf = 0 -> score 0, ranks below rare1
    assert sa["common"]["score_u"] == 0


def test_fleiss_kappa_exact_formula(spark):
    """Fleiss' kappa from the engine must equal the closed form on its
    own exact integer aggregates, computed independently in Python."""
    row = queries()["q376_fleiss_kappa"](spark, SF).collect()[0]
    n, s_sum, cj2 = row["n_items"], row["s_sum"], row["sum_cj2"]
    p_bar = s_sum / (n * 6.0)
    p_e = cj2 / (9.0 * n * n)
    assert row["fleiss_kappa"] == round((p_bar - p_e) / (1.0 - p_e), 6)
    assert -1.0 <= row["fleiss_kappa"] <= 1.0
    assert row["n_raters"] == 3


def test_fleiss_kappa_degenerate_corpus(spark, tmp_path):
    """A corpus where two of the three rater rules are CONSTANT (hour
    always 0; value always < 167): kappa stays defined (no division by
    zero as P_e grows) and within bounds, and the integer aggregates
    match a direct Python recount of the planted rows."""
    import pyspark.sql.functions as SF_

    d = str(tmp_path / "sf")
    spark.range(200).select(
        SF_.col("id").alias("event_id"),
        (SF_.col("id") % 100).cast("double").alias("value"),  # all r1=0
        SF_.lit("t").alias("event_type"),
        SF_.col("id").alias("user_id"),
        SF_.to_timestamp(SF_.lit("2024-01-01 00:00:00")).alias("ts"),
    ).write.parquet(f"{d}/events.parquet")
    row = queries()["q376_fleiss_kappa"](spark, d).collect()[0]
    assert row["n_items"] == 200
    # recount: r1=0, r3=0 always; r2 = (id*2654435761) % 3
    s_expect = 0
    votes = [0] * 3
    for i in range(200):
        r2 = (i * 2654435761) % 3
        s_expect += 6 if r2 == 0 else 2  # r1==r3 always agree
        votes[0] += 2
        votes[r2] += 1
    assert row["s_sum"] == s_expect
    assert row["sum_cj2"] == sum(v * v for v in votes)
    assert -1.0 <= row["fleiss_kappa"] <= 1.0


def test_vocab_growth_curve_monotone_and_total(spark):
    rows = queries()["q377_vocab_growth_curve"](spark, SF).collect()
    rows.sort(key=lambda r: r["checkpoint_docs"])
    vocab = [r["vocab_size"] for r in rows]
    assert vocab == sorted(vocab)  # cumulative
    assert sum(r["new_tokens"] for r in rows) == vocab[-1]
    assert vocab[-1] > 0


def test_hll_estimate_within_theoretical_error(spark):
    """HLL with m=256 registers has relative standard error
    1.04/sqrt(256) = 6.5%; require every source within 4 sigma."""
    rows = queries()["q378_hll_distinct_portable"](spark, SF).collect()
    assert rows
    for r in rows:
        rel = abs(r["hll_estimate"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel < 4 * (1.04 / math.sqrt(256)), (
            r["source"], r["n_exact"], r["hll_estimate"])


def test_equidepth_bins_within_one(spark):
    rows = queries()["q379_equidepth_bins"](spark, SF).collect()
    assert len(rows) == 10
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1
    rows.sort(key=lambda r: r["bin"])
    # bins tile the value range in order
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9


def test_contamination_report_broadcasts_gram_set(spark):
    plan = queries()["q373_contamination_report"](
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
