"""Regenerate PLANS.md: physical-plan excerpts for flagship queries with
the scale properties each plan is supposed to exhibit.

Usage: python tools/planreport.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

# query -> (what to grep from the plan, why it matters at 100 TB)
SHOWCASE = {
    "q01_pricing_summary": (
        r"FileScan|PushedFilters|HashAggregate",
        "Filter pushed to the parquet reader, column-pruned ReadSchema, "
        "two-phase hash aggregation (map-side partials) — the scan reads "
        "only 7 of 16 lineitem columns.",
    ),
    "q11_sessionize": (
        r"Exchange|Window|FileScan",
        "ONE exchange on the entity key; every window step (lag, gap, "
        "prefix-sum) reuses the same partitioning. The reference's chain "
        "shuffled per window.",
    ),
    "q24_sample_trajectory": (
        r"Exchange|Window|FileScan",
        "The full Fact-1-style chain (lag features, keep flags, "
        "re-distance) still shuffles once.",
    ),
    "q39_nav_status_lookup": (
        r"Join|Exchange|FileScan",
        "Dimension lookups broadcast (BroadcastHashJoin, no exchange on "
        "the fact side for the join).",
    ),
    "q27_minhash_near_dups": (
        r"Join|Exchange|HashAggregate|Generate",
        "Banded LSH: signature index built once (explode + 32 min-aggs + "
        "collect_set in ONE aggregation, map-side combinable), band "
        "self-join is an equi-join on (band_idx, band_hash) with "
        "first-collision-band dedup inside the join condition — no "
        "cross product, no dropDuplicates pass, verify is |candidates| "
        "work.",
    ),
    "q57_asof_join": (
        r"Window|Exchange|Union",
        "As-of join via union + last(ignorenulls) window: one shuffle on "
        "the key, versus the naive ts-range theta join (cross product "
        "per key).",
    ),
    "q108_scd2_dim": (
        r"Window|Exchange|FileScan",
        "SCD2 interval build: change-detection window and interval-close "
        "window share ONE user_id exchange (the filter between them "
        "preserves partitioning).",
    ),
    "q112_merge_upsert": (
        r"Join|Exchange|Union|HashAggregate",
        "MERGE as anti-join + union: no full-outer wide rows; both "
        "shuffles key on the merge key, so bucketing both sides removes "
        "the exchanges entirely.",
    ),
    "q116_training_corpus_assembly": (
        r"Join|Exchange|Window|HashAggregate",
        "Corpus assembly funnel: quality filter and split are row-local "
        "(no exchange), dedup shuffles on the text hash, mixture and "
        "packing are one window pass each on small keys — no stage "
        "materializes more than |docs| rows.",
    ),
    "q171_jaccard_prefix_filter": (
        r"Join|Exchange|Window|HashAggregate",
        "EXACT all-pairs Jaccard with no cross product: every join is a "
        "keyed equi-join (rarest-first prefix tokens, then candidate-id "
        "verify); the explicit pair-key repartition defeats AQE's "
        "byte-based coalescing of the compute-bound verify stage.",
    ),
    "q172_max_concurrent_sessions": (
        r"Exchange|Window|Union|HashAggregate",
        "Global prefix scan without a single-partition window: range "
        "exchange + per-partition local scans + broadcast offsets; the "
        "only ORDER BY-without-PARTITION window runs over |partitions| "
        "rows.",
    ),
    "q220_auc_rank_sum": (
        r"Exchange|Window|HashAggregate",
        "Exact AUC with NO single-partition rank window: per-score hash "
        "aggregation, then the two-phase parallel prefix scan (range "
        "partition + local window + broadcast offsets) supplies the "
        "running negative count.",
    ),
    "q219_grid_knn_join": (
        r"BroadcastHashJoin|Exchange|Window|Generate",
        "Exact radius-bounded KNN: landmarks exploded x9 into neighbor "
        "cells and BROADCAST; candidates come from a cell-key equi-join "
        "(no cross product on the big side); per-point top-k window has "
        "bounded fan-in.",
    ),
    "q251_sequence_packing": (
        r"Exchange|Window|HashAggregate",
        "Training sequence packing: next-fit bucket = exclusive prefix "
        "sum via the two-phase scan; bin rollup is one hash aggregation. "
        "Never a global single-task window.",
    ),
    "q185_scd2_point_in_time": (
        r"Exchange|Window|Union",
        "Point-in-time SCD2 lookup as union + last_value carry: one "
        "entity exchange, versus the interval theta join the oracle "
        "states (which would fall back to a nested-loop join).",
    ),
    "q283_zorder_layout_audit": (
        r"HashAggregate|FileScan|Project",
        "Z-order clustering key: the 16-bit Morton interleave is pure "
        "codegen bit math in the projection — one hash aggregation, no "
        "shuffle beyond it; the key any writer can sortWithinPartitions "
        "by to get 2-D zone-map pruning.",
    ),
    "q284_bloom_filter_join": (
        r"Join|Exchange|HashAggregate",
        "Bloom join pruning: the bit set is an aggregate bounded by "
        "m_bits (never by build-side rows) and BROADCASTS into the "
        "probe — the runtime row-filter shape, with zero false "
        "negatives by construction.",
    ),
    "q318_kmeans_lloyd": (
        r"Join|Exchange|Window|HashAggregate",
        "Engine-exact Lloyd round: centroids are a k*d-row relation "
        "(BroadcastHashJoin on the dim index), assignment is a "
        "per-vector argmin window, update one hash aggregation — the "
        "broadcast side never grows with the corpus.",
    ),
    "q372_ngram_novelty_hashed": (
        r"Exchange|HashAggregate|Join|project",
        "The inverted-index df shuffle ships a fixed 16-hex md5-prefix "
        "key, not the raw 4-word gram string (hash computed row-locally "
        "inside the scan's codegen stage) — measured 31% off q349's "
        "decade-B wall at identical output (SCALING.md).",
    ),
    "q381_knn_adaptive_radius": (
        r"Join|Exchange|Window|HashAggregate",
        "Density-adaptive kNN: the radius comes from a 1-row stats "
        "aggregate broadcast onto both sides; candidate generation is "
        "an equi-join on (cy, cx) cell keys — no cartesian anywhere, "
        "candidates/point stay O(k) at any density, and the ranking "
        "window REUSES the point-side cell exchange (round 7: no "
        "candidate re-shuffle; decade-B wall 22.5s -> 5.7s, exponent "
        "0.65, SCALING.md).",
    ),
    "q373_contamination_report": (
        r"Join|Exchange|HashAggregate",
        "Decontamination at the source grain: the df-capped benchmark "
        "gram set BROADCASTS (benchmarks are KBs, corpora are TBs); the "
        "train-side gram stream joins map-side with no corpus shuffle "
        "for the probe.",
    ),
    "q382_kendall_tau_b": (
        r"HashAggregate|Join|Exchange",
        "τ-b collapses the corpus to ≤80 contingency cells in ONE "
        "two-phase aggregate; the concordant/discordant pair join is a "
        "broadcast over the bounded cell relation.",
    ),
    "q390_tpch_q2_min_cost_supplier": (
        r"Join|Exchange|Window|HashAggregate",
        "TPC-H Q2's correlated scalar subquery decorrelated: the "
        "region-filtered supplier side BROADCASTS, the (part, supplier) "
        "cost rollup partial-aggregates map-side, and the per-part MIN "
        "is a window over the part-clustered join output — one shuffle "
        "on the fact side total.",
    ),
    "q394_product_quantization_portable": (
        r"Scan|project|WholeStageCodegen|Exchange",
        "PQ assignment is a PURE row-local projection — 64 distance "
        "expressions inside one WholeStageCodegen span, ZERO exchanges; "
        "the compression pass stays scan-bound at any scale.",
    ),
    "q399_fuzzy_decontamination": (
        r"Join|Exchange|HashAggregate|Broadcast",
        "Asymmetric LSH: the benchmark side's banded signatures "
        "BROADCAST (eval suites are KBs), so corpus candidate "
        "generation never shuffles the corpus; the exact-Jaccard "
        "verify touches |candidates| rows only.",
    ),
    "q400_ivf_adc_portable": (
        r"Join|Exchange|HashAggregate|Broadcast|Window",
        "IVF-ADC serving topology: the 64-row codebook and the per-query "
        "LUTs broadcast; base-code assignment is one map-side-combinable "
        "min-struct rollup; candidates come from the coarse-bucket "
        "equi-join and the ADC join is integer LUT lookups — no float "
        "math and no base-vector bytes at query time.",
    ),
    "q422_hilbert_layout_audit": (
        r"BroadcastHashJoin|Exchange|HashAggregate|FileScan",
        "LUT-composed Hilbert index: FIVE BroadcastHashJoins against the "
        "64-row block automaton, zero shuffles before the two 64-bucket "
        "aggregates. The unrolled loop-carried recurrence alternative "
        "measurably OOMs Catalyst (projection collapse duplicates the "
        "(x, y, d) state ~7× per round) — byte-at-a-time LUT joins are "
        "the scale-safe evaluation of any space-filling curve.",
    ),
    "q430_shapley_attribution": (
        r"Join|Exchange|HashAggregate|Window",
        "Exact Shapley over 16 coalition chains solved SIMULTANEOUSLY: "
        "the journey extraction (two user-day windows) runs once behind "
        "localCheckpoint; all value-iteration rounds operate on a "
        "(mask, state) relation of ~112 rows, so attribution cost is "
        "independent of event volume after the first aggregate.",
    ),
    "q413_negative_sampling": (
        r"BroadcastHashJoin|Exchange|HashAggregate|Generate",
        "Inverse-CDF sampling as a broadcast EQUI-join: the integer CDF "
        "quantizes onto 1024 slots (|vocab|+1024-row broadcast table), "
        "each hash-seeded draw joins on its slot and exact-filters "
        "lo <= u < hi — the alias-table pattern, shuffle-free until the "
        "token-grain summary.",
    ),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from noaa_ais_glue_lakehouse_spark.plans import catalog

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("planreport")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    out = [
        "# PLANS — physical-plan evidence for the flagship queries",
        "",
        "Generated by `python tools/planreport.py` (sf0.001, AQE off at plan",
        "print time). Each excerpt keeps only the join/exchange/aggregate/scan",
        "lines — the operators that determine 100 TB behavior.",
        "",
    ]
    for name, (pat, why) in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            line[:150]
            for line in plan.splitlines()
            if re.search(pat, line)
        ][:18]
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Scale property:** {why}")
        out.append("")
        out.append("```")
        out.extend(lines)
        out.append("```")
        out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
