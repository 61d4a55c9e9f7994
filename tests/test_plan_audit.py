"""Physical-plan audit across the catalog — the 100 TB guardrails.

A correctness-green query can still be scale-broken: an accidental
cartesian product, a scan that reads every column, or a window chain
that shuffles per window. These tests pin the plan properties the
design relies on, so a refactor that silently degrades a plan fails CI
instead of the bench.
"""

from __future__ import annotations

import pytest

from noaa_ais_glue_lakehouse_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"

# Deliberate O(n²) oracle anchors carry baseline_only=True in the
# registry itself; the plan scan derives that part of the allowlist from
# the flag so the catalog, not this test, is the source of truth.
BASELINE_ONLY = catalog.baseline_only_queries()

# Bounded non-equi joins, individually justified:
ALLOWED_NON_EQUI = {
    # broadcast-cross-join top-k whose query side is bounded by
    # construction (the query set broadcasts; corpus side is linear)
    "q32_cosine_topk",
    # deliberate SINGLE-ROW broadcast cross join: attaching the corpus
    # count scalar (idf denominator) — O(|tf|) rows × 1, not a fallback
    "q92_tfidf_top_terms",
    # deliberate 1-row × 1-row cross join: pairing the FK-orphan count
    # aggregate with the total-rows aggregate in the expectations report
    "q125_expectations_report",
    # deliberate SINGLE-ROW broadcast cross join: attaching the corpus
    # (total, vocab-size) scalar to the token stream for LM smoothing
    "q137_unigram_logprob",
    # deliberate SINGLE-ROW broadcast cross join: attaching the half-
    # totals scalar to the |bins|-sized PSI table
    "q140_psi_drift",
    # deliberate SINGLE-ROW broadcast cross join: the distinct-user-count
    # scalar attached to the |type-pairs|-sized affinity table
    "q144_type_affinity",
    # deliberate SINGLE-ROW broadcast cross joins: the (mean, std) moment
    # scalar attached to the row-local norm projection, and the 1-row
    # outlier count attached to the 1-row stats report
    "q165_embedding_norm_audit",
    # deliberate SINGLE-ROW broadcast cross join: the (total, n_parts)
    # scalar attached to the |parts|-sized rollup (TPC-H Q11's scalar
    # subquery in HAVING)
    "q169_important_parts",
    # deliberate SINGLE-ROW broadcast cross join: the global average-
    # balance gate attached to the customer scan (TPC-H Q22's scalar
    # subquery)
    "q170_rich_inactive_customers",
    # deliberate SINGLE-ROW broadcast cross join: the vocab-size scalar
    # attached to the bigram stream for add-one smoothing
    "q182_bigram_logprob",
    # deliberate SINGLE-ROW broadcast cross joins: the token-total and
    # weight-total scalars attached to the |sources|-sized mixture table
    "q184_mixture_temperature",
    # deliberate SINGLE-ROW broadcast cross join: the value-count total
    # attached to the 9-row digit table
    "q190_benford_audit",
    # deliberate SINGLE-ROW broadcast cross join: the max-observed-week
    # gate attached to the |user-weeks| table
    "q199_weekly_churn",
    # deliberate SINGLE-ROW broadcast cross join: the (n0, n1) half-size
    # scalar attached to the |distinct-values| CDF table
    "q202_ks_drift_test",
    # deliberate |sources|² pair-spine theta self-join (tiny broadcast):
    # disjoint-vocabulary pairs must appear with JSD = 1
    "q178_source_js_divergence",
    # deliberate SINGLE-ROW broadcast cross join: the global max-order-
    # date anchor attached to the |customers| RFM rollup
    "q206_rfm_segmentation",
    # deliberate SINGLE-ROW broadcast cross join: the explicit outer-
    # completeness cutoff scalar attached to the DRAINED (batch) result
    # of the stream-stream left-outer join
    "q272_stream_stream_left_join",
    # deliberate SINGLE-ROW broadcast cross join: the (totals, vocab)
    # LM-smoothing scalar attached to the |vocab|-sized table before it
    # joins the token stream
    "q274_dsir_selection",
    # deliberate 1-row broadcast cross joins throughout the iteration:
    # the n scalar on the d²-row matrix and the per-round rescale
    # scalars on the d-row vector (operators/linalg.py)
    "q277_power_iteration_pca",
    # deliberate SINGLE-ROW broadcast cross joins: the corpus-total
    # scalar on the |sources| rollup and the allocated-seats scalar on
    # the |sources| quota table
    "q279_largest_remainder_alloc",
    # inherits _bm25_scored's documented 1-row corpus-stats broadcast
    # cross join (same as q218/q223/q227)
    "q282_bm25_hard_negatives",
    # deliberate SINGLE-ROW broadcast cross join: the corpus-count scalar
    # attached to the prefix-scan rank column for the NTILE(4) formula
    "q293_curriculum_stages",
    # deliberate SINGLE-ROW broadcast cross join (corpus count) + 3-row
    # broadcast percentile spine on a non-equi rank pick
    "q304_exact_global_percentiles",
    # deliberate SINGLE-ROW broadcast cross join: the global-max-watermark
    # scalar attached to the |event-types| freshness rollup
    "q311_freshness_audit",
    # deliberate SINGLE-ROW broadcast cross join: the global CUPED moment
    # scalar (n, Sx, Sy, Sxx, Sxy) attached to the 2-row variant rollup
    "q315_cuped_adjustment",
    # deliberate 4-row broadcast threshold-spine theta join: nested
    # scaling-law subsets require h < threshold per spine row
    "q319_scaling_law_subsets",
    # deliberate 1-row broadcast cross join: the (n_total, k) scalar on
    # the |labels|-sized class table
    "q323_class_weights",
    # deliberate 64x8 literal sign-matrix build (two bounded literal
    # spines crossed once; the corpus-sized projection is an equi-join)
    "q324_random_projection",
    # deliberate SINGLE-ROW broadcast cross join: the basket-count scalar
    # on the |type-pairs|-sized rule table
    "q329_association_rules",
    # deliberate 3-row broadcast horizon spine over the |users| rollup
    "q336_conversion_horizons",
    # deliberate 24-row broadcast window-offset spine over the per-user
    # 8-byte day-bitmask rollup
    "q342_sliding_mau_bitmask",
    # deliberate SINGLE-ROW broadcast cross join: the (grand, vocab)
    # scalar attached to the |vocab x sources| token table
    "q207_heldout_cross_entropy",
    # deliberate SINGLE-ROW broadcast cross joins: the global-mean and
    # peak scalars attached to the |days|-sized CUSUM table
    "q208_cusum_changepoints",
    # deliberate SINGLE-ROW broadcast cross joins: the observation
    # horizon and the total-sessions scalar attached to the
    # |durations|-sized risk table
    "q210_kaplan_meier",
    # deliberate 1-row x 1-row cross joins: the vocab-size and top-lang
    # scalars attached to the 1-row data-card aggregate
    "q213_data_card",
    # deliberate 1-row x 1-row cross join: the edge-count scalar attached
    # to the 1-row triangle-count aggregate
    "q214_triangle_count",
    # deliberate SINGLE-ROW broadcast cross join: the corpus (N, Σdl,
    # per-term df) scalar attached to the per-doc BM25 projection
    "q218_bm25_topk",
    # same BM25 scalar cross join, plus the 1-row DCG x 1-row IDCG pairing
    "q223_ndcg_eval",
    # inherits the BM25 single-row stats cross join via _bm25_scored
    "q227_reciprocal_rank_fusion",
    "q232_prf_expansion",
    # BM25 stats cross join + the bounded 20-row depth-spine cross join
    "q253_rank_biased_overlap",
    # deliberate 7-row broadcast literal cross join: the lag spine
    # attached to the |days|-sized daily rollup
    "q221_lagged_cross_correlation",
    "q257_acf_periodicity",
    # deliberate 3-row broadcast cross join: the multi-vector query side
    # of MaxSim attached to the corpus scan (bounded by query size)
    "q222_maxsim_late_interaction",
    # deliberate SINGLE-ROW broadcast cross join: the grand-mean scalar
    # attached to the |days|-sized decomposition table
    "q228_seasonal_decomposition",
    # deliberate SINGLE-ROW broadcast cross join: the corpus row count
    # attached to the 2080-row covariance triangle
    "q231_embedding_covariance",
    # deliberate SINGLE-ROW broadcast cross joins: the document-count
    # scalar attached to the PMI pair table / burstiness token table
    "q238_token_pmi",
    "q239_token_burstiness",
    # deliberate 1-row x 1-row cross join: node-count x edge-count report
    "q236_kcore_decomposition",
    # deliberate SINGLE-ROW broadcast cross join: the (pos, neg) totals
    # scalar attached to the 10-row WoE table
    "q242_woe_iv_encoding",
    # deliberate SINGLE-ROW broadcast cross joins: corpus token total /
    # mean-CE / weight-total scalars on the |sources|-sized tables
    "q246_doremi_reweight",
    # deliberate |days|^2 theta self-joins ON THE DAY ROLLUP (dimension-
    # sized pair spines for robust trend statistics) + 1-row scalars
    "q248_theil_sen_slope",
    "q249_mann_kendall",
    # deliberate 1-row broadcast scalars: total-count / x_k order stat
    "q254_conversion_latency",
    "q255_hill_tail_index",
    # deliberate 1-row x 1-row cross join: exact vs sampled join size
    "q256_join_cardinality_estimate",
    # deliberate 1-row x 1-row cross join: (n, agree) totals paired with
    # the chance-agreement scalar for Cohen's kappa
    "q263_rater_agreement",
}

# Queries that execute driver-side work at plan-build time (k-means
# training, iterative components) — excluded from the sweeping plan scan
# to keep the test fast; their plans are pinned by their own recall /
# oracle tests.
BUILD_TIME_EXECUTION = {
    "q55_ivf_topk",
    "q62_dedup_components",
    "q64_cosine_dup_cluster",
    "q65_dedup_survivors",
    "q69_dedup_survivors_quality",
    "q70_streaming_sessionize",
    # connected components iterate at plan build; the final report also
    # carries a deliberate 1-row violations-count broadcast cross join
    "q138_leakage_safe_split",
    # pagerank counts |V| once at plan build to seed the uniform vector
    "q179_event_type_pagerank",
    # each BPE round's argmax pair is a 1-row collect at plan build
    "q224_bpe_merges",
    # BPE encode learns its merges at plan build (same argmax collects)
    "q260_bpe_encode",
    # connected components iterate at plan build (fuzzy entity closure)
    "q250_fuzzy_entity_clusters",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_accidental_cross_products(spark):
    qs = catalog.queries()
    offenders = {}
    for name, fn in qs.items():
        if (
            name in ALLOWED_NON_EQUI
            or name in BASELINE_ONLY
            or name in BUILD_TIME_EXECUTION
        ):
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders[name] = True
    assert not offenders, f"non-equi join fallback in: {sorted(offenders)}"


def test_q01_scan_prunes_columns_and_pushes_filter(spark):
    plan = _plan(catalog.queries()["q01_pricing_summary"](spark, SF_DIR))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # projection reaches the scan: untouched wide columns must not be read
    assert "l_comment" not in scan and "l_shipmode" not in scan
    # the date predicate reaches the parquet reader
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_sessionize_is_single_shuffle(spark):
    # every window step shares the entity hash partitioning: exactly one
    # exchange (the reference's chain shuffled per window)
    plan = _plan(catalog.queries()["q11_sessionize"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sample_trajectory_is_single_shuffle(spark):
    # the full Fact-1-style chain (lag + keep-flags + re-distance) keeps
    # one entity shuffle
    plan = _plan(catalog.queries()["q24_sample_trajectory"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dim_lookup_broadcasts(spark):
    plan = _plan(catalog.queries()["q39_nav_status_lookup"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_forward_fill_is_single_shuffle(spark):
    # LOCF is one window pass on the entity exchange — no self-join
    plan = _plan(catalog.queries()["q77_forward_fill"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_contamination_broadcasts_benchmark_grams(spark):
    # the benchmark gram set probes map-side; the corpus never shuffles
    # for the join
    plan = _plan(catalog.queries()["q83_benchmark_contamination"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_vocab_topk_avoids_global_sort(spark):
    # top-100 with tiebreak is TakeOrdered, not a full Sort + Exchange
    # rangepartitioning of the vocab
    plan = _plan(catalog.queries()["q91_vocab_top_tokens"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_tfidf_broadcasts_df_table(spark):
    # document-frequency (|vocab| rows) broadcasts; only the tf table
    # shuffles
    plan = _plan(catalog.queries()["q92_tfidf_top_terms"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_scd2_shares_entity_shuffle(spark):
    """q108: change-detection window and interval-close window both key on
    user_id; the filter between them preserves partitioning, so ONE
    exchange total."""
    plan = _plan(catalog.queries()["q108_scd2_dim"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1


def test_mixture_sample_is_single_shuffle(spark):
    """q105: md5-rank + budget filter is one class-key window pass."""
    plan = _plan(catalog.queries()["q105_mixture_sample"](spark, SF_DIR))
    # one exchange for the lang window; the final small groupBy may add an
    # AQE-coalesced agg exchange over |classes| rows — allow at most 2
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rowlocal_curation_ops_never_shuffle(spark):
    """q103/q104/q106: scrubbing, quantization, and quality scoring are
    row-local projections — zero exchanges at any scale."""
    for q in ("q103_scrub_pii", "q104_quantize_embeddings", "q106_gopher_quality"):
        plan = _plan(catalog.queries()[q](spark, SF_DIR))
        assert "Exchange" not in plan, f"{q} shuffles"


def test_mode_per_group_has_no_window(spark):
    # mode via combinable min_by struct: two hash aggregations, zero
    # window passes (the oracle's row_number form would add one)
    plan = _plan(catalog.queries()["q188_mode_per_group"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_weighted_sample_is_take_ordered(spark):
    # Efraimidis-Spirakis top-k: per-partition heaps + driver merge, no
    # global sort exchange, no window
    plan = _plan(catalog.queries()["q191_weighted_sample"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Window" not in plan, plan


def test_scd2_point_in_time_is_two_exchanges_no_join(spark):
    # union + last_value carry: the temporal lookup compiles to window
    # passes on the entity key — no join operator at all (the naive
    # interval join would be a BroadcastNestedLoopJoin)
    plan = _plan(catalog.queries()["q185_scd2_point_in_time"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_bloom_probe_broadcasts_bit_set(spark):
    """q284: the Bloom bit set (bounded by m_bits, never by build rows)
    must BROADCAST into the probe — a shuffled semi-join here would
    defeat the operator's whole point."""
    plan = _plan(catalog.queries()["q284_bloom_filter_join"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    bcast_joins = [
        l for l in plan.splitlines() if "BroadcastHashJoin" in l and "bitpos" in l
    ]
    assert bcast_joins, "bitpos probe join is not broadcast"


def test_kmeans_broadcasts_centroids_and_caches_dims(spark):
    """q318: every Lloyd round joins the k*d-row centroid relation by
    BROADCAST (the side that never grows with the corpus), and the
    exploded dims relation is cached (one scan for ~6 consumers)."""
    plan = _plan(catalog.queries()["q318_kmeans_lloyd"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_zorder_key_is_codegen_projection(spark):
    """q283: the Morton key must be plain bit math inside the projection
    (shiftleft/shiftright in the plan), with the single exchange being
    the final aggregation's."""
    plan = _plan(catalog.queries()["q283_zorder_layout_audit"](spark, SF_DIR))
    assert "shiftright" in plan and "shiftleft" in plan
    assert plan.count("Exchange hashpartitioning") == 1
