"""One-shot mechanical splitter: plans/catalog.py (31.8k lines) ->
plans/catalog/ package (registry + shared helpers + domain modules).

Round-8 verdict ask #7: single-file growth (+8.6k lines in round 7
alone) is the main maintainability risk. The split is MECHANICAL — every
top-level block moves verbatim; only module boundaries and imports are
new — so the full query registry (447 entries at split time), oracle
strings, and def citations are preserved byte-for-byte. Verified
afterwards by the full selfcheck.

Run from the repo root: python tools/split_catalog.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SRC = ROOT / "noaa_ais_glue_lakehouse_spark/plans/catalog.py"
PKG = ROOT / "noaa_ais_glue_lakehouse_spark/plans/catalog"

REGISTRY_NAMES = {
    "_QUERIES", "_ORACLES", "_BASELINE_ONLY", "_ALLOW_NON_EQUI",
    "_BUILD_TIME_EXEC", "register", "queries", "get_query", "oracle_sql",
    "baseline_only_queries", "allow_non_equi_queries",
    "build_time_exec_queries",
}

# (module, name-regex) — FIRST match wins; checked against the query name,
# then against the block source for the broader content rules.
DOMAIN_RULES = [
    ("streaming", r"stream|watermark|foreachbatch|availablenow"),
    ("tpch", r"pricing_summary|revenue_per_nation|customers_no_orders|"
             r"priority_semi|supplier_lookup"),
    ("graph", r"triangle|kcore|assortativity|adamic|community|lpa_|"
              r"spectral|clustering_coeff|pagerank|degree_dist"),
    ("dedup", r"minhash|simhash|winnow|jaccard|dedup|near_dup|component|"
              r"survivor|containment|decontamination|fingerprint|novelty|"
              r"repeated_substring|repeated_span|boilerplate|contamination|"
              r"bfs|linkage|entity_resolution|golden_record|"
              r"capture_recapture|leakage|dup_"),
    ("retrieval", r"cosine|_ann_|ann_|ivf|_lsh|lsh_|product_quantization|"
                  r"pq_|bm25|ndcg|mrr|retrieval|colbert|embedding|centroid|"
                  r"knn|matryoshka|kmeans|random_projection|chunk|"
                  r"contrastive|hard_negative|rank_fusion|mmr_|rbo|"
                  r"inverted_index|phrase_search|conjunctive|prf_|"
                  r"quantile_normalization|label_noise|vector"),
    ("text", r"token|langid|language|bpe|quality|perplexity|vocab|tfidf|"
             r"pmi|collocation|kneser|bigram|span_corruption|"
             r"fill_in_the_middle|skipgram|skip_gram|word2vec|readability|"
             r"fertility|zipf|heaps|ngram|gopher|lexical|unigram|"
             r"stopword|pii|text_norm|entropy_filter|curriculum|"
             r"negative_sampling|packing|mixture|doremi|dsir|preference|"
             r"grpo|sequence_pack|oov|truncation|kv_cache|scaling_law|"
             r"epoch_plan|data_card|datacard"),
    ("geo", r"haversine|grid|geohash|trajectory|rendezvous|cpa_|dwell|"
            r"port_call|geofence|turn_rate|mercator|tile|morton|hilbert|"
            r"straightness|gyration|zone|coordinate|swapped|spatial|"
            r"stop_detection|speed_consistency|simplif"),
    ("timeseries", r"seasonal|acf_|trend|forecast|cusum|changepoint|ewma|"
                   r"resample|gap_fill|locf|forward_fill|burstiness|sax_|"
                   r"dtw|peak|backtest|interpolation|week_over_week|"
                   r"periodicity|mase|smape|pinball|sliding|rolling|"
                   r"day_of_week|freshness|delta_encoding|debounc|"
                   r"throttle|lag|timestamp"),
    ("stats", r"_test|ttest|ztest|chi_square|chisq|kappa|anova|correlation|"
              r"spearman|kendall|gini|hhi_|ks_|roc_auc|auc|calibration|"
              r"conformal|jackknife|bootstrap|wilson|mcnemar|mantel|odds|"
              r"survival|hazard|kaplan|logrank|log_rank|isotonic|platt|"
              r"brier|youden|effect_size|psi_|srm_|cuped|diff_in_diff|"
              r"_ate|ipw|uplift|qini|shrinkage|dispersion|good_turing|"
              r"goodturing|benjamini|fdr|mann_whitney|msprt|sprt|dp_|"
              r"laplace|randomized_response|exponential_mech|anonymity|"
              r"l_diversity|t_closeness|outlier|winsor|mad_|zscore|"
              r"benford|moments|histogram|percentile|quantile|median|"
              r"stats|mutual_information|woe_|target_encoding|theil|"
              r"mann_kendall|hill_tail|propensity|empirical_bayes|"
              r"poisson|ransac|huber|shapiro|qq_table|wilcoxon|cohens"),
    ("events", r"session|funnel|retention|cohort|attribution|churn|dau|"
               r"wau|mau|stickiness|adoption|rfm_|ltv|markov|shapley|"
               r"path_|transition|flow_matrix|entry_exit|conversion|"
               r"journey|active_users|basket|association|affinity|"
               r"gaps_and_islands|streak|concurrency|throttl"),
    ("lakehouse", r"version|cdc|merge_into|scd2|scd_|compaction|zorder|"
                  r"z_order|parquet|footer|small_file|shard|manifest|"
                  r"bucket|skew|salt|checksum|zone_map|encoding_advisor|"
                  r"rle_|variant|json|csv|quarantine|expectation|schema|"
                  r"profil|snapshot|reconcil|merge_sink|delete|compact|"
                  r"datasource|pysource|time_travel|cardinality|hot_key"),
    ("multimodal", r"image|audio|frame|mp4|binary|decode|fft|spectral_feat|"
                   r"webp|tiff|png"),
]

DOMAIN_ORDER = [
    "core", "tpch", "dedup", "retrieval", "text", "geo", "timeseries",
    "stats", "events", "graph", "streaming", "lakehouse", "multimodal",
]


def classify(name: str, body: str) -> str:
    for mod, rx in DOMAIN_RULES:
        if re.search(rx, name):
            return mod
    if "TPC-H" in body:
        return "tpch"
    if "readStream" in body or "writeStream" in body:
        return "streaming"
    for mod, rx in DOMAIN_RULES:
        if re.search(rx, body[:2000].lower()):
            return mod
    return "core"


def main() -> int:
    if not SRC.exists():
        print(
            "plans/catalog.py not found — the split already ran (round 8); "
            "this tool is kept as the record of the mechanics.",
            file=sys.stderr,
        )
        return 1
    lines = SRC.read_text().splitlines(keepends=True)

    # ---- parse into top-level blocks --------------------------------
    starts = []  # indices of block-start lines
    pending_decorator = False
    for i, l in enumerate(lines):
        if re.match(
            r"^(@register|def |from |import |"
            r"[A-Za-z_]\w*(\s*,\s*[A-Za-z_]\w*)*\s*[:=])",
            l,
        ):
            # the FIRST def under an @register decorator is the SAME block
            if l.startswith("def ") and pending_decorator:
                pending_decorator = False
                continue
            pending_decorator = l.startswith("@register")
            starts.append(i)
    # module docstring: everything before the first start is the header doc
    blocks = []  # (start, end, kind, name, text)
    for bi, s in enumerate(starts):
        e = starts[bi + 1] if bi + 1 < len(starts) else len(lines)
        # pull leading comment/banner lines into this block
        while s > 0 and re.match(r"^#", lines[s - 1]):
            s -= 1
        text = "".join(lines[s:e])
        first = lines[starts[bi]]
        if first.startswith("@register"):
            m = re.search(r"^def (\w+)", text, re.M)
            kind, name = "query", m.group(1)
        elif first.startswith("def "):
            name = re.match(r"def (\w+)", first).group(1)
            kind = "query" if re.match(r"q\d+_", name) else "helper"
        elif first.startswith(("from ", "import ")):
            kind, name = "import", None
        else:
            name = re.match(r"([A-Za-z_]\w*)", first).group(1)
            kind = "assign", None
            kind, name = "assign", name
        blocks.append((s, e, kind, name, text))
    # de-overlap: pulling banners back must not duplicate lines
    fixed = []
    prev_end = 0
    for s, e, kind, name, text in blocks:
        s = max(s, prev_end)
        fixed.append((kind, name, "".join(lines[s:e])))
        prev_end = e
    blocks = fixed
    header_doc = "".join(lines[: starts[0]])

    # ---- route blocks -----------------------------------------------
    registry_blocks, shared_blocks = [], []
    domain_blocks = {d: [] for d in DOMAIN_ORDER}
    for kind, name, text in blocks:
        if name in REGISTRY_NAMES:
            registry_blocks.append(text)
        elif kind == "query":
            domain_blocks[classify(name, text)].append(text)
        else:  # imports, helpers, constants
            shared_blocks.append(text)

    # ---- emit -------------------------------------------------------
    PKG.mkdir(exist_ok=True)
    shared_src = (
        header_doc
        + "\n# --- shared helpers / oracle fragments (moved verbatim from"
        " the\n# single-file catalog; the round-8 package split) ---\n\n"
        + "\n".join(shared_blocks)
    )
    # __all__ computed at import time so `from ._shared import *` carries
    # the underscore-prefixed helpers/constants into the domain modules
    shared_src += (
        "\n\n# export EVERYTHING (incl. underscore helpers) to the domain"
        " modules\n__all__ = [_n for _n in dir()"
        " if not _n.startswith('__') and _n != 'annotations']\n"
    )
    (PKG / "_shared.py").write_text(shared_src)

    reg_src = (
        '"""Query registry: the name -> callable/oracle maps and the\n'
        "``register`` decorator every domain module uses. Split out so\n"
        "domain modules stay import-acyclic (round-8 package split).\n"
        '"""\n\n'
        "from __future__ import annotations\n\n"
        "from collections.abc import Callable\n\n"
        "from pyspark.sql import DataFrame, SparkSession\n\n"
        + "\n".join(registry_blocks)
    )
    (PKG / "_registry.py").write_text(reg_src)

    doc_by_mod = {
        "core": "Athena-corpus / pipeline-shape queries (q01-q50 era) "
                "plus everything no other domain claims.",
        "tpch": "TPC-H-shaped analytics queries.",
        "dedup": "Deduplication: exact, MinHash/SimHash/winnowing LSH, "
                 "components, survivors, contamination screens.",
        "retrieval": "Embedding similarity / ANN / PQ / ranked retrieval "
                     "and their recall audits.",
        "text": "Text analysis: tokenization, language-ID, quality, LM "
                "scoring, corpus statistics, training-data transforms.",
        "geo": "Spatial / trajectory / AIS-domain operators.",
        "timeseries": "Time-series profiling, gap handling, forecasting "
                      "and its evaluation.",
        "stats": "Statistical tests, effect sizes, calibration, privacy "
                 "audits, robust estimators.",
        "events": "Sessionization, funnels, cohorts, attribution, "
                  "product analytics.",
        "graph": "Graph analytics over the dup/event graphs.",
        "streaming": "Structured Streaming parity queries "
                     "(availableNow batch-equivalence).",
        "lakehouse": "Table-format / layout / maintenance operators: "
                     "versioned tables, CDC, MERGE, compaction, audits.",
        "multimodal": "Binary image/audio/video decode and feature "
                      "plumbing.",
    }
    for d in DOMAIN_ORDER:
        body = domain_blocks[d]
        src = (
            f'"""{doc_by_mod[d]}\n\nMoved verbatim from the single-file '
            "catalog in the round-8 package\nsplit; see _shared for the "
            'helpers and _registry for the decorator.\n"""\n\n'
            "from noaa_ais_glue_lakehouse_spark.plans.catalog._registry"
            " import (  # noqa: F401\n    get_query,\n    register,\n)\n"
            "from noaa_ais_glue_lakehouse_spark.plans.catalog._shared"
            " import *  # noqa: F401,F403\n\n\n"
            + "\n".join(body)
        )
        (PKG / f"{d}.py").write_text(src)
        print(f"{d}: {len(body)} queries, {src.count(chr(10))} lines")

    init_src = (
        '"""Query catalog package (round-8 split of the single-file\n'
        "catalog.py). Importing this package registers all "
        f"{sum(len(v) for v in domain_blocks.values())} queries;\n"
        "the public surface (queries/oracle_sql/register/...) is\n"
        "unchanged from the single-file era.\n"
        '"""\n\n'
        "from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import ("
        "  # noqa: F401\n"
        "    allow_non_equi_queries,\n    baseline_only_queries,\n"
        "    build_time_exec_queries,\n    get_query,\n    oracle_sql,\n"
        "    queries,\n    register,\n)\n"
        "from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *"
        "  # noqa: F401,F403\n"
        + "".join(
            f"from noaa_ais_glue_lakehouse_spark.plans.catalog.{d} import *"
            "  # noqa: F401,F403\n"
            for d in DOMAIN_ORDER
        )
    )
    (PKG / "__init__.py").write_text(init_src)
    print("shared:", (PKG / "_shared.py").read_text().count("\n"), "lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
