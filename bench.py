"""Headline benchmark.

Runs the flagship query set at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-time of the headline suite; each per-query
number in ``queries`` is the MEDIAN of 3 recorded passes (after one
unrecorded codegen-warmup pass), with the raw run lists in
``query_runs`` and any >1.25x-and->0.3s slowdowns vs the previous
round's BENCH file in ``regressions``. The JSON also carries
``fact1_like_rows_per_sec`` — throughput of the trajectory-style
chain (read → clean → sessionize → sample), directly comparable to
BASELINE.md's Fact-1 ≈120k rows/s on Glue — and ``clean_rows_per_sec``
for the raw→staging-style cleaning chain (baseline ≈60k rows/s).

Execution is forced with the noop writer (full pipeline runs, no driver
collect cost), falling back to count() where noop is unavailable.
"""

from __future__ import annotations

import json
import os
import re
import time


HEADLINE = [
    "q01_pricing_summary",      # scan + agg + derived metrics (TPC-H Q1 shape)
    "q05_type_distribution",    # groupBy distribution
    "q08_topk_entities",        # top-k
    "q11_sessionize",           # windowed prefix-sum sessionization
    "q12_session_rollup",       # sessionize + rollup (flagship)
    "q15_revenue_per_nation",   # multi-join + broadcast dim
    "q19_haversine_jumps",      # lag + haversine window chain
    "q24_sample_trajectory",    # full Fact-1-style sampling chain
    "q25_dedup_exact",          # exact dedup
    "q27_minhash_near_dups",    # MinHash-LSH near-dup (scale path)
    "q29_token_stats",          # text kernels
    "q32_cosine_topk",          # brute-force similarity baseline
    "q33_ann_lsh_topk",         # multi-table ANN (scale path)
    "q35_running_total",        # running-total window
    "q38_geohash_encode",       # native geohash kernel
    "q44_image_decode_stub",    # Arrow mapInPandas multimodal plumbing
    "q47_cosine_dup_lsh",       # embedding-cosine near-dup (scale path)
    "q49_winnow_fingerprints",  # winnowing fingerprint index
    "q64_cosine_dup_cluster",   # clustered embedding dedup (SemDeDup shape)
    "q66_stratified_sample",    # deterministic class rebalancing
    "q67_pack_sequences",       # token-budget sequence packing
    "q78_resample_hourly",      # grid resample + forward fill
    "q88_hopping_window_counts",  # sliding-window aggregation
    "q105_mixture_sample",      # token-budget mixture sampling
    "q108_scd2_dim",            # SCD2 dimension build (one shuffle)
    "q112_merge_upsert",        # MERGE INTO semantics (anti-join + union)
    "q116_training_corpus_assembly",  # full corpus-assembly funnel
    "q172_max_concurrent_sessions",   # parallel global prefix scan
    "q175_table_checksum",      # order-independent table fingerprint
    "q178_source_js_divergence",  # distribution drift (token equi-join)
    "q185_scd2_point_in_time",  # temporal lookup via union+window carry
    "q186_ordered_funnel",      # K-step funnel as one array fold
    "q381_knn_adaptive_radius", # density-adaptive spatial kNN (round 6)
    "q382_kendall_tau_b",       # contingency-collapse ordinal stats (round 6)
    "q343_winnow_near_dups_capped",  # df-capped winnowing near-dup (production dedup path)
    "q372_ngram_novelty_hashed",  # hashed-gram novelty transport (production path)
    "q383_minhash_portable",    # portable minhash-LSH (hash-checked dedup anchor)
]


def _force(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _cpu_probe() -> float:
    """Fixed single-thread CPU workload (~0.6 s on this VM unloaded).

    The bench runs inside a shared VM whose effective CPU varies with
    co-tenant load — the SAME probe measured 0.61 s and 2.6 s twenty
    minutes apart, and a 32-way version showed 14.6x effective
    parallelism against an unloaded ~30x. Recording the probe before and
    after the suite lets a reader normalize cross-round comparisons:
    wall-time drift that tracks the probe is host steal, not an engine
    regression.
    """
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.time() - t0, 3)


def _probe_task(_i: int) -> int:
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def _noop(_i: int) -> int:
    return 0


def _cpu_probe32(n_workers: int = 32) -> tuple[float, float]:
    """32-way CPU probe → ``(wall_sec, effective_parallelism)``.

    Round-5 lesson: the single-thread probe read nominal (0.567 s) while
    32-way host steal inflated q27's median 5.31x — a single busy thread
    can get a full core on a contended box while 32 threads cannot. This
    probe runs the SAME workload in ``n_workers`` subprocesses (real
    cores, no GIL) and reports wall time plus effective parallelism
    (single_equiv_work / wall). Unloaded this VM measures ~19-21x (NOT
    32x: single-thread turbo beats all-core frequency — a constant
    property of the box, encoded as NOMINAL_EFF below); values well
    under that mean every 32-way Spark stage in this file was starved
    and drift entries should be read as host steal, not engine
    regressions.
    """
    import concurrent.futures as cf

    single = _cpu_probe()
    with cf.ProcessPoolExecutor(max_workers=n_workers) as ex:
        # warm the pool (interpreter spawn ~50ms/worker would otherwise
        # bias the wall); _noop forces every worker to actually start
        list(ex.map(_noop, range(n_workers)))
        t0 = time.time()
        list(ex.map(_probe_task, range(n_workers)))
        wall = time.time() - t0
    eff = (single * n_workers) / wall if wall > 0 else float(n_workers)
    return round(wall, 3), round(eff, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # 24g: the bench is ONE sequential JVM on a 128 GiB host; at 8g the
        # heavy LSH verify joins run against a GC wall (q27 measured 5.2 s
        # steady at 24g vs 6.6-6.9 s at 8g, with far noisier early passes).
        # Multi-process consumers (selfcheck --workers) keep the session
        # factory's smaller default so N workers can't overcommit the host.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Whole-stage-codegen class cache sized to the CATALOG, not Spark's
        # default 100 (round 10, guide §1/§7): one suite pass compiles
        # ~1000+ codegen fragments across the 37 headline plans, so at 100
        # entries the cache thrashes completely and EVERY pass re-generates
        # and re-JITs every class — a fresh class restarts tiered
        # compilation from the interpreter, and the q27 probe measured the
        # un-JIT'd verify stage at 717-893 CPU-seconds vs 77-84 warm (10x).
        # Scale-independent: any long-lived driver executing a large query
        # catalog wants its generated classes stable across queries.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
        # No class unloading for the bench JVM (round 10): G1's concurrent
        # class unloading deoptimizes hot JIT-compiled framework methods
        # that inlined through a dead trial's generated classes — one
        # unload cycle mid-suite re-ran whole trials at interpreter tier
        # (q47 19.5 s vs 2.2 s in the SAME bench run's other passes). The
        # bench JVM is bounded-lifetime (~10 min) and the codegen cache
        # above keeps live classes stable, so retaining dead generated
        # classes costs tens of MB of metaspace. ReservedCodeCacheSize is
        # raised from the 240 MB default so the retained dead nmethods
        # cannot fill the code cache and stall late-suite compilation.
        # Overridable via SPARK_GRAFT_DRIVER_JAVA_OPTS.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:-ClassUnloading -XX:ReservedCodeCacheSize=1g",
            ),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from noaa_ais_glue_lakehouse_spark.plans import catalog

    qs = catalog.queries()
    # warmup: absorb JVM/codegen/Python-worker startup so per-query times
    # reflect steady state (first-query JIT cost was ~4s of q01's 5s), and
    # touch EVERY table the suite reads — footer/metadata reads happen once
    # per table, and round 2 published q01 at 11.9s (steady state ~1.1s)
    # because lineitem's first scan absorbed them
    for t in (
        "lineitem",
        "orders",
        "customer",
        "supplier",
        "nation",
        "region",
        "events",
        "documents",
        "embeddings",
    ):
        catalog.load(spark, sf_dir, t).count()
    _force(qs["q08_topk_entities"](spark, sf_dir))
    _force(qs["q44_image_decode_stub"](spark, sf_dir))

    import gc

    # JMH-style steady-state measurement: one UNRECORDED warmup pass over
    # the whole suite, then THREE recorded passes; per query the MEDIAN of
    # the three is reported. The warmup pass absorbs whole-stage-codegen
    # compilation + JIT of the heavy generated classes (the 32-min-agg
    # minhash signature stage alone costs ~15 s of one-time JIT at sf0.1:
    # 22.7 s first run vs 6.8 s steady), which otherwise lands on whichever
    # query runs a plan shape first and masks real regressions.
    # BASELINE.md's Glue figures are steady-state job throughputs, so
    # steady state is the comparable number. Median-of-3 (not min, not a
    # single pass) because a single sample can be 2-6× inflated by
    # transient co-tenant load or a GC burst (q27 measured 30.9 s in one
    # suite pass vs 4.1-5.7 s across five isolated runs), while min-of-N
    # hides real regressions behind one lucky run; the per-query run lists
    # ride in the output so a future reader can judge the noise.
    # Two unrecorded warmup passes, not one: C2 compiles the giant
    # whole-stage-codegen classes (32-min-agg minhash signature, 64-term
    # simhash, LSH verify joins) lazily over several executions, and on a
    # slow/contended host one pass is not enough — measured on a cold JVM:
    # q27 back-to-back 37->18->13->6.6 s, i.e. the THIRD repetition still
    # carried ~2x JIT residue, which then landed in the recorded median
    # (round-5 pre-fix bench: q27 median 21-32 s vs 5-7 s steady). JMH's
    # own default is 5 warmup iterations for exactly this reason. All raw
    # recorded runs still ride in `query_runs` for noise auditing.
    probe_before = _cpu_probe()
    probe32_before, eff_par_before = _cpu_probe32(min(cpus, 32))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    n_warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "2"))
    for _pass in range(n_warmup + 3):
        for name in HEADLINE:
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 3)
            if _pass >= n_warmup:  # leading passes are codegen/JIT warmup
                runs[name].append(dt)
            # UNTIMED housekeeping between trials (JMH-style): drop Python
            # DF refs so the ContextCleaner frees dead broadcast/checkpoint
            # blocks and evict cached per-query indexes (the LSH queries
            # cache() signature/fingerprint indexes that are dead once the
            # query returns; accumulated storage otherwise squeezes the
            # unified-memory execution pool and the big verify joins start
            # spilling — q27 measured 18 s late in the suite vs 6.8 s
            # isolated). The reported wall is the sum of per-query times,
            # i.e. housekeeping is excluded by construction.
            #
            # Round 10: the forced JVM System.gc() that used to follow was
            # MEASURED-AND-REMOVED (guide §1/§7.4 "correct at small scale,
            # wrong under measurement"): every forced full GC unloads the
            # previous trial's generated classes, and class unloading
            # deoptimizes still-hot JIT-compiled code — the q27 verify
            # stage re-ran at interpreter tier for whole trials afterwards
            # (event-log CPU for the IDENTICAL stage: 89 s warm vs 430-1150
            # s after a forced-GC deopt; isolated probe medians 16 s with
            # the forced GC vs 4.4 s without, clearCache kept in both).
            # The round-4 reason for the GC (storage debt bleeding into the
            # next query) is handled by clearCache + the ContextCleaner;
            # BENCH_r10 re-measured the whole suite both ways.
            gc.collect()
            spark.catalog.clearCache()
    times = {name: sorted(rs)[len(rs) // 2] for name, rs in runs.items()}
    total = round(sum(times.values()), 3)

    # per-query deltas vs the previous round's bench file (newest
    # BENCH_r*.json next to this script, or $SPARK_GRAFT_PREV_BENCH):
    # a regression is median > 1.25x the previous median AND >0.3s worse
    # (sub-second queries jitter by more than 25% run to run)
    regressions: dict[str, dict] = {}
    prev_path = os.environ.get("SPARK_GRAFT_PREV_BENCH")
    if prev_path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = sorted(
            f for f in os.listdir(here) if re.fullmatch(r"BENCH_r\d+\.json", f)
        )
        prev_path = os.path.join(here, cands[-1]) if cands else None
    if prev_path and os.path.exists(prev_path):
        try:
            with open(prev_path) as fh:
                prev_doc = json.load(fh)
            parsed_prev = prev_doc.get("parsed", prev_doc)
            # only comparable at the same scale factor
            prev_q = parsed_prev.get("queries", {}) if parsed_prev.get("sf") == sf else {}
            for name, med in times.items():
                p = prev_q.get(name)
                p = p.get("median") if isinstance(p, dict) else p
                if p and med > 1.25 * p and med - p > 0.3:
                    regressions[name] = {
                        "prev": p,
                        "median": med,
                        "ratio": round(med / p, 2),
                    }
        except Exception:
            pass  # a malformed previous file must not kill the bench

    # drift vs the BEST-EVER median per query across ALL prior BENCH_r*.json
    # at the same sf — the regression key above only compares to the PREVIOUS
    # round, so a +20%/round creep compounds invisibly (round 4: q24 +28%,
    # q66 +29%, q19 +18% all slid under the 0.3s absolute floor). Drift has
    # NO absolute floor: med > 1.25x best-ever flags it regardless of how
    # sub-second the query is.
    drift: dict[str, dict] = {}
    best_ever: dict[str, float] = {}
    best_probe = float("inf")  # fastest single-thread probe any round saw
    here = os.path.dirname(os.path.abspath(__file__))
    for f in sorted(os.listdir(here)):
        if not re.fullmatch(r"BENCH_r\d+\.json", f):
            continue
        try:
            with open(os.path.join(here, f)) as fh:
                doc = json.load(fh)
            # fastest single-thread probe across prior rounds (probe_norm
            # input); probes survive driver tail-truncation, so regex the
            # raw document rather than relying on a parsed field
            doc_sf = doc.get("sf", (doc.get("parsed") or {}).get("sf"))
            if doc_sf == sf or (doc_sf is None and f'"sf": {sf}' in doc.get("tail", "")):
                raw = doc.get("tail", "") + json.dumps(doc.get("parsed") or {})
                for mm in re.finditer(
                    r'"cpu_probe_(?:before|after)_sec":\s*([0-9.]+)', raw
                ):
                    pv = float(mm.group(1))
                    if pv > 0:
                        best_probe = min(best_probe, pv)
            parsed = doc.get("parsed") or doc
            if (not isinstance(parsed, dict) or parsed.get("sf") != sf
                    or "queries" not in parsed):
                # older rounds wrapped the JSON line under "tail"; the
                # driver may also have truncated the HEAD of the line, in
                # which case recover medians from the surviving
                # "query_runs" object (balanced-brace extraction)
                tail = doc.get("tail", "")
                start = tail.find('{"metric"')
                parsed = json.loads(tail[start:]) if start >= 0 else {}
                if parsed.get("sf") != sf:
                    parsed = {}
                    k = tail.find('"query_runs"')
                    if k >= 0 and f'"sf": {sf}' in tail:
                        b0 = tail.index("{", k)
                        depth, b1 = 0, b0
                        for i in range(b0, len(tail)):
                            depth += {"{": 1, "}": -1}.get(tail[i], 0)
                            if depth == 0:
                                b1 = i + 1
                                break
                        try:
                            qruns = json.loads(tail[b0:b1])
                            parsed = {
                                "queries": {
                                    n: sorted(rs)[len(rs) // 2]
                                    for n, rs in qruns.items()
                                    if isinstance(rs, list) and rs
                                }
                            }
                        except Exception:
                            parsed = {}
                    if not parsed and f'"sf": {sf}' in tail:
                        # driver keeps only the LAST 2000 chars of the
                        # line — no '{"metric"' head, no '"query_runs"'
                        # key survives (true of every r5-r9 file), so
                        # recover whatever COMPLETE "qNNN": [runs]
                        # fragments the tail holds: the tail end of the
                        # line is query_runs' end, i.e. the late-suite
                        # heavy queries whose drift tracking matters
                        # most (q343/q372/q381/q383 were silently
                        # untracked before this).
                        runs2: dict[str, float] = {}
                        for m2 in re.finditer(
                            r'"(q[0-9]\w+)":\s*\[([0-9.\s,]+)\]', tail
                        ):
                            try:
                                vals = [
                                    float(x)
                                    for x in m2.group(2).split(",")
                                ]
                            except ValueError:
                                continue
                            if vals:
                                runs2[m2.group(1)] = sorted(vals)[
                                    len(vals) // 2
                                ]
                        if runs2:
                            parsed = {"queries": runs2}
                    if not parsed:
                        continue
            for name, v in (parsed.get("queries") or {}).items():
                v = v.get("median") if isinstance(v, dict) else v
                if isinstance(v, (int, float)) and v > 0:
                    best_ever[name] = min(best_ever.get(name, v), v)
        except Exception:
            continue
    # Self-classifying drift (round-6, verdict #4): a drift entry whose
    # ratio is plausibly explained by measured 32-way host steal is
    # labelled "host" — NOMINAL_EFF is the unloaded effective parallelism
    # of this VM; steal_factor = nominal/observed is the multiplicative
    # wall inflation every 32-way stage suffered during this run.
    # Measured unloaded on this VM (loadavg ~1, round 6): eff 19.0/20.1 —
    # below the naive 32x because single-thread turbo beats all-core
    # frequency, which is a constant property of the box, not steal.
    NOMINAL_EFF = 19.0
    steal_factor = max(1.0, NOMINAL_EFF / max(eff_par_before, 1.0))
    # probe_norm (round-7 verdict #5): single-thread slowdown of THIS run
    # vs the fastest probe any prior round recorded. The 32-way eff probe
    # misses interference that slows every core uniformly (r7: probe 27%
    # slower than r6, eff_par 1.01 — six phantom "engine-or-unknown"
    # drifts); normalizing the explained-ratio budget by the probe delta
    # makes the classifier self-explaining on a noisy host.
    probe_norm = (
        max(1.0, probe_before / best_probe)
        if best_probe < float("inf")
        else 1.0
    )
    for name, med in times.items():
        b = best_ever.get(name)
        if b and med > 1.25 * b:
            ratio = round(med / b, 2)
            if ratio <= 1.5 * steal_factor * probe_norm:
                # within what measured steal + single-thread probe delta
                # explain; on an unloaded host (both ~1.0) a <=1.5x
                # ratio is plain run noise
                cause = (
                    "host"
                    if steal_factor >= 1.1 or probe_norm >= 1.1
                    else "noise"
                )
            else:
                cause = "engine-or-unknown"
            drift[name] = {
                "best_ever": b,
                "median": med,
                "ratio": ratio,
                "cause": cause,
                "steal_factor": round(steal_factor, 2),
                "probe_norm": round(probe_norm, 2),
            }

    # watch tier (round-10, verdict ask #7): a >1.10x best-ever move that
    # stays under the 1.25x drift bar is not actionable alone, but three
    # of them moved together in round 9 (q343/q372/q381, +9-15% on a
    # slower host) — give every >10% move the SAME fresh-session
    # rerun_median confirm so the trend is settled in-band instead of
    # deferred a round.
    watch: dict[str, dict] = {}
    for name, med in times.items():
        b = best_ever.get(name)
        if b and med > 1.10 * b and name not in drift:
            watch[name] = {
                "best_ever": b,
                "median": med,
                "ratio": round(med / b, 2),
                "probe_norm": round(probe_norm, 2),
            }

    # throughput probes against the published baseline shapes
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()

    # Steady-state throughput: best of 3 — a single shot right after the
    # heavy LSH queries measures executor GC/cleanup backlog, not the
    # chain (observed 3.9 s vs 0.8 s steady state for the same query);
    # BASELINE.md's Glue figures are steady-state job throughputs.
    fact1_s = min(
        _timed(lambda: _force(qs["q24_sample_trajectory"](spark, sf_dir)))
        for _ in range(3)
    )
    clean_s = min(
        _timed(lambda: _force(qs["q22_parse_timestamps"](spark, sf_dir)))
        for _ in range(3)
    )

    probe32_after, eff_par_after = _cpu_probe32(min(cpus, 32))

    # Confirm-or-clear drifted queries in-band (round-8 verdict ask #7):
    # probe_norm explains host noise, but a genuinely drifted query gets
    # ONE re-measurement in a FRESH session (new JVM state: empty caches,
    # no accumulated GC debt, fresh codegen) so a drift entry is
    # actionable on its own — `rerun_median` is the median of 3 passes
    # after 1 warmup, and `rerun_clears` says whether the fresh-session
    # number falls back inside the 1.25x best-ever envelope (=> the
    # suite-run number was session debt / transient load, not the
    # engine).
    if drift or watch:
        spark.stop()
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("bench-drift-rerun")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            )
            .config(
                "spark.sql.codegen.cache.maxEntries",
                os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
            )
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for name, entry in {**drift, **watch}.items():
            rr: list[float] = []
            for i in range(4):  # 1 codegen warmup + 3 recorded
                t0 = time.time()
                _force(qs[name](spark, sf_dir))
                if i > 0:
                    rr.append(round(time.time() - t0, 3))
                gc.collect()
                spark.catalog.clearCache()
            entry["rerun_median"] = sorted(rr)[len(rr) // 2]
            # clear envelope matches the tier that flagged the entry:
            # drift = 1.25x best-ever, watch = 1.10x
            env = 1.25 if name in drift else 1.10
            entry["rerun_clears"] = (
                entry["rerun_median"] <= env * entry["best_ever"]
            )

    line = json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "query_runs": runs,
                "regressions": regressions,
                "drift": drift,
                "watch": watch,
                "best_ever": best_ever,
                "prev_bench": os.path.basename(prev_path) if prev_path else None,
                "sf": sf,
                "cpus": cpus,
                # host-steal probes (see _cpu_probe): ~0.6s = unloaded VM;
                # values 2-4x that mean co-tenant contention inflated every
                # wall time in this file by roughly the same factor
                "cpu_probe_before_sec": probe_before,
                "cpu_probe_after_sec": _cpu_probe(),
                # 32-way probes (round 6): wall + effective parallelism;
                # eff < ~20x ⇒ this file's walls are host-steal inflated
                "cpu_probe32_before_sec": probe32_before,
                "cpu_probe32_eff_parallelism_before": eff_par_before,
                "cpu_probe32_after_sec": probe32_after,
                "cpu_probe32_eff_parallelism_after": eff_par_after,
                "n_events": n_events,
                "fact1_like_rows_per_sec": round(n_events / fact1_s),
                "clean_rows_per_sec": round(n_events / clean_s),
            }
    )
    print(line)
    # Also persist the COMPLETE line to an append-only sidecar: the
    # driver's BENCH_rNN.json keeps only the last 2000 chars of stdout
    # (r09's file survived only as a tail — this round had no official
    # per-query geomean because of it; round-10 verdict ask #8). The
    # sidecar is the lossless history the recovery parser above falls
    # back to; committed per round as plans/rNN/bench_official.log.
    try:
        side = os.environ.get(
            "SPARK_GRAFT_BENCH_LOG",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_official.log"),
        )
        with open(side, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout already carried the line


if __name__ == "__main__":
    main()
