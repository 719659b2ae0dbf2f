#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Query set = the reference-parity pipeline (grep, chunked count, wiretap
fan-out) + the relational headliners (Q1/Q3/Q5 shapes) + the north-star ops
(dedup, similarity, text stats). Each timing covers plan + execution +
collect of the (small) result — the same thing the reference's elapsed-ms
printouts measured for its jobs (TailFTest.java steps 1-4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_stuff_spark.plans.registry import EXTRA_QUERIES, QUERIES  # noqa: E402

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
from hadoop_stuff_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_grep_count",
    "t4_grep_regex",
    "t1_t3_a1_a3_chunked_count",
    "st2_st3_wiretap_routing",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_top_customers_per_nation",
    "q17_small_quantity_revenue",
    "n1_dedup_exact_groups",
    "n1_minhash_near_dups",
    "n1_simhash_near_dups",
    "n2_topk_cosine_bruteforce",
    "n2_topk_cosine_pq",
    "n3_text_stats",
    "n3_winnowed_fingerprints",
    "n3_vocabulary",
    "n1_contamination_report",
    "skew_salted_join_enriched_counts",
    "asof_purchase_last_click",
    "range_error_window_activity",
    "q8_nation_market_share",
    "hll_sketch_distinct_users",
    "theta_overlap_users",
    "kll_value_quantiles",
    "dq_orders_report",
    "n3_document_chunks",
    "copurchase_pairs",
    "n1_curate_pipeline",
    "funnel_conversion",
    "pagerank_copurchase_parts",
    # round-6 late wave: clustering / semantic dedup / data selection /
    # hybrid retrieval (all EXTRA_QUERIES, oracle-backed)
    "n2_kmeans_lloyd",
    "n1_semantic_dedup_pairs",
    "n3_importance_resampling",
    "n2_hybrid_rrf_fusion",
    # round-6 fourth-session wave: containment dedup / tokenizer training /
    # concentration profiling (all EXTRA_QUERIES, oracle-backed)
    "n1_containment_pairs",
    "n3_skipgram_cooccurrence",
    "gini_doc_length_by_source",
    # round-7 wave: schema-wide integrity (7 FK joins), lexical drift
    # (explode + 3 window totals), revenue concentration (global ntile)
    "referential_integrity_report",
    "n3_unigram_kl_by_source",
    "order_value_decile_lift",
    # round-9 widening (VERDICT r8 #2): the round-8 operator waves get
    # wall-time accountability. Added at ROUND START so the committed
    # BENCH_DETAIL and the driver's BENCH_r09 describe the same set; the
    # detail JSON carries a shared-41 subtotal (total minus these) so
    # round-over-round comparison against r8's 41-query headline holds.
    *(_R9_WIDENING := [
        "source_js_divergence_matrix",
        "rfm_customer_segments",
        "ks_interarrival_expfit",
        "basket_affinity_lift",
    ]),
    # round-10 widening (VERDICT r9 #2): the round-9 second wave gets
    # wall-time accountability, added at ROUND START so the committed
    # detail and the driver's BENCH_r10 describe the same set. The detail
    # JSON carries a shared_45_total subtotal (total minus these) that
    # compares against BENCH_r09/BENCH_DETAIL_r09's 45-query value —
    # quoting r9 queries_min as the base per the r9 environment-shift
    # adjudication.
    *(_R10_WIDENING := [
        "changepoint_daily_orders",
        "forecast_backtest_daily_orders",
        "acf_daily_orders",
        "n3_curation_funnel_by_source",
        "part_neighbor_jaccard",
        "n2_label_silhouette",
    ]),
    # round-11 widening (VERDICT r10 #2): the round-10 operator waves get
    # wall-time accountability, added at ROUND START so the committed
    # detail and the driver's BENCH_r11 describe the same set. The detail
    # JSON carries a shared_51_total subtotal (total minus these) that
    # compares against BENCH_r10's 51-query value — quoting r10
    # queries_min as the base per the sustained environment-shift verdict.
    *(_R11_WIDENING := [
        "ab_value_bootstrap_ci",
        "seasonal_residual_changepoint",
        "per_source_near_dup_rate",
        "n3_effective_token_yield",
        "seasonality_strength_by_priority",
        "weekly_retention_matrix",
    ]),
    # round-12 widening (VERDICT r11 #2): the round-11 operator wave gets
    # wall-time accountability, added at ROUND START so the committed
    # detail and the driver's BENCH_r12 describe the same set. The detail
    # JSON carries a shared_57_total subtotal (total minus these) that
    # compares against BENCH_r11's 57-query value.
    *(_R12_WIDENING := [
        "n3_dedup_aware_token_budget",
        "ab_bootstrap_ci_by_nation",
        "user_lifecycle_weekly",
        "priority_share_control_chart",
        "n2_source_centroid_similarity",
        "n2_jl_projection_distortion",
    ]),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="hadoop-stuff-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session (not counted): datasource init, plus JIT of the
    # hot expression paths (regex/md5/aggregate) and the Python-worker pool.
    # Measured: the md5-fingerprint groupBy pays 3-30s of C2-compiler warmup
    # on its FIRST execution in a session and ~0.5s after — steady-state is
    # what the reference's elapsed-ms benchmarks measured too (long-lived
    # executors on a real cluster are always warm).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(20000).select(
        F.md5(
            F.regexp_replace(
                F.trim(F.lower(F.concat(F.lit("x  y "), F.col("id").cast("string")))),
                r"\s+",
                " ",
            )
        ).alias("fp")
    ).groupBy("fp").agg(F.count(F.lit(1))).count()

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10000).select(_warm(F.col("id"))).count()

    # higher-order functions evaluate interpreted (no whole-stage codegen):
    # warm the aggregate/zip_with/xxhash64 interpreter paths the MinHash
    # signature runs on
    spark.range(2000).select(
        F.aggregate(
            F.array_repeat(F.col("id").cast("string"), 8),
            F.array_repeat(F.lit((1 << 63) - 1).cast("long"), 8),
            lambda acc, s: F.zip_with(
                acc,
                F.array(*[F.xxhash64(s, F.lit(i)) for i in range(8)]),
                lambda a, b: F.least(a, b),
            ),
        ).alias("sig")
    ).count()

    # median-of-N timings (r3 VERDICT #6): single-run numbers on this
    # co-tenant VM swing 2-3x between identical runs; the median is the
    # signal, and all runs are kept so round-over-round deltas are
    # attributable. Interleaving would randomize cache effects further but
    # keeping per-query runs adjacent keeps the log readable.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # r13 (VERDICT r12 #4, guide §1.4): the historical count()/collect()
    # action provably under-measures — count() lets Catalyst prune final
    # projections and even cardinality-preserving joins (the r12
    # contamination case timed a bare doc count). The noop sink computes
    # every column of every row and cannot be pruned. ADDITIONS ONLY:
    # `queries` keeps the count/collect methodology and _EXTRA_RUNS
    # byte-for-byte so the round-over-round series stays comparable;
    # `queries_noop` starts the un-prunable series alongside it
    # (median-of-N, same per-run fresh-plan discipline).
    n_noop_runs = int(os.environ.get("SPARK_GRAFT_NOOP_RUNS", "3"))
    noise_floor = {"before": _noise_probe(spark)}
    timings: dict[str, float] = {}
    timings_noop: dict[str, float] = {}
    t_min: dict[str, float] = {}
    t_max: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    all_noop_runs: dict[str, list[float]] = {}
    row_counts: dict[str, int] = {}
    for name in HEADLINE:
        fn = ALL_QUERIES[name].fn
        runs = []
        for _ in range(n_runs + _EXTRA_RUNS.get(name, 0)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count() if name not in _COLLECT else len(df.collect())
            runs.append(round(time.perf_counter() - t0, 3))
        runs_sorted = sorted(runs)
        timings[name] = runs_sorted[len(runs_sorted) // 2]
        t_min[name] = runs_sorted[0]
        t_max[name] = runs_sorted[-1]
        all_runs[name] = runs
        row_counts[name] = n
        nruns = []
        for _ in range(n_noop_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            nruns.append(round(time.perf_counter() - t0, 3))
        timings_noop[name] = sorted(nruns)[len(nruns) // 2]
        all_noop_runs[name] = nruns
        print(
            f"# {name}: median {timings[name]:.3f}s "
            f"(min {t_min[name]:.3f} max {t_max[name]:.3f}, {n} rows) "
            f"noop {timings_noop[name]:.3f}s",
            file=sys.stderr,
        )

    noise_floor["after"] = _noise_probe(spark)
    print(f"# noise floor: {noise_floor}", file=sys.stderr)

    # detail-only blocks: a failure here must never cost the round's
    # contract line (stdout JSON) or the headline timings
    try:
        scaling = _scaling_audit(spark, sf_dir, timings)
    except Exception as exc:  # noqa: BLE001
        scaling = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    try:
        curate_stages = _curate_stage_breakdown(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        curate_stages = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    try:
        ingest, matrix = _ingest_benchmarks(spark)
    except Exception as exc:  # noqa: BLE001
        ingest, matrix = {"error": f"{type(exc).__name__}: {exc}"[:300]}, []

    total = round(sum(timings.values()), 3)
    # round-over-round comparability across headline widenings: the
    # subtotal over exactly the PREVIOUS round's query set (headline
    # minus this round's additions) is what compares against the prior
    # BENCH_r{N}; the r8-era 41-query subtotal is kept for the longer
    # series.
    shared_57 = round(
        sum(t for n, t in timings.items() if n not in _R12_WIDENING), 3
    )
    shared_51 = round(
        sum(
            t
            for n, t in timings.items()
            if n not in _R11_WIDENING and n not in _R12_WIDENING
        ),
        3,
    )
    shared_45 = round(
        sum(
            t
            for n, t in timings.items()
            if n not in _R10_WIDENING
            and n not in _R11_WIDENING
            and n not in _R12_WIDENING
        ),
        3,
    )
    shared_prev = round(
        sum(
            t
            for n, t in timings.items()
            if n not in _R9_WIDENING
            and n not in _R10_WIDENING
            and n not in _R11_WIDENING
            and n not in _R12_WIDENING
        ),
        3,
    )
    # Stdout carries ONLY the minimal driver contract line — round 4's
    # line grew past the driver's stdout capture (runs arrays + ingest
    # matrix) and BENCH_r04.json recorded "parsed": null, losing the
    # round's timings (VERDICT r4 #1). Full detail goes to a committed,
    # ROUND-STAMPED side file (VERDICT r5 #3: the unstamped path was
    # overwritten every round, losing raw-run history one level up) —
    # round inferred as max(BENCH_r*.json)+1, the round whose
    # BENCH_r{N}.json the driver is about to write.
    repo = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.environ.get(
        "SPARK_GRAFT_DETAIL_PATH",
        os.path.join(repo, f"BENCH_DETAIL_r{_current_round(repo):02d}.json"),
    )
    detail = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "shared_41_total": shared_prev,
        "shared_45_total": shared_45,
        "shared_51_total": shared_51,
        "shared_57_total": shared_57,
        "r9_widening": _R9_WIDENING,
        "r10_widening": _R10_WIDENING,
        "r11_widening": _R11_WIDENING,
        "r12_widening": _R12_WIDENING,
        "queries": timings,
        "queries_noop": timings_noop,
        "queries_min": t_min,
        "queries_max": t_max,
        "runs": all_runs,
        "noop_runs": all_noop_runs,
        "n_runs": n_runs,
        "n_noop_runs": n_noop_runs,
        "extra_runs": _EXTRA_RUNS,
        "rows": row_counts,
        "noise_floor": noise_floor,
        "scaling": scaling,
        "curate_stages": curate_stages,
        "ingest": ingest,
        "ingest_matrix": matrix,
        "sf": sf,
    }
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    # keep the legacy unstamped path in sync for tooling that reads it —
    # but only when the caller hasn't redirected detail output away from
    # the repo (a redirect means "don't touch the working tree")
    if "SPARK_GRAFT_DETAIL_PATH" not in os.environ:
        with open(os.path.join(repo, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    print(f"# full detail -> {detail_path}", file=sys.stderr)
    # `queries_noop` joins the contract line (VERDICT r12 #4) so the
    # driver artifact carries both actions; the map is medians-only
    # (compact — the r4 stdout-capture overflow came from runs arrays
    # and the ingest matrix, which stay in the detail file).
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_noop": timings_noop,
                "sf": sf,
            }
        )
    )


def _noise_probe(spark) -> dict:
    """Machine-contention calibration: a fixed reference workload (pure
    JVM aggregate over a generated range — no I/O, no Python workers,
    plan identical every round) timed 3x before and after the headline
    loop. Round-over-round, the headline medians only mean something
    relative to this floor: on this co-tenant box identical code swings
    2-3x between runs, and the probe tells a reader which rounds were
    measured hot."""
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        # bit_xor over xxhash64 — real per-row work, no ANSI sum overflow
        spark.range(50_000_000).selectExpr("bit_xor(xxhash64(id)) AS s").collect()
        runs.append(round(time.perf_counter() - t0, 4))
    return {"runs": runs, "median": sorted(runs)[1]}


def _current_round(repo: str) -> int:
    """The round whose artifacts are being produced: one past the highest
    BENCH_r{N}.json the driver has already committed. A manual re-run
    AFTER the round's own BENCH_r{N}.json landed would mislabel one
    round ahead — override with SPARK_GRAFT_ROUND for those."""
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    rounds = [
        int(m.group(1))
        for f in os.listdir(repo)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def _scaling_audit(spark, sf_dir: str, sf01_medians: dict[str, float]):
    """Scaling-slope audit (VERDICT r5 #4): the 100x question, measured.
    Runs every headline query ONCE at the sibling sf0.001 and sf0.01
    dirs (the sf0.1 number is the headline median already in hand) and
    records the wall-time growth ratio across each decade of data.

    Reading the ratios: fact tables grow 10x per decade, so a query that
    is linear in data with some fixed overhead shows ratio <= ~10 (the
    overhead — job scheduling, Python-worker round-trips — inflates the
    SMALL-sf denominator, pulling ratios DOWN); `documents`/`embeddings`
    are the same size at sf0.001 and sf0.01 (500/500) and grow 10x/4x to
    sf0.1, same bound. A ratio materially above the decade's data growth
    means super-linear work (e.g. an unguarded quadratic join) — exactly
    what the n-gram inverted index would have shown pre-guard. Flag
    threshold 20 = 2x grace over linear growth. Skipped (with a note)
    when the sibling dirs don't exist. Disable: SPARK_GRAFT_SCALING=0."""
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "0":
        return {"skipped": "SPARK_GRAFT_SCALING=0"}
    base = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    small_dirs = [os.path.join(base, "sf0.001"), os.path.join(base, "sf0.01")]
    if os.path.abspath(sf_dir.rstrip("/")) in [os.path.abspath(d) for d in small_dirs]:
        # smoke runs point SPARK_GRAFT_SF_DIR at one of the grid dirs;
        # the head median would overwrite that grid point and every
        # ratio would silently read 1.0 (caught by code review)
        return {"skipped": f"headline sf dir {sf_dir} overlaps the scaling grid"}
    if not all(os.path.isdir(d) for d in small_dirs):
        return {"skipped": f"sibling sf dirs missing under {base}"}
    times: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for d, label in zip(small_dirs, ("0.001", "0.01")):
        for name in HEADLINE:
            fn = ALL_QUERIES[name].fn
            t0 = time.perf_counter()
            # a query failing at one sf must cost that one data point,
            # never the whole round's bench artifact
            try:
                df = fn(spark, d)
                df.count() if name not in _COLLECT else len(df.collect())
            except Exception as exc:  # noqa: BLE001
                errors[f"{name}@sf{label}"] = f"{type(exc).__name__}: {exc}"[:300]
                continue
            times.setdefault(name, {})[label] = round(time.perf_counter() - t0, 3)
        print(f"# scaling sweep done: sf{label}", file=sys.stderr)
    head_label = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    ratios = {}
    for name, t in times.items():
        if "0.001" not in t or "0.01" not in t:
            continue
        t[head_label] = sf01_medians[name]
        ratios[name] = {
            "r_01_over_001": round(t["0.01"] / max(t["0.001"], 1e-3), 2),
            "r_1_over_01": round(t[head_label] / max(t["0.01"], 1e-3), 2),
        }
    if not ratios:
        return {
            "skipped": "no query produced both small-sf data points",
            "errors": errors,
        }
    flagged = sorted(
        (
            name
            for name, r in ratios.items()
            if max(r["r_01_over_001"], r["r_1_over_01"]) > 20
        ),
    )
    worst = max(
        ratios, key=lambda n: max(ratios[n]["r_01_over_001"], ratios[n]["r_1_over_01"])
    )
    out = {
        "times": times,
        "ratios": ratios,
        "flag_threshold": 20,
        "flagged_super_linear": flagged,
        "worst_slope": {
            "query": worst,
            "ratio": max(ratios[worst]["r_01_over_001"], ratios[worst]["r_1_over_01"]),
        },
        "errors": errors,
    }
    print(f"# scaling worst slope: {out['worst_slope']}", file=sys.stderr)
    if flagged:
        print(f"# scaling FLAGGED super-linear: {flagged}", file=sys.stderr)
    try:
        out["extra_decade"] = _extra_decade(spark, sf01_medians, errors)
    except Exception as exc:  # noqa: BLE001
        out["extra_decade"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    return out


# The steepest headline queries from the r6 three-point grid: three points
# fit a slope, four expose a bend (VERDICT r6 #6), so these also run at a
# locally-replicated LARGER sf (scripts/make_scaling_sf.py — 5x sf0.1 via
# key-remapped fact replication, densities held at sf0.1 levels).
STEEP = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "copurchase_pairs",
    "pagerank_copurchase_parts",
    "n1_containment_pairs",
    "n1_curate_pipeline",
]


def _extra_decade(spark, sf01_medians: dict[str, float], errors: dict[str, str]):
    """Fourth scaling point: run the STEEP queries once at the replicated
    sf0.5 dir and report growth vs the sf0.1 headline median. Data grows
    5x, so a linear query shows ratio <= ~5; flag above 10 (the same 2x
    grace the decade grid uses). Skipped quietly if the dir is absent
    (run scripts/make_scaling_sf.py to create it)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    extra_dir = os.environ.get(
        "SPARK_GRAFT_SCALING_EXTRA", os.path.join(repo, ".scaling", "sf0.5")
    )
    if not os.path.isdir(extra_dir):
        return {"skipped": f"{extra_dir} missing (scripts/make_scaling_sf.py)"}
    label = os.path.basename(extra_dir.rstrip("/")).removeprefix("sf")
    data_growth = float(label) / 0.1
    times: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in STEEP:
        fn = ALL_QUERIES[name].fn
        t0 = time.perf_counter()
        try:
            df = fn(spark, extra_dir)
            df.count() if name not in _COLLECT else len(df.collect())
        except Exception as exc:  # noqa: BLE001
            errors[f"{name}@sf{label}"] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        if sf01_medians.get(name):
            ratios[name] = round(times[name] / sf01_medians[name], 2)
    flagged = sorted(n for n, r in ratios.items() if r > 2 * data_growth)
    out = {
        "dir": extra_dir,
        "sf": float(label),
        "data_growth_vs_headline": data_growth,
        "times": times,
        "ratio_vs_headline": ratios,
        "flag_threshold": 2 * data_growth,
        "flagged_super_linear": flagged,
    }
    print(f"# extra decade sf{label}: {ratios}", file=sys.stderr)
    if flagged:
        print(f"# extra decade FLAGGED: {flagged}", file=sys.stderr)
    # VERDICT r7 #5: the two queries still steepening at sf0.5
    # (copurchase 2.9x, containment 2.48x on 5x data) get ONE more
    # factor-2 point at sf1.0 — growth vs their own sf0.5 time tells
    # "fixed overhead amortizing" (ratio well under 2) apart from
    # "super-linear onset" (ratio past 4 = 2x the 2x data growth).
    # VERDICT r8 #5: plus THIS round's worst sf0.5 ratio, whichever
    # query that is — the grid stays honest as the steepest query
    # changes round to round.
    worst = max(ratios, key=ratios.get) if ratios else None
    out["sf1.0"] = _full_decade_point(spark, times, errors, extra=worst)
    return out


STEEPENING = ["copurchase_pairs", "n1_containment_pairs"]


def _full_decade_point(
    spark,
    sf05_times: dict[str, float],
    errors: dict[str, str],
    extra: str | None = None,
):
    repo = os.path.dirname(os.path.abspath(__file__))
    d = os.path.join(repo, ".scaling", "sf1.0")
    if not os.path.isdir(d):
        return {"skipped": f"{d} missing (scripts/make_scaling_sf.py --factor 10)"}
    names = list(STEEPENING)
    if extra and extra not in names and extra in sf05_times:
        names.append(extra)
    times: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in names:
        fn = ALL_QUERIES[name].fn
        t0 = time.perf_counter()
        try:
            fn(spark, d).count()
        except Exception as exc:  # noqa: BLE001
            errors[f"{name}@sf1.0"] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        if sf05_times.get(name):
            ratios[name] = round(times[name] / sf05_times[name], 2)
    flagged = sorted(n for n, r in ratios.items() if r > 4)
    # three-way: <=2.2 scales at-or-under the data growth (0.2 noise
    # grace), <=4 grows faster than data but within the grid's 2x grace
    # (watch next round), >4 flags
    verdict = {
        n: (
            "super_linear_onset"
            if r > 4
            else ("watch" if r > 2.2 else "sub_linear")
        )
        for n, r in ratios.items()
    }
    print(f"# full decade sf1.0 (vs sf0.5): {ratios} {verdict}", file=sys.stderr)
    return {
        "dir": d,
        "data_growth_vs_sf0.5": 2.0,
        "times": times,
        "ratio_vs_sf0.5": ratios,
        "flag_threshold": 4.0,
        "flagged_super_linear": flagged,
        "verdict": verdict,
    }


def _curate_stage_breakdown(spark, sf_dir: str) -> dict:
    """Attribute the n1_curate_pipeline composite (VERDICT r5 #6): run the
    same curation once in staged mode with a QueryLog and report wall
    seconds per stage. The staged run adds checkpoint barriers, so its
    sum can differ from the fused headline median — both are recorded."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.engine import Engine
    from hadoop_stuff_spark.plans.qlog import QueryLog

    tmp = tempfile.mkdtemp(prefix="bench_qlog_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        holdout = docs.filter(F.col("doc_id") % 20 == 0)
        corpus = docs.filter(F.col("doc_id") % 20 != 0)
        qlog = QueryLog(spark, os.path.join(tmp, "qlog"))
        t0 = time.perf_counter()
        Engine(spark).curate(corpus, holdout, qlog=qlog).count()
        total = round(time.perf_counter() - t0, 3)
        stages = {
            r.name.removeprefix("curate:"): r.wall_s for r in qlog.table().collect()
        }
        out = {"stages": stages, "staged_total_s": total}
        print(f"# curate stages: {out}", file=sys.stderr)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _ingest_benchmarks(spark):
    """The reference's only real performance artifact is TailFTest's
    numbered ingest protocol (TailFTest.java:100-377): write line records
    through chunk-size x codec variants and compare elapsed/size. This is
    that sweep on the engine's sinks (r3 VERDICT #8):

    - chunked layout (python-gzip line blobs in parquet) at chunk sizes
      200 / 1000 / 10000 — the reference's P5 tradeoff: bigger chunks
      compress better but make coarser split units;
    - plain one-line-per-row parquet under snappy / zstd / gzip — the
      'uncompressed-vs-chunked' axis, with the columnar codecs the
      JVM provides (no python zstd exists in this container; parquet's
      zstd is JVM-side and is the codec a production table would use).

    Each variant records write seconds, records/s, on-disk bytes and a
    full read-back (decode + count) — the canonical 1000-line gzip chunk
    config is also reported as `ingest` for round-over-round continuity.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_stuff_spark.sources.chunks import read_chunked, write_chunked

    n_rec = 1_000_000
    lines = spark.range(n_rec).select(
        F.concat(
            F.lit("<24> 2012-06-13T00:25:02 {CGN-SET2} flow "),
            F.col("id").cast("string"),
            F.lit(
                " proto 7 application test6 ge-12/0/0.0:156.56.0.124:19972"
                " -> 156.56.0.125:19973 deleting forward"
            ),
        ).alias("value")
    )
    raw_bytes = n_rec * 120  # ~record length; ratio denominator
    matrix: list[dict] = []
    ingest = None
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        for chunk_size in (200, 1000, 10000):
            store = os.path.join(tmp, f"chunked_{chunk_size}")
            t0 = time.perf_counter()
            write_chunked(lines, "value", store, chunk_size=chunk_size)
            w = time.perf_counter() - t0
            t0 = time.perf_counter()
            assert read_chunked(spark, store).count() == n_rec
            r = time.perf_counter() - t0
            entry = {
                "layout": "chunked",
                "codec": "gzip",
                "chunk_size": chunk_size,
                "records": n_rec,
                "write_s": round(w, 3),
                "read_s": round(r, 3),
                "records_per_s": round(n_rec / w),
                "bytes": _dir_bytes(store),
                "ratio": round(raw_bytes / max(_dir_bytes(store), 1), 2),
            }
            matrix.append(entry)
            if chunk_size == 1000:
                ingest = {
                    "records": n_rec,
                    "seconds": entry["write_s"],
                    "records_per_s": entry["records_per_s"],
                }
            print(f"# ingest {entry}", file=sys.stderr)
        for codec in ("snappy", "zstd", "gzip"):
            store = os.path.join(tmp, f"plain_{codec}")
            t0 = time.perf_counter()
            lines.write.option("compression", codec).parquet(store)
            w = time.perf_counter() - t0
            t0 = time.perf_counter()
            assert spark.read.parquet(store).count() == n_rec
            r = time.perf_counter() - t0
            entry = {
                "layout": "plain",
                "codec": codec,
                "chunk_size": None,
                "records": n_rec,
                "write_s": round(w, 3),
                "read_s": round(r, 3),
                "records_per_s": round(n_rec / w),
                "bytes": _dir_bytes(store),
                "ratio": round(raw_bytes / max(_dir_bytes(store), 1), 2),
            }
            matrix.append(entry)
            print(f"# ingest {entry}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"# ingest: {ingest}", file=sys.stderr)
    return ingest, matrix


# every headline entry that runs >= ~2 s at sf0.1 (VERDICT r7 #4): these
# dominate the headline total, and at n_runs=3 the judge could not tell a
# real regression from co-tenant load (unchanged-code queries drifted up
# to +24% in r7) — the median of 5 keeps one hot and one cold outlier
# out, and queries_min is recorded alongside for the adjudication
# min-of-5 adjudication for every query that crossed ~2 s in the r12
# DRIVER run (standing gate per VERDICT r10 "what's wrong" #1: recompute
# this set at EVERY round start from the previous driver run, never carry
# the prior round's set). Set = exactly the BENCH_r12.json (driver
# session) queries with median >= 2.0 s — RE-DERIVED from the artifact,
# never edited from the prior map (the never-quote-counts rule). Verify:
#   python -c "import json; print(sorted(k for k, v in json.load(open(
#       'BENCH_r12.json'))['parsed']['queries'].items() if v >= 2))"
_EXTRA_RUNS = {
    "ab_bootstrap_ci_by_nation": 2,
    "ab_value_bootstrap_ci": 2,
    "basket_affinity_lift": 2,
    "copurchase_pairs": 2,
    "n1_containment_pairs": 2,
    "n1_curate_pipeline": 2,
    "n2_kmeans_lloyd": 2,
    "n2_label_silhouette": 2,
    "pagerank_copurchase_parts": 2,
    "part_neighbor_jaccard": 2,
    "referential_integrity_report": 2,
    "source_js_divergence_matrix": 2,
}

# queries whose result is the deliverable (collect it); others just count
_COLLECT = {
    "flagship_grep_count",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "n2_topk_cosine_bruteforce",
}

if __name__ == "__main__":
    main()
