#!/usr/bin/env python
"""Benchmark harness: runs the headline corpus queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed three times (forcing full materialization via
collect); the min is reported — the first run pays JVM/codegen warmup, and
best-of-3 absorbs host-level noisy-neighbor variance (observed 2-3x
machine-wide slowdowns with an idle guest process table).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_distinct_counts",
    "agg_percentiles",
    "window_topk_per_group",
    "join_asof",
    "pushdown_predicates",
    "stream_session_window",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_exact",
    "similarity_topk_brute",
    "fn_json",
]

# Round-3 extension operators, benched separately so the original 14-query
# total stays directly comparable with BASELINE.md's re-recorded numbers
# (their per-query baselines live in BASELINE.md's extension row).
EXTENSION = [
    "similarity_lsh_topk",
    "sample_train_test_split",
    "pack_sequences_by_lang",
    "aggs_composite_page",
    "writepath_sink_upsert",
    # round-4 additions (appended per VERDICT r3 item 7 — headline list
    # unchanged so the BASELINE.md comparison stays apples-to-apples)
    "writepath_time_travel",
    "writepath_zorder_read",
    "writepath_stream_source",
    "dedup_cluster_components",
    "similarity_sq_topk",
    "text_repetition_signals",
    "aggs_histogram_empty_buckets",
    "search_suggest_term",
    # round-4 late additions (this session)
    "query_dsl_multi_match",
    "aggs_ip_range",
    "aggs_matrix_stats",
    # round-4 final block: ingest pipelines, transforms/EQL, knn/rescore,
    # query_string parser, mixture sampling
    "ingest_pipeline_events",
    "transform_pivot_monthly",
    "eql_funnel_sequence",
    "search_knn_filtered",
    "query_dsl_query_string",
    "sample_to_mixture",
    # round-4 extra-session block: spans, parent-child, item-set mining,
    # suggesters, C4 filters, terms lookup, ES SQL
    "query_dsl_span_near",
    "join_has_child",
    "aggs_frequent_item_sets",
    "search_suggest_phrase",
    "text_c4_filters",
    "writepath_terms_lookup",
    "writepath_es_sql",
    # round-4 extra-session block 2: ES|QL, hybrid/sparse retrieval,
    # percolator, change detection, global dedup, unigram LM
    "esql_stats_by",
    "search_rrf_hybrid",
    "search_sparse_vector",
    "writepath_percolate",
    "aggs_change_point",
    "dedup_segments_global",
    "text_unigram_logprob",
    # round-4 extra-session block 3: data streams, CCS, templates,
    # reverse_nested, ES|QL BUCKET/filtered stats
    "writepath_data_stream",
    "writepath_ccs",
    "writepath_index_template",
    "aggs_reverse_nested",
    "esql_bucket_filtered_stats",
]


def _env_float(name: str, default: float) -> float:
    """Parse a float env knob, falling back LOUDLY on garbage — a
    malformed $SPARK_GRAFT_QUIET_WAIT must not kill the bench before
    any measurement (ADVICE r12)."""
    raw = os.environ.get(name)
    if raw is None or not raw.strip():
        return default
    try:
        return float(raw)
    except ValueError:
        print(
            f"# {name}={raw!r} is not a number - using default {default}",
            file=sys.stderr,
        )
        return default


def _wait_for_quiet(threshold: float | None = None) -> tuple[float, float, float]:
    """Pre-flight (VERDICT r11 item 2): the r10/r11 BENCH artifacts were
    recorded on a busy host and overstated the code by ~15%.  Sample the
    1-min loadavg BEFORE the JVM starts (Spark startup itself inflates
    it, so in-session samples can't judge the window) and, if the host
    is busy, wait up to $SPARK_GRAFT_QUIET_WAIT seconds (default 240,
    0 disables) for it to drop below ``threshold`` before benching.
    The default threshold scales with the core count (ADVICE r12:
    a flat 0.7 is near-saturation on 1 core and burns the full wait on
    any multi-core background hum): max(0.7, 0.05*cores), overridable
    via $SPARK_GRAFT_QUIET_LOAD.  Returns (loadavg at process start,
    loadavg after the wait — the number that actually describes the
    measurement window — and seconds waited)."""
    if threshold is None:
        cores = os.cpu_count() or 1
        threshold = _env_float("SPARK_GRAFT_QUIET_LOAD", max(0.7, 0.05 * cores))
    start = os.getloadavg()[0]
    cap = _env_float("SPARK_GRAFT_QUIET_WAIT", 240.0)
    waited = 0.0
    cur = start
    while cur > threshold and waited < cap:
        time.sleep(5.0)
        waited += 5.0
        cur = os.getloadavg()[0]
    if waited:
        print(
            f"# quiet-wait: loadavg {start:.2f} -> {cur:.2f} "
            f"after {waited:.0f}s",
            file=sys.stderr,
        )
    return round(start, 2), round(cur, 2), waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    loadavg_start, loadavg_prelaunch, quiet_waited = _wait_for_quiet()

    from elasticsearch_hadoop_spark.corpus import load_all
    from elasticsearch_hadoop_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM, parquet footer cache, codegen
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def bench(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            spec = registry[name]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
            print(f"# {name}: {out[name]}s", file=sys.stderr)
        return out

    # VERDICT r12 item 5: a single suite pass ships whatever load burst
    # it caught — run the WHOLE suite N times (>=2) in this one process
    # and take each query's min across passes (each pass is already
    # best-of-3 back-to-back reps; a second pass minutes later recovers
    # from a burst that inflated all three).  The headline is the sum
    # of per-query mins, with the per-pass physical totals recorded
    # alongside so a reader can see the spread.
    try:
        passes = max(1, min(16, int(_env_float("SPARK_GRAFT_BENCH_PASSES", 2))))
    except (OverflowError, ValueError):  # inf / nan survive _env_float
        print("# SPARK_GRAFT_BENCH_PASSES not usable - using 2", file=sys.stderr)
        passes = 2
    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    ext: dict[str, float] = {}
    pass_totals: list[float] = []
    for p in range(passes):
        print(f"# --- pass {p + 1}/{passes} ---", file=sys.stderr)
        t = bench(HEADLINE)
        e = bench(EXTENSION)
        pass_totals.append(round(sum(t.values()), 3))
        timings = {k: min(v, timings.get(k, v)) for k, v in t.items()}
        ext = {k: min(v, ext.get(k, v)) for k, v in e.items()}
    load_after = os.getloadavg()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_total",
                "value": total,
                "unit": "sec",
                "queries": {**timings, **{f"ext:{k}": v for k, v in ext.items()}},
                "extension_total": round(sum(ext.values()), 3),
                # `value` is the sum of per-query minima across all
                # passes; pass_totals are the physical per-pass headline
                # sums (their spread is the window's noise band)
                "passes": passes,
                "pass_totals": pass_totals,
                "sf": sf,
                # BASELINE.md variance caveat: identical code has measured
                # 12.7-17.2 s on this shared host depending on ambient
                # load — interpret `value` against these 1-min loadavgs.
                # loadavg_start samples at process start, BEFORE the
                # quiet-wait; loadavg_prelaunch is the post-wait, pre-JVM
                # sample — the one that describes the measurement window
                # (the JVM spin-up inflates loadavg_before);
                # quiet_waited_sec is the pre-flight wait spent getting
                # under the quiet threshold (max(0.7, 0.05*cores) or
                # $SPARK_GRAFT_QUIET_LOAD — see _wait_for_quiet)
                "loadavg_start": loadavg_start,
                "loadavg_prelaunch": loadavg_prelaunch,
                "quiet_waited_sec": quiet_waited,
                "loadavg_before": round(load_before[0], 2),
                "loadavg_after": round(load_after[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
