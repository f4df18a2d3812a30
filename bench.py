"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": <float>}.

Headline queries are timed as the MEDIAN of 3 materializations each
(write to the noop sink = full execution, what the reference jobs do per
transform minus their duplicate count-then-write anti-pattern, SURVEY
§4.3.1). The median tames the documented 16.6-21.0 s host swing
(PERF_NOTES, interleaved A/B runs of identical code); per-query min/max
spread is reported alongside so round-over-round deltas can be judged
against observed variance instead of guessed noise floors. The extra /
scale sections stay single-run to bound total bench time.

r7: the composition-cost corpus queries (t_corpus_manifest and its
streaming twin — each invocation is a full multi-batch pipeline with
state IO) moved to a SINGLE-RUN section (``queries_single_run``), and a
``scale_sf1_extras`` leg times the scheduler-bound heavy extras once at a
10x-scaled input dir where their compute actually shows (VERDICT r6
item 8). t_corpus_manifest's r1-r6 home was queries_extra (median-of-3);
compare r7+ readings against the single-run + sf1 legs.

r11: the single-run and sf1 legs run BEFORE the ~50-query extras loop
(they used to run last and inherit its minutes of churn — end loads 7-16
in both driver and judge runs), and every section records its entry 1-min
loadavg (``host_load_1m_per_section``) so each reading carries its own
host-state evidence (VERDICT r10 item 6).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

RUNS = 3

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from f1_datalakehouse_pipeline_spark import get_spark, registry

# Representative, heavier queries spanning scans, star joins, window stacks,
# SCD2 build, top-k, and the dedup/text extensions.
HEADLINE = [
    "a6_pricing_summary",
    "j4_star_join_revenue",
    "j6_window_group_share",
    "w3_best_row_tiebreak",
    "w4_w6_w7_championship",
    "w5_running_avg",
    "scd2_historical_build",
    "o2_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "t_text_quality",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "w_sessionize_events",
    "asof_purchase_to_view",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Host-load evidence (VERDICT r9 item 7): identical code has read
    # 10.9–14.5 s on this headline depending on what else the host ran
    # (adjudicated with forensic interleaved A/Bs in r7–r9). Recording
    # 1/5/15-min load averages at start and end lets a BENCH_r*.json reading
    # carry its own swing evidence instead of needing that A/B each round.
    load_start = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark("f1-lakehouse-bench")
    spark.sparkContext.setLogLevel("WARN")
    qs = registry.queries()

    # Warm-up: run every headline plan once at the smallest SF so whole-stage
    # codegen + JIT compile outside the timed region (codegen caches by plan
    # shape, so the sf-dir swap keeps the cache hot). Falls back to the bench
    # dir itself if sf0.001 is absent.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        if name in qs:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # Per-section 1-min loadavg snapshots (VERDICT r10 item 6): the heavy
    # single-run and sf1 legs used to run LAST and inherit the churn of ~50
    # median-of-3 extras (driver and judge both measured end loads 7-16 with
    # wide late-leg spreads). They now run FIRST after the headline — ~13 s
    # of headline churn instead of minutes of extras churn — and every
    # section carries its own load reading so any residual swing is
    # attributable without an interleaved A/B.
    section_load: dict[str, float] = {}

    def _mark(section: str) -> None:
        section_load[section] = round(os.getloadavg()[0], 2)

    _mark("headline")
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            # Each invocation that caches (e.g. the dedup shingle table)
            # creates a NEW cache entry; without draining, repeated runs
            # accumulate dead cached partitions until storage memory thrashes
            # (measured: the 50K-doc scale rung ran 43 s polluted vs 11 s
            # clean). Per-query drain models a real per-job lifecycle.
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    # Composition-cost queries: each invocation runs a FULL multi-batch
    # pipeline with real state IO in a temp dir (dozens of sequential Spark
    # jobs — cost is composition, not a plan; VERDICT r6 blemish 1), so they
    # are timed ONCE to bound total bench wall. Round-over-round deltas on
    # these are judged at the compute-bound sf1 leg below, not here.
    # r11: runs BEFORE the extras loop (section-order note above).
    SINGLE_RUN = [
        "t_corpus_manifest",
        "t_corpus_manifest_stream",  # r7: the streaming twin on the gate
        "t_corpus_manifest_semantic",  # r8: the semantic-stage twin
    ]
    _mark("single_run")
    single_timings: dict[str, float] = {}
    for name in SINGLE_RUN:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        single_timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    # Scale section (VERDICT r1 item 6): dedup at an sf1-equivalent document
    # count (10x the sf0.1 corpus, bounded dup-cluster structure). Reported
    # SEPARATELY from "value" so the headline total stays comparable round
    # over round; tools/scale_stress.py holds the full 50K/500K/5M ladder.
    scale_sf1_dedup: dict | None = None
    scale_sf1_extras: dict | None = None
    scale_sf1_extras_spread: dict[str, list[float]] | None = None
    if os.environ.get("SPARK_GRAFT_SCALE_BENCH", "1") != "0" and sf == 0.1:
        # Guarded: a scale-section failure (disk, cache dir perms) must never
        # cost the headline bench line.
        _mark("scale_sf1_dedup")
        try:
            from f1_datalakehouse_pipeline_spark.operators import dedup
            from tools.scale_stress import scaled_docs

            docs = scaled_docs(spark, sf_dir, factor=10)
            scale: dict[str, float | int] = {"docs": docs.count()}
            t0 = time.time()
            dedup.minhash_lsh_pairs(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
            scale["minhash_lsh_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            dedup.ngram_jaccard_pairs(docs, "doc_id", "text", max_doc_frequency=32).write.format(
                "noop"
            ).mode("overwrite").save()
            scale["ngram_jaccard_capped_sec"] = round(time.time() - t0, 3)
            scale_sf1_dedup = scale
        except Exception as e:  # noqa: BLE001 — diagnostic, not fatal
            scale_sf1_dedup = {"error": f"{type(e).__name__}: {e}"[:200]}

        # sf1 heavy-extras leg (VERDICT r6 item 8): the corpus/dedup extras
        # that matter at scale are scheduler-bound at sf0.1 (fixed multi-job
        # overhead dwarfs their ~1-2 s of real compute), so round-over-round
        # regressions on their COMPUTE are judged here: the SAME registry
        # callables against a cached 10x-scaled documents+embeddings dir
        # (full base schema, load_table-compatible), median-of-3 with
        # min/max spread (VERDICT r8 item 5).
        _mark("scale_sf1_extras")
        try:
            from tools.scale_stress import sf_equiv_dir

            sf1_dir = sf_equiv_dir(spark, sf_dir, factor=10)
            spark.catalog.clearCache()
            leg: dict[str, float | int] = {}
            leg_spread: dict[str, list[float]] = {}
            # r12 ADDITION (never removes/renames): sim_embedding_neardup —
            # the quadratic pair-join path the r11 norm precompute targeted —
            # joins the compute-bound leg so its scaling is driver-recorded.
            for name in (
                "dedup_semantic",
                "dedup_docs_pipeline",
                "t_corpus_manifest",
                "sim_embedding_neardup",
            ):
                samples = []
                for _ in range(RUNS):
                    t0 = time.time()
                    qs[name](spark, sf1_dir).write.format("noop").mode("overwrite").save()
                    samples.append(time.time() - t0)
                    spark.catalog.clearCache()
                leg[name] = round(statistics.median(samples), 3)
                leg_spread[name] = [round(min(samples), 3), round(max(samples), 3)]
            scale_sf1_extras = leg
            scale_sf1_extras_spread = leg_spread
        except Exception as e:  # noqa: BLE001 — diagnostic, not fatal
            scale_sf1_extras = {"error": f"{type(e).__name__}: {e}"[:200]}

    # Round-2+ queries timed SEPARATELY so the headline total stays
    # apples-to-apples with earlier rounds (bench-hygiene rule from r1).
    _mark("extras")
    EXTRA = [
        "tpch_q10_returned_items",
        "tpch_q18_large_orders",
        "a12_grouping_sets",
        "w15_range_frame",
        "asof_tolerance_join",
        "t_token_histogram",
        "dedup_docs_pipeline",
        "ts_interpolate_linear",
        "j10_interval_overlap",
        "t_pack_sequences",
        # r3 additions
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "w18_first_last_value",
        "a20_multi_distinct",
        "ts_resample_ohlc",
        "t_token_doc_frequency",
        # r4 additions
        "contamination_pairs",
        "scd2_splice_backdated",
        "dedup_incremental_novelty",
        "t_repetition_quality",
        "t_pii_redact",
        "t_chunk_documents",
        "tpch_q14_promo_revenue",
        "tpch_q19_disjunctive_revenue",
        "t_profile_columns",
        "t_shuffle_shards",
        "dedup_containment",
        "t_domain_mix",
        "t_repeat_mixture",
        "t_model_quality_score",
        # r5 additions
        "t_token_ids",
        "dedup_semantic",
        "tpch_q13_custdist",
        "tpch_q17_small_qty_revenue",
        "tpch_q21_last_shipper",
        "tpch_q22_rich_inactive",
        "t_bpe_encode",
        # r6 additions
        "t_bpe_table_encode",
        # r7 additions
        "t_psi_buckets",
        # r8 additions (quantized search, robust outliers, quality battery,
        # funnel/cohort analytics, boilerplate strip)
        "sim_sq8_quantized_topk",
        "sim_pq_adc_topk",
        "ts_mad_outliers",
        "dq_expectations",
        "w19_funnel_stages",
        "a21_cohort_retention",
        "t_html_strip",
        "w20_event_transitions",
        "a24_chisq_cells",
        "w21_top_paths",
        "a23_winsorize",
        # r9 additions (residual IVFADC, write-time CDF read, bounded funnel)
        "sim_ivfpq_residual_topk",
        "tablestore_cdf_read",
        "w22_funnel_windowed",
    ]

    # r4 (VERDICT r3 item 7): extras get the same median-of-3 + spread
    # treatment as the headline, so regressions on dedup_docs_pipeline-class
    # queries are judged against observed variance, not single shots.
    extra_timings: dict[str, float] = {}
    extra_spread: dict[str, list[float]] = {}
    for name in EXTRA:
        if name not in qs:
            continue
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        extra_timings[name] = round(statistics.median(samples), 3)
        extra_spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": RUNS,
        "aggregation": "median",
        "queries_spread_min_max": spread,
        "queries_extra": extra_timings,
        "queries_extra_spread_min_max": extra_spread,
        "queries_single_run": single_timings,
        "host_load_1_5_15_start": load_start,
        # r11 section order: headline → single_run → sf1 scale legs → extras
        # (heavy legs no longer inherit the extras churn); each section's
        # 1-min loadavg at entry. section_order is DERIVED from the recorded
        # sections (dict order = execution order), so a skipped scale leg is
        # visibly absent instead of claimed (r11 review finding).
        "section_order": list(section_load),
        "host_load_1m_per_section": section_load,
    }
    if scale_sf1_dedup is not None:
        out["scale_sf1_dedup"] = scale_sf1_dedup
    if scale_sf1_extras is not None:
        out["scale_sf1_extras"] = scale_sf1_extras
    if scale_sf1_extras_spread is not None:
        out["scale_sf1_extras_spread_min_max"] = scale_sf1_extras_spread

    out["host_load_1_5_15_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    # The driver captures only the LAST 2000 chars of bench output and
    # parses the tail as JSON; the full object above exceeds that window, so
    # BENCH_r05–r07 recorded `parsed: null` (VERDICT r7 item 5). Emit a
    # compact, fully-valid JSON object as the LAST line — same required
    # shape (metric/value/unit/queries/sf), headline queries only, ~700
    # chars — so the tail capture always holds one parseable line. The
    # human-readable BENCH_SUMMARY trailer stays for grep, BEFORE the JSON.
    print(
        "BENCH_SUMMARY "
        + json.dumps({"headline_s": out["value"], "sf": out["sf"], "n_queries": len(out["queries"])})
    )
    print(
        json.dumps(
            {
                "metric": out["metric"],
                "value": out["value"],
                "unit": out["unit"],
                "queries": timings,
                "sf": out["sf"],
                "runs_per_query": RUNS,
                "aggregation": "median",
                "full_json": "first line of this output",
            }
        )
    )


if __name__ == "__main__":
    main()
