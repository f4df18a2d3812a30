"""Interleaved A/B headline bench (VERDICT r7 item 2).

Times ONLY the bench.py HEADLINE set — warm-up at sf0.001, median of 3
materializations per query with per-run cache drain, exactly bench.py's
protocol — for an arbitrary repo root (a git worktree of some commit), so
two commits can be compared by ALTERNATING runs on the same host in the
same session:

    git worktree add /tmp/r6close <r6-close-sha>
    for i in 1 2 3; do
      python tools/ab_bench.py /tmp/r6close      # A
      python tools/ab_bench.py /root/repo        # B
    done

Each invocation is its own process (fresh JVM, fresh codegen cache), so
ordering effects are limited to host-level drift — which alternation
averages out. Prints ONE JSON line {repo, value, queries, sf}.

Why this exists: r6→r7 the driver-captured headline moved 10.927→12.699 s
with zero headline plan changes, and the host-swing explanation (PERF_NOTES
r4/r6/r7 document a 16.6–21.0 s envelope on identical code) had no
interleaved same-host A/B of the headline set itself to back it — two
consecutive regressions would have left the claim unfalsifiable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

RUNS = 3

# bench.py's HEADLINE list, frozen here so BOTH sides time the same set
# even if a future round edits bench.py (the A side's bench.py predates it).
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
    repo = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else "/root/repo"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sys.path.insert(0, repo)

    from f1_datalakehouse_pipeline_spark import get_spark, registry

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(samples), 3)

    print(
        json.dumps(
            {
                "repo": repo,
                "value": round(sum(timings.values()), 3),
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
