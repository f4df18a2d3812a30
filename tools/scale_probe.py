"""Compute-bound scaling probe (VERDICT r11 item 5): time registry queries
at the 10x-scaled dir under the CURRENT $SPARK_GRAFT_CPUS.

Usage: SPARK_GRAFT_CPUS=8 python tools/scale_probe.py [runs] [q1 q2 ...]
Prints one JSON line per query: {query, cpus, median_s, samples}.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
queries = sys.argv[2:] or ["dedup_semantic", "sim_embedding_neardup"]

from f1_datalakehouse_pipeline_spark import get_spark, registry  # noqa: E402
from tools.scale_stress import sf_equiv_dir  # noqa: E402

spark = get_spark("scale-probe")
spark.sparkContext.setLogLevel("ERROR")
cpus = spark.sparkContext.master
qs = registry.queries()
sf1 = sf_equiv_dir(spark, "/root/testdata/sf0.1", factor=10)

for name in queries:
    qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    samples = []
    for _ in range(runs):
        t0 = time.time()
        qs[name](spark, sf1).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps({
        "query": name, "master": cpus,
        "median_s": round(statistics.median(samples), 3), "samples": samples,
        "load1": round(os.getloadavg()[0], 2),
    }), flush=True)
