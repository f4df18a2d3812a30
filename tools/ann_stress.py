"""ANN recall/latency rung (r4): IVF vs exhaustive at scaled vector counts.

The recall unit test proves IVF correctness on tiny data; this rung measures
the SCALE tradeoff the operator exists for — wall time and recall@k of
``ivf_topk`` (sampled and distributed trainers) against the vectorized
brute-force baseline on deterministically synthesized corpora (uniform
hash-derived vectors: the WORST case for a coarse quantizer, since there is
no cluster structure to exploit — reported recall is therefore a floor, not
a cherry-pick).

Usage:
  python tools/ann_stress.py [--sizes 20000,100000] [--dim 64] [--k 10]
                             [--queries 64] [--lists 64] [--probe 8]

Prints one JSON line; paste into PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark import get_spark
from f1_datalakehouse_pipeline_spark.operators import similarity


def scaled_embeddings(spark: SparkSession, n: int, dim: int) -> DataFrame:
    """Deterministic uniform vectors in [-1, 1)^dim (hash-derived — no RNG
    state, identical across runs/partitionings)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(20001)) - F.lit(10000)
            ).cast("double")
            / F.lit(10000.0),
        ).alias("embedding"),
    )


def topk_sets(df: DataFrame) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20000,100000")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--lists", type=int, default=64)
    ap.add_argument("--probe", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("ann-stress")
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {
        "dim": args.dim,
        "k": args.k,
        "n_queries": args.queries,
        "n_lists": args.lists,
        "n_probe": args.probe,
        "sizes": [],
    }

    for n in [int(s) for s in args.sizes.split(",")]:
        emb = scaled_embeddings(spark, n, args.dim)
        # materialize once so generation cost is excluded from timings
        emb = emb.cache()
        emb.count()
        queries = emb.filter(F.col("vec_id") < args.queries)

        # warm up codegen/Arrow once so the first timed call isn't charged
        # JIT cost (the 20K-vs-100K inversion observed without this)
        similarity.brute_force_topk_vectorized(
            emb.limit(512), queries.limit(4), k=3
        ).count()

        t0 = time.time()
        exact = topk_sets(
            similarity.brute_force_topk_vectorized(emb, queries, k=args.k)
        )
        brute_sec = round(time.time() - t0, 3)

        row: dict = {"n_vectors": n, "brute_vectorized_sec": brute_sec}

        # one-shot form (index rebuilt inside the call — the naive usage)
        t0 = time.time()
        oneshot = topk_sets(
            similarity.ivf_topk(
                emb, queries, k=args.k, n_lists=args.lists, n_probe=args.probe
            )
        )
        row["ivf_oneshot_sec"] = round(time.time() - t0, 3)
        hits = sum(len(oneshot.get(q, set()) & exact[q]) for q in exact)
        row[f"ivf_recall@{args.k}"] = round(hits / (len(exact) * args.k), 4)

        # amortized form: train + vectorized assign ONCE (persisted), then
        # serve query batches from the prebuilt index
        t0 = time.time()
        centroids = similarity.ivf_train(emb, n_lists=args.lists)
        assigned = similarity.ivf_assign(
            emb, centroids, method="vectorized"
        ).cache()
        assigned.count()
        row["ivf_build_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        amort = topk_sets(
            similarity.ivf_query(
                assigned, centroids, queries, k=args.k, n_probe=args.probe
            )
        )
        row["ivf_query_batch_sec"] = round(time.time() - t0, 3)
        hits = sum(len(amort.get(q, set()) & exact[q]) for q in exact)
        row[f"ivf_amortized_recall@{args.k}"] = round(
            hits / (len(exact) * args.k), 4
        )
        assigned.unpersist()
        out["sizes"].append(row)
        emb.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
