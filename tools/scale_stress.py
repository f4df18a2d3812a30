"""Scale-stress harness for the dedup paths (VERDICT r1, next-round item 6).

Generates deterministic scaled documents tables (factor x sf0.1's 5000 docs)
with BOUNDED near-dup structure, caches them as parquet under .scale_cache/,
and times the two heavyweight dedup operators end-to-end at each scale:

- minhash_lsh_pairs (signatures -> bands -> bucket join -> verify)
- ngram_jaccard_pairs (inverted-index self-join, with/without the
  max_doc_frequency hot-shingle cap)

Generator structure: each base doc yields ``factor`` variants; variants
2i/2i+1 share a salt and are near-dups of each other (one trailing token
apart), while every 3rd word carries the salt so k=3 word shingles NEVER
collide across salts — cluster size is capped at 2 regardless of factor, so
the true pair count grows linearly and any super-linear runtime is the
operator's fault, not the data's. A --boilerplate mode prepends a shared
unsalted header to every doc, manufacturing hot shingles that hit every
document — the worst case max_doc_frequency exists to cap.

Usage:
  python tools/scale_stress.py [--factors 10,100] [--boilerplate] [--big]
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
from f1_datalakehouse_pipeline_spark.operators import dedup
from f1_datalakehouse_pipeline_spark.sources.testdata import load_table

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_cache")
BOILERPLATE = (
    "permission is hereby granted free of charge to any person obtaining a copy "
    "of this software and associated documentation files to deal in the software "
    "without restriction"
)


def scaled_docs(
    spark: SparkSession, sf_dir: str, factor: int, boilerplate: bool = False
) -> DataFrame:
    """factor x the sf_dir documents table, deterministic, clusters of 2."""
    tag = f"docs_x{factor}{'_bp' if boilerplate else ''}"
    path = os.path.join(CACHE, tag)
    if not os.path.isdir(path):
        base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        out = base.crossJoin(reps)
        salt = (F.col("rep") / 2).cast("long").cast("string")
        # salt every 3rd word: no k=3 word shingle survives across salts
        words = F.split(F.col("text"), " ")
        salted = F.concat_ws(
            " ",
            F.transform(
                words,
                lambda w, i: F.when(i % 3 == 0, F.concat(w, F.lit("q"), salt)).otherwise(w),
            ),
        )
        text = F.when(F.col("rep") % 2 == 1, F.concat(salted, F.lit(" zzvariant"))).otherwise(salted)
        if boilerplate:
            text = F.concat(F.lit(BOILERPLATE + " "), text)
        out = out.select(
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
            text.alias("text"),
        )
        out.repartition(max(32, factor // 8)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def scaled_lineitem(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    """factor x the sf_dir lineitem table (orderkeys preserved so dim joins
    keep their selectivity; linenumber offset keeps rows unique)."""
    path = os.path.join(CACHE, f"lineitem_x{factor}")
    if not os.path.isdir(path):
        base = load_table(spark, sf_dir, "lineitem")
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        out = base.crossJoin(reps).withColumn(
            "l_linenumber", F.col("l_linenumber") + F.col("rep").cast("int") * 10
        ).drop("rep")
        out.repartition(max(32, factor * 4)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_fact_scale(spark: SparkSession, sf_dir: str, factor: int) -> dict:
    """Time the relational core (scan-agg + star join) against a scaled fact
    table with the ORIGINAL dimension tables — the shape of a 100 TB star
    schema where facts dwarf dims."""
    li = scaled_lineitem(spark, sf_dir, factor)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r: dict = {"lineitem_rows": li.count()}

    def pricing():
        price = F.col("l_extendedprice").cast("decimal(12,2)")
        disc = F.col("l_discount").cast("decimal(4,2)")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(price * (1 - disc)).alias("sum_disc_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("n"),
            )
            .count()
        )

    def star():
        rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
            1 - F.col("l_discount").cast("decimal(4,2)")
        )
        return (
            li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(rev).alias("revenue"))
            .count()
        )

    r["pricing_summary_sec"], _ = timed("pricing summary (scan+agg)", pricing)
    r["star_join_sec"], _ = timed("star join (broadcast dims)", star)
    return r


def scaled_embeddings(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    """factor x the embeddings table; replicas are slightly perturbed per rep
    (native array transform) so vectors stay distinct but realistic."""
    path = os.path.join(CACHE, f"embeddings_x{factor}")
    if not os.path.isdir(path):
        base = load_table(spark, sf_dir, "embeddings")
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        out = base.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x + (F.col("rep") % 7).cast("double") * 0.001 * (i % 5).cast("double"),
            ).alias("embedding"),
        )
        out.repartition(max(32, factor)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_ann_scale(spark: SparkSession, sf_dir: str, factor: int) -> dict:
    """Brute-force vs vectorized vs LSH vs IVF over a scaled vector corpus:
    wall time plus recall@5 of the approximate paths against brute truth."""
    from f1_datalakehouse_pipeline_spark.operators import similarity
    from f1_datalakehouse_pipeline_spark.registry_ext import _lsh_planes

    emb = scaled_embeddings(spark, sf_dir, factor)
    queries = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    r: dict = {"vectors": emb.count()}

    def recall(approx_df, truth: set) -> float:
        got = {(x.query_id, x.neighbor_id) for x in approx_df.collect()}
        return round(len(got & truth) / max(len(truth), 1), 3)

    t0 = time.perf_counter()
    truth_rows = similarity.brute_force_topk(emb, queries, k=5).collect()
    r["brute_sec"] = round(time.perf_counter() - t0, 2)
    truth = {(x.query_id, x.neighbor_id) for x in truth_rows}

    t0 = time.perf_counter()
    vec = similarity.brute_force_topk_vectorized(emb, queries, k=5)
    r["vectorized_recall"] = recall(vec, truth)
    r["vectorized_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    lsh = similarity.lsh_bucketed_topk(emb, queries, _lsh_planes(), k=5)
    r["lsh_recall"] = recall(lsh, truth)
    r["lsh_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivf = similarity.ivf_topk(emb, queries, k=5)
    r["ivf_recall"] = recall(ivf, truth)
    r["ivf_sec"] = round(time.perf_counter() - t0, 2)
    print(f"  {r}", flush=True)
    return r


def timed(label: str, thunk) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = thunk()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s ({n} rows)", flush=True)
    return dt, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--big", action="store_true", help="add factor 1000 (~5M docs)")
    ap.add_argument("--boilerplate", action="store_true")
    ap.add_argument("--facts", action="store_true", help="scale the lineitem fact side instead of documents")
    ap.add_argument("--ann", action="store_true", help="scale the embeddings table and measure ANN variants")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    if args.big:
        factors.append(1000)

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    if args.facts:
        for factor in factors:
            print(f"fact factor {factor}:", flush=True)
            results[str(factor)] = run_fact_scale(spark, args.sf_dir, factor)
        print(json.dumps(results, indent=2))
        return

    if args.ann:
        for factor in factors:
            print(f"ann factor {factor}:", flush=True)
            results[str(factor)] = run_ann_scale(spark, args.sf_dir, factor)
        print(json.dumps(results, indent=2))
        return

    # warm codegen/shuffle paths so factor-1 overhead doesn't pollute slopes
    dedup.minhash_lsh_pairs(
        load_table(spark, args.sf_dir, "documents"), "doc_id", "text"
    ).count()

    for factor in factors:
        docs = scaled_docs(spark, args.sf_dir, factor, boilerplate=args.boilerplate)
        n_docs = docs.count()
        print(f"factor {factor}: {n_docs} docs", flush=True)
        r: dict = {"docs": n_docs}
        # boilerplate corpora need the df cap on the MinHash path too — shared
        # shingles otherwise dominate signatures and every band collides
        mh_cap = 32 if args.boilerplate else None
        r["minhash_lsh_sec"], r["minhash_pairs"] = timed(
            f"minhash_lsh (df cap {mh_cap})",
            lambda: dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", max_doc_frequency=mh_cap
            ).count(),
        )
        r["ngram_capped_sec"], r["ngram_capped_pairs"] = timed(
            "ngram_jaccard (df cap 32)",
            lambda: dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", max_doc_frequency=32
            ).count(),
        )
        if args.boilerplate:
            # The quadratic trap quantified WITHOUT running it: each shingle
            # in d docs generates d(d-1)/2 inverted-index candidate rows, so
            # the cost of capped vs uncapped is computable from doc
            # frequencies alone (one extra groupBy, no self-join).
            from f1_datalakehouse_pipeline_spark.operators.dedup import _shingle_table

            df_counts = (
                _shingle_table(docs, "doc_id", "text", 3)
                .groupBy("h")
                .agg(F.count(F.lit(1)).alias("df"))
            )
            pair_rows = F.sum(F.col("df") * (F.col("df") - 1) / 2)
            est = df_counts.agg(
                pair_rows.alias("uncapped"),
                F.sum(
                    F.when(F.col("df") <= 32, F.col("df") * (F.col("df") - 1) / 2).otherwise(0)
                ).alias("capped"),
            ).collect()[0]
            r["est_candidate_rows_uncapped"] = int(est["uncapped"])
            r["est_candidate_rows_capped"] = int(est["capped"])
            print(
                f"  inverted-index candidate rows: uncapped {int(est['uncapped']):,} "
                f"vs df<=32 capped {int(est['capped']):,}",
                flush=True,
            )
        results[str(factor)] = r

    if len(factors) >= 2:
        f0, f1 = str(factors[0]), str(factors[-1])
        ratio = factors[-1] / factors[0]
        for op in ("minhash_lsh_sec", "ngram_capped_sec"):
            growth = results[f1][op] / max(results[f0][op], 1e-9)
            results.setdefault("slopes", {})[op] = {
                "data_ratio": ratio,
                "time_ratio": round(growth, 2),
                "linear_ok": bool(growth <= 2 * ratio),
            }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
