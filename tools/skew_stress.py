"""Skew-stress rung for the explicit salting operators (VERDICT r3 item 8).

Builds a deliberately pathological fact table — 90% of all rows carry ONE
join key — and measures the shuffle imbalance and wall time of:

- plain shuffle join vs ``skew.salted_join`` (dim replicated per salt), and
- plain groupBy vs ``skew.salted_aggregate`` (two-phase partial/final),

with per-shuffle-partition row-count histograms (max-partition share = the
straggler proxy: the slowest task's share of the stage's work; task wall
time is proportional to rows owned for these hash-join/agg stages).

AQE note, measured honestly: AQE's skewedJoin CAN split the hot partition
for a terminal sort-merge join, which is why the plain-join case is run
with AQE both ON and OFF. The explicit salted forms exist for the cases
AQE can't rewrite — when the join output must stay co-partitioned for a
downstream stage, or for aggregation state (AQE never splits a groupBy
partition). The aggregate A/B runs with AQE ON for both sides.

Usage:
  python tools/skew_stress.py [--rows 20000000] [--keys 1024] [--salt 32]

Prints one JSON line; paste the result into PERF_NOTES.md.
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
from f1_datalakehouse_pipeline_spark.operators import skew


def skewed_fact(spark: SparkSession, rows: int, keys: int) -> DataFrame:
    """90% of rows on key 0, the rest uniform over the other ``keys - 1``."""
    return spark.range(rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(keys - 1)) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def partition_histogram(df: DataFrame, *cols: str) -> dict:
    """Row-count distribution over hash-shuffle partitions keyed by ``cols``
    (the exact distribution a shuffle on those keys produces)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sizes = (
        df.repartition(n, *[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in sizes), reverse=True)
    total = sum(counts)
    return {
        "partitions_nonempty": len(counts),
        "max_partition_share": round(counts[0] / total, 4),
        "top4_shares": [round(c / total, 4) for c in counts[:4]],
    }


def timed(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=1024)
    ap.add_argument("--salt", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {"rows": args.rows, "keys": args.keys, "n_salt": args.salt}

    fact = skewed_fact(spark, args.rows, args.keys)
    dim = spark.range(args.keys).select(
        F.col("id").alias("k"), F.concat(F.lit("d-"), F.col("id")).alias("attr")
    )

    # shuffle-partition ownership: the straggler's share before/after salting
    out["hist_plain_by_k"] = partition_histogram(fact, "k")
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(args.salt))
    )
    out["hist_salted_by_k_salt"] = partition_histogram(salted, "k", "__salt")

    # join A/B: dim forced OFF broadcast so both sides actually shuffle
    # (salted_join targets dims just above the broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        plain = fact.join(dim, "k").select(F.sum("v").alias("s"))
        out[f"join_plain_aqe_{aqe}_sec"] = timed(plain)
        slt = skew.salted_join(fact, dim, ["k"], n_salt=args.salt).select(
            F.sum("v").alias("s")
        )
        out[f"join_salted_aqe_{aqe}_sec"] = timed(slt)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # aggregate A/B (AQE on — it never splits a groupBy partition): heavy
    # per-group state via collect_set-sized distinct counting is the
    # pathological case; use countDistinct to keep result comparable
    plain_agg = fact.groupBy("k").agg(F.countDistinct("v").alias("nv"))
    out["agg_plain_sec"] = timed(plain_agg)
    salted_agg = skew.salted_aggregate(
        fact.withColumn("cnt", F.lit(1)), ["k"], {"cnt": "sum"}, n_salt=args.salt
    )
    out["agg_salted_sum_sec"] = timed(salted_agg)
    # exact-distinct two-phase: distinct (k, v) first (salt implicit in v),
    # then count — the scalable rewrite salted_aggregate documents
    twophase = (
        fact.select("k", "v").distinct().groupBy("k").agg(F.count("v").alias("nv"))
    )
    out["agg_distinct_twophase_sec"] = timed(twophase)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
