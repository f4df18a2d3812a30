"""Bucketed tables: shuffle-free co-located joins and aggregations.

The 100 TB lever the plain-parquet TableStore can't express: pre-hash-
partitioning rows into a fixed number of buckets ON WRITE so that every
subsequent join or aggregation on the bucket key reads pre-partitioned data
and plans NO Exchange. The reference gets the same effect from Iceberg's
bucket partition transform (iceberg_manager.py bucket spec); Spark-native
bucketing (bucketBy + saveAsTable) is the idiomatic equivalent and feeds the
catalog's output-partitioning metadata straight into Catalyst.

Cost model: one up-front shuffle at write time buys ZERO shuffles on every
fact-fact join keyed by the bucket column — the classic amortization for
fact tables joined repeatedly (orders ⋈ lineitem on orderkey at every silver
rebuild). Bucket counts must match across tables for the exchange-free plan;
sortBy within buckets additionally removes the Sort from SortMergeJoin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed catalog table (external when ``path`` given).

    Bucketing metadata lives in the session catalog — reads MUST go through
    ``spark.table(name)`` (a raw path read would lose the bucket spec and
    re-shuffle).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
