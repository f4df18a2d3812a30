"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the session's default parallelism when the input has
    fewer partitions (e.g. a single parquet file feeding a compute-heavy
    projection — locally that strands all but one core).

    At 100 TB inputs already have thousands of partitions, so this is a no-op
    there; it only pays the shuffle when parallelism is otherwise wasted.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
