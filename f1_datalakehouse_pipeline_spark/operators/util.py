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
    # Decide off the FILE LISTING, not df.rdd.getNumPartitions(): the RDD
    # conversion forces plan analysis + a physical RDD per call. inputFiles()
    # is analysis-only; a many-file input is already parallel enough, and a
    # non-file source (empty list) just takes the repartition.
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — conservative fallback
        n_files = 0
    if n_files >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
