"""Managed-table store: partitioned Parquet directories with atomic-enough
write modes replacing the reference's Iceberg sinks (SURVEY §2.1 S6-S11).

Write-mode parity:
- append            ≙ writeTo().append()            (common.py:389-391)
- overwrite         ≙ writeTo().overwrite()         (common.py:367-369)
- overwrite_partitions ≙ writeTo().overwritePartitions() (common.py:371-387)
  — implemented with Spark's dynamic partitionOverwriteMode, which replaces
  exactly the partitions present in the incoming DataFrame: the incremental
  one-GP rerun is therefore idempotent by construction (SURVEY §7.4.6).

Scale notes: partition columns are the physical layout (year / grand_prix_name
≙ date / tenant at 100 TB); Catalyst prunes reads from filters on them, and a
dynamic overwrite only rewrites the affected leaf directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from f1_datalakehouse_pipeline_spark.schemas import ALL_SCHEMAS, PARTITION_SPECS, conform


class TableStore:
    """A warehouse directory holding one partitioned-parquet dir per table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str, conformed: bool = False) -> DataFrame:
        """Read a managed table; ``conformed=True`` merges file schemas and
        projects to the current registry schema with NULL backfill for
        columns added since the files were written (schema evolution)."""
        if not self.exists(table):
            # empty-table fallback, reference declares per-transform empty
            # schemas for this (qualifying_transform.py:287-309)
            return self.spark.createDataFrame([], ALL_SCHEMAS[table])
        if conformed:
            df = self.spark.read.option("mergeSchema", "true").parquet(self.path(table))
            return conform(df, table, allow_missing=True)
        return self.spark.read.parquet(self.path(table))

    def _writer(self, df: DataFrame, table: str, sort_by: list[str] | None = None):
        out = conform(df, table)
        if sort_by:
            # cluster rows inside each file so parquet min/max statistics
            # prune on these columns (the plain-parquet cousin of Z-ORDER;
            # reference tunes Iceberg file layout, iceberg_manager.py:65-77)
            out = out.sortWithinPartitions(*sort_by)
        w = out.write.format("parquet")
        parts = PARTITION_SPECS.get(table, [])
        if parts:
            w = w.partitionBy(*parts)
        return w

    def append(self, df: DataFrame, table: str) -> None:
        self._writer(df, table).mode("append").save(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        # Full overwrite must be static even when the session default is
        # dynamic, otherwise stale partitions survive.
        self._writer(df, table).option("partitionOverwriteMode", "static").mode(
            "overwrite"
        ).save(self.path(table))

    def overwrite_partitions(
        self, df: DataFrame, table: str, sort_by: list[str] | None = None
    ) -> None:
        """Replace only the partitions present in ``df`` (dynamic mode)."""
        if not PARTITION_SPECS.get(table):
            # unpartitioned table: partition-overwrite degenerates to overwrite
            self.overwrite(df, table)
            return
        self._writer(df, table, sort_by).option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").save(self.path(table))


def compact(store: TableStore, table: str, target_partitions: int = 1) -> None:
    """OPTIMIZE analogue: rewrite a table's files into ``target_partitions``
    files per partition directory (reference tunes Iceberg target file sizes,
    iceberg_manager.py:65-77; on plain parquet, compaction is a rewrite).

    Uses a staged read→coalesced overwrite; at 100 TB this runs per-partition
    (the dynamic overwrite only rewrites partitions present in the batch), so
    compaction of one day/GP never touches the rest of the table.
    """
    df = store.read(table)
    pdf = df.coalesce(max(1, target_partitions))
    # materialize to a temp dir first: the overwrite would otherwise delete
    # its own input files mid-scan
    import tempfile

    with tempfile.TemporaryDirectory(dir=store.root) as tmp:
        staging = f"{tmp}/stage"
        pdf.write.parquet(staging)
        staged = store.spark.read.parquet(staging)
        store.overwrite(staged, table)
