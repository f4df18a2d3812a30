"""Managed-table store: partitioned Parquet directories with transactional
write modes replacing the reference's Iceberg sinks (SURVEY §2.1 S6-S11).

Write-mode parity:
- append            ≙ writeTo().append()            (common.py:389-391)
- overwrite         ≙ writeTo().overwrite()         (common.py:367-369)
  — transactional: the new table contents are written to a fresh versioned
  directory and published by an ATOMIC symlink swap (os.replace), matching
  the Iceberg commit guarantee (iceberg_manager.py:190-313) that a failed
  write never corrupts the live table: readers see the old version until the
  single rename, and a crash mid-write leaves only an orphan staging dir.
- overwrite_partitions ≙ writeTo().overwritePartitions() (common.py:371-387)
  — implemented with Spark's dynamic partitionOverwriteMode, which replaces
  exactly the partitions present in the incoming DataFrame: the incremental
  one-GP rerun is therefore idempotent by construction (SURVEY §7.4.6).
  Atomicity here is per-partition-directory (Hive semantics), not
  whole-commit.

Because a full overwrite lands in a NEW version directory, read-then-
overwrite-same-table plans (the SCD2 incremental merge) are safe without any
driver-side materialization: the scan keeps reading the old version while the
write builds the new one.

Scale notes: partition columns are the physical layout (year / grand_prix_name
≙ date / tenant at 100 TB); Catalyst prunes reads from filters on them, and a
dynamic overwrite only rewrites the affected leaf directories. The version
swap is a constant-time metadata operation regardless of table size.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from f1_datalakehouse_pipeline_spark.schemas import ALL_SCHEMAS, PARTITION_SPECS, conform

# versions kept per table after a transactional overwrite: the current one
# plus this many predecessors (lazily-evaluated DataFrames created against an
# older version keep working for one generation; Iceberg snapshots ≙ same idea)
_KEEP_VERSIONS = 1


class TableStore:
    """A warehouse directory holding one partitioned-parquet dir per table.

    The live path ``<root>/<table>`` is either a plain directory (legacy /
    append-created layout) or a symlink to ``<root>/.versions/<table>/<id>``
    after the first transactional overwrite.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def _version_root(self, table: str) -> str:
        return os.path.join(self.root, ".versions", table)

    def _publish(self, table: str, version_dir: str) -> None:
        """Atomically point ``<root>/<table>`` at ``version_dir``.

        POSIX ``rename(2)`` over an existing symlink is atomic: any
        concurrent reader resolves either the old or the new target, never a
        partial state. The only non-atomic case is the one-time migration of
        a legacy real directory, which is moved aside first.
        """
        live = self.path(table)
        if os.path.isdir(live) and not os.path.islink(live):
            # one-time migration: preserve the old contents as a version
            legacy = os.path.join(self._version_root(table), f"legacy-{uuid.uuid4().hex[:8]}")
            os.makedirs(os.path.dirname(legacy), exist_ok=True)
            os.rename(live, legacy)
        tmp_link = os.path.join(self.root, f".{table}.link.{uuid.uuid4().hex[:8]}")
        os.symlink(version_dir, tmp_link)
        os.replace(tmp_link, live)  # the commit point
        self._gc_versions(table, keep_target=os.path.realpath(version_dir))

    def _gc_versions(self, table: str, keep_target: str) -> None:
        """Best-effort prune of superseded version dirs (keep current +
        ``_KEEP_VERSIONS`` most recent others, by mtime)."""
        vroot = self._version_root(table)
        if not os.path.isdir(vroot):
            return
        try:
            others = [
                os.path.join(vroot, d)
                for d in os.listdir(vroot)
                if os.path.realpath(os.path.join(vroot, d)) != keep_target
            ]
            others.sort(key=os.path.getmtime, reverse=True)
        except OSError:
            return
        for stale in others[_KEEP_VERSIONS:]:
            shutil.rmtree(stale, ignore_errors=True)

    def versions(self, table: str) -> list[str]:
        """Version directories for ``table``, newest first (current included).
        Plain-parquet time travel: the transactional overwrite keeps the
        current version plus ``_KEEP_VERSIONS`` predecessors (≙ Iceberg
        snapshots, iceberg_manager.py history; bounded retention instead of
        unbounded snapshot log)."""
        live = self.path(table)
        vroot = self._version_root(table)
        if not os.path.isdir(vroot):
            return [live] if os.path.isdir(live) else []
        current = os.path.realpath(live)
        dirs = [os.path.join(vroot, d) for d in os.listdir(vroot)]
        dirs.sort(key=lambda p: (os.path.realpath(p) != current, -os.path.getmtime(p)))
        return dirs

    def read_version(self, table: str, n_back: int = 0, conformed: bool = False) -> DataFrame:
        """Read the table as of ``n_back`` overwrites ago (0 = current).

        Raises IndexError past the retention horizon — deliberately loud:
        silently serving current data for a time-travel read would corrupt
        any reproducibility claim built on it.
        """
        vs = self.versions(table)
        if n_back >= len(vs):
            raise IndexError(
                f"{table}: only {len(vs)} retained versions, asked for n_back={n_back}"
            )
        df = self.spark.read.option("mergeSchema", "true").parquet(vs[n_back])
        return conform(df, table, allow_missing=True) if conformed else df

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

    def overwrite(
        self,
        df: DataFrame,
        table: str,
        sort_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
    ) -> None:
        """Transactional full overwrite: write → (implicit) validate → atomic
        swap. If the write job fails, no swap happens and the live table is
        untouched; the half-written staging dir is orphaned under .versions
        and reaped by the next successful overwrite's GC.

        ``cluster_by``: Z-order the write on these (integer-valued) columns —
        range-partition + sort on the Morton interleave key so EVERY listed
        column gets tight per-file min/max stats (functions/zorder.py; the
        plain-parquet OPTIMIZE ZORDER BY). Mutually exclusive with
        ``sort_by`` (single-dimension clustering)."""
        if cluster_by:
            from pyspark.sql import functions as F

            from f1_datalakehouse_pipeline_spark.functions.zorder import morton_interleave

            key = morton_interleave([F.col(c) for c in cluster_by])
            n = max(2, self.spark.sparkContext.defaultParallelism)
            df = (
                df.withColumn("__z", key)
                .repartitionByRange(n, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        version_dir = os.path.join(
            self._version_root(table), f"v-{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(os.path.dirname(version_dir), exist_ok=True)
        # Full overwrite must be static even when the session default is
        # dynamic, otherwise stale partitions would survive inside the fresh
        # version dir.
        self._writer(df, table, sort_by).option("partitionOverwriteMode", "static").mode(
            "overwrite"
        ).save(version_dir)
        self._publish(table, version_dir)

    def merge_upsert(self, updates: DataFrame, table: str, keys: list[str]) -> None:
        """MERGE INTO semantics on plain parquet: rows matching on ``keys``
        are replaced by the update row, unmatched updates insert, unmatched
        existing rows persist — committed via the transactional overwrite
        (write-new-version + atomic swap), so the merge is all-or-nothing
        like Iceberg's MERGE (iceberg_manager.py commit path). ``updates``
        must be unique per key. The anti-join + union runs distributed; the
        read-then-overwrite cycle is safe because the write lands in a fresh
        version dir while the scan reads the live one.
        """
        current = self.read(table)
        kept = current.join(updates.select(*keys), keys, "left_anti")
        merged = kept.unionByName(updates.select(*current.columns))
        self.overwrite(merged, table)

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

    The transactional overwrite writes the coalesced copy into a fresh
    version dir while the scan keeps reading the live version, then publishes
    with one atomic rename — no intermediate staging copy needed. At 100 TB
    this runs per-partition (a dynamic overwrite only rewrites partitions
    present in the batch), so compaction of one day/GP never touches the rest
    of the table.
    """
    df = store.read(table)
    store.overwrite(df.coalesce(max(1, target_partitions)), table)
