"""The TableStore change feed as a REAL ``spark.readStream`` source, via
PySpark 4's Python DataSource API — the Spark-native half of the CDC story
(streaming/cdc_source.py is the pull-loop half for callers that drive their
own micro-batches):

    register_table_changes_source(spark)
    stream = (
        spark.readStream.format("table_changes")
        .option("root", warehouse_root)
        .option("table", "sessions_silver")
        .option("keys", "session_key")
        .load()
    )
    stream.writeStream.foreachBatch(apply).option("checkpointLocation", ...)

Offsets ARE commit ids: ``initialOffset`` is the oldest retained version
(its content is the initial snapshot, not delivered as changes — the same
contract as ChangeFeedConsumer), ``latestOffset`` is the newest COMMITTED
version, and ``partitions(start, end)`` plans one input partition per
change file of every commit in the span — so executors read each commit's
WRITE-TIME ``_changes/`` parquet directly (cost ∝ |changes|, never
∝ |table|) and Spark's own offset log provides exactly-once batch replay
on restart.

Admission control (r11, the Delta ``maxFilesPerTrigger`` /
``maxBytesPerTrigger`` shapes): option ``maxCommitsPerBatch=N`` caps each
micro-batch at N commits; ``maxBytesPerBatch=B`` additionally stops
admitting once the commits' cumulative change-file bytes would exceed B
(soft cap — at least one commit always flows, so an oversized commit can
never stall the stream). The Python
DataSource API has no ``SupportsAdmissionControl`` (``latestOffset`` takes
no start offset and no ReadLimit), so the cap rides on the long-lived
reader instance: ``latestOffset`` answers at most N commits past the
newest offset Spark has planned or committed a batch through (tracked via
``partitions``/``commit``, seeded by ``initialOffset`` on a fresh query) —
and never mutates that base itself, so repeated latest-offset samples
between plans (availableNow latching, no-data ticks) are idempotent. The one uncoverable case: a restart whose last batch DID
commit plans its first backlog batch uncapped (the reader is fresh and the
API reveals the WAL position only after ``latestOffset`` has answered);
every subsequent batch is capped. Trigger interaction (r11 review
finding): Python sources fall back to SINGLE-BATCH execution under
``Trigger.AvailableNow`` (no SupportsTriggerAvailableNow), so a capped
source's availableNow run drains AT MOST one batch's worth per query run
— after an uncommitted-batch replay seeded the cap, that run stops with
backlog remaining. Capped catch-up consumers must either loop
availableNow runs until an empty drain (the restart test's shape) or run
a processingTime trigger; uncapped sources drain fully either way. ``latestOffset`` also never samples a
current-but-uncommitted version dir (the millisecond swap-to-sentinel
window, or a publish_many version later rolled back): it advances only to
the newest version carrying the commit sentinel, lagging one micro-batch
instead of poisoning Spark's WAL with an offset that may vanish.

Planning is strict where the pull loop is lenient: a commit in the span
with no readable change files (a plain ``overwrite()``, whose delta is an
arbitrary rewrite with no row-level labeling, or a key-set mismatch against
the writer's ``_keys.json`` sidecar) raises loudly instead of silently
falling back to a snapshot diff — an executor-side file reader has no
snapshot-diff tier, and serving a partial feed would corrupt downstream
state. The parent-stamp hole check from ``table_changes_feed`` runs here
too (r10 crash-injection finding).

Reference anchor: the reference engine has no streaming or CDC (SURVEY
§2.9); this is the Delta ``readStream.option("readChangeFeed", true)``
shape on the plain-parquet TableStore.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import IntegerType, StringType, StructType

from f1_datalakehouse_pipeline_spark.schemas import ALL_SCHEMAS
from f1_datalakehouse_pipeline_spark.sources.tables import TableStore


def feed_schema(table: str) -> StructType:
    """Table schema + the CDF stamp columns (the table_changes_feed shape)."""
    s = StructType(list(ALL_SCHEMAS[table].fields))
    s = s.add("_change_type", StringType()).add("_commit_id", StringType())
    return s.add("_commit_ordinal", IntegerType())


@dataclass
class _ChangeFilePartition(InputPartition):
    path: str
    commit_id: str
    ordinal: int


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.root = options["root"]
        self.table = options["table"]
        keys = options.get("keys", "")
        self.key_cols = [k.strip() for k in keys.split(",") if k.strip()] or None
        self.schema_fields = list(schema.fields)
        mc = options.get("maxcommitsperbatch", options.get("maxCommitsPerBatch"))
        self.max_commits = int(mc) if mc is not None else None
        if self.max_commits is not None and self.max_commits < 1:
            raise ValueError(
                f"maxCommitsPerBatch must be >= 1, got {self.max_commits}"
            )
        mb = options.get("maxbytesperbatch", options.get("maxBytesPerBatch"))
        self.max_bytes = int(mb) if mb is not None else None
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError(
                f"maxBytesPerBatch must be >= 1, got {self.max_bytes}"
            )
        # Delta's startingVersion shape: the feed's initial position (that
        # commit is the initial snapshot; only LATER commits serve as rows).
        self.starting_commit = options.get(
            "startingcommit", options.get("startingCommit")
        )
        # Newest commit id Spark has PLANNED a batch through (updated by
        # partitions()/commit(), seeded by initialOffset) — the admission
        # cap's base. latestOffset derives from it WITHOUT mutating, so
        # however many times Spark samples the latest offset between plans
        # (availableNow latches, no-data ticks), the answer is the same
        # capped end and the cap can never double-advance.
        self._last_end: str | None = None
        # Consecutive latestOffset samples that found NO committed version:
        # a mid-publish window lasts milliseconds, so a short run of empty
        # samples lags harmlessly — a long run means the table was removed
        # and must fail loudly, not stall forever (r11 review finding).
        self._empty_samples = 0

    def _committed_versions(self) -> list[str]:
        """Offset-servable versions — ONE definition, owned by the store
        (``TableStore.committed_versions``): sentinel-committed ``.versions/``
        dirs only. Excludes the swap-to-sentinel window AND the plain
        (append-created) live dir, whose basename is not a stable offset
        identity (the first overwrite renames it to ``legacy-<hex>``, which
        would poison any checkpoint holding the old id)."""
        return TableStore.committed_versions(self.root, self.table)

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        vs = self._committed_versions()
        if not vs:
            raise ValueError(
                f"{self.table}: no committed versions yet — start the "
                "stream after the producer's first commit"
            )
        names = [os.path.basename(v) for v in vs]  # newest-first
        if self.starting_commit is not None:
            # Delta's startingVersion shape: begin the feed AT this commit
            # (its content is the initial snapshot; changes AFTER it serve).
            if self.starting_commit not in names:
                raise ValueError(
                    f"{self.table}: startingCommit {self.starting_commit!r} "
                    f"is not a retained committed version (retained: {names})"
                    " — it was vacuumed, rolled back, or never existed"
                )
            first = self.starting_commit
        else:
            first = names[-1]  # oldest retained
        self._last_end = first  # seed the admission cap for a fresh query
        return {"commit_id": first}

    # A publish window is milliseconds; this many consecutive empty
    # latest-offset samples means the table is GONE, not mid-swap.
    _MAX_EMPTY_SAMPLES = 10

    def latestOffset(self) -> dict:
        vs = self._committed_versions()
        if not vs:
            self._empty_samples += 1
            if (
                self._last_end is not None
                and self._empty_samples < self._MAX_EMPTY_SAMPLES
            ):
                # mid-publish window on a table we have served before: lag
                # one micro-batch rather than fail the query
                return {"commit_id": self._last_end}
            # a restart skips initialOffset, so the missing-table diagnosis
            # must be just as clear here (wrong root option, renamed table);
            # a long run of empty samples on a previously-served table means
            # it was removed — fail loudly instead of stalling forever
            raise ValueError(
                f"{self.table}: no committed versions under {self.root!r} — "
                "wrong 'root'/'table' option, or the table was removed"
                + (
                    f" (empty for {self._empty_samples} consecutive samples "
                    "after serving commits)"
                    if self._last_end is not None
                    else ""
                )
            )
        self._empty_samples = 0
        names = [os.path.basename(v) for v in vs]  # newest-first
        end = names[0]
        if (
            (self.max_commits is not None or self.max_bytes is not None)
            and self._last_end in names
        ):
            base = names.index(self._last_end)
            # pending commits, oldest first: names[base-1], ..., names[0].
            # Admit until either cap trips; always admit at least one commit
            # (a single commit larger than max_bytes must still flow, the
            # Delta maxBytesPerTrigger soft-cap semantics).
            admitted = 0
            spent = 0
            end = self._last_end
            for i in range(base - 1, -1, -1):
                if self.max_commits is not None and admitted >= self.max_commits:
                    break
                if self.max_bytes is not None:
                    nxt = self._commit_bytes(vs[i])
                    if admitted > 0 and spent + nxt > self.max_bytes:
                        break
                    spent += nxt
                admitted += 1
                end = names[i]
        return {"commit_id": end}

    def _commit_bytes(self, version_dir: str) -> int:
        """Total size of one commit's servable change files (0 when the
        commit carries none — the planner raises for those later; the size
        cap should not mask that error with an infinite stall)."""
        total = 0
        for f in TableStore.readable_change_files(version_dir, self.key_cols):
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
        return total

    def partitions(self, start: dict, end: dict):
        s_id, e_id = start["commit_id"], end["commit_id"]
        # Spark is planning a batch through e_id — that is now the newest
        # offset it owns, whatever this reader previously answered (also
        # seeds the cap when a restart replays a WAL-planned batch before
        # any latestOffset call on this fresh reader instance).
        self._last_end = e_id
        if s_id == e_id:
            return []
        vs = TableStore.list_versions(self.root, self.table)
        names = [os.path.basename(v) for v in vs]
        if s_id not in names:
            raise ValueError(
                f"{self.table}: offset commit {s_id!r} is no longer retained "
                f"(vacuumed past the replay horizon; retained: {names}) — "
                "resync from a snapshot and restart with a fresh checkpoint"
            )
        if e_id not in names:
            # The batch's end was planned from an earlier listing. Two ways
            # here: the retention horizon moved past a slow consumer, or
            # latestOffset sampled the live symlink during the milliseconds
            # a publish_many batch held it at a version whose commit was
            # then ROLLED BACK (the rollback de-commits the dir, so it is
            # never listed again — serving its rows would resurrect an
            # aborted commit). Spark's WAL replays the same end offset on
            # every restart, so the only remedy is a fresh checkpoint.
            raise ValueError(
                f"{self.table}: offset commit {e_id!r} is no longer retained "
                "(vacuumed past the horizon, or it was a rolled-back "
                "cross-table publish) — resync downstream state and restart "
                "the stream with a FRESH checkpoint"
            )
        lo, hi = names.index(e_id), names.index(s_id)  # newest-first listing
        parts: list[_ChangeFilePartition] = []
        for ordinal, i in enumerate(range(hi - 1, lo - 1, -1), start=1):
            newer, older = vs[i], vs[i + 1]
            # hole detection + file readability are tables.py's shared
            # definitions (chain_hole / readable_change_files) — the batch
            # CDF read and this planner can never drift on either gate
            p = TableStore.chain_hole(newer, older)
            if p is not None:
                raise ValueError(
                    f"{self.table}: retained version chain has a hole — "
                    f"{os.path.basename(newer)} records parent {p!r} but the "
                    f"next retained version is {os.path.basename(older)}; "
                    "commits were lost, resync from a snapshot"
                )
            files = TableStore.readable_change_files(newer, self.key_cols)
            if not files:
                raise ValueError(
                    f"{self.table}: commit {os.path.basename(newer)} carries "
                    "no change files readable under keys "
                    f"{self.key_cols} (plain overwrite, or a different "
                    "writer key set) — this source serves write-time change "
                    "files only; use TableStore.table_changes() for the "
                    "snapshot-diff tier, or resync"
                )
            parts += [
                _ChangeFilePartition(f, os.path.basename(newer), ordinal)
                for f in files
            ]
        return parts

    def commit(self, end: dict) -> None:
        # retention is the store's concern; nothing to release here — but a
        # committed batch is authoritative for the admission cap's base
        self._last_end = end["commit_id"]

    # -- executor-side read ------------------------------------------------
    def read(self, partition: _ChangeFilePartition):
        """Yield the change file as Arrow RecordBatches, one per parquet
        row group (zero per-row Python, bounded memory — a multi-GB change
        file streams through in row-group-sized pieces instead of one
        whole-file batch), columns cast to the Arrow types Spark expects
        for the declared schema. Timestamps in the files are naive (legacy
        INT96 → ns) but ARE UTC instants — Spark always writes
        UTC-adjusted — so the cast to timestamp[us, UTC] is a
        relabel+truncate, never a wall-clock shift. A column missing from
        an old file (schema widened since) backfills as typed NULLs."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            n = len(batch)
            arrays, names = [], []
            for f in self.schema_fields:
                target = to_arrow_type(f.dataType)
                if f.name == "_commit_id":
                    col = pa.array([partition.commit_id] * n, type=target)
                elif f.name == "_commit_ordinal":
                    col = pa.array([partition.ordinal] * n, type=target)
                elif f.name in batch.schema.names:
                    col = batch.column(f.name)
                    if pa.types.is_timestamp(col.type) and col.type.tz is None:
                        # relabel the naive UTC instants before the unit cast
                        col = col.cast(pa.timestamp(col.type.unit, tz="UTC"))
                    col = col.cast(target)
                else:
                    col = pa.nulls(n, type=target)
                arrays.append(col)
                names.append(f.name)
            yield pa.RecordBatch.from_arrays(arrays, names)


class TableChangesDataSource(DataSource):
    """``format("table_changes")`` — options: ``root`` (warehouse dir),
    ``table``, ``keys`` (comma list the writer's change files were labeled
    under; omit for key-agnostic feeds), ``maxCommitsPerBatch`` /
    ``maxBytesPerBatch`` (admission control — see the module docstring;
    bytes are of each commit's servable change files, soft cap: a single
    oversized commit still flows), ``startingCommit`` (begin the feed AT
    this retained commit instead of the oldest — the Delta
    ``startingVersion`` shape; only later commits serve as change rows)."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> StructType:
        return feed_schema(self.options["table"])

    def streamReader(self, schema: StructType) -> TableChangesStreamReader:
        return TableChangesStreamReader(schema, dict(self.options))


def register_table_changes_source(spark) -> None:
    """Idempotently register the ``table_changes`` streaming format."""
    spark.dataSource.register(TableChangesDataSource)
