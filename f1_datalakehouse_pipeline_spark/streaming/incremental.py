"""Structured Streaming ingestion — the streaming evolution of the
reference's weekly INCREMENTAL batch mode (SURVEY §2.9: the reference has no
streaming; this is the natural extension, not a parity requirement).

Pattern: file-source ``readStream`` over the bronze landing directory →
``foreachBatch`` running the SAME silver transforms and idempotent
partition-overwrite/SCD-merge writes the batch pipeline uses. Because each
micro-batch reuses the batch write semantics, replays are idempotent and the
batch/streaming code paths cannot drift.

Also provides a windowed+watermarked event aggregation, the canonical
late-data-tolerant streaming operator shape.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def foreach_batch_upsert(
    stream_df: DataFrame,
    upsert: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run ``upsert(batch_df, batch_id)`` per micro-batch with checkpointing.

    ``available_now=True`` drains everything currently in the source then
    stops — the streaming equivalent of one INCREMENTAL batch run, and what
    tests use. Long-running deployments pass False and a processing trigger.
    """
    writer = stream_df.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def exactly_once_batch_writer(
    upsert: Callable[[DataFrame, int], None], ledger_dir: str
) -> Callable[[DataFrame, int], None]:
    """Wrap a ``foreachBatch`` upsert with a batch-id ledger so REPLAYED
    micro-batches (checkpoint rollback after a crash/restart) are skipped.

    Spark's foreachBatch contract is at-least-once: after an unclean stop,
    the last batch can be re-delivered with the SAME batch_id. The ledger
    records each id with an atomic rename AFTER its upsert succeeds, so:

    - a replay of a completed batch is a no-op (the common restart case);
    - a crash INSIDE the upsert (or between upsert and mark) re-runs that
      one batch — exactly-once overall therefore requires the upsert itself
      to be idempotent, which every TableStore write mode here is
      (partition overwrite replaces itself; merge/SCD are key-idempotent).
      The wrapper turns "re-runs the whole drain" into "re-runs at most one
      idempotent batch".

    Place ``ledger_dir`` BESIDE the checkpointLocation (same filesystem):
    the ledger is only consulted against replays driven by that checkpoint,
    so the two must survive (or be lost) together — a driver restarted on a
    host that sees the checkpoint but not the ledger silently degrades to
    at-least-once (ADVICE r3). Only the last committed batch can ever be
    re-delivered, so the ledger is PRUNED to a small trailing window of
    marks after each commit instead of growing one file per micro-batch
    forever; at 100 TB the same pattern is a txn-id column in the table
    commit log (Delta's txnAppId/txnVersion).
    """
    os.makedirs(ledger_dir, exist_ok=True)
    keep_marks = 16  # replays only ever re-deliver the LAST batch; 16 is slack

    def wrapped(df: DataFrame, batch_id: int) -> None:
        mark = os.path.join(ledger_dir, f"batch-{batch_id}.done")
        if os.path.exists(mark):
            return
        upsert(df, batch_id)
        tmp = f"{mark}.tmp-{os.getpid()}"
        open(tmp, "w").close()
        os.replace(tmp, mark)  # atomic: a mark either exists fully or not
        # prune marks far behind the committed frontier (bounded ledger)
        for fn in os.listdir(ledger_dir):
            if fn.startswith("batch-") and fn.endswith(".done"):
                try:
                    bid = int(fn[len("batch-") : -len(".done")])
                except ValueError:
                    continue
                if bid < batch_id - keep_marks:
                    try:
                        os.unlink(os.path.join(ledger_dir, fn))
                    except OSError:
                        pass

    return wrapped


def dedup_within_watermark(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state: Spark's
    dropDuplicatesWithinWatermark keeps a key only until the watermark passes
    it, so state size tracks the watermark window, not the stream's lifetime
    (a plain dropDuplicates on a stream grows state forever — the 100 TB
    anti-pattern). Duplicates arriving within the watermark window dedup
    exactly; duplicates later than the watermark are the accepted loss, same
    contract as any watermarked operator."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the watermark are
    dropped instead of growing state forever (the 100 TB state-bound rule)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
