"""Streaming distribution-drift monitor (SURVEY §2.9 extension; the
reference has no streaming at all).

The :func:`~f1_datalakehouse_pipeline_spark.quality.psi_drift` governance
check as a CONTINUOUS gate: as ingest micro-batches land, each batch's
column distributions are PSI-scored against a fixed reference snapshot and
the per-(column, bucket) detail plus per-column summary append to parquet
sinks an operator can alert on (PSI > 0.25 on a quality-score column =
upstream crawl rot; a fat ``__hi__`` guard bucket = unit change upstream).

Why foreachBatch, not a stateful streaming aggregation: drift is scored
per batch against a STATIC reference — each verdict depends only on the
batch at hand and the frozen snapshot, so there is no cross-batch state to
carry. The reference bounds (numeric min/max) and top-k category keep-list
are computed once from the snapshot, materialized, and reused; per-batch
cost is one pass over the batch plus a (columns x buckets)-sized join.

At 100 TB: the reference summary is tiny (one row of bounds + top_k rows
per categorical column) and lives cached on the executors. Batch PSI over
micro-batches is deliberately NOT the same number as one PSI over the
concatenated stream (shares are per-batch); that per-batch form is exactly
what a monitor wants — a score per ingest slice, comparable across slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from f1_datalakehouse_pipeline_spark.quality import (
    psi_drift_from_reference,
    psi_reference,
    psi_summary,
)


def drift_monitor_stream(
    stream_df: DataFrame,
    reference: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    *,
    n_buckets: int = 10,
    top_k: int = 20,
    eps: float = 1e-6,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the monitor: per micro-batch, PSI-score ``stream_df``'s columns
    against the static ``reference`` and APPEND detail rows (column, bucket,
    n_ref, n_new, ref_share, new_share, psi_term, batch_id) to
    ``{out_path}/detail`` and (column, psi, batch_id) to
    ``{out_path}/summary``.

    The reference AGGREGATES (numeric bounds, top-k keep-list, and the
    reference bucket counts) are computed and materialized ONCE before the
    stream starts (``quality.psi_reference(materialize=True)``), so each
    micro-batch pays one pass over ITSELF plus a (columns × buckets)-sized
    join — O(batch), independent of reference size (ADVICE r5: previously
    each batch re-ran psi_drift end to end, rescanning the reference).
    Batch replays re-append; dedup on batch_id downstream or wrap with
    ``incremental.exactly_once_batch_writer`` where replays matter."""
    ref_summary = psi_reference(
        reference.localCheckpoint(eager=True),
        numeric_cols=numeric_cols,
        categorical_cols=categorical_cols,
        n_buckets=n_buckets,
        top_k=top_k,
        materialize=True,
    )

    def score(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return  # empty replay/no-op batch: no verdict rows
        detail = psi_drift_from_reference(
            ref_summary, batch_df, eps=eps
        ).withColumn("batch_id", F.lit(batch_id))
        detail = detail.localCheckpoint(eager=True)  # score once, write twice
        detail.write.mode("append").parquet(f"{out_path}/detail")
        psi_summary(detail.drop("batch_id")).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(f"{out_path}/summary")

    writer = stream_df.writeStream.foreachBatch(score).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
