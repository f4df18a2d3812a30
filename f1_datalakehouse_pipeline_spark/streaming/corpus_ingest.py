"""Streaming front-end for the FULL corpus build: every micro-batch of raw
documents runs the complete admission pipeline (quality → PII scrub → exact
dedup vs hash history → within-batch LSH + novelty-index probe →
decontamination → chunk → shard APPEND) via
``plans/corpus.run_corpus_pipeline_incremental`` inside ``foreachBatch``.

This composes the two existing streaming admission surfaces into the
delivery path: ``streaming/novelty`` gates near-dups but appends raw docs,
and ``streaming/stateful.budget_admission`` caps domains but delivers
nothing — here the batch-mode incremental pipeline IS the upsert, so the
streaming and batch ingestion paths cannot drift (same code, same state
layout, same manifest arithmetic). State (content-hash history + band
index) lives under ``state_root`` exactly as in batch mode; a corpus
bootstrapped by batch calls can be continued by a stream and vice versa.

Crash consistency is the documented at-most-one-batch weakening shared by
``streaming/novelty`` and the TableStore ledger: the upsert is wrapped with
``incremental.exactly_once_batch_writer`` so REPLAYED completed batches are
skipped; a crash inside one upsert re-runs that batch against state that
has not seen it (state extension is the LAST write), re-deriving identical
verdicts, so the residue is duplicate delivery of at most that one batch.

The per-batch report intentionally skips the corpus-sized shard audit
(``audit=False``); run ``sources/shards.verify_training_shards`` out-of-band
— per micro-batch it would re-scan the ENTIRE delivered corpus, an
O(corpus) cost in an O(batch) loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from f1_datalakehouse_pipeline_spark.plans.corpus import (
    run_corpus_pipeline_incremental,
)
from f1_datalakehouse_pipeline_spark.streaming.incremental import (
    exactly_once_batch_writer,
)
from f1_datalakehouse_pipeline_spark.streaming.novelty import should_compact


def corpus_ingest_stream(
    stream_docs: DataFrame,
    out_root: str,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every_batches: int | None = None,
    compact_max_files: int | None = None,
    compact_max_bytes_per_file: int | None = None,
    **pipeline_kw,
) -> StreamingQuery:
    """Start the full-pipeline admission gate over a streaming DataFrame of
    ``(id, content, …)`` documents. ``pipeline_kw`` is forwarded verbatim to
    :func:`run_corpus_pipeline_incremental` (thresholds, benchmark, chunking,
    shard count, seed, ``shingle_buckets`` …) — pass the SAME values on every
    run of an ingest's life, as in batch mode.

    ``compact_every_batches=N`` runs
    :func:`~f1_datalakehouse_pipeline_spark.plans.corpus.compact_corpus_state`
    after every Nth batch, inside ``foreachBatch`` where it cannot race the
    ingest — without it a long-lived stream accumulates one small parquet
    file per state component per admitted batch (the probe-scan degradation
    the compaction hook exists for). Compaction changes no verdict, so a
    ledger replay skipping it loses only the maintenance.

    ``compact_max_files=N`` (optionally ``compact_max_bytes_per_file``) is
    the observable-driven alternative (VERDICT r6 item 7): after each batch
    the state root's data-file count is measured (one walk, skipping
    ``_``-prefixed staging/marker dirs) and the fold runs only when it
    crosses N — no cadence to tune against uneven batch sizes. Either
    trigger firing runs the fold."""
    spark = stream_docs.sparkSession
    pipeline_kw.setdefault("audit", False)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        run_corpus_pipeline_incremental(
            spark, batch_df, out_root, state_root, **pipeline_kw
        )
        cadence_due = bool(
            compact_every_batches
            and (batch_id + 1) % compact_every_batches == 0
        )
        threshold_due = should_compact(
            state_root,
            max_files=compact_max_files,
            max_bytes_per_file=compact_max_bytes_per_file,
            components=None,
        )
        if cadence_due or threshold_due:
            from f1_datalakehouse_pipeline_spark.plans.corpus import (
                compact_corpus_state,
            )

            compact_corpus_state(spark, state_root)

    wrapped = exactly_once_batch_writer(
        upsert, os.path.join(checkpoint_dir, "_ingest_ledger")
    )
    writer = stream_docs.writeStream.foreachBatch(wrapped).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
