"""Streaming benchmark-contamination monitor (SURVEY §2.9 extension; the
reference has no streaming at all).

The pre-training hygiene check as a CONTINUOUS gate instead of a one-shot
batch: as corpus slices land, each micro-batch of newly ingested training
documents is checked against a held-out benchmark set, and leak verdicts
append to a sink the eval owners watch. The batch operator
(``operators/dedup.contamination_pairs`` — oracle-verified) is the exact
semantics; this module runs its core per micro-batch via ``foreachBatch``
against a PRECOMPUTED, cached benchmark shingle index.

Why foreachBatch rather than a stateful streaming aggregation: containment
is scored per (test_doc, train_doc) pair, and a training document arrives in
exactly ONE micro-batch (documents are single rows; file-source batches are
whole files), so no cross-batch state is ever needed — the aggregation state
a streaming groupBy would carry forever is structurally unnecessary. The
benchmark side is static by definition during an ingestion window (a new
benchmark release = a new query with a new index).

At 100 TB: the benchmark index is small (evals are thousands of docs, not
billions) and lives cached on the executors; per-batch cost is O(batch
grams) — shingle, hash-join against the index, one pair groupBy. The
hot-gram cap bounds worst-case boilerplate fan-out exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from f1_datalakehouse_pipeline_spark.operators import dedup


def contamination_stream(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    content_col: str,
    out_path: str,
    checkpoint_dir: str,
    k: int = 8,
    min_containment: float = 0.5,
    max_doc_frequency: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the monitor: ``stream_docs`` (a streaming DataFrame of incoming
    training documents) is contamination-checked per micro-batch against the
    static ``benchmark``; hits (test_id, train_id, n_shared, test_ngrams,
    containment, batch_id) APPEND to ``out_path`` as parquet.

    The benchmark shingle index is computed once, cached, and materialized
    before the stream starts, so micro-batches pay only their own shingling.
    The caller owns the cache lifetime (``spark.catalog.clearCache()`` or
    unpersist after ``awaitTermination``). Appends are idempotent per batch
    replay only if the sink dedups on (train_id, test_id); wrap the writer
    with ``incremental.exactly_once_batch_writer`` where replays matter.
    """
    test_sh, test_sizes = dedup.benchmark_shingle_index(
        benchmark, id_col, content_col, k
    )
    test_sh = test_sh.cache()
    test_sizes = test_sizes.cache()
    test_sh.count()  # materialize the index before the first batch
    test_sizes.count()

    def check(batch_df: DataFrame, batch_id: int) -> None:
        pairs = dedup.contamination_pairs_against_index(
            batch_df,
            test_sh,
            test_sizes,
            id_col,
            content_col,
            k=k,
            min_containment=min_containment,
            max_doc_frequency=max_doc_frequency,
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    writer = stream_docs.writeStream.foreachBatch(check).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
