"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming (SURVEY §2.9); these are the scale-path
extensions the engine offers on top of Structured Streaming's built-ins:

- running_dedup: exactly-once pass-through of first-seen keys — streaming
  exact deduplication with explicit, timeout-bounded state (the built-in
  ``dropDuplicates`` on a stream keeps state forever without a watermark;
  this variant owns its state lifecycle).
- running_aggregate: per-key running count/sum maintained in state and
  emitted per batch — the template for custom sessionization/feature
  accumulation that ``groupBy().agg()`` update-mode can't express.

State is per-key and bounded (GroupStateTimeout.ProcessingTimeTimeout
evicts idle keys), so executor memory stays O(active keys) at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

_DEDUP_STATE = StructType([StructField("seen", LongType())])
_AGG_STATE = StructType(
    [StructField("n", LongType()), StructField("total", LongType())]
)


def running_dedup(
    stream: DataFrame,
    key_col: str,
    out_schema: str,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Emit only the first-seen row per key across the whole stream.

    ``idle_timeout_ms`` evicts idle keys in continuous deployments (bounded
    state); leave None for finite drains — a ProcessingTimeTimeout keeps an
    availableNow query scheduling timeout batches and it never terminates.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first_batch = None
        for pdf in pdfs:
            if first_batch is None and len(pdf):
                first_batch = pdf.iloc[:1]
        if state.exists:
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
            return iter(())
        state.update((1,))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        return iter(()) if first_batch is None else iter((first_batch,))

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def running_aggregate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) carried in state; one output row per key
    per micro-batch reflecting totals-so-far."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        saw = False
        for pdf in pdfs:
            if len(pdf):
                saw = True
                n += len(pdf)
                total += int(pdf[value_col].sum())
        state.update((n, total))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if not saw:
            return iter(())
        return iter(
            (pd.DataFrame({"key": [key[0]], "running_n": [n], "running_total": [total]}),)
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, running_n long, running_total long",
        stateStructType=_AGG_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
