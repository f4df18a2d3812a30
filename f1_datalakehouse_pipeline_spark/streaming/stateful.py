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
- session_windows: gap-based sessionization carried across micro-batches —
  a session CLOSES (and emits) only when a later event proves the gap
  elapsed, so results are identical no matter how the stream is chopped
  into batches (the batch sessionizer w_sessionize_events is the oracle
  shape; the trailing open session per key stays in state by design).

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
_SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
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


def session_windows(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Gap-based sessionization across micro-batches.

    ``ts_col`` must be epoch seconds (long). Within each key the state holds
    the current open session (start, last, n); an event more than ``gap_s``
    after ``last`` closes and EMITS the open session and starts a new one.
    Emission is therefore batch-boundary-invariant: replaying the same events
    in different batch splits yields byte-identical closed sessions, PROVIDED
    batches arrive in event-time order per key (within a batch order doesn't
    matter — events are sorted; across batches a late event older than the
    open session would mis-split, the same contract as any non-watermarked
    stateful op). The final open session per key remains in state
    (emit-on-close semantics); continuous deployments bound state with
    ``idle_timeout_ms``.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_all.extend(int(t) for t in pdf[ts_col])
        for t in sorted(ts_all):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if not closed:
            return iter(())
        return iter(
            (
                pd.DataFrame(
                    {
                        "key": [key[0]] * len(closed),
                        "session_start": [c[0] for c in closed],
                        "session_end": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                    }
                ),
            )
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, session_start long, session_end long, n_events long",
        stateStructType=_SESSION_STATE,
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
