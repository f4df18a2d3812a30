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
  a session CLOSES (and emits) when a later event proves the gap elapsed,
  or when the key's idle timeout fires (the open session can no longer be
  extended), so results are identical no matter how the stream is chopped
  into batches.

State is per-key and bounded: with ``idle_timeout_ms`` set, a
GroupStateTimeout.ProcessingTimeTimeout fires for idle keys and the
handlers EVICT them (``state.remove()``) — session_windows additionally
emits the trailing open session on eviction. Executor memory therefore
stays O(active keys) at 100 TB. The per-key handlers are module-level
(``_dedup_step`` / ``_session_step`` / ``_aggregate_step``) so the timeout
paths are unit-testable without a running stream.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def _timeout_conf(idle_timeout_ms: int | None) -> str:
    return (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )


def _dedup_step(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ts_col_unused: None,
    idle_timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle eviction: drop the seen-marker. If the key reappears later it
        # re-emits — the documented trade of bounding state by idleness.
        state.remove()
        return iter(())
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


def running_dedup(
    stream: DataFrame,
    key_col: str,
    out_schema: str,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Emit only the first-seen row per key across the whole stream.

    ``idle_timeout_ms`` evicts idle keys in continuous deployments (bounded
    state; an evicted key that reappears re-emits — dedup-within-idle-window
    semantics); leave None for finite drains — a ProcessingTimeTimeout keeps
    an availableNow query scheduling timeout batches and it never terminates.
    """

    def fn(key, pdfs, state):
        return _dedup_step(key, pdfs, state, None, idle_timeout_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=_timeout_conf(idle_timeout_ms),
    )


def _session_step(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ts_col: str,
    gap_s: int,
    idle_timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    def emit(rows: list[tuple[int, int, int]]) -> Iterator[pd.DataFrame]:
        return iter(
            (
                pd.DataFrame(
                    {
                        "key": [key[0]] * len(rows),
                        "session_start": [r[0] for r in rows],
                        "session_end": [r[1] for r in rows],
                        "n_events": [r[2] for r in rows],
                    }
                ),
            )
        )

    if state.hasTimedOut:
        # idle eviction: no event arrived within the idle window, so the open
        # session can never be extended — close and EMIT it, then drop the
        # state (never re-arm: re-arming here is what made idle keys
        # immortal). The timeout batch carries no input rows.
        open_session = state.get if state.exists else None
        state.remove()
        return emit([open_session]) if open_session else iter(())

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
    return emit(closed) if closed else iter(())


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
    stateful op). With ``idle_timeout_ms`` set, an idle key's trailing open
    session is emitted when the timeout fires and its state is removed —
    continuous deployments get bounded state AND complete output; without a
    timeout (finite drains) the final open session per key stays in state by
    design.
    """

    def fn(key, pdfs, state):
        return _session_step(key, pdfs, state, ts_col, gap_s, idle_timeout_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, session_start long, session_end long, n_events long",
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=_timeout_conf(idle_timeout_ms),
    )


def _aggregate_step(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    value_col: str,
    idle_timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle eviction: drop the running totals (they restart if the key
        # returns). Totals-so-far were already emitted every batch the key
        # was active, so nothing is lost at eviction time.
        state.remove()
        return iter(())
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


def running_aggregate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) carried in state; one output row per key
    per micro-batch reflecting totals-so-far. Idle keys are evicted once
    ``idle_timeout_ms`` elapses (totals restart if the key returns)."""

    def fn(key, pdfs, state):
        return _aggregate_step(key, pdfs, state, value_col, idle_timeout_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, running_n long, running_total long",
        stateStructType=_AGG_STATE,
        outputMode="append",
        timeoutConf=_timeout_conf(idle_timeout_ms),
    )


_BUDGET_STATE = StructType(
    [StructField("spent", LongType()), StructField("exhausted", LongType())]
)


def _budget_step(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    budgets: dict[str, int],
    id_col: str,
    tokens_col: str,
) -> Iterator[pd.DataFrame]:
    budget = int(budgets.get(key[0], 0))
    if budget <= 0:
        # Zero/unlisted domains reject everything and must NOT create a state
        # entry (ADVICE r4: a dirty high-cardinality domain column would
        # otherwise grow never-evicted state unboundedly). budget_admission
        # also pre-filters these rows out; this guard keeps the step safe
        # when called directly.
        return iter(())
    spent, exhausted = (
        (int(state.get[0]), bool(state.get[1])) if state.exists else (0, False)
    )
    parts = [pdf for pdf in pdfs if len(pdf)]
    if not parts or exhausted:
        return iter(())
    batch = pd.concat(parts, ignore_index=True)
    batch = batch[batch[tokens_col] > 0].sort_values(id_col, kind="mergesort")
    if not len(batch):
        return iter(())
    cum = batch[tokens_col].cumsum() + spent
    fits = cum <= budget
    admitted = batch[fits].copy()
    if len(admitted) < len(batch):
        # prefix semantics, same as the batch mixture: the first overflowing
        # doc closes the domain for good — a later smaller doc must not jump
        # the queue it arrived behind.
        exhausted = True
    if len(admitted):
        admitted["cum_tokens"] = cum[fits]
        spent = int(admitted["cum_tokens"].iloc[-1])
    state.update((spent, int(exhausted)))
    return iter((admitted,)) if len(admitted) else iter(())


def budget_admission(
    stream: DataFrame,
    id_col: str,
    domain_col: str,
    tokens_col: str,
    budgets: dict[str, int],
    out_schema: str,
) -> DataFrame:
    """Streaming counterpart of operators/mixture.budgeted_mixture: admit
    docs from the stream into a per-domain token budget; once a domain's
    budget is spent, every later doc in that domain is rejected — across
    micro-batches and restarts (the spent counter lives in the state store,
    so a checkpointed query resumes exactly where it stopped).

    Semantics differ from the batch mixture BY DESIGN in ordering only:
    batch selects a seeded-hash prefix (a reproducible uniform sample); a
    stream cannot see future docs, so admission is arrival-order — first
    come, first funded — with id-order tie-breaking inside each micro-batch
    for a deterministic result under a fixed batch chop. The CUT is the
    same strict prefix as the batch operator: the first doc that overflows
    the budget closes its domain permanently (a later smaller doc must not
    jump the queue it arrived behind). Domains absent from ``budgets``
    get 0.

    State is two longs per FUNDED domain — O(#budgets-with-budget>0) total,
    never evicted (a timeout would forget spend and re-open an exhausted
    budget). Unlisted and zero-budget domains are filtered out BEFORE the
    stateful operator, so a dirty high-cardinality domain column costs
    neither state entries nor shuffle rows (ADVICE r4).
    ``out_schema`` must list the input columns plus ``cum_tokens BIGINT``.
    """
    funded = [d for d, b in budgets.items() if int(b) > 0]
    stream = stream.filter(F.col(domain_col).isin(funded))

    def fn(key, pdfs, state):
        return _budget_step(key, pdfs, state, budgets, id_col, tokens_col)

    return stream.groupBy(domain_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
