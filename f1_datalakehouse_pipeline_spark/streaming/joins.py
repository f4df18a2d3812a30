"""Streaming joins (SURVEY §2.9 extension — the reference has no streaming).

- enrich_with_dim: stream-static join. The static side re-resolves per
  micro-batch, so a dimension updated by the batch pipeline (drivers SCD2)
  is picked up without restarting the query; Spark broadcasts it when small.
  No state, no watermark needed — the 100 TB shape for stream enrichment.
- stream_stream_within: watermarked stream-stream inner join with a time
  bound (purchase joins views at most ``within`` before it). BOTH sides
  carry watermarks and the join condition bounds event-time distance, so
  each side's buffered state is evictable — an unbounded stream-stream join
  would otherwise grow state forever (the anti-pattern Structured Streaming
  rejects at analysis time without these constraints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join; the static plan re-executes per micro-batch."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Inner-join left rows to right rows of the same key with
    ``right_ts ∈ [left_ts - within, left_ts]`` (right happens at-or-before
    left, at most ``within`` earlier). Watermarks on both sides + the
    interval condition make the buffered state bounded and late rows
    droppable — required for any streaming join to run at all.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}")
        )
    )
    out_right = [F.col(f"r.{c}").alias(f"r_{c}") for c in (right_cols or [])]
    return l.join(r, cond, "inner").select("l.*", *out_right)
