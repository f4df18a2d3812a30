"""As-of and range joins — operators Spark lacks natively, built as
compositions of DataFrame primitives (SURVEY-mandated "custom operator"
strategy (a): composition before UDFs).

- asof_join: backward-inclusive as-of (for each left row, the latest right
  row with right_time <= left_time, per key) via the union+window trick:
  tag sides, union, one window per key ordered by (time, side) carrying the
  last-seen right values forward. ONE shuffle on the key — no n² candidate
  join, no per-key driver loop. Equivalent to DuckDB's native ASOF JOIN
  (which serves as the oracle).
- range_join_binned: point-in-interval join without an equality key, made
  shuffle-joinable by binning intervals to fixed-width buckets and exploding
  interval bucket membership. Join cost ∝ (points + interval-bucket rows) +
  true matches, never the cartesian product.

Scale notes: both operators are single-shuffle shapes keyed by (by, …) or
bucket; skewed keys fall to AQE skew-join handling like any other join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join (inner): latest right row ≤ left time.

    ``right`` should be unique per (by, right_time) — pre-dedupe if not
    (ties would otherwise resolve to the last row in (time, side) order).
    Output: all left columns + ``{value}{suffix}`` columns + matched right
    time as ``{right_time}{suffix}``; left rows with no prior right row drop
    (inner semantics, matching DuckDB ASOF JOIN).

    ``tolerance`` (same units as the time column cast to double — seconds for
    timestamps): additionally drop rows whose matched right time is more than
    this far in the past. This is the sensor/trade-quote "stale match" guard;
    the filter runs AFTER the as-of resolution, so semantics are "the latest
    prior match, if fresh enough" — not "the latest match within the window".
    """
    by = list(by)
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__rv_{v}") for v in right_values],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__rv_{v}") for v in right_values],
        F.col(right_time).alias("__rt"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows (side 1) at equal time ⇒
    # inclusive (<=) semantics
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(f"__rv_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}") for v in right_values],
        F.last("__rt", ignorenulls=True).over(w).alias(f"{right_time}{suffix}"),
    )
    out = (
        carried.filter(F.col("__side") == 1)
        .filter(F.col(f"{right_time}{suffix}").isNotNull())
        .drop("__t", "__side", "__rt", *[f"__rv_{v}" for v in right_values])
    )
    if tolerance is not None:
        out = out.filter(
            F.col(left_time).cast("double") - F.col(f"{right_time}{suffix}").cast("double")
            <= F.lit(float(tolerance))
        )
    return out


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_start,
    left_end,
    right_start,
    right_end,
    bucket_width: int,
) -> DataFrame:
    """Interval × interval overlap join (a.s <= b.e AND b.s <= a.e) with no
    equality key, made shuffle-joinable the same way as range_join_binned:
    both sides explode their bucket spans, the equi-join on bucket prunes to
    same-bucket candidates, and an exact predicate filters. A pair whose
    bucket ranges intersect in k buckets would match k times; instead of a
    whole-row ``distinct()`` (which would collapse genuinely duplicate input
    rows and fail on map-typed columns), each pair is kept only in its
    CANONICAL bucket — the bucket containing the overlap start,
    ``greatest(a.s, b.s)``, which both sides' ranges provably contain — so
    every matching pair emits exactly once with no dedup shuffle at all.
    Choose ``bucket_width`` ≈ typical span so the explode factor stays ~2
    per side. Never a cartesian product.
    """

    def _binned(df: DataFrame, s, e, prefix: str) -> DataFrame:
        s = F.col(s) if isinstance(s, str) else s
        e = F.col(e) if isinstance(e, str) else e
        return (
            df.withColumn(f"__{prefix}s", s.cast("long"))
            .withColumn(f"__{prefix}e", e.cast("long"))
            .withColumn(
                "__bucket",
                F.explode(
                    F.sequence(
                        (F.col(f"__{prefix}s") / bucket_width).cast("long"),
                        (F.col(f"__{prefix}e") / bucket_width).cast("long"),
                    )
                ),
            )
        )

    l_b = _binned(left, left_start, left_end, "l")
    r_b = _binned(right, right_start, right_end, "r")
    # canonical bucket = bucket of the overlap start; the same truncation
    # expression the explode used, so monotonicity guarantees membership in
    # both sides' bucket ranges
    canonical = (F.greatest(F.col("__ls"), F.col("__rs")) / bucket_width).cast("long")
    return (
        l_b.join(r_b, "__bucket")
        .filter(
            (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
            & (F.col("__bucket") == canonical)
        )
        .drop("__bucket", "__ls", "__le", "__rs", "__re")
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_time: Column | str,
    interval_start: Column | str,
    interval_end: Column | str,
    bucket_width: int,
) -> DataFrame:
    """Inner join point_time ∈ [start, end] with no equality key.

    Times must be numeric (cast timestamps to epoch seconds first).
    Intervals explode to ceil(span/width)+1 bucket rows; points hash to one
    bucket; the equi-join on bucket prunes candidates to same-bucket pairs
    before the exact containment filter. Choose ``bucket_width`` ≈ typical
    interval span so the explode factor stays ~2.
    """
    pt = F.col(point_time) if isinstance(point_time, str) else point_time
    s = F.col(interval_start) if isinstance(interval_start, str) else interval_start
    e = F.col(interval_end) if isinstance(interval_end, str) else interval_end

    p = points.withColumn("__pt", pt.cast("long")).withColumn(
        "__bucket", (F.col("__pt") / bucket_width).cast("long")
    )
    iv = (
        intervals.withColumn("__s", s.cast("long"))
        .withColumn("__e", e.cast("long"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    (F.col("__s") / bucket_width).cast("long"),
                    (F.col("__e") / bucket_width).cast("long"),
                )
            ),
        )
    )
    return (
        p.join(iv, "__bucket")
        .filter((F.col("__pt") >= F.col("__s")) & (F.col("__pt") <= F.col("__e")))
        .drop("__bucket", "__pt", "__s", "__e")
    )
