"""Data-quality checks: invariants & reconciliations as DataFrames.

The reference defines validators but never wires them into jobs
(business_logic.py:670-743, common.py:620-654 — SURVEY §5.1); here each check
returns a violations DataFrame (empty ⇒ pass) so pipelines can collect counts
via one action (or `observe` metrics) instead of log-and-forget.

All checks are pure filters/aggregations — partition-parallel, no collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    violations: int
    sample: list


def run_checks(checks: dict[str, DataFrame], sample_n: int = 5) -> list[CheckResult]:
    """Materialize each violations DataFrame once; keep a small sample."""
    out = []
    for name, df in checks.items():
        rows = df.limit(sample_n + 1).collect()
        n = df.count() if len(rows) > sample_n else len(rows)
        out.append(CheckResult(name, n, [r.asDict() for r in rows[:sample_n]]))
    return out


# --- range/invariant checks (business_logic.py:670-743 semantics) ----------


def check_position_range(df: DataFrame, col: str = "position", lo: int = 1, hi: int = 20) -> DataFrame:
    c = F.col(col)
    return df.filter(c.isNotNull() & ((c < lo) | (c > hi)))


def check_points_range(df: DataFrame, col: str = "validated_points", lo: int = 0, hi: int = 26) -> DataFrame:
    c = F.col(col)
    return df.filter(c.isNotNull() & ((c < lo) | (c > hi)))


def check_non_negative(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNotNull() & (F.col(col) < 0))


# --- reconciliation (race_results_transform.py:133-191 semantics) ----------


def reconcile_points(race_results_silver: DataFrame) -> DataFrame:
    """Rows where API-reported points disagree with position-derived points."""
    return race_results_silver.filter(
        F.col("points").isNotNull()
        & F.col("validated_points").isNotNull()
        & (F.col("points") != F.col("validated_points"))
    ).select("session_key", "driver_number", "position", "points", "validated_points")


# --- SCD2 structural invariants (FIXTURES.md §5) ---------------------------


def check_scd2_single_current(dim: DataFrame, entity_col: str) -> DataFrame:
    """Entities with ≠1 open (is_current) row."""
    return (
        dim.filter(F.col("is_current"))
        .groupBy(entity_col)
        .agg(F.count(F.lit(1)).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )


def check_scd2_contiguous(dim: DataFrame, entity_col: str) -> DataFrame:
    """Stints whose valid_to ≠ the next stint's valid_from (gap or overlap)."""
    w = Window.partitionBy(entity_col).orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    return (
        dim.withColumn("__next_from", nxt)
        .filter(
            F.col("__next_from").isNotNull()
            & ~F.col("valid_to").eqNullSafe(F.col("__next_from"))
        )
        .select(entity_col, "valid_from", "valid_to", "__next_from")
    )


# --- schema compatibility (common.py:620-654 semantics) --------------------


def schema_diff(df: DataFrame, expected: "DataFrame | object") -> dict:
    """Missing / extra / type-mismatched columns vs an expected StructType."""
    from pyspark.sql.types import StructType

    exp: StructType = expected.schema if isinstance(expected, DataFrame) else expected
    actual = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in exp.fields}
    return {
        "missing": sorted(set(want) - set(actual)),
        "extra": sorted(set(actual) - set(want)),
        "type_mismatch": sorted(
            n for n in set(want) & set(actual) if want[n] != actual[n]
        ),
    }


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = True
) -> DataFrame:
    """Per-column table profile in ONE aggregation pass: row count, null
    count, distinct count, min/max (rendered as strings) — the governance
    snapshot a corpus/lakehouse catalog records per table version.

    ``approx=True`` (default, the 100 TB path): ONE wide ``agg`` computes
    every statistic with HyperLogLog distinct sketches — single scan,
    map-side-combinable, regardless of column count — then a pure projection
    explodes it to long form (column, n_rows, n_null, n_distinct, min_value,
    max_value). ``approx=False`` unions one per-column aggregation per
    column instead: exact COUNT(DISTINCT) in one shared agg plans an Expand
    that replicates every row ×(len(cols)+1) through the shuffle (measured
    6× slower than the union form at sf0.1 for 3 columns); per-column aggs
    each get their own clean two-phase plan at the cost of one scan per
    column — the right trade only for oracle checks and small dims.

    Timestamps format as ``yyyy-MM-dd HH:mm:ss``; other types use CAST —
    keep float columns out of exact cross-engine comparisons (binary→string
    rendering differs between engines).
    """
    from functools import reduce

    types = dict(df.dtypes)

    def fmt(c, name: str):
        if types.get(name, "").startswith("timestamp"):
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        return c.cast("string")

    if not approx:
        def per_col(c: str) -> DataFrame:
            return df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                fmt(F.min(c), c).alias("min_value"),
                fmt(F.max(c), c).alias("max_value"),
            )

        return reduce(
            lambda a, b: a.unionByName(b), [per_col(c) for c in cols]
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.approx_count_distinct(c).alias(f"{c}__nd"),
            fmt(F.min(c), c).alias(f"{c}__min"),
            fmt(F.max(c), c).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c in cols
            ]
        )
    )
    return wide.select(stacked.alias("s")).select("s.*")
