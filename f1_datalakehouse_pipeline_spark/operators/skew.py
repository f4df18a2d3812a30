"""Skew mitigation operators: salting for hot keys.

AQE's skew-join split (enabled in session.py, reference conf
f1_silver_to_gold_transform.py:97) handles most skew at runtime; these
explicit forms are for the cases AQE can't fix:

- salted_join: a broadcast-sized dim is replicated n_salt times and the hot
  fact key is sharded across salts, so one reducer never owns a whole hot
  key. Use when the skewed side must shuffle (e.g. the dim is just above the
  broadcast threshold, or the join feeds a co-partitioned downstream stage).
- salted_aggregate: two-phase aggregation for algebraic functions —
  partial groupBy((keys, salt)) then final groupBy(keys). Spark's hash
  aggregate already does map-side partials; the explicit form matters for
  countDistinct-like pipelines and for bounding reducer-side state on
  pathological keys.

Salts are deterministic (xxhash64 of the row's key columns + a spread
column) so repeated runs produce identical plans and results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join a skewed fact to a small dim with the dim replicated per salt.

    ``spread_cols`` (default: all non-key fact columns) feed the salt hash so
    rows of one hot key scatter across salts.
    """
    on = list(on)
    spread = list(spread_cols) if spread_cols else [c for c in skewed.columns if c not in on]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in (on + spread)]), F.lit(n_salt))
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return left.join(right, on + ["__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase groupBy for algebraic aggs: {out_col: 'sum|count|min|max'}
    applied to the column of the same name (count counts rows)."""
    keys = list(keys)
    bad = set(aggs.values()) - set(_ALGEBRAIC)
    if bad:
        raise ValueError(f"non-algebraic aggs not supported here: {bad}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                (_ALGEBRAIC[fn](F.lit(1)) if fn == "count" else _ALGEBRAIC[fn](col))
                .alias(f"__p_{out}")
                for out, (col, fn) in ((o, (o, f)) for o, f in aggs.items())
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](f"__p_{out}").alias(out) for out, fn in aggs.items()]
    )
