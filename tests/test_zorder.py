"""Z-order clustering: the skipping math must be visible in parquet file
statistics — EVERY clustered dimension gets narrow per-file min/max ranges,
unlike a single-column sort which only tightens its first column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.functions.zorder import morton_interleave, zorder_write


def _file_range_fraction(path_glob: str, col: str, domain: int) -> float:
    """Mean (max-min)/domain of ``col`` across parquet files — 1.0 means every
    file spans the whole domain (no skipping possible), small means tight."""
    fracs = []
    for f in glob.glob(path_glob):
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            fracs.append((hi - lo) / domain)
    assert fracs, f"no stats found for {col}"
    return sum(fracs) / len(fracs)


def test_morton_interleave_orders_like_a_z_curve(spark):
    df = spark.createDataFrame([(x, y) for x in range(4) for y in range(4)], ["x", "y"])
    out = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_interleave([F.col("x"), F.col("y")], bits=2).alias("z")).collect()
    }
    # interleaved bits: z(x,y) with x in odd positions, y in even (2 cols)
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1  # x bit 0 -> position 0
    assert out[(0, 1)] == 2  # y bit 0 -> position 1
    assert out[(3, 3)] == 15
    assert len(set(out.values())) == 16  # bijective on the grid


def test_zorder_write_tightens_all_dimensions(spark, tmp_path):
    n = 1 << 14
    domain = 256
    # two independent uniform dims derived from id (decorrelated via hashing)
    df = spark.range(n).select(
        (F.col("id") % domain).alias("a"),
        F.pmod(F.hash("id"), F.lit(domain)).alias("b"),
        F.col("id").alias("payload"),
    )

    plain = str(tmp_path / "plain")
    # single-column sort: a tight, b full-range
    df.repartitionByRange(8, "a").sortWithinPartitions("a").write.parquet(plain)
    zord = str(tmp_path / "zord")
    zorder_write(df, zord, ["a", "b"], bits=8, n_files=8)

    plain_a = _file_range_fraction(f"{plain}/*.parquet", "a", domain)
    plain_b = _file_range_fraction(f"{plain}/*.parquet", "b", domain)
    z_a = _file_range_fraction(f"{zord}/*.parquet", "a", domain)
    z_b = _file_range_fraction(f"{zord}/*.parquet", "b", domain)

    # the single-column sort cannot skip on b at all
    assert plain_a < 0.3 and plain_b > 0.9
    # z-order tightens BOTH dimensions below the no-skipping baseline
    assert z_a < 0.65 and z_b < 0.65, (z_a, z_b)
    # and the data survives intact
    assert spark.read.parquet(zord).count() == n


def test_rank_normalize_uniformizes_skewed_values(spark):
    """Skewed/non-integer values map to [0, 2^bits) by rank, so the Morton
    grid is evenly occupied regardless of the raw distribution."""
    from f1_datalakehouse_pipeline_spark.functions.zorder import rank_normalize

    # heavily skewed: exponential-ish spacing
    df = spark.range(1000).select((F.exp(F.col("id") / 100.0)).alias("v"))
    out = df.select(rank_normalize(df, "v", bits=4).alias("b")).collect()
    buckets = [r.b for r in out]
    assert min(buckets) == 0 and max(buckets) == 15
    # every bucket gets a roughly even share (62-63 of 1000 per 16 buckets)
    from collections import Counter

    counts = Counter(buckets)
    assert all(50 <= counts[b] <= 80 for b in range(16)), counts


def test_rank_normalize_exact_path_still_available(spark):
    from f1_datalakehouse_pipeline_spark.functions.zorder import rank_normalize

    df = spark.range(1000).select((F.exp(F.col("id") / 100.0)).alias("v"))
    out = df.select(rank_normalize(df, "v", bits=4, exact=True).alias("b")).collect()
    buckets = [r.b for r in out]
    assert min(buckets) == 0 and max(buckets) == 15


def test_zorder_with_approx_rank_normalize_has_no_window(spark, tmp_path):
    """The default rank_normalize is sketch-bucketed: the z-order write plan
    must contain NO window (no global sort funnel), and per-file spans stay
    tight on BOTH normalized dimensions (the data-skipping payoff)."""
    from f1_datalakehouse_pipeline_spark.functions.zorder import rank_normalize

    n = 1 << 14
    # skewed continuous dims: exponential v1, squared-hash v2
    df = spark.range(n).select(
        F.exp(F.col("id") % 256 / 32.0).alias("v1"),
        F.pow(F.pmod(F.hash("id"), F.lit(256)).cast("double"), 2.0).alias("v2"),
        F.col("id").alias("payload"),
    )
    norm = df.withColumn("na", rank_normalize(df, "v1", bits=8)).withColumn(
        "nb", rank_normalize(df, "v2", bits=8)
    )
    plan = norm._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "approx rank_normalize must not plan a window"

    out = str(tmp_path / "zn")
    zorder_write(norm, out, ["na", "nb"], bits=8, n_files=8)
    z_a = _file_range_fraction(f"{out}/*.parquet", "na", 256)
    z_b = _file_range_fraction(f"{out}/*.parquet", "nb", 256)
    assert z_a < 0.65 and z_b < 0.65, (z_a, z_b)
    assert spark.read.parquet(out).count() == n
