"""Unit tests for as-of and range joins (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.operators.asof import asof_join, range_join_binned


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "L10"), (1, 5, "L5"), (1, 2, "L2"), (2, 7, "Lx")],
        ["k", "t", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 5, "R5"), (1, 8, "R8"), (3, 1, "R?")], ["k", "t", "rv"]
    )
    out = {
        (r.k, r.t): (r.rv_asof, r.t_asof)
        for r in asof_join(left, right, ["k"], "t", "t", ["rv"]).collect()
    }
    assert out[(1, 10)] == ("R8", 8)   # latest <= 10
    assert out[(1, 5)] == ("R5", 5)    # inclusive equality
    assert (1, 2) not in out           # no prior right row → dropped (inner)
    assert (2, 7) not in out           # key with no right rows


def test_asof_tie_on_time_prefers_right_then_left(spark):
    left = spark.createDataFrame([(1, 5, "L")], ["k", "t", "lv"])
    right = spark.createDataFrame([(1, 5, "R")], ["k", "t", "rv"])
    out = asof_join(left, right, ["k"], "t", "t", ["rv"]).collect()
    assert len(out) == 1 and out[0].rv_asof == "R"


def test_range_join_binned_matches_naive(spark):
    import random

    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rng.randint(0, 1000)) for i in range(200)], ["pid", "t"]
    )
    ivs = spark.createDataFrame(
        [(j, s := rng.randint(0, 950), s + rng.randint(5, 60)) for j in range(50)],
        ["iid", "start", "end"],
    )
    binned = {
        (r.pid, r.iid)
        for r in range_join_binned(pts, ivs, "t", "start", "end", bucket_width=64).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(ivs)
        .filter((F.col("t") >= F.col("start")) & (F.col("t") <= F.col("end")))
        .collect()
    }
    assert binned == naive


def test_interval_overlap_binned_matches_naive(spark):
    """Binned interval-overlap join must equal the naive inequality join for
    arbitrary interval sets (including touching endpoints and containment)."""
    from f1_datalakehouse_pipeline_spark.operators.asof import interval_overlap_join_binned

    a_rows = [(1, 0, 10), (2, 5, 25), (3, 100, 140), (4, 30, 30)]
    b_rows = [(10, 8, 12), (11, 25, 29), (12, 90, 200), (13, 31, 40)]
    a = spark.createDataFrame(a_rows, ["key_a", "s_a", "e_a"])
    b = spark.createDataFrame(b_rows, ["key_b", "s_b", "e_b"])

    got = sorted(
        (r.key_a, r.key_b)
        for r in interval_overlap_join_binned(a, b, "s_a", "e_a", "s_b", "e_b", bucket_width=7)
        .select("key_a", "key_b")
        .collect()
    )
    naive = sorted(
        (ka, kb)
        for ka, s1, e1 in a_rows
        for kb, s2, e2 in b_rows
        if s1 <= e2 and s2 <= e1
    )
    assert got == naive


def test_interval_overlap_preserves_duplicate_rows_and_map_columns(spark):
    """The canonical-bucket dedup must keep genuinely duplicate input rows
    (cardinality = join semantics, not set semantics) and must not choke on
    map-typed payload columns (whole-row distinct did both)."""
    from f1_datalakehouse_pipeline_spark.operators.asof import interval_overlap_join_binned

    left = spark.createDataFrame(
        # two IDENTICAL rows spanning several buckets + map payload
        [(1, 0, 250, {"k": "v"}), (1, 0, 250, {"k": "v"})],
        "id int, s long, e long, tags map<string,string>",
    )
    right = spark.createDataFrame(
        [(10, 100, 120), (20, 400, 500)],
        "rid int, rs long, re long",
    )
    out = interval_overlap_join_binned(
        left, right, "s", "e", "rs", "re", bucket_width=50
    )
    rows = out.select("id", "rid").collect()
    # each duplicate left row matches rid=10 exactly once -> 2 rows, not 1
    assert sorted((r.id, r.rid) for r in rows) == [(1, 10), (1, 10)]


def test_interval_overlap_each_pair_emitted_once_across_buckets(spark):
    """A pair overlapping across many buckets must emit exactly once."""
    import itertools

    from f1_datalakehouse_pipeline_spark.operators.asof import interval_overlap_join_binned

    left = spark.createDataFrame(
        [(i, i * 10, i * 10 + 300) for i in range(30)], "id long, s long, e long"
    )
    right = spark.createDataFrame(
        [(j, j * 7, j * 7 + 150) for j in range(40)], "rid long, rs long, re long"
    )
    out = interval_overlap_join_binned(left, right, "s", "e", "rs", "re", bucket_width=40)
    got = sorted((r.id, r.rid) for r in out.select("id", "rid").collect())
    want = sorted(
        (i, j)
        for i, j in itertools.product(range(30), range(40))
        if i * 10 <= j * 7 + 150 and j * 7 <= i * 10 + 300
    )
    assert got == want
