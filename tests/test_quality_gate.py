"""Streaming write-audit-publish quality gate: per-batch expectation audit,
quarantine routing, critical-check batch abort, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.sources.testdata import load_table
from f1_datalakehouse_pipeline_spark.streaming.quality_gate import (
    audit_split,
    quality_gate_stream,
)

from tests.conftest import SF_DIR

CHECKS = lambda: {  # noqa: E731 - fresh Column objects per test
    "custkey_not_null": F.col("o_custkey").isNull(),
    "status_enum": F.col("o_orderstatus").isNull()
    | ~F.col("o_orderstatus").isin("O", "F", "P"),
}


def _stage_batches(spark, tmp_path):
    """Two single-file batches: batch A has 3 planted null custkeys; batch B
    has 2 planted bad statuses."""
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    a = o.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 400 == 0, F.lit(None)).otherwise(
            F.col("o_custkey")
        ),
    )
    b = o.filter(F.col("o_orderkey") % 4 == 1).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 401 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    src = str(tmp_path / "landing")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    return src, a, b


def test_audit_split_routes_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 10, "O"), (2, None, "F"), (3, 30, "X"), (4, None, "X")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    )
    clean, quarantined, metrics = audit_split(df, CHECKS())
    assert {r.o_orderkey for r in clean.collect()} == {1}
    q = {r.o_orderkey: sorted(r.violated_checks) for r in quarantined.collect()}
    assert q == {
        2: ["custkey_not_null"],
        3: ["status_enum"],
        4: ["custkey_not_null", "status_enum"],
    }
    m = {r.check_name: (r.violations, r.total) for r in metrics.collect()}
    assert m == {"custkey_not_null": (2, 4), "status_enum": (2, 4)}


def test_gate_stream_splits_match_batch_semantics(spark, tmp_path):
    src, a, b = _stage_batches(spark, tmp_path)
    paths = {k: str(tmp_path / k) for k in ("delivery", "quarantine", "metrics")}
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = quality_gate_stream(
        stream,
        CHECKS(),
        delivery_path=paths["delivery"],
        quarantine_path=paths["quarantine"],
        metrics_path=paths["metrics"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        ledger_dir=str(tmp_path / "ledger"),
    )
    assert q.awaitTermination(180)

    both = a.unionByName(b)
    want_clean = {
        r.o_orderkey
        for r in both.filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderstatus").isin("O", "F", "P")
        ).collect()
    }
    got_clean = {r.o_orderkey for r in spark.read.parquet(paths["delivery"]).collect()}
    assert got_clean == want_clean

    quar = spark.read.parquet(paths["quarantine"]).collect()
    assert {r.o_orderkey for r in quar} == (
        {r.o_orderkey for r in both.collect()} - want_clean
    )
    # every quarantined row names at least one violated check
    assert all(len(r.violated_checks) >= 1 for r in quar)

    metrics = spark.read.parquet(paths["metrics"]).collect()
    # one row per check per batch, none batch-quarantined
    assert {(r.batch_id, r.check_name) for r in metrics} == {
        (i, c) for i in (0, 1) for c in CHECKS()
    }
    assert not any(r.batch_quarantined for r in metrics)
    # per-batch totals reconcile: clean + quarantined == total
    by_batch = {}
    for r in metrics:
        by_batch[r.batch_id] = r.total
    deliv = spark.read.parquet(paths["delivery"]).groupBy("batch_id").count().collect()
    quarc = (
        spark.read.parquet(paths["quarantine"]).groupBy("batch_id").count().collect()
    )
    got_tot = {r.batch_id: r["count"] for r in deliv}
    for r in quarc:
        got_tot[r.batch_id] = got_tot.get(r.batch_id, 0) + r["count"]
    assert got_tot == by_batch


def test_gate_critical_check_quarantines_whole_batch(spark, tmp_path):
    src, a, b = _stage_batches(spark, tmp_path)
    paths = {k: str(tmp_path / k) for k in ("delivery", "quarantine", "metrics")}
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = quality_gate_stream(
        stream,
        CHECKS(),
        delivery_path=paths["delivery"],
        quarantine_path=paths["quarantine"],
        metrics_path=paths["metrics"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        ledger_dir=str(tmp_path / "ledger"),
        critical={"status_enum"},
    )
    assert q.awaitTermination(180)

    metrics = spark.read.parquet(paths["metrics"]).collect()
    aborted = {r.batch_id for r in metrics if r.batch_quarantined}
    assert len(aborted) == 1  # only the bad-status batch fails the audit
    (bad_batch,) = aborted

    deliv = spark.read.parquet(paths["delivery"]).collect()
    assert not any(r.batch_id == bad_batch for r in deliv)
    # the aborted batch is quarantined IN FULL (clean rows included, with
    # empty violated_checks), so nothing from it published
    quar = spark.read.parquet(paths["quarantine"]).filter(
        F.col("batch_id") == bad_batch
    )
    n_bad_batch = next(r.total for r in metrics if r.batch_id == bad_batch)
    assert quar.count() == n_bad_batch
    assert quar.filter(F.size("violated_checks") == 0).count() > 0


def test_gate_replay_skips_committed_batches(spark, tmp_path):
    src, a, b = _stage_batches(spark, tmp_path)
    paths = {k: str(tmp_path / k) for k in ("delivery", "quarantine", "metrics")}

    def run():
        stream = (
            spark.readStream.schema(
                "o_orderkey long, o_custkey long, o_orderstatus string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = quality_gate_stream(
            stream,
            CHECKS(),
            delivery_path=paths["delivery"],
            quarantine_path=paths["quarantine"],
            metrics_path=paths["metrics"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            ledger_dir=str(tmp_path / "ledger"),
        )
        assert q.awaitTermination(180)

    run()
    first = spark.read.parquet(paths["delivery"]).count()
    first_m = spark.read.parquet(paths["metrics"]).count()
    # restart the drain with nothing new: the checkpoint frontier delivers
    # zero batches, sinks unchanged (ledger-level replay of a REDELIVERED
    # batch id is unit-covered by test_exactly_once_batch_writer_*)
    run()
    assert spark.read.parquet(paths["delivery"]).count() == first
    assert spark.read.parquet(paths["metrics"]).count() == first_m
    metrics = spark.read.parquet(paths["metrics"]).collect()
    assert len({(r.batch_id, r.check_name) for r in metrics}) == len(metrics)


def test_gate_sinks_survive_static_overwrite_mode(spark, tmp_path):
    """The per-batch sink overwrite pins partitionOverwriteMode=dynamic ON
    THE WRITER, so a caller whose session runs Spark's default STATIC mode
    still keeps every previously published batch — under static semantics
    batch 1's mode('overwrite') write would otherwise delete batch 0's
    partition from all three sinks."""
    src, a, b = _stage_batches(spark, tmp_path)
    paths = {k: str(tmp_path / k) for k in ("delivery", "quarantine", "metrics")}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        stream = (
            spark.readStream.schema(
                "o_orderkey long, o_custkey long, o_orderstatus string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = quality_gate_stream(
            stream,
            CHECKS(),
            delivery_path=paths["delivery"],
            quarantine_path=paths["quarantine"],
            metrics_path=paths["metrics"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            ledger_dir=str(tmp_path / "ledger"),
        )
        assert q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for p in paths.values():
        got = {r.batch_id for r in spark.read.parquet(p).select("batch_id").distinct().collect()}
        assert got == {0, 1}, (p, got)


def test_gate_rerun_overwrites_instead_of_duplicating(spark, tmp_path):
    """A batch re-processed with the same batch_id (lost ledger + lost
    checkpoint — the worst-case replay) must REPLACE its partition in every
    sink, not append beside it: the sinks are dynamic partition overwrites
    keyed by batch_id, which is the idempotence exactly_once_batch_writer
    requires of its upsert."""
    import shutil

    src, a, b = _stage_batches(spark, tmp_path)
    paths = {k: str(tmp_path / k) for k in ("delivery", "quarantine", "metrics")}

    def run():
        stream = (
            spark.readStream.schema(
                "o_orderkey long, o_custkey long, o_orderstatus string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = quality_gate_stream(
            stream,
            CHECKS(),
            delivery_path=paths["delivery"],
            quarantine_path=paths["quarantine"],
            metrics_path=paths["metrics"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            ledger_dir=str(tmp_path / "ledger"),
        )
        assert q.awaitTermination(180)

    run()
    first = {k: spark.read.parquet(p).count() for k, p in paths.items()}
    # lose BOTH the checkpoint and the ledger: the whole drain re-delivers
    # with the same batch ids 0,1
    shutil.rmtree(str(tmp_path / "ckpt"))
    shutil.rmtree(str(tmp_path / "ledger"))
    run()
    after = {k: spark.read.parquet(p).count() for k, p in paths.items()}
    assert after == first
