"""The Python-DataSource CDC streaming reader (streaming/cdc_datasource.py):
``spark.readStream.format("table_changes")`` over a TableStore — offsets are
commit ids, partitions are the commits' write-time change files (executor
Arrow reads, cost ∝ |changes|), Spark's offset log gives exactly-once batch
replay across restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.schemas import conform
from f1_datalakehouse_pipeline_spark.sources.tables import TableStore
from f1_datalakehouse_pipeline_spark.streaming.cdc_datasource import (
    register_table_changes_source,
)


def _sess(spark, rows):
    return conform(
        spark.createDataFrame(
            list(rows), "session_key long, meeting_name string"
        ).select(
            "session_key",
            F.lit(2025).alias("year"),
            F.lit("monaco").alias("grand_prix_name"),
            F.lit("race").alias("session_type"),
            "meeting_name",
            F.lit(None).cast("long").alias("meeting_key"),
            F.lit("2025-03-01 14:00:00").cast("timestamp").alias("date_start"),
            F.lit("2025-03-01 16:00:00").cast("timestamp").alias("date_end"),
            F.lit(False).alias("is_sprint_weekend"),
        ),
        "sessions_silver",
        allow_missing=True,
    )


def _stream(spark, store, keys="session_key"):
    register_table_changes_source(spark)
    return (
        spark.readStream.format("table_changes")
        .option("root", store.root)
        .option("table", "sessions_silver")
        .option("keys", keys)
        .load()
    )


def _drain(spark, stream, checkpoint, sink: list) -> None:
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: sink.extend(df.collect()))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout rather than raising — make
    # a slow-host partial drain loud instead of asserting on half a sink
    assert q.awaitTermination(180), "availableNow drain did not finish in 180s"


def test_readstream_drains_commits_with_ordinals_and_values(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A"), (2, "B")]), "sessions_silver")
    store.merge_upsert(_sess(spark, [(3, "C")]), "sessions_silver", keys=["session_key"])
    store.merge_upsert(_sess(spark, [(2, "B2")]), "sessions_silver", keys=["session_key"])
    store.delete_where(F.col("session_key") == 1, "sessions_silver")

    got: list = []
    _drain(spark, _stream(spark, store), str(tmp_path / "ckpt"), got)
    assert sorted((r.session_key, r._change_type, r._commit_ordinal) for r in got) == [
        (1, "delete", 3),
        (2, "update_postimage", 2),
        (2, "update_preimage", 2),
        (3, "insert", 1),
    ]
    # commit ids are the real version names, and typed columns survive the
    # Arrow path (timestamps as instants, booleans, nullable longs)
    names = {os.path.basename(v) for v in store.versions("sessions_silver")}
    assert {r._commit_id for r in got} <= names
    row = next(r for r in got if r._change_type == "insert")
    assert str(row.date_start) == "2025-03-01 14:00:00"
    assert row.is_sprint_weekend is False and row.meeting_key is None


def test_readstream_checkpoint_restart_is_exactly_once(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    store.merge_upsert(_sess(spark, [(2, "B")]), "sessions_silver", keys=["session_key"])

    ckpt = str(tmp_path / "ckpt")
    first: list = []
    _drain(spark, _stream(spark, store), ckpt, first)
    assert {(r.session_key, r._change_type) for r in first} == {(2, "insert")}

    # no new commits: a restarted drain delivers nothing
    again: list = []
    _drain(spark, _stream(spark, store), ckpt, again)
    assert again == []

    # a new commit after restart is delivered exactly once, never the old
    store.merge_upsert(_sess(spark, [(3, "C")]), "sessions_silver", keys=["session_key"])
    more: list = []
    _drain(spark, _stream(spark, store), ckpt, more)
    assert {(r.session_key, r._change_type) for r in more} == {(3, "insert")}


def test_readstream_plain_overwrite_commit_fails_loudly(spark, tmp_path):
    """A plain overwrite() commit has no row-level delta and the executor
    reader has no snapshot-diff tier: the stream must FAIL with a clear
    message, not serve a partial feed."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    store.overwrite(_sess(spark, [(1, "A"), (2, "B")]), "sessions_silver")

    q = (
        _stream(spark, store)
        .writeStream.foreachBatch(lambda df, bid: None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="no change files"):
        q.awaitTermination(180)


def test_readstream_key_mismatch_fails_loudly(spark, tmp_path):
    """Change files labeled under the writer's keys must not silently serve
    a differently-keyed reader (same contract as table_changes' sidecar
    gate — but the executor reader can't fall back, so it fails)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    store.merge_upsert(_sess(spark, [(2, "B")]), "sessions_silver", keys=["session_key"])

    q = (
        _stream(spark, store, keys="meeting_name")
        .writeStream.foreachBatch(lambda df, bid: None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="no change files"):
        q.awaitTermination(180)
