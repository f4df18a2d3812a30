"""The CDC streaming source (streaming/cdc_source.py, VERDICT r9 item 5):
TableStore mutation → per-commit change feed → incremental downstream apply,
with per-commit durable-cursor advancement (exactly-once when the apply is
idempotent) and the WAP quality-gate composition."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.schemas import conform
from f1_datalakehouse_pipeline_spark.sources.tables import TableStore
from f1_datalakehouse_pipeline_spark.streaming.cdc_source import (
    cdc_quality_gate_apply,
    stream_table_changes,
)


def _sess(spark, rows):
    """sessions rows keyed by session_key with a mutable meeting_name."""
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


def _three_commits(spark, store):
    """Seed + a 3-commit mutation sequence: insert / update / delete."""
    store.overwrite(_sess(spark, [(1, "A"), (2, "B")]), "sessions_silver")
    store.merge_upsert(_sess(spark, [(3, "C")]), "sessions_silver", keys=["session_key"])
    store.merge_upsert(_sess(spark, [(2, "B2")]), "sessions_silver", keys=["session_key"])
    store.delete_where(F.col("session_key") == 1, "sessions_silver")


def test_three_commit_sequence_is_three_micro_batches(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    _three_commits(spark, store)

    batches: list[tuple[str, frozenset]] = []

    def apply(df, commit_id):
        rows = df.collect()
        assert {r._commit_id for r in rows} == {commit_id}
        batches.append(
            (commit_id, frozenset((r.session_key, r._change_type) for r in rows))
        )

    n = stream_table_changes(
        store, "sessions_silver", str(tmp_path / "cur"), apply,
        key_cols=["session_key"],
    )
    assert n == 3 and len(batches) == 3
    # one micro-batch per commit, delivered oldest first with the mutation
    # sequence's own contents
    assert [b[1] for b in batches] == [
        frozenset({(3, "insert")}),
        frozenset({(2, "update_preimage"), (2, "update_postimage")}),
        frozenset({(1, "delete")}),
    ]
    # commit ids are the real version-chain names, oldest first
    vs = [os.path.basename(v) for v in store.versions("sessions_silver")]
    assert [b[0] for b in batches] == vs[2::-1][:3]

    # drained: a second run delivers nothing (cursor is durable)
    assert (
        stream_table_changes(
            store, "sessions_silver", str(tmp_path / "cur"), apply,
            key_cols=["session_key"],
        )
        == 0
    )
    # one more commit → exactly one more batch
    store.merge_upsert(_sess(spark, [(9, "Z")]), "sessions_silver", keys=["session_key"])
    assert (
        stream_table_changes(
            store, "sessions_silver", str(tmp_path / "cur"), apply,
            key_cols=["session_key"],
        )
        == 1
    )
    assert batches[-1][1] == frozenset({(9, "insert")})


def test_crash_mid_drain_replays_only_the_unapplied_commit(spark, tmp_path):
    """Kill the apply on the SECOND commit: the first commit's cursor
    advancement must stick (no re-delivery), and the rerun must resume at
    exactly the failed commit — at most ONE commit is ever re-applied."""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    _three_commits(spark, store)

    seen: list[str] = []

    def crashing_apply(df, commit_id):
        if len(seen) == 1:
            raise RuntimeError("killed mid-apply")
        seen.append(commit_id)

    with pytest.raises(RuntimeError, match="killed mid-apply"):
        stream_table_changes(
            store, "sessions_silver", str(tmp_path / "cur"), crashing_apply,
            key_cols=["session_key"],
        )
    assert len(seen) == 1  # commit 1 applied and durably committed

    resumed: list[str] = []
    n = stream_table_changes(
        store, "sessions_silver", str(tmp_path / "cur"),
        lambda df, cid: resumed.append(cid), key_cols=["session_key"],
    )
    vs = [os.path.basename(v) for v in store.versions("sessions_silver")]
    assert n == 2
    assert resumed == [vs[1], vs[0]]  # the failed commit, then the last
    assert seen[0] == vs[2]  # and the first was never re-delivered


def test_max_batches_bounds_the_run_and_the_cursor_resumes(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    _three_commits(spark, store)
    got: list[str] = []
    args = (store, "sessions_silver", str(tmp_path / "cur"))
    assert stream_table_changes(
        *args, lambda df, cid: got.append(cid),
        key_cols=["session_key"], max_batches=2,
    ) == 2
    assert stream_table_changes(
        *args, lambda df, cid: got.append(cid), key_cols=["session_key"]
    ) == 1
    assert len(got) == len(set(got)) == 3


def test_tail_mode_waits_for_and_delivers_a_late_commit(spark, tmp_path):
    """available_now=False keeps polling: a commit landing AFTER the drain
    started is still delivered (the long-running tail shape)."""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    got: list[str] = []

    def land_later():
        time.sleep(1.0)
        store.merge_upsert(
            _sess(spark, [(2, "B")]), "sessions_silver", keys=["session_key"]
        )

    t = threading.Thread(target=land_later)
    t.start()
    n = stream_table_changes(
        store, "sessions_silver", str(tmp_path / "cur"),
        lambda df, cid: got.append(cid), key_cols=["session_key"],
        available_now=False, poll_interval_s=0.1, max_batches=1,
    )
    t.join()
    assert n == 1 and len(got) == 1


def test_cdc_quality_gate_composition(spark, tmp_path):
    """The end-to-end WAP composition: each commit's change rows route
    through the expectation battery — violating rows quarantine, a CRITICAL
    violation quarantines the whole commit, per-check metrics land once per
    commit, and every sink is partitioned by commit_id (idempotent)."""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")

    # commit 1: two clean inserts
    store.merge_upsert(
        _sess(spark, [(2, "B"), (3, "C")]), "sessions_silver", keys=["session_key"]
    )
    # commit 2: one row violating the (non-critical) null-name check
    store.merge_upsert(
        _sess(spark, [(4, None)]), "sessions_silver", keys=["session_key"]
    )
    # commit 3: a CRITICAL violation (negative key) plus a clean row
    store.merge_upsert(
        _sess(spark, [(-5, "bad"), (6, "D")]), "sessions_silver", keys=["session_key"]
    )

    checks = {
        "null_name": F.col("meeting_name").isNull(),
        "neg_key": F.col("session_key") < 0,
    }
    delivery = str(tmp_path / "delivery")
    quarantine = str(tmp_path / "quarantine")
    metrics = str(tmp_path / "metrics")
    n = stream_table_changes(
        store,
        "sessions_silver",
        str(tmp_path / "cur"),
        cdc_quality_gate_apply(
            checks, delivery, quarantine, metrics, critical={"neg_key"}
        ),
        key_cols=["session_key"],
    )
    assert n == 3

    vs = [os.path.basename(v) for v in store.versions("sessions_silver")]
    c1, c2, c3 = vs[2], vs[1], vs[0]

    dlv = spark.read.parquet(delivery)
    assert {
        (r.session_key, r.commit_id) for r in dlv.collect()
    } == {(2, c1), (3, c1)}  # commit 2 all-quarantined rowwise, commit 3 WAP-aborted

    q = spark.read.parquet(quarantine)
    by_commit = {}
    for r in q.collect():
        by_commit.setdefault(r.commit_id, set()).add(
            (r.session_key, tuple(r.violated_checks))
        )
    assert by_commit == {
        c2: {(4, ("null_name",))},
        # critical commit: BOTH rows quarantined, the clean one with no flags
        c3: {(-5, ("neg_key",)), (6, ())},
    }

    m = spark.read.parquet(metrics)
    mrows = {(r.commit_id, r.check_name): r for r in m.collect()}
    assert len(mrows) == 6  # 2 checks × 3 commits
    assert mrows[(c2, "null_name")].violations == 1
    assert not mrows[(c2, "null_name")].batch_quarantined
    assert mrows[(c3, "neg_key")].violations == 1
    assert mrows[(c3, "neg_key")].batch_quarantined

    # idempotence: replaying the same commits REPLACES the partitions
    cur2 = str(tmp_path / "cur2")
    stream_table_changes(
        store,
        "sessions_silver",
        cur2,
        cdc_quality_gate_apply(
            checks, delivery, quarantine, metrics, critical={"neg_key"}
        ),
        key_cols=["session_key"],
    )
    assert spark.read.parquet(delivery).count() == 2
    assert spark.read.parquet(quarantine).count() == 3
    assert spark.read.parquet(metrics).count() == 6
