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


@pytest.mark.slow
def test_cdc_random_mutation_walk_replay_reconstructs_the_model(spark, tmp_path):
    """Model-based end-to-end CDC check: a seeded random walk of merges,
    tombstone merges, predicate deletes and PLAIN OVERWRITES (the commit
    kind with no change files — exercising the feed's snapshot-diff
    fallback mid-stream) runs against both a TableStore and a dict model.
    The table must equal the model after every walk, and a consumer
    replaying the per-commit feed with the standard CDF application rules
    (delete/pre-image removes the key, insert/post-image upserts) must
    reconstruct the model exactly — across every commit kind interleaved."""
    import random

    from f1_datalakehouse_pipeline_spark.streaming.cdc_source import (
        stream_table_changes,
    )

    for seed in (7, 13):
        rng = random.Random(seed)
        store = TableStore(spark, str(tmp_path / f"wh{seed}"), keep_versions=40)
        model: dict[int, str] = {1: "s1", 2: "s2", 3: "s3"}
        store.overwrite(_sess(spark, [(k, v) for k, v in model.items()]),
                        "sessions_silver")
        replay = dict(model)  # consumer bootstraps from the initial snapshot
        cur_dir = str(tmp_path / f"cur{seed}")
        n0 = stream_table_changes(
            store, "sessions_silver", cur_dir,
            lambda df, cid: None, key_cols=["session_key"],
        )
        assert n0 == 0  # cursor parked at the seed version

        for step in range(12):
            op = rng.choice(["merge", "merge", "tombstone", "delete", "overwrite"])
            if op == "merge":
                ks = rng.sample(range(1, 9), rng.randint(1, 3))
                rows = [(k, f"v{seed}.{step}.{k}") for k in ks]
                store.merge_upsert(
                    _sess(spark, rows), "sessions_silver", keys=["session_key"]
                )
                model.update(dict(rows))
            elif op == "tombstone":
                ks = rng.sample(range(1, 9), 2)
                rows = _sess(spark, [(k, "x") for k in ks]).withColumn(
                    "__del", F.lit(True)
                )
                store.merge_upsert(
                    rows, "sessions_silver", keys=["session_key"], delete_col="__del"
                )
                for k in ks:
                    model.pop(k, None)
            elif op == "delete":
                k = rng.randint(1, 8)
                store.delete_where(
                    F.col("session_key") == k, "sessions_silver"
                )
                model.pop(k, None)
            else:  # plain overwrite: arbitrary rewrite, NO change files
                model = {
                    k: f"ow{seed}.{step}.{k}"
                    for k in rng.sample(range(1, 9), rng.randint(2, 4))
                }
                store.overwrite(
                    _sess(spark, list(model.items())), "sessions_silver"
                )

        # the table equals the model…
        got = {
            r.session_key: r.meeting_name
            for r in store.read("sessions_silver").collect()
        }
        assert got == model, f"seed {seed}: table diverged from model"

        # …and the per-commit CDF replay reconstructs it from the seed
        def apply(df, commit_id):
            # standard CDF application within one commit: removals
            # (delete/pre-image) first, then upserts (insert/post-image) —
            # a key both removed and re-upserted in the same commit ends up
            # at its post-image
            rows = df.collect()
            removes = {
                r.session_key
                for r in rows
                if r._change_type in ("delete", "update_preimage")
            }
            upserts = {
                r.session_key: r.meeting_name
                for r in rows
                if r._change_type in ("insert", "update_postimage")
            }
            for k in removes - set(upserts):
                replay.pop(k, None)
            replay.update(upserts)

        n = stream_table_changes(
            store, "sessions_silver", cur_dir, apply, key_cols=["session_key"]
        )
        assert n == 12, f"seed {seed}: expected one batch per mutation"
        assert replay == model, f"seed {seed}: CDF replay diverged from model"
