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


def _capped_stream(spark, store, n: int):
    register_table_changes_source(spark)
    return (
        spark.readStream.format("table_changes")
        .option("root", store.root)
        .option("table", "sessions_silver")
        .option("keys", "session_key")
        .option("maxCommitsPerBatch", str(n))
        .load()
    )


def test_readstream_max_commits_per_batch_paces_live_stream(spark, tmp_path):
    """Admission control (VERDICT r10 item 4): a LIVE stream against a
    bursty producer never plans more than maxCommitsPerBatch commits into
    one micro-batch, every commit arrives exactly once, and per-commit
    ordinals stay contiguous within each batch. (Spark calls latestOffset
    before initialOffset even on a fresh query — spy-logged in
    PERF_NOTES r11 — so the FIRST planned batch of a fresh reader is the
    uncapped catch-up; the cap governs every batch after it, which is the
    mode a pacing option exists for.)"""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=32)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")

    batches: list[list] = []

    def apply(df, bid):
        rows = df.collect()
        if rows:
            batches.append(rows)

    q = (
        _capped_stream(spark, store, 3)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time

        # wait for the first (empty) tick: its initialOffset call seeds the
        # admission cap's base, so every batch the burst below produces is
        # capped — bursting before the seed would race the documented
        # uncapped first batch
        deadline = time.time() + 60
        while time.time() < deadline and q.lastProgress is None:
            time.sleep(0.2)
        assert q.lastProgress is not None, "stream never ticked"

        for i in range(1, 11):  # the 10-commit burst, while the stream runs
            store.merge_upsert(
                _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
            )
        deadline = time.time() + 120
        while time.time() < deadline:
            if {r.session_key for b in batches for r in b} >= set(range(1, 11)):
                break
            time.sleep(1)
    finally:
        q.stop()

    all_rows = [r for b in batches for r in b]
    assert sorted(r.session_key for r in all_rows) == list(range(1, 11))
    n_commits_per_batch = [len({r._commit_id for r in b}) for b in batches]
    assert all(n <= 3 for n in n_commits_per_batch), n_commits_per_batch
    assert len(batches) >= 4, n_commits_per_batch  # 10 commits / <=3 each
    # ordinals are contiguous from 1 within each batch and order commits
    for b in batches:
        by_commit: dict = {}
        for r in b:
            by_commit.setdefault(r._commit_ordinal, set()).add(r._commit_id)
        assert sorted(by_commit) == list(range(1, len(by_commit) + 1))
        assert all(len(cids) == 1 for cids in by_commit.values())


def test_readstream_fresh_reader_first_batch_is_uncapped_catchup(spark, tmp_path):
    """The documented admission-control boundary: a FRESH reader's first
    planned batch (fresh query or committed-WAL restart) is the whole
    pending span, because the Python DataSource API answers latestOffset
    before it reveals any position (latestOffset precedes initialOffset,
    and a capped guess from the oldest retained commit could regress
    Spark's WAL below a restarted consumer's true position — duplicates,
    strictly worse than one big batch). Pinned so a behavior change shows
    up as a test delta, not silently."""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=16)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")
    for i in range(1, 6):
        store.merge_upsert(
            _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
        )

    got: list = []
    _drain(spark, _capped_stream(spark, store, 2), str(tmp_path / "ckpt"), got)
    # one batch, all five commits, exactly once, ordinals 1..5
    assert sorted(r.session_key for r in got) == [1, 2, 3, 4, 5]
    assert len({r._commit_id for r in got}) == 5
    assert sorted({r._commit_ordinal for r in got}) == [1, 2, 3, 4, 5]


def test_readstream_restart_mid_backlog_is_exactly_once(spark, tmp_path):
    """Kill the consumer mid-backlog and restart against the same
    checkpoint: already-served commits never reappear, nothing is lost.
    The restarted reader's first batch is the uncapped remainder (the
    documented fresh-reader case above); pacing resumes after it."""
    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=16)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")

    served: list = []

    def apply(df, bid):
        served.extend(df.collect())

    ckpt = str(tmp_path / "ckpt")
    q = (
        _capped_stream(spark, store, 2)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time

        # seed the cap via the first empty tick (see the pacing test)
        deadline = time.time() + 60
        while time.time() < deadline and q.lastProgress is None:
            time.sleep(0.2)
        assert q.lastProgress is not None, "stream never ticked"

        for i in range(1, 7):
            store.merge_upsert(
                _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
            )
        deadline = time.time() + 120
        while time.time() < deadline and len(served) < 2:
            time.sleep(0.5)
        assert served, "stream served nothing before the kill"
    finally:
        q.stop()  # the mid-backlog kill

    before = sorted(r.session_key for r in served)
    # restart on the same checkpoint: drain the remainder
    rest: list = []
    for _ in range(8):
        batch: list = []
        _drain(spark, _capped_stream(spark, store, 2), ckpt, batch)
        rest.extend(batch)
        if {r.session_key for r in served + rest} >= set(range(1, 7)):
            break
    after = sorted(r.session_key for r in rest)
    # no commit lost across the kill
    assert {r.session_key for r in served + rest} == set(range(1, 7)), (before, after)
    # ...and re-delivery is bounded by foreachBatch's at-least-once unit:
    # ONE replayed batch of <= 2 commits (the kill can land between the
    # sink applying a batch and Spark committing it), never a broad replay
    dupes = [k for k in before if k in set(after)]
    assert len(dupes) <= 2, (before, after)


def test_readstream_crash_inside_foreachbatch_replays_batch(spark, tmp_path):
    """The exactly-once edge the r10 battery didn't inject (VERDICT r10
    item 7): the sink fn dies AFTER Spark wrote the batch's offset range to
    the WAL but BEFORE the sink logic completed. On restart Spark must
    re-plan and re-deliver THAT batch (at-least-once delivery), and an
    idempotent keyed sink converges to the exactly-once state."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    store.merge_upsert(_sess(spark, [(2, "B")]), "sessions_silver", keys=["session_key"])

    ckpt = str(tmp_path / "ckpt")
    sink: dict = {}          # keyed upsert: replay-idempotent by construction
    deliveries: list = []    # every delivery attempt, including the crashed one

    def crash_once_apply(df, bid):
        rows = df.collect()
        if not rows:
            return
        deliveries.append({r.session_key for r in rows})
        # partial apply THEN crash on the first delivery: the replayed batch
        # must overwrite this torn state, not duplicate it
        for r in rows:
            sink[r.session_key] = (r.meeting_name, r._change_type)
        if len(deliveries) == 1:
            raise RuntimeError("injected sink crash after WAL write")

    q = (
        _stream(spark, store)
        .writeStream.foreachBatch(crash_once_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected sink crash"):
        q.awaitTermination(180)
    assert deliveries == [{2}]  # the torn delivery happened
    assert sink == {2: ("B", "insert")}  # ...and left partial state behind

    # restart with the SAME sink function (crash guard now disarmed): Spark
    # replays the WAL-planned batch, the keyed upsert converges
    q2 = (
        _stream(spark, store)
        .writeStream.foreachBatch(crash_once_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180), "replay drain did not finish"
    assert deliveries == [{2}, {2}], "crashed batch was not re-delivered"
    assert sink == {2: ("B", "insert")}  # exactly-once CONVERGED state

    # nothing is served twice beyond the replay: a further drain is empty
    more: list = []
    _drain(spark, _stream(spark, store), ckpt, more)
    assert more == []


def test_reader_max_bytes_per_batch_walk(spark, tmp_path):
    """maxBytesPerBatch, mechanically (the Spark-integration path is the
    maxCommitsPerBatch live test — the two caps share the admission loop):
    a tiny byte budget admits one commit per advance (soft cap: the first
    pending commit always flows however large); a huge budget admits all."""
    from f1_datalakehouse_pipeline_spark.streaming.cdc_datasource import (
        TableChangesStreamReader,
        feed_schema,
    )

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=16)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")
    for i in range(1, 5):
        store.merge_upsert(
            _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
        )

    def reader(**extra):
        return TableChangesStreamReader(
            feed_schema("sessions_silver"),
            {
                "root": store.root,
                "table": "sessions_silver",
                "keys": "session_key",
                **extra,
            },
        )

    # budget of 1 byte < any change file: exactly one commit per advance
    r = reader(maxBytesPerBatch="1")
    off = r.initialOffset()
    steps = 0
    while True:
        nxt = r.latestOffset()
        if nxt == off:
            break
        assert len({p.commit_id for p in r.partitions(off, nxt)}) == 1
        off = nxt
        steps += 1
        assert steps <= 6, "byte cap failed to converge"
    assert steps == 4  # one step per pending commit

    # huge budget: everything in one batch
    r2 = reader(maxBytesPerBatch=str(1 << 40))
    o0 = r2.initialOffset()
    o1 = r2.latestOffset()
    assert len({p.commit_id for p in r2.partitions(o0, o1)}) == 4

    # byte cap composes with the commit cap: min of the two governs
    r3 = reader(maxBytesPerBatch=str(1 << 40), maxCommitsPerBatch="2")
    o0 = r3.initialOffset()
    o1 = r3.latestOffset()
    assert len({p.commit_id for p in r3.partitions(o0, o1)}) == 2


def test_readstream_starting_commit(spark, tmp_path):
    """startingCommit (the Delta startingVersion shape): the feed begins AT
    the named retained commit — that commit is the initial snapshot, only
    LATER commits serve as change rows; an unknown commit fails loudly."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=16)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")
    for i in range(1, 5):
        store.merge_upsert(
            _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
        )
    # versions() lists newest-first; index 2 is the commit that inserted i=2
    mid = os.path.basename(store.versions("sessions_silver")[2])

    register_table_changes_source(spark)

    def stream(start):
        return (
            spark.readStream.format("table_changes")
            .option("root", store.root)
            .option("table", "sessions_silver")
            .option("keys", "session_key")
            .option("startingCommit", start)
            .load()
        )

    got: list = []
    _drain(spark, stream(mid), str(tmp_path / "ckpt"), got)
    assert sorted(r.session_key for r in got) == [3, 4]

    q = (
        stream("v-nonexistent")
        .writeStream.foreachBatch(lambda df, bid: None)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="startingCommit"):
        q.awaitTermination(180)


def test_plain_table_is_not_offset_servable(spark, tmp_path):
    """A plain (append-created) table's dir basename is not a stable offset
    identity — the first overwrite renames the dir to legacy-<hex>, which
    would poison any checkpoint holding the old id (r11 review finding).
    The stream refuses up front with the start-after-first-commit message."""
    from f1_datalakehouse_pipeline_spark.streaming.cdc_datasource import (
        TableChangesStreamReader,
        feed_schema,
    )

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.append(_sess(spark, [(1, "A")]), "sessions_silver")  # plain dir
    r = TableChangesStreamReader(
        feed_schema("sessions_silver"),
        {"root": store.root, "table": "sessions_silver", "keys": "session_key"},
    )
    with pytest.raises(ValueError, match="no committed versions yet"):
        r.initialOffset()
    # ...and after the first real commit the stream starts normally
    store.overwrite(_sess(spark, [(1, "A"), (2, "B")]), "sessions_silver")
    assert r.initialOffset()["commit_id"].startswith(("v-", "legacy-"))


def test_latest_offset_bounded_lag_then_loud_failure(spark, tmp_path):
    """A mid-publish empty listing lags (re-answers the previous offset);
    a PERSISTENT empty listing — the table was removed — must fail loudly
    after a bounded number of samples, never stall forever (r11 review
    finding)."""
    import shutil

    from f1_datalakehouse_pipeline_spark.streaming.cdc_datasource import (
        TableChangesStreamReader,
        feed_schema,
    )

    store = TableStore(spark, str(tmp_path / "wh"), keep_versions=8)
    store.overwrite(_sess(spark, [(1, "A")]), "sessions_silver")
    r = TableChangesStreamReader(
        feed_schema("sessions_silver"),
        {"root": store.root, "table": "sessions_silver", "keys": "session_key"},
    )
    r.initialOffset()
    first = r.latestOffset()

    shutil.rmtree(os.path.join(store.root, ".versions", "sessions_silver"))
    os.unlink(store.path("sessions_silver"))
    lags = 0
    with pytest.raises(ValueError, match="consecutive samples"):
        for _ in range(r._MAX_EMPTY_SAMPLES + 1):
            assert r.latestOffset() == first  # the lag phase
            lags += 1
    assert 1 <= lags < r._MAX_EMPTY_SAMPLES + 1
