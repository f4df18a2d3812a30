"""Profile the fixed per-run cost of the ``table_changes`` readStream tier
(VERDICT r10 item 8): an availableNow drain carries ~5-8 s of machinery
that the pull-loop tier (streaming/cdc_source.py) doesn't — this script
decomposes it so the constant is attributed, not guessed.

Legs (all on the same warehouse + commits, timed wall-clock):

1. ``empty_drain``      — availableNow query over a CAUGHT-UP stream: no
   batch is planned, so the reading is pure machinery (streaming query
   init, checkpoint WAL round-trips, python-datasource runner spin-up for
   offset calls, availableNow latch + shutdown).
2. ``offset_calls``     — driver-side reader instantiated directly:
   initialOffset + latestOffset + partitions round trips WITHOUT Spark
   (the store-metadata share of leg 1; the difference is Spark machinery).
3. ``k_commit_drain``   — availableNow drain of K pending commits through
   a fresh checkpoint (leg 1's machinery + planning + the executor Arrow
   read + foreachBatch).
4. ``pull_loop_drain``  — streaming/cdc_source.stream_table_changes over
   the same K commits from a fresh cursor (the cheap tier's total for the
   identical work).

Usage: python tools/profile_readstream.py [K]
       python tools/profile_readstream.py --backlog N CAP
The second form measures admission control at backlog scale: N pending
commits drained through a LIVE capped stream (processingTime trigger, cap
seeded by the first empty tick), reporting batch count, max commits per
batch, and wall — the evidence that a deep backlog flows as ceil(N/CAP)
bounded batches instead of one giant plan.
Prints one JSON line; humans read PERF_NOTES for the adjudicated numbers.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark import get_spark
from f1_datalakehouse_pipeline_spark.schemas import conform
from f1_datalakehouse_pipeline_spark.sources.tables import TableStore
from f1_datalakehouse_pipeline_spark.streaming.cdc_datasource import (
    TableChangesStreamReader,
    feed_schema,
    register_table_changes_source,
)
from f1_datalakehouse_pipeline_spark.streaming.cdc_source import (
    stream_table_changes,
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


def _stream(spark, store, **opts):
    register_table_changes_source(spark)
    reader = (
        spark.readStream.format("table_changes")
        .option("root", store.root)
        .option("table", "sessions_silver")
        .option("keys", "session_key")
    )
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def _drain(spark, store, ckpt) -> float:
    t0 = time.time()
    q = (
        _stream(spark, store)
        .writeStream.foreachBatch(lambda df, bid: df.collect())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "drain did not finish"
    return time.time() - t0


def backlog_main(n: int, cap: int) -> None:
    """Drain an n-commit backlog through a capped LIVE stream; one JSON line."""
    import json as _json

    spark = get_spark("readstream-backlog")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="rs_backlog_")
    store = TableStore(spark, os.path.join(tmp, "wh"), keep_versions=n + 4)
    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")

    batches: list[set] = []
    q = (
        _stream(spark, store, maxCommitsPerBatch=cap)
        .writeStream.foreachBatch(
            lambda df, bid: (
                lambda rows: batches.append({r._commit_id for r in rows})
                if rows
                else None
            )(df.collect())
        )
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    # seed the cap with the first empty tick, then build the backlog while
    # the consumer is PAUSED mid-tick-cycle (commits land faster than the
    # drain): the backlog accrues because each batch is capped, not because
    # the producer outruns one tick
    deadline = time.time() + 60
    while time.time() < deadline and q.lastProgress is None:
        time.sleep(0.2)
    t0 = time.time()
    for i in range(1, n + 1):
        store.merge_upsert(
            _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
        )
    produce_s = time.time() - t0
    deadline = time.time() + 600
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= n:
            break
        time.sleep(0.5)
    drain_s = time.time() - t0 - produce_s
    q.stop()
    print(
        _json.dumps(
            {
                "backlog_commits": n,
                "cap": cap,
                "n_batches": len(batches),
                "max_commits_per_batch": max((len(b) for b in batches), default=0),
                "commits_served": sum(len(b) for b in batches),
                "produce_s": round(produce_s, 2),
                "drain_after_produce_s": round(drain_s, 2),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--backlog":
        backlog_main(int(sys.argv[2]), int(sys.argv[3]))
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("readstream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="rs_profile_")
    store = TableStore(spark, os.path.join(tmp, "wh"), keep_versions=k + 4)

    store.overwrite(_sess(spark, [(0, "seed")]), "sessions_silver")
    for i in range(1, k + 1):
        store.merge_upsert(
            _sess(spark, [(i, f"S{i}")]), "sessions_silver", keys=["session_key"]
        )

    out: dict[str, float | int] = {"k_commits": k}

    # leg 3 first so its checkpoint is fresh; repeat for spread
    out["k_commit_drain_s"] = [
        round(_drain(spark, store, os.path.join(tmp, f"ck_full_{i}")), 3)
        for i in range(3)
    ]
    # leg 1: drains on an ALREADY-drained checkpoint = pure machinery
    ck = os.path.join(tmp, "ck_full_0")
    out["empty_drain_s"] = [round(_drain(spark, store, ck), 3) for i in range(3)]

    # leg 2: raw offset/planning calls, no Spark streaming engine
    t0 = time.time()
    r = TableChangesStreamReader(
        feed_schema("sessions_silver"),
        {"root": store.root, "table": "sessions_silver", "keys": "session_key"},
    )
    i0, l0 = r.initialOffset(), r.latestOffset()
    parts = r.partitions(i0, l0)
    out["offset_calls_s"] = round(time.time() - t0, 3)
    out["n_partitions"] = len(parts)

    # leg 4: the pull-loop tier over the same commits, fresh cursor each run
    legs = []
    for i in range(3):
        t0 = time.time()
        n = stream_table_changes(
            store,
            "sessions_silver",
            os.path.join(tmp, f"cur_{i}"),
            lambda df, cid: df.collect(),
            key_cols=["session_key"],
            available_now=True,
        )
        legs.append(round(time.time() - t0, 3))
    out["pull_loop_drain_s"] = legs
    out["pull_loop_commits"] = n

    out["load_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
