"""SCD2 operator unit + invariant tests (SURVEY §5.2.3-4).

Invariants from the reference's never-wired validators and the FIXTURES.md
checklist: exactly one is_current row per entity; valid_to of a closed stint
equals valid_from of the next; incremental merge is idempotent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.operators.scd2 import (
    scd2_from_observations,
    scd2_merge_incremental,
)


def _obs(spark):
    rows = [
        # driver 1: team A → team B (change), multiple observations per stint
        (1, "A", "2025-01-01", 1),
        (1, "A", "2025-02-01", 2),
        (1, "B", "2025-03-01", 3),
        (1, "B", "2025-04-01", 4),
        # driver 2: single team all season
        (2, "C", "2025-01-01", 5),
        (2, "C", "2025-04-01", 6),
        # driver 3: A → B → A (returns to first team: 3 stints, not 2)
        (3, "A", "2025-01-01", 7),
        (3, "B", "2025-02-01", 8),
        (3, "A", "2025-03-01", 9),
    ]
    return spark.createDataFrame(rows, ["driver", "team", "obs_date", "seq"])


def test_scd2_historical_build(spark):
    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).cache()

    rows = {(r.driver, r.stint_id): r for r in dim.collect()}
    assert len(rows) == 6  # 2 + 1 + 3 stints
    # exactly one open row per entity
    open_counts = (
        dim.filter("is_current").groupBy("driver").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts) and len(open_counts) == 3
    # contiguity: valid_to == next stint's valid_from
    assert rows[(1, 1)].valid_to == rows[(1, 2)].valid_from == "2025-03-01"
    assert rows[(3, 1)].valid_to == "2025-02-01"
    assert rows[(3, 2)].valid_to == "2025-03-01"
    assert rows[(3, 3)].is_current and rows[(3, 3)].attr == "A"
    # n_obs counted per stint
    assert rows[(1, 1)].n_obs == 2 and rows[(2, 1)].n_obs == 2


def test_scd2_merge_incremental_idempotent(spark):
    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).select("driver", F.col("attr").alias("team"), "valid_from", "valid_to", "is_current")

    updates = spark.createDataFrame(
        [
            (1, "B", "2025-05-01"),  # no change → passthrough
            (2, "D", "2025-05-01"),  # team change → close + open
            (9, "E", "2025-05-01"),  # brand-new entity → open
        ],
        ["driver", "team", "eff"],
    )

    merged = scd2_merge_incremental(
        dim, updates, entity_col="driver", attr_cols=["team"], effective_col="eff"
    ).cache()

    by_driver = {
        d: sorted(rs, key=lambda r: r.valid_from)
        for d, rs in (
            (k, [r for r in merged.collect() if r.driver == k]) for k in (1, 2, 3, 9)
        )
    }
    assert len(by_driver[1]) == 2  # unchanged
    assert len(by_driver[2]) == 2  # closed + new open
    closed, opened = by_driver[2]
    assert closed.valid_to == "2025-05-01" and not closed.is_current
    assert opened.team == "D" and opened.is_current and opened.valid_from == "2025-05-01"
    assert len(by_driver[9]) == 1 and by_driver[9][0].is_current
    # exactly one open row per entity
    counts = merged.filter("is_current").groupBy("driver").count().collect()
    assert all(r["count"] == 1 for r in counts) and len(counts) == 4

    # idempotence: re-applying the same batch is a no-op
    merged2 = scd2_merge_incremental(
        merged, updates, entity_col="driver", attr_cols=["team"], effective_col="eff"
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, merged2.collect()))
    assert a == b


def test_scd2_merge_backdated_update_clamps_to_valid_from(spark):
    """A late-arriving update older than the open row's valid_from must not
    produce valid_to < valid_from; the boundary clamps to valid_from and the
    contiguity invariant holds."""
    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).select("driver", F.col("attr").alias("team"), "valid_from", "valid_to", "is_current")

    # driver 2's open stint started 2025-01-01; the update is backdated
    updates = spark.createDataFrame([(2, "Z", "2024-06-15")], ["driver", "team", "eff"])
    merged = scd2_merge_incremental(
        dim, updates, entity_col="driver", attr_cols=["team"], effective_col="eff"
    ).cache()

    rows = sorted(
        [r for r in merged.collect() if r.driver == 2], key=lambda r: (r.valid_from, r.is_current)
    )
    closed, opened = rows
    assert closed.valid_to == closed.valid_from == "2025-01-01"  # clamped, not 2024-06-15
    assert opened.valid_from == "2025-01-01" and opened.team == "Z" and opened.is_current
    # invariant: no row anywhere with valid_to < valid_from
    bad = merged.filter(F.col("valid_to") < F.col("valid_from")).count()
    assert bad == 0


def test_scd2_merge_on_late_reject_raises_listing_entities(spark):
    """on_late='reject' fails loudly on a backdated batch, naming the
    offending entities; a forward-dated batch still merges normally."""
    import pytest

    from f1_datalakehouse_pipeline_spark.operators.scd2 import LateUpdateError

    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).select("driver", F.col("attr").alias("team"), "valid_from", "valid_to", "is_current")

    backdated = spark.createDataFrame([(2, "Z", "2024-06-15")], ["driver", "team", "eff"])
    with pytest.raises(LateUpdateError, match="2"):
        scd2_merge_incremental(
            dim, backdated, entity_col="driver", attr_cols=["team"],
            effective_col="eff", on_late="reject",
        )

    # forward-dated updates and brand-new entities pass under reject mode
    ok = spark.createDataFrame(
        [(2, "Z", "2025-06-15"), (9, "E", "2024-01-01")], ["driver", "team", "eff"]
    )
    merged = scd2_merge_incremental(
        dim, ok, entity_col="driver", attr_cols=["team"],
        effective_col="eff", on_late="reject",
    )
    assert merged.filter("driver = 9").count() == 1
    assert merged.filter("driver = 2 AND is_current").collect()[0].team == "Z"

    with pytest.raises(ValueError, match="on_late"):
        scd2_merge_incremental(
            dim, ok, entity_col="driver", attr_cols=["team"],
            effective_col="eff", on_late="ignore",
        )


def test_scd2_merge_clamp_preserves_contiguity_property(spark):
    """Property check: for randomized update batches (forward, exact-boundary
    and backdated effective times), clamp mode never yields valid_to <
    valid_from, keeps exactly one open row per entity, and keeps each
    entity's history contiguous (valid_to == next valid_from)."""
    import random

    rnd = random.Random(7)
    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).select("driver", F.col("attr").alias("team"), "valid_from", "valid_to", "is_current")

    dates = ["2024-01-01", "2024-06-15", "2025-01-01", "2025-03-01", "2025-09-09"]
    for trial in range(4):
        batch = [
            (d, rnd.choice(["A", "B", "C", "D", "Z"]), rnd.choice(dates))
            for d in rnd.sample([1, 2, 3, 7, 8, 9], k=4)
        ]
        updates = spark.createDataFrame(batch, ["driver", "team", "eff"])
        dim = scd2_merge_incremental(
            dim, updates, entity_col="driver", attr_cols=["team"], effective_col="eff"
        ).cache()
        rows = dim.collect()
        # invariant 1: no inverted validity window
        assert all(r.valid_to is None or r.valid_to >= r.valid_from for r in rows), trial
        # invariant 2: exactly one open row per entity
        by_entity = {}
        for r in rows:
            by_entity.setdefault(r.driver, []).append(r)
        for d, rs in by_entity.items():
            assert sum(1 for r in rs if r.is_current) == 1, (trial, d)
            # invariant 3: contiguous history (closed rows chain to the next)
            chain = sorted(rs, key=lambda r: (r.valid_from, r.is_current))
            for a, b in zip(chain, chain[1:]):
                assert a.valid_to == b.valid_from, (trial, d)


def _hist(spark, rows):
    """rows: (driver, team, valid_from, valid_to) — is_current derived."""
    return spark.createDataFrame(
        [(d, t, vf, vt, vt is None) for d, t, vf, vt in rows],
        ["driver", "team", "valid_from", "valid_to", "is_current"],
    )


def test_scd2_splice_into_closed_history(spark):
    """A backdated update lands INSIDE a closed stint: the stint truncates at
    eff, the spliced stint carries the new attrs up to the old boundary, and
    everything downstream is untouched."""
    from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_splice_history

    dim = _hist(spark, [
        (1, "A", "2024-01-01", "2024-06-01"),
        (1, "B", "2024-06-01", "2025-01-01"),
        (1, "C", "2025-01-01", None),
    ])
    upd = spark.createDataFrame([(1, "Z", "2024-03-15")], ["driver", "team", "eff"])
    out = scd2_splice_history(dim, upd, "driver", ["team"], "eff")
    rows = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.team, r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        ("A", "2024-01-01", "2024-03-15", False),
        ("Z", "2024-03-15", "2024-06-01", False),
        ("B", "2024-06-01", "2025-01-01", False),
        ("C", "2025-01-01", None, True),
    ]

    # idempotent: splicing the same update again is a no-op
    again = scd2_splice_history(out, upd, "driver", ["team"], "eff")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_scd2_splice_edge_positions(spark):
    """eff at a stint boundary replaces that stint; eff before all history
    prepends a closed stint; an unseen entity opens a current row; a forward
    eff truncates the open stint (splice subsumes the merge direction)."""
    from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_splice_history

    dim = _hist(spark, [
        (1, "A", "2024-01-01", "2024-06-01"),
        (1, "B", "2024-06-01", None),
        (2, "X", "2024-02-01", None),
    ])
    upd = spark.createDataFrame(
        [
            (1, "R", "2024-06-01"),   # boundary: replaces stint B's attrs
            (2, "P", "2023-01-01"),   # before all history: prepend closed
            (9, "N", "2024-04-01"),   # unseen entity: open row
        ],
        ["driver", "team", "eff"],
    )
    out = scd2_splice_history(dim, upd, "driver", ["team"], "eff")
    got = {
        d: sorted(
            [(r.team, r.valid_from, r.valid_to, r.is_current) for r in out.collect() if r.driver == d]
        )
        for d in (1, 2, 9)
    }
    assert got[1] == [
        ("A", "2024-01-01", "2024-06-01", False),
        ("R", "2024-06-01", None, True),
    ]
    assert got[2] == [
        ("P", "2023-01-01", "2024-02-01", False),
        ("X", "2024-02-01", None, True),
    ]
    assert got[9] == [("N", "2024-04-01", None, True)]


def test_scd2_splice_noop_update_keeps_canonical_history(spark):
    """Splicing attrs identical to the containing stint must not split it:
    adjacent equal stints re-coalesce."""
    from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_splice_history

    dim = _hist(spark, [
        (1, "A", "2024-01-01", "2024-06-01"),
        (1, "B", "2024-06-01", None),
    ])
    upd = spark.createDataFrame([(1, "A", "2024-03-01")], ["driver", "team", "eff"])
    out = scd2_splice_history(dim, upd, "driver", ["team"], "eff")
    rows = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.team, r.valid_from, r.valid_to) for r in rows] == [
        ("A", "2024-01-01", "2024-06-01"),
        ("B", "2024-06-01", None),
    ]


def test_scd2_merge_on_late_splice_end_to_end(spark):
    """on_late='splice' routes a mixed batch (forward change + backdated
    change) through the history splice; invariants hold."""
    dim = scd2_from_observations(
        _obs(spark), entity_col="driver", attr_col="team",
        order_cols=["obs_date", "seq"], time_col="obs_date",
    ).select("driver", F.col("attr").alias("team"), "valid_from", "valid_to", "is_current")

    updates = spark.createDataFrame(
        [(1, "Q", "2025-06-01"), (2, "Z", "2024-06-15")],
        ["driver", "team", "eff"],
    )
    out = scd2_merge_incremental(
        dim, updates, entity_col="driver", attr_cols=["team"],
        effective_col="eff", on_late="splice",
    ).cache()
    rows = out.collect()
    # structural invariants
    assert all(r.valid_to is None or r.valid_to > r.valid_from for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r.driver, []).append(r)
    for d, rs in by.items():
        assert sum(1 for r in rs if r.is_current) == 1, d
        chain = sorted(rs, key=lambda r: r.valid_from)
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to == b.valid_from, d
    # the forward update opened a new current stint for driver 1
    d1 = max(by[1], key=lambda r: r.valid_from)
    assert d1.team == "Q" and d1.is_current and d1.valid_from == "2025-06-01"
    # the backdated update spliced into driver 2's history, not clamped
    assert any(r.team == "Z" and r.valid_from == "2024-06-15" for r in by[2])


def test_scd2_splice_never_drops_uncontained_updates(spark):
    """Updates whose effective time is contained by NO stint must still
    land: after a fully-closed (retired) history they re-open the entity;
    inside a gap between non-contiguous stints they fill exactly the gap."""
    from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_splice_history

    dim = _hist(spark, [
        # entity 1: retired (no open row)
        (1, "A", "2024-01-01", "2024-06-01"),
        # entity 2: gapped history [Jan..Mar) ... [Sep..open)
        (2, "X", "2024-01-01", "2024-03-01"),
        (2, "Y", "2024-09-01", None),
    ])
    upd = spark.createDataFrame(
        [(1, "B", "2024-07-01"), (2, "G", "2024-05-01")],
        ["driver", "team", "eff"],
    )
    out = scd2_splice_history(dim, upd, "driver", ["team"], "eff")
    got = {
        d: sorted(
            (r.team, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect() if r.driver == d
        )
        for d in (1, 2)
    }
    # retired entity re-opens at eff
    assert got[1] == [
        ("A", "2024-01-01", "2024-06-01", False),
        ("B", "2024-07-01", None, True),
    ]
    # gap update fills [eff, next stint start), existing stints untouched
    assert got[2] == [
        ("G", "2024-05-01", "2024-09-01", False),
        ("X", "2024-01-01", "2024-03-01", False),
        ("Y", "2024-09-01", None, True),
    ]
    # exactly one open row per entity either way
    for d, rows in got.items():
        assert sum(1 for r in rows if r[3]) == 1, d


def test_scd2_splice_model_based_random_sequences(spark):
    """Model-based check: a pure-Python reference implementation of the
    splice contract (truncate containing stint, insert [eff, next_start),
    coalesce adjacent equals) must agree with the DataFrame operator over
    randomized splice sequences, including gaps, boundaries and repeats."""
    import random

    from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_splice_history

    def model_splice(stints, team, eff):
        """stints: sorted [(team, vf, vt)] with vt None = open."""
        out = []
        inserted = False
        for t, vf, vt in stints:
            contains = vf <= eff and (vt is None or eff < vt)
            if contains:
                if vf < eff:
                    out.append((t, vf, eff))
                out.append((team, eff, vt))
                inserted = True
            else:
                out.append((t, vf, vt))
        if not inserted:
            later = [vf for _, vf, _ in stints if vf > eff]
            out.append((team, eff, min(later) if later else None))
        out.sort(key=lambda s: s[1])
        # coalesce adjacent equal-attr contiguous stints
        merged = []
        for s in out:
            if merged and merged[-1][0] == s[0] and merged[-1][2] == s[1]:
                merged[-1] = (s[0], merged[-1][1], s[2])
            else:
                merged.append(list(s) and (s[0], s[1], s[2]))
        return merged

    rnd = random.Random(17)
    dates = [f"2024-{m:02d}-01" for m in range(1, 13)]
    teams = ["A", "B", "C", "D"]
    model = {1: [("A", "2024-03-01", None)], 2: [("B", "2024-02-01", "2024-05-01")]}
    dim = _hist(
        spark,
        [(d, t, vf, vt) for d, ss in model.items() for t, vf, vt in ss],
    )
    for step in range(6):
        batch = []
        for d in sorted(model):
            team, eff = rnd.choice(teams), rnd.choice(dates)
            model[d] = model_splice(model[d], team, eff)
            batch.append((d, team, eff))
        upd = spark.createDataFrame(batch, ["driver", "team", "eff"])
        out_rows = scd2_splice_history(dim, upd, "driver", ["team"], "eff").collect()
        got = {}
        for r in out_rows:
            got.setdefault(r.driver, []).append((r.team, r.valid_from, r.valid_to))
        for d in got:
            got[d].sort(key=lambda s: s[1])
        assert got == model, f"diverged at step {step}"
        # rebuild flat (lineage-free) for the next step; plan chaining is
        # covered by the dedicated idempotence test
        dim = _hist(
            spark,
            [(d, t, vf, vt) for d, ss in got.items() for t, vf, vt in ss],
        )
