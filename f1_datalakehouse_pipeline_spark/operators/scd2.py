"""SCD Type 2 dimension building — generalized, shuffle-minimal.

Reference semantics: src/jobs/utils/transformations/scd.py:199-245 (historical
build: stint detection per entity → ``valid_from = min(observation time)`` →
``valid_to = lead(valid_from)`` → ``is_current = valid_to IS NULL``), with the
reference's ``max``-builtin bug at scd.py:108 fixed (we use ``F.max``), and the
non-idempotent collect()+UPDATE+append incremental path
(src/jobs/utils/transformations/common.py:418-471) replaced with a pure
DataFrame merge that is safe to re-run.

Scale notes (100 TB):
- Everything is expressed per-entity with window functions sharing ONE
  partitioning (``entity_col``), so Catalyst plans a single shuffle for the
  stint detection + numbering + grouping + lead chain.
- No driver-side ``collect()`` of entity ids (the reference's approach builds
  an ``IN (...)`` SQL string — unusable at scale and injection-prone).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_observations(
    observations: DataFrame,
    entity_col: str,
    attr_col: str,
    order_cols: Sequence[str],
    time_col: str,
) -> DataFrame:
    """Collapse an (entity, attribute, time) observation stream into SCD2 rows.

    Consecutive equal attribute values (ordered by ``order_cols`` within each
    entity) form one *stint*; each stint becomes one dimension row with
    ``valid_from``/``valid_to``/``is_current`` and ``n_obs``.

    Returns columns: ``entity_col, stint_id, attr, valid_from, n_obs,
    valid_to, is_current``.
    """
    order = [F.col(c).asc() for c in order_cols]
    w_seq = Window.partitionBy(entity_col).orderBy(*order)
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    attr = F.col(attr_col)
    prev = F.lag(attr).over(w_seq)
    changed = F.when(prev.isNull() | (prev != attr), 1).otherwise(0)

    keep = list(dict.fromkeys([entity_col, attr_col, time_col, *order_cols]))
    stints = observations.select(*keep).withColumn(
        "stint_id", F.sum(changed).over(w_run).cast("long")
    )

    grouped = stints.groupBy(
        entity_col, "stint_id", attr.alias("attr")
    ).agg(
        F.min(time_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )

    w_stint = Window.partitionBy(entity_col).orderBy("stint_id")
    valid_to = F.lead("valid_from").over(w_stint)
    return grouped.select(
        entity_col,
        "stint_id",
        "attr",
        "valid_from",
        "n_obs",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


class LateUpdateError(ValueError):
    """Raised by ``scd2_merge_incremental(on_late="reject")`` when a batch
    carries a backdated update for an already-open dimension row."""


def scd2_coalesce_stints(
    dim: DataFrame, entity_col: str, attr_cols: Sequence[str]
) -> DataFrame:
    """Merge adjacent stints with identical attributes into one row
    (canonical SCD2 form: consecutive rows always differ in some attribute).

    Contiguity is respected: only neighbors with ``prev.valid_to ==
    next.valid_from`` merge. One window partitioning (entity) + one groupBy
    — the islands pattern, no self-join.
    """
    w = Window.partitionBy(entity_col).orderBy("valid_from")
    same_attrs = F.lit(True)
    for c in attr_cols:
        same_attrs = same_attrs & F.col(c).eqNullSafe(F.lag(c).over(w))
    contiguous = F.lag("valid_to").over(w).eqNullSafe(F.col("valid_from"))
    new_island = F.when(same_attrs & contiguous, 0).otherwise(1)
    run = Window.partitionBy(entity_col).orderBy("valid_from").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grouped = (
        dim.withColumn("__island", F.sum(new_island).over(run))
        .groupBy(entity_col, "__island", *attr_cols)
        .agg(
            F.min("valid_from").alias("valid_from"),
            # the island's end = the LAST member's valid_to (may be NULL =
            # open); max_by orders members by valid_from
            F.max_by("valid_to", "valid_from").alias("valid_to"),
        )
    )
    return grouped.select(
        entity_col,
        *attr_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_splice_history(
    current_dim: DataFrame,
    updates: DataFrame,
    entity_col: str,
    attr_cols: Sequence[str],
    effective_col: str | Column,
) -> DataFrame:
    """Splice a backdated update INTO closed history (true history rewrite —
    beyond the reference, whose incremental path only applies updates
    forward; scd.py:100-137).

    For each update ``(entity, attrs, eff)``:

    - the stint containing ``eff`` (``valid_from <= eff < valid_to``, open
      stint = infinite end) is truncated at ``eff`` (dropped entirely when
      ``eff`` equals its start — the update supersedes it);
    - a new stint ``[eff, old_end)`` with the update's attributes is
      inserted, inheriting the truncated stint's open/closed status;
    - an ``eff`` contained by NO stint splices ``[eff, next_start)`` where
      ``next_start`` is the first stint starting after ``eff`` (open when
      none does): before-all-history prepends a closed stint, a gap between
      non-contiguous stints fills exactly that gap, an ``eff`` after a fully
      closed (retired) history re-opens the entity, and an unseen entity
      opens a fresh current row — no update is ever silently dropped;
    - adjacent stints left equal by a no-op splice are re-merged
      (:func:`scd2_coalesce_stints`), so splicing is IDEMPOTENT and a
      same-attribute splice leaves the canonical history unchanged.

    ``updates`` must hold one row per entity. Everything runs on one
    entity-partitioned shuffle + one groupBy: no driver-side state, any
    dimension size. Returns columns ``entity, attrs..., valid_from,
    valid_to, is_current`` with ``is_current == valid_to IS NULL``.

    Note on contiguity: a splice into a GAP of an already-gapped history
    (or after a retirement) keeps the hole boundaries honest — the new
    stint covers ``[eff, next_start)`` and the pre-existing hole before
    ``eff`` is preserved, not papered over. Histories built by this module
    are gap-free, so the pipeline's ``scd2_contiguous`` invariant is
    unaffected.
    """
    eff = F.col(effective_col) if isinstance(effective_col, str) else effective_col
    u = updates.select(
        F.col(entity_col),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        eff.alias("__eff"),
    )
    dim_cols = [entity_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    d = current_dim.select(*dim_cols).join(u, entity_col, "full_outer")

    has_row = F.col("valid_from").isNotNull()
    has_u = F.col("__eff").isNotNull()
    contains = (
        has_row
        & has_u
        & (F.col("valid_from") <= F.col("__eff"))
        & (F.col("valid_to").isNull() | (F.col("__eff") < F.col("valid_to")))
    )

    # SINGLE PASS over the joined frame (r4): every output stint is emitted
    # from ONE projection via array+explode, so the join/scan is never
    # recomputed per branch (the previous 4-branch union planned 8 scans
    # with zero exchange reuse — the shape that dies at 100 TB). Placement
    # facts for uncontained updates (is eff inside ANY stint? what is the
    # next stint start?) come from entity-partitioned windows on the SAME
    # frame instead of a second join+groupBy; the window partitioning then
    # flows straight into scd2_coalesce_stints' identical partitioning.
    w_ent = Window.partitionBy(entity_col)
    # window expressions must be plain columns BEFORE the generator (the
    # analyzer cannot extract a window from inside explode())
    d = (
        d.withColumn(
            "__contained_any",
            F.max(F.when(contains, 1).otherwise(0)).over(w_ent) == 1,
        )
        .withColumn(
            "__next_vf",
            F.min(
                F.when(F.col("valid_from") > F.col("__eff"), F.col("valid_from"))
            ).over(w_ent),
        )
        .withColumn(
            # exactly one designated emitter row per entity (uncontained stint)
            "__rn",
            F.row_number().over(
                Window.partitionBy(entity_col).orderBy(
                    F.col("valid_from").asc_nulls_last()
                )
            ),
        )
    )

    stint = F.struct(*attr_cols, "valid_from", "valid_to")

    def mk(attrs_from_update: bool, vf, vt) -> Column:
        attrs = (
            [F.col(f"__u_{c}").alias(c) for c in attr_cols]
            if attrs_from_update
            else [F.col(c) for c in attr_cols]
        )
        return F.struct(*attrs, vf.alias("valid_from"), vt.alias("valid_to"))

    emitted = F.array_compact(
        F.array(
            # 1. rows not containing eff (or entity without update): unchanged
            F.when(has_row & ~contains, stint),
            # 2. containing stint truncated at eff; empty truncations drop
            F.when(
                contains & (F.col("valid_from") < F.col("__eff")),
                mk(False, F.col("valid_from"), F.col("__eff")),
            ),
            # 3. the spliced stint [eff, old_end) with the update's attrs
            F.when(contains, mk(True, F.col("__eff"), F.col("valid_to"))),
            # 4. eff contained by NO stint (before all history, inside a gap,
            # after a fully-closed history, or an unseen entity): splice
            # [eff, next_start), open iff nothing starts later — no update
            # is ever silently dropped
            F.when(
                has_u & ~F.col("__contained_any") & (F.col("__rn") == 1),
                mk(True, F.col("__eff"), F.col("__next_vf")),
            ),
        )
    )
    out = (
        d.select(F.col(entity_col), F.explode(emitted).alias("__s"))
        .select(
            entity_col,
            *[F.col(f"__s.{c}").alias(c) for c in attr_cols],
            F.col("__s.valid_from").alias("valid_from"),
            F.col("__s.valid_to").alias("valid_to"),
            F.col("__s.valid_to").isNull().alias("is_current"),
        )
    )
    return scd2_coalesce_stints(out, entity_col, attr_cols)


def scd2_merge_incremental(
    current_dim: DataFrame,
    updates: DataFrame,
    entity_col: str,
    attr_cols: Sequence[str],
    effective_col: str | Column,
    on_late: str = "clamp",
) -> DataFrame:
    """Idempotent SCD2 merge of a batch of latest-state updates into a dimension.

    ``updates`` must hold one row per entity (its latest observed attributes
    plus an effective timestamp column). Replaces the reference's
    UPDATE-then-append (common.py:418-471) with a deterministic DataFrame
    computation suitable for ``replaceWhere``/full-table atomic swap:

    - unchanged entities keep their rows;
    - changed entities get their open row closed (``valid_to = effective``,
      ``is_current = false``) plus a new open row;
    - new entities get a new open row;
    - re-running with the same batch yields the same output (idempotent),
      because "changed" is computed by comparing attribute values, not by
      the presence of an update row;
    - a late-arriving (backdated) update whose effective timestamp precedes
      the open row's ``valid_from`` is handled per ``on_late``:
      ``"clamp"`` (default) clamps it to ``valid_from`` —
      ``greatest(valid_from, effective)`` — so the close/open boundary never
      violates the ``valid_to >= valid_from`` contiguity invariant;
      ``"reject"`` raises :class:`LateUpdateError` listing the offending
      entities (one bounded eager probe), for pipelines that must not absorb
      backdated batches silently; ``"splice"`` rewrites closed history via
      :func:`scd2_splice_history` (truncate the containing stint at the
      effective time, insert the update's stint up to the old boundary) —
      beyond the reference, which only applies updates forward.

    Expects ``current_dim`` columns: entity, attrs..., valid_from, valid_to,
    is_current. Returns the same shape.
    """
    if on_late not in ("clamp", "reject", "splice"):
        raise ValueError(
            f"on_late must be 'clamp', 'reject' or 'splice', got {on_late!r}"
        )
    if on_late == "splice":
        # splice handles forward-dated, backdated, no-op and brand-new
        # entities uniformly (a forward update truncates the OPEN stint),
        # so the whole batch routes through it
        return scd2_splice_history(
            current_dim, updates, entity_col, attr_cols, effective_col
        ).select(*current_dim.columns)
    eff = F.col(effective_col) if isinstance(effective_col, str) else effective_col
    u = updates.select(
        F.col(entity_col),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        eff.alias("__eff"),
    )

    cur_open = current_dim.filter(F.col("is_current"))
    cur_closed = current_dim.filter(~F.col("is_current"))

    joined = cur_open.join(u, entity_col, "full_outer")

    any_diff = F.lit(False)
    for c in attr_cols:
        any_diff = any_diff | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    is_new = F.col("valid_from").isNull()
    has_update = F.col("__eff").isNotNull()
    changed = has_update & ~is_new & any_diff

    if on_late == "reject":
        # bounded probe (limit keeps it driver-safe on a degenerate batch):
        # any changed entity whose effective time precedes the open row's
        # valid_from is a backdated update the caller asked to fail on.
        late = (
            joined.filter(changed & (F.col("__eff") < F.col("valid_from")))
            .select(entity_col, "valid_from", "__eff")
            .limit(21)
            .collect()
        )
        if late:
            shown = ", ".join(
                f"{r[entity_col]} (open valid_from={r['valid_from']}, "
                f"update effective={r['__eff']})"
                for r in late[:20]
            )
            more = " …" if len(late) > 20 else ""
            raise LateUpdateError(
                f"backdated update(s) for open SCD2 rows: {shown}{more}; "
                "re-run with on_late='clamp' or splice history manually"
            )

    dim_cols = [c for c in current_dim.columns]

    # effective time clamped so a backdated update can't close an open row
    # before it opened (valid_to < valid_from); brand-new entities keep the
    # raw effective time (their valid_from is NULL in the outer join)
    eff_clamped = F.when(is_new, F.col("__eff")).otherwise(
        F.greatest(F.col("__eff"), F.col("valid_from"))
    )

    # 1. open rows with no (or no-op) update: pass through
    unchanged = joined.filter(~changed & ~is_new).select(*dim_cols)
    # 2. changed entities: close the old row at the (clamped) effective time
    closed_now = (
        joined.filter(changed)
        .withColumn("valid_to", eff_clamped)
        .withColumn("is_current", F.lit(False))
        .select(*dim_cols)
    )
    # 3. changed or brand-new entities: open a fresh row at the same boundary
    opened = (
        joined.filter(changed | (is_new & has_update))
        .select(
            F.col(entity_col),
            *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
            eff_clamped.alias("valid_from"),
            F.lit(None).cast(current_dim.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*dim_cols)
    )
    return cur_closed.unionByName(unchanged).unionByName(closed_now).unionByName(opened)
