"""Property-based invariants (hypothesis) for the core custom operators.

SCD2 build and Jaccard dedup must hold their invariants for ANY observation
stream, not just the curated fixtures (SURVEY §5.2.3). Examples are kept
small and the Spark session is reused, so each property runs in seconds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from f1_datalakehouse_pipeline_spark.operators.scd2 import scd2_from_observations

# (entity, attr, time) observation streams: few entities/attrs, unique seq ids
obs_streams = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # entity
        st.sampled_from(["A", "B", "C"]),               # attr
        st.integers(min_value=0, max_value=20),          # time
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(stream=obs_streams)
def test_scd2_invariants_hold_for_any_stream(spark, stream):
    rows = [(e, a, t, i) for i, (e, a, t) in enumerate(stream)]
    df = spark.createDataFrame(rows, ["entity", "attr", "t", "seq"])
    dim = scd2_from_observations(
        df, entity_col="entity", attr_col="attr", order_cols=["t", "seq"], time_col="t"
    ).collect()

    by_entity: dict[int, list] = {}
    for r in dim:
        by_entity.setdefault(r.entity, []).append(r)

    entities = {e for e, _, _ in stream}
    assert set(by_entity) == entities

    for e, stints in by_entity.items():
        stints.sort(key=lambda r: r.stint_id)
        # exactly one open stint, and it is the last one
        open_rows = [r for r in stints if r.is_current]
        assert len(open_rows) == 1 and open_rows[0].stint_id == stints[-1].stint_id
        # stint ids contiguous from 1
        assert [r.stint_id for r in stints] == list(range(1, len(stints) + 1))
        # adjacent stints: different attr, contiguous validity, ordered times
        for prev, nxt in zip(stints, stints[1:]):
            assert prev.attr != nxt.attr
            assert prev.valid_to == nxt.valid_from
            assert prev.valid_from <= nxt.valid_from
        # n_obs adds up to the entity's observation count
        assert sum(r.n_obs for r in stints) == sum(1 for x, _, _ in stream if x == e)


docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=30),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=docs_strategy)
def test_jaccard_bounds_and_symmetry(spark, texts):
    from f1_datalakehouse_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", k=1, threshold=0.0).collect()
    seen = set()
    for r in pairs:
        assert r.doc_a < r.doc_b               # canonical orientation, no dupes
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))
        assert 0.0 < r.jaccard <= 1.0
        # identical token sets ⇒ jaccard exactly 1
        ta = set(texts[r.doc_a].split())
        tb = set(texts[r.doc_b].split())
        if ta == tb and ta:
            assert r.jaccard == 1.0
