"""Property-based 3-way parity for the query algebra.

Hypothesis generates random point sets and random query trees; every
example must agree across all three evaluation paths:

1. Python evaluation on Points (reference semantics),
2. the MapType Spark compile,
3. the indexed-scalar Spark compile (the parquet-pushdown rewrite),

which generalizes the hand-picked cases in test_queries.py to the whole
operator lattice — in particular that the indexed rewrite (database
_indexed_column) never changes an answer, for any composition of
& | ~ over eligible and ineligible leaves. Mirrors the reference's
index-vs-storage oracle (reference tests/test_tinyflux.py:1507+).
"""

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tinyflux_spark.point import Point
from tinyflux_spark.queries import (
    FieldQuery,
    MeasurementQuery,
    TagQuery,
    TimeQuery,
)
from tinyflux_spark.schema import points_to_df

T0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2020, 6, 1, tzinfo=timezone.utc)
T2 = datetime(2021, 1, 1, tzinfo=timezone.utc)

TIMES = [T0, T1, T2]
MEASUREMENTS = ["weather", "cpu"]
TAG_VALS = [None, "LA", "SF", "a1"]
FIELD_VALS = [None, 0.0, 60.0, 70.5, -1.5]
# Regex subset valid and identical in Python re and Java dialects.
PATTERNS = ["L.*", "F", "a1", "[ab]1", "S|c"]

INDEXED = {
    ("tags", "city"): "_ix_tag_city",
    ("tags", "host"): "_ix_tag_host",
    ("fields", "temp"): "_ix_field_temp",
    ("fields", "load"): "_ix_field_load",
}


def _points():
    tags = st.fixed_dictionaries(
        {},
        optional={
            "city": st.sampled_from(TAG_VALS),
            "host": st.sampled_from(TAG_VALS),
        },
    )
    fields = st.fixed_dictionaries(
        {},
        optional={
            "temp": st.sampled_from(FIELD_VALS),
            "load": st.sampled_from(FIELD_VALS),
        },
    )
    return st.lists(
        st.builds(
            lambda t, m, tg, f: Point(
                time=t, measurement=m, tags=dict(tg), fields=dict(f)
            ),
            st.sampled_from(TIMES),
            st.sampled_from(MEASUREMENTS),
            tags,
            fields,
        ),
        min_size=1,
        max_size=8,
    )


def _cmp(builder, op, rhs):
    return {
        "eq": lambda: builder == rhs,
        "ne": lambda: builder != rhs,
        "lt": lambda: builder < rhs,
        "le": lambda: builder <= rhs,
        "gt": lambda: builder > rhs,
        "ge": lambda: builder >= rhs,
    }[op]()


_CMP_OPS = ["eq", "ne", "lt", "le", "gt", "ge"]


def _leaves():
    tag_cmp = st.builds(
        lambda k, op, rhs: _cmp(TagQuery()[k], op, rhs),
        st.sampled_from(["city", "host", "nope"]),
        st.sampled_from(_CMP_OPS),
        st.sampled_from(TAG_VALS),
    )
    tag_other = st.builds(
        lambda k, kind, pat: TagQuery()[k].exists()
        if kind == "exists"
        else (
            TagQuery()[k].matches(pat)
            if kind == "matches"
            else TagQuery()[k].search(pat)
        ),
        st.sampled_from(["city", "host", "nope"]),
        st.sampled_from(["exists", "matches", "search"]),
        st.sampled_from(PATTERNS),
    )
    field_cmp = st.builds(
        lambda k, op, rhs: _cmp(FieldQuery()[k], op, rhs),
        st.sampled_from(["temp", "load", "nope"]),
        st.sampled_from(_CMP_OPS),
        st.sampled_from([None, 0, 60, 70.5]),
    )
    field_exists = st.builds(
        lambda k: FieldQuery()[k].exists(),
        st.sampled_from(["temp", "load", "nope"]),
    )
    time_cmp = st.builds(
        lambda op, rhs: _cmp(TimeQuery(), op, rhs),
        st.sampled_from(_CMP_OPS),
        st.sampled_from(TIMES),
    )
    meas = st.builds(
        lambda op, rhs: _cmp(MeasurementQuery(), op, rhs),
        st.sampled_from(_CMP_OPS),
        st.sampled_from(MEASUREMENTS + ["w"]),
    )
    meas_re = st.builds(
        lambda kind, pat: MeasurementQuery().matches(pat)
        if kind == "matches"
        else MeasurementQuery().search(pat),
        st.sampled_from(["matches", "search"]),
        st.sampled_from(["wea.*", "c", "u$"]),
    )
    noop = st.just(TimeQuery().noop())
    return st.one_of(
        tag_cmp, tag_other, field_cmp, field_exists, time_cmp, meas,
        meas_re, noop,
    )


def _queries():
    return st.recursive(
        _leaves(),
        lambda child: st.one_of(
            st.builds(lambda a, b: a & b, child, child),
            st.builds(lambda a, b: a | b, child, child),
            st.builds(lambda a: ~a, child),
        ),
        max_leaves=6,
    )


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pts=_points(), q=_queries())
def test_three_way_parity(spark, pts, q):
    expected = sorted(i for i, p in enumerate(pts) if q(p))
    df = points_to_df(spark, pts, with_seq=True)
    for (attr, key), col in INDEXED.items():
        df = df.withColumn(col, F.element_at(F.col(attr), key))
    rows = df.select(
        "_seq",
        q.compile().alias("m"),
        q.compile(indexed=INDEXED).alias("x"),
    ).collect()
    got_map = sorted(r["_seq"] for r in rows if r["m"])
    got_idx = sorted(r["_seq"] for r in rows if r["x"])
    assert got_map == expected, f"map-compile diverged for {q!r}"
    assert got_idx == expected, f"indexed-compile diverged for {q!r}"
    # closed-boolean invariant: the compiled predicate never yields NULL
    assert all(r["m"] is not None and r["x"] is not None for r in rows)
