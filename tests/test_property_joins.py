"""Property-based invariants for the join-rewrite operators.

A plain-Python nested loop is the spec:

* interval_join must equal the brute-force ``s <= t <= e`` pairing for
  every bin width — the bucketing is a physical rewrite, never a
  semantic one (each qualifying pair meets in exactly the point's bin,
  so no duplicates can appear and no pair can be lost);
* salted_join must equal the plain equi-join for inner and left joins
  for every salt count — the salt only routes rows across partitions.

Mirrors the dual-evaluation strategy of test_property_queries.py.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tinyflux_spark.operators.aggregates import interval_join, salted_join

points_strategy = st.lists(
    st.integers(min_value=-50, max_value=150), min_size=1, max_size=12,
    unique=True,
)
intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=150),
        st.integers(min_value=-30, max_value=60),  # may invert (< 0 span)
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=points_strategy,
    ivs=intervals_strategy,
    bin_width=st.sampled_from([1, 3, 10, 64]),
)
def test_interval_join_equals_bruteforce(spark, pts, ivs, bin_width):
    p = spark.createDataFrame([(t,) for t in pts], "t: long")
    iv = spark.createDataFrame(
        [(i, s, s + span) for i, (s, span) in enumerate(ivs)],
        "iv_id: long, s: long, e: long",
    )
    got = sorted(
        (r["iv_id"], r["t"])
        for r in interval_join(
            p, iv, "t", "s", "e", bin_width=bin_width
        ).collect()
    )
    expect = sorted(
        (i, t)
        for i, (s, span) in enumerate(ivs)
        for t in pts
        if s <= t <= s + span
    )
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 99)),
        min_size=1, max_size=15,
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 99)),
        min_size=1, max_size=15,
    ),
    n_salts=st.sampled_from([1, 2, 7]),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, lrows, rrows, n_salts, how):
    left = spark.createDataFrame(lrows, "k: long, lv: long")
    right = spark.createDataFrame(rrows, "k: long, rv: long")
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, ["k"], n_salts, how).collect()
    )
    want = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in left.join(right, ["k"], how).collect()
    )
    assert got == want


def _model_merge(ivs, gap=0):
    """Reference interval union: sort per key, sweep with running max."""
    out = []
    by_key = {}
    for k, s, e in ivs:
        if e >= s:
            by_key.setdefault(k, []).append((s, e))
    for k, rows in by_key.items():
        rows.sort()
        cur_s, cur_e, n = rows[0][0], rows[0][1], 1
        for s, e in rows[1:]:
            if s > cur_e + gap:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e, n = max(cur_e, e), n + 1
        out.append((k, cur_s, cur_e, n))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(0, 2),                     # key
            st.integers(-20, 40),                  # start
            st.integers(-5, 15),                   # span (may invert)
        ),
        min_size=1,
        max_size=15,
    ),
    gap=st.sampled_from([0, 2]),
)
def test_merge_intervals_equals_sweep_model(spark, ivs, gap):
    from tinyflux_spark.operators.aggregates import merge_intervals

    rows = [(str(k), s, s + sp) for k, s, sp in ivs]
    df = spark.createDataFrame(rows, "k: string, s: long, e: long")
    got = sorted(
        (r["key"], r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e", gap=gap).collect()
    )
    assert got == _model_merge(rows, gap)
