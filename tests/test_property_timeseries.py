"""Property-based invariants for the time-series regularization
operators: a reference implementation in plain Python is compared
against the distributed operators on random irregular series.

Mirrors the dual-evaluation strategy of test_property_queries.py — the
Python model is the spec, Spark is the implementation under test.
"""

import datetime as dt
import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from tinyflux_spark.operators.timeseries import derivative, gap_fill, resample

BASE = dt.datetime(2024, 1, 1)
INTERVAL = 60


def _round6(x):
    """HALF_UP at 6 digits, like Spark's ``F.round`` (builtin ``round``
    is HALF_EVEN and disagrees on ties such as 1/128 = 0.0078125)."""
    return float(
        decimal.Decimal(x).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )

series_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                  # key
        st.integers(min_value=0, max_value=600),      # seconds offset
        st.integers(min_value=-50, max_value=50),     # value (int: exact)
    ),
    min_size=1,
    max_size=25,
)


def _model_resample(rows):
    """Spec: per (key, bucket) mean of values, exact over ints."""
    groups = {}
    for k, s, v in rows:
        b = (s // INTERVAL) * INTERVAL + int(BASE.timestamp())
        groups.setdefault((k, b), []).append(float(v))
    return {
        kb: (sum(vs) / len(vs), len(vs)) for kb, vs in groups.items()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series_strategy)
def test_resample_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        ["k", "t", "v"],
    )
    got = {
        (r["key"], r["bucket_s"]): (r["value"], r["n_obs"])
        for r in resample(df, "t", "k", "v", INTERVAL).collect()
    }
    model = _model_resample(rows)
    assert set(got) == set(model)
    for kb, (mv, mn) in model.items():
        assert got[kb][1] == mn
        assert abs(got[kb][0] - mv) < 1e-6


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series_strategy)
def test_gap_fill_invariants(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        ["k", "t", "v"],
    )
    r = resample(df, "t", "k", "v", INTERVAL)
    model = _model_resample(rows)
    for fill in ("locf", "linear"):
        out = gap_fill(r, INTERVAL, fill=fill).collect()
        by_key = {}
        for row in out:
            by_key.setdefault(row["key"], []).append(row)
        obs_buckets = {}
        for (k, b) in model:
            obs_buckets.setdefault(k, set()).add(b)
        for k, rows_k in by_key.items():
            rows_k.sort(key=lambda r: r["bucket_s"])
            buckets = [r["bucket_s"] for r in rows_k]
            lo, hi = min(obs_buckets[k]), max(obs_buckets[k])
            # grid = exactly the key's own [lo, hi] span, stepped
            assert buckets == list(range(lo, hi + 1, INTERVAL))
            vals = {r["bucket_s"]: r["value"] for r in rows_k}
            # observation buckets keep their resampled value
            for b in obs_buckets[k]:
                assert abs(vals[b] - model[(k, b)][0]) < 1e-5
            # interior buckets are always filled (first/last are obs)
            assert all(v is not None for v in vals.values())
            if fill == "linear":
                # interpolated values lie within neighbors' range
                obs_sorted = sorted(obs_buckets[k])
                for r_ in rows_k:
                    if not r_["is_gap"]:
                        continue
                    prev_b = max(b for b in obs_sorted if b < r_["bucket_s"])
                    next_b = min(b for b in obs_sorted if b > r_["bucket_s"])
                    bounds = sorted(
                        [model[(k, prev_b)][0], model[(k, next_b)][0]]
                    )
                    assert bounds[0] - 1e-6 <= r_["value"] <= bounds[1] + 1e-6


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=2,
        max_size=15,
        unique_by=lambda t: t[0],  # unique timestamps: total order
    )
)
def test_derivative_matches_python_model(spark, rows):
    rows = sorted(rows)
    df = spark.createDataFrame(
        [("k", BASE + dt.timedelta(seconds=s), float(v)) for s, v in rows],
        ["k", "t", "v"],
    )
    got = {
        int(r["t"].timestamp()): r["rate"]
        for r in derivative(df, "t", "k", "v").collect()
    }
    base_s = int(BASE.timestamp())
    for i, (s, v) in enumerate(rows):
        rate = got[base_s + s]
        if i == 0:
            assert rate is None
        else:
            ps, pv = rows[i - 1]
            expect = _round6((v - pv) / (s - ps))
            assert abs(rate - expect) < 1e-9
