"""Unit tests for the time-series regularization and text-pipeline
operators added in round 3: resample / gap_fill / rolling_zscore and
scrub_text / top_tokens / chunk_documents.

Small hand-built frames with hand-checked expectations — the sf-scale
cross-engine check lives in the q60–q64 oracle gates.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tinyflux_spark.operators.timeseries import (
    gap_fill,
    resample,
    rolling_zscore,
)
from tinyflux_spark.operators.text import (
    chunk_documents,
    scrub_text,
    top_tokens,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # key "a": observations in minutes 0, 1, 4 (gap at 2, 3)
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),  # same bucket as the first
        ("a", _ts(1, 30), 30.0),
        ("a", _ts(4, 0), 60.0),
        # key "b": single observation
        ("b", _ts(2, 5), 5.0),
    ]
    return spark.createDataFrame(rows, ["k", "t", "v"])


def test_resample_buckets_and_aggs(series):
    out = resample(series, "t", "k", "v", interval_sec=60)
    got = {(r["key"], r["bucket_s"]): (r["value"], r["n_obs"])
           for r in out.collect()}
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got[("a", base)] == (15.0, 2)          # avg of 10, 20
    assert got[("a", base + 60)] == (30.0, 1)
    assert got[("a", base + 240)] == (60.0, 1)
    assert got[("b", base + 120)] == (5.0, 1)
    assert len(got) == 4


def test_resample_first_last(series):
    first = {(r["key"], r["bucket_s"]): r["value"]
             for r in resample(series, "t", "k", "v", 60, agg="first").collect()}
    last = {(r["key"], r["bucket_s"]): r["value"]
            for r in resample(series, "t", "k", "v", 60, agg="last").collect()}
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert first[("a", base)] == 10.0
    assert last[("a", base)] == 20.0


def test_gap_fill_locf_and_linear(series):
    r = resample(series, "t", "k", "v", interval_sec=60)
    base = int(dt.datetime(2024, 1, 1).timestamp())

    locf = {(x["key"], x["bucket_s"]): (x["value"], x["is_gap"])
            for x in gap_fill(r, 60, fill="locf").collect()}
    # a: grid covers minutes 0..4 inclusive = 5 buckets; b: 1 bucket.
    assert len(locf) == 6
    assert locf[("a", base + 120)] == (30.0, True)   # carried forward
    assert locf[("a", base + 180)] == (30.0, True)
    assert locf[("a", base + 240)] == (60.0, False)

    lin = {(x["key"], x["bucket_s"]): x["value"]
           for x in gap_fill(r, 60, fill="linear").collect()}
    # interpolate 30 -> 60 across minutes 1..4: minute 2 = 40, 3 = 50.
    assert lin[("a", base + 120)] == 40.0
    assert lin[("a", base + 180)] == 50.0

    none = {(x["key"], x["bucket_s"]): x["value"]
            for x in gap_fill(r, 60, fill="none").collect()}
    assert none[("a", base + 120)] is None


def test_gap_fill_no_cross_key_bleed(series):
    r = resample(series, "t", "k", "v", interval_sec=60)
    out = gap_fill(r, 60, fill="locf")
    b_rows = [x for x in out.collect() if x["key"] == "b"]
    assert len(b_rows) == 1 and b_rows[0]["value"] == 5.0


def test_rolling_zscore_flags_spike(spark):
    rows = [("u", _ts(i), 10.0 + (i % 2)) for i in range(10)]
    rows.append(("u", _ts(10), 1000.0))  # spike
    df = spark.createDataFrame(rows, ["user", "t", "v"])
    out = rolling_zscore(df, "t", "user", "v", lookback=5, threshold=3.0)
    flagged = [r for r in out.collect() if r["is_anomaly"]]
    assert len(flagged) == 1 and flagged[0]["v"] == 1000.0


def test_rolling_zscore_zero_variance_is_null(spark):
    rows = [("u", _ts(i), 10.0) for i in range(5)]
    rows.append(("u", _ts(5), 1000.0))
    df = spark.createDataFrame(rows, ["user", "t", "v"])
    out = rolling_zscore(df, "t", "user", "v", lookback=5)
    # constant history has zero variance -> null z, never a flag
    spike = [r for r in out.collect() if r["v"] == 1000.0][0]
    assert spike["zscore"] is None and not spike["is_anomaly"]


def test_rolling_zscore_excludes_current_row(spark):
    # history [1, 3] (mean 2, std sqrt(2)); current 2 -> z = 0,
    # which would be wrong if the window included the current row.
    rows = [("u", _ts(0), 1.0), ("u", _ts(1), 3.0), ("u", _ts(2), 2.0)]
    df = spark.createDataFrame(rows, ["user", "t", "v"])
    out = {r["v"]: r["zscore"]
           for r in rolling_zscore(df, "t", "user", "v", 5).collect()}
    assert out[2.0] == 0.0
    assert out[1.0] is None  # no history
    assert out[3.0] is None  # single-row history: stddev undefined


def test_scrub_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or visit https://x.io/a?b=1 now"),
            (2, "card 1234567890 ok"),
            (3, "clean text"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r for r in scrub_text(df, "id").collect()}
    assert got[1]["scrubbed"] == "mail <EMAIL> or visit <URL> now"
    assert got[1]["n_redactions"] == 2 and got[1]["was_scrubbed"]
    assert got[2]["scrubbed"] == "card <NUM> ok"
    assert got[3]["n_redactions"] == 0 and not got[3]["was_scrubbed"]


def test_top_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, ""), (4, "c")], ["id", "text"]
    )
    rows = top_tokens(df, "text", k=2).collect()
    assert [(r["token"], r["n"]) for r in rows] == [("a", 3), ("b", 2)]


def test_chunk_documents_overlap_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, words), (2, "")], ["id", "text"])
    out = chunk_documents(df, "id", "text", chunk_words=5, overlap=2)
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    # stride 3 over 12 words: starts 1,4,7,10 -> sizes 5,5,5,3
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_chunk_words"] for r in rows] == [5, 5, 5, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3 w4"
    assert rows[1]["chunk_text"] == "w3 w4 w5 w6 w7"
    assert rows[3]["chunk_text"] == "w9 w10 w11"
    # empty doc contributes no chunks
    assert all(r["id"] == 1 for r in rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], ["id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_words=5, overlap=5)


def test_resample_rejects_bad_agg(series):
    with pytest.raises(ValueError):
        resample(series, "t", "k", "v", 60, agg="median")


def test_gap_fill_rejects_bad_fill(series):
    r = resample(series, "t", "k", "v", 60)
    with pytest.raises(ValueError):
        gap_fill(r, 60, fill="spline")


def test_derivative_rates(spark):
    from tinyflux_spark.operators.timeseries import derivative

    rows = [
        ("k", _ts(0), 10.0),
        ("k", _ts(1), 16.0),   # +6 over 60s -> 0.1/s
        ("k", _ts(1), 20.0),   # duplicate ts -> dt=0 -> null
        ("k", _ts(3), 8.0),    # -12 over 120s -> -0.1/s
    ]
    df = spark.createDataFrame(rows, ["key", "t", "v"])
    out = derivative(df, "t", "key", "v", order_cols=["t", "v"]).collect()
    rates = [r["rate"] for r in sorted(out, key=lambda r: (r["t"], r["v"]))]
    assert rates[0] is None            # first obs
    assert rates[1] == 0.1
    assert rates[2] is None            # dt == 0
    assert rates[3] == -0.1

    nn = derivative(
        df, "t", "key", "v", order_cols=["t", "v"], non_negative=True
    ).collect()
    nn_rates = [r["rate"] for r in sorted(nn, key=lambda r: (r["t"], r["v"]))]
    assert nn_rates[3] is None         # counter reset, not negative rate


def test_derivative_per_minute_scaling(spark):
    from tinyflux_spark.operators.timeseries import derivative

    rows = [("k", _ts(0), 0.0), ("k", _ts(2), 1.0)]
    df = spark.createDataFrame(rows, ["key", "t", "v"])
    out = derivative(df, "t", "key", "v", per_seconds=60).collect()
    assert sorted([r["rate"] for r in out], key=str) == [0.5, None]


def test_percentile_summary_exact(spark):
    from tinyflux_spark.operators.aggregates import percentile_summary

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)]      # 1..5
        + [("b", 10.0), ("b", 20.0)],
        ["key", "v"],
    )
    got = {r["key"]: r for r in percentile_summary(df, "key", "v").collect()}
    assert got["a"]["p50"] == 3.0 and got["a"]["p25"] == 2.0
    assert got["a"]["p90"] == 4.6         # 1 + 0.9*4 interpolated
    assert got["b"]["p50"] == 15.0 and got["b"]["n"] == 2
