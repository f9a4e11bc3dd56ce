"""Time-series regularization operators: resample, gap-fill, anomaly.

The reference stores irregular points and leaves regularization to the
user (its examples bucket manually in Python loops —
``examples/2_analytics_workflow.py``). These operators do it engine-side
as pure DataFrame compositions:

* ``resample`` — bucket an irregular series to a fixed interval with an
  aggregate per (key, bucket). One shuffle on (key, bucket); map-side
  partial aggregation applies.
* ``gap_fill`` — densify a resampled series to the full per-key bucket
  grid and fill the holes by LOCF or linear interpolation. The grid is
  built per key with ``sequence`` + ``explode`` (bounded by that key's
  own time span — never a global calendar), and fills are window
  functions partitioned by key: no cross-key traffic, no driver loop.
* ``rolling_zscore`` — trailing-window anomaly score per key; a single
  window pass, partitioned by key.

All bucket arithmetic is integer epoch-seconds (``unix_timestamp`` is
session-tz-dependent only for its string parse, not for timestamp
input), so results are engine-portable and oracle-replayable without
timezone hazards.

Scale: every operator shuffles once on the series key (or not at all);
window state per key is O(buckets of that key). A key whose span/interval
ratio is huge produces a proportionally large grid — that is inherent to
densification, and the per-key ``sequence`` keeps the blow-up local to
its key's tasks instead of materializing a global calendar join.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Max elements per generated grid array (see gap_fill): bounds task
#: memory for long-span keys without changing results.
_GRID_CHUNK = 4096


def _epoch(c: Column) -> Column:
    return F.unix_timestamp(c)


def resample(
    df: DataFrame,
    time_col: str,
    key_col: str,
    value_col: str,
    interval_sec: int,
    agg: str = "avg",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Aggregate an irregular series onto a fixed grid.

    Returns ``(key, bucket_s, bucket_ts, value, n_obs)`` — one row per
    (key, bucket) that has at least one observation; ``gap_fill``
    densifies. ``bucket_s`` is epoch seconds (bucket start), ``bucket_ts``
    its timestamp rendering.
    """
    if agg not in ("avg", "sum", "min", "max", "count", "first", "last"):
        raise ValueError(f"resample: unsupported agg {agg!r}")
    b = (F.floor(_epoch(F.col(time_col)) / interval_sec) * interval_sec).cast(
        "long"
    )
    base = df.select(
        F.col(key_col).alias("key"),
        b.alias("bucket_s"),
        F.col(value_col).alias("_v"),
        F.col(time_col).alias("_t"),
    )
    if agg in ("first", "last"):
        # value at the earliest/latest timestamp in the bucket:
        # min/max of (t, v) structs — still one partial-aggregable agg.
        pick = F.min if agg == "first" else F.max
        val = pick(F.struct(F.col("_t"), F.col("_v")))["_v"]
    elif agg == "count":
        val = F.count(F.col("_v")).cast("double")
    else:
        val = getattr(F, agg)(F.col("_v"))
    if round_digits is not None:
        val = F.round(val, round_digits)
    return (
        base.groupBy("key", "bucket_s")
        .agg(val.alias("value"), F.count(F.lit(1)).alias("n_obs"))
        .withColumn("bucket_ts", F.timestamp_seconds(F.col("bucket_s")))
        .select("key", "bucket_s", "bucket_ts", "value", "n_obs")
    )


def gap_fill(
    resampled: DataFrame,
    interval_sec: int,
    fill: str = "locf",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Densify a ``resample`` result to every bucket in each key's
    [min, max] span and fill missing values.

    ``fill``:

    * ``"none"`` — holes stay null (``is_gap`` marks them).
    * ``"locf"`` — last observation carried forward; leading holes
      (before a key's first observation) stay null. The standard
      irregular-sensor reading ("value in effect").
    * ``"linear"`` — linear interpolation between the surrounding
      observations; leading/trailing holes stay null.

    Physical shape: the per-key grid spans each key's own [min, max]
    (never a global calendar), generated as chunked sequence+explode
    pairs so no task ever materializes more than ``_GRID_CHUNK`` grid
    elements in one array — then a single left join back on
    (key, bucket_s) and, for fills, window functions partitioned by key.
    """
    if fill not in ("none", "locf", "linear"):
        raise ValueError(f"gap_fill: unsupported fill {fill!r}")
    bounds = resampled.groupBy("key").agg(
        F.min("bucket_s").alias("_lo"), F.max("bucket_s").alias("_hi")
    )
    # Two bounded explodes, not one span-sized sequence: a single
    # sequence(lo, hi) materializes the key's ENTIRE grid as one
    # in-memory array in one task (a 10-year key at 1s interval is a
    # 300M-element array — task OOM). Chunking caps every array at
    # _GRID_CHUNK elements; the row count is identical.
    step = int(interval_sec)
    chunk_step = step * _GRID_CHUNK
    chunks = bounds.select(
        "key",
        F.col("_hi"),
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(chunk_step))
        ).alias("_clo"),
    )
    grid = chunks.select(
        "key",
        F.explode(
            F.sequence(
                F.col("_clo"),
                F.least(
                    F.col("_clo") + F.lit(step * (_GRID_CHUNK - 1)),
                    F.col("_hi"),
                ),
                F.lit(step),
            )
        ).alias("bucket_s"),
    )
    dense = grid.join(
        resampled.select("key", "bucket_s", "value", "n_obs"),
        ["key", "bucket_s"],
        "left",
    ).select(
        "key",
        "bucket_s",
        F.col("value").alias("_obs"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
    )
    w = Window.partitionBy("key").orderBy("bucket_s")
    if fill == "none":
        filled = F.col("_obs")
    elif fill == "locf":
        filled = F.last("_obs", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:  # linear
        # Carry (bucket, value) of the nearest observation on each side;
        # structs so the matching bucket travels with its value. BOTH
        # directions use a running [unbounded preceding, current] frame
        # (the forward one over a descending sort): Spark evaluates
        # running frames incrementally in O(n), while an [current,
        # unbounded FOLLOWING] frame is rescanned per row — O(n^2) per
        # key, measured 28s vs 0.3s on a 43k-row grid.
        obs = F.when(
            F.col("_obs").isNotNull(),
            F.struct(F.col("bucket_s").alias("b"), F.col("_obs").alias("v")),
        )
        prev = F.last(obs, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wdesc = Window.partitionBy("key").orderBy(F.desc("bucket_s"))
        nxt = F.last(obs, ignorenulls=True).over(
            wdesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        frac = (F.col("bucket_s") - prev["b"]).cast("double") / (
            nxt["b"] - prev["b"]
        ).cast("double")
        interp = prev["v"] + (nxt["v"] - prev["v"]) * frac
        filled = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
            F.when(prev.isNotNull() & nxt.isNotNull(), interp)
        )
    if round_digits is not None:
        filled = F.round(filled, round_digits)
    return dense.select(
        "key",
        "bucket_s",
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket_ts"),
        filled.alias("value"),
        F.col("n_obs"),
        (F.col("n_obs") == 0).alias("is_gap"),
    )


def rolling_zscore(
    df: DataFrame,
    time_col: str,
    key_col: str,
    value_col: str,
    lookback: int = 20,
    threshold: float = 3.0,
    order_cols: Optional[list] = None,
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per key.

    For each row, mean/stddev over the previous ``lookback`` rows of its
    key (EXCLUDING the current row, so the score is against history and
    a lone spike can't mask itself), z = (v - mean) / std. Rows with
    fewer than 2 history rows or zero variance get null z. One window
    pass partitioned by key; ``order_cols`` (default ``[time_col]``)
    must make the ordering total for cross-engine determinism — pass a
    tiebreaker id when timestamps can collide.
    """
    order = order_cols or [time_col]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when((n >= 2) & (std > 0), (v - mean) / std)
    if round_digits is not None:
        z = F.round(z, round_digits)
    return df.withColumn("zscore", z).withColumn(
        "is_anomaly",
        F.when(F.col("zscore").isNotNull(), F.abs(F.col("zscore")) > threshold)
        .otherwise(F.lit(False)),
    )


def derivative(
    df: DataFrame,
    time_col: str,
    key_col: str,
    value_col: str,
    per_seconds: int = 1,
    non_negative: bool = False,
    order_cols: Optional[list] = None,
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Per-key rate of change between consecutive observations
    (the InfluxDB ``derivative()`` analog): ``(v - lag(v)) /
    (t - lag(t)) * per_seconds``.

    ``non_negative=True`` nulls negative rates — the standard counter
    semantics where a drop means the counter reset, not a negative
    rate. First observation per key has no predecessor: null rate.
    Zero elapsed time (duplicate timestamps) yields null, not inf.
    One lag-window pass partitioned by key; ``order_cols`` defaults to
    ``[time_col]`` and must be total for determinism.
    """
    order = order_cols or [time_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    t = _epoch(F.col(time_col))
    v = F.col(value_col).cast("double")
    dt = (t - F.lag(t).over(w)).cast("double")
    dv = v - F.lag(v).over(w)
    rate = F.when(dt > 0, dv / dt * F.lit(float(per_seconds)))
    if non_negative:
        rate = F.when(rate >= 0, rate)
    if round_digits is not None:
        rate = F.round(rate, round_digits)
    return df.withColumn("rate", rate)


# ----------------------------------------------------------------------
# Schemaless per-field-key rollup plumbing, shared by the batch
# retention pass (database.downsample) and the streaming continuous
# query (streaming.stream_rollup_insert) so their semantics cannot
# drift: explode a fields map into (key, value) rows, aggregate each
# key independently, re-assemble a canonical fields map.
# ----------------------------------------------------------------------

#: Aggregates supported for per-field-key rollups.
FIELD_AGGS = ("avg", "min", "max", "sum", "count")


def explode_point_fields(df: DataFrame, keep_cols) -> DataFrame:
    """Project a canonical point frame to per-field-key rows:
    ``(*keep_cols, measurement, _tags, _fk, _fv)`` where ``_tags`` is
    the sorted tag-entry array (maps cannot be grouping keys) and
    ``explode_outer`` keeps empty-field points alive as a null key."""
    return df.select(
        *keep_cols,
        "measurement",
        F.array_sort(F.map_entries("tags")).alias("_tags"),
        F.explode_outer("fields").alias("_fk", "_fv"),
    )


def field_agg_column(agg: str) -> Column:
    """The per-key aggregate Column for a rollup; count casts to double
    because fields are double-valued."""
    if agg not in FIELD_AGGS:
        raise ValueError(f"unsupported field agg {agg!r}")
    val = getattr(F, agg)(F.col("_fv"))
    return val.cast("double") if agg == "count" else val


def reassemble_fields(df: DataFrame, group_cols) -> DataFrame:
    """Fold aggregated per-key rows ``(*group_cols, _fk, _v)`` back
    into one row per group with a canonical ``fields`` map. Null keys
    (from empty-field points) are dropped by ``collect_list``; key
    order is sorted so map layout is deterministic."""
    return df.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_fk").isNotNull(),
                        F.struct(F.col("_fk"), F.col("_v")),
                    )
                )
            )
        ).alias("fields")
    )
