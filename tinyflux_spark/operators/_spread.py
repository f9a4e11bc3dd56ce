"""Scale-adaptive input widening for compute-heavy operators.

A parquet scan can never produce more non-empty splits than the input
has row groups: a corpus delivered as single-row-group files (this
repo's testdata, or any small-files layout) therefore serializes every
downstream narrow computation onto one task per file, no matter how
many cores the session has — ``spark.sql.files.maxPartitionBytes`` and
friends cannot help, because extra splits of the same row group are
empty. For operators whose cost is per-row compute (per-shingle md5,
gram explodes, embedding arithmetic), that is a 1-core ceiling.

:func:`spread_scan` widens such inputs with one explicit repartition,
but ONLY when the input is actually under-parallelized: when the
physical scan already has at least ``defaultParallelism`` partitions —
the 100 TB case, where the corpus arrives as thousands of splits — it
is a no-op, so no production shuffle is ever added. The check costs
one driver-side plan materialization (~50-100 ms), which the call
sites amortize against multi-second single-task compute.

Hash-partitioning on the operator's id column (when given) keeps the
exchange deterministic without the local sort a round-robin
repartition needs (``spark.sql.execution.sortBeforeRepartition``);
row order is immaterial to every caller (aggregations / per-row maps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *part_cols: str) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its physical
    plan currently yields fewer partitions — the single-row-group /
    small-files escape hatch for compute-bound operators. No-op (and
    no added exchange) on well-partitioned inputs, so it is safe at
    any scale. Pass the operator's id column(s) to use a deterministic
    hash exchange instead of round-robin."""
    # Kill switch for A/B measurement and for deployments whose input
    # layout makes the widening unnecessary (TINYFLUX_SPARK_NO_SPREAD=1).
    if os.environ.get("TINYFLUX_SPARK_NO_SPREAD"):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # Never let an advisory optimization break the operator
        # (e.g. plans that cannot round-trip through the RDD API).
        return df
    if n >= target:
        return df
    if part_cols:
        return df.repartition(target, *part_cols)
    return df.repartition(target)


def pin_group_width(df: DataFrame, *group_cols: str) -> DataFrame:
    """Pre-shuffle ``df`` by ``group_cols`` at an explicitly pinned
    partition count, for grouped compute (``groupBy().applyInPandas``)
    whose per-group COST is far larger than its per-group BYTES.

    AQE's partition coalescing targets bytes
    (``advisoryPartitionSizeInBytes``): a kilobyte-sized shuffle ahead
    of a compute-heavy grouped map collapses to ONE post-shuffle
    partition and the whole grouped pass serializes on one core. An
    explicit ``repartition(n, cols)`` is exempt from AQE coalescing,
    and because it already satisfies the grouped map's required
    (hash) distribution, it REPLACES the groupBy's own exchange
    rather than adding one — same shuffle count, pinned width.

    The pinned count is ``max(defaultParallelism, input partitions)``:
    at 100 TB the input arrives with >= thousands of partitions, so
    the width matches what the groupBy exchange would have used
    anyway; on small inputs it keeps every core eligible instead of
    one."""
    if os.environ.get("TINYFLUX_SPARK_NO_SPREAD"):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(max(target, n), *group_cols)
