"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog) is the usual Spark answer, but
HLL register layouts differ across engines, so an HLL estimate cannot
be oracle-verified bit-for-bit. The KMV (K-minimum-values / bottom-k)
sketch (Bar-Yossef et al. 2002; Beyer et al. 2007's unbiased
estimator) is built from md5 order statistics instead: both engines
hash identically, the k-th smallest hash is a deterministic value, and
the estimator is one arithmetic expression — so the whole sketch is
exactly replayable in SQL, merge-able (union the bottom-k sets, keep
the bottom k), and its estimate is reproducible across runs, engines
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "data_card",
    "kmv_distinct",
    "kmv_distinct_by_key",
    "kmv_estimate_from_bottom",
    "kmv_hash_col",
    "kmv_quantile_sketch",
    "kmv_quantile_sketch_merge",
    "kmv_quantiles",
    "kmv_quantiles_by_key",
    "kmv_quantiles_from_sketch",
    "kmv_set_overlap",
]

# Hash domain: the first 12 hex digits of md5, as an integer in
# [0, 2^48). 48 bits keeps collisions negligible (< 1e-6 for k up to
# ~500k) while staying exactly representable in a double, so the
# estimator's float math is identical in both engines.
_KMV_BITS = 48
_KMV_DOMAIN = float(1 << _KMV_BITS)


def kmv_hash_col(col, salt: str = "kmv") -> Column:
    """The family's shared hash projection: first 12 hex digits of
    md5(salt:value) as a uniform integer in [0, 2^48) — aliased
    ``_h``. One definition so batch sketches, streamed sketches and
    SQL oracles can never drift."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h")
    )


def kmv_estimate_from_bottom(bottom: DataFrame, k: int) -> DataFrame:
    """Beyer et al. 2007's estimate from a materialized bottom-k hash
    set (column ``_h``) — the read side of a persisted/streamed
    sketch. Returns one row ``(n_seen, kth_hash, estimate, exact)``,
    kmv_distinct's shape."""
    agg = bottom.agg(
        F.count("*").cast("long").alias("n_seen"),
        F.max("_h").alias("kth_hash"),
    )
    exact = F.col("n_seen") < k
    est = F.when(exact, F.col("n_seen").cast("double")).otherwise(
        (F.lit(float(k - 1)))
        / (F.col("kth_hash").cast("double") / F.lit(_KMV_DOMAIN))
    )
    return agg.select(
        "n_seen",
        "kth_hash",
        F.round(est, 4).alias("estimate"),
        exact.alias("exact"),
    )


def kmv_distinct(
    df: DataFrame,
    col,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """KMV distinct-count estimate of ``col``: hash every value with
    md5, keep the k smallest DISTINCT hashes (a distributed
    TakeOrdered over the deduplicated hash set — no global sort), and
    estimate

        D ≈ (k - 1) / (h_(k) / 2^48)

    with ``h_(k)`` the k-th smallest hash (Beyer et al. 2007's
    unbiased estimator). When the column has fewer than k distinct
    values the bottom-k set IS the distinct set and the exact count is
    returned with ``exact = true``.

    Plan shape: one hash projection (codegen), one distinct (shuffle
    on the 48-bit hash — uniform by construction, never skewed), one
    distributed top-k. At 100 TB the sketch state is k rows regardless
    of input size; sketches from different partitions/days merge by
    unioning bottom-k sets and re-taking the bottom k.

    Returns one row: ``(n_seen, kth_hash, estimate, exact)`` where
    ``n_seen = min(k, distinct)`` is the retained set size. Nulls in
    ``col`` are ignored (a null is not a value).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    c = F.col(col) if isinstance(col, str) else col
    bottom = (
        df.where(c.isNotNull())
        .select(kmv_hash_col(c, salt))
        .distinct()
        .orderBy("_h")
        .limit(k)
    )
    return kmv_estimate_from_bottom(bottom, k)


def kmv_set_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col_a,
    col_b=None,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Theta-sketch-style set-overlap estimation from two KMV
    sketches (Dasgupta et al. 2016's theta sketch framework, built
    here on the deterministic KMV bottom-k): estimate the distinct
    UNION size, the Jaccard similarity, and the distinct INTERSECTION
    of two id sets without ever joining the raw sets —

        union     ≈ (k - 1) / (h_(k) of bottom-k(A ∪ B) / 2^48)
        jaccard   ≈ |{bottom-k(A ∪ B)} ∩ A ∩ B| / k
        intersect ≈ jaccard * union

    the classic sketch trick: the bottom-k of the union is a uniform
    sample of the union, so the fraction of it present in BOTH inputs
    estimates Jaccard. Everything is md5 order statistics — both
    engines compute identical sketches, so the estimates are
    deterministic and SQL-replayable (a real theta sketch is not,
    across engines). When the union has fewer than k distinct hashes
    the numbers are exact (``exact = true``).

    Plan shape: two hash projections, one distinct per side (shuffle
    on the uniform hash), a distributed bottom-k of the union, and
    two broadcast semi-joins of that k-row sample back against the
    side sketches. Sketch state is k rows per side at any scale;
    pre-sketched sides can be unioned incrementally (bottom-k is
    merge-able), so day-over-day audience overlap never rescans
    history.

    Returns one row: ``(n_union_seen, kth_hash, est_union,
    est_jaccard, est_intersection, exact)``.
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    def hashes(df: DataFrame, col) -> DataFrame:
        c = F.col(col) if isinstance(col, str) else col
        return (
            df.where(c.isNotNull())
            .select(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit(salt + ":"), c.cast("string"))
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("_h")
            )
            .distinct()
        )

    ha = hashes(df_a, col_a)
    hb = hashes(df_b, col_b if col_b is not None else col_a)
    bottom = ha.union(hb).distinct().orderBy("_h").limit(k)
    in_both = bottom.join(ha, "_h", "left_semi").join(
        hb, "_h", "left_semi"
    )
    agg = bottom.agg(
        F.count("*").cast("long").alias("n_union_seen"),
        F.max("_h").alias("kth_hash"),
    ).crossJoin(
        F.broadcast(
            in_both.agg(F.count("*").cast("long").alias("_nb"))
        )
    )
    exact = F.col("n_union_seen") < k
    est_union = F.when(
        exact, F.col("n_union_seen").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("kth_hash").cast("double") / F.lit(_KMV_DOMAIN))
    )
    est_j = F.col("_nb").cast("double") / F.col("n_union_seen")
    return agg.select(
        "n_union_seen",
        "kth_hash",
        F.round(est_union, 4).alias("est_union"),
        F.round(est_j, 6).alias("est_jaccard"),
        F.round(est_j * est_union, 4).alias("est_intersection"),
        exact.alias("exact"),
    )


def kmv_quantiles(
    df: DataFrame,
    value_col,
    key_col,
    probs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 256,
    salt: str = "kmvq",
) -> DataFrame:
    """Quantile estimates from a KMV bottom-k uniform row sample — the
    deterministic, oracle-replayable alternative to approx_percentile
    (Spark's GK/KLL-style sketches carry engine-specific state that
    cannot be hash-checked across engines). The rows whose md5-hashed
    ``key_col`` lands in the bottom k form a simple random sample
    without replacement (the hash is uniform and independent of the
    value), and the type-1 sample order statistic

        estimate(p) = value at rank max(1, ceil(p * n_sample))

    is a consistent estimator of the population quantile with the
    usual O(1/sqrt(k)) sampling error. Everything is md5 order
    statistics + integer ranks, so both engines compute the identical
    sample and the identical estimates.

    ``key_col`` must be unique per row (the usual surrogate id) — a
    repeated key would under-weight its rows. Rows with a null key or
    null value are ignored. ``exact = true`` when the sample IS the
    whole input (n_total <= k).

    Plan shape: one hash projection (codegen), one distributed
    bottom-k (TakeOrdered — no global sort), one O(k) single-partition
    rank window over the sample (bounded by construction), one 1-row
    total count, and two broadcast joins of |probs| rows. Sketch state
    is k (hash, value) rows at any input size and merges by union +
    re-bottom-k on the carried hash, so day-over-day quantiles never
    rescan history.

    Returns one row per prob, ordered:
    ``(prob, rank, n_sample, estimate, exact)``; empty input gives an
    empty result.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in (0, 1]")
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col)
    vc = vc.cast("double")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), kc.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h")
    )
    kept = df.where(kc.isNotNull() & vc.isNotNull())
    samp = kept.select(h, vc.alias("_v")).orderBy("_h").limit(k)
    ranked = samp.select(
        "_v",
        F.row_number()
        .over(Window.orderBy("_v", "_h"))
        .alias("_r"),
    )
    n_samp = samp.agg(F.count("*").cast("long").alias("n_sample"))
    n_total = kept.agg(F.count("*").cast("long").alias("_n_total"))
    pr = df.sparkSession.createDataFrame(
        [(p,) for p in probs], "prob: double"
    )
    tgt = (
        pr.crossJoin(F.broadcast(n_samp))
        .crossJoin(F.broadcast(n_total))
        .select(
            "prob",
            "n_sample",
            "_n_total",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("prob") * F.col("n_sample")),
            )
            .cast("int")
            .alias("rank"),
        )
    )
    return (
        F.broadcast(tgt)
        .join(ranked, tgt["rank"] == ranked["_r"])
        .select(
            "prob",
            "rank",
            "n_sample",
            F.col("_v").alias("estimate"),
            (F.col("n_sample") >= F.col("_n_total")).alias("exact"),
        )
        .orderBy("prob")
    )


def kmv_quantiles_by_key(
    df: DataFrame,
    value_col,
    key_col,
    group_col,
    probs=(0.25, 0.5, 0.75, 0.9),
    k: int = 256,
    salt: str = "kmvq",
) -> DataFrame:
    """Per-group quantile table from per-group KMV bottom-k samples —
    the GROUP BY form of :func:`kmv_quantiles`, and the shape a data
    card actually wants ("p50/p90 doc length per source"). Each
    group's k lowest-hash rows form an independent simple random
    sample (the md5 hash is uniform and independent of both value and
    group), and each requested quantile is the type-1 order statistic
    at rank max(1, ceil(p * n_g)). All md5 order statistics + integer
    ranks: both engines compute identical samples and identical
    estimates per group.

    ``key_col`` must be unique per row. Rows with a null key, value,
    or group are ignored. ``exact = true`` for groups fully inside
    their sample (n_g_total <= k).

    Plan shape: the bottom-k window (row_number over hash) gets
    Partial+Final WindowGroupLimit — only k rows per group leave each
    map partition — and the per-group TOTAL is a separate
    ``groupBy(group).count()`` (map-side partial aggregation)
    equi-joined onto the <= k-row sample. Both legs shuffle on
    ``group_col`` and nothing ever funnels a whole hot group through
    one task: an unbounded ``count(*) over (partition by group)``
    would sit below the group limit and scan every row of the
    hottest group in a single window task, which at 100 TB with a
    skewed source column is the data-card bottleneck (that shape is
    plan-banned in tests/test_plans.py). The per-group rank window
    runs over the surviving <= k sample rows only; probs arrive as an
    exploded LITERAL array and a pure filter picks each group's
    order-statistic rows. Per-group sketch state is k (hash, value)
    rows and merges by union + per-group re-bottom-k on the carried
    hash, so day-over-day per-source quantiles never rescan history.

    Returns one row per (group, prob), ordered:
    ``(group, prob, rank, n_sample, estimate, exact)``.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in (0, 1]")
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col)
    vc = vc.cast("double")
    kept = df.where(kc.isNotNull() & vc.isNotNull() & gc.isNotNull())
    hashed = kept.select(
        gc.alias("group"),
        kmv_hash_col(kc, salt),
        vc.alias("_v"),
    )
    totals = hashed.groupBy("group").agg(
        F.count("*").cast("long").alias("_n_total")
    )
    # (_h, _v) retention order: _h ties (48-bit collisions) are
    # near-impossible but the deterministic tiebreak keeps this path,
    # the sketch/merge path (kmv_quantile_sketch) and the SQL oracle
    # bit-identical even on one.
    samp = (
        hashed.withColumn(
            "_bk",
            F.row_number().over(
                Window.partitionBy("group").orderBy("_h", "_v")
            ),
        )
        .where(F.col("_bk") <= k)
        .join(totals, "group")
    )
    ranked = samp.select(
        "group",
        "_v",
        "_n_total",
        F.row_number()
        .over(Window.partitionBy("group").orderBy("_v", "_h"))
        .alias("_r"),
        F.count("*")
        .over(Window.partitionBy("group"))
        .cast("long")
        .alias("n_sample"),
    )
    probs_arr = F.array(*[F.lit(p) for p in probs])
    return (
        ranked.withColumn("prob", F.explode(probs_arr))
        .where(
            F.col("_r")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("prob") * F.col("n_sample")),
            ).cast("int")
        )
        .select(
            "group",
            "prob",
            F.col("_r").alias("rank"),
            "n_sample",
            F.col("_v").alias("estimate"),
            (F.col("n_sample") >= F.col("_n_total")).alias("exact"),
        )
        .orderBy("group", "prob")
    )


def _bottom_k_rows(rows: DataFrame, k: int) -> DataFrame:
    """Per-group bottom-k of (group, _h, _v) rows by hash — the shared
    retention step of the sketch build and the sketch merge."""
    from pyspark.sql import Window

    return (
        rows.withColumn(
            "_bk",
            F.row_number().over(
                Window.partitionBy("group").orderBy("_h", "_v")
            ),
        )
        .where(F.col("_bk") <= k)
        .drop("_bk")
    )


def _collect_sketch(rows: DataFrame, totals: DataFrame) -> DataFrame:
    """Assemble one sketch row per group: sorted (hash, value) sample
    array + the group's total row count."""
    samples = rows.groupBy("group").agg(
        F.sort_array(
            F.collect_list(F.struct("_h", "_v"))
        ).alias("sample")
    )
    return samples.join(totals, "group").select(
        "group", "n_total", "sample"
    )


def kmv_quantile_sketch(
    df: DataFrame,
    value_col,
    key_col,
    group_col,
    k: int = 256,
    salt: str = "kmvq",
) -> DataFrame:
    """Build the PERSISTABLE per-group quantile sketch behind
    :func:`kmv_quantiles_by_key`: ONE ROW PER GROUP holding the
    group's total row count and its bottom-k (hash, value) sample as
    a sorted array — k <= a few hundred, so a day's sketch of a
    million groups is a million tiny rows, not a corpus.

    This is the day-over-day API: sketch each day once, persist the
    sketch table, and answer "p50/p90 per source over any span" by
    :func:`kmv_quantile_sketch_merge`-ing the days and reading
    estimates with :func:`kmv_quantiles_from_sketch` — history is
    never rescanned. ``kmv_quantiles_by_key(df, ...)`` equals
    ``kmv_quantiles_from_sketch(kmv_quantile_sketch(df, ...))``
    exactly, and the merge of disjoint slices equals the one-shot
    sketch of their union (both pytest-asserted; the merge theorem is
    also the q114 gate).

    ``key_col`` must be unique per row ACROSS the slices that will be
    merged (re-ingesting the same rows would double-count
    ``n_total``). Rows with a null key, value, or group are ignored.

    Plan shape: the bottom-k window gets WindowGroupLimit (<= k rows
    per group leave each map partition) and the total is a
    map-side-combining ``groupBy(group).count()`` joined in by
    :func:`_collect_sketch` — no unbounded count window, so a hot
    group never funnels through one task (same skew discipline as
    :func:`kmv_quantiles_by_key`, plan-asserted). Both legs shuffle
    on ``group_col``; the collect into the sample array runs over the
    bounded sample only.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col)
    vc = vc.cast("double")
    kept = df.where(kc.isNotNull() & vc.isNotNull() & gc.isNotNull())
    hashed = kept.select(
        gc.alias("group"),
        kmv_hash_col(kc, salt),
        vc.alias("_v"),
    )
    totals = hashed.groupBy("group").agg(
        F.count("*").cast("long").alias("n_total")
    )
    return _collect_sketch(_bottom_k_rows(hashed, k), totals)


def kmv_quantile_sketch_merge(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """Merge two per-group quantile sketches built over DISJOINT row
    slices (two days, two shards): per group, union the samples and
    re-take the bottom k by hash; totals add. The result is
    bit-identical to the one-shot sketch over the concatenated input
    — the KMV merge theorem (the bottom-k of a union is the bottom-k
    of the union of bottom-ks), so estimates never drift however the
    history was sliced. Use the same ``k``/salt the inputs were built
    with (a larger k cannot be recovered from smaller sketches)."""

    def explode_side(s: DataFrame) -> DataFrame:
        return s.select(
            "group", F.explode("sample").alias("p")
        ).select("group", F.col("p._h").alias("_h"),
                 F.col("p._v").alias("_v"))

    rows = explode_side(a).union(explode_side(b))
    totals = (
        a.select("group", "n_total")
        .union(b.select("group", "n_total"))
        .groupBy("group")
        .agg(F.sum("n_total").cast("long").alias("n_total"))
    )
    return _collect_sketch(_bottom_k_rows(rows, k), totals)


def kmv_quantiles_from_sketch(
    sketch: DataFrame,
    probs=(0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Read per-group quantile estimates from a persisted/merged
    sketch — :func:`kmv_quantiles_by_key`'s exact output shape
    ``(group, prob, rank, n_sample, estimate, exact)``, computed from
    the k-row samples alone (the corpus is long gone). Zero joins:
    probs explode from a literal and a filter picks each group's
    order-statistic rows."""
    from pyspark.sql import Window

    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in (0, 1]")
    rows = sketch.select(
        "group",
        "n_total",
        F.size("sample").cast("long").alias("n_sample"),
        F.explode("sample").alias("p"),
    ).select(
        "group", "n_total", "n_sample",
        F.col("p._h").alias("_h"), F.col("p._v").alias("_v"),
    )
    ranked = rows.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("group").orderBy("_v", "_h")
        ),
    )
    probs_arr = F.array(*[F.lit(p) for p in probs])
    return (
        ranked.withColumn("prob", F.explode(probs_arr))
        .where(
            F.col("_r")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("prob") * F.col("n_sample")),
            ).cast("int")
        )
        .select(
            "group",
            "prob",
            F.col("_r").alias("rank"),
            "n_sample",
            F.col("_v").alias("estimate"),
            (F.col("n_sample") >= F.col("n_total")).alias("exact"),
        )
        .orderBy("group", "prob")
    )


def kmv_distinct_by_key(
    df: DataFrame,
    col,
    group_col,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimates — the GROUP BY form of
    :func:`kmv_distinct` and the other half of the data card
    (q110/q114 answer "p50/p90 per source", this answers "distinct
    users per source/event type"): each group keeps its k smallest
    DISTINCT md5 hashes and applies Beyer et al. 2007's estimator
    independently; groups with fewer than k distinct values report
    the exact count (``exact = true``).

    Plan shape: one hash projection (codegen), ONE shuffle on
    (group, hash) serving the distinct + the per-group bottom-k
    window + the per-group aggregate — zero joins. A hot group still
    retains k rows after the window filter. Per-group sketch state is
    k hashes and merges by union + per-group re-bottom-k, so
    day-over-day distinct counts never rescan history.

    Returns one row per group, ordered:
    ``(group, n_seen, kth_hash, estimate, exact)``. Null values and
    null groups are ignored.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    c = F.col(col) if isinstance(col, str) else col
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    hashed = (
        df.where(c.isNotNull() & gc.isNotNull())
        .select(gc.alias("group"), kmv_hash_col(c, salt))
        .distinct()
    )
    bottom = hashed.withColumn(
        "_bk",
        F.row_number().over(
            Window.partitionBy("group").orderBy("_h")
        ),
    ).where(F.col("_bk") <= k)
    agg = bottom.groupBy("group").agg(
        F.count("*").cast("long").alias("n_seen"),
        F.max("_h").alias("kth_hash"),
    )
    exact = F.col("n_seen") < k
    est = F.when(exact, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.col("kth_hash").cast("double") / F.lit(_KMV_DOMAIN))
    )
    return agg.select(
        "group",
        "n_seen",
        "kth_hash",
        F.round(est, 4).alias("estimate"),
        exact.alias("exact"),
    ).orderBy("group")


def data_card(
    df: DataFrame,
    value_col,
    group_col,
    distinct_col,
    probs=(0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """One-pass per-group data card (VERDICT r8 ask #7): row count,
    value total, EXACT type-1 quantiles of ``value_col``, and the
    EXACT distinct count of ``distinct_col`` — the summary q81 + q110
    + q116 publish, composed so the corpus is scanned ONCE and
    shuffled ONCE instead of three times.

    How one shuffle carries three different aggregations: each input
    row explodes into two tagged rows — ``(_kind=0, _vnum=value)``
    for the value histogram and ``(_kind=1, _vstr=distinct key)`` for
    the distinct set — and ONE ``groupBy(group, _kind, _vnum,
    _vstr).count()`` collapses both. That aggregation partial-
    combines map-side AND spreads a hot group across its value/key
    domain, so the only corpus-sized Exchange carries combined
    (group, kind, value) partials, never raw rows, and no single
    task ever scans a whole hot group (the q110 skew discipline).
    Everything downstream runs on the HISTOGRAM — rows bounded by
    per-group value cardinality (q57's bounded kind), the one
    size-contract of this operator: quantiles here are EXACT because
    they come off the full value histogram, the right trade for
    discrete/integer values (lengths, token counts); for unbounded-
    cardinality doubles use :func:`kmv_quantiles_by_key`'s bounded
    k-row sample instead.

    Quantile convention is the family's: type-1 order statistic at
    rank ``max(1, ceil(p * n_vals))`` over non-null values — the
    smallest histogram value whose cumulative count reaches the
    rank. Null values count in ``n_rows`` but not in ``n_vals`` /
    quantiles; null distinct keys are ignored (COUNT DISTINCT
    semantics). Rows with a null group are ignored.

    Returns one row per group, ordered:
    ``(group, n_rows, n_vals, total_value, n_distinct, p<pct>...)``
    with one exact-double quantile column per requested prob.
    """
    from pyspark.sql import Window

    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in (0, 1]")
    names = []
    for p in probs:
        pct = p * 100
        name = f"p{pct:g}".replace(".", "_")
        names.append(name)
    if len(set(names)) != len(names):
        raise ValueError(f"probs collide on column names {names}")
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    vc = (F.col(value_col) if isinstance(value_col, str) else value_col)
    vc = vc.cast("double")
    dc = (
        F.col(distinct_col)
        if isinstance(distinct_col, str)
        else distinct_col
    ).cast("string")
    kept = df.where(gc.isNotNull())
    tagged = kept.select(
        gc.alias("group"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("_kind"),
                    vc.alias("_vnum"),
                    F.lit(None).cast("string").alias("_vstr"),
                ),
                F.struct(
                    F.lit(1).alias("_kind"),
                    F.lit(None).cast("double").alias("_vnum"),
                    dc.alias("_vstr"),
                ),
            )
        ).alias("t"),
    ).select("group", "t._kind", "t._vnum", "t._vstr")
    # THE one corpus-sized shuffle: combined partials on
    # (group, kind, value) — map-side count, skew spread over values.
    hist = tagged.groupBy("group", "_kind", "_vnum", "_vstr").agg(
        F.count("*").cast("long").alias("_n")
    )
    g = hist.groupBy("group").agg(
        F.sum(F.when(F.col("_kind") == 0, F.col("_n")))
        .cast("long")
        .alias("n_rows"),
        F.sum(
            F.when(
                (F.col("_kind") == 0) & F.col("_vnum").isNotNull(),
                F.col("_n"),
            )
        )
        .cast("long")
        .alias("n_vals"),
        F.sum(
            F.when(
                (F.col("_kind") == 0) & F.col("_vnum").isNotNull(),
                F.col("_vnum") * F.col("_n"),
            )
        )
        .alias("total_value"),
        F.sum(
            F.when(
                (F.col("_kind") == 1) & F.col("_vstr").isNotNull(),
                F.lit(1),
            )
        )
        .cast("long")
        .alias("n_distinct"),
    )
    # Quantile branch: the SAME hist subtree, unfiltered below the
    # window — a where() before the window would push a kind/vnum
    # filter beneath the corpus Exchange, making its child differ
    # from g's and defeating ReuseExchange (the corpus would shuffle
    # twice). Instead non-value rows ride through contributing 0 to
    # the running sum and are dropped ABOVE the window; window
    # filters on non-partition columns cannot sink below it, so both
    # branches share one identical — hence reused — corpus Exchange.
    is_val = (F.col("_kind") == 0) & F.col("_vnum").isNotNull()
    w_cum = (
        Window.partitionBy("group")
        .orderBy("_kind", "_vnum")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        hist.withColumn(
            "_cum",
            F.sum(F.when(is_val, F.col("_n")).otherwise(0)).over(w_cum),
        )
        .withColumn(
            "_nv",
            F.sum(F.when(is_val, F.col("_n")).otherwise(0)).over(
                Window.partitionBy("group")
            ),
        )
        .where(is_val)
        .withColumn("_prev", F.col("_cum") - F.col("_n"))
    )
    # probs arrive as an exploded LITERAL; a histogram row serves
    # prob p iff its cumulative span covers rank ceil(p * n_vals).
    probs_arr = F.array(*[F.lit(p) for p in probs])
    picked = (
        cum.withColumn("_p", F.explode(probs_arr))
        .withColumn(
            "_r",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_p") * F.col("_nv")),
            ).cast("long"),
        )
        .where(
            (F.col("_prev") < F.col("_r"))
            & (F.col("_r") <= F.col("_cum"))
        )
    )
    qcols = picked.groupBy("group").agg(
        *[
            F.max(
                F.when(F.col("_p") == p, F.col("_vnum"))
            ).alias(name)
            for p, name in zip(probs, names)
        ]
    )
    return (
        g.join(qcols, "group", "left")
        .select(
            "group", "n_rows", "n_vals", "total_value", "n_distinct",
            *names,
        )
        .orderBy("group")
    )
