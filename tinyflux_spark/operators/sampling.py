"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is rarely trained on whole: pipelines down-sample,
re-balance source mixes, and cap per-domain contributions. These
operators make every such decision a *pure function of the row id* —
re-running the pipeline (or running it on two clusters) selects the
same rows, and the selection is expressible in ANSI SQL so the DuckDB
oracle can replay it bit-for-bit. Nothing here uses ``rand()``: Spark's
``sample()`` is seed-stable only for an identical partitioning, which a
100 TB re-run does not guarantee.

All expressions are built-in ``pyspark.sql.functions`` (JVM codegen, no
Python UDFs, no shuffle for the Bernoulli path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._spread import spread_scan

__all__ = [
    "hash_bucket",
    "hash_sample",
    "importance_weights",
    "rate_threshold_hex",
    "shard_assign",
    "stratified_quota",
    "temperature_sample",
    "weighted_sample",
    "weighted_sample_by_key",
]

# Number of distinct values of the 4-hex-digit hash prefix.
_BUCKETS = 1 << 32


def hash_bucket(id_col, salt: str = "sample") -> Column:
    """Uniform hash key for a row id: the first 8 hex digits of
    ``md5("<salt>:<id>")``, as a lowercase string.

    String (not integer) on purpose: lexicographic compare over
    fixed-width lowercase hex equals numeric compare, and both Spark
    and DuckDB produce the identical md5 hex digest, so a threshold
    check is portable across engines with zero conversion functions.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 8
    )


def rate_threshold_hex(rate_col: Column) -> Column:
    """A keep rate in [0, 1] as its fixed-width 8-hex-char threshold,
    comparable against :func:`hash_bucket` output.

    Clamped to 2^32 - 1 before hex-encoding: a rate just below 1
    (e.g. n_min/n_g in a >2^32-row group) rounds to exactly 2^32,
    whose hex is 9 chars — lpad(..., 8) would truncate that to 2^28
    and the effective keep rate would collapse from ~1.0 to ~1/16.
    Callers that keep-all on rate >= 1 only cover the exact-1 case.
    """
    return F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.round(rate_col * _BUCKETS).cast("bigint"),
                    F.lit(_BUCKETS - 1),
                )
            )
        ),
        8,
        "0",
    )


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket
    falls below ``rate``.

    The filter is a narrow codegen'd predicate — no shuffle, no state,
    pushes down past projections — and the decision depends only on
    (salt, id), so it is reproducible across runs, partitionings and
    engines. Granularity is 2^-32 (the 8-hex-digit bucket); a rate
    whose rounded threshold degenerates to "keep none" or "keep all"
    is rejected loudly rather than silently mis-sampling (the 4-digit
    predecessor of this code overflowed its own width for rates near 1
    and kept ~6% of rows instead of ~100%).
    """
    if not 0.0 < rate < 1.0:
        raise ValueError("rate must be in (0, 1)")
    t = int(round(rate * _BUCKETS))
    if t <= 0 or t >= _BUCKETS:
        raise ValueError(
            f"rate {rate!r} is indistinguishable from 0 or 1 at the "
            f"2^-32 bucket granularity"
        )
    threshold = format(t, "08x")
    return df.where(hash_bucket(id_col, salt) < F.lit(threshold))


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id for corpus sharding / training-mix
    assignment: ``md5("<salt>:<id>")``'s first 8 hex digits as an
    integer, mod ``n_shards``.

    Writing a 100 TB corpus as N training shards (or splitting
    train/validation/test) must not depend on row order, partitioning,
    or a seeded RNG — a re-run that assigns even one doc differently
    silently leaks data across splits. This is a pure narrow projection
    (one md5 per row, no shuffle); because md5 is uniform the shards are
    balanced to ~1/sqrt(rows-per-shard) relative error, and the same
    expression evaluates identically in any engine with md5 (the DuckDB
    oracle replays it bit-for-bit).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    bucket_int = F.conv(hash_bucket(id_col, salt), 16, 10).cast("bigint")
    return df.withColumn(out_col, bucket_int % n_shards)


def stratified_quota(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "quota",
    prefilter_rate: float | None = None,
) -> DataFrame:
    """Cap each stratum (source / domain / language) at
    ``n_per_stratum`` rows, chosen by deterministic hash order.

    Selection: rank rows within a stratum by ``(md5(salt:id), id)`` and
    keep the first ``n_per_stratum``. Because the hash is uniform this
    is a uniform random sample per stratum, yet fully reproducible.

    Scale notes: the window sort distributes across strata (one task
    per hash-partition of strata, not one global sort). For a skewed
    stratum holding billions of rows, pass ``prefilter_rate`` to
    Bernoulli-prune with :func:`hash_sample` (same salt, so the
    prefilter keeps a superset of every possible final pick — the
    ranking order and the Bernoulli threshold use the identical key)
    before the sort; e.g. quota 10k from ~1B rows → prefilter 1e-4
    leaves ~100k rows to sort. The result is identical as long as the
    prefilter keeps >= n_per_stratum rows per stratum.
    """
    full_key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    if prefilter_rate is not None:
        df = hash_sample(df, id_col, prefilter_rate, salt)
    w = Window.partitionBy(strata_col).orderBy(full_key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture re-balancing: down-sample each group
    (language, source, domain) toward the mix ``p_g ∝ n_g^alpha`` used
    for multilingual/multi-source training sets. Each group keeps rows
    at rate ``(n_min / n_g)^(1 - alpha)``, so the smallest group is
    kept whole (rate exactly 1), alpha=1 is a no-op, and alpha→0
    equalizes all groups to ~n_min rows.

    The per-row decision reuses :func:`hash_bucket`'s deterministic md5
    threshold — reproducible across runs, partitionings and engines,
    per-group instead of global. Plan shape: one tiny group-count
    aggregate, a one-row global min cross-joined into it (bounded build
    sides by construction), the resulting per-group rate table
    broadcast-joined into the corpus, then a narrow codegen filter —
    the corpus itself never shuffles.

    At ``alpha=0.5`` (the common temperature) the rate is computed with
    IEEE-exact ``sqrt`` of an exact integer ratio, so any IEEE engine
    derives the bit-identical threshold — the DuckDB oracle replays it.
    Other alphas go through ``pow``, which libms may round differently
    in the last ulp; the decision could then differ for at most a
    ~2^-32 sliver of ids per group.

    Returns the kept rows with ``group_rows`` (the group's input size)
    and ``keep_rate`` appended.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(group_col).agg(F.count("*").alias("group_rows"))
    n_min = counts.agg(F.min("group_rows").alias("_n_min"))
    ratio = F.col("_n_min") / F.col("group_rows")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    thresh = rate_threshold_hex(F.col("keep_rate"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(group_col, "group_rows", rate.alias("keep_rate"))
        .withColumn("_thresh", thresh)
    )
    kept = df.join(F.broadcast(rates), group_col).where(
        # rate-1 groups keep everything regardless of _thresh, whose
        # 2^32 value would not survive the 8-hex lpad truncation.
        (F.col("keep_rate") >= 1.0)
        | (hash_bucket(id_col, salt) < F.col("_thresh"))
    )
    return kept.drop("_thresh")


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "dsir",
    target_text_col: str = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every source document by how target-like
    its hashed unigram features are —

        log w(x) = sum over tokens t of
                   log( p_target(bucket(t)) / p_source(bucket(t)) )

    with add-``alpha`` smoothing over ``num_buckets`` hashed token
    buckets. Sampling the corpus proportionally to ``exp(log_weight)``
    (or thresholding it) tilts a raw 100 TB crawl toward a target
    domain — the paper's pretraining-data-selection recipe, with
    hashing keeping the feature space fixed-size regardless of
    vocabulary growth.

    Determinism & oracle parity: buckets come from md5 (identical hex
    in Spark and DuckDB, int-decoded from the first 8 hex digits), and
    each bucket's log-ratio is quantized to DECIMAL(20,12) so the
    per-document sum is exact and order-independent (the decimal_sum
    convention used across the LM family).

    Plan shape: two token-histogram aggregations (map-side combined,
    at most ``num_buckets`` rows each), the 1-row totals cross-joined
    in (bounded builds), the bucket→ratio map broadcast back onto the
    exploded source tokens, and one per-document aggregation. No
    Python UDFs, no driver-side loops, nothing quadratic.

    ``target`` needs only its text column — ``target_text_col``
    (default: ``text_col``) names it when the target's schema differs
    from ``df``'s, and no id column is read from it. Documents with
    zero tokens are absent from the output (no features → no weight),
    matching the LM scorers. Returns ``(id, n_tokens, log_weight)``.
    """
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (smoothing)")
    tgt_tc = text_col if target_text_col is None else target_text_col

    def _toks(frame: DataFrame, with_id: bool):
        cols = [F.col(id_col).alias("id")] if with_id else []
        tc = text_col if with_id else tgt_tc
        # the explode + per-token md5 below is pre-shuffle compute —
        # widen single-row-group inputs or it runs one task per file
        frame = spread_scan(
            frame.select(*cols, F.col(tc)), *(["id"] if with_id else [])
        )
        t = F.trim(F.coalesce(F.col(tc).cast("string"), F.lit("")))
        out = frame.select(
            *(["id"] if with_id else []),
            F.explode(F.split(F.lower(t), r"\s+")).alias("tok"),
        ).where(F.length("tok") >= 1)
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + ":"), F.col("tok"))),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            % num_buckets
        ).alias("b")
        return out.select(*(["id"] if with_id else []), bucket)

    src = _toks(df, with_id=True)
    src_hist = src.groupBy("b").agg(F.count("*").alias("sc"))
    tgt_hist = _toks(target, with_id=False).groupBy("b").agg(
        F.count("*").alias("tc")
    )
    src_tot = src_hist.agg(F.sum("sc").alias("st"))
    tgt_tot = tgt_hist.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("tt")
    )
    aB = float(alpha) * num_buckets
    ratio = (
        src_hist.join(tgt_hist, "b", "left")
        .crossJoin(F.broadcast(src_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tt") + F.lit(aB))
                )
                - F.log(
                    (F.col("sc") + F.lit(alpha))
                    / (F.col("st") + F.lit(aB))
                )
            )
            .cast("decimal(20,12)")
            .alias("_lr"),
        )
    )
    return src.join(F.broadcast(ratio), "b").groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("_lr").cast("double").alias("log_weight"),
    )


def weighted_sample(
    df: DataFrame,
    id_col,
    weight_col,
    k: int = 100,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006): each row draws the deterministic uniform
    ``u = h / 2^48`` (md5 order statistics — the KMV family's hash,
    never ``rand()``), scores ``key = ln(u) / w``, and the k rows
    with the LARGEST keys are the sample — exactly equivalent to the
    classic ``u^(1/w)`` top-k (ln is monotone), with each row's
    inclusion probability proportional to its weight among the
    remaining rows, the A-ES guarantee. The data-mixing primitive:
    pair it with importance_weights (q97) or a quality score and the
    corpus subsample tilts toward the target distribution while
    staying reproducible across runs, partitionings and engines.

    Determinism across engines: u is an exact dyadic rational both
    engines compute identically; ``ln(u)/w`` is quantized to
    DECIMAL(38,12) (the LM family's cross-engine 1e-12 grid, widened
    to 26 integer digits: ln(u) >= -34, so tiny weights — e.g. q97
    importance weights — keep exact keys down to w ~ 1e-24 instead of
    silently overflowing a (20,12) into a never-sampled NULL in one
    engine and a cast error in the other) before ranking, with id as
    the tie-break, so the selected SET is bit-stable. Rows with a
    null id, null weight, or weight <= 0 are excluded (a zero-weight
    row must never be drawn; ln(u)/0 is not a number).

    Plan shape: one hash projection (codegen) and ONE distributed
    top-k (TakeOrdered — no global sort, no shuffle of the corpus).
    At 100 TB this is a single scan emitting k rows.

    Returns the k sampled rows ``(id, weight double,
    es_key double — the quantized ranking key, cast back for
    consumers)``, ordered by key descending then id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wc = wc.cast("double")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), idc.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
    )
    # u in (0, 1]: (h + 1) / 2^48 — h == 0 must not produce ln(0)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    key = (F.log(u) / wc).cast("decimal(38,12)")
    return (
        df.where(idc.isNotNull() & wc.isNotNull() & (wc > 0))
        .select(
            idc.alias("id"),
            wc.alias("weight"),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col("id"))
        .limit(k)
        .select(
            "id", "weight", F.col("_k").cast("double").alias("es_key")
        )
    )


def weighted_sample_by_key(
    df: DataFrame,
    id_col,
    weight_col,
    group_col,
    k: int = 100,
    salt: str = "wsample",
) -> DataFrame:
    """Per-group weighted sampling WITHOUT replacement — the GROUP BY
    form of :func:`weighted_sample` and the sampling half of the data
    card family (q110/q116 describe each source; this DRAWS a
    length- or quality-weighted audit sample from each source in one
    pass). Every group independently runs Efraimidis & Spirakis 2006:
    the k rows with the largest ``ln(u)/w`` keys per group are that
    group's sample, with the same md5 dyadic uniforms and
    DECIMAL(38,12) key grid as the global form, so the selected set
    per group is bit-stable across engines, partitionings and reruns
    (and is exactly what ``weighted_sample`` would pick if the group
    were extracted and sampled alone — the hash ignores the group, so
    regrouping documents never changes a row's uniform).

    Plan shape: one hash projection (codegen) and ONE shuffle on the
    group column; the per-group top-k is a rank window whose filter
    Spark rewrites to Partial+Final **WindowGroupLimit** — each map
    task forwards at most k rows per group before the shuffle, so a
    hot group costs k rows of shuffle per input partition, never its
    full row count. No joins, no global sort, no TakeOrdered funnel
    through the driver. (Same skew contract as kmv_quantiles_by_key;
    the count-window anti-pattern this family had in round 8 is
    plan-asserted against regression in tests/test_plans.py.)

    Returns ``(group, id, weight double, es_key double, rank int)``
    with rank 1 = largest key, ordered by (group, rank).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wc = wc.cast("double")
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), idc.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    key = (F.log(u) / wc).cast("decimal(38,12)")
    ranked = (
        df.where(
            idc.isNotNull()
            & gc.isNotNull()
            & wc.isNotNull()
            & (wc > 0)
        )
        .select(
            gc.alias("group"),
            idc.alias("id"),
            wc.alias("weight"),
            key.alias("_k"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("group").orderBy(
                    F.col("_k").desc(), F.col("id")
                )
            ),
        )
        .where(F.col("rank") <= k)
    )
    return ranked.select(
        "group",
        "id",
        "weight",
        F.col("_k").cast("double").alias("es_key"),
        "rank",
    ).orderBy("group", "rank")
