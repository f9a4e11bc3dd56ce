"""Similarity search over embedding columns (array<float>).

Two tiers:

* ``cosine_topk`` — brute-force exact scan: one pass, no shuffle except
  the final top-k. The correctness baseline, and the right choice when
  the query batch is small relative to the corpus scan cost.
* ``srp_lsh_*`` — sign-random-projection LSH: each vector is bucketed by
  the sign pattern of dot products with ``planes`` fixed hyperplanes;
  lookups only scan matching buckets (optionally multiprobe neighbors).
  Sub-linear candidate sets at corpus scale; recall tunable by
  planes/probes. Hyperplanes are generated from a seed so the bucketing
  is deterministic and reproducible across runs and engines.
* ``near_dup_pairs`` — all pairs above a cosine threshold via LSH bucket
  join (embedding near-dup dedup).

All math is double-precision ``F.aggregate``/``F.zip_with`` folds —
JVM-side, no UDFs.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import fsio as _fsio


def _lit_vec(values: Sequence[float]) -> Column:
    """Constant double-array Column built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) ...])`` costs ~1 py4j driver roundtrip per
    element — a 64-dim constant vector is ~65 blocking driver calls
    before any job exists, and a 16-centroid codebook ~1000. One
    ``F.expr("array(...)")`` parses the same literal array in a single
    call; ``repr`` round-trips doubles exactly and the ``D`` suffix
    keeps Spark from reading the literals as DECIMAL.
    """
    return F.expr(
        "array(" + ", ".join(f"{float(x)!r}D" for x in values) + ")"
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Null when either vector has zero norm: cosine is undefined
    there, a bare division crashes under ANSI mode (zero vectors DO
    occur in real corpora — failed or padded embeddings), and null is
    exactly what DuckDB's float division by zero yields, so oracles
    replay the choice for free. Null rows drop from thresholds and
    sort after every real similarity in a DESC ranking."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den)


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: Optional[int] = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    ``round_digits`` rounds the similarity before ranking so rankings
    are reproducible across engines whose float accumulation differs in
    the last ulp; ties break on id.
    """
    q = _lit_vec(query_vec)
    sim = cosine_similarity(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def srp_planes(dim: int, num_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-random-projection."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def srp_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = bit pattern of sign(v·plane_i). Pure expression: the
    plane matrix is inlined as literals (small: planes × dim floats)."""
    bits = []
    for i, plane in enumerate(planes):
        p = _lit_vec(plane)
        bits.append(
            F.when(_dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def srp_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only vectors whose SRP bucket is within
    ``multiprobe`` bit flips of the query's bucket.

    At scale the bucketed table is precomputed once (bucket as a
    partition/cluster column); the probe is then a partition-pruned
    scan of ~|corpus| / 2^planes rows per probed bucket.
    """
    planes = srp_planes(len(query_vec), num_planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(qv, plane)) >= 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if multiprobe >= 1:
        for i in range(num_planes):
            probes.add(qbucket ^ (1 << i))
    bucketed = df.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
    cand = bucketed.where(F.col("_bucket").isin(list(probes)))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold.

    Pairs are generated only within SRP buckets (high-cosine pairs
    almost surely share all sign bits), then verified exactly. The
    bucket equi-join replaces the |n|^2 cross product.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = srp_planes(dim, num_planes, seed)
    # Three deliberate physical choices for the per-pair verify:
    # 1. Norms are computed ONCE per vector and carried through the
    #    join, not recomputed per candidate pair.
    # 2. The fixed-dim vector is unpacked into `dim` scalar columns so
    #    the pair dot product is a flat codegen'd arithmetic expression.
    #    Higher-order functions (aggregate/zip_with) are interpreted,
    #    not codegen'd — on millions of candidate pairs that is the
    #    dominant cost (4x slower measured at 3M pairs x 64 dims).
    # 3. The wide projections/dot are built as SQL expression STRINGS
    #    (selectExpr / one F.expr), not per-column Column objects: the
    #    Column DSL costs ~4 py4j driver roundtrips per term, ~500 for
    #    a 64-dim plan — pure driver latency before any job starts.
    #    The parsed plan is identical.
    b = df.select(
        F.col(id_col).alias("id"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
        F.col(vec_col).alias("_v"),
    ).selectExpr(
        "id",
        "bucket",
        "nrm",
        *[f"CAST(_v[{i}] AS DOUBLE) AS _x{i}" for i in range(dim)],
    )
    # Measured, deliberately NOT width-pinned (r12): pinning the bucket
    # join via pin_group_width was a wash-to-slight-loss (1.25 ->
    # 1.37 s bench protocol) — parallelism is capped by 2^num_planes
    # distinct buckets and the small-corpus verify is cheaper than the
    # pinned exchange's overhead.
    left = b.selectExpr(
        "bucket",
        "id AS id_a",
        "nrm AS na",
        *[f"_x{i} AS _a{i}" for i in range(dim)],
    )
    right = b.selectExpr(
        "bucket",
        "id AS id_b",
        "nrm AS nb",
        *[f"_x{i} AS _b{i}" for i in range(dim)],
    )
    dot = F.expr(
        " + ".join(f"_a{i} * _b{i}" for i in range(dim))
    )
    den = F.col("na") * F.col("nb")
    pairs = (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # zero-norm guard: undefined cosine -> null -> fails the
            # threshold below (same rationale as cosine_similarity)
            F.when(den > 0, dot / den).alias("cosine_sim"),
        )
    )
    return pairs.where(F.col("cosine_sim") >= threshold)


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Strict left-to-right double fold — the same IEEE operation
    sequence as the JVM ``F.aggregate`` fold and DuckDB's list fold, so
    driver-side probe selection reproduces engine-side math exactly
    (numpy's SIMD/pairwise summation would not)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    refine_iters: int = 0,
):
    """Deterministic coarse-quantizer codebook: the id domain [lo, hi]
    is cut into K equal integer buckets and the min-id vector of each
    bucket is taken — a uniform stride over the id range (ids are
    arbitrary w.r.t. embedding space, so this is a uniform sample —
    a reproducible, oracle-replayable k-means init). ``refine_iters``
    Lloyd rounds then optionally move each centroid to its assigned
    cluster's mean: assignment is exactly :func:`ivf_assign`'s
    (6dp-rounded cosine argmax, ties toward the lower index, zero-norm
    sentinel), the mean is computed on the 1e-6 ``floor`` quantization
    grid (:func:`_quantized_mean` — integer sums, partition-order-
    independent, bit-replayable in SQL), and an empty cluster keeps
    its previous centroid. Cosine assignment is invariant to centroid
    norm, so the unnormalized mean needs no re-normalization (the
    spherical k-means step folds into the same update). Deterministic:
    no seed, identical codebooks every run and engine. Returns
    ``[(centroid_idx, vector), ...]`` collected to the driver (K x dim
    floats — broadcast-sized by construction).

    Scale: no global sort/window anywhere — one min/max agg, then ONE
    K-key groupBy with map-side partial aggregation whose ``min_by``
    returns each bucket's min id and its vector together (no second
    scan); each refinement round is one more K-group aggregation of
    integer dim-sums. Every stage is distributed; only K rows ever
    reach the driver per pass.
    """
    id_type = dict(df.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"ivf_centroids requires an integral id column for its "
            f"stride sampling; {id_col!r} is {id_type!r} — add an "
            f"integer surrogate id first"
        )
    bounds = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return []
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    bucket = F.expr(
        f"(({id_col} - {lo}L) * {num_centroids}) div {span}L"
    )
    # min id AND its vector in ONE action (min_by is deterministic
    # here — ids are unique), instead of a collect + an IN-list scan.
    rows = (
        df.groupBy(bucket.alias("_b"))
        .agg(
            F.min(id_col).alias("_cid"),
            F.min_by(vec_col, F.col(id_col)).alias("_vec"),
        )
        .collect()
    )
    by_id = {int(r["_cid"]): list(r["_vec"]) for r in rows}
    cents = [(i, by_id[cid]) for i, cid in enumerate(sorted(by_id))]
    if refine_iters < 0:
        raise ValueError("refine_iters must be >= 0")
    if refine_iters:
        dim = len(cents[0][1])
        train = df.where(
            F.col(vec_col).isNotNull()
            & (F.size(vec_col) == dim)
            & ~F.expr(f"exists(`{vec_col}`, x -> x IS NULL)")
        )
        for _ in range(refine_iters):
            agg_rows = (
                train.groupBy(
                    ivf_assign(F.col(vec_col), cents).alias("_c")
                )
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(
                            F.floor(
                                F.element_at(vec_col, d + 1).cast(
                                    "double"
                                )
                                * F.lit(1e6)
                            ).cast("long")
                        ).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            means = {
                int(r["_c"]): _quantized_mean(
                    [r[f"s{d}"] for d in range(dim)], int(r["n"])
                )
                for r in agg_rows
            }
            cents = [(i, means.get(i, v)) for i, v in cents]
    return cents


def ivf_assign(
    vec_col: Column,
    centroids,
) -> Column:
    """Inverted-list id for a vector: argmax of cosine to the codebook,
    sims rounded to 6dp before comparison (cross-engine ulp noise can't
    flip the argmax) and ties broken toward the lower centroid index.
    One struct array_max — each centroid dot evaluated exactly once.
    """
    # ONE transform over a centroid struct-array literal, the vector
    # norm bound once via a 1-element transform — the unrolled form
    # repeated the norm subtree inside every one of the K scored
    # structs, so the expression tree (and the optimizer's per-save
    # walk of it) grew K x (dot + 2 norm) instead of O(1) + the
    # centroid literal. Numerically IDENTICAL: same 0.0-seeded
    # left-fold dot and sqrt-of-fold norm, same rounded cosine, and
    # the same -2.0 sentinel (below any real cosine) when the vector
    # or the centroid has zero norm — every centroid then ties and
    # the lowest index wins (r = -i, array_max ties to the higher r),
    # the same pick DuckDB's nulls-last DESC ordering makes.
    cents_lit = F.expr(
        "array(" + ", ".join(
            "named_struct('cn', {cn!r}D, 'r', {r}, 'v', array({v}))".format(
                cn=math.sqrt(_seq_dot(cvec, cvec)),
                r=-int(i),
                v=", ".join(f"{float(x)!r}D" for x in cvec),
            )
            for i, cvec in centroids
        ) + ")"
    )

    def _score(n: Column, cs: Column) -> Column:
        den = n * cs["cn"]
        sim = F.when(
            den > 0, F.round(_dot(vec_col, cs["v"]) / den, 6)
        ).otherwise(F.lit(-2.0))
        return F.struct(sim.alias("s"), cs["r"].alias("r"))

    top = F.element_at(
        F.transform(
            F.array(_norm(vec_col)),
            lambda n: F.array_max(
                F.transform(cents_lit, lambda cs: _score(n, cs))
            ),
        ),
        1,
    )
    return (-top["r"]).cast("int")


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-Flat approximate top-k: the second ANN scale path beside
    SRP-LSH (srp_lsh_topk).

    Build: assign every vector to its nearest codebook centroid (the
    inverted list; at scale ``_ivf_list`` is a partition/cluster
    column written once; ``refine_iters`` Lloyd rounds tighten the
    codebook first — see :func:`ivf_centroids`). Probe: rank
    centroids against the query driver-side, scan only the ``nprobe``
    nearest lists, brute-force the survivors — per-query work ~
    nprobe/K of the corpus, recall tunable by nprobe.
    """
    cents = ivf_centroids(
        df, id_col, vec_col, num_centroids, refine_iters
    )
    probes = _ivf_probes(cents, query_vec, nprobe)
    assigned = df.withColumn(
        "_ivf_list", ivf_assign(F.col(vec_col), cents)
    )
    cand = assigned.where(F.col("_ivf_list").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    num_centroids: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Batch IVF-Flat ANN: top-``k`` corpus neighbors for EVERY query
    row at once — the retrieval shape real pipelines run (kNN graphs,
    dedup-by-ANN, hard-negative mining), where issuing ``ivf_topk``
    per query would re-scan the corpus |queries| times.

    Probe selection happens engine-side per query row (the same
    rounded-cosine ranking with ties toward the lower centroid index
    that ``ivf_assign`` / the driver path use), each query explodes to
    its ``nprobe`` list ids, and the exploded query set joins the
    assigned corpus on the list id.

    Scale shape: the query batch is small relative to the corpus, so
    the query side BROADCASTS — the corpus is never shuffled at all
    (broadcast hash join against the assignment, which at scale is the
    materialized ``_ivf_list`` partition column, making the join a
    partition-pruned scan of the probed lists). The only shuffle is the
    per-query top-k window over candidates (~ nprobe/K of the corpus
    per query). Output: (query_id, id, cosine_sim, rank).

    Returns ``rank`` 1..k per query ordered by (cosine_sim DESC, id);
    ``exclude_self`` drops a corpus row whose id equals the query id
    (queries drawn from the corpus itself).
    """
    from pyspark.sql import Window

    qid = query_id_col or id_col
    qvc = query_vec_col or vec_col
    if k <= 0:
        raise ValueError("ivf_topk_batch: k must be positive")
    if nprobe <= 0:
        raise ValueError("ivf_topk_batch: nprobe must be positive")
    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)
    if not cents:
        raise ValueError("ivf_topk_batch: empty corpus")
    # Norms computed ONCE per corpus row / per query row and carried
    # through the join — the aggregate fold is interpreted, so folding
    # it per candidate PAIR would redo each corpus row's norm once per
    # matching query (same rationale as near_dup_pairs).
    # The assign + probe-join + cosine + per-query group-limit all run
    # on the corpus scan's own partitioning (the query side is
    # broadcast, so there is no exchange before the top-k window):
    # widen a single-row-group corpus first (r13 profile: the whole
    # scoring pass was ONE 480 ms task with 31 idle cores; no-op on
    # well-partitioned inputs — see _spread).
    from ._spread import spread_scan

    assigned = spread_scan(
        corpus.select(id_col, vec_col), id_col
    ).withColumn(
        "_ivf_list", ivf_assign(F.col(vec_col), cents)
    ).withColumn("_nrm", _norm(F.col(vec_col)))
    q_exp = _batch_query_probes(queries, cents, qid, qvc, nprobe)
    return _batch_topk_over_candidates(
        assigned, q_exp, k, id_col, vec_col, exclude_self
    )


# Above this K the probe ranking switches from a literal expression
# to a broadcast join: the literal form costs O(K*dim) expression
# nodes PER PLAN, and at auto-K (K ~ sqrt(N)) plan-build + codegen
# compile time grows with the corpus — measured: the 100x retrained
# index (K=447) served a 50-query batch 5x SLOWER than the stale
# K=16 index purely on planning cost, and K=2449 OOMed the driver
# in the residual path before r11's join rewrites. 64 keeps every
# gate fixture (K <= 16) and typical hand-tuned indexes on the
# narrow no-shuffle path, with bit-identical results either way
# (pytest-asserted at K straddling the threshold).
_PROBE_LITERAL_MAX_K = 64


def _batch_query_probes(
    queries: DataFrame, cents, qid: str, qvc: str, nprobe: int
) -> DataFrame:
    """``(_qid, _qvec, _qnrm, _ivf_list)`` — each query row exploded
    to its ``nprobe`` probe list ids, selected ENGINE-side with the
    same rounded-cosine ranking (ties toward the lower centroid
    index, zero-norm sentinel) as ``_ivf_probes``/``ivf_assign``.

    Two physically different, numerically IDENTICAL forms: small
    codebooks rank inside one narrow expression (array_sort over K
    literal structs — no join, no shuffle); codebooks past
    ``_PROBE_LITERAL_MAX_K`` rank through a broadcast join of the
    K-row centroid table + a per-query rank window that compiles to
    WindowGroupLimit (the codebook is DATA at auto-K scale — pasting
    it as literals makes plan size grow with the corpus)."""
    qv = F.col(qvc)
    if len(cents) <= _PROBE_LITERAL_MAX_K:
        # ONE transform over a centroid struct-array literal, with the
        # query norm bound once via a 1-element transform (the unrolled
        # form repeated the norm subtree inside every one of the K
        # scored structs — K x (dot + 2 norm) trees the optimizer
        # re-walked per save). Numerically IDENTICAL to the unrolled
        # form and to _ivf_probes/ivf_assign: same 0.0-seeded
        # left-fold dot, same sqrt-of-fold norm, same rounded cosine,
        # same zero-norm sentinel (ns = 2.0 = -(-2.0), ranking last),
        # same (ns, i) ascending sort with ties toward the lower index.
        cents_sql = "array(" + ", ".join(
            "named_struct('cn', {cn!r}D, 'i', {i}, 'v', array({v}))".format(
                cn=math.sqrt(_seq_dot(cvec, cvec)),
                i=int(i),
                v=", ".join(f"{float(x)!r}D" for x in cvec),
            )
            for i, cvec in cents
        ) + ")"
        norm_sql = (
            f"SQRT(aggregate(`{qvc}`, 0.0D, (acc, v) -> "
            "acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        )
        dot_sql = (
            f"aggregate(zip_with(`{qvc}`, cs.v, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, v) -> acc + v)"
        )
        scored_sql = (
            f"element_at(transform(array({norm_sql}), n -> "
            f"transform({cents_sql}, cs -> named_struct("
            "'ns', -(CASE WHEN (n * cs.cn) > 0.0D THEN "
            f"round({dot_sql} / (n * cs.cn), 6) "
            "ELSE -2.0D END), "
            "'i', cs.i))), 1)"
        )
        probes = F.slice(F.array_sort(F.expr(scored_sql)), 1, nprobe)
        return queries.select(
            F.col(qid).alias("_qid"),
            qv.alias("_qvec"),
            _norm(qv).alias("_qnrm"),
            F.explode(F.transform(probes, lambda s: s["i"])).alias(
                "_ivf_list"
            ),
        )
    from pyspark.sql import Window

    spark = queries.sparkSession
    # centroid norm precomputed driver-side with the SAME python
    # sqrt/dot as the literal path, so den is the same double
    cdf = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v],
             float(math.sqrt(_seq_dot(v, v))))
            for i, v in cents
        ],
        "_cidx int, _cvec array<double>, _cn double",
    )
    # rank per QUERY ROW, not per _qid: a per-row key captured BEFORE
    # the join keeps duplicate query ids from sharing one nprobe
    # budget across their rows — the literal path ranks per row, and
    # the two forms must stay bit-identical either side of the
    # threshold (ADVICE r11). Query ids should still be unique for
    # the downstream per-_qid top-k to mean anything; the probe step
    # itself no longer silently diverges when they aren't.
    q = queries.select(
        F.col(qid).alias("_qid"),
        qv.alias("_qvec"),
        _norm(qv).alias("_qnrm"),
        F.lit(0).alias("_j"),
    ).withColumn("_qrow", F.monotonically_increasing_id())
    den = F.col("_qnrm") * F.col("_cn")
    sim = F.when(
        den > 0,
        F.round(_dot(F.col("_qvec"), F.col("_cvec")) / den, 6),
    ).otherwise(F.lit(-2.0))
    w = Window.partitionBy("_qrow").orderBy(
        (-sim).asc(), F.col("_cidx").asc()
    )
    return (
        q.join(F.broadcast(cdf.withColumn("_j", F.lit(0))), "_j")
        .withColumn("_pr", F.row_number().over(w))
        .where(F.col("_pr") <= nprobe)
        .select(
            "_qid", "_qvec", "_qnrm",
            F.col("_cidx").alias("_ivf_list"),
        )
    )


def _batch_topk_over_candidates(
    assigned: DataFrame,
    q_exp: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool,
    key: str = "_ivf_list",
) -> DataFrame:
    """Broadcast the exploded query batch onto the ``key``-bucketed
    corpus rows (which must already carry ``_nrm``), score exact
    cosine per candidate, and keep the per-query top-k via a rank
    window (WindowGroupLimit: at most k rows per query leave each map
    task)."""
    from pyspark.sql import Window

    joined = assigned.join(F.broadcast(q_exp), key)
    if exclude_self:
        joined = joined.where(F.col(id_col) != F.col("_qid"))
    bden = F.col("_nrm") * F.col("_qnrm")
    sim = F.round(
        F.when(bden > 0, _dot(F.col(vec_col), F.col("_qvec")) / bden),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        joined.select(
            F.col("_qid").alias("query_id"),
            F.col(id_col),
            sim.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


# ----------------------------------------------------------------------
# Materialized ANN indexes: the 100 TB serving path
# ----------------------------------------------------------------------
# ivf_topk / srp_lsh_topk recompute bucket assignment per query — right
# for one-off batch jobs, wrong for a serving corpus. These write the
# assignment ONCE as a parquet dataset partitioned by the list/bucket
# id, so every query is a directory-pruned scan (PartitionFilters,
# asserted in tests/test_plans.py) of ~nprobe/K (IVF) or
# ~(1+planes)/2^planes (SRP) of the corpus. The codebook/plane seed is
# persisted beside the data: opening an index never touches the corpus.


def _ivf_probes(centroids, query_vec: Sequence[float], nprobe: int):
    """Centroid indexes of the ``nprobe`` lists nearest the query —
    driver-side, same rounded-cosine ranking the engine-side assignment
    uses (ties toward the lower index). Zero-norm query or centroid
    scores the sentinel 2.0 (= negated -2.0, ranking last, ties by
    index) — mirroring ivf_assign's sentinel and DuckDB's nulls-last
    ordering."""
    qn = math.sqrt(_seq_dot(query_vec, query_vec))

    def neg_sim(cvec):
        den = qn * math.sqrt(_seq_dot(cvec, cvec))
        if den <= 0:
            return 2.0
        return -round(_seq_dot(query_vec, cvec) / den, 6)

    ranked = sorted((neg_sim(cvec), i) for i, cvec in centroids)
    return [i for _, i in ranked[:nprobe]]


def _with_residual(
    assigned: DataFrame, cents, vec_col: str
) -> DataFrame:
    """Residual ``x - c_list`` computed through a BROADCAST JOIN on
    the assigned list id (``_ivf_list`` must already be present) —
    an exact IEEE subtraction of two doubles both engines hold
    bit-identically, so every downstream PQ stage stays
    oracle-replayable; joined rather than pasted, which is what
    survives auto-K scale.
    The codebook is DATA (K rows), not an expression: pasting a
    K x dim literal array into the residual expression lets
    CollapseProject inline it into every one of pq_encode's m x ksub
    distance terms — at K ≈ √N = 2449 (the 100x corpus) that is
    ~20M expression nodes and the DRIVER OOMs while planning the
    encode (measured, r11). Joined, each PQ term references a plain
    ``zip_with(vec, _cvec, ...)`` over two real columns; the K rows
    ship once as a broadcast relation. Same doubles, same IEEE
    subtraction — bit-identical to the literal form
    (pytest-asserted via append ≡ rebuild and the q118 gate)."""
    spark = assigned.sparkSession
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in cents],
        "_ivf_list int, _cvec array<double>",
    )
    return (
        assigned.join(F.broadcast(cdf), "_ivf_list")
        .withColumn(
            "_res",
            F.zip_with(
                F.col(vec_col),
                F.col("_cvec"),
                lambda x, y: x.cast("double") - y,
            ),
        )
        .drop("_cvec")
    )


def _encode_for_index(assigned: DataFrame, cents, books, id_col: str,
                      vec_col: str, residual: bool) -> DataFrame:
    """The one shared codes-building step of the index WRITE and
    APPEND paths: PQ-encode the assigned rows (the raw vectors, or
    their coarse residuals when the index is residual) at the given
    FROZEN books — write/append can never drift on what a code
    means."""
    if residual:
        src = _with_residual(assigned, cents, vec_col)
        return pq_encode(
            src, books, id_col, "_res", extra_cols=("_ivf_list",)
        )
    return pq_encode(
        assigned, books, id_col, vec_col, extra_cols=("_ivf_list",)
    )


def _ivdir(version: int) -> str:
    """Directory name of an index version (``index_v000003``) — the
    ``storages.py`` MVCC version-dir naming applied to ANN indexes."""
    return f"index_v{version:06d}"


# Top-level members of the flat (pre-versioning) index layout — what a
# retrain's GC removes once the flat generation is superseded twice.
_FLAT_INDEX_MEMBERS = (
    "lists", "codes", "codebook.json", "pq_books.json", "params.json",
    "buckets", "planes.json",
)

# Generation commit marker: ``<path>/index_v<N>/_SUCCESS``, created
# LAST, after the staged generation is a complete index layout.
# Existence-gated — readers never parse it — so the commit is one
# marker CREATION, which holds on object stores too (no atomic rename
# exists there; a pointer-file flip would not survive the port off
# POSIX). The underscore prefix keeps it invisible to parquet scans.
_GEN_COMMIT_MARKER = "_SUCCESS"

# Retrain intent marker at the index ROOT: enforces the index family's
# single-writer contract across retrain AND append (an append
# committed into the old generation after the retrain's read plans
# would silently miss the new one). A marker older than this is a
# crashed retrain and is reclaimed rather than wedging appends.
_RETRAIN_INTENT = "_retrain_intent.json"
_RETRAIN_INTENT_STALE_S = 3600.0


def _list_index_versions(path: str, spark=None) -> dict:
    """``{version: committed}`` for every ``index_v*`` generation dir
    under the index root — one Hadoop listing + one marker-existence
    probe per generation (generation counts are single-digit by the
    keep-2 GC)."""
    out = {}
    for name in _fsio.list_names(path, spark):
        if not name.startswith("index_v"):
            continue
        try:
            v = int(name[len("index_v"):])
        except ValueError:
            continue
        out[v] = _fsio.exists(
            _fsio.pjoin(path, name, _GEN_COMMIT_MARKER), spark
        )
    return out


def _read_index_version(path: str, spark=None):
    """Current version number of a versioned index root, or None for
    a flat (never-retrained) index: the highest generation whose
    ``_SUCCESS`` marker exists. A legacy ``_current.json`` pointer
    (the pre-r12 POSIX-rename commit) is honored only when NO
    marker-committed generation exists — the first marker-protocol
    retrain supersedes and deletes it."""
    committed = [
        v for v, ok in _list_index_versions(path, spark).items() if ok
    ]
    if committed:
        return max(committed)
    legacy = _fsio.read_json_if_exists(
        _fsio.pjoin(path, "_current.json"), spark
    )
    return None if legacy is None else int(legacy["version"])


def _resolve_index_root(path: str, spark=None) -> str:
    """Physical directory of the CURRENT index version. A retrained
    index is versioned — ``<path>/index_v<N>/`` generations, each
    committed by the creation of its ``_SUCCESS`` marker (scan
    protocol: current = highest committed generation) — while a
    freshly-built index is flat at ``path`` itself. Readers resolve
    when they PLAN, so an in-flight serving read keeps a consistent
    snapshot across a concurrent :func:`ivf_retrain_index` /
    :func:`srp_retrain_index` (the superseded generation survives one
    further retrain before GC). All metadata I/O goes through the
    Hadoop FS API (:mod:`tinyflux_spark.fsio`), so the index root may
    live on any supported scheme — local, ``file://``, ``hdfs://``,
    object storage — exactly like its parquet halves. Idempotent: a
    resolved version dir contains no ``index_v*`` children, so double
    resolution is a no-op."""
    v = _read_index_version(path, spark)
    return path if v is None else _fsio.pjoin(path, _ivdir(v))


def _flip_index_pointer(path: str, version: int) -> None:
    """Commit a retrain: CREATE the staged generation's ``_SUCCESS``
    marker. A concurrent reader's generation scan sees the marker or
    not — never a torn state — and a crash anywhere before this call
    leaves the old index fully intact (an unmarked staging dir is
    invisible to :func:`_read_index_version`). Creation-gated rather
    than rename-gated so the commit holds on object stores, which
    have no atomic rename (VERDICT r11: the pointer-file flip was the
    one POSIX-rename dependency in the lifecycle). The marker is
    written after ALL generation data, so even a torn marker write
    gates a complete index. A superseded legacy ``_current.json``
    pointer is removed after the marker lands (the scan outranks it
    either way)."""
    _fsio.create_json(
        _fsio.pjoin(path, _ivdir(int(version)), _GEN_COMMIT_MARKER),
        {"version": int(version)},
    )
    _fsio.delete(_fsio.pjoin(path, "_current.json"), False)


def _gc_index_versions(path: str, new_v: int, keep_versions: int) -> None:
    """Retire index generations older than the immediately previous
    one (``keep_versions`` floor of 2 — current + previous, so a read
    planned against the old version mid-commit still completes). The
    flat pre-versioning layout counts as generation -1: its top-level
    members are deleted only once TWO retrains have superseded it."""
    keep_versions = max(2, int(keep_versions))
    for v in _list_index_versions(path):
        if v <= new_v - keep_versions:
            _fsio.delete(_fsio.pjoin(path, _ivdir(v)), True)
    if -1 <= new_v - keep_versions:
        for m in _FLAT_INDEX_MEMBERS:
            _fsio.delete(_fsio.pjoin(path, m), True)


def _claim_retrain_intent(path: str, spark=None) -> str:
    """Stamp retrain intent at the index root BEFORE the retrain reads
    the stored rows; returns the claim token. A fresh existing marker
    means another retrain is in flight → fail fast (single-writer
    contract); a marker older than ``_RETRAIN_INTENT_STALE_S`` (or an
    unparseable one — impossible via the atomic writer, so a relic) is
    a crashed retrain and is reclaimed. Best-effort mutual exclusion:
    two claims racing within one marker round-trip can both proceed
    (no compare-and-swap exists on object stores) — the contract
    remains single-writer; the marker turns the common violation into
    an actionable error instead of silent index corruption."""
    import time as _time
    import uuid as _uuid

    mpath = _fsio.pjoin(path, _RETRAIN_INTENT)
    try:
        cur = _fsio.read_json_if_exists(mpath, spark)
    except ValueError:
        cur = {}
    if cur is not None:
        age = _time.time() - float(cur.get("ts", 0))
        if age < _RETRAIN_INTENT_STALE_S:
            raise RuntimeError(
                f"another retrain is in flight on index {path!r} "
                f"(intent marker {mpath}, age {age:.0f}s): one writer "
                "at a time across retrain and append. If the previous "
                "retrain crashed, its marker is reclaimed "
                f"automatically after {_RETRAIN_INTENT_STALE_S:.0f}s, "
                "or delete the marker to reclaim now."
            )
    token = _uuid.uuid4().hex
    _fsio.write_json_atomic(
        mpath, {"token": token, "ts": _time.time()}, spark
    )
    return token


def _clear_retrain_intent(path: str, token: str, spark=None) -> None:
    """Release a retrain-intent claim (only our own: a newer claim's
    marker — the racing-writers edge — is left for its owner)."""
    mpath = _fsio.pjoin(path, _RETRAIN_INTENT)
    try:
        cur = _fsio.read_json_if_exists(mpath, spark)
    except ValueError:
        cur = {}
    if cur is None or cur.get("token") == token:
        _fsio.delete(mpath, False, spark)


def _check_no_retrain_intent(path: str, op: str, spark=None) -> None:
    """Appender-side half of the single-writer contract: fail fast
    when a retrain has stamped intent on this index (an append that
    lands mid-retrain goes into the about-to-be-superseded generation
    and silently vanishes from serving at the commit). A stale marker
    (crashed retrain) is reclaimed here so a crash never wedges
    ingest."""
    import time as _time

    mpath = _fsio.pjoin(path, _RETRAIN_INTENT)
    try:
        cur = _fsio.read_json_if_exists(mpath, spark)
    except ValueError:
        cur = {}
    if cur is None:
        return
    age = _time.time() - float(cur.get("ts", 0))
    if age < _RETRAIN_INTENT_STALE_S:
        raise RuntimeError(
            f"{op}: a retrain is in flight on index {path!r} (intent "
            f"marker {mpath}, age {age:.0f}s) — an append committed "
            "now would land in the about-to-be-superseded generation "
            "and vanish from serving at the retrain's commit. Retry "
            "after the retrain commits; a crashed retrain's marker is "
            f"reclaimed after {_RETRAIN_INTENT_STALE_S:.0f}s."
        )
    _fsio.delete(mpath, False, spark)


def _index_params_path(path: str) -> str:
    return _fsio.pjoin(path, "params.json")


def _read_index_params(path: str, spark=None) -> Optional[dict]:
    """Index manifest of the CURRENT version (generation-resolved), or
    None for a pre-manifest index (round-8 layout: plain IVF-PQ, no
    residual — the defaults). The RESOLUTION is live (the MVCC
    contract: readers resolve when they plan); the manifest itself is
    memoized — it's immutable once its generation commits, and the
    builders invalidate on in-place rebuild."""
    return _fsio.read_json_cached_if_exists(
        _index_params_path(_resolve_index_root(path, spark)), spark
    )


def _auto_num_centroids(n: int) -> int:
    """K ≈ √N — FAISS's nlist guidance: per-query work is
    nprobe·(N/K) candidate scans plus K centroid comparisons, and
    √N balances the two, so per-query cost grows as √N instead of N.
    Floor of 4 keeps tiny corpora from degenerating to a flat scan
    with extra steps; the floor itself is capped at N so K never
    exceeds the row count (K > N would mint empty stride buckets),
    and N = 0 raises an actionable error instead of minting a
    codebook no vector can be assigned to."""
    import math as _math

    if n <= 0:
        raise ValueError(
            "cannot auto-size num_centroids for an empty corpus"
        )
    return max(min(4, n), min(n, int(round(_math.sqrt(n)))))


def _auto_num_planes(n: int, target_bucket_rows: int) -> int:
    """planes ≈ log₂(N / target_bucket_rows): 2^planes buckets keep
    the EXPECTED bucket population at the target regardless of corpus
    size, so per-query candidate volume ((1+planes)·target with 1-bit
    multiprobe) stays roughly flat as the corpus grows. Capped at 24
    (16M partition directories) — past that, grow target_bucket_rows
    instead."""
    import math as _math

    if target_bucket_rows < 1:
        raise ValueError("target_bucket_rows must be >= 1")
    return max(
        1, min(24, int(_math.ceil(_math.log2(max(n, 2) / target_bucket_rows))))
    )


def ivf_write_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids=16,
    pq_m: Optional[int] = None,
    pq_ksub: int = 16,
    pq_refine_iters: int = 0,
    residual: bool = False,
    coarse_refine_iters: int = 0,
    scoring_dtype: Optional[str] = None,
):
    """Build and persist an IVF-Flat index: inverted lists as
    ``<path>/lists/_ivf_list=<i>/`` parquet partitions plus the codebook
    at ``<path>/codebook.json``. Returns the codebook.

    ``num_centroids="auto"`` sizes K ≈ √N from a count of ``df``
    (:func:`_auto_num_centroids` — FAISS's nlist guidance), making
    the 100 TB-safe configuration the default instead of a footnote:
    a fixed K means per-query candidate volume N/K grows linearly
    with the corpus, while auto-K holds it to √N. The resolved int is
    stamped in ``params.json``.

    With ``pq_m`` set, ALSO persists the IVF-PQ serving layout: every
    vector's m-int PQ code lands beside its inverted list as
    ``<path>/codes/_ivf_list=<i>/`` parquet of ``(id, codes)`` ONLY —
    no raw vectors — plus the sub-codebooks at ``<path>/pq_books.json``.
    A query then probe-prunes list directories (PartitionFilters) and
    ADC-scans an m-int column (:func:`ivf_pq_topk_indexed`); the raw
    ``lists/`` stay available for re-rank exactness recovery.

    ``residual=True`` persists FAISS-style residual codes instead: the
    coarse quantizer takes ``coarse_refine_iters`` deterministic Lloyd
    rounds (residuals only pay off against a TRAINED coarse codebook —
    :func:`ivf_pq_residual_topk`'s measured 15/50-vs-11/50 recall
    note), PQ books train on the residuals ``x - c_list``, and the
    at-rest layout is IDENTICAL — the codes column just encodes
    residuals, which :func:`ivf_pq_topk_indexed` serves via per-list
    query-residual ADC tables. A ``params.json`` manifest stamps every
    build parameter so the serving read and :func:`ivf_append_index`
    can never misread what the codes mean.

    ``scoring_dtype`` ("decimal" | "double") optionally DECLARES the
    index's production ADC scoring mode in the manifest: batch ADC
    reads (:func:`ivf_pq_topk_batch_indexed`, and through it
    :func:`index_recall_probe`'s ``scoring="adc"`` arm) resolve their
    mode as kwarg > manifest > "decimal", so an index built for
    FAISS-style float serving gets it on every read without each
    caller passing the kwarg — and gate/oracle paths that pass
    ``"decimal"`` explicitly are unaffected. The JSON artifacts are
    written through the Hadoop FS API (:mod:`tinyflux_spark.fsio`),
    so ``path`` may be on any supported scheme, like the parquet.

    One pass over the corpus per artifact (the same distributed
    bucket-min codebook build as ``ivf_centroids``, then a narrow
    assign + clustered write; the codes pass adds pq_train's bounded
    aggregations and one more clustered write). Full rebuild when the
    corpus DRIFTS (codebooks stale); for pure growth,
    :func:`ivf_append_index` folds new batches in at the frozen
    codebooks without retraining. Queries meanwhile touch only their
    probed directories.
    """
    if residual and pq_m is None:
        raise ValueError("residual=True requires pq_m")
    if scoring_dtype not in (None, "decimal", "double"):
        raise ValueError(
            f"scoring_dtype must be 'decimal' or 'double', got "
            f"{scoring_dtype!r}"
        )
    if num_centroids == "auto":
        # K ≈ √N (one count job at build time — the build already
        # scans the corpus). The resolved int is stamped in
        # params.json so appends and reads see a plain number.
        n = df.count()
        if n == 0:
            raise ValueError(
                "ivf_write_index: the corpus DataFrame is empty — "
                "an index needs at least one vector"
            )
        num_centroids = _auto_num_centroids(n)
    elif not isinstance(num_centroids, int) or num_centroids < 1:
        raise ValueError(
            "num_centroids must be a positive int or 'auto', got "
            f"{num_centroids!r}"
        )
    cents = ivf_centroids(
        df, id_col, vec_col, num_centroids, coarse_refine_iters
    )
    if not cents:
        raise ValueError(
            "ivf_write_index: the corpus DataFrame is empty — "
            "an index needs at least one vector"
        )
    assigned = df.withColumn("_ivf_list", ivf_assign(F.col(vec_col), cents))
    (
        assigned.repartition(F.col("_ivf_list"))
        .write.mode("overwrite")
        .partitionBy("_ivf_list")
        .parquet(_fsio.pjoin(path, "lists"))
    )
    _fsio.write_json_atomic(
        _fsio.pjoin(path, "codebook.json"),
        [[i, list(v)] for i, v in cents],
    )
    if pq_m is not None:
        # Train/encode from the JUST-WRITTEN lists/, not the live
        # `assigned` expression: (a) the K·N-dot-product assignment
        # runs ONCE (inside the lists write) instead of once more per
        # PQ job, and (b) the parquet scan is a plan barrier — at
        # auto-K scale the K-literal argmax expression must never be
        # inlined into the PQ distance terms (the driver-OOM class
        # _with_residual documents).
        stored = assigned.sparkSession.read.parquet(
            _fsio.pjoin(path, "lists")
        )
        if residual:
            train = _with_residual(stored, cents, vec_col)
            books = pq_train(
                train, id_col, "_res", m=pq_m, ksub=pq_ksub,
                refine_iters=pq_refine_iters,
            )
        else:
            books = pq_train(
                stored, id_col, vec_col, m=pq_m, ksub=pq_ksub,
                refine_iters=pq_refine_iters,
            )
        codes = _encode_for_index(
            stored, cents, books, id_col, vec_col, residual
        )
        (
            codes.repartition(F.col("_ivf_list"))
            .write.mode("overwrite")
            .partitionBy("_ivf_list")
            .parquet(_fsio.pjoin(path, "codes"))
        )
        _fsio.write_json_atomic(_fsio.pjoin(path, "pq_books.json"), books)
    _fsio.write_json_atomic(
        _index_params_path(path),
        {
            "kind": "ivf_index",
            "id_col": id_col,
            "vec_col": vec_col,
            "num_centroids": num_centroids,
            "pq_m": pq_m,
            "pq_ksub": pq_ksub,
            "pq_refine_iters": pq_refine_iters,
            "residual": residual,
            "coarse_refine_iters": coarse_refine_iters,
            "scoring_dtype": scoring_dtype,
        },
    )
    # an in-place rebuild over an existing path must not serve the
    # OLD memoized artifacts within this driver process
    _fsio.invalidate_cached(path)
    return cents


def ivf_append_index(
    df_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incrementally ingest a NEW batch into a persisted IVF(-PQ)
    index at its FROZEN codebooks — the reference's only ingest story
    is batched append (tinyflux database.py:623-656's
    insert_multiple), and at 100 TB a full retrain per ingest batch
    is the one cost the serving layout can't pay. Each new row is
    assigned against the frozen ``codebook.json``, (residual-)encoded
    against the frozen ``pq_books.json`` when the index carries
    codes, and appended INTO the existing ``lists/_ivf_list=<i>/``
    (and ``codes/_ivf_list=<i>/``) partition directories. The result
    is bit-identical to a full rebuild over old ∪ new at the same
    frozen codebooks (pytest-asserted), so serving reads are
    unchanged in shape: nprobe directory scans, codes-only columns.

    Crash safety is the parquet commit protocol's: appending tasks
    stage under ``_temporary/`` (invisible to readers — underscore
    prefix) and only rename in at job commit, so a killed append
    leaves the index exactly as it was. Append is not concurrent:
    one writer at a time (the reference's single-writer model).

    The codebooks NEVER move here — that is the point (queries keep
    probing the same directories) and the cost (a drifting corpus
    degrades recall; retrain with :func:`ivf_write_index` when it
    does — the same rebuild-vs-recall trade FAISS documents for
    IVF add() after train()). Returns the number of appended rows.

    ``id_col``/``vec_col`` must match the build's — validated against
    the ``params.json`` manifest (indexes written before manifests
    were stamped are refused: appending without knowing the build
    parameters could silently write codes that mean something else).
    The single-writer contract vs RETRAIN is enforced: an append
    attempted while a retrain has stamped intent on this index fails
    fast (:func:`_check_no_retrain_intent` — the rows would land in
    the about-to-be-superseded generation and vanish from serving at
    the retrain's commit); a crashed retrain's stale marker is
    reclaimed automatically.
    """
    _check_no_retrain_intent(path, "ivf_append_index")
    path = _resolve_index_root(path)
    params = _read_index_params(path)
    if params is None:
        raise ValueError(
            f"no params.json manifest at {path!r}; the index predates "
            "manifest stamping — rebuild it with ivf_write_index "
            "before appending"
        )
    if params["id_col"] != id_col or params["vec_col"] != vec_col:
        raise ValueError(
            f"index at {path!r} was built with id_col="
            f"{params['id_col']!r}, vec_col={params['vec_col']!r}; "
            f"append asked for {id_col!r}/{vec_col!r}"
        )
    cents = ivf_read_codebook(path)
    assigned = df_new.withColumn(
        "_ivf_list", ivf_assign(F.col(vec_col), cents)
    )
    # The count, the lists/ write, and (with codes) the encode+write
    # are three jobs over the same batch — without this persist each
    # would recompute the K-dot-product assignment over df_new.
    assigned.persist()
    try:
        n = assigned.count()
        (
            assigned.repartition(F.col("_ivf_list"))
            .write.mode("append")
            .partitionBy("_ivf_list")
            .parquet(_fsio.pjoin(path, "lists"))
        )
        if params.get("pq_m") is not None:
            books = _fsio.read_json_cached(_fsio.pjoin(path, "pq_books.json"))
            codes = _encode_for_index(
                assigned, cents, books, id_col, vec_col,
                bool(params.get("residual")),
            )
            (
                codes.repartition(F.col("_ivf_list"))
                .write.mode("append")
                .partitionBy("_ivf_list")
                .parquet(_fsio.pjoin(path, "codes"))
            )
    finally:
        assigned.unpersist()
    return n


def ivf_retrain_index(
    spark,
    path: str,
    num_centroids="auto",
    pq_refine_iters: Optional[int] = None,
    coarse_refine_iters: Optional[int] = None,
    keep_versions: int = 2,
) -> dict:
    """Rebuild a persisted IVF(-PQ) index at FRESH codebooks from its
    OWN stored rows and atomically repoint serving reads — the
    remediation :func:`index_recall_probe`'s drift alert demands, in
    one call. This is the engine's ``reindex()`` (the reference
    rebuilds its whole index from storage in one call — tinyflux
    database.py:687-705, rebuild index.py:172-206); here the index is
    the ANN serving layout and the rebuild must not interrupt
    serving, so the retrain is STAGED: the new generation is built
    under ``<path>/index_v<N+1>/`` (a complete ``ivf_write_index``
    layout — invisible to readers, whose generation scan only sees
    COMMITTED generations), then commits by CREATING the generation's
    ``_SUCCESS`` marker (:func:`_flip_index_pointer`) — existence-
    gated, rename-free, so the protocol holds on object stores too.
    A reader that resolved the old version mid-swap still completes —
    the superseded generation survives one further retrain
    (``keep_versions``, floor 2, the ``storages.py`` MVCC
    convention); a crash anywhere before the marker leaves the old
    index fully intact and the next retrain overwrites the orphaned
    staging dir.

    The training input is the index's own ``lists/`` (raw vectors
    stored beside the codes — append included), so retrained ≡ a
    fresh :func:`ivf_write_index` over the same rows at the new
    codebooks EXACTLY (the codebook/PQ training is order-independent
    by construction; the q135 gate replays the full-corpus build in
    SQL against the retrained serving read). ``num_centroids``
    defaults to ``"auto"``: the usual drift remediation is resizing
    K ≈ √N to the GROWN corpus, which a frozen-codebook append can
    never do. Code shape (``pq_m``/``pq_ksub``/``residual``) and
    column names come from the manifest — changing what the codes
    MEAN is a new index, not a retrain; the refine-iteration knobs
    may be overridden (``None`` keeps the manifest's).

    One writer at a time across retrain AND append (the index
    family's standing single-writer contract) — ENFORCED via the
    ``_retrain_intent.json`` marker: the retrain stamps intent before
    it reads ``lists/`` (:func:`_claim_retrain_intent` — a concurrent
    retrain fails fast), appends check it and fail fast
    (:func:`_check_no_retrain_intent`), and a crashed retrain's stale
    marker is age-reclaimed rather than wedging ingest. Cost: one
    full pass over the stored corpus (the same jobs as
    ``ivf_write_index``), paid OFF the serving path. Returns
    ``{"version", "root", "num_centroids", "pq_m"}``.
    """
    cur = _resolve_index_root(path)
    params = _read_index_params(cur)
    if params is None:
        raise ValueError(
            f"no params.json manifest at {path!r}; the index predates "
            "manifest stamping — rebuild it with ivf_write_index"
        )
    id_col, vec_col = params["id_col"], params["vec_col"]
    token = _claim_retrain_intent(path)
    try:
        cur_v = _read_index_version(path)
        new_v = 0 if cur_v is None else cur_v + 1
        new_dir = _fsio.pjoin(path, _ivdir(new_v))
        # an earlier retrain crashed mid-build: the dir is
        # uncommitted by construction (it carries no _SUCCESS marker)
        _fsio.delete(new_dir, True)
        stored = spark.read.parquet(_fsio.pjoin(cur, "lists")).drop(
            "_ivf_list"
        )
        ivf_write_index(
            stored,
            new_dir,
            id_col=id_col,
            vec_col=vec_col,
            num_centroids=num_centroids,
            pq_m=params.get("pq_m"),
            pq_ksub=params.get("pq_ksub", 16),
            pq_refine_iters=(
                params.get("pq_refine_iters", 0)
                if pq_refine_iters is None
                else pq_refine_iters
            ),
            residual=bool(params.get("residual")),
            coarse_refine_iters=(
                params.get("coarse_refine_iters", 0)
                if coarse_refine_iters is None
                else coarse_refine_iters
            ),
            scoring_dtype=params.get("scoring_dtype"),
        )
        _flip_index_pointer(path, new_v)
        _gc_index_versions(path, new_v, keep_versions)
    finally:
        # released on success AND on a clean failure (an exception
        # raised here is not a crash: nothing is mid-write, the old
        # generation still serves) — only a hard crash leaves the
        # marker, and age-reclaim handles that.
        _clear_retrain_intent(path, token)
    new_params = _read_index_params(new_dir)
    return {
        "version": new_v,
        "root": new_dir,
        "num_centroids": new_params["num_centroids"],
        "pq_m": new_params.get("pq_m"),
    }


def ivf_read_codebook(path: str):
    path = _resolve_index_root(path)
    return [
        (int(i), [float(x) for x in v])
        for i, v in _fsio.read_json_cached(_fsio.pjoin(path, "codebook.json"))
    ]


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a persisted IVF index: rank the codebook
    driver-side, scan only the ``nprobe`` probed list directories
    (partition pruning — never a full-corpus scan), brute-force the
    survivors. Identical results to ``ivf_topk`` with the same
    codebook."""
    path = _resolve_index_root(path, spark)
    cents = ivf_read_codebook(path)
    probes = _ivf_probes(cents, query_vec, nprobe)
    lists = spark.read.parquet(_fsio.pjoin(path, "lists"))
    cand = lists.where(F.col("_ivf_list").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_topk_batch_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Batch ANN against a PERSISTED IVF index — :func:`ivf_topk_batch`
    without its per-run codebook build + full-corpus assignment scan:
    the kNN-graph / hard-negative-mining read a serving corpus
    actually runs. Results are identical to ``ivf_topk_batch`` built
    with the same parameters (pytest-asserted), and to issuing
    :func:`ivf_topk_indexed` once per query row.

    Plan shape: probe lists are ranked ENGINE-side per query from the
    persisted codebook literals (no scan), the UNION of probed list
    ids — bounded by the codebook size, the one driver round-trip —
    prunes the ``lists/`` read to those partition directories
    (PartitionFilters, plan-asserted), the exploded query batch
    BROADCASTS onto the pruned scan (the corpus side never shuffles),
    and the per-query top-k is a rank window whose filter compiles to
    WindowGroupLimit — at most k candidates per query leave each map
    task. At 100 TB this reads ~|union probes|/K of the corpus once,
    regardless of |queries|.
    """
    if k <= 0:
        raise ValueError("ivf_topk_batch_indexed: k must be positive")
    if nprobe <= 0:
        raise ValueError("ivf_topk_batch_indexed: nprobe must be positive")
    path = _resolve_index_root(path, spark)
    qid = query_id_col or id_col
    qvc = query_vec_col or vec_col
    cents = ivf_read_codebook(path)
    q_exp = _batch_query_probes(queries, cents, qid, qvc, nprobe)
    # K-bounded driver round-trip (<= num_centroids ids): the literal
    # IN list is what becomes directory-level PartitionFilters.
    probe_ids = sorted(
        r[0] for r in q_exp.select("_ivf_list").distinct().collect()
    )
    lists = (
        spark.read.parquet(_fsio.pjoin(path, "lists"))
        .where(F.col("_ivf_list").isin(probe_ids))
        .withColumn("_nrm", _norm(F.col(vec_col)))
    )
    return _batch_topk_over_candidates(
        lists, q_exp, k, id_col, vec_col, exclude_self
    )


def ivf_pq_topk_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a persisted IVF-PQ index (``ivf_write_index``
    with ``pq_m``) — the 100 TB vector-serving read path made
    concrete: rank the coarse codebook driver-side, scan ONLY the
    ``nprobe`` probed ``codes/_ivf_list=<i>/`` directories (partition
    pruning — PartitionFilters, asserted in tests/test_plans.py) and
    ONLY their ``(id, codes)`` columns (column pruning: no raw vector
    is ever read), and rank by the exact-decimal ADC sum. Identical
    results to :func:`ivf_pq_topk` built with the same parameters.

    ``rerank=c`` re-scores the ADC top-c against the raw ``lists/``
    partitions of the SAME probed directories (partition-pruned AND
    id-filtered — a c-row read) and returns exact-cosine top-k,
    :func:`pq_adc_topk`'s exactness-recovery contract.

    On a ``residual=True`` index (read from the ``params.json``
    manifest) the codes encode coarse residuals, so the read builds
    one ADC table per probed list from that list's QUERY residual
    (:func:`_residual_adc_col` — :func:`ivf_pq_residual_topk`'s exact
    math over the same at-rest layout); the plan shape is unchanged:
    PartitionFilters + codes-only ReadSchema.
    """
    path = _resolve_index_root(path, spark)
    cents = ivf_read_codebook(path)
    books = _fsio.read_json_cached(_fsio.pjoin(path, "pq_books.json"))
    params = _read_index_params(path) or {}
    probes = _ivf_probes(cents, query_vec, nprobe)
    codes = spark.read.parquet(_fsio.pjoin(path, "codes")).where(
        F.col("_ivf_list").isin(probes)
    )
    if params.get("residual"):
        adc = _residual_adc_col(cents, probes, books, query_vec)
        ranked = (
            codes.select(
                F.col("id"), adc.cast("double").alias("adc_dist")
            )
            .orderBy("adc_dist", "id")
            .limit(rerank if rerank else k)
        )
        if not rerank:
            return ranked
        if rerank < k:
            raise ValueError("rerank must be >= k")
        cand_ids = [r["id"] for r in ranked.select("id").collect()]
        lists = spark.read.parquet(_fsio.pjoin(path, "lists")).where(
            F.col("_ivf_list").isin(probes)
            & F.col(id_col).isin(cand_ids)
        )
        return cosine_topk(lists, query_vec, k, id_col, vec_col)
    if not rerank:
        return pq_adc_topk(codes, books, query_vec, k)
    lists = spark.read.parquet(_fsio.pjoin(path, "lists")).where(
        F.col("_ivf_list").isin(probes)
    )
    return pq_adc_topk(
        codes, books, query_vec, k,
        rerank=rerank, raw_df=lists,
        raw_id_col=id_col, raw_vec_col=vec_col,
    )


def ivf_pq_topk_batch_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    nprobe: int = 4,
    exclude_self: bool = True,
    scoring_dtype: Optional[str] = None,
) -> DataFrame:
    """Batch ADC against a persisted IVF-PQ index —
    :func:`ivf_pq_topk_indexed` for a query SET in one plan, i.e. the
    kNN-graph / hard-negative-mining read where the corpus side is
    codes-only: the ``codes/`` scan is pruned to the union of the
    queries' probed list directories (PartitionFilters) and reads
    ONLY the (id, codes) columns — the raw vectors never leave
    storage even though thousands of queries are served. Returns
    ``(query_id, <id_col>, adc_dist, rank)``, per-query ascending ADC
    with id ties, rank <= k. With ``exclude_self=False`` results
    equal issuing :func:`ivf_pq_topk_indexed` once per query row
    (pytest-asserted; the q134 oracle replays probe + encode +
    decimal ADC per query in SQL) — the per-query read has no
    self-exclusion, so the default ``exclude_self=True`` matches it
    only for query sets disjoint from the corpus.

    Plan shape: probe lists rank ENGINE-side per query from the
    codebook literals (:func:`_batch_query_probes`), the per-query
    m × ksub ADC lookup tables are ALSO built engine-side from the
    query vector (the same sequential (x−y)² left fold as
    :func:`pq_adc_topk`'s driver-side tables, each entry cast to
    DECIMAL(20,12) in the engine so the m-term per-row sum stays
    exact and order-independent), and the (query, list, tables) rows
    broadcast onto the pruned codes scan — per code row the ADC is m
    array lookups + m decimal adds, and the per-query top-k compiles
    to a rank window (WindowGroupLimit). On a ``residual=True`` index
    the table build subtracts the probed list's centroid from the
    query first (``zip_with`` — the query-residual of
    :func:`ivf_pq_residual_topk`) and everything downstream is
    unchanged: the broadcast row already carries its list id.

    Scoring law is q126's with the 32× smaller operand: per-query
    cost ∝ |probed codes| = nprobe·N/K m-byte rows — grow K with the
    corpus (``num_centroids="auto"``) to hold it.

    ``scoring_dtype="double"`` is the PRODUCTION mode
    (:func:`pq_adc_topk`'s contract: FAISS scores ADC in float):
    the per-row m-term sum runs in IEEE double instead of
    DECIMAL(20,12) — roughly an order of magnitude cheaper per code
    row and a much smaller codegen tree — trading the order-
    independent-sum exactness the default "decimal" mode keeps for
    oracle parity. Top-k ids match the decimal mode except on
    double-rounding ties (pytest-asserted at the fixture).

    ``scoring_dtype=None`` (default) defers to the index MANIFEST: an
    index built with ``ivf_write_index(..., scoring_dtype="double")``
    declares its production mode once and every read picks it up;
    precedence is kwarg > manifest > "decimal" (pytest-asserted), so
    gate paths passing "decimal" explicitly are unaffected by any
    manifest.
    """
    if k <= 0:
        raise ValueError("ivf_pq_topk_batch_indexed: k must be positive")
    if nprobe <= 0:
        raise ValueError(
            "ivf_pq_topk_batch_indexed: nprobe must be positive"
        )
    from pyspark.sql import Window

    path = _resolve_index_root(path, spark)
    qid = query_id_col or id_col
    qvc = query_vec_col or vec_col
    cents = ivf_read_codebook(path)
    books = _fsio.read_json_cached(_fsio.pjoin(path, "pq_books.json"))
    params = _read_index_params(path) or {}
    if scoring_dtype is None:
        scoring_dtype = params.get("scoring_dtype") or "decimal"
    if scoring_dtype not in ("decimal", "double"):
        raise ValueError(
            f"scoring_dtype must be 'decimal' or 'double', got "
            f"{scoring_dtype!r}"
        )
    m, sub, ksub = books["m"], books["sub"], books["ksub"]
    q_exp = _batch_query_probes(queries, cents, qid, qvc, nprobe)
    if params.get("residual"):
        # query-residual per probed (query, list) row: q − c_list.
        # The centroid comes from a broadcast JOIN on the row's own
        # _ivf_list, NOT from element_at over a K x dim literal
        # array: qbase is inlined into every one of the m x ksub
        # table-entry terms below, and at auto-K (K ≈ √N = 2449 at
        # the 100x corpus) a literal-array qbase explodes to ~10^8
        # expression nodes — the driver OOMs planning the read
        # (measured, r11; _with_residual's corpus-side lesson,
        # query-side).
        spark_q = queries.sparkSession
        cdf = spark_q.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in cents],
            "_ivf_list int, _qcvec array<double>",
        )
        q_exp = q_exp.join(F.broadcast(cdf), "_ivf_list")
        qbase = F.zip_with(
            F.col("_qvec"),
            F.col("_qcvec"),
            lambda x, c: x.cast("double") - c,
        )
    else:
        qbase = F.transform(F.col("_qvec"), lambda x: x.cast("double"))

    # The per-query m x ksub table as ONE nested-HOF expression over a
    # single books literal, with the query base projected as a real
    # column first. The unrolled form this replaces inlined the qbase
    # subtree into every one of the m*ksub*sub terms — a ~330 KB
    # single-line projection the optimizer re-walked on every save
    # (~1.1 s driver time before the first job at sf0.1, measured
    # r12). The fold is bit-identical: aggregate's 0.0D seed + t0 +
    # t1 ... equals the bare t0 + t1 ... left fold for t >= 0.0
    # (t = d*d), and each d = x - y pairs the same slice element with
    # the same codeword double as the element_at form did.
    books_sql = "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(
                f"{float(x)!r}D" for x in books["books"][s][c]
            ) + ")"
            for c in range(ksub)
        ) + ")"
        for s in range(m)
    ) + ")"
    entry = (
        f"aggregate(zip_with(slice(_qb, s * {sub} + 1, {sub}), bc, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
    )
    if scoring_dtype == "decimal":
        entry = f"CAST({entry} AS DECIMAL(20,12))"
    tables = F.expr(
        f"transform({books_sql}, (bsub, s) -> "
        f"transform(bsub, bc -> {entry}))"
    )
    bq = F.broadcast(
        q_exp.select(
            "_qid", "_ivf_list", qbase.alias("_qb")
        ).select("_qid", "_ivf_list", tables.alias("_tbl"))
    )
    # K-bounded driver round-trip — the literal IN list becomes the
    # directory-level PartitionFilters on the codes scan.
    probe_ids = sorted(
        r[0] for r in q_exp.select("_ivf_list").distinct().collect()
    )
    codes = spark.read.parquet(_fsio.pjoin(path, "codes")).where(
        F.col("_ivf_list").isin(probe_ids)
    )
    joined = codes.join(bq, "_ivf_list")
    if exclude_self:
        joined = joined.where(F.col("id") != F.col("_qid"))
    adc = None
    for s in range(m):
        term = F.element_at(
            F.element_at(F.col("_tbl"), s + 1),
            (F.element_at(F.col("codes"), s + 1) + F.lit(1)).cast(
                "int"
            ),
        )
        adc = term if adc is None else adc + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col)
    )
    return (
        joined.select(
            F.col("_qid").alias("query_id"),
            F.col("id").alias(id_col),
            adc.cast("double").alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def srp_write_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes=8,
    seed: int = 42,
    target_bucket_rows: int = 1024,
):
    """Persist the SRP-LSH bucketed corpus: ``_bucket=<b>/`` parquet
    partitions plus the (dim, planes, seed) recipe at
    ``<path>/planes.json`` — the hyperplanes are seed-derived, so the
    recipe, not the matrix, is the durable artifact.

    ``num_planes="auto"`` sizes planes ≈ log₂(N / target_bucket_rows)
    from a count of ``df`` (:func:`_auto_num_planes`): more planes =
    smaller buckets, so auto-sizing holds the expected bucket
    population — and with it per-query candidate volume — roughly
    flat as the corpus grows, where a fixed plane count lets buckets
    grow linearly. The resolved int lands in ``planes.json``."""
    if num_planes == "auto":
        n = df.count()
        if n == 0:
            raise ValueError(
                "srp_write_index: the corpus DataFrame is empty — "
                "an index needs at least one vector"
            )
        num_planes = _auto_num_planes(n, target_bucket_rows)
    elif not isinstance(num_planes, int) or num_planes < 1:
        raise ValueError(
            "num_planes must be a positive int or 'auto', got "
            f"{num_planes!r}"
        )
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError(
            "srp_write_index: the corpus DataFrame is empty — "
            "an index needs at least one vector"
        )
    dim = len(first[0])
    planes = srp_planes(dim, num_planes, seed)
    bucketed = df.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
    (
        bucketed.repartition(F.col("_bucket"))
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(_fsio.pjoin(path, "buckets"))
    )
    _fsio.write_json_atomic(
        _fsio.pjoin(path, "planes.json"),
        {
            "dim": dim,
            "num_planes": num_planes,
            "seed": seed,
            # build-parameter stamp: srp_append_index refuses to
            # append without knowing what the bucketed rows mean
            "id_col": id_col,
            "vec_col": vec_col,
        },
    )
    # an in-place rebuild over an existing path must not serve the
    # OLD memoized recipe within this driver process
    _fsio.invalidate_cached(path)


def srp_append_index(
    df_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incrementally ingest a NEW batch into a persisted SRP index at
    its FROZEN hyperplanes — :func:`ivf_append_index`'s sibling, and
    the simpler half of the lifecycle: the bucket of a vector is a
    pure function of the seed-derived planes, so append ≡ rebuild is
    EXACT with no drift caveat at all (an IVF codebook is trained on
    a corpus and degrades as it drifts; SRP planes are corpus-blind).
    The reference's ingest story is batched append keeping the index
    current (tinyflux database.py:623-656); here each new row lands
    in its ``buckets/_bucket=<b>/`` partition directory and every
    serving read (:func:`srp_topk_indexed`,
    :func:`srp_topk_batch_indexed`) sees it immediately.

    Crash safety is the parquet commit protocol's (staged under
    ``_temporary/``, renamed in atomically at job commit); one writer
    at a time. ``id_col``/``vec_col`` must match the build's —
    validated against the ``planes.json`` stamp (indexes written
    before stamping are refused: rebuild with
    :func:`srp_write_index`). Returns the number of appended rows.
    An append attempted while a retrain has stamped intent fails fast
    (:func:`_check_no_retrain_intent` — the single-writer contract,
    enforced); a crashed retrain's stale marker is reclaimed.
    """
    _check_no_retrain_intent(path, "srp_append_index")
    path = _resolve_index_root(path)
    rec = _fsio.read_json_cached(_fsio.pjoin(path, "planes.json"))
    if "id_col" not in rec:
        raise ValueError(
            f"planes.json at {path!r} predates build-parameter "
            "stamping; rebuild the index with srp_write_index before "
            "appending"
        )
    if rec["id_col"] != id_col or rec["vec_col"] != vec_col:
        raise ValueError(
            f"index at {path!r} was built with id_col="
            f"{rec['id_col']!r}, vec_col={rec['vec_col']!r}; "
            f"append asked for {id_col!r}/{vec_col!r}"
        )
    planes = srp_planes(rec["dim"], rec["num_planes"], rec["seed"])
    bucketed = df_new.withColumn(
        "_bucket", srp_bucket(F.col(vec_col), planes)
    )
    # count + write are two jobs over the same batch: persist so the
    # plane projections run once (ivf_append_index's pattern).
    bucketed.persist()
    try:
        n = bucketed.count()
        (
            bucketed.repartition(F.col("_bucket"))
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(_fsio.pjoin(path, "buckets"))
        )
    finally:
        bucketed.unpersist()
    return n


def srp_retrain_index(
    spark,
    path: str,
    num_planes="auto",
    seed: Optional[int] = None,
    target_bucket_rows: int = 1024,
    keep_versions: int = 2,
) -> dict:
    """Rebuild a persisted SRP index at a FRESH hyperplane recipe
    from its own stored rows — :func:`ivf_retrain_index`'s sibling
    for the hyperplane family, with the same staged-generation +
    marker-commit protocol (``<path>/index_v<N>/``, committed by
    creating its ``_SUCCESS`` marker — rename-free, object-store
    safe; a crash before the marker leaves the old index intact, a
    reader resolved mid-swap still completes, the superseded
    generation survives one further retrain) and the same enforced
    single-writer contract (retrain-intent marker: concurrent
    retrains and appends fail fast, crashed retrains age-reclaim).

    SRP planes are corpus-blind, so the reason to retrain is
    STRUCTURAL, not drift: ``num_planes="auto"`` re-sizes the bucket
    count (planes ≈ log₂(N/target)) to the GROWN corpus so expected
    bucket population — and with it per-query candidate volume —
    returns to the target that appends at frozen planes let grow
    linearly. ``seed=None`` keeps the current recipe's seed.
    Training input is the index's own ``buckets/`` raw vectors, so
    retrained ≡ a fresh :func:`srp_write_index` over the same rows
    at the new recipe exactly. One writer at a time across retrain
    and append. Returns ``{"version", "root", "num_planes",
    "seed"}``."""
    cur = _resolve_index_root(path)
    rec = _fsio.read_json_cached(_fsio.pjoin(cur, "planes.json"))
    if "id_col" not in rec:
        raise ValueError(
            f"planes.json at {path!r} predates build-parameter "
            "stamping; rebuild the index with srp_write_index"
        )
    token = _claim_retrain_intent(path)
    try:
        cur_v = _read_index_version(path)
        new_v = 0 if cur_v is None else cur_v + 1
        new_dir = _fsio.pjoin(path, _ivdir(new_v))
        _fsio.delete(new_dir, True)
        stored = spark.read.parquet(_fsio.pjoin(cur, "buckets")).drop(
            "_bucket"
        )
        srp_write_index(
            stored,
            new_dir,
            id_col=rec["id_col"],
            vec_col=rec["vec_col"],
            num_planes=num_planes,
            seed=rec["seed"] if seed is None else int(seed),
            target_bucket_rows=target_bucket_rows,
        )
        _flip_index_pointer(path, new_v)
        _gc_index_versions(path, new_v, keep_versions)
    finally:
        _clear_retrain_intent(path, token)
    new_rec = _fsio.read_json_cached(_fsio.pjoin(new_dir, "planes.json"))
    return {
        "version": new_v,
        "root": new_dir,
        "num_planes": new_rec["num_planes"],
        "seed": new_rec["seed"],
    }


def srp_topk_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Top-k against a persisted SRP index: compute the query bucket +
    1-bit multiprobe neighborhood driver-side, scan only those bucket
    directories. Identical results to ``srp_lsh_topk`` with the same
    recipe."""
    path = _resolve_index_root(path, spark)
    rec = _fsio.read_json_cached(_fsio.pjoin(path, "planes.json"))
    planes = srp_planes(rec["dim"], rec["num_planes"], rec["seed"])
    qv = [float(x) for x in query_vec]
    qbucket = 0
    for i, plane in enumerate(planes):
        if _seq_dot(qv, plane) >= 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if multiprobe >= 1:
        for i in range(rec["num_planes"]):
            probes.add(qbucket ^ (1 << i))
    buckets = spark.read.parquet(_fsio.pjoin(path, "buckets"))
    cand = buckets.where(F.col("_bucket").isin(list(probes)))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def srp_topk_batch_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    multiprobe: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """Batch ANN against a PERSISTED SRP index —
    :func:`ivf_topk_batch_indexed`'s sibling for the hyperplane
    family: top-k corpus neighbors for every query row in one plan,
    served from ``srp_write_index``'s bucket partition directories.
    Results equal issuing :func:`srp_topk_indexed` once per query.

    Each query's bucket and its ``multiprobe``-bit neighborhood are
    computed ENGINE-side from the seed-derived plane literals (no
    scan, no driver math per query); the union of probed bucket ids —
    bounded by 2^planes, the one driver round-trip — prunes the
    ``buckets/`` read to those partition directories
    (PartitionFilters), the exploded query batch broadcasts onto it,
    and the per-query top-k compiles to WindowGroupLimit. Scoring
    work is |queries| x |probed buckets' rows| — hold per-query cost
    by growing ``num_planes`` with the corpus (the q126 lesson,
    SRP-flavored: more planes = smaller buckets).
    """
    if k <= 0:
        raise ValueError("srp_topk_batch_indexed: k must be positive")
    if multiprobe not in (0, 1):
        raise ValueError(
            "srp_topk_batch_indexed: multiprobe must be 0 or 1"
        )
    path = _resolve_index_root(path, spark)
    qid = query_id_col or id_col
    qvc = query_vec_col or vec_col
    rec = _fsio.read_json_cached(_fsio.pjoin(path, "planes.json"))
    planes = srp_planes(rec["dim"], rec["num_planes"], rec["seed"])
    qb = srp_bucket(F.col(qvc), planes)
    probe_cols = [qb]
    if multiprobe >= 1:
        probe_cols += [
            qb.bitwiseXOR(F.lit(1 << i))
            for i in range(rec["num_planes"])
        ]
    q_exp = queries.select(
        F.col(qid).alias("_qid"),
        F.col(qvc).alias("_qvec"),
        _norm(F.col(qvc)).alias("_qnrm"),
        F.explode(F.array(*probe_cols)).alias("_bucket"),
    )
    probe_ids = sorted(
        r[0] for r in q_exp.select("_bucket").distinct().collect()
    )
    buckets = (
        spark.read.parquet(_fsio.pjoin(path, "buckets"))
        .where(F.col("_bucket").isin(probe_ids))
        .withColumn("_nrm", _norm(F.col(vec_col)))
    )
    return _batch_topk_over_candidates(
        buckets, q_exp, k, id_col, vec_col, exclude_self, key="_bucket"
    )


def _probe_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample_n: int
) -> DataFrame:
    """Deterministic N-row query sample from an index's own stored
    vectors: ordered by ``md5(id)`` (an unbiased, run-stable shuffle —
    id ties impossible, ids are unique), materialized as a
    TakeOrderedAndProject (never a full sort). The sample size is
    FIXED as the corpus grows — the probe's whole contract."""
    if sample_n < 1:
        raise ValueError("sample_n must be >= 1")
    return (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(int(sample_n))
    )


def index_recall_probe(
    spark,
    path: str,
    queries: Optional[DataFrame] = None,
    k: int = 10,
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    nprobe: int = 4,
    multiprobe: int = 1,
    exclude_self: bool = True,
    scoring: str = "exact",
    scoring_dtype: Optional[str] = None,
    sample_n: Optional[int] = None,
) -> DataFrame:
    """Sampled recall@k of a PERSISTED index (IVF, IVF-PQ, residual,
    or SRP — detected from the on-disk layout) against the exact
    cosine top-k over the same corpus: the number that turns
    "retrain when the corpus drifts" from a docstring rule into an
    alertable measurement (SCALE_r9 measured residual-index recall
    collapsing 0.9 → 0.4 under drift; this probe is how an operator
    notices BEFORE queries degrade).

    Returns one row per query: ``(query_id, hits, n_exact, recall)``
    where ``hits`` counts the indexed read's top-k ids that appear in
    the exact top-k, ``n_exact = min(k, corpus_size - self)`` is the
    denominator, and ``recall = hits / n_exact``. Aggregate with
    ``avg(recall)`` and alert on a drop.

    Both rankings run over the index's OWN stored vectors (``lists/``
    / ``buckets/`` hold the raw vectors), so the probe needs no
    access to the original build input — point it at the index and a
    query sample. The approximate side is the real serving read
    (:func:`ivf_topk_batch_indexed` / :func:`srp_topk_batch_indexed`:
    PartitionFilters-pruned scan, broadcast query batch,
    WindowGroupLimit), so what's measured is exactly what production
    queries get — with ``scoring="exact"`` (default) a PQ-carrying
    index is read through its raw ``lists/`` (the candidate/pruning
    recall of the frozen coarse codebook — the drift-sensitive part);
    ``scoring="adc"`` instead ranks candidates by the codes-only ADC
    read (:func:`ivf_pq_topk_batch_indexed`), measuring the FULL
    approximation stack the cheapest serving path ships — the honest
    SCALE_r9 finding (ADC-only recall is coarse at small corpora,
    rerank recovers) as a per-index number. ``scoring_dtype`` passes
    through to the ADC read, so the probe measures whichever mode
    production actually serves ("double" — the cheap FAISS-style
    float scoring — or the gate-exact "decimal" default).
    The exact side is a brute-force scan scored per query with the
    same rounded-cosine ranking — per-query cost is |corpus|, which
    is the point of SAMPLING the queries: probe tens of queries, not
    the corpus. ``sample_n=N`` (instead of a ``queries`` DataFrame)
    makes that one call: the probe picks N of the index's OWN stored
    vectors deterministically — ordered by ``md5(id)``, an unbiased
    shuffle that is the same N ids on every run — so the alert loop
    needs nothing but the index path, and the sample STAYS N rows as
    the corpus grows (the r10 scale harness scaled it with the
    corpus and manufactured a |queries|·|corpus| blow-up the
    operator's contract forbids).
    """
    if k <= 0:
        raise ValueError("index_recall_probe: k must be positive")
    if scoring not in ("exact", "adc"):
        raise ValueError(
            f"scoring must be 'exact' or 'adc', got {scoring!r}"
        )
    path = _resolve_index_root(path, spark)
    if (queries is None) == (sample_n is None):
        raise ValueError(
            "index_recall_probe: pass EITHER a queries DataFrame OR "
            "sample_n (a deterministic sample from the index itself)"
        )
    if sample_n is not None and (query_id_col or query_vec_col):
        # the sample IS the index's own (id_col, vec_col) rows —
        # caller-supplied query column names have nothing to name and
        # were previously ignored silently (ADVICE r11)
        raise ValueError(
            "index_recall_probe: query_id_col/query_vec_col apply to "
            "a caller-supplied queries DataFrame; with sample_n the "
            "queries are the index's own rows under its manifest "
            "columns"
        )
    if _fsio.exists(_fsio.pjoin(path, "planes.json"), spark):
        if scoring == "adc":
            raise ValueError(
                "scoring='adc' applies to IVF-PQ indexes; SRP "
                "indexes hold raw vectors only"
            )
        rec = _fsio.read_json_cached(_fsio.pjoin(path, "planes.json"), spark)
        id_col = rec.get("id_col", "vec_id")
        vec_col = rec.get("vec_col", "embedding")
        qid = query_id_col or id_col
        qvc = query_vec_col or vec_col
        corpus = spark.read.parquet(_fsio.pjoin(path, "buckets"))
        if sample_n is not None:
            queries = _probe_sample(corpus, id_col, vec_col, sample_n)
            qid, qvc = id_col, vec_col
        approx = srp_topk_batch_indexed(
            spark, path, queries, k, id_col, vec_col,
            qid, qvc, multiprobe, exclude_self,
        )
    elif _fsio.exists(_fsio.pjoin(path, "codebook.json"), spark):
        params = _read_index_params(path) or {}
        id_col = params.get("id_col", "vec_id")
        vec_col = params.get("vec_col", "embedding")
        qid = query_id_col or id_col
        qvc = query_vec_col or vec_col
        corpus = spark.read.parquet(_fsio.pjoin(path, "lists"))
        if sample_n is not None:
            queries = _probe_sample(corpus, id_col, vec_col, sample_n)
            qid, qvc = id_col, vec_col
        if scoring == "adc":
            if not _fsio.exists(
                _fsio.pjoin(path, "pq_books.json"), spark
            ):
                raise ValueError(
                    "scoring='adc' needs an IVF-PQ index (no "
                    f"pq_books.json at {path!r})"
                )
            approx = ivf_pq_topk_batch_indexed(
                spark, path, queries, k, id_col, vec_col,
                qid, qvc, nprobe, exclude_self,
                scoring_dtype=scoring_dtype,
            )
        else:
            approx = ivf_topk_batch_indexed(
                spark, path, queries, k, id_col, vec_col,
                qid, qvc, nprobe, exclude_self,
            )
    else:
        raise ValueError(
            f"no planes.json or codebook.json at {path!r}: not a "
            "persisted SRP/IVF index"
        )
    # Exact ground truth: the same broadcast-queries + WindowGroupLimit
    # plan as the serving read, with the partition pruning disabled via
    # a constant join key — every query scores the whole stored corpus.
    q_exp = queries.select(
        F.col(qid).alias("_qid"),
        F.col(qvc).alias("_qvec"),
        _norm(F.col(qvc)).alias("_qnrm"),
        F.lit(0).alias("_all"),
    )
    exact = _batch_topk_over_candidates(
        corpus.withColumn("_nrm", _norm(F.col(vec_col)))
        .withColumn("_all", F.lit(0)),
        q_exp, k, id_col, vec_col, exclude_self, key="_all",
    )
    hits = (
        approx.select("query_id", id_col)
        .join(exact.select("query_id", id_col), ["query_id", id_col])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            "n_exact",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0))
                / F.col("n_exact"),
                6,
            ).alias("recall"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Scalar (symmetric max-abs) int quantization of an embedding
    column — the serving/storage compression step for a 100 TB vector
    table (4 bytes → 1 byte per dimension at bits=8, decoded as
    x ≈ q * scale / qmax).

    Returns ``(id, scale, q: array<int>, n_clipped)`` where scale is
    the vector's max |x|, q_i = round(x_i / scale * qmax) in
    [-qmax, qmax], and n_clipped counts saturated dimensions (|q| ==
    qmax — with max-abs scaling only the argmax dimensions saturate).
    An all-zero vector quantizes to scale 0 and all-zero q.

    Physical shape: scale is one in-row higher-order pass, then the
    vector explodes to (id, pos, x) rows where the quantization math is
    whole-stage codegen, and one groupBy(id) reassembles the array in
    position order. A fully-narrow all-HOF formulation (quantize +
    clip-count as nested lambdas) avoids that single exchange but runs
    every element interpreted — measured 6× slower on the embeddings
    table; the exchange moves |dims|·rows of ints with map-side
    partial aggregation and wins at every scale tested.
    """
    qmax = (1 << (bits - 1)) - 1
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pre = df.select(
        F.col(id_col).alias("id"),
        F.array_max(F.transform(e, F.abs)).alias("scale"),
        e.alias("_e"),
    )
    ex = pre.select("id", "scale", F.posexplode("_e").alias("pos", "x"))
    qi = (
        F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(F.round(F.col("x") / F.col("scale") * qmax, 0).cast("int"))
    )
    g = (
        ex.select("id", "scale", "pos", qi.alias("qi"))
        .groupBy("id", "scale")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "qi"))).alias("qs"),
            F.sum(F.when(F.abs(F.col("qi")) == qmax, 1).otherwise(0))
            .cast("int")
            .alias("n_clipped"),
        )
    )
    return g.select(
        "id",
        "scale",
        F.transform("qs", lambda s: s["qi"]).alias("q"),
        "n_clipped",
    )


def semantic_assign(
    df: DataFrame,
    cents,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The assignment half of :func:`semantic_dedup`, against a GIVEN
    codebook (``[(idx, vector), ...]`` — ivf_centroids' shape), so a
    standing deployment can assign new batches with the SAME codebook
    its corpus assignment table was built with (the streaming
    incremental-dedup path). One Arrow-batched pass emits the K raw
    centroid cosines (-2.0 zero-norm sentinel, explicit per-dimension
    left folds — bit-identical to aggregate(zip_with) and DuckDB's
    list_dot_product) + the vector norm; Catalyst does the exact
    decimal round(6) and the lowest-index-tie argmax (ivf_assign's
    convention).

    Returns ``(id, cluster int, centroid_sim double,
    _u array<double>)`` with ``_u`` the unit vector (null for
    zero-norm inputs).
    """
    if not cents:
        raise ValueError("cents must be a non-empty codebook")
    C = [np.asarray(c, dtype=np.float64) for _, c in cents]
    dim = len(C[0])
    cns = []
    for c in C:
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        cns.append(math.sqrt(acc))
    n_cents = len(C)

    @F.pandas_udf("struct<sims: array<double>, nv: double>")
    def _cent_sims(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"sims": [], "nv": []})
        V = np.vstack([
            np.zeros(dim) if v is None
            else np.asarray(v, dtype=np.float64)
            for v in col
        ])
        acc = np.zeros(len(V))
        for j in range(dim):
            acc += V[:, j] * V[:, j]
        nv = np.sqrt(acc)
        sims = np.empty((len(V), n_cents))
        for k in range(n_cents):
            a = np.zeros(len(V))
            ck = C[k]
            for j in range(dim):
                a += V[:, j] * ck[j]
            den = nv * cns[k]
            s = np.full(len(V), -2.0)
            pos = den > 0
            s[pos] = a[pos] / den[pos]
            sims[:, k] = s
        return pd.DataFrame({"sims": list(sims), "nv": nv})

    raw = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        _cent_sims(F.col(vec_col)).alias("_cs"),
    )
    # JVM-side exact decimal rounding + lowest-index-tie argmax —
    # identical to ivf_assign / the q52-family oracle convention
    rounded = F.transform(
        F.col("_cs.sims"), lambda s: F.round(s, 6)
    )
    top = F.array_max(
        F.transform(
            rounded, lambda s, i: F.struct(s.alias("s"), (-i).alias("r"))
        )
    )
    nv = F.col("_cs.nv")
    unit = F.when(
        nv > 0, F.transform("_v", lambda x: x.cast("double") / nv)
    )
    return raw.select(
        "id",
        (-top["r"]).cast("int").alias("cluster"),
        top["s"].alias("centroid_sim"),
        unit.alias("_u"),
    )


# Pair-scan Gram block height (rows per accumulated block). Module
# constant so tests can shrink it to force multi-block paths.
_GRAM_BLOCK = 4096


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_clusters: int = 16,
    tau: float = 0.95,
    cents=None,
    assignment: Optional[DataFrame] = None,
) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the IVF
    codebook, compare pairs only WITHIN a cluster, and mark a document
    a semantic duplicate when a "more canonical" in-cluster neighbor
    sits above cosine ``tau``. Following the paper, the kept exemplar
    of a duplicate group is the one FARTHEST from its centroid (lowest
    centroid cosine; the paper measured this choice best for
    downstream data quality), with id as the deterministic tie-break.
    The paper's greedy sequential filter is replaced by a dominance
    rule — a row is a duplicate iff SOME neighbor above ``tau`` is
    more canonical (lower centroid_sim, tie → lower id) — which is
    order-free, hence reproducible across partitionings and engines,
    and SQL-expressible for the oracle.

    Execution: the heavy float math is Arrow-vectorized (the paper's
    own implementation runs per-cluster similarity matrices on
    accelerators; interpreted per-pair expression folds were measured
    ~50x slower here), but every float is accumulated in an EXPLICIT
    per-dimension left fold — ``acc += x[:, j] * y[:, j]`` — which is
    bit-identical to the engine's ``aggregate(zip_with(...))`` and to
    DuckDB's ``list_dot_product``, and every ROUNDING and THRESHOLD
    decision stays JVM-side (``F.round`` is exact decimal rounding of
    the binary value; numpy's scaled-multiply round can differ), so
    the SQL oracle still replays the operator bit-for-bit:

    * assignment: one Arrow-batched pass emits the K raw centroid
      cosines (-2.0 zero-norm sentinel) + the vector norm; Catalyst
      then rounds to 6dp and arg-maxes with lowest-index ties —
      exactly ivf_assign's convention;
    * pair scan: ``applyInPandas`` per cluster accumulates the
      cluster's unit-vector Gram matrix dimension-by-dimension (the
      same left fold, all pairs of a cluster in one Arrow exchange
      instead of one row per pair) and pre-filters candidates at
      ``tau - 1e-6`` — a conservative bound, since round-to-6dp moves
      a value by at most 5e-7 — so only near-threshold pairs reach
      the JVM, where the exact ``round(cos, 6) >= tau`` decides.

    Scale shape: one shuffle on cluster id for the pair scan (K grows
    with N — K ~ sqrt(N) balances the N*K assignment against the
    N^2/K pair work, see tools/scale_probe.py), one id-keyed dup-flag
    join back; the assignment table is localCheckpointed (it feeds
    the pair scan and the output). Zero-norm vectors score the -2.0
    sentinel, carry a null unit vector, and are always kept and never
    dominate.

    Reuse hooks for standing deployments: ``cents=`` runs the pipeline
    against a GIVEN codebook (skips training), ``assignment=`` against
    a GIVEN assignment table in semantic_assign's shape (skips
    training and assignment — e.g. the parquet state a
    stream_semantic_dedup_insert deployment persists), so the batch
    and streaming paths share one set of frozen artifacts.

    Returns one row per input: ``(id, cluster, centroid_sim, is_dup)``.
    """
    if num_clusters < 1:
        raise ValueError("num_clusters must be >= 1")
    if assignment is not None:
        # Standing-deployment short circuit: a precomputed/persisted
        # assignment table ((id, cluster, centroid_sim, _u) —
        # semantic_assign's shape, e.g. the streaming state at
        # stream_semantic_dedup_insert's state_path/assign) skips
        # codebook training AND assignment; only the pair scan and the
        # dup-flag join run. The caller owns the table's persistence
        # (parquet / localCheckpoint), so no re-materialization here.
        base = assignment.select("id", "cluster", "centroid_sim", "_u")
    else:
        if cents is None:
            cents = ivf_centroids(df, id_col, vec_col, num_clusters)
        if not cents:
            return df.select(
                F.col(id_col).alias("id"),
                F.lit(None).cast("int").alias("cluster"),
                F.lit(None).cast("double").alias("centroid_sim"),
                F.lit(False).alias("is_dup"),
            )
        base = semantic_assign(
            df, cents, id_col, vec_col
        ).localCheckpoint()

    pre_tau = float(tau) - 1e-6
    pair_schema = (
        "id_a long, id_b long, csim_a double, csim_b double, "
        "raw_cos double"
    )

    # Row-blocked Gram accumulation: a skewed cluster of m rows must
    # not materialize an m x m matrix (m = 100k would be 80 GB) — each
    # block holds only (block x m) doubles, candidates are extracted
    # per block, and the per-pair fold order is unchanged.
    BLOCK = _GRAM_BLOCK

    def _cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = pdf[pdf["_u"].notna()].reset_index(drop=True)
        m = len(keep)
        if m < 2:
            return pd.DataFrame(
                columns=["id_a", "id_b", "csim_a", "csim_b", "raw_cos"]
            )
        X = np.vstack(keep["_u"].to_numpy())
        ids = keep["id"].to_numpy()
        cs = keep["centroid_sim"].to_numpy()
        frames = []
        for lo in range(0, m - 1, BLOCK):
            hi = min(lo + BLOCK, m)
            gram = np.zeros((hi - lo, m))
            for j in range(X.shape[1]):
                gram += np.outer(X[lo:hi, j], X[:, j])
            ia, ib = np.nonzero(gram >= pre_tau)
            upper = (ia + lo) < ib  # each unordered pair once
            ia, ib = ia[upper], ib[upper]
            if len(ia):
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[ia + lo],
                            "id_b": ids[ib],
                            "csim_a": cs[ia + lo],
                            "csim_b": cs[ib],
                            "raw_cos": gram[ia, ib],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                columns=["id_a", "id_b", "csim_a", "csim_b", "raw_cos"]
            )
        return pd.concat(frames, ignore_index=True)

    # The pair scan's cost is per-cluster COMPUTE (the Gram fold), not
    # bytes: left to AQE, the kilobyte-sized cluster shuffle coalesces
    # to one partition and the whole scan serializes on one core. Pin
    # the width (same exchange, explicit count — see pin_group_width).
    from ._spread import pin_group_width

    pairs = pin_group_width(base, "cluster").groupBy("cluster").applyInPandas(
        _cluster_pairs, pair_schema
    )
    # of a qualifying pair, the dominated (removed) member is the one
    # CLOSER to its centroid — higher centroid_sim, tie → higher id.
    # (upper-triangle emission guarantees id_a < id_b)
    b_more_canonical = (F.col("csim_b") < F.col("csim_a")) | (
        (F.col("csim_b") == F.col("csim_a"))
        & (F.col("id_b") < F.col("id_a"))
    )
    dominated = (
        pairs.where(F.round("raw_cos", 6) >= F.lit(tau))
        .select(
            F.when(b_more_canonical, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("id")
        )
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return base.join(dominated, "id", "left").select(
        "id",
        "cluster",
        "centroid_sim",
        F.coalesce("_d", F.lit(False)).alias("is_dup"),
    )


def _quantized_mean(sums, n: int) -> list:
    """The Lloyd-update mean both engines replay bit-for-bit: each
    element was pre-quantized to the 1e-6 grid with ``floor(x * 1e6)``
    (floor has no rounding ties, unlike round-half rules that differ
    at representability edges), the per-cluster integer sums are exact
    in any order, and the mean is two IEEE divisions of exactly-
    representable operands — ``double(S) / double(n) / 1e6`` — that
    Python, Spark and DuckDB all evaluate identically. Exactness needs
    |S| < 2^53: ~9e8 rows per cluster at unit-scale embeddings, far
    beyond any driver-collected codebook's training slice."""
    return [int(s) / n / 1e6 for s in sums]


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 0,
) -> dict:
    """Deterministic product-quantization codebooks (Jégou et al.
    2011, "Product Quantization for Nearest Neighbor Search"): the
    vector dimension is cut into ``m`` contiguous subspaces and each
    subspace's ``ksub``-entry codebook starts as the corresponding
    slice of the same id-stride row sample :func:`ivf_centroids`
    uses, optionally refined by ``refine_iters`` Lloyd (k-means)
    rounds per subspace — assign every subvector to its nearest
    sub-codeword (squared L2, 6dp-rounded argmin, ties toward the
    lower code: exactly :func:`pq_encode`'s convention), then move
    each codeword to its cluster's mean on the 1e-6 ``floor``
    quantization grid (:func:`_quantized_mean` — integer sums, so the
    update is partition-order-independent AND bit-replayable in SQL;
    an empty cluster keeps its previous codeword). Deterministic
    k-means with a deterministic init: no seed, same codebooks every
    run and every engine.

    Returns ``{"m", "sub", "ksub", "refine_iters", "books"}`` with
    ``books[s][c]`` the c-th sub-codeword of subspace s — m * ksub *
    (dim/m) floats, driver/broadcast-sized by construction.

    Scale shape: init IS ivf_centroids' two bounded aggregations, and
    each refinement round is ONE distributed job — a codegen argmin
    projection, an explode to (subspace, code) and one m*ksub-group
    aggregation (map-side partial) of integer dim-sums; only m * ksub
    rows reach the driver per round. PQ is the 100 TB vector-serving
    memory story: dim float32 -> m uint8 codes per vector (32x at
    dim=64/m=8), and ADC search reads ONLY the codes column.
    """
    if m < 1 or ksub < 2:
        raise ValueError("m must be >= 1 and ksub >= 2")
    if refine_iters < 0:
        raise ValueError("refine_iters must be >= 0")
    cents = ivf_centroids(df, id_col, vec_col, ksub)
    if not cents:
        raise ValueError("pq_train: input has no rows")
    dim = len(cents[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(cents) < ksub:
        raise ValueError(
            f"pq_train: only {len(cents)} distinct stride rows for "
            f"ksub={ksub} — shrink ksub"
        )
    sub = dim // m
    books = [
        [
            [float(x) for x in cvec[s * sub:(s + 1) * sub]]
            for _, cvec in cents
        ]
        for s in range(m)
    ]
    train = df.where(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & ~F.expr(f"exists(`{vec_col}`, x -> x IS NULL)")
    )
    for _ in range(refine_iters):
        code_exprs = _pq_code_sql_exprs(vec_col, books, sub)
        segs = ", ".join(
            "struct("
            f"{s} AS s, {code_exprs[s]} AS code, "
            f"slice(`{vec_col}`, {s * sub + 1}, {sub}) AS sv)"
            for s in range(m)
        )
        exploded = train.selectExpr(f"explode(array({segs})) AS g").select(
            F.col("g.s").alias("s"),
            F.col("g.code").alias("code"),
            F.col("g.sv").alias("sv"),
        )
        rows = (
            exploded.groupBy("s", "code")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(
                        F.floor(
                            F.element_at("sv", d + 1).cast("double")
                            * F.lit(1e6)
                        ).cast("long")
                    ).alias(f"s{d}")
                    for d in range(sub)
                ],
            )
            .collect()
        )
        for r in rows:
            books[r["s"]][r["code"]] = _quantized_mean(
                [r[f"s{d}"] for d in range(sub)], int(r["n"])
            )
    return {
        "m": m,
        "sub": sub,
        "ksub": ksub,
        "refine_iters": refine_iters,
        "books": books,
    }


def _pq_code_sql_exprs(vname: str, books, sub: int) -> list:
    """Per-subspace nearest-sub-codeword SQL expressions — ONE shared
    builder so :func:`pq_encode` and :func:`pq_train`'s refinement
    rounds can never drift on the argmin convention (squared-L2
    distances rounded to 6dp, ties toward the lower code). Built as
    SQL strings, not Column-DSL objects (the near_dup_pairs py4j
    lesson: ~4 driver roundtrips per DSL node)."""

    def lit_arr(vals):
        return "array(" + ", ".join(f"{float(x)!r}D" for x in vals) + ")"

    # ONE transform over the per-subspace book literal instead of ksub
    # unrolled structs: the book data is the same either way, but the
    # expression tree drops from ksub aggregate/zip_with folds (each
    # repeating the slice subtree) to one fold body the engine loops —
    # the optimizer's per-save walk and the codegen source shrink
    # ~ksub x. Same distances (identical fold), same 6dp round, same
    # array_min over (d, c) with ties toward the lower code.
    exprs = []
    for s, book in enumerate(books):
        seg = f"slice(`{vname}`, {s * sub + 1}, {sub})"
        book_lit = (
            "array(" + ", ".join(lit_arr(bsub) for bsub in book) + ")"
        )
        exprs.append(
            f"array_min(transform({book_lit}, (bc, c) -> "
            f"struct(round(aggregate(zip_with({seg}, bc, "
            "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)"
            "), 0.0D, (acc, v) -> acc + v), 6) AS d, "
            "c AS c))).c"
        )
    return exprs


def pq_encode(
    df: DataFrame,
    codebooks: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """PQ-encode every vector: per subspace, the code of the nearest
    sub-codeword by squared L2 (distances rounded to 6dp before the
    argmin so cross-engine ulp noise can't flip it; ties toward the
    lower code — ivf_assign's convention). One narrow whole-stage-
    codegen projection: m * ksub literal-subvector folds per row, no
    shuffle, no UDF.

    Returns ``(id, codes array<int>)`` — the m-byte compressed
    representation that replaces the dim-float vector at serving time.

    The m * ksub fold expressions are built as ONE SQL string, not
    Column-DSL objects: the DSL costs ~4 py4j driver roundtrips per
    node and a 128-fold plan spent ~8s in the driver before any job
    existed (the near_dup_pairs lesson); the parsed plan — and every
    result — is identical. Each distance is a left fold of
    ``(x_i - c_i)^2`` terms — the same per-element value and fold
    order as DuckDB's ``list_dot_product(d, d)`` over elementwise
    diffs, so the oracle replays every distance bit-for-bit.

    Degenerate rows — a null vector, a wrong-length vector, or a null
    element — are dropped here rather than silently propagating NULL
    codes into every downstream ADC sum (the cosine/semantic family's
    explicit-sentinel discipline, applied as a filter because a row
    with no valid code has no meaningful compressed form).
    """
    m, sub = codebooks["m"], codebooks["sub"]
    books = codebooks["books"]
    if isinstance(vec_col, str):
        vname = vec_col
    else:
        df = df.withColumn("_pq_vec", vec_col)
        vname = "_pq_vec"
    df = df.where(
        F.col(vname).isNotNull()
        & (F.size(vname) == m * sub)
        & ~F.expr(f"exists(`{vname}`, x -> x IS NULL)")
    )
    code_exprs = _pq_code_sql_exprs(vname, books, sub)
    return df.selectExpr(
        f"`{id_col}` AS id",
        "CAST(array(" + ", ".join(code_exprs) + ") AS array<int>) "
        "AS codes",
        *[f"`{c}`" for c in extra_cols],
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: dict,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "id",
    codes_col: str = "codes",
    rerank: int = 0,
    raw_df: Optional[DataFrame] = None,
    raw_id_col: str = "vec_id",
    raw_vec_col: str = "embedding",
    scoring_dtype: str = "decimal",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (the ADC of Jégou et
    al. 2011): the query builds an m x ksub lookup table of squared
    subspace distances ONCE (driver-side Python left folds — the same
    IEEE op sequence as the engine/oracle folds, the shared-literal
    convention), each table entry is DECIMAL(20,12)-quantized IN the
    engine so the m-term per-row sum is exact and order-independent,
    and every corpus row costs m array lookups + m decimal adds — the
    codes column is the only thing read (column pruning: the raw
    vectors never leave storage).

    ``scoring_dtype="double"`` is the PRODUCTION mode (FAISS scores
    ADC in float): the per-row sum runs in IEEE double — roughly an
    order of magnitude cheaper per row than decimal arithmetic — at
    the cost of the order-independent-sum exactness the default
    "decimal" mode keeps for oracle parity. Top-k IDS are identical
    between the modes except where two codes' true ADC distances tie
    within double rounding (~1e-15 relative — pytest-asserted at the
    fixture); distances differ only in final ulps, and ``rerank``
    recovers exact-cosine ranking in either mode.

    Approximation contract: ADC ranks by the PQ-reconstructed
    distance, the standard recall/memory trade. ``rerank=c`` (with
    ``raw_df``) is the standard exactness-recovery step: take the top
    ``c >= k`` ids by ADC, re-score ONLY those c rows against their
    raw vectors (the c ids are a bounded driver list pushed into the
    raw scan as an IN filter — PushedFilters, never a full raw-vector
    pass), and return the exact-cosine top ``k`` — output
    ``(id, cosine_sim)``, cosine_topk's contract, with recall
    approaching exact as c grows. At 100 TB this composes with the
    IVF layout (ivf_write_index): probe nprobe list-partition
    directories, ADC-scan only their codes, raw-read only c rows.

    Without rerank, returns the top ``k`` rows ``(id, adc_dist
    double)``, ascending, ties broken by id.
    """
    if rerank:
        if rerank < k:
            raise ValueError("rerank must be >= k")
        if raw_df is None:
            raise ValueError("rerank requires raw_df (the raw vectors)")
    m, sub, ksub = codebooks["m"], codebooks["sub"], codebooks["ksub"]
    books = codebooks["books"]
    q = [float(x) for x in query_vec]
    if len(q) != m * sub:
        raise ValueError(
            f"query dim {len(q)} != codebook dim {m * sub}"
        )
    if k < 1:
        raise ValueError("k must be >= 1")
    if scoring_dtype not in ("decimal", "double"):
        raise ValueError(
            f"scoring_dtype must be 'decimal' or 'double', got "
            f"{scoring_dtype!r}"
        )

    def fold_sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc += d * d
        return acc

    # Each table entry is pasted as the raw IEEE double (repr
    # round-trips exactly) and — in the default decimal mode — cast
    # to DECIMAL(20,12) IN the engine: the same double -> decimal
    # cast the oracle performs on its identically-folded double, so
    # the quantization rule is the engines' shared one (the
    # q85..q103 LM convention), never a third Python-side rounding.
    # Double mode keeps the raw literal and sums in IEEE double.
    entry_sql = (
        "CAST({v!r}D AS DECIMAL(20,12))"
        if scoring_dtype == "decimal"
        else "{v!r}D"
    )
    tables = []
    for s in range(m):
        qsub = q[s * sub:(s + 1) * sub]
        tables.append(
            F.expr(
                "array("
                + ", ".join(
                    entry_sql.format(v=fold_sqdist(qsub, bsub))
                    for bsub in books[s]
                )
                + ")"
            )
        )
    cc = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    adc = None
    for s in range(m):
        term = F.element_at(tables[s], F.element_at(cc, s + 1) + 1)
        adc = term if adc is None else adc + term
    ranked = (
        codes_df.select(
            F.col(id_col).alias("id"),
            adc.cast("double").alias("adc_dist"),
        )
        .orderBy("adc_dist", "id")
        .limit(rerank if rerank else k)
    )
    if not rerank:
        return ranked
    cand_ids = [r["id"] for r in ranked.select("id").collect()]
    survivors = raw_df.where(F.col(raw_id_col).isin(cand_ids))
    return cosine_topk(survivors, q, k, raw_id_col, raw_vec_col)


def ivf_pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    pq_refine_iters: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k — the composition that serves vector
    search at 100 TB (the FAISS IVFPQ design, minus residual
    encoding: codes quantize the raw vectors, so every stage stays
    oracle-replayable): IVF probing prunes the corpus to ``nprobe``
    inverted lists (~nprobe/K of the rows), and asymmetric-distance
    PQ ranks the survivors from their m-int codes alone.

    At scale both halves are precomputed once: the list id is a
    partition directory (ivf_write_index's layout, q59) and the codes
    column is stored next to it — a query then touches nprobe
    directory scans of an m-int column, never a raw vector. This
    composed operator runs the same plan inline: global PQ codebooks
    (pq_train), IVF assignment filter, encode of the survivors, ADC.

    Ranking contract: ADC distance ascending, ties by id — PQ's
    reconstruction error means recall < 1 vs cosine_topk by design
    (``pq_refine_iters`` Lloyd rounds tighten the codebooks — see
    :func:`pq_train`; re-rank the top candidates on raw vectors when
    exactness matters, :func:`pq_adc_topk`'s ``rerank=``).
    """
    cents = ivf_centroids(df, id_col, vec_col, num_centroids)
    probes = _ivf_probes(cents, query_vec, nprobe)
    books = pq_train(
        df, id_col, vec_col, m=m, ksub=ksub,
        refine_iters=pq_refine_iters,
    )
    cand = df.withColumn(
        "_ivf_list", ivf_assign(F.col(vec_col), cents)
    ).where(F.col("_ivf_list").isin(probes))
    codes = pq_encode(cand, books, id_col, vec_col)
    return pq_adc_topk(codes, books, query_vec, k)


def ivf_pq_residual_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    pq_refine_iters: int = 0,
    coarse_refine_iters: int = 0,
) -> DataFrame:
    """The FULL FAISS IVFPQ design, residuals included: PQ quantizes
    each vector's RESIDUAL from its assigned coarse centroid (x -
    c_list) rather than x itself — residuals concentrate near the
    origin, so the same ksub codewords spend their resolution on the
    part of x the coarse quantizer didn't already explain. The query
    side builds a SEPARATE ADC table per probed list from that list's
    query residual (q - c_list): per candidate row the distance is
    ||(q - c_l) - pq(x - c_l)||^2, FAISS's ADC-with-residual.

    Every stage stays oracle-replayable: the residual is an exact
    elementwise IEEE subtraction of two doubles both engines hold
    bit-identically (the vector and the codebook literal), residual
    PQ books come from the same stride init (+ optional
    ``pq_refine_iters`` integer-grid Lloyd rounds), and each per-list
    table entry is DECIMAL(20,12)-quantized exactly like
    :func:`pq_adc_topk`'s.

    Scale shape: identical to :func:`ivf_pq_topk` — at rest this is
    the same (id, codes) column beside the inverted-list partition
    dirs (codes just encode residuals); per query, nprobe directory
    scans of an m-int column plus m array lookups + m decimal adds
    per row (the per-list CASE dissolves at scan time: rows of one
    partition all take one branch).

    Residuals pay off only when the coarse quantizer is TRAINED
    (their whole premise is that c_list explains most of x):
    measured on the sf0.01 fixture at the q107 budget, recall@10
    hits/50 were 11 raw-PQ, 3 residual-over-stride, and 15 residual
    with ``coarse_refine_iters=2`` — pair residual encoding with
    coarse Lloyd rounds (as FAISS's own training does) or prefer
    plain :func:`ivf_pq_topk` with an untrained coarse codebook.
    """
    cents = ivf_centroids(
        df, id_col, vec_col, num_centroids, coarse_refine_iters
    )
    probes = _ivf_probes(cents, query_vec, nprobe)
    # The serving pipeline below (assign + residual + m*ksub encode
    # folds + per-list ADC) is the heaviest per-row expression chain
    # in the similarity family; on a single-row-group corpus it runs
    # as ONE task. Widen the scan first (no-op on well-partitioned
    # inputs). Unlike the family-wide embeddings spread (measured a
    # regression r12 and reverted), this one sits where per-row work
    # dominates the added exchange.
    from ._spread import spread_scan

    df = spread_scan(df, id_col)
    cent_arrs = "array(" + ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in cvec) + ")"
        for _, cvec in cents
    ) + ")"
    assigned = df.withColumn(
        "_ivf_list", ivf_assign(F.col(vec_col), cents)
    )
    res = assigned.withColumn(
        "_res",
        F.expr(
            f"zip_with(`{vec_col}`, "
            f"element_at({cent_arrs}, _ivf_list + 1), "
            "(x, y) -> CAST(x AS DOUBLE) - y)"
        ),
    )
    books = pq_train(
        res, id_col, "_res", m=m, ksub=ksub,
        refine_iters=pq_refine_iters,
    )
    cand = res.where(F.col("_ivf_list").isin(probes))
    # pq_encode's degenerate-row filter, applied to the RAW vector
    # column instead of the computed "_res": the optimizer pushes
    # filter conjuncts below the projection by SUBSTITUTING the
    # aliased expression, so filtering on "_res" inlined the whole
    # residual+assign tree into each of the three validity conjuncts
    # (a ~150 KB pushed Filter re-evaluated per row — measured r12).
    # Equivalent by construction: the centroid literal has no nulls
    # and length dim, so zip_with pads iff len(vec) != dim and
    # produces a null element iff vec does — (size(_res)=dim AND no
    # null in _res AND _res not null) <=> the same checks on vec.
    # The encode expressions are the SAME shared argmin builder
    # pq_encode uses, so the convention cannot drift.
    dim = m * books["sub"]
    code_exprs = _pq_code_sql_exprs("_res", books["books"], books["sub"])
    codes = cand.where(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & ~F.expr(f"exists(`{vec_col}`, x -> x IS NULL)")
    ).selectExpr(
        f"`{id_col}` AS id",
        "CAST(array(" + ", ".join(code_exprs) + ") AS array<int>) "
        "AS codes",
        "`_ivf_list`",
    )

    adc = _residual_adc_col(cents, probes, books, query_vec)
    return (
        codes.select(
            F.col("id"), adc.cast("double").alias("adc_dist")
        )
        .orderBy("adc_dist", "id")
        .limit(k)
    )


def _residual_adc_col(cents, probes, books, query_vec) -> Column:
    """FAISS's ADC-with-residual as ONE column expression: per probed
    list, a DECIMAL(20,12)-quantized lookup table of the query
    RESIDUAL's (q - c_list) squared subspace distances, picked per
    row by a CASE on ``_ivf_list`` — constant within a list partition
    directory, so at rest the CASE dissolves at scan time. Shared by
    the inline :func:`ivf_pq_residual_topk` and the persisted-index
    serving read (:func:`ivf_pq_topk_indexed` on a ``residual=True``
    index), so fresh-build and serve can never drift on the math.
    Expects ``(_ivf_list, codes)`` columns on the rows it scores."""
    q = [float(x) for x in query_vec]
    m, sub = books["m"], books["sub"]

    def fold_sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc += d * d
        return acc

    cent_by_id = {int(i): v for i, v in cents}
    adc = None
    for s in range(m):
        per_list = None
        for lst in probes:
            cvec = cent_by_id[int(lst)]
            qr = [qx - cx for qx, cx in zip(q, cvec)]
            qsub = qr[s * sub:(s + 1) * sub]
            tbl = F.expr(
                "array("
                + ", ".join(
                    f"CAST({fold_sqdist(qsub, bsub)!r}D "
                    "AS DECIMAL(20,12))"
                    for bsub in books["books"][s]
                )
                + ")"
            )
            cond = F.col("_ivf_list") == lst
            per_list = (
                F.when(cond, tbl)
                if per_list is None
                else per_list.when(cond, tbl)
            )
        term = F.element_at(
            per_list, F.element_at(F.col("codes"), s + 1) + 1
        )
        adc = term if adc is None else adc + term
    return adc
