"""Deduplication operators for large-scale corpus curation.

Five families, all pure DataFrame compositions (no Python in the hot
path), each designed around its shuffle profile at 100 TB:

* exact            — hash-groupBy on a normalized fingerprint; one
                     shuffle on a high-entropy key (no skew).
* ngram-jaccard    — shingle explode → inverted-index self-join →
                     per-pair intersection counts. Hot shingles are the
                     skew hazard: ``max_shingle_freq`` drops
                     stop-shingles (standard df-cut), bounding join
                     fan-out.
* MinHash + LSH    — k md5-derived min-hashes per doc, banded into
                     b groups of r; candidate pairs only need equality
                     joins on (band, signature) — the classic
                     sub-quadratic path; optional exact-Jaccard verify.
* SimHash          — 64-bit (xxhash64) or 32-bit (md5, oracle-friendly)
                     near-dup bit signature; hamming-ball lookup via
                     band rotation.
* embedding cosine — see operators/similarity.py (near_dup_pairs).

MinHash hashing is md5-based (not xxhash) deliberately: md5 exists in
every engine, so the whole pipeline stays oracle-checkable; the hash
cost is one pass over shingles either way.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint


def _norm_text(text_col: str) -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep: str = "min",
) -> DataFrame:
    """One representative row id per distinct normalized text.

    Returns (fingerprint, keep_id, n_dups). groupBy on md5 — uniform
    key distribution, AQE-safe at any scale.
    """
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(agg_id.alias("keep_id"), F.count("*").alias("n_dups"))
    )


def char_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct character n-gram shingles of normalized text."""
    c = _norm_text(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_shingle_freq: Optional[int] = None,
) -> DataFrame:
    """(id, shingle, n_shingles) exploded inverted-index rows.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    documents — the df-cut that caps self-join fan-out (a shingle shared
    by 1M docs would otherwise emit 10^12 pairs).
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(char_shingles(text_col, n)).alias("shingle"),
        )
    )
    counts = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    sh = sh.join(counts, "id")
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = (
            sh.join(freq.where(F.col("_df") <= max_shingle_freq), "shingle")
            .drop("_df")
        )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: Optional[int] = None,
) -> DataFrame:
    """All document pairs with Jaccard(shingles_a, shingles_b) >= t.

    Exact (no hashing): inverted-index self-join on shingle, count
    common shingles per pair, |A∪B| = |A|+|B|-common. Quadratic in the
    worst case — use minhash_lsh_pairs at corpus scale; this is the
    ground-truth operator the LSH variant is verified against.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_freq)
    a = sh.select(
        F.col("shingle"),
        F.col("id").alias("id_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = sh.select(
        F.col("shingle"),
        F.col("id").alias("id_b"),
        F.col("n_shingles").alias("n_b"),
    )
    pairs = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """(id, sig: array<string>) — k independent min-hashes per document.

    Hash h_i(s) = md5(i || ':' || s); the min over a document's shingle
    set approximates a uniform permutation minimum. One explode + one
    groupBy; md5 keeps it reproducible in any SQL engine.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(text_col, n)).alias("shingle"),
    )
    hashed = sh.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: F.struct(
                    i.alias("h"),
                    F.md5(
                        F.concat(
                            i.cast("string"), F.lit(":"), F.col("shingle")
                        )
                    ).alias("v"),
                ),
            )
        ).alias("hv"),
    )
    return (
        hashed.groupBy("id", F.col("hv.h").alias("h"))
        .agg(F.min("hv.v").alias("minhash"))
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("h"), F.col("minhash")))
                ),
                lambda s: s["minhash"],
            ).alias("sig")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    verify_threshold: Optional[float] = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    Signatures are split into ``bands`` groups of r = k/b hashes; a pair
    colliding on any band's concatenated signature becomes a candidate —
    an equi-join on (band, md5(band-slice)), which scales as the number
    of true-ish collisions rather than |docs|^2. With
    ``verify_threshold`` set, candidates are verified with the exact
    n-gram Jaccard (returns id_a, id_b, jaccard); otherwise candidate
    pairs (id_a, id_b) are returned unverified.
    """
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice(F.col("sig"), b * r + 1, r)
                        )
                    ).alias("bsig"),
                ),
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))
    a = banded.select("band", "bsig", F.col("id").alias("id_a"))
    b = banded.select("band", "bsig", F.col("id").alias("id_b"))
    cands = (
        a.join(b, ["band", "bsig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cands
    exact = ngram_jaccard_pairs(
        df, id_col, text_col, n, threshold=0.0
    ).withColumnRenamed("jaccard", "jaccard")
    return (
        cands.join(exact, ["id_a", "id_b"])
        .where(F.col("jaccard") >= verify_threshold)
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 32,
    use_md5: bool = True,
) -> DataFrame:
    """(id, simhash) — near-dup bit signature over whitespace tokens.

    Each token votes ±1 on each bit of its hash; the sign pattern of the
    per-bit sums is the signature. ``use_md5`` derives the token hash
    from the first bits/4 hex chars of md5 (portable to any engine);
    False uses xxhash64 (faster, Spark-only). Similar docs differ in few
    bits (hamming distance).
    """
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(_norm_text(text_col)), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    if use_md5:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, bits // 4), 16, 10).cast(
            "long"
        )
    else:
        h = F.xxhash64(F.col("tok"))
    # bit positions are Python ints so shiftright gets literal counts;
    # the explode fans each token into `bits` (bit, vote) rows.
    bit_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("bit"),
                (
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
                ).cast("long").alias("vote"),
            )
            for i in range(bits)
        ]
    )
    per_bit = tokens.select(
        "id", F.explode(bit_structs).alias("bv")
    ).select("id", F.col("bv.bit").alias("bit"), F.col("bv.vote").alias("vote"))
    return (
        per_bit.groupBy("id", "bit")
        .agg(F.sum("vote").alias("s"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
