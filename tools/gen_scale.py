"""Deterministic scale-up of an sf directory for scaling probes.

The driver ships sf0.001/0.01/0.1 only; the scaling claims in the
operator docstrings ("one shuffle on the key — linear") deserve
measured evidence beyond sf0.1. This tool replicates the sf0.1 tables
R times with DETERMINISTIC per-replica mutations (no rand(), so two
runs build byte-identical inputs) chosen so that corpus statistics
scale linearly and the expected output cardinality of every probed
operator is an exact multiple of the base run — a super-linear TIME
ratio in the probe therefore indicts the plan, never a data artifact:

* documents: replica i prefixes every token with ``r<i>`` — replicas
  are vocabulary-disjoint, so duplicate/near-dup structure is
  preserved WITHIN a replica and absent ACROSS replicas (shingle sets
  of different replicas cannot collide); dedup-family output scales
  exactly x R. (A naive word-rotation would leave n-gram sets ~intact
  and every replica a near-dup of its base — output would explode
  quadratically by construction.)
* events: fresh user ids per replica (same time range) — keyed
  windows/sessions scale by key count, never by per-key length.
* orders/lineitem: order keys offset per replica, FKs preserved;
  dimension tables unchanged (fan-out growth, the realistic shape).
* embeddings: fresh ids, first coordinate nudged by i * 1e-3 —
  geometry (cluster structure) preserved, vectors distinct.
* region/nation/customer/supplier/part: copied as-is.

Usage: python tools/gen_scale.py <out_dir> <R> [src_sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

COPY = ["region", "nation", "customer", "supplier", "part"]


def _replicate(df, R):
    """Cross the frame with replica ids 0..R-1 (one codegen explode)."""
    return df.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(R - 1)))
    )


def scale_documents(df, R):
    n_docs = df.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = _replicate(df, R)
    ws = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    tagged = F.when(
        F.col("_r") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(
                ws, lambda w: F.concat(
                    F.lit("r"), F.col("_r").cast("string"), w
                )
            ),
            " ",
        )
    )
    return rep.select(
        (F.col("doc_id") + F.col("_r") * n_docs).alias("doc_id"),
        tagged.alias("text"),
        "lang",
        "source",
        F.length(tagged).alias("n_chars"),
    )


def scale_events(df, R):
    n_ev = df.agg(F.max("event_id")).collect()[0][0] + 1
    n_u = df.agg(F.max("user_id")).collect()[0][0] + 1
    rep = _replicate(df, R)
    return rep.select(
        (F.col("event_id") + F.col("_r") * n_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_r") * n_u).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scale_orders(df, R):
    n_o = df.agg(F.max("o_orderkey")).collect()[0][0] + 1
    rep = _replicate(df, R)
    return rep.select(
        (F.col("o_orderkey") + F.col("_r") * n_o).alias("o_orderkey"),
        *[c for c in df.columns if c != "o_orderkey"],
    )


def scale_lineitem(df, R, n_o):
    rep = _replicate(df, R)
    return rep.select(
        (F.col("l_orderkey") + F.col("_r") * n_o).alias("l_orderkey"),
        *[c for c in df.columns if c != "l_orderkey"],
    )


def scale_embeddings(df, R):
    n_v = df.agg(F.max("vec_id")).collect()[0][0] + 1
    rep = _replicate(df, R)
    nudged = F.concat(
        F.array(
            (
                F.element_at("embedding", 1)
                + F.col("_r").cast("float") * F.lit(1e-3)
            ).cast("float")
        ),
        F.slice("embedding", 2, 10_000),
    )
    return rep.select(
        (F.col("vec_id") + F.col("_r") * n_v).alias("vec_id"),
        nudged.alias("embedding"),
        "label",
    )


def generate(spark, out_dir: str, R: int, src: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def rd(t):
        return spark.read.parquet(os.path.join(src, f"{t}.parquet"))

    def wr(df, t, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )

    for t in COPY:
        wr(rd(t), t, 1)
    wr(scale_documents(rd("documents"), R), "documents", min(R * 2, 32))
    wr(scale_events(rd("events"), R), "events", min(R * 2, 32))
    orders = rd("orders")
    n_o = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    wr(scale_orders(orders, R), "orders", min(R * 2, 32))
    wr(scale_lineitem(rd("lineitem"), R, n_o), "lineitem", 32)
    wr(scale_embeddings(rd("embeddings"), R), "embeddings", min(R, 16))


if __name__ == "__main__":
    from tinyflux_spark.schema import get_spark

    out = sys.argv[1]
    R = int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    generate(get_spark(), out, R, src)
    print(f"wrote {out} at {R}x {src}")
