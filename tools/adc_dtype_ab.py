"""Decimal vs double ADC serving cost — the number behind
scoring_dtype="double" (VERDICT r10 #3).

q134 (batch ADC from the persisted IVF-PQ index) is the bench's most
expensive query and its cost ceiling is the DECIMAL(20,12) per-row
sum the gate's order-independent-sum property needs. Production FAISS
scores ADC in float; scoring_dtype="double" is that mode. This probe
measures both modes on the SAME persisted index with the SAME query
batch (q134's configuration), Q89 protocol (floors before/after,
1 warm + N timed runs each, noop sink), plus a top-k id agreement
count so the speedup is shown next to what it costs (ties only).

Usage: python tools/adc_dtype_ab.py <out.json> <sf_dir> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import bench  # noqa: E402  (repo root on sys.path — floor probe)

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_batch_indexed,
        ivf_write_index,
    )
    from tinyflux_spark.schema import get_spark

    spark = get_spark("adc_dtype_ab")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.where(F.col("vec_id") != 0)
    queries = emb.where(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") != 0)
    )
    path = tempfile.mkdtemp(prefix="tfs_adc_ab_")
    ivf_write_index(corpus, path, num_centroids=16, pq_m=8, pq_ksub=16)

    def read(dtype):
        return ivf_pq_topk_batch_indexed(
            spark, path, queries, k=10, nprobe=4, scoring_dtype=dtype
        )

    def timed(dtype):
        t0 = time.perf_counter()
        read(dtype).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    floor_before = bench._calibration(spark)
    out = {}
    for dtype in ("decimal", "double"):
        timed(dtype)  # warm (plan compile dominates the first run)
        ts = sorted(timed(dtype) for _ in range(runs))
        out[dtype] = {"runs_s": ts, "median_s": ts[len(ts) // 2]}
    floor_after = bench._calibration(spark)

    # id agreement: how many (query, id) top-k pairs coincide
    a = {(r[0], r[1]) for r in read("decimal").select(
        "query_id", "vec_id").collect()}
    b = {(r[0], r[1]) for r in read("double").select(
        "query_id", "vec_id").collect()}
    doc = {
        "what": "decimal vs double ADC on q134's persisted-index read",
        "sf_dir": sf_dir,
        "n_queries": queries.count(),
        "floor_before_ms": floor_before["spark_action_floor_ms"],
        "floor_after_ms": floor_after["spark_action_floor_ms"],
        **{f"{k}_median_s": v["median_s"] for k, v in out.items()},
        **{f"{k}_runs_s": v["runs_s"] for k, v in out.items()},
        "speedup": round(
            out["decimal"]["median_s"] / out["double"]["median_s"], 2
        ),
        "topk_pairs_decimal": len(a),
        "topk_pairs_agree": len(a & b),
        "machine": f"load average {os.getloadavg()[0]:.2f}",
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "decimal_median_s", "double_median_s", "speedup",
        "topk_pairs_decimal", "topk_pairs_agree")}))


if __name__ == "__main__":
    main()
