"""The composed retrain→ADC-serve scale row (VERDICT r11 #5).

Round 11 left three artifacts that each show HALF of the story:
ADC_DTYPE_AB_r11_100x measured batch ADC (q134's read) at 100x
against a STALE K=16 index (79-108s — where the analysis notes the
stale geometry carries ~28x the corpus-warranted candidate volume);
RETRAIN_RECOVERY_r11 measured retrain restoring the exact-arm serve;
SCALE_r11 measured the retrained exact serve (q126 autoK, 37.5s).
This probe closes the loop in ONE document: the same persisted
IVF-PQ index serves batch ADC before and after
``ivf_retrain_index(num_centroids="auto")`` — seconds (decimal AND
double modes, Q89 floor protocol) plus the ADC-arm recall at both
geometries, so the composed win (retrain cuts scored volume, dtype
cuts per-row cost) is one table.

The retrain itself runs the r12 marker-commit protocol end to end at
the 100x corpus: staged ``index_v0/`` generation, ``_SUCCESS``
creation-gated commit, generation-scan resolution on every read,
retrain-intent marker claimed and released.

Usage: python tools/retrain_adc_compose.py <out.json> [scale_dir] [runs]
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
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import bench  # noqa: E402

    from tinyflux_spark.operators.similarity import (
        _probe_sample,
        _read_index_params,
        index_recall_probe,
        ivf_pq_topk_batch_indexed,
        ivf_retrain_index,
        ivf_write_index,
    )
    from tinyflux_spark.schema import get_spark

    spark = get_spark("retrain_adc_compose")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.where(F.col("vec_id") != 0)
    path = tempfile.mkdtemp(prefix="tfs_retrain_adc_")

    # the stale geometry: the gate fixture's K=16 at a 100x corpus
    # (RETRAIN_RECOVERY_r11's "stale" arm), with q134's PQ books
    t0 = time.time()
    ivf_write_index(corpus, path, num_centroids=16, pq_m=8, pq_ksub=16)
    build_s = round(time.time() - t0, 1)

    # the FIXED query sample (q131's contract): 50 md5-ordered ids
    # from the index's own rows — identical before/after by id
    queries = _probe_sample(corpus, "vec_id", "embedding", 50)
    queries = spark.createDataFrame(
        queries.collect(), schema=queries.schema
    )  # pin the rows driver-side so both phases query byte-identically

    def timed(dtype):
        t0 = time.perf_counter()
        ivf_pq_topk_batch_indexed(
            spark, path, queries, k=10, nprobe=4, scoring_dtype=dtype
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def recall_adc():
        return round(
            index_recall_probe(
                spark, path, queries, k=10, nprobe=4, scoring="adc",
                scoring_dtype="double",
            ).agg(F.avg("recall")).collect()[0][0],
            4,
        )

    def phase(tag):
        out = {}
        for dtype in ("decimal", "double"):
            timed(dtype)  # warm: plan compile outside the window
            ts = sorted(timed(dtype) for _ in range(runs))
            out[f"{dtype}_runs_s"] = ts
            out[f"{dtype}_median_s"] = ts[len(ts) // 2]
        out["adc_recall_at_10"] = recall_adc()
        out["num_centroids"] = _read_index_params(path)["num_centroids"]
        return out

    floor_before = bench._calibration(spark)
    stale = phase("stale")

    t0 = time.time()
    info = ivf_retrain_index(spark, path, num_centroids="auto")
    retrain_s = round(time.time() - t0, 1)

    retrained = phase("retrained")
    floor_after = bench._calibration(spark)

    doc = {
        "what": (
            "composed retrain->ADC-serve at the 100x shape: q134's "
            "batch ADC read before/after ivf_retrain_index(auto)"
        ),
        "sf_dir": sf_dir,
        "corpus_rows": corpus.count(),
        "n_queries": 50,
        "floor_before_ms": floor_before["spark_action_floor_ms"],
        "floor_after_ms": floor_after["spark_action_floor_ms"],
        "machine": f"load average {os.getloadavg()[0]:.2f} at end",
        "stale_build_s": build_s,
        "retrain_s": retrain_s,
        "retrained_version": info["version"],
        "stale": stale,
        "retrained": retrained,
        "speedup_decimal": round(
            stale["decimal_median_s"] / retrained["decimal_median_s"], 2
        ),
        "speedup_double": round(
            stale["double_median_s"] / retrained["double_median_s"], 2
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({
        "stale_decimal_s": stale["decimal_median_s"],
        "stale_double_s": stale["double_median_s"],
        "retrained_decimal_s": retrained["decimal_median_s"],
        "retrained_double_s": retrained["double_median_s"],
        "stale_recall": stale["adc_recall_at_10"],
        "retrained_recall": retrained["adc_recall_at_10"],
        "K": retrained["num_centroids"],
    }))


if __name__ == "__main__":
    main()
