"""Measured scaling evidence for the heavy operators.

Runs a fixed panel of gate queries against the real sf0.1 tables (1x)
and gen_scale.py outputs (10x, optionally 100x), timing a FRESH plan
per run (repeated actions on one DataFrame object reuse shuffle map
stages — the round-5 lesson — so re-timing a cached plan measures the
reduce side only). gen_scale's mutations make the expected OUTPUT of
every probed query an exact linear multiple of the base run, so
sec_ratio >> rows_ratio x factor indicts the physical plan.

q95 is probed through the operator (not the gate wrapper) with K
scaled with N — SemDedup's contract is that the codebook grows with
the corpus so the per-cluster pair scan stays bounded; probing it at
fixed K would measure a mis-use.

Usage:
  python tools/scale_probe.py out.json 1=/root/testdata/sf0.1 \
      10=/tmp/scale10 [100=/tmp/scale100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PANEL = [
    # name, and which factors to run it at (100x only for the
    # document family — lineitem at 100x is a 60M-row local build,
    # reserved for q86 which is the probe's join heavy)
    ("q17_dedup_exact", (1, 10, 100)),
    ("q19_minhash_lsh_pairs", (1, 10, 100)),
    ("q23_doc_fingerprint", (1, 10, 100)),
    ("q51_dedup_clusters", (1, 10)),
    ("q60_resample_gapfill", (1, 10, 100)),
    ("q62_top_tokens", (1, 10, 100)),
    ("q80_incremental_dedup_join", (1, 10, 100)),
    ("q82_remove_boilerplate", (1, 10)),
    ("q84_interval_join", (1, 10)),
    ("q86_salted_join", (1, 10, 100)),
    ("q89_excise_duplicate_spans", (1, 10)),
    ("q91_bigram_logprob", (1, 10, 100)),
    ("q94_trigram_logprob", (1, 10, 100)),
    ("q96_ppl_buckets", (1, 10, 100)),
    ("q97_importance_weights", (1, 10, 100)),
    ("q98_kneser_ney", (1, 10, 100)),
    ("q95_semantic_dedup", (1, 10, 100)),
    ("q99_text_semantic_dedup", (1, 10, 100)),
    ("q102_stream_semantic_dedup", (1, 10, 100)),
    ("q103_fivegram_logprob", (1, 10, 100)),
    ("q104_kmv_quantiles", (1, 10, 100)),
    ("q105_pq_adc_topk", (1, 10, 100)),
    ("q106_stream_kmv_distinct", (1, 10, 100)),
    ("q107_ivf_pq_topk", (1, 10, 100)),
    ("q108_weighted_sample", (1, 10, 100)),
    ("q109_ivf_pq_indexed_topk", (1, 10, 100)),
    ("q110_kmv_quantiles_by_key", (1, 10, 100)),
    ("q111_pq_rerank_topk", (1, 10, 100)),
    ("q112_ivf_refined_topk", (1, 10, 100)),
    ("q113_ivf_pq_residual_topk", (1, 10, 100)),
    ("q114_kmv_sketch_merge", (1, 10, 100)),
    ("q115_stream_kmv_quantiles", (1, 10, 100)),
    ("q116_kmv_distinct_by_key", (1, 10, 100)),
    ("q117_ivf_append_serve", (1, 10, 100)),
    ("q118_ivf_pq_residual_indexed", (1, 10, 100)),
    ("q119_data_card", (1, 10, 100)),
    ("q121_weighted_sample_by_key", (1, 10, 100)),
    ("q122_top_tokens_by_key", (1, 10, 100)),
    ("q123_decontaminate_bloom", (1, 10, 100)),
    ("q125_stream_self_dedup", (1, 10, 100)),
    ("q126_ivf_batch_indexed", (1, 10, 100)),
    ("q127_holt_last", (1, 10, 100)),
    ("q128_srp_batch_indexed", (1, 10, 100)),
    ("q130_srp_append_serve", (1, 10, 100)),
    ("q131_index_recall_probe", (1, 10, 100)),
    ("q132_holt_winters_last", (1, 10, 100)),
    # round-11 rows: the batch ADC read (decimal gate mode — the
    # dtype A/B lives in ADC_DTYPE_AB_r11*.json), the full
    # build->append->retrain->serve lifecycle's SERVE read, and the
    # damped forecast family member.
    ("q134_ivf_pq_batch_indexed", (1, 10)),
    ("q135_ivf_retrain_serve", (1, 10, 100)),
    ("q136_holt_winters_damped", (1, 10, 100)),
    # auto-K variants of the batch ANN reads (VERDICT r9 ask #4): the
    # index is built per scale dir with num_centroids/num_planes
    # "auto", so per-query candidate volume should hold ~sqrt(N)
    # (IVF) / ~flat (SRP) instead of linear. Index build happens on
    # the warmup call (cached per dir); the timed run is the serve.
    ("q126_ivf_batch_indexed_autoK", (1, 10, 100)),
    ("q128_srp_batch_indexed_autoK", (1, 10, 100)),
]

# persisted auto-K index paths built by the probe itself, keyed by
# (panel name, sf_dir) — probe_index_recall reads these too.
AUTO_INDEX_PATHS: dict = {}
AUTO_RECALL = {
    "q126_ivf_batch_indexed_autoK",
    "q128_srp_batch_indexed_autoK",
}

# Persisted-index queries: after the timed run, measure SAMPLED
# recall@10 with operators.similarity.index_recall_probe over the very
# index the query served from (the entry module caches its path) — the
# retrain-on-drift number VERDICT r9 asked to operationalize. Maps
# query name -> the entry module's _IVF_INDEX_CACHE key.
PROBE_INDEXED = {
    "q109_ivf_pq_indexed_topk": lambda sf: (sf, "pq"),
    "q117_ivf_append_serve": lambda sf: (sf, "pq_append"),
    "q118_ivf_pq_residual_indexed": lambda sf: (sf, "pq_residual"),
    "q126_ivf_batch_indexed": lambda sf: sf + "#full16",
    "q128_srp_batch_indexed": lambda sf: sf + "#srp4",
    "q130_srp_append_serve": lambda sf: (sf, "srp_append_lifecycle"),
    "q135_ivf_retrain_serve": lambda sf: (sf, "retrain_lifecycle"),
}


def probe_index_recall(spark, sf_dir, name):
    """Mean sampled recall@10 of the persisted index the query just
    served from, or None if the index path is not cached."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import index_recall_probe

    if name in PROBE_INDEXED:
        key = PROBE_INDEXED[name](sf_dir)
        path = em._IVF_INDEX_CACHE.get(spark, {}).get(key)
    else:
        path = AUTO_INDEX_PATHS.get((name, sf_dir))
    if path is None:
        return None

    # Fixed 50-query deterministic sample from the index itself at
    # EVERY scale (the operator's own contract: probe tens of
    # queries, not the corpus) — the r10 harness scaled the sample
    # with the corpus and manufactured a |queries|x|corpus| blow-up
    # (VERDICT r10 #4).
    def mean_recall(scoring):
        return round(float(
            index_recall_probe(
                spark, path, k=10, nprobe=4, multiprobe=1,
                scoring=scoring, sample_n=50,
            )
            .agg(F.avg("recall"))
            .first()[0]
        ), 3)

    out = {"probe_recall_at_10": mean_recall("exact")}
    if os.path.exists(os.path.join(path, "pq_books.json")):
        # the FULL codes-only stack: where the residual-drift rule
        # shows up as a number (pruning recall alone can stay 1.0
        # while the ADC ranking degrades under codebook drift)
        out["probe_adc_recall_at_10"] = mean_recall("adc")
    return out

# ANN family: besides sec/rows, record recall@10 against the exact
# cosine top-10 (q24's ranking) on the SAME scale dir — latency that
# holds at 100x is worthless if approximation quality falls off a
# cliff there (VERDICT r8 ask #6). The exact baseline is computed
# once per dir and cached.
ANN_RECALL = {
    "q105_pq_adc_topk",
    "q107_ivf_pq_topk",
    "q109_ivf_pq_indexed_topk",
    "q111_pq_rerank_topk",
    "q112_ivf_refined_topk",
    "q113_ivf_pq_residual_topk",
    "q117_ivf_append_serve",
    "q118_ivf_pq_residual_indexed",
}

_EXACT_TOP10 = {}


def exact_top10_ids(spark, sf_dir):
    """Exact cosine top-10 ids for the standard probe query (vec_id 0
    against the rest), q24's convention — cached per scale dir."""
    if sf_dir not in _EXACT_TOP10:
        from pyspark.sql import functions as F

        from tinyflux_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        )
        qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
        rows = cosine_topk(
            emb.where(F.col("vec_id") != 0), list(qvec), k=10
        ).collect()
        _EXACT_TOP10[sf_dir] = {int(r[0]) for r in rows}
    return _EXACT_TOP10[sf_dir]

# Queries whose probe builder takes the scale factor (K ~ sqrt(N) —
# SemDedup's contract; probing at fixed K would measure a mis-use).
SCALED = {
    "q95_semantic_dedup",
    "q99_text_semantic_dedup",
    "q102_stream_semantic_dedup",
}


def probe_fn(name):
    import __spark_entry__ as em

    if name in ("q126_ivf_batch_indexed_autoK",
                "q128_srp_batch_indexed_autoK"):
        ivf = name.startswith("q126")

        def auto_indexed(spark, sf_dir):
            import tempfile

            from pyspark.sql import functions as F

            from tinyflux_spark.operators.similarity import (
                ivf_topk_batch_indexed,
                ivf_write_index,
                srp_topk_batch_indexed,
                srp_write_index,
            )

            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            key = (name, sf_dir)
            if key not in AUTO_INDEX_PATHS:
                path = tempfile.mkdtemp(prefix="tfs_probe_auto_")
                if ivf:
                    ivf_write_index(emb, path, num_centroids="auto")
                else:
                    srp_write_index(
                        emb, path, num_planes="auto",
                        target_bucket_rows=1024,
                    )
                AUTO_INDEX_PATHS[key] = path
            queries = emb.where(F.col("vec_id") % 100 == 0)
            if ivf:
                return ivf_topk_batch_indexed(
                    spark, AUTO_INDEX_PATHS[key], queries, k=5, nprobe=4
                )
            return srp_topk_batch_indexed(
                spark, AUTO_INDEX_PATHS[key], queries, k=5, multiprobe=1
            )

        return auto_indexed

    if name == "q131_index_recall_probe":

        def q131_fixed_sample(spark, sf_dir):
            # The operator's documented contract at scale: a FIXED
            # 50-query deterministic (md5) sample from the index's
            # own rows at every corpus size, so this row grows
            # ~linearly in |corpus| (the exact arm) instead of the
            # |queries|x|corpus| blow-up the r10 harness measured by
            # scaling the sample with the corpus (VERDICT r10 #4).
            # The registered q131 keeps its %100 sample — that is
            # what its sf0.01 oracle replays; the probe row documents
            # |queries|=50 via this override.
            import tempfile

            from tinyflux_spark.operators.similarity import (
                index_recall_probe,
                srp_write_index,
            )

            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            per_session = em._IVF_INDEX_CACHE.setdefault(spark, {})
            key = sf_dir + "#srp4"
            if key not in per_session:
                path = tempfile.mkdtemp(prefix="tfs_srp_b_")
                srp_write_index(emb, path, num_planes=4)
                per_session[key] = path
            return index_recall_probe(
                spark, per_session[key], k=5, multiprobe=1,
                sample_n=50,
            )

        return q131_fixed_sample

    if name == "q95_semantic_dedup":

        def q95_scaled(spark, sf_dir, _factor):
            from tinyflux_spark.operators.similarity import semantic_dedup

            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            # K ~ sqrt(N): assignment costs N*K folds and the pair
            # scan N^2/K, so sqrt-scaling K minimizes the sum —
            # semantic dedup is intrinsically an N^1.5 operator
            # (SemDedup runs it as a scheduled batch job, not a
            # per-query scan).
            return semantic_dedup(
                emb, num_clusters=int(32 * _factor**0.5), tau=0.3
            )

        return q95_scaled

    if name == "q99_text_semantic_dedup":

        def q99_scaled(spark, sf_dir, _factor):
            from tinyflux_spark.operators.similarity import semantic_dedup
            from tinyflux_spark.operators.text import embed_bow

            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            emb = embed_bow(
                docs, "doc_id", "text", dim=64
            ).localCheckpoint()
            return semantic_dedup(
                emb, "id", "embedding",
                num_clusters=int(16 * _factor**0.5), tau=0.9,
            )

        return q99_scaled

    if name == "q102_stream_semantic_dedup":

        def q102_scaled(spark, sf_dir, _factor):
            # The gate wrapper end to end (source shard write, state
            # build, 3 micro-batches, result pin) with K ~ sqrt(N);
            # timing includes state build — the honest per-deployment
            # cost, since the probe's question is "does the whole
            # streaming path survive 100x", not just the sink.
            import shutil
            import tempfile

            from pyspark.sql import functions as F
            from tinyflux_spark.streaming import ingest as st

            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            shard = docs.where(F.col("doc_id") % 5 == 0)
            corpus = docs.where(F.col("doc_id") % 5 != 0)
            root = tempfile.mkdtemp(prefix="tfs_probe_q102_")
            try:
                src = root + "/src"
                shard.repartition(3).write.mode("overwrite").parquet(src)
                stream = st.point_stream_from_files(
                    spark, src, docs.schema, max_files_per_trigger=1
                )
                res = root + "/pairs"
                q = st.stream_semantic_dedup_insert(
                    stream, corpus, res, "doc_id",
                    embed_dim=64,
                    num_clusters=int(16 * _factor**0.5),
                    tau=0.9,
                    state_path=root + "/state",
                    checkpoint_dir=root + "/ck",
                )
                if not q.awaitTermination(1800):
                    q.stop()
                    raise TimeoutError("q102 probe stream timed out")
                if q.exception() is not None:
                    raise q.exception()
                return spark.read.parquet(res).select(
                    "id_left", "id_right", "cosine"
                ).localCheckpoint()
            finally:
                shutil.rmtree(root, ignore_errors=True)

        return q102_scaled

    return em.queries()[name]


def run(out_path: str, dirs: dict[int, str], only=None) -> None:
    """only=: probe just those query names and MERGE their rows into
    an existing out_path document (incremental panel extension —
    re-probing 30+ multi-minute queries to add three rows would burn
    an hour re-measuring numbers that have not changed)."""
    from tinyflux_spark.schema import get_spark

    spark = get_spark()
    results = {}
    for name, factors in PANEL:
        if only and name not in only:
            continue
        fn = probe_fn(name)
        entry = {}
        for f in sorted(factors):
            if f not in dirs:
                continue
            sf_dir = dirs[f]

            def build():
                if name in SCALED:
                    return fn(spark, sf_dir, f)
                return fn(spark, sf_dir)

            # The streaming probes run a whole fresh stream (state
            # build + micro-batches) per build — warming them would
            # double a multi-minute 100x run to shave ~10ms of JIT
            # noise.
            if name not in (
                "q102_stream_semantic_dedup",
                "q106_stream_kmv_distinct",
                "q115_stream_kmv_quantiles",
            ):
                build().write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            df = build()  # fresh plan: the timed run owns its shuffles
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            entry[str(f)] = {
                "sec": round(sec, 3),
                "rows": df.count(),
            }
            if name in ANN_RECALL:
                got = {int(r[0]) for r in df.collect()}
                exact = exact_top10_ids(spark, sf_dir)
                entry[str(f)]["recall_at_10"] = round(
                    len(got & exact) / max(len(exact), 1), 2
                )
            if name in PROBE_INDEXED or name in AUTO_RECALL:
                pr = probe_index_recall(spark, sf_dir, name)
                if pr is not None:
                    entry[str(f)].update(pr)
            print(f"{name} @{f}x: {sec:.2f}s "
                  f"{entry[str(f)]['rows']} rows"
                  + (
                      f" recall@10={entry[str(f)]['recall_at_10']}"
                      if name in ANN_RECALL
                      else ""
                  ),
                  flush=True)
        fs = sorted(int(k) for k in entry)
        for lo, hi in zip(fs, fs[1:]):
            step = hi // lo
            entry[f"sec_ratio_{step}x_from_{lo}"] = round(
                entry[str(hi)]["sec"] / max(entry[str(lo)]["sec"], 1e-9), 2
            )
            entry[f"rows_ratio_{step}x_from_{lo}"] = round(
                entry[str(hi)]["rows"]
                / max(entry[str(lo)]["rows"], 1), 2
            )
        results[name] = entry
    doc = {
        "dirs": {str(k): v for k, v in dirs.items()},
        "note": (
            "fresh plan per timed run; gen_scale replicas are "
            "vocabulary/key-disjoint so expected output scales "
            "linearly; q95 probed with K scaled with N (SemDedup's "
            "contract); ANN rows carry recall_at_10 vs the exact "
            "cosine top-10 on the same dir; persisted-index rows "
            "also carry probe_recall_at_10 (mean sampled recall via "
            "index_recall_probe over the served index)"
        ),
        "queries": results,
    }
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        prev["queries"].update(results)
        prev["dirs"] = doc["dirs"]
        doc = prev
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    out = sys.argv[1]
    dirs = {}
    only = set()
    for arg in sys.argv[2:]:
        if arg.startswith("--only="):
            only = set(arg.split("=", 1)[1].split(","))
            continue
        k, v = arg.split("=", 1)
        dirs[int(k)] = v
    run(out, dirs, only=only or None)
