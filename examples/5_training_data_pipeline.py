"""End-to-end training-data preparation pipeline over the documents
corpus: data card → Unicode normalization → quality + repetition +
LM-score filters → near-dup clustering → canonical dedup → eval-set
decontamination → language temperature re-balancing → per-source
quota → deterministic down-sampling → shard assignment → sequence
packing → token accounting → streaming incremental-ingest dedup.

Every stage is one of the engine's oracle-gated operators; chained they
form the shape of a real 100 TB curation run — filters are narrow
codegen'd maps, dedup shuffles only on band/bucket keys, clustering
touches only docs that appeared in a pair, and both sampling stages are
pure functions of the doc id (re-running the pipeline reproduces the
same corpus bit-for-bit).

Run: python examples/5_training_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tinyflux_spark.operators.dedup import (
    contamination_hits,
    dedup_keep_canonical,
    minhash_lsh_pairs,
)
from tinyflux_spark.operators.sampling import (
    hash_sample,
    shard_assign,
    stratified_quota,
    temperature_sample,
)
from tinyflux_spark.operators.text import (
    bigram_logprob,
    bpe_token_count,
    corpus_profile,
    normalize_text,
    pack_sequences,
    quality_features,
    repetition_stats,
    token_count,
    trigram_logprob,
    unigram_logprob,
)
from tinyflux_spark.schema import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example5")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 0. Data card: the per-(lang, source) profile a curation run
    # publishes before touching anything — one codegen aggregation.
    card = corpus_profile(docs).agg(
        F.sum("n_docs").alias("docs"),
        F.sum("total_tokens").alias("tokens"),
        F.round(F.avg("exact_dup_rate"), 4).alias("avg_dup_rate"),
    ).collect()[0]
    print(
        f"data card (pre):   {card['docs']} docs, "
        f"{card['tokens']} tokens, dup rate {card['avg_dup_rate']}"
    )

    # 0b. Unicode normalization — the multilingual prerequisite: NFC
    # composes decomposed accents, lower+collapse matches the dedup
    # family's own normalization, and the output column feeds dedup AS
    # A COLUMN so nothing re-normalizes downstream. One narrow
    # Arrow-batched projection; ASCII rows take the vectorized fast
    # path.
    docs = normalize_text(
        docs, "text", form="NFC", case="lower", collapse_ws=True,
        out_col="text_nrm",
    )

    # 1. Quality gate: length + repetition thresholds + LM score (the
    # CCNet-style perplexity stand-in: average unigram log-prob under
    # the corpus's own distribution; gibberish scores far below the
    # herd). The row maps are shuffle-free; the LM score adds one
    # vocabulary aggregation + broadcast join.
    quality = quality_features(docs).select("doc_id", "n_chars_calc")
    rep = repetition_stats(docs, "doc_id").select(
        "doc_id", "dup_word_frac", "dup_bigram_frac"
    )
    lm = unigram_logprob(docs).select(
        F.col("id").alias("doc_id"), "avg_logp"
    )
    keep = (
        docs.join(quality, "doc_id")
        .join(rep, "doc_id")
        .join(lm, "doc_id")
        .where(
            (F.col("n_chars_calc") >= 30)
            & (F.col("dup_word_frac") <= 0.95)
            & (F.col("dup_bigram_frac") <= 0.9)
            & (F.col("avg_logp") >= -8.0)
        )
        .select("doc_id", "text", "text_nrm", "lang", "source")
    )
    n1 = keep.count()

    # 1b. Bigram Stupid-Backoff against a reference slice (the step up
    # toward CCNet's KenLM filter): scoring everything against the
    # English corpus makes backoff_frac a language-consistency signal —
    # in-language text hits seen bigrams, the rest falls to the
    # backoff/OOV floor.
    bg = bigram_logprob(docs, ref=docs.where(F.col("lang") == "en"))
    drift = bg.agg(
        F.round(F.avg("backoff_frac"), 4).alias("avg_backoff")
    ).collect()[0]
    tg = trigram_logprob(docs, ref=docs.where(F.col("lang") == "en"))
    drift3 = tg.agg(
        F.round(F.avg("oov_frac"), 4).alias("avg_oov")
    ).collect()[0]
    print(f"bigram LM:         avg backoff_frac {drift['avg_backoff']}")
    print(f"trigram LM:        avg oov_frac {drift3['avg_oov']}")

    # 1c. CCNet-style head/middle/tail LM-quality split (equal-mass
    # buckets over the quantized-score histogram — no global row
    # sort) and DSIR importance weights toward the English target:
    # a production pass keeps head+middle and samples the tail by
    # exp(log_weight).
    from tinyflux_spark.operators.sampling import importance_weights
    from tinyflux_spark.operators.text import perplexity_buckets

    ppl = perplexity_buckets(docs, k=3)
    tail = ppl.where(F.col("ppl_bucket") == 2).count()
    dsir = importance_weights(
        docs, docs.where(F.col("lang") == "en")
    )
    w = dsir.agg(
        F.round(F.avg("log_weight"), 4).alias("avg_w")
    ).collect()[0]
    print(f"ppl buckets:       {tail} tail docs; "
          f"DSIR avg log_weight {w['avg_w']}")

    # 2. Near-dup dedup: MinHash+LSH candidate pairs (band equi-join,
    # sub-quadratic), closed into clusters, one canonical doc kept per
    # cluster.
    # (text_col as a COLUMN = the pre-normalized text, used as-is)
    pairs = minhash_lsh_pairs(
        keep, "doc_id", text_col=F.col("text_nrm"), verify_threshold=0.5
    )
    deduped = dedup_keep_canonical(keep, pairs, "doc_id")
    n2 = deduped.count()

    # 3. Decontamination: drop any training doc sharing a word n-gram
    # with the held-out eval slice (the eval shingle set broadcasts;
    # the corpus is never shuffled on raw n-gram text). Production
    # uses n = 8..13; the synthetic corpus needs n=3 to show hits.
    eval_set = docs.where(F.col("doc_id") % 41 == 0)
    train = deduped.where(F.col("doc_id") % 41 != 0)  # eval never trains
    tainted = contamination_hits(
        train, eval_set, "doc_id", n=3
    ).select(F.col("id").alias("doc_id"))
    clean = train.join(F.broadcast(tainted), "doc_id", "left_anti")
    n3 = clean.count()
    # When the eval suite is itself huge (a full held-out shard, tens
    # of millions of shingles), swap in prefilter="bloom": only the
    # packed-long bitmap words broadcast and survivors verify with a
    # shuffle join — same exact result, no string broadcast.
    #   contamination_hits(train, eval_set, "doc_id", n=3,
    #                      prefilter="bloom", bloom_bits=1 << 28)

    # 4. Mix rebalancing: language-level temperature sampling (pull
    # the mix toward p ∝ n^0.5, smallest language kept whole), then
    # per-source quotas, then a final reproducible down-sample. All
    # three are pure functions of the doc id — the rate/quota tables
    # broadcast, the corpus never shuffles.
    tempered = temperature_sample(clean, "lang", "doc_id", alpha=0.5)
    balanced = stratified_quota(tempered, "source", "doc_id", 15)
    sampled = hash_sample(balanced, "doc_id", rate=0.8, salt="final")
    n4 = sampled.count()

    # 5. Training layout: deterministic shards, then contiguous
    # sequence packing within each shard (concat-and-chunk at a fixed
    # token capacity; the per-shard hash order doubles as the corpus
    # shuffle). One window per shard — shard count is the sort
    # parallelism knob at 100 TB.
    staged = shard_assign(sampled, "doc_id", 4).withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    packed = pack_sequences(staged, "doc_id", "n_tokens", capacity=256)
    layout = packed.groupBy("shard").agg(
        F.countDistinct("pack").alias("packs"),
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("shard")

    # 6. Token accounting for the surviving corpus.
    tokens = sampled.select(
        token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
    ).agg(
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
    ).collect()[0]

    print(f"corpus:            {n0} docs")
    print(f"after quality:     {n1} docs")
    print(f"after dedup:       {n2} docs")
    print(f"after decontam:    {n3} docs")
    print(f"after mix+sample:  {n4} docs")
    for r in layout.collect():
        print(
            f"shard {r['shard']}: {r['docs']} docs → {r['packs']} packs "
            f"of 256 tokens ({r['tokens']} tokens)"
        )
    print(
        f"token budget:      {tokens['ws_tokens']} whitespace / "
        f"{tokens['bpe_tokens']} bpe-ish"
    )

    # 7. Incremental ingest, batch form: near-dup check a NEW shard
    # against the curated corpus without self-joining the corpus (its
    # signatures are reusable every batch), then keyword-rank and
    # compress.
    from tinyflux_spark.operators.dedup import minhash_lsh_join
    from tinyflux_spark.operators.similarity import quantize_embeddings
    from tinyflux_spark.operators.text import bm25_scores

    new_shard = sampled.limit(20).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    incoming_dups = minhash_lsh_join(
        new_shard, sampled, "doc_id", verify_threshold=0.7
    ).count()
    print(f"incremental batch: {incoming_dups} near-dups vs corpus")

    # 7b. The same thing as a CONTINUOUS pipeline: the corpus banded
    # signature table persists once; every micro-batch of the ingest
    # stream band-joins against it and verifies candidates only —
    # per-batch cost tracks batch size, not corpus size. (Swap the
    # file source for Kafka in production; the sink is identical.)
    import tempfile

    from tinyflux_spark.streaming.ingest import (
        point_stream_from_files,
        stream_near_dup_insert,
    )

    corpus = sampled.select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="ex5_stream_")
    new_shard.select("doc_id", "text").repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    stream = point_stream_from_files(
        spark, src, corpus.schema, max_files_per_trigger=1
    )
    res = tempfile.mkdtemp(prefix="ex5_pairs_") + "/pairs"
    q = stream_near_dup_insert(
        stream, corpus, res, "doc_id", verify_threshold=0.7,
        signatures_path=tempfile.mkdtemp(prefix="ex5_sig_") + "/sig",
        checkpoint_dir=tempfile.mkdtemp(prefix="ex5_ck_"),
    )
    q.awaitTermination(240)
    n_stream = spark.read.parquet(res).count()
    print(f"streaming ingest:  {n_stream} near-dups across 3 "
          f"micro-batches (matches the batch join)")
    assert n_stream == incoming_dups

    ranked = bm25_scores(sampled, ["hash", "join", "vector"], "doc_id")
    top = ranked.orderBy(F.desc("score")).limit(3).collect()
    print("bm25 top-3:", [(r["id"], round(r["score"], 3)) for r in top])

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q8 = quantize_embeddings(emb, "embedding", "vec_id")
    clip = q8.agg(F.avg("n_clipped").alias("c")).collect()[0]["c"]
    print(f"int8 quantization: {emb.count()} vectors, "
          f"avg {clip:.2f} clipped dims (4x smaller serving table)")

    # 8. Semantic dedup over the embedding space (SemDedup): cluster
    # with the IVF codebook, mark within-cluster near-identical
    # vectors, keep the exemplar farthest from its centroid.
    from tinyflux_spark.operators.similarity import semantic_dedup

    sd = semantic_dedup(emb, num_clusters=32, tau=0.3)
    print(f"semantic dedup:    {sd.where('is_dup').count()} of "
          f"{sd.count()} vectors flagged semantic duplicates")

    # 9. Compress the vector table for serving with product
    # quantization (64 float32 dims -> 8 int codes), then answer a
    # nearest-neighbor query from the CODES column alone (ADC).
    from tinyflux_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    qvec = emb.limit(1).collect()[0]["embedding"]
    books = pq_train(emb, m=8, ksub=16)
    codes = pq_encode(emb, books)
    nn = pq_adc_topk(codes, books, qvec, k=3).collect()
    print("pq/adc top-3:     ",
          [(r["id"], round(r["adc_dist"], 4)) for r in nn])

    # 10. Corpus statistics without scans of raw values: a 5-gram
    # pruned Stupid-Backoff LM score (the Brants 2007 production
    # config) and KMV-sketched quantiles of document length.
    from tinyflux_spark.operators.sketches import kmv_quantiles
    from tinyflux_spark.operators.text import ngram_backoff_logprob

    lm5 = ngram_backoff_logprob(
        docs, "doc_id", "text", ref=docs.where(F.col("lang") == "en"),
        order=5, alpha=0.4, prune_min_count=2,
    )
    row = lm5.agg(F.avg("avg_logp").alias("a"),
                  F.avg("backoff_frac").alias("b")).collect()[0]
    print(f"5-gram LM:         avg logp {row['a']:.3f}, "
          f"backoff {row['b']:.1%} of positions")
    quants = kmv_quantiles(
        docs.select("doc_id", F.length("text").alias("len")),
        "len", "doc_id", probs=(0.5, 0.9), k=256,
    ).collect()
    print("length quantiles:  ",
          {r["prob"]: r["estimate"] for r in quants})

    # 11. The per-source data card: p50/p90 doc length per source from
    # per-group KMV samples — one shuffle, k rows of state per source,
    # mergeable day-over-day.
    from tinyflux_spark.operators.sketches import kmv_quantiles_by_key

    card = kmv_quantiles_by_key(
        docs.select("doc_id", "source", F.length("text").alias("len")),
        "len", "doc_id", "source", probs=(0.5, 0.9), k=128,
    ).collect()
    by_src = {}
    for r in card:
        by_src.setdefault(r["group"], {})[r["prob"]] = r["estimate"]
    first = sorted(by_src)[0]
    print(f"per-source card:    {len(by_src)} sources; "
          f"{first} p50/p90 = {by_src[first][0.5]:.0f}/"
          f"{by_src[first][0.9]:.0f}")

    # 12. The persisted vector-serving index: IVF-PQ codes written
    # beside the inverted-list partition dirs ONCE; a query is nprobe
    # directory scans of the 8-int codes column (PartitionFilters +
    # column pruning), with rerank=c re-reading just c raw rows for
    # exact results. Codebooks are Lloyd-trained (refine_iters) —
    # deterministic, no seed, same index every build.
    import shutil
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    idx = tempfile.mkdtemp(prefix="tfs_example_ivfpq_")
    try:
        ivf_write_index(
            emb, idx, num_centroids=16,
            pq_m=8, pq_ksub=16, pq_refine_iters=2,
        )
        fast = ivf_pq_topk_indexed(spark, idx, qvec, k=3, nprobe=4)
        exact = ivf_pq_topk_indexed(
            spark, idx, qvec, k=3, nprobe=8, rerank=200
        )
        print("ivf-pq serving:    adc",
              [(r["id"], round(r["adc_dist"], 4)) for r in fast.collect()],
              "| reranked",
              [(r["vec_id"], round(r["cosine_sim"], 4))
               for r in exact.collect()])
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    # --- Index lifecycle: grow without retraining ------------------
    # New vectors fold in at the FROZEN codebooks (assign + encode +
    # append into the probed partition dirs) — a 100 TB index never
    # retrains per ingest batch; rebuild only when the corpus drifts.
    from pyspark.sql import functions as F  # noqa: E402

    from tinyflux_spark.operators.similarity import ivf_append_index

    idx2 = tempfile.mkdtemp(prefix="tfs_example_ivfpq_grow_")
    try:
        old = emb.where(F.col("vec_id") % 3 != 0)
        new = emb.where(F.col("vec_id") % 3 == 0)
        ivf_write_index(old, idx2, num_centroids=16, pq_m=8, pq_ksub=16)
        n = ivf_append_index(new, idx2)
        grown = ivf_pq_topk_indexed(spark, idx2, qvec, k=3, nprobe=4)
        print(f"ivf-pq append:     +{n} vectors at frozen codebooks ->",
              [(r["id"], round(r["adc_dist"], 4))
               for r in grown.collect()])
    finally:
        shutil.rmtree(idx2, ignore_errors=True)

    # --- One-pass data card ----------------------------------------
    # Counts, volume, EXACT length quantiles and EXACT distinct langs
    # per source — one corpus scan, one corpus shuffle.
    from tinyflux_spark.operators.sketches import data_card

    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    card = data_card(raw_docs, "n_chars", "source", "lang",
                     probs=(0.5, 0.9))
    print("data card (first 3 sources):",
          [tuple(r) for r in card.limit(3).collect()])

    # Per-source audit sample and vocabulary drift rows for the card:
    # both are WindowGroupLimit-bounded (at most k rows per source
    # leave each map task — a hot source never funnels one task).
    from tinyflux_spark.operators.sampling import weighted_sample_by_key
    from tinyflux_spark.operators.text import top_tokens_by_key

    audit = weighted_sample_by_key(
        raw_docs, "doc_id", "n_chars", "source", k=3
    )
    vocab = top_tokens_by_key(raw_docs, "source", "text", k=3)
    print("audit sample (first source):",
          [tuple(r) for r in audit.limit(3).collect()])
    print("top tokens (first source):",
          [tuple(r) for r in vocab.limit(3).collect()])


if __name__ == "__main__":
    main()
