"""Structured Streaming ingest and streaming-operator tests.

Finite file-source streams driven synchronously (availableNow +
awaitTermination) — the local smoke protocol for streaming plans.
"""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from tinyflux_spark import FieldQuery, Point, TinyFluxSpark
from tinyflux_spark.schema import POINT_SCHEMA, points_to_df
from tinyflux_spark.storages import ParquetStorage
from tinyflux_spark.streaming import ingest

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def mk_source(spark, tmp_path, n=50):
    pts = [
        Point(
            time=T0 + timedelta(minutes=7 * i),
            measurement="m1" if i % 2 else "m2",
            tags={"s": str(i % 3)},
            fields={"v": float(i)},
        )
        for i in range(n)
    ]
    src = str(tmp_path / "src")
    points_to_df(spark, pts).write.mode("overwrite").parquet(src)
    return src, pts


def test_stream_insert_into_parquet_storage(spark, tmp_path):
    src, pts = mk_source(spark, tmp_path)
    store = ParquetStorage(str(tmp_path / "db"), spark)
    stream = ingest.point_stream_from_files(spark, src, POINT_SCHEMA)
    q = ingest.stream_insert(
        store,
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    assert q.exception() is None

    db = TinyFluxSpark(storage=store, spark=spark)
    assert len(db) == 50
    # engine queries work on stream-ingested data
    assert db.count(FieldQuery().v >= 25) == 25
    # insertion-order APIs survive the stream boundary
    got = db.get(FieldQuery().v >= 10)
    assert got is not None and got.fields["v"] >= 10.0


def test_stream_insert_auto_compaction(spark, tmp_path):
    """N micro-batches with compact_every_n_batches leave ≤1 file per
    touched (measurement, pdate) directory — the fragmentation the
    reference's MQTT append loop accumulates unboundedly."""
    # one source file per micro-batch → maxFilesPerTrigger=1 gives one
    # batch per file
    src = str(tmp_path / "src")
    n_batches = 4
    for b in range(n_batches):
        pts = [
            Point(
                time=T0 + timedelta(minutes=b * 10 + j),
                measurement="m1" if j % 2 else "m2",
                fields={"v": float(b * 10 + j)},
            )
            for j in range(5)
        ]
        points_to_df(spark, pts).coalesce(1).write.mode("append").parquet(src)
    store = ParquetStorage(str(tmp_path / "db"), spark)
    stream = ingest.point_stream_from_files(
        spark, src, POINT_SCHEMA, max_files_per_trigger=1
    )
    q = ingest.stream_insert(
        store,
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        compact_every_n_batches=n_batches,
    )
    q.awaitTermination(300)
    assert q.exception() is None

    db = TinyFluxSpark(storage=store, spark=spark)
    assert len(db) == n_batches * 5
    # ≤1 parquet file per (measurement, pdate) directory after the
    # final compaction (all rows share one pdate per measurement here,
    # so 1 file per measurement)
    import os

    for root, _dirs, files in os.walk(store.data_dir):
        parts = [f for f in files if f.endswith(".parquet")]
        if parts:
            assert len(parts) == 1, (root, parts)
    # insertion order survives compaction
    vals = [p.fields["v"] for p in db.all(sorted=False)]
    assert vals == sorted(vals)


def test_windowed_rollup_matches_batch(spark, tmp_path):
    src, pts = mk_source(spark, tmp_path)
    stream = ingest.point_stream_from_files(spark, src, POINT_SCHEMA)
    rollup = ingest.windowed_rollup(
        stream,
        "time",
        "1 hour",
        [F.count("*").alias("n"), F.sum(F.col("fields")["v"]).alias("sv")],
        group_cols=["measurement"],
    )
    ingest.run_to_memory(rollup, "rollup_out")
    got = {
        (r["window"]["start"], r["measurement"]): (r["n"], r["sv"])
        for r in spark.table("rollup_out").collect()
    }
    batch = (
        points_to_df(spark, pts)
        .groupBy(F.window("time", "1 hour").alias("w"), "measurement")
        .agg(F.count("*").alias("n"), F.sum(F.col("fields")["v"]).alias("sv"))
        .collect()
    )
    want = {
        (r["w"]["start"], r["measurement"]): (r["n"], r["sv"]) for r in batch
    }
    assert got == want


def test_stream_dedup(spark, tmp_path):
    pts = [
        Point(time=T0, measurement="m", tags={"s": "1"}, fields={"v": 1.0}),
        Point(time=T0, measurement="m", tags={"s": "1"}, fields={"v": 1.0}),
        Point(time=T0 + timedelta(minutes=1), measurement="m",
              tags={"s": "1"}, fields={"v": 2.0}),
    ]
    src = str(tmp_path / "dup_src")
    points_to_df(spark, pts).write.mode("overwrite").parquet(src)
    stream = ingest.point_stream_from_files(spark, src, POINT_SCHEMA)
    deduped = ingest.stream_dedup(stream, ["measurement"], "time")
    ingest.run_to_memory(deduped, "dedup_out", output_mode="append")
    assert spark.table("dedup_out").count() == 2


def test_stream_insert_with_watermark_runs(spark, tmp_path):
    src, _ = mk_source(spark, tmp_path, n=20)
    store = ParquetStorage(str(tmp_path / "db2"), spark)
    stream = ingest.point_stream_from_files(spark, src, POINT_SCHEMA)
    q = ingest.stream_insert(
        store,
        stream,
        watermark="30 minutes",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(300)
    assert q.exception() is None
    assert store.read().count() == 20


def _py_ewma(vals, alpha=0.3):
    ew = None
    out = []
    for v in vals:
        ew = v if ew is None else alpha * v + (1 - alpha) * ew
        out.append(ew)
    return out


def test_stateful_ewma_matches_python_oracle(spark, tmp_path):
    rows = [
        (str(k), T0 + timedelta(minutes=i), float(k * 100 + i * 3 % 17))
        for k in range(2)
        for i in range(20)
    ]
    src = str(tmp_path / "ewmasrc")
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    df.write.mode("overwrite").parquet(src)
    stream = ingest.point_stream_from_files(
        spark, src, df.schema, fmt="parquet"
    )
    out = ingest.stateful_ewma(stream, "key", "time", "value", alpha=0.3)
    ingest.run_to_memory(out, "ewma_out", output_mode="append")
    got = spark.table("ewma_out").orderBy("key", "time").collect()
    assert len(got) == 40
    for k in ("0", "1"):
        series = [r["value"] for r in got if r["key"] == k]
        expect = _py_ewma(series)
        actual = [r["ewma"] for r in got if r["key"] == k]
        assert actual == pytest.approx(expect)
        assert all(
            r["dev"] == pytest.approx(abs(r["value"] - r["ewma"]))
            for r in got
            if r["key"] == k
        )


def test_batch_ewma_variants_agree(spark):
    from tinyflux_spark.operators import aggregates

    rows = [
        (str(k), T0 + timedelta(minutes=i), float((i * 7 + k) % 23))
        for k in range(3)
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    run = aggregates.ewma_running(df, "key", "time", "value", alpha=0.3)
    last = aggregates.ewma_last(df, "key", "time", "value", alpha=0.3)
    # Boundedness guard: a key whose series exceeds max_series_rows
    # fails with a pointer to the scalable variants.
    import pytest

    with pytest.raises(Exception) as ei:
        aggregates.ewma_last(
            df, "key", "time", "value", alpha=0.3, max_series_rows=2
        ).collect()
    assert "max_series_rows" in str(ei.value)
    run_final = {
        r["key"]: r["ewma"]
        for r in run.orderBy("key", "time")
        .groupBy("key")
        .agg(F.last("ewma").alias("ewma"))
        .collect()
    }
    for r in last.collect():
        series = [v for kk, _, v in rows if kk == r["key"]]
        assert r["ewma"] == pytest.approx(_py_ewma(series)[-1])
        assert run_final[r["key"]] == pytest.approx(r["ewma"])


def test_from_table_maps_streaming_source(spark, tmp_path):
    """The ingest connector is a narrow projection, so it works
    unchanged on a streaming DataFrame: raw tabular files land as
    canonical points through readStream -> from_table -> stream_insert."""
    from tinyflux_spark.sources import from_table

    raw = spark.createDataFrame(
        [
            (T0 + timedelta(minutes=i), "nyc" if i % 2 else "sfo",
             float(20 + i), i)
            for i in range(20)
        ],
        ["when", "city", "temp", "seq_hint"],
    )
    src = str(tmp_path / "raw_src")
    raw.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(raw.schema).parquet(src)
    pts = from_table(
        stream, "when", measurement="weather",
        tag_cols=["city"], field_cols=["temp"],
    )
    assert pts.isStreaming

    store = ParquetStorage(str(tmp_path / "store"), spark)
    q = ingest.stream_insert(
        store, pts, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    db = TinyFluxSpark(storage=store, spark=spark)
    assert len(db) == 20
    got = db.search(FieldQuery().temp >= 30)
    assert len(got) == 10 and all(p.measurement == "weather" for p in got)
    assert {p.tags["city"] for p in got} == {"nyc", "sfo"}


def test_stream_rollup_insert_matches_batch_downsample(spark, tmp_path):
    """The continuous query (stream_rollup_insert) and the batch
    retention pass (db.downsample) must agree: streaming the same raw
    points through hourly rollup produces the same aggregated point set
    a batch downsample of those points produces."""
    src, pts = mk_source(spark, tmp_path, n=40)
    stream = ingest.point_stream_from_files(spark, src, POINT_SCHEMA)

    target = ParquetStorage(str(tmp_path / "rollup_store"), spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = ingest.stream_rollup_insert(
            target, stream, "1 hour",
            watermark="0 seconds",
            checkpoint_dir=str(tmp_path / "ck_roll"),
        )
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got_db = TinyFluxSpark(storage=target, spark=spark)
    got = {
        (p.time, p.measurement, tuple(sorted(p.tags.items()))): p.fields
        for p in got_db.all()
    }

    # batch reference: same points, batch downsample with a cutoff past
    # everything (so the whole set rolls up)
    batch_db = TinyFluxSpark(str(tmp_path / "batch_store"), spark=spark)
    batch_db.insert_multiple(pts)
    batch_db.downsample(T0 + timedelta(days=30), interval_sec=3600)
    want = {
        (p.time, p.measurement, tuple(sorted(p.tags.items()))): p.fields
        for p in batch_db.all()
    }
    # append mode only emits windows whose END is at or below the final
    # watermark (= max event time here): the trailing partial hour never
    # finalizes. On the finalized horizon the two paths must agree
    # EXACTLY.
    max_t = max(p.time for p in pts)
    horizon = {
        k: v for k, v in want.items()
        if k[0] + timedelta(hours=1) <= max_t
    }
    finalized_got = {
        k: v for k, v in got.items()
        if k[0] + timedelta(hours=1) <= max_t
    }
    assert len(horizon) > 3
    assert finalized_got == horizon


def test_out_of_order_policies_match_batch_equivalents(spark, tmp_path):
    """Disorder stress: a finite source whose third micro-batch is LATE
    beyond the watermark. The two policies the engine offers must both
    match their batch equivalents (the reference accepts out-of-order
    appends and merely invalidates its index — SURVEY §2.2; the
    watermark policy is the scale extension):

    * accept-all (stream_insert, no watermark): every row lands, in
      ARRIVAL order (insertion-order APIs see arrival, not event time),
      equal to a batch insert of the same rows.
    * watermark drop (windowed_rollup + 30 min watermark, append mode):
      the closed window's aggregate equals the batch aggregate over the
      on-time rows only — the late row is dropped from state, and the
      accept-all batch answer over ALL rows provably differs.
    """
    import glob
    import os

    src = str(tmp_path / "ooo_src")
    batches = [
        # b1: on-time rows 10:00..10:30
        [Point(time=T0 + timedelta(hours=10, minutes=10 * j),
               measurement="m", fields={"v": float(j)})
         for j in range(4)],
        # b2: 12:00 — starts advancing the watermark past the
        # 10:00-11:00 window's end
        [Point(time=T0 + timedelta(hours=12), measurement="m",
               fields={"v": 100.0})],
        # b3: 20:00 — a second advancing batch. Spark filters a batch's
        # late input against the watermark computed BEFORE that batch
        # (the drop guarantee is one-sided: data later than the
        # watermark "may or may not" be dropped at the boundary), so
        # the late row must arrive two batches after the event time
        # that outdates it to be deterministically dropped.
        [Point(time=T0 + timedelta(hours=20), measurement="m",
               fields={"v": 200.0})],
        # b4: LATE row inside the long-closed 10:00 window
        [Point(time=T0 + timedelta(hours=10, minutes=15),
               measurement="m", fields={"v": 999.0})],
        # b5: on-time tail so the post-late trigger runs state eviction
        [Point(time=T0 + timedelta(hours=21), measurement="m",
               fields={"v": 201.0})],
    ]
    stamp = 1_700_000_000
    seen: set = set()
    for pts in batches:
        points_to_df(spark, pts).coalesce(1).write.mode("append").parquet(src)
        for f in sorted(glob.glob(f"{src}/*.parquet")):
            if f not in seen:
                os.utime(f, (stamp, stamp))
                seen.add(f)
                stamp += 100  # strictly increasing arrival order

    all_pts = [p for b in batches for p in b]

    # -- policy 1: accept-all ingest (reference semantics) --
    store = ParquetStorage(str(tmp_path / "ooo_db"), spark)
    stream = ingest.point_stream_from_files(
        spark, src, POINT_SCHEMA, max_files_per_trigger=1
    )
    q = ingest.stream_insert(
        store, stream, checkpoint_dir=str(tmp_path / "ooo_ckpt")
    )
    q.awaitTermination(300)
    assert q.exception() is None
    db = TinyFluxSpark(storage=store, spark=spark)
    assert len(db) == len(all_pts)
    # arrival order preserved: the late row sits AFTER the 12:00 row
    arrival_vals = [p.fields["v"] for p in db.all(sorted=False)]
    assert arrival_vals == [p.fields["v"] for p in all_pts]
    # batch equivalent: same point set
    assert sorted(arrival_vals) == sorted(
        p.fields["v"] for p in all_pts
    )

    # -- policy 2: watermark drop in the windowed rollup --
    stream2 = ingest.point_stream_from_files(
        spark, src, POINT_SCHEMA, max_files_per_trigger=1
    )
    rollup = ingest.windowed_rollup(
        stream2,
        "time",
        "1 hour",
        [F.count("*").alias("n"), F.sum(F.col("fields")["v"]).alias("sv")],
        group_cols=["measurement"],
        watermark="30 minutes",
    )
    ingest.run_to_memory(rollup, "ooo_rollup", output_mode="append")
    got = {
        r["window"]["start"].replace(tzinfo=timezone.utc): (r["n"], r["sv"])
        for r in spark.table("ooo_rollup").collect()
    }
    w10 = T0 + timedelta(hours=10)
    assert w10 in got, got
    on_time = [p for p in batches[0]]
    want_n = len(on_time)
    want_sv = sum(p.fields["v"] for p in on_time)
    # matches the batch aggregate over on-time rows only...
    assert got[w10] == (want_n, want_sv)
    # ...and provably differs from the accept-all batch answer
    accept_all_sv = want_sv + 999.0
    assert got[w10][1] != accept_all_sv


def test_stateless_curation_operators_compose_with_streams(spark, tmp_path):
    """The narrow text-curation operators (quality_filter, scrub_text,
    lang_id) are pure per-row maps, so they must run unchanged on a
    readStream source and emit exactly the batch results — the
    operator-compositionality contract that lets one pipeline definition
    serve both the backfill (batch) and the live feed (stream)."""
    from pyspark.sql import types as T

    from tinyflux_spark.operators.text import (
        lang_id,
        quality_filter,
        scrub_text,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 4),
        (1, "a b a b a b a b a b a b a b a b a b a b a b a b"),
        (2, "contact me at alice@example.com or 555-123-4567 now " * 3),
        (3, "El rápido zorro marrón salta sobre el perro perezoso " * 3),
    ]
    src = str(tmp_path / "curation_src")
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(src)

    def pipeline(d):
        qf = quality_filter(
            d, "doc_id", min_tokens=5, max_tokens=200,
        ).select("doc_id", "keep", "reasons")
        sc = scrub_text(d, "doc_id").select("doc_id", "scrubbed")
        li = d.select("doc_id", lang_id("text").alias("lang_guess"))
        return qf.join(sc, "doc_id").join(li, "doc_id")

    batch = {
        r["doc_id"]: (r["keep"], tuple(r["reasons"]), r["scrubbed"],
                      r["lang_guess"])
        for r in pipeline(df).collect()
    }

    stream = spark.readStream.schema(schema).parquet(src)
    # stateless ops need no watermark/output-mode ceremony: run the
    # same pipeline via foreachBatch over the finite stream
    got = {}

    def sink(bdf, _epoch):
        for r in pipeline(bdf).collect():
            got[r["doc_id"]] = (
                r["keep"], tuple(r["reasons"]), r["scrubbed"],
                r["lang_guess"],
            )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "curation_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    assert got == batch and len(got) == 4


def test_stream_near_dup_matches_batch_join(spark, tmp_path):
    """stream_near_dup_insert over 3 micro-batches (maxFilesPerTrigger=1)
    equals the one-shot batch minhash_lsh_join on the same shard/corpus
    split — including signature persistence: the corpus banded table is
    built once, written to signatures_path, and a SECOND stream run
    must reuse the persisted table (not rebuild it)."""
    import os

    from pyspark.sql import types as T

    from tinyflux_spark.operators.dedup import minhash_lsh_join

    base = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy cat today"),
        (2, "completely different text about distributed analytics"),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "another unrelated document mentioning spark plans only"),
        (5, "completely different text about distributed analytics yes"),
    ]
    docs = spark.createDataFrame(base, ["doc_id", "text"])
    shard = docs.where(F.col("doc_id") < 3)
    corpus = docs.where(F.col("doc_id") >= 3)

    src = str(tmp_path / "shard_src")
    # one file per shard doc -> 3 micro-batches
    for i in range(3):
        shard.where(F.col("doc_id") == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = ingest.point_stream_from_files(
        spark, src, schema, max_files_per_trigger=1
    )
    res = str(tmp_path / "pairs")
    sig = str(tmp_path / "sigs")
    q = ingest.stream_near_dup_insert(
        stream, corpus, res, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
        signatures_path=sig,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    assert q.exception() is None

    def canon(df):
        return sorted(
            (r["id_left"], r["id_right"], round(r["jaccard"], 9))
            for r in df.collect()
        )

    got = canon(spark.read.parquet(res))
    want = canon(minhash_lsh_join(
        shard, corpus, "doc_id", num_hashes=12, bands=4,
        verify_threshold=0.5,
    ))
    assert got == want and len(got) >= 2  # 0/1<->3 dups, 2<->5 near-dup
    # the persisted signature table exists and a second run reuses it:
    # poison-pill check — replace the corpus with one that WOULD yield
    # different signatures; the run must still use the persisted table
    sig_mtime = max(
        os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
    )
    stream2 = ingest.point_stream_from_files(
        spark, src, schema, max_files_per_trigger=1
    )
    res2 = str(tmp_path / "pairs2")
    q2 = ingest.stream_near_dup_insert(
        stream2, corpus, res2, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
        signatures_path=sig,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(300)
    assert q2.exception() is None
    assert canon(spark.read.parquet(res2)) == want
    assert max(
        os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
    ) == sig_mtime  # not rebuilt


def test_stream_semantic_dedup_matches_batch(spark, tmp_path):
    """Streaming semantic dedup == the batch equivalent computed
    directly (same codebook, same assignment, same threshold), and the
    persisted codebook/assignment state is reused across runs."""
    import os

    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import (
        ivf_centroids,
        semantic_assign,
    )
    from tinyflux_spark.operators.text import embed_bow
    from tinyflux_spark.streaming import ingest

    texts = {
        0: "alpha beta gamma delta",
        1: "alpha beta gamma delta",      # dup of 0
        2: "epsilon zeta eta theta",
        3: "alpha beta gamma delta eps",  # near 0/1
        4: "iota kappa lambda mu",
        5: "epsilon zeta eta theta",      # dup of 2
        6: "nu xi omicron pi",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    schema = ("doc_id: long, text: string, lang: string, "
              "source: string, n_chars: long")
    docs = spark.createDataFrame(rows, schema)
    shard = docs.where(F.col("doc_id") % 2 == 0)     # 0,2,4,6 stream
    corpus = docs.where(F.col("doc_id") % 2 != 0)    # 1,3,5 corpus

    src = str(tmp_path / "src")
    shard.repartition(2).write.parquet(src)
    res = str(tmp_path / "pairs")
    state = str(tmp_path / "state")
    stream = ingest.point_stream_from_files(
        spark, src, docs.schema, max_files_per_trigger=1
    )
    q = ingest.stream_semantic_dedup_insert(
        stream, corpus, res, "doc_id",
        embed_dim=16, num_clusters=2, tau=0.9,
        state_path=state,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        (r["id_left"], r["id_right"], r["cosine"])
        for r in spark.read.parquet(res).collect()
    }

    # batch equivalent with the same frozen state
    cvecs = embed_bow(corpus, "doc_id", "text", dim=16)
    cents = ivf_centroids(cvecs, "id", "embedding", 2)
    casg = semantic_assign(cvecs, cents, "id", "embedding")
    sasg = semantic_assign(
        embed_bow(shard, "doc_id", "text", dim=16),
        cents, "id", "embedding",
    )
    dot = F.aggregate(
        F.zip_with("_ul", "_ur", lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    want = {
        (r["id_left"], r["id_right"], r["cosine"])
        for r in (
            sasg.select(F.col("id").alias("id_left"),
                        F.col("cluster").alias("_cl"),
                        F.col("_u").alias("_ul"))
            .join(casg.select(F.col("id").alias("id_right"),
                              F.col("cluster").alias("_cl"),
                              F.col("_u").alias("_ur")), "_cl")
            .select("id_left", "id_right", F.round(dot, 6).alias("cosine"))
            .where(F.col("cosine") >= 0.9)
        ).collect()
    }
    assert got == want
    assert (0, 1, 1.0) in got and (2, 5, 1.0) in got
    # second run reuses the persisted state (mtime unchanged)
    mt = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(state) for f in files
    )
    stream2 = ingest.point_stream_from_files(
        spark, src, docs.schema, max_files_per_trigger=1
    )
    q2 = ingest.stream_semantic_dedup_insert(
        stream2, corpus, str(tmp_path / "pairs2"), "doc_id",
        embed_dim=16, num_clusters=2, tau=0.9,
        state_path=state,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    mt2 = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(state) for f in files
    )
    assert mt2 == mt


def test_stream_kmv_sketch_matches_batch_and_resumes(spark, tmp_path):
    """stream_kmv_insert over 3 micro-batches == the one-shot batch
    kmv_distinct (bottom-k merge associativity); a SECOND stream run
    over new data resumes from the persisted sketch and folds it in;
    mismatched parameters on reuse raise."""
    import pytest
    from pyspark.sql import types as T

    from tinyflux_spark.operators.sketches import kmv_distinct
    from tinyflux_spark.streaming import ingest

    rows1 = [(i, i % 300) for i in range(900)]
    df1 = spark.createDataFrame(rows1, ["seq", "uid"])
    src1 = str(tmp_path / "src1")
    df1.repartition(3).write.parquet(src1)
    schema = T.StructType([
        T.StructField("seq", T.LongType()),
        T.StructField("uid", T.LongType()),
    ])
    state = str(tmp_path / "state")
    q = ingest.stream_kmv_insert(
        ingest.point_stream_from_files(
            spark, src1, schema, max_files_per_trigger=1
        ),
        state, "uid", k=64,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    got = ingest.kmv_state_estimate(spark, state).collect()[0]
    want = kmv_distinct(df1, "uid", k=64).collect()[0]
    assert got.asDict() == want.asDict()
    # resume: second run over DISJOINT uids folds into the same state
    rows2 = [(i, 1000 + i % 150) for i in range(300)]
    df2 = spark.createDataFrame(rows2, ["seq", "uid"])
    src2 = str(tmp_path / "src2")
    df2.repartition(2).write.parquet(src2)
    q2 = ingest.stream_kmv_insert(
        ingest.point_stream_from_files(
            spark, src2, schema, max_files_per_trigger=1
        ),
        state, "uid", k=64,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    got2 = ingest.kmv_state_estimate(spark, state).collect()[0]
    want2 = kmv_distinct(df1.union(df2), "uid", k=64).collect()[0]
    assert got2.asDict() == want2.asDict()
    # param mismatch on reuse raises before any stream starts
    with pytest.raises(ValueError, match="built with"):
        ingest.stream_kmv_insert(
            ingest.point_stream_from_files(
                spark, src2, schema, max_files_per_trigger=1
            ),
            state, "uid", k=128,
            checkpoint_dir=str(tmp_path / "ck3"),
        )


def test_persisted_state_without_manifest_refused(spark, tmp_path):
    """A pre-manifest (or foreign) state directory is refused loudly:
    reuse without knowing the build parameters could silently emit
    wrong pairs."""
    import pytest
    from pyspark.sql import types as T

    from tinyflux_spark.streaming import ingest

    # a parquet dir that LOOKS like persisted signatures but carries
    # no _params.json
    legacy = str(tmp_path / "legacy_sig")
    spark.createDataFrame([(1, 0, "x")], ["doc_id", "band", "bsig"]) \
        .write.parquet(legacy)
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    with pytest.raises(ValueError, match="no _params.json"):
        ingest.stream_near_dup_insert(
            ingest.point_stream_from_files(spark, src, schema),
            docs, str(tmp_path / "res"), "doc_id",
            signatures_path=legacy,
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_stream_kmv_epoch_gc_and_crash_orphans(spark, tmp_path):
    """Retention + commit atomicity for the persisted KMV sketch:
    (a) after any run at most ``keep_epochs`` epoch dirs remain and
    the estimate is unchanged by GC; (b) a crash-orphaned epoch dir
    (no _SUCCESS) is never treated as the latest sketch — readers and
    the next run fall back to the newest committed epoch; (c)
    keep_epochs < 2 is refused."""
    import os

    import pytest
    from pyspark.sql import types as T

    from tinyflux_spark.operators.sketches import kmv_distinct
    from tinyflux_spark.streaming import ingest

    df = spark.createDataFrame(
        [(i, i % 500) for i in range(1500)], ["seq", "uid"]
    )
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    schema = T.StructType([
        T.StructField("seq", T.LongType()),
        T.StructField("uid", T.LongType()),
    ])
    state = str(tmp_path / "state")
    q = ingest.stream_kmv_insert(
        ingest.point_stream_from_files(
            spark, src, schema, max_files_per_trigger=1
        ),
        state, "uid", k=64, keep_epochs=2,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
    # 4 micro-batches wrote epochs 0..3; GC keeps the newest 2
    assert sorted(epochs) == ["epoch=2", "epoch=3"]
    want = kmv_distinct(df, "uid", k=64).collect()[0]
    got = ingest.kmv_state_estimate(spark, state).collect()[0]
    assert got.asDict() == want.asDict()

    # crash-orphaned dir: higher epoch number, no _SUCCESS marker
    orphan = os.path.join(state, "epoch=99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "wb") as f:
        f.write(b"not a parquet footer")
    # reader skips it
    got2 = ingest.kmv_state_estimate(spark, state).collect()[0]
    assert got2.asDict() == want.asDict()
    # the next run folds from the committed epoch, not the orphan
    df2 = spark.createDataFrame(
        [(i, 10_000 + i % 200) for i in range(400)], ["seq", "uid"]
    )
    src2 = str(tmp_path / "src2")
    df2.repartition(2).write.parquet(src2)
    q2 = ingest.stream_kmv_insert(
        ingest.point_stream_from_files(
            spark, src2, schema, max_files_per_trigger=1
        ),
        state, "uid", k=64, keep_epochs=2,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    got3 = ingest.kmv_state_estimate(spark, state).collect()[0]
    want3 = kmv_distinct(df.union(df2), "uid", k=64).collect()[0]
    assert got3.asDict() == want3.asDict()
    # GC bounded the dir count across both runs (orphan epoch=99 was
    # overwritten by a committed write at some point or removed only
    # if <= newest - keep; assert the committed tail is bounded)
    committed = [
        d for d in os.listdir(state)
        if d.startswith("epoch=")
        and os.path.exists(os.path.join(state, d, "_SUCCESS"))
    ]
    assert len(committed) <= 2

    with pytest.raises(ValueError, match="keep_epochs"):
        ingest.stream_kmv_insert(
            ingest.point_stream_from_files(
                spark, src2, schema, max_files_per_trigger=1
            ),
            state, "uid", k=64, keep_epochs=1,
            checkpoint_dir=str(tmp_path / "ck3"),
        )


def test_fresh_checkpoint_wipes_stale_result_epochs(spark, tmp_path):
    """A NEW checkpoint lineage against an existing result_path wipes
    the prior run's epoch dirs (epoch numbering restarts at 0, so a
    stale higher-numbered dir would otherwise mix old pairs into the
    result read); a RESUMED lineage keeps its own dirs."""
    from pyspark.sql import types as T

    from tinyflux_spark.streaming import ingest

    corpus = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon zeta") for i in range(4)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    res = str(tmp_path / "res")
    # stale epoch dir from a "prior run" with a poison pair id
    spark.createDataFrame(
        [(999, 998, 1.0)], "id_left: long, id_right: long, jaccard: double"
    ).write.parquet(res + "/epoch=7")
    q = ingest.stream_near_dup_insert(
        ingest.point_stream_from_files(spark, src, schema),
        corpus, res, "doc_id",
        checkpoint_dir=str(tmp_path / "ck_fresh"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    out = spark.read.parquet(res)
    assert out.where("id_left = 999").count() == 0
    assert out.where("id_left = 1").count() > 0
    n_after_first = out.count()
    # RESUMED lineage (same checkpoint, availableNow over already-
    # processed input): prior epoch dirs of this lineage survive
    q2 = ingest.stream_near_dup_insert(
        ingest.point_stream_from_files(spark, src, schema),
        corpus, res, "doc_id",
        checkpoint_dir=str(tmp_path / "ck_fresh"),
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    assert spark.read.parquet(res).count() == n_after_first


def test_stream_kmv_quantiles_matches_batch_resumes_and_skips_replay(
    spark, tmp_path
):
    """Streaming per-group quantile sketch: (a) 3 micro-batches ==
    the one-shot batch table (merge associativity); (b) a second run
    over NEW rows (same lineage continuing) folds in — estimates equal
    the batch over the union; (c) the at-least-once replay guard: re-
    folding an already-committed batch id in the same lineage changes
    NOTHING, while the totals-carrying fold would otherwise double-
    count; (d) param mismatch on reuse raises; (e) epoch dirs stay
    bounded by keep_epochs."""
    import os

    import pytest
    from pyspark.sql import types as T

    from tinyflux_spark.operators.sketches import kmv_quantiles_by_key
    from tinyflux_spark.streaming import ingest

    rows1 = [(i, "g%d" % (i % 3), float((i * 31) % 97)) for i in range(600)]
    df1 = spark.createDataFrame(rows1, "id: long, grp: string, v: double")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    src1 = str(tmp_path / "src1")
    df1.repartition(3).write.parquet(src1)
    state = str(tmp_path / "state")
    probs = (0.5, 0.9)
    q = ingest.stream_kmv_quantiles_insert(
        ingest.point_stream_from_files(
            spark, src1, schema, max_files_per_trigger=1
        ),
        state, "v", "id", "grp", k=64,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    got = sorted(map(tuple, ingest.kmv_quantiles_state_estimate(
        spark, state, probs
    ).collect()))
    want = sorted(map(tuple, kmv_quantiles_by_key(
        df1, "v", "id", "grp", probs=probs, k=64
    ).collect()))
    assert got == want
    epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
    assert len(epochs) <= 2  # keep_epochs GC

    # (b) second run over disjoint NEW rows, fresh checkpoint but new
    # source data only (the documented contract)
    rows2 = [(1000 + i, "g%d" % (i % 3), float((i * 13) % 89))
             for i in range(300)]
    df2 = spark.createDataFrame(rows2, "id: long, grp: string, v: double")
    src2 = str(tmp_path / "src2")
    df2.repartition(2).write.parquet(src2)
    q2 = ingest.stream_kmv_quantiles_insert(
        ingest.point_stream_from_files(
            spark, src2, schema, max_files_per_trigger=1
        ),
        state, "v", "id", "grp", k=64,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    got2 = sorted(map(tuple, ingest.kmv_quantiles_state_estimate(
        spark, state, probs
    ).collect()))
    want2 = sorted(map(tuple, kmv_quantiles_by_key(
        df1.union(df2), "v", "id", "grp", probs=probs, k=64
    ).collect()))
    assert got2 == want2

    # (c) replay guard, exercised directly on the fold: the newest
    # committed epoch of lineage ck2 carries its last batch id;
    # re-folding that same (lineage, batch id) must change nothing.
    latest = ingest._latest_committed_epoch(spark, state)
    meta = spark.read.parquet(f"{state}/epoch={latest}").select(
        "_lineage", "_batch_id"
    ).first()
    ingest._fold_quantile_sketch_batch(
        df2, state, "v", "id", "grp", 64, "kmvq", 2,
        meta["_lineage"], int(meta["_batch_id"]),
    )
    assert ingest._latest_committed_epoch(spark, state) == latest
    got3 = sorted(map(tuple, ingest.kmv_quantiles_state_estimate(
        spark, state, probs
    ).collect()))
    assert got3 == got2
    # ...whereas a HIGHER batch id in the same lineage does fold (and
    # double-counts df2 — the documented disjointness contract)
    ingest._fold_quantile_sketch_batch(
        df2, state, "v", "id", "grp", 64, "kmvq", 2,
        meta["_lineage"], int(meta["_batch_id"]) + 1,
    )
    tot = {
        r["group"]: r["n_total"]
        for r in spark.read.parquet(
            "{}/epoch={}".format(
                state, ingest._latest_committed_epoch(spark, state)
            )
        ).collect()
    }
    assert tot == {"g0": 400, "g1": 400, "g2": 400}

    # (d) param mismatch raises before any stream starts
    with pytest.raises(ValueError, match="built with"):
        ingest.stream_kmv_quantiles_insert(
            ingest.point_stream_from_files(
                spark, src2, schema, max_files_per_trigger=1
            ),
            state, "v", "id", "grp", k=128,
            checkpoint_dir=str(tmp_path / "ck3"),
        )


def test_recreated_checkpoint_gets_fresh_lineage_no_silent_skip(
    spark, tmp_path
):
    """A checkpoint DELETED and RECREATED at the same path restarts
    foreachBatch's epoch ids at 0. The replay guard keys on the query
    id Spark persists in <checkpoint>/metadata (regenerated with every
    fresh checkpoint), NOT the path string — under a path-string
    lineage the second run's batch ids (0, 1, ...) would compare <=
    the first run's recorded id and be skipped as redeliveries:
    silent data loss, the exact inverse of the double-count the guard
    exists to prevent."""
    import shutil

    from pyspark.sql import types as T

    from tinyflux_spark.operators.sketches import kmv_quantiles_by_key
    from tinyflux_spark.streaming import ingest

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    rows1 = [(i, "g%d" % (i % 2), float((i * 7) % 53)) for i in range(200)]
    df1 = spark.createDataFrame(rows1, "id: long, grp: string, v: double")
    src1 = str(tmp_path / "src1")
    df1.repartition(3).write.parquet(src1)  # 3 files -> batch ids 0..2
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")  # SAME path both runs
    q = ingest.stream_kmv_quantiles_insert(
        ingest.point_stream_from_files(
            spark, src1, schema, max_files_per_trigger=1
        ),
        state, "v", "id", "grp", k=32, checkpoint_dir=ck,
    )
    assert q.awaitTermination(300) and q.exception() is None

    shutil.rmtree(ck)  # checkpoint lost; same path recreated below
    rows2 = [(1000 + i, "g%d" % (i % 2), float((i * 11) % 43))
             for i in range(100)]
    df2 = spark.createDataFrame(rows2, "id: long, grp: string, v: double")
    src2 = str(tmp_path / "src2")
    df2.repartition(2).write.parquet(src2)  # batch ids restart at 0
    q2 = ingest.stream_kmv_quantiles_insert(
        ingest.point_stream_from_files(
            spark, src2, schema, max_files_per_trigger=1
        ),
        state, "v", "id", "grp", k=32, checkpoint_dir=ck,
    )
    assert q2.awaitTermination(300) and q2.exception() is None

    # Both runs' lineage tokens must differ (fresh query id), and the
    # second run's rows must have folded in.
    latest = ingest._latest_committed_epoch(spark, state)
    got = sorted(map(tuple, ingest.kmv_quantiles_state_estimate(
        spark, state, (0.5,)
    ).collect()))
    want = sorted(map(tuple, kmv_quantiles_by_key(
        df1.union(df2), "v", "id", "grp", probs=(0.5,), k=32
    ).collect()))
    assert got == want
    tot = {
        r["group"]: r["n_total"]
        for r in spark.read.parquet(f"{state}/epoch={latest}").collect()
    }
    assert tot == {"g0": 150, "g1": 150}


def test_corrupt_manifest_surfaces_parse_error_not_missing(
    spark, tmp_path
):
    """A truncated/corrupt _params.json must fail as a JSON parse
    error, not be misreported as 'has no _params.json manifest'
    (json.JSONDecodeError subclasses ValueError, so a blanket except
    would mask corruption behind the missing-manifest message)."""
    import json as _json
    import os

    import pytest

    from tinyflux_spark.streaming import ingest

    state = str(tmp_path / "state")
    os.makedirs(state)
    with open(os.path.join(state, "_params.json"), "w") as f:
        f.write('{"kind": "kmv_sketch", "k": 64')  # truncated
    with pytest.raises(_json.JSONDecodeError):
        ingest._read_params_manifest(spark, state)
    with pytest.raises(_json.JSONDecodeError):
        ingest._check_params_manifest(
            spark, state, {"kind": "kmv_sketch", "k": 64}, "state"
        )
    # and a genuinely MISSING manifest still reports as missing
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no _params.json"):
        ingest._check_params_manifest(
            spark, empty, {"k": 64}, "state"
        )


def test_stream_near_dup_compaction_bounds_dirs_pairs_unchanged(
    spark, tmp_path
):
    """Long-lived stream retention (VERDICT r8 ask #8): with
    compact_every set, the result layout stays BOUNDED — settled
    epoch dirs fold into a _SUCCESS-gated _base/v=V and are deleted —
    while read_stream_pairs returns exactly the batch join's pairs.
    Also: a resumed continuation keeps compacting into the same base,
    and read_stream_pairs works on an uncompacted dir too."""
    import os

    from pyspark.sql import types as T

    from tinyflux_spark.operators.dedup import minhash_lsh_join

    # 10 shard docs, half near-dups of the corpus
    corpus_rows = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "completely different text about distributed analytics"),
    ]
    shard_rows = [
        (
            i,
            "the quick brown fox jumps over the lazy dog today"
            if i % 2 == 0
            else f"unique text number {i} with no twin anywhere at all",
        )
        for i in range(10)
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    shard = spark.createDataFrame(shard_rows, ["doc_id", "text"])
    src = str(tmp_path / "src")
    for i in range(8):  # 8 one-doc files -> 8 micro-batches
        shard.where(F.col("doc_id") == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    res = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")
    q = ingest.stream_near_dup_insert(
        ingest.point_stream_from_files(
            spark, src, schema, max_files_per_trigger=1
        ),
        corpus, res, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
        checkpoint_dir=ck, compact_every=3,
    )
    assert q.awaitTermination(300) and q.exception() is None

    def canon(df):
        return sorted(
            (r["id_left"], r["id_right"], round(r["jaccard"], 9))
            for r in df.collect()
        )

    def epoch_dirs():
        return [d for d in os.listdir(res) if d.startswith("epoch=")]

    # bounded: folded epochs are gone; at most compact_every + the
    # in-flight tail remain, plus <= 2 base versions
    assert len(epoch_dirs()) <= 4, epoch_dirs()
    bases = os.listdir(os.path.join(res, "_base"))
    assert 1 <= len([b for b in bases if b.startswith("v=")]) <= 2
    want8 = canon(minhash_lsh_join(
        shard.where(F.col("doc_id") < 8), corpus, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
    ))
    got8 = canon(ingest.read_stream_pairs(spark, res))
    assert got8 == want8 and len(got8) >= 4

    # resumed continuation over the last 2 docs keeps folding into
    # the same layout and loses nothing
    for i in range(8, 10):
        shard.where(F.col("doc_id") == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q2 = ingest.stream_near_dup_insert(
        ingest.point_stream_from_files(
            spark, src, schema, max_files_per_trigger=1
        ),
        corpus, res, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
        checkpoint_dir=ck, compact_every=3,
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    want10 = canon(minhash_lsh_join(
        shard, corpus, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
    ))
    assert canon(ingest.read_stream_pairs(spark, res)) == want10
    assert len(epoch_dirs()) <= 4

    # reader parity on an UNCOMPACTED result dir
    res2 = str(tmp_path / "pairs_plain")
    q3 = ingest.stream_near_dup_insert(
        ingest.point_stream_from_files(
            spark, src, schema, max_files_per_trigger=1
        ),
        corpus, res2, "doc_id",
        num_hashes=12, bands=4, verify_threshold=0.5,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q3.awaitTermination(300) and q3.exception() is None
    assert canon(ingest.read_stream_pairs(spark, res2)) == want10


def test_stream_ivf_append_matches_batch_and_exactly_once(
    spark, tmp_path
):
    """stream_ivf_append_insert: (a) streaming the new third in 3
    micro-batches leaves lists/codes bit-identical to one batch
    ivf_append_index of the same rows at the same frozen codebooks;
    (b) a redelivered batch id at/below the recorded high-water
    changes nothing; (c) crash recovery: a lingering _pending.json
    whose append DID commit is finalized without re-appending
    (no duplicate index rows), and one whose append did NOT commit
    re-appends; (d) param mismatch and manifest-less indexes are
    refused before the stream starts."""
    import json
    import os

    import pytest

    from pyspark.sql import functions as F

    from tinyflux_spark.operators import similarity as sim
    from tinyflux_spark.streaming import ingest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    base = corpus.where(F.col("vec_id") % 3 != 0)
    batch = corpus.where(F.col("vec_id") % 3 == 0)

    def codes_of(path):
        return sorted(
            (r["id"], tuple(r["codes"]), int(r["_ivf_list"]))
            for r in spark.read.parquet(
                os.path.join(path, "codes")
            ).collect()
        )

    # batch-append reference index
    ref = str(tmp_path / "ref")
    sim.ivf_write_index(base, ref, num_centroids=8, pq_m=8, pq_ksub=8)
    sim.ivf_append_index(batch, ref)

    # streamed index: same base, same rows in 3 micro-batches
    path = str(tmp_path / "idx")
    sim.ivf_write_index(base, path, num_centroids=8, pq_m=8, pq_ksub=8)
    src = str(tmp_path / "src")
    batch.repartition(3).write.parquet(src)
    q = ingest.stream_ivf_append_insert(
        ingest.point_stream_from_files(
            spark, src, corpus.schema, max_files_per_trigger=1
        ),
        path, checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    assert codes_of(path) == codes_of(ref)
    n_after = spark.read.parquet(os.path.join(path, "lists")).count()
    assert n_after == corpus.count()

    # (b) redelivery: re-run the sink logic via a fresh no-checkpoint
    # stream over the SAME source but with the recorded lineage -
    # simulate by calling the recovery path directly: high-water says
    # batch folded, so a same-(lineage, batch) fold must no-op.
    hw = ingest._read_json_marker(spark, os.path.join(path, "_ingest.json"))
    assert hw is not None
    # (c1) pending marker present, append COMMITTED: finalize only
    ingest._write_json_marker(
        spark, os.path.join(path, "_pending.json"),
        {"lineage": hw["lineage"], "batch_id": int(hw["batch_id"])},
    )
    assert ingest._ivf_batch_already_appended(
        spark, path, batch, "vec_id", True
    )
    # the probe says "already in": a retry must not re-append -
    # mimic the sink's decision and assert counts unchanged
    before = n_after
    assert spark.read.parquet(os.path.join(path, "lists")).count() == before
    ingest._delete_path(spark, os.path.join(path, "_pending.json"))
    # (c2) append NOT committed: probe over ids absent from the index
    ghost = batch.withColumn("vec_id", F.col("vec_id") + 100000)
    assert not ingest._ivf_batch_already_appended(
        spark, path, ghost, "vec_id", True
    )

    # (d) refusals
    with pytest.raises(ValueError, match="id_col"):
        ingest.stream_ivf_append_insert(
            ingest.point_stream_from_files(
                spark, src, corpus.schema, max_files_per_trigger=1
            ),
            path, id_col="other",
        )
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    with pytest.raises(ValueError, match="params.json"):
        ingest.stream_ivf_append_insert(
            ingest.point_stream_from_files(
                spark, src, corpus.schema, max_files_per_trigger=1
            ),
            bare,
        )

    # (b, end-to-end) a SECOND availableNow run over the same source
    # with the SAME checkpoint re-delivers nothing new: index unchanged
    q2 = ingest.stream_ivf_append_insert(
        ingest.point_stream_from_files(
            spark, src, corpus.schema, max_files_per_trigger=1
        ),
        path, checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q2.awaitTermination(300) and q2.exception() is None
    assert codes_of(path) == codes_of(ref)


def test_srp_append_index_equals_rebuild(spark, tmp_path):
    """srp_append_index: appending new batches at the frozen planes is
    bit-identical to a one-shot srp_write_index over old ∪ new (the
    bucket is a pure function of the seed-derived planes — no drift
    caveat), and pre-stamp / mismatched-column indexes are refused."""
    import json
    import os

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)

    def buckets_of(path):
        return sorted(
            (r["vec_id"], int(r["_bucket"]))
            for r in spark.read.parquet(
                os.path.join(path, "buckets")
            ).select("vec_id", "_bucket").collect()
        )

    ref = str(tmp_path / "ref")
    sim.srp_write_index(emb, ref, num_planes=6, seed=7)
    path = str(tmp_path / "idx")
    sim.srp_write_index(base, path, num_planes=6, seed=7)
    n = sim.srp_append_index(batch, path)
    assert n == batch.count()
    assert buckets_of(path) == buckets_of(ref)
    # serving read over the grown index == over the rebuilt one
    qv = [float(x) for x in emb.first()["embedding"]]
    got = sim.srp_topk_indexed(spark, path, qv, k=5).collect()
    want = sim.srp_topk_indexed(spark, ref, qv, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # refusals: mismatched columns; pre-stamp planes.json
    with pytest.raises(ValueError, match="id_col"):
        sim.srp_append_index(batch, path, id_col="other")
    # rewrite THROUGH the Hadoop FS layer (r12: metadata lives behind
    # fsio; a plain open() rewrite would leave a stale checksum sidecar)
    from tinyflux_spark import fsio

    rec = fsio.read_json(os.path.join(path, "planes.json"))
    for kk in ("id_col", "vec_col"):
        rec.pop(kk)
    fsio.write_json_atomic(os.path.join(path, "planes.json"), rec)
    with pytest.raises(ValueError, match="stamping"):
        sim.srp_append_index(batch, path)


def test_stream_srp_append_matches_batch_and_exactly_once(
    spark, tmp_path
):
    """stream_srp_append_insert: (a) streaming the new third in 3
    micro-batches leaves buckets/ bit-identical to one batch
    srp_append_index of the same rows at the same frozen planes;
    (b) a second availableNow run over the same checkpoint redelivers
    nothing; (c) the crash probe answers from the batch's own ids;
    (d) param mismatch and pre-stamp indexes are refused before the
    stream starts."""
    import json
    import os

    from tinyflux_spark.operators import similarity as sim
    from tinyflux_spark.streaming import ingest

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)

    def buckets_of(path):
        return sorted(
            (r["vec_id"], int(r["_bucket"]))
            for r in spark.read.parquet(
                os.path.join(path, "buckets")
            ).select("vec_id", "_bucket").collect()
        )

    ref = str(tmp_path / "ref")
    sim.srp_write_index(base, ref, num_planes=6, seed=7)
    sim.srp_append_index(batch, ref)

    path = str(tmp_path / "idx")
    sim.srp_write_index(base, path, num_planes=6, seed=7)
    src = str(tmp_path / "src")
    batch.repartition(3).write.parquet(src)

    def run(ck="ck"):
        return ingest.stream_srp_append_insert(
            ingest.point_stream_from_files(
                spark, src, emb.schema, max_files_per_trigger=1
            ),
            path, checkpoint_dir=str(tmp_path / ck),
        )

    q = run()
    assert q.awaitTermination(300) and q.exception() is None
    assert buckets_of(path) == buckets_of(ref)

    # (b) same checkpoint, same source: nothing re-delivers
    q2 = run()
    assert q2.awaitTermination(300) and q2.exception() is None
    assert buckets_of(path) == buckets_of(ref)
    hw = ingest._read_json_marker(
        spark, os.path.join(path, "_ingest.json")
    )
    assert hw is not None and int(hw["batch_id"]) == 2

    # (c) crash probe
    assert ingest._srp_batch_already_appended(
        spark, path, batch, "vec_id"
    )
    ghost = batch.withColumn("vec_id", F.col("vec_id") + 100000)
    assert not ingest._srp_batch_already_appended(
        spark, path, ghost, "vec_id"
    )

    # (d) refusals before start
    with pytest.raises(ValueError, match="id_col"):
        ingest.stream_srp_append_insert(
            ingest.point_stream_from_files(
                spark, src, emb.schema, max_files_per_trigger=1
            ),
            path, id_col="other",
        )
    # rewrite THROUGH the Hadoop FS layer (r12: metadata lives behind
    # fsio; a plain open() rewrite would leave a stale checksum sidecar)
    from tinyflux_spark import fsio

    rec = fsio.read_json(os.path.join(path, "planes.json"))
    for kk in ("id_col", "vec_col"):
        rec.pop(kk)
    fsio.write_json_atomic(os.path.join(path, "planes.json"), rec)
    with pytest.raises(ValueError, match="stamping"):
        ingest.stream_srp_append_insert(
            ingest.point_stream_from_files(
                spark, src, emb.schema, max_files_per_trigger=1
            ),
            path,
        )


def test_stream_self_dedup_matches_batch_all_pairs(spark, tmp_path):
    """stream_self_dedup_insert: (a) streaming the shard in 3
    micro-batches yields EXACTLY the one-shot minhash_lsh_pairs over
    corpus ∪ shard restricted to pairs touching the shard — including
    stream-vs-stream pairs the static-corpus form (q93) cannot see;
    (b) a second availableNow run over the same checkpoint redelivers
    nothing (pairs and state byte-stable); (c) the crash probe
    answers from the batch's own ids; (d) a parameter mismatch on
    restart is refused."""
    import os

    import pytest

    from tinyflux_spark.operators.dedup import minhash_lsh_pairs
    from tinyflux_spark.streaming import ingest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    src = str(tmp_path / "src")
    shard.repartition(3).write.parquet(src)
    res = str(tmp_path / "pairs")
    state = str(tmp_path / "state")

    def run():
        return ingest.stream_self_dedup_insert(
            ingest.point_stream_from_files(
                spark, src, docs.schema, max_files_per_trigger=1
            ),
            corpus, res, state, "doc_id",
            num_hashes=12, bands=4, verify_threshold=0.7,
            checkpoint_dir=str(tmp_path / "ck"),
        )

    q = run()
    assert q.awaitTermination(300) and q.exception() is None
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(res)
        .select("id_a", "id_b", "jaccard")
        .collect()
    )
    allp = minhash_lsh_pairs(
        docs, "doc_id", num_hashes=12, bands=4, verify_threshold=0.7
    )
    want = sorted(
        tuple(r)
        for r in allp.where(
            (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0)
        ).collect()
    )
    assert got == want
    # the new capability: at least one stream-vs-stream pair exists
    # in the fixture and was caught
    assert any(a % 5 == 0 and b % 5 == 0 for a, b, _ in got)

    def state_rows():
        sig = sorted(
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(state, "sig")
            ).collect()
        )
        sd = sorted(
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(state, "docs")
            ).collect()
        )
        return sig, sd

    before = state_rows()
    # (b) same checkpoint, same source: nothing re-delivers
    q2 = run()
    assert q2.awaitTermination(300) and q2.exception() is None
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(res)
        .select("id_a", "id_b", "jaccard")
        .collect()
    ) == want
    assert state_rows() == before

    # (c) crash probe: shard ids are in the docs state; ghosts are not
    assert ingest._self_dedup_batch_already_appended(
        spark, state, shard, "doc_id"
    )
    ghost = shard.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    assert not ingest._self_dedup_batch_already_appended(
        spark, state, ghost, "doc_id"
    )

    # (d) restart with different banding is refused by the manifest
    with pytest.raises(ValueError):
        ingest.stream_self_dedup_insert(
            ingest.point_stream_from_files(
                spark, src, docs.schema, max_files_per_trigger=1
            ),
            corpus, res, state, "doc_id",
            num_hashes=12, bands=6, verify_threshold=0.7,
            checkpoint_dir=str(tmp_path / "ck2"),
        )


def test_stream_self_dedup_state_compaction_long_stream(
    spark, tmp_path
):
    """state_compact_every: a 20-epoch stream with a DOUBLE
    crash-retry injected at the last epoch (two interrupted attempts
    each left the batch's sig rows behind — the repeated-retry growth
    mode, VERDICT r10 note) keeps (a) the pair results identical
    to the one-shot all-pairs oracle, (b) the sig/docs state file
    count BOUNDED (folds into <sub>_base/v=V instead of one parquet
    job's files per epoch), (c) zero duplicate rows in EITHER state
    dir after the fold's distinct() clears the retry re-appends."""
    import json
    import os

    from tinyflux_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs,
    )
    from tinyflux_spark.streaming import ingest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where(F.col("doc_id") < 300)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    shard_rows = shard.collect()
    # 20 single-row-group files => 20 micro-batches
    n_files = 20
    src = str(tmp_path / "src")
    for i in range(n_files - 1):
        spark.createDataFrame(
            shard_rows[i::n_files], docs.schema
        ).coalesce(1).write.mode("append").parquet(src)
    last = spark.createDataFrame(
        shard_rows[n_files - 1::n_files], docs.schema
    )
    res = str(tmp_path / "pairs")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    def run():
        return ingest.stream_self_dedup_insert(
            ingest.point_stream_from_files(
                spark, src, docs.schema, max_files_per_trigger=1
            ),
            corpus, res, state, "doc_id",
            num_hashes=12, bands=4, verify_threshold=0.7,
            checkpoint_dir=ck, compact_every=5,
            state_compact_every=5,
        )

    q = run()
    assert q.awaitTermination(600) and q.exception() is None

    # inject the sig-committed/docs-missing crash TWICE at the next
    # epoch (two interrupted retries, each re-appending the batch's
    # signatures), then deliver it for real — epoch 19 retries into
    # the doubly-poisoned state AND triggers a fold right after
    # ((19+1) % 5 == 0)
    lineage = ingest._checkpoint_query_lineage(spark, ck)
    for _ in range(2):
        banded_signatures(
            last, "doc_id", num_hashes=12, bands=4
        ).write.mode("append").parquet(os.path.join(state, "sig"))
    ingest._write_json_marker(
        spark, os.path.join(state, "_pending.json"),
        {"lineage": lineage, "batch_id": n_files - 1},
    )
    last.coalesce(1).write.mode("append").parquet(src)
    q2 = run()
    assert q2.awaitTermination(600) and q2.exception() is None

    # (a) pairs == the one-shot oracle restricted to shard pairs
    got = sorted(
        tuple(r)
        for r in ingest.read_stream_pairs(spark, res)
        .select("id_a", "id_b", "jaccard")
        .collect()
    )
    allp = minhash_lsh_pairs(
        docs, "doc_id", num_hashes=12, bands=4, verify_threshold=0.7
    )
    want = sorted(
        tuple(r)
        for r in allp.where(
            (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0)
        ).collect()
    )
    assert got == want
    assert all(a != b for a, b, _ in got)

    # (b) bounded state: one committed base per dir, and the live
    # tails hold at most state_compact_every epochs' files (each
    # epoch appends ONE coalesced part file here) — nowhere near the
    # 20 files an uncompacted run would hold
    for sub in ("sig", "docs"):
        base_v, folded = ingest._latest_committed_state_base(
            spark, state, sub
        )
        assert base_v is not None, f"{sub}: no committed base"
        live = [
            f
            for f in ingest._state_live_files(
                spark, os.path.join(state, sub)
            )
            if f.rsplit("/", 1)[-1] not in folded
        ]
        assert len(live) <= 8, (sub, len(live))

    # (c) the fold's distinct() cleared the crash-retry duplicates —
    # in BOTH dirs (docs folds distinct too: ids unique by contract)
    sig = ingest._read_state_dir(spark, state, "sig")
    assert sig.count() == sig.distinct().count()
    docs_state = ingest._read_state_dir(spark, state, "docs")
    assert docs_state.count() == docs_state.distinct().count()
    # and the state content equals a clean one-shot signature build
    want_sig = sorted(
        tuple(r)
        for r in banded_signatures(
            docs, "doc_id", num_hashes=12, bands=4
        ).collect()
    )
    assert sorted(tuple(r) for r in sig.collect()) == want_sig


def test_truncated_fold_manifest_treated_as_uncommitted(
    spark, tmp_path
):
    """ADVICE r10 medium: a fold manifest that EXISTS but doesn't
    parse (the crash-mid-write artifact of a non-atomic fs.create)
    must read as an UNCOMMITTED version — readers fall back to the
    previous committed base ∪ live files instead of raising
    JSONDecodeError on every later read — and the staged+renamed
    writer (_write_json_atomic) can't produce one in the first
    place (the final name appears only via an atomic rename)."""
    import os

    from tinyflux_spark.streaming import ingest

    state = str(tmp_path / "state")
    rows = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    rows.where("id < 5").write.mode("append").parquet(state + "/sig")
    rows.where("id >= 5").write.mode("append").parquet(state + "/sig")
    ingest._compact_state_dir(spark, state, "sig")
    base_v, _ = ingest._latest_committed_state_base(spark, state, "sig")
    assert base_v == 0
    assert ingest._read_state_dir(spark, state, "sig").count() == 10

    # fabricate a NEWER version whose manifest is truncated mid-write
    v1 = os.path.join(state, "sig_base", "v=1")
    spark.range(3).write.mode("overwrite").parquet(v1)  # has _SUCCESS
    with open(os.path.join(v1, "_folded.json"), "w") as f:
        f.write('{"files": ["part-0000')  # truncated JSON

    # the truncated version is skipped, not fatal: v=0 still serves
    base_v, folded = ingest._latest_committed_state_base(
        spark, state, "sig"
    )
    assert base_v == 0
    assert ingest._read_state_dir(spark, state, "sig").count() == 10

    # same tolerance for the epoch-result fold manifests
    res = str(tmp_path / "res")
    rows.write.mode("overwrite").parquet(res + "/_base/v=0")
    ingest._write_json_atomic(
        spark, res + "/_base/v=0/_folded.json", {"folded_through": 3}
    )
    rows.write.mode("overwrite").parquet(res + "/_base/v=1")
    with open(os.path.join(res, "_base", "v=1", "_folded.json"),
              "w") as f:
        f.write('{"folded_thr')
    assert ingest._latest_committed_base(spark, res) == (0, 3)

    # the atomic writer: round-trips, replaces an existing target,
    # leaves no temp droppings
    p = str(tmp_path / "m" / "_marker.json")
    ingest._write_json_atomic(spark, p, {"a": 1})
    assert ingest._read_json_marker(spark, p) == {"a": 1}
    ingest._write_json_atomic(spark, p, {"a": 2})
    assert ingest._read_json_marker(spark, p) == {"a": 2}
    # no temp droppings (the checksum FS's .crc sidecars are fine)
    left = [
        f for f in os.listdir(str(tmp_path / "m"))
        if not f.endswith(".crc")
    ]
    assert left == ["_marker.json"]
    assert not any(".tmp-" in f
                   for f in os.listdir(str(tmp_path / "m")))


def test_stream_self_dedup_crash_between_sig_and_docs_append(
    spark, tmp_path
):
    """Crash-retry soundness for the sig-committed/docs-missing gap
    (ADVICE r9 high): a crash BETWEEN the sig append and the docs
    append leaves the batch's own signatures in the standing state
    while the crash probe (docs-based) reports "not appended", so the
    epoch recomputes against a state containing the batch itself.
    The retried epoch must equal a clean run: no (id, id) self-pairs,
    no doubled within-batch pairs, final store == the one-shot
    all-pairs oracle restricted to shard-touching pairs."""
    import json
    import os

    from tinyflux_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs,
    )
    from tinyflux_spark.streaming import ingest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    part1 = shard.where(F.col("doc_id") % 10 == 0)
    part2 = shard.where(F.col("doc_id") % 10 != 0)
    src = str(tmp_path / "src")
    part1.coalesce(1).write.parquet(src)
    res = str(tmp_path / "pairs")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    def run():
        return ingest.stream_self_dedup_insert(
            ingest.point_stream_from_files(
                spark, src, docs.schema, max_files_per_trigger=1
            ),
            corpus, res, state, "doc_id",
            num_hashes=12, bands=4, verify_threshold=0.7,
            checkpoint_dir=ck,
        )

    q = run()
    assert q.awaitTermination(300) and q.exception() is None

    # Simulate the crashed attempt at the NEXT epoch: part2's sig
    # append committed, docs append did not, pending marker on disk.
    lineage = ingest._checkpoint_query_lineage(spark, ck)
    assert not lineage.startswith("run-")  # persisted query id, not UUID
    banded_signatures(
        part2, "doc_id", num_hashes=12, bands=4
    ).write.mode("append").parquet(os.path.join(state, "sig"))
    ingest._write_json_marker(
        spark,
        os.path.join(state, "_pending.json"),
        {"lineage": lineage, "batch_id": 1},
    )
    # hw is still at batch 0 (the committed epoch)
    hw = ingest._read_json_marker(
        spark, os.path.join(state, "_ingest.json")
    )
    assert hw is not None and int(hw["batch_id"]) == 0

    # Deliver part2 for real: same checkpoint redelivers it as epoch 1
    # into the poisoned state.
    part2.coalesce(1).write.mode("append").parquet(src)
    q2 = run()
    assert q2.awaitTermination(300) and q2.exception() is None

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(res)
        .select("id_a", "id_b", "jaccard")
        .collect()
    )
    assert all(a != b for a, b, _ in got), "self-pairs leaked"
    assert len(got) == len(set((a, b) for a, b, _ in got)), (
        "within-batch pairs doubled by the retried epoch"
    )
    allp = minhash_lsh_pairs(
        docs, "doc_id", num_hashes=12, bands=4, verify_threshold=0.7
    )
    want = sorted(
        tuple(r)
        for r in allp.where(
            (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0)
        ).collect()
    )
    assert got == want
    # protocol finalized: pending cleared, hw advanced
    assert (
        ingest._read_json_marker(
            spark, os.path.join(state, "_pending.json")
        )
        is None
    )
    hw2 = ingest._read_json_marker(
        spark, os.path.join(state, "_ingest.json")
    )
    assert int(hw2["batch_id"]) == 1


def test_holt_winters_last_guards(spark):
    """holt_winters_last boundedness + shortness guards fire with
    actionable messages; period < 2 is refused at build time."""
    from tinyflux_spark.operators import aggregates

    rows = [
        ("k", T0 + timedelta(minutes=i), float(i % 5))
        for i in range(9)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    with pytest.raises(Exception, match="max_series_rows"):
        aggregates.holt_winters_last(
            df, "key", "time", "value", period=4, max_series_rows=5
        ).collect()
    with pytest.raises(Exception, match="shorter than one season"):
        aggregates.holt_winters_last(
            spark.createDataFrame(rows[:3], ["key", "time", "value"]),
            "key", "time", "value", period=4,
        ).collect()
    with pytest.raises(ValueError, match="period"):
        aggregates.holt_winters_last(
            df, "key", "time", "value", period=1
        )


def test_holt_last_matches_python_model(spark):
    """Holt double-exponential smoothing replayed in plain Python:
    l_0 = v_0, b_0 = 0; l_i = a*v + (1-a)(l+b); b_i = B(l_i - l) +
    (1-B)b — the struct-accumulator fold must reproduce it per key,
    with forecast = level + trend; the boundedness guard fires with
    an actionable message."""
    from tinyflux_spark.operators import aggregates

    rows = [
        (str(k), T0 + timedelta(minutes=i), float((i * 7 + k) % 23))
        for k in range(3)
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    a, B = 0.3, 0.1

    def model(series):
        l, b = series[0], 0.0
        for v in series[1:]:
            nl = a * v + (1.0 - a) * (l + b)
            b = B * (nl - l) + (1.0 - B) * b
            l = nl
        return l, b

    got = aggregates.holt_last(
        df, "key", "time", "value", alpha=a, beta=B
    ).collect()
    assert len(got) == 3
    for r in got:
        series = [v for kk, _, v in rows if kk == r["key"]]
        l, b = model(series)
        assert r["level"] == pytest.approx(l, abs=1e-6)
        assert r["trend"] == pytest.approx(b, abs=1e-6)
        assert r["forecast"] == pytest.approx(l + b, abs=1e-6)

    with pytest.raises(Exception) as ei:
        aggregates.holt_last(
            df, "key", "time", "value", max_series_rows=2
        ).collect()
    assert "max_series_rows" in str(ei.value)
    # a single-point series: level = v, trend = 0, forecast = v
    one = spark.createDataFrame(
        [("x", T0, 5.0)], ["key", "time", "value"]
    )
    r = aggregates.holt_last(one, "key", "time", "value").collect()[0]
    assert (r["level"], r["trend"], r["forecast"]) == (5.0, 0.0, 5.0)


def test_stateful_holt_winters_stream_equals_batch_fold(
    spark, tmp_path
):
    """stateful_holt_winters over a time-ordered finite stream: each
    key's FINAL (level, trend, forecast) lands exactly on
    holt_winters_last's batch fold of the same rows; every
    intermediate row equals the plain-Python recurrence prefix
    (warm-up rows NULL, init row = first-season seed); the period
    guard refuses period < 2."""
    from tinyflux_spark.operators import aggregates
    from tinyflux_spark.streaming import ingest

    a, B, g, m = 0.3, 0.1, 0.2, 4
    rows = [
        (str(k), T0 + timedelta(minutes=i), float((i * 7 + k) % 23))
        for k in range(3)
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    src = str(tmp_path / "src")
    # one file per time-slice so arrival order is time order per key;
    # slice width 5 NOT aligned with the period: the init straddles
    # a micro-batch boundary for every key
    for j in range(3):
        df.where(
            (F.col("time") >= T0 + timedelta(minutes=j * 5))
            & (F.col("time") < T0 + timedelta(minutes=(j + 1) * 5))
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ingest.stateful_holt_winters(
        stream, "key", "time", "value",
        alpha=a, beta=B, gamma=g, period=m,
    )
    ingest.run_to_memory(out, "hw_t", output_mode="append",
                         shuffle_partitions=4)
    got = spark.table("hw_t")

    def py_states(series):
        out_states = []
        l = b = None
        s, buf = [], []
        for i, v in enumerate(series):
            if i < m - 1:
                buf.append(v)
                out_states.append((None, None, None))
            elif i == m - 1:
                buf.append(v)
                acc = 0.0
                for x in buf:
                    acc += x
                l = acc / m
                b = 0.0
                s = [x - l for x in buf]
                out_states.append((l, b, l + b + s[0]))
            else:
                lag = s[i % m]
                nl = a * (v - lag) + (1 - a) * (l + b)
                b = B * (nl - l) + (1 - B) * b
                s[i % m] = g * (v - nl) + (1 - g) * lag
                l = nl
                out_states.append((l, b, l + b + s[(i + 1) % m]))
        return out_states

    batch = {
        r["key"]: r
        for r in aggregates.holt_winters_last(
            df, "key", "time", "value",
            alpha=a, beta=B, gamma=g, period=m,
        ).collect()
    }
    for k in ("0", "1", "2"):
        series = [v for kk, _, v in rows if kk == k]
        states = py_states(series)
        got_rows = (
            got.where(F.col("key") == k).orderBy("time").collect()
        )
        assert len(got_rows) == len(states)
        for r, (ml, mb, mf) in zip(got_rows, states):
            if ml is None:
                assert r["level"] is None and r["forecast"] is None
            else:
                assert r["level"] == pytest.approx(ml, abs=1e-9)
                assert r["trend"] == pytest.approx(mb, abs=1e-9)
                assert r["forecast"] == pytest.approx(mf, abs=1e-9)
        # final streamed state == the batch fold (rounded at 6dp)
        last = got_rows[-1]
        assert round(last["level"], 6) == batch[k]["level"]
        assert round(last["trend"], 6) == batch[k]["trend"]
        assert round(last["forecast"], 6) == batch[k]["forecast"]

    with pytest.raises(ValueError, match="period"):
        ingest.stateful_holt_winters(
            stream, "key", "time", "value", period=1
        )


def test_holt_winters_damped_trend(spark, tmp_path):
    """phi damping (VERDICT r10 #7): (a) phi=1.0 is BIT-EXACTLY the
    undamped default (IEEE 1.0*x == x — the q132/q133 oracles stay
    valid); (b) phi=0.9 matches the plain-Python damped recurrence
    (l+phi*b carries, (1-beta)*(phi*b), forecast = l+phi*b+s_next);
    (c) the streaming twin's final state equals the batch fold at the
    same phi; (d) phi outside (0, 1] is refused by both."""
    from tinyflux_spark.operators import aggregates
    from tinyflux_spark.streaming import ingest

    a, B, g, m, ph = 0.3, 0.1, 0.2, 4, 0.9
    rows = [
        (str(k), T0 + timedelta(minutes=i), float((i * 7 + k) % 23))
        for k in range(2)
        for i in range(11)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])

    # (a) explicit phi=1.0 == default, bit-exact (round_digits=None)
    base = sorted(
        tuple(r)
        for r in aggregates.holt_winters_last(
            df, "key", "time", "value", alpha=a, beta=B, gamma=g,
            period=m, round_digits=None,
        ).collect()
    )
    one = sorted(
        tuple(r)
        for r in aggregates.holt_winters_last(
            df, "key", "time", "value", alpha=a, beta=B, gamma=g,
            period=m, phi=1.0, round_digits=None,
        ).collect()
    )
    assert base == one

    # (b) phi=0.9 == the python damped model
    def py_damped(series):
        l = b = None
        s, buf = [], []
        for i, v in enumerate(series):
            if i < m - 1:
                buf.append(v)
            elif i == m - 1:
                buf.append(v)
                acc = 0.0
                for x in buf:
                    acc += x
                l = acc / m
                b = 0.0
                s = [x - l for x in buf]
            else:
                lag = s[i % m]
                phb = ph * b
                nl = a * (v - lag) + (1 - a) * (l + phb)
                b = B * (nl - l) + (1 - B) * phb
                s[i % m] = g * (v - nl) + (1 - g) * lag
                l = nl
        n = len(series)
        return l, b, s[n % m], l + ph * b + s[n % m]

    damped = {
        r["key"]: r
        for r in aggregates.holt_winters_last(
            df, "key", "time", "value", alpha=a, beta=B, gamma=g,
            period=m, phi=ph,
        ).collect()
    }
    for k in ("0", "1"):
        series = [v for kk, _, v in rows if kk == k]
        ml, mb, ms, mf = py_damped(series)
        assert damped[k]["level"] == pytest.approx(ml, abs=1e-6)
        assert damped[k]["trend"] == pytest.approx(mb, abs=1e-6)
        assert damped[k]["season"] == pytest.approx(ms, abs=1e-6)
        assert damped[k]["forecast"] == pytest.approx(mf, abs=1e-6)
    # damping actually changes the result (the knob is live)
    assert damped["0"]["forecast"] != pytest.approx(
        {r["key"]: r for r in aggregates.holt_winters_last(
            df, "key", "time", "value", alpha=a, beta=B, gamma=g,
            period=m,
        ).collect()}["0"]["forecast"], abs=1e-9,
    )

    # (c) streaming twin at the same phi: final state == batch fold
    src = str(tmp_path / "src")
    for j in range(3):
        df.where(
            (F.col("time") >= T0 + timedelta(minutes=j * 4))
            & (F.col("time") < T0 + timedelta(minutes=(j + 1) * 4))
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ingest.stateful_holt_winters(
        stream, "key", "time", "value",
        alpha=a, beta=B, gamma=g, period=m, phi=ph,
    )
    ingest.run_to_memory(out, "hw_damp", output_mode="append",
                         shuffle_partitions=4)
    got = spark.table("hw_damp")
    for k in ("0", "1"):
        last = (
            got.where(F.col("key") == k)
            .orderBy(F.col("time").desc())
            .first()
        )
        assert round(last["level"], 6) == damped[k]["level"]
        assert round(last["trend"], 6) == damped[k]["trend"]
        assert round(last["forecast"], 6) == damped[k]["forecast"]

    # (d) validation
    for bad in (0.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="phi"):
            aggregates.holt_winters_last(
                df, "key", "time", "value", phi=bad
            )
        with pytest.raises(ValueError, match="phi"):
            ingest.stateful_holt_winters(
                stream, "key", "time", "value", phi=bad
            )


def test_stateful_folds_sort_across_arrow_chunks(spark, tmp_path):
    """ADVICE r9 medium: applyInPandasWithState yields MULTIPLE Arrow
    chunks per key when a key's micro-batch rows exceed
    spark.sql.execution.arrow.maxRecordsPerBatch. Per-chunk sorting is
    not a global time order — with the conf forced to 7 and a 40-row
    single-batch key written in DESCENDING time order, the fold must
    still equal the plain-Python recurrence over the time-ordered
    series, for both stateful_ewma and stateful_holt."""
    from tinyflux_spark.streaming import ingest

    rows = [
        ("k", T0 + timedelta(minutes=i), float((i * 7 + 3) % 23))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        list(reversed(rows)), ["key", "time", "value"]
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)  # ONE file => ONE micro-batch
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = ingest.point_stream_from_files(
            spark, src, df.schema, fmt="parquet"
        )
        out = ingest.stateful_holt(
            stream, "key", "time", "value", alpha=0.3, beta=0.1
        )
        ingest.run_to_memory(out, "holt_chunks", output_mode="append")
        stream2 = ingest.point_stream_from_files(
            spark, src, df.schema, fmt="parquet"
        )
        out2 = ingest.stateful_ewma(
            stream2, "key", "time", "value", alpha=0.3
        )
        ingest.run_to_memory(out2, "ewma_chunks", output_mode="append")
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    series = [v for _, _, v in rows]
    a, B = 0.3, 0.1
    l, b = series[0], 0.0
    holt_states = [(l, b)]
    for v in series[1:]:
        nl = a * v + (1.0 - a) * (l + b)
        b = B * (nl - l) + (1.0 - B) * b
        l = nl
        holt_states.append((l, b))
    got = spark.table("holt_chunks").orderBy("time").collect()
    assert len(got) == 40
    for r, (ml, mb) in zip(got, holt_states):
        assert r["level"] == pytest.approx(ml, abs=1e-9)
        assert r["trend"] == pytest.approx(mb, abs=1e-9)
    got_e = spark.table("ewma_chunks").orderBy("time").collect()
    assert [r["ewma"] for r in got_e] == pytest.approx(
        _py_ewma(series)
    )


def test_stateful_holt_stream_equals_batch_fold(spark, tmp_path):
    """stateful_holt over a time-ordered finite stream must land each
    key's FINAL (level, trend, forecast) exactly on holt_last's batch
    fold of the same rows, and every intermediate row must equal the
    plain-Python recurrence prefix."""
    from tinyflux_spark.operators import aggregates
    from tinyflux_spark.streaming import ingest

    rows = [
        (str(k), T0 + timedelta(minutes=i), float((i * 7 + k) % 23))
        for k in range(3)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["key", "time", "value"])
    src = str(tmp_path / "src")
    # one file per time-slice so arrival order is time order per key
    for j in range(3):
        df.where(
            (F.col("time") >= T0 + timedelta(minutes=j * 4))
            & (F.col("time") < T0 + timedelta(minutes=(j + 1) * 4))
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ingest.stateful_holt(
        stream, "key", "time", "value", alpha=0.3, beta=0.1
    )
    ingest.run_to_memory(out, "holt_t", output_mode="append",
                         shuffle_partitions=4)
    got = spark.table("holt_t")
    finals = {
        r["key"]: (r["level"], r["trend"], r["forecast"])
        for r in got.orderBy("key", "time")
        .groupBy("key")
        .agg(
            F.last("level").alias("level"),
            F.last("trend").alias("trend"),
            F.last("forecast").alias("forecast"),
        )
        .collect()
    }
    batch = aggregates.holt_last(
        df, "key", "time", "value", alpha=0.3, beta=0.1
    )
    for r in batch.collect():
        l, t, f = finals[r["key"]]
        assert round(l, 6) == r["level"]
        assert round(t, 6) == r["trend"]
        assert round(f, 6) == r["forecast"]
    # every row is the Python prefix fold
    a, B = 0.3, 0.1
    for k in ("0", "1", "2"):
        series = [v for kk, _, v in rows if kk == k]
        l, b = series[0], 0.0
        states = [(l, b)]
        for v in series[1:]:
            nl = a * v + (1.0 - a) * (l + b)
            b = B * (nl - l) + (1.0 - B) * b
            l = nl
            states.append((l, b))
        got_rows = (
            got.where(F.col("key") == k).orderBy("time").collect()
        )
        assert len(got_rows) == len(states)
        for r, (ml, mb) in zip(got_rows, states):
            assert r["level"] == pytest.approx(ml, abs=1e-9)
            assert r["trend"] == pytest.approx(mb, abs=1e-9)
