"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps each
implemented operator from SURVEY.md §2 (+ scale extensions) to a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the correctness gate.

Parity queries (q01-q10) exercise the TinyFlux query algebra end-to-end:
the events table is mapped into the engine's canonical Point schema
(time/measurement/tags/fields — see tinyflux_spark/schema.py) and
filtered through compiled query-algebra predicates, then flattened back
to scalar columns so DuckDB can produce identical frames.

Extension queries (q11+) are the beyond-reference analytics surface
(aggregations, windows, joins, as-of, dedup, text, similarity) sanctioned
by SURVEY.md §2's *(extension)* rows.

Determinism for the value-hash compare: every SUM over doubles goes
through DECIMAL so partial-aggregation order cannot perturb low bits;
averages divide the exact decimal sum (cast to double) by the count so
both engines execute one identical IEEE division.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinyflux_spark import (
    FieldQuery,
    MeasurementQuery,
    TagQuery,
    TimeQuery,
)

SF_DEFAULT = "/root/testdata/sf0.001"

T_LO = datetime(2024, 1, 10, tzinfo=timezone.utc)
T_HI = datetime(2024, 1, 20, tzinfo=timezone.utc)


def _t(name: str):
    def load(spark: SparkSession, sf_dir: str) -> DataFrame:
        if name == "events":
            return load_events(spark, sf_dir)
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    return load


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` normalized to session-tz TIMESTAMP (UTC).

    Handles both testdata vintages: TIMESTAMP(MICROS) parquet arrives as
    TIMESTAMP_NTZ (cast interprets the naive value in the UTC session
    zone, matching DuckDB's naive read), while legacy TIMESTAMP(NANOS)
    is read as long via nanosAsLong and truncated to micros."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->TZ cast below is value-preserving only under a UTC session
    # zone; pin it so a driver-created session behaves like get_spark().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session memo caches: keyed by the live SparkSession through a
# WeakKeyDictionary (NOT id(spark) — id() values can be reused after a
# session is GC'd, aliasing a new session to stale frames) with an inner
# dict per sf_dir. The weak ref also lets a closed session's cached
# frames be collected.
import weakref  # noqa: E402

_POINTS_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def events_as_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the events table into the canonical Point schema.

    measurement = event_type; tags = {user: str(user_id)};
    fields = {value; k only for non-click events} — the conditional key
    exercises the schemaless missing-key semantics. event_id rides along
    for stable output identification.

    Memoized + Spark-cached per sf_dir: the parity queries are
    point-lookup-style, and the reference amortizes its index build the
    same way; repeated queries should hit columnar memory, not re-read
    parquet and re-parse JSON.
    """
    per_session = _POINTS_CACHE.setdefault(spark, {})
    if sf_dir in per_session:
        return per_session[sf_dir]
    ev = load_events(spark, sf_dir)
    with_k = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("double"),
    )
    without_k = F.create_map(F.lit("value"), F.col("value"))
    out = ev.select(
        F.col("event_id"),
        F.col("ts").alias("time"),
        F.col("event_type").alias("measurement"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string")
        ).alias("tags"),
        F.when(F.col("event_type") != "click", with_k)
        .otherwise(without_k)
        .alias("fields"),
    ).cache()
    per_session[sf_dir] = out
    return out


def _flat(df: DataFrame) -> DataFrame:
    """Flatten matched points to scalar columns for the oracle compare."""
    return df.select(
        "event_id",
        "time",
        "measurement",
        F.col("fields")["value"].alias("value"),
    )


_FLAT_SQL = (
    "SELECT event_id, ts AS time, event_type AS measurement, value "
    "FROM events"
)


# ----------------------------------------------------------------------
# Parity queries: the TinyFlux query algebra (SURVEY.md §2.1-2.2)
# ----------------------------------------------------------------------

def q01_search_time_range(spark, sf_dir):
    """search(TimeQuery >= t1 & TimeQuery < t2) — reference
    database.py:740-828; time-range pruning via parquet stats."""
    q = (TimeQuery() >= T_LO) & (TimeQuery() < T_HI)
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q02_search_tag_eq(spark, sf_dir):
    """search(TagQuery().user == '7') — tag equality point lookup."""
    q = TagQuery().user == "7"
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q03_search_field_range(spark, sf_dir):
    """search(FieldQuery().value >= 50 & <= 150) — field filter."""
    q = (FieldQuery().value >= 50) & (FieldQuery().value <= 150)
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q04_search_compound(spark, sf_dir):
    """Compound AND/OR/NOT over tags+fields+measurement."""
    q = ((FieldQuery().value >= 100) | (MeasurementQuery() == "click")) & ~(
        TagQuery().user == "7"
    )
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q05_search_measurement_regex(spark, sf_dir):
    """MeasurementQuery().matches('p.*') — start-anchored regex like
    re.match (reference queries.py:680-700)."""
    q = MeasurementQuery().matches("p.*")
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q06_count(spark, sf_dir):
    """count(query) as a one-row frame (reference database.py:253-291)."""
    q = (FieldQuery().value > 200) & (MeasurementQuery() != "view")
    return (
        events_as_points(spark, sf_dir)
        .where(q.compile())
        .agg(F.count("*").alias("cnt"))
    )


def q07_field_missing_key(spark, sf_dir):
    """FieldQuery on a key only some points carry: missing key → False,
    never null/error (reference queries.py:243-250)."""
    q = FieldQuery().k > 50
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q08_not_exists(spark, sf_dir):
    """~exists(): negation over resolved booleans matches points
    LACKING the key (SURVEY.md §2.1 rule 3)."""
    q = ~(FieldQuery().k.exists())
    return _flat(events_as_points(spark, sf_dir).where(q.compile()))


def q09_get_measurements(spark, sf_dir):
    """get_measurements() — sorted distinct measurement names
    (reference database.py:459-477)."""
    return (
        events_as_points(spark, sf_dir)
        .select("measurement")
        .distinct()
        .orderBy("measurement")
    )


def q10_select_projection(spark, sf_dir):
    """select(('time','tags.user','fields.value'), query) — projection
    with map extraction (reference database.py:830-974)."""
    q = (MeasurementQuery() == "purchase") & (FieldQuery().value >= 250)
    df = events_as_points(spark, sf_dir).where(q.compile())
    return df.select(
        F.col("time"),
        F.col("tags")["user"].alias("tag_user"),
        F.col("fields")["value"].alias("field_value"),
    )


# ----------------------------------------------------------------------
# Extension queries: aggregations / windows / joins (SURVEY.md §2.2 ext)
# ----------------------------------------------------------------------

def q11_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: groupBy + 6 aggregates with
    map-side partial aggregation; decimal sums for determinism."""
    li = _t("lineitem")(spark, sf_dir)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # Measured do-not-do (r13): widening the 3-split scan ahead of the
    # partial aggregation inflated task time ~15x (per-task fixed costs
    # over a detail-row shuffle) for a wall delta inside run-to-run
    # noise (A/B receipt in OPTIMIZATION_r13.md).
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
            ).cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q12_daily_revenue_ma7(spark, sf_dir):
    """Daily purchase revenue + 7-day moving average (the reference's
    AQI-notebook analysis as one plan — examples/2_analytics_workflow)."""
    ev = _t("events")(spark, sf_dir)
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        # day as a string: pandas date/timestamp conversions differ
        # between engines and would sour the value-hash.
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "revenue",
        F.avg("revenue").over(w).alias("revenue_ma7"),
    )


def q13_topk_users_per_type(spark, sf_dir):
    """Top-3 users by total value per event_type — Window ranking."""
    ev = _t("events")(spark, sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )


def q14_region_revenue(spark, sf_dir):
    """orders⋈customer⋈nation⋈region with broadcast dims: revenue and
    order count per region."""
    o = _t("orders")(spark, sf_dir)
    c = _t("customer")(spark, sf_dir)
    n = _t("nation")(spark, sf_dir)
    r = _t("region")(spark, sf_dir)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def q15_hourly_window(spark, sf_dir):
    """Tumbling 1-hour window aggregation (time-bucket rollup)."""
    ev = _t("events")(spark, sf_dir)
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    return agg.select(
        F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
    )


def q16_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the same user's most recent
    click at-or-before it. Spark lacks a native as-of join; expressed as
    union + last(ignorenulls) over a time-ordered window — one shuffle
    on user_id, no row explosion (scales to 100 TB; the per-group
    pd.merge_asof alternative would not)."""
    ev = _t("events")(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.lit(None).cast("long").alias("p_event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.col("event_id").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    # clicks sort before purchases at identical ts (click_ts non-null
    # first via secondary key) so an equal-time click is eligible.
    unioned = clicks.unionByName(purchases).withColumn(
        "is_click", F.col("click_ts").isNotNull().cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        unioned.withColumn(
            "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .where(F.col("p_event_id").isNotNull())
        .where(F.col("last_click_ts").isNotNull())
    )
    return matched.select(
        F.col("p_event_id").alias("event_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("last_click_ts").alias("prior_click_ts"),
    )


# ----------------------------------------------------------------------
# Training-data-pipeline extensions: dedup / text / similarity
# (operators live in tinyflux_spark/operators/; these queries bind them
# to the documents/embeddings tables with DuckDB-checkable outputs)
# ----------------------------------------------------------------------

def q17_dedup_exact(spark, sf_dir):
    """Exact dedup: one representative doc per normalized-text
    fingerprint (hash-groupBy — uniform keys, skew-free at scale)."""
    from tinyflux_spark.operators.dedup import exact_dedup

    return exact_dedup(_t("documents")(spark, sf_dir), "doc_id")


def q18_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs via a prefix-filtered
    set-similarity join (AllPairs/PPJoin); ground truth for the
    MinHash-LSH path."""
    from tinyflux_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t("documents")(spark, sf_dir),
        "doc_id",
        threshold=0.7,
        # Hot-shingle df-cut: bounds the prefix self-join's fan-out when
        # boilerplate recurs (max observed shingle df is 25 at sf0.1, so
        # results are unchanged here — the knob models production use).
        max_shingle_freq=1000,
    ).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q19_minhash_lsh_pairs(spark, sf_dir):
    """MinHash(12 md5 hashes) over word-3-gram shingles, banded 4x3 →
    candidate pairs → exact Jaccard verify on candidates only.
    Sub-quadratic near-dup dedup."""
    from tinyflux_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t("documents")(spark, sf_dir),
        "doc_id",
        num_hashes=12,
        bands=4,
        verify_threshold=0.7,
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q20_simhash(spark, sf_dir):
    """32-bit md5-derived SimHash signature per document."""
    from tinyflux_spark.operators.dedup import simhash

    return simhash(
        _t("documents")(spark, sf_dir), "doc_id", bits=32, use_md5=True
    ).select(F.col("id").alias("doc_id"), "simhash")


def q21_text_quality(spark, sf_dir):
    """Quality-scoring features (token counts + ratios) per document."""
    from tinyflux_spark.operators.text import quality_features

    docs = _t("documents")(spark, sf_dir)
    out = quality_features(docs, "text")
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
    )


def q22_lang_id(spark, sf_dir):
    """Heuristic language ID (script ranges + stopword argmax) with the
    corpus's labeled lang for accuracy auditing."""
    from tinyflux_spark.operators._spread import spread_scan
    from tinyflux_spark.operators.text import lang_id

    # lang_id is pure per-row compute (script-range counts + stopword
    # scan); widen the narrow projection first or the whole pass runs
    # one task per input file (no-op on well-partitioned inputs).
    docs = spread_scan(
        _t("documents")(spark, sf_dir).select("doc_id", "lang", "text"),
        "doc_id",
    )
    return docs.select(
        "doc_id", "lang", lang_id("text").alias("lang_guess")
    )


def q23_doc_fingerprint(spark, sf_dir):
    """Stable content fingerprints: whole-doc md5 + min-shingle rolling
    fingerprint (robust to local edits)."""
    from tinyflux_spark.operators.text import fingerprint, shingle_fingerprint

    docs = _t("documents")(spark, sf_dir)
    fps = docs.select(
        "doc_id", fingerprint("text").alias("content_fp")
    )
    sfp = shingle_fingerprint(docs, "doc_id", "text", n=8)
    return fps.join(sfp, "doc_id").select(
        "doc_id", "content_fp", "shingle_fp"
    )


def q24_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id 0 (similarity
    rounded to 6dp so cross-engine float accumulation can't flip
    ranks; ties break on id)."""
    from tinyflux_spark.operators.similarity import cosine_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return cosine_topk(emb.where(F.col("vec_id") != 0), qvec, k=10)


def q25_embedding_near_dup(spark, sf_dir):
    """Embedding near-duplicate pairs: cosine >= 0.35 via SRP-LSH bucket
    join + exact verify. The oracle replicates the pipeline with the
    SAME hyperplane constants (seeded, inlined into the SQL), so the
    bucket equi-join and the cosine verify are both checked."""
    from tinyflux_spark.operators.similarity import near_dup_pairs

    emb = _t("embeddings")(spark, sf_dir)
    return near_dup_pairs(emb, threshold=0.35, num_planes=2).select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    )


def q27_simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup pairs with hamming <= 3 via pigeonhole banding
    (4 bands of 8 bits; a pair within hamming 3 must agree on >= 1
    band) + exact bit_count(xor) verify on candidates only."""
    from tinyflux_spark.operators.dedup import simhash_pairs

    docs = _t("documents")(spark, sf_dir)
    return simhash_pairs(
        docs, "doc_id", bits=32, max_hamming=3, use_md5=True
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q28_sessionize(spark, sf_dir):
    """Gap-based sessionization (gaps-and-islands): per-user sessions
    with a 30-minute inactivity gap; one shuffle on user_id, one window
    pass. Batch twin of streaming session_window."""
    from tinyflux_spark.operators.aggregates import session_stats

    ev = _t("events")(spark, sf_dir)
    return session_stats(ev, "user_id", "ts", 1800.0).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
    )


def _stream_event_source(spark, sf_dir):
    """Streaming read of events.parquet with the ``ts`` vintage detected
    by a cheap batch schema probe (round-2 ADVICE): the streaming reader
    needs the schema declared up front, so mirror load_events' handling
    of all three testdata vintages — TIMESTAMP_NTZ micros (declare NTZ,
    cast to session-tz timestamp), tz'd TIMESTAMP micros (declare
    TimestampType, passthrough), and legacy TIMESTAMP(NANOS) (decodes as
    long under nanosAsLong; declare LongType, truncate to micros). Pins
    the session zone to UTC first: the NTZ→TZ cast is value-preserving
    only under UTC, and unlike load_events this path may run first."""
    from pyspark.sql import types as T

    from tinyflux_spark.streaming import ingest as st

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = dict(
        spark.read.parquet(f"{sf_dir}/events.parquet").dtypes
    )["ts"]
    ts_field = {
        "bigint": T.LongType(),
        "timestamp": T.TimestampType(),
    }.get(probe, T.TimestampNTZType())
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = st.point_stream_from_files(
        spark, sf_dir, schema, path_glob="events.parquet"
    )
    if probe == "bigint":
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if probe == "timestamp":
        return stream
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def q26_stream_hourly_rollup(spark, sf_dir):
    """Structured Streaming path: the same hourly rollup as q15 computed
    by a streaming query over a finite file source (availableNow,
    complete mode) — verifying the batch/stream unification. Oracle:
    identical SQL to q15."""
    import uuid

    from tinyflux_spark.streaming import ingest as st

    stream = _stream_event_source(spark, sf_dir)
    rollup = st.windowed_rollup(
        stream,
        "ts",
        "1 hour",
        [
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        ],
        group_cols=["event_type"],
    )
    name = f"q26_out_{uuid.uuid4().hex[:8]}"
    # 8 state partitions, not the session's 32: each shuffle partition
    # of a stateful query is its own state store, pure per-batch
    # overhead at this key cardinality.
    st.run_to_memory(rollup, name, output_mode="complete",
                     shuffle_partitions=8)
    return spark.table(name).select(
        F.col("window.start").alias("hour"), "event_type", "n", "sum_value"
    )


def q29_ewma_last(spark, sf_dir):
    """Per-user FINAL EWMA (alpha=0.3) over the time-ordered value
    series — JVM-side array fold, one shuffle on the key. Oracle:
    DuckDB list_reduce over the same ordered list."""
    from tinyflux_spark.operators.aggregates import ewma_last

    ev = _t("events")(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = ewma_last(ev, "user_id", "ts", "value", alpha=0.3)
    return out.select("user_id", F.round("ewma", 6).alias("ewma"))


def q30_token_stats(spark, sf_dir):
    """Token counting per document: whitespace tokens + BPE-ish regex
    tokens (word runs and single punctuation marks)."""
    from tinyflux_spark.operators.text import bpe_token_count, token_count

    docs = _t("documents")(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_ws_tokens"),
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


def q31_srp_ann_topk(spark, sf_dir):
    """ANN scale path: SRP-LSH bucketed top-10 for vec_id 0 with 1-bit
    multiprobe (4 planes, seed 42). At corpus scale the bucket is a
    cluster/partition column and the probe prunes to
    ~|corpus|/2^planes rows per bucket; here the oracle recomputes the
    same seeded buckets in SQL so candidate selection AND ranking are
    both checked."""
    from tinyflux_spark.operators.similarity import srp_lsh_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return srp_lsh_topk(
        emb.where(F.col("vec_id") != 0),
        qvec,
        k=10,
        num_planes=4,
        seed=42,
        multiprobe=1,
    )


def q32_frame_sample_plan(spark, sf_dir):
    """Multimodal plumbing: video frame-sampling plan (which frames to
    decode, fan-out BEFORE the stubbed codec so decode parallelism is
    per-frame). Deterministic synthetic media table; oracle generates
    the same plan from the metadata rule."""
    from tinyflux_spark.operators.multimodal import (
        frame_sample,
        synthetic_media,
    )

    media = synthetic_media(spark, n=32, kind="video")
    return frame_sample(media, every_n=10, max_frames=8).select(
        "media_id", "frame_idx"
    )


def q33_media_features(spark, sf_dir):
    """Multimodal feature extraction through mapInPandas (Arrow batches,
    bytes projected away before any shuffle) with the REAL decode path:
    the table holds genuine PNG bytes (zlib IDAT + CRC chunks) of a
    closed-form pixel pattern, media_decode parses and unfilters them,
    and each feature is the mean of one pixel row. The oracle
    recomputes the pixels from the generative formula in SQL — a wrong
    byte anywhere in encode or decode breaks the hash match."""
    from tinyflux_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        media_decode,
        synthetic_media,
    )

    media = synthetic_media(spark, n=64, kind="image", codec="png")
    out = extract_features(media, decode=media_decode)
    return out.select(
        "media_id",
        "kind",
        F.round(F.col("feature")[0], 6).alias("f0"),
        F.round(F.col("feature")[FEATURE_DIM - 1], 6).alias("f_last"),
        "n_bytes",
    )


def q34_get_field_keys(spark, sf_dir):
    """get_field_keys(): sorted distinct field keys across the dynamic
    per-point field sets (reference database.py:388-419)."""
    pts = events_as_points(spark, sf_dir)
    return (
        pts.select(F.explode(F.map_keys("fields")).alias("field_key"))
        .distinct()
        .orderBy("field_key")
    )


def q35_get_tag_values(spark, sf_dir):
    """get_tag_values(): distinct (tag_key, tag_value) pairs, flattened
    to scalar rows so the driver's canonicalizer can sort them
    (reference database.py:512-558 returns {key: sorted values}; the
    exploded rows carry identical information)."""
    pts = events_as_points(spark, sf_dir)
    return (
        pts.select(F.explode("tags").alias("tag_key", "tag_value"))
        .distinct()
        .orderBy("tag_key", "tag_value")
    )


def q36_stream_ewma(spark, sf_dir):
    """Custom stateful streaming operator: per-user running EWMA +
    deviation via applyInPandasWithState (state store persists (count,
    ewma) across micro-batches). Oracle: per-row prefix folds over the
    same (ts)-ordered series."""
    import uuid

    from tinyflux_spark.streaming import ingest as st

    stream = _stream_event_source(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = st.stateful_ewma(stream, "user_id", "ts", "value", alpha=0.3)
    name = f"q36_out_{uuid.uuid4().hex[:8]}"
    st.run_to_memory(out, name, output_mode="append",
                     shuffle_partitions=8)
    return spark.table(name).select(
        "user_id",
        "ts",
        "value",
        F.round("ewma", 6).alias("ewma"),
        F.round("dev", 6).alias("dev"),
    )


T_DML_HI = datetime(2024, 1, 12, tzinfo=timezone.utc)

_RO_STORE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _dml_slice(spark, sf_dir):
    """Canonical 2-day slice of events with the event_id riding in tags
    (Points have no IDs — reference design-principles.rst:34-36 — so the
    oracle needs one smuggled in). repartition(1) + sortWithinPartitions
    makes monotonically_increasing_id — and therefore the durable _seq —
    follow event_id order deterministically."""
    pts = events_as_points(spark, sf_dir).where(
        (F.col("time") >= F.lit(T_LO)) & (F.col("time") < F.lit(T_DML_HI))
    )
    return (
        pts.repartition(1)
        .sortWithinPartitions("event_id")
        .select(
            "time",
            "measurement",
            F.map_concat(
                "tags",
                F.create_map(
                    F.lit("eid"), F.col("event_id").cast("string")
                ),
            ).alias("tags"),
            "fields",
        )
    )


def _fresh_dml_store(spark, sf_dir):
    """index_tags routes every DML/introspection gate through the
    materialized-scalar pushdown path (tag equality reaches
    PushedFilters) — so q37-q45/q49 oracle-check that path's answers,
    not just the MapType compile."""
    import tempfile

    from tinyflux_spark import TinyFluxSpark

    db = TinyFluxSpark(
        tempfile.mkdtemp(prefix="tfs_dml_"), index_tags=["user"]
    )
    db.insert_dataframe(_dml_slice(spark, sf_dir))
    return db


def q37_dml_update_unset_remove(spark, sf_dir):
    """Full DML round-trip on a throwaway partitioned store (reference
    database.py:976-1435): field-merge update, unset_tags update, then
    remove. The oracle replays the same mutations as a pure SELECT
    transformation over the source rows."""
    db = _fresh_dml_store(spark, sf_dir)
    db.update(FieldQuery().value > 100, fields={"flag": 1.0})
    db.update(MeasurementQuery() == "click", unset_tags=["user"])
    db.remove(FieldQuery().value > 200)
    return db.dataframe().select(
        F.col("tags")["eid"].cast("long").alias("eid"),
        "measurement",
        F.col("tags")["user"].alias("user_tag"),
        F.col("fields")["value"].alias("value"),
        F.col("fields")["flag"].alias("flag"),
    )


def q38_get_contains(spark, sf_dir):
    """get() = first match by durable insertion order (_seq, reference
    database.py:315-386) plus contains() existence probes (reference
    database.py:209-251) — including the missing-key ⇒ False rule."""
    db = _ro_store(spark, sf_dir)
    p = db.get(FieldQuery().value > 100)
    has_user = db.contains(TagQuery().user == p.tags["user"])
    has_missing = db.contains(FieldQuery().no_such_key.exists())
    return spark.createDataFrame(
        [(
            int(p.tags["eid"]),
            p.measurement,
            p.fields["value"],
            has_user,
            has_missing,
        )],
        "eid long, measurement string, value double, "
        "has_user boolean, has_missing boolean",
    )


def _ro_store(spark, sf_dir):
    """Shared read-only DML-slice store (same cache as q38)."""
    per_session = _RO_STORE_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        per_session[sf_dir] = _fresh_dml_store(spark, sf_dir)
    return per_session[sf_dir]


_DML_WHERE = (
    "ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'"
)


def q39_get_tag_keys(spark, sf_dir):
    """get_tag_keys(): sorted distinct tag keys across the store
    (reference database.py:459-510) — every slice row carries both
    'eid' and 'user'."""
    db = _ro_store(spark, sf_dir)
    return spark.createDataFrame(
        [(k,) for k in db.get_tag_keys()], "tag_key string"
    )


def q40_get_field_values(spark, sf_dir):
    """get_field_values('k'): values in insertion order, rows lacking
    the key skipped (reference database.py:421-457). 'k' exists only on
    non-click events, so the missing-key skip is exercised; insertion
    order is event_id order by _dml_slice construction."""
    db = _ro_store(spark, sf_dir)
    vals = db.get_field_values("k")
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, k double"
    )


def q41_get_timestamps(spark, sf_dir):
    """get_timestamps(): every point's time in insertion order
    (reference database.py:560-598)."""
    db = _ro_store(spark, sf_dir)
    ts = db.get_timestamps()
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "idx long, time timestamp"
    )


def q42_all_len_iter(spark, sf_dir):
    """all(sorted=True) (time-ordered), iter(db) (insertion-ordered) and
    len(db) in one frame: idx_all / idx_iter are each point's position
    under the two orderings, n_total rides along as a constant
    (reference database.py:143-188)."""
    db = _ro_store(spark, sf_dir)
    n = len(db)
    rows: dict = {}
    for i, p in enumerate(db.all(sorted=True)):
        rows[p.tags["eid"]] = [i, None, p.time, p.measurement,
                               p.fields["value"]]
    for i, p in enumerate(db):
        rows[p.tags["eid"]][1] = i
    return spark.createDataFrame(
        [
            (int(eid), r[0], r[1], r[2], r[3], r[4], n)
            for eid, r in rows.items()
        ],
        "eid long, idx_all long, idx_iter long, time timestamp, "
        "measurement string, value double, n_total long",
    )


def q43_update_all(spark, sf_dir):
    """update_all(): unconditional update — internally
    update(TimeQuery().noop(), ...), so the noop predicate (matches
    everything, mutates nothing) is gated here too (reference
    database.py:1020-1062, queries.py:749-758)."""
    db = _fresh_dml_store(spark, sf_dir)
    db.update_all(fields={"seen": 1.0})
    return db.dataframe().select(
        F.col("tags")["eid"].cast("long").alias("eid"),
        F.col("fields")["value"].alias("value"),
        F.col("fields")["seen"].alias("seen"),
    )


def q44_remove_all(spark, sf_dir):
    """remove_all(): truncate (reference database.py:727-738). Output is
    the before/after row counts."""
    db = _fresh_dml_store(spark, sf_dir)
    n_before = len(db)
    db.remove_all()
    return spark.createDataFrame(
        [(n_before, len(db))], "n_before long, n_after long"
    )


def q45_drop_measurement(spark, sf_dir):
    """drop_measurement('click'): partition drop, returns the dropped
    count; remaining measurements keep their rows (reference
    database.py:293-313)."""
    db = _fresh_dml_store(spark, sf_dir)
    n_dropped = db.drop_measurement("click")
    per = (
        db.dataframe()
        .groupBy("measurement")
        .agg(F.count("*").alias("n"))
    )
    return per.withColumn("n_dropped", F.lit(n_dropped).cast("long"))


def _first_events(spark, sf_dir, n=200):
    """First n events by event_id as driver-side Points — the point-path
    ingestion fixture (oracle: the same rows via ORDER BY/LIMIT)."""
    from tinyflux_spark import Point

    rows = (
        load_events(spark, sf_dir)
        .withColumn(
            "k", F.get_json_object("props", "$.k").cast("double")
        )
        .orderBy("event_id")
        .limit(n)
        .collect()
    )
    pts = []
    for r in rows:
        fields = {"value": r["value"]}
        if r["event_type"] != "click":
            fields["k"] = r["k"]
        pts.append(
            Point(
                time=r["ts"].replace(tzinfo=timezone.utc),
                measurement=r["event_type"],
                tags={
                    "user": str(r["user_id"]),
                    "eid": str(r["event_id"]),
                },
                fields=fields,
            )
        )
    return pts


def _flat_store(db):
    return db.dataframe().select(
        F.col("tags")["eid"].cast("long").alias("eid"),
        "time",
        "measurement",
        F.col("tags")["user"].alias("user"),
        F.col("fields")["value"].alias("value"),
        F.col("fields")["k"].alias("k"),
    )


def q46_insert_point_path(spark, sf_dir):
    """Point-path ingestion into the partitioned parquet store:
    insert() one point, then insert_multiple() from a generator
    (reference database.py:600-656) — full data fidelity round-trip of
    time/measurement/tags/fields including the conditionally-absent
    'k'."""
    import tempfile

    from tinyflux_spark import TinyFluxSpark

    pts = _first_events(spark, sf_dir)
    db = TinyFluxSpark(tempfile.mkdtemp(prefix="tfs_pt_"))
    db.insert(pts[0])
    db.insert_multiple(p for p in pts[1:])
    return _flat_store(db)


def q47_map_test_predicates(spark, sf_dir):
    """.map(func) and .test(func) predicates — the Python-UDF escape
    hatch (reference queries.py:648-747): user tag mapped to
    int(u) % 7 == 3, AND a .test lambda on the value field."""
    # Measured do-not-do (r13): widening the single-split events scan
    # ahead of this UDF filter needs the UDF marked nondeterministic
    # (the filter otherwise pushes below the repartition, keeping the
    # Python pass single-task) — and that marker breaks the pinned
    # non-UDF-conjunct isolation property, while the widened pass pays
    # ~15x task time in per-task Python worker fan-out for ~0.15 s of
    # wall. At scale a multi-split corpus parallelizes this naturally.
    pts = events_as_points(spark, sf_dir)
    q = (TagQuery().user.map(lambda u: str(int(u) % 7)) == "3") & (
        FieldQuery().value.test(
            lambda v: v is not None and 30.0 < v < 60.0
        )
    )
    return _flat(pts.where(q.compile()))


def q48_search_predicate(spark, sf_dir):
    """.search(regex) — unanchored containment, vs .matches() anchoring
    (reference queries.py:672-697) — on both the measurement and a tag."""
    pts = events_as_points(spark, sf_dir)
    q = MeasurementQuery().search("ick|rror") & TagQuery().user.search(
        "^4"
    )
    return _flat(pts.where(q.compile()))


def q49_measurement_handle(spark, sf_dir):
    """Measurement handle scoping (reference measurement.py:140-395):
    db.measurement('click').search(...) sees only click points; len(m)
    rides along as a constant column."""
    db = _ro_store(spark, sf_dir)
    m = db.measurement("click")
    n_click = len(m)
    got = m.search(FieldQuery().value > 150)
    return spark.createDataFrame(
        [
            (int(p.tags["eid"]), p.fields["value"], n_click)
            for p in got
        ],
        "eid long, value double, n_click long",
    )


def q50_csv_interop(spark, sf_dir):
    """Reference-format CSV codec round-trip: write via the engine with
    compact t_/f_ key prefixes (reference point.py:106-107,307-367),
    reopen the same file with a fresh handle, read everything back."""
    import os
    import tempfile

    from tinyflux_spark import TinyFluxSpark
    from tinyflux_spark.storages import CSVStorage

    pts = _first_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="tfs_csv_"), "db.csv")
    w = TinyFluxSpark(path, storage=CSVStorage, spark=spark)
    w.insert_multiple(pts, compact_key_prefixes=True)
    w.close()
    r = TinyFluxSpark(path, storage=CSVStorage, spark=spark)
    return _flat_store(r)


def q52_ivf_ann_topk(spark, sf_dir):
    """IVF-Flat ANN (second scale path beside q31's SRP-LSH): corpus
    vectors assigned to their nearest of 16 deterministic codebook
    centroids; the query probes the 4 nearest inverted lists and
    brute-forces only those (~25% of the corpus). The oracle replays
    codebook selection, list assignment, probe ranking, and final
    ranking in SQL, so every stage of the index is hash-checked."""
    from tinyflux_spark.operators.similarity import ivf_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_topk(
        emb.where(F.col("vec_id") != 0),
        qvec,
        k=10,
        num_centroids=16,
        nprobe=4,
    )


def q51_dedup_clusters(spark, sf_dir):
    """Duplicate clusters: exact-Jaccard near-dup pairs (q18's ground
    truth edges) closed transitively via iterative HashMin label
    propagation — each doc in a duplicate component labeled with the
    component's min doc_id. The oracle replays the fixpoint as a
    recursive CTE, so the iterative Spark operator is hash-checked."""
    from tinyflux_spark.operators.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _t("documents")(spark, sf_dir), "doc_id", threshold=0.7
    )
    return duplicate_clusters(pairs).orderBy("node")


_IVF_INDEX_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def q59_ivf_indexed_topk(spark, sf_dir):
    """The persisted-IVF serving path: the corpus's inverted lists are
    materialized ONCE as ``_ivf_list`` partition directories (built per
    session here; at scale a standing index), and the query scans only
    its 4 probed directories — PartitionFilters pruning, asserted in
    tests/test_plans.py. Same codebook and assignment math as q52, so
    the q52 oracle gates this path bit-for-bit too."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_topk_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivf_")
        ivf_write_index(corpus, path, num_centroids=16)
        per_session[sf_dir] = path
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_topk_indexed(
        spark, per_session[sf_dir], qvec, k=10, nprobe=4
    )


def q53_hash_sample(spark, sf_dir):
    """Deterministic Bernoulli sample (25%) of the documents corpus:
    keep a doc iff the 4-hex-digit prefix of md5('s53:<doc_id>') falls
    below the rate. A pure codegen'd filter — no shuffle, no rand() —
    reproducible across runs, partitionings, and engines; the oracle
    recomputes the identical md5 threshold check in SQL."""
    from tinyflux_spark.operators.sampling import hash_sample

    docs = _t("documents")(spark, sf_dir)
    return hash_sample(docs, "doc_id", rate=0.25, salt="s53").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


def q54_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality metrics per document: word and
    word-bigram duplication fractions via split / array_distinct /
    transform — a narrow per-row map, no explode and no shuffle."""
    from tinyflux_spark.operators.text import repetition_stats

    docs = _t("documents")(spark, sf_dir)
    return repetition_stats(docs, "doc_id")


def q55_source_quota(spark, sf_dir):
    """Per-source quota sampling (domain-mix rebalancing): cap every
    source at 10 documents chosen by deterministic md5 order. The
    window sort distributes across sources; the oracle replays the
    same (md5, id) ranking in SQL."""
    from tinyflux_spark.operators.sampling import stratified_quota

    docs = _t("documents")(spark, sf_dir)
    return stratified_quota(
        docs, "source", "doc_id", n_per_stratum=10, salt="s55"
    ).select("doc_id", "source")


def q56_embedding_dup_clusters(spark, sf_dir):
    """Embedding-space duplicate clusters: q25's SRP-bucketed cosine
    near-dup pairs closed transitively with the same HashMin label
    propagation as q51 — text dedup and embedding dedup share one
    clustering operator. Oracle: recursive CTE over the seeded-
    hyperplane pair SQL."""
    from tinyflux_spark.operators.dedup import duplicate_clusters
    from tinyflux_spark.operators.similarity import near_dup_pairs

    emb = _t("embeddings")(spark, sf_dir)
    pairs = near_dup_pairs(emb, threshold=0.35, num_planes=2)
    return duplicate_clusters(pairs).orderBy("node")


def q58_dedup_keep_canonical(spark, sf_dir):
    """Corpus after near-dup removal: q51's exact-Jaccard pair edges
    closed into clusters, then every non-canonical member (node !=
    cluster min) anti-joined away — singletons always survive. The
    oracle replays closure + anti-join in SQL, so the end-to-end
    'which documents remain' answer is hash-checked, not just the
    intermediate pairs."""
    from tinyflux_spark.operators.dedup import (
        dedup_keep_canonical,
        ngram_jaccard_pairs,
    )

    docs = _t("documents")(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, "doc_id", threshold=0.7)
    return dedup_keep_canonical(docs, pairs, "doc_id").select(
        "doc_id", "source"
    )


def q57_length_deciles(spark, sf_dir):
    """Exact length-decile profile of the corpus (dataset profiling):
    value-based deciles of n_chars via a distributed histogram — the
    cumulative window runs over |distinct lengths| rows, never the
    corpus, so no global row sort exists in the plan."""
    from tinyflux_spark.operators.aggregates import value_deciles

    docs = _t("documents")(spark, sf_dir)
    return value_deciles(docs, "n_chars", k=10).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_rows",
        F.col("min_val").cast("long").alias("min_chars"),
        F.col("max_val").cast("long").alias("max_chars"),
    ).orderBy("bucket")


def q60_resample_gapfill(spark, sf_dir):
    """Irregular events regularized onto a 5-minute grid per event_type
    (avg value per bucket), densified to every bucket in each key's span
    and linearly interpolated across the gaps — the classic sensor
    resample+fill the reference leaves to user Python loops
    (reference examples/2_analytics_workflow.py). Grid built per key via
    sequence+explode (bounded by that key's own span), fills are
    key-partitioned windows; all bucket math in integer epoch seconds so
    the DuckDB generate_series oracle replays it exactly."""
    from tinyflux_spark.operators.timeseries import gap_fill, resample

    ev = _t("events")(spark, sf_dir)
    r = resample(ev, "ts", "event_type", "value", interval_sec=300)
    # The gate ships the filled value as integer micro-units via an
    # explicit floor(x*1e6 + 0.5): linear interpolation produces exact
    # decimal TIES (frac=1/2 over 6dp inputs) and Spark's HALF_UP
    # round vs DuckDB's round break them differently; floor over the
    # bit-identical IEEE product is engine-portable.
    out = gap_fill(r, interval_sec=300, fill="linear", round_digits=None)
    return out.select(
        "key",
        "bucket_s",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("value_u"),
        F.col("n_obs").cast("long").alias("n_obs"),
        "is_gap",
    )


def q61_rolling_zscore(spark, sf_dir):
    """Trailing-window anomaly detection: per user, each event's value
    z-scored against the previous 20 events (history only — a spike
    can't mask itself); rows with |z| > 2.5 flagged. One window pass
    partitioned by user_id with a total (ts, event_id) order."""
    from tinyflux_spark.operators.timeseries import rolling_zscore

    ev = _t("events")(spark, sf_dir)
    out = rolling_zscore(
        ev, "ts", "user_id", "value",
        lookback=20, threshold=2.5, order_cols=["ts", "event_id"],
    )
    return out.where(F.col("is_anomaly")).select(
        "event_id", "user_id", "value", "zscore"
    )


def q62_top_tokens(spark, sf_dir):
    """Corpus vocabulary heavy hitters: the 50 most frequent whitespace
    tokens (ties broken lexicographically). Distributed wordcount —
    map-side partial aggregation keeps shuffle volume at per-partition
    distinct tokens; the top-k is a TakeOrdered over the vocabulary,
    never a global sort of corpus tokens."""
    from tinyflux_spark.operators.text import top_tokens

    docs = _t("documents")(spark, sf_dir)
    return top_tokens(docs, "text", k=50)


def q63_scrub_pii(spark, sf_dir):
    """PII/identifier scrub over the corpus: emails, URLs, and 6+-digit
    runs replaced by typed placeholders in a fixed order. The synthetic
    corpus contains no such strings, so the gate appends deterministic
    doc_id-derived PII (an email, a URL, a 7-digit id) to every row in
    BOTH engines first — every row exercises all three replacements, and
    the md5 of the scrubbed text value-checks the whole rewrite. Narrow
    codegen'd regexp chain — no shuffle."""
    from tinyflux_spark.operators.text import scrub_text

    docs = _t("documents")(spark, sf_dir).select(
        "doc_id",
        F.concat(
            # null text ≡ '' (the engine-wide rule) — concat(null, ..)
            # would otherwise null out the appended PII entirely
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.org via https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" ref "), (F.col("doc_id") + 1000000).cast("string"),
        ).alias("text"),
    )
    return scrub_text(docs, "doc_id").select(
        "doc_id",
        F.md5(F.col("scrubbed")).alias("scrub_fp"),
        "n_redactions",
        "was_scrubbed",
    )


def q64_chunk_documents(spark, sf_dir):
    """Pre-embedding document chunking: overlapping 60-word windows with
    12 words of overlap (stride 48). Chunk text is fingerprinted so
    every chunk's exact content is value-checked. Split + sequence +
    slice computed before the explode — per-document narrow work, no
    shuffle."""
    from tinyflux_spark.operators.text import chunk_documents

    docs = _t("documents")(spark, sf_dir)
    return chunk_documents(
        docs, "doc_id", "text", chunk_words=60, overlap=12
    ).select(
        "doc_id",
        "chunk_idx",
        "n_chunk_words",
        F.md5(F.col("chunk_text")).alias("chunk_fp"),
    )


def q65_derivative(spark, sf_dir):
    """Per-user rate of change between consecutive events (the
    InfluxDB ``derivative()`` analog): one lag-window pass per key.
    The gate ships the rate as floor-quantized micro-units — dv/dt is
    a small rational whose decimal expansion can terminate exactly on
    the 7th digit (a round-6 tie), the same cross-engine hazard q60
    dodges the same way."""
    from tinyflux_spark.operators.timeseries import derivative

    ev = _t("events")(spark, sf_dir)
    out = derivative(
        ev, "ts", "user_id", "value",
        order_cols=["ts", "event_id"], round_digits=None,
    )
    return out.where(F.col("rate").isNotNull()).select(
        "event_id",
        "user_id",
        F.floor(F.col("rate") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("rate_u"),
    )


def q66_percentiles(spark, sf_dir):
    """Exact per-event-type value percentiles (ANSI PERCENTILE_CONT
    linear interpolation — reproducible, unlike approx_percentile):
    corpus/SLA profiling. One shuffle on the 5-key groupBy; the order
    statistics are computed per group, no global sort."""
    from tinyflux_spark.operators.aggregates import percentile_summary

    ev = _t("events")(spark, sf_dir)
    return percentile_summary(ev, "event_type", "value")


def q67_db_sql(spark, sf_dir):
    """ANSI SQL over the live store: db.sql() registers the canonical
    (time, measurement, tags, fields) view and hands the statement to
    Catalyst — the full SQL surface (joins, CTEs, windows) on top of
    the reference's query algebra, for free on Spark. Gate: a grouped
    aggregate with a map-key predicate, replayed on the raw slice."""
    db = _ro_store(spark, sf_dir)
    return db.sql(
        """
        SELECT measurement,
               COUNT(*) AS n,
               ROUND(SUM(fields['value']), 6) AS total_value
        FROM points
        WHERE fields['value'] >= 50
        GROUP BY measurement
        """
    )


def q68_downsample(spark, sf_dir):
    """Retention downsampling end-to-end (the InfluxDB retention-policy
    + continuous-query analog the reference lacks): build a throwaway
    parquet store from the 2-day slice, roll everything before the
    midpoint up to one point per (measurement, tag set, hour) with
    per-field-key avg, keep the newer day raw, and return the resulting
    store contents. The oracle replays the rollup + raw union in SQL;
    timestamps ship as epoch seconds."""
    import tempfile
    from datetime import datetime, timezone as _tz

    from tinyflux_spark import TinyFluxSpark

    db = TinyFluxSpark(tempfile.mkdtemp(prefix="tfs_ds_"))
    pts = events_as_points(spark, sf_dir).where(
        (F.col("time") >= F.lit(T_LO)) & (F.col("time") < F.lit(T_DML_HI))
    )
    db.insert_dataframe(pts.select("time", "measurement", "tags", "fields"))
    db.downsample(
        datetime(2024, 1, 11, tzinfo=_tz.utc), interval_sec=3600, agg="avg"
    )
    return db.dataframe().select(
        F.unix_timestamp("time").cast("long").alias("t_s"),
        "measurement",
        F.col("tags")["user"].alias("user"),
        F.round(F.col("fields")["value"], 6).alias("value"),
        F.round(F.col("fields")["k"], 6).alias("k"),
    )


def q69_from_table(spark, sf_dir):
    """Generic tabular->points connector: declare which source columns
    are time / measurement / tags / fields and get the canonical frame
    (sources.from_table) — the ingest surface for any format Spark
    reads. Narrow projection, no shuffle; per-row measurement from a
    category column, a tag carried under its own name, one passthrough
    field, one computed field, and a sometimes-null field all
    value-checked."""
    from tinyflux_spark.sources import from_table

    ev = load_events(spark, sf_dir)
    pts = from_table(
        ev,
        "ts",
        measurement=F.col("event_type"),
        tag_cols=["user_id"],
        field_map={
            "value": F.col("value"),
            "half": F.col("value") / 2,
            "k": F.get_json_object("props", "$.k").cast("double"),
        },
    )
    return pts.select(
        F.unix_timestamp("time").cast("long").alias("t_s"),
        "measurement",
        F.col("tags")["user_id"].alias("user"),
        F.col("fields")["value"].alias("value"),
        F.round(F.col("fields")["half"], 6).alias("half"),
        F.col("fields")["k"].alias("k"),
    )


def q70_stream_rollup_store(spark, sf_dir):
    """Continuous-query retention end-to-end: the 2-day slice streamed
    through stream_rollup_insert lands in a SECOND store already rolled
    up to one point per (measurement, user tag set, hour), every field
    key aggregated independently. Append mode emits only windows whose
    end the final watermark passed (= max event time with 0s delay), so
    the oracle applies the same horizon. Verifies the streaming and
    batch downsample paths against one SQL definition."""
    import tempfile

    from tinyflux_spark import TinyFluxSpark
    from tinyflux_spark.schema import POINT_SCHEMA
    from tinyflux_spark.storages import ParquetStorage
    from tinyflux_spark.streaming import ingest as st

    pts = events_as_points(spark, sf_dir).where(
        (F.col("time") >= F.lit(T_LO)) & (F.col("time") < F.lit(T_DML_HI))
    ).select("time", "measurement", "tags", "fields")
    src_dir = tempfile.mkdtemp(prefix="tfs_q70src_")
    pts.write.mode("overwrite").parquet(src_dir)
    stream = st.point_stream_from_files(spark, src_dir, POINT_SCHEMA)
    target = ParquetStorage(tempfile.mkdtemp(prefix="tfs_q70_"), spark)
    # 8 state partitions for the stateful agg (each is its own state
    # store); restore only after the finite query has terminated —
    # micro-batches plan asynchronously after start().
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = st.stream_rollup_insert(
            target, stream, "1 hour", watermark="0 seconds",
            checkpoint_dir=tempfile.mkdtemp(prefix="tfs_q70ck_"),
        )
        q.awaitTermination(240)
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    db = TinyFluxSpark(storage=target, spark=spark)
    return db.dataframe().select(
        F.unix_timestamp("time").cast("long").alias("t_s"),
        "measurement",
        F.col("tags")["user"].alias("user"),
        F.round(F.col("fields")["value"], 6).alias("value"),
        F.round(F.col("fields")["k"], 6).alias("k"),
    )


def q71_time_travel(spark, sf_dir):
    """MVCC time travel end-to-end: run two destructive ops against a
    throwaway store (keep_versions=4), then read the ORIGINAL snapshot,
    the intermediate snapshot, and the live state out of one store and
    union them tagged by snapshot. The oracle replays all three states
    as pure SELECT transformations of the slice — so the versioned
    layout's point-in-time semantics are value-checked, not just
    pytest-asserted."""
    import tempfile

    from tinyflux_spark import TinyFluxSpark

    db = TinyFluxSpark(
        tempfile.mkdtemp(prefix="tfs_tt_"), spark=spark, keep_versions=4
    )
    db.insert_dataframe(_dml_slice(spark, sf_dir))
    v0 = db.versions()[-1]
    db.update(FieldQuery().value > 100, fields={"flag": 1.0})
    v1 = db.versions()[-1]
    db.remove(FieldQuery().value > 200)

    def shape(df, tag):
        return df.select(
            F.lit(tag).alias("snap"),
            F.col("tags")["eid"].cast("long").alias("eid"),
            "measurement",
            F.col("fields")["value"].alias("value"),
            F.col("fields")["flag"].alias("flag"),
        )

    return (
        shape(db.dataframe(version=v0), "v0")
        .unionByName(shape(db.dataframe(version=v1), "v1"))
        .unionByName(shape(db.dataframe(), "live"))
    )


def q72_decontaminate(spark, sf_dir):
    """Train/test decontamination: hold out doc_id % 41 == 0 as the
    eval set, flag every training doc sharing any 3-word-gram with it
    (distinct shared-shingle count + the first shared shingle as
    evidence). The eval shingle set broadcasts; the train corpus is
    never shuffled on raw n-gram text. Production uses 8-13-grams —
    3 here so the synthetic corpus yields a non-trivial hit set.
    Reference has no analog (single-corpus engine); the extension is
    the standard GPT-3-style decontamination pass."""
    from tinyflux_spark.operators.dedup import contamination_hits

    docs = _t("documents")(spark, sf_dir)
    test = docs.where(F.col("doc_id") % 41 == 0)
    train = docs.where(F.col("doc_id") % 41 != 0)
    return contamination_hits(train, test, "doc_id", n=3).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "sample_shingle",
    )


def q73_shard_assign(spark, sf_dir):
    """Deterministic training-shard assignment: md5-derived shard id
    per document (8 shards), independent of row order, partitioning,
    and engine — the split that must not drift between runs. Per-row
    output so the oracle checks every single assignment."""
    from tinyflux_spark.operators.sampling import shard_assign

    docs = _t("documents")(spark, sf_dir)
    return shard_assign(docs, "doc_id", 8, salt="s73").select(
        "doc_id", F.col("shard").cast("long").alias("shard")
    )


def q74_pack_sequences(spark, sf_dir):
    """Contiguous sequence packing for training batches: shard the
    corpus (4 shards), lay docs out in deterministic hash order within
    each shard, concatenate, cut at 256-token boundaries. Per-row
    (pack, pack_offset) so the oracle value-checks the entire layout,
    not just pack counts."""
    from tinyflux_spark.operators.sampling import shard_assign
    from tinyflux_spark.operators.text import pack_sequences, token_count

    docs = _t("documents")(spark, sf_dir)
    staged = shard_assign(docs, "doc_id", 4, salt="s74").withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    packed = pack_sequences(
        staged, "doc_id", "n_tokens", capacity=256,
        shard_col="shard", salt="p74",
    )
    return packed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        "pack",
        "pack_offset",
    )


def q75_ivf_batch_topk(spark, sf_dir):
    """Batch ANN: top-5 IVF neighbors for EVERY query in a batch
    (vec_id % 100 == 0) in one plan — probe lists selected engine-side
    per query, the exploded query batch broadcast against the corpus
    assignment (the corpus itself is never shuffled), per-query top-k
    as a window over candidates only. The oracle replays the codebook,
    assignment, per-query probes, and ranking in SQL."""
    from tinyflux_spark.operators.similarity import ivf_topk_batch

    emb = _t("embeddings")(spark, sf_dir)
    return ivf_topk_batch(
        emb,
        emb.where(F.col("vec_id") % 100 == 0),
        k=5,
        num_centroids=16,
        nprobe=4,
    )


def q76_quality_filter(spark, sf_dir):
    """Composite Gopher-style quality gate: per-doc keep/drop plus the
    sorted list of violated rule names (the audit trail real filters
    log). One narrow codegen pass — token count, punct/digit ratios,
    mean token length, word/bigram duplication — no joins, no shuffle.
    Thresholds tuned so the synthetic corpus splits meaningfully; the
    oracle replays every rule including the 6dp rounding."""
    from tinyflux_spark.operators.text import quality_filter

    docs = _t("documents")(spark, sf_dir)
    out = quality_filter(
        docs,
        "doc_id",
        min_tokens=20,
        max_tokens=90,
        max_punct_ratio=0.10,
        max_digit_ratio=0.20,
        max_dup_word_frac=0.65,
        max_dup_bigram_frac=0.50,
    )
    # Gate contract: scalar-only output columns (the driver's result
    # canonicalizer cannot sort array cells — the q35 lesson). The
    # operator keeps its array<string> API; the gate entry flattens.
    return out.withColumn("reasons", F.array_join("reasons", "|"))


def q77_bm25_scores(spark, sf_dir):
    """BM25 relevance of every document against a fixed query-term bag.
    The IN-filter on query terms applies at the token explode, so only
    matching (doc, term) rows reach a shuffle; corpus stats (N, avgdl)
    and per-term document frequencies are tiny broadcast aggregates."""
    from tinyflux_spark.operators.text import bm25_scores

    docs = _t("documents")(spark, sf_dir)
    out = bm25_scores(docs, ["hash", "join", "vector"], "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_matched_terms",
        F.round("score", 6).alias("score"),
    )


def q78_quantize_embeddings(spark, sf_dir):
    """Scalar int8 max-abs quantization of the embedding column — the
    4x storage/serving compression step for a 100 TB vector table.
    Fully narrow (one higher-order pass per row, no shuffle); outputs
    flattened to scalars so the cross-engine compare is type-exact."""
    from tinyflux_spark.operators.similarity import quantize_embeddings

    emb = _t("embeddings")(spark, sf_dir)
    q = quantize_embeddings(emb, "embedding", "vec_id")
    sum_abs_q = F.aggregate(
        "q", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
    )
    return q.select(
        F.col("id").alias("vec_id"),
        F.round("scale", 6).alias("scale"),
        F.col("q")[0].alias("q0"),
        F.col("q")[1].alias("q1"),
        F.element_at("q", -1).alias("q_last"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
        sum_abs_q.alias("sum_abs_q"),
    )


def q79_edit_distance_pairs(spark, sf_dir):
    """Character-level near-dup pairs: 64-bit SimHash pigeonhole bands
    generate candidates (32-bit banding admits ~260x more false
    candidates on this table, each paying an O(len·len) verify), exact
    Levenshtein (threshold early-exit) verifies distance <= 100 on
    normalized text — catches typo/OCR-noise dups that word-shingle
    Jaccard under-scores."""
    from tinyflux_spark.operators.dedup import edit_distance_pairs

    docs = _t("documents")(spark, sf_dir)
    return edit_distance_pairs(
        docs, "doc_id", max_distance=100, bits=64, max_hamming=3
    ).select("id_a", "id_b", F.col("edit_distance").cast("int").alias("edit_distance"))


def q80_incremental_dedup_join(spark, sf_dir):
    """Incremental-ingest dedup: near-dup pairs BETWEEN a 'new shard'
    (doc_id % 5 == 0) and the 'existing corpus' (the rest) via the
    asymmetric MinHash-LSH join — the corpus side never self-joins and
    its signatures are reusable across ingest batches."""
    from tinyflux_spark.operators.dedup import minhash_lsh_join

    docs = _t("documents")(spark, sf_dir)
    left = docs.where(F.col("doc_id") % 5 == 0)
    right = docs.where(F.col("doc_id") % 5 != 0)
    return minhash_lsh_join(
        left, right, "doc_id", num_hashes=12, bands=4,
        verify_threshold=0.7,
    ).select(
        "id_left", "id_right", F.round("jaccard", 6).alias("jaccard")
    )


def q81_corpus_profile(spark, sf_dir):
    """Corpus data card: per-(lang, source) document counts, token
    totals, exact mean/median tokens, character volume, and the
    exact-duplicate rate — one all-codegen aggregation pass over
    low-cardinality keys (the summary every curation run publishes)."""
    from tinyflux_spark.operators.text import corpus_profile

    docs = _t("documents")(spark, sf_dir)
    out = corpus_profile(docs, "doc_id", "text", ("lang", "source"))
    return out.select(
        "lang", "source", "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "mean_tokens", "median_tokens",
        F.col("total_chars").cast("long").alias("total_chars"),
        "distinct_docs", "exact_dup_rate",
    )


def q82_remove_boilerplate(spark, sf_dir):
    """C4-style corpus-level boilerplate removal at token granularity
    (the corpus has no newline structure, so the span unit is the
    token — a corpus-driven stopword/df-cut for index builds): delete
    every span whose document frequency reaches 50% of the corpus.
    Count pass shuffles only (md5, doc_id); the hot set broadcasts;
    the single corpus-text shuffle is the per-document regroup."""
    from tinyflux_spark.operators.text import remove_boilerplate_spans

    docs = _t("documents")(spark, sf_dir)
    out = remove_boilerplate_spans(
        docs, "doc_id", "text", min_doc_frac=0.5
    )
    return out.select(
        F.col("id").alias("doc_id"), "clean_text", "n_removed", "n_kept"
    )


def q83_temperature_sample(spark, sf_dir):
    """Temperature-based language re-balancing (alpha = 0.5): each
    language keeps rows at sqrt(n_min / n_lang), pulling the mix
    toward p ∝ n^0.5 while keeping the smallest language whole. The
    per-row keep decision is the deterministic md5 threshold, computed
    per group from IEEE-exact sqrt — the oracle replays it bit-for-bit;
    the corpus never shuffles (rate table broadcasts in)."""
    from tinyflux_spark.operators.sampling import temperature_sample

    docs = _t("documents")(spark, sf_dir)
    out = temperature_sample(docs, "lang", "doc_id", alpha=0.5, salt="t83")
    return out.select(
        "doc_id", "lang", "source",
        F.col("group_rows").cast("long").alias("group_rows"),
        F.round("keep_rate", 6).alias("keep_rate"),
    )


def q84_interval_join(spark, sf_dir, bin_width=16):
    """Shipments in transit on each order date, via the bucketed range
    join: transit intervals are [ship_day, ship_day + qty%28 + 3]
    (deterministic integer arithmetic both engines replay), exploded
    into 16-day bins and equi-joined against the broadcast distinct
    order-date side — no shuffle for the join itself, no nested-loop
    plan, residual BETWEEN on candidates only. ``bin_width`` is
    exposed so bench.py can record the cost model's bin-width
    sensitivity (spans average ~16 days; 0.5×/2× widths bracket it);
    the result is bin-width-invariant."""
    from tinyflux_spark.operators.aggregates import interval_join

    epoch = F.lit("1992-01-01")
    points = (
        _t("orders")(spark, sf_dir)
        .select(F.datediff("o_orderdate", epoch).alias("order_day"))
        .distinct()
    )
    intervals = _t("lineitem")(spark, sf_dir).select(
        F.col("l_suppkey").alias("supp"),
        F.datediff("l_shipdate", epoch).alias("start_day"),
        (
            F.datediff("l_shipdate", epoch)
            + F.col("l_quantity").cast("int") % 28 + 3
        ).alias("end_day"),
    )
    out = interval_join(
        points, intervals, "order_day", "start_day", "end_day",
        bin_width=bin_width, broadcast_points=True,
    )
    # All aggregates partial-aggregable on purpose: the timed work is
    # the bucketed join (the operator under test), not an orthogonal
    # 9.5M-row distinct shuffle (a countDistinct here measured 6x the
    # join's own cost at sf0.1).
    return out.groupBy("order_day").agg(
        F.count("*").alias("n_in_transit"),
        F.min("supp").alias("min_supp"),
        F.max("supp").alias("max_supp"),
    )


def q85_unigram_logprob(spark, sf_dir):
    """CCNet-style LM quality signal: average per-token unigram
    log-probability of every document under the corpus's own unigram
    distribution (the cheap stand-in for KenLM perplexity filtering).
    Per-token logp is quantized to DECIMAL(20,12) in the vocabulary so
    the per-document sum is exact and order-independent — the same
    float-sum determinism rule as decimal_sum."""
    from tinyflux_spark.operators.text import unigram_logprob

    docs = _t("documents")(spark, sf_dir)
    out = unigram_logprob(docs, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("avg_logp", 6).alias("avg_logp"),
    )


def q86_salted_join(spark, sf_dir):
    """Skew-safe large×large equi-join: lineitem ⋈ orders on orderkey
    through the salting rewrite (left rows pick one of 8 salts, right
    rows replicate to all 8, join on (key, salt)) — the tool for a hot
    key flooding one shuffle partition when neither side broadcasts.
    The oracle is the plain unsalted join: salting must be invisible
    in the result. Revenue sums route through DECIMAL so the compare
    is exact, not float-order luck."""
    from tinyflux_spark.operators.aggregates import salted_join

    li = _t("lineitem")(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t("orders")(spark, sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, orders, ["l_orderkey"], n_salts=8)
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(3,2)")
           - F.col("l_discount").cast("decimal(3,2)"))
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


def q87_version_diff(spark, sf_dir):
    """MVCC change feed (CDC): run update + remove against a throwaway
    versioned store, then db.diff(v0) — every row 'changed' or
    'removed' going from the original snapshot to live, keyed by the
    durable _seq so an update is one changed row, never remove+add.
    The oracle replays both delta classes as pure SELECTs over the
    slice; unchanged rows must be absent."""
    import tempfile

    from tinyflux_spark import TinyFluxSpark

    db = TinyFluxSpark(
        tempfile.mkdtemp(prefix="tfs_diff_"), spark=spark, keep_versions=4
    )
    db.insert_dataframe(_dml_slice(spark, sf_dir))
    v0 = db.versions()[-1]
    db.update(FieldQuery().value > 100, fields={"flag": 1.0})
    db.remove(FieldQuery().value > 200)

    d = db.diff(v0)
    return d.select(
        "op",
        F.col("tags")["eid"].cast("long").alias("eid"),
        "measurement",
        F.col("fields")["value"].alias("value"),
        F.col("fields")["flag"].alias("flag"),
    )


def q88_merge_intervals(spark, sf_dir):
    """Supplier transit coverage: coalesce each supplier's overlapping
    shipment-transit intervals (same deterministic synthesis as q84)
    into maximal busy periods, then profile per supplier — period
    count, total covered days, longest period. Two running window
    frames + one aggregation, all partitioned by supplier; the oracle
    replays the identical running-max/running-sum logic in SQL."""
    from tinyflux_spark.operators.aggregates import merge_intervals

    epoch = F.lit("1992-01-01")
    intervals = _t("lineitem")(spark, sf_dir).select(
        F.col("l_suppkey").alias("supp"),
        F.datediff("l_shipdate", epoch).alias("start_day"),
        (
            F.datediff("l_shipdate", epoch)
            + F.col("l_quantity").cast("int") % 28 + 3
        ).alias("end_day"),
    )
    merged = merge_intervals(intervals, "supp", "start_day", "end_day")
    span = F.col("end") - F.col("start") + 1
    return merged.groupBy(F.col("key").alias("supp")).agg(
        F.count("*").alias("n_periods"),
        F.sum(span).alias("covered_days"),
        F.max(span).alias("longest_days"),
        F.sum("n_merged").alias("n_shipments"),
    )


def q89_excise_duplicate_spans(spark, sf_dir):
    """Exact-substring dedup at the 13-gram excision rule: every word
    13-gram occurring in >= 2 distinct docs keeps its globally-first
    occurrence; all other occurrences are cut OUT of their documents
    (memorized boilerplate leaves, the document stays). Composition of
    the engine's own primitives — hash-only gram shuffle, one
    first-occurrence aggregation, merge_intervals for the excision
    ranges, keyed interval_join (never a nested-loop BETWEEN) for the
    token cut. Row count is preserved."""
    from tinyflux_spark.operators.dedup import excise_duplicate_spans

    docs = _t("documents")(spark, sf_dir)
    out = excise_duplicate_spans(docs, "doc_id", "text", n=13, min_docs=2)
    return out.select(
        F.col("id").alias("doc_id"), "clean_text", "n_removed", "n_spans"
    )


def q90_rollup_card(spark, sf_dir):
    """Hierarchical data card in ONE aggregation pass: per-(lang,
    source) stats plus per-lang subtotals plus the corpus grand total
    via GROUP BY ROLLUP — Catalyst's Expand computes every grouping
    level in a single shuffle instead of one job per level (the
    hypertable-rollup shape). grouping_id disambiguates real NULL keys
    from subtotal rows; token sums stay integer-exact."""
    docs = _t("documents")(spark, sf_dir)
    txt = F.coalesce(F.col("text"), F.lit(""))  # null text ≡ ''
    toks = F.split(F.lower(F.trim(txt)), r"\s+")
    n_tokens = F.when(F.trim(txt) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    base = docs.select("lang", "source", n_tokens.alias("n_tokens"))
    return (
        base.rollup("lang", "source")
        .agg(
            F.grouping_id().cast("long").alias("level"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .select(
            "level", "lang", "source", "n_docs", "total_tokens",
            "max_tokens",
        )
    )


def q91_bigram_logprob(spark, sf_dir):
    """Stupid-Backoff bigram LM score (Brants 2007) of EVERY document
    against the corpus's English slice — the step up from q85's
    unigram model toward CCNet's KenLM filter. English docs score on
    seen bigrams; non-English docs fall through the backoff
    (alpha x unigram) and OOV (alpha / total) paths, so all three
    scoring branches are exercised and backoff_frac itself separates
    the languages. Same DECIMAL(20,12) per-bigram quantization as q85
    — sums exact and order-independent, oracle replays bit-for-bit.

    Two degenerate-contract scenarios ride along (doc_id < 20 slice)
    so the operator's documented edge behavior is driver-verified, not
    docstring-verified: ``empty_vocab`` scores against an empty
    reference corpus — no distribution to score under, so avg_logp is
    NULL and every bigram misses (backoff_frac 1.0); ``all_oov``
    scores a synthetic text whose tokens cannot appear in the (small)
    reference slice, so every bigram lands exactly on the
    alpha/total OOV floor — both replayed by the oracle from the same
    parquet."""
    from tinyflux_spark.operators.text import bigram_logprob

    docs = _t("documents")(spark, sf_dir)
    en = docs.where(F.col("lang") == "en")
    sub = docs.where(F.col("doc_id") < 20)
    main = bigram_logprob(docs, "doc_id", "text", ref=en, alpha=0.4)
    deg_empty = bigram_logprob(
        sub, "doc_id", "text", ref=en.where(F.lit(False)), alpha=0.4
    )
    # small ref slice keeps the extra corpus aggregation cheap; the
    # OOV property only needs tokens absent from it
    small_ref = en.where(F.col("doc_id") < 50)
    oov_docs = sub.select(
        "doc_id", F.lit("zzqq wwvv zzqq").alias("text")
    )
    deg_oov = bigram_logprob(
        oov_docs, "doc_id", "text", ref=small_ref, alpha=0.4
    )

    def shape(df, scenario):
        return df.select(
            F.col("id").alias("doc_id"),
            F.lit(scenario).alias("scenario"),
            "n_bigrams",
            F.round("avg_logp", 6).alias("avg_logp"),
            "backoff_frac",
        )

    return (
        shape(main, "corpus")
        .unionByName(shape(deg_empty, "empty_vocab"))
        .unionByName(shape(deg_oov, "all_oov"))
    )


def q92_normalize_text(spark, sf_dir):
    """Unicode NFC normalization + lowercasing (text.normalize_text)
    — the curation primitive run before any multilingual dedup pass.
    The sf corpora are pure ASCII (where all normal forms are the
    identity), so every document's text is first decorated with
    decomposed/compatibility codepoints — a combining acute (U+0301),
    the angstrom sign (U+212B, which NFC maps to U+00C5), a combining
    diaeresis — making the gate exercise real composition on every
    row. Output: normalized length, the char-count delta the
    composition produced, and a 16-hex md5 of the normalized text
    (full content check); the oracle replays with DuckDB's
    nfc_normalize, which implements the same UAX #15."""
    from tinyflux_spark.operators.text import normalize_text

    docs = _t("documents")(spark, sf_dir)
    dec = docs.select(
        "doc_id",
        F.concat(
            F.coalesce("text", F.lit("")),
            F.lit(" cafe\u0301 \u212bngstro\u0308m"),
        ).alias("text"),
    )
    out = normalize_text(dec, "text", form="NFC", case="lower", out_col="tn")
    return out.select(
        "doc_id",
        F.length("tn").alias("norm_len"),
        (F.length("text") - F.length("tn")).alias("delta"),
        F.substring(F.md5(F.encode("tn", "UTF-8")), 1, 16).alias("fp16"),
    )


def q93_stream_near_dup(spark, sf_dir):
    """Streaming incremental-ingest near-dup end-to-end
    (streaming/ingest.stream_near_dup_insert): the 'new shard'
    (doc_id % 5 == 0) arrives as a finite file stream in THREE
    micro-batches (maxFilesPerTrigger=1); the corpus's banded MinHash
    signature table is built once and persisted before the stream
    starts; each micro-batch band-joins against the persisted
    signatures and exact-Jaccard-verifies candidates only (the
    right_banded path — no per-batch corpus re-scan). Flagged pairs
    append to a result store across batches. Stream/batch
    unification: the oracle is IDENTICAL to q80's SQL — the streaming
    path must produce exactly the one-shot batch join's answer."""
    import shutil
    import tempfile

    from tinyflux_spark.streaming import ingest as st

    docs = _t("documents")(spark, sf_dir)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    # One run root for source shard / signatures / checkpoint / result,
    # removed after the standing result is localCheckpoint-pinned —
    # bench reruns this HEAVY query repeatedly and must not accumulate
    # parquet in /tmp across rounds.
    root = tempfile.mkdtemp(prefix="tfs_q93_")
    try:
        src = root + "/src"
        shard.repartition(3).write.mode("overwrite").parquet(src)
        stream = st.point_stream_from_files(
            spark, src, docs.schema, max_files_per_trigger=1
        )
        res = root + "/pairs"
        q = st.stream_near_dup_insert(
            stream, corpus, res, "doc_id",
            num_hashes=12, bands=4, verify_threshold=0.7,
            signatures_path=root + "/sig",
            checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError(
                "q93 stream_near_dup_insert did not finish within 240s"
            )
        if q.exception() is not None:
            raise q.exception()
        return spark.read.parquet(res).select(
            "id_left", "id_right", F.round("jaccard", 6).alias("jaccard")
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q94_trigram_logprob(spark, sf_dir):
    """Trigram Stupid-Backoff LM score (Brants 2007) of every document
    against the corpus's English slice — order 3 of the q85/q91 LM
    ladder (CCNet uses 5-gram KenLM; trigram is where real context
    effects appear). Seen trigrams score c3/c2; unseen back off to
    alpha x the bigram score, alpha^2 x the unigram, and the alpha^2 /
    total OOV floor — all four branches exercised across the
    multilingual corpus, with backoff_frac / oov_frac separating
    in-domain from out-of-domain text. Same DECIMAL(20,12) per-branch
    quantization as q85/q91 — sums exact and order-independent, the
    oracle replays bit-for-bit (alpha^2 is computed once in Python and
    shipped to both engines as one literal, so the IEEE product is
    shared, not re-derived)."""
    from tinyflux_spark.operators.text import trigram_logprob

    docs = _t("documents")(spark, sf_dir)
    out = trigram_logprob(
        docs, "doc_id", "text",
        ref=docs.where(F.col("lang") == "en"), alpha=0.4,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_trigrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        "backoff_frac",
        "oov_frac",
    )


def q95_semantic_dedup(spark, sf_dir):
    """SemDedup-style semantic deduplication (Abbas et al. 2023): the
    embedding corpus is clustered by the q52 IVF codebook, pairs are
    compared only within a cluster, and a vector is flagged a
    semantic duplicate when a more-canonical in-cluster neighbor
    (lower centroid cosine — the paper keeps the exemplar FARTHEST
    from the centroid — tie-broken by id) sits above cosine tau. The
    oracle replays codebook selection, assignment, the within-cluster
    pair scan and the dominance rule in SQL, so every stage is
    hash-checked. tau=0.3 on the synthetic corpus (its random-ish
    embeddings are diffuse; real near-dup corpora use 0.9+), K=32
    clusters (SemDedup scales K with N to bound the per-cluster pair
    scan — the operator's whole scale argument, so the gate runs the
    same regime)."""
    from tinyflux_spark.operators.similarity import semantic_dedup

    emb = _t("embeddings")(spark, sf_dir)
    return semantic_dedup(emb, num_clusters=32, tau=0.3)


def q96_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail LM-quality bucketing (Wenzek et al.
    2020): documents scored by avg unigram log-prob (q85's scorer),
    split into 3 equal-mass buckets over the score HISTOGRAM — no
    global row sort; the quantized-score map broadcasts back. floor()
    quantization, not round(): floor has no cross-engine rounding-mode
    ambiguity on doubles."""
    from tinyflux_spark.operators.text import perplexity_buckets

    docs = _t("documents")(spark, sf_dir)
    out = perplexity_buckets(docs, "doc_id", "text", k=3)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("avg_logp", 6).alias("avg_logp"),
        "ppl_bucket",
    )


def q97_importance_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): every document
    scored by how English-target-like its hashed unigram features are
    (log p_target/p_source summed over 1024 md5 buckets, add-1
    smoothing). The md5 bucketing, both histograms, the smoothing and
    the DECIMAL(20,12)-quantized per-doc sum all replay in DuckDB, so
    the whole feature pipeline is hash-checked. On the gate corpus the
    en slice scores ~0.23 nats/doc above the rest — the re-balancing
    signal a selection pass would sample by."""
    from tinyflux_spark.operators.sampling import importance_weights

    docs = _t("documents")(spark, sf_dir)
    out = importance_weights(
        docs, docs.where(F.col("lang") == "en"), "doc_id", "text",
        num_buckets=1024, alpha=1.0,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("log_weight", 6).alias("log_weight"),
    )


def q99_text_semantic_dedup(spark, sf_dir):
    """Text-only semantic dedup, end-to-end: documents are embedded
    with the hashed signed bag-of-words construction (feature hashing,
    Weinberger et al. 2009 — deterministic, engine-replayable, no
    model required) and the q95 SemDedup pipeline runs on those
    vectors — proving the vector family works on corpora that ship NO
    embedding column. The oracle replays the embedding (md5 buckets,
    md5 signs, dense re-assembly) AND the full clustering/dominance
    pipeline, so text → vector → dedup is hash-checked end-to-end.
    tau=0.9: shared-vocabulary documents cosine high under BoW."""
    from tinyflux_spark.operators.similarity import semantic_dedup
    from tinyflux_spark.operators.text import embed_bow

    docs = _t("documents")(spark, sf_dir)
    # Materialize the embedding once: semantic_dedup fires three
    # actions (codebook min/max + codebook groupBy + assignment
    # checkpoint), and without this each re-ran the full explode+agg
    # embedding pipeline — measured 3.6s -> 2.75s at sf0.1. The
    # remaining floor is real work (embed ~1.2s, assign ~0.45s, pair
    # scan + dup join ~1.0s). Do-not-do, measured: a fused pivot-style
    # embed (one groupBy(id) with dim conditional sums, no collect_list)
    # saved only ~0.1s here and is O(dim) per token row, so it
    # regresses for large dim; the two md5 calls are NOT the
    # bottleneck (explode-only 0.28s vs explode+2xmd5 0.31s).
    emb = embed_bow(docs, "doc_id", "text", dim=64).localCheckpoint()
    return semantic_dedup(
        emb, "id", "embedding", num_clusters=16, tau=0.9
    )


def q101_kmv_set_overlap(spark, sf_dir):
    """Theta-sketch-style audience overlap from two KMV sketches: the
    distinct click-user and purchase-user sets are never joined raw —
    the bottom-64 of the hashed union is a uniform sample of the
    union, the fraction present in both side sketches estimates
    Jaccard, and intersection = jaccard x union (Dasgupta et al.
    2016's framework on the deterministic KMV bottom-k, so unlike a
    real theta sketch every number is md5 order statistics both
    engines compute identically)."""
    from tinyflux_spark.operators.sketches import kmv_set_overlap

    ev = _t("events")(spark, sf_dir)
    return kmv_set_overlap(
        ev.where(F.col("event_type") == "click"),
        ev.where(
            (F.col("event_type") == "purchase") & (F.col("value") > 150)
        ),
        "user_id",
        k=64,
    )


def q102_stream_semantic_dedup(spark, sf_dir):
    """Streaming SEMANTIC dedup end-to-end
    (streaming/ingest.stream_semantic_dedup_insert): the 'new shard'
    (doc_id % 5 == 0) arrives as a finite file stream in three
    micro-batches; the corpus's IVF codebook + assignment table
    (hashed-BoW embeddings, q99's machinery) are built once and
    persisted before the stream starts; each micro-batch embeds,
    assigns against the FROZEN codebook, equi-joins the corpus
    assignment on cluster id, and appends same-cluster pairs above
    cosine 0.9. The oracle replays embedding, codebook, both
    assignments and the pair threshold in SQL — so the streaming
    result is hash-checked against the batch-equivalent answer
    (stream/batch unification, q93's convention for the semantic
    family)."""
    import shutil
    import tempfile

    from tinyflux_spark.streaming import ingest as st

    docs = _t("documents")(spark, sf_dir)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    # One run root (source shard / state / checkpoint / result),
    # removed after the result is localCheckpoint-pinned — see q93.
    root = tempfile.mkdtemp(prefix="tfs_q102_")
    try:
        src = root + "/src"
        shard.repartition(3).write.mode("overwrite").parquet(src)
        stream = st.point_stream_from_files(
            spark, src, docs.schema, max_files_per_trigger=1
        )
        res = root + "/pairs"
        q = st.stream_semantic_dedup_insert(
            stream, corpus, res, "doc_id",
            embed_dim=64, num_clusters=16, tau=0.9,
            state_path=root + "/state",
            checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError(
                "q102 stream_semantic_dedup_insert did not finish "
                "within 240s"
            )
        if q.exception() is not None:
            raise q.exception()
        # project the pair columns (epoch=N is the sink's idempotence
        # bookkeeping, not part of the result contract)
        return spark.read.parquet(res).select(
            "id_left", "id_right", "cosine"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q100_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct-count sketch (Bar-Yossef et al. 2002 /
    Beyer et al. 2007) over the events id column — the
    oracle-verifiable alternative to HyperLogLog: built on md5 order
    statistics, so the k-th smallest hash and the estimate are
    deterministic values both engines compute identically (HLL
    register layouts differ across engines and cannot be
    hash-checked). Sketch state is k rows at any input size and
    merges by union + re-bottom-k."""
    from tinyflux_spark.operators.sketches import kmv_distinct

    ev = _t("events")(spark, sf_dir)
    return kmv_distinct(ev, "event_id", k=256)


def q98_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
    smoothing KenLM itself uses) scoring every document against the
    English slice — the classic-smoothing counterpart to the
    Stupid-Backoff ladder (q85/q91/q94). Absolute discounting +
    continuation probability with an add-one floor so OOV words stay
    scoreable; unseen_ctx_frac separates out-of-domain text. The
    oracle replays the discount arithmetic, both derived count tables
    and the (B, V) totals in one fixed IEEE op order."""
    from tinyflux_spark.operators.text import kneser_ney_logprob

    docs = _t("documents")(spark, sf_dir)
    out = kneser_ney_logprob(
        docs, "doc_id", "text",
        ref=docs.where(F.col("lang") == "en"), discount=0.75,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        "unseen_ctx_frac",
    )


def q104_kmv_quantiles(spark, sf_dir):
    """Value-distribution quantiles from a KMV bottom-k uniform row
    sample (the deterministic, cross-engine-replayable alternative to
    approx_percentile, whose GK/KLL sketch state differs across
    engines): the 256 events whose md5-hashed event_id sorts lowest
    form a simple random sample, and each requested quantile is the
    type-1 order statistic value at rank ceil(p*n) — md5 order
    statistics + integer ranks only, so the oracle computes the
    identical sample and identical estimates. Sketch state is k rows
    at any scale and merges by union + re-bottom-k (day-over-day
    quantiles without rescanning history)."""
    from tinyflux_spark.operators.sketches import kmv_quantiles

    ev = _t("events")(spark, sf_dir)
    return kmv_quantiles(
        ev, "value", "event_id",
        probs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99), k=256,
    )


def q106_stream_kmv_distinct(spark, sf_dir):
    """Streaming KMV sketch maintenance end-to-end
    (streaming/ingest.stream_kmv_insert): the 'new shard' of events
    (event_id % 5 == 0) arrives as a finite file stream in three
    micro-batches; each batch folds its distinct user-id hashes into
    the persisted bottom-64 sketch (epoch=N idempotent overwrite,
    reading the latest epoch strictly below — an at-least-once retry
    recomputes instead of double-counting). Bottom-k merge is
    associative, so the standing estimate equals the ONE-SHOT batch
    sketch over the whole shard — the oracle is exactly q100's SQL on
    the shard slice (stream == batch, the q93/q102 convention for the
    sketch family)."""
    import shutil
    import tempfile

    from tinyflux_spark.streaming import ingest as st

    ev = _t("events")(spark, sf_dir)
    shard = ev.where(F.col("event_id") % 5 == 0)
    root = tempfile.mkdtemp(prefix="tfs_q106_")
    try:
        src = root + "/src"
        shard.repartition(3).write.mode("overwrite").parquet(src)
        stream = st.point_stream_from_files(
            spark, src, shard.schema, max_files_per_trigger=1
        )
        q = st.stream_kmv_insert(
            stream, root + "/state", "user_id", k=64,
            checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError(
                "q106 stream_kmv_insert did not finish within 240s"
            )
        if q.exception() is not None:
            raise q.exception()
        return st.kmv_state_estimate(spark, root + "/state").localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q105_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): the corpus is
    PQ-encoded (8 subspaces x 16 codes — 64 float32 dims become 8
    int codes, the 32x memory story that makes 100 TB vector serving
    possible) with codebooks tightened by TWO deterministic Lloyd
    rounds (pq_train refine_iters=2 — assignment by the shared argmin
    convention, means on the 1e-6 floor grid so the k-means update
    itself is bit-replayable; recall@10 vs exact cosine measured 0.16
    stride -> 0.26 refined on this table), and the query runs an
    asymmetric-distance (ADC) top-10 over the CODES column only. The
    oracle replays the whole index: the stride init, both refinement
    rounds' integer-grid means, the per-subspace sq-L2 argmin encode
    (6dp rounding, low-code ties), the DECIMAL(20,12)-quantized ADC
    lookup table, and the order-independent m-term sum — so the
    compressed index is hash-checked end to end. Composes with the
    IVF layout (q59's partition dirs) for probe-then-ADC at scale."""
    from tinyflux_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    books = pq_train(corpus, m=8, ksub=16, refine_iters=2)
    codes = pq_encode(corpus, books)
    return pq_adc_topk(codes, books, qvec, k=10).select(
        F.col("id").alias("vec_id"), "adc_dist"
    )


def q107_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ composed ANN (the FAISS IVFPQ shape, minus residual
    encoding so every stage replays in SQL): IVF probing prunes the
    corpus to the 4 inverted lists nearest the query (~25% of rows),
    then asymmetric-distance PQ ranks the survivors from their 8-int
    codes alone — at scale the list id is a partition directory (q59)
    and the codes column is stored beside it, so a query touches
    nprobe directory scans of an m-int column and never a raw vector.
    The PQ codebooks get q105's two deterministic Lloyd rounds
    (trained on the full corpus before the probe filter, exactly as
    the operator composes). The oracle replays BOTH halves end to
    end: the shared stride init, cosine assignment + probe ranking
    (q52's CTEs), both refinement rounds' integer-grid means, and the
    per-subspace encode argmin + DECIMAL-quantized ADC sum (q105's
    shared CTEs) over the probed candidates only."""
    from tinyflux_spark.operators.similarity import ivf_pq_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10,
        num_centroids=16, nprobe=4, m=8, ksub=16, pq_refine_iters=2,
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q109_ivf_pq_indexed_topk(spark, sf_dir):
    """The persisted IVF-PQ serving path (VERDICT r7 ask #6): the
    corpus's PQ codes are materialized ONCE beside the inverted-list
    partition dirs (ivf_write_index(pq_m=8) — built per session here;
    at scale a standing index), and a query scans ONLY its 4 probed
    ``codes/_ivf_list=<i>/`` directories (PartitionFilters) and ONLY
    the (id, codes) columns — the raw embedding column never leaves
    storage (both plan-asserted in tests/test_plans.py). Same stride
    codebooks and ADC math as the inline composition, so the oracle
    is exactly the IVF-probe + PQ-encode + decimal-ADC replay with
    the unrefined book0."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "pq")
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivfpq_")
        ivf_write_index(
            corpus, path, num_centroids=16, pq_m=8, pq_ksub=16
        )
        per_session[key] = path
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_topk_indexed(
        spark, per_session[key], qvec, k=10, nprobe=4
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q110_kmv_quantiles_by_key(spark, sf_dir):
    """Per-source document-length quantile table from per-group KMV
    bottom-128 samples (VERDICT r7 ask #8's depth pick — the GROUP BY
    form of q104, the shape a data card actually wants): each source's
    128 lowest-md5(doc_id) rows are an independent uniform sample, and
    p25/p50/p75/p90 are type-1 order statistics at rank ceil(p*n). One
    shuffle on source serves the bottom-k, rank, and total windows; a
    hot source still keeps only k sample rows. Per-group sketches
    merge by union + re-bottom-k — day-over-day per-source length
    profiles never rescan history. All md5 order statistics + integer
    ranks, so the oracle computes identical samples and estimates."""
    from tinyflux_spark.operators.sketches import kmv_quantiles_by_key

    docs = _t("documents")(spark, sf_dir)
    return kmv_quantiles_by_key(
        docs, "n_chars", "doc_id", "source",
        probs=(0.25, 0.5, 0.75, 0.9), k=128,
    )


def q111_pq_rerank_topk(spark, sf_dir):
    """ADC + re-rank exactness recovery (VERDICT r7 ask #5): the top
    100 corpus rows by asymmetric PQ distance are re-scored against
    their RAW vectors — a bounded 100-id read via a pushed-down IN
    filter, never a full raw pass — and the exact-cosine top-10 is
    returned. The oracle replays the full chain: refined codebooks
    (q105's two Lloyd rounds), encode, decimal-ADC top-100, then q24's
    exact rounded-cosine ranking over just those candidates."""
    from tinyflux_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    books = pq_train(corpus, m=8, ksub=16, refine_iters=2)
    codes = pq_encode(corpus, books)
    return pq_adc_topk(
        codes, books, qvec, k=10, rerank=100, raw_df=corpus
    )


def q112_ivf_refined_topk(spark, sf_dir):
    """IVF-Flat ANN with a Lloyd-refined coarse quantizer (VERDICT r7
    ask #4, the ivf_centroids(refine_iters=) half): one deterministic
    k-means round moves each stride centroid to its assigned
    cluster's mean on the 1e-6 integer grid (cosine assignment is
    norm-invariant, so the unnormalized mean IS the spherical k-means
    update), then the probe scans the 4 nearest refined lists and
    brute-forces the survivors — q52's flow with a trained codebook.
    The oracle replays the stride init, the refinement round's
    integer-grid means, re-assignment, probe ranking, and the exact
    rounded-cosine top-10."""
    from tinyflux_spark.operators.similarity import ivf_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10,
        num_centroids=16, nprobe=4, refine_iters=1,
    )


def q113_ivf_pq_residual_topk(spark, sf_dir):
    """The FULL FAISS IVFPQ — residual encoding AND coarse training
    included (closing the 'minus residuals' caveat q107 documents):
    the coarse quantizer gets two deterministic Lloyd rounds (the
    configuration where residuals pay off — measured recall@10
    hits/50 on this table: 11 raw-PQ, 3 residual-over-stride, 15
    residual over the trained coarse), PQ codes quantize each
    vector's residual from its refined centroid, and the query builds
    one DECIMAL-quantized ADC table per probed list from that list's
    query residual, ranking candidates by ||(q-c_l) - pq(x-c_l)||^2.
    The oracle replays everything: coarse stride init, BOTH cosine-
    Lloyd rounds' integer-grid means, assignment + probes, the exact
    elementwise residual subtraction, the residual-stride
    sub-codebooks, encode argmin, per-list query residuals, and the
    order-independent decimal ADC sum."""
    from tinyflux_spark.operators.similarity import ivf_pq_residual_topk

    emb = _t("embeddings")(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_residual_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10,
        num_centroids=16, nprobe=4, m=8, ksub=16,
        coarse_refine_iters=2,
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q114_kmv_sketch_merge(spark, sf_dir):
    """The day-over-day sketch lifecycle end-to-end: the corpus is
    split into two disjoint 'days' (doc_id parity), each day builds
    its one-row-per-source quantile sketch (kmv_quantile_sketch),
    the two sketch tables MERGE (union samples, re-bottom-k, totals
    add — history never rescanned), and estimates come off the merged
    sketch alone (kmv_quantiles_from_sketch). The oracle is the
    ONE-SHOT per-group SQL over the whole table — their equality is
    exactly the KMV merge theorem, gated."""
    from tinyflux_spark.operators.sketches import (
        kmv_quantile_sketch,
        kmv_quantile_sketch_merge,
        kmv_quantiles_from_sketch,
    )

    docs = _t("documents")(spark, sf_dir)
    day1 = docs.where(F.col("doc_id") % 2 == 0)
    day2 = docs.where(F.col("doc_id") % 2 == 1)
    s1 = kmv_quantile_sketch(day1, "n_chars", "doc_id", "source", k=96)
    s2 = kmv_quantile_sketch(day2, "n_chars", "doc_id", "source", k=96)
    merged = kmv_quantile_sketch_merge(s1, s2, k=96)
    return kmv_quantiles_from_sketch(merged, probs=(0.5, 0.9))


def q115_stream_kmv_quantiles(spark, sf_dir):
    """Streaming per-group quantile-sketch maintenance end-to-end
    (streaming/ingest.stream_kmv_quantiles_insert): the 'new shard'
    of documents (doc_id % 5 == 0) arrives as a finite file stream in
    three micro-batches; each batch MERGES into the persisted
    one-row-per-source sketch (epoch=N idempotent overwrite with
    lineage+batch-id replay detection — totals are not a set union,
    so a redelivered batch is skipped, not re-added). Sketch merge is
    associative, so the standing estimate equals the ONE-SHOT batch
    sketch over the whole shard — the oracle is the q110-form SQL on
    the shard slice (stream == batch, the q106 convention)."""
    import shutil
    import tempfile

    from tinyflux_spark.streaming import ingest as st

    docs = _t("documents")(spark, sf_dir)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    root = tempfile.mkdtemp(prefix="tfs_q115_")
    try:
        src = root + "/src"
        shard.repartition(3).write.mode("overwrite").parquet(src)
        stream = st.point_stream_from_files(
            spark, src, shard.schema, max_files_per_trigger=1
        )
        q = st.stream_kmv_quantiles_insert(
            stream, root + "/state", "n_chars", "doc_id", "source",
            k=64, checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError(
                "q115 stream_kmv_quantiles_insert did not finish "
                "within 240s"
            )
        if q.exception() is not None:
            raise q.exception()
        return st.kmv_quantiles_state_estimate(
            spark, root + "/state", probs=(0.5, 0.9)
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q116_kmv_distinct_by_key(spark, sf_dir):
    """Per-group distinct-count sketches — the other half of the data
    card beside q110/q114's per-group quantiles: distinct users per
    event type, each group an independent KMV bottom-64 with Beyer's
    estimator, exact (flagged) below k. One shuffle on (group, hash),
    zero joins; per-group state is k hashes and merges by union +
    re-bottom-k. The oracle replays the per-group bottom-k and the
    estimator arithmetic exactly."""
    from tinyflux_spark.operators.sketches import kmv_distinct_by_key

    ev = _t("events")(spark, sf_dir)
    return kmv_distinct_by_key(ev, "user_id", "event_type", k=64)


def q117_ivf_append_serve(spark, sf_dir):
    """Incremental index lifecycle (VERDICT r8 ask #4) end-to-end:
    the IVF-PQ index is BUILT on two thirds of the corpus, the last
    third arrives later as an ivf_append_index batch — assigned and
    PQ-encoded against the FROZEN codebook.json / pq_books.json and
    appended into the existing lists//codes/ partition dirs, no
    retrain (the reference's only ingest story is batched append,
    tinyflux database.py:623-656; at 100 TB a retrain per batch is
    the one cost the serving layout can't pay) — and the query serves
    through q109's unchanged read path: nprobe partition-dir scans of
    the codes column. The oracle replays the asymmetry exactly:
    codebooks trained on the BASE rows only, assignment + encode over
    the FULL corpus."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_append_index,
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "pq_append")
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivfpq_app_")
        ivf_write_index(
            corpus.where(F.col("vec_id") % 3 != 0), path,
            num_centroids=16, pq_m=8, pq_ksub=16,
        )
        ivf_append_index(corpus.where(F.col("vec_id") % 3 == 0), path)
        per_session[key] = path
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_topk_indexed(
        spark, per_session[key], qvec, k=10, nprobe=4
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q120_stream_ivf_append(spark, sf_dir):
    """Streaming maintenance of the persisted IVF-PQ index (the
    round-9 lifecycle completed): the index is built on two thirds of
    the corpus, the last third arrives as a STREAM in three
    micro-batches through stream_ivf_append_insert — each batch
    assigned + PQ-encoded at the FROZEN codebooks and appended into
    the probed partition dirs, with an exactly-once (lineage,
    batch-id) high-water + intent-marker protocol around the
    non-idempotent append — and the query serves through q109's
    unchanged read path. Stream == batch append == q117 exactly, so
    the oracle IS q117's replay (codebooks trained on the base split,
    assignment + encode over the full corpus): the gate checks the
    streaming protocol changed nothing."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_indexed,
        ivf_write_index,
    )
    from tinyflux_spark.streaming.ingest import (
        point_stream_from_files,
        stream_ivf_append_insert,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "pq_stream_append")
    if key not in per_session:
        root = tempfile.mkdtemp(prefix="tfs_ivfpq_stream_")
        path = root + "/index"
        ivf_write_index(
            corpus.where(F.col("vec_id") % 3 != 0), path,
            num_centroids=16, pq_m=8, pq_ksub=16,
        )
        src = root + "/src"
        corpus.where(F.col("vec_id") % 3 == 0).repartition(3).write.parquet(src)
        q = stream_ivf_append_insert(
            point_stream_from_files(
                spark, src, corpus.schema, max_files_per_trigger=1
            ),
            path, checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("q120 append stream timed out")
        if q.exception() is not None:
            raise q.exception()
        per_session[key] = path
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_topk_indexed(
        spark, per_session[key], qvec, k=10, nprobe=4
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q118_ivf_pq_residual_indexed(spark, sf_dir):
    """q113's full FAISS IVFPQ — trained coarse + residual codes —
    composed into the PERSISTED layout (VERDICT r8 ask #5):
    ivf_write_index(residual=True, coarse_refine_iters=2) persists
    residual codes beside the inverted-list dirs, and
    ivf_pq_topk_indexed reads the params.json manifest and builds one
    DECIMAL-quantized ADC table per probed list from that list's
    QUERY residual. Same at-rest layout and plan shape as q109
    (PartitionFilters + codes-only ReadSchema, plan-asserted in
    tests/test_plans.py); the recall benefit is q113's measured
    15/50-vs-11/50. The oracle is q113's full replay — persisted vs
    inline is a storage difference, not a math difference
    (pytest-asserted equality in tests/test_operators.py)."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "pq_residual")
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivfpq_res_")
        ivf_write_index(
            corpus, path, num_centroids=16, pq_m=8, pq_ksub=16,
            residual=True, coarse_refine_iters=2,
        )
        per_session[key] = path
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_pq_topk_indexed(
        spark, per_session[key], qvec, k=10, nprobe=4
    ).select(F.col("id").alias("vec_id"), "adc_dist")


def q119_data_card(spark, sf_dir):
    """One-pass per-source data card (VERDICT r8 ask #7): q81's
    counts/volume + q110's quantiles + q116's distinct counts, but
    the corpus is scanned and shuffled ONCE — each row explodes into
    a (kind=0, value) histogram row and a (kind=1, lang) distinct
    row, one groupBy(group, kind, value).count() partial-combines
    both map-side (skew spread over the value domain), and every
    downstream stage runs on the HISTOGRAM (plan-asserted: exactly
    one FileScan + one corpus Exchange, reused). Quantiles here are
    EXACT type-1 order statistics off the full value histogram (the
    right trade for integer lengths; kmv_quantiles_by_key remains the
    bounded-state path for unbounded-cardinality doubles), so the
    oracle replays every number exactly."""
    from tinyflux_spark.operators.sketches import data_card

    docs = _t("documents")(spark, sf_dir)
    return data_card(
        docs, "n_chars", "source", "lang", probs=(0.25, 0.5, 0.75, 0.9)
    )


def q108_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006) — the data-mixing primitive: 50 documents drawn with
    inclusion probability proportional to length (swap in a q97 DSIR
    weight or a quality score unchanged). Each row's deterministic
    md5 uniform scores ln(u)/w, quantized to DECIMAL(20,12) (the LM
    family's cross-engine ln rule), and ONE distributed top-k picks
    the sample — no rand(), no global sort; reruns, repartitionings
    and the oracle select the identical set."""
    from tinyflux_spark.operators.sampling import weighted_sample

    docs = _t("documents")(spark, sf_dir)
    return weighted_sample(docs, "doc_id", "n_chars", k=50)


def q103_fivegram_logprob(spark, sf_dir):
    """5-gram Stupid-Backoff LM with count pruning (Brants et al.
    2007's web-scale production configuration — Google's 5-gram MT LM
    was exactly SB + a count cutoff; CCNet's production filter is the
    same depth with KenLM smoothing): the top of the q85/q91/q94
    ladder. Every document scores its 5-gram positions against the
    English slice; 2-5-gram tables drop singletons
    (prune_min_count=2), so a once-seen gram scores as unseen —
    backoff — which is what makes the order-5 table materializable at
    corpus scale. All six branches (5/4/3/2-gram, unigram, OOV floor)
    share the q94 DECIMAL(20,12) quantization and one
    Python-multiplied alpha-power chain shipped to both engines as
    literals, so the oracle replays bit-for-bit."""
    from tinyflux_spark.operators.text import ngram_backoff_logprob

    docs = _t("documents")(spark, sf_dir)
    out = ngram_backoff_logprob(
        docs, "doc_id", "text",
        ref=docs.where(F.col("lang") == "en"),
        order=5, alpha=0.4, prune_min_count=2,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_ngrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        "backoff_frac",
        "oov_frac",
    )


def q121_weighted_sample_by_key(spark, sf_dir):
    """Per-group Efraimidis-Spirakis weighted sampling — q108's GROUP
    BY form and the sampling row of the data card: each source draws
    its own 10-doc length-weighted audit sample in one pass. Same md5
    dyadic uniforms and DECIMAL(38,12) ln(u)/w grid as q108 (the hash
    ignores the group, so a doc's uniform never depends on how the
    corpus is sliced); the per-group top-k is a rank window whose
    filter becomes Partial+Final WindowGroupLimit — at most k rows
    per group leave each map task, so a hot source never funnels its
    full row count through one task (plan-asserted)."""
    from tinyflux_spark.operators.sampling import weighted_sample_by_key

    docs = _t("documents")(spark, sf_dir)
    return weighted_sample_by_key(
        docs, "doc_id", "n_chars", "source", k=10
    ).select(
        F.col("group").alias("source"),
        F.col("id").alias("doc_id"),
        "weight",
        "es_key",
        "rank",
    )


def q122_top_tokens_by_key(spark, sf_dir):
    """Per-group token heavy hitters — q62's GROUP BY form and the
    vocabulary row of the data card (per-source drift check between
    ingest batches). groupBy(group, token) partial-aggregates
    map-side so shuffle volume is distinct (group, token) pairs, and
    the per-group top-k gets the WindowGroupLimit rewrite over the
    vocabulary-sized aggregate — no global sort, no TakeOrdered
    funnel, no unbounded per-group scan (plan-asserted)."""
    from tinyflux_spark.operators.text import top_tokens_by_key

    docs = _t("documents")(spark, sf_dir)
    return top_tokens_by_key(docs, "source", "text", k=10).select(
        F.col("group").alias("source"), "token", "n", "rank"
    )


def q123_decontaminate_bloom(spark, sf_dir):
    """q72's decontamination with the eval side folded into a Bloom
    bitmap instead of broadcast as raw strings — the 100 TB shape for
    a LARGE eval suite (tens of millions of shingles): only the
    packed-long word table broadcasts (2^16 bits here ≡ 1024 rows ≡
    8 KB; 3 orders smaller than the string set at production size),
    each train shingle probes 5 Kirsch-Mitzenmacher double-hashed
    positions via narrow broadcast word-lookups, and survivors verify
    against the exact eval set with a SHUFFLE join (candidates only
    on the corpus side, no broadcast of the strings). The bitmap's
    false positives die in the verify join, so the result is EXACT —
    the oracle is q72's plain exact SQL, and the equality IS the
    correctness claim (pytest additionally pins bloom == broadcast
    down to a deliberately undersized 2^10 bitmap)."""
    from tinyflux_spark.operators.dedup import contamination_hits

    docs = _t("documents")(spark, sf_dir)
    test = docs.where(F.col("doc_id") % 41 == 0)
    train = docs.where(F.col("doc_id") % 41 != 0)
    return contamination_hits(
        train, test, "doc_id", n=3,
        prefilter="bloom", bloom_bits=1 << 16, bloom_hashes=5,
    ).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "sample_shingle",
    )


def q124_audio_features(spark, sf_dir):
    """q33's audio sibling: the multimodal table holds genuine mono
    16-bit PCM WAV bytes (RIFF header + frames via the stdlib codec)
    of a closed-form int16 pattern, media_decode sniffs the RIFF
    magic and parses them back, and each feature pools 4 consecutive
    samples. Same bit-exactness argument as q33: sample sums are
    integers (exact in double), /4.0 is a power of two, and the
    oracle recomputes every sample from the generative formula — a
    wrong byte anywhere in the WAV encode or decode path breaks the
    hash match. Bytes stay inside the Arrow batch; only the 16-double
    feature vector survives the mapInPandas (the 100 TB contract:
    blobs never cross a shuffle)."""
    from tinyflux_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        media_decode,
        synthetic_media,
    )

    media = synthetic_media(spark, n=64, kind="audio", codec="wav")
    out = extract_features(media, decode=media_decode)
    return out.select(
        "media_id",
        "kind",
        F.round(F.col("feature")[0], 6).alias("f0"),
        F.round(F.col("feature")[FEATURE_DIM - 1], 6).alias("f_last"),
        "n_bytes",
    )


def q125_stream_self_dedup(spark, sf_dir):
    """Streaming dedup against EVERYTHING SEEN SO FAR
    (streaming/ingest.stream_self_dedup_insert) — q93's self-growing
    form: the shard (doc_id % 5 == 0) arrives in THREE micro-batches;
    each batch is checked against the base corpus AND every earlier
    batch (its signatures then fold into the standing state under the
    q120 exactly-once append protocol), plus its own within-batch
    pairs. A duplicate arriving two batches after its original IS
    caught — the static-corpus form (q93) structurally cannot see it.
    Stream/batch unification: the result must equal the one-shot
    minhash_lsh_pairs over corpus ∪ shard restricted to pairs
    touching the shard — which is exactly what the oracle replays
    (q19's SQL with the shard-membership filter)."""
    import shutil
    import tempfile

    from tinyflux_spark.streaming import ingest as st

    docs = _t("documents")(spark, sf_dir)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    root = tempfile.mkdtemp(prefix="tfs_q125_")
    try:
        src = root + "/src"
        shard.repartition(3).write.mode("overwrite").parquet(src)
        stream = st.point_stream_from_files(
            spark, src, docs.schema, max_files_per_trigger=1
        )
        res = root + "/pairs"
        q = st.stream_self_dedup_insert(
            stream, corpus, res, root + "/state", "doc_id",
            num_hashes=12, bands=4, verify_threshold=0.7,
            checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q125 stream_self_dedup_insert did not finish in 300s"
            )
        if q.exception() is not None:
            raise q.exception()
        return spark.read.parquet(res).select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q126_ivf_batch_indexed(spark, sf_dir):
    """Batch ANN against the PERSISTED IVF index — q75's retrieval
    shape (top-5 for every vec_id % 100 == 0 query in one plan)
    served from q59's index layout instead of a per-run codebook
    build + full-corpus assignment: probe lists ranked engine-side
    from the persisted codebook literals, the union of probed ids
    (one K-bounded driver round-trip) prunes the lists/ scan to those
    partition directories, the exploded query batch broadcasts onto
    it, and the per-query top-k compiles to WindowGroupLimit
    (PartitionFilters + the window limit both plan-asserted in
    tests/test_plans.py). Identical math to q75 end-to-end, so its
    oracle gates this path verbatim."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_topk_batch_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = sf_dir + "#full16"
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivf_full_")
        ivf_write_index(emb, path, num_centroids=16)
        per_session[key] = path
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return ivf_topk_batch_indexed(
        spark, per_session[key], queries, k=5, nprobe=4
    )


def q127_holt_last(spark, sf_dir):
    """Per-user FINAL Holt double-exponential smoothing (level +
    linear trend, alpha=0.3, beta=0.1) over the time-ordered value
    series — q29's forecasting sibling: one shuffle on the key, the
    coupled (level, trend) recurrence folds JVM-side with a struct
    accumulator, and ``forecast = level + trend`` is the
    one-step-ahead prediction. Every step is the same IEEE double
    arithmetic in the same order in both engines (the oracle replays
    the recurrence with a recursive CTE; the (1-alpha)/(1-beta)
    complements are written as subtractions on BOTH sides so neither
    engine constant-folds to a different double), rounded at the end
    only."""
    from tinyflux_spark.operators.aggregates import holt_last

    ev = _t("events")(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    return holt_last(ev, "user_id", "ts", "value", alpha=0.3, beta=0.1)


def q131_index_recall_probe(spark, sf_dir):
    """Sampled recall@k of the persisted SRP index vs exact cosine —
    the round-10 operationalization of "retrain when the corpus
    drifts" (SCALE_r9 measured residual recall collapsing 0.9 → 0.4
    under drift with no number to alert on). One row per sampled
    query: (query_id, hits, n_exact, recall), where the approx side
    is the REAL serving read (srp_topk_batch_indexed over the q128
    index) and the exact side is the brute-force rounded-cosine
    ranking. The oracle replays BOTH rankings and the intersection
    fraction in SQL."""
    from tinyflux_spark.operators.similarity import (
        index_recall_probe,
        srp_write_index,
    )
    import tempfile

    emb = _t("embeddings")(spark, sf_dir)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = sf_dir + "#srp4"
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_srp_b_")
        srp_write_index(emb, path, num_planes=4)
        per_session[key] = path
    sample = emb.where(F.col("vec_id") % 100 == 0)
    return index_recall_probe(
        spark, per_session[key], sample, k=5, multiprobe=1
    )


def q134_ivf_pq_batch_indexed(spark, sf_dir):
    """Batch ADC against the persisted IVF-PQ index — q109's read for
    a query SET (and q126's codes-only sibling): every vec_id % 100
    query is served in ONE plan whose corpus side reads only the
    probed codes/ directories and only the (id, codes) columns — the
    raw vectors never leave storage even with a hundred queries. Probe
    lists AND the per-query m × ksub decimal ADC tables are built
    engine-side from the codebook/book literals; the (query, list,
    tables) rows broadcast onto the pruned scan; per-query top-k is a
    rank window. The oracle replays probe + encode + per-query
    decimal-ADC + rank per query in SQL (q109's replay generalized
    over the query set)."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_batch_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "pq")
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivfpq_")
        ivf_write_index(
            corpus, path, num_centroids=16, pq_m=8, pq_ksub=16
        )
        per_session[key] = path
    queries = emb.where(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") != 0)
    )
    return ivf_pq_topk_batch_indexed(
        spark, per_session[key], queries, k=10, nprobe=4
    )


def q130_srp_append_serve(spark, sf_dir):
    """The full SRP index lifecycle (round-10, closing VERDICT r9's
    missing half): build the persisted index on two thirds of the
    corpus at frozen seed-derived planes, BATCH-append half the
    remainder with srp_append_index, STREAM-append the other half in
    micro-batches through stream_srp_append_insert (the shared
    exactly-once marker protocol), then serve q128's batch ANN read
    over the grown index. The bucket is a pure function of the
    planes, so append ≡ rebuild is exact with NO drift caveat —
    the oracle is therefore q128's replay over the full corpus,
    verbatim: the gate checks the whole grow-path changed nothing."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        srp_append_index,
        srp_topk_batch_indexed,
        srp_write_index,
    )
    from tinyflux_spark.streaming.ingest import (
        point_stream_from_files,
        stream_srp_append_insert,
    )

    emb = _t("embeddings")(spark, sf_dir)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "srp_append_lifecycle")
    if key not in per_session:
        root = tempfile.mkdtemp(prefix="tfs_srp_grow_")
        path = root + "/index"
        srp_write_index(
            emb.where(F.col("vec_id") % 3 != 0), path, num_planes=4
        )
        srp_append_index(emb.where(F.col("vec_id") % 6 == 0), path)
        src = root + "/src"
        emb.where(F.col("vec_id") % 6 == 3).repartition(2).write.parquet(src)
        q = stream_srp_append_insert(
            point_stream_from_files(
                spark, src, emb.schema, max_files_per_trigger=1
            ),
            path, checkpoint_dir=root + "/ck",
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("q130 append stream timed out")
        if q.exception() is not None:
            raise q.exception()
        per_session[key] = path
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return srp_topk_batch_indexed(
        spark, per_session[key], queries, k=5, multiprobe=1
    )


def q135_ivf_retrain_serve(spark, sf_dir):
    """The full IVF drift-remediation loop (round-11, closing VERDICT
    r10's #1 — the engine's reindex(), reference database.py:687-705):
    build the persisted index on two thirds of the corpus at K=8,
    grow it with ivf_append_index at the FROZEN codebooks (the drift
    q131's recall probe alerts on), then ivf_retrain_index at K=16 —
    a staged rebuild from the index's OWN stored rows at fresh
    codebooks, committed by an atomic pointer flip while serving
    reads continue — and serve q126's batch ANN read over the
    retrained index. Retrained ≡ a fresh ivf_write_index over the
    full corpus at K=16 EXACTLY (codebook training is order-
    independent), so q75's oracle — the fresh-build batch-ANN replay
    in SQL — gates the whole loop verbatim: a retrain that missed
    stored rows, kept stale codebooks, or flipped to a wrong
    generation changes the probe ranking and the gate catches it."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        ivf_append_index,
        ivf_retrain_index,
        ivf_topk_batch_indexed,
        ivf_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = (sf_dir, "retrain_lifecycle")
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_ivf_retrain_")
        ivf_write_index(
            emb.where(F.col("vec_id") % 3 != 0), path, num_centroids=8
        )
        ivf_append_index(emb.where(F.col("vec_id") % 3 == 0), path)
        info = ivf_retrain_index(spark, path, num_centroids=16)
        assert info["version"] == 0 and info["num_centroids"] == 16
        per_session[key] = path
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return ivf_topk_batch_indexed(
        spark, per_session[key], queries, k=5, nprobe=4
    )


def q128_srp_batch_indexed(spark, sf_dir):
    """Batch ANN against the PERSISTED SRP index — q126's sibling for
    the hyperplane family (and q31's batch form): top-5 for every
    vec_id % 100 == 0 query in one plan, each query's bucket + 1-bit
    multiprobe neighborhood computed engine-side from the seeded
    plane literals, the union of probed bucket ids pruning the
    buckets/ scan to partition directories, per-query top-k via
    WindowGroupLimit. The oracle replays planes, buckets, multiprobe,
    pruning and ranking per query in SQL."""
    import tempfile

    from tinyflux_spark.operators.similarity import (
        srp_topk_batch_indexed,
        srp_write_index,
    )

    emb = _t("embeddings")(spark, sf_dir)
    per_session = _IVF_INDEX_CACHE.setdefault(spark, {})
    key = sf_dir + "#srp4"
    if key not in per_session:
        path = tempfile.mkdtemp(prefix="tfs_srp_b_")
        srp_write_index(emb, path, num_planes=4)
        per_session[key] = path
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return srp_topk_batch_indexed(
        spark, per_session[key], queries, k=5, multiprobe=1
    )


def q129_stream_holt(spark, sf_dir):
    """Per-user running Holt level/trend/forecast over the event
    stream via applyInPandasWithState — q36's forecasting sibling and
    q127's streaming twin (identical recurrence; state is (count,
    level, trend) per key, O(1) at any history). Emits one row per
    event; the oracle replays EVERY intermediate state with a
    recursive CTE (not just the final row — each micro-step of the
    coupled recurrence is gated), complements written as subtractions
    on both sides."""
    import uuid

    from tinyflux_spark.streaming import ingest as st

    stream = _stream_event_source(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = st.stateful_holt(
        stream, "user_id", "ts", "value", alpha=0.3, beta=0.1
    )
    name = f"q129_out_{uuid.uuid4().hex[:8]}"
    st.run_to_memory(out, name, output_mode="append",
                     shuffle_partitions=8)
    return spark.table(name).select(
        "user_id",
        "ts",
        "value",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast", 6).alias("forecast"),
    )


def q132_holt_winters_last(spark, sf_dir):
    """Per-user FINAL additive Holt-Winters (level + trend + seasonal
    indices, period 4; alpha=0.3, beta=0.1, gamma=0.2) — q127's
    seasonal completion: the first season seeds l = mean(v_1..v_4),
    b = 0, s_j = v_j - l, then the coupled THREE-term recurrence
    folds JVM-side with a struct (i, l, b, s[4]) accumulator, one
    shuffle on the key. forecast = level + trend + the seasonal index
    the next reading lands on. The oracle replays the recurrence
    with a recursive CTE carrying the four seasonal columns."""
    from tinyflux_spark.operators.aggregates import holt_winters_last

    ev = _t("events")(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = holt_winters_last(
        ev, "user_id", "ts", "value",
        alpha=0.3, beta=0.1, gamma=0.2, period=4, round_digits=None,
    )
    # integer micro-units via floor(x*1e6 + 0.5) — q60's convention:
    # the unrounded doubles are bit-identical across engines, but a
    # decimal ROUND breaks half-ulp boundary values differently
    # (Spark decimal-exact HALF_UP vs DuckDB scaled-double round —
    # one such value exists in the sf0.01 event series).
    return out.select(
        "user_id",
        *[
            F.floor(F.col(c) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias(c + "_u")
            for c in ("level", "trend", "season", "forecast")
        ],
    )


def q136_holt_winters_damped(spark, sf_dir):
    """q132 with Gardner-McKenzie trend DAMPING (phi=0.9) — the
    standard guard against linear-trend overshoot on long horizons
    and the last piece of the forecast family (VERDICT r10 #7): the
    carried trend shrinks by phi at every step of the recurrence
    (l uses l+phi*b, b uses (1-beta)*(phi*b)) and the one-step
    forecast is level + phi*trend + season. phi=1.0 is bit-exactly
    q132 (IEEE 1.0*x == x — pytest-asserted); the oracle is q132's
    recursive CTE with the phi*b products pasted exactly where the
    engine computes them. Micro-units projection, q60's convention."""
    from tinyflux_spark.operators.aggregates import holt_winters_last

    ev = _t("events")(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = holt_winters_last(
        ev, "user_id", "ts", "value",
        alpha=0.3, beta=0.1, gamma=0.2, period=4, phi=0.9,
        round_digits=None,
    )
    return out.select(
        "user_id",
        *[
            F.floor(F.col(c) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias(c + "_u")
            for c in ("level", "trend", "season", "forecast")
        ],
    )


def q133_stream_holt_winters(spark, sf_dir):
    """Per-user running Holt-Winters over the event stream via
    applyInPandasWithState — q132's streaming twin (identical
    recurrence AND identical first-season initialization; state is
    (cnt, l, b, s[4], buf) per key — O(period), not O(history)).
    Emits one row per event: NULL level/trend/forecast during the
    warm-up (the state is undefined), the first-season seed at the
    init row, the recurrence after. The oracle replays EVERY
    intermediate state — warm-up NULLs included — with a recursive
    CTE carrying the four seasonal columns."""
    import uuid

    from tinyflux_spark.streaming import ingest as st

    stream = _stream_event_source(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user_id"), "ts", "value"
    )
    out = st.stateful_holt_winters(
        stream, "user_id", "ts", "value",
        alpha=0.3, beta=0.1, gamma=0.2, period=4,
    )
    name = f"q133_out_{uuid.uuid4().hex[:8]}"
    st.run_to_memory(out, name, output_mode="append",
                     shuffle_partitions=8)
    # integer micro-units (q60's convention, see q132): NULL warm-up
    # rows stay NULL through the floor.
    return spark.table(name).select(
        "user_id",
        "ts",
        "value",
        *[
            F.floor(F.col(c) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias(c + "_u")
            for c in ("level", "trend", "forecast")
        ],
    )


# ----------------------------------------------------------------------
# Driver contract
# ----------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compound query-algebra search through the engine on
    sf0.001; driver checks rows>0 and stable schema."""
    return q04_search_compound(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the driver's CORRECTNESS artifact records
    # only the FIRST 50 entries. The order rotates each round so every
    # query periodically lands in that window. Round 12 (VERDICT r11
    # ask #2): the 36 r9-aged rows lead — q21-q25, q27-q32, q34-q37,
    # q39-q41, q70-q75, q89, q90, q101, q102, q109-q116 (every row's
    # last driver green is r9) — then 14 of the r10-refreshed cohort
    # (q02/q03/q05/q07/q08/q10/q33/q38/q42-q46/q48, the core-API rows)
    # fill the window to exactly 50. Below the window: the rest of the
    # r10 cohort (q47/q49-q52/q76-q88/q117-q134), then everything
    # r11-fresh (q135/q136/q53-q69/q91-q100/q103-q108/q01/q04/q06/q09/
    # q11-q20/q26 — the freshest rows rotate last). tools/check_gate.py
    # remains the per-commit guard over the full registry.
    return {
        "q21_text_quality": q21_text_quality,
        "q22_lang_id": q22_lang_id,
        "q23_doc_fingerprint": q23_doc_fingerprint,
        "q24_ann_cosine_topk": q24_ann_cosine_topk,
        "q25_embedding_near_dup": q25_embedding_near_dup,
        "q27_simhash_hamming_pairs": q27_simhash_hamming_pairs,
        "q28_sessionize": q28_sessionize,
        "q29_ewma_last": q29_ewma_last,
        "q30_token_stats": q30_token_stats,
        "q31_srp_ann_topk": q31_srp_ann_topk,
        "q32_frame_sample_plan": q32_frame_sample_plan,
        "q34_get_field_keys": q34_get_field_keys,
        "q35_get_tag_values": q35_get_tag_values,
        "q36_stream_ewma": q36_stream_ewma,
        "q37_dml_update_unset_remove": q37_dml_update_unset_remove,
        "q39_get_tag_keys": q39_get_tag_keys,
        "q40_get_field_values": q40_get_field_values,
        "q41_get_timestamps": q41_get_timestamps,
        "q70_stream_rollup_store": q70_stream_rollup_store,
        "q71_time_travel": q71_time_travel,
        "q72_decontaminate": q72_decontaminate,
        "q73_shard_assign": q73_shard_assign,
        "q74_pack_sequences": q74_pack_sequences,
        "q75_ivf_batch_topk": q75_ivf_batch_topk,
        "q89_excise_duplicate_spans": q89_excise_duplicate_spans,
        "q90_rollup_card": q90_rollup_card,
        "q101_kmv_set_overlap": q101_kmv_set_overlap,
        "q102_stream_semantic_dedup": q102_stream_semantic_dedup,
        "q109_ivf_pq_indexed_topk": q109_ivf_pq_indexed_topk,
        "q110_kmv_quantiles_by_key": q110_kmv_quantiles_by_key,
        "q111_pq_rerank_topk": q111_pq_rerank_topk,
        "q112_ivf_refined_topk": q112_ivf_refined_topk,
        "q113_ivf_pq_residual_topk": q113_ivf_pq_residual_topk,
        "q114_kmv_sketch_merge": q114_kmv_sketch_merge,
        "q115_stream_kmv_quantiles": q115_stream_kmv_quantiles,
        "q116_kmv_distinct_by_key": q116_kmv_distinct_by_key,
        "q02_search_tag_eq": q02_search_tag_eq,
        "q03_search_field_range": q03_search_field_range,
        "q05_search_measurement_regex": q05_search_measurement_regex,
        "q07_field_missing_key": q07_field_missing_key,
        "q08_not_exists": q08_not_exists,
        "q10_select_projection": q10_select_projection,
        "q33_media_features": q33_media_features,
        "q38_get_contains": q38_get_contains,
        "q42_all_len_iter": q42_all_len_iter,
        "q43_update_all": q43_update_all,
        "q44_remove_all": q44_remove_all,
        "q45_drop_measurement": q45_drop_measurement,
        "q46_insert_point_path": q46_insert_point_path,
        "q48_search_predicate": q48_search_predicate,
        "q47_map_test_predicates": q47_map_test_predicates,
        "q49_measurement_handle": q49_measurement_handle,
        "q50_csv_interop": q50_csv_interop,
        "q51_dedup_clusters": q51_dedup_clusters,
        "q52_ivf_ann_topk": q52_ivf_ann_topk,
        "q76_quality_filter": q76_quality_filter,
        "q77_bm25_scores": q77_bm25_scores,
        "q78_quantize_embeddings": q78_quantize_embeddings,
        "q79_edit_distance_pairs": q79_edit_distance_pairs,
        "q80_incremental_dedup_join": q80_incremental_dedup_join,
        "q81_corpus_profile": q81_corpus_profile,
        "q82_remove_boilerplate": q82_remove_boilerplate,
        "q83_temperature_sample": q83_temperature_sample,
        "q84_interval_join": q84_interval_join,
        "q85_unigram_logprob": q85_unigram_logprob,
        "q86_salted_join": q86_salted_join,
        "q87_version_diff": q87_version_diff,
        "q88_merge_intervals": q88_merge_intervals,
        "q117_ivf_append_serve": q117_ivf_append_serve,
        "q118_ivf_pq_residual_indexed": q118_ivf_pq_residual_indexed,
        "q119_data_card": q119_data_card,
        "q120_stream_ivf_append": q120_stream_ivf_append,
        "q121_weighted_sample_by_key": q121_weighted_sample_by_key,
        "q122_top_tokens_by_key": q122_top_tokens_by_key,
        "q123_decontaminate_bloom": q123_decontaminate_bloom,
        "q124_audio_features": q124_audio_features,
        "q125_stream_self_dedup": q125_stream_self_dedup,
        "q126_ivf_batch_indexed": q126_ivf_batch_indexed,
        "q127_holt_last": q127_holt_last,
        "q128_srp_batch_indexed": q128_srp_batch_indexed,
        "q129_stream_holt": q129_stream_holt,
        "q130_srp_append_serve": q130_srp_append_serve,
        "q131_index_recall_probe": q131_index_recall_probe,
        "q132_holt_winters_last": q132_holt_winters_last,
        "q133_stream_holt_winters": q133_stream_holt_winters,
        "q134_ivf_pq_batch_indexed": q134_ivf_pq_batch_indexed,
        "q135_ivf_retrain_serve": q135_ivf_retrain_serve,
        "q136_holt_winters_damped": q136_holt_winters_damped,
        "q53_hash_sample": q53_hash_sample,
        "q54_repetition_stats": q54_repetition_stats,
        "q55_source_quota": q55_source_quota,
        "q56_embedding_dup_clusters": q56_embedding_dup_clusters,
        "q57_length_deciles": q57_length_deciles,
        "q26_stream_hourly_rollup": q26_stream_hourly_rollup,
        "q58_dedup_keep_canonical": q58_dedup_keep_canonical,
        "q59_ivf_indexed_topk": q59_ivf_indexed_topk,
        "q60_resample_gapfill": q60_resample_gapfill,
        "q61_rolling_zscore": q61_rolling_zscore,
        "q62_top_tokens": q62_top_tokens,
        "q63_scrub_pii": q63_scrub_pii,
        "q64_chunk_documents": q64_chunk_documents,
        "q65_derivative": q65_derivative,
        "q66_percentiles": q66_percentiles,
        "q67_db_sql": q67_db_sql,
        "q68_downsample": q68_downsample,
        "q69_from_table": q69_from_table,
        "q91_bigram_logprob": q91_bigram_logprob,
        "q92_normalize_text": q92_normalize_text,
        "q93_stream_near_dup": q93_stream_near_dup,
        "q94_trigram_logprob": q94_trigram_logprob,
        "q95_semantic_dedup": q95_semantic_dedup,
        "q96_ppl_buckets": q96_ppl_buckets,
        "q97_importance_weights": q97_importance_weights,
        "q98_kneser_ney": q98_kneser_ney,
        "q99_text_semantic_dedup": q99_text_semantic_dedup,
        "q100_kmv_distinct": q100_kmv_distinct,
        "q103_fivegram_logprob": q103_fivegram_logprob,
        "q104_kmv_quantiles": q104_kmv_quantiles,
        "q105_pq_adc_topk": q105_pq_adc_topk,
        "q106_stream_kmv_distinct": q106_stream_kmv_distinct,
        "q107_ivf_pq_topk": q107_ivf_pq_topk,
        "q108_weighted_sample": q108_weighted_sample,
        "q01_search_time_range": q01_search_time_range,
        "q04_search_compound": q04_search_compound,
        "q06_count": q06_count,
        "q09_get_measurements": q09_get_measurements,
        "q11_agg_pricing_summary": q11_agg_pricing_summary,
        "q12_daily_revenue_ma7": q12_daily_revenue_ma7,
        "q13_topk_users_per_type": q13_topk_users_per_type,
        "q14_region_revenue": q14_region_revenue,
        "q15_hourly_window": q15_hourly_window,
        "q16_asof_join": q16_asof_join,
        "q17_dedup_exact": q17_dedup_exact,
        "q18_ngram_jaccard_pairs": q18_ngram_jaccard_pairs,
        "q19_minhash_lsh_pairs": q19_minhash_lsh_pairs,
        "q20_simhash": q20_simhash,
    }


# Shared oracle CTEs: normalized text and distinct 3-gram shingles.
_NORM_CTE = """
norm AS (
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '[\\s\\x0B]+', ' ', 'g') AS t
    FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
)"""

_SHINGLE_CTE = _NORM_CTE + """,
words AS (
    SELECT doc_id, string_split(t, ' ') AS w FROM norm
),
sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(w[CAST(i AS INT):CAST(i + 2 AS INT)],
                           ' ') AS shingle
    FROM words, UNNEST(range(1, greatest(len(w) - 2, 1) + 1)) AS r(i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT id_a, id_b,
           ROUND(common / (ca.n + cb.n - common), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
)"""


# Banded MinHash signature CTEs (consumes `sh` from _SHINGLE_CTE; ends
# in banded(doc_id, band, bsig)). Hash i = the (i % 4)-th 8-hex window
# of md5((i // 4) || ':' || shingle); fixed-width lowercase hex min ==
# numeric min (mirrors dedup._minhash_min_exprs). Shared by the q19
# self-dedup and q80 incremental-join oracles so the family can't
# drift between them.
_MINHASH_BAND_CTE = """mh AS (
                SELECT doc_id, CAST(h AS INT) AS h,
                       MIN(substr(
                           md5(CAST(h // 4 AS VARCHAR) || ':' || shingle),
                           CAST((h % 4) * 8 + 1 AS INT), 8)) AS v
                FROM sh, UNNEST(range(0, 12)) AS t(h)
                GROUP BY 1, 2
            ),
            sigs AS (
                SELECT doc_id, list(v ORDER BY h) AS sig FROM mh GROUP BY 1
            ),
            banded AS (
                SELECT doc_id, CAST(band AS INT) AS band,
                       array_to_string(
                           sig[CAST(band*3+1 AS INT):CAST(band*3+3 AS INT)],
                           '|') AS bsig
                FROM sigs, UNNEST(range(0, 4)) AS t(band)
            )"""


def _hex_to_int_sql(hex_expr: str, digits: int) -> str:
    """SQL computing the integer value of the first ``digits`` hex chars
    of ``hex_expr`` — DuckDB has no conv(); positional digit sum equals
    Spark's conv(...,16,10) exactly on integers."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hex_expr}, {p}, 1)) - 1)"
        f" * CAST({16 ** (digits - p)} AS BIGINT)"
        for p in range(1, digits + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def _lang_id_oracle_sql() -> str:
    """Generated from the same tables the Spark lang_id expression uses
    (tinyflux_spark/operators/text.py) so both stay in lockstep."""
    from tinyflux_spark.operators.text import _SCRIPTS, _STOPWORDS

    counts = {
        lang: (
            "len(regexp_extract_all(text, '(?i)\\b("
            + "|".join(words)
            + ")\\b'))"
        )
        for lang, words in _STOPWORDS.items()
    }
    m = "greatest(" + ", ".join(counts.values()) + ")"
    # Winner = FIRST language in declaration order reaching the max
    # (mirrors the declaration-order strict-greater fold in lang_id).
    stop_case = f"CASE WHEN {m} <= 0 THEN 'und' "
    for lang in list(_STOPWORDS):
        stop_case += f"WHEN {counts[lang]} = {m} THEN '{lang}' "
    stop_case += "ELSE 'und' END"
    script_whens = ""
    for lang, ranges in _SCRIPTS.items():
        lo, hi = ranges[0], ranges[2]
        pat = f"[\\x{{{ord(lo):x}}}-\\x{{{ord(hi):x}}}]"
        cond = (
            f"len(regexp_extract_all(text, '{pat}')) * 10 "
            f"> greatest(length(text), 1) * 3"
        )
        script_whens += f"WHEN {cond} THEN '{lang}' "
    return f"""
        SELECT doc_id, lang,
               CASE {script_whens}ELSE ({stop_case}) END AS lang_guess
        FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
    """


def _simhash_sig_cte() -> str:
    """CTE chain ending in sigs(doc_id, simhash) — shared by the q20
    signature oracle and the q27 hamming-pair oracle."""
    h = _hex_to_int_sql("md5(tok)", 8)
    return f"""{_NORM_CTE},
        toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id,
                       UNNEST(string_split_regex(trim(t), '[\\s\\x0B]+')) AS tok
                FROM norm
            ) WHERE tok <> ''
        ),
        hashed AS (SELECT doc_id, {h} AS hv FROM toks),
        votes AS (
            SELECT doc_id, CAST(bit AS INT) AS bit,
                   SUM(((hv >> CAST(bit AS INT)) & 1) * 2 - 1) AS s
            FROM hashed, UNNEST(range(0, 32)) AS t(bit)
            GROUP BY 1, 2
        ),
        sigs AS (
            -- LEFT JOIN from documents: the engine's explode_outer
            -- keeps token-less documents (empty / all-whitespace
            -- text) with signature 0 — all-empty docs ARE identical,
            -- so grouping them together is the correct dedup answer.
            SELECT d.doc_id,
                   CAST(COALESCE(v.simhash_raw, 0) AS BIGINT)
                       AS simhash
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) d LEFT JOIN (
                SELECT doc_id,
                       SUM(CASE WHEN s > 0
                           THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                           AS simhash_raw
                FROM votes GROUP BY doc_id
            ) v USING (doc_id)
        )"""


def _simhash_oracle_sql() -> str:
    return f"""
        WITH {_simhash_sig_cte()}
        SELECT doc_id, simhash FROM sigs
    """


def _simhash_pairs_oracle_sql(max_hamming: int = 3, bits: int = 32) -> str:
    nb = max_hamming + 1
    w = bits // nb
    mask = (1 << w) - 1
    return f"""
        WITH {_simhash_sig_cte()},
        banded AS (
            SELECT doc_id, simhash, CAST(band AS INT) AS band,
                   (simhash >> (CAST(band AS INT) * {w})) & {mask} AS bval
            FROM sigs, UNNEST(range(0, {nb})) AS t(band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS sig_a, b.simhash AS sig_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.bval = b.bval
            WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


def _near_dup_oracle_sql(threshold: float = 0.35, num_planes: int = 2,
                         dim: int = 64, seed: int = 42) -> str:
    """Replicates near_dup_pairs with the SAME seeded hyperplanes the
    Spark operator uses, inlined as SQL list literals — the bucket
    equi-join and exact-cosine verify are both oracle-checked."""
    from tinyflux_spark.operators.similarity import srp_planes

    planes = srp_planes(dim, num_planes, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lit}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    return f"""
        WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS (SELECT vec_id, e, {bucket} AS bucket FROM emb),
        pairs AS (
            SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                   list_dot_product(a.e, c.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(c.e, c.e))) AS cs
            FROM b a JOIN b c USING (bucket)
            WHERE a.vec_id < c.vec_id
        )
        SELECT id_a, id_b, ROUND(cs, 6) AS cosine_sim
        FROM pairs WHERE cs >= {threshold}
    """


def _srp_ann_oracle_sql(num_planes: int = 4, dim: int = 64,
                        seed: int = 42, k: int = 10) -> str:
    """Replicates srp_lsh_topk: same seeded hyperplanes inlined as SQL
    literals; the query vector's bucket and its 1-bit multiprobe
    neighborhood are computed IN SQL, so candidate pruning and the
    rounded ranking are both oracle-checked."""
    from tinyflux_spark.operators.similarity import srp_planes

    planes = srp_planes(dim, num_planes, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lit}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    probes = " OR ".join(
        ["bucket = qb"]
        + [f"bucket = xor(qb, {1 << i})" for i in range(num_planes)]
    )
    return f"""
        WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS (SELECT vec_id, e, {bucket} AS bucket FROM emb),
        q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id,
               ROUND(list_dot_product(e, qe)
                     / (sqrt(list_dot_product(e, e))
                        * sqrt(list_dot_product(qe, qe))), 6) AS cosine_sim
        FROM b, q
        WHERE vec_id <> 0 AND ({probes})
        ORDER BY cosine_sim DESC, vec_id LIMIT {k}
    """


def _holt_winters_oracle_sql(every_row: bool, phi: float = 1.0) -> str:
    """q132/q133/q136: the coupled THREE-term Holt-Winters recurrence
    (alpha=0.3, beta=0.1, gamma=0.2, period=4) replayed with a
    recursive CTE carrying the four seasonal columns. The seed is the
    first season pivoted wide: l = the same sequential left-fold mean
    the engine's F.aggregate computes, s_j = v_j - l. Complements are
    written as subtractions on both sides (q127's convention) so
    neither engine constant-folds to a different double; rounding at
    the end only. ``every_row=True`` (q133) emits every position —
    warm-up NULLs, the init row, and each recursion step — so every
    intermediate streaming state is gated; ``False`` (q132/q136)
    keeps the final row per key with the season/forecast projection.
    ``phi`` (q136) pastes the Gardner-McKenzie damped-trend products
    ``phi*b`` exactly where the engine computes them; at the default
    1.0 the products are omitted — IEEE ``1.0*x == x``, so the
    undamped SQL is the same arithmetic either way."""
    PHIB = "s.b" if phi == 1.0 else f"({phi!r}::DOUBLE * s.b)"
    LAG = (
        "(CASE ((o.rn - 1) % 4) WHEN 0 THEN s.s0 WHEN 1 THEN s.s1 "
        "WHEN 2 THEN s.s2 ELSE s.s3 END)"
    )
    NL = (
        f"(0.3::DOUBLE * (o.v - {LAG}) "
        f"+ (1.0::DOUBLE - 0.3::DOUBLE) * (s.l + {PHIB}))"
    )
    NB = (
        f"(0.1::DOUBLE * ({NL} - s.l) "
        f"+ (1.0::DOUBLE - 0.1::DOUBLE) * {PHIB})"
    )
    SNEW = (
        f"(0.2::DOUBLE * (o.v - {NL}) "
        f"+ (1.0::DOUBLE - 0.2::DOUBLE) * {LAG})"
    )
    s_cols = ",\n               ".join(
        f"CASE WHEN (o.rn - 1) % 4 = {j} THEN {SNEW} "
        f"ELSE s.s{j} END"
        for j in range(4)
    )
    ts_seed = (
        "MAX(CASE WHEN rn = 4 THEN ts END) AS ts,\n           "
        if every_row
        else ""
    )
    ts_sel = "seed.ts, " if every_row else ""
    ts_rec = "o.ts, " if every_row else ""
    head = f"""
        WITH RECURSIVE o AS (
            SELECT CAST(user_id AS VARCHAR) AS k, ts,
                   CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        seed AS (
            SELECT k, MAX(n) AS n,
           {ts_seed}((((0.0::DOUBLE
                   + MAX(CASE WHEN rn = 1 THEN v END))
                   + MAX(CASE WHEN rn = 2 THEN v END))
                   + MAX(CASE WHEN rn = 3 THEN v END))
                   + MAX(CASE WHEN rn = 4 THEN v END))
                       / 4.0::DOUBLE AS l,
                   MAX(CASE WHEN rn = 1 THEN v END) AS v1,
                   MAX(CASE WHEN rn = 2 THEN v END) AS v2,
                   MAX(CASE WHEN rn = 3 THEN v END) AS v3,
                   MAX(CASE WHEN rn = 4 THEN v END) AS v4
            FROM o WHERE rn <= 4 GROUP BY k
        ),
        s AS (
            SELECT k, n, {ts_sel}v4 AS v, CAST(4 AS BIGINT) AS i,
                   l, 0.0::DOUBLE AS b,
                   v1 - l AS s0, v2 - l AS s1,
                   v3 - l AS s2, v4 - l AS s3
            FROM seed
            UNION ALL
            SELECT s.k, s.n, {ts_rec}o.v, o.rn,
                   {NL},
                   {NB},
                   {s_cols}
            FROM s JOIN o ON o.k = s.k AND o.rn = s.i + 1
        )"""
    season = (
        "CASE (i % 4) WHEN 0 THEN s0 WHEN 1 THEN s1 "
        "WHEN 2 THEN s2 ELSE s3 END"
    )
    FB = "b" if phi == 1.0 else f"({phi!r}::DOUBLE * b)"
    # integer micro-units via floor(x*1e6 + 0.5) — q60's convention:
    # decimal ROUND breaks half-ulp boundary values differently across
    # engines; floor over the bit-identical IEEE product does not.
    if every_row:
        return head + f"""
        SELECT k AS user_id, ts, v AS value,
               CAST(NULL AS BIGINT) AS level_u,
               CAST(NULL AS BIGINT) AS trend_u,
               CAST(NULL AS BIGINT) AS forecast_u
        FROM o WHERE rn < 4
        UNION ALL
        SELECT k AS user_id, ts, v AS value,
               CAST(FLOOR(l * 1000000 + 0.5) AS BIGINT) AS level_u,
               CAST(FLOOR(b * 1000000 + 0.5) AS BIGINT) AS trend_u,
               CAST(FLOOR((l + {FB} + {season}) * 1000000 + 0.5)
                    AS BIGINT) AS forecast_u
        FROM s
    """
    return head + f"""
        SELECT k AS user_id,
               CAST(FLOOR(l * 1000000 + 0.5) AS BIGINT) AS level_u,
               CAST(FLOOR(b * 1000000 + 0.5) AS BIGINT) AS trend_u,
               CAST(FLOOR(({season}) * 1000000 + 0.5) AS BIGINT)
                   AS season_u,
               CAST(FLOOR((l + {FB} + {season}) * 1000000 + 0.5)
                    AS BIGINT) AS forecast_u
        FROM s WHERE i = n
    """


def _srp_recall_oracle_sql(num_planes: int = 4, dim: int = 64,
                           seed: int = 42, k: int = 5) -> str:
    """q131: replay BOTH rankings — the indexed (bucket-pruned,
    multiprobe-1) read and the exact brute-force rounded-cosine
    top-k — then the per-query intersection fraction, exactly
    index_recall_probe's (query_id, hits, n_exact, recall) contract."""
    from tinyflux_spark.operators.similarity import srp_planes

    planes = srp_planes(dim, num_planes, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lit}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    probes = " OR ".join(
        ["b.bucket = q.qb"]
        + [f"b.bucket = xor(q.qb, {1 << i})" for i in range(num_planes)]
    )
    return f"""
        WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS (SELECT vec_id, e, {bucket} AS bucket FROM emb),
        q AS (
            SELECT vec_id AS qid, e AS qe, bucket AS qb FROM b
            WHERE vec_id % 100 = 0
        ),
        scored AS (
            SELECT q.qid AS query_id, b.vec_id, b.bucket, q.qb,
                   ROUND(list_dot_product(b.e, q.qe)
                         / (sqrt(list_dot_product(b.e, b.e))
                            * sqrt(list_dot_product(q.qe, q.qe))),
                         6) AS cosine_sim,
                   ({probes}) AS probed
            FROM b, q
            WHERE b.vec_id <> q.qid
        ),
        approx AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, vec_id) AS r
                FROM scored WHERE probed
            ) WHERE r <= {k}
        ),
        exact AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, vec_id) AS r
                FROM scored
            ) WHERE r <= {k}
        )
        SELECT e.query_id,
               CAST(count(a.vec_id) AS BIGINT) AS hits,
               CAST(count(*) AS BIGINT) AS n_exact,
               ROUND(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6)
                   AS recall
        FROM exact e
        LEFT JOIN approx a
          ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        GROUP BY e.query_id
    """


def _srp_batch_oracle_sql(num_planes: int = 4, dim: int = 64,
                          seed: int = 42, k: int = 5) -> str:
    """q31's replay generalized to a query SET (q128): every
    vec_id % 100 == 0 row is a query, its bucket + 1-bit multiprobe
    neighborhood computed in SQL from the same inlined seeded
    hyperplanes, candidates pruned per query, per-query rank <= k
    with self excluded — exactly srp_topk_batch_indexed's semantics
    over the persisted layout."""
    from tinyflux_spark.operators.similarity import srp_planes

    planes = srp_planes(dim, num_planes, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lit}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    probes = " OR ".join(
        ["b.bucket = q.qb"]
        + [f"b.bucket = xor(q.qb, {1 << i})" for i in range(num_planes)]
    )
    return f"""
        WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        b AS (SELECT vec_id, e, {bucket} AS bucket FROM emb),
        q AS (
            SELECT vec_id AS qid, e AS qe, bucket AS qb FROM b
            WHERE vec_id % 100 = 0
        ),
        cand AS (
            SELECT q.qid AS query_id, b.vec_id,
                   ROUND(list_dot_product(b.e, q.qe)
                         / (sqrt(list_dot_product(b.e, b.e))
                            * sqrt(list_dot_product(q.qe, q.qe))),
                         6) AS cosine_sim
            FROM b, q
            WHERE b.vec_id <> q.qid AND ({probes})
        )
        SELECT query_id, vec_id, cosine_sim,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, vec_id) AS rank
            FROM cand
        )
        WHERE rank <= {k}
    """


def _media_features_oracle_sql(n: int = 64) -> str:
    """Replays q33 in SQL from the generative pixel formula: the Spark
    side decodes REAL PNG bytes (zlib inflate + unfilter) of
    synthetic_pixels(i) where pixel(r,c) = (i*31 + r*8 + c*7) % 256;
    the oracle recomputes every pixel from that formula and pools the
    same row means. Pixel sums are integers (exact in double) and the
    /16.0 division is a power of two, so the compare is bit-exact —
    any wrong byte in the PNG encode or decode path breaks it. The
    per-item PNG byte lengths are an ENCODER property (zlib stream
    length), not SQL-computable: they're generated here from the same
    encoder and inlined as literals."""
    from tinyflux_spark.operators.multimodal import (
        FEATURE_DIM,
        encode_png,
        synthetic_media,  # noqa: F401 — documents provenance
        synthetic_pixels,
    )

    nb = ", ".join(
        f"({i}, {len(encode_png(synthetic_pixels(i)))})" for i in range(n)
    )
    last = FEATURE_DIM - 1
    return f"""
        WITH px AS (
            SELECT CAST(i AS BIGINT) AS media_id, r, c,
                   (i*31 + r*8 + c*7) % 256 AS p
            FROM range({n}) t(i), range(16) t2(r), range(16) t3(c)
        ),
        feat AS (
            SELECT media_id,
                   SUM(CASE WHEN r = 0 THEN p END) / 16.0 AS s0,
                   SUM(CASE WHEN r = {last} THEN p END) / 16.0 AS s_last
            FROM px GROUP BY 1
        ),
        nb(media_id, n_bytes) AS (VALUES {nb})
        SELECT f.media_id, 'image' AS kind,
               ROUND(s0, 6) AS f0,
               ROUND(s_last, 6) AS f_last,
               CAST(n_bytes AS BIGINT) AS n_bytes
        FROM feat f JOIN nb ON f.media_id = nb.media_id
    """


def _audio_features_oracle_sql(n: int = 64, n_samples: int = 64) -> str:
    """Replays q124 in SQL from the generative sample formula: the
    Spark side decodes REAL RIFF/WAV bytes of synthetic_samples(i)
    where s(j) = (i*73 + j*29) % 4096 - 2048; the oracle recomputes
    every int16 sample and pools the same 4-sample means. Sample sums
    are integers (exact in double) and /4.0 is a power of two, so the
    compare is bit-exact. Per-item WAV byte lengths are a CONTAINER
    property (44-byte RIFF header + 2 bytes/sample) — generated here
    from the same encoder and inlined, exactly as q33 inlines its
    zlib stream lengths."""
    from tinyflux_spark.operators.multimodal import (
        FEATURE_DIM,
        encode_wav,
        synthetic_samples,
    )

    nb = ", ".join(
        f"({i}, {len(encode_wav(synthetic_samples(i, n_samples)))})"
        for i in range(n)
    )
    pool = n_samples // FEATURE_DIM
    lo_last = (FEATURE_DIM - 1) * pool
    return f"""
        WITH s AS (
            SELECT CAST(i AS BIGINT) AS media_id, j,
                   (i*73 + j*29) % 4096 - 2048 AS v
            FROM range({n}) t(i), range({n_samples}) t2(j)
        ),
        feat AS (
            SELECT media_id,
                   SUM(CASE WHEN j < {pool} THEN v END) / {pool}.0 AS s0,
                   SUM(CASE WHEN j >= {lo_last} THEN v END) / {pool}.0
                       AS s_last
            FROM s GROUP BY 1
        ),
        nb(media_id, n_bytes) AS (VALUES {nb})
        SELECT f.media_id, 'audio' AS kind,
               ROUND(s0, 6) AS f0,
               ROUND(s_last, 6) AS f_last,
               CAST(n_bytes AS BIGINT) AS n_bytes
        FROM feat f JOIN nb ON f.media_id = nb.media_id
    """


# q46/q50 fixture replay: the same first-200-by-event_id rows the point
# path and CSV codec round-trip, with 'k' absent (NULL) on clicks.
_FIRST_EVENTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS eid, ts AS time,
           event_type AS measurement, CAST(user_id AS VARCHAR) AS user,
           value,
           CASE WHEN event_type <> 'click'
                THEN CAST(json_extract_string(props, '$.k') AS DOUBLE)
           END AS k
    FROM (SELECT * FROM events ORDER BY event_id LIMIT 200)
"""


# Shared by q52 (recompute) and q59 (persisted index): identical
# codebook, assignment, probe set, and ranking by construction.
_IVF_ORACLE_SQL = """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
            corpus AS (SELECT * FROM emb WHERE vec_id <> 0),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM corpus
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM corpus, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1 AS cidx,
                       c.e AS ce
                FROM corpus c JOIN cids ON c.vec_id = cids.cid
            ),
            asg AS (
                SELECT c.vec_id, c.e,
                       (SELECT cidx FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, cidx
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT cidx FROM cent, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, cidx
                LIMIT 4
            )
            SELECT vec_id,
                   ROUND(list_dot_product(e, qe)
                         / (sqrt(list_dot_product(e, e))
                            * sqrt(list_dot_product(qe, qe))),
                         6) AS cosine_sim
            FROM asg, q
            WHERE lst IN (SELECT cidx FROM probes)
            ORDER BY cosine_sim DESC, vec_id LIMIT 10
        """


# Shared by q80 (batch incremental dedup) and q93 (its streaming twin):
# stream/batch unification means ONE oracle defines both results.
_INCR_DEDUP_ORACLE = f"""
    WITH {_SHINGLE_CTE},
    {_MINHASH_BAND_CTE},
    cand AS (
        SELECT DISTINCT l.doc_id AS id_left, r.doc_id AS id_right
        FROM banded l
        JOIN banded r ON l.band = r.band AND l.bsig = r.bsig
        WHERE l.doc_id % 5 = 0 AND r.doc_id % 5 <> 0
    )
    SELECT c.id_left, c.id_right, j.jaccard
    FROM cand c
    JOIN jac j ON j.id_a = least(c.id_left, c.id_right)
              AND j.id_b = greatest(c.id_left, c.id_right)
    WHERE j.jaccard >= 0.7
"""


# ----------------------------------------------------------------------
# PQ oracle family: shared CTE text for the q105/q107/q109/q111 replays.
# The stride codebook (book0), optional Lloyd refinement rounds, the
# per-(vector, subspace) encode argmin and the DECIMAL-quantized ADC
# table are one set of definitions so the family cannot drift.
# ----------------------------------------------------------------------

# emb/q/corpus/bounds/cids/cent/sp/book0: full-vector stride codebook
# (q52's derivation) sliced into 8 sub-codebooks of 8 dims each.
_PQ_BASE_CTES = """emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
            corpus AS (SELECT * FROM emb WHERE vec_id <> 0),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM corpus
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM corpus, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS code,
                       c.e AS ce
                FROM corpus c JOIN cids ON c.vec_id = cids.cid
            ),
            sp AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
            book0 AS (
                SELECT sp.s, cent.code,
                       ce[sp.s * 8 + 1 : sp.s * 8 + 8] AS bsub
                FROM cent, sp
            )"""


def _pq_argmin_subq(book: str, seg: str) -> str:
    """Correlated nearest-sub-codeword subquery: argmin of the
    6dp-rounded squared L2 (d = elementwise diff; list_dot_product(d,
    d) is the same left fold as the engine's zip_with square fold),
    ties toward the lower code — pq_encode's convention verbatim."""
    diff = f"list_transform(list_zip({seg}, b.bsub), p -> p[1] - p[2])"
    return f"""(SELECT b.code FROM {book} b
                        WHERE b.s = sp.s
                        ORDER BY ROUND(list_dot_product(
                            {diff},
                            {diff}), 6),
                                 b.code
                        LIMIT 1)"""


def _pq_refine_ctes(iters: int) -> str:
    """Unrolled Lloyd refinement rounds, replaying pq_train's update
    bit-for-bit: assign every subvector with the shared argmin, then
    each (subspace, code) cluster's new codeword element d is
    double(S)/double(n)/1e6 with S the exact integer sum of
    floor(x*1e6) — floor has no rounding-tie ambiguity and both
    divisions are single IEEE ops on exactly-representable operands,
    so Spark, Python and DuckDB produce the identical double. Empty
    clusters keep the previous codeword (the LEFT JOIN coalesce)."""
    parts = []
    for i in range(1, iters + 1):
        prev = f"book{i - 1}"
        parts.append(f""",
            asg{i} AS (
                SELECT c.vec_id, sp.s,
                       c.e[sp.s*8+1 : sp.s*8+8] AS sv,
                       {_pq_argmin_subq(prev, "c.e[sp.s*8+1 : sp.s*8+8]")} AS code
                FROM corpus c, sp
            ),
            sm{i} AS (
                SELECT a.s, a.code, r.i AS d,
                       SUM(CAST(floor(a.sv[CAST(r.i AS INT)]
                                      * 1000000.0) AS BIGINT)) AS sq,
                       COUNT(*) AS n
                FROM asg{i} a, UNNEST(range(1, 9)) AS r(i)
                GROUP BY a.s, a.code, r.i
            ),
            nb{i} AS (
                SELECT s, code,
                       list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                            / 1000000.0 ORDER BY d) AS bsub
                FROM sm{i} GROUP BY s, code
            ),
            book{i} AS (
                SELECT b.s, b.code,
                       coalesce(nb.bsub, b.bsub) AS bsub
                FROM {prev} b
                LEFT JOIN nb{i} nb ON nb.s = b.s AND nb.code = b.code
            )""")
    return "".join(parts)


def _kmv_byk_oracle(k: int, probs_lit: str, extra_where: str = "") -> str:
    """Per-group KMV quantile replay (q110/q114/q115's shared text):
    the k lowest-md5(doc_id) rows per source are the uniform sample,
    per-group ROW_NUMBER over (value, hash) gives the order
    statistics, rank = greatest(1, ceil(p * n_g)). q114 runs this
    ONE-SHOT text against the engine's sketch→merge→estimate path —
    the KMV merge theorem is the equality being gated; q115 runs it
    against the STREAMED sketch over the shard slice (stream ==
    batch)."""
    return f"""
            WITH kept AS (
                SELECT source AS grp,
                       ('0x' || substr(md5('kmvq:'
                            || CAST(doc_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h,
                       CAST(n_chars AS DOUBLE) AS v
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                      AND source IS NOT NULL {extra_where}
            ),
            tot AS (
                SELECT grp, COUNT(*) AS n_total FROM kept GROUP BY grp
            ),
            samp AS (
                SELECT grp, h, v
                FROM kept
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY grp ORDER BY h, v) <= {k}
            ),
            ranked AS (
                SELECT grp, v,
                       ROW_NUMBER() OVER (
                           PARTITION BY grp ORDER BY v, h) AS r,
                       COUNT(*) OVER (PARTITION BY grp) AS n_sample
                FROM samp
            ),
            p AS (
                SELECT CAST(unnest({probs_lit}) AS DOUBLE) AS prob
            )
            SELECT rk.grp AS "group", p.prob, rk.r AS rank,
                   rk.n_sample, rk.v AS estimate,
                   (rk.n_sample >= t.n_total) AS exact
            FROM ranked rk
            JOIN tot t ON t.grp = rk.grp
            JOIN p ON rk.r = greatest(
                1, CAST(ceil(p.prob * rk.n_sample) AS BIGINT))
            ORDER BY 1, 2
        """


# emb/q/corpus/bounds/cids/cent: the coarse stride codebook with the
# q52 column convention (cidx, ce) — shared by the refined-IVF (q112)
# and residual-IVFPQ (q113) replays.
_IVF_COARSE_CTES = """emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
            corpus AS (SELECT * FROM emb WHERE vec_id <> 0),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM corpus
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM corpus, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS cidx,
                       c.e AS ce
                FROM corpus c JOIN cids ON c.vec_id = cids.cid
            )"""


def _ivf_refine_ctes(iters: int, dim: int = 64) -> str:
    """Unrolled cosine-Lloyd rounds over the coarse codebook
    (``cent`` with columns (cidx, ce)), replaying
    ivf_centroids(refine_iters=) bit-for-bit: re-assign every corpus
    vector by the 6dp-rounded cosine argmax (ties to the lower cidx),
    then each cluster's new centroid element d is
    double(S)/double(n)/1e6 with S the exact integer sum of
    floor(e[d]*1e6); empty clusters keep the previous centroid. Emits
    cent1..cent{iters}; downstream CTEs reference cent{iters}."""
    parts = []
    for i in range(1, iters + 1):
        prev = "cent" if i == 1 else f"cent{i - 1}"
        parts.append(f""",
            casg{i} AS (
                SELECT c.vec_id, c.e,
                       (SELECT cidx FROM {prev}
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, cidx
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            csm{i} AS (
                SELECT a.lst AS cidx, r.i AS d,
                       SUM(CAST(floor(a.e[CAST(r.i AS INT)]
                                      * 1000000.0) AS BIGINT)) AS sq,
                       COUNT(*) AS n
                FROM casg{i} a, UNNEST(range(1, {dim + 1})) AS r(i)
                GROUP BY a.lst, r.i
            ),
            ncent{i} AS (
                SELECT cidx,
                       list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                            / 1000000.0 ORDER BY d) AS ce
                FROM csm{i} GROUP BY cidx
            ),
            cent{i} AS (
                SELECT c.cidx, coalesce(n.ce, c.ce) AS ce
                FROM {prev} c
                LEFT JOIN ncent{i} n ON n.cidx = c.cidx
            )""")
    return "".join(parts)


def _pq_enc_tbl_ctes(book: str, src: str) -> str:
    """Encode ``src`` rows against ``book`` (enc) and build the
    query's DECIMAL(20,12)-quantized ADC lookup table (tbl) — shared
    by every PQ oracle. Each table entry is the query's sq-L2 per
    (s, code) cast through the engines' shared double->decimal
    cast."""
    diff = (
        "list_transform(list_zip(qe[b.s*8+1 : b.s*8+8], b.bsub), "
        "p -> p[1] - p[2])"
    )
    return f""",
            enc AS (
                SELECT c.vec_id, sp.s,
                       {_pq_argmin_subq(book, "c.e[sp.s*8+1 : sp.s*8+8]")} AS code
                FROM {src} c, sp
            ),
            tbl AS (
                SELECT b.s, b.code,
                       CAST(list_dot_product(
                           {diff},
                           {diff})
                           AS DECIMAL(20,12)) AS d
                FROM {book} b, q
            )"""


_PQ_ADC_BODY = """SELECT e.vec_id, CAST(SUM(t.d) AS DOUBLE) AS adc_dist
            FROM enc e JOIN tbl t ON t.s = e.s AND t.code = e.code
            GROUP BY e.vec_id
            ORDER BY adc_dist, e.vec_id"""


def _pq_enc_adc_sql(book: str, src: str, k: int = 10) -> str:
    """The full shared tail: encode + ADC table + the exact decimal
    m-term SUM (order-independent), top-k ascending with id ties."""
    return f"""{_pq_enc_tbl_ctes(book, src)}
            {_PQ_ADC_BODY}
            LIMIT {k}"""


def oracle_sql() -> dict[str, str]:
    # Tokenizer convention: the engine splits with Java regex \s
    # (= [ \t\n\x0B\f\r]); DuckDB's RE2 \s lacks \x0B (vertical tab),
    # so every oracle spells whitespace as the explicit class
    # [\s\x0B] — identical semantics in both engines for any input,
    # not just inputs that happen to avoid \x0B.
    d = {
        "q01_search_time_range": f"""
            {_FLAT_SQL}
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        """,
        "q02_search_tag_eq": f"""
            {_FLAT_SQL}
            WHERE CAST(user_id AS VARCHAR) = '7'
        """,
        "q03_search_field_range": f"""
            {_FLAT_SQL}
            WHERE value >= 50 AND value <= 150
        """,
        "q04_search_compound": f"""
            {_FLAT_SQL}
            WHERE (value >= 100 OR event_type = 'click')
              AND NOT (CAST(user_id AS VARCHAR) = '7')
        """,
        "q05_search_measurement_regex": f"""
            {_FLAT_SQL}
            WHERE regexp_matches(event_type, '^(?:p.*)')
        """,
        "q06_count": """
            SELECT COUNT(*) AS cnt FROM events
            WHERE value > 200 AND event_type <> 'view'
        """,
        "q07_field_missing_key": f"""
            {_FLAT_SQL}
            WHERE event_type <> 'click'
              AND CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
        """,
        "q08_not_exists": f"""
            {_FLAT_SQL}
            WHERE event_type = 'click'
        """,
        "q09_get_measurements": """
            SELECT DISTINCT event_type AS measurement FROM events
            ORDER BY measurement
        """,
        "q10_select_projection": """
            SELECT ts AS time, CAST(user_id AS VARCHAR) AS tag_user,
                   value AS field_value
            FROM events
            WHERE event_type = 'purchase' AND value >= 250
        """,
        "q11_agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                       AS sum_disc_price,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q12_daily_revenue_ma7": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            )
            SELECT strftime(day, '%Y-%m-%d') AS day, revenue,
                   AVG(revenue) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS revenue_ma7
            FROM daily
        """,
        "q13_topk_users_per_type": """
            WITH totals AS (
                SELECT event_type, user_id,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
                FROM events GROUP BY 1, 2
            )
            SELECT * FROM (
                SELECT event_type, user_id, total_value,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY total_value DESC, user_id) AS INT) AS rank
                FROM totals
            ) WHERE rank <= 3
        """,
        "q14_region_revenue": """
            SELECT r_name,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q15_hourly_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q16_asof_join": """
            SELECT p.event_id AS event_id, p.user_id AS user_id,
                   p.ts AS purchase_ts, c.ts AS prior_click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "q17_dedup_exact": f"""
            WITH {_NORM_CTE}
            SELECT md5(t) AS fp, MIN(doc_id) AS keep_id,
                   COUNT(*) AS n_dups
            FROM norm GROUP BY 1
        """,
        # q18 models the entry's explicit df-cut (max_shingle_freq=1000)
        # EXACTLY: the engine verifies candidates against the full
        # uncut shingle sets, and its prefix bound provably emits a
        # pair iff it shares >= 1 under-cut shingle and its FULL
        # jaccard >= t (proof in ngram_jaccard_pairs' docstring). At
        # the test SFs max shingle df is 25, so the cut is inert — the
        # oracle still carries it so engine and oracle stay identical
        # at ANY corpus scale.
        "q18_ngram_jaccard_pairs": f"""
            WITH {_SHINGLE_CTE},
            dfreq AS (
                SELECT shingle, COUNT(*) AS sdf FROM sh GROUP BY 1
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a
                JOIN sh b USING (shingle)
                JOIN dfreq USING (shingle)
                WHERE a.doc_id < b.doc_id AND sdf <= 1000
            )
            SELECT j.id_a, j.id_b, j.jaccard
            FROM jac j JOIN cand c
              ON c.id_a = j.id_a AND c.id_b = j.id_b
            WHERE j.jaccard >= 0.7
        """,
        "q19_minhash_lsh_pairs": f"""
            WITH {_SHINGLE_CTE},
            {_MINHASH_BAND_CTE},
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a
                JOIN banded b ON a.band = b.band AND a.bsig = b.bsig
                WHERE a.doc_id < b.doc_id
            )
            SELECT c.id_a, c.id_b, j.jaccard
            FROM cand c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
            WHERE j.jaccard >= 0.7
        """,
        "q20_simhash": _simhash_oracle_sql(),
        "q21_text_quality": """
            SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+'))
                END AS n_tokens,
                ROUND(len(regexp_extract_all(text, '[.,;:!?]'))
                      / greatest(length(text), 1), 6) AS punct_ratio,
                ROUND(len(regexp_extract_all(text, '[0-9]'))
                      / greatest(length(text), 1), 6) AS digit_ratio,
                ROUND(len(regexp_extract_all(text,
                      '(?i)\\b(the|and|is|was|of|to|in|that|it|for)\\b'))
                      / greatest(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+'))
                        END, 1), 6) AS stopword_ratio,
                ROUND((length(text) - len(regexp_extract_all(text, '[\\s\\x0B]')))
                      / greatest(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+'))
                        END, 1), 6) AS mean_token_len
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
        """,
        "q22_lang_id": _lang_id_oracle_sql(),
        "q23_doc_fingerprint": f"""
            WITH {_NORM_CTE},
            sfp AS (
                SELECT doc_id, t,
                       MIN(md5(substr(t, CAST(i AS INT), 8))) AS shingle_fp
                FROM norm,
                     UNNEST(range(1, greatest(length(t) - 7, 1) + 1)) AS r(i)
                GROUP BY doc_id, t
            )
            SELECT doc_id, md5(t) AS content_fp, shingle_fp FROM sfp
        """,
        "q26_stream_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q24_ann_cosine_topk": """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (SELECT e AS qe FROM emb WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_dot_product(e, qe)
                         / (sqrt(list_dot_product(e, e))
                            * sqrt(list_dot_product(qe, qe))),
                         6) AS cosine_sim
            FROM emb, q WHERE vec_id <> 0
            ORDER BY cosine_sim DESC, vec_id LIMIT 10
        """,
        "q25_embedding_near_dup": _near_dup_oracle_sql(
            threshold=0.35, num_planes=2, dim=64, seed=42
        ),
        "q27_simhash_hamming_pairs": _simhash_pairs_oracle_sql(
            max_hamming=3, bits=32
        ),
        "q28_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                       THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
                SELECT user_id, ts,
                       SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM sess GROUP BY 1, 2
        """,
        # EWMA fold: DuckDB list_reduce uses the first element as the
        # initial accumulator — exactly ewma_0 = v_0. (1.0 - 0.3) is
        # spelled as the subtraction so both engines run the identical
        # IEEE op sequence.
        "q29_ewma_last": """
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   ROUND(list_reduce(
                       list_transform(list(value ORDER BY ts, value),
                                      x -> CAST(x AS DOUBLE)),
                       (acc, x) -> 0.3::DOUBLE * x
                           + (1.0::DOUBLE - 0.3::DOUBLE) * acc), 6) AS ewma
            FROM events GROUP BY 1
        """,
        "q30_token_stats": """
            SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+'))
                END AS n_ws_tokens,
                -- [^\\w[:space:]]: POSIX space includes 0x0B, so this
                -- is exactly Java's "not word, not whitespace" (a
                -- nested bracket inside a class is NOT a union in RE2)
                len(regexp_extract_all(text, '\\w+|[^\\w[:space:]]'))
                    AS n_bpe_tokens
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
        """,
        "q31_srp_ann_topk": _srp_ann_oracle_sql(
            num_planes=4, dim=64, seed=42, k=10
        ),
        "q32_frame_sample_plan": """
            SELECT CAST(i AS BIGINT) AS media_id, CAST(f AS INT) AS frame_idx
            FROM range(32) t(i),
                 UNNEST(range(0, least(39 + i, 70) + 1, 10)) r(f)
        """,
        "q33_media_features": _media_features_oracle_sql(),
        "q34_get_field_keys": """
            SELECT DISTINCT field_key FROM (
                SELECT 'value' AS field_key FROM events
                UNION ALL
                SELECT 'k' FROM events WHERE event_type <> 'click'
            ) ORDER BY field_key
        """,
        "q35_get_tag_values": """
            SELECT DISTINCT 'user' AS tag_key,
                   CAST(user_id AS VARCHAR) AS tag_value
            FROM events
            ORDER BY tag_key, tag_value
        """,
        # Running EWMA: per-row prefix fold over the ordered series.
        # O(n^2) per key is fine at oracle scale (~67 rows/user).
        "q36_stream_ewma": """
            WITH ev AS (
                SELECT CAST(user_id AS VARCHAR) AS user_id, ts,
                       CAST(value AS DOUBLE) AS value
                FROM events
            ),
            g AS (
                SELECT user_id, list(value ORDER BY ts) AS vs,
                       list(ts ORDER BY ts) AS tss
                FROM ev GROUP BY 1
            ),
            pos AS (
                SELECT user_id, tss[CAST(i AS INT)] AS ts,
                       vs[CAST(i AS INT)] AS value,
                       list_reduce(vs[1:CAST(i AS INT)],
                           (acc, x) -> 0.3::DOUBLE * x
                               + (1.0::DOUBLE - 0.3::DOUBLE) * acc) AS ewma
                FROM g, UNNEST(range(1, len(vs) + 1)) r(i)
            )
            SELECT user_id, ts, value, ROUND(ewma, 6) AS ewma,
                   ROUND(abs(value - ewma), 6) AS dev
            FROM pos
        """,
        # DML replayed as a SELECT: flag-merge on value>100, user tag
        # unset for clicks, rows with value>200 deleted.
        "q37_dml_update_unset_remove": """
            SELECT CAST(event_id AS BIGINT) AS eid,
                   event_type AS measurement,
                   CASE WHEN event_type <> 'click'
                        THEN CAST(user_id AS VARCHAR) END AS user_tag,
                   value,
                   CASE WHEN value > 100
                        THEN CAST(1.0 AS DOUBLE) END AS flag
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10'
              AND ts <  TIMESTAMP '2024-01-12'
              AND NOT value > 200
        """,
        # Insertion order in the q38 store is event_id order by
        # construction (_dml_slice), so first-by-_seq == min event_id.
        "q38_get_contains": """
            SELECT CAST(event_id AS BIGINT) AS eid,
                   event_type AS measurement, value,
                   TRUE AS has_user, FALSE AS has_missing
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10'
              AND ts <  TIMESTAMP '2024-01-12'
              AND value > 100
            ORDER BY event_id LIMIT 1
        """,
        # Every slice row carries both tag keys; the EXISTS makes the
        # oracle vanish with the data instead of asserting constants.
        "q39_get_tag_keys": f"""
            SELECT tag_key
            FROM (VALUES ('eid'), ('user')) t(tag_key)
            WHERE EXISTS (SELECT 1 FROM events WHERE {_DML_WHERE})
            ORDER BY tag_key
        """,
        "q40_get_field_values": f"""
            SELECT ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
            FROM events
            WHERE {_DML_WHERE} AND event_type <> 'click'
        """,
        "q41_get_timestamps": f"""
            SELECT ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx,
                   ts AS time
            FROM events WHERE {_DML_WHERE}
        """,
        "q42_all_len_iter": f"""
            SELECT CAST(event_id AS BIGINT) AS eid,
                   ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1
                       AS idx_all,
                   ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx_iter,
                   ts AS time, event_type AS measurement, value,
                   (SELECT COUNT(*) FROM events WHERE {_DML_WHERE})
                       AS n_total
            FROM events WHERE {_DML_WHERE}
        """,
        "q43_update_all": f"""
            SELECT CAST(event_id AS BIGINT) AS eid, value,
                   CAST(1.0 AS DOUBLE) AS seen
            FROM events WHERE {_DML_WHERE}
        """,
        "q44_remove_all": f"""
            SELECT (SELECT COUNT(*) FROM events WHERE {_DML_WHERE})
                       AS n_before,
                   CAST(0 AS BIGINT) AS n_after
        """,
        "q45_drop_measurement": f"""
            SELECT event_type AS measurement, COUNT(*) AS n,
                   (SELECT COUNT(*) FROM events
                    WHERE {_DML_WHERE} AND event_type = 'click')
                       AS n_dropped
            FROM events
            WHERE {_DML_WHERE} AND event_type <> 'click'
            GROUP BY event_type
        """,
        "q46_insert_point_path": _FIRST_EVENTS_SQL,
        "q47_map_test_predicates": """
            SELECT event_id, ts AS time, event_type AS measurement, value
            FROM events
            WHERE user_id % 7 = 3 AND value > 30.0 AND value < 60.0
        """,
        "q48_search_predicate": """
            SELECT event_id, ts AS time, event_type AS measurement, value
            FROM events
            WHERE regexp_matches(event_type, 'ick|rror')
              AND regexp_matches(CAST(user_id AS VARCHAR), '^4')
        """,
        "q49_measurement_handle": f"""
            SELECT CAST(event_id AS BIGINT) AS eid, value,
                   (SELECT COUNT(*) FROM events
                    WHERE {_DML_WHERE} AND event_type = 'click')
                       AS n_click
            FROM events
            WHERE {_DML_WHERE} AND event_type = 'click' AND value > 150
        """,
        "q50_csv_interop": _FIRST_EVENTS_SQL,
        # Transitive closure of the q18 edge set: recursive CTE reaches
        # the min label along undirected edges — the same fixpoint the
        # HashMin propagation converges to.
        # IVF replay: same codebook (every n//16-th corpus vector by id,
        # capped at 16), same 6dp-rounded cosine argmax assignment with
        # lower-index tie-break, same 4-list probe set, same final
        # ranking as q24.
        "q52_ivf_ann_topk": _IVF_ORACLE_SQL,
        "q59_ivf_indexed_topk": _IVF_ORACLE_SQL,
        "q51_dedup_clusters": f"""
            WITH RECURSIVE {_SHINGLE_CTE},
            e AS (
                SELECT id_a AS src, id_b AS dst FROM jac
                WHERE jaccard >= 0.7
                UNION
                SELECT id_b, id_a FROM jac WHERE jaccard >= 0.7
            ),
            reach(node, lab) AS (
                SELECT src, src FROM e
                UNION
                SELECT e.src, r.lab FROM e JOIN reach r ON e.dst = r.node
            )
            SELECT node, MIN(lab) AS cluster
            FROM reach GROUP BY node ORDER BY node
        """,
        # rate 0.25 -> threshold hex(round(0.25 * 65536)) = '4000';
        # lexicographic compare over fixed-width lowercase hex ==
        # numeric compare, and both engines emit the same md5 hex.
        "q53_hash_sample": """
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            WHERE substr(md5('s53:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '40000000'
        """,
        "q54_repetition_stats": """
            WITH w AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []
                            ELSE str_split_regex(trim(text), '[\\s\\x0B]+')
                       END AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            b AS (
                SELECT doc_id, ws,
                       list_transform(range(1, len(ws)),
                                      i -> ws[i] || ' ' || ws[i+1]) AS bg
                FROM w
            )
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(ws)) AS BIGINT)
                       AS n_distinct_words,
                   CASE WHEN len(ws) > 0 THEN
                       ROUND(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                             / len(ws), 6)
                   ELSE 0.0 END AS dup_word_frac,
                   CAST(len(bg) AS BIGINT) AS n_bigrams,
                   CAST(len(list_distinct(bg)) AS BIGINT)
                       AS n_distinct_bigrams,
                   CASE WHEN len(bg) > 0 THEN
                       ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                             / len(bg), 6)
                   ELSE 0.0 END AS dup_bigram_frac
            FROM b
        """,
        "q55_source_quota": """
            WITH r AS (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('s55:' || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rk
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            )
            SELECT doc_id, source FROM r WHERE rk <= 10
        """,
        "q56_embedding_dup_clusters": f"""
            WITH RECURSIVE pairs AS (
                {_near_dup_oracle_sql(threshold=0.35, num_planes=2,
                                      dim=64, seed=42)}
            ),
            e AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b, id_a FROM pairs
            ),
            reach(node, lab) AS (
                SELECT src, src FROM e
                UNION
                SELECT e.src, r.lab FROM e JOIN reach r ON e.dst = r.node
            )
            SELECT node, MIN(lab) AS cluster
            FROM reach GROUP BY node ORDER BY node
        """,
        "q58_dedup_keep_canonical": f"""
            WITH RECURSIVE {_SHINGLE_CTE},
            e AS (
                SELECT id_a AS src, id_b AS dst FROM jac
                WHERE jaccard >= 0.7
                UNION
                SELECT id_b, id_a FROM jac WHERE jaccard >= 0.7
            ),
            reach(node, lab) AS (
                SELECT src, src FROM e
                UNION
                SELECT e.src, r.lab FROM e JOIN reach r ON e.dst = r.node
            ),
            losers AS (
                SELECT node FROM reach GROUP BY node
                HAVING node <> MIN(lab)
            )
            SELECT doc_id, source FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            WHERE doc_id NOT IN (SELECT node FROM losers)
        """,
        "q57_length_deciles": """
            WITH h AS (
                SELECT n_chars AS v, COUNT(*) AS c
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) GROUP BY 1
            ),
            cum AS (
                SELECT v, c,
                       COALESCE(SUM(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS below,
                       SUM(c) OVER () AS total
                FROM h
            )
            SELECT CAST(LEAST(9, FLOOR(10.0 * below / total)) AS BIGINT)
                       AS bucket,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(MIN(v) AS BIGINT) AS min_chars,
                   CAST(MAX(v) AS BIGINT) AS max_chars
            FROM cum GROUP BY 1 ORDER BY 1
        """,
        "q60_resample_gapfill": """
            WITH r AS (
                SELECT event_type AS key,
                       CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)
                           AS bucket_s,
                       ROUND(AVG(value), 6) AS value,
                       COUNT(*) AS n_obs
                FROM events GROUP BY 1, 2
            ),
            b AS (
                SELECT key, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi
                FROM r GROUP BY 1
            ),
            gall AS (
                SELECT unnest(generate_series(
                    (SELECT MIN(lo) FROM b), (SELECT MAX(hi) FROM b), 300
                )) AS bucket_s
            ),
            grid AS (
                SELECT b.key, g.bucket_s
                FROM b JOIN gall g
                  ON g.bucket_s BETWEEN b.lo AND b.hi
            ),
            d AS (
                SELECT g.key, g.bucket_s, r.value AS obs,
                       COALESCE(r.n_obs, 0) AS n_obs
                FROM grid g LEFT JOIN r
                  ON g.key = r.key AND g.bucket_s = r.bucket_s
            ),
            f AS (
                SELECT key, bucket_s, obs, n_obs,
                    last_value(CASE WHEN obs IS NOT NULL THEN bucket_s END
                               IGNORE NULLS) OVER wp AS pb,
                    last_value(obs IGNORE NULLS) OVER wp AS pv,
                    first_value(CASE WHEN obs IS NOT NULL THEN bucket_s END
                                IGNORE NULLS) OVER wn AS nb,
                    first_value(obs IGNORE NULLS) OVER wn AS nv
                FROM d
                WINDOW wp AS (PARTITION BY key ORDER BY bucket_s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW),
                       wn AS (PARTITION BY key ORDER BY bucket_s
                              ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING)
            )
            SELECT key, bucket_s,
                   CAST(floor((CASE WHEN obs IS NOT NULL THEN obs
                         WHEN pb IS NOT NULL AND nb IS NOT NULL THEN
                             pv + (nv - pv) *
                             (CAST(bucket_s - pb AS DOUBLE)
                              / CAST(nb - pb AS DOUBLE))
                         END) * 1000000 + 0.5) AS BIGINT) AS value_u,
                   CAST(n_obs AS BIGINT) AS n_obs,
                   (n_obs = 0) AS is_gap
            FROM f
        """,
        "q61_rolling_zscore": """
            WITH w AS (
                SELECT event_id, user_id, value,
                       avg(value) OVER win AS m,
                       stddev_samp(value) OVER win AS s,
                       COUNT(value) OVER win AS c
                FROM events
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_id, user_id, value,
                   ROUND((value - m) / s, 6) AS zscore
            FROM w
            WHERE c >= 2 AND s > 0
              AND abs(ROUND((value - m) / s, 6)) > 2.5
        """,
        "q62_top_tokens": """
            WITH t AS (
                SELECT unnest(str_split_regex(trim(text), '[\\s\\x0B]+')) AS token
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) WHERE trim(text) <> ''
            )
            SELECT token, COUNT(*) AS n FROM t GROUP BY 1
            ORDER BY n DESC, token LIMIT 50
        """,
        "q63_scrub_pii": """
            WITH enriched AS (
                SELECT doc_id,
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@mail.example.org via https://ex.org/d/'
                            || CAST(doc_id AS VARCHAR)
                            || ' ref ' || CAST(doc_id + 1000000 AS VARCHAR)
                           AS text
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            s1 AS (
                SELECT doc_id, text,
                    regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t1,
                    len(regexp_extract_all(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                        AS c1
                FROM enriched
            ),
            s2 AS (
                SELECT doc_id, text, c1,
                    regexp_replace(t1, 'https?://[^\\s\\x0B]+', '<URL>', 'g') AS t2,
                    len(regexp_extract_all(t1, 'https?://[^\\s\\x0B]+')) AS c2
                FROM s1
            ),
            s3 AS (
                SELECT doc_id, text, c1, c2,
                    regexp_replace(t2, '\\d{6,}', '<NUM>', 'g') AS t3,
                    len(regexp_extract_all(t2, '\\d{6,}')) AS c3
                FROM s2
            )
            SELECT doc_id, md5(t3) AS scrub_fp,
                   CAST(c1 + c2 + c3 AS BIGINT) AS n_redactions,
                   (t3 <> text) AS was_scrubbed
            FROM s3
        """,
        "q64_chunk_documents": """
            WITH w AS (
                SELECT doc_id,
                       str_split_regex(trim(text), '[\\s\\x0B]+') AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) WHERE trim(text) <> ''
            ),
            s AS (
                SELECT doc_id, ws,
                       unnest(generate_series(1, len(ws), 48)) AS st
                FROM w WHERE len(ws) > 0
            )
            SELECT doc_id,
                   CAST((st - 1) // 48 AS BIGINT) AS chunk_idx,
                   CAST(len(list_slice(ws, st, st + 59)) AS BIGINT)
                       AS n_chunk_words,
                   md5(array_to_string(list_slice(ws, st, st + 59), ' '))
                       AS chunk_fp
            FROM s
        """,
        "q65_derivative": """
            WITH l AS (
                SELECT event_id, user_id, value,
                       epoch(ts) AS t,
                       lag(value) OVER w AS pv,
                       lag(epoch(ts)) OVER w AS pt
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id, user_id,
                   CAST(floor(((value - pv)
                               / CAST(floor(t) - floor(pt) AS DOUBLE)
                               * 1.0) * 1000000 + 0.5) AS BIGINT)
                       AS rate_u
            FROM l
            WHERE pt IS NOT NULL AND floor(t) - floor(pt) > 0
        """,
        "q66_percentiles": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.25), 6) AS p25,
                   ROUND(quantile_cont(value, 0.50), 6) AS p50,
                   ROUND(quantile_cont(value, 0.75), 6) AS p75,
                   ROUND(quantile_cont(value, 0.90), 6) AS p90,
                   COUNT(value) AS n
            FROM events GROUP BY event_type
        """,
        "q67_db_sql": """
            SELECT event_type AS measurement,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 6) AS total_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10'
              AND ts < TIMESTAMP '2024-01-12'
              AND value >= 50
            GROUP BY 1
        """,
        "q68_downsample": """
            WITH slice AS (
                SELECT ts, event_type AS measurement,
                       CAST(user_id AS VARCHAR) AS user, value,
                       CASE WHEN event_type <> 'click'
                            THEN CAST(json_extract_string(props, '$.k')
                                      AS DOUBLE)
                       END AS k
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-10'
                  AND ts < TIMESTAMP '2024-01-12'
            ),
            rolled AS (
                SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                           AS t_s,
                       measurement, user,
                       ROUND(AVG(value), 6) AS value,
                       ROUND(AVG(k), 6) AS k
                FROM slice WHERE ts < TIMESTAMP '2024-01-11'
                GROUP BY 1, 2, 3
            ),
            raw AS (
                SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
                       measurement, user,
                       ROUND(value, 6) AS value, ROUND(k, 6) AS k
                FROM slice WHERE ts >= TIMESTAMP '2024-01-11'
            )
            SELECT * FROM rolled UNION ALL SELECT * FROM raw
        """,
        "q69_from_table": """
            SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
                   event_type AS measurement,
                   CAST(user_id AS VARCHAR) AS user,
                   value,
                   ROUND(value / 2, 6) AS half,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
            FROM events
        """,
        "q70_stream_rollup_store": """
            WITH slice AS (
                SELECT ts, event_type AS measurement,
                       CAST(user_id AS VARCHAR) AS user, value,
                       CASE WHEN event_type <> 'click'
                            THEN CAST(json_extract_string(props, '$.k')
                                      AS DOUBLE)
                       END AS k
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-10'
                  AND ts < TIMESTAMP '2024-01-12'
            ),
            mx AS (
                SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS m
                FROM slice
            ),
            rolled AS (
                SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                           AS t_s,
                       measurement, user,
                       ROUND(AVG(value), 6) AS value,
                       ROUND(AVG(k), 6) AS k
                FROM slice GROUP BY 1, 2, 3
            )
            SELECT r.* FROM rolled r, mx
            WHERE r.t_s + 3600 <= mx.m
        """,
        "q71_time_travel": """
            WITH slice AS (
                SELECT CAST(event_id AS BIGINT) AS eid,
                       event_type AS measurement, value
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-10'
                  AND ts < TIMESTAMP '2024-01-12'
            )
            SELECT 'v0' AS snap, eid, measurement, value,
                   CAST(NULL AS DOUBLE) AS flag
            FROM slice
            UNION ALL
            SELECT 'v1', eid, measurement, value,
                   CASE WHEN value > 100 THEN 1.0 END
            FROM slice
            UNION ALL
            SELECT 'live', eid, measurement, value,
                   CASE WHEN value > 100 THEN 1.0 END
            FROM slice WHERE value <= 200
        """,
        "q72_decontaminate": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '[\\s\\x0B]+', ' ',
                                      'g') AS t
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            words AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM norm
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(
                           w[CAST(i AS INT):CAST(i + 2 AS INT)],
                           ' ') AS shingle
                FROM words,
                     UNNEST(range(1, greatest(len(w) - 2, 1) + 1)) AS r(i)
            ),
            test_g AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 41 = 0
            )
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_hits,
                   MIN(s.shingle) AS sample_shingle
            FROM sh s JOIN test_g USING (shingle)
            WHERE s.doc_id % 41 <> 0
            GROUP BY s.doc_id
        """,
        "q73_shard_assign": """
            SELECT doc_id,
                   CAST(CAST(concat('0x',
                        substr(md5('s73:' || CAST(doc_id AS VARCHAR)),
                               1, 8)) AS BIGINT) % 8 AS BIGINT) AS shard
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
        """,
        "q74_pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x',
                            substr(md5('s74:' ||
                                       CAST(doc_id AS VARCHAR)),
                                   1, 8)) AS BIGINT) % 4 AS BIGINT)
                           AS shard,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text),
                                                        '[\\s\\x0B]+'))
                       END AS BIGINT) AS n_tokens,
                       md5('p74:' || CAST(doc_id AS VARCHAR)) AS ok
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            c AS (
                SELECT doc_id, shard, n_tokens,
                       SUM(n_tokens) OVER (
                           PARTITION BY shard ORDER BY ok, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW
                       ) - n_tokens AS start
                FROM t
            )
            SELECT doc_id, shard, n_tokens,
                   CAST(start // 256 AS BIGINT) AS pack,
                   CAST(start % 256 AS BIGINT) AS pack_offset
            FROM c
        """,
        "q75_ivf_batch_topk": """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (
                SELECT vec_id AS qid, e AS qe FROM emb
                WHERE vec_id % 100 = 0
            ),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM emb
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM emb, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS cidx,
                       c.e AS ce
                FROM emb c JOIN cids ON c.vec_id = cids.cid
            ),
            asg AS (
                SELECT c.vec_id, c.e,
                       (SELECT cidx FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, cidx
                        LIMIT 1) AS lst
                FROM emb c
            ),
            qprobe AS (
                SELECT qid, cidx,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(
                               list_dot_product(qe, ce)
                               / (sqrt(list_dot_product(qe, qe))
                                  * sqrt(list_dot_product(ce, ce))),
                               6) DESC, cidx
                       ) AS pr
                FROM q, cent
            ),
            cand AS (
                SELECT q.qid AS query_id, a.vec_id,
                       ROUND(list_dot_product(a.e, q.qe)
                             / (sqrt(list_dot_product(a.e, a.e))
                                * sqrt(list_dot_product(q.qe, q.qe))),
                             6) AS cosine_sim
                FROM asg a
                JOIN (SELECT qid, cidx FROM qprobe WHERE pr <= 4) p
                  ON a.lst = p.cidx
                JOIN q ON q.qid = p.qid
                WHERE a.vec_id <> q.qid
            )
            SELECT query_id, vec_id, cosine_sim,
                   CAST(rank AS BIGINT) AS rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, vec_id) AS rank
                FROM cand
            )
            WHERE rank <= 5
        """,
        "q76_quality_filter": """
            WITH f AS (
                SELECT doc_id,
                    CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text),
                                                     '[\\s\\x0B]+'))
                    END AS n_tokens,
                    ROUND(len(regexp_extract_all(text, '[.,;:!?]'))
                          / greatest(length(text), 1), 6)
                        AS punct_ratio,
                    ROUND(len(regexp_extract_all(text, '[0-9]'))
                          / greatest(length(text), 1), 6)
                        AS digit_ratio,
                    ROUND((length(text)
                           - len(regexp_extract_all(text, '[\\s\\x0B]')))
                          / greatest(CASE WHEN trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text),
                                                           '[\\s\\x0B]+'))
                            END, 1), 6) AS mean_token_len,
                    CASE WHEN trim(text) = '' THEN []
                         ELSE str_split_regex(trim(text), '[\\s\\x0B]+')
                    END AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            r AS (
                SELECT *,
                    CASE WHEN len(ws) > 0 THEN
                        ROUND(1.0 - CAST(len(list_distinct(ws))
                                         AS DOUBLE) / len(ws), 6)
                    ELSE 0.0 END AS dup_word_frac,
                    list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1]) AS bg
                FROM f
            ),
            r2 AS (
                SELECT *,
                    CASE WHEN len(bg) > 0 THEN
                        ROUND(1.0 - CAST(len(list_distinct(bg))
                                         AS DOUBLE) / len(bg), 6)
                    ELSE 0.0 END AS dup_bigram_frac
                FROM r
            ),
            verdict AS (
                SELECT doc_id,
                    list_sort(list_filter([
                        CASE WHEN n_tokens < 20
                             THEN 'too_few_tokens' END,
                        CASE WHEN n_tokens > 90
                             THEN 'too_many_tokens' END,
                        CASE WHEN punct_ratio > 0.10
                             THEN 'punct_ratio' END,
                        CASE WHEN digit_ratio > 0.20
                             THEN 'digit_ratio' END,
                        CASE WHEN dup_word_frac > 0.65
                             THEN 'dup_words' END,
                        CASE WHEN dup_bigram_frac > 0.50
                             THEN 'dup_bigrams' END,
                        CASE WHEN mean_token_len < 2.0
                               OR mean_token_len > 12.0
                             THEN 'token_len' END
                    ], x -> x IS NOT NULL)) AS reasons
                FROM r2
            )
            SELECT doc_id, len(reasons) = 0 AS keep,
                   COALESCE(array_to_string(reasons, '|'), '') AS reasons
            FROM verdict
        """,
        # BM25 with +1-smoothed idf; arithmetic written in the exact
        # association order the Spark expression evaluates so the
        # float results match bit-for-bit before the 6dp round.
        "q77_bm25_scores": """
            WITH base AS (
                SELECT doc_id,
                       len(string_split_regex(lower(trim(text)), '[\\s\\x0B]+'))
                           AS dl,
                       string_split_regex(lower(trim(text)), '[\\s\\x0B]+')
                           AS toks
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            stats AS (
                SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base
            ),
            tf AS (
                SELECT doc_id, dl, term, COUNT(*) AS tf
                FROM (SELECT doc_id, dl, UNNEST(toks) AS term FROM base)
                WHERE term IN ('hash', 'join', 'vector')
                GROUP BY 1, 2, 3
            ),
            dfreq AS (
                SELECT term, COUNT(DISTINCT doc_id) AS term_df
                FROM tf GROUP BY 1
            )
            SELECT doc_id, COUNT(*) AS n_matched_terms,
                   ROUND(SUM(
                       ln(1.0 + (n_docs - term_df + 0.5) / (term_df + 0.5))
                       * ((tf * (1.2 + 1))
                          / (tf + 1.2 * ((1 - 0.75)
                                         + (0.75 * dl) / avgdl)))
                   ), 6) AS score
            FROM tf JOIN dfreq USING (term), stats
            GROUP BY doc_id
        """,
        "q78_quantize_embeddings": """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            s AS (
                SELECT vec_id, e,
                       list_max(list_transform(e, x -> abs(x))) AS scale
                FROM emb
            ),
            qq AS (
                SELECT vec_id, scale,
                       list_transform(e, x ->
                           CASE WHEN scale = 0 THEN 0
                                ELSE CAST(ROUND(x / scale * 127, 0) AS INT)
                           END) AS q
                FROM s
            )
            SELECT vec_id, ROUND(scale, 6) AS scale,
                   q[1] AS q0, q[2] AS q1, q[len(q)] AS q_last,
                   CAST(len(list_filter(q, v -> abs(v) = 127))
                        AS BIGINT) AS n_clipped,
                   CAST(list_sum(list_transform(q, v -> abs(v)))
                        AS BIGINT) AS sum_abs_q
            FROM qq
        """,
        # 64-bit SimHash in BIGINT-safe halves (bit 63 would overflow a
        # signed shift-sum): lo32 holds token-hash bits 0..31 (md5 hex
        # chars 9-16), hi32 bits 32..63 (chars 1-8) — mirroring the
        # Spark hi<<32|lo assembly. Bands of 16 bits; hamming is the
        # popcount sum over both halves.
        "q79_edit_distance_pairs": f"""
            WITH {_NORM_CTE},
            toks AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id,
                           UNNEST(string_split_regex(trim(t), '[\\s\\x0B]+'))
                               AS tok
                    FROM norm
                ) WHERE tok <> ''
            ),
            hashed AS (
                SELECT doc_id,
                       {_hex_to_int_sql("substr(md5(tok), 1, 8)", 8)}
                           AS hhi,
                       {_hex_to_int_sql("substr(md5(tok), 9, 8)", 8)}
                           AS hlo
                FROM toks
            ),
            votes AS (
                SELECT doc_id, CAST(bit AS INT) AS bit,
                       SUM((((CASE WHEN bit < 32 THEN hlo ELSE hhi END)
                             >> (CAST(bit AS INT) % 32)) & 1) * 2 - 1)
                           AS s
                FROM hashed, UNNEST(range(0, 64)) AS t(bit)
                GROUP BY 1, 2
            ),
            sigs AS (
                -- LEFT JOIN from norm: token-less documents (empty /
                -- all-whitespace / null text) keep signature 0, like
                -- the engine's explode_outer (the q20 rule) — so
                -- empty docs can pair as the exact duplicates they are
                SELECT n.doc_id,
                       CAST(COALESCE(v.lo32, 0) AS BIGINT) AS lo32,
                       CAST(COALESCE(v.hi32, 0) AS BIGINT) AS hi32
                FROM norm n LEFT JOIN (
                    SELECT doc_id,
                           SUM(CASE WHEN s > 0 AND bit < 32
                               THEN (CAST(1 AS BIGINT) << bit)
                               ELSE 0 END) AS lo32,
                           SUM(CASE WHEN s > 0 AND bit >= 32
                               THEN (CAST(1 AS BIGINT) << (bit - 32))
                               ELSE 0 END) AS hi32
                    FROM votes GROUP BY doc_id
                ) v USING (doc_id)
            ),
            banded AS (
                SELECT doc_id, lo32, hi32, CAST(band AS INT) AS band,
                       CASE WHEN band < 2
                            THEN (lo32 >> (CAST(band AS INT) * 16))
                                 & 65535
                            ELSE (hi32 >> ((CAST(band AS INT) - 2) * 16))
                                 & 65535
                       END AS bval
                FROM sigs, UNNEST(range(0, 4)) AS t(band)
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.lo32 AS lo_a, a.hi32 AS hi_a,
                       b.lo32 AS lo_b, b.hi32 AS hi_b
                FROM banded a
                JOIN banded b ON a.band = b.band AND a.bval = b.bval
                WHERE a.doc_id < b.doc_id
            ),
            ham AS (
                SELECT id_a, id_b FROM cand
                WHERE bit_count(xor(lo_a, lo_b))
                      + bit_count(xor(hi_a, hi_b)) <= 3
            )
            SELECT id_a, id_b,
                   CAST(levenshtein(na.t, nb.t) AS INT) AS edit_distance
            FROM ham
            JOIN norm na ON na.doc_id = id_a
            JOIN norm nb ON nb.doc_id = id_b
            WHERE abs(length(na.t) - length(nb.t)) <= 100
              AND levenshtein(na.t, nb.t) <= 100
        """,
        # Same signature family as q19 (shared CTE); candidates are the
        # left×right band collisions, jaccard comes from the exact
        # all-pairs CTE keyed by (min, max).
        "q80_incremental_dedup_join": _INCR_DEDUP_ORACLE,
        # q93: the streaming twin of q80 — same oracle by design
        # (stream/batch unification is the thing being verified).
        "q93_stream_near_dup": _INCR_DEDUP_ORACLE,
        # Trigram Stupid Backoff replay — q91's structure one order up.
        # alpha^2 appears as the single Python-computed literal
        # 0.16000000000000003 so both engines share one IEEE product.
        # DuckDB lists are 1-indexed; range(1, len-1) enumerates
        # exactly the len-2 trigram positions.
        "q94_trigram_logprob": """
            WITH tw AS (
                SELECT doc_id, lang,
                       list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[\\s\\x0B]+'),
                           t -> length(t) >= 1) AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            rt AS (SELECT ws FROM tw WHERE lang = 'en'),
            uni AS (
                SELECT tok AS w1, COUNT(*) AS c1
                FROM (SELECT unnest(ws) AS tok FROM rt)
                GROUP BY 1
            ),
            tot AS (SELECT SUM(c1) AS total FROM uni),
            big AS (
                SELECT w1, w2, COUNT(*) AS c2
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2
                    FROM rt, UNNEST(range(1, len(ws))) AS r(i)
                )
                GROUP BY 1, 2
            ),
            tri AS (
                SELECT w1, w2, w3, COUNT(*) AS c3
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2,
                           ws[CAST(i + 2 AS INT)] AS w3
                    FROM rt, UNNEST(range(1, len(ws) - 1)) AS r(i)
                )
                GROUP BY 1, 2, 3
            ),
            tric AS (
                SELECT t.w1, t.w2, t.w3,
                       CAST(ln(CAST(c3 AS DOUBLE) / c2)
                            AS DECIMAL(20,12)) AS lp3
                FROM tri t JOIN big b ON b.w1 = t.w1 AND b.w2 = t.w2
            ),
            bib AS (
                SELECT b.w1 AS w2, b.w2 AS w3,
                       CAST(ln(0.4 * (CAST(c2 AS DOUBLE) / u.c1))
                            AS DECIMAL(20,12)) AS lp2
                FROM big b JOIN uni u ON u.w1 = b.w1
            ),
            unib AS (
                SELECT w1 AS w3,
                       CAST(ln(0.16000000000000003 * (CAST(c1 AS DOUBLE)
                                      / (SELECT total FROM tot)))
                            AS DECIMAL(20,12)) AS lp1
                FROM uni
            ),
            db AS (
                SELECT doc_id, ws[CAST(i AS INT)] AS w1,
                       ws[CAST(i + 1 AS INT)] AS w2,
                       ws[CAST(i + 2 AS INT)] AS w3
                FROM tw, UNNEST(range(1, len(ws) - 1)) AS r(i)
            ),
            sc AS (
                SELECT doc_id,
                       COALESCE(tric.lp3, bib.lp2, unib.lp1,
                                CAST(ln(0.16000000000000003
                                        / (SELECT total FROM tot))
                                     AS DECIMAL(20,12))) AS lp,
                       CASE WHEN tric.lp3 IS NULL THEN 1 ELSE 0
                       END AS miss3,
                       CASE WHEN tric.lp3 IS NULL AND bib.lp2 IS NULL
                            THEN 1 ELSE 0 END AS oov
                FROM db
                LEFT JOIN tric USING (w1, w2, w3)
                LEFT JOIN bib USING (w2, w3)
                LEFT JOIN unib USING (w3)
            )
            SELECT doc_id, COUNT(*) AS n_trigrams,
                   ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                       AS avg_logp,
                   ROUND(CAST(SUM(miss3) AS DOUBLE) / COUNT(*), 6)
                       AS backoff_frac,
                   ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6)
                       AS oov_frac
            FROM sc GROUP BY 1
        """,
        # q103: the q94 replay extended to order 5 with count pruning
        # (HAVING >= 2 on every table of order >= 2 — numerators can
        # never orphan their contexts under one shared threshold).
        # Alpha powers are the SAME Python repeated-multiplication
        # chain the operator builds (0.4, 0.4^2, 0.4^3, 0.4^4), pasted
        # as literals so both engines share one IEEE product.
        "q103_fivegram_logprob": """
            WITH tw AS (
                SELECT doc_id, lang,
                       list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[\\s\\x0B]+'),
                           t -> length(t) >= 1) AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            rt AS (SELECT ws FROM tw WHERE lang = 'en'),
            uni AS (
                SELECT tok AS w1, COUNT(*) AS c1
                FROM (SELECT unnest(ws) AS tok FROM rt)
                GROUP BY 1
            ),
            tot AS (SELECT SUM(c1) AS total FROM uni),
            g2 AS (
                SELECT w1, w2, COUNT(*) AS c2
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2
                    FROM rt, UNNEST(range(1, len(ws))) AS r(i)
                )
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            g3 AS (
                SELECT w1, w2, w3, COUNT(*) AS c3
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2,
                           ws[CAST(i + 2 AS INT)] AS w3
                    FROM rt, UNNEST(range(1, len(ws) - 1)) AS r(i)
                )
                GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
            ),
            g4 AS (
                SELECT w1, w2, w3, w4, COUNT(*) AS c4
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2,
                           ws[CAST(i + 2 AS INT)] AS w3,
                           ws[CAST(i + 3 AS INT)] AS w4
                    FROM rt, UNNEST(range(1, len(ws) - 2)) AS r(i)
                )
                GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2
            ),
            g5 AS (
                SELECT w1, w2, w3, w4, w5, COUNT(*) AS c5
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2,
                           ws[CAST(i + 2 AS INT)] AS w3,
                           ws[CAST(i + 3 AS INT)] AS w4,
                           ws[CAST(i + 4 AS INT)] AS w5
                    FROM rt, UNNEST(range(1, len(ws) - 3)) AS r(i)
                )
                GROUP BY 1, 2, 3, 4, 5 HAVING COUNT(*) >= 2
            ),
            l5 AS (
                SELECT g.w1, g.w2, g.w3, g.w4, g.w5,
                       CAST(ln(CAST(c5 AS DOUBLE) / x.c4)
                            AS DECIMAL(20,12)) AS lp5
                FROM g5 g JOIN g4 x ON x.w1 = g.w1 AND x.w2 = g.w2
                                   AND x.w3 = g.w3 AND x.w4 = g.w4
            ),
            l4 AS (
                SELECT g.w1 AS w2, g.w2 AS w3, g.w3 AS w4, g.w4 AS w5,
                       CAST(ln(0.4 * (CAST(c4 AS DOUBLE) / x.c3))
                            AS DECIMAL(20,12)) AS lp4
                FROM g4 g JOIN g3 x ON x.w1 = g.w1 AND x.w2 = g.w2
                                   AND x.w3 = g.w3
            ),
            l3 AS (
                SELECT g.w1 AS w3, g.w2 AS w4, g.w3 AS w5,
                       CAST(ln(0.16000000000000003
                               * (CAST(c3 AS DOUBLE) / x.c2))
                            AS DECIMAL(20,12)) AS lp3
                FROM g3 g JOIN g2 x ON x.w1 = g.w1 AND x.w2 = g.w2
            ),
            l2 AS (
                SELECT g.w1 AS w4, g.w2 AS w5,
                       CAST(ln(0.06400000000000002
                               * (CAST(c2 AS DOUBLE) / u.c1))
                            AS DECIMAL(20,12)) AS lp2
                FROM g2 g JOIN uni u ON u.w1 = g.w1
            ),
            l1 AS (
                SELECT w1 AS w5,
                       CAST(ln(0.025600000000000008
                               * (CAST(c1 AS DOUBLE)
                                  / (SELECT total FROM tot)))
                            AS DECIMAL(20,12)) AS lp1
                FROM uni
            ),
            db AS (
                SELECT doc_id, ws[CAST(i AS INT)] AS w1,
                       ws[CAST(i + 1 AS INT)] AS w2,
                       ws[CAST(i + 2 AS INT)] AS w3,
                       ws[CAST(i + 3 AS INT)] AS w4,
                       ws[CAST(i + 4 AS INT)] AS w5
                FROM tw, UNNEST(range(1, len(ws) - 3)) AS r(i)
            ),
            sc AS (
                SELECT doc_id,
                       COALESCE(l5.lp5, l4.lp4, l3.lp3, l2.lp2, l1.lp1,
                                CAST(ln(0.025600000000000008
                                        / (SELECT total FROM tot))
                                     AS DECIMAL(20,12))) AS lp,
                       CASE WHEN l5.lp5 IS NULL THEN 1 ELSE 0
                       END AS missn,
                       CASE WHEN l5.lp5 IS NULL AND l4.lp4 IS NULL
                                 AND l3.lp3 IS NULL AND l2.lp2 IS NULL
                            THEN 1 ELSE 0 END AS oov
                FROM db
                LEFT JOIN l5 USING (w1, w2, w3, w4, w5)
                LEFT JOIN l4 USING (w2, w3, w4, w5)
                LEFT JOIN l3 USING (w3, w4, w5)
                LEFT JOIN l2 USING (w4, w5)
                LEFT JOIN l1 USING (w5)
            )
            SELECT doc_id, COUNT(*) AS n_ngrams,
                   ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                       AS avg_logp,
                   ROUND(CAST(SUM(missn) AS DOUBLE) / COUNT(*), 6)
                       AS backoff_frac,
                   ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6)
                       AS oov_frac
            FROM sc GROUP BY 1
        """,
        # SemDedup replay: q52's codebook/assignment CTEs (stride
        # codebook, argmax with 6dp rounding + lowest-index ties,
        # -2.0 zero-norm sentinel via coalesce over DuckDB's
        # float-div-by-zero NULL), then the within-cluster dominance
        # rule verbatim: dup iff a >=tau neighbor is more canonical
        # (lower centroid cosine, tie -> lower id).
        "q95_semantic_dedup": """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM emb
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM emb, bounds
                GROUP BY ((vec_id - lo) * 32) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS cidx,
                       c.e AS ce
                FROM emb c JOIN cids ON c.vec_id = cids.cid
            ),
            scored AS (
                SELECT c.vec_id, c.e, cent.cidx,
                       coalesce(ROUND(list_dot_product(c.e, ce)
                           / nullif(sqrt(list_dot_product(c.e, c.e))
                                    * sqrt(list_dot_product(ce, ce)),
                                    0), 6), -2.0) AS csim,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY coalesce(
                               ROUND(list_dot_product(c.e, ce)
                               / nullif(
                                   sqrt(list_dot_product(c.e, c.e))
                                   * sqrt(list_dot_product(ce, ce)),
                                   0), 6), -2.0) DESC, cent.cidx
                       ) AS rn
                FROM emb c CROSS JOIN cent
            ),
            asg AS (
                SELECT vec_id, CAST(cidx AS INT) AS cluster, csim,
                       CASE WHEN sqrt(list_dot_product(e, e)) > 0
                            THEN list_transform(e, x ->
                                x / sqrt(list_dot_product(e, e)))
                       END AS u
                FROM scored WHERE rn = 1
            ),
            dup AS (
                SELECT DISTINCT
                       CASE WHEN b.csim < a.csim
                              OR (b.csim = a.csim
                                  AND b.vec_id < a.vec_id)
                            THEN a.vec_id ELSE b.vec_id
                       END AS vec_id
                FROM asg a JOIN asg b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE ROUND(list_dot_product(a.u, b.u), 6) >= 0.3
            )
            SELECT asg.vec_id AS id, cluster, csim AS centroid_sim,
                   (dup.vec_id IS NOT NULL) AS is_dup
            FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id
        """,
        # q85's scorer CTEs, then the histogram bucketing: quantize
        # with FLOOR(avg*1000) (no rounding-mode ambiguity), cumulate
        # counts over the quantized-score histogram DESC (head =
        # best LM fit = bucket 0), bucket = least(2, floor(3*below/
        # total)) — all-integer except one shared double division.
        "q96_ppl_buckets": """
            WITH t AS (
                SELECT doc_id,
                       unnest(string_split_regex(
                           lower(trim(text)), '[\\s\\x0B]+')) AS tok
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            tt AS (SELECT doc_id, tok FROM t WHERE length(tok) >= 1),
            v AS (SELECT tok, COUNT(*) AS cnt FROM tt GROUP BY 1),
            n AS (SELECT SUM(cnt) AS total FROM v),
            vq AS (
                SELECT tok,
                       CAST(ln(CAST(cnt AS DOUBLE)
                               / (SELECT total FROM n))
                            AS DECIMAL(20,12)) AS lp
                FROM v
            ),
            scored AS (
                SELECT tt.doc_id AS doc_id, COUNT(*) AS n_tokens,
                       CAST(SUM(vq.lp) AS DOUBLE) / COUNT(*)
                           AS raw_logp
                FROM tt JOIN vq USING (tok)
                GROUP BY 1
            ),
            s AS (
                SELECT doc_id, n_tokens, raw_logp,
                       CAST(FLOOR(raw_logp * 1000) AS BIGINT) AS q
                FROM scored
            ),
            hist AS (SELECT q, COUNT(*) AS c FROM s GROUP BY 1),
            b AS (
                SELECT q,
                       CAST(LEAST(2, FLOOR(3 * coalesce(
                           SUM(c) OVER (
                               ORDER BY q DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0)
                           / (SELECT SUM(c) FROM hist))) AS INT)
                           AS ppl_bucket
                FROM hist
            )
            SELECT s.doc_id, s.n_tokens,
                   ROUND(s.raw_logp, 6) AS avg_logp, b.ppl_bucket
            FROM s JOIN b USING (q)
        """,
        # DSIR replay: identical md5 bucket ints (('0x'||hex8)::BIGINT
        # == Spark's conv(hex8,16,10) — both unsigned < 2^32), add-1
        # smoothing over 1024 buckets, DECIMAL(20,12) log-ratio so the
        # per-doc sum is order-independent in both engines.
        "q97_importance_weights": """
            WITH dd AS (
                SELECT * REPLACE (coalesce(text, '') AS text)
                FROM documents
            ),
            st AS (
                SELECT doc_id,
                       (('0x' || substr(md5('dsir:' || tok), 1, 8))
                            ::BIGINT % 1024) AS b
                FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(trim(text)),
                                  '[\\s\\x0B]+')) AS tok
                    FROM dd
                ) WHERE length(tok) >= 1
            ),
            tt AS (
                SELECT (('0x' || substr(md5('dsir:' || tok), 1, 8))
                            ::BIGINT % 1024) AS b
                FROM (
                    SELECT unnest(string_split_regex(lower(trim(text)),
                                  '[\\s\\x0B]+')) AS tok
                    FROM dd WHERE lang = 'en'
                ) WHERE length(tok) >= 1
            ),
            sh AS (SELECT b, COUNT(*) AS sc FROM st GROUP BY 1),
            th AS (SELECT b, COUNT(*) AS tc FROM tt GROUP BY 1),
            stot AS (SELECT SUM(sc) AS s FROM sh),
            ttot AS (SELECT coalesce(SUM(tc), 0) AS t FROM th),
            ratio AS (
                SELECT sh.b,
                       CAST(
                           ln((coalesce(th.tc, 0) + 1.0)
                              / ((SELECT t FROM ttot) + 1024.0))
                           - ln((sh.sc + 1.0)
                                / ((SELECT s FROM stot) + 1024.0))
                           AS DECIMAL(20,12)) AS lr
                FROM sh LEFT JOIN th USING (b)
            )
            SELECT st.doc_id, COUNT(*) AS n_tokens,
                   ROUND(CAST(SUM(ratio.lr) AS DOUBLE), 6)
                       AS log_weight
            FROM st JOIN ratio USING (b)
            GROUP BY 1
        """,
        # q99: the q95 clustering/dominance replay, but the embedding
        # itself is ALSO replayed — md5 feature-hash buckets, md5
        # signs, dense re-assembly via an (doc x dim) grid left-join —
        # so text -> vector -> semantic dedup is hash-checked
        # end-to-end. All-integer until the final cast, so the
        # vectors are exact in both engines.
        "q99_text_semantic_dedup": """
            WITH dd AS (
                SELECT * REPLACE (coalesce(text, '') AS text)
                FROM documents
            ),
            tk AS (
                SELECT doc_id,
                       (('0x' || substr(md5('bow:' || tok), 1, 8))
                            ::BIGINT % 64) AS j,
                       CASE WHEN substr(md5('sgn:bow:' || tok), 1, 1)
                                 < '8'
                            THEN 1 ELSE -1 END AS s
                FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(trim(text)),
                                  '[\\s\\x0B]+')) AS tok
                    FROM dd
                ) WHERE length(tok) >= 1
            ),
            sums AS (
                SELECT doc_id, j, SUM(s) AS v FROM tk GROUP BY 1, 2
            ),
            grid AS (
                SELECT doc_id, j
                FROM (SELECT doc_id FROM dd), UNNEST(range(0, 64)) AS r(j)
            ),
            emb AS (
                SELECT g.doc_id AS vec_id,
                       list(CAST(coalesce(sums.v, 0) AS DOUBLE)
                            ORDER BY g.j) AS e
                FROM grid g LEFT JOIN sums
                  ON g.doc_id = sums.doc_id AND g.j = sums.j
                GROUP BY 1
            ),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM emb
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM emb, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS cidx,
                       c.e AS ce
                FROM emb c JOIN cids ON c.vec_id = cids.cid
            ),
            scored AS (
                SELECT c.vec_id, c.e, cent.cidx,
                       coalesce(ROUND(list_dot_product(c.e, ce)
                           / nullif(sqrt(list_dot_product(c.e, c.e))
                                    * sqrt(list_dot_product(ce, ce)),
                                    0), 6), -2.0) AS csim,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY coalesce(
                               ROUND(list_dot_product(c.e, ce)
                               / nullif(
                                   sqrt(list_dot_product(c.e, c.e))
                                   * sqrt(list_dot_product(ce, ce)),
                                   0), 6), -2.0) DESC, cent.cidx
                       ) AS rn
                FROM emb c CROSS JOIN cent
            ),
            asg AS (
                SELECT vec_id, CAST(cidx AS INT) AS cluster, csim,
                       CASE WHEN sqrt(list_dot_product(e, e)) > 0
                            THEN list_transform(e, x ->
                                x / sqrt(list_dot_product(e, e)))
                       END AS u
                FROM scored WHERE rn = 1
            ),
            dup AS (
                SELECT DISTINCT
                       CASE WHEN b.csim < a.csim
                              OR (b.csim = a.csim
                                  AND b.vec_id < a.vec_id)
                            THEN a.vec_id ELSE b.vec_id
                       END AS vec_id
                FROM asg a JOIN asg b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE ROUND(list_dot_product(a.u, b.u), 6) >= 0.9
            )
            SELECT asg.vec_id AS id, cluster, csim AS centroid_sim,
                   (dup.vec_id IS NOT NULL) AS is_dup
            FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id
        """,
        # q102: q99's embedding + codebook CTEs with the codebook
        # trained on the CORPUS slice only; both sides assigned
        # against it; stream x corpus same-cluster pairs above the
        # rounded unit-dot threshold. One oracle = the batch
        # equivalent of the streaming run (stream/batch unification).
        "q102_stream_semantic_dedup": """
            WITH dd AS (
                SELECT * REPLACE (coalesce(text, '') AS text)
                FROM documents
            ),
            tk AS (
                SELECT doc_id,
                       (('0x' || substr(md5('bow:' || tok), 1, 8))
                            ::BIGINT % 64) AS j,
                       CASE WHEN substr(md5('sgn:bow:' || tok), 1, 1)
                                 < '8'
                            THEN 1 ELSE -1 END AS s
                FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(trim(text)),
                                  '[\\s\\x0B]+')) AS tok
                    FROM dd
                ) WHERE length(tok) >= 1
            ),
            sums AS (
                SELECT doc_id, j, SUM(s) AS v FROM tk GROUP BY 1, 2
            ),
            grid AS (
                SELECT doc_id, j
                FROM (SELECT doc_id FROM dd), UNNEST(range(0, 64)) AS r(j)
            ),
            emb AS (
                SELECT g.doc_id AS vec_id,
                       list(CAST(coalesce(sums.v, 0) AS DOUBLE)
                            ORDER BY g.j) AS e
                FROM grid g LEFT JOIN sums
                  ON g.doc_id = sums.doc_id AND g.j = sums.j
                GROUP BY 1
            ),
            corpus AS (SELECT * FROM emb WHERE vec_id % 5 <> 0),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM corpus
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM corpus, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS cidx,
                       c.e AS ce
                FROM corpus c JOIN cids ON c.vec_id = cids.cid
            ),
            scored AS (
                SELECT c.vec_id, c.e, cent.cidx,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY coalesce(
                               ROUND(list_dot_product(c.e, ce)
                               / nullif(
                                   sqrt(list_dot_product(c.e, c.e))
                                   * sqrt(list_dot_product(ce, ce)),
                                   0), 6), -2.0) DESC, cent.cidx
                       ) AS rn
                FROM emb c CROSS JOIN cent
            ),
            asg AS (
                SELECT vec_id, CAST(cidx AS INT) AS cluster,
                       CASE WHEN sqrt(list_dot_product(e, e)) > 0
                            THEN list_transform(e, x ->
                                x / sqrt(list_dot_product(e, e)))
                       END AS u
                FROM scored WHERE rn = 1
            )
            SELECT s.vec_id AS id_left, c.vec_id AS id_right,
                   ROUND(list_dot_product(s.u, c.u), 6) AS cosine
            FROM asg s JOIN asg c ON s.cluster = c.cluster
            WHERE s.vec_id % 5 = 0 AND c.vec_id % 5 <> 0
              AND ROUND(list_dot_product(s.u, c.u), 6) >= 0.9
        """,
        # KMV set-overlap replay: same 48-bit hashes per side,
        # bottom-k of the deduplicated union, membership semi-checks
        # via IN, and the engine's exact float op order — jaccard =
        # nb/n (unrounded) times the CASE'd union estimate.
        "q101_kmv_set_overlap": """
            WITH ha AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('kmv:'
                            || CAST(user_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h
                FROM events
                WHERE event_type = 'click' AND user_id IS NOT NULL
            ),
            hb AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('kmv:'
                            || CAST(user_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h
                FROM events
                WHERE event_type = 'purchase' AND value > 150
                  AND user_id IS NOT NULL
            ),
            u AS (
                SELECT h
                FROM (SELECT h FROM ha UNION SELECT h FROM hb)
                ORDER BY h LIMIT 64
            ),
            nb AS (
                SELECT COUNT(*) AS nb FROM u
                WHERE h IN (SELECT h FROM ha)
                  AND h IN (SELECT h FROM hb)
            ),
            a AS (
                SELECT COUNT(*) AS n_union_seen, MAX(h) AS kth_hash
                FROM u
            )
            SELECT n_union_seen, kth_hash,
                   ROUND(CASE WHEN n_union_seen < 64
                         THEN CAST(n_union_seen AS DOUBLE)
                         ELSE 63.0 / (CAST(kth_hash AS DOUBLE)
                                      / 281474976710656.0)
                         END, 4) AS est_union,
                   ROUND(CAST(nb AS DOUBLE) / n_union_seen, 6)
                       AS est_jaccard,
                   ROUND((CAST(nb AS DOUBLE) / n_union_seen)
                         * CASE WHEN n_union_seen < 64
                           THEN CAST(n_union_seen AS DOUBLE)
                           ELSE 63.0 / (CAST(kth_hash AS DOUBLE)
                                        / 281474976710656.0)
                           END, 4) AS est_intersection,
                   (n_union_seen < 64) AS exact
            FROM a, nb
        """,
        # KMV sketch replay: identical md5 48-bit hash ints, the same
        # distinct -> bottom-k -> (k-1)/(h_k / 2^48) estimator; 2^48
        # keeps the hash exactly representable in a double so the
        # division is bit-identical in both engines.
        "q100_kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('kmv:'
                            || CAST(event_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h
                FROM events WHERE event_id IS NOT NULL
            ),
            b AS (SELECT h FROM h ORDER BY h LIMIT 256),
            a AS (
                SELECT COUNT(*) AS n_seen, MAX(h) AS kth_hash FROM b
            )
            SELECT n_seen, kth_hash,
                   ROUND(CASE WHEN n_seen < 256
                         THEN CAST(n_seen AS DOUBLE)
                         ELSE 255.0 / (CAST(kth_hash AS DOUBLE)
                                       / 281474976710656.0)
                         END, 4) AS estimate,
                   (n_seen < 256) AS exact
            FROM a
        """,
        # q108: A-ES replay — u = (h+1)/2^48 from the shared 48-bit
        # md5 projection, key = ln(u)/w cast to DECIMAL(38,12) (the
        # LM family's cross-engine 1e-12 grid, 26 integer digits so
        # tiny weights can't overflow), top-50 by key desc with
        # id ties; es_key cast back to double in the output.
        "q108_weighted_sample": """
            WITH s AS (
                SELECT doc_id AS id,
                       CAST(n_chars AS DOUBLE) AS weight,
                       CAST(ln((('0x' || substr(md5('wsample:'
                                || CAST(doc_id AS VARCHAR)), 1, 12))
                                ::BIGINT + 1)
                               / 281474976710656.0)
                            / CAST(n_chars AS DOUBLE)
                            AS DECIMAL(38,12)) AS k
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                      AND CAST(n_chars AS DOUBLE) > 0
            )
            SELECT id, weight, CAST(k AS DOUBLE) AS es_key
            FROM s
            ORDER BY k DESC, id
            LIMIT 50
        """,
        # q107: q52's IVF probe CTEs + the shared PQ CTEs over the
        # probed candidates only — one shared stride init serves both
        # halves (full vectors for IVF cosine, slices for the PQ
        # sub-codebooks); the PQ half gets the same TWO Lloyd rounds
        # as q105 (trained on the FULL corpus, exactly as ivf_pq_topk
        # composes pq_train before the probe filter).
        "q107_ivf_pq_topk": f"""
            WITH {_PQ_BASE_CTES},
            ivfasg AS (
                SELECT c.vec_id, c.e,
                       (SELECT code FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, code
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT code FROM cent, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, code
                LIMIT 4
            ),
            cand AS (
                SELECT vec_id, e FROM ivfasg
                WHERE lst IN (SELECT code FROM probes)
            ){_pq_refine_ctes(2)}{_pq_enc_adc_sql("book2", "cand")}
        """,
        # q109: the persisted IVF-PQ layout is semantically identical
        # to the inline composition with unrefined (stride) codebooks
        # — IVF probe CTEs + the shared encode/ADC tail over book0.
        # q134: q109's replay over a query SET — per-query probes
        # (rank over cent partitioned by qid), ONE corpus encode
        # (query-independent), per-query decimal ADC tables, and a
        # per-query rank window. Self is excluded (the batch read's
        # exclude_self contract).
        "q134_ivf_pq_batch_indexed": f"""
            WITH {_PQ_BASE_CTES},
            qs AS (
                SELECT vec_id AS qid, e AS qe2 FROM emb
                WHERE vec_id % 100 = 0 AND vec_id <> 0
            ),
            ivfasg AS (
                SELECT c.vec_id, c.e,
                       (SELECT code FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, code
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            qprob AS (
                SELECT qid, code FROM (
                    SELECT qs.qid, cent.code,
                           ROW_NUMBER() OVER (
                               PARTITION BY qs.qid
                               ORDER BY ROUND(
                                   list_dot_product(qe2, ce)
                                   / (sqrt(list_dot_product(qe2, qe2))
                                      * sqrt(list_dot_product(ce, ce))),
                                   6) DESC, cent.code) AS r
                    FROM qs, cent
                ) WHERE r <= 4
            ),
            enc AS (
                SELECT c.vec_id, sp.s,
                       {_pq_argmin_subq("book0", "c.e[sp.s*8+1 : sp.s*8+8]")} AS code
                FROM corpus c, sp
            ),
            qtbl AS (
                SELECT qs.qid, b.s, b.code,
                       CAST(list_dot_product(
                           list_transform(
                               list_zip(qe2[b.s*8+1 : b.s*8+8], b.bsub),
                               p -> p[1] - p[2]),
                           list_transform(
                               list_zip(qe2[b.s*8+1 : b.s*8+8], b.bsub),
                               p -> p[1] - p[2]))
                           AS DECIMAL(20,12)) AS d
                FROM book0 b, qs
            ),
            cand AS (
                SELECT p.qid, a.vec_id
                FROM ivfasg a JOIN qprob p ON a.lst = p.code
                WHERE a.vec_id <> p.qid
            ),
            adc AS (
                SELECT c.qid, c.vec_id,
                       CAST(SUM(t.d) AS DOUBLE) AS adc_dist
                FROM cand c
                JOIN enc e ON e.vec_id = c.vec_id
                JOIN qtbl t ON t.qid = c.qid AND t.s = e.s
                           AND t.code = e.code
                GROUP BY c.qid, c.vec_id
            )
            SELECT qid AS query_id, vec_id, adc_dist,
                   CAST(rank AS BIGINT) AS rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY qid ORDER BY adc_dist, vec_id) AS rank
                FROM adc
            ) WHERE rank <= 10
        """,
        "q109_ivf_pq_indexed_topk": f"""
            WITH {_PQ_BASE_CTES},
            ivfasg AS (
                SELECT c.vec_id, c.e,
                       (SELECT code FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, code
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT code FROM cent, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, code
                LIMIT 4
            ),
            cand AS (
                SELECT vec_id, e FROM ivfasg
                WHERE lst IN (SELECT code FROM probes)
            ){_pq_enc_adc_sql("book0", "cand")}
        """,
        # q111: the rerank chain — refined books (q105's rounds),
        # encode, decimal-ADC top-100 as a CTE, then q24's exact
        # rounded-cosine ranking over just those 100 candidates.
        "q111_pq_rerank_topk": f"""
            WITH {_PQ_BASE_CTES}{_pq_refine_ctes(2)}{_pq_enc_tbl_ctes("book2", "corpus")},
            adc AS (
                {_PQ_ADC_BODY}
                LIMIT 100
            )
            SELECT c.vec_id,
                   ROUND(list_dot_product(c.e, qe)
                         / (sqrt(list_dot_product(c.e, c.e))
                            * sqrt(list_dot_product(qe, qe))),
                         6) AS cosine_sim
            FROM adc a, corpus c, q
            WHERE c.vec_id = a.vec_id
            ORDER BY cosine_sim DESC, c.vec_id
            LIMIT 10
        """,
        # q112: q52's replay with ONE cosine-Lloyd round between the
        # stride init and the probe — re-assignment over cent, per-
        # cluster integer-grid means over all 64 dims (empty clusters
        # keep their stride centroid), then assignment/probe/top-10
        # against the refined cent1.
        "q112_ivf_refined_topk": f"""
            WITH {_IVF_COARSE_CTES}{_ivf_refine_ctes(1)},
            asg AS (
                SELECT c.vec_id, c.e,
                       (SELECT cidx FROM cent1
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, cidx
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT cidx FROM cent1, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, cidx
                LIMIT 4
            )
            SELECT vec_id,
                   ROUND(list_dot_product(e, qe)
                         / (sqrt(list_dot_product(e, e))
                            * sqrt(list_dot_product(qe, qe))),
                         6) AS cosine_sim
            FROM asg, q
            WHERE lst IN (SELECT cidx FROM probes)
            ORDER BY cosine_sim DESC, vec_id LIMIT 10
        """,
        # q113: FULL FAISS IVFPQ replay, training included — the
        # coarse codebook gets TWO cosine-Lloyd rounds (cent2, the
        # configuration where residuals measurably beat raw PQ), then
        # assignment + probes against cent2, exact elementwise
        # residuals r = e - ce, the residual-stride sub-codebooks
        # (rbook0), encode argmin over probed candidates, ONE decimal
        # ADC table per probed list from that list's query residual,
        # keyed join on (lst, s, code).
        "q113_ivf_pq_residual_topk": f"""
            WITH {_IVF_COARSE_CTES}{_ivf_refine_ctes(2)},
            ivfasg AS (
                SELECT c.vec_id, c.e,
                       (SELECT cidx FROM cent2
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, cidx
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT cidx FROM cent2, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, cidx
                LIMIT 4
            ),
            res AS (
                SELECT a.vec_id,
                       list_transform(list_zip(a.e, c.ce),
                                      p -> p[1] - p[2]) AS e,
                       a.lst
                FROM ivfasg a JOIN cent2 c ON c.cidx = a.lst
            ),
            rbounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM res
            ),
            rcids AS (
                SELECT MIN(vec_id) AS cid
                FROM res, rbounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            sp AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
            rcent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY r.vec_id) - 1
                           AS code,
                       r.e AS ce
                FROM res r JOIN rcids ON r.vec_id = rcids.cid
            ),
            rbook0 AS (
                SELECT sp.s, rcent.code,
                       ce[sp.s * 8 + 1 : sp.s * 8 + 8] AS bsub
                FROM rcent, sp
            ),
            cres AS (
                SELECT vec_id, e, lst FROM res
                WHERE lst IN (SELECT cidx FROM probes)
            ),
            enc AS (
                SELECT c.vec_id, c.lst, sp.s,
                       {_pq_argmin_subq("rbook0", "c.e[sp.s*8+1 : sp.s*8+8]")} AS code
                FROM cres c, sp
            ),
            qres AS (
                SELECT c.cidx AS lst,
                       list_transform(list_zip(qe, c.ce),
                                      p -> p[1] - p[2]) AS qr
                FROM cent2 c, q
                WHERE c.cidx IN (SELECT cidx FROM probes)
            ),
            tbl AS (
                SELECT qr.lst, b.s, b.code,
                       CAST(list_dot_product(
                           list_transform(
                               list_zip(qr.qr[b.s*8+1 : b.s*8+8],
                                        b.bsub),
                               p -> p[1] - p[2]),
                           list_transform(
                               list_zip(qr.qr[b.s*8+1 : b.s*8+8],
                                        b.bsub),
                               p -> p[1] - p[2]))
                           AS DECIMAL(20,12)) AS d
                FROM rbook0 b, qres qr
            )
            SELECT e.vec_id, CAST(SUM(t.d) AS DOUBLE) AS adc_dist
            FROM enc e
            JOIN tbl t ON t.lst = e.lst AND t.s = e.s
                      AND t.code = e.code
            GROUP BY e.vec_id
            ORDER BY adc_dist, e.vec_id
            LIMIT 10
        """,
        # q106: stream == batch for the sketch family — bottom-k merge
        # is associative, so the streamed sketch's standing estimate
        # is exactly the one-shot q100 SQL over the shard slice.
        "q106_stream_kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('kmv:'
                            || CAST(user_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h
                FROM events
                WHERE user_id IS NOT NULL AND event_id % 5 = 0
            ),
            b AS (SELECT h FROM h ORDER BY h LIMIT 64),
            a AS (
                SELECT COUNT(*) AS n_seen, MAX(h) AS kth_hash FROM b
            )
            SELECT n_seen, kth_hash,
                   ROUND(CASE WHEN n_seen < 64
                         THEN CAST(n_seen AS DOUBLE)
                         ELSE 63.0 / (CAST(kth_hash AS DOUBLE)
                                      / 281474976710656.0)
                         END, 4) AS estimate,
                   (n_seen < 64) AS exact
            FROM a
        """,
        # q105: full PQ replay — the q52 stride init sliced into 8
        # sub-codebooks (_PQ_BASE_CTES), TWO unrolled Lloyd rounds
        # (_pq_refine_ctes: shared argmin + integer-grid means), then
        # the shared encode/ADC tail against the refined book2.
        "q105_pq_adc_topk": f"""
            WITH {_PQ_BASE_CTES}{_pq_refine_ctes(2)}{_pq_enc_adc_sql("book2", "corpus")}
        """,
        # q110: q104's replay partitioned by source — per-group
        # bottom-128 by md5(doc_id), per-group ROW_NUMBER order
        # statistics, rank = greatest(1, ceil(p * n_g)).
        "q110_kmv_quantiles_by_key": _kmv_byk_oracle(
            128, "[0.25, 0.5, 0.75, 0.9]"
        ),
        # q114: the SAME one-shot SQL over the whole table IS the
        # oracle for the engine's two-day sketch → merge → estimate
        # path — equality is exactly the KMV merge theorem (per-group
        # bottom-k of a union == bottom-k of the union of per-slice
        # bottom-ks, for any total order on the hashes).
        "q114_kmv_sketch_merge": _kmv_byk_oracle(96, "[0.5, 0.9]"),
        # q115: stream == batch for the quantile-sketch family — the
        # streamed per-group sketch's standing estimate over the
        # shard equals the one-shot SQL on the shard slice.
        "q115_stream_kmv_quantiles": _kmv_byk_oracle(
            64, "[0.5, 0.9]", "AND doc_id % 5 = 0"
        ),
        # q116: per-group KMV distinct replay — per-group bottom-64
        # of distinct md5(user_id) hashes, Beyer estimator per group,
        # exact below k.
        "q116_kmv_distinct_by_key": """
            WITH h AS (
                SELECT DISTINCT event_type AS grp,
                       ('0x' || substr(md5('kmv:'
                            || CAST(user_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h
                FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL
            ),
            b AS (
                SELECT grp, h FROM h
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY grp ORDER BY h) <= 64
            ),
            a AS (
                SELECT grp, COUNT(*) AS n_seen, MAX(h) AS kth_hash
                FROM b GROUP BY grp
            )
            SELECT grp AS "group", n_seen, kth_hash,
                   ROUND(CASE WHEN n_seen < 64
                         THEN CAST(n_seen AS DOUBLE)
                         ELSE 63.0 / (CAST(kth_hash AS DOUBLE)
                                      / 281474976710656.0)
                         END, 4) AS estimate,
                   (n_seen < 64) AS exact
            FROM a
            ORDER BY 1
        """,
        # q104: the bottom-256 rows by md5(event_id) are the uniform
        # sample; ROW_NUMBER over (value, hash) gives the order
        # statistics; rank = greatest(1, ceil(p * n)). Raw parquet
        # doubles flow through untouched, so estimates match exactly.
        "q104_kmv_quantiles": """
            WITH s AS (
                SELECT ('0x' || substr(md5('kmvq:'
                            || CAST(event_id AS VARCHAR)), 1, 12))
                           ::BIGINT AS h,
                       CAST(value AS DOUBLE) AS v
                FROM events
                WHERE event_id IS NOT NULL AND value IS NOT NULL
                ORDER BY h LIMIT 256
            ),
            r AS (
                SELECT v, ROW_NUMBER() OVER (ORDER BY v, h) AS rk
                FROM s
            ),
            n AS (SELECT COUNT(*) AS n_sample FROM s),
            t AS (
                SELECT COUNT(*) AS n_total FROM events
                WHERE event_id IS NOT NULL AND value IS NOT NULL
            ),
            p AS (
                -- CAST: a bare DuckDB list literal is DECIMAL-typed;
                -- prob must be the same IEEE double Spark carries
                SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
                            AS DOUBLE) AS prob
            ),
            g AS (
                SELECT prob, n_sample, n_total,
                       GREATEST(1, CAST(CEIL(prob * n_sample) AS INT))
                           AS rank
                FROM p, n, t
            )
            SELECT prob, rank, n_sample, v AS estimate,
                   (n_sample >= n_total) AS exact
            FROM g JOIN r ON r.rk = g.rank
            ORDER BY prob
        """,
        # Interpolated Kneser-Ney replay: bigram counts feed the
        # context stats (c1 = w1's context count, n1f = distinct
        # successors), the continuation counts (n1p = distinct
        # predecessors) and the 1-row (B, V) totals; the discount
        # arithmetic is spelled in the engine's exact IEEE op order —
        # greatest(coalesce(c2,0) - d, 0)/c1 + ((d*n1f)/c1) * pc with
        # pc = (coalesce(n1p,0)+1)/(B+V) — and each bigram's ln is
        # DECIMAL(20,12)-quantized before the per-doc sum.
        "q98_kneser_ney": """
            WITH tw AS (
                SELECT doc_id, lang,
                       list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[\\s\\x0B]+'),
                           t -> length(t) >= 1) AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            rt AS (SELECT ws FROM tw WHERE lang = 'en'),
            big AS (
                SELECT w1, w2, COUNT(*) AS c2
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2
                    FROM rt, UNNEST(range(1, len(ws))) AS r(i)
                )
                GROUP BY 1, 2
            ),
            ctx AS (
                SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1f
                FROM big GROUP BY 1
            ),
            contw AS (
                SELECT w2, COUNT(*) AS n1p FROM big GROUP BY 1
            ),
            tot AS (
                SELECT (SELECT COUNT(*) FROM big) AS b,
                       (SELECT COUNT(DISTINCT tok)
                        FROM (SELECT unnest(ws) AS tok FROM rt)) AS v
            ),
            db AS (
                SELECT doc_id, ws[CAST(i AS INT)] AS w1,
                       ws[CAST(i + 1 AS INT)] AS w2
                FROM tw, UNNEST(range(1, len(ws))) AS r(i)
            ),
            sc AS (
                SELECT doc_id,
                       CAST(ln(
                           CASE WHEN ctx.c1 IS NOT NULL THEN
                               GREATEST(COALESCE(big.c2, 0) - 0.75,
                                        0.0) / ctx.c1
                               + ((0.75 * ctx.n1f) / ctx.c1)
                                 * (CASE WHEN (tot.b + tot.v) > 0
                                    THEN (COALESCE(contw.n1p, 0) + 1)
                                         / (tot.b + tot.v) END)
                           ELSE
                               CASE WHEN (tot.b + tot.v) > 0
                               THEN (COALESCE(contw.n1p, 0) + 1)
                                    / (tot.b + tot.v) END
                           END) AS DECIMAL(20,12)) AS lp,
                       CASE WHEN ctx.c1 IS NULL THEN 1 ELSE 0
                       END AS noctx
                FROM db
                LEFT JOIN big USING (w1, w2)
                LEFT JOIN ctx USING (w1)
                LEFT JOIN contw USING (w2)
                CROSS JOIN tot
            )
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                       AS avg_logp,
                   ROUND(CAST(SUM(noctx) AS DOUBLE) / COUNT(*), 6)
                       AS unseen_ctx_frac
            FROM sc GROUP BY 1
        """,

        # quantile_cont == Spark's exact interpolated percentile; at
        # p=0.5 over ints the interpolation is a representable .5
        # midpoint, so the compare is bit-exact.
        "q81_corpus_profile": """
            WITH base AS (
                SELECT lang, source,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(
                                lower(trim(text)), '[\\s\\x0B]+')) END AS n_tokens,
                       length(text) AS n_chars,
                       md5(regexp_replace(lower(trim(text)), '[\\s\\x0B]+', ' ',
                                          'g')) AS fp
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            )
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                   ROUND(AVG(n_tokens), 6) AS mean_tokens,
                   quantile_cont(n_tokens, 0.5) AS median_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   COUNT(DISTINCT fp) AS distinct_docs,
                   ROUND(1 - COUNT(DISTINCT fp) / COUNT(*), 6)
                       AS exact_dup_rate
            FROM base GROUP BY 1, 2
        """,
        # Parallel unnests zip in DuckDB, so (span, pos) mirrors
        # Spark's posexplode; string_agg(ORDER BY pos) restores span
        # order and skips the CASE's NULLs exactly as concat_ws skips
        # collect_list's.
        "q82_remove_boilerplate": """
            WITH s AS (
                SELECT doc_id,
                       string_split_regex(text, '[\\s\\x0B]+') AS arr
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            l AS (
                SELECT doc_id, unnest(arr) AS span,
                       unnest(range(1, len(arr) + 1)) AS pos
                FROM s
            ),
            n AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM l),
            hot AS (
                SELECT md5(span) AS fp
                FROM l WHERE length(trim(span)) >= 1
                GROUP BY 1
                HAVING COUNT(DISTINCT doc_id)
                       >= (SELECT n_total FROM n) * 0.5
            )
            SELECT doc_id,
                   COALESCE(string_agg(
                       CASE WHEN md5(span) NOT IN (SELECT fp FROM hot)
                            THEN span END, ' ' ORDER BY pos), '')
                       AS clean_text,
                   COUNT(*) FILTER (
                       WHERE md5(span) IN (SELECT fp FROM hot))
                       AS n_removed,
                   COUNT(*) FILTER (
                       WHERE md5(span) NOT IN (SELECT fp FROM hot))
                       AS n_kept
            FROM l GROUP BY doc_id
        """,
        # sqrt of an exact integer ratio is IEEE-correctly-rounded in
        # both engines, so keep_rate and its 2^32 threshold are
        # bit-identical; rate-1 groups short-circuit past the
        # (lpad-truncated) threshold exactly as the Spark filter does.
        "q83_temperature_sample": """
            WITH c AS (
                SELECT lang, COUNT(*) AS group_rows
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) GROUP BY 1
            ),
            m AS (SELECT MIN(group_rows) AS n_min FROM c),
            r AS (
                SELECT lang, group_rows,
                       sqrt(CAST((SELECT n_min FROM m) AS DOUBLE)
                            / CAST(group_rows AS DOUBLE)) AS keep_rate
                FROM c
            ),
            r2 AS (
                -- least(..., 2^32-1) mirrors the engine's clamp: a
                -- near-1 rate in a >2^32-row group must not round to
                -- the 9-hex-char 2^32 and get lpad-truncated.
                SELECT lang, group_rows, keep_rate,
                       lpad(lower(to_hex(least(CAST(round(
                           keep_rate * 4294967296.0) AS BIGINT),
                           4294967295))), 8, '0') AS th
                FROM r
            )
            SELECT d.doc_id, d.lang, d.source,
                   CAST(r2.group_rows AS BIGINT) AS group_rows,
                   ROUND(r2.keep_rate, 6) AS keep_rate
            FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents) d JOIN r2 USING (lang)
            WHERE r2.keep_rate >= 1.0
               OR substr(md5('t83:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  < r2.th
        """,
        # The naive BETWEEN join the bucketed range join must equal.
        "q84_interval_join": """
            WITH p AS (
                SELECT DISTINCT date_diff('day', TIMESTAMP '1992-01-01',
                                          o_orderdate) AS order_day
                FROM orders
            ),
            i AS (
                SELECT l_suppkey AS supp,
                       date_diff('day', TIMESTAMP '1992-01-01',
                                 l_shipdate) AS start_day,
                       date_diff('day', TIMESTAMP '1992-01-01',
                                 l_shipdate)
                       + CAST(l_quantity AS INT) % 28 + 3 AS end_day
                FROM lineitem
            )
            SELECT p.order_day, COUNT(*) AS n_in_transit,
                   MIN(i.supp) AS min_supp, MAX(i.supp) AS max_supp
            FROM p JOIN i
              ON p.order_day BETWEEN i.start_day AND i.end_day
            GROUP BY 1
        """,
        # ln() is bit-identical across both engines' libms on these
        # count ratios (verified corpus-wide); quantizing each token's
        # logp to DECIMAL(20,12) before the per-doc sum makes the
        # average order-independent, so the compare is exact.
        "q85_unigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       unnest(string_split_regex(
                           lower(trim(text)), '[\\s\\x0B]+')) AS tok
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            tt AS (SELECT doc_id, tok FROM t WHERE length(tok) >= 1),
            v AS (SELECT tok, COUNT(*) AS cnt FROM tt GROUP BY 1),
            n AS (SELECT SUM(cnt) AS total FROM v),
            vq AS (
                SELECT tok,
                       CAST(ln(CAST(cnt AS DOUBLE)
                               / (SELECT total FROM n))
                            AS DECIMAL(20,12)) AS lp
                FROM v
            )
            SELECT tt.doc_id, COUNT(*) AS n_tokens,
                   ROUND(CAST(SUM(vq.lp) AS DOUBLE) / COUNT(*), 6)
                       AS avg_logp
            FROM tt JOIN vq USING (tok)
            GROUP BY 1
        """,
        # The plain unsalted join: the salting rewrite must be
        # invisible in the result.
        "q86_salted_join": """
            SELECT o.o_orderpriority,
                   COUNT(*) AS n_items,
                   COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2))
                           - CAST(l.l_discount AS DECIMAL(3,2))))
                        AS DOUBLE) AS revenue
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        # The two delta classes replayed as SELECTs: updated-and-kept
        # rows surface as 'changed' with the NEW payload; rows the
        # remove dropped surface as 'removed' with the OLD payload
        # (flag never materialized for them in v0). Unchanged rows
        # (value <= 100) must be absent.
        "q87_version_diff": """
            WITH slice AS (
                SELECT CAST(event_id AS BIGINT) AS eid,
                       event_type AS measurement, value
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-10'
                  AND ts < TIMESTAMP '2024-01-12'
            )
            SELECT 'changed' AS op, eid, measurement, value,
                   1.0 AS flag
            FROM slice WHERE value > 100 AND value <= 200
            UNION ALL
            SELECT 'removed', eid, measurement, value,
                   CAST(NULL AS DOUBLE)
            FROM slice WHERE value > 200
        """,
        # Identical running-max / running-sum period construction in
        # SQL window functions; all-integer arithmetic, so exact.
        "q88_merge_intervals": """
            WITH i AS (
                SELECT l_suppkey AS supp,
                       date_diff('day', TIMESTAMP '1992-01-01',
                                 l_shipdate) AS s,
                       date_diff('day', TIMESTAMP '1992-01-01',
                                 l_shipdate)
                       + CAST(l_quantity AS INT) % 28 + 3 AS e
                FROM lineitem
            ),
            o AS (
                SELECT supp, s, e,
                       MAX(e) OVER (PARTITION BY supp ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pme
                FROM i WHERE e >= s
            ),
            g AS (
                SELECT supp, s, e,
                       SUM(CASE WHEN pme IS NULL OR s > pme
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY supp ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
                FROM o
            ),
            m AS (
                SELECT supp, grp, MIN(s) AS ms, MAX(e) AS me,
                       COUNT(*) AS n_merged
                FROM g GROUP BY 1, 2
            )
            SELECT supp, COUNT(*) AS n_periods,
                   CAST(SUM(me - ms + 1) AS BIGINT) AS covered_days,
                   MAX(me - ms + 1) AS longest_days,
                   CAST(SUM(n_merged) AS BIGINT) AS n_shipments
            FROM m GROUP BY 1
        """,
        # Same pipeline in SQL: 13-gram fingerprints (1-based list
        # slicing == Spark's slice(arr, i+1, 13)), global first
        # occurrence by (doc, pos), q88-style running-window range
        # merge, and a NOT EXISTS range cut over tokens.
        "q89_excise_duplicate_spans": """
            WITH base AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)),
                                          '[\\s\\x0B]+') AS arr
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            gram AS (
                SELECT doc_id, CAST(i AS INT) AS pos,
                       md5(array_to_string(
                           arr[CAST(i AS INT):CAST(i + 12 AS INT)],
                           ' ')) AS fp
                FROM base,
                     UNNEST(range(1, len(arr) - 13 + 2)) AS r(i)
                WHERE len(arr) >= 13
            ),
            marked AS (
                SELECT doc_id, pos,
                       ROW_NUMBER() OVER (PARTITION BY fp
                                          ORDER BY doc_id, pos) AS rn,
                       COUNT(DISTINCT doc_id) OVER (PARTITION BY fp)
                           AS ndocs
                FROM gram
            ),
            cuts AS (
                SELECT doc_id, pos AS s, pos + 12 AS e
                FROM marked WHERE ndocs >= 2 AND rn > 1
            ),
            o AS (
                SELECT doc_id, s, e,
                       MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pme
                FROM cuts
            ),
            gg AS (
                SELECT doc_id, s, e,
                       SUM(CASE WHEN pme IS NULL OR s > pme
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
                FROM o
            ),
            m AS (
                SELECT doc_id, grp, MIN(s) AS ms, MAX(e) AS me
                FROM gg GROUP BY 1, 2
            ),
            tok AS (
                SELECT doc_id, unnest(arr) AS tk,
                       unnest(range(1, len(arr) + 1)) AS pos
                FROM base
            ),
            kept AS (
                SELECT t.doc_id, t.tk, t.pos
                FROM tok t
                WHERE NOT EXISTS (
                    SELECT 1 FROM m
                    WHERE m.doc_id = t.doc_id
                      AND t.pos BETWEEN m.ms AND m.me)
            ),
            reb AS (
                SELECT doc_id,
                       string_agg(tk, ' ' ORDER BY pos) AS clean_text,
                       COUNT(*) AS n_kept
                FROM kept GROUP BY 1
            ),
            sp AS (SELECT doc_id, COUNT(*) AS n_spans FROM m GROUP BY 1)
            SELECT b.doc_id,
                   COALESCE(r.clean_text, '') AS clean_text,
                   CAST(len(b.arr) - COALESCE(r.n_kept, 0) AS BIGINT)
                       AS n_removed,
                   CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans
            FROM base b
            LEFT JOIN reb r USING (doc_id)
            LEFT JOIN sp USING (doc_id)
        """,
        # GROUPING(lang, source) == Spark's grouping_id() bit layout
        # (lang is the high bit in both engines' declared order).
        "q90_rollup_card": """
            WITH base AS (
                SELECT lang, source,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(
                                lower(trim(text)), '[\\s\\x0B]+')) END
                           AS n_tokens
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            )
            SELECT CAST(GROUPING(lang, source) AS BIGINT) AS level,
                   lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
            FROM base GROUP BY ROLLUP(lang, source)
        """,
        # Stupid Backoff replay: each branch's logp is quantized to
        # DECIMAL(20,12) exactly as the engine does (ln over IEEE-exact
        # ratios is bit-identical; the decimal sum is order-free).
        # DuckDB lists are 1-indexed and range(1, n) is [1, n), so
        # (ws[i], ws[i+1]) enumerates exactly the len-1 bigrams.
        "q91_bigram_logprob": """
            WITH tw AS (
                SELECT doc_id, lang,
                       list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[\\s\\x0B]+'),
                           t -> length(t) >= 1) AS ws
                FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)
            ),
            rt AS (SELECT ws FROM tw WHERE lang = 'en'),
            uni AS (
                SELECT tok, COUNT(*) AS c1
                FROM (SELECT unnest(ws) AS tok FROM rt)
                GROUP BY 1
            ),
            tot AS (SELECT SUM(c1) AS total FROM uni),
            big AS (
                SELECT w1, w2, COUNT(*) AS c2
                FROM (
                    SELECT ws[CAST(i AS INT)] AS w1,
                           ws[CAST(i + 1 AS INT)] AS w2
                    FROM rt, UNNEST(range(1, len(ws))) AS r(i)
                )
                GROUP BY 1, 2
            ),
            cond AS (
                SELECT w1, w2,
                       CAST(ln(CAST(c2 AS DOUBLE) / c1)
                            AS DECIMAL(20,12)) AS lp2
                FROM big JOIN uni ON uni.tok = big.w1
            ),
            back AS (
                SELECT tok AS w2,
                       CAST(ln(0.4 * (CAST(c1 AS DOUBLE)
                                      / (SELECT total FROM tot)))
                            AS DECIMAL(20,12)) AS lpb
                FROM uni
            ),
            db AS (
                SELECT doc_id, ws[CAST(i AS INT)] AS w1,
                       ws[CAST(i + 1 AS INT)] AS w2
                FROM tw, UNNEST(range(1, len(ws))) AS r(i)
            ),
            sc AS (
                SELECT doc_id,
                       COALESCE(cond.lp2, back.lpb,
                                CAST(ln(0.4 / (SELECT total FROM tot))
                                     AS DECIMAL(20,12))) AS lp,
                       CASE WHEN cond.lp2 IS NULL THEN 1 ELSE 0
                       END AS miss
                FROM db
                LEFT JOIN cond USING (w1, w2)
                LEFT JOIN back USING (w2)
            ),
            -- degenerate contract rows (doc_id < 20 slice):
            -- empty_vocab = empty reference corpus -> no distribution,
            -- avg_logp NULL, every bigram a miss; all_oov = synthetic
            -- 3-token text whose tokens are absent from the small
            -- (doc_id < 50) English ref slice -> both bigrams land
            -- exactly on the quantized alpha/total OOV floor.
            rt2 AS (
                SELECT ws FROM tw WHERE lang = 'en' AND doc_id < 50
            ),
            tot2 AS (
                SELECT COUNT(*) AS total
                FROM (SELECT unnest(ws) AS tok FROM rt2)
            ),
            floorq AS (
                SELECT CAST(ln(0.4 / total) AS DECIMAL(20,12)) AS lpq
                FROM tot2
            ),
            esc AS (
                SELECT doc_id, 'empty_vocab' AS scenario,
                       COUNT(*) AS n_bigrams,
                       CAST(NULL AS DOUBLE) AS avg_logp,
                       CAST(1.0 AS DOUBLE) AS backoff_frac
                FROM db WHERE doc_id < 20 GROUP BY 1
            ),
            oovsc AS (
                SELECT doc_id, 'all_oov' AS scenario,
                       CAST(2 AS BIGINT) AS n_bigrams,
                       ROUND(CAST(2 * lpq AS DOUBLE) / 2, 6)
                           AS avg_logp,
                       CAST(1.0 AS DOUBLE) AS backoff_frac
                FROM documents, floorq WHERE doc_id < 20
            )
            SELECT doc_id, 'corpus' AS scenario, COUNT(*) AS n_bigrams,
                   ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                       AS avg_logp,
                   ROUND(CAST(SUM(miss) AS DOUBLE) / COUNT(*), 6)
                       AS backoff_frac
            FROM sc GROUP BY 1
            UNION ALL SELECT * FROM esc
            UNION ALL SELECT * FROM oovsc
        """,
        # NFC + lower replayed with DuckDB's nfc_normalize (same
        # UAX #15 as Python's unicodedata). chr(769)=U+0301 combining
        # acute, chr(8491)=U+212B angstrom sign (NFC -> U+00C5),
        # chr(776)=U+0308 combining diaeresis — the same decoration
        # the Spark side appends. length() counts codepoints in both
        # engines; md5 hashes the UTF-8 bytes in both.
        "q92_normalize_text": """
            WITH dec AS (
                SELECT doc_id,
                       coalesce(text, '') || ' cafe' || chr(769) || ' '
                       || chr(8491) || 'ngstro' || chr(776) || 'm'
                           AS text
                FROM documents
            ),
            nrm AS (
                SELECT doc_id, text,
                       lower(nfc_normalize(text)) AS tn
                FROM dec
            )
            SELECT doc_id,
                   CAST(length(tn) AS INT) AS norm_len,
                   CAST(length(text) - length(tn) AS INT) AS delta,
                   substring(md5(tn), 1, 16) AS fp16
            FROM nrm
        """,
    }
    # q118 is q113's exact replay: persisted (residual codes at rest,
    # params.json-routed serving) vs inline is a storage difference,
    # not a math difference - pytest asserts the engine-side equality.
    d["q118_ivf_pq_residual_indexed"] = d["q113_ivf_pq_residual_topk"]
    # q117: the append lifecycle's asymmetry - codebooks (coarse cent
    # + PQ book0) trained on the BASE two-thirds only (ivf_write_index
    # before the append), assignment + encode + ADC over the FULL
    # corpus (the appended rows are folded at the frozen artifacts).
    d["q117_ivf_append_serve"] = f"""
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ),
            q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
            corpus AS (SELECT * FROM emb WHERE vec_id <> 0),
            train AS (SELECT * FROM corpus WHERE vec_id % 3 <> 0),
            bounds AS (
                SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM train
            ),
            cids AS (
                SELECT MIN(vec_id) AS cid
                FROM train, bounds
                GROUP BY ((vec_id - lo) * 16) // (hi - lo + 1)
            ),
            cent AS (
                SELECT ROW_NUMBER() OVER (ORDER BY c.vec_id) - 1
                           AS code,
                       c.e AS ce
                FROM train c JOIN cids ON c.vec_id = cids.cid
            ),
            sp AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
            book0 AS (
                SELECT sp.s, cent.code,
                       ce[sp.s * 8 + 1 : sp.s * 8 + 8] AS bsub
                FROM cent, sp
            ),
            ivfasg AS (
                SELECT c.vec_id, c.e,
                       (SELECT code FROM cent
                        ORDER BY ROUND(
                            list_dot_product(c.e, ce)
                            / (sqrt(list_dot_product(c.e, c.e))
                               * sqrt(list_dot_product(ce, ce))), 6
                        ) DESC, code
                        LIMIT 1) AS lst
                FROM corpus c
            ),
            probes AS (
                SELECT code FROM cent, q
                ORDER BY ROUND(
                    list_dot_product(qe, ce)
                    / (sqrt(list_dot_product(qe, qe))
                       * sqrt(list_dot_product(ce, ce))), 6
                ) DESC, code
                LIMIT 4
            ),
            cand AS (
                SELECT vec_id, e FROM ivfasg
                WHERE lst IN (SELECT code FROM probes)
            ){_pq_enc_adc_sql("book0", "cand")}
        """
    # q120: the streaming append protocol must change NOTHING vs the
    # batch append - the oracle is q117's replay verbatim (stream ==
    # batch == frozen-codebook encode of the full corpus).
    d["q120_stream_ivf_append"] = d["q117_ivf_append_serve"]
    # q119: the one-pass data card is EXACT (histogram quantiles,
    # true distinct counts), so the oracle is the straightforward
    # per-group SQL - no sketch replay needed.
    d["q119_data_card"] = """
            WITH kept AS (
                SELECT source AS grp, CAST(n_chars AS DOUBLE) AS v, lang
                FROM documents WHERE source IS NOT NULL
            ),
            g AS (
                SELECT grp, COUNT(*) AS n_rows, COUNT(v) AS n_vals,
                       SUM(v) AS total_value,
                       COUNT(DISTINCT lang) AS n_distinct
                FROM kept GROUP BY grp
            ),
            hist AS (
                SELECT grp, v, COUNT(*) AS n FROM kept
                WHERE v IS NOT NULL GROUP BY 1, 2
            ),
            cum AS (
                SELECT grp, v,
                       SUM(n) OVER (PARTITION BY grp ORDER BY v) AS c,
                       SUM(n) OVER (PARTITION BY grp ORDER BY v) - n
                           AS pc
                FROM hist
            ),
            picked AS (
                SELECT cum.grp, p.p, cum.v
                FROM cum
                JOIN g ON g.grp = cum.grp,
                UNNEST([0.25, 0.5, 0.75, 0.9]) AS p(p)
                WHERE pc < GREATEST(1, CEIL(p.p * n_vals))
                  AND GREATEST(1, CEIL(p.p * n_vals)) <= c
            ),
            q AS (
                SELECT grp,
                       MAX(CASE WHEN p = 0.25 THEN v END) AS p25,
                       MAX(CASE WHEN p = 0.5 THEN v END) AS p50,
                       MAX(CASE WHEN p = 0.75 THEN v END) AS p75,
                       MAX(CASE WHEN p = 0.9 THEN v END) AS p90
                FROM picked GROUP BY grp
            )
            SELECT g.grp AS "group", n_rows, n_vals, total_value,
                   n_distinct, p25, p50, p75, p90
            FROM g LEFT JOIN q ON q.grp = g.grp
            ORDER BY g.grp
        """
    # q121: q108's ES replay with a per-group rank instead of the
    # global LIMIT — the sampled SET per group is the bit-stability
    # claim being gated.
    d["q121_weighted_sample_by_key"] = """
            WITH s AS (
                SELECT source, doc_id AS id,
                       CAST(n_chars AS DOUBLE) AS weight,
                       CAST(ln((('0x' || substr(md5('wsample:'
                                || CAST(doc_id AS VARCHAR)), 1, 12))
                                ::BIGINT + 1)
                               / 281474976710656.0)
                            / CAST(n_chars AS DOUBLE)
                            AS DECIMAL(38,12)) AS k
                FROM documents
                WHERE doc_id IS NOT NULL AND source IS NOT NULL
                      AND n_chars IS NOT NULL
                      AND CAST(n_chars AS DOUBLE) > 0
            ),
            r AS (
                SELECT source, id, weight, k,
                       ROW_NUMBER() OVER (
                           PARTITION BY source ORDER BY k DESC, id
                       ) AS rank
                FROM s
            )
            SELECT source, id AS doc_id, weight,
                   CAST(k AS DOUBLE) AS es_key,
                   CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 10
            ORDER BY source, rank
        """
    # q122: q62's tokenization with a per-group rank window.
    d["q122_top_tokens_by_key"] = """
            WITH t AS (
                SELECT source,
                       unnest(str_split_regex(trim(text),
                                              '[\\s\\x0B]+')) AS token
                FROM (SELECT * REPLACE (coalesce(text, '') AS text)
                      FROM documents)
                WHERE source IS NOT NULL AND trim(text) <> ''
            ),
            c AS (
                SELECT source, token, COUNT(*) AS n
                FROM t GROUP BY 1, 2
            ),
            r AS (
                SELECT source, token, n,
                       ROW_NUMBER() OVER (
                           PARTITION BY source ORDER BY n DESC, token
                       ) AS rank
                FROM c
            )
            SELECT source, token, n, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 10
            ORDER BY source, rank
        """
    # q123: the bloom prefilter is exact by construction (false
    # positives die in the verify join), so the oracle is q72's
    # plain exact decontamination SQL — the equality IS the claim.
    d["q123_decontaminate_bloom"] = d["q72_decontaminate"]
    d["q124_audio_features"] = _audio_features_oracle_sql()
    # q125: stream-vs-everything-seen == one-shot all-pairs LSH over
    # corpus ∪ shard restricted to pairs touching the shard (q19's
    # replay + the membership filter; id_a < id_b is canonical).
    d["q125_stream_self_dedup"] = f"""
        WITH {_SHINGLE_CTE},
        {_MINHASH_BAND_CTE},
        cand AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM banded l
            JOIN banded r ON l.band = r.band AND l.bsig = r.bsig
            WHERE l.doc_id < r.doc_id
              AND (l.doc_id % 5 = 0 OR r.doc_id % 5 = 0)
        )
        SELECT c.id_a, c.id_b, j.jaccard
        FROM cand c
        JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
        WHERE j.jaccard >= 0.7
    """
    # q126: the persisted-index batch read must equal q75's recompute
    # bit-for-bit (same codebook derivation, assignment, probes,
    # ranking) — one oracle gates both, the q52/q59 convention.
    d["q126_ivf_batch_indexed"] = d["q75_ivf_batch_topk"]
    # q135: retrain ≡ fresh build over the same stored rows at the
    # new codebooks is EXACT (order-independent training), so q75's
    # fresh-build replay gates the whole build→append→retrain→serve
    # loop verbatim — stale codebooks, missed rows, or a wrong
    # pointer flip all change the probe ranking.
    d["q135_ivf_retrain_serve"] = d["q75_ivf_batch_topk"]
    # q127: Holt's coupled (level, trend) recurrence replayed with a
    # recursive CTE — list_reduce can't carry a 2-field accumulator
    # (its accumulator type is the element type), so the recursion
    # joins step i against state i-1 per key. The complements are
    # written as (1.0 - alpha)/(1.0 - beta) subtractions to match the
    # engine's arithmetic exactly.
    d["q127_holt_last"] = """
        WITH RECURSIVE o AS (
            SELECT CAST(user_id AS VARCHAR) AS k,
                   CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        s AS (
            SELECT k, rn AS i, v AS l, 0.0::DOUBLE AS b, n
            FROM o WHERE rn = 1
            UNION ALL
            SELECT o.k, o.rn,
                   0.3::DOUBLE * o.v
                       + (1.0::DOUBLE - 0.3::DOUBLE) * (s.l + s.b),
                   0.1::DOUBLE * ((0.3::DOUBLE * o.v
                       + (1.0::DOUBLE - 0.3::DOUBLE) * (s.l + s.b))
                       - s.l)
                       + (1.0::DOUBLE - 0.1::DOUBLE) * s.b,
                   s.n
            FROM s JOIN o ON o.k = s.k AND o.rn = s.i + 1
        )
        SELECT k AS user_id,
               ROUND(l, 6) AS level,
               ROUND(b, 6) AS trend,
               ROUND(l + b, 6) AS forecast
        FROM s WHERE i = n
    """
    d["q128_srp_batch_indexed"] = _srp_batch_oracle_sql(
        num_planes=4, dim=64, seed=42, k=5
    )
    # q132/q133: the three-term seasonal recurrence — final row per
    # key (q132) and EVERY intermediate state incl. warm-up NULLs
    # (q133), recursive CTEs carrying the four seasonal columns.
    d["q132_holt_winters_last"] = _holt_winters_oracle_sql(False)
    d["q133_stream_holt_winters"] = _holt_winters_oracle_sql(True)
    # q136: the damped recurrence — q132's CTE with phi*b pasted.
    d["q136_holt_winters_damped"] = _holt_winters_oracle_sql(
        False, phi=0.9
    )
    # q131: recall probe — both rankings + the intersection fraction.
    d["q131_index_recall_probe"] = _srp_recall_oracle_sql(
        num_planes=4, dim=64, seed=42, k=5
    )
    # q130: append ≡ rebuild is exact at frozen planes, so the grown
    # index serves identically to a full build — q128's oracle
    # verbatim gates the whole batch+stream append lifecycle.
    d["q130_srp_append_serve"] = _srp_batch_oracle_sql(
        num_planes=4, dim=64, seed=42, k=5
    )
    # q129: q127's recursion emitting EVERY position (ts carried
    # through), so each micro-step of the streaming state fold is
    # gated, not just the final row.
    d["q129_stream_holt"] = """
        WITH RECURSIVE o AS (
            SELECT CAST(user_id AS VARCHAR) AS k, ts,
                   CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS rn
            FROM events
        ),
        s AS (
            SELECT k, ts, rn AS i, v, v AS l, 0.0::DOUBLE AS b
            FROM o WHERE rn = 1
            UNION ALL
            SELECT o.k, o.ts, o.rn, o.v,
                   0.3::DOUBLE * o.v
                       + (1.0::DOUBLE - 0.3::DOUBLE) * (s.l + s.b),
                   0.1::DOUBLE * ((0.3::DOUBLE * o.v
                       + (1.0::DOUBLE - 0.3::DOUBLE) * (s.l + s.b))
                       - s.l)
                       + (1.0::DOUBLE - 0.1::DOUBLE) * s.b
            FROM s JOIN o ON o.k = s.k AND o.rn = s.i + 1
        )
        SELECT k AS user_id, ts, v AS value,
               ROUND(l, 6) AS level,
               ROUND(b, 6) AS trend,
               ROUND(l + b, 6) AS forecast
        FROM s
    """
    return d
