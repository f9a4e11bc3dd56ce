"""Physical-plan audits: the properties that make the engine scale.

These assert on ``explain`` output, because at 100 TB the plan IS the
product: a filter that doesn't reach the parquet scan re-reads the
world; a dimension join that doesn't broadcast shuffles the fact table.
(SURVEY.md §4: the reference's Index is replaced by exactly these
mechanisms.)
"""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from tinyflux_spark import (
    FieldQuery,
    MeasurementQuery,
    Point,
    TagQuery,
    TimeQuery,
    TinyFluxSpark,
)

T0 = datetime(2020, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pq_db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "db")
    db = TinyFluxSpark(path, spark=spark)
    db.insert_multiple(
        Point(
            time=T0 + timedelta(hours=i),
            measurement="weather" if i % 2 == 0 else "cpu",
            tags={"city": "LA"},
            fields={"t": float(i)},
        )
        for i in range(20)
    )
    return db


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_time_filter_pushed_to_parquet_scan(pq_db):
    q = TimeQuery() >= T0 + timedelta(hours=10)
    plan = plan_of(pq_db.search_df(q))
    assert "PushedFilters" in plan
    # the time comparison reaches the scan (row-group min/max skipping)
    assert "GreaterThanOrEqual(time" in plan


def test_time_range_prunes_date_partitions(pq_db):
    # A time range implies pdate bounds; the injected partition
    # conjunct must appear in PartitionFilters (directory-level
    # pruning — the scale replacement for the reference's timestamp
    # bisect index, reference index.py:719-821).
    q = (TimeQuery() >= T0 + timedelta(hours=10)) & (
        TimeQuery() <= T0 + timedelta(hours=15)
    )
    plan = plan_of(pq_db.search_df(q))
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1][:300]
    assert "pdate" in part


def test_measurement_filter_prunes_partitions(pq_db):
    q = MeasurementQuery() == "weather"
    plan = plan_of(pq_db.search_df(q))
    assert "PartitionFilters" in plan
    assert "measurement" in plan.split("PartitionFilters")[1][:200]


def test_parity_predicates_stay_jvm_side(pq_db):
    # No Python evaluation anywhere in a compiled query-algebra plan:
    # tag/field/measurement/time predicates must be pure Catalyst.
    q = (
        (TagQuery().city == "LA")
        & (FieldQuery().t >= 5)
        & ~(FieldQuery().missing == 1)
        & (MeasurementQuery().matches("w.*"))
    )
    plan = plan_of(pq_db.search_df(q))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_udf_query_isolates_nonudf_conjuncts(pq_db):
    # .test() forces a Python UDF, but the sibling measurement conjunct
    # must still prune partitions (Catalyst splits conjunctions).
    q = (MeasurementQuery() == "weather") & (
        FieldQuery().t.test(lambda v: v is not None and v > 3)
    )
    plan = plan_of(pq_db.search_df(q))
    assert "BatchEvalPython" in plan  # the UDF is there...
    after = plan.split("PartitionFilters")[1][:200]
    assert "measurement" in after  # ...and pruning still happened


@pytest.fixture(scope="module")
def idx_db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans_idx") / "db")
    db = TinyFluxSpark(
        path, spark=spark, index_tags=["city"], index_fields=["t"]
    )
    db.insert_multiple(
        Point(
            time=T0 + timedelta(hours=i),
            measurement="weather",
            tags={"city": "LA" if i % 2 else "SF"},
            fields={"t": float(i)},
        )
        for i in range(20)
    )
    return db


def test_indexed_tag_equality_pushes_to_scan(idx_db):
    # The 100 TB point-lookup path: a TagQuery equality on an indexed
    # key must reach PushedFilters as a scalar-column predicate (the
    # reference's inverted tag index — index.py:694-717 — done as
    # parquet stats + dictionary filtering). MapType lookups never push.
    plan = plan_of(idx_db.search_df(TagQuery().city == "LA"))
    assert "EqualNullSafe(_tag_city,LA)" in plan.split("PushedFilters")[1][:200]


def test_indexed_field_range_pushes_to_scan(idx_db):
    plan = plan_of(idx_db.search_df(FieldQuery().t >= 5))
    pushed = plan.split("PushedFilters")[1][:300]
    assert "IsNotNull(_field_t)" in pushed
    assert "GreaterThanOrEqual(_field_t,5.0)" in pushed


def test_indexed_results_match_map_path(idx_db, spark, tmp_path):
    # Same data in a non-indexed store: identical results for the same
    # queries (the index changes the scan, never the answer), including
    # the operators that must NOT use the scalar column (!=, exists).
    plain = TinyFluxSpark(str(tmp_path / "plain"), spark=spark)
    plain.insert_multiple(
        Point(
            time=T0 + timedelta(hours=i),
            measurement="weather",
            tags={"city": "LA" if i % 2 else "SF"},
            fields={"t": float(i)},
        )
        for i in range(20)
    )
    for q in (
        TagQuery().city == "LA",
        FieldQuery().t >= 5,
        TagQuery().city != "LA",
        TagQuery().city.exists(),
        ~(FieldQuery().t < 3),
    ):
        assert idx_db.count(q) == plain.count(q), repr(q)


def test_indexed_cols_hidden_from_results(idx_db):
    assert "_tag_city" not in idx_db.dataframe().columns
    got = idx_db.search(TagQuery().city == "LA")
    assert got and all(set(p.tags) == {"city"} for p in got)


def test_dimension_join_broadcasts(spark):
    import __spark_entry__ as em

    plan = plan_of(em.q14_region_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_columns(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select("l_orderkey").where(F.col("l_quantity") > 10)
    plan = plan_of(df)
    # ReadSchema carries only the two needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_whole_stage_codegen_covers_agg(spark):
    import __spark_entry__ as em

    df = em.q11_agg_pricing_summary(spark, "/root/testdata/sf0.001")
    df.collect()  # AQE only finalizes (and codegens) the plan on execution
    plan = plan_of(df)
    # formatted mode marks codegen spans as "[codegen id : N]"
    assert "codegen id" in plan
    # both the partial and final HashAggregate are inside codegen stages
    assert "HashAggregate [codegen id" in plan


def test_ivf_index_prunes_list_partitions(spark, tmp_path):
    from tinyflux_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    corpus = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf")
    ivf_write_index(corpus, path, num_centroids=8)

    res = ivf_topk_indexed(spark, path, q, k=5, nprobe=2)
    plan = plan_of(res)
    # the probe filter must be directory-level pruning on the list id,
    # not a data filter over the whole corpus
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1][:300]
    assert "_ivf_list" in part
    # identical answers to the recompute-everything operator
    live = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivf_topk(corpus, q, k=5, num_centroids=8, nprobe=2).collect()
    ]
    idx = [(r["vec_id"], r["cosine_sim"]) for r in res.collect()]
    assert idx == live


def test_srp_index_prunes_bucket_partitions(spark, tmp_path):
    from tinyflux_spark.operators.similarity import (
        srp_lsh_topk,
        srp_topk_indexed,
        srp_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    corpus = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "srp")
    srp_write_index(corpus, path, num_planes=4)

    res = srp_topk_indexed(spark, path, q, k=5, multiprobe=1)
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1][:300]
    assert "_bucket" in part
    live = [
        (r["vec_id"], r["cosine_sim"])
        for r in srp_lsh_topk(
            corpus, q, k=5, num_planes=4, multiprobe=1
        ).collect()
    ]
    idx = [(r["vec_id"], r["cosine_sim"]) for r in res.collect()]
    assert idx == live


def test_gap_fill_uses_running_frames_only(spark):
    """Linear gap-fill must never plan an [current, unbounded FOLLOWING]
    window frame: Spark rescans that frame per row (O(n^2) per key,
    measured 28s vs 0.3s on a 43k-row grid). Both fill directions must
    be running frames, the forward one over a descending sort."""
    import datetime as dt

    from tinyflux_spark.operators.timeseries import gap_fill, resample

    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 0, m), float(m)) for m in (0, 5)],
        ["key", "t", "v"],
    )
    out = gap_fill(resample(df, "t", "key", "v", 60), 60, fill="linear")
    plan = plan_of(out)
    assert "unboundedfollowing" not in plan.lower()
    assert "unboundedpreceding" in plan.lower()


def test_top_tokens_partial_aggregates_before_shuffle(spark):
    """The wordcount shuffles per-partition partial counts (vocabulary-
    sized), not raw corpus tokens: a partial HashAggregate must sit
    below the exchange, and the top-k must be a TakeOrderedAndProject,
    not a global Sort."""
    from tinyflux_spark.operators.text import top_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(top_tokens(docs, "text", k=10))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_scrub_and_chunk_stay_narrow(spark):
    """scrub_text and chunk_documents are pure per-row maps: no
    Exchange of any kind in their plans."""
    from tinyflux_spark.operators.text import chunk_documents, scrub_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in plan_of(scrub_text(docs, "doc_id"))
    assert "Exchange" not in plan_of(
        chunk_documents(docs, "doc_id", "text", 50, 10)
    )


def test_no_plan_antipatterns_across_registered_queries(spark):
    """Sweep every registered gate query's physical plan for scale
    anti-patterns: cartesian/nested-loop joins (an equi-join key should
    always exist), [current, unbounded following] window frames (per-row
    rescan), and Python row UDFs outside the operators documented as
    arbitrary-Python surfaces (.test/.map — q47). Queries whose plan
    is legitimately driver-composed (store builds, streaming) still
    compile; the assertion runs on whatever DataFrame they return."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    # q47 runs the reference's arbitrary-Python .test/.map predicates —
    # the documented UDF surface.
    udf_ok = {"q47_map_test_predicates"}
    # Single-partition exchanges whose input is provably bounded:
    # q06 merges per-task partial counts (rows = task count), q12's
    # window runs over daily aggregates (rows = distinct days), q57's
    # over the value histogram (rows = distinct values). Anything else
    # funneling through one task is a scale bug.
    single_partition_ok = {
        "q06_count", "q12_daily_revenue_ma7", "q57_length_deciles",
        # q77: the (n_docs, avgdl) corpus-stats aggregate is one row by
        # construction; its final-agg exchange is the bounded kind.
        "q77_bm25_scores",
        # q82/q83/q85: the total-doc-count / global-min-group-size /
        # total-token-count aggregates are one row by construction
        # (same bounded kind).
        "q82_remove_boilerplate", "q83_temperature_sample",
        "q85_unigram_logprob",
        # q91/q94: the reference corpus' total-token-count aggregate
        # is one row by construction (q85's bounded kind).
        "q91_bigram_logprob", "q94_trigram_logprob",
        # q96: q85's 1-row total inside its scorer, plus the bucket
        # window over the quantized-score HISTOGRAM (rows = distinct
        # quantized scores, the q57 bounded kind); q97: the two 1-row
        # source/target token-total aggregates; q98: the 1-row (B, V)
        # bigram-type/vocab-size totals.
        "q96_ppl_buckets", "q97_importance_weights", "q98_kneser_ney",
        # q103: the same 1-row total inside the order-5 backoff chain.
        "q103_fivegram_logprob",
        # q104: the O(k) rank window over the bottom-k sample (k rows
        # by construction — the q57 bounded kind) plus two 1-row count
        # aggregates.
        "q104_kmv_quantiles",
    }
    # Keyless broadcast joins whose build side is provably one row:
    # q77 crossJoins the one-row corpus-stats aggregate into the
    # per-term rows — a 1-row BNLJ build is the correct plan, unlike a
    # data-sized nested-loop join.
    bnlj_ok = {
        "q77_bm25_scores",
        # q82: 1-row total-doc-count build crossJoined into the span
        # document-frequency table; q83: 1-row global-min build
        # crossJoined into the per-group count table; q85: 1-row
        # total-token-count build crossJoined into the vocabulary.
        "q82_remove_boilerplate", "q83_temperature_sample",
        "q85_unigram_logprob",
        # q91/q94: same 1-row total build, crossJoined into the
        # backoff tables and OOV floor.
        "q91_bigram_logprob", "q94_trigram_logprob",
        # q96: q85's 1-row total build inside its scorer; q97: the
        # 1-row source/target totals crossJoined into the 1024-row
        # bucket-ratio map; q98: the 1-row (B, V) totals crossJoined
        # into the doc-bigram stream; q101: the 1-row
        # intersection-count aggregate crossJoined into the 1-row
        # union-sketch aggregate.
        "q96_ppl_buckets", "q97_importance_weights", "q98_kneser_ney",
        "q101_kmv_set_overlap",
        # q103: q85/q91/q94's 1-row total build, crossJoined into the
        # unigram backoff table and the OOV floor.
        "q103_fivegram_logprob",
        # q104: the 1-row n_sample / n_total count aggregates
        # crossJoined into the |probs|-row target-rank table.
        "q104_kmv_quantiles",
        # q131: the recall probe's EXACT side is definitionally
        # brute-force — every SAMPLED query scores the whole stored
        # corpus — so the broadcast build is the query sample
        # (bounded by the probe's sampling contract: tens of rows),
        # and the corpus streams through once. A keyed join cannot
        # express "score everything"; this BNLJ is the right plan.
        "q131_index_recall_probe",
    }
    bad = {}
    for name, fn in em.queries().items():
        df = fn(spark, sf)
        plan = plan_of(df)
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            problems.append("BroadcastNestedLoopJoin")
        if "SinglePartition" in plan and name not in single_partition_ok:
            problems.append("unexpected SinglePartition exchange")
        # [unboundedpreceding, unboundedfollowing] whole-partition
        # frames are computed once per group (O(n), fine); only a frame
        # STARTING at currentrow and ending unbounded is rescanned per
        # row (O(n^2) per key — the gap_fill regression class).
        if "currentrow$(), unboundedfollowing$()" in plan.lower():
            problems.append("per-row-rescan unbounded-following frame")
        if "BatchEvalPython" in plan and name not in udf_ok:
            problems.append("row-at-a-time Python UDF")
        if problems:
            bad[name] = problems
    assert not bad, f"plan anti-patterns: {bad}"


def test_registered_queries_return_scalar_only_columns(spark):
    """Entry contract: every gate query's output schema is scalar-only.
    The driver's result canonicalizer does pandas sort_values over
    object columns and crashes on array/map/struct cells — this burned
    q35 in round 1 and q76 in round 4 (both fixed by flattening in the
    gate entry while the operator keeps its typed API). This sweep
    plus the matching check in tools/check_gate.py closes the class."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in em.queries().items():
        df = fn(spark, sf)
        nonscalar = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonscalar:
            bad[name] = nonscalar
    assert not bad, (
        f"non-scalar gate output columns (flatten with array_join "
        f"etc. in the entry): {bad}"
    )
    # The local gate applies the same rule (tools/check_gate.py):
    # a deliberately array-returning frame must be flagged there too.
    from tools.check_gate import nonscalar_columns

    arr_df = spark.range(1).select(
        F.col("id"), F.array(F.lit("a"), F.lit("b")).alias("xs")
    )
    assert nonscalar_columns(arr_df.schema) == ["xs"]
    assert nonscalar_columns(arr_df.select("id").schema) == []


def test_oracle_sql_uses_java_whitespace_class():
    """Cross-engine tokenizer convention: the engine splits with Java
    regex \\s (= [ \\t\\n\\x0B\\f\\r]) but DuckDB's RE2 \\s lacks
    \\x0B, so oracle SQL must always spell whitespace as the explicit
    [\\s\\x0B] class. A bare \\s in an oracle silently diverges from
    the engine on any input containing a vertical tab."""
    import __spark_entry__ as em

    offenders = []
    for name, sql in em.oracle_sql().items():
        stripped = sql.replace("[\\s\\x0B]", "").replace(
            "[^\\s\\x0B]", ""
        )
        # \S has the mirror-image divergence: RE2's \S MATCHES \x0B,
        # Java's does not — spell it [^\s\x0B]
        if "\\s" in stripped or "\\S" in stripped:
            offenders.append(name)
    assert not offenders, (
        f"bare RE2 \\s or \\S in oracle SQL (use [\\s\\x0B] / "
        f"[^\\s\\x0B]): {offenders}"
    )


def test_text_oracles_match_on_adversarial_whitespace(spark, tmp_path):
    """The synthetic corpus contains NO punctuation and no exotic
    whitespace, so the sf gates cannot distinguish a subtly-wrong
    oracle regex from a right one (a broken [^\\w\\s] spelling passed
    the full gate untouched). This runs the text-analysis queries
    engine-vs-DuckDB on a handcrafted corpus full of the hostile
    cases — vertical tabs (where Java and RE2 \\s/\\S genuinely
    differ), tabs/newlines, punctuation, brackets, URLs, digits —
    and requires exact agreement."""
    import duckdb

    import __spark_entry__ as em
    from tools.check_gate import frame_repr

    rows = [
        (0, "hi, there!\x0bnew line.", "en", "src1", 20),
        (1, "a\tb  c. [x] (y) {z}", "en", "src1", 19),
        (2, "visit https://ex.com/a\x0bnext and http://b.io!", "en",
         "src2", 44),
        (3, "  multi   space\nand\nnewlines\t\t tabs ", "fr", "src2",
         37),
        (4, "digits 1234567 run 999999999 ok", "en", "src1", 31),
        (5, "", "de", "src3", 0),
        (6, "\x0b\x0b", "en", "src3", 2),
        (7, "word", "en", "src1", 4),
        (8, None, "en", "src1", 0),  # NULL text — real corpora have it
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, "
              "source: string, n_chars: long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    qs, oracles = em.queries(), em.oracle_sql()
    # every documents-only gate query whose tokenizer/regex semantics
    # the oracle replays — not just the handful that first motivated
    # the test (a divergence in an untested oracle would otherwise
    # slip through exactly the blind spot described above)
    for name in (
        "q17_dedup_exact", "q18_ngram_jaccard_pairs",
        "q19_minhash_lsh_pairs", "q20_simhash", "q21_text_quality",
        "q22_lang_id", "q23_doc_fingerprint",
        "q27_simhash_hamming_pairs", "q30_token_stats",
        "q51_dedup_clusters", "q54_repetition_stats",
        "q58_dedup_keep_canonical", "q62_top_tokens", "q63_scrub_pii",
        "q64_chunk_documents", "q72_decontaminate",
        "q74_pack_sequences", "q76_quality_filter", "q77_bm25_scores",
        "q79_edit_distance_pairs", "q80_incremental_dedup_join",
        "q81_corpus_profile", "q82_remove_boilerplate",
        "q83_temperature_sample", "q85_unigram_logprob",
        "q89_excise_duplicate_spans", "q90_rollup_card",
        "q91_bigram_logprob", "q92_normalize_text",
        "q94_trigram_logprob", "q96_ppl_buckets",
        "q97_importance_weights", "q98_kneser_ney",
        "q99_text_semantic_dedup",
    ):
        scols, srows = frame_repr(qs[name](spark, str(tmp_path)).toPandas())
        ocols, orows = frame_repr(con.execute(oracles[name]).df())
        assert scols == ocols, name
        assert srows == orows, (
            f"{name}: engine and oracle diverge on adversarial text"
        )


def test_events_oracles_match_on_adversarial_timestamps(spark, tmp_path):
    """Same blind-spot logic as the adversarial-text test, for the
    events family: the synthetic events table has no duplicate
    timestamps, no exact session-boundary gaps, and no rank ties, so
    the sf gates can't tell whether engine and oracle agree on the
    edges that actually bite — zero-dt derivatives, the > vs >= 1800 s
    session boundary, tied totals in rankings, tumbling-window edges,
    negative and zero values, single-event keys. Handcrafted corpus,
    exact agreement required."""
    import duckdb

    import __spark_entry__ as em
    from tools.check_gate import frame_repr

    T = lambda h, m=0, s=0: datetime(2024, 3, 1, h, m, s)  # noqa: E731
    rows = [
        # u1: duplicate ts (zero-dt derivative; order ties broken by
        # event_id), an exactly-1800s gap (same session under > 1800),
        # then an 1801s gap (new session). Values anti-correlated with
        # event_id so an (ts, event_id)-ordered engine and an
        # (ts, value)-ordered oracle can't agree by accident.
        (1, T(10), 1, "click", 7.0, "{}"),
        (2, T(10), 1, "click", 5.0, "{}"),
        (3, T(10, 30), 1, "view", -3.0, "{}"),
        (4, T(11, 0, 1), 1, "purchase", 0.0, "{}"),
        # u2: single event — no predecessor anywhere
        (5, T(12), 2, "click", 2.5, "{}"),
        # u3 vs u4: identical click totals -> q13 rank tie, broken by
        # user_id
        (6, T(9), 3, "click", 4.0, "{}"),
        (7, T(9, 5), 3, "click", 6.0, "{}"),
        (8, T(9), 4, "click", 10.0, "{}"),
        # u5: events on exact hour boundaries (tumbling-window edges),
        # negative and fractional values
        (9, T(13), 5, "view", -1.5, "{}"),
        (10, T(13, 59, 59), 5, "view", 8.25, "{}"),
        (11, T(14), 5, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, "
              "event_type: string, value: double, props: string"
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    qs, oracles = em.queries(), em.oracle_sql()
    for name in (
        "q13_topk_users_per_type", "q15_hourly_window", "q16_asof_join",
        "q28_sessionize", "q29_ewma_last", "q60_resample_gapfill",
        "q61_rolling_zscore", "q65_derivative", "q66_percentiles",
        # q100 on an 11-distinct-id corpus exercises the KMV sketch's
        # exact path (n_seen < k) cross-engine
        "q100_kmv_distinct",
    ):
        scols, srows = frame_repr(qs[name](spark, str(tmp_path)).toPandas())
        ocols, orows = frame_repr(con.execute(oracles[name]).df())
        assert scols == ocols, name
        assert srows == orows, (
            f"{name}: engine and oracle diverge on adversarial events"
        )


def test_embedding_oracles_match_on_adversarial_vectors(spark, tmp_path):
    """Adversarial corpus for the vector family: an all-zero vector
    (cosine denominator 0 — NaN/null handling and NaN sort order
    genuinely differ between engines), exactly-identical vectors
    (cosine exactly 1, dedup cluster of size > 1), an exactly-opposite
    vector (cosine -1), and near-zero magnitudes (float32 rounding).
    The synthetic embeddings contain none of these. Dim 64 to match
    the entries' seeded SRP hyperplanes."""
    import duckdb

    import __spark_entry__ as em
    from tools.check_gate import frame_repr

    base = [((j * 11 + 3) % 19 - 9) / 7.0 for j in range(64)]

    def vec(scale, offset=0.0):
        return [float(x * scale + offset) for x in base]

    rows = [
        (0, vec(1.0), 0),            # the q24 query vector
        (1, vec(1.0), 0),            # identical to the query: cos 1
        (2, vec(-1.0), 1),           # exact opposite: cos -1
        (3, [0.0] * 64, 1),          # all-zero: 0 denominator
        (4, vec(1e-6), 2),           # near-zero magnitude
        (5, vec(2.0), 2),            # same direction, diff magnitude
        (6, vec(1.0, 0.5), 3),       # shifted
        (7, [float((j == 0) - 0.0) for j in range(64)], 3),  # basis vec
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    qs, oracles = em.queries(), em.oracle_sql()
    for name in (
        "q24_ann_cosine_topk", "q25_embedding_near_dup",
        "q31_srp_ann_topk", "q52_ivf_ann_topk",
        "q56_embedding_dup_clusters", "q75_ivf_batch_topk",
        "q78_quantize_embeddings", "q95_semantic_dedup",
    ):
        scols, srows = frame_repr(qs[name](spark, str(tmp_path)).toPandas())
        ocols, orows = frame_repr(con.execute(oracles[name]).df())
        assert scols == ocols, name
        assert srows == orows, (
            f"{name}: engine and oracle diverge on adversarial vectors"
        )


def test_collect_arrow_batches_fallback_matches_fast_path(spark, monkeypatch):
    """collect_arrow_batches rides private PySpark hooks
    (_load_from_socket + collectAsArrowToPython); this pins the
    contract: when the hooks drift away (simulated by deleting the
    import target) the public toArrow() fallback returns the identical
    data, so hook drift degrades latency, never correctness."""
    import pyarrow as pa
    import pyspark.rdd
    from pyspark.sql import functions as F

    from tinyflux_spark.schema import collect_arrow_batches

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("y"),
        F.concat(F.lit("r"), F.col("id")).alias("s"),
    )
    fast = collect_arrow_batches(df)
    assert all(isinstance(b, pa.RecordBatch) for b in fast)

    monkeypatch.delattr(pyspark.rdd, "_load_from_socket")
    slow = collect_arrow_batches(df)
    assert all(isinstance(b, pa.RecordBatch) for b in slow)

    t_fast = pa.Table.from_batches(fast)
    t_slow = pa.Table.from_batches(slow)
    assert t_fast.schema.equals(t_slow.schema)
    assert t_fast.sort_by("id").to_pydict() == t_slow.sort_by("id").to_pydict()


def test_bnlj_allowlist_build_sides_are_one_row(spark):
    """Guard on the bnlj_ok allowlist above: every
    BroadcastNestedLoopJoin in an allowlisted query's EXECUTED plan at
    gate SF must have a broadcast build side of at most ONE row (the
    1-row corpus-stats/total aggregate those entries were allowlisted
    for). A future query riding the allowlist with a data-sized build
    side fails here instead of shipping an O(n*m) join."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    bnlj_allowlisted = (
        "q77_bm25_scores", "q82_remove_boilerplate",
        "q83_temperature_sample", "q85_unigram_logprob",
        "q91_bigram_logprob", "q94_trigram_logprob",
        "q96_ppl_buckets", "q97_importance_weights",
        "q98_kneser_ney", "q101_kmv_set_overlap",
        "q103_fivegram_logprob", "q104_kmv_quantiles",
    )

    def walk(n):
        yield n
        nm = n.nodeName()
        if nm == "AdaptiveSparkPlan":
            yield from walk(n.executedPlan())
            return
        if "QueryStage" in nm:
            yield from walk(n.plan())
            return
        ch = n.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    def build_rows(node):
        """numOutputRows of the BroadcastExchange this BNLJ child IS
        (descending only through wrapper nodes — InputAdapter,
        codegen, query stages), or None when the child is the probe
        side / a ReusedExchange (its original is asserted where it
        materializes). Deeper exchanges feeding other joins inside
        the subtree are deliberately NOT this join's build."""
        n = node
        while True:
            nm = n.nodeName()
            if nm.startswith("BroadcastExchange"):
                m, it = {}, n.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    m[kv._1()] = kv._2().value()
                return m.get("numOutputRows")
            if nm == "InputAdapter" or nm.startswith("WholeStageCodegen"):
                n = n.children().apply(0)
            elif "QueryStage" in nm:
                n = n.plan()
            else:
                return None

    checked = 0
    for name in bnlj_allowlisted:
        df = em.queries()[name](spark, sf)
        df.collect()
        final = df._jdf.queryExecution().executedPlan()
        for n in walk(final):
            if "BroadcastNestedLoopJoin" not in n.nodeName():
                continue
            ch = n.children()
            for i in range(ch.size()):
                rows = build_rows(ch.apply(i))
                if rows is None:
                    continue
                assert rows <= 1, (
                    f"{name}: BNLJ build side has {rows} rows -- "
                    "does not deserve its allowlist entry"
                )
                checked += 1
    # the allowlist is not vacuous: the 1-row builds were actually
    # found and measured
    assert checked >= len(bnlj_allowlisted)


def test_cross_engine_lower_parity_boundary(spark):
    """The oracle convention uses lower() on both engines; the sf gates
    only ever feed it ASCII. This pins the REAL cross-engine boundary:
    sweeping the whole BMP, Java's String.toLowerCase (Spark) and
    DuckDB's utf8proc lower agree on every codepoint except a known
    14 — U+0130 (Turkish dotted capital I, whose full mapping adds a
    combining dot Java-side) and a handful of rare historic letters
    where the engines' Unicode versions differ (Glagolitic U+2C2F,
    Latin Extended-D U+A7Cx/U+A7Dx, U+1C89). A divergence OUTSIDE this
    set (e.g. after a JVM or DuckDB upgrade) fails here before it can
    silently skew a multilingual oracle; shrinkage (engines catching
    up) is tolerated. Python str.lower (normalize_text's case path)
    is pinned against Java the same way."""
    import duckdb

    known_java_vs_duckdb = {
        0x130, 0x1C89, 0x2C2F, 0xA7C0, 0xA7C7, 0xA7C9, 0xA7CB,
        0xA7CC, 0xA7D0, 0xA7D6, 0xA7D8, 0xA7DA, 0xA7DC, 0xA7F5,
    }
    known_java_vs_python = {0x1C89, 0xA7CB, 0xA7CC, 0xA7DA, 0xA7DC}
    cps = [c for c in range(0x80, 0x10000)
           if not (0xD800 <= c <= 0xDFFF)]
    df = spark.createDataFrame([(c, chr(c)) for c in cps], ["cp", "s"])
    jv = {
        r["cp"]: r["l"]
        for r in df.select("cp", F.lower("s").alias("l")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS cp", [cps]
    )
    dd = dict(con.execute("SELECT cp, lower(chr(cp)) FROM t").fetchall())
    dj_dd = {c for c in cps if jv[c] != dd[c]}
    assert dj_dd <= known_java_vs_duckdb, sorted(
        hex(c) for c in dj_dd - known_java_vs_duckdb
    )
    dj_py = {c for c in cps if jv[c] != chr(c).lower()}
    assert dj_py <= known_java_vs_python, sorted(
        hex(c) for c in dj_py - known_java_vs_python
    )
    # and real multilingual text is safely inside the boundary
    sentences = [
        "Grande Bibliothe\u0300que FRANC\u0327AISE",
        "GRO\u00dfE \u00dcBUNG", "\u039c\u0395\u0393\u0391\u039b\u0397 \u0395\u039b\u039b\u0391\u0394\u0391",
        "\u0411\u041e\u041b\u042c\u0428\u0410\u042f \u0420\u041e\u0421\u0421\u0418\u042f",
        "\u010cESK\u00c1 REPUBLIKA", "T\u00dcRK\u0130YE",  # İ: divergent ON PURPOSE
    ]
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sentences)], ["i", "s"]
    )
    sj = {r["i"]: r["l"] for r in
          sdf.select("i", F.lower("s").alias("l")).collect()}
    for i, s in enumerate(sentences):
        (want,) = con.execute("select lower(?)", [s]).fetchone()
        if "\u0130" in s:
            assert sj[i] != want  # the documented exception
        else:
            assert sj[i] == want, s


def test_cross_engine_astral_normalize_parity(spark, tmp_path):
    """q92's engine path is Python unicodedata+str.lower (inside the
    Arrow UDF); its oracle is DuckDB nfc_normalize+lower. The BMP
    lower() boundary is pinned above — this pins the SUPPLEMENTARY
    planes and multi-codepoint sequences the BMP sweep cannot see:

    1. single-codepoint NFC agrees on the ENTIRE codespace (measured:
       zero divergences U+0080..U+10FFFF);
    2. astral lower() diverges exactly on the 35-codepoint Vithkuqi
       block U+10570..U+10595 (case mappings land in different Unicode
       versions across the engines) — growth of that set fails here
       before it can skew a multilingual oracle;
    3. the actual q92 gate query agrees engine-vs-oracle on a hostile
       corpus of SEQUENCES: Hangul jamo composition, combining-mark
       canonical reordering, blocked composition, Deseret/Adlam/
       Osage astral case mapping, emoji + ZWJ, and the Vithkuqi
       exception is kept OUT of q92's domain by contract."""
    import duckdb
    import unicodedata

    import __spark_entry__ as em
    from tools.check_gate import frame_repr

    con = duckdb.connect()
    # (1) + (2): sweep the supplementary planes in one round-trip
    cps = list(range(0x10000, 0x110000))
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS cp", [cps])
    rows = con.execute(
        "SELECT cp, nfc_normalize(chr(cp)), "
        "lower(nfc_normalize(chr(cp))) FROM t"
    ).fetchall()
    vithkuqi = set(range(0x10570, 0x10596)) - {0x1057B, 0x1058B, 0x10593}
    nfc_div, low_div = [], []
    for cp, dnfc, dlow in rows:
        p = unicodedata.normalize("NFC", chr(cp))
        if p != dnfc:
            nfc_div.append(cp)
        if p.lower() != dlow:
            low_div.append(cp)
    assert not nfc_div, sorted(hex(c) for c in nfc_div[:20])
    assert set(low_div) <= vithkuqi, sorted(
        hex(c) for c in set(low_div) - vithkuqi
    )

    # (3): hostile sequences through the real q92 query + oracle
    texts = [
        "각 hangul jamo",        # LVT composition
        "q̣̇ vs q̣̇ reorder",  # ccc reordering
        "é́ stacked acutes",
        "Å blocked Á̊",
        "\U00010400\U00010428 deseret pair",
        "\U0001E900\U0001E922 adlam pair",
        "\U000104B0\U000104D8 osage pair",
        "emoji \U0001F600 zwj \U0001F469‍\U0001F4bb",
        "ＡＢ fullwidth (NFC keeps)",
        "Å angstrom Ω ohm",             # singletons
    ]
    rows2 = [(i, t, "xx", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows2, "doc_id: long, text: string, lang: string, "
               "source: string, n_chars: long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    name = "q92_normalize_text"
    scols, srows = frame_repr(
        em.queries()[name](spark, str(tmp_path)).toPandas()
    )
    ocols, orows = frame_repr(con.execute(em.oracle_sql()[name]).df())
    assert scols == ocols
    assert srows == orows, "q92 diverges on hostile Unicode sequences"


def test_ivf_pq_index_prunes_partitions_and_columns(spark, tmp_path):
    """The persisted IVF-PQ read path (VERDICT r7 ask #6): the probe
    filter must be directory-level pruning on the list id AND the
    codes scan must read only (id, codes) — the raw embedding column
    never appears in the scan schema. Results identical to the inline
    ivf_pq_topk with the same parameters; rerank=c recovers exact
    cosine through the partition-pruned raw lists."""
    from tinyflux_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    ivf_write_index(corpus, path, num_centroids=8, pq_m=8, pq_ksub=8)

    res = ivf_pq_topk_indexed(spark, path, q, k=5, nprobe=2)
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "_ivf_list" in plan.split("PartitionFilters")[1][:300]
    # column pruning: the codes scan reads id + codes, never a vector
    scan = plan.split("ReadSchema")[1][:300]
    assert "codes" in scan
    assert "embedding" not in scan
    live = [
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q, k=5, num_centroids=8, nprobe=2, m=8, ksub=8
        ).collect()
    ]
    assert [tuple(r) for r in res.collect()] == live
    # rerank: exact cosine over the probed lists' candidates only
    rr = ivf_pq_topk_indexed(spark, path, q, k=5, nprobe=8, rerank=200)
    exact = cosine_topk(corpus, q, k=5).collect()
    assert [tuple(r) for r in rr.collect()] == [tuple(r) for r in exact]


def test_grouped_kmv_totals_partial_aggregate_not_count_window(spark):
    """Skew-funnel regression guard (VERDICT r8): the per-group TOTAL
    in kmv_quantiles_by_key / kmv_quantile_sketch must come from a
    groupBy().count() (map-side partial_count) joined onto the <= k
    sample, never from `count(*) over (partition by group)` computed
    on the raw rows — an unbounded count window BELOW the bottom-k
    WindowGroupLimit has no partial aggregation and funnels every row
    of a hot group through one task. In the tree-printed physical
    plan, parents print above children, so any count window must
    appear ABOVE (before) the first WindowGroupLimit: the only one
    allowed is n_sample's, computed over the already-bounded sample."""
    import re

    from tinyflux_spark.operators.sketches import (
        kmv_quantile_sketch,
        kmv_quantiles_by_key,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cases = {
        "kmv_quantiles_by_key": kmv_quantiles_by_key(
            docs, F.length("text"), "doc_id", "source", k=64
        ),
        "kmv_quantile_sketch": kmv_quantile_sketch(
            docs, F.length("text"), "doc_id", "source", k=64
        ),
    }
    for name, df in cases.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan, f"{name}: totals lost map-side combine"
        assert "WindowGroupLimit" in plan, f"{name}: bottom-k lost group limit"
        first_wgl = plan.index("WindowGroupLimit")
        for m in re.finditer(r"count\(1\) windowspecdefinition", plan):
            assert m.start() < first_wgl, (
                f"{name}: unbounded count window below the group limit "
                "(hot-group single-task funnel)"
            )
    sketch_plan = (
        cases["kmv_quantile_sketch"]
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "count(1) windowspecdefinition" not in sketch_plan


def test_residual_ivf_pq_index_read_prunes_partitions_and_columns(
    spark, tmp_path
):
    """The residual persisted-index serving read (VERDICT r8 ask #5)
    keeps q109's plan shape: probe filter as directory-level
    PartitionFilters, scan schema = (id, codes) only — the per-list
    residual ADC CASE adds expressions, never columns, and the raw
    embedding column never leaves storage."""
    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq_res")
    ivf_write_index(
        corpus, path, num_centroids=8, pq_m=8, pq_ksub=8,
        residual=True, coarse_refine_iters=1,
    )
    res = ivf_pq_topk_indexed(spark, path, q, k=5, nprobe=2)
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "_ivf_list" in plan.split("PartitionFilters")[1][:300]
    scan = plan.split("ReadSchema")[1][:300]
    assert "codes" in scan
    assert "embedding" not in scan


def test_data_card_shares_one_corpus_exchange(spark):
    """The one-pass data card (VERDICT r8 ask #7) must scan and
    shuffle the corpus ONCE: the executed plan carries exactly one
    FileScan and exactly one corpus-sized Exchange on (group, kind,
    value) — partial_count-combined, skew spread over the value
    domain — with the quantile branch reading it as a ReusedExchange.
    Everything else is histogram-sized exchanges on the group column
    (the q57 bounded kind)."""
    import re

    from tinyflux_spark.operators.sketches import data_card

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = data_card(docs, "n_chars", "source", "lang")
    out.collect()  # materialize so AQE settles the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    corpus_ex = [
        ln
        for ln in final.splitlines()
        if re.search(r"\bExchange hashpartitioning\(group#\d+, _kind", ln)
        and "ReusedExchange" not in ln  # the reuse line prints its target
    ]
    assert len(corpus_ex) == 1, corpus_ex
    assert "ReusedExchange" in final
    assert "partial_count" in final  # map-side combine below it


def test_grouped_sample_and_tokens_get_window_group_limit(spark):
    """The two round-9 grouped top-k operators keep the bounded-
    shuffle contract of the grouped-sketch family: the per-group
    rank filter must be rewritten to Partial+Final WindowGroupLimit
    (each map task forwards <= k rows per group), and no unbounded
    count window may sit below it — the skew-funnel pattern VERDICT
    r8 flagged is banned family-wide."""
    import re

    from tinyflux_spark.operators.sampling import weighted_sample_by_key
    from tinyflux_spark.operators.text import top_tokens_by_key

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cases = {
        "weighted_sample_by_key": weighted_sample_by_key(
            docs, "doc_id", "n_chars", "source", k=5
        ),
        "top_tokens_by_key": top_tokens_by_key(docs, "source", k=5),
    }
    for name, df in cases.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, f"{name}: rank filter not pushed"
        first_wgl = plan.index("WindowGroupLimit")
        for m in re.finditer(r"count\(1\) windowspecdefinition", plan):
            assert m.start() < first_wgl, f"{name}: count window below limit"
    # top_tokens_by_key additionally partial-aggregates the wordcount
    tok_plan = (
        cases["top_tokens_by_key"]
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in tok_plan


def test_bloom_decontamination_never_broadcasts_eval_strings(spark):
    """prefilter='bloom' exists so a too-big-to-broadcast eval suite
    still decontaminates: the plan's BroadcastExchanges must carry
    only the packed-long bitmap word tables (two long columns), never
    the eval shingle STRINGS — and the exact verify join on the
    shingle must be a shuffle join. The broadcast path keeps its
    broadcast (control case)."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.dedup import contamination_hits

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    test = docs.where(F.col("doc_id") % 41 == 0)
    train = docs.where(F.col("doc_id") % 41 != 0)
    bloom = contamination_hits(
        train, test, "doc_id", n=3,
        prefilter="bloom", bloom_bits=1 << 16, bloom_hashes=5,
    )
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "BroadcastExchange" in ln or "BroadcastHashJoin" in ln:
            assert "shingle" not in ln, ln
    # the verify join on the shingle is NOT a broadcast join
    joins = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "shingle" in ln
    ]
    assert joins, "verify join on shingle missing from plan"
    assert all("Broadcast" not in ln for ln in joins), joins
    # The bitmap is built ONCE (eager persist()+count() at call time —
    # recomputable lineage, ADVICE r10) and every probe join reads the
    # CACHED word table: each of the j broadcast builds must be an
    # InMemoryTableScan of the one cached relation, so the bit_or
    # aggregation text appears only inside InMemoryRelation's cached-
    # plan dump, never as a live aggregation feeding a broadcast.
    assert plan.count("InMemoryTableScan") >= 5, (
        "probe joins are not reading the cached bitmap"
    )
    # caching replaces the words subtree in EVERY reference (Spark's
    # cache lookup is at the analyzed-plan level), so with j
    # InMemoryTableScans present there is no live bit_or aggregation
    # left to re-execute — the bit_or text that remains in the string
    # is InMemoryRelation's cached-plan dump. The cache is already
    # materialized at call time (eager count()): storage info shows
    # cached partitions before the result is ever evaluated.
    assert any(
        r.numCachedPartitions() > 0
        for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ), "bitmap cache not materialized eagerly"


def test_ivf_pq_batch_indexed_codes_only_pruned_limited(
    spark, tmp_path
):
    """The batch ADC read (q134) keeps all three scale contracts at
    once: the codes/ scan is pruned to the union of the queries'
    probed directories (PartitionFilters on _ivf_list), the ReadSchema
    carries ONLY (id, codes) — no raw vector column ever leaves
    storage — and the per-query top-k compiles to WindowGroupLimit."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import (
        ivf_pq_topk_batch_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    path = str(tmp_path / "idx")
    ivf_write_index(emb, path, num_centroids=16, pq_m=8, pq_ksub=8)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    res = ivf_pq_topk_batch_indexed(
        spark, path, queries, k=5, nprobe=4
    )
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "_ivf_list" in plan.split("PartitionFilters")[1][:300]
    assert "WindowGroupLimit" in plan
    # codes-only corpus read: the index FileScan's ReadSchema carries
    # (id, codes) and never the raw embedding column (the queries-side
    # scan of the embeddings table legitimately reads embeddings)
    corpus_scans = [
        c.splitlines()[0]
        for c in plan.split("ReadSchema:")[1:]
        if "codes" in c.splitlines()[0]
    ]
    assert corpus_scans, "no codes scan found in plan"
    assert all("embedding" not in s for s in corpus_scans), corpus_scans


def test_ivf_batch_indexed_prunes_partitions_and_limits_groups(
    spark, tmp_path
):
    """The persisted-index BATCH read (q126) keeps both scale
    contracts at once: the lists/ scan is pruned to the union of the
    queries' probed directories (PartitionFilters on _ivf_list), and
    the per-query top-k compiles to WindowGroupLimit. Results must be
    identical to the recompute path (ivf_topk_batch) and to one
    ivf_topk_indexed call per query."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import (
        ivf_topk_batch,
        ivf_topk_batch_indexed,
        ivf_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    path = str(tmp_path / "idx")
    ivf_write_index(emb, path, num_centroids=16)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    res = ivf_topk_batch_indexed(spark, path, queries, k=5, nprobe=4)
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "_ivf_list" in plan.split("PartitionFilters")[1][:300]
    assert "WindowGroupLimit" in plan
    got = sorted(tuple(r) for r in res.collect())
    live = sorted(
        tuple(r)
        for r in ivf_topk_batch(
            emb, queries, k=5, num_centroids=16, nprobe=4
        ).collect()
    )
    assert got == live
    # per-query serving equivalence for one representative query
    q0 = queries.orderBy("vec_id").first()
    solo = ivf_topk_indexed(
        spark, path, list(q0["embedding"]), k=6, nprobe=4
    )
    solo_ids = [
        r["vec_id"]
        for r in solo.collect()
        if r["vec_id"] != q0["vec_id"]
    ][:5]
    batch_ids = [
        r["vec_id"]
        for r in res.where(F.col("query_id") == q0["vec_id"])
        .orderBy("rank")
        .collect()
    ]
    assert batch_ids == solo_ids


def test_srp_batch_indexed_prunes_buckets_and_limits_groups(
    spark, tmp_path
):
    """q128 keeps q126's two scale contracts on the SRP layout: the
    buckets/ scan is pruned to the union of probed bucket directories
    (PartitionFilters on _bucket) and the per-query top-k compiles to
    WindowGroupLimit; results equal per-query srp_topk_indexed."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import (
        srp_topk_batch_indexed,
        srp_topk_indexed,
        srp_write_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    path = str(tmp_path / "srp")
    srp_write_index(emb, path, num_planes=4)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    res = srp_topk_batch_indexed(spark, path, queries, k=5)
    plan = plan_of(res)
    assert "PartitionFilters" in plan
    assert "_bucket" in plan.split("PartitionFilters")[1][:300]
    assert "WindowGroupLimit" in plan
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine_sim"])
        )
    for q in queries.collect():
        solo = srp_topk_indexed(
            spark, path, list(q["embedding"]), k=6, multiprobe=1
        )
        solo_rows = [
            (r["vec_id"], r["cosine_sim"])
            for r in solo.collect()
            if r["vec_id"] != q["vec_id"]
        ][:5]
        got = [
            (v, c) for _, v, c in sorted(by_q.get(q["vec_id"], []))
        ]
        assert got == solo_rows
