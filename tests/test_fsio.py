"""Round-12 infrastructure: the persisted-index metadata layer on the
Hadoop FileSystem API (tinyflux_spark.fsio), the marker-commit
generation protocol, the enforced retrain/append single-writer
contract, and the manifest-declared ADC scoring dtype.

The reference hides its storage behind an ABC so backends swap without
touching the engine (tinyflux storages.py:56-167); here the seam is
Hadoop's FileSystem API — the same index lifecycle must run unchanged
whether the index root is a plain local path or a ``file://`` (and, on
a real cluster, ``hdfs://``/``s3a://``) URI, because at 100 TB the
index root is object storage and the parquet halves already go through
Spark's scheme-aware readers.
"""

import time

import pytest
from pyspark.sql import functions as F

from tinyflux_spark import fsio
from tinyflux_spark.operators import similarity as sim


def _corpus(spark, n, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000))
                 - F.lit(1000)) / F.lit(1000.0)
            ).cast("float"),
        ).alias("embedding"),
    )


# ---------------------------------------------------------------- fsio


def test_fsio_json_roundtrip_and_guards(spark, tmp_path):
    p = str(tmp_path / "m" / "x.json")
    fsio.write_json_atomic(p, {"a": 1, "b": [1, 2]})
    assert fsio.read_json(p) == {"a": 1, "b": [1, 2]}
    assert fsio.exists(p)
    assert fsio.read_json_if_exists(str(tmp_path / "nope.json")) is None
    # overwrite goes through the same staged path
    fsio.write_json_atomic(p, {"a": 2})
    assert fsio.read_json(p) == {"a": 2}
    # no stray temp files left behind
    assert fsio.list_names(str(tmp_path / "m")) == ["x.json"]
    # a slash-less bare filename is a usage error, reported as such
    # (ADVICE r11: previously an opaque unpack ValueError)
    with pytest.raises(ValueError, match="parent directory"):
        fsio.write_json_atomic("bare.json", {})
    # delete is idempotent
    fsio.delete(p, False)
    fsio.delete(p, False)
    assert not fsio.exists(p)


def test_unconfigured_scheme_fails_at_first_metadata_touch(spark):
    """An index root on a scheme with no configured FileSystem raises
    Hadoop's own descriptive error at the FIRST metadata touch —
    never the pre-r12 failure mode of silently writing metadata into
    a literal local directory named ``s3a:/...`` (VERDICT r11)."""
    import os

    with pytest.raises(Exception, match="s3a"):
        fsio.exists("s3a://bucket/idx/params.json")
    assert not os.path.exists("s3a:")


def test_fsio_create_json_is_existence_gated_commit(spark, tmp_path):
    """create_json: the rename-free commit-marker write (object-store
    safe — generation commit never depends on atomic rename)."""
    p = str(tmp_path / "gen" / sim._GEN_COMMIT_MARKER)
    assert not fsio.exists(p)
    fsio.create_json(p, {"version": 3})
    assert fsio.exists(p)
    assert fsio.read_json(p) == {"version": 3}


def test_metadata_memo_coherent_on_rewrite(spark, tmp_path):
    """Immutable-artifact memoization must never serve stale data
    after an in-place rebuild or any write/delete through fsio (every
    write through the choke point invalidates its own key)."""
    path = str(tmp_path / "idx")
    a = _corpus(spark, 100)
    sim.ivf_write_index(a, path, num_centroids=4)
    assert len(sim.ivf_read_codebook(path)) == 4
    sim.ivf_write_index(a, path, num_centroids=8)
    assert len(sim.ivf_read_codebook(path)) == 8

    p = fsio.pjoin(str(tmp_path), "m.json")
    fsio.write_json_atomic(p, {"v": 1})
    assert fsio.read_json_cached(p) == {"v": 1}
    fsio.write_json_atomic(p, {"v": 2})
    assert fsio.read_json_cached(p) == {"v": 2}
    fsio.delete(p, False)
    assert fsio.read_json_cached_if_exists(p) is None


# ----------------------------------------- lifecycle through file://


def test_index_lifecycle_through_file_scheme(spark, tmp_path):
    """The WHOLE IVF-PQ lifecycle — build, serve, append, retrain
    (staged generation + _SUCCESS marker commit), serve the new
    generation, GC — through an explicit ``file://`` URI root, i.e.
    the Hadoop FS API end to end with ZERO driver-local os.path/open
    assumptions. Results are identical to the same lifecycle on the
    plain local path (the scheme must be invisible to semantics)."""
    local = str(tmp_path / "idx_local")
    uri = "file://" + str(tmp_path / "idx_uri")
    full = _corpus(spark, 240)
    corpus = full.where("vec_id < 200")
    queries = full.where("vec_id < 4")

    def lifecycle(path):
        sim.ivf_write_index(
            corpus, path, num_centroids=8, pq_m=4, pq_ksub=16
        )
        sim.ivf_append_index(
            full.where("vec_id >= 200"), path
        )
        first = sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in sim.ivf_pq_topk_batch_indexed(
                spark, path, queries, k=3, nprobe=3,
                scoring_dtype="decimal",
            ).collect()
        )
        info = sim.ivf_retrain_index(spark, path, num_centroids=8)
        second = sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in sim.ivf_pq_topk_batch_indexed(
                spark, path, queries, k=3, nprobe=3,
                scoring_dtype="decimal",
            ).collect()
        )
        return first, second, info

    f_loc, s_loc, _ = lifecycle(local)
    f_uri, s_uri, info = lifecycle(uri)
    assert f_loc == f_uri and s_loc == s_uri and f_loc

    # the generation committed via its _SUCCESS marker, at the URI
    assert info["version"] == 0
    assert fsio.exists(
        fsio.pjoin(uri, sim._ivdir(0), sim._GEN_COMMIT_MARKER)
    )
    assert sim._read_index_version(uri) == 0
    # no legacy pointer file — the scan IS the pointer
    assert not fsio.exists(fsio.pjoin(uri, "_current.json"))
    # and nothing was mislaid into a literal local dir named "file:"
    import os

    assert not os.path.exists("file:")

    # second retrain: new generation wins, keep-2 GC retains v0
    info2 = sim.ivf_retrain_index(spark, uri, num_centroids=8)
    assert info2["version"] == 1
    assert sim._read_index_version(uri) == 1
    names = set(fsio.list_names(uri))
    assert sim._ivdir(1) in names and sim._ivdir(0) in names
    # flat legacy members retired after two supersedes
    assert "lists" not in names and "codes" not in names


def test_marker_scan_ignores_uncommitted_generation(spark, tmp_path):
    """A staged generation dir WITHOUT its _SUCCESS marker is
    invisible: readers keep resolving the old index (crash-mid-build
    leaves serving untouched), and a legacy _current.json pointer is
    honored only when no marker-committed generation exists."""
    path = str(tmp_path / "idx")
    corpus = _corpus(spark, 100)
    sim.ivf_write_index(corpus, path, num_centroids=4)
    assert sim._read_index_version(path) is None
    assert sim._resolve_index_root(path) == path

    # orphaned staging dir (no marker): still invisible
    fsio.create_json(
        fsio.pjoin(path, sim._ivdir(0), "placeholder.json"), {}
    )
    assert sim._read_index_version(path) is None

    # pre-r12 layout: a legacy pointer names a generation
    fsio.write_json_atomic(
        fsio.pjoin(path, "_current.json"), {"version": 0}
    )
    assert sim._read_index_version(path) == 0
    # a marker-committed generation OUTRANKS the legacy pointer
    fsio.create_json(
        fsio.pjoin(path, sim._ivdir(1), sim._GEN_COMMIT_MARKER),
        {"version": 1},
    )
    assert sim._read_index_version(path) == 1


# ------------------------------------- single-writer contract (r11 #4)


def test_retrain_intent_blocks_appends_and_second_retrain(
    spark, tmp_path
):
    path = str(tmp_path / "idx")
    full = _corpus(spark, 120)
    sim.ivf_write_index(full.where("vec_id < 100"), path,
                        num_centroids=4)
    extra = full.where("vec_id >= 100")

    token = sim._claim_retrain_intent(path)
    with pytest.raises(RuntimeError, match="retrain is in flight"):
        sim.ivf_append_index(extra, path)
    with pytest.raises(RuntimeError, match="retrain is in flight"):
        sim._claim_retrain_intent(path)
    sim._clear_retrain_intent(path, token)
    assert not fsio.exists(fsio.pjoin(path, sim._RETRAIN_INTENT))
    assert sim.ivf_append_index(extra, path) == 20

    # a real retrain releases its claim on success
    sim.ivf_retrain_index(spark, path, num_centroids=4)
    assert not fsio.exists(fsio.pjoin(path, sim._RETRAIN_INTENT))
    assert sim.ivf_append_index(
        _corpus(spark, 140).where("vec_id >= 120"), path
    ) == 20


def test_stale_retrain_intent_is_reclaimed_not_wedging(
    spark, tmp_path
):
    """A crashed retrain's old intent marker must not wedge ingest:
    appenders reclaim a marker older than the staleness window, and a
    new retrain claims over it."""
    path = str(tmp_path / "idx")
    full = _corpus(spark, 120)
    sim.ivf_write_index(full.where("vec_id < 100"), path,
                        num_centroids=4)
    mpath = fsio.pjoin(path, sim._RETRAIN_INTENT)
    fsio.write_json_atomic(
        mpath,
        {"token": "dead", "ts": time.time()
         - sim._RETRAIN_INTENT_STALE_S - 5},
    )
    assert sim.ivf_append_index(
        full.where("vec_id >= 100"), path
    ) == 20
    assert not fsio.exists(mpath)

    # a fresh retrain also claims over a stale marker
    fsio.write_json_atomic(
        mpath,
        {"token": "dead", "ts": time.time()
         - sim._RETRAIN_INTENT_STALE_S - 5},
    )
    info = sim.ivf_retrain_index(spark, path, num_centroids=4)
    assert info["version"] == 0
    assert not fsio.exists(mpath)


def test_failed_retrain_releases_intent(spark, tmp_path, monkeypatch):
    """A retrain that FAILS cleanly (exception, not crash) releases
    its intent marker — nothing is mid-write, the old generation still
    serves, and appends must not be blocked for the stale window."""
    path = str(tmp_path / "idx")
    full = _corpus(spark, 120)
    sim.ivf_write_index(full.where("vec_id < 100"), path,
                        num_centroids=4)

    def boom(*a, **k):
        raise RuntimeError("simulated commit failure")

    monkeypatch.setattr(sim, "_flip_index_pointer", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        sim.ivf_retrain_index(spark, path, num_centroids=4)
    monkeypatch.undo()
    assert not fsio.exists(fsio.pjoin(path, sim._RETRAIN_INTENT))
    assert sim.ivf_append_index(
        full.where("vec_id >= 100"), path
    ) == 20


def test_srp_retrain_intent_contract(spark, tmp_path):
    path = str(tmp_path / "srp")
    full = _corpus(spark, 120)
    sim.srp_write_index(full.where("vec_id < 100"), path,
                        num_planes=3)
    token = sim._claim_retrain_intent(path)
    with pytest.raises(RuntimeError, match="retrain is in flight"):
        sim.srp_append_index(full.where("vec_id >= 100"), path)
    sim._clear_retrain_intent(path, token)
    assert sim.srp_append_index(
        full.where("vec_id >= 100"), path
    ) == 20
    info = sim.srp_retrain_index(spark, path, num_planes=4)
    assert info["version"] == 0
    assert not fsio.exists(fsio.pjoin(path, sim._RETRAIN_INTENT))


# --------------------------------- manifest scoring dtype (r11 #6)


def _adc_plan_mode(df) -> str:
    """Which ADC scoring mode a batch plan compiled to: the decimal
    mode quantizes every query-side table entry through
    DECIMAL(20,12); the double mode keeps raw IEEE literals."""
    s = df._jdf.queryExecution().analyzed().toString()
    return "decimal" if "decimal(20,12)" in s.lower() else "double"


def test_scoring_dtype_precedence_kwarg_manifest_default(
    spark, tmp_path
):
    full = _corpus(spark, 200, dim=16)
    queries = full.where("vec_id < 3")

    # no manifest declaration -> default decimal
    plain = str(tmp_path / "plain")
    sim.ivf_write_index(full, plain, num_centroids=4, pq_m=4)
    assert sim._read_index_params(plain)["scoring_dtype"] is None
    assert _adc_plan_mode(
        sim.ivf_pq_topk_batch_indexed(spark, plain, queries, k=3)
    ) == "decimal"

    # manifest declares double -> kwarg-less reads pick it up
    prod = str(tmp_path / "prod")
    sim.ivf_write_index(
        full, prod, num_centroids=4, pq_m=4, scoring_dtype="double"
    )
    assert sim._read_index_params(prod)["scoring_dtype"] == "double"
    assert _adc_plan_mode(
        sim.ivf_pq_topk_batch_indexed(spark, prod, queries, k=3)
    ) == "double"
    # ... including through the recall probe's adc arm
    assert _adc_plan_mode(
        sim.index_recall_probe(
            spark, prod, k=3, scoring="adc", sample_n=3
        )
    ) == "double"

    # explicit kwarg OUTRANKS the manifest (gate paths unaffected)
    assert _adc_plan_mode(
        sim.ivf_pq_topk_batch_indexed(
            spark, prod, queries, k=3, scoring_dtype="decimal"
        )
    ) == "decimal"

    # retrain carries the declaration into the new generation
    sim.ivf_retrain_index(spark, prod, num_centroids=4)
    assert sim._read_index_params(prod)["scoring_dtype"] == "double"
    assert _adc_plan_mode(
        sim.ivf_pq_topk_batch_indexed(spark, prod, queries, k=3)
    ) == "double"

    with pytest.raises(ValueError, match="scoring_dtype"):
        sim.ivf_write_index(
            full, str(tmp_path / "bad"), num_centroids=4, pq_m=4,
            scoring_dtype="float32",
        )


# ------------------------------- per-row probe ranking (ADVICE r11)


def test_batch_probe_join_path_ranks_per_query_row(
    spark, monkeypatch
):
    """Duplicate query ids must each keep their OWN nprobe budget in
    the K>threshold broadcast-join probe path, exactly like the
    literal path (ADVICE r11: Window.partitionBy(_qid) silently
    merged them)."""
    full = _corpus(spark, 64)
    # two rows with the SAME id but different vectors
    queries = full.where("vec_id in (1, 2)").withColumn(
        "vec_id", F.lit(7)
    )
    cents = sim.ivf_centroids(full, num_centroids=8)

    literal = sorted(
        (r["_qid"], r["_ivf_list"])
        for r in sim._batch_query_probes(
            queries, cents, "vec_id", "embedding", nprobe=2
        ).collect()
    )
    monkeypatch.setattr(sim, "_PROBE_LITERAL_MAX_K", 0)
    join_form = sorted(
        (r["_qid"], r["_ivf_list"])
        for r in sim._batch_query_probes(
            queries, cents, "vec_id", "embedding", nprobe=2
        ).collect()
    )
    # each of the 2 rows expands to its own 2 probes in BOTH forms
    assert len(literal) == 4
    assert join_form == literal


def test_cross_process_retrain_visible_to_serving_session(
    spark, tmp_path
):
    """The production deployment shape: a long-lived SERVING driver
    and a separate offline RETRAIN job (different process, own
    SparkSession). The serving session must pick up the retrain at
    its next plan — generation resolution is live (never memoized),
    the new generation is a new path (so the artifact memo cannot
    serve stale), and the commit marker written by the other process
    is the only coordination."""
    import subprocess
    import sys
    import textwrap

    path = str(tmp_path / "idx")
    full = _corpus(spark, 200)
    sim.ivf_write_index(full, path, num_centroids=4, pq_m=4)

    # serve once in THIS session (warms the artifact memo on the
    # flat layout — the stale-serve hazard the test exists for)
    queries = full.where("vec_id < 3")
    before = sim.ivf_pq_topk_batch_indexed(
        spark, path, queries, k=3, nprobe=2, scoring_dtype="decimal"
    ).collect()
    assert before and sim._read_index_version(path) is None

    # retrain from a DIFFERENT process with its own SparkSession
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repo_root!r})
        from tinyflux_spark.schema import get_spark
        from tinyflux_spark.operators import similarity as sim
        spark = get_spark("retrain_job", cpus="2")
        info = sim.ivf_retrain_index(spark, {path!r}, num_centroids=8)
        assert info["version"] == 0, info
        print("RETRAIN_OK", info["num_centroids"])
    """)
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert "RETRAIN_OK 8" in res.stdout, res.stdout + res.stderr

    # the serving session resolves the OTHER process's commit at its
    # next plan: new generation, new K, fresh (uncached) artifacts
    assert sim._read_index_version(path) == 0
    assert len(sim.ivf_read_codebook(path)) == 8
    after = sim.ivf_pq_topk_batch_indexed(
        spark, path, queries, k=3, nprobe=2, scoring_dtype="decimal"
    ).collect()
    assert len(after) == len(before)
