"""Structured Streaming ingestion and streaming operators.

The reference's "streaming" is high-frequency appends — an MQTT consumer
buffering messages on a queue.Queue and inserting from a writer thread
(reference examples/3_iot_datastore_with_mqtt.py:1-120); out-of-order
arrivals just invalidate its index (reference database.py:1280-1287).
The Spark-native equivalent is a real streaming pipeline:

    readStream (file/kafka/socket/rate) → canonical Point schema →
    writeStream.foreachBatch(storage.append_df)

* Out-of-order policy matches the reference by default: accept
  everything (parquet stats don't need global order, so disorder costs
  nothing here, unlike the reference's index invalidation). An optional
  watermark turns on bounded-lateness dropping *(extension)*.
* ``foreachBatch`` gives per-micro-batch atomic appends through the same
  manifest-stamped ``_seq`` path as batch inserts, so insertion-order
  APIs keep working across the batch/stream boundary.
* Windowed rollups / streaming dedup are thin factories over
  ``withWatermark`` + ``window()`` / ``dropDuplicates`` — the operators
  a TinyFlux user upgrades to when one process stops being enough.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fsio
from ..storages import Storage


def _hadoop_path(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _write_json_atomic(spark: SparkSession, path: str, obj: dict) -> None:
    """Write a small JSON marker/manifest file ATOMICALLY: stage the
    bytes under a dot-prefixed temp name in the same directory, then
    ``fs.rename`` into place — rename is atomic on HDFS and the local
    FS, so a concurrent reader sees the old content or the new, never
    a truncated file. A direct ``fs.create`` over the final name is
    NOT crash-safe: a crash mid-write leaves a file that EXISTS but
    doesn't parse, and every committed-marker predicate of the form
    "exists(_folded.json)" then raises ``JSONDecodeError`` forever
    (ADVICE r10 medium — a wedged ``_compact_state_dir`` manifest).
    With staging, a mid-write crash leaves only an invisible
    dot-prefixed temp; the marker is absent, which every reader
    already interprets correctly (version uncommitted / no intent).

    The pre-rename delete of an existing target (HDFS rename refuses
    to clobber) opens a tiny absent-marker window; every caller's
    absent-interpretation is safe: high-water marker absent → batch
    treated as undelivered → the crash probe re-decides; _folded.json
    absent → fold uncommitted → readers use the previous base ∪ live
    files, whose rows the not-yet-finalized fold never deleted.

    Implementation lives in :func:`tinyflux_spark.fsio.
    write_json_atomic` (r12: the persisted-index metadata layer moved
    onto the same Hadoop-FS choke point); this wrapper keeps the
    streaming module's established ``(spark, path, obj)`` signature.
    A slash-less bare filename raises a descriptive error there
    (ADVICE r11) — this helper is the single choke point for every
    marker/manifest write."""
    fsio.write_json_atomic(path, obj, spark)


def _write_params_manifest(
    spark: SparkSession, dir_path: str, params: dict
) -> None:
    """Stamp the build parameters next to persisted streaming state.

    The underscore-prefixed name keeps the file invisible to parquet
    directory scans (same convention as ``_SUCCESS``). Written through
    the Hadoop FS API so any supported scheme (local, HDFS, s3a)
    works; staged + renamed so a crash can't leave a truncated
    manifest (:func:`_write_json_atomic`)."""
    _write_json_atomic(spark, dir_path + "/_params.json", params)


class _MissingManifestError(ValueError):
    """State dir exists but carries no ``_params.json`` manifest.

    Distinct from ``ValueError`` so :func:`_check_params_manifest`
    can rewrap ONLY the missing-manifest case: ``json.JSONDecodeError``
    also subclasses ``ValueError``, and a corrupt/truncated manifest
    must surface as a parse error, not be misreported as absent."""


def _read_params_manifest(spark: SparkSession, dir_path: str) -> dict:
    """Read a ``_params.json`` manifest through the Hadoop FS API (so
    any supported scheme works — ``spark.read.text`` can't: Spark's
    hidden-file filter drops underscore-prefixed files even when named
    explicitly). The byte-at-a-time py4j loop is fine: manifests are
    ~100 bytes by construction."""
    fs, mpath = _hadoop_path(spark, dir_path + "/_params.json")
    if not fs.exists(mpath):
        raise _MissingManifestError(
            f"no _params.json manifest at {dir_path!r}; the state "
            "predates manifest stamping or was built by other means — "
            "delete it (or rebuild through this function) before reuse"
        )
    return json.loads(_read_small_file(fs, mpath).decode("utf-8"))


def _check_params_manifest(
    spark: SparkSession, dir_path: str, params: dict, what: str
) -> None:
    """Refuse to reuse persisted state built with different parameters.

    A restart that silently reused signatures/codebooks built with a
    different n/num_hashes/bands/unit (or embed_dim/num_clusters)
    would emit wrong pairs with no error — the manifest turns that
    into a loud ValueError at start()."""
    try:
        stored = _read_params_manifest(spark, dir_path)
    except _MissingManifestError:
        raise ValueError(
            f"{what} at {dir_path!r} has no _params.json manifest; it "
            "predates manifest stamping or was built by other means — "
            "delete it (or rebuild through this function) before reuse"
        )
    if stored != params:
        raise ValueError(
            f"{what} at {dir_path!r} was built with {stored}, but this "
            f"run asks for {params}; reusing it would emit wrong pairs "
            "— delete the state or pass matching parameters"
        )


def _checkpoint_query_lineage(
    spark: SparkSession, checkpoint_dir: Optional[str]
) -> str:
    """Lineage token identifying ONE streaming query incarnation.

    The replay guard in :func:`_fold_quantile_sketch_batch` compares
    batch ids only within the same lineage, so the token must change
    exactly when foreachBatch's epoch numbering restarts at 0 — i.e.
    with every FRESH checkpoint. The checkpoint path string is wrong
    for that (a deleted-and-recreated checkpoint at the same path, or
    two no-checkpoint runs, reuse the token while numbering restarts,
    so the guard would skip the new run's first batches as
    redeliveries — silent data loss). Instead read the query id Spark
    persists in ``<checkpoint>/metadata`` at query start: stable
    across RESUMES of the same checkpoint (numbering continues),
    regenerated when the checkpoint is fresh (numbering restarts).
    Call AFTER ``start()`` has created the metadata file — the sinks
    resolve it lazily on their first batch. With no checkpoint at all
    every run is its own lineage: a per-run UUID."""
    import uuid

    if not checkpoint_dir:
        return "run-" + uuid.uuid4().hex
    fs, mpath = _hadoop_path(spark, checkpoint_dir + "/metadata")
    if not fs.exists(mpath):
        # Defensive: Spark writes metadata before the first batch, so
        # a sink never lands here; treat as a fresh incarnation.
        return "run-" + uuid.uuid4().hex
    meta = json.loads(_read_small_file(fs, mpath).decode("utf-8"))
    return "query-" + str(meta["id"])


def _reset_stale_result_epochs(
    spark: SparkSession, result_path: str, checkpoint_dir
) -> None:
    """Wipe ``epoch=N`` dirs left by a PRIOR run when this run's
    checkpoint lineage is fresh.

    The per-epoch overwrite sinks key their directories on
    foreachBatch's epoch id, which restarts at 0 with a fresh
    checkpoint — so a re-run against an existing ``result_path`` with
    a new checkpoint would overwrite only the low epochs and leave a
    prior run's higher-numbered dirs mixing stale pairs into
    ``spark.read.parquet(result_path)``. A RESUMED checkpoint (its
    ``offsets`` log has entries) keeps every dir: epoch numbering
    continues and earlier epochs are this very run's committed
    output."""
    fs, jroot = _hadoop_path(spark, result_path)
    if not fs.exists(jroot):
        return
    if checkpoint_dir:
        ofs, opath = _hadoop_path(spark, checkpoint_dir + "/offsets")
        if ofs.exists(opath) and len(ofs.listStatus(opath)) > 0:
            return  # resumed lineage: numbering continues
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if name.startswith("epoch=") or name == "_base":
            fs.delete(st.getPath(), True)


def _read_small_file(fs, jpath) -> bytes:
    """Whole-file read of a tiny file through the Hadoop FS API in ONE
    JVM call (``IOUtils.toByteArray`` — the fsio recipe; a per-byte
    py4j loop costs one RPC per byte, which a per-batch marker read
    pays on every epoch). spark.read.text can't do this: Spark's
    hidden-file filter drops underscore-prefixed files even when named
    explicitly."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    stream = fs.open(jpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream
        )
    finally:
        stream.close()
    return bytes(data)


def _latest_committed_base(spark: SparkSession, result_path: str):
    """Newest committed compaction of a pair-result dir: the largest
    ``_base/v=V`` holding BOTH ``_SUCCESS`` and ``_folded.json``.
    Returns ``(version, folded_through)`` or ``(None, -1)``."""
    fs, jbase = _hadoop_path(spark, result_path + "/_base")
    if not fs.exists(jbase):
        return None, -1
    best, folded = None, -1
    for st in fs.listStatus(jbase):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        v = int(name.split("=", 1)[1])
        vdir = f"{result_path}/_base/v={v}"
        _, jsucc = _hadoop_path(spark, vdir + "/_SUCCESS")
        _, jman = _hadoop_path(spark, vdir + "/_folded.json")
        if not (fs.exists(jsucc) and fs.exists(jman)):
            continue
        try:
            f = int(
                json.loads(_read_small_file(fs, jman).decode())[
                    "folded_through"
                ]
            )
        except (ValueError, KeyError):
            # Unparseable manifest = uncommitted version (belt to the
            # atomic staged write — pre-fix folds may have left one).
            continue
        if best is None or v > best:
            best, folded = v, f
    return best, folded


def _committed_epoch_ids(spark: SparkSession, result_path: str):
    """Sorted ids of ``epoch=N`` dirs holding a ``_SUCCESS`` marker."""
    fs, jroot = _hadoop_path(spark, result_path)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not name.startswith("epoch="):
            continue
        e = int(name.split("=", 1)[1])
        _, jsucc = _hadoop_path(
            spark, f"{result_path}/epoch={e}/_SUCCESS"
        )
        if fs.exists(jsucc):
            out.append(e)
    return sorted(out)


def _state_live_files(spark: SparkSession, d: str):
    """Data files currently in a flat append-state dir (sig/ docs/):
    non-hidden regular files — parquet part files, not markers."""
    fs, jd = _hadoop_path(spark, d)
    if not fs.exists(jd):
        return []
    out = []
    for st in fs.listStatus(jd):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append(str(st.getPath()))
    return sorted(out)


def _latest_committed_state_base(
    spark: SparkSession, state_path: str, sub: str
):
    """Newest committed fold of an append-state dir: the largest
    ``<sub>_base/v=V`` holding BOTH ``_SUCCESS`` and ``_folded.json``.
    Returns ``(version, folded_file_basenames)`` or ``(None, set())``."""
    root = f"{state_path}/{sub}_base"
    fs, jbase = _hadoop_path(spark, root)
    if not fs.exists(jbase):
        return None, set()
    best, files = None, set()
    for st in fs.listStatus(jbase):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        v = int(name.split("=", 1)[1])
        vdir = f"{root}/v={v}"
        _, jsucc = _hadoop_path(spark, vdir + "/_SUCCESS")
        _, jman = _hadoop_path(spark, vdir + "/_folded.json")
        if not (fs.exists(jsucc) and fs.exists(jman)):
            continue
        try:
            f = set(
                json.loads(_read_small_file(fs, jman).decode())["files"]
            )
        except (ValueError, KeyError):
            # Unparseable manifest = uncommitted version (belt to the
            # atomic staged write — pre-fix folds may have left one).
            continue
        if best is None or v > best:
            best, files = v, f
    return best, files


def _read_state_dir(
    spark: SparkSession, state_path: str, sub: str
) -> DataFrame:
    """The standing contents of a compactable append-state dir:
    newest committed ``<sub>_base/v=V`` plus the live append files
    NOT yet folded into it (a crash between base-commit and
    live-file delete leaves folded files lingering — the manifest's
    basename list masks them, so nothing reads double)."""
    base_v, folded_files = _latest_committed_state_base(
        spark, state_path, sub
    )
    parts = []
    if base_v is not None:
        parts.append(
            spark.read.parquet(f"{state_path}/{sub}_base/v={base_v}")
        )
    live = [
        f
        for f in _state_live_files(spark, f"{state_path}/{sub}")
        if f.rsplit("/", 1)[-1] not in folded_files
    ]
    if live:
        parts.append(spark.read.parquet(*live))
    if not parts:
        raise ValueError(
            f"state dir {state_path}/{sub} has no data files"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _state_dir_exists(
    spark: SparkSession, state_path: str, sub: str
) -> bool:
    base_v, _ = _latest_committed_state_base(spark, state_path, sub)
    if base_v is not None:
        return True
    return bool(_state_live_files(spark, f"{state_path}/{sub}"))


def _compact_state_dir(
    spark: SparkSession,
    state_path: str,
    sub: str,
    distinct: bool = False,
) -> None:
    """Fold an append-state dir's live files into a new versioned
    base — the bounded-retention treatment the RESULT sinks got in
    round 9 (``_write_epoch_result``), applied to the self-dedup
    ``sig/``/``docs/`` state: without it a long-lived stream grows
    one parquet job's files per epoch forever. Single writer (the
    sink's own contract), so the listing is stable while folding.

    Protocol, crash-safe at every step: (1) GC live files the newest
    committed base already folded (leftovers of an interrupted
    delete — readers mask them by manifest, the dirs linger);
    (2) read base ∪ remaining live files, ``distinct()`` when asked
    (sig rows duplicated by a crash-retry re-append collapse here);
    (3) overwrite ``<sub>_base/v=V+1`` — invisible until BOTH
    ``_SUCCESS`` and the ``_folded.json`` manifest (the folded live
    files' basenames) exist; the manifest is staged + renamed
    (:func:`_write_json_atomic`) so a crash mid-write can't leave a
    truncated-but-present file that wedges every later read;
    (4) only then delete the folded live
    files and the superseded older bases (their rows are in V)."""
    fs, _ = _hadoop_path(spark, state_path)
    base_v, folded_files = _latest_committed_state_base(
        spark, state_path, sub
    )
    live_all = _state_live_files(spark, f"{state_path}/{sub}")
    for f in live_all:
        if f.rsplit("/", 1)[-1] in folded_files:
            fs.delete(_hadoop_path(spark, f)[1], False)
    live = [
        f
        for f in live_all
        if f.rsplit("/", 1)[-1] not in folded_files
    ]
    if not live:
        return
    merged = spark.read.parquet(*live)
    if base_v is not None:
        merged = merged.unionByName(
            spark.read.parquet(f"{state_path}/{sub}_base/v={base_v}")
        )
    if distinct:
        merged = merged.distinct()
    new_v = 0 if base_v is None else base_v + 1
    new_dir = f"{state_path}/{sub}_base/v={new_v}"
    merged.write.mode("overwrite").parquet(new_dir)
    _write_json_atomic(
        spark,
        new_dir + "/_folded.json",
        {"files": [f.rsplit("/", 1)[-1] for f in live]},
    )
    for f in live:
        fs.delete(_hadoop_path(spark, f)[1], False)
    jbase = _hadoop_path(spark, f"{state_path}/{sub}_base")[1]
    for st in fs.listStatus(jbase):
        name = st.getPath().getName()
        if name.startswith("v=") and int(name.split("=", 1)[1]) < new_v:
            fs.delete(st.getPath(), True)


def _write_epoch_result(
    pairs: DataFrame,
    result_path: str,
    epoch_id: int,
    compact_every,
) -> None:
    """The shared result-sink step of the streaming dedup pipelines:
    idempotent per-epoch overwrite, plus — when ``compact_every`` is
    set — bounded-retention COMPACTION so a long-lived single-lineage
    stream doesn't grow one directory per micro-batch forever.

    Compaction folds every SETTLED epoch (committed, below the one
    just written — the current epoch may still be redelivered) into a
    versioned ``_base/v=V`` dir once ``compact_every`` of them
    accumulate: new base = old base ∪ folded epochs, committed by the
    parquet ``_SUCCESS`` plus a ``_folded.json`` manifest recording
    the highest folded epoch id, THEN the folded epoch dirs and bases
    older than V-1 are deleted. Readers (:func:`read_stream_pairs`)
    take the newest committed base and only epochs ABOVE its
    folded_through, so a crash at any point between those steps shows
    each pair exactly once — a half-written base lacks its manifest
    and is invisible; a written base with undeleted epochs masks them
    via folded_through (the next compaction GCs the leftovers).
    ``_base`` is underscore-prefixed: invisible to a plain
    ``spark.read.parquet(result_path)``, which is why compaction is
    opt-in — with it on, read through :func:`read_stream_pairs`."""
    spark = pairs.sparkSession
    pairs.write.mode("overwrite").parquet(
        f"{result_path}/epoch={epoch_id}"
    )
    if not compact_every:
        return
    if compact_every < 2:
        raise ValueError("compact_every must be >= 2")
    fs, jroot = _hadoop_path(spark, result_path)
    base_v, folded = _latest_committed_base(spark, result_path)
    epochs = _committed_epoch_ids(spark, result_path)
    # GC epochs already folded by an earlier (possibly interrupted)
    # compaction — readers ignore them, but the dirs linger.
    for e in epochs:
        if e <= folded:
            fs.delete(
                _hadoop_path(spark, f"{result_path}/epoch={e}")[1], True
            )
    live = [e for e in epochs if folded < e < epoch_id]
    if len(live) < compact_every:
        return
    fold_through = max(live)
    parts = [
        spark.read.parquet(f"{result_path}/epoch={e}") for e in live
    ]
    if base_v is not None:
        parts.append(
            spark.read.parquet(f"{result_path}/_base/v={base_v}")
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    new_v = 0 if base_v is None else base_v + 1
    new_dir = f"{result_path}/_base/v={new_v}"
    merged.write.mode("overwrite").parquet(new_dir)
    _write_json_atomic(
        spark,
        new_dir + "/_folded.json",
        {"folded_through": fold_through},
    )
    # Only after the new base committed: drop the folded epochs and
    # bases older than the predecessor (one version of headroom).
    for e in live:
        fs.delete(
            _hadoop_path(spark, f"{result_path}/epoch={e}")[1], True
        )
    jbase = _hadoop_path(spark, result_path + "/_base")[1]
    for st in fs.listStatus(jbase):
        name = st.getPath().getName()
        if name.startswith("v=") and int(name.split("=", 1)[1]) < new_v - 1:
            fs.delete(st.getPath(), True)


def read_stream_pairs(spark: SparkSession, result_path: str) -> DataFrame:
    """Read the standing pair results of a streaming dedup sink
    (:func:`stream_near_dup_insert` / :func:`stream_semantic_dedup_insert`)
    regardless of whether compaction has run: the newest committed
    ``_base/v=V`` plus every committed ``epoch=N`` dir ABOVE its
    folded_through — each pair exactly once, whatever instant a crash
    froze the layout at. Without compaction this is just the union of
    the epoch dirs (``spark.read.parquet(result_path)`` minus the
    bookkeeping partition column)."""
    base_v, folded = _latest_committed_base(spark, result_path)
    paths = []
    if base_v is not None:
        paths.append(f"{result_path}/_base/v={base_v}")
    paths.extend(
        f"{result_path}/epoch={e}"
        for e in _committed_epoch_ids(spark, result_path)
        if e > folded
    )
    if not paths:
        raise ValueError(
            f"no committed pair results at {result_path!r}"
        )
    out = spark.read.parquet(paths[0])
    for p in paths[1:]:
        out = out.unionByName(spark.read.parquet(p))
    return out


def point_stream_from_files(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    path_glob: Optional[str] = None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream (the smoke-testable source; swap for kafka in
    production — the downstream pipeline is identical)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_insert(
    storage: Storage,
    points_stream: DataFrame,
    watermark: Optional[str] = None,
    ts_col: str = "time",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
    compact_every_n_batches: Optional[int] = 32,
):
    """Append a canonical-schema stream into a storage backend.

    Returns the StreamingQuery. With ``watermark`` set, late rows beyond
    the bound are dropped (extension); default accepts all disorder
    (reference semantics).

    ``compact_every_n_batches``: every Nth micro-batch ends with a
    ``storage.compact()`` — without it a long-running ingest writes one
    parquet file per micro-batch per touched partition forever, and the
    per-file open/footer cost eventually dominates scans (the reference
    hits the same fragmentation in its MQTT append loop,
    examples/3_iot_datastore_with_mqtt.py, and sidesteps it only by
    being a single CSV file). Compaction is partition-scoped and
    staged-swap, so it is safe to run inline between batches; set
    ``None`` to manage compaction externally.
    """
    df = points_stream
    if watermark:
        df = df.withWatermark(ts_col, watermark)

    can_compact = hasattr(storage, "compact")
    n_every = compact_every_n_batches
    seen = {"batches": 0}
    touched: set = set()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        storage.append_df(batch_df)
        if can_compact and n_every:
            # The storage records which (measurement, pdate) partitions
            # the publish touched; compaction scopes itself to exactly
            # the partitions fresh ingest fragmented — its cost tracks
            # the ingest window, NOT total store history (an unscoped
            # compact would rewrite a year of cold data to merge one
            # day of new files).
            touched.update(getattr(storage, "last_touched", ()) or ())
            seen["batches"] += 1
            if seen["batches"] % int(n_every) == 0 and touched:
                by_m: dict = {}
                for m, d in touched:
                    lo, hi = by_m.get(m, (d, d))
                    by_m[m] = (min(lo, d), max(hi, d))
                for m, (lo, hi) in sorted(by_m.items()):
                    storage.compact(m, date_range=(lo, hi))
                touched.clear()

    writer = df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    agg_exprs: Sequence,
    group_cols: Sequence[str] = (),
    slide: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming tumbling/sliding window aggregation.

    With a watermark the query can run in append mode with bounded
    state; without one, use complete/update output modes.
    """
    df = stream
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return df.groupBy(w.alias("window"), *group_cols).agg(*agg_exprs)


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-duplicate suppression within the watermark horizon
    (state bounded by the watermark — required at scale; unbounded
    dropDuplicates state would grow forever)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*keys, ts_col]
    )


def run_to_memory(
    result: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: int = 300,
    shuffle_partitions: Optional[int] = None,
) -> None:
    """Execute a finite (availableNow) streaming query into an in-memory
    table synchronously — the local smoke path for streaming plans.

    ``shuffle_partitions`` temporarily overrides
    ``spark.sql.shuffle.partitions`` around the run (restored after):
    each shuffle partition of a stateful query is a separate state-store
    instance with per-micro-batch snapshot/commit overhead, so a finite
    smoke run over a handful of keys wants far fewer than a cluster's
    default. A query still active at ``timeout_sec`` is stopped and
    raised as an error — a silent partial result must never look like
    success."""
    spark = result.sparkSession
    prev = (
        spark.conf.get("spark.sql.shuffle.partitions")
        if shuffle_partitions is not None
        else None
    )
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            result.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.exception() is not None:
            raise q.exception()
        if q.isActive:
            q.stop()
            raise TimeoutError(
                f"streaming query {query_name!r} still active after "
                f"{timeout_sec}s (stopped)"
            )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def session_rollup(
    stream_df: DataFrame,
    key_col: str,
    time_col: str = "time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based session aggregation via ``session_window``.

    State per open session is bounded by the watermark: sessions close
    (and emit) once the watermark passes their end + gap. The batch
    equivalent (identical session boundaries) is
    operators.aggregates.sessionize.
    """
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def stateful_ewma(
    stream: DataFrame,
    key_col: str,
    time_col: str = "time",
    value_col: str = "value",
    alpha: float = 0.3,
    state_ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Custom stateful streaming operator: per-key running EWMA and
    deviation via ``applyInPandasWithState``.

    The (count, ewma) state per key persists across micro-batches in
    the state store. This is the extension point the built-in
    window/dedup operators can't express: an arbitrary per-key
    recurrence over an unbounded stream. Batch twin (identical math):
    operators.aggregates.ewma_running.

    ``state_ttl_minutes`` arms a processing-time timeout that reclaims
    idle keys — set it on continuous deployments so state stays bounded.
    Leave it ``None`` for finite (availableNow) runs: pending
    processing-time timers keep an availableNow query alive waiting for
    a trigger that never comes, so the query only returns at the caller's
    timeout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        f"{key_col} string, {time_col} timestamp, "
        f"{value_col} double, ewma double, dev double"
    )
    state_schema = "cnt long, ewma double"

    with_ttl = state_ttl_minutes is not None

    def fn(key, pdfs, state: GroupState):
        if with_ttl and state.hasTimedOut:
            state.remove()
            return
        cnt, ew = state.get if state.exists else (0, 0.0)
        rows = []
        # applyInPandasWithState hands a key's micro-batch rows as
        # MULTIPLE Arrow chunks once they exceed
        # spark.sql.execution.arrow.maxRecordsPerBatch — sorting each
        # chunk independently would not give a globally time-ordered
        # fold, so concatenate first and sort ONCE.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                time_col
            )
            for t, v in zip(pdf[time_col], pdf[value_col]):
                v = float(v)
                ew = v if cnt == 0 else alpha * v + (1 - alpha) * ew
                cnt += 1
                rows.append((str(key[0]), t, v, ew, abs(v - ew)))
        state.update((cnt, ew))
        if with_ttl:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            rows,
            columns=[key_col, time_col, value_col, "ewma", "dev"],
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if with_ttl
        else GroupStateTimeout.NoTimeout,
    )


def stateful_holt(
    stream: DataFrame,
    key_col: str,
    time_col: str = "time",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    state_ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Per-key running Holt double-exponential smoothing over an
    unbounded stream — :func:`stateful_ewma`'s forecasting sibling
    and the streaming twin of ``operators.aggregates.holt_last``
    (identical recurrence: l_0 = v_0, b_0 = 0; l = a·v + (1-a)(l+b);
    b = B(l - l_prev) + (1-B)b). Emits one row per event:
    ``(key, time, value, level, trend, forecast)`` with ``forecast =
    level + trend`` — the one-step-ahead prediction a metrics
    pipeline compares the NEXT reading against.

    The (count, level, trend) state per key persists in the state
    store across micro-batches; state is O(1) per key at any history.
    Rows are folded in (time, value) order within each batch; the
    stream == batch equality assumes per-key arrivals are
    time-ordered across batches (the q36 contract).
    ``state_ttl_minutes`` reclaims idle keys on continuous
    deployments; leave ``None`` for finite (availableNow) runs.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        f"{key_col} string, {time_col} timestamp, "
        f"{value_col} double, level double, trend double, "
        "forecast double"
    )
    state_schema = "cnt long, l double, b double"
    with_ttl = state_ttl_minutes is not None

    def fn(key, pdfs, state: GroupState):
        if with_ttl and state.hasTimedOut:
            state.remove()
            return
        cnt, l, b = state.get if state.exists else (0, 0.0, 0.0)
        rows = []
        # Same multi-chunk contract as stateful_ewma: one global sort
        # over the key's whole micro-batch, not per Arrow chunk.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [time_col, value_col]
            )
            for t, v in zip(pdf[time_col], pdf[value_col]):
                v = float(v)
                if cnt == 0:
                    l, b = v, 0.0
                else:
                    nl = alpha * v + (1.0 - alpha) * (l + b)
                    b = beta * (nl - l) + (1.0 - beta) * b
                    l = nl
                cnt += 1
                rows.append((str(key[0]), t, v, l, b, l + b))
        state.update((cnt, l, b))
        if with_ttl:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            rows,
            columns=[
                key_col, time_col, value_col,
                "level", "trend", "forecast",
            ],
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if with_ttl
        else GroupStateTimeout.NoTimeout,
    )


def stateful_holt_winters(
    stream: DataFrame,
    key_col: str,
    time_col: str = "time",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    period: int = 4,
    phi: float = 1.0,
    state_ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Per-key running additive Holt-Winters (level + trend +
    seasonal, period ``m``) over an unbounded stream —
    :func:`stateful_holt`'s seasonal completion and the streaming
    twin of ``operators.aggregates.holt_winters_last`` (identical
    recurrence AND identical first-season initialization: the first
    m values buffer, then seed ``l = mean, b = 0, s_j = v_j - l``;
    identical Gardner-McKenzie trend damping — ``phi`` in (0, 1]
    shrinks the carried trend ``phi*b`` at every step, and the
    default ``phi=1.0`` is bit-exactly the undamped recurrence).
    Emits one row per event: ``(key, time, value, level, trend,
    forecast)`` with ``forecast = level + phi*trend + s_next`` (the
    seasonal one-step-ahead prediction); warm-up rows (before one
    full season has arrived) emit NULL level/trend/forecast — the
    state is not yet defined, and a placeholder would alias a real
    forecast.

    State per key is ``(cnt, l, b, s[m], buf)`` — O(period), not
    O(history). Rows fold in (time, value) order over the whole
    micro-batch (chunks concatenated first — the stateful_ewma
    contract); stream == batch equality assumes per-key arrivals are
    time-ordered across batches. ``state_ttl_minutes`` reclaims idle
    keys on continuous deployments."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    if period < 2:
        raise ValueError("stateful_holt_winters: period must be >= 2")
    if not (0.0 < phi <= 1.0):
        raise ValueError(
            "stateful_holt_winters: phi must be in (0, 1]"
        )
    m = int(period)
    out_schema = (
        f"{key_col} string, {time_col} timestamp, "
        f"{value_col} double, level double, trend double, "
        "forecast double"
    )
    state_schema = (
        "cnt long, l double, b double, "
        "s array<double>, buf array<double>"
    )
    with_ttl = state_ttl_minutes is not None

    def fn(key, pdfs, state: GroupState):
        if with_ttl and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cnt, l, b, s, buf = state.get
            s = list(s)
            buf = list(buf)
        else:
            cnt, l, b, s, buf = 0, None, None, [], []
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [time_col, value_col]
            )
            for t, v in zip(pdf[time_col], pdf[value_col]):
                v = float(v)
                if cnt < m - 1:
                    buf.append(v)
                    rows.append(
                        (str(key[0]), t, v, None, None, None)
                    )
                elif cnt == m - 1:
                    buf.append(v)
                    acc = 0.0
                    for x in buf:
                        acc = acc + x
                    l = acc / m
                    b = 0.0
                    s = [x - l for x in buf]
                    buf = []
                    rows.append(
                        (str(key[0]), t, v, l, b,
                         l + (phi * b) + s[m % m])
                    )
                else:
                    lag = s[cnt % m]
                    # phi*b as an explicit product — the batch fold's
                    # convention (1.0*b == b exactly at phi=1.0)
                    phb = phi * b
                    nl = alpha * (v - lag) + (1.0 - alpha) * (l + phb)
                    b = beta * (nl - l) + (1.0 - beta) * phb
                    s[cnt % m] = gamma * (v - nl) + (1.0 - gamma) * lag
                    l = nl
                    rows.append(
                        (
                            str(key[0]), t, v, l, b,
                            l + (phi * b) + s[(cnt + 1) % m],
                        )
                    )
                cnt += 1
        state.update((cnt, l, b, s, buf))
        if with_ttl:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            rows,
            columns=[
                key_col, time_col, value_col,
                "level", "trend", "forecast",
            ],
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if with_ttl
        else GroupStateTimeout.NoTimeout,
    )


def stream_near_dup_insert(
    docs_stream: DataFrame,
    corpus: DataFrame,
    result_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    verify_threshold: float = 0.5,
    unit: str = "word",
    signatures_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
    compact_every: Optional[int] = None,
):
    """Streaming near-duplicate detection: every micro-batch of an
    ingest stream is checked against an EXISTING corpus via the
    asymmetric MinHash-LSH join, and the flagged ``(id_left,
    id_right, jaccard)`` pairs append to ``result_path`` — the
    end-to-end incremental-ingest dedup story (the batch form is
    ``operators.dedup.minhash_lsh_join``; corpus-side semantics are
    identical, verified stream-vs-batch in tests).

    The corpus's banded signature table is computed ONCE, before the
    stream starts — persisted at ``signatures_path`` if given (and
    REUSED if already present there: at 100 TB the signature build is
    the expensive pass, and it survives stream restarts; a
    ``_params.json`` manifest is stamped on first build and validated
    on reuse, so a restart with different n/num_hashes/bands/unit
    raises instead of silently joining against stale signatures),
    else localCheckpoint-materialized for the lifetime of this query.
    Each micro-batch then costs: shingle+hash the batch (small), one
    band equi-join against the persisted signatures, and an
    exact-Jaccard verify that re-reads only the candidate corpus docs
    (minhash_lsh_join's ``right_banded`` path) — never a full corpus
    re-scan, so per-batch latency tracks batch size, not corpus size.

    Ids must be unique across stream ∪ corpus (the usual ingest
    contract). Each micro-batch OVERWRITES its own ``epoch=N``
    partition directory under ``result_path`` — foreachBatch is
    at-least-once, and the per-epoch overwrite makes a retried batch
    idempotent instead of appending duplicate pairs. Read the result
    with ``spark.read.parquet(result_path)`` and project the pair
    columns (the discovered ``epoch`` partition column is bookkeeping).
    Epoch numbering restarts at 0 with a fresh checkpoint, so starting
    a NEW lineage against an existing ``result_path`` first wipes the
    prior run's epoch dirs (a resumed checkpoint keeps them — they are
    this lineage's own committed output).

    A long-lived single-lineage stream grows one epoch dir per
    micro-batch; ``compact_every=c`` bounds that by folding settled
    epochs into a ``_SUCCESS``-gated ``_base/v=V`` dir once c of them
    accumulate (:func:`_write_epoch_result` — pairs unchanged,
    crash-safe at every step). With compaction on, read through
    :func:`read_stream_pairs` (``_base`` is underscore-prefixed, so a
    plain directory read would miss the folded pairs).
    """
    from ..operators.dedup import banded_signatures, minhash_lsh_join

    spark = corpus.sparkSession
    _reset_stale_result_epochs(spark, result_path, checkpoint_dir)
    kw = dict(text_col=text_col, n=n, num_hashes=num_hashes,
              bands=bands, unit=unit)
    if signatures_path is not None:
        # Hadoop FS existence probe (works for any supported scheme —
        # local, HDFS, s3a) instead of a speculative read: a missing
        # path would log a noisy ERROR stack trace even when caught.
        fs, jpath = _hadoop_path(spark, signatures_path)
        sig_params = {"kind": "minhash_banded_signatures", **kw}
        if not fs.exists(jpath):
            banded_signatures(corpus, id_col, **kw).write.mode(
                "overwrite"
            ).parquet(signatures_path)
            _write_params_manifest(spark, signatures_path, sig_params)
        else:
            _check_params_manifest(
                spark, signatures_path, sig_params,
                "persisted signature table",
            )
        sig = spark.read.parquet(signatures_path)
    else:
        sig = banded_signatures(corpus, id_col, **kw).localCheckpoint()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = minhash_lsh_join(
            batch_df, corpus, id_col,
            verify_threshold=verify_threshold,
            right_banded=sig, **kw,
        )
        # Per-epoch overwrite, not blind append: foreachBatch is
        # at-least-once, so a retried micro-batch must land in the
        # same epoch=N directory idempotently; compaction (if on)
        # folds settled epochs into the bounded _base.
        _write_epoch_result(pairs, result_path, epoch_id, compact_every)

    writer = (
        docs_stream.writeStream.foreachBatch(sink).outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _self_dedup_batch_already_appended(
    spark: SparkSession, state_path: str, batch_df: DataFrame,
    id_col: str,
) -> bool:
    """Crash-recovery probe for :func:`stream_self_dedup_insert`: did
    the interrupted previous attempt's state append commit? Same
    argument as the IVF probe — the parquet job commit is atomic and
    ids are unique across the stream's history, so any batch id
    present in the docs state ⇔ the whole append committed."""
    sample = [r[0] for r in batch_df.select(id_col).limit(5).collect()]
    if not sample:
        return True
    if not _state_dir_exists(spark, state_path, "docs"):
        return False
    existing = _read_state_dir(spark, state_path, "docs")
    return existing.where(F.col("id").isin(sample)).limit(1).count() > 0


def stream_self_dedup_insert(
    docs_stream: DataFrame,
    corpus: DataFrame,
    result_path: str,
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    verify_threshold: float = 0.5,
    unit: str = "word",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
    compact_every: Optional[int] = None,
    state_compact_every: Optional[int] = None,
):
    """Streaming near-duplicate detection against EVERYTHING SEEN SO
    FAR — the self-growing form of :func:`stream_near_dup_insert`:
    each micro-batch is checked against the base corpus AND every
    earlier micro-batch, and its own signatures are then folded into
    the standing state, so a duplicate arriving three batches after
    its original is caught. This is the continuous-ingest dedup story
    a 100 TB pipeline actually runs (the static-corpus form misses
    stream-vs-stream duplicates entirely); the batch equivalent is
    ``minhash_lsh_pairs`` over corpus ∪ stream restricted to pairs
    touching the stream — exactly what the q125 oracle replays.

    Per batch: (1) band-join the batch's signatures against the
    standing signature state (corpus signatures built once at start,
    plus every earlier batch's — candidates only, never a corpus
    re-scan), verify exact Jaccard on candidate texts; (2) the
    batch's own WITHIN-batch pairs via ``minhash_lsh_pairs`` (a
    batch-sized self-join); (3) write the canonicalized
    ``(id_a < id_b, jaccard)`` union as this epoch's result
    (idempotent per-epoch overwrite); (4) append the batch's
    signatures and ``(id, text)`` to the state dirs. Each pair is
    discovered in EXACTLY one epoch (batches are disjoint and state
    holds strictly-earlier docs), so reading the result store needs
    no dedup pass.

    State appends are NOT idempotent, so step (4) runs under the
    exactly-once protocol of :func:`stream_ivf_append_insert`: a
    ``(lineage, batch_id)`` high-water mark in
    ``<state>/_ingest.json`` (redelivered batches at/below it skip
    entirely — their epoch result was committed BEFORE their state
    append, so nothing recomputes against a state that now contains
    the batch itself), a ``_pending.json`` intent marker bracketing
    the appends, and a crash probe that decides "did the append
    commit?" from the batch's own ids. Lineage derives from the
    checkpoint's persisted query id. Ids must be unique across the
    stream's WHOLE history ∪ corpus (the ingest contract — replaying
    old docs under a fresh checkpoint would self-match against their
    own state); single writer per state dir.

    State layout: ``<state>/sig`` (id, band, bsig — corpus + appended
    batches), ``<state>/docs`` (id, text — appended batches only;
    corpus texts stay in ``corpus``), ``_params.json`` manifest
    validated on reuse. The two appends are separate parquet jobs
    (sig first, docs second; the crash probe reads docs), so a crash
    BETWEEN them can leave the batch's signature rows in the state
    when the retried epoch recomputes — the retry therefore
    anti-joins the batch's own ids out of the standing signatures
    before the cross join (otherwise the batch band-joins against
    itself: self-pairs at jaccard 1.0 plus a second copy of every
    within-batch pair), and any sig rows duplicated by the retry's
    re-append are harmless afterwards because candidates are
    ``.distinct()``-ed before verify. REPEATED crash-retries in that
    same gap each re-append the batch's signatures, so ``sig/`` (and
    on a crash after the docs append, ``docs/``) can grow one batch
    copy per retry until the next ``state_compact_every`` fold —
    results stay correct throughout (the anti-join + distinct
    candidates mask the copies); the fold's ``distinct=True`` on
    BOTH dirs then heals the growth (ids are unique by the ingest
    contract, so doc-row dedup is free). State grows with the stream (near-dup needs
    the texts for exact verify — this is the corpus growing, not
    bookkeeping); per-batch cost tracks batch size × candidate count,
    never total history size, because the band equi-join prunes
    everything else.

    The state dirs themselves get the same bounded-retention
    treatment the result sinks got (``compact_every``):
    ``state_compact_every=c`` folds the live append files of
    ``sig/``/``docs/`` into a ``_SUCCESS``+manifest-gated
    ``<sub>_base/v=V`` every c epochs (:func:`_compact_state_dir` —
    both dirs ``distinct()``-ed on fold, clearing any crash-retry
    duplicates), so a long-lived stream's state file count stays
    bounded instead of growing one parquet job's files per epoch.
    Readers and the crash probe go through :func:`_read_state_dir`
    (newest committed base ∪ unfolded live files) either way.
    """
    from ..operators.dedup import (
        banded_signatures,
        minhash_lsh_join,
        minhash_lsh_pairs,
    )

    spark = corpus.sparkSession
    _reset_stale_result_epochs(spark, result_path, checkpoint_dir)
    kw = dict(text_col=text_col, n=n, num_hashes=num_hashes,
              bands=bands, unit=unit)
    sig_dir = fsio.pjoin(state_path, "sig")
    docs_dir = fsio.pjoin(state_path, "docs")
    params = {"kind": "self_dedup_state", "id_col": id_col, **kw}
    if state_compact_every is not None and state_compact_every < 2:
        raise ValueError("state_compact_every must be >= 2")
    if not _state_dir_exists(spark, state_path, "sig"):
        banded_signatures(corpus, id_col, **kw).write.mode(
            "overwrite"
        ).parquet(sig_dir)
        _write_params_manifest(spark, state_path, params)
    else:
        _check_params_manifest(
            spark, state_path, params, "self-dedup state"
        )
    hw_path = fsio.pjoin(state_path, "_ingest.json")
    pend_path = fsio.pjoin(state_path, "_pending.json")
    lineage_cell: list = []
    base_docs = corpus.select(
        F.col(id_col), F.col(text_col)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not lineage_cell:
            lineage_cell.append(
                _checkpoint_query_lineage(
                    batch_df.sparkSession, checkpoint_dir
                )
            )
        lineage = lineage_cell[0]
        sp = batch_df.sparkSession
        hw = _read_json_marker(sp, hw_path)
        if (
            hw is not None
            and hw["lineage"] == lineage
            and int(hw["batch_id"]) >= epoch_id
        ):
            return  # redelivered: result + state already committed
        pend = _read_json_marker(sp, pend_path)
        if (
            pend is not None
            and pend["lineage"] == lineage
            and int(pend["batch_id"]) == epoch_id
            and _self_dedup_batch_already_appended(
                sp, state_path, batch_df, id_col
            )
        ):
            # crashed between state-append commit and finalize: the
            # epoch result committed even earlier — just finalize.
            _write_json_marker(
                sp, hw_path, {"lineage": lineage, "batch_id": epoch_id}
            )
            _delete_path(sp, pend_path)
            return
        # A crash BETWEEN the sig append and the docs append leaves
        # the batch's OWN signatures in sig/ while the crash probe
        # (which reads docs/) says "not appended" — the retried epoch
        # would then band-join the batch against itself and emit
        # (id, id, 1.0) self-pairs plus a second copy of every
        # within-batch pair (the verify reads both sides' shingles
        # from the batch, so the missing docs rows don't save us).
        # Anti-joining the batch's ids out of the standing state makes
        # the retried epoch identical to a clean run; the id_a != id_b
        # belt below guards any future state writer with the same gap.
        seen_sigs = _read_state_dir(sp, state_path, "sig").join(
            F.broadcast(batch_df.select(F.col(id_col).alias("id"))),
            "id",
            "left_anti",
        )
        seen_docs = base_docs
        if _state_dir_exists(sp, state_path, "docs"):
            seen_docs = base_docs.unionByName(
                _read_state_dir(sp, state_path, "docs").select(
                    F.col("id").alias(id_col),
                    F.col("text").alias(text_col),
                )
            )
        cross = minhash_lsh_join(
            batch_df, seen_docs, id_col,
            verify_threshold=verify_threshold,
            right_banded=seen_sigs, **kw,
        ).where(F.col("id_left") != F.col("id_right")).select(
            F.least("id_left", "id_right").alias("id_a"),
            F.greatest("id_left", "id_right").alias("id_b"),
            "jaccard",
        )
        within = minhash_lsh_pairs(
            batch_df, id_col,
            verify_threshold=verify_threshold, **kw,
        ).select("id_a", "id_b", "jaccard")
        _write_epoch_result(
            cross.unionByName(within), result_path, epoch_id,
            compact_every,
        )
        if batch_df.isEmpty():
            _write_json_marker(
                sp, hw_path, {"lineage": lineage, "batch_id": epoch_id}
            )
            return
        _write_json_marker(
            sp, pend_path, {"lineage": lineage, "batch_id": epoch_id}
        )
        banded_signatures(batch_df, id_col, **kw).write.mode(
            "append"
        ).parquet(sig_dir)
        batch_df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        ).write.mode("append").parquet(docs_dir)
        _write_json_marker(
            sp, hw_path, {"lineage": lineage, "batch_id": epoch_id}
        )
        _delete_path(sp, pend_path)
        if (
            state_compact_every
            and (epoch_id + 1) % state_compact_every == 0
        ):
            # after finalize only: a fold never interleaves with a
            # batch append, and a crash mid-fold is masked by the
            # base manifest (readers never see rows twice). Both dirs
            # fold distinct: ids are unique by the ingest contract,
            # so dedup is free — and it bounds crash-retry growth
            # (see docstring).
            _compact_state_dir(sp, state_path, "sig", distinct=True)
            _compact_state_dir(sp, state_path, "docs", distinct=True)

    writer = (
        docs_stream.writeStream.foreachBatch(sink).outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _latest_committed_epoch(spark: SparkSession, state_path: str):
    """Largest N for which ``state_path/epoch=N`` holds a committed
    parquet write (its ``_SUCCESS`` marker exists). Marker-less dirs —
    a crash between the first task file and the job commit — are
    skipped, so readers fall back to the newest epoch that actually
    finished."""
    fs, jroot = _hadoop_path(spark, state_path)
    best = None
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not name.startswith("epoch="):
            continue
        e = int(name.split("=", 1)[1])
        if best is None or e > best:
            _, marker = _hadoop_path(
                spark, f"{state_path}/{name}/_SUCCESS"
            )
            if fs.exists(marker):
                best = e
    return best


def stream_kmv_insert(
    values_stream: DataFrame,
    state_path: str,
    col: str,
    k: int = 256,
    salt: str = "kmv",
    keep_epochs: int = 2,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a persisted KMV bottom-k distinct-count sketch of a
    streamed column across micro-batches — the streaming form of
    ``operators.sketches.kmv_distinct`` (q100), and the cheapest
    standing answer to "how many distinct users/ids has this stream
    ever seen" at 100 TB: state is k hashes regardless of history.

    Bottom-k merge is associative and idempotent, so each micro-batch
    folds in exactly: sketch_N = bottom-k(sketch_{N-1} ∪ distinct
    hashes of batch N) — and the final sketch equals the one-shot
    batch sketch over everything the stream ever carried
    (stream == batch, the q93/q102 unification convention).

    Durability/idempotence: each micro-batch reads the NEWEST
    **committed** ``state_path/epoch=N`` dir (committed = contains the
    ``_SUCCESS`` marker the parquet job commit writes last — a crash
    mid-write leaves a marker-less dir that is skipped, falling back
    to the previous epoch, so a partial write can never become the
    sketch lineage), folds its batch in, and writes ``epoch=N+1``.
    Because the fold is a set union + bottom-k, it is idempotent and
    monotone — an at-least-once retry that re-folds rows already
    absorbed (even over its own interrupted write, which the retry
    simply overwrites) changes nothing, so no epoch bookkeeping
    against the stream's internal batch ids is needed, and new runs
    (fresh checkpoints) resume seamlessly from any prior run's
    sketch. One writer per state dir (foreachBatch serializes batches
    within a query; don't point two live streams at one sketch). A
    ``_params.json`` manifest (col/k/salt) is stamped on first build
    and validated on reuse — resuming with different parameters
    raises instead of silently merging incompatible sketches.

    Retention: after each successful epoch write, epochs older than
    the newest ``keep_epochs`` (>= 2: the new epoch plus crash-
    recovery headroom — the same pattern as the MVCC storage layer's
    ``keep_versions``) are deleted, so on-disk state stays bounded at
    ``keep_epochs`` k-row dirs for any stream lifetime and the
    latest-epoch listing never grows. Read the standing estimate with
    :func:`kmv_state_estimate`.
    """
    from ..operators.sketches import kmv_hash_col

    if k < 2:
        raise ValueError("k must be >= 2")
    if keep_epochs < 2:
        raise ValueError(
            "keep_epochs must be >= 2 (the new epoch plus one "
            "predecessor of crash-recovery headroom)"
        )
    spark = values_stream.sparkSession
    params = {"kind": "kmv_sketch", "col": col, "k": k, "salt": salt}
    fs, jroot = _hadoop_path(spark, state_path)
    if fs.exists(jroot):
        _check_params_manifest(
            spark, state_path, params, "persisted KMV sketch"
        )
    else:
        fs.mkdirs(jroot)
        _write_params_manifest(spark, state_path, params)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        c = F.col(col)
        new = (
            batch_df.where(c.isNotNull())
            .select(kmv_hash_col(c, salt))
            .distinct()
        )
        prev = _latest_committed_epoch(spark, state_path)
        if prev is not None:
            new = new.union(
                spark.read.parquet(f"{state_path}/epoch={prev}")
            )
        merged = new.distinct().orderBy("_h").limit(k)
        nxt = 0 if prev is None else prev + 1
        merged.write.mode("overwrite").parquet(
            f"{state_path}/epoch={nxt}"
        )
        # GC only after the new epoch committed: a failure above
        # leaves every old epoch in place for the retry to read.
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if not name.startswith("epoch="):
                continue
            if int(name.split("=", 1)[1]) <= nxt - keep_epochs:
                fs.delete(st.getPath(), True)

    writer = (
        values_stream.writeStream.foreachBatch(sink).outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fold_quantile_sketch_batch(
    batch_df: DataFrame,
    state_path: str,
    value_col: str,
    key_col: str,
    group_col: str,
    k: int,
    salt: str,
    keep_epochs: int,
    lineage: str,
    epoch_id: int,
) -> None:
    """One micro-batch fold of :func:`stream_kmv_quantiles_insert` —
    module-level so the at-least-once replay guard is directly unit-
    testable: a batch id <= the one recorded in the newest committed
    epoch of the SAME lineage is a redelivery and must change
    nothing."""
    from ..operators.sketches import (
        _bottom_k_rows,
        _collect_sketch,
        kmv_hash_col,
    )

    spark = batch_df.sparkSession
    fs, jroot = _hadoop_path(spark, state_path)
    kc, gc = F.col(key_col), F.col(group_col)
    vc = F.col(value_col).cast("double")
    batch_rows = batch_df.where(
        kc.isNotNull() & vc.isNotNull() & gc.isNotNull()
    ).select(
        gc.alias("group"),
        kmv_hash_col(kc, salt),
        vc.alias("_v"),
    )
    batch_totals = batch_rows.groupBy("group").agg(
        F.count("*").cast("long").alias("n_total")
    )
    prev = _latest_committed_epoch(spark, state_path)
    rows, totals = batch_rows, batch_totals
    if prev is not None:
        state = spark.read.parquet(f"{state_path}/epoch={prev}")
        meta = state.select("_lineage", "_batch_id").first()
        if (
            meta is not None
            and meta["_lineage"] == lineage
            and int(meta["_batch_id"]) >= epoch_id
        ):
            return  # redelivered batch already folded
        prev_rows = state.select(
            "group", F.explode("sample").alias("p")
        ).select(
            "group",
            F.col("p._h").alias("_h"),
            F.col("p._v").alias("_v"),
        )
        prev_totals = state.select("group", "n_total")
        rows = prev_rows.union(batch_rows)
        totals = (
            prev_totals.union(batch_totals)
            .groupBy("group")
            .agg(F.sum("n_total").cast("long").alias("n_total"))
        )
    merged = _collect_sketch(_bottom_k_rows(rows, k), totals)
    nxt = 0 if prev is None else prev + 1
    merged.withColumn("_lineage", F.lit(lineage)).withColumn(
        "_batch_id", F.lit(epoch_id).cast("long")
    ).write.mode("overwrite").parquet(f"{state_path}/epoch={nxt}")
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not name.startswith("epoch="):
            continue
        if int(name.split("=", 1)[1]) <= nxt - keep_epochs:
            fs.delete(st.getPath(), True)


def stream_kmv_quantiles_insert(
    values_stream: DataFrame,
    state_path: str,
    value_col: str,
    key_col: str,
    group_col: str,
    k: int = 256,
    salt: str = "kmvq",
    keep_epochs: int = 2,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain the persisted PER-GROUP quantile sketch
    (``operators.sketches.kmv_quantile_sketch`` — one row per group:
    total count + bottom-k (hash, value) sample) from a live stream —
    the streaming form of q110/q114's data card, and the standing
    answer to "p50/p90 per source over everything ever ingested"
    without rescanning history: state is k sample rows per group.

    Each micro-batch folds in as one sketch MERGE (union samples,
    re-bottom-k by the deterministic (hash, value) order, totals add)
    against the newest **committed** ``epoch=N`` dir, writing
    ``epoch=N+1`` idempotently (_SUCCESS-gated reads + per-epoch
    overwrite + ``keep_epochs`` GC — :func:`stream_kmv_insert`'s
    durability recipe). Unlike the distinct-count sketch, the TOTALS
    are not a set union, so a replayed micro-batch must be detected,
    not absorbed: every epoch records the checkpoint lineage and the
    foreachBatch batch id that produced it, and a batch with an id
    <= the recorded one in the SAME lineage is skipped (at-least-once
    redelivery after a committed fold — the double-count hole the
    distinct sketch doesn't have). A NEW lineage (fresh checkpoint)
    folds whatever its source carries — point it at NEW rows only;
    ``key_col`` values must be unique across the stream's whole
    history (the same disjointness contract as
    ``kmv_quantile_sketch_merge``).

    Read the standing estimates with
    :func:`kmv_quantiles_state_estimate`.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if keep_epochs < 2:
        raise ValueError(
            "keep_epochs must be >= 2 (the new epoch plus one "
            "predecessor of crash-recovery headroom)"
        )
    spark = values_stream.sparkSession
    params = {
        "kind": "kmv_quantile_sketch",
        "value_col": value_col,
        "key_col": key_col,
        "group_col": group_col,
        "k": k,
        "salt": salt,
    }
    fs, jroot = _hadoop_path(spark, state_path)
    if fs.exists(jroot):
        _check_params_manifest(
            spark, state_path, params, "persisted quantile sketch"
        )
    else:
        fs.mkdirs(jroot)
        _write_params_manifest(spark, state_path, params)
    # Lineage resolves lazily on the first batch: the query id in
    # <checkpoint>/metadata exists only once start() has run, and it
    # (not the path string) is what tracks epoch-numbering restarts
    # (_checkpoint_query_lineage).
    lineage_cell: list = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not lineage_cell:
            lineage_cell.append(
                _checkpoint_query_lineage(
                    batch_df.sparkSession, checkpoint_dir
                )
            )
        _fold_quantile_sketch_batch(
            batch_df, state_path, value_col, key_col, group_col,
            k, salt, keep_epochs, lineage_cell[0], epoch_id,
        )

    writer = (
        values_stream.writeStream.foreachBatch(sink).outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kmv_quantiles_state_estimate(
    spark: SparkSession,
    state_path: str,
    probs=(0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Standing per-group quantile estimates from a
    :func:`stream_kmv_quantiles_insert` state dir: read the newest
    committed epoch's one-row-per-group sketch and rank its bounded
    samples — ``kmv_quantiles_by_key``'s output shape, computed from
    k rows per group however long the stream has run."""
    from ..operators.sketches import kmv_quantiles_from_sketch

    _read_params_manifest(spark, state_path)  # validates provenance
    latest = _latest_committed_epoch(spark, state_path)
    if latest is None:
        raise ValueError(
            f"no committed sketch epochs at {state_path!r}"
        )
    sketch = spark.read.parquet(f"{state_path}/epoch={latest}")
    return kmv_quantiles_from_sketch(
        sketch.select("group", "n_total", "sample"), probs
    )


def kmv_state_estimate(spark: SparkSession, state_path: str) -> DataFrame:
    """Standing estimate from a :func:`stream_kmv_insert` state dir:
    reads the newest **committed** ``epoch=N`` sketch (``_SUCCESS``
    present — a crash-orphaned partial write is never estimated) and
    applies Beyer et al. 2007's estimator — one k-row scan,
    kmv_distinct's output shape ``(n_seen, kth_hash, estimate,
    exact)``. k comes from the ``_params.json`` manifest, so the
    reader can never mis-estimate a sketch built with a different
    k."""
    from ..operators.sketches import kmv_estimate_from_bottom

    params = _read_params_manifest(spark, state_path)
    latest = _latest_committed_epoch(spark, state_path)
    if latest is None:
        raise ValueError(
            f"no committed sketch epochs at {state_path!r}"
        )
    bottom = spark.read.parquet(f"{state_path}/epoch={latest}")
    return kmv_estimate_from_bottom(bottom, int(params["k"]))


def stream_rollup_insert(
    storage: Storage,
    points_stream: DataFrame,
    window_duration: str,
    agg: str = "avg",
    watermark: str = "1 hour",
    ts_col: str = "time",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Continuous query: maintain a DOWNSAMPLED point store from a live
    point stream — the streaming counterpart of ``db.downsample`` (and
    the InfluxDB continuous-query analog). One aggregated point per
    (measurement, exact tag set, window) lands in ``storage`` when its
    window finalizes; each field key is aggregated independently, so
    schemaless key sets survive.

    Physical shape: ONE streaming aggregation — explode fields, group by
    (window, measurement, sorted tag entries, field key) with
    watermark-bounded state in append mode, so every group's rows for a
    window finalize together in the same micro-batch. The map
    re-assembly (field rows → fields map → canonical point) happens
    inside ``foreachBatch`` on that finalized batch, where it is plain
    batch code — avoiding a second stateful aggregation in the stream.
    State per key is O(1) and bounded by the watermark horizon.

    Run with a modest ``spark.sql.shuffle.partitions`` — each shuffle
    partition of the stateful aggregation is its own state store
    instance with per-batch snapshot/commit overhead, and a continuous
    rollup over a handful of series wants few. Set it on the session
    BEFORE starting and restore after the query terminates (restoring
    right after ``start()`` would race the asynchronous first
    micro-batch's planning).
    """
    from ..operators.timeseries import (
        FIELD_AGGS,
        explode_point_fields,
        field_agg_column,
        reassemble_fields,
    )

    if agg not in FIELD_AGGS:
        raise ValueError(f"stream_rollup_insert: unsupported agg {agg!r}")
    df = points_stream.withWatermark(ts_col, watermark)
    exploded = explode_point_fields(
        df.withColumn("_t", F.col(ts_col)), keep_cols=["_t"]
    )
    per_key = exploded.groupBy(
        F.window("_t", window_duration).alias("_w"),
        "measurement",
        "_tags",
        "_fk",
    ).agg(field_agg_column(agg).alias("_v"))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        rolled = reassemble_fields(
            batch_df, ["_w", "measurement", "_tags"]
        ).select(
            F.col("_w.start").alias("time"),
            "measurement",
            F.map_from_entries("_tags").alias("tags"),
            "fields",
        )
        storage.append_df(rolled)

    writer = per_key.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_semantic_dedup_insert(
    docs_stream: DataFrame,
    corpus: DataFrame,
    result_path: str,
    id_col: str = "doc_id",
    vec_col: Optional[str] = None,
    text_col: str = "text",
    embed_dim: int = 64,
    num_clusters: int = 16,
    tau: float = 0.9,
    state_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
    compact_every: Optional[int] = None,
):
    """Streaming SEMANTIC dedup: every micro-batch of an ingest stream
    is checked against an existing corpus in embedding space —
    q95/q99's SemDedup machinery as a continuous pipeline, the
    semantic sibling of :func:`stream_near_dup_insert`'s MinHash path.
    Vectors above cosine ``tau`` of a same-cluster corpus vector
    append to ``result_path`` as ``(id_left, id_right, cosine)``.

    Standing state (built ONCE before the stream starts, persisted at
    ``state_path`` if given and REUSED if already present — it
    survives stream restarts; a ``_params.json`` manifest is stamped
    on first build and validated on reuse, so a restart with a
    different embed_dim/num_clusters/vec_col raises instead of
    silently assigning against a stale codebook): the IVF codebook
    trained on the corpus and the corpus assignment table (cluster +
    unit vector per corpus doc). Each micro-batch then costs: (embed
    via :func:`~tinyflux_spark.operators.text.embed_bow` when
    ``vec_col`` is None, else the given vector column) + assignment
    against the FROZEN codebook (one Arrow pass over the batch) + one
    cluster-cogrouped Arrow pass that accumulates the batch × corpus
    cosine block dimension-by-dimension (semantic_dedup's blocked-Gram
    recipe — the same explicit left fold, so the SQL oracle still
    replays bit-for-bit; thresholds stay JVM-side) — per-batch latency
    tracks batch size times cluster width, never corpus size.

    Ids must be unique across stream ∪ corpus. Each micro-batch
    OVERWRITES its own ``epoch=N`` partition directory under
    ``result_path`` — foreachBatch is at-least-once, and the
    per-epoch overwrite makes a retried batch idempotent instead of
    appending duplicate pairs (read with
    ``spark.read.parquet(result_path)`` and project the pair columns).
    Epoch numbering restarts at 0 with a fresh checkpoint, so starting
    a NEW lineage against an existing ``result_path`` first wipes the
    prior run's epoch dirs (a resumed checkpoint keeps them — they are
    this lineage's own committed output). The batch equivalent (same
    codebook, same assignment, same threshold) produces exactly the
    same pairs — the stream/batch unification contract, oracle-shared
    in the q102 gate.
    """
    from ..operators.similarity import ivf_centroids, semantic_assign
    from ..operators.text import embed_bow

    spark = corpus.sparkSession
    _reset_stale_result_epochs(spark, result_path, checkpoint_dir)

    def as_vecs(df: DataFrame) -> DataFrame:
        if vec_col is not None:
            return df.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("embedding")
            )
        return embed_bow(df, id_col, text_col, dim=embed_dim)

    def build_state():
        cvecs = as_vecs(corpus)
        cents = ivf_centroids(cvecs, "id", "embedding", num_clusters)
        if not cents:
            raise ValueError("corpus has no rows to train a codebook on")
        asg = semantic_assign(cvecs, cents, "id", "embedding")
        return cents, asg

    state_params = {
        "kind": "semantic_dedup_state",
        "vec_col": vec_col,
        "text_col": None if vec_col is not None else text_col,
        "embed_dim": None if vec_col is not None else embed_dim,
        "num_clusters": num_clusters,
    }
    if state_path is not None:
        fs, jpath = _hadoop_path(spark, state_path)
        if not fs.exists(jpath):
            cents, asg = build_state()
            spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in cents],
                "cidx: int, vector: array<double>",
            ).write.parquet(state_path + "/codebook")
            asg.write.parquet(state_path + "/assign")
            _write_params_manifest(spark, state_path, state_params)
        else:
            _check_params_manifest(
                spark, state_path, state_params,
                "persisted semantic-dedup state",
            )
        cents = [
            (r["cidx"], list(r["vector"]))
            for r in sorted(
                spark.read.parquet(state_path + "/codebook").collect(),
                key=lambda r: r["cidx"],
            )
        ]
        corpus_asg = spark.read.parquet(state_path + "/assign")
    else:
        cents, asg = build_state()
        corpus_asg = asg.localCheckpoint()

    # Pair scan recipe shared with operators.similarity.semantic_dedup:
    # Arrow-vectorized blocked Gram with an EXPLICIT per-dimension left
    # fold (acc += x[:, j] * y[:, j] — bit-identical to
    # aggregate(zip_with) and DuckDB's list_dot_product), conservative
    # pre-filter at tau - 1e-6 inside Arrow, exact decimal
    # F.round(..., 6) >= tau decided JVM-side. The interpreted per-pair
    # HOF fold it replaces was measured ~20µs/pair — bounded per batch,
    # but it dominated sink latency at production batch sizes.
    import numpy as np
    import pandas as pd

    from ..operators.similarity import _GRAM_BLOCK

    pre_tau = float(tau) - 1e-6
    id_type = corpus.schema[id_col].dataType.simpleString()
    pair_schema = (
        f"id_left {id_type}, id_right {id_type}, raw_cos double"
    )
    _empty = pd.DataFrame(columns=["id_left", "id_right", "raw_cos"])

    def _batch_pairs(lpdf: pd.DataFrame, rpdf: pd.DataFrame):
        lk = lpdf[lpdf["_ul"].notna()].reset_index(drop=True)
        rk = rpdf[rpdf["_ur"].notna()].reset_index(drop=True)
        if lk.empty or rk.empty:
            return _empty
        XL = np.vstack(lk["_ul"].to_numpy())
        XR = np.vstack(rk["_ur"].to_numpy())
        frames = []
        for lo in range(0, len(XR), _GRAM_BLOCK):
            hi = min(lo + _GRAM_BLOCK, len(XR))
            gram = np.zeros((len(XL), hi - lo))
            for j in range(XL.shape[1]):
                gram += np.outer(XL[:, j], XR[lo:hi, j])
            ia, ib = np.nonzero(gram >= pre_tau)
            if len(ia):
                frames.append(
                    pd.DataFrame(
                        {
                            "id_left": lk["id_left"].to_numpy()[ia],
                            "id_right": rk["id_right"].to_numpy()[
                                ib + lo
                            ],
                            "raw_cos": gram[ia, ib],
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else _empty

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        basg = semantic_assign(
            as_vecs(batch_df), cents, "id", "embedding"
        )
        left = basg.select(
            F.col("id").alias("id_left"),
            F.col("cluster").alias("_cl"),
            F.col("_u").alias("_ul"),
        )
        right = corpus_asg.select(
            F.col("id").alias("id_right"),
            F.col("cluster").alias("_cl"),
            F.col("_u").alias("_ur"),
        )
        pairs = (
            left.groupBy("_cl")
            .cogroup(right.groupBy("_cl"))
            .applyInPandas(_batch_pairs, pair_schema)
            .select(
                "id_left",
                "id_right",
                F.round("raw_cos", 6).alias("cosine"),
            )
            .where(F.col("cosine") >= tau)
        )
        # Per-epoch overwrite, not blind append: foreachBatch is
        # at-least-once, so a retried micro-batch must land in the
        # same epoch=N directory idempotently; compaction (if on)
        # folds settled epochs into the bounded _base
        # (stream_near_dup_insert's retention contract —
        # read_stream_pairs is the reader).
        _write_epoch_result(pairs, result_path, epoch_id, compact_every)

    writer = (
        docs_stream.writeStream.foreachBatch(sink).outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_json_marker(spark: SparkSession, path: str):
    """Tiny JSON marker file via the Hadoop FS API, or None if
    absent."""
    fs, jpath = _hadoop_path(spark, path)
    if not fs.exists(jpath):
        return None
    return json.loads(_read_small_file(fs, jpath).decode("utf-8"))


def _write_json_marker(spark: SparkSession, path: str, obj: dict) -> None:
    _write_json_atomic(spark, path, obj)


def _delete_path(spark: SparkSession, path: str) -> None:
    fs, jpath = _hadoop_path(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _ivf_batch_already_appended(
    spark: SparkSession, index_path: str, batch_df: DataFrame,
    id_col: str, has_codes: bool,
) -> bool:
    """Crash-recovery probe for :func:`stream_ivf_append_insert`: did
    the interrupted previous attempt's append JOB commit? The parquet
    job commit is atomic (all task files rename in, or none), and ids
    are unique across the stream, so the presence of ANY batch id in
    the index decides it. Pays one pushed-IN-filter scan, and only on
    the retry after a crash between append and finalize."""
    sample = [
        r[0] for r in batch_df.select(id_col).limit(5).collect()
    ]
    if not sample:
        return True  # empty batch: nothing to (re-)append
    from ..operators.similarity import _resolve_index_root

    sub = "codes" if has_codes else "lists"
    idc = "id" if has_codes else id_col
    existing = spark.read.parquet(
        fsio.pjoin(_resolve_index_root(index_path), sub)
    )
    return (
        existing.where(F.col(idc).isin(sample)).limit(1).count() > 0
    )


def stream_ivf_append_insert(
    vec_stream: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Streaming maintenance of a persisted IVF(-PQ) index
    (``operators.similarity.ivf_write_index``): each micro-batch of
    new vectors is folded in with
    :func:`~tinyflux_spark.operators.similarity.ivf_append_index` —
    assigned and (residual-)encoded against the FROZEN codebooks and
    appended into the probed ``lists/``/``codes/`` partition dirs —
    so the serving read (``ivf_pq_topk_indexed``) sees every ingested
    vector without a retrain ever running in the hot path. This is
    the reference's insert→index-maintenance story (tinyflux
    database.py:371-417 keeps its index current on every insert)
    composed with the 100 TB serving layout; stream == batch append
    == one-shot build at frozen codebooks (pytest-asserted; the q120
    gate replays the whole asymmetry in SQL).

    Exactly-once despite foreachBatch's at-least-once: appends are
    not idempotent (a replayed batch would duplicate index rows), so
    the sink records a ``(lineage, batch_id)`` high-water mark in
    ``<index>/_ingest.json`` AFTER each committed append —
    redelivered batch ids at or below it are skipped — and brackets
    the append itself with a ``_pending.json`` intent marker. A crash
    between append-commit and high-water write leaves the intent
    marker; the retry then decides "did the append job commit?" by
    probing the index for the batch's own ids (the parquet job commit
    is atomic and ids are unique, so any-present ⇔ all-present) and
    either finalizes or re-appends. Lineage derives from the
    checkpoint's persisted query id (:func:`_checkpoint_query_lineage`),
    so a recreated checkpoint can't alias an old numbering.

    ``id_col`` values must be unique across the stream's whole
    history AND the index's existing contents (the usual ingest
    contract). Single writer — the batch :func:`ivf_append_index`'s
    own rule. Codebooks never move; rebuild with ``ivf_write_index``
    when the corpus drifts (recall, not correctness).
    """
    from ..operators.similarity import (
        _read_index_params,
        ivf_append_index,
    )

    params = _read_index_params(index_path)
    if params is None:
        raise ValueError(
            f"no params.json manifest at {index_path!r}; build the "
            "index with ivf_write_index before streaming appends"
        )
    if params["id_col"] != id_col or params["vec_col"] != vec_col:
        raise ValueError(
            f"index at {index_path!r} was built with id_col="
            f"{params['id_col']!r}, vec_col={params['vec_col']!r}; "
            f"this stream asks for {id_col!r}/{vec_col!r}"
        )
    has_codes = params.get("pq_m") is not None
    return _start_exactly_once_append(
        vec_stream,
        index_path,
        lambda b: ivf_append_index(b, index_path, id_col, vec_col),
        lambda sp, b: _ivf_batch_already_appended(
            sp, index_path, b, id_col, has_codes
        ),
        checkpoint_dir,
        trigger_available_now,
    )


def _start_exactly_once_append(
    stream: DataFrame,
    state_root: str,
    append_fn,
    already_appended_fn,
    checkpoint_dir: Optional[str],
    trigger_available_now: bool,
):
    """The shared exactly-once foreachBatch protocol for
    NON-IDEMPOTENT index appends (:func:`stream_ivf_append_insert`,
    :func:`stream_srp_append_insert`): a ``(lineage, batch_id)``
    high-water mark in ``<root>/_ingest.json`` written AFTER each
    committed append (redelivered batch ids at or below it skip), a
    ``_pending.json`` intent marker bracketing the append itself, and
    on a pending-marked retry a crash probe
    ``already_appended_fn(spark, batch_df)`` that decides "did the
    interrupted append JOB commit?" from the batch's own ids (parquet
    job commit is atomic; ids unique) — finalize if so, re-append if
    not. Lineage derives from the checkpoint's persisted query id so
    a recreated checkpoint cannot alias an old numbering."""
    hw_path = fsio.pjoin(state_root, "_ingest.json")
    pend_path = fsio.pjoin(state_root, "_pending.json")
    lineage_cell: list = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not lineage_cell:
            lineage_cell.append(
                _checkpoint_query_lineage(
                    batch_df.sparkSession, checkpoint_dir
                )
            )
        lineage = lineage_cell[0]
        sp = batch_df.sparkSession
        hw = _read_json_marker(sp, hw_path)
        if (
            hw is not None
            and hw["lineage"] == lineage
            and int(hw["batch_id"]) >= epoch_id
        ):
            return  # redelivered batch already folded
        pend = _read_json_marker(sp, pend_path)
        if (
            pend is not None
            and pend["lineage"] == lineage
            and int(pend["batch_id"]) == epoch_id
            and already_appended_fn(sp, batch_df)
        ):
            # previous attempt crashed between append-commit and
            # finalize: the rows are in; just finalize.
            _write_json_marker(
                sp, hw_path, {"lineage": lineage, "batch_id": epoch_id}
            )
            _delete_path(sp, pend_path)
            return
        _write_json_marker(
            sp, pend_path, {"lineage": lineage, "batch_id": epoch_id}
        )
        append_fn(batch_df)
        _write_json_marker(
            sp, hw_path, {"lineage": lineage, "batch_id": epoch_id}
        )
        _delete_path(sp, pend_path)

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _srp_batch_already_appended(
    spark: SparkSession, index_path: str, batch_df: DataFrame,
    id_col: str,
) -> bool:
    """Crash-recovery probe for :func:`stream_srp_append_insert`:
    same decision as :func:`_ivf_batch_already_appended` (atomic
    parquet job commit + unique ids ⇒ any-present ⇔ all-present),
    read from the SRP ``buckets/`` layout."""
    sample = [
        r[0] for r in batch_df.select(id_col).limit(5).collect()
    ]
    if not sample:
        return True  # empty batch: nothing to (re-)append
    from ..operators.similarity import _resolve_index_root

    existing = spark.read.parquet(
        fsio.pjoin(_resolve_index_root(index_path), "buckets")
    )
    return (
        existing.where(F.col(id_col).isin(sample)).limit(1).count() > 0
    )


def stream_srp_append_insert(
    vec_stream: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Streaming maintenance of a persisted SRP index
    (``operators.similarity.srp_write_index``):
    :func:`stream_ivf_append_insert`'s hyperplane sibling, and the
    drift-free half of the lifecycle — each micro-batch is folded in
    with :func:`~tinyflux_spark.operators.similarity.srp_append_index`
    at the FROZEN seed-derived planes, so stream == batch append ==
    one-shot build is EXACT (the bucket is a pure function of the
    planes; there is no trained codebook to go stale). The serving
    reads (``srp_topk_indexed`` / ``srp_topk_batch_indexed``) see
    every ingested vector without any retrain existing in the design
    at all. Mirrors the reference's insert→index-maintenance story
    (tinyflux database.py:371-417).

    Exactly-once via the shared marker protocol
    (:func:`_start_exactly_once_append`): ``(lineage, batch_id)``
    high-water mark, ``_pending.json`` intent marker, id-presence
    crash probe against ``buckets/``. ``id_col`` values must be
    unique across the stream's whole history and the index's
    existing contents; single writer."""
    from ..operators.similarity import (
        _resolve_index_root,
        srp_append_index,
    )

    rec = fsio.read_json(
        fsio.pjoin(_resolve_index_root(index_path), "planes.json")
    )
    if "id_col" not in rec:
        raise ValueError(
            f"planes.json at {index_path!r} predates build-parameter "
            "stamping; rebuild with srp_write_index before streaming "
            "appends"
        )
    if rec["id_col"] != id_col or rec["vec_col"] != vec_col:
        raise ValueError(
            f"index at {index_path!r} was built with id_col="
            f"{rec['id_col']!r}, vec_col={rec['vec_col']!r}; "
            f"this stream asks for {id_col!r}/{vec_col!r}"
        )
    return _start_exactly_once_append(
        vec_stream,
        index_path,
        lambda b: srp_append_index(b, index_path, id_col, vec_col),
        lambda sp, b: _srp_batch_already_appended(
            sp, index_path, b, id_col
        ),
        checkpoint_dir,
        trigger_available_now,
    )
