"""Operator tests: aggregates, dedup, similarity, text, multimodal."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tinyflux_spark.operators import (
    aggregates,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumped over the lazy dog"),   # near-dup of 0
    (2, "completely different content about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
    (4, "El rápido zorro marrón salta sobre el perro que es perezoso"),
    (5, "Der schnelle braune Fuchs springt und ist nicht langsam"),
    (6, "数据处理引擎的中文文档内容测试样例十分有用"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


# ---------------- dedup ----------------

def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    assert by_keep[0] == 2  # docs 0 and 3 collapse
    assert len(out) == 6


def test_ngram_jaccard_pairs(docs):
    # word-3 shingles: doc 1 ("jumped") shares 4 of 10 union shingles
    # with doc 0 → jaccard 0.4
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.35
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got  # exact dup → jaccard 1.0
    assert (0, 1) in got  # near dup
    assert all(a < b for a, b in got)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(0, 3)] == 1.0
    assert 0.35 <= j[(0, 1)] < 1.0


def test_ngram_jaccard_pairs_char_unit(docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.5, unit="char"
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got and (0, 1) in got


def test_minhash_lsh_finds_near_dups(docs):
    # char unit here: (0,1) char-3 jaccard ≈ 0.86, so banding collides
    # with near-certainty; word-unit jaccard 0.4 would make the band
    # collision a coin flip on so small a signature.
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", num_hashes=12, bands=4, verify_threshold=0.5,
        unit="char",
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got
    assert (0, 1) in got
    # verified jaccard filters unrelated docs even if banding collides
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_minhash_candidates_subquadratic_shape(docs):
    cands = dedup.minhash_lsh_pairs(
        docs, "doc_id", verify_threshold=None
    )
    assert set(cands.columns) == {"id_a", "id_b"}


def test_ngram_jaccard_hot_shingle_df_cut(spark):
    """A boilerplate shingle shared by every document must not blow up
    the candidate join: with the df-cut below the hot shingle's
    frequency, pairs whose ONLY overlap is the boilerplate disappear,
    while genuinely similar pairs (overlap beyond the hot shingle)
    survive with their EXACT jaccard (the verify runs on uncut sets)."""
    boiler = "subscribe to our newsletter today"
    rows = [(i, f"{boiler} unique filler text number {i} zzz{i}")
            for i in range(20)]
    rows.append((100, f"{boiler} unique filler text number 0 yyy"))
    poisoned = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = dedup.ngram_jaccard_pairs(
        poisoned, "doc_id", threshold=0.2, max_shingle_freq=5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped}
    # (0, 100) share filler shingles past the boilerplate → candidate
    # survives the cut, and its jaccard counts the hot shingles too
    # (verify is uncut), matching the uncapped operator exactly.
    assert (0, 100) in got
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            poisoned, "doc_id", threshold=0.2, max_shingle_freq=None
        ).collect()
    }
    assert got[(0, 100)] == uncapped[(0, 100)]
    # pairs whose only overlap is boilerplate were never candidates
    assert set(got) < set(uncapped) or got == uncapped
    # the mechanism: the df-cut drops the hot shingle's inverted-index
    # rows, bounding the self-join fan-out
    st = dedup.shingle_table(
        poisoned, "doc_id", max_shingle_freq=5
    )
    hot = [s for s in boiler.split()]
    hot_shingle = " ".join(hot[:3])
    assert st.where(F.col("shingle") == hot_shingle).count() == 0


def test_minhash_lsh_max_bucket_size(spark):
    """Bucket-size cap: identical docs all land in one band-bucket; a
    cap below the bucket's size drops its pairs (stop-bucket), a cap
    above keeps them."""
    rows = [(i, "same exact duplicated text body here") for i in range(8)]
    rows.append((99, "entirely unrelated content string"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = dedup.minhash_lsh_pairs(
        df, "doc_id", verify_threshold=None
    )
    assert full.count() == 8 * 7 // 2
    capped = dedup.minhash_lsh_pairs(
        df, "doc_id", verify_threshold=None, max_bucket_size=4
    )
    assert capped.count() == 0


def test_simhash_near_dup_small_hamming(docs):
    rows = dedup.simhash(docs, "doc_id", bits=32).collect()
    h = {r["id"]: r["simhash"] for r in rows}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert h[0] == h[3]                    # identical text, same signature
    assert ham(h[0], h[1]) <= 6            # near dup: few bits differ
    assert ham(h[0], h[2]) > ham(h[0], h[1])  # unrelated differs more


# ---------------- text ----------------

def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  ",), ("one",)], ["t"]
    )
    got = [r[0] for r in df.select(text.token_count("t")).collect()]
    assert got == [3, 0, 0, 1]


def test_quality_features(docs):
    row = (
        text.quality_features(docs, "text")
        .where(F.col("doc_id") == 0)
        .collect()[0]
    )
    assert row["n_tokens"] == 9
    assert row["stopword_ratio"] > 0.2   # 'the' twice + 'over'
    assert 0 <= row["punct_ratio"] < 0.05
    assert row["mean_token_len"] == pytest.approx(
        (43 - 8) / 9  # 43 chars, 8 spaces, 9 tokens
    )


def test_lang_id(docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", text.lang_id("text").alias("lang")
        ).collect()
    }
    assert got[0] == "en"
    assert got[4] == "es"
    assert got[5] == "de"
    assert got[6] == "zh"


def test_fingerprint_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], ["t"]
    )
    fps = [r[0] for r in df.select(text.fingerprint("t")).collect()]
    assert fps[0] == fps[1]


def test_spread_scan_widens_only_narrow_inputs(spark):
    from tinyflux_spark.operators._spread import spread_scan

    target = spark.sparkContext.defaultParallelism
    rows = [(i, f"doc {i}") for i in range(64)]
    narrow = spark.createDataFrame(rows, ["id", "t"]).coalesce(1)
    widened = spread_scan(narrow, "id")
    assert widened.rdd.getNumPartitions() == target
    # results are a pure repartition — identical row set
    assert sorted(map(tuple, widened.collect())) == sorted(rows)

    wide = spark.createDataFrame(rows, ["id", "t"]).repartition(target + 1)
    assert spread_scan(wide, "id") is wide  # no-op, no added exchange


def test_pin_group_width_pins_and_preserves_rows(spark, monkeypatch):
    from tinyflux_spark.operators._spread import pin_group_width

    target = spark.sparkContext.defaultParallelism
    rows = [(i % 4, i) for i in range(64)]
    narrow = spark.createDataFrame(rows, ["k", "v"]).coalesce(1)
    pinned = pin_group_width(narrow, "k")
    # explicit repartition count: at least defaultParallelism wide
    assert pinned.rdd.getNumPartitions() >= target
    assert sorted(map(tuple, pinned.collect())) == sorted(rows)
    # kill switch returns the input untouched
    monkeypatch.setenv("TINYFLUX_SPARK_NO_SPREAD", "1")
    assert pin_group_width(narrow, "k") is narrow


def test_semantic_dedup_pin_replaces_not_adds_exchange(spark, monkeypatch):
    # The pair scan's explicit repartition satisfies the grouped map's
    # required distribution, so pinning must not ADD an exchange over
    # the unpinned plan — it replaces the groupBy's own one.
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(6)])
            for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def n_exchanges() -> int:
        plan = (
            similarity.semantic_dedup(df, num_clusters=4, tau=0.9)
            ._jdf.queryExecution().executedPlan().toString()
        )
        return plan.count("Exchange")

    monkeypatch.delenv("TINYFLUX_SPARK_NO_SPREAD", raising=False)
    pinned = n_exchanges()
    monkeypatch.setenv("TINYFLUX_SPARK_NO_SPREAD", "1")
    unpinned = n_exchanges()
    assert pinned == unpinned


def test_backoff_lms_identical_with_spread_disabled(spark, monkeypatch):
    # The r12 shared-tokenize layout (tokenize below the spread
    # exchange, size guards as when() projections) must be a pure
    # physical change: results bit-identical with the spread disabled.
    rows = [
        (0, "a b c d e f g a b c"),
        (1, "a b"),            # shorter than high orders
        (2, "single"),         # no bigram
        (3, ""),               # empty text
        (4, None),             # null text
        (5, "a b c a b c a b c d"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def snap():
        out = {}
        out["bi"] = sorted(map(tuple, text.bigram_logprob(
            df, "doc_id", "text").collect()))
        out["tri"] = sorted(map(tuple, text.trigram_logprob(
            df, "doc_id", "text").collect()))
        out["kn"] = sorted(map(tuple, text.kneser_ney_logprob(
            df, "doc_id", "text").collect()))
        out["ng"] = sorted(map(tuple, text.ngram_backoff_logprob(
            df, "doc_id", "text", order=4, prune_min_count=2
        ).collect()))
        return out

    monkeypatch.delenv("TINYFLUX_SPARK_NO_SPREAD", raising=False)
    with_spread = snap()
    monkeypatch.setenv("TINYFLUX_SPARK_NO_SPREAD", "1")
    without = snap()
    assert with_spread == without


def test_interval_join_broadcast_matches_shuffle_path(spark):
    pts = [(p,) for p in [0, 5, 9, 10, 11, 25, 40, 99]]
    ivs = [(0, 0, 0), (1, 3, 12), (2, 10, 10), (3, 8, 41), (5, 90, 120)]
    p = spark.createDataFrame(pts, ["t"]).coalesce(1)
    iv = spark.createDataFrame(ivs, ["iv_id", "s", "e"]).coalesce(1)
    shuffled = sorted(
        (r["iv_id"], r["t"])
        for r in aggregates.interval_join(
            p, iv, "t", "s", "e", bin_width=10
        ).collect()
    )
    bcast = sorted(
        (r["iv_id"], r["t"])
        for r in aggregates.interval_join(
            p, iv, "t", "s", "e", bin_width=10, broadcast_points=True
        ).collect()
    )
    assert bcast == shuffled


def test_shingle_fingerprint_identical_on_single_partition_input(spark):
    rows = [(i, f"some document text number {i} with shingles") for i in range(20)]
    one = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    many = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, text.shingle_fingerprint(one, "doc_id", "text", n=8).collect()))
    b = sorted(map(tuple, text.shingle_fingerprint(many, "doc_id", "text", n=8).collect()))
    assert a == b


# ---------------- similarity ----------------

@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 20):
        noise = rng.standard_normal(8) * (0.01 if i < 5 else 1.0)
        rows.append((i, [float(x) for x in base + noise]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def test_cosine_topk_exact(vecs):
    base = vecs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = similarity.cosine_topk(vecs, base, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine_sim"] == 1.0
    assert {r["vec_id"] for r in top} == {0, 1, 2, 3, 4}


def test_srp_lsh_topk_recall(vecs):
    base = vecs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    approx = similarity.srp_lsh_topk(
        vecs, base, k=5, num_planes=6, multiprobe=1
    ).collect()
    got = {r["vec_id"] for r in approx}
    # the tight cluster must survive bucketing
    assert {0, 1, 2, 3, 4} <= got | set()


def test_near_dup_pairs(vecs):
    pairs = similarity.near_dup_pairs(vecs, threshold=0.999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got or (0, 2) in got
    assert all(r["cosine_sim"] >= 0.999 for r in pairs)


# ---------------- aggregates ----------------

def test_time_bucket(spark):
    from datetime import datetime, timezone

    rows = [
        (datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc), float(m))
        for m in (1, 2, 31, 32)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = aggregates.time_bucket(
        df, "ts", "30 minutes", [F.count("*").alias("n")]
    ).orderBy("bucket_start").collect()
    assert [r["n"] for r in out] == [2, 2]


def test_moving_avg(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(5)], ["i", "v"]
    )
    out = (
        aggregates.moving_avg(df, "i", "v", 3)
        .orderBy("i")
        .collect()
    )
    assert [r["moving_avg"] for r in out] == [0.0, 0.5, 1.0, 2.0, 3.0]


def test_top_k(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 5.0)], ["g", "v"]
    )
    out = aggregates.top_k(df, ["g"], [F.col("v").desc()], 2).collect()
    got = {(r["g"], r["v"]) for r in out}
    assert got == {("a", 3.0), ("a", 2.0), ("b", 5.0)}


def test_asof_join(spark):
    from datetime import datetime, timezone

    t = lambda m: datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)  # noqa
    trades = spark.createDataFrame(
        [(1, t(5), 100.0), (1, t(10), 101.0), (2, t(7), 50.0)],
        ["sym", "ts", "price"],
    )
    quotes = spark.createDataFrame(
        [(1, t(4), 99.5), (1, t(10), 100.9), (2, t(8), 49.9)],
        ["sym", "qts", "bid"],
    )
    out = aggregates.asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts"
    ).collect()
    got = {(r["sym"], r["ts"].minute): r["bid_asof"] for r in out}
    assert got[(1, 5)] == 99.5
    assert got[(1, 10)] == 100.9   # inclusive: equal ts matches
    assert got[(2, 7)] is None     # quote arrives after the trade


# ---------------- multimodal ----------------

def test_extract_features_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=10)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 10
    feats = {r["media_id"]: r["feature"] for r in out}
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats.values())
    # deterministic stub: same bytes → same features
    out2 = multimodal.extract_features(media).collect()
    feats2 = {r["media_id"]: r["feature"] for r in out2}
    assert feats == feats2
    assert all(r["n_bytes"] == 256 for r in out)


def test_extract_features_strict_raises(spark):
    media = multimodal.synthetic_media(spark, n=2)
    with pytest.raises(Exception):
        multimodal.extract_features(media, strict=True).collect()


def test_png_roundtrip_all_encoder_filters():
    """Real PNG codec: encode → decode is the identity for every
    encoder filter type; the decoder unfilters each independently."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    encodings = [
        multimodal.encode_png(px, filter_type=ft) for ft in (0, 1, 2)
    ]
    for data in encodings:
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert (multimodal.decode_png(data) == px).all()
    # filters produce different streams of the same image
    assert len({e for e in encodings}) == 3


def test_png_roundtrip_color_types():
    """Color PNG support: RGB, palette (PLTE), gray+alpha and RGBA all
    round-trip through every encoder filter type — the Sub filter's
    left neighbor sits bpp bytes back, so bpp = 2/3/4 exercise the
    byte-depth-aware unfiltering the grayscale path never hits."""
    rng = np.random.default_rng(11)
    for channels in (2, 3, 4):
        px = rng.integers(0, 256, size=(9, 7, channels), dtype=np.uint8)
        for ft in (0, 1, 2):
            got = multimodal.decode_png(
                multimodal.encode_png(px, filter_type=ft)
            )
            assert got.shape == px.shape
            assert (got == px).all(), (channels, ft)
    # palette: indices + PLTE expand to the palette's RGB rows
    idx = rng.integers(0, 5, size=(8, 8), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    for ft in (0, 1, 2):
        got = multimodal.decode_png(
            multimodal.encode_png(idx, filter_type=ft, palette=pal)
        )
        assert got.shape == (8, 8, 3)
        assert (got == pal[idx]).all()


def _png_manual_filters(px, filters, palette=None):
    """A PNG whose rows carry the given per-row filter types (3 =
    Average, 4 = Paeth included), filtered per the spec from the
    reconstructed (= original) neighbors — exists to drive the decoder
    over filter rows the encoder never emits."""
    import struct
    import zlib

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        bpp, flat = 1, arr.astype(int)
        ctype = 3 if palette is not None else 0
    else:
        h, w, bpp = arr.shape
        flat = arr.reshape(h, w * bpp).astype(int)
        ctype = {2: 4, 3: 2, 4: 6}[bpp]
    raw = bytearray()
    for r, ft in enumerate(filters):
        raw.append(ft)
        for c in range(w * bpp):
            x = flat[r, c]
            a = flat[r, c - bpp] if c >= bpp else 0
            b = flat[r - 1, c] if r else 0
            cc = flat[r - 1, c - bpp] if r and c >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - (a + b) // 2
            elif ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                )
                v = x - pred
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += multimodal._png_chunk(
            b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes()
        )
    return (
        out
        + multimodal._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + multimodal._png_chunk(b"IEND", b"")
    )


def test_png_decode_average_and_paeth_filters():
    """Decoder-only filters (Average=3, Paeth=4), which real encoders
    emit but ours doesn't: hand-filtered streams mixing all five types
    per image must reconstruct exactly, for grayscale (bpp=1) and RGB
    (bpp=3)."""
    rng = np.random.default_rng(13)
    filters = [3, 4, 0, 1, 2, 4, 3]
    gray = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
    assert (
        multimodal.decode_png(_png_manual_filters(gray, filters)) == gray
    ).all()
    rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    got = multimodal.decode_png(_png_manual_filters(rgb, filters))
    assert (got == rgb).all()


def test_png_decode_rejects_unsupported():
    px = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(multimodal.encode_png(px))
    # flip IHDR interlace byte (offset: 8 sig + 8 chunk hdr + 12)
    data[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="Adam7"):
        multimodal.decode_png(bytes(data))
    data = bytearray(multimodal.encode_png(px))
    data[8 + 8 + 8] = 16  # depth byte
    with pytest.raises(ValueError, match="8-bit"):
        multimodal.decode_png(bytes(data))
    # every malformed input gets a ValueError, never a bare
    # KeyError/NameError: signed-but-IHDR-less stream, a 1-channel
    # 3-D array (spell grayscale as (h, w)), a 5-channel array, and
    # palette supplied alongside channelled pixels
    import zlib as _z

    no_ihdr = (
        b"\x89PNG\r\n\x1a\n"
        + multimodal._png_chunk(b"IDAT", _z.compress(b""))
        + multimodal._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.decode_png(no_ihdr)
    with pytest.raises(ValueError, match="channels"):
        multimodal.encode_png(np.zeros((4, 4, 1), dtype=np.uint8))
    with pytest.raises(ValueError, match="channels"):
        multimodal.encode_png(np.zeros((4, 4, 5), dtype=np.uint8))
    with pytest.raises(ValueError, match="palette"):
        multimodal.encode_png(
            np.zeros((4, 4, 3), dtype=np.uint8),
            palette=np.zeros((2, 3), dtype=np.uint8),
        )
    # corrupt streams surface as ValueError too, not zlib/struct errors
    ihdr_only = (
        b"\x89PNG\r\n\x1a\n"
        + multimodal._png_chunk(
            b"IHDR",
            np.uint32([4, 4]).astype(">u4").tobytes() + bytes([8, 0, 0, 0, 0]),
        )
        + multimodal._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        multimodal.decode_png(ihdr_only)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\n\x00\x00")
    good = multimodal.encode_png(np.zeros((4, 4), dtype=np.uint8))
    # corrupt the IDAT payload bytes in place -> zlib failure -> ValueError
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 4 : idat_at + 8] = b"\xde\xad\xbe\xef"
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        multimodal.decode_png(bytes(bad))
    # a chunk whose declared length runs past the buffer (PNG cut
    # mid-IHDR) is a ValueError, not a struct.error / short slice
    cut_mid_ihdr = good[: 8 + 8 + 6]  # sig + chunk hdr + 6 of 13 bytes
    with pytest.raises(ValueError, match="truncated PNG chunk body"):
        multimodal.decode_png(cut_mid_ihdr)
    # IHDR chunk declaring a body shorter than the 13 required bytes
    short_ihdr = (
        b"\x89PNG\r\n\x1a\n"
        + multimodal._png_chunk(b"IHDR", b"\x00" * 6)
        + multimodal._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated PNG IHDR"):
        multimodal.decode_png(short_ihdr)
    # palette pixel index past the PLTE entry count -> ValueError, not
    # a raw numpy IndexError
    pal_img = multimodal.encode_png(
        np.full((2, 2), 3, dtype=np.uint8),
        palette=np.zeros((4, 3), dtype=np.uint8),
    )
    short_pal = bytearray(pal_img)
    plte_at = pal_img.index(b"PLTE")
    # shrink PLTE from 4 entries (12 bytes) to 2 (6 bytes); CRC is not
    # verified by the decoder so splice length + body directly
    short_pal[plte_at - 4 : plte_at + 4 + 12] = (
        b"\x00\x00\x00\x06" + b"PLTE" + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="palette index out of range"):
        multimodal.decode_png(bytes(short_pal))


def test_wav_roundtrip():
    samples = multimodal.synthetic_samples(3)
    data = multimodal.encode_wav(samples)
    assert data[:4] == b"RIFF"
    assert (multimodal.decode_wav(data) == samples).all()
    # WAV size is closed-form: 44-byte header + 2 bytes/sample
    assert len(data) == 44 + 2 * len(samples)


def test_media_decode_dispatch():
    px = multimodal.synthetic_pixels(5)
    img = multimodal.media_decode(multimodal.encode_png(px), "image")
    assert (img == px.reshape(-1).astype(float)).all()
    au = multimodal.media_decode(
        multimodal.encode_wav(multimodal.synthetic_samples(5)), "audio"
    )
    assert (au == multimodal.synthetic_samples(5).astype(float)).all()
    with pytest.raises(ValueError):
        multimodal.media_decode(b"\x00garbage", "image")


def test_extract_features_real_decode(spark):
    """End-to-end real decode through mapInPandas: features of the PNG
    table equal the row means of the generative pixel pattern, and the
    WAV table decodes to its sample-group means."""
    media = multimodal.synthetic_media(spark, n=6, kind="image", codec="png")
    out = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(
            media, decode=multimodal.media_decode
        ).collect()
    }
    for i in range(6):
        px = multimodal.synthetic_pixels(i).astype(float)
        for r in range(multimodal.FEATURE_DIM):
            assert out[i][r] == px[r].mean()
    audio = multimodal.synthetic_media(spark, n=4, kind="audio", codec="wav")
    got = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(
            audio, decode=multimodal.media_decode
        ).collect()
    }
    for i in range(4):
        s = multimodal.synthetic_samples(i).astype(float)
        grouped = s.reshape(multimodal.FEATURE_DIM, -1).mean(axis=1)
        assert got[i] == grouped.tolist()


def test_media_bytes_never_shuffled(spark):
    """The binary column must be projected away before any exchange:
    aggregate the real-decode features and assert no plan node above or
    below an Exchange carries the bytes column."""
    media = multimodal.synthetic_media(spark, n=8, kind="image", codec="png")
    feats = multimodal.extract_features(media, decode=multimodal.media_decode)
    agg = feats.groupBy("kind").agg(F.avg(F.col("feature")[0]).alias("m"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line


def test_frame_sample(spark):
    media = multimodal.synthetic_media(spark, n=3, kind="video")
    out = multimodal.frame_sample(media, every_n=10, max_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert by_id[0] == [0, 10, 20, 30]  # n_frames=40 → 4 samples
    assert all(len(v) <= 4 for v in by_id.values())


def test_simhash_pairs_hamming(docs):
    pairs = dedup.simhash_pairs(
        docs, "doc_id", bits=32, max_hamming=6
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 3)) == 0          # identical text
    assert (0, 1) in got                 # near dup within the ball
    assert all(h <= 6 for h in got.values())


def test_sessionize_gaps_and_islands(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u1", t0),
        ("u1", t0 + timedelta(minutes=5)),    # same session
        ("u1", t0 + timedelta(minutes=60)),   # gap > 30m → new session
        ("u2", t0),                           # other key independent
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = aggregates.session_stats(df, "user_id", "ts", 1800.0).collect()
    stats = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
    assert stats == {("u1", 1): 2, ("u1", 2): 1, ("u2", 1): 1}


def test_simhash_64_bit(docs):
    """bits=64 must build and run: the sign bit (1<<63) needs shiftleft
    assembly and the md5 hash two-half construction."""
    from tinyflux_spark.operators.dedup import simhash

    out = simhash(docs, "doc_id", bits=64, use_md5=True).collect()
    assert len(out) == docs.count()
    sigs = [r["simhash"] for r in out]
    assert all(s is not None for s in sigs)
    # 64-bit signatures should use high bits for at least one doc
    assert any(s < 0 or s >= (1 << 32) for s in sigs)
    # deterministic
    out2 = simhash(docs, "doc_id", bits=64, use_md5=True).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_simhash_pairs_64_bit(docs):
    from tinyflux_spark.operators.dedup import simhash_pairs

    pairs = simhash_pairs(docs, "doc_id", bits=64, max_hamming=3).collect()
    for r in pairs:
        assert r["hamming"] <= 3


def test_lang_id_tie_prefers_earlier_declared(spark):
    """On a stopword-count tie, the FIRST language in _STOPWORDS
    declaration order wins (documented priority)."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.text import _STOPWORDS, lang_id

    langs = list(_STOPWORDS)
    first, second = langs[0], langs[1]
    # one stopword from each of the first two languages -> tie at 1
    text = f"{_STOPWORDS[first][0]} {_STOPWORDS[second][0]}"
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(lang_id("text").alias("g")).collect()[0]["g"]
    assert got == first


def test_duplicate_clusters_transitive(spark):
    """A~B, B~C, D~E: transitive closure puts A,B,C in one cluster
    keyed by the min id, D,E in another."""
    from tinyflux_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 7)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["cluster"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_duplicate_clusters_long_chain(spark):
    """A path graph needs multiple propagation rounds — exercises the
    convergence loop beyond one hop."""
    from tinyflux_spark.operators.dedup import duplicate_clusters

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = duplicate_clusters(pairs).collect()
    assert all(r["cluster"] == 0 for r in got)
    assert len(got) == n + 1


def test_dedup_keep_canonical(spark, docs):
    """Only the min-id member of each duplicate cluster survives;
    docs with no duplicate pair are untouched."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        docs, "doc_id", verify_threshold=0.6
    ).select("id_a", "id_b")
    kept = dedup_keep_canonical(docs, pairs, "doc_id")
    n_docs = docs.count()
    n_losers = (
        pairs.select(F.col("id_b").alias("x"))
        .union(pairs.select("id_a"))
        .distinct()
        .count()
    )
    # every pair member except one canonical per cluster is dropped
    assert kept.count() < n_docs or n_losers == 0
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for r in pairs.collect():
        assert not (r["id_a"] in kept_ids and r["id_b"] in kept_ids) or (
            r["id_a"] == r["id_b"]
        )


def test_ivf_topk_full_probe_equals_exact(spark):
    """Probing every inverted list must reduce IVF to the exact scan —
    the recall knob's boundary condition."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    corpus = emb.where(F.col("vec_id") != 0)
    exact = [(r["vec_id"], r["cosine_sim"])
             for r in cosine_topk(corpus, q, k=5).collect()]
    full = [(r["vec_id"], r["cosine_sim"])
            for r in ivf_topk(corpus, q, k=5, num_centroids=8,
                              nprobe=8).collect()]
    assert full == exact


def test_ivf_topk_deterministic_and_subset(spark):
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    corpus = emb.where(F.col("vec_id") != 0)
    a = [r["vec_id"] for r in ivf_topk(corpus, q, k=5, num_centroids=8,
                                       nprobe=2).collect()]
    b = [r["vec_id"] for r in ivf_topk(corpus, q, k=5, num_centroids=8,
                                       nprobe=2).collect()]
    assert a == b
    # every approximate result is a real corpus vector with its exact
    # similarity (IVF never fabricates scores)
    exact_all = {
        r["vec_id"]: r["cosine_sim"]
        for r in cosine_topk(corpus, q, k=10**6).collect()
    }
    for r in ivf_topk(corpus, q, k=5, num_centroids=8, nprobe=2).collect():
        assert exact_all[r["vec_id"]] == r["cosine_sim"]


# ---------------------------------------------------------------------------
# Sampling operators
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.sampling import hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in hash_sample(
            docs.repartition(7, F.col("source")), "doc_id", 0.5
        ).collect()
    )
    assert a == b and a  # same picks regardless of layout
    n = docs.count()
    assert 0.3 * n < len(a) < 0.7 * n  # rate is roughly honored


def test_hash_sample_rate_validation(spark):
    import pytest as _pytest

    from tinyflux_spark.operators.sampling import hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for bad in (0.0, 1.0, -0.1, 2.0):
        with _pytest.raises(ValueError):
            hash_sample(docs, "doc_id", bad)


def test_stratified_quota_caps_and_prefilter_consistency(spark):
    from tinyflux_spark.operators.sampling import stratified_quota

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    picked = stratified_quota(docs, "source", "doc_id", 3).collect()
    per = {}
    for r in picked:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per and all(v <= 3 for v in per.values())
    # a generous prefilter keeps a superset of every final pick, so the
    # result must be identical (same salt => same ordering key)
    pre = stratified_quota(
        docs, "source", "doc_id", 3, prefilter_rate=0.9
    ).collect()
    assert sorted(r["doc_id"] for r in pre) == sorted(
        r["doc_id"] for r in picked
    )


def test_repetition_stats_known_values(spark):
    from tinyflux_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 words, 1 distinct; 3 bigrams, 1 distinct
            (2, "a b c d"),          # all unique
            (3, "x"),                # single word -> no bigrams
            (4, "a b a b"),          # bigrams: "a b","b a","a b" -> 2/3 distinct
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id").collect()}
    assert out[1]["n_words"] == 4 and out[1]["n_distinct_words"] == 1
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["n_bigrams"] == 3 and out[1]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_bigrams"] == 0 and out[3]["dup_bigram_frac"] == 0.0
    assert out[4]["n_distinct_bigrams"] == 2
    assert out[4]["dup_bigram_frac"] == round(1 - 2 / 3, 6)


def test_value_deciles_counts_and_bounds(spark):
    from tinyflux_spark.operators.aggregates import value_deciles

    # 100 rows valued 0..99 -> 10 buckets of 10, min/max exact
    df = spark.createDataFrame([(i, i) for i in range(100)], ["id", "v"])
    rows = {
        r["bucket"]: r
        for r in value_deciles(df, "v", k=10).collect()
    }
    assert sorted(rows) == list(range(10))
    for b, r in rows.items():
        assert r["n_rows"] == 10
        assert r["min_val"] == b * 10 and r["max_val"] == b * 10 + 9
    # ties share a bucket: one dominant value never splits
    df2 = spark.createDataFrame(
        [(i, 5) for i in range(90)] + [(90 + i, 100 + i) for i in range(10)],
        ["id", "v"],
    )
    rows2 = value_deciles(df2, "v", k=10).collect()
    five = [r for r in rows2 if r["min_val"] == 5]
    assert len(five) == 1 and five[0]["n_rows"] == 90


def test_hash_sample_extreme_rates(spark):
    """Rates near the bucket-granularity edges: near-1 keeps nearly
    everything (the 4-digit predecessor overflowed and kept ~6%), and
    degenerate rates are rejected instead of silently keeping 0/all."""
    import pytest as _pytest

    from tinyflux_spark.operators.sampling import hash_sample

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    kept = hash_sample(docs, "doc_id", 0.999999).count()
    assert kept >= 1990
    few = hash_sample(docs, "doc_id", 0.001).count()
    assert few <= 20
    with _pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1e-12)


def test_repetition_stats_empty_doc(spark):
    from tinyflux_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a a")], ["id", "text"]
    )
    got = {r["id"]: r for r in repetition_stats(df, "id").collect()}
    assert got[1]["n_words"] == 0 and got[1]["dup_word_frac"] == 0.0
    assert got[2]["n_words"] == 0
    assert got[3]["n_words"] == 2 and got[3]["dup_word_frac"] == 0.5


def test_ivf_centroids_empty_and_type_guard(spark):
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.similarity import ivf_centroids

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    assert ivf_centroids(empty) == []
    strs = spark.createDataFrame(
        [("a", [1.0, 0.0])], ["vec_id", "embedding"]
    )
    with _pytest.raises(ValueError, match="integral id"):
        ivf_centroids(strs)


def test_shard_assign_deterministic_balanced_in_range(spark):
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.sampling import shard_assign

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["shard"]
         for r in shard_assign(docs, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shard_assign(
             docs.repartition(5, _F.col("source")), "doc_id", 8
         ).collect()}
    assert a == b and len(a) == docs.count()  # layout-invariant
    assert set(a.values()) <= set(range(8))
    per = [list(a.values()).count(s) for s in range(8)]
    n = len(a)
    assert all(0.4 * n / 8 < c < 1.8 * n / 8 for c in per)  # balanced-ish
    # different salt => a different (still deterministic) split
    c = {r["doc_id"]: r["shard"]
         for r in shard_assign(docs, "doc_id", 8, salt="other").collect()}
    assert c != a
    with _pytest.raises(ValueError):
        shard_assign(docs, "doc_id", 0)


def test_pack_sequences_layout_model(spark):
    import hashlib

    import pytest as _pytest
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.sampling import shard_assign
    from tinyflux_spark.operators.text import pack_sequences, token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    staged = shard_assign(docs, "doc_id", 4, salt="s").withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    rows = pack_sequences(
        staged, "doc_id", "n_tokens", capacity=128, salt="p"
    ).select("doc_id", "shard", "n_tokens", "pack", "pack_offset").collect()

    # Python model: per shard, order by (md5('p:'+id), id), concatenate,
    # cut at 128-token boundaries.
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    got = {(r["doc_id"]): (r["pack"], r["pack_offset"]) for r in rows}
    for shard, members in by_shard.items():
        key = lambda r: (  # noqa: E731
            hashlib.md5(f"p:{r['doc_id']}".encode()).hexdigest(),
            r["doc_id"],
        )
        start = 0
        for r in sorted(members, key=key):
            assert got[r["doc_id"]] == (start // 128, start % 128), (
                shard, r["doc_id"])
            start += r["n_tokens"]
    # every doc appears exactly once
    assert len(got) == docs.count()
    with _pytest.raises(ValueError):
        pack_sequences(staged, "doc_id", "n_tokens", capacity=0)


def test_contamination_hits_flags_shared_ngrams_only(spark):
    from tinyflux_spark.operators.dedup import contamination_hits

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different wording here with nothing shared"),
            (3, "QUICK   Brown fox appears in this one too"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps today")],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: r
        for r in contamination_hits(
            train, test, "doc_id", n=3
        ).collect()
    }
    # doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps"
    assert got[1]["n_hits"] == 3
    assert got[1]["sample_shingle"] == "brown fox jumps"
    # doc 3 shares "quick brown fox" (case/whitespace-normalized)
    assert got[3]["n_hits"] == 1
    # doc 2 shares nothing and is absent
    assert 2 not in got


def test_ivf_topk_batch_matches_per_query_path(spark):
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.similarity import ivf_topk, ivf_topk_batch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(_F.col("vec_id") % 100 == 0)
    batch = ivf_topk_batch(emb, queries, k=5, nprobe=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine_sim"])
        )
    assert sorted(got) == [0, 100, 200, 300, 400]
    for qid, rows in got.items():
        # per-query single-vector path over the same corpus minus self
        qvec = emb.where(_F.col("vec_id") == qid).collect()[0]["embedding"]
        single = ivf_topk(
            emb.where(_F.col("vec_id") != qid), qvec, k=5, nprobe=4
        ).collect()
        # codebooks differ (corpus-minus-self vs full corpus) so exact
        # list membership can shift; ranks must be 1..5 and sims sorted
        ranks = sorted(r[0] for r in rows)
        assert ranks == [1, 2, 3, 4, 5], (qid, ranks)
        sims = [r[2] for r in sorted(rows)]
        assert sims == sorted(sims, reverse=True), (qid, sims)
        # self never appears
        assert all(r[1] != qid for r in rows)


def test_ivf_topk_batch_full_probe_is_exact(spark):
    """With nprobe == num_centroids every list is scanned, so the batch
    result must equal brute-force cosine top-k for every query."""
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.similarity import cosine_topk, ivf_topk_batch

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200).cache()
    queries = emb.where(_F.col("vec_id") % 100 == 0)
    batch = ivf_topk_batch(
        emb, queries, k=3, num_centroids=4, nprobe=4
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid in got:
        qvec = emb.where(_F.col("vec_id") == qid).collect()[0]["embedding"]
        exact = cosine_topk(
            emb.where(_F.col("vec_id") != qid), qvec, k=3
        ).collect()
        assert [v for _, v in sorted(got[qid])] == [
            r["vec_id"] for r in exact
        ], qid


def test_ivf_topk_batch_rejects_degenerate_params(spark):
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from tinyflux_spark.operators.similarity import ivf_topk_batch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(_F.col("vec_id") == 0)
    with _pytest.raises(ValueError, match="nprobe"):
        ivf_topk_batch(emb, q, k=5, nprobe=0)
    with _pytest.raises(ValueError, match="k must"):
        ivf_topk_batch(emb, q, k=0, nprobe=4)


def test_quality_filter_reasons(spark):
    from tinyflux_spark.operators.text import quality_filter

    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "hi"),
            (4, "!!! ??? ... ;;; ::: ,,, !!! ??? ... ;;;"),
            (5, "01234 56789 01234 56789 98765 43210 11111 22222"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["keep"], list(r["reasons"]))
        for r in quality_filter(
            df, "doc_id",
            min_tokens=5, max_tokens=100,
            max_punct_ratio=0.10, max_digit_ratio=0.20,
            max_dup_word_frac=0.50, max_dup_bigram_frac=0.90,
        ).collect()
    }
    assert got[1] == (True, [])
    assert got[2][0] is False and "dup_words" in got[2][1]
    assert got[3][0] is False and "too_few_tokens" in got[3][1]
    assert got[4][0] is False and "punct_ratio" in got[4][1]
    assert got[5][0] is False and "digit_ratio" in got[5][1]
    # multiple violations all reported, sorted
    assert got[4][1] == sorted(got[4][1])


def test_quality_filter_matches_python_model(spark):
    """Property: quality_filter's keep/reasons equal a plain-Python
    spec over random ASCII documents (same dual-evaluation strategy as
    test_property_queries.py)."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tinyflux_spark.operators.text import quality_filter

    P = dict(
        min_tokens=3, max_tokens=12,
        max_punct_ratio=0.08, max_digit_ratio=0.15,
        max_dup_word_frac=0.4, max_dup_bigram_frac=0.3,
        min_mean_token_len=2.0, max_mean_token_len=6.0,
    )

    token = st.one_of(
        st.from_regex(r"[a-z]{1,6}", fullmatch=True),
        st.sampled_from(["cat", "dog", "7", "42", "!", "?.,", "a1b2"]),
    )
    docs_strategy = st.lists(
        st.lists(token, min_size=0, max_size=16).map(" ".join),
        min_size=1,
        max_size=8,
    )

    def model(doc):
        t = doc.strip()
        toks = re.split(r"\s+", t) if t != "" else []
        n_tokens = len(toks)
        n_chars = len(doc)
        punct = len(re.findall(r"[.,;:!?]", doc))
        digit = len(re.findall(r"[0-9]", doc))
        ws = len(re.findall(r"\s", doc))

        def r6(x):
            # HALF_UP like Spark's round() (Python round is HALF_EVEN)
            import decimal
            return float(
                decimal.Decimal(x).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )

        punct_ratio = r6(punct / max(n_chars, 1))
        digit_ratio = r6(digit / max(n_chars, 1))
        mtl = r6((n_chars - ws) / max(n_tokens, 1))
        dup_w = (
            r6(1 - len(set(toks)) / len(toks)) if toks else 0.0
        )
        bgs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        dup_b = r6(1 - len(set(bgs)) / len(bgs)) if bgs else 0.0
        reasons = sorted(
            name
            for name, bad in [
                ("too_few_tokens", n_tokens < P["min_tokens"]),
                ("too_many_tokens", n_tokens > P["max_tokens"]),
                ("punct_ratio", punct_ratio > P["max_punct_ratio"]),
                ("digit_ratio", digit_ratio > P["max_digit_ratio"]),
                ("dup_words", dup_w > P["max_dup_word_frac"]),
                ("dup_bigrams", dup_b > P["max_dup_bigram_frac"]),
                (
                    "token_len",
                    mtl < P["min_mean_token_len"]
                    or mtl > P["max_mean_token_len"],
                ),
            ]
            if bad
        )
        return (len(reasons) == 0, reasons)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs_strategy)
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (r["keep"], list(r["reasons"]))
            for r in quality_filter(df, "doc_id", **P).collect()
        }
        for i, doc in enumerate(texts):
            assert got[i] == model(doc), (doc, got[i], model(doc))

    run()


# ---------------- extension round 4: bm25 / quantize / edit distance --

def test_bm25_scores_match_python_model(spark):
    """BM25 against a hand-computed model on a tiny corpus."""
    import math

    corpus = [
        (0, "hash join hash probe build"),
        (1, "vector scan filter"),
        (2, "nothing relevant here"),
        (3, "hash"),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {
        r["id"]: (r["n_matched_terms"], r["score"])
        for r in text.bm25_scores(df, ["hash", "vector"], "doc_id").collect()
    }
    # doc 2 has zero matches -> absent
    assert set(out) == {0, 1, 3}
    n_docs, k1, b = 4, 1.2, 0.75
    dls = {i: len(t.split()) for i, t in corpus}
    avgdl = sum(dls.values()) / n_docs
    dfreq = {"hash": 2, "vector": 1}
    tfs = {0: {"hash": 2}, 1: {"vector": 1}, 3: {"hash": 1}}

    def idf(t):
        return math.log(1.0 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))

    for i, terms in tfs.items():
        want = sum(
            idf(t)
            * (tf * (k1 + 1))
            / (tf + k1 * ((1 - b) + (b * dls[i]) / avgdl))
            for t, tf in terms.items()
        )
        assert out[i][0] == len(terms)
        assert abs(out[i][1] - want) < 1e-9


def test_quantize_embeddings_roundtrip_properties(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> scale 0, q all 0
        (2, [2.0, 2.0, -2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["id"]: r for r in similarity.quantize_embeddings(
        df, "embedding", "vec_id").collect()}
    assert out[0]["scale"] == 1.0
    assert out[0]["q"] == [64, -127, 32, 0]  # round(0.5*127)=63.5->64
    assert out[0]["n_clipped"] == 1
    assert out[1]["scale"] == 0.0 and out[1]["q"] == [0, 0, 0, 0]
    assert out[2]["q"] == [127, 127, -127, 64]
    assert out[2]["n_clipped"] == 3
    # dequantization error bounded by scale / (2 * 127)
    for r in rows:
        vec, q, scale = r[1], out[r[0]]["q"], out[r[0]]["scale"]
        for x, qi in zip(vec, q):
            deq = qi * scale / 127 if scale else 0.0
            assert abs(x - deq) <= scale / 254 + 1e-12


def test_edit_distance_pairs_detects_typos(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fax jumps over the lazy dog tonight"),  # 1 edit
        (2, "completely different content on another topic entirely"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # exact
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # bits=32 on this 10-token toy corpus: with so few tokens the
    # per-bit vote margins are tiny, so a one-word edit flips more than
    # max_hamming of a 64-bit signature's bits; 32 bits keeps the
    # banding recall high where the default 64 targets real documents.
    out = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in dedup.edit_distance_pairs(
            df, "doc_id", max_distance=5, bits=32
        ).collect()
    }
    assert out.get((0, 3)) == 0      # identical
    assert out.get((0, 1)) == 1      # one substitution
    assert out.get((1, 3)) == 1
    # unrelated doc never paired within the distance budget
    assert all(2 not in k for k in out)


def test_minhash_lsh_join_incremental(spark):
    """Asymmetric LSH join: finds cross-corpus near-dups only — no
    left×left or right×right pairs — and matches the symmetric
    operator's verified jaccard for the same pair."""
    left = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"],
    )
    right = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely unrelated content about query planners"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["id_left"], r["id_right"]): r["jaccard"]
        for r in dedup.minhash_lsh_join(
            left, right, "doc_id", verify_threshold=0.5
        ).collect()
    }
    assert (100, 0) in out and out[(100, 0)] == 1.0
    assert all(k[0] == 100 for k in out)   # left ids only on the left
    # cross-check against the symmetric operator over the union
    sym = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            left.unionByName(right), "doc_id", verify_threshold=0.5
        ).collect()
    }
    for (l, r_), j in out.items():
        assert sym[(min(l, r_), max(l, r_))] == j


def test_corpus_profile_card(spark):
    rows = [
        (0, "a b c d", "en", "web"),
        (1, "a b c d", "en", "web"),      # exact dup of 0
        (2, "x y", "en", "web"),
        (3, "uno dos tres", "es", "book"),
        (4, "", "es", "book"),            # empty doc: 0 tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {
        (r["lang"], r["source"]): r
        for r in text.corpus_profile(df).collect()
    }
    web = out[("en", "web")]
    assert web["n_docs"] == 3
    assert web["total_tokens"] == 4 + 4 + 2
    assert web["median_tokens"] == 4.0
    assert web["distinct_docs"] == 2          # docs 0/1 collapse
    assert web["exact_dup_rate"] == round(1 - 2 / 3, 6)
    book = out[("es", "book")]
    assert book["n_docs"] == 2
    assert book["total_tokens"] == 3
    assert book["median_tokens"] == 1.5       # interpolated midpoint
    assert book["exact_dup_rate"] == 0.0


def test_remove_boilerplate_spans_lines(spark):
    nav = "Home | About | Contact"
    rows = [
        (0, nav + "\nunique alpha text\nCookie notice"),
        (1, nav + "\ndifferent beta body\nCookie notice"),
        (2, nav + "\n\ngamma paragraph"),       # keeps its empty line
        (3, nav),                               # everything removed
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in text.remove_boilerplate_spans(
            df, "doc_id", "text", delimiter="\n", joiner="\n",
            min_doc_frac=0.5,
        ).collect()
    }
    assert len(out) == 4                        # no doc rows lost
    assert out[0]["clean_text"] == "unique alpha text"
    assert out[0]["n_removed"] == 2 and out[0]["n_kept"] == 1
    assert out[1]["clean_text"] == "different beta body"
    # empty spans are never boilerplate, and order survives removal
    assert out[2]["clean_text"] == "\ngamma paragraph"
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0


def test_temperature_sample_rates_and_determinism(spark):
    import hashlib

    rows = [(i, "big") for i in range(400)] + [
        (i, "small") for i in range(400, 500)
    ]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sampling.temperature_sample(df, "grp", "id", alpha=0.5,
                                      salt="tt").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    # the smallest group is kept whole at rate exactly 1
    assert len(by_grp["small"]) == 100
    assert all(r["keep_rate"] == 1.0 for r in by_grp["small"])
    # the big group's rate is sqrt(n_min/n), and membership replays
    # the md5 threshold exactly (pure function of (salt, id))
    rate = math.sqrt(100 / 400)
    thr = format(int(round(rate * (1 << 32))), "08x")
    expect = {
        i for i in range(400)
        if hashlib.md5(f"tt:{i}".encode()).hexdigest()[:8] < thr
    }
    got = {r["id"] for r in by_grp["big"]}
    assert got == expect
    assert all(r["keep_rate"] == rate for r in by_grp["big"])
    again = {
        r["id"]
        for r in sampling.temperature_sample(
            df.repartition(7), "grp", "id", alpha=0.5, salt="tt"
        ).collect()
    }
    assert again == {r["id"] for r in out}


def test_temperature_sample_alpha_one_noop(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], ["id", "grp"]
    )
    kept = sampling.temperature_sample(df, "grp", "id", alpha=1.0)
    assert kept.count() == 60


def test_interval_join_matches_bruteforce(spark):
    # points/intervals straddling bin boundaries, touching endpoints,
    # zero-length and inverted intervals
    pts = [(p,) for p in [0, 5, 9, 10, 11, 25, 40, 99]]
    ivs = [
        (0, 0, 0),      # zero-length, matches point 0 only
        (1, 3, 12),     # spans the 10-bin boundary
        (2, 10, 10),
        (3, 8, 41),     # spans four bins
        (4, 50, 45),    # inverted: drops out
        (5, 90, 120),
    ]
    p = spark.createDataFrame(pts, ["t"])
    iv = spark.createDataFrame(ivs, ["iv_id", "s", "e"])
    got = sorted(
        (r["iv_id"], r["t"])
        for r in aggregates.interval_join(
            p, iv, "t", "s", "e", bin_width=10
        ).collect()
    )
    expect = sorted(
        (i, t)
        for (i, s, e) in ivs
        for (t,) in pts
        if s <= t <= e
    )
    assert got == expect                 # exactly once per pair, no dups
    with pytest.raises(ValueError):
        aggregates.interval_join(p, iv, "t", "s", "e", bin_width=0)
    with pytest.raises(ValueError):
        aggregates.interval_join(
            p.withColumn("s", F.lit(1)), iv, "t", "s", "e", bin_width=10
        )
    # reserved internal column: withColumn would silently overwrite a
    # caller's _bin and mis-route the join — must raise instead
    with pytest.raises(ValueError, match="_bin"):
        aggregates.interval_join(
            p.withColumn("_bin", F.lit(1)), iv, "t", "s", "e",
            bin_width=10,
        )
    with pytest.raises(ValueError, match="_bin"):
        aggregates.interval_join(
            p, iv.withColumn("_bin", F.lit(1)), "t", "s", "e",
            bin_width=10,
        )


def test_unigram_logprob_model(spark):
    from decimal import ROUND_HALF_UP, Decimal

    rows = [(0, "a a a b"), (1, "b c"), (2, "")]  # empty doc drops out
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r for r in text.unigram_logprob(df).collect()
    }
    counts, total = {"a": 3, "b": 2, "c": 1}, 6

    def lp(tok):
        # the operator's DECIMAL(20,12) quantization, replayed
        return Decimal(math.log(counts[tok] / total)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    assert set(out) == {0, 1}
    assert out[0]["n_tokens"] == 4
    assert out[0]["avg_logp"] == float(
        (lp("a") * 3 + lp("b")) / 4
    )
    assert out[1]["avg_logp"] == float((lp("b") + lp("c")) / 2)
    # repartitioning must not move the score by even an ulp
    again = {
        r["id"]: r["avg_logp"]
        for r in text.unigram_logprob(df.repartition(5)).collect()
    }
    assert again == {k: v["avg_logp"] for k, v in out.items()}


def test_bigram_logprob_model(spark):
    """Stupid Backoff replayed in plain Python: seen bigrams score
    c2/c1, unseen-bigram-but-known-token backs off to alpha*c1/total,
    OOV tokens hit the alpha/total floor — each branch quantized to
    DECIMAL(20,12) before the order-free per-doc sum."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = [(0, "a b a b c"), (1, "a b"), (2, "x a"), (3, "z")]
    ref_rows = [(10, "a b a b"), (11, "b c a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["n_bigrams"], r["avg_logp"], r["backoff_frac"])
        for r in text.bigram_logprob(df, ref=ref, alpha=0.4).collect()
    }

    uni, big = {}, {}
    for _, t in ref_rows:
        ts = t.split()
        for tok in ts:
            uni[tok] = uni.get(tok, 0) + 1
        for i in range(len(ts) - 1):
            big[(ts[i], ts[i + 1])] = big.get((ts[i], ts[i + 1]), 0) + 1
    total = sum(uni.values())

    def q(x):
        return Decimal(x).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    def lp(w1, w2):
        if (w1, w2) in big:
            return q(math.log(big[(w1, w2)] / uni[w1])), 0
        if w2 in uni:
            return q(math.log(0.4 * (uni[w2] / total))), 1
        return q(math.log(0.4 / total)), 1

    model = {}
    for i, t in rows:
        ts = t.split()
        if len(ts) < 2:
            continue  # single-token docs have no bigram row
        lps = [lp(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        s = sum(x for x, _ in lps)
        m = sum(b for _, b in lps)
        model[i] = (len(lps), float(s) / len(lps), round(m / len(lps), 6))
    assert set(out) == set(model)
    for k, want in model.items():
        assert out[k][0] == want[0]
        assert abs(out[k][1] - want[1]) < 1e-12
        assert out[k][2] == want[2]
    # self-scoring default (ref=None): every bigram is seen, backoff 0
    self_scored = text.bigram_logprob(df).collect()
    assert all(r["backoff_frac"] == 0.0 for r in self_scored)
    with pytest.raises(ValueError):
        text.bigram_logprob(df, alpha=0.0)
    # ref needs no id column and may name its text column differently
    ref_alt = spark.createDataFrame(
        [(t,) for _, t in ref_rows], ["body"]
    )
    alt = {
        r["id"]: (r["n_bigrams"], r["avg_logp"], r["backoff_frac"])
        for r in text.bigram_logprob(
            df, ref=ref_alt, ref_text_col="body", alpha=0.4
        ).collect()
    }
    assert alt == out


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (9, "orphan")],
        ["k", "lv"],
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], ["k", "rv"]
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in aggregates.salted_join(
                left, right, ["k"], n_salts=5, how=how
            ).collect()
        )
        want = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in left.join(right, ["k"], how).collect()
        )
        assert got == want, how
    # n_salts=1 degenerates to the plain join
    assert aggregates.salted_join(left, right, ["k"], n_salts=1).count() == 5
    # the salt must be part of the physical join key
    plan = (
        aggregates.salted_join(left, right, ["k"], n_salts=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan
    with pytest.raises(ValueError):
        aggregates.salted_join(left, right, ["k"], n_salts=0)
    with pytest.raises(ValueError):
        aggregates.salted_join(left, right, ["k"], how="full")
    # reserved internal column: a caller _salt would be silently
    # overwritten (and the left hash would salt the overwritten value)
    with pytest.raises(ValueError, match="_salt"):
        aggregates.salted_join(
            left.withColumn("_salt", F.lit(0)), right, ["k"]
        )
    with pytest.raises(ValueError, match="_salt"):
        aggregates.salted_join(
            left, right.withColumn("_salt", F.lit(0)), ["k"]
        )


def test_rate_threshold_hex_clamps_near_one(spark):
    """A keep rate one ulp below 1 rounds to exactly 2^32 (9 hex
    chars); the clamp must pin it to ffffffff instead of letting
    lpad truncate it to 2^28 (~1/16 keep rate)."""
    rows = spark.createDataFrame(
        [(1.0 - 2.0 ** -40,), (1.0,), (0.5,), (0.0,)], ["r"]
    )
    got = [
        r[0]
        for r in rows.select(
            sampling.rate_threshold_hex(F.col("r")).alias("t")
        ).collect()
    ]
    assert got == ["ffffffff", "ffffffff", "80000000", "00000000"]


def test_merge_intervals_semantics(spark):
    ivs = [
        ("a", 1, 3), ("a", 2, 5), ("a", 5, 6),   # chain into [1,6]
        ("a", 8, 8),                             # point interval
        ("a", 10, 20), ("a", 12, 14),            # contained
        ("b", 1, 2), ("b", 4, 5),                # gap of 1 day
        ("b", 9, 7),                             # inverted: dropped
    ]
    df = spark.createDataFrame(ivs, ["k", "s", "e"])
    got = sorted(
        (r["key"], r["start"], r["end"], r["n_merged"])
        for r in aggregates.merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [
        ("a", 1, 6, 3), ("a", 8, 8, 1), ("a", 10, 20, 2),
        ("b", 1, 2, 1), ("b", 4, 5, 1),
    ]
    # b's periods are 1 intervening day apart (start - prev_end = 2),
    # so gap=1 keeps them separate and gap=2 welds them
    got_gap1 = sorted(
        (r["key"], r["start"], r["end"])
        for r in aggregates.merge_intervals(df, "k", "s", "e", gap=1)
        .collect()
        if r["key"] == "b"
    )
    assert got_gap1 == [("b", 1, 2), ("b", 4, 5)]
    got_gap2 = sorted(
        (r["key"], r["start"], r["end"])
        for r in aggregates.merge_intervals(df, "k", "s", "e", gap=2)
        .collect()
        if r["key"] == "b"
    )
    assert got_gap2 == [("b", 1, 5)]


def test_excise_duplicate_spans(spark):
    rows = [
        (0, "a b c d e"),        # first occurrence of "a b c": kept
        (1, "x a b c y"),        # later occurrence: excised
        (2, "p q a b c d r"),    # overlapping dup grams abc+bcd merge
        (3, "zz yy"),            # shorter than n: untouched
        (4, "a b c a b c d"),    # within-doc repeat AFTER global first
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["clean_text"], r["n_removed"], r["n_spans"])
        for r in dedup.excise_duplicate_spans(
            df, n=3, min_docs=2
        ).collect()
    }
    assert len(out) == 5                      # row count preserved
    assert out[0] == ("a b c d e", 0, 0)      # global first survives
    assert out[1] == ("x y", 3, 1)
    # doc2: grams "a b c"(pos 2) and "b c d"(pos 3) both dup -> ranges
    # [2,4] and [3,5] merge into one excised span [2,5]
    assert out[2] == ("p q r", 4, 1)
    assert out[3] == ("zz yy", 0, 0)
    # doc4: every "a b c" occurrence after doc0's is cut; "b c a",
    # "c a b" exist only here (min_docs=2 keeps them), "b c d" is cut
    # as a later occurrence of doc2's gram -> [0,2],[3,5],[4,6] merge
    assert out[4][1] > 0
    with pytest.raises(ValueError):
        dedup.excise_duplicate_spans(df, n=0)
    with pytest.raises(ValueError):
        dedup.excise_duplicate_spans(df, min_docs=1)


def test_rollup_card_levels(spark):
    import __spark_entry__ as em

    rows = {
        (r["level"], r["lang"], r["source"]): (
            r["n_docs"], r["total_tokens"]
        )
        for r in em.q90_rollup_card(spark, "/root/testdata/sf0.001")
        .collect()
    }
    leaves = {k: v for k, v in rows.items() if k[0] == 0}
    subtotals = {k: v for k, v in rows.items() if k[0] == 1}
    grand = {k: v for k, v in rows.items() if k[0] == 3}
    assert len(grand) == 1 and list(grand)[0][1:] == (None, None)
    # every level must reconcile: leaves roll into subtotals, subtotals
    # into the grand total — one Expand pass, three consistent levels
    for (lvl, lang, _), _v in subtotals.items():
        leaf_docs = sum(
            v[0] for (l0, lg, _s), v in leaves.items() if lg == lang
        )
        assert subtotals[(lvl, lang, None)][0] == leaf_docs
    assert list(grand.values())[0][0] == sum(v[0] for v in leaves.values())
    assert list(grand.values())[0][1] == sum(v[1] for v in leaves.values())


def test_normalize_text_forms_and_case(spark):
    """Engine output replayed with pure-Python unicodedata for every
    form/case combination over a hostile corpus: decomposed accents,
    the angstrom sign (NFC-composes to U+00C5), full-width letters and
    ligatures (NFKC-only changes), sharp s (casefold-only change),
    NULL text, and pure-ASCII rows (the fast path)."""
    import unicodedata

    corpus = [
        (0, "plain ascii stays"),
        (1, "cafe\u0301 de\u0301ja\u0300"),       # combining accents
        (2, "\u212bngstro\u0308m"),                # angstrom sign
        (3, "\uff21\uff22\uff23 \ufb01ne"),      # full-width + fi ligature
        (4, "STRA\u00dfE"),                         # sharp s
        (5, None),
        (6, "  spaced\u000bout\t text  "),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        for case in (None, "lower", "casefold"):
            got = {
                r["doc_id"]: r["text_norm"]
                for r in text.normalize_text(
                    df, form=form, case=case
                ).collect()
            }
            for i, t in corpus:
                want = unicodedata.normalize(form, t or "")
                if case == "lower":
                    want = want.lower()
                elif case == "casefold":
                    want = want.casefold()
                assert got[i] == want, (form, case, i)
    # collapse_ws trims and collapses runs (incl. \x0B, like Java \s)
    got = {
        r["doc_id"]: r["text_norm"]
        for r in text.normalize_text(df, collapse_ws=True).collect()
    }
    assert got[6] == "spaced out text"
    assert got[5] == ""
    with pytest.raises(ValueError, match="form"):
        text.normalize_text(df, form="NFX")
    with pytest.raises(ValueError, match="case"):
        text.normalize_text(df, case="upper")


def test_normalize_text_duckdb_nfc_parity(spark):
    """NFC parity engine-vs-oracle on non-ASCII text: DuckDB's
    nfc_normalize and Python's unicodedata both implement UAX #15 —
    the q92 gate relies on bit-identical agreement."""
    import duckdb

    corpus = [
        (0, "cafe\u0301"),
        (1, "\u212b A\u030a"),   # angstrom + A-with-ring decomposed
        (2, "\u1e9b\u0323"),     # long s w/ dot above + dot below (reorders)
        (3, "ascii only"),
        (4, "\uff76\uff9e"),     # half-width katakana ga (NFC keeps)
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text_norm"]
        for r in text.normalize_text(df, form="NFC").collect()
    }
    con = duckdb.connect()
    for i, t in corpus:
        (want,) = con.execute("select nfc_normalize(?)", [t]).fetchone()
        assert got[i] == want, i


def test_normalize_text_plan_is_arrow_not_row_udf(spark):
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    plan = text.normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_dedup_accepts_pre_normalized_column(spark):
    """A Column-valued text_col is used as-is by the dedup family (no
    re-normalization): the pre-normalized path must agree with the
    str path when the caller replays the engine normalization, and
    must NOT lower-case when the caller passes raw mixed-case text."""
    rows = [
        (0, "The  Quick\t FOX "),
        (1, "the quick fox"),
        (2, "another doc entirely with words"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pre = text.normalize_text(
        df, form="NFC", case="lower", collapse_ws=True, out_col="tn"
    )

    def canon(out):
        return sorted(
            tuple(r) for r in out.collect()
        )

    assert canon(
        dedup.exact_dedup(pre, "doc_id", text_col=F.col("tn"))
    ) == canon(dedup.exact_dedup(df, "doc_id", "text"))
    assert canon(
        dedup.minhash_lsh_pairs(pre, "doc_id", text_col=F.col("tn"))
    ) == canon(dedup.minhash_lsh_pairs(df, "doc_id", "text"))
    assert canon(
        dedup.simhash(pre, "doc_id", text_col=F.col("tn"))
    ) == canon(dedup.simhash(df, "doc_id", "text"))
    # pass-through really skips normalization: raw mixed-case Column
    # fingerprints docs 0 and 1 differently, the str path merges them
    merged = dedup.exact_dedup(df, "doc_id", "text").count()
    raw = dedup.exact_dedup(df, "doc_id", text_col=F.col("text")).count()
    assert raw == merged + 1


def test_minhash_lsh_join_precomputed_signatures(spark):
    """right_banded path: passing a precomputed banded_signatures table
    yields the identical verified pairs, and the verify prunes the
    corpus to candidate ids (a semi join in the plan) instead of
    re-shingling the whole corpus."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely different text about distributed analytics"),
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "totally unrelated corpus document about nothing shared"),
        (12, "completely different text about distributed analytics yes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    left = docs.where(F.col("doc_id") < 10)
    right = docs.where(F.col("doc_id") >= 10)
    kw = dict(num_hashes=12, bands=4, verify_threshold=0.5)
    plain = dedup.minhash_lsh_join(left, right, "doc_id", **kw)
    sig = dedup.banded_signatures(right, "doc_id",
                                  num_hashes=12, bands=4)
    pre = dedup.minhash_lsh_join(left, right, "doc_id",
                                 right_banded=sig, **kw)

    def canon(df):
        return sorted(
            (r["id_left"], r["id_right"], round(r["jaccard"], 9))
            for r in df.collect()
        )

    assert canon(pre) == canon(plain) and len(canon(plain)) >= 2
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # candidate-only path also holds with verify off
    assert canon(
        dedup.minhash_lsh_join(left, right, "doc_id", num_hashes=12,
                               bands=4, verify_threshold=None,
                               right_banded=sig)
        .withColumn("jaccard", F.lit(0.0))
    ) == sorted(
        (r["id_left"], r["id_right"], 0.0)
        for r in dedup.minhash_lsh_join(
            left, right, "doc_id", num_hashes=12, bands=4,
            verify_threshold=None).collect()
    )


def test_trigram_logprob_model(spark):
    """Trigram Stupid Backoff replayed in plain Python: seen trigrams
    score c3/c2ctx, bigram backoff alpha*c2/c1ctx, unigram backoff
    alpha^2*c1/total, OOV floor alpha^2/total — each branch quantized
    to DECIMAL(20,12) before the order-free per-doc sum; backoff_frac
    counts trigram-table misses, oov_frac counts bigram misses too."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = [
        (0, "a b c a b c d"),
        (1, "a b"),              # <3 tokens: no row
        (2, "c a b"),
        (3, "x y z"),            # all OOV
        (4, "b c x"),            # trigram miss, bigram (c,x)? miss; x OOV
        (5, "d b c"),            # trigram miss, bigram (b,c) HIT — the
                                 # backoff branch, with uni[b] != uni[c]
                                 # so a wrong-context join cannot pass
    ]
    ref_rows = [(10, "a b c a b d"), (11, "b c a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["n_trigrams"], r["avg_logp"], r["backoff_frac"],
                  r["oov_frac"])
        for r in text.trigram_logprob(df, ref=ref, alpha=0.4).collect()
    }

    uni, big, tri = {}, {}, {}
    for _, t in ref_rows:
        ts = t.split()
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(ts) - 1):
            big[(ts[i], ts[i + 1])] = big.get((ts[i], ts[i + 1]), 0) + 1
        for i in range(len(ts) - 2):
            k = (ts[i], ts[i + 1], ts[i + 2])
            tri[k] = tri.get(k, 0) + 1
    total = sum(uni.values())
    a, a2 = 0.4, 0.4 * 0.4

    def q(x):
        return Decimal(x).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    def lp(w1, w2, w3):
        if (w1, w2, w3) in tri:
            return q(math.log(tri[(w1, w2, w3)] / big[(w1, w2)])), 0, 0
        if (w2, w3) in big:
            return q(math.log(a * (big[(w2, w3)] / uni[w2]))), 1, 0
        if w3 in uni:
            return q(math.log(a2 * (uni[w3] / total))), 1, 1
        return q(math.log(a2 / total)), 1, 1

    model = {}
    for i, t in rows:
        ts = t.split()
        if len(ts) < 3:
            continue
        lps = [lp(*ts[j:j + 3]) for j in range(len(ts) - 2)]
        s = sum(x for x, _, _ in lps)
        m = sum(b for _, b, _ in lps)
        o = sum(c for _, _, c in lps)
        model[i] = (len(lps), float(s) / len(lps),
                    round(m / len(lps), 6), round(o / len(lps), 6))
    assert set(out) == set(model)
    for k, want in model.items():
        assert out[k][0] == want[0], k
        assert abs(out[k][1] - want[1]) < 1e-12, k
        assert out[k][2:] == want[2:], k
    # self-scoring default: every trigram seen, zero backoff
    self_scored = text.trigram_logprob(df).collect()
    assert all(r["backoff_frac"] == 0.0 for r in self_scored
               if r["n_trigrams"] > 0)
    with pytest.raises(ValueError):
        text.trigram_logprob(df, alpha=1.5)
    # ref with a different text column name and no id
    alt = {
        r["id"]: (r["n_trigrams"], r["avg_logp"], r["backoff_frac"],
                  r["oov_frac"])
        for r in text.trigram_logprob(
            df,
            ref=spark.createDataFrame(
                [(t,) for _, t in ref_rows], ["body"]
            ),
            ref_text_col="body", alpha=0.4,
        ).collect()
    }
    assert alt == out


def test_ngram_backoff_logprob_model(spark):
    """Order-5 pruned Stupid Backoff replayed in plain Python: tables
    of order >= 2 drop counts below prune_min_count, a pruned gram
    scores as unseen (backoff), alpha powers come from one repeated-
    multiplication chain, every branch DECIMAL(20,12)-quantized; and
    order=3/prune=1 degenerates exactly to trigram_logprob."""
    from decimal import ROUND_HALF_UP, Decimal

    # ref: "a b c d e" appears twice (survives pruning at every
    # order), "a b c d f" once (its 5/4-gram extensions are pruned,
    # but shared prefixes reach count 3)
    ref_rows = [(0, "a b c d e a b c d e a b c d f")]
    rows = [
        (0, "a b c d e"),     # full 5-gram hit
        (1, "a b c d f"),     # pruned at every order >= 2 -> unigram
        (2, "x y z w v"),     # all OOV -> floor
        (3, "a b c"),         # <5 tokens: no row
        (4, "x a b c d"),     # 5-gram unseen, 4-gram (a b c d) c=3
                              # survives pruning -> mid-level backoff
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["n_ngrams"], r["avg_logp"], r["backoff_frac"],
                  r["oov_frac"])
        for r in text.ngram_backoff_logprob(
            df, ref=ref, order=5, alpha=0.4, prune_min_count=2
        ).collect()
    }

    ts = ref_rows[0][1].split()
    tables = {}
    for k in range(1, 6):
        t = {}
        for i in range(len(ts) - k + 1):
            key = tuple(ts[i:i + k])
            t[key] = t.get(key, 0) + 1
        if k >= 2:
            t = {g: c for g, c in t.items() if c >= 2}
        tables[k] = t
    total = sum(tables[1].values())
    a_pow = [1.0]
    for _ in range(4):
        a_pow.append(a_pow[-1] * 0.4)

    def q(x):
        return Decimal(x).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    def lp(g):  # g: 5-tuple
        for k in range(5, 1, -1):
            tail = g[5 - k:]
            if tail in tables[k]:
                r = tables[k][tail] / tables[k - 1][tail[:-1]]
                val = r if k == 5 else a_pow[5 - k] * r
                return q(math.log(val)), int(k < 5), 0
        if g[4:] in tables[1]:
            return (
                q(math.log(a_pow[4] * (tables[1][g[4:]] / total))), 1, 1
            )
        return q(math.log(a_pow[4] / total)), 1, 1

    model = {}
    for i, t in rows:
        ws = t.split()
        if len(ws) < 5:
            continue
        lps = [lp(tuple(ws[j:j + 5])) for j in range(len(ws) - 4)]
        s = sum(x for x, _, _ in lps)
        model[i] = (
            len(lps),
            float(s) / len(lps),
            round(sum(b for _, b, _ in lps) / len(lps), 6),
            round(sum(o for _, _, o in lps) / len(lps), 6),
        )
    assert set(out) == set(model)
    for k, want in model.items():
        assert out[k][0] == want[0], k
        assert abs(out[k][1] - want[1]) < 1e-12, k
        assert out[k][2:] == want[2:], k
    # the four regimes actually happened
    assert out[0][2:] == (0.0, 0.0)      # unpruned 5-gram hit
    assert out[1][2:] == (1.0, 1.0)      # pruned everywhere -> unigram
    assert out[2][2:] == (1.0, 1.0)      # OOV floor
    assert out[4][2:] == (1.0, 0.0)      # mid-level (4-gram) backoff
    # order=3 / prune=1 degenerates to trigram_logprob exactly
    docs3 = spark.createDataFrame(
        [(0, "a b c a b c d"), (1, "c a b"), (2, "b c x")],
        ["doc_id", "text"],
    )
    ref3 = spark.createDataFrame(
        [(10, "a b c a b d"), (11, "b c a")], ["doc_id", "text"]
    )
    got3 = sorted(
        (r["id"], r["n_ngrams"], float(r["avg_logp"]),
         r["backoff_frac"], r["oov_frac"])
        for r in text.ngram_backoff_logprob(
            docs3, ref=ref3, order=3, alpha=0.4
        ).collect()
    )
    want3 = sorted(
        (r["id"], r["n_trigrams"], float(r["avg_logp"]),
         r["backoff_frac"], r["oov_frac"])
        for r in text.trigram_logprob(docs3, ref=ref3, alpha=0.4)
        .collect()
    )
    assert got3 == want3
    with pytest.raises(ValueError):
        text.ngram_backoff_logprob(df, order=1)
    with pytest.raises(ValueError):
        text.ngram_backoff_logprob(df, alpha=0.0)
    with pytest.raises(ValueError):
        text.ngram_backoff_logprob(df, prune_min_count=0)


def test_semantic_dedup_contracts(spark):
    from tinyflux_spark.operators import similarity as sim

    base = [((j * 7 + 1) % 13 - 6) / 5.0 for j in range(8)]
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base]),          # identical to 0
        (2, [float(x * 2) for x in base]),      # same direction
        (3, [float(-x) for x in base]),         # opposite
        (4, [0.0] * 8),                         # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {
        r["id"]: r
        for r in sim.semantic_dedup(
            df, num_clusters=2, tau=0.99
        ).collect()
    }
    assert len(out) == 5
    # identical / same-direction vectors collapse to one exemplar:
    # among {0, 1, 2} (all pairwise cosine 1) exactly the single most
    # canonical row (tie on centroid_sim -> lowest id wins) survives
    group = [i for i in (0, 1, 2) if out[i]["cluster"] == out[0]["cluster"]]
    dups = [i for i in group if out[i]["is_dup"]]
    assert len(dups) == len(group) - 1 and min(group) not in dups
    # zero-norm vector: sentinel centroid_sim, never a duplicate
    assert out[4]["centroid_sim"] == -2.0
    assert out[4]["is_dup"] is False
    # empty corpus: empty result with the full schema, no crash
    empty = sim.semantic_dedup(df.where("vec_id < 0"))
    assert empty.count() == 0
    assert empty.columns == ["id", "cluster", "centroid_sim", "is_dup"]


def test_semantic_dedup_reuse_hooks_match_scratch(spark):
    """cents= / assignment= short-circuits produce exactly the
    from-scratch result — the frozen-artifact contract a standing
    deployment (persisted streaming state) relies on."""
    from tinyflux_spark.operators import similarity as sim

    rows = [
        (i, [float(((i * 3 + j * 5) % 11) - 5) for j in range(6)])
        for i in range(12)
    ]
    rows += [(12, [0.0] * 6), (13, list(rows[2][1]))]  # 13 dups 2
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )

    def canon(out):
        return sorted(
            (r["id"], r["cluster"], r["centroid_sim"], r["is_dup"])
            for r in out.collect()
        )

    want = canon(sim.semantic_dedup(df, num_clusters=3, tau=0.95))
    cents = sim.ivf_centroids(df, "vec_id", "embedding", 3)
    assert canon(
        sim.semantic_dedup(df, num_clusters=3, tau=0.95, cents=cents)
    ) == want
    asg = sim.semantic_assign(df, cents, "vec_id", "embedding")
    assert canon(
        sim.semantic_dedup(
            df, num_clusters=3, tau=0.95, assignment=asg.localCheckpoint()
        )
    ) == want


def test_perplexity_buckets_contracts(spark):
    import pytest

    from tinyflux_spark.operators import text

    # 6 docs, two of each quality tier; ties must share a bucket
    rows = [
        (0, "the the the the"),     # all high-frequency tokens
        (1, "the the the the"),     # identical -> same bucket as 0
        (2, "the the rare1"),
        (3, "the the rare2"),
        (4, "rare3 rare4 rare5"),
        (5, "rare6 rare7 rare8"),
        (6, ""),                    # no tokens -> absent
        (7, None),                  # null text -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["id"]: r["ppl_bucket"]
        for r in text.perplexity_buckets(df, k=3).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5}
    assert out[0] == out[1] == 0          # head: best LM fit
    assert out[2] == out[3]               # middle tier ties together
    assert out[4] == out[5] == 2          # tail: rare-token docs
    with pytest.raises(ValueError):
        text.perplexity_buckets(df, k=1)


def test_importance_weights_contracts(spark):
    import math

    import pytest

    from pyspark.sql import functions as F

    from tinyflux_spark.operators.sampling import importance_weights

    rows = [
        (0, "alpha beta gamma alpha", "tgt"),
        (1, "alpha beta beta", "tgt"),
        (2, "delta epsilon zeta", "other"),
        (3, "delta delta epsilon", "other"),
        (4, "", "other"),     # no tokens -> absent from output
        (5, None, "other"),   # null text -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = {
        r["id"]: r
        for r in importance_weights(
            df, df.where(F.col("lang") == "tgt"), num_buckets=64
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n_tokens"] == 4
    # target-vocabulary docs must outscore disjoint-vocabulary docs
    assert min(out[0]["log_weight"], out[1]["log_weight"]) > max(
        out[2]["log_weight"], out[3]["log_weight"]
    )
    # hand-check doc 3 against the formula: every token's ratio is
    # log((tc+1)/(T+64)) - log((sc+1)/(S+64)) with counts over the
    # whole source / the target slice
    toks = [t for _, txt, _ in rows if txt for t in txt.split()]
    tgt = [t for _, txt, lg in rows if txt and lg == "tgt"
           for t in txt.split()]
    S, T = len(toks), len(tgt)

    def ratio(tok):
        sc = sum(1 for t in toks if t == tok)
        tc = sum(1 for t in tgt if t == tok)
        # NOTE: bucket collisions would merge counts; with 64 buckets
        # and 6 distinct tokens assume no collision, then verify via
        # the assertion (a collision would show up as a mismatch)
        q = round(math.log((tc + 1) / (T + 64))
                  - math.log((sc + 1) / (S + 64)), 12)
        return q

    want3 = sum(ratio(t) for t in "delta delta epsilon".split())
    assert abs(out[3]["log_weight"] - want3) < 1e-9
    with pytest.raises(ValueError):
        importance_weights(df, df, num_buckets=1)
    with pytest.raises(ValueError):
        importance_weights(df, df, alpha=0.0)


def test_kneser_ney_logprob_model(spark):
    """Hand-computed interpolated-KN check on a corpus small enough to
    enumerate, plus the degenerate contracts."""
    import math

    import pytest

    from tinyflux_spark.operators import text

    ref_rows = [
        ("a b a b c",),     # bigrams: ab, ba, ab, bc
        ("a c",),           # ac
    ]
    rows = [
        (0, "a b c"),        # seen contexts, seen + unseen bigrams
        (1, "z a"),          # unseen context z
        (2, "a zz"),         # seen context, OOV continuation
        (3, "solo"),         # < 2 tokens -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    ref = spark.createDataFrame(ref_rows, ["body"])
    out = {
        r["id"]: r
        for r in text.kneser_ney_logprob(
            df, ref=ref, ref_text_col="body", discount=0.75
        ).collect()
    }
    # reference model: bigrams ab:2 ba:1 bc:1 ac:1
    c2 = {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1, ("a", "c"): 1}
    c1 = {"a": 3, "b": 2}
    n1f = {"a": 2, "b": 2}
    n1p = {"b": 1, "a": 1, "c": 2}
    B, V = 4, 3
    d = 0.75

    def q(x):
        return round(x, 12)  # DECIMAL(20,12) quantization

    def pc(w2):
        return (n1p.get(w2, 0) + 1) / (B + V)

    def p(w1, w2):
        if w1 not in c1:
            return pc(w2)
        return (
            max(c2.get((w1, w2), 0) - d, 0.0) / c1[w1]
            + ((d * n1f[w1]) / c1[w1]) * pc(w2)
        )

    def score(txt):
        ws = txt.split()
        lps = [q(math.log(p(a, b))) for a, b in zip(ws, ws[1:])]
        miss = sum(1 for a, _ in zip(ws, ws[1:]) if a not in c1)
        return (len(lps), sum(lps) / len(lps),
                round(miss / len(lps), 6))

    assert set(out) == {0, 1, 2}
    for i, txt in [(0, "a b c"), (1, "z a"), (2, "a zz")]:
        n, lp, frac = score(txt)
        assert out[i]["n_bigrams"] == n, i
        assert abs(out[i]["avg_logp"] - lp) < 1e-12, i
        assert out[i]["unseen_ctx_frac"] == frac, i
    # degenerate: empty reference vocabulary -> null avg_logp
    deg = text.kneser_ney_logprob(
        df, ref=ref.where("body = 'nope'"), ref_text_col="body"
    ).collect()
    assert deg and all(r["avg_logp"] is None for r in deg)
    with pytest.raises(ValueError):
        text.kneser_ney_logprob(df, discount=1.0)
    # self-scoring default: every context seen
    self_scored = text.kneser_ney_logprob(df).collect()
    assert all(r["unseen_ctx_frac"] == 0.0 for r in self_scored)


def test_embed_bow_contracts(spark):
    import math

    import pytest

    from tinyflux_spark.operators import text

    rows = [
        (0, "alpha beta alpha"),
        (1, "alpha beta alpha"),   # identical text -> identical vector
        (2, "gamma delta"),
        (3, ""),                   # zero tokens -> zero vector
        (4, None),                 # null text -> zero vector
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["id"]: list(r["embedding"])
        for r in text.embed_bow(df, dim=16).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(len(v) == 16 for v in out.values())
    assert out[0] == out[1]
    assert out[3] == [0.0] * 16 and out[4] == [0.0] * 16
    # signed counts: sum of |entries| is at most token count, vector
    # norm positive for non-empty docs
    assert sum(abs(x) for x in out[0]) <= 3
    assert math.fsum(x * x for x in out[0]) > 0
    # md5-replayable bucket/sign: recompute doc 2 by hand
    import hashlib

    vec = [0.0] * 16
    for tok in "gamma delta".split():
        j = int(hashlib.md5(f"bow:{tok}".encode()).hexdigest()[:8], 16) % 16
        s = 1 if hashlib.md5(f"sgn:bow:{tok}".encode()).hexdigest()[0] < "8" else -1
        vec[j] += s
    assert out[2] == vec
    with pytest.raises(ValueError):
        text.embed_bow(df, dim=1)


def test_importance_weights_target_text_col(spark):
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.sampling import importance_weights

    rows = [(0, "a b", "t"), (1, "c d", "o")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    tgt = spark.createDataFrame([("a b",)], ["body"])  # no id column
    out = {r["id"]: r["log_weight"]
           for r in importance_weights(
               df, tgt, num_buckets=32, target_text_col="body"
           ).collect()}
    ref = {r["id"]: r["log_weight"]
           for r in importance_weights(
               df, df.where(F.col("lang") == "t"), num_buckets=32
           ).collect()}
    assert out == ref


def test_semantic_dedup_blocked_gram_equivalence(spark, monkeypatch):
    """The row-blocked Gram path (the skew guard: a cluster never
    materializes an m x m matrix) must produce identical results to
    the single-block path — forced here with a 2-row block height so
    every cluster crosses block boundaries."""
    from tinyflux_spark.operators import similarity as sim

    base = [((j * 5 + 2) % 11 - 5) / 4.0 for j in range(8)]
    rows = [
        (i, [float(x * (1 + 0.01 * (i % 3))) for x in base])
        for i in range(9)
    ] + [(9, [0.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    want = {
        r["id"]: (r["cluster"], r["centroid_sim"], r["is_dup"])
        for r in sim.semantic_dedup(df, num_clusters=2, tau=0.99).collect()
    }
    monkeypatch.setattr(sim, "_GRAM_BLOCK", 2)
    got = {
        r["id"]: (r["cluster"], r["centroid_sim"], r["is_dup"])
        for r in sim.semantic_dedup(df, num_clusters=2, tau=0.99).collect()
    }
    assert got == want
    assert any(v[2] for v in want.values())  # pairs actually crossed


def test_kmv_distinct_contracts(spark):
    import hashlib

    import pytest

    from tinyflux_spark.operators.sketches import kmv_distinct

    # exact path: fewer distinct values than k
    small = spark.createDataFrame(
        [(i % 7,) for i in range(100)] + [(None,)], "v: int"
    )
    row = kmv_distinct(small, "v", k=16).collect()[0]
    assert row["exact"] is True
    assert row["n_seen"] == 7 and row["estimate"] == 7.0
    # estimator path: 2000 distinct ids, k=128 -> RSE ~ 1/sqrt(128),
    # assert within 4 sigma; and the k-th hash replays in Python
    big = spark.createDataFrame([(i,) for i in range(2000)], "v: long")
    row = kmv_distinct(big, "v", k=128).collect()[0]
    assert row["exact"] is False and row["n_seen"] == 128
    assert abs(row["estimate"] - 2000) < 4 * 2000 / (128 ** 0.5)
    hs = sorted(
        int(hashlib.md5(f"kmv:{i}".encode()).hexdigest()[:12], 16)
        for i in range(2000)
    )
    assert row["kth_hash"] == hs[127]
    assert row["estimate"] == round(127.0 / (hs[127] / float(1 << 48)), 4)
    with pytest.raises(ValueError):
        kmv_distinct(big, "v", k=1)


def test_kmv_set_overlap_contracts(spark):
    import hashlib

    import pytest

    from tinyflux_spark.operators.sketches import kmv_set_overlap

    # exact path: small sets with known overlap {5..9} of union {0..14}
    a = spark.createDataFrame([(i,) for i in range(10)], "v: long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "v: long")
    row = kmv_set_overlap(a, b, "v", k=64).collect()[0]
    assert row["exact"] is True
    assert row["n_union_seen"] == 15
    assert row["est_union"] == 15.0
    assert row["est_intersection"] == 5.0
    assert row["est_jaccard"] == round(5 / 15, 6)
    # estimator path: 1200-union, 400-intersection, k=128; 4-sigma
    # bound, and the bottom-k membership count replays in Python
    a2 = spark.createDataFrame([(i,) for i in range(800)], "v: long")
    b2 = spark.createDataFrame(
        [(i,) for i in range(400, 1200)], "v: long"
    )
    row = kmv_set_overlap(a2, b2, "v", k=128).collect()[0]
    assert row["exact"] is False and row["n_union_seen"] == 128
    assert abs(row["est_union"] - 1200) < 4 * 1200 / (128 ** 0.5)

    def h(i):
        return int(hashlib.md5(f"kmv:{i}".encode()).hexdigest()[:12], 16)

    union = sorted(h(i) for i in range(1200))
    bottom = set(union[:128])
    nb = sum(1 for i in range(400, 800) if h(i) in bottom)
    assert row["est_jaccard"] == round(nb / 128, 6)
    with pytest.raises(ValueError):
        kmv_set_overlap(a, b, "v", k=1)


def test_kmv_quantiles_contracts(spark):
    import hashlib

    import pytest

    from tinyflux_spark.operators.sketches import kmv_quantiles

    # exact path: input smaller than k -> sample IS the data, and the
    # type-1 order statistics are the true quantiles
    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0, 3.5]
    small = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] + [(99, None), (None, 7.0)],
        "id: long, value: double",
    )
    out = {
        r["prob"]: r
        for r in kmv_quantiles(
            small, "value", "id", probs=(0.5, 1.0), k=64
        ).collect()
    }
    n = len(vals)
    sv = sorted(vals)
    assert all(r["exact"] is True and r["n_sample"] == n
               for r in out.values())
    import math
    assert out[0.5]["estimate"] == sv[math.ceil(0.5 * n) - 1]
    assert out[1.0]["estimate"] == sv[n - 1]
    # estimator path: values 0..1999 (uniform), k=128 — the sample and
    # every estimate replay exactly in Python from md5 order statistics
    big = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "id: long, value: double"
    )
    probs = (0.1, 0.5, 0.9)
    got = {
        r["prob"]: r
        for r in kmv_quantiles(big, "value", "id", probs=probs, k=128)
        .collect()
    }

    def h(i):
        return int(
            hashlib.md5(f"kmvq:{i}".encode()).hexdigest()[:12], 16
        )

    samp = sorted(range(2000), key=h)[:128]
    sample_vals = sorted(float(i) for i in samp)
    for p in probs:
        want_rank = max(1, math.ceil(p * 128))
        r = got[p]
        assert r["exact"] is False and r["n_sample"] == 128
        assert r["rank"] == want_rank
        assert r["estimate"] == sample_vals[want_rank - 1]
        # a uniform sample of a uniform distribution: 4-sigma bound
        assert abs(r["estimate"] - p * 2000) < 4 * 2000 / (128 ** 0.5)
    # empty input -> empty result, stable schema
    empty = kmv_quantiles(
        small.where("value < 0"), "value", "id", probs=(0.5,)
    )
    assert empty.count() == 0
    assert empty.columns == [
        "prob", "rank", "n_sample", "estimate", "exact"
    ]
    with pytest.raises(ValueError):
        kmv_quantiles(small, "value", "id", k=1)
    with pytest.raises(ValueError):
        kmv_quantiles(small, "value", "id", probs=(0.0,))
    with pytest.raises(ValueError):
        kmv_quantiles(small, "value", "id", probs=())


def test_pq_family_matches_python_model(spark):
    """pq_train/pq_encode/pq_adc_topk replayed in plain Python: the
    stride codebook sliced per subspace, per-subspace argmin of the
    6dp-rounded squared L2 (low-code ties), ADC = sum of the query's
    per-(subspace, code) table entries quantized to 12dp — every code
    and distance must match the engine exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from tinyflux_spark.operators import similarity as sim

    dim, m, ksub = 12, 3, 4
    rows = [
        (i, [float(((i * 7 + j * 3) % 11) - 5) for j in range(dim)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    books = sim.pq_train(df, m=m, ksub=ksub)
    assert books["m"] == m and books["sub"] == dim // m
    assert len(books["books"]) == m
    assert all(len(b) == ksub for b in books["books"])

    # python model
    by_id = dict(rows)
    lo, hi = 0, 39
    cids = {}
    for i in range(40):
        b = ((i - lo) * ksub) // (hi - lo + 1)
        cids.setdefault(b, i)
    cent = [by_id[cid] for cid in sorted(cids.values())]
    model_books = [
        [c[s * books["sub"]:(s + 1) * books["sub"]] for c in cent]
        for s in range(m)
    ]
    assert books["books"] == model_books

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    def enc(v):
        out = []
        for s in range(m):
            seg = v[s * books["sub"]:(s + 1) * books["sub"]]
            out.append(min(
                range(ksub),
                key=lambda c: (round(sqd(seg, model_books[s][c]), 6), c),
            ))
        return out

    got_codes = {
        r["id"]: list(r["codes"])
        for r in sim.pq_encode(df, books).collect()
    }
    assert got_codes == {i: enc(v) for i, v in rows}

    # ADC against vec 0's embedding over the rest
    q = by_id[0]
    corpus = df.where("vec_id <> 0")
    top = sim.pq_adc_topk(
        sim.pq_encode(corpus, books), books, q, k=5
    ).collect()

    def quant(x):
        return Decimal(x).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    def adc(v_codes):
        return float(sum(
            quant(sqd(q[s * books["sub"]:(s + 1) * books["sub"]],
                      model_books[s][c]))
            for s, c in enumerate(v_codes)
        ))

    model = sorted(
        ((adc(enc(v)), i) for i, v in rows if i != 0)
    )[:5]
    assert [(r["adc_dist"], r["id"]) for r in top] == model
    # validation
    with pytest.raises(ValueError):
        sim.pq_train(df, m=5, ksub=4)       # 12 % 5 != 0
    with pytest.raises(ValueError):
        sim.pq_adc_topk(
            sim.pq_encode(df, books), books, q[:-1], k=5
        )
    with pytest.raises(ValueError):
        sim.pq_train(df.where("vec_id < 0"), m=m, ksub=ksub)


def test_ivf_pq_topk_composition(spark):
    """ivf_pq_topk == pq_adc_topk restricted to the vectors ivf_assign
    puts in the probed lists (the composition is exactly its parts),
    and a self-query's own id ranks first at ADC distance 0."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    q = emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]
    got = sim.ivf_pq_topk(
        emb, q, k=8, num_centroids=8, nprobe=3, m=8, ksub=8
    ).collect()
    # manual composition with the same artifacts
    cents = sim.ivf_centroids(emb, "vec_id", "embedding", 8)
    probes = sim._ivf_probes(cents, q, 3)
    books = sim.pq_train(emb, m=8, ksub=8)
    cand = emb.withColumn(
        "_l", sim.ivf_assign(F.col("embedding"), cents)
    ).where(F.col("_l").isin(probes))
    want = sim.pq_adc_topk(
        sim.pq_encode(cand, books), books, q, k=8
    ).collect()
    assert [(r["id"], r["adc_dist"]) for r in got] == [
        (r["id"], r["adc_dist"]) for r in want
    ]
    # the query vector itself survives probing and ranks first; its
    # ADC distance is its own quantization error (0 only for rows
    # that ARE codebook entries), so just non-negative
    assert got[0]["id"] == 3 and got[0]["adc_dist"] >= 0.0
    # a codebook row queries itself at exactly 0: vec 0 is the min-id
    # stride row of bucket 0
    q0 = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got0 = sim.ivf_pq_topk(
        emb, q0, k=1, num_centroids=8, nprobe=3, m=8, ksub=8
    ).collect()
    assert got0[0]["id"] == 0 and got0[0]["adc_dist"] == 0.0


def test_weighted_sample_model(spark):
    """A-ES weighted sampling replayed in plain Python: u = (h+1)/2^48
    from md5, key = ln(u)/w quantized to 12dp, top-k by key desc with
    id ties; null/zero/negative weights and null ids are excluded."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from tinyflux_spark.operators.sampling import weighted_sample

    rows = [(i, float((i * 37) % 91 + 1)) for i in range(200)]
    rows += [(500, 0.0), (501, -3.0), (502, None), (None, 5.0)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    got = [
        (r["id"], r["weight"], r["es_key"])
        for r in weighted_sample(df, "doc_id", "w", k=20).collect()
    ]

    def key(i, w):
        h = int(
            hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:12], 16
        )
        u = float(h + 1) / float(1 << 48)
        return Decimal(math.log(u) / w).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    model = sorted(
        ((key(i, w), -i) for i, w in rows[:200]), reverse=True
    )[:20]
    want = [(-ni, dict(rows[:200])[-ni], float(k)) for k, ni in model]
    assert got == want
    # every excluded row really is excluded
    ids = {i for i, _, _ in got}
    assert not ids & {500, 501, 502}
    # k > n returns everything eligible
    allr = weighted_sample(df, "doc_id", "w", k=10_000).collect()
    assert len(allr) == 200
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", k=0)


def test_pq_encode_drops_degenerate_rows(spark):
    """pq_encode filters null vectors, wrong-length vectors and
    null-element vectors instead of silently propagating NULL codes
    into every downstream ADC sum (ADVICE r7)."""
    from tinyflux_spark.operators import similarity as sim

    dim, m, ksub = 8, 2, 4
    good = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(dim)])
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(good, "vec_id: long, embedding: array<double>")
    books = sim.pq_train(df, m=m, ksub=ksub)
    bad = spark.createDataFrame(
        [
            (101, None),
            (102, [1.0] * (dim - 1)),
            (103, [1.0] * (dim - 2) + [None, 2.0]),
        ],
        "vec_id: long, embedding: array<double>",
    )
    codes = sim.pq_encode(df.union(bad), books)
    ids = {r["id"] for r in codes.collect()}
    assert ids == {i for i, _ in good}
    assert codes.where("codes IS NULL").count() == 0
    # ADC over the cleaned codes has no NULL distances
    adc = sim.pq_adc_topk(codes, books, good[0][1], k=5).collect()
    assert all(r["adc_dist"] is not None for r in adc)


def test_weighted_sample_tiny_weights_no_overflow(spark):
    """DECIMAL(38,12) keys: weights far below 1 (q97 importance
    weights are log-scale tiny) must not overflow the decimal into a
    never-sampled NULL (ADVICE r7: (20,12) has only 8 integer digits,
    so w ~ 4e-7 silently NULLed in Spark and raised in DuckDB)."""
    from tinyflux_spark.operators.sampling import weighted_sample

    rows = [(i, 1e-9 * ((i % 5) + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    got = weighted_sample(df, "doc_id", "w", k=40).collect()
    # every eligible row is sampled when k >= n — none lost to NULL keys
    assert len(got) == 40
    assert all(r["es_key"] is not None for r in got)
    # keys really are in the ~1e10 magnitude range that overflowed (20,12)
    assert min(r["es_key"] for r in got) < -1e8


def test_pq_train_lloyd_round_exact_python_replay(spark):
    """One pq_train refinement round replayed in plain Python: assign
    each subvector by the 6dp-rounded sq-L2 argmin (ties to the lower
    code), then each cluster's new codeword element is
    double(sum(floor(x*1e6))) / n / 1e6 — the integer-grid mean both
    engines compute bit-identically. Exact == on the books; empty
    clusters keep their stride codeword; repeated runs identical."""
    from tinyflux_spark.operators import similarity as sim

    dim, m, ksub = 8, 2, 4
    sub = dim // m
    vecs = [
        (i, [((i * 13 + j * 7) % 23) / 10.0 - 1.0 for j in range(dim)])
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    b0 = sim.pq_train(df, m=m, ksub=ksub, refine_iters=0)
    b1 = sim.pq_train(df, m=m, ksub=ksub, refine_iters=1)
    assert b1 == sim.pq_train(df, m=m, ksub=ksub, refine_iters=1)

    import math

    def argmin_code(sv, book):
        best = None
        for c, bsub in enumerate(book):
            d = 0.0
            for x, y in zip(sv, bsub):
                d += (x - y) * (x - y)
            d = round(d, 6)  # float round == Spark/DuckDB ROUND at 6dp
            if best is None or d < best[0]:
                best = (d, c)
        return best[1]

    want = [list(map(list, book)) for book in b0["books"]]
    for s in range(m):
        groups = {}
        for _, v in vecs:
            sv = v[s * sub:(s + 1) * sub]
            groups.setdefault(argmin_code(sv, b0["books"][s]), []).append(sv)
        for c, members in groups.items():
            n = len(members)
            want[s][c] = [
                sum(math.floor(sv[d] * 1e6) for sv in members) / n / 1e6
                for d in range(sub)
            ]
    assert b1["books"] == want
    # empty clusters (ksub near n with colliding subvectors) keep init
    tiny = spark.createDataFrame(
        vecs[:6], "vec_id: long, embedding: array<double>"
    )
    t0 = sim.pq_train(tiny, m=m, ksub=4, refine_iters=0)
    t1 = sim.pq_train(tiny, m=m, ksub=4, refine_iters=1)
    for s in range(m):
        assigned = {
            argmin_code(v[s * sub:(s + 1) * sub], t0["books"][s])
            for _, v in vecs[:6]
        }
        for c in range(4):
            if c not in assigned:
                assert t1["books"][s][c] == t0["books"][s][c]


def test_pq_refinement_improves_recall(spark):
    """The verdict's Done criterion: measured recall@10 vs exact
    cosine ground truth improves with Lloyd rounds — on the sf0.01
    embeddings over 5 fixed queries the hit count is 8/50 stride vs
    13/50 at 2 rounds (everything here is deterministic: same data,
    same codebooks, same numbers every run). Quantization distortion
    — the objective Lloyd actually minimizes — strictly decreases on
    the sf0.001 table as well."""
    from pyspark.sql import functions as F

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    qids = [0, 7, 13, 29, 41]
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin(qids)).collect()
    }

    def hits(iters):
        books = sim.pq_train(corpus, m=8, ksub=16, refine_iters=iters)
        codes = sim.pq_encode(corpus, books).localCheckpoint()
        tot = 0
        for qid, qv in qvecs.items():
            truth = {
                r["vec_id"]
                for r in sim.cosine_topk(
                    corpus.where(F.col("vec_id") != qid), qv, 10
                ).collect()
            }
            got = {
                r["id"]
                for r in sim.pq_adc_topk(
                    codes.where(F.col("id") != qid), books, qv, k=10
                ).collect()
            }
            tot += len(truth & got)
        return tot

    h0, h2 = hits(0), hits(2)
    assert h2 > h0, (h0, h2)

    # distortion strictly improves on the small table too: total sq-L2
    # of vectors to their assigned codewords
    small = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where(F.col("vec_id") != 0)

    def distortion(iters):
        books = sim.pq_train(small, m=8, ksub=16, refine_iters=iters)
        codes = sim.pq_encode(small, books)
        joined = small.join(codes, small["vec_id"] == codes["id"])
        total = 0.0
        for r in joined.select("embedding", "codes").collect():
            for s in range(8):
                bsub = books["books"][s][r["codes"][s]]
                seg = r["embedding"][s * 8:(s + 1) * 8]
                total += sum((x - y) ** 2 for x, y in zip(seg, bsub))
        return total

    assert distortion(2) < distortion(0)


def test_ivf_centroids_refinement_exact_replay_and_distortion(spark):
    """ivf_centroids(refine_iters=1) replayed in plain Python
    (ivf_assign's rounded-cosine argmax with low-index ties, then the
    integer-grid mean), and the spherical-k-means objective (mean
    cosine of each vector to its centroid) does not degrade."""
    import math

    from pyspark.sql import functions as F

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in corpus.collect()
    ]
    c0 = sim.ivf_centroids(corpus, num_centroids=8, refine_iters=0)
    c1 = sim.ivf_centroids(corpus, num_centroids=8, refine_iters=1)
    assert c1 == sim.ivf_centroids(corpus, num_centroids=8, refine_iters=1)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def assign(v, cents):
        nv = math.sqrt(dot(v, v))
        best = None
        for i, cv in cents:
            den = nv * math.sqrt(dot(cv, cv))
            s = round(dot(v, cv) / den, 6) if den > 0 else -2.0
            if best is None or s > best[0]:
                best = (s, i)
        return best[1]

    groups = {}
    for _, v in rows:
        groups.setdefault(assign(v, c0), []).append(v)
    dim = len(rows[0][1])
    want = []
    for i, cv in c0:
        if i in groups:
            n = len(groups[i])
            want.append((i, [
                sum(math.floor(v[d] * 1e6) for v in groups[i]) / n / 1e6
                for d in range(dim)
            ]))
        else:
            want.append((i, cv))
    assert c1 == want

    def objective(cents):
        tot = 0.0
        for _, v in rows:
            nv = math.sqrt(dot(v, v))
            best = max(
                round(dot(v, cv) / (nv * math.sqrt(dot(cv, cv))), 6)
                for _, cv in cents
            )
            tot += best
        return tot / len(rows)

    assert objective(c1) >= objective(c0)


def test_pq_adc_rerank_recovers_exact_topk(spark):
    """pq_adc_topk(rerank=c): ADC prunes to c candidates, the exact
    cosine re-score over ONLY those c rows returns cosine_topk's
    result at modest c (c=200 of 1999 — 10% of the corpus — recovers
    the exact top-10 on the sf0.01 table; deterministic, same data
    same result), and the raw-vector scan carries a pushed-down IN
    filter of the c ids (never a full raw pass)."""
    import pytest
    from pyspark.sql import functions as F

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    books = sim.pq_train(corpus, m=8, ksub=16, refine_iters=2)
    codes = sim.pq_encode(corpus, books).localCheckpoint()
    exact = sim.cosine_topk(corpus, qvec, 10).collect()
    got = sim.pq_adc_topk(
        codes, books, qvec, k=10, rerank=200,
        raw_df=corpus,
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "In(vec_id" in plan, plan[:2000]
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exact]
    with pytest.raises(ValueError, match="rerank must be >= k"):
        sim.pq_adc_topk(codes, books, qvec, k=10, rerank=5, raw_df=corpus)
    with pytest.raises(ValueError, match="requires raw_df"):
        sim.pq_adc_topk(codes, books, qvec, k=10, rerank=50)


def test_kmv_quantiles_by_key_merge_and_single_group(spark):
    """Grouped KMV quantiles: (a) a single-group table equals
    kmv_quantiles on that slice (same sample, same order statistics);
    (b) the mergeability contract — per-group union of two days'
    bottom-k sketches re-bottom-k'd equals the one-shot sketch over
    the union (so day-over-day profiles never rescan history);
    (c) groups smaller than k are exact; (d) null keys/values/groups
    are ignored."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.sketches import (
        kmv_hash_col,
        kmv_quantiles,
        kmv_quantiles_by_key,
    )

    rows = [
        (i, "g%d" % (i % 3), float((i * 29) % 101))
        for i in range(600)
    ]
    rows += [(None, "g0", 1.0), (9001, None, 1.0), (9002, "g1", None)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    out = kmv_quantiles_by_key(
        df, "v", "id", "grp", probs=(0.5, 0.9), k=64
    ).collect()
    assert len(out) == 6  # 3 groups x 2 probs; null rows ignored
    # (a) single group == ungrouped kmv_quantiles on the slice
    g0 = df.where("grp = 'g0'")
    want = {
        (r["prob"], r["rank"], r["n_sample"], r["estimate"], r["exact"])
        for r in kmv_quantiles(
            g0, "v", "id", probs=(0.5, 0.9), k=64
        ).collect()
    }
    got = {
        (r["prob"], r["rank"], r["n_sample"], r["estimate"], r["exact"])
        for r in out
        if r["group"] == "g0"
    }
    assert got == want
    # (c) a small group is exact
    small = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(10)],
        "id: long, grp: string, v: double",
    )
    res = kmv_quantiles_by_key(
        small, "v", "id", "grp", probs=(0.5,), k=64
    ).collect()
    assert res[0]["exact"] is True and res[0]["n_sample"] == 10
    assert res[0]["estimate"] == 4.0  # rank ceil(.5*10)=5 -> value 4.0
    # (b) mergeability: day1 ∪ day2 sketches re-bottom-k'd == one-shot
    day1 = df.where("id % 2 = 0 AND id IS NOT NULL")
    day2 = df.where("id % 2 = 1")
    k = 64

    def sketch(d):
        return (
            d.where("id IS NOT NULL AND grp IS NOT NULL AND v IS NOT NULL")
            .select(
                F.col("grp"), kmv_hash_col(F.col("id"), "kmvq"), F.col("v")
            )
            .withColumn(
                "_bk",
                F.row_number().over(
                    Window.partitionBy("grp").orderBy("_h")
                ),
            )
            .where(F.col("_bk") <= k)
            .drop("_bk")
        )

    merged = (
        sketch(day1).union(sketch(day2))
        .withColumn(
            "_bk",
            F.row_number().over(Window.partitionBy("grp").orderBy("_h")),
        )
        .where(F.col("_bk") <= k)
        .select("grp", "_h", "v")
    )
    oneshot = sketch(df).select("grp", "_h", "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )


def test_ivf_pq_residual_topk_sanity_and_determinism(spark):
    """Residual IVFPQ (q113): deterministic across runs; on a
    two-cluster fixture with a trained coarse quantizer the query's
    own near-duplicate ranks first with near-zero ADC distance
    (residual codes explain cluster members almost exactly); degenerate
    configs raise through the shared pq_train validation."""
    import pytest

    from tinyflux_spark.operators import similarity as sim

    dim = 8
    rows = []
    for i in range(1, 41):
        base = [5.0, 0, 0, 0, 0, 0, 0, 0] if i % 2 else [0, 0, 0, 0, 0, 0, 5.0, 0]
        rows.append((i, [b + (i % 7) * 0.01 for b in base]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    qvec = [5.0, 0, 0, 0, 0, 0, 0, 0]
    got = sim.ivf_pq_residual_topk(
        df, qvec, k=5, num_centroids=2, nprobe=1, m=2, ksub=4,
        coarse_refine_iters=1,
    ).collect()
    again = sim.ivf_pq_residual_topk(
        df, qvec, k=5, num_centroids=2, nprobe=1, m=2, ksub=4,
        coarse_refine_iters=1,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    assert len(got) == 5
    # every returned id is from the query's cluster (odd ids)
    assert all(r["id"] % 2 == 1 for r in got)
    assert all(r["adc_dist"] is not None and r["adc_dist"] < 1.0 for r in got)
    with pytest.raises(ValueError, match="not divisible"):
        sim.ivf_pq_residual_topk(df, qvec, num_centroids=2, m=3)


def test_kmv_quantile_sketch_lifecycle(spark, tmp_path):
    """The persistable sketch API: (a) from_sketch(sketch(df)) ==
    kmv_quantiles_by_key(df) exactly; (b) merge of two disjoint-slice
    sketches == the one-shot sketch of the union (the KMV merge
    theorem), surviving a parquet round trip of each day's sketch;
    (c) merged totals add; (d) invalid probs raise."""
    import pytest

    from tinyflux_spark.operators.sketches import (
        kmv_quantile_sketch,
        kmv_quantile_sketch_merge,
        kmv_quantiles_by_key,
        kmv_quantiles_from_sketch,
    )

    rows = [
        (i, "g%d" % (i % 3), float((i * 29) % 101)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    probs = (0.5, 0.9)
    direct = sorted(
        map(tuple, kmv_quantiles_by_key(
            df, "v", "id", "grp", probs=probs, k=64
        ).collect())
    )
    via_sketch = sorted(
        map(tuple, kmv_quantiles_from_sketch(
            kmv_quantile_sketch(df, "v", "id", "grp", k=64), probs
        ).collect())
    )
    assert via_sketch == direct
    # persist each day's sketch, reload, merge, estimate
    d1 = df.where("id % 2 = 0")
    d2 = df.where("id % 2 = 1")
    p1, p2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    kmv_quantile_sketch(d1, "v", "id", "grp", k=64).write.parquet(p1)
    kmv_quantile_sketch(d2, "v", "id", "grp", k=64).write.parquet(p2)
    merged = kmv_quantile_sketch_merge(
        spark.read.parquet(p1), spark.read.parquet(p2), k=64
    )
    assert sorted(
        map(tuple, kmv_quantiles_from_sketch(merged, probs).collect())
    ) == direct
    # totals added across days
    tot = {r["group"]: r["n_total"] for r in merged.collect()}
    assert tot == {"g0": 200, "g1": 200, "g2": 200}
    with pytest.raises(ValueError, match="probs"):
        kmv_quantiles_from_sketch(merged, probs=())


def test_kmv_distinct_by_key_matches_ungrouped_and_merges(spark):
    """Per-group distinct sketches: (a) a single-group table equals
    kmv_distinct on that slice; (b) exact below k; (c) per-group
    merge (union + re-bottom-k) equals the one-shot sketch over the
    union; (d) nulls ignored."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tinyflux_spark.operators.sketches import (
        kmv_distinct,
        kmv_distinct_by_key,
        kmv_hash_col,
    )

    rows = [(i, "g%d" % (i % 2), (i // 2) % (150 if i % 2 else 20))
            for i in range(800)]
    rows += [(9000, None, 5), (9001, "g0", None)]
    df = spark.createDataFrame(rows, "seq: long, grp: string, uid: long")
    out = {r["group"]: r for r in
           kmv_distinct_by_key(df, "uid", "grp", k=64).collect()}
    assert set(out) == {"g0", "g1"}
    # g0 has 20 distinct (< k): exact
    assert out["g0"]["exact"] is True and out["g0"]["estimate"] == 20.0
    # g1 has 120 distinct (> k): estimated, matches ungrouped slice
    want = kmv_distinct(
        df.where("grp = 'g1'"), "uid", k=64
    ).collect()[0]
    got = out["g1"]
    assert got["exact"] is False
    assert (got["n_seen"], got["kth_hash"], got["estimate"]) == (
        want["n_seen"], want["kth_hash"], want["estimate"]
    )
    # merge theorem per group
    d1, d2 = df.where("seq % 2 = 0"), df.where("seq % 2 = 1")

    def grp_bottom(d):
        return (
            d.where("uid IS NOT NULL AND grp IS NOT NULL")
            .select(F.col("grp").alias("group"),
                    kmv_hash_col(F.col("uid")))
            .distinct()
            .withColumn("_bk", F.row_number().over(
                Window.partitionBy("group").orderBy("_h")))
            .where("_bk <= 64").drop("_bk")
        )

    merged = (
        grp_bottom(d1).union(grp_bottom(d2)).distinct()
        .withColumn("_bk", F.row_number().over(
            Window.partitionBy("group").orderBy("_h")))
        .where("_bk <= 64").drop("_bk")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, grp_bottom(df).collect())
    )


def test_auto_sized_codebooks_hold_candidate_volume(spark, tmp_path):
    """num_centroids='auto' (K ≈ √N) and num_planes='auto'
    (planes ≈ log₂(N/target)) make the scale-safe configuration the
    default: across 1×/4×/16× synthetic corpora, SRP's mean bucket
    population stays pinned near the target (flat per-query
    candidates) and IVF's per-query candidate count (nprobe·N/K)
    grows ~√N — 16× the data, ~4× the candidates, never 16×."""
    import json
    import math
    import os

    from tinyflux_spark.operators import similarity as sim

    def corpus(n):
        # deterministic spread vectors: 16 hash-derived components
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: (
                    (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000))
                     - F.lit(1000)) / F.lit(1000.0)
                ).cast("float"),
            ).alias("embedding"),
        )

    srp_mean_bucket, ivf_cands = {}, {}
    for n in (1000, 4000, 16000):
        df = corpus(n)
        sp = str(tmp_path / f"srp{n}")
        sim.srp_write_index(
            df, sp, num_planes="auto", target_bucket_rows=64
        )
        rec = json.load(open(os.path.join(sp, "planes.json")))
        assert rec["num_planes"] == max(
            1, min(24, math.ceil(math.log2(n / 64)))
        )
        srp_mean_bucket[n] = n / (1 << rec["num_planes"])

        ip = str(tmp_path / f"ivf{n}")
        sim.ivf_write_index(df, ip, num_centroids="auto")
        params = json.load(open(os.path.join(ip, "params.json")))
        k = params["num_centroids"]
        assert k == max(4, min(n, round(math.sqrt(n))))
        ivf_cands[n] = 4 * n / k  # nprobe=4 probes ~4/K of the corpus

    # SRP: expected bucket population pinned near the target at every
    # scale (the per-query candidate volume is (1+planes)·this)
    for n, mean in srp_mean_bucket.items():
        assert 64 / 4 <= mean <= 64 * 2, (n, mean)
    # IVF: 16x data -> ~4x candidates (√N), nowhere near 16x
    growth = ivf_cands[16000] / ivf_cands[1000]
    assert growth < 8, growth

    # the auto-built artifacts serve normally
    got = sim.srp_topk_indexed(
        spark, str(tmp_path / "srp1000"),
        [0.5] * 16, k=3,
    ).collect()
    assert len(got) == 3

    import pytest

    for bad in (dict(num_centroids="bogus"), dict(num_centroids=0)):
        with pytest.raises(ValueError, match="num_centroids"):
            sim.ivf_write_index(
                corpus(100), str(tmp_path / "bad"), **bad
            )
    with pytest.raises(ValueError, match="num_planes"):
        sim.srp_write_index(
            corpus(100), str(tmp_path / "bad"), num_planes=0
        )
    with pytest.raises(ValueError, match="target_bucket_rows"):
        sim.srp_write_index(
            corpus(100), str(tmp_path / "bad"),
            num_planes="auto", target_bucket_rows=0,
        )


def test_index_build_tiny_and_empty_corpora(spark, tmp_path):
    """Auto-sizing edge cases (ADVICE r10): an EMPTY corpus raises an
    actionable error in every write path (auto AND explicit — no
    obscure downstream assign failure), and a tiny corpus (n < 4,
    below the K floor) caps auto-K at N instead of minting empty
    stride buckets, then builds and serves normally."""
    import json
    import os

    import pytest

    from tinyflux_spark.operators import similarity as sim

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda j: (
                    (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000))
                     - F.lit(1000)) / F.lit(1000.0)
                ).cast("float"),
            ).alias("embedding"),
        )

    empty = corpus(0)
    with pytest.raises(ValueError, match="empty"):
        sim.ivf_write_index(empty, str(tmp_path / "e1"),
                            num_centroids="auto")
    with pytest.raises(ValueError, match="empty"):
        sim.ivf_write_index(empty, str(tmp_path / "e2"),
                            num_centroids=4)
    with pytest.raises(ValueError, match="empty"):
        sim.srp_write_index(empty, str(tmp_path / "e3"),
                            num_planes="auto")
    with pytest.raises(ValueError, match="empty"):
        sim.srp_write_index(empty, str(tmp_path / "e4"), num_planes=2)

    # n=2 < the K floor of 4: auto caps K at N; the index serves
    tiny = corpus(2)
    ip = str(tmp_path / "tiny")
    sim.ivf_write_index(tiny, ip, num_centroids="auto")
    params = json.load(open(os.path.join(ip, "params.json")))
    assert params["num_centroids"] == 2
    got = sim.ivf_topk_indexed(
        spark, ip, [0.1] * 8, k=2, nprobe=2
    ).collect()
    assert len(got) == 2
    assert sim._auto_num_centroids(1) == 1
    assert sim._auto_num_centroids(3) == 3
    assert sim._auto_num_centroids(4) == 4
    assert sim._auto_num_centroids(100) == 10
    with pytest.raises(ValueError, match="empty"):
        sim._auto_num_centroids(0)


def test_adc_double_scoring_matches_decimal_topk(spark, tmp_path):
    """scoring_dtype='double' (the FAISS-style production mode,
    VERDICT r10 #3): per-query top-k IDS match the gate-exact decimal
    mode at the fixture, distances agree to double rounding, and the
    recall probe's adc arm accepts the mode. Decimal stays the
    default (oracle parity)."""
    import pytest

    from tinyflux_spark.operators import similarity as sim

    full = _retrain_corpus(spark, 400, dim=16)
    corpus = full.where("vec_id >= 20")
    queries = full.where("vec_id < 5")
    path = str(tmp_path / "pq")
    sim.ivf_write_index(
        corpus, path, num_centroids=8, pq_m=4, pq_ksub=16
    )

    dec = sim.ivf_pq_topk_batch_indexed(
        spark, path, queries, k=5, nprobe=3
    ).collect()
    dbl = sim.ivf_pq_topk_batch_indexed(
        spark, path, queries, k=5, nprobe=3, scoring_dtype="double"
    ).collect()
    by_q_dec, by_q_dbl = {}, {}
    for r in dec:
        by_q_dec.setdefault(r["query_id"], {})[r["vec_id"]] = r["adc_dist"]
    for r in dbl:
        by_q_dbl.setdefault(r["query_id"], {})[r["vec_id"]] = r["adc_dist"]
    assert by_q_dec.keys() == by_q_dbl.keys()
    for qid in by_q_dec:
        assert set(by_q_dec[qid]) == set(by_q_dbl[qid]), qid
        for vid, d in by_q_dec[qid].items():
            assert abs(d - by_q_dbl[qid][vid]) <= 1e-9 * max(1.0, d)

    # pq_adc_topk: same contract on the flat (non-IVF) ADC read
    books = sim.pq_train(corpus, "vec_id", "embedding", m=4, ksub=16)
    codes = sim.pq_encode(corpus, books, "vec_id", "embedding")
    qv = [0.3] * 16
    a = sim.pq_adc_topk(codes, books, qv, k=5).collect()
    b = sim.pq_adc_topk(
        codes, books, qv, k=5, scoring_dtype="double"
    ).collect()
    assert [r["id"] for r in a] == [r["id"] for r in b]

    # the recall probe accepts the production mode
    rec = (
        sim.index_recall_probe(
            spark, path, queries, k=5, scoring="adc",
            scoring_dtype="double",
        )
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert rec is not None and 0.0 <= rec <= 1.0

    with pytest.raises(ValueError, match="scoring_dtype"):
        sim.ivf_pq_topk_batch_indexed(
            spark, path, queries, k=5, scoring_dtype="float32"
        )
    with pytest.raises(ValueError, match="scoring_dtype"):
        sim.pq_adc_topk(codes, books, qv, k=5, scoring_dtype="f")


def test_batch_probe_join_path_equals_literal_path(
    spark, tmp_path, monkeypatch
):
    """_batch_query_probes above _PROBE_LITERAL_MAX_K ranks probe
    lists through a broadcast join + rank window instead of a
    K-literal expression (plan size must not grow with the corpus at
    auto-K — the r11 driver-OOM/slow-planning class). Results are
    bit-identical across the two physical forms at a K straddling
    the threshold."""
    from tinyflux_spark.operators import similarity as sim

    full = _retrain_corpus(spark, 400, dim=8)
    queries = full.where("vec_id % 80 = 0")
    path = str(tmp_path / "bigk")
    sim.ivf_write_index(full, path, num_centroids=80)
    assert sim._PROBE_LITERAL_MAX_K < 80

    join_form = sorted(
        tuple(r)
        for r in sim.ivf_topk_batch_indexed(
            spark, path, queries, k=4, nprobe=6
        ).collect()
    )
    monkeypatch.setattr(sim, "_PROBE_LITERAL_MAX_K", 10_000)
    literal_form = sorted(
        tuple(r)
        for r in sim.ivf_topk_batch_indexed(
            spark, path, queries, k=4, nprobe=6
        ).collect()
    )
    assert join_form == literal_form and join_form


def test_recall_probe_sample_n_is_deterministic_and_fixed(
    spark, tmp_path
):
    """index_recall_probe(sample_n=N): the one-call alert loop —
    N query rows picked deterministically (md5 order) from the
    index's OWN stored vectors, the same N ids every run, N fixed as
    the corpus grows; passing both or neither of queries/sample_n is
    refused."""
    import pytest

    from tinyflux_spark.operators import similarity as sim

    full = _retrain_corpus(spark, 500, dim=8)
    path = str(tmp_path / "srp")
    sim.srp_write_index(full, path, num_planes=3)

    a = sim.index_recall_probe(
        spark, path, k=3, multiprobe=1, sample_n=20
    ).collect()
    b = sim.index_recall_probe(
        spark, path, k=3, multiprobe=1, sample_n=20
    ).collect()
    assert len(a) == 20
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # growing the corpus does NOT grow the sample
    sim.srp_append_index(
        _retrain_corpus(spark, 600, dim=8).where("vec_id >= 500"), path
    )
    c = sim.index_recall_probe(
        spark, path, k=3, multiprobe=1, sample_n=20
    ).collect()
    assert len(c) == 20

    with pytest.raises(ValueError, match="EITHER"):
        sim.index_recall_probe(spark, path, k=3)
    with pytest.raises(ValueError, match="EITHER"):
        sim.index_recall_probe(
            spark, path, queries=full.limit(3), k=3, sample_n=5
        )
    with pytest.raises(ValueError, match="sample_n"):
        sim.index_recall_probe(spark, path, k=3, sample_n=0)


def _retrain_corpus(spark, n, dim=8):
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


def test_ivf_retrain_index_closes_the_drift_loop(spark, tmp_path):
    """ivf_retrain_index (VERDICT r10 #1 — the engine's reindex()):
    build → append at frozen codebooks → RETRAIN at fresh codebooks =
    EXACTLY a fresh ivf_write_index over the same rows; serving reads
    follow the atomically-flipped pointer transparently; a reader
    that planned against the old generation mid-swap still completes;
    appends after the retrain land in the new generation; a second
    retrain GCs the flat legacy layout but keeps the previous
    generation."""
    import json
    import os

    from tinyflux_spark.operators import similarity as sim

    full = _retrain_corpus(spark, 300)
    base = full.where("vec_id < 200")
    grow = full.where("vec_id >= 200")
    queries = full.where("vec_id % 40 = 0")

    path = str(tmp_path / "idx")
    sim.ivf_write_index(base, path, num_centroids=4, pq_m=4, pq_ksub=8)
    sim.ivf_append_index(grow, path)

    info = sim.ivf_retrain_index(spark, path, num_centroids=8)
    assert info["version"] == 0 and info["num_centroids"] == 8
    assert sim._resolve_index_root(path) == info["root"]

    # retrained == a fresh build over the same 300 rows at K=8:
    # identical codebook, PQ books, and serving results
    fresh = str(tmp_path / "fresh")
    sim.ivf_write_index(full, fresh, num_centroids=8, pq_m=4, pq_ksub=8)
    assert json.load(open(os.path.join(info["root"], "codebook.json"))) \
        == json.load(open(os.path.join(fresh, "codebook.json")))
    assert json.load(open(os.path.join(info["root"], "pq_books.json"))) \
        == json.load(open(os.path.join(fresh, "pq_books.json")))
    for fn in (sim.ivf_topk_batch_indexed, sim.ivf_pq_topk_batch_indexed):
        got = sorted(
            tuple(r) for r in fn(spark, path, queries, k=3).collect()
        )
        want = sorted(
            tuple(r) for r in fn(spark, fresh, queries, k=3).collect()
        )
        assert got == want, fn.__name__

    # snapshot semantics: plan a read against the CURRENT generation,
    # retrain underneath it, the planned read still completes (the
    # superseded generation survives one further retrain)
    old_root = sim._resolve_index_root(path)
    held = spark.read.parquet(os.path.join(old_root, "lists"))
    info2 = sim.ivf_retrain_index(spark, path, num_centroids=8)
    assert info2["version"] == 1
    assert held.count() == 300  # old generation still on disk
    assert os.path.isdir(os.path.join(path, "index_v000000"))
    # ...and the flat legacy layout (two generations stale) is GC'd
    assert not os.path.exists(os.path.join(path, "lists"))
    assert not os.path.exists(os.path.join(path, "codebook.json"))

    # appends now land in the new generation and serve immediately
    extra = _retrain_corpus(spark, 320).where("vec_id >= 300")
    sim.ivf_append_index(extra, path)
    ids = {
        r[0]
        for r in sim.ivf_topk_batch_indexed(
            spark, path, extra, k=1, nprobe=8, exclude_self=False
        ).select("vec_id").collect()
    }
    assert ids & {300, 310, 319}

    # third retrain: generation 0 retired, generation 1 kept
    info3 = sim.ivf_retrain_index(spark, path)
    assert info3["version"] == 2
    assert not os.path.exists(os.path.join(path, "index_v000000"))
    assert os.path.isdir(os.path.join(path, "index_v000001"))


def test_ivf_retrain_crash_mid_swap_leaves_old_intact(
    spark, tmp_path, monkeypatch
):
    """A retrain that crashes BEFORE the pointer flip leaves the old
    index fully intact (readers unaffected), and the next retrain
    overwrites the orphaned staging dir and completes."""
    import os

    from tinyflux_spark.operators import similarity as sim

    full = _retrain_corpus(spark, 120)
    queries = full.where("vec_id % 30 = 0")
    path = str(tmp_path / "idx")
    sim.ivf_write_index(full, path, num_centroids=4)
    before = sorted(
        tuple(r)
        for r in sim.ivf_topk_batch_indexed(
            spark, path, queries, k=3
        ).collect()
    )

    def boom(p, v):
        raise RuntimeError("injected crash before pointer flip")

    monkeypatch.setattr(sim, "_flip_index_pointer", boom)
    import pytest

    with pytest.raises(RuntimeError, match="injected"):
        sim.ivf_retrain_index(spark, path, num_centroids=8)
    # old index intact: no pointer, flat layout still serves identically
    assert sim._read_index_version(path) is None
    assert os.path.isdir(os.path.join(path, "index_v000000"))  # orphan
    after = sorted(
        tuple(r)
        for r in sim.ivf_topk_batch_indexed(
            spark, path, queries, k=3
        ).collect()
    )
    assert after == before

    monkeypatch.undo()
    info = sim.ivf_retrain_index(spark, path, num_centroids=8)
    assert info["version"] == 0 and info["num_centroids"] == 8


def test_srp_retrain_index_resizes_planes(spark, tmp_path):
    """srp_retrain_index: auto re-sizing the hyperplane recipe to the
    GROWN corpus restores the target bucket population that frozen-
    plane appends let grow linearly; retrained == fresh srp_write_index
    over the same rows at the new recipe; streaming appends resolve
    the pointer and land in the new generation."""
    import json
    import os

    from tinyflux_spark.operators import similarity as sim
    from tinyflux_spark.streaming import ingest

    full = _retrain_corpus(spark, 1000)
    base = full.where("vec_id < 200")
    grow = full.where("vec_id >= 200")
    path = str(tmp_path / "srp")
    sim.srp_write_index(base, path, num_planes=2)
    sim.srp_append_index(grow, path)

    info = sim.srp_retrain_index(
        spark, path, num_planes="auto", target_bucket_rows=64
    )
    assert info["version"] == 0
    assert info["num_planes"] == 4  # ceil(log2(1000/64))
    fresh = str(tmp_path / "fresh")
    sim.srp_write_index(full, fresh, num_planes=4)
    queries = full.where("vec_id % 100 = 0")
    got = sorted(
        tuple(r)
        for r in sim.srp_topk_batch_indexed(
            spark, path, queries, k=3
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sim.srp_topk_batch_indexed(
            spark, fresh, queries, k=3
        ).collect()
    )
    assert got == want
    assert json.load(
        open(os.path.join(info["root"], "planes.json"))
    ) == json.load(open(os.path.join(fresh, "planes.json")))

    # the recall probe reads the retrained index transparently
    rec = (
        sim.index_recall_probe(spark, path, queries, k=3)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert rec is not None and rec > 0

    # streaming append into the retrained index: pointer resolved,
    # rows land in the new generation
    extra = _retrain_corpus(spark, 1010).where("vec_id >= 1000")
    src = str(tmp_path / "src")
    extra.coalesce(1).write.parquet(src)
    q = ingest.stream_srp_append_insert(
        ingest.point_stream_from_files(
            spark, src, extra.schema, max_files_per_trigger=1
        ),
        path,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q.awaitTermination(300) and q.exception() is None
    n = spark.read.parquet(
        os.path.join(sim._resolve_index_root(path), "buckets")
    ).count()
    assert n == 1010


def test_ivf_pq_batch_indexed_equals_per_query(spark, tmp_path):
    """ivf_pq_topk_batch_indexed: the one-plan batch ADC read returns,
    for every query, exactly ivf_pq_topk_indexed's per-query result —
    on a plain-PQ index AND on a residual index (where the broadcast
    row's list id selects the query-residual before the table
    build)."""
    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    corpus = emb.where(F.col("vec_id") != 0)
    queries = emb.where(
        (F.col("vec_id") % 150 == 0) & (F.col("vec_id") != 0)
    )
    for name, kw in [
        ("pq", dict(num_centroids=8, pq_m=8, pq_ksub=8)),
        ("res", dict(num_centroids=8, pq_m=8, pq_ksub=8,
                     residual=True, coarse_refine_iters=1)),
    ]:
        path = str(tmp_path / name)
        sim.ivf_write_index(corpus, path, **kw)
        batch = sim.ivf_pq_topk_batch_indexed(
            spark, path, queries, k=5, nprobe=3
        )
        got = {}
        for r in batch.collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"], r["adc_dist"])
            )
        for q in queries.collect():
            # per-query read does not exclude self: over-fetch one,
            # drop self, keep 5, re-rank
            per_q = [
                (r["id"], r["adc_dist"])
                for r in sim.ivf_pq_topk_indexed(
                    spark, path, list(q["embedding"]), k=6, nprobe=3
                ).collect()
                if r["id"] != q["vec_id"]
            ][:5]
            want = [
                (i + 1, vid, d) for i, (vid, d) in enumerate(per_q)
            ]
            assert sorted(got[q["vec_id"]]) == want, (name, q["vec_id"])

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        sim.ivf_pq_topk_batch_indexed(
            spark, str(tmp_path / "pq"), queries, k=0
        )


def test_index_recall_probe_adc_scoring_arm(spark, tmp_path):
    """index_recall_probe(scoring='adc'): measures the codes-only ADC
    serving stack — per-query recall equals the Python intersection
    of the batch-ADC read against exact cosine; refused on SRP and
    codes-less IVF indexes."""
    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    sample = emb.where(F.col("vec_id") % 200 == 0)
    path = str(tmp_path / "pq")
    sim.ivf_write_index(emb, path, num_centroids=4, pq_m=8, pq_ksub=8)
    got = {
        r["query_id"]: (r["hits"], r["n_exact"], r["recall"])
        for r in sim.index_recall_probe(
            spark, path, sample, k=6, nprobe=4, scoring="adc"
        ).collect()
    }
    adc = {}
    for r in sim.ivf_pq_topk_batch_indexed(
        spark, path, sample, k=6, nprobe=4
    ).collect():
        adc.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in sample.collect():
        exact_ids = {
            r["vec_id"]
            for r in sim.cosine_topk(
                emb.where(F.col("vec_id") != q["vec_id"]),
                list(q["embedding"]), k=6,
            ).collect()
        }
        h = len(adc.get(q["vec_id"], set()) & exact_ids)
        assert got[q["vec_id"]] == (
            h, len(exact_ids), round(h / len(exact_ids), 6)
        )

    import pytest

    flat = str(tmp_path / "flat")
    sim.ivf_write_index(emb, flat, num_centroids=4)
    with pytest.raises(ValueError, match="pq_books"):
        sim.index_recall_probe(spark, flat, sample, scoring="adc")
    srp = str(tmp_path / "srp")
    sim.srp_write_index(emb, srp, num_planes=3)
    with pytest.raises(ValueError, match="SRP"):
        sim.index_recall_probe(spark, srp, sample, scoring="adc")
    with pytest.raises(ValueError, match="scoring"):
        sim.index_recall_probe(spark, path, sample, scoring="bogus")


def test_index_recall_probe_measures_pruning_recall(spark, tmp_path):
    """index_recall_probe: (a) an IVF index probed with nprobe ==
    num_centroids scans every list, so recall is exactly 1.0 for
    every sampled query; (b) on an SRP index the per-query recall
    equals a Python replay of |approx ∩ exact| / |exact| computed
    from the serving read and the exact ranking themselves; (c)
    non-index paths are refused."""
    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    sample = emb.where(F.col("vec_id") % 200 == 0)

    ivf = str(tmp_path / "ivf")
    sim.ivf_write_index(emb, ivf, num_centroids=4)
    full = sim.index_recall_probe(
        spark, ivf, sample, k=10, nprobe=4
    ).collect()
    assert len(full) == sample.count()
    assert all(r["recall"] == 1.0 for r in full)
    assert all(r["hits"] == r["n_exact"] <= 10 for r in full)

    # nprobe=1 probes a quarter of the corpus: recall may drop but
    # stays a valid fraction, and the mean is what an operator alerts on
    part = sim.index_recall_probe(
        spark, ivf, sample, k=10, nprobe=1
    ).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in part)

    srp = str(tmp_path / "srp")
    sim.srp_write_index(emb, srp, num_planes=3, seed=11)
    got = {
        r["query_id"]: (r["hits"], r["n_exact"], r["recall"])
        for r in sim.index_recall_probe(
            spark, srp, sample, k=7, multiprobe=1
        ).collect()
    }
    approx = sim.srp_topk_batch_indexed(
        spark, srp, sample, k=7, multiprobe=1
    )
    app = {}
    for r in approx.collect():
        app.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in sample.collect():
        exact_ids = [
            r["vec_id"]
            for r in sim.cosine_topk(
                emb.where(F.col("vec_id") != q["vec_id"]),
                list(q["embedding"]), k=7,
            ).collect()
        ]
        h = len(app.get(q["vec_id"], set()) & set(exact_ids))
        assert got[q["vec_id"]] == (
            h, len(exact_ids), round(h / len(exact_ids), 6)
        )

    import pytest

    with pytest.raises(ValueError, match="persisted"):
        sim.index_recall_probe(spark, str(tmp_path), sample)


def test_ivf_append_index_equals_rebuild_at_frozen_codebooks(
    spark, tmp_path
):
    """Incremental index append (VERDICT r8 ask #4): appending a new
    batch at the FROZEN codebooks must leave lists/ and codes/
    bit-identical to encoding old ∪ new against those same frozen
    codebooks — the serving read then needs no knowledge of how the
    index grew. Also: the appended index serves ADC results equal to
    pq_adc_topk over the manually-encoded union; appending with
    mismatched columns or to a manifest-less index is refused."""
    import json
    import os

    import pytest

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    base = corpus.where(F.col("vec_id") % 3 != 0)
    batch = corpus.where(F.col("vec_id") % 3 == 0)
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])

    path = str(tmp_path / "ivfpq")
    sim.ivf_write_index(base, path, num_centroids=8, pq_m=8, pq_ksub=8)
    frozen_cents = sim.ivf_read_codebook(path)
    with open(os.path.join(path, "pq_books.json")) as f:
        frozen_books = json.load(f)

    n = sim.ivf_append_index(batch, path)
    assert n == batch.count()

    # codebooks did NOT move
    assert sim.ivf_read_codebook(path) == frozen_cents

    # lists/ == assign(old ∪ new) at the frozen codebook
    lists = spark.read.parquet(os.path.join(path, "lists"))
    want_lists = corpus.withColumn(
        "_ivf_list", sim.ivf_assign(F.col("embedding"), frozen_cents)
    )
    got = sorted(
        (r["vec_id"], int(r["_ivf_list"])) for r in lists.collect()
    )
    want = sorted(
        (r["vec_id"], int(r["_ivf_list"])) for r in want_lists.collect()
    )
    assert got == want

    # codes/ == encode(old ∪ new) at the frozen books
    codes = spark.read.parquet(os.path.join(path, "codes"))
    want_codes = sim.pq_encode(
        want_lists, frozen_books, extra_cols=("_ivf_list",)
    )
    got_c = sorted(
        (r["id"], tuple(r["codes"]), int(r["_ivf_list"]))
        for r in codes.collect()
    )
    want_c = sorted(
        (r["id"], tuple(r["codes"]), int(r["_ivf_list"]))
        for r in want_codes.collect()
    )
    assert got_c == want_c

    # serving read over the appended index == ADC over the union's
    # codes restricted to the same probes
    probes = sim._ivf_probes(frozen_cents, qvec, 3)
    served = sim.ivf_pq_topk_indexed(spark, path, qvec, k=5, nprobe=3)
    inline = sim.pq_adc_topk(
        want_codes.where(F.col("_ivf_list").isin(probes)),
        frozen_books, qvec, k=5,
    )
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inline.collect()
    ]

    # refusal paths
    with pytest.raises(ValueError, match="id_col"):
        sim.ivf_append_index(batch, path, id_col="other_id")
    bare = str(tmp_path / "bare")
    base.withColumn(
        "_ivf_list", sim.ivf_assign(F.col("embedding"), frozen_cents)
    ).write.partitionBy("_ivf_list").parquet(os.path.join(bare, "lists"))
    with open(os.path.join(bare, "codebook.json"), "w") as f:
        json.dump([[i, list(v)] for i, v in frozen_cents], f)
    with pytest.raises(ValueError, match="params.json"):
        sim.ivf_append_index(batch, bare)


def test_residual_index_serves_ivf_pq_residual_topk_and_appends(
    spark, tmp_path
):
    """Residual + trained coarse composed into the persisted layout
    (VERDICT r8 ask #5): ivf_write_index(residual=True,
    coarse_refine_iters=) must serve, through ivf_pq_topk_indexed,
    exactly what the inline ivf_pq_residual_topk computes with the
    same parameters; rerank recovers exact cosine; and
    ivf_append_index folds new rows in at the frozen coarse +
    residual books (equivalence on the codes content)."""
    import json
    import os

    from tinyflux_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") != 0)
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])

    path = str(tmp_path / "ivfpq_res")
    sim.ivf_write_index(
        corpus, path, num_centroids=8, pq_m=8, pq_ksub=8,
        residual=True, coarse_refine_iters=2,
    )
    served = sim.ivf_pq_topk_indexed(spark, path, qvec, k=5, nprobe=3)
    inline = sim.ivf_pq_residual_topk(
        corpus, qvec, k=5, num_centroids=8, nprobe=3, m=8, ksub=8,
        coarse_refine_iters=2,
    )
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inline.collect()
    ]

    # rerank=c returns exact cosine over the probed candidates
    rr = sim.ivf_pq_topk_indexed(
        spark, path, qvec, k=5, nprobe=8, rerank=200
    )
    exact = sim.cosine_topk(corpus, qvec, k=5)
    assert [tuple(r) for r in rr.collect()] == [
        tuple(r) for r in exact.collect()
    ]

    # append at frozen coarse + residual books: codes/ equals the
    # union re-encoded at the frozen artifacts
    path2 = str(tmp_path / "ivfpq_res2")
    base = corpus.where(F.col("vec_id") % 3 != 0)
    batch = corpus.where(F.col("vec_id") % 3 == 0)
    sim.ivf_write_index(
        base, path2, num_centroids=8, pq_m=8, pq_ksub=8,
        residual=True, coarse_refine_iters=1,
    )
    cents = sim.ivf_read_codebook(path2)
    with open(os.path.join(path2, "pq_books.json")) as f:
        books = json.load(f)
    sim.ivf_append_index(batch, path2)
    got = sorted(
        (r["id"], tuple(r["codes"]), int(r["_ivf_list"]))
        for r in spark.read.parquet(
            os.path.join(path2, "codes")
        ).collect()
    )
    assigned = corpus.withColumn(
        "_ivf_list", sim.ivf_assign(F.col("embedding"), cents)
    )
    want_codes = sim._encode_for_index(
        assigned, cents, books, "vec_id", "embedding", True
    )
    want = sorted(
        (r["id"], tuple(r["codes"]), int(r["_ivf_list"]))
        for r in want_codes.collect()
    )
    assert got == want


def test_data_card_exact_and_null_semantics(spark):
    """One-pass data card (VERDICT r8 ask #7): exact n_rows /
    n_vals / total_value / n_distinct / type-1 quantiles per group,
    with the family's null rules — null groups dropped, null values
    counted in n_rows but not n_vals/quantiles, null distinct keys
    ignored; quantile = smallest value whose cumulative count reaches
    max(1, ceil(p * n_vals))."""
    from tinyflux_spark.operators.sketches import data_card

    rows = [
        # (group, value, key)
        ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, "z"),
        ("a", None, "x"),           # null value: n_rows only
        ("b", 10, None), ("b", 20, "u"),
        (None, 99, "q"),            # null group: dropped
    ]
    df = spark.createDataFrame(rows, "g: string, v: long, d: string")
    got = {
        r["group"]: tuple(r)[1:]
        for r in data_card(df, "v", "g", "d", probs=(0.5, 1.0)).collect()
    }
    # a: 5 rows, 4 vals sum 10, 3 distinct; p50 = rank ceil(.5*4)=2 -> 2
    assert got["a"] == (5, 4, 10.0, 3, 2.0, 4.0)
    # b: p50 = rank 1 -> 10, p100 = rank 2 -> 20; one null key ignored
    assert got["b"] == (2, 2, 30.0, 1, 10.0, 20.0)
    assert set(got) == {"a", "b"}


def test_weighted_sample_by_key_equals_per_group_extraction(spark):
    """The grouped ES sample must pick, for every group, EXACTLY what
    weighted_sample would pick if that group were extracted and
    sampled alone — the hash ignores the group, so slicing the corpus
    never changes a row's uniform. Null groups are excluded, rank is
    1-based per group."""
    import pytest

    from tinyflux_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_by_key,
    )

    rows = [
        (i, float((i * 37) % 91 + 1), f"g{i % 3}") for i in range(150)
    ]
    rows += [(900, 5.0, None), (None, 5.0, "g0"), (901, 0.0, "g1")]
    df = spark.createDataFrame(rows, "doc_id: long, w: double, g: string")
    got = weighted_sample_by_key(df, "doc_id", "w", "g", k=7).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["group"], []).append(r)
    assert set(by_group) == {"g0", "g1", "g2"}
    for g, rs in by_group.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        solo = weighted_sample(
            df.where(F.col("g") == g), "doc_id", "w", k=7
        ).collect()
        assert [(r["id"], r["weight"], r["es_key"]) for r in rs] == [
            (s["id"], s["weight"], s["es_key"]) for s in solo
        ]
    ids = {r["id"] for r in got}
    assert not ids & {900, 901}
    with pytest.raises(ValueError):
        weighted_sample_by_key(df, "doc_id", "w", "g", k=0)


def test_top_tokens_by_key_model(spark):
    """Per-group wordcount top-k replayed in plain Python: whitespace
    tokens, ties lexicographic, min_count honored, null groups and
    blank texts contribute nothing."""
    import pytest

    from tinyflux_spark.operators.text import top_tokens_by_key

    rows = [
        ("a", "x x y z"),
        ("a", "y x  q"),
        ("a", "   "),
        ("b", "z z z y"),
        (None, "x x x x x"),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "g: string, text: string")
    got = [
        (r["group"], r["token"], r["n"], r["rank"])
        for r in top_tokens_by_key(df, "g", "text", k=2).collect()
    ]
    assert got == [
        ("a", "x", 3, 1),
        ("a", "y", 2, 2),
        ("b", "z", 3, 1),
        ("b", "y", 1, 2),
    ]
    mc = top_tokens_by_key(df, "g", "text", k=5, min_count=2).collect()
    assert [(r["group"], r["token"]) for r in mc] == [
        ("a", "x"),
        ("a", "y"),
        ("b", "z"),
    ]
    with pytest.raises(ValueError):
        top_tokens_by_key(df, "g", "text", k=0)


def test_contamination_bloom_prefilter_is_exact(spark):
    """prefilter='bloom' must return byte-identical results to the
    broadcast path — Bloom false positives die in the exact verify
    join. Pinned down to a deliberately undersized 2^10-bit / 2-hash
    bitmap (guaranteed heavy FP traffic through the verify join) and
    a 1-hash config. Parameter validation raises early."""
    import pytest

    from tinyflux_spark.operators.dedup import contamination_hits

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    test = docs.where(F.col("doc_id") % 41 == 0)
    train = docs.where(F.col("doc_id") % 41 != 0)
    want = sorted(
        tuple(r)
        for r in contamination_hits(
            train, test, "doc_id", n=3
        ).collect()
    )
    assert want, "fixture must produce contamination hits"
    for bits, j in [(1 << 16, 5), (1 << 10, 2), (1 << 12, 1)]:
        got = sorted(
            tuple(r)
            for r in contamination_hits(
                train, test, "doc_id", n=3,
                prefilter="bloom", bloom_bits=bits, bloom_hashes=j,
            ).collect()
        )
        assert got == want, (bits, j)
    for bad in [dict(bloom_bits=100), dict(bloom_bits=1 << 32),
                dict(bloom_hashes=0), dict(prefilter="nope")]:
        with pytest.raises(ValueError):
            contamination_hits(
                train, test, "doc_id", n=3,
                **{"prefilter": "bloom", **bad},
            )
