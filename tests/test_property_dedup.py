"""Property-based invariants for the dedup family.

A plain-Python set model is the spec:

* exact n-gram Jaccard pairs must equal the model's pairwise jaccard
  (ngram_jaccard_pairs is the ground-truth operator — its PPJoin prefix
  filter and df-cut must never lose a qualifying pair on un-poisoned
  corpora);
* MinHash-LSH verified pairs must be a SUBSET of the exact pairs with
  the exact jaccard values (LSH may miss — banding is probabilistic —
  but a verified pair can never be wrong);
* duplicate_clusters must equal the connected components of the pair
  graph (union-find in plain Python), labeled by component-min id.

Mirrors the dual-evaluation strategy of test_property_queries.py.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tinyflux_spark.operators.dedup import (
    duplicate_clusters,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

# Small vocabulary so near-duplicates actually occur.
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


def _model_shingles(text, n=3):
    toks = text.lower().strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
    }


def _model_pairs(texts, threshold, n=3):
    sets = {i: _model_shingles(t, n) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = inter / union if union else 0.0
                if j >= threshold:
                    out[(a, b)] = j
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus_strategy)
def test_exact_jaccard_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", threshold=0.3, max_shingle_freq=None
        ).collect()
    }
    model = _model_pairs(texts, 0.3)
    assert set(got) == set(model)
    for k, j in model.items():
        assert abs(got[k] - j) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus_strategy)
def test_lsh_pairs_subset_of_exact(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, "doc_id", verify_threshold=0.3
        ).collect()
    }
    model = _model_pairs(texts, 0.3)
    # no false positives, exact jaccard on every emitted pair
    assert set(got) <= set(model)
    for k, j in got.items():
        assert abs(j - model[k]) < 1e-9
    # jaccard-1.0 pairs share every band signature — LSH can't miss them
    certain = {k for k, j in model.items() if j == 1.0}
    assert certain <= set(got)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus_strategy, st.integers(min_value=1, max_value=4))
def test_df_cut_semantics_exact(spark, texts, cut):
    """The df-cut's contract (which the q18 oracle replays in SQL):
    with max_shingle_freq=cut, a pair is emitted IFF its FULL jaccard
    >= t AND the docs share at least one shingle whose corpus document
    frequency is <= cut — and the emitted jaccard is the full uncut
    value. The tiny vocabulary makes hot shingles (df > cut) common,
    so the cut is genuinely active here."""
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", threshold=0.3, max_shingle_freq=cut
        ).collect()
    }
    sets = {i: _model_shingles(t) for i, t in enumerate(texts)}
    dfreq = {}
    for s in sets.values():
        for sh in s:
            dfreq[sh] = dfreq.get(sh, 0) + 1
    model = {
        k: j
        for k, j in _model_pairs(texts, 0.3).items()
        if any(dfreq[sh] <= cut for sh in sets[k[0]] & sets[k[1]])
    }
    assert set(got) == set(model)
    for k, j in model.items():
        assert abs(got[k] - j) < 1e-9


def _model_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label = {}
    for x in range(n_nodes):
        r = find(x)
        label.setdefault(r, []).append(x)
    out = {}
    for members in label.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.integers(min_value=2, max_value=12),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_clusters_match_connected_components(spark, n_nodes, raw_edges):
    edges = [
        (min(a, b), max(a, b))
        for a, b in raw_edges
        if a != b and a < n_nodes and b < n_nodes
    ]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"]).distinct()
    got = {
        r["node"]: r["cluster"]
        for r in duplicate_clusters(pairs).collect()
    }
    model = _model_components(n_nodes, edges)
    # the operator only labels nodes that appear in some edge
    touched = {x for e in edges for x in e}
    assert set(got) == touched
    for x in touched:
        assert got[x] == model[x]


def _model_excise(texts, n, min_docs=2):
    """Brute-force excision spec: gram occurrences, global first per
    fingerprint, per-doc range union, positional token cut."""
    import re

    arrs = {i: re.split(r"\s+", t.lower().strip()) for i, t in texts}
    occ = {}
    for i, arr in arrs.items():
        for p in range(max(len(arr) - n + 1, 0)):
            occ.setdefault(tuple(arr[p : p + n]), []).append((i, p))
    cuts = {}
    for fp, hits in occ.items():
        if len({d for d, _ in hits}) < min_docs:
            continue
        first = min(hits)
        for d, p in hits:
            if (d, p) != first:
                cuts.setdefault(d, []).append((p, p + n - 1))
    out = {}
    for i, arr in arrs.items():
        ranges = []
        for s, e in sorted(cuts.get(i, [])):
            if ranges and s <= ranges[-1][1]:
                ranges[-1] = (ranges[-1][0], max(ranges[-1][1], e))
            else:
                ranges.append((s, e))
        kept = [
            tk for p, tk in enumerate(arr)
            if not any(s <= p <= e for s, e in ranges)
        ]
        out[i] = (
            " ".join(kept), len(arr) - len(kept), len(ranges)
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy, n=st.sampled_from([2, 3]))
def test_excise_duplicate_spans_matches_model(spark, corpus, n):
    from tinyflux_spark.operators.dedup import excise_duplicate_spans

    texts = list(enumerate(corpus))
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["id"]: (r["clean_text"], r["n_removed"], r["n_spans"])
        for r in excise_duplicate_spans(
            df, "doc_id", "text", n=n, min_docs=2
        ).collect()
    }
    assert got == _model_excise(texts, n)


# ---------------------------------------------------------------------------
# semantic_dedup vs a plain-Python model of the whole pipeline
# ---------------------------------------------------------------------------

vector_corpus_strategy = st.lists(
    st.lists(
        st.sampled_from([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0]),
        min_size=4,
        max_size=4,
    ),
    min_size=2,
    max_size=12,
)


def _model_semantic_dedup(vecs, num_clusters, tau):
    """Python spec of similarity.semantic_dedup: stride codebook over
    the id range, argmax assignment with round-6 cosine and lowest-
    index ties (-2.0 zero-norm sentinel), dominance within a cluster
    (a dup iff a >= tau neighbor has lower centroid_sim, tie -> lower
    id)."""
    import math

    n = len(vecs)
    lo, hi = 0, n - 1
    span = hi - lo + 1
    buckets = {}
    for i in range(n):
        b = ((i - lo) * num_clusters) // span
        buckets.setdefault(b, i)  # min id per bucket (ids ascending)
    cids = sorted(buckets.values())
    cents = [vecs[c] for c in cids]

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        if da * db == 0:
            return None
        return round(sum(x * y for x, y in zip(a, b)) / (da * db), 6)

    asg = {}
    for i, v in enumerate(vecs):
        best = max(
            range(len(cents)),
            key=lambda k: (
                cos(v, cents[k]) if cos(v, cents[k]) is not None
                else -2.0,
                -k,
            ),
        )
        s = cos(v, cents[best])
        asg[i] = (best, -2.0 if s is None else s)
    dup = set()
    for a in range(n):
        for b in range(n):
            if a == b or asg[a][0] != asg[b][0]:
                continue
            c = cos(vecs[a], vecs[b])
            if c is None or c < tau:
                continue
            if (asg[b][1], b) < (asg[a][1], a):
                dup.add(a)
    return {i: (asg[i][0], asg[i][1], i in dup) for i in range(n)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vector_corpus_strategy)
def test_semantic_dedup_matches_python_model(spark, vecs):
    from tinyflux_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )
    got = {
        r["id"]: (r["cluster"], r["centroid_sim"], r["is_dup"])
        for r in semantic_dedup(df, num_clusters=3, tau=0.5).collect()
    }
    want = _model_semantic_dedup(
        [[float(x) for x in v] for v in vecs], 3, 0.5
    )
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, "cluster")
        assert abs(got[i][1] - want[i][1]) < 1e-9, (i, "centroid_sim")
        assert got[i][2] == want[i][2], (i, "is_dup")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    corpus_strategy,
    st.sampled_from([1 << 8, 1 << 10, 1 << 14]),
    st.integers(min_value=1, max_value=6),
)
def test_bloom_prefilter_equals_broadcast_contamination(
    spark, texts, bloom_bits, bloom_hashes
):
    """For ANY corpus and ANY bloom sizing — including bitmaps so
    small that nearly every probe collides — the bloom-prefiltered
    decontamination must equal the broadcast path exactly: false
    positives are the bitmap's problem, never the result's."""
    from tinyflux_spark.operators.dedup import contamination_hits

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    test = df.where(df.doc_id % 3 == 0)
    train = df.where(df.doc_id % 3 != 0)
    want = sorted(
        tuple(r)
        for r in contamination_hits(train, test, "doc_id", n=2).collect()
    )
    got = sorted(
        tuple(r)
        for r in contamination_hits(
            train, test, "doc_id", n=2,
            prefilter="bloom",
            bloom_bits=bloom_bits,
            bloom_hashes=bloom_hashes,
        ).collect()
    )
    assert got == want
