"""Property-based invariants for the round-4 curation operators.

A plain-Python model is the spec:

* remove_boilerplate_spans must equal the two-pass model exactly —
  document-frequency counting over span fingerprints, hot-set removal,
  order-preserving reassembly — for every corpus and threshold;
* temperature_sample must keep exactly the ids whose md5 bucket clears
  the per-group sqrt(n_min/n) threshold, with the smallest group kept
  whole — and the kept set must be invariant under repartitioning.

Mirrors the dual-evaluation strategy of test_property_queries.py.
"""

import hashlib
import math

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from tinyflux_spark.operators.sampling import temperature_sample
from tinyflux_spark.operators.text import remove_boilerplate_spans

# Tiny span vocabulary so spans actually repeat across documents.
SPANS = ["nav", "cookie notice", "body text", "footer", ""]

docs_strategy = st.lists(
    st.lists(st.sampled_from(SPANS), min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)


def _model_boilerplate(docs, min_doc_frac):
    n_total = len(docs)
    dfreq = {}
    for lines in docs:
        for fp in {ln for ln in lines if ln.strip()}:
            dfreq[fp] = dfreq.get(fp, 0) + 1
    hot = {ln for ln, c in dfreq.items() if c >= n_total * min_doc_frac}
    out = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if ln not in hot]
        out[i] = ("\n".join(kept), len(lines) - len(kept), len(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, frac=st.sampled_from([0.25, 0.5, 0.75, 1.0]))
def test_remove_boilerplate_matches_model(spark, docs, frac):
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["clean_text"], r["n_removed"], r["n_kept"])
        for r in remove_boilerplate_spans(
            df, "doc_id", "text", delimiter="\n", joiner="\n",
            min_doc_frac=frac,
        ).collect()
    }
    assert got == _model_boilerplate(docs, frac)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=4
    ),
    salt=st.sampled_from(["pa", "pb"]),
)
def test_temperature_sample_matches_model(spark, sizes, salt):
    rows, gid = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((gid, f"g{g}"))
            gid += 1
    df = spark.createDataFrame(rows, ["id", "grp"])
    got = {
        r["id"]
        for r in temperature_sample(
            df.repartition(3), "grp", "id", alpha=0.5, salt=salt
        ).collect()
    }
    n_min = min(sizes)
    expect = set()
    for rid, grp in rows:
        n = sizes[int(grp[1:])]
        rate = math.sqrt(n_min / n)
        if rate >= 1.0:
            expect.add(rid)
            continue
        thr = format(int(round(rate * (1 << 32))), "08x")
        h = hashlib.md5(f"{salt}:{rid}".encode()).hexdigest()[:8]
        if h < thr:
            expect.add(rid)
    assert got == expect


# Tiny token vocabulary so bigrams genuinely repeat and OOV occurs.
_BG_VOCAB = ["aa", "bb", "cc", "dd", "zz"]

bg_corpus = st.lists(
    st.lists(st.sampled_from(_BG_VOCAB), min_size=0, max_size=6).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=bg_corpus, ref_texts=bg_corpus)
def test_bigram_logprob_matches_model(spark, texts, ref_texts):
    """Stupid Backoff vs the plain-Python spec on arbitrary corpora:
    seen bigram -> c2/c1, unseen bigram with known second token ->
    alpha*c1/total, OOV -> alpha/total; every branch DECIMAL-quantized
    before the order-free per-document mean; docs with < 2 tokens
    absent."""
    from decimal import ROUND_HALF_UP, Decimal

    from tinyflux_spark.operators.text import bigram_logprob

    # an empty reference vocabulary is the documented degenerate case
    # (scores come back null); the model spec needs a nonempty ref
    assume(any(t.split() for t in ref_texts))
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    ref = spark.createDataFrame(
        list(enumerate(ref_texts)), ["doc_id", "text"]
    )
    got = {
        r["id"]: (r["n_bigrams"], r["avg_logp"], r["backoff_frac"])
        for r in bigram_logprob(df, ref=ref, alpha=0.4).collect()
    }

    uni, big = {}, {}
    for t in ref_texts:
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

    model = {}
    for i, t in enumerate(texts):
        ts = t.split()
        if len(ts) < 2:
            continue
        lps, miss = [], 0
        for j in range(len(ts) - 1):
            w1, w2 = ts[j], ts[j + 1]
            if (w1, w2) in big:
                lps.append(q(math.log(big[(w1, w2)] / uni[w1])))
            elif w2 in uni:
                lps.append(q(math.log(0.4 * (uni[w2] / total))))
                miss += 1
            else:
                lps.append(q(math.log(0.4 / total)))
                miss += 1
        model[i] = (
            len(lps),
            float(sum(lps)) / len(lps),
            round(miss / len(lps), 6),
        )
    assert set(got) == set(model)
    for k, want in model.items():
        assert got[k][0] == want[0]
        assert abs(got[k][1] - want[1]) < 1e-12
        assert got[k][2] == want[2]
