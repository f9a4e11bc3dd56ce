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

from hypothesis import HealthCheck, given, settings
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
