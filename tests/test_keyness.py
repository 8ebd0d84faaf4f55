"""Dunning log-likelihood keyness against a pure-python oracle: exact
contingency counts, the integer over-representation gate, min_count
filtering, and the G2/(2N) score to float precision."""

import math
from collections import Counter

import pytest

from rusty_bloomfilter_spark.functions.text import DEFAULT_VOCAB
from rusty_bloomfilter_spark.operators.keyness import distinctive_terms

DOCS = [
    ("a", "alpha alpha alpha beta beta gamma gamma gamma gamma gamma"),
    ("a", "alpha alpha beta gamma delta delta delta delta delta delta"),
    ("b", "beta beta beta beta gamma delta delta epsilon epsilon epsilon"),
    ("b", "gamma gamma beta beta beta epsilon epsilon epsilon epsilon zeta"),
]


def _tok(word):
    import hashlib

    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % DEFAULT_VOCAB


def _oracle(min_count):
    st = Counter()
    for key, text in DOCS:
        for w in text.split():
            st[(key, _tok(w))] += 1
    ct = Counter()
    ns = Counter()
    for (k, t), c in st.items():
        ct[t] += c
        ns[k] += c
    n = sum(st.values())

    def xlx(k):
        return k * math.log(k) if k > 0 else 0.0

    out = {}
    for (k, t), k11 in st.items():
        if k11 < min_count or k11 * n <= ct[t] * ns[k]:
            continue
        s = (
            xlx(k11)
            + xlx(ct[t] - k11)
            + xlx(ns[k] - k11)
            + xlx(n - ct[t] - ns[k] + k11)
            - xlx(ct[t])
            - xlx(n - ct[t])
            - xlx(ns[k])
            - xlx(n - ns[k])
            + xlx(n)
        )
        out[(k, t)] = (k11, ct[t] - k11, s / n)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "source string, text string").repartition(3)


def test_matches_python_oracle(docs):
    got = {
        (r["source"], r["token"]): (r["n_in_key"], r["n_elsewhere"], r["mi_nats"])
        for r in distinctive_terms(docs, min_count=2).collect()
    }
    want = _oracle(min_count=2)
    assert set(got) == set(want)
    for key in want:
        assert got[key][:2] == want[key][:2]
        assert got[key][2] == pytest.approx(want[key][2], abs=1e-12)
    # sanity: delta is 'a'-distinctive (6 of its 8 occurrences), epsilon
    # is 'b'-distinctive (all 7)
    a_tokens = {t for (k, t) in want if k == "a"}
    b_tokens = {t for (k, t) in want if k == "b"}
    assert _tok("delta") in a_tokens and _tok("epsilon") in b_tokens


def test_min_count_gate(docs):
    rows = distinctive_terms(docs, min_count=7).collect()
    assert all(r["n_in_key"] >= 7 for r in rows)
    want = _oracle(min_count=7)
    assert {(r["source"], r["token"]) for r in rows} == set(want)


def test_guard(docs):
    with pytest.raises(ValueError, match="min_count"):
        distinctive_terms(docs, min_count=0)


def test_scores_positive_and_overrepresented(docs):
    for r in distinctive_terms(docs, min_count=1).collect():
        assert r["mi_nats"] >= 0.0  # G2 is a likelihood RATIO
