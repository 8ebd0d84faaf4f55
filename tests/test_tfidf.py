"""TF-IDF cosine join vs a dense python oracle: exact values on a
small corpus, identical-doc degeneration, stop-word cut semantics,
disjoint-pair absence, guards, and a no-cartesian plan."""

import math
from collections import Counter

import pytest

from rusty_bloomfilter_spark.operators.tfidf import tfidf_cosine_pairs


def _py_oracle(docs, threshold, min_df=1, max_df_ratio=0.5):
    tf = {i: Counter(ts) for i, ts in docs}
    dfc = Counter(t for c in tf.values() for t in c)
    n = len([i for i, c in tf.items() if c])
    vocab = {t for t, d in dfc.items() if d >= min_df and d <= max_df_ratio * n}
    vecs = {}
    for i, c in tf.items():
        v = {
            t: cnt * (math.log((n + 1) / (dfc[t] + 1)) + 1.0)
            for t, cnt in c.items()
            if t in vocab
        }
        nrm = math.sqrt(sum(x * x for x in v.values()))
        if nrm > 0:
            vecs[i] = {t: x / nrm for t, x in v.items()}
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = set(vecs[a]) & set(vecs[b])
            if not common:
                continue
            cos = sum(vecs[a][t] * vecs[b][t] for t in common)
            if cos >= threshold:
                out[(a, b)] = (len(common), cos)
    return out


def _run(spark, docs, threshold, **kw):
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>").repartition(4)
    got = tfidf_cosine_pairs(df, threshold, **kw).collect()
    return {(r["doc_a"], r["doc_b"]): (r["n_common"], r["cosine"]) for r in got}


CORPUS = [
    ("a", [1, 2, 3, 4, 1]),
    ("b", [1, 2, 3, 5]),
    ("c", [6, 7, 8]),
    ("d", [6, 7, 8]),
    ("e", [9]),
    ("f", [1, 9, 10, 11, 12]),
]


def test_matches_python_oracle(spark):
    want = _py_oracle(CORPUS, 0.05)
    got = _run(spark, CORPUS, 0.05)
    assert set(got) == set(want)
    for k, (nc, cos) in want.items():
        assert got[k][0] == nc
        assert got[k][1] == pytest.approx(cos, abs=1e-9)


def test_identical_docs_cosine_one(spark):
    got = _run(spark, CORPUS, 0.05)
    assert got[("c", "d")][1] == pytest.approx(1.0, abs=1e-12)


def test_stopword_cut_removes_pairs(spark):
    # token 1 appears in 3 of 6 docs = 0.5N; with max_df_ratio=0.4 it
    # falls out, and (a, f) — whose only common token is 1 — vanishes
    loose = _run(spark, CORPUS, 0.01, max_df_ratio=0.5)
    tight = _run(spark, CORPUS, 0.01, max_df_ratio=0.4)
    assert ("a", "f") in loose
    assert ("a", "f") not in tight
    assert tight == _py_oracle(CORPUS, 0.01, max_df_ratio=0.4)


def test_disjoint_docs_never_pair(spark):
    got = _run(spark, CORPUS, 0.0001)
    assert ("a", "e") not in got  # no shared token at all
    assert ("c", "e") not in got


def test_guards(spark):
    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, 0.0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, 0.5, min_df=0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, 0.5, max_df_ratio=0.0)


def test_no_cartesian_and_broadcast_n(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, tokens array<int>")
    out = tfidf_cosine_pairs(df, 0.1)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    phys = buf.getvalue()
    assert "CartesianProduct" not in phys, phys
    # the 1-row N frame joins via broadcast nested loop (that one is
    # fine: 1 row), but the token self-join must be a hash/sort join
    assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys or "BroadcastHashJoin" in phys
