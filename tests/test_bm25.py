"""BM25 retrieval: brute-force parity and ranking semantics."""

import math

import numpy as np
import pytest


def brute_bm25(docs, terms, k1=1.2, b=0.75):
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    for i, d in enumerate(docs):
        s, hits = 0.0, 0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if hits:
            out[f"d{i}"] = (hits, round(s, 6))
    return out


def _spark_bm25(spark, docs, terms, **kw):
    from rusty_bloomfilter_spark.operators.bm25 import bm25_rank

    df = spark.createDataFrame(
        [(f"d{i}", d) for i, d in enumerate(docs)], "doc_id string, tokens array<int>"
    )
    return {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_rank(df, terms, **kw).collect()
    }


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(41)
    docs = [rng.integers(0, 30, size=int(rng.integers(4, 80))).tolist() for _ in range(50)]
    terms = [3, 7, 11]
    got = _spark_bm25(spark, docs, terms)
    want = brute_bm25(docs, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 2e-6, d


def test_tf_and_length_effects(spark):
    # same length: higher tf scores higher; same tf: shorter doc wins
    docs = [
        [1, 1, 1, 2, 2, 9],  # tf(1)=3, len 6
        [1, 2, 2, 3, 4, 9],  # tf(1)=1, len 6
        [1, 5, 6],           # tf(1)=1, len 3 (short)
        [8, 8, 8, 8, 8, 8],  # no hit -> absent
    ]
    got = _spark_bm25(spark, docs, [1])
    assert "d3" not in got
    assert got["d0"][1] > got["d1"][1]
    assert got["d2"][1] > got["d1"][1]


def test_rare_term_dominates(spark):
    # term 2 in one doc, term 1 in all: the rare-term-only doc must
    # outscore a common-term-only doc of equal tf and length
    docs = [[1, 9, 9], [1, 8, 8], [1, 7, 7], [2, 6, 6]]
    got = _spark_bm25(spark, docs, [1, 2])
    assert got["d3"][1] > got["d0"][1]
    assert got["d3"][0] == 1
