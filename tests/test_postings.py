"""Inverted index: exact df/cf/postings vs a pandas oracle, sorted
(deterministic) posting order under any partitioning, min_df pruning
before list collection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.postings import posting_lists


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(53)
    rows = []
    for i in range(200):
        toks = rng.integers(0, 60, size=rng.integers(3, 30)).tolist()
        rows.append((f"d{i:03d}", [int(t) for t in toks]))
    return rows, spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def oracle(rows, min_df=1):
    from collections import defaultdict

    per = defaultdict(lambda: defaultdict(int))
    for d, toks in rows:
        for t in toks:
            per[t][d] += 1
    out = {}
    for t, m in per.items():
        if len(m) >= min_df:
            out[t] = (len(m), sum(m.values()), sorted(m))
    return out


def test_exact_and_sorted(spark, docs):
    rows, df = docs
    want = oracle(rows)
    got = {
        r["token"]: (r["df"], r["cf"], list(r["postings"]))
        for r in posting_lists(df).collect()
    }
    assert got == want


def test_partition_invariant(spark, docs):
    rows, df = docs
    a = {r["token"]: list(r["postings"]) for r in posting_lists(df.repartition(2)).collect()}
    b = {r["token"]: list(r["postings"]) for r in posting_lists(df.repartition(13)).collect()}
    assert a == b


def test_min_df_prunes(spark, docs):
    rows, df = docs
    want = oracle(rows, min_df=5)
    got = {
        r["token"]: (r["df"], r["cf"], list(r["postings"]))
        for r in posting_lists(df, min_df=5).collect()
    }
    assert got == want
    assert all(v[0] >= 5 for v in got.values())
    with pytest.raises(ValueError):
        posting_lists(df, min_df=0)
