"""Token-shift operators: exact conditional-agg ledger and the
CountSketch linear-difference path."""
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.shift import (
    token_shift_exact,
    token_shift_topk_cs,
)
from rusty_bloomfilter_spark.sketch import CountSketch


def _py_shift(rows, a, b, k):
    ca: Counter = Counter()
    cb: Counter = Counter()
    for src, toks in rows:
        if src == a:
            ca.update(toks)
        elif src == b:
            cb.update(toks)
    out = [
        (t, ca[t], cb[t], ca[t] - cb[t])
        for t in set(ca) | set(cb)
    ]
    out.sort(key=lambda r: (-abs(r[3]), r[0]))
    return out[:k]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a", [1, 1, 1, 1, 2, 3, 7]),
        ("a", [1, 1, 2, 5, 5, 5]),
        ("b", [2, 2, 2, 3, 5]),
        ("b", [9, 9, 9, 9, 9, 9, 2]),
        ("c", [1, 2, 3]),  # a third slice that must be ignored
        ("a", []),
    ]
    df = spark.createDataFrame(rows, schema="source string, tokens array<int>")
    return df, rows


def test_exact_matches_python_oracle(corpus):
    df, rows = corpus
    got = [tuple(r) for r in token_shift_exact(df, "source", "a", "b", k=10).collect()]
    assert got == _py_shift(rows, "a", "b", 10)


def test_cs_recovers_exact_shift_when_collision_free(corpus):
    df, rows = corpus
    truth = {t: d for t, _, _, d in _py_shift(rows, "a", "b", 100)}
    got = token_shift_topk_cs(df, "source", "a", "b", k=100).collect()
    # wide sketch + tiny vocab: every tracked candidate's estimate exact
    for r in got:
        assert r.diff_est == truth.get(r.tok, 0), r
    # the dominant shifts (token 9: -6, token 1: +6) must surface first
    top2 = {r.tok for r in got[:2]}
    assert top2 == {1, 9}


def test_cs_absent_side_degenerates_to_other(corpus):
    df, rows = corpus
    got = {r.tok: r.diff_est for r in
           token_shift_topk_cs(df, "source", "a", "zzz", k=100).collect()}
    ca: Counter = Counter()
    for src, toks in rows:
        if src == "a":
            ca.update(toks)
    for t, c in ca.items():
        assert got[t] == c
    both_absent = token_shift_topk_cs(df, "source", "y", "zzz", k=5)
    assert both_absent.count() == 0


def test_cs_partitioning_invariance(corpus):
    df, _ = corpus
    a = [tuple(r) for r in token_shift_topk_cs(df.repartition(7), "source", "a", "b").collect()]
    b = [tuple(r) for r in token_shift_topk_cs(df.coalesce(1), "source", "a", "b").collect()]
    assert a == b


# ---------------------------------------------------------------------------
# CountSketch.subtract (linearity)
# ---------------------------------------------------------------------------


def test_subtract_is_linear():
    rng = np.random.default_rng(7)
    xa = rng.integers(0, 500, 4000, dtype=np.int64)
    xb = rng.integers(0, 500, 3000, dtype=np.int64)
    A = CountSketch(5, 1 << 14).add_tokens(xa)
    B = CountSketch(5, 1 << 14).add_tokens(xb)
    diff = A.subtract(B)
    # the signed-update construction of the same stream
    signed = CountSketch(5, 1 << 14)
    signed.add_tokens(xa)
    signed.add_tokens(xb, counts=-np.ones(len(xb)))
    assert np.array_equal(diff.table, signed.table)
    # point queries estimate c_A - c_B
    truth = Counter(xa.tolist())
    truth.subtract(Counter(xb.tolist()))
    probe = np.arange(0, 500, dtype=np.int64)
    est = diff.query_tokens(probe)
    err = np.abs(est - np.array([truth[int(t)] for t in probe]))
    assert np.median(err) <= 3 * np.sqrt(max(diff.f2(), 1) / (1 << 14))


def test_subtract_dimension_mismatch():
    with pytest.raises(ValueError, match="mismatch"):
        CountSketch(5, 1024).subtract(CountSketch(5, 2048))


def test_cs_int_source_column(spark):
    # build_multi_by_key stringifies keys; raw int source values must
    # still resolve (round-4 review finding)
    rows = [(0, [1, 1, 2]), (1, [2, 2, 2]), (0, [1, 3])]
    df = spark.createDataFrame(rows, schema="source int, tokens array<int>")
    got = {r.tok: r.diff_est for r in
           token_shift_topk_cs(df, "source", 0, 1, k=10).collect()}
    assert got == {1: 3, 2: -2, 3: 1}
