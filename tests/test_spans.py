"""Exact repeated-span dedup (operators/spans.py) + temperature-mix
sampling (operators/curation.py) unit tests: planted duplicate spans
with hand-computed expectations, canonical-owner semantics, island
merging (overlap AND exact adjacency), partitioning invariance, and
the integer-threshold sampling closed form vs numpy/hashlib."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.curation import (
    temperature_rates,
    temperature_sample,
)
from rusty_bloomfilter_spark.operators.spans import (
    cut_spans,
    duplicated_windows,
    merge_window_spans,
    span_dedup_stats,
    token_windows,
)

SEQ_SCHEMA = "doc_id string, tokens array<int>"


def _seq(spark, rows):
    return spark.createDataFrame(rows, SEQ_SCHEMA)


def _stats(df):
    return {
        int(r.doc_id): (int(r.n_dup_spans), int(r.dup_tokens)) for r in df.collect()
    }


def test_shared_run_merges_into_one_span(spark):
    # doc 2 shares the 5-token run [1..5] with doc 1: windows at pos
    # 1,2,3 are duplicated, merge to one span [1, 6) -> 5 tokens
    seq = _seq(
        spark,
        [
            ("1", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            ("2", [100, 1, 2, 3, 4, 5, 200, 300]),
        ],
    )
    got = _stats(span_dedup_stats(seq, length=3))
    # doc 1 holds every canonical first occurrence -> absent
    assert got == {2: (1, 5)}


def test_internal_repetition_keeps_first_window(spark):
    # all four (7,7,7) windows share one key; pos 0 survives as the
    # canonical owner, pos 1..3 merge to span [1, 6) -> 5 tokens
    seq = _seq(spark, [("3", [7, 7, 7, 7, 7, 7])])
    got = _stats(span_dedup_stats(seq, length=3))
    assert got == {3: (1, 5)}


def test_disjoint_spans_stay_separate(spark):
    # doc 4 duplicates doc 1's windows at pos 0 and pos 7 only; the
    # gap (7 > L=3) keeps them as two spans of 3 tokens each
    seq = _seq(
        spark,
        [
            ("1", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            ("4", [1, 2, 3, 901, 902, 903, 904, 8, 9, 10]),
        ],
    )
    got = _stats(span_dedup_stats(seq, length=3))
    assert got == {4: (2, 6)}


def test_exactly_adjacent_windows_merge(spark):
    # doc 5 = [1,2,3,1,2,3]: duplicated windows at pos 0 and pos 3
    # (both owned by doc 1), pos distance == L -> ONE span [0, 6)
    seq = _seq(
        spark,
        [
            ("1", [1, 2, 3, 4, 5, 6]),
            ("5", [1, 2, 3, 1, 2, 3]),
        ],
    )
    got = _stats(span_dedup_stats(seq, length=3))
    assert got == {5: (1, 6)}


def test_short_docs_and_uniques_emit_nothing(spark):
    seq = _seq(spark, [("1", [1, 2]), ("2", [5, 6, 7, 8]), ("3", [])])
    assert _stats(span_dedup_stats(seq, length=3)) == {}


def test_min_count_threshold(spark):
    # the run [1,2,3] appears in 3 docs; min_count=3 keeps it
    # "duplicated", min_count=4 does not
    seq = _seq(spark, [("1", [1, 2, 3]), ("2", [1, 2, 3]), ("3", [1, 2, 3])])
    assert _stats(span_dedup_stats(seq, length=3, min_count=3)) == {
        2: (1, 3),
        3: (1, 3),
    }
    assert _stats(span_dedup_stats(seq, length=3, min_count=4)) == {}


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 50, size=40).tolist()
    rows = [(str(i), base[: 10 + (i * 7) % 25] + rng.integers(0, 50, size=5).tolist()) for i in range(1, 30)]
    seq = _seq(spark, [(d, [int(t) for t in ts]) for d, ts in rows])
    a = _stats(span_dedup_stats(seq, length=4))
    b = _stats(span_dedup_stats(seq.repartition(7), length=4))
    assert a == b and a  # non-trivial and identical


def test_token_windows_positions_and_rejects(spark):
    seq = _seq(spark, [("9", [4, 5, 6, 7])])
    rows = token_windows(seq, length=3).collect()
    assert sorted(r.pos for r in rows) == [0, 1]
    with pytest.raises(ValueError):
        token_windows(seq, length=1)


def test_merge_window_spans_numpy_cross_check(spark):
    # random duplicated-window positions vs a numpy island oracle
    rng = np.random.default_rng(5)
    L = 4
    pos = np.unique(rng.integers(0, 200, size=60))
    dup = spark.createDataFrame(
        [(1, int(p)) for p in pos], "doc_id long, pos long"
    )
    got = sorted(
        (int(r.span_start), int(r.span_end))
        for r in merge_window_spans(dup, length=L).collect()
    )
    exp = []
    s = e = None
    for p in pos:
        if s is None:
            s, e = p, p + L
        elif p <= e:  # q - prev <= L  <=>  q <= prev + L == e
            e = p + L
        else:
            exp.append((int(s), int(e)))
            s, e = p, p + L
    exp.append((int(s), int(e)))
    assert got == exp


def test_duplicated_windows_never_drop_all_copies(spark):
    # zero-loss guarantee: for every duplicated key exactly one
    # occurrence (the canonical owner) is NOT flagged
    seq = _seq(
        spark,
        [("1", [1, 2, 3, 4]), ("2", [1, 2, 3, 4]), ("3", [2, 3, 4, 9])],
    )
    wins = token_windows(seq, length=3)
    flagged = duplicated_windows(wins)
    n_keys_dup = (
        wins.groupBy("key").count().where("count > 1").count()
    )
    # flagged occurrences == total dup occurrences - one owner per key
    total_dup_occ = (
        wins.join(
            wins.groupBy("key").count().where("count > 1").select("key"), "key"
        ).count()
    )
    assert flagged.count() == total_dup_occ - n_keys_dup


def _clean(df):
    return {int(r.doc_id): list(r.tokens_clean) for r in df.collect()}


def test_cut_spans_removes_shared_run_keeps_owner(spark):
    seq = _seq(
        spark,
        [
            ("1", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            ("2", [100, 1, 2, 3, 4, 5, 200, 300]),
        ],
    )
    got = _clean(cut_spans(seq, length=3))
    assert got[1] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]  # owner untouched
    assert got[2] == [100, 200, 300]


def test_cut_spans_full_duplicate_empties(spark):
    seq = _seq(spark, [("1", [1, 2, 3, 4]), ("2", [1, 2, 3, 4])])
    got = _clean(cut_spans(seq, length=3))
    assert got[1] == [1, 2, 3, 4] and got[2] == []


def test_cut_spans_empty_and_short_docs_pass_through(spark):
    seq = _seq(spark, [("1", []), ("2", [7, 8])])
    got = _clean(cut_spans(seq, length=3))
    assert got == {1: [], 2: [7, 8]}


def test_cut_spans_accounting_matches_stats(spark):
    # n_clean == n_tok - dup_tokens for every doc, on random data
    rng = np.random.default_rng(23)
    base = rng.integers(0, 30, size=50).tolist()
    rows = [
        (str(i), base[(i * 3) % 20 : (i * 3) % 20 + 15 + i % 9]
         + rng.integers(0, 30, size=4).tolist())
        for i in range(1, 25)
    ]
    seq = _seq(spark, [(d, [int(t) for t in ts]) for d, ts in rows])
    stats = _stats(span_dedup_stats(seq, length=4))
    clean = cut_spans(seq, length=4)
    for r in clean.collect():
        n_dup = stats.get(int(r.doc_id), (0, 0))[1]
        assert len(r.tokens_clean) == len(r.tokens) - n_dup, r.doc_id
    assert stats  # the construction actually planted duplicates


# ---------------------------------------------------------------------------
# temperature-mix sampling
# ---------------------------------------------------------------------------


def _mk_seq(spark, counts):
    """counts: {source: [n_tok, ...]} -> sequences frame."""
    rows = []
    i = 0
    for src, toks in counts.items():
        for t in toks:
            rows.append((f"d{i}", src, int(t)))
            i += 1
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok long")


def test_temperature_rates_closed_form(spark):
    seq = _mk_seq(
        spark, {"hot": [3000] * 3, "warm": [450, 450], "cold": [100]}
    )
    got = {r.source: (int(r.n_key_tokens), int(r.thr)) for r in temperature_rates(seq).collect()}
    n = {"hot": 9000, "warm": 900, "cold": 100}
    total = 10000
    for src, n_s in n.items():
        thr = int(np.floor(min(1.0, 0.25 * np.sqrt(total / n_s)) * 1_000_000))
        assert got[src] == (n_s, thr), (src, got[src], thr)
    # tail domain reaches rate 1 exactly
    assert got["cold"][1] == 1_000_000


def test_temperature_sample_matches_hashlib(spark):
    seq = _mk_seq(spark, {"hot": [500] * 40, "cold": [10] * 4})
    out = temperature_sample(seq, budget_frac=0.25)
    rows = out.collect()
    thr = {r.source: int(r.thr) for r in rows}
    for r in rows:
        bucket = int(hashlib.md5(r.doc_id.encode()).hexdigest()[:8], 16) % 1_000_000
        assert int(r.bucket) == bucket
        assert bool(r.kept) == (bucket < thr[r.source])
    # cold domain is under-represented -> sampled at rate 1
    assert all(r.kept for r in rows if r.source == "cold")


def test_temperature_sample_flattens_shares(spark):
    rng = np.random.default_rng(3)
    seq = _mk_seq(
        spark,
        {
            "a": rng.integers(50, 150, size=400).tolist(),  # hot
            "b": rng.integers(50, 150, size=40).tolist(),
        },
    )
    out = temperature_sample(seq, budget_frac=0.25)
    kept = (
        out.groupBy("source")
        .agg(
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0)).alias("k"),
            F.sum("n_tok").alias("n"),
        )
        .collect()
    )
    frac = {r.source: r.k / r.n for r in kept}
    # hot domain damped below the tail domain's acceptance rate
    assert frac["a"] < frac["b"]


def test_temperature_sample_partitioning_invariant(spark):
    seq = _mk_seq(spark, {"a": [100] * 50, "b": [10] * 10})
    a = sorted((r.doc_id, bool(r.kept)) for r in temperature_sample(seq).collect())
    b = sorted(
        (r.doc_id, bool(r.kept))
        for r in temperature_sample(seq.repartition(13)).collect()
    )
    assert a == b
