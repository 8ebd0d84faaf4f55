"""Winnowing fingerprints: kernel vs brute-force paper semantics,
guarantee / density properties, and the Spark overlap operator."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.winnow import (
    MIX_MOD,
    MIX_MUL,
    _A,
    _B,
    winnow_kernel,
)

K, W = 3, 4


def brute_winnow(tokens: list[int], w: int = W) -> set[int]:
    """Independent per-document reference: the paper's algorithm with
    rightmost-min tie-breaking, written row-at-a-time."""
    if len(tokens) < K:
        return set()
    hs = [
        ((tokens[i] * _A + tokens[i + 1] * _B + tokens[i + 2]) * MIX_MUL) % MIX_MOD
        for i in range(len(tokens) - K + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    out = set()
    for q in range(w - 1, len(hs)):
        window = hs[q - w + 1 : q + 1]
        m = min(window)
        # rightmost position achieving the min
        out.add(window[len(window) - 1 - window[::-1].index(m)])
    return out


def run_kernel(rows: list[list[int]]) -> dict[int, set[int]]:
    rows = [r for r in rows if len(r) >= K]
    flat = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows])
    lengths = np.asarray([len(r) for r in rows], dtype=np.int64)
    rid, fp = winnow_kernel(flat, lengths, W)
    out: dict[int, set[int]] = {i: set() for i in range(len(rows))}
    for r, f in zip(rid.tolist(), fp.tolist()):
        out[r].add(f)
    return out


def test_kernel_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    rows = [rng.integers(0, 50257, size=n).tolist() for n in rng.integers(3, 200, size=80)]
    got = run_kernel(rows)
    for i, r in enumerate(rows):
        assert got[i] == brute_winnow(r), f"row {i} (len {len(r)})"


def test_kernel_rightmost_tie_rule():
    # repeated identical gram inside one window: equal hashes, the
    # packed key must pick the RIGHTMOST occurrence (paper tie rule) —
    # same fingerprint value either way, but the brute reference would
    # catch a packing that inverts position order by selecting a
    # different min when a smaller hash enters from the left.
    row = [5, 6, 7, 5, 6, 7, 5, 6, 7, 1, 2, 3]
    assert run_kernel([row])[0] == brute_winnow(row)


def test_short_rows_single_fingerprint():
    rows = [[1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11, 12]]  # 1..3 grams < w
    got = run_kernel(rows)
    for i, r in enumerate(rows):
        assert len(got[i]) == 1
        assert got[i] == brute_winnow(r)


def test_winnowing_guarantee_shared_substring():
    # any shared substring of >= w + k - 1 = 6 tokens must share a fp
    rng = np.random.default_rng(11)
    shared = rng.integers(0, 50257, size=6).tolist()
    a = rng.integers(0, 50257, size=40).tolist() + shared + rng.integers(0, 50257, size=40).tolist()
    b = rng.integers(0, 50257, size=25).tolist() + shared + rng.integers(0, 50257, size=55).tolist()
    got = run_kernel([a, b])
    assert got[0] & got[1], "winnowing guarantee violated"


def test_density_close_to_2_over_w_plus_1():
    rng = np.random.default_rng(13)
    row = rng.integers(0, 50257, size=20000).tolist()
    # selections before dedup ~ 2/(w+1); distinct fps a bit below
    fps = run_kernel([row])[0]
    n_grams = len(row) - K + 1
    density = len(fps) / n_grams
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4 +- slack for dedup


def test_partition_invariance_spark(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.winnow import winnow_fingerprints

    rng = np.random.default_rng(17)
    rows = [
        (f"d{i}", rng.integers(0, 50257, size=int(n)).tolist())
        for i, n in enumerate(rng.integers(3, 120, size=60))
    ]
    df1 = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, winnow_fingerprints(df1).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df8).collect()))
    assert a == b and len(a) > 0


def test_overlap_pairs_detects_planted_dup(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.cache import free
    from rusty_bloomfilter_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    rng = np.random.default_rng(19)
    base = rng.integers(0, 50257, size=90).tolist()
    rows = [("dup_a", base), ("dup_b", list(base))] + [
        (f"r{i}", rng.integers(0, 50257, size=80).tolist()) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    fps = winnow_fingerprints(df)
    pairs = winnow_overlap_pairs(fps, min_shared=2, df_cap=20)
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in pairs.collect()}
    assert got.get(("dup_a", "dup_b")) == 1.0
    free(pairs)
