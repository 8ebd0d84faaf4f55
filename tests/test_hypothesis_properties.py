"""Hypothesis property tests over the sketch algebra (randomized but
shrinkable — complements the seeded-numpy suites)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import (
    BlockedBloomFilter,
    BloomFilter,
    HyperLogLog,
    Shape,
    km_indices,
    merge_sketch_payloads,
)

items_strategy = st.lists(
    st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=0, max_size=200
)


@settings(max_examples=40, deadline=None)
@given(
    m=st.integers(min_value=64, max_value=1 << 16),
    k=st.integers(min_value=1, max_value=24),
    h1=st.integers(min_value=0, max_value=2**64 - 1),
    h2=st.integers(min_value=0, max_value=2**64 - 1),
)
def test_km_expansion_congruence(m, k, h1, h2):
    """idx_i == (h1 + i*h2) mod m for every i < k (reference
    hasher.rs:48-70 contract)."""
    idx = km_indices(
        np.array([h1], dtype=np.uint64), np.array([h2], dtype=np.uint64), Shape(m, k)
    )[0]
    for i in range(k):
        assert idx[i] == (h1 + i * h2) % m


@settings(max_examples=25, deadline=None)
@given(a=items_strategy, b=items_strategy, c=items_strategy)
def test_bloom_merge_associative_commutative(a, b, c):
    shape = Shape(m=4096, k=3)

    def bf(items):
        f = BloomFilter.empty(shape)
        if items:
            f.add_tokens(np.array(items, dtype=np.int64))
        return f

    fa, fb, fc = bf(a), bf(b), bf(c)
    left = fa.merge(fb).merge(fc)
    right = fc.merge(fb.merge(fa))
    assert left.to_bytes() == right.to_bytes()
    whole = bf(a + b + c)
    assert left.words.tobytes() == whole.words.tobytes()
    # zero false negatives
    if a:
        assert bool(left.contains_tokens(np.array(a, dtype=np.int64)).all())


@settings(max_examples=25, deadline=None)
@given(items=items_strategy, splits=st.integers(min_value=1, max_value=5))
def test_serialized_merge_partition_invariant(items, splits):
    """merge_sketch_payloads over ANY partitioning == single build,
    byte-identical (classic + blocked + HLL)."""
    arr = np.array(items, dtype=np.int64) if items else np.empty(0, dtype=np.int64)
    parts = np.array_split(arr, splits)

    shape = Shape(m=2048, k=4)
    whole_c = BloomFilter.empty(shape)
    payloads_c = []
    for p in parts:
        f = BloomFilter.empty(shape)
        if len(p):
            f.add_tokens(p)
            whole_c.add_tokens(p)
        payloads_c.append(f.to_bytes())
    assert merge_sketch_payloads(payloads_c) == whole_c.to_bytes()

    whole_b = BlockedBloomFilter(64)
    payloads_b = []
    for p in parts:
        f = BlockedBloomFilter(64)
        if len(p):
            f.add_tokens(p)
            whole_b.add_tokens(p)
        payloads_b.append(f.to_bytes())
    assert merge_sketch_payloads(payloads_b) == whole_b.to_bytes()

    whole_h = HyperLogLog(p=8)
    payloads_h = []
    for p in parts:
        h = HyperLogLog(p=8)
        if len(p):
            h.add_tokens(p)
            whole_h.add_tokens(p)
        payloads_h.append(h.to_bytes())
    assert merge_sketch_payloads(payloads_h) == whole_h.to_bytes()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10**7),
    p_exp=st.integers(min_value=1, max_value=10),
)
def test_shape_sizing_meets_target(n, p_exp):
    p = 10.0**-p_exp
    shape = Shape.for_np(n, p)
    assert shape.false_positives(n) <= p * 1.1
    blocked = BlockedBloomFilter.for_np(n, p)
    assert blocked.false_positives(n) <= p * 1.001


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    a=st.integers(min_value=0, max_value=5),
    b=st.integers(min_value=0, max_value=5),
)
def test_bpe_replace_kernel_matches_sequential(data, a, b):
    """apply_merge_flat == the textbook greedy left-to-right scan, for
    any ragged input and any (a, b) pair (including a == b runs and
    cross-row adjacencies that must NOT merge)."""
    from rusty_bloomfilter_spark.operators.bpe import apply_merge_flat

    new_id = 99
    flat = np.array([t for row in data for t in row], dtype=np.int64)
    lengths = np.array([len(r) for r in data], dtype=np.int64)
    got_flat, got_lengths = apply_merge_flat(flat, lengths, a, b, new_id)
    # sequential reference per row
    ref_rows = []
    for row in data:
        out, i = [], 0
        while i < len(row):
            if i + 1 < len(row) and row[i] == a and row[i + 1] == b:
                out.append(new_id)
                i += 2
            else:
                out.append(row[i])
                i += 1
        ref_rows.append(out)
    ref_flat = [t for r in ref_rows for t in r]
    assert got_flat.tolist() == ref_flat
    assert got_lengths.tolist() == [len(r) for r in ref_rows]


@settings(max_examples=40, deadline=None)
@given(
    lows=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=30),
    rts=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=30),
    lower=st.floats(min_value=-20, max_value=0, allow_nan=False),
    span=st.floats(min_value=0, max_value=25, allow_nan=False),
)
def test_range_join_bin_cover_property(lows, rts, lower, span):
    """Pure binning math of range_join: for every (l, r) with
    r in [l+lower, l+upper], r's bin is inside l's exploded bin range
    (the join can then never miss a pair), and r's bin occurs exactly
    once in l's range (no duplicate pairs)."""
    import math

    upper = lower + span
    width = max(upper - lower, 1.0)
    for l in lows:
        lo_bin = math.floor((l + lower) / width)
        hi_bin = math.floor((l + upper) / width)
        bins = list(range(lo_bin, hi_bin + 1))
        assert len(set(bins)) == len(bins)
        for r in rts:
            if l + lower <= r <= l + upper:
                assert lo_bin <= math.floor(r / width) <= hi_bin, (l, r, lower, upper)


# ---------------------------------------------------------------------------
# IBLT algebra (sketch/iblt.py)
# ---------------------------------------------------------------------------

_iblt_keys = st.lists(
    st.integers(min_value=0, max_value=2**60 - 1), min_size=0, max_size=120, unique=True
)


@settings(max_examples=30, deadline=None)
@given(a=_iblt_keys, b=_iblt_keys, c=_iblt_keys)
def test_iblt_merge_associative_commutative(a, b, c):
    from rusty_bloomfilter_spark.sketch.iblt import IBLT

    def t(keys):
        return IBLT.for_diff(16).add_u64(np.array(keys, dtype=np.uint64))

    m1 = t(a).merge(t(b)).merge(t(c))
    m2 = t(c).merge(t(a).merge(t(b)))
    m3 = t(b).merge(t(c)).merge(t(a))
    assert m1.to_bytes() == m2.to_bytes() == m3.to_bytes()


@settings(max_examples=30, deadline=None)
@given(
    shared=_iblt_keys,
    only_a=st.lists(
        st.integers(min_value=2**60, max_value=2**61 - 1),
        min_size=0, max_size=20, unique=True,
    ),
    only_b=st.lists(
        st.integers(min_value=2**61, max_value=2**62 - 1),
        min_size=0, max_size=20, unique=True,
    ),
)
def test_iblt_subtract_peel_roundtrip(shared, only_a, only_b):
    """peel(A - B) recovers exactly (A\\B, B\\A) whenever the diff fits
    the sizing bound — the disjoint key ranges make truth trivial."""
    from rusty_bloomfilter_spark.sketch.iblt import IBLT

    A = np.array(shared + only_a, dtype=np.uint64)
    B = np.array(shared + only_b, dtype=np.uint64)
    d = IBLT.for_diff(40).add_u64(A).subtract(IBLT.for_diff(40).add_u64(B))
    add, rem, ok = d.peel()
    assert ok
    assert set(add.tolist()) == set(only_a)
    assert set(rem.tolist()) == set(only_b)
