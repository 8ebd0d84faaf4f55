"""SparseBloomBuilder: adaptive representation (reference Sparse filter
made operational) — canonical bytes identical to dense builds, O(set
bits) memory until promotion, sparse merge fast path."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.sketch import (
    BloomFilter,
    Shape,
    SparseBloomBuilder,
    merge_payloads,
)

SHAPE = Shape.for_np(n=1_000_000, p=1e-4)  # m ~ 19.2M bits, 2.4 MB dense


def test_sparse_build_bitwise_equals_dense():
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 50257, 5000, dtype=np.int32)
    b = SparseBloomBuilder(SHAPE).add_tokens(toks)
    d = BloomFilter.empty(SHAPE).add_tokens(toks)
    assert not b.is_dense  # 5k tokens * k bits << promotion threshold
    assert b.to_bytes() == d.to_bytes()
    assert b.n_items == d.n_items == 5000


def test_promotion_at_dense_footprint():
    rng = np.random.default_rng(5)
    big = rng.integers(0, 2**31, 400_000, dtype=np.int64)
    b = SparseBloomBuilder(SHAPE).add_tokens(big)
    d = BloomFilter.empty(SHAPE).add_tokens(big)
    assert b.is_dense  # 400k * 23 indices * 8B >> 2.4 MB dense
    assert b.to_bytes() == d.to_bytes()


def test_promotion_threshold_bounds_memory():
    """Pending buffer never exceeds the dense footprint: promotion
    happens the moment 8 * n_pending >= number_of_bytes()."""
    b = SparseBloomBuilder(SHAPE)
    per_chunk = 1000
    rng = np.random.default_rng(7)
    while not b.is_dense:
        assert b._n_pending * 8 < SHAPE.number_of_bytes()
        b.add_tokens(rng.integers(0, 2**31, per_chunk, dtype=np.int64))
    assert b._pending == [] and b._n_pending == 0


def test_ngram_and_hash_paths_match_dense():
    rng = np.random.default_rng(9)
    toks = rng.integers(0, 50257, 300, dtype=np.int32)
    b = SparseBloomBuilder(SHAPE).add_ngrams(toks, 3)
    d = BloomFilter.empty(SHAPE).add_ngrams(toks, 3)
    assert b.to_bytes() == d.to_bytes()


def test_sparse_merge_fast_path_no_dense_alloc():
    """All-sparse payload merge unions index arrays; output bytes equal
    the dense merge, order-independent."""
    rng = np.random.default_rng(11)
    toks = rng.integers(0, 50257, 4000, dtype=np.int32)
    parts = [SparseBloomBuilder(SHAPE).add_tokens(toks[i::4]).to_bytes() for i in range(4)]
    dense = BloomFilter.empty(SHAPE).add_tokens(toks)
    assert merge_payloads(parts) == dense.to_bytes()
    assert merge_payloads(parts[::-1]) == dense.to_bytes()
    # merged result decodes with correct metadata
    back = BloomFilter.from_bytes(merge_payloads(parts))
    assert back.n_items == 4000
    assert bool(back.contains_tokens(toks).all())  # zero FN


def test_sparse_merge_shape_mismatch_rejected():
    a = SparseBloomBuilder(Shape(m=4096, k=3)).add_tokens(np.arange(5)).to_bytes()
    b = SparseBloomBuilder(Shape(m=8192, k=3)).add_tokens(np.arange(5)).to_bytes()
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_payloads([a, b])


def test_mixed_sparse_dense_merge():
    rng = np.random.default_rng(13)
    small = rng.integers(0, 50257, 2000, dtype=np.int32)
    big = rng.integers(0, 2**31, 400_000, dtype=np.int64)
    p_sparse = SparseBloomBuilder(SHAPE).add_tokens(small).to_bytes()
    p_dense = SparseBloomBuilder(SHAPE).add_tokens(big).to_bytes()
    oracle = BloomFilter.empty(SHAPE).add_tokens(small).merge_in_place(
        BloomFilter.empty(SHAPE).add_tokens(big)
    )
    assert merge_payloads([p_sparse, p_dense]) == oracle.to_bytes()
    assert merge_payloads([p_dense, p_sparse]) == oracle.to_bytes()


def test_keyed_build_stays_sparse_per_key(spark):
    """1000 keys x tiny fill over a huge-m shape: the per-key payloads
    come out sparse-coded (the 100 TB memory win) and each matches its
    per-key dense oracle."""
    import pandas as pd

    from rusty_bloomfilter_spark.operators.sketches import BloomSketch

    rng = np.random.default_rng(17)
    n = 4000
    keys = [f"k{i % 1000:04d}" for i in range(n)]
    toks = [rng.integers(0, 50257, size=3, dtype=np.int32) for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame({"source": keys, "tokens": toks}))
    rows = BloomSketch(SHAPE).build_by_key(df, "source").collect()
    assert len(rows) == 1000
    by_key = {}
    for k, t in zip(keys, toks):
        by_key.setdefault(k, []).append(t)
    for r in rows[:25]:
        payload = bytes(r["payload"])
        # sparse codec byte (header offset 7 is codec in <4sBBBBQIQ: magic,ver,kind,codec,...)
        assert payload[6] == 1, "expected sparse wire codec for tiny fill"
        oracle = BloomFilter.empty(SHAPE)
        oracle.add_tokens(np.concatenate(by_key[r["key"]]))
        assert payload == oracle.to_bytes()
