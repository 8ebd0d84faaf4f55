"""Sparse HLL wire format (sketch/hll.py v2 encoding): canonical
chooser, roundtrip fidelity, mixed-form merge algebra, size wins, and
malformed-payload rejection. The HLL analogue of the reference's
sparse/dense Bloom representations (mod.rs sparse promotion)."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.sketch import HyperLogLog, merge_sketch_payloads
from rusty_bloomfilter_spark.sketch.hll import _HEADER


def _hll(values, p=14):
    h = HyperLogLog(p)
    h.add_u64(np.asarray(values, dtype=np.uint64))
    return h


def test_empty_payload_is_tiny_and_roundtrips():
    h = HyperLogLog(14)
    b = h.to_bytes()
    assert len(b) == _HEADER.size  # 16 bytes, not 16 KiB
    back = HyperLogLog.from_bytes(b)
    assert back == h and back.n_items == 0
    assert back.estimate() == 0.0


def test_sparse_roundtrip_preserves_state_items_estimate():
    h = _hll(range(1, 200))
    b = h.to_bytes()
    assert b[4] == 2  # version byte: sparse
    back = HyperLogLog.from_bytes(b)
    assert back == h
    assert back.n_items == h.n_items
    assert back.estimate() == h.estimate()


def test_dense_kicks_in_past_quarter_fill():
    p = 8  # m = 256: saturate cheaply
    h = _hll(range(1, 100_000), p=p)
    nnz = int((h.registers > 0).sum())
    assert 4 * nnz >= h.m
    b = h.to_bytes()
    assert b[4] == 1  # dense
    assert HyperLogLog.from_bytes(b) == h


def test_encoding_chooser_is_pure_function_of_state():
    # Two sketches reaching the same register state by different
    # insertion orders / groupings must serialize identically.
    vals = np.arange(1, 300, dtype=np.uint64)
    a = _hll(vals)
    b = HyperLogLog(14)
    rng = np.random.default_rng(7)
    shuffled = vals.copy()
    rng.shuffle(shuffled)
    for chunk in np.array_split(shuffled, 5):
        b.add_u64(chunk)
    assert a.to_bytes() == b.to_bytes()


def test_mixed_form_merge_and_order_invariance():
    p = 10
    small = _hll(range(1, 50), p=p).to_bytes()  # sparse
    big = _hll(range(1, 50_000), p=p).to_bytes()  # dense
    mid = _hll(range(25_000, 60_000), p=p).to_bytes()
    assert small[4] == 2 and big[4] == 1
    merged = merge_sketch_payloads([small, big, mid])
    assert merged == merge_sketch_payloads([mid, small, big])
    assert merged == merge_sketch_payloads([big, mid, small])
    # merged estimate covers the union
    est = HyperLogLog.from_bytes(merged).estimate()
    assert abs(est - 59_999) / 59_999 < 3 * HyperLogLog(p).relative_error()


def test_sparse_wire_is_smaller_than_dense_for_small_groups():
    h = _hll(range(1, 500))
    dense_size = _HEADER.size + h.m
    assert len(h.to_bytes()) < dense_size / 4


def test_sparse_rank_values_survive_roundtrip_at_all_p():
    for p in (4, 10, 18):
        h = _hll([1, 2, 3, 2**63, 2**64 - 1], p=p)
        assert HyperLogLog.from_bytes(h.to_bytes()) == h


def test_out_of_range_sparse_index_rejected():
    h = _hll(range(1, 4), p=10)
    b = bytearray(h.to_bytes())
    assert b[4] == 2
    # forge an index beyond m=1024: packed word idx=1024, rank=1
    forged = b[: _HEADER.size] + np.array(
        [(1024 << 6) | 1], dtype="<u4"
    ).tobytes()
    with pytest.raises(ValueError, match="out of range"):
        HyperLogLog.from_bytes(bytes(forged))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        HyperLogLog.from_bytes(b"RHLL" + b"\x09" + b"\x00" * 20)


def test_keyed_build_small_groups_ship_sparse_payloads(spark):
    """The Spark keyed path: many small groups -> every shuffled
    payload is v2 sparse, total wire bytes a fraction of dense, and
    each estimate within the linear-counting bound of exact."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sketches import HllSketch

    df = spark.range(2000).select(
        (F.col("id") % 100).alias("user_id"),
        F.col("id").alias("event_id"),
    )
    keyed = HllSketch(p=14, col="event_id", scalar=True).build_by_key(
        df, "user_id"
    )
    rows = keyed.collect()
    assert len(rows) == 100
    m = 1 << 14
    dense_size = _HEADER.size + m
    for r in rows:
        payload = bytes(r.payload)
        assert payload[4] == 2  # sparse on the wire
        assert len(payload) < dense_size / 16
        est = HyperLogLog.from_bytes(payload).estimate()
        assert abs(est - 20) / 20 <= 3 * 1.04 / (m**0.5) + 0.05
        assert r.n_items == 20
