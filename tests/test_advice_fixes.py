"""Regression tests for the round-1 ADVICE findings.

Each test pins a previously-latent defect:
1. int64 scalar columns with nulls must not round-trip through float64
   (values > 2^53 were silently rounded -> Bloom false negatives,
   collapsed HLL distincts).
2. Streaming sketch state must commit (batch_id, payload) atomically.
3. rolling_fingerprint_expr must be total (rows shorter than n tokens).
4. Shape must reject m/k combinations where the vectorized K-M
   expansion would overflow uint64.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from rusty_bloomfilter_spark.operators.sketches import (
    BlockedBloomSketch,
    BloomSketch,
    HllSketch,
    _scalar_values,
)
from rusty_bloomfilter_spark.sketch import BloomFilter, HyperLogLog, Shape

# Values straddling the float64-exact boundary: adjacent int64 values
# above 2^53 collapse to the same float64.
BIG_A = 6755399441055744123  # > 2^53
BIG_B = 6755399441055744124  # rounds to the same float64 as BIG_A


def test_scalar_values_null_batch_preserves_big_ints():
    """The exact ADVICE repro: a batch containing a null used to send
    int64 through float64, rounding 6755399441055744123 -> ...000."""
    clean = pa.record_batch({"v": pa.array([BIG_A, BIG_B], type=pa.int64())})
    nully = pa.record_batch({"v": pa.array([BIG_A, None, BIG_B], type=pa.int64())})
    got_clean = _scalar_values(clean, "v")
    got_nully = _scalar_values(nully, "v")
    assert got_clean.dtype == np.int64 and got_nully.dtype == np.int64
    assert got_clean.tolist() == [BIG_A, BIG_B]
    assert got_nully.tolist() == [BIG_A, 0, BIG_B]


def test_scalar_values_float_column_still_works():
    b = pa.record_batch({"v": pa.array([1.5, None, -2.0], type=pa.float64())})
    assert _scalar_values(b, "v").tolist() == [1, 0, -2]


def test_bloom_scalar_zero_fn_across_null_mix():
    """Build from a null-bearing batch, probe from a null-free batch:
    the same big id must hit (zero-FN invariant on the scalar path)."""
    sk = BloomSketch.for_np(n=1000, p=1e-4, col="v", scalar=True)
    acc = sk._empty()
    sk._update(acc, pa.record_batch({"v": pa.array([BIG_A, None], type=pa.int64())}))
    bf = BloomFilter.from_bytes(acc.to_bytes())
    assert bool(bf.contains_tokens(np.array([BIG_A], dtype=np.int64)).all())
    # BIG_B was never inserted; under float64 rounding it would alias BIG_A.
    # (It may still be a Bloom false positive, but must not be a forced hit:
    # check the underlying insert used the exact value by asserting the
    # filters from the two batch mixes are bitwise identical.)
    acc2 = sk._empty()
    sk._update(acc2, pa.record_batch({"v": pa.array([BIG_A, 0], type=pa.int64())}))
    assert acc.to_bytes() == acc2.to_bytes()


def test_hll_scalar_distinguishes_adjacent_big_ints():
    """HLL scalar path: 2^53-adjacent ids must register as distinct
    values (previously both collapsed through float64)."""
    hs = HllSketch(p=14, col="v", scalar=True)
    only_a = hs._empty()
    hs._update(only_a, pa.record_batch({"v": pa.array([BIG_A], type=pa.int64())}))
    both = hs._empty()
    hs._update(both, pa.record_batch({"v": pa.array([BIG_A, BIG_B, None], type=pa.int64())}))
    # identical under the old float64 collapse; distinct registers now
    assert both.to_bytes() != only_a.to_bytes()


def test_blocked_bloom_scalar_null_path_bitwise():
    sk = BlockedBloomSketch.for_np(n=1000, p=1e-3, col="v", scalar=True)
    with_null = sk._empty()
    sk._update(with_null, pa.record_batch({"v": pa.array([BIG_A, None, BIG_B])}))
    clean = sk._empty()
    sk._update(clean, pa.record_batch({"v": pa.array([BIG_A, 0, BIG_B])}))
    assert with_null.to_bytes() == clean.to_bytes()


# ---------------------------------------------------------------------------
# Streaming state atomicity
# ---------------------------------------------------------------------------


def test_streaming_state_single_file_commit(tmp_path):
    from rusty_bloomfilter_spark.streaming import StreamingSketchState

    shape = Shape.for_np(n=10_000, p=1e-3)
    state = StreamingSketchState(str(tmp_path / "s.state"))
    f1 = BloomFilter.empty(shape).add_tokens(np.arange(100, dtype=np.int64))
    f2 = BloomFilter.empty(shape).add_tokens(np.arange(100, 200, dtype=np.int64))

    state.apply_batch(f1.to_bytes(), batch_id=0)
    state.apply_batch(f2.to_bytes(), batch_id=1)
    # replay of batch 1 must be a no-op (non-idempotent sketches would
    # double-count otherwise)
    before = state.payload()
    state.apply_batch(f2.to_bytes(), batch_id=1)
    assert state.payload() == before
    assert state._last_batch() == 1

    merged = BloomFilter.from_bytes(state.payload())
    assert merged.to_bytes() == f1.merge(f2).to_bytes()

    # batch id + payload live in ONE file; no sidecar to desync
    files = sorted(os.listdir(tmp_path))
    assert files == ["s.state"]


def test_streaming_state_header_is_authoritative(tmp_path):
    """Simulate the old failure: the payload on disk must always carry
    its own batch id — reading back yields exactly the committed pair."""
    from rusty_bloomfilter_spark.streaming import StreamingSketchState
    from rusty_bloomfilter_spark.streaming.sketch_stream import (
        _STATE_HEADER,
        _STATE_MAGIC,
    )

    shape = Shape.for_np(n=1000, p=1e-2)
    state = StreamingSketchState(str(tmp_path / "h.state"))
    payload = BloomFilter.empty(shape).add_tokens(np.arange(10, dtype=np.int64)).to_bytes()
    state.apply_batch(payload, batch_id=7)
    raw = open(state.state_path, "rb").read()
    magic, batch_id = _STATE_HEADER.unpack_from(raw, 0)
    assert magic == _STATE_MAGIC and batch_id == 7
    assert raw[_STATE_HEADER.size :] == state.payload() == payload


def test_streaming_state_rejects_foreign_file(tmp_path):
    from rusty_bloomfilter_spark.streaming import StreamingSketchState

    p = tmp_path / "bad.state"
    p.write_bytes(b"XXXX" + struct.pack("<q", 3) + b"junk")
    with pytest.raises(ValueError, match="not a sketch state file"):
        StreamingSketchState(str(p)).payload()


# ---------------------------------------------------------------------------
# rolling_fingerprint totality
# ---------------------------------------------------------------------------


def test_rolling_fingerprint_short_rows_are_null(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.text import rolling_fingerprint_expr

    df = spark.createDataFrame(
        [([],), ([5],), ([5, 6],), ([5, 6, 7],), ([5, 6, 7, 8],)],
        "tokens array<int>",
    )
    rows = df.select(rolling_fingerprint_expr(F.col("tokens")).alias("fp")).collect()
    vals = [r["fp"] for r in rows]
    assert vals[0] is None and vals[1] is None and vals[2] is None
    assert vals[3] == 5 * 2526168121 + 6 * 50261 + 7
    assert vals[4] == min(
        5 * 2526168121 + 6 * 50261 + 7, 6 * 2526168121 + 7 * 50261 + 8
    )


# ---------------------------------------------------------------------------
# Shape overflow guard
# ---------------------------------------------------------------------------


def test_shape_rejects_overflow_prone_m_and_k():
    Shape(m=1 << 57, k=8)  # boundary OK
    with pytest.raises(ValueError, match="2\\^57"):
        Shape(m=(1 << 57) + 1, k=8)
    with pytest.raises(ValueError, match="k must be <= 64"):
        Shape(m=1024, k=65)
