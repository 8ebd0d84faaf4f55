"""Wire-codec hardening (round-4 max-effort review findings): forged or
corrupt payloads must raise ValueError at the decode site — never be
silently accepted into the merge algebra, never escape as struct.error
/ IndexError / AttributeError from deep inside a kernel."""

import struct

import numpy as np
import pytest

from rusty_bloomfilter_spark.sketch import (
    BloomFilter,
    CountMinSketch,
    CountSketch,
    CountingBloomFilter,
    HyperLogLog,
    KLLSketch,
    Shape,
    SparseBloomBuilder,
    merge_payloads,
    merge_sketch_payloads,
)

# bloom header: <4sBBBBQIQ — codec byte at offset 6
_BLOOM_HDR = struct.Struct("<4sBBBBQIQ")


def _sparse_payload(m: int, k: int, indices, n_items=1) -> bytes:
    head = _BLOOM_HDR.pack(b"RBSK", 1, 1, 1, 0, m, k, n_items)
    return head + np.asarray(indices, dtype=np.uint32).tobytes()


def test_bloom_sparse_index_out_of_range_rejected():
    # index 100 sits inside the ceil(70/64)*64 padding zone: previously
    # decoded silently; index 5000 previously crashed with IndexError
    for bad in (100, 5000):
        with pytest.raises(ValueError, match=">= m"):
            BloomFilter.from_bytes(_sparse_payload(70, 3, [1, bad]))


def test_bloom_merge_payloads_fast_path_rejects_forged_index():
    ok = _sparse_payload(70, 3, [1, 2])
    bad = _sparse_payload(70, 3, [100])
    with pytest.raises(ValueError, match=">= m"):
        merge_payloads([ok, bad])


def test_bloom_unknown_codec_rejected():
    f = BloomFilter.empty(Shape(m=70, k=3)).add_tokens(
        np.arange(10, dtype=np.int64)
    )
    raw = bytearray(f.to_bytes())
    raw[6] = 7  # codec byte
    with pytest.raises(ValueError, match="codec"):
        BloomFilter.from_bytes(bytes(raw))


def test_bloom_dense_padding_bits_rejected():
    f = BloomFilter.empty(Shape(m=70, k=3)).add_tokens(
        np.arange(40, dtype=np.int64)
    )
    raw = bytearray(f.to_bytes())
    assert raw[6] == 0, "test expects a dense payload"
    raw[-1] |= 0x80  # bit 127 >= m=70
    with pytest.raises(ValueError, match="padding"):
        BloomFilter.from_bytes(bytes(raw))


def test_bloom_dense_wrong_length_rejected():
    f = BloomFilter.empty(Shape(m=70, k=3)).add_tokens(
        np.arange(40, dtype=np.int64)
    )
    raw = f.to_bytes()
    assert raw[6] == 0
    with pytest.raises(ValueError, match="bytes"):
        BloomFilter.from_bytes(raw + b"\x00" * 8)


def test_shape_for_np_clamps_k_at_64():
    s = Shape.for_np(10**6, 1e-20)  # optimal k would be 66
    assert s.k == 64
    # sanity: still a valid monotone shape
    assert s.m > Shape.for_np(10**6, 1e-10).m


def test_sparse_builder_dense_snapshot_is_isolated():
    shape = Shape.for_np(n=500, p=0.01)
    b = SparseBloomBuilder(shape)
    b.add_tokens(np.arange(400, dtype=np.int64))  # enough to promote
    f = b.to_filter()
    before = f.to_bytes()
    b.add_tokens(np.arange(400, 800, dtype=np.int64))
    assert f.to_bytes() == before  # later builder adds must not mutate it


@pytest.mark.parametrize(
    "cls,magic",
    [
        (HyperLogLog, b"RHLL"),
        (CountMinSketch, b"RCMS"),
        (CountSketch, b"RAMS"),
        (KLLSketch, b"RKLL"),
        (CountingBloomFilter, b"RCBF"),
    ],
)
def test_truncated_payloads_raise_valueerror_not_struct_error(cls, magic):
    with pytest.raises(ValueError):
        cls.from_bytes(magic + b"xx")


def test_kll_forged_level_count_raises_valueerror():
    sk = KLLSketch(200)
    sk.update_batch(np.arange(100, dtype=np.float64))
    raw = bytearray(sk.to_bytes())
    # n_levels at offset 12 (<4sBxxxIIQ): forge 99 levels
    struct.pack_into("<I", raw, 12, 99)
    with pytest.raises(ValueError, match="truncated level"):
        KLLSketch.from_bytes(bytes(raw))


def test_cms_wrong_body_length_raises():
    sk = CountMinSketch(4, 64)
    raw = sk.to_bytes()
    with pytest.raises(ValueError, match="bytes"):
        CountMinSketch.from_bytes(raw[:-8])


def test_hll_v1_wrong_register_count_raises():
    h = HyperLogLog(10)
    h.add_tokens(np.arange(5000, dtype=np.int64))  # dense encoding
    raw = h.to_bytes()
    with pytest.raises(ValueError, match="registers"):
        HyperLogLog.from_bytes(raw[:-4])


def _sparse_hll_payload(p: int, entries) -> bytes:
    hdr = struct.Struct("<4sBBxxQ").pack(b"RHLL", 2, p, 1)
    packed = np.array(
        [(i << 6) | r for i, r in entries], dtype="<u4"
    )
    return hdr + packed.tobytes()


def test_hll_sparse_forged_rank_rejected():
    # rank 63 at p=14 exceeds the reachable cap 64-14+1=51
    with pytest.raises(ValueError, match="rank"):
        HyperLogLog.from_bytes(_sparse_hll_payload(14, [(5, 63)]))
    # the cap itself is legitimate
    h = HyperLogLog.from_bytes(_sparse_hll_payload(14, [(5, 51)]))
    assert h.registers[5] == 51


def test_hll_sparse_duplicate_indices_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        HyperLogLog.from_bytes(_sparse_hll_payload(14, [(5, 3), (5, 7)]))


def test_merge_sketch_payloads_mixed_kinds_rejected():
    bloom = BloomFilter.empty(Shape(m=1000, k=5)).add_tokens(
        np.arange(10, dtype=np.int64)
    )
    hll = HyperLogLog(10)
    hll.add_tokens(np.arange(10, dtype=np.int64))
    with pytest.raises(ValueError, match="kind mismatch"):
        merge_sketch_payloads([bloom.to_bytes(), hll.to_bytes()])


# -- CBF chunked updates must equal the one-shot semantics ----------------


def test_cbf_chunked_add_remove_equals_one_shot(monkeypatch):
    shape = Shape.for_np(n=200, p=0.01)
    toks = np.arange(150, dtype=np.int64)
    whole = CountingBloomFilter.empty(shape).add_tokens(toks)
    monkeypatch.setattr(CountingBloomFilter, "_CHUNK", 7)
    chunked = CountingBloomFilter.empty(shape).add_tokens(toks)
    assert whole.to_bytes() == chunked.to_bytes()

    # removal: chunked sticky count and final counters match one-shot
    rm = toks[::3]
    s1 = whole.remove_tokens(rm)
    monkeypatch.setattr(CountingBloomFilter, "_CHUNK", 1 << 18)
    s2 = chunked.remove_tokens(rm)
    assert s1 == s2
    assert whole.to_bytes() == chunked.to_bytes()


def test_cbf_subtract_touched_only_matches_remove():
    shape = Shape.for_np(n=300, p=0.001)
    toks = np.arange(250, dtype=np.int64)
    rm = toks[::5]
    a = CountingBloomFilter.empty(shape).add_tokens(toks)
    b = CountingBloomFilter.empty(shape).add_tokens(toks)
    rev = CountingBloomFilter.empty(shape).add_tokens(rm)
    sa = a.remove_tokens(rm)
    sb = b.subtract_in_place(rev)
    assert sa == sb == 0
    assert a.to_bytes() == b.to_bytes()
    keep = np.setdiff1d(toks, rm)
    assert a.contains_tokens(keep).all()


def test_cbf_merge_wrap_saturation_matches_reference():
    """uint8 wrap-detect saturating add == int64 min(a+b, 255)."""
    rng = np.random.default_rng(7)
    shape = Shape(m=512, k=3)
    a = rng.integers(0, 256, 512).astype(np.uint8)
    b = rng.integers(0, 256, 512).astype(np.uint8)
    fa = CountingBloomFilter(shape, a.copy(), n_items=1)
    fb = CountingBloomFilter(shape, b.copy(), n_items=1)
    fa.merge_in_place(fb)
    want = np.minimum(a.astype(np.int64) + b, 255).astype(np.uint8)
    assert np.array_equal(fa.counters, want)
