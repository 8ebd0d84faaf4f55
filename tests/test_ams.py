"""CountSketch (AMS): unbiased two-sided point estimates, F2
second-moment accuracy, mergeable algebra (associative + commutative +
canonical bytes), wire hardening, deletions, and the skew-oracle math
(F2/F1 average multiplicity) that operators/skew.py builds on."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import (
    CountSketch,
    merge_sketch_payloads,
    sketch_from_bytes,
)


def zipf_stream(n=200_000, vocab=50_000, seed=11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=vocab).astype(np.int64)


def exact_f2(stream: np.ndarray) -> int:
    _, c = np.unique(stream, return_counts=True)
    return int((c.astype(np.float64) ** 2).sum())


# ---------------------------------------------------------------------------
# accuracy
# ---------------------------------------------------------------------------


def test_f2_zipf_accuracy():
    """F2 estimate within 3x the per-row rel-std sqrt(2/w) of truth on
    a heavy-tailed stream (median over 5 rows concentrates well inside
    that)."""
    stream = zipf_stream()
    true_f2 = exact_f2(stream)
    cs = CountSketch(d=5, w=8192).add_tokens(stream)
    rel = abs(cs.f2() - true_f2) / true_f2
    assert rel <= 3 * cs.f2_rel_error(), rel


def test_f2_exact_when_no_collisions():
    """With vocab << w, collisions are rare enough that F2 lands within
    a hair of exact (and n_items == F1 exactly)."""
    rng = np.random.default_rng(3)
    stream = rng.integers(0, 50, 10_000, dtype=np.int64)
    cs = CountSketch(d=5, w=1 << 16).add_tokens(stream)
    assert cs.n_items == 10_000
    true_f2 = exact_f2(stream)
    assert abs(cs.f2() - true_f2) / true_f2 < 0.01


def test_point_estimates_two_sided_and_tight_for_heavy_keys():
    """Point estimates are two-sided (under AND over occur — unlike
    CMS) and within 3*sqrt(F2/w) of truth for the top keys."""
    stream = zipf_stream()
    vals, counts = np.unique(stream, return_counts=True)
    cs = CountSketch(d=5, w=8192).add_tokens(stream)
    est = cs.query_tokens(vals)
    err = est - counts
    assert (err > 0).any() and (err < 0).any()  # two-sided
    bound = 3 * np.sqrt(exact_f2(stream) / 8192)
    top = np.argsort(counts)[-20:]
    assert np.all(np.abs(err[top]) <= bound), np.abs(err[top]).max()


def test_point_estimate_mean_error_near_zero():
    """Unbiasedness in aggregate: the mean signed error over all keys
    is tiny relative to the error bound (collisions cancel)."""
    stream = zipf_stream(seed=23)
    vals, counts = np.unique(stream, return_counts=True)
    cs = CountSketch(d=5, w=8192).add_tokens(stream)
    err = (cs.query_tokens(vals) - counts).astype(np.float64)
    assert abs(err.mean()) < np.sqrt(exact_f2(stream) / 8192)


def test_multiplicity_counts_equal_repeated_adds():
    """add_tokens(values, counts) == adding each occurrence — the
    dedup_counts fast path must be invisible in the state."""
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1000, 500, dtype=np.int64)
    cnts = rng.integers(1, 9, 500, dtype=np.int64)
    a = CountSketch(d=3, w=1024).add_tokens(vals, cnts)
    b = CountSketch(d=3, w=1024).add_tokens(np.repeat(vals, cnts))
    assert a == b and a.n_items == b.n_items == int(cnts.sum())


def test_deletions_cancel_exactly():
    """Negative counts subtract: insert a stream then delete it —
    the table returns to all-zero (deletable like the counting Bloom)."""
    stream = zipf_stream(n=20_000)
    vals, cnts = np.unique(stream, return_counts=True)
    cs = CountSketch(d=3, w=2048).add_tokens(stream)
    cs.add_tokens(vals, -cnts)
    assert not cs.table.any()
    assert cs.n_items == 0


def test_inner_product_join_size_two_sided():
    """AMS inner product estimates |A join B| within 3x the per-row
    std of truth (two-sided, unlike CMS's guaranteed overestimate)."""
    rng = np.random.default_rng(7)
    n = 50_000
    w = 8192
    a = rng.zipf(1.5, size=n).clip(max=20_000).astype(np.int64)
    b = rng.zipf(1.5, size=n).clip(max=20_000).astype(np.int64)
    va, ca = np.unique(a, return_counts=True)
    vb, cb = np.unique(b, return_counts=True)
    _, ia, ib = np.intersect1d(va, vb, return_indices=True)
    exact = int((ca[ia].astype(np.float64) * cb[ib]).sum())
    est = CountSketch(d=5, w=w).add_tokens(a).inner_product(
        CountSketch(d=5, w=w).add_tokens(b)
    )
    bound = 3 * np.sqrt(2.0 * exact_f2(a) * exact_f2(b) / w)
    assert abs(est - exact) <= bound, (est, exact, bound)
    with pytest.raises(ValueError, match="dimension mismatch"):
        CountSketch(d=5, w=4096).inner_product(CountSketch(d=5, w=8192))


# ---------------------------------------------------------------------------
# merge algebra
# ---------------------------------------------------------------------------


def test_merge_equals_single_build_bitwise():
    stream = zipf_stream(n=60_000)
    parts = np.array_split(stream, 7)
    whole = CountSketch(d=5, w=4096).add_tokens(stream)
    payloads = [CountSketch(d=5, w=4096).add_tokens(p).to_bytes() for p in parts]
    assert merge_sketch_payloads(payloads) == whole.to_bytes()
    assert merge_sketch_payloads(payloads[::-1]) == whole.to_bytes()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(st.integers(0, 500), max_size=60), min_size=1, max_size=5))
def test_merge_associative_commutative(parts):
    sks = [
        CountSketch(d=3, w=256).add_tokens(np.asarray(p, dtype=np.int64))
        for p in parts
    ]
    payloads = [s.to_bytes() for s in sks]
    merged = merge_sketch_payloads(payloads)
    assert merge_sketch_payloads(payloads[::-1]) == merged
    # left fold == right-grouped fold (associativity)
    if len(payloads) >= 3:
        left = merge_sketch_payloads(
            [merge_sketch_payloads(payloads[:2]), *payloads[2:]]
        )
        right = merge_sketch_payloads(
            [payloads[0], merge_sketch_payloads(payloads[1:])]
        )
        assert left == right == merged


def test_merge_dimension_mismatch_raises():
    a = CountSketch(d=3, w=256)
    b = CountSketch(d=3, w=512)
    with pytest.raises(ValueError, match="dimension mismatch"):
        a.merge_in_place(b)


# ---------------------------------------------------------------------------
# wire
# ---------------------------------------------------------------------------


def test_wire_roundtrip_and_magic_dispatch():
    cs = CountSketch(d=5, w=1024).add_tokens(zipf_stream(n=5_000))
    back = sketch_from_bytes(cs.to_bytes())
    assert isinstance(back, CountSketch)
    assert back == cs and back.n_items == cs.n_items


def test_wire_rejects_garbage():
    with pytest.raises(ValueError):
        CountSketch.from_bytes(b"nope")
    with pytest.raises(ValueError):
        CountSketch.from_bytes(b"RAMS" + b"\x00" * 3)
    good = CountSketch(d=3, w=64).to_bytes()
    with pytest.raises(ValueError, match="corrupt"):
        CountSketch.from_bytes(good[:-8])


def test_negative_n_items_survives_wire():
    """The signed n_items header field: net-negative totals (more
    deletions than inserts) round-trip."""
    cs = CountSketch(d=3, w=64)
    cs.add_tokens(np.asarray([1, 2], dtype=np.int64), np.asarray([-5, -6]))
    back = CountSketch.from_bytes(cs.to_bytes())
    assert back.n_items == -11 and back == cs


def test_invalid_params_raise():
    with pytest.raises(ValueError):
        CountSketch(d=0, w=16)
    with pytest.raises(ValueError, match="odd"):
        CountSketch(d=4, w=16)
    with pytest.raises(ValueError):
        CountSketch(d=3, w=0)


def test_empty_sketch_estimates_zero():
    cs = CountSketch(d=3, w=64)
    assert cs.f2() == 0
    assert cs.query_tokens(np.asarray([1, 2, 3], dtype=np.int64)).tolist() == [0, 0, 0]
    assert cs.query_tokens(np.empty(0, dtype=np.int64)).size == 0


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.lists(st.integers(0, 300), max_size=50), min_size=1, max_size=4),
    st.lists(st.lists(st.integers(0, 300), max_size=50), min_size=1, max_size=4),
)
def test_subtract_commutes_with_merge(parts_a, parts_b):
    """Linearity: merging partition sketches THEN subtracting equals
    the signed-update sketch of the whole difference stream — the
    property that lets token_shift_topk_cs build each side distributed
    and difference once on the driver."""
    import numpy as np

    from rusty_bloomfilter_spark.sketch import CountSketch

    def build(parts):
        acc = CountSketch(3, 256)
        for p in parts:
            part = CountSketch(3, 256)
            if p:
                part.add_tokens(np.asarray(p, dtype=np.int64))
            acc.merge_in_place(part)
        return acc

    diff = build(parts_a).subtract(build(parts_b))
    signed = CountSketch(3, 256)
    for p in parts_a:
        if p:
            signed.add_tokens(np.asarray(p, dtype=np.int64))
    for p in parts_b:
        if p:
            signed.add_tokens(
                np.asarray(p, dtype=np.int64), counts=-np.ones(len(p))
            )
    assert np.array_equal(diff.table, signed.table)
