"""DDSketch: relative-error quantile guarantee, the canonical-bytes
merge algebra (the property KLL/t-digest cannot offer — bucket counts
are a pure function of the inserted multiset, so ANY partitioning
yields bitwise-identical payloads), wire hardening, the distributed
DDQuantiles operator, and the dd_agg/dd_quantile SQL pair."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import (
    DDSketch,
    KLLSketch,
    merge_sketch_payloads,
    sketch_from_bytes,
)

ALPHA = 0.01


def lognormal(n=100_000, seed=3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.lognormal(mean=4.0, sigma=2.0, size=n)


def rel_err(est: float, true: float) -> float:
    return abs(est - true) / abs(true)


# ---------------------------------------------------------------------------
# accuracy guarantee
# ---------------------------------------------------------------------------


def test_relative_error_bound_heavy_tail():
    """|quantile(q) - item_at_rank| <= alpha * item for every q, on a
    heavy-tailed stream spanning ~8 orders of magnitude — the regime
    where a uniform-RANK-error sketch (KLL) loses the tail."""
    vals = lognormal()
    dd = DDSketch(ALPHA).add(vals)
    s = np.sort(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 1.0):
        true = float(s[int(math.floor(q * (s.size - 1)))])
        assert rel_err(dd.quantile(q), true) <= ALPHA + 1e-9, q


def test_tail_precision_vs_kll_rank_blur():
    """At p99.9 of a heavy tail, DDSketch's VALUE error stays <= alpha
    while KLL's rank-eps translates to a much larger value error —
    the documented reason this sketch exists beside kll.py."""
    vals = lognormal(seed=9)
    s = np.sort(vals)
    q = 0.999
    true = float(s[int(math.floor(q * (s.size - 1)))])
    dd_est = DDSketch(ALPHA).add(vals).quantile(q)
    kll_est = KLLSketch(k=200).update_batch(vals).quantile(q)
    assert rel_err(dd_est, true) <= ALPHA + 1e-9
    # not a KLL bug — just the different guarantee: rank error eps maps
    # to value error eps * local density^-1, huge in a thin tail
    assert rel_err(dd_est, true) <= rel_err(kll_est, true) + 1e-12


def test_signs_and_zeros():
    vals = np.concatenate([-lognormal(5_000, seed=1), np.zeros(100), lognormal(5_000, seed=2)])
    dd = DDSketch(ALPHA).add(vals)
    assert dd.zero_count == 100
    assert dd.n_items == vals.size
    s = np.sort(vals)
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        true = float(s[int(math.floor(q * (s.size - 1)))])
        if true == 0.0:
            assert dd.quantile(q) == 0.0
        else:
            assert rel_err(dd.quantile(q), true) <= ALPHA + 1e-9


def test_weighted_add_equals_repeated():
    a = DDSketch(ALPHA).add(np.array([3.0, 7.0]), counts=np.array([5, 2]))
    b = DDSketch(ALPHA).add(np.array([3.0] * 5 + [7.0] * 2))
    assert a == b and a.to_bytes() == b.to_bytes()


def test_rejects_nonfinite_and_bad_quantile():
    dd = DDSketch(ALPHA)
    with pytest.raises(ValueError):
        dd.add(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        dd.add(np.array([np.inf]))
    with pytest.raises(ValueError):
        DDSketch(ALPHA).add(np.array([1.0])).quantile(1.5)
    with pytest.raises(ValueError):
        DDSketch(ALPHA).quantile(0.5)  # empty


def test_max_buckets_guard_raises_loudly():
    with pytest.raises(ValueError, match="max_buckets"):
        DDSketch(0.001, max_buckets=64).add(np.geomspace(1e-6, 1e6, 5_000))


# ---------------------------------------------------------------------------
# merge algebra: canonical bytes under ANY partitioning
# ---------------------------------------------------------------------------


def test_partition_invariant_canonical_bytes():
    """The headline property: split the stream ANY way, merge in ANY
    order — bitwise-identical payload. (KLL/t-digest only promise the
    estimates stay in bound; their bytes differ by partitioning.)"""
    vals = lognormal(20_000, seed=5)
    whole = DDSketch(ALPHA).add(vals).to_bytes()
    rng = np.random.default_rng(0)
    for _ in range(3):
        parts = np.array_split(rng.permutation(vals), rng.integers(2, 9))
        payloads = [DDSketch(ALPHA).add(p).to_bytes() for p in parts if p.size]
        rng.shuffle(payloads)
        assert merge_sketch_payloads(payloads) == whole


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_merge_associative_commutative(values, cut):
    vals = np.asarray(values)
    cut = cut % len(values)
    a = DDSketch(ALPHA).add(vals[:cut]) if cut else DDSketch(ALPHA)
    b = DDSketch(ALPHA).add(vals[cut:])
    ab = a.merge(b)
    ba = b.merge(a)
    assert ab == ba and ab.to_bytes() == ba.to_bytes()
    assert ab == DDSketch(ALPHA).add(vals)
    # empty identity
    assert a.merge(DDSketch(ALPHA)) == a


def test_merge_rejects_alpha_mismatch():
    with pytest.raises(ValueError, match="alpha"):
        DDSketch(0.01).merge_in_place(DDSketch(0.02))


# ---------------------------------------------------------------------------
# wire hardening
# ---------------------------------------------------------------------------


def test_roundtrip_and_registry_dispatch():
    dd = DDSketch(ALPHA).add(np.concatenate([lognormal(2_000), -lognormal(500, seed=8)]))
    blob = dd.to_bytes()
    back = DDSketch.from_bytes(blob)
    assert back == dd and back.to_bytes() == blob
    assert isinstance(sketch_from_bytes(blob), DDSketch)


def test_corrupt_payloads_raise():
    dd = DDSketch(ALPHA).add(np.array([1.0, 10.0, 100.0]))
    blob = bytearray(dd.to_bytes())
    with pytest.raises(ValueError):
        DDSketch.from_bytes(bytes(blob[: len(blob) - 3]))  # truncated body
    with pytest.raises(ValueError):
        DDSketch.from_bytes(b"XXXX" + bytes(blob[4:]))  # bad magic
    # counts that no longer sum to n_items
    tampered = bytearray(blob)
    tampered[-1] ^= 0x01
    with pytest.raises(ValueError):
        DDSketch.from_bytes(bytes(tampered))


# ---------------------------------------------------------------------------
# distributed operator + SQL pair
# ---------------------------------------------------------------------------


def test_dd_quantiles_spark_matches_local(spark):
    from rusty_bloomfilter_spark.operators.sketches import DDQuantiles

    vals = lognormal(30_000, seed=13)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double").repartition(7)
    got = DDQuantiles(ALPHA, col="value").quantiles(df, [0.5, 0.99])
    local = DDSketch(ALPHA).add(vals)
    # canonical algebra: distributed build == local build exactly
    assert got == [local.quantile(0.5), local.quantile(0.99)]


def test_dd_quantiles_by_key_in_bound(spark):
    from rusty_bloomfilter_spark.operators.sketches import DDQuantiles

    rng = np.random.default_rng(21)
    rows = [
        (k, float(v))
        for k in ("a", "b")
        for v in rng.lognormal(3.0 if k == "a" else 6.0, 1.5, size=4_000)
    ]
    df = spark.createDataFrame(rows, "key string, value double").repartition(5)
    out = {
        (r.key, r.q): r.value
        for r in DDQuantiles(ALPHA, col="value").quantiles_by_key(df, "key", [0.9]).collect()
    }
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["key", "value"])
    for k, grp in pdf.groupby("key"):
        s = np.sort(grp["value"].to_numpy())
        true = float(s[int(math.floor(0.9 * (s.size - 1)))])
        assert rel_err(out[(k, 0.9)], true) <= ALPHA + 1e-9


def test_dd_sql_pair(spark):
    from rusty_bloomfilter_spark.functions.sql_sketches import register_sketch_sql

    register_sketch_sql(spark, prefix="t_dd_")
    vals = lognormal(10_000, seed=17)
    spark.createDataFrame([(float(v),) for v in vals], "value double").createOrReplaceTempView(
        "dd_vals"
    )
    got = spark.sql(
        "SELECT t_dd_dd_quantile(t_dd_dd_agg(value), 0.99) AS p99 FROM dd_vals"
    ).collect()[0].p99
    s = np.sort(vals)
    true = float(s[int(math.floor(0.99 * (s.size - 1)))])
    assert rel_err(got, true) <= ALPHA + 1e-9
