"""XorFilter — static AMQ tier: zero FN, exact 2^-16 FPR, canonical
bytes as a pure function of the key set, loud refusal to merge."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rusty_bloomfilter_spark.sketch import XorFilter, merge_sketch_payloads, sketch_from_bytes


def test_zero_false_negatives_across_sizes():
    rng = np.random.default_rng(11)
    for n in (1, 2, 3, 17, 500, 20_000):
        keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
        f = XorFilter.build_tokens(keys)
        assert f.contains_tokens(keys).all(), f"false negative at n={n}"
        assert f.n_items == np.unique(keys).size


def test_fpr_at_bound():
    rng = np.random.default_rng(12)
    keys = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    f = XorFilter.build_tokens(keys)
    probes = rng.integers(-(2**62), -1, size=500_000, dtype=np.int64)
    fpr = float(f.contains_tokens(probes).mean())
    # exact 2^-16 expected; allow 4x for sampling noise
    assert fpr <= 4.0 / 65536.0
    assert f.fpp == pytest.approx(1.0 / 65536.0)


def test_space_near_1_23_b_bits_per_key():
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    f = XorFilter.build_tokens(keys)
    bits_per_key = 8.0 * f.size_bytes() / 100_000
    assert bits_per_key < 20.5  # 1.23 * 16 = 19.68 plus headroom


def test_canonical_bytes_pure_function_of_key_set():
    rng = np.random.default_rng(14)
    keys = rng.integers(0, 2**62, size=5_000, dtype=np.int64)
    base = XorFilter.build_tokens(keys).to_bytes()
    shuffled = keys.copy()
    rng.shuffle(shuffled)
    withdups = np.concatenate([shuffled, keys[:1234]])
    assert XorFilter.build_tokens(shuffled).to_bytes() == base
    assert XorFilter.build_tokens(withdups).to_bytes() == base


def test_wire_roundtrip_and_magic_dispatch():
    keys = np.arange(1000, dtype=np.int64) * 7919
    f = XorFilter.build_tokens(keys)
    rt = sketch_from_bytes(f.to_bytes())
    assert isinstance(rt, XorFilter)
    assert rt == f
    assert rt.contains_tokens(keys).all()


def test_forged_payloads_rejected():
    f = XorFilter.build_tokens(np.arange(100, dtype=np.int64))
    raw = f.to_bytes()
    with pytest.raises(ValueError):
        XorFilter.from_bytes(raw[:8])
    bad_bits = bytearray(raw)
    bad_bits[5] = 8  # bits != 16
    with pytest.raises(ValueError):
        XorFilter.from_bytes(bytes(bad_bits))
    with pytest.raises(ValueError):
        XorFilter.from_bytes(raw + b"\x00\x00")  # wrong body length
    bad_seed = bytearray(raw)
    bad_seed[12] = 0xFF  # seed >= retry cap: unreachable by build
    with pytest.raises(ValueError):
        XorFilter.from_bytes(bytes(bad_seed))


def test_static_contract_merge_refused():
    a = XorFilter.build_tokens(np.arange(10, dtype=np.int64))
    b = XorFilter.build_tokens(np.arange(10, 20, dtype=np.int64))
    with pytest.raises(ValueError, match="static"):
        a.merge_in_place(b)
    with pytest.raises(ValueError, match="static"):
        merge_sketch_payloads([a.to_bytes(), b.to_bytes()])


def test_empty_build():
    f = XorFilter.build_tokens(np.array([], dtype=np.int64))
    assert f.n_items == 0
    rt = sketch_from_bytes(f.to_bytes())
    assert rt == f


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300)
)
def test_hypothesis_no_false_negatives(vals):
    keys = np.array(vals, dtype=np.int64)
    f = XorFilter.build_tokens(keys)
    if keys.size:
        assert f.contains_tokens(keys).all()
    # and order invariance
    rev = keys[::-1].copy()
    assert XorFilter.build_tokens(rev).to_bytes() == f.to_bytes()


def test_spark_file_index_null_keys_fail_loud(spark):
    import pandas as pd
    import tempfile

    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.pruning import xor_file_index

    d = tempfile.mkdtemp(prefix="xornull")
    spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, None]}), schema="k bigint"
    ).repartition(1).write.mode("overwrite").parquet(d)
    idx = xor_file_index(spark.read.parquet(d), key_col="k")
    with pytest.raises(Exception, match="NULL"):
        idx.collect()


def test_spark_pruned_read_equals_full_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.pruning import (
        bloom_pruned_read,
        xor_file_index,
    )

    scratch = str(tmp_path / "laid")
    spark.range(0, 4000).select(
        (F.col("id") * 37 % 100_003).alias("key"), (F.col("id") % 97).alias("v")
    ).repartitionByRange(6, "key").write.mode("overwrite").parquet(scratch)
    laid = spark.read.parquet(scratch)
    index = xor_file_index(laid, key_col="key")
    probe = [r["key"] for r in laid.filter(F.col("key") < 5_000).collect()]
    rows, files_read = bloom_pruned_read(spark, scratch, index, probe, key_col="key")
    got = sorted((r["key"], r["v"]) for r in rows.collect())
    want = sorted(
        (r["key"], r["v"])
        for r in laid.filter(F.col("key").isin([int(k) for k in probe])).collect()
    )
    assert got == want
    # the probe band is ~5% of the key range over a range layout: the
    # static index must actually skip files
    assert 0 < files_read < 6
