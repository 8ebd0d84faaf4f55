"""Skew profiling: one-scan fused CountSketch+HLL+MG over a shuffle
key, estimate accuracy vs exact moments, salting-plan math, and the
distributed AmsSketch builder's bitwise parity with a local build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.skew import (
    HotKey,
    SkewProfile,
    key_skew_profile,
)
from rusty_bloomfilter_spark.operators.sketches import AmsSketch
from rusty_bloomfilter_spark.sketch import CountSketch


@pytest.fixture(scope="module")
def seq_df(spark, sequences_pdf):
    return spark.createDataFrame(sequences_pdf)


@pytest.fixture(scope="module")
def skewed_keys():
    """80% of rows share key 7, the rest spread over 5000 keys — the
    classic hot-shuffle-key shape."""
    rng = np.random.default_rng(17)
    n = 40_000
    hot = np.full(int(n * 0.8), 7, dtype=np.int64)
    cold = rng.integers(100, 5100, size=n - hot.size, dtype=np.int64)
    keys = np.concatenate([hot, cold])
    rng.shuffle(keys)
    return keys


@pytest.fixture(scope="module")
def skewed_df(spark, skewed_keys):
    return spark.createDataFrame(
        [(int(k),) for k in skewed_keys], "key bigint"
    ).repartition(6)


def exact_moments(keys):
    _, c = np.unique(keys, return_counts=True)
    return int(c.sum()), int((c.astype(np.float64) ** 2).sum()), len(c)


def test_profile_estimates_within_bounds(spark, skewed_df, skewed_keys):
    f1, f2, ndv = exact_moments(skewed_keys)
    prof = key_skew_profile(skewed_df, "key", mg_capacity=64)
    assert prof.n_rows == f1  # exact, same scan
    assert abs(prof.f2_est - f2) / f2 <= 3 * prof.f2_rel_error
    assert abs(prof.ndv_est - ndv) / ndv <= 3 * prof.ndv_rel_error
    # the uniformity ratio must scream: truth here is ~0.64*ndv
    assert prof.uniformity_ratio > 100
    # the hot key is found, bounds bracket its true count
    top = prof.hot_keys[0]
    true_hot = int((skewed_keys == 7).sum())
    assert top.key == 7
    assert top.est <= true_hot <= top.ub


def test_salting_plan_targets_only_the_hot_key(spark, skewed_df, skewed_keys):
    prof = key_skew_profile(skewed_df, "key", mg_capacity=64)
    plan = prof.salting_plan(n_partitions=32)
    assert set(plan) == {7}
    # 80% share across 32 partitions: fan-out ~= 0.8*32 = 25.6 -> 26;
    # MG undercount can only push the estimate's ub slightly higher
    assert 26 <= plan[7] <= 32
    # plenty of partitions but high overload bar -> nothing to salt
    assert prof.salting_plan(n_partitions=32, overload=40.0) == {}
    with pytest.raises(ValueError):
        prof.salting_plan(n_partitions=0)


def test_profile_uniform_key_ratio_near_one(spark):
    df = spark.range(20_000).select((F.col("id") % 512).alias("key"))
    prof = key_skew_profile(df, "key", mg_capacity=64)
    assert 0.9 <= prof.uniformity_ratio <= 1.1
    assert prof.salting_plan(n_partitions=16) == {}


def test_profile_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("key"))
    prof = key_skew_profile(df, "key")
    assert prof.n_rows == 0 and prof.f2_est == 0
    assert prof.hot_keys == [] and prof.salting_plan(8) == {}
    assert prof.collision_mult == 0.0 and prof.uniformity_ratio == 1.0


def test_ams_builder_bitwise_parity(spark, skewed_df, skewed_keys):
    """Distributed scalar build == local single-threaded build, byte
    for byte (int64 adds commute exactly; canonical wire)."""
    payload, n = AmsSketch(d=5, w=2048, col="key", scalar=True).build_bytes(skewed_df)
    local = CountSketch(d=5, w=2048).add_tokens(skewed_keys)
    assert n == skewed_keys.size
    assert payload == local.to_bytes()


def test_ams_builder_token_arrays(spark, seq_df, sequences_pdf):
    """Array-column path (dedup_counts multiplicity fold) matches the
    local flat build bitwise."""
    payload, n = AmsSketch(d=3, w=4096, col="tokens").build_bytes(seq_df)
    flat = np.concatenate(list(sequences_pdf["tokens"])).astype(np.int64)
    local = CountSketch(d=3, w=4096).add_tokens(flat)
    assert n == flat.size
    assert payload == local.to_bytes()


def test_salting_plan_unit_math():
    prof = SkewProfile(
        n_rows=1000,
        f2_est=500_000,
        ndv_est=100.0,
        hot_keys=[
            HotKey(key=1, est=700, ub=700, share_ub=0.7),
            HotKey(key=2, est=30, ub=30, share_ub=0.03),
        ],
    )
    # share = 1000/10 = 100; key 1 ub=700 > 2*100 -> ceil(700/100)=7
    assert prof.salting_plan(10) == {1: 7}
    assert prof.avg_multiplicity == 10.0
    assert prof.collision_mult == 500.0
    assert prof.uniformity_ratio == 50.0
