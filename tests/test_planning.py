"""Bloom build planning (operators/planning.py): Shape parity + edges."""

import math

import pytest

from rusty_bloomfilter_spark.operators.planning import (
    bloom_build_plan,
    plan_from_exact,
)
from rusty_bloomfilter_spark.sketch.shape import Shape

_LN2 = math.log(2.0)


def test_plan_matches_shape_for_np(spark):
    p = 1e-4
    budget = 4096
    ndvs = [1, 5, 37, 4000, 123_456, 10**9]
    df = spark.createDataFrame([(f"g{i}", n) for i, n in enumerate(ndvs)],
                               "g string, ndv bigint")
    rows = {r["ndv"]: r for r in bloom_build_plan(df, p, budget).collect()}
    assert set(rows) == set(ndvs)
    for n in ndvs:
        r = rows[n]
        shape = Shape.for_np(n, p)
        # the planner folds -ln(p)/ln2^2 into one constant; Shape divides
        # after the product — associativity can move the pre-ceil value
        # by an ulp, so m may legitimately differ by at most 1 bit
        assert abs(r["m"] - shape.m) <= 1
        k_from_m = min(64, max(1, round((r["m"] / n) * _LN2)))
        assert r["k"] == k_from_m
        assert r["buckets"] == (r["m"] + 63) // 64
        assert r["filter_bytes"] == r["buckets"] * 8
        assert r["n_shards"] == -(-r["filter_bytes"] // budget)  # ceil div
        want_fpp = round(
            math.pow(1.0 - math.exp(-r["k"] * n / r["m"]), r["k"]), 6
        )
        assert r["expected_fpp"] == pytest.approx(want_fpp, abs=1e-9)


def test_plan_k_clamped_to_64(spark):
    # extreme p drives optimal k past 64; the planner clamps like Shape
    df = spark.createDataFrame([("g", 1000)], "g string, ndv bigint")
    row = bloom_build_plan(df, 1e-25, 1 << 20).collect()[0]
    assert row["k"] == 64


def test_plan_drops_null_and_nonpositive_ndv(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 0), ("c", None), ("d", -5)], "g string, ndv bigint"
    )
    out = bloom_build_plan(df, 0.01, 4096).collect()
    assert [r["g"] for r in out] == ["a"]


def test_plan_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 10)], "g string, ndv bigint")
    with pytest.raises(ValueError):
        bloom_build_plan(df, 0.0, 4096)
    with pytest.raises(ValueError):
        bloom_build_plan(df, 1.0, 4096)
    with pytest.raises(ValueError):
        bloom_build_plan(df, 0.01, 0)


def test_plan_from_exact_counts_distinct(spark):
    df = spark.createDataFrame(
        [("s1", 1), ("s1", 1), ("s1", 2), ("s2", 7), ("s2", None), (None, 9)],
        "src string, key bigint",
    )
    out = {r["src"]: r for r in plan_from_exact(df, "key", "src", 0.01, 4096).collect()}
    assert set(out) == {"s1", "s2"}  # NULL group and NULL keys excluded
    assert out["s1"]["ndv"] == 2
    assert out["s2"]["ndv"] == 1
    assert out["s1"]["m"] == Shape.for_np(2, 0.01).m
