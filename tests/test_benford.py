"""Benford profile against a filled-form python oracle: the missing-
digit algebra (chi2 = n + Σ_obs(...)) must equal the classic all-nine-
digits formula; planted log-uniform data conforms, planted constant-
digit data fails loudly; NULL/nonpositive hygiene; min_n filter."""

from collections import Counter

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.benford import (
    BENFORD_P,
    benford_profile,
)


def _py_oracle(vals):
    """Classic filled form over all nine digits (what the operator's
    missing-digit algebra must reproduce exactly)."""
    ds = [int(str(v)[0]) for v in vals if v is not None and v > 0]
    n = len(ds)
    c = Counter(ds)
    chi2 = sum(
        (c.get(d, 0) - n * BENFORD_P[d]) ** 2 / (n * BENFORD_P[d])
        for d in range(1, 10)
    )
    mad = sum(abs(c.get(d, 0) / n - BENFORD_P[d]) for d in range(1, 10)) / 9
    return n, round(chi2, 6), round(mad, 6)


def _run(spark, rows, min_n=1):
    df = spark.createDataFrame(rows, "k string, v long").repartition(4)
    return {r["k"]: r.asDict() for r in benford_profile(df, "k", "v", min_n=min_n).collect()}


def test_matches_filled_python_oracle_with_missing_digits(spark):
    # only digits 1, 2 and 7 present -> six digits missing; the
    # analytic fold must still equal the filled nine-term formula
    vals = [1, 10, 11, 199, 2, 25, 7000] * 30
    n, chi2, mad = _py_oracle(vals)
    out = _run(spark, [("a", v) for v in vals])["a"]
    assert out["n_values"] == n
    assert out["chi2"] == pytest.approx(chi2, abs=2e-6)
    assert out["mad"] == pytest.approx(mad, abs=2e-6)


def test_loguniform_conforms_constant_digit_fails(spark):
    rng = np.random.default_rng(42)
    # 10^U for U~Uniform(0,6): exactly Benford in the limit
    good = np.floor(10.0 ** rng.uniform(0, 6, 20000)).astype(np.int64)
    good = good[good > 0]
    bad = rng.integers(50000, 60000, 5000)  # every first digit is 5
    rows = [("good", int(v)) for v in good] + [("bad", int(v)) for v in bad]
    got = _run(spark, rows)
    assert got["good"]["conforms"] is True
    assert got["good"]["mad"] < 0.01
    assert got["bad"]["conforms"] is False
    assert got["bad"]["chi2"] > 1000.0
    ng, c2g, madg = _py_oracle([int(v) for v in good])
    assert got["good"]["chi2"] == pytest.approx(c2g, rel=1e-4)
    assert got["good"]["mad"] == pytest.approx(madg, abs=2e-6)


def test_null_and_nonpositive_excluded(spark):
    rows = [("a", v) for v in [123, 456, 789, 0, -5, None] * 40]
    out = _run(spark, rows)["a"]
    assert out["n_values"] == 120  # only the three positive values


def test_min_n_drops_small_keys_and_guard(spark):
    rows = [("big", 100 + i) for i in range(150)] + [("tiny", 5)]
    got = _run(spark, rows, min_n=100)
    assert set(got) == {"big"}
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        benford_profile(df, "k", "v", min_n=0)


def test_partitioning_invariance(spark):
    vals = [("a", int(v)) for v in np.random.default_rng(3).integers(1, 10**6, 500)]
    one = spark.createDataFrame(vals, "k string, v long").coalesce(1)
    many = spark.createDataFrame(vals, "k string, v long").repartition(16)
    r1 = benford_profile(one, "k", "v").collect()[0]
    r2 = benford_profile(many, "k", "v").collect()[0]
    assert r1["chi2"] == r2["chi2"] and r1["mad"] == r2["mad"]
