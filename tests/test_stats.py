"""Correlation matrix vs numpy: exact pair values, per-pair NULL
semantics, zero-variance drops, grouped independence, guards, and the
one-scan plan gate (single Exchange, no joins)."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.stats import correlation_matrix


def _by_pair(df):
    return {
        (r["col_x"], r["col_y"]): (r["corr"], r["n_pairs"]) for r in df.collect()
    }


def test_matches_numpy(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 400)
    b = 2 * a + rng.normal(0, 0.5, 400)  # strongly positive
    c = -a + rng.normal(0, 2, 400)  # weakly negative
    rows = [(float(x), float(y), float(z)) for x, y, z in zip(a, b, c)]
    df = spark.createDataFrame(rows, "a double, b double, c double").repartition(8)
    got = _by_pair(correlation_matrix(df, ["a", "b", "c"]))
    for x, y, xs, ys in [("a", "b", a, b), ("a", "c", a, c), ("b", "c", b, c)]:
        want = round(float(np.corrcoef(xs, ys)[0, 1]), 6)
        assert got[(x, y)][0] == pytest.approx(want, abs=2e-6)
        assert got[(x, y)][1] == 400
    assert got[("a", "b")][0] > 0.9 and got[("a", "c")][0] < 0


def test_per_pair_null_semantics(spark):
    # NULL in c drops the row from (a,c) and (b,c) but NOT (a,b)
    rows = [(1.0, 2.0, 3.0), (2.0, 4.0, None), (3.0, 5.0, 1.0), (4.0, 9.0, 2.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = _by_pair(correlation_matrix(df, ["a", "b", "c"]))
    assert got[("a", "b")][1] == 4
    assert got[("a", "c")][1] == 3
    assert got[("b", "c")][1] == 3


def test_zero_variance_dropped(spark):
    rows = [(float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "a double, k double")
    got = _by_pair(correlation_matrix(df, ["a", "k"]))
    assert got == {}  # corr undefined against a constant


def test_grouped_matrices_independent(spark):
    rows = [("g1", float(i), float(i)) for i in range(20)]
    rows += [("g2", float(i), float(-i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, a double, b double")
    out = correlation_matrix(df, ["a", "b"], key_col="k").collect()
    got = {r["k"]: r["corr"] for r in out}
    assert got["g1"] == pytest.approx(1.0)
    assert got["g2"] == pytest.approx(-1.0)


def test_guards(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a", "a"])
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a", "b"], min_pairs=1)


def test_one_scan_plan(spark):
    rows = [(float(i), float(i * 2), float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = correlation_matrix(df, ["a", "b", "c"])
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    phys = buf.getvalue()
    # global agg: one Exchange (to the single reducer), no Join, and
    # exactly one scan of the input relation
    assert len(re.findall(r"^\(\d+\) Exchange", phys, re.M)) == 1, phys
    assert "Join" not in phys, phys
    assert len(re.findall(r"^\(\d+\) Scan", phys, re.M)) == 1, phys
