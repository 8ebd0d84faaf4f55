"""PSI drift (operators/drift.py): numpy oracle parity + invariants."""

import math

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.drift import psi_drift


def _psi_oracle(values_by_group: dict, width: int) -> dict:
    """Reference implementation with the module's smoothing convention."""
    bins_by_group = {
        g: np.floor_divide(np.asarray(v, dtype=np.int64), width)
        for g, v in values_by_group.items()
    }
    corpus: dict[int, int] = {}
    for b in bins_by_group.values():
        for x in b:
            corpus[int(x)] = corpus.get(int(x), 0) + 1
    B = len(corpus)
    n_tot = sum(corpus.values())
    out = {}
    for g, b in bins_by_group.items():
        n_g = len(b)
        cnt = {int(x): 0 for x in corpus}
        for x in b:
            cnt[int(x)] += 1
        psi = 0.0
        for x, c_cnt in corpus.items():
            p_g = (cnt[x] + 0.5) / (n_g + 0.5 * B)
            p_c = (c_cnt + 0.5) / (n_tot + 0.5 * B)
            psi += (p_g - p_c) * math.log(p_g / p_c)
        out[g] = round(psi, 6)
    return out


def test_psi_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    data = {
        "base": rng.integers(0, 200, size=400),
        "shifted": rng.integers(100, 300, size=300),
        "same": rng.integers(0, 200, size=250),
    }
    rows = [(g, int(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "src string, n bigint")
    got = {r["src"]: r for r in psi_drift(df, "n", 16, "src").collect()}
    want = _psi_oracle(data, 16)
    assert set(got) == set(want)
    for g in want:
        assert got[g]["psi"] == pytest.approx(want[g], abs=2e-6)
        assert got[g]["n_rows"] == len(data[g])
    # PSI terms (p-q)ln(p/q) are individually nonnegative
    assert all(r["psi"] >= 0 for r in got.values())
    # the planted shift scores well above the in-distribution groups
    # (note: the corpus blends all three, so base/same drift a little too)
    assert got["shifted"]["psi"] > 2 * got["same"]["psi"]
    assert got["shifted"]["psi"] > 2 * got["base"]["psi"]


def test_psi_identical_groups_near_zero(spark):
    vals = list(range(100)) * 2
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, "src string, n bigint")
    out = {r["src"]: r["psi"] for r in psi_drift(df, "n", 10, "src").collect()}
    # both groups ARE the corpus distribution; smoothing noise only
    assert out["a"] == out["b"]
    assert out["a"] < 1e-4


def test_psi_null_handling_and_errors(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 5), ("b", 9)], "src string, n bigint"
    )
    out = {r["src"]: r for r in psi_drift(df, "n", 4, "src").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_rows"] == 1  # NULL value row excluded
    with pytest.raises(ValueError):
        psi_drift(df, "n", 0, "src")


def test_psi_between_matches_oracle_and_direction(spark):
    rng = np.random.default_rng(21)
    a = rng.integers(0, 200, size=500)
    b_same = rng.integers(0, 200, size=400)
    b_shift = rng.integers(150, 350, size=400)
    from rusty_bloomfilter_spark.operators.drift import psi_between

    ref = spark.createDataFrame([(int(v),) for v in a], "n bigint")
    same = spark.createDataFrame([(int(v),) for v in b_same], "n bigint")
    shift = spark.createDataFrame([(int(v),) for v in b_shift], "n bigint")

    def oracle(x, y, width):
        bx = np.floor_divide(x, width)
        by = np.floor_divide(y, width)
        allb = sorted(set(bx) | set(by))
        B = len(allb)
        psi = 0.0
        for bb in allb:
            p_ref = ((bx == bb).sum() + 0.5) / (len(bx) + 0.5 * B)
            p_new = ((by == bb).sum() + 0.5) / (len(by) + 0.5 * B)
            psi += (p_new - p_ref) * math.log(p_new / p_ref)
        return psi

    got_same = psi_between(ref, same, "n", 16)
    got_shift = psi_between(ref, shift, "n", 16)
    assert got_same == pytest.approx(oracle(a, b_same, 16), abs=1e-9)
    assert got_shift == pytest.approx(oracle(a, b_shift, 16), abs=1e-9)
    assert got_shift > 5 * max(got_same, 1e-6)
    # degenerate: all-NULL new side -> empty union handled
    empty = spark.createDataFrame([(None,)], "n bigint")
    assert psi_between(empty, empty, "n", 16) == 0.0
    with pytest.raises(ValueError):
        psi_between(ref, same, "n", 0)


def test_psi_fractional_width_detects_subinteger_drift(spark):
    """A [0,1] double column must spread across fractional-width bins —
    the bigint cast collapsed it into one bin and hid all drift
    (round-4 review catch)."""
    rng = np.random.default_rng(31)
    from rusty_bloomfilter_spark.operators.drift import (
        psi_between,
        psi_between_multi,
        psi_drift,
    )

    lo = rng.uniform(0.0, 0.4, 600)
    hi = rng.uniform(0.5, 0.9, 600)
    ref = spark.createDataFrame([(float(v),) for v in lo], "q double")
    new = spark.createDataFrame(
        [(float(v),) for v in hi] + [(None,), (float("nan"),)], "q double"
    )
    psi = psi_between(ref, new, "q", 0.05)
    assert psi > 1.0  # massive shift, clearly over any threshold
    # same shift via the grouped form
    rows = [("ref", float(v)) for v in lo] + [("new", float(v)) for v in hi]
    df = spark.createDataFrame(rows, "src string, q double")
    out = {r["src"]: r["psi"] for r in psi_drift(df, "q", 0.05, "src").collect()}
    assert out["ref"] > 0.3 and out["new"] > 0.3  # both far from the blend
    # multi-column single-scan form agrees with per-column calls
    df2_ref = spark.createDataFrame(
        [(float(v), int(v * 100)) for v in lo], "q double, n bigint"
    )
    df2_new = spark.createDataFrame(
        [(float(v), int(v * 100)) for v in hi], "q double, n bigint"
    )
    multi = psi_between_multi(df2_ref, df2_new, {"q": 0.05, "n": 5})
    assert multi["q"] == pytest.approx(psi_between(df2_ref, df2_new, "q", 0.05))
    assert multi["n"] == pytest.approx(psi_between(df2_ref, df2_new, "n", 5))
