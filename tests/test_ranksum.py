"""Mann-Whitney rank-sum: python oracle + direction checks."""

import math

import numpy as np
import pytest


def brute_mw(a, b):
    vals = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    n = len(vals)
    # midranks
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1 .. j
        for k in range(i, j):
            ranks[k] = mid
        i = j
    r_a = sum(ranks[k] for k in range(n) if vals[k][1] == "a")
    na, nb = len(a), len(b)
    u = r_a - na * (na + 1) / 2
    # tie correction
    tie = 0.0
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        t = j - i
        tie += t**3 - t
        i = j
    sigma2 = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(sigma2)
    return u, z


def _run(spark, groups):
    from rusty_bloomfilter_spark.operators.stats import rank_sum_pairs

    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "event_type string, value double")
    return {
        (r["group_a"], r["group_b"]): r.asDict()
        for r in rank_sum_pairs(df, "event_type", "value").collect()
    }


def test_matches_bruteforce_with_ties(spark):
    rng = np.random.default_rng(73)
    groups = {
        "a": rng.integers(0, 40, size=120).astype(float).tolist(),  # heavy ties
        "b": (rng.integers(0, 40, size=150) + 3).astype(float).tolist(),
        "c": rng.normal(20, 5, size=90).round(1).tolist(),
    }
    got = _run(spark, groups)
    names = sorted(groups)
    for i, ga in enumerate(names):
        for gb in names[i + 1 :]:
            u, z = brute_mw(groups[ga], groups[gb])
            r = got[(ga, gb)]
            assert r["n_a"] == len(groups[ga]) and r["n_b"] == len(groups[gb])
            assert abs(r["u_a"] - u) < 1e-6, (ga, gb)
            assert abs(r["z"] - z) < 1e-5, (ga, gb)


def test_identical_samples_z_zero_shift_detected(spark):
    base = list(np.linspace(0, 10, 60))
    got = _run(spark, {"x": base, "y": list(base), "z": [v + 8 for v in base]})
    assert got[("x", "y")]["u_a"] == 60 * 60 / 2
    assert abs(got[("x", "y")]["z"]) < 1e-9 and got[("x", "y")]["same_dist"]
    assert not got[("x", "z")]["same_dist"] and got[("x", "z")]["z"] < -5


# ---------------------------------------------------------------------------
# chi-square independence (stats.chi2_independence)
# ---------------------------------------------------------------------------


def _run_chi2(spark, pairs):
    from rusty_bloomfilter_spark.operators.stats import chi2_independence

    df = spark.createDataFrame(pairs, "a string, b string")
    return chi2_independence(df, "a", "b").collect()[0].asDict()


def brute_chi2(pairs):
    from collections import Counter

    cells = Counter(pairs)
    ra, cb = Counter(), Counter()
    for (a, b), o in cells.items():
        ra[a] += o
        cb[b] += o
    n = sum(cells.values())
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    return chi2


def test_chi2_matches_full_grid_bruteforce(spark):
    rng = np.random.default_rng(83)
    pairs = [
        (f"a{rng.integers(0, 4)}", f"b{rng.integers(0, 6)}") for _ in range(500)
    ]
    got = _run_chi2(spark, pairs)
    want = brute_chi2(pairs)
    assert abs(got["chi2"] - want) < 1e-5  # analytic zero-cell fold == full grid
    assert got["n"] == 500 and got["dof"] == 3 * 5


def test_chi2_independent_and_perfect(spark):
    # exact product distribution -> chi2 == 0
    indep = [(f"a{i}", f"b{j}") for i in range(3) for j in range(4) for _ in range(5)]
    got = _run_chi2(spark, indep)
    assert got["chi2"] == 0.0 and got["cramers_v"] == 0.0
    # diagonal (perfect association) -> Cramér's V == 1
    diag = [(f"x{i}", f"y{i}") for i in range(4) for _ in range(10)]
    got = _run_chi2(spark, diag)
    assert got["cramers_v"] == 1.0 and got["observed_cells"] == 4
