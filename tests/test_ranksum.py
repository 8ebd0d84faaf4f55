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
