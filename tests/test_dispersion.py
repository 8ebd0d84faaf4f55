"""Gries' DP token dispersion: closed-form and brute-force checks."""

import numpy as np
import pytest


def _run(spark, rows, min_total=1):
    from rusty_bloomfilter_spark.operators.dispersion import token_dispersion

    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
    out = token_dispersion(df, min_total=min_total).collect()
    return {r["tok"]: r.asDict() for r in out}


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    rows = [
        (f"d{i}", rng.integers(0, 25, size=int(rng.integers(5, 40))).tolist(), f"s{i % 4}")
        for i in range(40)
    ]
    got = _run(spark, rows, min_total=3)

    from collections import Counter

    per = {}
    src_tot = Counter()
    for _, toks, s in rows:
        per.setdefault(s, Counter()).update(toks)
        src_tot[s] += len(toks)
    n = sum(src_tot.values())
    all_toks = set().union(*[set(c) for c in per.values()])
    for t in all_toks:
        c_by = {s: per[s][t] for s in per if per[s][t] > 0}
        total = sum(c_by.values())
        if total < 3:
            assert t not in got
            continue
        dp = 0.5 * sum(
            abs(per[s][t] / total - src_tot[s] / n) for s in per
        )
        eff = 1.0 / sum((c / total) ** 2 for c in c_by.values())
        top_source = min(sorted(c_by), key=lambda s: (-c_by[s], s))
        g = got[t]
        assert g["total"] == total and g["n_sources"] == len(c_by)
        assert abs(g["dp"] - dp) < 1e-5, t
        assert abs(g["eff_sources"] - eff) < 1e-5
        assert g["top_source"] == top_source
        assert abs(g["top_share"] - c_by[top_source] / total) < 1e-5


def test_proportional_spread_dp_zero(spark):
    # token 7 appears in every doc once; sources have equal sizes ->
    # shares equal corpus weights -> DP == 0, eff_sources == |S|
    rows = [(f"d{i}", [7, 100 + i], f"s{i % 5}") for i in range(10)]
    got = _run(spark, rows)
    assert got[7]["dp"] == 0.0
    assert abs(got[7]["eff_sources"] - 5.0) < 1e-6
    assert got[7]["n_sources"] == 5


def test_single_source_token_dp(spark):
    # token 9 lives only in source s0 (weight w) -> DP = 1 - w
    rows = [("d0", [9, 9, 1], "s0"), ("d1", [1, 2, 3], "s1"), ("d2", [2, 3, 4], "s2")]
    got = _run(spark, rows)
    w0 = 3 / 9
    assert abs(got[9]["dp"] - (1 - w0)) < 1e-6
    assert got[9]["eff_sources"] == 1.0
    assert got[9]["top_source"] == "s0" and got[9]["top_share"] == 1.0


def test_top_source_tiebreak_lexicographic(spark):
    rows = [("d0", [5], "b"), ("d1", [5], "a"), ("d2", [1, 2], "c")]
    got = _run(spark, rows)
    assert got[5]["top_source"] == "a"  # equal counts -> lexicographically first


def _run_cosine(spark, rows):
    from rusty_bloomfilter_spark.operators.dispersion import source_cosine_pairs

    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
    return {
        (r["src_a"], r["src_b"]): (r["cosine"], r["shared_tokens"])
        for r in source_cosine_pairs(df).collect()
    }


def test_source_cosine_matches_bruteforce(spark):
    import math
    from collections import Counter

    rng = np.random.default_rng(61)
    rows = [
        (f"d{i}", rng.integers(0, 30, size=int(rng.integers(5, 40))).tolist(), f"s{i % 4}")
        for i in range(40)
    ]
    got = _run_cosine(spark, rows)
    per = {}
    for _, toks, s in rows:
        per.setdefault(s, Counter()).update(toks)
    srcs = sorted(per)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = set(per[a]) & set(per[b])
            if not shared:
                assert (a, b) not in got
                continue
            dot = sum(per[a][t] * per[b][t] for t in shared)
            na = math.sqrt(sum(c * c for c in per[a].values()))
            nb = math.sqrt(sum(c * c for c in per[b].values()))
            cos, st = got[(a, b)]
            assert st == len(shared)
            assert abs(cos - dot / (na * nb)) < 1e-6


def test_source_cosine_identical_and_disjoint(spark):
    rows = [
        ("d0", [1, 2, 2, 3], "a"),
        ("d1", [1, 2, 2, 3], "b"),   # identical distribution -> cosine 1
        ("d2", [100, 101], "c"),     # disjoint vocab -> pair absent
    ]
    got = _run_cosine(spark, rows)
    assert got[("a", "b")][0] == 1.0
    assert ("a", "c") not in got and ("b", "c") not in got
