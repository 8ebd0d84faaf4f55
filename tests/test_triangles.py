"""Triangle counting against hand-computed truth: K4 (every node in 3
triangles), a hub graph where naive orientation would blow up but the
answer stays exact, self-loop/duplicate/reversed-edge hygiene, a
triangle-free star (empty result), and a brute-force cross-check on a
random graph."""

import itertools

import pytest

from rusty_bloomfilter_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src bigint, dst bigint")


def _got(df):
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def _brute(pairs):
    """Set-based oracle: count triangles per node on the canonical
    simple graph."""
    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({v for e in es for v in e})
    out = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in es) and ((b, c) in es) and ((a, c) in es):
            for v in (a, b, c):
                out[v] = out.get(v, 0) + 1
    return out


def test_k4(spark):
    k4 = list(itertools.combinations(range(4), 2))
    got = _got(triangle_counts(_edges(spark, k4)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_hub_plus_triangle(spark):
    # hub 0 touches 1..6 (star: no triangles) plus one triangle 1-2 edge
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = _got(triangle_counts(_edges(spark, pairs)))
    assert got == {0: 1, 1: 1, 2: 1}


def test_star_is_triangle_free(spark):
    pairs = [(0, i) for i in range(1, 9)]
    assert _got(triangle_counts(_edges(spark, pairs))) == {}


def test_hygiene_loops_dupes_reversed(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3)]
    got = _got(triangle_counts(_edges(spark, pairs)))
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graph_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    pairs = {
        (rng.randrange(20), rng.randrange(20)) for _ in range(80)
    }
    got = _got(triangle_counts(_edges(spark, sorted(pairs))))
    assert got == _brute(pairs)
