"""PageRank (operators/graph.py): pinned against a numpy power-iteration
oracle with identical (leaky, damped) semantics, plus the structural
properties — dangling leak, base floor for isolated-in-degree nodes,
partition invariance, and SQL-oracle equivalence via DuckDB."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.graph import pagerank, pagerank_oracle_sql


def _np_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for u, v in edges:
            nxt[idx[v]] += d * r[idx[u]] / outdeg[idx[u]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),           # d has in-degree 0 -> floor rank
    ("c", "e"),           # e is DANGLING (no out-edges) -> leaks mass
    ("a", "b"),           # multi-edge: counts twice in outdeg + contribs
]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string").repartition(4)
    return {r["v"]: r["r"] for r in pagerank(df, **kw).collect()}


def test_matches_numpy_oracle_including_dangling_and_multiedge(spark):
    got = _spark_ranks(spark, EDGES, iters=5)
    want = _np_pagerank(EDGES, iters=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    n = len(want)
    assert got["d"] == pytest.approx(0.15 / n)      # nothing points at d
    assert sum(got.values()) < 1.0                   # e leaks damped mass
    # the hub c (3 in-edges incl. the doubled a->b... c collects most)
    assert got["c"] == max(got.values())


def test_partition_invariance_and_validation(spark):
    df1 = spark.createDataFrame(EDGES, "src string, dst string").coalesce(1)
    df8 = spark.createDataFrame(EDGES, "src string, dst string").repartition(8)
    r1 = {r["v"]: r["r"] for r in pagerank(df1, iters=3).collect()}
    r8 = {r["v"]: r["r"] for r in pagerank(df8, iters=3).collect()}
    for v in r1:
        assert r1[v] == pytest.approx(r8[v], rel=1e-12)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df1, damping=1.0)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df1, iters=0)


def test_sql_oracle_matches_spark(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edge_src AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}', '{v}')" for u, v in EDGES)
        + ") t(src, dst)"
    )
    sql = pagerank_oracle_sql(
        "SELECT src, dst FROM edge_src", iters=5, round_digits=9
    )
    want = {v: s for v, s in con.execute(sql).fetchall()}
    got = _spark_ranks(spark, EDGES, iters=5)
    n = len(got)
    for v in want:
        assert round(got[v] * n, 9) == pytest.approx(want[v], abs=2e-9), v
