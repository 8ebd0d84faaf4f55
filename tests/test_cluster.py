"""Connected-components cluster resolution + PII/entropy text ops."""

import math

import pytest
from pyspark.sql import functions as F


def _cc(spark, pairs, **kw):
    from rusty_bloomfilter_spark.operators.cluster import connected_components

    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_chain_transitivity(spark):
    # A-B, B-C, C-D: one component even though A-C / A-D never paired.
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_two_components_and_self_loop_ignored(spark):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z"), ("q", "q")])
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}
    assert "q" not in got  # self-loop only => no edge, not returned


def test_long_chain_converges(spark):
    # Diameter 9 chain: needs ~9 propagation rounds; also direction-
    # agnostic (min label is at the far end from where edges point).
    names = [f"n{i:02d}" for i in range(10)]
    pairs = [(names[i + 1], names[i]) for i in range(9)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"n00"}
    assert len(got) == 10


def test_partitioning_invariance(spark):
    from rusty_bloomfilter_spark.operators.cluster import connected_components

    pairs = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("r", "a")]
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    one = {
        (r["node"], r["cluster_id"])
        for r in connected_components(df.coalesce(1)).collect()
    }
    many = {
        (r["node"], r["cluster_id"])
        for r in connected_components(df.repartition(7)).collect()
    }
    assert one == many
    assert {c for _, c in one} == {"a"}  # ring fused through shared node


def test_dup_clusters_sizes(spark):
    from rusty_bloomfilter_spark.operators.cluster import dup_clusters

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["n_members"]) for r in dup_clusters(df).collect()}
    assert rows == {
        "a": ("a", 3),
        "b": ("a", 3),
        "c": ("a", 3),
        "x": ("x", 2),
        "y": ("x", 2),
    }
    # the curation rule: drop doc_id != cluster_id keeps exactly one per group
    keep = [d for d, (c, _) in rows.items() if d == c]
    assert sorted(keep) == ["a", "x"]


def test_pii_counts_and_redact(spark):
    from rusty_bloomfilter_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [
            ("no pii here",),
            ("mail a.b_c%x@sub.example.org and +1-555-1234 twice 555-0000",),
            ("bare user@example.com",),
        ],
        "t string",
    )
    n_em, n_ph = pii_counts(F.col("t"))
    out = df.select(
        n_em.alias("e"), n_ph.alias("p"), pii_redact(F.col("t")).alias("r")
    ).collect()
    assert [(r["e"], r["p"]) for r in out] == [(0, 0), (1, 2), (1, 0)]
    assert out[1]["r"] == "mail <EMAIL> and <PHONE> twice <PHONE>"
    assert out[2]["r"] == "bare <EMAIL>"


def test_token_entropy_known_values(spark):
    from rusty_bloomfilter_spark.functions.text import doc_token_entropy

    seq = spark.createDataFrame(
        [
            ("uniform", [1, 2, 3, 4], 4),
            ("constant", [7, 7, 7, 7, 7], 5),
            ("mixed", [1, 1, 2], 3),
        ],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = {r["doc_id"]: r["entropy"] for r in doc_token_entropy(seq).collect()}
    assert got["uniform"] == pytest.approx(math.log(4), abs=1e-6)
    assert got["constant"] == pytest.approx(0.0, abs=1e-6)
    expect = math.log(3) - (2 * math.log(2)) / 3
    assert got["mixed"] == pytest.approx(expect, abs=1e-6)


def test_bloom_join_prune_zero_fn_and_prunes(spark):
    """The prune keeps every true-match order (zero FN) and actually
    drops most non-matching ones at p=1e-3."""
    from pyspark.sql import functions as F
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch
    from rusty_bloomfilter_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    keys = {r["c_custkey"] for r in cust.select("c_custkey").collect()}
    sk = BlockedBloomSketch.for_np(n=max(len(keys), 1024), p=1e-3, col="h", scalar=True)
    payload, _ = sk.build_bytes(cust.select(F.col("c_custkey").alias("h")))
    orders = load_table(spark, sf_dir, "orders")
    pruned = orders.filter(sk.might_contain_udf(payload, spark)(F.col("o_custkey")))
    kept = [r["o_custkey"] for r in pruned.select("o_custkey").collect()]
    n_orders = orders.count()
    true_matches = orders.filter(F.col("o_custkey").isin(keys)).count()
    assert sum(1 for k in kept if k in keys) == true_matches  # zero FN
    # FP head-room: kept - true_matches is bounded by p * non-matches * slack
    assert len(kept) - true_matches <= max(10, 0.01 * n_orders)
    assert len(kept) < n_orders  # the prune actually pruned


from hypothesis import given, settings
from hypothesis import strategies as st

_node = st.integers(min_value=0, max_value=11).map(lambda i: f"n{i:02d}")


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for a, b in edges:
        if a != b:
            for v in (a, b):
                comps.setdefault(find(v), set()).add(v)
    return {
        v: min(members) for members in comps.values() for v in members
    }


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=14))
def test_cc_matches_union_find(spark, edges):
    """Spark hash-to-min components == sequential union-find on random
    small graphs (self-loops, parallel edges, multi-component, cycles)."""
    from rusty_bloomfilter_spark.operators.cluster import connected_components

    expect = _union_find(edges)
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == expect


def test_nonconvergence_raises(spark):
    import pytest as _pytest
    from rusty_bloomfilter_spark.operators.cluster import connected_components

    names = [f"n{i:02d}" for i in range(8)]
    pairs = [(names[i], names[i + 1]) for i in range(7)]
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(df, max_rounds=2)


def test_cms_inner_product_exact_and_bound():
    """Inner product == brute force when no hash collisions matter
    (huge w), and stays within [truth, truth + eps*Na*Nb] at small w."""
    import numpy as np
    from rusty_bloomfilter_spark.sketch.cms import CountMinSketch

    rng = np.random.default_rng(7)
    a_keys = rng.integers(0, 200, 5000, dtype=np.int64)
    b_keys = rng.integers(0, 200, 3000, dtype=np.int64)
    fa = np.bincount(a_keys, minlength=200)
    fb = np.bincount(b_keys, minlength=200)
    truth = int((fa * fb).sum())

    big = CountMinSketch(d=5, w=1 << 16)
    big2 = CountMinSketch(d=5, w=1 << 16)
    big.add_tokens(a_keys)
    big2.add_tokens(b_keys)
    est = big.inner_product(big2)
    eps, _ = big.error_bound()
    assert truth <= est <= truth + eps * 5000 * 3000
    # 200 distinct keys in 65536 columns: collisions are overwhelmingly
    # unlikely to survive the min over 5 rows
    assert est == truth

    small = CountMinSketch(d=5, w=64)
    small2 = CountMinSketch(d=5, w=64)
    small.add_tokens(a_keys)
    small2.add_tokens(b_keys)
    est_s = small.inner_product(small2)
    eps_s, _ = small.error_bound()
    assert truth <= est_s <= truth + eps_s * 5000 * 3000

    import pytest as _pytest
    with _pytest.raises(ValueError):
        big.inner_product(small)


def test_cms_inner_product_merge_consistency():
    """Inner product commutes with the merge algebra: sketches built
    from partitioned halves give the same estimate as one-shot."""
    import numpy as np
    from rusty_bloomfilter_spark.sketch.cms import CountMinSketch

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 500, 8000, dtype=np.int64)
    other = CountMinSketch(d=5, w=4096).add_tokens(
        rng.integers(0, 500, 6000, dtype=np.int64)
    )
    one = CountMinSketch(d=5, w=4096).add_tokens(keys)
    halves = CountMinSketch(d=5, w=4096).add_tokens(keys[:3000]).merge(
        CountMinSketch(d=5, w=4096).add_tokens(keys[3000:])
    )
    assert one.inner_product(other) == halves.inner_product(other)
