"""IBLT: algebra, wire, peel recovery, distributed reconciliation."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.sketch import merge_sketch_payloads, sketch_from_bytes
from rusty_bloomfilter_spark.sketch.iblt import IBLT


def keys_of(n, seed=0, lo=1, hi=2**60):
    return np.unique(np.random.default_rng(seed).integers(lo, hi, size=n).astype(np.uint64))


def test_exact_recovery_and_signs():
    ks = keys_of(1000, 3)
    a = IBLT.for_diff(50).add_u64(ks)
    b = IBLT.for_diff(50).add_u64(ks[:-30]).add_u64(np.arange(20, dtype=np.uint64) + 10**12)
    add, rem, ok = a.subtract(b).peel()
    assert ok
    assert set(add.tolist()) == set(ks[-30:].tolist())
    assert set(rem.tolist()) == set(range(10**12, 10**12 + 20))


def test_empty_difference_decodes_empty():
    ks = keys_of(500, 5)
    d = IBLT.for_diff(10).add_u64(ks).subtract(IBLT.for_diff(10).add_u64(ks))
    add, rem, ok = d.peel()
    assert ok and add.size == 0 and rem.size == 0


def test_canonical_bytes_partition_invariance():
    ks = keys_of(800, 7)
    x = IBLT.for_diff(32).add_u64(ks[::2]).add_u64(ks[1::2])
    y = IBLT.for_diff(32).add_u64(ks[500:]).add_u64(ks[:500])
    z = IBLT.for_diff(32).add_u64(ks)
    assert x.to_bytes() == y.to_bytes() == z.to_bytes()


def test_merge_associative_commutative():
    ks = keys_of(900, 11)
    parts = [IBLT.for_diff(32).add_u64(ks[i::3]) for i in range(3)]
    m1 = parts[0].merge(parts[1]).merge(parts[2])
    m2 = parts[2].merge(parts[0].merge(parts[1]))
    m3 = parts[1].merge(parts[2]).merge(parts[0])
    assert m1.to_bytes() == m2.to_bytes() == m3.to_bytes()
    assert merge_sketch_payloads([p.to_bytes() for p in parts]) == m1.to_bytes()


def test_wire_roundtrip_and_dispatch():
    s = IBLT.for_diff(16).add_u64(keys_of(100, 13))
    rt = sketch_from_bytes(s.to_bytes())
    assert isinstance(rt, IBLT) and rt == s
    with pytest.raises(ValueError):
        IBLT.from_bytes(b"RIBLxxxx")
    with pytest.raises(ValueError):
        IBLT.from_bytes(b"XXXX" + s.to_bytes()[4:])
    with pytest.raises(ValueError):
        IBLT.from_bytes(s.to_bytes()[:-8])  # truncated body


def test_undersized_table_fails_explicitly():
    ks = keys_of(2000, 17)
    a = IBLT.for_diff(4).add_u64(ks)
    b = IBLT.for_diff(4).add_u64(ks[:1000])  # diff 1000 >> capacity 4
    _, _, ok = a.subtract(b).peel()
    assert not ok


def test_geometry_mismatch_raises():
    with pytest.raises(ValueError):
        IBLT.for_diff(4).merge(IBLT.for_diff(8))
    with pytest.raises(ValueError):
        IBLT(10, 3)  # not a multiple of k


def test_stress_random_reconciliations():
    rng = np.random.default_rng(23)
    for _ in range(50):
        n = int(rng.integers(10, 300))
        d = int(rng.integers(0, 60))
        ks = np.unique(rng.integers(1, 2**60, size=n + d).astype(np.uint64))
        cut = ks.size // 2
        half = ks[rng.permutation(ks.size)]
        A = np.union1d(ks[:cut], half[: d // 2])
        B = np.union1d(ks[:cut], half[d // 2 : d])
        add, rem, ok = (
            IBLT.for_diff(64).add_u64(A).subtract(IBLT.for_diff(64).add_u64(B)).peel()
        )
        assert ok
        assert set(add.tolist()) == set(np.setdiff1d(A, B).tolist())
        assert set(rem.tolist()) == set(np.setdiff1d(B, A).tolist())


def test_spark_distributed_build_and_reconcile(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.reconcile import (
        build_keyset_iblt,
        set_reconcile,
    )

    base = spark.range(0, 5000).select((F.col("id") * 2654435761 % (2**60)).alias("key"))
    a = base
    b = base.filter(F.col("key") % 13 != 0).unionByName(
        spark.range(0, 40).select((F.col("id") + 2**61).alias("key"))
    )
    # canonical payload regardless of partitioning
    p1 = build_keyset_iblt(a, "key", max_diff=512).collect()[0]["payload"]
    p2 = build_keyset_iblt(a.repartition(16), "key", max_diff=512).collect()[0]["payload"]
    assert bytes(p1) == bytes(p2)
    out = set_reconcile(a, b, "key", max_diff=512)
    got = {(r["key"], r["side"]) for r in out.collect()}
    a_keys = {r["key"] for r in a.collect()}
    b_keys = {r["key"] for r in b.collect()}
    want = {(k, "only_a") for k in a_keys - b_keys} | {
        (k, "only_b") for k in b_keys - a_keys
    }
    assert got == want and len(want) > 0


def test_set_reconcile_undersized_raises(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.reconcile import set_reconcile

    a = spark.range(0, 3000).select(F.col("id").alias("key"))
    b = spark.range(2000, 3000).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="decode incomplete"):
        set_reconcile(a, b, "key", max_diff=16)


def test_sql_pair_iblt_agg_diff(spark):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.functions.sql_sketches import register_sketch_sql

    register_sketch_sql(spark)
    # key 0 present only in a: the +1 shift must keep it visible
    a = spark.range(0, 500).select(F.col("id").alias("key"), F.lit("a").alias("snap"))
    b = (
        spark.range(0, 510)
        .filter("id % 31 != 0")
        .select(F.col("id").alias("key"), F.lit("b").alias("snap"))
    )
    a.unionByName(b).createOrReplaceTempView("iblt_snaps")
    diff = spark.sql(
        """
        WITH p AS (SELECT snap, iblt_agg(key) AS pay FROM iblt_snaps GROUP BY snap)
        SELECT iblt_diff(x.pay, y.pay) AS diff
        FROM p x JOIN p y ON x.snap = 'a' AND y.snap = 'b'
        """
    ).collect()[0]["diff"]
    only_a = sorted(v - 1 for v in diff if v > 0)
    only_b = sorted(-v - 1 for v in diff if v < 0)
    b_set = {x for x in range(510) if x % 31}
    assert only_a == sorted(set(range(500)) - b_set)
    assert only_b == sorted(b_set - set(range(500)))
    assert 0 in only_a


# -- snapshot_diff (row-content tier) ---------------------------------------


def test_snapshot_diff_hand_computed(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.reconcile import snapshot_diff

    a = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "B", 20.0),    # s changed
            (3, "c", 30.0),    # v NULL -> value: a change (NULL-safe)
            (5, "e", 50.0),    # added
        ],
        "k long, s string, v double",
    )
    got = snapshot_diff(a, b, key_col="k", compare_cols=["s", "v"]).collect()[0]
    assert got["n_common"] == 3 and got["n_added"] == 1 and got["n_removed"] == 1
    assert got["changed_s"] == 1 and got["changed_v"] == 1
    assert got["n_changed_rows"] == 2
    with pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(a, b, key_col="k", compare_cols=[])


def test_snapshot_diff_null_to_null_not_a_change(spark):
    from rusty_bloomfilter_spark.operators.reconcile import snapshot_diff

    a = spark.createDataFrame([(1, None)], "k long, v double")
    b = spark.createDataFrame([(1, None)], "k long, v double")
    got = snapshot_diff(a, b, key_col="k", compare_cols=["v"]).collect()[0]
    assert got["n_changed_rows"] == 0 and got["changed_v"] == 0
