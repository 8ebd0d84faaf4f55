"""Sketch rollup/cube: merged-upward payloads are BITWISE the direct
build of each coarser group (merge-exactness — estimates carry the
sketch's own bound at every level, no compounding), NULL dim values
stay distinct from rolled-up NULLs, and estimates track exact distinct
counts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.cube import hll_rollup, sketch_rollup
from rusty_bloomfilter_spark.operators.sketches import HllSketch
from rusty_bloomfilter_spark.sketch import HyperLogLog


@pytest.fixture(scope="module")
def facts(spark):
    rng = np.random.default_rng(47)
    n = 30_000
    types = rng.choice(["click", "view", "buy"], size=n, p=[0.6, 0.3, 0.1])
    days = rng.choice(["d1", "d2", None], size=n, p=[0.5, 0.4, 0.1])
    users = rng.integers(0, 4000, size=n)
    rows = [
        (str(t), None if d is None else str(d), int(u))
        for t, d, u in zip(types, days, users)
    ]
    return rows, spark.createDataFrame(rows, "t string, d string, uid bigint").repartition(7)


def test_rollup_levels_and_null_dim_disambiguation(spark, facts):
    rows, df = facts
    out = hll_rollup(df, ["t", "d"], "uid", p=12).collect()
    # levels: 2 (cells), 1 (per t), 0 (grand); a REAL NULL d survives at
    # level 2 while rolled-up d is NULL at level 1 — level splits them
    lv2 = [r for r in out if r["level"] == 2]
    lv1 = [r for r in out if r["level"] == 1]
    lv0 = [r for r in out if r["level"] == 0]
    assert {r["t"] for r in lv1} == {"click", "view", "buy"}
    assert all(r["d"] is None for r in lv1) and all(r["t"] is None for r in lv0)
    assert any(r["d"] is None for r in lv2)  # the real-NULL day cells
    assert len(lv0) == 1
    assert sum(r["n_items"] for r in lv2) == len(rows) == lv0[0]["n_items"]


def test_rolled_payload_bitwise_equals_direct_build(spark, facts):
    rows, df = facts
    out = hll_rollup(df, ["t", "d"], "uid", p=12).collect()
    from rusty_bloomfilter_spark.operators.aggregate import collect_sketch_bytes

    grand = [r for r in out if r["level"] == 0][0]
    direct_payload, n = collect_sketch_bytes(
        HllSketch(p=12, col="uid", scalar=True).build(df.select("uid"))
    )
    assert bytes(grand["payload"]) == direct_payload and grand["n_items"] == n
    # and one mid-level group
    click = [r for r in out if r["level"] == 1 and r["t"] == "click"][0]
    click_direct, _ = collect_sketch_bytes(
        HllSketch(p=12, col="uid", scalar=True).build(
            df.filter(F.col("t") == "click").select("uid")
        )
    )
    assert bytes(click["payload"]) == click_direct


def test_estimates_track_exact_at_every_level(spark, facts):
    rows, df = facts
    out = hll_rollup(df, ["t", "d"], "uid", p=14).collect()
    exact: dict = {}
    for t, d, u in rows:
        for key in [(t, d, 2), (t, None, 1), (None, None, 0)]:
            exact.setdefault(key, set()).add(u)
    se = 1.04 / np.sqrt(2**14)
    for r in out:
        true = len(exact[(r["t"], r["d"], r["level"])])
        assert abs(r["est_distinct"] - true) <= max(3 * se * true, 3.0), r


def test_sketch_rollup_validates_dims(spark, facts):
    _, df = facts
    cells = HllSketch(p=12, col="uid", scalar=True).build_by_key(
        df.withColumn("_cell", F.col("t")).select("_cell", "uid"), "_cell"
    )
    with pytest.raises(ValueError, match="dim column"):
        sketch_rollup(cells, ["missing"])


def test_fragmented_cells_merge_at_finest_level(spark, facts):
    """Review regression: a cells frame with >1 row per dim combination
    (per-partition sketches never key-merged) must merge at the finest
    level too, not pass fragments through."""
    _, df = facts
    cells = HllSketch(p=12, col="uid", scalar=True).build_by_key(
        df.withColumn("_cell", F.col("t")).select("_cell", "uid"), "_cell"
    ).withColumnRenamed("key", "t")
    doubled = cells.unionByName(cells)  # two fragments per t
    out = sketch_rollup(doubled, ["t"]).collect()
    lv1 = [r for r in out if r["level"] == 1]
    assert len(lv1) == 3  # one merged row per t, not six fragments
    singles = {r["t"]: r for r in cells.collect()}
    for r in lv1:
        s = singles[r["t"]]
        # register-idempotent max-merge: same estimate; occurrence
        # counts add across fragments (header n_items doubles)
        assert (
            HyperLogLog.from_bytes(bytes(r["payload"])).estimate()
            == HyperLogLog.from_bytes(bytes(s["payload"])).estimate()
        )
        assert r["n_items"] == 2 * s["n_items"]


def test_rollup_partition_invariant(spark, facts):
    rows, df = facts
    a = {
        (r["t"], r["d"], r["level"]): bytes(r["payload"])
        for r in hll_rollup(df.repartition(3), ["t", "d"], "uid", p=12).collect()
    }
    b = {
        (r["t"], r["d"], r["level"]): bytes(r["payload"])
        for r in hll_rollup(df.repartition(11), ["t", "d"], "uid", p=12).collect()
    }
    assert a == b
