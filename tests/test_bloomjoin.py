"""Bloom-accelerated anti join: exact equality + genuine pruning."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.bloomjoin import bloom_anti_join


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_anti_join_equals_plain(spark):
    rng = np.random.default_rng(3)
    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": np.arange(5000),
                "k": rng.integers(0, 800, 5000).astype("int64"),
            }
        )
    )
    # NULL probe keys: anti join keeps them (never equal to anything)
    probe = probe.withColumn(
        "k", F.when(F.col("id") % 97 == 0, None).otherwise(F.col("k"))
    )
    build = spark.createDataFrame(
        pd.DataFrame({"bk": rng.integers(0, 400, 600).astype("int64")})
    )
    # NULL build keys can never match and must not poison the filter
    build = build.union(spark.createDataFrame([(None,)], "bk bigint"))
    got = bloom_anti_join(probe, "k", build, "bk", p=1e-3)
    want = probe.join(build, probe.k == build.bk, "left_anti")
    assert _ids(got) == _ids(want)
    assert got.columns == probe.columns


def test_anti_join_extremes(spark):
    probe = spark.range(1000).withColumnRenamed("id", "k").withColumn(
        "id", F.col("k")
    )
    disjoint = spark.range(2000, 2100).withColumnRenamed("id", "bk")
    got = bloom_anti_join(probe, "k", disjoint, "bk", p=1e-3)
    assert got.count() == 1000  # everything bypasses, everything kept
    everything = spark.range(0, 1000).withColumnRenamed("id", "bk")
    got2 = bloom_anti_join(probe, "k", everything, "bk", p=1e-3, n_keys=1000)
    assert got2.count() == 0


def test_anti_join_prunes_candidates(spark):
    """The pruning claim: probe positives (rows that pay for the exact
    join) are bounded by matches + p-bounded FPs of the rest."""
    from rusty_bloomfilter_spark.operators.sketches import (
        BlockedBloomSketch,
        broadcast_probe_udf,
    )

    p = 1e-3
    probe = spark.range(10_000).withColumnRenamed("id", "k")
    build = spark.range(100).withColumnRenamed("id", "bk")
    sk = BlockedBloomSketch.for_np(n=1024, p=p, col="k", scalar=True)
    payload, _ = sk.build_bytes(build.withColumnRenamed("bk", "k"))
    positives = probe.filter(
        broadcast_probe_udf(payload, spark)(F.col("k"))
    ).count()
    assert positives >= 100  # zero FN: every true match probes positive
    assert positives <= 100 + 20 * p * 9_900 + 5  # FP-bounded candidates


def test_inner_join_equals_plain(spark):
    from rusty_bloomfilter_spark.operators.bloomjoin import bloom_inner_join

    rng = np.random.default_rng(5)
    left = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(3000), "lk": rng.integers(0, 500, 3000)})
    ).withColumn("lk", F.when(F.col("id") % 83 == 0, None).otherwise(F.col("lk")))
    right = spark.createDataFrame(
        pd.DataFrame({"rid": np.arange(200), "rk": rng.integers(300, 700, 200)})
    ).union(spark.createDataFrame([(999, None)], "rid long, rk long"))

    want = sorted(
        (r["id"], r["rid"])
        for r in left.join(right, left.lk == right.rk).select("id", "rid").collect()
    )
    for prune in ("both", "left", "right"):
        got = sorted(
            (r["id"], r["rid"])
            for r in bloom_inner_join(
                left, "lk", right, "rk", p=1e-3, prune=prune
            ).select("id", "rid").collect()
        )
        assert got == want, prune
    with pytest.raises(ValueError):
        bloom_inner_join(left, "lk", right, "rk", prune="neither")


def test_anti_join_nullable_xxhash_scale_keys(spark):
    """Nullable int64 keys spanning |v| >= 2^53 (xxhash64 fingerprints)
    must not crash the probe UDF via float64 promotion (round-4 review
    catch: the disjunction can't split around the UDF, so NULL rows
    reach it and the column arrives float64 unless coalesced first)."""
    probe = (
        spark.range(2000)
        .select(F.col("id"), F.xxhash64(F.col("id").cast("string")).alias("k"))
        .withColumn("k", F.when(F.col("id") % 37 == 0, None).otherwise(F.col("k")))
    )
    build = spark.range(500).select(
        F.xxhash64(F.col("id").cast("string")).alias("bk")
    )
    from rusty_bloomfilter_spark.operators.bloomjoin import (
        bloom_anti_join,
        bloom_inner_join,
    )

    got = sorted(
        r["id"] for r in bloom_anti_join(probe, "k", build, "bk", p=1e-4)
        .select("id").collect()
    )
    want = sorted(
        r["id"] for r in probe.join(build, probe.k == build.bk, "left_anti")
        .select("id").collect()
    )
    assert got == want
    got_j = bloom_inner_join(probe, "k", build, "bk", p=1e-4).count()
    want_j = probe.join(build, probe.k == build.bk).count()
    assert got_j == want_j
