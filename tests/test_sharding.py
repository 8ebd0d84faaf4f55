"""shard_assignment / split_assignment (operators/sharding.py) tests:
determinism across partitionings, disjoint-exhaustive splits, manifest
totals, threshold math, and validation errors."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.sharding import (
    _split_thresholds,
    shard_assignment,
    shard_manifest,
    split_assignment,
    split_manifest,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tok"),
        F.concat(F.lit("lang"), F.col("id") % 3).alias("lang"),
    )


def _py_bucket(doc_id: str, mod: int) -> int:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % mod


def test_shard_assignment_matches_python_md5(spark):
    rows = shard_assignment(_docs(spark, 50), 32).collect()
    for r in rows:
        assert r.shard == _py_bucket(r.doc_id, 32)


def test_shard_assignment_stable_under_repartition(spark):
    df = _docs(spark)
    a = {r.doc_id: r.shard for r in shard_assignment(df, 16).collect()}
    b = {
        r.doc_id: r.shard
        for r in shard_assignment(df.repartition(13), 16).collect()
    }
    assert a == b


def test_shard_assignment_rejects_nonpositive(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(_docs(spark, 1), 0)


def test_shard_manifest_totals_and_membership_digest(spark):
    df = _docs(spark, 200)
    man = shard_manifest(df, 8, weight_col="n_tok").collect()
    assert sum(r.n_docs for r in man) == 200
    total_tok = df.agg(F.sum("n_tok")).first()[0]
    assert sum(r.n_weight for r in man) == total_tok
    # digest pins membership: recompute one shard's digest in python
    by_shard = {}
    for r in df.collect():
        by_shard.setdefault(_py_bucket(r.doc_id, 8), []).append(r.doc_id)
    for r in man:
        expect = hashlib.md5(
            ",".join(sorted(by_shard[r.shard])).encode()
        ).hexdigest()
        assert r.ids_md5 == expect


def test_split_thresholds_cumulative_and_closed(spark):
    bounds = _split_thresholds({"train": 0.98, "val": 0.01, "test": 0.01})
    assert bounds == [("train", 980000), ("val", 990000), ("test", 1000000)]
    with pytest.raises(ValueError, match="sum to 1"):
        _split_thresholds({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="negative"):
        _split_thresholds({"a": 1.5, "b": -0.5})


def test_split_assignment_disjoint_exhaustive_and_stable(spark):
    df = _docs(spark, 300)
    a = {r.doc_id: r.split for r in split_assignment(df).collect()}
    # every doc gets exactly one split (withColumn guarantees one value;
    # stability is the real property)
    assert set(a.values()) <= {"train", "val", "test"}
    b = {
        r.doc_id: r.split
        for r in split_assignment(df.repartition(7)).collect()
    }
    assert a == b
    # adding MORE data cannot move an existing doc's split
    c = {
        r.doc_id: r.split
        for r in split_assignment(_docs(spark, 600)).collect()
    }
    for k, v in a.items():
        assert c[k] == v


def test_split_assignment_matches_python_ranges(spark):
    rows = split_assignment(
        _docs(spark, 200), {"x": 0.5, "y": 0.3, "z": 0.2}
    ).collect()
    for r in rows:
        b = _py_bucket(r.doc_id, 1_000_000)
        expect = "x" if b < 500000 else ("y" if b < 800000 else "z")
        assert r.split == expect


def test_split_manifest_strata_totals(spark):
    df = _docs(spark, 300)
    man = split_manifest(df, weight_col="n_tok", strata_col="lang").collect()
    assert sum(r.n_docs for r in man) == 300
    langs = {r.lang for r in man}
    assert langs == {"lang0", "lang1", "lang2"}


def test_write_shards_layout_manifest_and_observed_totals(spark, tmp_path):
    from rusty_bloomfilter_spark.operators.sharding import write_shards

    df = _docs(spark, 240).repartition(9)
    out = str(tmp_path / "shards")
    totals = write_shards(df, out, 8, weight_col="n_tok").collect()[0]
    assert totals.n_rows == 240
    assert totals.n_weight == df.agg(F.sum("n_tok")).first()[0]
    # one data file per shard directory
    import glob
    import os

    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 8
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    # read-back membership identical to the planned manifest
    back = spark.read.parquet(out)
    planned = {
        (r.shard, r.n_docs, r.ids_md5)
        for r in shard_manifest(df, 8).collect()
    }
    actual = {
        (r.shard, r.n_docs, r.ids_md5)
        for r in shard_manifest(back.drop("shard"), 8).collect()
    }
    assert planned == actual


# -- epoch_shuffle ----------------------------------------------------------


def _py_epoch_key(epoch: int, doc_id: str) -> int:
    return int(
        hashlib.md5(f"{epoch}:{doc_id}".encode()).hexdigest()[:8], 16
    )


def test_epoch_shuffle_matches_python_md5(spark):
    from rusty_bloomfilter_spark.operators.sharding import epoch_shuffle

    rows = epoch_shuffle(_docs(spark, 60), epoch=2, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        k = _py_epoch_key(2, r.doc_id)
        assert r.shard == k % 4
        by_shard.setdefault(r.shard, []).append((k, r.doc_id, r.pos))
    for shard, items in by_shard.items():
        items.sort()
        for want_pos, (_, _, got_pos) in enumerate(items, start=1):
            assert got_pos == want_pos, shard


def test_epoch_shuffle_fresh_order_per_epoch_and_stable_per_epoch(spark):
    from rusty_bloomfilter_spark.operators.sharding import epoch_shuffle

    df = _docs(spark, 200)
    e1 = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(df, 1, 8).collect()}
    e1b = {
        (r.doc_id): (r.shard, r.pos)
        for r in epoch_shuffle(df.repartition(11), 1, 8).collect()
    }
    e2 = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(df, 2, 8).collect()}
    assert e1 == e1b  # same epoch: identical under repartitioning
    assert e1 != e2  # different epoch: a different permutation
    moved = sum(1 for d in e1 if e1[d] != e2[d])
    assert moved > 150  # nearly every doc re-dealt


def test_epoch_shuffle_positions_are_dense_per_shard(spark):
    from rusty_bloomfilter_spark.operators.sharding import epoch_shuffle

    rows = epoch_shuffle(_docs(spark, 150), epoch=0, n_shards=5).collect()
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append(r.pos)
    assert sum(len(v) for v in per.values()) == 150
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_epoch_shuffle_rejects_nonpositive_shards(spark):
    from rusty_bloomfilter_spark.operators.sharding import epoch_shuffle

    with pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(_docs(spark, 1), epoch=0, n_shards=0)
