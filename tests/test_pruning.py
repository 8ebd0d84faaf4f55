"""Bloom-indexed file pruning: pruned scan ≡ full scan (zero FN)."""

import os

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.pruning import (
    bloom_file_index,
    bloom_pruned_read,
    compact_index,
    prune_files,
)
from rusty_bloomfilter_spark.sketch import Shape


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """16 parquet files, 2_000 rows each, disjoint key ranges per file
    (write-side range partitioning — the layout pruning exploits)."""
    path = str(tmp_path_factory.mktemp("pruning") / "corpus")
    df = spark.range(32_000).select(
        F.col("id").alias("key"),
        (F.col("id") * 7 % 1000).alias("val"),
    )
    # repartitionByRange: each output file owns a contiguous key range,
    # so a point key lives in exactly one file
    df.repartitionByRange(16, "key").write.parquet(path)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 16
    return path


@pytest.fixture(scope="module")
def index(spark, corpus):
    df = spark.read.parquet(corpus)
    idx = bloom_file_index(df, Shape.for_np(2_500, 0.001), key_col="key").persist()
    idx.count()
    yield idx
    idx.unpersist()


def test_index_covers_all_files_and_rows(spark, corpus, index):
    n_files = len([f for f in os.listdir(corpus) if f.endswith(".parquet")])
    agg = index.groupBy().agg(
        F.countDistinct("file").alias("nf"), F.sum("n_rows").alias("nr")
    ).collect()[0]
    assert agg["nf"] == n_files
    assert agg["nr"] == 32_000


def test_zero_false_negatives(spark, corpus, index):
    # every key's true home file must survive pruning
    keys = [0, 1, 999, 15_000, 31_999]
    kept = set(prune_files(index, keys))
    truth = (
        spark.read.parquet(corpus)
        .select(F.input_file_name().alias("f"), "key")
        .filter(F.col("key").isin(keys))
        .select("f")
        .distinct()
        .collect()
    )
    true_files = {r["f"] for r in truth}
    assert true_files <= kept
    # range-partitioned layout + p=0.001: pruning must actually prune
    assert len(kept) < 16


def test_pruned_read_equals_full_scan(spark, corpus, index):
    keys = [5, 4_321, 17_000, 31_998, 999_999]  # one absent key too
    rows, files_read = bloom_pruned_read(
        spark, corpus, index, keys, key_col="key"
    )
    got = sorted((r["key"], r["val"]) for r in rows.collect())
    want = sorted(
        (r["key"], r["val"])
        for r in spark.read.parquet(corpus).filter(F.col("key").isin(keys)).collect()
    )
    assert got == want
    assert len(want) == 4
    assert 0 < files_read < 16


def _split_file_index(spark, path, shape):
    """Index one physical file read as MANY splits (session conf —
    the per-read option of the same name is silently ignored)."""
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        idx = bloom_file_index(spark.read.parquet(path), shape, key_col="key")
        idx = idx.persist()
        idx.count()  # materialize under the split conf
        return idx
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_no_duplicate_rows_when_file_split(spark, tmp_path):
    # a single large file read as several splits yields several index
    # rows for the same file; the pruned read must still see each row once
    path = str(tmp_path / "onefile")
    spark.range(20_000).select(F.col("id").alias("key")).coalesce(1).write.option(
        "parquet.block.size", "4096"
    ).parquet(path)
    idx = _split_file_index(spark, path, Shape.for_np(25_000, 0.01))
    try:
        rows, files_read = bloom_pruned_read(
            spark, path, idx, [7, 19_999], key_col="key"
        )
        assert sorted(r["key"] for r in rows.collect()) == [7, 19_999]
        assert files_read == 1
    finally:
        idx.unpersist()


def test_compact_index_collapses_split_rows(spark, tmp_path):
    # one physical file forced into many read splits -> many index rows;
    # compaction must collapse them to ONE row covering every key
    path = str(tmp_path / "splitfile")
    spark.range(20_000).select(F.col("id").alias("key")).coalesce(1).write.option(
        "parquet.block.size", "4096"
    ).parquet(path)
    idx = _split_file_index(spark, path, Shape.for_np(25_000, 0.01))
    try:
        assert idx.count() > 1
        compacted = compact_index(idx)
        rows = compacted.collect()
        assert len(rows) == 1
        assert rows[0]["n_rows"] == 20_000
        assert rows[0]["n_items"] == 20_000
        # compacted sketch still has zero FN over the whole file
        from rusty_bloomfilter_spark.sketch import sketch_from_bytes
        import numpy as np

        f = sketch_from_bytes(bytes(rows[0]["payload"]))
        assert f.contains_tokens(np.arange(20_000, dtype=np.int64)).all()
    finally:
        idx.unpersist()


def test_compact_index_union_is_order_invariant(spark, corpus, index):
    # cross-snapshot union: same corpus indexed twice; payload bits are
    # canonical so either union order yields bitwise-identical rows
    a = compact_index(index, index).orderBy("file").collect()
    b = compact_index(index.orderBy(F.desc("file")), index).orderBy("file").collect()
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    single = {r["file"]: r for r in compact_index(index).collect()}
    for r in a:
        # re-indexed content: identical bits, only the n_items header
        # field (bytes 20:28 of the <4sBBBBQIQ header) doubles
        dup, one = bytes(r["payload"]), bytes(single[r["file"]]["payload"])
        assert dup[:20] == one[:20] and dup[28:] == one[28:]
        assert r["n_rows"] == 2 * single[r["file"]]["n_rows"]


def test_compact_index_validates_empty(spark):
    with pytest.raises(ValueError):
        compact_index()


def test_pruned_read_hive_partitioned_input(spark, tmp_path):
    # leaf-file reads drop hive-partition columns without basePath; the
    # pruned scan must keep the full schema and match the full scan
    path = str(tmp_path / "hive")
    df = spark.range(8_000).select(
        F.col("id").alias("key"),
        (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 3).alias("val"),
    )
    df.write.partitionBy("bucket").parquet(path)
    laid = spark.read.parquet(path)
    idx = bloom_file_index(laid, Shape.for_np(3_000, 0.001), key_col="key")
    keys = [11, 4_002, 7_999]
    rows, files_read = bloom_pruned_read(spark, path, idx, keys, key_col="key")
    assert sorted(rows.columns) == sorted(laid.columns)
    got = sorted(tuple(r) for r in rows.select("key", "bucket", "val").collect())
    want = sorted(
        tuple(r)
        for r in laid.filter(F.col("key").isin(keys))
        .select("key", "bucket", "val")
        .collect()
    )
    assert got == want and len(want) == 3
    assert files_read >= 1


def test_non_file_input_fails_loud(spark):
    # an in-memory frame has no input_file_name(); the index must be
    # rejected with a clear error, not an opaque Hadoop path error
    mem = spark.range(100).select(F.col("id").alias("key"))
    idx = bloom_file_index(mem, Shape.for_np(200, 0.01), key_col="key")
    with pytest.raises(Exception, match="empty file name"):
        prune_files(idx, [5])
    with pytest.raises(Exception, match="empty file name"):
        compact_index(idx).collect()


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pruned_read_pushes_key_filter_to_scan(spark, corpus, index):
    # the exact IN filter must reach the parquet scan of the surviving
    # files (row-group/page skipping on top of file skipping)
    rows, _ = bloom_pruned_read(spark, corpus, index, [5, 4_321], key_col="key")
    plan = plan_of(rows)
    assert "PushedFilters: [In(key, [4321,5])" in plan


def test_index_build_shuffles_nothing(spark, corpus):
    # one corpus scan, map-side only: the index build plan must contain
    # no Exchange (sketch rows are emitted straight from the scan tasks)
    idx = bloom_file_index(
        spark.read.parquet(corpus), Shape.for_np(2_500, 0.001), key_col="key"
    )
    assert "Exchange" not in plan_of(idx)


def test_empty_and_absent_probes(spark, corpus, index):
    assert prune_files(index, []) == []
    rows, files_read = bloom_pruned_read(spark, corpus, index, [], key_col="key")
    assert rows.count() == 0
    # absent keys: FP rate 0.001 over 16 files → expect ~0 files read
    rows2, n2 = bloom_pruned_read(
        spark, corpus, index, [10_000_000, 10_000_001], key_col="key"
    )
    assert rows2.count() == 0
    assert n2 <= 2
