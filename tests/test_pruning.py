"""Bloom-indexed file pruning: pruned scan ≡ full scan (zero FN)."""

import os

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.pruning import (
    bloom_file_index,
    bloom_pruned_read,
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


def test_no_duplicate_rows_when_file_split(spark, tmp_path, index):
    # a single large file read as several splits yields several index
    # rows for the same file; the pruned read must still see each row once
    path = str(tmp_path / "onefile")
    spark.range(20_000).select(F.col("id").alias("key")).coalesce(1).write.parquet(path)
    small = spark.read.parquet(path)
    # force multi-split read of the one file
    split_df = (
        spark.read.option("maxPartitionBytes", "1024")
        .parquet(path)
    )
    idx = bloom_file_index(split_df, Shape.for_np(25_000, 0.01), key_col="key")
    rows, files_read = bloom_pruned_read(spark, path, idx, [7, 19_999], key_col="key")
    assert sorted(r["key"] for r in rows.collect()) == [7, 19_999]
    assert files_read == 1


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
