"""Zone-map file pruning: pruned range scan ≡ full scan (zero FN)."""

import os

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.zonemap import (
    compact_zone_index,
    zone_map_index,
    zone_prune,
    zone_pruned_read,
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """16 parquet files, disjoint key ranges per file (write-side range
    partitioning — the clustered layout zone maps exploit)."""
    path = str(tmp_path_factory.mktemp("zonemap") / "corpus")
    df = spark.range(32_000).select(
        F.col("id").alias("key"),
        (F.col("id") * 7 % 1000).alias("val"),
    )
    df.repartitionByRange(16, "key").write.parquet(path)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 16
    return path


@pytest.fixture(scope="module")
def index(spark, corpus):
    idx = zone_map_index(spark.read.parquet(corpus), col="key").persist()
    idx.count()
    yield idx
    idx.unpersist()


def test_index_bounds_match_per_file_truth(spark, corpus, index):
    truth = (
        spark.read.parquet(corpus)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
        .collect()
    )
    want = {r["f"]: (r["lo"], r["hi"]) for r in truth}
    got = {r["file"]: (r["lo"], r["hi"]) for r in index.collect()}
    assert got == want and len(got) == 16
    assert index.groupBy().agg(F.sum("n_rows")).collect()[0][0] == 32_000


def test_zero_false_negatives_and_prunes(spark, corpus, index):
    lo, hi = 10_000, 12_000
    kept = set(zone_prune(index, lower=lo, upper=hi))
    truth = (
        spark.read.parquet(corpus)
        .select(F.input_file_name().alias("f"), "key")
        .filter(F.col("key").between(lo, hi))
        .select("f")
        .distinct()
        .collect()
    )
    assert {r["f"] for r in truth} <= kept
    # a 2k-wide window over a 32k range split into 16 files: must prune
    assert len(kept) <= 3


@pytest.mark.parametrize(
    "lower,upper",
    [
        (10_000, 12_000),  # interior window
        (None, 5),  # one-sided <=
        (31_990, None),  # one-sided >=
        (31_999, 31_999),  # single point at the edge
        (50_000, 60_000),  # fully absent range
    ],
)
def test_pruned_read_equals_full_scan(spark, corpus, index, lower, upper):
    rows, files_read = zone_pruned_read(
        spark, corpus, index, col="key", lower=lower, upper=upper
    )
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (F.col("key") >= lower)
    if upper is not None:
        pred = pred & (F.col("key") <= upper)
    got = sorted((r["key"], r["val"]) for r in rows.collect())
    want = sorted(
        (r["key"], r["val"])
        for r in spark.read.parquet(corpus).filter(pred).collect()
    )
    assert got == want
    assert files_read <= 16
    if lower is not None and upper is not None and lower > 32_000:
        assert files_read == 0


def test_unbounded_prune_rejected(index):
    with pytest.raises(ValueError, match="at least one bound"):
        zone_prune(index)


def test_null_only_files_are_pruned(spark, tmp_path):
    # file 0: all-NULL vals; file 1: real values. A range probe must
    # read only file 1 (min/max ignore NULLs; lo IS NULL => all null).
    path = str(tmp_path / "nulls")
    df = spark.range(2_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 1_000, F.col("id")).alias("v"),
        (F.col("id") < 1_000).cast("int").alias("part"),
    )
    df.repartitionByRange(2, "part").write.parquet(path)
    idx = zone_map_index(spark.read.parquet(path), col="v")
    rows, files_read = zone_pruned_read(
        spark, path, idx, col="v", lower=0, upper=10_000
    )
    assert files_read == 1
    assert rows.count() == 1_000
    # null accounting: one file all-null, one file null-free
    stats = sorted((r["n_nulls"], r["lo"] is None) for r in idx.collect())
    assert stats == [(0, False), (1_000, True)]


def test_string_column_zone_map(spark, tmp_path):
    path = str(tmp_path / "strings")
    df = spark.range(1_000).select(
        F.format_string("k%04d", F.col("id")).alias("s"), F.col("id").alias("v")
    )
    df.repartitionByRange(4, "s").write.parquet(path)
    idx = zone_map_index(spark.read.parquet(path), col="s")
    rows, files_read = zone_pruned_read(
        spark, path, idx, col="s", lower="k0100", upper="k0199"
    )
    assert rows.count() == 100
    assert files_read == 1


def _split_file_index(spark, path):
    """Index one physical file read as MANY splits (session conf — the
    per-read option of the same name is silently ignored)."""
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        idx = zone_map_index(spark.read.parquet(path), col="key").persist()
        idx.count()  # materialize under the split conf
        return idx
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_split_file_yields_one_row(spark, tmp_path):
    # unlike the per-partition Bloom index, the groupBy(input_file_name)
    # aggregate collapses read-SPLITS of one physical file at build time:
    # one row, full bounds, no compaction needed
    path = str(tmp_path / "splitfile")
    spark.range(20_000).select(F.col("id").alias("key")).coalesce(1).write.option(
        "parquet.block.size", "4096"
    ).parquet(path)
    idx = _split_file_index(spark, path)
    try:
        rows = idx.collect()
        assert len(rows) == 1
        assert (rows[0]["lo"], rows[0]["hi"]) == (0, 19_999)
        assert rows[0]["n_rows"] == 20_000
    finally:
        idx.unpersist()


def test_compact_merges_partial_bounds(spark):
    # compaction math over hand-built snapshot rows for the SAME file
    # (e.g. a file re-indexed after an append): min of mins, max of
    # maxes, counts add
    a = spark.createDataFrame(
        [("f1", 10, 50, 0, 100), ("f2", 0, 5, 2, 10)],
        "file string, lo bigint, hi bigint, n_nulls bigint, n_rows bigint",
    )
    b = spark.createDataFrame(
        [("f1", 5, 30, 1, 40)],
        "file string, lo bigint, hi bigint, n_nulls bigint, n_rows bigint",
    )
    got = {r["file"]: r for r in compact_zone_index(a, b).collect()}
    assert (got["f1"]["lo"], got["f1"]["hi"]) == (5, 50)
    assert (got["f1"]["n_nulls"], got["f1"]["n_rows"]) == (1, 140)
    assert (got["f2"]["lo"], got["f2"]["hi"]) == (0, 5)


def test_compact_union_across_snapshots(spark, corpus, index):
    # same corpus indexed twice: bounds unchanged, counts double
    single = {r["file"]: r for r in index.collect()}
    twice = {r["file"]: r for r in compact_zone_index(index, index).collect()}
    assert twice.keys() == single.keys()
    for f, r in twice.items():
        assert (r["lo"], r["hi"]) == (single[f]["lo"], single[f]["hi"])
        assert r["n_rows"] == 2 * single[f]["n_rows"]


def test_compact_validates_empty():
    with pytest.raises(ValueError):
        compact_zone_index()


def test_non_file_input_fails_loud(spark):
    # an in-memory frame has no input_file_name(): one ''-named group
    # spanning all values — any intersecting probe must raise, never
    # silently prune everything
    mem = spark.range(100).select(F.col("id").alias("key"))
    idx = zone_map_index(mem, col="key")
    with pytest.raises(Exception, match="empty file name"):
        zone_prune(idx, lower=0, upper=50)
    with pytest.raises(Exception, match="empty file name"):
        compact_zone_index(idx).collect()


def test_hive_partitioned_input(spark, tmp_path):
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
    idx = zone_map_index(laid, col="key")
    rows, files_read = zone_pruned_read(
        spark, path, idx, col="key", lower=100, upper=110
    )
    assert sorted(rows.columns) == sorted(laid.columns)
    got = sorted(tuple(r) for r in rows.select("key", "bucket", "val").collect())
    want = sorted(
        tuple(r)
        for r in laid.filter(F.col("key").between(100, 110))
        .select("key", "bucket", "val")
        .collect()
    )
    assert got == want and len(want) == 11
    assert files_read >= 1


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pruned_read_pushes_range_filter_to_scan(spark, corpus, index):
    # the exact range predicate must reach the parquet scan of the
    # surviving files (row-group/page skipping on top of file skipping)
    rows, _ = zone_pruned_read(
        spark, corpus, index, col="key", lower=10_000, upper=12_000
    )
    plan = plan_of(rows)
    assert "GreaterThanOrEqual(key,10000)" in plan
    assert "LessThanOrEqual(key,12000)" in plan


def test_index_build_is_one_tiny_aggregate(spark, tmp_path):
    # the index plan is a hash aggregate keyed by input_file_name():
    # partial agg map-side, so the single Exchange carries at most
    # tasks x files stat rows — never corpus rows. Own corpus: the
    # shared `index` fixture persists the identical plan, and cache
    # substitution would hide the aggregate under InMemoryTableScan.
    path = str(tmp_path / "plancorpus")
    spark.range(4_000).select(F.col("id").alias("key")).repartitionByRange(
        4, "key"
    ).write.parquet(path)
    idx = zone_map_index(spark.read.parquet(path), col="key")
    plan = plan_of(idx)
    # exactly one Exchange node ("(N) Exchange" section header in the
    # formatted plan), fed by a partial (map-side) aggregate
    assert plan.count(") Exchange") == 1
    assert "partial_min" in plan and "partial_max" in plan
