"""KLL-driven range layout: boundary accuracy vs exact percentiles,
pure-Catalyst bucket assignment vs numpy searchsorted, one file per
bucket, balance within the published rank error, and pruned == full
through the zone map over the layout."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.layout import (
    assign_buckets,
    range_boundaries,
    write_range_layout,
)
from rusty_bloomfilter_spark.operators.zonemap import zone_map_index, zone_pruned_read


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(29)
    # lognormal: skewed enough that uniform-width buckets would be
    # badly unbalanced — quantile cuts must fix that
    return rng.lognormal(mean=4.0, sigma=1.0, size=30_000)


@pytest.fixture(scope="module")
def vdf(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id bigint, v double"
    ).repartition(5)


def test_boundaries_match_exact_percentiles(spark, vdf, values):
    bs, rank_err = range_boundaries(vdf, "v", 8)
    assert len(bs) == 7 and bs == sorted(bs)
    for i, b in enumerate(bs, start=1):
        true_rank = (values <= b).mean()
        assert abs(true_rank - i / 8) <= 3 * rank_err + 1e-3, (i, true_rank)


def test_assign_buckets_matches_searchsorted(spark, vdf, values):
    bs, _ = range_boundaries(vdf, "v", 8)
    got = {
        r["id"]: r["bucket"]
        for r in assign_buckets(vdf, "v", bs).select("id", "bucket").collect()
    }
    want = np.searchsorted(np.asarray(bs), values, side="left")
    # searchsorted(left): count of boundaries < v when v not equal to a
    # boundary; equality goes to the lower bucket in both definitions
    for i, v in enumerate(values):
        assert got[i] == int(np.sum(np.asarray(bs) < v)), i
    assert sum(got.values()) == int(np.sum(want))  # same mass overall


def test_assign_buckets_edge_cases(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id bigint, v double")
    out = {r["id"]: r["bucket"] for r in assign_buckets(df, "v", [3.0]).collect()}
    assert out == {1: 0, 2: 1}  # NULL -> bucket 0
    out0 = assign_buckets(df, "v", []).select("bucket").distinct().collect()
    assert [r["bucket"] for r in out0] == [0]
    with pytest.raises(ValueError, match="ascending"):
        assign_buckets(df, "v", [5.0, 3.0])
    with pytest.raises(ValueError):
        range_boundaries(df, "v", 1)


def test_layout_one_file_per_bucket_and_balance(spark, vdf, tmp_path):
    path = str(tmp_path / "layout")
    bs, rank_err = write_range_layout(vdf, path, "v", 8)
    laid = spark.read.parquet(path)
    per_file = (
        laid.groupBy(F.input_file_name().alias("f"), "bucket")
        .count()
        .collect()
    )
    files = {r["f"] for r in per_file}
    buckets = {r["bucket"] for r in per_file}
    assert len(files) == len(buckets) == len(bs) + 1  # one file per bucket
    total = sum(r["count"] for r in per_file)
    ideal = total / (len(bs) + 1)
    for r in per_file:
        assert r["count"] <= ideal * (1 + 8 * (3 * rank_err)), r
    assert total == vdf.count()


def test_layout_zone_prune_equals_full(spark, vdf, values, tmp_path):
    path = str(tmp_path / "layout2")
    write_range_layout(vdf, path, "v", 8)
    laid = spark.read.parquet(path)
    index = zone_map_index(laid, col="v")
    lo, hi = float(np.percentile(values, 30)), float(np.percentile(values, 55))
    rows, files_read = zone_pruned_read(spark, path, index, col="v", lower=lo, upper=hi)
    assert 0 < files_read < 8  # the layout genuinely prunes
    got = sorted(r["id"] for r in rows.collect())
    want = sorted(int(i) for i in np.flatnonzero((values >= lo) & (values <= hi)))
    assert got == want


def test_append_snapshot_reuses_boundaries(spark, vdf, values, tmp_path):
    """The cross-snapshot claim: append tomorrow's data against
    YESTERDAY'S persisted boundaries (no new quantile scan), compact
    the zone indexes, and the pruned read over the union stays exact
    while still skipping files."""
    base = str(tmp_path / "snap")
    bs, _ = write_range_layout(vdf, base + "/day=0", "v", 8)
    rng = np.random.default_rng(31)
    new_vals = rng.lognormal(mean=4.0, sigma=1.0, size=10_000)
    new_df = spark.createDataFrame(
        [(100_000 + i, float(v)) for i, v in enumerate(new_vals)],
        "id bigint, v double",
    )
    # same cuts, no range_boundaries call — files stay range-aligned
    (
        assign_buckets(new_df, "v", bs)
        .repartition(8, F.col("bucket"))
        .sortWithinPartitions("v")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(base + "/day=1")
    )
    from rusty_bloomfilter_spark.operators.zonemap import compact_zone_index

    laid = spark.read.parquet(base)
    index = compact_zone_index(zone_map_index(laid, col="v"))
    all_vals = np.concatenate([values, new_vals])
    all_ids = np.concatenate([np.arange(len(values)), 100_000 + np.arange(len(new_vals))])
    lo, hi = float(np.percentile(all_vals, 35)), float(np.percentile(all_vals, 60))
    rows, files_read = zone_pruned_read(spark, base, index, col="v", lower=lo, upper=hi)
    n_files = index.count()
    assert 0 < files_read < n_files
    got = sorted(r["id"] for r in rows.collect())
    mask = (all_vals >= lo) & (all_vals <= hi)
    assert got == sorted(int(i) for i in all_ids[mask])


def test_duplicate_cuts_collapse(spark):
    """A column dominated by one repeated value yields duplicate
    quantile cuts; boundaries dedupe and assignment stays correct."""
    df = spark.createDataFrame(
        [(i, 1.0 if i < 900 else float(i)) for i in range(1000)],
        "id bigint, v double",
    )
    bs, _ = range_boundaries(df, "v", 8)
    assert bs == sorted(bs) and len(set(bs)) == len(bs) and len(bs) < 7
    n_buckets = (
        assign_buckets(df, "v", bs).select("bucket").distinct().count()
    )
    assert n_buckets <= len(bs) + 1
