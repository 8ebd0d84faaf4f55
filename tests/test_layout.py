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


# ---------------------------------------------------------------------------
# Z-order (Morton) layout
# ---------------------------------------------------------------------------

from rusty_bloomfilter_spark.operators.layout import (  # noqa: E402
    ZorderLayout,
    _zfile_cuts,
    multi_range_boundaries,
    plan_zorder_layout,
    write_zorder_layout,
    zorder_expr,
)
from rusty_bloomfilter_spark.operators.zonemap import (  # noqa: E402
    zone_prune,
    zone_pruned_read_multi,
)


def _ref_buckets(vals: np.ndarray, cuts: list[float]) -> np.ndarray:
    return np.sum(np.asarray(cuts)[None, :] < vals[:, None], axis=1) if cuts else np.zeros(len(vals), dtype=np.int64)


def _ref_z(cols_vals: list[np.ndarray], boundaries: list[list[float]], bits: int) -> np.ndarray:
    ncols = len(cols_vals)
    z = np.zeros(len(cols_vals[0]), dtype=np.int64)
    for j, (vals, cuts) in enumerate(zip(cols_vals, boundaries)):
        b = _ref_buckets(vals, cuts).astype(np.int64)
        for i in range(bits):
            z |= ((b >> i) & 1) << (i * ncols + j)
    return z


@pytest.fixture(scope="module")
def xy_values():
    rng = np.random.default_rng(47)
    x = rng.uniform(0, 1000, 20_000)
    # CORRELATED second column: per-dim independence math would
    # misallocate files; the exact z-histogram cut must not care
    y = 0.7 * x + rng.normal(0, 80, 20_000)
    return x, y


@pytest.fixture(scope="module")
def xydf(spark, xy_values):
    x, y = xy_values
    return spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
        "id bigint, x double, y double",
    ).repartition(5)


def test_zorder_expr_matches_numpy_morton(spark, xydf, xy_values):
    x, y = xy_values
    bounds, _ = multi_range_boundaries(xydf, ["x", "y"], 8)
    got = {
        r["id"]: r["z"]
        for r in xydf.select("id", zorder_expr(["x", "y"], bounds, 3).alias("z")).collect()
    }
    want = _ref_z([x, y], [bounds["x"], bounds["y"]], 3)
    assert all(got[i] == int(want[i]) for i in range(len(x)))


def test_zorder_fused_boundaries_accurate_per_column(spark, xydf, xy_values):
    """The fused one-scan sketch must be as accurate per column as a
    dedicated scan would be (same KLL bound; payload bytes can differ —
    compaction depends on accumulation order, which differs between a
    one-column and a two-column pass)."""
    x, y = xy_values
    bounds, err = multi_range_boundaries(xydf, ["x", "y"], 8)
    assert err > 0
    for vals, cuts in ((x, bounds["x"]), (y, bounds["y"])):
        assert len(cuts) == 7 and cuts == sorted(cuts)
        for i, cut in enumerate(cuts, start=1):
            true_rank = (vals <= cut).mean()
            assert abs(true_rank - i / 8) <= 3 * err + 1e-3, (i, true_rank)


def test_zfile_cuts_quantile_on_exact_histogram():
    hist = [(z, 10) for z in range(64)]  # uniform: 4 files of 16 cells
    cuts = _zfile_cuts(hist, 4)
    assert cuts == [15, 31, 47]
    # one dominant cell: it gets its own file neighborhood, counts stay
    # within one cell of even share
    skew = [(0, 1000)] + [(z, 1) for z in range(1, 64)]
    cuts = _zfile_cuts(skew, 4)
    assert cuts[0] == 0  # the heavy cell closes the first file
    assert _zfile_cuts(hist, 1) == []
    with pytest.raises(ValueError):
        _zfile_cuts(hist, 0)


def test_zorder_pruned_equals_full_and_both_dims_prune(spark, xydf, xy_values, tmp_path):
    x, y = xy_values
    path = str(tmp_path / "zorder")
    layout = write_zorder_layout(xydf, path, ["x", "y"], 16, bits=3)
    n_files = layout.n_files
    assert n_files in (15, 16)  # one fewer if a cut would land on the top cell
    laid = spark.read.parquet(path)
    idx_x = zone_map_index(laid, col="x")
    idx_y = zone_map_index(laid, col="y")
    assert idx_x.count() == n_files  # one file per curve segment
    bx = (float(np.percentile(x, 20)), float(np.percentile(x, 45)))
    by = (float(np.percentile(y, 30)), float(np.percentile(y, 60)))
    only_x = len(zone_prune(idx_x, lower=bx[0], upper=bx[1]))
    only_y = len(zone_prune(idx_y, lower=by[0], upper=by[1]))
    rows, files_read = zone_pruned_read_multi(
        spark, path, {"x": idx_x, "y": idx_y}, {"x": bx, "y": by}
    )
    assert 0 < files_read < n_files
    assert files_read <= min(only_x, only_y)
    assert only_x < n_files and only_y < n_files  # each dim prunes alone too
    got = sorted(r["id"] for r in rows.collect())
    mask = (x >= bx[0]) & (x <= bx[1]) & (y >= by[0]) & (y <= by[1])
    assert got == sorted(int(i) for i in np.flatnonzero(mask))
    # balance: greedy exact-histogram cuts keep every file within one
    # grid cell of the even share, correlation notwithstanding
    per_file = sorted(r["n_rows"] for r in idx_x.collect())
    zhist = np.bincount(_ref_z([x, y], [layout.boundaries["x"], layout.boundaries["y"]], 3))
    assert per_file[-1] <= len(x) / n_files + zhist.max() + 1


def test_zorder_layout_reuse_appends_on_same_grid(spark, xydf, xy_values, tmp_path):
    x, y = xy_values
    base = str(tmp_path / "zsnap")
    layout = write_zorder_layout(xydf, base + "/day=0", ["x", "y"], 8, bits=3)
    rng = np.random.default_rng(53)
    x2 = rng.uniform(0, 1000, 5_000)
    y2 = 0.7 * x2 + rng.normal(0, 80, 5_000)
    df2 = spark.createDataFrame(
        [(100_000 + i, float(a), float(b)) for i, (a, b) in enumerate(zip(x2, y2))],
        "id bigint, x double, y double",
    )
    # SAME layout object: no new KLL scan, no new histogram — tomorrow's
    # files land on yesterday's grid
    write_zorder_layout(df2, base + "/day=1", ["x", "y"], 8, layout=layout)
    from rusty_bloomfilter_spark.operators.zonemap import compact_zone_index

    laid = spark.read.parquet(base)
    idx_x = compact_zone_index(zone_map_index(laid, col="x"))
    idx_y = compact_zone_index(zone_map_index(laid, col="y"))
    ax, ay = np.concatenate([x, x2]), np.concatenate([y, y2])
    ids = np.concatenate([np.arange(len(x)), 100_000 + np.arange(len(x2))])
    bx = (float(np.percentile(ax, 25)), float(np.percentile(ax, 50)))
    by = (float(np.percentile(ay, 35)), float(np.percentile(ay, 65)))
    rows, files_read = zone_pruned_read_multi(
        spark, base, {"x": idx_x, "y": idx_y}, {"x": bx, "y": by}
    )
    n_files = idx_x.count()
    assert 0 < files_read < n_files
    got = sorted(r["id"] for r in rows.collect())
    mask = (ax >= bx[0]) & (ax <= bx[1]) & (ay >= by[0]) & (ay <= by[1])
    assert got == sorted(int(i) for i in ids[mask])


def test_zorder_guards_and_empty_prune(spark, xydf):
    with pytest.raises(ValueError, match="too large"):
        zorder_expr(["x", "y"], {"x": [], "y": []}, 11)
    with pytest.raises(ValueError, match="more than"):
        zorder_expr(["x"], {"x": [1.0, 2.0, 3.0]}, 1)
    with pytest.raises(ValueError, match="ascending"):
        zorder_expr(["x"], {"x": [2.0, 1.0]}, 2)
    with pytest.raises(ValueError, match="at least one"):
        zorder_expr([], {}, 3)
    with pytest.raises(ValueError, match="clusters"):
        write_zorder_layout(
            xydf, "/tmp/never", ["y", "x"], 4,
            layout=ZorderLayout(("x", "y"), 3, {"x": [], "y": []}, []),
        )


def test_zorder_empty_survivor_set(spark, xydf, tmp_path):
    path = str(tmp_path / "zempty")
    write_zorder_layout(xydf, path, ["x", "y"], 4, bits=2)
    laid = spark.read.parquet(path)
    idx = zone_map_index(laid, col="x")
    rows, n = zone_pruned_read_multi(
        spark, path, {"x": idx}, {"x": (1e9, 2e9)}
    )
    assert n == 0 and rows.count() == 0
    with pytest.raises(ValueError, match="at least one bounded"):
        zone_pruned_read_multi(spark, path, {"x": idx}, {})
    with pytest.raises(ValueError, match="no zone-map index"):
        zone_pruned_read_multi(spark, path, {"x": idx}, {"y": (0, 1)})
