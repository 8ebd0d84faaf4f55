"""One-scan table profiler: exact stats exactly, estimates within their
published bounds, NULL discipline (nulls never count as values), hot-key
surfacing on skew, type guards, empty/all-NULL degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def pdata():
    rng = np.random.default_rng(61)
    n = 20_000
    # skewed int: value 7 owns ~30% of rows (well above the MG 1/(cap+1)
    # surfacing threshold), the rest uniform over 1000 keys
    hot = rng.random(n) < 0.3
    keys = np.where(hot, 7, rng.integers(100, 1100, n))
    vals = rng.lognormal(4.0, 1.0, n)
    null_val = rng.random(n) < 0.15  # 15% NULLs in the float column
    labels = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, n)]
    return keys, vals, null_val, labels


@pytest.fixture(scope="module")
def pdf(spark, pdata):
    keys, vals, null_val, labels = pdata
    rows = [
        (
            int(k),
            None if nv else float(v),
            str(s),
        )
        for k, v, nv, s in zip(keys, vals, null_val, labels)
    ]
    return spark.createDataFrame(rows, "k bigint, v double, s string").repartition(6)


def test_exact_stats_exact(spark, pdf, pdata):
    keys, vals, null_val, labels = pdata
    by = {p.column: p for p in profile_table(pdf)}
    assert set(by) == {"k", "v", "s"}
    n = len(keys)
    assert by["k"].n_rows == by["v"].n_rows == by["s"].n_rows == n
    assert by["k"].n_nulls == 0
    assert by["v"].n_nulls == int(null_val.sum())
    assert by["s"].n_nulls == 0
    assert by["k"].min_value == int(keys.min())
    assert by["k"].max_value == int(keys.max())
    live = vals[~null_val]
    assert by["v"].min_value == pytest.approx(float(live.min()))
    assert by["v"].max_value == pytest.approx(float(live.max()))
    assert by["s"].min_value == "alpha" and by["s"].max_value == "gamma"
    assert 0 < by["v"].null_fraction < 0.2


def test_estimates_within_published_bounds(spark, pdf, pdata):
    keys, vals, null_val, labels = pdata
    by = {p.column: p for p in profile_table(pdf)}
    for col, exact in (
        ("k", len(np.unique(keys))),
        ("v", len(np.unique(vals[~null_val]))),
        ("s", 4),
    ):
        p = by[col]
        assert abs(p.ndv_est - exact) <= 4 * p.ndv_rel_error * exact + 1, (col, p.ndv_est)
    # numeric quantiles: estimated value's true rank within KLL bound
    p = by["v"]
    live = np.sort(vals[~null_val])
    for q, est in p.quantiles.items():
        true_rank = np.searchsorted(live, est, side="right") / len(live)
        assert abs(true_rank - q) <= 3 * p.quantile_rank_error + 1e-3, (q, true_rank)
    # strings get no quantiles, non-integers no hot keys
    assert by["s"].quantiles == {} and by["s"].hot_keys == []
    assert by["v"].hot_keys == []


def test_hot_key_surfaced_with_valid_bounds(spark, pdf, pdata):
    keys, _, _, _ = pdata
    p = {q.column: q for q in profile_table(pdf)}["k"]
    true_hot = int((keys == 7).sum())
    top = p.hot_keys[0]
    assert top.key == 7
    assert top.est <= true_hot <= top.ub  # MG deterministic bracket
    assert top.share_ub >= true_hot / len(keys)


def test_null_values_never_count_as_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id bigint, s string"
    )
    p = {q.column: q for q in profile_table(df, ["s"])}["s"]
    assert p.n_nulls == 2
    assert abs(p.ndv_est - 2) < 0.5  # 'a', 'b' — NULL is not a third value
    assert p.min_value == "a" and p.max_value == "b"


def test_all_null_and_empty(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    p = profile_table(df, ["v"])[0]
    assert p.n_rows == 2 and p.n_nulls == 2
    assert p.min_value is None and p.max_value is None
    assert p.ndv_est == 0 and p.quantiles == {}
    empty = df.filter(F.lit(False))
    p0 = profile_table(empty, ["v"])[0]
    assert p0.n_rows == 0 and p0.n_nulls == 0 and p0.ndv_est == 0


def test_type_and_column_guards(spark):
    df = spark.createDataFrame([(1, [1, 2])], "id bigint, arr array<bigint>")
    with pytest.raises(ValueError, match="unsupported dtype"):
        profile_table(df, ["arr"])
    with pytest.raises(ValueError, match="unknown column"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no profilable"):
        profile_table(df.select("arr"))
    # default column selection skips unsupported types silently
    assert [p.column for p in profile_table(df)] == ["id"]


def test_partitioning_does_not_change_exacts_or_break_bounds(spark, pdf, pdata):
    keys, vals, null_val, _ = pdata
    a = {p.column: p for p in profile_table(pdf.repartition(3))}
    b = {p.column: p for p in profile_table(pdf.repartition(13))}
    for col in ("k", "v", "s"):
        assert a[col].n_nulls == b[col].n_nulls
        assert a[col].min_value == b[col].min_value
        assert a[col].max_value == b[col].max_value
        exact = {
            "k": len(np.unique(keys)),
            "v": len(np.unique(vals[~null_val])),
            "s": 4,
        }[col]
        for prof in (a[col], b[col]):
            assert abs(prof.ndv_est - exact) <= 4 * prof.ndv_rel_error * exact + 1
