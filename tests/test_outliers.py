"""Median/MAD robust outlier fences (operators/outliers.py): pinned
against a numpy oracle, plus the property the operator exists for —
a huge outlier must NOT move the fence the way it moves mean/stddev."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.outliers import (
    MAD_SIGMA,
    flag_outliers,
    robust_group_fences,
    robust_group_stats,
)


def _np_fences(vals, k=3.0):
    med = float(np.median(vals))
    mad = float(np.median(np.abs(np.asarray(vals) - med)))
    return med, mad, med - k * MAD_SIGMA * mad, med + k * MAD_SIGMA * mad


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (mu, sigma, n_bad) in {
        "a": (10.0, 1.0, 3),
        "b": (-5.0, 0.5, 0),
    }.items():
        vals = np.round(rng.normal(mu, sigma, 400), 3).tolist()
        vals += [mu + 1e6] * n_bad  # the sensor-glitch rows
        rows += [(g, float(v)) for v in vals]
    return spark.createDataFrame(rows, "g string, v double").repartition(4), rows


def test_stats_match_numpy_oracle(spark, frame):
    df, rows = frame
    got = {
        r["g"]: r
        for r in robust_group_stats(df, value_col="v", key_col="g").collect()
    }
    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        med, mad, lo, hi = _np_fences(vals)
        r = got[g]
        assert r["n"] == len(vals)
        assert r["med"] == pytest.approx(med, abs=1e-9)
        assert r["mad"] == pytest.approx(mad, abs=1e-9)
        assert (r["lo"], r["hi"]) == (pytest.approx(lo), pytest.approx(hi))
        want_out = sum(1 for v in vals if v < lo or v > hi)
        assert r["n_outliers"] == want_out
    # the planted glitches are caught
    assert got["a"]["n_outliers"] >= 3


def test_breakdown_robustness_vs_mean_stddev(spark, frame):
    """The reason this operator exists: with 3 glitch rows at +1e6 the
    mean/stddev fence swallows everything (stddev ~ 1e5 x sigma) while
    the MAD fence still sits within a few sigma of the clean data."""
    df, rows = frame
    [r] = robust_group_fences(df, value_col="v", key_col="g").filter(
        F.col("g") == "a"
    ).collect()
    assert 10.0 - 1.0 < r["med"] < 10.0 + 1.0
    assert r["hi"] < 10.0 + 10 * 1.0  # fence stays near the clean spread
    [m] = (
        df.filter(F.col("g") == "a")
        .agg(F.mean("v").alias("mu"), F.stddev("v").alias("sd"))
        .collect()
    )
    assert m["mu"] + 3 * m["sd"] > 1e5  # classical fence is blown out


def test_flag_outliers_rowlevel(spark, frame):
    df, rows = frame
    flagged = flag_outliers(df, value_col="v", key_col="g")
    assert flagged.filter("is_outlier").count() == sum(
        r["n_outliers"]
        for r in robust_group_stats(df, value_col="v", key_col="g").collect()
    )
    # NULL values are never outliers and don't crash the fences
    with_null = df.union(
        spark.createDataFrame([("a", None)], "g string, v double")
    )
    nrow = flag_outliers(with_null, value_col="v", key_col="g").filter(
        F.col("v").isNull()
    ).collect()
    assert len(nrow) == 1 and nrow[0]["is_outlier"] is False


def test_approx_path_and_validation(spark, frame):
    df, rows = frame
    exact = {
        r["g"]: r for r in robust_group_fences(df, value_col="v", key_col="g").collect()
    }
    approx = {
        r["g"]: r
        for r in robust_group_fences(
            df, value_col="v", key_col="g", approx_rel_err=1e-4
        ).collect()
    }
    for g in exact:
        assert approx[g]["med"] == pytest.approx(exact[g]["med"], rel=1e-2, abs=1e-2)
    with pytest.raises(ValueError, match="k must be positive"):
        robust_group_fences(df, value_col="v", key_col="g", k=0)


# -- trimmed_stats ----------------------------------------------------------


def test_trimmed_stats_matches_scipy_style_bruteforce(spark):
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.outliers import trimmed_stats

    rng = np.random.default_rng(23)
    vals = np.round(rng.normal(50, 10, 40), 3)
    rows = [("a", int(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, id long, v double").repartition(4)
    got = trimmed_stats(df, "k", "v", "id").collect()[0]
    k = int(0.1 * 40)
    s = np.sort(vals)
    trimmed = s[k:-k] if k else s
    wins = np.clip(vals, s[k], s[-k - 1])
    assert got["n_rows"] == 40 and got["n_kept"] == 40 - 2 * k
    assert got["mean"] == pytest.approx(vals.mean(), abs=1e-6)
    assert got["trimmed_mean"] == pytest.approx(trimmed.mean(), abs=1e-6)
    assert got["winsorized_mean"] == pytest.approx(wins.mean(), abs=1e-6)


def test_trimmed_resists_outlier_and_guards(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.outliers import trimmed_stats

    rows = [("a", i, 10.0) for i in range(19)] + [("a", 99, 100000.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = trimmed_stats(df, "k", "v", "id", trim_frac=0.1).collect()[0]
    assert got["trimmed_mean"] == pytest.approx(10.0)
    assert got["winsorized_mean"] == pytest.approx(10.0)  # spike clamps to 10
    assert got["mean"] > 5000
    # trim_frac 0: all three agree
    allk = trimmed_stats(df, "k", "v", "id", trim_frac=0.0).collect()[0]
    assert allk["trimmed_mean"] == allk["mean"] == allk["winsorized_mean"]
    with pytest.raises(ValueError, match="trim_frac"):
        trimmed_stats(df, "k", "v", "id", trim_frac=0.5)


def test_trimmed_stats_null_values_excluded(spark):
    # review fix: NULLs are not measurements — never a fabricated
    # winsorized edge, never NULLS-FIRST rank divergence from SQL
    import pytest

    from rusty_bloomfilter_spark.operators.outliers import trimmed_stats

    rows = [("a", i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    rows += [("a", 99, None), ("a", 98, None)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = trimmed_stats(df, "k", "v", "id", trim_frac=0.1).collect()[0]
    assert got["n_rows"] == 10  # ranked rows only
    assert got["n_kept"] == 8
    assert got["mean"] == pytest.approx(55.0)
    assert got["trimmed_mean"] == pytest.approx(sum(range(20, 100, 10)) / 8)
    # winsorized: 10->20, 100->90
    assert got["winsorized_mean"] == pytest.approx((20 + 20 + 30 + 40 + 50 + 60 + 70 + 80 + 90 + 90) / 10)
