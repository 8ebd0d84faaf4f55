"""Per-key OLS trend against closed-form truth: exact fit on a planted
line (r²=1), numpy polyfit parity on a noisy series, degenerate-key
drops, ref-day invariance of the slope, and a single-aggregate plan."""

import datetime as dt

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.trend import group_trend

D0 = dt.date(2024, 3, 1)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "k string, day date, v double"
    ).repartition(4)


def _by_key(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_perfect_line_recovered_exactly(spark):
    # v = 10 + 2.5 * t over 20 days
    rows = [("a", D0 + dt.timedelta(days=t), 10.0 + 2.5 * t) for t in range(20)]
    out = _by_key(group_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01"))["a"]
    assert out["slope_per_day"] == pytest.approx(2.5, abs=1e-6)
    assert out["intercept"] == pytest.approx(10.0, abs=1e-6)
    assert out["r2"] == pytest.approx(1.0, abs=1e-6)
    assert out["n_days"] == 20
    assert out["fitted_first"] == pytest.approx(10.0, abs=1e-6)
    assert out["fitted_last"] == pytest.approx(10.0 + 2.5 * 19, abs=1e-6)


def test_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    ts = np.arange(30)
    vals = 100.0 - 1.7 * ts + rng.normal(0, 5, 30).round(3)
    rows = [("n", D0 + dt.timedelta(days=int(t)), float(v)) for t, v in zip(ts, vals)]
    out = _by_key(group_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01"))["n"]
    slope, intercept = np.polyfit(ts.astype(float), vals, 1)
    r = np.corrcoef(ts.astype(float), vals)[0, 1]
    assert out["slope_per_day"] == pytest.approx(slope, abs=1e-6)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert out["r2"] == pytest.approx(r * r, abs=1e-6)
    assert out["slope_per_day"] < 0


def test_ref_day_moves_intercept_not_slope(spark):
    rows = [("a", D0 + dt.timedelta(days=t), 5.0 + 3.0 * t) for t in range(10)]
    f = _frame(spark, rows)
    early = _by_key(group_trend(f, "k", "day", "v", ref_day="2024-03-01"))["a"]
    late = _by_key(group_trend(f, "k", "day", "v", ref_day="2024-03-06"))["a"]
    assert early["slope_per_day"] == late["slope_per_day"]
    # value at 2024-03-06 is 5 + 3*5
    assert late["intercept"] == pytest.approx(20.0, abs=1e-6)
    assert early["fitted_last"] == late["fitted_last"]


def test_degenerate_keys_dropped(spark):
    rows = [("line", D0 + dt.timedelta(days=t), float(t)) for t in range(3)]
    rows += [("oneday", D0, 9.0)]  # single point: no slope
    got = _by_key(group_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01"))
    assert set(got) == {"line"}


def test_min_points_filter_and_guard(spark):
    rows = [("a", D0 + dt.timedelta(days=t), float(t)) for t in range(4)]
    rows += [("b", D0, 1.0), ("b", D0 + dt.timedelta(days=1), 2.0)]
    f = _frame(spark, rows)
    got = _by_key(group_trend(f, "k", "day", "v", ref_day="2024-03-01", min_points=3))
    assert set(got) == {"a"}
    with pytest.raises(ValueError):
        group_trend(f, "k", "day", "v", ref_day="2024-03-01", min_points=1)


def test_single_aggregate_plan(spark):
    rows = [("a", D0 + dt.timedelta(days=t), float(t)) for t in range(5)]
    src = spark.createDataFrame(rows, "k string, day date, v double")
    df = group_trend(src, "k", "day", "v", ref_day="2024-03-01")
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    phys = buf.getvalue()
    # one hash aggregate pair around one Exchange; no window, no join
    assert len(re.findall(r"^\(\d+\) Exchange", phys, re.M)) == 1, phys
    assert "Window" not in phys and "Join" not in phys, phys


# -- Theil–Sen robust slope -------------------------------------------------

from rusty_bloomfilter_spark.operators.trend import theil_sen_trend


def _ts_oracle(ts, vals):
    """Brute-force Theil–Sen: median of all pairwise slopes, then Sen's
    intercept as the median residual at slope."""
    ts = np.asarray(ts, dtype=float)
    vals = np.asarray(vals, dtype=float)
    slopes = [
        (vals[j] - vals[i]) / (ts[j] - ts[i])
        for i in range(len(ts))
        for j in range(i + 1, len(ts))
    ]
    slope = float(np.median(slopes))
    intercept = float(np.median(vals - slope * ts))
    return slope, intercept


def test_theilsen_matches_bruteforce(spark):
    rng = np.random.default_rng(21)
    ts = np.arange(25)
    vals = (3.0 + 0.8 * ts + rng.normal(0, 2, 25)).round(3)
    rows = [("a", D0 + dt.timedelta(days=int(t)), float(v)) for t, v in zip(ts, vals)]
    got = _by_key(theil_sen_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01"))["a"]
    slope, intercept = _ts_oracle(ts, vals)
    assert got["ts_slope_per_day"] == pytest.approx(slope, abs=1e-6)
    assert got["ts_intercept"] == pytest.approx(intercept, abs=1e-6)
    assert got["n_days"] == 25
    assert got["n_pairs"] == 25 * 24 // 2


def test_theilsen_shrugs_off_outlier_where_ols_moves(spark):
    # clean line v = 2t, one corrupted day at +1000 at the window END —
    # maximal leverage (a center spike moves only the OLS intercept)
    ts = np.arange(21)
    vals = 2.0 * ts
    vals[20] += 1000.0
    rows = [("a", D0 + dt.timedelta(days=int(t)), float(v)) for t, v in zip(ts, vals)]
    f = _frame(spark, rows)
    robust = _by_key(theil_sen_trend(f, "k", "day", "v", ref_day="2024-03-01"))["a"]
    ols = _by_key(group_trend(f, "k", "day", "v", ref_day="2024-03-01"))["a"]
    assert robust["ts_slope_per_day"] == pytest.approx(2.0, abs=0.01)
    # OLS is visibly dragged by the spike — the gap IS the alarm
    assert abs(ols["slope_per_day"] - 2.0) > 0.5


def test_theilsen_two_points_and_guard(spark):
    rows = [("b", D0, 1.0), ("b", D0 + dt.timedelta(days=2), 7.0)]
    got = _by_key(theil_sen_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01"))["b"]
    assert got["ts_slope_per_day"] == pytest.approx(3.0, abs=1e-6)
    assert got["n_pairs"] == 1
    with pytest.raises(ValueError):
        theil_sen_trend(_frame(spark, rows), "k", "day", "v", ref_day="2024-03-01", min_points=1)


# -- sample autocorrelation -------------------------------------------------

from rusty_bloomfilter_spark.operators.trend import acf


def _acf_oracle_np(vals, max_lag):
    x = np.asarray(vals, dtype=float)
    xbar = x.mean()
    dev = x - xbar
    ss = float((dev * dev).sum())
    return {
        k: float((dev[:-k] * dev[k:]).sum() / ss) for k in range(1, max_lag + 1)
    }


def test_acf_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vals = rng.integers(10, 100, size=40).astype(float)
    rows = [("a", D0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)]
    got = {
        r["lag"]: r
        for r in acf(_frame(spark, rows), "k", "day", "v", max_lag=5).collect()
    }
    want = _acf_oracle_np(vals, 5)
    for k in range(1, 6):
        assert got[k]["acf"] == pytest.approx(want[k], abs=2e-6)
        assert got[k]["n_days"] == 40
        assert got[k]["ci"] == pytest.approx(1.96 / np.sqrt(40), abs=1e-6)


def test_acf_weekly_cycle_lights_up_lag7(spark):
    # strong period-7 signal + small noise: r_7 significant, r_1..r_3 not all
    rng = np.random.default_rng(4)
    days = 70
    vals = 50 + 30 * np.sin(2 * np.pi * np.arange(days) / 7) + rng.normal(0, 1, days)
    rows = [("a", D0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)]
    got = {r["lag"]: r for r in acf(_frame(spark, rows), "k", "day", "v").collect()}
    assert got[7]["acf"] > 0.8 and got[7]["is_significant"]
    # half-period anti-correlation is the cycle's signature
    assert got[3]["acf"] < 0 or got[4]["acf"] < 0


def test_acf_constant_series_is_null_and_guard(spark):
    rows = [("c", D0 + dt.timedelta(days=i), 5.0) for i in range(10)]
    got = acf(_frame(spark, rows), "k", "day", "v", max_lag=2).collect()
    assert all(r["acf"] is None for r in got)  # try_divide on zero variance
    with pytest.raises(ValueError):
        acf(_frame(spark, rows), "k", "day", "v", max_lag=0)


# -- day-of-week seasonality strength ---------------------------------------

from rusty_bloomfilter_spark.operators.trend import seasonal_strength_dow


def test_seasonality_pure_weekly_cycle_is_one(spark):
    # value depends ONLY on the weekday: residual variance 0 -> strength 1
    base = {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0, 4: 50.0, 5: 5.0, 6: 2.0}
    rows = [
        ("a", D0 + dt.timedelta(days=i), base[(D0 + dt.timedelta(days=i)).weekday()])
        for i in range(35)
    ]
    got = _by_key(seasonal_strength_dow(_frame(spark, rows), "k", "day", "v"))["a"]
    assert got["seasonal_strength"] == pytest.approx(1.0, abs=1e-6)
    assert got["n_days"] == 35
    # peak ISO day: Friday (weekday()==4 -> isodow 5) at 50.0
    assert got["peak_dow"] == 5 and got["peak_avg"] == pytest.approx(50.0)


def test_seasonality_matches_numpy_decomposition(spark):
    rng = np.random.default_rng(8)
    vals = {}
    rows = []
    for i in range(70):
        d = D0 + dt.timedelta(days=i)
        v = float(20 + 8 * (d.weekday() in (5, 6)) + rng.normal(0, 3))
        rows.append(("a", d, v))
        vals.setdefault(d.weekday(), []).append(v)
    x = np.array([v for _, _, v in rows])
    m = np.array([np.mean(vals[(D0 + dt.timedelta(days=i)).weekday()]) for i in range(70)])
    want = max(0.0, 1.0 - np.var(x - m) / np.var(x))
    got = _by_key(seasonal_strength_dow(_frame(spark, rows), "k", "day", "v"))["a"]
    assert got["seasonal_strength"] == pytest.approx(want, abs=2e-6)
    assert got["seasonal_strength"] > 0.3  # planted weekend lift is visible


def test_seasonality_white_noise_is_small(spark):
    rng = np.random.default_rng(10)
    rows = [("w", D0 + dt.timedelta(days=i), float(rng.normal(100, 10))) for i in range(140)]
    got = _by_key(seasonal_strength_dow(_frame(spark, rows), "k", "day", "v"))["w"]
    # dow means still absorb ~6/140 dof of noise; strength stays small
    assert got["seasonal_strength"] < 0.15
