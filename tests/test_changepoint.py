"""CUSUM changepoint operator against hand-computed truth: a clean
mean shift localizes at the break, sign of g_scaled encodes direction,
ties pick the earliest point, constant series yield g=0, single-point
series, and a single-Exchange plan."""

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.changepoint import cusum_changepoint


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "k string, i bigint, v bigint"
    ).repartition(4)


def _by_key(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_clean_shift_localizes(spark):
    # 10 @ level 100 then 10 @ level 200: break after i=10.
    rows = [("a", i, 100 if i <= 10 else 200) for i in range(1, 21)]
    out = _by_key(cusum_changepoint(_frame(spark, rows), "k", "i", "v"))["a"]
    assert out["cp_at"] == 10
    assert out["cp_index"] == 10
    assert out["n_points"] == 20
    # series ran BELOW its mean (150) before the break -> negative g
    assert out["g_scaled"] < 0
    assert out["g_abs"] == -out["g_scaled"]
    # exact closed form: G_10 = n*prefix - i*total = 20*1000 - 10*3000
    assert out["g_scaled"] == 20 * 1000 - 10 * 3000
    assert out["mean_before"] == pytest.approx(100.0)
    assert out["mean_after"] == pytest.approx(200.0)


def test_drop_has_positive_sign(spark):
    rows = [("d", i, 200 if i <= 5 else 100) for i in range(1, 11)]
    out = _by_key(cusum_changepoint(_frame(spark, rows), "k", "i", "v"))["d"]
    assert out["cp_index"] == 5
    assert out["g_scaled"] > 0  # ran ABOVE the mean before the break


def test_constant_series_and_tie_goes_earliest(spark):
    rows = [("c", i, 7) for i in range(1, 6)]
    out = _by_key(cusum_changepoint(_frame(spark, rows), "k", "i", "v"))["c"]
    # every G_i == 0 -> tie on |g|, earliest order value wins
    assert out["g_scaled"] == 0
    assert out["cp_at"] == 1
    assert out["mean_before"] == pytest.approx(7.0)


def test_single_point(spark):
    out = _by_key(cusum_changepoint(_frame(spark, [("s", 1, 42)]), "k", "i", "v"))["s"]
    assert out["cp_index"] == 1 and out["n_points"] == 1
    assert out["g_scaled"] == 0
    assert out["mean_after"] == 0.0  # no right segment


def test_multi_key_independence(spark):
    rows = [("a", i, 10 if i <= 3 else 50) for i in range(1, 7)]
    rows += [("b", i, 5) for i in range(1, 4)]
    got = _by_key(cusum_changepoint(_frame(spark, rows), "k", "i", "v"))
    assert got["a"]["cp_index"] == 3
    assert got["b"]["g_scaled"] == 0
    assert set(got) == {"a", "b"}


def test_single_exchange_plan(spark):
    rows = [("a", i, i % 3) for i in range(1, 30)]
    # window passes + argmax all share the key partitioning: the
    # physical plan gets exactly one Exchange (hash on the key).
    src = spark.createDataFrame(rows, "k string, i bigint, v bigint")
    df = cusum_changepoint(src, "k", "i", "v")
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    phys = buf.getvalue()
    exchanges = re.findall(r"^\(\d+\) Exchange", phys, re.M)
    assert len(exchanges) == 1, phys
    assert "hashpartitioning(k" in phys, phys
