"""KS exponential goodness-of-fit: brute force + direction checks."""

import math

import numpy as np
import pytest


def brute_ks(dts):
    n = len(dts)
    lam = n / sum(dts)
    d = 0.0
    for i, x in enumerate(sorted(dts), start=1):
        cdf = 1.0 - math.exp(-lam * x)
        d = max(d, i / n - cdf, cdf - (i - 1) / n)
    return lam, d


def _run(spark, rows):
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.gof import interarrival_ks

    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    return {r["event_type"]: r.asDict() for r in interarrival_ks(df).collect()}


def _ts_rows(grp, gaps_us, start=1_700_000_000_000_000):
    import datetime as dt

    t = start
    out = [(grp, dt.datetime.utcfromtimestamp(t / 1e6))]
    for g in gaps_us:
        t += int(g)
        out.append((grp, dt.datetime.utcfromtimestamp(t / 1e6)))
    return out


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(67)
    gaps = rng.exponential(2_000_000, size=200).astype(np.int64) + 1
    got = _run(spark, _ts_rows("a", gaps))["a"]
    lam, d = brute_ks(gaps.tolist())
    assert got["n"] == 200
    assert abs(got["ks_stat"] - d) < 1e-5
    assert abs(got["lambda_per_s"] - lam * 1e6) < 1e-4


def test_exponential_passes_regular_fails(spark):
    rng = np.random.default_rng(71)
    expo = rng.exponential(1_000_000, size=400).astype(np.int64) + 1
    regular = np.full(400, 1_000_000, dtype=np.int64)  # metronome traffic
    got = _run(spark, _ts_rows("expo", expo) + _ts_rows("reg", regular))
    assert got["expo"]["exponential_ok"] is True
    assert got["reg"]["exponential_ok"] is False
    assert got["reg"]["ks_stat"] > 0.5  # ~ 1 - (1 - e^-1) = 0.632


def test_small_groups_dropped(spark):
    rows = _ts_rows("tiny", [1_000_000] * 5) + _ts_rows(
        "big", [1_000_000] * 50
    )
    got = _run(spark, rows)
    assert "tiny" not in got and "big" in got
