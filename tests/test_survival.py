"""Kaplan-Meier curve: brute-force oracle + censoring semantics."""

import math

import numpy as np
import pytest

UNIT = 60_000_000
CENSOR = 30 * 60 * 1_000_000


def brute_km(intervals, unit=UNIT, censor=CENSOR):
    h = max(e for _, e in intervals)
    durs = []
    for s, e in intervals:
        durs.append(((e - s) // unit, h - e > censor))
    out = {}
    surv = 1.0
    alive = True
    for t in sorted({d for d, c in durs if c}):
        n = sum(1 for d, _ in durs if d >= t)
        ev = sum(1 for d, c in durs if c and d == t)
        if ev < n:
            surv *= 1.0 - ev / n
        else:
            alive = False
        out[t] = (n, ev, round(surv if alive else 0.0, 6))
    return out


def _run(spark, intervals, **kw):
    from rusty_bloomfilter_spark.operators.survival import km_curve

    df = spark.createDataFrame([(int(s), int(e)) for s, e in intervals], "s long, e long")
    return {
        r["t_unit"]: (r["n_risk"], r["d_events"], r["survival"])
        for r in km_curve(df, "s", "e", **kw).collect()
    }


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(79)
    base = 1_700_000_000_000_000
    intervals = []
    for _ in range(400):
        s = base + int(rng.integers(0, 3 * 86_400_000_000))
        intervals.append((s, s + int(rng.integers(1, 90 * UNIT))))
    got = _run(spark, intervals)
    want = brute_km(intervals)
    assert got == want and len(got) > 10


def test_censoring_feeds_risk_not_events(spark):
    base = 1_700_000_000_000_000
    h = base + 100 * UNIT
    intervals = [
        (base, base + 2 * UNIT),        # completed, dur 2
        (base, base + 5 * UNIT),        # completed, dur 5
        (h - 3 * UNIT, h),              # CENSORED (ends at horizon), dur 3
    ]
    got = _run(spark, intervals)
    # at t=2: risk {2,5,3} -> 3, events 1 -> S = 2/3
    assert got[2] == (3, 1, round(1 - 1 / 3, 6))
    # at t=5: risk {5} -> 1 (censored dur-3 dropped out), events 1 ->
    # everyone-at-risk completes: survival hits exactly 0
    assert got[5] == (1, 1, 0.0)
    assert 3 not in got  # the censored duration is never an event row


def test_all_complete_final_point_zero(spark):
    base = 1_700_000_000_000_000
    h = base + 1000 * UNIT
    intervals = [(base, base + d * UNIT) for d in (1, 1, 2, 4)] + [
        (base, base + 900 * UNIT),  # completed (ends 100 min before h)
        (h - UNIT, h),  # censored anchor that SETS the horizon
    ]
    got = _run(spark, intervals)
    assert got[900][2] == 0.0
    assert all(v[2] > 0 for t, v in got.items() if t < 900)
