"""Sweep-line peak concurrency: brute force + decomposition invariance."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.sweep import DAY_US, HOUR_US


def brute_peaks(intervals):
    """Flat per-day sweep over closed [s, e] micro intervals."""
    from collections import defaultdict

    deltas = defaultdict(lambda: defaultdict(int))
    for s, e in intervals:
        for d in range(s // DAY_US, e // DAY_US + 1):
            cs, ce = max(s, d * DAY_US), min(e, (d + 1) * DAY_US - 1)
            deltas[d][cs] += 1
            deltas[d][ce + 1] -= 1
    out = {}
    for d, m in deltas.items():
        run, best, best_t = 0, None, None
        for t in sorted(m):
            run += m[t]
            if best is None or run > best:
                best, best_t = run, t
        out[d] = (best, best_t)
    return out


def _spark_peaks(spark, intervals, **kw):
    from rusty_bloomfilter_spark.operators.sweep import peak_concurrency_by_day

    df = spark.createDataFrame([(int(s), int(e)) for s, e in intervals], "s long, e long")
    return {
        r["day"]: (r["peak_concurrency"], r["peak_at_us"])
        for r in peak_concurrency_by_day(df, "s", "e", **kw).collect()
    }


@pytest.fixture(scope="module")
def rand_intervals():
    rng = np.random.default_rng(53)
    base = 1_700_000_000_000_000  # ~2023-11, realistic epoch micros
    starts = base + rng.integers(0, 5 * DAY_US, size=300)
    lengths = rng.integers(1, 8 * HOUR_US, size=300)
    return [(int(s), int(s + l)) for s, l in zip(starts, lengths)]


def test_matches_bruteforce(spark, rand_intervals):
    got = _spark_peaks(spark, rand_intervals)
    want = brute_peaks(rand_intervals)
    assert got == want


def test_bucket_size_invariance(spark, rand_intervals):
    # the two-level decomposition must be bucket-size-independent
    a = _spark_peaks(spark, rand_intervals, bucket_us=HOUR_US)
    b = _spark_peaks(spark, rand_intervals, bucket_us=DAY_US)
    c = _spark_peaks(spark, rand_intervals, bucket_us=7 * 60 * 1_000_000)
    assert a == b == c


def test_closed_interval_touch_counts_as_overlap(spark):
    base = 50 * DAY_US
    got = _spark_peaks(spark, [(base, base + 10), (base + 10, base + 20)])
    assert got[50] == (2, base + 10)


def test_day_spanning_interval_splits(spark):
    # one interval across three days -> concurrency 1 on each
    s = 100 * DAY_US + 3 * HOUR_US
    e = 102 * DAY_US + 5 * HOUR_US
    got = _spark_peaks(spark, [(s, e)])
    assert got == {
        100: (1, s),
        101: (1, 101 * DAY_US),
        102: (1, 102 * DAY_US),
    }
