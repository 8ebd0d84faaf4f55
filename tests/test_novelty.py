"""novelty_curve (operators/novelty.py): planted novelty schedule,
prefix-union semantics, determinism across partitionings, and error
bounds at HLL precision."""

import pytest
from pyspark.sql import functions as F


def _events(spark, schedule, parts=1):
    """schedule: {period: [keys]} -> df(period string, key bigint)."""
    rows = [(p, k) for p, keys in schedule.items() for k in keys]
    df = spark.createDataFrame(rows, "period string, key long")
    return df.repartition(parts)


def test_planted_schedule_small_counts_near_exact(spark):
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    # d1: 10 new; d2: 5 repeat + 7 new; d3: all repeats
    schedule = {
        "d1": list(range(10)),
        "d2": list(range(5)) + list(range(100, 107)),
        "d3": list(range(10)) + list(range(100, 107)),
    }
    out = {r.period: r for r in novelty_curve(_events(spark, schedule), "period", "key").collect()}
    assert list(out) == ["d1", "d2", "d3"]
    # p=14 linear counting at tiny fill: collisions are possible but
    # astronomically unlikely for < 20 keys in 16384 registers
    assert out["d1"].est_period == pytest.approx(10, abs=0.1)
    assert out["d1"].est_new == pytest.approx(10, abs=0.1)
    assert out["d2"].est_new == pytest.approx(7, abs=0.2)
    assert out["d3"].est_new == pytest.approx(0, abs=0.2)
    assert out["d3"].est_cumulative == pytest.approx(17, abs=0.3)


def test_prefix_is_union_sketch_not_sum(spark):
    """Heavy overlap between periods: cumulative tracks the UNION, so
    est_new is far below est_period for repeat-heavy periods."""
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    schedule = {
        "d1": list(range(3000)),
        "d2": list(range(3000)),  # pure repeats
    }
    out = {r.period: r for r in novelty_curve(_events(spark, schedule, parts=5), "period", "key").collect()}
    rel = 3 * 1.04 / (1 << 14) ** 0.5
    assert abs(out["d2"].est_cumulative - 3000) / 3000 < rel
    # novelty of a pure-repeat period is 0 exactly: identical register
    # states make the forward difference literally zero
    assert out["d2"].est_new == 0.0


def test_partition_invariance(spark):
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    schedule = {f"d{i}": list(range(i * 50, i * 50 + 400)) for i in range(1, 6)}
    a = novelty_curve(_events(spark, schedule, parts=2), "period", "key").collect()
    b = novelty_curve(_events(spark, schedule, parts=11), "period", "key").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_accuracy_at_scale_within_bound(spark):
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    # 3 periods, each adds 4000 new on top of 2000 repeats
    schedule = {
        "d1": list(range(6000)),
        "d2": list(range(4000, 14000)),
        "d3": list(range(12000, 22000)),
    }
    out = {r.period: r for r in novelty_curve(_events(spark, schedule, parts=7), "period", "key").collect()}
    rel = 3 * 1.04 / (1 << 14) ** 0.5
    truth_cum = {"d1": 6000, "d2": 14000, "d3": 22000}
    for d, t in truth_cum.items():
        assert abs(out[d].est_cumulative - t) / t < rel
    # est_new inherits ABSOLUTE error of the prefix (documented):
    # bound it by rel * prefix size, with slack for the difference
    for d, t, prev in (("d2", 8000, 6000), ("d3", 8000, 14000)):
        assert abs(out[d].est_new - t) < 2 * rel * (t + prev)


def test_empty_input_yields_empty_curve(spark):
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    df = spark.createDataFrame([], "period string, key long")
    assert novelty_curve(df, "period", "key").count() == 0


def test_null_periods_dropped(spark):
    from rusty_bloomfilter_spark.operators.novelty import novelty_curve

    rows = [("d1", 1), (None, 2), ("d2", 3)]
    df = spark.createDataFrame(rows, "period string, key long")
    out = novelty_curve(df, "period", "key").collect()
    assert [r.period for r in out] == ["d1", "d2"]
