"""One-scan data-quality validation (operators/validate.py)."""

import pytest

from rusty_bloomfilter_spark.operators.validate import (
    ApproxNdvRange,
    ApproxUniqueness,
    Completeness,
    RowCount,
    ValueRange,
    validate_table,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, float(i) * 2.5, "x" if i % 4 else None, i % 3) for i in range(200)]
    return spark.createDataFrame(
        rows, "id bigint, score double, tag string, label bigint"
    )


def test_exact_checks_pass_and_fail(frame):
    res = validate_table(
        frame,
        [
            RowCount(lo=100, hi=1000),
            RowCount(lo=1000),                 # fails: only 200 rows
            Completeness("id"),                # 1.0 -> pass
            Completeness("tag", 0.9),          # 0.75 -> fail
            Completeness("tag", 0.5),          # 0.75 -> pass
            ValueRange("score", lo=0.0, hi=500.0),
            ValueRange("score", hi=100.0),     # max 497.5 -> fail
        ],
    )
    by = [(r.check, r.column, r.passed, r.exact) for r in res]
    assert by == [
        ("row_count", "", True, True),
        ("row_count", "", False, True),
        ("completeness", "id", True, True),
        ("completeness", "tag", False, True),
        ("completeness", "tag", True, True),
        ("value_min", "score", True, True),
        ("value_max", "score", True, True),
        ("value_max", "score", False, True),
    ]
    obs = {(r.check, r.column, r.lo, r.hi): r.observed for r in res}
    assert obs[("completeness", "tag", 0.9, None)] == pytest.approx(0.75)
    assert obs[("value_max", "score", None, 100.0)] == pytest.approx(497.5)


def test_approx_checks_are_bound_aware(frame):
    res = validate_table(
        frame,
        [
            ApproxUniqueness("id", min_ratio=1.0),   # unique -> pass
            ApproxUniqueness("label", min_ratio=0.5),  # ndv 3 / 200 -> fail
            ApproxNdvRange("label", lo=1, hi=10),    # ndv 3 -> pass
            ApproxNdvRange("label", lo=50, hi=100),  # ndv 3 -> fail
        ],
    )
    assert [r.passed for r in res] == [True, False, True, False]
    assert all(not r.exact for r in res)
    # observed uniqueness carries the estimate, near 1.0 for a key column
    assert res[0].observed == pytest.approx(1.0, rel=0.05)


def test_validate_errors(frame):
    with pytest.raises(KeyError):
        validate_table(frame, [Completeness("nope")])
    with pytest.raises(ValueError):
        validate_table(frame, [ValueRange("score")])  # no bounds declared
    all_null = frame.sparkSession.createDataFrame(
        [(None,), (None,)], "v double"
    )
    with pytest.raises(ValueError):
        validate_table(all_null, [ValueRange("v", lo=0.0)])


def test_rowcount_only_suite(frame):
    res = validate_table(frame, [RowCount(lo=1)])
    assert len(res) == 1 and res[0].passed and res[0].observed == 200.0


def test_rowcount_only_on_unprofileable_schema(spark):
    # RowCount-only suites must not profile (first column may be a
    # type profile_table doesn't handle)
    arr = spark.createDataFrame([([1, 2],), ([3],)], "tokens array<bigint>")
    res = validate_table(arr, [RowCount(lo=1, hi=10)])
    assert len(res) == 1 and res[0].passed and res[0].observed == 2.0
