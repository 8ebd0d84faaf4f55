"""Shape math — ports the reference's shape unit tests.

Reference assertions: `/root/reference/src/bloomfilter/mod.rs:459-471`.
"""

import math

import pytest

from rusty_bloomfilter_spark.sketch import Shape


def test_false_positives_pinned_instance():
    # mod.rs:459-463: Shape{m:134191,k:23}, n=4000 -> p ~ 1/9994297
    shape = Shape(m=134191, k=23)
    assert shape.false_positives(4000) == pytest.approx(1.0 / 9994297.0, abs=1e-7)


def test_number_of_buckets():
    # mod.rs:465-471: m=60 -> 1 bucket, m=120 -> 2 buckets
    assert Shape(m=60, k=2).number_of_buckets() == 1
    assert Shape(m=120, k=2).number_of_buckets() == 2
    assert Shape(m=64, k=1).number_of_buckets() == 1
    assert Shape(m=65, k=1).number_of_buckets() == 2


def test_estimate_n_formula():
    # mod.rs:126-132: n_hat = -(m/k)*ln(1 - c/m)
    shape = Shape(m=60, k=2)
    assert shape.estimate_n(0) == 0.0
    assert shape.estimate_n(2) == pytest.approx(-(60 / 2) * math.log(1 - 2 / 60))
    # saturated filter: explicit +inf (deviation: reference would -inf/NaN)
    assert shape.estimate_n(60) == math.inf
    with pytest.raises(ValueError):
        shape.estimate_n(61)


def test_for_np_optimal_sizing():
    # published optimum: m = -n ln p/(ln2)^2, k = (m/n) ln2
    shape = Shape.for_np(n=4000, p=1e-7)
    assert shape.false_positives(4000) <= 1e-7 * 1.05
    # k near the optimum ln(1/p)/ln 2 ~ 23.25
    assert 20 <= shape.k <= 26
    with pytest.raises(ValueError):
        Shape.for_np(0, 0.1)
    with pytest.raises(ValueError):
        Shape.for_np(10, 1.5)


def test_shape_equality_is_correct():
    # the reference's equivalent_to (mod.rs:110-112) is inverted; ours is
    # a correct dataclass equality, and merge rejects mismatched shapes.
    assert Shape(60, 2) == Shape(60, 2)
    assert Shape(60, 2) != Shape(60, 3)
    assert Shape(60, 2) != Shape(61, 2)


def test_is_sparse_corrected_rule():
    # corrected storage-parity rule: sparse iff 4*bits < 8*buckets
    shape = Shape(m=128, k=2)  # 2 buckets = 16 bytes dense
    assert shape.is_sparse(0)
    assert shape.is_sparse(3)
    assert not shape.is_sparse(4)  # 16 bytes sparse == 16 dense -> dense
    assert not shape.is_sparse(100)


def test_invalid_shapes():
    with pytest.raises(ValueError):
        Shape(m=0, k=1)
    with pytest.raises(ValueError):
        Shape(m=10, k=0)
