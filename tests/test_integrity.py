"""FK audit against hand-computed truth: planted orphans, NULL-FK
exclusion, coverage math, multi-relationship report, and guards."""

import pytest

from rusty_bloomfilter_spark.operators.integrity import fk_audit


def _run(spark, rels):
    return {r["relationship"]: r.asDict() for r in fk_audit(rels).collect()}


def test_planted_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, 99), (7, None)],
        "id bigint, fk bigint",
    ).repartition(3)
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
    out = _run(spark, [("r", child, "fk", parent, "pk")])["r"]
    assert out["n_child_rows"] == 7
    assert out["n_null_fk"] == 1  # NULL FK is unset, not an orphan
    assert out["n_child_keys"] == 3  # 10, 20, 99
    assert out["n_orphan_keys"] == 1  # 99
    assert out["n_orphan_rows"] == 3
    assert out["orphan_row_rate"] == pytest.approx(3 / 6, abs=1e-9)
    assert out["n_parent_keys"] == 3
    # 10 and 20 referenced of 3 parents
    assert out["parent_coverage"] == pytest.approx(2 / 3, abs=1e-6)


def test_clean_relationship_all_zero(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    out = _run(spark, [("ok", child, "fk", parent, "pk")])["ok"]
    assert out["n_orphan_keys"] == 0 and out["n_orphan_rows"] == 0
    assert out["orphan_row_rate"] == 0.0
    assert out["parent_coverage"] == 1.0


def test_null_parent_keys_excluded_from_denominator(spark):
    child = spark.createDataFrame([(1, 10)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,), (None,), (None,)], "pk bigint")
    out = _run(spark, [("p", child, "fk", parent, "pk")])["p"]
    assert out["n_parent_keys"] == 1
    assert out["parent_coverage"] == 1.0


def test_all_null_children(spark):
    child = spark.createDataFrame([(1, None), (2, None)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,)], "pk bigint")
    out = _run(spark, [("n", child, "fk", parent, "pk")])["n"]
    assert out["n_child_keys"] == 0 and out["n_orphan_rows"] == 0
    assert out["orphan_row_rate"] == 0.0  # guarded denominator


def test_multi_relationship_report_and_guards(spark):
    c = spark.createDataFrame([(1, 10)], "id bigint, fk bigint")
    p = spark.createDataFrame([(10,)], "pk bigint")
    got = _run(spark, [("a", c, "fk", p, "pk"), ("b", c, "fk", p, "pk")])
    assert set(got) == {"a", "b"}
    with pytest.raises(ValueError):
        fk_audit([])
    with pytest.raises(ValueError):
        fk_audit([("x", c, "fk", p, "pk"), ("x", c, "fk", p, "pk")])


# -- fd_audit ---------------------------------------------------------------


def test_fd_audit_confirms_and_violates(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.integrity import fd_audit

    rows = [
        (1, "x", 10),
        (2, "x", 10),
        (3, "y", 20),
        (3, "y", 20),   # duplicate row: still one dep value per det
        (4, "y", 21),
        (4, "y", 22),   # det 4 maps to two deps: violation
    ]
    df = spark.createDataFrame(rows, "a int, b string, c int")
    got = {r["rule"]: r for r in fd_audit(df, [("a", "c"), ("b", "c"), ("c", "b")]).collect()}
    r = got["a -> c"]
    assert not r["is_fd"] and r["n_violating_dets"] == 1 and r["max_fanout"] == 2
    assert r["n_det_values"] == 4
    rb = got["b -> c"]  # x->10, y->{20,21,22}
    assert not rb["is_fd"] and rb["max_fanout"] == 3
    rc = got["c -> b"]  # 10->x, 20/21/22->y: a confirmed FD
    assert rc["is_fd"] and rc["max_fanout"] == 1


def test_fd_audit_null_semantics_and_guard(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.integrity import fd_audit

    rows = [(1, "x"), (1, None), (None, "z")]
    df = spark.createDataFrame(rows, "a int, b string")
    got = fd_audit(df, [("a", "b")]).collect()[0]
    # NULL det excluded; det 1 maps to {x, NULL} = 2 values (NULL dep counts)
    assert got["n_det_values"] == 1
    assert got["max_fanout"] == 2 and not got["is_fd"]
    with pytest.raises(ValueError, match="non-empty"):
        fd_audit(df, [])


def test_fd_audit_all_null_det_vacuous_true(spark):
    # review fix: zero determinants -> 0 violations, vacuously-true FD,
    # never a NULL verdict a boolean filter silently drops
    from rusty_bloomfilter_spark.operators.integrity import fd_audit

    df = spark.createDataFrame([(None, "x"), (None, "y")], "a string, b string")
    got = fd_audit(df, [("a", "b")]).collect()[0]
    assert got["n_det_values"] == 0
    assert got["n_violating_dets"] == 0 and got["max_fanout"] == 0
    assert got["is_fd"] is True


def test_erasure_manifest_counts_and_nulls(spark):
    import pytest

    from rusty_bloomfilter_spark.operators.integrity import erasure_manifest

    subjects = spark.createDataFrame([(1,), (3,)], "subject long")
    rows = [(1, "x"), (1, "y"), (2, "z"), (None, "w")]
    t = spark.createDataFrame(rows, "uid long, v string")
    out = erasure_manifest(subjects, [("t", t, "uid")]).collect()[0]
    assert out["n_rows_total"] == 4
    assert out["n_rows_affected"] == 2         # both uid=1 rows
    assert out["n_subjects_present"] == 1      # subject 3 absent
    assert out["frac_rows"] == pytest.approx(0.5)
    # empty table: zeros, never NULL
    empty = spark.createDataFrame([], "uid long, v string")
    z = erasure_manifest(subjects, [("e", empty, "uid")]).collect()[0]
    assert z["n_rows_affected"] == 0 and z["n_subjects_present"] == 0
    with pytest.raises(ValueError, match="non-empty"):
        erasure_manifest(subjects, [])
