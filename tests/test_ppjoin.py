"""Prefix-filtered Jaccard join vs a python brute-force oracle: the
completeness guarantee (EVERY pair >= tau, zero false negatives) on a
random corpus with planted near-dups, tau=1 exact-set degeneration,
set semantics, empty-set hygiene, guards, and a no-cartesian plan."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.ppjoin import jaccard_similarity_join


def _brute(rows, tau):
    out = {}
    sets = {i: set(ts) for i, ts in rows if ts}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter / uni >= tau:
                out[(a, b)] = (inter, uni, inter / uni)
    return out


def _run(spark, rows, tau):
    df = spark.createDataFrame(rows, "id bigint, ts array<bigint>").repartition(6)
    got = jaccard_similarity_join(df, "id", "ts", tau).collect()
    return {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"], r["jaccard"])
        for r in got
    }


def _corpus(seed, n_docs=50, vocab=300, planted=8):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        k = int(rng.integers(5, 40))
        rows.append((i, sorted(int(t) for t in rng.choice(vocab, k, replace=False))))
    # planted near-dups: copy with a few mutations
    for j in range(planted):
        src = rows[j][1]
        mut = list(src)
        for _ in range(max(1, len(mut) // 10)):
            mut[int(rng.integers(len(mut)))] = int(rng.integers(vocab, vocab + 50))
        rows.append((n_docs + j, sorted(set(mut))))
    return rows


@pytest.mark.parametrize("tau", [0.4, 0.7, 0.9])
def test_complete_and_exact_vs_bruteforce(spark, tau):
    rows = _corpus(seed=17)
    want = _brute(rows, tau)
    got = _run(spark, rows, tau)
    assert set(got) == set(want)  # completeness AND soundness
    for k, (i, u, j) in want.items():
        gi, gu, gj = got[k]
        assert (gi, gu) == (i, u)
        assert gj == pytest.approx(j, abs=1e-12)


def test_tau_one_finds_only_identical_sets(spark):
    rows = [(1, [5, 6, 7]), (2, [7, 6, 5]), (3, [5, 6, 7, 8]), (4, [9])]
    got = _run(spark, rows, 1.0)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == (3, 3, 1.0)


def test_duplicate_tokens_collapse(spark):
    rows = [(1, [5, 5, 6, 6, 7]), (2, [5, 6, 7])]
    got = _run(spark, rows, 0.9)
    assert got[(1, 2)] == (3, 3, 1.0)


def test_empty_and_null_sets_never_pair(spark):
    rows = [(1, [1, 2]), (2, []), (3, [1, 2])]
    got = _run(spark, rows, 0.1)
    assert set(got) == {(1, 3)}


def test_tau_guard(spark):
    df = spark.createDataFrame([(1, [1])], "id bigint, ts array<bigint>")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            jaccard_similarity_join(df, "id", "ts", bad)


def test_no_cartesian_in_plan(spark):
    rows = _corpus(seed=3, n_docs=20, planted=2)
    df = spark.createDataFrame(rows, "id bigint, ts array<bigint>")
    out = jaccard_similarity_join(df, "id", "ts", 0.8)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    phys = buf.getvalue()
    assert "CartesianProduct" not in phys, phys
    assert "BroadcastNestedLoopJoin" not in phys, phys


def test_lsh_recall_audit_gates(spark):
    # the contract audit's in-row gates must hold at the smoke SF too
    from rusty_bloomfilter_spark import contract

    row = contract.q_lsh_recall_audit(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["recall_ok"] is True
    assert row["err_ok"] is True
    assert row["n_lsh_true"] <= row["n_lsh"]
    assert row["hits_hi"] <= row["n_exact_hi"] <= row["n_exact"]


def _brute_containment(rows, tau):
    out = {}
    sets = {i: set(ts) for i, ts in rows if ts}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if len(sets[a]) and inter / len(sets[a]) >= tau:
                out[(a, b)] = (inter, len(sets[a]), inter / len(sets[a]))
    return out


def _run_containment(spark, rows, tau):
    from rusty_bloomfilter_spark.operators.ppjoin import containment_join

    df = spark.createDataFrame(rows, "id bigint, ts array<bigint>").repartition(6)
    got = containment_join(df, "id", "ts", tau).collect()
    return {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["size_a"], r["containment"])
        for r in got
    }


@pytest.mark.parametrize("tau", [0.5, 0.8, 1.0])
def test_containment_complete_vs_bruteforce(spark, tau):
    rows = _corpus(seed=23)
    want = _brute_containment(rows, tau)
    got = _run_containment(spark, rows, tau)
    assert set(got) == set(want)
    for k, (i, na, c) in want.items():
        gi, gna, gc = got[k]
        assert (gi, gna) == (i, na)
        assert gc == pytest.approx(c, abs=1e-12)


def test_containment_is_directed(spark):
    # excerpt (subset) -> containment 1 one way, fractional the other
    rows = [(1, [5, 6, 7]), (2, [5, 6, 7, 8, 9, 10])]
    got = _run_containment(spark, rows, 0.9)
    assert got == {(1, 2): (3, 3, 1.0)}  # 2->1 is 3/6 = 0.5, absent
    loose = _run_containment(spark, rows, 0.5)
    assert (2, 1) in loose and loose[(2, 1)][2] == pytest.approx(0.5)


def test_containment_no_length_upper_bound(spark):
    # a 2-token doc inside a 100-token doc: Jaccard ~0.02, containment 1
    big = list(range(100))
    rows = [(1, [3, 4]), (2, big)]
    got = _run_containment(spark, rows, 1.0)
    assert got == {(1, 2): (2, 2, 1.0)}


def test_containment_tau_guard(spark):
    from rusty_bloomfilter_spark.operators.ppjoin import containment_join

    df = spark.createDataFrame([(1, [1])], "id bigint, ts array<bigint>")
    with pytest.raises(ValueError):
        containment_join(df, "id", "ts", 0.0)
