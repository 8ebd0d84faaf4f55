"""Co-occurrence support/confidence/lift vs a pandas oracle."""

import itertools

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.operators.assoc import cooccurrence_lift


@pytest.fixture(scope="module")
def basket_pdf():
    """25 users x random item subsets, plus a bot user whose single
    (user, item) pair repeats 500 times — multiplicity must not count."""
    rng = np.random.default_rng(11)
    items = ["a", "b", "c", "d", "e"]
    rows = []
    for uid in range(25):
        for it in rng.choice(items, size=int(rng.integers(1, 5)), replace=False):
            for _ in range(int(rng.integers(1, 4))):
                rows.append((uid, str(it)))
    rows += [(99, "a")] * 500 + [(99, "b")] * 3
    return pd.DataFrame(rows, columns=["user_id", "event_type"])


def oracle_lift(pdf, min_users):
    sets = pdf.groupby("user_id")["event_type"].agg(set)
    n_keys = len(sets)
    per_item = {}
    for s in sets:
        for it in s:
            per_item[it] = per_item.get(it, 0) + 1
    both = {}
    for s in sets:
        for a, b in itertools.permutations(sorted(s), 2):
            both[(a, b)] = both.get((a, b), 0) + 1
    out = {}
    for (a, b), n in both.items():
        if n < min_users:
            continue
        out[(a, b)] = (
            n,
            per_item[a],
            per_item[b],
            n_keys,
            n / n_keys,
            n / per_item[a],
            n * n_keys / (per_item[a] * per_item[b]),
        )
    return out


def test_cooccurrence_matches_pandas(spark, basket_pdf):
    df = spark.createDataFrame(basket_pdf)
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_both"],
            r["n_a"],
            r["n_b"],
            r["n_keys"],
            r["support"],
            r["confidence"],
            r["lift"],
        )
        for r in cooccurrence_lift(df, min_users=2).collect()
    }
    want = oracle_lift(basket_pdf, 2)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:4] == w[:4], k
        assert g[4:] == pytest.approx(w[4:]), k


def test_cooccurrence_multiplicity_and_direction(spark):
    """Repeated events count once per user; confidence is directional
    (a->b != b->a when marginals differ); min_users filters pairs."""
    rows = (
        [(1, "a")] * 10
        + [(1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "a"), (4, "c")]
    )
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, min_users=2).collect()
    }
    # only the (a,b)/(b,a) pair reaches 2 users; (a,c) has 1
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    ba = out[("b", "a")]
    assert ab["n_both"] == ba["n_both"] == 2
    assert ab["n_a"] == 4 and ab["n_b"] == 2 and ab["n_keys"] == 4
    assert ab["confidence"] == pytest.approx(0.5)
    assert ba["confidence"] == pytest.approx(1.0)
    # lift symmetric: 2*4/(4*2) = 1.0
    assert ab["lift"] == pytest.approx(1.0) == ba["lift"]
    with pytest.raises(ValueError):
        cooccurrence_lift(df, min_users=0)


def test_cooccurrence_single_events_shuffle(spark):
    """Plan gate: the corpus aggregates once (persisted distinct) and
    the marginal joins broadcast — no events-sized join shuffle."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], ["user_id", "event_type"]
    )
    out = cooccurrence_lift(df, min_users=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("SortMergeJoin") <= 1, plan
