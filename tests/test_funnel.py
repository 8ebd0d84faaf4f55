"""Ordered-funnel semantics against hand-computed truth: order
enforcement (a click BEFORE the first view does not count), same-instant
reach, conversion-window exclusion, skipped-middle-step users, summary
monotonicity, and the single-Exchange plan shape."""

import contextlib
import io
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.funnel import funnel, funnel_users

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, minutes, typ):
    return (uid, T0 + timedelta(minutes=minutes), typ)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: clean view -> click -> purchase
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 10, "purchase"),
        # u2: click BEFORE any view — reaches view only
        _ev(2, 0, "click"), _ev(2, 5, "view"),
        # u3: view and click at the SAME instant — same-instant counts
        _ev(3, 0, "view"), _ev(3, 0, "click"),
        # u4: skips click — purchase after view must NOT count step 3
        _ev(4, 0, "view"), _ev(4, 9, "purchase"),
        # u5: full funnel but the click lands outside a 30-min window
        _ev(5, 0, "view"), _ev(5, 45, "click"), _ev(5, 50, "purchase"),
        # u6: no funnel events at all (filtered before the shuffle)
        _ev(6, 0, "signup"),
        # u7: several views; funnel anchors at the FIRST one
        _ev(7, 10, "view"), _ev(7, 0, "view"), _ev(7, 5, "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    ).repartition(3)


def test_reach_times_match_hand_truth(spark, events):
    got = {
        r["user_id"]: (r["t0"], r["t1"], r["t2"])
        for r in funnel_users(events, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 7}  # u6 never enters the funnel
    m = lambda mins: T0 + timedelta(minutes=mins)  # noqa: E731
    assert got[1] == (m(0), m(5), m(10))
    assert got[2] == (m(5), None, None)   # pre-view click ignored
    assert got[3] == (m(0), m(0), None)   # same instant reaches
    assert got[4] == (m(0), None, None)   # skipped middle blocks step 3
    assert got[7] == (m(0), m(5), None)   # anchored at FIRST view


def test_summary_counts_and_conversion(spark, events):
    rows = {r["step"]: r for r in funnel(events, ["view", "click", "purchase"]).collect()}
    assert [rows[i]["n_users"] for i in (1, 2, 3)] == [6, 4, 2]
    assert rows[2]["conv"] == pytest.approx(4 / 6, abs=1e-6)
    assert rows[3]["conv"] == pytest.approx(2 / 6, abs=1e-6)
    assert rows[1]["step_name"] == "view"


def test_within_window_excludes_late_steps(spark, events):
    rows = {
        r["step"]: r["n_users"]
        for r in funnel(
            events, ["view", "click", "purchase"], within_seconds=30 * 60
        ).collect()
    }
    # u5's click at +45min falls out; u1/u3/u7 clicks remain
    assert rows[1] == 6 and rows[2] == 3 and rows[3] == 1
    # boundary is INCLUSIVE: a click exactly at +30min counts
    edge = spark.createDataFrame(
        [_ev(9, 0, "view"), _ev(9, 30, "click")],
        "user_id bigint, ts timestamp, event_type string",
    )
    got = funnel_users(edge, ["view", "click"], within_seconds=30 * 60).collect()[0]
    assert got["t1"] is not None


def test_guards(spark, events):
    with pytest.raises(ValueError, match="at least two"):
        funnel(events, ["view"])
    with pytest.raises(ValueError, match="duplicate"):
        funnel(events, ["view", "view"])
    with pytest.raises(ValueError, match="positive"):
        funnel(events, ["view", "click"], within_seconds=0)
    with pytest.raises(ValueError, match="quotes"):
        funnel(events, ["view", "cl'ick"])


def test_single_data_exchange_plan(spark, events):
    """The scale claim: one hash-partition by user carries the whole
    window chain AND the per-user aggregate; only the one-row summary
    re-exchanges. The funnel-type filter reaches the scan."""
    out = funnel(events, ["view", "click", "purchase"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # exactly ONE hash-partition by user feeds windows + per-user agg
    # (the fixture's own repartition(3) and the one-row summary's
    # SinglePartition exchange are the only others)
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert plan.count("Window") >= 3


def test_four_step_funnel_monotone(spark, events):
    rows = funnel(events, ["view", "click", "purchase", "signup"]).orderBy("step").collect()
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[3] == 0  # nobody signs up after purchasing here
