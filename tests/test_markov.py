"""Transition-matrix operator against hand-computed truth: counts,
row-normalized probabilities, last-event-emits-nothing, max-gap session
breaks, same-instant tiebreaks, and guards."""

from datetime import datetime, timedelta

import pytest

from rusty_bloomfilter_spark.operators.markov import transition_matrix

T0 = datetime(2024, 3, 1, 0, 0, 0)


def _t(m):
    return T0 + timedelta(minutes=m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: a->b->a->a (gaps 5m each)
        (1, _t(0), "a", 1),
        (1, _t(5), "b", 2),
        (1, _t(10), "a", 3),
        (1, _t(15), "a", 4),
        # u2: a ->(90m gap)-> b->c : a->b broken by max_gap=30
        (2, _t(0), "a", 5),
        (2, _t(90), "b", 6),
        (2, _t(95), "c", 7),
        # u3: same-instant pair ordered by seq: b(8) then a(9) -> b->a
        (3, _t(0), "b", 8),
        (3, _t(0), "a", 9),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, seq bigint"
    ).repartition(3)


def _matrix(df):
    return {
        (r["src_state"], r["dst_state"]): (r["n"], r["prob"])
        for r in df.collect()
    }


def test_counts_and_probs(events):
    m = _matrix(
        transition_matrix(events, tiebreak_cols=["seq"], state_col="event_type")
    )
    # all transitions (no gap limit): u1 a->b,b->a,a->a; u2 a->b,b->c; u3 b->a
    assert m[("a", "b")][0] == 2
    assert m[("a", "a")][0] == 1
    assert m[("b", "a")][0] == 2
    assert m[("b", "c")][0] == 1
    # rows normalize to 1
    assert m[("a", "b")][1] == pytest.approx(2 / 3)
    assert m[("a", "a")][1] == pytest.approx(1 / 3)
    assert m[("b", "a")][1] == pytest.approx(2 / 3)
    assert m[("b", "c")][1] == pytest.approx(1 / 3)
    assert len(m) == 4


def test_max_gap_breaks_session(events):
    m = _matrix(
        transition_matrix(events, tiebreak_cols=["seq"], max_gap_minutes=30)
    )
    # u2's a ->(90m)-> b is a session break, not a transition
    assert m[("a", "b")][0] == 1
    assert ("b", "c") in m  # 5m gap survives
    assert m[("a", "b")][1] == pytest.approx(0.5)


def test_guard(events):
    with pytest.raises(ValueError, match="positive"):
        transition_matrix(events, max_gap_minutes=0)


def test_single_exchange(events):
    """One hash partition by key; the matrix group-by aggregates
    map-side and shuffles only |states|^2 rows."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        transition_matrix(events, tiebreak_cols=["seq"]).explain("formatted")
    plan = buf.getvalue()
    # exactly one events-sized exchange (user_id); the matrix-sized
    # (src,dst) exchange is unavoidable and tiny
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan
