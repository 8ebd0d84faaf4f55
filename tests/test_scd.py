"""SCD2 history operators against hand-computed truth: run compression
(null-safe change detection, first-row-opens-version even with NULL
attrs, tie-broken same-instant changes), timeline tiling (half-open,
gap-free, overlap-free), and MERGE semantics (close+open on change,
insert on new key, retain-or-close on missing key), plus guards."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.scd import scd2_apply, scd2_compress

T0 = datetime(2024, 3, 1, 0, 0, 0)


def _t(h):
    return T0 + timedelta(hours=h)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # u1: a,a,b,b,a -> versions a[0,2) b[2,4) a[4,None)
        (1, _t(0), "a", 10),
        (1, _t(1), "a", 11),
        (1, _t(2), "b", 12),
        (1, _t(3), "b", 13),
        (1, _t(4), "a", 14),
        # u2: NULL first row opens v1; NULL->NULL no change; NULL->x change
        (2, _t(0), None, 20),
        (2, _t(1), None, 21),
        (2, _t(2), "x", 22),
        # u3: same-instant change tie-broken by seq (22 then 23)
        (3, _t(0), "p", 30),
        (3, _t(5), "q", 31),
        (3, _t(5), "r", 32),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, status string, seq bigint"
    ).repartition(3)


@pytest.fixture(scope="module")
def history(changelog):
    return scd2_compress(
        changelog,
        key_col="user_id",
        attr_cols=["status"],
        ts_col="ts",
        tiebreak_cols=["seq"],
    ).cache()


def _by_key(history):
    rows = history.collect()
    out = {}
    for r in rows:
        out.setdefault(r["user_id"], []).append(r)
    for k in out:
        out[k].sort(key=lambda r: r["version"])
    return out


def test_run_compression_hand_computed(history):
    h = _by_key(history)
    u1 = [(r["status"], r["valid_from"], r["valid_to"], r["n_rows"]) for r in h[1]]
    assert u1 == [
        ("a", _t(0), _t(2), 2),
        ("b", _t(2), _t(4), 2),
        ("a", _t(4), None, 1),
    ]
    # NULL attr opens version 1; NULL->NULL collapses; NULL->x opens v2
    u2 = [(r["status"], r["n_rows"], r["is_current"]) for r in h[2]]
    assert u2 == [(None, 2, False), ("x", 1, True)]
    # same-instant rows ordered by the tiebreak: p -> q -> r
    u3 = [r["status"] for r in h[3]]
    assert u3 == ["p", "q", "r"]
    assert [r["version"] for r in h[3]] == [1, 2, 3]


def test_timeline_tiles(history):
    for rows in _by_key(history).values():
        assert rows[0]["version"] == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # no gap, no overlap
            assert not prev["is_current"]


def test_compress_guards(changelog):
    with pytest.raises(ValueError, match="at least one"):
        scd2_compress(changelog, key_col="user_id", attr_cols=[], ts_col="ts")
    with pytest.raises(ValueError, match="overlap"):
        scd2_compress(
            changelog, key_col="user_id", attr_cols=["ts"], ts_col="ts"
        )


SNAP_TS = _t(100)


@pytest.fixture(scope="module")
def merged(spark, history):
    snap = spark.createDataFrame(
        [
            (1, "a"),   # unchanged -> retain open
            (2, "y"),   # changed -> close at SNAP_TS, open v3
            (9, "new"),  # new key -> open v1
            # u3 absent -> retained open (close_missing=False)
        ],
        "user_id bigint, status string",
    )
    return scd2_apply(
        history,
        snap,
        key_col="user_id",
        attr_cols=["status"],
        snapshot_ts=SNAP_TS,
    ).cache()


def test_merge_hand_computed(merged):
    h = _by_key(merged)
    # u1 untouched: same 3 rows, v3 still open
    assert [r["is_current"] for r in h[1]] == [False, False, True]
    assert h[1][-1]["valid_to"] is None
    # u2: v2 closed at SNAP_TS, v3 opened there with the new value
    assert [(r["status"], r["is_current"]) for r in h[2]] == [
        (None, False),
        ("x", False),
        ("y", True),
    ]
    assert h[2][1]["valid_to"] == SNAP_TS
    assert h[2][2]["valid_from"] == SNAP_TS and h[2][2]["version"] == 3
    # u9 brand new: version 1 open at SNAP_TS
    assert [(r["version"], r["status"], r["valid_from"], r["valid_to"])
            for r in h[9]] == [(1, "new", SNAP_TS, None)]
    # u3 missing from snapshot: retained open, untouched
    assert h[3][-1]["is_current"] and len(h[3]) == 3


def test_merge_close_missing(spark, history):
    snap = spark.createDataFrame([(1, "a")], "user_id bigint, status string")
    out = scd2_apply(
        history,
        snap,
        key_col="user_id",
        attr_cols=["status"],
        snapshot_ts=SNAP_TS,
        close_missing=True,
    )
    h = _by_key(out)
    # u2/u3 absent from the full snapshot: latest row closed, no successor
    for k in (2, 3):
        assert all(not r["is_current"] for r in h[k])
        assert h[k][-1]["valid_to"] == SNAP_TS
    assert h[1][-1]["is_current"]


def test_merge_guard_missing_history_cols(spark, history):
    snap = spark.createDataFrame([(1, "a")], "user_id bigint, status string")
    with pytest.raises(ValueError, match="missing required column"):
        scd2_apply(
            history.drop("is_current"),
            snap,
            key_col="user_id",
            attr_cols=["status"],
            snapshot_ts=SNAP_TS,
        )


def test_compress_single_exchange(changelog):
    """The compress plan hash-partitions by key exactly once: every
    window + the (key, version) group-by reuse one Exchange."""
    import io
    from contextlib import redirect_stdout

    # NB: parameters deliberately differ from the cached `history`
    # fixture's — an identical plan would be substituted by the cache
    # manager with an InMemoryTableScan and show zero exchanges
    fresh = scd2_compress(
        changelog,
        key_col="user_id",
        attr_cols=["status"],
        ts_col="ts",
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        fresh.explain("formatted")
    plan = buf.getvalue()
    n_exchanges = plan.count("Arguments: hashpartitioning(")
    assert n_exchanges == 1, plan
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan
