"""Sessionization and as-of join vs pandas oracles."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from rusty_bloomfilter_spark.operators.temporal import asof_join, session_stats, sessionize


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.default_rng(21)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in range(25):
        t = base
        for _ in range(rng.integers(3, 40)):
            t = t + dt.timedelta(minutes=int(rng.integers(1, 120)))
            rows.append((uid, t, float(rng.normal())))
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"])


def oracle_sessions(pdf, gap_minutes=30):
    out = {}
    for uid, g in pdf.groupby("user_id"):
        ts = g.sort_values("ts")["ts"]
        gaps = ts.diff().dt.total_seconds()
        new = (gaps.isna() | (gaps > gap_minutes * 60)).astype(int)
        out[uid] = int(new.sum())
    return out


def test_sessionize_matches_oracle(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = {
        r["user_id"]: r["n_sessions"]
        for r in session_stats(df, gap_minutes=30).collect()
    }
    assert got == oracle_sessions(events_pdf, 30)
    # event counts preserved
    s = sessionize(df, gap_minutes=30)
    assert s.count() == len(events_pdf)


def test_asof_join_matches_pandas(spark, events_pdf):
    """Each event picks the latest quote at-or-before its timestamp,
    per user — equals a per-group pd.merge_asof."""
    rng = np.random.default_rng(5)
    base = dt.datetime(2024, 1, 1)
    quotes = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(25), 10),
            "ts": [
                base + dt.timedelta(minutes=int(m))
                for m in rng.integers(0, 3000, 250)
            ],
            "quote": rng.normal(size=250),
        }
    )
    left = spark.createDataFrame(events_pdf)
    right = spark.createDataFrame(quotes)
    got = asof_join(left, right, on="ts", by="user_id").toPandas()

    expect_parts = []
    for uid, lg in events_pdf.groupby("user_id"):
        rg = quotes[quotes.user_id == uid].sort_values("ts").drop(columns=["user_id"])
        expect_parts.append(
            pd.merge_asof(lg.sort_values("ts"), rg, on="ts", direction="backward")
        )
    expect = pd.concat(expect_parts).reset_index(drop=True)

    key = ["user_id", "ts", "value"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = expect.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    q_got = got_s["quote"].to_numpy()
    q_exp = exp_s["quote"].to_numpy()
    both_nan = np.isnan(q_got) & np.isnan(q_exp)
    assert bool((both_nan | np.isclose(q_got, q_exp, equal_nan=False)).all())


def test_asof_join_shared_lineage(spark):
    """Both sides derived from the SAME DataFrame: Spark's cogroup used
    to drop the duplicate-exprId `on` column from the right group
    (KeyError: 'ts'); asof_join re-aliases the right side to mint fresh
    expression ids."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.temporal import asof_join

    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 2],
                "t": [1.0, 2.0, 3.0, 1.0, 5.0],
                "kind": ["a", "b", "a", "b", "a"],
                "v": [10.0, 20.0, 30.0, 40.0, 50.0],
            }
        )
    )
    left = base.filter(F.col("kind") == "a").select("k", "t")
    right = base.filter(F.col("kind") == "b").select("k", "t", "v")
    out = {(r["k"], r["t"]): r["v"] for r in asof_join(left, right, on="t", by="k").collect()}
    assert out == {(1, 1.0): None, (1, 3.0): 20.0, (2, 5.0): 40.0}


def test_range_join_matches_bruteforce(spark):
    """Binned range join == brute-force double loop, including window
    edges landing exactly on bin boundaries."""
    import numpy as np
    import pandas as pd

    from rusty_bloomfilter_spark.operators.temporal import range_join

    rng = np.random.default_rng(9)
    n = 400
    lpdf = pd.DataFrame(
        {
            "lid": np.arange(n),
            "k": rng.integers(0, 5, n),
            "t": np.round(rng.uniform(0, 1000, n), 3),
        }
    )
    rpdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.integers(0, 5, n),
            "t": np.round(rng.uniform(0, 1000, n), 3),
        }
    )
    # boundary rows: exactly lower/upper apart, and on bin multiples
    lpdf.loc[0, ["k", "t"]] = [9, 100.0]
    for i, tv in ((0, 70.0), (1, 100.0), (2, 130.0), (3, 69.999), (4, 130.001)):
        rpdf.loc[i, ["k", "t"]] = [9, tv]
    lo, up = -30.0, 30.0
    out = range_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on="t",
        lower=lo,
        upper=up,
        by="k",
    ).collect()
    got = {(r["lid"], r["rid"]) for r in out}
    want = {
        (lr.lid, rr.rid)
        for lr in lpdf.itertuples()
        for rr in rpdf.itertuples()
        if lr.k == rr.k and lr.t + lo <= rr.t <= lr.t + up
    }
    assert got == want
    assert {(0, 0), (0, 1), (0, 2)} <= got
    assert (0, 3) not in got and (0, 4) not in got
    # each pair exactly once (right row lands in exactly one bin)
    assert len(out) == len(got)


def test_range_join_plans_hash_join_not_nested_loop(spark):
    import contextlib
    import io

    import pandas as pd

    from rusty_bloomfilter_spark.operators.temporal import range_join

    l = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1.0]}))
    r = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1.0], "v": [2.0]}))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(l, r, on="t", lower=-5, upper=5, by="k").explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_equals_plain_join(spark):
    """Salting changes only the shuffle distribution: result multiset
    identical to the plain join (inner and left), hot key included."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.temporal import salted_join

    import numpy as np

    rng = np.random.default_rng(41)
    # 80% of left rows share one hot key
    keys = np.where(rng.random(2000) < 0.8, 7, rng.integers(0, 50, 2000))
    left = spark.createDataFrame(
        pd.DataFrame({"k": keys, "lv": np.arange(2000)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(0, 40), "rv": np.arange(0, 40) * 10})
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(left, right, "k", n_salt=4, how=how).collect())
        )
        want = sorted(map(tuple, left.join(right, "k", how).collect()))
        assert got == want, how
    # salt column never leaks
    assert "_salt" not in salted_join(left, right, "k").columns


# ---------------------------------------------------------------------------
# trailing_day_sum (RANGE-by-day rolling window)
# ---------------------------------------------------------------------------


def test_trailing_day_sum_gap_semantics(spark):
    """The load-bearing difference vs a ROWS frame: day 26 is preceded
    by a 10-day gap, so its 7-day trailing sum must contain ONLY day
    26 — a rows(-2, 0) frame would wrongly pull days 11 and 16 in."""
    from rusty_bloomfilter_spark.operators.temporal import trailing_day_sum
    from datetime import date

    rows = [
        ("a", date(2024, 1, 10), 1.0),
        ("a", date(2024, 1, 11), 2.0),
        ("a", date(2024, 1, 16), 4.0),   # 10 is 6 back (in), 11 is 5 back (in)
        ("a", date(2024, 1, 26), 8.0),   # 10-day gap: window holds 26 alone
        ("b", date(2024, 1, 10), 100.0),  # other key never mixes in
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double").repartition(3)
    got = {
        (r["k"], str(r["day"])): r["t"]
        for r in trailing_day_sum(
            df, "v", key_col="k", date_col="day", days=7, out_col="t"
        ).collect()
    }
    assert got[("a", "2024-01-10")] == 1.0
    assert got[("a", "2024-01-11")] == 3.0
    assert got[("a", "2024-01-16")] == 7.0   # 10 + 11 + 16 (6-day reach)
    assert got[("a", "2024-01-26")] == 8.0   # ROWS(-2,0) would say 14
    assert got[("b", "2024-01-10")] == 100.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="days must be"):
        trailing_day_sum(df, "v", key_col="k", date_col="day", days=0)


def test_debounce_chain_semantics(spark):
    """A within-gap chain keeps only its first event even when the
    chain's tail is far past first+gap; a row exactly AT the gap from
    its predecessor is still part of the chain (strict > opens new)."""
    import datetime as dt

    from rusty_bloomfilter_spark.operators.temporal import debounce

    base = dt.datetime(2024, 1, 1)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: storm at 0,9,18,27 (each within 10m of prev -> one
        # chain although 27 > 0+10), then a fresh event at 50
        (1, "click", 1, m(0)),
        (1, "click", 2, m(9)),
        (1, "click", 3, m(18)),
        (1, "click", 4, m(27)),
        (1, "click", 5, m(50)),
        # boundary: +10m exactly is NOT a new chain (needs strictly >)
        (2, "click", 6, m(0)),
        (2, "click", 7, m(10)),
        (2, "click", 8, m(21)),  # 11m after prev -> new chain
        # type partition: same instants, different type -> independent
        (1, "view", 9, m(0)),
        (1, "view", 10, m(9)),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "event_id", "ts"]
    )
    kept = sorted(
        r["event_id"]
        for r in debounce(
            df, type_col="event_type", gap_minutes=10
        ).collect()
    )
    assert kept == [1, 5, 6, 8, 9]


def test_debounce_tiebreak_total_order(spark):
    """Same-instant duplicates keep exactly the tiebreak-first row."""
    import datetime as dt

    from rusty_bloomfilter_spark.operators.temporal import debounce

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "click", i, t0) for i in (3, 1, 2)],
        ["user_id", "event_type", "event_id", "ts"],
    )
    kept = debounce(
        df, type_col="event_type", gap_minutes=10, tiebreak_cols=["event_id"]
    ).collect()
    assert [r["event_id"] for r in kept] == [1]


def test_debounce_rejects_bad_gap(spark):
    import datetime as dt

    from rusty_bloomfilter_spark.operators.temporal import debounce

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], ["user_id", "event_id", "ts"]
    )
    with pytest.raises(ValueError):
        debounce(df, gap_minutes=0)


# -- gap_fill_locf ----------------------------------------------------------


def test_gap_fill_matches_pandas_ffill(spark):
    import datetime as dt

    import numpy as np
    import pandas as pd

    from rusty_bloomfilter_spark.operators.temporal import gap_fill_locf

    rng = np.random.default_rng(5)
    d0 = dt.date(2024, 2, 1)
    rows = []
    for key in ("a", "b"):
        days = sorted(rng.choice(40, size=12, replace=False))
        for t in days:
            rows.append((key, d0 + dt.timedelta(days=int(t)), float(rng.integers(1, 100))))
    df = spark.createDataFrame(rows, "k string, day date, v double").repartition(4)
    got = (
        gap_fill_locf(df, "k", "day", "v")
        .orderBy("k", "day")
        .toPandas()
    )
    for key in ("a", "b"):
        pdf = pd.DataFrame(
            [(d, v) for k, d, v in rows if k == key], columns=["day", "v"]
        ).set_index("day")
        pdf.index = pd.to_datetime(pdf.index)
        dense = pdf.asfreq("D").ffill()
        sub = got[got.k == key]
        assert len(sub) == len(dense)
        assert np.allclose(sub.v.to_numpy(), dense.v.to_numpy())
        # observed flags mark exactly the original days
        obs_days = {pd.Timestamp(d) for k, d, v in rows if k == key}
        flags = {pd.Timestamp(d): o for d, o in zip(sub.day, sub.is_observed)}
        for d, o in flags.items():
            assert o == (d in obs_days)


def test_gap_fill_age_and_dense_identity(spark):
    import datetime as dt

    from rusty_bloomfilter_spark.operators.temporal import gap_fill_locf

    d0 = dt.date(2024, 2, 1)
    # gap of 3 days: ages run 0,1,2,3 then reset
    rows = [("a", d0, 1.0), ("a", d0 + dt.timedelta(days=4), 2.0)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    got = {r["day"]: r for r in gap_fill_locf(df, "k", "day", "v").collect()}
    assert [got[d0 + dt.timedelta(days=i)]["fill_age_days"] for i in range(5)] == [0, 1, 2, 3, 0]
    assert [got[d0 + dt.timedelta(days=i)]["v"] for i in range(5)] == [1.0, 1.0, 1.0, 1.0, 2.0]
    # dense input is the identity (plus flags/age all observed/0)
    dense_rows = [("b", d0 + dt.timedelta(days=i), float(i)) for i in range(5)]
    dd = spark.createDataFrame(dense_rows, "k string, day date, v double")
    out = gap_fill_locf(dd, "k", "day", "v").orderBy("day").collect()
    assert [r["v"] for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert all(r["is_observed"] and r["fill_age_days"] == 0 for r in out)
    # single-observation key: one row, span of 1
    single = spark.createDataFrame([("c", d0, 9.0)], "k string, day date, v double")
    srow = gap_fill_locf(single, "k", "day", "v").collect()
    assert len(srow) == 1 and srow[0]["v"] == 9.0
