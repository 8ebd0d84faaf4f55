"""Join advisor: fused side profiles, strategy decision precedence,
CMS inner-product sizing bound, plan-shape gates (BroadcastHashJoin
present exactly when advised), and result equality across strategies."""

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.advisor import (
    JoinAdvice,
    advise_join,
    execute_join,
    profile_join_side,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fact_df(spark):
    """200k rows, key 7 hot (60%), the rest over 3000 cold keys."""
    rng = np.random.default_rng(41)
    n = 200_000
    hot = np.full(int(n * 0.6), 7, dtype=np.int64)
    cold = rng.integers(100, 3100, size=n - hot.size, dtype=np.int64)
    keys = np.concatenate([hot, cold])
    rng.shuffle(keys)
    return spark.createDataFrame(
        [(int(k), i) for i, k in enumerate(keys)], "k bigint, fact_id bigint"
    ).repartition(6)


@pytest.fixture(scope="module")
def dim_df(spark):
    return spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(0, 3100)], "k bigint, label string"
    )


def test_small_dim_gets_broadcast(spark, fact_df, dim_df):
    pf = profile_join_side(fact_df, "k")
    pd_ = profile_join_side(dim_df, "k")
    assert pf.n_rows == 200_000 and pd_.n_rows == 3100
    adv = advise_join(pf, pd_, broadcast_rows=10_000)
    assert adv.strategy == "broadcast_right"
    joined = execute_join(fact_df, dim_df, "k", adv)
    assert "BroadcastHashJoin" in plan_of(joined)
    assert joined.count() == fact_df.join(dim_df, "k").count()


def test_hot_key_forces_salted_shuffle(spark, fact_df, dim_df):
    pf = profile_join_side(fact_df, "k")
    pd_ = profile_join_side(dim_df, "k")
    adv = advise_join(pf, pd_, broadcast_rows=100, n_partitions=32)
    assert adv.strategy == "shuffle_salted"
    assert adv.hot_key == 7
    # 60% share across 32 partitions -> fan-out ~ceil(0.6*32)=20
    assert 19 <= adv.n_salt <= 24
    joined = execute_join(fact_df, dim_df, "k", adv)
    want = sorted(
        (r["k"], r["fact_id"], r["label"])
        for r in fact_df.join(dim_df, "k").collect()
    )
    got = sorted(
        (r["k"], r["fact_id"], r["label"])
        for r in joined.select("k", "fact_id", "label").collect()
    )
    assert got == want


def test_hot_right_side_salts_the_right_side(spark, fact_df, dim_df):
    """Review regression: when the HOT side is the right argument, the
    salt split must land on IT (salting the cold side would replicate
    the hot side n_salt times and leave the hot partition intact)."""
    pf = profile_join_side(fact_df, "k")
    pd_ = profile_join_side(dim_df, "k")
    adv = advise_join(pd_, pf, broadcast_rows=100, n_partitions=32)  # hot on RIGHT
    assert adv.strategy == "shuffle_salted" and adv.hot_side == "right"
    joined = execute_join(dim_df, fact_df, "k", adv)
    # column order preserved: key, left cols, right cols
    assert joined.columns == ["k", "label", "fact_id"]
    want = sorted(
        (r["k"], r["label"], r["fact_id"])
        for r in dim_df.join(fact_df, "k").collect()
    )
    got = sorted((r["k"], r["label"], r["fact_id"]) for r in joined.collect())
    assert got == want
    # an outer join cannot be side-swapped: falls back to plain (exact)
    outer = execute_join(dim_df, fact_df, "k", adv, how="left")
    assert "_salt" not in outer.columns
    assert outer.count() == dim_df.join(fact_df, "k", "left").count()


def test_hot_right_swap_with_duplicate_column_names(spark, fact_df, dim_df):
    """Review regression: both sides carrying a same-named non-key
    column (plain joins keep duplicates) must not crash the swapped
    salted path with AMBIGUOUS_REFERENCE."""
    pf = profile_join_side(fact_df, "k")
    pd_ = profile_join_side(dim_df, "k")
    adv = advise_join(pd_, pf, broadcast_rows=100, n_partitions=32)
    assert adv.strategy == "shuffle_salted" and adv.hot_side == "right"
    l = dim_df.withColumnRenamed("label", "v")
    r = fact_df.withColumnRenamed("fact_id", "v")
    joined = execute_join(l, r, "k", adv)
    assert joined.columns.count("v") == 2  # plain-join duplicate semantics
    assert joined.count() == l.join(r, "k").count()


def test_uniform_keys_plain_shuffle(spark, dim_df):
    big_a = spark.range(150_000).select((F.col("id") % 5000).alias("k"))
    big_b = spark.range(120_000).select((F.col("id") % 5000).alias("k"))
    pa_ = profile_join_side(big_a, "k")
    pb_ = profile_join_side(big_b, "k")
    adv = advise_join(pa_, pb_, broadcast_rows=100, n_partitions=32)
    assert adv.strategy == "shuffle" and adv.n_salt == 1
    joined = execute_join(big_a, big_b, "k", adv)
    # plain declarative join: no salting machinery, Catalyst remains
    # free to pick its own physical strategy (it may still broadcast
    # under its own size threshold — the advisor hints, never forbids)
    assert "_salt" not in joined.columns
    assert joined.count() == big_a.join(big_b, "k").count()


def test_inner_product_sizing_bound(spark, fact_df, dim_df):
    pf = profile_join_side(fact_df, "k")
    pd_ = profile_join_side(dim_df, "k")
    adv = advise_join(pf, pd_)
    exact = fact_df.join(dim_df, "k").count()
    # CMS inner product: one-sided, capped by eps*Na*Nb
    from rusty_bloomfilter_spark.sketch import CountMinSketch

    eps, _ = CountMinSketch.from_bytes(pf.cms_payload).error_bound()
    assert exact <= adv.est_out_rows <= exact + eps * pf.n_rows * pd_.n_rows
    # ndv estimates are sane
    assert abs(pd_.ndv_est - 3100) / 3100 < 0.05


def test_advice_is_plain_data():
    adv = JoinAdvice(
        strategy="shuffle", est_out_rows=10, n_left=5, n_right=5,
        ndv_left=5.0, ndv_right=5.0,
    )
    assert adv.n_salt == 1 and adv.hot_key is None
