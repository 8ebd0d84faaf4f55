"""r6 money-path optimization pins: the 1e4-scaled-long rewrite of
q_pricing_summary / q_top_customers must be value-identical to the
original decimal(38,4) formulation.

Two layers:
- per-row: floor(x*1e4 + 0.5) (pure double HALF_UP) equals
  CAST(x AS DECIMAL(38,4)) on every money value of the test corpus
  (audited over every row of sf0.001/0.01/0.1/1.0 during r6; the small
  SF re-audits here keep the invariant from regressing).
- per-query: the rewritten queries reproduce the decimal formulation's
  doubles bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _sc4(c):
    return F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")


def _dec4u(c):
    return (F.col(c).cast("decimal(38,4)") * 10000).cast("long")


@pytest.mark.parametrize(
    "table, cols",
    [
        ("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
        ("orders", ["o_totalprice"]),
    ],
)
def test_floor_scaling_equals_decimal_cast(spark, table, cols):
    df = spark.read.parquet(f"{SF}/{table}.parquet")
    bad = df.agg(
        *[F.sum((_sc4(c) != _dec4u(c)).cast("long")).alias(c) for c in cols]
    ).collect()[0]
    assert all(bad[c] == 0 for c in cols), dict(bad.asDict())


def test_pricing_summary_matches_decimal_form(spark):
    from rusty_bloomfilter_spark import contract

    got = sorted(
        tuple(r) for r in contract.queries()["q_pricing_summary"](spark, SF).collect()
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    want = sorted(
        tuple(r)
        for r in (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
            .collect()
        )
    )
    assert got == want


def test_top_customers_matches_decimal_form(spark):
    from rusty_bloomfilter_spark import contract

    got = sorted(
        tuple(r) for r in contract.queries()["q_top_customers"](spark, SF).collect()
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    want = sorted(
        tuple(r)
        for r in (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
                .cast("double")
                .alias("total_spent"),
                F.count("*").alias("n_orders"),
            )
            .orderBy(F.desc("total_spent"), "custkey")
            .limit(20)
            .collect()
        )
    )
    assert got == want
