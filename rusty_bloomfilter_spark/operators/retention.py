"""Cohort retention: of the users first seen on day D, how many were
still active k periods later?

The companion to operators/funnel.py on the event-analytics surface.
Cohort = the user's FIRST activity date; period = floor(days since
cohort / period_days). Day arithmetic only — deliberately NOT
date_trunc('week'): week-start conventions differ across engines and
locales, while "days between two dates / 7" is the same integer
everywhere, which is what makes the result oracle-able cross-engine.

Execution shape: one hash-partition by user computes the cohort date
as a window min (no self-join back to a per-user aggregate), then one
aggregation by (cohort, period) with an exact distinct count, then a
window over the cohort-sized result frame for the retention ratio —
the expensive shuffles touch event rows exactly twice, and the second
one carries (cohort, period, user) triples only. At 100 TB the exact
countDistinct is the one knob to swap: build_by_key HLL per (cohort,
period) gives the same frame shape with sketch-rows-only shuffles
(q_user_distinct_hll shows that path); this operator keeps the exact
semantics so it can BE the oracle.

Reference parity: relational-surface breadth; no sketch estimates, so
nothing to bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def retention_cohorts(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """-> (cohort date, period int, n_active bigint, retention double):
    one row per (first-activity date, periods-since) with the exact
    distinct active-user count and its share of the cohort's period-0
    size (retention at period 0 is 1.0 by construction — every user is
    active in the period of their first event)."""
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    d = F.col(ts_col).cast("date")
    by_user = Window.partitionBy("_u")
    acts = (
        df.select(F.col(user_col).alias("_u"), d.alias("_d"))
        .withColumn("_cohort", F.min("_d").over(by_user))
        .withColumn(
            "period",
            F.floor(F.datediff(F.col("_d"), F.col("_cohort")) / period_days).cast("int"),
        )
    )
    counts = acts.groupBy(F.col("_cohort").alias("cohort"), "period").agg(
        F.countDistinct("_u").cast("long").alias("n_active")
    )
    by_cohort = Window.partitionBy("cohort")
    return counts.withColumn(
        "retention",
        F.round(
            F.col("n_active")
            / F.max(F.when(F.col("period") == 0, F.col("n_active"))).over(by_cohort),
            6,
        ),
    )


def rfm_segments(
    orders: DataFrame,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    quantiles: int = 5,
) -> DataFrame:
    """RFM segmentation (Hughes 1994): score every active customer
    1..q on Recency (days since last order; score 1 = most recent),
    Frequency (order count; score q = most orders) and Monetary
    (lifetime spend; score q = highest), then report the segment grid
    — the behavioral tiering a retention/marketing pass starts from,
    and on a training corpus the exact shape used to tier users by
    engagement before sampling.

    Distributed shape: ONE corpus aggregate to per-customer (recency,
    frequency, monetary) — map-side combined, |customers| rows out —
    then three global ntile windows over that frame and a |grid|≤q³
    aggregate. The unpartitioned ntile windows move |customers| rows
    through one task: corpus-size-independent, but at 10⁹ customers
    swap ntile for percent_rank bucketing on the same ordering.
    Determinism: every ntile orders by (metric, customer id) — the
    total order makes bucket assignment, and therefore the whole
    grid, engine-exact. Money aggregates run in DECIMAL(38,4).
    """
    if quantiles < 2:
        raise ValueError(f"quantiles must be >= 2, got {quantiles}")
    ref = orders.agg(F.max(F.col(date_col)).alias("_ref"))
    per_cust = (
        orders.groupBy(F.col(cust_col).alias("_c"))
        .agg(
            F.max(F.col(date_col)).alias("_last"),
            F.count("*").alias("_freq"),
            F.sum(F.col(amount_col).cast("decimal(38,4)")).alias("_money"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "_c",
            F.datediff(F.col("_ref"), F.col("_last")).alias("_rec"),
            "_freq",
            "_money",
        )
    )
    # asc_nulls_last: Spark's ASC default is NULLS FIRST, which would
    # score a customer with only NULL order dates as MOST recent — and
    # diverge from SQL engines whose ASC default is NULLS LAST. NULL
    # metrics rank worst, explicitly and identically cross-engine.
    w_r = Window.orderBy(F.col("_rec").asc_nulls_last(), F.col("_c").asc())
    w_f = Window.orderBy(F.col("_freq").asc_nulls_last(), F.col("_c").asc())
    w_m = Window.orderBy(F.col("_money").asc_nulls_last(), F.col("_c").asc())
    scored = per_cust.select(
        "_c",
        "_rec",
        "_freq",
        "_money",
        F.ntile(quantiles).over(w_r).alias("r_score"),
        F.ntile(quantiles).over(w_f).alias("f_score"),
        F.ntile(quantiles).over(w_m).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.max("_money").alias("max_monetary"),
        F.sum("_money").alias("total_monetary"),
    )


def cohort_ltv(
    orders: DataFrame,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cohort lifetime-value curves — the REVENUE companion to
    ``retention_cohorts``: customers cohorted by first-order month,
    then cumulative revenue per cohort customer by month-period.
    Retention says how many come back; this says what coming back is
    worth, and comparing curves across cohorts is the standard "are
    newer cohorts monetizing faster" read.

    Month arithmetic is integer (year·12 + month), engine-portable —
    no months_between float or truncation semantics. Distributed
    shape: one aggregate to per-customer first months (|customers|
    rows), broadcast back onto orders for the period tag, one
    (cohort, period) aggregate, then cumulative windows over the
    cohorts × periods frame. Money sums in DECIMAL(38,4), emitted as
    DOUBLE per the cross-engine convention.
    """
    m = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    first = orders.groupBy(F.col(cust_col).alias("_c")).agg(
        F.min(F.col(date_col)).alias("_first")
    )
    firsts = first.select(
        "_c",
        m(F.col("_first")).alias("_cm"),
        F.date_format("_first", "yyyy-MM").alias("_cohort"),
    )
    tagged = orders.join(
        F.broadcast(firsts), on=orders[cust_col] == F.col("_c")
    ).select(
        "_cohort",
        "_cm",
        "_c",
        (m(F.col(date_col)) - F.col("_cm")).cast("int").alias("period"),
        F.col(amount_col).cast("decimal(38,4)").alias("_amt"),
    )
    sizes = firsts.groupBy("_cohort").agg(
        F.countDistinct("_c").alias("n_customers")
    )
    per = tagged.groupBy("_cohort", "period").agg(
        F.sum("_amt").alias("_rev")
    )
    w = (
        Window.partitionBy("_cohort")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        "_cohort",
        "period",
        F.col("_rev").cast("double").alias("period_revenue"),
        F.sum("_rev").over(w).cast("double").alias("cum_revenue"),
    )
    return cum.join(F.broadcast(sizes), on="_cohort").select(
        F.col("_cohort").alias("cohort_month"),
        "period",
        "n_customers",
        F.round("period_revenue", 6).alias("period_revenue"),
        F.round("cum_revenue", 6).alias("cum_revenue"),
        F.round(F.col("cum_revenue") / F.col("n_customers"), 6).alias(
            "ltv_per_customer"
        ),
    )
