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
