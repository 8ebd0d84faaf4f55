"""Goodness-of-fit: exact Kolmogorov–Smirnov test per group.

Completes the statistical-audit family (Benford digit conformity,
Pearson matrices, OLS trend, CUSUM, PSI) with the classic
distribution-shape test: per group, the one-sample KS statistic

    D_n = sup_x | ECDF(x) - F(x) |
        = max_i max( i/n - F(x_(i)),  F(x_(i)) - (i-1)/n )

against a fitted EXPONENTIAL null — the natural model for event
INTER-ARRIVAL times (a Poisson process arrives exponentially; retry
storms, batch jobs and bot bursts do not, and show up as a large D).
lambda is the MLE n / sum(dt). A large D_n (rule of thumb: compare
against c(alpha)/sqrt(n), c(0.05) ~= 1.358 — emitted as ks_crit_05)
flags machine-generated traffic masquerading as organic.

Determinism / cross-engine exactness: inter-arrivals are integer
MICROSECOND differences (unix_micros == DuckDB epoch_us); the sorted
rank i comes from a (dt, then arbitrary) row_number — tie groups get
consecutive i over IDENTICAL dt values, so the (i, dt) multiset and
therefore the max are engine-invariant; F(x) = 1 - exp(-lambda*dt) is
one double expression evaluated identically on both sides, 6 dp.

Scale shape: one lag window and one rank window, both partitioned by
the group key (the same Exchange — consecutive key-partitioned
windows reuse it); the output is |groups| rows. Heavy groups sort
within their partition — at extreme skew, pre-aggregate dt to
(group, dt, multiplicity) first and rank the distinct values.

Reference parity: GoF testing extends /root/reference (membership
library) per SURVEY §2.2's aggregation category; statistic per the
public literature (Kolmogorov 1933, Massey 1951).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interarrival_ks(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    min_n: int = 10,
) -> DataFrame:
    """(group, n, lambda_per_s, ks_stat, ks_crit_05, exponential_ok)
    — per-group KS test of inter-arrival times vs the fitted
    exponential. Groups with fewer than ``min_n`` gaps are dropped
    (the asymptotic critical value is meaningless there)."""
    ev = events.select(
        F.col(group_col).alias("grp"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
    )
    w_lag = Window.partitionBy("grp").orderBy("t")
    dts = (
        ev.withColumn("dt_us", F.col("t") - F.lag("t").over(w_lag))
        .filter(F.col("dt_us").isNotNull())
        .select("grp", "dt_us")
    )
    w_rank = Window.partitionBy("grp").orderBy("dt_us")
    stats = dts.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("dt_us").alias("sum_dt")
    )
    ranked = (
        dts.withColumn("i", F.row_number().over(w_rank))
        .join(stats, "grp")
        .filter(F.col("n") >= min_n)
    )
    lam_us = F.col("n").cast("double") / F.col("sum_dt")  # MLE, per-microsecond
    cdf = 1.0 - F.exp(-lam_us * F.col("dt_us").cast("double"))
    dev = F.greatest(
        F.col("i").cast("double") / F.col("n") - cdf,
        cdf - (F.col("i") - 1).cast("double") / F.col("n"),
    )
    return (
        ranked.groupBy("grp", "n", "sum_dt")
        .agg(F.round(F.max(dev), 6).alias("ks_stat"))
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.round(
                F.col("n").cast("double") / F.col("sum_dt") * 1_000_000.0, 6
            ).alias("lambda_per_s"),
            "ks_stat",
            F.round(1.358 / F.sqrt(F.col("n").cast("double")), 6).alias("ks_crit_05"),
            (
                F.col("ks_stat") <= F.round(1.358 / F.sqrt(F.col("n").cast("double")), 6)
            ).alias("exponential_ok"),
        )
    )
