"""Kaplan-Meier survival estimation over user activity spans.

Kaplan & Meier 1958 ("Nonparametric estimation from incomplete
observations") — the survival curve with RIGHT-CENSORING, which is
what separates it from the retention-cohort table
(operators/retention.py): retention counts who came back in period k;
KM estimates the survival function S(t) = P(lifespan > t) while
correctly using users whose lifespan is still unfinished at the
observation horizon (censored) instead of dropping or miscounting
them — the difference between "half our users churn by day 10" and an
artifact of a short observation window.

Model (deterministic, integer duration-unit arithmetic — micro
quotients via integer div, the sweep.py convention), generic over an
INTERVAL frame (session spans, job runtimes, connection lifetimes):

  * duration = (end - start) div unit_us;
  * the interval COMPLETED (event observed) iff
    horizon - end > censor_us (the horizon is the max observed end);
  * otherwise it is RIGHT-CENSORED at its observed duration (it may
    still be running — contributes to the at-risk set for every t up
    to its duration, never to the event counts);
  * KM: S(t) = prod_{t_i <= t} (1 - d_i / n_i) over distinct completed
    durations t_i, d_i completions at t_i, n_i = #intervals with
    duration >= t_i.

The running product is exp(cumsum(ln(1 - d/n))) — each ln argument an
exact rational of BIGINTs, the same double expression on both
engines, 6 dp.

Scale shape: ONE corpus-sized per-user aggregate (map-side
combinable); everything after operates on the duration frame
(|users| rows) and the curve frame (<= distinct durations rows) with
bounded windows. No per-row Python.

Reference parity: survival estimation extends /root/reference
(membership library) per SURVEY §2.2's aggregation/window categories;
estimator per the public literature above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import tie

DAY_US = 86_400_000_000


def km_curve(
    intervals: DataFrame,
    start_col: str = "s_us",
    end_col: str = "e_us",
    unit_us: int = 60_000_000,
    censor_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """(t_unit, n_risk, d_events, survival): the KM curve over interval
    durations (in ``unit_us`` steps — minutes by default).

    An interval whose end sits within ``censor_us`` of the observation
    horizon (the max end) is RIGHT-CENSORED: it may still be running,
    so it contributes to the at-risk set up to its observed duration
    and never to the churn counts — the correction that keeps the tail
    of the curve honest at the data boundary.
    """
    iv = intervals.select(
        F.col(start_col).cast("long").alias("s"), F.col(end_col).cast("long").alias("e")
    )
    horizon = iv.agg(F.max("e").alias("h"))
    durs = iv.crossJoin(F.broadcast(horizon)).select(
        F.expr(f"(e - s) div {int(unit_us)}L").alias("dur"),
        (F.col("h") - F.col("e") > censor_us).alias("complete"),
    )
    # durs (|intervals| rows) feeds three consumers -> persist + tie,
    # else its upstream runs three times per action
    durs = durs.persist()
    d_i = (
        durs.filter("complete")
        .groupBy(F.col("dur").alias("t_unit"))
        .agg(F.count("*").alias("d_events"))
    )
    # n_risk(t) = #intervals with dur >= t: total minus the count of
    # strictly-shorter durations (running sum over the tiny duration
    # histogram, shifted one row); total from a broadcast 1-row
    # aggregate, not a driver-side count() action
    hist = durs.groupBy(F.col("dur").alias("t_unit")).agg(F.count("*").alias("cnt"))
    total = durs.agg(F.count("*").alias("total"))
    w_cum = Window.orderBy("t_unit").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = (
        hist.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("total") - F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)),
        )
        .select("t_unit", "n_risk")
    )
    # d == n (everyone still at risk completes here — necessarily the
    # last curve point) makes the factor 0: DuckDB ln(0) THROWS and
    # Spark log(0) is NULL (which sum() would silently skip — a wrong
    # curve, not an error). Split it out: ln terms for d < n, and a
    # running min indicator that zeroes survival from any d == n row.
    w_surv = Window.orderBy("t_unit").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        d_i.join(at_risk, "t_unit")
        .withColumn(
            "ln_term",
            F.when(
                F.col("d_events") < F.col("n_risk"),
                F.log(1.0 - F.col("d_events").cast("double") / F.col("n_risk")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "alive",
            F.min(
                F.when(F.col("d_events") == F.col("n_risk"), 0.0).otherwise(1.0)
            ).over(w_surv),
        )
        .withColumn(
            "survival",
            F.round(F.exp(F.sum("ln_term").over(w_surv)) * F.col("alive"), 6),
        )
    )
    return tie(curve.select("t_unit", "n_risk", "d_events", "survival"), durs)
