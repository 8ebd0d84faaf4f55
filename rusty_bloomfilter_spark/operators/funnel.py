"""Ordered-funnel analysis: who reached step k after step k-1?

The event-analytics staple (ClickHouse ``windowFunnel``, Amplitude
funnels): given an ordered list of step event types, a user reaches
step k iff an event of type_k exists at ``ts >=`` the time the user
reached step k-1 (same-instant events count — document-equal semantics
on both engines), optionally within ``within_seconds`` of step 1.

Execution shape (the one you'd want at 100 TB):

- events are FILTERED to the funnel's types before anything else, so
  the predicate reaches the parquet scan and non-funnel traffic never
  leaves it;
- ONE shuffle total: a single hash-partition by user feeds a chain of
  conditional-min window aggregates (step k's reach time references
  step k-1's column, but every window shares the same partitioning, so
  Catalyst plans one Exchange + one Sort and stacks the Window nodes);
- the per-step summary is a single-row aggregate unpivoted with
  ``stack`` — no second pass, no driver-side row data.

Per-user state is O(#steps); a pathological bot user costs one wide
sort group, not a skewed shuffle of unrelated keys (and the funnel
types filter usually removes most bot volume first).

Reference parity: the reference is a sketch library with no event
semantics; this is relational-surface breadth for the engine. The
zero-FN discipline carries over: reach times are exact Catalyst
aggregates, never estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_users(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user reach times -> (user, t0..t{k-1}); t_i is NULL iff the
    user never reached step i. ``within_seconds`` additionally requires
    step i's event to land within that many seconds of the user's step-0
    reach time (timestamps go via cast('timestamp') to seconds —
    TIMESTAMP_NTZ cannot cast straight to long)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step types: {steps}")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("within_seconds must be positive")

    w = Window.partitionBy(user_col)
    cur = df.select(user_col, ts_col, type_col).filter(
        F.col(type_col).isin(list(steps))
    )
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if i > 0:
            cond = cond & (F.col(ts_col) >= F.col(f"_t{i - 1}"))
            if within_seconds is not None:
                # fractional-second epochs (microsecond-exact doubles):
                # a long cast would TRUNCATE and disagree with any
                # engine comparing exact epochs at the window edge
                cond = cond & (
                    F.col(ts_col).cast("timestamp").cast("double")
                    <= F.col("_t0").cast("timestamp").cast("double") + within_seconds
                )
        cur = cur.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
    return cur.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"t{i}") for i in range(len(steps))]
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Funnel summary -> (step int, step_name, n_users, conv) with
    ``conv`` = n_users / step-1 users rounded to 6 dp (NULL when step 1
    converted nobody). n_users is non-increasing by construction."""
    per_user = funnel_users(
        df,
        steps,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        within_seconds=within_seconds,
    )
    k = len(steps)
    summary = per_user.agg(
        *[F.count(f"t{i}").cast("long").alias(f"n{i}") for i in range(k)]
    )
    tuples = ", ".join(
        f"{i + 1}, '{_sq(s)}', n{i}, n0" for i, s in enumerate(steps)
    )
    stacked = summary.select(
        F.expr(
            f"stack({k}, {tuples}) as (step, step_name, n_users, n_first)"
        )
    )
    return stacked.select(
        "step",
        "step_name",
        "n_users",
        F.round(F.col("n_users") / F.col("n_first"), 6).alias("conv"),
    )


def _sq(s: str) -> str:
    """Step names become SQL literals inside stack(); refuse quotes
    rather than attempt escaping (event types are identifiers, not
    free text)."""
    if "'" in s or "\\" in s:
        raise ValueError(f"step name {s!r} must not contain quotes/backslashes")
    return s
