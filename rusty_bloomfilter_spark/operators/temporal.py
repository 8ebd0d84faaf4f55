"""Temporal operators: sessionization and as-of joins.

Standard OLAP patterns Spark lacks as built-ins, expressed with
native window functions (sessionize — fully Catalyst/codegen) and a
grouped pandas merge_asof (as-of join — per-key batch, Arrow-fed).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds `gap_minutes`. Pure window
    algebra (lag + conditional cumsum), whole-stage codegen'd; one
    shuffle on the user key."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # interval comparison, not epoch casts: TIMESTAMP_NTZ -> long goes
    # through the session timezone (wrong answers across DST boundaries
    # if the session isn't UTC); timestamp subtraction is tz-free
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_no", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """-> per-user session summary (n_sessions, events per session)."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_minutes=gap_minutes)
    return (
        s.groupBy(user_col, "session_no")
        .agg(F.count("*").alias("n_events"))
        .groupBy(user_col)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    lower: float,
    upper: float,
    by: str | None = None,
    bin_width: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval/range join: pairs where right.on ∈ [left.on + lower,
    left.on + upper] (and left.by == right.by when given), as an
    EQUI-join on time bins instead of the cross/nested-loop join Spark
    would otherwise plan for a pure inequality condition.

    Each left row explodes to the ceil(span/bin_width)+1 bins its
    window covers (2 bins at the default bin_width = window span); each
    right row lands in exactly one bin, so every matching pair meets
    exactly once — no post-join dedup. Shuffle keys are (by, bin):
    uniformly distributed for event-time data, bounded per-bin
    expansion, scales as a hash join at any corpus size.
    """
    if upper < lower:
        raise ValueError(f"need lower <= upper, got [{lower}, {upper}]")
    span = float(upper) - float(lower)
    width = float(bin_width) if bin_width is not None else max(span, 1.0)
    renames = {c: c + suffix for c in right.columns if c in left.columns and c != by}
    r = right.select(*[F.col(c).alias(renames.get(c, c)) for c in right.columns])
    r_on = renames.get(on, on)
    r_by = None
    if by is not None:
        r_by = "_range_by"
        r = r.withColumnRenamed(by, r_by)
    l = left.withColumn(
        "_bin_l",
        F.explode(
            F.sequence(
                F.floor((F.col(on) + F.lit(float(lower))) / F.lit(width)).cast("long"),
                F.floor((F.col(on) + F.lit(float(upper))) / F.lit(width)).cast("long"),
            )
        ),
    )
    r = r.withColumn("_bin_r", F.floor(F.col(r_on) / F.lit(width)).cast("long"))
    cond = (
        (F.col("_bin_l") == F.col("_bin_r"))
        & (F.col(r_on) >= F.col(on) + F.lit(float(lower)))
        & (F.col(r_on) <= F.col(on) + F.lit(float(upper)))
    )
    if by is not None:
        cond = cond & (F.col(by) == F.col(r_by))
    out = l.join(r, cond).drop("_bin_l", "_bin_r")
    return out.drop(r_by) if r_by else out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.on <= left.on within the same `by` key (direction=backward).

    Implemented as a cogrouped applyInPandas running pd.merge_asof per
    key — both sides shuffle once on `by`, each group sorts locally.
    At scale, `by` keys distribute the work; a single huge key is the
    caller's salting problem (same contract as any keyed op).
    """
    # Break shared lineage: when left and right derive from the same
    # DataFrame, their columns carry identical expression ids and
    # Spark's cogroup silently drops the duplicated attribute from the
    # right group (observed on Spark 4.1: rg arrived without `on`).
    # Re-aliasing mints fresh expression ids on the right side.
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    l_cols = left.columns
    r_cols = [c for c in right.columns if c not in (by, on)]
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rmap = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    for c in r_cols:
        name = c if c not in l_cols else c + suffix
        out_fields.append(f"{name} {rmap[c]}")
    schema = ", ".join(out_fields)

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        lg = lg.sort_values(on)
        rg = rg.sort_values(on)
        merged = pd.merge_asof(
            lg, rg.drop(columns=[by]), on=on, direction=direction, suffixes=("", suffix)
        )
        return merged

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda lg, rg: merge(lg, rg), schema=schema)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: a hot key's left rows spread across
    ``n_salt`` sub-keys (deterministic hash of the whole left row — no
    RNG, so results and plans are reproducible), and the right side is
    replicated once per salt. The join result is IDENTICAL to the plain
    join; only the shuffle distribution changes: the hot key's
    partition shrinks n_salt-fold while the right side grows by
    n_salt x |right| rows — the classic trade when AQE's skew handling
    can't kick in (single hot KEY rather than oversized partitions).
    Put the smaller table on the right (it is the replicated side).
    ``how`` supports inner/left joins — semantics preserved because
    every left row carries exactly one salt.
    """
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    # disambiguate overlapping non-key columns like a plain join would:
    # keep both sides' columns (callers select what they need)
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")


def trailing_day_sum(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str,
    date_col: str,
    days: int,
    out_col: str = "trailing_sum",
) -> DataFrame:
    """Trailing N-calendar-day sum per key: a RANGE window over an
    integer day index. The distinction that matters: a ROWS frame
    ("previous N-1 rows") silently widens the window across calendar
    GAPS — a key with no activity yesterday would pull in data from a
    week ago; the RANGE frame bounds the window by day DISTANCE, so gap
    days simply contribute nothing. Callers should pre-aggregate to one
    row per (key, day) first: the window then runs over the small
    aggregated frame, one Exchange on the key, never over raw events.

    Works on date or timestamp ``date_col`` (cast to date); rows with a
    NULL date sort first and only aggregate with each other.
    """
    if days < 1:
        raise ValueError(f"days must be >= 1, got {days}")
    day_index = F.datediff(
        F.col(date_col).cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_index)
        .rangeBetween(-(days - 1), 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def debounce(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str | None = None,
    gap_minutes: int = 10,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Burst suppression: keep only the FIRST event of every within-gap
    chain per user (and per ``type_col`` if given) — the telemetry
    debounce that turns a retry storm into one row. A chain is the
    same gap-transitive closure as ``sessionize`` (each event within
    ``gap_minutes`` of its predecessor), so "first of chain" is
    well-defined and arrival-order independent; later events of the
    chain drop even if they are > gap from the first kept row.

    One shuffle (the lag window's partition); the filter is a window
    flag, so the corpus never re-aggregates. Pass ``tiebreak_cols`` to
    make same-instant ordering total."""
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    parts = [user_col] + ([type_col] if type_col else [])
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*parts).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    keep = prev.isNull() | (
        F.col(ts_col) > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    )
    return events.withColumn("_keep", keep).filter("_keep").drop("_keep")


def session_intervals(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """-> (user_id, s_us, e_us): closed per-session time spans in
    integer epoch-MICROSECONDS (``unix_micros`` == DuckDB ``epoch_us``
    on parquet timestamps — the cross-engine-exact convention; interval
    or second-floored arithmetic would move gap decisions on
    sub-second data). The interval feed for sweep-line analytics
    (operators/sweep.py). Tie-safe: coincident events share a session
    regardless of intra-tie window order (a gap of 0 never opens one).
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t")
    prev = F.lag("t").over(w)
    ns = F.when(prev.isNull() | (F.col("t") - prev > gap_us), 1).otherwise(0)
    sid = F.sum(ns).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("s_us"), F.max("t").alias("e_us"))
        .select("user_id", "s_us", "e_us")
    )


def gap_fill_locf(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify a sparse per-key daily series over each key's own
    [min_day, max_day] span and carry the last observation forward
    (LOCF) — the resample step every downstream window/trend consumer
    silently assumes has already happened: a trailing-7-day mean over a
    SPARSE frame averages observed days only, quietly skipping the gaps
    (q_rolling_revenue dodges this with a RANGE frame; most consumers
    don't).

    Output one row per (key, calendar day): ``value`` (observed or
    carried), ``is_observed``, and ``fill_age_days`` (0 on observed
    days — the staleness signal that lets a consumer cap how far a
    value may be dragged).

    Distributed shape: the input is already the |keys|·|observed days|
    daily aggregate (corpus-size-independent); the calendar explode is
    map-side ``sequence()`` per key span (never a driver loop or a
    calendar cross join), and the carry-forward is one
    last(ignorenulls) window per key ordered by day — ONE hash
    exchange on the key carries the whole operator. Dense output is
    |keys|·|span days| rows — bounded by calendar time, not corpus
    size.

    No reference analogue (the reference library has no temporal
    surface); semantics per the standard LOCF resample (pandas
    ``asfreq('D').ffill()``).
    """
    spans = daily.groupBy(key_col).agg(
        F.min(F.col(day_col)).alias("_d0"), F.max(F.col(day_col)).alias("_d1")
    )
    calendar = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias(day_col),
    )
    obs = daily.select(
        key_col, day_col, F.col(value_col).alias("_obs")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = calendar.join(obs, on=[key_col, day_col], how="left")
    last_obs_day = F.last(
        F.when(F.col("_obs").isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w)
    return joined.select(
        F.col(key_col),
        F.col(day_col),
        F.last(F.col("_obs"), ignorenulls=True).over(w).alias(value_col),
        F.col("_obs").isNotNull().alias("is_observed"),
        F.datediff(F.col(day_col), last_obs_day).alias("fill_age_days"),
    )
