"""Per-key linear trend estimation (OLS of value on an ordinal axis).

The third leg of the drift family: PSI (operators/drift.py) answers IF
a distribution moved, CUSUM (operators/changepoint.py) answers WHEN a
level shifted, and this answers HOW FAST a monitored series is moving —
the slope, its direction, and how linear the motion actually is (r²).

Distributed shape: the regression is a bag of SUFFICIENT STATISTICS
(n, Σx, Σy, Σxy, Σx², Σy²), all associative+commutative sums, so the
whole fit is ONE map-side-combinable hash aggregate — the shuffle
carries |keys| rows of six doubles no matter how many input rows there
are, and a 100 TB events table fits the same plan. We use Spark's
built-in ``regr_slope/regr_intercept/regr_r2/regr_count`` (SQL-standard
Welford-style accumulators, numerically stable) rather than assembling
n·Σxy − Σx·Σy by hand: at epoch-day x-magnitudes the raw-moment form
cancels catastrophically; the built-in centers incrementally. DuckDB
implements the identical SQL-standard aggregates, which is what makes
the query hash-matchable at round(6).

The ordinal axis is the day offset from a caller-supplied reference
date — an integer both engines derive identically from a DATE, with no
timezone or leap-second ambiguity. Centering near the data matters
numerically: regressing on raw epoch days (~2·10⁴) puts the intercept
at 1970, a large number formed by near-cancellation whose cross-engine
noise (~1e-6 absolute) straddles the round(6) hash boundary; with a
reference day inside the window every emitted quantity is
observation-sized and the ulp noise sits ~7 orders below the rounding
step. Fitted endpoints are emitted so "what does the trend predict for
the last observed day" needs no client-side algebra.

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has no regression operators; this extends the engine's
monitoring surface beyond what the reference offers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def group_trend(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    ref_day: str,
    min_points: int = 2,
) -> DataFrame:
    """OLS trend of ``value_col`` over calendar time, per key.

    Input: one row per (key, day) with a numeric value (pre-aggregate
    duplicates first — the fit weights every ROW equally). ``ref_day``
    (ISO date string) anchors the ordinal axis; pick a date inside or
    near the observation window (see module docstring for why).
    Output per key:

    - ``slope_per_day``: the OLS slope (units of value per day)
    - ``intercept``: the line evaluated AT ``ref_day``
    - ``r2``: SQL-standard REGR_R2 (squared correlation; how linear)
    - ``n_days``, ``first_day``, ``last_day``: support of the fit
    - ``fitted_first`` / ``fitted_last``: the line evaluated at the
      endpoints (the "where it started / where it's heading" numbers)

    Keys with fewer than ``min_points`` days or zero x-variance are
    dropped — a one-day series has no slope, and emitting NULL rows
    would just push the degenerate-case handling onto every consumer.
    """
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    x = F.datediff(F.col(day_col), F.to_date(F.lit(ref_day))).cast("double")
    y = F.col(value_col).cast("double")
    agg = (
        df.groupBy(key_col)
        .agg(
            F.regr_slope(y, x).alias("slope_per_day"),
            F.regr_intercept(y, x).alias("intercept"),
            F.regr_r2(y, x).alias("r2"),
            F.regr_count(y, x).alias("n_days"),
            F.min(F.col(day_col)).alias("first_day"),
            F.max(F.col(day_col)).alias("last_day"),
        )
        # slope is NULL when var(x)=0 (single distinct day): no trend.
        .filter((F.col("n_days") >= min_points) & F.col("slope_per_day").isNotNull())
    )
    first_x = F.datediff(F.col("first_day"), F.to_date(F.lit(ref_day))).cast("double")
    last_x = F.datediff(F.col("last_day"), F.to_date(F.lit(ref_day))).cast("double")
    fit = F.col("intercept") + F.col("slope_per_day") * first_x
    fit_last = F.col("intercept") + F.col("slope_per_day") * last_x
    return agg.select(
        F.col(key_col),
        F.round("slope_per_day", 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        F.col("n_days"),
        F.col("first_day"),
        F.col("last_day"),
        F.round(fit, 6).alias("fitted_first"),
        F.round(fit_last, 6).alias("fitted_last"),
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    ref_day: str,
    min_points: int = 2,
) -> DataFrame:
    """ROBUST slope per key: Theil–Sen (Theil 1950, Sen 1968) — the
    median of all pairwise slopes (y_j−y_i)/(x_j−x_i), with Sen's
    intercept median(y_i − slope·x_i). Up to ~29% of the points can be
    arbitrarily corrupted before the estimate moves (breakdown point
    1−1/√2), where a single spike day drags the OLS fit
    (``group_trend``) by an unbounded amount — run both; a large
    OLS-vs-Theil–Sen gap IS the outlier alarm.

    Distributed shape: the pair set is generated by a self-join of the
    per-(key, day) DAILY frame — the corpus-sized input collapses to
    |keys|·|days| rows in one map-side-combinable aggregate BEFORE any
    pairing, so the join is bounded by days² per key (a year of daily
    points = 66k pairs — trivially partition-sized), never corpus².
    The daily frame is persisted and tied (three consumers: both join
    sides + the intercept pass). At decade-scale series, switch the
    axis to weekly buckets before pairing; the estimator commutes with
    any monotone re-bucketing of the axis.

    Cross-engine determinism: every pairwise slope is one IEEE
    division of exactly-representable integers-in-doubles, the median
    is the SQL-standard interpolated percentile (DuckDB
    ``quantile_cont``), and the even-count midpoint (a+b)/2 is the
    same double in both engines — so results hash-match at round(6)
    with ulp noise orders below the rounding step.
    """
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    x = F.datediff(F.col(day_col), F.to_date(F.lit(ref_day))).cast("double")
    daily = df.select(
        F.col(key_col).alias("key"),
        x.alias("x"),
        F.col(value_col).cast("double").alias("y"),
    ).persist()
    a = daily.alias("a")
    b = daily.alias("b")
    pair_slope = (F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
    slopes = (
        a.join(b, on=[F.col("a.key") == F.col("b.key"), F.col("a.x") < F.col("b.x")])
        .select(F.col("a.key").alias("key"), pair_slope.alias("s"))
        .groupBy("key")
        .agg(
            F.percentile(F.col("s"), F.lit(0.5)).alias("slope"),
            F.count("*").alias("n_pairs"),
        )
    )
    resid = daily.join(slopes, on="key").select(
        "key",
        "slope",
        "n_pairs",
        (F.col("y") - F.col("slope") * F.col("x")).alias("r"),
    )
    out = (
        resid.groupBy("key", "slope", "n_pairs")
        .agg(
            F.percentile(F.col("r"), F.lit(0.5)).alias("intercept"),
            F.count("*").alias("n_days"),
        )
        .filter(F.col("n_days") >= min_points)
        .select(
            F.col("key").alias(key_col),
            F.round("slope", 6).alias("ts_slope_per_day"),
            F.round("intercept", 6).alias("ts_intercept"),
            F.col("n_days"),
            F.col("n_pairs"),
        )
    )
    return tie(out, daily)


def acf(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function per key: r_k = Σ(x_t−x̄)(x_{t+k}−x̄)
    / Σ(x_t−x̄)² for k = 1..max_lag — the seasonality/memory diagnostic
    the trend family lacks: a weekly-cycled series shows r_7 ≫ 0 with
    r_1..r_6 oscillating, a level shift shows slow uniform decay, white
    noise stays inside the ±1.96/√n band (emitted per row as ``ci`` and
    ``is_significant``).

    ASSUMES A REGULAR AXIS: lags are row-adjacency in day order, so a
    sparse series must be densified first (``temporal.gap_fill_locf``)
    or gaps silently become "adjacent" days. Distributed shape: input
    is the |keys|·|days| daily aggregate; one hash exchange on the key
    carries the mean window, all max_lag lead windows, and the final
    per-key aggregate; output |keys|·max_lag rows.

    Determinism: x̄ is one exact-integer-sum division for count series;
    the centered products are double sums whose cross-engine ulp noise
    sits orders below the round(6) hash step (30-365-point series).
    """
    from pyspark.sql import Window

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w_all = Window.partitionBy(key_col)
    w_ord = Window.partitionBy(key_col).orderBy(day_col)
    x = F.col(value_col).cast("double")
    base = df.select(
        F.col(key_col),
        F.col(day_col),
        x.alias("_x"),
        F.avg(x).over(w_all).alias("_xbar"),
        *[
            F.lead(x, k).over(w_ord).alias(f"_lead{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    dev = F.col("_x") - F.col("_xbar")
    agg = base.groupBy(key_col).agg(
        F.count("*").alias("n_days"),
        F.sum(dev * dev).alias("_ss"),
        *[
            F.sum(dev * (F.col(f"_lead{k}") - F.col("_xbar"))).alias(f"_num{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    pairs = ", ".join(f"{k}, _num{k}" for k in range(1, max_lag + 1))
    long = agg.select(
        key_col,
        "n_days",
        "_ss",
        F.expr(f"stack({max_lag}, {pairs}) as (lag, _num)"),
    )
    ci = F.round(F.lit(1.96) / F.sqrt(F.col("n_days").cast("double")), 6)
    r = F.round(F.try_divide(F.col("_num"), F.col("_ss")), 6)
    return long.select(
        F.col(key_col),
        F.col("lag").cast("int").alias("lag"),
        r.alias("acf"),
        F.col("n_days"),
        ci.alias("ci"),
        (F.abs(r) > ci).alias("is_significant"),
    )


def seasonal_strength_dow(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Day-of-week seasonality strength per key (STL-lite): fit the
    seasonal component as the 7 day-of-week means, then
    strength = max(0, 1 − var(residual)/var(series)) — the Hyndman
    "strength of seasonality" statistic. ACF says whether the series
    remembers; this says how much of its variance the weekly shape
    explains (strength ≈ 0 white noise, ≈ 1 a pure weekly cycle), and
    ``peak_dow`` (ISO: 1 = Monday) names the heavy day.

    Distributed shape: the |keys|·7 day-of-week means aggregate first
    (map-side combined), then broadcast-join back onto the daily frame
    for residuals — the daily frame is already corpus-size-independent
    and the join side is 7 rows per key; two aggregates total. Ties in
    peak day resolve to the later ISO day, identically cross-engine
    (max-of-struct here ≡ ORDER BY m DESC, dow DESC in the oracle).
    """
    dow = (F.weekday(F.col(day_col)) + F.lit(1)).alias("_dow")  # ISO 1=Mon
    daily = df.select(
        F.col(key_col).alias("_k"),
        dow,
        F.col(value_col).cast("double").alias("_x"),
    )
    dowm = daily.groupBy("_k", "_dow").agg(F.avg("_x").alias("_m"))
    peak = dowm.groupBy("_k").agg(
        F.max(
            F.struct(F.round("_m", 6).alias("m"), F.col("_dow").alias("dow"))
        ).alias("_p")
    )
    resid = daily.join(F.broadcast(dowm), on=["_k", "_dow"]).groupBy("_k").agg(
        F.count("*").alias("n_days"),
        F.var_pop("_x").alias("_vt"),
        F.var_pop(F.col("_x") - F.col("_m")).alias("_vr"),
    )
    strength = F.round(
        F.greatest(
            F.lit(0.0), F.lit(1.0) - F.try_divide(F.col("_vr"), F.col("_vt"))
        ),
        6,
    )
    return resid.join(peak, on="_k").select(
        F.col("_k").alias(key_col),
        F.col("n_days"),
        strength.alias("seasonal_strength"),
        F.col("_p.dow").cast("int").alias("peak_dow"),
        F.col("_p.m").alias("peak_avg"),
    )
