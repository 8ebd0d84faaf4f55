"""Slowly-changing-dimension (type 2) history: compress + merge.

The warehouse staple the engine was missing on its relational surface:
turn an append-only change log into effective-dated history rows, and
MERGE a new snapshot into an existing history (close changed rows, open
new versions) — Iceberg/Delta ``MERGE INTO`` semantics expressed as
plain DataFrame ops so Catalyst plans them.

``scd2_compress`` — change log -> history:

    (key, attrs..., ts)  ->  (key, attrs..., version, valid_from,
                              valid_to, is_current, n_rows)

Consecutive rows (per key, in (ts, *tiebreak) order) with identical
attribute tuples collapse into one validity interval; a row opens a new
version iff it is the key's first row or any attribute IS DISTINCT FROM
the previous row's (null-safe — NULL->NULL is "no change", NULL->x and
x->NULL are changes). ``valid_to`` is the next version's ``valid_from``
(half-open intervals, NULL on the current row), so the history tiles
each key's timeline with no gaps and no overlaps.

``scd2_apply`` — history + snapshot -> merged history (MERGE INTO):

  - current rows whose attributes differ from the snapshot close at
    ``snapshot_ts`` and a new version opens there;
  - keys new to the history open at version 1;
  - keys absent from the snapshot are RETAINED open (dimension
    snapshots are usually partial; pass ``close_missing=True`` for
    full-snapshot semantics, which closes them at ``snapshot_ts``
    without opening a successor).

Execution shape (the one you'd want at 100 TB):

- ``scd2_compress`` is ONE hash partition by key feeding a stack of
  window ops that all share that partitioning (lag -> conditional
  cumsum -> group -> lead), so Catalyst plans a single Exchange; the
  group-by on (key, version) reuses it map-side;
- ``scd2_apply`` never scans the closed history rows' lineage twice:
  the current slice full-outer-joins the snapshot ONCE (both sides
  pre-projected to key+attrs), and everything downstream is a union of
  narrow projections of that join;
- per-key state is O(1); skew = one wide sort group, not a shuffle of
  unrelated keys.

Determinism: callers must pass ``tiebreak_cols`` making
(ts, *tiebreak) a total order per key, or same-instant changes are
engine-ordering dependent.

Reference parity: the reference (/root/reference, Rust, 978 LoC) is a
sketch library with no table semantics; this extends the engine's
relational category (keep-latest, as-of join in operators/temporal.py)
with versioned-dimension maintenance under the same exactness
discipline (no estimates, no per-row Python).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HISTORY_COLS = ("version", "valid_from", "valid_to", "is_current")


def _any_attr_changed(attr_cols: list[str], other: str) -> Column:
    """NULL-safe 'any attribute differs' between this row and a prefixed
    companion column set (IS DISTINCT FROM on every attr, OR-folded)."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"{other}{c}")) for c in attr_cols],
    )


def scd2_compress(
    changelog: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD2 history rows.

    Returns (key, *attrs, version, valid_from, valid_to, is_current,
    n_rows): ``version`` is 1-based per key in time order, ``n_rows``
    counts the log rows the interval absorbed. One shuffle total.
    """
    if not attr_cols:
        raise ValueError("attr_cols must name at least one tracked attribute")
    overlap = set(attr_cols) & {key_col, ts_col}
    if overlap:
        raise ValueError(f"attr_cols overlap key/ts columns: {sorted(overlap)}")
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(key_col).orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lagged = changelog.select(key_col, ts_col, *attr_cols, *(tiebreak_cols or []))
    for c in attr_cols:
        lagged = lagged.withColumn(f"_prev_{c}", F.lag(c).over(w))
    # a lagged literal (not a lagged attr) marks the first row — an
    # attr that is legitimately NULL on row 1 must still open version 1
    lagged = lagged.withColumn("_first", F.lag(F.lit(1)).over(w).isNull())
    opens = lagged.withColumn(
        "_open",
        (F.col("_first") | _any_attr_changed(attr_cols, "_prev_")).cast("int"),
    )
    runs = opens.withColumn("version", F.sum("_open").over(wrows).cast("bigint"))

    # attrs are constant within a (key, version) run by construction, so
    # min() is a deterministic representative (all-NULL runs stay NULL)
    hist = runs.groupBy(key_col, "version").agg(
        *[F.min(c).alias(c) for c in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return hist.withColumn("valid_to", F.lead("valid_from").over(wv)).select(
        key_col,
        *attr_cols,
        "version",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "n_rows",
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    snapshot_ts,
    close_missing: bool = False,
) -> DataFrame:
    """MERGE a point-in-time snapshot into SCD2 ``history``.

    ``history`` must carry HISTORY_COLS (as produced by
    ``scd2_compress``, minus n_rows which is passed through if present);
    ``snapshot`` is one row per key with the new attribute values.
    Returns the merged history with the same schema as ``history``.
    """
    for c in HISTORY_COLS:
        if c not in history.columns:
            raise ValueError(f"history is missing required column {c!r}")
    extra = [
        c
        for c in history.columns
        if c not in {key_col, *attr_cols, *HISTORY_COLS}
    ]
    snap_ts = F.lit(snapshot_ts).cast(dict(history.dtypes)["valid_from"])

    closed = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))
    snap = snapshot.select(
        F.col(key_col).alias("_snap_key"),
        *[F.col(c).alias(f"_snap_{c}") for c in attr_cols],
    )
    # ONE join decides every key's fate; both sides are key+attrs narrow
    j = current.join(snap, F.col(key_col) == F.col("_snap_key"), "full_outer")

    in_hist = F.col(key_col).isNotNull()
    in_snap = F.col("_snap_key").isNotNull()
    changed = in_hist & in_snap & _any_attr_changed(attr_cols, "_snap_")

    keep_open = j.filter(in_hist & in_snap & ~changed).select(*history.columns)
    untouched_missing = j.filter(in_hist & ~in_snap)
    if close_missing:
        missing = untouched_missing.select(
            *[
                snap_ts.alias("valid_to")
                if c == "valid_to"
                else (
                    F.lit(False).alias("is_current")
                    if c == "is_current"
                    else F.col(c)
                )
                for c in history.columns
            ]
        )
    else:
        missing = untouched_missing.select(*history.columns)

    now_closed = j.filter(changed).select(
        *[
            snap_ts.alias("valid_to")
            if c == "valid_to"
            else (F.lit(False).alias("is_current") if c == "is_current" else F.col(c))
            for c in history.columns
        ]
    )
    opened = j.filter(changed | (in_snap & ~in_hist)).select(
        F.coalesce(F.col(key_col), F.col("_snap_key")).alias(key_col),
        *[F.col(f"_snap_{c}").alias(c) for c in attr_cols],
        F.coalesce(F.col("version") + 1, F.lit(1)).cast("bigint").alias("version"),
        snap_ts.alias("valid_from"),
        F.lit(None).cast(dict(history.dtypes)["valid_to"]).alias("valid_to"),
        F.lit(True).alias("is_current"),
        *[
            F.lit(1).cast(dict(history.dtypes)[c]).alias(c)
            if c == "n_rows"
            else F.lit(None).cast(dict(history.dtypes)[c]).alias(c)
            for c in extra
        ],
    ).select(*history.columns)

    return closed.unionByName(keep_open).unionByName(missing).unionByName(
        now_closed
    ).unionByName(opened)
