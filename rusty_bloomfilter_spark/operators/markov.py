"""First-order event-transition matrix (empirical Markov chain).

The product-analytics / behavioral-modeling staple: per key (user),
order the event stream and count (state -> next state) transitions;
the row-normalized counts are the maximum-likelihood transition
probabilities of the first-order Markov chain over event types.
``max_gap`` bounds what counts as a transition — a pair separated by
more than the gap is a session break, not a behavior (the same
interval-not-epoch convention as operators/temporal.sessionize:
TIMESTAMP_NTZ subtraction via epoch casts goes through the session
timezone; interval arithmetic is tz-free).

Execution shape (the one you'd want at 100 TB):

- ONE shuffle: the lead window hash-partitions by key; the
  (src, dst) group-by that follows is over |states|^2 keys and
  aggregates map-side first, so only the tiny matrix reshuffles;
- the row-normalizing sum is a window over the matrix frame itself
  (|states|^2 rows — negligible), never a second pass over events;
- per-key state is O(1); a bot user is one wide sort group, not a
  skewed shuffle of unrelated keys.

Determinism: callers must pass ``tiebreak_cols`` making
(ts, *tiebreak) a total order per key, or same-instant transitions
are engine-ordering dependent.

Reference parity: the reference (/root/reference, Rust, 978 LoC) is a
sketch library with no event semantics; this extends the engine's
event-analytics category (funnel.py, retention.py, temporal.py) with
sequence-model estimation under the same exactness discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def transition_matrix(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
    max_gap_minutes: int | None = None,
) -> DataFrame:
    """-> (src_state, dst_state, n, prob): transition counts and
    row-normalized probabilities. ``prob`` sums to 1 per src_state
    (exact ratio of BIGINT counts; round at the presentation edge).
    A key's last event emits no transition."""
    if max_gap_minutes is not None and max_gap_minutes <= 0:
        raise ValueError(f"max_gap_minutes must be positive, got {max_gap_minutes}")
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(key_col).orderBy(*order)

    pairs = events.select(
        F.col(state_col).alias("src_state"),
        F.lead(state_col).over(w).alias("dst_state"),
        F.lead(ts_col).over(w).alias("_next_ts"),
        F.col(ts_col).alias("_ts"),
    ).filter(F.col("dst_state").isNotNull())
    if max_gap_minutes is not None:
        pairs = pairs.filter(
            F.col("_next_ts")
            <= F.col("_ts") + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
        )

    counts = pairs.groupBy("src_state", "dst_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("src_state")
    return counts.select(
        "src_state",
        "dst_state",
        "n",
        (F.col("n") / F.sum("n").over(wrow)).alias("prob"),
    )
