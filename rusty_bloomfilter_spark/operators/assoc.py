"""Co-occurrence association over event types: support / confidence /
lift (the market-basket staple, user-level).

For every ordered pair of distinct event types (a, b): how many users
did both, what fraction of a-users also did b (confidence), and how
much more often than independence (lift = P(ab)/(P(a)P(b)) over the
user universe). Unlike operators/markov.py this ignores sequence —
it asks "do these behaviors co-occur in the same user at all".

Execution shape (the one you'd want at 100 TB):

- events collapse to DISTINCT (user, type) FIRST — one corpus-sized
  map-side-partial aggregate — so the pair join fans out over a
  per-user set bounded by |types|, never the user's raw event count
  (a bot with 10^6 clicks contributes the same one row as anybody);
- the pair self-join is per-user (co-partitioned on the join key) and
  emits at most |types|^2 rows per user; the (a, b) aggregate after it
  is map-side partial over a matrix-sized key space;
- per-type user counts are a second-level aggregate of the distinct
  frame, broadcast back onto the |types|^2-row matrix.

All counts are exact integers; the ratios are O(1) and rounded only at
the presentation edge.

Reference parity: the reference (/root/reference, Rust, 978 LoC) has
no event semantics; this completes the engine's behavioral-analytics
row (funnel ordered reach, markov sequential transitions, assoc
unordered co-occurrence) under the same exactness discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def cooccurrence_lift(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    item_col: str = "event_type",
    min_users: int = 1,
) -> DataFrame:
    """-> (item_a, item_b, n_both, n_a, n_b, n_keys, support,
    confidence, lift) for ordered pairs of distinct items with at
    least ``min_users`` keys doing both. Symmetric pairs both appear
    (confidence is directional)."""
    if min_users < 1:
        raise ValueError(f"min_users must be >= 1, got {min_users}")

    # corpus-sized work ends here: one distinct (key, item) aggregate.
    # The frame feeds four consumers (n_keys, per_item, both sides of
    # the pair join) — persist so the corpus is scanned exactly once;
    # tie() hands lifetime to the cache manager (never bare persist).
    ki = events.select(
        F.col(key_col).alias("key"), F.col(item_col).alias("item")
    ).distinct().persist()

    n_keys = ki.select("key").distinct().count()
    per_item = ki.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))

    a = ki.select("key", F.col("item").alias("item_a"))
    b = ki.select("key", F.col("item").alias("item_b"))
    both = (
        a.join(b, "key")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_users)
    )
    na = per_item.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    nb = per_item.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    nk = F.lit(n_keys).cast("double")
    out = (
        both.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            F.lit(n_keys).cast("bigint").alias("n_keys"),
            (F.col("n_both") / nk).alias("support"),
            (F.col("n_both") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_both") * nk) / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return tie(out, ki)
