"""Stream-static enrichment join.

The one Structured Streaming join shape that is FREE at 100 TB
scale: a micro-batch stream joined against a STATIC dimension frame
needs no watermark and no join state — Spark re-plans the static side
per micro-batch, and when the dimension fits the broadcast threshold
every batch is a map-side hash join (the streaming analogue of the
batch broadcast-dim pattern q_regional_volume pins). State cost:
zero. Contrast stream-stream joins, which buffer BOTH sides within
the watermark horizon.

Correctness contract: with a deterministic static side, replaying the
same input through any micro-batch split yields exactly the batch
join result — which is what the driver contract verifies
(q_streaming_enrich hash-matches the batch SQL join).

Caveat the docstring must carry: the static side is re-READ per
micro-batch (fresh snapshot each trigger on file sources) — for a
dimension that must stay frozen across a run, persist it or read a
pinned snapshot path; for slowly-changing dimensions that drift
mid-stream, that re-read is a feature (each batch sees the latest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Column,
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Inner-join a streaming frame with a static dimension.

    ``on`` is the join condition (e.g. ``stream.user_id ==
    dim.c_custkey``). ``broadcast_dim`` hints the static side into
    every micro-batch's build side — correct whenever the dimension
    fits executor memory; disable for giant dimensions and let AQE
    pick a shuffled join per batch.
    """
    if not stream.isStreaming:
        raise ValueError("stream_static_enrich: left side must be a streaming frame")
    if dim.isStreaming:
        raise ValueError(
            "stream_static_enrich: dimension side must be STATIC "
            "(stream-stream joins need watermarks and join state — "
            "different operator, different cost model)"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how="inner")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    before: str,
    after: str,
    watermark: str,
) -> DataFrame:
    """Stream-stream INNER join on key equality plus an event-time
    interval: right rows with ``right_ts`` in
    [left_ts − before, left_ts + after] — the attribution shape (views
    within the hour before a purchase). The STATEFUL streaming join:
    both sides buffer rows in state, and the interval condition plus
    the two watermarks are what BOUND that state — Spark derives each
    side's retention horizon from them (a right row is evictable once
    watermark passes right_ts + before; a left row once watermark
    passes left_ts + after), so state is O(rows within the horizon),
    never O(stream). Without the time bounds the state never drains —
    this function therefore requires all three time parameters.

    Inner-join matches emit as soon as both rows are present (the
    watermark gates CLEANUP, not emission), so with replay ordered
    within the watermark tolerance the result is exactly the batch
    interval join — which is what the contract query's hash check
    certifies. ``before``/``after``/``watermark`` are SQL interval
    body strings (e.g. ``"1 hour"``).
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "stream_stream_interval_join: both sides must be streaming "
            "(for a static side use stream_static_enrich — no state at all)"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    # backquote every interpolated identifier: a key named `order` (or
    # containing a space/dot) must parse as a COLUMN, never as SQL
    cond = F.expr(
        f"l.`{left_key}` = r.`{right_key}` AND "
        f"r.`{right_ts}` >= l.`{left_ts}` - INTERVAL {before} AND "
        f"r.`{right_ts}` <= l.`{left_ts}` + INTERVAL {after}"
    )
    return l.join(r, on=cond, how="inner")
