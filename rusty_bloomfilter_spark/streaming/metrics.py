"""Streaming progress metrics: late-data accounting.

A watermark is a CONTRACT to drop data — rows arriving with event
times older than the horizon are silently discarded by stateful
operators, and nothing in the RESULT says how many. The only record
is the per-batch ``stateOperators[].numRowsDroppedByWatermark``
counter in StreamingQueryProgress. An operations team that does not
read it will eventually ship a dashboard that is quietly missing a
shard's worth of late events; reading it turns "silently wrong" into
"measured and alarmed" (pair with a dead-letter re-ingest for the
dropped slice).

``progress_drop_stats`` folds a finished (or running) query's
retained progress history into one dict. availableNow replays retain
every batch's progress in ``recentProgress`` (default retention 100
batches — raise spark.sql.streaming.numRecentProgressUpdates for
longer replays).
"""

from __future__ import annotations


def progress_drop_stats(query) -> dict:
    """Fold a StreamingQuery's recentProgress into late-data totals:
    ``n_input_rows`` (source rows across batches), ``n_dropped_late``
    (sum of every state operator's numRowsDroppedByWatermark),
    ``n_batches``. Call after ``awaitTermination`` for a complete
    availableNow accounting."""
    n_input = 0
    n_dropped = 0
    n_batches = 0
    for p in query.recentProgress:
        if p is None:
            continue
        n_batches += 1
        n_input += int(p.get("numInputRows", 0) or 0)
        for op in p.get("stateOperators", []) or []:
            n_dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
    return {
        "n_input_rows": n_input,
        "n_dropped_late": n_dropped,
        "n_batches": n_batches,
    }
