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
