"""Structured Streaming sketch builds.

Sketch merges are associative + commutative (the algebra the reference
pins, mod.rs:621-761), so incremental maintenance is exactly
`foreachBatch` + OR-merge into a running sketch state row — each
micro-batch builds a partial sketch with the same tree pipeline as
batch mode, then merges it into the persisted state. Windowed distinct
counts come from keyed HLL partials per event-time window with a
watermark discarding late state.
"""

from .dedup import streaming_bloom_dedup, streaming_bloom_dedup_generational
from .sketch_stream import StreamingSketchState, streaming_bloom_build, windowed_distinct_users
from .stateful import (
    running_distinct_by_key,
    windowed_distinct,
    windowed_drift,
    windowed_quantiles,
    windowed_topk_tokens,
)

__all__ = [
    "StreamingSketchState",
    "running_distinct_by_key",
    "streaming_bloom_dedup",
    "streaming_bloom_dedup_generational",
    "windowed_distinct",
    "windowed_drift",
    "windowed_quantiles",
    "windowed_topk_tokens",
    "streaming_bloom_build",
    "windowed_distinct_users",
]
