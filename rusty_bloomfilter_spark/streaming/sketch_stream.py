"""Streaming sketch maintenance (Structured Streaming)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketch import merge_sketch_payloads, sketch_from_bytes


class StreamingSketchState:
    """A running merged sketch persisted to a state file.

    foreachBatch sink: every micro-batch's rows fold into a partial
    sketch (same partition-build pipeline as batch mode), which then
    OR-merges into the persisted payload. Exactly-once per batch is
    guaranteed by Structured Streaming's batch-id dedup: we record the
    last applied batch id next to the payload and skip replays.
    """

    def __init__(self, state_path: str):
        self.state_path = state_path
        self._meta_path = state_path + ".batchid"

    def payload(self) -> bytes | None:
        if os.path.exists(self.state_path):
            with open(self.state_path, "rb") as fh:
                return fh.read()
        return None

    def sketch(self):
        data = self.payload()
        return None if data is None else sketch_from_bytes(data)

    def _last_batch(self) -> int:
        if os.path.exists(self._meta_path):
            return int(open(self._meta_path).read().strip())
        return -1

    def apply_batch(self, batch_payload: bytes, batch_id: int) -> None:
        if batch_id <= self._last_batch():
            return  # replayed batch: idempotent skip
        current = self.payload()
        merged = (
            batch_payload
            if current is None
            else merge_sketch_payloads([current, batch_payload])
        )
        tmp = self.state_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(merged)
        os.replace(tmp, self.state_path)
        with open(self._meta_path, "w") as fh:
            fh.write(str(batch_id))


def streaming_bloom_build(
    stream_df: DataFrame,
    sketch_builder,
    state: StreamingSketchState,
    *,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Maintain a Bloom (or any) sketch over a stream of sequences.

    ``sketch_builder`` is any operator with .build_bytes(df) — each
    micro-batch runs the standard partition-build + tree-merge, then the
    O(bytes) result folds into persistent state.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        payload, _ = sketch_builder.build_bytes(batch_df)
        state.apply_batch(payload, batch_id)

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_distinct_users(
    events_stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed distinct users with late-data handling:
    watermarked approx distinct per (window, event_type). Native
    approx_count_distinct (HLL++) — cross-checked against our HLL in
    batch tests; the watermark bounds state for unbounded streams."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "approx_users",
        )
    )
