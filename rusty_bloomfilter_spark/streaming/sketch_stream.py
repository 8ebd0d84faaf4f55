"""Streaming sketch maintenance (Structured Streaming)."""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketch import merge_sketch_payloads, sketch_from_bytes

# State-file header: magic + last-applied batch id, prepended to the
# sketch payload so (batch_id, payload) commit in ONE os.replace.
_STATE_MAGIC = b"RBST"
_STATE_HEADER = struct.Struct("<4sq")


class StreamingSketchState:
    """A running merged sketch persisted to a state file.

    foreachBatch sink: every micro-batch's rows fold into a partial
    sketch (same partition-build pipeline as batch mode), which then
    OR-merges into the persisted payload. Exactly-once per batch is
    guaranteed by Structured Streaming's batch-id dedup: the last
    applied batch id is stored in the SAME file as the payload (a small
    header before the sketch bytes), committed atomically via a single
    tmp-write + os.replace — a crash can never leave the id and the
    payload out of sync, so replays of non-idempotent sketches
    (CMS/KLL/t-digest counts) are never double-merged.
    """

    def __init__(self, state_path: str):
        self.state_path = state_path

    def _read_state(self) -> tuple[int, bytes] | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path, "rb") as fh:
            data = fh.read()
        if len(data) < _STATE_HEADER.size:
            return None
        magic, batch_id = _STATE_HEADER.unpack_from(data, 0)
        if magic != _STATE_MAGIC:
            raise ValueError(f"{self.state_path}: not a sketch state file")
        return batch_id, data[_STATE_HEADER.size :]

    def payload(self) -> bytes | None:
        state = self._read_state()
        return None if state is None else state[1]

    def sketch(self):
        data = self.payload()
        return None if data is None else sketch_from_bytes(data)

    def _last_batch(self) -> int:
        state = self._read_state()
        return -1 if state is None else state[0]

    def apply_batch(self, batch_payload: bytes, batch_id: int) -> None:
        state = self._read_state()
        if state is not None and batch_id <= state[0]:
            return  # replayed batch: idempotent skip
        merged = (
            batch_payload
            if state is None
            else merge_sketch_payloads([state[1], batch_payload])
        )
        tmp = self.state_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(_STATE_HEADER.pack(_STATE_MAGIC, batch_id))
            fh.write(merged)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.state_path)


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
