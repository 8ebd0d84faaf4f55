"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; all
Spark-side machinery — schema, partition sizing, Arrow batch shape,
UDF signatures — is real and tested. The codec step itself (JPEG
decode, audio resample, video frame extraction) requires libraries not
present in this container, so it is STUBBED: ``decode_media`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (splitmix64 over payload bytes) produces stable feature
vectors so the downstream plumbing is fully exercisable.

Scale notes: media rows are orders of magnitude wider than text rows —
``media_batch_hint`` shrinks Arrow batches so a batch of 4K images
(~10 MB each) doesn't materialize gigabytes per task; feature extraction
emits narrow rows, so the expensive shuffle happens AFTER the 1000x
width reduction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sketch.hashing import splitmix64

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n_rows: int, *, payload_bytes: int = 4096) -> DataFrame:
    """Deterministic fake media table (payload = splitmix64 stream of
    the media_id) for exercising the plumbing."""

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        kinds = np.array(["image", "audio", "video"])
        n_words = payload_bytes // 8
        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                streams = splitmix64(
                    ids[:, None] * np.uint64(2654435761) + np.arange(n_words, dtype=np.uint64)[None, :]
                )
            payloads = [s.tobytes() for s in streams]
            kind = kinds[(ids % 3).astype(np.int64)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.view(np.int64), type=pa.int64()),
                    pa.array(kind.tolist(), type=pa.string()),
                    pa.array(payloads, type=pa.binary()),
                    pa.array((ids % 1920 + 64).astype(np.int32), type=pa.int32()),
                    pa.array((ids % 1080 + 64).astype(np.int32), type=pa.int32()),
                    pa.array((ids % 60000).astype(np.int32), type=pa.int32()),
                    pa.array(np.where(ids % 5 == 0, "cc", "crawl").tolist(), type=pa.string()),
                ],
                names=[
                    "media_id", "kind", "payload", "width", "height", "duration_ms", "source",
                ],
            )

    return spark.range(n_rows).mapInArrow(
        gen,
        schema=(
            "media_id bigint, kind string, payload binary, width int, "
            "height int, duration_ms int, source string"
        ),
    )


def decode_media(payload: bytes, kind: str, *, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a raw sample array.

    STUB: real decoding needs PIL/ffmpeg/torchaudio — not in this
    container. ``fake=True`` yields a deterministic uint8 array derived
    from the payload so pipelines are testable end to end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    raw = np.frombuffer(payload, dtype=np.uint8)
    return raw[: 1024 if kind == "image" else 2048]


def extract_features(
    media: DataFrame, *, fake_decode: bool = True, media_batch_hint: int = 256
) -> DataFrame:
    """media table -> (media_id, kind, feature array<float>, n_bytes).

    mapInArrow over narrow-sliced batches; the fake feature extractor is
    a deterministic hash-projection of the decoded sample (stands in for
    a CNN/audio embedding; swap the inner function when codecs exist).
    """

    def feats(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("media_id").to_numpy(zero_copy_only=False)
            kinds = batch.column("kind").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = np.zeros((len(ids), FEATURE_DIM), dtype=np.float32)
            n_bytes = np.zeros(len(ids), dtype=np.int64)
            for i, (pl, kd) in enumerate(zip(payloads, kinds)):
                if pl is None:
                    continue
                n_bytes[i] = len(pl)
                sample = decode_media(pl, kd, fake=fake_decode)
                words = np.frombuffer(
                    sample[: (len(sample) // 8) * 8].tobytes(), dtype=np.uint64
                )
                mixed = splitmix64(words * np.uint64(0x9E3779B97F4A7C15))
                lanes = mixed[: (len(mixed) // FEATURE_DIM) * FEATURE_DIM].reshape(
                    -1, FEATURE_DIM
                )
                out[i] = (lanes % np.uint64(1 << 20)).mean(axis=0) / float(1 << 20)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": ids.tolist(),
                    "kind": kinds,
                    "feature": list(out),
                    "n_bytes": n_bytes.tolist(),
                }
            )

    # media rows are wide: shrink batches so a task never materializes
    # more than ~media_batch_hint payloads at once
    spark = media.sparkSession
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(media_batch_hint))
    try:
        out = media.select("media_id", "kind", "payload").mapInArrow(
            feats, schema="media_id bigint, kind string, feature array<float>, n_bytes bigint"
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return out


def frame_sample_plan(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame
    timestamp (decode stubbed; timestamps & partitioning real).
    Demonstrates the explode-then-process shape that keeps each frame an
    independent row for downstream (narrow) feature extraction."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
