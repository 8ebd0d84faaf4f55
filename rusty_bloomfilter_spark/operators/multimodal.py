"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; all
Spark-side machinery — schema, partition sizing, Arrow batch shape,
UDF signatures — is real and tested.

Decode status by format:
- **WAV (RIFF PCM16) and BMP (uncompressed 24-bit): REAL decoders**,
  pure struct+numpy (no codec libraries needed) — encode/decode
  round-trip pinned in tests, real audio features (duration, RMS,
  zero-crossing rate) and image features (dims, per-channel mean/std)
  computed distributed via mapInArrow (`media_stats`).
- JPEG/PNG/MP3/MP4: STUBBED — those need PIL/ffmpeg, absent in this
  container. ``decode_media`` raises NotImplementedError for them
  unless ``fake=True``, which yields a deterministic splitmix64 stream
  so downstream plumbing stays exercisable.

Scale notes: media rows are orders of magnitude wider than text rows —
``media_batch_hint`` shrinks Arrow batches so a batch of 4K images
(~10 MB each) doesn't materialize gigabytes per task; feature extraction
emits narrow rows, so the expensive shuffle happens AFTER the 1000x
width reduction.
"""

from __future__ import annotations

import struct
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


# ---------------------------------------------------------------------------
# Real codecs: WAV (RIFF PCM16) + BMP (uncompressed 24-bit), pure numpy
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV (canonical 44-byte RIFF header)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (float32 samples in [-1, 1], sample_rate). Walks RIFF chunks,
    so extra chunks (LIST/fact) are tolerated; PCM16 mono/stereo only
    (stereo is averaged to mono)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAVE fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    if n_channels > 1:
        pcm = pcm[: len(pcm) // n_channels * n_channels].reshape(-1, n_channels).mean(axis=1)
    return pcm, int(sample_rate)


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BMP (BITMAPINFOHEADER;
    bottom-up rows, BGR order, rows padded to 4 bytes — the spec)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8 pixels")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


def decode_bmp24(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bits, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bits != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP supported (bits={bits})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def decode_media(payload: bytes, kind: str, *, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a raw uint8 sample array.

    Real paths (magic-byte dispatch, no codec libraries): RIFF/WAVE
    PCM16 -> the PCM bytes; BMP 24-bit -> flattened RGB pixels. Other
    formats (JPEG/PNG/MP3/MP4) need PIL/ffmpeg — absent here — so they
    raise NotImplementedError unless ``fake=True``, which yields a
    deterministic uint8 array derived from the payload so pipelines
    stay testable end to end.
    """
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pcm, _sr = decode_wav_pcm16(payload)
        return (np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2").view(np.uint8)
    if len(payload) >= 2 and payload[:2] == b"BM":
        return decode_bmp24(payload).reshape(-1)
    if not fake:
        raise NotImplementedError(
            "only WAV(PCM16)/BMP payloads decode natively; JPEG/PNG/MP3/MP4 "
            "require codec libraries not present in this environment — pass "
            "fake=True for the deterministic test decoder"
        )
    raw = np.frombuffer(payload, dtype=np.uint8)
    return raw[: 1024 if kind == "image" else 2048]


def synthetic_real_media(spark: SparkSession, n_rows: int) -> DataFrame:
    """Deterministic media table with REAL decodable payloads: even ids
    are WAV (PCM16 sine + hash noise), odd ids are BMP (hash-gradient
    pixels). Pure function of the id — partition-layout independent."""

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
            rows = {k: [] for k in ("media_id", "kind", "payload", "width", "height", "duration_ms", "source")}
            for i in ids:
                u = np.uint64(i)
                if i % 2 == 0:
                    sr = 16000
                    dur_ms = 50 + int(i) % 200
                    n = sr * dur_ms // 1000
                    t = np.arange(n, dtype=np.float64) / sr
                    freq = 220.0 + float(int(i) % 880)
                    noise_bits = splitmix64(u + np.arange(n, dtype=np.uint64))
                    noise = (noise_bits % np.uint64(1 << 20)).astype(np.float64) / (1 << 20) - 0.5
                    wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * noise
                    rows["media_id"].append(int(i))
                    rows["kind"].append("audio")
                    rows["payload"].append(encode_wav_pcm16(wave, sr))
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["duration_ms"].append(dur_ms)
                else:
                    w = 16 + int(i) % 48
                    h = 16 + int(i) % 32
                    bits = splitmix64(u * np.uint64(31) + np.arange(w * h, dtype=np.uint64))
                    px = np.zeros((h, w, 3), dtype=np.uint8)
                    px[:, :, 0] = (bits % np.uint64(256)).astype(np.uint8).reshape(h, w)
                    px[:, :, 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
                    px[:, :, 2] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
                    rows["media_id"].append(int(i))
                    rows["kind"].append("image")
                    rows["payload"].append(encode_bmp24(px))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["duration_ms"].append(None)
                rows["source"].append("cc" if i % 5 == 0 else "crawl")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["media_id"], type=pa.int64()),
                    pa.array(rows["kind"], type=pa.string()),
                    pa.array(rows["payload"], type=pa.binary()),
                    pa.array(rows["width"], type=pa.int32()),
                    pa.array(rows["height"], type=pa.int32()),
                    pa.array(rows["duration_ms"], type=pa.int32()),
                    pa.array(rows["source"], type=pa.string()),
                ],
                names=list(rows),
            )

    return spark.range(n_rows).mapInArrow(
        gen,
        schema=(
            "media_id bigint, kind string, payload binary, width int, "
            "height int, duration_ms int, source string"
        ),
    )


def _sliced(batches: Iterator["pa.RecordBatch"], hint: int) -> Iterator["pa.RecordBatch"]:
    """Re-slice incoming Arrow batches to <= hint rows (zero-copy), so a
    chunk's decoded output stays bounded no matter how large a batch the
    JVM sends. (spark.sql.execution.arrow.maxRecordsPerBatch is read at
    ACTION time, session-wide — a per-operator set/restore around plan
    construction never reaches execution, so memory is bounded here, in
    the worker, instead.)"""
    for batch in batches:
        for off in range(0, batch.num_rows, hint):
            yield batch.slice(off, hint)


MEDIA_STATS_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sample_rate int, "
    "duration_ms double, rms double, zero_cross_rate double, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def media_stats(media: DataFrame, *, media_batch_hint: int = 256) -> DataFrame:
    """Real decoded per-media statistics, distributed: WAV -> sample
    rate / duration / RMS / zero-crossing rate; BMP -> dims and
    per-channel means. Non-decodable payloads yield a row with only
    (media_id, kind, n_bytes) — nulls elsewhere, never a task failure.
    Narrow rows out, so the expensive shuffle happens post-decode."""

    hint = int(media_batch_hint)

    def stats(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in _sliced(batches, hint):
            ids = batch.column("media_id").to_pylist()
            kinds = batch.column("kind").to_pylist()
            payloads = batch.column("payload").to_pylist()
            cols: dict[str, list] = {
                k.split()[0]: [] for k in MEDIA_STATS_SCHEMA.split(", ")
            }
            for mid, kd, pl in zip(ids, kinds, payloads):
                row = dict.fromkeys(cols)
                row["media_id"] = mid
                row["kind"] = kd
                row["n_bytes"] = 0 if pl is None else len(pl)
                if pl is not None:
                    b = bytes(pl)
                    try:
                        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                            pcm, sr = decode_wav_pcm16(b)
                            row["sample_rate"] = sr
                            row["duration_ms"] = round(1000.0 * len(pcm) / sr, 6)
                            row["rms"] = round(float(np.sqrt(np.mean(pcm**2))), 6)
                            row["zero_cross_rate"] = round(
                                float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))), 6
                            )
                        elif b[:2] == b"BM":
                            px = decode_bmp24(b)
                            row["height"], row["width"] = px.shape[0], px.shape[1]
                            means = px.reshape(-1, 3).mean(axis=0)
                            row["mean_r"] = round(float(means[0]), 6)
                            row["mean_g"] = round(float(means[1]), 6)
                            row["mean_b"] = round(float(means[2]), 6)
                    except (ValueError, NotImplementedError):
                        pass  # undecodable: metadata-only row
                for k, v in row.items():
                    cols[k].append(v)
            types = {
                "media_id": pa.int64(), "kind": pa.string(), "n_bytes": pa.int64(),
                "sample_rate": pa.int32(), "duration_ms": pa.float64(),
                "rms": pa.float64(), "zero_cross_rate": pa.float64(),
                "width": pa.int32(), "height": pa.int32(),
                "mean_r": pa.float64(), "mean_g": pa.float64(), "mean_b": pa.float64(),
            }
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[k], type=t) for k, t in types.items()], names=list(types)
            )

    return media.select("media_id", "kind", "payload").mapInArrow(
        stats, schema=MEDIA_STATS_SCHEMA
    )


def extract_features(
    media: DataFrame, *, fake_decode: bool = True, media_batch_hint: int = 256
) -> DataFrame:
    """media table -> (media_id, kind, feature array<float>, n_bytes).

    mapInArrow over narrow-sliced batches; the fake feature extractor is
    a deterministic hash-projection of the decoded sample (stands in for
    a CNN/audio embedding; swap the inner function when codecs exist).
    """

    hint = int(media_batch_hint)

    def feats(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in _sliced(batches, hint):
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

    return media.select("media_id", "kind", "payload").mapInArrow(
        feats, schema="media_id bigint, kind string, feature array<float>, n_bytes bigint"
    )


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
