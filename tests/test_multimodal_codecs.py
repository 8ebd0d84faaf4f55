"""Real WAV/BMP codecs (pure numpy) + distributed media_stats."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.multimodal import (
    decode_bmp24,
    decode_media,
    decode_wav_pcm16,
    encode_bmp24,
    encode_wav_pcm16,
    media_stats,
    synthetic_real_media,
)


def test_wav_roundtrip_mono():
    rng = np.random.default_rng(1)
    samples = rng.uniform(-0.9, 0.9, 4000)
    payload = encode_wav_pcm16(samples, 16000)
    got, sr = decode_wav_pcm16(payload)
    assert sr == 16000 and len(got) == 4000
    assert np.abs(got - samples).max() < 1.5 / 32767


def test_wav_extra_chunks_tolerated():
    import struct

    payload = encode_wav_pcm16(np.zeros(100), 8000)
    # splice a LIST chunk between fmt and data (RIFF chunk walking)
    head, data_chunk = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = (
        head[:4]
        + struct.pack("<I", len(head) + len(extra) + len(data_chunk) - 8)
        + head[8:]
        + extra
        + data_chunk
    )
    got, sr = decode_wav_pcm16(spliced)
    assert sr == 8000 and len(got) == 100


def test_wav_stereo_averaged():
    import struct

    left = np.full(50, 0.5)
    right = np.full(50, -0.5)
    inter = np.empty(100)
    inter[0::2], inter[1::2] = left, right
    mono_payload = encode_wav_pcm16(inter, 8000)
    # patch fmt: channels=2, byte_rate/align doubled
    b = bytearray(mono_payload)
    struct.pack_into("<H", b, 22, 2)
    struct.pack_into("<I", b, 28, 8000 * 4)
    struct.pack_into("<H", b, 32, 4)
    got, _ = decode_wav_pcm16(bytes(b))
    assert len(got) == 50
    assert np.abs(got).max() < 1e-3  # L/R cancel


@pytest.mark.parametrize("w,h", [(16, 16), (17, 9), (3, 1)])
def test_bmp_roundtrip_exact(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp24(encode_bmp24(px)), px)


def test_decode_media_dispatch():
    wav = encode_wav_pcm16(np.ones(64) * 0.5, 8000)
    raw = decode_media(wav, "audio")
    assert raw.dtype == np.uint8 and len(raw) == 128  # PCM16 bytes
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    flat = decode_media(encode_bmp24(px), "image")
    assert flat.shape == (48,)
    # JPEG now decodes for real; garbage after the magic is a ValueError
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0 fake jpeg bytes", "image")
    # genuinely unsupported formats still raise NotImplementedError
    with pytest.raises(NotImplementedError, match="WAV"):
        decode_media(b"\x00\x00\x00\x18ftypmp42 fake mp4", "video")
    assert len(decode_media(b"\x00" * 64, "image", fake=True)) == 64


def test_media_stats_real_features(spark):
    df = synthetic_real_media(spark, 40)
    rows = {r["media_id"]: r for r in media_stats(df).collect()}
    assert len(rows) == 40
    for mid, r in rows.items():
        if mid % 2 == 0:  # WAV: 0.6 sine + 0.1 noise
            assert r["kind"] == "audio" and r["sample_rate"] == 16000
            assert r["duration_ms"] == pytest.approx(50 + mid % 200, abs=1.0)
            # RMS of 0.6 sine ~ 0.4243; small noise adds ~0.001
            assert r["rms"] == pytest.approx(0.6 / np.sqrt(2), abs=0.02)
            # noise adds extra crossings near the sine's zeros, so ZCR
            # sits between the pure-sine rate and ~2x it
            freq = 220.0 + mid % 880
            base_zcr = 2 * freq / 16000
            assert 0.9 * base_zcr <= r["zero_cross_rate"] <= 2.5 * base_zcr
            assert r["width"] is None and r["mean_r"] is None
        else:  # image: BMP/PNG lossless, JPEG (ids ≡ 1 mod 8) lossy
            assert r["kind"] == "image"
            w, h = 16 + mid % 48, 16 + mid % 32
            assert (r["width"], r["height"]) == (w, h)
            expect_g = float(np.linspace(0, 255, w, dtype=np.uint8).mean())
            tol = 3.0 if mid % 8 == 1 else 1e-4  # JPEG q90 is lossy
            assert r["mean_g"] == pytest.approx(expect_g, abs=tol)
            assert r["sample_rate"] is None


def test_media_stats_undecodable_yields_metadata_row(spark):
    from rusty_bloomfilter_spark.operators.multimodal import synthetic_media

    df = synthetic_media(spark, 6)  # fake payloads: not WAV/BMP
    rows = media_stats(df).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["n_bytes"] > 0 and r["rms"] is None and r["width"] is None


# ---------------------------------------------------------------------------
# PNG (compressed): zlib inflate + numpy defilter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, channels):
    from rusty_bloomfilter_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7 * filter_type + channels)
    px = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    payload = encode_png(px, filter_type=filter_type)
    out = decode_png(payload)
    assert out.shape == (13, 17, channels)
    assert np.array_equal(out, px)


def test_png_grayscale_2d_input_roundtrip():
    from rusty_bloomfilter_spark.operators.multimodal import decode_png, encode_png

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_png(encode_png(px, filter_type=4))
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], px)


def test_png_compresses_smooth_gradients():
    """The point of a compressed format: a smooth gradient must come out
    far smaller than raw pixels (Sub filter + deflate)."""
    from rusty_bloomfilter_spark.operators.multimodal import encode_png

    px = np.tile(np.arange(256, dtype=np.uint8), (64, 3, 1)).transpose(0, 2, 1)
    assert px.shape == (64, 256, 3)
    payload = encode_png(px, filter_type=1)
    assert len(payload) < px.nbytes / 10


def test_png_rejects_corruption():
    from rusty_bloomfilter_spark.operators.multimodal import decode_png, encode_png

    good = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + bytes(good))
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip an IHDR byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(bytes(good[: len(good) // 2]))


def test_decode_media_dispatches_png():
    from rusty_bloomfilter_spark.operators.multimodal import decode_media, encode_png

    px = np.full((5, 6, 3), 200, dtype=np.uint8)
    flat = decode_media(encode_png(px), "image")
    assert np.array_equal(flat, px.reshape(-1))


def test_media_stats_decodes_real_png_rows(spark):
    """ids ≡ 3 (mod 4) in synthetic_real_media are PNGs with the same
    hash-gradient pixels as the BMP twin — stats must come out REAL
    (dims + channel means), proving compressed decode end to end."""
    from rusty_bloomfilter_spark.operators.multimodal import (
        media_stats,
        synthetic_real_media,
    )

    rows = {r["media_id"]: r for r in media_stats(synthetic_real_media(spark, 40)).collect()}
    png_ids = [i for i in range(40) if i % 4 == 3]
    assert png_ids
    for mid in png_ids:
        r = rows[mid]
        w, h = 16 + mid % 48, 16 + mid % 32
        assert r["kind"] == "image"
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_g"] == pytest.approx(
            float(np.linspace(0, 255, w, dtype=np.uint8).mean()), abs=1e-4
        )
        # PNG payloads are materially smaller than the raw pixel bytes
        assert 0 < r["n_bytes"] < 3 * w * h


def test_truncated_payloads_never_raise_non_valueerror():
    """Round-4 truncation fuzz: every prefix of a valid WAV/BMP/PNG
    payload must decode or raise ValueError/NotImplementedError — never
    struct.error/zlib.error/IndexError, which media_stats does not treat
    as 'undecodable payload' and which would fail the whole Spark task."""
    from rusty_bloomfilter_spark.operators.multimodal import (
        decode_bmp24,
        decode_png,
        decode_wav_pcm16,
        encode_bmp24,
        encode_png,
        encode_wav_pcm16,
    )

    px = np.full((12, 10, 3), 128, dtype=np.uint8)
    cases = [
        (encode_png(px), decode_png),
        (encode_bmp24(px), decode_bmp24),
        (encode_wav_pcm16(np.zeros(4000), 16000), decode_wav_pcm16),
    ]
    for enc, dec in cases:
        for cut in range(9, len(enc)):
            try:
                dec(enc[:cut])
            except (ValueError, NotImplementedError):
                pass
