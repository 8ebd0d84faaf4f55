"""Pure-numpy baseline JPEG codec (operators/jpeg.py): round-trips,
spec headers, restart markers, error paths, and the distributed
media_stats integration over real JPEG payloads."""

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.jpeg import (
    QT_LUM,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_scale,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (x * 255 // max(w - 1, 1)).astype(np.uint8),
            (y * 255 // max(h - 1, 1)).astype(np.uint8),
            ((x + y) * 255 // max(w + h - 2, 1)).astype(np.uint8),
        ],
        axis=-1,
    )


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 85, 50])
def test_roundtrip_smooth_content(subsample, quality):
    px = _gradient(48, 64)
    enc = encode_jpeg(px, quality=quality, subsample=subsample)
    dec = decode_jpeg(enc)
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    # smooth gradients survive DCT quantization with small error
    bound = {95: 8, 85: 10, 50: 16}[quality]
    assert err.max() <= bound, f"max abs err {err.max()} > {bound}"
    assert err.mean() <= 3.0


def test_roundtrip_non_multiple_of_8_dims():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(px, quality=95, subsample=sub))
        assert dec.shape == px.shape  # edge padding cropped back


def test_roundtrip_grayscale():
    y, x = np.mgrid[0:40, 0:56]
    g = (x * y * 255 // (55 * 39)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 4


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers_do_not_change_pixels(interval):
    px = _gradient(40, 56)
    base = decode_jpeg(encode_jpeg(px, quality=90, subsample="420"))
    with_rst = decode_jpeg(
        encode_jpeg(px, quality=90, subsample="420", restart_interval=interval)
    )
    assert np.array_equal(base, with_rst)


def test_header_bytes_pinned():
    """SOI/JFIF-APP0/EOI and quantization table layout per T.81."""
    enc = encode_jpeg(_gradient(8, 8), quality=50)
    assert enc[:2] == b"\xff\xd8"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    assert enc[-2:] == b"\xff\xd9"
    # quality=50 leaves the Annex-K luminance table unscaled; DQT stores
    # it in zigzag order after the (precision<<4 | id) byte
    dqt = enc.index(b"\xff\xdb")
    stored = np.frombuffer(enc[dqt + 5 : dqt + 5 + 64], dtype=np.uint8)
    assert np.array_equal(stored.astype(np.int64), QT_LUM[ZIGZAG])


def test_quality_scale_monotone():
    q10 = quality_scale(QT_LUM, 10)
    q50 = quality_scale(QT_LUM, 50)
    q95 = quality_scale(QT_LUM, 95)
    assert (q10 >= q50).all() and (q50 >= q95).all()
    assert np.array_equal(q50, QT_LUM)
    assert q95.min() >= 1


def test_progressive_rejected_with_marker_name():
    enc = bytearray(encode_jpeg(_gradient(16, 16)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="0xFFC2"):
        decode_jpeg(bytes(enc))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 not really a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"PNG?")


def test_decode_media_dispatches_jpeg():
    from rusty_bloomfilter_spark.operators.multimodal import decode_media

    px = _gradient(24, 24)
    flat = decode_media(encode_jpeg(px, quality=95), "image")
    assert flat.shape == (24 * 24 * 3,)
    assert np.abs(flat.astype(int) - px.reshape(-1).astype(int)).max() <= 8


def test_media_stats_decodes_real_jpeg_rows(spark):
    """ids ≡ 1 (mod 8) in synthetic_real_media are 4:2:0 JPEGs with the
    same hash-gradient pixels as the BMP twin — stats must come out REAL
    (dims exact, channel means within lossy tolerance), proving the
    lossy-compressed decode end to end in the distributed operator."""
    from rusty_bloomfilter_spark.operators.multimodal import (
        media_stats,
        synthetic_real_media,
    )

    rows = {r["media_id"]: r for r in media_stats(synthetic_real_media(spark, 40)).collect()}
    jpeg_ids = [i for i in range(40) if i % 8 == 1]
    assert jpeg_ids
    for mid in jpeg_ids:
        r = rows[mid]
        w, h = 16 + mid % 48, 16 + mid % 32
        assert r["kind"] == "image"
        assert (r["width"], r["height"]) == (w, h)
        expect_g = float(np.linspace(0, 255, w, dtype=np.uint8).mean())
        assert r["mean_g"] == pytest.approx(expect_g, abs=3.0)
        # compressed: payload smaller than raw pixels once the image is
        # big enough for content to dominate the ~600B of fixed headers
        assert r["n_bytes"] > 0
        if 3 * w * h > 2500:
            assert r["n_bytes"] < 3 * w * h


@pytest.mark.parametrize("cut_frac", [0.5, 0.75, 0.95])
def test_truncated_entropy_is_valueerror_not_indexerror(cut_frac):
    """Crawl payloads truncate mid-stream; the bit reader must surface
    ValueError (which media_stats converts to a metadata-only row), never
    IndexError (which would fail the whole Spark task)."""
    px = _gradient(40, 56)
    enc = encode_jpeg(px, quality=90)
    cut = int(len(enc) * cut_frac)
    try:
        decode_jpeg(enc[:cut])  # tiny cuts can still decode - fine
    except (ValueError, NotImplementedError):
        pass


def test_media_stats_truncated_jpeg_is_metadata_row(spark):
    from rusty_bloomfilter_spark.operators.multimodal import media_stats

    enc = encode_jpeg(_gradient(24, 24), quality=90)
    media = spark.createDataFrame(
        [(1, "image", bytearray(enc[: len(enc) // 2]))],
        "media_id long, kind string, payload binary",
    )
    rows = media_stats(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bytes"] > 0 and r["width"] is None and r["mean_g"] is None


def _strip_segments(enc: bytes, marker: int) -> bytes:
    """Remove every 0xFF<marker> segment (with its length body)."""
    out = bytearray()
    data = bytes(enc)
    pos = 0
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] == marker:
            seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
            pos += 2 + seglen
            continue
        out.append(data[pos])
        pos += 1
    out.extend(data[pos:])
    return bytes(out)


def test_missing_dht_is_valueerror_not_keyerror():
    """Stripped Huffman tables (crawl garbage) must raise ValueError so
    media_stats degrades to a metadata-only row. Round-4 review finding:
    huff_dc[td] used to raise KeyError, escaping the except clause."""
    enc = encode_jpeg(_gradient(16, 16), quality=90)
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg(_strip_segments(enc, 0xC4))


def test_missing_dqt_is_valueerror_not_keyerror():
    enc = encode_jpeg(_gradient(16, 16), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(_strip_segments(enc, 0xDB))


def test_fill_bytes_before_markers_accepted():
    """B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    real encoders emit them. Round-4 review finding: the scan used to
    misparse marker=0xFF as a segment and reject the file."""
    enc = bytes(encode_jpeg(_gradient(16, 16), quality=90))
    sof = enc.index(b"\xff\xc0")
    sos = enc.index(b"\xff\xda")
    padded = enc[:sof] + b"\xff\xff\xff" + enc[sof:sos] + b"\xff" + enc[sos:]
    base = decode_jpeg(enc)
    assert (decode_jpeg(padded) == base).all()


def test_multiscan_baseline_rejected_loudly():
    """A first SOS covering fewer components than the frame (spec-legal
    baseline multi-scan layout) must raise NotImplementedError, never
    decode with interleaved geometry and emit garbage."""
    enc = bytearray(encode_jpeg(_gradient(16, 16), quality=90))
    sos = bytes(enc).index(b"\xff\xda")
    # original SOS: len=12, ns=3, then 3x(cid, tables), then Ss/Se/AhAl
    assert enc[sos + 4] == 3
    single = (
        b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        + bytes(enc[sos + 5 : sos + 7])  # first component's (cid, tables)
        + bytes(enc[sos + 11 : sos + 14])  # Ss, Se, AhAl
    )
    patched = bytes(enc[:sos]) + single + bytes(enc[sos + 14 :])
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(patched)


def test_decode_budget_guard():
    """Streams over DECODE_BUDGET_BYTES refuse loudly without opt-in:
    the Python entropy loop is thumbnail-tier by contract (r4 verdict
    item 6) — bulk media must take the container/frame-plan tier."""
    import numpy as np
    import pytest

    from rusty_bloomfilter_spark.operators.jpeg import (
        DECODE_BUDGET_BYTES,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    small = encode_jpeg(px, quality=90)
    # pad with legal pre-SOI fill to exceed the budget without a
    # multi-MB real encode: the guard must fire on BYTES, pre-parse
    big = small + b"\x00" * (DECODE_BUDGET_BYTES + 1 - len(small))
    with pytest.raises(ValueError, match="decode budget"):
        decode_jpeg(big)
    # explicit opt-in still decodes (trailing pad after EOI is ignored)
    assert decode_jpeg(big, allow_large=True).shape == (16, 16, 3)
    assert decode_jpeg(small).shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# r6: table-driven entropy decoder pins (LUT + inlined bit loop)
# ---------------------------------------------------------------------------


def test_r6_decoder_golden_pixels():
    """Deterministic encode->decode pin for the r6 table-driven entropy
    decoder (LUT + locals-inlined MCU loop, restart markers + 4:2:0):
    the goldens were computed from a decode verified bit-identical to
    the pre-r6 per-bit reader over a 149-image corpus."""
    import hashlib

    rng = np.random.default_rng(20260821)
    h, w = 120, 88
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 1.1 + yy * 0.9) % 256
    px = np.clip(base[..., None] + rng.normal(0, 20, (h, w, 3)), 0, 255).astype(
        np.uint8
    )
    data = encode_jpeg(px, quality=77, subsample="420", restart_interval=4)
    assert hashlib.md5(data).hexdigest() == "f991231103d33842805a470da691e56f"
    out = decode_jpeg(data)
    assert out.shape == (120, 88, 3) and out.dtype == np.uint8
    assert hashlib.md5(out.tobytes()).hexdigest() == "34d3d33a4fa87f44257657720a6dd8f0"


def test_r6_bitreader_lut_matches_canonical_walk():
    """The 16-bit-peek LUT must resolve every symbol exactly like the
    canonical mincode/maxcode/valptr walk it replaced (F.2.2.3)."""
    from rusty_bloomfilter_spark.operators.jpeg import (
        HT_AC_LUM,
        HT_DC_LUM,
        _HuffDecoder,
    )

    for bits, vals in (HT_DC_LUM, HT_AC_LUM):
        table = _HuffDecoder(list(bits), list(vals))
        # reconstruct each canonical code, place it at the head of a
        # 16-bit prefix, and check the LUT returns (length, symbol)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                for tail in (0, (1 << (16 - length)) - 1):  # both paddings
                    idx = (code << (16 - length)) | tail
                    v = table.lut[idx]
                    assert v >> 8 == length
                    assert v & 0xFF == vals[k]
                code += 1
                k += 1
            code <<= 1
