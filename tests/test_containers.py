"""MP4 (ISO BMFF) + MP3 container parsers: structure walk, sample-table
expansion, crawl-garbage robustness, and the Spark frame-plan /
container-stats operators built on them."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rusty_bloomfilter_spark.operators.containers import (
    MP4_DATA_START,
    encode_mp3_cbr,
    encode_mp4,
    mp4_sample_table,
    parse_mp3,
    parse_mp4,
)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("i", [0, 1, 7, 38, 63])
def test_mp4_roundtrip_closed_form(i):
    n = 24 + i % 40
    delta = 20 + (i % 5) * 10
    sizes = 200 + ((i * 31 + np.arange(n, dtype=np.int64) * 17) % 512)
    w, h = 160 + (i % 4) * 80, 120 + (i % 3) * 60
    payload = encode_mp4(sizes, delta_ticks=delta, timescale=1000, width=w, height=h)

    meta = parse_mp4(payload)
    assert meta["brand"] == "isom"
    assert meta["codec"] == "avc1"
    assert meta["handler"] == "vide"
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["timescale"] == 1000 and meta["duration"] == n * delta
    assert meta["n_samples"] == n

    t = mp4_sample_table(payload)
    assert (t["sizes"] == sizes).all()
    assert (t["ts_ticks"] == np.arange(n) * delta).all()
    assert t["duration_ticks"] == n * delta
    expected_off = MP4_DATA_START + np.concatenate(([0], np.cumsum(sizes)[:-1]))
    assert (t["offsets"] == expected_off).all()
    # the byte ranges really address the mdat payload
    last_end = int(t["offsets"][-1] + t["sizes"][-1])
    moov_start = payload.index(b"moov") - 4
    assert last_end == moov_start


def test_mp4_truncation_raises_valueerror():
    """Every truncation point raises ValueError from parse_mp4 (mid-box
    cut) or, for cuts landing exactly on a box boundary (a structurally
    complete prefix missing moov), from mp4_sample_table (incomplete
    sample tables) — never a crash or a silent wrong answer."""
    payload = encode_mp4(np.array([100, 200, 300]), delta_ticks=40)
    for cut in list(range(0, 64)) + list(range(64, len(payload), 53)):
        with pytest.raises(ValueError):
            mp4_sample_table(payload[:cut] if cut else b"")


def test_mp4_undersized_boxes_raise_valueerror():
    """A box whose DECLARED size is smaller than its fixed fields must
    raise ValueError — not struct.error (escapes the Spark operators'
    except clause) and not a silent read of the next box's bytes
    (mid-file case). Round-4 review finding."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    for typ in (b"mvhd", b"mdhd", b"tkhd", b"stts", b"stsc", b"stsz", b"stco", b"co64", b"hdlr", b"stsd"):
        tiny = struct.pack(">I", 12) + typ + struct.pack(">I", 0)  # only a version word
        # as last box (reads would run past EOF) ...
        with pytest.raises(ValueError):
            parse_mp4(ftyp + _box(b"moov", tiny))
        # ... and mid-file (reads would land in the NEXT box's bytes)
        with pytest.raises(ValueError):
            parse_mp4(ftyp + _box(b"moov", tiny + _box(b"free", b"\x00" * 64)))


def test_mp4_corrupt_counts_never_allocate():
    """Corrupt sample counts must raise ValueError BEFORE any
    count-driven allocation: a fixed-size stsz or an stts run count is
    an arbitrary u32, and expanding it first would np.full gigabytes on
    one crawl-garbage payload (found by fuzzing — the mutated file hung
    the process before the guards)."""
    base = encode_mp4(np.array([50, 60, 70]), delta_ticks=30)
    # fixed-size stsz claiming 2^31 samples
    old = _full(b"stsz", 0, 0, struct.pack(">II", 0, 3) + np.array([50, 60, 70], dtype=">u4").tobytes())
    fixed_huge = _full(b"stsz", 0, 0, struct.pack(">II", 8, 1 << 31) + b"\x00" * 12)
    assert old in base and len(fixed_huge) == len(old)
    with pytest.raises(ValueError):
        parse_mp4(base.replace(old, fixed_huge))
    # stts run count of 2^31 (box still well-formed)
    old_stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 3, 30))
    huge_stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 1 << 31, 30))
    assert old_stts in base
    with pytest.raises(ValueError):
        mp4_sample_table(base.replace(old_stts, huge_stts))


def test_parsers_fuzz_exception_hygiene():
    """Mutated real files and raw noise raise ONLY ValueError /
    NotImplementedError (the types the Spark operators catch) — never
    struct.error/KeyError/IndexError, never a multi-second stall."""
    rng = np.random.default_rng(7)
    base = encode_mp4(np.array([50, 60, 70]), delta_ticks=30)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        for fn in (parse_mp4, mp4_sample_table):
            try:
                fn(bytes(buf))
            except (ValueError, NotImplementedError):
                pass
        noise = rng.integers(0, 256, int(rng.integers(4, 300)), dtype=np.uint8).tobytes()
        for fn in (parse_mp4, parse_mp3, mp4_sample_table):
            try:
                fn(noise)
            except (ValueError, NotImplementedError):
                pass


def test_mp4_not_bmff_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)
    # valid box grammar but no ftyp
    with pytest.raises(ValueError):
        parse_mp4(_box(b"free", b"\x00" * 8))


def test_mp4_largesize_and_co64():
    """64-bit box sizes and 64-bit chunk offsets both parse."""
    base = encode_mp4(np.array([64, 64]), delta_ticks=10)
    meta = parse_mp4(base)
    assert meta["n_samples"] == 2

    # rebuild the mdat with a largesize header (size=1 + 64-bit size)
    ftyp_len = 24
    mdat_size = struct.unpack_from(">I", base, ftyp_len)[0]
    mdat_body = base[ftyp_len + 8 : ftyp_len + mdat_size]
    big_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body
    moov = base[ftyp_len + mdat_size :]
    # chunk data moved 8 bytes later; swap stco for co64 with the new offset
    old_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, ftyp_len + 8))
    new_co64 = _full(b"co64", 0, 0, struct.pack(">IQ", 1, ftyp_len + 16))
    assert old_stco in moov
    moov = moov.replace(old_stco, new_co64)
    # stbl/minf/mdia/trak/moov sizes grew by 4 (co64 is 4 bytes larger)
    for typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = moov.index(typ) - 4
        moov = (
            moov[:at]
            + struct.pack(">I", struct.unpack_from(">I", moov, at)[0] + 4)
            + moov[at + 4 :]
        )
    patched = base[:ftyp_len] + big_mdat + moov
    t = mp4_sample_table(patched)
    assert (t["offsets"] == np.array([40, 104])).all()
    assert (t["sizes"] == np.array([64, 64])).all()


def test_mp4_multichunk_stsc_expansion():
    """Hand-built sample tables: 5 samples over chunks of 2+2+1 with a
    two-run stsc — offsets reset per chunk."""
    sizes = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    chunk_offsets = [1000, 2000, 3000]
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + struct.pack(">I", 16) + b"avc1" + b"\x00" * 8,
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 5, 100))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)  # chunks 1-2: 2 samples each
        + struct.pack(">III", 3, 1, 1),  # chunk 3: 1 sample
    )
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 5) + sizes.astype(">u4").tobytes())
    stco = _full(b"stco", 0, 0, struct.pack(">I", 3) + struct.pack(">III", *chunk_offsets))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 500) + struct.pack(">HH", 0x55C4, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", mdhd + _box(b"minf", stbl))))
    payload = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + moov

    t = mp4_sample_table(payload)
    assert (t["offsets"] == np.array([1000, 1010, 2000, 2030, 3000])).all()
    assert (t["ts_ticks"] == np.array([0, 100, 200, 300, 400])).all()


def test_mp4_stsc_count_mismatch_raises():
    payload = encode_mp4(np.array([10, 10, 10]), delta_ticks=5)
    # corrupt stsc: claim 2 samples per chunk over 1 chunk (!= stsz's 3)
    good = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
    bad = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 2, 1))
    assert good in payload
    with pytest.raises(ValueError):
        mp4_sample_table(payload.replace(good, bad))


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_cbr_roundtrip():
    payload = encode_mp3_cbr(30, bitrate_kbps=128, sample_rate=44100)
    m = parse_mp3(payload)
    assert m["n_frames"] == 30
    assert m["sample_rate"] == 44100
    assert m["bitrate_kbps"] == 128 and not m["vbr"]
    assert m["n_samples"] == 30 * 1152
    assert m["duration_ms"] == 30 * 1152 * 1000.0 / 44100
    assert m["junk_bytes"] == 0 and m["id3v2_bytes"] == 0


def test_mp3_id3v2_skip_and_trailing_tag():
    payload = encode_mp3_cbr(8, id3=b"\x00" * 100) + b"TAG" + b"\x00" * 125
    m = parse_mp3(payload)
    assert m["n_frames"] == 8
    assert m["id3v2_bytes"] == 110
    assert m["junk_bytes"] == 128  # the ID3v1 block, counted not parsed


def test_mp3_resync_across_junk():
    a = encode_mp3_cbr(5)
    payload = b"\xde\xad\xbe\xef" * 3 + a[: len(a) // 2] + b"\x00" * 7 + a
    m = parse_mp3(payload)
    # first half ends mid-frame: its final partial frame doesn't count
    assert m["n_frames"] >= 7
    assert m["junk_bytes"] > 0


def test_mp3_vbr_detection():
    payload = encode_mp3_cbr(4, bitrate_kbps=128) + encode_mp3_cbr(4, bitrate_kbps=192)
    m = parse_mp3(payload)
    assert m["n_frames"] == 8
    assert m["vbr"] and m["bitrate_kbps"] is None


def test_mp3_mpeg2_frames():
    """Hand-built MPEG-2 Layer III header: 576 samples, 72-coefficient
    frame length."""
    kbps, sr = 64, 22050
    flen = 72 * kbps * 1000 // sr
    hdr = bytes([0xFF, 0xF3, (8 << 4) | (0 << 2), 0x44])  # idx8=64k, idx0=22050
    payload = (hdr + b"\x00" * (flen - 4)) * 6
    m = parse_mp3(payload)
    assert m["n_frames"] == 6
    assert m["sample_rate"] == 22050
    assert m["n_samples"] == 6 * 576
    assert m["duration_ms"] == 6 * 576 * 1000.0 / 22050


def test_mp3_garbage_raises():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 256)
    with pytest.raises(ValueError):
        parse_mp3(b"", )


# ---------------------------------------------------------------------------
# Property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import assume, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 4000), min_size=1, max_size=80),
    delta=st.integers(1, 5000),
    timescale=st.sampled_from([600, 1000, 90000]),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
)
def test_mp4_roundtrip_property(sizes, delta, timescale, w, h):
    arr = np.array(sizes, dtype=np.int64)
    payload = encode_mp4(arr, delta_ticks=delta, timescale=timescale, width=w, height=h)
    t = mp4_sample_table(payload)
    assert (t["sizes"] == arr).all()
    assert (t["ts_ticks"] == np.arange(len(arr)) * delta).all()
    assert t["timescale"] == timescale
    assert (np.diff(t["offsets"]) == arr[:-1]).all()
    assert t["offsets"][0] == MP4_DATA_START
    meta = parse_mp4(payload)
    assert (meta["width"], meta["height"]) == (w, h)


@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(1, 60),
    kbps=st.sampled_from([32, 64, 128, 192, 320]),
    sr=st.sampled_from([44100, 48000, 32000]),
    id3_len=st.integers(0, 300),
    # junk with no 0xFF can never alias to a frame sync, so the parse
    # stays EXACT no matter what precedes the stream (a random 0xFF in
    # junk may legitimately swallow real bytes as a plausible frame —
    # that lossy resync behavior is covered by test_mp3_resync_across_junk)
    junk_prefix=st.lists(st.integers(0, 0xFE), max_size=40).map(bytes),
)
def test_mp3_roundtrip_property(n_frames, kbps, sr, id3_len, junk_prefix):
    assume(not junk_prefix.startswith(b"ID3"))  # junk must not form a tag header
    payload = encode_mp3_cbr(n_frames, bitrate_kbps=kbps, sample_rate=sr, id3=b"\x01" * id3_len)
    if junk_prefix:
        payload = junk_prefix + payload  # junk hides the ID3 tag; frames still parse
    m = parse_mp3(payload)
    assert m["n_frames"] == n_frames
    assert m["sample_rate"] == sr
    assert m["bitrate_kbps"] == kbps and not m["vbr"]
    assert m["duration_ms"] == n_frames * 1152 * 1000.0 / sr


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_synthetic_video_media_parses(spark):
    from rusty_bloomfilter_spark.operators.multimodal import (
        container_stats,
        synthetic_video_media,
    )

    media = synthetic_video_media(spark, 30)
    rows = {r["media_id"]: r for r in container_stats(media).collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        if i % 3 == 2:
            assert r["container"] == "mp3"
            assert r["n_frames"] == 20 + i % 30
            assert r["sample_rate"] == 44100
        else:
            assert r["container"] == "mp4"
            assert r["codec"] == "avc1"
            assert r["n_frames"] == 24 + i % 40
            assert r["duration_ms"] == (24 + i % 40) * (20 + (i % 5) * 10)
            assert r["width"] == 160 + (i % 4) * 80


def test_frame_plan_bytes_matches_closed_form(spark):
    from rusty_bloomfilter_spark.operators.multimodal import (
        frame_sample_plan_bytes,
        synthetic_video_media,
    )

    media = synthetic_video_media(spark, 12)
    plan = frame_sample_plan_bytes(media, every_ms=250).collect()
    assert plan  # non-empty
    by_media: dict[int, list] = {}
    for r in plan:
        by_media.setdefault(r["media_id"], []).append(r)
    for i, rows in by_media.items():
        assert i % 3 != 2  # only mp4 rows
        n, delta = 24 + i % 40, 20 + (i % 5) * 10
        sizes = 200 + ((i * 31 + np.arange(n, dtype=np.int64) * 17) % 512)
        offs = MP4_DATA_START + np.concatenate(([0], np.cumsum(sizes)[:-1]))
        expect_ticks = list(range(0, n * delta, 250))
        assert [r["tick_ms"] for r in sorted(rows, key=lambda r: r["tick_ms"])] == expect_ticks
        for r in rows:
            idx = r["tick_ms"] // delta
            assert r["frame_idx"] == idx
            assert r["frame_ts_ms"] == idx * delta
            assert r["byte_off"] == offs[idx]
            assert r["byte_len"] == sizes[idx]


def test_frame_hash_near_dups_catches_remuxed_copies(spark):
    """Video near-dup via sampled-frame content hashes: an exact byte
    copy AND a re-muxed copy (identical mdat frames, different
    container metadata — width/codec/timescale rewritten) must both
    pair with the original; an unrelated video must not."""
    from rusty_bloomfilter_spark.operators.cache import free
    from rusty_bloomfilter_spark.operators.multimodal import frame_hash_near_dups

    sizes = np.array([300, 400, 500, 350, 450])
    orig = encode_mp4(sizes, delta_ticks=400, timescale=1000, width=320, height=240)
    # re-mux: same sample sizes -> identical deterministic mdat bytes,
    # but different track metadata and a rescaled clock
    remux = encode_mp4(
        sizes, delta_ticks=24000, timescale=60000, width=640, height=480, codec=b"mp4v"
    )
    other = encode_mp4(np.array([301, 401, 501, 351, 451]), delta_ticks=400)
    rows = [
        (1, bytearray(orig)),
        (2, bytearray(orig)),   # exact copy
        (3, bytearray(remux)),  # re-muxed copy
        (4, bytearray(other)),  # different frames
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    pairs = {
        (r["media_a"], r["media_b"]): r["n_common_frames"]
        for r in frame_hash_near_dups(df, every_ms=400, min_common=2).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert all(v == len(sizes) for v in pairs.values())
    free(frame_hash_near_dups(df, every_ms=400))  # lifecycle smoke


def test_synthetic_videos_have_distinct_frames():
    """Pin the property q_video_near_dups' oracle silently depends on:
    encode_mp4's filler is POSITION-derived (id-independent), so two
    synthetic videos would share a frame hash iff some frame occupies
    the same (offset, length) byte range in both. Verify the sizes
    formula never aligns any two of the contract's 60 ids — if a future
    tweak to the formula breaks this, fail here with a clear message
    rather than as a confusing oracle mismatch in the driver."""
    ranges: dict[tuple[int, int], int] = {}
    for i in range(60):
        if i % 3 == 2:
            continue
        n = 24 + i % 40
        sizes = 200 + ((i * 31 + np.arange(n, dtype=np.int64) * 17) % 512)
        offs = MP4_DATA_START + np.concatenate(([0], np.cumsum(sizes)[:-1]))
        for off, ln in zip(offs.tolist(), sizes.tolist()):
            prev = ranges.setdefault((off, ln), i)
            assert prev == i, (
                f"ids {prev} and {i} share frame byte-range ({off},{ln}): "
                "position-derived filler would hash-collide across videos"
            )


def test_tick_frames_guard_rejects_huge_grid_keeps_sparse_files():
    """A parseable MP4 whose stts delta / timescale imply a tick grid
    beyond the absolute allocation bound must be skipped; but a VALID
    low-frame-rate file (sparse keyframes — e.g. a slideshow with
    frames many seconds apart) must still produce a plan: the guard
    bounds allocation, it does not judge plausibility (round-4 review
    finding, revised by a second finding)."""
    from rusty_bloomfilter_spark.operators.multimodal import (
        _MAX_TICKS,
        _mp4_tick_frames,
    )

    sane = encode_mp4(np.array([100, 100, 100]), delta_ticks=40, timescale=1000)
    assert _mp4_tick_frames(sane, 250) is not None
    # 3 samples 10 s apart sampled every 100 ms: 300 ticks for 3 frames —
    # a valid slideshow; a per-frame ratio guard would wrongly drop it
    sparse = encode_mp4(
        np.array([100, 100, 100]), delta_ticks=10_000, timescale=1000
    )
    tf = _mp4_tick_frames(sparse, 100)
    assert tf is not None
    assert len(tf[2]) == 300
    # grid beyond the absolute bound: ~1.2e6 ticks > _MAX_TICKS
    corrupt = encode_mp4(
        np.array([100, 100, 100]), delta_ticks=100_000_000, timescale=1000
    )
    assert (3 * 100_000_000 + 249) // 250 > _MAX_TICKS
    assert _mp4_tick_frames(corrupt, 250) is None


def test_zero_sample_mp4_raises_and_is_skipped(spark):
    """stsz cnt=0 with consistent tables must raise ValueError in
    mp4_sample_table (offsets/ts arrays would disagree in length — an
    IndexError trap, round-4 review finding) and be skipped by the
    Spark operators."""
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + struct.pack(">I", 16) + b"avc1" + b"\x00" * 8)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 0, 100))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 0, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 32))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0) + struct.pack(">HH", 0x55C4, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", mdhd + _box(b"minf", stbl))))
    payload = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + moov
    with pytest.raises(ValueError, match="zero samples"):
        mp4_sample_table(payload)

    from rusty_bloomfilter_spark.operators.multimodal import (
        frame_sample_plan_bytes,
        sampled_frame_hashes,
    )

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id bigint, payload binary"
    )
    assert frame_sample_plan_bytes(df, every_ms=250).count() == 0
    assert sampled_frame_hashes(df, every_ms=250).count() == 0


def test_frame_plan_skips_corrupt_payloads(spark):
    """A corrupt mp4 row is skipped, never a task failure."""
    from pyspark.sql import functions as F  # noqa: N812

    from rusty_bloomfilter_spark.operators.multimodal import frame_sample_plan_bytes

    good = encode_mp4(np.array([100, 100]), delta_ticks=500)
    bad = good[:40]  # truncated mid-mdat
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, None)],
        "media_id bigint, payload binary",
    )
    out = frame_sample_plan_bytes(df, every_ms=400).collect()
    assert {r["media_id"] for r in out} == {1}


def test_media_stats_fills_container_metadata(spark):
    """media_stats (the general per-media stats operator) fills
    duration/dims for MP4 and duration/sample-rate for MP3 from the
    container parsers instead of emitting metadata-only rows."""
    from rusty_bloomfilter_spark.operators.multimodal import (
        media_stats,
        synthetic_video_media,
    )

    rows = {r["media_id"]: r for r in media_stats(synthetic_video_media(spark, 12)).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        assert r["n_bytes"] > 0
        if i % 3 == 2:  # mp3
            assert r["sample_rate"] == 44100
            assert abs(r["duration_ms"] - (20 + i % 30) * 1152 * 1000.0 / 44100) < 1e-6
            assert r["width"] is None
        else:  # mp4
            assert r["duration_ms"] == (24 + i % 40) * (20 + (i % 5) * 10)
            assert r["width"] == 160 + (i % 4) * 80
            assert r["height"] == 120 + (i % 3) * 60
            assert r["rms"] is None  # no sample decode claimed


def test_mp3_parse_frame_table():
    """parse_mp3 returns per-frame byte offsets/sizes/timestamps."""
    payload = encode_mp3_cbr(6, bitrate_kbps=128, sample_rate=44100, id3=b"\x00" * 20)
    m = parse_mp3(payload)
    flen = 144 * 128 * 1000 // 44100
    assert (m["frame_sizes"] == flen).all()
    assert (np.diff(m["frame_offsets"]) == flen).all()
    assert m["frame_offsets"][0] == 30  # after the 30-byte ID3v2 tag
    assert abs(m["frame_ts_ms"][1] - 1152 * 1000.0 / 44100) < 1e-9
    # per-frame content is distinct (positional filler)
    bodies = {bytes(payload[o : o + s]) for o, s in zip(m["frame_offsets"], m["frame_sizes"])}
    assert len(bodies) == 6


def test_audio_near_dups_catch_retagged_copies(spark):
    """Audio near-dup via frame content hashes: a retagged copy (same
    frames, different ID3v2 tag) and an exact copy pair with the
    original; a different recording (different seed) does not."""
    from rusty_bloomfilter_spark.operators.multimodal import frame_hash_near_dups

    orig = encode_mp3_cbr(40, seed=5, id3=b"\x00" * 64)
    retag = encode_mp3_cbr(40, seed=5, id3=b"\xaa" * 300)  # same audio, new tag
    other = encode_mp3_cbr(40, seed=9, id3=b"\x00" * 64)
    rows = [
        (1, bytearray(orig)),
        (2, bytearray(orig)),
        (3, bytearray(retag)),
        (4, bytearray(other)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    pairs = {
        (r["media_a"], r["media_b"]): r["n_common_frames"]
        for r in frame_hash_near_dups(df, every_ms=100, min_common=2).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
