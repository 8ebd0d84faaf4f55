"""Media CONTAINER parsing — real MP4 (ISO BMFF) and MP3 (MPEG-1/2
Layer III) structure readers, pure Python/numpy, zero codec libraries.

A 100-TB crawl pipeline rarely needs decoded pixels for every video: it
needs container METADATA (duration, dimensions, codec, frame count) and
a FRAME-SAMPLING PLAN — per-sample byte ranges into ``mdat`` so that
selected frames can be fetched with ranged reads and handed to a real
decoder elsewhere. Both are pure byte-structure walks, implemented here
for real:

- ``parse_mp4`` walks the ISO BMFF box tree (ftyp/moov/trak/mdia/stbl,
  64-bit largesize, v0/v1 full boxes) and returns mvhd/tkhd/mdhd/stsd
  metadata plus the raw sample tables (stts/stsc/stsz/stco|co64).
- ``mp4_sample_table`` expands those tables into per-sample
  (byte offset, byte size, timestamp ticks) arrays — the exact input a
  ranged-read frame sampler needs.
- ``parse_mp3`` skips ID3v2, walks MPEG-1/2 Layer III frame headers
  (bitrate/samplerate tables, padding), resyncs across junk bytes the
  way crawl data demands, and reports frames/duration/CBR-vs-VBR.

Sample-data DECODE (H.264 bitstreams, Layer III audio synthesis) still
requires codec libraries absent from this environment and stays behind
``decode_media``'s NotImplementedError — the container layer above is
real and fully tested. Encoders here emit structurally valid files
whose sample payloads are deterministic filler bytes: every byte a
parser reads (box sizes, sample tables, frame headers) is real; only
the codec payloads are synthetic, and tests cross-check the parsers
against the generators' closed-form arithmetic through an independent
DuckDB oracle (contract.q_mp4_frame_plan / q_container_stats).

Reference parity note: the reference repo (/root/reference, Rust) has
no multimodal surface; this module extends the engine for the
training-data-pipeline mandate (container-level media handling).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_mp4",
    "parse_mp4",
    "mp4_sample_table",
    "encode_mp3_cbr",
    "parse_mp3",
]


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}
# ftyp(24) + mdat header(8): first sample byte in files we emit
MP4_DATA_START = 32


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(
    sample_sizes: np.ndarray,
    *,
    delta_ticks: int,
    timescale: int = 1000,
    width: int = 320,
    height: int = 240,
    codec: bytes = b"avc1",
) -> bytes:
    """Structurally valid single-track MP4: ftyp + mdat (deterministic
    filler samples, one chunk) + trailing moov (crawl-typical layout).
    Every structural byte is real; sample payloads are filler (see
    module docstring). ftyp is exactly 24 bytes and mdat immediately
    follows, so sample 0 lives at byte MP4_DATA_START."""
    sizes = np.asarray(sample_sizes, dtype=np.int64)
    if sizes.ndim != 1 or sizes.size == 0 or (sizes <= 0).any():
        raise ValueError("sample_sizes must be a non-empty positive 1-D array")
    n = int(sizes.size)
    duration = n * int(delta_ticks)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    assert len(ftyp) == 24

    total = int(sizes.sum())
    # deterministic filler: position-derived bytes, no RNG
    body = (np.arange(total, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(56)).astype(np.uint8)
    mdat = _box(b"mdat", body.tobytes())

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    entry = (
        struct.pack(">I", 86) + codec
        + b"\x00" * 6 + struct.pack(">H", 1)          # reserved, data_ref_idx
        + b"\x00" * 16                                 # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)   # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)           # reserved, frame_count
        + b"\x00" * 32                                 # compressor name
        + struct.pack(">Hh", 24, -1)                   # depth, predefined
    )
    assert len(entry) == 86
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, int(delta_ticks)))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + sizes.astype(">u4").tobytes(),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, len(ftyp) + 8))

    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes in
    buf[start:end]; ValueError on truncation or nonsense sizes."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(f"mp4: truncated box header at byte {off}")
        size = struct.unpack_from(">I", buf, off)[0]
        typ = buf[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError(f"mp4: truncated largesize at byte {off}")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"mp4: box '{typ!r}' size {size} overruns buffer at {off}")
        yield typ, off + hdr, off + size
        off += size


def _full_header(buf: bytes, start: int, end: int) -> tuple[int, int]:
    if start + 4 > end:
        raise ValueError("mp4: truncated full-box header")
    vf = struct.unpack_from(">I", buf, start)[0]
    return vf >> 24, start + 4


def _need(p: int, n: int, pe: int, typ: str) -> None:
    """Guard every fixed-field read against the BOX end, not just the
    buffer end: a box whose declared size is smaller than its fixed
    fields must raise, not silently read the next box's bytes."""
    if p + n > pe:
        raise ValueError(f"mp4: '{typ}' box too small for its fixed fields")


def parse_mp4(payload: bytes) -> dict:
    """Walk the box tree; return container metadata + raw sample tables.

    Handles 64-bit largesize, size-0 (to-EOF) boxes, v0/v1 mvhd/mdhd/
    tkhd, stco and co64, and moov before OR after mdat. Raises
    ValueError on structural corruption (truncated boxes, bad sizes),
    matching the PNG/JPEG decoder convention."""
    buf = bytes(payload)
    out: dict = {
        "container": "mp4", "brand": None, "timescale": None, "duration": None,
        "media_timescale": None, "media_duration": None, "handler": None,
        "codec": None, "width": None, "height": None,
        "stts": [], "stsc": [], "sample_sizes": None, "chunk_offsets": None,
        "n_samples": 0,
    }
    seen_any = False

    def walk(start: int, end: int) -> None:
        nonlocal seen_any
        for typ, ps, pe in _iter_boxes(buf, start, end):
            seen_any = True
            if typ in _CONTAINERS:
                walk(ps, pe)
            elif typ == b"ftyp":
                out["brand"] = buf[ps : ps + 4].decode("latin1")
            elif typ == b"mvhd":
                v, p = _full_header(buf, ps, pe)
                if v == 1:
                    _need(p, 28, pe, "mvhd")
                    out["timescale"] = struct.unpack_from(">I", buf, p + 16)[0]
                    out["duration"] = struct.unpack_from(">Q", buf, p + 20)[0]
                else:
                    _need(p, 16, pe, "mvhd")
                    out["timescale"] = struct.unpack_from(">I", buf, p + 8)[0]
                    out["duration"] = struct.unpack_from(">I", buf, p + 12)[0]
            elif typ == b"tkhd":
                v, p = _full_header(buf, ps, pe)
                # width/height are the last 8 payload bytes (16.16 fixed)
                _need(p, 8, pe, "tkhd")
                w, h = struct.unpack_from(">II", buf, pe - 8)
                out["width"], out["height"] = w >> 16, h >> 16
            elif typ == b"mdhd":
                v, p = _full_header(buf, ps, pe)
                if v == 1:
                    _need(p, 28, pe, "mdhd")
                    out["media_timescale"] = struct.unpack_from(">I", buf, p + 16)[0]
                    out["media_duration"] = struct.unpack_from(">Q", buf, p + 20)[0]
                else:
                    _need(p, 16, pe, "mdhd")
                    out["media_timescale"] = struct.unpack_from(">I", buf, p + 8)[0]
                    out["media_duration"] = struct.unpack_from(">I", buf, p + 12)[0]
            elif typ == b"hdlr":
                _need(ps, 12, pe, "hdlr")
                out["handler"] = buf[ps + 8 : ps + 12].decode("latin1")
            elif typ == b"stsd":
                _, p = _full_header(buf, ps, pe)
                _need(p, 4, pe, "stsd")
                if struct.unpack_from(">I", buf, p)[0] >= 1:
                    _need(p, 8, pe, "stsd")
                    esize = struct.unpack_from(">I", buf, p + 4)[0]
                    if esize < 16 or p + 4 + esize > pe:
                        raise ValueError("mp4: stsd entry overruns box")
                    out["codec"] = buf[p + 8 : p + 12].decode("latin1")
            elif typ == b"stts":
                _, p = _full_header(buf, ps, pe)
                _need(p, 4, pe, "stts")
                cnt = struct.unpack_from(">I", buf, p)[0]
                if p + 4 + 8 * cnt > pe:
                    raise ValueError("mp4: stts entries overrun box")
                ent = np.frombuffer(buf, dtype=">u4", count=2 * cnt, offset=p + 4)
                out["stts"] = [(int(ent[2 * i]), int(ent[2 * i + 1])) for i in range(cnt)]
            elif typ == b"stsc":
                _, p = _full_header(buf, ps, pe)
                _need(p, 4, pe, "stsc")
                cnt = struct.unpack_from(">I", buf, p)[0]
                if p + 4 + 12 * cnt > pe:
                    raise ValueError("mp4: stsc entries overrun box")
                ent = np.frombuffer(buf, dtype=">u4", count=3 * cnt, offset=p + 4)
                out["stsc"] = [
                    (int(ent[3 * i]), int(ent[3 * i + 1]), int(ent[3 * i + 2]))
                    for i in range(cnt)
                ]
            elif typ == b"stsz":
                _, p = _full_header(buf, ps, pe)
                _need(p, 8, pe, "stsz")
                fixed, cnt = struct.unpack_from(">II", buf, p)
                out["n_samples"] = cnt
                if fixed:
                    # fixed-size stsz carries no per-sample table, so cnt
                    # is not bounded by the box size — cap it against the
                    # FILE size (each sample needs >= 1 byte somewhere)
                    # or a corrupt count allocates cnt int64s here
                    if cnt > len(buf):
                        raise ValueError(
                            f"mp4: stsz claims {cnt} samples in a {len(buf)}-byte file"
                        )
                    out["sample_sizes"] = np.full(cnt, fixed, dtype=np.int64)
                else:
                    if p + 8 + 4 * cnt > pe:
                        raise ValueError("mp4: stsz sizes overrun box")
                    out["sample_sizes"] = np.frombuffer(
                        buf, dtype=">u4", count=cnt, offset=p + 8
                    ).astype(np.int64)
            elif typ == b"stco":
                _, p = _full_header(buf, ps, pe)
                _need(p, 4, pe, "stco")
                cnt = struct.unpack_from(">I", buf, p)[0]
                if p + 4 + 4 * cnt > pe:
                    raise ValueError("mp4: stco entries overrun box")
                out["chunk_offsets"] = np.frombuffer(
                    buf, dtype=">u4", count=cnt, offset=p + 4
                ).astype(np.int64)
            elif typ == b"co64":
                _, p = _full_header(buf, ps, pe)
                _need(p, 4, pe, "co64")
                cnt = struct.unpack_from(">I", buf, p)[0]
                if p + 4 + 8 * cnt > pe:
                    raise ValueError("mp4: co64 entries overrun box")
                out["chunk_offsets"] = np.frombuffer(
                    buf, dtype=">u8", count=cnt, offset=p + 4
                ).astype(np.int64)

    try:
        walk(0, len(buf))
    except struct.error as exc:
        # a box whose declared size is smaller than the fixed fields the
        # parser reads (e.g. an mvhd of size 12): unpack_from runs past
        # the buffer — surface it as the same ValueError every caller
        # (container_stats, frame_sample_plan_bytes) already handles
        raise ValueError(f"mp4: box too small for its fixed fields: {exc}") from exc
    if not seen_any or out["brand"] is None:
        raise ValueError("mp4: no ftyp box (not an ISO BMFF file)")
    return out


def mp4_sample_table(payload: bytes) -> dict:
    """Expand stts/stsc/stsz/stco into per-sample arrays:
    ``offsets`` (absolute byte), ``sizes``, ``ts_ticks`` (decode time,
    cumulative stts), plus ``timescale``. This is the ranged-read plan a
    frame sampler needs — no codec work involved."""
    meta = parse_mp4(payload)
    sizes = meta["sample_sizes"]
    offs_tbl = meta["chunk_offsets"]
    if sizes is None or offs_tbl is None or not meta["stsc"] or not meta["stts"]:
        raise ValueError("mp4: incomplete sample tables (stsz/stco/stsc/stts)")
    n = int(meta["n_samples"])
    if n != sizes.size:
        raise ValueError("mp4: stsz count mismatch")
    if n == 0:
        # a zero-sample track is useless for sampling AND would produce
        # inconsistent arrays below (the ts prepend makes ts_ticks length
        # max(n,1) while offsets/sizes are length 0 — an IndexError trap
        # for callers; round-4 review finding). Metadata-only callers use
        # parse_mp4 directly.
        raise ValueError("mp4: track has zero samples")

    # stsc run-length -> samples-per-chunk for every chunk
    n_chunks = int(offs_tbl.size)
    spc = np.zeros(n_chunks, dtype=np.int64)
    runs = meta["stsc"]
    for i, (first, per, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        if not (1 <= first <= last <= n_chunks):
            raise ValueError("mp4: stsc chunk run out of range")
        spc[first - 1 : last] = per
    if int(spc.sum()) != n:
        raise ValueError(f"mp4: stsc assigns {int(spc.sum())} samples, stsz says {n}")

    chunk_of = np.repeat(np.arange(n_chunks), spc)
    # offset within chunk = prefix sum of sizes, reset per chunk
    csum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    chunk_start_idx = np.concatenate(([0], np.cumsum(spc)[:-1]))
    within = csum - csum[chunk_start_idx[chunk_of]]
    offsets = offs_tbl[chunk_of] + within

    # validate the stts run counts BEFORE expanding them: each run count
    # is an arbitrary u32, so a corrupt entry would otherwise drive a
    # multi-GB np.full allocation here
    if sum(cnt for cnt, _ in meta["stts"]) != n:
        raise ValueError("mp4: stts covers a different sample count than stsz")
    deltas = np.concatenate(
        [np.full(cnt, delta, dtype=np.int64) for cnt, delta in meta["stts"]]
    )
    ts = np.concatenate(([0], np.cumsum(deltas)[:-1]))

    return {
        "offsets": offsets.astype(np.int64),
        "sizes": sizes.astype(np.int64),
        "ts_ticks": ts.astype(np.int64),
        "duration_ticks": int(sum(cnt * delta for cnt, delta in meta["stts"])),
        "timescale": meta["media_timescale"] or meta["timescale"] or 1,
        "width": meta["width"],
        "height": meta["height"],
        "codec": meta["codec"],
    }


# ---------------------------------------------------------------------------
# MP3 / MPEG audio frames
# ---------------------------------------------------------------------------

# MPEG-1 Layer III kbps by bitrate index 1..14 (0/15 invalid)
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def encode_mp3_cbr(
    n_frames: int,
    *,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3: bytes = b"",
    seed: int = 0,
) -> bytes:
    """Structurally valid MPEG-1 Layer III CBR stream: every frame
    header (sync, version, layer, bitrate/samplerate indices, padding=0)
    is real; frame bodies are deterministic filler derived from
    ``(seed, frame index, position)``, so every frame's content is
    DISTINCT and two encodes share frame bytes iff they share the seed
    — the property audio content-hash dedup tests rely on. Optional
    ``id3`` bytes are prefixed as an ID3v2 tag."""
    if bitrate_kbps not in _MP3_BITRATES_V1:
        raise ValueError(f"unsupported CBR bitrate {bitrate_kbps}")
    rates = _MP3_RATES[3]
    if sample_rate not in rates:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}")
    br_idx = _MP3_BITRATES_V1.index(bitrate_kbps)
    sr_idx = rates.index(sample_rate)
    # 0xFF 0xFB = sync(11) + MPEG1(11) + Layer III(01) + no-CRC(1)
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | 0b00, 0b0100_0100]
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate  # padding bit 0
    body_len = frame_len - 4
    out = bytearray()
    if id3:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3
    base = np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    for j in range(int(n_frames)):
        pos = np.arange(j * body_len, (j + 1) * body_len, dtype=np.uint64)
        filler = ((pos + base) * np.uint64(0x2545F4914F6CDD1D) >> np.uint64(56)).astype(np.uint8)
        out += hdr + filler.tobytes()
    return bytes(out)


def parse_mp3(payload: bytes, *, max_junk: int = 1 << 16) -> dict:
    """Walk MPEG-1/2/2.5 Layer III frames: skip a leading ID3v2 tag,
    validate each 4-byte header, step by the computed frame length, and
    RESYNC across junk (crawl streams are messy) up to ``max_junk``
    total skipped bytes. Returns n_frames, duration_ms, sample_rate,
    CBR bitrate (None if VBR), junk/tag accounting. ValueError if no
    valid frame exists."""
    buf = bytes(payload)
    pos = 0
    id3_bytes = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = (
            ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14)
            | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
        )
        id3_bytes = 10 + size
        pos = min(len(buf), id3_bytes)

    n_frames = 0
    junk = 0
    bitrates: set[int] = set()
    sample_rate = None
    rate_samples: dict[int, int] = {}  # sr -> total samples at that rate
    frame_offsets: list[int] = []
    frame_sizes: list[int] = []
    frame_ts: list[float] = []  # start time of each frame, ms
    t_ms = 0.0
    while pos + 4 <= len(buf):
        b0, b1, b2, _b3 = buf[pos : pos + 4]
        ok = False
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            ver = (b1 >> 3) & 0b11          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0b11        # 1 = Layer III
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 0b11
            if ver != 1 and layer == 1 and 0 < br_idx < 15 and sr_idx < 3:
                table = _MP3_BITRATES_V1 if ver == 3 else _MP3_BITRATES_V2
                kbps = table[br_idx]
                sr = _MP3_RATES[ver][sr_idx]
                pad = (b2 >> 1) & 1
                spf = 1152 if ver == 3 else 576
                coef = 144 if ver == 3 else 72
                flen = coef * kbps * 1000 // sr + pad
                if flen >= 4 and pos + flen <= len(buf):
                    n_frames += 1
                    bitrates.add(kbps)
                    sample_rate = sr
                    rate_samples[sr] = rate_samples.get(sr, 0) + spf
                    frame_offsets.append(pos)
                    frame_sizes.append(flen)
                    frame_ts.append(t_ms)
                    t_ms += spf * 1000.0 / sr
                    pos += flen
                    ok = True
        if not ok:
            if buf[pos : pos + 3] == b"TAG" and pos + 128 == len(buf):
                junk += 128  # trailing ID3v1
                break
            junk += 1
            pos += 1
            if junk > max_junk:
                raise ValueError(f"mp3: >{max_junk} junk bytes without sync")
    if n_frames == 0:
        raise ValueError("mp3: no valid MPEG audio frame found")
    # duration from INTEGER sample totals, one division per rate: exact
    # int arithmetic up to 2^53, so the value is bit-reproducible against
    # a SQL oracle's n_frames*spf*1000.0/sr (no float accumulation)
    dur_ms = sum(cnt * 1000.0 / sr for sr, cnt in rate_samples.items())
    return {
        "container": "mp3",
        "n_frames": n_frames,
        "frame_offsets": np.array(frame_offsets, dtype=np.int64),
        "frame_sizes": np.array(frame_sizes, dtype=np.int64),
        "frame_ts_ms": np.array(frame_ts, dtype=np.float64),
        "sample_rate": sample_rate,
        "bitrate_kbps": next(iter(bitrates)) if len(bitrates) == 1 else None,
        "vbr": len(bitrates) > 1,
        "duration_ms": dur_ms,
        "n_samples": sum(rate_samples.values()),
        "id3v2_bytes": id3_bytes,
        "junk_bytes": junk,
    }
