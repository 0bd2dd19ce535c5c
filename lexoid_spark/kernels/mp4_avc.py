"""H.264 tracks inside MP4 / ISO-BMFF containers (ISO 14496-15):
locate the ``avc1`` sample entry, read parameter sets from its
``avcC`` configuration box, walk the sample tables (``stsz`` sizes,
``stsc`` sample-to-chunk, ``stco``/``co64`` chunk offsets), convert
the length-prefixed sample NALs to an Annex-B stream and decode
through ``kernels/h264.py`` — so real wild-shaped MP4 video files
yield FRAMES, not just box-tree metadata (``kernels/mp4_meta.py``).

Motion-JPEG tracks (QTFF ``jpeg``/``mjpa`` sample entries — every
sample one complete JPEG image) decode through the from-scratch
baseline JPEG codec, so camera-style MJPEG files yield real frames
too. Scope otherwise follows the H.264 kernel: I_PCM baseline IDR
samples decode, anything else quarantines typed. Fragmented MP4
(``moof``) and encrypted tracks raise :class:`Mp4Error`. The builder
twins emit spec-shaped ftyp+mdat+moov files with full sample-table
graphs for fixtures/corpus only.

Reference parity: none — the reference has no video path; this is
LLM-pipeline surface (video → frame sampling → per-frame ops).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from lexoid_spark.kernels.mp4_meta import Mp4Error, _boxes, looks_like_mp4

MP4_CONTAINERS = {b"moov", b"mdia", b"minf", b"stbl"}
_TABLE_BOXES = (b"stsd", b"stsz", b"stsc", b"stco", b"co64")


def _walk_collect(b: bytes, start: int, end: int,
                  traks: List[dict], cur: Optional[dict],
                  top: dict) -> None:
    """Collect sample-table boxes PER TRAK (a legal file lists the
    audio track first; only the avc1 trak's tables apply) plus
    top-level structure flags (moof)."""
    for btype, body, bend in _boxes(b, start, end):
        if btype == b"trak":
            trak: dict = {}
            traks.append(trak)
            _walk_collect(b, body, bend, traks, trak, top)
        elif btype in MP4_CONTAINERS:
            _walk_collect(b, body, bend, traks, cur, top)
        elif btype in _TABLE_BOXES and cur is not None \
                and btype not in cur:
            cur[btype] = (body, bend)
        elif btype == b"moof":
            top[b"moof"] = (body, bend)


def _parse_avcc(b: bytes, body: int, bend: int) -> Tuple[bytes, int]:
    """avcC box body → (Annex-B SPS+PPS prefix, NAL length size)."""
    if bend - body < 7:
        raise Mp4Error("truncated avcC")
    if b[body] != 1:
        raise Mp4Error("unknown avcC configurationVersion")
    length_size = (b[body + 4] & 3) + 1
    out = bytearray()
    p = body + 5
    n_sps = b[p] & 0x1F
    p += 1
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", b, p)
        p += 2
        out += b"\x00\x00\x00\x01" + b[p:p + ln]
        p += ln
    if p >= bend:
        raise Mp4Error("truncated avcC PPS array")
    n_pps = b[p]
    p += 1
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", b, p)
        p += 2
        out += b"\x00\x00\x00\x01" + b[p:p + ln]
        p += ln
    return bytes(out), length_size


#: Motion-JPEG sample entry types (QuickTime File Format video sample
#: descriptions): every sample is one complete JFIF image
_MJPEG_ENTRIES = (b"jpeg", b"mjpa")


def _find_video_entry(b: bytes, stsd_body: int, stsd_end: int):
    """stsd → the first supported video sample entry:

    - ``("avc1", annexb_prefix, nal_length_size)`` for H.264 (the
      avcC parameter sets converted to an Annex-B prefix), or
    - ``("mjpeg", None, 0)`` for Motion-JPEG (``jpeg``/``mjpa``
      entries — each sample is a standalone JPEG image, no
      configuration box).
    """
    if stsd_end - stsd_body < 8:
        raise Mp4Error("truncated stsd")
    for btype, body, bend in _boxes(b, stsd_body + 8, stsd_end):
        if btype in _MJPEG_ENTRIES:
            return "mjpeg", None, 0
        if btype != b"avc1":
            continue
        # avc1 sample entry: 78 bytes of fields before child boxes
        for ctype, cbody, cend in _boxes(b, body + 78, bend):
            if ctype == b"avcC":
                prefix, length_size = _parse_avcc(b, cbody, cend)
                return "avc1", prefix, length_size
        raise Mp4Error("avc1 entry carries no avcC")
    raise Mp4Error("no supported video sample entry "
                   "(neither avc1 nor Motion-JPEG)")


def _u32s(b: bytes, pos: int, n: int) -> List[int]:
    return list(struct.unpack_from(">%dI" % n, b, pos))


def mp4_video_frames(data: bytes) -> np.ndarray:
    """MP4 bytes → (n_frames, H, W) uint8 luma frames via the video
    track's sample tables (avc1 H.264 or Motion-JPEG). Raises
    :class:`Mp4Error` (or the H.264/JPEG kernel's typed error) when
    the track is absent or out of scope."""
    b = bytes(data)
    if not looks_like_mp4(b):
        raise Mp4Error("no ftyp/moov box")
    try:
        return _frames_from_tables(b)
    except (struct.error, IndexError) as e:
        raise Mp4Error(f"truncated sample tables: {e}") from e


def _frames_from_tables(b: bytes) -> np.ndarray:
    traks: List[dict] = []
    top: dict = {}
    _walk_collect(b, 0, len(b), traks, None, top)
    if b"moof" in top:
        raise Mp4Error("fragmented MP4 (moof) is unsupported")
    # pick the first trak whose stsd carries a supported video entry
    # (the video track need not be first — audio-first muxing is
    # common)
    found = prefix = kind = None
    for trak in traks:
        if b"stsd" not in trak:
            continue
        try:
            kind, prefix, length_size = _find_video_entry(
                b, *trak[b"stsd"])
        except Mp4Error:
            continue
        found = trak
        break
    if found is None:
        raise Mp4Error("no supported video sample entry in any trak "
                       "(neither avc1 nor Motion-JPEG)")
    for need in (b"stsz", b"stsc"):
        if need not in found:
            raise Mp4Error(f"video trak misses {need.decode()}")
    # sample sizes
    body, bend = found[b"stsz"]
    sample_size, n_samples = struct.unpack_from(">II", b, body + 4)
    if n_samples > 1 << 20:
        raise Mp4Error("implausible sample count")
    if sample_size:
        sizes = [sample_size] * n_samples
    else:
        if body + 12 + 4 * n_samples > bend:
            raise Mp4Error("truncated stsz")
        sizes = _u32s(b, body + 12, n_samples)
    # chunk offsets
    if b"stco" in found:
        body, bend = found[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", b, body + 4)
        if body + 8 + 4 * n_chunks > bend or n_chunks > 1 << 20:
            raise Mp4Error("truncated stco")
        offsets = _u32s(b, body + 8, n_chunks)
    elif b"co64" in found:
        body, bend = found[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", b, body + 4)
        if body + 8 + 8 * n_chunks > bend or n_chunks > 1 << 20:
            raise Mp4Error("truncated co64")
        offsets = list(struct.unpack_from(">%dQ" % n_chunks, b,
                                          body + 8))
    else:
        raise Mp4Error("box tree misses stco/co64")
    # sample→chunk: entries (first_chunk, samples_per_chunk, desc_id)
    body, bend = found[b"stsc"]
    (n_entries,) = struct.unpack_from(">I", b, body + 4)
    if body + 8 + 12 * n_entries > bend or n_entries > 1 << 20:
        raise Mp4Error("truncated stsc")
    entries = [struct.unpack_from(">III", b, body + 8 + 12 * i)
               for i in range(n_entries)]
    # expand to per-chunk sample counts
    per_chunk: List[int] = []
    for i, (first, spc, _desc) in enumerate(entries):
        last = (entries[i + 1][0] - 1 if i + 1 < len(entries)
                else len(offsets))
        per_chunk += [spc] * max(0, last - (first - 1))
    # resolve per-sample byte ranges from the chunk map
    spans: List[Tuple[int, int]] = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        spc = per_chunk[ci] if ci < len(per_chunk) else 0
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            si += 1
            if pos + size > len(b):
                raise Mp4Error("sample overruns the file")
            spans.append((pos, pos + size))
            pos += size
    if si != n_samples:
        raise Mp4Error("sample tables disagree on sample count")

    if kind == "mjpeg":
        return _decode_mjpeg_samples(b, spans)

    # avc1: convert length-prefixed sample NALs to one Annex-B stream
    out = bytearray(prefix)
    for pos, end in spans:
        while pos + length_size <= end:
            ln = int.from_bytes(b[pos:pos + length_size], "big")
            pos += length_size
            if ln == 0 or pos + ln > end:
                raise Mp4Error("bad NAL length in sample")
            out += b"\x00\x00\x00\x01" + b[pos:pos + ln]
            pos += ln
    from lexoid_spark.kernels.h264 import h264_decode_frames

    return h264_decode_frames(bytes(out))


def jpeg_luma(px: np.ndarray) -> np.ndarray:
    """Decoded JPEG array → (H, W) uint8 luma: RGB frames reduce via
    BT.601 integer luma ((77R + 150G + 29B + 128) >> 8 —
    deterministic, no float); grayscale passes through. Shared by the
    MP4 and AVI Motion-JPEG arms."""
    if px.ndim == 3 and px.shape[2] == 3:
        p32 = px.astype(np.uint32)
        return ((77 * p32[:, :, 0] + 150 * p32[:, :, 1]
                 + 29 * p32[:, :, 2] + 128) >> 8).astype(np.uint8)
    return px.reshape(px.shape[0], px.shape[1])


def _decode_mjpeg_samples(b: bytes,
                          spans: List[Tuple[int, int]]) -> np.ndarray:
    """Motion-JPEG samples → (n, H, W) uint8 luma: each sample is a
    complete JPEG image, decoded by the from-scratch baseline codec.
    All frames must share one geometry (one track = one coded
    size)."""
    from lexoid_spark.kernels.jpeg_codec import JpegError, jpeg_decode

    if not spans:
        raise Mp4Error("Motion-JPEG track carries no samples")
    frames = []
    for pos, end in spans:
        try:
            px = jpeg_decode(b[pos:end])
        except JpegError as e:
            raise Mp4Error(f"bad Motion-JPEG sample: {e}") from e
        frames.append(jpeg_luma(px))
    if len({f.shape for f in frames}) != 1:
        raise Mp4Error("Motion-JPEG samples disagree on frame size")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Fixture builder (corpus/tests only)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def make_test_mp4_h264(frames: np.ndarray, timescale: int = 600,
                       fps: int = 30) -> bytes:
    """(n, H, W) uint8 luma → MP4 file with a real avc1 track: I_PCM
    IDR samples (kernels/h264.py), avcC parameter sets, and the full
    stsd/stts/stsc/stsz/stco graph. Layout ftyp+mdat+moov so chunk
    offsets are known before moov is sized. Deterministic bytes."""
    from lexoid_spark.kernels.h264 import _split_nals, h264_encode_ipcm

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = a[None]
    n, h, w = a.shape
    annexb = h264_encode_ipcm(a)
    nals = _split_nals(annexb)
    sps = [x for x in nals if x[0] & 0x1F == 7]
    pps = [x for x in nals if x[0] & 0x1F == 8]
    idrs = [x for x in nals if x[0] & 0x1F == 5]
    samples = [struct.pack(">I", len(x)) + x for x in idrs]
    sizes = [len(s) for s in samples]
    mdat = _box(b"mdat", b"".join(samples))
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2avc1")
    chunk_off = len(ftyp) + 8          # first sample, inside mdat
    avcc = (bytes([1, sps[0][1], sps[0][2], sps[0][3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps[0])) + sps[0]
            + bytes([1]) + struct.pack(">H", len(pps[0])) + pps[0])
    avc1 = (bytes(6) + struct.pack(">H", 1) + bytes(16)
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + bytes(4) + struct.pack(">H", 1) + bytes(32)
            + struct.pack(">Hh", 24, -1) + _box(b"avcC", avcc))
    stsd = bytes(4) + struct.pack(">I", 1) + _box(b"avc1", avc1)
    stts = (bytes(4) + struct.pack(">I", 1)
            + struct.pack(">II", n, timescale // fps))
    stsc = (bytes(4) + struct.pack(">I", 1)
            + struct.pack(">III", 1, n, 1))
    stsz = (bytes(4) + struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", s) for s in sizes))
    stco = bytes(4) + struct.pack(">I", 1) + struct.pack(">I", chunk_off)
    stbl = _box(b"stbl", _box(b"stsd", stsd) + _box(b"stts", stts)
                + _box(b"stsc", stsc) + _box(b"stsz", stsz)
                + _box(b"stco", stco))
    mdia = _box(b"mdia", _box(b"minf", stbl))
    duration = n * timescale // fps
    mvhd = (bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration) + bytes(80))
    tkhd = (bytes([0, 0, 0, 7]) + bytes(76)
            + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return ftyp + mdat + moov


def make_test_mp4_mjpeg(frames: np.ndarray, quality: int = 90,
                        timescale: int = 600, fps: int = 30) -> bytes:
    """(n, H, W) uint8 luma → MP4 file with a Motion-JPEG track
    (QTFF ``jpeg`` sample entry): every sample is one grayscale JPEG
    from the from-scratch encoder, with the full
    stsd/stts/stsc/stsz/stco graph. Deterministic bytes
    (fixtures/corpus only)."""
    from lexoid_spark.kernels.jpeg_codec import jpeg_encode

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = a[None]
    n, h, w = a.shape
    samples = [jpeg_encode(a[i], quality=quality) for i in range(n)]
    sizes = [len(s) for s in samples]
    mdat = _box(b"mdat", b"".join(samples))
    ftyp = _box(b"ftyp", b"qt  \x00\x00\x02\x00qt  ")
    chunk_off = len(ftyp) + 8          # first sample, inside mdat
    # video sample description: 78 bytes of fields, no child boxes
    entry = (bytes(6) + struct.pack(">H", 1) + bytes(16)
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + bytes(4) + struct.pack(">H", 1) + bytes(32)
             + struct.pack(">Hh", 24, -1))
    stsd = bytes(4) + struct.pack(">I", 1) + _box(b"jpeg", entry)
    stts = (bytes(4) + struct.pack(">I", 1)
            + struct.pack(">II", n, timescale // fps))
    stsc = (bytes(4) + struct.pack(">I", 1)
            + struct.pack(">III", 1, n, 1))
    stsz = (bytes(4) + struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", s) for s in sizes))
    stco = bytes(4) + struct.pack(">I", 1) + struct.pack(">I", chunk_off)
    stbl = _box(b"stbl", _box(b"stsd", stsd) + _box(b"stts", stts)
                + _box(b"stsc", stsc) + _box(b"stsz", stsz)
                + _box(b"stco", stco))
    mdia = _box(b"mdia", _box(b"minf", stbl))
    duration = n * timescale // fps
    mvhd = (bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration) + bytes(80))
    tkhd = (bytes([0, 0, 0, 7]) + bytes(76)
            + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return ftyp + mdat + moov


#: historical name from the avc1-only revision
mp4_h264_frames = mp4_video_frames
