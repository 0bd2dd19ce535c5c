"""Real MP4 / ISO-BMFF metadata on the stdlib: box-tree walk to
``mvhd`` (timescale + duration), ``tkhd`` (track dims, 16.16 fixed
point), and ``stts`` (sample count = frame count) — so the video
operators read genuine wild container bytes instead of only the FAKE
container. Frame DECODE (H.264 etc.) stays behind the codec seam.
"""

from __future__ import annotations

import struct

MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Error(ValueError):
    """Malformed or unsupported MP4 (caller quarantines)."""


def _boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        btype = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", b[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _walk(b: bytes, start: int, end: int, found: dict) -> None:
    for btype, body, bend in _boxes(b, start, end):
        if btype in MP4_CONTAINERS:
            _walk(b, body, bend, found)
        elif btype in (b"mvhd", b"tkhd", b"stts") and btype not in found:
            found[btype] = (body, bend)


def looks_like_mp4(b: bytes) -> bool:
    return (b is not None and len(b) >= 12
            and bytes(b[4:8]) in (b"ftyp", b"moov", b"styp"))


def mp4_meta(b: bytes) -> dict:
    """{width, height, n_frames, timescale, duration} from the box
    tree. Raises :class:`Mp4Error` when the structure is absent."""
    b = bytes(b)
    if not looks_like_mp4(b):
        raise Mp4Error("no ftyp/moov box")
    found: dict = {}
    _walk(b, 0, len(b), found)
    out = {"width": None, "height": None, "n_frames": None,
           "timescale": None, "duration": None}
    if b"mvhd" in found:
        body, bend = found[b"mvhd"]
        ver = b[body]
        if ver == 1 and body + 28 <= bend:
            out["timescale"] = struct.unpack(">I", b[body + 20:body + 24])[0]
            out["duration"] = struct.unpack(">Q", b[body + 24:body + 32])[0]
        elif body + 20 <= bend:
            out["timescale"] = struct.unpack(">I", b[body + 12:body + 16])[0]
            out["duration"] = struct.unpack(">I", b[body + 16:body + 20])[0]
    if b"tkhd" in found:
        body, bend = found[b"tkhd"]
        if bend - body >= 8:
            w_fp, h_fp = struct.unpack(">II", b[bend - 8:bend])
            out["width"] = w_fp >> 16
            out["height"] = h_fp >> 16
    if b"stts" in found:
        body, bend = found[b"stts"]
        if body + 8 <= bend:
            (n_entries,) = struct.unpack(">I", b[body + 4:body + 8])
            total = 0
            p = body + 8
            for _ in range(n_entries):
                if p + 8 > bend:
                    break
                cnt, _delta = struct.unpack(">II", b[p:p + 8])
                total += cnt
                p += 8
            out["n_frames"] = total
    if out["width"] is None and out["n_frames"] is None:
        raise Mp4Error("no tkhd/stts in box tree")
    return out


def mp4_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) or None — the VIDEO-schema shape."""
    try:
        m = mp4_meta(b)
    except (Mp4Error, struct.error):
        return None
    if m["width"] is None:
        return None
    return m["width"], m["height"], m["n_frames"] or 0


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def make_test_mp4(width: int, height: int, n_frames: int,
                  timescale: int = 600, fps: int = 30) -> bytes:
    """Minimal valid box tree (ftyp + moov{mvhd,trak{tkhd,mdia{minf{
    stbl{stts}}}}}) — deterministic bytes for tests and oracled
    queries; no media data."""
    duration = n_frames * timescale // fps
    mvhd = (bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration) + bytes(80))
    tkhd = (bytes([0, 0, 0, 7]) + bytes(76)
            + struct.pack(">II", width << 16, height << 16))
    stts = (bytes(4) + struct.pack(">I", 1)
            + struct.pack(">II", n_frames, timescale // fps))
    stbl = _box(b"stbl", _box(b"stts", stts))
    mdia = _box(b"mdia", _box(b"minf", stbl))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov
