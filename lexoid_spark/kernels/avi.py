"""AVI (RIFF ``AVI ``) Motion-JPEG reader on the stdlib + the
from-scratch JPEG codec — the classic camera/capture container for
MJPEG video (each ``NNdc`` chunk in the ``movi`` list is one complete
JPEG image). The RIFF walk mirrors :mod:`wav_meta` (WAVE is the same
chunk grammar); frame decode reuses ``kernels/jpeg_codec.py``.

The one MJPEG-specific quirk handled here: wild MJPG AVIs routinely
OMIT the Huffman tables from every frame (the OpenDML convention —
decoders are expected to substitute the JPEG Annex K typical tables).
When a frame carries no DHT segment, the canonical tables are
spliced in before the scan; frames that carry their own tables
decode as-is.

Scope: the first ``vids`` stream with handler MJPG/mjpg/dmb1;
anything else (cvid, DIB, xvid, ...) raises :class:`AviError` so the
document quarantines typed. The builder twin emits spec-shaped
RIFF files (optionally DHT-less) for fixtures/corpus only.

Reference parity: none — the reference has no video path; this is
LLM-pipeline surface (video → frame sampling → per-frame ops).
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np


class AviError(ValueError):
    """Malformed or out-of-scope AVI data (→ quarantine)."""


_MJPEG_HANDLERS = (b"MJPG", b"mjpg", b"dmb1")
_MAX_FRAMES = 1 << 12


def looks_like_avi(b) -> bool:
    b = bytes(b[:12])
    return b[:4] == b"RIFF" and b[8:12] == b"AVI "


def _chunks(b: bytes, start: int, end: int
            ) -> Iterator[Tuple[bytes, int, int]]:
    """RIFF chunk walk: yields (fourcc, body_start, body_end); chunk
    bodies are word-aligned (odd sizes carry one pad byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError("chunk overruns its parent")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)


def avi_header(b) -> Optional[Tuple[int, int, int]]:
    """Cheap header walk → (width, height, n_frames), or None when
    the bytes aren't an AVI (the metadata twin of
    :func:`avi_mjpeg_frames`)."""
    b = bytes(b)
    if not looks_like_avi(b):
        return None
    try:
        for fourcc, body, bend in _chunks(b, 12, len(b)):
            if fourcc != b"LIST" or b[body:body + 4] != b"hdrl":
                continue
            for c2, b2, e2 in _chunks(b, body + 4, bend):
                if c2 == b"avih" and e2 - b2 >= 40:
                    n, w, h = struct.unpack_from("<I12xII", b, b2 + 16)
                    return (w, h, n)
        return None
    except AviError:
        return None


def _find_mjpeg_stream(b: bytes, hdrl_body: int, hdrl_end: int) -> int:
    """hdrl → index of the first ``vids`` stream; its handler must be
    Motion-JPEG (typed error otherwise — never garbage pixels)."""
    stream_idx = -1
    for c2, b2, e2 in _chunks(b, hdrl_body + 4, hdrl_end):
        if c2 != b"LIST" or b[b2:b2 + 4] != b"strl":
            continue
        stream_idx += 1
        for c3, b3, e3 in _chunks(b, b2 + 4, e2):
            if c3 != b"strh" or e3 - b3 < 8:
                continue
            if b[b3:b3 + 4] != b"vids":
                break               # audio/text stream: next strl
            handler = b[b3 + 4:b3 + 8]
            if handler not in _MJPEG_HANDLERS:
                raise AviError(
                    f"vids handler {handler!r} is not Motion-JPEG")
            return stream_idx
    raise AviError("no vids stream in hdrl")


def _ensure_dht(frame: bytes) -> bytes:
    """Splice the JPEG Annex K typical Huffman tables before the scan
    when the frame carries no DHT segment (the OpenDML MJPG
    convention). Frames with their own tables pass through."""
    # segment scan: stop at SOS; note whether any DHT was seen
    pos = 2
    n = len(frame)
    sos = None
    while pos + 4 <= n:
        if frame[pos] != 0xFF:
            raise AviError("MJPEG frame marker stream out of sync")
        marker = frame[pos + 1]
        if marker == 0xC4:
            return frame            # has its own tables
        if marker == 0xDA:
            sos = pos
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", frame, pos + 2)
        pos += 2 + ln
    if sos is None:
        raise AviError("MJPEG frame carries no SOS")
    from lexoid_spark.kernels.jpeg_codec import (
        AC_CHROM_BITS, AC_CHROM_VALS, AC_LUM_BITS, AC_LUM_VALS,
        DC_CHROM_BITS, DC_CHROM_VALS, DC_LUM_BITS, DC_LUM_VALS)

    def dht(tc: int, th: int, bits, vals) -> bytes:
        payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload

    tables = (dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
              + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
              + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
              + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS))
    return frame[:sos] + tables + frame[sos:]


def avi_mjpeg_frames(data: bytes) -> np.ndarray:
    """AVI bytes → (n_frames, H, W) uint8 luma via the first vids
    stream's ``NNdc`` movi chunks. Raises :class:`AviError` (or the
    JPEG kernel's typed error) on malformed/out-of-scope input."""
    b = bytes(data)
    if not looks_like_avi(b):
        raise AviError("no RIFF/AVI header")
    from lexoid_spark.kernels.jpeg_codec import JpegError, jpeg_decode
    from lexoid_spark.kernels.mp4_avc import jpeg_luma

    stream_idx = None
    frames: List[np.ndarray] = []
    try:
        for fourcc, body, bend in _chunks(b, 12, len(b)):
            if fourcc != b"LIST":
                continue
            kind = b[body:body + 4]
            if kind == b"hdrl":
                stream_idx = _find_mjpeg_stream(b, body, bend)
            elif kind == b"movi":
                if stream_idx is None:
                    raise AviError("movi before hdrl")
                want = b"%02ddc" % stream_idx
                for c2, b2, e2 in _chunks(b, body + 4, bend):
                    if c2 != want:
                        continue
                    if len(frames) >= _MAX_FRAMES:
                        raise AviError("implausible frame count")
                    try:
                        px = jpeg_decode(_ensure_dht(b[b2:e2]))
                    except JpegError as e:
                        raise AviError(
                            f"bad MJPEG frame: {e}") from e
                    frames.append(jpeg_luma(px))
    except struct.error as e:
        raise AviError(f"truncated chunk: {e}") from e
    if not frames:
        raise AviError("AVI carries no MJPEG frames")
    if len({f.shape for f in frames}) != 1:
        raise AviError("MJPEG frames disagree on size")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Fixture builder (corpus/tests only)
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _strip_dht(frame: bytes) -> bytes:
    """Remove every DHT segment (fixture twin of :func:`_ensure_dht`:
    emits the wild DHT-less MJPG layout)."""
    out = bytearray(frame[:2])
    pos = 2
    n = len(frame)
    while pos + 4 <= n:
        marker = frame[pos + 1]
        if marker == 0xDA:
            out += frame[pos:]
            return bytes(out)
        (ln,) = struct.unpack_from(">H", frame, pos + 2)
        seg = frame[pos:pos + 2 + ln]
        if marker != 0xC4:
            out += seg
        pos += 2 + ln
    raise AviError("no SOS while stripping DHT")


def make_test_avi_mjpeg(frames: np.ndarray, quality: int = 90,
                        omit_dht: bool = False, fps: int = 30) -> bytes:
    """(n, H, W) uint8 luma → AVI file with one MJPG vids stream;
    ``omit_dht=True`` strips the Huffman tables from every frame (the
    OpenDML wild layout :func:`_ensure_dht` repairs). Deterministic
    bytes (fixtures/corpus only)."""
    from lexoid_spark.kernels.jpeg_codec import jpeg_encode

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = a[None]
    n, h, w = a.shape
    jpgs = [jpeg_encode(a[i], quality=quality) for i in range(n)]
    if omit_dht:
        jpgs = [_strip_dht(j) for j in jpgs]
    avih = struct.pack("<IIIIIIIIII", 10 ** 6 // fps, 0, 0, 0x10,
                       n, 0, 1, 0, w, h) + bytes(16)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0,
                                            0, 1, fps, 0, n, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpgs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
