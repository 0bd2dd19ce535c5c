"""WebP (RIFF ``WEBP``) header metadata on the stdlib — the modern
web's third image format after JPEG/PNG. All three stream flavors:

- ``VP8 `` (lossy): keyframe tag + 0x9D012A start code, 14-bit
  width/height (RFC 6386 §9.1);
- ``VP8L`` (lossless): 0x2F signature, 14-bit width-1/height-1 +
  alpha bit from the LSB-first bitstream;
- ``VP8X`` (extended): feature flags + 24-bit canvas width-1/height-1.

Metadata ONLY: pixel decode (VP8 DCT / VP8L prefix-coded ARGB) is out
of scope and quarantines typed through the image arm's
unknown-format path — never garbled pixels. Mirrors the
``mp4_meta``/``jpeg_meta`` metadata-twin pattern.

Reference parity: the reference delegates image handling to PIL
(no WebP-specific code to match); this serves `image_meta`-class
operators over wild web crawls.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple


def looks_like_webp(b) -> bool:
    b = bytes(b[:12])
    return b[:4] == b"RIFF" and b[8:12] == b"WEBP"


def webp_header(b) -> Optional[Tuple[int, int, int]]:
    """WebP bytes → (width, height, channels) from the first image
    chunk, or None when the bytes aren't a parseable WebP. Channels:
    4 when the flavor declares alpha, else 3."""
    b = bytes(b)
    if not looks_like_webp(b) or len(b) < 20:
        return None
    pos, n = 12, len(b)
    while pos + 8 <= n:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if body + size > n:
            return None
        if fourcc == b"VP8 ":
            # RFC 6386 §9.1: 3-byte frame tag (bit0: 0 = keyframe),
            # start code 9D 01 2A, then 16-bit LE w/h (low 14 bits)
            if size < 10 or (b[body] & 1) != 0:
                return None
            if b[body + 3:body + 6] != b"\x9d\x01\x2a":
                return None
            (w16,) = struct.unpack_from("<H", b, body + 6)
            (h16,) = struct.unpack_from("<H", b, body + 8)
            return (w16 & 0x3FFF, h16 & 0x3FFF, 3)
        if fourcc == b"VP8L":
            # 0x2F signature, then an LSB-first bitstream:
            # 14-bit width-1, 14-bit height-1, 1-bit alpha
            if size < 5 or b[body] != 0x2F:
                return None
            (bits,) = struct.unpack_from("<I", b, body + 1)
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = (bits >> 28) & 1
            return (w, h, 4 if alpha else 3)
        if fourcc == b"VP8X":
            # flags byte (0x10 = alpha), 3 reserved, 24-bit LE
            # canvas width-1 / height-1
            if size < 10:
                return None
            alpha = b[body] & 0x10
            w = int.from_bytes(b[body + 4:body + 7], "little") + 1
            h = int.from_bytes(b[body + 7:body + 10], "little") + 1
            return (w, h, 4 if alpha else 3)
        pos = body + size + (size & 1)
    return None


# ---------------------------------------------------------------------------
# Fixture builder (corpus/tests only)
# ---------------------------------------------------------------------------


def make_test_webp(width: int, height: int, flavor: str = "vp8l",
                   alpha: bool = False) -> bytes:
    """Deterministic WebP container with a spec-shaped header of the
    requested ``flavor`` (``vp8``/``vp8l``/``vp8x``). Header fields
    are real; the stream body beyond them is a placeholder — this is
    a METADATA fixture (the pixel arms quarantine it typed), the same
    honesty class as the track-less MP4 box trees."""
    if not (1 <= width <= 0x3FFF and 1 <= height <= 0x3FFF):
        raise ValueError("dims out of 14-bit WebP range")
    if flavor == "vp8":
        body = (b"\x00\x00\x00"          # keyframe tag
                + b"\x9d\x01\x2a"
                + struct.pack("<HH", width, height)
                + bytes(6))
        chunk = b"VP8 "
    elif flavor == "vp8l":
        bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
        body = b"\x2f" + struct.pack("<I", bits) + bytes(5)
        chunk = b"VP8L"
    elif flavor == "vp8x":
        body = (bytes([0x10 if alpha else 0]) + bytes(3)
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little"))
        chunk = b"VP8X"
    else:
        raise ValueError(f"unknown flavor {flavor!r}")
    payload = (b"WEBP" + chunk + struct.pack("<I", len(body)) + body
               + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
