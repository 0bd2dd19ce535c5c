"""Real PNG codec on the stdlib only (``zlib`` + ``struct``): closes
the multimodal layer's real-codec seam for one genuine wild format
without new dependencies.

Decode: chunk walk (IHDR/PLTE/tRNS/IDAT/IEND), concatenated-IDAT
inflate, per-scanline unfilter (all five PNG filter types: None, Sub,
Up, Average, Paeth), palette expansion — covering bit depth 8, color
types 0/2/3/4/6, non-interlaced (the overwhelming majority of web
PNGs; 16-bit and Adam7 raise a typed error and the caller quarantines).

Encode: IHDR + one zlib-deflated IDAT (filter 0 per scanline) + IEND,
fixed compression level ⇒ byte-deterministic, so oracle queries can
round-trip encode→decode inside the engine.

Resample: deterministic nearest-neighbor index mapping
(``floor(i · src/dst)``). The reference resizes via PIL thumbnail
(LANCZOS, ``lexoid/core/utils.py:65-89``); the dims rule is identical,
the interpolation kernel is the documented difference (no PIL in this
environment — swapping it in only changes ``resample_nearest``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # per color type (pre-palette)


class PngError(ValueError):
    """Malformed or unsupported PNG (caller quarantines, never crashes)."""


def _chunks(b: bytes):
    pos = 8
    n = len(b)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise PngError("truncated chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def png_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from IHDR, or None if not a PNG.
    Channels reflect the DECODED array (palette → 3, +1 if tRNS)."""
    if b is None or len(b) < 33 or bytes(b[:8]) != PNG_MAGIC:
        return None
    b = bytes(b)
    if b[12:16] != b"IHDR":
        return None
    try:
        w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
    except struct.error:
        return None
    if ctype not in _CHANNELS or depth not in (1, 2, 4, 8, 16):
        return None
    if w == 0 or h == 0:
        return None
    ch = 3 if ctype == 3 else _CHANNELS[ctype]
    return w, h, ch

def png_decode(b: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array. Raises :class:`PngError` on
    malformed or unsupported input."""
    b = bytes(b)
    if not b.startswith(PNG_MAGIC):
        raise PngError("bad magic")
    width = height = None
    depth = ctype = interlace = None
    palette = None
    trns = None
    idat = bytearray()
    for kind, data in _chunks(b):
        if kind == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data))
        elif kind == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif kind == b"IDAT":
            idat += data
    if width is None:
        raise PngError("missing IHDR")
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth}")
    if interlace:
        raise PngError("interlaced (Adam7) not supported")
    if ctype not in _CHANNELS:
        raise PngError(f"unsupported color type {ctype}")
    nch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT size mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorizable
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = _unfilter_serial(line, prev, ftype, nch)
        else:
            raise PngError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(height, width, nch)

    if ctype == 3:  # palette expansion
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = arr[:, :, 0]
        if idx.max(initial=0) >= len(palette):
            raise PngError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            small = idx < len(trns)
            alpha[small] = trns[idx[small]]
            return np.dstack([rgb, alpha])
        return rgb
    return arr


def _unfilter_serial(line: np.ndarray, prev: np.ndarray, ftype: int,
                     nch: int) -> np.ndarray:
    """Sub/Average/Paeth have an in-row data dependency — reconstruct
    left-to-right (row lengths are test/KB-scale; the hot path at
    corpus scale is the Up/None filters encoders favor)."""
    cur = np.zeros(len(line), dtype=np.int32)
    for x in range(len(line)):
        a = cur[x - nch] if x >= nch else 0      # left
        up = prev[x]                              # above
        c = prev[x - nch] if x >= nch else 0      # upper-left
        if ftype == 1:
            rec = line[x] + a
        elif ftype == 3:
            rec = line[x] + ((a + up) >> 1)
        else:  # Paeth
            p = a + up - c
            pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = up
            else:
                pred = c
            rec = line[x] + pred
        cur[x] = rec & 0xFF
    return cur


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array → PNG bytes (filter 0 rows, one
    IDAT, fixed zlib level ⇒ deterministic output)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise PngError(f"cannot encode {c}-channel array")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.zeros((h, w * c + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * c)
    idat = zlib.compress(scan.tobytes(), level)

    def chunk(kind: bytes, data: bytes) -> bytes:
        body = kind + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def resample_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: dst pixel (i, j) reads
    src pixel (floor(i·H/nh), floor(j·W/nw))."""
    h, w = arr.shape[:2]
    ys = (np.arange(new_h) * h // new_h).astype(np.int64)
    xs = (np.arange(new_w) * w // new_w).astype(np.int64)
    return arr[ys][:, xs]


def make_test_png(width: int, height: int, channels: int = 3,
                  seed: int = 0) -> bytes:
    """Deterministic synthetic PNG (no randomness: pixel = affine mix of
    coordinates and seed, mod 256) — the corpus generator for oracled
    queries over REAL PNG bytes."""
    y = np.arange(height, dtype=np.int64)[:, None, None]
    x = np.arange(width, dtype=np.int64)[None, :, None]
    c = np.arange(channels, dtype=np.int64)[None, None, :]
    px = ((x * 31 + y * 17 + c * 7 + seed * 13) % 256).astype(np.uint8)
    return png_encode(px)
