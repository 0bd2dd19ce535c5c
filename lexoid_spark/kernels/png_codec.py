"""Real PNG codec on the stdlib only (``zlib`` + ``struct``): closes
the multimodal layer's real-codec seam for one genuine wild format
without new dependencies.

Decode: chunk walk (IHDR/PLTE/tRNS/IDAT/IEND), concatenated-IDAT
inflate, per-scanline unfilter (all five PNG filter types: None, Sub,
Up, Average, Paeth), palette expansion — covering ALL legal bit
depths (1/2/4/8/16) and color types (0/2/3/4/6), both non-interlaced
and Adam7-interlaced (seven sub-images, each filtered independently,
scattered back on the standard origin/step lattice). 16-bit samples
down-convert to 8-bit via the high byte (``v >> 8`` — exact inverse
of the encoder's ``v * 257`` up-scale); sub-byte grayscale expands to
full range (×255/(2^d−1), exact integers); sub-byte palette samples
are indices and are not scaled.

Encode: IHDR + one zlib-deflated IDAT (filter 0 per scanline) + IEND,
fixed compression level ⇒ byte-deterministic, so oracle queries can
round-trip encode→decode inside the engine. ``depth=16`` writes
big-endian ``v * 257`` samples; ``interlace=True`` writes the seven
Adam7 passes (both default OFF — the default byte stream is unchanged
so existing oracles stay bit-stable).

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

# Adam7 pass lattice: (x0, y0, dx, dy) per pass, PNG spec §8.2.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_bpp(nch: int, depth: int) -> int:
    """Filter left-neighbor distance in BYTES (min 1, per spec)."""
    return max(1, (nch * depth) // 8)


def _unfilter_rows(raw: bytes, off: int, height: int, stride: int,
                   bpp: int) -> np.ndarray:
    """Unfilter ``height`` scanlines of ``stride`` bytes starting at
    ``off`` in the inflated stream → (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_off = off + y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorizable
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = _unfilter_serial(line, prev, ftype, bpp)
        else:
            raise PngError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _rows_to_samples(rows: np.ndarray, width: int, nch: int, depth: int,
                     ctype: int) -> np.ndarray:
    """(H, stride-bytes) unfiltered rows → (H, W, nch) uint8 samples."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :width * nch].reshape(h, width, nch)
    if depth == 16:
        # big-endian pairs; high byte = exact inverse of v*257 encode
        return (rows[:, :width * nch * 2]
                .reshape(h, width * nch, 2)[:, :, 0]
                .reshape(h, width, nch))
    # sub-byte (1/2/4): bits are packed MSB-first within each byte
    bits = np.unpackbits(rows, axis=1)
    samples = bits[:, :width * nch * depth].reshape(h, width * nch, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (samples * weights).sum(axis=2).astype(np.uint8)
    if ctype == 0:  # grayscale: expand to full 0..255 (exact integers)
        vals = vals * np.uint8(255 // ((1 << depth) - 1))
    return vals.reshape(h, width, nch)


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
            if len(data) != 13:
                raise PngError("bad IHDR length")
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data))
        elif kind == b"PLTE":
            if len(data) % 3:
                raise PngError("bad PLTE length")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif kind == b"IDAT":
            idat += data
    if width is None:
        raise PngError("missing IHDR")
    if depth not in (1, 2, 4, 8, 16):
        raise PngError(f"unsupported bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise PngError(f"bit depth {depth} illegal for color type {ctype}")
    if ctype not in _CHANNELS:
        raise PngError(f"unsupported color type {ctype}")
    if interlace not in (0, 1):
        raise PngError(f"bad interlace method {interlace}")
    nch = _CHANNELS[ctype]
    bpp = _filter_bpp(nch, depth)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e

    if interlace:  # Adam7: seven independently-filtered sub-images
        arr = np.zeros((height, width, nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * nch * depth + 7) // 8
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise PngError("IDAT size mismatch (interlaced)")
            rows = _unfilter_rows(raw, off, ph, stride, bpp)
            arr[y0::dy, x0::dx] = _rows_to_samples(rows, pw, nch, depth,
                                                   ctype)
            off += need
        if off != len(raw):
            raise PngError("IDAT size mismatch (interlaced)")
    else:
        stride = (width * nch * depth + 7) // 8
        if len(raw) != height * (stride + 1):
            raise PngError("IDAT size mismatch")
        rows = _unfilter_rows(raw, 0, height, stride, bpp)
        arr = _rows_to_samples(rows, width, nch, depth, ctype)

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
                     bpp: int) -> np.ndarray:
    """Sub/Average/Paeth have an in-row data dependency — reconstruct
    left-to-right (row lengths are test/KB-scale; the hot path at
    corpus scale is the Up/None filters encoders favor). ``bpp`` is
    the filter unit in bytes (min 1 — sub-byte depths use 1)."""
    cur = np.zeros(len(line), dtype=np.int32)
    for x in range(len(line)):
        a = cur[x - bpp] if x >= bpp else 0      # left
        up = prev[x]                              # above
        c = prev[x - bpp] if x >= bpp else 0      # upper-left
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


def _chunk(kind: bytes, data: bytes) -> bytes:
    body = kind + data
    return (struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def _pass_bytes(a: np.ndarray, depth: int) -> bytes:
    """Filter-0 scanlines for one (sub-)image: (h, w, c) uint8 →
    raw pre-compression bytes. depth 16 writes big-endian v*257."""
    h, w, c = a.shape
    if depth == 16:
        wide = a.astype(">u2") * 257  # hi byte == v → exact round-trip
        payload = wide.reshape(h, w * c).view(np.uint8)
    else:
        payload = a.reshape(h, w * c)
    scan = np.zeros((h, payload.shape[1] + 1), dtype=np.uint8)
    scan[:, 1:] = payload
    return scan.tobytes()


def png_encode(arr: np.ndarray, level: int = 6, depth: int = 8,
               interlace: bool = False) -> bytes:
    """(H, W) or (H, W, C) uint8 array → PNG bytes (filter 0 rows, one
    IDAT, fixed zlib level ⇒ deterministic output). ``depth=16`` writes
    each sample as big-endian ``v * 257`` (decode's high-byte read
    recovers ``v`` exactly); ``interlace=True`` writes Adam7 passes.
    Defaults produce the same byte stream as always."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise PngError(f"cannot encode {c}-channel array")
    if depth not in (8, 16):
        raise PngError(f"encoder supports depth 8/16, not {depth}")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    if interlace:
        raw = b"".join(
            _pass_bytes(a[y0::dy, x0::dx], depth)
            for x0, y0, dx, dy in _ADAM7
            if a[y0::dy, x0::dx].size
        )
    else:
        raw = _pass_bytes(a, depth)
    idat = zlib.compress(raw, level)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


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
