"""Real GIF codec on the stdlib only: LZW decode/encode, palettes,
transparency, interlacing — the second genuinely wild image format
(after ``png_codec``) the multimodal layer can process without any
image library.

Decode: GIF87a/89a header, logical screen descriptor, global/local
color tables, graphic-control extension (transparent index), first
image descriptor (animations: first frame), variable-width LZW with
table reset, Adam-style 4-pass deinterlace.

Encode: single-frame GIF89a, global palette from the array's unique
colors (≤256 required), real variable-width LZW — deterministic bytes,
so oracle queries can round-trip encode→decode in-engine.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class GifError(ValueError):
    """Malformed or unsupported GIF (caller quarantines, never crashes)."""


def gif_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor, or None."""
    if b is None or len(b) < 13:
        return None
    b = bytes(b)
    if b[:6] not in GIF_MAGICS:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return w, h


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list:
    if not 1 <= min_code_size <= 11:
        # width caps at 12 bits by spec; a corrupt size of e.g. 255
        # would otherwise allocate a 2^255-entry table (hang/OOM)
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[tuple] = []

    def reset():
        nonlocal table, width
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = 0
    nbits = 0
    prev: tuple | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out[:n_pixels]
            if prev is None:
                if code >= len(table):
                    raise GifError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise GifError("LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_decode(b: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 (or (H, W, 4) when the first frame
    declares a transparent index). Animations: first frame only."""
    b = bytes(b)
    if b[:6] not in GIF_MAGICS:
        raise GifError("bad magic")
    if len(b) < 13:
        raise GifError("truncated header")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n
    transparent = None
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                flags = b[pos + 1]
                if flags & 0x01:
                    transparent = b[pos + 4]
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1  # block terminator
            continue
        if marker != 0x2C:
            raise GifError(f"unexpected block marker 0x{marker:02x}")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", b[pos:pos + 9])
        pos += 9
        if w * h > 1 << 26 or w == 0 or h == 0:
            # hostile descriptor dims: the LZW fill loop is bounded by
            # w*h, so a lying 65535x65535 header would otherwise grow
            # the output toward 4.3e9 pixels (decompression bomb)
            raise GifError("implausible image descriptor dims")
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
            if len(lct) < 3 * n:
                raise GifError("truncated local color table")
            palette = lct.reshape(-1, 3)
            pos += 3 * n
        if palette is None:
            raise GifError("no color table")
        mcs = b[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(b) and b[pos]:
            ln = b[pos]
            lzw += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(lzw), mcs, w * h)
        if len(idx) < w * h:
            raise GifError("LZW underrun")
        arr = np.asarray(idx, dtype=np.int32).reshape(h, w)
        if ipacked & 0x40:
            arr = _deinterlace(arr)
        if arr.max(initial=0) >= len(palette):
            raise GifError("palette index out of range")
        rgb = palette[arr]
        if transparent is not None:
            alpha = np.where(arr == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise GifError("no image descriptor")


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    run: tuple = ()
    for px in indices:
        cand = run + (int(px),)
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (int(px),)
    if run:
        put(table[run])
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array → single-frame GIF89a (global palette from
    the unique colors; raises :class:`GifError` beyond 256)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise GifError("gif_encode expects (H, W, 3) RGB")
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError(f"{len(colors)} colors exceed GIF's 256")
    depth = max(1, int(len(colors) - 1).bit_length())
    n_slots = 1 << depth
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    mcs = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    lzw = _lzw_encode(inverse.astype(np.int32), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def make_test_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic GIF (16-color pattern from coordinates
    and seed) — the corpus generator for oracled real-GIF queries."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    idx = (x * 3 + y * 5 + seed * 7) % 16
    pal = np.stack([(np.arange(16) * 17) % 256,
                    (np.arange(16) * 29) % 256,
                    (np.arange(16) * 43) % 256], axis=1).astype(np.uint8)
    return gif_encode(pal[idx])
