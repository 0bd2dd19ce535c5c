"""TIFF 6.0 baseline pixel codec on numpy + the repo's own decoders —
closes the TIFF half of the "pixel decoding stays behind the
real-codec seam" note in :mod:`tiff_bmp` (which keeps the cheap
header probe). Scanned-document archives ship bilevel fax TIFFs
(CCITT G3/G4) and 8-bit grayscale scans (LZW/PackBits/uncompressed);
this module decodes all of them so standalone TIFF documents route
through the OCR arm like PNG/JPEG/JPX already do. The reference
consumes TIFFs via PIL inside pdfplumber/PaddleOCR
(static_parser.py:751-798); there is no reference code to copy —
everything below implements the public TIFF 6.0 spec (Adobe, 1992)
and reuses the repo's own ITU-T T.4/T.6 and LZW decoders.

Decode scope (first IFD, single-sample images — the scanned-document
shapes): Compression 1 (none), 2 (CCITT modified Huffman, rows
byte-aligned), 3 (Group 3: 1-D or 2-D per T4Options, EOL-framed,
fill-bit tolerant), 4 (Group 4 / T.6), 5 (LZW with EarlyChange
semantics, horizontal Predictor 2), 32773 (PackBits);
PhotometricInterpretation 0/1; BitsPerSample 1/4/8; multi-strip.
Everything else raises a typed :class:`TiffError` (→ quarantine),
never a silent garble — the contract all raster kernels share.

The encoder twin emits deterministic spec-shaped files for
fixtures/corpus only (no wild-encoder bytes are imitated).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from lexoid_spark.kernels.ccitt_g4 import (
    CcittError,
    _Bits,
    _BitW,
    _decode_line_1d,
    _encode_line_1d,
    _EOL,
    _paint_line,
    _transitions,
    g3_decode,
    g3_encode,
    g4_decode,
    g4_encode,
)

_MAX_DIM = 1 << 14
_MAX_PIXELS = 1 << 26
_MAX_STRIPS = 1 << 12

# tag numbers (TIFF 6.0 §8)
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_OFFSETS, _T_SPP, _T_RPS = 262, 273, 277, 278
_T_COUNTS, _T_T4OPTS, _T_T6OPTS, _T_PRED = 279, 292, 293, 317

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


class TiffError(ValueError):
    """Malformed or out-of-scope TIFF data (→ quarantine)."""


def _read_tags(b: bytes) -> Tuple[str, Dict[int, List[int]]]:
    """Header + first IFD → (endian, {tag: [values...]}). Integer
    types only (BYTE/SHORT/LONG) — the types every tag in our scope
    uses; other-typed tags are skipped (ignorable per TIFF 6.0)."""
    if len(b) < 8:
        raise TiffError("truncated TIFF header")
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise TiffError("not a TIFF (bad byte-order/magic)")
    (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise TiffError("IFD offset beyond file")
    (n_entries,) = struct.unpack(e + "H", b[ifd_off:ifd_off + 2])
    if n_entries == 0 or n_entries > 512:
        raise TiffError("implausible IFD entry count")
    tags: Dict[int, List[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            raise TiffError("truncated IFD")
        tag, typ, count = struct.unpack(e + "HHI", b[off:off + 8])
        if typ not in _TYPE_SIZE or count == 0 or count > _MAX_STRIPS:
            continue
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            src = off + 8
        else:
            (src,) = struct.unpack(e + "I", b[off + 8:off + 12])
        if src + size > len(b):
            raise TiffError("tag values beyond file")
        tags[tag] = list(struct.unpack(
            e + _TYPE_FMT[typ] * count, b[src:src + size]))
    return e, tags


def _one(tags: Dict[int, List[int]], tag: int, default=None) -> int:
    vals = tags.get(tag)
    if vals is None:
        if default is None:
            raise TiffError(f"required tag {tag} missing")
        return default
    return vals[0]


def _packbits_decode(data: bytes, want: int) -> bytes:
    """PackBits (TIFF 6.0 §9): n in 0..127 → copy n+1 literals;
    129..255 → repeat next byte 257-n times; 128 = no-op."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < want:
        ln = data[pos]
        pos += 1
        if ln <= 127:
            if pos + ln + 1 > n:
                raise TiffError("PackBits literal run beyond strip")
            out += data[pos:pos + ln + 1]
            pos += ln + 1
        elif ln >= 129:
            if pos >= n:
                raise TiffError("PackBits repeat run beyond strip")
            out += data[pos:pos + 1] * (257 - ln)
            pos += 1
        # 128: no-op
    if len(out) < want:
        raise TiffError("PackBits strip underrun")
    return bytes(out[:want])


def _mh_decode(data: bytes, columns: int, rows: int) -> np.ndarray:
    """Compression 2 (CCITT modified Huffman RLE): pure T.4 1-D codes,
    NO EOLs, every row starts on a byte boundary (TIFF 6.0 §10)."""
    bits = _Bits(bytes(data))
    out = np.full((rows, columns), 255, dtype=np.uint8)
    for y in range(rows):
        cur = _decode_line_1d(bits, columns)
        _paint_line(out, y, cur, columns)
        if bits.pos & 7:
            bits.skip(8 - (bits.pos & 7))
    return out


def _g3_1d_eol_decode(data: bytes, columns: int,
                      rows: int) -> np.ndarray:
    """Compression 3 with 1-D T4Options: each row is EOL-framed
    (NO tag bit — that exists only in 2-D mode), optionally preceded
    by fill bits (T.4 §4.1.2)."""
    bits = _Bits(bytes(data))
    out = np.full((rows, columns), 255, dtype=np.uint8)
    for y in range(rows):
        fill = 0
        while bits.peek(_EOL[1]) != _EOL[0]:
            if bits.peek(1) != 0:
                raise CcittError("1-D G3 line without EOL")
            bits.skip(1)
            fill += 1
            if fill > 4096:
                raise CcittError("implausible FILL run before EOL")
        bits.skip(_EOL[1])
        cur = _decode_line_1d(bits, columns)
        _paint_line(out, y, cur, columns)
    return out


def tiff_decode(b) -> np.ndarray:
    """TIFF bytes → (H, W) uint8 grayscale (0 = black ink, 255 =
    white), honoring PhotometricInterpretation. Raises
    :class:`TiffError` on malformed or out-of-scope input."""
    b = bytes(b)
    try:
        _, tags = _read_tags(b)
        w = _one(tags, _T_WIDTH)
        h = _one(tags, _T_HEIGHT)
        if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM) \
                or w * h > _MAX_PIXELS:
            raise TiffError("implausible dimensions")
        if _one(tags, _T_SPP, 1) != 1:
            raise TiffError("only single-sample (grayscale/bilevel) "
                            "TIFFs are supported")
        bits_ps = _one(tags, _T_BITS, 1)
        comp = _one(tags, _T_COMP, 1)
        photo = _one(tags, _T_PHOTO)
        if photo not in (0, 1):
            raise TiffError(f"photometric {photo} is unsupported")
        offsets = tags.get(_T_OFFSETS)
        counts = tags.get(_T_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("strip offsets/counts missing or mismatched")
        rps = _one(tags, _T_RPS, h)
        if rps <= 0:
            raise TiffError("bad RowsPerStrip")
        n_strips = -(-h // rps)
        if len(offsets) != n_strips:
            raise TiffError("strip count does not match dims")
        if comp in (2, 3, 4):
            if bits_ps != 1:
                raise TiffError("CCITT compression requires bilevel")
        elif bits_ps not in (1, 4, 8):
            raise TiffError(f"BitsPerSample {bits_ps} is unsupported")
        if comp == 4 and _one(tags, _T_T6OPTS, 0) != 0:
            raise TiffError("T.6 uncompressed mode is unsupported")
        pred = _one(tags, _T_PRED, 1)
        if pred not in (1, 2) or (pred == 2 and
                                  (comp != 5 or bits_ps != 8)):
            raise TiffError("unsupported Predictor layout")
        stride = (w * bits_ps + 7) // 8
        strips: List[np.ndarray] = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(b) or cnt < 0:
                raise TiffError("strip beyond file")
            raw = b[off:off + cnt]
            rows = min(rps, h - si * rps)
            if comp in (2, 3, 4):
                # CCITT: ink=0/white=255 under photometric 0
                # (WhiteIsZero, the standard fax orientation)
                if comp == 4:
                    gray = g4_decode(raw, w, rows)
                elif comp == 2:
                    gray = _mh_decode(raw, w, rows)
                elif _one(tags, _T_T4OPTS, 0) & 1:
                    gray = g3_decode(raw, w, rows, k=4)
                else:
                    gray = _g3_1d_eol_decode(raw, w, rows)
                if photo == 1:       # MinIsBlack fax: inverted sense
                    gray = 255 - gray
                strips.append(gray)
                continue
            if comp == 1:
                flat = raw
            elif comp == 5:
                from lexoid_spark.kernels.pdf_md import _lzw_decode_pdf
                try:
                    flat = _lzw_decode_pdf(raw)
                except ValueError as exc:
                    raise TiffError(f"bad LZW strip: {exc}") from exc
            elif comp == 32773:
                flat = _packbits_decode(raw, stride * rows)
            else:
                raise TiffError(f"compression {comp} is unsupported")
            if len(flat) < stride * rows:
                raise TiffError("strip sample underrun")
            arr = np.frombuffer(
                flat[:stride * rows], dtype=np.uint8,
            ).reshape(rows, stride)
            if bits_ps == 8:
                px = arr.astype(np.uint8)
                if pred == 2:        # horizontal differencing
                    px = np.cumsum(px.astype(np.uint16), axis=1) \
                        .astype(np.uint8)
                px = px[:, :w]
            elif bits_ps == 4:
                hi = arr >> 4
                lo = arr & 0x0F
                px = np.empty((rows, stride * 2), dtype=np.uint8)
                px[:, 0::2] = hi
                px[:, 1::2] = lo
                px = (px[:, :w] * 17).astype(np.uint8)
            else:                    # 1-bit
                px = np.unpackbits(arr, axis=1)[:, :w] * np.uint8(255)
            if photo == 0:           # WhiteIsZero
                px = 255 - px
            strips.append(px)
        return np.concatenate(strips, axis=0)
    except (CcittError, struct.error) as exc:
        raise TiffError(str(exc)) from exc


# ---------------------------------------------------------------------------
# encoder twin (fixtures/corpus only)
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (runs never cross rows, TIFF 6.0 §9 advice)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
        else:
            j = i + 1
            while j < n and j - i < 128 and (
                    j + 1 >= n or row[j] != row[j + 1]):
                j += 1
            out.append(j - i - 1)
            out += row[i:j]
            i = j
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal conformant TIFF/PDF LZW: every byte a 9-bit literal,
    ClearCode re-issued before the decoder's code width would grow —
    valid LZW (just uncompressive), deterministic, and exactly
    inverse to the shared MSB-first EarlyChange decoder."""
    w = _BitW()
    w.write(256, 9)                  # initial ClearCode
    emitted = 0
    for byte in data:
        if emitted == 250:           # decoder next_code stays < 509
            w.write(256, 9)
            emitted = 0
        w.write(byte, 9)
        emitted += 1
    w.write(257, 9)                  # EOD
    return w.done()


def _mh_encode(arr: np.ndarray) -> bytes:
    """Compression 2 twin: 1-D codes, each row byte-aligned."""
    w = _BitW()
    for y in range(arr.shape[0]):
        _encode_line_1d(w, _transitions(arr[y]), arr.shape[1])
        if w.nb:
            w.write(0, 8 - w.nb)     # byte-align the next row
    return w.done()


def _g3_1d_eol_encode(arr: np.ndarray) -> bytes:
    w = _BitW()
    for y in range(arr.shape[0]):
        w.write(*_EOL)
        _encode_line_1d(w, _transitions(arr[y]), arr.shape[1])
    return w.done()


def tiff_encode_gray(arr: np.ndarray, compression: str = "none",
                     rows_per_strip: int | None = None,
                     big_endian: bool = False) -> bytes:
    """(H, W) uint8 → deterministic TIFF bytes. ``compression`` one
    of none / packbits / lzw / lzw-pred (Predictor 2) / mh (CCITT
    RLE) / g3 (1-D EOL-framed) / g3-2d (T4Options 2-D) / g4. The
    CCITT modes binarize at 128 and write bilevel photometric-0
    (WhiteIsZero) strips — the standard fax layout."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise TiffError("tiff_encode_gray wants a non-empty 2-D array")
    h, w = a.shape
    if w > _MAX_DIM or h > _MAX_DIM:
        raise TiffError("implausible encode dims")
    rps = rows_per_strip or h
    ccitt = compression in ("mh", "g3", "g3-2d", "g4")
    if ccitt:
        a = np.where(a < 128, 0, 255).astype(np.uint8)
    strips: List[bytes] = []
    for y0 in range(0, h, rps):
        chunk = a[y0:y0 + rps]
        if compression == "none":
            strips.append(chunk.tobytes())
        elif compression == "packbits":
            strips.append(b"".join(
                _packbits_encode(chunk[y].tobytes())
                for y in range(chunk.shape[0])))
        elif compression == "lzw":
            strips.append(_lzw_encode(chunk.tobytes()))
        elif compression == "lzw-pred":
            diff = np.diff(chunk.astype(np.int16), axis=1,
                           prepend=np.int16(0)) % 256
            strips.append(_lzw_encode(
                diff.astype(np.uint8).tobytes()))
        elif compression == "mh":
            strips.append(_mh_encode(chunk))
        elif compression == "g3":
            strips.append(_g3_1d_eol_encode(chunk))
        elif compression == "g3-2d":
            strips.append(g3_encode(chunk, k=4))
        elif compression == "g4":
            strips.append(g4_encode(chunk))
        else:
            raise TiffError(f"unknown compression {compression!r}")
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5,
                "lzw-pred": 5, "mh": 2, "g3": 3, "g3-2d": 3,
                "g4": 4}[compression]
    e = ">" if big_endian else "<"
    entries: List[Tuple[int, int, int, int]] = [
        (_T_WIDTH, 4, 1, w),
        (_T_HEIGHT, 4, 1, h),
        (_T_BITS, 3, 1, 1 if ccitt else 8),
        (_T_COMP, 3, 1, comp_tag),
        (_T_PHOTO, 3, 1, 0 if ccitt else 1),
        (_T_SPP, 3, 1, 1),
        (_T_RPS, 4, 1, rps),
    ]
    if compression == "g3-2d":
        entries.append((_T_T4OPTS, 4, 1, 1))
    if compression == "lzw-pred":
        entries.append((_T_PRED, 3, 1, 2))
    # layout: header(8) | strip data | offsets array | counts array
    # (if >1 strip) | IFD
    pos = 8
    offs = []
    for s in strips:
        offs.append(pos)
        pos += len(s)
    n = len(strips)
    if n == 1:
        entries.append((_T_OFFSETS, 4, 1, offs[0]))
        entries.append((_T_COUNTS, 4, 1, len(strips[0])))
        arrays = b""
    else:
        entries.append((_T_OFFSETS, 4, n, pos))
        entries.append((_T_COUNTS, 4, n, pos + 4 * n))
        arrays = struct.pack(e + "I" * n, *offs) + struct.pack(
            e + "I" * n, *(len(s) for s in strips))
        pos += 8 * n
    entries.sort()                   # tags ascending (TIFF 6.0 §2)
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, count, value in entries:
        if typ == 3 and count == 1:
            # SHORT inline value occupies the FIRST two value bytes
            ifd += struct.pack(e + "HHI", tag, typ, count) + \
                struct.pack(e + "HH", value, 0)
        else:
            ifd += struct.pack(e + "HHII", tag, typ, count, value)
    ifd += struct.pack(e + "I", 0)   # no next IFD
    header = (b"MM\x00*" if big_endian else b"II*\x00") + \
        struct.pack(e + "I", pos)
    return header + b"".join(strips) + arrays + ifd


# ---------------------------------------------------------------------------
# BMP pixel codec (same seam-closing role; header probe stays in tiff_bmp)
# ---------------------------------------------------------------------------


class BmpError(ValueError):
    """Malformed or out-of-scope BMP data (→ quarantine)."""


def bmp_decode(b) -> np.ndarray:
    """BMP bytes → (H, W) uint8 grayscale. Scope: BITMAPINFOHEADER
    (or later), BI_RGB (uncompressed), 8-bit paletted and 24-bit
    true-color, bottom-up or top-down rows. 24-bit pixels reduce by
    ITU-R BT.601 integer luma; 8-bit indices map through the palette
    (palette-less 8-bit treats the index as the gray value)."""
    b = bytes(b)
    if len(b) < 54 or b[:2] != b"BM":
        raise BmpError("not a BMP")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise BmpError("BITMAPCOREHEADER is unsupported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bits = struct.unpack_from("<HH", b, 26)
    (comp,) = struct.unpack_from("<I", b, 30)
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w > _MAX_DIM or h > _MAX_DIM \
            or w * h > _MAX_PIXELS:
        raise BmpError("implausible dimensions")
    if planes != 1 or comp != 0 or bits not in (8, 24):
        raise BmpError("only uncompressed 8/24-bit BMPs are supported")
    stride = (w * (bits // 8) + 3) & ~3
    if data_off + stride * h > len(b):
        raise BmpError("pixel data beyond file")
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off,
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bits == 24:
        px = rows[:, :w * 3].reshape(h, w, 3).astype(np.uint32)
        # BGR order; BT.601 integer luma
        gray = (px[..., 2] * 299 + px[..., 1] * 587
                + px[..., 0] * 114) // 1000
        return gray.astype(np.uint8)
    idx = rows[:, :w]
    (n_colors,) = struct.unpack_from("<I", b, 46)
    if n_colors == 0:
        n_colors = 256
    pal_off = 14 + hdr_size
    if pal_off + 4 * n_colors > data_off:
        return idx.copy()            # palette-less: index IS the gray
    pal = np.frombuffer(
        b, dtype=np.uint8, count=4 * n_colors, offset=pal_off,
    ).reshape(n_colors, 4).astype(np.uint32)
    lut = ((pal[:, 2] * 299 + pal[:, 1] * 587 + pal[:, 0] * 114)
           // 1000).astype(np.uint8)
    if int(idx.max()) >= n_colors:
        raise BmpError("palette index out of range")
    return lut[idx]


def bmp_encode_gray(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → deterministic 8-bit BMP with a grayscale
    palette (bottom-up, BI_RGB) — fixture twin of :func:`bmp_decode`."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise BmpError("bmp_encode_gray wants a non-empty 2-D array")
    h, w = a.shape
    if w > _MAX_DIM or h > _MAX_DIM:
        raise BmpError("implausible encode dims")
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = a[::-1]            # bottom-up
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    data_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                       stride * h, 2835, 2835, 256, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM",
                           data_off + stride * h, 0, 0, data_off)
    return file_hdr + info + pal + rows.tobytes()
