"""Real baseline JPEG codec on numpy + stdlib only: closes the S12
pixel seam for the most common image format in a web crawl.

The reference resizes real JPEG pixels via PIL
(``lexoid/core/utils.py:65-89`` resize_image_if_needed, listed
supported at ``utils.py:119``); this is the from-scratch ITU-T T.81
re-derivation so the multimodal layer can decode/resize wild baseline
JPEGs without an image library.

Decode (ITU-T T.81 sequential baseline AND progressive DCT, 8-bit):
  marker walk (DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS) → entropy segment
  split on restart markers → byte-unstuff → fast 16-bit-lookup
  Huffman decode → per-component coefficient planes → vectorized
  dequantize + 2-D IDCT (matrix form, one einsum-free double matmul
  over all blocks) → chroma upsample (h/v factors 1–2) → YCbCr→RGB
  (JFIF / BT.601) → clip/crop. Progressive (§G.2): every scan
  deposits one spectral band / bit plane into the shared coefficient
  planes — DC first/refine, AC band first with EOBn end-of-band runs,
  AC successive-approximation refinement with interleaved correction
  bits. Arithmetic coding, 12-bit precision and hierarchical modes
  raise :class:`JpegError` — the caller quarantines, never parses
  garbage.

Encode (4:4:4 / 4:2:0 / grayscale, Annex K tables): level shift →
vectorized forward DCT → quality-scaled Annex K quantization →
zigzag → DC-diff + AC run-length Huffman with the standard K.3–K.6
tables → stuffed entropy stream. ``progressive=True`` writes the
SOF2 scan script instead (DC Al 1→0, per-component AC bands 1-5 and
6-63 first+refine, a flat custom AC table carrying the EOBn symbols
Annex K lacks). Fixed tables and float path ⇒ byte-deterministic, so
oracled queries can round-trip encode→decode inside the engine (same
contract as ``png_codec.png_encode``).

Like every kernel here this is MAP-ONLY per document: it parallelizes
across rows of the binary column; nothing about it shuffles.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"


class JpegError(ValueError):
    """Malformed or unsupported JPEG (caller quarantines, never crashes)."""


# --- spec tables (ITU-T T.81) -------------------------------------------------

# zigzag scan order: ZZ[i] = natural (row-major) index of the i-th
# zigzag-ordered coefficient
ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (K.1 luminance, K.2 chrominance),
# natural order
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS counts for code lengths 1..16, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
# Progressive AC scans additionally need EOBn symbols (r<<4, r=1..14)
# which the Annex K baseline tables don't define — a flat 8-bit
# canonical table over every symbol a progressive scan can emit
# (EOB0..EOB14, ZRL, all (run, size) pairs). Codes 0..175 at length 8:
# prefix-free, no all-ones code, decodes with the same machinery.
PROG_AC_VALS = ([r << 4 for r in range(15)] + [0xF0]
                + [(r << 4) | s for r in range(16)
                   for s in range(1, 11)])
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS),
                0, 0, 0, 0, 0, 0, 0, 0]

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8x8 DCT-II matrix: A[k, n] = c_k * cos((2n+1) k pi / 16);
# forward F = A B A^T, inverse B = A^T F A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _ck = np.sqrt(0.125) if _k == 0 else 0.5
        _A[_k, _n] = _ck * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


# --- Huffman machinery --------------------------------------------------------

def _canonical_codes(bits, vals):
    """(symbol, code, length) triples in canonical order (T.81 C.2).
    A DHT whose per-length counts exceed its value list is hostile
    input → typed error, never an unguarded index."""
    if sum(bits) > len(vals):
        raise JpegError("DHT counts exceed its symbol list")
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out

_TABLE_CACHE: dict = {}
_PACKED_CACHE: dict = {}


def _fast_table(bits, vals):
    """16-bit-prefix lookup: peek 16 bits, one index → (symbol, length).
    The standard fast-decode structure; built once per distinct table
    (cached — wild files overwhelmingly ship the Annex K tables)."""
    key = (tuple(bits), tuple(vals))
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    sym = [0] * 65536
    ln = [0] * 65536
    for s, code, length in _canonical_codes(bits, vals):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = [s] * (hi - lo)
        ln[lo:hi] = [length] * (hi - lo)
    _TABLE_CACHE[key] = (sym, ln)
    return sym, ln


def _packed_table(table):
    """(symbol << 5) | length as ONE flat list — halves the lookups in
    the hot sequential-scan loop. Keyed by the (sym, ln) pair object
    (tables live forever in _TABLE_CACHE; the stored ref keeps the id
    stable)."""
    hit = _PACKED_CACHE.get(id(table))
    if hit is not None:
        return hit[1]
    sym, ln = table
    packed = ((np.array(sym, dtype=np.int64) << 5)
              | np.array(ln, dtype=np.int64)).tolist()
    _PACKED_CACHE[id(table)] = (table, packed)
    return packed


def _encode_codes(bits, vals):
    """symbol → (code, length) dict for the encoder side."""
    return {s: (c, l) for s, c, l in _canonical_codes(bits, vals)}


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes. All reads go
    through a 4-byte window at the current byte offset — O(1) per
    operation, no big-int shifting."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        # pad tail so the 4-byte window never runs short (JPEG pads
        # the final byte with 1-bits; extra 1s decode as EOB-safe)
        self.data = data + b"\xff\xff\xff\xff"
        self.pos = 0
        self.nbits = len(data) * 8

    def _window(self) -> int:
        i = self.pos >> 3
        return int.from_bytes(self.data[i:i + 4], "big")

    def decode(self, table) -> int:
        sym_t, len_t = table
        v = (self._window() >> (16 - (self.pos & 7))) & 0xFFFF
        length = len_t[v]
        if length == 0 or self.pos + length > self.nbits + 7:
            raise JpegError("corrupt entropy stream (bad Huffman code)")
        self.pos += length
        return sym_t[v]

    def receive(self, s: int) -> int:
        """Raw MSB-first bits (EOB-run extensions, refinement bits)."""
        if s == 0:
            return 0
        v = (self._window() >> (32 - (self.pos & 7) - s)) & ((1 << s) - 1)
        self.pos += s
        return v

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.receive(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


class _BatchWriter:
    """Drop-in for :class:`_BitWriter` that buffers (value, nbits)
    fields and packs each marker-delimited run in ONE vectorized numpy
    pass (bit expansion → packbits → 0xFF00 stuffing) — the per-call
    Python bit loop is the encoder's hot path, so writes become two
    list appends. Values must already be non-negative and < 2**nbits
    (every call site emits sign-adjusted magnitudes)."""

    __slots__ = ("vals", "lens", "chunks")

    def __init__(self):
        self.vals: list = []
        self.lens: list = []
        self.chunks: list = []

    def write(self, val: int, n: int) -> None:
        self.vals.append(val)
        self.lens.append(n)

    def _pack(self) -> None:
        if len(self.vals) == 0:  # list OR ndarray (vectorized path)
            return
        v = np.array(self.vals, dtype=np.int64)
        l = np.array(self.lens, dtype=np.int64)
        self.vals = []
        self.lens = []
        ends = np.cumsum(l)
        total = int(ends[-1])
        idx = np.repeat(np.arange(len(l)), l)
        # bit j of the stream is bit (ends[f]-1-j) of field f, MSB-first
        shift = ends[idx] - 1 - np.arange(total)
        bits = ((v[idx] >> shift) & 1).astype(np.uint8)
        pad = (-total) % 8
        if pad:  # T.81 F.1.2.3: pad with 1-bits
            bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
        by = np.packbits(bits)
        ff = np.where(by == 0xFF)[0]
        if len(ff):  # byte stuffing
            by = np.insert(by, ff + 1, 0)
        self.chunks.append(by.tobytes())

    def byte_align(self) -> None:
        self._pack()  # each packed chunk is 1-padded to a byte already

    def marker(self, m: int) -> None:
        self._pack()
        self.chunks.append(bytes([0xFF, m]))

    def flush(self) -> bytes:
        self._pack()
        return b"".join(self.chunks)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3) — before
        a restart marker or end of scan."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def marker(self, m: int) -> None:
        """Emit a raw marker (NOT stuffed) at a byte boundary."""
        self.byte_align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


# --- decoder ------------------------------------------------------------------

def _split_segments(scan: bytes) -> list:
    """Unstuff 0xFF00 and split the entropy stream on RSTn markers.

    Vectorized for the well-formed case (every 0xFF is followed by
    0x00 or an RST marker — what every real encoder emits); the
    byte-by-byte fallback preserves the permissive handling of
    malformed tails (lone/doubled 0xFF decays to literal bytes)."""
    arr = np.frombuffer(scan, dtype=np.uint8)
    m = len(arr)
    ffpos = np.where(arr[:m - 1] == 0xFF)[0] if m else \
        np.empty(0, dtype=np.int64)
    if m and arr[-1] == 0xFF:
        return _split_segments_slow(scan)
    if len(ffpos):
        nxt = arr[ffpos + 1]
        wellformed = bool(np.all(
            (nxt == 0) | ((nxt >= 0xD0) & (nxt <= 0xD7))))
        # adjacent FFs would make the skip-2 scan overlap
        if wellformed and len(ffpos) > 1:
            wellformed = bool(np.all(np.diff(ffpos) > 1))
        if not wellformed:
            return _split_segments_slow(scan)
        rst = ffpos[(nxt >= 0xD0) & (nxt <= 0xD7)]
    else:
        rst = np.empty(0, dtype=np.int64)
    segments: list[bytes] = []
    start = 0
    bounds = list(rst) + [m]
    for b in bounds:
        seg = arr[start:b]
        if len(seg):
            # drop the stuffed 0x00 after each 0xFF inside the segment
            sf = np.where(seg[:len(seg) - 1] == 0xFF)[0]
            seg = np.delete(seg, sf + 1) if len(sf) else seg
        segments.append(seg.tobytes())
        start = b + 2
    return segments


def _split_segments_slow(scan: bytes) -> list:
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    m = len(scan)
    while i < m:
        if scan[i] == 0xFF and i + 1 < m:
            nxt = scan[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(scan[i])
        i += 1
    segments.append(bytes(cur))
    return segments


def _decode_baseline_scan(scan, scan_comps, comps, planes, huff_dc,
                          huff_ac, restart_interval, mcux, mcuy):
    """The single sequential scan: interleaved MCUs, full 0..63 band."""
    binding = {cs: (td, ta) for cs, td, ta in scan_comps}
    for cid, hs, vs, tq in comps:
        if cid not in binding:
            raise JpegError("scan does not cover all frame components")
    # per-component (packed DC table, packed AC table, vs, hs) resolved
    # once — the MCU loop below is the whole decode cost, so it runs on
    # plain ints and list lookups with the bit cursor inlined: ONE
    # 6-byte window read serves both the Huffman symbol and its extend
    # bits (16 + 15 ≤ 41 usable bits at any bit offset)
    plan = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        td, ta = binding[cid]
        try:
            dct = huff_dc[td]
            act = huff_ac[ta]
        except KeyError:
            raise JpegError("scan references undefined "
                            "Huffman table") from None
        plan.append((ci, _packed_table(dct), _packed_table(act), vs, hs))
    segments = _split_segments(scan)

    def _windows(data: bytes) -> list:
        # 48-bit big-endian window at every byte offset, vectorized
        # once per segment then indexed as a plain Python list: the
        # symbol loop previously built a bytes slice + from_bytes per
        # Huffman symbol (two per coefficient) — the decoder's
        # hottest allocation
        a = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        w = (
            (a[:-5] << np.uint64(40)) | (a[1:-4] << np.uint64(32))
            | (a[2:-3] << np.uint64(24)) | (a[3:-2] << np.uint64(16))
            | (a[4:-1] << np.uint64(8)) | a[5:]
        )
        return w.tolist()

    seg_idx = 0
    data = segments[0] + b"\xff\xff\xff\xff\xff\xff"
    win48 = _windows(data)
    pos = 0
    nbits = (len(data) - 6) * 8
    preds = [0] * len(comps)
    mcu_count = 0
    total_mcus = mcux * mcuy
    row_w = mcux
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegError("missing restart segment")
                data = segments[seg_idx] + b"\xff\xff\xff\xff\xff\xff"
                win48 = _windows(data)
                pos = 0
                nbits = (len(data) - 6) * 8
                preds = [0] * len(comps)
            for ci, dct, act, vs, hs in plan:
                pred = preds[ci]
                plane = planes[ci]
                for by in range(vs):
                    for bx in range(hs):
                        coefs = [0] * 64
                        sh = pos & 7
                        win = win48[pos >> 3]
                        e = dct[(win >> (32 - sh)) & 0xFFFF]
                        s = e >> 5
                        length = e & 31
                        if length == 0 or s > 15:
                            raise JpegError("corrupt entropy stream "
                                            "(bad Huffman code)")
                        if s:
                            v = (win >> (48 - sh - length - s)) \
                                & ((1 << s) - 1)
                            if v < (1 << (s - 1)):
                                v -= (1 << s) - 1
                            pred += v
                        pos += length + s
                        if pos > nbits + 7:
                            raise JpegError("truncated scan")
                        coefs[0] = pred
                        k = 1
                        while k < 64:
                            sh = pos & 7
                            win = win48[pos >> 3]
                            e = act[(win >> (32 - sh)) & 0xFFFF]
                            length = e & 31
                            if length == 0:
                                raise JpegError("corrupt entropy stream "
                                                "(bad Huffman code)")
                            rs = e >> 5
                            s = rs & 15
                            if s == 0:
                                pos += length
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise JpegError("AC index overflow")
                            v = (win >> (48 - sh - length - s)) \
                                & ((1 << s) - 1)
                            if v < (1 << (s - 1)):
                                v -= (1 << s) - 1
                            pos += length + s
                            coefs[k] = v
                            k += 1
                        if pos > nbits + 7:
                            raise JpegError("truncated scan")
                        row = (my * vs + by) * (row_w * hs) \
                            + (mx * hs + bx)
                        plane[row] = coefs
                preds[ci] = pred
            mcu_count += 1
    if mcu_count != total_mcus:
        raise JpegError("truncated scan")


def _decode_progressive(scans, comps, planes, mcux, mcuy, hmax, vmax,
                        h, w):
    """Progressive (SOF2) frame: each scan deposits one spectral band /
    bit plane into the shared coefficient planes (T.81 §G.2). DC
    scans may interleave components; AC scans are single-component
    over the component's own block grid. Successive approximation:
    first scans store ``coef << Al``; refinement scans add the next
    lower bit."""
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    for scan_comps, ss, se, ah, al, scan, huff_dc, huff_ac, dri in scans:
        segments = _split_segments(scan)
        if ss == 0:
            if se != 0:
                raise JpegError("progressive scan mixes DC and AC")
            _decode_prog_dc_scan(segments, scan_comps, comps, cid_to_ci,
                                 planes, huff_dc, ah, al, dri,
                                 mcux, mcuy, hmax, vmax, h, w)
        else:
            if len(scan_comps) != 1:
                raise JpegError("progressive AC scan must be "
                                "single-component")
            if not 1 <= ss <= se <= 63:
                raise JpegError("bad spectral band")
            cs, td, ta = scan_comps[0]
            ci = cid_to_ci.get(cs)
            if ci is None:
                raise JpegError("scan references unknown component")
            _decode_prog_ac_scan(segments, ci, comps[ci], planes[ci],
                                 huff_ac.get(ta), ss, se, ah, al, dri,
                                 mcux, hmax, vmax, h, w)


def _comp_block_grid(comp, hmax, vmax, h, w):
    """Non-interleaved scan grid for one component: blocks covering
    ceil(dim · sampling/max) samples (T.81 A.2.2)."""
    cid, hs, vs, tq = comp
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)  # (rows, cols)


def _decode_prog_dc_scan(segments, scan_comps, comps, cid_to_ci, planes,
                         huff_dc, ah, al, dri, mcux, mcuy, hmax, vmax,
                         h, w):
    members = []
    for cs, td, ta in scan_comps:
        ci = cid_to_ci.get(cs)
        if ci is None:
            raise JpegError("scan references unknown component")
        members.append((ci, td))
    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(members)
    unit = 0

    def restart():
        nonlocal reader, seg_idx, preds
        seg_idx += 1
        if seg_idx >= len(segments):
            raise JpegError("missing restart segment")
        reader = _BitReader(segments[seg_idx])
        preds = [0] * len(members)

    if len(members) > 1:  # interleaved over the full MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and unit and unit % dri == 0:
                    restart()
                for mi, (ci, td) in enumerate(members):
                    cid, hs, vs, tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            row = ((my * vs + by) * (mcux * hs)
                                   + (mx * hs + bx))
                            _dc_unit(reader, huff_dc, td, planes[ci],
                                     row, preds, mi, ah, al)
                unit += 1
    else:
        ci, td = members[0]
        cid, hs, vs, tq = comps[ci]
        rows, cols = _comp_block_grid(comps[ci], hmax, vmax, h, w)
        gw = mcux * hs
        for by in range(rows):
            for bx in range(cols):
                if dri and unit and unit % dri == 0:
                    restart()
                _dc_unit(reader, huff_dc, td, planes[ci],
                         by * gw + bx, preds, 0, ah, al)
                unit += 1


def _dc_unit(reader, huff_dc, td, plane, row, preds, mi, ah, al):
    if ah == 0:  # first DC scan: diff-coded point-transformed value
        tbl = huff_dc.get(td)
        if tbl is None:
            raise JpegError("scan references undefined Huffman table")
        s = reader.decode(tbl)
        if s > 15:
            raise JpegError("bad DC category")
        preds[mi] += reader.receive_extend(s)
        plane[row, 0] = preds[mi] << al
    else:  # refinement: one raw bit per block
        if reader.receive(1):
            plane[row, 0] = int(plane[row, 0]) | (1 << al)


def _decode_prog_ac_scan(segments, ci, comp, plane, act, ss, se, ah,
                         al, dri, mcux, hmax, vmax, h, w):
    if act is None:
        raise JpegError("scan references undefined Huffman table")
    cid, hs, vs, tq = comp
    rows, cols = _comp_block_grid(comp, hmax, vmax, h, w)
    gw = mcux * hs
    reader = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    unit = 0
    for by in range(rows):
        for bx in range(cols):
            if dri and unit and unit % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegError("missing restart segment")
                reader = _BitReader(segments[seg_idx])
                eobrun = 0
            coefs = plane[by * gw + bx]
            if ah == 0:
                eobrun = _ac_first_block(reader, act, coefs, ss, se,
                                         al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, act, coefs, ss, se,
                                          al, eobrun)
            unit += 1


def _ac_first_block(reader, act, coefs, ss, se, al, eobrun):
    """First scan of a spectral band (T.81 G.2.2): zero runs + EOBn
    end-of-band runs; values land shifted left by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise JpegError("AC index overflow")
        coefs[k] = reader.receive_extend(s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, act, coefs, ss, se, al, eobrun):
    """Refinement scan (T.81 G.2.3 / figure G.7): newly-nonzero
    coefficients arrive as ±1<<Al; every already-nonzero coefficient
    passed contributes one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise JpegError("bad refinement magnitude")
                val = p1 if reader.receive(1) else m1
            else:
                if r != 15:
                    # include the CURRENT block: its remaining band
                    # still owes correction bits (the tail below reads
                    # them and consumes one run unit)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
            # advance over r zero-HISTORY coefficients, correcting
            # nonzero ones along the way
            while k <= se:
                c = int(coefs[k])
                if c != 0:
                    if reader.receive(1) and (c & p1) == 0:
                        coefs[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coefs[k] = val
            k += 1
    if eobrun > 0:
        # end-of-band: correction bits for the remaining nonzeros
        while k <= se:
            c = int(coefs[k])
            if c != 0:
                if reader.receive(1) and (c & p1) == 0:
                    coefs[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def jpeg_decode(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) or (H, W, 1) uint8 array.
    Raises :class:`JpegError` on malformed or unsupported input."""
    b = bytes(b)
    if not b.startswith(JPEG_MAGIC):
        raise JpegError("bad magic")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None            # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    restart_interval = 0
    pos = 2
    n = len(b)
    # (scan_comps, ss, se, ah, al, entropy bytes, dc snapshot, ac
    # snapshot, dri) per SOS — progressive files carry many scans, and
    # tables/DRI may be redefined between them
    scans: list = []
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise JpegError("marker stream out of sync")
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", b[pos + 2:pos + 4])
        seg = b[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — may hold several tables
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                off += 1
                if pq == 0:
                    if off + 64 > len(seg):
                        raise JpegError("truncated DQT table")
                    tbl = np.frombuffer(
                        seg[off:off + 64], dtype=np.uint8).astype(np.int64)
                    off += 64
                else:  # 16-bit entries
                    if off + 128 > len(seg):
                        raise JpegError("truncated DQT table")
                    tbl = np.frombuffer(
                        seg[off:off + 128], dtype=">u2").astype(np.int64)
                    off += 128
                if tbl.size != 64:
                    raise JpegError("truncated DQT table")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZZ] = tbl  # DQT is stored in zigzag order
                qt[tq] = nat
        elif marker == 0xC4:  # DHT — may hold several tables
            off = 0
            while off + 17 <= len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1:off + 17])
                cnt = sum(bits)
                vals = list(seg[off + 17:off + 17 + cnt])
                off += 17 + cnt
                tbl = _fast_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            if len(seg) < 6:
                raise JpegError("truncated SOF header")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            if len(seg) < 6 + nc * 3:
                raise JpegError("truncated SOF component list")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                    raise JpegError("bad SOF sampling factors")
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline JPEG mode not supported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if len(seg) < 1 or len(seg) < 4 + seg[0] * 2:
                raise JpegError("truncated SOS header")
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tt = seg[1 + ci * 2:3 + ci * 2]
                scan_comps.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = seg[1 + ns * 2:4 + ns * 2]
            scan_start = pos + 2 + seg_len
            # entropy data runs to the next non-RST marker
            p = scan_start
            while p + 1 < n:
                if b[p] == 0xFF and b[p + 1] not in (0x00,) and not (
                        0xD0 <= b[p + 1] <= 0xD7):
                    break
                p += 1
            scans.append((scan_comps, ss, se, ahal >> 4, ahal & 15,
                          b[scan_start:p], dict(huff_dc), dict(huff_ac),
                          restart_interval))
            pos = p
            continue
        pos += 2 + seg_len

    if frame is None or not scans:
        raise JpegError("missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JpegError("zero dimension")
    if len(comps) not in (1, 3):
        raise JpegError(f"unsupported component count {len(comps)}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise JpegError("sampling factors beyond 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = [np.zeros((mcuy * vs * mcux * hs, 64), dtype=np.int32)
              for cid, hs, vs, tq in comps]

    if progressive:
        _decode_progressive(scans, comps, planes, mcux, mcuy,
                            hmax, vmax, h, w)
    else:
        if len(scans) != 1:
            raise JpegError("multi-scan sequential JPEG not supported")
        scan_comps, _ss, _se, _ah, _al, scan, s_dc, s_ac, dri = scans[0]
        _decode_baseline_scan(scan, scan_comps, comps, planes,
                              s_dc, s_ac, dri, mcux, mcuy)

    # vectorized dequantize + IDCT + assembly per component
    out_planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        q = qt.get(tq)
        if q is None:
            raise JpegError("frame references undefined quant table")
        zz_coefs = planes[ci].astype(np.float64)
        nat = np.zeros_like(zz_coefs)
        nat[:, ZZ] = zz_coefs          # inverse zigzag
        nat *= q[None, :]              # dequantize (natural order)
        blocks = nat.reshape(-1, 8, 8)
        spatial = _A.T @ blocks @ _A + 128.0
        bw = mcux * hs
        bh = mcuy * vs
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        # chroma upsample to full resolution (factors are 1 or 2)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder ------------------------------------------------------------------

def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _code_arrays(codes, size):
    """Huffman (code, length) dict → two int64 lookup arrays."""
    code = np.zeros(size, dtype=np.int64)
    length = np.zeros(size, dtype=np.int64)
    for s, (cd, ln) in codes.items():
        code[s] = cd
        length[s] = ln
    return code, length


def _encode_baseline_entropy(grids, samp, tables, c, mcux,
                             mcuy) -> tuple:
    """Vectorized baseline entropy coding (no restart markers): emit
    the full interleaved-MCU token stream as two int64 arrays
    (values, bit-lengths) in one numpy pass — byte-identical to the
    per-block ``_encode_block`` loop it replaces on that path, which
    walked every nonzero coefficient in interpreted Python (the
    encoder's dominant cost at fixture scale).

    Token ordering is reconstructed with a stable sort over integer
    keys ``visit_index * 1024 + slot``: slot 0/1 = DC symbol/extra,
    2 + 5*j + {0,1,2} = up to three ZRLs of the j-th nonzero,
    2 + 5*j + {3,4} = its symbol/extra bits, 1000 = EOB. The visit
    index is the T.81 interleave (MCU-major, components in order,
    then the component's vs x hs sub-blocks row-major)."""
    nb = [hs * vs for hs, vs in samp]
    nbm = sum(nb)
    offs = np.cumsum([0] + nb)
    tv, tl, tk = [], [], []
    for ci in range(c):
        hs, vs = samp[ci]
        g = grids[ci]
        if hs == 1 and vs == 1:
            blk = g.reshape(-1, 64).astype(np.int64)
        else:
            blk = (g.reshape(mcuy, vs, mcux, hs, 64)
                   .transpose(0, 2, 1, 3, 4)
                   .reshape(-1, 64).astype(np.int64))
        n = blk.shape[0]
        ar = np.arange(n, dtype=np.int64)
        gidx = (ar // nb[ci]) * nbm + offs[ci] + (ar % nb[ci])
        dc_code, dc_len = _code_arrays(tables[ci][0], 17)
        ac_code, ac_len = _code_arrays(tables[ci][1], 256)
        # --- DC: per-component predictor chain = diff over visit order
        diff = np.diff(blk[:, 0], prepend=0)
        ab = np.abs(diff)
        s = np.frexp(ab.astype(np.float64))[1].astype(np.int64)
        tv.append(dc_code[s]); tl.append(dc_len[s]); tk.append(gidx * 1024)
        m = s > 0
        extra = np.where(diff >= 0, diff,
                         diff + np.left_shift(np.int64(1), s) - 1)
        tv.append(extra[m]); tl.append(s[m]); tk.append(gidx[m] * 1024 + 1)
        # --- AC: runs from nonzero index gaps, ZRL for runs > 15
        ac = blk[:, 1:]
        bz, kz = np.nonzero(ac)  # row-major: sorted by (block, pos)
        last = np.full(n, -1, dtype=np.int64)
        if len(bz):
            vals = ac[bz, kz]
            prev = np.empty(len(bz), dtype=np.int64)
            prev[0] = -1
            prev[1:] = np.where(bz[1:] == bz[:-1], kz[:-1], -1)
            run = kz - prev - 1
            zrl = run >> 4
            rem = run & 15
            sv = np.frexp(np.abs(vals).astype(np.float64))[1].astype(
                np.int64)
            sym = (rem << 4) | sv
            extra_ac = np.where(vals >= 0, vals,
                                vals + np.left_shift(np.int64(1), sv) - 1)
            j = np.arange(len(bz), dtype=np.int64) - np.searchsorted(
                bz, bz)
            basekey = gidx[bz] * 1024 + 2 + 5 * j
            nz_tot = int(zrl.sum())
            if nz_tot:
                rep = np.repeat(np.arange(len(bz)), zrl)
                starts = np.concatenate(
                    [[0], np.cumsum(zrl)[:-1]])[rep]
                slot = np.arange(nz_tot, dtype=np.int64) - starts
                tv.append(np.full(nz_tot, ac_code[0xF0]))
                tl.append(np.full(nz_tot, ac_len[0xF0]))
                tk.append(basekey[rep] + slot)
            tv.append(ac_code[sym]); tl.append(ac_len[sym])
            tk.append(basekey + 3)
            tv.append(extra_ac); tl.append(sv); tk.append(basekey + 4)
            last[bz] = kz  # row-major assignment: last write wins
        eob = last < 62
        tv.append(np.full(int(eob.sum()), ac_code[0x00]))
        tl.append(np.full(int(eob.sum()), ac_len[0x00]))
        tk.append(gidx[eob] * 1024 + 1000)
    v = np.concatenate(tv)
    l = np.concatenate(tl)
    k = np.concatenate(tk)
    order = np.argsort(k, kind="stable")
    return v[order], l[order]


def _encode_block(bw: _BatchWriter, blk: np.ndarray,
                  dc_codes, ac_codes, pred: int) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor.
    Iterates the NONZERO coefficients only (runs come from index gaps)
    and appends fields straight onto the batch writer's lists."""
    vals = bw.vals
    lens = bw.lens
    dc = int(blk[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, length = dc_codes[s]
    vals.append(code)
    lens.append(length)
    if s:
        vals.append(diff if diff >= 0 else diff + (1 << s) - 1)
        lens.append(s)
    ac = blk[1:]
    nz = np.nonzero(ac)[0]
    if len(nz) == 0:
        code, length = ac_codes[0x00]  # EOB
        vals.append(code)
        lens.append(length)
        return dc
    zrl_code, zrl_len = ac_codes[0xF0]
    prev = 0
    for k, v in zip(nz.tolist(), ac[nz].tolist()):
        run = k - prev
        prev = k + 1
        while run > 15:
            vals.append(zrl_code)
            lens.append(zrl_len)
            run -= 16
        s = (v if v >= 0 else -v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        vals.append(code)
        lens.append(length)
        vals.append(v if v >= 0 else v + (1 << s) - 1)
        lens.append(s)
    if prev < 63:
        code, length = ac_codes[0x00]  # EOB
        vals.append(code)
        lens.append(length)
    return dc


class _AcProg:
    """AC progressive-scan encoder state: the end-of-band run and the
    correction bits that travel with it (libjpeg's EOBRUN + BE)."""

    __slots__ = ("bw", "codes", "eobrun", "be")

    def __init__(self, bw, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.be: list = []

    def flush_eob(self) -> None:
        if self.eobrun == 0:
            return
        n = self.eobrun.bit_length() - 1
        code, length = self.codes[n << 4]
        self.bw.write(code, length)
        if n:
            self.bw.write(self.eobrun - (1 << n), n)
        for bit in self.be:
            self.bw.write(bit, 1)
        self.be = []
        self.eobrun = 0


def _ac_first_encode(st: _AcProg, coefs, ss, se, al) -> None:
    """First scan of a band: runs + EOBn, values point-transformed by
    a sign-magnitude shift of Al (T.81 G.1.2.2)."""
    bw, codes = st.bw, st.codes
    r = 0
    for k in range(ss, se + 1):
        v = int(coefs[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        t = a if v >= 0 else -a
        st.flush_eob()
        while r > 15:
            code, length = codes[0xF0]
            bw.write(code, length)
            r -= 16
        s = a.bit_length()
        code, length = codes[(r << 4) | s]
        bw.write(code, length)
        bw.write(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _ac_refine_encode(st: _AcProg, coefs, ss, se, al) -> None:
    """Refinement scan of a band (T.81 G.1.2.3): newly-nonzero
    coefficients (shifted magnitude exactly 1) get run-coded with a
    sign bit; already-nonzero history coefficients contribute one
    correction bit each, buffered and emitted after the next symbol
    (or absorbed into the EOB run)."""
    bw, codes = st.bw, st.codes
    ts = []
    kex = -1
    for i, k in enumerate(range(ss, se + 1)):
        v = int(coefs[k])
        a = abs(v) >> al
        ts.append((a, v))
        if a == 1:
            kex = i
    r = 0
    br: list = []
    for i, (a, v) in enumerate(ts):
        if a == 0:
            r += 1
            continue
        # ZRLs fold into the EOB run when no new-nonzero follows
        while r > 15 and i <= kex:
            st.flush_eob()
            code, length = codes[0xF0]
            bw.write(code, length)
            for bit in br:
                bw.write(bit, 1)
            br = []
            r -= 16
        if a > 1:  # history: correction bit only
            br.append(a & 1)
            continue
        st.flush_eob()
        code, length = codes[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if v >= 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _dct_quant_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) → (n_blocks, 64)
    int32 quantized zigzag coefficients, block scan order row-major."""
    h, w = plane.shape
    bh, bw_ = h // 8, w // 8
    blocks = (plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    coefs = _A @ blocks @ _A.T
    flat = coefs.reshape(-1, 64)
    qd = np.rint(flat / q[None, :]).astype(np.int32)
    return qd[:, ZZ]


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(H, W), (H, W, 1) or (H, W, 3) uint8 array → JPEG bytes.
    ``subsample``: ``"444"`` (one block per component per MCU) or
    ``"420"`` (2×2 luma blocks + box-averaged chroma — the wild web
    default). ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (baseline only). ``progressive=True`` writes SOF2
    with the full scan script — interleaved DC first/refine (Al 1→0)
    then per-component spectral bands 1-5 and 6-63, each first at
    Al=1 then refined — exercising EOB runs, ZRL folding and
    correction-bit buffering; coefficient content is identical to the
    baseline stream, only the entropy order differs. Annex K tables,
    fixed float path ⇒ byte-deterministic."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if h == 0 or w == 0:
        raise JpegError("cannot encode empty image")
    if c not in (1, 3):
        raise JpegError(f"cannot encode {c}-channel array (1 or 3)")
    if subsample not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsample!r}")
    if progressive and restart_interval:
        raise JpegError("restart markers unsupported in the "
                        "progressive writer (decode supports them)")
    sub420 = subsample == "420" and c == 3

    qlum = _quality_scale(QT_LUM, quality)
    qchrom = _quality_scale(QT_CHROM, quality)

    # pad to MCU multiples by edge replication
    mcu_px = 16 if sub420 else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    padded = np.pad(a.astype(np.float64),
                    ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    if c == 3:
        r, g, bch = padded[:, :, 0], padded[:, :, 1], padded[:, :, 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * bch
        cbp = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bch
        crp = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bch
        if sub420:
            # box-average 2x2 chroma downsample
            cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [(yp, qlum), (cbp, qchrom), (crp, qchrom)]
    else:
        planes = [(padded[:, :, 0], qlum)]

    dc_lum = _encode_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _encode_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chrom = _encode_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chrom = _encode_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    # per-comp zigzag blocks reshaped to a (block_rows, block_cols, 64)
    # grid so the MCU interleave can index by block coordinates
    grids = []
    samp = []  # (hs, vs) per component
    for ci, (p, q) in enumerate(planes):
        zzb = _dct_quant_zz(p - 128.0, q)
        gh, gw = p.shape[0] // 8, p.shape[1] // 8
        grids.append(zzb.reshape(gh, gw, 64))
        samp.append((2, 2) if (sub420 and ci == 0) else (1, 1))

    # headers
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        zzt = tbl[ZZ]  # serialize in zigzag order
        return (b"\xff\xdb" + struct.pack(">H", 67)
                + bytes([tq]) + bytes(int(x) for x in zzt))

    out += dqt(0, qlum)
    if c == 3:
        out += dqt(1, qchrom)

    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci in range(c):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc: int, th: int, bits, vals) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    if progressive:
        # AC scans need EOBn symbols: one shared flat table (slot 0)
        out += dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
    else:
        out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if c == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        if not progressive:
            out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    tables = [(dc_lum, ac_lum)] + [(dc_chrom, ac_chrom)] * (c - 1)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)

    if progressive:
        out += _encode_progressive_scans(grids, samp, tables, c,
                                         mcux, mcuy, hmax, vmax, h, w)
        out += b"\xff\xd9"
        return bytes(out)

    sos = bytes([c])
    for ci in range(c):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # interleaved MCU scan
    bw = _BatchWriter()
    if restart_interval == 0:
        # the common no-restart stream: one vectorized numpy pass
        # (byte-identical to the block loop below, which restart
        # segmentation still uses — predictor resets break the single
        # diff chain)
        v, l = _encode_baseline_entropy(grids, samp, tables, c,
                                        mcux, mcuy)
        bw.vals, bw.lens = v, l
        out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)
    preds = [0] * c
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.marker(0xD0 + (mcu_count // restart_interval - 1) % 8)
                preds = [0] * c
            for ci in range(c):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            bw, grids[ci][my * vs + by, mx * hs + bx],
                            tables[ci][0], tables[ci][1], preds[ci])
            mcu_count += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive_scans(grids, samp, tables, c, mcux, mcuy,
                              hmax, vmax, h, w) -> bytes:
    """The SOF2 scan script: DC first (Al=1, interleaved) → DC refine
    → per component AC bands (1-5, 6-63) first at Al=1 → refined to
    Al=0."""
    out = bytearray()

    def sos(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            body += bytes([cid, tdta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    def dc_td(ci):
        return 0 if ci == 0 else 1

    # 1. DC first, Al=1, all components interleaved
    out += sos([(ci + 1, dc_td(ci) << 4) for ci in range(c)], 0, 0, 0, 1)
    bw = _BatchWriter()
    preds = [0] * c
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(c):
                hs, vs = samp[ci]
                dc_codes = tables[ci][0]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(grids[ci][my * vs + by, mx * hs + bx, 0])
                        v >>= 1  # arithmetic point transform (Al=1)
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = abs(diff).bit_length()
                        code, length = dc_codes[s]
                        bw.write(code, length)
                        if s:
                            bw.write(diff if diff >= 0
                                     else diff + (1 << s) - 1, s)
    out += bw.flush()

    # 2. DC refine, Ah=1 → Al=0: one raw bit per block, same order
    out += sos([(ci + 1, dc_td(ci) << 4) for ci in range(c)], 0, 0, 1, 0)
    bw = _BatchWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(c):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bw.write(int(grids[ci][my * vs + by,
                                               mx * hs + bx, 0]) & 1, 1)
    out += bw.flush()

    # 3./4. AC bands per component: first at Al=1, then refine to 0.
    # All AC scans share the flat progressive table (slot 0).
    prog_ac = _encode_codes(PROG_AC_BITS, PROG_AC_VALS)
    bands = [(1, 5), (6, 63)]
    for ah, al, enc in ((0, 1, _ac_first_encode),
                        (1, 0, _ac_refine_encode)):
        for ci in range(c):
            hs, vs = samp[ci]
            ch = -(-h * vs // vmax)   # component sample dims
            cw = -(-w * hs // hmax)
            rows, cols = -(-ch // 8), -(-cw // 8)
            for ss, se in bands:
                out += sos([(ci + 1, 0)], ss, se, ah, al)
                bw = _BatchWriter()
                st = _AcProg(bw, prog_ac)
                for by in range(rows):
                    for bx in range(cols):
                        enc(st, grids[ci][by, bx], ss, se, al)
                st.flush_eob()
                out += bw.flush()
    return bytes(out)


def make_test_jpeg(width: int, height: int, seed: int = 0,
                   quality: int = 90) -> bytes:
    """Deterministic synthetic baseline JPEG (same affine pixel pattern
    as ``png_codec.make_test_png``) — the corpus generator for oracled
    queries over REAL JPEG bytes."""
    y = np.arange(height, dtype=np.int64)[:, None, None]
    x = np.arange(width, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    px = ((x * 31 + y * 17 + ch * 7 + seed * 13) % 256).astype(np.uint8)
    return jpeg_encode(px, quality=quality)
