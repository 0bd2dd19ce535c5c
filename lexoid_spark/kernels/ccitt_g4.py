"""CCITT Group 4 (ITU-T T.6, 2-D MMR) codec — the dominant
compression for black-and-white document scans inside PDFs
(``/Filter /CCITTFaxDecode`` with ``/K < 0``).

Decode: pure 2-D coding — per line, the changing elements are coded
against the reference line above via vertical (V0, VR/VL 1–3),
horizontal (H + two T.4 run-length codes) and pass (P) modes; the
imaginary all-white line references the first row. Run lengths use
the T.4 white/black terminating codes (0–63) + makeup codes (64–2560,
extended makeups shared by both colors). Output is (rows, columns)
uint8 with ink=0 on white=255 (PDF default /BlackIs1 false: 0-bits
are BLACK per the photometric convention — the caller flips if its
dict says otherwise; this module returns ink-as-0 arrays matching the
repo's OCR convention).

Encode (fixtures/corpus only): the standard coding decision — P when
b2 < a1, V when |a1−b1| ≤ 3, else H — plus EOFB. Deterministic bytes.

The tables below are transcribed from the public ITU-T T.4 §2 /
T.6 spec; the round-trip tests pin self-consistency and a handful of
spot bit patterns pin the transcription against the published values.
The reference reads such PDFs through pdfplumber/pypdfium
(``lexoid/core/parse_type/static_parser.py:700-727`` route); no
reference code exists for the codec itself.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, List, Tuple

import numpy as np


class CcittError(ValueError):
    pass


# --- T.4 run-length code tables: run → (code_int, n_bits) ------------------

_WHITE_TERM: Dict[int, Tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6),
    15: (0b110101, 6), 16: (0b101010, 6), 17: (0b101011, 6),
    18: (0b0100111, 7), 19: (0b0001100, 7), 20: (0b0001000, 7),
    21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7),
    27: (0b0100100, 7), 28: (0b0011000, 7), 29: (0b00000010, 8),
    30: (0b00000011, 8), 31: (0b00011010, 8), 32: (0b00011011, 8),
    33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8),
    39: (0b00101000, 8), 40: (0b00101001, 8), 41: (0b00101010, 8),
    42: (0b00101011, 8), 43: (0b00101100, 8), 44: (0b00101101, 8),
    45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8),
    51: (0b01010100, 8), 52: (0b01010101, 8), 53: (0b00100100, 8),
    54: (0b00100101, 8), 55: (0b01011000, 8), 56: (0b01011001, 8),
    57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8),
    63: (0b00110100, 8),
}

_WHITE_MAKEUP: Dict[int, Tuple[int, int]] = {
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9),
    1152: (0b011010111, 9), 1216: (0b011011000, 9),
    1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9),
    1536: (0b010011001, 9), 1600: (0b010011010, 9), 1664: (0b011000, 6),
    1728: (0b010011011, 9),
}

_BLACK_TERM: Dict[int, Tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7),
    11: (0b0000101, 7), 12: (0b0000111, 7), 13: (0b00000100, 8),
    14: (0b00000111, 8), 15: (0b000011000, 9), 16: (0b0000010111, 10),
    17: (0b0000011000, 10), 18: (0b0000001000, 10),
    19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11),
    23: (0b00000101000, 11), 24: (0b00000010111, 11),
    25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12),
    29: (0b000011001101, 12), 30: (0b000001101000, 12),
    31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12),
    35: (0b000011010011, 12), 36: (0b000011010100, 12),
    37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12),
    41: (0b000001101101, 12), 42: (0b000011011010, 12),
    43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12),
    47: (0b000001010111, 12), 48: (0b000001100100, 12),
    49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12),
    53: (0b000000110111, 12), 54: (0b000000111000, 12),
    55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12),
    59: (0b000000101011, 12), 60: (0b000000101100, 12),
    61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
}

_BLACK_MAKEUP: Dict[int, Tuple[int, int]] = {
    64: (0b0000001111, 10), 128: (0b000011001000, 12),
    192: (0b000011001001, 12), 256: (0b000001011011, 12),
    320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13),
    576: (0b0000001101101, 13), 640: (0b0000001001010, 13),
    704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13),
    960: (0b0000001110011, 13), 1024: (0b0000001110100, 13),
    1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13),
    1344: (0b0000001010011, 13), 1408: (0b0000001010100, 13),
    1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13),
    1728: (0b0000001100101, 13),
}

# extended makeups 1792–2560 are shared by both colors (T.4 table 3)
_EXT_MAKEUP: Dict[int, Tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11),
    1920: (0b00000001101, 11), 1984: (0b000000010010, 12),
    2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12),
    2304: (0b000000010111, 12), 2368: (0b000000011100, 12),
    2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}


def _decode_map(term, makeup):
    """(code_int, n_bits) → run, merged term+makeup+extended."""
    out = {}
    for table in (term, makeup, _EXT_MAKEUP):
        for run, (code, bits) in table.items():
            out[(code, bits)] = run
    return out

_WHITE_DEC = _decode_map(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_map(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_BITS = 13

# 2-D mode codes (T.6 table 1)
_MODE_V0 = (0b1, 1)
_MODE_VR = {1: (0b011, 3), 2: (0b000011, 6), 3: (0b0000011, 7)}
_MODE_VL = {1: (0b010, 3), 2: (0b000010, 6), 3: (0b0000010, 7)}
_MODE_H = (0b001, 3)
_MODE_P = (0b0001, 4)


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        v = 0
        for i in range(k):
            p = self.pos + i
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1
                            if p < self.n else 0)
        return v

    def skip(self, k: int) -> None:
        self.pos += k


def _read_run(bits: _Bits, dec) -> int:
    """One T.4 run: makeup codes accumulate until a terminating code
    (< 64) closes the run."""
    total = 0
    while True:
        for nb in range(2, _MAX_CODE_BITS + 1):
            run = dec.get((bits.peek(nb), nb))
            if run is not None:
                bits.skip(nb)
                total += run
                if run < 64:
                    return total
                break
        else:
            raise CcittError("bad run-length code")


def _find_b1_b2(ref: List[int], a0: int, color: int,
                columns: int) -> Tuple[int, int]:
    """b1 = first reference-line changing element right of a0 whose
    transition parity matches the current color (even-indexed
    transitions are white→black); b2 = the next one."""
    i = bisect_right(ref, a0)
    if i < len(ref) and (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else columns
    b2 = ref[i + 1] if i + 1 < len(ref) else columns
    return b1, b2


def _check_dims(columns: int, rows: int) -> None:
    if columns <= 0 or rows <= 0 or columns > 1 << 16 or rows > 1 << 16 \
            or rows * columns > 1 << 28:
        # cap BOTH axes and the product: np.full allocates before any
        # decoding, so a hostile /Rows must fail as CcittError (→
        # quarantine), not as MemoryError escaping the typed-error path
        raise CcittError("bad dimensions")


def _decode_line_2d(bits: _Bits, ref: List[int],
                    columns: int) -> List[int]:
    """One 2-D-coded line (shared by T.6 pure-MMR and T.4 /K>0 MR
    lines): changing elements decoded against ``ref`` via V/H/P
    modes. Returns the line's transition list."""
    cur: List[int] = []
    a0 = -1
    color = 0  # 0 = white
    while a0 < columns:
        b1, b2 = _find_b1_b2(ref, a0, color, columns)
        if bits.peek(1) == _MODE_V0[0]:
            bits.skip(1)
            a1 = b1
        elif bits.peek(3) == _MODE_H[0]:
            bits.skip(3)
            base = max(a0, 0)
            r1 = _read_run(bits, _BLACK_DEC if color else _WHITE_DEC)
            r2 = _read_run(bits, _WHITE_DEC if color else _BLACK_DEC)
            a1 = base + r1
            a2 = a1 + r2
            if a2 > columns or a1 > columns:
                raise CcittError("H run overflows line")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        elif bits.peek(4) == _MODE_P[0]:
            bits.skip(4)
            a0 = b2
            continue
        elif bits.peek(3) == _MODE_VR[1][0]:
            bits.skip(3)
            a1 = b1 + 1
        elif bits.peek(3) == _MODE_VL[1][0]:
            bits.skip(3)
            a1 = b1 - 1
        elif bits.peek(6) == _MODE_VR[2][0]:
            bits.skip(6)
            a1 = b1 + 2
        elif bits.peek(6) == _MODE_VL[2][0]:
            bits.skip(6)
            a1 = b1 - 2
        elif bits.peek(7) == _MODE_VR[3][0]:
            bits.skip(7)
            a1 = b1 + 3
        elif bits.peek(7) == _MODE_VL[3][0]:
            bits.skip(7)
            a1 = b1 - 3
        else:
            raise CcittError("bad 2-D mode code")
        if a1 < 0 or a1 > columns:
            raise CcittError("vertical move out of line")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur


def _decode_line_1d(bits: _Bits, columns: int) -> List[int]:
    """One T.4 1-D MH line: alternating white/black run lengths until
    the line is exactly ``columns`` wide. Returns transitions."""
    cur: List[int] = []
    pos = 0
    color = 0
    while pos < columns:
        if len(cur) > 2 * columns + 2:
            # hostile zero-length-run streams advance bits but not
            # pos; bound the transition list so they fail typed
            raise CcittError("1-D line transition overflow")
        run = _read_run(bits, _BLACK_DEC if color else _WHITE_DEC)
        pos += run
        if pos > columns:
            raise CcittError("1-D run overflows line")
        cur.append(pos)
        color ^= 1
    # the terminal transition at `columns` stays in (the painting
    # convention 2-D lines use); the caller filters it for the
    # reference line
    return cur


def _paint_line(out: np.ndarray, y: int, cur: List[int],
                columns: int) -> None:
    """Paint black segments (between even- and odd-indexed
    transitions) into row ``y``."""
    for i in range(0, len(cur) - 1 if len(cur) % 2 else len(cur), 2):
        lo = cur[i]
        hi = cur[i + 1] if i + 1 < len(cur) else columns
        out[y, lo:min(hi, columns)] = 0


def g4_decode(data: bytes, columns: int, rows: int) -> np.ndarray:
    """T.6 bytes → (rows, columns) uint8, ink (black) = 0, white=255.
    Raises :class:`CcittError` on malformed input."""
    _check_dims(columns, rows)
    bits = _Bits(bytes(data))
    out = np.full((rows, columns), 255, dtype=np.uint8)
    ref: List[int] = []  # imaginary all-white line above row 0
    for y in range(rows):
        cur = _decode_line_2d(bits, ref, columns)
        _paint_line(out, y, cur, columns)
        ref = [t for t in cur if t < columns]
    return out


_EOL = (0b000000000001, 12)


def g3_decode(data: bytes, columns: int, rows: int,
              k: int = 0) -> np.ndarray:
    """CCITT Group 3 (ITU-T T.4) bytes → (rows, columns) uint8, ink
    (black) = 0, white = 255 — the ``/CCITTFaxDecode`` arms with
    ``/K >= 0``.

    ``k == 0``: pure 1-D MH — lines are bit-continuous alternating
    run-length codes with NO EOLs (the PDF default /EndOfLine false
    layout). ``k > 0``: mixed 2-D MR — every line is prefixed by an
    EOL code plus a tag bit (1 = the line is 1-D coded, 0 = 2-D coded
    against the line above), the T.4 §4.2.1 framing 2-D G3 requires
    to know each line's mode. Raises :class:`CcittError` on malformed
    input (including a missing EOL where ``k > 0`` demands one)."""
    _check_dims(columns, rows)
    if k < 0:
        raise CcittError("g3_decode wants /K >= 0 (use g4_decode)")
    bits = _Bits(bytes(data))
    out = np.full((rows, columns), 255, dtype=np.uint8)
    ref: List[int] = []
    for y in range(rows):
        if k > 0:
            # ITU-T T.4 §4.1.2 allows FILL (variable-length run of 0
            # bits) before each EOL; a 1 bit before the EOL completes
            # is a framing error. Cap the fill to bound hostile input.
            fill = 0
            while bits.peek(_EOL[1]) != _EOL[0]:
                if bits.peek(1) != 0:
                    raise CcittError("2-D G3 line without EOL")
                bits.skip(1)
                fill += 1
                if fill > 4096:
                    raise CcittError("implausible FILL run before EOL")
            bits.skip(_EOL[1])
            tag = bits.peek(1)
            bits.skip(1)
            cur = (_decode_line_1d(bits, columns) if tag
                   else _decode_line_2d(bits, ref, columns))
        else:
            cur = _decode_line_1d(bits, columns)
        _paint_line(out, y, cur, columns)
        ref = [t for t in cur if t < columns]
    return out


# --------------------------------------------------------------------------
# encoder (fixtures/corpus only)
# --------------------------------------------------------------------------

class _BitW:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, code: int, k: int) -> None:
        self.acc = (self.acc << k) | code
        self.nb += k
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)

    def done(self) -> bytes:
        if self.nb:
            self.buf.append((self.acc << (8 - self.nb)) & 0xFF)
            self.acc = 0
            self.nb = 0
        return bytes(self.buf)


def _write_run(w: _BitW, run: int, color: int) -> None:
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    while run >= 2624:  # 2560 + max terminating 63 → chain extendeds
        w.write(*_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        tbl = _EXT_MAKEUP if mk > 1728 else makeup
        w.write(*tbl[mk])
        run -= mk
    w.write(*term[run])


def _transitions(row: np.ndarray) -> List[int]:
    """Positions where the line changes color, starting white."""
    ink = row == 0
    d = np.flatnonzero(np.diff(np.r_[False, ink, False]))
    return d.tolist()


def _encode_line_2d(w: _BitW, cur: List[int], ref: List[int],
                    columns: int) -> None:
    """Standard 2-D coding decision — P when b2 < a1, V when
    |a1−b1| <= 3, else H — for one line's transitions against the
    reference line (shared by T.6 and T.4 /K>0)."""
    a0 = -1
    color = 0
    ci = 0  # index into cur of the next transition > a0
    while a0 < columns:
        b1, b2 = _find_b1_b2(ref, a0, color, columns)
        a1 = cur[ci] if ci < len(cur) else columns
        if b2 < a1:
            w.write(*_MODE_P)
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            if d == 0:
                w.write(*_MODE_V0)
            elif d > 0:
                w.write(*_MODE_VR[d])
            else:
                w.write(*_MODE_VL[-d])
            a0 = a1
            ci += 1
            color ^= 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
            w.write(*_MODE_H)
            base = max(a0, 0)
            _write_run(w, a1 - base, color)
            _write_run(w, a2 - a1, color ^ 1)
            a0 = a2
            ci += 2


def _encode_line_1d(w: _BitW, cur: List[int], columns: int) -> None:
    """One T.4 1-D MH line: alternating white/black run lengths."""
    pos = 0
    color = 0
    for t in cur + [columns]:
        if t > pos or color == 0:
            # a leading black line still needs its 0-length white run;
            # interior runs are never 0 (transitions are strict)
            _write_run(w, t - pos, color)
        pos = t
        color ^= 1
        if pos >= columns:
            break


def g4_encode(arr: np.ndarray) -> bytes:
    """(H, W) uint8 (ink=0, white=255) → T.6 bytes with EOFB."""
    if arr.ndim != 2:
        raise CcittError("g4_encode wants a 2-D array")
    rows, columns = arr.shape
    w = _BitW()
    ref: List[int] = []
    for y in range(rows):
        cur = _transitions(arr[y])
        _encode_line_2d(w, cur, ref, columns)
        ref = [t for t in cur if t < columns]
    w.write(*_EOL)  # EOFB = two EOLs
    w.write(*_EOL)
    return w.done()


def g3_encode(arr: np.ndarray, k: int = 0) -> bytes:
    """(H, W) uint8 (ink=0, white=255) → T.4 bytes. ``k == 0``: pure
    1-D MH, no EOLs (the PDF /EndOfLine false layout ``g3_decode``
    expects). ``k > 0``: every line gets an EOL + tag bit; one 1-D
    line every ``k`` lines, 2-D lines against the line above in
    between — the T.4 §4.2.1 K-parameter cadence. Deterministic
    bytes (fixtures/corpus only)."""
    if arr.ndim != 2:
        raise CcittError("g3_encode wants a 2-D array")
    if k < 0:
        raise CcittError("g3_encode wants k >= 0 (use g4_encode)")
    rows, columns = arr.shape
    w = _BitW()
    ref: List[int] = []
    for y in range(rows):
        cur = _transitions(arr[y])
        one_d = k == 0 or y % k == 0
        if k > 0:
            w.write(*_EOL)
            w.write(1 if one_d else 0, 1)
        if one_d:
            _encode_line_1d(w, cur, columns)
        else:
            _encode_line_2d(w, cur, ref, columns)
        ref = [t for t in cur if t < columns]
    return w.done()
