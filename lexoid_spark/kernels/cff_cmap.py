"""CFF / Type1C (``/FontFile3``) charset parsing — the glyph-name
text-recovery fallback for embedded PostScript-flavored fonts that
ship NO /ToUnicode CMap.

The TrueType route (``kernels/ttf_cmap.py``) inverts the program's
``cmap`` table; CFF programs carry no cmap — the way back to text is
the **charset**: it maps glyph id → SID (string id), SIDs resolve to
glyph *names* (standard strings 0–390 per the CFF spec Appendix A,
then the font's own String INDEX), and glyph names map to Unicode by
the Adobe Glyph List conventions (``uniXXXX`` names and the standard
ISO-Adobe names). The reference reads such fonts via pdfplumber's
embedded-font handling (``lexoid/core/parse_type/static_parser.py:
700-727``); here it is a from-scratch walk on ``struct`` only.

Parser scope: header → Name/Top-DICT/String INDEXes → Top DICT
(charset op 15, CharStrings op 17 for the glyph count) → charset
formats 0/1/2 → gid→name→unicode. Name coverage: the ISO-Adobe
printable-ASCII standard strings (SIDs 1–95, AGL values — note
``quoteright``/``quoteleft`` are U+2019/U+2018 per AGL, not ASCII)
plus ``uniXXXX``/``uXXXX[XX]`` custom names; unknown names simply get
no entry (the caller keeps its "�" fallback). CID-keyed CFFs (Top
DICT carries /ROS) map gid→CID, not gid→name: when the character
collection is /Ordering (UCS2) the CID is the UCS-2 code point and
the charset walk yields the decode map; other collections would need
CID→Unicode tables — ``{}``, honestly out of scope. Malformed
programs return ``{}``, never raise.

Builder scope (fixtures/corpus only): a minimal parser-grade CFF with
one name, a Top DICT (charset + CharStrings offsets via fixed-width
op-29 integers), custom ``uniXXXX`` strings for non-ASCII chars and
standard SIDs for ASCII (so tests exercise both resolution paths), a
format-0 charset, and N+1 one-byte (endchar) charstrings. Not a
renderable font — exactly what a text-extraction parser consumes.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

_MAX_GLYPHS = 1 << 16  # cap work on hostile inputs

# SIDs 1..95 are the ISO-Adobe printable-ASCII names in ASCII order;
# their AGL unicode values are the ASCII chars except the two
# typographic quotes (see module docstring)
_STD_SID_CHARS = {i: chr(0x20 + i - 1) for i in range(1, 96)}
_STD_SID_CHARS[8] = "’"   # quoteright
_STD_SID_CHARS[65] = "‘"  # quoteleft
_N_STD_STRINGS = 391

# The same 95 ISO-Adobe names spelled out (SID order == ASCII order)
# — shared with the PDF /Encoding /Differences parser (Type3 and
# custom-encoded simple fonts name glyphs with exactly these).
STD_GLYPH_NAMES: Tuple[str, ...] = (
    "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
    "ampersand", "quoteright", "parenleft", "parenright", "asterisk",
    "plus", "comma", "hyphen", "period", "slash",
    "zero", "one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at",
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "braceleft", "bar", "braceright", "asciitilde",
)
_NAME_CHARS: Dict[str, str] = {
    n: _STD_SID_CHARS[i + 1] for i, n in enumerate(STD_GLYPH_NAMES)
}
# WinAnsi/PDFDoc spellings for the two code points whose Standard
# names are the typographic quotes (AGL: quotesingle=U+0027,
# grave=U+0060)
_NAME_CHARS["quotesingle"] = "'"
_NAME_CHARS["grave"] = "`"


def glyph_name_to_char(name: str) -> Optional[str]:
    """Glyph name → character by AGL conventions: the 95 ISO-Adobe
    standard names (plus quotesingle/grave), else uniXXXX/uXXXX[XX].
    ``None`` for names outside that coverage — callers keep their own
    replacement-char fallback."""
    ch = _NAME_CHARS.get(name)
    if ch is not None:
        return ch
    return _name_to_char(name)


def _name_to_char(name: str) -> Optional[str]:
    """AGL uniXXXX / uXXXX[X[X]] convention → character. Surrogate
    code points are excluded per the AGL spec — chr() would happily
    return a lone surrogate, which crashes the first UTF-8 encode
    downstream instead of falling back to the replacement char."""
    hexpart = None
    if name.startswith("uni") and len(name) == 7:
        hexpart = name[3:]
    elif name.startswith("u") and len(name) in (5, 6, 7):
        hexpart = name[1:]
    if hexpart is None:
        return None
    try:
        cp = int(hexpart, 16)
    except ValueError:
        return None
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return None
    return chr(cp)


def _read_index(b: bytes, pos: int) -> Tuple[List[bytes], int]:
    """One CFF INDEX → (items, next_pos). CFF1: count is u16; an empty
    INDEX is just the 2-byte zero count."""
    (count,) = struct.unpack_from(">H", b, pos)
    if count == 0:
        return [], pos + 2
    off_size = b[pos + 2]
    if not 1 <= off_size <= 4:
        raise ValueError("bad INDEX offSize")
    opos = pos + 3
    offs = []
    for i in range(count + 1):
        v = 0
        for j in range(off_size):
            v = (v << 8) | b[opos + i * off_size + j]
        offs.append(v)
    data0 = opos + (count + 1) * off_size - 1  # offsets are 1-based
    items = [b[data0 + offs[i]:data0 + offs[i + 1]] for i in range(count)]
    return items, data0 + offs[count]


def _parse_dict(d: bytes) -> Dict[int, List[int]]:
    """Top/Private DICT: operands then operator. Two-byte operators
    (12 x) key as 1200+x. Real-number operands (op 30) are consumed
    and recorded as 0 (no charset-relevant key takes reals)."""
    out: Dict[int, List[int]] = {}
    operands: List[int] = []
    i = 0
    n = len(d)
    while i < n:
        b0 = d[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                key = 1200 + d[i + 1]
                i += 2
            else:
                key = b0
                i += 1
            out[key] = operands
            operands = []
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", d, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", d, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: nibbles until 0xf terminator
            i += 1
            while i < n:
                nib = d[i]
                i += 1
                if (nib & 0x0F) == 0x0F or (nib >> 4) == 0x0F:
                    break
            operands.append(0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + d[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - d[i + 1] - 108)
            i += 2
        else:
            raise ValueError("reserved DICT byte")
    return out


def _charset_sids(b: bytes, off: int, n_glyphs: int) -> List[int]:
    """charset → SID per gid 1..n_glyphs-1 (gid 0 is .notdef)."""
    want = min(n_glyphs, _MAX_GLYPHS) - 1
    fmt = b[off]
    sids: List[int] = []
    pos = off + 1
    if fmt == 0:
        for i in range(want):
            sids.append(struct.unpack_from(">H", b, pos + 2 * i)[0])
    elif fmt in (1, 2):
        while len(sids) < want:
            first = struct.unpack_from(">H", b, pos)[0]
            if fmt == 1:
                n_left = b[pos + 2]
                pos += 3
            else:
                n_left = struct.unpack_from(">H", b, pos + 2)[0]
                pos += 4
            for k in range(n_left + 1):
                if len(sids) >= want:
                    break
                sids.append(first + k)
    else:
        raise ValueError("unknown charset format")
    return sids


def _sid_string(sid: int, strings: List[bytes]) -> str:
    """SID → string for the custom range (ROS registry/ordering are
    custom strings in practice; standard-range SIDs resolve to ''
    here — none of them spell a CID ordering)."""
    idx = sid - _N_STD_STRINGS
    if 0 <= idx < len(strings):
        return strings[idx].decode("latin-1", "ignore")
    return ""


def _cid_keyed_map(data: bytes, top: Dict[int, List[int]],
                   strings: List[bytes]) -> Dict[int, str]:
    """CID-keyed CFF (Top DICT carries /ROS): the charset maps
    gid → CID, not gid → glyph name. Text is recoverable only when
    the character collection pins CID semantics: with /Ordering
    (UCS2) the CID IS the UCS-2 code point (the unicode-CID
    convention some embedders use), so the decode map is
    {cid: chr(cid)} over exactly the CIDs the charset declares —
    a wrong charset walk surfaces as "�", never as wrong text. Any
    other ordering (Adobe-GB1, Japan1, Identity subsets, ...) would
    need the collection's CID→Unicode tables — out of scope, {}
    (the caller keeps its "�" fallback). VERDICT r04 task 7."""
    ros = top[1230]
    ordering = _sid_string(ros[1], strings) if len(ros) >= 2 else ""
    if ordering != "UCS2":
        return {}
    charset_off = top.get(15, [0])[0]
    cs_off = top.get(17)
    if charset_off <= 2 or not cs_off:
        return {}
    cstrings, _ = _read_index(data, cs_off[0])
    cids = _charset_sids(data, charset_off, len(cstrings))
    out: Dict[int, str] = {}
    for cid in cids:
        if not 0xD800 <= cid <= 0xDFFF:
            out[cid] = chr(cid)
    return out


def gid_to_text(data: bytes) -> Dict[int, str]:
    """CFF program bytes → {code: unicode char} for the Identity-H
    decode chain. Name-keyed programs key by gid (CID == GID);
    CID-keyed /ROS programs key by CID via the charset
    (:func:`_cid_keyed_map`). ``{}`` on anything unparseable or out
    of scope (non-UCS2 CID collections, predefined charsets)."""
    try:
        if len(data) < 4 or data[0] != 1:
            return {}
        pos = data[2]  # hdrSize
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            return {}
        top = _parse_dict(top_dicts[0])
        if 1230 in top:  # /ROS: CID-keyed, charset maps gid→CID
            return _cid_keyed_map(data, top, strings)
        charset_off = top.get(15, [0])[0]
        cs_off = top.get(17)
        if charset_off <= 2 or not cs_off:
            # 0/1/2 are predefined charsets (ISOAdobe/Expert/
            # ExpertSubset) — no byte-level table to walk
            return {}
        cstrings, _ = _read_index(data, cs_off[0])
        n_glyphs = len(cstrings)
        sids = _charset_sids(data, charset_off, n_glyphs)
        out: Dict[int, str] = {}
        for gid1, sid in enumerate(sids, start=1):
            if sid in _STD_SID_CHARS:
                out[gid1] = _STD_SID_CHARS[sid]
            elif sid >= _N_STD_STRINGS:
                idx = sid - _N_STD_STRINGS
                if idx < len(strings):
                    ch = _name_to_char(
                        strings[idx].decode("latin-1", "ignore"))
                    if ch is not None:
                        out[gid1] = ch
        return out
    except (struct.error, ValueError, IndexError):
        return {}


# --------------------------------------------------------------------------
# builder (fixtures/corpus only)
# --------------------------------------------------------------------------

def _build_index(items: List[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    total = sum(len(it) for it in items) + 1
    off_size = 1 if total < 0x100 else (2 if total < 0x10000 else 4)
    out = struct.pack(">HB", len(items), off_size)
    off = 1
    offs = []
    for it in items:
        offs.append(off)
        off += len(it)
    offs.append(off)
    pack = {1: ">B", 2: ">H", 4: ">I"}[off_size]
    for o in offs:
        out += struct.pack(pack, o)
    for it in items:
        out += it
    return out


def _op29(v: int) -> bytes:
    return b"\x1d" + struct.pack(">i", v)


def cff_build(cidmap: Dict[str, int], charset_format: int = 0) -> bytes:
    """Minimal parser-grade CFF: gid ``cidmap[ch]`` decodes back to
    ``ch``. ASCII chars use standard SIDs, others custom ``uniXXXX``
    strings. ``charset_format`` 0 or 2 (2 emits one-glyph ranges —
    exercises the range walk)."""
    if charset_format not in (0, 2):
        raise ValueError("charset_format must be 0 or 2")
    by_gid = sorted((g, ch) for ch, g in cidmap.items())
    if [g for g, _c in by_gid] != list(range(1, len(by_gid) + 1)):
        raise ValueError("cidmap gids must be exactly 1..N")
    custom: List[bytes] = []
    sids: List[int] = []
    for _g, ch in by_gid:
        cp = ord(ch)
        if 0x20 <= cp <= 0x7E and cp not in (0x27, 0x60):
            sids.append(cp - 0x20 + 1)
        else:
            custom.append(b"uni%04X" % cp)
            sids.append(_N_STD_STRINGS + len(custom) - 1)

    header = bytes((1, 0, 4, 1))
    name_ix = _build_index([b"LexoidCFF"])
    string_ix = _build_index(custom)
    gsubr_ix = _build_index([])
    cstr_ix = _build_index([b"\x0e"] * (len(by_gid) + 1))  # endchar

    if charset_format == 0:
        charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    else:
        charset = b"\x02" + b"".join(
            struct.pack(">HH", s, 0) for s in sids)

    # Top DICT with fixed-width offsets: two passes not needed
    def top_dict(charset_off: int, cstr_off: int) -> bytes:
        return (_op29(charset_off) + b"\x0f"     # op 15 charset
                + _op29(cstr_off) + b"\x11")     # op 17 CharStrings
    probe = _build_index([top_dict(0, 0)])
    base = len(header) + len(name_ix) + len(probe) + len(string_ix) \
        + len(gsubr_ix)
    top_ix = _build_index([top_dict(base, base + len(charset))])
    assert len(top_ix) == len(probe)
    return (header + name_ix + top_ix + string_ix + gsubr_ix
            + charset + cstr_ix)


def cff_build_cid(cidmap: Dict[str, int],
                  charset_format: int = 0) -> bytes:
    """Minimal parser-grade CID-keyed CFF (Top DICT /ROS with
    /Ordering (UCS2)): the charset maps gid → CID where
    ``cidmap[ch]`` must equal ``ord(ch)`` (the unicode-CID
    convention :func:`_cid_keyed_map` decodes). Not a renderable
    font — no FDArray/FDSelect, one-byte endchar charstrings —
    exactly what a text-extraction parser consumes."""
    if charset_format not in (0, 2):
        raise ValueError("charset_format must be 0 or 2")
    for ch, cid in cidmap.items():
        if cid != ord(ch):
            raise ValueError("CID-keyed fixture wants cid == ord(ch)")
    cids = sorted(cidmap.values())

    header = bytes((1, 0, 4, 1))
    name_ix = _build_index([b"LexoidCIDCFF"])
    # SIDs 391, 392: the ROS registry/ordering strings
    string_ix = _build_index([b"Adobe", b"UCS2"])
    gsubr_ix = _build_index([])
    cstr_ix = _build_index([b"\x0e"] * (len(cids) + 1))  # endchar

    if charset_format == 0:
        charset = b"\x00" + b"".join(struct.pack(">H", c) for c in cids)
    else:
        charset = b"\x02" + b"".join(
            struct.pack(">HH", c, 0) for c in cids)

    def top_dict(charset_off: int, cstr_off: int) -> bytes:
        return (_op29(_N_STD_STRINGS) + _op29(_N_STD_STRINGS + 1)
                + _op29(0) + b"\x0c\x1e"         # op 12 30 ROS
                + _op29(charset_off) + b"\x0f"   # op 15 charset
                + _op29(cstr_off) + b"\x11")     # op 17 CharStrings
    probe = _build_index([top_dict(0, 0)])
    base = len(header) + len(name_ix) + len(probe) + len(string_ix) \
        + len(gsubr_ix)
    top_ix = _build_index([top_dict(base, base + len(charset))])
    assert len(top_ix) == len(probe)
    return (header + name_ix + top_ix + string_ix + gsubr_ix
            + charset + cstr_ix)
