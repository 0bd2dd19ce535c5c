"""TrueType ``cmap`` table parsing — the text-recovery fallback for
embedded fonts that ship NO /ToUnicode CMap.

A CID PDF with ``/Encoding /Identity-H`` maps character codes straight
to glyph ids (CID == GID). When the font also omits /ToUnicode, the
only route back to text is the embedded font program itself: its
``cmap`` table records unicode → glyph id, so inverting it yields
glyph id → unicode. The reference gets this via pdfplumber's embedded
font handling (``lexoid/core/parse_type/static_parser.py:700-727``);
here it is a from-scratch sfnt walk on ``struct`` only.

Parser scope: sfnt table directory → ``cmap`` → subtable formats 4
(segment mapping to delta values, the BMP workhorse) and 12
(segmented coverage, supplementary planes), preferring (3,10) fmt-12
then (3,1) fmt-4 then anything parseable. Malformed programs return
``{}`` (the caller keeps its "�" fallback) — never raise.

Builder scope (fixtures/corpus only): a minimal parser-grade sfnt
with ONE ``cmap`` table; format 4 with per-run segments, using the
idDelta fast path for gid-consecutive runs and the
idRangeOffset/glyphIdArray indirection otherwise, so tests exercise
both decode paths. Not a renderable font — no glyf/head/hmtx — which
is exactly what a text-extraction parser consumes.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

_MAX_MAPPINGS = 1 << 16  # cap inversion work on hostile inputs


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from(">H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _parse_format4(b: bytes, off: int, out: Dict[int, int]) -> None:
    """Format 4: binary layout per OpenType spec §cmap. Fills
    ``out[charcode] = gid``."""
    seg_x2 = _u16(b, off + 6)
    seg = seg_x2 // 2
    end_off = off + 14
    start_off = end_off + seg_x2 + 2      # +2: reservedPad
    delta_off = start_off + seg_x2
    range_off = delta_off + seg_x2
    for i in range(seg):
        end_c = _u16(b, end_off + 2 * i)
        start_c = _u16(b, start_off + 2 * i)
        delta = _u16(b, delta_off + 2 * i)
        roff = _u16(b, range_off + 2 * i)
        if start_c > end_c:
            continue
        for c in range(start_c, min(end_c, 0xFFFE) + 1):
            if roff == 0:
                gid = (c + delta) & 0xFFFF
            else:
                # spec quirk: offset is relative to ITS OWN position
                addr = range_off + 2 * i + roff + 2 * (c - start_c)
                if addr + 2 > len(b):
                    continue
                gid = _u16(b, addr)
                if gid:
                    gid = (gid + delta) & 0xFFFF
            if gid:
                out[c] = gid
            if len(out) >= _MAX_MAPPINGS:
                return


def _parse_format12(b: bytes, off: int, out: Dict[int, int]) -> None:
    """Format 12: nGroups × (startChar, endChar, startGlyph)."""
    n_groups = _u32(b, off + 12)
    pos = off + 16
    for _ in range(min(n_groups, _MAX_MAPPINGS)):
        if pos + 12 > len(b):
            return
        start_c, end_c, start_g = struct.unpack_from(">III", b, pos)
        pos += 12
        if start_c > end_c or end_c > 0x10FFFF:
            continue
        for k in range(min(end_c - start_c, _MAX_MAPPINGS) + 1):
            gid = start_g + k
            if gid:
                out[start_c + k] = gid
            if len(out) >= _MAX_MAPPINGS:
                return


def char_to_gid(prog: bytes) -> Dict[int, int]:
    """Font program → {unicode codepoint: glyph id}. ``{}`` on any
    structural problem (caller falls back, never crashes)."""
    try:
        b = bytes(prog)
        if len(b) < 12:
            return {}
        tag = b[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
            return {}
        num_tables = _u16(b, 4)
        cmap_off = None
        for i in range(min(num_tables, 64)):
            rec = 12 + 16 * i
            if rec + 16 > len(b):
                return {}
            if b[rec:rec + 4] == b"cmap":
                cmap_off = _u32(b, rec + 8)
                break
        if cmap_off is None or cmap_off + 4 > len(b):
            return {}
        n_sub = _u16(b, cmap_off + 2)
        subs: List[Tuple[int, int, int]] = []  # (priority, fmt, offset)
        for i in range(min(n_sub, 32)):
            rec = cmap_off + 4 + 8 * i
            if rec + 8 > len(b):
                break
            plat = _u16(b, rec)
            enc = _u16(b, rec + 2)
            soff = cmap_off + _u32(b, rec + 4)
            if soff + 2 > len(b):
                continue
            fmt = _u16(b, soff)
            if fmt not in (4, 12):
                continue
            if (plat, enc) == (3, 10):
                prio = 0
            elif (plat, enc) == (3, 1):
                prio = 1
            elif plat == 0:
                prio = 2
            else:
                prio = 3
            subs.append((prio, fmt, soff))
        if not subs:
            return {}
        _, fmt, soff = min(subs)
        out: Dict[int, int] = {}
        if fmt == 12:
            _parse_format12(b, soff, out)
        else:
            _parse_format4(b, soff, out)
        return out
    except (struct.error, IndexError, OverflowError):
        return {}


def gid_to_text(prog: bytes) -> Dict[int, str]:
    """Font program → {glyph id: character} — the inversion an
    Identity-H PDF without /ToUnicode needs (CID == GID). When two
    codepoints share a glyph, the LOWEST codepoint wins
    (deterministic)."""
    inv: Dict[int, str] = {}
    for c in sorted(char_to_gid(prog).items()):
        cp, gid = c
        if gid not in inv:
            inv[gid] = chr(cp)
    return inv


# ---------------------------------------------------------------- builder


def _format4_bytes(charmap: Dict[int, int]) -> bytes:
    """Format-4 subtable for {codepoint: gid} (BMP only). Contiguous
    codepoint runs with consecutive gids use the idDelta fast path;
    other runs spill into glyphIdArray via idRangeOffset — so a parser
    reading fixtures exercises both."""
    cps = sorted(cp for cp in charmap if cp <= 0xFFFE)
    runs: List[List[int]] = []
    for cp in cps:
        if runs and cp == runs[-1][-1] + 1:
            runs[-1].append(cp)
        else:
            runs.append([cp])
    segs: List[Tuple[int, int, int, List[int]]] = []
    for run in runs:  # (start, end, delta, glyph_list)
        gids = [charmap[c] for c in run]
        consecutive = all(g == gids[0] + k for k, g in enumerate(gids))
        if consecutive:
            segs.append((run[0], run[-1],
                         (gids[0] - run[0]) & 0xFFFF, []))
        else:
            segs.append((run[0], run[-1], 0, gids))
    segs.append((0xFFFF, 0xFFFF, 1, []))  # required terminator

    seg_count = len(segs)
    seg_x2 = seg_count * 2
    import math

    search_range = 2 * (2 ** int(math.floor(math.log2(seg_count))))
    entry_sel = int(math.floor(math.log2(seg_count)))
    glyph_arr: List[int] = []
    ends, starts, deltas, roffs = [], [], [], []
    for i, (s, e, d, gl) in enumerate(segs):
        ends.append(e)
        starts.append(s)
        deltas.append(d)
        if gl:
            # distance (bytes) from THIS idRangeOffset slot to the
            # glyph ids appended at the current end of glyphIdArray
            roffs.append(2 * (seg_count - i + len(glyph_arr)))
            glyph_arr.extend(gl)
        else:
            roffs.append(0)
    body = struct.pack(">HHHH", seg_x2, search_range, entry_sel,
                       seg_x2 - search_range)
    body += struct.pack(">%dH" % seg_count, *ends)
    body += b"\x00\x00"  # reservedPad
    body += struct.pack(">%dH" % seg_count, *starts)
    body += struct.pack(">%dH" % seg_count, *deltas)
    body += struct.pack(">%dH" % seg_count, *roffs)
    body += struct.pack(">%dH" % len(glyph_arr), *glyph_arr)
    return struct.pack(">HHH", 4, 14 + len(body), 0) + body


def ttf_build(charmap: Dict[str, int]) -> bytes:
    """{char: gid} → minimal parser-grade sfnt: offset table + one
    table record + a (3,1) format-4 ``cmap``. Deterministic bytes."""
    cmap_sub = _format4_bytes({ord(c): g for c, g in charmap.items()})
    cmap_table = (struct.pack(">HH", 0, 1)
                  + struct.pack(">HHI", 3, 1, 12)
                  + cmap_sub)
    # offset table: one table → searchRange 16, entrySelector 0
    header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    record = b"cmap" + struct.pack(">III", 0, 28, len(cmap_table))
    assert len(header) + len(record) == 28
    return header + record + cmap_table
