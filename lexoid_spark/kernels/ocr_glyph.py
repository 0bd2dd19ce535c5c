"""Deterministic glyph-template OCR over REAL pixels (P5).

Reference behavior being matched: ``parse_with_paddleocr``
(``lexoid/core/parse_type/static_parser.py:751-818``) recognizes text
from rendered page images and joins the recognized words with spaces.
The sandbox ships no OCR model, so recognition here is a
deterministic template matcher over a fixed 5x7 bitmap font: images
rendered with ``render_text`` / ``render_text_png`` (the corpus
"scanned page" fixture class) decode through the repo's own from-
scratch codecs (PNG inflate+unfilter, GIF LZW, baseline JPEG
huffman+IDCT) and come back out as the exact original string. This is
real OCR *plumbing* — pixel decode, binarization, line banding, glyph
segmentation, template classification, word-box emission — with a
closed glyph set instead of a neural recognizer; images whose ink
does not segment into known templates raise (→ quarantine), never a
silent wrong read.

Font: A-Z, 0-9 on a 5x7 grid. Every glyph has ink in row 0 and row 6
(so a line band is exactly 7*scale rows tall) and no internal blank
column (so one glyph = one column run). Rendering uses 1*scale blank
columns between letters and a 5*scale blank for the space character,
making the inter-word gap 7*scale — the recognizer splits words on
gaps > 3*scale.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

WordBox = Tuple[str, Tuple[float, float, float, float]]

_RAW_FONT = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"),
    "J": ("#####", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": ("####.", "....#", "....#", ".###.", "....#", "....#", "####."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "#....", "####.", "....#", "....#", "####."),
    "6": (".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", "..#..", "..#..", "..#.."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
}

GLYPH_W, GLYPH_H = 5, 7


def _bitmap(rows: Tuple[str, ...]) -> np.ndarray:
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


FONT: Dict[str, np.ndarray] = {ch: _bitmap(r) for ch, r in _RAW_FONT.items()}
# classification index: 35-bit pattern → char (patterns are unique —
# asserted at import so a font edit can never create a silent clash)
_PATTERNS: Dict[int, str] = {}
for _ch, _bm in FONT.items():
    _key = int("".join("1" if b else "0" for b in _bm.ravel()), 2)
    assert _key not in _PATTERNS, f"font clash: {_ch} vs {_PATTERNS[_key]}"
    _PATTERNS[_key] = _ch


def render_text(text: str, scale: int = 2,
                margin: int | None = None) -> np.ndarray:
    """Render (uppercase A-Z / 0-9 / space / newline) to a grayscale
    uint8 image: black ink on white, ``scale`` pixels per font cell,
    1-cell letter gaps, 3-cell line gaps."""
    if margin is None:
        margin = 2 * scale
    lines = text.split("\n")
    line_bitmaps: List[np.ndarray] = []
    for line in lines:
        cols: List[np.ndarray] = []
        for ch in line:
            if ch == " ":
                cols.append(np.zeros((GLYPH_H, GLYPH_W), dtype=bool))
            else:
                bm = FONT.get(ch)
                if bm is None:
                    raise ValueError(f"glyph font has no {ch!r}")
                cols.append(bm)
            cols.append(np.zeros((GLYPH_H, 1), dtype=bool))  # letter gap
        if cols:
            cols.pop()  # no trailing gap
        row = (np.concatenate(cols, axis=1) if cols
               else np.zeros((GLYPH_H, 1), dtype=bool))
        line_bitmaps.append(row)
    width = max(bm.shape[1] for bm in line_bitmaps)
    stacked: List[np.ndarray] = []
    for i, bm in enumerate(line_bitmaps):
        if i:
            stacked.append(np.zeros((3, width), dtype=bool))  # line gap
        pad = np.zeros((GLYPH_H, width), dtype=bool)
        pad[:, :bm.shape[1]] = bm
        stacked.append(pad)
    grid = np.concatenate(stacked, axis=0)
    img = np.kron(grid, np.ones((scale, scale), dtype=bool))
    img = np.pad(img, margin, mode="constant")
    return np.where(img, 0, 255).astype(np.uint8)


def render_text_png(text: str, scale: int = 2) -> bytes:
    from lexoid_spark.kernels.png_codec import png_encode

    return png_encode(render_text(text, scale=scale)[:, :, None])


def _to_ink(arr: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8 → boolean ink mask (dark = ink)."""
    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[:, :, :3].astype(np.uint16).mean(axis=2)
    return a < 128


def recognize_pixels(arr: np.ndarray) -> Tuple[str, List[WordBox]]:
    """Template-match a rendered image back to its text. Returns
    (words joined by spaces in reading order, normalized word boxes) —
    the parse_with_paddleocr output shape. Raises ValueError on ink
    that does not segment into known glyphs."""
    ink = _to_ink(arr)
    h, w = ink.shape
    if not ink.any():
        return "", []
    row_has = ink.any(axis=1)
    # line bands = maximal runs of non-blank rows
    bounds = np.flatnonzero(np.diff(np.r_[False, row_has, False]))
    words: List[str] = []
    boxes: List[WordBox] = []
    for top, bot in zip(bounds[::2], bounds[1::2]):
        band = ink[top:bot]
        if (bot - top) % GLYPH_H:
            raise ValueError("line band height is not a glyph multiple")
        scale = (bot - top) // GLYPH_H
        col_has = band.any(axis=0)
        cbounds = np.flatnonzero(np.diff(np.r_[False, col_has, False]))
        runs = list(zip(cbounds[::2], cbounds[1::2]))
        cur: List[str] = []
        cur_x0 = None
        prev_end = None
        for c0, c1 in runs:
            if (c1 - c0) != GLYPH_W * scale:
                raise ValueError("glyph run width mismatch (unknown "
                                 "font or non-text ink)")
            cell = band[:, c0:c1].reshape(GLYPH_H, scale, GLYPH_W, scale)
            bits = cell.mean(axis=(1, 3)) >= 0.5
            key = int("".join("1" if b else "0" for b in bits.ravel()), 2)
            ch = _PATTERNS.get(key)
            if ch is None:
                raise ValueError("unrecognized glyph bitmap")
            if prev_end is not None and (c0 - prev_end) > 3 * scale:
                words.append("".join(cur))
                boxes.append(("".join(cur), (
                    round(cur_x0 / w, 6), round(top / h, 6),
                    round(prev_end / w, 6), round(bot / h, 6))))
                cur, cur_x0 = [], None
            if cur_x0 is None:
                cur_x0 = c0
            cur.append(ch)
            prev_end = c1
        if cur:
            words.append("".join(cur))
            boxes.append(("".join(cur), (
                round(cur_x0 / w, 6), round(top / h, 6),
                round(prev_end / w, 6), round(bot / h, 6))))
    return " ".join(words), boxes
