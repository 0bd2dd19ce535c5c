"""Bounding-box utilities (reference F17-F20, ``lexoid/core/utils.py``):

- ``merge_bboxes``      — merge horizontally-adjacent overlapping boxes
                          (utils.py:739-776, threshold 0.02)
- ``split_bbox_by_word_length`` — split one box across words
                          proportionally to character counts
                          (utils.py:831-862)
- ``find_bboxes_for_substring`` — locate a substring's word boxes with
                          a Levenshtein fuzzy window fallback
                          (utils.py:645-736)

All pure-Python (in-kernel: these run per page over tens of boxes —
SURVEY.md §2.8 keeps them inside the Arrow batch, not as column ops).
Boxes are (x0, top, x1, bottom) in normalized [0,1] page coordinates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

Box = Tuple[float, float, float, float]


def merge_bboxes(boxes: Sequence[Box], y_overlap_min: float = 0.5,
                 x_gap_max: float = 0.02) -> List[Box]:
    """Merge same-line, horizontally-adjacent boxes into spans.

    Two boxes merge when their vertical overlap is at least
    ``y_overlap_min`` of the shorter box's height and the horizontal
    gap is below ``x_gap_max`` (reference threshold 0.02). Sequential
    sweep in (top, x0) order — the reference's pairwise merge loop.
    """
    if not boxes:
        return []
    order = sorted(boxes, key=lambda b: (b[1], b[0]))
    merged: List[Box] = [order[0]]
    for b in order[1:]:
        m = merged[-1]
        ov = min(m[3], b[3]) - max(m[1], b[1])
        h = min(m[3] - m[1], b[3] - b[1])
        same_line = h > 0 and ov / h >= y_overlap_min
        gap = b[0] - m[2]
        if same_line and gap <= x_gap_max:
            merged[-1] = (min(m[0], b[0]), min(m[1], b[1]),
                          max(m[2], b[2]), max(m[3], b[3]))
        else:
            merged.append(b)
    return merged


def split_bbox_by_word_length(box: Box, words: Sequence[str]) -> List[Box]:
    """Split one box horizontally, proportional to word char counts
    (separators weighted as one char each), utils.py:831-862."""
    if not words:
        return []
    x0, top, x1, bottom = box
    total = sum(len(w) for w in words) + (len(words) - 1)
    if total <= 0:
        return [box]
    width = x1 - x0
    out: List[Box] = []
    cur = x0
    for i, w in enumerate(words):
        frac = (len(w) + (1 if i < len(words) - 1 else 0)) / total
        nxt = cur + frac * width
        word_end = cur + (len(w) / total) * width
        out.append((cur, top, word_end, bottom))
        cur = nxt
    return out


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def find_bboxes_for_substring(
    word_boxes: Sequence[Tuple[str, Box]], needle: str,
    max_distance_ratio: float = 0.3,
) -> List[Box]:
    """Boxes of the word window matching ``needle``.

    Exact word-window match first; else the sliding window with the
    smallest Levenshtein distance to the needle wins if it is within
    ``max_distance_ratio`` × len(needle) (the reference's fuzzy
    fallback, utils.py:645-736). Empty list when nothing is close.
    """
    tokens = needle.split()
    if not tokens or not word_boxes:
        return []
    words = [w for w, _ in word_boxes]
    n = len(tokens)

    for i in range(len(words) - n + 1):
        if words[i:i + n] == tokens:
            return [b for _, b in word_boxes[i:i + n]]

    best: Optional[int] = None
    best_d = None
    target = " ".join(tokens)
    for i in range(len(words) - n + 1):
        cand = " ".join(words[i:i + n])
        d = _levenshtein(cand, target)
        if best_d is None or d < best_d:
            best, best_d = i, d
    if best is not None and best_d <= max_distance_ratio * len(target):
        return [b for _, b in word_boxes[best:best + n]]
    return []
