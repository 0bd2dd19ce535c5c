"""Tabular → pipe-markdown kernel.

Reproduces the shape of the reference's table rendering
(``df.to_markdown(index=False, tablefmt="pipe")`` at
``static_parser.py:105-118`` for CSV and ``:319-320`` for PDF tables):
pipe table, header row, alignment separator, every cell padded to the
column width. Width/alignment policy (pinned by our goldens; tabulate
itself is not in the sandbox):

- column width ``w = max(len(header), max(len(cell)), 3)``
- text columns left-aligned: cell ``ljust(w)``, separator ``:`` + ``-``*(w+1)
- numeric columns right-aligned: cell ``rjust(w)``, separator ``-``*(w+1) + ``:``
- a column is numeric iff every non-empty cell parses as int/float

Cleanup semantics from the reference's ``process_table``
(``static_parser.py:308-320``): empty→NA, drop all-NA rows/cols, fill
remaining NA with "", first row promoted to header, newlines → ``<br>``.
"""

from __future__ import annotations

import csv
import io
from typing import List, Optional, Sequence


def _is_number(s: str) -> bool:
    if not s:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def rows_to_pipe_table(header: Sequence[str], rows: List[Sequence[str]]) -> str:
    """Render header + rows as a pipe-markdown table."""
    header = [str(h) if h is not None else "" for h in header]
    rows = [[("" if c is None else str(c)) for c in r] for r in rows]
    ncol = len(header)
    rows = [list(r) + [""] * (ncol - len(r)) if len(r) < ncol else list(r)[:ncol]
            for r in rows]
    # newline → <br> (static_parser.py:317)
    rows = [[c.replace("\n", "<br>") for c in r] for r in rows]
    header = [h.replace("\n", "<br>") for h in header]

    widths = []
    numeric = []
    for j in range(ncol):
        col = [r[j] for r in rows]
        w = max([len(header[j])] + [len(c) for c in col] + [3])
        widths.append(w)
        non_empty = [c for c in col if c != ""]
        numeric.append(bool(non_empty) and all(_is_number(c) for c in non_empty))

    def fmt_row(cells):
        parts = []
        for j, c in enumerate(cells):
            body = c.rjust(widths[j]) if numeric[j] else c.ljust(widths[j])
            parts.append(" " + body + " ")
        return "|" + "|".join(parts) + "|"

    sep_parts = []
    for j in range(ncol):
        if numeric[j]:
            sep_parts.append("-" * (widths[j] + 1) + ":")
        else:
            sep_parts.append(":" + "-" * (widths[j] + 1))
    lines = [fmt_row(header), "|" + "|".join(sep_parts) + "|"]
    lines.extend(fmt_row(r) for r in rows)
    return "\n".join(lines)


def clean_table_grid(grid: List[List[Optional[str]]]) -> Optional[str]:
    """Reference process_table cleanup → pipe markdown (or None if empty).

    Mirrors ``static_parser.py:302-320``: ""→NA, drop all-NA rows/cols,
    fillna(""), promote first row to header.
    """
    if not grid or not grid[0]:
        return None
    norm = [[(None if (c is None or c == "") else str(c)) for c in row]
            for row in grid]
    norm = [row for row in norm if any(c is not None for c in row)]
    if not norm:
        return None
    ncol = max(len(r) for r in norm)
    norm = [r + [None] * (ncol - len(r)) for r in norm]
    keep_cols = [j for j in range(ncol) if any(r[j] is not None for r in norm)]
    norm = [[r[j] for j in keep_cols] for r in norm]
    norm = [[("" if c is None else c) for c in r] for r in norm]
    if len(norm) == 0:
        return None
    header, data = norm[0], norm[1:]
    return rows_to_pipe_table(header, data)


def csv_to_md(payload) -> str:
    """CSV bytes/str → pipe markdown (static_parser.py:105-118 analogue)."""
    if payload is None:
        return ""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        from lexoid_spark.kernels.text_ops import decode_payload

        payload = decode_payload(payload)
    # bare \r inside an unquoted field raises _csv.Error (found by
    # hypothesis); web CSVs are dirty — normalize line endings first
    payload = payload.replace("\r\n", "\n").replace("\r", "\n")
    reader = csv.reader(io.StringIO(payload))
    rows = [row for row in reader if row]
    if not rows:
        return ""
    return rows_to_pipe_table(rows[0], rows[1:])
