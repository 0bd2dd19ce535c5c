"""RTF → plain text on the stdlib — the legacy word-processor format
that still shows up in web document corpora. Best-effort text
extraction (the txt-arm contract: total function, never a task
failure): control words drive a small state machine —

- ``\\par``/``\\line`` → newline, ``\\tab`` → tab, ``\\~`` → space,
  ``\\{ \\} \\\\`` → literals;
- ``\\'xx`` → the windows-1252 codepoint (RTF's ``\\ansicpg1252``
  default; the WHATWG table from ``text_ops`` decodes the 0x80-0x9F
  range exactly);
- ``\\uN`` → the Unicode codepoint, skipping the ``\\ucN`` fallback
  characters that follow (each ``\\'xx`` counts as ONE fallback);
- ``\\bin N`` skips N raw bytes;
- destination groups (``\\fonttbl``, ``\\colortbl``,
  ``\\stylesheet``, ``\\info``, ``\\pict``, ``{\\*\\...}`` etc.) are
  skipped wholesale with brace matching.

Malformed input degrades to whatever text was recovered (never an
exception) — the same tolerance class as the reference's txt arm
(``static_parser.py:90-92``). Output size is capped so a hostile
blob cannot amplify.

Reference parity: none — Lexoid has no RTF path; web corpora do.
"""

from __future__ import annotations

import re

# destinations whose whole group is non-content
_SKIP_DESTS = frozenset((
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "ftnsep", "ftnsepc", "themedata",
    "colorschememapping", "datastore", "latentstyles", "listtable",
    "listoverridetable", "rsidtbl", "generator", "xmlnstbl",
))

_CW_RE = re.compile(rb"[a-z]{1,32}")
_MAX_OUT = 1 << 24  # hostile-amplification cap on recovered text


def _cp1252_char(byte: int) -> str:
    from lexoid_spark.kernels.text_ops import _decode_windows_1252

    return _decode_windows_1252(bytes([byte]))


def rtf_to_text(payload) -> str:
    """RTF bytes (or str) → plain text. Total function."""
    if payload is None:
        return ""
    b = bytes(payload) if not isinstance(payload, str) \
        else payload.encode("utf-8", errors="ignore")
    if not b.startswith(b"{\\rtf"):
        return b.decode("utf-8", errors="ignore")
    out: list[str] = []
    uc_stack = [1]          # \ucN fallback-char count, per group
    pos, n = 0, len(b)
    pending_skip = 0        # \uN fallback characters still to drop

    def skip_group(start: int) -> int:
        """``start`` points just past the '{' — return index past the
        matching '}' (honoring escapes and \\bin runs)."""
        depth = 1
        i = start
        while i < n and depth:
            c = b[i]
            if c == 0x5C:               # backslash
                m = _CW_RE.match(b, i + 1)
                if m and m.group() == b"bin":
                    j = m.end()
                    neg = j < n and b[j] == 0x2D
                    j += neg
                    k = j
                    while k < n and 0x30 <= b[k] <= 0x39:
                        k += 1
                    count = int(b[j:k] or b"0") if not neg else 0
                    if k < n and b[k] == 0x20:
                        k += 1
                    i = min(n, k + max(0, count))
                    continue
                i += 2 if i + 1 < n else 1
                if m:
                    i = m.end()
                    while i < n and (0x30 <= b[i] <= 0x39 or b[i] == 0x2D):
                        i += 1
                    if i < n and b[i] == 0x20:
                        i += 1
                continue
            if c == 0x7B:
                depth += 1
            elif c == 0x7D:
                depth -= 1
            i += 1
        return i

    while pos < n and len(out) < _MAX_OUT:
        c = b[pos]
        if c == 0x7B:                    # {
            uc_stack.append(uc_stack[-1])
            pos += 1
            # {\*\unknown ...} — optional-destination group: skip
            if b[pos:pos + 2] == b"\\*":
                pos = skip_group(pos)
                uc_stack.pop()
        elif c == 0x7D:                  # }
            if len(uc_stack) > 1:
                uc_stack.pop()
            pos += 1
        elif c == 0x5C:                  # backslash
            nxt = b[pos + 1:pos + 2]
            if nxt == b"'":
                try:
                    byte = int(b[pos + 2:pos + 4], 16)
                except ValueError:
                    pos += 2
                    continue
                if pending_skip:
                    pending_skip -= 1   # a \'xx is ONE fallback char
                else:
                    out.append(_cp1252_char(byte))
                pos += 4
            elif nxt in (b"\\", b"{", b"}"):
                if pending_skip:
                    pending_skip -= 1
                else:
                    out.append(nxt.decode("latin-1"))
                pos += 2
            elif nxt == b"~":
                out.append(" ")
                pos += 2
            elif nxt == b"_":
                out.append("-")
                pos += 2
            elif nxt == b"-":
                pos += 2                # optional hyphen: drop
            elif nxt == b"\r" or nxt == b"\n":
                out.append("\n")        # escaped newline = \par
                pos += 2
            else:
                m = _CW_RE.match(b, pos + 1)
                if not m:
                    pos += 2            # unknown symbol: drop
                    continue
                word = m.group().decode("ascii")
                i = m.end()
                neg = i < n and b[i] == 0x2D
                i += neg
                j = i
                while j < n and 0x30 <= b[j] <= 0x39:
                    j += 1
                param = int(b[i:j]) * (-1 if neg else 1) if j > i else None
                if j < n and b[j] == 0x20:
                    j += 1              # the delimiting space
                pos = j
                if word in ("par", "line", "sect", "page"):
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word == "emdash":
                    out.append("—")
                elif word == "endash":
                    out.append("–")
                elif word == "lquote":
                    out.append("‘")
                elif word == "rquote":
                    out.append("’")
                elif word == "ldblquote":
                    out.append("“")
                elif word == "rdblquote":
                    out.append("”")
                elif word == "uc":
                    uc_stack[-1] = max(0, param or 0)
                elif word == "u":
                    cp = param if param is not None else 0
                    if cp < 0:
                        cp += 65536     # RTF signed-16 convention
                    if 0xDC00 <= cp <= 0xDFFF and out \
                            and len(out[-1]) == 1 \
                            and 0xD800 <= ord(out[-1]) <= 0xDBFF:
                        # Word emits supplementary chars as a \u
                        # surrogate pair — combine into one codepoint
                        hi = ord(out.pop())
                        cp = 0x10000 + ((hi - 0xD800) << 10) \
                            + (cp - 0xDC00)
                        out.append(chr(cp))
                    elif 0xD800 <= cp <= 0xDBFF:
                        out.append(chr(cp))   # half a pair: hold it
                    elif 0 <= cp <= 0x10FFFF:
                        out.append(chr(cp))
                    pending_skip = uc_stack[-1]
                elif word == "bin":
                    pos = min(n, pos + max(0, param or 0))
                elif word in _SKIP_DESTS:
                    # rewind to the owning '{' and skip the group:
                    # the group opened just before this control word
                    pos = skip_group(pos)
                    if len(uc_stack) > 1:
                        uc_stack.pop()
        elif c in (0x0D, 0x0A, 0x00):
            pos += 1                    # raw CR/LF/NUL: not content
        else:
            if pending_skip:
                pending_skip -= 1
            else:
                out.append(chr(c) if c < 0x80 else _cp1252_char(c))
            pos += 1
    text = "".join(out).strip()
    # a lone surrogate half (malformed \u pair) is unencodable —
    # scrub to U+FFFD so downstream Arrow/UTF-8 encoding never fails
    if any("\ud800" <= ch <= "\udfff" for ch in text):
        text = "".join("�" if "\ud800" <= ch <= "\udfff" else ch
                       for ch in text)
    return text
