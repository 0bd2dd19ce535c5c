"""Pure-Python scalar text operators (mirrors of the native column forms).

Each function here has a 1:1 native-Spark column expression in
``lexoid_spark.functions.columns`` (regexp_replace / regexp_extract_all —
JVM-side, codegen'd). These pure forms exist so kernels can reuse them
in-batch and so unit tests pin the exact semantics.

Reference parity:
- ``embed_email_links``  — ``static_parser.py:248-256``
- ``extract_urls_from_markdown`` — ``utils.py:386-407``
- ``strip_markdown``     — ``utils.py:632-642`` (HTML-tag step simplified:
  we strip inline tags directly rather than round-tripping through a
  markdown→HTML renderer, which the sandbox lacks)
- ``clean_text``         — ``tests/benchmark_utils.py:18-28``
"""

from __future__ import annotations

import codecs
import re
from typing import List

# UTF-32 BOMs first: BOM_UTF32_LE starts with the UTF-16 LE BOM bytes
_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def decode_payload(payload) -> str:
    """BOM-aware text decode: honor a UTF-8/16/32 byte-order mark
    (stripped from the result), else UTF-8 with ``errors="ignore"``
    (the reference's invalid-byte tolerance,
    ``static_parser.py:90-92``). Wild web pages are routinely UTF-16
    with BOM; decoding them as UTF-8-ignore would shred every other
    byte."""
    if payload is None:
        return ""
    b = bytes(payload)
    for bom, enc in _BOMS:
        if b.startswith(bom):
            return b[len(bom):].decode(enc, errors="ignore")
    return b.decode("utf-8", errors="ignore")

EMAIL_PATTERN = re.compile(
    r"(?<![<\[])(\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b)(?![>\]])"
)

MD_LINK_PATTERN = re.compile(r"\[([^\]]+)\]\((https?://[^\s\)]+)\)")
BARE_URL_PATTERN = re.compile(r"(?<!\()(https?://[^\s\)]+)")
HTML_TAG_PATTERN = re.compile(r"<.*?>|&([a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});")


def embed_email_links(text: str) -> str:
    """Wrap bare email addresses in angle brackets: a@b.com → <a@b.com>."""
    return EMAIL_PATTERN.sub(lambda m: f"<{m.group(1)}>", text)


def extract_urls_from_markdown(content: str) -> List[str]:
    """Unique URLs from [text](url) links and bare http(s) URLs."""
    urls = [m.group(2) for m in MD_LINK_PATTERN.finditer(content)]
    urls.extend(m.group(0) for m in BARE_URL_PATTERN.finditer(content))
    # preserve first-seen order (deterministic, unlike the reference's set())
    seen = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def strip_markdown(text: str) -> str:
    """Drop md formatting chars, unwrap links, strip inline HTML tags."""
    text = re.sub(r"[*_`~]", "", text)
    text = re.sub(r"\[([^\]]+)\]\([^)]+\)", r"\1", text)
    text = HTML_TAG_PATTERN.sub(" ", text)
    return text


def clean_text(txt: str) -> str:
    """Benchmark-metric normalizer: LaTeX cmds → ws → non-alnum → strip."""
    txt = re.sub(r"\\[a-zA-Z]+(\[[^\]]*\])?(\{[^}]*\})?", " ", txt)
    txt = re.sub(r"\s+", " ", txt)
    txt = re.sub(r"[^a-zA-Z0-9 ]", " ", txt)
    return txt.strip()


# cleanup chain applied to every PDF page's markdown
# (static_parser.py:662-668; ORDER-SENSITIVE)
def cleanup_redundant_formatting(content: str) -> str:
    return (
        content.replace("** **", " ")
        .replace("* *", " ")
        .replace("` `", " ")
        .replace("\n```\n\n```", "")
    )
