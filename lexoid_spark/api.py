"""Single-document convenience API mirroring the reference's
``lexoid.api.parse`` surface (``/root/reference/lexoid/api.py:235-441``,
docstring :137-145) for the STATIC_PARSE path — so a reference user can
call the same shape locally, while the Spark pipeline covers the
corpus-scale path.

Returned dict (reference parsed-document shape, SURVEY.md §1.1):
  raw            full markdown (pages joined "\\n\\n")
  segments       [{"metadata": {"page": int|str}, "content": str}]
  title          basename of the input path (api.py:262)
  url            "" for local files (api.py:294)
  parent_title   "" (no recursive crawl on the single-doc path)
  recursive_docs []
  token_usage    zeros — static path consumes no LLM tokens
  parser_used    "STATIC_PARSE"
  parsers_used   ["STATIC_PARSE"]

Divergence from the reference, by design: no LLM/OCR arm — inputs the
reference would route to LLM_PARSE raise ``ValueError`` here.
"""

from __future__ import annotations

import os
from typing import Union

from lexoid_spark.functions.udfs import _extract_one
from lexoid_spark.kernels.pdf_md import sniff_doctype

_ZERO_USAGE = {"input": 0, "output": 0, "llm_page_count": 0, "total": 0}


def parse(source: Union[str, bytes], parser_type: str = "STATIC_PARSE",
          title: str | None = None, pdf_framework: str = "pdfplumber",
          html_main_content: bool = False) -> dict:
    """Parse one document (path or raw bytes) → parsed-document dict.

    ``pdf_framework``/``html_main_content`` mirror the corpus
    pipeline's knobs (``extract()``): the text-only fast PDF arm and
    the boilerplate-stripping HTML mode."""
    if parser_type not in ("STATIC_PARSE", "AUTO"):
        raise ValueError(
            f"parser_type={parser_type!r}: only STATIC_PARSE/AUTO are "
            "supported (no LLM arm in the static rebuild)"
        )
    if isinstance(source, (bytes, bytearray, memoryview)):
        payload = bytes(source)
        name = title or "bytes"
    else:
        with open(source, "rb") as f:
            payload = f.read()
        name = title or os.path.basename(source)

    doctype = sniff_doctype(payload)
    raw, segs, parser_used = _extract_one(
        doctype, payload, pdf_framework=pdf_framework,
        html_main_content=html_main_content,
    )
    segments = [
        {
            "metadata": {
                "page": s["page"] if s["page"] is not None else s["section"]
            },
            "content": s["content"],
        }
        for s in segs
    ]
    return {
        "raw": raw,
        "segments": segments,
        "title": name,
        "url": "",
        "parent_title": "",
        "recursive_docs": [],
        "token_usage": dict(_ZERO_USAGE),
        "parser_used": parser_used,
        "parsers_used": [parser_used],
    }
