"""OCR arm (P5): the routing + kernel *shape* of the reference's
PaddleOCR path with a deterministic stand-in recognizer.

Reference semantics being shaped (``lexoid/core/utils.py:591-612``
bbox_router, ``parse_type/static_parser.py:751-818``
parse_with_paddleocr): image files and image-bearing PDFs route to
OCR; per page the recognized texts join with spaces, pages join with
``"\\n\\n"``, and each page segment carries normalized word bboxes.

The sandbox ships no OCR library, so recognition over the FAKE image
container (``functions/multimodal.py``) is a deterministic function of
the image header — clearly a stand-in, NOT a model. Real image bytes
(PNG/JPEG/GIF) raise ``NotImplementedError`` at the documented seam
and quarantine with an explicit error instead of failing the task.
Swapping in PaddleOCR later replaces only ``_recognize_fake``; the
routing, schemas, and per-page segment assembly stay.
"""

from __future__ import annotations

from typing import List, Tuple

from lexoid_spark.functions.multimodal import IMG_MAGIC, decode_image_header

WordBox = Tuple[str, Tuple[float, float, float, float]]


def _recognize_fake(payload: bytes) -> Tuple[str, List[WordBox]]:
    """Deterministic stand-in recognition: emits tokens derived from
    the FAKE header (w, h, channels) with synthetic left-to-right
    normalized boxes — the exact output shape PaddleOCR's rec_texts /
    dt_polys produce after the reference's normalization
    (static_parser.py:778-800)."""
    if not payload.startswith(IMG_MAGIC):
        # real formats (PNG/GIF/JPEG) now DECODE here (png_codec /
        # gif_codec / jpeg_meta), but text RECOGNITION still needs an
        # OCR model — keep the seam honest for anything but the FAKE
        # container the stand-in recognizer is defined over
        raise NotImplementedError(
            "real OCR requires an OCR library not present in this "
            "environment; the FAKE image container is fully supported"
        )
    hdr = decode_image_header(payload)
    if hdr is None:
        raise ValueError("undecodable FAKE image payload")
    w, h, c = hdr
    words = [f"scan{w}x{h}", f"ch{c}", "ocr"]
    boxes: List[WordBox] = []
    x = 0.05
    for t in words:
        wd = 0.02 * len(t)
        boxes.append((t, (round(x, 6), 0.1, round(x + wd, 6), 0.15)))
        x += wd + 0.03
    return " ".join(words), boxes


def ocr_image_to_page(payload) -> Tuple[str, List[WordBox]]:
    """One image → (page_text, word_bboxes). Raises (→ quarantine) on
    undecodable payloads, mirroring the reference's retry-then-error
    chain (static_parser.py:22-55)."""
    if payload is None:
        raise ValueError("empty image payload")
    return _recognize_fake(bytes(payload))


def ocr_pdf_to_pages(payload, start: int = 0) -> List[Tuple[int, str, List[WordBox]]]:
    """Image-bearing PDF → [(page, text, bboxes)]: OCR every embedded
    /Subtype /Image XObject, one logical page per image (the
    reference renders PDF pages to images first; the FAKE container
    stands in for the render)."""
    from lexoid_spark.kernels.pdf_md import pdf_image_payloads

    images = [
        p for p in pdf_image_payloads(payload) if p.startswith(IMG_MAGIC)
    ]
    if not images:
        raise NotImplementedError(
            "image-bearing PDF without FAKE-container images: real "
            "render+OCR requires libraries not present in this environment"
        )
    out = []
    for idx, img in enumerate(images):
        text, boxes = _recognize_fake(img)
        out.append((start + idx + 1, text, boxes))
    return out
