"""OCR arm (P5): the routing + kernel shape of the reference's
PaddleOCR path with a deterministic recognizer.

Reference semantics being shaped (``lexoid/core/utils.py:591-612``
bbox_router, ``parse_type/static_parser.py:751-818``
parse_with_paddleocr): image files and image-bearing PDFs route to
OCR; per page the recognized texts join with spaces, pages join with
``"\\n\\n"``, and each page segment carries normalized word bboxes.

Recognition is REAL-pixel end to end: PNG/GIF/JPEG payloads decode
through the repo's from-scratch codecs and go through
``kernels/ocr_glyph.py`` — binarization, line banding, glyph
segmentation, nearest-template classification with a confidence
margin, word-box emission. The glyph set is closed (mixed-case
A-Z/a-z, digits, common punctuation, variable widths — a
deterministic stand-in for a neural recognizer, honestly NOT a
model); ink whose best template is not confidently ahead of the
runner-up raises and the document quarantines, never a silent wrong
read. The legacy FAKE container (header-only, no pixels) keeps
its header-derived recognition so the pixel-less fixture class stays
supported. Swapping in a real OCR model later replaces only the
recognizer functions; the routing, schemas, and per-page segment
assembly stay.
"""

from __future__ import annotations

from typing import List, Tuple

from lexoid_spark.functions.multimodal import IMG_MAGIC, decode_image_header

WordBox = Tuple[str, Tuple[float, float, float, float]]

# real raster formats the pixel path decodes (routing twin of
# decode_image_pixels in functions/multimodal.py)
_REAL_MAGICS = (b"\x89PNG", b"GIF8", b"\xff\xd8\xff",
                b"\x00\x00\x00\x0cjP  ", b"\xff\x4f",
                b"II*\x00", b"MM\x00*", b"BM")


def _recognize_fake(payload: bytes) -> Tuple[str, List[WordBox]]:
    """Header-derived recognition for the pixel-less FAKE container:
    emits tokens derived from (w, h, channels) with synthetic
    left-to-right normalized boxes — the exact output shape
    PaddleOCR's rec_texts / dt_polys produce after the reference's
    normalization (static_parser.py:778-800)."""
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


def _recognize(payload: bytes) -> Tuple[str, List[WordBox]]:
    """Dispatch: FAKE container → header recognizer; real raster →
    pixel decode + glyph-template OCR. Anything else raises (→
    quarantine)."""
    if payload.startswith(IMG_MAGIC):
        return _recognize_fake(payload)
    if payload.startswith(_REAL_MAGICS):
        from lexoid_spark.functions.multimodal import decode_image_pixels
        from lexoid_spark.kernels.ocr_glyph import recognize_pixels

        return recognize_pixels(decode_image_pixels(payload))
    raise ValueError("unsupported image payload for OCR")


def ocr_image_to_page(payload) -> Tuple[str, List[WordBox]]:
    """One image → (page_text, word_bboxes). Raises (→ quarantine) on
    undecodable payloads, mirroring the reference's retry-then-error
    chain (static_parser.py:22-55)."""
    if payload is None:
        raise ValueError("empty image payload")
    return _recognize(bytes(payload))


def _raw_raster_array(header: bytes, payload: bytes):
    """Raw-sample image XObject (FlateDecode already inflated by the
    object scan) → (H, W[, C]) uint8 array, or None when the dict
    doesn't describe a supported raw raster.

    Scope: /DeviceGray at 1/2/4/8 bits, /DeviceRGB at 8 bits, and
    /Indexed palettes over either base (1/2/4/8-bit indices, hex
    palette string); unpredicted (/Predictor 1) or PNG-predicted
    (/Predictor >= 10 — per-row filter byte, unfiltered with the SAME
    routine as the PNG codec). This is the near-universal LOSSLESS
    scanner layout (Flate raster), the counterpart of the DCTDecode
    JPEG arm."""
    import re

    import numpy as np

    from lexoid_spark.kernels.pdf_md import _int_after
    from lexoid_spark.kernels.png_codec import PngError, _unfilter_rows

    w = _int_after(header, b"/Width")
    h = _int_after(header, b"/Height")
    bpc = _int_after(header, b"/BitsPerComponent")
    if not w or not h or bpc not in (1, 2, 4, 8):
        return None
    pal = None
    im = re.search(
        rb"/Indexed\s*/Device(RGB|Gray)\s+(\d+)\s*<([0-9A-Fa-f\s]*)>",
        header)
    if im is not None:
        pal_nch = 3 if im.group(1) == b"RGB" else 1
        hival = int(im.group(2))
        raw = bytes.fromhex(
            re.sub(rb"\s+", b"", im.group(3)).decode("ascii"))
        if len(raw) < (hival + 1) * pal_nch:
            return None
        pal = np.frombuffer(
            raw, dtype=np.uint8,
            count=(hival + 1) * pal_nch).reshape(hival + 1, pal_nch)
        nch = 1  # samples are palette indices
    else:
        nch = 3 if b"/DeviceRGB" in header else 1
        if bpc != 8 and nch != 1:
            return None
    pred = _int_after(header, b"/Predictor") or 1
    # rows are byte-padded at sub-byte depths (ISO 32000-1 §8.9.3);
    # 0 = black under the default /Decode [0 1]
    stride = w * nch if bpc == 8 else (w * bpc + 7) // 8
    if pred >= 10:
        if len(payload) < (stride + 1) * h:
            return None
        try:
            rows = _unfilter_rows(payload, 0, h, stride,
                                  nch if bpc == 8 else 1)
        except (PngError, IndexError):
            return None
    else:
        if len(payload) < stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h).reshape(h, stride)
    if bpc < 8:
        bits = np.unpackbits(rows, axis=1)
        groups = bits[:, :w * bpc].reshape(h, w, bpc)
        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint8)
        vals = (groups * weights).sum(axis=2).astype(np.uint8)
    else:
        vals = rows.reshape(h, w, nch)
        if nch == 1:
            vals = vals[:, :, 0]
    if pal is not None:
        idx = np.minimum(vals, np.uint8(len(pal) - 1))
        looked = pal[idx]  # (h, w, pal_nch)
        return looked[:, :, 0] if pal.shape[1] == 1 else looked
    if bpc < 8:
        # grayscale sub-byte: expand to full 0..255 (exact integers)
        return vals * np.uint8(255 // ((1 << bpc) - 1))
    return vals


def _g4_raster_array(header: bytes, payload: bytes):
    """B/W fax image XObject (/Filter /CCITTFaxDecode) → (H, W) uint8
    ink array, or None when the dict isn't a CCITT raster. All three
    /K regimes decode: /K < 0 pure Group 4 (T.6 MMR), /K == 0 pure
    1-D Group 3 (T.4 MH, the PDF default when /K is absent), /K > 0
    mixed 2-D Group 3 (T.4 MR, EOL+tag framed). Undecodable fax data
    raises (→ quarantine) — a declared fax scan that doesn't decode
    must not silently skip."""
    if b"/CCITTFaxDecode" not in header:
        return None
    import re

    import numpy as np

    from lexoid_spark.kernels.ccitt_g4 import (
        CcittError,
        g3_decode,
        g4_decode,
    )
    from lexoid_spark.kernels.pdf_md import _int_after

    # /K needs its own signed parse (_int_after is unsigned, and bare
    # find(b"/K") would also hit /Kids-style keys); absent /K means 0
    km = re.search(rb"/K\s+(-?\d+)", header)
    k = int(km.group(1)) if km is not None else 0
    w = _int_after(header, b"/Columns") or _int_after(header, b"/Width")
    h = _int_after(header, b"/Rows") or _int_after(header, b"/Height")
    if not w or not h:
        return None
    try:
        arr = (g4_decode(payload, w, h) if k < 0
               else g3_decode(payload, w, h, k))
    except CcittError as e:
        raise ValueError(f"undecodable CCITT fax scan: {e}") from e
    if b"/BlackIs1 true" in header:
        arr = np.uint8(255) - arr
    return arr


def _jbig2_raster_array(header: bytes, payload: bytes):
    """JBIG2 image XObject (/Filter /JBIG2Decode) → (H, W) uint8 ink
    array, or None when the dict isn't a JBIG2 raster. The kernel
    consumes the embedded segment stream directly (page bitmap, ink
    = 0) rather than the packed 1-bit filter output, so no /Decode
    inversion applies. Symbol-dictionary streams and a /JBIG2Globals
    reference (an indirect stream this object scan does not chase)
    raise (→ quarantine) — a declared JBIG2 scan that doesn't decode
    must not silently skip."""
    if b"/JBIG2Decode" not in header:
        return None
    from lexoid_spark.kernels.jbig2 import Jbig2Error, jbig2_decode
    from lexoid_spark.kernels.pdf_md import _int_after

    if b"/JBIG2Globals" in header:
        raise ValueError(
            "JBIG2 scan with external /JBIG2Globals is unsupported")
    w = _int_after(header, b"/Width")
    h = _int_after(header, b"/Height")
    try:
        arr = jbig2_decode(payload)
    except Jbig2Error as e:
        raise ValueError(f"undecodable JBIG2 scan: {e}") from e
    if w and h and arr.shape != (h, w):
        raise ValueError(
            f"JBIG2 page bitmap {arr.shape} contradicts the XObject "
            f"dict ({h}, {w})")
    return arr


def _jpx_raster_array(header: bytes, payload: bytes):
    """JPEG 2000 image XObject (/Filter /JPXDecode) → (H, W[, C])
    uint8 pixel array, or None when the dict isn't a JPX raster. Both
    payload shapes decode: a raw codestream (SOC..EOC) and a JP2
    container (the jp2c box). Undecodable or out-of-scope streams
    raise (→ quarantine) — a declared JPX scan that doesn't decode
    must not silently skip. Per ISO 32000-1 §7.4.9 the JPX data is
    self-describing, so /Width //Height are cross-checked only."""
    if b"/JPXDecode" not in header:
        return None
    from lexoid_spark.kernels.jpx import JpxError, jpx_decode
    from lexoid_spark.kernels.pdf_md import _int_after

    w = _int_after(header, b"/Width")
    h = _int_after(header, b"/Height")
    try:
        arr = jpx_decode(payload)
    except JpxError as e:
        raise ValueError(f"undecodable JPX scan: {e}") from e
    if w and h and arr.shape[:2] != (h, w):
        raise ValueError(
            f"JPX image {arr.shape[:2]} contradicts the XObject "
            f"dict ({h}, {w})")
    return arr


def ocr_pdf_to_pages(payload, start: int = 0) -> List[Tuple[int, str, List[WordBox]]]:
    """Image-bearing PDF → [(page, text, bboxes)]: OCR every embedded
    /Subtype /Image XObject, one logical page per image (the
    reference renders PDF pages to images first; the embedded raster
    stands in for the render). Two payload shapes decode: file-format
    rasters (FAKE container / PNG / GIF / DCTDecode JPEG bytes) and
    raw Flate samples (optionally PNG-predicted) described by the
    XObject dict. BI/ID/EI inline images (canonicalized by
    pdf_inline_images) go through the SAME decode arms, after the
    XObjects."""
    from lexoid_spark.kernels.pdf_md import (
        pdf_image_xobjects,
        pdf_inline_images,
    )

    pages = []
    for header, img in pdf_image_xobjects(payload) + pdf_inline_images(payload):
        if img.startswith(IMG_MAGIC) or img.startswith(_REAL_MAGICS):
            pages.append(_recognize(img))
            continue
        arr = _g4_raster_array(header, img)
        if arr is None:
            arr = _jbig2_raster_array(header, img)
        if arr is None:
            arr = _jpx_raster_array(header, img)
        if arr is None:
            arr = _raw_raster_array(header, img)
        if arr is not None:
            from lexoid_spark.kernels.ocr_glyph import recognize_pixels

            pages.append(recognize_pixels(arr))
    if not pages:
        raise ValueError(
            "image-bearing PDF carries no OCR-decodable raster payloads")
    return [(start + idx + 1, text, boxes)
            for idx, (text, boxes) in enumerate(pages)]
