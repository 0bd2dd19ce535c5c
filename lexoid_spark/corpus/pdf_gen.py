"""Deterministic minimal-PDF builder for the synthetic corpus.

Generates classic (non-compressed-xref) PDFs with uncompressed content
streams so the from-scratch tokenizer in ``kernels/pdf_md.py`` can parse
them completely. This bounds the "from-scratch PDF reading" problem
exactly as planned in SURVEY.md §7.1: arbitrary wild PDFs are out of
scope; the corpus generator and the parser agree on a documented subset:

- one ``BT /Fn size Tf x y Td (word) Tj ET`` text object per word
  (a word box is the parser's atomic unit, mirroring pdfplumber's
  ``extract_words`` output shape, ``static_parser.py:374-378``);
- horizontal rules drawn as ``x y m x y l S`` line paths
  (pdfplumber ``page.lines`` analogue);
- table ruling drawn as ``x y w h re S`` rectangles (pdfplumber
  rect-edge analogue → "lines" table strategy);
- link annotations: ``/Annots`` with ``/Rect`` + ``/A<</S/URI/URI(...)>>``.

Fonts: F1 Helvetica, F2 Helvetica-Bold, F3 Helvetica-Oblique,
F4 Courier, F5 Helvetica-BoldOblique (names drive the reference's
bold/italic/mono detection, ``static_parser.py:418-436``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

PAGE_W = 612.0
PAGE_H = 792.0

FONTS = {
    "F1": "Helvetica",
    "F2": "Helvetica-Bold",
    "F3": "Helvetica-Oblique",
    "F4": "Courier",
    "F5": "Helvetica-BoldOblique",
}

# deterministic width-per-char factor, shared with the parser
CHAR_W = {"Courier": 0.6}
DEFAULT_CHAR_W = 0.5


def char_width_factor(fontname: str) -> float:
    return CHAR_W.get(fontname, DEFAULT_CHAR_W)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _fmt(x: float) -> str:
    # stable numeric formatting: integer-valued floats print bare
    if float(x) == int(x):
        return str(int(x))
    return ("%.2f" % x).rstrip("0").rstrip(".")


def page_content_stream(page: Dict) -> bytes:
    """Render one page spec to a content stream.

    page = {
      "words": [{"text", "x", "y", "size", "font"}],   # y = baseline (from bottom)
      "lines": [(x0, y0, x1, y1)],                      # stroked line paths
      "rects": [(x, y, w, h)],                          # stroked rectangles
      "style": "classic" (default) | "compact",
    }

    classic: one ``BT /Fn size Tf x y Td (word) Tj ET`` object per word
    (the round-1 fixture dialect). compact: the wild-PDF dialect — ONE
    multi-op ``BT..ET`` block, ``Tm`` line positioning, array-form
    ``TJ`` with kerning numbers between word runs.
    """
    if page.get("style") == "compact":
        return _compact_text_stream(page)
    parts: List[str] = []
    for w in page.get("words", []):
        parts.append(
            "BT /%s %s Tf %s %s Td (%s) Tj ET"
            % (w.get("font", "F1"), _fmt(w.get("size", 12)),
               _fmt(w["x"]), _fmt(w["y"]), _esc(w["text"]))
        )
    return _graphics_parts(page, parts)


def _graphics_parts(page: Dict, parts: List[str]) -> bytes:
    for (x0, y0, x1, y1) in page.get("lines", []):
        parts.append("%s %s m %s %s l S" % (_fmt(x0), _fmt(y0), _fmt(x1), _fmt(y1)))
    for (x, y, w, h) in page.get("rects", []):
        parts.append("%s %s %s %s re S" % (_fmt(x), _fmt(y), _fmt(w), _fmt(h)))
    return "\n".join(parts).encode("latin-1")


def _compact_text_stream(page: Dict) -> bytes:
    """Same word layout, emitted as one BT block with Tm + TJ arrays.

    Consecutive words sharing (y, font, size) form a run shown by one
    ``TJ`` with kerning numbers ``-(gap·1000/size)`` between strings —
    the standard justified-text encoding. Kern values are rounded to
    2 decimals (the generator's numeric format), so callers that need
    bit-exact x positions should pick gaps where gap·1000/size is
    exactly representable (e.g. size 12, gaps in multiples of 0.012).
    """
    words = page.get("words", [])
    parts: List[str] = ["BT"]
    cur_font, cur_size = None, None
    i = 0
    while i < len(words):
        w = words[i]
        font, size = w.get("font", "F1"), float(w.get("size", 12))
        run = [w]
        j = i + 1
        while j < len(words):
            nxt = words[j]
            if (nxt.get("font", "F1"), float(nxt.get("size", 12)),
                    float(nxt["y"])) != (font, size, float(w["y"])):
                break
            run.append(nxt)
            j += 1
        if (font, size) != (cur_font, cur_size):
            parts.append("/%s %s Tf" % (font, _fmt(size)))
            cur_font, cur_size = font, size
        parts.append("1 0 0 1 %s %s Tm" % (_fmt(run[0]["x"]), _fmt(run[0]["y"])))
        fname = FONTS[font]
        tj: List[str] = []
        for k, rw in enumerate(run):
            tj.append("(%s)" % _esc(rw["text"]))
            if k + 1 < len(run):
                end_x = rw["x"] + char_width_factor(fname) * size * len(rw["text"])
                gap = run[k + 1]["x"] - end_x
                tj.append(_fmt(round(-gap * 1000.0 / size, 2)))
        parts.append("[%s] TJ" % " ".join(tj))
        i = j
    parts.append("ET")
    return _graphics_parts(page, parts)


def build_pdf(pages: Sequence[Dict], compress: bool = False,
              objstm: bool = False) -> bytes:
    """Assemble a full PDF from page specs. Deterministic bytes.

    ``compress=True`` FlateDecode-compresses every content stream
    (zlib level 9 for deterministic output) — the near-universal
    wild-PDF encoding the kernel must decode.

    ``objstm=True`` additionally packs every dict-only object (fonts,
    page dicts, /Pages, /Catalog) into ONE Flate-compressed PDF 1.5
    object stream (``/Type /ObjStm``) — the modern-writer layout where
    a classic object scan sees only the container. Content streams and
    image XObjects stay direct objects (streams are not allowed inside
    an ObjStm per ISO 32000 §7.5.7).
    """
    objs: List[bytes] = []  # 1-indexed body objects, object i = objs[i-1]

    def add(obj: bytes) -> int:
        objs.append(obj)
        return len(objs)

    font_objs = {}
    for fkey, fname in FONTS.items():
        num = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /%s >>" % fname.encode()
        )
        font_objs[fkey] = num
    font_dict = " ".join("/%s %d 0 R" % (k, n) for k, n in font_objs.items())

    page_obj_nums: List[int] = []
    pages_obj_num_placeholder = None

    content_nums = []
    annot_nums: List[List[int]] = []
    image_nums: List[List[int]] = []
    for page in pages:
        # embedded image XObjects: page["images"] = [(w, h, c), ...] —
        # the payload is the FAKE container (functions/multimodal.py);
        # "/Subtype /Image" makes the has_image byte-scan fire exactly
        # as the reference's has_image_in_pdf (utils.py:467-472)
        img_nums_page = []
        for (iw, ih, ic) in page.get("images", []):
            from lexoid_spark.functions.multimodal import encode_fake_image

            px = encode_fake_image(iw, ih, ic)
            img_nums_page.append(add(
                (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                 b"/Length %d >>\nstream\n%s\nendstream"
                 % (iw, ih, len(px), px))
            ))
        image_nums.append(img_nums_page)
        stream = page_content_stream(page)
        if compress:
            import zlib

            stream = zlib.compress(stream, 9)
            cnum = add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
        else:
            cnum = add(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
            )
        content_nums.append(cnum)
        a_nums = []
        for link in page.get("links", []):
            x0, y0, x1, y1 = link["rect"]
            a_nums.append(add(
                (
                    "<< /Type /Annot /Subtype /Link /Rect [%s %s %s %s] "
                    "/Border [0 0 0] /A << /S /URI /URI (%s) >> >>"
                    % (_fmt(x0), _fmt(y0), _fmt(x1), _fmt(y1), _esc(link["uri"]))
                ).encode("latin-1")
            ))
        annot_nums.append(a_nums)

    # reserve /Pages object number after all content/annots
    n_fixed = len(objs)
    pages_obj_num_placeholder = n_fixed + len(pages) + 1

    for i, page in enumerate(pages):
        annots = ""
        if annot_nums[i]:
            annots = " /Annots [%s]" % " ".join(
                "%d 0 R" % n for n in annot_nums[i]
            )
        xobjects = ""
        if image_nums[i]:
            xobjects = " /XObject << %s >>" % " ".join(
                "/Im%d %d 0 R" % (j, n) for j, n in enumerate(image_nums[i])
            )
        page_obj_nums.append(add(
            (
                "<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %s %s] "
                "/Resources << /Font << %s >>%s >> /Contents %d 0 R%s >>"
                % (pages_obj_num_placeholder, _fmt(PAGE_W), _fmt(PAGE_H),
                   font_dict, xobjects, content_nums[i], annots)
            ).encode("latin-1")
        ))

    kids = " ".join("%d 0 R" % n for n in page_obj_nums)
    pages_num = add(
        ("<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(pages))).encode()
    )
    assert pages_num == pages_obj_num_placeholder
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    packed_nums: set = set()
    if objstm:
        import zlib

        dict_nums = [i for i, o in enumerate(objs, start=1)
                     if b"stream" not in o]
        if dict_nums:
            packed_nums = set(dict_nums)
            bodies, offs, pos = [], [], 0
            for i in dict_nums:
                body = objs[i - 1]
                offs.append((i, pos))
                bodies.append(body)
                pos += len(body) + 1
            header = (" ".join("%d %d" % p for p in offs) + "\n").encode()
            payload = header + b"\n".join(bodies) + b"\n"
            packed = zlib.compress(payload, 9)
            objs.append(
                b"<< /Type /ObjStm /N %d /First %d /Length %d "
                b"/Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(dict_nums), len(header), len(packed), packed)
            )

    out = bytearray(b"%PDF-1.5\n" if objstm else b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, obj in enumerate(objs, start=1):
        offsets[i] = len(out)
        if i in packed_nums:
            continue  # lives inside the ObjStm container only
        out += b"%d 0 obj\n" % i
        out += obj
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_num, xref_pos)
    )
    return bytes(out)


# --- convenience layout helpers for fixture construction -------------------

def words_line(texts, y, x0=72.0, size=12.0, font="F1", gap=1.0):
    """Lay words left-to-right on one baseline with deterministic widths."""
    out = []
    x = x0
    fname = FONTS[font]
    for t in texts:
        out.append({"text": t, "x": x, "y": y, "size": size, "font": font})
        x += char_width_factor(fname) * size * len(t) + gap + size * 0.25
    return out
