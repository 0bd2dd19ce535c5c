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


def _cid_hex(s: str, cidmap: Dict[str, int]) -> str:
    """Text → Identity-H hex string of 2-byte CIDs (``<00010002…>``)."""
    return "<%s>" % "".join("%04X" % cidmap[ch] for ch in s)


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
    cidmap = page.get("_cidmap") or {}
    t3map = page.get("_t3map") or {}
    for w in page.get("words", []):
        font = w.get("font", "F1")
        if font.startswith("C") and cidmap:
            shown = _cid_hex(w["text"], cidmap)
        elif font.startswith("T") and t3map:
            shown = "(%s)" % _esc(
                "".join(chr(t3map[ch]) for ch in w["text"]))
        else:
            shown = "(%s)" % _esc(w["text"])
        parts.append(
            "BT /%s %s Tf %s %s Td %s Tj ET"
            % (font, _fmt(w.get("size", 12)),
               _fmt(w["x"]), _fmt(w["y"]), shown)
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


def _lzw_encode_pdf(data: bytes) -> bytes:
    """PDF LZWDecode encoder (MSB-first, 9→12-bit, EarlyChange=1) —
    fixture twin of ``pdf_md._lzw_decode_pdf``."""
    codes: List[tuple] = [(256, 9)]
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        elif next_code >= 4093:
            # table full: emit CLEAR and restart (spec behavior for
            # incompressible data that would exceed 12-bit codes)
            codes.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    bitbuf = nbits = 0
    out = bytearray()
    for code, cw in codes:
        bitbuf = (bitbuf << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_encode_pdf(data: bytes) -> bytes:
    """RunLengthDecode encoder: literal blocks of <=128 bytes + EOD
    (always valid; repeats are a decoder feature, not required)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _package_stream(stream: bytes, stream_filter: str):
    """(encoded bytes, /Filter entry) for a content stream."""
    import base64
    import zlib

    if stream_filter == "lzw":
        return _lzw_encode_pdf(stream), b" /Filter /LZWDecode"
    if stream_filter == "ahx":
        return (stream.hex().upper().encode() + b">",
                b" /Filter /ASCIIHexDecode")
    if stream_filter == "rl":
        return _rle_encode_pdf(stream), b" /Filter /RunLengthDecode"
    if stream_filter == "a85flate":
        packed = base64.a85encode(zlib.compress(stream, 9)) + b"~>"
        return packed, b" /Filter [/ASCII85Decode /FlateDecode]"
    raise ValueError(f"unknown stream_filter {stream_filter!r}")


def build_pdf(pages: Sequence[Dict], compress: bool = False,
              objstm: bool = False, xrefstream: bool = False,
              indirect_length: bool = False,
              encrypt: bool | str = False,
              stream_filter: str | None = None,
              cid_tounicode: bool = True,
              cid_fontfile: str = "ttf",
              cid_encoding: str = "Identity-H") -> bytes:
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

    ``xrefstream=True`` replaces the classic xref table + trailer with
    a PDF 1.5 cross-reference STREAM (/Type /XRef, /W [1 4 2],
    /Predictor 12 Up-filtered rows) — type-1 entries for direct
    objects, type-2 for ObjStm members. ``indirect_length=True``
    (requires xrefstream) gives every content stream an indirect
    ``/Length N 0 R`` — the wild layout where exact object boundaries
    must come from the xref index, not a sequential scan.

    CID text: words whose font key starts with "C" are emitted as
    Identity-H 2-byte hex strings through a generated /Type0 font
    (descendant CIDFontType2 with a /W width table, /ToUnicode CMap
    with bfchar entries for every char used) — the structure most
    non-Latin web PDFs carry.

    ``cid_tounicode=False`` drops the /ToUnicode CMap and instead
    embeds a minimal font program — the wild layout where text is only
    recoverable from the program itself. ``cid_fontfile`` picks the
    flavor: ``"ttf"`` (default) embeds a TrueType program
    (/FontDescriptor → /FontFile2, kernels/ttf_cmap.ttf_build) whose
    ``cmap`` table maps each char to its CID; ``"cff"`` embeds a
    CFF/Type1C program (/FontFile3 /Subtype /Type1C,
    kernels/cff_cmap.cff_build) whose charset names each glyph.
    """
    if indirect_length and not xrefstream:
        raise ValueError("indirect_length requires xrefstream (the "
                         "sequential scan cannot bound such objects)")
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

    # CID font graph for any "C*" font keys used by page words
    cid_chars = sorted({
        ch
        for page in pages
        for w in page.get("words", [])
        if w.get("font", "F1").startswith("C")
        for ch in w["text"]
    })
    cidmap: Dict[str, int] = {}
    if cid_chars and cid_encoding != "Identity-H":
        # predefined-CMap layout (cid_encoding e.g. "UniGB-UCS2-H", or
        # a deliberately-unsupported name like "GBK-EUC-H" for the
        # quarantine fixture): the shown 2-byte codes are the UCS-2
        # code points of the text; no /ToUnicode, no font program —
        # text is only recoverable from the predefined encoding itself
        cidmap = {ch: ord(ch) for ch in cid_chars}
        pages = [dict(p, _cidmap=cidmap) for p in pages]
        desc_num = add((
            "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /LexoidCJK "
            "/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
            "/Supplement 5 >> /DW 1000 >>"
        ).encode("latin-1"))
        font_objs["C1"] = add((
            "<< /Type /Font /Subtype /Type0 /BaseFont /LexoidCJK "
            "/Encoding /%s /DescendantFonts [%d 0 R] >>"
            % (cid_encoding, desc_num)
        ).encode("latin-1"))
    elif cid_chars and not cid_tounicode:
        # no /ToUnicode: ship the mapping as an embedded TrueType
        # program instead (FontFile2 cmap: unicode -> gid == CID)
        if cid_fontfile == "cff-cid":
            # CID-keyed program (/ROS Adobe-UCS2): shown codes are the
            # UCS-2 code points themselves; the charset declares them
            from lexoid_spark.kernels.cff_cmap import cff_build_cid

            cidmap = {ch: ord(ch) for ch in cid_chars}
            prog = cff_build_cid(cidmap)
            ff_key, ff_extra = "FontFile3", " /Subtype /Type1C"
        elif cid_fontfile == "cff":
            from lexoid_spark.kernels.cff_cmap import cff_build

            cidmap = {ch: i + 1 for i, ch in enumerate(cid_chars)}
            prog = cff_build(cidmap)
            ff_key, ff_extra = "FontFile3", " /Subtype /Type1C"
        else:
            from lexoid_spark.kernels.ttf_cmap import ttf_build

            cidmap = {ch: i + 1 for i, ch in enumerate(cid_chars)}
            prog = ttf_build(cidmap)
            ff_key, ff_extra = "FontFile2", ""
        pages = [dict(p, _cidmap=cidmap) for p in pages]
        if compress:
            import zlib

            packed = zlib.compress(prog, 9)
            ff_num = add(
                b"<< /Length %d /Filter /FlateDecode /Length1 %d%s >>"
                b"\nstream\n%s\nendstream"
                % (len(packed), len(prog), ff_extra.encode(), packed))
        else:
            ff_num = add(
                b"<< /Length %d /Length1 %d%s >>\nstream\n%s\nendstream"
                % (len(prog), len(prog), ff_extra.encode(), prog))
        fd_num = add((
            "<< /Type /FontDescriptor /FontName /LexoidCJK /Flags 4 "
            "/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
            "/Descent -200 /CapHeight 700 /StemV 80 /%s %d 0 R >>"
            % (ff_key, ff_num)).encode("latin-1"))
        if cid_fontfile == "cff-cid":
            # CIDs are code points: /W keyed per-CID ranges; the
            # Ordering names the UCS2 convention the parser decodes
            w_arr = " ".join("%d %d %d" % (c, c, 600 + 50 * (c % 4))
                             for c in sorted(cidmap.values()))
            desc_num = add((
                "<< /Type /Font /Subtype /CIDFontType0 /BaseFont "
                "/LexoidCJK /CIDSystemInfo << /Registry (Adobe) "
                "/Ordering (UCS2) /Supplement 0 >> /DW 1000 /W [%s] "
                "/FontDescriptor %d 0 R >>" % (w_arr, fd_num)
            ).encode("latin-1"))
        else:
            w_arr = " ".join(str(600 + 50 * (c % 4))
                             for c in range(1, len(cidmap) + 1))
            desc_num = add((
                "<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
                "/LexoidCJK /CIDSystemInfo << /Registry (Adobe) "
                "/Ordering (Identity) /Supplement 0 >> /DW 1000 "
                "/W [1 [%s]] /FontDescriptor %d 0 R >>" % (w_arr, fd_num)
            ).encode("latin-1"))
        font_objs["C1"] = add((
            "<< /Type /Font /Subtype /Type0 /BaseFont /LexoidCJK "
            "/Encoding /Identity-H /DescendantFonts [%d 0 R] >>"
            % desc_num
        ).encode("latin-1"))
    elif cid_chars:
        cidmap = {ch: i + 1 for i, ch in enumerate(cid_chars)}
        pages = [dict(p, _cidmap=cidmap) for p in pages]
        bfchars = "\n".join(
            "<%04X> <%s>" % (cid, ch.encode("utf-16-be").hex().upper())
            for ch, cid in cidmap.items()
        )
        cmap_body = (
            "/CIDInit /ProcSet findresource begin\n"
            "12 dict begin\nbegincmap\n"
            "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            "%d beginbfchar\n%s\nendbfchar\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\n"
            "end\nend" % (len(cidmap), bfchars)
        ).encode("latin-1")
        if compress:
            import zlib

            packed_cmap = zlib.compress(cmap_body, 9)
            tounicode_num = add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(packed_cmap), packed_cmap))
        else:
            tounicode_num = add(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(cmap_body), cmap_body))
        # /W: explicit widths for every CID (600 + 50·(cid % 4)); DW
        # covers anything beyond the table
        w_arr = " ".join(str(600 + 50 * (c % 4))
                         for c in range(1, len(cidmap) + 1))
        desc_num = add((
            "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /LexoidCJK "
            "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            "/Supplement 0 >> /DW 1000 /W [1 [%s]] >>" % w_arr
        ).encode("latin-1"))
        font_objs["C1"] = add((
            "<< /Type /Font /Subtype /Type0 /BaseFont /LexoidCJK "
            "/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            "/ToUnicode %d 0 R >>" % (desc_num, tounicode_num)
        ).encode("latin-1"))
    # Type3 font graph for any "T*" font keys: glyph procedures under
    # /CharProcs, a /Differences encoding that assigns DELIBERATELY
    # remapped byte codes (code ≠ ord(char) whenever the text allows),
    # /FontMatrix [0.001 ...] and a /Widths array — the layout where
    # text is only recoverable by resolving glyph NAMES through the
    # Differences map (AGL conventions), never by decoding the raw
    # bytes (ISO 32000-1 §9.6.5).
    t3_chars = sorted({
        ch
        for page in pages
        for w in page.get("words", [])
        if w.get("font", "F1").startswith("T")
        for ch in w["text"]
    })
    if t3_chars:
        from lexoid_spark.kernels.cff_cmap import (
            STD_GLYPH_NAMES, glyph_name_to_char)

        if len(t3_chars) > 62:
            raise ValueError("Type3 fixture font caps at 62 glyphs")
        t3map = {ch: 0x41 + j for j, ch in enumerate(t3_chars)}
        pages = [dict(p, _t3map=t3map) for p in pages]
        name_by_char = {
            glyph_name_to_char(n): n for n in STD_GLYPH_NAMES}

        def gname(ch: str) -> str:
            return name_by_char.get(ch) or "uni%04X" % ord(ch)

        proc_entries = []
        for ch in t3_chars:
            # minimal glyph procedure: advance width via d0 (ISO
            # 32000-1 §9.6.5 Type3 glyph program form)
            proc = b"500 0 d0"
            pn = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                     % (len(proc), proc))
            proc_entries.append("/%s %d 0 R" % (gname(ch), pn))
        charprocs_num = add(
            ("<< %s >>" % " ".join(proc_entries)).encode("latin-1"))
        diffs = "%d %s" % (
            0x41, " ".join("/" + gname(ch) for ch in t3_chars))
        widths = " ".join(["500"] * len(t3_chars))
        font_objs["T1"] = add((
            "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
            "/FontMatrix [0.001 0 0 0.001 0 0] /CharProcs %d 0 R "
            "/Encoding << /Type /Encoding /Differences [%s] >> "
            "/FirstChar %d /LastChar %d /Widths [%s] >>"
            % (charprocs_num, diffs, 0x41,
               0x41 + len(t3_chars) - 1, widths)
        ).encode("latin-1"))
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
        # real raster payloads: page["raster_images"] entries are
        # either JPEG bytes — JFIF data embeds VERBATIM under
        # /Filter /DCTDecode (ISO 32000-1 §7.4.8), the lossy
        # scanner-output layout — or a dict {"gray": (H, W) uint8
        # array, "predictor": 1|15} for the LOSSLESS layout: raw
        # 8-bit /DeviceGray samples under /Filter /FlateDecode,
        # optionally PNG-predicted (/DecodeParms /Predictor 15 with a
        # per-row filter byte).
        for raster in page.get("raster_images", []):
            if isinstance(raster, dict) and \
                    raster.get("codec") in ("g4", "g3", "g3-2d"):
                # B/W fax scan under /CCITTFaxDecode: "g4" = ITU-T T.6
                # (/K -1), "g3" = pure 1-D T.4 MH (/K 0), "g3-2d" =
                # mixed 2-D T.4 MR (/K 4, EOL+tag framed)
                from lexoid_spark.kernels.ccitt_g4 import (
                    g3_encode,
                    g4_encode,
                )

                arr = raster["gray"]
                ih, iw = arr.shape
                codec = raster["codec"]
                if codec == "g4":
                    enc, kparm = g4_encode(arr), -1
                elif codec == "g3":
                    enc, kparm = g3_encode(arr, 0), 0
                else:
                    enc, kparm = g3_encode(arr, 4), 4
                img_nums_page.append(add(
                    (b"<< /Type /XObject /Subtype /Image /Width %d "
                     b"/Height %d /ColorSpace /DeviceGray "
                     b"/BitsPerComponent 1 /Filter /CCITTFaxDecode "
                     b"/DecodeParms << /K %d /Columns %d /Rows %d >> "
                     b"/Length %d >>\nstream\n%s\nendstream"
                     % (iw, ih, kparm, iw, ih, len(enc), enc))
                ))
                continue
            if isinstance(raster, dict) and \
                    raster.get("codec") in ("jpx", "jpx-jp2"):
                # JPEG 2000 scan under /JPXDecode (ITU-T T.800):
                # "jpx" = raw codestream, "jpx-jp2" = JP2 container
                from lexoid_spark.kernels.jpx import jp2_wrap, jpx_encode

                arr = raster["gray"]
                ih, iw = arr.shape[:2]
                nc = 1 if arr.ndim == 2 else arr.shape[2]
                enc = jpx_encode(arr, levels=raster.get("levels", 2))
                if raster["codec"] == "jpx-jp2":
                    enc = jp2_wrap(enc, iw, ih, nc)
                img_nums_page.append(add(
                    (b"<< /Type /XObject /Subtype /Image /Width %d "
                     b"/Height %d /ColorSpace /DeviceGray "
                     b"/BitsPerComponent 8 /Filter /JPXDecode "
                     b"/Length %d >>\nstream\n%s\nendstream"
                     % (iw, ih, len(enc), enc))
                ))
                continue
            if isinstance(raster, dict) and \
                    raster.get("codec") in ("jbig2", "jbig2-arith",
                                            "jbig2-sym"):
                # B/W scan under /JBIG2Decode (ITU-T T.88 embedded
                # stream): "jbig2" = MMR-coded generic region (T.6
                # data), "jbig2-arith" = MQ-coded GBTEMPLATE-0
                # region, "jbig2-sym" = symbol dictionary + text
                # region (the jbig2enc layout)
                from lexoid_spark.kernels.jbig2 import (
                    jbig2_encode,
                    jbig2_encode_symbols,
                )

                arr = raster["gray"]
                ih, iw = arr.shape
                if raster["codec"] == "jbig2-sym":
                    enc = jbig2_encode_symbols(arr)
                else:
                    enc = jbig2_encode(
                        arr, mode=("arith" if raster["codec"].endswith(
                            "arith") else "mmr"),
                        tpgdon=bool(raster.get("tpgdon")))
                img_nums_page.append(add(
                    (b"<< /Type /XObject /Subtype /Image /Width %d "
                     b"/Height %d /ColorSpace /DeviceGray "
                     b"/BitsPerComponent 1 /Filter /JBIG2Decode "
                     b"/Length %d >>\nstream\n%s\nendstream"
                     % (iw, ih, len(enc), enc))
                ))
                continue
            if isinstance(raster, dict) and "indexed" in raster:
                # palette image: ink maps to a non-trivial palette slot
                # so decode requires a REAL lookup, not value passthrough
                import zlib as _z

                import numpy as _np

                arr = raster["gray"]
                ih, iw = arr.shape
                bpc = int(raster["indexed"])
                if bpc == 8:
                    pal = _np.full((256, 3), 17, dtype=_np.uint8)
                    pal[5] = (0, 0, 0)
                    pal[200] = (255, 255, 255)
                    idx = _np.where(arr < 128, 5, 200).astype(_np.uint8)
                    samples = idx.tobytes()
                    stride = iw
                else:
                    pal = _np.array([[255, 255, 255], [0, 0, 0]],
                                    dtype=_np.uint8)
                    idx = (arr < 128).astype(_np.uint8)  # ink → slot 1
                    bits = _np.zeros((ih, iw * bpc), dtype=_np.uint8)
                    bits[:, bpc - 1::bpc] = idx  # low bit of each group
                    samples = _np.packbits(bits, axis=1).tobytes()
                    stride = (iw * bpc + 7) // 8
                packed = _z.compress(samples, 9)
                hexpal = pal.tobytes().hex().encode("ascii")
                img_nums_page.append(add(
                    (b"<< /Type /XObject /Subtype /Image /Width %d "
                     b"/Height %d /ColorSpace [/Indexed /DeviceRGB %d "
                     b"<%s>] /BitsPerComponent %d /Filter /FlateDecode "
                     b"/Length %d >>\nstream\n%s\nendstream"
                     % (iw, ih, len(pal) - 1, hexpal, bpc,
                        len(packed), packed))
                ))
                continue
            if isinstance(raster, dict):
                import zlib as _z

                import numpy as _np

                arr = raster["gray"]
                ih, iw = arr.shape
                pred = int(raster.get("predictor", 1))
                bpc = int(raster.get("bpc", 8))
                if bpc == 1:
                    # byte-padded rows of MSB-first bits, 0 = black
                    samples = _np.packbits(
                        (arr > 127).astype(_np.uint8), axis=1).tobytes()
                    stride = (iw + 7) // 8
                else:
                    samples = arr.tobytes()
                    stride = iw
                if pred >= 10:
                    rows = b"".join(
                        b"\x00" + samples[y * stride:(y + 1) * stride]
                        for y in range(ih))
                    parms = (b" /DecodeParms << /Predictor 15 /Colors 1"
                             b" /BitsPerComponent %d /Columns %d >>"
                             % (bpc, iw))
                else:
                    rows = samples
                    parms = b""
                packed = _z.compress(rows, 9)
                img_nums_page.append(add(
                    (b"<< /Type /XObject /Subtype /Image /Width %d "
                     b"/Height %d /ColorSpace /DeviceGray "
                     b"/BitsPerComponent %d /Filter /FlateDecode%s "
                     b"/Length %d >>\nstream\n%s\nendstream"
                     % (iw, ih, bpc, parms, len(packed), packed))
                ))
                continue
            jpg = raster
            from lexoid_spark.functions.multimodal import decode_image_header

            jw, jh, jc = decode_image_header(jpg)
            cs = b"/DeviceRGB" if jc == 3 else b"/DeviceGray"
            img_nums_page.append(add(
                (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                 b"/ColorSpace %s /BitsPerComponent 8 /Filter /DCTDecode "
                 b"/Length %d >>\nstream\n%s\nendstream"
                 % (jw, jh, cs, len(jpg), jpg))
            ))
        image_nums.append(img_nums_page)
        stream = page_content_stream(page)
        # inline images (BI/ID/EI, ISO 32000-1 §8.9.7) appended to the
        # content stream with ABBREVIATED dict keys — the wild layout
        # small scanner/fax producers emit. Entries use the
        # raster_images grammar: {"gray": arr} → Flate with /L,
        # {"gray": arr, "predictor": 15} → PNG-predicted Flate,
        # {"gray": arr, "codec": "g4"} → CCITT G4 via /CCF,
        # {"gray": arr, "raw": True} → unfiltered samples WITHOUT /L
        # (exercises the EI-scan fallback; raw 0/255 bytes can never
        # collide with a whitespace-delimited EI), or JPEG bytes → /DCT.
        inline_parts: List[bytes] = []
        for raster in page.get("inline_images", []):
            if isinstance(raster, dict) and raster.get("codec") == "g4":
                from lexoid_spark.kernels.ccitt_g4 import g4_encode

                arr = raster["gray"]
                ih, iw = arr.shape
                enc = g4_encode(arr)
                inline_parts.append(
                    b"BI /W %d /H %d /CS /G /BPC 1 /F /CCF "
                    b"/DP << /K -1 /Columns %d /Rows %d >> /L %d "
                    b"ID\n%s\nEI" % (iw, ih, iw, ih, len(enc), enc))
            elif isinstance(raster, dict) and raster.get("raw"):
                arr = raster["gray"]
                ih, iw = arr.shape
                inline_parts.append(
                    b"BI /W %d /H %d /CS /G /BPC 8 ID\n%s\nEI"
                    % (iw, ih, arr.tobytes()))
            elif isinstance(raster, dict):
                import zlib as _z

                arr = raster["gray"]
                ih, iw = arr.shape
                pred = int(raster.get("predictor", 1))
                samples = arr.tobytes()
                if pred >= 10:
                    rows = b"".join(
                        b"\x00" + samples[y * iw:(y + 1) * iw]
                        for y in range(ih))
                    # DP entries keep their FULL parm names (the
                    # abbreviations cover image-dict keys; the filter
                    # parms dict is the standard LZW/Flate one)
                    parms = (b" /DP << /Predictor 15 /Colors 1"
                             b" /BitsPerComponent 8 /Columns %d >>" % iw)
                else:
                    rows = samples
                    parms = b""
                packed = _z.compress(rows, 9)
                inline_parts.append(
                    b"BI /W %d /H %d /CS /G /BPC 8 /F /Fl%s /L %d "
                    b"ID\n%s\nEI" % (iw, ih, parms, len(packed), packed))
            else:
                jpg = raster
                from lexoid_spark.functions.multimodal import (
                    decode_image_header,
                )

                jw, jh, jc = decode_image_header(jpg)
                cs = b"/RGB" if jc == 3 else b"/G"
                inline_parts.append(
                    b"BI /W %d /H %d /CS %s /BPC 8 /F /DCT /L %d "
                    b"ID\n%s\nEI" % (jw, jh, cs, len(jpg), jpg))
        if inline_parts:
            stream = stream + b"\n" + b"\n".join(inline_parts) + b"\n"
        filt = b""
        if stream_filter:
            stream, filt = _package_stream(stream, stream_filter)
        elif compress:
            import zlib

            stream = zlib.compress(stream, 9)
            filt = b" /Filter /FlateDecode"
        if indirect_length:
            # /Length as an indirect ref to the NEXT object number —
            # the layout where only the xref index bounds the stream
            lnum = len(objs) + 2
            cnum = add(
                b"<< /Length %d 0 R%s >>\nstream\n%s\nendstream"
                % (lnum, filt, stream)
            )
            assert add(b"%d" % len(stream)) == lnum
        else:
            cnum = add(
                b"<< /Length %d%s >>\nstream\n%s\nendstream"
                % (len(stream), filt, stream)
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

    encrypt_num = None
    file_id_hex = b""
    if encrypt:
        # standard security handler, empty user AND owner password —
        # the spec defaults every viewer opens silently. encrypt=True
        # or "rc4" → V1/R2 40-bit RC4 (length-preserving);
        # encrypt="aes" → V4/R4 /AESV2 128-bit AES-CBC (each stream
        # becomes IV + padded ciphertext, so /Length is rewritten).
        # Streams-only: this writer keeps no strings outside streams
        # (URIs excluded from the encrypted fixture class).
        import hashlib
        import re as _re

        from lexoid_spark.kernels.pdf_crypt import (
            aes_cbc_encrypt,
            make_entries,
            make_entries_r4,
            make_entries_v5,
            object_key,
            rc4,
        )

        if objstm or xrefstream:
            raise ValueError(
                "encrypt uses the classic layout (fixture scope)")
        aes = encrypt in ("aes", "aes256")
        r6 = encrypt == "aes256"
        file_id = hashlib.md5(b"lexoid-id:" + b"|".join(objs)).digest()
        file_id_hex = file_id.hex().upper().encode()
        v5_entries = None
        if r6:
            # FIXED seed: every R6 fixture shares one /Encrypt dict
            # (same U/UE/O/OE, hence one memoized KDF run per worker).
            # R6's Algorithm 2.B is a password-stretching KDF — tens
            # of thousands of sequential cipher blocks BY DESIGN — so
            # per-doc unique salts would price the fixture suite on
            # the KDF instead of the parse path it exercises; wild
            # same-producer shards repeat /Encrypt dicts the same way.
            v5_entries = make_entries_v5(-44, b"lexoid-v5-fixture")
            key = v5_entries[5]
        else:
            o_e, u_e, key = (make_entries_r4(-44, file_id) if aes
                             else make_entries(-44, file_id))
        for i in range(len(objs)):
            obj = objs[i]
            s_idx = obj.find(b"stream")
            if s_idx == -1:
                continue
            body = s_idx + len(b"stream")
            if obj[body:body + 2] == b"\r\n":
                body += 2
            elif obj[body:body + 1] == b"\n":
                body += 1
            lm = _re.search(rb"/Length\s+(\d+)", obj[:s_idx])
            ln = int(lm.group(1))
            if aes:
                # deterministic IV per object (fixture reproducibility)
                iv = hashlib.md5(b"lexoid-iv:%s:%d"
                                 % (file_id, i + 1)).digest()
                sk = key if r6 else object_key(key, i + 1, aes=True)
                enc_body = iv + aes_cbc_encrypt(
                    sk, iv, obj[body:body + ln])
                header = _re.sub(
                    rb"/Length\s+\d+", b"/Length %d" % len(enc_body),
                    obj[:body], count=1)
                objs[i] = header + enc_body + obj[body + ln:]
            else:
                enc_body = rc4(object_key(key, i + 1),
                               obj[body:body + ln])
                objs[i] = obj[:body] + enc_body + obj[body + ln:]
        if r6:
            u_e5, ue_e5, o_e5, oe_e5, perms5, _fk = v5_entries
            encrypt_num = add(
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
                b"/U <%s> /UE <%s> /O <%s> /OE <%s> /Perms <%s> "
                b"/P -44 >>"
                % (u_e5.hex().upper().encode(),
                   ue_e5.hex().upper().encode(),
                   o_e5.hex().upper().encode(),
                   oe_e5.hex().upper().encode(),
                   perms5.hex().upper().encode())
            )
        elif aes:
            encrypt_num = add(
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                b"/O <%s> /U <%s> /P -44 >>"
                % (o_e.hex().upper().encode(),
                   u_e.hex().upper().encode())
            )
        else:
            encrypt_num = add(
                b"<< /Filter /Standard /V 1 /R 2 /Length 40 /O <%s> "
                b"/U <%s> /P -44 >>"
                % (o_e.hex().upper().encode(),
                   u_e.hex().upper().encode())
            )

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

    out = bytearray(b"%PDF-1.5\n" if (objstm or xrefstream) else b"%PDF-1.4\n")
    # ObjStm member index (for type-2 xref entries): obj num → position
    packed_order = sorted(packed_nums)
    packed_idx = {n: i for i, n in enumerate(packed_order)}
    objstm_num = len(objs) if objstm and packed_nums else None

    offsets = [0] * (len(objs) + 1)
    for i, obj in enumerate(objs, start=1):
        offsets[i] = len(out)
        if i in packed_nums:
            continue  # lives inside the ObjStm container only
        out += b"%d 0 obj\n" % i
        out += obj
        out += b"\nendobj\n"
    xref_pos = len(out)

    if xrefstream:
        import zlib

        xref_obj_num = len(objs) + 1
        # W = [1 4 2]: type byte, 4-byte offset/container, 2-byte
        # gen/index — entry rows Up-filtered (/Predictor 12)
        rows = [bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")]
        for i in range(1, len(objs) + 1):
            if i in packed_nums:
                rows.append(bytes([2]) + objstm_num.to_bytes(4, "big")
                            + packed_idx[i].to_bytes(2, "big"))
            else:
                rows.append(bytes([1]) + offsets[i].to_bytes(4, "big")
                            + (0).to_bytes(2, "big"))
        rows.append(bytes([1]) + xref_pos.to_bytes(4, "big")
                    + (0).to_bytes(2, "big"))
        cols = 7
        filtered = bytearray()
        prev = bytes(cols)
        for row in rows:
            filtered.append(2)  # Up
            filtered += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
            prev = row
        packed = zlib.compress(bytes(filtered), 9)
        out += b"%d 0 obj\n" % xref_obj_num
        out += (
            b"<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R "
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 7 >> /Length %d >>\nstream\n%s\nendstream"
            % (len(objs) + 2, catalog_num, len(packed), packed)
        )
        out += b"\nendobj\n"
        out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)

    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    enc_entry = b""
    if encrypt_num is not None:
        enc_entry = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            encrypt_num, file_id_hex, file_id_hex)
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_num, enc_entry, xref_pos)
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
