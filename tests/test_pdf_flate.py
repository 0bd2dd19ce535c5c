"""General content-stream support: FlateDecode, TJ arrays, Tm/TD/T*,
hex strings, multi-stream /Contents, stream-body-safe object scanning.

Round 1's tokenizer read only its own fixture dialect (classic xref,
uncompressed streams, one Tj per BT block); nearly every real-world
PDF uses FlateDecode and array-form TJ (reference parses them via
pdfplumber, static_parser.py:700-727 — here stdlib zlib + a from-
scratch operator interpreter).
"""

import zlib

from lexoid_spark.corpus.pdf_gen import build_pdf, words_line
from lexoid_spark.kernels.pdf_md import (
    PdfPage,
    _interpret_content,
    _parse_objects,
    parse_pdf,
    pdf_to_md,
)

FONTS = {"F1": "Helvetica", "F2": "Helvetica-Bold", "F4": "Courier"}


def _interp(stream: bytes, height: float = 792.0) -> PdfPage:
    page = PdfPage(612.0, height)
    _interpret_content(stream, height, FONTS, page)
    return page


# --- compression ------------------------------------------------------------

def test_flate_classic_equals_uncompressed():
    """The same logical page compressed and raw must extract to the
    same markdown bytes."""
    words = words_line(["Heading", "words"], y=720, size=20)
    words += words_line(["body", "text", "line"], y=680, size=12)
    spec = [{"words": words}]
    assert pdf_to_md(build_pdf(spec, compress=True)) == pdf_to_md(
        build_pdf(spec, compress=False)
    )
    assert "body text line" in pdf_to_md(build_pdf(spec, compress=True))


def test_compact_dialect_equals_classic_when_kerning_exact():
    """Compact (one BT, Tm + TJ with kerning) and classic (one Tj per
    word) emissions of the same layout extract identically when the
    kern values are exactly representable (size 12, gaps k·0.012)."""
    # x positions chosen so gap·1000/size is integral: width(4 chars)=24,
    # step 48 → gap 24 → kern -2000 exactly
    words = [
        {"text": f"w{j}xa", "x": 72.0 + 48.0 * j, "y": 700.0,
         "size": 12.0, "font": "F1"}
        for j in range(4)
    ]
    classic = build_pdf([{"words": words}])
    compact = build_pdf([{"words": words, "style": "compact"}],
                        compress=True)
    assert pdf_to_md(compact) == pdf_to_md(classic)

    # and the word boxes round-trip exactly
    page = parse_pdf(compact)[0]
    assert [round(w["x0"], 6) for w in page.words] == [72.0, 120.0, 168.0,
                                                       216.0]


def test_multiline_compact_with_font_changes():
    words = words_line(["Big", "Title"], y=720, size=24, font="F2")
    words += words_line(["plain", "body", "one"], y=680, size=12)
    words += words_line(["plain", "body", "two"], y=660, size=12)
    md = pdf_to_md(
        build_pdf([{"words": words, "style": "compact"}], compress=True))
    # size ratio 2 → h1; redundant-format cleanup merges adjacent bold
    assert "# **Big Title**" in md
    assert "plain body one" in md and "plain body two" in md


# --- operator coverage (hand-built streams) ----------------------------------

def test_td_then_tstar_advances_lines():
    stream = (b"BT /F1 12 Tf 14 TL 72 700 Td (first) Tj "
              b"T* (second) Tj T* (third) Tj ET")
    page = _interp(stream)
    assert [w["text"] for w in page.words] == ["first", "second", "third"]
    tops = [w["top"] for w in page.words]
    assert tops[1] - tops[0] == 14.0 and tops[2] - tops[1] == 14.0


def test_TD_sets_leading_and_quote_shows():
    # TD = Td + leading := -ty ; ' = T* + Tj
    stream = b"BT /F1 12 Tf 72 700 TD (one) Tj 0 -16 TD (two) Tj (three) ' ET"
    page = _interp(stream)
    assert [w["text"] for w in page.words] == ["one", "two", "three"]
    assert page.words[1]["top"] - page.words[0]["top"] == 16.0
    assert page.words[2]["top"] - page.words[1]["top"] == 16.0


def test_tj_array_kerning_advances_x():
    stream = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm [(ab) -500 (cd)] TJ ET"
    page = _interp(stream)
    a, b = page.words
    # ab: x0=100, width 0.5*12*2=12 → x1=112; kern -500 → +6 → cd at 118
    assert (a["x0"], a["x1"]) == (100.0, 112.0)
    assert (b["x0"], b["x1"]) == (118.0, 130.0)


def test_hex_string_and_escapes():
    stream = (b"BT /F1 12 Tf 72 700 Td <48656C6C6F> Tj "
              b"0 -20 Td (a\\051b\\nc\\\\d) Tj ET")
    page = _interp(stream)
    assert page.words[0]["text"] == "Hello"
    assert page.words[1]["text"] == "a)b\nc\\d"


def test_multi_segment_path_and_rect():
    stream = (b"100 700 m 200 700 l 200 600 l S "
              b"72 500 120 40 re S")
    page = _interp(stream)
    assert len(page.lines) == 2  # two segments of one stroked path
    assert page.rects == [(72.0, 792.0 - 540.0, 192.0, 792.0 - 500.0)]


def test_inline_dict_and_comments_skipped():
    stream = (b"% comment line\n"
              b"BT /F1 12 Tf 72 700 Td (ok) Tj ET\n"
              b"/GS0 << /Type /ExtGState >> q Q")
    page = _interp(stream)
    assert [w["text"] for w in page.words] == ["ok"]


# --- document plumbing --------------------------------------------------------

def test_parse_objects_stream_body_containing_endobj():
    """/Length-aware scanning: a stream body containing the bytes
    'endobj' must not truncate the object (a compressed stream can
    contain any byte sequence)."""
    body = b"fake endobj inside stream"
    data = (
        b"1 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Catalog >>\nendobj\n" % (len(body), body)
    )
    objs = _parse_objects(data)
    assert set(objs) == {1, 2}
    assert body in objs[1]
    assert b"/Type /Catalog" in objs[2]


def test_contents_array_concatenates_streams():
    s1 = b"BT /F1 12 Tf 72 700 Td (partA) Tj ET"
    s2 = b"BT /F1 12 Tf 72 660 Td (partB) Tj ET"
    data = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 6 0 R >> >> "
        b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        b"\nendobj\n" % (len(s1), s1, len(s2), s2)
    )
    md = pdf_to_md(data)
    assert "partA" in md and "partB" in md


def test_basefont_resolution_nonstandard_keys():
    """Font keys outside the fixture F1–F5 map resolve via /Resources
    → /BaseFont (with subset prefixes stripped)."""
    s = b"BT /TT7 12 Tf 72 700 Td (boldword) Tj ET"
    data = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /TT7 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /TrueType "
        b"/BaseFont /ABCDEF+Arial-BoldMT >>\nendobj\n" % (len(s), s)
    )
    page = parse_pdf(data)[0]
    assert page.words[0]["fontname"] == "Arial-BoldMT"
    assert "**boldword**" in pdf_to_md(data)


def test_flate_fixture_classes_route_static(spark):
    """pdf_flate / pdf_compact corpus docs flow through the full Spark
    pipeline and extract (not quarantine)."""
    from pyspark.sql import functions as F

    from lexoid_spark.corpus.gen import pages_df
    from lexoid_spark.plans.extract import extract

    pages = pages_df(spark, 32).filter(
        F.col("url").contains("pdf_flate") | F.col("url").contains("pdf_compact")
    )
    n_in = pages.count()
    assert n_in >= 2
    out = extract(pages)["extracted"]
    rows = out.collect()
    assert len(rows) == n_in
    for r in rows:
        assert r["raw"] and r["n_chars"] > 0


def test_flate_golden_byte_identity(spark):
    """Spark-side extraction of the compressed classes is byte-identical
    to the driver-side kernel goldens."""
    from pyspark.sql import functions as F

    from lexoid_spark.corpus.gen import golden_rows, pages_df
    from lexoid_spark.plans.extract import extract

    n = 40
    golden = {
        g["url"]: g["golden_raw"] for g in golden_rows(n)
        if "pdf_flate" in g["url"] or "pdf_compact" in g["url"]
    }
    assert golden
    pages = pages_df(spark, n).filter(
        F.col("url").contains("pdf_flate") | F.col("url").contains("pdf_compact")
    )
    got = {r["url"]: r["raw"] for r in extract(pages)["extracted"].collect()}
    assert got == golden


def test_compressed_stream_with_magic_markers_survives():
    """zlib output bytes may collide with PDF keywords; a page whose
    compressed stream is adversarially long still round-trips."""
    words = []
    for y in range(760, 80, -16):
        words += words_line([f"r{y}a", f"r{y}b", f"r{y}c"], y=y, size=10)
    raw = build_pdf([{"words": words}])
    comp = build_pdf([{"words": words}], compress=True)
    assert zlib.compress(b"x")  # sanity: stdlib available
    assert pdf_to_md(comp) == pdf_to_md(raw)


def test_page_without_contents_yields_empty_page():
    data = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"
        b"\nendobj\n"
    )
    pages = parse_pdf(data)
    assert len(pages) == 1 and pages[0].words == []
    assert pdf_to_md(data) == ""


def test_corrupt_flate_stream_degrades_to_empty_not_crash():
    bad = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 12 /Filter /FlateDecode >>\nstream\n"
        b"notzlibdata!\nendstream\nendobj\n"
    )
    assert pdf_to_md(bad) == ""  # graceful: no words, no exception


def test_octal_escape_and_line_continuation():
    stream = (b"BT /F1 12 Tf 72 700 Td (A\\101B) Tj "
              b"0 -20 Td (cont\\\ninued) Tj ET")
    page = _interp(stream)
    assert page.words[0]["text"] == "AAB"  # \101 = 'A'
    assert page.words[1]["text"] == "continued"


def test_truncated_pdf_no_crash():
    from lexoid_spark.corpus.pdf_gen import build_pdf, words_line

    full = build_pdf([{"words": words_line(["hello", "world"], y=700)}])
    for cut in (len(full) // 4, len(full) // 2, len(full) - 20):
        md = pdf_to_md(full[:cut])  # must not raise
        assert isinstance(md, str)


# --- PDF 1.5 object streams (/Type /ObjStm) ---------------------------------


def test_objstm_byte_identical_to_classic():
    """Same document packed into a compressed object stream must parse
    to byte-identical markdown (dict objects live ONLY in the
    container)."""
    from lexoid_spark.corpus.pdf_gen import build_pdf, words_line

    pages = [
        {"words": words_line(["Title", "words"], y=720, size=20)
         + words_line(["alpha", "beta", "gamma"], y=680),
         "lines": [(72, 650, 400, 650)]},
        {"words": words_line(["second", "page"], y=700)},
    ]
    classic = build_pdf(pages)
    packed = build_pdf(pages, compress=True, objstm=True)
    assert b"/ObjStm" in packed
    # the page dict must NOT be visible as a direct object
    assert b"/Type /Page /Parent" not in packed
    assert pdf_to_md(packed) == pdf_to_md(classic) != ""


def test_objstm_direct_object_outranks_container_copy():
    """A direct definition wins over a stale ObjStm copy (spec:
    the xref decides; our scan prefers direct objects)."""
    import zlib

    from lexoid_spark.kernels.pdf_md import (
        _expand_object_streams,
        _parse_objects,
    )

    inner = b"<< /Type /Page /stale true >>"
    header = b"5 0\n"
    payload = header + inner + b"\n"
    packed = zlib.compress(payload, 9)
    doc = (
        b"5 0 obj\n<< /direct true >>\nendobj\n"
        b"9 0 obj\n<< /Type /ObjStm /N 1 /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(header), len(packed), packed)
    )
    objs = _expand_object_streams(_parse_objects(doc))
    assert objs[5].strip() == b"<< /direct true >>"
    assert b"stale" not in objs[5]


def test_objstm_corrupt_container_ignored():
    bad = (
        b"9 0 obj\n<< /Type /ObjStm /N 2 /First 8 /Length 7 "
        b"/Filter /FlateDecode >>\nstream\nnotzlib\nendstream\nendobj\n"
    )
    md = pdf_to_md(bad)
    assert md == ""  # graceful
