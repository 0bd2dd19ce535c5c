"""PDF kernel tests: build a PDF with corpus/pdf_gen, parse with
kernels/pdf_md, assert the reference page-state-machine behaviors
(one test per F6-F22 behavior, mirroring the reference's
tests/test_parser.py:362-411 substring style).
"""

from lexoid_spark.corpus.pdf_gen import build_pdf, words_line
from lexoid_spark.kernels.pdf_md import (
    parse_pdf,
    pdf_flags,
    pdf_to_md,
    pdf_to_pages,
    sniff_doctype,
)


def _simple_page(words, **extra):
    page = {"words": words}
    page.update(extra)
    return page


def test_roundtrip_single_word():
    pdf = build_pdf([_simple_page(words_line(["hello"], y=700))])
    pages = parse_pdf(pdf)
    assert len(pages) == 1
    assert [w["text"] for w in pages[0].words] == ["hello"]
    md = pdf_to_md(pdf)
    assert "hello" in md


def test_paragraph_same_line_words_joined():
    pdf = build_pdf([_simple_page(words_line(["alpha", "beta", "gamma"], y=700))])
    md = pdf_to_md(pdf)
    assert "alpha beta gamma" in md


def test_headings_by_font_ratio():
    words = []
    words += words_line(["Title"], y=720, size=24)       # ratio 2.0 → h1
    words += words_line(["Sub"], y=680, size=17)         # ratio ~1.42 → h2
    words += words_line(["Minor"], y=640, size=15)       # ratio 1.25 → h3
    for yy in (600, 580, 560, 540):
        words += words_line(["body", "text", "here"], y=yy, size=12)
    pdf = build_pdf([_simple_page(words)])
    md = pdf_to_md(pdf)
    assert "# Title" in md
    assert "## Sub" in md
    assert "### Minor" in md


def test_bold_italic_mono_formatting():
    # separate lines: the reference's order-sensitive cleanup chain
    # (static_parser.py:662-668) rewrites adjacent "** *" sequences, so
    # bold-followed-by-italic on one line intentionally mangles. We pin
    # the per-style markers on distinct lines.
    words = []
    words += words_line(["plain", "words"], y=700, size=12, font="F1")
    words += words_line(["bolded"], y=650, size=12, font="F2")
    words += words_line(["italics"], y=600, size=12, font="F3")
    words += words_line(["monos", "w"], y=550, size=12, font="F1")
    words += words_line(["mono2"], y=550, x0=300, size=12, font="F4")
    pdf = build_pdf([_simple_page(words)])
    md = pdf_to_md(pdf)
    assert "**bolded**" in md
    assert "*italics*" in md
    assert "`mono2`" in md


def test_cleanup_chain_mangles_adjacent_bold_italic_like_reference():
    words = words_line(["plain"], y=700, size=12, font="F1")
    words += words_line(["bolded"], y=700, x0=200, size=12, font="F2")
    words += words_line(["italics"], y=700, x0=300, size=12, font="F3")
    md = pdf_to_md(build_pdf([_simple_page(words)]))
    # "**bolded** *italics*" → replace("* *", " ") → "**bolded* italics*"
    assert "**bolded* italics*" in md


def test_bold_italic_combined():
    words = words_line(["plain"], y=700) + words_line(
        ["both"], y=700, x0=200, font="F5"
    )
    md = pdf_to_md(build_pdf([_simple_page(words)]))
    assert "***both***" in md


def test_all_mono_paragraph_becomes_code_fence():
    words = words_line(["x", "=", "1"], y=700, font="F4")
    # add a non-mono line so the page isn't trivial
    words += words_line(["normal", "text"], y=650, font="F1")
    md = pdf_to_md(build_pdf([_simple_page(words)]))
    assert "```\nx = 1\n```" in md


def test_indentation_nbsp():
    words = words_line(["base", "line", "words"], y=700, x0=72)
    words += words_line(["indented"], y=650, x0=72 + 30)  # diff 30 → level 2
    words += words_line(["more", "base"], y=600, x0=72)
    md = pdf_to_md(build_pdf([_simple_page(words)]))
    assert "&nbsp;" * 6 + " indented" in md


def test_horizontal_rule():
    # the reference's deferred-emission loop (static_parser.py:580-590)
    # emits rule k when rule k+1's element is reached, and drops a final
    # trailing rule entirely. Two lines → first rule appears.
    words = words_line(["above"], y=700)
    words += words_line(["mid"], y=600)
    words += words_line(["below"], y=500)
    pdf = build_pdf(
        [_simple_page(words, lines=[(72, 650, 400, 650), (72, 550, 400, 550)])]
    )
    md = pdf_to_md(pdf)
    assert "\n---\n\n" in md
    assert md.index("above") < md.index("---")


def test_strikethrough():
    words = words_line(["normal", "struck"], y=700)
    x0 = words[1]["x"]
    pdf = build_pdf(
        [_simple_page(words, lines=[(x0, 704, x0 + 40, 704)])]
    )
    md = pdf_to_md(pdf)
    assert "~~struck~~" in md


def test_table_pipe_markdown_and_zone_exclusion():
    # 2x2 grid of cell rects: header row (h1 h2), data row (a b)
    rects = []
    xs = [100, 200, 300]
    ys = [600, 630, 660]  # from bottom
    for j in range(2):
        for i in range(2):
            rects.append((xs[i], ys[j], xs[i + 1] - xs[i], ys[j + 1] - ys[j]))
    words = []
    words += words_line(["h1"], y=640, x0=110)
    words += words_line(["h2"], y=640, x0=210)
    words += words_line(["va"], y=610, x0=110)
    words += words_line(["vb"], y=610, x0=210)
    words += words_line(["after", "table", "text"], y=500, x0=72)
    pdf = build_pdf([_simple_page(words, rects=rects)])
    md = pdf_to_md(pdf)
    assert "| h1  | h2  |" in md
    assert "| va  | vb  |" in md
    # table words must not re-appear as paragraph text
    assert md.count("va") == 1
    assert "after table text" in md
    assert md.index("| h1") < md.index("after")


def test_link_embedding():
    words = words_line(["visit", "example", "site", "today"], y=700)
    x0 = words[1]["x"]
    x1 = words[2]["x"] + 10  # covers 'site' x0 but not 'today'
    # word_top as seen by the embedder = page.height - word["top"]
    # = y + 0.8*size = 709.6 for y=700, size=12
    word_top = 700 + 0.8 * 12
    pdf = build_pdf([
        _simple_page(
            words,
            links=[{"uri": "http://ex.test/page",
                    "rect": (x0, word_top - 5, x1, word_top + 5)}],
        )
    ])
    md = pdf_to_md(pdf)
    assert "[example site](http://ex.test/page)" in md


def test_email_wrapped():
    words = words_line(["contact", "mail@example.com", "now"], y=700)
    md = pdf_to_md(build_pdf([_simple_page(words)]))
    assert "<mail@example.com>" in md


def test_multipage_join_and_page_numbers():
    p1 = _simple_page(words_line(["first", "page"], y=700))
    p2 = _simple_page(words_line(["second", "page"], y=700))
    pdf = build_pdf([p1, p2])
    pages = pdf_to_pages(pdf, start=0)
    assert [p[0] for p in pages] == [1, 2]
    md = pdf_to_md(pdf)
    assert "first page\n\n" in md and "second page" in md
    # start offset (reference: api.py:147-149 split-name offsets)
    assert [p[0] for p in pdf_to_pages(pdf, start=4)] == [5, 6]


def test_sniff_doctype():
    assert sniff_doctype(b"%PDF-1.4\n...") == "pdf"
    assert sniff_doctype(b"<!DOCTYPE html><html></html>") == "html"
    assert sniff_doctype(b"<html><body>x</body></html>") == "html"
    assert sniff_doctype(b"a,b,c\n1,2,3\n") == "csv"
    assert sniff_doctype(b"just words\nhere") == "txt"


def test_pdf_flags_hyperlink():
    pdf_with = build_pdf([
        _simple_page(
            words_line(["x"], y=700),
            links=[{"uri": "http://a.test/", "rect": (10, 10, 50, 20)}],
        )
    ])
    pdf_without = build_pdf([_simple_page(words_line(["x"], y=700))])
    assert pdf_flags(pdf_with)[1] is True
    assert pdf_flags(pdf_without)[1] is False


def test_cleanup_chain_no_empty_emphasis():
    md = pdf_to_md(build_pdf([_simple_page(words_line(["a", "b"], y=700))]))
    assert "** **" not in md and "` `" not in md


class TestPredefinedCMaps:
    """Type0 /Encoding handling (VERDICT r04 task 5): fixed 2-byte
    predefined CMaps decode (Identity passes CIDs to /ToUnicode or
    the font program; the UCS2 family IS the code point), everything
    else quarantines typed — no silent garble path."""

    WORDS = [{"text": "你好世界", "x": 72.0, "y": 700.0,
              "size": 12.0, "font": "C1"},
             {"text": "Ünïcode", "x": 72.0, "y": 680.0,
              "size": 12.0, "font": "C1"}]

    def test_ucs2_cmap_decodes_without_tounicode(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        pdf = build_pdf([{"words": self.WORDS}],
                        cid_encoding="UniGB-UCS2-H")
        assert b"/UniGB-UCS2-H" in pdf and b"/ToUnicode" not in pdf
        (_, md), = pdf_to_pages(pdf)
        assert "你好世界" in md and "Ünïcode" in md

    def test_ucs2_v_variant_and_other_collections(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        for enc in ("UniJIS-UCS2-H", "UniKS-UCS2-V", "UniCNS-UCS2-H"):
            pdf = build_pdf([{"words": self.WORDS}], cid_encoding=enc)
            (_, md), = pdf_to_pages(pdf)
            assert "你好世界" in md, enc

    def test_unsupported_cmap_quarantines(self):
        import pytest as _pytest

        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import (
            PdfUnsupportedEncodingError,
            pdf_to_pages,
        )

        for enc in ("GBK-EUC-H", "90ms-RKSJ-H", "ETen-B5-H"):
            pdf = build_pdf([{"words": self.WORDS}], cid_encoding=enc)
            with _pytest.raises(PdfUnsupportedEncodingError):
                pdf_to_pages(pdf)

    def test_embedded_cmap_stream_quarantines(self):
        import pytest as _pytest

        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import (
            PdfUnsupportedEncodingError,
            pdf_to_pages,
        )

        pdf = build_pdf([{"words": self.WORDS}])
        broken = pdf.replace(b"/Encoding /Identity-H",
                             b"/Encoding 999 0 R")
        with _pytest.raises(PdfUnsupportedEncodingError):
            pdf_to_pages(broken)

    def test_identity_h_regression(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        a = pdf_to_pages(build_pdf([{"words": self.WORDS}]))
        b = pdf_to_pages(build_pdf([{"words": self.WORDS}],
                                   cid_encoding="UniGB-UCS2-H"))
        assert a == b


class TestType3Fonts:
    """Type3 glyph-procedure fonts (VERDICT r04 "What's missing" #4):
    byte codes decode through /Encoding /Differences glyph names (AGL
    conventions), never through latin-1 — the fixture's codes are
    deliberately remapped so a raw-byte read would garble."""

    WORDS = [{"text": "hello world!", "x": 72.0, "y": 700.0,
              "size": 12.0, "font": "T1"},
             {"text": "t3 fix 42", "x": 72.0, "y": 660.0,
              "size": 12.0, "font": "T1"}]

    def test_differences_decode(self):
        pdf = build_pdf([{"words": self.WORDS}])
        assert b"/Type3" in pdf and b"/Differences" in pdf
        # the shown bytes really are remapped, not the text itself
        assert b"(hello world!)" not in pdf
        (_, md), = pdf_to_pages(pdf)
        assert "hello world!" in md and "t3 fix 42" in md

    def test_matches_plain_font_layout(self):
        t3 = pdf_to_md(build_pdf([{"words": self.WORDS}]))
        plain = pdf_to_md(build_pdf(
            [{"words": [dict(w, font="F1") for w in self.WORDS]}]))
        assert t3 == plain

    def test_flate_and_objstm_dialects(self):
        for kw in ({"compress": True},
                   {"compress": True, "objstm": True}):
            (_, md), = pdf_to_pages(
                build_pdf([{"words": self.WORDS}], **kw))
            assert "hello world!" in md, kw

    def test_unicode_glyph_names(self):
        words = [{"text": "héllo•", "x": 72.0, "y": 700.0,
                  "size": 12.0, "font": "T1"}]
        pdf = build_pdf([{"words": words}])
        assert b"/uni00E9" in pdf and b"/uni2022" in pdf
        (_, md), = pdf_to_pages(pdf)
        assert "héllo•" in md

    def test_unmapped_code_is_replacement_not_latin1(self):
        pdf = build_pdf([{"words": [
            {"text": "ab", "x": 72.0, "y": 700.0,
             "size": 12.0, "font": "T1"}]}])
        # append a code outside /Differences into the shown string:
        # 'ab' maps to codes A,B — inject 'Z' (unassigned)
        broken = pdf.replace(b"(AB)", b"(ABZ)")
        assert broken != pdf
        (_, md), = pdf_to_pages(broken)
        assert "ab\N{REPLACEMENT CHARACTER}" in md

    def test_simple_font_differences_fallback_latin1(self):
        # a NON-Type3 simple font with /Differences: mapped codes
        # decode by name, unmapped codes keep their latin-1 meaning
        from lexoid_spark.kernels.pdf_md import _parse_font_obj

        fobj = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
                b"/Encoding << /Differences [65 /zero /one] >> >>")
        info = _parse_font_obj(fobj, {})
        assert info["enc_map"] == {65: "0", 66: "1"}
        assert not info["t3"]
