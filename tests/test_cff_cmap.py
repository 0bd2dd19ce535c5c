"""CFF/Type1C charset parsing (kernels/cff_cmap.py) — the /FontFile3
text-recovery fallback for CID PDFs without /ToUnicode."""

import struct

import pytest

from lexoid_spark.kernels.cff_cmap import cff_build, gid_to_text


def _cidmap(s):
    return {ch: i + 1 for i, ch in enumerate(s)}


class TestRoundTrip:
    @pytest.mark.parametrize("fmt", [0, 2])
    def test_mixed_ascii_and_unicode(self, fmt):
        """ASCII chars resolve through standard SIDs, CJK through
        custom uniXXXX strings — both paths in one font."""
        m = _cidmap("HELO 09中文データ")
        got = gid_to_text(cff_build(m, charset_format=fmt))
        assert got == {g: ch for ch, g in m.items()}

    def test_ascii_only_uses_no_custom_strings(self):
        prog = cff_build(_cidmap("ABC xyz42"))
        assert b"uni" not in prog  # all standard SIDs
        assert gid_to_text(prog) == {g: ch for ch, g in
                                     _cidmap("ABC xyz42").items()}

    def test_agl_typographic_quotes(self):
        """SIDs 8/65 are quoteright/quoteleft → U+2019/U+2018 per the
        Adobe Glyph List, NOT the ASCII bytes at those positions."""
        m = _cidmap("’‘")
        assert gid_to_text(cff_build(m)) == {1: "’", 2: "‘"}


class TestHostileInputs:
    @pytest.mark.parametrize("junk", [
        b"", b"\x00" * 10, b"\x01\x00\x04\x01" + b"\xff" * 40,
        b"\x02\x00\x04\x01" + b"\x00" * 40,  # CFF2 major version
    ])
    def test_never_raises(self, junk):
        assert gid_to_text(junk) == {}

    def test_cid_keyed_out_of_scope(self):
        """A Top DICT carrying /ROS (op 12 30) maps gid→CID, not
        gid→name — honestly refused with {}."""
        prog = bytearray(cff_build(_cidmap("AB")))
        # splice ROS operands+operator in front of the charset op by
        # rebuilding: easier to assert via the parser's dict layer —
        # construct a font whose top dict starts with 0 0 0 ROS
        from lexoid_spark.kernels.cff_cmap import (
            _build_index,
            _op29,
        )
        header = bytes((1, 0, 4, 1))
        name_ix = _build_index([b"X"])
        ros = (b"\x8b\x8b\x8b" + b"\x0c\x1e")  # 0 0 0 ROS
        top_ix = _build_index([ros + _op29(0) + b"\x0f"])
        assert gid_to_text(header + name_ix + top_ix
                           + _build_index([]) + _build_index([])) == {}

    def test_predefined_charset_out_of_scope(self):
        """charset offsets 0/1/2 are predefined tables, not byte
        ranges — returned as {}."""
        from lexoid_spark.kernels.cff_cmap import _build_index, _op29
        header = bytes((1, 0, 4, 1))
        top_ix = _build_index([_op29(0) + b"\x0f" + _op29(40) + b"\x11"])
        data = (header + _build_index([b"X"]) + top_ix
                + _build_index([]) + _build_index([]))
        assert gid_to_text(data) == {}

    def test_truncated_mid_structure(self):
        prog = cff_build(_cidmap("ABCDEFG"))
        assert gid_to_text(prog[:len(prog) // 2]) == {}


class TestPdfIntegration:
    @pytest.mark.parametrize("compress", [False, True])
    def test_cff_cid_pdf_text_recovery(self, compress):
        """Identity-H + /FontFile3 Type1C, no /ToUnicode: the page
        text must come back exactly via the charset route."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        words = [{"text": t, "x": 72.0 + 70.0 * j, "y": 700.0,
                  "size": 12.0, "font": "C1"}
                 for j, t in enumerate(["CFF", "ROUTE", "中文"])]
        pdf = build_pdf([{"words": words}], cid_tounicode=False,
                        cid_fontfile="cff", compress=compress)
        assert b"/FontFile3" in pdf and b"/ToUnicode" not in pdf
        assert pdf_to_pages(pdf)[0][1] == "CFF ROUTE 中文\n\n"

    def test_missing_program_falls_back_to_replacement(self):
        """Drop the /FontFile3 link: decode falls back to the "�"
        replacement instead of raising."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        words = [{"text": "AB", "x": 72.0, "y": 700.0,
                  "size": 12.0, "font": "C1"}]
        pdf = build_pdf([{"words": words}], cid_tounicode=False,
                        cid_fontfile="cff")
        broken = pdf.replace(b"/FontFile3", b"/FontFileX")
        out = pdf_to_pages(broken)[0][1]
        assert "�" in out and "AB" not in out


class TestAglNameEdges:
    def test_surrogate_names_rejected(self):
        """uniD834 etc. must NOT map to lone surrogates (they'd crash
        the first UTF-8 encode downstream) — AGL excludes them."""
        from lexoid_spark.kernels.cff_cmap import _name_to_char

        assert _name_to_char("uniD834") is None
        assert _name_to_char("uD800") is None
        assert _name_to_char("u110000") is None  # beyond U+10FFFF

    def test_five_digit_u_form(self):
        from lexoid_spark.kernels.cff_cmap import _name_to_char

        assert _name_to_char("u10330") == "\U00010330"
        assert _name_to_char("u0041") == "A"
        assert _name_to_char("uni0041") == "A"


class TestCidKeyed:
    """CID-keyed CFF (/ROS) charset walk (VERDICT r04 task 7): with
    /Ordering (UCS2) the CID is the UCS-2 code point and text
    recovers; other collections honestly return {}."""

    def test_roundtrip_formats(self):
        from lexoid_spark.kernels.cff_cmap import cff_build_cid, gid_to_text

        cidmap = {ch: ord(ch) for ch in "数据Az9Ü"}
        for fmt in (0, 2):
            assert gid_to_text(cff_build_cid(cidmap, fmt)) == {
                ord(ch): ch for ch in cidmap}

    def test_non_ucs2_ordering_returns_empty(self):
        from lexoid_spark.kernels.cff_cmap import cff_build_cid, gid_to_text

        prog = cff_build_cid({ch: ord(ch) for ch in "数据"})
        assert gid_to_text(prog.replace(b"UCS2", b"GB1\x00")) == {}

    def test_builder_rejects_non_unicode_cids(self):
        import pytest as _pytest

        from lexoid_spark.kernels.cff_cmap import cff_build_cid

        with _pytest.raises(ValueError):
            cff_build_cid({"数": 1})

    def test_pdf_end_to_end(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.pdf_md import pdf_to_pages

        words = [{"text": "数据 查询", "x": 72.0, "y": 700.0,
                  "size": 12.0, "font": "C1"}]
        pdf = build_pdf([{"words": words}], cid_tounicode=False,
                        cid_fontfile="cff-cid")
        assert b"/CIDFontType0" in pdf and b"/ToUnicode" not in pdf
        (_, md), = pdf_to_pages(pdf)
        assert "数据" in md and "查询" in md
