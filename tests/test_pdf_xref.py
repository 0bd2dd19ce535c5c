"""PDF 1.5 xref streams + CID/Type0 fonts (kernels/pdf_md.py).

Reference behavior: pdfplumber resolves both transparently
(static_parser.py:700-727); here the from-scratch tokenizer must (a)
read predictor-filtered cross-reference streams as the object index,
(b) decode Identity-H 2-byte CID strings through /ToUnicode CMaps with
/W width tables.
"""

import zlib

import pytest

import lexoid_spark.kernels.pdf_md as K
from lexoid_spark.corpus.gen import _pdf_cid, _pdf_xrefstm, _rng
from lexoid_spark.corpus.pdf_gen import build_pdf


def _cid_pdf(texts, **kw):
    words = [
        {"text": t, "x": 72.0 + 120.0 * j, "y": 700.0, "size": 12.0,
         "font": "C1"}
        for j, t in enumerate(texts)
    ]
    return build_pdf([{"words": words}], **kw)


class TestXrefStream:
    def test_index_parses_types_and_predictor(self):
        b = _pdf_xrefstm(0, _rng(0))
        idx = K._parse_xref_index(b)
        assert idx, "xref stream index must parse"
        kinds = {v[0] for v in idx.values()}
        assert kinds == {"d", "c"}  # direct + ObjStm-member entries
        # every direct offset points at an object header
        for v in idx.values():
            if v[0] == "d":
                assert K._OBJ_HEAD_RE.search(b, v[1], v[1] + 64)

    def test_classic_table_returns_empty(self):
        b = build_pdf([{"words": [
            {"text": "hi", "x": 72, "y": 700, "size": 12, "font": "F1"}]}])
        assert K._parse_xref_index(b) == {}
        assert K._objects_via_xref(b) == {}

    def test_xref_index_is_load_bearing(self, monkeypatch):
        """The fixture embeds b'\\nendstream' AND b'endobj' inside a
        literal string with /Length indirect: the sequential scan
        truncates the content object; only the xref index reads it."""
        b = _pdf_xrefstm(0, _rng(0))
        full = K.pdf_to_md(b)
        assert "trap\nendstream endobj marker" in full
        monkeypatch.setattr(K, "_objects_via_xref", lambda data: {})
        broken = K.pdf_to_md(b)
        assert "marker" not in broken
        assert broken != full

    def test_png_predictor_roundtrip(self):
        rows = [bytes([1, 0, 0, 0, 40, 0, 0]),
                bytes([1, 0, 0, 0, 90, 0, 1]),
                bytes([2, 0, 0, 1, 44, 0, 3])]
        filtered = bytearray()
        prev = bytes(7)
        for r in rows:
            filtered.append(2)  # Up
            filtered += bytes((r[i] - prev[i]) & 0xFF for i in range(7))
            prev = r
        assert K._apply_png_predictor(bytes(filtered), 7) == b"".join(rows)

    def test_extracts_match_generation(self):
        for i in range(4):
            md = K.pdf_to_md(_pdf_xrefstm(i, _rng(i)))
            assert f"Xref{i}" in md and "marker" in md


class TestCidFonts:
    def test_tounicode_decode(self):
        md = K.pdf_to_md(_cid_pdf(["数据", "查询"], compress=True))
        assert "数据 查询" in md

    def test_cid_widths_drive_word_boxes(self):
        # /W gives CID c width 600 + 50*(c % 4); chars sorted → CIDs
        b = _cid_pdf(["数据"], compress=True)
        pages = K.parse_pdf(b)
        (w,) = pages[0].words
        # "数" < "据" in code-point order? cidmap sorts chars:
        chars = sorted("数据")
        cids = {ch: i + 1 for i, ch in enumerate(chars)}
        expect = sum(600 + 50 * (cids[ch] % 4) for ch in "数据") / 1000.0 * 12.0
        assert w["x1"] - w["x0"] == pytest.approx(expect)
        assert w["text"] == "数据"

    def test_unmapped_cid_is_replacement_char(self):
        # build then strip the ToUnicode object → decode falls back
        b = _cid_pdf(["好"], compress=False)
        b2 = b.replace(b"beginbfchar", b"beginXXchar")
        md = K.pdf_to_md(b2)
        assert "�" in md

    def test_bfrange_forms(self):
        data = (b"2 beginbfrange\n"
                b"<0001> <0003> <0041>\n"
                b"<0010> <0011> [<0058> <0059>]\n"
                b"endbfrange")
        cmap = K._parse_tounicode(data)
        assert cmap[1] == "A" and cmap[2] == "B" and cmap[3] == "C"
        assert cmap[0x10] == "X" and cmap[0x11] == "Y"

    def test_flate_compressed_tounicode(self):
        b = _cid_pdf(["索引"], compress=True)
        assert b"/FlateDecode" in b
        assert "索引" in K.pdf_to_md(b)

    def test_fixture_class_deterministic(self):
        assert _pdf_cid(3, _rng(3)) == _pdf_cid(3, _rng(3))
        md = K.pdf_to_md(_pdf_cid(3, _rng(3)))
        assert "cid3" in md


class TestSimpleWidths:
    def test_widths_array_overrides_heuristic(self):
        # a Type1 font carrying /FirstChar + /Widths: x1 must follow it
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /FirstChar 65 /Widths [1000 500] >>\nendobj\n"
            b"2 0 obj\n<< /Length 34 >>\nstream\n"
            b"BT /F9 10 Tf 0 700 Td (AB) Tj ET\nendstream\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F9 1 0 R >> >> /Contents 2 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"5 0 obj\n<< /Type /Catalog /Pages 4 0 R >>\nendobj\n"
            b"trailer\n<< /Size 6 /Root 5 0 R >>\n"
        )
        pages = K.parse_pdf(pdf)
        (w,) = pages[0].words
        assert w["text"] == "AB"
        # (1000 + 500)/1000 * size 10 = 15.0 (heuristic would give 10.0)
        assert w["x1"] - w["x0"] == pytest.approx(15.0)


class TestPipeline:
    def test_new_classes_extract_clean(self, spark):
        from pyspark.sql import functions as F

        from lexoid_spark.corpus.gen import pages_df
        from lexoid_spark.plans.extract import extract

        pages = pages_df(spark, 78).filter(
            F.col("url").contains("pdf_cid") | F.col("url").contains(
                "pdf_xrefstm"))
        n = pages.count()
        assert n >= 4
        res = extract(pages, repartition=False)
        assert res["errors"].count() == 0
        rows = res["extracted"].collect()
        assert len(rows) == n
        from lexoid_spark.corpus.gen import golden_raw_for_row
        pay = {r["url"]: bytes(r["html"]) for r in pages.collect()}
        for r in rows:
            assert r["raw"] == golden_raw_for_row(r["url"], pay[r["url"]]), (
                r["url"])
