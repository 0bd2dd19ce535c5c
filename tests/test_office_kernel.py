"""DOCX/XLSX kernels (SURVEY §2.1 S7/S8): zip sniff, paragraph join
semantics (reference static_parser.py:730-748 joins with "\\n"),
shared-string resolution, pipe-table parity with the CSV path, and the
end-to-end pipeline route for zip payloads."""

import pytest

from lexoid_spark.corpus.gen import _docx_doc, _rng, _xlsx_sheet
from lexoid_spark.kernels.office_md import (
    docx_to_md,
    sniff_office,
    xlsx_to_md,
)
from lexoid_spark.kernels.pdf_md import sniff_doctype


def test_sniff_office_discriminates():
    assert sniff_office(_docx_doc(1, _rng(1))) == "docx"
    assert sniff_office(_xlsx_sheet(1, _rng(1))) == "xlsx"
    assert sniff_office(b"PK\x03\x04garbage-not-a-zip") is None
    assert sniff_office(b"%PDF-1.4") is None
    assert sniff_office(None) is None


def test_sniff_doctype_zip_branch():
    assert sniff_doctype(_docx_doc(2, _rng(2))) == "zip"
    assert sniff_doctype(_xlsx_sheet(2, _rng(2))) == "zip"


def test_docx_paragraphs_joined_with_newline():
    md = docx_to_md(_docx_doc(7, _rng(7)))
    lines = md.split("\n")
    assert lines[0] == "docx document 7"
    assert len(lines) == 4
    assert all(l.strip() for l in lines)


def test_docx_runs_tabs_breaks():
    import io
    import zipfile

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{w}"><w:body>'
        '<w:p><w:r><w:t xml:space="preserve">a</w:t></w:r>'
        "<w:r><w:tab/><w:t>b</w:t></w:r>"
        "<w:r><w:br/><w:t>c</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("[Content_Types].xml", "<Types/>")
    assert docx_to_md(buf.getvalue()) == "a\tb\nc"


def test_xlsx_pipe_table_matches_grid():
    md = xlsx_to_md(_xlsx_sheet(5, _rng(5)))
    lines = md.split("\n")
    assert lines[0].startswith("| name")
    assert "qty" in lines[0]
    assert set(lines[1]) <= {"|", ":", "-", " "}
    assert len(lines) == 5  # header + sep + 3 rows
    assert "thing0" in lines[2]


def test_xlsx_numeric_right_aligned():
    md = xlsx_to_md(_xlsx_sheet(5, _rng(5)))
    sep_cells = md.split("\n")[1].strip("|").split("|")
    assert sep_cells[0].startswith(":")   # text col left-aligned
    assert sep_cells[1].endswith(":")     # numeric col right-aligned


def test_pipeline_routes_office_docs(spark):
    from lexoid_spark.corpus.gen import golden_raw_for_row, pages_df
    from lexoid_spark.plans.extract import extract

    # 30 docs cover all 17 classes incl. docx_doc and xlsx_sheet
    pages = pages_df(spark, 30)
    out = extract(pages, repartition=False)["extracted"]
    rows = {r["url"]: r["raw"] for r in out.collect()}
    office = [u for u in rows if "docx_doc" in u or "xlsx_sheet" in u]
    assert office, "corpus must include office docs"
    for url in office:
        payload = [
            p["html"] for p in pages.collect() if p["url"] == url
        ][0]
        assert rows[url] == golden_raw_for_row(url, payload)


def test_bad_zip_quarantined(spark):
    from lexoid_spark.plans.extract import extract

    pages = spark.createDataFrame(
        [("http://x/bad", b"PK\x03\x04notazip", "t", "en"),],
        "url string, html binary, text string, lang string",
    )
    res = extract(pages, repartition=False)
    assert res["extracted"].count() == 0
    errs = res["errors"].collect()
    assert len(errs) == 1 and "zip" in (errs[0]["error"] or "").lower() or (
        errs[0]["error"] is not None
    )


class TestEpub:
    """EPUB → markdown: container/OPF/spine resolution, chapter HTML
    conversion, typed errors and the extract-pipeline dispatch."""

    def _epub(self):
        from lexoid_spark.corpus.gen import make_test_epub

        return make_test_epub([("T One", "body one"),
                               ("T Two", "body two")])

    def test_spine_order_and_content(self):
        from lexoid_spark.kernels.office_md import epub_to_md, sniff_office

        ep = self._epub()
        assert sniff_office(ep) == "epub"
        md = epub_to_md(ep)
        assert md.index("T One") < md.index("T Two")
        assert "body one" in md and "body two" in md

    def test_spine_reorder_respected(self):
        """The SPINE, not the zip entry order, defines reading order."""
        import io
        import zipfile

        ep = bytearray(self._epub())
        # swap the itemrefs inside the OPF by rebuilding the zip
        with zipfile.ZipFile(io.BytesIO(bytes(ep))) as zf:
            entries = {n: zf.read(n) for n in zf.namelist()}
        opf = entries["OEBPS/content.opf"].decode()
        opf = opf.replace('<itemref idref="c0"/><itemref idref="c1"/>',
                          '<itemref idref="c1"/><itemref idref="c0"/>')
        entries["OEBPS/content.opf"] = opf.encode()
        from lexoid_spark.corpus.gen import _zip_bytes
        from lexoid_spark.kernels.office_md import epub_to_md

        md = epub_to_md(_zip_bytes(
            {k: v for k, v in entries.items()}))
        assert md.index("T Two") < md.index("T One")

    def test_missing_spine_entry_typed(self):
        from lexoid_spark.corpus.gen import _zip_bytes
        from lexoid_spark.kernels.office_md import epub_to_md

        import io
        import zipfile

        with zipfile.ZipFile(io.BytesIO(self._epub())) as zf:
            entries = {n: zf.read(n) for n in zf.namelist()}
        del entries["OEBPS/ch1.xhtml"]
        with pytest.raises(ValueError, match="missing"):
            epub_to_md(_zip_bytes(entries))

    def test_extract_dispatch(self):
        from lexoid_spark.functions.udfs import _extract_one

        raw, segs, parser = _extract_one("zip", self._epub())
        assert "body one" in raw and "body two" in raw
        assert parser == "STATIC_PARSE"
        # segment_md splits on ATX headings only (the reference's
        # split_md_by_headings semantics) — setext chapter titles
        # stay inside one segment, same as the html arm
        assert segs and all("content" in s for s in segs)
        assert "body one" in "".join(s["content"] for s in segs)
