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
