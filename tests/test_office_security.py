"""Path/zip-injection pins for the office kernels and parse() API
(reference behavior: tests/test_parser.py:414-436 — hostile filenames
must never execute or create paths; extended here to hostile OPC zip
member names, since the kernels read members by name in-memory).
"""

import io
import os
import zipfile

import pytest

from lexoid_spark.api import parse
from lexoid_spark.kernels.office_md import docx_to_md, sniff_office

MINIMAL_DOC_XML = (
    b'<?xml version="1.0"?>'
    b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
    b'wordprocessingml/2006/main"><w:body>'
    b"<w:p><w:r><w:t>safe text</w:t></w:r></w:p>"
    b"</w:body></w:document>"
)


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


@pytest.mark.parametrize(
    "sample",
    [
        "test$(mkdir -p path_injection_success).docx",
        "test; mkdir -p path_injection_success.docx",
        "test|mkdir -p path_injection_success.docx",
        "test&&mkdir -p path_injection_success.docx",
    ],
)
def test_parse_path_injection(sample, tmp_path, monkeypatch):
    """Hostile shell metacharacters in a filename must never create a
    directory — parse() opens paths directly, no shell ever sees them."""
    monkeypatch.chdir(tmp_path)
    dir_name = "path_injection_success"
    try:
        parse(sample)
    except Exception as e:
        assert isinstance(e, (FileNotFoundError, OSError)), e
    assert not os.path.exists(dir_name), "Path injection detected"


def test_docx_hostile_member_names_never_touch_fs(tmp_path, monkeypatch):
    """Zip members named ../../x or /abs/x must not escape: the kernel
    reads members by NAME in memory, never extracts to disk."""
    monkeypatch.chdir(tmp_path)
    payload = _zip_bytes({
        "word/document.xml": MINIMAL_DOC_XML,
        "../../escape.txt": b"evil",
        "/abs/escape.txt": b"evil",
        "word/../../deep.txt": b"evil",
    })
    assert sniff_office(payload) == "docx"
    md = docx_to_md(payload)
    assert "safe text" in md
    # nothing escaped into cwd, its parents, or absolute targets
    assert not os.path.exists(tmp_path / "escape.txt")
    assert not os.path.exists(tmp_path.parent / "escape.txt")
    assert not os.path.exists(tmp_path.parent.parent / "escape.txt")
    assert not os.path.exists("/abs/escape.txt")
    assert not os.path.exists(tmp_path / "deep.txt")
    assert os.listdir(tmp_path) == []


def test_hostile_zip_routes_to_quarantine_not_crash(spark, tmp_path,
                                                    monkeypatch):
    """A zip payload that is NOT a recognized OPC container (and
    carries traversal names) must land in the errors branch of the
    pipeline — quarantined, no task failure, no filesystem writes."""
    monkeypatch.chdir(tmp_path)
    from lexoid_spark.plans.extract import extract

    hostile = _zip_bytes({"../../pwn.txt": b"evil", "junk/x": b"y"})
    pages = spark.createDataFrame(
        [("zip://hostile", bytearray(hostile))], "url string, html binary")
    res = extract(pages, repartition=False)
    errs = res["errors"].collect()
    assert [r["url"] for r in errs] == ["zip://hostile"]
    assert res["extracted"].count() == 0
    assert not os.path.exists(tmp_path.parent / "pwn.txt")
    assert os.listdir(tmp_path) == []
