"""Single-document parse() API + CLI (reference api.parse shape,
api.py:137-145 dict keys; cli.py stdout/stderr separation,
tests/test_cli.py:41-352 analogues)."""

import json
import os
import subprocess
import sys

import pytest

from lexoid_spark.api import parse
from lexoid_spark.corpus.gen import gen_page_row, golden_raw_for_row

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_KEYS = {
    "raw", "segments", "title", "url", "parent_title", "recursive_docs",
    "token_usage", "parser_used", "parsers_used",
}


def _fixture(i):
    url, _ts, payload, _t, _l = gen_page_row(i)
    return url, payload


def test_parse_bytes_matches_pipeline_golden():
    url, payload = _fixture(0)
    doc = parse(payload)
    assert set(doc) == EXPECTED_KEYS
    assert doc["raw"] == golden_raw_for_row(url, payload)
    assert doc["parser_used"] == "STATIC_PARSE"
    assert doc["token_usage"] == {
        "input": 0, "output": 0, "llm_page_count": 0, "total": 0}
    assert doc["segments"] and "content" in doc["segments"][0]
    assert "metadata" in doc["segments"][0]


def test_parse_path_sets_title(tmp_path):
    _url, payload = _fixture(1)
    p = tmp_path / "sample.html"
    p.write_bytes(payload)
    doc = parse(str(p))
    assert doc["title"] == "sample.html"
    assert doc["url"] == ""


def test_parse_every_fixture_class():
    from lexoid_spark.corpus.gen import ALL_CLASSES

    for i in range(len(ALL_CLASSES)):
        url, payload = _fixture(i)
        doc = parse(payload)
        assert doc["raw"] == golden_raw_for_row(url, payload), url


def test_parse_rejects_llm_parser_type():
    with pytest.raises(ValueError):
        parse(b"<html></html>", parser_type="LLM_PARSE")


def test_cli_markdown_and_json(tmp_path):
    _url, payload = _fixture(0)
    p = tmp_path / "doc.html"
    p.write_bytes(payload)

    r = subprocess.run(
        [sys.executable, "-m", "lexoid_spark", "parse", "-i", str(p)],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert r.returncode == 0
    assert r.stdout.strip() == parse(payload)["raw"].strip()

    r2 = subprocess.run(
        [sys.executable, "-m", "lexoid_spark", "parse", "-i", str(p),
         "--format", "json"],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    doc = json.loads(r2.stdout)
    assert set(doc) == EXPECTED_KEYS


def test_cli_missing_file_errors_to_stderr(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "lexoid_spark", "parse", "-i",
         str(tmp_path / "nope.html")],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert r.returncode == 1
    assert r.stdout == ""
    assert "error" in r.stderr.lower()


def test_parse_knob_passthrough():
    from lexoid_spark.api import parse
    from lexoid_spark.corpus.pdf_gen import build_pdf, words_line

    pdf = build_pdf([{"words": words_line(["fast", "arm"], 700)}],
                    compress=True)
    assert parse(pdf)["raw"] == "fast arm\n\n"
    assert parse(pdf, pdf_framework="pdfminer")["raw"] == "fast arm"

    html = b"<html><body><nav>chrome</nav><p>body text</p></body></html>"
    assert "chrome" in parse(html)["raw"]
    assert "chrome" not in parse(html, html_main_content=True)["raw"]
