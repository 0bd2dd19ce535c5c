"""BOM-aware decode + routing: UTF-16 web pages must sniff, route,
and extract identically to their UTF-8 twins (text_ops.decode_payload,
the kernel sniff's BOM branch, and routing.with_doctype's native
mirror)."""

import pytest
from pyspark.sql import functions as F

from lexoid_spark.kernels.html_md import html_to_md
from lexoid_spark.kernels.pdf_md import sniff_doctype
from lexoid_spark.kernels.text_ops import decode_payload

HTML = "<html><body><h1>Wide</h1><p>naïve café text</p></body></html>"


def _u16(s, be=False):
    return ((b"\xfe\xff" + s.encode("utf-16-be")) if be
            else (b"\xff\xfe" + s.encode("utf-16-le")))


def _u32(s, be=False):
    import codecs
    return ((codecs.BOM_UTF32_BE + s.encode("utf-32-be")) if be
            else (codecs.BOM_UTF32_LE + s.encode("utf-32-le")))


class TestDecodePayload:
    def test_utf16_le_be_and_utf8_bom(self):
        assert decode_payload(_u16(HTML)) == HTML
        assert decode_payload(_u16(HTML, be=True)) == HTML
        assert decode_payload(b"\xef\xbb\xbf" + HTML.encode()) == HTML

    def test_plain_utf8_and_invalid_bytes(self):
        assert decode_payload(HTML.encode()) == HTML
        assert decode_payload(b"a\xff\xfeb" ) == "ab"  # mid-doc junk ignored

    def test_utf32(self):
        import codecs
        assert decode_payload(
            codecs.BOM_UTF32_LE + HTML.encode("utf-32-le")) == HTML

    def test_none_and_empty(self):
        assert decode_payload(None) == ""
        assert decode_payload(b"") == ""


class TestBomSniff:
    CASES = [
        (_u16(HTML), "html"),
        (_u16(HTML, be=True), "html"),
        (_u16("name,qty\na,1"), "csv"),
        (_u16("just words here"), "txt"),
        (HTML.encode(), "html"),
        # UTF-32 BOMs: the LE one (FF FE 00 00) starts with the
        # UTF-16-LE BOM, so the 4-byte probe must win or the page
        # decodes to NUL-interleaved garbage and routes to txt
        (_u32(HTML), "html"),
        (_u32(HTML, be=True), "html"),
        (_u32("name,qty\na,1"), "csv"),
        (_u32("just words here", be=True), "txt"),
    ]

    def test_kernel_sniff(self):
        for payload, want in self.CASES:
            assert sniff_doctype(payload) == want, payload[:20]

    def test_native_sniff_matches_kernel(self, spark):
        from lexoid_spark.operators.routing import with_doctype

        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, (p, _) in enumerate(self.CASES)],
            "i long, html binary")
        got = {r["i"]: r["doctype"] for r in with_doctype(df).collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, self.CASES[i][0][:20]


class TestUtf16Extraction:
    def test_kernel_output_matches_utf8_twin(self):
        assert html_to_md(_u16(HTML)) == html_to_md(HTML.encode()) != ""

    def test_pipeline_extracts_utf16_class(self, spark):
        from lexoid_spark.corpus.gen import pages_df
        from lexoid_spark.plans.extract import extract

        pages = pages_df(spark, 60).filter(
            F.col("url").contains("html_utf16"))
        assert pages.count() >= 1
        out = extract(pages, repartition=False)["extracted"].collect()
        assert out and all("Wide" in r["raw"] for r in out)
        errs = extract(pages, repartition=False)["errors"].count()
        assert errs == 0


class TestCharsetSniff:
    """WHATWG-style meta-charset sniff (text_ops.sniff_decode_html):
    the reference reaches the same behavior class via BeautifulSoup's
    UnicodeDammit + iso-8859-1 retry (utils.py:356-363)."""

    def test_declared_windows_1252_decodes_exactly(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        body = b'<html><head><meta charset="windows-1252"></head>' \
               b"<body><p>\x93caf\xe9\x94 \x97 dash</p></body></html>"
        got = sniff_decode_html(body)
        assert "“caf\xe9” — dash" in got

    def test_iso_8859_1_label_means_windows_1252(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        body = (b"<meta http-equiv='Content-Type' "
                b"content='text/html; charset=iso-8859-1'>"
                b"<p>tr\xe8s \x85 bien</p>")
        # 0x85 is undefined in real iso-8859-1 prose; wild pages mean
        # cp1252's ellipsis - exactly why WHATWG aliases the label
        assert "tr\xe8s … bien" in sniff_decode_html(body)

    def test_bom_beats_meta(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        s = '<meta charset="windows-1252"><p>caf\xe9</p>'
        assert sniff_decode_html(b"\xef\xbb\xbf" + s.encode()) == s

    def test_unsupported_declared_charset_quarantines(self):
        from lexoid_spark.kernels.text_ops import (
            CharsetError, sniff_decode_html)

        body = b'<meta charset="shift_jis"><p>\x83e\x83L\x83X\x83g</p>'
        with pytest.raises(CharsetError):
            sniff_decode_html(body)
        with pytest.raises(CharsetError):
            html_to_md(body)  # the html arm propagates -> quarantine

    def test_undeclared_invalid_utf8_falls_back_total_1252(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        # errors='ignore' used to DROP the byte; 1252 keeps a char
        assert sniff_decode_html(b"<p>caf\xe9</p>") == "<p>caf\xe9</p>"

    def test_meta_outside_prescan_window_is_ignored(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        body = (b"<!--" + b"x" * 1024 + b"-->"
                b'<meta charset="shift_jis"><p>ok</p>')
        assert "ok" in sniff_decode_html(body)  # no CharsetError

    def test_meta_utf16_label_means_utf8(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        body = '<meta charset="utf-16"><p>caf\xe9</p>'.encode()
        assert "caf\xe9" in sniff_decode_html(body)

    def test_valid_utf8_without_meta_unchanged(self):
        from lexoid_spark.kernels.text_ops import sniff_decode_html

        assert sniff_decode_html(HTML.encode()) == HTML
