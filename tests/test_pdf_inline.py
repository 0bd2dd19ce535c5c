"""BI/ID/EI inline images (ISO 32000-1 §8.9.7): every wild layout
must round-trip through the OCR arm, the text interpreter must
reroute (never garble) documents carrying one, and malformed inline
images must quarantine. The reference's has-image byte scan
(utils.py:467-481) misses inline images entirely — surfacing them is
a deliberate capability add (VERDICT r04 task 2)."""

import pytest
from pyspark.sql import functions as F

from lexoid_spark.corpus.pdf_gen import build_pdf
from lexoid_spark.kernels.ocr_glyph import render_text
from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages
from lexoid_spark.kernels.pdf_md import (
    PdfInlineImageError,
    pdf_flags,
    pdf_inline_images,
    pdf_to_pages,
)

MSG = "INLINE 7\nrow two ok."


def _render():
    return render_text(MSG, scale=2)


class TestRoundTrip:
    @pytest.mark.parametrize("spec", [
        {"gray": None},                      # Flate with /L
        {"gray": None, "predictor": 15},     # PNG-predicted Flate
        {"gray": None, "codec": "g4"},       # CCITT G4 via /CCF
        {"gray": None, "raw": True},         # unfiltered, NO /L
    ], ids=["flate", "pred15", "g4", "raw-no-L"])
    def test_layouts(self, spec):
        spec = dict(spec, gray=_render())
        pdf = build_pdf([{"inline_images": [spec]}])
        assert len(pdf_inline_images(pdf)) == 1
        assert [(p, t) for p, t, _ in ocr_pdf_to_pages(pdf)] == [
            (1, MSG.replace("\n", " "))]

    def test_dct_jpeg(self):
        from lexoid_spark.kernels.jpeg_codec import jpeg_encode

        jpg = jpeg_encode(_render()[:, :, None], quality=95)
        pdf = build_pdf([{"inline_images": [jpg]}])
        (header, payload), = pdf_inline_images(pdf)
        assert payload == jpg  # DCT payload verbatim through the lexer
        assert b"/DCTDecode" in header  # abbreviation expanded
        assert [(p, t) for p, t, _ in ocr_pdf_to_pages(pdf)] == [
            (1, MSG.replace("\n", " "))]

    def test_compressed_content_stream(self):
        pdf = build_pdf([{"inline_images": [{"gray": _render()}]}],
                        compress=True)
        assert [(p, t) for p, t, _ in ocr_pdf_to_pages(pdf)] == [
            (1, MSG.replace("\n", " "))]


class TestRouting:
    def test_byte_scan_cannot_see_inline(self):
        """Reference-parity pdf_flags stays blind to inline images —
        the reroute happens at the text interpreter instead."""
        pdf = build_pdf([{"inline_images": [{"gray": _render()}]}])
        assert pdf_flags(pdf) == (False, False)

    def test_text_interpreter_raises_typed(self):
        pdf = build_pdf([{"words": [{"text": "hi", "x": 72.0, "y": 700.0,
                                     "size": 12.0, "font": "F1"}],
                          "inline_images": [{"gray": _render()}]}])
        with pytest.raises(PdfInlineImageError):
            pdf_to_pages(pdf)

    def test_dispatch_reroutes_to_ocr(self):
        from lexoid_spark.functions.udfs import _extract_one

        pdf = build_pdf([{"words": [{"text": "hi", "x": 72.0, "y": 700.0,
                                     "size": 12.0, "font": "F1"}],
                          "inline_images": [{"gray": _render()}]}])
        raw, _segs, parser = _extract_one("pdf", pdf)
        assert parser == "OCR_PARSE"
        assert raw == MSG.replace("\n", " ")

    def test_extract_plan_routes_inline_pdf(self, spark):
        from lexoid_spark.plans.extract import extract

        rows = [(f"http://inline.test/{i}",
                 build_pdf([{"inline_images": [{"gray": render_text(
                     f"INLINE {i}", scale=2)}]}]))
                for i in range(3)]
        pages = spark.createDataFrame(
            rows, "url string, html binary"
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"),
            "html", F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
        out = extract(pages, run_id="inline")["extracted"].collect()
        got = {r["url"]: (r["raw"], r["parser_used"]) for r in out}
        assert got == {
            f"http://inline.test/{i}": (f"INLINE {i}", "OCR_PARSE")
            for i in range(3)
        }


class TestMalformed:
    def test_bi_without_id_raises(self):
        pdf = build_pdf([{"inline_images": [{"gray": _render()}]}])
        broken = pdf.replace(b"ID\n", b"XX\n", 1)
        with pytest.raises(ValueError):
            pdf_inline_images(broken)

    def test_length_beyond_stream_raises(self):
        pdf = build_pdf([{"inline_images": [{"gray": _render()}]}])
        broken = pdf.replace(b"/L ", b"/L 9")  # 10x the real length
        with pytest.raises(ValueError):
            pdf_inline_images(broken)

    def test_bad_flate_payload_raises(self):
        pdf = build_pdf([{"inline_images": [{"gray": _render()}]}])
        idx = pdf.index(b"ID\n") + 3
        broken = pdf[:idx] + b"\xff\xff\xff\xff" + pdf[idx + 4:]
        with pytest.raises(ValueError):
            pdf_inline_images(broken)


class TestOperatorLevelScan:
    """'BI' inside a string operand is data, not an operator — the
    raw-regex scan false-positived on it ('BI without ID') and
    quarantined clean text PDFs (review finding, round 5)."""

    def test_bi_inside_string_operand_is_not_an_image(self):
        pdf = build_pdf([{"words": [
            {"text": "A BI /Also (BI nested) fine", "x": 72.0,
             "y": 700.0, "size": 12.0, "font": "F1"},
        ]}])
        assert pdf_inline_images(pdf) == []
        (page, md), = pdf_to_pages(pdf)
        assert "A BI /Also" in md

    def test_bi_inside_comment_and_hexstring_skipped(self):
        pdf = build_pdf([{"words": [{"text": "ok", "x": 72.0,
                                     "y": 700.0, "size": 12.0,
                                     "font": "F1"}]}])
        # splice a comment and a hex string carrying ' BI ' into the
        # content stream ahead of the text — both are operand/comment
        # bytes, not operators
        marker = b"BT"
        i = pdf.index(marker)
        spliced = (pdf[:i] + b"% BI /W 8\n<20424920> "
                   + pdf[i:])
        # (content stream /Length is now stale — the lexer scans the
        # stream body by object boundaries, so parsing still works for
        # pdf_inline_images' page-stream walk)
        assert pdf_inline_images(spliced) == []

    def test_real_bi_after_string_decoy_still_found(self):
        spec = {"gray": _render()}
        pdf = build_pdf([{
            "words": [{"text": "decoy BI here", "x": 72.0, "y": 700.0,
                       "size": 12.0, "font": "F1"}],
            "inline_images": [spec],
        }])
        assert len(pdf_inline_images(pdf)) == 1
