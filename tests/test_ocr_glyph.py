"""Glyph-template OCR over real pixels (P5): render → codec → decode →
recognize must be the identity on the closed A-Z/0-9 glyph set, for
every glyph, at multiple scales, through all three real raster codecs
— and anything that doesn't segment into known templates quarantines.
Reference behavior shaped: parse_with_paddleocr
(static_parser.py:751-818)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lexoid_spark.kernels.ocr_glyph import (
    FONT,
    recognize_pixels,
    render_text,
    render_text_png,
)

ALL_GLYPHS = "".join(sorted(FONT))


class TestRoundTrip:
    @pytest.mark.parametrize("scale", [1, 2, 3])
    def test_every_glyph_every_scale(self, scale):
        text, _ = recognize_pixels(render_text(ALL_GLYPHS, scale=scale))
        assert text == ALL_GLYPHS

    def test_words_and_lines(self):
        msg = "DOC 42 OF 7 PAGES\nSECOND LINE 99"
        text, boxes = recognize_pixels(render_text(msg, scale=2))
        assert text == "DOC 42 OF 7 PAGES SECOND LINE 99"
        assert [b[0] for b in boxes] == msg.replace("\n", " ").split()
        # boxes normalized, reading order, line 2 below line 1
        for _w, (x0, y0, x1, y1) in boxes:
            assert 0 <= x0 < x1 <= 1 and 0 <= y0 < y1 <= 1
        assert boxes[4][1][1] < boxes[5][1][1]  # PAGES above SECOND

    def test_empty_and_blank(self):
        assert recognize_pixels(np.full((20, 20), 255, np.uint8)) == ("", [])

    def test_through_png_codec(self):
        from lexoid_spark.functions.multimodal import decode_image_pixels

        png = render_text_png("HELLO WORLD 123")
        text, _ = recognize_pixels(decode_image_pixels(png))
        assert text == "HELLO WORLD 123"

    def test_through_gif_codec(self):
        from lexoid_spark.kernels.gif_codec import gif_decode, gif_encode

        arr = render_text("GIF LZW 88", scale=2)
        rgb = np.repeat(arr[:, :, None], 3, axis=2)
        text, _ = recognize_pixels(gif_decode(gif_encode(rgb)))
        assert text == "GIF LZW 88"

    def test_through_lossy_jpeg(self):
        from lexoid_spark.kernels.jpeg_codec import jpeg_decode, jpeg_encode

        arr = render_text("JPEG SCAN 7", scale=4)
        text, _ = recognize_pixels(jpeg_decode(
            jpeg_encode(arr[:, :, None], quality=95)))
        assert text == "JPEG SCAN 7"


class TestMixedCase:
    def test_mixed_case_and_punctuation(self):
        msg = "Hello, world! Quick brown fox 3.14\nsecond line (50%) a+b=c"
        text, boxes = recognize_pixels(render_text(msg, scale=2))
        assert text == msg.replace("\n", " ")
        assert [b[0] for b in boxes] == msg.replace("\n", " ").split()

    def test_xheight_only_line(self):
        # no ascender/descender anchor: the offset search must still
        # pick the right cell alignment via strict-win total distance
        text, _ = recognize_pixels(render_text("ace race on.", scale=3))
        assert text == "ace race on."

    def test_small_noise_still_reads(self):
        """Sub-MARGIN noise (one flipped cell) reads correctly —
        nearest-template with a confidence margin replaces round-4's
        brittle exact match."""
        arr = render_text("TEXT NOISE", scale=2).copy()
        # margin=4px; flip blank cell (row 3, col 0) of the leading T
        arr[4 + 3 * 2:4 + 4 * 2, 4 + 0:4 + 2] = 0
        text, _ = recognize_pixels(arr)
        assert text == "TEXT NOISE"


class TestQuarantine:
    def test_heavy_noise_raises(self):
        """Above-threshold noise (4 flipped cells) quarantines — never
        a silent wrong read."""
        arr = render_text("TEXT NOISE", scale=2).copy()
        for r, c in [(1, 0), (1, 3), (3, 0), (5, 3)]:
            blk = arr[4 + r * 2:4 + (r + 1) * 2, 4 + c * 2:4 + (c + 1) * 2]
            arr[4 + r * 2:4 + (r + 1) * 2, 4 + c * 2:4 + (c + 1) * 2] = \
                np.where(blk < 128, 255, 0)
        with pytest.raises(ValueError, match="below confidence"):
            recognize_pixels(arr)

    def test_non_glyph_ink_raises(self):
        arr = np.full((40, 40), 255, np.uint8)
        arr[10:13, 5:33] = 0  # a 3-row rule, not a glyph band
        with pytest.raises(ValueError):
            recognize_pixels(arr)

    def test_renderer_rejects_unknown_char(self):
        with pytest.raises(ValueError, match="glyph font"):
            render_text("emdash —")


class TestExtractIntegration:
    def test_png_scan_routes_to_ocr(self, spark):
        """A real-PNG 'scanned page' document routes image → OCR and
        lands in extracted with the recognized text as raw."""
        from lexoid_spark.plans.extract import extract

        rows = [(f"http://scan.test/{i}",
                 render_text_png(f"PAGE {i} TEXT", scale=2))
                for i in range(4)]
        pages = spark.createDataFrame(
            rows, "url string, html binary"
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"),
            "html", F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
        out = extract(pages, run_id="glyphocr")["extracted"].collect()
        got = {r["url"]: (r["raw"], r["parser_used"]) for r in out}
        assert got == {
            f"http://scan.test/{i}": (f"PAGE {i} TEXT", "OCR_PARSE")
            for i in range(4)
        }


class TestScannedJpegPdf:
    """Scanner-output PDFs: a real JPEG embedded verbatim under
    /Filter /DCTDecode (ISO 32000-1 §7.4.8) — the wild scanned-doc
    layout the reference routes image-bearing-PDF → paddleocr
    (utils.py:591-612, static_parser.py:751-818)."""

    def test_dct_payload_survives_object_scan(self):
        """The binary JPEG body must come back bit-exact through the
        /Length-bounded object scan and the filter chain (DCTDecode is
        a passthrough there — the image layer owns the entropy
        decode)."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.jpeg_codec import jpeg_encode
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.pdf_md import pdf_image_payloads

        jpg = jpeg_encode(render_text("DCT OK", scale=2)[:, :, None],
                          quality=90)
        pdf = build_pdf([{"raster_images": [jpg]}])
        assert pdf_image_payloads(pdf) == [jpg]

    def test_scanned_jpeg_pdf_ocr_roundtrip(self):
        from lexoid_spark.corpus.gen import _pdf_scanned_jpeg, _rng
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        for i in (0, 7, 19):
            pages = ocr_pdf_to_pages(_pdf_scanned_jpeg(i, _rng(i)))
            assert [(p, t) for p, t, _b in pages] == [
                (1, f"JPEG SCAN {i} BAND {i % 5} OK")
            ]

    def test_scanned_jpeg_pdf_routes_to_ocr(self, spark):
        """Full extract() plan: sniff → has_image flag → OCR arm →
        JPEG entropy decode → glyph recognition, distributed."""
        from lexoid_spark.corpus.gen import _pdf_scanned_jpeg, _rng
        from lexoid_spark.plans.extract import extract

        rows = [(f"http://scanpdf.test/{i}", _pdf_scanned_jpeg(i, _rng(i)))
                for i in range(3)]
        pages = spark.createDataFrame(
            rows, "url string, html binary"
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"),
            "html", F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
        out = extract(pages, run_id="jpegpdf")["extracted"].collect()
        got = {r["url"]: (r["raw"], r["parser_used"]) for r in out}
        assert got == {
            f"http://scanpdf.test/{i}":
                (f"JPEG SCAN {i} BAND {i % 5} OK", "OCR_PARSE")
            for i in range(3)
        }


class TestScannedFlatePdf:
    """Lossless scanner-output PDFs: raw 8-bit /DeviceGray samples
    under /Filter /FlateDecode, plain and PNG-predicted
    (/DecodeParms /Predictor 15)."""

    @pytest.mark.parametrize("pred", [1, 15])
    def test_flate_raster_ocr_roundtrip(self, pred):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("FLATE 3\nROW 1", scale=2)
        pdf = build_pdf(
            [{"raster_images": [{"gray": arr, "predictor": pred}]}])
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "FLATE 3 ROW 1")]

    def test_mixed_lossy_and_lossless_pages(self):
        """One DCTDecode JPEG + one Flate raster in a single PDF:
        two logical pages, each through its own decode arm."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.jpeg_codec import jpeg_encode
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        jpg = jpeg_encode(render_text("LOSSY", scale=4)[:, :, None],
                          quality=95)
        arr = render_text("LOSSLESS", scale=2)
        pdf = build_pdf([{"raster_images": [
            jpg, {"gray": arr, "predictor": 15}]}])
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "LOSSY"), (2, "LOSSLESS")]

    def test_undecodable_raster_quarantines(self):
        """A raw raster with an unsupported bit depth is skipped; a
        PDF with ONLY such images raises (→ quarantine), never a
        silent empty parse."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("X", scale=2)
        pdf = build_pdf(
            [{"raster_images": [{"gray": arr, "predictor": 1}]}])
        broken = pdf.replace(b"/BitsPerComponent 8", b"/BitsPerComponent 4")
        with pytest.raises(ValueError):
            ocr_pdf_to_pages(broken)


class TestIndexedRasters:
    """/Indexed palette image XObjects: samples are palette indices at
    1/2/4/8 bits; decode requires a real palette lookup (the 8-bit
    fixture maps ink to slot 5 and background to slot 200 of an
    otherwise-uniform palette, so passthrough reads garbage)."""

    @pytest.mark.parametrize("bpc", [1, 2, 4, 8])
    def test_indexed_palette_ocr(self, bpc):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("PALETTE 3\nROW 2", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr, "indexed": bpc}]}])
        assert b"/Indexed /DeviceRGB" in pdf
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "PALETTE 3 ROW 2")]

    def test_short_palette_skipped(self):
        """A palette shorter than hival+1 entries is unsupported →
        the raster is skipped and an image-only PDF quarantines."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("X", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr, "indexed": 8}]}])
        bad = pdf.replace(b"/Indexed /DeviceRGB 255", b"/Indexed /DeviceRGB 999")
        with pytest.raises(ValueError):
            ocr_pdf_to_pages(bad)
