"""JPEG 2000 (ITU-T T.800) kernel tests: 5/3 DWT, EBCOT Tier-1,
tag-tree and full-codestream round-trips over adversarial images,
typed-error behavior on malformed/out-of-scope streams, and the
scanned-PDF OCR arm end to end (mirrors tests/test_jbig2.py)."""

import struct

import numpy as np
import pytest

from lexoid_spark.kernels.jpx import (
    _GAIN,
    _GUARD_BITS,
    JpxError,
    _dwt53_fwd,
    _dwt53_inv,
    _t1_decode_block,
    _t1_encode_block,
    jp2_wrap,
    jpx_decode,
    jpx_encode,
)


class TestDwt53:
    @pytest.mark.parametrize("shape", [(1, 1), (1, 7), (7, 1), (8, 8),
                                       (13, 37), (31, 57)])
    @pytest.mark.parametrize("levels", [0, 1, 3])
    def test_reversible(self, shape, levels):
        rng = np.random.default_rng(sum(shape) + levels)
        img = rng.integers(-300, 300, shape).astype(np.int32)
        assert np.array_equal(_dwt53_inv(_dwt53_fwd(img, levels)), img)


class TestTier1:
    @pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
    def test_block_roundtrip(self, band):
        rng = np.random.default_rng(ord(band[0]))
        max_bp = _GUARD_BITS + 8 + _GAIN[band] - 1
        for shape, mag in [((7, 9), 5), ((32, 32), 100), ((64, 5), 400)]:
            coef = rng.integers(-mag, mag + 1, shape).astype(np.int32)
            coef[0, 0] = mag          # never all-zero
            data, zbp, np_ = _t1_encode_block(coef, band, max_bp)
            out = _t1_decode_block(data, *shape, band, zbp, np_, max_bp)
            assert np.array_equal(out, coef), (band, shape, mag)

    def test_sparse_block(self):
        coef = np.zeros((64, 64), np.int32)
        coef[3, 7] = -200
        coef[60, 1] = 1
        data, zbp, np_ = _t1_encode_block(coef, "HH", 11)
        assert np.array_equal(
            _t1_decode_block(data, 64, 64, "HH", zbp, np_, 11), coef)


class TestCodestream:
    @pytest.mark.parametrize("levels", [0, 1, 2, 3])
    def test_gray_roundtrip(self, levels):
        rng = np.random.default_rng(levels)
        img = rng.integers(0, 256, (33, 47)).astype(np.uint8)
        assert np.array_equal(jpx_decode(jpx_encode(img, levels=levels)),
                              img)

    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (21, 30, 3)).astype(np.uint8)
        assert np.array_equal(jpx_decode(jpx_encode(img)), img)

    def test_jp2_container(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
        cs = jpx_encode(img)
        wrapped = jp2_wrap(cs, 24, 16, 1)
        assert wrapped[:8] == b"\x00\x00\x00\x0cjP  "
        assert np.array_equal(jpx_decode(wrapped), img)

    def test_mostly_white_compresses(self):
        img = np.full((64, 200), 255, np.uint8)
        img[30:34, 90:110] = 0
        cs = jpx_encode(img)
        # empty code-blocks must be excluded, not coded
        assert len(cs) < 64 * 200 // 8

    def test_glyph_text_roundtrip(self):
        from lexoid_spark.kernels.ocr_glyph import (
            recognize_pixels,
            render_text,
        )

        text = "JPX OK 42"
        arr = render_text(text, scale=2)
        out = jpx_decode(jpx_encode(arr))
        assert recognize_pixels(out)[0] == text


class TestTypedErrors:
    def test_fuzz_random_bytes_terminate_typed(self):
        rng = np.random.default_rng(77)
        for n in (0, 1, 7, 64, 513):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                jpx_decode(blob)
            except JpxError:
                pass  # typed, never a hang or foreign exception

    def test_fuzz_corrupted_valid_stream(self):
        rng = np.random.default_rng(78)
        img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        cs = bytearray(jpx_encode(img))
        for _ in range(40):
            i = int(rng.integers(2, len(cs)))
            mut = bytearray(cs)
            mut[i] ^= int(rng.integers(1, 256))
            try:
                out = jpx_decode(bytes(mut))
                assert out.dtype == np.uint8   # decoded to SOME image
            except JpxError:
                pass

    def test_irreversible_wavelet_quarantines(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jpx_encode(img, levels=1))
        # COD wavelet byte is the last of the 10-byte COD content
        i = cs.find(struct.pack(">H", 0xFF52))
        cs[i + 4 + 9] = 0     # 9/7 irreversible
        with pytest.raises(JpxError, match="5/3"):
            jpx_decode(bytes(cs))

    def test_multi_tile_quarantines(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jpx_encode(img, levels=1))
        i = cs.find(struct.pack(">H", 0xFF51))
        # shrink XTsiz (offset: marker 2 + Lsiz 2 + Rsiz 2 + 4*4)
        struct.pack_into(">I", cs, i + 6 + 16, 4)
        with pytest.raises(JpxError, match="tile"):
            jpx_decode(bytes(cs))

    def test_hostile_dims_capped(self):
        img = np.zeros((8, 8), np.uint8)
        cs = bytearray(jpx_encode(img, levels=0))
        i = cs.find(struct.pack(">H", 0xFF51))
        struct.pack_into(">II", cs, i + 6, 1 << 20, 1 << 20)
        struct.pack_into(">II", cs, i + 6 + 16, 1 << 20, 1 << 20)
        with pytest.raises(JpxError):
            jpx_decode(bytes(cs))


class TestScannedPdfOcr:
    @pytest.mark.parametrize("codec", ["jpx", "jpx-jp2"])
    def test_jpx_scanned_pdf_ocr(self, codec):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("JPX FAX 9\nrow 2 ok", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr,
                                             "codec": codec}]}])
        assert b"/JPXDecode" in pdf
        (page, text, boxes), = ocr_pdf_to_pages(pdf)
        assert page == 1 and text == "JPX FAX 9 row 2 ok"
        assert boxes

    def test_corrupt_jpx_quarantines(self):
        from lexoid_spark.kernels.ocr_stub import _jpx_raster_array

        hdr = (b"<< /Subtype /Image /Width 8 /Height 8 /Filter "
               b"/JPXDecode >>")
        with pytest.raises(ValueError, match="undecodable JPX"):
            _jpx_raster_array(hdr, b"\x00\x01\x02garbage")

    def test_dims_cross_check(self):
        from lexoid_spark.kernels.ocr_stub import _jpx_raster_array

        img = np.zeros((8, 8), np.uint8)
        cs = jpx_encode(img)
        hdr = (b"<< /Subtype /Image /Width 9 /Height 8 /Filter "
               b"/JPXDecode >>")
        with pytest.raises(ValueError, match="contradicts"):
            _jpx_raster_array(hdr, cs)


class TestStandaloneImageSurface:
    def test_image_header_and_pixels(self):
        from lexoid_spark.functions.multimodal import (
            decode_image_header,
            decode_image_pixels,
        )

        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (18, 26)).astype(np.uint8)
        cs = jpx_encode(img)
        assert decode_image_header(cs) == (26, 18, 1)
        assert np.array_equal(decode_image_pixels(cs), img)
        wrapped = jp2_wrap(cs, 26, 18, 1)
        assert decode_image_header(wrapped) == (26, 18, 1)
        assert np.array_equal(decode_image_pixels(wrapped), img)

    def test_image_doc_routes_to_ocr(self):
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_image_to_page

        arr = render_text("JP2 IMAGE DOC", scale=2)
        text, boxes = ocr_image_to_page(jpx_encode(arr))
        assert text == "JP2 IMAGE DOC" and boxes

    def test_sniff_classifies_jp2_as_image(self, spark):
        from lexoid_spark.kernels.pdf_md import sniff_doctype
        from lexoid_spark.operators.routing import with_doctype

        img = np.zeros((8, 8), np.uint8)
        payloads = [jpx_encode(img), jp2_wrap(jpx_encode(img), 8, 8, 1)]
        # kernel twin
        assert [sniff_doctype(p) for p in payloads] == ["image", "image"]
        # native column twin must agree
        df = spark.createDataFrame([(p,) for p in payloads],
                                   "html binary")
        out = with_doctype(df).select("doctype").collect()
        assert [r[0] for r in out] == ["image", "image"]


def test_dwt_right_edge_extension_is_spec():
    """Whole-sample symmetric extension X(N) = X(N-2): for an
    even-length signal the predict step's right neighbor is the LAST
    even sample (T.800 §F.3) — d[1] of [0,0,2,4] must be 2, not the
    3 a mirrored-one-too-far extension produces. Self round-trips
    cannot catch this (fwd and inv share the extension)."""
    from lexoid_spark.kernels.jpx import _dwt53_fwd_1d

    _s, d = _dwt53_fwd_1d(np.array([[0, 0, 2, 4]], dtype=np.int32))
    assert int(d[0, 1]) == 2


def test_jpx_header_is_cheap_and_exact():
    from lexoid_spark.kernels.jpx import jpx_header

    img = np.zeros((18, 26), np.uint8)
    cs = jpx_encode(img)
    assert jpx_header(cs) == (26, 18, 1)
    assert jpx_header(jp2_wrap(cs, 26, 18, 1)) == (26, 18, 1)
    assert jpx_header(b"not a codestream") is None


def test_hostile_qcd_depth_quarantines():
    img = np.zeros((8, 8), np.uint8)
    cs = bytearray(jpx_encode(img, levels=0))
    i = cs.find(struct.pack(">H", 0xFF5C))
    cs[i + 5] = 31 << 3        # exponent 31 → Mb way past int32
    with pytest.raises(JpxError, match="coefficient depth"):
        jpx_decode(bytes(cs))
