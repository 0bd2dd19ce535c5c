"""TIFF 6.0 / BMP pixel codecs (kernels/tiff_codec.py): round-trips
across every compression arm (reusing the repo's own T.4/T.6 and LZW
decoders), strip/endian/photometric variations, hostile-input fuzz
(typed error, never a crash or garble), and the standalone-document
routing surface (sniff → OCR arm)."""

import struct

import numpy as np
import pytest

from lexoid_spark.kernels.tiff_bmp import bmp_header, tiff_header
from lexoid_spark.kernels.tiff_codec import (
    BmpError,
    TiffError,
    bmp_decode,
    bmp_encode_gray,
    tiff_decode,
    tiff_encode_gray,
)

ALL_COMPS = ["none", "packbits", "lzw", "lzw-pred",
             "mh", "g3", "g3-2d", "g4"]
CCITT = {"mh", "g3", "g3-2d", "g4"}


def _gray(h=37, w=53, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w)).astype(np.uint8)


def _bilevel(h=41, w=67, seed=9):
    r = np.random.RandomState(seed)
    return np.where(r.rand(h, w) < 0.3, 0, 255).astype(np.uint8)


class TestTiffRoundTrip:
    @pytest.mark.parametrize("comp", ALL_COMPS)
    @pytest.mark.parametrize("rps", [None, 10])
    def test_round_trip(self, comp, rps):
        src = _bilevel() if comp in CCITT else _gray()
        t = tiff_encode_gray(src, comp, rows_per_strip=rps)
        assert np.array_equal(tiff_decode(t), src)
        # the cheap header probe agrees with the pixel decode
        assert tiff_header(t) == (src.shape[1], src.shape[0], 1)

    def test_big_endian(self):
        src = _gray(11, 19)
        t = tiff_encode_gray(src, "packbits", big_endian=True)
        assert t[:4] == b"MM\x00*"
        assert np.array_equal(tiff_decode(t), src)

    def test_ccitt_binarizes_at_128(self):
        src = np.array([[0, 127, 128, 255]], dtype=np.uint8)
        out = tiff_decode(tiff_encode_gray(src, "g4"))
        assert out.tolist() == [[0, 0, 255, 255]]

    def test_photometric_1_fax_inverts(self):
        src = _bilevel(8, 16)
        t = bytearray(tiff_encode_gray(src, "g4"))
        # flip the photometric SHORT (tag 262) from 0 to 1 in the IFD
        i = t.find(struct.pack("<HH", 262, 3))
        assert i != -1
        t[i + 8] = 1
        assert np.array_equal(tiff_decode(bytes(t)), 255 - src)

    def test_bits4_gray(self):
        # hand-built 4-bit file: nibbles scale x17
        src16 = (np.arange(32, dtype=np.uint8) % 16).reshape(4, 8)
        packed = ((src16[:, 0::2] << 4) | src16[:, 1::2]).tobytes()
        e = "<"
        entries = [
            (256, 3, 8), (257, 3, 4), (258, 3, 4), (259, 3, 1),
            (262, 3, 1), (273, 4, 8 + len(packed) + 0), (277, 3, 1),
            (279, 4, len(packed)),
        ]
        # offsets: header(8) + data; IFD after data
        ifd_off = 8 + len(packed)
        body = struct.pack(e + "H", len(entries))
        for tag, typ, value in entries:
            if tag == 273:
                value = 8
            if typ == 3:
                body += struct.pack(e + "HHIHH", tag, typ, 1, value, 0)
            else:
                body += struct.pack(e + "HHII", tag, typ, 1, value)
        body += struct.pack(e + "I", 0)
        t = b"II*\x00" + struct.pack(e + "I", ifd_off) + packed + body
        out = tiff_decode(t)
        assert np.array_equal(out, src16 * 17)

    def test_multi_strip_boundaries_exact(self):
        src = _gray(23, 9, seed=1)       # 23 rows, rps 7 → 4 strips
        t = tiff_encode_gray(src, "lzw", rows_per_strip=7)
        assert np.array_equal(tiff_decode(t), src)


class TestTiffHostile:
    def test_fuzz_typed_errors_only(self):
        rng = np.random.RandomState(0)
        for _ in range(300):
            n = int(rng.randint(0, 120))
            data = b"II*\x00" + bytes(rng.randint(0, 256, n,
                                                  dtype=np.uint8))
            try:
                tiff_decode(data)
            except TiffError:
                pass

    def test_mutated_real_file_never_garbles_silently(self):
        src = _bilevel(16, 32)
        t = bytearray(tiff_encode_gray(src, "g4"))
        rng = np.random.RandomState(4)
        for _ in range(150):
            m = bytearray(t)
            m[int(rng.randint(4, len(m)))] = int(rng.randint(256))
            try:
                out = tiff_decode(bytes(m))
                assert out.dtype == np.uint8 and out.ndim == 2
            except TiffError:
                pass

    def test_out_of_scope_quarantines(self):
        src = _gray(6, 6)
        t = bytearray(tiff_encode_gray(src, "none"))
        i = t.find(struct.pack("<HH", 277, 3))   # SamplesPerPixel
        t[i + 8] = 3
        with pytest.raises(TiffError, match="single-sample"):
            tiff_decode(bytes(t))

    def test_strip_count_mismatch(self):
        src = _gray(20, 8)
        t = bytearray(tiff_encode_gray(src, "none", rows_per_strip=5))
        i = t.find(struct.pack("<HH", 257, 4))   # ImageLength LONG
        t[i + 8:i + 12] = struct.pack("<I", 99)
        with pytest.raises(TiffError):
            tiff_decode(bytes(t))


class TestBmp:
    def test_round_trip_and_header(self):
        src = _gray(29, 45, seed=3)
        b = bmp_encode_gray(src)
        assert np.array_equal(bmp_decode(b), src)
        assert bmp_header(b) == (45, 29, 1)

    def test_24bit_luma(self):
        from lexoid_spark.kernels.tiff_bmp import build_bmp
        out = bmp_decode(build_bmp(10, 7))   # zeroed 24-bit fixture
        assert out.shape == (7, 10) and int(out.max()) == 0

    def test_top_down(self):
        src = _gray(5, 8, seed=2)
        b = bytearray(bmp_encode_gray(src))
        h = struct.unpack_from("<i", b, 22)[0]
        struct.pack_into("<i", b, 22, -h)    # declare top-down
        assert np.array_equal(bmp_decode(bytes(b)), src[::-1])

    def test_fuzz(self):
        rng = np.random.RandomState(1)
        for _ in range(300):
            data = b"BM" + bytes(rng.randint(
                0, 256, int(rng.randint(0, 120)), dtype=np.uint8))
            try:
                bmp_decode(data)
            except BmpError:
                pass


class TestStandaloneDocumentSurface:
    def test_sniff_and_ocr_all_comps(self):
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_image_to_page
        from lexoid_spark.kernels.pdf_md import sniff_doctype

        msg = "TIFF SCAN 3\nrow two ok."
        arr = render_text(msg, scale=2)
        for comp in ALL_COMPS:
            t = tiff_encode_gray(arr, comp, rows_per_strip=64)
            assert sniff_doctype(t) == "image"
            text, boxes = ocr_image_to_page(t)
            assert text == msg.replace("\n", " ")
            assert boxes
        b = bmp_encode_gray(arr)
        assert sniff_doctype(b) == "image"
        assert ocr_image_to_page(b)[0] == msg.replace("\n", " ")

    def test_bm_text_prefix_is_not_an_image(self):
        from lexoid_spark.kernels.pdf_md import sniff_doctype

        assert sniff_doctype(b"BM industries, comma data") == "csv"
        assert sniff_doctype(b"BM plain prose no commas") == "txt"

    def test_native_sniff_matches_kernel(self, spark):
        from lexoid_spark.kernels.pdf_md import sniff_doctype
        from lexoid_spark.operators.routing import with_doctype

        payloads = [
            tiff_encode_gray(_gray(6, 6), "none"),
            tiff_encode_gray(_bilevel(6, 6), "g4", big_endian=True),
            bmp_encode_gray(_gray(6, 6)),
            b"BM industries, comma data",
            b"BM plain prose no commas",
        ]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "id long, html binary")
        out = {r["id"]: r["doctype"]
               for r in with_doctype(df).collect()}
        assert [out[i] for i in range(len(payloads))] == \
            [sniff_doctype(p) for p in payloads]
