"""WebP header metadata: all three stream flavors, routing sniff
twins, typed pixel quarantine."""

import pytest

from lexoid_spark.kernels.webp_meta import (
    looks_like_webp,
    make_test_webp,
    webp_header,
)


class TestWebpHeader:
    @pytest.mark.parametrize("flavor", ["vp8", "vp8l", "vp8x"])
    @pytest.mark.parametrize("alpha", [False, True])
    def test_roundtrip(self, flavor, alpha):
        b = make_test_webp(321, 87, flavor=flavor, alpha=alpha)
        assert looks_like_webp(b)
        want_c = 3 if flavor == "vp8" else (4 if alpha else 3)
        assert webp_header(b) == (321, 87, want_c)

    def test_max_14bit_dims(self):
        b = make_test_webp(0x3FFF, 0x3FFF, flavor="vp8l")
        assert webp_header(b) == (0x3FFF, 0x3FFF, 3)

    def test_truncation_returns_none(self):
        b = make_test_webp(100, 50, flavor="vp8")
        for cut in range(len(b)):
            out = webp_header(b[:cut])
            assert out is None or out == (100, 50, 3)

    def test_bad_start_code_returns_none(self):
        b = bytearray(make_test_webp(100, 50, flavor="vp8"))
        i = b.find(b"\x9d\x01\x2a")
        b[i] = 0x00
        assert webp_header(bytes(b)) is None

    def test_not_webp(self):
        assert webp_header(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert not looks_like_webp(b"RIFF\x04\x00\x00\x00AVI ")


class TestWebpRouting:
    def test_kernel_sniff(self):
        from lexoid_spark.kernels.pdf_md import sniff_doctype

        assert sniff_doctype(make_test_webp(8, 8)) == "image"

    def test_native_sniff_twin(self, spark):
        from lexoid_spark.operators.routing import with_doctype

        df = spark.createDataFrame(
            [(1, bytearray(make_test_webp(8, 8))),
             (2, bytearray(b"RIFF1234WAVEdata"))],
            "id long, html binary")
        got = {r["id"]: r["doctype"]
               for r in with_doctype(df, "html").collect()}
        assert got[1] == "image"
        assert got[2] != "image"

    def test_pixels_quarantine_typed(self):
        from lexoid_spark.functions.multimodal import (
            decode_image_header, decode_image_pixels)

        b = make_test_webp(40, 30, flavor="vp8l", alpha=True)
        assert decode_image_header(b) == (40, 30, 4)
        with pytest.raises(Exception):
            decode_image_pixels(b)
