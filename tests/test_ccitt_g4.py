"""CCITT Group 4 / ITU-T T.6 codec (kernels/ccitt_g4.py) — the B/W
fax compression wild scanned PDFs carry under /CCITTFaxDecode /K -1."""

import numpy as np
import pytest

from lexoid_spark.kernels.ccitt_g4 import (
    _BLACK_TERM,
    _WHITE_TERM,
    CcittError,
    g4_decode,
    g4_encode,
)


class TestSpecBitPatterns:
    """Pin a handful of published T.4 code values so a transcription
    slip in the tables can't hide behind self-consistent round-trips."""

    def test_known_codes(self):
        assert _WHITE_TERM[0] == (0b00110101, 8)
        assert _WHITE_TERM[1] == (0b000111, 6)
        assert _WHITE_TERM[63] == (0b00110100, 8)
        assert _BLACK_TERM[0] == (0b0000110111, 10)
        assert _BLACK_TERM[2] == (0b11, 2)
        assert _BLACK_TERM[3] == (0b10, 2)

    def test_all_white_line_is_v0s(self):
        """An all-white image codes each line as a single pass/vertical
        step against the all-white reference — tiny output."""
        a = np.full((8, 1728), 255, dtype=np.uint8)
        enc = g4_encode(a)
        assert len(enc) <= 16  # 8 lines of H-mode white-1728 + EOFB


class TestRoundTrip:
    @pytest.mark.parametrize("density", [0.05, 0.3, 0.7, 0.95])
    def test_random_bitmaps(self, density):
        rng = np.random.RandomState(int(density * 100))
        for _ in range(8):
            h, w = rng.randint(1, 32), rng.randint(1, 80)
            arr = np.where(rng.rand(h, w) < density, 0, 255).astype(np.uint8)
            assert (g4_decode(g4_encode(arr), w, h) == arr).all()

    def test_uniform_and_stripes(self):
        for fill in (0, 255):
            a = np.full((4, 65), fill, dtype=np.uint8)
            assert (g4_decode(g4_encode(a), 65, 4) == a).all()
        stripes = np.tile(
            np.r_[np.zeros(3, np.uint8), np.full(5, 255, np.uint8)], 13
        )[None, :].repeat(6, axis=0)
        h, w = stripes.shape
        assert (g4_decode(g4_encode(stripes), w, h) == stripes).all()

    def test_long_runs_use_makeups(self):
        """Runs past 2560 must chain extended makeup codes."""
        a = np.full((2, 6000), 255, dtype=np.uint8)
        a[1, 100:5900] = 0
        assert (g4_decode(g4_encode(a), 6000, 2) == a).all()

    def test_glyph_text_roundtrip(self):
        from lexoid_spark.kernels.ocr_glyph import (
            recognize_pixels,
            render_text,
        )

        arr = render_text("G4 FAX 12\nLINE 3", scale=2)
        dec = g4_decode(g4_encode(arr), arr.shape[1], arr.shape[0])
        assert (dec == arr).all()
        assert recognize_pixels(dec)[0] == "G4 FAX 12 LINE 3"


class TestHostileInputs:
    def test_garbage_raises(self):
        with pytest.raises(CcittError):
            g4_decode(b"\xde\xad\xbe\xef" * 8, 64, 4)

    def test_bad_dims_raise(self):
        with pytest.raises(CcittError):
            g4_decode(b"", 0, 4)
        with pytest.raises(CcittError):
            g4_decode(b"", 1 << 20, 4)

    def test_truncated_stream_raises(self):
        rng = np.random.RandomState(1)
        arr = np.where(rng.rand(16, 64) < 0.4, 0, 255).astype(np.uint8)
        enc = g4_encode(arr)
        with pytest.raises(CcittError):
            g4_decode(enc[: len(enc) // 3], 64, 16)


class TestPdfIntegration:
    def test_g4_scanned_pdf_ocr(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("G4 FAX 9\nROW 2 OK", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr, "codec": "g4"}]}])
        assert b"/CCITTFaxDecode" in pdf
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "G4 FAX 9 ROW 2 OK")]

    def test_corrupt_g4_quarantines(self):
        """A declared fax scan that doesn't decode must raise (→
        quarantine), never silently skip to an empty parse."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("X", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr, "codec": "g4"}]}])
        bad = pdf.replace(b"stream\n", b"stream\n\xde\xad", 1)
        with pytest.raises(ValueError):
            ocr_pdf_to_pages(bad)

    def test_blackis1_inverts(self):
        """Encoding the INVERTED bitmap and declaring /BlackIs1 true
        must decode back to the original ink."""
        import numpy as np

        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("INV 7", scale=2)
        pdf = build_pdf([{"raster_images": [
            {"gray": (255 - arr).astype(np.uint8), "codec": "g4"}]}])
        flagged = pdf.replace(b"/K -1", b"/K -1 /BlackIs1 true")
        assert ocr_pdf_to_pages(flagged)[0][1] == "INV 7"


class TestOneBitFlateRasters:
    @pytest.mark.parametrize("pred", [1, 15])
    def test_1bit_flate_ocr(self, pred):
        """1-bit /DeviceGray Flate rasters (byte-padded MSB-first
        rows, 0 = black) decode through the raw-raster arm."""
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("ONEBIT 5\nROW 1", scale=2)
        pdf = build_pdf([{"raster_images": [
            {"gray": arr, "bpc": 1, "predictor": pred}]}])
        assert b"/BitsPerComponent 1" in pdf
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "ONEBIT 5 ROW 1")]


class TestFuzz:
    def test_random_bytes_terminate_with_typed_error(self):
        """Arbitrary byte streams must either decode (possibly to
        garbage ink that OCR later quarantines) or raise CcittError —
        never hang or crash with a foreign exception."""
        import random

        rng = random.Random(99)
        for _ in range(200):
            blob = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 120)))
            try:
                out = g4_decode(blob, 48, 12)
                assert out.shape == (12, 48)
            except CcittError:
                pass

    def test_hostile_rows_capped(self):
        """A hostile /Rows must raise CcittError before allocating —
        never MemoryError escaping the quarantine path."""
        with pytest.raises(CcittError):
            g4_decode(b"\x00" * 16, 65536, 999999999)
        with pytest.raises(CcittError):
            g4_decode(b"\x00" * 16, 1 << 15, 1 << 15)


class TestGroup3:
    """CCITT Group 3 (ITU-T T.4): /K == 0 pure 1-D MH (the PDF
    default), /K > 0 mixed 2-D MR with EOL+tag framing."""

    @pytest.mark.parametrize("k", [0, 1, 2, 4])
    def test_glyph_text_roundtrip(self, k):
        from lexoid_spark.kernels.ccitt_g4 import g3_decode, g3_encode
        from lexoid_spark.kernels.ocr_glyph import render_text

        arr = render_text("G3 FAX 7\nrow two ok", scale=2)
        dec = g3_decode(g3_encode(arr, k), arr.shape[1], arr.shape[0], k)
        assert (dec == arr).all()

    @pytest.mark.parametrize("k", [0, 3])
    def test_uniform_and_stripes(self, k):
        from lexoid_spark.kernels.ccitt_g4 import g3_decode, g3_encode

        for pat in [
            np.zeros((5, 8), np.uint8),
            np.full((5, 8), 255, np.uint8),
            np.tile(np.array([0, 255], np.uint8), (5, 4)),
        ]:
            dec = g3_decode(g3_encode(pat, k),
                            pat.shape[1], pat.shape[0], k)
            assert (dec == pat).all()

    @pytest.mark.parametrize("codec,kparm", [
        ("g3", b"/K 0"), ("g3-2d", b"/K 4")])
    def test_g3_scanned_pdf_ocr(self, codec, kparm):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("G3 SCAN 5\nmixed line", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr, "codec": codec}]}])
        assert kparm in pdf
        assert [(p, t) for p, t, _b in ocr_pdf_to_pages(pdf)] == [
            (1, "G3 SCAN 5 mixed line")]

    def test_missing_eol_raises(self):
        """K > 0 data without the required EOL framing fails typed."""
        from lexoid_spark.kernels.ccitt_g4 import (
            CcittError,
            g3_decode,
            g3_encode,
        )

        arr = np.tile(np.array([0, 255], np.uint8), (4, 4))
        enc = g3_encode(arr, 0)  # 1-D stream has no EOLs
        with pytest.raises(CcittError):
            g3_decode(enc, 8, 4, 2)

    def test_fuzz_random_bytes_terminate_typed(self):
        """The G4 fuzz contract extended to both G3 regimes: decode
        or CcittError, never a hang or foreign exception."""
        import random

        from lexoid_spark.kernels.ccitt_g4 import CcittError, g3_decode

        rng = random.Random(41)
        for _ in range(200):
            blob = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 120)))
            for k in (0, 2):
                try:
                    out = g3_decode(blob, 48, 12, k)
                    assert out.shape == (12, 48)
                except CcittError:
                    pass

    def test_hostile_dims_capped(self):
        from lexoid_spark.kernels.ccitt_g4 import CcittError, g3_decode

        with pytest.raises(CcittError):
            g3_decode(b"\x00" * 16, 65536, 999999999, 0)


def test_g3_2d_fill_bits_before_eol_decode():
    """ITU-T T.4 §4.1.2 allows FILL (0 bits) before each EOL — a
    conformant stream with fill must decode, a stray 1 bit must
    still raise."""
    import numpy as np

    from lexoid_spark.kernels.ccitt_g4 import (
        CcittError,
        _BitW,
        _EOL,
        _transitions,
        _encode_line_1d,
        g3_decode,
    )

    arr = np.full((3, 16), 255, dtype=np.uint8)
    arr[1, 4:9] = 0
    w = _BitW()
    for y in range(3):
        w.write(0, 6)          # FILL before every EOL
        w.write(*_EOL)
        w.write(1, 1)          # 1-D line
        _encode_line_1d(w, _transitions(arr[y]), 16)
    assert np.array_equal(g3_decode(w.done(), 16, 3, k=4), arr)
    # a 1 bit where fill/EOL is required still raises
    bad = _BitW()
    bad.write(0b101010, 6)
    import pytest as _pytest
    with _pytest.raises(CcittError):
        g3_decode(bad.done(), 16, 3, k=4)
