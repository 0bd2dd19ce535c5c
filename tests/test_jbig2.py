"""JBIG2 (ITU-T T.88) kernel tests: MQ-coder + generic-region
round-trips over adversarial bitmaps, typed-error behavior on
malformed/out-of-scope streams, and the scanned-PDF OCR arm end to
end (mirrors tests/test_ccitt_g4.py for the fax arms)."""

import numpy as np
import pytest

from lexoid_spark.kernels.jbig2 import (
    Jbig2Error,
    _MQDecoder,
    _MQEncoder,
    jbig2_decode,
    jbig2_encode,
    jbig2_encode_symbols,
)


class TestMQCoder:
    def test_bit_sequence_roundtrip(self):
        rng = np.random.default_rng(11)
        bits = (rng.random(5000) < 0.3).astype(int).tolist()
        enc = _MQEncoder()
        cx = [0, 0]
        for b in bits:
            enc.encode(b, cx)
        data = enc.done()
        dec = _MQDecoder(data)
        cx = [0, 0]
        assert [dec.decode(cx) for _ in bits] == bits

    def test_multi_context_roundtrip(self):
        rng = np.random.default_rng(12)
        ctxs = rng.integers(0, 8, 2000)
        bits = (rng.random(2000) < 0.5).astype(int)
        enc = _MQEncoder()
        states = [[0, 0] for _ in range(8)]
        for c, b in zip(ctxs, bits):
            enc.encode(int(b), states[c])
        data = enc.done()
        dec = _MQDecoder(data)
        states = [[0, 0] for _ in range(8)]
        out = [dec.decode(states[c]) for c in ctxs]
        assert out == list(bits)

    def test_skewed_streams_compress(self):
        # 10k near-constant bits must code far below 1 bit/symbol
        enc = _MQEncoder()
        cx = [0, 0]
        for i in range(10_000):
            enc.encode(1 if i % 500 == 0 else 0, cx)
        assert len(enc.done()) < 200


class TestGenericRegion:
    @pytest.mark.parametrize("mode", ["mmr", "arith"])
    @pytest.mark.parametrize("density", [0.02, 0.5, 0.98])
    def test_random_bitmaps(self, mode, density):
        rng = np.random.default_rng(int(density * 100))
        arr = np.where(rng.random((41, 97)) < density, 0, 255).astype(
            np.uint8)
        assert np.array_equal(jbig2_decode(jbig2_encode(arr, mode=mode)),
                              arr)

    @pytest.mark.parametrize("mode", ["mmr", "arith"])
    def test_uniform_and_single_pixel(self, mode):
        for v in (0, 255):
            a = np.full((17, 33), v, np.uint8)
            assert np.array_equal(jbig2_decode(jbig2_encode(a, mode=mode)), a)
        a = np.array([[0]], np.uint8)
        assert np.array_equal(jbig2_decode(jbig2_encode(a, mode=mode)), a)

    def test_tpgdon_repeated_rows(self):
        arr = np.zeros((60, 80), np.uint8)
        arr[::4] = 255
        enc_tp = jbig2_encode(arr, mode="arith", tpgdon=True)
        enc_no = jbig2_encode(arr, mode="arith", tpgdon=False)
        assert np.array_equal(jbig2_decode(enc_tp), arr)
        # typical prediction must pay off on a row-repetitive bitmap
        assert len(enc_tp) < len(enc_no)

    def test_glyph_text_roundtrip(self):
        from lexoid_spark.kernels.ocr_glyph import recognize_pixels, render_text

        text = "JBIG2 OK 42"
        arr = render_text(text, scale=2)
        for mode in ("mmr", "arith"):
            out = jbig2_decode(jbig2_encode(arr, mode=mode))
            assert recognize_pixels(out)[0] == text


class TestTypedErrors:
    def test_fuzz_random_bytes_terminate_typed(self):
        rng = np.random.default_rng(99)
        for n in (0, 1, 7, 64, 513):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                jbig2_decode(blob)
            except Jbig2Error:
                pass  # typed, never a hang or foreign exception

    def test_halftone_segments_quarantine(self):
        # an immediate halftone region header (type 22) must raise
        import struct
        hdr = struct.pack(">IBBBI", 0, 22, 0, 1, 0)
        with pytest.raises(Jbig2Error, match="unsupported"):
            jbig2_decode(hdr)

    def test_truncated_symbol_dict_raises_typed(self):
        import struct
        hdr = struct.pack(">IBBBI", 0, 0, 0, 1, 0)
        with pytest.raises(Jbig2Error, match="truncated symbol"):
            jbig2_decode(hdr)

    def test_truncated_segment_raises(self):
        good = jbig2_encode(np.zeros((4, 4), np.uint8))
        with pytest.raises(Jbig2Error):
            jbig2_decode(good[: len(good) - 3])

    def test_hostile_dims_capped(self):
        import struct
        page = struct.pack(">IIIIBH", 1 << 20, 1 << 20, 0, 0, 1, 0)
        blob = struct.pack(">IBBBI", 0, 48, 0, 1, len(page)) + page
        with pytest.raises(Jbig2Error, match="implausible"):
            jbig2_decode(blob)

    def test_nonzero_template_quarantines(self):
        enc = bytearray(jbig2_encode(np.zeros((4, 4), np.uint8),
                                     mode="arith"))
        # generic flags byte sits right after the 17-byte region info
        # of the SECOND segment (page info segment is 11+19 bytes)
        flags_off = (11 + 19) + 11 + 17
        assert enc[flags_off] == 0x00
        enc[flags_off] = 0x02  # GBTEMPLATE 1
        with pytest.raises(Jbig2Error, match="GBTEMPLATE"):
            jbig2_decode(bytes(enc))


class TestScannedPdfOcr:
    @pytest.mark.parametrize("codec", ["jbig2", "jbig2-arith"])
    def test_jbig2_scanned_pdf_ocr(self, codec):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("JBIG2 FAX 9\nrow 2 ok", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr,
                                             "codec": codec}]}])
        assert b"/JBIG2Decode" in pdf
        (page, text, boxes), = ocr_pdf_to_pages(pdf)
        assert page == 1 and text == "JBIG2 FAX 9 row 2 ok"
        assert boxes

    def test_corrupt_jbig2_quarantines(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("BAD", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr,
                                             "codec": "jbig2"}]}])
        broken = pdf.replace(b"/JBIG2Decode", b"/JBIG2Decode")
        idx = broken.find(b"stream\n", broken.find(b"/JBIG2Decode"))
        broken = broken[:idx + 10] + b"\x00\x00" + broken[idx + 12:]
        with pytest.raises(ValueError):
            ocr_pdf_to_pages(broken)

    def test_globals_reference_quarantines(self):
        from lexoid_spark.kernels.ocr_stub import _jbig2_raster_array

        hdr = (b"<< /Subtype /Image /Width 4 /Height 4 /Filter "
               b"/JBIG2Decode /DecodeParms << /JBIG2Globals 9 0 R >> >>")
        with pytest.raises(ValueError, match="JBIG2Globals"):
            _jbig2_raster_array(hdr, b"")


class TestSymbolMode:
    """Symbol dictionary + text region (the jbig2enc layout): Annex-A
    integer arithmetic procedures, height-class symbol decode, strip
    placement."""

    def test_int_arith_roundtrip(self):
        from lexoid_spark.kernels.jbig2 import (
            OOB,
            _IntCtx,
            _int_decode,
            _int_encode,
        )
        from lexoid_spark.kernels.jbig2 import _MQDecoder, _MQEncoder

        vals = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
                100000, -4436, -87, OOB, 7, OOB, -2]
        enc = _MQEncoder()
        ictx = _IntCtx()
        for v in vals:
            _int_encode(enc, ictx, v)
        data = enc.done()
        dec = _MQDecoder(data)
        ictx = _IntCtx()
        out = [_int_decode(dec, ictx) for _ in vals]
        assert out == vals

    def test_iaid_roundtrip(self):
        from lexoid_spark.kernels.jbig2 import (
            _MQDecoder,
            _MQEncoder,
            _iaid_decode,
            _iaid_encode,
        )

        ids = [0, 5, 7, 3, 3, 6, 1, 0, 7]
        enc = _MQEncoder()
        cx = [[0, 0] for _ in range(16)]
        for i in ids:
            _iaid_encode(enc, cx, 3, i)
        data = enc.done()
        dec = _MQDecoder(data)
        cx = [[0, 0] for _ in range(16)]
        assert [_iaid_decode(dec, cx, 3) for _ in ids] == ids

    def test_glyph_page_roundtrip(self):
        from lexoid_spark.kernels.ocr_glyph import (
            recognize_pixels,
            render_text,
        )

        text = "SYMBOL MODE 42"
        arr = render_text(text + "\nrow 3 ok", scale=2)
        enc = jbig2_encode_symbols(arr)
        dec = jbig2_decode(enc)
        assert np.array_equal(dec, arr)
        assert recognize_pixels(dec)[0] == text + " row 3 ok"

    def test_symbol_dedup_compresses(self):
        from lexoid_spark.kernels.ocr_glyph import render_text

        rep = render_text("AAAAAAAA AAAAAAAA", scale=2)
        mix = render_text("ABCDEFGH IJKLMNOP", scale=2)
        enc_rep = jbig2_encode_symbols(rep)
        enc_mix = jbig2_encode_symbols(mix)
        assert np.array_equal(jbig2_decode(enc_rep), rep)
        assert np.array_equal(jbig2_decode(enc_mix), mix)
        # one dictionary entry vs sixteen: the stream must show it
        # (the fixed segment-header + page scaffolding is ~60 bytes)
        assert len(enc_rep) < len(enc_mix) * 0.6

    def test_random_component_pages(self):
        rng = np.random.default_rng(17)
        for _ in range(5):
            arr = np.full((40, 80), 255, np.uint8)
            for _b in range(12):
                y = int(rng.integers(0, 34))
                x = int(rng.integers(0, 72))
                bh = int(rng.integers(1, 6))
                bw = int(rng.integers(1, 8))
                arr[y:y + bh, x:x + bw] = 0
            enc = jbig2_encode_symbols(arr)
            assert np.array_equal(jbig2_decode(enc), arr)

    def test_symbol_pdf_through_ocr_arm(self):
        from lexoid_spark.corpus.pdf_gen import build_pdf
        from lexoid_spark.kernels.ocr_glyph import render_text
        from lexoid_spark.kernels.ocr_stub import ocr_pdf_to_pages

        arr = render_text("JBIG2 SYM 5\nrow 1 ok", scale=2)
        pdf = build_pdf([{"raster_images": [{"gray": arr,
                                             "codec": "jbig2-sym"}]}])
        (page, text, boxes), = ocr_pdf_to_pages(pdf)
        assert text == "JBIG2 SYM 5 row 1 ok" and boxes

    def test_huffman_dict_quarantines(self):
        import struct as _s

        from lexoid_spark.kernels.jbig2 import _decode_symbol_dict

        data = _s.pack(">H", 1) + bytes(16)   # SDHUFF set
        with pytest.raises(Jbig2Error, match="Huffman"):
            _decode_symbol_dict(data, [])

    def test_text_region_without_dict_quarantines(self):
        from lexoid_spark.kernels.ocr_glyph import render_text

        enc = bytearray(jbig2_encode_symbols(render_text("A", scale=2)))
        # drop the symbol-dictionary segment (number 1) from the
        # stream: page info (11+19) then dict header+data
        import struct as _s
        sd_start = 11 + 19
        (sd_len,) = _s.unpack_from(">I", enc, sd_start + 7)
        del enc[sd_start:sd_start + 11 + sd_len]
        with pytest.raises(Jbig2Error, match="symbol dictionary"):
            jbig2_decode(bytes(enc))

    def test_blank_page_encoder_raises(self):
        with pytest.raises(Jbig2Error, match="blank"):
            jbig2_encode_symbols(np.full((8, 8), 255, np.uint8))


def test_qe_table_matches_published_spec():
    """Pin the MQ Qe column against ITU-T T.88 Table E.1 (= T.800
    Table C-2): a slip here breaks interop with every real-world
    encoder while round-trips stay green (both halves share the
    table) — exactly the failure a review caught in rows 10-13."""
    from lexoid_spark.kernels.jbig2 import _QE

    published_qe = [
        0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601,
        0x5401, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401,
        0x5601, 0x5401, 0x5101, 0x4801, 0x3801, 0x3401, 0x3001,
        0x2801, 0x2401, 0x2201, 0x1C01, 0x1801, 0x1601, 0x1401,
        0x1201, 0x1101, 0x0AC1, 0x09C1, 0x08A1, 0x0521, 0x0441,
        0x02A1, 0x0221, 0x0141, 0x0111, 0x0085, 0x0049, 0x0025,
        0x0015, 0x0009, 0x0005, 0x0001, 0x5601,
    ]
    assert [row[0] for row in _QE] == published_qe
