"""PDF stream filter chain: LZW (MSB, EarlyChange, clear-on-full),
ASCIIHex, ASCII85, RunLength, and chains — kernel twin of the
generator encoders."""

import random

from lexoid_spark.corpus.pdf_gen import (
    _lzw_encode_pdf,
    _rle_encode_pdf,
    build_pdf,
    words_line,
)
from lexoid_spark.kernels.pdf_md import (
    _lzw_decode_pdf,
    _rle_decode_pdf,
    pdf_to_pages,
)

PAGES = [{"words": words_line(["Filter", "chain", "works"], 700.0)}]


class TestLzw:
    def test_roundtrip_text(self):
        text = b"BT /F1 12 Tf 72 700 Td (hello) Tj ET\n" * 3000
        assert _lzw_decode_pdf(_lzw_encode_pdf(text)) == text

    def test_roundtrip_random_incl_table_full(self):
        rnd = random.Random(7)
        for n in (0, 1, 2, 300, 5000, 60000):
            payload = bytes(rnd.randrange(256) for _ in range(n))
            assert _lzw_decode_pdf(_lzw_encode_pdf(payload)) == payload

    def test_width_growth_sequence(self):
        # repetitive data grows the table through 9/10/11/12-bit codes
        data = bytes(range(256)) * 40
        assert _lzw_decode_pdf(_lzw_encode_pdf(data)) == data


class TestRle:
    def test_roundtrip(self):
        for payload in (b"", b"x", b"ab" * 500):
            assert _rle_decode_pdf(_rle_encode_pdf(payload)) == payload

    def test_repeat_form(self):
        # 257-250=7 repeats of 'A', then 2 literals, then EOD
        assert _rle_decode_pdf(bytes([250]) + b"A"
                               + bytes([1]) + b"xy"
                               + bytes([128])) == b"AAAAAAAxy"


class TestFilterChains:
    def test_each_filter_matches_plain(self):
        plain = pdf_to_pages(build_pdf(PAGES))
        assert plain[0][1] == "Filter chain works\n\n"
        for sf in ("lzw", "ahx", "rl", "a85flate"):
            assert pdf_to_pages(build_pdf(PAGES, stream_filter=sf)) \
                == plain, sf

    def test_chain_composes_with_encryption(self):
        plain = pdf_to_pages(build_pdf(PAGES))
        assert pdf_to_pages(
            build_pdf(PAGES, stream_filter="a85flate", encrypt=True)
        ) == plain
