"""TrueType cmap parsing (kernels/ttf_cmap.py): builder↔parser round
trips over both format-4 decode paths, format-12 groups, hostile-input
robustness, and the end-to-end PDF route — Identity-H text recovered
from an embedded FontFile2 when /ToUnicode is absent."""

import struct

import pytest

from lexoid_spark.corpus.pdf_gen import build_pdf
from lexoid_spark.kernels.pdf_md import pdf_to_md
from lexoid_spark.kernels.ttf_cmap import (
    char_to_gid,
    gid_to_text,
    ttf_build,
)


class TestRoundTrip:
    def test_iddelta_path_consecutive_gids(self):
        m = {chr(0x41 + i): 10 + i for i in range(5)}  # A..E → 10..14
        assert char_to_gid(ttf_build(m)) == {
            0x41 + i: 10 + i for i in range(5)}

    def test_glyphidarray_path_scrambled_gids(self):
        m = {"A": 7, "B": 3, "C": 9}  # contiguous chars, jumbled gids
        assert char_to_gid(ttf_build(m)) == {65: 7, 66: 3, 67: 9}

    def test_mixed_runs(self):
        m = {"a": 1, "b": 2, "x": 40, "y": 9, "z": 41, "é": 100}
        assert char_to_gid(ttf_build(m)) == {
            ord(c): g for c, g in m.items()}

    def test_cjk_inversion(self):
        cjk = "数据表查询流分组"
        m = {ch: i + 1 for i, ch in enumerate(cjk)}
        inv = gid_to_text(ttf_build(m))
        assert all(inv[g] == ch for ch, g in m.items())

    def test_shared_glyph_lowest_codepoint_wins(self):
        inv = gid_to_text(ttf_build({"B": 5, "A": 5}))
        assert inv[5] == "A"


class TestFormat12:
    def _sfnt_fmt12(self, groups):
        sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0,
                          len(groups))
        for s, e, g in groups:
            sub += struct.pack(">III", s, e, g)
        cmap = (struct.pack(">HH", 0, 1)
                + struct.pack(">HHI", 3, 10, 12) + sub)
        header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
        record = b"cmap" + struct.pack(">III", 0, 28, len(cmap))
        return header + record + cmap

    def test_bmp_group(self):
        prog = self._sfnt_fmt12([(0x61, 0x63, 50)])  # a,b,c → 50,51,52
        assert char_to_gid(prog) == {0x61: 50, 0x62: 51, 0x63: 52}

    def test_supplementary_plane(self):
        prog = self._sfnt_fmt12([(0x1F600, 0x1F601, 7)])
        assert gid_to_text(prog) == {7: "\U0001F600", 8: "\U0001F601"}


class TestRobustness:
    @pytest.mark.parametrize("junk", [
        b"", b"abc", b"not a font program at all",
        b"\x00\x01\x00\x00",                      # header only
        b"\x00\x01\x00\x00" + b"\xff" * 100,      # garbage tables
    ])
    def test_garbage_returns_empty(self, junk):
        assert char_to_gid(junk) == {}

    def test_truncated_real_program(self):
        prog = ttf_build({"A": 1, "B": 2})
        for cut in (10, 20, 30, len(prog) - 4):
            assert isinstance(char_to_gid(prog[:cut]), dict)

    def test_wrong_table_tag(self):
        prog = bytearray(ttf_build({"A": 1}))
        prog[12:16] = b"glyf"  # rename the cmap record
        assert char_to_gid(bytes(prog)) == {}


class TestPdfEndToEnd:
    WORDS = [
        {"text": "数据", "x": 72.0, "y": 700.0, "size": 12.0, "font": "C1"},
        {"text": "查询", "x": 172.0, "y": 700.0, "size": 12.0, "font": "C1"},
        {"text": "plain", "x": 72.0, "y": 660.0, "size": 12.0, "font": "F1"},
    ]

    @pytest.mark.parametrize("compress", [False, True])
    def test_fontfile_route_matches_tounicode_route(self, compress):
        a = build_pdf([{"words": self.WORDS}], compress=compress)
        b = build_pdf([{"words": self.WORDS}], compress=compress,
                      cid_tounicode=False)
        assert b"/ToUnicode" not in b and b"/FontFile2" in b
        assert pdf_to_md(a) == pdf_to_md(b)
        assert "数据 查询" in pdf_to_md(b)

    def test_no_fontfile_still_garbles_gracefully(self):
        pdf = bytearray(build_pdf([{"words": self.WORDS}],
                                  cid_tounicode=False))
        # sever the descriptor link: kernel must fall back to "�"
        i = bytes(pdf).find(b"/FontFile2")
        pdf[i:i + 10] = b"/FontFileX"
        md = pdf_to_md(bytes(pdf))
        assert "�" in md and "plain" in md
