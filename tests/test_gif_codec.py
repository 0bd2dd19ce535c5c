"""Stdlib GIF codec: LZW round trips (incl. table reset + width
growth), palettes, transparency, interlace, quarantine, and the real
resize path through the Spark kernel."""

import struct

import numpy as np
import pytest

from lexoid_spark.kernels.gif_codec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
    gif_header,
    make_test_gif,
)


def _pattern(h, w, n_colors=16):
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    idx = (x * 3 + y * 5) % n_colors
    pal = np.stack([(np.arange(n_colors) * 17) % 256,
                    (np.arange(n_colors) * 29) % 256,
                    (np.arange(n_colors) * 43) % 256], 1).astype(np.uint8)
    return pal[idx]


class TestRoundTrip:
    @pytest.mark.parametrize("hw", [(1, 1), (3, 5), (16, 16), (80, 120)])
    def test_encode_decode(self, hw):
        px = _pattern(*hw)
        out = gif_decode(gif_encode(px))
        assert np.array_equal(out, px)

    def test_two_color_depth1(self):
        px = _pattern(9, 9, n_colors=2)
        assert np.array_equal(gif_decode(gif_encode(px)), px)

    def test_header(self):
        b = gif_encode(_pattern(7, 31))
        assert gif_header(b) == (31, 7)
        assert gif_header(b"nope") is None

    def test_determinism(self):
        assert make_test_gif(20, 12, 3) == make_test_gif(20, 12, 3)
        assert make_test_gif(20, 12, 3) != make_test_gif(20, 12, 4)


class TestLzw:
    def test_table_reset_and_width_growth(self):
        rng = np.random.RandomState(1)
        seq = rng.randint(0, 64, size=50000).tolist()
        assert _lzw_decode(_lzw_encode(seq, 6), 6, len(seq)) == seq

    def test_min_code_size_2(self):
        seq = [0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3] * 40
        assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq


class TestFeatures:
    def test_transparency_yields_alpha(self):
        b = bytearray(gif_encode(_pattern(4, 4)))
        # splice a graphic-control extension before the image descriptor
        img_at = bytes(b).index(b"\x2C")
        gce = b"\x21\xF9\x04\x01\x00\x00\x00\x00"  # transparent idx 0
        b2 = bytes(b[:img_at]) + gce + bytes(b[img_at:])
        out = gif_decode(b2)
        assert out.shape[2] == 4
        idx = (np.arange(4)[None, :] * 3 + np.arange(4)[:, None] * 5) % 16
        assert np.array_equal(out[:, :, 3] == 0, idx == 0)

    def test_interlaced_decodes(self):
        px = _pattern(16, 8)
        plain = gif_encode(px)
        # rebuild with interlace flag set and rows stored in pass order
        from lexoid_spark.kernels.gif_codec import _deinterlace
        h = 16
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        idx = (np.arange(8)[None, :] * 3 + np.arange(16)[:, None] * 5) % 16
        stored = idx[order]  # rows as the interlaced file lays them out
        pal = np.stack([(np.arange(16) * 17) % 256,
                        (np.arange(16) * 29) % 256,
                        (np.arange(16) * 43) % 256], 1).astype(np.uint8)
        enc = gif_encode(pal[stored])
        at = bytes(enc).index(b"\x2C")
        mod = bytearray(enc)
        mod[at + 9] |= 0x40  # image-descriptor packed field: interlaced
        out = gif_decode(bytes(mod))
        assert np.array_equal(out, px)

    def test_too_many_colors_rejected(self):
        rng = np.random.RandomState(0)
        px = rng.randint(0, 255, size=(32, 32, 3)).astype(np.uint8)
        with pytest.raises(GifError):
            gif_encode(px)

    def test_truncated_quarantines(self):
        b = gif_encode(_pattern(8, 8))
        with pytest.raises(GifError):
            gif_decode(b[:15])
        with pytest.raises(GifError):
            gif_decode(b"GIF89a" + b"\x00" * 4)


class TestSparkIntegration:
    def test_image_meta_on_real_gif(self, spark):
        from lexoid_spark.functions.multimodal import image_meta

        rows = [(i, bytearray(make_test_gif(24 + i, 18 + i, seed=i)))
                for i in range(3)]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {r["id"]: r for r in image_meta(df).collect()}
        for i in range(3):
            assert (got[i]["width"], got[i]["height"]) == (24 + i, 18 + i)
            assert got[i]["channels"] == 3 and got[i]["error"] is None

    def test_resize_real_gif_pixels(self, spark):
        from lexoid_spark.functions.multimodal import resize_image_meta
        from lexoid_spark.kernels.png_codec import resample_nearest

        big = make_test_gif(30, 12, seed=2)
        df = spark.createDataFrame([(0, bytearray(big))],
                                   "id long, payload binary")
        (row,) = resize_image_meta(df, max_size=15).collect()
        assert (row["new_width"], row["new_height"]) == (15, 6)
        out = gif_decode(bytes(row["payload"]))
        expect = resample_nearest(gif_decode(big), 15, 6)
        assert np.array_equal(out, expect)
