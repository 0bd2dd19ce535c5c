"""Stdlib PNG codec: encode→decode round trips, all five scanline
filters, palette/alpha color types, unsupported-input quarantine, and
the real-pixel resize path through the Spark kernel."""

import struct
import zlib

import numpy as np
import pytest

from lexoid_spark.kernels.png_codec import (
    PNG_MAGIC,
    PngError,
    make_test_png,
    png_decode,
    png_encode,
    png_header,
    resample_nearest,
)


def _grad(h, w, c):
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    k = np.arange(c)[None, None, :]
    return ((x * 3 + y * 5 + k * 11) % 256).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    def test_channels(self, c):
        px = _grad(13, 7, c)
        out = png_decode(png_encode(px))
        assert out.shape == (13, 7, c)
        assert np.array_equal(out, px)

    def test_header_matches(self):
        b = png_encode(_grad(9, 21, 3))
        assert png_header(b) == (21, 9, 3)
        assert png_header(b"not a png") is None
        assert png_header(None) is None

    def test_make_test_png_deterministic(self):
        assert make_test_png(20, 10, seed=4) == make_test_png(20, 10, seed=4)
        assert make_test_png(20, 10, seed=4) != make_test_png(20, 10, seed=5)


def _encode_with_filters(px, filters):
    """Hand-roll an encoder that applies a GIVEN filter per scanline so
    the decoder's Sub/Up/Average/Paeth reconstruction is exercised
    (png_encode itself always emits filter 0)."""
    h, w, c = px.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            up = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                enc = cur[x]
            elif f == 1:
                enc = cur[x] - a
            elif f == 2:
                enc = cur[x] - up
            elif f == 3:
                enc = cur[x] - ((a + up) >> 1)
            else:
                p = a + up - cc
                pa, pb, pc_ = abs(p - a), abs(p - up), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (
                    up if pb <= pc_ else cc)
                enc = cur[x] - pred
            raw.append(enc & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)

    def chunk(kind, data):
        body = kind + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


class TestFilters:
    @pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types_reconstruct(self, filters):
        px = _grad(11, 6, 3)
        assert np.array_equal(png_decode(_encode_with_filters(px, filters)),
                              px)


class TestPalette:
    def _palette_png(self, idx, palette, trns=None):
        h, w = idx.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        raw = bytearray()
        for y in range(h):
            raw.append(0)
            raw += bytes(idx[y].tolist())

        def chunk(kind, data):
            body = kind + data
            return (struct.pack(">I", len(data)) + body
                    + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

        out = PNG_MAGIC + chunk(b"IHDR", ihdr)
        out += chunk(b"PLTE", palette.tobytes())
        if trns is not None:
            out += chunk(b"tRNS", bytes(trns))
        return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
            b"IEND", b"")

    def test_palette_expansion(self):
        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                           dtype=np.uint8)
        idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
        out = png_decode(self._palette_png(idx, palette))
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out, palette[idx])

    def test_palette_with_trns_alpha(self):
        palette = np.array([[9, 9, 9], [7, 7, 7]], dtype=np.uint8)
        idx = np.array([[0, 1]], dtype=np.uint8)
        out = png_decode(self._palette_png(idx, palette, trns=[128]))
        assert out.shape == (1, 2, 4)
        assert out[0, 0, 3] == 128  # from tRNS
        assert out[0, 1, 3] == 255  # beyond tRNS → opaque


class TestQuarantine:
    def test_bad_magic(self):
        with pytest.raises(PngError):
            png_decode(b"JUNKJUNKJUNK")

    def test_16bit_unsupported(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        body = b"IHDR" + ihdr
        b = (PNG_MAGIC + struct.pack(">I", len(ihdr)) + body
             + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
        with pytest.raises(PngError):
            png_decode(b)

    def test_truncated_idat(self):
        b = png_encode(_grad(4, 4, 3))
        with pytest.raises(PngError):
            png_decode(b[:40])


class TestResample:
    def test_nearest_downscale_indices(self):
        px = _grad(8, 8, 3)
        out = resample_nearest(px, 4, 4)
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out, px[::2, ::2])


class TestSparkIntegration:
    def test_image_meta_on_real_png(self, spark):
        from lexoid_spark.functions.multimodal import image_meta

        rows = [(i, bytearray(make_test_png(30 + i, 20 + i, seed=i)))
                for i in range(4)]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {r["id"]: r for r in image_meta(df).collect()}
        for i in range(4):
            assert (got[i]["width"], got[i]["height"]) == (30 + i, 20 + i)
            assert got[i]["channels"] == 3 and got[i]["error"] is None

    def test_resize_real_pixels_roundtrip(self, spark):
        from lexoid_spark.functions.multimodal import resize_image_meta

        big = make_test_png(40, 16, seed=1)
        small = make_test_png(10, 8, seed=2)
        df = spark.createDataFrame(
            [(0, bytearray(big)), (1, bytearray(small))],
            "id long, payload binary")
        got = {r["id"]: r for r in
               resize_image_meta(df, max_size=20).collect()}
        # big: 40x16 → ratio 0.5 → 20x8, payload is a REAL resampled PNG
        assert (got[0]["new_width"], got[0]["new_height"]) == (20, 8)
        assert got[0]["resized"] is True
        out = png_decode(bytes(got[0]["payload"]))
        expect = resample_nearest(png_decode(big), 20, 8)
        assert np.array_equal(out, expect)
        # small: untouched payload
        assert got[1]["resized"] is False
        assert bytes(got[1]["payload"]) == small


def _raw_png(w, h, depth, ctype, rows_payload, plte=None, interlace=0):
    """Hand-build a PNG from pre-packed scanline payload bytes (one
    filter-0 byte per row added here) for sub-byte-depth fixtures."""
    from lexoid_spark.kernels.png_codec import _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    raw = b"".join(b"\x00" + r for r in rows_payload)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")


class TestAdam7:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 7), (8, 8),
                                     (9, 5), (16, 33)])
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_interlaced_roundtrip(self, h, w, c):
        px = _grad(h, w, c)
        b = png_encode(px, interlace=True)
        assert png_header(b) == (w, h, c)
        assert np.array_equal(png_decode(b), px)

    def test_interlaced_differs_from_sequential_bytes(self):
        px = _grad(16, 16, 3)
        assert png_encode(px, interlace=True) != png_encode(px)

    def test_truncated_interlaced_quarantines(self):
        b = png_encode(_grad(16, 16, 3), interlace=True)
        # re-deflate a short stream under the same chunk structure
        from lexoid_spark.kernels.png_codec import _chunk
        head = b[:33]  # magic + IHDR chunk
        short = zlib.compress(b"\x00" * 10, 6)
        bad = head + _chunk(b"IDAT", short) + _chunk(b"IEND", b"")
        with pytest.raises(PngError):
            png_decode(bad)


class TestDeep:
    @pytest.mark.parametrize("c", [1, 3])
    def test_16bit_roundtrip(self, c):
        px = _grad(11, 6, c)
        b = png_encode(px, depth=16)
        assert png_header(b) == (6, 11, c)
        assert np.array_equal(png_decode(b), px)

    def test_16bit_interlaced_roundtrip(self):
        px = _grad(9, 13, 3)
        b = png_encode(px, depth=16, interlace=True)
        assert np.array_equal(png_decode(b), px)

    def test_16bit_high_byte_wins(self):
        # hand-rolled: one gray pixel 0xABCD → decodes to 0xAB
        row = struct.pack(">H", 0xABCD)
        b = _raw_png(1, 1, 16, 0, [row])
        assert png_decode(b)[0, 0, 0] == 0xAB


class TestSubByte:
    def test_1bit_gray(self):
        # 10 px wide: bits 1010101010 + 6 pad bits → 0xAA, 0x80
        b = _raw_png(10, 2, 1, 0, [b"\xaa\x80", b"\x55\x40"])
        out = png_decode(b)
        assert out.shape == (2, 10, 1)
        assert list(out[0, :, 0]) == [255, 0] * 5
        assert list(out[1, :, 0]) == [0, 255] * 5

    def test_2bit_gray_scales_by_85(self):
        # 4 px: values 0,1,2,3 → 00 01 10 11 = 0x1B
        b = _raw_png(4, 1, 2, 0, [b"\x1b"])
        assert list(png_decode(b)[0, :, 0]) == [0, 85, 170, 255]

    def test_4bit_palette(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
        # 3 px row: indices 0,1,2 → nibbles 0x01, 0x20
        b = _raw_png(3, 1, 4, 3, [b"\x01\x20"], plte=plte)
        out = png_decode(b)
        assert out.shape == (1, 3, 3)
        assert list(out[0, 0]) == [255, 0, 0]
        assert list(out[0, 1]) == [0, 255, 0]
        assert list(out[0, 2]) == [0, 0, 255]

    def test_subbyte_rgb_is_illegal(self):
        with pytest.raises(PngError):
            png_decode(_raw_png(2, 1, 4, 2, [b"\x00\x00\x00"]))
