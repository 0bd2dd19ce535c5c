"""AVI (RIFF) Motion-JPEG reader: chunk walk, DHT-less frame repair
(the OpenDML wild layout), typed quarantine for foreign codecs."""

import numpy as np
import pytest

from lexoid_spark.kernels.avi import (
    AviError,
    avi_header,
    avi_mjpeg_frames,
    looks_like_avi,
    make_test_avi_mjpeg,
)


def _glyph_frames(texts, scale=2):
    from lexoid_spark.kernels.ocr_glyph import render_text

    fr = [render_text(t, scale=scale) for t in texts]
    H = max(a.shape[0] for a in fr)
    W = max(a.shape[1] for a in fr)
    return np.stack([
        np.pad(a, ((0, H - a.shape[0]), (0, W - a.shape[1])),
               constant_values=255) for a in fr])


class TestAviMjpeg:
    @pytest.mark.parametrize("omit_dht", [False, True])
    def test_roundtrip_ocr(self, omit_dht):
        from lexoid_spark.kernels.ocr_glyph import recognize_pixels

        texts = ["AVI F %d" % i for i in range(3)]
        padded = _glyph_frames(texts)
        avi = make_test_avi_mjpeg(padded, quality=90, omit_dht=omit_dht)
        assert looks_like_avi(avi)
        w, h = padded.shape[2], padded.shape[1]
        assert avi_header(avi) == (w, h, 3)
        frames = avi_mjpeg_frames(avi)
        assert frames.shape == (3, h, w)
        assert [recognize_pixels(f)[0] for f in frames] == texts

    def test_dht_stripped_fixture_really_lacks_tables(self):
        frames = np.full((1, 16, 16), 99, np.uint8)
        with_t = make_test_avi_mjpeg(frames)
        without = make_test_avi_mjpeg(frames, omit_dht=True)
        assert b"\xff\xc4" in with_t
        assert b"\xff\xc4" not in without
        assert np.array_equal(avi_mjpeg_frames(with_t),
                              avi_mjpeg_frames(without))

    def test_foreign_codec_quarantines_typed(self):
        avi = bytearray(make_test_avi_mjpeg(
            np.full((1, 16, 16), 50, np.uint8)))
        i = avi.find(b"vids" + b"MJPG")
        assert i > 0
        avi[i + 4:i + 8] = b"xvid"
        with pytest.raises(AviError, match="not Motion-JPEG"):
            avi_mjpeg_frames(bytes(avi))

    def test_multimodal_dispatch(self):
        from lexoid_spark.functions.multimodal import (
            decode_video_frames, decode_video_header)

        frames = np.full((2, 16, 16), 128, np.uint8)
        avi = make_test_avi_mjpeg(frames)
        assert decode_video_header(avi) == (16, 16, 2)
        assert decode_video_frames(avi).shape == (2, 16, 16)

    def test_truncation_always_typed(self):
        from lexoid_spark.kernels.jpeg_codec import JpegError

        avi = make_test_avi_mjpeg(np.full((2, 16, 16), 77, np.uint8))
        for cut in range(1, len(avi), 53):
            try:
                avi_mjpeg_frames(avi[:cut])
            except (AviError, JpegError):
                pass

    def test_non_avi_bytes(self):
        assert avi_header(b"RIFFxxxxWAVE") is None
        assert not looks_like_avi(b"\x00" * 12)
        with pytest.raises(AviError):
            avi_mjpeg_frames(b"garbage bytes here")
