"""H.264 (ITU-T H.264) kernel tests: Annex-B framing, emulation
prevention, SPS/PPS/IDR parse, I_PCM macroblock round-trips, typed
errors on out-of-scope streams, and the frame_ocr operator surface
(mirrors tests/test_jbig2.py / test_jpx.py for the raster arms)."""

import struct

import numpy as np
import pytest

from lexoid_spark.kernels.h264 import (
    H264Error,
    _ebsp_to_rbsp,
    _rbsp_to_ebsp,
    h264_decode_frames,
    h264_encode_ipcm,
    h264_header,
    looks_like_h264,
)


class TestEmulationPrevention:
    @pytest.mark.parametrize("raw", [
        b"", b"\x00", b"\x00\x00", b"\x00\x00\x00",
        b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"a\x00\x00\x00\x00\x01b", b"\x00" * 10, b"\xff\x00\x00\x03",
    ])
    def test_roundtrip(self, raw):
        assert _ebsp_to_rbsp(_rbsp_to_ebsp(raw)) == raw

    def test_no_start_code_in_ebsp(self):
        ebsp = _rbsp_to_ebsp(b"\x00" * 64 + b"\x00\x00\x01" + b"\x00" * 8)
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x00" not in ebsp


class TestRoundtrip:
    @pytest.mark.parametrize("shape", [(1, 16, 16), (3, 32, 48),
                                       (2, 46, 126), (1, 2, 2),
                                       (4, 30, 50)])
    def test_random_frames(self, shape):
        rng = np.random.default_rng(sum(shape))
        frames = rng.integers(0, 256, shape).astype(np.uint8)
        enc = h264_encode_ipcm(frames)
        assert looks_like_h264(enc)
        assert h264_header(enc) == (shape[2], shape[1], shape[0])
        assert np.array_equal(h264_decode_frames(enc), frames)

    def test_zero_frames_exercise_emulation_prevention(self):
        z = np.zeros((2, 16, 32), np.uint8)
        enc = h264_encode_ipcm(z)
        assert b"\x00\x00\x03" in enc    # stuffing actually happened
        assert np.array_equal(h264_decode_frames(enc), z)

    def test_glyph_frames_ocr(self):
        from lexoid_spark.kernels.ocr_glyph import (
            recognize_pixels,
            render_text,
        )

        arr = render_text("VIDEO FRAME 3", scale=2)
        if arr.shape[0] % 2 or arr.shape[1] % 2:
            arr = np.pad(arr, ((0, arr.shape[0] % 2),
                               (0, arr.shape[1] % 2)),
                         constant_values=255)
        dec = h264_decode_frames(h264_encode_ipcm(arr))
        assert recognize_pixels(dec[0])[0] == "VIDEO FRAME 3"

    def test_odd_dims_rejected(self):
        with pytest.raises(H264Error, match="even"):
            h264_encode_ipcm(np.zeros((1, 15, 16), np.uint8))


class TestTypedErrors:
    def test_fuzz_random_bytes_terminate_typed(self):
        rng = np.random.default_rng(31)
        for n in (0, 3, 17, 100, 700):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                h264_decode_frames(blob)
            except H264Error:
                pass

    def test_fuzz_corrupted_valid_stream(self):
        rng = np.random.default_rng(32)
        frames = rng.integers(0, 256, (1, 16, 16)).astype(np.uint8)
        cs = h264_encode_ipcm(frames)
        for _ in range(40):
            i = int(rng.integers(5, len(cs)))
            mut = bytearray(cs)
            mut[i] ^= int(rng.integers(1, 256))
            try:
                out = h264_decode_frames(bytes(mut))
                assert out.dtype == np.uint8
            except H264Error:
                pass

    def test_cabac_quarantines(self):
        # flip the PPS entropy_coding_mode bit (first bit after the
        # two ue(0) id codes = bits 2)
        frames = np.zeros((1, 16, 16), np.uint8)
        cs = bytearray(h264_encode_ipcm(frames))
        # locate PPS NAL (type 8): start code + header byte 0x68
        i = cs.find(b"\x00\x00\x00\x01\x68")
        cs[i + 5] ^= 0x20            # bit 2 of the PPS RBSP
        with pytest.raises(H264Error, match="CABAC"):
            h264_decode_frames(bytes(cs))

    def test_non_ipcm_quarantines(self):
        frames = np.zeros((1, 16, 16), np.uint8)
        cs = bytearray(h264_encode_ipcm(frames))
        i = cs.find(b"\x00\x00\x00\x01\x65")     # IDR NAL
        # slice header for this stream is 2 bytes; mb_type ue(25)
        # starts mid-byte — zero the rest of the slice payload so the
        # first ue() reads a small mb_type instead
        for j in range(i + 6, min(i + 12, len(cs))):
            cs[j] = 0xFF
        with pytest.raises(H264Error):
            h264_decode_frames(bytes(cs))

    def test_metadata_containers_raise(self):
        from lexoid_spark.functions.multimodal import (
            decode_video_frames,
            encode_fake_video,
        )

        with pytest.raises(H264Error, match="metadata-only"):
            decode_video_frames(encode_fake_video(320, 240, 10))


class TestHeaderSurface:
    def test_decode_video_header_h264(self):
        from lexoid_spark.functions.multimodal import decode_video_header

        frames = np.zeros((5, 30, 48), np.uint8)
        enc = h264_encode_ipcm(frames)
        assert decode_video_header(enc) == (48, 30, 5)

    def test_fake_and_mp4_headers_still_work(self):
        from lexoid_spark.functions.multimodal import (
            decode_video_header,
            encode_fake_video,
        )
        from lexoid_spark.kernels.mp4_meta import make_test_mp4

        assert decode_video_header(
            encode_fake_video(320, 240, 10)) == (320, 240, 10)
        assert decode_video_header(
            make_test_mp4(640, 360, 24)) == (640, 360, 24)


class TestMp4Track:
    @pytest.mark.parametrize("shape", [(1, 16, 16), (3, 32, 48),
                                       (2, 46, 126)])
    def test_mp4_roundtrip(self, shape):
        from lexoid_spark.kernels.mp4_avc import (
            make_test_mp4_h264,
            mp4_h264_frames,
        )
        from lexoid_spark.kernels.mp4_meta import mp4_header

        rng = np.random.default_rng(sum(shape))
        frames = rng.integers(0, 256, shape).astype(np.uint8)
        mp4 = make_test_mp4_h264(frames)
        assert mp4_header(mp4) == (shape[2], shape[1], shape[0])
        assert np.array_equal(mp4_h264_frames(mp4), frames)

    def test_decode_video_frames_dispatch(self):
        from lexoid_spark.functions.multimodal import decode_video_frames
        from lexoid_spark.kernels.mp4_avc import make_test_mp4_h264

        frames = np.zeros((2, 16, 16), np.uint8)
        assert np.array_equal(decode_video_frames(
            make_test_mp4_h264(frames)), frames)

    def test_trackless_mp4_raises_typed(self):
        from lexoid_spark.functions.multimodal import decode_video_frames
        from lexoid_spark.kernels.mp4_meta import Mp4Error, make_test_mp4

        with pytest.raises(Mp4Error):
            decode_video_frames(make_test_mp4(320, 240, 10))

    def test_fuzz_corrupted_mp4_terminates_typed(self):
        from lexoid_spark.kernels.mp4_avc import make_test_mp4_h264, \
            mp4_h264_frames
        from lexoid_spark.kernels.mp4_meta import Mp4Error

        rng = np.random.default_rng(55)
        mp4 = make_test_mp4_h264(
            rng.integers(0, 256, (1, 16, 16)).astype(np.uint8))
        for _ in range(40):
            i = int(rng.integers(4, len(mp4)))
            mut = bytearray(mp4)
            mut[i] ^= int(rng.integers(1, 256))
            try:
                out = mp4_h264_frames(bytes(mut))
                assert out.dtype == np.uint8
            except (Mp4Error, ValueError, struct.error):
                pass


def test_audio_first_mp4_finds_the_video_trak():
    """A legal MP4 often lists a (non-AVC) audio track first — the
    sample-table walk must pick the avc1 trak, not trak #1."""
    import struct as _s

    from lexoid_spark.kernels.mp4_avc import (
        _box,
        make_test_mp4_h264,
        mp4_h264_frames,
    )

    frames = np.full((2, 16, 16), 77, np.uint8)
    mp4 = bytearray(make_test_mp4_h264(frames))
    # build a decoy audio trak (mp4a stsd, no stsz/stsc) and splice
    # it BEFORE the video trak inside moov
    mp4a = bytes(6) + _s.pack(">H", 1) + bytes(20)
    stsd = bytes(4) + _s.pack(">I", 1) + _box(b"mp4a", mp4a)
    audio_trak = _box(b"trak", _box(b"mdia", _box(
        b"minf", _box(b"stbl", _box(b"stsd", stsd)))))
    i = bytes(mp4).find(b"moov")
    insert_at = i + 4          # right after the moov header
    out = bytes(mp4[:insert_at]) + audio_trak + bytes(mp4[insert_at:])
    # fix the moov box length
    (old_len,) = _s.unpack_from(">I", out, i - 4)
    out = (out[:i - 4]
           + _s.pack(">I", old_len + len(audio_trak))
           + out[i:])
    assert np.array_equal(mp4_h264_frames(out), frames)


class TestMp4Mjpeg:
    """Motion-JPEG tracks (QTFF jpeg sample entry): per-sample JPEG
    decode through the from-scratch baseline codec."""

    def test_mjpeg_roundtrip_ocr(self):
        from lexoid_spark.kernels.mp4_avc import (
            make_test_mp4_mjpeg, mp4_video_frames)
        from lexoid_spark.kernels.ocr_glyph import (
            recognize_pixels, render_text)

        texts = ["MJPG F %d" % i for i in range(3)]
        fr = [render_text(t, scale=2) for t in texts]
        H = max(a.shape[0] for a in fr)
        W = max(a.shape[1] for a in fr)
        padded = np.stack([
            np.pad(a, ((0, H - a.shape[0]), (0, W - a.shape[1])),
                   constant_values=255) for a in fr])
        frames = mp4_video_frames(make_test_mp4_mjpeg(padded))
        assert frames.shape == (3, H, W)
        assert [recognize_pixels(f)[0] for f in frames] == texts

    def test_mjpeg_dispatches_from_multimodal(self):
        from lexoid_spark.functions.multimodal import decode_video_frames
        from lexoid_spark.kernels.mp4_avc import make_test_mp4_mjpeg

        frames = np.full((2, 16, 16), 128, np.uint8)
        got = decode_video_frames(make_test_mp4_mjpeg(frames))
        assert got.shape == (2, 16, 16)

    def test_bad_jpeg_sample_is_typed(self):
        from lexoid_spark.kernels.mp4_avc import (
            Mp4Error, make_test_mp4_mjpeg, mp4_video_frames)

        frames = np.full((1, 16, 16), 200, np.uint8)
        mp4 = bytearray(make_test_mp4_mjpeg(frames))
        # corrupt the JPEG magic of the first (only) sample in mdat
        soi = mp4.find(b"\xff\xd8\xff")
        assert soi > 0
        mp4[soi] = 0x00
        with pytest.raises(Mp4Error):
            mp4_video_frames(bytes(mp4))

    def test_truncation_never_crashes_untyped(self):
        from lexoid_spark.kernels.mp4_avc import (
            Mp4Error, make_test_mp4_mjpeg, mp4_video_frames)
        from lexoid_spark.kernels.jpeg_codec import JpegError

        mp4 = make_test_mp4_mjpeg(np.full((2, 16, 16), 77, np.uint8))
        for cut in range(1, len(mp4), 97):
            try:
                mp4_video_frames(mp4[:cut])
            except (Mp4Error, JpegError):
                pass
