"""FLAC kernel tests: encoder↔decoder round-trips across block
sizes, channel counts and FIXED orders; CRC and typed-error
behavior; the audio surface dispatch (mirrors the raster-kernel test
files)."""

import numpy as np
import pytest

from lexoid_spark.kernels.flac import (
    FlacError,
    flac_decode,
    flac_encode,
    flac_header,
    make_test_flac,
)


class TestRoundtrip:
    @pytest.mark.parametrize("n", [1, 2, 100, 4096, 5000, 9000])
    @pytest.mark.parametrize("ch", [1, 2])
    def test_random_samples(self, n, ch):
        rng = np.random.default_rng(n + ch)
        s = rng.integers(-30000, 30000, (n, ch)).astype(np.int16)
        b = flac_encode(s, 44100, order=n % 3)
        assert flac_header(b) == (44100, ch, 16, n)
        out, rate = flac_decode(b)
        assert rate == 44100
        assert np.array_equal(out, s)

    @pytest.mark.parametrize("order", [0, 1, 2])
    def test_fixed_orders(self, order):
        # a ramp: order-2 prediction leaves near-zero residuals
        s = (np.arange(5000) % 4000).astype(np.int16)
        b = flac_encode(s, 16000, order=order)
        out, _ = flac_decode(b)
        assert np.array_equal(out[:, 0], s)

    def test_prediction_actually_compresses(self):
        s = (np.arange(8000) % 1000).astype(np.int16)
        b0 = flac_encode(s, 16000, order=0)
        b2 = flac_encode(s, 16000, order=2)
        assert len(b2) < len(b0) // 2

    def test_builder_pattern_matches_wav_twin(self):
        b = make_test_flac(16000, 3333, seed=5)
        out, rate = flac_decode(b)
        i = np.arange(3333, dtype=np.int64)
        want = ((i * 97 + 5 * 31) % 2048) - 1024
        assert rate == 16000 and np.array_equal(out[:, 0], want)


class TestTypedErrors:
    def test_crc_mismatch_raises(self):
        b = bytearray(make_test_flac(16000, 500, seed=1))
        b[60] ^= 0xFF
        with pytest.raises(FlacError):
            flac_decode(bytes(b))

    def test_fuzz_random_bytes_terminate_typed(self):
        rng = np.random.default_rng(71)
        for n in (0, 3, 17, 100, 700):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                flac_decode(blob)
            except FlacError:
                pass

    def test_fuzz_corrupted_valid_stream(self):
        rng = np.random.default_rng(72)
        b = make_test_flac(8000, 300, seed=2)
        frame_start = 4 + 4 + 34     # first byte past STREAMINFO
        for _ in range(40):
            i = int(rng.integers(4, len(b)))
            mut = bytearray(b)
            mut[i] ^= int(rng.integers(1, 256))
            try:
                flac_decode(bytes(mut))
                # only flips in the unprotected metadata prelude may
                # decode; every FRAME byte is CRC-covered
                assert i < frame_start
            except FlacError:
                pass

    def test_truncated_stream_raises(self):
        b = make_test_flac(8000, 5000, seed=3)
        with pytest.raises(FlacError):
            flac_decode(b[: len(b) - 10])


class TestAudioSurface:
    def test_header_dispatch(self):
        from lexoid_spark.functions.multimodal import decode_audio_header

        b = make_test_flac(22050, 777, seed=4)
        assert decode_audio_header(b) == (22050, 777)

    def test_samples_dispatch(self):
        from lexoid_spark.functions.multimodal import decode_audio_samples
        from lexoid_spark.kernels.wav_meta import make_test_wav

        fb = make_test_flac(16000, 200, seed=6)
        wb = make_test_wav(16000, 200, seed=6)
        assert np.array_equal(decode_audio_samples(fb),
                              decode_audio_samples(wb))

    def test_fake_container_raises(self):
        from lexoid_spark.functions.multimodal import (
            decode_audio_samples,
            encode_fake_audio,
        )

        with pytest.raises(ValueError, match="metadata-only"):
            decode_audio_samples(encode_fake_audio(16000, 100))


class TestLpcSubframes:
    @pytest.mark.parametrize("order", [1, 2])
    @pytest.mark.parametrize("ch", [1, 2])
    def test_lpc_roundtrip(self, order, ch):
        rng = np.random.default_rng(order * 10 + ch)
        s = rng.integers(-30000, 30000, (5000, ch)).astype(np.int16)
        b = flac_encode(s, 16000, order=order, lpc=True)
        out, _ = flac_decode(b)
        assert np.array_equal(out, s)

    def test_lpc_stream_really_carries_lpc(self):
        s = (np.arange(600) % 500).astype(np.int16)
        b_lpc = flac_encode(s, 16000, order=2, lpc=True)
        b_fix = flac_encode(s, 16000, order=2)
        assert b_lpc != b_fix
        assert np.array_equal(flac_decode(b_lpc)[0],
                              flac_decode(b_fix)[0])
