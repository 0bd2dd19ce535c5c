"""MP3 frame-walk metadata: index tables, padding arithmetic, ID3
skipping, truncation tolerance."""

from lexoid_spark.kernels.mp3_meta import (
    looks_like_mp3,
    make_test_mp3,
    mp3_header,
)


class TestMp3Header:
    def test_frame_walk_counts(self):
        b = make_test_mp3(7, kbps=128, rate=44100)
        assert looks_like_mp3(b)
        assert mp3_header(b) == (44100, 7, 7 * 1152)

    def test_all_rates_and_bitrates(self):
        for rate in (44100, 48000, 32000):
            for kbps in (32, 96, 320):
                got = mp3_header(make_test_mp3(3, kbps=kbps, rate=rate))
                assert got == (rate, 3, 3456), (rate, kbps)

    def test_id3_prefix_and_trailer_skipped(self):
        with_tags = make_test_mp3(5, id3=True)
        without = make_test_mp3(5, id3=False)
        assert mp3_header(with_tags) == mp3_header(without)

    def test_truncated_tail_tolerated(self):
        b = make_test_mp3(4, id3=False)
        # chop the ID3v1 trailer AND half the last frame
        b = b[:-128]
        b = b[:len(b) - 100]
        rate, n, samp = mp3_header(b)
        assert n == 3 and samp == 3 * 1152

    def test_non_mp3_returns_none(self):
        assert mp3_header(b"\x00" * 64) is None
        assert mp3_header(b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 20) is None
        assert not looks_like_mp3(b"RIFF....WAVE")

    def test_audio_header_dispatch(self):
        from lexoid_spark.functions.multimodal import decode_audio_header

        b = make_test_mp3(6, rate=48000)
        assert decode_audio_header(b) == (48000, 6 * 1152)
