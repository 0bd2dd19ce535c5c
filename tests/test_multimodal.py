"""Multimodal binary-column plumbing: codec round-trip, mapInPandas
batch shape, row expansion, resize rule parity with the reference
(utils.py:65-89 resize_image_if_needed, max-dim clamp)."""

import pytest
from pyspark.sql import functions as F

from lexoid_spark.functions.multimodal import (
    decode_image_header,
    decode_image_pixels,
    decode_video_header,
    encode_fake_image,
    encode_fake_video,
    fake_image_udf,
    fake_video_udf,
    frame_sample,
    image_meta,
    resize_image_meta,
)


def test_codec_roundtrip():
    assert decode_image_header(encode_fake_image(640, 480, 3)) == (640, 480, 3)
    assert decode_video_header(encode_fake_video(320, 240, 99)) == (320, 240, 99)
    assert decode_image_header(b"PNG\x89junk") is None
    assert decode_image_header(None) is None
    assert decode_image_header(b"IMG!") is None  # truncated header


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_pixels(encode_fake_image(2, 2, 1))


def test_image_meta_and_quarantine(spark):
    df = spark.createDataFrame(
        [(1, encode_fake_image(100, 50, 3)),
         (2, encode_fake_image(2000, 1000, 1)),
         (3, b"not an image")],
        "id long, payload binary",
    )
    got = {r["id"]: r for r in image_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (100, 50, 3)
    assert got[2]["width"] == 2000
    assert got[3]["error"] == "bad_magic" and got[3]["width"] is None


def test_resize_rule_matches_reference_semantics(spark):
    df = spark.createDataFrame(
        [(1, encode_fake_image(2000, 1000, 3)),   # downscale 2x
         (2, encode_fake_image(500, 300, 3)),     # untouched
         (3, encode_fake_image(999, 1001, 1))],   # h is the max dim
        "id long, payload binary",
    )
    got = {r["id"]: r for r in resize_image_meta(df, max_size=1000).collect()}
    assert (got[1]["new_width"], got[1]["new_height"], got[1]["resized"]) == (
        1000, 500, True)
    assert (got[2]["new_width"], got[2]["resized"]) == (500, False)
    assert got[3]["new_height"] == 1000
    assert got[3]["new_width"] == int(999 * (1000 / 1001))
    # re-encoded payload decodes to the new dims
    assert decode_image_header(got[1]["payload"])[:2] == (1000, 500)


def test_frame_sample_expands_rows(spark):
    df = spark.createDataFrame(
        [(1, encode_fake_video(320, 240, 25)),
         (2, encode_fake_video(320, 240, 3)),
         (3, b"garbage")],
        "id long, payload binary",
    )
    rows = frame_sample(df, every_n=10).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 10, 20]
    assert by_id[2] == [0]
    assert 3 not in by_id  # undecodable video yields no frames


def test_fake_udfs_vectorized(spark):
    df = spark.range(5).select(
        F.col("id"),
        fake_image_udf(
            (F.col("id") + 10).cast("int"), F.lit(20), F.lit(3)
        ).alias("img"),
        fake_video_udf(F.lit(8), F.lit(8), (F.col("id") + 1).cast("int")
                       ).alias("vid"),
    )
    got = {r["id"]: r for r in df.collect()}
    assert decode_image_header(got[4]["img"]) == (14, 20, 3)
    assert decode_video_header(got[2]["vid"]) == (8, 8, 3)


def test_audio_meta_and_error(spark):
    from lexoid_spark.functions.multimodal import audio_meta, encode_fake_audio

    rows = [(1, encode_fake_audio(16000, 48000)), (2, b"not audio")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in audio_meta(df).collect()}
    assert (got[1]["sample_rate"], got[1]["n_samples"]) == (16000, 48000)
    assert got[1]["duration_sec"] == 3.0 and got[1]["error"] is None
    assert got[2]["error"] == "bad_magic"


def test_audio_chunks_cover_exactly(spark):
    from lexoid_spark.functions.multimodal import (
        audio_chunks,
        encode_fake_audio,
    )

    # 100 Hz, 650 samples, 3 s chunks (300 samples): 300+300+50
    df = spark.createDataFrame(
        [(7, encode_fake_audio(100, 650))], "id long, payload binary")
    got = [(r["chunk_idx"], r["start_sample"], r["n_samples"])
           for r in audio_chunks(df, chunk_sec=3.0).orderBy("chunk_idx").collect()]
    assert got == [(0, 0, 300), (1, 300, 300), (2, 600, 50)]
    total = sum(n for _, _, n in got)
    assert total == 650  # lossless cover, no overlap


class TestBmpTiff:
    def test_bmp_header_roundtrip(self):
        from lexoid_spark.kernels.tiff_bmp import bmp_header, build_bmp

        assert bmp_header(build_bmp(640, 480, bits=24)) == (640, 480, 3)
        assert bmp_header(build_bmp(10, 7, bits=8)) == (10, 7, 1)
        assert bmp_header(b"notbmp") is None

    def test_bmp_topdown_negative_height(self):
        import struct

        from lexoid_spark.kernels.tiff_bmp import bmp_header, build_bmp

        b = bytearray(build_bmp(20, 10))
        b[22:26] = struct.pack("<i", -10)  # top-down
        assert bmp_header(bytes(b)) == (20, 10, 3)

    def test_tiff_both_endians(self):
        from lexoid_spark.kernels.tiff_bmp import build_tiff, tiff_header

        assert tiff_header(build_tiff(321, 123, samples=3)) == (321, 123, 3)
        assert tiff_header(
            build_tiff(321, 123, samples=1, big_endian=True)) == (321, 123, 1)
        assert tiff_header(b"II*\x00\xff\xff\xff\xff") is None

    def test_image_meta_dispatch(self, spark):
        from lexoid_spark.functions.multimodal import image_meta
        from lexoid_spark.kernels.tiff_bmp import build_bmp, build_tiff

        df = spark.createDataFrame(
            [(0, build_bmp(33, 44)), (1, build_tiff(55, 66, samples=4))],
            "id long, payload binary")
        got = {r["id"]: r for r in
               image_meta(df, "id", "payload").collect()}
        assert (got[0]["width"], got[0]["height"], got[0]["channels"]) \
            == (33, 44, 3)
        assert (got[1]["width"], got[1]["height"], got[1]["channels"]) \
            == (55, 66, 4)
