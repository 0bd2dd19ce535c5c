"""Real JPEG metadata: SOF marker walk (kernels/jpeg_meta.py) and the
image_meta / resize wiring for wild JPEG bytes."""

import struct

from lexoid_spark.kernels.jpeg_meta import jpeg_header, make_test_jpeg_header


class TestHeader:
    def test_sof0_dims(self):
        b = make_test_jpeg_header(640, 480, 3)
        assert jpeg_header(b) == (640, 480, 3)

    def test_grayscale_and_cmyk(self):
        assert jpeg_header(make_test_jpeg_header(10, 20, 1)) == (10, 20, 1)
        assert jpeg_header(make_test_jpeg_header(10, 20, 4)) == (10, 20, 4)

    def test_progressive_sof2(self):
        b = bytearray(make_test_jpeg_header(99, 44, 3))
        b[b.index(b"\xff\xc0") + 1] = 0xC2
        assert jpeg_header(bytes(b)) == (99, 44, 3)

    def test_dht_before_sof_is_skipped(self):
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
        b = make_test_jpeg_header(31, 17, 3)
        spliced = b[:2] + dht + b[2:]
        assert jpeg_header(spliced) == (31, 17, 3)

    def test_non_jpeg_and_truncated(self):
        assert jpeg_header(b"not a jpeg") is None
        assert jpeg_header(None) is None
        assert jpeg_header(b"\xff\xd8\xff\xe0\x00") is None
        assert jpeg_header(b"\xff\xd8\xff\xd9") is None  # EOI, no SOF


class TestSparkWiring:
    def test_image_meta_reads_jpeg_dims(self, spark):
        from lexoid_spark.functions.multimodal import image_meta

        rows = [(0, bytearray(make_test_jpeg_header(320, 240, 3))),
                (1, bytearray(make_test_jpeg_header(64, 48, 1)))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {r["id"]: r for r in image_meta(df).collect()}
        assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (
            320, 240, 3)
        assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (
            64, 48, 1)
        assert got[0]["error"] is None

    def test_resize_rule_applies_payload_behind_seam(self, spark):
        from lexoid_spark.functions.multimodal import resize_image_meta

        df = spark.createDataFrame(
            [(0, bytearray(make_test_jpeg_header(2000, 1000, 3)))],
            "id long, payload binary")
        (row,) = resize_image_meta(df, max_size=1000).collect()
        assert (row["new_width"], row["new_height"]) == (1000, 500)
        assert row["resized"] is True
        assert row["payload"] is None  # pixel re-encode needs real codec
