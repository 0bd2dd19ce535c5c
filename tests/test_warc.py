"""WARC kernel + source seam: framing round trips, envelope strip,
quarantine-not-fail (the Common-Crawl-style ingestion path)."""

import pytest

from lexoid_spark.kernels.warc import (
    WarcError,
    build_record,
    http_body,
    warc_records,
)


class TestWarcKernel:
    def test_round_trip_single(self):
        blob = build_record("response", "https://a.example/x",
                            "2024-01-01T00:00:00Z", b"<html>hi</html>")
        recs = warc_records(blob)
        assert len(recs) == 1
        r = recs[0]
        assert r["warc_type"] == "response"
        assert r["url"] == "https://a.example/x"
        assert r["warc_date"] == "2024-01-01T00:00:00Z"
        assert r["payload"] == b"<html>hi</html>"

    def test_concatenated_records(self):
        blob = b"".join(
            build_record("response", f"https://e/{i}", "2024-01-01",
                         b"x" * i)
            for i in range(1, 5)
        )
        recs = warc_records(blob)
        assert [len(r["payload"]) for r in recs] == [1, 2, 3, 4]

    def test_payload_may_contain_crlf_crlf(self):
        # Content-Length framing, not delimiter scanning: a payload
        # containing the header terminator must not split the record
        payload = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<body>\r\n\r\n</body>"
        blob = build_record("response", "u", "d", payload)
        recs = warc_records(blob)
        assert len(recs) == 1
        assert recs[0]["payload"] == payload
        assert http_body(recs[0]["payload"]) == b"<body>\r\n\r\n</body>"

    def test_header_names_case_insensitive(self):
        raw = (b"WARC/1.0\r\nwarc-type: request\r\n"
               b"WARC-TARGET-URI: u\r\ncontent-length: 2\r\n\r\nok")
        recs = warc_records(raw)
        assert recs[0]["warc_type"] == "request"
        assert recs[0]["payload"] == b"ok"

    def test_truncated_payload_raises(self):
        blob = build_record("response", "u", "d", b"full payload")
        with pytest.raises(WarcError):
            warc_records(blob[:-10])

    def test_bad_version_line_raises(self):
        with pytest.raises(WarcError):
            warc_records(b"NOPE/1.0\r\nContent-Length: 0\r\n\r\n")

    def test_http_body_passthrough_for_raw(self):
        assert http_body(b"<html>no envelope</html>") == \
            b"<html>no envelope</html>"

    def test_empty_blob(self):
        assert warc_records(b"") == []
        assert warc_records(None) == []


class TestWarcSource:
    def test_explode_and_quarantine(self, spark):
        from lexoid_spark.sources.warc import read_warc_blobs

        good = b"".join(
            build_record(
                "response", f"https://e/{i}", "2024-01-01",
                b"HTTP/1.1 200 OK\r\n\r\n<html>%d</html>" % i)
            for i in range(3)
        )
        bad = b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"
        df = spark.createDataFrame([(0, good), (1, bad)],
                                   "id long, data binary")
        rows = read_warc_blobs(df, "id", "data").collect()
        ok = [r for r in rows if r["error"] is None]
        err = [r for r in rows if r["error"] is not None]
        assert len(ok) == 3 and len(err) == 1
        # HTTP envelope stripped from response payloads
        assert sorted(bytes(r["payload"]) for r in ok) == [
            b"<html>0</html>", b"<html>1</html>", b"<html>2</html>"]
        assert err[0]["id"] == 1 and err[0]["rec_idx"] is None

    def test_no_strip_keeps_envelope(self, spark):
        from lexoid_spark.sources.warc import read_warc_blobs

        payload = b"HTTP/1.1 200 OK\r\n\r\nbody"
        blob = build_record("response", "u", "d", payload)
        df = spark.createDataFrame([(0, blob)], "id long, data binary")
        r = read_warc_blobs(df, "id", "data", strip_http=False).collect()[0]
        assert bytes(r["payload"]) == payload


class TestWarcExtractJob:
    def test_warc_input_end_to_end(self, spark, tmp_path):
        """WARC blobs parquet → run_extract_job(input_format='warc')
        → extracted markdown + malformed-blob quarantine rows."""
        from lexoid_spark.plans.job import read_extracted, run_extract_job

        html = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                b"<html><body><h1>Title %d</h1><p>body text</p>"
                b"</body></html>")
        good = b"".join(
            build_record("response", f"https://w.test/{i}",
                         "2024-01-01T00:00:00Z", html % i)
            for i in range(4)
        )
        bad = b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
        blobs = spark.createDataFrame(
            [(0, good), (1, bad)], "id long, data binary")
        inp = str(tmp_path / "warc_blobs")
        blobs.write.parquet(inp)

        out_dir = str(tmp_path / "out")
        res = run_extract_job(
            spark, inp, out_dir, run_id="w1", n_buckets=2,
            group_size=2, input_format="warc")
        assert res.n_docs == 4
        ext = read_extracted(spark, out_dir)
        rows = {r["url"]: r for r in ext.collect()}
        assert set(rows) == {f"https://w.test/{i}" for i in range(4)}
        assert "Title 2\n=======" in rows["https://w.test/2"]["raw"]
        assert "body text" in rows["https://w.test/2"]["raw"]
        errs = spark.read.parquet(out_dir + "/errors/bucket=*").collect()
        assert [e["url"] for e in errs] == ["warc:1"]
        assert errs[0]["stage"] == "warc_ingest"


class TestWarcStreaming:
    def test_incremental_warc_ingest(self, spark, tmp_path):
        """Continuous crawl ingestion: WARC blobs land incrementally,
        each microbatch explodes + extracts, malformed blobs reach the
        errors sink with stage warc_ingest."""
        from lexoid_spark.streaming.incremental import incremental_extract

        good = b"".join(
            build_record(
                "response", f"https://s.test/{i}", "2024-01-01T00:00:00Z",
                b"HTTP/1.1 200 OK\r\n\r\n<html><body><p>p %d</p></body>"
                b"</html>" % i)
            for i in range(3)
        )
        bad = b"WARC/1.0\r\nContent-Length: 77\r\n\r\nnope"
        inp = tmp_path / "landing"
        inp.mkdir()
        spark.createDataFrame([(0, good), (1, bad)],
                              "id long, data binary").write.parquet(
            str(inp / "f1"))
        out = str(tmp_path / "out")
        errs = str(tmp_path / "errs")
        incremental_extract(
            spark, str(inp) + "/*", out, str(tmp_path / "ckpt"),
            errors_dir=errs, input_format="warc")
        ext = spark.read.parquet(out + "/batch=*")
        assert ext.count() == 3
        assert {r["url"] for r in ext.select("url").collect()} == {
            f"https://s.test/{i}" for i in range(3)}
        er = spark.read.parquet(errs + "/batch=*").collect()
        assert [(e["url"], e["stage"]) for e in er] == [
            ("warc:1", "warc_ingest")]


class TestWarcGzip:
    """.warc.gz: per-record gzip members — the layout Common Crawl
    actually ships (seekable member-per-record, RFC 1952
    concatenation)."""

    def test_member_per_record_round_trip(self):
        blob = b"".join(
            build_record("response", f"https://g/{i}",
                         "2024-01-01T00:00:00Z",
                         f"HTTP/1.1 200 OK\r\n\r\nbody {i}".encode(),
                         gz=True)
            for i in range(7)
        )
        recs = warc_records(blob)
        assert [r["url"] for r in recs] == [
            f"https://g/{i}" for i in range(7)]
        assert recs[4]["payload"].endswith(b"body 4")

    def test_deterministic_bytes(self):
        a = build_record("response", "https://g/0", "d", b"p", gz=True)
        b = build_record("response", "https://g/0", "d", b"p", gz=True)
        assert a == b
        assert a[:8] == b"\x1f\x8b\x08\x00\x00\x00\x00\x00"  # MTIME 0

    def test_whole_blob_single_member_also_reads(self):
        # some writers gzip the whole archive as ONE member — the
        # member walk handles that too
        import zlib

        plain = b"".join(
            build_record("response", f"https://w/{i}", "d", b"x")
            for i in range(3))
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        blob = c.compress(plain) + c.flush()
        assert len(warc_records(blob)) == 3

    def test_truncated_member_quarantines(self):
        blob = build_record("response", "https://g/0", "d",
                            b"HTTP/1.1 200 OK\r\n\r\n" + b"y" * 500,
                            gz=True)
        with pytest.raises(WarcError):
            warc_records(blob[:-6])

    def test_trailing_garbage_quarantines(self):
        blob = build_record("response", "https://g/0", "d", b"p",
                            gz=True)
        with pytest.raises(WarcError):
            warc_records(blob + b"not gzip")

    def test_zip_bomb_caps_typed(self, monkeypatch):
        import zlib

        import lexoid_spark.kernels.warc as wk

        monkeypatch.setattr(wk, "MAX_INFLATED", 1 << 16)
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        bomb = c.compress(b"\x00" * (1 << 20)) + c.flush()
        assert len(bomb) < 1 << 16          # compresses ~1000:1
        with pytest.raises(WarcError, match="cap"):
            warc_records(bomb)


class TestHttpTransferAndContentCoding:
    """Wild WARC captures store responses AS SENT: chunked transfer
    framing and gzip/deflate content coding must be undone before the
    bytes reach the extraction kernels; malformed framing quarantines
    per record."""

    DOC = b"<html><body>hello coded world</body></html>"

    def _chunk(self, body):
        out = b""
        for piece in (body[:9], body[9:20], body[20:]):
            out += f"{len(piece):x}".encode() + b"\r\n" + piece + b"\r\n"
        return out + b"0\r\n\r\n"

    def test_chunked(self):
        p = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             + self._chunk(self.DOC))
        assert http_body(p) == self.DOC

    @pytest.mark.parametrize("coding,wbits", [
        ("gzip", 31), ("x-gzip", 31), ("deflate", 15), ("deflate", -15),
    ])
    def test_content_encodings(self, coding, wbits):
        import zlib

        c = zlib.compressobj(9, zlib.DEFLATED, wbits)
        p = (f"HTTP/1.1 200 OK\r\nContent-Encoding: {coding}\r\n\r\n"
             .encode() + c.compress(self.DOC) + c.flush())
        assert http_body(p) == self.DOC

    def test_chunked_plus_gzip(self):
        import zlib

        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        gz = c.compress(self.DOC) + c.flush()
        p = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
             b"Content-Encoding: gzip\r\n\r\n" + self._chunk(gz))
        assert http_body(p) == self.DOC

    def test_malformed_and_unknown_raise_typed(self):
        with pytest.raises(WarcError):
            http_body(b"HTTP/1.1 200 OK\r\n"
                      b"Transfer-Encoding: chunked\r\n\r\nzz\r\n")
        with pytest.raises(WarcError, match="Content-Encoding"):
            http_body(b"HTTP/1.1 200 OK\r\n"
                      b"Content-Encoding: br\r\n\r\nxx")

    def test_per_record_isolation_in_source(self, spark):
        from lexoid_spark.sources.warc import read_warc_blobs

        good = build_record(
            "response", "https://c.test/good", "2024-01-01T00:00:00Z",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + self._chunk(self.DOC))
        bad = build_record(
            "response", "https://c.test/bad", "2024-01-01T00:00:00Z",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"not-hex\r\n")
        df = spark.createDataFrame([(0, bytearray(good + bad))],
                                   "id long, data binary")
        out = {r["url"]: (bytes(r["payload"]) if r["payload"] is not None
                          else None, r["error"])
               for r in read_warc_blobs(df).collect()}
        assert out["https://c.test/good"] == (self.DOC, None)
        assert out["https://c.test/bad"][0] is None
        assert "chunk" in out["https://c.test/bad"][1]


class TestWetWriter:
    """write_wet_blobs: the WET-format output twin of the read arm."""

    def test_roundtrip_and_shard_determinism(self, spark):
        from lexoid_spark.sources.warc import (
            read_warc_blobs, write_wet_blobs)

        rows = [(f"https://s.example/{i}", "2024-01-01T00:00:00Z",
                 f"text {i} héllo") for i in range(12)]
        df = spark.createDataFrame(
            rows, "url string, warc_date string, text string")
        wet = write_wet_blobs(df, n_shards=4, gz=True)
        got = wet.collect()
        assert sum(r["n_records"] for r in got) == 12
        assert {r["shard"] for r in got} <= set(range(4))
        # identical input → identical bytes (deterministic gzip + order)
        again = {r["shard"]: bytes(r["wet"])
                 for r in write_wet_blobs(df, n_shards=4, gz=True).collect()}
        assert {r["shard"]: bytes(r["wet"]) for r in got} == again
        back = read_warc_blobs(
            wet.selectExpr("cast(shard as long) as id", "wet as data"))
        texts = {r["url"]: bytes(r["payload"]).decode()
                 for r in back.collect()}
        assert texts == {u: t for u, _d, t in rows}
