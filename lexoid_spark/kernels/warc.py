"""WARC (ISO 28500 / WARC/1.x) record reader on the stdlib.

The north-star input is a Common-Crawl-style table of web pages; the
raw form Common Crawl actually ships is concatenated WARC records
(version line, named headers, Content-Length-delimited payload, CRLF
framing). This kernel splits a WARC blob into records and strips the
HTTP envelope from response payloads, so crawl archives can be
exploded into the (url, warc_ts, html) rows the extraction pipeline
expects. The reference has no WARC path (Lexoid parses one document
per call — ``api.py:235-441``); this is ingestion the scale tier
needs, not behavior parity.

Pure bytes → list-of-dicts, no Spark imports: the Spark seam lives in
``lexoid_spark.sources.warc`` as a row-expanding ``mapInPandas``.
"""

from __future__ import annotations

import zlib

WARC_MAGIC = b"WARC/"
_GZ_MAGIC = b"\x1f\x8b"
# zip-bomb cap: a hostile blob must fail TYPED before allocating
# unbounded inflated bytes (a ~1000:1 deflate bomb would otherwise
# turn a 1 MB input into a GB-scale allocation inside an executor)
MAX_INFLATED = 1 << 28


class WarcError(ValueError):
    """Malformed WARC framing (caller quarantines the blob)."""


def _gunzip_members(b: bytes) -> bytes:
    """Concatenated gzip members → concatenated plain bytes — the
    actual Common-Crawl ``.warc.gz`` layout (ONE member per record so
    readers can seek to an offset and inflate just that record;
    RFC 1952 allows member concatenation). ``zlib`` with ``wbits=31``
    stops at each member boundary and exposes the remainder as
    ``unused_data``. Inflated size is capped at :data:`MAX_INFLATED`
    (hostile deflate bombs → typed error, never an allocation)."""
    out = bytearray()
    rest = b
    while rest[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(rest, MAX_INFLATED + 1 - len(out))
        except zlib.error as e:
            raise WarcError(f"bad gzip member: {e}") from e
        if len(out) > MAX_INFLATED or d.unconsumed_tail:
            raise WarcError("inflated WARC exceeds cap")
        if not d.eof:
            raise WarcError("truncated gzip member")
        rest = d.unused_data
    if rest.strip(b"\r\n"):
        raise WarcError("trailing bytes after gzip members")
    return bytes(out)


def warc_records(b: bytes) -> list[dict]:
    """Split a concatenated-WARC blob into records.

    Each record: ``WARC/x.y CRLF`` + ``Name: value`` header lines +
    blank line + exactly ``Content-Length`` payload bytes; records are
    separated by (any number of) CRLFs. Header names are
    case-insensitive per the spec. Returns dicts with keys
    ``warc_type``, ``url`` (WARC-Target-URI), ``warc_date``,
    ``payload`` (raw bytes, HTTP envelope NOT stripped).
    """
    if b is None:
        return []
    b = bytes(b)
    if b[:2] == _GZ_MAGIC:           # .warc.gz: per-record gzip members
        b = _gunzip_members(b)
    recs: list[dict] = []
    pos, n = 0, len(b)
    while pos < n:
        while b[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        eoh = b.find(b"\r\n\r\n", pos)
        if eoh < 0:
            raise WarcError("unterminated WARC header block")
        head = b[pos:eoh].decode("utf-8", errors="replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise WarcError(f"bad version line: {head[0][:40]!r}")
        fields: dict[str, str] = {}
        for line in head[1:]:
            name, _, value = line.partition(":")
            fields[name.strip().lower()] = value.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError as e:
            raise WarcError("missing/bad Content-Length") from e
        body = b[eoh + 4:eoh + 4 + clen]
        if len(body) != clen:
            raise WarcError("truncated payload")
        recs.append({
            "warc_type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "payload": body,
        })
        pos = eoh + 4 + clen
    return recs


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer coding → plain bytes. Chunk-size
    lines are hex with optional ``;ext``; the terminal 0-chunk may be
    followed by trailer fields (skipped). Malformed framing raises."""
    out = bytearray()
    pos, n = 0, len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise WarcError("unterminated chunk-size line")
        size_str = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_str, 16)
        except ValueError as e:
            raise WarcError("bad chunk size") from e
        if size < 0 or size > MAX_INFLATED - len(out):
            raise WarcError("chunked body exceeds cap")
        if size == 0:
            return bytes(out)        # trailers (if any) ignored
        pos = eol + 2
        if pos + size + 2 > n:
            raise WarcError("truncated chunk")
        out += body[pos:pos + size]
        if body[pos + size:pos + size + 2] != b"\r\n":
            raise WarcError("chunk missing CRLF terminator")
        pos = pos + size + 2


def _decode_content(body: bytes, coding: str) -> bytes:
    """``Content-Encoding`` decode: gzip / x-gzip / deflate (both the
    zlib-wrapped and raw-deflate dialects real servers emit) /
    identity. Unknown codings raise (→ quarantine, never garble)."""
    if coding in ("", "identity"):
        return body
    if coding in ("gzip", "x-gzip"):
        d = zlib.decompressobj(wbits=31)
    elif coding == "deflate":
        # RFC says zlib-wrapped; many servers send raw deflate —
        # wbits=-15 fallback below
        d = zlib.decompressobj(wbits=15)
    else:
        raise WarcError(f"unsupported Content-Encoding {coding!r}")
    try:
        out = d.decompress(body, MAX_INFLATED + 1)
    except zlib.error:
        if coding != "deflate":
            raise WarcError("bad compressed HTTP body") from None
        d = zlib.decompressobj(wbits=-15)
        try:
            out = d.decompress(body, MAX_INFLATED + 1)
        except zlib.error as e:
            raise WarcError("bad deflate HTTP body") from e
    if len(out) > MAX_INFLATED or d.unconsumed_tail:
        raise WarcError("inflated HTTP body exceeds cap")
    return out


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a WARC response payload
    (status line + headers up to the first blank line), undoing
    ``Transfer-Encoding: chunked`` framing and ``Content-Encoding``
    gzip/deflate compression when the headers declare them — wild
    WARC captures store the response bytes AS SENT. Payloads that
    don't start with ``HTTP/`` pass through unchanged; malformed
    framing raises (→ quarantine)."""
    if payload[:5] != b"HTTP/":
        return payload
    i = payload.find(b"\r\n\r\n")
    if i < 0:
        return payload
    body = payload[i + 4:]
    te = ce = ""
    for line in payload[:i].split(b"\r\n")[1:]:
        name, _, value = line.partition(b":")
        lname = name.strip().lower()
        if lname == b"transfer-encoding":
            te = value.strip().lower().decode("latin-1")
        elif lname == b"content-encoding":
            ce = value.strip().lower().decode("latin-1")
    if "chunked" in te:
        body = _dechunk(body)
    return _decode_content(body, ce)


def build_record(warc_type: str, url: str, date: str,
                 payload: bytes, gz: bool = False) -> bytes:
    """Serialize one WARC record (test/fixture helper — the framing
    rules are the same ones ``warc_records`` enforces). ``gz=True``
    wraps the record in its own gzip member (the Common-Crawl
    ``.warc.gz`` layout); zlib writes MTIME 0 for ``wbits=31``
    streams, so the bytes stay deterministic."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    rec = head + payload + b"\r\n\r\n"
    if not gz:
        return rec
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    return c.compress(rec) + c.flush()
