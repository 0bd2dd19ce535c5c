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

WARC_MAGIC = b"WARC/"


class WarcError(ValueError):
    """Malformed WARC framing (caller quarantines the blob)."""


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


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a WARC response payload
    (status line + headers up to the first blank line); payloads that
    don't start with ``HTTP/`` pass through unchanged."""
    if payload[:5] == b"HTTP/":
        i = payload.find(b"\r\n\r\n")
        if i >= 0:
            return payload[i + 4:]
    return payload


def build_record(warc_type: str, url: str, date: str,
                 payload: bytes) -> bytes:
    """Serialize one WARC record (test/fixture helper — the framing
    rules are the same ones ``warc_records`` enforces)."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"
