"""Real JPEG metadata on the stdlib: walk the marker stream to the
first SOF (start-of-frame) segment and read height/width/components.

Full pixel decode (DCT + Huffman) stays behind the multimodal layer's
real-codec seam — but dimensions/channels, which is what routing and
the resize RULE need, are read from real wild JPEG bytes here (SOF0
baseline, SOF1/2 extended/progressive, and the other non-differential
SOF markers).
"""

from __future__ import annotations

import struct

JPEG_MAGIC = b"\xff\xd8\xff"

# SOF markers carrying frame headers (excludes DHT/JPG/DAC: C4, C8, CC)
_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM: no length


def jpeg_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, components) from the first SOF segment, or None
    if the payload is not a parseable JPEG."""
    if b is None:
        return None
    b = bytes(b)
    if not b.startswith(JPEG_MAGIC):
        return None
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None  # marker stream out of sync
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in _STANDALONE:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        if pos + 4 > n:
            return None
        (seg_len,) = struct.unpack(">H", b[pos + 2:pos + 4])
        if seg_len < 2:
            return None
        if marker in _SOF_MARKERS:
            if pos + 2 + seg_len > n or seg_len < 8:
                return None
            _prec, h, w, comps = struct.unpack(
                ">BHHB", b[pos + 4:pos + 10])
            return w, h, comps
        pos += 2 + seg_len
    return None


def make_test_jpeg_header(width: int, height: int,
                          components: int = 3) -> bytes:
    """Minimal marker-valid JPEG prefix (SOI + APP0 + SOF0) for tests
    and oracled queries — parseable dims without pixel data."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, height, width, components)
    sof += bytes([1, 0x11, 0]) * components
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9")
