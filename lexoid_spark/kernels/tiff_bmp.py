"""BMP and TIFF dimension/metadata readers on the stdlib — the cheap
O(header) probes for the image-metadata family. Pixel DECODING for
both formats lives in :mod:`lexoid_spark.kernels.tiff_codec`
(TIFF 6.0 baseline incl. CCITT G3/G4/LZW/PackBits strips; BMP 8/24-bit
BI_RGB), so standalone TIFF/BMP documents route through the OCR arm.

BMP: BITMAPFILEHEADER (14 bytes, 'BM') + BITMAPINFOHEADER — width at
offset 18 (le32), height at 22 (le32, negative = top-down), bit depth
at 28 (le16).

TIFF: byte-order mark ('II' little / 'MM' big) + magic 42 + first IFD
offset; the IFD is a count-prefixed array of 12-byte entries
(tag, type, count, value/offset). Tags read: 256 ImageWidth,
257 ImageLength, 277 SamplesPerPixel (default 1). SHORT(3) and
LONG(4) inline values handled — the layouts every scanner/camera
writer emits for these tags.
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


def bmp_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from a BMP, or None if not BMP.
    Channels = bit_depth // 8 floored to >= 1; height is reported
    positive for top-down (negative-height) files."""
    if b is None or len(b) < 30 or bytes(b[:2]) != BMP_MAGIC:
        return None
    b = bytes(b)
    # only BITMAPINFOHEADER-and-later (header size >= 40): the OS/2
    # BITMAPCOREHEADER packs 16-bit dims at different offsets and
    # would mis-parse as garbage instead of rejecting
    if struct.unpack("<I", b[14:18])[0] < 40:
        return None
    w = struct.unpack("<i", b[18:22])[0]
    h = struct.unpack("<i", b[22:26])[0]
    bits = struct.unpack("<H", b[28:30])[0]
    if w <= 0 or h == 0:
        return None
    return w, abs(h), max(1, bits // 8)


def tiff_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, samples_per_pixel) from a TIFF's first IFD, or
    None if not TIFF / malformed."""
    if b is None or len(b) < 8:
        return None
    b = bytes(b)
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(endian + "I", b[4:8])
    if ifd_off + 2 > len(b):
        return None
    (n_entries,) = struct.unpack(endian + "H", b[ifd_off:ifd_off + 2])
    vals = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(b):
            return None
        tag, typ = struct.unpack(endian + "HH", b[e:e + 4])
        if tag not in (256, 257, 277):
            continue
        if typ == 3:       # SHORT, inline in the first 2 value bytes
            (v,) = struct.unpack(endian + "H", b[e + 8:e + 10])
        elif typ == 4:     # LONG, inline
            (v,) = struct.unpack(endian + "I", b[e + 8:e + 12])
        else:
            continue
        vals[tag] = v
    if 256 not in vals or 257 not in vals:
        return None
    return vals[256], vals[257], vals.get(277, 1)


def build_bmp(width: int, height: int, bits: int = 24) -> bytes:
    """Minimal valid BMP (headers + zeroed pixel rows) — fixture
    twin of :func:`bmp_header`."""
    row = (width * (bits // 8) + 3) & ~3
    pixels = b"\x00" * (row * height)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits, 0,
                       len(pixels), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels),
                           0, 0, 14 + 40)
    return file_hdr + info + pixels


def build_tiff(width: int, height: int, samples: int = 3,
               big_endian: bool = False) -> bytes:
    """Minimal single-IFD TIFF — fixture twin of :func:`tiff_header`."""
    endian = ">" if big_endian else "<"
    head = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        endian + "I", 8)
    entries = [
        struct.pack(endian + "HHIHH", 256, 3, 1, width, 0),
        struct.pack(endian + "HHIHH", 257, 3, 1, height, 0),
        struct.pack(endian + "HHIHH", 277, 3, 1, samples, 0),
    ]
    ifd = struct.pack(endian + "H", len(entries)) + b"".join(entries) \
        + struct.pack(endian + "I", 0)
    return head + ifd
