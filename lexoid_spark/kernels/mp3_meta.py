"""MP3 (MPEG-1/2/2.5 Audio Layer III) frame-walk metadata on the
stdlib — the most common wild audio format. Walks every frame header
(11-bit sync, version/layer bits, the published bitrate and
sample-rate index tables, padding) so the sample count comes from the
ACTUAL frame sequence, VBR included — not from trusting one header.
ID3v2 prefix (syncsafe length) and ID3v1 trailer are skipped.

Metadata ONLY (the ``webp_meta``/``mp4_meta`` honesty class): Huffman
audio decode is out of scope; the audio pixel arms quarantine typed.
Layer I/II and free-format bitrates return None (→ not an MP3 for
routing purposes) rather than guessing.

Reference parity: none — Lexoid has no audio path; this serves the
``audio_meta`` operator family over wild crawls.
"""

from __future__ import annotations

from typing import Optional, Tuple

# Layer III bitrates (kbps) by version family, index 1..14
_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                  128, 160, 192, 224, 256, 320)
_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64,
                  80, 96, 112, 128, 144, 160)
# sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_RATES = {
    3: (44100, 48000, 32000),    # MPEG1
    2: (22050, 24000, 16000),    # MPEG2
    0: (11025, 12000, 8000),     # MPEG2.5
}
_MAX_FRAMES = 1 << 20


def _id3v2_size(b: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    if any(x & 0x80 for x in b[6:10]):
        return 0                      # malformed syncsafe size
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    return 10 + size


def _frame_at(b: bytes, pos: int):
    """Parse one Layer III frame header at ``pos`` →
    (frame_len, sample_rate, samples_per_frame) or None."""
    if pos + 4 > len(b):
        return None
    h0, h1, h2 = b[pos], b[pos + 1], b[pos + 2]
    if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
        return None
    version = (h1 >> 3) & 3           # 0=2.5, 1=reserved, 2=2, 3=1
    layer = (h1 >> 1) & 3             # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (h2 >> 4) & 0xF
    sr_idx = (h2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                   # free-format / bad indices
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    kbps = table[br_idx]
    rate = _RATES[version][sr_idx]
    padding = (h2 >> 1) & 1
    if version == 3:
        flen = (144000 * kbps) // rate + padding
        spf = 1152
    else:
        flen = (72000 * kbps) // rate + padding
        spf = 576
    if flen < 4:
        return None
    return flen, rate, spf


def looks_like_mp3(b) -> bool:
    b = bytes(b[:4096])
    pos = _id3v2_size(b)
    return _frame_at(b, pos) is not None


def mp3_header(b) -> Optional[Tuple[int, int, int]]:
    """MP3 bytes → (sample_rate, n_frames, n_samples) from walking
    every frame, or None when the bytes aren't a Layer III stream.
    The walk stops at the ID3v1 trailer or at the first non-frame
    byte run (truncated tails tolerated after ≥1 valid frame)."""
    b = bytes(b)
    end = len(b)
    if end >= 128 and b[end - 128:end - 125] == b"TAG":
        end -= 128                    # ID3v1 trailer
    pos = _id3v2_size(b)
    rate = None
    n_frames = 0
    n_samples = 0
    while pos + 4 <= end and n_frames < _MAX_FRAMES:
        f = _frame_at(b, pos)
        if f is None:
            break
        flen, r, spf = f
        if rate is None:
            rate = r
        elif r != rate:
            break                     # rate change: not one stream
        if pos + flen > end:
            break                     # truncated final frame
        n_frames += 1
        n_samples += spf
        pos += flen
    if n_frames == 0 or rate is None:
        return None
    return rate, n_frames, n_samples


# ---------------------------------------------------------------------------
# Fixture builder (corpus/tests only)
# ---------------------------------------------------------------------------


def make_test_mp3(n_frames: int, kbps: int = 128, rate: int = 44100,
                  id3: bool = True) -> bytes:
    """Deterministic CBR MPEG-1 Layer III byte stream: valid frame
    headers with zeroed audio payloads (a METADATA fixture — the
    decode arms quarantine it typed), optional ID3v2 prefix and
    ID3v1 trailer."""
    br_idx = _BITRATE_V1_L3.index(kbps)
    sr_idx = _RATES[3].index(rate)
    out = bytearray()
    if id3:
        body = b"\x00" * 22
        out += (b"ID3\x04\x00\x00"
                + bytes([(len(body) >> 21) & 0x7F,
                         (len(body) >> 14) & 0x7F,
                         (len(body) >> 7) & 0x7F,
                         len(body) & 0x7F])
                + body)
    flen = (144000 * kbps) // rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame = hdr + bytes(flen - 4)
    out += frame * n_frames
    out += b"TAG" + bytes(125)        # ID3v1 trailer
    return bytes(out)
