"""Real WAV (RIFF/WAVE) metadata + PCM frames on the stdlib: chunk
walk to ``fmt `` and ``data``, so the audio operators read genuine
wild bytes — sample rate, channels, bit depth, sample count — instead
of only the FAKE container. PCM16 decode is exact (it's just bytes);
compressed codecs (MP3/AAC) stay behind the real-codec seam.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


class WavError(ValueError):
    """Malformed or unsupported WAV (caller quarantines)."""


def wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, n_channels, bits_per_sample, n_samples) from the
    fmt/data chunks, or None if not a RIFF/WAVE payload. ``n_samples``
    counts per-channel frames (data bytes / block align)."""
    if b is None or len(b) < 12:
        return None
    b = bytes(b)
    if b[:4] != WAV_MAGIC or b[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(b)
    sr = ch = bits = None
    data_len = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = pos + 8
        if cid == b"fmt " and clen >= 16 and body + 16 <= n:
            _fmt, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", b[body:body + 16])
        elif cid == b"data":
            data_len = min(clen, n - body)
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or data_len is None or not ch or not bits:
        return None
    block = ch * (bits // 8)
    if block == 0:
        return None
    return sr, ch, bits, data_len // block


def wav_decode(b: bytes) -> np.ndarray:
    """PCM16 WAV → (n_samples, n_channels) int16 array."""
    hdr = wav_header(b)
    if hdr is None:
        raise WavError("not a RIFF/WAVE payload")
    sr, ch, bits, n_samples = hdr
    if bits != 16:
        raise WavError(f"only PCM16 decoded here (got {bits}-bit)")
    b = bytes(b)
    pos = 12
    n = len(b)
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = pos + 8
        if cid == b"data":
            raw = b[body:body + min(clen, n - body)]
            arr = np.frombuffer(
                raw[:n_samples * ch * 2], dtype="<i2")
            return arr.reshape(-1, ch)
        pos = body + clen + (clen & 1)
    raise WavError("no data chunk")


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, ch) or (n,) int16 → PCM16 RIFF/WAVE bytes (deterministic)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_test_wav(sample_rate: int, n_samples: int, seed: int = 0,
                  n_channels: int = 1) -> bytes:
    """Deterministic synthetic PCM16 WAV (triangle-ish integer pattern
    from the sample index and seed) — corpus builder for oracled
    real-WAV queries."""
    i = np.arange(n_samples * n_channels, dtype=np.int64)
    samples = (((i * 97 + seed * 31) % 2048) - 1024).astype("<i2")
    return wav_encode(samples.reshape(n_samples, n_channels), sample_rate)
