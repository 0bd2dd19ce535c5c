"""FLAC (free lossless audio codec, RFC 9639 / xiph spec) decode for
the audio arm — the real compressed-audio counterpart of the PCM WAV
kernel, so audio operators read genuine wild lossless files instead
of only RIFF containers.

Scope (decode): native FLAC streams ("fLaC" marker + STREAMINFO):

- frame headers: both blocking strategies, all block-size and
  sample-rate codes, UTF-8-style coded numbers, CRC-8 verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0–4 and LPC orders
  1–32 (quantized coefficients + shift), wasted-bits unary prefix;
- residuals: Rice methods 0 (4-bit) and 1 (5-bit) with partition
  orders and the raw-bits escape;
- stereo decorrelation: independent, left/side, right/side and
  mid/side reconstruction (exact integer);
- frame footer CRC-16 verified — a corrupt frame raises, never
  returns silently wrong samples.

Out of scope (typed :class:`FlacError` → quarantine): sample sizes
other than 8/12/16/20/24 bits from the header's fixed set, streams
whose STREAMINFO is missing, >2 channels (the curation surface is
mono/stereo), and Ogg-encapsulated FLAC.

The encoder twin emits spec-shaped streams for fixtures/corpus:
fixed 4096-sample blocks, per-channel FIXED order-0/1/2 subframes
with Rice residuals (or VERBATIM), correct CRCs — how real FLAC
structure enters the test corpus without a codec dependency.

Reference parity: none — the reference has no audio path; this is
LLM-pipeline surface (ASR batching / audio curation).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


class FlacError(ValueError):
    """Malformed or out-of-scope FLAC data (→ quarantine)."""


_MAX_SAMPLES = 1 << 28
_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits

    def u(self, n: int) -> int:
        v = 0
        d = self.data
        pos = self.pos
        if (pos + n) > 8 * len(d):
            raise FlacError("bitstream overrun")
        for _ in range(n):
            v = (v << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        d = self.data
        pos = self.pos
        limit = 8 * len(d)
        q = 0
        while pos < limit:
            if (d[pos >> 3] >> (7 - (pos & 7))) & 1:
                self.pos = pos + 1
                return q
            q += 1
            pos += 1
        raise FlacError("unary overrun")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def flac_header(b: bytes) -> Optional[Tuple[int, int, int, int]]:
    """(sample_rate, n_channels, bits_per_sample, n_samples) from
    STREAMINFO, or None if not a FLAC stream."""
    b = bytes(b)
    if b[:4] != b"fLaC" or len(b) < 8 + 34:
        return None
    pos = 4
    while pos + 4 <= len(b):
        hdr = b[pos]
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1:pos + 4])
        body = pos + 4
        if btype == 0:
            if ln < 34 or body + 34 > len(b):
                return None
            packed = int.from_bytes(b[body + 10:body + 18], "big")
            sr = packed >> 44
            ch = ((packed >> 41) & 7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            return sr, ch, bits, total
        if hdr & 0x80:
            return None
        pos = body + ln
    return None


def _meta_end(b: bytes) -> int:
    pos = 4
    while pos + 4 <= len(b):
        hdr = b[pos]
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1:pos + 4])
        pos += 4 + ln
        if hdr & 0x80:
            return pos
    raise FlacError("unterminated metadata blocks")


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.u(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise FlacError("bad coded-number prefix")
    v = first & (mask - 1)
    for _ in range(n_extra):
        byte = bits.u(8)
        if byte & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation")
        v = (v << 6) | (byte & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> List[int]:
    method = bits.u(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.u(4)
    if blocksize % (1 << porder):
        raise FlacError("partition order does not divide block size")
    out: List[int] = []
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        k = bits.u(pbits)
        if k == escape:
            raw = bits.u(5)
            for _ in range(n):
                out.append(bits.s(raw) if raw else 0)
            continue
        for _ in range(n):
            q = bits.unary()
            r = bits.u(k) if k else 0
            v = (q << k) | r
            out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, ssize: int) -> List[int]:
    if bits.u(1):
        raise FlacError("subframe padding bit set")
    stype = bits.u(6)
    wasted = 0
    if bits.u(1):
        wasted = bits.unary() + 1
    eff = ssize - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed the sample size")
    if stype == 0:                      # CONSTANT
        v = bits.s(eff)
        samples = [v] * blocksize
    elif stype == 1:                    # VERBATIM
        samples = [bits.s(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:              # FIXED order 0-4
        order = stype - 8
        warm = [bits.s(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1]
                       for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:                   # LPC order 1-32
        order = stype - 31
        warm = [bits.s(eff) for _ in range(order)]
        prec = bits.u(4) + 1
        if prec == 16:
            raise FlacError("invalid qlp precision")
        shift = bits.s(5)
        if shift < 0:
            raise FlacError("negative qlp shift")
        coefs = [bits.s(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1]
                       for i, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        samples = [v << wasted for v in samples]
    return samples


def flac_decode(b: bytes) -> Tuple[np.ndarray, int]:
    """FLAC bytes → ((n_samples, n_channels) int32 array, sample_rate).
    Raises :class:`FlacError` on malformed/out-of-scope input,
    including any CRC mismatch."""
    b = bytes(b)
    hdr = flac_header(b)
    if hdr is None:
        raise FlacError("not a FLAC stream (or STREAMINFO missing)")
    si_rate, si_ch, si_bits, total = hdr
    if si_ch > 2:
        raise FlacError(f"{si_ch}-channel streams unsupported")
    if total > _MAX_SAMPLES:
        raise FlacError("implausible total sample count")
    pos = _meta_end(b)
    chans: List[List[int]] = [[] for _ in range(si_ch)]
    n_done = 0
    while n_done < total:
        if pos + 5 > len(b):
            raise FlacError("stream truncated before all samples")
        frame_start = pos
        bits = _Bits(b, pos * 8)
        sync = bits.u(14)
        if sync != 0x3FFE:
            raise FlacError("lost frame sync")
        if bits.u(1):
            raise FlacError("reserved frame-header bit set")
        bits.u(1)                      # blocking strategy
        bs_code = bits.u(4)
        sr_code = bits.u(4)
        ch_code = bits.u(4)
        sz_code = bits.u(3)
        if bits.u(1):
            raise FlacError("reserved frame-header bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise FlacError("reserved block-size code 0")
        elif bs_code == 6:
            blocksize = bits.u(8) + 1
        elif bs_code == 7:
            blocksize = bits.u(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            rate = si_rate
        elif sr_code == 12:
            rate = bits.u(8) * 1000
        elif sr_code == 13:
            rate = bits.u(16)
        elif sr_code == 14:
            rate = bits.u(16) * 10
        elif sr_code == 15:
            raise FlacError("invalid sample-rate code 15")
        else:
            rate = _RATE_TABLE[sr_code]
        if sz_code == 0:
            ssize = si_bits
        elif sz_code in _SIZE_TABLE:
            ssize = _SIZE_TABLE[sz_code]
        else:
            raise FlacError(f"reserved sample-size code {sz_code}")
        bits.align()
        header_bytes = b[frame_start:bits.pos >> 3]
        crc8 = bits.u(8)
        if _crc8(header_bytes) != crc8:
            raise FlacError("frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != si_ch:
                raise FlacError("frame channel count contradicts "
                                "STREAMINFO")
            subs = [_decode_subframe(bits, blocksize, ssize)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if si_ch != 2:
                raise FlacError("stereo decorrelation in a non-stereo "
                                "stream")
            # side channel carries one extra bit
            if ch_code == 8:           # left/side
                left = _decode_subframe(bits, blocksize, ssize)
                side = _decode_subframe(bits, blocksize, ssize + 1)
                right = [l - s for l, s in zip(left, side)]
            elif ch_code == 9:         # right/side
                side = _decode_subframe(bits, blocksize, ssize + 1)
                right = _decode_subframe(bits, blocksize, ssize)
                left = [r + s for r, s in zip(right, side)]
            else:                      # mid/side
                mid = _decode_subframe(bits, blocksize, ssize)
                side = _decode_subframe(bits, blocksize, ssize + 1)
                left = [m + ((s >> 1) + (s & 1))
                        for m, s in zip(mid, side)]
                right = [l - s for l, s in zip(left, side)]
            subs = [left, right]
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        bits.align()
        frame_body = b[frame_start:bits.pos >> 3]
        crc16 = bits.u(16)
        if _crc16(frame_body) != crc16:
            raise FlacError("frame CRC-16 mismatch")
        take = min(blocksize, total - n_done)
        for c in range(si_ch):
            chans[c].extend(subs[c][:take])
        n_done += take
        pos = bits.pos >> 3
    out = np.array(chans, dtype=np.int64).T
    lim = 1 << (si_bits - 1)
    if out.size and (out.max() >= lim or out.min() < -lim):
        raise FlacError("decoded sample exceeds the declared depth")
    return out.astype(np.int32), si_rate


# ---------------------------------------------------------------------------
# Fixture encoder (corpus/tests only)
# ---------------------------------------------------------------------------


class _BitW:
    __slots__ = ("buf", "cur", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def align(self) -> None:
        while self.nbits:
            self.u(0, 1)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _rice_encode(w: _BitW, resid: List[int]) -> None:
    """Method-0 Rice, partition order 0, parameter from the mean."""
    mean = (sum(abs(r) for r in resid) // max(1, len(resid))) or 1
    k = min(14, max(0, mean.bit_length()))
    w.u(0, 2)                  # method 0
    w.u(0, 4)                  # partition order 0
    w.u(k, 4)
    for r in resid:
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1   # zigzag
        q = v >> k
        if q > 1 << 20:
            raise FlacError("rice quotient blow-up (bad parameter)")
        for _ in range(q):
            w.u(0, 1)
        w.u(1, 1)
        if k:
            w.u(v & ((1 << k) - 1), k)


def flac_encode(samples: np.ndarray, sample_rate: int,
                order: int = 1, lpc: bool = False) -> bytes:
    """(n,) or (n, ch≤2) int16 → FLAC bytes: fixed 4096-sample
    blocks, independent channels, FIXED order-``order`` subframes
    with Rice residuals (order 0 disables prediction). With
    ``lpc=True`` the same predictor ships as an LPC subframe instead
    (quantized coefficients at shift 5) so the decoder's LPC branch
    is exercised by genuine streams. Deterministic (fixtures/corpus
    only)."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if ch > 2:
        raise FlacError("at most 2 channels")
    if order not in (0, 1, 2):
        raise FlacError("fixture encoder supports FIXED orders 0-2")
    if lpc and order == 0:
        raise FlacError("LPC subframes need order >= 1")
    bits = 16
    packed = (sample_rate << 44) | ((ch - 1) << 41) \
        | ((bits - 1) << 36) | n
    streaminfo = (struct.pack(">HH", 4096, 4096) + bytes(6)
                  + packed.to_bytes(8, "big") + bytes(16))
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    coefs = _FIXED_COEFS[order]
    for fi, start in enumerate(range(0, max(n, 1), 4096)):
        block = a[start:start + 4096]
        bs = block.shape[0]
        if bs == 0:
            break
        w = _BitW()
        w.u(0x3FFE, 14)
        w.u(0, 1)
        w.u(0, 1)                  # fixed blocking
        if bs == 4096:
            w.u(12, 4)
        else:
            w.u(7, 4)              # 16-bit blocksize-1 follows
        w.u(0, 4)                  # rate from STREAMINFO
        w.u(ch - 1, 4)
        w.u(4, 3)                  # 16-bit samples
        w.u(0, 1)
        # coded frame number (UTF-8-style, §9.1.5)
        v = fi
        if v < 0x80:
            w.u(v, 8)
        else:
            nbytes = 2
            while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
                nbytes += 1
                if nbytes > 7:
                    raise FlacError("frame number out of range")
            tails = []
            for _ in range(nbytes - 1):
                tails.append(0x80 | (v & 0x3F))
                v >>= 6
            w.u(((0xFF << (8 - nbytes)) & 0xFF) | v, 8)
            for byte in reversed(tails):
                w.u(byte, 8)
        if bs != 4096:
            w.u(bs - 1, 16)
        header = w.done()
        w = _BitW()
        for byte in header:
            w.u(byte, 8)
        w.u(_crc8(header), 8)
        o = min(order, bs)         # a block shorter than the order
        use_lpc = lpc and o >= 1
        shift = 5
        ocoefs = ([cf << shift for cf in _FIXED_COEFS[o]] if use_lpc
                  else _FIXED_COEFS[o])
        for c in range(ch):
            col = [int(x) for x in block[:, c]]
            w.u(0, 1)
            if use_lpc:
                w.u(32 + (o - 1), 6)   # LPC subframe, order o
            else:
                w.u(8 + o, 6)          # FIXED subframe
            w.u(0, 1)              # no wasted bits
            for i in range(o):
                w.s(col[i], 16)
            if use_lpc:
                w.u(8 - 1, 4)      # qlp precision 8
                w.s(shift, 5)
                for cf in ocoefs:
                    w.s(cf, 8)
            resid = []
            for i in range(o, bs):
                pred = sum(cf * col[i - j - 1]
                           for j, cf in enumerate(ocoefs))
                if use_lpc:
                    pred >>= shift
                resid.append(col[i] - pred)
            _rice_encode(w, resid)
        body = w.done()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


def make_test_flac(sample_rate: int, n_samples: int, seed: int = 0,
                   n_channels: int = 1, order: int = 1,
                   lpc: bool = False) -> bytes:
    """Deterministic synthetic FLAC (same integer pattern as
    make_test_wav) — corpus builder for oracled real-FLAC queries."""
    i = np.arange(n_samples * n_channels, dtype=np.int64)
    samples = (((i * 97 + seed * 31) % 2048) - 1024).astype(np.int16)
    return flac_encode(samples.reshape(n_samples, n_channels),
                       sample_rate, order=order, lpc=lpc)
