"""PDF standard security handler — V1/R2 (40-bit RC4) and V4/R4
AESV2 (128-bit AES-CBC), empty user password: the two silent-open
encryption shapes a web crawl's "encrypted" PDFs overwhelmingly carry
(no secret involved: the spec-mandated default padding string IS the
password, which is why every PDF viewer opens them without
prompting). The reference reads these via pdfplumber/pypdf's standard
handler; this is the stdlib+numpy re-derivation (ISO 32000-1 §7.6.2-3:
Algorithms 1, 2, 3, 4, 5 and the FIPS-197 cipher) so the kernel
matches that behavior.

Scope: V=1 R=2 RC4 and V=4 R=4 /CFM /AESV2. AESV3 (V5/R6, AES-256)
and real-password documents are out of scope — the kernel raises and
the document quarantines, never a wrong-bytes parse.

Scale note: AES-CBC DECRYPTION is block-parallel (P_i = D(C_i) xor
C_{i-1}), so the read path decrypts every block of a stream at once
as one vectorized numpy pass over an (n_blocks, 16) state — only the
fixture WRITER pays the sequential CBC chain.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ISO 32000-1 Table 21: the 32-byte padding string
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric — same function encrypts and decrypts)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def derive_key(o_entry: bytes, p: int, file_id: bytes,
               user_pw: bytes = b"") -> bytes:
    """Algorithm 2 (R2): 5-byte (40-bit) file key."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o_entry)
    # /P is a signed 32-bit value but many writers serialize its
    # unsigned form (e.g. 4294967252 for -44) — masking accepts both
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(file_id)
    return h.digest()[:5]


def make_entries(p: int, file_id: bytes,
                 owner_pw: bytes = b"", user_pw: bytes = b""):
    """Writer side: (O, U, file_key) for an R2 document.

    O = Algorithm 3 (RC4 of the padded user pw under the owner-pw
    digest key); U = Algorithm 4 (RC4 of the padding string under the
    file key)."""
    okey = hashlib.md5(_pad_pw(owner_pw)).digest()[:5]
    o_entry = rc4(okey, _pad_pw(user_pw))
    key = derive_key(o_entry, p, file_id, user_pw)
    u_entry = rc4(key, PAD)
    return o_entry, u_entry, key


def object_key(file_key: bytes, num: int, gen: int = 0,
               aes: bool = False) -> bytes:
    """Per-object key (Algorithm 1): md5(file_key + objnum_le24 +
    gen_le16 [+ b"sAlT" for AES crypt filters]), truncated to
    len(file_key) + 5 (max 16)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<H", gen & 0xFFFF))
    if aes:
        h.update(b"sAlT")
    return h.digest()[:min(len(file_key) + 5, 16)]


# ---------------------------------------------------------------------------
# R3/R4 key derivation (ISO 32000-1 Algorithms 2, 3, 5 with the
# 50-round MD5 strengthening) — the AESV2 handler's key schedule.
# ---------------------------------------------------------------------------


def derive_key_r34(o_entry: bytes, p: int, file_id: bytes,
                   user_pw: bytes = b"", n: int = 16, r: int = 4,
                   encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2 for R3/R4: n-byte file key (n=16 for AESV2)."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o_entry)
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(file_id)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:n]).digest()
    return key[:n]


def u_value_r34(file_key: bytes, file_id: bytes) -> bytes:
    """Algorithm 5: the 16 verifiable bytes of /U for R3/R4 (the file
    stores these plus 16 bytes of arbitrary padding; Algorithm 6
    compares only the first 16)."""
    enc = rc4(file_key, hashlib.md5(PAD + file_id).digest())
    for i in range(1, 20):
        enc = rc4(bytes(b ^ i for b in file_key), enc)
    return enc


def make_entries_r4(p: int, file_id: bytes, owner_pw: bytes = b"",
                    user_pw: bytes = b"", n: int = 16):
    """Writer side: (O, U, file_key) for an R4 document (Algorithm 3
    with the 50-round strengthening and 19 XOR-keyed RC4 passes)."""
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    for _ in range(50):
        h = hashlib.md5(h[:n]).digest()
    okey = h[:n]
    o_entry = rc4(okey, _pad_pw(user_pw))
    for i in range(1, 20):
        o_entry = rc4(bytes(b ^ i for b in okey), o_entry)
    key = derive_key_r34(o_entry, p, file_id, user_pw, n=n, r=4)
    u_entry = u_value_r34(key, file_id) + b"\x00" * 16
    return o_entry, u_entry, key


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197) from scratch. Tables are DERIVED at import (GF(2^8)
# log/antilog over generator 0x03 + the affine map), not transcribed.
# ---------------------------------------------------------------------------


def _gf_tables():
    alog = [1] * 256
    for i in range(1, 256):
        v = alog[i - 1]
        v = (v << 1) ^ (0x1B if v & 0x80 else 0) ^ v  # times 0x03
        alog[i] = v & 0xFF
    log = [0] * 256
    for i in range(255):
        log[alog[i]] = i
    sbox = [0] * 256
    for x in range(256):
        inv = 0 if x == 0 else alog[255 - log[x]]
        b = inv
        for shift in (1, 2, 3, 4):
            b ^= ((inv << shift) | (inv >> (8 - shift))) & 0xFF
        sbox[x] = b ^ 0x63

    def mul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return alog[(log[a] + log[b]) % 255]

    return sbox, mul


_SBOX_LIST, _GF_MUL = _gf_tables()
_SBOX = np.array(_SBOX_LIST, dtype=np.uint8)
_INV_SBOX = np.zeros(256, dtype=np.uint8)
_INV_SBOX[_SBOX] = np.arange(256, dtype=np.uint8)
# GF multiply lookup rows for MixColumns (2,3) and its inverse (9,b,d,e)
_MUL = {c: np.array([_GF_MUL(c, x) for x in range(256)], dtype=np.uint8)
        for c in (0x02, 0x03, 0x09, 0x0B, 0x0D, 0x0E)}
# flat-16 byte permutations (state is column-major: byte i = row i%4,
# col i//4; ShiftRows rotates row r left by r, inverse rotates right)
_SHIFT = np.array([(i % 4) + 4 * ((i // 4 + i % 4) % 4)
                   for i in range(16)], dtype=np.intp)
_INV_SHIFT = np.array([(i % 4) + 4 * ((i // 4 - i % 4) % 4)
                       for i in range(16)], dtype=np.intp)
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> np.ndarray:
    """AES-128 key schedule → (11, 16) uint8 round keys."""
    w = [list(key[4 * i:4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX_LIST[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    flat = np.array(w, dtype=np.uint8).reshape(11, 16)
    return flat


def _mix_columns(st: np.ndarray, inverse: bool) -> np.ndarray:
    """(n, 16) GF(2^8) column mix; column c = bytes [4c:4c+4]."""
    a = st.reshape(-1, 4, 4)  # (n, col, row)
    a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    m = _MUL
    if inverse:
        b0 = m[0x0E][a0] ^ m[0x0B][a1] ^ m[0x0D][a2] ^ m[0x09][a3]
        b1 = m[0x09][a0] ^ m[0x0E][a1] ^ m[0x0B][a2] ^ m[0x0D][a3]
        b2 = m[0x0D][a0] ^ m[0x09][a1] ^ m[0x0E][a2] ^ m[0x0B][a3]
        b3 = m[0x0B][a0] ^ m[0x0D][a1] ^ m[0x09][a2] ^ m[0x0E][a3]
    else:
        b0 = m[0x02][a0] ^ m[0x03][a1] ^ a2 ^ a3
        b1 = a0 ^ m[0x02][a1] ^ m[0x03][a2] ^ a3
        b2 = a0 ^ a1 ^ m[0x02][a2] ^ m[0x03][a3]
        b3 = m[0x03][a0] ^ a1 ^ a2 ^ m[0x02][a3]
    return np.stack([b0, b1, b2, b3], axis=2).reshape(-1, 16)


def aes_encrypt_blocks(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Forward cipher over an (n, 16) uint8 state (ECB core)."""
    rk = _expand_key(key)
    st = blocks ^ rk[0]
    for rnd in range(1, 10):
        st = _mix_columns(_SBOX[st][:, _SHIFT], inverse=False) ^ rk[rnd]
    return _SBOX[st][:, _SHIFT] ^ rk[10]


def aes_decrypt_blocks(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Inverse cipher over an (n, 16) uint8 state (ECB core) — ALL
    blocks in one vectorized pass."""
    rk = _expand_key(key)
    st = blocks ^ rk[10]
    for rnd in range(9, 0, -1):
        st = _mix_columns(_INV_SBOX[st[:, _INV_SHIFT]] ^ rk[rnd],
                          inverse=True)
    return _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[0]


def aes_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """PKCS#7-padded CBC encrypt (writer side — sequential chain)."""
    padlen = 16 - len(plain) % 16
    data = plain + bytes([padlen]) * padlen
    buf = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    prev = np.frombuffer(iv, dtype=np.uint8)
    out = np.empty_like(buf)
    for i in range(buf.shape[0]):
        prev = aes_encrypt_blocks(key, (buf[i] ^ prev)[None, :])[0]
        out[i] = prev
    return out.tobytes()


def aes_cbc_decrypt(key: bytes, iv_ct: bytes) -> bytes:
    """CBC decrypt of ``IV || ciphertext`` (the PDF stream layout),
    PKCS#7 unpad. Block-parallel: one vectorized decrypt of every
    block, then an XOR against the shifted ciphertext."""
    if len(iv_ct) < 32 or len(iv_ct) % 16:
        raise ValueError("AES stream not a whole number of blocks")
    buf = np.frombuffer(iv_ct, dtype=np.uint8).reshape(-1, 16)
    plain = (aes_decrypt_blocks(key, buf[1:]) ^ buf[:-1]).tobytes()
    padlen = plain[-1]
    if not 1 <= padlen <= 16 or plain[-padlen:] != bytes([padlen]) * padlen:
        raise ValueError("AES stream padding invalid (wrong key?)")
    return plain[:-padlen]
