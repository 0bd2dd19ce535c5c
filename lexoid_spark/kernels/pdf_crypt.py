"""PDF standard security handler — V1/R2 (40-bit RC4), V4/R4 AESV2
(128-bit AES-CBC) and V5/R5-R6 AESV3 (256-bit AES-CBC), empty user
password: the silent-open encryption shapes a web crawl's "encrypted"
PDFs overwhelmingly carry (no secret involved: the spec-mandated
default padding string — or for V5 the empty string itself — IS the
password, which is why every PDF viewer opens them without
prompting). The reference reads these via pdfplumber/pypdf's standard
handler; this is the stdlib+numpy re-derivation (ISO 32000-1
§7.6.2-3: Algorithms 1-6; ISO 32000-2 §7.6.4: Algorithms 2.A/2.B/13;
and the FIPS-197 cipher at all three key lengths) so the kernel
matches that behavior.

Scope: V=1 R=2 RC4, V=4 R=4 /CFM /AESV2, V=5 R∈{5,6} /CFM /AESV3.
Real-password documents are out of scope — the kernel raises and the
document quarantines, never a wrong-bytes parse.

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
    """FIPS-197 key schedule for 128/192/256-bit keys →
    (rounds+1, 16) uint8 round keys (rounds = Nk + 6)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"bad AES key length {len(key)}")
    rounds = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX_LIST[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX_LIST[b] for b in t]  # 256-bit extra SubWord
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return np.array(w, dtype=np.uint8).reshape(rounds + 1, 16)


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
    """Forward cipher over an (n, 16) uint8 state (ECB core);
    key length picks 128/192/256-bit rounds."""
    rk = _expand_key(key)
    rounds = rk.shape[0] - 1
    st = blocks ^ rk[0]
    for rnd in range(1, rounds):
        st = _mix_columns(_SBOX[st][:, _SHIFT], inverse=False) ^ rk[rnd]
    return _SBOX[st][:, _SHIFT] ^ rk[rounds]


def aes_decrypt_blocks(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Inverse cipher over an (n, 16) uint8 state (ECB core) — ALL
    blocks in one vectorized pass; key length picks the rounds."""
    rk = _expand_key(key)
    rounds = rk.shape[0] - 1
    st = blocks ^ rk[rounds]
    for rnd in range(rounds - 1, 0, -1):
        st = _mix_columns(_INV_SBOX[st[:, _INV_SHIFT]] ^ rk[rnd],
                          inverse=True)
    return _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[0]


def aes_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """PKCS#7-padded CBC encrypt (writer side — sequential chain,
    scalar T-table core)."""
    padlen = 16 - len(plain) % 16
    return aes_cbc_encrypt_nopad(key, iv,
                                 plain + bytes([padlen]) * padlen)


# --- scalar (T-table) forward cipher for the SEQUENTIAL paths -----------
# CBC encryption chains block-to-block, so the vectorized numpy core
# is pure overhead there (one (1,16) ufunc cascade per block). The
# classic 4×256 T-table formulation runs a block in ~400 int ops —
# ~50× faster per block — and the R6 Algorithm-2.B hash loop encrypts
# ~10⁴ sequential blocks per derivation, so this is what makes AESV3
# affordable. Tables are DERIVED from the same generated S-box.


def _t_tables():
    t0, t1, t2, t3 = [], [], [], []
    for x in range(256):
        s = _SBOX_LIST[x]
        s2, s3 = _GF_MUL(2, s), _GF_MUL(3, s)
        t0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
        t1.append((s3 << 24) | (s2 << 16) | (s << 8) | s)
        t2.append((s << 24) | (s3 << 16) | (s2 << 8) | s)
        t3.append((s << 24) | (s << 16) | (s3 << 8) | s2)
    return t0, t1, t2, t3


_T0, _T1, _T2, _T3 = _t_tables()


def _round_words(key: bytes):
    """Key schedule as per-round big-endian 32-bit column words,
    memoized (the R6 hash loop re-keys every round but encrypts
    hundreds of blocks per key)."""
    w = _RW_CACHE.get(key)
    if w is None:
        rk = _expand_key(key)
        w = [[int.from_bytes(bytes(rk[r, 4 * j:4 * j + 4]), "big")
              for j in range(4)] for r in range(rk.shape[0])]
        if len(_RW_CACHE) > 256:
            _RW_CACHE.clear()
        _RW_CACHE[key] = w
    return w


_RW_CACHE: dict = {}


def _encrypt_block_scalar(key: bytes, block: bytes) -> bytes:
    """One-block forward cipher on plain ints (T-table rounds)."""
    w = _round_words(key)
    rounds = len(w) - 1
    c = [int.from_bytes(block[4 * j:4 * j + 4], "big") ^ w[0][j]
         for j in range(4)]
    for rnd in range(1, rounds):
        k = w[rnd]
        c = [
            _T0[(c[j] >> 24) & 0xFF]
            ^ _T1[(c[(j + 1) & 3] >> 16) & 0xFF]
            ^ _T2[(c[(j + 2) & 3] >> 8) & 0xFF]
            ^ _T3[c[(j + 3) & 3] & 0xFF]
            ^ k[j]
            for j in range(4)
        ]
    k = w[rounds]
    s = _SBOX_LIST
    out = bytearray(16)
    for j in range(4):
        v = (
            (s[(c[j] >> 24) & 0xFF] << 24)
            | (s[(c[(j + 1) & 3] >> 16) & 0xFF] << 16)
            | (s[(c[(j + 2) & 3] >> 8) & 0xFF] << 8)
            | s[c[(j + 3) & 3] & 0xFF]
        ) ^ k[j]
        out[4 * j:4 * j + 4] = v.to_bytes(4, "big")
    return bytes(out)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Raw CBC encrypt of an exact block multiple (the R6 hash loop
    and /UE//OE wrapping use unpadded CBC).

    The chain is sequential BY DESIGN (the R6 KDF is a
    password-stretcher), so the per-block Python cost is the whole
    cost: this keeps the state as four 32-bit words across the chain
    (no bytes round-trips between blocks) and unrolls the T-table
    round body, ~3-4x the generic scalar block function."""
    n = len(plain)
    if n % 16:
        raise ValueError("nopad CBC needs a block multiple")
    w = _round_words(key)
    rounds = len(w) - 1
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    s = _SBOX_LIST
    words = struct.unpack(">%dI" % (n // 4), plain)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    k00, k01, k02, k03 = w[0]
    kl0, kl1, kl2, kl3 = w[rounds]
    mid = w[1:rounds]
    out = []
    for i in range(0, n // 4, 4):
        c0 = words[i] ^ p0 ^ k00
        c1 = words[i + 1] ^ p1 ^ k01
        c2 = words[i + 2] ^ p2 ^ k02
        c3 = words[i + 3] ^ p3 ^ k03
        for k in mid:
            d0 = (t0[(c0 >> 24) & 255] ^ t1[(c1 >> 16) & 255]
                  ^ t2[(c2 >> 8) & 255] ^ t3[c3 & 255] ^ k[0])
            d1 = (t0[(c1 >> 24) & 255] ^ t1[(c2 >> 16) & 255]
                  ^ t2[(c3 >> 8) & 255] ^ t3[c0 & 255] ^ k[1])
            d2 = (t0[(c2 >> 24) & 255] ^ t1[(c3 >> 16) & 255]
                  ^ t2[(c0 >> 8) & 255] ^ t3[c1 & 255] ^ k[2])
            d3 = (t0[(c3 >> 24) & 255] ^ t1[(c0 >> 16) & 255]
                  ^ t2[(c1 >> 8) & 255] ^ t3[c2 & 255] ^ k[3])
            c0, c1, c2, c3 = d0, d1, d2, d3
        p0 = ((s[(c0 >> 24) & 255] << 24) | (s[(c1 >> 16) & 255] << 16)
              | (s[(c2 >> 8) & 255] << 8) | s[c3 & 255]) ^ kl0
        p1 = ((s[(c1 >> 24) & 255] << 24) | (s[(c2 >> 16) & 255] << 16)
              | (s[(c3 >> 8) & 255] << 8) | s[c0 & 255]) ^ kl1
        p2 = ((s[(c2 >> 24) & 255] << 24) | (s[(c3 >> 16) & 255] << 16)
              | (s[(c0 >> 8) & 255] << 8) | s[c1 & 255]) ^ kl2
        p3 = ((s[(c3 >> 24) & 255] << 24) | (s[(c0 >> 16) & 255] << 16)
              | (s[(c1 >> 8) & 255] << 8) | s[c2 & 255]) ^ kl3
        out.append(p0)
        out.append(p1)
        out.append(p2)
        out.append(p3)
    return struct.pack(">%dI" % len(out), *out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, ct: bytes) -> bytes:
    """Raw CBC decrypt, no IV prefix, no padding — block-parallel."""
    if len(ct) % 16 or not ct:
        raise ValueError("nopad CBC needs a block multiple")
    buf = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16)
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8)[None, :],
                      buf[:-1]])
    return (aes_decrypt_blocks(key, buf) ^ prev).tobytes()


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


# ---------------------------------------------------------------------------
# V5 (AESV3) key derivation — R5 (deprecated Adobe extension) and R6
# (ISO 32000-2 §7.6.4.3.4, Algorithms 2.A / 2.B): SHA-2 password
# hashing, 256-bit file key wrapped in /UE //OE.
# ---------------------------------------------------------------------------


def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the R6 iterated hash. Rounds of unpadded
    AES-128-CBC over 64 repeats of (pwd + K + udata), with the digest
    function re-chosen per round by the ciphertext (SHA-256/384/512);
    stops after ≥64 rounds when the last ciphertext byte ≤ rounds-32."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


from functools import lru_cache


@lru_cache(maxsize=64)
def derive_key_v5(u_entry: bytes, ue_entry: bytes, r: int = 6,
                  user_pw: bytes = b"") -> bytes:
    """Algorithm 2.A, user-password arm: validate the password against
    /U's hash+validation-salt, then unwrap the 256-bit file key from
    /UE with the key-salt hash (unpadded CBC, zero IV). Raises when
    the (empty) password is rejected — the caller quarantines.

    Memoized: R6's iterated hash is a password-stretching KDF (tens of
    thousands of sequential cipher blocks BY DESIGN), and crawl shards
    routinely carry many PDFs from one producer with identical
    /Encrypt entries — a repeated (U, UE) pair costs the derivation
    once per worker."""
    if len(u_entry) < 48 or len(ue_entry) != 32:
        raise ValueError("malformed V5 /U or /UE entry")
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if r == 5:
        h = hashlib.sha256(user_pw + vsalt).digest()
    else:
        h = hash_2b(user_pw, vsalt)
    if h != u_entry[:32]:
        raise ValueError("password-protected PDF (empty user "
                         "password rejected)")
    ik = (hashlib.sha256(user_pw + ksalt).digest() if r == 5
          else hash_2b(user_pw, ksalt))
    return aes_cbc_decrypt_nopad(ik, b"\x00" * 16, ue_entry)


def check_perms_v5(perms: bytes, file_key: bytes, p: int) -> bool:
    """Decrypt the 16-byte /Perms blob (AES-ECB under the file key)
    and verify the 'adb' tag + /P echo (ISO 32000-2 Algorithm 13)."""
    if len(perms) != 16:
        return False
    blk = np.frombuffer(perms, dtype=np.uint8).reshape(1, 16)
    dec = aes_decrypt_blocks(file_key, blk).tobytes()
    return (dec[9:12] == b"adb"
            and struct.unpack("<i", dec[:4])[0] == p)


#: driver-computed (args → entries) preseed consulted before the R6
#: writer KDF runs: a long session's Python worker pool grows past
#: the core count (AQE materializes independent stages concurrently),
#: so fixture tasks keep landing on workers whose lru memo is cold
#: and re-paying the ~2 s Algorithm-2.B stretch per worker per pass.
#: The fixture WRITER is not the engine under test — the driver
#: derives once per session and ships the 200-byte result in the UDF
#: closure (the PARSER still derives from /U //UE per worker: that IS
#: the benchmarked path, already lru-memoized).
_V5_PRESEED: dict = {}


def preseed_entries_v5(p: int, seed: bytes, entries,
                       user_pw: bytes = b"", owner_pw: bytes = b"",
                       r: int = 6) -> None:
    _V5_PRESEED[(p, seed, user_pw, owner_pw, r)] = entries


@lru_cache(maxsize=16)
def make_entries_v5(p: int, seed: bytes, user_pw: bytes = b"",
                    owner_pw: bytes = b"", r: int = 6):
    """Writer side (fixtures): deterministic (U, UE, O, OE, Perms,
    file_key) for an R5/R6 document. Salts and the file key derive
    from ``seed`` so fixture bytes are reproducible."""
    pre = _V5_PRESEED.get((p, seed, user_pw, owner_pw, r))
    if pre is not None:
        return pre
    def _h(pw, salt, udata=b""):
        if r == 5:
            return hashlib.sha256(pw + salt + udata).digest()
        return hash_2b(pw, salt, udata)

    file_key = hashlib.sha256(b"lexoid-r6-key:" + seed).digest()
    uvs = hashlib.sha256(b"uvs:" + seed).digest()[:8]
    uks = hashlib.sha256(b"uks:" + seed).digest()[:8]
    ovs = hashlib.sha256(b"ovs:" + seed).digest()[:8]
    oks = hashlib.sha256(b"oks:" + seed).digest()[:8]
    u_entry = _h(user_pw, uvs) + uvs + uks
    ue_entry = aes_cbc_encrypt_nopad(_h(user_pw, uks), b"\x00" * 16,
                                     file_key)
    o_entry = _h(owner_pw, ovs, u_entry) + ovs + oks
    oe_entry = aes_cbc_encrypt_nopad(_h(owner_pw, oks, u_entry),
                                     b"\x00" * 16, file_key)
    perms_plain = (struct.pack("<i", p) + b"\xff\xff\xff\xff"
                   + b"Tadb" + b"lxsp")
    perms = aes_encrypt_blocks(
        file_key,
        np.frombuffer(perms_plain, dtype=np.uint8).reshape(1, 16),
    ).tobytes()
    return u_entry, ue_entry, o_entry, oe_entry, perms, file_key
