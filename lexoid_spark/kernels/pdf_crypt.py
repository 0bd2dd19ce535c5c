"""PDF standard security handler, V1/R2 (40-bit RC4) — the
empty-user-password encryption a large share of wild "encrypted" PDFs
actually carry (no secret involved: the spec-mandated default padding
string IS the password, which is why every PDF viewer opens them
without prompting). The reference reads these via pdfplumber/pypdf's
standard handler; this is the stdlib re-derivation (ISO 32000-1
§7.6.3: Algorithms 2, 3, 4) so the kernel matches that behavior.

Scope: V=1 R=2 streams-or-strings RC4. AES (V4/V5) and real-password
documents are out of scope — the kernel raises and the document
quarantines, never a wrong-bytes parse.
"""

from __future__ import annotations

import hashlib
import struct

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


def object_key(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Per-object RC4 key: md5(file_key + objnum_le24 + gen_le16),
    truncated to len(file_key) + 5 (max 16)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<H", gen & 0xFFFF))
    return h.digest()[:min(len(file_key) + 5, 16)]
