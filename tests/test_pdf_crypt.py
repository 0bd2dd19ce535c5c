"""RC4 standard security handler (V1/R2, empty password): key
derivation, round trips through the kernel, and the
quarantine-not-garbage contract for everything out of scope."""

import re

import pytest

from lexoid_spark.corpus.pdf_gen import build_pdf, words_line
from lexoid_spark.kernels.pdf_crypt import (
    PAD,
    derive_key,
    make_entries,
    object_key,
    rc4,
)
from lexoid_spark.kernels.pdf_md import pdf_to_pages

PAGES = [{"words": words_line(["Secret", "but", "standard"], 700.0)}]


class TestPrimitives:
    def test_rc4_roundtrip_and_vector(self):
        # symmetric cipher round trip
        assert rc4(b"key12", rc4(b"key12", b"payload")) == b"payload"
        # the canonical RC4 test vector (Key/Plaintext from the
        # original cypherpunks posting)
        assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"

    def test_entries_consistent(self):
        fid = b"\x01" * 16
        o, u, key = make_entries(-44, fid)
        assert len(o) == 32 and len(u) == 32 and len(key) == 5
        # Algorithm 6: deriving with the empty password reproduces U
        assert rc4(derive_key(o, -44, fid), PAD) == u

    def test_object_key_length(self):
        assert len(object_key(b"\x00" * 5, 7)) == 10
        assert len(object_key(b"\x00" * 16, 7)) == 16


class TestEncryptedPdf:
    def test_roundtrip_matches_plaintext(self):
        plain = pdf_to_pages(build_pdf(PAGES))
        assert pdf_to_pages(build_pdf(PAGES, encrypt=True)) == plain
        assert pdf_to_pages(
            build_pdf(PAGES, compress=True, encrypt=True)) == plain
        assert plain[0][1] == "Secret but standard\n\n"

    def test_encrypted_bytes_differ(self):
        enc = build_pdf(PAGES, encrypt=True)
        assert b"/Encrypt" in enc and b"Secret" not in enc

    def test_real_password_quarantines(self):
        enc = build_pdf(PAGES, encrypt=True)
        bad = re.sub(rb"/U <([0-9A-Fa-f]{8})", rb"/U <00000000", enc)
        with pytest.raises(ValueError, match="password-protected"):
            pdf_to_pages(bad)

    def test_unsupported_revision_quarantines(self):
        enc = build_pdf(PAGES, encrypt=True)
        bad = enc.replace(b"/V 1 /R 2", b"/V 4 /R 4")
        # V4 without an /AESV2 /StmF /StdCF crypt filter stays out of
        # scope (that byte-patched document has no /CF at all)
        with pytest.raises(ValueError, match="unsupported"):
            pdf_to_pages(bad)
        bad = enc.replace(b"/V 1 /R 2", b"/V 5 /R 6")
        with pytest.raises(ValueError, match="unsupported"):
            pdf_to_pages(bad)


class TestAes:
    """V4/R4 AESV2 (128-bit AES-CBC) — from-scratch FIPS-197 cipher +
    ISO 32000-1 Algorithms 1/2/3/5 key schedule."""

    def test_fips197_known_answer(self):
        import numpy as np

        from lexoid_spark.kernels.pdf_crypt import (
            aes_decrypt_blocks,
            aes_encrypt_blocks,
        )

        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        st = np.frombuffer(pt, np.uint8)[None, :]
        ct = aes_encrypt_blocks(key, st)[0].tobytes()
        assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
        back = aes_decrypt_blocks(
            key, np.frombuffer(ct, np.uint8)[None, :])[0].tobytes()
        assert back == pt

    def test_cbc_roundtrip_and_padding(self):
        from lexoid_spark.kernels.pdf_crypt import (
            aes_cbc_decrypt,
            aes_cbc_encrypt,
        )

        key, iv = b"k" * 16, b"i" * 16
        for n in (0, 1, 15, 16, 17, 1000):
            data = bytes(range(256)) * 4
            data = data[:n]
            ct = aes_cbc_encrypt(key, iv, data)
            assert len(ct) % 16 == 0 and len(ct) > len(data)
            assert aes_cbc_decrypt(key, iv + ct) == data
        # wrong key → padding check fires, never silent garbage
        ct = aes_cbc_encrypt(key, iv, b"payload")
        with pytest.raises(ValueError, match="padding"):
            aes_cbc_decrypt(b"x" * 16, iv + ct)

    def test_r4_entries_consistent(self):
        from lexoid_spark.kernels.pdf_crypt import (
            derive_key_r34,
            make_entries_r4,
            u_value_r34,
        )

        fid = b"\x05" * 16
        o, u, key = make_entries_r4(-44, fid)
        assert len(o) == 32 and len(u) == 32 and len(key) == 16
        # Algorithm 6 (R>=3): first 16 bytes of /U reproduce
        assert u_value_r34(derive_key_r34(o, -44, fid), fid) == u[:16]

    def test_aes_pdf_roundtrip(self):
        plain = pdf_to_pages(build_pdf(PAGES))
        enc = build_pdf(PAGES, encrypt="aes")
        assert b"/AESV2" in enc and b"Secret" not in enc
        assert pdf_to_pages(enc) == plain
        assert pdf_to_pages(
            build_pdf(PAGES, compress=True, encrypt="aes")) == plain

    def test_aes_real_password_quarantines(self):
        enc = build_pdf(PAGES, encrypt="aes")
        bad = re.sub(rb"/U <([0-9A-Fa-f]{8})", rb"/U <00000000", enc)
        with pytest.raises(ValueError, match="password-protected"):
            pdf_to_pages(bad)

    def test_aes_pipeline_quarantines_not_fails(self, spark):
        from pyspark.sql import functions as F

        from lexoid_spark.plans.extract import extract

        good = build_pdf(PAGES, compress=True, encrypt="aes")
        bad = re.sub(rb"/U <([0-9A-Fa-f]{8})", rb"/U <00000000", good)
        pages = spark.createDataFrame(
            [("http://a.test/ok", good), ("http://a.test/locked", bad)],
            "url string, html binary",
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"),
            "html", F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
        out = extract(pages, run_id="aescrypt")
        ok = {r["url"]: r["raw"] for r in out["extracted"].collect()}
        errs = {r["url"]: r["error"] for r in out["errors"].collect()}
        assert ok == {"http://a.test/ok": "Secret but standard\n\n"}
        assert "password-protected" in errs["http://a.test/locked"]

    def test_pipeline_quarantines_not_fails(self, spark):
        """A password-protected PDF must land in the errors branch,
        never fail the stage or emit garbage markdown."""
        from pyspark.sql import functions as F

        from lexoid_spark.plans.extract import extract

        good = build_pdf(PAGES, compress=True, encrypt=True)
        bad = re.sub(rb"/U <([0-9A-Fa-f]{8})", rb"/U <00000000", good)
        pages = spark.createDataFrame(
            [("http://e.test/ok", good), ("http://e.test/locked", bad)],
            "url string, html binary",
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"),
            "html", F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
        out = extract(pages, run_id="crypt")
        ok = {r["url"]: r["raw"] for r in out["extracted"].collect()}
        errs = {r["url"]: r["error"] for r in out["errors"].collect()}
        assert ok == {"http://e.test/ok": "Secret but standard\n\n"}
        assert "password-protected" in errs["http://e.test/locked"]


class TestReviewHardening:
    def test_unsigned_p_form_accepted(self):
        from lexoid_spark.kernels.pdf_crypt import derive_key

        fid = b"\x02" * 16
        assert derive_key(b"O" * 32, -44, fid) == \
            derive_key(b"O" * 32, 4294967252, fid)
        # and a document serialized with the unsigned form parses
        enc = build_pdf(PAGES, encrypt=True)
        unsigned = enc.replace(b"/P -44", b"/P 4294967252")
        assert pdf_to_pages(unsigned) == pdf_to_pages(build_pdf(PAGES))

    def test_encrypt_token_in_content_not_triggering(self):
        # an UNENCRYPTED page whose text contains the literal token
        # sequence must not route into the decryption path
        pages = [{"words": words_line(
            ["see", "/Encrypt", "5", "0", "R", "reference"], 700.0)}]
        got = pdf_to_pages(build_pdf(pages))
        assert got[0][1].startswith("see /Encrypt 5 0 R reference")

    def test_trailer_outside_4k_tail_still_decrypts(self):
        # incremental-update layouts can push the live trailer out of
        # the last 4 KiB; the scan must widen (anchored at the last
        # 'trailer' keyword) instead of silently skipping decryption
        # and returning an empty parse
        enc = build_pdf(PAGES, encrypt=True)
        padded = enc + b"\n% " + b"x" * 8192 + b"\n%%EOF\n"
        assert pdf_to_pages(padded) == pdf_to_pages(build_pdf(PAGES))

    def test_unresolvable_indirect_length_quarantines(self):
        enc = build_pdf(PAGES, encrypt=True)
        # point the content stream /Length at a missing object
        import re as _re
        broken = _re.sub(rb"<< /Length \d+ >>", b"<< /Length 999 0 R >>",
                         enc, count=1)
        with pytest.raises(ValueError, match="unresolvable"):
            pdf_to_pages(broken)


class TestAes256:
    """V5/R5-R6 AESV3: FIPS-197 key-length generalization, the
    Algorithm-2.B KDF, /UE unwrap, /Perms integrity, end-to-end R6
    documents, and real-password quarantine."""

    def test_fips197_vectors_all_key_lengths(self):
        import numpy as np

        from lexoid_spark.kernels.pdf_crypt import (
            aes_decrypt_blocks, aes_encrypt_blocks)

        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        blocks = np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
        vectors = {
            "000102030405060708090a0b0c0d0e0f":
                "69c4e0d86a7b0430d8cdb78070b4c55a",          # C.1
            "000102030405060708090a0b0c0d0e0f1011121314151617":
                "dda97ca4864cdfe06eaf70a0ec0d7191",          # C.2
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b"
            "1c1d1e1f":
                "8ea2b7ca516745bfeafc49904b496089",          # C.3
        }
        for khex, chex in vectors.items():
            key = bytes.fromhex(khex)
            ct = aes_encrypt_blocks(key, blocks)
            assert ct.tobytes().hex() == chex
            assert aes_decrypt_blocks(key, ct).tobytes() == pt

    def test_scalar_core_matches_vectorized(self):
        import numpy as np

        from lexoid_spark.kernels.pdf_crypt import (
            _encrypt_block_scalar, aes_encrypt_blocks)

        rng = np.random.default_rng(3)
        for klen in (16, 24, 32):
            key = bytes(rng.integers(0, 256, klen, dtype=np.uint8))
            blocks = rng.integers(0, 256, (8, 16), dtype=np.uint8)
            want = aes_encrypt_blocks(key, blocks)
            for i in range(8):
                assert (_encrypt_block_scalar(key, blocks[i].tobytes())
                        == want[i].tobytes())

    @pytest.mark.parametrize("r", [5, 6])
    def test_write_derive_round_trip(self, r):
        from lexoid_spark.kernels.pdf_crypt import (
            check_perms_v5, derive_key_v5, make_entries_v5)

        u, ue, o, oe, perms, fk = make_entries_v5(-44, b"t1", r=r)
        assert derive_key_v5(u, ue, r=r) == fk
        assert len(fk) == 32 and len(u) == 48 and len(ue) == 32
        assert check_perms_v5(perms, fk, -44)
        assert not check_perms_v5(perms, fk, -45)

    def test_real_password_rejected(self):
        from lexoid_spark.kernels.pdf_crypt import (
            derive_key_v5, make_entries_v5)

        u, ue, *_ = make_entries_v5(-44, b"t2", user_pw=b"hunter2")
        with pytest.raises(ValueError, match="password"):
            derive_key_v5(u, ue)

    def test_r6_document_parses_identically(self):
        plain = build_pdf(PAGES, compress=True)
        enc = build_pdf(PAGES, compress=True, encrypt="aes256")
        assert b"/AESV3" in enc and b"/UE <" in enc
        assert b"Secret" not in enc  # streams really are encrypted
        assert pdf_to_pages(enc) == pdf_to_pages(plain)

    def test_r6_uncompressed_document_parses(self):
        assert pdf_to_pages(build_pdf(PAGES, encrypt="aes256")) == \
            pdf_to_pages(build_pdf(PAGES))

    def test_tampered_perms_quarantines(self):
        enc = bytearray(build_pdf(PAGES, compress=True,
                                  encrypt="aes256"))
        i = bytes(enc).find(b"/Perms <") + 8
        enc[i] = ord("0") if enc[i] != ord("0") else ord("1")
        with pytest.raises(ValueError, match="Perms"):
            pdf_to_pages(bytes(enc))

    def test_hash_2b_is_deterministic_and_salted(self):
        from lexoid_spark.kernels.pdf_crypt import hash_2b

        a = hash_2b(b"", b"saltAAAA")
        assert a == hash_2b(b"", b"saltAAAA") and len(a) == 32
        assert a != hash_2b(b"", b"saltBBBB")
        assert a != hash_2b(b"x", b"saltAAAA")
