"""PDF text extraction (stages/pdftext.py): roundtrip, escape/string
machinery, Flate vs raw streams, boundaries, and the actor stage."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_scripts_ray.stages.pdftext import (
    PdfTextStage,
    decode_pdf_text,
    encode_pdf_text,
    extract_content_text,
)


class TestPdfCodec:
    def test_roundtrip_exact_both_stream_modes(self):
        texts = [
            "hello world",
            "line one\nline two\nline three",
            "",
            "par(en)s and \\back\\slashes",
            "unbalanced ) close ( open",
            "tabs\tand\x07ctrl bytes",
        ]
        for t in texts:
            for comp in (False, True):
                assert decode_pdf_text(encode_pdf_text(t, compress=comp)) == t

    @settings(max_examples=40, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=255),
            max_size=120,
        ),
        st.booleans(),
    )
    def test_roundtrip_property(self, text, comp):
        assert decode_pdf_text(encode_pdf_text(text, compress=comp)) == text

    def test_string_scanner_corners(self):
        # nested balanced parens need no escaping per ISO 32000
        assert extract_content_text(b"BT (a (nested) b) Tj ET") == "a (nested) b"
        # escape table + octal + line continuation
        hostile = (
            b"BT (x" + b"\\n" + b"\\t" + b"\\(" + b"y" + b"\\)" + b"\\\\"
            + b" " + b"\\101" + b"\\54" + b" a" + b"\\" + b"\n" + b"z) Tj ET"
        )
        assert extract_content_text(hostile) == "x\n\t(y)\\ A, az"
        # hex strings, odd nibble padded with 0
        assert extract_content_text(b"BT <48656C6C6F> Tj <4> Tj ET") == "Hello@"
        # ' and \" start new lines and show their string
        assert extract_content_text(b"BT (a) Tj (b) ' 2 3 (c) \" ET") == "a\nb\nc"
        # strings not consumed by a text operator are dropped
        assert extract_content_text(b"BT (gone) Tz (kept) Tj ET") == "kept"

    def test_unterminated_string_rejected(self):
        with pytest.raises(ValueError, match="unterminated"):
            extract_content_text(b"BT (never closes Tj ET")
        with pytest.raises(ValueError, match="unterminated"):
            extract_content_text(b"BT <48656 Tj ET")

    def test_boundaries_and_malformed(self):
        pay = encode_pdf_text("secret text")
        # /Encrypt pointing at a non-Standard dict: still a boundary (the
        # rev-2/3 RC4 standard handler itself now decrypts for real —
        # TestPdfEncryption)
        with pytest.raises(NotImplementedError, match="security handler"):
            decode_pdf_text(pay.replace(b"/Root", b"/Encrypt"))
        with pytest.raises(ValueError):
            decode_pdf_text(b"not a pdf")
        with pytest.raises(ValueError):
            decode_pdf_text(None)
        # corrupt Flate stream is structural, not silent-empty
        comp = encode_pdf_text("zzz", compress=True)
        i = comp.index(b"stream\n") + 7
        mut = bytearray(comp)
        mut[i : i + 4] = b"\xff\xfe\xfd\xfc"
        with pytest.raises(ValueError, match="FlateDecode"):
            decode_pdf_text(bytes(mut))

    def test_non_flate_filters_skipped(self):
        """A DCTDecode (JPEG image) stream must not contribute garbage
        text — image objects are skipped, the text layer survives."""
        pay = encode_pdf_text("real text")
        img_obj = (
            b"9 0 obj\n<< /Length 6 /Filter /DCTDecode >>\n"
            b"stream\n(fake) endstream\nendobj\n"
        )
        i = pay.index(b"xref")
        assert decode_pdf_text(pay[:i] + img_obj + pay[i:]) == "real text"

    def test_stage_flags_never_drops(self):
        t = pa.table(
            {
                "doc": pa.array([1, 2, 3], pa.int64()),
                "pdf": pa.array(
                    [
                        encode_pdf_text("a\nb", compress=True),
                        b"broken",
                        encode_pdf_text("ok").replace(b"/Root", b"/Encrypt"),
                    ],
                    pa.binary(),
                ),
            }
        )
        df = PdfTextStage("pdf")(t).to_pandas()
        assert df["doc"].tolist() == [1, 2, 3]
        assert df["pdf_text"].tolist() == ["a\nb", "", ""]
        assert df["n_chars"].tolist() == [3, 0, 0]
        assert df["n_lines"].tolist() == [1, 0, 0]
        assert df["decoded_ok"].tolist() == [True, False, False]


class TestPdfEncryption:
    """RC4 standard security handler (ISO 32000-1 §7.6.3): public test
    vectors for the cipher, both revisions end-to-end, and the boundary
    contract for what still cannot decrypt."""

    def test_rc4_public_vectors(self):
        from gis_scripts_ray.stages.pdftext import rc4_crypt

        # folklore vectors (Wikipedia RC4 article)
        assert rc4_crypt(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
        assert rc4_crypt(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
        assert (
            rc4_crypt(b"Secret", b"Attack at dawn").hex().upper()
            == "45A01F645FC35B383552544B9BF5"
        )
        # RFC 6229: 40-bit key 0x0102030405 and 128-bit 0x0102..10,
        # keystream offsets 0..15
        assert (
            rc4_crypt(bytes([1, 2, 3, 4, 5]), b"\x00" * 16).hex()
            == "b2396305f03dc027ccc3524a0a1118a8"
        )
        assert (
            rc4_crypt(bytes(range(1, 17)), b"\x00" * 16).hex()
            == "9ac7cc9a609d1ef7b2932899cde41b97"
        )
        # involution: decrypt(encrypt(x)) == x
        assert rc4_crypt(b"k", rc4_crypt(b"k", b"payload")) == b"payload"

    def test_encrypted_roundtrip_all_modes(self):
        text = "hello (world)\nsecond \\ line\nthird"
        for rev in (2, 3):
            for comp in (False, True):
                pdf = encode_pdf_text(text, compress=comp, encrypt_rev=rev)
                assert b"/Encrypt" in pdf and b"/Standard" in pdf
                assert decode_pdf_text(pdf) == text, (rev, comp)
                # ciphertext really differs from plaintext
                plain = encode_pdf_text(text, compress=comp)
                assert pdf != plain

    def test_password_protected_stays_boundary(self):
        import re as _re

        import pytest as _pytest

        pdf = encode_pdf_text("secret", encrypt_rev=2)
        bad = _re.sub(rb"/U <([0-9a-f]{8})", rb"/U <deadbeef", pdf)
        with _pytest.raises(NotImplementedError):
            decode_pdf_text(bad)

    def test_unknown_cfm_stays_boundary(self):
        # V4 with a crypt filter this handler doesn't know (e.g. a
        # nonstandard CFM) must still raise, never silently misdecrypt
        import re as _re

        import pytest as _pytest

        pdf = encode_pdf_text("x", encrypt_rev=4)
        weird = _re.sub(rb"/CFM /AESV2", rb"/CFM /AESV9", pdf)
        with _pytest.raises(NotImplementedError):
            decode_pdf_text(weird)

    def test_aes_encrypted_roundtrip(self):
        text = "hello (AES) world\\x\nsecond line"
        for rev in (4, 5):
            for comp in (False, True):
                pdf = encode_pdf_text(text, compress=comp, encrypt_rev=rev)
                assert b"/Encrypt" in pdf
                assert (b"/AESV2" if rev == 4 else b"/AESV3") in pdf
                assert decode_pdf_text(pdf) == text, (rev, comp)
                assert pdf != encode_pdf_text(text, compress=comp)
                # deterministic fixture writer
                assert pdf == encode_pdf_text(
                    text, compress=comp, encrypt_rev=rev
                )

    def test_aesv3_r6_hardened_kdf_roundtrip(self):
        # rev 6 runs the iterated 2.B KDF (~1 s/call by design)
        text = "r6 (secret)\nline"
        pdf = encode_pdf_text(text, compress=True, encrypt_rev=6)
        assert b"/R 6" in pdf and b"/UE <" in pdf
        assert decode_pdf_text(pdf) == text

    def test_aes_password_protected_stays_boundary(self):
        import re as _re

        import pytest as _pytest

        for rev in (4, 5):
            pdf = encode_pdf_text("secret", encrypt_rev=rev)
            bad = _re.sub(rb"/U <([0-9a-f]{4})", rb"/U <beef", pdf)
            assert bad != pdf
            with _pytest.raises(NotImplementedError):
                decode_pdf_text(bad)

    def test_aes_stage_decodes_encrypted_rows(self):
        t = pa.table(
            {
                "doc": pa.array([1, 2], pa.int64()),
                "pdf": pa.array(
                    [
                        encode_pdf_text("aes (v2)", encrypt_rev=4),
                        encode_pdf_text(
                            "aes v3\nline", compress=True, encrypt_rev=5
                        ),
                    ],
                    pa.binary(),
                ),
            }
        )
        df = PdfTextStage("pdf")(t).to_pandas()
        assert df["pdf_text"].tolist() == ["aes (v2)", "aes v3\nline"]
        assert df["decoded_ok"].tolist() == [True, True]


class TestAesCipher:
    """FIPS-197 Appendix C + NIST SP 800-38A known-answer vectors for
    the from-first-principles AES in functions/aes.py — the S-box and
    GF tables are COMPUTED, so these vectors pin the whole derivation."""

    def test_fips197_appendix_c_all_key_sizes(self):
        from gis_scripts_ray.functions import aes

        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        for klen, want in [
            (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
            (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
            (32, "8ea2b7ca516745bfeafc49904b496089"),
        ]:
            rk = aes.key_expansion(bytes(range(klen)))
            blocks = np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
            ct = aes.ecb_encrypt_blocks(blocks, rk).tobytes()
            assert ct.hex() == want, klen
            back = aes.ecb_decrypt_blocks(
                np.frombuffer(ct, dtype=np.uint8).reshape(1, 16), rk
            ).tobytes()
            assert back == pt

    def test_sp800_38a_cbc_aes128(self):
        from gis_scripts_ray.functions import aes

        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex(
            "6bc1bee22e409f96e93d7e117393172a"
            "ae2d8a571e03ac9c9eb76fac45af8e51"
            "30c81c46a35ce411e5fbc1191a0a52ef"
            "f69f2445df4f9b17ad2b417be66c3710"
        )
        ct = bytes.fromhex(
            "7649abac8119b246cee98e9b12e9197d"
            "5086cb9b507219ee95db113a917678b2"
            "73bed6b8e3c1743b7116e69e22229516"
            "3ff1caa1681fac09120eca307586e1a7"
        )
        assert aes.cbc_encrypt(key, iv, pt) == ct
        assert aes.cbc_decrypt(key, iv, ct) == pt

    def test_python_and_numpy_paths_agree(self):
        # cbc_encrypt runs T-table Python ints, cbc_decrypt runs the
        # vectorized numpy ECB — a multi-block roundtrip crosses both
        from gis_scripts_ray.functions import aes

        rng = np.random.default_rng(7)
        for klen in (16, 24, 32):
            key = bytes(rng.integers(0, 256, klen, dtype=np.uint8))
            iv = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
            data = bytes(rng.integers(0, 256, 16 * 37, dtype=np.uint8))
            assert aes.cbc_decrypt(key, iv, aes.cbc_encrypt(key, iv, data)) == data

    def test_pkcs7(self):
        from gis_scripts_ray.functions import aes

        for n in range(0, 49):
            d = bytes(range(n % 256))[:n]
            p = aes.pkcs7_pad(d)
            assert len(p) % 16 == 0 and aes.pkcs7_unpad(p) == d
        with pytest.raises(ValueError):
            aes.pkcs7_unpad(b"\x00" * 16)
        with pytest.raises(ValueError):
            aes.pkcs7_unpad(b"")

    def test_stage_decodes_encrypted_rows(self):
        t = pa.table(
            {
                "doc": pa.array([1, 2], pa.int64()),
                "pdf": pa.array(
                    [
                        encode_pdf_text("enc2", encrypt_rev=2),
                        encode_pdf_text("enc3\nline", compress=True, encrypt_rev=3),
                    ],
                    pa.binary(),
                ),
            }
        )
        df = PdfTextStage("pdf")(t).to_pandas()
        assert df["pdf_text"].tolist() == ["enc2", "enc3\nline"]
        assert df["decoded_ok"].tolist() == [True, True]

    def test_direct_length_protects_trailing_cr(self):
        # a compressed/encrypted body ending 0x0D must survive (the
        # /Length path; the endstream EOL heuristic would eat the byte)
        from gis_scripts_ray.stages.pdftext import _pdf_streams

        body = b"BT (x) Tj ET \r"  # crafted raw stream ending in CR
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        )
        [(head, raw)] = list(_pdf_streams(pdf))
        assert raw == body
