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

    def test_aes_stays_boundary(self):
        import re as _re

        import pytest as _pytest

        pdf = encode_pdf_text("x", encrypt_rev=3)
        aes = _re.sub(rb"/V 2 /R 3", rb"/V 4 /R 4", pdf)
        with _pytest.raises(NotImplementedError):
            decode_pdf_text(aes)

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
