"""Charset sniffing + decode (stages/charset.py)."""

import codecs

import pyarrow as pa

from gis_scripts_ray.stages.charset import (
    CharsetDecodeStage,
    decode_payload,
    sniff_charset,
)


class TestSniffOrder:
    def test_bom_wins_over_meta(self):
        p = codecs.BOM_UTF8 + b'<meta charset="iso-8859-1">x'
        assert sniff_charset(p) == ("utf-8", "bom")
        assert sniff_charset(codecs.BOM_UTF16_LE + b"a\x00") == (
            "utf-16-le",
            "bom",
        )
        assert sniff_charset(codecs.BOM_UTF16_BE + b"\x00a") == (
            "utf-16-be",
            "bom",
        )

    def test_meta_prescan_and_label_normalization(self):
        assert sniff_charset(b'<meta charset="ISO-8859-1">') == (
            "windows-1252",
            "meta",
        )
        assert sniff_charset(b"<meta charset=utf8>") == ("utf-8", "meta")
        assert sniff_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1252">'
        ) == ("windows-1252", "meta")
        # prescan window is 1024 bytes: a late meta is invisible
        late = b" " * 1024 + b'<meta charset="iso-8859-1">'
        assert sniff_charset(late) == ("utf-8", "utf8-valid")
        # unknown label falls through to the probe, not an error
        assert sniff_charset(b'<meta charset="klingon">ok') == (
            "utf-8",
            "utf8-valid",
        )

    def test_probe_and_fallback(self):
        assert sniff_charset("café".encode()) == ("utf-8", "utf8-valid")
        assert sniff_charset(b"caf\xe9 plain") == ("windows-1252", "fallback")


class TestDecode:
    def test_bom_stripped(self):
        t, enc, src, ok = decode_payload(
            codecs.BOM_UTF16_LE + "hi ✓".encode("utf-16-le")
        )
        assert (t, enc, src, ok) == ("hi ✓", "utf-16-le", "bom", True)
        t, *_ = decode_payload(codecs.BOM_UTF8 + b"abc")
        assert t == "abc"

    def test_web_1252_c1_bytes_total(self):
        # 0x80 is EURO in cp1252; 0x81 is undefined in cp1252 but maps
        # to U+0081 in web windows-1252 — decode must be total.
        t, enc, src, ok = decode_payload(b"\x80\x81\x9d\xe9")
        assert (enc, src, ok) == ("windows-1252", "fallback", True)
        assert t == "€\x81\x9dé"

    def test_declared_encoding_that_fails_is_flagged(self):
        # declared utf-8 but invalid bytes: replacement chars, ok=False
        p = b'<meta charset="utf-8">bad \xff'
        t, enc, src, ok = decode_payload(p)
        assert (enc, src, ok) == ("utf-8", "meta", False)
        assert "�" in t

    def test_stage_columns_and_null(self):
        t = pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"caf\xe9", None], pa.binary()),
            }
        )
        df = CharsetDecodeStage("payload")(t).to_pandas()
        assert df["text"].tolist() == ["café", ""]
        assert df["encoding"].tolist() == ["windows-1252", "utf-8"]
        assert df["enc_source"].tolist() == ["fallback", "utf8-valid"]
        assert df["decoded_ok"].tolist() == [True, True]
