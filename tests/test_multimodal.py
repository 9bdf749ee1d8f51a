"""Pure-numpy BMP/PPM/PNG codecs + the decode actor stage (honest decode path).

Reference analog: the DCNN block classifier decodes real pixels
(``external/.../seagrass_lib.py:696-761``); here the decodable formats
are uncompressed BMP, binary PPM and real entropy-coded PNG (stdlib
zlib + numpy unfiltering); only JPEG remains a stub boundary.
"""
import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.multimodal import (
    DecodeStage,
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    sniff_type,
)


class TestCodecs:
    @pytest.mark.parametrize("shape", [(8, 8), (5, 7), (1, 1), (3, 10)])
    def test_bmp_ppm_roundtrip(self, shape):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert sniff_type(encode_bmp(img)) == "bmp"
        assert sniff_type(encode_ppm(img)) == "ppm"

    def test_bmp_top_down(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
        b = bytearray(encode_bmp(img))
        b[22:26] = (-4).to_bytes(4, "little", signed=True)
        assert (decode_bmp(bytes(b)) == img[::-1]).all()

    def test_bmp_golden_bytes(self):
        """Hand-checkable 2x1 image: red then green pixel, bottom-up BGR,
        2-byte row padding."""
        img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
        payload = encode_bmp(img)
        assert payload[54:62] == b"\x00\x00\xff\x00\xff\x00\x00\x00"
        assert (decode_bmp(payload) == img).all()

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            decode_bmp(b"BM" + b"\x00" * 10)
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n8 8\n70000\n" + b"\x00" * 300)
        with pytest.raises(ValueError):
            decode_bmp(encode_bmp(np.zeros((2, 2, 3), np.uint8))[:-5])

    def test_ppm_comments(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (2, 3, 3)).astype(np.uint8)
        pay = b"P6\n# comment\n3 2\n# another\n255\n" + img.tobytes()
        assert (decode_ppm(pay) == img).all()


class TestPngCodec:
    """Round-3 verdict task #4: the real entropy-coded decoder."""

    @pytest.mark.parametrize("shape", [(8, 8), (5, 13), (1, 1), (16, 3)])
    def test_rgb_roundtrip_cycled_filters(self, shape):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        pay = encode_png(img)  # default: row filters cycle 0,1,2,3,4
        assert sniff_type(pay) == "png"
        assert (decode_png(pay) == img).all()

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_each_filter_roundtrip(self, filt):
        rng = np.random.default_rng(12 + filt)
        img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img, filters=filt)) == img).all()

    def test_gray_alpha_palette(self):
        rng = np.random.default_rng(13)
        g = rng.integers(0, 256, (6, 6)).astype(np.uint8)
        assert (decode_png(encode_png(g)) == np.repeat(g[:, :, None], 3, 2)).all()
        rgba = rng.integers(0, 256, (6, 6, 4)).astype(np.uint8)
        assert (decode_png(encode_png(rgba)) == rgba[:, :, :3]).all()
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (6, 6)).astype(np.uint8)
        assert (decode_png(encode_png(idx, palette=pal)) == pal[idx]).all()

    def test_corrupt_crc_truncation_interlace(self):
        import zlib

        img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
        pay = encode_png(img)
        # flipped IDAT byte -> CRC mismatch, quarantined never silent
        bad = bytearray(pay)
        bad[60] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(bad))
        with pytest.raises(ValueError):
            decode_png(pay[:-6])
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG\r\n")
        # valid CRC but interlace=1 -> explicit unsupported boundary
        il = bytearray(pay)
        ihdr = bytes(il[16:28]) + bytes([1])
        crc = (zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
        il[16:33] = ihdr + crc
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(bytes(il))

    def test_golden_bytes(self):
        """Hand-checkable 2x1 RGB with filter 0: the filtered scanline is
        the raw pixels prefixed by the filter id."""
        import zlib

        img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
        pay = encode_png(img, filters=0)
        # IDAT data starts after sig(8) + IHDR chunk(25) + len/type(8)
        idat = pay[8 + 25 + 8 : -12 - 4]
        assert zlib.decompress(idat) == b"\x00\xff\x00\x00\x00\xff\x00"
        assert (decode_png(pay) == img).all()


class TestDecodeStage:
    def test_checksum_and_thumb(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        batch = pa.table(
            {
                "html": pa.array(
                    [
                        encode_bmp(img),
                        encode_ppm(img),
                        encode_png(img),
                        b"\x89PNG\r\n",  # truncated png -> flagged
                        b"<html>x",
                    ],
                    pa.binary(),
                )
            }
        )
        out = DecodeStage(payload_col="html", target_size=(8, 8))(batch)
        assert out["media_type"].to_pylist() == ["bmp", "ppm", "png", "png", "html"]
        assert out["decoded_ok"].to_pylist() == [True, True, True, False, True]
        assert out["pixel_sum"].to_pylist()[:3] == [int(img.sum())] * 3
        assert out["pixel_sum"].to_pylist()[3:] == [-1, -1]
        # thumb of the bmp equals the deterministic gray subsample
        gray = (
            img[:, :, 0].astype(np.uint16)
            + img[:, :, 1]
            + img[:, :, 2]
        ) // 3
        idx = (np.arange(8) * 16) // 8
        want = gray[np.ix_(idx, idx)].astype(np.uint8).ravel()
        got = np.array(out["thumb"][0].as_py(), dtype=np.uint8)
        assert (got == want).all()

    def test_corrupt_payload_flagged_not_fatal(self):
        batch = pa.table({"html": pa.array([b"BM\x00\x00bad"], pa.binary())})
        out = DecodeStage(payload_col="html")(batch)
        assert out["decoded_ok"].to_pylist() == [False]
