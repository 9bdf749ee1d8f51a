"""dHash perceptual image fingerprint: box-mean exactness, invariance
properties, cross-codec agreement, quarantine flagging."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.phash import (
    DHASH_H,
    DHASH_W,
    box_mean_gray,
    dhash_halves,
    dhash_images,
)


class TestBoxMean:
    def test_identity_on_native_grid(self):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 256, (8, 9), dtype=np.int64)
        assert (box_mean_gray(g, 8, 9) == g).all()

    def test_exact_on_integer_upscale(self):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 256, (8, 9), dtype=np.int64)
        up = np.repeat(np.repeat(g, 3, axis=0), 2, axis=1)
        assert (box_mean_gray(up, 8, 9) == g).all()

    def test_matches_naive_loop_on_ragged_factor(self):
        rng = np.random.default_rng(2)
        g = rng.integers(0, 256, (13, 20), dtype=np.int64)
        got = box_mean_gray(g, 8, 9)
        ys = (np.arange(9) * 13) // 8
        xs = (np.arange(10) * 20) // 9
        for i in range(8):
            for j in range(9):
                box = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
                assert got[i, j] == box.sum() // box.size

    def test_too_small_raises(self):
        import pytest

        with pytest.raises(ValueError):
            box_mean_gray(np.zeros((4, 9), dtype=np.int64), 8, 9)


class TestDhash:
    def test_halves_fit_int32_range(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            g = rng.integers(0, 256, (8, 9), dtype=np.int64)
            lo, hi = dhash_halves(g)
            assert 0 <= lo < 2**32 and 0 <= hi < 2**32

    def test_bit_layout(self):
        # single gradient at row r, col c sets exactly bit r*8+c
        for r, c in [(0, 0), (3, 5), (7, 7)]:
            g = np.full((8, 9), 100, dtype=np.int64)
            g[r, c] = 101
            lo, hi = dhash_halves(g)
            val = (hi << 32) | lo
            assert val == 1 << (r * 8 + c)

    def test_brightness_invariance_no_wrap(self):
        rng = np.random.default_rng(4)
        g = rng.integers(10, 200, (8, 9), dtype=np.int64)
        assert dhash_halves(g) == dhash_halves(g + 37)

    def test_scale_invariance(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (8, 9), dtype=np.int64)
        up = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
        assert dhash_halves(g) == dhash_halves(up)


class TestDhashRay:
    def test_cross_codec_agreement_and_quarantine(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.multimodal import (
            encode_bmp,
            encode_gif,
            encode_png,
        )

        rng = np.random.default_rng(6)
        gray = rng.integers(0, 256, (8, 9), dtype=np.int64)
        img = np.repeat(gray.reshape(8, 9, 1), 3, axis=2).astype(np.uint8)
        up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        payloads = [
            encode_bmp(img),
            encode_png(img),
            encode_gif(img),
            encode_png(up),
            b"\x89PNG\r\n\x1a\ntruncated-garbage",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(5, dtype=np.int64)),
                "html": pa.array(payloads, pa.binary()),
            }
        )
        out = (
            dhash_images(ray.data.from_arrow(t).repartition(3), "html")
            .to_pandas()
            .sort_values("doc_id")
        )
        lo, hi = dhash_halves(gray)
        assert list(out["phash_ok"]) == [True] * 4 + [False]
        assert list(out["dhash_lo"][:4]) == [lo] * 4
        assert list(out["dhash_hi"][:4]) == [hi] * 4
        assert out["dhash_lo"].iloc[4] == -1 and out["dhash_hi"].iloc[4] == -1
