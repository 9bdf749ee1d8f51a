"""Property-based parity tests (hypothesis): the vectorized batch
kernels must equal their per-row references on ARBITRARY inputs, not
just the hand-picked fixtures — the engine's kernel rule (CLAUDE.md)
made adversarial. No Ray needed; all kernels run in-process."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# words without spaces (the split(" ") contract); includes empties via
# the text strategy below joining them
_word = st.text(
    alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=6,
)
_doc = st.lists(_word, min_size=0, max_size=15).map(" ".join)
_docs = st.lists(st.one_of(st.none(), _doc), min_size=1, max_size=12)


class TestNgramHashParity:
    @settings(max_examples=60, deadline=None)
    @given(_docs, st.integers(min_value=2, max_value=5))
    def test_batch_equals_per_row(self, docs, n):
        from gis_scripts_ray.stages.decontam import doc_ngram_hashes, ngram_hash_row

        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        out = doc_ngram_hashes(t, "text", "doc_id", n)
        got: dict = {}
        for i, h in zip(out["doc_id"].to_pylist(), out["h"].to_pylist()):
            got.setdefault(i, []).append(h)
        for i, d in enumerate(docs):
            assert sorted(got.get(i, [])) == ngram_hash_row(d, n), (i, d)


class TestQuantizeParity:
    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=4,
                max_size=4,
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_batch_equals_per_row(self, rows):
        from gis_scripts_ray.stages.quantize import quantize_matrix, quantize_row

        m = np.asarray(rows, dtype=np.float64)
        q, scale = quantize_matrix(m)
        for i, r in enumerate(rows):
            assert list(q[i].astype(int)) == quantize_row(r), (i, r)
            assert -127 <= q[i].min() and q[i].max() <= 127


class TestMinhashParity:
    @settings(max_examples=40, deadline=None)
    @given(_docs, st.integers(min_value=1, max_value=3))
    def test_batch_equals_per_row(self, docs, chunk_cap):
        from gis_scripts_ray.stages.dedup import MinHasher

        mh = MinHasher("doc_id", "text", num_perm=16, shingle_w=2, bands=4)
        texts = pa.array(docs, pa.string())
        # tiny chunk_cap also fuzzes the chunk-boundary invariant
        sigs = mh.signatures(texts, chunk_cap=chunk_cap)
        for i, d in enumerate(docs):
            ref = mh.minhash(d if d is not None else "")
            assert list(sigs[i]) == list(ref), (i, d)


class TestSmoothIntParity:
    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**31),
        st.integers(min_value=1, max_value=3).map(lambda r: 2 * r + 1),
    )
    def test_distributed_kernel_math_equals_brute(self, seed, klen):
        # the in-task dense separable conv vs the per-cell brute force
        # (no Ray: call the same _blur2d the stripe task uses, full grid)
        from gis_scripts_ray.stages.smoothing import (
            _blur2d,
            smooth_cells_reference,
        )

        rng = np.random.default_rng(seed)
        h = w = klen + 3
        mask = rng.random((h, w)) < 0.5
        y, x = np.nonzero(mask)
        if len(y) == 0:
            return
        v = rng.integers(-9, 10, size=len(y)).astype(np.int64)
        kernel = rng.integers(1, 5, size=klen).astype(np.int64)
        grid = np.zeros((h, w), np.int64)
        m = np.zeros((h, w), np.int64)
        grid[y, x] = v
        m[y, x] = 1
        num = _blur2d(grid * m, kernel)
        den = _blur2d(m, kernel)
        bn, bd = smooth_cells_reference(y, x, v, kernel)
        assert np.array_equal(num[y, x], bn)
        assert np.array_equal(den[y, x], bd)


class TestRepetitionParity:
    @settings(max_examples=60, deadline=None)
    @given(_docs)
    def test_batch_equals_per_row(self, docs):
        from gis_scripts_ray.stages.textstages import (
            repetition_stats,
            repetition_stats_row,
        )

        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        out = repetition_stats(t).to_pydict()
        assert out["doc_id"] == list(range(len(docs)))
        for i, d in enumerate(docs):
            want = repetition_stats_row(d)
            for col in ("n_tokens", "dup_tokens", "max_bigram_n", "dup_trigram_n"):
                assert out[col][i] == want[col], (i, col, d)


class TestCodecRoundtripProps:
    """Round-5: the pure-numpy codecs under adversarial inputs — lossless
    formats must roundtrip EXACTLY on arbitrary pixel content; JPEG must
    roundtrip exactly on its documented exact domain (flat 8x8 gray
    blocks, quant=1) in every subsampling/restart mode."""

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_png_bmp_ppm_roundtrip(self, h, w, seed):
        from gis_scripts_ray.stages.multimodal import (
            decode_bmp, decode_png, decode_ppm,
            encode_bmp, encode_png, encode_ppm,
        )

        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_ppm(encode_ppm(img)) == img).all()

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=2, max_value=64),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.booleans(),
    )
    def test_gif_roundtrip(self, h, w, ncolors, seed, interlace):
        from gis_scripts_ray.stages.multimodal import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncolors, 3), np.uint8)
        img = pal[rng.integers(0, ncolors, (h, w))]
        assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["444", "422", "420"]),
        st.integers(min_value=0, max_value=3),
    )
    def test_jpeg_flat_blocks_exact(self, by, bx, seed, sub, restart):
        from gis_scripts_ray.stages.multimodal import decode_jpeg, encode_jpeg

        g = np.random.default_rng(seed).integers(0, 256, (by, bx), np.int64)
        img = np.repeat(np.repeat(g, 8, 0), 8, 1).astype(np.uint8)
        rgb = np.repeat(img[:, :, None], 3, 2)
        pay = encode_jpeg(rgb, quant=1, subsampling=sub, restart_interval=restart)
        assert (decode_jpeg(pay) == rgb).all()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=6))
    def test_avi_container_roundtrip(self, frames):
        from gis_scripts_ray.stages.multimodal import (
            avi_mjpeg_frames, encode_avi_mjpeg,
        )

        pay = encode_avi_mjpeg(frames, size=(8, 8))
        assert avi_mjpeg_frames(pay) == frames

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=6))
    def test_mp4_container_roundtrip(self, frames):
        from gis_scripts_ray.stages.multimodal import (
            encode_mp4_mjpeg, mp4_mjpeg_frames,
        )

        pay = encode_mp4_mjpeg(frames, size=(8, 8))
        assert mp4_mjpeg_frames(pay) == frames

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=6))
    def test_mkv_container_roundtrip(self, frames):
        from gis_scripts_ray.stages.multimodal import (
            encode_mkv_mjpeg, mkv_mjpeg_frames,
        )

        pay = encode_mkv_mjpeg(frames, size=(8, 8))
        assert mkv_mjpeg_frames(pay) == frames

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=120
        ),
        st.sampled_from([1, 8000, 44100, 48000]),
    )
    def test_aiff_roundtrip(self, samples, rate):
        from gis_scripts_ray.stages.multimodal import decode_audio, encode_aiff_pcm16

        s = np.array(samples, np.int16)
        r, got = decode_audio(encode_aiff_pcm16(s, rate=rate))
        assert r == rate and got.tolist() == samples

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=255), min_size=0, max_size=120))
    def test_wav_mulaw_roundtrip(self, codes):
        from gis_scripts_ray.stages.multimodal import (
            decode_audio, encode_wav_mulaw, mulaw_expand,
        )

        c = np.array(codes, np.uint8)
        r, got = decode_audio(encode_wav_mulaw(c, rate=8000))
        assert r == 8000 and (got == mulaw_expand(c)).all()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=6))
    def test_gvid_container_roundtrip(self, frames):
        from gis_scripts_ray.stages.multimodal import encode_gvid, gvid_frames

        assert gvid_frames(encode_gvid(frames)) == frames

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
        ),
        st.sampled_from([8000, 16000, 44100]),
    )
    def test_wav_roundtrip(self, samples, rate):
        from gis_scripts_ray.stages.multimodal import (
            decode_wav_pcm16, encode_wav_pcm16,
        )

        s = np.array(samples, dtype=np.int16)
        got_rate, got = decode_wav_pcm16(encode_wav_pcm16(s, rate=rate))
        assert got_rate == rate and (got == s).all()


class TestPagerankProps:
    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=11),
                st.integers(min_value=0, max_value=11),
            ),
            min_size=0,
            max_size=40,
        ),
    )
    def test_reference_mass_conservation_bounds(self, n, edges):
        """The fixed-point recurrence keeps every rank in
        [jump, jump + damp*total/scale] — ranks can never go negative or
        exceed the damped total in-mass (floor losses only shrink)."""
        from tests.test_pagerank import DAMP, SCALE, ref_pagerank

        edges = [(a % n, b % n) for a, b in edges]
        r = ref_pagerank(edges, n)
        total = n * SCALE
        for v in r:
            assert SCALE - DAMP <= v <= SCALE - DAMP + (DAMP * total) // SCALE
