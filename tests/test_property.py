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
