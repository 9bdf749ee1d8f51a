"""Decontamination (stages/decontam.py): batch==per-row n-gram hash
parity, brute-force hit parity, both delivery paths, block invariance."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.decontam import (
    decontaminate_hits,
    doc_ngram_hashes,
    ngram_hash_row,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog today",  # 10 words
    "a b c",  # shorter than n -> no ngrams
    "",  # empty
    None,  # null
    "the quick brown fox jumps over the lazy dog tomorrow",  # shares an 8-gram w/ 0
    "one two three four five six seven eight nine ten eleven",
    "x " * 20,  # trailing empties from split
]


def _tbl(docs, ids=None):
    ids = list(range(len(docs))) if ids is None else ids
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


class TestNgramParity:
    @pytest.mark.parametrize("n", [2, 8])
    def test_batch_matches_per_row(self, n):
        out = doc_ngram_hashes(_tbl(DOCS), "text", "doc_id", n)
        got = {}
        for i, h in zip(out["doc_id"].to_pylist(), out["h"].to_pylist()):
            got.setdefault(i, []).append(h)
        for i, d in enumerate(DOCS):
            assert sorted(got.get(i, [])) == ngram_hash_row(d, n), (i, n)

    def test_distinctness(self):
        out = doc_ngram_hashes(_tbl(["a a a a a a"] * 2), "text", "doc_id", 3)
        # 4 windows, all identical -> ONE distinct hash per doc
        assert len(out) == 2
        assert out["h"][0] == out["h"][1]


def _brute_hits(corpus, bench, n):
    def grams(t):
        ws = (t or "").split(" ")
        return {
            " ".join(ws[i : i + n]) for i in range(max(0, len(ws) - n + 1))
        } if len(ws) >= n else set()

    bg = set().union(*(grams(t) for _, t in bench)) if bench else set()
    out = {}
    for i, t in corpus:
        k = len(grams(t) & bg)
        if k:
            out[i] = k
    return out


class TestHits:
    def _fixture(self):
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(12)]
        corpus = [
            (i, " ".join(rng.choice(vocab, size=rng.integers(3, 25)).tolist()))
            for i in range(60)
        ]
        # plant exact bench phrases inside some corpus docs
        bench = [(1000 + j, " ".join(rng.choice(vocab, size=12).tolist())) for j in range(4)]
        for j, (bid, bt) in enumerate(bench):
            i = 10 + j * 7
            corpus[i] = (i, corpus[i][1] + " " + bt)
        return corpus, bench

    @pytest.mark.parametrize("limit", [2_000_000, 0])  # broadcast vs join path
    def test_matches_brute_force(self, ray_session, limit):
        import ray.data

        corpus, bench = self._fixture()
        n = 5
        expect = _brute_hits(corpus, bench, n)
        cds = ray.data.from_arrow(
            _tbl([t for _, t in corpus], [i for i, _ in corpus])
        ).repartition(4)
        bds = ray.data.from_arrow(
            _tbl([t for _, t in bench], [i for i, _ in bench])
        )
        out = decontaminate_hits(cds, bds, n=n, broadcast_limit=limit)
        t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
        got = dict(zip(t["doc_id"].to_pylist(), t["n_hits"].to_pylist()))
        assert got == expect

    def test_empty_bench(self, ray_session):
        import ray.data

        corpus, _ = self._fixture()
        cds = ray.data.from_arrow(_tbl([t for _, t in corpus], [i for i, _ in corpus]))
        bds = ray.data.from_arrow(_tbl([], []))
        out = decontaminate_hits(cds, bds, n=5)
        assert out.count() == 0

    def test_block_invariance(self, ray_session):
        import ray.data

        corpus, bench = self._fixture()
        outs = []
        for nb in (1, 7):
            cds = ray.data.from_arrow(
                _tbl([t for _, t in corpus], [i for i, _ in corpus])
            ).repartition(nb)
            bds = ray.data.from_arrow(
                _tbl([t for _, t in bench], [i for i, _ in bench])
            ).repartition(2)
            t = pa.concat_tables(
                list(
                    decontaminate_hits(cds, bds, n=5).iter_batches(
                        batch_format="pyarrow"
                    )
                )
            )
            outs.append(
                sorted(zip(t["doc_id"].to_pylist(), t["n_hits"].to_pylist()))
            )
        assert outs[0] == outs[1]
