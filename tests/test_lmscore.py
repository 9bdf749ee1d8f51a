"""Corpus bigram-LM quality scoring (stages/lmscore.py): pure-python
reference parity on arbitrary corpora, forced join-path == broadcast-path
equivalence, short/null-doc exclusion, hand-checked integer scores."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.lmscore import lm_bigram_scores

SCALE = 1_000_000


def ref_scores(texts: "list[str | None]") -> dict:
    """doc index -> (n_bigrams, p_sum_micro); docs with <2 tokens absent."""
    c2: Counter = Counter()
    c1: Counter = Counter()
    doc_bgs = []
    for t in texts:
        w = (t or "").split(" ")
        bgs = list(zip(w[:-1], w[1:]))
        doc_bgs.append(bgs)
        for b in bgs:
            c2[b] += 1
            c1[b[0]] += 1
    out = {}
    for i, bgs in enumerate(doc_bgs):
        if bgs:
            out[i] = (
                len(bgs),
                sum((SCALE * c2[b]) // c1[b[0]] for b in bgs),
            )
    return out


def _run(texts, ray_needed=True, **kw):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        lm_bigram_scores(ray.data.from_arrow(t).repartition(3), **kw)
        .to_pandas()
        .sort_values("doc_id")
    )
    return {
        int(r.doc_id): (int(r.n_bigrams), int(r.p_sum_micro))
        for r in out.itertuples()
    }


VOCAB = ["the", "fast", "sort", "merge", "scan", "window", "join"]


def _corpus(n=40, seed=11):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.integers(0, 10)))
        for _ in range(n)
    ]
    texts[3] = None
    texts[5] = "solo"  # single token: no bigrams, excluded from output
    texts[6] = ""
    return texts


class TestLmScore:
    def test_matches_reference(self, ray_session):
        texts = _corpus()
        assert _run(texts) == ref_scores(texts)

    def test_join_path_equals_broadcast_path(self, ray_session):
        texts = _corpus(seed=13)
        assert _run(texts, broadcast_limit=0, num_partitions=4) == _run(texts)

    def test_hand_checked_integers(self, ray_session):
        # corpus: "a b", "a b", "a c" -> c2(a,b)=2, c2(a,c)=1, c1(a)=3
        texts = ["a b", "a b", "a c"]
        got = _run(texts)
        assert got == {
            0: (1, (SCALE * 2) // 3),
            1: (1, (SCALE * 2) // 3),
            2: (1, (SCALE * 1) // 3),
        }

    def test_repeated_bigram_in_one_doc(self, ray_session):
        # "x y x y" has bigrams (x,y),(y,x),(x,y): c2(x,y)=2, c1(x)=2,
        # c2(y,x)=1, c1(y)=1 -> p = 1e6 + 1e6 + 1e6
        got = _run(["x y x y"])
        assert got == {0: (3, 3 * SCALE)}
        assert got == ref_scores(["x y x y"])

    def test_carry_cols(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "lang": pa.array(["en", "fr"], pa.string()),
                "text": pa.array(["a b", "a b"], pa.string()),
            }
        )
        out = (
            lm_bigram_scores(ray.data.from_arrow(t), carry_cols=["lang"])
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["lang"].tolist() == ["en", "fr"]
        assert out["p_sum_micro"].tolist() == [SCALE, SCALE]


class TestBlockInvariance:
    def test_scores_partition_invariant(self, ray_session):
        """House rule: results must not depend on block structure."""
        import ray.data

        texts = _corpus(seed=29)
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        outs = []
        for nparts in (1, 7):
            df = (
                lm_bigram_scores(ray.data.from_arrow(t).repartition(nparts))
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            outs.append(df)
        assert outs[0].equals(outs[1])
