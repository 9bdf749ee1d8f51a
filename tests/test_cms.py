"""Count-Min sketch: md5-word cross-engine parity, merge/block-structure
invariance, the overestimate guarantee, and probe determinism."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.sketch import (
    _CMS_D,
    _block_token_counts,
    _cms_words,
    cms_counters,
    cms_probe_counts,
)

HOSTILE_TOKENS = [
    "",
    "a",
    "hello",
    "café",
    "日本語",
    "a" * 200,
    "0",
    "-1",
    "\t",
    "naïve",
    "x́",  # combining accent
    "\U0001f600",  # astral plane
]


class TestCmsWords:
    def test_duckdb_md5_word_parity(self):
        """Each of the 4 uint32 words must equal DuckDB's hex-substr
        parse of md5(w) — the twin rebuilds the sketch from these."""
        import duckdb

        words = _cms_words(HOSTILE_TOKENS)
        con = duckdb.connect()
        for i, t in enumerate(HOSTILE_TOKENS):
            for r in range(_CMS_D):
                (got,) = con.execute(
                    f"SELECT ('0x'||substr(md5(?),{1 + 8 * r},8))::UBIGINT",
                    [t],
                ).fetchone()
                assert int(words[i, r]) == got, (t, r)
        con.close()

    def test_probe_prefix_is_first_two_words(self):
        import hashlib

        words = _cms_words(HOSTILE_TOKENS)
        h64 = (words[:, 0] << np.uint64(32)) | words[:, 1]
        for i, t in enumerate(HOSTILE_TOKENS):
            ref = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            assert int(h64[i]) == ref


class TestCmsRay:
    def _docs_table(self, n=400, seed=7):
        rng = np.random.default_rng(seed)
        vocab = [f"tok{i}" for i in range(60)] + ["café", "", "x y".replace(" ", "_")]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
            for _ in range(n)
        ]
        return pa.table({"text": pa.array(texts, pa.string())})

    def test_block_structure_invariance_and_guarantee(self, ray_session):
        import ray.data

        t = self._docs_table()
        regs = {}
        for nb in (1, 5, 17):
            ds = ray.data.from_arrow(t).repartition(nb)
            rows = cms_counters(ds, "text", width=256).take_all()
            dense = np.zeros((_CMS_D, 256), dtype=np.int64)
            for r in rows:
                dense[r["row"], r["bucket"]] = r["c"]
            regs[nb] = dense
        assert (regs[1] == regs[5]).all() and (regs[5] == regs[17]).all()

        # every register row must sum to the total token count
        toks, cnts = _block_token_counts(t, "text")
        total = int(cnts.sum())
        assert (regs[1].sum(axis=1) == total).all()

        # point-query overestimate guarantee: est >= true for EVERY token
        words = _cms_words(toks)
        for r in range(_CMS_D):
            buck = (words[:, r] % np.uint64(256)).astype(np.int64)
            assert (regs[1][r][buck] >= cnts).all()

    def test_probe_counts_exact_and_deterministic(self, ray_session):
        import hashlib

        import ray.data

        t = self._docs_table(n=600, seed=11)
        out = {}
        for nb in (1, 9):
            ds = ray.data.from_arrow(t).repartition(nb)
            rows = cms_probe_counts(ds, "text", probe_mod=3).take_all()
            out[nb] = {r["token"]: r["n_true"] for r in rows}
        assert out[1] == out[9]

        # brute-force truth
        toks, cnts = _block_token_counts(t, "text")
        truth = {}
        for tok, c in zip(toks, cnts):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            if h % 3 == 0:
                truth[tok] = truth.get(tok, 0) + int(c)
        assert out[1] == truth
