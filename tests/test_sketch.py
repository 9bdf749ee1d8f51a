"""Mergeable sketches: HLL, Bloom filter, Misra-Gries — kernel parity,
merge laws, guarantees, Ray block-structure invariance."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.sketch import (
    _clz64,
    _hash_column,
    _mg_reduce,
    approx_distinct_column,
    bloom_build,
    bloom_contains,
    exact_distinct_column,
    exact_distinct_tokens,
    approx_distinct_tokens,
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_registers,
    misra_gries_candidates,
)


class TestHllKernel:
    def test_clz_parity(self):
        rng = np.random.default_rng(0)
        xs = np.concatenate(
            [
                rng.integers(0, 2**63, 2000, dtype=np.int64).astype(np.uint64),
                np.array([0, 1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64),
                # near powers of two — the float-log2 failure class
                np.array(
                    [2**k - 1 for k in range(1, 64)] + [2**k for k in range(63)],
                    dtype=np.uint64,
                ),
            ]
        )
        ref = np.array([64 if x == 0 else 64 - int(x).bit_length() for x in xs])
        assert (_clz64(xs) == ref).all()

    def test_registers_match_per_value_reference(self):
        rng = np.random.default_rng(1)
        h = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
        p = 12
        regs = hll_registers(h, p)
        ref = np.zeros(1 << p, dtype=np.uint8)
        for v in h:
            v = int(v)
            idx = v >> (64 - p)
            w = (v << p) & ((1 << 64) - 1)
            rank = (64 - p + 1) if w == 0 else (64 - w.bit_length() + 1)
            ref[idx] = max(ref[idx], rank)
        assert (regs == ref).all()

    def test_merge_equals_whole_and_is_commutative(self):
        rng = np.random.default_rng(2)
        h = rng.integers(0, 2**63, 30_000, dtype=np.int64).astype(np.uint64)
        whole = hll_registers(h)
        a, b, c = hll_registers(h[:9000]), hll_registers(h[9000:21000]), hll_registers(h[21000:])
        assert (hll_merge(hll_merge(a, b), c) == whole).all()
        assert (hll_merge(c, hll_merge(b, a)) == whole).all()

    def test_estimate_accuracy_across_cardinalities(self):
        rng = np.random.default_rng(3)
        for n in (200, 5_000, 100_000, 800_000):
            vals = rng.integers(0, 2**62, n, dtype=np.int64)
            h = _hash_column(pa.array(np.unique(vals)))
            n_true = len(np.unique(vals))
            est = hll_estimate(hll_registers(h))
            assert abs(est - n_true) <= max(0.065 * n_true, 16), (n_true, est)


class TestHllRay:
    def test_block_structure_invariance(self, ray_session):
        import ray.data

        rng = np.random.default_rng(4)
        vals = rng.integers(0, 50_000, 200_000, dtype=np.int64)
        t = pa.table({"v": pa.array(vals)})
        regs = {}
        for nb in (1, 7, 32):
            ds = ray.data.from_arrow(t).repartition(nb)
            est, r = approx_distinct_column(ds, "v")
            regs[nb] = r
        assert (regs[1] == regs[7]).all() and (regs[7] == regs[32]).all()
        n_true = len(np.unique(vals))
        est = hll_estimate(regs[1])
        assert abs(est - n_true) <= 0.065 * n_true
        assert exact_distinct_column(ray.data.from_arrow(t).repartition(7), "v") == n_true

    def test_token_sketch_matches_duckdb_tokenization(self, ray_session):
        import duckdb
        import ray.data

        texts = [
            "a b c",
            "a  b",  # double space -> empty token
            "",  # empty doc -> one empty token
            "x y z a",
            "b c d e f",
        ]
        t = pa.table({"text": pa.array(texts)})
        ds = ray.data.from_arrow(t).repartition(3)
        n_exact = exact_distinct_tokens(ds)
        con = duckdb.connect()
        n_sql = con.execute(
            "SELECT COUNT(DISTINCT t.tok) FROM (SELECT * FROM (VALUES "
            + ", ".join(f"('{s}')" for s in texts)
            + ") v(text)), UNNEST(string_split(text, ' ')) AS t(tok)"
        ).fetchone()[0]
        assert n_exact == n_sql
        est, _ = approx_distinct_tokens(ds)
        assert abs(est - n_exact) <= max(0.065 * n_exact, 16)


class TestBloom:
    def test_no_false_negatives_and_low_fpr(self, ray_session):
        import ray.data

        rng = np.random.default_rng(10)
        members = np.unique(rng.integers(0, 2**40, 3000, dtype=np.int64))
        ds = ray.data.from_arrow(pa.table({"k": pa.array(members)})).repartition(5)
        bits, m_bits, k = bloom_build(ds, "k", len(members))
        # every member must probe True — the semi-join's exactness rests on it
        assert bloom_contains(bits, m_bits, k, pa.array(members)).all()
        # non-members: measured FPR must sit near the design point (~1-2%)
        non = np.unique(rng.integers(2**41, 2**42, 50_000, dtype=np.int64))
        fpr = bloom_contains(bits, m_bits, k, pa.array(non)).mean()
        assert fpr < 0.05, fpr

    def test_block_structure_invariance(self, ray_session):
        import ray.data

        rng = np.random.default_rng(11)
        vals = rng.integers(0, 10_000, 20_000, dtype=np.int64)
        t = pa.table({"k": pa.array(vals)})
        outs = set()
        for nb in (1, 7, 32):
            bits, m_bits, k = bloom_build(
                ray.data.from_arrow(t).repartition(nb), "k", 10_000
            )
            outs.add((bits, m_bits, k))
        assert len(outs) == 1  # OR-fold is block-structure-independent


class TestMisraGries:
    def _ref_counts(self, keys: np.ndarray) -> dict:
        u, c = np.unique(keys, return_counts=True)
        return dict(zip(u.tolist(), c.tolist()))

    def test_reduce_bounds(self):
        rng = np.random.default_rng(12)
        keys = pa.array(np.arange(1000, dtype=np.int64))
        counts = rng.integers(1, 500, 1000).astype(np.int64)
        cap = 64
        k2, c2 = _mg_reduce(keys, counts, cap)
        assert len(k2) <= cap
        ref = dict(zip(keys.to_pylist(), counts.tolist()))
        # every surviving estimate undercounts, never overcounts
        for key, est in zip(k2.to_pylist(), c2.tolist()):
            assert 0 < est <= ref[key]
        # the decrement applied to survivors is one uniform threshold
        decs = {ref[key] - est for key, est in zip(k2.to_pylist(), c2.tolist())}
        assert len(decs) == 1

    def test_candidates_complete_across_block_structures(self, ray_session):
        import ray.data

        rng = np.random.default_rng(13)
        # 10 hot keys (~2% each) over a 5000-key uniform tail
        hot = np.repeat(np.arange(-10, 0, dtype=np.int64), 2000)
        tail = rng.integers(0, 5000, 80_000, dtype=np.int64)
        keys = rng.permutation(np.concatenate([hot, tail]))
        n = len(keys)
        cap = 128
        t = pa.table({"key": pa.array(keys)})
        for nb in (1, 6, 25):
            ds = ray.data.from_arrow(t).repartition(nb)
            cands = misra_gries_candidates(ds, "key", cap)
            assert len(cands) <= cap
            got = set(cands["key"].to_pylist())
            ref = self._ref_counts(keys)
            for key, cnt in ref.items():
                if cnt > n / (cap + 1):  # the mergeable-summaries guarantee
                    assert key in got, (key, cnt, nb)

    def test_heavy_hitters_exact_vs_reference(self, ray_session):
        import ray.data

        rng = np.random.default_rng(14)
        hot = np.repeat(np.arange(3, dtype=np.int64) + 10_000, 1500)
        tail = rng.integers(0, 3000, 50_000, dtype=np.int64)
        keys = rng.permutation(np.concatenate([hot, tail]))
        n = len(keys)
        phi = 0.02
        ref = {
            k: c for k, c in self._ref_counts(keys).items() if c > phi * n
        }
        ds = ray.data.from_arrow(pa.table({"key": pa.array(keys)})).repartition(9)
        out = heavy_hitters(ds, "key", phi).to_pandas()
        got = dict(zip(out["key"].tolist(), out["n_exact"].tolist()))
        assert got == ref  # exact keys AND exact counts


class TestBloomSemiJoin:
    def test_equals_plain_join(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.joins import bloom_semi_join, hash_join

        rng = np.random.default_rng(15)
        lk = rng.integers(0, 5000, 30_000, dtype=np.int64)
        left = pa.table(
            {"k": pa.array(lk), "v": pa.array(rng.integers(0, 100, len(lk)))}
        )
        rk = np.unique(rng.integers(0, 5000, 400, dtype=np.int64))
        right = pa.table(
            {"rk": pa.array(rk), "w": pa.array(np.arange(len(rk), dtype=np.int64))}
        )
        lds = ray.data.from_arrow(left).repartition(8)
        rds = ray.data.from_arrow(right).repartition(3)
        a = (
            bloom_semi_join(lds, rds, on="k", right_on="rk", num_partitions=4)
            .to_pandas()
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        b = (
            hash_join(lds, rds, on="k", right_on="rk", num_partitions=4)
            .to_pandas()
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])
        assert len(a) > 0

    def test_empty_right(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.joins import bloom_semi_join

        left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        right = pa.table({"rk": pa.array([], pa.int64())})
        out = bloom_semi_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            right_on="rk",
        )
        assert out.count() == 0
