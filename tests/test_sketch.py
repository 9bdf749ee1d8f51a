"""HyperLogLog sketch: kernel parity, merge laws, accuracy, Ray invariance."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.sketch import (
    _clz64,
    _hash_column,
    approx_distinct_column,
    exact_distinct_column,
    exact_distinct_tokens,
    approx_distinct_tokens,
    hll_estimate,
    hll_merge,
    hll_registers,
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
