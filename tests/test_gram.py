"""Quantized Gram matrix (stages/quantize.gram_matrix)."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.quantize import gram_matrix, quantize_matrix


def _ds(mat, nb):
    import ray.data

    t = pa.table({"embedding": pa.array([list(map(float, r)) for r in mat],
                                        pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(nb)


class TestGramMatrix:
    def test_matches_numpy_and_block_invariant(self, ray_session):
        rng = np.random.default_rng(5)
        v = rng.normal(size=(100, 8)).astype(np.float32)
        q, _ = quantize_matrix(np.asarray(v, np.float64))
        ref = q.astype(np.int64).T @ q.astype(np.int64)
        for nb in (1, 9):
            got = gram_matrix(_ds(v, nb), dim=8).to_pandas()
            got = got.sort_values(["i", "j"]).reset_index(drop=True)
            iu, ju = np.triu_indices(8)
            assert got["i"].tolist() == iu.tolist()
            assert got["j"].tolist() == ju.tolist()
            assert (got["s"].to_numpy() == ref[iu, ju]).all()

    def test_zero_row_blocks(self, ray_session):
        # heavy repartition makes some blocks empty; schema must hold
        v = np.eye(4, dtype=np.float32)
        got = gram_matrix(_ds(v, 16), dim=4).to_pandas()
        diag = got[(got.i == got.j)].sort_values("i")
        assert diag["s"].tolist() == [127 ** 2] * 4
