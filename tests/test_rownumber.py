"""Global row numbering (stages/rownumber.zip_with_index)."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.rownumber import zip_with_index


def _run(keys, nb, **kw):
    import ray.data

    t = pa.table({"id": pa.array(np.arange(len(keys), dtype=np.int64)),
                  "k": pa.array(keys, pa.uint64())})
    out = zip_with_index(ray.data.from_arrow(t).repartition(nb), "k", **kw)
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    return df["rn"].to_numpy()


class TestZipWithIndex:
    def test_matches_argsort_and_block_invariant(self, ray_session):
        rng = np.random.default_rng(17)
        keys = rng.permutation(np.arange(4000, dtype=np.uint64) * 7919)
        want = np.empty(len(keys), dtype=np.int64)
        want[np.argsort(keys)] = np.arange(1, len(keys) + 1)
        for nb in (1, 13):
            assert (_run(keys, nb) == want).all()

    def test_start_offset(self, ray_session):
        keys = np.array([30, 10, 20], dtype=np.uint64)
        assert _run(keys, 2, start=100).tolist() == [102, 100, 101]

    def test_full_uint64_range(self, ray_session):
        # keys above 2^63 (the signed boundary) must still order correctly
        keys = np.array([2**63 + 5, 3, 2**64 - 1, 2**63 - 1], dtype=np.uint64)
        assert _run(keys, 2).tolist() == [3, 1, 4, 2]
