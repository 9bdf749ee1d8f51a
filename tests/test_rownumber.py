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


def _run_multi(t: pa.Table, keys, nb):
    import ray.data

    from gis_scripts_ray.stages.rownumber import zip_with_index_multi

    out = zip_with_index_multi(ray.data.from_arrow(t).repartition(nb), keys)
    return out.to_pandas().sort_values("id").reset_index(drop=True)["rn"].to_numpy()


class TestZipWithIndexMulti:
    def test_matches_lexsort_and_block_invariant(self, ray_session):
        rng = np.random.default_rng(23)
        n = 3000
        g = rng.choice(["A", "N", "R"], n)
        v = rng.integers(0, 50, n)  # heavy ties: the trailing pk breaks them
        t = pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "g": pa.array(g, pa.string()),
                "v": pa.array(v, pa.int64()),
            }
        )
        # pandas lexicographic oracle over (g, v, id)
        import pandas as pd

        want = np.empty(n, dtype=np.int64)
        order = pd.DataFrame({"g": g, "v": v, "id": np.arange(n)}).sort_values(
            ["g", "v", "id"]
        )["id"].to_numpy()
        want[order] = np.arange(1, n + 1)
        for nb in (1, 17):
            assert (_run_multi(t, ["g", "v", "id"], nb) == want).all()

    def test_single_key_agrees_with_zip_with_index(self, ray_session):
        import ray.data

        rng = np.random.default_rng(5)
        keys = rng.permutation(np.arange(800, dtype=np.uint64) * 31)
        t = pa.table(
            {
                "id": pa.array(np.arange(len(keys), dtype=np.int64)),
                "k": pa.array(keys, pa.uint64()),
            }
        )
        a = _run_multi(t, ["k"], 7)
        b = _run(keys, 7)
        assert (a == b).all()
