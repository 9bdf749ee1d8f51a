"""Unpivot / melt (stages/melt.py) vs the pandas melt oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.melt import melt


def _fixture(n=500, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.choice(["x", "y"], n), pa.string()),
            "a": pa.array(rng.integers(-100, 100, n), pa.int64()),
            "b": pa.array(rng.integers(0, 10, n), pa.int64()),
            "c": pa.array(rng.integers(-5, 5, n), pa.int64()),
        }
    )


def _run(t, nb):
    import ray.data

    out = melt(
        ray.data.from_arrow(t).repartition(nb),
        id_cols=["id", "g"],
        value_cols=["a", "b", "c"],
    )
    return (
        out.to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)[["id", "g", "metric", "value"]]
    )


class TestMelt:
    def test_matches_pandas_melt_and_block_invariant(self, ray_session):
        t = _fixture()
        want = (
            t.to_pandas()
            .melt(id_vars=["id", "g"], value_vars=["a", "b", "c"],
                  var_name="metric", value_name="value")
            .sort_values(["id", "metric"])
            .reset_index(drop=True)[["id", "g", "metric", "value"]]
        )
        for nb in (1, 9):
            got = _run(t, nb)
            pd.testing.assert_frame_equal(got, want)

    def test_empty_blocks(self, ray_session):
        import ray.data

        t = _fixture(n=3)
        out = melt(
            ray.data.from_arrow(t).repartition(8),
            id_cols=["id", "g"],
            value_cols=["a", "b", "c"],
        )
        assert out.count() == 9
