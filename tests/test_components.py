"""Distributed connected components vs the single-process oracle.

Verifies the M3 boundary-merge round (VERDICT r1 item 3): segments
spanning multiple x-stripes must receive one global label, matching
``replace_band_consistant_values_with_value.py:63-121`` semantics
including the min-size threshold path.
"""
import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.functions.gridops import connected_components
from gis_scripts_ray.stages.components import distributed_components


def _partition_sets(x, y, labels):
    """Canonical comparison form: set of frozensets of cells."""
    comp = {}
    for cx, cy, l in zip(x, y, labels):
        comp.setdefault(l, set()).add((int(cx), int(cy)))
    return {frozenset(s) for s in comp.values()}


def _run(x, y, connectivity, part_width, v=None, ray_ds=None):
    import ray

    cols = {
        "tile_x": pa.array(np.asarray(x, dtype=np.int64), pa.int64()),
        "tile_y": pa.array(np.asarray(y, dtype=np.int64), pa.int64()),
    }
    if v is not None:
        cols["value"] = pa.array(np.asarray(v, dtype=np.int64), pa.int64())
    ds = ray.data.from_arrow(pa.table(cols)).repartition(3)
    out = distributed_components(
        ds,
        connectivity=connectivity,
        part_width=part_width,
        value_col="value" if v is not None else None,
    ).to_pandas()
    return out


class TestLocalLabelParity:
    """Vectorized in-stripe labeling vs the per-row Python union-find
    oracle (verdict r2 #6) — identical ARRAYS, not just equal partitions
    (both canonicalize to dense ranks over component min row index)."""

    @pytest.mark.parametrize("connectivity", [4, 8])
    @pytest.mark.parametrize("with_values", [False, True])
    def test_random_grids_bit_equal(self, connectivity, with_values):
        from gis_scripts_ray.stages.components import (
            _label_local_values,
            _label_local_values_py,
        )

        rng = np.random.default_rng(13)
        for density, size in ((0.7, 25), (0.2, 40), (1.0, 12)):
            pts = {
                (int(a), int(b))
                for a, b in rng.integers(0, size, (int(density * size * size), 2))
            }
            x = np.array([p[0] for p in sorted(pts)], dtype=np.int64)
            y = np.array([p[1] for p in sorted(pts)], dtype=np.int64)
            v = rng.integers(0, 3, len(x)).astype(np.int64) if with_values else None
            got = _label_local_values(x, y, v, connectivity)
            want = _label_local_values_py(x, y, v, connectivity)
            assert (got == want).all()

    def test_empty_and_singleton(self):
        from gis_scripts_ray.stages.components import _label_local_values

        e = np.array([], dtype=np.int64)
        assert len(_label_local_values(e, e, None, 8)) == 0
        one = np.array([5], dtype=np.int64)
        assert _label_local_values(one, one, None, 4).tolist() == [0]


class TestDistributedComponents:
    @pytest.mark.parametrize("connectivity", [4, 8])
    @pytest.mark.parametrize("part_width", [1, 3, 64])
    def test_random_matches_global_oracle(self, ray_session, connectivity, part_width):
        rng = np.random.default_rng(42)
        pts = {(int(a), int(b)) for a, b in rng.integers(0, 18, (120, 2))}
        x = np.array([p[0] for p in sorted(pts)])
        y = np.array([p[1] for p in sorted(pts)])
        out = _run(x, y, connectivity, part_width)
        want = connected_components(x, y, connectivity=connectivity)
        assert _partition_sets(out.tile_x, out.tile_y, out.component) == (
            _partition_sets(x, y, want)
        )

    def test_snake_spans_many_partitions(self, ray_session):
        # one horizontal snake across x=0..29 with part_width=4 (8 stripes),
        # plus an isolated cell — must yield exactly 2 components
        x = np.arange(30)
        y = np.where(x % 2 == 0, 0, 1)  # zigzag, 8-connected only
        x = np.append(x, 100)
        y = np.append(y, 100)
        out = _run(x, y, 8, 4)
        sets = _partition_sets(out.tile_x, out.tile_y, out.component)
        assert len(sets) == 2
        # canonical label = min packed cell of the snake
        snake = out[out.tile_x < 100]
        assert (snake.component == (0 << 32) | 0).all()
        # 4-connectivity breaks the zigzag into 30 singletons + 1
        out4 = _run(x, y, 4, 4)
        assert len(_partition_sets(out4.tile_x, out4.tile_y, out4.component)) == 31

    def test_partition_count_invariance(self, ray_session):
        rng = np.random.default_rng(7)
        pts = {(int(a), int(b)) for a, b in rng.integers(0, 40, (200, 2))}
        x = np.array([p[0] for p in sorted(pts)])
        y = np.array([p[1] for p in sorted(pts)])
        outs = [
            _run(x, y, 8, pw).sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
            for pw in (2, 5, 1000)
        ]
        for o in outs[1:]:
            assert (o.component.to_numpy() == outs[0].component.to_numpy()).all()

    def test_equal_value_connectivity(self, ray_session):
        # two touching runs of different value must NOT merge
        x = np.arange(10)
        y = np.zeros(10, dtype=np.int64)
        v = np.where(x < 5, 1, 2)
        out = _run(x, y, 8, 3, v=v)
        sets = _partition_sets(out.tile_x, out.tile_y, out.component)
        assert sets == {
            frozenset({(i, 0) for i in range(5)}),
            frozenset({(i, 0) for i in range(5, 10)}),
        }

    def test_min_size_threshold(self, ray_session):
        # reference semantics: components smaller than min_size are the
        # replace set; derive them from component sizes
        x = np.array([0, 1, 2, 10, 20, 21])
        y = np.zeros(6, dtype=np.int64)
        out = _run(x, y, 8, 4)
        sizes = out.groupby("component").size()
        small = set(sizes[sizes < 3].index)
        small_cells = set(
            map(tuple, out[out.component.isin(small)][["tile_x", "tile_y"]].to_numpy())
        )
        assert small_cells == {(10, 0), (20, 0), (21, 0)}
