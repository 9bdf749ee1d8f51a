"""Tile-pyramid rollup (stages/pyramid.py): the multi-level aggregate
must equal per-level direct computation from lon/lat — including at the
Mercator clip boundary and the antimeridian — and be block-structure
independent."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gis_scripts_ray.functions import geo
from gis_scripts_ray.stages.pyramid import tile_pyramid

Z_MAX, Z_MIN = 7, 4


def _mk_points(n=400, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-88.0, 88.0, n)  # beyond the Mercator clip at ±85.05
    lon = rng.uniform(-180.0, 180.0, n)
    # hostile rows: poles, clip boundary, antimeridian, origin
    lat[:8] = [90.0, -90.0, 85.05112878, -85.05112878, 0.0, 89.9, -89.9, 45.0]
    lon[:8] = [180.0, -180.0, 179.999999, -179.999999, 0.0, 180.0, -180.0, 0.0]
    v = rng.integers(1, 1000, n)
    return pa.table(
        {
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "val": pa.array(v, pa.int64()),
        }
    )


def _direct(t: pa.Table, z: int) -> dict:
    """Reference: aggregate level z directly from lon/lat."""
    tx, ty = geo.lonlat_to_tile(t["lon"].to_numpy(), t["lat"].to_numpy(), z)
    out: dict = {}
    for x, y, v in zip(tx, ty, t["val"].to_numpy()):
        s, n = out.get((x, y), (0, 0))
        out[(x, y)] = (s + int(v), n + 1)
    return out


def _got(t: pa.Table, nparts: int) -> dict:
    ds = ray.data.from_arrow(t).repartition(nparts)
    df = tile_pyramid(ds, Z_MAX, Z_MIN, value_cols=["val"]).to_pandas()
    return {
        (int(r.z), int(r.tile_x), int(r.tile_y)): (int(r.sum_val), int(r.n))
        for r in df.itertuples()
    }


class TestTilePyramid:
    def test_rollup_equals_direct_every_level(self, ray_session):
        t = _mk_points()
        got = _got(t, 3)
        for z in range(Z_MIN, Z_MAX + 1):
            want = _direct(t, z)
            lvl = {k[1:]: v for k, v in got.items() if k[0] == z}
            assert lvl == want, f"level {z}"

    def test_block_structure_invariant(self, ray_session):
        t = _mk_points(seed=12)
        assert _got(t, 1) == _got(t, 7)

    def test_single_level(self, ray_session):
        t = _mk_points(n=50, seed=13)
        ds = ray.data.from_arrow(t)
        df = tile_pyramid(ds, 5, 5, value_cols=["val"]).to_pandas()
        assert set(df["z"]) == {5}
        assert int(df["n"].sum()) == 50

    def test_count_only_no_value_cols(self, ray_session):
        t = _mk_points(n=60, seed=14)
        df = tile_pyramid(ray.data.from_arrow(t), 6, 5).to_pandas()
        assert list(df.columns) == ["z", "tile_x", "tile_y", "n"]
        for z in (5, 6):
            assert int(df[df["z"] == z]["n"].sum()) == 60

    def test_level_totals_conserved(self, ray_session):
        """Every level partitions the corpus: sums and counts are equal
        across levels (no row lost or duplicated by the rollup)."""
        t = _mk_points(seed=15)
        got = _got(t, 4)
        totals = {}
        for (z, _, _), (s, n) in got.items():
            ts, tn = totals.get(z, (0, 0))
            totals[z] = (ts + s, tn + n)
        assert len(set(totals.values())) == 1

    def test_bad_range_rejected(self):
        with pytest.raises(ValueError):
            tile_pyramid(None, 3, 5)
