"""Cell-prefix partitioned geo store + file-pruned AOI clip
(stages/spatial_store.py — the M8 storage-pushdown path; reference
windowed-read analog Clip_Rasters_By_Extent.py:17-36)."""
import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from gis_scripts_ray.functions.geo import lonlat_to_tile
from gis_scripts_ray.stages.spatial_store import (
    bbox_row_filter,
    partition_paths_for_bbox,
    read_clip_pushdown,
    tile_part_keys,
    tiles_for_bbox,
    write_geo_partitioned,
)

Z = 3


def _mk_points(n=400, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    # off-lattice spread incl. high-lat + near-antimeridian points
    lon = np.round(rng.uniform(-179.9, 179.9, n), 4)
    lat = np.round(rng.uniform(-84.9, 84.9, n), 4)
    return pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
        }
    )


def _store(tmp_path, table) -> str:
    out = str(tmp_path / "geostore")
    write_geo_partitioned(ray.data.from_arrow(table), out, z=Z)
    return out


def _frame(ds) -> pd.DataFrame:
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return df.sort_values("pid").reset_index(drop=True)


class TestSpatialStore:
    def test_tiles_for_bbox_covers_every_point_tile(self):
        t = _mk_points()
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        bb = (-40.0005, -10.0005, 60.0005, 50.0005)
        keys = set(tiles_for_bbox(Z, *bb))
        inside = (
            (lon >= bb[0]) & (lon <= bb[2]) & (lat >= bb[1]) & (lat <= bb[3])
        )
        x, y = lonlat_to_tile(lon[inside], lat[inside], Z)
        for xi, yi in zip(x, y):
            assert f"z{Z}_{xi}_{yi}" in keys

    def test_pruned_fileset_strict_subset_and_equal_rows(
        self, tmp_path, ray_session
    ):
        t = _mk_points()
        out = _store(tmp_path, t)
        all_files = sorted(glob.glob(os.path.join(out, "part=*", "data.parquet")))
        bb = (-40.0005, -10.0005, 60.0005, 50.0005)
        pruned = sorted(partition_paths_for_bbox(out, Z, *bb))
        assert set(pruned) < set(all_files)  # strict subset
        assert pruned  # and non-empty
        got = _frame(read_clip_pushdown(out, Z, *bb))
        # oracle: full-scan + same exact filter
        ref = _frame(bbox_row_filter(*bb)(t).to_pandas())
        pd.testing.assert_frame_equal(got[ref.columns], ref)
        assert len(ref) > 0

    def test_antimeridian_wrap(self, tmp_path, ray_session):
        t = _mk_points()
        out = _store(tmp_path, t)
        bb = (170.0005, -30.0005, -170.0005, 30.0005)  # lon wraps
        got = _frame(read_clip_pushdown(out, Z, *bb))
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        inside = ((lon >= bb[0]) | (lon <= bb[2])) & (
            (lat >= bb[1]) & (lat <= bb[3])
        )
        ref = _frame(t.filter(pa.array(inside)).to_pandas())
        pd.testing.assert_frame_equal(got[ref.columns], ref)
        # wrap cover = the two edge columns only, never the middle
        keys = tiles_for_bbox(Z, *bb)
        xs = {int(k.split("_")[1]) for k in keys}
        assert xs <= {0, (1 << Z) - 1}

    def test_empty_aoi_returns_schema_preserving_zero_rows(
        self, tmp_path, ray_session
    ):
        # cluster every point into one quadrant so an opposite-quadrant
        # AOI prunes to zero files
        t = _mk_points()
        lon = pa.array(np.abs(t["lon"].to_numpy()) / 2 + 10, pa.float64())
        lat = pa.array(np.abs(t["lat"].to_numpy()) / 2 + 5, pa.float64())
        t = t.set_column(2, "lon", lon).set_column(1, "lat", lat)
        out = _store(tmp_path, t)
        bb = (-120.0005, -60.0005, -100.0005, -40.0005)
        assert partition_paths_for_bbox(out, Z, *bb) == []
        ds = read_clip_pushdown(out, Z, *bb)
        assert ds.count() == 0
        assert set(ds.schema().names) == {"pid", "lat", "lon"}

    def test_rebuild_is_resume_noop(self, tmp_path, ray_session):
        t = _mk_points(n=64)
        out = _store(tmp_path, t)
        first = sorted(glob.glob(os.path.join(out, "part=*")))
        mtimes = {p: os.stat(os.path.join(p, "data.parquet")).st_mtime_ns
                  for p in first}
        recs = write_geo_partitioned(ray.data.from_arrow(t), out, z=Z)
        assert recs == []  # every row dropped before the shuffle
        for p in first:  # no partition rewritten
            assert os.stat(os.path.join(p, "data.parquet")).st_mtime_ns == mtimes[p]

    def test_part_keys_match_tile_kernel(self):
        t = _mk_points(n=128, seed=11)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        keys = tile_part_keys(lon, lat, Z).to_pylist()
        x, y = lonlat_to_tile(lon, lat, Z)
        assert keys == [f"z{Z}_{a}_{b}" for a, b in zip(x, y)]

    def test_clip_pushdown_query_matches_full_scan(self, ray_session):
        """The registered query's pushdown plan returns the same tile
        counts as an unpruned scan of the same located table."""
        from gis_scripts_ray.queries import (
            _CLIP_AOI,
            _geo_store_dir,
            q_clip_pushdown,
            encode_cells,
            located_documents,
        )
        from gis_scripts_ray.stages.encode import EncodeConfig
        from gis_scripts_ray.stages.tile_agg import cell_count
        from gis_scripts_ray.queries import TILE_Z

        sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
        shutil.rmtree(_geo_store_dir(sf), ignore_errors=True)
        got = (
            q_clip_pushdown(sf)
            .to_pandas()
            .sort_values(["tile_x", "tile_y"])
            .reset_index(drop=True)
        )
        full = located_documents(sf).map_batches(
            bbox_row_filter(*_CLIP_AOI), batch_format="pyarrow"
        )
        ref = (
            cell_count(
                encode_cells(full, EncodeConfig(tile_z=TILE_Z)),
                ["tile_x", "tile_y"],
                alias="n_docs",
            )
            .to_pandas()
            .sort_values(["tile_x", "tile_y"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)
        assert got["n_docs"].sum() > 0
        # and the warm-store second run (resume path) agrees
        again = (
            q_clip_pushdown(sf)
            .to_pandas()
            .sort_values(["tile_x", "tile_y"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(again, got)
