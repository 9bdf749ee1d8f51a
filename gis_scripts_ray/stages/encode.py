"""Cell-encoding stages: append hex / S2 / slippy-tile keys to batches.

The engine's analog of the reference's world->pixel/grid-snap arithmetic
(``local_match.py:344-345`` tile index by floor of world coords;
``create_dem_tiles_from_array.py:250-258`` ``-tap`` snapping): every row is
assigned its canonical cell keys ONCE, early in the pipeline, and all wide
operations key on them. Stateless, zero-copy Arrow in/out.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.functions import geo


@dataclass(frozen=True)
class EncodeConfig:
    hex_res: int = 7
    s2_level: int = 12
    tile_z: int = 6
    lat_col: str = "lat"
    lon_col: str = "lon"


def make_cell_encoder(cfg: EncodeConfig):
    """Returns a ``map_batches`` fn appending hex_cell/s2_cell/tile_x/tile_y."""

    def encode(batch: pa.Table) -> pa.Table:
        lat = batch[cfg.lat_col].to_numpy()
        lon = batch[cfg.lon_col].to_numpy()
        hex_cell = geo.lonlat_to_hex_cell(lon, lat, cfg.hex_res)
        s2_cell = geo.lonlat_to_s2_cell(lon, lat, cfg.s2_level)
        tx, ty = geo.lonlat_to_tile(lon, lat, cfg.tile_z)
        return (
            batch.append_column("hex_cell", pa.array(hex_cell, pa.int64()))
            .append_column("s2_cell", pa.array(s2_cell, pa.uint64()))
            .append_column("tile_x", pa.array(tx, pa.int64()))
            .append_column("tile_y", pa.array(ty, pa.int64()))
        )

    return encode


def encode_cells(ds: ray.data.Dataset, cfg: EncodeConfig | None = None) -> ray.data.Dataset:
    cfg = cfg or EncodeConfig()
    return ds.map_batches(
        make_cell_encoder(cfg), batch_format="pyarrow", zero_copy_batch=True
    )


def derive_lonlat_from_doc_id(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Arithmetic lat/lon derivation for driver tables that lack urls.

    Mirrors the SQL oracle expression exactly:
    ``lat = (doc_id*7919 % 17000)/100 - 85``;
    ``lon = (doc_id*104729 % 36000)/100 - 180``.
    """
    doc_id = batch[id_col].to_numpy()
    lat = ((doc_id * 7919) % 17000) / 100.0 - 85.0
    lon = ((doc_id * 104729) % 36000) / 100.0 - 180.0
    return batch.append_column("lat", pa.array(lat, pa.float64())).append_column(
        "lon", pa.array(lon, pa.float64())
    )
