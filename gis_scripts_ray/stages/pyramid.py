"""Tile-pyramid rollup: multi-resolution per-tile aggregates from ONE
corpus pass.

The tiling half of the north rule asks for cell aggregates across a
resolution RANGE (H3 res 5-9 / slippy z levels); the reference's analog
is the stacked coarse->fine tile loops of
``create_dem_tiles_from_array.py:238-258`` (tile grids recomputed per
resolution from the same source array). Recomputing each level from the
corpus would be L full scans; instead this stage exploits the exact
web-Mercator parent identity

    floor(floor(a * 2^z) / 2) == floor(a * 2^(z-1))   (a >= 0)

(same for the y term, and the [0, 2^z-1] clip commutes with the halving:
(2^z - 1) >> 1 == 2^(z-1) - 1), so level z-1 is a pure aggregate of
level z's AGGREGATE — the corpus is read once at z_max and every coarser
level costs O(tiles), not O(docs). Sums/counts are integer-domain and
purely additive, so the rollup is block-structure independent. The SQL
twin recomputes every level DIRECTLY from lon/lat, which value-certifies
the parent identity end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.functions import geo
from gis_scripts_ray.stages.tile_agg import cell_sum_count, coalesce_shuffle_agg


def _with_level(ds: ray.data.Dataset, z: int, cols: "list[str]") -> ray.data.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        zcol = pa.array(np.full(batch.num_rows, z, dtype=np.int64))
        return pa.table(
            {"z": zcol, **{c: batch[c] for c in cols}}
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def tile_pyramid(
    ds: ray.data.Dataset,
    z_max: int,
    z_min: int,
    value_cols: "list[str] | None" = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> ray.data.Dataset:
    """Per-tile integer sums + row counts for every zoom in
    [z_min, z_max]: one ``cell_sum_count`` pass at z_max, then each
    coarser level folds the previous level's aggregate with
    ``tile >> 1`` (in-batch partial + adaptive combine — the level
    tables are tile-bounded, never doc-bounded).

    Returns (z:int64, tile_x:int64, tile_y:int64, sum_<c>..., n:int64),
    one row per non-empty tile per level.
    """
    if z_min > z_max or z_min < 0:
        raise ValueError("need 0 <= z_min <= z_max")
    value_cols = list(value_cols or [])

    def encode(batch: pa.Table) -> pa.Table:
        tx, ty = geo.lonlat_to_tile(
            batch[lon_col].to_numpy(), batch[lat_col].to_numpy(), z_max
        )
        keep = {c: batch[c] for c in value_cols}
        return pa.table(
            {
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
                **keep,
            }
        )

    finest = cell_sum_count(
        ds.map_batches(encode, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        value_cols,
    )
    sum_cols = [f"sum_{c}" for c in value_cols] + ["n"]
    out_cols = ["tile_x", "tile_y"] + sum_cols
    levels = [_with_level(finest, z_max, out_cols)]
    cur = finest
    for z in range(z_max - 1, z_min - 1, -1):

        def halve(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "tile_x": pa.array(
                        batch["tile_x"].to_numpy(zero_copy_only=False) >> 1
                    ),
                    "tile_y": pa.array(
                        batch["tile_y"].to_numpy(zero_copy_only=False) >> 1
                    ),
                    **{c: batch[c] for c in sum_cols},
                }
            )
            out = t.group_by(["tile_x", "tile_y"]).aggregate(
                [(c, "sum") for c in sum_cols]
            )
            return out.rename_columns(["tile_x", "tile_y"] + sum_cols)

        cur = coalesce_shuffle_agg(
            cur.map_batches(halve, batch_format="pyarrow"),
            ["tile_x", "tile_y"],
            {c: "sum" for c in sum_cols},
        )
        levels.append(_with_level(cur, z, out_cols))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
