"""Cell-prefix partitioned geo storage + file-pruned AOI clip reads.

The reference clips rasters to an extent by WINDOWED reads — only the
intersecting part of the file is ever read (Clip_Rasters_By_Extent.py:17-36,
seagrass_lib.py:283-307 windowed GDAL ReadAsArray). The engine analog at
100 TB: the located web-pages table is written PARTITIONED BY COARSE
WEB-MERCATOR TILE (one directory per tile, atomic resumable manifest — the
``write_partitioned_resumable`` sink), and an AOI clip computes the tile
range covering its bbox and reads ONLY those partitions' parquet files,
then applies the exact row filter. Storage never ships non-intersecting
rows — the same partition-pruning contract the persisted ANN index proves
for buckets (``similarity.partition_paths_for_buckets``).

Scale notes: the store build is a one-time job (resume skips completed
tiles); probes are pure pruned reads. Partition count at zoom ``z`` is at
most ``4**z`` (z=3 → ≤64, z=6 → ≤4096); pick ``z`` so one tile's data is
a few blocks. Tile-range cover is exact (a superset row-wise) because
``lonlat_to_tile``'s x is monotone in lon and y is anti-monotone in lat —
corner tiles bound every interior point's tile.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.functions.geo import lonlat_to_tile

# bump when the partition layout or key scheme changes: readers key cache
# dirs on this so a stale /tmp store from older code is never reused
GEO_STORE_VERSION = 1


def tile_part_keys(
    lon: np.ndarray, lat: np.ndarray, z: int
) -> pa.Array:
    """Partition key per row: ``"z{z}_{x}_{y}"`` at zoom ``z`` — the SAME
    ``lonlat_to_tile`` kernel the query-side cell encoder uses, so the
    store's pruning grid and the engine's tile semantics can never drift."""
    x, y = lonlat_to_tile(lon, lat, z)
    # vectorized string build (no per-row Python in the write hot path)
    pre = np.char.add(f"z{z}_", x.astype("U11"))
    return pa.array(
        np.char.add(np.char.add(pre, "_"), y.astype("U11")), pa.string()
    )


def write_geo_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    z: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
    lineage: str = "geo-store",
):
    """Write a located dataset partitioned by coarse tile via the resumable
    checkpoint sink — crash-safe, idempotent; a re-run drops rows of
    completed partitions before the shuffle (resume fast path)."""
    from gis_scripts_ray.state.checkpoint import write_partitioned_resumable

    def part_fn(batch: pa.Table) -> pa.Array:
        return tile_part_keys(
            batch[lon_col].to_numpy(), batch[lat_col].to_numpy(), z
        )

    return write_partitioned_resumable(ds, out_dir, part_fn, lineage=lineage)


def tiles_for_bbox(
    z: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
) -> list[str]:
    """The partition keys whose tile can contain a point of the bbox —
    computed from the bbox CORNERS through the same tile kernel (floor
    conventions cannot diverge). ``lon_min > lon_max`` means the bbox
    crosses the antimeridian and is covered as two lon ranges."""
    if lon_min > lon_max:
        return sorted(
            set(tiles_for_bbox(z, lon_min, lat_min, 180.0, lat_max))
            | set(tiles_for_bbox(z, -180.0, lat_min, lon_max, lat_max))
        )
    c_lon = np.array([lon_min, lon_max])
    c_lat = np.array([lat_max, lat_min])  # y grows southward
    x, y = lonlat_to_tile(c_lon, c_lat, z)
    return [
        f"z{z}_{xi}_{yi}"
        for xi in range(int(x[0]), int(x[1]) + 1)
        for yi in range(int(y[0]), int(y[1]) + 1)
    ]


def partition_paths_for_bbox(
    out_dir: str,
    z: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
) -> list[str]:
    """The parquet files an AOI clip must read: candidate tiles ∩ COMPLETED
    partitions (factored out so tests can assert the pruned file set)."""
    from gis_scripts_ray.state.checkpoint import Manifest

    man = Manifest(out_dir)
    done = man.completed()
    want = set(tiles_for_bbox(z, lon_min, lat_min, lon_max, lat_max))
    return [
        os.path.join(man.partition_dir(k), "data.parquet")
        for k in sorted(done)
        if k in want
    ]


def bbox_row_filter(
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """Exact inclusive-BETWEEN row filter (matches SQL ``BETWEEN`` on the
    same doubles bit-for-bit). Antimeridian wrap: ``lon >= min OR <= max``."""
    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        lat, lon = batch[lat_col], batch[lon_col]
        in_lat = pc.and_(
            pc.greater_equal(lat, lat_min), pc.less_equal(lat, lat_max)
        )
        if lon_min > lon_max:
            in_lon = pc.or_(
                pc.greater_equal(lon, lon_min), pc.less_equal(lon, lon_max)
            )
        else:
            in_lon = pc.and_(
                pc.greater_equal(lon, lon_min), pc.less_equal(lon, lon_max)
            )
        return batch.filter(pc.and_(in_lat, in_lon))

    return filt


def read_clip_pushdown(
    out_dir: str,
    z: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """AOI clip over a partitioned geo store: the READ is pruned to the
    bbox's tile partitions, then the exact row filter refines — identical
    rows to a full-table scan + filter (tested), reading only the
    intersecting fraction of storage."""
    paths = partition_paths_for_bbox(
        out_dir, z, lon_min, lat_min, lon_max, lat_max
    )
    if not paths:
        # AOI intersects no completed partition (ocean probe): an empty
        # dataset with the store's schema, derived driver-side from any
        # one partition's parquet footer (no data rows read)
        from gis_scripts_ray.state.checkpoint import Manifest

        import pyarrow.parquet as pq

        man = Manifest(out_dir)
        done = sorted(man.completed())
        if not done:
            raise ValueError(f"geo store {out_dir!r} has no completed partitions")
        schema = pq.read_schema(
            os.path.join(man.partition_dir(done[0]), "data.parquet")
        )
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    ds = ray.data.read_parquet(paths, columns=columns)
    return ds.map_batches(
        bbox_row_filter(lon_min, lat_min, lon_max, lat_max),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
