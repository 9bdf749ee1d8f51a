"""ENVI raster sink/source (S8) — pure numpy, no GDAL.

The reference writes clipped rasters as ENVI .dat via GDAL
(``raster/clip_raster.py:38-40``, ``format='ENVI'``). The format itself
is trivial — a flat binary cube plus an ASCII ``.hdr`` — so the engine
writes it directly: a (lines, samples[, bands]) array in band-sequential
(BSQ) interleave with the standard header keys, including ``map info``
for the geographic transform. Round-trip tested; readable by GDAL/ENVI.

The Ray-side integration is :func:`grid_to_envi`: a sparse per-tile
aggregate (the engine's native raster form) densifies into the cube and
writes one deterministic artifact per call — the vector->raster sink
counterpart of the parquet checkpoints.
"""

from __future__ import annotations

import os

import numpy as np

_DTYPE_CODES = {
    np.dtype(np.uint8): 1,
    np.dtype(np.int16): 2,
    np.dtype(np.int32): 3,
    np.dtype(np.float32): 4,
    np.dtype(np.float64): 5,
    np.dtype(np.uint16): 12,
    np.dtype(np.uint32): 13,
    np.dtype(np.int64): 14,
    np.dtype(np.uint64): 15,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def write_envi(
    arr: np.ndarray,
    path: str,
    map_info: tuple[float, float, float, float] | None = None,
    description: str = "gis_scripts_ray ENVI sink",
) -> tuple[str, str]:
    """Write ``arr`` ((lines, samples) or (bands, lines, samples)) as
    ENVI BSQ ``path``(.dat) + ``path.hdr``. ``map_info`` =
    (ul_lon, ul_lat, xres, yres) for a geographic grid. Atomic (tmp +
    rename), little-endian. Returns (data_path, hdr_path)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    if arr.ndim != 3:
        raise ValueError("ENVI sink expects (lines, samples) or (bands, lines, samples)")
    if arr.dtype not in _DTYPE_CODES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    bands, lines, samples = arr.shape
    hdr_lines = [
        "ENVI",
        f"description = {{{description}}}",
        f"samples = {samples}",
        f"lines = {lines}",
        f"bands = {bands}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {_DTYPE_CODES[arr.dtype]}",
        "interleave = bsq",
        "byte order = 0",
    ]
    if map_info is not None:
        ul_lon, ul_lat, xres, yres = map_info
        hdr_lines.append(
            "map info = {Geographic Lat/Lon, 1, 1, "
            f"{ul_lon!r}, {ul_lat!r}, {xres!r}, {yres!r}, WGS-84}}"
        )
    data = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(np.ascontiguousarray(data).tobytes())
    os.replace(tmp, path)
    hdr = path + ".hdr"
    with open(hdr + ".tmp", "w") as fh:
        fh.write("\n".join(hdr_lines) + "\n")
    os.replace(hdr + ".tmp", hdr)
    return path, hdr


def read_envi(path: str) -> tuple[np.ndarray, dict]:
    """Read an ENVI BSQ file back as ((bands, lines, samples), header)."""
    hdr_path = path + ".hdr"
    meta: dict = {}
    with open(hdr_path) as fh:
        for line in fh:
            if "=" in line:
                k, v = line.split("=", 1)
                meta[k.strip()] = v.strip()
    if meta.get("interleave", "bsq").lower() != "bsq":
        raise ValueError("only BSQ interleave supported")
    dtype = _CODE_DTYPES[int(meta["data type"])]
    if int(meta.get("byte order", 0)) != 0:
        dtype = dtype.newbyteorder(">")
    shape = (int(meta["bands"]), int(meta["lines"]), int(meta["samples"]))
    offset = int(meta.get("header offset", 0))
    arr = np.fromfile(path, dtype=dtype, count=int(np.prod(shape)), offset=offset)
    return arr.reshape(shape), meta


def grid_to_envi(
    tiles_x: np.ndarray,
    tiles_y: np.ndarray,
    values: np.ndarray,
    path: str,
    z: int,
    nodata: float = -9999.0,
) -> tuple[str, str]:
    """Densify a sparse per-tile aggregate into a float32 ENVI raster.

    The grid window is the tile bounding box; ``map info`` anchors the
    upper-left tile corner in lon/lat with per-tile degree spacing (exact
    in x; y uses the window's mean Mercator tile height — documented
    approximation for the header only, pixel values are exact).
    """
    from gis_scripts_ray.functions import geo

    tiles_x = np.asarray(tiles_x, dtype=np.int64)
    tiles_y = np.asarray(tiles_y, dtype=np.int64)
    x0, y0 = int(tiles_x.min()), int(tiles_y.min())
    w = int(tiles_x.max()) - x0 + 1
    h = int(tiles_y.max()) - y0 + 1
    grid = np.full((h, w), nodata, dtype=np.float32)
    grid[tiles_y - y0, tiles_x - x0] = np.asarray(values, dtype=np.float32)
    lon_min, lat_min, lon_max, lat_max = geo.tile_bounds(
        z, np.array([x0]), np.array([y0])
    )
    xres = 360.0 / (1 << z)
    _, blat_min, _, blat_max = geo.tile_bounds(
        z, np.array([x0]), np.array([y0 + h - 1])
    )
    yres = (float(lat_max[0]) - float(blat_min[0])) / h
    return write_envi(
        grid, path, map_info=(float(lon_min[0]), float(lat_max[0]), xres, yres)
    )
