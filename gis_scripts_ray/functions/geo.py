"""Pure vectorized geo kernels — no Ray dependencies.

These are the engine's coordinate/cell primitives, the analog of the
reference's geotransform arithmetic (``seagrass_lib.py:89-96``
``world_to_pixel``; ``local_match.py:873-879`` pixel<->world) and its
target-aligned-pixel grid snapping (``create_dem_tiles_from_array.py:250-258``
``-tap``): every multi-input operation first aligns rows to a canonical,
deterministic cell grid, then groups by cell id.

Three cell systems are provided:

* **slippy / Web-Mercator tile** ``(z, x, y)`` — the canonical tiling key.
  SQL-expressible (floor/ln/tan), used for DuckDB-oracle-checked queries.
* **hex cell** — pointy-top axial hex binning on an equirectangular
  projection, resolutions 5-9 with aperture-sqrt(7) size progression.
  This is an H3-*style* grid built from scratch (public axial/cube-round
  algorithm); it is NOT libh3-compatible (documented divergence). It gives
  true hex semantics: 6 neighbors, exact k-rings for kNN candidate
  generation.
* **S2-style cell id** — real S2 face selection + quadratic ST projection +
  the standard 64-bit layout (3 face bits, 60 position bits, trailing 1),
  except position uses Morton (z-order) instead of Hilbert ordering.
  Hierarchical prefix/parent semantics are identical; only the ordering of
  sibling ids differs (documented divergence; locality of sequential ids is
  slightly worse, hierarchy containment is exact).

All kernels take/return numpy arrays and are safe to call inside
``map_batches`` on zero-copy Arrow columns (`np.asarray` of an Arrow
float64 column is zero-copy when there are no nulls).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)

# ---------------------------------------------------------------------------
# haversine
# ---------------------------------------------------------------------------


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters. Broadcasts like numpy."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


# ---------------------------------------------------------------------------
# slippy (Web-Mercator) tiles
# ---------------------------------------------------------------------------

MAX_MERCATOR_LAT = 85.05112878


def lonlat_to_tile(
    lon: np.ndarray, lat: np.ndarray, z: int
) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator tile (x, y) at zoom ``z``.

    Uses the literal formula ``ln(tan(r) + 1/cos(r))`` (not ``asinh``) so the
    double-precision result is bit-identical to the DuckDB oracle SQL that
    spells the same expression.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    n = np.float64(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n)
    r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, (1 << z) - 1).astype(np.int64)
    y = np.clip(y, 0, (1 << z) - 1).astype(np.int64)
    return x, y


def tile_id(z: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pack (z, x, y) into one int64 key: ``(z << 58) | (x << 29) | y``.

    Valid for z <= 29. SQL equivalent: ``z * 288230376151711744 +
    x * 536870912 + y``.
    """
    if z > 29:
        raise ValueError("tile_id packing supports z <= 29")
    return (
        (np.int64(z) << np.int64(58))
        | (np.asarray(x, dtype=np.int64) << np.int64(29))
        | np.asarray(y, dtype=np.int64)
    )


def tile_id_unpack(tid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    tid = np.asarray(tid, dtype=np.int64)
    z = (tid >> np.int64(58)).astype(np.int64)
    x = (tid >> np.int64(29)) & np.int64((1 << 29) - 1)
    y = tid & np.int64((1 << 29) - 1)
    return z, x, y


def tile_bounds(z: int, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, ...]:
    """(lon_min, lat_min, lon_max, lat_max) of tiles — the inverse transform."""
    n = np.float64(1 << z)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1) / n))))
    return lon_min, lat_min, lon_max, lat_max


# ---------------------------------------------------------------------------
# hex cells (axial, pointy-top, equirectangular projection)
# ---------------------------------------------------------------------------

_SQRT3 = np.sqrt(3.0)
_HEX_BASE_EDGE_DEG = 45.0  # edge length at res 0, degrees
_HEX_APERTURE = np.sqrt(7.0)  # size ratio between consecutive resolutions
_HEX_COORD_BITS = 27
_HEX_COORD_OFFSET = 1 << (_HEX_COORD_BITS - 1)


def hex_edge_deg(res: int) -> float:
    """Hex edge length in degrees at resolution ``res`` (supported: 0-15)."""
    return _HEX_BASE_EDGE_DEG / (_HEX_APERTURE**res)


def lonlat_to_hex_axial(
    lon: np.ndarray, lat: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Axial hex coordinates (q, r) via exact cube rounding."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    s = hex_edge_deg(res)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    return _cube_round(qf, rf)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_cell_id(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """Pack (res, q, r) into int64: ``res<<54 | (q+off)<<27 | (r+off)``."""
    q = np.asarray(q, dtype=np.int64) + _HEX_COORD_OFFSET
    r = np.asarray(r, dtype=np.int64) + _HEX_COORD_OFFSET
    if np.any((q < 0) | (q >= (1 << _HEX_COORD_BITS))) or np.any(
        (r < 0) | (r >= (1 << _HEX_COORD_BITS))
    ):
        raise ValueError("hex axial coordinate out of packable range")
    return (
        (np.int64(res) << np.int64(2 * _HEX_COORD_BITS))
        | (q << np.int64(_HEX_COORD_BITS))
        | r
    )


def hex_cell_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(2 * _HEX_COORD_BITS)
    q = ((cell >> np.int64(_HEX_COORD_BITS)) & np.int64((1 << _HEX_COORD_BITS) - 1)) - _HEX_COORD_OFFSET
    r = (cell & np.int64((1 << _HEX_COORD_BITS) - 1)) - _HEX_COORD_OFFSET
    return res, q, r


def lonlat_to_hex_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    q, r = lonlat_to_hex_axial(lon, lat, res)
    return hex_cell_id(q, r, res)


def hex_cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) of cell centers — inverse of the axial transform.

    All cells in one call must share a resolution (they do in practice:
    resolution is fixed per stage).
    """
    res, q, r = hex_cell_unpack(np.atleast_1d(cell))
    s = hex_edge_deg(int(res[0]))
    lat = 1.5 * r.astype(np.float64) * s
    lon = _SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0) * s
    return lon, lat


def hex_k_ring(cell: int, k: int) -> np.ndarray:
    """All cell ids within hex distance ``k`` of ``cell`` (including itself).

    Standard axial-range enumeration: (2k+1)^2-ish candidates, exact ring.
    Scalar cell in, array of cells out — used for kNN candidate cells and
    neighborhood exchange, always on *cell* tables (tiny), never per row.
    """
    res, q0, r0 = hex_cell_unpack(np.asarray([cell]))
    res, q0, r0 = int(res[0]), int(q0[0]), int(r0[0])
    dq = np.arange(-k, k + 1, dtype=np.int64)
    qq, rr = np.meshgrid(dq, dq)
    qq = qq.ravel()
    rr = rr.ravel()
    keep = (np.abs(qq) <= k) & (np.abs(rr) <= k) & (np.abs(qq + rr) <= k)
    return hex_cell_id(q0 + qq[keep], r0 + rr[keep], res)


def hex_distance(cell_a: np.ndarray, cell_b: np.ndarray) -> np.ndarray:
    """Hex grid distance between cells of equal resolution."""
    _, qa, ra = hex_cell_unpack(cell_a)
    _, qb, rb = hex_cell_unpack(cell_b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


# ---------------------------------------------------------------------------
# S2-style cells (face + quadratic ST + Morton position, standard bit layout)
# ---------------------------------------------------------------------------

S2_MAX_LEVEL = 30


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """S2 face selection (largest absolute component) + gnomonic (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn, wfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),       # face 0: +x
            (lambda: -x / y, lambda: z / y, None),      # face 1: +y
            (lambda: -x / z, lambda: -y / z, None),     # face 2: +z
            (lambda: z / x, lambda: y / x, None),       # face 3: -x
            (lambda: z / y, lambda: -x / y, None),      # face 4: -y
            (lambda: -y / z, lambda: -x / z, None),     # face 5: -z
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the library default)."""
    a = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))  # sqrt(1-3u) == sqrt(1+3|u|) for u<0
    return np.where(u >= 0.0, a, 1.0 - a)


def _st_to_ij(st: np.ndarray, level: int = S2_MAX_LEVEL) -> np.ndarray:
    n = 1 << level
    return np.clip((st * n).astype(np.int64), 0, n - 1)


def _morton_spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 30 bits of each int so they occupy even bit positions."""
    v = np.asarray(v, dtype=np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _morton_compact(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def lonlat_to_s2_cell(lon: np.ndarray, lat: np.ndarray, level: int = S2_MAX_LEVEL) -> np.ndarray:
    """S2-style 64-bit cell id at ``level`` (uint64).

    Layout (standard S2): 3 face bits | 2*30 position bits | trailing 1 at
    the cell's level. Position uses Morton order of (i, j) at level 30,
    truncated to ``level`` (see module docstring for the Hilbert divergence).
    """
    if not (0 <= level <= S2_MAX_LEVEL):
        raise ValueError("level must be in [0, 30]")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _morton_spread(i) | (_morton_spread(j) << np.uint64(1))  # 60 bits
    cid = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    if level < S2_MAX_LEVEL:
        cid = s2_parent(cid, level)
    return cid


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of leaf/deeper cells at ``level``: ``(id & -lsb) | lsb``."""
    cell = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (S2_MAX_LEVEL - level))
    neg_lsb = ~new_lsb + np.uint64(1)  # two's-complement -new_lsb
    return (cell & neg_lsb) | new_lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of the trailing set bit)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    lvl = S2_MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)
    return lvl


def s2_cell_to_face_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (face, i, j) at level 30 from a leaf cell id (for tests)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(61)).astype(np.int64)
    pos = (cell >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    i = _morton_compact(pos).astype(np.int64)
    j = _morton_compact(pos >> np.uint64(1)).astype(np.int64)
    return face, i, j
