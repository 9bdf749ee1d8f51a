"""Minimal WKB (Well-Known Binary) codec for Polygon / MultiPolygon.

The polygon side layer is carried as ``wkb: binary`` (FIXTURES.md F2), the
analog of the reference's shapefile/GeoPackage vector layers
(``seagrass_lib.py:453-508`` OGR feature copy;
``create_dem_tiles_from_array.py:15`` GeoPackage read). No GEOS is available
in this environment, so this is a from-scratch codec implementing the OGC
WKB spec for the two geometry types the engine needs.

MultiPolygons are exploded to singlepart on read — the reference does the
same (``seagrass_lib.py:482-500`` ``multipart_to_singlepart``; note its
``geom_part`` NameError bug in the already-single branch, which this
implementation obviously does not replicate).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


@dataclass
class Polygon:
    """Single polygon: one exterior ring + zero or more hole rings.

    Rings are ``(n, 2)`` float64 arrays of (lon, lat) with the first vertex
    repeated as the last (closed), per the WKB convention.
    """

    exterior: np.ndarray
    holes: list[np.ndarray]

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        xs = self.exterior[:, 0]
        ys = self.exterior[:, 1]
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())

    def contains(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized even-odd (ray-casting) point-in-polygon for point arrays.

        Boundary points follow even-odd crossing semantics (half-open edges);
        fixture coordinates are synthesized off-boundary so this never
        disagrees with a closed-interval oracle.
        """
        inside = _ring_contains(self.exterior, x, y)
        for h in self.holes:
            inside &= ~_ring_contains(h, x, y)
        return inside


def _ring_contains(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of points against one closed ring.

    Vectorized over points; loops over ring edges (rings are tiny — tens of
    vertices — while point batches are large, so this orientation is the
    fast one).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    x0s, y0s = ring[:-1, 0], ring[:-1, 1]
    x1s, y1s = ring[1:, 0], ring[1:, 1]
    for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
        if y0 == y1:
            continue
        crosses = (y0 > y) != (y1 > y)
        if not crosses.any():
            continue
        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
        inside ^= crosses & (x < xint)
    return inside


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _encode_ring(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def polygon_wkb(exterior: np.ndarray, holes: list[np.ndarray] | None = None) -> bytes:
    holes = holes or []
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", 1 + len(holes))]
    out.append(_encode_ring(np.asarray(exterior)))
    for h in holes:
        out.append(_encode_ring(np.asarray(h)))
    return b"".join(out)


def multipolygon_wkb(polygons: list[tuple[np.ndarray, list[np.ndarray]]]) -> bytes:
    out = [struct.pack("<BI", 1, _WKB_MULTIPOLYGON), struct.pack("<I", len(polygons))]
    for exterior, holes in polygons:
        out.append(polygon_wkb(exterior, holes))
    return b"".join(out)


def box_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW)."""
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
    )
    return polygon_wkb(ring)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_ring(buf: memoryview, off: int, little: bool) -> tuple[np.ndarray, int]:
    fmt = "<I" if little else ">I"
    (n,) = struct.unpack_from(fmt, buf, off)
    off += 4
    dt = "<f8" if little else ">f8"
    ring = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off).reshape(n, 2)
    return ring.astype(np.float64, copy=False), off + 16 * n


def _read_polygon_body(buf: memoryview, off: int, little: bool) -> tuple[Polygon, int]:
    fmt = "<I" if little else ">I"
    (nrings,) = struct.unpack_from(fmt, buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off, little)
        rings.append(ring)
    return Polygon(exterior=rings[0], holes=rings[1:]), off


def parse_wkb(data: bytes) -> list[Polygon]:
    """Parse one WKB blob into singlepart polygons (multipolygons exploded)."""
    buf = memoryview(data)
    polys, _ = _parse_geom(buf, 0)
    return polys


def _parse_geom(buf: memoryview, off: int) -> tuple[list[Polygon], int]:
    little = buf[off] == 1
    off += 1
    fmt = "<I" if little else ">I"
    (gtype,) = struct.unpack_from(fmt, buf, off)
    off += 4
    gtype &= 0xFF  # strip any SRID/Z flags (not produced by our writer)
    if gtype == _WKB_POLYGON:
        poly, off = _read_polygon_body(buf, off, little)
        return [poly], off
    if gtype == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from(fmt, buf, off)
        off += 4
        out: list[Polygon] = []
        for _ in range(n):
            sub, off = _parse_geom(buf, off)
            out.extend(sub)
        return out, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")
