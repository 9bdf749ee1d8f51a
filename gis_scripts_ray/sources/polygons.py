"""Deterministic admin/land-cover polygon side layer (FIXTURES.md F2).

The analog of the reference's GeoPackage tile layer / ROI shapefiles / AOI
extent polygons (``create_dem_tiles_from_array.py:11-15``;
``seagrass_lib.py:453-558``; ``Assess_Agreement.R:28-29``). ~100 polygons:
axis-aligned rectangles centered on a subset of the host sites, a few
concave polygons, one multipolygon, overlapping pairs with priorities for
mosaic-style overlap resolution (last/priority-wins, the
``gdal.Warp`` merge analog at ``global_match.py:302-312``).

All coordinates land on a 0.005-degree lattice while points land on a
0.01+0.003 lattice, so no point is ever exactly on a polygon boundary and
even-odd PIP agrees with closed-interval SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gis_scripts_ray.functions import wkb
from gis_scripts_ray.sources.webpages import SEED, site_locations

CLASSES = ["urban", "water", "forest", "cropland", "wetland", "barren", "grassland"]


import functools


@functools.lru_cache(maxsize=8)
def synthesize_polygons(seed: int = SEED, n_extra_rects: int = 0) -> pa.Table:
    """Fixture layer; ``n_extra_rects`` adds district-scale rectangles
    clustered around the sites (bench uses ~2000 — a realistic admin-layer
    size that makes the STRtree probe the dominant per-row cost).

    Memoized per (seed, n_extra_rects): the layer is deterministic and the
    returned Arrow table immutable, and returning the SAME object lets the
    driver-side PolygonIndex memo in ``stages/pip_join.py`` hit across
    repeated pipeline executions over one layer."""
    rng = np.random.default_rng(seed + 1)
    site_lat, site_lon = site_locations(seed)
    rows: list[tuple[int, str, bytes, int]] = []
    pid = 0
    # rectangles over ~60% of sites (some sites uncovered, some doubly covered)
    covered = rng.permutation(len(site_lat))[: int(len(site_lat) * 0.6)]
    for si in covered:
        w = round(float(rng.uniform(0.5, 6.0)), 2)
        h = round(float(rng.uniform(0.5, 6.0)), 2)
        cx, cy = float(site_lon[si]), float(site_lat[si])
        x0 = round(cx - w / 2, 2) + 0.005
        y0 = round(cy - h / 2, 2) + 0.005
        rows.append(
            (pid, CLASSES[pid % 7], wkb.box_wkb(x0, y0, x0 + w, y0 + h), pid % 5)
        )
        pid += 1
        if si % 4 == 0:  # overlapping sibling with different class/priority
            rows.append(
                (
                    pid,
                    CLASSES[(pid + 3) % 7],
                    wkb.box_wkb(x0 + w / 4, y0 + h / 4, x0 + w, y0 + h),
                    pid % 5,
                )
            )
            pid += 1
    # broad background rectangles (continental scale)
    for x0, y0, x1, y1 in [(-170.995, -60.995, -30.005, 70.005), (-29.995, -60.995, 60.005, 70.005), (60.015, -60.995, 170.005, 70.005)]:
        rows.append((pid, CLASSES[pid % 7], wkb.box_wkb(x0, y0, x1, y1), 0))
        pid += 1
    # concave polygon (C-shape) around one site
    cx, cy = float(site_lon[covered[0]]), float(site_lat[covered[0]])
    c = np.array(
        [
            [cx - 3, cy - 3], [cx + 3, cy - 3], [cx + 3, cy - 1], [cx - 1, cy - 1],
            [cx - 1, cy + 1], [cx + 3, cy + 1], [cx + 3, cy + 3], [cx - 3, cy + 3],
            [cx - 3, cy - 3],
        ]
    ) + 0.005
    rows.append((pid, "concave", wkb.polygon_wkb(c), 6)); pid += 1
    # one multipolygon spanning two sites
    a_lat, a_lon = float(site_lat[covered[1]]), float(site_lon[covered[1]])
    b_lat, b_lon = float(site_lat[covered[2]]), float(site_lon[covered[2]])
    mp = wkb.multipolygon_wkb(
        [
            (np.array([[a_lon - 1, a_lat - 1], [a_lon + 1, a_lat - 1], [a_lon + 1, a_lat + 1], [a_lon - 1, a_lat + 1], [a_lon - 1, a_lat - 1]]) + 0.005, []),
            (np.array([[b_lon - 1, b_lat - 1], [b_lon + 1, b_lat - 1], [b_lon + 1, b_lat + 1], [b_lon - 1, b_lat + 1], [b_lon - 1, b_lat - 1]]) + 0.005, []),
        ]
    )
    rows.append((pid, "multi", mp, 6)); pid += 1
    # optional dense district layer
    for _ in range(n_extra_rects):
        si = pid % len(site_lat)
        cx = float(site_lon[si]) + float(rng.uniform(-3, 3))
        cy = float(site_lat[si]) + float(rng.uniform(-3, 3))
        w = float(rng.uniform(0.2, 1.5))
        h = float(rng.uniform(0.2, 1.5))
        rows.append(
            (pid, CLASSES[pid % 7], wkb.box_wkb(cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2), pid % 5)
        )
        pid += 1
    return pa.table(
        {
            "polygon_id": pa.array([r[0] for r in rows], pa.int64()),
            "class": pa.array([r[1] for r in rows], pa.string()),
            "wkb": pa.array([r[2] for r in rows], pa.binary()),
            "priority": pa.array([r[3] for r in rows], pa.int32()),
        }
    )


def rectangles_table(seed: int = SEED) -> pa.Table:
    """Rectangle-only view ``(polygon_id, class, xmin, ymin, xmax, ymax,
    priority)`` for SQL-oracle queries (BETWEEN joins in DuckDB).

    Only the axis-aligned rectangles from :func:`synthesize_polygons` —
    concave/multi shapes are excluded here and covered by python-oracle
    tests instead.
    """
    table = synthesize_polygons(seed)
    from gis_scripts_ray.functions.wkb import parse_wkb

    ids, classes, prios, xmin, ymin, xmax, ymax = [], [], [], [], [], [], []
    for pid, cls, blob, prio in zip(
        table["polygon_id"].to_pylist(),
        table["class"].to_pylist(),
        table["wkb"].to_pylist(),
        table["priority"].to_pylist(),
    ):
        if cls in ("concave", "multi"):
            continue
        polys = parse_wkb(blob)
        ext = polys[0].exterior
        if len(ext) != 5:  # not a rectangle
            continue
        ids.append(pid); classes.append(cls); prios.append(prio)
        b = polys[0].bounds
        xmin.append(b[0]); ymin.append(b[1]); xmax.append(b[2]); ymax.append(b[3])
    return pa.table(
        {
            "polygon_id": pa.array(ids, pa.int64()),
            "class": pa.array(classes, pa.string()),
            "xmin": pa.array(xmin, pa.float64()),
            "ymin": pa.array(ymin, pa.float64()),
            "xmax": pa.array(xmax, pa.float64()),
            "ymax": pa.array(ymax, pa.float64()),
            "priority": pa.array(prios, pa.int32()),
        }
    )
