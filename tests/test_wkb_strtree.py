"""WKB codec + STRtree / PolygonIndex tests against a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.functions import wkb
from gis_scripts_ray.state.strtree import PolygonIndex, STRtree

RNG = np.random.default_rng(7)


class TestWkbCodec:
    def test_polygon_roundtrip(self):
        ring = np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], dtype=float)
        hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
        blob = wkb.polygon_wkb(ring, [hole])
        polys = wkb.parse_wkb(blob)
        assert len(polys) == 1
        assert np.array_equal(polys[0].exterior, ring)
        assert len(polys[0].holes) == 1
        assert np.array_equal(polys[0].holes[0], hole)

    def test_auto_close_ring(self):
        ring = np.array([[0, 0], [2, 0], [1, 2]], dtype=float)  # not closed
        polys = wkb.parse_wkb(wkb.polygon_wkb(ring))
        assert np.array_equal(polys[0].exterior[0], polys[0].exterior[-1])

    def test_multipolygon_explodes(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
        b = np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], dtype=float)
        blob = wkb.multipolygon_wkb([(a, []), (b, [])])
        polys = wkb.parse_wkb(blob)
        assert len(polys) == 2
        assert polys[0].bounds == (0, 0, 1, 1)
        assert polys[1].bounds == (5, 5, 6, 6)

    def test_box_contains(self):
        polys = wkb.parse_wkb(wkb.box_wkb(-1, -2, 3, 4))
        x = np.array([0.0, -1.5, 2.9, 3.5])
        y = np.array([0.0, 0.0, 3.9, 0.0])
        assert polys[0].contains(x, y).tolist() == [True, False, True, False]

    def test_hole_excluded(self):
        ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
        polys = wkb.parse_wkb(wkb.polygon_wkb(ring, [hole]))
        x = np.array([5.0, 2.0, 7.0])
        y = np.array([5.0, 2.0, 5.0])
        assert polys[0].contains(x, y).tolist() == [False, True, True]

    def test_concave_polygon(self):
        # C-shape: points in the notch are outside
        ring = np.array(
            [[0, 0], [6, 0], [6, 2], [2, 2], [2, 4], [6, 4], [6, 6], [0, 6], [0, 0]],
            dtype=float,
        )
        polys = wkb.parse_wkb(wkb.polygon_wkb(ring))
        x = np.array([1.0, 4.0, 4.0])
        y = np.array([3.0, 3.0, 1.0])
        assert polys[0].contains(x, y).tolist() == [True, False, True]


def _random_boxes(n, lo=-100, hi=100, max_side=8.0):
    x0 = RNG.uniform(lo, hi - max_side, n)
    y0 = RNG.uniform(lo, hi - max_side, n)
    w = RNG.uniform(0.5, max_side, n)
    h = RNG.uniform(0.5, max_side, n)
    return np.column_stack([x0, y0, x0 + w, y0 + h])


class TestSTRtree:
    @pytest.mark.parametrize("n_items", [1, 15, 16, 17, 300, 2000])
    def test_matches_bruteforce(self, n_items):
        boxes = _random_boxes(n_items)
        tree = STRtree(boxes)
        px = RNG.uniform(-110, 110, 500)
        py = RNG.uniform(-110, 110, 500)
        pt, item = tree.query_points(px, py)
        got = set(zip(pt.tolist(), item.tolist()))
        want = set()
        for i, (x0, y0, x1, y1) in enumerate(boxes):
            hit = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            for p in np.nonzero(hit)[0]:
                want.add((int(p), i))
        assert got == want

    def test_empty_query(self):
        tree = STRtree(_random_boxes(50))
        pt, item = tree.query_points(np.array([1000.0]), np.array([1000.0]))
        assert len(pt) == 0 and len(item) == 0


def _index_fixture():
    """~60 polygons: boxes, one concave, one multipolygon, one with a hole."""
    rows = []
    boxes = _random_boxes(55, lo=-80, hi=80, max_side=20.0)
    pid = 0
    for x0, y0, x1, y1 in boxes:
        rows.append((pid, f"class_{pid % 7}", wkb.box_wkb(x0, y0, x1, y1), pid % 3))
        pid += 1
    concave = np.array(
        [[0, 0], [30, 0], [30, 10], [10, 10], [10, 20], [30, 20], [30, 30], [0, 30], [0, 0]],
        dtype=float,
    )
    rows.append((pid, "concave", wkb.polygon_wkb(concave), 9)); pid += 1
    a = np.array([[-50, -50], [-40, -50], [-40, -40], [-50, -40], [-50, -50]], dtype=float)
    b = np.array([[40, 40], [50, 40], [50, 50], [40, 50], [40, 40]], dtype=float)
    rows.append((pid, "multi", wkb.multipolygon_wkb([(a, []), (b, [])]), 9)); pid += 1
    ring = np.array([[-30, -30], [-10, -30], [-10, -10], [-30, -10], [-30, -30]], dtype=float)
    hole = np.array([[-25, -25], [-15, -25], [-15, -15], [-25, -15], [-25, -25]], dtype=float)
    rows.append((pid, "holed", wkb.polygon_wkb(ring, [hole]), 9)); pid += 1
    return pa.table(
        {
            "polygon_id": pa.array([r[0] for r in rows], pa.int64()),
            "class": pa.array([r[1] for r in rows]),
            "wkb": pa.array([r[2] for r in rows], pa.binary()),
            "priority": pa.array([r[3] for r in rows], pa.int32()),
        }
    )


class TestPolygonIndex:
    def test_pip_matches_bruteforce(self):
        table = _index_fixture()
        idx = PolygonIndex(table)
        px = RNG.uniform(-90, 90, 2000)
        py = RNG.uniform(-90, 90, 2000)
        pt, part = idx.pip(px, py)
        got = set(zip(pt.tolist(), idx.part_polygon_id[part].tolist()))
        # brute force over every part polygon
        want = set()
        for i, poly in enumerate(idx.parts):
            inside = poly.contains(px, py)
            for p in np.nonzero(inside)[0]:
                want.add((int(p), int(idx.part_polygon_id[i])))
        assert got == want
        assert len(got) > 100  # fixture actually exercises matches

    def test_multipolygon_dedup(self):
        table = _index_fixture()
        idx = PolygonIndex(table)
        # a point in part A of the multipolygon appears exactly once
        pt, part = idx.pip(np.array([-45.0]), np.array([-45.0]))
        pids = idx.part_polygon_id[part]
        assert np.sum(idx.part_class[part] == "multi") == 1
        assert len(pids) == len(set(pids.tolist()))
