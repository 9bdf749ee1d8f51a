"""Unit tests for the pure geo kernels (no Ray)."""

import numpy as np
import pytest

from gis_scripts_ray.functions import geo


RNG = np.random.default_rng(42)
N = 5000
LATS = RNG.uniform(-84.9, 84.9, N)
LONS = RNG.uniform(-179.9, 179.9, N)


class TestHaversine:
    def test_zero_distance(self):
        d = geo.haversine_m(LATS, LONS, LATS, LONS)
        assert np.allclose(d, 0.0, atol=1e-6)

    def test_known_distance(self):
        # London (51.5074, -0.1278) to Paris (48.8566, 2.3522) ~ 343.5 km
        d = geo.haversine_m(np.array([51.5074]), np.array([-0.1278]),
                            np.array([48.8566]), np.array([2.3522]))
        assert 340_000 < d[0] < 348_000

    def test_symmetry(self):
        d1 = geo.haversine_m(LATS[:100], LONS[:100], LATS[100:200], LONS[100:200])
        d2 = geo.haversine_m(LATS[100:200], LONS[100:200], LATS[:100], LONS[:100])
        assert np.allclose(d1, d2)

    def test_antipodal_bounded(self):
        d = geo.haversine_m(np.array([0.0]), np.array([0.0]),
                            np.array([0.0]), np.array([180.0]))
        assert abs(d[0] - np.pi * geo.EARTH_RADIUS_M) < 1.0


class TestSlippyTiles:
    @pytest.mark.parametrize("z", [0, 3, 6, 12, 20])
    def test_in_range(self, z):
        x, y = geo.lonlat_to_tile(LONS, LATS, z)
        assert x.min() >= 0 and x.max() < (1 << z)
        assert y.min() >= 0 and y.max() < (1 << z)

    def test_known_tile(self):
        # lon=0,lat=0 at z=1 is tile (1,1) (SE quadrant of the split)
        x, y = geo.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
        assert (x[0], y[0]) == (1, 1)
        # Greenwich at z=2: lon 0 -> x=2; lat 51.5 -> y=1
        x, y = geo.lonlat_to_tile(np.array([0.0]), np.array([51.5]), 2)
        assert (x[0], y[0]) == (2, 1)

    def test_pack_roundtrip(self):
        for z in (1, 6, 14, 29):
            x, y = geo.lonlat_to_tile(LONS, LATS, z)
            tid = geo.tile_id(z, x, y)
            z2, x2, y2 = geo.tile_id_unpack(tid)
            assert np.all(z2 == z) and np.all(x2 == x) and np.all(y2 == y)

    def test_bounds_contain_point(self):
        z = 8
        x, y = geo.lonlat_to_tile(LONS, LATS, z)
        lon_min, lat_min, lon_max, lat_max = geo.tile_bounds(z, x, y)
        assert np.all(LONS >= lon_min - 1e-9) and np.all(LONS <= lon_max + 1e-9)
        assert np.all(LATS >= lat_min - 1e-7) and np.all(LATS <= lat_max + 1e-7)

    def test_hierarchy(self):
        # tile at z is the parent (floor-div 2) of the tile at z+1
        x1, y1 = geo.lonlat_to_tile(LONS, LATS, 10)
        x2, y2 = geo.lonlat_to_tile(LONS, LATS, 11)
        assert np.all(x2 // 2 == x1) and np.all(y2 // 2 == y1)


class TestHexCells:
    @pytest.mark.parametrize("res", [5, 6, 7, 8, 9])
    def test_roundtrip_center_distance(self, res):
        cells = geo.lonlat_to_hex_cell(LONS, LATS, res)
        lon_c, lat_c = geo.hex_cell_center(cells)
        # each point is within one hex circumradius (= edge length) of its
        # cell center, in the projected (equirect) plane
        s = geo.hex_edge_deg(res)
        d = np.hypot(LONS - lon_c, LATS - lat_c)
        assert d.max() <= s * 1.0000001

    def test_pack_roundtrip(self):
        q = RNG.integers(-50_000, 50_000, 1000)
        r = RNG.integers(-50_000, 50_000, 1000)
        cells = geo.hex_cell_id(q, r, 9)
        res2, q2, r2 = geo.hex_cell_unpack(cells)
        assert np.all(res2 == 9) and np.all(q2 == q) and np.all(r2 == r)

    def test_determinism(self):
        c1 = geo.lonlat_to_hex_cell(LONS, LATS, 7)
        c2 = geo.lonlat_to_hex_cell(LONS.copy(), LATS.copy(), 7)
        assert np.array_equal(c1, c2)

    def test_k_ring_sizes(self):
        cell = int(geo.lonlat_to_hex_cell(np.array([10.0]), np.array([20.0]), 7)[0])
        for k in range(4):
            ring = geo.hex_k_ring(cell, k)
            # hexagon ring counts: 1 + 3k(k+1)
            assert len(ring) == 1 + 3 * k * (k + 1)
            assert len(np.unique(ring)) == len(ring)
            assert np.max(geo.hex_distance(ring, np.full(len(ring), cell))) <= k

    def test_neighbors_are_adjacent(self):
        cell = int(geo.lonlat_to_hex_cell(np.array([-70.0]), np.array([40.0]), 8)[0])
        ring1 = geo.hex_k_ring(cell, 1)
        d = geo.hex_distance(ring1, np.full(len(ring1), cell))
        assert sorted(d.tolist()) == [0, 1, 1, 1, 1, 1, 1]

    def test_resolution_nesting_scale(self):
        # finer resolutions produce >= as many distinct cells
        counts = [len(np.unique(geo.lonlat_to_hex_cell(LONS, LATS, r)))
                  for r in (5, 6, 7, 8)]
        assert counts == sorted(counts)


class TestS2Cells:
    def test_leaf_roundtrip_face_ij(self):
        cells = geo.lonlat_to_s2_cell(LONS, LATS, 30)
        face, i, j = geo.s2_cell_to_face_ij(cells)
        assert face.min() >= 0 and face.max() <= 5
        assert i.min() >= 0 and i.max() < (1 << 30)
        # re-encode from decoded (face,i,j) must give identical ids
        pos = geo._morton_spread(i) | (geo._morton_spread(j) << np.uint64(1))
        cid = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
        assert np.array_equal(cid, cells)

    def test_level_and_parent(self):
        leaf = geo.lonlat_to_s2_cell(LONS, LATS, 30)
        for lvl in (5, 12, 25):
            parent = geo.s2_parent(leaf, lvl)
            assert np.all(geo.s2_level(parent) == lvl)
            # hierarchy: encoding directly at lvl equals parent-of-leaf
            direct = geo.lonlat_to_s2_cell(LONS, LATS, lvl)
            assert np.array_equal(direct, parent)

    def test_parent_is_prefix(self):
        leaf = geo.lonlat_to_s2_cell(LONS, LATS, 30)
        p10 = geo.s2_parent(leaf, 10)
        # all leaves under one parent share the parent's high bits
        shift = np.uint64(2 * (30 - 10) + 1)
        assert np.array_equal(leaf >> shift, p10 >> shift)

    def test_face_centers(self):
        # cardinal directions hit the expected faces
        pts = [((0.0, 0.0), 0), ((90.0, 0.0), 1), ((0.0, 90.0), 2),
               ((180.0, 0.0), 3), ((-90.0, 0.0), 4), ((0.0, -90.0), 5)]
        for (lon, lat), want_face in pts:
            c = geo.lonlat_to_s2_cell(np.array([lon]), np.array([lat]), 30)
            face, _, _ = geo.s2_cell_to_face_ij(c)
            assert face[0] == want_face

    def test_spatial_locality(self):
        # two points 1e-6 deg apart share a level-15 cell ~always
        eps = 1e-7
        a = geo.lonlat_to_s2_cell(LONS, LATS, 15)
        b = geo.lonlat_to_s2_cell(LONS + eps, LATS + eps, 15)
        assert (a == b).mean() > 0.99

    def test_determinism(self):
        a = geo.lonlat_to_s2_cell(LONS, LATS, 20)
        b = geo.lonlat_to_s2_cell(LONS.copy(), LATS.copy(), 20)
        assert np.array_equal(a, b)


class TestRpc:
    def test_poly_matches_literal_transcription(self):
        """Oracle: the reference polynomial written out literally with **
        (seagrass_lib.py:68-71 term set)."""
        import numpy as np

        from gis_scripts_ray.functions.rpc import rpc_poly

        rng = np.random.default_rng(2)
        c = rng.standard_normal(20)
        L, P, H = rng.standard_normal((3, 100))
        want = (
            c[0] + c[1]*L + c[2]*P + c[3]*H + c[4]*L*P + c[5]*L*H + c[6]*P*H
            + c[7]*L**2 + c[8]*P**2 + c[9]*H**2 + c[10]*L*P*H + c[11]*L**3
            + c[12]*L*P**2 + c[13]*L*H**2 + c[14]*L**2*P + c[15]*P**3
            + c[16]*P*H**2 + c[17]*L**2*H + c[18]*P**2*H + c[19]*H**3
        )
        got = rpc_poly(c, L, P, H)
        assert np.allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_project_truncates_toward_zero(self):
        import numpy as np

        from gis_scripts_ray.functions.rpc import RpcModel, rpc_project

        ident = [0.0] * 20
        ident_n = list(ident); ident_n[1] = 1.0       # num = L
        ident_d = list(ident); ident_d[0] = 1.0       # den = 1
        m = RpcModel(0, 1, 0, 1, 0, 1, 0.0, 1.0, 0.0, 1.0,
                     tuple(ident_n), tuple(ident_d), tuple(ident_n), tuple(ident_d))
        col, row = rpc_project(np.array([2.7, -2.7]), np.array([0.0, 0.0]),
                               np.zeros(2), m)
        assert col.tolist() == [2, -2]  # int() semantics, not floor

    def test_sql_twin_matches_within_fma_ulp(self):
        """DuckDB contracts mul-add chains to FMA, so the SQL twin can
        differ from numpy by ~1 ulp — the query-level trunc/bucket margins
        absorb that (verified by the rpc_tile_counts oracle)."""
        import duckdb
        import numpy as np

        from gis_scripts_ray.functions.rpc import rpc_poly, rpc_poly_sql

        rng = np.random.default_rng(3)
        c = rng.standard_normal(20)
        L, P, H = rng.uniform(-1, 1, (3, 50))
        got = duckdb.sql(
            f"SELECT L, {rpc_poly_sql(c, 'L', 'P', 'H')} AS v FROM "
            "(SELECT UNNEST(?) AS L, UNNEST(?) AS P, UNNEST(?) AS H)",
            params=[list(L), list(P), list(H)],
        ).fetchnumpy()
        order = {l: i for i, l in enumerate(L)}
        idx = [order[l] for l in got["L"]]
        want = rpc_poly(c, L, P, H)[idx]
        assert np.allclose(got["v"], want, rtol=1e-13, atol=1e-13)


class TestSolar:
    def test_earth_sun_distance_matches_reference_transcription(self):
        import datetime

        import numpy as np

        from gis_scripts_ray.functions.solar import earth_sun_distance_au

        def ref(dt):
            p = dt.timetuple()
            yr, mon, d = p.tm_year, p.tm_mon, p.tm_mday
            if mon in [1, 2]:
                yr -= 1
                mon += 12
            ut = p.tm_hour + p.tm_min / 60.0 + p.tm_sec / 3600.0
            a = int(yr / 100)
            b = 2 - a + int(a / 4)
            jd = int(365.25 * (yr + 4716)) + int(30.6001 * (mon + 1)) + d + ut / 24.0 + b - 1524.5
            dd = jd - 2451545.0
            g = 357.529 + 0.98560028 * dd
            return 1.00014 - 0.01671 * np.cos(g * (np.pi / 180)) - 0.00014 * np.cos(
                2 * g * (np.pi / 180)
            )

        rng = np.random.default_rng(0)
        ts = rng.integers(0, 2_000_000_000, 300) * 1_000_000 + rng.integers(0, 10**6, 300)
        got = earth_sun_distance_au(ts)
        want = np.array(
            [
                ref(datetime.datetime.fromtimestamp(int(t) // 10**6, tz=datetime.timezone.utc))
                for t in ts
            ]
        )
        assert (got == want).all()
        assert got.min() > 0.982 and got.max() < 1.018
