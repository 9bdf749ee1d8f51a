"""Distributed weighted DBSCAN (stages/dbscan.py) vs a naive all-pairs
reference: planted clusters / border / noise / antimeridian / high-lat,
weighted==expanded equivalence, block-structure invariance, forced
join-fallback path identity, and the fixture eps-margin contract."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.functions import geo
from gis_scripts_ray.stages.dbscan import dbscan


def naive_dbscan(ids, lat, lon, w, eps_m, min_weight):
    """O(n^2) single-process reference with the same deterministic
    semantics: min-id cluster labels, min-root border assignment."""
    n = len(ids)
    d = geo.haversine_m(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
    nbr = d <= eps_m
    within = (nbr * w[None, :]).sum(axis=1)
    core = within >= min_weight
    lab = {int(ids[i]): int(ids[i]) for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not core[i]:
                continue
            for j in range(n):
                if core[j] and nbr[i, j]:
                    m = min(lab[int(ids[i])], lab[int(ids[j])])
                    if lab[int(ids[i])] != m or lab[int(ids[j])] != m:
                        lab[int(ids[i])] = lab[int(ids[j])] = m
                        changed = True
    out = {}
    for i in range(n):
        if core[i]:
            out[int(ids[i])] = (1, lab[int(ids[i])])
        else:
            cands = [
                lab[int(ids[j])] for j in range(n) if core[j] and nbr[i, j]
            ]
            out[int(ids[i])] = (0, min(cands) if cands else -1)
    return out


def _planted():
    """Three clusters + isolated noise + a seam-crossing pair + a
    deterministic core-chain-with-border triple: a1(w=6) and a2(w=6) are
    each other's neighbors (core), b(w=1) is eps-close to a2 only —
    within(b)=7 < 12, so b is a genuine BORDER point of the chain."""
    rng = np.random.default_rng(7)
    lat = np.concatenate(
        [
            40 + rng.uniform(-0.4, 0.4, 30),  # cluster A
            -10 + rng.uniform(-0.4, 0.4, 25),  # cluster B
            65 + rng.uniform(-0.2, 0.2, 10),  # cluster C (high lat)
            np.array([0.0, 30.0, -45.0]),  # isolated noise
            np.array([10.0, 10.05]),  # antimeridian pair (w 10+10: core)
            np.array([-30.0, -29.5, -28.5]),  # chain a1, a2, border b
        ]
    )
    lon = np.concatenate(
        [
            -100 + rng.uniform(-0.4, 0.4, 30),
            20 + rng.uniform(-0.4, 0.4, 25),
            150 + rng.uniform(-0.4, 0.4, 10),
            np.array([-170.0, 90.0, 10.0]),
            np.array([179.95, -179.95]),
            np.array([-30.0, -30.0, -30.0]),
        ]
    )
    n = len(lat)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    w = np.random.default_rng(11).integers(1, 5, n - 5).astype(np.int64)
    w = np.concatenate([w, np.array([10, 10, 6, 6, 1], dtype=np.int64)])
    return ids, lat, lon, w


EPS = 120_000.0
MINW = 12


def _run(ray_session, ids, lat, lon, w, n_blocks=6, **kw):
    import ray.data

    pts = ray.data.from_arrow(
        pa.table({"id": ids, "lat": lat, "lon": lon, "w": w})
    ).repartition(n_blocks)
    return (
        dbscan(pts, EPS, MINW, id_col="id", weight_col="w", **kw)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )


class TestDbscanSemantics:
    def test_matches_naive_reference(self, ray_session):
        ids, lat, lon, w = _planted()
        res = _run(ray_session, ids, lat, lon, w)
        ref = naive_dbscan(ids, lat, lon, w, EPS, MINW)
        assert len(res) == len(ids)
        for i in ids:
            got = (int(res.loc[i, "is_core"]), int(res.loc[i, "cluster"]))
            assert got == ref[int(i)], f"id {i}: {got} != {ref[int(i)]}"
        # the fixture genuinely exercises every row class
        assert (res["cluster"] == -1).any(), "fixture must contain noise"
        assert ((res["is_core"] == 0) & (res["cluster"] >= 0)).any(), (
            "fixture must contain border points"
        )
        assert res[res["cluster"] >= 0]["cluster"].nunique() >= 3

    def test_antimeridian_pair_clusters_together(self, ray_session):
        # two heavy points straddling +-180 are within eps only across the
        # seam; they must land in one cluster (ghost-shift candidate gen)
        ids = np.array([1, 2], dtype=np.int64)
        lat = np.array([10.0, 10.05])
        lon = np.array([179.95, -179.95])
        w = np.array([10, 10], dtype=np.int64)
        res = _run(ray_session, ids, lat, lon, w, n_blocks=2)
        assert list(res["is_core"]) == [1, 1]
        assert list(res["cluster"]) == [1, 1]
        d = geo.haversine_m(lat[0], lon[0], lat[1], lon[1])
        assert d <= EPS  # sanity: the pair really is eps-close only via wrap

    def test_weighted_equals_expanded(self, ray_session):
        # weighted points == classic DBSCAN on the expanded multiset of
        # co-located rows (extra copies get ids above every site id, so
        # min-id labels are unchanged)
        ids, lat, lon, w = _planted()
        res_w = _run(ray_session, ids, lat, lon, w)
        base = 10_000
        e_ids, e_lat, e_lon = [], [], []
        nxt = base
        for i in range(len(ids)):
            e_ids.append(ids[i])
            e_lat.append(lat[i])
            e_lon.append(lon[i])
            for _ in range(int(w[i]) - 1):
                e_ids.append(nxt)
                e_lat.append(lat[i])
                e_lon.append(lon[i])
                nxt += 1
        e_ids = np.array(e_ids, dtype=np.int64)
        e_lat = np.array(e_lat)
        e_lon = np.array(e_lon)
        ones = np.ones(len(e_ids), dtype=np.int64)
        res_e = _run(ray_session, e_ids, e_lat, e_lon, ones, n_blocks=5)
        for i in ids:
            assert int(res_w.loc[i, "is_core"]) == int(res_e.loc[i, "is_core"])
            assert int(res_w.loc[i, "cluster"]) == int(res_e.loc[i, "cluster"])

    def test_all_noise_when_threshold_unreachable(self, ray_session):
        import ray.data

        ids = np.arange(5, dtype=np.int64)
        pts = ray.data.from_arrow(
            pa.table(
                {
                    "id": ids,
                    "lat": np.linspace(0, 40, 5),
                    "lon": np.linspace(0, 40, 5),
                    "w": np.ones(5, dtype=np.int64),
                }
            )
        )
        res = dbscan(pts, 1000.0, 99, id_col="id", weight_col="w").to_pandas()
        assert (res["cluster"] == -1).all()
        assert (res["is_core"] == 0).all()

    def test_unweighted_default(self, ray_session):
        import ray.data

        # weight_col=None == all-ones weights
        ids, lat, lon, w = _planted()
        ones = np.ones(len(ids), dtype=np.int64)
        a = _run(ray_session, ids, lat, lon, ones)
        pts = ray.data.from_arrow(
            pa.table({"id": ids, "lat": lat, "lon": lon})
        ).repartition(6)
        b = (
            dbscan(pts, EPS, MINW, id_col="id")
            .to_pandas()
            .set_index("id")
            .sort_index()
        )
        assert (a == b).all().all()


class TestDbscanPaths:
    def test_block_structure_invariance(self, ray_session):
        ids, lat, lon, w = _planted()
        a = _run(ray_session, ids, lat, lon, w, n_blocks=1)
        b = _run(ray_session, ids, lat, lon, w, n_blocks=9)
        assert (a == b).all().all()

    def test_forced_join_fallback_identical(self, ray_session):
        # broadcast_limit=0 forces the hash-join delivery everywhere
        # (core filter, border roots, final label join + anti-join) AND
        # graphcc's join fallback — must be bit-identical
        ids, lat, lon, w = _planted()
        a = _run(ray_session, ids, lat, lon, w)
        b = _run(ray_session, ids, lat, lon, w, broadcast_limit=0)
        assert (a == b).all().all()


class TestKnnJoin:
    def _naive(self, ids, lat, lon, radius, k):
        d = geo.haversine_m(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        out = set()
        for i in range(len(ids)):
            cands = [
                (d[i, j], int(ids[j]))
                for j in range(len(ids))
                if j != i and ids[j] != ids[i] and d[i, j] <= radius
            ]
            for r, (_, nid) in enumerate(sorted(cands)[:k], start=1):
                out.add((int(ids[i]), nid, r))
        return out

    def test_matches_naive_reference(self, ray_session):
        import ray.data

        ids, lat, lon, _ = _planted()
        pts = ray.data.from_arrow(
            pa.table({"id": ids, "lat": lat, "lon": lon})
        ).repartition(6)
        from gis_scripts_ray.stages.knn import knn_join

        res = knn_join(pts, EPS, 3, id_col="id").to_pandas()
        got = set(
            zip(res["src_id"].astype(int), res["nbr_id"].astype(int), res["knn_rank"].astype(int))
        )
        assert got == self._naive(ids, lat, lon, EPS, 3)
        # block-structure invariance
        pts1 = ray.data.from_arrow(
            pa.table({"id": ids, "lat": lat, "lon": lon})
        ).repartition(1)
        res1 = knn_join(pts1, EPS, 3, id_col="id").to_pandas()
        got1 = set(
            zip(res1["src_id"].astype(int), res1["nbr_id"].astype(int), res1["knn_rank"].astype(int))
        )
        assert got1 == got

    def test_antimeridian_neighbors(self, ray_session):
        import ray.data

        ids = np.array([1, 2, 3], dtype=np.int64)
        lat = np.array([10.0, 10.05, 10.1])
        lon = np.array([179.95, -179.95, -179.9])
        pts = ray.data.from_arrow(pa.table({"id": ids, "lat": lat, "lon": lon}))
        from gis_scripts_ray.stages.knn import knn_join

        res = knn_join(pts, EPS, 2, id_col="id").to_pandas()
        got = set(
            zip(res["src_id"].astype(int), res["nbr_id"].astype(int), res["knn_rank"].astype(int))
        )
        assert got == self._naive(ids, lat, lon, EPS, 2)
        assert (1, 2, 1) in got  # the seam pair really joined


class TestFixtureContract:
    def test_knn_join_fixture_margins(self):
        # the geo_knn_join oracle's float order is cross-engine-stable
        # because every DISTINCT neighbor-distance gap and the radius
        # margin are astronomically larger than cross-engine ULP noise
        from gis_scripts_ray.state.geocoder import host_geo_table

        t = host_geo_table()
        lat = t["lat"].to_numpy()
        lon = t["lon"].to_numpy()
        n = len(lat)
        d = geo.haversine_m(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        radius = 150_000.0
        iu = np.triu_indices(n, 1)
        assert np.abs(d[iu] - radius).min() > 1_000.0
        min_gap = np.inf
        for i in range(n):
            mask = (d[i] <= radius) & (np.arange(n) != i)
            vals = np.sort(d[i][mask])
            dv = np.diff(vals)
            dv = dv[dv > 0]  # exact ties are id-tiebroken on both engines
            if len(dv):
                min_gap = min(min_gap, dv.min())
        assert min_gap > 1.0, f"distinct-distance gap too small: {min_gap} m"

    def test_eps_margin_over_host_pairs(self):
        # the oracle's <=eps comparisons are ULP-proof only because eps is
        # far from every realized inter-host distance — pin the margin
        from gis_scripts_ray.queries import _DBSCAN_EPS_M
        from gis_scripts_ray.state.geocoder import host_geo_table

        t = host_geo_table()
        lat = t["lat"].to_numpy()
        lon = t["lon"].to_numpy()
        d = geo.haversine_m(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        iu = np.triu_indices(len(lat), 1)
        gap = np.abs(d[iu] - _DBSCAN_EPS_M).min()
        assert gap > 1_000.0, f"eps margin too small: {gap} m"

    def test_lon_cell_bound_is_safe(self):
        # the lon cell width must cover the true dlon of eps-close pairs
        # at the data's latitude cap (exact spherical bound)
        from gis_scripts_ray.stages.dbscan import _lon_cell_deg

        rng = np.random.default_rng(3)
        for lat_cap in (0.0, 30.0, 60.0, 75.0, 89.0):
            eps = 200_000.0
            width = _lon_cell_deg(eps, lat_cap)
            # sample pairs at the cap with dlon just inside the bound
            la = np.full(1000, lat_cap)
            dlon = rng.uniform(0, min(width, 180.0), 1000)
            d = geo.haversine_m(la, np.zeros(1000), la, dlon)
            # every pair closer than eps must have dlon < width
            assert (dlon[d <= eps] < width).all()
