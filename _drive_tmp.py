"""Single-process A/B: old dense vs new searchsorted STRtree query."""
import os, time
os.environ.setdefault("POLARS_MAX_THREADS", "1")
import numpy as np
import sys; sys.path.insert(0, "/root/repo")
from gis_scripts_ray.sources.polygons import synthesize_polygons
from gis_scripts_ray.state.strtree import PolygonIndex as NewIdx
from _oldmod.old_strtree import PolygonIndex as OldIdx

table = synthesize_polygons(n_extra_rects=2000)
new = NewIdx(table); old = OldIdx(table)
rng = np.random.default_rng(0)
# bench-like points: lats/lons in the fixture range
lon = rng.uniform(-170, 170, 125_000)
lat = rng.uniform(-80, 80, 125_000)

def run(idx):
    t0 = time.time()
    for _ in range(5):
        pt, part = idx.pip(lon, lat)
    return round((time.time()-t0)/5, 4), len(pt)

run(new); run(old)  # warm
for name, idx in (("old", old), ("new", new), ("old", old), ("new", new)):
    t, n = run(idx)
    print(name, t, "pairs", n)
# parity: identical (pt, polygon_id) result sets AND identical final outputs
p1 = new.pip(lon, lat); p0 = old.pip(lon, lat)
print("pt equal:", np.array_equal(p0[0], p1[0]),
      "pid equal:", np.array_equal(old.part_polygon_id[p0[1]], new.part_polygon_id[p1[1]]))
