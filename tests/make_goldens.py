"""Generate the committed golden fixtures (FIXTURES.md F4).

Run from the repo root: ``python tests/make_goldens.py``. Goldens are
produced by INDEPENDENT single-process sweeps (no STRtree, no Ray, no
partial top-k): brute-force PIP via ray-cast on every polygon part,
brute-force kNN via full lexsort, sha256 text hashes. The engine tests
(``test_goldens.py``) must reproduce them bit-for-bit through the
distributed pipelines — the engine's version of the reference's
diagnostic-raster practice, made exact (SURVEY.md §5).
"""

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_scripts_ray.functions import geo
from gis_scripts_ray.functions.wkb import parse_wkb
from gis_scripts_ray.sources.polygons import synthesize_polygons
from gis_scripts_ray.sources.webpages import synthesize_web_pages
from gis_scripts_ray.state.geocoder import Geocoder, host_geo_table

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
N_DOCS = 10_000


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pages = synthesize_web_pages(N_DOCS)
    urls = pages["url"]
    lat, lon = Geocoder(host_geo_table()).resolve(urls.combine_chunks())

    # golden_text_hashes: (url, sha256(text)) — first occurrence per url
    hashes = [
        hashlib.sha256(t.encode()).hexdigest() for t in pages["text"].to_pylist()
    ]
    pq.write_table(
        pa.table({"url": urls, "text_sha256": pa.array(hashes, pa.string())}),
        os.path.join(OUT, "golden_text_hashes.parquet"),
    )

    # golden_pip: brute-force ray-cast over every part of every polygon
    poly_tbl = synthesize_polygons()
    rows_url, rows_pid, rows_cls = [], [], []
    url_list = urls.to_pylist()
    for pid, cls, blob in zip(
        poly_tbl["polygon_id"].to_pylist(),
        poly_tbl["class"].to_pylist(),
        poly_tbl["wkb"].to_pylist(),
    ):
        inside = np.zeros(N_DOCS, dtype=bool)
        for part in parse_wkb(blob):
            inside |= part.contains(lon, lat)
        for i in np.nonzero(inside)[0]:
            rows_url.append(url_list[i])
            rows_pid.append(pid)
            rows_cls.append(cls)
    order = np.lexsort((rows_pid, rows_url))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([rows_url[i] for i in order], pa.string()),
                "polygon_id": pa.array([rows_pid[i] for i in order], pa.int64()),
                "class": pa.array([rows_cls[i] for i in order], pa.string()),
            }
        ),
        os.path.join(OUT, "golden_pip.parquet"),
    )

    # golden_tiles: per-z6-tile exact stats (n_docs, n_langs, sum_text_len)
    tx, ty = geo.lonlat_to_tile(lon, lat, 6)
    text_len = np.array([len(t.encode()) for t in pages["text"].to_pylist()])
    langs = np.asarray(pages["lang"].to_pylist(), dtype=object)
    import collections

    agg: dict[tuple[int, int], list] = collections.defaultdict(lambda: [0, set(), 0])
    for i in range(N_DOCS):
        a = agg[(int(tx[i]), int(ty[i]))]
        a[0] += 1
        a[1].add(langs[i])
        a[2] += int(text_len[i])
    keys = sorted(agg)
    pq.write_table(
        pa.table(
            {
                "tile_x": pa.array([k[0] for k in keys], pa.int64()),
                "tile_y": pa.array([k[1] for k in keys], pa.int64()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_langs": pa.array([len(agg[k][1]) for k in keys], pa.int64()),
                "sum_text_len": pa.array([agg[k][2] for k in keys], pa.int64()),
            }
        ),
        os.path.join(OUT, "golden_tiles.parquet"),
    )

    # golden_knn: 20 probes x k=5, brute force lexsort by (dist, row index)
    rng = np.random.default_rng(99)
    plats = np.round(rng.uniform(-60, 65, 20), 2) + 0.003
    plons = np.round(rng.uniform(-170, 170, 20), 2) + 0.003
    p_idx, p_rank, p_url = [], [], []
    for p in range(20):
        d = geo.haversine_m(plats[p], plons[p], lat, lon)
        order = np.lexsort((np.arange(N_DOCS), d))[:5]
        for r, i in enumerate(order, start=1):
            p_idx.append(p)
            p_rank.append(r)
            p_url.append(url_list[i])
    pq.write_table(
        pa.table(
            {
                "probe": pa.array(p_idx, pa.int64()),
                "knn_rank": pa.array(p_rank, pa.int64()),
                "url": pa.array(p_url, pa.string()),
                "probe_lat": pa.array([float(plats[i]) for i in p_idx], pa.float64()),
                "probe_lon": pa.array([float(plons[i]) for i in p_idx], pa.float64()),
            }
        ),
        os.path.join(OUT, "golden_knn.parquet"),
    )
    print("goldens written to", OUT)


if __name__ == "__main__":
    main()
