"""Golden-output conformance: distributed pipelines must reproduce the
committed single-process oracles bit-for-bit (FIXTURES.md F4)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
N_DOCS = 10_000


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    import ray

    from gis_scripts_ray.pipelines.flagship import geocode
    from gis_scripts_ray.sources.webpages import synthesize_web_pages

    pages = synthesize_web_pages(N_DOCS)
    pages = pages.append_column(
        "doc_id", pa.array(np.arange(N_DOCS), pa.int64())
    ).drop_columns(["html"])
    ds = ray.data.from_arrow(pages).repartition(8)
    from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells

    return encode_cells(geocode(ds), EncodeConfig(tile_z=6, hex_res=6)).materialize()


class TestGoldens:
    def test_pip_join_matches_golden(self, pages_ds):
        from gis_scripts_ray.sources.polygons import synthesize_polygons
        from gis_scripts_ray.stages.pip_join import pip_join

        joined = (
            pip_join(pages_ds, synthesize_polygons(), carry_cols=["url"], concurrency=2)
            .to_pandas()
            .sort_values(["url", "polygon_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = pq.read_table(os.path.join(GOLD, "golden_pip.parquet")).to_pandas()
        assert len(joined) == len(want)
        assert joined["url"].tolist() == want["url"].tolist()
        assert joined["polygon_id"].tolist() == want["polygon_id"].tolist()
        assert joined["class"].tolist() == want["class"].tolist()

    def test_tile_stats_match_golden(self, pages_ds):
        import pyarrow.compute as pc

        from gis_scripts_ray.stages.tile_agg import cell_sum_count

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "tile_x": batch["tile_x"],
                    "tile_y": batch["tile_y"],
                    "lang": batch["lang"],
                    "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64()),
                }
            )

        slim = pages_ds.map_batches(prep, batch_format="pyarrow")
        stats = cell_sum_count(slim, ["tile_x", "tile_y"], ["text_len"]).to_pandas()
        langs = (
            slim.groupby(["tile_x", "tile_y", "lang"])
            .count()
            .groupby(["tile_x", "tile_y"])
            .count()
            .to_pandas()
            .rename(columns={"count()": "n_langs"})
        )
        got = (
            stats.merge(langs, on=["tile_x", "tile_y"])
            .sort_values(["tile_x", "tile_y"])
            .reset_index(drop=True)
        )
        want = pq.read_table(os.path.join(GOLD, "golden_tiles.parquet")).to_pandas()
        assert got[["tile_x", "tile_y"]].values.tolist() == want[["tile_x", "tile_y"]].values.tolist()
        assert got["n"].tolist() == want["n_docs"].tolist()
        assert got["sum_text_len"].tolist() == want["sum_text_len"].tolist()
        assert got["n_langs"].tolist() == want["n_langs"].tolist()

    def test_knn_matches_golden(self, pages_ds):
        from gis_scripts_ray.stages.knn import knn_cell_ring

        want = pq.read_table(os.path.join(GOLD, "golden_knn.parquet")).to_pandas()
        url_by_id = dict(
            zip(
                pages_ds.select_columns(["doc_id", "url"]).to_pandas()["doc_id"],
                pages_ds.select_columns(["doc_id", "url"]).to_pandas()["url"],
            )
        )
        for probe in (0, 7, 13):
            sub = want[want["probe"] == probe]
            plat = float(sub["probe_lat"].iloc[0])
            plon = float(sub["probe_lon"].iloc[0])
            got = knn_cell_ring(pages_ds, plat, plon, 5, hex_res=6)
            got_urls = [url_by_id[i] for i in got["doc_id"].to_pylist()]
            assert got_urls == sub.sort_values("knn_rank")["url"].tolist(), probe

    def test_text_hashes_match_golden(self, pages_ds):
        want = pq.read_table(os.path.join(GOLD, "golden_text_hashes.parquet"))
        wmap = dict(zip(want["url"].to_pylist(), want["text_sha256"].to_pylist()))
        out = pages_ds.select_columns(["url", "text"]).to_pandas()
        assert len(out) == N_DOCS
        for u, t in zip(out["url"], out["text"]):
            assert hashlib.sha256(t.encode()).hexdigest() == wmap[u]
