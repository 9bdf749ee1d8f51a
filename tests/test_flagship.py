"""Integration tests: flagship pipeline end-to-end on sf0.001.

Oracle strategy per SURVEY.md §5: the PIP join is cross-checked against a
single-process brute-force sweep; the text byte-identity invariant is
enforced via sha256 comparison between the source table and the joined
output.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def joined_df(ray_session):
    from gis_scripts_ray.pipelines.flagship import flagship_joined

    return flagship_joined(SF_DIR, concurrency=2).to_pandas()


class TestFlagshipJoin:
    def test_join_matches_bruteforce_oracle(self, joined_df):
        """Every (url, polygon_id) join row matches a shapely-free brute force."""
        from gis_scripts_ray.sources.polygons import synthesize_polygons
        from gis_scripts_ray.sources.webpages import urls_for_doc_ids
        from gis_scripts_ray.state.geocoder import Geocoder, host_geo_table
        from gis_scripts_ray.state.strtree import PolygonIndex

        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
        urls = urls_for_doc_ids(docs["doc_id"].to_numpy())
        lat, lon = Geocoder(host_geo_table()).resolve(urls)
        idx = PolygonIndex(synthesize_polygons())
        want = set()
        url_list = urls.to_pylist()
        for i, poly in enumerate(idx.parts):
            inside = poly.contains(lon, lat)
            pid = int(idx.part_polygon_id[i])
            for p in np.nonzero(inside)[0]:
                want.add((url_list[p], pid))
        got = set(zip(joined_df["url"], joined_df["polygon_id"].astype(int)))
        assert got == want
        assert len(got) > 100  # the fixture exercises real matches

    def test_text_byte_identity(self, joined_df):
        """sha256(text) per url in the output == sha256 from the raw table."""
        from gis_scripts_ray.sources.webpages import urls_for_doc_ids

        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        url_list = urls_for_doc_ids(docs["doc_id"].to_numpy()).to_pylist()
        src_hash = {
            u: hashlib.sha256(t.encode()).hexdigest()
            for u, t in zip(url_list, docs["text"].to_pylist())
        }
        out = joined_df.drop_duplicates("url")
        assert len(out) > 0
        for u, t in zip(out["url"], out["text"]):
            assert hashlib.sha256(t.encode()).hexdigest() == src_hash[u]

    def test_tile_assignment_matches_kernel(self, joined_df):
        from gis_scripts_ray.functions import geo

        x, y = geo.lonlat_to_tile(
            joined_df["lon"].to_numpy(), joined_df["lat"].to_numpy(), 6
        )
        assert np.array_equal(x, joined_df["tile_x"].to_numpy())
        assert np.array_equal(y, joined_df["tile_y"].to_numpy())


class TestFlagshipAggregate:
    def test_two_level_structure(self, ray_session):
        from gis_scripts_ray.pipelines.flagship import flagship

        agg = flagship(SF_DIR, concurrency=2).to_pandas()
        assert set(agg.columns) >= {"tile_x", "tile_y", "class", "mean_text_len", "n"}
        assert (agg["n"] > 0).all()
        assert agg["mean_text_len"].between(1, 10_000).all()
        # aggregate is keyed uniquely
        assert not agg.duplicated(["tile_x", "tile_y", "class"]).any()

    def test_mean_matches_pandas(self, ray_session, joined_df):
        from gis_scripts_ray.pipelines.flagship import flagship

        agg = flagship(SF_DIR, concurrency=2).to_pandas()
        want = (
            joined_df.groupby(["tile_x", "tile_y", "class"])["text_len"]
            .agg(["mean", "count"])
            .reset_index()
        )
        merged = agg.merge(want, on=["tile_x", "tile_y", "class"], how="outer")
        assert len(merged) == len(agg) == len(want)
        assert np.allclose(merged["mean_text_len"], merged["mean"])
        assert (merged["n"] == merged["count"]).all()


class TestTwoLevelMean:
    def test_mean_of_means_semantics(self, ray_session):
        """A1: per-source mean then unweighted mean across sources."""
        import pandas as pd
        import ray

        df = pd.DataFrame(
            {
                "cell": [1, 1, 1, 1, 2, 2],
                "source": ["a", "a", "a", "b", "a", "b"],
                "v": [1.0, 2.0, 3.0, 10.0, 4.0, 8.0],
            }
        )
        from gis_scripts_ray.stages.tile_agg import two_level_mean

        ds = ray.data.from_pandas(df)
        out = (
            two_level_mean(ds, "cell", "source", "v")
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        # cell 1: mean(a)=2, mean(b)=10 -> 6.0 (NOT the pooled mean 4.0)
        assert out.loc[0, "mean_of_means"] == pytest.approx(6.0)
        assert out.loc[0, "n_sources"] == 2
        assert out.loc[1, "mean_of_means"] == pytest.approx(6.0)
