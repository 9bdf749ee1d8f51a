"""sitemap.xml source (sources/sitemap.py)."""

import pyarrow as pa
import pytest

from gis_scripts_ray.sources.sitemap import (
    SitemapIndexStage,
    UrlsetStage,
    parse_sitemap_index,
    parse_urlset,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


class TestParsers:
    def test_index_with_and_without_namespace(self):
        x = (
            f"<sitemapindex {NS}><sitemap><loc>https://a/s1.xml</loc>"
            "</sitemap><sitemap><loc> https://a/s2.xml </loc></sitemap>"
            "</sitemapindex>"
        )
        assert parse_sitemap_index(x) == ["https://a/s1.xml", "https://a/s2.xml"]
        bare = "<sitemapindex><sitemap><loc>u</loc></sitemap></sitemapindex>"
        assert parse_sitemap_index(bare) == ["u"]

    def test_urlset_fields_and_optionality(self):
        x = (
            f"<urlset {NS}>"
            "<url><loc>https://a/p1</loc><lastmod>2025-01-03</lastmod>"
            "<changefreq>daily</changefreq><priority>0.8</priority></url>"
            "<url><loc>https://a/p2</loc></url>"
            "<url><priority>0.5</priority></url>"  # no loc: dropped
            "</urlset>"
        )
        got = parse_urlset(x)
        assert len(got) == 2
        assert got[0] == {
            "loc": "https://a/p1",
            "lastmod": "2025-01-03",
            "changefreq": "daily",
            "priority_tenths": 8,
        }
        assert got[1]["lastmod"] is None
        assert got[1]["priority_tenths"] is None

    def test_priority_decimal_exact(self):
        # 1.0 and 0.3 must convert exactly — float would make 0.3 ->
        # 2.9999... and truncate wrong
        x = (
            "<urlset><url><loc>a</loc><priority>1.0</priority></url>"
            "<url><loc>b</loc><priority>0.3</priority></url></urlset>"
        )
        assert [e["priority_tenths"] for e in parse_urlset(x)] == [10, 3]

    def test_malformed_xml_raises(self):
        with pytest.raises(Exception):
            parse_urlset("<urlset><url>")


class TestStages:
    def test_index_stage_explodes(self):
        t = pa.table(
            {
                "host": pa.array(["h0"], pa.string()),
                "xml": pa.array(
                    [
                        "<sitemapindex><sitemap><loc>a</loc></sitemap>"
                        "<sitemap><loc>b</loc></sitemap></sitemapindex>"
                    ],
                    pa.string(),
                ),
            }
        )
        out = SitemapIndexStage()(t).to_pandas()
        assert out["host"].tolist() == ["h0", "h0"]
        assert out["child_loc"].tolist() == ["a", "b"]

    def test_urlset_stage_schema(self):
        t = pa.table(
            {
                "host": pa.array(["h0"], pa.string()),
                "xml": pa.array(
                    ["<urlset><url><loc>u</loc></url></urlset>"], pa.string()
                ),
            }
        )
        out = UrlsetStage()(t)
        assert out.schema.field("priority_tenths").type == pa.int64()
        assert out["url"].to_pylist() == ["u"]
