"""sitemap.xml source — the crawl-discovery input every web pipeline
consumes next to robots.txt (the reference's analogous discovery step
is its download-manifest walk, Download_Landsat/metadata listing).

Two document kinds, per sitemaps.org 0.9:

* **sitemapindex** — ``<sitemapindex><sitemap><loc>…`` pointing at
  child sitemaps;
* **urlset** — ``<urlset><url><loc>… <lastmod>… <changefreq>…
  <priority>…`` describing pages.

Parsing is stdlib ``xml.etree.ElementTree`` with namespace-lenient tag
matching (real sitemaps appear both with and without the 0.9 xmlns).
``<priority>`` (xs:decimal, 0.0–1.0) converts through ``Decimal`` to
exact tenths — never through float.

Distributed shape: index parse explodes to (host, child_loc) rows; the
"fetch" of child sitemaps is an equi-join against the stored child
table (``stages/joins.hash_join``) — index and child sets are both
O(hosts), tiny next to the page table, but the join keeps the plan
all-streaming: no driver-side sitemap walk.
"""

from __future__ import annotations

from decimal import Decimal
from xml.etree import ElementTree

import pyarrow as pa
import ray.data


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_index(xml: str) -> list[str]:
    """Child sitemap <loc> values of a <sitemapindex>, document order."""
    root = ElementTree.fromstring(xml)
    out = []
    for sm in root:
        if _local(sm.tag) != "sitemap":
            continue
        for el in sm:
            if _local(el.tag) == "loc" and el.text:
                out.append(el.text.strip())
    return out


def parse_urlset(xml: str) -> list[dict]:
    """<url> entries of a <urlset>: dicts with loc (required), lastmod,
    changefreq (None when absent) and priority_tenths (int64, exact
    Decimal tenths; None when absent)."""
    root = ElementTree.fromstring(xml)
    out = []
    for url in root:
        if _local(url.tag) != "url":
            continue
        entry = {
            "loc": None,
            "lastmod": None,
            "changefreq": None,
            "priority_tenths": None,
        }
        for el in url:
            name = _local(el.tag)
            text = el.text.strip() if el.text else ""
            if name == "loc":
                entry["loc"] = text
            elif name in ("lastmod", "changefreq"):
                entry[name] = text or None
            elif name == "priority" and text:
                entry["priority_tenths"] = int(Decimal(text) * 10)
        if entry["loc"] is not None:
            out.append(entry)
    return out


class SitemapIndexStage:
    """(host, xml) index rows → (host, child_loc) rows."""

    def __init__(self, xml_col: str = "xml", host_col: str = "host"):
        self.xml_col = xml_col
        self.host_col = host_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch[self.host_col].to_pylist()
        out_h, out_loc = [], []
        for h, xml in zip(hosts, batch[self.xml_col].to_pylist()):
            for loc in parse_sitemap_index(xml):
                out_h.append(h)
                out_loc.append(loc)
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "child_loc": pa.array(out_loc, pa.string()),
            }
        )


class UrlsetStage:
    """(host, xml) child rows → one row per <url> entry."""

    def __init__(self, xml_col: str = "xml", host_col: str = "host"):
        self.xml_col = xml_col
        self.host_col = host_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch[self.host_col].to_pylist()
        out = {
            "host": [],
            "url": [],
            "lastmod": [],
            "changefreq": [],
            "priority_tenths": [],
        }
        for h, xml in zip(hosts, batch[self.xml_col].to_pylist()):
            for e in parse_urlset(xml):
                out["host"].append(h)
                out["url"].append(e["loc"])
                out["lastmod"].append(e["lastmod"])
                out["changefreq"].append(e["changefreq"])
                out["priority_tenths"].append(e["priority_tenths"])
        return pa.table(
            {
                "host": pa.array(out["host"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "lastmod": pa.array(out["lastmod"], pa.string()),
                "changefreq": pa.array(out["changefreq"], pa.string()),
                "priority_tenths": pa.array(
                    out["priority_tenths"], pa.int64()
                ),
            }
        )


def sitemap_urls(
    index_ds: ray.data.Dataset,
    children_ds: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Full discovery plan: parse index rows → join child sitemaps on
    their loc (the streaming "fetch") → parse urlsets. ``index_ds``
    has (host, xml); ``children_ds`` has (loc, xml)."""
    from gis_scripts_ray.stages.joins import hash_join

    # The parsers are stateless: task-based stages (they fuse with the
    # generators and the join's map sides), not actor pools.
    refs = index_ds.map_batches(SitemapIndexStage(), batch_format="pyarrow")
    fetched = hash_join(
        refs,
        children_ds.map_batches(
            lambda b: pa.table({"child_loc": b["loc"], "xml": b["xml"]}),
            batch_format="pyarrow",
        ),
        on="child_loc",
        num_partitions=num_partitions,
    )
    return fetched.map_batches(UrlsetStage(), batch_format="pyarrow")
