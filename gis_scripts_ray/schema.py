"""Canonical Arrow schemas for the engine's logical tables.

The primary fact table is the Common-Crawl-style ``web_pages`` table from
``BASELINE.json`` ``input_hint``; the polygon side layer follows FIXTURES.md
F2. Derived geo columns are produced by engine stages, never synthesized.
"""

from __future__ import annotations

import pyarrow as pa

WEB_PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# geo columns appended by the geocode + encode stages
GEO_DERIVED = pa.schema(
    [
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("hex_cell", pa.int64()),
        pa.field("s2_cell", pa.uint64()),
        pa.field("tile_x", pa.int64()),
        pa.field("tile_y", pa.int64()),
    ]
)

POLYGONS = pa.schema(
    [
        pa.field("polygon_id", pa.int64()),
        pa.field("class", pa.string()),
        pa.field("wkb", pa.binary()),
        pa.field("priority", pa.int32()),
    ]
)

HOST_GEO = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
    ]
)
