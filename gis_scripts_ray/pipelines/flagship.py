"""Flagship pipeline: geocode -> cell-encode -> PIP join -> tile aggregate.

North-star composition over the Common-Crawl-style web-pages table:

    read web_pages
      -> select (drop `html` early — never shuffle wide binary)
      -> GeocodeBatcher actor pool (stateful host->latlon, broadcast table)
      -> cell encode (hex res R, s2 level L, slippy z) [stateless, zero-copy]
      -> PIP join vs broadcast STRtree polygon layer
      -> two-level tile aggregate (pre-agg per batch, small shuffle)

``text`` bytes are carried untouched through every stage; the audit column
``text_len`` (exact int) and the test-side sha256 comparison enforce the
per-row invariant from BASELINE.json.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from gis_scripts_ray.sources.polygons import synthesize_polygons
from gis_scripts_ray.sources.webpages import web_pages_from_documents
from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
from gis_scripts_ray.stages.pip_join import pip_join
from gis_scripts_ray.stages.tile_agg import cell_mean
from gis_scripts_ray.state.geocoder import GeocodeBatcher, host_geo_table


def geocode(
    ds: ray.data.Dataset,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    num_cpus: float = 0.5,
) -> ray.data.Dataset:
    """Geocoder stage (host-geo table broadcast once).

    Default (``concurrency=None``): fused stateless tasks with the resolver
    cached per worker process — load-once semantics, no actor spawn, full
    operator fusion. Pass a concurrency for the actor-pool variant (heavy
    state / strict pool sizing).
    """
    ref = ray.put(host_geo_table())
    if concurrency is None:
        from gis_scripts_ray.state.geocoder import geocode_batch

        return ds.map_batches(
            geocode_batch,
            fn_kwargs={"host_geo_ref": ref},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        GeocodeBatcher,
        fn_constructor_kwargs={"host_geo_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def flagship_joined(
    sf_dir: str,
    cfg: EncodeConfig | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """web_pages -> geocode -> encode -> PIP join rows (pre-aggregate).

    ``concurrency=None`` = fused task stages (default, fastest); pass a
    concurrency for the actor-pool variants."""
    cfg = cfg or EncodeConfig()
    pages = web_pages_from_documents(sf_dir)
    # prune: drop the wide binary column before any shuffle/stateful stage
    pages = pages.select_columns(["url", "warc_ts", "text", "lang"])
    located = geocode(pages, concurrency=concurrency)
    encoded = encode_cells(located, cfg)

    def add_text_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "text_len", pc.cast(pc.binary_length(batch["text"]), pa.int64())
        )

    encoded = encoded.map_batches(add_text_len, batch_format="pyarrow")
    return pip_join(
        encoded,
        synthesize_polygons(),
        carry_cols=[
            "url",
            "lang",
            "lat",
            "lon",
            "hex_cell",
            "s2_cell",
            "tile_x",
            "tile_y",
            "text_len",
            "text",
        ],
        concurrency=concurrency,
    )


def flagship(
    sf_dir: str,
    cfg: EncodeConfig | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Full flagship: PIP join rows -> per-(tile, class) document aggregates.

    Output: (tile_x, tile_y, class, mean_text_len, n) — one row per tile
    per land-cover class, exactly the reference's "per-tile aggregate rows"
    shape (SURVEY.md §1.2 block map).
    """
    joined = flagship_joined(sf_dir, cfg, concurrency)
    slim = joined.select_columns(["tile_x", "tile_y", "class", "text_len"])
    return cell_mean(slim, ["tile_x", "tile_y", "class"], ["text_len"])
