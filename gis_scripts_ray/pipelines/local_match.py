"""Local histogram matching: the reference's flagship composite, Ray-first.

Re-expression of ``raster/seamless_mosaic/local_match.py`` (SURVEY.md §3.1):

reference (sequential, per image):            engine (streaming):
  compute_distribution_map over all images      two_level_mean per tile
    -> (M,N,bands) ref block map                  -> tiny ref grid (driver)
  per image: local block map                    cell_mean per (tile, source)
  per pixel: fractional tile coords             per ROW: fractional tile
    -> bilinear M_ref / M_in surfaces              coords -> weighted
    -> gamma correct, offset-shift                 bilinear -> gamma
  gdal.Warp mosaic merge                        (rows already one table)

The grids are tiny (O(sources x 100) cells — ``auto_mosaic.py:111``), so
they are computed as distributed aggregates (two-level combine per A1
semantics), collected at the driver, optionally smoothed (M13), then
broadcast; the per-row sampling + gamma (millions of rows) runs as a
fused, stateless ``map_batches`` over zero-copy batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from gis_scripts_ray.functions.gridops import smooth_grid, weighted_bilinear
from gis_scripts_ray.stages.scalar import gamma_correct
from gis_scripts_ray.stages.tile_agg import cell_mean, two_level_mean


def _dense_grid(
    df, x_col: str, y_col: str, v_col: str
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(grid, mask, x0, y0) from a sparse per-tile table (driver-side, tiny)."""
    x = df[x_col].to_numpy().astype(np.int64)
    y = df[y_col].to_numpy().astype(np.int64)
    v = df[v_col].to_numpy().astype(np.float64)
    x0, y0 = int(x.min()), int(y.min())
    w, h = int(x.max()) - x0 + 1, int(y.max()) - y0 + 1
    grid = np.zeros((h, w), dtype=np.float64)
    mask = np.zeros((h, w), dtype=np.float64)
    grid[y - y0, x - x0] = v
    mask[y - y0, x - x0] = 1.0
    return grid, mask, x0, y0


def local_histogram_match(
    ds: ray.data.Dataset,
    value_col: str,
    source_col: str,
    tile_x_col: str = "tile_x",
    tile_y_col: str = "tile_y",
    frac_x_col: str = "frac_x",
    frac_y_col: str = "frac_y",
    smooth_sigma: float = 0.0,
) -> ray.data.Dataset:
    """Append ``<value_col>_matched``: per-row gamma correction toward the
    cross-source reference tile map.

    ``frac_x/frac_y`` are the row's fractional tile coordinates (tile index
    + in-tile fraction - 0.5, the reference's pixel->block mapping at
    ``local_match.py:873-879``); the integer tile columns key the
    aggregates.
    """
    # reference map: A1 two-level combine (per-source mean, then mean of
    # means — NOT the pooled mean; local_match.py:372-387). two_level_mean
    # keys on one column, so pack (tile_x, tile_y) first.
    def pack(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.add(
            pc.multiply(pc.cast(batch[tile_x_col], pa.int64()), 1_000_000),
            pc.cast(batch[tile_y_col], pa.int64()),
        )
        return batch.append_column("_tile_key", key)

    keyed = ds.map_batches(pack, batch_format="pyarrow")
    ref_tbl = two_level_mean(keyed, "_tile_key", source_col, value_col).to_pandas()
    ref_tbl[tile_x_col] = ref_tbl["_tile_key"] // 1_000_000
    ref_tbl[tile_y_col] = ref_tbl["_tile_key"] % 1_000_000
    ref_grid, ref_mask, x0, y0 = _dense_grid(
        ref_tbl, tile_x_col, tile_y_col, "mean_of_means"
    )
    # per-source local maps
    loc_tbl = cell_mean(ds, [tile_x_col, tile_y_col, source_col], [value_col]).to_pandas()
    if smooth_sigma > 0:
        ref_grid = np.nan_to_num(
            smooth_grid(ref_grid, ref_mask, smooth_sigma), nan=0.0
        )
    sources = sorted(loc_tbl[source_col].unique())
    loc_grids = {}
    for s in sources:
        sub = loc_tbl[loc_tbl[source_col] == s]
        g, m, sx0, sy0 = _dense_grid(sub, tile_x_col, tile_y_col, f"mean_{value_col}")
        if smooth_sigma > 0:
            g = np.nan_to_num(smooth_grid(g, m, smooth_sigma), nan=0.0)
        loc_grids[s] = (g, m, sx0, sy0)

    # the gamma offset-shift must come from the GLOBAL value min, not a
    # batch-local one (data-dependent per-batch shift made the output
    # block-structure-dependent when values <= 0 — the convnet _images
    # bug class); one narrow-column aggregate computes it
    from ray.data.aggregate import Min

    vmin_val = ds.aggregate(Min(value_col))[f"min({value_col})"]
    vmin = float(vmin_val) if vmin_val is not None else 0.0
    gshift = 1.0 - vmin if vmin <= 0 else 0.0

    state_ref = ray.put((ref_grid, ref_mask, x0, y0, loc_grids, gshift))

    class Matcher:
        def __init__(self, ref):
            (
                self.ref_grid,
                self.ref_mask,
                self.x0,
                self.y0,
                self.loc_grids,
                self.gshift,
            ) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            fx = batch[frac_x_col].to_numpy() - self.x0
            fy = batch[frac_y_col].to_numpy() - self.y0
            v = batch[value_col].to_numpy().astype(np.float64)
            m_ref = weighted_bilinear(self.ref_grid, self.ref_mask, fx, fy)
            m_in = np.full(len(v), np.nan)
            srcs = batch[source_col].to_pylist()
            src_arr = np.asarray(srcs, dtype=object)
            for s in np.unique(src_arr):
                g, m, sx0, sy0 = self.loc_grids[s]
                sel = src_arr == s
                m_in[sel] = weighted_bilinear(
                    g,
                    m,
                    batch[frac_x_col].to_numpy()[sel] - sx0,
                    batch[frac_y_col].to_numpy()[sel] - sy0,
                )
            ok = np.isfinite(m_ref) & np.isfinite(m_in) & (m_in > 0) & (m_ref > 0)
            out = v.copy()
            if ok.any():
                out[ok] = gamma_correct(
                    v[ok], m_ref[ok], m_in[ok], shift=self.gshift
                )
            return batch.append_column(
                f"{value_col}_matched", pa.array(out, pa.float64())
            )

    return keyed.map_batches(
        Matcher,
        fn_constructor_kwargs={"ref": state_ref},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    ).drop_columns(["_tile_key"])
