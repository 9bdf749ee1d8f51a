"""Dense tile-grid kernels: weighted bilinear sampling + nodata-aware smooth.

The reference's local histogram matching operates on a small dense block
map (``local_match.py:294-296``: ``(M, N, bands)`` means + count mask).
These kernels re-express its grid math:

* :func:`weighted_bilinear` — NaN/nodata-aware bilinear interpolation
  (``local_match.py:396-426`` ``weighted_bilinear_interpolation``):
  interpolate ``value*mask`` and ``mask`` separately, divide.
* :func:`smooth_grid` — normalized Gaussian convolution
  (``local_match.py:636-671`` ``smooth_array``): blur(value*mask)/blur(mask).

Grids here are tiny (O(100) cells per source — ``auto_mosaic.py:111``
``target_blocks_per_image=100``), so they are computed as distributed
aggregates, collected, and broadcast back to workers; the per-ROW sampling
(millions of rows) is the vectorized hot path.
"""

from __future__ import annotations

import numpy as np


def weighted_bilinear(
    grid: np.ndarray, mask: np.ndarray, fx: np.ndarray, fy: np.ndarray
) -> np.ndarray:
    """Sample ``grid`` at fractional coordinates with validity weighting.

    ``grid``: (H, W) float64; ``mask``: (H, W) float64 in [0, 1] (0 =
    nodata); ``fx``/``fy``: per-row fractional column/row coordinates.
    Cells outside the grid contribute weight 0. Returns NaN where all four
    neighbors are invalid.
    """
    grid = np.asarray(grid, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    h, w = grid.shape
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    num = np.zeros(len(fx), dtype=np.float64)
    den = np.zeros(len(fx), dtype=np.float64)
    for dy, dx, wgt in (
        (0, 0, (1 - tx) * (1 - ty)),
        (0, 1, tx * (1 - ty)),
        (1, 0, (1 - tx) * ty),
        (1, 1, tx * ty),
    ):
        xs = x0 + dx
        ys = y0 + dy
        inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        xs_c = np.clip(xs, 0, w - 1)
        ys_c = np.clip(ys, 0, h - 1)
        m = mask[ys_c, xs_c] * inb
        num += wgt * m * grid[ys_c, xs_c]
        den += wgt * m
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den == 0] = np.nan
    return out


def _gaussian_kernel(sigma: float) -> np.ndarray:
    r = max(int(np.ceil(3 * sigma)), 1)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def smooth_grid(grid: np.ndarray, mask: np.ndarray, sigma: float) -> np.ndarray:
    """Nodata-aware Gaussian smoothing: blur(v*m)/blur(m), separable."""
    grid = np.where(mask > 0, grid, 0.0)
    k = _gaussian_kernel(sigma)

    def blur(a: np.ndarray) -> np.ndarray:
        tmp = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, a)
        return np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, tmp)

    num = blur(grid * mask)
    den = blur(mask.astype(np.float64))
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den == 0] = np.nan
    return out


def connected_components(
    cells_x: np.ndarray, cells_y: np.ndarray, connectivity: int = 4
) -> np.ndarray:
    """Label connected components of a sparse cell set (M3 analog:
    ``replace_band_consistant_values_with_value.py`` uses
    ``scipy.ndimage.label``; no scipy here, so union-find over the sparse
    occupied cells). Returns a label per input cell (0-based, arbitrary but
    deterministic ordering by first occurrence in sorted (x, y) order).
    """
    cells_x = np.asarray(cells_x, dtype=np.int64)
    cells_y = np.asarray(cells_y, dtype=np.int64)
    n = len(cells_x)
    order = np.lexsort((cells_y, cells_x))
    index = {(int(cells_x[i]), int(cells_y[i])): i for i in order}
    parent = np.arange(n, dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    neigh = [(1, 0), (0, 1)] if connectivity == 4 else [(1, 0), (0, 1), (1, 1), (1, -1)]
    for (x, y), i in index.items():
        for dx, dy in neigh:
            j = index.get((x + dx, y + dy))
            if j is not None:
                union(i, j)
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    # relabel roots to 0..k-1 by sorted (x, y) of root cells
    uniq = np.unique(roots)
    rank = {int(r): k for k, r in enumerate(sorted(uniq, key=lambda r: (cells_x[r], cells_y[r])))}
    return np.array([rank[int(r)] for r in roots], dtype=np.int64)
