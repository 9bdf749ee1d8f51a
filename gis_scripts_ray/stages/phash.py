"""Perceptual image fingerprinting (dHash) — near-duplicate IMAGE dedup.

The image-side sibling of the text near-dup stack (minhash/simhash): web
corpora carry the same picture re-encoded (BMP vs PNG vs GIF vs JPEG),
re-scaled, and brightness-shifted — byte hashes and ``pixel_sum`` split
those copies, a difference hash collapses them. dHash (the public
row-gradient perceptual hash: resize to 9x8 grayscale, bit = left pixel
brighter than its right neighbour) is fully integer/deterministic here:

* grayscale = channel integer mean ``//3`` (the ``_subsample_gray``
  convention in ``stages/multimodal.py``);
* downscale = BOX MEAN with floor-index box edges (``k*H//8``) and exact
  integer ``sum // area`` per box — a 2D cumulative-sum kernel, no
  floats, and the IDENTITY on native 9x8 inputs, so a 2x-upscaled
  rendition reproduces the original's hash bit-for-bit;
* the 64 bits pack little-endian by bit position ``r*8 + c`` into TWO
  int64 halves (each < 2^32) — BIGINT-safe on both engines (a single
  64-bit value can exceed signed int64, the uint64-wrap trap in
  CLAUDE.md's hash rules).

Reference parity note: the reference's imagery pipeline compares rasters
by exact array equality after GDAL decode (``seagrass_lib.py:244-314``);
perceptual grouping is one of the beyond-reference LLM-corpus operators
(image dedup for training-data pipelines).

Decoding is REAL (the pure-numpy bmp/ppm/png/gif/jpeg readers in
``stages/multimodal.py``); malformed payloads are flagged (hash halves
-1, ``phash_ok`` false), never dropped — the quarantine convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DHASH_H = 8  # rows of the hash grid
DHASH_W = 9  # columns sampled (8 horizontal gradients per row)


def box_mean_gray(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact integer box-mean downscale: output cell (i, j) = floor mean
    of input box ``[i*H//out_h, (i+1)*H//out_h) x [j*W//out_w, ...)``.

    Floor-index edges make every input pixel belong to exactly one box
    (areas differ by at most one row/column when sizes don't divide);
    the 2D cumsum keeps it one vectorized pass. Identity when the input
    is already (out_h, out_w). Raises ValueError when the input is
    smaller than the target (a box would be empty)."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        raise ValueError(f"image {h}x{w} smaller than hash grid {out_h}x{out_w}")
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    c = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(gray.astype(np.int64), axis=0), axis=1, out=c[1:, 1:])
    s = c[ys][:, xs]
    box = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return box // area


def dhash_halves(gray: np.ndarray) -> tuple[int, int]:
    """(lo, hi) int64 halves of the 64-bit dHash of ANY grayscale image:
    box-mean to 8x9, bit ``r*8 + c`` set iff ``g[r, c] > g[r, c+1]``."""
    g = box_mean_gray(gray, DHASH_H, DHASH_W)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
    val = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return val & 0xFFFFFFFF, val >> 32


def dhash_images(
    ds: ray.data.Dataset,
    payload_col: str = "html",
    keep_cols: tuple = ("doc_id",),
) -> ray.data.Dataset:
    """Fused task stage: binary payload -> REAL decode -> integer-mean
    grayscale -> dHash halves. Output: ``keep_cols`` +
    ``dhash_lo:int64, dhash_hi:int64, phash_ok:bool`` (malformed or
    undecodable payloads flagged -1/-1/false, never dropped)."""
    from gis_scripts_ray.stages.multimodal import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_ppm,
        sniff_type,
    )

    decoders = {
        "bmp": decode_bmp,
        "ppm": decode_ppm,
        "png": decode_png,
        "gif": decode_gif,
        "jpeg": decode_jpeg,
    }

    def per_batch(batch: pa.Table) -> pa.Table:
        payloads = batch[payload_col].to_pylist()
        lo = np.full(len(payloads), -1, dtype=np.int64)
        hi = np.full(len(payloads), -1, dtype=np.int64)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            p = p or b""
            dec = decoders.get(sniff_type(p))
            if dec is None:
                continue
            try:
                rgb = dec(p)
                gray = (
                    rgb[:, :, 0].astype(np.uint16)
                    + rgb[:, :, 1].astype(np.uint16)
                    + rgb[:, :, 2].astype(np.uint16)
                ) // 3
                lo[i], hi[i] = dhash_halves(gray)
                ok[i] = True
            except (ValueError, NotImplementedError):
                pass  # flagged row; quarantine convention
        cols = {c: batch[c] for c in keep_cols}
        cols["dhash_lo"] = pa.array(lo, pa.int64())
        cols["dhash_hi"] = pa.array(hi, pa.int64())
        cols["phash_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")
