"""Distributed cardinality sketch: HyperLogLog over a Dataset column.

The 100-TB way to count distincts: an exact COUNT DISTINCT is an
all-to-all shuffle of every distinct key, while an HLL sketch reduces each
block to a fixed 2^p-byte register array (a ``map_batches`` partial),
merged by elementwise max — associative, commutative, and
block-structure-independent, so the result is DETERMINISTIC for a given
hash seed regardless of how Ray splits the input. Estimator follows the
public HyperLogLog formulation (Flajolet, Fusy, Gandouet, Meunier 2007)
with the standard linear-counting small-range correction.

The reference has no sketch layer (its distinct counts are in-memory
``np.unique`` passes, e.g. zonal class rollups); this is one of the
beyond-the-reference LLM-pipeline operators the engine adds for corpus
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (binary-search
    halving — float ``log2`` is NOT exact near powers of two: 2^64-1
    rounds up to 2^64 in float64 and misreports the leading bit)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(s)
        nz = y != 0
        n[nz] -= s
        x[nz] = y[nz]
    n[x != 0] -= 1
    return n


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8[2^p]) for a batch of 64-bit hashes.

    Register index = top ``p`` bits; rank = 1 + leading zeros of the
    remaining ``64-p`` bits (capped at 64-p+1 when they are all zero).
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # low 64-p bits moved to the top
    rank = np.where(w == 0, 64 - p + 1, _clz64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise max — the associative/commutative combine."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard alpha_m for m >= 128
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


def _hash_tokens(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit hashes of every space-separated token of every text (polars
    xxhash, fixed seed — the same stable word-hash family the MinHash
    stage uses). Tokenization is ``split(' ')`` with empties kept, the
    exact semantics of DuckDB ``string_split(text, ' ')``."""
    import polars as pl

    s = pl.from_arrow(texts)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    flat = s.fill_null("").str.split(" ").explode()
    return flat.hash(seed=11).to_numpy().astype(np.uint64)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit value hashes of a (scalar) column — polars xxhash, fixed
    seed, any hashable dtype (ints, floats, strings)."""
    import polars as pl

    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return s.hash(seed=11).to_numpy().astype(np.uint64)


def _hll_sketch(
    ds: ray.data.Dataset, hasher, p: int
) -> tuple[float, np.ndarray]:
    """(estimate, merged registers) — one fused streaming pass, each block
    reduced to one 2^p-byte register row; the combine is a bounded fold
    (registers are fixed-size, so even 10^6 blocks merge in MBs,
    tree-folded)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(hasher(batch), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        mat = np.frombuffer(b"".join(batch["regs"].to_pylist()), dtype=np.uint8)
        merged = mat.reshape(-1, 1 << p).max(axis=0)
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    folded = (
        partials.repartition(max(1, partials.num_blocks() // 8))
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    out = folded.take_all()
    regs = np.frombuffer(out[0]["regs"], dtype=np.uint8).copy()
    return hll_estimate(regs), regs


def approx_distinct_tokens(
    ds: ray.data.Dataset, text_col: str = "text", p: int = 12
) -> tuple[float, np.ndarray]:
    """Distinct-token cardinality sketch of a text column (tokens =
    ``split(' ')`` with empties kept, DuckDB ``string_split`` semantics)."""
    return _hll_sketch(ds, lambda b: _hash_tokens(b[text_col]), p)


def approx_distinct_column(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> tuple[float, np.ndarray]:
    """Distinct-value cardinality sketch of a scalar column."""
    return _hll_sketch(ds, lambda b: _hash_column(b[col]), p)


def exact_distinct_column(ds: ray.data.Dataset, col: str) -> int:
    """Exact distinct count of a scalar column: per-block distinct (the
    shuffle carries each block's distinct values once, not every row),
    adaptive combine, then a count — the exact companion the sketch's
    accuracy flag is checked against."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        return pa.table(
            {col: out[col], "n": pa.array(np.ones(len(out), dtype=np.int64))}
        )

    combined = coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [col], ["n"]
    )
    return combined.count()


def exact_distinct_tokens(ds: ray.data.Dataset, text_col: str = "text") -> int:
    """Exact distinct-token count: per-block distinct (tokens unique-ized
    BEFORE the shuffle, so the all-to-all carries each block's vocabulary
    once, not every occurrence), then the adaptive combine + a count.
    Tokenization matches :func:`_hash_tokens` / DuckDB
    ``string_split(text, ' ')`` exactly (empties kept)."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch[text_col], " "))
        t = pa.table({"token": toks})
        out = t.group_by(["token"]).aggregate([([], "count_all")])
        return pa.table(
            {"token": out["token"], "n": pa.array(np.ones(len(out), dtype=np.int64))}
        )

    combined = coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], ["n"]
    )
    return combined.count()
