"""Int8 embedding quantization + integer-domain retrieval — the memory
path that makes 100-TB-scale ANN viable (4x smaller vectors, integer
SIMD dot products, exact reproducibility).

Quantization rule (chosen for CROSS-ENGINE bit-identity, not merely
accuracy): per-vector symmetric scaling with an explicit float64
operation order —

    m   = max(|v_i|)          (float64)
    q_i = floor((v_i * 127.0) / m)   (int8 range; m == 0 -> all zeros)

``floor`` is identical in numpy, DuckDB and Python (no half-even vs
half-away divergence — the np.round/SQL ROUND trap CLAUDE.md documents),
and the multiply-then-divide order is written identically on both
sides, so quantized vectors — and therefore every integer dot product
over them — hash-match the SQL twin exactly. Scores are int64
(|dot| <= dim * 127^2, exact in BIGINT and in float64).

Retrieval keeps the engine's top-k discipline: per-block partial top-k
with (score DESC, id ASC) tie-breaks INSIDE partials (the
block-structure-dependence bug class), query vector broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def quantize_matrix(v: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(n, d) float -> ((n, d) int8, (n,) float64 scales m/127).

    Bit-exact contract: float64 math, ``floor((v * 127.0) / m)``."""
    v = np.asarray(v, dtype=np.float64)
    m = np.abs(v).max(axis=1)
    safe = np.where(m == 0, 1.0, m)
    q = np.floor((v * 127.0) / safe[:, None])
    q[m == 0] = 0.0
    return q.astype(np.int8), m / 127.0


def quantize_row(vec: "list[float]") -> "list[int]":
    """Per-row reference for :func:`quantize_matrix` (parity contract)."""
    import math

    v = [float(np.float64(x)) for x in vec]
    m = max((abs(x) for x in v), default=0.0)
    if m == 0:
        return [0] * len(v)
    return [int(math.floor((x * 127.0) / m)) for x in v]


def quantize_embeddings(
    ds: ray.data.Dataset, emb_col: str = "embedding", id_col: str = "vec_id"
) -> ray.data.Dataset:
    """(id, qvec fixed_size_list<int8>, scale float64) — one fused pass."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(col[0]) if len(col) else 0
        v = np.asarray(col.flatten().to_numpy(zero_copy_only=False), np.float64)
        q, scale = quantize_matrix(v.reshape(len(batch), dim))
        return pa.table(
            {
                id_col: batch[id_col],
                "qvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(q.reshape(-1), pa.int8()), dim
                ),
                "scale": pa.array(scale, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quantized_topk(
    ds: ray.data.Dataset,
    query_q: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Top-k by INTEGER dot product against an int8 query vector:
    quantize each block, int32 matmul, per-block partial top-k with
    (score DESC, id ASC) ties, exact driver merge of k-row partials.
    Output: (vec_id, score) int64, sorted."""
    import ray

    qv = np.asarray(query_q, dtype=np.int32)
    ref = ray.put(qv)

    def partial(batch: pa.Table, ref=None) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        qq = worker_broadcast(ref)
        col = batch[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(qq)
        v = np.asarray(col.flatten().to_numpy(zero_copy_only=False), np.float64)
        q, _ = quantize_matrix(v.reshape(len(batch), dim))
        score = q.astype(np.int32) @ qq  # exact: |dot| <= dim * 127^2
        ids = batch[id_col].to_numpy().astype(np.int64)
        # (score DESC, id ASC) inside the partial — tie-break discipline
        order = np.lexsort((ids, -score.astype(np.int64)))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, fn_kwargs={"ref": ref}, batch_format="pyarrow")
    t = pa.concat_tables(
        [b for b in parts.iter_batches(batch_format="pyarrow")]
        or [pa.table({id_col: pa.array([], pa.int64()), "score": pa.array([], pa.int64())})]
    )
    ids = t[id_col].to_numpy()
    sc = t["score"].to_numpy()
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "score": pa.array(sc[order], pa.int64()),
        }
    )


def quantize_sql_expr(vec_expr: str) -> str:
    """DuckDB expression producing the identical int8 list for a FLOAT[]
    column expression — same float64 op order as :func:`quantize_matrix`."""
    v = f"list_transform({vec_expr}, x -> CAST(x AS DOUBLE))"
    m = f"list_aggregate(list_transform({v}, x -> abs(x)), 'max')"
    return (
        f"CASE WHEN {m} = 0 OR {m} IS NULL THEN list_transform({v}, x -> 0) "
        f"ELSE list_transform({v}, x -> CAST(floor((x * 127.0) / {m}) AS INTEGER)) END"
    )


def gram_matrix(
    ds: ray.data.Dataset, emb_col: str = "embedding", dim: "int | None" = None
) -> ray.data.Dataset:
    """Upper-triangle Gram matrix ``G = Q^T Q`` of the int8-quantized
    embedding stream, EXACT in int64 — the covariance-shaped statistic
    PCA / whitening / feature-correlation audits need over a corpus.

    Scale shape: each block contributes ONE ``dim x dim`` integer
    matmul (numpy int64 BLAS-free exact accumulate; |entry per block| <=
    rows * 127^2, and the int64 total holds ~5.7e14 rows at dim-wide
    127 extremes), emitted as triu (i, j, s) partial rows; the adaptive
    combine then folds ``blocks x dim(dim+1)/2`` tiny rows — the
    all-to-all never scales with the corpus, only with block count.
    Associativity is exact (integer sums), so the result is
    block-structure independent.

    Output: (i, j, s) for 0 <= i <= j < dim.
    """
    from gis_scripts_ray.stages.similarity import _emb_matrix
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def partial(batch: pa.Table) -> pa.Table:
        v = _emb_matrix(batch[emb_col], batch.num_rows, dim=dim)
        if v.shape[0] == 0:
            e = pa.array([], pa.int64())
            return pa.table({"i": e, "j": e, "s": e})
        q, _ = quantize_matrix(v)
        g = q.astype(np.int64).T @ q.astype(np.int64)
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "s": pa.array(g[iu, ju]),
            }
        )

    return coalesce_shuffle_agg(
        ds.map_batches(partial, batch_format="pyarrow"), ["i", "j"], {"s": "sum"}
    )
