"""Similarity search over embedding columns: brute-force + LSH-bucketed ANN.

Baseline: exact cosine top-k via per-batch numpy matmul against a broadcast
query matrix (the "dense scan" path — correct at any scale, O(rows x dim)).
Scale path: random-hyperplane LSH bucketing — probe only matching buckets,
the embedding analog of the hex-cell-ring kNN pruning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def _batch_cosine(batch: pa.Table, q: np.ndarray, emb_col: str) -> np.ndarray:
    emb = np.asarray(batch[emb_col].combine_chunks().flatten().to_numpy(), dtype=np.float64)
    m = emb.reshape(len(batch), -1)
    dots = m @ q
    norms = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(norms > 0, dots / norms, 0.0)


def cosine_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k: per-batch partial top-k, tiny global refine.

    Ties broken by ascending id. Returns (id, sim, rank).
    """
    q = np.asarray(query, dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        sims = _batch_cosine(batch, q, emb_col)
        ids = batch[id_col].to_numpy()
        # tie-complete deterministic partial: keep ALL rows at the threshold
        # similarity, then lexsort (-sim, id) — see knn.py for why a bare
        # argpartition is block-structure-dependent under ties
        neg = -sims
        if len(neg) > k:
            part = np.argpartition(neg, k - 1)
            thresh = neg[part[k - 1]]
            sel = np.nonzero(neg <= thresh)[0]
        else:
            sel = np.arange(len(neg))
        order = np.lexsort((ids[sel], neg[sel]))[:k]
        sel = sel[order]
        return pa.table(
            {
                id_col: pa.array(ids[sel], pa.int64()),
                "sim": pa.array(sims[sel], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    top = partials.sort(["sim", id_col], descending=[True, False]).limit(k).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return pa.Table.from_pandas(top, preserve_index=False)


class LshBucketer:
    """Random-hyperplane LSH: append a ``bucket`` column (load-once planes)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42, emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.emb_col = emb_col

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits.astype(np.int64) << np.arange(bits.shape[1], dtype=np.int64)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.asarray(
            batch[self.emb_col].combine_chunks().flatten().to_numpy(), dtype=np.float64
        ).reshape(len(batch), -1)
        return batch.append_column("bucket", pa.array(self.bucket_of(emb), pa.int64()))


def ann_lsh_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int,
    dim: int,
    n_planes: int = 12,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple[int, int] = 2,
) -> pa.Table:
    """Approximate top-k: scan only buckets within ``max_hamming`` bit flips
    of the query's bucket, then exact cosine refine. Recall < 1 by design;
    the candidate fraction is ~sum(C(n_planes, i))/2^n_planes.
    """
    bucketer = LshBucketer(dim, n_planes)
    qbucket = int(bucketer.bucket_of(np.asarray(query, dtype=np.float64).reshape(1, -1))[0])
    # all buckets within max_hamming flips
    cand = [qbucket]
    if max_hamming >= 1:
        cand += [qbucket ^ (1 << i) for i in range(n_planes)]
    if max_hamming >= 2:
        cand += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    cand_arr = pa.array(cand, pa.int64())

    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "emb_col": emb_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )

    def in_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["bucket"], value_set=cand_arr))

    filtered = bucketed.map_batches(in_buckets, batch_format="pyarrow")
    return cosine_topk(filtered, query, k, id_col, emb_col)
