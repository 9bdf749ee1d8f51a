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


# task-based bucketer with worker-cached planes (deterministic in the
# seed — every worker builds identical state; no actor spawn, fuses)
_WORKER_BUCKETERS: dict = {}


def add_lsh_bucket(
    batch: pa.Table, dim: int, n_planes: int = 12, seed: int = 42, emb_col: str = "embedding"
) -> pa.Table:
    key = (dim, n_planes, seed, emb_col)
    b = _WORKER_BUCKETERS.get(key)
    if b is None:
        b = LshBucketer(dim, n_planes, seed, emb_col)
        _WORKER_BUCKETERS[key] = b
    return b(batch)


def build_lsh_index(
    ds: ray.data.Dataset,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Bucketize ONCE and materialize — the persisted ANN index.

    Build cost is paid once; every :func:`ann_query` after that filters on
    the existing ``bucket`` column (a column-pruned scan of ~candidate
    fraction of the data). At 100 TB, write this out partitioned by
    bucket (``state.checkpoint.write_partitioned_resumable`` with the
    bucket as the key) so a probe reads ONLY matching partitions.
    """
    return ds.map_batches(
        add_lsh_bucket,
        fn_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed, "emb_col": emb_col},
        batch_format="pyarrow",
    ).materialize()


def _probe_buckets(qbucket: int, n_planes: int, max_hamming: int) -> list[int]:
    cand = [qbucket]
    if max_hamming >= 1:
        cand += [qbucket ^ (1 << i) for i in range(n_planes)]
    if max_hamming >= 2:
        cand += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return cand


def ann_query(
    index: ray.data.Dataset,
    query: np.ndarray,
    k: int,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Probe a :func:`build_lsh_index` dataset: scan only buckets within
    ``max_hamming`` bit flips of the query's bucket, then exact cosine
    refine. Recall < 1 by design; the candidate fraction is
    ~sum(C(n_planes, i))/2^n_planes."""
    bucketer = LshBucketer(dim, n_planes, seed, emb_col)
    qbucket = int(
        bucketer.bucket_of(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    )
    cand_arr = pa.array(_probe_buckets(qbucket, n_planes, max_hamming), pa.int64())

    def in_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["bucket"], value_set=cand_arr))

    filtered = index.map_batches(in_buckets, batch_format="pyarrow")
    return cosine_topk(filtered, query, k, id_col, emb_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-bucketed scale path named in the
# brief alongside LSH. Same engine shapes as everything else: centroid
# fitting is per-batch partial sums + driver combine + broadcast (the
# distributed-training loop of pipelines/train.py), assignment and probing
# are broadcast map_batches.
# ---------------------------------------------------------------------------


def kmeans_fit(
    ds: ray.data.Dataset,
    dim: int,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed k-means on normalized vectors.

    Init = the vectors of the ``k`` smallest ids (order-free, seedless);
    each iteration ships one (k, dim) sum + (k,) count partial per block.
    Empty clusters keep their previous centroid. Returns (k, dim)
    L2-normalized centroids.
    """
    import ray as _ray

    from gis_scripts_ray.state.broadcast import worker_broadcast

    seed_rows = ds.sort(id_col).limit(k).to_pandas()
    cents = np.array(seed_rows[emb_col].to_list(), dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)

    for _ in range(iters):
        ref = _ray.put(cents)

        def partial(batch: pa.Table, ref=None) -> pa.Table:
            cc = worker_broadcast(ref)
            v = np.asarray(
                batch[emb_col].combine_chunks().flatten().to_numpy(), dtype=np.float64
            ).reshape(len(batch), -1)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
            assign = np.argmax(vn @ cc.T, axis=1)
            sums = np.zeros_like(cc)
            np.add.at(sums, assign, vn)
            counts = np.bincount(assign, minlength=len(cc)).astype(np.int64)
            return pa.table(
                {
                    "s": pa.array([sums.ravel()], pa.list_(pa.float64())),
                    "c": pa.array([counts], pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(
            partial, fn_kwargs={"ref": ref}, batch_format="pyarrow"
        ).take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in rows:
            sums += np.asarray(r["s"], dtype=np.float64).reshape(cents.shape)
            counts += np.asarray(r["c"], dtype=np.int64)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-300)
        cents = new
    return cents


def build_ivf_index(
    ds: ray.data.Dataset,
    dim: int,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Fit centroids, assign every vector its ``ivf_bucket``, materialize.

    Build once; :func:`ivf_query` probes only the ``nprobe`` nearest
    buckets. At 100 TB write the index partitioned by bucket
    (``write_partitioned_resumable``) so probes read only matching
    partitions — the same persistence story as the LSH index.
    """
    import ray as _ray

    from gis_scripts_ray.state.broadcast import worker_broadcast

    cents = kmeans_fit(ds, dim, k, iters, id_col, emb_col)
    ref = _ray.put(cents)

    def assign(batch: pa.Table, ref=None) -> pa.Table:
        cc = worker_broadcast(ref)
        v = np.asarray(
            batch[emb_col].combine_chunks().flatten().to_numpy(), dtype=np.float64
        ).reshape(len(batch), -1)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        b = np.argmax(vn @ cc.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_bucket", pa.array(b, pa.int64()))

    return (
        ds.map_batches(assign, fn_kwargs={"ref": ref}, batch_format="pyarrow").materialize(),
        cents,
    )


def ivf_query(
    index: ray.data.Dataset,
    centroids: np.ndarray,
    query: np.ndarray,
    topk: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Probe the ``nprobe`` nearest centroid buckets, exact cosine refine.

    Recall < 1 by design (candidate fraction ~ nprobe / k)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-300)
    order = np.argsort(-(centroids @ qn), kind="stable")[:nprobe]
    probe = pa.array(order.astype(np.int64), pa.int64())

    def in_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["ivf_bucket"], value_set=probe))

    return cosine_topk(
        index.map_batches(in_buckets, batch_format="pyarrow"), q, topk, id_col, emb_col
    )


def ann_lsh_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int,
    dim: int,
    n_planes: int = 12,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=None,
) -> pa.Table:
    """One-shot convenience: build the index, run one query. For repeated
    queries build the index once (:func:`build_lsh_index`) and call
    :func:`ann_query` per probe — re-bucketing the corpus per query was
    round 1's anti-pattern. ``concurrency`` kept for compatibility."""
    index = build_lsh_index(ds, dim, n_planes, emb_col=emb_col)
    return ann_query(
        index, query, k, dim, n_planes, max_hamming=max_hamming,
        id_col=id_col, emb_col=emb_col,
    )
