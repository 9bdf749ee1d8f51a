"""Distributed classifier training over the embeddings table (T1 analog).

The reference trains a Keras DCNN on sampled pixels
(``external/.../seagrass_lib.py:591-694``: per-class sampling,
train/test split, epochs of batched gradient descent, then batched
inference). No deep-learning framework exists in this environment, so the
engine's analog keeps the distributed-training SHAPE with a numpy model:

* data-parallel FULL-BATCH gradient descent on multinomial logistic
  regression: each epoch, every block computes its exact gradient partial
  in a ``map_batches`` pass (softmax(XW) - Y, X^T-weighted, plus loss and
  count), the tiny (dim+1, classes) partials sum at the driver, and the
  deterministic update broadcasts back — the same
  compute-partials / combine / broadcast loop as every other stage;
* the train/val split is the deterministic hash-residue split
  (:func:`~gis_scripts_ray.stages.sampling.split_train_val`) — the
  reference's ``train_test_split`` without RNG state;
* inference is a stateless broadcast ``map_batches`` (the DCNN block
  classifier shape, ``seagrass_lib.py:696-761``).

Deterministic: zero init, fixed epochs/learning rate, no sampling. The
only nondeterminism is float addition order across gradient partials
(last-ulp), which the evaluation's integer confusion counts absorb.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from gis_scripts_ray.state.broadcast import worker_broadcast


def _features(batch: pa.Table, feature_col: str, dim: "int | None" = None) -> np.ndarray:
    # zero-copy flatten, not to_pylist: this runs per block per EPOCH in
    # the gradient hot path, and materializing every embedding as Python
    # lists is O(rows*dim) interpreter work
    from gis_scripts_ray.stages.similarity import _emb_matrix

    m = _emb_matrix(batch[feature_col], len(batch), dim=dim)
    # bias column
    return np.concatenate([m, np.ones((len(m), 1))], axis=1)


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def train_logreg(
    ds: ray.data.Dataset,
    feature_col: str = "embedding",
    label_col: str = "label",
    n_classes: int = 10,
    dim: int = 64,
    epochs: int = 40,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> np.ndarray:
    """(dim+1, n_classes) weights via distributed full-batch GD.

    Scale shape: the shuffled payload per epoch is one (dim+1, classes)
    float64 partial per block — O(model size x blocks), never O(rows).
    ``ds`` should be materialized by the caller if it is the output of an
    expensive pipeline (each epoch re-scans it).
    """
    w = np.zeros((dim + 1, n_classes), dtype=np.float64)

    for _ in range(epochs):
        w_ref = ray.put(w)

        def grad_partial(batch: pa.Table, ref=None) -> pa.Table:
            ww = worker_broadcast(ref)
            x = _features(batch, feature_col, dim=ww.shape[0] - 1)
            y = batch[label_col].to_numpy().astype(np.int64)
            p = _softmax(x @ ww)
            p[np.arange(len(y)), y] -= 1.0
            g = x.T @ p  # (dim+1, classes)
            return pa.table(
                {
                    "g": pa.array([g.ravel()], pa.list_(pa.float64())),
                    "n": pa.array([len(y)], pa.int64()),
                }
            )

        parts = ds.map_batches(
            grad_partial, fn_kwargs={"ref": w_ref}, batch_format="pyarrow"
        ).take_all()
        g = np.zeros_like(w)
        n = 0
        for row in parts:
            g += np.asarray(row["g"], dtype=np.float64).reshape(w.shape)
            n += int(row["n"])
        w = w - lr * (g / max(n, 1) + l2 * w)
    return w


def predict(
    ds: ray.data.Dataset,
    w: np.ndarray,
    feature_col: str = "embedding",
    label_col: str | None = "label",
) -> ray.data.Dataset:
    """Broadcast inference: append ``pred`` (argmax class)."""
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def infer(batch: pa.Table, ref=None) -> pa.Table:
        ww = worker_broadcast(ref)
        x = _features(batch, feature_col, dim=ww.shape[0] - 1)
        pred = np.argmax(x @ ww, axis=1).astype(np.int64)
        cols = {"pred": pa.array(pred, pa.int64())}
        if label_col:
            cols[label_col] = batch[label_col]
        return pa.table(cols)

    return ds.map_batches(infer, fn_kwargs={"ref": w_ref}, batch_format="pyarrow")


def train_eval(
    sf_dir: str,
    epochs: int = 40,
    val_pct: int = 20,
) -> pa.Table:
    """Full T1-analog pipeline: split -> distributed train -> val confusion
    rollup. Output: one row per true class, (label, n_correct, n_total).

    Note on the fixture: the driver-generated embeddings' ``label`` column
    carries no embedding signal (train-side class centroids predict the
    val split at chance — verified), so val accuracy here sits near
    chance BY CONSTRUCTION of the data; this pipeline checks the
    distributed training machinery end-to-end. Generalization is proven
    in tests/test_train.py on a planted deterministic label function
    (val accuracy > 0.75)."""
    from gis_scripts_ray.stages.sampling import split_train_val
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    train, val = split_train_val(emb, "vec_id", val_pct=val_pct)
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    w = train_logreg(train.materialize(), dim=dim, epochs=epochs)
    scored = predict(val, w)

    def prep(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy().astype(np.int64)
        pred = batch["pred"].to_numpy()
        return pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "correct": pa.array((lab == pred).astype(np.int64), pa.int64()),
            }
        )

    out = cell_sum_count(scored.map_batches(prep, batch_format="pyarrow"), ["label"], ["correct"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": batch["label"],
                "n_correct": batch["sum_correct"],
                "n_total": batch["n"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")
