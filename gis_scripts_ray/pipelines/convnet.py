"""Distributed CONVOLUTIONAL classifier over image tensors (T1, full shape).

The reference's T1 trains a Keras DCNN on image blocks
(``external/.../seagrass_lib.py:576-694``: two conv layers, dense
softmax head, epochs of batched gradient descent, then block
inference). Rounds 1-3 covered the distributed-training plumbing with a
softmax-regression analog (``pipelines/train.py``); this module closes
the remaining architecture gap with a REAL convolutional network in
pure numpy — no DL framework exists in this environment, and none is
needed for a 2-conv net:

* model: conv 3x3 (valid) -> ReLU -> conv 3x3 (valid) -> ReLU ->
  global average pool -> dense softmax. Forward is one
  ``sliding_window_view`` im2col + tensordot per layer; backward is the
  exact analytic gradient (verified against central finite differences
  to 1e-7 in tests/test_convnet.py).
* distributed shape: identical to ``train.train_logreg`` — each epoch,
  every block computes its exact gradient partial in one
  ``map_batches`` pass (parameters broadcast as ONE flat float64
  vector), the O(model-size x blocks) partials sum at the driver, and
  the deterministic update broadcasts back. Rows never move.
* determinism: seeded init, fixed epochs/learning rate, full-batch GD.
  The only nondeterminism is float addition order across block
  partials (last-ulp), absorbed by the integer confusion counts
  downstream (same contract as train.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from gis_scripts_ray.state.broadcast import worker_broadcast


class ConvNet:
    """2-conv + GAP + softmax classifier with analytic gradients.

    Shapes (valid convolutions, 3x3 kernels): input (n, h, w, 1) ->
    conv1 (n, h-2, w-2, c1) -> conv2 (n, h-4, w-4, c2) -> GAP (n, c2)
    -> dense (n, k). Parameters pack into one flat float64 vector for
    broadcast / gradient-partial shipping.
    """

    def __init__(self, h: int = 8, w: int = 8, c1: int = 8, c2: int = 16,
                 n_classes: int = 4, seed: int = 7):
        self.h, self.w, self.c1, self.c2, self.k = h, w, c1, c2, n_classes
        self.shapes = [
            (3, 3, 1, c1), (c1,),
            (3, 3, c1, c2), (c2,),
            (c2, n_classes), (n_classes,),
        ]
        rng = np.random.default_rng(seed)
        scale = [0.3, 0.0, 0.15, 0.0, 0.3, 0.0]
        self.params = [
            rng.standard_normal(s) * sc if sc else np.zeros(s)
            for s, sc in zip(self.shapes, scale)
        ]

    # ---- flat packing (what actually travels) ---------------------------
    def pack(self, params: "list[np.ndarray] | None" = None) -> np.ndarray:
        return np.concatenate(
            [p.ravel() for p in (params if params is not None else self.params)]
        )

    def unpack(self, flat: np.ndarray) -> "list[np.ndarray]":
        out, pos = [], 0
        for s in self.shapes:
            n = int(np.prod(s))
            out.append(flat[pos : pos + n].reshape(s))
            pos += n
        return out

    # ---- kernels ---------------------------------------------------------
    @staticmethod
    def _im2col(x: np.ndarray) -> np.ndarray:
        """(n, h, w, c) -> (n, h-2, w-2, 3*3*c) for a 3x3 valid conv."""
        from numpy.lib.stride_tricks import sliding_window_view

        v = sliding_window_view(x, (3, 3), axis=(1, 2))  # (n,oh,ow,c,3,3)
        n, oh, ow = v.shape[:3]
        return np.ascontiguousarray(v.transpose(0, 1, 2, 4, 5, 3)).reshape(
            n, oh, ow, -1
        )

    def _forward(self, x: np.ndarray, params: "list[np.ndarray]"):
        w1, b1, w2, b2, wd, bd = params
        col1 = self._im2col(x)
        a1 = col1 @ w1.reshape(-1, self.c1) + b1
        r1 = np.maximum(a1, 0.0)
        col2 = self._im2col(r1)
        a2 = col2 @ w2.reshape(-1, self.c2) + b2
        r2 = np.maximum(a2, 0.0)
        pool = r2.mean(axis=(1, 2))
        logits = pool @ wd + bd
        return col1, a1, r1, col2, a2, r2, pool, logits

    def logits(self, x: np.ndarray, flat: np.ndarray) -> np.ndarray:
        return self._forward(x, self.unpack(flat))[-1]

    def loss_grad(
        self, x: np.ndarray, y: np.ndarray, flat: np.ndarray
    ) -> "tuple[float, np.ndarray]":
        """(summed cross-entropy loss, flat SUMMED gradient) for a batch —
        partials are sums, so block contributions fold exactly."""
        params = self.unpack(flat)
        w1, b1, w2, b2, wd, bd = params
        col1, a1, r1, col2, a2, r2, pool, logits = self._forward(x, params)
        n = len(x)
        z = logits - logits.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        loss = float(-(z[np.arange(n), y] - np.log(e.sum(axis=1))).sum())
        dlog = p
        dlog[np.arange(n), y] -= 1.0  # (n, k), summed-loss gradient
        dwd = pool.T @ dlog
        dbd = dlog.sum(axis=0)
        dpool = dlog @ wd.T  # (n, c2)
        oh2, ow2 = r2.shape[1], r2.shape[2]
        dr2 = np.broadcast_to(
            dpool[:, None, None, :] / (oh2 * ow2), r2.shape
        ) * (a2 > 0)
        dw2 = np.tensordot(col2, dr2, axes=([0, 1, 2], [0, 1, 2]))
        db2 = dr2.sum(axis=(0, 1, 2))
        dcol2 = dr2 @ w2.reshape(-1, self.c2).T  # (n, oh2, ow2, 9*c1)
        dr1 = np.zeros_like(r1)
        dc2 = dcol2.reshape(n, oh2, ow2, 3, 3, self.c1)
        for i in range(3):
            for j in range(3):
                dr1[:, i : i + oh2, j : j + ow2, :] += dc2[:, :, :, i, j, :]
        da1 = dr1 * (a1 > 0)
        dw1 = np.tensordot(col1, da1, axes=([0, 1, 2], [0, 1, 2]))
        db1 = da1.sum(axis=(0, 1, 2))
        grads = [
            dw1.reshape(self.shapes[0]), db1,
            dw2.reshape(self.shapes[2]), db2,
            dwd, dbd,
        ]
        return loss, self.pack(grads)


def _images(batch: pa.Table, image_col: str, h: int, w: int) -> np.ndarray:
    """list/fixed_size_list<numeric>[h*w] column -> (n, h, w, 1) float64
    in [0, 1] (uint8 pixel payloads divide by 255)."""
    col = batch[image_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    m = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=np.float64)
    # scale by the SCHEMA (integer payload = pixel bytes), never by the
    # data — a data-dependent max() would scale an all-dark block
    # differently from its neighbors, making gradients depend on Ray
    # block boundaries
    if pa.types.is_integer(flat.type):
        m = m / 255.0
    return m.reshape(len(batch), h, w, 1)


def train_convnet(
    ds: ray.data.Dataset,
    image_col: str = "thumb",
    label_col: str = "label",
    h: int = 8,
    w: int = 8,
    n_classes: int = 4,
    epochs: int = 30,
    lr: float = 0.5,
    seed: int = 7,
) -> "tuple[ConvNet, np.ndarray]":
    """Distributed full-batch GD: per-block exact gradient partials ->
    driver combine -> broadcast (the train_logreg loop with a conv
    model). Shuffled payload per epoch is O(model size x blocks)."""
    net = ConvNet(h=h, w=w, n_classes=n_classes, seed=seed)
    flat = net.pack()

    for _ in range(epochs):
        ref = ray.put(flat)

        def grad_partial(batch: pa.Table, ref=None) -> pa.Table:
            f = worker_broadcast(ref)
            x = _images(batch, image_col, h, w)
            y = batch[label_col].to_numpy().astype(np.int64)
            loss, g = ConvNet(h=h, w=w, n_classes=n_classes, seed=seed).loss_grad(
                x, y, np.asarray(f, dtype=np.float64)
            )
            return pa.table(
                {
                    "g": pa.array([g], pa.list_(pa.float64())),
                    "loss": pa.array([loss], pa.float64()),
                    "n": pa.array([len(y)], pa.int64()),
                }
            )

        parts = ds.map_batches(
            grad_partial, fn_kwargs={"ref": ref}, batch_format="pyarrow"
        ).take_all()
        g = np.zeros_like(flat)
        n = 0
        for row in parts:
            g += np.asarray(row["g"], dtype=np.float64)
            n += int(row["n"])
        flat = flat - lr * g / max(n, 1)
    return net, flat


def predict_convnet(
    ds: ray.data.Dataset,
    net_kwargs: dict,
    flat: np.ndarray,
    image_col: str = "thumb",
    label_col: "str | None" = "label",
) -> ray.data.Dataset:
    """Broadcast conv inference: append ``pred`` (argmax class) — the
    DCNN block-classifier shape (seagrass_lib.py:696-761)."""
    ref = ray.put(np.asarray(flat, dtype=np.float64))
    h, w = net_kwargs.get("h", 8), net_kwargs.get("w", 8)

    def infer(batch: pa.Table, ref=None) -> pa.Table:
        f = worker_broadcast(ref)
        net = ConvNet(**net_kwargs)
        x = _images(batch, image_col, h, w)
        pred = np.argmax(net.logits(x, np.asarray(f)), axis=1).astype(np.int64)
        cols = {"pred": pa.array(pred, pa.int64())}
        if label_col:
            cols[label_col] = batch[label_col]
        return pa.table(cols)

    return ds.map_batches(infer, fn_kwargs={"ref": ref}, batch_format="pyarrow")
