"""Pure-numpy 2-conv network (T1 conv closure): analytic-gradient
exactness, distributed == single-process GD, planted-pattern
generalization through the Ray path."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.pipelines.convnet import ConvNet, predict_convnet, train_convnet


def _planted(ids: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Deterministic 8x8 uint8 images: bright 2x2 blob in quadrant
    ``id % 4`` over integer-hash noise — no RNG state anywhere."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    p = np.arange(64, dtype=np.int64)
    noise = ((ids[:, None] * 2654435761 + p[None, :] * 40503) % 97) * 51 // 97
    imgs = noise.astype(np.uint8).reshape(n, 8, 8)
    labels = (ids % 4).astype(np.int64)
    corners = np.array([(0, 0), (0, 4), (4, 0), (4, 4)])
    for i in range(n):
        r, c = corners[labels[i]]
        imgs[i, r + 1 : r + 3, c + 1 : c + 3] = 230
    return imgs, labels


def _table(ids: np.ndarray) -> pa.Table:
    imgs, labels = _planted(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "thumb": pa.FixedSizeListArray.from_arrays(
                pa.array(imgs.reshape(-1), pa.uint8()), 64
            ),
            "label": pa.array(labels, pa.int64()),
        }
    )


class TestConvGradients:
    def test_matches_finite_differences(self):
        net = ConvNet(h=8, w=8, c1=4, c2=6, n_classes=3, seed=3)
        rng = np.random.default_rng(5)
        x = rng.random((4, 8, 8, 1))
        y = rng.integers(0, 3, 4)
        flat = net.pack()
        _, g = net.loss_grad(x, y, flat)
        eps = 1e-6
        for i in rng.choice(len(flat), 25, replace=False):
            fp = flat.copy(); fp[i] += eps
            fm = flat.copy(); fm[i] -= eps
            num = (net.loss_grad(x, y, fp)[0] - net.loss_grad(x, y, fm)[0]) / (2 * eps)
            assert abs(num - g[i]) / max(1.0, abs(num)) < 1e-6

    def test_block_partials_fold_exactly(self):
        """Summed-loss gradients are additive: grad(A+B) == grad(A)+grad(B)
        — the property the distributed partial sum relies on."""
        net = ConvNet(n_classes=4, seed=7)
        rng = np.random.default_rng(9)
        x = rng.random((10, 8, 8, 1))
        y = rng.integers(0, 4, 10)
        flat = net.pack()
        l_all, g_all = net.loss_grad(x, y, flat)
        l_a, g_a = net.loss_grad(x[:4], y[:4], flat)
        l_b, g_b = net.loss_grad(x[4:], y[4:], flat)
        assert abs((l_a + l_b) - l_all) < 1e-9
        np.testing.assert_allclose(g_a + g_b, g_all, rtol=1e-12, atol=1e-12)


class TestImageScaling:
    def test_scale_is_schema_not_data_dependent(self):
        """An all-near-black uint8 block must scale by 255 exactly like
        any other block — scaling may depend only on the payload TYPE,
        never on block contents (block-structure-dependence bug class)."""
        from gis_scripts_ray.pipelines.convnet import _images

        dark = np.ones(64, dtype=np.uint8)  # max()==1 -> old code skipped /255
        t = pa.table(
            {
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(dark, pa.uint8()), 64
                )
            }
        )
        out = _images(t, "thumb", 8, 8)
        np.testing.assert_allclose(out, 1.0 / 255.0)
        # float payloads in [0,1] pass through untouched
        tf = pa.table(
            {
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.full(64, 0.5), pa.float64()), 64
                )
            }
        )
        np.testing.assert_allclose(_images(tf, "thumb", 8, 8), 0.5)


class TestConvDistributed:
    def test_distributed_equals_single_process(self, ray_session):
        import ray.data

        ids = np.arange(160)
        t = _table(ids)
        imgs, labels = _planted(ids)
        x = imgs.astype(np.float64).reshape(-1, 8, 8, 1) / 255.0

        # single-process full-batch GD, same seed/epochs/lr
        net = ConvNet(n_classes=4, seed=7)
        flat_ref = net.pack()
        for _ in range(5):
            _, g = net.loss_grad(x, labels, flat_ref)
            flat_ref = flat_ref - 0.5 * g / len(x)

        ds = ray.data.from_arrow(t).repartition(4)
        _, flat_dist = train_convnet(ds, epochs=5, n_classes=4, seed=7)
        np.testing.assert_allclose(flat_dist, flat_ref, rtol=1e-9, atol=1e-12)

    def test_planted_pattern_generalizes(self, ray_session):
        import ray.data

        train_ids = np.arange(320)
        val_ids = np.arange(320, 480)
        ds = ray.data.from_arrow(_table(train_ids)).repartition(4)
        net, flat = train_convnet(ds, epochs=25, n_classes=4, seed=7)
        val = ray.data.from_arrow(_table(val_ids))
        scored = predict_convnet(
            val, {"n_classes": 4, "seed": 7}, flat
        ).to_pandas()
        acc = (scored["pred"] == scored["label"]).mean()
        assert acc > 0.9, acc
