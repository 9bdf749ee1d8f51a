"""Sequence packing (stages/packing.py): distributed ordered prefix sum."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.packing import sequence_packing, sequence_packing_rows


def _texts(n=200, seed=3):
    rng = np.random.default_rng(seed)
    return [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(1, 40)))
        for _ in range(n)
    ]


def _run(ray_session, texts, ids=None, window=64, **kw):
    import ray

    ids = np.arange(len(texts)) if ids is None else np.asarray(ids)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    df = (
        sequence_packing(ds, window=window, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return list(zip(df["n_tokens"], df["pack_id"], df["pack_offset"]))


class TestSequencePacking:
    def test_matches_python_reference(self, ray_session):
        texts = _texts()
        assert _run(ray_session, texts, window=64) == sequence_packing_rows(
            texts, 64
        )

    def test_sparse_nonzero_ids(self, ray_session):
        # ids with gaps and a nonzero start: order semantics, not density
        texts = _texts(50, seed=9)
        ids = 1000 + np.cumsum(np.arange(50) % 7 + 1)
        got = _run(ray_session, texts, ids=ids, window=32)
        assert got == sequence_packing_rows(texts, 32)

    def test_bucket_count_invariance(self, ray_session):
        texts = _texts(80, seed=5)
        a = _run(ray_session, texts, window=50, n_buckets=3)
        b = _run(ray_session, texts, window=50, n_buckets=64)
        assert a == b == sequence_packing_rows(texts, 50)

    def test_pack_boundary_exact(self, ray_session):
        # 10-token docs into 25-token windows: doc k starts at 10k
        texts = [" ".join(["x"] * 10) for _ in range(6)]
        got = _run(ray_session, texts, window=25)
        assert got == [
            (10, 0, 0), (10, 0, 10), (10, 0, 20),
            (10, 1, 5), (10, 1, 15), (10, 2, 0),
        ]

    def test_empty_and_null_text(self, ray_session):
        import ray

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["", None, "a b"], pa.string()),
            }
        )
        df = (
            sequence_packing(ray.data.from_arrow(t).repartition(2), window=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # "" and null both count 1 token (the string_split('') convention)
        assert df["n_tokens"].tolist() == [1, 1, 2]
        assert df["pack_offset"].tolist() == [0, 1, 2]

    def test_empty_dataset(self, ray_session):
        import ray

        t = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        out = sequence_packing(ray.data.from_arrow(t), window=8)
        assert out.count() == 0
        assert set(out.schema().names) == {
            "doc_id", "n_tokens", "pack_id", "pack_offset",
        }
