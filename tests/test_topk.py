"""Per-group top-k: pandas-reference parity across block structures,
tie determinism, hot groups, k > group size."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.topk import topk_batch, topk_per_group


def _ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = (
        df.sort_values(["g", "v", "i"], ascending=[True, False, True], kind="mergesort")
        .groupby("g", sort=True)
        .head(k)
    )
    return out.sort_values(["g", "i"]).reset_index(drop=True)


def _run(df: pd.DataFrame, k: int, parts: int) -> pd.DataFrame:
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(df["g"], pa.int64()),
                "v": pa.array(df["v"], pa.int64()),
                "i": pa.array(df["i"], pa.int64()),
            }
        )
    ).repartition(parts)
    out = topk_per_group(ds, "g", "v", "i", k).to_pandas()
    return out.sort_values(["g", "i"]).reset_index(drop=True)[["g", "v", "i"]]


def _case(seed, n=30_000, n_groups=40, vmax=50):
    # vmax << n/n_groups forces heavy value ties — the block-structure
    # failure class the (value, id) tie rule exists for
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, n_groups, n),
            "v": rng.integers(0, vmax, n),
            "i": rng.permutation(n).astype(np.int64),
        }
    )


class TestTopkBatch:
    def test_matches_pandas_reference(self):
        df = _case(30, n=5000)
        got = (
            topk_batch(
                pa.table(
                    {
                        "g": pa.array(df["g"], pa.int64()),
                        "v": pa.array(df["v"], pa.int64()),
                        "i": pa.array(df["i"], pa.int64()),
                    }
                ),
                "g",
                "v",
                "i",
                5,
            )
            .to_pandas()
            .sort_values(["g", "i"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _ref(df, 5))

    def test_associative_refold(self):
        # folding two partials through the same kernel == one-shot
        df = _case(31, n=8000)
        t = pa.table(
            {
                "g": pa.array(df["g"], pa.int64()),
                "v": pa.array(df["v"], pa.int64()),
                "i": pa.array(df["i"], pa.int64()),
            }
        )
        whole = topk_batch(t, "g", "v", "i", 4).to_pandas()
        a = topk_batch(t.slice(0, 3000), "g", "v", "i", 4)
        b = topk_batch(t.slice(3000), "g", "v", "i", 4)
        refold = topk_batch(pa.concat_tables([a, b]), "g", "v", "i", 4).to_pandas()
        pd.testing.assert_frame_equal(
            whole.sort_values(["g", "i"]).reset_index(drop=True),
            refold.sort_values(["g", "i"]).reset_index(drop=True),
        )


class TestTopkPerGroup:
    @pytest.mark.parametrize("parts", [1, 9])
    def test_matches_reference_with_ties(self, ray_session, parts):
        df = _case(32)
        pd.testing.assert_frame_equal(_run(df, 3, parts), _ref(df, 3))

    def test_hot_group(self, ray_session):
        df = _case(33, n=20_000, n_groups=50)
        df.loc[: int(0.8 * len(df)), "g"] = 7  # 80% of rows in one group
        pd.testing.assert_frame_equal(_run(df, 5, 11), _ref(df, 5))

    def test_k_exceeds_group_size(self, ray_session):
        df = pd.DataFrame(
            {
                "g": np.array([0, 0, 1], dtype=np.int64),
                "v": np.array([5, 3, 9], dtype=np.int64),
                "i": np.array([1, 2, 3], dtype=np.int64),
            }
        )
        pd.testing.assert_frame_equal(_run(df, 10, 2), _ref(df, 10))
