"""Watermark / late-event replay (stages/watermark.py).

Pins: (1) the bucketed segmented exclusive-cummax plan against a
per-row Python brute force (the repo's vectorized-kernel parity rule),
(2) the hot-key arrival-range presplit plan byte-identical to the
plain plan including the measured auto-dispatch, (3) the (arr, tie)
ordering contract on colliding arrival stamps.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.watermark import _NEG, grouped_watermark_late

LATENESS = 40


def _fixture():
    rng = np.random.default_rng(41)
    n = 400
    key = rng.integers(0, 6, n).astype(np.int64)
    # arrival stamps drawn from a SMALL range so ties are guaranteed
    arr = rng.integers(0, 120, n).astype(np.int64)
    ts = rng.integers(0, 1000, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)  # unique tie-break
    return pa.table(
        {
            "k": pa.array(key),
            "arr": pa.array(arr),
            "ts": pa.array(ts),
            "eid": pa.array(eid),
        }
    )


def _brute(t: pa.Table, lateness: int) -> pd.DataFrame:
    """Per-row reference: scan each key's history in (arr, eid) order."""
    df = t.to_pandas()
    rows = []
    for k, g in df.groupby("k"):
        g = g.sort_values(["arr", "eid"])
        wm = int(_NEG)
        for r in g.itertuples():
            late = 1 if r.ts + lateness < wm else 0
            rows.append((k, r.arr, r.eid, r.ts, wm, late))
            wm = max(wm, int(r.ts))
    out = pd.DataFrame(rows, columns=["k", "arr", "eid", "ts", "wm", "late"])
    return (
        out.astype(np.int64).sort_values(["k", "eid"]).reset_index(drop=True)
    )


def _run(ds, **kw) -> pd.DataFrame:
    res = grouped_watermark_late(
        ds,
        key_col="k",
        arr_col="arr",
        ts_col="ts",
        lateness=LATENESS,
        tie_col="eid",
        **kw,
    )
    return (
        res.to_pandas()[["k", "arr", "eid", "ts", "wm", "late"]]
        .astype(np.int64)
        .sort_values(["k", "eid"])
        .reset_index(drop=True)
    )


class TestWatermark:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        t = _fixture()
        ds = ray.data.from_arrow(t).repartition(5)
        got = _run(ds, hot_key_limit=None)
        pd.testing.assert_frame_equal(got, _brute(t, LATENESS))
        # both branches of the late flag are exercised
        assert 0 < got["late"].sum() < len(got)

    def test_presplit_equivalent(self, ray_session):
        import ray.data

        t = _fixture()
        ds = ray.data.from_arrow(t).repartition(5)
        plain = _run(ds, hot_key_limit=None)
        # every key's ~67-row history exceeds the forced limit, so the
        # measured dispatch routes ALL keys through the presplit plan
        auto = _run(ds, hot_key_limit=10, n_ranges=8)
        pd.testing.assert_frame_equal(auto, plain)

    def test_tie_order_is_by_tie_col(self, ray_session):
        import ray.data

        # one key, all arrivals at the SAME stamp: watermark must build
        # in eid order (SQL ORDER BY arr, eid), so row i sees max ts of
        # rows 0..i-1
        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1], pa.int64()),
                "arr": pa.array([5, 5, 5, 5], pa.int64()),
                "ts": pa.array([100, 30, 200, 50], pa.int64()),
                "eid": pa.array([0, 1, 2, 3], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        got = _run(ds, hot_key_limit=None)
        assert got["wm"].tolist() == [int(_NEG), 100, 100, 200]
        assert got["late"].tolist() == [0, 1, 0, 1]

    def test_carry_and_sentinel_first_row(self, ray_session):
        import ray.data

        t = _fixture().append_column(
            "tag", pa.array((np.arange(400) % 3).astype(np.int64))
        )
        ds = ray.data.from_arrow(t).repartition(3)
        res = grouped_watermark_late(
            ds,
            key_col="k",
            arr_col="arr",
            ts_col="ts",
            lateness=LATENESS,
            carry_cols=("tag",),
            tie_col="eid",
            hot_key_limit=None,
        ).to_pandas()
        # carry column survives untouched
        m = res.sort_values("eid")["tag"].to_numpy()
        assert (m == (np.sort(res["eid"].to_numpy()) % 3)).all()
        # exactly one sentinel (first arrival) per key, never late
        first = res[res["wm"] == int(_NEG)]
        assert len(first) == res["k"].nunique()
        assert (first["late"] == 0).all()
