"""Round-4 scale-path closures (VERDICT r3 tasks #1-#3): the LSH pair
finishes and the TF-IDF weight delivery each have TWO plans — a
measured-small fast path and a distributed path for 100-TB inputs. The
forced-low-guard tests here drive BOTH plans on one fixture and assert
byte-identical results (the dedup.py:537 equivalence pattern)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.dedup import minhash_lsh_candidates
from gis_scripts_ray.stages.similarity import lsh_neardup_pairs
from gis_scripts_ray.stages.textstages import tfidf_integer_scores


def _docs_table():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = (
        [base, base + " tail", "entirely different content about arrow engines"]
        + ["identical boilerplate text repeated verbatim across documents"] * 5
    )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


class TestPairFinishEquivalence:
    def test_minhash_candidates_both_plans_identical(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(_docs_table()).repartition(3)
        fast = minhash_lsh_candidates(ds, "doc_id", "text", max_group=4)
        # pair_small_limit=0 forces the hash-shuffle groupby finish
        dist = minhash_lsh_candidates(
            ds, "doc_id", "text", max_group=4, pair_small_limit=0
        )
        assert fast.schema == dist.schema
        assert fast.equals(dist)
        # the verbatim-identical block collides in every band
        df = fast.to_pandas()
        clones = df[(df.id_a >= 3) & (df.id_b >= 3)]
        assert (clones.n_bands == clones.n_bands.max()).all()
        assert len(clones) > 0

    def test_neardup_pairs_both_plans_identical(self, ray_session):
        import ray.data

        rng = np.random.default_rng(17)
        n, dim = 200, 16
        m = rng.standard_normal((n, dim))
        ids = np.arange(n, dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(np.concatenate([ids, ids + 1_000_000]), pa.int64()),
                "embedding": pa.array(
                    list(np.concatenate([m, m])), pa.list_(pa.float64())
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        fast = lsh_neardup_pairs(
            ds, id_col="vec_id", emb_col="embedding", dim=dim, threshold=0.99
        )
        dist = lsh_neardup_pairs(
            ds,
            id_col="vec_id",
            emb_col="embedding",
            dim=dim,
            threshold=0.99,
            pair_small_limit=0,
        )
        assert fast.schema == dist.schema
        assert fast.equals(dist)
        # every planted exact copy is recovered (recall 1 for identicals)
        got = set(zip(fast["id_a"].to_pylist(), fast["id_b"].to_pylist()))
        want = {(int(i), int(i + 1_000_000)) for i in ids}
        assert got == want


class TestHotKeyPresplit:
    """Round-4 verdict task #6: hot keys route through time-range
    presplit plans that never put a key's whole history on one task;
    equivalence pinned against the plain bucketed plan on a fixture
    whose hot key spans >= 3 time ranges."""

    @staticmethod
    def _events():
        rng = np.random.default_rng(23)
        rows = []
        # hot key 7: 300 events across the full span (>= 3 of 8 ranges)
        ts = np.sort(rng.choice(np.arange(1_000_000, dtype=np.int64), 300, False))
        rows.append((np.full(300, 7, np.int64), ts))
        # normal keys: a handful of events each, clustered
        for k in range(3):
            n = 5 + k
            t = np.sort(rng.choice(np.arange(50_000, dtype=np.int64), n, False))
            rows.append((np.full(n, 100 + k, np.int64), t + k * 400_000))
        key = np.concatenate([r[0] for r in rows])
        us = np.concatenate([r[1] for r in rows])
        eid = np.arange(len(key), dtype=np.int64)
        val = (eid * 13 % 97).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(key),
                "us": pa.array(us),
                "eid": pa.array(eid),
                "v": pa.array(val),
            }
        )

    def test_running_sum_presplit_equivalent(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.windows import (
            grouped_running_sum,
            grouped_running_sum_presplit,
        )

        ds = ray.data.from_arrow(self._events()).repartition(5)
        kw = dict(key_col="k", ts_col="us", id_col="eid", value_col="v")
        plain = (
            grouped_running_sum(ds, **kw, hot_key_limit=None)
            .to_pandas()
            .sort_values(["k", "eid"])
            .reset_index(drop=True)
        )
        pre = (
            grouped_running_sum_presplit(ds, **kw, n_ranges=8)
            .to_pandas()
            .sort_values(["k", "eid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(pre, plain)
        # the measured auto-dispatch takes the presplit plan when a key
        # exceeds the limit, and must agree too
        auto = (
            grouped_running_sum(ds, **kw, hot_key_limit=10, n_ranges=8)
            .to_pandas()
            .sort_values(["k", "eid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(auto, plain)

    def test_running_sum_join_delivery_equivalent(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.windows import grouped_running_sum_presplit

        ds = ray.data.from_arrow(self._events()).repartition(5)
        kw = dict(key_col="k", ts_col="us", id_col="eid", value_col="v")
        bc = (
            grouped_running_sum_presplit(ds, **kw, n_ranges=8)
            .to_pandas()
            .sort_values(["k", "eid"])
            .reset_index(drop=True)
        )
        # broadcast_limit=0 forces the composite-key hash-join delivery
        hj = (
            grouped_running_sum_presplit(ds, **kw, n_ranges=8, broadcast_limit=0)
            .to_pandas()
            .sort_values(["k", "eid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(hj, bc)

    def test_gap_stats_presplit_equivalent(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.windows import (
            grouped_gap_stats,
            grouped_gap_stats_presplit,
        )

        ds = ray.data.from_arrow(self._events()).repartition(5)
        kw = dict(key_col="k", ts_col="us", id_col="eid")
        plain = (
            grouped_gap_stats(ds, **kw, hot_key_limit=None)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pre = (
            grouped_gap_stats_presplit(ds, **kw, n_ranges=8)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(pre, plain)
        auto = (
            grouped_gap_stats(ds, **kw, hot_key_limit=10, n_ranges=8)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(auto, plain)


class TestTfidfWeightDelivery:
    def test_token_hash_join_equals_broadcast(self, ray_session):
        import ray.data

        texts = ["a b c a", "a  b", "", "c c c c", "d", "a b c d"]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        bc = (
            tfidf_integer_scores(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # broadcast_limit=0 forces the distributed token hash-join plan
        hj = (
            tfidf_integer_scores(ds, broadcast_limit=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(hj[["doc_id", "score"]], bc[["doc_id", "score"]])


class TestNationLookupDelivery:
    def test_join_path_equals_broadcast_path(self, ray_session, monkeypatch):
        """orders_nation_rollup through BOTH delivery paths: the guarded
        broadcast dense-index gather and the hash-join fallback must
        produce identical aggregates (forced-low-budget equivalence, the
        tfidf/dedup delivery-test pattern)."""
        import gis_scripts_ray.queries as q

        sf = "/root/testdata/sf0.001"
        bc = q.q_orders_nation_rollup(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
        monkeypatch.setattr(q, "_CUSTKEY_BROADCAST_SLOTS", 0)
        hj = q.q_orders_nation_rollup(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
        pd.testing.assert_frame_equal(hj, bc)
        assert len(bc) > 0
