"""Mosaic harmonization, checkpoint/resume, and window-stage tests."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestMosaicHarmonize:
    def test_recovers_planted_distortion(self, ray_session):
        """Two sources observing the same per-cell truth; source b distorted
        by v' = 2v + 10. The solve must recover a_b ~ 0.5, b_b ~ -5 relative
        harmonization (up to the identity anchor pull)."""
        import ray

        from gis_scripts_ray.pipelines.mosaic import harmonize

        rng = np.random.default_rng(11)
        cells = np.repeat(np.arange(30, dtype=np.int64), 8)
        truth = np.repeat(rng.uniform(50, 150, 30), 8)
        rows_a = pd.DataFrame({"cell": cells, "source": "a", "v": truth})
        rows_b = pd.DataFrame({"cell": cells, "source": "b", "v": 2.0 * truth + 10.0})
        df = pd.concat([rows_a, rows_b], ignore_index=True)
        ds = ray.data.from_pandas(df).repartition(4)
        out, params = harmonize(ds, "cell", "source", "v", anchor_weight=0.01)
        a_a, b_a = params["a"]
        a_b, b_b = params["b"]
        # harmonized values must agree across sources per cell
        odf = out.to_pandas()
        pivot = odf.groupby(["cell", "source"])["v_adj"].mean().unstack()
        diff = (pivot["a"] - pivot["b"]).abs().max()
        assert diff < 1.0
        # and the relative gain between sources is ~2x
        assert a_a / a_b == pytest.approx(2.0, rel=0.05)

    def test_solver_identity_when_consistent(self, ray_session):
        import ray

        from gis_scripts_ray.pipelines.mosaic import harmonize

        df = pd.DataFrame(
            {
                "cell": [1, 1, 2, 2, 3, 3],
                "source": ["a", "b", "a", "b", "a", "b"],
                "v": [10.0, 10.0, 20.0, 20.0, 30.0, 30.0],
            }
        )
        _, params = harmonize(ray.data.from_pandas(df), "cell", "source", "v")
        for a, b in params.values():
            assert a == pytest.approx(1.0, abs=1e-6)
            assert b == pytest.approx(0.0, abs=1e-5)


class TestCheckpointResume:
    def test_write_skip_and_resume(self, ray_session, tmp_path):
        import ray

        from gis_scripts_ray.state.checkpoint import (
            Manifest,
            read_resumable,
            write_partitioned_resumable,
        )

        out_dir = str(tmp_path / "ckpt")
        df = pd.DataFrame({"k": np.arange(100) % 4, "v": np.arange(100)})
        ds = ray.data.from_pandas(df)

        def part_fn(batch: pa.Table) -> pa.Array:
            return pa.array([f"g{k}" for k in batch["k"].to_pylist()], pa.string())

        recs = write_partitioned_resumable(ds, out_dir, part_fn, lineage="run1")
        assert sorted(r.part_key for r in recs) == ["g0", "g1", "g2", "g3"]
        assert sum(r.n_rows for r in recs) == 100

        # simulate a crash: delete one partition's manifest + data
        man = Manifest(out_dir)
        os.remove(os.path.join(man.manifest_dir, "part-g2.json"))
        shutil.rmtree(man.partition_dir("g2"))

        recs2 = write_partitioned_resumable(ds, out_dir, part_fn, lineage="run2")
        # only the missing partition was recomputed
        assert [r.part_key for r in recs2] == ["g2"]

        back = read_resumable(out_dir).to_pandas().sort_values("v").reset_index(drop=True)
        assert len(back) == 100
        assert back["v"].tolist() == list(range(100))

    def test_tmp_dir_never_looks_complete(self, ray_session, tmp_path):
        from gis_scripts_ray.state.checkpoint import Manifest

        out_dir = str(tmp_path / "ckpt2")
        man = Manifest(out_dir)
        # a stale tmp dir (crash artifact) is not listed as complete
        os.makedirs(man.partition_dir("gX") + ".tmp")
        assert man.completed() == {}


class TestWindows:
    def test_sessionize_gap_semantics(self, ray_session):
        import ray

        from gis_scripts_ray.stages.windows import sessionize

        us = [0, 10, 20, 2000, 2010, 5000]
        df = pd.DataFrame(
            {
                "user_id": [1] * 6,
                "ts": pd.to_datetime(np.asarray(us) * 1000, unit="ns"),
                "event_id": range(6),
            }
        )
        out = (
            sessionize(ray.data.from_pandas(df), "user_id", "ts", "event_id", gap_us=100)
            .to_pandas()
            .sort_values("session_id")
            .reset_index(drop=True)
        )
        assert out["n_events"].tolist() == [3, 2, 1]
        assert out["start_us"].tolist() == [0, 2000, 5000]

    def test_sessionize_presplit_matches_plain(self, ray_session):
        """Pre-split sessionize == plain sessionize on a hot key whose
        sessions CHAIN across 4+ time ranges (including a single-session
        range bridging its neighbors), plus normal keys and randomized
        event times."""
        import ray

        from gis_scripts_ray.stages.windows import sessionize, sessionize_presplit

        rows = []
        # hot key: one long session spanning ranges 0..3 (every 50us,
        # range_us=1000 < session span), then a gap, then a 2-range session
        rows += [("hot", t, i) for i, t in enumerate(range(0, 3501, 50))]
        rows += [("hot", t, 100 + i) for i, t in enumerate(range(6000, 7001, 80))]
        rows += [("hot", 9990, 200)]  # lone event, last range
        # normal key: sessions within single ranges + one boundary-adjacent
        rows += [("u2", t, 300 + i) for i, t in enumerate([10, 20, 990, 1005, 2500])]
        # randomized key
        rng = np.random.default_rng(9)
        ts = np.sort(rng.integers(0, 12000, 120))
        rows += [("rnd", int(t), 400 + i) for i, t in enumerate(ts)]
        df = pd.DataFrame(rows, columns=["user_id", "us", "event_id"])
        df["ts"] = pd.to_datetime(df["us"].to_numpy() * 1000, unit="ns")
        ds = ray.data.from_pandas(df[["user_id", "ts", "event_id"]]).repartition(6)

        def norm(d):
            return (
                d.sort_values(["user_id", "session_id"], kind="mergesort")
                .reset_index(drop=True)[
                    ["user_id", "session_id", "n_events", "start_us", "end_us"]
                ]
            )

        plain = norm(sessionize(ds, "user_id", "ts", "event_id", gap_us=100).to_pandas())
        for range_us in (1000, 300, 7000):
            split = norm(
                sessionize_presplit(
                    ds, "user_id", "ts", "event_id", gap_us=100, range_us=range_us
                ).to_pandas()
            )
            pd.testing.assert_frame_equal(plain, split, check_dtype=False)

    def test_tumbling_counts(self, ray_session):
        import ray

        from gis_scripts_ray.stages.windows import tumbling_counts

        df = pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "ts": pd.to_datetime([0, 500, 1500, 100], unit="us"),
            }
        )
        out = tumbling_counts(ray.data.from_pandas(df), "k", "ts", 1000).to_pandas()
        got = {
            (r.k, r.window_start_us): r.n
            for r in out.itertuples()
        }
        assert got == {("a", 0): 2, ("a", 1000): 1, ("b", 0): 1}


class TestJoins:
    def test_bucketed_join_matches_pandas(self, ray_session):
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        rng = np.random.default_rng(13)
        left = pd.DataFrame({"k": rng.integers(0, 50, 300), "a": np.arange(300)})
        right = pd.DataFrame({"k2": rng.integers(0, 50, 80), "b": np.arange(80) * 10})
        got = (
            bucketed_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                on="k",
                right_on="k2",
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="k", right_on="k2", how="inner")
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert got["a"].tolist() == want["a"].tolist()
        assert got["b"].tolist() == want["b"].tolist()

    def test_bucketed_join_composite_key(self, ray_session):
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        rng = np.random.default_rng(17)
        left = pd.DataFrame(
            {
                "g": rng.choice(["x", "y", "z"], 200),
                "k": rng.integers(0, 12, 200),
                "a": np.arange(200),
            }
        )
        right = pd.DataFrame(
            {
                "g2": rng.choice(["x", "y", "z"], 60),
                "k2": rng.integers(0, 12, 60),
                "b": np.arange(60) * 7,
            }
        )
        got = (
            bucketed_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                on=("g", "k"),
                right_on=("g2", "k2"),
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on=["g", "k"], right_on=["g2", "k2"], how="inner")
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert got["a"].tolist() == want["a"].tolist()
        assert got["b"].tolist() == want["b"].tolist()
        assert got["g2"].tolist() == want["g2"].tolist()

    def test_bucketed_join_exact_beyond_2p53(self, ray_session):
        # payload int64 > 2^53 must survive the union's null padding —
        # the pandas NaN-promotion rounding hazard (CLAUDE.md). The old
        # pandas-group finish silently rounded these.
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        base = 2**62 + 1
        left = pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "big_a": pa.array([base + i for i in range(4)], pa.int64()),
            }
        )
        right = pa.table(
            {
                "k2": pa.array([2, 3, 5], pa.int64()),
                "big_b": pa.array([base + 100 + i for i in range(3)], pa.int64()),
            }
        )
        got = (
            bucketed_join(
                ray.data.from_arrow(left).repartition(2),
                ray.data.from_arrow(right).repartition(2),
                on="k",
                right_on="k2",
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["big_a"].tolist() == [base + 1, base + 2]
        assert got["big_b"].tolist() == [base + 100, base + 101]

    def test_bucketed_join_null_keys_never_match(self, ray_session):
        # SQL inner-join semantics: NULL = NULL is not a match. pandas'
        # merge matches NaN==NaN, so the finish must drop null keys first.
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        left = pa.table(
            {
                "k": pa.array([1, None, 2, None], pa.int64()),
                "a": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
        right = pa.table(
            {
                "k2": pa.array([None, 2, 9], pa.int64()),
                "b": pa.array([20, 21, 22], pa.int64()),
            }
        )
        got = (
            bucketed_join(
                ray.data.from_arrow(left).repartition(2),
                ray.data.from_arrow(right).repartition(2),
                on="k",
                right_on="k2",
                num_buckets=4,
            )
            .to_pandas()
        )
        assert got["a"].tolist() == [12] and got["b"].tolist() == [21]

    def test_hash_join_composite_routes_to_fallback(self, ray_session):
        # the composite-key fallback must agree with the native Dataset.join
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join, hash_join

        rng = np.random.default_rng(23)
        left = pd.DataFrame(
            {
                "g": rng.integers(0, 4, 150),
                "k": rng.integers(0, 9, 150),
                "a": np.arange(150),
            }
        )
        right = pd.DataFrame(
            {
                "g": rng.integers(0, 4, 40),
                "k": rng.integers(0, 9, 40),
                "b": np.arange(40) * 3,
            }
        )
        lds = ray.data.from_pandas(left).repartition(3)
        rds = ray.data.from_pandas(right).repartition(2)
        native = (
            hash_join(lds, rds, on=("g", "k"), num_partitions=4)
            .to_pandas()[["a", "b"]]
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        fallback = (
            bucketed_join(lds, rds, on=("g", "k"), num_buckets=4)
            .to_pandas()[["a", "b"]]
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert native["a"].tolist() == fallback["a"].tolist()
        assert native["b"].tolist() == fallback["b"].tolist()

    def test_split_train_val_disjoint_and_stable(self, ray_session):
        import ray

        from gis_scripts_ray.stages.sampling import split_train_val

        t = pa.table({"doc_id": pa.array(np.arange(1000), pa.int64())})
        ds = ray.data.from_arrow(t).repartition(4)
        train, val = split_train_val(ds, "doc_id", val_pct=20)
        tr = set(train.to_pandas()["doc_id"])
        va = set(val.to_pandas()["doc_id"])
        assert tr.isdisjoint(va) and len(tr) + len(va) == 1000
        assert 0.15 < len(va) / 1000 < 0.25
        # partition-count invariance (order-free determinism)
        train2, val2 = split_train_val(ds.repartition(7), "doc_id", val_pct=20)
        assert set(val2.to_pandas()["doc_id"]) == va

    def test_ann_index_reuse_matches_oneshot(self, ray_session):
        import ray

        from gis_scripts_ray.stages.similarity import (
            ann_lsh_topk,
            ann_query,
            build_lsh_index,
        )

        rng = np.random.default_rng(11)
        m = rng.standard_normal((400, 16))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(400), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float64())),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        q = rng.standard_normal(16)
        one_shot = ann_lsh_topk(ds, q, 5, dim=16)["vec_id"].to_pylist()
        index = build_lsh_index(ds, dim=16)
        reused = ann_query(index, q, 5, dim=16)["vec_id"].to_pylist()
        assert one_shot == reused
        # second probe on the same index (the amortized path)
        q2 = rng.standard_normal(16)
        assert ann_query(index, q2, 5, dim=16)["vec_id"].to_pylist() == ann_lsh_topk(
            ds, q2, 5, dim=16
        )["vec_id"].to_pylist()

    def test_lsh_index_partitioned_persistence(self, ray_session, tmp_path):
        """End-to-end partitioned index persistence: the persisted probe
        reads ONLY the matching-bucket partition files and returns exactly
        the in-memory probe's results."""
        import os

        import ray

        from gis_scripts_ray.state.checkpoint import Manifest
        from gis_scripts_ray.stages.similarity import (
            LshBucketer,
            _probe_buckets,
            ann_query,
            ann_query_persisted,
            build_lsh_index,
            partition_paths_for_buckets,
            write_lsh_index_partitioned,
        )

        rng = np.random.default_rng(23)
        m = rng.standard_normal((600, 16))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(600), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float64())),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        index = build_lsh_index(ds, dim=16)
        out = str(tmp_path / "lsh_index")
        write_lsh_index_partitioned(index, out)

        # every index row landed in a completed partition
        done = Manifest(out).completed()
        assert sum(r.n_rows for r in done.values()) == 600

        q = rng.standard_normal(16)
        qb = int(LshBucketer(16).bucket_of(q.reshape(1, -1))[0])
        cand = set(_probe_buckets(qb, 12, 2))
        paths = partition_paths_for_buckets(out, sorted(cand))
        # the probe's input file set is exactly the matching-bucket subset
        assert paths, "probe read nothing"
        got_buckets = {
            int(os.path.basename(os.path.dirname(p)).split("=", 1)[1]) for p in paths
        }
        assert got_buckets == {int(k) for k in done if int(k) in cand}
        assert got_buckets < {int(k) for k in done}  # strictly pruned

        mem = ann_query(index, q, 5, dim=16)
        persisted = ann_query_persisted(out, q, 5, dim=16)
        assert mem["vec_id"].to_pylist() == persisted["vec_id"].to_pylist()
        assert np.allclose(mem["sim"].to_numpy(), persisted["sim"].to_numpy())

    def test_ivf_index_recall(self, ray_session):
        """IVF probe must find planted exact copies and reach reasonable
        recall vs brute force on clustered data."""
        import ray

        from gis_scripts_ray.stages.similarity import (
            build_ivf_index,
            cosine_topk,
            ivf_query,
        )

        rng = np.random.default_rng(3)
        centers = rng.standard_normal((6, 16)) * 3
        pts = np.concatenate(
            [c + rng.standard_normal((80, 16)) for c in centers]
        )
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                "embedding": pa.array(list(pts), pa.list_(pa.float64())),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        index, cents = build_ivf_index(ds, dim=16, k=6, iters=8)
        assert index.count() == len(pts)
        q = pts[7] + 1e-6  # near an existing point
        got = ivf_query(index, cents, q, 10, nprobe=2)["vec_id"].to_pylist()
        want = cosine_topk(ds, q, 10)["vec_id"].to_pylist()
        assert 7 in got  # the near-exact copy is found
        recall = len(set(got) & set(want)) / 10
        assert recall >= 0.7, (recall, got, want)

    def test_lsh_neardup_pairs_planted_copies_10x(self, ray_session):
        """Banded-LSH near-dup pipeline at 10x the sf0.01 fixture size:
        every planted exact copy is found (identical vectors collide in
        every band), no random pair crosses the 0.99 threshold, and no
        bucket caps."""
        import ray

        from gis_scripts_ray.stages.similarity import lsh_neardup_pairs

        rng = np.random.default_rng(17)
        n = 5000
        m = rng.standard_normal((n, 16))
        ids = np.arange(n, dtype=np.int64)
        both = pa.table(
            {
                "vec_id": pa.array(np.concatenate([ids, ids + 1_000_000]), pa.int64()),
                "embedding": pa.array(list(np.concatenate([m, m])), pa.list_(pa.float64())),
            }
        )
        got = lsh_neardup_pairs(
            ray.data.from_arrow(both).repartition(8), dim=16, threshold=0.99
        )
        assert not got["capped"].to_pandas().any()
        pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
        want = {(int(i), int(i + 1_000_000)) for i in ids}
        assert pairs == want, (len(pairs - want), len(want - pairs))
        # forced semi-join candidate filter is byte-identical
        sj = lsh_neardup_pairs(
            ray.data.from_arrow(both).repartition(8),
            dim=16,
            threshold=0.99,
            broadcast_limit=0,
        )
        assert sj.sort_by([("id_a", "ascending"), ("id_b", "ascending")]).equals(
            got.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        )

    def test_kmeans_matches_local_oracle(self, ray_session):
        """Distributed k-means == single-process numpy k-means: identical
        bottom-k-by-id seeding (no global sort in the plan) and identical
        iteration updates, on clustered data with clear argmax margins."""
        import ray

        from gis_scripts_ray.stages.similarity import kmeans_fit

        rng = np.random.default_rng(5)
        centers = rng.standard_normal((4, 8)) * 4
        pts = np.concatenate([c + rng.standard_normal((60, 8)) for c in centers])
        ids = rng.permutation(len(pts)).astype(np.int64) * 7 + 3  # shuffled, sparse
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(pts), pa.list_(pa.float64())),
            }
        )
        got = kmeans_fit(
            ray.data.from_arrow(t).repartition(5), dim=8, k=4, iters=5
        )

        # local oracle: same seeding (k smallest ids), same updates
        order = np.argsort(ids)
        cents = pts[order[:4]].astype(np.float64)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
        vn = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-300)
        for _ in range(5):
            assign = np.argmax(vn @ cents.T, axis=1)
            new = cents.copy()
            for c in range(4):
                sel = assign == c
                if sel.any():
                    new[c] = vn[sel].mean(axis=0)
            new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-300)
            cents = new
        assert np.allclose(got, cents, atol=1e-9), np.abs(got - cents).max()

    def test_bucketed_join_string_keys(self, ray_session):
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        left = pd.DataFrame({"k": ["x", "y", "z", "x"], "a": [1, 2, 3, 4]})
        right = pd.DataFrame({"k2": ["x", "z"], "b": [10, 30]})
        got = (
            bucketed_join(
                ray.data.from_pandas(left).repartition(2),
                ray.data.from_pandas(right),
                on="k",
                right_on="k2",
                num_buckets=4,
            )
            .to_pandas()
            .sort_values(["a"])
        )
        assert got["a"].tolist() == [1, 3, 4]
        assert got["b"].tolist() == [10, 30, 10]

    def test_bucketed_join_rejects_overlapping_columns(self, ray_session):
        import pytest
        import ray

        from gis_scripts_ray.stages.joins import bucketed_join

        left = pd.DataFrame({"k": [1], "dup": [1]})
        right = pd.DataFrame({"k": [1], "dup": [2]})
        with pytest.raises(ValueError, match="overlapping"):
            bucketed_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right), on="k"
            )

    def test_checkpoint_hostile_part_keys(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray

        from gis_scripts_ray.state.checkpoint import (
            Manifest,
            write_partitioned_resumable,
        )

        out_dir = str(tmp_path / "hostile")
        t = pa.table(
            {
                "k": pa.array(["a/b", "../up", "ok", "%41"], pa.string()),
                "v": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )

        def part_fn(batch):
            return batch["k"]

        recs = write_partitioned_resumable(
            ray.data.from_arrow(t), out_dir, part_fn, lineage="h1"
        )
        man = Manifest(out_dir)
        done = man.completed()
        # raw keys round-trip through the manifest; every partition dir
        # stays INSIDE out_dir
        assert sorted(done) == ["%41", "../up", "a/b", "ok"]
        import os

        for k in done:
            d = os.path.realpath(man.partition_dir(k))
            assert d.startswith(os.path.realpath(out_dir))
            assert os.path.isdir(d)
        # resume: nothing recomputed
        recs2 = write_partitioned_resumable(
            ray.data.from_arrow(t), out_dir, part_fn, lineage="h2"
        )
        assert recs2 == []

    def test_metrics_parquet_written(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray

        from gis_scripts_ray.state.checkpoint import write_partitioned_resumable

        out_dir = str(tmp_path / "ck")
        df = pd.DataFrame({"k": np.arange(40) % 2, "v": np.arange(40)})

        def part_fn(batch: pa.Table) -> pa.Array:
            return pa.array([f"p{k}" for k in batch["k"].to_pylist()], pa.string())

        write_partitioned_resumable(ray.data.from_pandas(df), out_dir, part_fn, "L1")
        m = pq.read_table(f"{out_dir}/_metrics.parquet").to_pandas()
        assert sorted(m["part_key"]) == ["p0", "p1"]
        assert m["n_rows"].sum() == 40
        assert (m["lineage"] == "L1").all()


class TestSaltedAgg:
    def test_salted_equals_unsalted(self, ray_session):
        import ray

        from gis_scripts_ray.stages.tile_agg import cell_sum_count, salted_sum_count

        rng = np.random.default_rng(21)
        # hot key: 80% of rows on key 0
        keys = np.where(rng.uniform(size=5000) < 0.8, 0, rng.integers(1, 40, 5000))
        df = pd.DataFrame(
            {"cell": keys, "who": [f"u{i%97}" for i in range(5000)], "v": np.arange(5000)}
        )
        ds = ray.data.from_pandas(df).repartition(6)
        a = (
            cell_sum_count(ds, ["cell"], ["v"])
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        b = (
            salted_sum_count(ds, ["cell"], ["v"], salt_col="who", salt_buckets=8)
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        assert a["cell"].tolist() == b["cell"].tolist()
        assert a["sum_v"].tolist() == b["sum_v"].tolist()
        assert a["n"].tolist() == b["n"].tolist()


class TestQuarantine:
    def test_row_conservation_and_reason(self, ray_session):
        import ray

        from gis_scripts_ray.stages.quarantine import split_valid

        df = pd.DataFrame({"x": [1, -2, 3, -4, 5, 6]})
        ds = ray.data.from_pandas(df).repartition(2)
        valid, bad = split_valid(
            ds, lambda b: b["x"].to_numpy() > 0, reason="nonpositive"
        )
        v, q = valid.to_pandas(), bad.to_pandas()
        assert len(v) + len(q) == 6
        assert sorted(v["x"]) == [1, 3, 5, 6]
        assert sorted(q["x"]) == [-4, -2]
        assert (q["quarantine_reason"] == "nonpositive").all()
