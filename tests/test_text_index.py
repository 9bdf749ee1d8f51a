"""Token-bucket partitioned inverted index + file-pruned term search
(stages/text_index.py — the text analog of the spatial store's
windowed-read pruning; ANN-index precedent for bucket pruning)."""
import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from gis_scripts_ray.stages.text_index import (
    partition_paths_for_terms,
    postings_rows,
    term_and_query,
    token_bucket,
    write_token_index,
)

NB = 8  # small bucket count so multi-token buckets occur in fixtures

VOCAB = ["sort", "merge", "window", "scan", "join", "hash", "the", "batch"]


def _mk_docs(n=120, seed=5) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.integers(3, 12)))
        for _ in range(n)
    ]
    texts[7] = None  # null text must not crash the build
    texts[9] = ""  # nor empty
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _ref_and(table: pa.Table, terms: "list[str]") -> "list[int]":
    """Pure-python reference: docs whose single-space token set ⊇ terms."""
    out = []
    for i in range(table.num_rows):
        txt = table["text"][i].as_py() or ""
        if set(terms) <= set(txt.split(" ")):
            out.append(table["doc_id"][i].as_py())
    return sorted(out)


def _build(tmp_path, table) -> str:
    out = str(tmp_path / "tindex")
    write_token_index(ray.data.from_arrow(table), out, n_buckets=NB)
    return out


class TestTextIndex:
    def test_bucket_routing_exhaustive(self, tmp_path, ray_session):
        """Every posting row in partition b really hashes to bucket b,
        and the union of partitions is the full POSITIONAL posting set
        (v2: one row per occurrence, pos 1-based)."""
        t = _mk_docs()
        out = _build(tmp_path, t)
        seen = []
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            part = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
            rows = pq.read_table(f, columns=["token", "doc_id", "pos"])
            toks = rows["token"].to_pylist()
            assert all(
                f"b{b}" == part for b in token_bucket(list(set(toks)), NB)
            )
            seen += list(
                zip(toks, rows["doc_id"].to_pylist(), rows["pos"].to_pylist())
            )
        want = []
        for i in range(t.num_rows):
            txt = t["text"][i].as_py() or ""
            for p, tok in enumerate(txt.split(" "), start=1):
                want.append((tok, i, p))
        assert sorted(seen) == sorted(want)

    def test_pruned_fileset_and_equal_rows(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        all_files = sorted(glob.glob(os.path.join(out, "part=*", "data.parquet")))
        terms = ["sort", "window"]
        pruned = sorted(partition_paths_for_terms(out, terms, NB))
        assert set(pruned) <= set(all_files) and pruned
        assert len(pruned) <= len({int(b) for b in token_bucket(terms, NB)})
        got = sorted(
            term_and_query(out, terms, n_buckets=NB).to_pandas()["doc_id"]
        )
        assert got == _ref_and(t, terms)
        assert got  # fixture guarantees matches

    def test_single_term_and_triple_term(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        for terms in (["join"], ["sort", "merge", "window"]):
            got = sorted(
                term_and_query(out, terms, n_buckets=NB).to_pandas()["doc_id"]
            )
            assert got == _ref_and(t, terms)

    def test_unknown_term_empty_with_schema(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        res = term_and_query(out, ["zzz-not-in-vocab", "sort"], n_buckets=NB)
        # dataset-level schema survives an all-rows-filtered result
        # (ray to_pandas drops columns on 0-row datasets — assert on the
        # dataset schema, the contract the next stage actually sees)
        assert [f.name for f in res.schema().base_schema] == ["doc_id"]
        assert res.count() == 0

    def test_duplicate_terms_deduped(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        got = sorted(
            term_and_query(out, ["sort", "sort"], n_buckets=NB).to_pandas()[
                "doc_id"
            ]
        )
        assert got == _ref_and(t, ["sort"])

    def test_empty_terms_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            term_and_query("/nonexistent", [], n_buckets=NB)

    def test_rebuild_resume_noop(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        mtimes = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(out, "part=*", "data.parquet"))
        }
        write_token_index(ray.data.from_arrow(t), out, n_buckets=NB)
        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(out, "part=*", "data.parquet"))
        }
        assert mtimes == after  # completed partitions never rewritten

    def test_postings_rows_null_and_positions(self):
        b = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a a b", None], pa.string()),
            }
        )
        rows = postings_rows(b, "text", "doc_id", NB)
        trips = sorted(
            zip(
                rows["token"].to_pylist(),
                rows["doc_id"].to_pylist(),
                rows["pos"].to_pylist(),
            )
        )
        # v2 positional: duplicate 'a' keeps both occurrences with
        # 1-based positions; null text -> [''] posting at pos 1
        assert trips == [("", 2, 1), ("a", 1, 1), ("a", 1, 2), ("b", 1, 3)]


def _ref_phrase(table: pa.Table, phrase: "list[str]") -> dict:
    """Pure-python reference: doc_id -> n occurrences of the consecutive
    token sequence."""
    out = {}
    k = len(phrase)
    for i in range(table.num_rows):
        w = (table["text"][i].as_py() or "").split(" ")
        n = sum(1 for j in range(len(w) - k + 1) if w[j : j + k] == phrase)
        if n:
            out[table["doc_id"][i].as_py()] = n
    return out


class TestPhraseQuery:
    def _got(self, out, phrase):
        from gis_scripts_ray.stages.text_index import phrase_query

        df = phrase_query(out, phrase, n_buckets=NB).to_pandas()
        return {int(r.doc_id): int(r.n_occurrences) for r in df.itertuples()}

    def test_matches_reference(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        for phrase in (["sort", "merge"], ["the"], ["scan", "join", "hash"]):
            assert self._got(out, phrase) == _ref_phrase(t, phrase), phrase
        assert self._got(out, ["sort", "merge"])  # fixture has matches

    def test_repeated_term_phrase(self, tmp_path, ray_session):
        import ray.data
        from gis_scripts_ray.stages.text_index import write_token_index

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["a b a b a", "a b c a b", "b a a b"], pa.string()
                ),
            }
        )
        out = str(tmp_path / "tidx2")
        write_token_index(ray.data.from_arrow(t), out, n_buckets=NB)
        # "a b a" occurs twice (overlapping) in doc 0, never in 1 or 2
        assert self._got(out, ["a", "b", "a"]) == {0: 2}
        assert self._got(out, ["a", "a"]) == {2: 1}
        assert self._got(out, ["a", "b", "a"]) == _ref_phrase(t, ["a", "b", "a"])

    def test_absent_phrase_empty(self, tmp_path, ray_session):
        t = _mk_docs()
        out = _build(tmp_path, t)
        assert self._got(out, ["zzz-missing", "sort"]) == {}

    def test_empty_phrase_rejected(self):
        from gis_scripts_ray.stages.text_index import phrase_query

        with pytest.raises(ValueError):
            phrase_query("/nonexistent", [], n_buckets=NB)


class TestOrTopk:
    def test_matches_reference_ranking(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import term_or_topk

        t = _mk_docs()
        out = _build(tmp_path, t)
        terms = ["sort", "merge", "window"]
        df = term_or_topk(out, terms, k=7, n_buckets=NB).to_pandas()
        # reference: count matched distinct terms per doc, rank (n DESC, id ASC)
        ref = []
        for i in range(t.num_rows):
            toks = set((t["text"][i].as_py() or "").split(" "))
            n = len(toks & set(terms))
            if n:
                ref.append((-n, t["doc_id"][i].as_py()))
        want = [(doc, -neg) for neg, doc in sorted(ref)[:7]]
        got = sorted(
            zip(df["doc_id"].astype(int), df["n_matched"].astype(int)),
            key=lambda r: (-r[1], r[0]),
        )
        assert got == want

    def test_k_larger_than_matches(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import term_or_topk

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["sort x", "y", "z sort"], pa.string()),
            }
        )
        out = str(tmp_path / "tidx3")
        write_token_index(ray.data.from_arrow(t), out, n_buckets=NB)
        from gis_scripts_ray.stages.text_index import term_or_topk as tq

        df = tq(out, ["sort"], k=50, n_buckets=NB).to_pandas()
        assert sorted(df["doc_id"]) == [0, 2]
        assert (df["n_matched"] == 1).all()

    def test_empty_terms_rejected(self):
        from gis_scripts_ray.stages.text_index import term_or_topk

        with pytest.raises(ValueError):
            term_or_topk("/nonexistent", [], n_buckets=NB)


class TestIncrementalMerge:
    """merge_token_index: index freshness without a rebuild (the nightly
    crawl delta must not re-shuffle the corpus's postings)."""

    def _postings(self, out):
        rows = []
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            t = pq.read_table(f, columns=["token", "doc_id", "pos"])
            rows += list(
                zip(
                    t["token"].to_pylist(),
                    t["doc_id"].to_pylist(),
                    t["pos"].to_pylist(),
                )
            )
        return sorted(rows)

    def _queries_equal(self, out_a, out_b):
        from gis_scripts_ray.stages.text_index import phrase_query

        for terms in (["sort", "merge"], ["the"]):
            a = sorted(term_and_query(out_a, terms, n_buckets=NB).to_pandas()["doc_id"])
            b = sorted(term_and_query(out_b, terms, n_buckets=NB).to_pandas()["doc_id"])
            assert a == b, terms
        pa_ = phrase_query(out_a, ["sort", "merge"], n_buckets=NB).to_pandas()
        pb_ = phrase_query(out_b, ["sort", "merge"], n_buckets=NB).to_pandas()
        assert sorted(zip(pa_["doc_id"], pa_["n_occurrences"])) == sorted(
            zip(pb_["doc_id"], pb_["n_occurrences"])
        )

    def test_merge_equals_rebuild(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import merge_token_index

        t = _mk_docs(n=120)
        base, inc = t.slice(0, 80), t.slice(80)
        out = str(tmp_path / "merged")
        write_token_index(ray.data.from_arrow(base), out, n_buckets=NB)
        stats = merge_token_index(
            out, ray.data.from_arrow(inc), "delta1", n_buckets=NB
        )
        assert stats["rows_added"] > 0 and stats["buckets_skipped"] == 0
        full = str(tmp_path / "rebuild")
        write_token_index(ray.data.from_arrow(t), full, n_buckets=NB)
        assert self._postings(out) == self._postings(full)
        self._queries_equal(out, full)
        assert not os.path.exists(os.path.join(out, "_incr_delta1"))

    def test_idempotent_rerun(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import merge_token_index

        t = _mk_docs(n=100)
        base, inc = t.slice(0, 70), t.slice(70)
        out = str(tmp_path / "idem")
        write_token_index(ray.data.from_arrow(base), out, n_buckets=NB)
        merge_token_index(out, ray.data.from_arrow(inc), "d1", n_buckets=NB)
        before = self._postings(out)
        stats2 = merge_token_index(out, ray.data.from_arrow(inc), "d1", n_buckets=NB)
        assert stats2["buckets_skipped"] == stats2["buckets_touched"] > 0
        assert stats2["rows_added"] == 0
        assert self._postings(out) == before  # never double-applied

    def test_untouched_buckets_not_rewritten(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import merge_token_index, token_bucket

        t = _mk_docs(n=100)
        out = str(tmp_path / "narrow")
        write_token_index(ray.data.from_arrow(t), out, n_buckets=NB)
        # a single-token increment touches exactly one bucket
        inc = pa.table(
            {
                "doc_id": pa.array([10_000], pa.int64()),
                "text": pa.array(["sort"], pa.string()),
            }
        )
        want_bucket = f"b{int(token_bucket(['sort'], NB)[0])}"
        mtimes = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(out, "part=*", "data.parquet"))
        }
        stats = merge_token_index(out, ray.data.from_arrow(inc), "one", n_buckets=NB)
        assert stats["buckets_touched"] == 1 and stats["rows_added"] == 1
        for f, m in mtimes.items():
            part = os.path.basename(os.path.dirname(f))
            if part == f"part={want_bucket}":
                assert os.path.getmtime(f) != m
            else:
                assert os.path.getmtime(f) == m, f"untouched {part} rewritten"

    def test_crash_window_rerun_repairs_manifest(self, tmp_path, ray_session):
        """Crash between the atomic bucket replace and mark_complete:
        rerun must skip the bucket (footer marker) yet still restore the
        manifest row with the increment in its lineage."""
        from gis_scripts_ray.state.checkpoint import Manifest
        from gis_scripts_ray.stages.text_index import merge_token_index

        t = _mk_docs(n=100)
        base, inc = t.slice(0, 70), t.slice(70)
        out = str(tmp_path / "crash")
        write_token_index(ray.data.from_arrow(base), out, n_buckets=NB)
        merge_token_index(out, ray.data.from_arrow(inc), "d9", n_buckets=NB)
        before = self._postings(out)
        man = Manifest(out)
        victim = sorted(man.completed())[0]
        os.remove(
            os.path.join(man.manifest_dir, f"part-{victim}.json")
        )
        stats = merge_token_index(out, ray.data.from_arrow(inc), "d9", n_buckets=NB)
        assert stats["rows_added"] == 0  # footer markers held
        assert self._postings(out) == before
        rec = Manifest(out).completed().get(victim)
        if rec is not None:  # victim was a touched bucket -> restored
            assert "+incr-d9" in rec.lineage

    def test_stacked_increments_footer_history(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            applied_increments,
            merge_token_index,
        )

        t = _mk_docs(n=120)
        out = str(tmp_path / "stack")
        write_token_index(ray.data.from_arrow(t.slice(0, 60)), out, n_buckets=NB)
        merge_token_index(out, ray.data.from_arrow(t.slice(60, 30)), "a1", n_buckets=NB)
        merge_token_index(out, ray.data.from_arrow(t.slice(90)), "a2", n_buckets=NB)
        full = str(tmp_path / "stackfull")
        write_token_index(ray.data.from_arrow(t), full, n_buckets=NB)
        assert self._postings(out) == self._postings(full)
        histories = [
            applied_increments(f)
            for f in glob.glob(os.path.join(out, "part=*", "data.parquet"))
        ]
        assert any(h == ("a1", "a2") for h in histories)
        for h in histories:  # order of application is preserved per bucket
            assert list(h) == [x for x in ("a1", "a2") if x in h]

    def test_bad_increment_id_rejected(self, tmp_path):
        from gis_scripts_ray.stages.text_index import merge_token_index

        with pytest.raises(ValueError):
            merge_token_index(str(tmp_path), None, "../evil", n_buckets=NB)


class TestTombstones:
    """delete_docs / compact_token_index: takedown deletes — immediate
    query-time masking, then one physical rewrite per bucket."""

    def _postings_docs(self, out):
        docs = set()
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            docs |= set(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        return docs

    def test_mask_then_compact(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            compact_token_index,
            delete_docs,
            phrase_query,
            term_or_topk,
        )

        t = _mk_docs(n=120)
        out = _build(tmp_path, t)
        dead = [d for d in range(120) if d % 5 == 0]
        alive_ref = [
            d for d in _ref_and(t, ["sort"]) if d not in set(dead)
        ]
        n = delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array(dead, pa.int64())})),
            "td1",
        )
        assert n == len(dead)
        # phase 1: tombstones live, postings still on disk, results masked
        assert self._postings_docs(out) & set(dead)
        got = sorted(term_and_query(out, ["sort"], n_buckets=NB).to_pandas()["doc_id"])
        assert got == alive_ref
        df = term_or_topk(out, ["sort"], k=500, n_buckets=NB).to_pandas()
        assert not set(df["doc_id"]) & set(dead)
        pdf = phrase_query(out, ["sort", "merge"], n_buckets=NB).to_pandas()
        assert not set(pdf["doc_id"]) & set(dead)
        # phase 2: compaction physically removes and GCs the set
        stats = compact_token_index(out)
        assert stats["rows_removed"] > 0 and stats["tombstone_sets_cleared"] == 1
        assert not self._postings_docs(out) & set(dead)
        got2 = sorted(term_and_query(out, ["sort"], n_buckets=NB).to_pandas()["doc_id"])
        assert got2 == alive_ref
        from gis_scripts_ray.stages.text_index import tombstone_paths

        assert tombstone_paths(out) == []

    def test_compact_idempotent_and_skips(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            compact_token_index,
            delete_docs,
        )

        t = _mk_docs(n=100)
        out = _build(tmp_path, t)
        delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})),
            "td2",
        )
        s1 = compact_token_index(out)
        assert s1["buckets_skipped"] == 0
        # no tombstones left -> compaction is a structural no-op
        s2 = compact_token_index(out)
        assert s2 == {
            "buckets": 0,
            "buckets_skipped": 0,
            "rows_removed": 0,
            "tombstone_sets_cleared": 0,
        }
        # re-registering the same set after GC: footers already cover it,
        # so every bucket skips and nothing is double-removed
        before = self._postings_docs(out)
        delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})),
            "td2",
        )
        s3 = compact_token_index(out)
        assert s3["buckets_skipped"] == s3["buckets"] > 0
        assert s3["rows_removed"] == 0
        assert self._postings_docs(out) == before

    def test_delete_idempotent_and_distinct(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import delete_docs, tombstone_paths

        t = _mk_docs(n=50)
        out = _build(tmp_path, t)
        ids = pa.table({"doc_id": pa.array([4, 4, 9, 9, 9], pa.int64())})
        n1 = delete_docs(out, ray.data.from_arrow(ids), "dup")
        assert n1 == 2  # distinct-reduced
        n2 = delete_docs(out, ray.data.from_arrow(ids), "dup")
        assert n2 == 2 and len(tombstone_paths(out)) >= 1

    def test_stacked_deletions_one_compact(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            compact_token_index,
            delete_docs,
        )

        t = _mk_docs(n=100)
        out = _build(tmp_path, t)
        delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array([10, 11], pa.int64())})),
            "a",
        )
        delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array([12], pa.int64())})),
            "b",
        )
        got = sorted(term_and_query(out, ["the"], n_buckets=NB).to_pandas()["doc_id"])
        assert not {10, 11, 12} & set(got)
        stats = compact_token_index(out)
        assert stats["tombstone_sets_cleared"] == 2
        assert not {10, 11, 12} & self._postings_docs(out)

    def test_bad_deletion_id_rejected(self, tmp_path):
        from gis_scripts_ray.stages.text_index import delete_docs

        with pytest.raises(ValueError):
            delete_docs(str(tmp_path), None, "x/../y")


class TestBlockInvariance:
    def test_phrase_counts_partition_invariant(self, tmp_path, ray_session):
        """Build the index from 1-block and 5-block inputs into two
        stores; phrase counts and AND results must be identical (the
        additive-partials claim, pinned)."""
        t = _mk_docs(seed=41)
        from gis_scripts_ray.stages.text_index import phrase_query

        results = []
        for j, nparts in enumerate((1, 5)):
            out = str(tmp_path / f"inv{j}")
            write_token_index(
                ray.data.from_arrow(t).repartition(nparts), out, n_buckets=NB
            )
            got_p = phrase_query(out, ["sort", "merge"], n_buckets=NB).to_pandas()
            got_a = term_and_query(out, ["sort", "the"], n_buckets=NB).to_pandas()
            results.append(
                (
                    sorted(zip(got_p["doc_id"], got_p["n_occurrences"])),
                    sorted(got_a["doc_id"]),
                )
            )
        assert results[0] == results[1]


class TestIndexSplit:
    """split_token_index: linear-hashing growth — double the bucket count
    with LOCAL per-bucket work (no shuffle), exact queries throughout."""

    def _postings(self, out):
        rows = []
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            t = pq.read_table(f, columns=["token", "doc_id", "pos"])
            rows += list(
                zip(
                    t["token"].to_pylist(),
                    t["doc_id"].to_pylist(),
                    t["pos"].to_pylist(),
                )
            )
        return sorted(rows)

    def _phase1_only(self, out):
        """Simulate a split that crashed after creating every sibling but
        BEFORE the routing flip (meta still at the old count)."""
        import ray as _ray

        from gis_scripts_ray.state.checkpoint import Manifest
        from gis_scripts_ray.stages.text_index import _split_create_sibling_task

        man = Manifest(out)
        sources = sorted(int(k[1:]) for k in man.completed() if int(k[1:]) < NB)
        _ray.get(
            [
                _split_create_sibling_task.remote(
                    man.partition_dir(f"b{b}"),
                    man.partition_dir(f"b{b + NB}"),
                    b,
                    NB,
                )
                for b in sources
            ]
        )

    def test_split_preserves_postings_and_queries(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            index_n_buckets,
            phrase_query,
            split_token_index,
            term_or_topk,
        )

        t = _mk_docs(n=150, seed=11)
        out = _build(tmp_path, t)
        before = self._postings(out)
        and_before = sorted(
            term_and_query(out, ["sort", "merge"], n_buckets=NB).to_pandas()["doc_id"]
        )
        stats = split_token_index(out, from_buckets=NB)
        assert stats["n_buckets"] == 2 * NB and not stats["resumed"]
        # only populated buckets exist in the manifest (8 vocab tokens)
        assert 1 <= stats["buckets_split"] <= NB and stats["rows_moved"] > 0
        assert index_n_buckets(out) == 2 * NB
        # postings set is EXACTLY preserved (no loss, no double-count)
        assert self._postings(out) == before
        # every surviving row routes to its partition under the new layout
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            part = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
            toks = pq.read_table(f, columns=["token"])["token"].to_pylist()
            assert all(
                f"b{b}" == part for b in token_bucket(list(set(toks)), 2 * NB)
            )
        # meta-routed queries match the pre-split results and the reference
        got = sorted(term_and_query(out, ["sort", "merge"]).to_pandas()["doc_id"])
        assert got == and_before == _ref_and(t, ["sort", "merge"])
        ph = phrase_query(out, ["sort", "merge"]).to_pandas()
        top = term_or_topk(out, ["sort", "merge", "window"], k=7).to_pandas()
        assert len(top) == 7 and ph["n_occurrences"].min() >= 1
        # a stale explicit bucket count is a routing bug -> refuse loudly
        with pytest.raises(ValueError):
            term_and_query(out, ["sort"], n_buckets=NB)
        with pytest.raises(ValueError):
            write_token_index(ray.data.from_arrow(t), out, n_buckets=NB)

    def test_double_split_and_pruned_readset(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import split_token_index

        t = _mk_docs(n=120, seed=23)
        out = _build(tmp_path, t)
        split_token_index(out, from_buckets=NB)
        split_token_index(out, from_buckets=2 * NB)
        assert self._postings(out) == sorted(
            (tok, i, p)
            for i in range(t.num_rows)
            for p, tok in enumerate(
                (t["text"][i].as_py() or "").split(" "), start=1
            )
        )
        got = sorted(term_and_query(out, ["sort", "the"]).to_pandas()["doc_id"])
        assert got == _ref_and(t, ["sort", "the"])
        # the pruned read set shrinks with the split: <= 2 of 32 buckets
        pruned = partition_paths_for_terms(out, ["sort", "the"], 4 * NB)
        assert 1 <= len(pruned) <= 2

    def test_crash_before_flip_resumes(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            index_n_buckets,
            split_token_index,
        )

        t = _mk_docs(n=120, seed=31)
        out = _build(tmp_path, t)
        before = self._postings(out)
        self._phase1_only(out)  # crash: siblings exist, meta still NB
        assert index_n_buckets(out) == NB
        # old routing still complete during the crash window
        got = sorted(term_and_query(out, ["sort"], n_buckets=NB).to_pandas()["doc_id"])
        assert got == _ref_and(t, ["sort"])
        stats = split_token_index(out, from_buckets=NB)
        assert stats["n_buckets"] == 2 * NB and not stats["resumed"]
        assert self._postings(out) == before
        got = sorted(term_and_query(out, ["sort"]).to_pandas()["doc_id"])
        assert got == _ref_and(t, ["sort"])

    def test_crash_after_flip_settles(self, tmp_path, ray_session):
        from gis_scripts_ray.state.checkpoint import Manifest, PartitionRecord
        from gis_scripts_ray.stages.text_index import (
            _read_meta,
            _write_meta,
            split_token_index,
        )

        t = _mk_docs(n=120, seed=37)
        out = _build(tmp_path, t)
        before = self._postings(out)
        self._phase1_only(out)
        man = Manifest(out)
        sources = sorted(
            int(k[1:]) for k in man.completed() if int(k[1:]) < NB
        )
        for b in sources:  # siblings exist only for populated sources
            man.mark_complete(
                PartitionRecord(
                    part_key=f"b{b + NB}",
                    n_rows=0,
                    lineage=f"split-from-b{b}@{2 * NB}",
                    wall_s=0.0,
                )
            )
        _write_meta(out, 2 * NB, pending_prune=True)  # crash before prune
        # term queries are ALREADY exact in the pending window (stale rows
        # in sources are never read by the new routing's token filter)
        got = sorted(term_and_query(out, ["sort", "the"]).to_pandas()["doc_id"])
        assert got == _ref_and(t, ["sort", "the"])
        # but whole-index scans would double-count -> settle repairs that
        assert len(self._postings(out)) > len(before)
        stats = split_token_index(out, from_buckets=NB)
        assert stats["resumed"] and stats["n_buckets"] == 2 * NB
        assert _read_meta(out) == (2 * NB, False)
        assert self._postings(out) == before

    def test_split_then_merge_and_delete(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import (
            compact_token_index,
            delete_docs,
            merge_token_index,
            split_token_index,
        )

        t = _mk_docs(n=140, seed=43)
        base, inc = t.slice(0, 100), t.slice(100)
        out = str(tmp_path / "splitmerge")
        write_token_index(ray.data.from_arrow(base), out, n_buckets=NB)
        split_token_index(out, from_buckets=NB)
        # increment routes by the DOUBLED layout via meta
        merge_token_index(out, ray.data.from_arrow(inc), "delta1")
        full = str(tmp_path / "splitfull")
        write_token_index(ray.data.from_arrow(t), full, n_buckets=2 * NB)
        assert self._postings(out) == self._postings(full)
        # takedown + compaction over the split index
        dead = [d for d in _ref_and(t, ["sort"]) if d % 2 == 0]
        delete_docs(
            out,
            ray.data.from_arrow(pa.table({"doc_id": pa.array(dead, pa.int64())})),
            "takedown1",
        )
        compact_token_index(out)
        got = sorted(term_and_query(out, ["sort"]).to_pandas()["doc_id"])
        assert got == [d for d in _ref_and(t, ["sort"]) if d % 2 == 1]


class TestBM25:
    """bm25_topk: integer fixed-point ranked retrieval over the index."""

    K1, B, S = 1_200_000, 750_000, 1000

    def _ref(self, table, terms, k):
        texts = [
            table["text"][i].as_py() for i in range(table.num_rows)
        ]
        docs = {i: (t or "").split(" ") for i, t in enumerate(texts)}
        dl = {i: len(w) for i, w in docs.items()}
        D, L = len(docs), sum(dl.values())
        df = {q: sum(1 for w in docs.values() if q in w) for q in terms}
        out = {}
        for i, w in docs.items():
            s = 0
            for q in terms:
                tf = w.count(q)
                if tf == 0:
                    continue
                idf = (2 * (D - df[q]) + 1) * self.S // (2 * df[q] + 1)
                dlnorm = 1_000_000 - self.B + (self.B * dl[i] * D) // L
                denom = tf * 1_000_000 + (self.K1 * dlnorm) // 1_000_000
                frac = (tf * (1_000_000 + self.K1) * 1_000_000) // denom
                s += idf * frac
            if s:
                out[i] = s
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def _got(self, res):
        df = res.to_pandas()
        return sorted(
            zip(df["doc_id"].astype(int), df["score"].astype(int)),
            key=lambda kv: (-kv[1], kv[0]),
        )

    def test_matches_reference(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import bm25_topk

        t = _mk_docs(n=150, seed=7)
        out = _build(tmp_path, t)
        terms = ["sort", "merge", "hash"]
        got = self._got(
            bm25_topk(out, ray.data.from_arrow(t), terms, k=12, n_buckets=NB)
        )
        assert got == self._ref(t, terms, 12)

    def test_split_invariant(self, tmp_path, ray_session):
        """Ranking must be identical before and after a linear-hash
        split — scores depend on postings, not on the bucket layout."""
        from gis_scripts_ray.stages.text_index import bm25_topk, split_token_index

        t = _mk_docs(n=130, seed=13)
        out = _build(tmp_path, t)
        terms = ["sort", "the"]
        before = self._got(
            bm25_topk(out, ray.data.from_arrow(t), terms, k=9, n_buckets=NB)
        )
        split_token_index(out, from_buckets=NB)
        after = self._got(bm25_topk(out, ray.data.from_arrow(t), terms, k=9))
        assert before == after == self._ref(t, terms, 9)

    def test_unmatched_terms_empty(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import bm25_topk

        t = _mk_docs(n=60, seed=17)
        out = _build(tmp_path, t)
        res = bm25_topk(
            out, ray.data.from_arrow(t), ["zzz-absent"], k=5, n_buckets=NB
        )
        assert [f.name for f in res.schema().base_schema] == ["doc_id", "score"]
        assert res.count() == 0

    def test_tombstoned_docs_never_rank(self, tmp_path, ray_session):
        """Deleted docs must not occupy top-k slots even before the
        physical compaction (query-time anti-filter runs pre-ranking)."""
        from gis_scripts_ray.stages.text_index import bm25_topk, delete_docs

        t = _mk_docs(n=100, seed=19)
        out = _build(tmp_path, t)
        terms = ["sort", "merge"]
        full = self._got(
            bm25_topk(out, ray.data.from_arrow(t), terms, k=100, n_buckets=NB)
        )
        dead = {d for d, _ in full[:3]}
        delete_docs(
            out,
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array(sorted(dead), pa.int64())})
            ),
            "bm25kill",
        )
        got = self._got(
            bm25_topk(out, ray.data.from_arrow(t), terms, k=5, n_buckets=NB)
        )
        assert not ({d for d, _ in got} & dead)
        # surviving docs keep their pre-delete scores (df/dl freeze until
        # compaction — the documented tombstone semantics)
        want = [kv for kv in full if kv[0] not in dead][:5]
        assert got == want

    def test_empty_terms_rejected(self, tmp_path):
        from gis_scripts_ray.stages.text_index import bm25_topk

        with pytest.raises(ValueError):
            bm25_topk("/nonexistent", None, [], n_buckets=NB)


class TestKwicSnippets:
    """kwic_snippets: token-window concordance vs a per-row reference."""

    def _ref(self, table, term, w):
        out = {}
        for i in range(table.num_rows):
            did = table["doc_id"][i].as_py()
            toks = (table["text"][i].as_py() or "").split(" ")
            if term not in toks:
                continue
            p = toks.index(term)
            out[did] = " ".join(toks[max(p - w, 0) : p + w + 1])
        return out

    def test_matches_reference(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import kwic_snippets

        t = _mk_docs(n=150, seed=23)
        out = _build(tmp_path, t)
        res = kwic_snippets(
            out, ray.data.from_arrow(t), "sort", window=3, n_buckets=NB
        ).to_pandas()
        got = dict(zip(res["doc_id"].astype(int), res["snippet"]))
        assert got == self._ref(t, "sort", 3)

    def test_edges_and_multiplicity(self, tmp_path, ray_session):
        """Term at start/end (window clamps), repeated term (first
        occurrence wins), doc without the term excluded."""
        from gis_scripts_ray.stages.text_index import kwic_snippets

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "hit a b c d e",
                        "a b c d e hit",
                        "a hit b hit c hit d",
                        "no match here at all",
                        "hit",
                    ],
                    pa.string(),
                ),
            }
        )
        out = _build(tmp_path, t)
        res = kwic_snippets(
            out, ray.data.from_arrow(t), "hit", window=2, n_buckets=NB
        ).to_pandas()
        got = dict(zip(res["doc_id"].astype(int), res["snippet"]))
        assert got == self._ref(t, "hit", 2)
        assert got[0] == "hit a b" and got[1] == "d e hit" and got[4] == "hit"
        assert got[2] == "a hit b hit"
        assert 3 not in got

    def test_absent_term_empty(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import kwic_snippets

        t = _mk_docs(n=40, seed=29)
        out = _build(tmp_path, t)
        res = kwic_snippets(
            out, ray.data.from_arrow(t), "zz-absent", window=2, n_buckets=NB
        )
        assert res.count() == 0
        assert [f.name for f in res.schema().base_schema] == ["doc_id", "snippet"]


class TestProximityTopk:
    """proximity_topk: min |pos_a - pos_b| ranking vs a per-row oracle."""

    def _ref(self, table, a, b, k):
        out = []
        for i in range(table.num_rows):
            did = table["doc_id"][i].as_py()
            toks = (table["text"][i].as_py() or "").split(" ")
            pa_ = [j for j, t in enumerate(toks) if t == a]
            pb_ = [j for j, t in enumerate(toks) if t == b]
            if pa_ and pb_:
                gap = min(abs(x - y) for x in pa_ for y in pb_)
                out.append((did, gap))
        out.sort(key=lambda kv: (kv[1], kv[0]))
        return out[:k]

    def _got(self, res):
        df = res.to_pandas()
        return sorted(
            zip(df["doc_id"].astype(int), df["gap"].astype(int)),
            key=lambda kv: (kv[1], kv[0]),
        )

    def test_matches_reference(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import proximity_topk

        t = _mk_docs(n=160, seed=31)
        out = _build(tmp_path, t)
        got = self._got(proximity_topk(out, "sort", "merge", k=12, n_buckets=NB))
        assert got == self._ref(t, "sort", "merge", 12)

    def test_adjacent_pair_argument_holds(self, tmp_path, ray_session):
        """Interleaved occurrences: the true min pair is NOT the first
        occurrence of each term (a a b ... a b with tight late pair)."""
        from gis_scripts_ray.stages.text_index import proximity_topk

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    [
                        "aa x x x bb x x aa bb",  # min gap 1 (pos 9,10)
                        "aa x bb",  # gap 2
                    ],
                    pa.string(),
                ),
            }
        )
        out = _build(tmp_path, t)
        got = self._got(proximity_topk(out, "aa", "bb", k=5, n_buckets=NB))
        assert got == [(0, 1), (1, 2)]

    def test_tombstoned_docs_never_rank(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import delete_docs, proximity_topk

        t = _mk_docs(n=100, seed=37)
        out = _build(tmp_path, t)
        full = self._got(proximity_topk(out, "sort", "hash", k=100, n_buckets=NB))
        if not full:
            pytest.skip("fixture produced no co-occurrences")
        dead = {full[0][0]}
        delete_docs(
            out,
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array(sorted(dead), pa.int64())})
            ),
            "proxkill",
        )
        got = self._got(proximity_topk(out, "sort", "hash", k=3, n_buckets=NB))
        assert not ({d for d, _ in got} & dead)
        assert got == [kv for kv in full if kv[0] not in dead][:3]

    def test_same_term_rejected_and_absent_empty(self, tmp_path, ray_session):
        from gis_scripts_ray.stages.text_index import proximity_topk

        t = _mk_docs(n=30, seed=41)
        out = _build(tmp_path, t)
        with pytest.raises(ValueError):
            proximity_topk(out, "sort", "sort", n_buckets=NB)
        res = proximity_topk(out, "sort", "zz-absent", k=4, n_buckets=NB)
        assert res.count() == 0
        assert [f.name for f in res.schema().base_schema] == ["doc_id", "gap"]
