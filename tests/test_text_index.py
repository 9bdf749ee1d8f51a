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
        and the union of partitions is the full unique posting set."""
        t = _mk_docs()
        out = _build(tmp_path, t)
        seen = set()
        for f in glob.glob(os.path.join(out, "part=*", "data.parquet")):
            part = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
            rows = pq.read_table(f, columns=["token", "doc_id"])
            toks = rows["token"].to_pylist()
            assert all(
                f"b{b}" == part for b in token_bucket(list(set(toks)), NB)
            )
            seen |= set(zip(toks, rows["doc_id"].to_pylist()))
        want = set()
        for i in range(t.num_rows):
            txt = t["text"][i].as_py() or ""
            for tok in set(txt.split(" ")):
                want.add((tok, i))
        assert seen == want

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

    def test_postings_rows_null_and_dupes(self):
        b = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a a b", None], pa.string()),
            }
        )
        rows = postings_rows(b, "text", "doc_id", NB)
        pairs = sorted(zip(rows["token"].to_pylist(), rows["doc_id"].to_pylist()))
        # doc 1's duplicate 'a' deduped; null text -> [''] posting
        assert pairs == [("", 2), ("a", 1), ("b", 1)]
