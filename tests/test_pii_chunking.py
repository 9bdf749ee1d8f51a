"""PII scan/redact and document chunking: vectorized-kernel vs per-row
``re``/Python parity (CLAUDE.md kernel rule), DuckDB twin equivalence,
and the Ray dataset wrappers end to end."""

import duckdb
import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.chunking import (
    chunk_batch,
    chunk_documents,
    chunk_rows_row,
    chunk_sql_twin,
)
from gis_scripts_ray.stages.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_counts_row,
    pii_redact,
    redact_pii,
    redact_pii_row,
)

PII_TEXTS = [
    "contact user1@example.com or 555-123-4567 at 192.168.1.2",
    "no pii here just words",
    "",
    None,
    "two mails a@b.co c.d@e-f.org and ip 10.0.0.255 phone 800.555.0100",
    "edge 999.999.999.999 still matches ipv4; a@b@c.com partial",
    "adjacent x@y.io,555-000-1111.end",
    # non-ASCII word chars abutting matches: ASCII \b semantics must
    # hold in ALL engines (unicode \b would kill both matches here)
    "５555-123-4567 and café192.168.1.1ü plus №10.0.0.1",
    "digits stay ascii: １２３-４５６-７８９０ must NOT count as phone",
]


def _pii_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(PII_TEXTS)), pa.int64()),
            "text": pa.array(PII_TEXTS, pa.string()),
        }
    )


class TestPiiParity:
    def test_counts_match_python_re(self):
        cnt = pii_counts(_pii_table())
        for i, tx in enumerate(PII_TEXTS):
            for k, v in pii_counts_row(tx).items():
                assert cnt[k][i].as_py() == v, (i, k)

    def test_redact_matches_python_re(self):
        red = redact_pii(_pii_table())
        for i, tx in enumerate(PII_TEXTS):
            assert red["text"][i].as_py() == redact_pii_row(tx), i

    def test_duckdb_twin_identical(self):
        t = _pii_table()
        con = duckdb.connect()
        con.register(
            "t",
            t.set_column(1, "text", pa.array([x or "" for x in PII_TEXTS], pa.string())),
        )
        expr = "text"
        for _, pat, repl in PII_PATTERNS:
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        sql = con.execute(f"SELECT {expr} FROM t ORDER BY doc_id").fetchall()
        red = redact_pii(t)
        for i in range(len(PII_TEXTS)):
            assert sql[i][0] == red["text"][i].as_py(), i

    def test_dataset_wrapper(self, ray_session):
        import ray.data

        out = pii_redact(ray.data.from_arrow(_pii_table()).repartition(3)).to_pandas()
        assert "[EMAIL]" in out.sort_values("doc_id")["text"].iloc[0]


CHUNK_TEXTS = [
    " ".join(f"w{i}" for i in range(150)),
    "short doc",
    "",
    None,
    " ".join("x" for _ in range(48)),  # exactly one stride
    " ".join("y" for _ in range(49)),  # one word over
]


def _chunk_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(CHUNK_TEXTS)), pa.int64()),
            "text": pa.array(CHUNK_TEXTS, pa.string()),
        }
    )


class TestChunking:
    def test_matches_per_row_reference(self):
        out = chunk_batch(_chunk_table(), chunk_size=64, stride=48)
        got = sorted(
            zip(
                out["doc_id"].to_pylist(),
                out["chunk_idx"].to_pylist(),
                out["n_words"].to_pylist(),
                out["chunk_text"].to_pylist(),
            )
        )
        want = sorted(
            (d, k, n, c)
            for d, tx in enumerate(CHUNK_TEXTS)
            for (k, n, c) in chunk_rows_row(tx, 64, 48)
        )
        assert got == want

    def test_duckdb_twin_identical(self):
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(CHUNK_TEXTS)), pa.int64()),
                    "text": pa.array([x or "" for x in CHUNK_TEXTS], pa.string()),
                }
            ),
        )
        ref = sorted(
            con.execute(chunk_sql_twin(chunk_size=64, stride=48)).fetchall()
        )
        out = chunk_batch(_chunk_table(), chunk_size=64, stride=48)
        got = sorted(
            zip(
                out["doc_id"].to_pylist(),
                out["chunk_idx"].to_pylist(),
                out["n_words"].to_pylist(),
                out["chunk_text"].to_pylist(),
            )
        )
        assert [tuple(r) for r in ref] == got

    def test_every_word_covered_and_overlap(self):
        """Chunk k starts at k*stride; consecutive chunks overlap by
        size - stride words; the union covers all words exactly."""
        out = chunk_rows_row(" ".join(str(i) for i in range(100)), 10, 7)
        covered = set()
        for k, n, c in out:
            words = c.split(" ")
            assert len(words) <= 10
            start = k * 7
            assert words == [str(i) for i in range(start, min(start + 10, 100))]
            covered.update(range(start, min(start + 10, 100)))
        assert covered == set(range(100))

    def test_dataset_wrapper_block_invariant(self, ray_session):
        import ray.data

        for nb in (1, 4):
            ds = ray.data.from_arrow(_chunk_table()).repartition(nb)
            out = (
                chunk_documents(ds, chunk_size=64, stride=48)
                .to_pandas()
                .sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True)
            )
            assert len(out) == 10


class TestQuantize:
    def test_batch_matches_per_row_and_duckdb(self):
        import duckdb

        from gis_scripts_ray.stages.quantize import (
            quantize_matrix,
            quantize_row,
            quantize_sql_expr,
        )

        rng = np.random.default_rng(3)
        vs = [rng.standard_normal(8).astype(np.float32) for _ in range(30)]
        vs.append(np.zeros(8, np.float32))  # zero vector -> all-zero qvec
        m = np.stack(vs)
        q, scale = quantize_matrix(m)
        for i, v in enumerate(vs):
            assert list(q[i].astype(int)) == quantize_row(list(v)), i
        assert (q[-1] == 0).all() and scale[-1] == 0.0
        con = duckdb.connect()
        con.register(
            "embeddings",
            pa.table(
                {
                    "vec_id": pa.array(range(len(vs)), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vs], pa.list_(pa.float32())
                    ),
                }
            ),
        )
        ref = con.execute(
            f"SELECT {quantize_sql_expr('embedding')} FROM embeddings ORDER BY vec_id"
        ).fetchall()
        for i, (qv,) in enumerate(ref):
            assert [int(x) for x in qv] == list(q[i].astype(int)), i

    def test_topk_tie_break_and_block_invariance(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.quantize import quantized_topk

        # planted: vectors 5 and 7 are IDENTICAL (tie) and closest to the
        # query; ids break the tie ascending
        base = np.array([1.0, 2.0, -3.0, 4.0], np.float64)
        rows = []
        for i in range(20):
            v = base + (0.0 if i in (5, 7) else 0.5 + i * 0.05) * np.array([1, -1, 1, -1.0])
            rows.append(list(v))
        t = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(rows, pa.list_(pa.float64())),
            }
        )
        from gis_scripts_ray.stages.quantize import quantize_row

        q0 = np.array(quantize_row(list(base)), np.int32)
        outs = []
        for nb in (1, 5):
            ds = ray.data.from_arrow(t).repartition(nb)
            out = quantized_topk(ds, q0, k=3)
            outs.append(
                list(zip(out["vec_id"].to_pylist(), out["score"].to_pylist()))
            )
        assert outs[0] == outs[1]
        assert [i for i, _ in outs[0][:2]] == [5, 7]  # tie broken by id
