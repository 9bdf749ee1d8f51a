"""Integer-exact TF-IDF: DuckDB parity, block-structure invariance,
tokenizer edge cases (empties / repeated tokens)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.textstages import tfidf_integer_scores, token_df_counts

TEXTS = [
    "a b c a",        # tf(a)=2
    "a  b",           # double space -> empty token counts too
    "",               # empty doc -> one empty token
    "c c c c",        # heavy repeat
    "d",              # singleton vocab entry -> weight N//1
    "a b c d",
]


def _sql_ref(texts):
    con = duckdb.connect()
    con.execute("SET threads=1")
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    return con.execute(
        f"WITH documents(doc_id, text) AS (VALUES {vals}), "
        "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok), "
        "df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents) "
        "SELECT CAST(tf.doc_id AS BIGINT) AS doc_id, "
        "CAST(SUM(tf.tf * ((SELECT n FROM n) // df.df)) AS BIGINT) "
        "AS score FROM tf JOIN df ON tf.tok = df.tok "
        "GROUP BY tf.doc_id ORDER BY tf.doc_id"
    ).df()


class TestTfidf:
    def test_matches_duckdb_and_block_invariant(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
                "text": pa.array(TEXTS),
            }
        )
        ref = _sql_ref(TEXTS)
        for nb in (1, 4):
            ds = ray.data.from_arrow(t).repartition(nb)
            got = (
                tfidf_integer_scores(ds)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_df_counts_once_per_doc(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["x x x", "x"]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        df = token_df_counts(ds).to_pandas().set_index("token")["df"]
        assert df["x"] == 2  # document frequency, not term frequency
