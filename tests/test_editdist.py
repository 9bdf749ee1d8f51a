"""Levenshtein kernel parity: the vectorized batch DP must be bit-exact
against BOTH the per-row python reference and DuckDB's own
``levenshtein`` (byte-domain) on a hostile fixture — empties, multi-byte
UTF-8, transpositions (which unit-cost Levenshtein scores 2), repeats."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_scripts_ray.stages.editdist import levenshtein_batch, levenshtein_one

HOSTILE = [
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("abc", "abc"),
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("ab", "ba"),  # transposition costs 2 in unit-cost Levenshtein
    ("héllo", "hello"),  # multi-byte: DuckDB scores bytes (2, not 1)
    ("ééé", "eee"),
    ("aaaaaaa", "a"),
    ("the same text", "the same text"),
    ("x" * 200, "x" * 199 + "y"),
    ("word boundary case ", "word boundary case"),
]


class TestLevenshteinParity:
    def test_hostile_pairs_vs_python_and_duckdb(self):
        a = pa.array([p[0] for p in HOSTILE], pa.string())
        b = pa.array([p[1] for p in HOSTILE], pa.string())
        got = levenshtein_batch(a, b)
        con = duckdb.connect()
        for i, (x, y) in enumerate(HOSTILE):
            assert got[i] == levenshtein_one(x, y), (x, y)
            assert (
                got[i]
                == con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
            ), (x, y)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="abé ", max_size=24),
                st.text(alphabet="abé ", max_size=24),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_property_batch_matches_per_row(self, pairs):
        a = pa.array([p[0] for p in pairs], pa.string())
        b = pa.array([p[1] for p in pairs], pa.string())
        got = levenshtein_batch(a, b)
        want = np.array([levenshtein_one(x, y) for x, y in pairs])
        assert (got == want).all()

    def test_chunked_input(self):
        a = pa.chunked_array([["abc"], ["xyz", ""]])
        b = pa.chunked_array([["abd"], ["xyz", "q"]])
        assert levenshtein_batch(a, b).tolist() == [1, 0, 1]

    def test_empty_batch(self):
        a = pa.array([], pa.string())
        assert len(levenshtein_batch(a, a)) == 0
