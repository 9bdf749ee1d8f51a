"""Jaro-Winkler — three-way parity: jw_one == jw_batch == DuckDB.

DuckDB's semantics diverge from the textbook in three places (integer
transposition halving, both-empty -> 0, byte domain); this suite pins
all of them cross-engine on fuzzed + hostile inputs (repo rule: every
vectorized kernel keeps a bit-exact per-row reference and a DuckDB pin
where the twin uses the engine's own primitive).
"""

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.jarowinkler import jw_batch, jw_one

HOSTILE = [
    ("martha", "marhta"),
    ("DIXON", "DICKSONX"),
    ("", ""),
    ("a", ""),
    ("", "b"),
    ("a", "a"),  # single byte equal: window -1, equality special case
    ("a", "b"),
    ("ab", "ba"),
    ("abc", "cab"),  # 3-cycle: odd transposition count, integer halving
    ("aab", "aba"),
    ("same", "same"),
    ("café", "cafe"),  # byte domain: 5 vs 4 bytes
    ("日本語", "日本"),
    ("ÀBC", "ABC"),
    ("    ", " "),
    ("aaaaaaaaaaaaaaaa", "a"),
    ("prefixmatch_aaaa", "prefixmatch_bbbb"),  # boost cap at 4
]


def _fuzz_pairs(n=2500):
    rng = random.Random(42)
    alphas = ["abcd", "ab", "abcdefghijklmnop", "xyz ", "a", "αβγδ café 日本"]
    out = []
    for t in range(n):
        al = alphas[t % len(alphas)]
        out.append(
            (
                "".join(rng.choice(al) for _ in range(rng.randint(0, 16))),
                "".join(rng.choice(al) for _ in range(rng.randint(0, 16))),
            )
        )
    return out


class TestJaroWinklerParity:
    def test_three_way_bit_exact(self):
        pairs = HOSTILE + _fuzz_pairs()
        a = pa.array([p[0] for p in pairs])
        b = pa.array([p[1] for p in pairs])
        batch = jw_batch(a, b)
        con = duckdb.connect()
        for i, (s, t) in enumerate(pairs):
            duck = con.execute(
                "select jaro_winkler_similarity(?, ?)", [s, t]
            ).fetchone()[0]
            one = jw_one(s, t)
            assert duck == one == batch[i], (s, t, duck, one, batch[i])

    def test_known_semantics(self):
        # integer transposition halving: d,b,c vs c,d,b is a 3-cycle ->
        # trans=3 halves to 1 (textbook 1.5 would give 0.625)
        assert jw_one("cdcbdcad", "dbc") == pytest.approx(0.6805555555555555)
        assert jw_one("", "") == 0.0
        assert jw_one("a", "a") == 1.0
        # byte domain: 'café' is 5 UTF-8 bytes
        assert jw_one("café", "cafe") == pytest.approx(0.8483333333333334)

    def test_batch_empty(self):
        assert len(jw_batch(pa.array([], pa.string()), pa.array([], pa.string()))) == 0
