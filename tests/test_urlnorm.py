"""URL canonicalization: vectorized-kernel vs per-row-reference parity
(repo rule: every vectorized kernel keeps a bit-exact per-row oracle),
hostile-input behavior, and the variant-synthesis invariant that every
messy spelling canonicalizes to the analytic form ``host/p{doc_id // 3}``."""

import numpy as np
import pyarrow as pa

from gis_scripts_ray.functions.urlnorm import (
    canonicalize_url_one,
    canonicalize_urls,
    variant_url_one,
    variant_urls_for_docs,
)

HOSTILE = [
    "https://WWW.Site001.example.org:443/p12?q=1#f",
    "http://a.b/p4/",
    "HTTPS://www.X.Y/p9",
    "x.y/p1",  # schemeless
    "",
    "ftp://Files.Example.ORG:80/Dir/File.TXT",
    "https://host.example/",  # bare host, trailing slash
    "https://host.example:8080/p1",  # non-default port kept
    "https://host.example/Path/Is/CaseSensitive",
    "http://www.w.example/p2?utm=1&x=2#frag?fake",
    "https://h.example/p3#frag/with/slashes",
    "https://h.example/p5///",
    "www.only-www.example/p6",
    "https://UPPER.example/p7?Q=UPPER#F",
    # trailing-newline inputs: Python re's $ matches BEFORE a final
    # newline, RE2's $ only at end-of-text — the per-row oracle anchors
    # with \Z to match the Arrow kernel (round-4 advice)
    "https://h.example/p1/\n",
    "https://h.example:443\n",
    "https://h.example/p8\n/",
    None,
]


class TestCanonicalizeParity:
    def test_vectorized_matches_per_row(self):
        got = canonicalize_urls(pa.array(HOSTILE, pa.string())).to_pylist()
        want = [canonicalize_url_one(u) for u in HOSTILE]
        assert got == want

    def test_semantics_pinned(self):
        assert (
            canonicalize_url_one("https://WWW.Site001.example.org:443/p12?q=1#f")
            == "site001.example.org/p12"
        )
        # path case preserved, host lowered
        assert (
            canonicalize_url_one("https://UPPER.example/Path/Mixed")
            == "upper.example/Path/Mixed"
        )
        # non-default port preserved
        assert canonicalize_url_one("https://h.e:8080/p1") == "h.e:8080/p1"

    def test_zero_row(self):
        out = canonicalize_urls(pa.array([], pa.string()))
        assert len(out) == 0

    def test_chunked_input(self):
        ch = pa.chunked_array([HOSTILE[:5], HOSTILE[5:]], pa.string())
        got = canonicalize_urls(ch).to_pylist()
        assert got == [canonicalize_url_one(u) for u in HOSTILE]


class TestVariantSynthesis:
    def test_vectorized_matches_per_row(self):
        d = np.arange(0, 37, dtype=np.int64)
        hosts = [f"site{i % 3:03d}.example.org" for i in d]
        got = variant_urls_for_docs(d, pa.array(hosts)).to_pylist()
        want = [variant_url_one(int(i), h) for i, h in zip(d, hosts)]
        assert got == want

    def test_all_variants_canonicalize_to_analytic_form(self):
        d = np.arange(0, 24, dtype=np.int64)
        hosts = ["site007.example.org"] * len(d)
        messy = variant_urls_for_docs(d, pa.array(hosts))
        canon = canonicalize_urls(messy).to_pylist()
        assert canon == [f"site007.example.org/p{int(i) // 3}" for i in d]

    def test_zero_row(self):
        out = variant_urls_for_docs(
            np.array([], dtype=np.int64), pa.array([], pa.string())
        )
        assert len(out) == 0


class TestNormalizeTextParity:
    HOSTILE = [
        "  á  b\tc\n\nd  ",  # combining acute -> NFC composes
        "über  café",
        "\r\n\t mixed \r ws \n",
        "\x0bvertical-tab kept\x0c",  # NOT in the collapse class
        "",
        None,
        "no_change",
        " \t\r\n ",  # whitespace-only -> ''
        "日本語　全角スペースkept",  # U+3000 NOT collapsed (portable class)
    ]

    def test_vectorized_matches_per_row(self):
        import pyarrow as pa

        from gis_scripts_ray.stages.textstages import (
            normalize_text,
            normalize_text_one,
        )

        got = normalize_text(pa.array(self.HOSTILE, pa.string())).to_pylist()
        assert got == [normalize_text_one(t) for t in self.HOSTILE]

    def test_duckdb_agrees(self):
        import duckdb
        import pyarrow as pa

        from gis_scripts_ray.stages.textstages import normalize_text

        tbl = pa.table({"text": pa.array(self.HOSTILE, pa.string())})
        sql = (
            "SELECT trim(regexp_replace(nfc_normalize(COALESCE(text, '')), "
            "'[ \\t\\n\\r]+', ' ', 'g'), ' ') AS c FROM tbl"
        )
        want = [r[0] for r in duckdb.sql(sql).fetchall()]
        assert normalize_text(tbl["text"]).to_pylist() == want

    def test_zero_row(self):
        import pyarrow as pa

        from gis_scripts_ray.stages.textstages import normalize_text

        assert len(normalize_text(pa.array([], pa.string()))) == 0
