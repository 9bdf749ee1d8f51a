"""Domain blocklist kernel (functions/blocklist.py)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_scripts_ray.functions.blocklist import (
    blocked_host_one,
    blocked_mask,
    build_blocklist,
)

KEYS = build_blocklist(["example.org", "Spam.NET", "a1.b7.example.io"])


class TestBlocklist:
    @pytest.mark.parametrize(
        "host,want",
        [
            ("example.org", True),
            ("a.b.example.org", True),
            ("notexample.org", False),      # no label boundary
            ("org", False),                  # bare TLD of an entry
            ("spam.net", True),              # case-normalized entry
            ("x.SPAM.net", True),            # case-normalized host
            ("spam.net.evil", False),        # entry as PREFIX, not suffix
            ("a1.b7.example.io", True),
            ("b7.example.io", False),        # parent of an entry
            ("z.a1.b7.example.io", True),
            ("example.org.", True),          # trailing-dot FQDN form
            (None, False),
            ("", False),
        ],
    )
    def test_reference_semantics(self, host, want):
        assert blocked_host_one(host, KEYS) is want

    def test_batch_matches_reference(self):
        hosts = [
            "example.org", "a.b.example.org", "notexample.org", "org",
            "spam.net", "x.SPAM.net", "spam.net.evil", None, "",
            "z.a1.b7.example.io", "b7.example.io",
        ]
        got = blocked_mask(pa.array(hosts, pa.string()), KEYS)
        assert got.tolist() == [blocked_host_one(h, KEYS) for h in hosts]

    def test_chunked_and_dictionary_scaling(self):
        # repeated hosts: verdict computed once per distinct value
        hosts = pa.chunked_array(
            [pa.array(["spam.net"] * 100), pa.array([None, "ok.example.net"])]
        )
        got = blocked_mask(hosts, KEYS)
        assert got[:100].all() and not got[100:].any()

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc.", min_size=1, max_size=12).filter(
                lambda s: s.strip(".") and ".." not in s
            ),
            min_size=1,
            max_size=4,
        ),
        st.lists(
            st.text(alphabet="abc.", min_size=0, max_size=16).filter(
                lambda s: ".." not in s
            ),
            min_size=0,
            max_size=20,
        ),
    )
    def test_batch_reference_property(self, domains, hosts):
        keys = build_blocklist(domains)
        got = blocked_mask(pa.array(hosts, pa.string()), keys)
        assert got.tolist() == [blocked_host_one(h, keys) for h in hosts]

    def test_empty_entry_rejected(self):
        with pytest.raises(ValueError):
            build_blocklist(["ok.com", "   "])
