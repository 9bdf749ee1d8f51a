"""Domain-blocklist URL filtering — the crawl-hygiene step that drops
documents from blocked registrable domains, with REGISTRABLE-SUFFIX
semantics: blocking ``example.org`` blocks ``example.org`` itself and
every subdomain (``a.b.example.org``), but NOT ``notexample.org``.

Kernel design: a blocklist entry matches host h iff the entry equals h
or is a '.'-boundary suffix of h. Reversed-label keys make that a
PREFIX relation (``a.b.example.org`` -> ``org.example.b.a.``;
``example.org`` -> ``org.example.``; trailing dot enforces the label
boundary, so ``org.example.`` never prefix-matches ``org.examples.``).
Matching enumerates each host's ancestor keys (a host has <= ~10
labels) against the blocklist hash set — exact, no
longest-prefix-under-sort pitfalls. Hosts dictionary-encode first so
work scales with DISTINCT hosts per batch (the minhash distinct-text
pattern), and the blocklist is driver-sized by contract (broadcast
once by callers).

``blocked_host_one`` is the per-row reference the vectorized batch
kernel must match bit-for-bit (repo parity rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rev_key(name: str) -> str:
    return ".".join(reversed(name.lower().split("."))) + "."


def build_blocklist(domains: "list[str]") -> "frozenset[str]":
    """Normalize a blocklist to its reversed-key set (driver-sized)."""
    out = set()
    for d in domains:
        d = d.strip().strip(".").lower()
        if not d:
            raise ValueError("blocklist: empty domain entry")
        out.add(_rev_key(d))
    return frozenset(out)


def blocked_host_one(host: "str | None", keys: "frozenset[str]") -> bool:
    """Per-row reference: is this host blocked? (None never matches.)"""
    if not host:
        return False
    labels = host.lower().strip(".").split(".")
    acc = ""
    for lab in reversed(labels):
        acc = acc + lab + "."
        if acc in keys:
            return True
    return False


def blocked_mask(
    hosts: "pa.Array | pa.ChunkedArray", keys: "frozenset[str]"
) -> np.ndarray:
    """Vectorized over a batch: bool mask of blocked hosts. Dictionary-
    encodes so the ancestor walk runs once per DISTINCT host."""
    arr = (
        hosts.combine_chunks() if isinstance(hosts, pa.ChunkedArray) else hosts
    )
    dic = arr.dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    verdict = np.fromiter(
        (blocked_host_one(u, keys) for u in uniq), dtype=bool, count=len(uniq)
    )
    idx = dic.indices.to_numpy(zero_copy_only=False)
    out = np.zeros(len(arr), dtype=bool)
    valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(arr), bool)
    out[valid] = verdict[idx[valid].astype(np.int64)]
    return out
