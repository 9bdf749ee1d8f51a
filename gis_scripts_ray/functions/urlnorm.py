"""URL canonicalization — the CommonCrawl-style "same page, many spellings"
normalizer used for canonical-URL deduplication.

Web crawls record the same page under many URL spellings: scheme variants
(``http``/``https``), case differences in scheme and host, a leading
``www.``, explicit default ports (``:80``/``:443``), tracking query strings,
fragments, and trailing slashes. Canonical-URL dedup normalizes all of those
away and keeps one document per canonical URL (reference analogy: the
download-dedup "skip if already fetched" discipline of
``seagrass_lib.py`` D1, applied to the web-corpus key instead of a
filename).

Normalization contract (applied in this order):

1. strip the fragment (``#...``),
2. strip the query string (``?...``),
3. strip the scheme (``scheme://``, case-insensitive),
4. lowercase the HOST ONLY (paths stay case-sensitive, per RFC 3986),
   strip a leading ``www.`` and an explicit default port ``:80``/``:443``,
5. strip trailing slashes.

Both a vectorized Arrow kernel (:func:`canonicalize_urls`) and a bit-exact
per-row reference (:func:`canonicalize_url_one`) are provided; the parity
test in ``tests/test_urlnorm.py`` pins them against each other on hostile
inputs (repo rule: every vectorized kernel keeps its per-row oracle).

:func:`variant_urls_for_docs` synthesizes the messy spellings
deterministically from ``(doc_id, host)`` so oracle queries can exercise the
normalizer without external data — four spelling variants, all of which
canonicalize to ``host/p{doc_id // 3}`` (the ``// 3`` makes consecutive
same-host doc_ids genuine duplicates).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FRAGMENT_RE = r"(?s)#.*$"
_QUERY_RE = r"(?s)\?.*$"
_SCHEME_RE = r"(?i)^[a-z][a-z0-9+.-]*://"
_HOST_SPLIT_RE = r"(?s)^(?P<h>[^/]*)(?P<r>.*)$"
_WWW_RE = r"^www\."
_PORT_RE = r":(80|443)$"
_TRAILING_RE = r"/+$"


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonicalization (Arrow RE2 kernels, zero Python rows).

    Null inputs propagate to null outputs. Zero-row arrays are safe (every
    kernel here is length-preserving).
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    s = pc.replace_substring_regex(urls, _FRAGMENT_RE, "")
    s = pc.replace_substring_regex(s, _QUERY_RE, "")
    s = pc.replace_substring_regex(s, _SCHEME_RE, "")
    # Lowercase ONLY the host (everything before the first '/'): RE2 cannot
    # case-transform inside a replacement, so split host/rest via
    # extract_regex, transform the host, and rejoin.
    ext = pc.extract_regex(s, _HOST_SPLIT_RE)
    host = pc.utf8_lower(pc.struct_field(ext, "h"))
    rest = pc.struct_field(ext, "r")
    host = pc.replace_substring_regex(host, _WWW_RE, "")
    host = pc.replace_substring_regex(host, _PORT_RE, "")
    joined = pc.binary_join_element_wise(host, rest, "")
    return pc.replace_substring_regex(joined, _TRAILING_RE, "")


def canonicalize_url_one(url: str | None) -> str | None:
    """Per-row reference implementation (the parity oracle for
    :func:`canonicalize_urls`).

    End anchors are rewritten ``$`` → ``\\Z``: Python ``re``'s ``$`` also
    matches BEFORE a trailing newline, RE2's ``$`` only at end-of-text —
    for ``'https://h/p1/\\n'`` an unanchored oracle would strip the slash
    the Arrow kernel keeps (round-4 advice)."""
    if url is None:
        return None
    s = re.sub(_FRAGMENT_RE.replace("(?s)", ""), "", url, flags=re.S)
    s = re.sub(_QUERY_RE.replace("(?s)", ""), "", s, flags=re.S)
    s = re.sub(_SCHEME_RE.replace("(?i)", ""), "", s, flags=re.I)
    m = re.match(r"(?s)^([^/]*)(.*)$", s)
    host, rest = m.group(1).lower(), m.group(2)
    host = re.sub(_WWW_RE, "", host)
    host = re.sub(_PORT_RE.replace("$", r"\Z"), "", host)
    return re.sub(_TRAILING_RE.replace("$", r"\Z"), "", host + rest)


def variant_urls_for_docs(
    doc_id: np.ndarray, hosts: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """Deterministic messy-URL synthesis: spelling variant ``doc_id % 4``
    of page ``doc_id // 3`` on ``hosts[i]``. All four variants canonicalize
    to ``host/p{doc_id // 3}``:

    * 0: ``https://WWW.{host}/p{p}?utm_source=feed``
    * 1: ``http://{host}/p{p}/``
    * 2: ``https://{host}:443/p{p}#sec``
    * 3: ``https://www.{HOST}/p{p}`` (host uppercased)

    Vectorized (four full Arrow builds + an if_else select); the per-row
    reference is :func:`variant_url_one`.
    """
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    d = np.asarray(doc_id, dtype=np.int64)
    v = pa.array(d % 4)
    p = pc.cast(pa.array(d // 3), pa.string())

    def cat(*parts):
        return pc.binary_join_element_wise(*parts, "")

    u0 = cat("https://WWW.", hosts, "/p", p, "?utm_source=feed")
    u1 = cat("http://", hosts, "/p", p, "/")
    u2 = cat("https://", hosts, ":443/p", p, "#sec")
    u3 = cat("https://www.", pc.utf8_upper(hosts), "/p", p)
    out = pc.if_else(
        pc.equal(v, 0),
        u0,
        pc.if_else(pc.equal(v, 1), u1, pc.if_else(pc.equal(v, 2), u2, u3)),
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def variant_url_one(doc_id: int, host: str) -> str:
    """Per-row reference for :func:`variant_urls_for_docs`."""
    p = doc_id // 3
    v = doc_id % 4
    if v == 0:
        return f"https://WWW.{host}/p{p}?utm_source=feed"
    if v == 1:
        return f"http://{host}/p{p}/"
    if v == 2:
        return f"https://{host}:443/p{p}#sec"
    return f"https://www.{host.upper()}/p{p}"
