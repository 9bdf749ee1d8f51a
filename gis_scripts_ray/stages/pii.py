"""PII detection and redaction over the text column — the scrub pass
every training-data pipeline runs before anything else ships.

Engine shape: ONE fused ``map_batches`` per pass, vectorized polars
regex kernels (compiled once per worker by polars' expression cache) —
no shuffle, no state. The reference has no text-PII analog (its data is
imagery); the patterns and replace semantics here follow the common
open-web scrub recipes (email / NANP-style phone / IPv4), kept simple
enough that all three engines — polars (Rust regex), DuckDB (RE2) and
Python ``re`` — apply IDENTICAL semantics on any input: ASCII character
classes and ASCII word boundaries everywhere, with the boundary spelled
per engine (see ``PII_PATTERNS``). That equivalence is what makes the
full SQL oracle twin possible (``q_pii_redact`` hash-compares the
redacted TEXT itself).

Per CLAUDE.md's kernel rule the per-row Python ``re`` reference
implementations are kept (`*_row`) with bit-exactness parity tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (module convention)
import polars as pl
import pyarrow as pa
import ray.data

# Canonical spelling = the RE2/DuckDB one: explicit [0-9] (RE2's \d is
# ASCII-only; polars/Python \d is Unicode — full-width '１２３' would
# diverge) and a plain \b, which RE2 evaluates with ASCII word-char
# semantics. The OTHER engines must be forced to the same ASCII
# semantics — Rust regex via the inline (?-u:\b) group, Python re via
# the global (?a) flag — or text with non-ASCII word characters
# adjacent to PII matches in some engines and not others. No
# lookaround anywhere (RE2 has none).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IPV4]"),
]

# Rust-regex (polars) spelling: ASCII word boundary
_POLARS_PATTERNS = [
    (kind, pat.replace(r"\b", r"(?-u:\b)"), repl)
    for kind, pat, repl in PII_PATTERNS
]

# Python-re spelling: (?a) makes \b (and \w used by it) ASCII
_RE_PATTERNS = [("(?a)" + pat) for _, pat, _ in PII_PATTERNS]


def _series(batch: pa.Table, text_col: str) -> pl.Series:
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return s.fill_null("")


def pii_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row PII match counts: input columns minus text, plus one
    ``n_<kind>`` int64 column per pattern. Counting runs the patterns in
    PII_PATTERNS order on the ORIGINAL text (counts are independent —
    the fixture/tests pin non-overlapping matches, same as the SQL twin)."""
    s = _series(batch, text_col)
    out = batch.drop_columns([text_col])
    for kind, pat, _ in _POLARS_PATTERNS:
        n = s.str.count_matches(pat).to_numpy().astype(np.int64)
        out = out.append_column("n_" + kind, pa.array(n, pa.int64()))
    return out


def pii_counts_row(text: "str | None") -> "dict[str, int]":
    """Per-row reference (Python ``re``) for :func:`pii_counts`."""
    import re

    t = text or ""
    return {
        "n_" + kind: len(re.findall(pat, t))
        for (kind, _, _), pat in zip(PII_PATTERNS, _RE_PATTERNS)
    }


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace every PII match with its placeholder, patterns applied in
    PII_PATTERNS order (order matters when a replacement could create or
    destroy later matches — the fixed order IS the contract, mirrored in
    the SQL twin's nested ``regexp_replace`` calls)."""
    s = _series(batch, text_col)
    for _, pat, repl in _POLARS_PATTERNS:
        s = s.str.replace_all(pat, repl)
    cols = {c: batch[c] for c in batch.column_names}
    cols[text_col] = s.to_arrow().cast(pa.string())
    return pa.table(cols)


def redact_pii_row(text: "str | None") -> str:
    """Per-row reference (Python ``re``) for :func:`redact_pii`."""
    import re

    t = text or ""
    for (_, _, repl), pat in zip(PII_PATTERNS, _RE_PATTERNS):
        t = re.sub(pat, repl, t)
    return t


def pii_scan(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Dataset wrapper: per-row counts (fused task stage, no shuffle)."""
    return ds.map_batches(
        pii_counts, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )


def pii_redact(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Dataset wrapper: redacted text (fused task stage, no shuffle)."""
    return ds.map_batches(
        redact_pii, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )
