"""HTML text extraction — the tag-stripping step every web-text
pipeline runs before quality filtering (the trafilatura/boilerpipe
position in the stack, reduced to its deterministic core).

Built on the stdlib ``html.parser`` state machine (a REAL HTML
tokenizer: attributes, comments, CDATA, entity and charref decoding),
with the extraction policy:

* ``<script>``, ``<style>``, ``<template>``, ``<noscript>`` subtrees
  contribute NOTHING (content suppressed until the matching close);
* block-level boundaries (``p, div, br, li, tr, h1..h6, section,
  article, header, footer, blockquote, pre, ul, ol, table``) emit one
  newline; inline tags (``a, b, i, em, strong, span, code, ...``)
  emit nothing — inline markup must not split words;
* text nodes are decoded (entities ``&amp;`` and charrefs ``&#65;``
  resolve) and whitespace INSIDE a text node is preserved verbatim —
  normalization is a separate stage's decision, not the extractor's;
* output collapses runs of newlines to one and strips leading/trailing
  whitespace (block boundaries are structure, not content).

``html_to_text`` is deterministic and total: any byte string yields a
string (the stdlib parser is error-recovering, like browsers); payloads
that fail UTF-8 decode strictly use replacement characters, flagged by
the stage. The actor stage mirrors ``PdfTextStage``.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa
import ray.data

_SUPPRESS = {"script", "style", "template", "noscript"}
_BLOCK = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "blockquote", "pre",
    "ul", "ol", "table", "hr", "title",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._suppress = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SUPPRESS:
            self._suppress += 1
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SUPPRESS:
            self._suppress = max(0, self._suppress - 1)
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._suppress:
            self.parts.append(data)


def html_to_text(markup: str) -> str:
    """Extract visible text: suppressed subtrees dropped, block tags
    become single newlines, entities decoded, runs of newlines
    collapsed, ends stripped."""
    p = _Extractor()
    p.feed(markup)
    p.close()
    raw = "".join(p.parts)
    lines = [ln.strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


class HtmlTextStage:
    """Actor-pool HTML text extraction over a binary (or string) column.
    Output: carry columns + ``html_text:string``, ``n_chars:int64``,
    ``decoded_ok:bool`` (False when the payload was not valid UTF-8 —
    text still extracted with replacement characters, never dropped)."""

    def __init__(self, payload_col: str):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names if c != self.payload_col]
        texts, nch, ok = [], [], []
        for payload in batch[self.payload_col].to_pylist():
            if payload is None:
                payload = b""
            if isinstance(payload, str):
                markup, valid = payload, True
            else:
                try:
                    markup, valid = payload.decode("utf-8"), True
                except UnicodeDecodeError:
                    markup, valid = payload.decode("utf-8", "replace"), False
            t = html_to_text(markup)
            texts.append(t)
            nch.append(len(t))
            ok.append(valid)
        cols = {c: batch[c] for c in carry_cols}
        cols["html_text"] = pa.array(texts, pa.string())
        cols["n_chars"] = pa.array(np.array(nch, np.int64), pa.int64())
        cols["decoded_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


def html_texts(
    ds: ray.data.Dataset,
    payload_col: str = "html",
    concurrency: "int | tuple[int, int]" = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """HTML text-extraction stage over a payload column (actor pool;
    small batch_size — payloads are wide rows)."""
    return ds.map_batches(
        HtmlTextStage,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
