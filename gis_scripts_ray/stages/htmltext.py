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
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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


class _LinkExtractor(HTMLParser):
    """Collects ``<a href>`` values in document order plus the FIRST
    ``<base href>`` (the only one the HTML spec honors). Tag-shaped
    text inside ``<script>``/``<style>`` is CDATA to the tokenizer, so
    fake links in script bodies are never collected."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.base: str | None = None

    def _handle(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag == "base" and self.base is None:
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.base = v
                    break

    handle_starttag = _handle
    handle_startendtag = _handle


def extract_links(markup: str, page_url: str) -> list[str]:
    """All ``<a href>`` targets of a page, resolved to absolute URLs per
    RFC 3986 (stdlib ``urljoin``) against the page URL — or against the
    page's first ``<base href>`` (itself resolved against the page URL)
    when one is present, which is how browsers resolve. Order preserved;
    duplicates preserved (frontier dedup is a separate stage's job —
    see ``canonical_url_dedup``)."""
    p = _LinkExtractor()
    p.feed(markup)
    p.close()
    base = urljoin(page_url, p.base) if p.base is not None else page_url
    return [urljoin(base, h) for h in p.hrefs]


class HtmlLinkStage:
    """Actor-pool hyperlink extraction: explodes each page into one row
    per outgoing link. Output columns: carry columns (repeated per
    link) + ``link_no:int64`` (document order) + ``link_url:string``
    (absolute). Pages with no links contribute no rows — the link graph
    is an edge list, not a page table."""

    def __init__(self, payload_col: str, url_col: str):
        self.payload_col = payload_col
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [
            c for c in batch.column_names if c not in (self.payload_col, self.url_col)
        ]
        urls = batch[self.url_col].to_pylist()
        take_idx: list[int] = []
        link_no: list[int] = []
        link_url: list[str] = []
        for i, payload in enumerate(batch[self.payload_col].to_pylist()):
            if payload is None:
                continue
            markup = (
                payload
                if isinstance(payload, str)
                else payload.decode("utf-8", "replace")
            )
            for j, u in enumerate(extract_links(markup, urls[i] or "")):
                take_idx.append(i)
                link_no.append(j)
                link_url.append(u)
        idx = pa.array(np.array(take_idx, np.int64))
        cols = {c: pc.take(batch[c], idx) for c in carry_cols}
        cols["link_no"] = pa.array(np.array(link_no, np.int64), pa.int64())
        cols["link_url"] = pa.array(link_url, pa.string())
        return pa.table(cols)


def html_links(
    ds: ray.data.Dataset,
    payload_col: str = "html",
    url_col: str = "url",
    concurrency: "int | tuple[int, int]" = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Hyperlink-extraction stage (actor pool): page rows in, one row
    per resolved outgoing link out."""
    return ds.map_batches(
        HtmlLinkStage,
        fn_constructor_kwargs={"payload_col": payload_col, "url_col": url_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


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
