"""Charset sniffing + decode — the byte-payload → text step a web
pipeline runs BEFORE any text stage, because real crawl payloads are
not all UTF-8 (the reference's imagery reads face the same problem one
level down: bytes are meaningless without the header's encoding).

Detection order is the WHATWG encoding-sniffing algorithm's
deterministic core:

1. **BOM** — EF BB BF → utf-8, FF FE → utf-16-le, FE FF → utf-16-be.
   A BOM always wins and is not part of the content.
2. **meta prescan** — scan the first 1024 bytes (ASCII-compatible) for
   ``<meta charset=...>`` / ``<meta http-equiv=content-type
   content="...charset=...">``; labels normalize per WHATWG
   (iso-8859-1 / latin1 / ascii label → windows-1252, utf8 → utf-8).
3. **strict UTF-8 probe** — payload that decodes strictly is utf-8.
4. **fallback** — windows-1252, the WHATWG default. Decoding uses the
   WEB windows-1252 table (the five bytes cp1252 leaves undefined —
   81 8D 8F 90 9D — map to the C1 controls, as browsers do), so any
   byte string yields a string: the stage is total, like the PNG/PDF
   decoders, and flags rather than drops.

``sniff_charset`` / ``decode_payload`` are the per-row reference
kernels; ``CharsetDecodeStage`` is the actor-pool stage.
"""

from __future__ import annotations

import codecs
import re

import pyarrow as pa
import ray.data

_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)

# WHATWG label → encoding name (the subset that matters for our
# deterministic fixtures; unknown labels fall through to the utf-8
# probe rather than erroring — sniffing must be total).
_LABELS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "l1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

# Web windows-1252: latin-1 identity except 0x80-0x9F, where the
# cp1252 glyphs apply and the five cp1252-undefined bytes stay as C1
# controls. Built once; applied as a str.translate over the latin-1
# (byte == codepoint) decode.
_W1252_HI = {}
for _b in range(0x80, 0xA0):
    try:
        _W1252_HI[_b] = ord(bytes([_b]).decode("cp1252"))
    except UnicodeDecodeError:
        _W1252_HI[_b] = _b


def _decode_w1252(payload: bytes) -> str:
    return payload.decode("latin-1").translate(_W1252_HI)


def sniff_charset(payload: bytes) -> tuple[str, str]:
    """(encoding, source) per the order above; source is one of
    'bom' | 'meta' | 'utf8-valid' | 'fallback'."""
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8", "bom"
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", "bom"
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", "bom"
    m = _META_RE.search(payload[:1024])
    if m:
        enc = _LABELS.get(m.group(1).decode("ascii").lower())
        if enc is not None:
            return enc, "meta"
    try:
        payload.decode("utf-8")
        return "utf-8", "utf8-valid"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_payload(payload: bytes) -> tuple[str, str, str, bool]:
    """(text, encoding, source, ok). BOM bytes are stripped from the
    content; ok=False when the DECLARED encoding could not decode the
    payload cleanly (replacement characters substituted, row kept)."""
    enc, src = sniff_charset(payload)
    if src == "bom":
        payload = payload[3 if enc == "utf-8" else 2 :]
    if enc == "windows-1252":
        return _decode_w1252(payload), enc, src, True
    try:
        return payload.decode(enc), enc, src, True
    except UnicodeDecodeError:
        return payload.decode(enc, "replace"), enc, src, False


class CharsetDecodeStage:
    """Actor-pool charset sniff + decode over a binary column. Output:
    carry columns + ``text:string``, ``encoding:string``,
    ``enc_source:string``, ``decoded_ok:bool``. Null payloads decode to
    '' (utf-8 / utf8-valid) — flagged path, never dropped."""

    def __init__(self, payload_col: str):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names if c != self.payload_col]
        texts, encs, srcs, oks = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            t, e, s, ok = decode_payload(b"" if payload is None else payload)
            texts.append(t)
            encs.append(e)
            srcs.append(s)
            oks.append(ok)
        cols = {c: batch[c] for c in carry_cols}
        cols["text"] = pa.array(texts, pa.string())
        cols["encoding"] = pa.array(encs, pa.string())
        cols["enc_source"] = pa.array(srcs, pa.string())
        cols["decoded_ok"] = pa.array(oks, pa.bool_())
        return pa.table(cols)


def decode_charsets(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    concurrency: "int | tuple[int, int]" = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Charset-sniffing decode stage (actor pool)."""
    return ds.map_batches(
        CharsetDecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
