"""PDF text extraction — the web-corpus "PDF to training text" stage.

The reference pipeline ingests whatever documents the crawl returns;
PDFs are the most common non-HTML text carrier. This module extracts
the text layer from UNENCRYPTED PDFs whose content streams are stored
raw or FlateDecode-compressed (stdlib zlib — the same inflate the PNG
decoder uses), which covers the vast majority of digitally-authored
PDFs. What it is NOT: a renderer (no fonts, no layout, no OCR) — image
-only/scanned PDFs yield empty text, and ``/Encrypt``-ed documents
raise ``NotImplementedError`` (the documented boundary: RC4/AES needs
a crypto provider). Malformed structure raises ValueError (quarantined,
never silent — the multimodal decode contract).

Mechanics (ISO 32000 subset):

* object scan: every ``N G obj ... endobj`` region; a ``stream``
  keyword inside carries a body ending at ``endstream``. The object
  dict chooses the filter: no filter (raw) or ``/FlateDecode``; any
  other filter (DCT, LZW, CCITT...) skips the stream — those are
  image/font payloads, not text.
* content scan: a tiny operator scanner over each decoded stream —
  PDF string literals ``( ... )`` with balanced nested parens and the
  full escape table (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal,
  line-continuation), hex strings ``<...>``, arrays. Text shows from
  ``Tj``, ``'``, ``\"`` and ``TJ`` operators; ``Td``/``TD``/``T*``
  emit newlines so lines stay separated.

Stage: :class:`PdfTextStage` (actor-pool ``map_batches``, the
DecodeStage pattern) emits extracted text + integer features per row;
broken payloads are flagged, never dropped.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import ray.data

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream(?:\r\n|\n|\r)")


def _pdf_streams(payload: bytes):
    """Yield (object_dict_bytes, decoded_stream_bytes) for every raw or
    FlateDecode stream in the document; skip streams with other filters
    (images/fonts)."""
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("pdf: object without endobj")
        body = payload[m.end() : end]
        sm = _STREAM_RE.search(body)
        if sm is None:
            continue
        se = body.rfind(b"endstream")
        if se < 0 or se < sm.end():
            raise ValueError("pdf: stream without endstream")
        head = body[: sm.start()]
        raw = body[sm.end() : se]
        # trailing EOL before 'endstream' belongs to the marker
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        if b"/Filter" not in head:
            yield head, raw
        elif b"/FlateDecode" in head:
            try:
                yield head, zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"pdf: corrupt FlateDecode stream: {e}")
        # other filters: not text-bearing in this subset — skipped


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\x08", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _scan_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    """Parse a PDF literal string starting at the '(' in data[pos];
    returns (bytes, position after the closing paren). Handles balanced
    nested parens, the escape table, octal escapes, and escaped-newline
    continuation."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(nxt)
                i += 2
            continue
        if c == 0x28:  # (
            depth += 1
            out.append(c)
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    raise ValueError("pdf: unterminated string literal")


def _scan_hex_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    end = data.find(b">", pos)
    if end < 0:
        raise ValueError("pdf: unterminated hex string")
    hx = bytes(c for c in data[pos + 1 : end] if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # odd count: trailing 0 per spec
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except (UnicodeDecodeError, ValueError):
        raise ValueError("pdf: invalid hex string")


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def extract_content_text(stream: bytes) -> str:
    """Extract the text layer from one content stream: strings shown by
    Tj / ' / \" / TJ become text; Td, TD, T* and ' start new lines."""
    out: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _scan_string(stream, i)
            pending.append(s)
        elif c == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # < not <<
            s, i = _scan_hex_string(stream, i)
            pending.append(s)
        elif c == 0x3C:  # << dict — skip the marker, contents scan on
            i += 2
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22, 0x2A):
            m = _OP_RE.match(stream, i)
            op = m.group()
            i = m.end()
            if op in (b"Tj", b"TJ"):
                out.extend(s.decode("latin-1") for s in pending)
            elif op == b"'":
                out.append("\n")
                out.extend(s.decode("latin-1") for s in pending)
            elif op == b'"':
                out.append("\n")
                # " takes two numeric args then the string
                out.extend(s.decode("latin-1") for s in pending)
            elif op in (b"Td", b"TD") or op == b"T*":
                out.append("\n")
            pending.clear()
        else:
            i += 1
    return "".join(out)


def decode_pdf_text(payload: bytes) -> str:
    """Extract the text layer of an unencrypted PDF (raw or FlateDecode
    content streams). ``/Encrypt`` raises ``NotImplementedError`` (the
    crypto boundary); malformed structure raises ValueError."""
    if payload is None or not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload:
        raise NotImplementedError(
            "encrypted PDF needs a crypto provider not present in this "
            "environment"
        )
    parts = [extract_content_text(s) for _head, s in _pdf_streams(payload)]
    return "".join(parts)


def encode_pdf_text(
    text: str, compress: bool = False, creator: str = "gis_scripts_ray"
) -> bytes:
    """Minimal valid single-page PDF around a text layer — the fixture
    generator and roundtrip partner of :func:`decode_pdf_text`:
    ``decode_pdf_text(encode_pdf_text(t)) == t`` exactly. Positioning
    uses ``Tm`` (no newline in the scanner) and ``T*`` between lines
    (exactly one newline each); parens and backslashes are escaped.
    ``compress=True`` stores the content stream FlateDecode."""
    def esc(line: str) -> bytes:
        b = line.encode("latin-1")
        return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")

    lines = text.split("\n")
    content = (
        b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm\n"
        + b"(" + esc(lines[0]) + b") Tj\n"
        + b"".join(b"T* (" + esc(l) + b") Tj\n" for l in lines[1:])
        + b"ET\n"
    )
    if compress:
        body = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        body, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(k).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


class PdfTextStage:
    """Actor-pool PDF text extraction over a binary column. Output:
    carry columns + ``pdf_text:string``, ``n_chars:int64``,
    ``n_lines:int64``, ``decoded_ok:bool``. Encrypted or malformed
    payloads emit a flagged row with empty text — never dropped."""

    def __init__(self, payload_col: str):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names if c != self.payload_col]
        texts, nch, nln, ok = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                t = decode_pdf_text(payload)
                texts.append(t)
                nch.append(len(t))
                nln.append(t.count("\n"))
                ok.append(True)
            except (ValueError, NotImplementedError):
                texts.append("")
                nch.append(0)
                nln.append(0)
                ok.append(False)
        cols = {c: batch[c] for c in carry_cols}
        cols["pdf_text"] = pa.array(texts, pa.string())
        cols["n_chars"] = pa.array(np.array(nch, np.int64), pa.int64())
        cols["n_lines"] = pa.array(np.array(nln, np.int64), pa.int64())
        cols["decoded_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


def pdf_texts(
    ds: ray.data.Dataset,
    payload_col: str = "pdf",
    concurrency: "int | tuple[int, int]" = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """PDF text-extraction stage over a binary column (actor pool; small
    batch_size — payloads are wide rows, the memory-aware sizing rule)."""
    return ds.map_batches(
        PdfTextStage,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
