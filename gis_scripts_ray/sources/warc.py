"""WARC (ISO 28500) source — the web-archive interchange format.

Web-scale corpora ship as sharded ``.warc.gz`` files with ONE GZIP
MEMBER PER RECORD (the CommonCrawl convention): members concatenate
into a valid gzip stream, yet any record can be decompressed alone
given its byte offset — the property that makes record-level splits
and index-driven random access possible at 100 TB. This module
implements both sides for real with stdlib zlib:

* writers: :func:`encode_warc_records` (plain ``.warc``) and
  :func:`encode_warc_gz` (member-per-record ``.warc.gz``);
* parser: :func:`iter_warc_records` — sniffs gzip vs plain, walks
  members via ``zlib.decompressobj(wbits=31).unused_data``, parses the
  WARC header block (version line, named headers, ``Content-Length``
  framing, CRLF-CRLF terminators) and, for ``response`` records, the
  embedded HTTP/1.1 status line and headers;
* Ray source: :func:`read_warc` — one task per WARC shard.

Scale contract: corpus convention shards WARC at ~1 GB/file, so
file-per-task IS the parallel unit (exactly how CommonCrawl is
processed); within a task, records stream member-by-member without
materializing the decompressed shard. Malformed records raise
ValueError (quarantined by the caller, never silent).
"""

from __future__ import annotations

import gzip
import zlib

import numpy as np
import pyarrow as pa
import ray.data

_CRLF2 = b"\r\n\r\n"


def encode_warc_records(records: "list[dict]") -> bytes:
    """Serialize WARC records: each ``dict`` carries ``headers`` (name ->
    value, must include WARC-Type) and ``payload`` bytes."""
    out = bytearray()
    for rec in records:
        head_lines = [b"WARC/1.0"]
        for k, v in rec["headers"].items():
            head_lines.append(f"{k}: {v}".encode("latin-1"))
        payload = rec["payload"]
        head_lines.append(f"Content-Length: {len(payload)}".encode())
        out += b"\r\n".join(head_lines) + _CRLF2 + payload + _CRLF2
    return bytes(out)


def encode_warc_gz(records: "list[dict]") -> bytes:
    """Member-per-record gzip WARC: each record compresses to its own
    gzip member (mtime pinned to 0 for byte-determinism)."""
    return b"".join(
        gzip.compress(encode_warc_records([rec]), mtime=0) for rec in records
    )


def http_response(
    status: int, body: bytes, content_type: str = "text/html"
) -> bytes:
    """Minimal HTTP/1.1 response payload for a WARC response record."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              500: "Internal Server Error"}.get(status, "Unknown")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body


def _parse_warc_block(block: bytes, pos: int) -> "tuple[dict, int]":
    """Parse ONE record starting at ``pos`` in an uncompressed block;
    returns (record dict, next position)."""
    end_head = block.find(_CRLF2, pos)
    if end_head < 0:
        raise ValueError("warc: record header without CRLF-CRLF terminator")
    lines = block[pos:end_head].split(b"\r\n")
    if not lines[0].startswith(b"WARC/"):
        raise ValueError("warc: missing WARC version line")
    headers: dict = {}
    for line in lines[1:]:
        sep = line.find(b":")
        if sep < 0:
            raise ValueError("warc: malformed header line")
        headers[line[:sep].decode("latin-1").strip()] = (
            line[sep + 1 :].decode("latin-1").strip()
        )
    try:
        clen = int(headers["Content-Length"])
    except (KeyError, ValueError):
        raise ValueError("warc: missing or non-integer Content-Length")
    body_lo = end_head + 4
    body_hi = body_lo + clen
    if block[body_hi : body_hi + 4] != _CRLF2:
        raise ValueError("warc: record not terminated by CRLF-CRLF")
    return {"headers": headers, "payload": block[body_lo:body_hi]}, body_hi + 4


def iter_warc_records(data: bytes):
    """Yield record dicts from a plain or member-per-record-gzip WARC.
    Gzip members decompress one at a time (``unused_data`` chains to the
    next member) — the whole shard is never held decompressed."""
    if data[:2] == b"\x1f\x8b":
        rest = data
        while rest:
            d = zlib.decompressobj(wbits=31)
            try:
                block = d.decompress(rest)
            except zlib.error as e:
                raise ValueError(f"warc: corrupt gzip member: {e}")
            pos = 0
            while pos < len(block):
                rec, pos = _parse_warc_block(block, pos)
                yield rec
            if not d.eof:
                raise ValueError("warc: truncated gzip member")
            rest = d.unused_data
        return
    pos = 0
    while pos < len(data):
        rec, pos = _parse_warc_block(data, pos)
        yield rec


def parse_http_payload(payload: bytes) -> "tuple[int, dict, bytes]":
    """Split a response record's HTTP payload into (status, headers,
    body)."""
    end_head = payload.find(_CRLF2)
    if end_head < 0:
        raise ValueError("warc: http payload without header terminator")
    lines = payload[:end_head].split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("warc: malformed http status line")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError("warc: non-integer http status")
    headers = {}
    for line in lines[1:]:
        sep = line.find(b":")
        if sep < 0:
            raise ValueError("warc: malformed http header line")
        headers[line[:sep].decode("latin-1").strip()] = (
            line[sep + 1 :].decode("latin-1").strip()
        )
    return status, headers, payload[end_head + 4 :]


def _records_table(data: bytes, path: str) -> pa.Table:
    types, uris, statuses, bodies, ctypes = [], [], [], [], []
    for rec in iter_warc_records(data):
        h = rec["headers"]
        rtype = h.get("WARC-Type", "")
        types.append(rtype)
        uris.append(h.get("WARC-Target-URI", ""))
        if rtype == "response":
            status, hh, body = parse_http_payload(rec["payload"])
            statuses.append(status)
            ctypes.append(hh.get("Content-Type", ""))
            bodies.append(body)
        else:
            statuses.append(-1)
            ctypes.append("")
            bodies.append(rec["payload"])
    return pa.table(
        {
            "warc_type": pa.array(types, pa.string()),
            "target_uri": pa.array(uris, pa.string()),
            "http_status": pa.array(np.array(statuses, np.int64), pa.int64()),
            "content_type": pa.array(ctypes, pa.string()),
            "body": pa.array(bodies, pa.binary()),
            "warc_file": pa.array([path] * len(types), pa.string()),
        }
    )


def fetch_warc_members(
    path: str, offsets: "list[int]", lengths: "list[int]"
):
    """Record-level random access — the payoff of member-per-record
    gzip: seek to a member's byte offset, read exactly its length,
    decompress that member ALONE, and parse its records. Never touches
    the rest of the shard (the CommonCrawl CDX access pattern). Yields
    record dicts in the given order; raises ValueError if a range does
    not decode to a complete member."""
    with open(path, "rb") as f:
        for off, ln in zip(offsets, lengths):
            f.seek(off)
            blob = f.read(ln)
            if len(blob) != ln:
                raise ValueError("warc: index range past end of shard")
            rest = blob
            while rest:
                d = zlib.decompressobj(wbits=31)
                try:
                    block = d.decompress(rest)
                except zlib.error as e:
                    raise ValueError(f"warc: corrupt indexed member: {e}")
                if not d.eof:
                    raise ValueError(
                        "warc: index range does not end on a member boundary"
                    )
                pos = 0
                while pos < len(block):
                    rec, pos = _parse_warc_block(block, pos)
                    yield rec
                rest = d.unused_data


def fetch_warc_records(
    index: ray.data.Dataset, uris: "list[str]"
) -> ray.data.Dataset:
    """Fetch ONLY the requested URIs from WARC shards via a CDX-style
    index dataset with columns (target_uri, warc_file, offset, length):
    filter the (small, compacted) index to the wanted URIs, group hits
    by shard, and byte-range-read just those members — one task per
    shard, bytes read = sum of the hit members' lengths, never the
    corpus. Output schema matches :func:`read_warc`. Contract: ``uris``
    is a driver-sized probe set (a point-lookup API); a corpus-sized
    wanted set is a semi-join of the index instead
    (``joins.hash_join`` on target_uri), not this function."""
    import pyarrow.compute as pc

    wanted = pa.array(sorted(set(uris)), pa.string())
    hits = index.map_batches(
        lambda b: b.filter(pc.is_in(b["target_uri"], value_set=wanted)),
        batch_format="pyarrow",
    )

    def fetch_group(g: pa.Table) -> pa.Table:
        path = g["warc_file"][0].as_py()
        g = g.sort_by("offset")
        recs = list(
            fetch_warc_members(
                path,
                g["offset"].to_pylist(),
                g["length"].to_pylist(),
            )
        )
        block = encode_warc_records(recs)
        return _records_table(block, path)

    return hits.groupby("warc_file").map_groups(
        fetch_group, batch_format="pyarrow"
    )


def read_warc(paths: "str | list[str]") -> ray.data.Dataset:
    """Read WARC shard(s) into rows (warc_type, target_uri, http_status,
    content_type, body, warc_file). Parallel unit = file, matching the
    ~1 GB shard convention of web-scale archives; the flat_map fuses
    with downstream batch stages."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def expand(batch: pa.Table) -> pa.Table:
        tables = [
            _records_table(data.as_py(), path.as_py())
            for path, data in zip(batch["path"], batch["bytes"])
        ]
        if not tables:
            return _records_table(b"", "")
        return pa.concat_tables(tables)

    return files.map_batches(expand, batch_format="pyarrow", batch_size=1)
