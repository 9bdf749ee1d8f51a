"""WebDataset-style TAR shard source — the sharded-tar layout
(``{key}.{ext}`` members, samples grouped by key, shards iterated
sequentially) that multimodal training corpora ship in.

Pure-stdlib POSIX ustar implementation (no tarfile dependency keeps the
parser byte-deterministic and malformed-input-strict):

* :func:`encode_tar` — ustar headers (name <= 100 bytes, octal size,
  checksum over a space-filled checksum field, typeflag '0'), 512-byte
  body padding, two zero blocks of trailer; mtime pinned to 0 so shard
  bytes are deterministic;
* :func:`iter_tar` — header walk with checksum verification, size
  parsing, truncation detection; stops at the zero-block trailer;
* :func:`group_samples` — WebDataset grouping: members split into
  (key, ext) on the FIRST dot of the basename; consecutive members of
  one key form one sample (the format's contract: a sample's members
  are adjacent);
* :func:`read_webdataset` — Ray source, one task per shard (the
  WebDataset iteration unit), one row per sample, one binary column
  per extension.

Malformed headers (bad checksum, non-octal size, truncation) raise
ValueError — quarantined, never silent.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode("ascii") + b"\x00"


def encode_tar(members: "list[tuple[str, bytes]]") -> bytes:
    """Serialize (name, payload) members as a POSIX ustar archive;
    mtime 0, mode 0644, uid/gid 0 — byte-deterministic."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError(f"tar: member name over 100 bytes: {name!r}")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal(0o644, 8)
        hdr[108:116] = _octal(0, 8)
        hdr[116:124] = _octal(0, 8)
        hdr[124:136] = _octal(len(payload), 12)
        hdr[136:148] = _octal(0, 12)          # mtime pinned
        hdr[148:156] = b" " * 8               # checksum field spaces
        hdr[156] = ord("0")                   # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}".encode("ascii") + b"\x00 "
        out += hdr
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def iter_tar(data: bytes):
    """Yield (name, payload) from a ustar archive; checksum-verified,
    truncation-strict; stops at the zero-block trailer."""
    pos = 0
    n = len(data)
    while pos + _BLOCK <= n:
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            return  # trailer
        stored = hdr[148:156]
        try:
            want = int(stored.rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
        except ValueError:
            raise ValueError("tar: non-octal checksum field")
        got = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if got != want:
            raise ValueError("tar: header checksum mismatch")
        name = hdr[:100].rstrip(b"\x00").decode("utf-8")
        try:
            size = int(hdr[124:136].rstrip(b"\x00 ") or b"0", 8)
        except ValueError:
            raise ValueError("tar: non-octal size field")
        body_lo = pos + _BLOCK
        if body_lo + size > n:
            raise ValueError("tar: member body past end of archive")
        yield name, data[body_lo : body_lo + size]
        pos = body_lo + size + (-size % _BLOCK)
    if pos != n:
        raise ValueError("tar: truncated header block")
    raise ValueError("tar: missing zero-block trailer")


def group_samples(members: "list[tuple[str, bytes]]"):
    """WebDataset grouping: basename splits (key, ext) on the FIRST
    dot; adjacent members of one key form one sample dict."""
    out: list = []
    cur_key = None
    cur: "dict | None" = None
    for name, payload in members:
        base = name.rsplit("/", 1)[-1]
        dot = base.find(".")
        if dot <= 0:
            raise ValueError(f"tar: member without extension: {name!r}")
        key, ext = base[:dot], base[dot + 1 :]
        if key != cur_key:
            cur = {"__key__": key}
            out.append(cur)
            cur_key = key
        if ext in cur:
            raise ValueError(f"tar: duplicate extension {ext!r} for key {key!r}")
        cur[ext] = payload
    return out


def read_webdataset(
    paths: "str | list[str]", extensions: "list[str]"
) -> ray.data.Dataset:
    """Read WebDataset tar shard(s): one row per sample with __key__,
    one binary column per requested extension (missing members are
    null), and the shard path. One task per shard — the WebDataset
    sequential-iteration unit."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def expand(batch: pa.Table) -> pa.Table:
        keys, shard = [], []
        cols: dict = {e: [] for e in extensions}
        for path, data in zip(batch["path"], batch["bytes"]):
            for sample in group_samples(list(iter_tar(data.as_py()))):
                keys.append(sample["__key__"])
                shard.append(path.as_py())
                for e in extensions:
                    cols[e].append(sample.get(e))
        out = {
            "__key__": pa.array(keys, pa.string()),
        }
        for e in extensions:
            out[e] = pa.array(cols[e], pa.binary())
        out["shard"] = pa.array(shard, pa.string())
        return pa.table(out)

    return files.map_batches(expand, batch_format="pyarrow", batch_size=1)
