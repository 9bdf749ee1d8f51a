"""Tabular interchange sources — NDJSON(.gz), CSV and ORC.

The reference ingests whatever the upstream provider ships
(``download_glad_phase1.py`` pulls vendor files as-is before any
processing); at web scale the three tabular interchange formats that
actually arrive next to Parquet are newline-delimited JSON (API dumps,
event logs — usually gzipped), CSV (vendor exports) and ORC (Hive-era
warehouses).  This module gives each one a byte-deterministic encoder
(for building sharded fixtures and sinks) and a Ray read path:

* NDJSON and CSV go through the NATIVE ``ray.data.read_json`` /
  ``ray.data.read_csv`` datasources (file-per-task splitting, gzip
  decompression inferred from the ``.gz`` extension, Arrow-native
  parsing) — the engine exercises the stock source API rather than a
  bespoke parser;
* ORC has no stock Ray reader in this Ray version, so :func:`read_orc`
  maps ``pyarrow.orc`` over ``read_binary_files`` — one file per task
  with COLUMN PRUNING pushed into the ORC stripe reader (only the
  requested columns' streams decode; at 100 TB the shard-per-task +
  column-pruned read is the same contract as the Parquet path).

Float exactness contract (pinned by tests/test_tabular.py): every
encoder must round-trip ``double`` columns BIT-EXACTLY —
polars/Arrow emit shortest-round-trip decimal reprs and Arrow parses
with correctly-rounded strtod, so value-hash oracles survive the
text formats.  Timestamps travel as int64 microseconds in NDJSON
(JSON has no timestamp type) and as ISO text in CSV (re-cast to
``timestamp[us]`` on read — the repo-wide normalization rule).
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa
import ray.data


def encode_ndjson_gz(table: pa.Table) -> bytes:
    """Serialize a table as gzipped NDJSON (one JSON object per line,
    gzip mtime pinned to 0 for byte-determinism).  Floats are written
    shortest-round-trip (polars ryu), so doubles survive bit-exactly.
    Timestamp columns are rejected — callers convert to int64 micros
    first (JSON has no timestamp type; text-formatted datetimes would
    re-infer differently on read)."""
    import polars as pl

    for f in table.schema:
        if pa.types.is_timestamp(f.type):
            raise ValueError(
                f"ndjson: convert timestamp column {f.name!r} to int64 "
                "microseconds before encoding"
            )
    buf = io.BytesIO()
    df = pl.from_arrow(table)
    df.write_ndjson(buf)
    return gzip.compress(buf.getvalue(), mtime=0)


def encode_csv(table: pa.Table) -> bytes:
    """Serialize a table as RFC-4180 CSV with a header row (Arrow's
    writer: shortest-round-trip floats, ISO-8601 timestamps)."""
    import pyarrow.csv as pcsv

    buf = io.BytesIO()
    pcsv.write_csv(table, buf)
    return buf.getvalue()


def encode_orc(table: pa.Table) -> bytes:
    """Serialize a table as a single-stripe ORC file."""
    import pyarrow.orc as porc

    buf = io.BytesIO()
    porc.write_table(table, buf)
    return buf.getvalue()


def csv_convert_options(schema: pa.Schema):
    """Explicit per-column types for ``ray.data.read_csv`` — at scale,
    per-block type INFERENCE is the classic CSV failure (one block of
    all-null or all-integer-looking values infers a different type and
    the union fails downstream), so readers always pass the declared
    schema."""
    import pyarrow.csv as pcsv

    return pcsv.ConvertOptions(
        column_types={f.name: f.type for f in schema}
    )


def read_orc(
    paths: "str | list[str]", columns: "list[str] | None" = None
) -> ray.data.Dataset:
    """Read ORC file(s) as a Dataset: one task per file (the ORC
    parallel unit here; a multi-stripe production reader would split on
    stripe boundaries the same way Parquet splits on row groups), with
    ``columns=`` pruned INSIDE the ORC reader so unrequested streams
    never decompress.  Malformed files raise ValueError (quarantined by
    the caller, never silently dropped)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as porc

        parts = []
        for path, data in zip(batch["path"], batch["bytes"]):
            try:
                f = porc.ORCFile(pa.BufferReader(data.as_py()))
                parts.append(f.read(columns=columns))
            except pa.ArrowException as e:
                raise ValueError(f"orc: cannot read {path.as_py()!r}: {e}")
        return pa.concat_tables(parts)

    return files.map_batches(decode, batch_format="pyarrow", batch_size=1)
