"""Tabular interchange sources (NDJSON.gz / CSV / ORC) — format contracts.

Pins (1) byte-determinism of every encoder, (2) BIT-EXACT double
round-trips including hostile values, (3) the native Ray readers'
behavior on the encoded shards (gzip inference, declared-schema CSV),
(4) ORC column pruning and the malformed-file ValueError contract, and
(5) the timestamp rejection in the NDJSON encoder.
"""

import glob
import gzip
import io
import struct

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.sources.tabular import (
    csv_convert_options,
    encode_csv,
    encode_ndjson_gz,
    encode_orc,
    read_orc,
)

# doubles that break lossy text formatters: non-dyadic decimals, exact
# halves, huge/tiny magnitudes, negative zero, subnormal, 2^53 boundary
HOSTILE = np.array(
    [
        0.1,
        -0.1,
        0.125,
        2.5,
        -2.5,
        1e300,
        -1e300,
        5e-324,
        -0.0,
        9007199254740993.0,  # 2**53 + 1 -> rounds to 2**53: still must round-trip
        1.7976931348623157e308,
        3.141592653589793,
    ],
    dtype=np.float64,
)


def _hostile_table() -> pa.Table:
    n = len(HOSTILE)
    return pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(HOSTILE, pa.float64()),
            "s": pa.array([f"r{i},\"q\"\n" for i in range(n)], pa.string()),
        }
    )


class TestEncoders:
    def test_ndjson_deterministic_and_exact(self):
        t = _hostile_table()
        b1, b2 = encode_ndjson_gz(t), encode_ndjson_gz(t)
        assert b1 == b2
        import pyarrow.json as pj

        back = pj.read_json(io.BytesIO(gzip.decompress(b1)))
        assert np.array_equal(back["v"].to_numpy(), HOSTILE)
        assert struct.pack("<d", back["v"][8].as_py()) == struct.pack("<d", -0.0)
        assert back["s"].to_pylist() == t["s"].to_pylist()

    def test_ndjson_rejects_timestamps(self):
        t = pa.table({"ts": pa.array([0], pa.timestamp("us"))})
        with pytest.raises(ValueError, match="int64 micro"):
            encode_ndjson_gz(t)

    def test_csv_deterministic_and_exact(self):
        t = _hostile_table()
        b1, b2 = encode_csv(t), encode_csv(t)
        assert b1 == b2
        import pyarrow.csv as pcsv

        back = pcsv.read_csv(
            io.BytesIO(b1), convert_options=csv_convert_options(t.schema)
        )
        assert np.array_equal(back["v"].to_numpy(), HOSTILE)
        # quoted embedded comma / quote / newline survive
        assert back["s"].to_pylist() == t["s"].to_pylist()

    def test_orc_deterministic_and_exact(self):
        t = _hostile_table()
        b1, b2 = encode_orc(t), encode_orc(t)
        assert b1 == b2
        import pyarrow.orc as porc

        back = porc.ORCFile(pa.BufferReader(b1)).read()
        assert np.array_equal(back["v"].to_numpy(), HOSTILE)


class TestRayReaders:
    def test_read_json_gz_shards(self, ray_session, tmp_path):
        import ray.data

        t = _hostile_table().drop_columns(["s"])
        for s in range(2):
            half = t.slice(s * 6, 6)
            (tmp_path / f"part-{s}.jsonl.gz").write_bytes(encode_ndjson_gz(half))
        ds = ray.data.read_json(sorted(glob.glob(f"{tmp_path}/part-*.jsonl.gz")))
        out = ds.sort("id").to_pandas()
        assert np.array_equal(out["v"].to_numpy(), HOSTILE)

    def test_read_csv_declared_schema(self, ray_session, tmp_path):
        import ray.data

        t = pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([1, 2_000_000], pa.timestamp("us")),
                # inference-hostile: looks integer-like in one shard
                "code": pa.array(["001", "1e3"], pa.string()),
            }
        )
        (tmp_path / "a.csv").write_bytes(encode_csv(t))
        ds = ray.data.read_csv(
            [str(tmp_path / "a.csv")],
            convert_options=csv_convert_options(t.schema),
        )
        out = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        assert out["code"].to_pylist() == ["001", "1e3"]
        assert out["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist() == [
            1,
            2_000_000,
        ]

    def test_read_orc_prunes_columns(self, ray_session, tmp_path):
        t = _hostile_table()
        (tmp_path / "a.orc").write_bytes(encode_orc(t))
        ds = read_orc([str(tmp_path / "a.orc")], columns=["id", "v"])
        out = ds.to_pandas()
        assert sorted(out.columns) == ["id", "v"]
        assert np.array_equal(np.sort(out["v"].to_numpy()), np.sort(HOSTILE))

    def test_read_orc_malformed_raises(self, ray_session, tmp_path):
        (tmp_path / "bad.orc").write_bytes(b"not an orc file at all")
        ds = read_orc([str(tmp_path / "bad.orc")])
        with pytest.raises(Exception, match="orc|ORC"):
            ds.materialize()
