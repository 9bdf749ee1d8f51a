"""WARC source (sources/warc.py): record framing, member-per-record
gzip streaming, HTTP payload parse, malformed rejection, Ray read."""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.sources.warc import (
    encode_warc_gz,
    encode_warc_records,
    http_response,
    iter_warc_records,
    parse_http_payload,
    read_warc,
)


def _recs(n=5):
    out = []
    for i in range(n):
        out.append(
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"http://h{i}.example/p{i}",
                },
                "payload": http_response(200 if i % 2 else 404, b"b" * (i + 1)),
            }
        )
    return out


class TestWarcCodec:
    def test_plain_roundtrip(self):
        recs = _recs()
        got = list(iter_warc_records(encode_warc_records(recs)))
        assert [r["payload"] for r in got] == [r["payload"] for r in recs]
        assert [r["headers"]["WARC-Target-URI"] for r in got] == [
            r["headers"]["WARC-Target-URI"] for r in recs
        ]

    def test_gz_member_per_record_roundtrip(self):
        recs = _recs(7)
        pay = encode_warc_gz(recs)
        got = list(iter_warc_records(pay))
        assert [r["payload"] for r in got] == [r["payload"] for r in recs]
        # the layout really is one gzip member per record: each member
        # alone is a complete gzip stream holding exactly one record
        members = []
        rest = pay
        import zlib

        while rest:
            d = zlib.decompressobj(wbits=31)
            block = d.decompress(rest)
            members.append(block)
            assert d.eof
            rest = d.unused_data
        assert len(members) == 7
        for m, r in zip(members, recs):
            (one,) = list(iter_warc_records(m))  # plain parse of one member
            assert one["payload"] == r["payload"]

    def test_gz_deterministic_bytes(self):
        recs = _recs(3)
        assert encode_warc_gz(recs) == encode_warc_gz(recs)  # mtime pinned

    def test_http_payload_parse(self):
        status, headers, body = parse_http_payload(
            http_response(404, b"gone", content_type="text/plain")
        )
        assert status == 404
        assert headers["Content-Type"] == "text/plain"
        assert body == b"gone"
        with pytest.raises(ValueError):
            parse_http_payload(b"not http\r\n\r\nx")
        with pytest.raises(ValueError):
            parse_http_payload(b"HTTP/1.1 OK\r\n\r\n")  # non-integer status

    def test_malformed_rejected(self):
        good = encode_warc_records(_recs(1))
        for bad in (
            good[:-2],                      # missing final CRLF-CRLF
            good.replace(b"WARC/1.0", b"HARC/1.0"),
            good.replace(b"Content-Length", b"Content-Wrong"),
        ):
            with pytest.raises(ValueError):
                list(iter_warc_records(bad))
        # truncated gzip member
        gz = encode_warc_gz(_recs(2))
        with pytest.raises(ValueError):
            list(iter_warc_records(gz[: len(gz) // 2]))

    def test_mixed_record_types(self):
        recs = _recs(2) + [
            {
                "headers": {"WARC-Type": "request", "WARC-Target-URI": "http://a/b"},
                "payload": b"GET /b HTTP/1.1\r\n\r\n",
            }
        ]
        got = list(iter_warc_records(encode_warc_gz(recs)))
        assert [r["headers"]["WARC-Type"] for r in got] == [
            "response", "response", "request",
        ]


class TestIndexedFetch:
    def _shard_with_index(self, tmp_path, n=10):
        from gis_scripts_ray.sources.warc import encode_warc_gz

        recs = _recs(n)
        members = [encode_warc_gz([r]) for r in recs]
        path = tmp_path / "s.warc.gz"
        path.write_bytes(b"".join(members))
        offs, pos = [], 0
        for m in members:
            offs.append(pos)
            pos += len(m)
        idx = pa.table(
            {
                "target_uri": pa.array(
                    [r["headers"]["WARC-Target-URI"] for r in recs], pa.string()
                ),
                "warc_file": pa.array([str(path)] * n, pa.string()),
                "offset": pa.array(offs, pa.int64()),
                "length": pa.array([len(m) for m in members], pa.int64()),
            }
        )
        return recs, str(path), idx

    def test_members_fetch_exact_ranges(self, tmp_path):
        from gis_scripts_ray.sources.warc import fetch_warc_members

        recs, path, idx = self._shard_with_index(tmp_path)
        # fetch three members by byte range; bytes touched << shard size
        pick = [1, 4, 8]
        offs = [idx["offset"][i].as_py() for i in pick]
        lens = [idx["length"][i].as_py() for i in pick]
        got = list(fetch_warc_members(path, offs, lens))
        assert [g["payload"] for g in got] == [recs[i]["payload"] for i in pick]
        import os

        assert sum(lens) < os.path.getsize(path) / 2
        # a misaligned range is rejected, not silently misparsed
        with pytest.raises(ValueError):
            list(fetch_warc_members(path, [offs[0] + 1], [lens[0]]))

    def test_fetch_warc_records_dataset(self, ray_session, tmp_path):
        import ray

        from gis_scripts_ray.sources.warc import fetch_warc_records

        recs, path, idx = self._shard_with_index(tmp_path)
        wanted = [recs[2]["headers"]["WARC-Target-URI"],
                  recs[7]["headers"]["WARC-Target-URI"]]
        df = (
            fetch_warc_records(ray.data.from_arrow(idx), wanted)
            .to_pandas()
            .sort_values("target_uri")
            .reset_index(drop=True)
        )
        assert df["target_uri"].tolist() == sorted(wanted)
        assert df["http_status"].tolist() == [404, 200]  # i%2 fixture rule


class TestReadWarc:
    def test_read_warc_rows(self, ray_session, tmp_path):
        shard_a = tmp_path / "a.warc.gz"
        shard_b = tmp_path / "b.warc"
        shard_a.write_bytes(encode_warc_gz(_recs(4)))
        shard_b.write_bytes(encode_warc_records(_recs(2)))
        df = (
            read_warc([str(shard_a), str(shard_b)])
            .to_pandas()
            .sort_values(["warc_file", "target_uri"])
            .reset_index(drop=True)
        )
        assert len(df) == 6
        assert (df["warc_type"] == "response").all()
        # statuses and body lengths as encoded (i%2 -> 200 else 404)
        a_rows = df[df["warc_file"].str.endswith("a.warc.gz")]
        assert a_rows["http_status"].tolist() == [404, 200, 404, 200]
        assert [len(b) for b in a_rows["body"]] == [1, 2, 3, 4]
