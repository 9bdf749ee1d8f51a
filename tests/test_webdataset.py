"""WebDataset tar source (sources/webdataset.py)."""

import io
import tarfile

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.sources.webdataset import (
    encode_tar,
    group_samples,
    iter_tar,
    read_webdataset,
)


def _members(n=4):
    out = []
    for i in range(n):
        out.append((f"shard0/{i:04d}.txt", f"text {i}".encode()))
        out.append((f"shard0/{i:04d}.cls", str(i % 3).encode()))
    return out


class TestTarCodec:
    def test_roundtrip_and_grouping(self):
        m = _members()
        pay = encode_tar(m)
        assert list(iter_tar(pay)) == m
        samples = group_samples(list(iter_tar(pay)))
        assert [s["__key__"] for s in samples] == [f"{i:04d}" for i in range(4)]
        assert samples[2]["txt"] == b"text 2" and samples[2]["cls"] == b"2"

    def test_stdlib_tarfile_reads_our_archive(self):
        """Third-party validation: the stdlib tar reader accepts our
        ustar bytes and sees identical members."""
        m = _members(3)
        tf = tarfile.open(fileobj=io.BytesIO(encode_tar(m)))
        got = [(i.name, tf.extractfile(i).read()) for i in tf]
        assert got == m

    def test_we_read_stdlib_tarfile_output(self):
        """And the reverse: a stdlib-written ustar parses identically."""
        m = _members(3)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for name, payload in m:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        assert list(iter_tar(buf.getvalue())) == m

    def test_deterministic_bytes(self):
        assert encode_tar(_members()) == encode_tar(_members())

    def test_padding_and_block_sizes(self):
        # bodies pad to 512; a 512-byte body gets no extra padding
        pay = encode_tar([("a.bin", b"z" * 512), ("b.bin", b"y" * 5)])
        assert len(pay) == 512 + 512 + 512 + 512 + 2 * 512
        assert list(iter_tar(pay)) == [("a.bin", b"z" * 512), ("b.bin", b"y" * 5)]

    def test_malformed_rejected(self):
        pay = encode_tar(_members(1))
        mut = bytearray(pay)
        mut[0] ^= 1  # name byte flips -> checksum mismatch
        with pytest.raises(ValueError, match="checksum"):
            list(iter_tar(bytes(mut)))
        with pytest.raises(ValueError, match="trailer|truncated|past end"):
            list(iter_tar(pay[: len(pay) - 1024]))  # trailer missing
        with pytest.raises(ValueError, match="truncated|past end"):
            list(iter_tar(pay[:600]))
        # grouping contract violations
        with pytest.raises(ValueError, match="extension"):
            group_samples([("noext", b"")])
        with pytest.raises(ValueError, match="duplicate"):
            group_samples([("k.txt", b""), ("k.txt", b"")])

    def test_name_over_100_bytes_rejected(self):
        with pytest.raises(ValueError, match="100"):
            encode_tar([("x" * 101 + ".txt", b"")])


class TestReadWebdataset:
    def test_rows_and_missing_members(self, ray_session, tmp_path):
        m = _members(3) + [("shard0/9999.txt", b"no cls for me")]
        p = tmp_path / "s0.tar"
        p.write_bytes(encode_tar(m))
        df = (
            read_webdataset([str(p)], extensions=["txt", "cls"])
            .to_pandas()
            .sort_values("__key__")
            .reset_index(drop=True)
        )
        assert df["__key__"].tolist() == ["0000", "0001", "0002", "9999"]
        assert df["txt"].tolist()[:3] == [b"text 0", b"text 1", b"text 2"]
        assert df["cls"].tolist() == [b"0", b"1", b"2", None]
        assert df["shard"].str.endswith("s0.tar").all()
