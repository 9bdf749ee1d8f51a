"""End-to-end curation pipeline (pipelines/curate.py): WARC -> routed
extraction -> normalize/lang-ID -> gate -> dedup -> packing -> tar."""

import io
import json
import tarfile

import pytest

from gis_scripts_ray.pipelines.curate import curate_webcorpus
from gis_scripts_ray.sources.warc import (
    encode_warc_gz,
    http_response,
)
from gis_scripts_ray.stages.pdftext import encode_pdf_text


def _resp(uri, status, body, ctype="text/html"):
    return {
        "headers": {"WARC-Type": "response", "WARC-Target-URI": uri},
        "payload": http_response(status, body, content_type=ctype),
    }


def _fixture_shards(tmp_path):
    html_a = "the quick brown fox jumps over the lazy dog".encode()
    html_b = "ein kleiner text mit der und das und ist".encode()
    pdf = encode_pdf_text("extracted from a pdf body with enough tokens")
    short = b"too short"
    recs0 = [
        _resp("http://a.example/1", 200, html_a),
        _resp("http://a.example/dup", 200, html_a),  # exact duplicate text
        _resp("http://b.example/2", 200, html_b),
        {
            "headers": {"WARC-Type": "request", "WARC-Target-URI": "http://x/"},
            "payload": b"GET / HTTP/1.1\r\n\r\n",
        },
    ]
    recs1 = [
        _resp("http://c.example/3", 200, pdf, ctype="application/pdf"),
        _resp("http://d.example/4", 200, short),  # gated: < min_tokens
    ]
    p0 = tmp_path / "s0.warc.gz"
    p1 = tmp_path / "s1.warc.gz"
    p0.write_bytes(encode_warc_gz(recs0))
    p1.write_bytes(encode_warc_gz(recs1))
    return [str(p0), str(p1)]


def _read_shards(out_dir):
    samples = {}
    for tar in sorted(out_dir.glob("shard-*.tar")):
        tf = tarfile.open(fileobj=io.BytesIO(tar.read_bytes()))
        for info in tf:
            body = tf.extractfile(info).read()
            key, ext = info.name.split(".", 1)
            samples.setdefault(key, {})[ext] = body
    return samples


class TestCurate:
    def test_end_to_end(self, ray_session, tmp_path):
        shards = _fixture_shards(tmp_path)
        out = tmp_path / "out"
        stats = curate_webcorpus(shards, str(out), min_tokens=3, pack_window=8)
        # 5 responses, all extract; the 2-token doc is gated out later
        # at the dedup boundary: n_extracted counts gate survivors
        assert stats["n_extracted"] == 4  # short doc dropped by the gate
        assert stats["n_kept"] == 3       # exact duplicate text collapsed
        samples = _read_shards(out)
        assert len(samples) == 3
        texts = sorted(s["txt"].decode() for s in samples.values())
        assert texts[0] == "ein kleiner text mit der und das und ist"
        assert texts[1] == "extracted from a pdf body with enough tokens"
        assert texts[2] == "the quick brown fox jumps over the lazy dog"
        # metadata is well-formed and carries the pack assignment
        metas = [json.loads(s["json"].decode()) for s in samples.values()]
        assert all(
            set(m) == {"url", "lang", "pack_id", "pack_offset"} for m in metas
        )
        # the duplicate kept exactly one of the two urls (min doc_id)
        urls = {m["url"] for m in metas}
        assert len(urls & {"http://a.example/1", "http://a.example/dup"}) == 1
        # lang-ID ran: the german text classifies de, the english ones en
        by_text = {
            s["txt"].decode(): json.loads(s["json"].decode())["lang"]
            for s in samples.values()
        }
        assert by_text["ein kleiner text mit der und das und ist"] == "de"
        assert by_text["the quick brown fox jumps over the lazy dog"] == "en"
        # pack assignment is a consistent prefix sum over kept doc ids
        slots = sorted(
            (int(k), m["pack_id"], m["pack_offset"])
            for k, m in ((k, json.loads(s["json"].decode()))
                         for k, s in samples.items())
        )
        cum = 0
        for did, pid, off in slots:
            assert (pid, off) == (cum // 8, cum % 8)
            n = len(
                next(
                    s["txt"] for k, s in samples.items() if int(k) == did
                ).decode().split(" ")
            )
            cum += n

    def test_deterministic_output_bytes(self, ray_session, tmp_path):
        shards = _fixture_shards(tmp_path)
        out1 = tmp_path / "o1"
        out2 = tmp_path / "o2"
        curate_webcorpus(shards, str(out1), min_tokens=3, pack_window=8)
        curate_webcorpus(shards, str(out2), min_tokens=3, pack_window=8)
        a = {p.name: p.read_bytes() for p in out1.glob("*.tar")}
        b = {p.name: p.read_bytes() for p in out2.glob("*.tar")}
        assert a == b and a
