"""Deterministic web-pages table synthesis + derivation from driver tables.

Per FIXTURES.md F1: hosts drawn from a fixed list of ~200 hosts spread over
~50 known (lat, lon) sites, urban-skewed (20% of hosts carry 80% of rows) to
exercise hot-cell salting. Everything is deterministic in ``doc_id`` with
seed 42 — no external data.

Two entry points:

* :func:`synthesize_web_pages` — pure generation at any row count (unit
  tests, benchmarks at arbitrary scale);
* :func:`web_pages_from_documents` — derive the web-pages table from the
  driver-materialized ``documents.parquet`` so correctness/bench runs use
  the mandated ``/root/testdata/sf*`` inputs; ``text`` is carried verbatim
  from the documents table (it is the byte-identity-audited column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

N_SITES = 50
N_HOSTS = 200
_HOT_FRACTION = 0.2  # fraction of hosts that are "hot"
_HOT_WEIGHT = 0.8  # fraction of rows carried by hot hosts
SEED = 42


def site_locations(seed: int = SEED) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) of the N_SITES deterministic sites.

    Sites are scattered worldwide but biased toward the northern
    mid-latitudes (where web hosts cluster), away from tile/hex boundaries:
    coordinates land on a 0.01-degree lattice offset by 0.003 so they never
    sit exactly on polygon edges synthesized on the 0.005 lattice.
    """
    rng = np.random.default_rng(seed)
    lat = np.round(rng.uniform(-60, 70, N_SITES), 2) + 0.003
    lon = np.round(rng.uniform(-170, 170, N_SITES), 2) + 0.003
    return lat, lon


def host_names() -> list[str]:
    return [f"site{h:03d}.example.org" for h in range(N_HOSTS)]


def host_site_assignment() -> np.ndarray:
    """host index -> site index (deterministic round-robin)."""
    return np.arange(N_HOSTS, dtype=np.int64) % N_SITES


def _host_index_for_doc(doc_id: np.ndarray) -> np.ndarray:
    """Urban-skewed host pick, deterministic in doc_id.

    A multiplicative-hash residue decides hot vs cold; hot rows concentrate
    on the first ``_HOT_FRACTION`` of hosts.
    """
    # uint64 WRAPPING multiplies, twinned in SQL by HUGEINT % 2**64
    # (queries._HIDX_SQL): a signed int64 multiply would silently wrap to
    # a DIFFERENT residue at doc_id > ~3.47e9 while DuckDB's BIGINT
    # multiply raises — the q_hash_sample wrap convention
    u = np.asarray(doc_id, dtype=np.int64).astype(np.uint64)
    h = (u * np.uint64(2654435761)) % np.uint64(1_000_000)
    hot = h < np.uint64(int(_HOT_WEIGHT * 1_000_000))
    n_hot = int(N_HOSTS * _HOT_FRACTION)
    hot_host = (u * np.uint64(40503)) % np.uint64(n_hot)
    cold_host = n_hot + (u * np.uint64(9973)) % np.uint64(N_HOSTS - n_hot)
    return np.where(hot, hot_host, cold_host).astype(np.int64)


def urls_for_doc_ids(doc_id: np.ndarray) -> pa.Array:
    hosts = np.asarray(host_names(), dtype=object)
    hidx = _host_index_for_doc(doc_id)
    urls = [f"https://{hosts[h]}/p{d}" for h, d in zip(hidx, np.asarray(doc_id))]
    return pa.array(urls, pa.string())


_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua über straße "
    "café 日本語 العربية"
).split(" ")
_LANGS = ["en", "de", "ja", "pt", "ar"]


def synthesize_web_pages(n: int, seed: int = SEED) -> pa.Table:
    """Pure deterministic web_pages table of ``n`` rows (FIXTURES.md F1)."""
    doc_id = np.arange(n, dtype=np.int64)
    url = urls_for_doc_ids(doc_id)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    warc_ts = base + (doc_id * 137).astype("timedelta64[s]").astype("timedelta64[us]")
    # seeded lorem text, deterministic per doc
    w = len(_LOREM)
    texts = [
        " ".join(_LOREM[(d * 7 + k) % w] for k in range((d % 37) + 3)) for d in doc_id
    ]
    htmls: list[bytes] = []
    for d, t in zip(doc_id, texts):
        if d % 97 == 0:
            htmls.append(b"")  # some zero-length rows
        elif d % 997 == 0:
            htmls.append(b"<html><body>" + (t.encode() * 400)[:65536] + b"</body></html>")
        else:
            htmls.append(b"<html><body>" + t.encode() + b"</body></html>")
    return pa.table(
        {
            "url": url,
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([_LANGS[int(d) % 5] for d in doc_id], pa.string()),
        }
    )


def web_pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Derive the web-pages table from the driver's ``documents.parquet``.

    ``text``/``lang`` are carried verbatim (byte-identity audit applies to
    ``text``); ``url``/``warc_ts``/``html`` are deterministic in ``doc_id``.
    Runs as a streaming ``map_batches`` — no driver-side materialization.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_web_pages(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy()
        url = urls_for_doc_ids(doc_id)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + (doc_id * 137).astype("timedelta64[s]").astype("timedelta64[us]")
        text = batch["text"]
        html = pa.array(
            [b"<html><body>" + t.encode() + b"</body></html>" for t in text.to_pylist()],
            pa.binary(),
        )
        return pa.table(
            {
                "url": url,
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": html,
                "text": text,
                "lang": batch["lang"],
            }
        )

    return ds.map_batches(to_web_pages, batch_format="pyarrow")
