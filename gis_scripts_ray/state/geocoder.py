"""Deterministic URL-host geocoder — the engine's canonical stateful stage.

North-star semantics: "URLs are geolocated via a stateful geocoder /
IP-resolver actor pool". The reference's analog stateful stages are the
DCNN scorer that loads its model once per process
(``seagrass_lib.py:696-761``) and the per-(satellite, band) coefficient
lookup (``seagrass_lib.py:142-164``) — load-once state, per-batch probes.

Resolution is host-level (like a GeoIP database): every host maps to one of
the ~50 deterministic sites plus a per-host lattice offset, so the lookup
table is exactly :func:`host_geo_table`. Unknown hosts get a deterministic
hash-derived location (never a failure — quarantine-free geocoding).

The actor-pool stage is :class:`GeocodeBatcher`: construct via
``ds.map_batches(GeocodeBatcher, fn_constructor_kwargs={"host_geo_ref":
ray.put(host_geo_table())}, concurrency=N, batch_format="pyarrow")`` —
the table is shipped to each actor once (object-store broadcast), the
host->index dict is built once in ``__init__``, and ``__call__`` does a
vectorized probe per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gis_scripts_ray.sources.webpages import (
    N_SITES,
    host_names,
    host_site_assignment,
    site_locations,
)

_HOST_RE = r"^[a-z]+://(?P<host>[^/]+)"


def host_geo_table(seed: int = 42) -> pa.Table:
    """The geocoder's lookup table: (host, lat, lon), 200 rows.

    lat/lon = site location + per-host offset on the 0.01-degree lattice.
    Deterministic; identical values are embedded (via ``repr`` round-trip)
    in DuckDB oracle SQL.
    """
    site_lat, site_lon = site_locations(seed)
    hosts = host_names()
    hidx = np.arange(len(hosts), dtype=np.int64)
    site = host_site_assignment()
    lat = site_lat[site] + ((hidx * 31) % 21 - 10) * 0.01
    lon = site_lon[site] + ((hidx * 17) % 21 - 10) * 0.01
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
        }
    )


def extract_host(urls: pa.Array) -> pa.Array:
    """Vectorized scheme://host extraction (Arrow regex kernel)."""
    m = pc.extract_regex(urls, _HOST_RE)
    return pc.struct_field(m, "host")


class Geocoder:
    """In-memory host->(lat, lon) resolver. Build once, probe per batch."""

    def __init__(self, host_geo: pa.Table):
        self._hosts = host_geo["host"].combine_chunks()
        self._lat = host_geo["lat"].to_numpy()
        self._lon = host_geo["lon"].to_numpy()

    def resolve(self, urls: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        hosts = extract_host(urls)
        # vectorized C++ hash-probe against the lookup table
        idx = pc.index_in(hosts, value_set=self._hosts)
        idx_np = idx.to_numpy(zero_copy_only=False)  # float64 with NaN for miss
        known = ~np.isnan(idx_np.astype(np.float64))
        safe = np.where(known, idx_np, 0).astype(np.int64)
        lat = self._lat[safe].copy()
        lon = self._lon[safe].copy()
        if not known.all():
            # deterministic fallback for unknown hosts (slow path, rare)
            misses = np.nonzero(~known)[0]
            host_list = hosts.to_pylist()
            for i in misses:
                hv = hash_host(host_list[i] or "")
                lat[i] = (hv % 17000) / 100.0 - 85.0
                lon[i] = ((hv // 17000) % 36000) / 100.0 - 180.0
        return lat, lon


def hash_host(host: str) -> int:
    """Stable (non-PYTHONHASHSEED) FNV-1a over the host string."""
    h = 0xCBF29CE484222325
    for b in host.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# --- task-based variant: state cached per WORKER PROCESS -------------------
# Ray worker processes persist across tasks and executions, so a lazy module
# global gives the same load-once semantics as an actor pool without paying
# actor-process spawn per execution — and, unlike an actor stage, a task
# stage FUSES with its neighbors (read->geocode->encode->join run as one
# pipelined task per block, no object-store round trip between them).
# Prefer this for small state (lookup tables); keep the actor pool for
# heavy state (models) where one copy per worker would blow memory.
# keyed by the broadcast ref's identity (like _WORKER_MINHASHERS keys by
# constructor params) — a bare singleton would silently hand a SECOND
# pipeline with a different host-geo table the first pipeline's geocoder
_WORKER_GEOCODERS: "dict[str | None, Geocoder]" = {}


def geocode_batch(batch: pa.Table, host_geo_ref=None) -> pa.Table:
    """Stateless-task geocode stage with worker-cached state."""
    key = host_geo_ref.hex() if host_geo_ref is not None else None
    gc = _WORKER_GEOCODERS.get(key)
    if gc is None:
        import ray

        table = ray.get(host_geo_ref) if host_geo_ref is not None else host_geo_table()
        gc = Geocoder(table)
        if len(_WORKER_GEOCODERS) >= 8:  # bound long-lived worker growth
            _WORKER_GEOCODERS.pop(next(iter(_WORKER_GEOCODERS)))
        _WORKER_GEOCODERS[key] = gc
    lat, lon = gc.resolve(batch["url"].combine_chunks())
    return batch.append_column("lat", pa.array(lat)).append_column("lon", pa.array(lon))


class GeocodeBatcher:
    """Actor-pool ``map_batches`` stage: append lat/lon columns.

    State (the host-geo table) is resolved from the object store ONCE in
    ``__init__`` — never per batch.
    """

    def __init__(self, host_geo_ref=None):
        import ray

        table = (
            ray.get(host_geo_ref) if host_geo_ref is not None else host_geo_table()
        )
        self.geocoder = Geocoder(table)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat, lon = self.geocoder.resolve(batch["url"].combine_chunks())
        return batch.append_column("lat", pa.array(lat)).append_column(
            "lon", pa.array(lon)
        )
