"""Per-key sigma-rule outlier counting in the EXACT integer domain —
the numeric quality gate of a training-data pipeline (drop/flag events
whose value sits k standard deviations from the key's mean) without a
single float: |v − μ| > k·σ over integers v is

    (n·v − Σ)²  >  k² · (n·Σv² − Σ²)

— both sides exact integers, so the flag is bit-reproducible and
SQL-twinnable (HUGEINT on the right at corpus scale; this module keeps
int64 and documents the domain bound: |n·v| and n·Σv² must fit int64,
which holds for bounded per-entity histories in a scaled-cents domain).

Plan shape: per-key moments (n, Σv, Σv²) are mergeable partials (one
in-block pre-agg + one adaptive combine); the moment table returns to
the event stream adaptively on its MEASURED size — a worker-built
searchsorted multi-column map (one Ray task over the materialized block
refs, no driver rows) below ``broadcast_limit``, else one sized
hash-join — and the flag evaluates vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


@ray.remote(num_cpus=0.5)
def _build_moment_map(*blocks):
    """Sorted (keys, n, sv, svv) arrays from moment blocks — built
    worker-side so the driver only handles block refs."""
    key = np.concatenate(
        [b["key"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    n = np.concatenate(
        [b["n"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    sv = np.concatenate(
        [b["sv"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    svv = np.concatenate(
        [b["svv"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    order = np.argsort(key, kind="stable")
    return key[order], n[order], sv[order], svv[order]


def sigma_outlier_counts(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    k: int = 3,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(key, n, n_outliers) — events where (n·v − Σ)² > k²(n·Σv² − Σ²).
    ``value_col`` must already be an exact int64 domain (cents/micros);
    nulls are excluded from moments AND flags on both engines."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def clean(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = batch.filter(pc.is_valid(batch[value_col]))
        return pa.table({"key": f[key_col], "v": f[value_col]})

    events = ds.map_batches(clean, batch_format="pyarrow").materialize()

    def moment_partial(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "key": batch["key"],
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
                "sv": pa.array(v),
                "svv": pa.array(v * v),
            }
        )
        out = t.group_by(["key"]).aggregate(
            [("n", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        return out.rename_columns(["key", "n", "sv", "svv"])

    moments = coalesce_shuffle_agg(
        events.map_batches(moment_partial, batch_format="pyarrow"),
        ["key"],
        {"n": "sum", "sv": "sum", "svv": "sum"},
    ).materialize()

    def flag_arrays(key, v, n, sv, svv, _k=k):
        lhs = (n * v - sv) ** 2
        rhs = _k * _k * (n * svv - sv * sv)
        return lhs > rhs

    if moments.count() <= broadcast_limit:
        refs = [
            br
            for bundle in moments.iter_internal_ref_bundles()
            for br in bundle.block_refs
        ]
        map_ref = _build_moment_map.remote(*refs)

        def flag_bcast(batch: pa.Table, _ref=map_ref) -> pa.Table:
            from gis_scripts_ray.state.broadcast import worker_broadcast

            keys, n_a, sv_a, svv_a = worker_broadcast(_ref)
            kk = batch["key"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, kk)
            out = flag_arrays(kk, v, n_a[pos], sv_a[pos], svv_a[pos])
            t = pa.table(
                {
                    "key": batch["key"],
                    "n": pa.array(np.ones(len(v), dtype=np.int64)),
                    "n_outliers": pa.array(out.astype(np.int64)),
                }
            )
            res = t.group_by(["key"]).aggregate(
                [("n", "sum"), ("n_outliers", "sum")]
            )
            return res.rename_columns(["key", "n", "n_outliers"])

        partials = events.map_batches(flag_bcast, batch_format="pyarrow")
    else:
        joined = hash_join(
            events,
            moments.repartition(num_partitions),
            on="key",
            num_partitions=num_partitions,
        )

        def flag_join(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            out = flag_arrays(
                batch["key"].to_numpy(zero_copy_only=False),
                v,
                batch["n"].to_numpy(zero_copy_only=False),
                batch["sv"].to_numpy(zero_copy_only=False),
                batch["svv"].to_numpy(zero_copy_only=False),
            )
            t = pa.table(
                {
                    "key": batch["key"],
                    "n": pa.array(np.ones(len(v), dtype=np.int64)),
                    "n_outliers": pa.array(out.astype(np.int64)),
                }
            )
            res = t.group_by(["key"]).aggregate(
                [("n", "sum"), ("n_outliers", "sum")]
            )
            return res.rename_columns(["key", "n", "n_outliers"])

        partials = joined.map_batches(flag_join, batch_format="pyarrow")

    return coalesce_shuffle_agg(
        partials, ["key"], {"n": "sum", "n_outliers": "sum"}
    )
