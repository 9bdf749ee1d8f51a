"""Benchmark harness: headline spatial-join + tiling pipeline + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs": D, "docs_per_sec": R}

Input: web-pages table derived deterministically from $GRAFT_SF_DIR's
documents.parquet, replicated GRAFT_BENCH_REPLICATE times (default 100 ->
500k docs at sf0.1) and cached as parquet under /tmp (synthesis is NOT
timed; the timed pipeline starts at read_parquet like production would).

--scaling: runs the FULL pipeline (spatial join + tiling + MinHash-LSH
dedup) in FOUR fresh ABBA-interleaved processes (lo, hi, hi, lo) at N
and 4N CPUs (default 4 and 16 — below single-socket DRAM saturation,
the regime that models multi-node scaling; see BASELINE.md) on the SAME
input; each level takes its per-stage best across reps and children, and
the report is efficiency = rate_4N / (4 * rate_N) with every raw rep
included. Override with GRAFT_SCALING_LO/HI/REPS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "200"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def prepare_input() -> tuple[str, int]:
    """Materialize the replicated web-pages parquet (cached, untimed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gis_scripts_ray.sources.webpages import urls_for_doc_ids

    tag = SF_DIR.strip("/").replace("/", "_")
    # v4: replica id stride derived from max(doc_id)+1 (was hard-coded 10M)
    out_dir = f"/tmp/graft_bench/{tag}_x{REPLICATE}_v4"
    done_flag = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_flag):
        n = sum(
            pq.read_metadata(os.path.join(out_dir, f)).num_rows
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
        return out_dir, n
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
    base_ids = docs["doc_id"].to_numpy()
    n_docs = len(base_ids)
    import numpy as np

    # ~32 large files (not one per replica): a thousand tiny parquet files
    # makes the read open()-bound, which is not the workload being measured
    n_files = min(32, REPLICATE)
    reps_per_file = (REPLICATE + n_files - 1) // n_files
    total = 0
    r = 0
    # replica stride derived from the data: a hard-coded stride collides
    # replica id ranges (duplicate doc_ids/urls) once the source table
    # outgrows it, silently changing what dedup/geocode measure
    stride = int(base_ids.max()) + 1 if n_docs else 1
    for f in range(n_files):
        chunks = []
        for _ in range(reps_per_file):
            if r >= REPLICATE:
                break
            ids = base_ids + r * stride
            url = urls_for_doc_ids(ids)
            base = np.datetime64("2024-01-01T00:00:00", "us")
            ts = base + (ids * 137).astype("timedelta64[s]").astype("timedelta64[us]")
            chunks.append(
                pa.table(
                    {
                        "url": url,
                        "warc_ts": pa.array(ts, pa.timestamp("us")),
                        "html": pa.array([b""] * n_docs, pa.binary()),
                        "text": docs["text"],
                        "lang": docs["lang"],
                    }
                )
            )
            total += n_docs
            r += 1
        if chunks:
            t = pa.concat_tables(chunks)
            # 31250-row row groups (8 per file): ray's read splits at
            # row-group granularity, so one monolithic group per file
            # caps real read parallelism at n_files and leaves the
            # 16-way read straggler-bound — measured read+slim
            # 2.39 -> 1.23 s at 16 CPUs, 6.43 -> 5.25 s at 4 (8M docs)
            pq.write_table(
                t, os.path.join(out_dir, f"part-{f:04d}.parquet"),
                row_group_size=31_250,
            )
    with open(done_flag, "w") as fh:
        fh.write(str(total))
    return out_dir, total


def headline(input_dir: str) -> float:
    """Timed: read -> geocode -> encode -> PIP join -> tile aggregate."""
    import ray.data

    from gis_scripts_ray.pipelines.flagship import geocode
    from gis_scripts_ray.queries import rect_polygon_table
    from gis_scripts_ray.sources.polygons import synthesize_polygons
    from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
    from gis_scripts_ray.stages.pip_join import pip_join
    from gis_scripts_ray.stages.tile_agg import cell_sum_count
    import pyarrow as pa
    import pyarrow.compute as pc

    t0 = time.time()
    ds = ray.data.read_parquet(
        input_dir,
        columns=["url", "text", "lang"],
        override_num_blocks=64,
    )  # prune html/warc_ts at the read; blocks sized ~2x CPUs

    def slim(batch: pa.Table) -> pa.Table:
        # wide-column discipline: derive what downstream needs (text_len for
        # the aggregate, the audited byte length) and DROP text immediately —
        # the object store never ships the wide column past the read stage
        return pa.table(
            {
                "url": batch["url"],
                "lang": batch["lang"],
                "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64()),
            }
        )

    ds = ds.map_batches(slim, batch_format="pyarrow")
    located = geocode(ds)  # fused task stage, worker-cached state
    # url served its purpose (geocoding) — drop before the remaining stages
    located = located.select_columns(["lang", "text_len", "lat", "lon"])
    encoded = encode_cells(located, EncodeConfig())
    joined = pip_join(
        encoded,
        synthesize_polygons(n_extra_rects=2000),  # district-scale admin layer
        carry_cols=["lang", "tile_x", "tile_y", "text_len"],
    )
    # two-level combine: in-batch partials (one tiny table per block, fused
    # into the same task as the join) then an explicit tree reduction —
    # no all-to-all shuffle for a bounded-cardinality key space
    from gis_scripts_ray.stages.tile_agg import partial_cell_agg, tree_aggregate

    partials = joined.map_batches(
        partial_cell_agg(["text_len"], ["tile_x", "tile_y", "class"]),
        batch_format="pyarrow",
    )
    agg = tree_aggregate(partials, ["tile_x", "tile_y", "class"], ["sum_text_len", "n"])
    assert agg.count() > 0
    return time.time() - t0


def dedup_stage(input_dir: str) -> float:
    """Timed: MinHash-LSH near-dup candidate clustering over the corpus —
    signatures (vectorized, worker-cached hasher) -> banded LSH rows ->
    in-batch partial combine -> grouped cluster sizes."""
    import pyarrow.compute as pc
    import ray.data

    from gis_scripts_ray.stages.dedup import minhash_band_counts
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    t0 = time.time()
    # 128 blocks, not 64: the fused read -> dict-encode -> sign -> partial
    # task is the heavyweight stage, and halving the task size halved the
    # stage at BOTH 4 and 16 CPUs (measured round 4: 16.2 -> 8.5 s at 4,
    # 5.0 -> 2.5 s at 16 on 8M docs) — big fused tasks pipeline poorly
    ds = ray.data.read_parquet(
        input_dir, columns=["text"], override_num_blocks=128
    )
    # one fused task per block: signatures (cache-resident chunks) -> band
    # keys -> per-block partial counts; LSH rows never materialize
    partials = ds.map_batches(
        minhash_band_counts, fn_kwargs={"text_col": "text"}, batch_format="pyarrow"
    )
    # band-key space is UNBOUNDED (~docs x bands): bounded coalesce + hash
    # shuffle, never a tree ending in repartition(1). Keys arrive folded
    # to ONE int64 combo column (16 B/row partials, single-column hash)
    clusters = coalesce_shuffle_sum(partials, ["combo"], ["n"])
    n_multi = clusters.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)), batch_format="pyarrow"
    ).count()
    assert n_multi >= 0
    return time.time() - t0


def full_pipeline(input_dir: str) -> float:
    """The scaling job: spatial join + tiling AND near-dup candidates —
    the complete training-data pipeline over the same corpus."""
    return headline(input_dir) + dedup_stage(input_dir)


QUERY_SUBSET = [
    "geo_tile_counts",
    "geo_pip_class_stats",
    "geo_knn",
    "lineitem_pricing_summary",
    "orders_nation_rollup",
    "events_hourly",
    "dedup_exact",
    "token_counts",
    "embedding_topk",
]


def _pin_kernel_threads() -> None:
    os.environ.setdefault("POLARS_MAX_THREADS", "1")


# Calibrated on an idle window 2026-08-17 (median-of-3 in fresh quiet
# processes: 0.070-0.086 s; floor 0.070). The probe is a fixed
# single-thread uint64 xorshift-fold —
# compute+memory mix resembling the engine's hash kernels. Its wall-time
# ratio vs this nominal estimates how loaded the machine was DURING a
# scaling child, turning "background load drifted" from a claim into a
# recorded per-run measurement (BASELINE.md variance notes).
PROBE_NOMINAL_SEC = 0.070


def _load_probe(reps: int = 3) -> float:
    import numpy as np

    ts = []
    for _ in range(reps):
        t0 = time.time()
        x = np.arange(2_000_000, dtype=np.uint64)
        for _ in range(20):
            x = (x ^ (x >> np.uint64(13))) * np.uint64(0x100000001B3)
        int(x.sum())
        ts.append(time.time() - t0)
    return round(sorted(ts)[len(ts) // 2], 4)


def run_bench() -> dict:
    import ray

    _pin_kernel_threads()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # block counts are pinned via override_num_blocks — skip the parquet
    # decoding-size sampling pass (serial driver time per execution)
    ctx.decoding_size_estimation = False

    input_dir, n_docs = prepare_input()
    probe_before = _load_probe()
    # untimed warm-up over the FULL input: spawns workers, imports
    # numpy/polars in them, touches every input page (a partial warm-up
    # leaves the first timed rep ~3x slower on a cold page cache).
    # Steady-state throughput is what matters at scale.
    headline(input_dir)

    # headline = best-of-3 with its own pre-rep probe recorded (round-4
    # verdict task #8: the REPORTED value is the defensible steady-state
    # number, and the artifact carries the raw reps + load evidence so a
    # regression is adjudicable without rerunning).
    headline_probe = _load_probe(1)
    headline_reps = [round(headline(input_dir), 3) for _ in range(3)]
    sec = min(headline_reps)

    from gis_scripts_ray.queries import QUERIES

    # per-query best-of-3 WITH a per-query load probe (round-3 verdict
    # task #8): the probe taken right before each query's reps makes an
    # apparent regression adjudicable from the artifact alone — a query
    # whose probe sat 1.5x nominal was measured on a loaded machine, not
    # a slower engine. The first rep doubles as the query's warm-up.
    qtimes = {}
    qdetail = {}
    for name in QUERY_SUBSET:
        qprobe = _load_probe(1)
        times = []
        for _ in range(3):
            t0 = time.time()
            res = QUERIES[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()
            times.append(round(time.time() - t0, 3))
        qtimes[name] = min(times)
        qdetail[name] = {"reps": times, "probe": qprobe}

    ray.shutdown()
    return {
        "metric": "spatial_join_tiling_headline",
        "value": round(sec, 3),
        "unit": "sec",
        "headline_detail": {"reps": headline_reps, "probe": headline_probe},
        "queries": qtimes,
        "query_detail": qdetail,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / sec, 1),
        "probe": [probe_before, _load_probe()],
        "probe_nominal": PROBE_NOMINAL_SEC,
    }


def run_scaling_child() -> dict:
    """One fresh-process measurement of the full pipeline at NUM_CPUS."""
    import glob

    import ray

    _pin_kernel_threads()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # skip the parquet decoding-size sampling pass: block counts are pinned
    # via override_num_blocks here, so the estimate buys nothing and costs
    # serial driver time per execution
    ctx.decoding_size_estimation = False
    input_dir, n_docs = prepare_input()
    probe_before = _load_probe()
    # untimed warm-up over the FULL input: spawns workers, imports numpy/
    # polars in them, and touches every input page — measured: a 4-file
    # warm-up leaves the first timed rep ~70% slower (cold page cache)
    full_pipeline(input_dir)
    # steady-state estimate: best-of-5 PER STAGE (sandbox wall-times vary
    # up to ~40% run to run — BASELINE.md variance notes; the per-stage
    # minimum models a long steady-state run where transient scheduler
    # hiccups amortize). Raw reps are reported for honest accounting.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    h_times = [round(headline(input_dir), 3) for _ in range(reps)]
    d_times = [round(dedup_stage(input_dir), 3) for _ in range(reps)]
    sec = min(h_times) + min(d_times)
    ray.shutdown()
    probe_after = _load_probe()
    return {
        "value": round(sec, 3),
        "headline_reps": h_times,
        "dedup_reps": d_times,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / sec, 1),
        "num_cpus": NUM_CPUS,
        "probe": [probe_before, probe_after],
    }


def run_scaling() -> dict:
    """N vs 4N protocol (BASELINE.md): same deterministic input + full
    pipeline (spatial join + tiling + near-dup candidates) in fresh
    processes at GRAFT_SCALING_LO/HI CPUs (default 4 and 16 — below
    single-socket DRAM saturation; see BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # 8M docs: big enough that per-execution fixed costs (driver
        # coordination, operator spawn) stay small against useful work at
        # the 4N level — the regime a 100 TB run actually sits in
        env.setdefault("GRAFT_BENCH_REPLICATE", "1600")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    n_hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    # ABBA interleaving: this sandbox's background load drifts on a
    # minutes scale (BASELINE.md variance notes), so measuring all of LO
    # then all of HI samples two different machine states and perturbs
    # the RATIO directly. lo-hi-hi-lo puts both levels in both halves of
    # the measurement window; each level takes its per-stage best across
    # both children.
    runs = [run(n_lo), run(n_hi), run(n_hi), run(n_lo)]
    lo_runs = [runs[0], runs[3]]
    hi_runs = [runs[1], runs[2]]

    def best(rs: list[dict]) -> dict:
        h = min(min(r["headline_reps"]) for r in rs)
        d = min(min(r["dedup_reps"]) for r in rs)
        return {
            "value": round(h + d, 3),
            "docs": rs[0]["docs"],
            "docs_per_sec": round(rs[0]["docs"] / (h + d), 1),
            "headline_reps": [r["headline_reps"] for r in rs],
            "dedup_reps": [r["dedup_reps"] for r in rs],
        }

    def median_composite(rs: list[dict]) -> float:
        # conservative companion to the best-of composite (ADVICE r2):
        # median over ALL reps of each stage, across both ABBA children —
        # a steady-state estimate no single scheduler hiccup can improve
        import statistics

        h = statistics.median([t for r in rs for t in r["headline_reps"]])
        d = statistics.median([t for r in rs for t in r["dedup_reps"]])
        return round(h + d, 3)

    lo, hi = best(lo_runs), best(hi_runs)
    rate_lo = lo["docs_per_sec"]
    rate_hi = hi["docs_per_sec"]
    lo_med = median_composite(lo_runs)
    hi_med = median_composite(hi_runs)
    return {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
        "job": "full_pipeline(spatial_join_tiling + minhash_lsh_dedup)",
        "cpus_lo": n_lo,
        "cpus_hi": n_hi,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "sec_lo_median": lo_med,
        "sec_hi_median": hi_med,
        "reps_lo": {"headline": lo["headline_reps"], "dedup": lo["dedup_reps"]},
        "reps_hi": {"headline": hi["headline_reps"], "dedup": hi["dedup_reps"]},
        "docs_per_sec_lo": rate_lo,
        "docs_per_sec_hi": rate_hi,
        "scaling_efficiency": round(rate_hi / ((n_hi / n_lo) * rate_lo), 3),
        "scaling_efficiency_median": round(
            lo_med / ((n_hi / n_lo) * hi_med), 3
        ),
        "docs": hi["docs"],
        # per-child [before, after] single-thread probe wall-times in ABBA
        # order (lo, hi, hi, lo) + the idle-window nominal: probes well
        # above nominal are recorded evidence that background machine load
        # overlapped that child's window (the known cause of the sub-0.8
        # efficiency tail — BASELINE.md)
        "probes": [r.get("probe") for r in runs],
        "probe_nominal": PROBE_NOMINAL_SEC,
        "load_factor_max": round(
            max(p for r in runs for p in (r.get("probe") or [PROBE_NOMINAL_SEC]))
            / PROBE_NOMINAL_SEC,
            2,
        ),
    }


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_child()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
