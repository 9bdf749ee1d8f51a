"""Benchmark harness: headline spatial-join + tiling pipeline + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs": D, "docs_per_sec": R}

Input: web-pages table derived deterministically from $GRAFT_SF_DIR's
documents.parquet, replicated GRAFT_BENCH_REPLICATE times (default 100 ->
500k docs at sf0.1) and cached as parquet under /tmp (synthesis is NOT
timed; the timed pipeline starts at read_parquet like production would).

--scaling: runs the headline pipeline in two fresh processes at
RAY_GRAFT_CPUS=8 and =32 on the SAME input and reports
efficiency = rate_32 / (4 * rate_8)  (N vs 4N protocol, BASELINE.md).
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
    out_dir = f"/tmp/graft_bench/{tag}_x{REPLICATE}"
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

    total = 0
    for r in range(REPLICATE):
        ids = base_ids + r * 10_000_000
        url = urls_for_doc_ids(ids)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + (ids * 137).astype("timedelta64[s]").astype("timedelta64[us]")
        t = pa.table(
            {
                "url": url,
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(
                    [b""] * n_docs, pa.binary()
                ),  # wide-binary columns are dropped at the read anyway
                "text": docs["text"],
                "lang": docs["lang"],
            }
        )
        pq.write_table(t, os.path.join(out_dir, f"part-{r:04d}.parquet"))
        total += n_docs
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
        override_num_blocks=max(NUM_CPUS * 2, 8),
    )  # prune html/warc_ts at the read; blocks sized ~2x CPUs
    located = geocode(ds, concurrency=max(2, NUM_CPUS // 4), num_cpus=1)
    encoded = encode_cells(located, EncodeConfig())

    def add_text_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "text_len", pc.cast(pc.binary_length(batch["text"]), pa.int64())
        )

    encoded = encoded.map_batches(add_text_len, batch_format="pyarrow")
    joined = pip_join(
        encoded,
        synthesize_polygons(),
        carry_cols=["url", "lang", "tile_x", "tile_y", "text_len"],
        concurrency=max(2, NUM_CPUS // 4),
        num_cpus=1,
    )
    agg = cell_sum_count(joined, ["tile_x", "tile_y", "class"], ["text_len"])
    n_out = agg.count()
    assert n_out > 0
    return time.time() - t0


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


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    input_dir, n_docs = prepare_input()
    # untimed warm-up: spawn workers/actor pools + import numpy/polars in
    # them and touch the page cache — a bare read .count() is metadata-only
    # and warms nothing. Steady-state throughput is what matters at scale.
    import glob

    warm_files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))[:4]
    headline(warm_files)

    sec = headline(input_dir)

    from gis_scripts_ray.queries import QUERIES

    qtimes = {}
    for name in QUERY_SUBSET:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        qtimes[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "spatial_join_tiling_headline",
        "value": round(sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / sec, 1),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        env.setdefault("GRAFT_BENCH_REPLICATE", "1000")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    rate_lo = lo["docs_per_sec"]
    rate_hi = hi["docs_per_sec"]
    return {
        "metric": "scaling_efficiency_8_to_32",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "docs_per_sec_8": rate_lo,
        "docs_per_sec_32": rate_hi,
        "scaling_efficiency": round(rate_hi / (4.0 * rate_lo), 3),
        "docs": hi["docs"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
