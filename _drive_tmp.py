"""Scratch: decompose the scaling job's dedup stage at one CPU level."""
import json
import os
import sys
import time

os.environ.setdefault("POLARS_MAX_THREADS", "1")
NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 16

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.decoding_size_estimation = False

os.environ["GRAFT_BENCH_REPLICATE"] = os.environ.get("GRAFT_BENCH_REPLICATE", "1600")
import bench

input_dir, n_docs = bench.prepare_input()
print("docs:", n_docs, "cpus:", NCPU)

import pyarrow.compute as pc
import ray.data
from gis_scripts_ray.stages.dedup import minhash_band_counts
from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

# warm-up (full)
bench.dedup_stage(input_dir)

for rep in range(3):
    t0 = time.time()
    ds = ray.data.read_parquet(input_dir, columns=["text"], override_num_blocks=64)
    partials = ds.map_batches(
        minhash_band_counts, fn_kwargs={"text_col": "text"}, batch_format="pyarrow"
    )
    t_mid0 = time.time()
    clusters = coalesce_shuffle_sum(partials, ["combo"], ["n"])
    t_mid = time.time()
    filt = clusters.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)), batch_format="pyarrow"
    )
    n_multi = filt.count()
    t1 = time.time()
    print(
        f"rep{rep}: total={t1-t0:.2f} plan+combine_build={t_mid-t0:.2f} "
        f"final_count={t1-t_mid:.2f} n_multi={n_multi}"
    )
    if rep == 2:
        st = filt.stats()
        print(st[-6000:])
ray.shutdown()
