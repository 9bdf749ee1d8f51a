"""A/B the old k-perm vs new OPH minhash kernel in ONE Ray session."""
import os, sys, time
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
print("docs:", n_docs, "cpus:", NCPU, "probe:", bench._load_probe(), flush=True)

import ray.data
from _oldmod.old_dedup import minhash_band_counts as old_kernel
from gis_scripts_ray.stages.dedup import minhash_band_counts as new_kernel

def run(kernel):
    ds = ray.data.read_parquet(input_dir, columns=["text"], override_num_blocks=64)
    t0 = time.time()
    ds.map_batches(kernel, fn_kwargs={"text_col": "text"}, batch_format="pyarrow").count()
    return round(time.time() - t0, 3)

run(new_kernel)  # warm-up
res = {"old": [], "new": []}
for _ in range(4):  # ABBA-ish interleave
    res["old"].append(run(old_kernel))
    res["new"].append(run(new_kernel))
print("old k-perm:", res["old"], "best", min(res["old"]))
print("new OPH   :", res["new"], "best", min(res["new"]))
print("probe after:", bench._load_probe())
ray.shutdown()
