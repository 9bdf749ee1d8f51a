import os, sys, time, glob
os.environ.setdefault("POLARS_MAX_THREADS", "1")
import pyarrow.parquet as pq, pyarrow as pa

src = "/tmp/graft_bench/root_testdata_sf0.1_x1600_v2"
dst = "/tmp/graft_bench/root_testdata_sf0.1_x1600_v3rg"
if not os.path.exists(os.path.join(dst, "_DONE")):
    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(src + "/*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t, os.path.join(dst, os.path.basename(f)), row_group_size=31250)
    open(os.path.join(dst, "_DONE"), "w").write("ok")
    print("v3rg cache built")

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 16
import ray
ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
import ray.data
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import bench
bench._pin_kernel_threads()
print("probe", bench._load_probe(), flush=True)
import pyarrow.compute as pc

def slim(batch):
    return pa.table({"url": batch["url"], "lang": batch["lang"],
                     "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64())})

def read_slim(d):
    t0=time.time()
    ray.data.read_parquet(d, columns=["url","text","lang"], override_num_blocks=64)\
        .map_batches(slim, batch_format="pyarrow").materialize()
    return round(time.time()-t0,3)

def headline(d):
    return bench.headline(d)

read_slim(src)  # warm both page caches
read_slim(dst)
res = {"v2_read": [], "v3_read": [], "v2_head": [], "v3_head": []}
for _ in range(3):
    res["v2_read"].append(read_slim(src)); res["v3_read"].append(read_slim(dst))
for _ in range(3):
    res["v2_head"].append(round(headline(src),3)); res["v3_head"].append(round(headline(dst),3))
for k,v in res.items(): print(k, v, "best", min(v))
print("probe after", bench._load_probe())
ray.shutdown()
