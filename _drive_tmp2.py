import os, sys, time
os.environ.setdefault("POLARS_MAX_THREADS", "1")
NCPU = int(sys.argv[1]) if len(sys.argv)>1 else 16
import ray
ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
import ray.data
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
os.environ["GRAFT_BENCH_REPLICATE"] = "1600"
import bench
bench._pin_kernel_threads()
input_dir, n_docs = bench.prepare_input()
print("dir", input_dir, "docs", n_docs, "probe", bench._load_probe(), flush=True)

import pyarrow as pa, pyarrow.compute as pc
from gis_scripts_ray.pipelines.flagship import geocode
from gis_scripts_ray.sources.polygons import synthesize_polygons
from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
from gis_scripts_ray.stages.pip_join import pip_join
from gis_scripts_ray.stages.tile_agg import partial_cell_agg

def slim(batch):
    return pa.table({"url": batch["url"], "lang": batch["lang"],
                     "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64())})

def chain(upto):
    ds = ray.data.read_parquet(input_dir, columns=["url","text","lang"], override_num_blocks=64)
    ds = ds.map_batches(slim, batch_format="pyarrow")
    if upto >= 1:
        ds = geocode(ds).select_columns(["lang","text_len","lat","lon"])
    if upto >= 2:
        ds = encode_cells(ds, EncodeConfig())
    if upto >= 3:
        ds = pip_join(ds, synthesize_polygons(n_extra_rects=2000),
                      carry_cols=["lang","tile_x","tile_y","text_len"])
    if upto >= 4:
        ds = ds.map_batches(partial_cell_agg(["text_len"], ["tile_x","tile_y","class"]), batch_format="pyarrow")
    return ds

names = ["read+slim", "+geocode", "+encode", "+pip", "+partial"]
chain(4).materialize()  # warm
for upto in range(5):
    ts = []
    for _ in range(3):
        t0=time.time(); chain(upto).materialize(); ts.append(round(time.time()-t0,3))
    print(names[upto], ts, "best", min(ts), flush=True)
print("probe after", bench._load_probe())
ray.shutdown()
