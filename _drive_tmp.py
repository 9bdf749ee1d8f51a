import ray, time, os
os.environ.setdefault("RAY_GRAFT_CPUS", "32")
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa, pyarrow.compute as pc
from gis_scripts_ray.pipelines.flagship import geocode
from gis_scripts_ray.sources.polygons import synthesize_polygons
from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
from gis_scripts_ray.stages.pip_join import pip_join
from gis_scripts_ray.stages.tile_agg import cell_sum_count

input_dir = "/tmp/graft_bench/root_testdata_sf0.1_x100"
ray.data.read_parquet(input_dir, columns=["url"]).count()  # warm

t0 = time.time()
ds = ray.data.read_parquet(input_dir, columns=["url", "text", "lang"])
located = geocode(ds, concurrency=(2, 16), num_cpus=1)
encoded = encode_cells(located, EncodeConfig())
def add_text_len(b): return b.append_column("text_len", pc.cast(pc.binary_length(b["text"]), pa.int64()))
encoded = encoded.map_batches(add_text_len, batch_format="pyarrow")
joined = pip_join(encoded, synthesize_polygons(), carry_cols=["url","lang","tile_x","tile_y","text_len"], concurrency=(2,16), num_cpus=1)
agg = cell_sum_count(joined, ["tile_x","tile_y","class"], ["text_len"])
agg = agg.materialize()
print("TOTAL", round(time.time()-t0, 2), "s")
print(agg.stats())
ray.shutdown()
