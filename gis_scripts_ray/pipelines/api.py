"""Stage/Pipeline composition API — the engine's user-extension surface.

The reference's closest extension mechanisms are PDAL JSON stage lists
(``create_dem_tiles_from_array.py:224-241`` — declarative op chaining) and
parameterized transform dicts (``auto_mosaic.py:29-32`` stretch spec;
``count_raster_values.py:126`` condition DSL). Here the idiomatic analog:
a named list of ``Dataset -> Dataset`` stages with config dataclasses,
plus a UDF hook (any ``fn(pa.Table) -> pa.Table``).

Example::

    pipe = Pipeline([
        Stage("geocode", geocode),
        Stage("encode", lambda ds: encode_cells(ds, EncodeConfig(hex_res=8))),
        Stage("quality", batch_stage(quality_features)),
    ])
    out = pipe(ds)          # run all stages
    out = pipe.upto("encode")(ds)   # prefix for debugging/checkpointing
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa
import ray.data

DatasetTransform = Callable[[ray.data.Dataset], ray.data.Dataset]


@dataclass
class Stage:
    name: str
    fn: DatasetTransform
    description: str = ""


def batch_stage(
    batch_fn: Callable[[pa.Table], pa.Table], **map_batches_kwargs
) -> DatasetTransform:
    """Lift a per-batch UDF into a Stage-compatible Dataset transform."""
    kwargs = {"batch_format": "pyarrow", **map_batches_kwargs}

    def transform(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(batch_fn, **kwargs)

    return transform


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def __call__(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        for stage in self.stages:
            ds = stage.fn(ds)
        return ds

    def upto(self, name: str) -> "Pipeline":
        """Prefix pipeline ending at (and including) ``name``."""
        idx = [i for i, s in enumerate(self.stages) if s.name == name]
        if not idx:
            raise KeyError(f"no stage named {name!r}")
        return Pipeline(self.stages[: idx[0] + 1])

    def then(self, stage: Stage) -> "Pipeline":
        return Pipeline([*self.stages, stage])

    def names(self) -> list[str]:
        return [s.name for s in self.stages]
