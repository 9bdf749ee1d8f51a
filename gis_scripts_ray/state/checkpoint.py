"""Resumable partitioned output: per-partition lineage + row-count manifest.

North-rule requirement: "every stage checkpoints per-partition lineage +
row-count metrics to Parquet so jobs resume mid-pipeline after failure".
The reference's analogs are directory-per-stage checkpointing
(``1_Image_processing.py`` stages read the previous stage's folder),
skip-if-complete downloads (``download_usgs_lidar.py:29-35``) and
band-append partial writes (``global_match.py:204-285``).

Layout::

    out_dir/
      part=<key>/...parquet      (one directory per partition key)
      _manifest/part-<key>.json  (one atomic manifest row per partition)

A partition is complete iff its manifest row exists; manifest rows are
written atomically (tmp + rename) AFTER the partition's data. Resume =
list manifest, recompute only missing partitions. Data writes go to a tmp
dir first so a crash never leaves a partition that looks complete.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


@dataclass
class PartitionRecord:
    part_key: str
    n_rows: int
    lineage: str  # hash/desc of the inputs that produced this partition
    wall_s: float


def _safe_key(part_key: str) -> str:
    """Filesystem-safe encoding of a partition key: path-hostile characters
    ('/', '..', NUL, '%', leading '.') percent-encode so a key can never
    escape ``out_dir`` or make the data dir and manifest filename disagree.
    Alphanumerics and common safe chars pass through unchanged (so
    existing layouts like ``part=de/`` are unaffected); round-trip is
    ``urllib.parse.unquote``."""
    from urllib.parse import quote

    enc = quote(part_key, safe="-_.,:=+@ ")
    if enc.startswith("."):
        enc = "%2E" + enc[1:]
    return enc


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def completed(self) -> dict[str, PartitionRecord]:
        out = {}
        for f in os.listdir(self.manifest_dir):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(self.manifest_dir, f)) as fh:
                d = json.load(fh)
            out[d["part_key"]] = PartitionRecord(**d)
        return out

    def mark_complete(self, rec: PartitionRecord) -> None:
        path = os.path.join(self.manifest_dir, f"part-{_safe_key(rec.part_key)}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec.__dict__, fh)
        os.replace(tmp, path)  # atomic

    def partition_dir(self, part_key: str) -> str:
        return os.path.join(self.out_dir, f"part={_safe_key(part_key)}")


def write_partitioned_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    part_fn,
    lineage: str = "",
) -> list[PartitionRecord]:
    """Write ``ds`` as per-key parquet partitions, skipping completed ones.

    ``part_fn(batch: pa.Table) -> pa.Array[string]`` assigns each row a
    partition key (e.g. hex-cell prefix). Rows of already-complete
    partitions are dropped BEFORE the write (the resume fast path).

    Partition data is staged in ``part=<key>.tmp`` dirs and renamed before
    the manifest row is written — crash-safe at every step.
    """
    man = Manifest(out_dir)
    done = set(man.completed())

    def tag(batch: pa.Table) -> pa.Table:
        keys = part_fn(batch)
        return batch.append_column("__part", keys)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.is_in(batch["__part"], value_set=done_arr))
            )

        tagged = tagged.map_batches(drop_done, batch_format="pyarrow")

    records: list[PartitionRecord] = []

    def write_group(group) -> "pa.Table":
        # one task per partition key — parallel, idempotent
        t0 = time.time()
        if isinstance(group, dict):
            group = pa.table(group)
        elif not isinstance(group, pa.Table):
            group = pa.Table.from_pandas(group, preserve_index=False)
        if len(group) == 0:
            return pa.table({"part_key": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "wall_s": pa.array([], pa.float64())})
        key = group["__part"][0].as_py()
        data = group.drop_columns(["__part"])
        final_dir = man.partition_dir(key)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(data, os.path.join(tmp_dir, "data.parquet"))
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp_dir, final_dir)
        return pa.table(
            {
                "part_key": pa.array([key], pa.string()),
                "n_rows": pa.array([len(data)], pa.int64()),
                "wall_s": pa.array([time.time() - t0], pa.float64()),
            }
        )

    stats = tagged.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    for row in stats.iter_rows():
        rec = PartitionRecord(
            part_key=row["part_key"],
            n_rows=int(row["n_rows"]),
            lineage=lineage,
            wall_s=float(row["wall_s"]),
        )
        man.mark_complete(rec)
        records.append(rec)
    write_metrics_parquet(out_dir)
    return records


def write_metrics_parquet(out_dir: str) -> str:
    """Consolidate the manifest into ``_metrics.parquet`` — the north rule's
    'per-partition lineage + row-count metrics to Parquet'. One row per
    completed partition: (part_key, n_rows, lineage, wall_s)."""
    man = Manifest(out_dir)
    done = man.completed()
    keys = sorted(done)
    t = pa.table(
        {
            "part_key": pa.array(keys, pa.string()),
            "n_rows": pa.array([done[k].n_rows for k in keys], pa.int64()),
            "lineage": pa.array([done[k].lineage for k in keys], pa.string()),
            "wall_s": pa.array([done[k].wall_s for k in keys], pa.float64()),
        }
    )
    path = os.path.join(out_dir, "_metrics.parquet")
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def read_resumable(out_dir: str) -> ray.data.Dataset:
    """Read back all completed partitions."""
    man = Manifest(out_dir)
    paths = [
        os.path.join(man.partition_dir(k), "data.parquet")
        for k in sorted(man.completed())
    ]
    return ray.data.read_parquet(paths)
