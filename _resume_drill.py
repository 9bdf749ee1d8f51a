"""Resume drill at the 100x bench shape (round-4 verdict task #7).

Runs the full training-data pipeline (flagship spatial join + minhash
dedup candidates) over the bench's 1M-doc input, writing BOTH stages
through ``write_partitioned_resumable``; SIGKILLs the job mid-run (after
the flagship stage's manifest lands, while the dedup stage is mid-
pipeline); resumes; and proves

  1. the resumed run SKIPS every partition completed before the kill
     (data-file mtimes unchanged across the resume),
  2. the final output is byte-identical to an uninterrupted clean run
     (sorted value hash over both stages' partitions),
  3. the measured reuse fraction (partitions complete at kill / total).

Usage:  python _resume_drill.py           # orchestrate: kill, resume, verify
        python _resume_drill.py --child A B   # (internal) one pipeline run

The orchestrator owns no Ray session; children run sequentially, each
with its own ``ray.init``. Prints one JSON line.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

DRILL_ROOT = "/tmp/graft_resume_drill"


def child(flag_dir: str, dedup_dir: str) -> None:
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from bench import prepare_input

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    input_dir, _ = prepare_input()

    # ---- stage 1: flagship spatial join, per-tile-bucket partitions ----
    import ray.data

    from gis_scripts_ray.pipelines.flagship import geocode
    from gis_scripts_ray.sources.polygons import synthesize_polygons
    from gis_scripts_ray.stages.encode import EncodeConfig, encode_cells
    from gis_scripts_ray.stages.pip_join import pip_join
    from gis_scripts_ray.state.checkpoint import write_partitioned_resumable

    ds = ray.data.read_parquet(
        input_dir, columns=["url", "text", "lang"], override_num_blocks=64
    )

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "lang": batch["lang"],
                "text_len": pc.cast(pc.binary_length(batch["text"]), pa.int64()),
            }
        )

    located = geocode(ds.map_batches(slim, batch_format="pyarrow"))
    located = located.select_columns(["lang", "text_len", "lat", "lon"])
    joined = pip_join(
        encode_cells(located, EncodeConfig()),
        synthesize_polygons(n_extra_rects=2000),
        carry_cols=["lang", "tile_x", "tile_y", "text_len"],
    )

    def tile_bucket(batch: pa.Table) -> pa.Array:
        import numpy as np

        b = (
            batch["tile_x"].to_numpy().astype(np.int64) * 64
            + batch["tile_y"].to_numpy().astype(np.int64)
        ) % 24
        return pa.array(b.astype(str), pa.string())

    write_partitioned_resumable(joined, flag_dir, tile_bucket, lineage="flagship")

    # ---- stage 2: minhash near-dup candidate clusters, combo buckets ----
    from gis_scripts_ray.stages.dedup import minhash_band_counts
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    docs = ray.data.read_parquet(
        input_dir, columns=["text"], override_num_blocks=128
    )
    partials = docs.map_batches(
        minhash_band_counts, fn_kwargs={"text_col": "text"}, batch_format="pyarrow"
    )
    clusters = coalesce_shuffle_sum(partials, ["combo"], ["n"])
    multi = clusters.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)), batch_format="pyarrow"
    )

    def combo_bucket(batch: pa.Table) -> pa.Array:
        return pc.cast(
            pc.bit_wise_and(pc.cast(batch["combo"], pa.int64()), 15), pa.string()
        )

    write_partitioned_resumable(multi, dedup_dir, combo_bucket, lineage="dedup")
    ray.shutdown()
    print("CHILD_DONE")


def _manifest_count(out_dir: str) -> int:
    return len(glob.glob(os.path.join(out_dir, "_manifest", "*.json")))


def _data_mtimes(out_dir: str) -> dict[str, float]:
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))
    }


def _output_hash(dirs: list[str]) -> tuple[str, int]:
    """Order-independent value hash over all partitions of all stages:
    DuckDB row-hash summed per stage (commutative, so partition order and
    file layout don't matter — only the multiset of row values)."""
    import duckdb

    con = duckdb.connect()
    digest = hashlib.sha256()
    total = 0
    for stage_i, d in enumerate(dirs):
        files = sorted(glob.glob(os.path.join(d, "part=*", "data.parquet")))
        cols = con.execute(
            f"SELECT * FROM read_parquet({files!r}) LIMIT 0"
        ).fetch_arrow_table().column_names
        collist = ", ".join(f'"{c}"' for c in sorted(cols))
        n, h = con.execute(
            f"SELECT COUNT(*), SUM(hash(ROW({collist})) % 4611686018427387904) "
            f"FROM read_parquet({files!r})"
        ).fetchone()
        total += int(n)
        digest.update(f"{stage_i}:{n}:{h}".encode())
    return digest.hexdigest(), total


def _spawn(flag_dir: str, dedup_dir: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", flag_dir, dedup_dir],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def _ray_cleanup() -> None:
    subprocess.run(
        ["ray", "stop", "--force"], capture_output=True, check=False
    )
    time.sleep(2)


def orchestrate() -> None:
    shutil.rmtree(DRILL_ROOT, ignore_errors=True)
    flag_dir = os.path.join(DRILL_ROOT, "flagship")
    dedup_dir = os.path.join(DRILL_ROOT, "dedup")
    base_flag = os.path.join(DRILL_ROOT, "baseline_flagship")
    base_dedup = os.path.join(DRILL_ROOT, "baseline_dedup")

    # -- run 1: kill once stage 1's manifest is complete and stage 2 is live
    t0 = time.time()
    p = _spawn(flag_dir, dedup_dir)
    killed_at = None
    while p.poll() is None:
        if os.path.exists(os.path.join(flag_dir, "_metrics.parquet")):
            time.sleep(0.5)  # let stage 2's pipeline get airborne
            p.send_signal(signal.SIGKILL)
            killed_at = time.time() - t0
            break
        time.sleep(0.05)
    p.wait()
    assert killed_at is not None, "pipeline finished before the kill fired"
    _ray_cleanup()

    done_flag = _manifest_count(flag_dir)
    done_dedup = _manifest_count(dedup_dir)
    mtimes_at_kill = {**_data_mtimes(flag_dir), **_data_mtimes(dedup_dir)}
    done_keys_at_kill = {
        (d, os.path.basename(f)[len("part-"):-len(".json")])
        for d in (flag_dir, dedup_dir)
        for f in glob.glob(os.path.join(d, "_manifest", "*.json"))
    }

    # -- run 2: resume to completion
    t1 = time.time()
    p = _spawn(flag_dir, dedup_dir)
    out, _ = p.communicate()
    assert p.returncode == 0 and b"CHILD_DONE" in out, out.decode()[-2000:]
    resume_s = time.time() - t1
    _ray_cleanup()

    total_flag = _manifest_count(flag_dir)
    total_dedup = _manifest_count(dedup_dir)
    # partitions whose manifest row existed AT KILL TIME are complete —
    # the resume contract says their data files must not be rewritten
    mtimes_after = {**_data_mtimes(flag_dir), **_data_mtimes(dedup_dir)}
    rewritten = [
        p_
        for p_, m in mtimes_at_kill.items()
        if (
            os.path.dirname(os.path.dirname(p_)),
            os.path.basename(os.path.dirname(p_))[len("part="):],
        )
        in done_keys_at_kill
        and mtimes_after.get(p_) != m
    ]

    # -- run 3: clean uninterrupted baseline
    t2 = time.time()
    p = _spawn(base_flag, base_dedup)
    out, _ = p.communicate()
    assert p.returncode == 0 and b"CHILD_DONE" in out, out.decode()[-2000:]
    clean_s = time.time() - t2
    _ray_cleanup()

    h_resumed, n_resumed = _output_hash([flag_dir, dedup_dir])
    h_clean, n_clean = _output_hash([base_flag, base_dedup])

    result = {
        "metric": "resume_drill",
        "killed_at_s": round(killed_at, 2),
        "partitions_done_at_kill": done_flag + done_dedup,
        "partitions_total": total_flag + total_dedup,
        "reuse_fraction": round(
            (done_flag + done_dedup) / (total_flag + total_dedup), 3
        ),
        "completed_partitions_rewritten_on_resume": len(rewritten),
        "resume_wall_s": round(resume_s, 2),
        "clean_wall_s": round(clean_s, 2),
        "rows": n_resumed,
        "output_identical_to_clean_run": h_resumed == h_clean and n_resumed == n_clean,
    }
    assert result["output_identical_to_clean_run"], (h_resumed, h_clean)
    assert not rewritten, rewritten
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        orchestrate()
