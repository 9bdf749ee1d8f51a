"""Token-bucket partitioned inverted text index + file-pruned term search.

The text analog of ``stages/spatial_store.py`` (reference precedent:
windowed reads clip storage to the query in
``Clip_Rasters_By_Extent.py:17-36``; the ANN index proves the same
file-set pruning for embedding buckets at
``similarity.partition_paths_for_buckets``): postings (token, doc_id)
are written PARTITIONED BY TOKEN HASH BUCKET (one directory per bucket,
atomic resumable manifest), and a term query reads ONLY the buckets its
terms hash into — at 100 TB a 3-term AND scans ~3/n_buckets of the
index, never the corpus.

Bucket assignment hashes each DISTINCT token once per batch
(``dictionary_encode`` — the minhash distinct-text-signing house
pattern) through md5 (stable across numpy/python/platform versions —
a persisted layout can never afford a version-dependent hash). Postings
are POSITIONAL since v2 (one row per occurrence, ``pos`` 1-based), which
buys phrase search: a phrase slot k over term t_k maps each matching
occurrence to its candidate phrase START ``pos - k``; a (doc, start)
holding ALL len(phrase) slots is a phrase occurrence — pure additive
counting, so in-batch partials + one adaptive combine stay exact no
matter how read batches split the files. The AND query first compacts
to distinct (doc, token) pairs (occurrence rows are no longer unique per
pair) with the same combine machinery, then counts matched terms.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# bump when the partition layout or hash scheme changes (see GEO_STORE_VERSION)
# v2: postings carry 1-based token POSITIONS (phrase search; one row per
# occurrence, no longer deduped per (token, doc))
TEXT_INDEX_VERSION = 2


def token_bucket(tokens: "list[str]", n_buckets: int) -> np.ndarray:
    """Stable bucket id per token: first 8 md5 bytes mod n_buckets."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            % n_buckets
            for t in tokens
        ],
        dtype=np.int64,
    )


def postings_rows(
    batch: pa.Table, text_col: str, id_col: str, n_buckets: int
) -> pa.Table:
    """(token, doc_id, pos, bucket) POSITIONAL postings for a batch —
    one row per token occurrence, ``pos`` 1-based (matches the SQL twin's
    ``w[i]`` indexing); vectorized split/explode via Arrow; md5 touches
    DISTINCT tokens only (the dictionary-encode house pattern)."""
    toks = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    flat = pc.list_flatten(toks)
    reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), reps
    )
    total = int(reps.sum())
    # 1-based position within each doc: global arange minus doc starts
    starts = np.repeat(np.cumsum(reps) - reps, reps)
    pos = np.arange(total, dtype=np.int64) - starts + 1
    t = pa.table(
        {"token": flat, "doc_id": pa.array(ids), "pos": pa.array(pos)}
    )
    dic = t["token"].combine_chunks().dictionary_encode()
    buckets = token_bucket(dic.dictionary.to_pylist(), n_buckets)
    return t.append_column(
        "bucket", pa.array(buckets[dic.indices.to_numpy(zero_copy_only=False)])
    )


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_index_meta.json")


def index_n_buckets(out_dir: str) -> "int | None":
    """The layout's CURRENT bucket count, from the index meta file —
    the routing source of truth once splits can change it."""
    import json

    p = _meta_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(json.load(fh)["n_buckets"])


def _write_meta(out_dir: str, n_buckets: int, pending_prune: bool = False) -> None:
    import json

    os.makedirs(out_dir, exist_ok=True)
    tmp = _meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "n_buckets": int(n_buckets),
                "version": TEXT_INDEX_VERSION,
                "pending_prune": bool(pending_prune),
            },
            fh,
        )
    os.replace(tmp, _meta_path(out_dir))


def _read_meta(out_dir: str) -> "tuple[int | None, bool]":
    """(n_buckets, pending_prune) — pending means a split committed its
    routing flip but crashed before pruning the moved rows out of the
    source buckets (stale copies remain; term queries are still exact)."""
    import json

    p = _meta_path(out_dir)
    if not os.path.exists(p):
        return None, False
    with open(p) as fh:
        d = json.load(fh)
    return int(d["n_buckets"]), bool(d.get("pending_prune", False))


def _resolve_buckets(out_dir: str, n_buckets: "int | None") -> int:
    """Meta wins; an explicit argument that CONTRADICTS the persisted
    layout is a routing bug and raises rather than mis-routing terms."""
    meta = index_n_buckets(out_dir)
    if meta is None:
        if n_buckets is None:
            raise ValueError(f"no index meta at {out_dir}; pass n_buckets")
        return n_buckets
    if n_buckets is not None and n_buckets != meta:
        raise ValueError(
            f"index at {out_dir} has {meta} buckets (split?); caller passed "
            f"{n_buckets} — route with n_buckets=None"
        )
    return meta


def write_token_index(
    ds: ray.data.Dataset,
    out_dir: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    lineage: str = "text-index",
):
    """Build the inverted index via the resumable checkpoint sink —
    crash-safe, idempotent; a re-run drops rows of completed buckets
    before the shuffle (resume fast path). Persists the bucket count in
    ``_index_meta.json`` (splits update it; queries route by it)."""
    from gis_scripts_ray.state.checkpoint import write_partitioned_resumable

    meta = index_n_buckets(out_dir)
    if meta is not None:
        if meta != n_buckets:
            raise ValueError(
                f"index at {out_dir} already has {meta} buckets; "
                f"rebuild requested {n_buckets}"
            )
    def explode(batch: pa.Table) -> pa.Table:
        return postings_rows(batch, text_col, id_col, n_buckets)

    postings = ds.map_batches(explode, batch_format="pyarrow")

    def part_fn(batch: pa.Table) -> pa.Array:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        return pa.array(np.char.add("b", b.astype("U11")), pa.string())

    recs = write_partitioned_resumable(postings, out_dir, part_fn, lineage=lineage)
    if meta is None:
        _write_meta(out_dir, n_buckets)
    return recs


def partition_paths_for_terms(
    out_dir: str, terms: "list[str]", n_buckets: int
) -> "list[str]":
    """The parquet files a term query must read: the terms' buckets ∩
    COMPLETED partitions (factored out so tests assert the pruned set)."""
    from gis_scripts_ray.state.checkpoint import Manifest

    man = Manifest(out_dir)
    done = man.completed()
    want = {f"b{b}" for b in token_bucket(list(terms), n_buckets)}
    return [
        os.path.join(man.partition_dir(k), "data.parquet")
        for k in sorted(done)
        if k in want
    ]


# ---------------------------------------------------------------------------
# linear-hashing bucket split: double the layout without a shuffle
# ---------------------------------------------------------------------------

_SPLIT_KEY = b"split_level"


def _token_new_buckets(table: pa.Table, n_new: int) -> np.ndarray:
    """Per-row bucket ids under the DOUBLED layout — md5 touches distinct
    tokens only (the dictionary-encode house pattern)."""
    dic = table["token"].combine_chunks().dictionary_encode()
    b = token_bucket(dic.dictionary.to_pylist(), n_new)
    return b[dic.indices.to_numpy(zero_copy_only=False)]


@ray.remote(num_cpus=0.5)
def _split_create_sibling_task(src_dir: str, dst_dir: str, b: int, n_old: int):
    """Phase 1 of a split for source bucket ``b``: write sibling bucket
    ``b + n_old`` holding the rows that re-hash there under ``2*n_old``
    (md5 mod 2n of a token in bucket b is b or b+n — the linear-hashing
    invariant, asserted). The source is NOT touched, so queries routed by
    the OLD layout stay complete until the meta flip. Idempotent via the
    sibling's footer split marker. Returns n_moved."""
    import pyarrow.parquet as pq

    n_new = 2 * n_old
    dst_path = os.path.join(dst_dir, "data.parquet")
    if os.path.exists(dst_path):
        meta = pq.ParquetFile(dst_path).schema_arrow.metadata or {}
        if int(meta.get(_SPLIT_KEY, b"0")) >= n_new:
            return int(pq.ParquetFile(dst_path).metadata.num_rows)
    src = pq.read_table(os.path.join(src_dir, "data.parquet"))
    nb = _token_new_buckets(src, n_new)
    assert np.isin(nb % n_old, [b]).all(), "linear-hash invariant broken"
    moved = src.filter(pa.array(nb == b + n_old))
    meta = dict(src.schema.metadata or {})  # carry increment/tombstone markers
    meta[_SPLIT_KEY] = str(n_new).encode()
    moved = moved.replace_schema_metadata(meta)
    os.makedirs(dst_dir, exist_ok=True)
    tmp = dst_path + ".tmp-split"
    pq.write_table(moved, tmp)
    os.replace(tmp, dst_path)
    return int(moved.num_rows)


@ray.remote(num_cpus=0.5)
def _split_prune_source_task(src_dir: str, b: int, n_old: int):
    """Phase 3: drop the moved rows from source bucket ``b`` (they are
    stale under the new routing — term queries never read them, but
    whole-index scans would double-count). Footer split marker makes the
    prune idempotent (checked footer-only, no data pages). Returns
    n_rows_after."""
    import pyarrow.parquet as pq

    n_new = 2 * n_old
    data_path = os.path.join(src_dir, "data.parquet")
    pf = pq.ParquetFile(data_path)
    meta0 = pf.schema_arrow.metadata or {}
    if int(meta0.get(_SPLIT_KEY, b"0")) >= n_new:
        return int(pf.metadata.num_rows)
    src = pq.read_table(data_path)
    nb = _token_new_buckets(src, n_new)
    stay = src.filter(pa.array(nb == b))
    meta = dict(meta0)
    meta[_SPLIT_KEY] = str(n_new).encode()
    stay = stay.replace_schema_metadata(meta)
    tmp = data_path + ".tmp-split"
    pq.write_table(stay, tmp)
    os.replace(tmp, data_path)
    return int(stay.num_rows)


def _prune_sources(out_dir: str, n_old: int) -> None:
    """Phase 3 worker: prune every source bucket of the n_old→2·n_old
    split and refresh its manifest row, then clear the pending flag.
    Idempotent (footer markers) — safe to re-run after any crash."""
    from gis_scripts_ray.state.checkpoint import Manifest, PartitionRecord

    man = Manifest(out_dir)
    done = man.completed()
    n_new = 2 * n_old
    sources = sorted(int(k[1:]) for k in done if int(k[1:]) < n_old)
    stayed = ray.get(
        [
            _split_prune_source_task.remote(man.partition_dir(f"b{b}"), b, n_old)
            for b in sources
        ]
    )
    suffix = f"-split@{n_new}"
    for b, n_s in zip(sources, stayed):
        rec = done[f"b{b}"]
        lineage = rec.lineage
        if suffix not in lineage:
            lineage += suffix
        man.mark_complete(
            PartitionRecord(
                part_key=f"b{b}", n_rows=n_s, lineage=lineage, wall_s=0.0
            )
        )
    _write_meta(out_dir, n_new, pending_prune=False)


def split_token_index(out_dir: str, from_buckets: "int | None" = None) -> dict:
    """Double the index's bucket count WITHOUT a shuffle — the
    linear-hashing growth path: a token in bucket b under n buckets is in
    bucket b or b+n under 2n, so every bucket splits LOCALLY into two
    (one task per bucket, reads its own file only; at 100 TB no posting
    crosses the network). Three crash-ordered phases keep term queries
    correct throughout: (1) create every sibling bucket b+n (sources
    untouched — old routing still complete), (2) atomically flip
    ``_index_meta.json`` to 2n with ``pending_prune`` set (new routing
    reads complete siblings; stale copies left in sources are never read
    by term queries, which filter by token), (3) prune sources and clear
    the flag. Crash recovery: a re-run first SETTLES any pending phase 3
    (so a crashed split can never double-split through stale rows — the
    linear-hash assertion would reject them), then resumes: pass
    ``from_buckets`` (the pre-split count) to make the call idempotent —
    if the flip already committed it settles and returns instead of
    splitting again. Returns {"n_buckets", "rows_moved",
    "buckets_split", "resumed"}.
    """
    from gis_scripts_ray.state.checkpoint import Manifest, PartitionRecord

    n_cur, pending = _read_meta(out_dir)
    if n_cur is None:
        raise ValueError(f"no index meta at {out_dir}")
    if pending:
        # finish the crashed split's phase 3 before anything else
        _prune_sources(out_dir, n_cur // 2)
    if from_buckets is not None:
        if n_cur == 2 * from_buckets:
            return {
                "n_buckets": n_cur,
                "rows_moved": 0,
                "buckets_split": 0,
                "resumed": True,
            }
        if n_cur != from_buckets:
            raise ValueError(
                f"index at {out_dir} has {n_cur} buckets; split requested "
                f"from {from_buckets}"
            )
    n_old = n_cur
    n_new = 2 * n_old
    man = Manifest(out_dir)
    done = man.completed()
    sources = sorted(
        (int(k[1:]) for k in done if int(k[1:]) < n_old)
    )
    moved = ray.get(
        [
            _split_create_sibling_task.remote(
                man.partition_dir(f"b{b}"),
                man.partition_dir(f"b{b + n_old}"),
                b,
                n_old,
            )
            for b in sources
        ]
    )
    for b, n_m in zip(sources, moved):
        man.mark_complete(
            PartitionRecord(
                part_key=f"b{b + n_old}",
                n_rows=n_m,
                lineage=f"split-from-b{b}@{n_new}",
                wall_s=0.0,
            )
        )
    _write_meta(out_dir, n_new, pending_prune=True)  # the atomic routing flip
    _prune_sources(out_dir, n_old)
    return {
        "n_buckets": n_new,
        "rows_moved": int(sum(moved)),
        "buckets_split": len(sources),
        "resumed": False,
    }


# ---------------------------------------------------------------------------
# tombstones: takedown deletes without an immediate rewrite
# ---------------------------------------------------------------------------

_TOMBSTONE_KEY = b"applied_tombstones"


def tombstone_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_tombstones")


def tombstone_paths(out_dir: str) -> "list[str]":
    """Parquet files of every committed deletion set (tmp dirs excluded)."""
    td = tombstone_dir(out_dir)
    if not os.path.isdir(td):
        return []
    out = []
    for d in sorted(os.listdir(td)):
        full = os.path.join(td, d)
        if d.startswith(".") or d.endswith(".tmp") or not os.path.isdir(full):
            continue
        out += sorted(
            os.path.join(full, f)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    return out


def delete_docs(
    out_dir: str, ids: ray.data.Dataset, deletion_id: str, id_col: str = "doc_id"
) -> int:
    """Register a takedown set: the doc_ids in ``ids`` stop appearing in
    every index query IMMEDIATELY (query-time anti-filter) and are
    physically removed by the next :func:`compact_token_index` — the
    GDPR/takedown shape: deletes are doc-keyed while postings are
    token-bucketed, so eager removal would rewrite EVERY bucket per
    request; tombstoning batches that cost into one compaction.

    The set reduces to DISTINCT ids distributedly, writes under
    ``_tombstones/<deletion_id>.tmp`` and commits with one atomic dir
    rename. Idempotent per ``deletion_id`` (which must identify the
    set's CONTENT). Returns the number of tombstoned ids."""
    import shutil

    import pyarrow.parquet as pq

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    if not deletion_id.replace("-", "").replace("_", "").isalnum():
        raise ValueError("deletion_id must be filesystem-safe")
    final = os.path.join(tombstone_dir(out_dir), deletion_id)
    if os.path.isdir(final):
        return sum(
            pq.ParquetFile(os.path.join(final, f)).metadata.num_rows
            for f in os.listdir(final)
            if f.endswith(".parquet")
        )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by(["doc_id"]).aggregate([("one", "min")]).rename_columns(
            ["doc_id", "one"]
        )

    distinct = coalesce_shuffle_agg(
        ids.map_batches(distinct_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"one": "min"},
    ).select_columns(["doc_id"])
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    n = int(distinct.count())
    distinct.write_parquet(tmp)
    os.replace(tmp, final)  # atomic commit of the whole deletion set
    return n


def _without_tombstones(
    ds: ray.data.Dataset, out_dir: str, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Anti-filter a doc-keyed dataset against the index's tombstones —
    adaptive delivery (measured broadcast, else partitioned anti-join);
    a no-op plan when no tombstones exist."""
    from gis_scripts_ray.stages.joins import hash_anti_join

    paths = tombstone_paths(out_dir)
    if not paths:
        return ds
    tomb = ray.data.read_parquet(paths, columns=["doc_id"])
    return hash_anti_join(ds, tomb, on=id_col, right_on="doc_id")


@ray.remote(num_cpus=0.5)
def _compact_bucket_task(
    main_part_dir: str, tombstone_files: "list[str]", ids_label: str
):
    """Physically drop tombstoned doc_ids from ONE bucket. Same atomic
    footer-marker protocol as the merge: ``applied_tombstones`` in the
    rewritten file's footer commits with the data in a single rename.
    Returns (n_rows_after, n_removed, skipped)."""
    import pyarrow.parquet as pq

    data_path = os.path.join(main_part_dir, "data.parquet")
    meta0 = pq.ParquetFile(data_path).schema_arrow.metadata or {}
    already = set(
        x for x in meta0.get(_TOMBSTONE_KEY, b"").decode().split(",") if x
    )
    want = set(ids_label.split(",")) if ids_label else set()
    if want <= already:
        n = pq.ParquetFile(data_path).metadata.num_rows
        return int(n), 0, True
    old = pq.read_table(data_path)
    dead = pa.concat_tables(
        [pq.read_table(f, columns=["doc_id"]) for f in tombstone_files]
    )["doc_id"].combine_chunks().cast(pa.int64())
    keep_mask = pc.invert(pc.is_in(old["doc_id"], value_set=dead))
    new = old.filter(keep_mask)
    meta = dict(old.schema.metadata or {})
    meta[_TOMBSTONE_KEY] = ",".join(sorted(already | want)).encode()
    new = new.replace_schema_metadata(meta)
    tmp = data_path + ".tmp-compact"
    pq.write_table(new, tmp)
    os.replace(tmp, data_path)  # atomic: data + marker in one rename
    return int(new.num_rows), int(old.num_rows - new.num_rows), False


def compact_token_index(out_dir: str) -> dict:
    """Apply every committed tombstone set physically: one Ray task per
    completed bucket filters its postings and atomically rewrites the
    file (footer records which deletion sets are applied, so a crashed
    or repeated compaction skips finished buckets). Deletion sets whose
    ids are applied in EVERY bucket are then garbage-collected; a crash
    before the GC leaves them as harmless query-time no-ops.

    Returns {"buckets", "buckets_skipped", "rows_removed",
    "tombstone_sets_cleared"}."""
    import shutil

    from gis_scripts_ray.state.checkpoint import Manifest, PartitionRecord

    files = tombstone_paths(out_dir)
    man = Manifest(out_dir)
    done = man.completed()
    ids = sorted(
        {os.path.basename(os.path.dirname(f)) for f in files}
    )
    label = ",".join(ids)
    if not files or not done:
        return {
            "buckets": 0,
            "buckets_skipped": 0,
            "rows_removed": 0,
            "tombstone_sets_cleared": 0,
        }
    keys = sorted(done)
    results = ray.get(
        [
            _compact_bucket_task.remote(man.partition_dir(k), files, label)
            for k in keys
        ]
    )
    removed = 0
    skipped = 0
    for k, (n_after, n_rm, skip) in zip(keys, results):
        removed += n_rm
        skipped += int(skip)
        if not skip:
            rec = done[k]
            man.mark_complete(
                PartitionRecord(
                    part_key=k,
                    n_rows=n_after,
                    lineage=rec.lineage + f"-compact[{label}]",
                    wall_s=0.0,
                )
            )
    # every bucket now covers `ids` -> the sets are physically applied
    cleared = 0
    for d in ids:
        shutil.rmtree(os.path.join(tombstone_dir(out_dir), d), ignore_errors=True)
        cleared += 1
    return {
        "buckets": len(keys),
        "buckets_skipped": skipped,
        "rows_removed": removed,
        "tombstone_sets_cleared": cleared,
    }


def term_and_query(
    out_dir: str,
    terms: "list[str]",
    n_buckets: "int | None" = None,
) -> ray.data.Dataset:
    """doc_ids containing ALL ``terms`` (AND), reading only the terms'
    bucket partitions. Returns (doc_id:int64), identical rows to a
    full-corpus tokenize+filter (tested)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    terms = list(dict.fromkeys(terms))  # dedupe, preserve order
    if not terms:
        raise ValueError("term_and_query needs at least one term")
    n_buckets = _resolve_buckets(out_dir, n_buckets)
    paths = partition_paths_for_terms(out_dir, terms, n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64())})
        )
    n_terms = len(terms)
    term_arr = pa.array(terms, pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "token": hit["token"],
                "one": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["doc_id", "token"]).aggregate([("one", "min")]).rename_columns(
            ["doc_id", "token", "one"]
        )

    # positional postings repeat (doc, token) per occurrence AND one
    # pair's rows can straddle read batches — compact to globally
    # distinct pairs first (min is idempotent), then count terms per doc
    pairs = coalesce_shuffle_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["doc_id", "token"],
        {"one": "min"},
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": batch["doc_id"], "n_hit": batch["one"]})
        return t.group_by(["doc_id"]).aggregate([("n_hit", "sum")]).rename_columns(
            ["doc_id", "n_hit"]
        )

    counts = coalesce_shuffle_agg(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"n_hit": "sum"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["n_hit"], n_terms))
        return pa.table({"doc_id": keep["doc_id"].combine_chunks().cast(pa.int64())})

    return _without_tombstones(
        counts.map_batches(finish, batch_format="pyarrow"), out_dir
    )


def kwic_snippets(
    out_dir: str,
    docs_ds: ray.data.Dataset,
    term: str,
    window: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: "int | None" = None,
) -> ray.data.Dataset:
    """Keyword-in-context snippets: for every doc containing ``term`` (as
    a whole token), the ``window`` tokens either side of the FIRST
    occurrence, joined by single spaces — the search-result-snippet /
    concordance shape. Index-accelerated scan: candidate doc_ids come
    from the inverted index reading ONLY the term's bucket partitions
    (tombstone-masked), the corpus is Bloom-semi-joined down to
    candidates before any text is tokenized, and the snippet kernel is
    fully vectorized (one ``split_pattern``, per-row first-match via
    ``minimum.reduceat``, window slice re-assembled as a ListArray and
    ``binary_join``-ed — no Python over rows). Token domain (split on
    ' ', same tokenizer as the index), so snippets are byte-exact
    cross-engine regardless of multi-byte codepoints.

    Returns (doc_id:int64, snippet:string), one row per matching doc."""
    from gis_scripts_ray.stages.joins import bloom_semi_join

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "snippet": pa.array([], pa.string())}
    )
    cands = term_and_query(out_dir, [term], n_buckets=n_buckets).materialize()
    if cands.count() == 0:
        return ray.data.from_arrow(empty)
    docs = bloom_semi_join(docs_ds, cands, on=id_col, right_on="doc_id")

    def snip(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = la.flatten()
        offs = la.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        n = len(la)
        total = len(flat)
        match = pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)
        keyed = np.where(match, np.arange(total, dtype=np.int64), total)
        starts, ends = offs[:-1], offs[1:]
        first = np.full(n, total, np.int64)
        ne = ends > starts
        if ne.any():
            # reduceat over nonempty row starts: empty rows between two
            # passed indices contribute no elements, so each reduction
            # covers exactly its own row's tokens
            first[ne] = np.minimum.reduceat(keyed, starts[ne])
        found = first < ends  # all rows post-semi-join, but stay exact
        lf = first - starts
        w0 = np.maximum(lf - window, 0)[found]
        w1 = np.minimum(lf + window + 1, ends - starts)[found]
        lens = w1 - w0
        new_offs = np.concatenate([[0], np.cumsum(lens)])
        flat_idx = (
            np.repeat(starts[found] + w0, lens)
            + np.arange(new_offs[-1], dtype=np.int64)
            - np.repeat(new_offs[:-1], lens)
        )
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()),
            flat.take(pa.array(flat_idx, pa.int64())),
        )
        ids = pc.filter(batch[id_col], pa.array(found))
        return pa.table(
            {
                "doc_id": ids.combine_chunks().cast(pa.int64())
                if isinstance(ids, pa.ChunkedArray)
                else ids.cast(pa.int64()),
                "snippet": pc.binary_join(lst, " ").cast(pa.string()),
            }
        )

    return docs.map_batches(snip, batch_format="pyarrow")


def term_or_topk(
    out_dir: str,
    terms: "list[str]",
    k: int = 10,
    n_buckets: "int | None" = None,
) -> ray.data.Dataset:
    """Ranked OR retrieval: the top ``k`` docs matching ANY of ``terms``,
    ranked by (matched distinct terms DESC, doc_id ASC) — the
    deterministic tie rule every top-k path in this engine uses. Reads
    only the terms' bucket partitions; the match-count table folds
    through the distributed per-group top-k machinery (constant group),
    never a global sort. Returns (doc_id:int64, n_matched:int64)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("term_or_topk needs at least one term")
    n_buckets = _resolve_buckets(out_dir, n_buckets)
    paths = partition_paths_for_terms(out_dir, terms, n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                }
            )
        )
    term_arr = pa.array(terms, pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "token": hit["token"],
                "one": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["doc_id", "token"])
            .aggregate([("one", "min")])
            .rename_columns(["doc_id", "token", "one"])
        )

    pairs = coalesce_shuffle_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["doc_id", "token"],
        {"one": "min"},
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_matched": batch["one"],
                "_g": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["doc_id", "_g"])
            .aggregate([("n_matched", "sum")])
            .rename_columns(["doc_id", "_g", "n_matched"])
        )

    counts = coalesce_shuffle_agg(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        ["doc_id", "_g"],
        {"n_matched": "sum"},
    )
    # tombstoned docs must not occupy top-k slots: filter BEFORE ranking
    counts = _without_tombstones(counts, out_dir)
    top = topk_per_group(counts, "_g", "n_matched", "doc_id", k)
    return top.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "n_matched": b["n_matched"],
            }
        ),
        batch_format="pyarrow",
    )


def bm25_topk(
    out_dir: str,
    docs_ds: ray.data.Dataset,
    terms: "list[str]",
    k: int = 10,
    n_buckets: "int | None" = None,
    k1_mu: int = 1_200_000,
    b_mu: int = 750_000,
    idf_scale: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """BM25 ranked retrieval over the inverted index, in the EXACT
    integer domain (the reference's ranked-retrieval shape; integer
    fixed-point because a float log-idf could never be value-hash
    twinned — the lmscore.py precedent). Per (doc, term):

        dlnorm = 1e6 - b_mu + (b_mu * dl * D) // L       (dl/avgdl = dl*D/L)
        denom  = tf * 1e6 + (k1_mu * dlnorm) // 1e6
        frac   = (tf * (1e6 + k1_mu) * 1e6) // denom     (<= (k1+1)*1e6)
        idf    = ((2*(D - df) + 1) * idf_scale) // (2*df + 1)
        score  = SUM over query terms of idf * frac

    (k1 = k1_mu/1e6, b = b_mu/1e6; idf is the probabilistic
    (N-df+0.5)/(df+0.5) ratio WITHOUT the log — monotone in df, exact in
    integers; all operands positive so floor == truncate cross-engine.)
    int64 envelope: b_mu*dl*D needs dl*D < ~1.2e13 and idf*frac needs
    D < ~6e9 — beyond that, widen idf_scale down or go HUGEINT.

    Plan: tf per (doc, term) reads ONLY the terms' bucket partitions
    (adaptive combine of in-batch counts); df is a |terms|-row aggregate
    (fixed-size driver take — the sketch-register rule); doc lengths are
    one vectorized pass over ``docs_ds`` (same tokenizer as the index),
    Bloom-prefiltered to candidate docs before the ONE hash join; scores
    sum per doc distributedly; tombstoned docs are anti-filtered BEFORE
    ranking; the final top-k folds through ``topk_per_group`` with the
    engine-wide (score DESC, doc_id ASC) tie rule. Returns
    (doc_id:int64, score:int64) — the top ``k`` (or fewer) matches."""
    from gis_scripts_ray.stages.joins import bloom_semi_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    n_buckets = _resolve_buckets(out_dir, n_buckets)

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
    )

    # --- doc lengths (same tokenizer as postings_rows: split on ' ') ---
    def doclen(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
        )
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "dl": n.combine_chunks().cast(pa.int64()),
            }
        )

    dls = docs_ds.map_batches(doclen, batch_format="pyarrow").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_g": pa.array([0], pa.int64()),
                "d": pa.array([batch.num_rows], pa.int64()),
                "l": pa.array(
                    [int(pc.sum(batch["dl"]).as_py() or 0)], pa.int64()
                ),
            }
        )

    stats = coalesce_shuffle_agg(
        dls.map_batches(stats_partial, batch_format="pyarrow"),
        ["_g"],
        {"d": "sum", "l": "sum"},
    ).take_all()  # exactly one fixed-size row — the sketch-register rule
    if not stats:
        return ray.data.from_arrow(empty)
    big_d, big_l = int(stats[0]["d"]), int(stats[0]["l"])

    # --- tf per (doc, term): terms' buckets only ---
    paths = partition_paths_for_terms(out_dir, terms, n_buckets)
    if not paths:
        return ray.data.from_arrow(empty)
    term_arr = pa.array(terms, pa.string())

    def tf_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "token": hit["token"],
                "tf": pa.array(np.ones(hit.num_rows, np.int64)),
            }
        )
        return t.group_by(["doc_id", "token"]).aggregate(
            [("tf", "sum")]
        ).rename_columns(["doc_id", "token", "tf"])

    pairs = coalesce_shuffle_agg(
        ray.data.read_parquet(paths, columns=["token", "doc_id"]).map_batches(
            tf_partial, batch_format="pyarrow"
        ),
        ["doc_id", "token"],
        {"tf": "sum"},
    ).materialize()
    if pairs.count() == 0:
        # no query term occurs anywhere: the buckets existed but held no
        # postings for these terms (an empty pairs dataset may carry a
        # None schema, which the downstream join cannot type)
        return ray.data.from_arrow(empty)

    # --- df per term: |terms| rows, a fixed-size driver take ---
    def df_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "token": batch["token"],
                "df": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by(["token"]).aggregate([("df", "sum")]).rename_columns(
            ["token", "df"]
        )

    df_rows = coalesce_shuffle_agg(
        pairs.map_batches(df_partial, batch_format="pyarrow"),
        ["token"],
        {"df": "sum"},
    ).take_all()
    idf_by_term = {
        r["token"]: (2 * (big_d - int(r["df"])) + 1)
        * idf_scale
        // (2 * int(r["df"]) + 1)
        for r in df_rows
    }
    idf_np = np.array([idf_by_term.get(t, 0) for t in terms], np.int64)

    # --- ONE join: candidate doc lengths reach their (doc, term) rows ---
    # bloom prefilter drops non-candidate docs from the corpus-sized
    # doclen side before the shuffle (the bloom_join_revenue pattern)
    joined = bloom_semi_join(dls, pairs, on=id_col, right_on="doc_id")

    def score_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = pc.index_in(
            batch["token"], value_set=term_arr
        ).to_numpy(zero_copy_only=False)
        idf = idf_np[ti.astype(np.int64)]
        dlnorm = 1_000_000 - b_mu + (b_mu * dl * big_d) // big_l
        denom = tf * 1_000_000 + (k1_mu * dlnorm) // 1_000_000
        frac = (tf * (1_000_000 + k1_mu) * 1_000_000) // denom
        t = pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "score": pa.array(idf * frac, pa.int64()),
            }
        )
        return t.group_by(["doc_id"]).aggregate([("score", "sum")]).rename_columns(
            ["doc_id", "score"]
        )

    scores = coalesce_shuffle_agg(
        joined.map_batches(score_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"score": "sum"},
    )
    # tombstoned docs must not occupy top-k slots: filter BEFORE ranking
    scores = _without_tombstones(scores, out_dir)

    def add_g(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    top = topk_per_group(
        scores.map_batches(add_g, batch_format="pyarrow"),
        "_g",
        "score",
        "doc_id",
        k,
    )
    return top.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "score": b["score"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def proximity_topk(
    out_dir: str,
    term_a: str,
    term_b: str,
    k: int = 10,
    n_buckets: "int | None" = None,
    num_doc_buckets: int = 32,
) -> ray.data.Dataset:
    """Proximity retrieval over the POSITIONAL index: the k docs where
    ``term_a`` and ``term_b`` occur closest together — per doc the
    minimum ``|pos_a - pos_b|`` over all occurrence pairs, ranked
    (gap ASC, doc_id ASC). The ranking signal phrase search can't give
    ("terms near each other" without requiring adjacency).

    Plan: read ONLY the two terms' bucket partitions; occurrences of one
    doc can straddle read batches, so (doc, pos, term-label) rows hash
    ONE shuffle into doc buckets; each bucket resolves every doc
    vectorized — sort by (doc, pos) and take the min gap over ADJACENT
    cross-label pairs (the min over all pairs is always achieved by an
    adjacent pair in the merged position order), one ``minimum.reduceat``
    per bucket, no Python over docs. Docs lacking either term produce no
    cross-label adjacency and drop; tombstoned docs are masked before
    ranking; the final top-k folds through ``topk_per_group`` ascending
    under the (gap ASC, doc_id ASC) tie rule.

    Returns (doc_id:int64, gap:int64), the top k (or fewer)."""
    from gis_scripts_ray.stages.topk import topk_per_group
    from gis_scripts_ray.stages.windows import _bucket_of

    if term_a == term_b:
        raise ValueError("proximity_topk needs two distinct terms")
    n_buckets = _resolve_buckets(out_dir, n_buckets)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "gap": pa.array([], pa.int64())}
    )
    paths = partition_paths_for_terms(out_dir, [term_a, term_b], n_buckets)
    if not paths:
        return ray.data.from_arrow(empty)

    def tag(batch: pa.Table) -> pa.Table:
        hit = batch.filter(
            pc.is_in(batch["token"], value_set=pa.array([term_a, term_b]))
        )
        lab = pc.equal(hit["token"], pa.scalar(term_b))
        t = pa.table(
            {
                "doc_id": hit["doc_id"].combine_chunks().cast(pa.int64()),
                "pos": hit["pos"].combine_chunks().cast(pa.int64()),
                "lab": lab.combine_chunks()
                if isinstance(lab, pa.ChunkedArray)
                else lab,
            }
        )
        return t.append_column(
            "_bk", pa.array(_bucket_of(t["doc_id"], num_doc_buckets), pa.int64())
        )

    def min_gap(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        lab = g["lab"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((pos, doc))
        d, p, l = doc[order], pos[order], lab[order]
        adj = (d[1:] == d[:-1]) & (l[1:] != l[:-1])
        if not adj.any():
            return empty
        gaps = np.where(adj, p[1:] - p[:-1], np.iinfo(np.int64).max)
        new = np.ones(n, dtype=bool)
        new[1:] = d[1:] != d[:-1]
        seg_starts = np.flatnonzero(new)
        # adjacent-pair i covers rows (i, i+1); pair array has length n-1,
        # per-doc pairs live in [seg_start, next_seg_start - 1)
        pair_seg = np.minimum(seg_starts, n - 2) if n >= 2 else seg_starts
        mins = np.minimum.reduceat(gaps, pair_seg)
        docs_out = d[seg_starts]
        keep = mins < np.iinfo(np.int64).max
        # single-row docs whose clamped segment read a neighbor's pair:
        # their own range is empty, so recompute validity strictly —
        # a doc's pair range is [seg_start, seg_end - 1); empty => drop
        seg_ends = np.append(seg_starts[1:], n)
        has_pairs = seg_ends - seg_starts >= 2
        keep &= has_pairs
        return pa.table(
            {
                "doc_id": pa.array(docs_out[keep], pa.int64()),
                "gap": pa.array(mins[keep], pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(paths, columns=["token", "doc_id", "pos"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(min_gap, batch_format="pyarrow")
    )
    rows = _without_tombstones(rows, out_dir).materialize()
    if rows.count() == 0:
        # no doc contains both terms (all-empty group outputs would also
        # degrade the dataset schema to null — the bm25 empty quirk)
        return ray.data.from_arrow(empty)

    def add_g(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    top = topk_per_group(
        rows.map_batches(add_g, batch_format="pyarrow"),
        "_g",
        "gap",
        "doc_id",
        k,
        ascending=True,
    )
    return top.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "gap": b["gap"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def phrase_query(
    out_dir: str,
    phrase: "list[str]",
    n_buckets: "int | None" = None,
) -> ray.data.Dataset:
    """Exact phrase search over the positional index: docs containing the
    consecutive token sequence ``phrase``, with occurrence counts.

    Plan: read ONLY the phrase terms' bucket partitions; slot k of the
    phrase maps every occurrence of term_k at position p to candidate
    start ``p - k`` (one output row per matching slot — a repeated term
    in the phrase fans out once per slot, handling phrases like
    ``a b a``); a (doc, start) with all ``len(phrase)`` slot rows is an
    occurrence (counts are purely additive — read-batch splits cannot
    break them); occurrences then count per doc. Returns
    (doc_id:int64, n_occurrences:int64), rows only for docs with >= 1
    occurrence."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    if not phrase:
        raise ValueError("phrase_query needs at least one term")
    n_buckets = _resolve_buckets(out_dir, n_buckets)
    k_of: dict[str, list[int]] = {}
    for k, t in enumerate(phrase):
        k_of.setdefault(t, []).append(k)
    n_slots = len(phrase)
    paths = partition_paths_for_terms(out_dir, list(k_of), n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        )
    term_arr = pa.array(list(k_of), pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id", "pos"])

    def slot_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        tok_arr = hit["token"].combine_chunks()
        doc = hit["doc_id"].to_numpy(zero_copy_only=False)
        pos = hit["pos"].to_numpy(zero_copy_only=False)
        docs_out, starts, slots = [], [], []
        for k, t in enumerate(phrase):
            m = pc.equal(tok_arr, t).to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            if not m.any():
                continue
            s = pos[m] - k
            ok = s >= 1
            docs_out.append(doc[m][ok])
            starts.append(s[ok])
            slots.append(np.full(int(ok.sum()), 1, dtype=np.int64))
        if not docs_out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "n_slots": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(np.concatenate(docs_out)),
                "start": pa.array(np.concatenate(starts)),
                "n_slots": pa.array(np.concatenate(slots)),
            }
        )
        return (
            t.group_by(["doc_id", "start"])
            .aggregate([("n_slots", "sum")])
            .rename_columns(["doc_id", "start", "n_slots"])
        )

    cand = coalesce_shuffle_agg(
        ds.map_batches(slot_partial, batch_format="pyarrow"),
        ["doc_id", "start"],
        {"n_slots": "sum"},
    )

    def occ_partial(batch: pa.Table) -> pa.Table:
        occ = batch.filter(pc.equal(batch["n_slots"], n_slots))
        t = pa.table(
            {
                "doc_id": occ["doc_id"],
                "n_occurrences": pa.array(np.ones(occ.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["doc_id"])
            .aggregate([("n_occurrences", "sum")])
            .rename_columns(["doc_id", "n_occurrences"])
        )

    return _without_tombstones(
        coalesce_shuffle_agg(
            cand.map_batches(occ_partial, batch_format="pyarrow"),
            ["doc_id"],
            {"n_occurrences": "sum"},
        ),
        out_dir,
    )


# ---------------------------------------------------------------------------
# incremental maintenance (index freshness without a rebuild)
# ---------------------------------------------------------------------------


_APPLIED_KEY = b"applied_increments"


def applied_increments(data_path: str) -> "tuple[str, ...]":
    """Increment ids already merged into a bucket file — read from the
    parquet FOOTER metadata (footer-only read, no data pages)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(data_path).schema_arrow.metadata or {}
    return tuple(
        x for x in meta.get(_APPLIED_KEY, b"").decode().split(",") if x
    )


@ray.remote(num_cpus=0.5)
def _merge_bucket_task(main_part_dir: str, staging_file: str, increment_id: str):
    """Merge ONE bucket: old partition parquet + increment parquet.

    Atomicity: the applied-increment marker rides in the merged file's
    parquet FOOTER metadata, so the single ``os.replace`` of
    ``data.parquet`` commits data and marker together — there is no
    window where the bucket is merged-but-unmarked (double-apply) or
    marked-but-unmerged (lost rows), and the old file stays readable
    until the atomic rename. Returns (n_rows_total, n_rows_added,
    skipped)."""
    import os

    import pyarrow.parquet as pq

    data_path = os.path.join(main_part_dir, "data.parquet")
    applied: "tuple[str, ...]" = ()
    if os.path.exists(data_path):
        applied = applied_increments(data_path)
        if increment_id in applied:
            n = pq.ParquetFile(data_path).metadata.num_rows
            return int(n), 0, True
        old = pq.read_table(data_path)
        inc = pq.read_table(staging_file)
        merged = pa.concat_tables([old.select(inc.column_names), inc])
    else:
        merged = pq.read_table(staging_file)
    n_added = int(pq.ParquetFile(staging_file).metadata.num_rows)
    meta = dict(merged.schema.metadata or {})
    meta[_APPLIED_KEY] = ",".join(applied + (increment_id,)).encode()
    merged = merged.replace_schema_metadata(meta)
    os.makedirs(main_part_dir, exist_ok=True)
    tmp = os.path.join(main_part_dir, f"data.parquet.tmp-{increment_id}")
    pq.write_table(merged, tmp)
    os.replace(tmp, data_path)  # atomic: data + marker in one rename
    return int(merged.num_rows), n_added, False


def merge_token_index(
    out_dir: str,
    new_ds: ray.data.Dataset,
    increment_id: str,
    n_buckets: "int | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Merge an increment of NEW documents into a persisted token index
    WITHOUT rebuilding it — the index-freshness operation: at 100 TB the
    nightly crawl delta must not re-shuffle the whole corpus's postings.

    Plan: the increment's postings build into a STAGING index under
    ``out_dir/_incr_<id>`` (the same distributed resumable writer as the
    base build — only the delta shuffles), then ONE Ray task per TOUCHED
    bucket concatenates the old partition file with the staging file and
    atomically replaces ``data.parquet``; the applied-increment marker
    rides in the replaced file's parquet FOOTER, so a crash can never
    leave a bucket merged-but-unmarked or marked-but-unmerged. Untouched
    buckets are never read, never written. Idempotent per
    (bucket, increment_id): a crashed or repeated merge skips marked
    buckets, so postings are never double-applied; the staging index is
    removed only after every touched bucket is marked AND the manifest
    refreshed. Contracts: ``increment_id`` uniquely identifies the
    increment's CONTENT (reusing an id with different rows would
    part-skip it), and increment ``doc_id``s are NEW to the index
    (postings are facts keyed by (doc, pos); re-adding an existing doc
    would duplicate them — dedup upstream, see ``dedup.hash_anti_join``).

    Returns {"buckets_touched", "buckets_new", "buckets_skipped",
    "rows_added", "rows_total_touched"}.
    """
    import os
    import shutil

    from gis_scripts_ray.state.checkpoint import Manifest, PartitionRecord

    if not increment_id.replace("-", "").replace("_", "").isalnum():
        raise ValueError("increment_id must be filesystem-safe")
    n_buckets = _resolve_buckets(out_dir, n_buckets)
    staging = os.path.join(out_dir, f"_incr_{increment_id}")
    write_token_index(
        new_ds, staging, n_buckets=n_buckets, text_col=text_col,
        id_col=id_col, lineage=f"incr-{increment_id}",
    )
    man = Manifest(out_dir)
    stg = Manifest(staging)
    done_main = man.completed()
    touched = sorted(stg.completed())
    results = ray.get(
        [
            _merge_bucket_task.remote(
                man.partition_dir(key),
                os.path.join(stg.partition_dir(key), "data.parquet"),
                increment_id,
            )
            for key in touched
        ]
    )
    suffix = f"+incr-{increment_id}"
    rows_added = 0
    rows_total = 0
    n_skipped = 0
    for key, (n_total, n_add, skipped) in zip(touched, results):
        rows_added += n_add
        rows_total += n_total
        n_skipped += int(skipped)
        # manifest refresh is idempotent — a skipped bucket still gets its
        # lineage suffix if a crash-rerun lost the first mark_complete
        old_rec = done_main.get(key)
        lineage = old_rec.lineage if old_rec else "text-index"
        if suffix not in lineage:
            lineage += suffix
        man.mark_complete(
            PartitionRecord(
                part_key=key, n_rows=n_total, lineage=lineage, wall_s=0.0
            )
        )
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "buckets_touched": len(touched),
        "buckets_new": sum(1 for k in touched if k not in done_main),
        "buckets_skipped": n_skipped,
        "rows_added": rows_added,
        "rows_total_touched": rows_total,
    }
