"""End-to-end web-corpus curation — the composed pipeline a user of the
reference would actually run to turn a crawl into training shards, built
entirely from this repo's stages:

``WARC shards -> response filter -> content routing (PDF text
extraction / HTML-or-plain UTF-8 decode) -> Unicode NFC normalization
-> language ID -> token-count quality gate -> exact content dedup
(min-id per text survives) -> sequence packing (doc -> (pack, offset))
-> WebDataset tar shards of {key}.txt/{key}.json``.

Everything streams: the WARC parse fuses with routing and extraction,
normalization and lang-ID are vectorized batch stages, the dedup and
packing steps are the adaptive-delivery / range-bucketed distributed
operators from their modules, and the final write groups packs into tar
shards with tmp+rename (re-runnable). The only driver-resident values
are the dedup keeper broadcast (measured-guarded inside ``dedup_rows``)
and the n_buckets-row packing prefix.

Determinism: every step is order-free or id-ordered, so two runs over
the same shards produce byte-identical tar output (asserted in
tests/test_curate.py).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data


def _route_and_extract(batch: pa.Table) -> pa.Table:
    """Responses only; PDF bodies route through the real text extractor,
    everything else decodes as UTF-8 (replacement, deterministic).
    Failed extractions are flagged, never dropped."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.multimodal import sniff_type
    from gis_scripts_ray.stages.pdftext import decode_pdf_text

    resp = batch.filter(pc.equal(batch["warc_type"], "response"))
    uris = resp["target_uri"].to_pylist()
    texts, kinds, ok = [], [], []
    for body in resp["body"].to_pylist():
        kind = sniff_type(body or b"")
        kinds.append(kind)
        if kind == "pdf":
            try:
                texts.append(decode_pdf_text(body))
                ok.append(True)
            except (ValueError, NotImplementedError):
                texts.append("")
                ok.append(False)
        else:
            texts.append((body or b"").decode("utf-8", errors="replace"))
            ok.append(True)
    return pa.table(
        {
            "url": pa.array(uris, pa.string()),
            "media_type": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "extracted_ok": pa.array(ok, pa.bool_()),
        }
    )


def _enrich(batch: pa.Table) -> pa.Table:
    """Normalize + lang-ID + token count + a stable int64 doc id from
    the url (multiplicative content hash — deterministic, order-free)."""
    import polars as pl

    from gis_scripts_ray.stages.textstages import langid_rows, normalize_text

    norm = normalize_text(batch["text"])
    batch = batch.set_column(
        batch.column_names.index("text"), "text", norm
    )
    lang = langid_rows(batch, text_col="text")["lang_pred"]
    s = pl.from_arrow(batch["url"])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    doc_id = (s.hash(seed=11).to_numpy() >> np.uint64(1)).astype(np.int64)
    toks = pl.from_arrow(batch["text"])
    if isinstance(toks, pl.DataFrame):
        toks = toks.to_series()
    n_tokens = (
        toks.fill_null("").str.split(" ").list.len().to_numpy().astype(np.int64)
    )
    return (
        batch.append_column("lang", lang)
        .append_column("doc_id", pa.array(doc_id, pa.int64()))
        .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    )


def curate_webcorpus(
    warc_paths: "list[str]",
    out_dir: str,
    min_tokens: int = 3,
    pack_window: int = 64,
    packs_per_shard: int = 4,
) -> dict:
    """Run the full curation pipeline; returns summary stats. Output:
    ``{out_dir}/shard-{k:05d}.tar`` WebDataset shards whose samples are
    ``{doc_id:020d}.txt`` (curated text) + ``.json`` (url, lang,
    pack_id, pack_offset)."""
    import os

    import pyarrow.compute as pc

    from gis_scripts_ray.sources.warc import read_warc
    from gis_scripts_ray.sources.webdataset import encode_tar
    from gis_scripts_ray.stages.dedup import dedup_rows
    from gis_scripts_ray.stages.packing import sequence_packing

    os.makedirs(out_dir, exist_ok=True)

    docs = (
        read_warc(warc_paths)
        .map_batches(_route_and_extract, batch_format="pyarrow")
        .map_batches(_enrich, batch_format="pyarrow")
    )
    docs = docs.map_batches(
        lambda b: b.filter(
            pc.and_(b["extracted_ok"], pc.greater_equal(b["n_tokens"], min_tokens))
        ),
        batch_format="pyarrow",
    )
    n_extracted = docs.count()

    kept = dedup_rows(docs, content_col="text", id_col="doc_id").materialize()
    n_kept = kept.count()

    packed = sequence_packing(
        kept, window=pack_window, text_col="text", id_col="doc_id"
    )
    # attach pack assignment back onto the kept rows (compacted, same ids)
    from gis_scripts_ray.stages.joins import hash_join

    n_parts = max(1, -(-n_kept // 500_000))
    joined = hash_join(
        kept.select_columns(["doc_id", "url", "lang", "text"]).repartition(n_parts),
        packed.select_columns(["doc_id", "pack_id", "pack_offset"]).repartition(
            n_parts
        ),
        on="doc_id",
        num_partitions=n_parts,
    )

    def to_shard_members(batch: pa.Table) -> pa.Table:
        shard, key, member = [], [], []
        for row in batch.to_pylist():
            k = f"{row['doc_id']:020d}"
            meta = json.dumps(
                {
                    "url": row["url"],
                    "lang": row["lang"],
                    "pack_id": row["pack_id"],
                    "pack_offset": row["pack_offset"],
                },
                sort_keys=True,
            )
            pair = encode_tar(
                [
                    (f"{k}.txt", (row["text"] or "").encode("utf-8")),
                    (f"{k}.json", meta.encode("utf-8")),
                ]
            )[: -2 * 512]
            shard.append(row["pack_id"] // packs_per_shard)
            key.append(row["doc_id"])
            member.append(pair)
        return pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "doc_id": pa.array(key, pa.int64()),
                "member": pa.array(member, pa.binary()),
            }
        )

    members = joined.map_batches(to_shard_members, batch_format="pyarrow")

    def write_shard(g: pa.Table) -> pa.Table:
        g = g.sort_by("doc_id")
        s = g["shard"][0].as_py()
        tmp = f"{out_dir}/shard-{s:05d}.tar.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            for m in g["member"]:
                f.write(m.as_py())
            f.write(b"\x00" * (2 * 512))
        os.replace(tmp, f"{out_dir}/shard-{s:05d}.tar")
        return pa.table(
            {
                "shard": pa.array([s], pa.int64()),
                "n_docs": pa.array([len(g)], pa.int64()),
            }
        )

    shards = (
        members.groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "n_extracted": int(n_extracted),
        "n_kept": int(n_kept),
        "n_shards": int(len(shards)),
        "shard_docs": {
            int(r["shard"]): int(r["n_docs"]) for _, r in shards.iterrows()
        },
    }
