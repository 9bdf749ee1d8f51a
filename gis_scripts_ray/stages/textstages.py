"""Text analysis for training-data pipelines: lang-ID, quality, fingerprints.

These are the web-payload analogs of the reference's per-pixel quality
masks: NDWI water masking (``seagrass_lib.py:334-343``) becomes quality
scoring; the condition-DSL counting (``count_raster_values.py``) becomes
stopword/punctuation ratio thresholds; XML metadata parsing
(``seagrass_lib.py:174-193``) becomes per-row field extraction.

All stages are ``map_batches`` callables; the classifier is an actor-pool
class (profiles + compiled regexes built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Tiny character-frequency profiles for an n-gram-free heuristic lang-ID.
# Public-knowledge letter statistics; deliberately simple + deterministic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "die", "ist", "nicht", "das", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "que"),
    "es": ("el", "la", "los", "es", "una", "por", "que", "para"),
    "pt": ("o", "a", "os", "é", "uma", "por", "não", "para"),
    "en": ("the", "and", "is", "of", "to", "a", "in", "that"),
}

_STOPWORDS = {
    w for words in _LANG_MARKERS.values() for w in words
}


class LangIdScorer:
    """Actor-pool stage: append lang_pred + quality columns.

    State built once per actor: marker dicts, compiled tokenizer. The hot
    path is :meth:`classify_batch` — polars tokenize/explode + one marker
    ``is_in`` per language over the whole batch; the per-row
    :meth:`classify` is kept as the parity oracle for tests.
    """

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.markers = {
            lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()
        }
        self.marker_lists = {lang: sorted(ws) for lang, ws in _LANG_MARKERS.items()}
        self._marker_union = sorted({w for ws in _LANG_MARKERS.values() for w in ws})

    def classify(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und"
        # CJK heuristic first
        cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if cjk > len(text) * 0.1:
            return "zh"
        best, best_hits = "und", 0
        wset = words if len(words) < 200 else words[:200]
        for lang, markers in self.markers.items():
            hits = sum(1 for w in wset if w in markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def classify_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized :meth:`classify` over a batch (identical outputs)."""
        import polars as pl

        n = len(texts)
        preds = np.full(n, "und", dtype=object)
        if n == 0:
            return preds
        clean = [t if t else "" for t in texts]
        s = pl.Series("t", clean)
        words = s.str.to_lowercase().str.extract_all(r"[\w']+")
        n_words = words.list.len().to_numpy().astype(np.int64)
        nonempty = n_words > 0
        # CJK heuristic (raw text): > 10% of characters in the block.
        # Gate the regex scan on a free ASCII check — pure-ASCII docs
        # cannot contain CJK (len_bytes == len_chars <=> ASCII).
        n_chars = s.str.len_chars().to_numpy().astype(np.int64)
        non_ascii = s.str.len_bytes().to_numpy().astype(np.int64) != n_chars
        zh = np.zeros(n, dtype=bool)
        if non_ascii.any():
            cjk = (
                pl.Series([clean[i] for i in np.nonzero(non_ascii)[0]])
                .str.count_matches(r"[一-鿿]")
                .to_numpy()
                .astype(np.int64)
            )
            zh[non_ascii] = cjk > n_chars[non_ascii] * 0.1
        zh &= nonempty
        preds[zh] = "zh"
        # marker hits over the first 200 words: one union is_in prunes the
        # exploded tokens to marker hits first, then the 5 per-language
        # is_in run over that small subset only
        df = pl.DataFrame(
            {"i": np.arange(n, dtype=np.int64), "w": words.list.head(200)}
        ).explode("w")
        df = df.filter(pl.col("w").is_in(self._marker_union))
        agg = df.group_by("i").agg(
            [
                pl.col("w").is_in(ws).sum().alias(lang)
                for lang, ws in self.marker_lists.items()
            ]
        )
        langs = list(self.marker_lists)
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        idx = agg["i"].to_numpy()
        for j, lang in enumerate(langs):
            hits[idx, j] = agg[lang].to_numpy()
        best = np.argmax(hits, axis=1)  # first max == dict-order tie-break
        best_hits = hits[np.arange(n), best]
        lang_arr = np.array(langs, dtype=object)
        use = nonempty & ~zh & (best_hits > 0)
        preds[use] = lang_arr[best[use]]
        return preds

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        preds = self.classify_batch(texts)
        return batch.append_column("lang_pred", pa.array(preds.tolist(), pa.string()))


# task-based variant with worker-cached scorer (no actor spawn, stage
# fusion — same rationale as dedup.minhash_lsh_rows)
_WORKER_SCORERS: dict = {}


def langid_rows(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sc = _WORKER_SCORERS.get(text_col)
    if sc is None:
        sc = LangIdScorer(text_col)
        _WORKER_SCORERS[text_col] = sc
    return sc(batch)


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality metrics: length, token count, stopword ratio,
    punctuation ratio, mean word length. Arrow kernels only — no loops."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    n_punct = pc.cast(
        pc.add(
            pc.count_substring(text, "."),
            pc.add(pc.count_substring(text, ","), pc.count_substring(text, "!")),
        ),
        pa.int64(),
    )
    mean_word_len = pc.divide(
        pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
        pc.cast(n_tokens, pa.float64()),
    )
    return (
        batch.append_column("n_chars_q", n_chars)
        .append_column("n_tokens", n_tokens)
        .append_column("n_punct", n_punct)
        .append_column("mean_word_len", mean_word_len)
    )


def stopword_ratio(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword ratio — vectorized (polars tokenize + is_in; no per-row
    lambda). The token class matches Python ``str.split()`` exactly
    (Unicode ``\\s`` plus the ``\\x1c-\\x1f`` separators)."""
    import polars as pl

    s = pl.from_pandas(batch[text_col]).fill_null("")
    ws = s.str.to_lowercase().str.extract_all(r"[^\s\x1c-\x1f]+")
    n = ws.list.len().to_numpy().astype(np.int64)
    hits = (
        ws.list.eval(pl.element().is_in(sorted(_STOPWORDS)))
        .list.sum()
        .to_numpy()
        .astype(np.float64)
    )
    batch["stop_ratio"] = hits / np.maximum(1, n)
    return batch


def rolling_fingerprint_row(text: str, window: int = 16) -> int:
    """Per-row reference implementation (parity oracle for tests)."""
    base = np.uint64(1099511628211)
    b = np.frombuffer((text or "").encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < window:
        # Python-int wrap (== uint64 wrap) — numpy SCALAR uint64 multiply
        # raises RuntimeWarning on overflow, array ops wrap silently
        acc = 0xCBF29CE484222325
        for x in b:
            acc = ((acc ^ int(x)) * 1099511628211) % (1 << 64)
        return int(acc)
    n = len(b) - window + 1
    acc = np.zeros(n, dtype=np.uint64)
    for k in range(window):
        acc = acc * base + b[k : k + n]
    return int(acc.min())


def rolling_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Document fingerprint: min rolling polynomial hash over byte windows
    (winnowing-style). BATCH-GLOBAL: one concatenated byte buffer, one
    ``window``-pass rolling hash over all docs' windows at once,
    ``np.minimum.reduceat`` over the ragged doc segments. Short docs
    (< window bytes) fold FNV-style via a masked position loop."""
    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    fps = np.empty(n_docs, dtype=np.uint64)
    base = np.uint64(1099511628211)
    bufs = [(t or "").encode() for t in texts]
    lens = np.fromiter((len(b) for b in bufs), np.int64, n_docs)
    long = lens >= window
    if long.any():
        li = np.nonzero(long)[0]
        cat = np.frombuffer(b"".join(bufs[i] for i in li), dtype=np.uint8).astype(
            np.uint64
        )
        llens = lens[li]
        off = np.concatenate([[0], np.cumsum(llens)])
        # roll over the WHOLE concatenated buffer with contiguous slices
        # (a per-window gather is ~5x slower); windows spanning a doc
        # boundary exist in `acc` but are excluded by the per-doc index
        # ranges below
        n_glob = len(cat) - window + 1
        acc = np.zeros(n_glob, dtype=np.uint64)
        for k in range(window):
            acc = acc * base + cat[k : k + n_glob]
        # per-doc min over [off[d], off[d] + nwin[d]) via alternating
        # reduceat segments (valid, gap, valid, gap, ...)
        nwin = llens - window + 1
        idx = np.empty(2 * len(li), dtype=np.int64)
        idx[0::2] = off[:-1]
        idx[1::2] = off[:-1] + nwin
        acc = np.append(acc, np.uint64(0))  # idx may equal n_glob (last doc)
        fps[li] = np.minimum.reduceat(acc, idx)[0::2]
    short = ~long
    if short.any():
        si = np.nonzero(short)[0]
        slens = lens[si]
        maxl = int(slens.max())
        mat = np.zeros((len(si), max(maxl, 1)), dtype=np.uint8)
        for j, i in enumerate(si):
            mat[j, : lens[i]] = np.frombuffer(bufs[i], dtype=np.uint8)
        acc = np.full(len(si), 0xCBF29CE484222325, dtype=np.uint64)
        for k in range(maxl):
            act = slens > k
            acc[act] = (acc[act] ^ mat[act, k].astype(np.uint64)) * base
        fps[si] = acc
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64), pa.int64())
    )


# ---------------------------------------------------------------------------
# corpus-level TF-IDF-style scoring (integer-exact variant)
# ---------------------------------------------------------------------------


def token_df_counts(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Document frequency per token: per-block partials count each token
    once per document (polars split(' ')/explode/unique — DuckDB
    ``string_split`` semantics, empties kept), then the adaptive combine
    sums them. The all-to-all carries each block's vocabulary once, not
    every occurrence."""
    import polars as pl

    import ray.data  # noqa: F401  (type-only above)
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    def partial(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[text_col])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        d = (
            pl.DataFrame({"text": s})
            .with_row_index("__doc")
            .with_columns(pl.col("text").fill_null("").str.split(" ").alias("tok"))
            .drop("text")
            .explode("tok")
            .unique(subset=["__doc", "tok"])  # one df count per (doc, token)
            .group_by("tok")
            .len(name="df")
        )
        return pa.table(
            {
                "token": pa.array(d["tok"].to_list(), pa.string()),
                "df": pa.array(d["df"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], ["df"]
    )


def tfidf_integer_scores(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Per-document relevance mass with INTEGER-EXACT idf weights:
    ``score(d) = sum_t tf(t, d) * (N // df(t))`` — the TF-IDF shape
    (weights shrink as document frequency grows) with integer division in
    place of the logarithm, so the distributed sum is order-independent
    and bit-exact (a float idf would make the score hash depend on FP
    addition order — the divergence class the oracle rules forbid).

    Adaptive weight delivery (round-3 verdict task #3 — the scale path
    the round-2 docstring only promised): the df table's MEASURED row
    count picks the plan.

    * vocab <= ``broadcast_limit`` rows (stopword/controlled vocab, most
      corpora after normalization): broadcast weight map applied per
      batch (polars explode + join + group-sum) — one ``ray.put``, no
      extra shuffle. Output preserves input row order.
    * bigger (open-web vocabularies are billions of distinct tokens):
      TOKEN HASH-JOIN — per-batch (doc, token, tf) partials join the
      distributed weight table on ``token`` and per-doc scores finish
      through the adaptive combine. No vocabulary row ever lands on the
      driver. Output order is unspecified (both paths' rows are
      identical; forced-low-limit equivalence test pins it).

    N is the corpus document count."""
    import ray

    import polars as pl

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    n_docs = ds.count()
    df_ds = token_df_counts(ds, text_col).materialize()
    n_vocab = df_ds.count()

    if n_vocab > broadcast_limit:
        # ---- token hash-join path ------------------------------------
        import pyarrow.compute as pc

        from gis_scripts_ray.stages.joins import hash_join

        def to_weights(batch: pa.Table) -> pa.Table:
            w = pc.divide(pa.scalar(n_docs, pa.int64()), batch["df"])
            return pa.table({"token": batch["token"], "w": pc.cast(w, pa.int64())})

        # repartition-compact: the adaptive combine can emit empty
        # shuffle-partition blocks, which Ray 2.49's native join rejects
        # on the right side (CLAUDE.md)
        weights = df_ds.map_batches(to_weights, batch_format="pyarrow").repartition(
            max(1, min(64, n_vocab // 2_000_000 + 1))
        )

        def explode_tf(batch: pa.Table) -> pa.Table:
            s = pl.from_arrow(batch[text_col])
            if isinstance(s, pl.DataFrame):
                s = s.to_series()
            ids = pl.from_arrow(batch[id_col])
            if isinstance(ids, pl.DataFrame):
                ids = ids.to_series()
            d = (
                pl.DataFrame({"__doc": ids, "text": s})
                .with_columns(pl.col("text").fill_null("").str.split(" ").alias("tok"))
                .drop("text")
                .explode("tok")
                .group_by(["__doc", "tok"])
                .len(name="tf")
            )
            return pa.table(
                {
                    id_col: pa.array(d["__doc"].to_numpy(), pa.int64()),
                    "token": pa.array(d["tok"].to_list(), pa.string()),
                    "tf": pa.array(d["tf"].to_numpy().astype(np.int64), pa.int64()),
                }
            )

        joined = hash_join(
            ds.map_batches(explode_tf, batch_format="pyarrow"), weights, on="token"
        )

        def contrib(batch: pa.Table) -> pa.Table:
            part = pc.multiply(batch["tf"], batch["w"])
            t = pa.table({id_col: batch[id_col], "score": part})
            out = t.group_by([id_col]).aggregate([("score", "sum")])
            return out.rename_columns(
                ["score" if c == "score_sum" else c for c in out.column_names]
            )

        return coalesce_shuffle_sum(
            joined.map_batches(contrib, batch_format="pyarrow"), [id_col], ["score"]
        )

    # ---- broadcast path (vocab measured driver-sized) -------------------
    df_pd = df_ds.to_pandas()
    wmap = pl.DataFrame(
        {
            "tok": df_pd["token"].astype(str),
            "w": (n_docs // df_pd["df"].to_numpy()).astype(np.int64),
        }
    )
    ref = ray.put(wmap)

    def score(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        w = worker_broadcast(ref)
        s = pl.from_arrow(batch[text_col])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        d = (
            pl.DataFrame({"text": s})
            .with_row_index("__doc")
            .with_columns(pl.col("text").fill_null("").str.split(" ").alias("tok"))
            .drop("text")
            .explode("tok")
            .join(w, on="tok", how="left")  # df built from this corpus: no miss
            .group_by("__doc")
            .agg(pl.col("w").sum().alias("score"))
            .sort("__doc")
        )
        # every doc yields >= 1 token (empty text -> [""]), so the group-by
        # preserves row count and __doc order indexes the batch directly
        scores = np.zeros(len(batch), dtype=np.int64)
        scores[d["__doc"].to_numpy()] = d["score"].to_numpy()
        return pa.table({id_col: batch[id_col], "score": pa.array(scores, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def json_int_field_row(text, field: str):
    """Per-row reference for :func:`json_int_field` (kept for the
    bit-exactness parity contract, CLAUDE.md). Contract: the top-level
    JSON object's ``field`` yields an int iff its extracted value is an
    integer LITERAL string — a JSON integer, or a JSON string of digits
    (``"7"`` -> 7; quotes strip on extraction in every engine here:
    polars ``json_path_match``, DuckDB ``json_extract_string``). Floats,
    bools, nulls, containers, missing fields, and malformed JSON are all
    ``None``."""
    import json
    import re

    if text is None:
        return None
    try:
        v = json.loads(text)
    except (ValueError, TypeError):
        return None
    if not isinstance(v, dict):
        return None
    x = v.get(field)
    if isinstance(x, bool):  # bools are ints in Python; JSON keeps them distinct
        return None
    if isinstance(x, int):
        return x
    if isinstance(x, str) and re.fullmatch(r"-?\d+", x):
        return int(x)
    return None


def json_int_field(
    batch: pa.Table, col: str, field: str, out_col: str
) -> pa.Table:
    """Vectorized integer field extraction from a JSON-string column
    (event props, page metadata): one polars ``json_path_match`` pass +
    strict-off int cast — malformed JSON, missing fields, and non-integer
    values all become null, matching :func:`json_int_field_row` (parity
    test in tests/test_ops_round3e.py). No per-row Python in the hot
    path."""
    import polars as pl

    s = pl.from_arrow(batch[col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    ex = s.str.json_path_match(f"$.{field}")
    # reject JSON floats/strings-of-digits-with-dot etc: an integer field
    # matches as a bare integer literal
    ok = ex.str.contains(r"^-?\d+$")
    vals = ex.set(~ok.fill_null(False), None).cast(pl.Int64, strict=False)
    return batch.append_column(out_col, pa.array(vals.to_list(), pa.int64()))


# BPE-ish pre-tokenizer pattern (GPT-2 style, lookahead-free so the SAME
# pattern runs identically in polars (Rust regex) and DuckDB (RE2) — the
# original GPT-2 pattern's trailing negative lookahead is unsupported in
# both, and dropping it only changes how runs of trailing whitespace
# group, which the cross-engine parity test pins anyway).
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_counts(batch: pa.Table, text_col: str, out_col: str = "bpe_tokens") -> pa.Table:
    """Per-doc BPE-ish token counts: ONE vectorized polars
    ``count_matches`` pass over the batch with :data:`BPE_PATTERN` — the
    pre-tokenization granularity LLM training budgets are quoted in
    (word-ish pieces + contractions + digit runs + punctuation runs),
    deliberately engine-portable so the DuckDB twin runs the IDENTICAL
    pattern (cross-engine parity pinned in tests)."""
    import polars as pl

    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    counts = s.fill_null("").str.count_matches(BPE_PATTERN)
    return batch.append_column(
        out_col, pa.array(counts.to_numpy().astype(np.int64), pa.int64())
    )


def repetition_stats_row(text: str) -> dict:
    """Per-row reference implementation (parity oracle for tests).

    Gopher-style repetition counters over a LITERAL-SPACE token split
    (DuckDB ``string_split(text, ' ')`` semantics — empties kept, one
    empty token for the empty string), reported in the INTEGER domain so
    the distributed result is order-independent:

    * ``n_tokens``      — token occurrences
    * ``dup_tokens``    — occurrences of tokens appearing >= 2 times
    * ``max_bigram_n``  — count of the most frequent bigram (0 if none)
    * ``dup_trigram_n`` — occurrences of trigrams appearing >= 2 times

    The float Gopher rules (duplicate-token fraction, top-bigram char
    fraction) are single divisions of these exact integers."""
    from collections import Counter

    toks = (text or "").split(" ")
    tc = Counter(toks)
    bc = Counter(zip(toks, toks[1:]))
    trc = Counter(zip(toks, toks[1:], toks[2:]))
    return {
        "n_tokens": len(toks),
        "dup_tokens": sum(c for c in tc.values() if c >= 2),
        "max_bigram_n": max(bc.values(), default=0),
        "dup_trigram_n": sum(c for c in trc.values() if c >= 2),
    }


_REPETITION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("dup_tokens", pa.int64()),
        ("max_bigram_n", pa.int64()),
        ("dup_trigram_n", pa.int64()),
    ]
)


def repetition_stats(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Batch-vectorized Gopher repetition counters (quality-filter stage).

    One explode of the literal-space token split with an in-batch doc
    index; bigrams/trigrams come from SHIFTED token columns masked to
    same-doc positions (no per-row Python, no per-doc loop), counts from
    three polars group_bys. Per-doc metric — embarrassingly parallel, no
    shuffle. Bit-exact vs :func:`repetition_stats_row` (parity test)."""
    import polars as pl

    if batch.num_rows == 0:
        return _REPETITION_SCHEMA.empty_table()
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    n = batch.num_rows
    t = (
        pl.DataFrame(
            {
                "__doc": np.arange(n, dtype=np.int64),
                "tok": s.fill_null("").str.split(" "),
            }
        )
        .explode("tok")
        .with_columns(
            g2=pl.concat_str(
                [pl.col("tok"), pl.col("tok").shift(-1)], separator=" "
            ),
            g3=pl.concat_str(
                [pl.col("tok"), pl.col("tok").shift(-1), pl.col("tok").shift(-2)],
                separator=" ",
            ),
            same2=pl.col("__doc") == pl.col("__doc").shift(-1),
            same3=pl.col("__doc") == pl.col("__doc").shift(-2),
        )
    )
    tok_counts = t.group_by(["__doc", "tok"]).len(name="c")
    per_doc = tok_counts.group_by("__doc").agg(
        pl.col("c").sum().alias("n_tokens"),
        pl.col("c").filter(pl.col("c") >= 2).sum().alias("dup_tokens"),
    )
    big = (
        t.filter(pl.col("same2"))
        .group_by(["__doc", "g2"])
        .len(name="c")
        .group_by("__doc")
        .agg(pl.col("c").max().alias("max_bigram_n"))
    )
    tri = (
        t.filter(pl.col("same3"))
        .group_by(["__doc", "g3"])
        .len(name="c")
        .group_by("__doc")
        .agg(pl.col("c").filter(pl.col("c") >= 2).sum().alias("dup_trigram_n"))
    )
    out = (
        per_doc.join(big, on="__doc", how="left")
        .join(tri, on="__doc", how="left")
        .fill_null(0)
        .sort("__doc")
    )
    ids = batch[id_col].combine_chunks()
    doc_pos = out["__doc"].to_numpy()
    return pa.table(
        {
            "doc_id": pc.take(ids, pa.array(doc_pos, pa.int64())),
            "n_tokens": pa.array(out["n_tokens"].to_numpy().astype(np.int64)),
            "dup_tokens": pa.array(out["dup_tokens"].to_numpy().astype(np.int64)),
            "max_bigram_n": pa.array(
                out["max_bigram_n"].to_numpy().astype(np.int64)
            ),
            "dup_trigram_n": pa.array(
                out["dup_trigram_n"].to_numpy().astype(np.int64)
            ),
        },
        schema=_REPETITION_SCHEMA,
    )


def boilerplate_ngram_partials(
    batch: pa.Table, text_col: str = "text", n: int = 5
) -> pa.Table:
    """Per-block partial document-frequency counts of word ``n``-grams
    (boilerplate detection: an n-gram shared verbatim by many documents
    is navigation chrome / licence text, not content).

    A document is one row, so distinct-within-doc is an IN-BATCH unique;
    the partial emits each (doc, ngram) once and the adaptive combine
    sums the df counts downstream — the all-to-all carries one row per
    distinct ngram per block, never per occurrence."""
    import polars as pl

    out_schema = pa.schema([("ngram", pa.string()), ("df", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    t = pl.DataFrame(
        {
            "__doc": np.arange(batch.num_rows, dtype=np.int64),
            "tok": s.fill_null("").str.split(" "),
        }
    ).explode("tok")
    t = t.with_columns(
        g=pl.concat_str(
            [pl.col("tok").shift(-k) for k in range(n)], separator=" "
        ),
        same=pl.col("__doc") == pl.col("__doc").shift(-(n - 1)),
    )
    d = (
        t.filter(pl.col("same"))
        .unique(subset=["__doc", "g"])
        .group_by("g")
        .len(name="df")
    )
    return pa.table(
        {
            "ngram": pa.array(d["g"].to_list(), pa.string()),
            "df": pa.array(d["df"].to_numpy().astype(np.int64), pa.int64()),
        },
        schema=out_schema,
    )


def token_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block partial token OCCURRENCE counts (token, c) — the
    pre-aggregation in front of the adaptive combine, so the all-to-all
    carries one row per distinct token per block, never per occurrence.
    Tokenization is the engine-wide contract: literal-space split of
    null-normalized text (DuckDB ``string_split(COALESCE(text,''), ' ')``
    — empties kept, '' yields one empty token)."""
    out_schema = pa.schema([("token", pa.string()), ("c", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    toks = pc.list_flatten(
        pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    )
    out = pa.table({"token": toks}).group_by(["token"]).aggregate([([], "count_all")])
    return pa.table(
        {"token": out["token"], "c": out["count_all"].cast(pa.int64())},
        schema=out_schema,
    )


def vocab_topv(
    ds: "ray.data.Dataset", text_col: str = "text", v: int = 16
) -> "ray.data.Dataset":
    """Corpus top-``v`` tokens by total occurrence count, total order
    pinned cross-engine as (c DESC, token ASC). Plan: in-batch partial
    counts -> adaptive combine (globally unique tokens) -> per-block
    top-``v`` prune (valid only AFTER global uniqueness; same total
    order as the finish) -> ``v``-row global sort+limit — the final sort
    never sees the full vocabulary."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    counts = coalesce_shuffle_sum(
        ds.map_batches(
            token_count_partials,
            fn_kwargs={"text_col": text_col},
            batch_format="pyarrow",
        ),
        ["token"],
        ["c"],
    )

    def block_topv(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch, sort_keys=[("c", "descending"), ("token", "ascending")]
        )
        return batch.take(order[:v])

    pruned = counts.map_batches(block_topv, batch_format="pyarrow")
    return pruned.sort(["c", "token"], descending=[True, False]).limit(v)


def vocab_coverage_row(text: "str | None", vocab: "set[str]") -> dict:
    """Per-row reference for :func:`vocab_coverage_batch` (parity
    oracle): token occurrences, in-vocab occurrences, distinct
    out-of-vocabulary token types."""
    toks = (text or "").split(" ")
    inv = [t in vocab for t in toks]
    return {
        "n_tokens": len(toks),
        "n_in_vocab": sum(inv),
        "n_oov_types": len({t for t, i in zip(toks, inv) if not i}),
    }


_VOCAB_COVERAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_in_vocab", pa.int64()),
        ("n_oov_types", pa.int64()),
    ]
)


def vocab_coverage_batch(
    batch: pa.Table,
    vocab: "tuple[str, ...]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Per-doc vocabulary-coverage counters (the CCNet-style quality
    signal: how much of a document is made of the corpus's common
    tokens). Per-doc metric over a fixed small vocab — embarrassingly
    parallel, zero shuffle; one polars explode + ``is_in`` per batch.
    Bit-exact vs :func:`vocab_coverage_row` (parity test)."""
    import polars as pl

    if batch.num_rows == 0:
        return _VOCAB_COVERAGE_SCHEMA.empty_table()
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    t = (
        pl.DataFrame(
            {
                "__doc": np.arange(batch.num_rows, dtype=np.int64),
                "tok": s.fill_null("").str.split(" "),
            }
        )
        .explode("tok")
        .with_columns(inv=pl.col("tok").is_in(list(vocab)))
    )
    agg = t.group_by("__doc", maintain_order=True).agg(
        pl.len().alias("n_tokens"),
        pl.col("inv").sum().alias("n_in_vocab"),
        pl.col("tok").filter(~pl.col("inv")).n_unique().alias("n_oov_types"),
    )
    assert len(agg) == batch.num_rows  # every doc has >= 1 token
    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_tokens": pa.array(agg["n_tokens"].to_numpy().astype(np.int64)),
            "n_in_vocab": pa.array(agg["n_in_vocab"].to_numpy().astype(np.int64)),
            "n_oov_types": pa.array(
                agg["n_oov_types"].to_numpy().astype(np.int64)
            ),
        },
        schema=_VOCAB_COVERAGE_SCHEMA,
    )


def ngram_occurrence_partials(
    batch: pa.Table, text_col: str = "text", n: int = 2
) -> pa.Table:
    """Per-block partial word n-gram OCCURRENCE counts (g, c) — like
    :func:`boilerplate_ngram_partials` but counting every occurrence
    instead of distinct-per-doc (the Zipf / frequency-spectrum input).
    N-grams never cross document boundaries."""
    import polars as pl

    out_schema = pa.schema([("g", pa.string()), ("c", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    t = pl.DataFrame(
        {
            "__doc": np.arange(batch.num_rows, dtype=np.int64),
            "tok": s.fill_null("").str.split(" "),
        }
    ).explode("tok")
    t = t.with_columns(
        g=pl.concat_str(
            [pl.col("tok").shift(-k) for k in range(n)], separator=" "
        ),
        same=pl.col("__doc") == pl.col("__doc").shift(-(n - 1)),
    )
    d = t.filter(pl.col("same")).group_by("g").len(name="c")
    return pa.table(
        {
            "g": pa.array(d["g"].to_list(), pa.string()),
            "c": pa.array(d["c"].to_numpy().astype(np.int64), pa.int64()),
        },
        schema=out_schema,
    )


def zipf_bucket_partial(batch: pa.Table, count_col: str = "c") -> pa.Table:
    """Per-block partial of the frequency SPECTRUM: bucket = bit length
    of the (already globally combined) per-key count — ``frexp``'s
    exponent, exact for counts < 2^53, the engine twin of DuckDB
    ``length(printf('%b', c))`` — with per-bucket type and occurrence
    sums. Valid only on globally-unique keys (bucketing a partial count
    is wrong); callers combine counts first."""
    out_schema = pa.schema(
        [("bucket", pa.int64()), ("n_types", pa.int64()), ("n_occ", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    c = batch[count_col].to_numpy().astype(np.int64)
    bucket = np.frexp(c.astype(np.float64))[1].astype(np.int64)
    t = pa.table({"bucket": pa.array(bucket), "c": pa.array(c)})
    out = t.group_by(["bucket"]).aggregate([([], "count_all"), ("c", "sum")])
    return pa.table(
        {
            "bucket": out["bucket"],
            "n_types": out["count_all"].cast(pa.int64()),
            "n_occ": out["c_sum"].cast(pa.int64()),
        },
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Unicode text normalization (the C4/CCNet cleaning step)
# ---------------------------------------------------------------------------

_WS_COLLAPSE_RE = r"[ \t\n\r]+"


def normalize_text(texts: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Standard web-text normalization: NFC-compose, collapse runs of
    space/tab/newline/CR to a single space, trim leading/trailing spaces.
    Nulls become '' (one null contract across engines — the sketch.py
    lesson). Vectorized: polars ``str.normalize`` for the NFC step
    (pyarrow 16's ``utf8_normalize`` decomposes but does NOT compose —
    ``'a'+U+0301`` stays two codepoints, diverging from DuckDB /
    unicodedata; caught by the parity test) + RE2 for the collapse. The
    character class is deliberately the portable ``[ \\t\\n\\r]`` —
    identical semantics in RE2, DuckDB regex and Python ``re`` (no
    engine-divergent ``\\s``). Per-row reference:
    :func:`normalize_text_one`."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pc.fill_null(texts, "")
    s = pl.from_arrow(s).str.normalize("NFC").to_arrow().cast(pa.string())
    s = pc.replace_substring_regex(s, _WS_COLLAPSE_RE, " ")
    return pc.utf8_trim(s, " ")


def normalize_text_one(text: "str | None") -> str:
    """Per-row reference (parity oracle) for :func:`normalize_text`."""
    import re
    import unicodedata

    if text is None:
        text = ""
    s = unicodedata.normalize("NFC", text)
    s = re.sub(_WS_COLLAPSE_RE, " ", s)
    return s.strip(" ")
